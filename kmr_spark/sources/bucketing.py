"""Bucketed tables: shuffle-free co-located joins.

KMR co-locates by explicit shuffles per step; the persistent-storage
equivalent is bucketing — write both join sides hash-bucketed on the
join key and every future equi-join/groupBy on that key runs with NO
exchange. At 100 TB this is the difference between re-shuffling the
fact table per query and never shuffling it again: the canonical
layout for lineitem/orders on orderkey.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 16) -> None:
    """Persist as a bucketed, bucket-sorted managed table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous run can leave the managed location behind with
    # no catalog entry; clear it or saveAsTable refuses the name
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.exists(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_bucketed(spark: SparkSession, left: str, right: str, key: str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``key``; with matching bucket counts
    Catalyst plans a sort-merge join with zero Exchange nodes."""
    return spark.table(left).join(spark.table(right), key, how)
