"""Data-layout & catalog queries: Z-order clustering and table
profiling (functions/zorder.py, operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions.zorder import (
    sql_zbucket,
    sql_zorder_key,
    zbucket,
    zorder_key,
)
from kmr_spark.operators.profile import profile_table, sql_profile
from kmr_spark.session import load_tables

ZORDER_TOP = 1000

#: integer/string columns only: their CAST-to-string rendering is
#: engine-identical (double/timestamp rendering is not guaranteed)
PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey",
                "l_returnflag", "l_linestatus"]


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (user_id, floor(value)) and the first 1000 rows
    of the Z-ordered layout — the write-side clustering pass that makes
    later range filters on either column prune files. TakeOrdered cut
    (no global sort materialization) with an event_id tie-break."""
    ev = load_tables(spark, sf_dir)["events"]
    # zorder_key needs non-negative 16-bit inputs; fold both dimensions
    # into that domain (ids >= 2^16 / negative value buckets would
    # otherwise alias arbitrary Morton keys).
    keyed = ev.select(
        "event_id", "user_id",
        F.floor("value").cast("long").alias("vbucket"),
    ).withColumn(
        "zkey",
        zorder_key(zbucket(F.col("user_id")), zbucket(F.col("vbucket"))),
    )
    return (
        keyed.orderBy("zkey", "event_id")
        .limit(ZORDER_TOP)
        .select("event_id", "user_id", "vbucket", "zkey")
    )


EVENTS_ZORDER_SQL = f"""
SELECT event_id, user_id, vbucket,
       {sql_zorder_key(sql_zbucket('user_id'), sql_zbucket('vbucket'))} AS zkey
FROM (
  SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS vbucket
  FROM events)
ORDER BY zkey, event_id
LIMIT {ZORDER_TOP}
"""


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style single-pass profile of lineitem's key columns."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return profile_table(li, PROFILE_COLS)


PROFILE_LINEITEM_SQL = sql_profile("lineitem", PROFILE_COLS)


QUERIES = {
    "events_zorder_layout": events_zorder_layout,
    "profile_lineitem": profile_lineitem,
}

ORACLE_SQL = {
    "events_zorder_layout": EVENTS_ZORDER_SQL,
    "profile_lineitem": PROFILE_LINEITEM_SQL,
}
