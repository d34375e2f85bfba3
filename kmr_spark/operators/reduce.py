"""Aggregation-family operators (reference: kmr_reduce and friends,
SURVEY.md §2.5).

KMR's redfn sees *all* values of a key at once (kmr_redfn_t, reference
src/kmr.h:740-748) — the direct Spark analogue is grouped-map
``applyInPandas`` (same all-in-memory-per-group caveat). But most real
aggregations are expressible, and the expressible path gets map-side
partial aggregation for free (KMR's "reduce without shuffle is a
combiner" idiom, src/kmrbase.c:2590-2604, is automatic in
HashAggregateExec).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reduce_pairs(
    df: DataFrame,
    fn: Callable[[Any, list[Any]], list[tuple[Any, Any]]],
    schema: str = "key long, value long",
    key: str = "key",
    value: str = "value",
) -> DataFrame:
    """Arbitrary redfn over the full value array of each key
    (kmr_reduce, src/kmrbase.c:2607-2676).

    Grouped-map applyInPandas: one Arrow batch per key group. Same
    memory model as KMR (a group must fit in one worker's memory).
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        names = [f.split()[0].strip() for f in schema.split(",")]
        k = pdf[key].iloc[0]
        out = fn(k, list(pdf[value]))
        return pd.DataFrame(out, columns=names[:2]) if out else pd.DataFrame(
            {names[0]: [], names[1]: []})

    return df.groupBy(key).applyInPandas(run, schema=schema)


def reduce_expr(df: DataFrame, aggs: list[Column], key: str = "key") -> DataFrame:
    """Expression-based reduce — the fast path (JVM partial aggregation)."""
    return df.groupBy(key).agg(*aggs)


def reduce_as_one(df: DataFrame, aggs: list[Column]) -> DataFrame:
    """Whole-input single group (kmr_reduce_as_one, src/kmrbase.c:2683)."""
    return df.agg(*aggs)


def count_keys(df: DataFrame, key: str = "key") -> DataFrame:
    """(key, count) — kmr_count_keys (src/kmrmoreops.c:1009-1024).
    Spark does the local-combine + final-sum split automatically."""
    return df.groupBy(key).agg(F.count("*").alias("count"))


def get_element_count(df: DataFrame) -> int:
    """Global COUNT(*) (kmr_get_element_count, src/kmrmoreops.c:114)."""
    return df.count()


def scan_locally(df: DataFrame, value: str = "value", partition_by: str | None = None,
                 order: list[str | Column] | None = None) -> DataFrame:
    """Non-inclusive running sum within a partition-group
    (kmr_scan_locally, src/kmrbase.c:2962-3021).

    KMR scans in local insertion order; Spark needs an explicit order.
    """
    w = Window.orderBy(*(order or [value]))
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(*(order or [value]))
    w = w.rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn("scan", F.coalesce(F.sum(value).over(w), F.lit(0)))


def scan_on_values(df: DataFrame, value: str = "value",
                   order: list[str | Column] | None = None) -> DataFrame:
    """Global non-inclusive prefix sum + grand total
    (kmr_scan_on_values, src/kmrmoreops.c:943-972).

    Scale note: a single global window is one partition; for the 100 TB
    path use the two-phase form KMR itself uses — per-partition totals,
    driver-side exclusive scan of the (tiny) totals, seed-carrying local
    scans. That is exactly ``ranking``'s implementation strategy; here
    the window form is kept because prefix scans in queries are almost
    always per-group (see scan_locally), and the global form is a
    parity/debug surface.
    """
    w = Window.orderBy(*(order or [value])).rowsBetween(Window.unboundedPreceding, -1)
    total = df.agg(F.sum(value).alias("total"))
    return (
        df.withColumn("scan", F.coalesce(F.sum(value).over(w), F.lit(0)))
        .crossJoin(F.broadcast(total))
    )
