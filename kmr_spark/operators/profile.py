"""Table profiling — the ANALYZE pass of a data pipeline.

One aggregation pass computes, for every requested column: row count,
null count, exact distinct count, and min/max (rendered as strings so
heterogeneous column types share one output schema). The output is one
narrow row per column — the statistics a 100 TB ingest job publishes
to its catalog for pruning, skew planning, and data-quality gates.

Plan shape: a single groupBy-less aggregate over the scan computes ALL
columns' (count, nulls, min, max) in one pass; the exact
distinct-counts ride the same job as Spark rewrites multiple
count(DISTINCT x) aggregates into one Expand + two-stage aggregate.
At 100 TB the exact NDV would switch to approx_count_distinct (HLL,
operators/skew.py) — exact is kept here because the driver gate
compares against DuckDB's exact COUNT(DISTINCT).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_s, max_s) per column."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
            .alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_s"),
            F.col(f"{c}__max").alias("max_s"),
        )
        for c in cols
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .orderBy("col_name")
    )


def sql_profile(table: str, cols: list[str]) -> str:
    """DuckDB twin: one SELECT per column, UNION ALL, same casts.

    Note: string min/max must agree across engines — both compare
    raw byte/codepoint order for ASCII, which the testdata columns
    are. The numeric casts go through the same CAST-to-VARCHAR
    rendering (DuckDB and Spark print integers/doubles identically
    for the exact values these tables hold).
    """
    parts = [
        f"""SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_s,
       MAX(CAST({c} AS VARCHAR)) AS max_s
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY col_name"
