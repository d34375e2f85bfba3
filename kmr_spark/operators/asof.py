"""As-of (most-recent-prior) join — a custom operator the reference
lacks (SURVEY.md §2.4 "Not present: ... as-of joins") and Spark has no
native operator for, expressed as a composition of existing DataFrame
ops per the engine's custom-operator policy.

Algorithm (the scalable union-window form, no range self-join):
tag right rows 0 and left rows 1, union, and for every row take
``last(right_value, ignorenulls=True)`` over a window partitioned by
the by-key and ordered by (time, tag) up to the current row. Each left
row then carries the most recent right row with ts' <= ts. One shuffle
on the by-key, linear scan per partition — survives 100 TB where a
range-condition join (O(n*m) per key) would not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[on] <= left[on]`` within the same ``by`` group (NULLs when
    no prior right row exists).

    ``on`` must be orderable; right rows at exactly the same time match
    (tag 0 sorts before the left row's tag 1).
    """
    lcols = left.columns
    l_tag = left.withColumn("__tag", F.lit(1))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        by, on,
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    ).withColumn("__tag", F.lit(0))
    for c in lcols:
        if c not in (by, on) and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in right_cols],
    )
    out = filled.filter(F.col("__tag") == 1).select(
        *lcols, *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_cols])
    return out
