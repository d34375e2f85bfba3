"""Bucketed range (interval) join — points into [lo, hi) intervals.

Spark has no native range-join strategy: ``points.join(intervals,
(p >= lo) & (p < hi))`` compiles to BroadcastNestedLoopJoin (every
point × every interval) — O(|P|·|I|) work that dies long before
100 TB. The scalable form used here is the standard bucketing
rewrite (the same family as Databricks' range-join hint and Flink's
interval join): pick a bucket width W, give every point the single
bucket floor(p/W), explode every interval into the buckets its span
covers, equi-join on the bucket id, then apply the exact [lo, hi)
predicate. Each qualifying (point, interval) pair meets in EXACTLY
one bucket — the point's — so no post-join distinct is needed.

Scale shape: one hash shuffle on the bucket id (or a broadcast when
the exploded interval side is small, which AQE picks automatically);
interval fanout is bounded by span/W + 1. Choose W near the typical
interval span: fanout stays O(1) while each bucket pairs a point only
with the few intervals overlapping its W-neighborhood. Skewed buckets
(a hot hour) are ordinary join skew — AQE skew-join splits them.

Reference parity: KMR expresses joins as key-match over sorted KVS
(kmr_match, /root/reference/src/kmrmoreops.c:391) and has no interval
form; this is a beyond-reference operator per the build brief
(sessionized attribution, campaign windows, time-range enrichment).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_bucket_width(intervals: DataFrame, lo_col: str, hi_col: str) -> int:
    """Derive the bucket width from the intervals' own span stats: the
    ceiling of the mean valid span (one tiny aggregate, driver scalar —
    the same replicated-state pattern as k-means centroids). W near the
    typical span is the fanout/selectivity balance point: each interval
    explodes into ~2 buckets, and a point's bucket pairs it only with
    intervals overlapping its W-neighborhood. Degenerate inputs (no
    valid intervals) fall back to 1."""
    row = intervals.select(
        F.avg(F.when(F.col(hi_col) > F.col(lo_col),
                     F.col(hi_col) - F.col(lo_col))).alias("s")).first()
    return max(1, math.ceil(row["s"] or 1))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``lo <= point < hi``. All three bound columns must be integral
    (cast timestamps to epoch micros first); ``bucket_width`` is in
    the same unit and defaults to :func:`auto_bucket_width` of the
    interval side. Output carries all columns of both inputs.
    """
    if bucket_width is None:
        bucket_width = auto_bucket_width(intervals, lo_col, hi_col)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    p = points.withColumn("__bk", F.expr(f"{point_col} DIV {bucket_width}"))
    # An empty/inverted interval (hi <= lo) matches no point under
    # [lo, hi) — but fed to sequence() with start > stop it would
    # auto-step by -1 and explode into (lo-hi)/W junk bucket rows. Drop
    # such rows up front; the join result is identical.
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    iv = intervals.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.expr(f"{lo_col} DIV {bucket_width}"),
                # hi is exclusive: an interval ending exactly on a bucket
                # boundary never reaches into that bucket
                F.expr(f"({hi_col} - 1) DIV {bucket_width}"),
            )
        ),
    )
    return (
        p.join(iv, "__bk")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join: pairs with
    ``l_lo < r_hi AND r_lo < l_hi`` (half-open [lo, hi) semantics; a
    raw theta join compiles to BroadcastNestedLoopJoin, this doesn't).

    Same bucketing rewrite as :func:`range_join`, extended to two
    exploded sides: every interval covers the buckets its span touches,
    the equi-join meets candidate pairs bucket-by-bucket, and the exact
    overlap predicate filters. Because an overlapping pair shares EVERY
    bucket in the overlap region, the pair is kept only in the single
    bucket containing ``greatest(l_lo, r_lo)`` — the overlap's first
    instant — so no distinct is needed (the same exactly-once trick as
    the point join, and the property the unit tests pin).

    ``bucket_width`` defaults to :func:`auto_bucket_width` of the RIGHT
    side; empty/inverted intervals on either side are dropped (they
    overlap nothing under [lo, hi)).
    """
    if bucket_width is None:
        bucket_width = auto_bucket_width(right, r_lo, r_hi)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    def explode_side(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.filter(F.col(hi) > F.col(lo)).withColumn(
            "__bk",
            F.explode(
                F.sequence(
                    F.expr(f"{lo} DIV {bucket_width}"),
                    F.expr(f"({hi} - 1) DIV {bucket_width}"),
                )
            ),
        )

    lf = explode_side(left, l_lo, l_hi)
    rf = explode_side(right, r_lo, r_hi)
    return (
        lf.join(rf, "__bk")
        .filter(
            (F.col(l_lo) < F.col(r_hi))
            & (F.col(r_lo) < F.col(l_hi))
            & (F.col("__bk")
               == F.expr(f"greatest({l_lo}, {r_lo}) DIV {bucket_width}"))
        )
        .drop("__bk")
    )
