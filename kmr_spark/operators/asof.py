"""As-of (most-recent-prior) join — a custom operator the reference
lacks (SURVEY.md §2.4 "Not present: ... as-of joins") and Spark has no
native operator for, expressed as a composition of existing DataFrame
ops per the engine's custom-operator policy.

Algorithm (the scalable union-window form, no range self-join):
tag right rows 0 and left rows 1, union, and for every row take
``last(right_value, ignorenulls=True)`` over a window partitioned by
the by-key and ordered by (time, tag, right-order-key) up to the
current row. Each left row then carries the most recent right row with
ts' <= ts. One shuffle on the by-key, linear scan per partition —
survives 100 TB where a range-condition join (O(n*m) per key) would
not.

Scale form: when the caller names a unique ``left_key``, only the
skinny spine (by, on, left_key) rides the window shuffle+sort; the
left payload is re-attached afterwards with an equi-join on that key.
The window's sort buffer then holds keys, not payloads — the part of
this plan that actually hurts at 100 TB. Without a left_key the
payload rides the window (fine for narrow left tables).

Determinism: when several right rows share the same (by, on) value the
window's final order key is ``right_order`` (default: the first
right_col), so "the" most recent right row is the one with the largest
order-key value — stable across runs and engines, never whichever row
the shuffle happened to deliver last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    left_key: str | None = None,
    right_order: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the matching right row within the same
    ``by`` group (NULLs when none exists):

    - ``direction="backward"`` (default): the LATEST right row with
      ``right[on] <= left[on]`` — most-recent-prior semantics. Ties
      among simultaneous right rows resolve to the LARGEST
      ``right_order`` value.
    - ``direction="forward"``: the EARLIEST right row with
      ``right[on] >= left[on]`` — next-event semantics (time-to-next-
      purchase, SLA clocks). Ties resolve to the SMALLEST
      ``right_order`` value. Same union-window plan, with the frame
      flipped to (current row, unbounded following) and the tag order
      reversed so an equal-time right row still matches.

    ``on`` must be orderable; right rows at exactly the same time match
    in both directions.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lcols = left.columns
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)
    rord = right_order or right_cols[0]

    spine_src = left.select(by, on, F.col(left_key).alias("__lk")) if left_key else left
    l_tag = (
        spine_src.withColumn("__tag", F.lit(1))
        # constant order key for left rows: their relative order cannot
        # change the last() result (they carry no right values), but a
        # non-NULL constant keeps both engines' sort semantics identical
        .withColumn("__rord", F.lit(0).cast(rdt[rord]))
    )
    for c in right_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(rdt[c]))
    r_tag = (
        right.select(
            by, on,
            *[F.col(c).alias(f"__r_{c}") for c in right_cols])
        .withColumn("__tag", F.lit(0))
        .withColumn("__rord", F.col(f"__r_{rord}"))
    )
    if left_key:
        r_tag = r_tag.withColumn("__lk", F.lit(None).cast(ldt[left_key]))
    else:
        for c in lcols:
            if c not in (by, on) and c not in r_tag.columns:
                r_tag = r_tag.withColumn(c, F.lit(None).cast(ldt[c]))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__tag").asc(),
                     F.col("__rord").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(f"__r_{c}", ignorenulls=True).over(w)
    else:
        # left rows (tag 1) sort BEFORE right rows (tag 0) at the same
        # time, so an equal-time right row sits inside the following
        # frame; first() then grabs the earliest / smallest-__rord one
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__tag").desc(),
                     F.col("__rord").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(f"__r_{c}", ignorenulls=True).over(w)
    filled = u.select(
        "*",
        *[pick(c).alias(f"__m_{c}") for c in right_cols],
    )
    matched = filled.filter(F.col("__tag") == 1)
    if left_key:
        vals = matched.select(
            "__lk", *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_cols])
        return left.join(vals, left[left_key] == vals["__lk"], "left").select(
            *lcols, *[f"asof_{c}" for c in right_cols])
    return matched.select(
        *lcols, *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_cols])
