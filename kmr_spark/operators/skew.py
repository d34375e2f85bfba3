"""Skew mitigation: salted joins and approximate sketches.

KMR's answer to skew is count-leveling redistribution
(kmr_shuffle_leveling_pair_count, reference src/kmrmoreops.c:1074),
which balances volume but cannot split one giant key across workers.
Salting can: replicate the small side R ways, scatter the big side's
hot keys across R sub-keys, join on (key, salt). AQE's skew-join
splitting does this adaptively for sort-merge joins; the explicit form
remains useful for aggregations and for broadcast-infeasible cases.

Approximate sketches (HLL count-distinct, t-digest quantiles) are the
100 TB substitutes for exact DISTINCT/percentile — single pass, fixed
memory, mergeable across partitions. The reference has none (SURVEY.md
§2.5 "not present"); they are beyond-reference extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(salt_cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): pmod(xxhash64(row columns)).

    NOT F.rand: rand is re-evaluated per task attempt, so an upstream
    recompute (AQE re-plan, retry after a fetch failure) can change a
    row's salt mid-join — rows silently dropped or duplicated exactly at
    the scale where retries are routine. A content hash gives every
    attempt the same salt.
    """
    return F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``.

    big gets a deterministic per-row salt in [0, n_salts) (hash of
    ``salt_cols``, default: all of big's columns); small is replicated
    n_salts times with every salt value; join on (key, salt). The hot
    key's rows spread over n_salts tasks instead of one straggler.
    Output drops the salt column.

    Only big-side-preserving joins are allowed (inner/left/left_semi/
    left_anti): the replicated small side would emit n_salts copies of
    every unmatched small-side row under right/full outer semantics.
    """
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got {how!r}")
    b = big.withColumn("__salt", _salt(salt_cols or big.columns, n_salts))
    s = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8,
                 salt_cols: list[str] | None = None) -> DataFrame:
    """Two-phase count for a skewed key: pre-aggregate on (key, salt),
    then final-aggregate on key — the explicit form of map-side partial
    aggregation when a single reducer key would overflow."""
    pre = (
        df.withColumn("__salt", _salt(salt_cols or df.columns, n_salts))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("c"))
    )
    return pre.groupBy(key).agg(F.sum("c").alias("count"))


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ count-distinct: one pass, mergeable, ~1.5KB state
    per group at rsd=0.05 — the DISTINCT that works at 100 TB."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def approx_quantiles(df: DataFrame, col: str, probs: list[float], accuracy: int = 10000) -> list[float]:
    """Greenwald-Khanna approximate quantiles (single pass, mergeable)."""
    return df.approxQuantile(col, probs, 1.0 / accuracy)
