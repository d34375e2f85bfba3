"""Deterministic sampling operators for training-data pipelines.

A 100 TB pipeline samples constantly — holdout splits, per-source
mixture weights, debug slices — and at that scale the sample must be a
PURE FUNCTION of the row, not of the task attempt: ``df.sample()``
draws from a per-partition RNG stream, so a fetch-failure retry or an
AQE re-plan can change which rows survive mid-job (the same class of
bug the skew salts had before ee595e4). These operators decide
keep/drop from a multiplicative hash of the row's own key, so every
re-execution, every engine, and the DuckDB oracle agree row-for-row.

Reference parity: KMR has no sampling surface (SURVEY §2 gap); its
closest idiom is kmr_map with a caller-side filter. Beyond-reference
per the build brief (mixture/holdout construction).

Scale shape: a narrow filter expression — no shuffle, no UDF, fully
whole-stage-codegen, pushed to the scan where the key columns allow.
Stratified rates compile to a CASE chain over the stratum column, so
the per-stratum thresholds ride the same single pass.

Hash: h(x) = (((x mod 999983) + salt) * 2654435761) mod 1000000007.
Knuth's multiplicative constant; the pre-reduction keeps the product
well inside int64 so the arithmetic is exact under Spark's ANSI mode
(no overflow exception) and bit-identical in any engine with 64-bit
integers. Not cryptographic — fine for sampling, NOT for adversarial
splits. The ``salt`` decorrelates repeated draws on the same key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P_PRE = 999983          # largest prime < 1e6: keeps the product exact
_A = 2654435761          # Knuth multiplicative hashing constant (2^32 * phi)
_P_MOD = 1000000007      # hash range; also the rate denominator


def hash_bucket(key: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 1000000007) from an integer key
    column (negative keys fold in via positive modulo — a plain ``%``
    would go negative and sit below every threshold, silently keeping
    100% of such rows). Same formula the oracle SQL writes out."""
    if salt < 0:
        raise ValueError(f"salt must be non-negative, got {salt}")
    return (F.pmod(key, F.lit(_P_PRE)) + F.lit(salt)) * _A % _P_MOD


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return int(rate * _P_MOD)


def hash_sample(df: DataFrame, rate: float, key: str, salt: int = 0) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, decided by the
    hash of ``key`` alone — stable under retries and re-partitioning."""
    return df.filter(hash_bucket(F.col(key), salt) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum: str,
    key: str,
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: rows whose ``stratum`` value
    maps to rate r keep a ~r hash-fraction; unlisted strata keep
    ``default_rate``. One codegen'd filter pass, no shuffle."""
    thr: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum) == value, F.lit(_threshold(rate))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key), salt) < thr)


def sample_k_per_group(df: DataFrame, k: int, group: str, key: str,
                       salt: int = 0) -> DataFrame:
    """Deterministic uniform k-sample WITHIN each group (the reservoir-
    sampling use case, made retry-stable): rank rows by their key hash
    inside the group and keep the k smallest. One window per group key
    — partitions across executors, state is the group's rows, and the
    chosen k are a pure function of the data. Ties in the hash break by
    the key itself, so the result is total-order deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(
        hash_bucket(F.col(key), salt).asc(), F.col(key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sql_bucket(key_expr: str, salt: int = 0) -> str:
    """The oracle-side twin of :func:`hash_bucket` (ANSI SQL).

    DuckDB's ``%`` follows the dividend's sign, so positive modulo is
    spelled ``((x % p) + p) % p`` to mirror Spark's pmod on negatives.
    """
    pm = f"((({key_expr}) % {_P_PRE} + {_P_PRE}) % {_P_PRE})"
    return f"(({pm} + {salt}) * {_A}) % {_P_MOD}"


def weighted_sample_key(key: Column, weight: Column, salt: int = 0) -> Column:
    """Efraimidis–Spirakis (2006) weighted-reservoir key: the k rows
    with the LARGEST ``qln(u)/w`` (u = a deterministic uniform in (0,1]
    from the row's hash, w > 0 the row weight) are an exact weighted
    sample without replacement. qln(u)/w is order-equivalent to the
    paper's u^(1/w) but avoids pow(), and the log is QUANTIZED —
    qln(x) = floor(ln(x)*1e9)/1e9 — because Spark's JVM log and
    DuckDB's libm can differ in the last ulp for identical inputs
    (the events_user_entropy lesson); u itself is an exact integer
    ratio and the remaining divisions are IEEE-identical fixed trees.
    1e-9 key quantization cannot reorder draws except at ties the
    caller already breaks by key."""
    u = (hash_bucket(key, salt) + 1).cast("double") / float(_P_MOD + 1)
    return (F.floor(F.log(u) * F.lit(1e9)).cast("double")
            / F.lit(1e9) / weight)


def sql_weighted_key(key_expr: str, weight_expr: str, salt: int = 0) -> str:
    """Oracle twin of :func:`weighted_sample_key`."""
    return (f"CAST(floor(ln(CAST(({sql_bucket(key_expr, salt)}) + 1"
            f" AS DOUBLE) / {float(_P_MOD + 1)!r}) * 1e9) AS DOUBLE)"
            f" / 1e9 / ({weight_expr})")
