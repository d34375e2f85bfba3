"""Runtime-filter (Bloom semi-join reduction) demonstration query:
prune the lineitem fact scan with a Bloom filter built from a selective
orders predicate, and report per returnflag both the bloom-passed and
the exactly-matching row counts — the false-positive margin is visible
and deterministic, so even the approximation is oracle-gated.

At 100 TB this is the difference between shuffling every fact row into
a join and shuffling ~selectivity of them: the bitmap (here 256 longs)
is broadcast state, the membership test is a codegen'd bit probe that
rides the fact scan (operators/bloom.py). KMR parity: the replicated
small side is kmr_replicate (src/kmrbase.c); the scan-side filter is
the mapper-side select KMR programs fold into kmr_map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.operators.bloom import (
    BITS_PER_WORD,
    _sql_positions,
    bloom_build,
    bloom_might_contain,
    sql_bloom_words,
)
from kmr_spark.session import load_tables, widen

PRICE_CUTOFF = 400000.0
M_BITS = 8192  # 256 words; FP ~0.5% at the cutoff's key count


def lineitem_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per returnflag: lineitem rows surviving the Bloom probe of
    high-value orderkeys vs rows that exactly match (left-semi)."""
    t = load_tables(spark, sf_dir)
    dim = t["orders"].filter(F.col("o_totalprice") > PRICE_CUTOFF).select(
        "o_orderkey")
    bitmap = bloom_build(dim, "o_orderkey", M_BITS)
    li = widen(t["lineitem"]).select("l_returnflag", "l_orderkey")
    passed = li.filter(bloom_might_contain(F.col("l_orderkey"), bitmap))
    bp = passed.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_bloom_pass"))
    ex = (
        passed.join(F.broadcast(dim),
                    passed["l_orderkey"] == dim["o_orderkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    return (
        bp.join(ex, "l_returnflag", "left")
        .select("l_returnflag", "n_bloom_pass",
                F.coalesce(F.col("n_exact"), F.lit(0)).cast("long")
                .alias("n_exact"))
        .orderBy("l_returnflag")
    )


_DIM_SQL = f"SELECT o_orderkey FROM orders WHERE o_totalprice > {PRICE_CUTOFF}"
_P1, _P2 = _sql_positions("l_orderkey", M_BITS)

BLOOM_PRUNE_SQL = f"""
WITH bloomwords AS ({sql_bloom_words(_DIM_SQL, 'o_orderkey', M_BITS)}),
passed AS (
  SELECT l.l_returnflag, l.l_orderkey
  FROM lineitem l
  JOIN bloomwords b1 ON b1.w = ({_P1}) // {BITS_PER_WORD}
  JOIN bloomwords b2 ON b2.w = ({_P2}) // {BITS_PER_WORD}
  WHERE (b1.word >> CAST(({_P1}) % {BITS_PER_WORD} AS INT)) % 2 <> 0
    AND (b2.word >> CAST(({_P2}) % {BITS_PER_WORD} AS INT)) % 2 <> 0),
bp AS (SELECT l_returnflag, COUNT(*) AS n_bloom_pass
       FROM passed GROUP BY l_returnflag),
ex AS (SELECT l_returnflag, COUNT(*) AS n_exact
       FROM passed WHERE l_orderkey IN ({_DIM_SQL})
       GROUP BY l_returnflag)
SELECT bp.l_returnflag,
       CAST(bp.n_bloom_pass AS BIGINT) AS n_bloom_pass,
       CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact
FROM bp LEFT JOIN ex ON bp.l_returnflag = ex.l_returnflag
ORDER BY bp.l_returnflag
"""


QUERIES = {"lineitem_bloom_prune": lineitem_bloom_prune}
ORACLE_SQL = {"lineitem_bloom_prune": BLOOM_PRUNE_SQL}
