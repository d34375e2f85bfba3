"""Distributed matrix multiply (reference capability evidence:
ex/phoenix-matrix-multiply.c, SURVEY.md §2.12).

The reference ports Phoenix's MapReduce matmul: emit (k, A_ik) and
(k, B_kj), cogroup on k, emit partial products, reduce on (i, j).
Spark-first: that is literally a join on k + groupBy (i, j) sum — the
COO (coordinate-format) sparse matmul, whose shuffle keys (k, then
(i,j)) are exactly the two exchanges any distributed matmul needs.
Entries are integers derived deterministically from lineitem, so sums
are exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables

A_ROWS = 40  # A is A_ROWS x INNER, B is INNER x B_COLS (sparse COO)
INNER = 30
B_COLS = 20


def matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C = A x B over COO matrices derived from lineitem; output
    (i, j, c) for nonzero cells."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = (
        li.select(
            (F.col("l_orderkey") % A_ROWS).alias("i"),
            (F.col("l_partkey") % INNER).alias("k"),
            (F.col("l_linenumber") % 5 + 1).cast("long").alias("va"),
        )
        .groupBy("i", "k").agg(F.sum("va").alias("va"))
    )
    b = (
        li.select(
            (F.col("l_partkey") % INNER).alias("k"),
            (F.col("l_suppkey") % B_COLS).alias("j"),
            (F.col("l_quantity").cast("long") % 7 + 1).alias("vb"),
        )
        .groupBy("k", "j").agg(F.sum("vb").alias("vb"))
    )
    return (
        a.join(b, "k")
        .select("i", "j", (F.col("va") * F.col("vb")).alias("p"))
        .groupBy("i", "j")
        .agg(F.sum("p").alias("c"))
        .orderBy("i", "j")
    )


MATMUL_SQL = f"""
WITH a AS (
  SELECT l_orderkey % {A_ROWS} AS i, l_partkey % {INNER} AS k,
         SUM(l_linenumber % 5 + 1) AS va
  FROM lineitem GROUP BY 1, 2),
b AS (
  SELECT l_partkey % {INNER} AS k, l_suppkey % {B_COLS} AS j,
         SUM(CAST(l_quantity AS BIGINT) % 7 + 1) AS vb
  FROM lineitem GROUP BY 1, 2)
SELECT a.i, b.j, CAST(SUM(a.va * b.vb) AS BIGINT) AS c
FROM a JOIN b ON a.k = b.k
GROUP BY a.i, b.j ORDER BY a.i, b.j
"""


def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension normalization statistics over the embeddings
    corpus — the whitening-prep pass every embedding pipeline runs
    before indexing/training: for each of the 64 dimensions, the count,
    mean, and variance of that coordinate.

    Exactness: per-value float->DECIMAL(20,12) casts are deterministic,
    DECIMAL sums are order-free, and variance uses the single fixed
    form (n*Q - S^2)/n^2 computed from the decimal moments, so both
    engines produce identical doubles. Plan shape: one posexplode (the
    corpus read) into a 64-key aggregate — map-side combinable, the
    shuffle carries 64 rows per partition.
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    vals = emb.select(F.posexplode(
        F.transform(F.col("embedding"),
                    lambda x: x.cast("double").cast("decimal(20,12)"))
    ).alias("dim", "v"))
    stats = vals.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"))
    mean = (F.col("s").cast("double") / F.col("n"))
    var = ((F.col("n").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double"))
           / (F.col("n").cast("double") * F.col("n").cast("double")))
    return (
        stats.select(F.col("dim").cast("long").alias("dim"), "n",
                     mean.alias("mean"), var.alias("variance"))
        .orderBy("dim")
    )


EMB_DIM_STATS_SQL = """
WITH vals AS (
  SELECT CAST(i - 1 AS BIGINT) AS dim,
         CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(20,12)) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
stats AS (
  SELECT dim, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS q
  FROM vals GROUP BY dim)
SELECT dim, n,
       CAST(s AS DOUBLE) / n AS mean,
       (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS variance
FROM stats ORDER BY dim
"""


QUERIES = {"linalg_matmul": matmul, "emb_dim_stats": emb_dim_stats}
ORACLE_SQL = {"linalg_matmul": MATMUL_SQL, "emb_dim_stats": EMB_DIM_STATS_SQL}
