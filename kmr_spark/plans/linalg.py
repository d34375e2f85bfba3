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


QUERIES = {"linalg_matmul": matmul}
ORACLE_SQL = {"linalg_matmul": MATMUL_SQL}
