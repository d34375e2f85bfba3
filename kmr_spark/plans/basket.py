"""Market-basket co-occurrence mining over lineitem.

The association-rules candidate-generation shape: for every order,
every unordered pair of distinct parts bought together, counted by
support across all orders — the frequent-itemset kernel (the pair
level of Apriori) expressed as one keyed self-join.

Scale shape: the self-join keys on l_orderkey, so pair generation is
per-order local after one shuffle; per-order fanout is C(k,2) with k =
items per order (max 13 here, bounded ~single digits for real carts),
so the pair stream is a small constant times |lineitem| — never
corpus². The support count is an ordinary map-side-combinable
aggregate, and the top-N is TakeOrdered (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables

TOP_PAIRS = 50


def part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TOP_PAIRS part pairs by order co-occurrence support;
    deterministic tiebreak by (part_a, part_b)."""
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("part_a"),
                 F.col("b.l_partkey").alias("part_b"))
        .agg(F.count("*").alias("support"))
    )
    return (
        pairs.orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(TOP_PAIRS)
    )


COOCCURRENCE_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey)
SELECT part_a, part_b, support FROM pairs
ORDER BY support DESC, part_a, part_b
LIMIT {TOP_PAIRS}
"""


QUERIES = {"part_cooccurrence": part_cooccurrence}
ORACLE_SQL = {"part_cooccurrence": COOCCURRENCE_SQL}
