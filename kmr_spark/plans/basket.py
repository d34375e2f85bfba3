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


#: minimum pair support for an association rule (standard cutoff —
#: lift on singleton pairs is noise)
RULE_MIN_SUPPORT = 3


def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for part pairs with
    support >= RULE_MIN_SUPPORT, the three classic metrics in integer
    permille — support (share of orders containing both), confidence
    (both | a), and lift ((p_ab·N) / (p_a·p_b), >1000 = positive
    association). The market-basket rule mining every recommender
    bootstrap runs; all ratios integer DIV, so the oracle is exact.

    Plan: distinct (order, part) once; the pair build joins it to
    itself ON the order key (co-partitioned equi-join, pair volume
    bounded by Σ C(basket,2) — baskets are small, never all-pairs);
    per-part counts broadcast back onto the |pairs|-sized rule table.
    """
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count("*").alias("n_orders"))
    part_counts = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("part_a"),
                 F.col("b.l_partkey").alias("part_b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= RULE_MIN_SUPPORT)
    )
    ca = part_counts.select(F.col("l_partkey").alias("part_a"),
                            F.col("c").alias("n_a"))
    cb = part_counts.select(F.col("l_partkey").alias("part_b"),
                            F.col("c").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .selectExpr(
            "part_a", "part_b", "n_ab", "n_a", "n_b",
            "(1000 * n_ab) DIV n_orders AS support_permille",
            "(1000 * n_ab) DIV n_a AS confidence_permille",
            "(1000 * n_ab * n_orders) DIV (n_a * n_b) AS lift_permille")
        .orderBy("part_a", "part_b")
    )


BASKET_RULES_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
pc AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {RULE_MIN_SUPPORT})
SELECT p.part_a, p.part_b, p.n_ab,
       ca.c AS n_a, cb.c AS n_b,
       (1000 * p.n_ab) // t.n_orders AS support_permille,
       (1000 * p.n_ab) // ca.c AS confidence_permille,
       (1000 * p.n_ab * t.n_orders) // (ca.c * cb.c) AS lift_permille
FROM pairs p
JOIN pc ca ON ca.l_partkey = p.part_a
JOIN pc cb ON cb.l_partkey = p.part_b
CROSS JOIN tot t
ORDER BY p.part_a, p.part_b
"""


QUERIES["basket_rules"] = basket_rules
ORACLE_SQL["basket_rules"] = BASKET_RULES_SQL
