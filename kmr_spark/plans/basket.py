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
    from kmr_spark.session import materialize_release

    # the distinct basket table feeds FOUR branches (order total, part
    # counts, both self-join sides) — persist the narrow 2-long-column
    # frame so the lineitem scan + distinct shuffle run once, not 4x
    li = (load_tables(spark, sf_dir)["lineitem"]
          .select("l_orderkey", "l_partkey").distinct().persist())
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
    out = (
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
    return materialize_release(out, li)


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


#: L3 support threshold and report size
TRIPLE_MIN_SUPPORT = 20
TRIPLE_TOP_K = 15


def basket_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent BRAND triples (Apriori L3) over order baskets with
    support and lift against the independence baseline — the step
    beyond part_cooccurrence's pair kernel that catalogs "these three
    move together" bundles. Items are the 25 part brands, so the
    candidate space is bounded (C(25,3) = 2300 groups) no matter how
    large lineitem grows; the per-order triple stream is cubic only
    in the BOUNDED per-basket distinct-brand count.

    Plan: distinct (order, brand) via a broadcast join to part, two
    ordered self-equi-joins keyed on the order (a<b<c kills
    duplicates), one keyed count per triple, then broadcast joins to
    the three singleton supports for the lift. Lift is ONE fixed
    expression tree: support * n_baskets^2 / (s_a * s_b * s_c).
    """
    t = load_tables(spark, sf_dir)
    baskets = (
        t["lineitem"].select("l_orderkey", "l_partkey")
        .join(F.broadcast(t["part"].select("p_partkey", "p_brand")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    arr = (
        baskets.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("brand")).alias("b"))
        .persist()
    )
    try:
        n_baskets = arr.count()  # materializes the persist
        singles = (
            arr.select(F.explode("b").alias("brand"))
            .groupBy("brand").agg(F.count("*").alias("s1")))
        # per-basket triple generation (i<j<k over the SORTED distinct
        # brand array) replaces two shuffle self-joins: the combination
        # stream is generated inside one task per basket, cubic only in
        # the bounded per-basket brand count, then ONE keyed count.
        triples = (
            arr.filter(F.size("b") >= 3)
            .select(F.explode(F.expr(
                "flatten(flatten(transform(sequence(0, size(b)-3), i -> "
                "transform(sequence(i+1, size(b)-2), j -> "
                "transform(sequence(j+1, size(b)-1), k -> "
                "struct(b[i] AS brand_a, b[j] AS brand_b, "
                "b[k] AS brand_c))))))")).alias("t"))
            .select("t.brand_a", "t.brand_b", "t.brand_c")
            .groupBy("brand_a", "brand_b", "brand_c")
            .agg(F.count("*").alias("support"))
            .filter(F.col("support") >= TRIPLE_MIN_SUPPORT)
        )
        enriched = (
            triples
            .join(F.broadcast(singles.withColumnRenamed("brand", "brand_a")
                              .withColumnRenamed("s1", "sa")), "brand_a")
            .join(F.broadcast(singles.withColumnRenamed("brand", "brand_b")
                              .withColumnRenamed("s1", "sb")), "brand_b")
            .join(F.broadcast(singles.withColumnRenamed("brand", "brand_c")
                              .withColumnRenamed("s1", "sc")), "brand_c")
            .selectExpr(
                "brand_a", "brand_b", "brand_c", "support",
                f"CAST(support AS DOUBLE) * CAST({n_baskets} AS DOUBLE)"
                f" * CAST({n_baskets} AS DOUBLE)"
                " / (CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)"
                " * CAST(sc AS DOUBLE)) AS lift")
        )
        return (
            enriched.orderBy(F.col("support").desc(), "brand_a", "brand_b",
                             "brand_c")
            .limit(TRIPLE_TOP_K)
            .localCheckpoint(eager=True)
        )
    finally:
        arr.unpersist()


APRIORI_TRIPLES_SQL = f"""
WITH baskets AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM baskets),
singles AS (SELECT brand, COUNT(*) AS s1 FROM baskets GROUP BY brand),
-- pairs is MATERIALIZED to pin the join order: orderkey equi-joins
-- first, brand inequalities as filters on them. Left free, DuckDB's
-- optimizer at 10x data picks the inequality-only (b x c) edge first
-- — a range join that explodes quadratically (round-7 at-scale sweep:
-- >150 s vs ~1 s for this form; same rows either way).
pairs AS MATERIALIZED (
  SELECT a.l_orderkey, a.brand AS brand_a, b.brand AS brand_b
  FROM baskets a
  JOIN baskets b ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand),
triples AS (
  SELECT p.brand_a, p.brand_b, c.brand AS brand_c,
         COUNT(*) AS support
  FROM pairs p
  JOIN baskets c ON p.l_orderkey = c.l_orderkey AND p.brand_b < c.brand
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= {TRIPLE_MIN_SUPPORT})
SELECT brand_a, brand_b, brand_c, support,
       CAST(support AS DOUBLE) * CAST(n_baskets AS DOUBLE)
       * CAST(n_baskets AS DOUBLE)
       / (CAST(sa.s1 AS DOUBLE) * CAST(sb.s1 AS DOUBLE)
          * CAST(sc.s1 AS DOUBLE)) AS lift
FROM triples CROSS JOIN n
JOIN singles sa ON sa.brand = brand_a
JOIN singles sb ON sb.brand = brand_b
JOIN singles sc ON sc.brand = brand_c
ORDER BY support DESC, brand_a, brand_b, brand_c
LIMIT {TRIPLE_TOP_K}
"""

QUERIES["basket_apriori_triples"] = basket_apriori_triples
ORACLE_SQL["basket_apriori_triples"] = APRIORI_TRIPLES_SQL
