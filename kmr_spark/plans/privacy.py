"""Privacy-risk audits: k-anonymity / l-diversity census over a
quasi-identifier projection.

A training-data pipeline that exports user-derived tables needs the
re-identification risk number BEFORE the export ships: how many rows
sit in quasi-identifier groups smaller than k, and does any group
collapse to a single sensitive value (l-diversity = 1 means the QI
combination reveals the attribute outright). This is the grouped-
count shape the reference's kmr_count_keys covers
(/root/reference/src/kmrmoreops.c:346) pointed at a governance
question instead of a wordcount.

Plan: ONE aggregation over the table keyed by the QI tuple (shuffle
keyed by QI — the only data-sized exchange), then a scalar rollup of
the tiny group census. All outputs are BIGINTs or count ratios from
one fixed expression tree, so the driver hash is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables

#: k thresholds audited (columns, not rows, so the output is one row
#: whose schema is stable across scale factors)
K_LEVELS = (2, 5, 10)


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity / l-diversity audit of customer over the
    quasi-identifiers (mktsegment, nationkey) with the account-balance
    band (floor(acctbal/1000)) as the sensitive attribute.

    One row: group/row totals, rows+groups below each k in K_LEVELS,
    the minimum l-diversity over all groups, and the k=5 at-risk row
    share (single fixed-tree double).
    """
    cust = load_tables(spark, sf_dir)["customer"]
    groups = (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("g_size"),
             F.countDistinct(
                 F.floor(F.col("c_acctbal") / 1000).cast("long"))
             .alias("l_div"))
    )
    agg = [F.count("*").alias("n_groups"),
           F.sum("g_size").alias("n_rows"),
           F.min("l_div").alias("min_l_diversity")]
    for k in K_LEVELS:
        below = F.col("g_size") < k
        agg.append(F.count(F.when(below, 1)).alias(f"groups_below_k{k}"))
        agg.append(F.sum(F.when(below, F.col("g_size")).otherwise(0))
                   .alias(f"rows_below_k{k}"))
    out = groups.groupBy().agg(*agg)
    return out.select(
        "*",
        (F.col("rows_below_k5").cast("double")
         / F.col("n_rows").cast("double")).alias("at_risk_share_k5"))


_K_COLS = "\n".join(
    f"    COUNT(CASE WHEN g_size < {k} THEN 1 END) AS groups_below_k{k},\n"
    f"    CAST(SUM(CASE WHEN g_size < {k} THEN g_size ELSE 0 END) AS BIGINT)"
    f" AS rows_below_k{k}," for k in K_LEVELS)

K_ANONYMITY_SQL = f"""
WITH groups AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS g_size,
         COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_div
  FROM customer GROUP BY 1, 2),
census AS (
  SELECT COUNT(*) AS n_groups, CAST(SUM(g_size) AS BIGINT) AS n_rows,
         MIN(l_div) AS min_l_diversity,
{_K_COLS}
  FROM groups)
SELECT n_groups, n_rows, min_l_diversity,
       groups_below_k2, rows_below_k2, groups_below_k5, rows_below_k5,
       groups_below_k10, rows_below_k10,
       CAST(rows_below_k5 AS DOUBLE) / CAST(n_rows AS DOUBLE)
         AS at_risk_share_k5
FROM census
"""


QUERIES = {"privacy_k_anonymity": privacy_k_anonymity}
ORACLE_SQL = {"privacy_k_anonymity": K_ANONYMITY_SQL}


def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity census re-run at three generalization levels of the
    customer quasi-identifiers — L0 = (mktsegment, nationkey), L1 =
    (mktsegment, regionkey), L2 = (mktsegment) — the ladder a release
    process climbs until every group clears k: each row shows what the
    next coarsening buys (fewer small groups) and costs (l-diversity
    of the sensitive acctbal band collapsing toward the global mix).

    Plan: one broadcast join to nation for the region rollup, then one
    aggregation per level over the same base frame (three keyed
    shuffles of a dimension-sized table; at 100 TB the QI projection
    is the only thing shuffled). Integer outputs only.
    """
    t = load_tables(spark, sf_dir)
    base = (
        t["customer"].join(
            F.broadcast(t["nation"].select(
                F.col("n_nationkey"), F.col("n_regionkey"))),
            F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_mktsegment", "c_nationkey", "n_regionkey",
                F.floor(F.col("c_acctbal") / 1000).cast("long")
                .alias("sens"))
    )
    levels = (
        ("L0_segment_nation", ["c_mktsegment", "c_nationkey"]),
        ("L1_segment_region", ["c_mktsegment", "n_regionkey"]),
        ("L2_segment", ["c_mktsegment"]),
    )
    outs = []
    for name, qi in levels:
        groups = base.groupBy(*qi).agg(
            F.count("*").alias("g_size"),
            F.countDistinct("sens").alias("l_div"))
        outs.append(groups.agg(
            F.lit(name).alias("level"),
            F.count("*").alias("n_groups"),
            F.min("g_size").alias("min_group"),
            F.count(F.when(F.col("g_size") < 5, 1))
            .alias("groups_below_k5"),
            F.sum(F.when(F.col("g_size") < 5, F.col("g_size"))
                  .otherwise(0)).alias("rows_below_k5"),
            F.min("l_div").alias("min_l_diversity")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("level")


def _ladder_sql() -> str:
    parts = []
    for name, qi in (("L0_segment_nation", "c_mktsegment, c_nationkey"),
                     ("L1_segment_region", "c_mktsegment, n_regionkey"),
                     ("L2_segment", "c_mktsegment")):
        parts.append(f"""
SELECT '{name}' AS level, COUNT(*) AS n_groups,
       MIN(g_size) AS min_group,
       COUNT(CASE WHEN g_size < 5 THEN 1 END) AS groups_below_k5,
       CAST(SUM(CASE WHEN g_size < 5 THEN g_size ELSE 0 END) AS BIGINT)
         AS rows_below_k5,
       MIN(l_div) AS min_l_diversity
FROM (
  SELECT {qi}, COUNT(*) AS g_size,
         COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS l_div
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY {qi})""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY level"


LADDER_SQL = _ladder_sql()

QUERIES["privacy_generalization_ladder"] = privacy_generalization_ladder
ORACLE_SQL["privacy_generalization_ladder"] = LADDER_SQL


T_LEVELS_PERMILLE = (200, 300, 500)  # t = 0.2 / 0.3 / 0.5


# r12 revert: the r11 single-pass/persist rewrite of this query was a
# kept-for-scale trade pending sf10 evidence (VERDICT r11 ask #3); the
# sf10 A/B (OPTIMIZATION_r12.md) measured the pre-rewrite form faster
# at BOTH sf0.1 and sf10, so the rewrite is reverted per the verdict's
# measure-or-revert rule.
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS audit over the same QI scheme as the k-anonymity
    query ((mktsegment, nationkey), sensitive = acctbal band): per QI
    group the total-variation distance between the group's sensitive
    distribution and the global one, reported as one summary row —
    max/avg TV (integer permille) and group counts above each t in
    T_LEVELS_PERMILLE. l-diversity (privacy_k_anonymity) only counts
    distinct sensitive values; t-closeness catches the skew attack
    where a group technically has l values but 99% of its mass sits
    on one of them.

    Exactness: TV over a common denominator — sum_s |cnt_gs*n -
    cnt_s*g| is an integer, tv_permille = (1000*sum) DIV (2*g*n).
    Scale: the sensitive-band dimension is BOUNDED (|bands| ~ 12), so
    the groups x bands grid rides a broadcast; everything upstream is
    two map-side-combinable aggregations of the corpus."""
    cust = load_tables(spark, sf_dir)["customer"]
    band = F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band")
    gs = cust.groupBy("c_mktsegment", "c_nationkey", band) \
        .agg(F.count("*").alias("cnt_gs"))
    glob = cust.groupBy(band).agg(F.count("*").alias("cnt_s"))
    totals = cust.agg(F.count("*").alias("n"))
    groups = gs.groupBy("c_mktsegment", "c_nationkey") \
        .agg(F.sum("cnt_gs").alias("g_size"))
    grid = groups.crossJoin(F.broadcast(glob))
    tv = (
        grid.join(
            gs, ["c_mktsegment", "c_nationkey", "band"], "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "c_mktsegment", "c_nationkey", "g_size",
            F.abs(F.coalesce("cnt_gs", F.lit(0)) * F.col("n")
                  - F.col("cnt_s") * F.col("g_size")).alias("d"),
            "n")
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.max("g_size").alias("g_size"), F.max("n").alias("n"),
             F.sum("d").alias("sum_d"))
        .select(F.expr("(1000 * sum_d) DIV (2 * g_size * n)")
                .alias("tv_permille"))
    )
    agg = [F.count("*").alias("n_groups"),
           F.max("tv_permille").alias("max_tv_permille"),
           F.expr("SUM(tv_permille) DIV COUNT(*)").alias("avg_tv_permille")]
    for t in T_LEVELS_PERMILLE:
        agg.append(F.count(F.when(F.col("tv_permille") > t, 1))
                   .alias(f"groups_above_t{t}"))
    return tv.groupBy().agg(*agg)


_T_COLS = ",\n".join(
    f"       COUNT(CASE WHEN tv_permille > {t} THEN 1 END)"
    f" AS groups_above_t{t}" for t in T_LEVELS_PERMILLE)

T_CLOSENESS_SQL = f"""
WITH base AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
  FROM customer),
gs AS (
  SELECT c_mktsegment, c_nationkey, band, COUNT(*) AS cnt_gs
  FROM base GROUP BY 1, 2, 3),
gdist AS (SELECT band, COUNT(*) AS cnt_s FROM base GROUP BY band),
totals AS (SELECT COUNT(*) AS n FROM base),
groups AS (
  SELECT c_mktsegment, c_nationkey, CAST(SUM(cnt_gs) AS BIGINT) AS g_size
  FROM gs GROUP BY 1, 2),
tv AS (
  SELECT g.c_mktsegment, g.c_nationkey,
         (1000 * CAST(SUM(abs(COALESCE(s.cnt_gs, 0) * t.n
                               - gl.cnt_s * g.g_size)) AS BIGINT))
           // (2 * MAX(g.g_size) * MAX(t.n)) AS tv_permille
  FROM groups g
  CROSS JOIN gdist gl
  CROSS JOIN totals t
  LEFT JOIN gs s ON s.c_mktsegment = g.c_mktsegment
                AND s.c_nationkey = g.c_nationkey AND s.band = gl.band
  GROUP BY 1, 2)
SELECT COUNT(*) AS n_groups,
       MAX(tv_permille) AS max_tv_permille,
       CAST(SUM(tv_permille) AS BIGINT) // COUNT(*) AS avg_tv_permille,
{_T_COLS}
FROM tv
"""

QUERIES["privacy_t_closeness"] = privacy_t_closeness
ORACLE_SQL["privacy_t_closeness"] = T_CLOSENESS_SQL
