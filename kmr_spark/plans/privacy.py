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
