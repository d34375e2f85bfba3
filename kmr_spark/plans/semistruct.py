"""Semi-structured (JSON) extraction and rank-window analytics.

The events table carries a JSON ``props`` column — the shape every
real event pipeline has. Parsing happens at the scan with built-in
JSON path extraction (JVM codegen, no Python), so Catalyst still
prunes columns and pushes filters; at 100 TB the alternative (a UDF
parse) would dominate the query.

events_props_extract also exercises rank windows (percent_rank /
ntile) keyed per event_type — partitioned window input, no global
single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over the JSON `k` property: count, sum, min/max,
    plus how many events sit in the top ntile(4) of k within their type."""
    ev = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    w = Window.partitionBy("event_type").orderBy(
        F.col("k").asc(), F.col("event_id").asc())
    parsed = ev.select("event_id", "event_type", k.alias("k")).filter(
        F.col("k").isNotNull())
    with_rank = parsed.select(
        "event_type", "k",
        F.ntile(4).over(w).alias("quartile"))
    return (
        with_rank.groupBy("event_type", "quartile")
        .agg(F.count("*").alias("n"),
             F.sum("k").alias("k_sum"),
             F.min("k").alias("k_min"),
             F.max("k").alias("k_max"))
        .orderBy("event_type", "quartile")
    )


EVENTS_PROPS_SQL = """
WITH parsed AS (
  SELECT event_id, event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL),
ranked AS (
  SELECT event_type, k,
         NTILE(4) OVER (PARTITION BY event_type
                        ORDER BY k ASC, event_id ASC) AS quartile
  FROM parsed)
SELECT event_type, quartile, COUNT(*) AS n,
       SUM(k) AS k_sum, MIN(k) AS k_min, MAX(k) AS k_max
FROM ranked GROUP BY event_type, quartile
ORDER BY event_type, quartile
"""


def events_value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-window breadth: per-type percent_rank and cume_dist of each
    user's total value; returns the decile summary (order-insensitive
    aggregates over exact window results, so the oracle is exact)."""
    ev = load_tables(spark, sf_dir)["events"]
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_dec").asc(), F.col("user_id").asc())
    ranked = per_user.select(
        "event_type", "user_id",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"))
    decile = (F.floor(F.col("pr") * 10)).cast("long")
    return (
        ranked.select("event_type", decile.alias("decile"), "cd")
        .groupBy("event_type", "decile")
        .agg(F.count("*").alias("n_users"), F.max("cd").alias("max_cume"))
        .orderBy("event_type", "decile")
    )


EVENTS_VALUE_RANK_SQL = """
WITH per_user AS (
  SELECT event_type, user_id,
         SUM(CAST(value AS DECIMAL(18,2))) AS total_dec
  FROM events GROUP BY event_type, user_id),
ranked AS (
  SELECT event_type, user_id,
         PERCENT_RANK() OVER (PARTITION BY event_type
                              ORDER BY total_dec ASC, user_id ASC) AS pr,
         CUME_DIST() OVER (PARTITION BY event_type
                           ORDER BY total_dec ASC, user_id ASC) AS cd
  FROM per_user)
SELECT event_type, CAST(FLOOR(pr * 10) AS BIGINT) AS decile,
       COUNT(*) AS n_users, MAX(cd) AS max_cume
FROM ranked GROUP BY event_type, decile
ORDER BY event_type, decile
"""


QUERIES = {
    "events_props_extract": events_props_extract,
    "events_value_rank": events_value_rank,
}
ORACLE_SQL = {
    "events_props_extract": EVENTS_PROPS_SQL,
    "events_value_rank": EVENTS_VALUE_RANK_SQL,
}
