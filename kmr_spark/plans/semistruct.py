"""Semi-structured (JSON) extraction and rank analytics.

The events table carries a JSON ``props`` column — the shape every
real event pipeline has. Parsing happens at the scan with built-in
JSON path extraction (JVM codegen, no Python), so Catalyst still
prunes columns and pushes filters; at 100 TB the alternative (a UDF
parse) would dominate the query.

Rank analytics (quartiles / percent_rank / cume_dist per event_type)
deliberately avoid ``Window.partitionBy("event_type")``: with ~5
event types the whole table would funnel through 5 tasks. Instead
ranks come from the distributed exscan
(:func:`kmr_spark.operators.sort.ranking_per_group` — range-partition
by (type, key), per-(partition, type) count exscan, narrow Arrow
offset pass; reference analog: KMR's sampling-sort splitters,
src/kmrmoreops.c:469-536,764-805), and NTILE is reconstructed exactly
from (rank, group size) via
:func:`kmr_spark.operators.sort.ntile_from_rank`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.operators.sort import ntile_from_rank, ranking_per_group
from kmr_spark.session import load_tables


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over the JSON `k` property: count, sum, min/max,
    per exact NTILE(4) quartile of k within the type.

    All output columns are int64 in BOTH engines (the oracle CASTs its
    SUM and NTILE, which DuckDB would otherwise widen to HUGEINT /
    keep at window-default width — the round-3 hash-fail cause).
    """
    ev = load_tables(spark, sf_dir)["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    parsed = ev.select("event_id", "event_type", k.alias("k")).filter(
        F.col("k").isNotNull())
    ranked = ranking_per_group(
        parsed, ["event_type"], [F.col("k").asc(), F.col("event_id").asc()])
    rn = F.col("rank") + F.lit(1)
    quartile = ntile_from_rank(rn, F.col("n_group"), 4)
    return (
        ranked.select("event_type", "k", quartile.alias("quartile"))
        .groupBy("event_type", "quartile")
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
         CAST(NTILE(4) OVER (PARTITION BY event_type
                             ORDER BY k ASC, event_id ASC) AS BIGINT)
           AS quartile
  FROM parsed)
SELECT event_type, quartile, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum, MIN(k) AS k_min, MAX(k) AS k_max
FROM ranked GROUP BY event_type, quartile
ORDER BY event_type, quartile
"""


def events_value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type percent_rank / cume_dist of each user's total value,
    summarized per decile (order-insensitive aggregates over exact
    rank results, so the oracle is exact).

    percent_rank = rank0/(n-1) and cume_dist = (rank0+1)/n are
    rebuilt from the exscan rank — the (event_id-tiebroken) order is
    total, so window RANK == ROW_NUMBER and both formulas reproduce
    the window functions' IEEE doubles bit-for-bit.
    """
    ev = load_tables(spark, sf_dir)["events"]
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_dec"))
    ranked = ranking_per_group(
        per_user, ["event_type"],
        [F.col("total_dec").asc(), F.col("user_id").asc()])
    n = F.col("n_group")
    pr = F.when(n > 1, F.col("rank") / (n - F.lit(1))).otherwise(F.lit(0.0))
    cd = (F.col("rank") + F.lit(1)) / n
    decile = F.floor(pr * 10).cast("long")
    return (
        ranked.select("event_type", decile.alias("decile"), cd.alias("cd"))
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
