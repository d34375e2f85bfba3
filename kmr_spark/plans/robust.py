"""Robust statistics through the Python UDF surface — the KMR
mapfn/redfn shape (reference src/kmr.h:740-748 kmr_redfn_t; SURVEY.md
§2.9) exercised inside oracle-gated queries, not just unit tests.

Both queries keep the Arrow-crossing part INTEGER-exact (cents), so
the DuckDB oracle reproduces them bit-for-bit; doubles are derived
after aggregation with an identical expression in both engines.

Scale notes: groups are (event_type, day) — bounded per key, the
memory model both grouped-agg pandas UDFs and applyInPandas require
(one group per Arrow batch; same caveat as KMR's redfn, which also
sees a key's full value array in memory). For unbounded groups the
two-pass expression forms in plans/analytics.py are the right tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions import udafs as U
from kmr_spark.kvs import KVS
from kmr_spark.session import load_tables


def events_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) 10%-trimmed mean of the value column via
    the grouped-agg pandas UDAF (AggregateInPandas — Arrow batch per
    group): drop the lowest/highest floor(n/10) cents, average the
    middle. The UDAF returns the exact integer trimmed SUM; count and
    mean derive outside it.
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "event_type", F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    g = base.groupBy("event_type", "day").agg(
        U.trimmed_sum_col(F.col("cents")).alias("trim_sum_cents"),
        # count must cross Arrow too: Spark can't mix grouped-agg
        # pandas UDFs with JVM aggregates in one .agg()
        U.arrow_count(F.col("cents")).alias("n_events"))
    n_kept = F.expr("n_events - 2 * (n_events DIV 10)")
    return g.select(
        "event_type", "day", "n_events", "trim_sum_cents",
        n_kept.alias("n_kept"),
        (F.col("trim_sum_cents") / n_kept / F.lit(100.0))
        .alias("trimmed_mean"))


TRIMMED_MEAN_SQL = """
WITH c AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, day, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, day) AS n
  FROM c)
SELECT event_type, day, n AS n_events,
       CAST(SUM(CASE WHEN rn > CAST(floor(n / 10.0) AS BIGINT)
                      AND rn <= n - CAST(floor(n / 10.0) AS BIGINT)
                     THEN cents ELSE 0 END) AS BIGINT) AS trim_sum_cents,
       CAST(n - 2 * CAST(floor(n / 10.0) AS BIGINT) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > CAST(floor(n / 10.0) AS BIGINT)
                      AND rn <= n - CAST(floor(n / 10.0) AS BIGINT)
                     THEN cents ELSE 0 END) AS DOUBLE)
         / (n - 2 * CAST(floor(n / 10.0) AS BIGINT)) / 100.0
         AS trimmed_mean
FROM r GROUP BY event_type, day, n
"""


def _median_redfn(key, values):
    """KMR-style redfn: full value array per key -> exact integer
    median of cents (floor of the midpoint average for even counts)."""
    vs = sorted(values)
    n = len(vs)
    if n % 2:
        m = vs[n // 2]
    else:
        m = (vs[n // 2 - 1] + vs[n // 2]) // 2
    return [(key, m)]


def events_median_kvs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) exact integer median of cents through the
    KVS.reduce Arrow path (applyInPandas / FlatMapGroupsInPandas —
    the kmr_reduce surface, reference src/kmrbase.c:2607): the redfn
    receives the key's full value array, exactly like KMR's redfn.
    """
    ev = load_tables(spark, sf_dir)["events"]
    kvs = KVS.from_columns(
        ev,
        key=F.concat_ws("|", "event_type",
                        F.date_format("ts", "yyyy-MM-dd")),
        value=F.floor(F.col("value") * 100).cast("long"))
    out = kvs.reduce(_median_redfn, schema="key string, value long")
    return out.df.select(F.col("key").alias("type_day"),
                         F.col("value").alias("median_cents"))


MEDIAN_KVS_SQL = """
WITH c AS (
  SELECT event_type || '|' || strftime(CAST(ts AS DATE), '%Y-%m-%d')
           AS type_day,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT type_day, cents,
         ROW_NUMBER() OVER (PARTITION BY type_day ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY type_day) AS n
  FROM c)
SELECT type_day,
       CAST(floor(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2
                           THEN cents END)
                  / (CASE WHEN n % 2 = 1 THEN 1.0 ELSE 2.0 END))
            AS BIGINT) AS median_cents
FROM r GROUP BY type_day, n
"""


QUERIES = {
    "events_trimmed_mean": events_trimmed_mean,
    "events_median_kvs": events_median_kvs,
}
ORACLE_SQL = {
    "events_trimmed_mean": TRIMMED_MEAN_SQL,
    "events_median_kvs": MEDIAN_KVS_SQL,
}
