"""Watermarked event-time window operators over an events stream.

Each builder takes a *streaming* DataFrame with the events schema
(event_id, ts, user_id, event_type, value, props) and returns a
transformed streaming DataFrame; `stream_events` builds that input from
the driver testdata parquet so tests can replay the bounded stream with
Trigger.AvailableNow and compare against the batch twins in
kmr_spark.plans.analytics.

Scale notes: state size is bounded by the watermark (late rows beyond
it are dropped and their state evicted); all windows are keyed by
(window x type) or user so state partitions across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import TS_COLS

EVENTS_SCHEMA = (
    "event_id long, ts_ns long, user_id long, event_type string, "
    "value double, props string"
)

WATERMARK = "1 hour"


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (bounded replay of the stream).

    The testdata stores TIMESTAMP(NANOS) (read as long ns — see
    kmr_spark.session); the stream converts to a proper event-time
    column before any watermarking.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        # the streaming file source wants a directory; the testdata table
        # is a single file inside sf_dir, so read the dir with a glob
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """1-hour tumbling window counts per event_type, watermarked.

    Streaming twin of plans.analytics.events_tumbling_window — identical
    groupBy(window, type) plan, plus state eviction via the watermark.
    """
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts_stream(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (overlapping aggregates)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap —
    Spark's native session_window; merges windows as events arrive and
    closes them when the watermark passes the gap."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"),
             F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
        .select("user_id", "n_events", "t_start", "t_end")
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon —
    dropDuplicates on a stream keeps per-key state only until the
    watermark passes, the streaming form of exact dedup."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(["event_id"])


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint_dir: str) -> DataFrame:
    """Execute a bounded replay to a memory sink and return the result
    as a batch DataFrame (test/verification harness)."""
    # aggregations need complete/update output; plain transforms use append
    is_agg = any(c in stream_df.columns for c in ("n", "n_events"))
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if is_agg else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
