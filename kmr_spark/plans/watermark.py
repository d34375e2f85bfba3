"""Watermark observability: lag metrics, drop audit, and a REAL
streamed drop-audit twin — the operational layer around the streamed
family (streaming/windows.py).

The reference's closest analogue is the checkpoint/restart accounting
in its fault-tolerance layer (/root/reference/src/kmrckpt.c: what was
applied, what was lost, what is still pending at a cut); a watermarked
stream has the same three-way split per row — flushed (applied),
dropped (lost to lateness), unflushed (pending in state) — and these
queries are the audit that makes the split observable.

The synthetic events table is perfectly time-ordered, so ingest
disorder is SEEDED deterministically (the corruption-seeding pattern
of the gate queries): a portable-hash class per event delays its
ARRIVAL by 0, 1 or 2 days (hours stay intact), giving every audit a
non-trivial late/dropped population that both engines replay exactly.

Spark's watermark semantics, empirically pinned (and oracle-encoded —
see test_watermark_semantics_streamed for the live proof):

- with ``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow`` the file
  source processes one file per micro-batch in mtime order, then runs
  a trailing empty batch that applies the final watermark update;
- the EVICTION watermark in batch b is max event time over batches
  <= b-1, minus the delay;
- the LATE-ROW FILTER in batch b uses the eviction watermark of batch
  b-1 (one batch older): a row is dropped iff its window end <=
  max_event_time(batches <= b-2) - delay, boundary INCLUSIVE;
- a window is emitted (append mode) once the eviction watermark
  passes its end; rows of that window arriving in the same batch as
  the eviction still merge before emission.

Scale shape: per-row work is a projection plus an equi-join against a
broadcast batch-watermark table; only the per-BATCH aggregate (one row
per ingest batch — bounded by the stream's day/hour span, not by data
volume) passes through an un-partitioned window, so nothing row-scale
ever funnels through one task. The streamed twin's per-batch parquet
staging is the bounded-replay TEST HARNESS (production would consume
real arrival order from the source), sized by the day count.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.operators.sample import hash_bucket, sql_bucket
from kmr_spark.session import load_tables, scratch_dir

US_HOUR = 3_600_000_000
US_DAY = 24 * US_HOUR
WINDOW_US = US_HOUR                 # 1-hour tumbling event-time windows
WM_DELAY_US = 2 * US_HOUR           # drop-audit watermark delay
LAG_DELAY_US = 30 * 60 * 1_000_000  # lag-curve watermark delay (30 min)


def _with_arrival(events: DataFrame) -> DataFrame:
    """Seeded ingest disorder: hash class 0 (of 16) arrives 2 days
    late, classes 1-2 arrive 1 day late, the rest on time."""
    cls = hash_bucket(F.col("event_id")) % 16
    delay_days = (F.when(cls == 0, F.lit(2))
                  .when(cls.isin(1, 2), F.lit(1))
                  .otherwise(F.lit(0)))
    return events.select(
        F.unix_micros("ts").alias("us"),
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        (F.expr("unix_micros(ts) DIV 86400000000")
         + delay_days).alias("arrival_day"))


def _sql_arrival() -> str:
    b = sql_bucket("event_id")
    return f"""
  SELECT epoch_us(ts) AS us, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) // 86400000000
         + CASE WHEN ({b}) % 16 = 0 THEN 2
                WHEN ({b}) % 16 IN (1, 2) THEN 1
                ELSE 0 END AS arrival_day
  FROM events"""


def _batch_watermarks(arrivals: DataFrame, delay_us: int,
                      batch_col: str = "arrival_day") -> DataFrame:
    """Per ingest batch: the filter and eviction watermarks of the
    pinned semantics. Input is row-scale; output is one row per batch
    (bounded by the stream's time span), so the un-partitioned windows
    below run on a ~30-row aggregate, never on data."""
    from pyspark.sql.window import Window

    per_batch = (arrivals.groupBy(batch_col)
                 .agg(F.max("us").alias("batch_max"),
                      F.count("*").alias("n_rows")))
    w1 = (Window.orderBy(batch_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    w2 = (Window.orderBy(batch_col)
          .rowsBetween(Window.unboundedPreceding, -2))
    return per_batch.select(
        batch_col, "batch_max", "n_rows",
        (F.max("batch_max").over(w1) - delay_us).alias("evict_wm"),
        (F.max("batch_max").over(w2) - delay_us).alias("filter_wm"))


def events_watermark_lag_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lag metric, the streaming-ops dashboard curve: for
    each ingest batch (hour grain), how far the newest event in the
    batch runs ahead of the watermark in force when the batch arrives
    (`lag_sec`), and how many of its rows sit BENEATH that watermark
    (`n_below_wm` — the state-eviction exposure). First batch has no
    watermark yet: NULL lag, zero below."""
    ev = _with_arrival(load_tables(spark, sf_dir)["events"]).select(
        "us",
        F.expr(f"(arrival_day * {US_DAY}"
               f" + pmod(us, {US_DAY})) DIV {US_HOUR}")
        .alias("arrival_hour"))
    wm = _batch_watermarks(ev, LAG_DELAY_US, "arrival_hour")
    joined = ev.join(F.broadcast(wm.select("arrival_hour", "evict_wm")),
                     "arrival_hour")
    below = (joined.groupBy("arrival_hour")
             .agg(F.count(F.when(F.col("us") < F.col("evict_wm"), 1))
                  .alias("n_below_wm")))
    return (
        wm.join(below, "arrival_hour")
        .select("arrival_hour", "n_rows",
                F.expr("(batch_max - evict_wm) DIV 1000000")
                .alias("lag_sec"),
                "n_below_wm")
        .orderBy("arrival_hour")
    )


LAG_CURVE_SQL = f"""
WITH e AS ({_sql_arrival()}),
h AS (
  SELECT us,
         (arrival_day * {US_DAY} + ((us % {US_DAY} + {US_DAY}) % {US_DAY}))
           // {US_HOUR} AS arrival_hour
  FROM e),
b AS (
  SELECT arrival_hour, MAX(us) AS batch_max, COUNT(*) AS n_rows
  FROM h GROUP BY arrival_hour),
wm AS (
  SELECT arrival_hour, batch_max, n_rows,
         MAX(batch_max) OVER (ORDER BY arrival_hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {LAG_DELAY_US} AS evict_wm
  FROM b),
below AS (
  SELECT h.arrival_hour,
         COUNT(CASE WHEN h.us < wm.evict_wm THEN 1 END) AS n_below_wm
  FROM h JOIN wm ON wm.arrival_hour = h.arrival_hour
  GROUP BY h.arrival_hour)
SELECT wm.arrival_hour, wm.n_rows,
       (wm.batch_max - wm.evict_wm) // 1000000 AS lag_sec,
       below.n_below_wm
FROM wm JOIN below ON below.arrival_hour = wm.arrival_hour
ORDER BY wm.arrival_hour
"""


def _audit_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: its tumbling-window end, and the three-way watermark
    verdict under the pinned semantics (day-grain ingest batches,
    WM_DELAY_US): dropped / flushed / unflushed."""
    ev = _with_arrival(load_tables(spark, sf_dir)["events"])
    wm = _batch_watermarks(ev, WM_DELAY_US)
    final_wm = ev.agg((F.max("us") - WM_DELAY_US).alias("final_wm"))
    return (
        ev.join(F.broadcast(wm.select("arrival_day", "filter_wm")),
                "arrival_day")
        .crossJoin(F.broadcast(final_wm))
        .select(
            "event_type", "cents",
            F.expr(f"((us DIV {WINDOW_US}) + 1) * {WINDOW_US}").alias("we"),
            "filter_wm", "final_wm")
        .withColumn("dropped",
                    F.col("we") <= F.coalesce(F.col("filter_wm"), F.lit(-1)))
        .withColumn("flushed",
                    ~F.col("dropped") & (F.col("we") <= F.col("final_wm")))
    )


def events_watermark_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop audit, the kmrckpt-style accounting per event_type: of all
    rows, how many a 1-hour windowed aggregation with a 2-hour
    watermark would FLUSH (window closed and emitted), DROP (arrived
    beneath the late-row filter), or hold UNFLUSHED in state at end of
    replay — plus the drop rate in exact permille. The streamed twin
    (events_drop_audit_streamed) executes the same semantics through a
    real watermarked stream."""
    flags = _audit_flags(spark, sf_dir)
    return (
        flags.groupBy("event_type")
        .agg(F.count("*").alias("n_total"),
             F.count(F.when(F.col("dropped"), 1)).alias("n_dropped"),
             F.count(F.when(F.col("flushed"), 1)).alias("n_flushed"),
             F.count(F.when(~F.col("dropped") & ~F.col("flushed"), 1))
             .alias("n_unflushed"))
        .withColumn("dropped_permille",
                    F.expr("(1000 * n_dropped) DIV n_total"))
        .orderBy("event_type")
    )


_AUDIT_CORE_SQL = f"""
e AS ({_sql_arrival()}),
b AS (
  SELECT arrival_day, MAX(us) AS batch_max
  FROM e GROUP BY arrival_day),
wm AS (
  SELECT arrival_day,
         MAX(batch_max) OVER (ORDER BY arrival_day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           - {WM_DELAY_US} AS filter_wm
  FROM b),
fin AS (SELECT MAX(us) - {WM_DELAY_US} AS final_wm FROM e),
flagged AS (
  SELECT e.event_type, e.cents,
         ((e.us // {WINDOW_US}) + 1) * {WINDOW_US} AS we,
         ((e.us // {WINDOW_US}) + 1) * {WINDOW_US}
           <= COALESCE(wm.filter_wm, -1) AS dropped,
         fin.final_wm
  FROM e JOIN wm ON wm.arrival_day = e.arrival_day
  CROSS JOIN fin)
"""

DROP_AUDIT_SQL = f"""
WITH {_AUDIT_CORE_SQL}
SELECT event_type,
       COUNT(*) AS n_total,
       COUNT(CASE WHEN dropped THEN 1 END) AS n_dropped,
       COUNT(CASE WHEN NOT dropped AND we <= final_wm THEN 1 END)
         AS n_flushed,
       COUNT(CASE WHEN NOT dropped AND we > final_wm THEN 1 END)
         AS n_unflushed,
       (1000 * COUNT(CASE WHEN dropped THEN 1 END)) // COUNT(*)
         AS dropped_permille
FROM flagged
GROUP BY event_type
ORDER BY event_type
"""


def events_drop_audit_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL streamed drop audit: the seeded-arrival events are
    staged as one parquet file per ingest day (mtime-ordered), replayed
    through an actual watermarked streaming aggregation (1-hour
    tumbling windows, 2-hour watermark, `maxFilesPerTrigger=1` +
    AvailableNow, APPEND mode), and the emitted — i.e. watermark-closed
    — windows are returned: (window_start_us, n_events, sum_cents).

    The oracle replays the pinned drop/flush semantics in SQL, so a
    MATCH here is a live proof that Spark's watermark behavior equals
    the documented rule — and that the batch drop-audit twin predicts
    the stream exactly (asserted row-for-row in
    tests/test_watermark_ops.py)."""
    from kmr_spark.streaming.windows import (run_available_now,
                                             sized_state_partitions)

    arrivals = _with_arrival(load_tables(spark, sf_dir)["events"]).select(
        "us", "cents", "arrival_day")
    stage = scratch_dir("kmr_wm_stage_")
    stream_dir = scratch_dir("kmr_wm_stream_")
    ck = scratch_dir("kmr_wm_ck_")
    try:
        # one file per ingest day: repartition by day puts each day
        # wholly in one task, so partitionBy emits exactly one part
        # file per day; files are renamed into mtime order (the file
        # source's batch order) with one micro-batch per file.
        (arrivals.repartition("arrival_day")
         .write.partitionBy("arrival_day").mode("overwrite").parquet(stage))
        days = sorted(
            int(d.split("=", 1)[1]) for d in os.listdir(stage)
            if d.startswith("arrival_day="))
        for seq, day in enumerate(days):
            ddir = os.path.join(stage, f"arrival_day={day}")
            parts = [f for f in os.listdir(ddir) if f.endswith(".parquet")]
            if len(parts) != 1:  # pragma: no cover - layout invariant
                raise RuntimeError(
                    f"expected 1 part file per day, got {parts} for {day}")
            dest = os.path.join(stream_dir, f"{seq:05d}.parquet")
            shutil.move(os.path.join(ddir, parts[0]), dest)
            os.utime(dest, (1_700_000_000 + seq * 10,) * 2)
        stream = (
            spark.readStream.schema("us long, cents long")
            .option("maxFilesPerTrigger", "1").parquet(stream_dir)
            .select(F.expr("timestamp_micros(us)").alias("ts"), "cents"))
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("cents").alias("sum_cents")))
        # state stores are per-shuffle-partition fixed cost PER
        # micro-batch, and this replay runs one micro-batch per ingest
        # day — size the state partitioning to the PER-BATCH volume
        # (total/n_days, here ~60 KB: floor 2), not the total: with
        # 33 batches every extra store is 33 more delta commits for
        # no parallelism gain (r10: 24.1 s with 32 stores; r11
        # baseline 14.9 s with 8; 10.5 s with 2 — same rows, same
        # result, see sized_state_partitions docstring)
        closed = run_available_now(
            agg, "kmr_wm_drop_audit", ck, output_mode="append",
            state_partitions=sized_state_partitions(
                spark, sf_dir, floor=2, n_batches=len(days)))
        return (
            closed.select(F.unix_micros(F.col("w.start"))
                          .alias("window_start_us"),
                          "n_events", "sum_cents")
            .orderBy("window_start_us")
            .localCheckpoint()
        )
    finally:
        for d in (stage, stream_dir, ck):
            shutil.rmtree(d, ignore_errors=True)


DROP_AUDIT_STREAMED_SQL = f"""
WITH {_AUDIT_CORE_SQL}
SELECT we - {WINDOW_US} AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM flagged
WHERE NOT dropped AND we <= final_wm
GROUP BY we
ORDER BY window_start_us
"""


QUERIES = {
    "events_watermark_lag_curve": events_watermark_lag_curve,
    "events_watermark_drop_audit": events_watermark_drop_audit,
    "events_drop_audit_streamed": events_drop_audit_streamed,
}
ORACLE_SQL = {
    "events_watermark_lag_curve": LAG_CURVE_SQL,
    "events_watermark_drop_audit": DROP_AUDIT_SQL,
    "events_drop_audit_streamed": DROP_AUDIT_STREAMED_SQL,
}
