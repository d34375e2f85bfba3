"""Semantic tests for the watermark observability family
(kmr_spark/plans/watermark.py).  Value parity vs DuckDB is the oracle
gate's job; these pin (1) the EMPIRICAL Spark watermark semantics the
oracles encode, against a controlled multi-batch replay, and (2) the
batch-twin-predicts-the-stream contract.
"""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _write_batches(spark, base, batches):
    """One parquet file per micro-batch, mtime-ordered (the replay
    harness the drop-audit stream uses)."""
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "event_id long, m long").select(
            "event_id", F.expr("timestamp_micros(m * 60000000)").alias("ts"))
        p = os.path.join(base, f"b{i}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p + ".dir")
        part = [f for f in os.listdir(p + ".dir")
                if f.endswith(".parquet")][0]
        shutil.move(os.path.join(p + ".dir", part), p)
        shutil.rmtree(p + ".dir")
        os.utime(p, (1_700_000_000 + i * 10,) * 2)


def test_watermark_semantics_streamed(spark):
    """The pinned drop/flush rule (watermark.py module docstring),
    proven live against a real watermarked stream on controlled
    batches.  If a Spark upgrade ever changes the late-filter or
    eviction timing, this fails before the oracle-gated queries do.

    delay = 10 min, 10-min tumbling windows, batches (minutes):
      b0 [40]           -> evict_wm after b0 = 30
      b1 [41]           -> filter_wm(b1) = -inf: keep; evict_wm = 31
      b2 [22,25,32,28]  -> filter_wm(b2) = 40-10 = 30: window 20-30
                           (end 30 <= 30, INCLUSIVE) dropped; 32 kept
      b3 [35,30]        -> filter_wm(b3) = 41-10 = 31: window 30-40
                           end 40 > 31 both kept (30 merges although
                           its EVENT TIME is below the watermark —
                           the rule is on window end)
      b4 [99]           -> final wm = 89: flush 30-40 and 40-50;
                           90-100 (end 100 > 89) stays in state
    """
    base = tempfile.mkdtemp(prefix="kmr_wm_sem_")
    ck = tempfile.mkdtemp(prefix="kmr_wm_sem_ck_")
    try:
        _write_batches(spark, base, [
            [(1, 40)], [(2, 41)],
            [(3, 22), (4, 25), (5, 32), (6, 28)],
            [(7, 35), (8, 30)],
            [(9, 99)],
        ])
        stream = (spark.readStream.schema("event_id long, ts timestamp")
                  .option("maxFilesPerTrigger", "1").parquet(base))
        agg = (stream.withWatermark("ts", "10 minutes")
               .groupBy(F.window("ts", "10 minutes").alias("w"))
               .agg(F.sort_array(F.collect_list("event_id")).alias("ids")))
        q = (agg.writeStream.format("memory").queryName("kmr_wm_sem")
             .outputMode("append")
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = {int(r.start_min): list(r.ids)
               for r in spark.table("kmr_wm_sem").select(
                   F.expr("unix_micros(w.start) DIV 60000000")
                   .alias("start_min"), "ids").collect()}
        assert got == {30: [5, 7, 8], 40: [1, 2]}, got
        # rows 3, 4, 6 dropped (window end == filter watermark,
        # boundary inclusive); row 9's window unflushed
    finally:
        shutil.rmtree(base, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)


def test_drop_audit_batch_predicts_stream(spark):
    """The batch twin's per-window flushed prediction must equal the
    real stream's appended windows row-for-row, and the censuses must
    reconcile."""
    from kmr_spark.plans.watermark import (WINDOW_US, _audit_flags,
                                           events_drop_audit_streamed,
                                           events_watermark_drop_audit)

    streamed = {r.window_start_us: (r.n_events, r.sum_cents)
                for r in events_drop_audit_streamed(spark, SF_SMALL)
                .collect()}
    predicted = {
        r.window_start_us: (r.n_events, r.sum_cents)
        for r in _audit_flags(spark, SF_SMALL)
        .filter("flushed")
        .groupBy((F.col("we") - WINDOW_US).alias("window_start_us"))
        .agg(F.count("*").alias("n_events"),
             F.sum("cents").alias("sum_cents"))
        .collect()}
    assert streamed == predicted
    audit = events_watermark_drop_audit(spark, SF_SMALL).collect()
    assert sum(r.n_flushed for r in audit) == sum(
        n for n, _ in streamed.values())


def test_drop_audit_census_consistent(spark):
    from kmr_spark.session import load_tables
    from kmr_spark.plans.watermark import events_watermark_drop_audit

    rows = events_watermark_drop_audit(spark, SF_SMALL).collect()
    n_events = load_tables(spark, SF_SMALL)["events"].count()
    assert sum(r.n_total for r in rows) == n_events
    for r in rows:
        assert r.n_dropped + r.n_flushed + r.n_unflushed == r.n_total
        assert r.dropped_permille == (1000 * r.n_dropped) // r.n_total
    # the seeded disorder must make the audit non-trivial
    assert sum(r.n_dropped for r in rows) > 0
    assert sum(r.n_unflushed for r in rows) > 0
    assert sum(r.n_flushed for r in rows) > sum(r.n_dropped for r in rows)


def test_lag_curve_shape(spark):
    from kmr_spark.plans.watermark import events_watermark_lag_curve

    rows = events_watermark_lag_curve(spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r.arrival_hour)
    first, rest = rows[0], rows[1:]
    # no watermark exists before the first batch
    assert first.lag_sec is None and first.n_below_wm == 0
    assert all(r.lag_sec is not None for r in rest)
    # the seeded 1/2-day-late classes put rows beneath the watermark
    assert sum(r.n_below_wm for r in rest) > 0
    # on-time batches run ahead of a 30-min-delayed watermark
    assert max(r.lag_sec for r in rest) >= 30 * 60
