"""Invariant tests for the round-3 closing queries: equi-depth decile
binning, per-group min-max permille normalization (plans/analytics.py)
and rolling-WAU island/sweep rewrite (plans/timeseries.py).  Oracle
value-parity is covered by scripts/check_queries.py / the driver gate;
these pin the algebraic invariants on tiny controlled inputs."""

import datetime

from pyspark.sql import functions as F

from kmr_spark.plans.analytics import (
    events_value_deciles,
    events_value_minmax_norm,
)
from kmr_spark.plans.timeseries import events_rolling_wau

SF_SMALL = "/root/testdata/sf0.001"


def test_deciles_partition_each_type(spark):
    out = events_value_deciles(spark, SF_SMALL).collect()
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    counts = {r.event_type: r.n for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    by_type = {}
    for r in out:
        assert 0 <= r.decile <= 9
        assert r.lo_cents <= r.hi_cents
        by_type.setdefault(r.event_type, []).append(r)
    assert set(by_type) == set(counts)
    for t, rows in by_type.items():
        # bins partition the type's rows exactly
        assert sum(r.n_rows for r in rows) == counts[t]
        rows = sorted(rows, key=lambda r: r.decile)
        # value ranges are disjoint and increasing across bins
        for a, b in zip(rows, rows[1:]):
            assert a.hi_cents < b.lo_cents
        # equi-depth: every bin holds < 2/10 of the rows + the largest
        # single-value tie (distinct-value binning can't split a value)
        biggest_tie = max(
            c for (ty, c) in
            ((r.event_type, r.cnt) for r in
             ev.select("event_type",
                       F.floor(F.col("value") * 100).alias("v"))
             .groupBy("event_type", "v").agg(F.count("*").alias("cnt"))
             .collect())
            if ty == t)
        assert all(r.n_rows <= counts[t] // 10 + biggest_tie + 1
                   for r in rows)


def test_minmax_norm_bounds_and_extremes(spark):
    out = events_value_minmax_norm(spark, SF_SMALL)
    rows = out.collect()
    assert all(0 <= r.norm_permille <= 1000 for r in rows)
    stats = {r.event_type: (r.lo, r.hi) for r in
             out.groupBy("event_type")
             .agg(F.min("norm_permille").alias("lo"),
                  F.max("norm_permille").alias("hi")).collect()}
    for lo, hi in stats.values():
        assert lo == 0 and hi == 1000  # min row -> 0, max row -> 1000


def test_minmax_norm_degenerate_group(spark):
    # a constant-valued group must normalize to 0, not divide by zero
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 5.0), (3, "b", 1.0), (4, "b", 3.0)],
        "event_id long, event_type string, value double")
    df.createOrReplaceTempView("_const_events")
    import kmr_spark.plans.analytics as an
    orig = an._events
    an._events = lambda spark, sf_dir: df
    try:
        got = {r.event_id: r.norm_permille
               for r in events_value_minmax_norm(spark, "unused").collect()}
    finally:
        an._events = orig
    assert got == {1: 0, 2: 0, 3: 0, 4: 1000}


def test_rolling_wau_islands_match_bruteforce(spark):
    # user 10: days 0 and 6 (gap == 6 -> ONE island, covers [0, 12])
    # user 20: days 0 and 7 (gap == 7 -> TWO islands, [0,6] and [7,13])
    # user 30: single day 3 (covers [3, 9])
    days = [(10, 0), (10, 6), (20, 0), (20, 7), (30, 3)]
    rows = [(u, datetime.datetime(1970, 1, 1, 12) +
             datetime.timedelta(days=d)) for u, d in days]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    import kmr_spark.plans.timeseries as ts
    orig = ts.load_tables
    ts.load_tables = lambda spark, sf_dir: {"events": ev}
    try:
        got = {r.day: r.wau
               for r in events_rolling_wau(spark, "unused").collect()}
    finally:
        ts.load_tables = orig

    epoch = datetime.date(1970, 1, 1)
    for d in range(0, 8):  # spine = [min activity day, max activity day]
        expect = len({u for u, a in days if d - 6 <= a <= d})
        assert got[epoch + datetime.timedelta(days=d)] == expect
    assert set(got) == {epoch + datetime.timedelta(days=d)
                        for d in range(0, 8)}


def test_user_streaks_gaps_and_islands(spark):
    # user 1: days 0,1,2 + 5,6  -> streaks {3, 2}; user 2: day 4 only
    days = [(1, 0), (1, 1), (1, 2), (1, 5), (1, 6), (2, 4), (1, 1)]
    rows = [(u, datetime.datetime(1970, 1, 1, 8) +
             datetime.timedelta(days=d)) for u, d in days]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    import kmr_spark.plans.timeseries as ts
    from kmr_spark.plans.timeseries import events_user_streaks
    orig = ts.load_tables
    ts.load_tables = lambda spark, sf_dir: {"events": ev}
    try:
        got = {r.user_id: (r.active_days, r.n_streaks, r.longest_streak)
               for r in events_user_streaks(spark, "unused").collect()}
    finally:
        ts.load_tables = orig
    assert got == {1: (5, 2, 3), 2: (1, 1, 1)}
