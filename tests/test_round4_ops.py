"""Unit/property tests for round-4 operators: CMS bounds, TV distance
range, Zipf monotonicity, EWMA fold equivalence, trimmed-sum UDAF,
cell balance conservation, gap/peak sanity."""

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


def test_cms_estimate_upper_bounds_exact(spark):
    """Count-min is a one-sided estimator: for every reported user the
    sketch estimate must be >= the exact count (and equal for most on
    this skew, since W >> active users)."""
    from kmr_spark.plans.sketches import events_heavy_users_cms

    rows = events_heavy_users_cms(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.cms_n >= r.exact_n, (r.user_id, r.exact_n, r.cms_n)


def test_cms_python_replica(spark):
    """The counter matrix must equal an independent Python replica of
    the same sketch on the same events."""
    from kmr_spark.plans.sketches import (CMS_AB, CMS_W, HASH_P,
                                          events_heavy_users_cms)

    def h31(x):
        x0 = x % HASH_P
        x2 = ((x0 + 40_503) ** 2) % HASH_P
        x3 = (x2 * 16_807 + 12_345) % HASH_P
        return ((x3 * x3) % HASH_P * 48_271) % HASH_P

    from kmr_spark.session import load_tables

    users = [r.user_id for r in
             load_tables(spark, SF_SMALL)["events"].select("user_id").collect()]
    counters = {}
    exact = {}
    for u in users:
        exact[u] = exact.get(u, 0) + 1
        for d, (a, b) in enumerate(CMS_AB):
            k = (d, h31((u % HASH_P) * a + b) % CMS_W)
            counters[k] = counters.get(k, 0) + 1

    def est(u):
        return min(counters[(d, h31((u % HASH_P) * a + b) % CMS_W)]
                   for d, (a, b) in enumerate(CMS_AB))

    for r in events_heavy_users_cms(spark, SF_SMALL).collect():
        assert r.exact_n == exact[r.user_id]
        assert r.cms_n == est(r.user_id)


def test_tv_distance_in_unit_interval(spark):
    from kmr_spark.plans.corpusstats import docs_source_divergence_tv

    rows = docs_source_divergence_tv(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.tv <= 1.0, r
        assert r.source_a < r.source_b


def test_zipf_cumulative_share_monotone(spark):
    from kmr_spark.plans.corpusstats import text_zipf_curve

    rows = sorted(text_zipf_curve(spark, SF_SMALL).collect(),
                  key=lambda r: r.rank)
    assert rows[0].rank == 1
    for a, b in zip(rows, rows[1:]):
        assert b.rank == a.rank + 1
        assert b.cnt <= a.cnt                      # frequency-ordered
        assert b.cum_share_permille >= a.cum_share_permille
    assert rows[-1].cum_share_permille <= 1000


def test_ewma_fold_matches_python(spark):
    """The fixed-point EWMA fold must equal the same fold run in
    Python over the same hour-ordered cents series."""
    from kmr_spark.plans.timeseries import events_ewma_int
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"]
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(F.floor(F.col("value") * 100).cast("long"))
                   .alias("c")).collect())
    series = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, r.c))
    expect = {}
    for t, xs in series.items():
        s = 0
        for _, x in sorted(xs):
            s = (8 * s + 2 * x) // 10  # all positive: // == DIV here
        expect[t] = (len(xs), s)
    got = {r.event_type: (r.n_hours, r.ewma_cents)
           for r in events_ewma_int(spark, SF_SMALL).collect()}
    assert got == expect


def test_trimmed_sum_udaf_matches_python(spark):
    from kmr_spark.functions.udafs import TRIM_FRAC, trimmed_sum_col

    vals = [5, 1, 9, 2, 8, 3, 7, 4, 6, 100, -50, 0]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.agg(trimmed_sum_col(F.col("v")).alias("s")).collect()[0].s
    s = sorted(vals)
    k = int(len(s) * TRIM_FRAC)
    assert got == sum(s[k:len(s) - k])


def test_ivf_cell_balance_conserves_vectors(spark):
    from kmr_spark.llm_ops.similarity import emb_ivf_cell_balance
    from kmr_spark.session import load_tables

    rows = emb_ivf_cell_balance(spark, SF_SMALL).collect()
    n = load_tables(spark, SF_SMALL)["embeddings"].count()
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        assert 0 <= r.share_permille <= 1000


def test_peak_rate_users_conserved(spark):
    from kmr_spark.plans.timeseries import events_peak_rate
    from kmr_spark.session import load_tables

    rows = events_peak_rate(spark, SF_SMALL).collect()
    n_users = (load_tables(spark, SF_SMALL)["events"]
               .select("user_id").distinct().count())
    assert sum(r.n_users for r in rows) == n_users
    assert all(r.peak >= 1 for r in rows)


def test_gap_histogram_counts_conserved(spark):
    """Every event except each user's first contributes exactly one
    gap."""
    from kmr_spark.plans.timeseries import events_gap_histogram
    from kmr_spark.session import load_tables

    rows = events_gap_histogram(spark, SF_SMALL).collect()
    ev = load_tables(spark, SF_SMALL)["events"]
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_events - n_users


def test_cuped_invariants(spark):
    """Arms partition the users; the variance-reduction factor is a
    valid 1 - rho^2 in [0, 1]."""
    from kmr_spark.plans.behavior import events_ab_test_cuped

    r = events_ab_test_cuped(spark, SF_SMALL).collect()[0]
    assert r.n == r.n_arm_a + r.n_arm_b
    assert 0.0 <= r.var_reduction_factor <= 1.0
    assert abs(r.theta) < 1e6


def test_bounce_rate_bounds(spark):
    from kmr_spark.plans.behavior import events_bounce_rate

    r = events_bounce_rate(spark, SF_SMALL).collect()[0]
    assert 0 <= r.n_bounces <= r.n_sessions
    assert 0 <= r.bounce_permille <= 1000


def test_kmv_overlap_bounds(spark):
    from kmr_spark.plans.sketches import events_kmv_overlap

    rows = events_kmv_overlap(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_common <= r.k_eff
        assert 0 <= r.jaccard_est_permille <= 1000
        assert 0 <= r.jaccard_exact_permille <= 1000


def test_quickselect_median_is_exact_order_statistic(spark):
    """The quickselect result must equal the k-th smallest value
    computed by brute force on the collected column."""
    from kmr_spark.plans.sketches import events_median_quickselect
    from kmr_spark.session import load_tables

    r = events_median_quickselect(spark, SF_SMALL).collect()[0]
    import math

    vals = sorted(
        math.floor(x.value * 1_000_000)
        for x in load_tables(spark, SF_SMALL)["events"]
        .select("value").collect())
    assert r.n == len(vals)
    assert r.k == (len(vals) + 1) // 2
    assert r.median_micros == vals[r.k - 1]


def test_round4_queries_leave_no_cached_plans(spark):
    """Every round-4 query that persists internally must release its
    caches before returning (materialize_release / finally-unpersist);
    a leak here grows executor storage on every call in a long-lived
    session."""
    from kmr_spark.llm_ops.similarity import (emb_ivf_cell_balance,
                                              emb_knn_margin)
    from kmr_spark.llm_ops.tuning import (dedup_band_tuning,
                                          docs_dup_rate_by_source,
                                          docs_simhash_bit_balance)
    from kmr_spark.plans.linalg import emb_norm_deciles
    from kmr_spark.plans.rfm import orders_rfm_segments
    from kmr_spark.plans.semistruct import events_props_extract
    from kmr_spark.plans.sketches import (events_kmv_overlap,
                                          events_median_quickselect)
    from kmr_spark.plans.trends import orders_customer_migration

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    for fn in (orders_rfm_segments, events_props_extract,
               emb_norm_deciles, orders_customer_migration,
               events_median_quickselect, events_kmv_overlap,
               dedup_band_tuning, docs_simhash_bit_balance,
               docs_dup_rate_by_source, emb_ivf_cell_balance,
               emb_knn_margin):
        out = fn(spark, SF_SMALL)
        assert out.count() >= 0
        assert cm.isEmpty(), f"{fn.__name__} left cached plans behind"
