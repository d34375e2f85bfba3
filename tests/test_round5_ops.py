"""Unit/property tests for round-5 operators: forward as-of vs brute
force, salted-join transparency, SRP/JL invariants, aHash-band recall
completeness, readability formula, LTV monotonicity, assortativity
range."""

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF = "/root/testdata/sf0.01"


def test_forward_sla_matches_bruteforce(spark):
    """events_asof_forward_sla's lead must equal the brute-force
    min-future-purchase join on the small table."""
    from kmr_spark.plans.trends import (ASOF_TOLERANCE_S,
                                        events_asof_forward_sla)
    from kmr_spark.session import load_tables

    got = {r.event_id: (r.lead_s, r.converted)
           for r in events_asof_forward_sla(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us")).collect()
    purch = {}
    for r in ev:
        if r.event_type == "purchase":
            purch.setdefault(r.user_id, []).append(r.us)
    lim = ASOF_TOLERANCE_S * 1_000_000
    n_checked = 0
    for r in ev:
        if r.event_type != "click":
            continue
        nxt = min((p for p in purch.get(r.user_id, []) if p >= r.us),
                  default=None)
        want = (((nxt - r.us) // 1_000_000, True)
                if nxt is not None and nxt - r.us <= lim else (None, False))
        assert got[r.event_id] == want, (r.event_id, got[r.event_id], want)
        n_checked += 1
    assert n_checked > 0


def test_salted_join_row_conservation(spark):
    """The salted join must emit exactly one row per event (the dim is
    keyed by user_id), regardless of salt width."""
    from kmr_spark.plans.diagnostics import events_salted_user_join
    from kmr_spark.session import load_tables

    out = events_salted_user_join(spark, SF_SMALL)
    n_events = load_tables(spark, SF_SMALL)["events"].count()
    assert sum(r.n_events for r in out.collect()) == n_events


def test_srp_near_pairs_have_high_cosine(spark):
    """Every pair the SRP verify marks near must actually have
    cos >= 0.8 on the quantized vectors (and non-near candidates in
    the same bucket must not)."""
    import math

    from kmr_spark.llm_ops.similarity import emb_srp_candidates

    rows = emb_srp_candidates(spark, SF_SMALL).collect()
    assert rows  # candidates must exist for the test to mean anything
    for r in rows:
        cos = r.dot / math.sqrt(r.na * r.nb)
        if r.near:
            assert cos >= 0.8 - 1e-9, (r.a, r.b, cos)
        else:
            assert cos < 0.8 + 1e-9, (r.a, r.b, cos)


def test_srp_same_vector_same_bucket_property(spark):
    """SRP signatures are a pure function of the vector: identical
    embeddings must produce identical signatures (determinism probe via
    double execution)."""
    from kmr_spark.llm_ops.similarity import emb_srp_candidates

    a = sorted((r.a, r.b, r.dot) for r in
               emb_srp_candidates(spark, SF_SMALL).collect())
    b = sorted((r.a, r.b, r.dot) for r in
               emb_srp_candidates(spark, SF_SMALL).collect())
    assert a == b


def test_random_projection_distortion_centers_near_1000(spark):
    """JL with 16 projected dims is noisy per vector, but the histogram
    must center broadly around 1000 permille: the count-weighted mean
    bucket (50-permille bins) should land within [10, 30] (i.e.
    500..1500 permille) and every count positive."""
    from kmr_spark.llm_ops.similarity import emb_random_projection

    rows = emb_random_projection(spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_vectors for r in rows)
    mean_bucket = sum(r.bucket * r.n_vectors for r in rows) / total
    assert 10 <= mean_bucket <= 30, mean_bucket


def test_ahash_band_recall_complete(spark):
    """Banding must lose NO pair within the Hamming threshold: compare
    the banded result against the all-pairs brute force on the small
    table (where all-pairs is affordable)."""
    from kmr_spark.llm_ops.multimodal import (AHASH_HAMMING_T,
                                              multimodal_dedup_ahash,
                                              multimodal_image_ahash)

    hashes = multimodal_image_ahash(spark, SF_SMALL).collect()
    groups = {}
    for r in hashes:
        key = (r.ahash_hi, r.ahash_lo)
        groups.setdefault(key, []).append(r.doc_id)
    reps = sorted((min(v), k) for k, v in groups.items())
    want = set()
    for i, (ra, ka) in enumerate(reps):
        for rb, kb in reps[i + 1:]:
            dist = (bin(ka[0] ^ kb[0]).count("1")
                    + bin(ka[1] ^ kb[1]).count("1"))
            if dist <= AHASH_HAMMING_T:
                want.add((ra, rb))
    got = {(r.rep_a, r.rep_b)
           for r in multimodal_dedup_ahash(spark, SF_SMALL).collect()}
    assert got == want


def test_readability_formula_consistency(spark):
    """flesch_milli must equal the integer formula recomputed from the
    emitted totals."""
    from kmr_spark.plans.corpusstats import text_readability

    rows = text_readability(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        want = (206835 - (1015 * r.n_words) // max(r.n_sentences, 1)
                - (84600 * r.n_syllables) // max(r.n_words, 1))
        assert r.flesch_milli == want


def test_cohort_ltv_cumulative_monotone(spark):
    """cum_rev_cents must be non-decreasing within each cohort and end
    at the cohort's total revenue."""
    from kmr_spark.plans.trends import events_cohort_ltv_curve

    rows = events_cohort_ltv_curve(spark, SF_SMALL).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    for day, rs in by_cohort.items():
        rs.sort(key=lambda r: r.day_offset)
        run = 0
        for r in rs:
            run += r.rev_cents
            assert r.cum_rev_cents == run, (day, r.day_offset)


def test_assortativity_in_valid_range(spark):
    """A correlation must be in [-1, 1]; R-MAT should come out
    disassortative-to-weak (not strongly positive)."""
    from kmr_spark.plans.graphs import graph_assortativity

    r = graph_assortativity(spark, SF_SMALL).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n > 0 and r.n % 2 == 0  # every undirected edge counted twice
    assert r.assortativity < 0.5


def test_sliding_streamed_equals_batch(spark):
    """Stream and batch sliding windows must agree row-for-row."""
    from kmr_spark.plans.analytics import (events_sliding_streamed,
                                           events_sliding_window)

    got = sorted((r.window_start, r.event_type, r.n) for r in
                 events_sliding_streamed(spark, SF_SMALL).collect())
    want = sorted((r.window_start, r.event_type, r.n) for r in
                  events_sliding_window(spark, SF_SMALL).collect())
    assert got == want


def test_basket_rules_lift_consistency(spark):
    """lift/support/confidence must equal the integer formulas
    recomputed from the emitted counts, and support >= the cutoff."""
    from kmr_spark.plans.basket import RULE_MIN_SUPPORT, basket_rules
    from kmr_spark.session import load_tables

    li = load_tables(spark, SF_SMALL)["lineitem"].select(
        "l_orderkey", "l_partkey").distinct()
    n_orders = li.select("l_orderkey").distinct().count()
    rows = basket_rules(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_ab >= RULE_MIN_SUPPORT
        assert r.support_permille == (1000 * r.n_ab) // n_orders
        assert r.confidence_permille == (1000 * r.n_ab) // r.n_a
        assert r.lift_permille == (1000 * r.n_ab * n_orders) // (r.n_a * r.n_b)


def test_scan_max_distributed_matches_window(spark):
    """The exscan running max must equal the naive global-window form
    on the small table, including the NULL first row."""
    from kmr_spark.operators.reduce import scan_max_distributed
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_id", F.unix_micros("ts").alias("us"))
    got = {r.event_id: r.scan_max for r in
           scan_max_distributed(ev, "us", [F.col("event_id").asc()]).collect()}
    rows = sorted(ev.collect(), key=lambda r: r.event_id)
    run = None
    for r in rows:
        assert got[r.event_id] == run, (r.event_id, got[r.event_id], run)
        run = r.us if run is None else max(run, r.us)


def test_watermark_census_counts_all_events(spark):
    from kmr_spark.plans.quality import events_watermark_late_census
    from kmr_spark.session import load_tables

    rows = events_watermark_late_census(spark, SF_SMALL).collect()
    n = load_tables(spark, SF_SMALL)["events"].count()
    assert sum(r.n_events for r in rows) == n
    assert any(r.late_bucket_min == -1 for r in rows)  # on-time bucket
    assert any(r.late_bucket_min >= 0 for r in rows)  # jitter makes lateness


def test_duplicate_purchase_pairs_are_real(spark):
    """Every reported pair must genuinely share the user, be within the
    amount band and time window; pair keys ordered; no self-pairs."""
    import math

    from kmr_spark.plans.quality import (DUP_CENTS_BAND, DUP_WINDOW_MIN,
                                         events_duplicate_purchases)
    from kmr_spark.session import load_tables

    ev = {r.event_id: r for r in
          load_tables(spark, SF_SMALL)["events"]
          .withColumn("us", F.unix_micros("ts")).collect()}
    rows = events_duplicate_purchases(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        a, b = ev[r.k1], ev[r.k2]
        assert r.k1 < r.k2
        assert a.event_type == b.event_type == "purchase"
        assert a.user_id == b.user_id == r.user_id
        assert abs(math.floor(a.value * 100)
                   - math.floor(b.value * 100)) < DUP_CENTS_BAND
        assert abs(a.us // 60000000 - b.us // 60000000) <= DUP_WINDOW_MIN


def test_supplier_hhi_bounds(spark):
    """HHI must be <= 10000² per part and equal 10000²-ish only for
    single-supplier parts (truncation can shave a few bp)."""
    from kmr_spark.plans.trends import parts_supplier_hhi

    rows = parts_supplier_hhi(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.hhi <= 10000 * 10000
        if r.n_suppliers == 1:
            assert r.hhi == 10000 * 10000
        else:
            assert r.hhi < 10000 * 10000


def test_hll_sliding_supersets_daily(spark):
    """A trailing-7-day HLL window merges the day's own registers plus
    six more days, so its register-hit count can never be below the
    single day's and the estimate tracks the window's true distincts
    within HLL-64's ~13% error."""
    from kmr_spark.plans.sketches import events_hll_sliding
    from kmr_spark.session import load_tables

    import datetime

    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_type", F.to_date("ts").alias("day"), "user_id").collect()
    days = sorted({r.day for r in ev})
    per_day = {}
    for r in ev:
        per_day.setdefault((r.event_type, r.day), set()).add(r.user_id)
    rows = events_hll_sliding(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        truth = set()
        for k in range(7):
            d0 = r.day - datetime.timedelta(days=k)
            truth |= per_day.get((r.event_type, d0), set())
        assert truth, (r.event_type, r.day)
        err = abs(r.hll_est - len(truth)) / len(truth)
        assert err < 0.5, (r.event_type, r.day, r.hll_est, len(truth))


def test_bootstrap_ci_brackets_mean(spark):
    """The bootstrap interval must contain the true mean for these
    well-behaved (large-n, bounded) groups, and lo <= hi always."""
    from kmr_spark.plans.robust import events_bootstrap_ci

    rows = events_bootstrap_ci(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.boot_lo <= r.boot_hi
        assert r.boot_lo <= r.mean_cents <= r.boot_hi, (
            r.event_type, r.boot_lo, r.mean_cents, r.boot_hi)


def test_bootstrap_weights_are_poissonish(spark):
    """Across replicas the total Poisson weight should hover around n
    (mean 1 per row): check every replica's weight sum is within 20%
    of the row count at sf0.001."""
    from pyspark.sql import functions as F2

    from kmr_spark.plans.robust import BOOT_B, _boot_weight_spark
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"].select("event_id")
    n = ev.count()
    sums = ev.agg(*[F2.sum(_boot_weight_spark(b)).alias(f"w{b}")
                    for b in range(BOOT_B)]).collect()[0]
    for b in range(BOOT_B):
        assert abs(sums[f"w{b}"] - n) / n < 0.2, (b, sums[f"w{b}"], n)


def test_tfidf_cosine_pairs_self_consistent(spark):
    """near implies cos >= 0.5 over the pruned vocabulary (recomputed
    from the emitted integers), and every pair shares >= MIN_SHARED
    discriminative bigrams."""
    import math

    from kmr_spark.llm_ops.similarity import (TFIDF_MIN_SHARED,
                                              docs_tfidf_cosine_pairs)

    rows = docs_tfidf_cosine_pairs(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_shared >= TFIDF_MIN_SHARED
        cos = r.dot / math.sqrt(r.na * r.nb)
        assert (cos >= 0.5) == bool(r.near), (r.a, r.b, cos, r.near)


def test_quantile_sliding_monotone_and_bounded(spark):
    """p50 <= p90, both within the type's global [mn, mx], and the
    window's n equals the true trailing-7-day event count."""
    import datetime

    from kmr_spark.plans.sketches import events_quantile_sliding
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_type", F.to_date("ts").alias("day"), "value").collect()
    per_day = {}
    vmin, vmax = {}, {}
    for r in ev:
        if r.value is None:
            continue
        per_day[(r.event_type, r.day)] = per_day.get(
            (r.event_type, r.day), 0) + 1
        vmin[r.event_type] = min(vmin.get(r.event_type, r.value), r.value)
        vmax[r.event_type] = max(vmax.get(r.event_type, r.value), r.value)
    rows = events_quantile_sliding(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.p50_est <= r.p90_est
        assert vmin[r.event_type] <= r.p50_est <= vmax[r.event_type]
        true_n = sum(per_day.get(
            (r.event_type, r.day - datetime.timedelta(days=k)), 0)
            for k in range(7))
        assert r.n == true_n, (r.event_type, r.day, r.n, true_n)


def test_logreg_loss_decreases(spark):
    """Full-batch GD with a small LR must not increase the training
    log-loss over the fitted iterations (computed on the quantized
    pipeline's own features)."""
    import math

    from kmr_spark.plans.iterative import (LG_DIMS, LG_ITERS, LG_LR, LG_SQ,
                                           LG_XQ, _lg_features)
    from kmr_spark.session import load_tables

    rows = _lg_features(spark, SF_SMALL).collect()
    X = [list(r.xq) + [1.0] for r in rows]
    y = [r.y for r in rows]
    n = float(len(rows))

    def loss(w):
        tot = 0.0
        for xi, yi in zip(X, y):
            z = sum(wd * xd for wd, xd in zip(w, xi))
            p = 1.0 / (1.0 + math.exp(-z))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += -(yi * math.log(p) + (1 - yi) * math.log(1 - p))
        return tot / n

    w = [0.0] * (LG_DIMS + 1)
    losses = [loss(w)]
    for _ in range(LG_ITERS):
        g = [0.0] * (LG_DIMS + 1)
        for xi, yi in zip(X, y):
            z = sum(wd * xd for wd, xd in zip(w, xi))
            sq = math.floor(1.0 / (1.0 + math.exp(-z)) * LG_SQ)
            err = sq - yi * LG_SQ
            for d in range(LG_DIMS):
                g[d] += err * math.floor(xi[d] * LG_XQ)
            g[LG_DIMS] += err
        w = [w[d] - LG_LR * ((g[d] / (LG_SQ * LG_XQ)) / n)
             for d in range(LG_DIMS)] + [
            w[LG_DIMS] - LG_LR * ((g[LG_DIMS] / LG_SQ) / n)]
        losses.append(loss(w))
    assert losses[-1] <= losses[0]

    # and the engine's fitted weights equal this replica's
    from kmr_spark.plans.iterative import iter_logreg

    got = {r.dim: r.weight for r in iter_logreg(spark, SF_SMALL).collect()}
    for d in range(LG_DIMS + 1):
        assert abs(got[d] - w[d]) < 1e-12, (d, got[d], w[d])


def test_link_prediction_pairs_not_edges(spark):
    """Predicted links must not already be edges, and every pair's
    common count must match a brute-force recount."""
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import graph_link_prediction

    edges = set()
    adj = {}
    for r in rmat_raw_edges(spark).collect():
        if r.src == r.dst:
            continue
        u, v = min(r.src, r.dst), max(r.src, r.dst)
        edges.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    rows = graph_link_prediction(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert (r.a, r.b) not in edges
        common = len(adj.get(r.a, set()) & adj.get(r.b, set()))
        assert common == r.common, (r.a, r.b, common, r.common)
        union = len(adj.get(r.a, set()) | adj.get(r.b, set()))
        assert r.jaccard_permille == (1000 * r.common) // union


def test_jsonl_roundtrip_totals_match_parquet(spark):
    from kmr_spark.plans.quality import events_jsonl_roundtrip
    from kmr_spark.session import load_tables

    rows = events_jsonl_roundtrip(spark, SF_SMALL).collect()
    n = load_tables(spark, SF_SMALL)["events"].count()
    assert sum(r.n for r in rows) == n


def test_feature_matrix_covers_every_user(spark):
    from kmr_spark.plans.training import users_feature_matrix
    from kmr_spark.session import load_tables

    rows = users_feature_matrix(spark, SF_SMALL).collect()
    users = {r.user_id for r in
             load_tables(spark, SF_SMALL)["events"]
             .select("user_id").distinct().collect()}
    assert {r.user_id for r in rows} == users
    for r in rows:
        assert r.active_days >= r.longest_streak >= 1
        assert r.n_events >= r.active_days
        assert r.entropy >= -1e-9
        assert (r.n_purchases == 0) == (r.spend_cents == 0)


def test_export_shards_cover_all_users(spark):
    from kmr_spark.plans.training import (EXPORT_SHARDS,
                                          train_export_shards,
                                          users_feature_matrix)

    manifest = train_export_shards(spark, SF_SMALL).collect()
    m = users_feature_matrix(spark, SF_SMALL).collect()
    assert sum(r.n_users for r in manifest) == len(m)
    assert sum(r.sum_ids for r in manifest) == sum(r.user_id for r in m)
    assert {r.shard for r in manifest} <= set(range(EXPORT_SHARDS))
