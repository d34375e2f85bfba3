"""Unit tests for round-3 operators: triangle counting, int8-quantized
kNN, edit-distance dedup, incremental state merge."""

import itertools

from pyspark.sql import functions as F

from kmr_spark.plans.graphs import canonicalize_edges, triangle_census
from kmr_spark.plans.incremental import merge_user_state, _user_state

SF_SMALL = "/root/testdata/sf0.001"


# ------------------------------------------------------------- triangles

def _census(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_census(canonicalize_edges(df)).collect()[0]


def test_triangles_k4(spark):
    # complete graph on 4 nodes: C(4,3) = 4 triangles
    edges = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    r = _census(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)


def test_triangles_dedup_selfloops_and_direction(spark):
    # duplicate edges, reversed edges, and self-loops must not change
    # the census; a path graph has zero triangles
    edges = [(0, 1), (1, 0), (1, 1), (1, 2), (1, 2), (2, 3)]
    r = _census(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 3, 0)


def test_triangles_skewed_star_plus_rim(spark):
    # hub 0 connected to 1..8, rim edges (1,2), (3,4): each rim edge
    # closes exactly one triangle through the hub. The hub's degree (8)
    # dwarfs the rim's (<=3) — exercises the degree orientation.
    edges = [(0, i) for i in range(1, 9)] + [(1, 2), (3, 4)]
    r = _census(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (9, 10, 2)


def test_triangles_matches_bruteforce_on_rmat_subgraph(spark):
    # brute-force reference on a small deterministic subgraph
    from kmr_spark.plans.generate import rmat_raw_edges
    edges = (rmat_raw_edges(spark)
             .filter((F.col("src") < 64) & (F.col("dst") < 64)))
    canon = canonicalize_edges(edges)
    got = triangle_census(canon).collect()[0]
    es = {(r.u, r.v) for r in canon.collect()}
    nodes = sorted({n for e in es for n in e})
    brute = sum(
        1 for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in es and (x, z) in es and (y, z) in es)
    assert got.n_triangles == brute and got.n_edges == len(es)


# --------------------------------------------------------- quantized kNN

def test_quantized_knn_recall_vs_bruteforce(spark):
    from kmr_spark.llm_ops.similarity import knn_bruteforce, knn_quantized
    exact = knn_bruteforce(spark, SF_SMALL).collect()
    quant = knn_quantized(spark, SF_SMALL).collect()
    by_q_exact = {}
    by_q_quant = {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in quant:
        by_q_quant.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(by_q_exact) == set(by_q_quant)
    overlaps = [len(by_q_exact[q] & by_q_quant[q]) / len(by_q_exact[q])
                for q in by_q_exact]
    # int8 quantization error is ~1/255 per axis; top-5 sets should be
    # nearly identical on 64-dim vectors
    assert sum(overlaps) / len(overlaps) >= 0.8


def test_quantized_codes_are_int8_range(spark):
    # the implicit codes floor(v/s + 0.5) must fit int8 by construction
    from kmr_spark.functions import vectors as V
    from kmr_spark.llm_ops.similarity import _emb
    emb = _emb(spark, SF_SMALL)
    maxabs = F.aggregate(F.transform(F.col("vd"), F.abs), F.lit(0.0),
                         lambda acc, x: F.greatest(acc, x))
    s0 = maxabs / F.lit(127.0)
    qs = F.when(s0 == F.lit(0.0), F.lit(1.0)).otherwise(s0)
    codes = emb.withColumn("qs", qs).select(F.explode(F.transform(
        F.col("vd"), lambda x: F.floor(x / F.col("qs") + F.lit(0.5)))).alias("c"))
    mn, mx = codes.agg(F.min("c"), F.max("c")).collect()[0]
    assert -127 <= mn and mx <= 127


# ----------------------------------------------------- edit-distance dedup

def test_editdistance_blocking_is_recall_exact(spark):
    # every same-lang pair within MAX_EDITS found by the naive
    # all-pairs scan must also be found by the banded operator
    from kmr_spark.llm_ops.dedup import MAX_EDITS, editdistance_pairs
    from kmr_spark.session import load_tables
    docs = load_tables(spark, SF_SMALL)["documents"].select(
        "doc_id", "lang", "text").collect()
    naive = set()
    for a, b in itertools.combinations(sorted(docs, key=lambda r: r.doc_id), 2):
        if a.lang != b.lang or abs(len(a.text) - len(b.text)) > MAX_EDITS:
            continue
        # cheap python Levenshtein with early bound via length
        la, lb = a.text, b.text
        prev = list(range(len(lb) + 1))
        for i, ca in enumerate(la, 1):
            cur = [i] + [0] * len(lb)
            for j, cb in enumerate(lb, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (ca != cb))
            prev = cur
        if prev[-1] <= MAX_EDITS:
            naive.add((a.doc_id, b.doc_id, prev[-1]))
    got = {(r.doc_a, r.doc_b, r.edit_distance)
           for r in editdistance_pairs(spark, SF_SMALL).collect()}
    assert got == naive


def test_editdistance_salted_regime_same_pairs(spark, monkeypatch):
    # the large-corpus salted join (forced by shrinking the docs-per-
    # salt knob) must emit the identical pair set — each pair meets at
    # exactly the left doc's salt, so salting is a pure split of the
    # block work, never a recall change
    import kmr_spark.llm_ops.dedup as dd

    base = {(r.doc_a, r.doc_b, r.edit_distance)
            for r in dd.editdistance_pairs(spark, SF_SMALL).collect()}
    monkeypatch.setattr(dd, "_DOCS_PER_SALT", 50)
    assert dd._edit_join_salts(spark, SF_SMALL) > 1
    salted = {(r.doc_a, r.doc_b, r.edit_distance)
              for r in dd.editdistance_pairs(spark, SF_SMALL).collect()}
    assert salted == base


# ------------------------------------------------------ incremental merge

def test_merge_equals_direct_aggregate_any_cutoff(spark):
    from kmr_spark.session import load_tables
    ev = load_tables(spark, SF_SMALL)["events"]
    direct = {r.user_id: r for r in _user_state(ev).collect()}
    for cutoff in ("2024-01-05", "2024-01-16", "2024-01-28"):
        c = F.to_timestamp(F.lit(cutoff))
        merged = merge_user_state(
            _user_state(ev.filter(F.col("ts") < c)),
            _user_state(ev.filter(F.col("ts") >= c)))
        got = {r.user_id: r for r in merged.collect()}
        assert set(got) == set(direct)
        for uid, r in got.items():
            d = direct[uid]
            assert r.n_events == d.n_events
            assert r.sum_dec == d.sum_dec  # decimal: exact associativity
            assert r.last == d.last


def test_merge_handles_one_sided_keys(spark):
    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, "a", 1.0)],
        "user_id long, ts string, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    delta = spark.createDataFrame(
        [(2, "2024-01-02 00:00:00", 11, "b", 2.0)],
        "user_id long, ts string, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    merged = merge_user_state(_user_state(base), _user_state(delta))
    rows = {r.user_id: r for r in merged.collect()}
    assert rows[1].n_events == 1 and rows[1].last.event_type == "a"
    assert rows[2].n_events == 1 and rows[2].last.event_type == "b"


# ------------------------------------------------------------ portable HLL

def test_hll_error_within_bounds_across_scales(spark):
    from kmr_spark.plans.sketches import hll_distinct
    for n in (100, 1000, 20000):
        df = spark.range(n).select(
            F.lit("g").alias("g"), F.col("id").alias("k"))
        est = hll_distinct(df, "k", "g").collect()[0].hll_est
        # HLL-64 standard error is ~13%; allow 3 sigma
        assert abs(est - n) / n < 0.4, (n, est)


def test_hll_insensitive_to_duplicates_and_partitioning(spark):
    from kmr_spark.plans.sketches import hll_distinct
    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    dup = base.unionAll(base).unionAll(base).repartition(13)
    a = hll_distinct(base, "k", "g").collect()[0]
    b = hll_distinct(dup, "k", "g").collect()[0]
    assert a.hll_est == b.hll_est and a.n_registers_hit == b.n_registers_hit


# ------------------------------------------------------- semistruct plans

def test_props_extract_stays_jvm_side(spark):
    # JSON extraction must be a codegen expression, not a Python UDF
    from kmr_spark.plans.semistruct import events_props_extract
    plan = events_props_extract(spark, SF_SMALL)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------- bigram LM

def test_bigram_lm_counts_and_bounds(spark):
    from kmr_spark.llm_ops.textstats import doc_bigram_lm
    from kmr_spark.session import load_tables
    rows = {r.doc_id: r for r in doc_bigram_lm(spark, SF_SMALL).collect()}
    docs = load_tables(spark, SF_SMALL)["documents"].select(
        "doc_id", "text").collect()
    total = sum(len(d.text) - 1 for d in docs if d.text and len(d.text) >= 2)
    for d in docs:
        if d.text is None or len(d.text) < 2:
            assert d.doc_id not in rows
            continue
        r = rows[d.doc_id]
        assert r.n_bigrams == len(d.text) - 1
        # every bigram count is within [1, total]: score in [0, log2(total)]
        assert 0 <= r.lm_score <= total.bit_length()


def test_bigram_lm_flags_out_of_distribution_text(spark):
    # the repeated-alphabet doc shares no bigrams with itself? build a
    # corpus where one doc is pure noise: its mean log-frequency must be
    # the corpus minimum
    import string
    common = [(i, "the quick brown fox jumps over the lazy dog " * 3)
              for i in range(20)]
    noise = [(99, "zq xj qv jx vq qz " * 4)]
    df = spark.createDataFrame(common + noise, "doc_id long, text string")

    from kmr_spark.llm_ops import textstats as T
    from unittest import mock
    with mock.patch.object(T, "load_tables", lambda s, d: {"documents": df}):
        out = {r.doc_id: r.lm_score for r in T.doc_bigram_lm(spark, "x").collect()}
    assert out[99] == min(out.values())


# -------------------------------------------------- multimodal features

def test_bmp_features_histogram_sums_to_pixels(spark):
    from kmr_spark.llm_ops.multimodal import (
        encode_docs_as_gradient_bmp, extract_bmp_features)
    docs = spark.createDataFrame(
        [(1, "x" * 40), (2, "y" * 7)], "doc_id long, text string")
    rows = extract_bmp_features(
        encode_docs_as_gradient_bmp(docs)).collect()
    for r in rows:
        bins = sum(r[f"h{i}"] for i in range(8))
        assert bins == r.width * r.height
        assert 0.0 <= r.px_mean <= 255.0


# -------------------------------------------------- histogram quantiles

def test_sketch_quantiles_error_bounded_by_bucket_width(spark):
    from kmr_spark.plans.sketches import N_QBUCKETS, events_sketch_quantiles
    from kmr_spark.session import load_tables
    got = {r.event_type: r for r in
           events_sketch_quantiles(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_type", "value").collect()
    import collections
    by_type = collections.defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(r.value)
    for t, vals in by_type.items():
        vals.sort()
        width = (vals[-1] - vals[0]) / N_QBUCKETS
        r = got[t]
        assert r.n == len(vals)
        import math
        for name, q in (("p50_est", 0.5), ("p90_est", 0.9), ("p99_est", 0.99)):
            # the sketch picks rank ceil(q*n) (1-indexed); that order
            # statistic lies inside the chosen bucket, so the lower
            # edge is within one bucket width below it
            exact = vals[max(0, math.ceil(q * len(vals)) - 1)]
            assert exact - width <= r[name] <= exact + 1e-9


# ------------------------------------------------- timeseries + funnel

def test_resample_spine_is_dense_and_ffill_monotone_coverage(spark):
    from kmr_spark.plans.timeseries import events_resample_1h
    rows = events_resample_1h(spark, SF_SMALL).collect()
    import collections
    by_type = collections.defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.hour_ts)
        # dense hourly spine: consecutive rows are exactly 1h apart
        for a, b in zip(rs, rs[1:]):
            assert (b.hour_ts - a.hour_ts).total_seconds() == 3600
        # zero-filled gaps keep n = 0 and sum 0; ffill carries forward
        seen = None
        for r in rs:
            if r.n == 0:
                assert r.sum_value == 0.0
                if seen is not None:
                    assert r.ffill_sum == seen
            else:
                seen = r.ffill_sum


def test_funnel_counts_are_monotone_and_order_strict(spark):
    from kmr_spark.plans.timeseries import events_funnel
    from kmr_spark.session import load_tables
    r = events_funnel(spark, SF_SMALL).collect()[0]
    assert r.n_users >= r.n_view >= r.n_view_click >= r.n_full_funnel >= 0
    # python recompute on the small fixture
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "user_id", "event_type", "ts").collect()
    import collections
    per_user = collections.defaultdict(list)
    for e in ev:
        per_user[e.user_id].append(e)
    full = 0
    for uid, es in per_user.items():
        views = [e.ts for e in es if e.event_type == "view"]
        if not views:
            continue
        t0 = min(views)
        clicks = [e.ts for e in es if e.event_type == "click" and e.ts > t0]
        if not clicks:
            continue
        t1 = min(clicks)
        if any(e.event_type == "purchase" and e.ts > t1 for e in es):
            full += 1
    assert r.n_full_funnel == full


# ----------------------------------------------------------------- BFS

def test_bfs_depths_on_path_and_star(spark):
    from kmr_spark.plans.graphs import bfs_depths
    # path 0-1-2-3: depths 0,1,2,3
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {r.node: r.depth for r in
           bfs_depths(canonicalize_edges(path)).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # star from 5 with disconnected edge (8,9): unreachable excluded
    star = spark.createDataFrame(
        [(5, 0), (5, 6), (5, 7), (0, 6), (8, 9)], "src long, dst long")
    got = {r.node: r.depth for r in
           bfs_depths(canonicalize_edges(star), source=5).collect()}
    assert got == {5: 0, 0: 1, 6: 1, 7: 1}


def test_bfs_depth_cap_raises(spark):
    import pytest
    from kmr_spark.plans.graphs import bfs_depths
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long")
    with pytest.raises(RuntimeError):
        bfs_depths(canonicalize_edges(path), max_depth=2)


# ----------------------------------------------- review-fix regressions

def test_bfs_exact_eccentricity_does_not_raise(spark):
    # path 0-1-2-3: eccentricity 3 == max_depth must complete cleanly
    from kmr_spark.plans.graphs import bfs_depths
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long")
    got = {r.node: r.depth for r in
           bfs_depths(canonicalize_edges(path), max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_triangles_with_node_ids_beyond_packed_long_range(spark):
    # ids >= 2^20 broke the old packed-long orientation key; the struct
    # key must order correctly for any id domain
    big = 1 << 40
    edges = [(big + a, big + b)
             for a, b in itertools.combinations(range(4), 2)]
    r = _census(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)


def test_merge_preserves_null_sums(spark):
    # a key whose every value is NULL must merge to a NULL sum, exactly
    # like the direct aggregate (coalescing to 0 would break the
    # merge == recompute invariant)
    base = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, "a", None)],
        "user_id long, ts string, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    delta = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00", 11, "b", None),
         (2, "2024-01-02 00:00:00", 12, "c", 5.0)],
        "user_id long, ts string, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    merged = {r.user_id: r for r in merge_user_state(
        _user_state(base), _user_state(delta)).collect()}
    direct = {r.user_id: r for r in _user_state(
        base.unionByName(delta)).collect()}
    assert merged[1].sum_dec is None and direct[1].sum_dec is None
    assert merged[2].sum_dec == direct[2].sum_dec
    assert merged[1].n_events == direct[1].n_events == 2


# ------------------------------------------------------ data validation

def test_check_counts_violations_in_one_pass(spark):
    from kmr_spark.operators.validate import (accepted_values, check,
                                              in_range, matches, not_null,
                                              unique)
    df = spark.createDataFrame(
        [(1, "a", 5.0, "x1"), (1, "a", -2.0, "x2"),
         (2, None, 50.0, "y9"), (3, "zz", None, "bad")],
        "id long, cat string, v double, code string")
    rules = [not_null("cat"), accepted_values("cat", ["a", "b"]),
             in_range("v", 0.0, 10.0), matches("code", r"^[a-z][0-9]$"),
             unique("id")]
    got = {r.rule: r for r in check(df, rules).collect()}
    assert got["not_null(cat)"].violations == 1
    assert got["accepted_values(cat)"].violations == 1      # 'zz'; NULL skipped
    assert got["in_range(v,0.0,10.0)"].violations == 2      # -2.0 and 50.0
    assert got["matches(code)"].violations == 1             # 'bad'
    assert got["unique(id)"].violations == 1                # id=1 twice
    assert all(r.n_rows == 4 for r in got.values())
    assert not any(r.passed for r in got.values())
    # one aggregation pass: a clean table passes everything
    clean = spark.createDataFrame([(7, "b", 1.0, "q3")],
                                  "id long, cat string, v double, code string")
    assert all(r.passed for r in check(clean, rules).collect())


# ------------------------------------------------------------ Python UDTF

def test_udtf_matches_codegen_explode(spark):
    from kmr_spark.functions.udtfs import register_udtfs
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, ""), (3, None)], "id long, text string")
    df.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.id, t.word, t.pos FROM udtf_docs d, "
        "LATERAL split_words(d.text) t").collect()
    ref = []
    for rid, text in [(1, "the quick fox"), (2, ""), (3, None)]:
        for i, w in enumerate((text or "").split()):
            ref.append((rid, w, i))
    assert sorted((r.id, r.word, r.pos) for r in via_udtf) == sorted(ref)


def test_char_ngrams_udtf(spark):
    from kmr_spark.functions.udtfs import register_udtfs
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT t.ngram FROM (SELECT 'abcd' AS s) x, "
        "LATERAL char_ngrams(x.s) t").collect()
    assert sorted(r.ngram for r in rows) == ["abc", "bcd"]


# ------------------------------------------------- streaming state merge

def test_stream_state_merge_restart_is_idempotent(spark, tmp_path):
    from kmr_spark.streaming.windows import (merge_stream_to_state,
                                             stream_events)
    ck, st = str(tmp_path / "ck"), str(tmp_path / "state")
    ev = stream_events(spark, SF_SMALL)
    first = merge_stream_to_state(ev, st, ck)
    rows1 = sorted((r.user_id, r.n_events, r.sum_dec) for r in first.collect())
    # restart against the same checkpoint: no new input, state unchanged
    again = merge_stream_to_state(stream_events(spark, SF_SMALL), st, ck)
    rows2 = sorted((r.user_id, r.n_events, r.sum_dec) for r in again.collect())
    assert rows1 == rows2
    # and the state equals the direct batch aggregate
    from kmr_spark.plans.incremental import _user_state
    from kmr_spark.session import load_tables
    direct = sorted(
        (r.user_id, r.n_events, r.sum_dec)
        for r in _user_state(load_tables(spark, SF_SMALL)["events"]).collect())
    assert rows1 == direct


def test_retention_cohort_matrix_invariants(spark):
    from kmr_spark.plans.timeseries import events_retention_cohorts
    from kmr_spark.session import load_tables
    rows = events_retention_cohorts(spark, SF_SMALL).collect()
    ev = load_tables(spark, SF_SMALL)["events"].select("user_id").distinct()
    n_users = ev.count()
    # day-0 cells partition the user base: every user appears in
    # exactly one cohort at offset 0
    day0 = sum(r.n_active for r in rows if r.day_offset == 0)
    assert day0 == n_users
    # offsets are non-negative and each cohort's offset-k count never
    # exceeds its day-0 size
    base = {r.cohort_day: r.n_active for r in rows if r.day_offset == 0}
    for r in rows:
        assert r.day_offset >= 0
        assert r.n_active <= base[r.cohort_day]


def test_anomaly_zscore_moments(spark):
    import math

    from kmr_spark.plans.timeseries import events_anomaly_zscore
    rows = events_anomaly_zscore(spark, SF_SMALL).collect()
    import collections
    by_type = collections.defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for t, rs in by_type.items():
        ns = [r.n for r in rs]
        mean = sum(ns) / len(ns)
        var = (len(ns) * sum(x * x for x in ns) - sum(ns) ** 2) / len(ns) ** 2
        for r in rs:
            assert math.isclose(r.z, (r.n - mean) / math.sqrt(var),
                                rel_tol=1e-12)
            assert r.is_anomaly == (abs(r.z) > 2.0)


def test_referential_rule_counts_orphans(spark):
    from kmr_spark.operators.validate import check, referential
    facts = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long")
    dim = spark.createDataFrame([(10,), (20,)], "k long")
    got = {r.rule: r for r in
           check(facts, [referential("fk", dim, "k")]).collect()}
    r = got["referential(fk)"]
    assert r.violations == 1 and not r.passed  # fk=99; NULL skipped
    assert r.n_rows == 4
