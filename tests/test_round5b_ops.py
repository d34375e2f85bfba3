"""Semantic tests for the round-5 second-wave operators: OLS vs
numpy, DiD decomposition, changepoint brute force, KM invariants,
Gini brute force, k-anonymity census consistency, compaction packing
property, LM perplexity brute force, NB confusion totals, k-core
peeling invariants, degree-distribution conservation, and MinHash
calibration bounds.  (Value parity vs DuckDB is the oracle gate's
job; these pin the MATH.)
"""

import math

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _daily_counts(spark):
    from kmr_spark.session import load_tables
    ev = load_tables(spark, SF_SMALL)["events"]
    rows = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.count("*").alias("y")).collect())
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.day, r.y))
    return {t: sorted(v) for t, v in by_type.items()}


def test_linreg_matches_numpy(spark):
    import numpy as np

    from kmr_spark.plans.inference import events_linreg_trend

    got = {r.event_type: r for r in
           events_linreg_trend(spark, SF_SMALL).collect()}
    for t, pts in _daily_counts(spark).items():
        d0 = pts[0][0]
        x = np.array([(d - d0).days for d, _ in pts], dtype=float)
        y = np.array([c for _, c in pts], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert math.isclose(got[t].slope, slope, rel_tol=1e-9)
        assert math.isclose(got[t].intercept, intercept, rel_tol=1e-9)
        assert got[t].n_days == len(pts)


def test_did_decomposition(spark):
    from kmr_spark.plans.inference import _DID_CUTOFF, events_diff_in_diff
    from kmr_spark.session import load_tables

    r = events_diff_in_diff(spark, SF_SMALL).collect()[0]
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "user_id", F.to_date("ts").alias("day"), "value").collect()
    import datetime
    cut = datetime.date.fromisoformat(_DID_CUTOFF)
    g = {k: [0, 0] for k in ("t_pre", "t_post", "c_pre", "c_post")}
    for e in ev:
        key = ("t" if e.user_id % 2 == 1 else "c") + (
            "_post" if e.day >= cut else "_pre")
        g[key][0] += math.floor(e.value * 100)
        g[key][1] += 1
    m = {k: s / n for k, (s, n) in g.items()}
    assert math.isclose(r.did_cents,
                        (m["t_post"] - m["t_pre"]) - (m["c_post"] - m["c_pre"]),
                        rel_tol=1e-12)
    assert r.n_t_pre == g["t_pre"][1] and r.n_c_post == g["c_post"][1]


def test_changepoint_bruteforce(spark):
    from kmr_spark.plans.inference import events_changepoint_mean
    from kmr_spark.session import load_tables

    got = {r.event_type: r for r in
           events_changepoint_mean(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_type", F.to_date("ts").alias("day"), "value").collect()
    daily = {}
    for e in ev:
        daily.setdefault(e.event_type, {}).setdefault(e.day, 0)
        daily[e.event_type][e.day] += math.floor(e.value * 100)
    for t, dd in daily.items():
        days = sorted(dd)
        n = len(days)
        s_n = sum(dd.values())
        best, best_day = -1, None
        s = 0
        for i, d in enumerate(days, start=1):
            s += dd[d]
            score = abs(n * s - i * s_n)
            if score > best:
                best, best_day = score, d
        assert got[t].change_day == best_day
        assert got[t].score_num == best


def test_survival_km_invariants(spark):
    from kmr_spark.plans.inference import events_survival_km

    rows = events_survival_km(spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r.duration)
    total = rows[0].n_risk
    resolved = 0
    prev_risk = None
    for r in rows:
        assert r.n_event + r.n_censored > 0
        assert r.n_risk == total - resolved
        resolved += r.n_event + r.n_censored
        if prev_risk is not None:
            assert r.n_risk < prev_risk
        prev_risk = r.n_risk
    assert resolved == total


def test_gini_bruteforce(spark):
    from kmr_spark.plans.valuation import orders_gini_revenue
    from kmr_spark.session import load_tables

    r = orders_gini_revenue(spark, SF_SMALL).collect()[0]
    orders = load_tables(spark, SF_SMALL)["orders"].select(
        "o_custkey", "o_totalprice").collect()
    rev = {}
    for o in orders:
        rev[o.o_custkey] = rev.get(o.o_custkey, 0) + math.floor(
            o.o_totalprice * 100)
    xs = sorted(rev.values())
    n, s0 = len(xs), sum(xs)
    s1 = sum(i * x for i, x in enumerate(xs, start=1))
    assert r.n_customers == n and r.total_cents == s0
    assert math.isclose(r.gini, (2 * s1 - (n + 1) * s0) / (n * s0),
                        rel_tol=1e-12)
    assert 0.0 <= r.gini < 1.0


def test_k_anonymity_census(spark):
    from kmr_spark.plans.privacy import privacy_k_anonymity
    from kmr_spark.session import load_tables

    r = privacy_k_anonymity(spark, SF_SMALL).collect()[0]
    cust = load_tables(spark, SF_SMALL)["customer"].collect()
    groups = {}
    for c in cust:
        k = (c.c_mktsegment, c.c_nationkey)
        groups.setdefault(k, []).append(math.floor(c.c_acctbal / 1000))
    assert r.n_groups == len(groups)
    assert r.n_rows == len(cust)
    assert r.min_l_diversity == min(len(set(v)) for v in groups.values())
    for k in (2, 5, 10):
        assert r[f"rows_below_k{k}"] == sum(
            len(v) for v in groups.values() if len(v) < k)
    assert r.rows_below_k2 <= r.rows_below_k5 <= r.rows_below_k10


def test_compaction_plan_packing(spark):
    from kmr_spark.plans.layout import (COMPACTION_TARGET_BYTES,
                                        events_compaction_plan)

    rows = events_compaction_plan(spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r.day)
    # greedy packing: file_group = floor(cum_before / target) must be
    # non-decreasing, and each group's bytes < target + its last
    # member's bytes (one day can straddle the boundary)
    cum = 0
    by_group = {}
    for r in rows:
        assert r.file_group == cum // COMPACTION_TARGET_BYTES
        cum += r.day_bytes
        by_group.setdefault(r.file_group, []).append(r.day_bytes)
    for g, sizes in by_group.items():
        assert sum(sizes) < COMPACTION_TARGET_BYTES + sizes[-1] + max(sizes)


def test_lm_perplexity_bruteforce(spark):
    from kmr_spark.llm_ops.lexical import text_lm_perplexity
    from kmr_spark.session import load_tables

    got = {r.doc_id: r for r in
           text_lm_perplexity(spark, SF_SMALL).collect()}
    docs = load_tables(spark, SF_SMALL)["documents"].select(
        "doc_id", "text").collect()
    toks = {d.doc_id: [t for t in (d.text or "").split(" ") if t]
            for d in docs}
    bg_counts, uni_counts = {}, {}
    for ts in toks.values():
        for t in ts:
            uni_counts[t] = uni_counts.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg_counts[(a, b)] = bg_counts.get((a, b), 0) + 1
    v = len(uni_counts)
    q = lambda x: math.floor(math.log(x) * 1e6)
    for doc_id, ts in toks.items():
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            assert doc_id not in got
            continue
        s = sum(q(bg_counts[p] + 1) - q(uni_counts[p[0]] + v) for p in bgs)
        assert got[doc_id].n_bigrams == len(bgs)
        assert got[doc_id].qlp_sum == s
        assert got[doc_id].cross_entropy > 0


def test_naive_bayes_totals(spark):
    from kmr_spark.llm_ops.lexical import docs_naive_bayes_lang
    from kmr_spark.session import load_tables

    rows = docs_naive_bayes_lang(spark, SF_SMALL).collect()
    docs = load_tables(spark, SF_SMALL)["documents"]
    n_scorable = docs.filter(
        F.col("text").isNotNull()
        & (F.size(F.filter(F.split("text", " "),
                           lambda x: x != "")) >= 1)).count()
    assert sum(r.n_docs for r in rows) == n_scorable
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    for r in rows:
        assert r.true_lang in langs and r.pred_lang in langs


def test_kcore_invariants(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import (KCORE_K, KCORE_MAX_ROUNDS,
                                        canonicalize_edges, graph_kcore)

    core = {r.node: r.core_degree
            for r in graph_kcore(spark, SF_SMALL).collect()}
    # brute-force peel in Python
    edges = {(r.u, r.v) for r in canonicalize_edges(
        rmat_raw_edges(spark)).collect()}
    rounds = 0
    while True:
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        nxt = {(u, v) for u, v in edges if u in keep and v in keep}
        if nxt == edges:
            break
        edges = nxt
        rounds += 1
    assert rounds <= KCORE_MAX_ROUNDS, "oracle unroll bound too small"
    want = {}
    for u, v in edges:
        want[u] = want.get(u, 0) + 1
        want[v] = want.get(v, 0) + 1
    assert core == want
    assert all(d >= KCORE_K for d in core.values())


def test_degree_distribution_conservation(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import (canonicalize_edges,
                                        graph_degree_distribution)

    rows = graph_degree_distribution(spark, SF_SMALL).collect()
    n_edges = canonicalize_edges(rmat_raw_edges(spark)).count()
    assert sum(r.degree * r.n_nodes for r in rows) == 2 * n_edges


def test_minhash_calibration_bounds(spark):
    from kmr_spark.functions.hashing import N_HASHES
    from kmr_spark.llm_ops.tuning import dedup_minhash_calibration

    rows = dedup_minhash_calibration(spark, SF_SMALL).collect()
    assert rows, "banded candidates expected on the synthetic corpus"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.n_sig_match <= N_HASHES
        assert r.est_permille == r.n_sig_match * 1000 // N_HASHES
        assert 0 < r.inter_size <= r.union_size or r.inter_size == 0
        assert r.exact_permille == r.inter_size * 1000 // r.union_size


def test_window_parity_derivations(spark):
    from kmr_spark.plans.winfuncs import events_window_parity

    rows = events_window_parity(spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r.rn)
        n = len(rs)
        assert [r.rn for r in rs] == list(range(1, n + 1))
        for r in rs:
            # unique ordering => rank == rn, so the doubles are derivable
            want_pr = 0.0 if n == 1 else (r.rn - 1) / (n - 1)
            assert math.isclose(r.pct_rank, want_pr, rel_tol=1e-15)
            assert math.isclose(r.cume, r.rn / n, rel_tol=1e-15)
            assert 1 <= r.quartile <= 4
        assert rs[0].prev_value_cents is None
        assert rs[-1].next_type is None


def test_silhouette_bounds(spark):
    from kmr_spark.llm_ops.similarity import N_CENTROIDS, emb_silhouette

    rows = emb_silhouette(spark, SF_SMALL).collect()
    assert 1 <= len(rows) <= N_CENTROIDS
    for r in rows:
        # simplified silhouette is in [0, 1] by construction here
        # (a = NEAREST centroid => b >= a): milli sum bounded per point
        assert 0.0 <= r.mean_silhouette <= 1.0
        assert 0 <= r.s_min <= 1000


def test_rake_bruteforce(spark):
    from kmr_spark.llm_ops.lexical import (RAKE_MIN_OCC, RAKE_STOPWORDS,
                                           text_rake_keywords)
    from kmr_spark.session import load_tables

    got = {r.phrase: (r.n_occ, r.score_milli) for r in
           text_rake_keywords(spark, SF_SMALL).collect()}
    docs = load_tables(spark, SF_SMALL)["documents"].select("text").collect()
    stop = set(RAKE_STOPWORDS)
    phrases = []
    for d in docs:
        run = []
        for t in [t for t in (d.text or "").split(" ") if t]:
            if t in stop:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(tuple(run))
    deg, freq = {}, {}
    for p in phrases:
        for w in p:
            deg[w] = deg.get(w, 0) + len(p)
            freq[w] = freq.get(w, 0) + 1
    wscore = {w: deg[w] * 1000 // freq[w] for w in deg}
    want = {}
    for p in phrases:
        s = " ".join(p)
        n, _ = want.get(s, (0, 0))
        want[s] = (n + 1, sum(wscore[w] for w in p))
    want = {s: v for s, v in want.items() if v[0] >= RAKE_MIN_OCC}
    assert got == want


def test_lpa_bruteforce(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import (LPA_ROUNDS, canonicalize_edges,
                                        graph_label_propagation)

    got = {r.node: r.community for r in
           graph_label_propagation(spark, SF_SMALL).collect()}
    edges = [(r.u, r.v) for r in
             canonicalize_edges(rmat_raw_edges(spark)).collect()]
    adj = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    lbl = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            new[n] = min(cnt, key=lambda l: (-cnt[l], l))
        lbl = new
    assert got == lbl


def test_mix_shift_bridge(spark):
    """rate + mix + volume effects must sum to S2 - S1 exactly."""
    from kmr_spark.plans.valuation import orders_mix_shift

    rows = orders_mix_shift(spark, SF_SMALL).collect()
    assert len(rows) == 5
    s1 = sum(r.s1 for r in rows)
    s2 = sum(r.s2 for r in rows)
    bridge = sum(r.rate_effect_cents + r.mix_effect_cents
                 + r.volume_effect_cents for r in rows)
    assert math.isclose(bridge, s2 - s1, rel_tol=1e-9)


def test_schema_drift_consistency(spark):
    from kmr_spark.plans.semistruct import events_schema_drift
    from kmr_spark.session import load_tables

    rows = events_schema_drift(spark, SF_SMALL).collect()
    assert rows
    n_props = load_tables(spark, SF_SMALL)["events"].filter(
        F.col("props").isNotNull()).count()
    for r in rows:
        assert not (r.appeared and r.disappeared)
        assert 0 <= r.share_pre_permille <= 1000
        assert 0 <= r.share_post_permille <= 1000
        assert 0 < r.n_pre + r.n_post <= n_props


def test_acf_matches_numpy(spark):
    import numpy as np

    from kmr_spark.plans.inference import events_acf_daily

    got = {(r.event_type, r.lag): r for r in
           events_acf_daily(spark, SF_SMALL).collect()}
    for t, pts in _daily_counts(spark).items():
        y = np.array([c for _, c in pts], dtype=float)
        for k in range(1, 8):
            a, b = y[k:], y[:-k]
            r = got[(t, k)]
            assert r.n_pairs == len(a)
            want = np.corrcoef(a, b)[0, 1]
            assert math.isclose(r.acf, want, rel_tol=1e-9), (t, k)
            assert -1.0 <= r.acf <= 1.0


def test_lines_histogram_conservation(spark):
    from kmr_spark.plans.trends import orders_lines_histogram
    from kmr_spark.session import load_tables

    rows = orders_lines_histogram(spark, SF_SMALL).collect()
    li = load_tables(spark, SF_SMALL)["lineitem"]
    assert sum(r.n_lines * r.n_orders for r in rows) == li.count()
    assert sum(r.n_orders for r in rows) == li.select(
        "l_orderkey").distinct().count()


def test_audience_overlap_bruteforce(spark):
    from kmr_spark.plans.behavior import events_audience_overlap
    from kmr_spark.session import load_tables

    got = {(r.type_a, r.type_b): r for r in
           events_audience_overlap(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_type", "user_id").distinct().collect()
    sets = {}
    for e in ev:
        sets.setdefault(e.event_type, set()).add(e.user_id)
    types = sorted(sets)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0 and (a, b) not in got:
                continue
            r = got[(a, b)]
            union = len(sets[a] | sets[b])
            assert (r.n_both, r.n_union) == (inter, union)
            assert r.jaccard_permille == inter * 1000 // union


def test_burstiness_bruteforce(spark):
    from kmr_spark.plans.corpusstats import (BURSTINESS_TOP_K,
                                             text_token_burstiness)
    from kmr_spark.session import load_tables

    rows = text_token_burstiness(spark, SF_SMALL).collect()
    assert len(rows) == BURSTINESS_TOP_K
    docs = load_tables(spark, SF_SMALL)["documents"].select("text").collect()
    n_docs = len(docs)
    counts = []
    for d in docs:
        cd = {}
        for t in [t for t in (d.text or "").split(" ") if t]:
            cd[t] = cd.get(t, 0) + 1
        counts.append(cd)
    for r in rows:
        c = r.c_total
        sc2 = sum(cd.get(r.tok, 0) ** 2 for cd in counts)
        assert c == sum(cd.get(r.tok, 0) for cd in counts)
        assert r.n_docs_with == sum(1 for cd in counts if r.tok in cd)
        want = (n_docs * sc2 - c * c) / (n_docs * c)
        assert math.isclose(r.vmr, want, rel_tol=1e-12)


def test_slo_burn_rolling(spark):
    from kmr_spark.plans.quality import (SLO_ERROR_PERMILLE,
                                         SLO_WINDOW_DAYS, events_slo_burn)

    rows = events_slo_burn(spark, SF_SMALL).collect()
    assert rows == sorted(rows, key=lambda r: r.day)
    for i, r in enumerate(rows):
        lo = max(0, i - SLO_WINDOW_DAYS + 1)
        err7 = sum(x.n_err for x in rows[lo:i + 1])
        tot7 = sum(x.n_total for x in rows[lo:i + 1])
        assert (r.err_7d, r.total_7d) == (err7, tot7)
        assert r.burn_x10 == err7 * 10000 // (tot7 * SLO_ERROR_PERMILLE)
        assert r.breach == (r.burn_x10 > 10)


def test_gram_matrix_bruteforce(spark):
    import math as m

    from kmr_spark.plans.linalg import emb_gram_matrix
    from kmr_spark.session import load_tables

    got = {(r.i, r.j): r.gram_micro2 for r in
           emb_gram_matrix(spark, SF_SMALL).collect()}
    vecs = [[m.floor(x * 1_000_000) for x in r.embedding] for r in
            load_tables(spark, SF_SMALL)["embeddings"].collect()]
    d = len(vecs[0])
    assert len(got) == d * (d + 1) // 2
    # spot-check a few cells exactly (full 2080 is slow in Python)
    for (i, j) in [(0, 0), (0, 1), (5, 40), (63, 63), (31, 32)]:
        want = float(sum(v[i] * v[j] for v in vecs))
        assert got[(i, j)] == want


def test_modularity_bruteforce(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import (canonicalize_edges,
                                        graph_label_propagation,
                                        graph_modularity)

    r = graph_modularity(spark, SF_SMALL).collect()[0]
    edges = [(e.u, e.v) for e in
             canonicalize_edges(rmat_raw_edges(spark)).collect()]
    lbl = {x.node: x.community for x in
           graph_label_propagation(spark, SF_SMALL).collect()}
    m = len(edges)
    intra = sum(1 for u, v in edges if lbl[u] == lbl[v])
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    dc = {}
    for n, d in deg.items():
        dc[lbl[n]] = dc.get(lbl[n], 0) + d
    sum_dsq = sum(d * d for d in dc.values())
    assert (r.m, r.intra_edges) == (m, intra)
    assert r.sum_dsq == float(sum_dsq)
    want = (4 * m * intra - sum_dsq) / (4 * m * m)
    assert math.isclose(r.modularity, want, rel_tol=1e-12)
    assert -0.5 <= r.modularity <= 1.0


def test_snaive_bruteforce(spark):
    from kmr_spark.plans.inference import (SNAIVE_SEASON,
                                           events_forecast_snaive)
    from kmr_spark.session import load_tables

    got = {r.event_type: r for r in
           events_forecast_snaive(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "event_type", F.to_date("ts").alias("day"), "value").collect()
    daily = {}
    for e in ev:
        daily.setdefault(e.event_type, {}).setdefault(e.day, 0)
        daily[e.event_type][e.day] += math.floor(e.value * 100)
    for t, dd in daily.items():
        series = [dd[d] for d in sorted(dd)]
        es, e1, n = 0, 0, 0
        for i in range(len(series)):
            if i >= SNAIVE_SEASON:
                es += abs(series[i] - series[i - SNAIVE_SEASON])
                e1 += abs(series[i] - series[i - 1])
                n += 1
        r = got[t]
        assert (r.n_scored, r.abs_err_snaive, r.abs_err_naive1) == (n, es, e1)
        assert r.mase_permille == es * 1000 // e1


def test_simpson_bruteforce(spark):
    from kmr_spark.plans.corpusstats import text_simpson_diversity
    from kmr_spark.session import load_tables

    got = {r.source: r for r in
           text_simpson_diversity(spark, SF_SMALL).collect()}
    docs = load_tables(spark, SF_SMALL)["documents"].select(
        "source", "text").collect()
    by_src = {}
    for d in docs:
        cd = by_src.setdefault(d.source, {})
        for t in [t for t in (d.text or "").split(" ") if t]:
            cd[t] = cd.get(t, 0) + 1
    for s, cd in by_src.items():
        n = sum(cd.values())
        coll = sum(c * (c - 1) for c in cd.values())
        r = got[s]
        assert (r.vocab, r.n_tokens) == (len(cd), n)
        assert math.isclose(r.simpson, coll / (n * (n - 1)), rel_tol=1e-12)
        assert 0.0 <= r.simpson <= 1.0


def test_mann_whitney_vs_scipy_formula(spark):
    """U and midranks against a brute-force rank computation."""
    from kmr_spark.plans.inference import events_mann_whitney
    from kmr_spark.session import load_tables

    r = events_mann_whitney(spark, SF_SMALL).collect()[0]
    ev = load_tables(spark, SF_SMALL)["events"].filter(
        F.col("event_type") == "purchase").select(
        "user_id", "value").collect()
    g1 = sorted(math.floor(e.value * 100) for e in ev if e.user_id % 2 == 1)
    g2 = sorted(math.floor(e.value * 100) for e in ev if e.user_id % 2 == 0)
    allv = sorted(g1 + g2)
    n = len(allv)
    # midrank of value v = (#below) + (#equal + 1)/2, 1-based
    import bisect
    r1 = 0.0
    for v in g1:
        lo = bisect.bisect_left(allv, v)
        hi = bisect.bisect_right(allv, v)
        r1 += lo + (hi - lo + 1) / 2
    u1 = r1 - len(g1) * (len(g1) + 1) / 2
    assert r.n1 == len(g1) and r.n2 == len(g2)
    assert r.u1_x2 == round(2 * u1)
    # z sanity: standardized, finite, reasonable magnitude
    assert abs(r.z) < 10


def test_qte_deciles_consistency(spark):
    from kmr_spark.plans.inference import events_qte_deciles
    from kmr_spark.session import load_tables

    rows = events_qte_deciles(spark, SF_SMALL).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    ev = load_tables(spark, SF_SMALL)["events"].filter(
        F.col("event_type") == "purchase").collect()
    n_t = sum(1 for e in ev if e.user_id % 2 == 1)
    n_c = len(ev) - n_t
    assert sum(r.n_t for r in rows) == n_t
    assert sum(r.n_c for r in rows) == n_c
    for r in rows:
        assert math.isclose(
            r.qte_cents, r.mean_treat_cents - r.mean_control_cents,
            rel_tol=1e-12)
    # decile means are non-decreasing within each group (rank cut)
    for key in ("mean_treat_cents", "mean_control_cents"):
        vals = [r[key] for r in rows]
        assert vals == sorted(vals)


def test_heaps_curve_invariants(spark):
    from kmr_spark.plans.corpusstats import text_heaps_curve
    from kmr_spark.session import load_tables

    rows = text_heaps_curve(spark, SF_SMALL).collect()
    docs = load_tables(spark, SF_SMALL)["documents"].select("text").collect()
    all_toks = []
    for d in docs:
        all_toks.extend(t for t in (d.text or "").split(" ") if t)
    last = rows[-1]
    assert last.docs_cum == len(docs)
    assert last.tokens_cum == len(all_toks)
    assert last.vocab_cum == len(set(all_toks))
    for a, b in zip(rows, rows[1:]):
        assert a.docs_cum <= b.docs_cum
        assert a.tokens_cum <= b.tokens_cum
        assert a.vocab_cum <= b.vocab_cum


def test_js_divergence_properties(spark):
    """JS is symmetric by construction here; check bounds (0..ln2 in
    nats, allowing quantization slack) and a brute-force spot pair."""
    from kmr_spark.plans.corpusstats import docs_source_divergence_js
    from kmr_spark.session import load_tables

    rows = docs_source_divergence_js(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert -1e-5 <= r.js <= math.log(2) + 1e-5
    # brute force one pair with the same quantization
    docs = load_tables(spark, SF_SMALL)["documents"].select(
        "source", "text").collect()
    pick_a, pick_b = rows[0].src_a, rows[0].src_b
    ca, cb = {}, {}
    for d in docs:
        tgt = ca if d.source == pick_a else cb if d.source == pick_b else None
        if tgt is None:
            continue
        for t in [t for t in (d.text or "").split(" ") if t]:
            tgt[t] = tgt.get(t, 0) + 1
    t_a, t_b = sum(ca.values()), sum(cb.values())
    q = lambda x: math.floor(math.log(x) * 1e6)
    s_ab = sum(c * (q(2 * c * t_b) - q(c * t_b + cb.get(t, 0) * t_a))
               for t, c in ca.items())
    s_ba = sum(c * (q(2 * c * t_a) - q(c * t_a + ca.get(t, 0) * t_b))
               for t, c in cb.items())
    want = s_ab / (2e6 * t_a) + s_ba / (2e6 * t_b)
    assert math.isclose(rows[0].js, want, rel_tol=1e-12)


def test_rolling_corr_bruteforce(spark):
    from kmr_spark.plans.inference import (ROLLING_CORR_DAYS,
                                           events_rolling_corr)

    rows = events_rolling_corr(spark, SF_SMALL).collect()
    xs = [r.x for r in rows]
    ys = [r.y for r in rows]
    for i, r in enumerate(rows):
        lo = max(0, i - ROLLING_CORR_DAYS + 1)
        wx, wy = xs[lo:i + 1], ys[lo:i + 1]
        n = len(wx)
        num = n * sum(a * b for a, b in zip(wx, wy)) - sum(wx) * sum(wy)
        vx = n * sum(a * a for a in wx) - sum(wx) ** 2
        vy = n * sum(b * b for b in wy) - sum(wy) ** 2
        if vx > 0 and vy > 0:
            assert math.isclose(r.rolling_r, num / math.sqrt(vx * vy),
                                rel_tol=1e-12)
            assert -1.0 - 1e-12 <= r.rolling_r <= 1.0 + 1e-12
        else:
            assert r.rolling_r is None
