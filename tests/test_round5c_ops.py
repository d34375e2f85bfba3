"""Semantic tests for the round-5 fifth-wave operators: clustering
coefficient vs brute force, reciprocity vs set arithmetic, spectral
amplitudes vs a Python DFT on the same quantized tables, integrity
audit vs set-membership counts, decision stump vs exhaustive search,
and normal-equations OLS vs numpy lstsq.  (Value parity vs DuckDB is
the oracle gate's job; these pin the MATH.)
"""

import math

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _canon_edges(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import canonicalize_edges

    return {(r.u, r.v) for r in
            canonicalize_edges(rmat_raw_edges(spark)).collect()}


def test_clustering_coefficient_bruteforce(spark):
    from kmr_spark.plans.graphs import graph_clustering_coefficient

    got = graph_clustering_coefficient(spark, SF_SMALL).collect()[0]
    edges = _canon_edges(spark)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri_at = {n: 0 for n in adj}
    n_tri = 0
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:  # u < v < w given canonical u < v
                n_tri += 1
                tri_at[u] += 1
                tri_at[v] += 1
                tri_at[w] += 1
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    deg2 = [n for n in adj if len(adj[n]) >= 2]
    assert got.n_triangles == n_tri
    assert got.n_wedges == wedges
    assert got.n_nodes_deg2 == len(deg2)
    assert math.isclose(got.transitivity, 3.0 * n_tri / wedges,
                        rel_tol=1e-12)
    sum_ppm = sum(
        (2_000_000 * tri_at[n]) // (len(adj[n]) * (len(adj[n]) - 1))
        for n in deg2)
    assert math.isclose(got.avg_local_cc,
                        sum_ppm / (1_000_000.0 * len(deg2)), rel_tol=1e-12)


def test_reciprocity_set_arithmetic(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import graph_reciprocity

    got = graph_reciprocity(spark, SF_SMALL).collect()[0]
    raw = [(r.src, r.dst) for r in rmat_raw_edges(spark).collect()]
    directed = {(s, d) for s, d in raw if s != d}
    mutual = sum(1 for s, d in directed if (d, s) in directed)
    loops = {s for s, d in raw if s == d}
    assert got.n_directed == len(directed)
    assert got.n_mutual == mutual
    assert got.n_self_loops == len(loops)
    assert got.reciprocity_permille == (1000 * mutual) // len(directed)
    assert math.isclose(got.reciprocity, mutual / len(directed),
                        rel_tol=1e-12)


def test_spectral_python_dft(spark):
    from kmr_spark.plans.timeseries import (_trig_tables,
                                            events_spectral_daily)
    from kmr_spark.session import load_tables

    got = {r.period: r for r in
           events_spectral_daily(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"]
    rows = (ev.select(F.expr(
        "timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', "
        "date_trunc('hour', ts))").alias("t"))
        .groupBy("t").agg(F.count("*").alias("x")).collect())
    xs = {r.t: r.x for r in rows}
    n = len(xs)
    dc = sum(xs.values()) // n
    for period in (24, 168):
        cq, sq = _trig_tables(period)
        sc = sum((x - dc) * cq[t % period] for t, x in xs.items())
        ss = sum((x - dc) * sq[t % period] for t, x in xs.items())
        assert got[period].sum_cos_q == sc
        assert got[period].sum_sin_q == ss
        assert got[period].n_hours == n
        amp = math.sqrt(float(sc) * float(sc) + float(ss) * float(ss)) \
            * 2.0 / (1e6 * n)
        assert math.isclose(got[period].amplitude, amp, rel_tol=1e-12)
    # daily rhythm should dominate weekly on a 30-day uniform clock
    assert got[24].amplitude >= 0.0 and got[168].amplitude >= 0.0


def test_integrity_audit_set_membership(spark):
    from kmr_spark.plans.quality import FK_EDGES, integrity_audit
    from kmr_spark.session import load_tables

    got = {(r.child_table, r.fk_column): r for r in
           integrity_audit(spark, SF_SMALL).collect()}
    tables = load_tables(spark, SF_SMALL)
    assert len(got) == len(FK_EDGES)
    for child, fk, parent, pk in FK_EDGES:
        fks = [r[0] for r in tables[child].select(fk).collect()]
        pks = {r[0] for r in tables[parent].select(pk).collect()}
        r = got[(child, fk)]
        assert r.n_rows == len(fks)
        assert r.n_null_fk == sum(1 for v in fks if v is None)
        orphans = sum(1 for v in fks if v is not None and v not in pks)
        assert r.n_orphans == orphans
        assert r.orphan_ppm == (1_000_000 * orphans) // len(fks)
        # synthetic TPC-H data is referentially intact
        assert r.n_orphans == 0 and r.n_null_fk == 0


def _stump_users(spark):
    from kmr_spark.session import load_tables
    ev = load_tables(spark, SF_SMALL)["events"]
    return (ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("label")).collect())


def test_decision_stump_exhaustive(spark):
    from kmr_spark.plans.inference import events_decision_stump

    got = {r.feature: r for r in
           events_decision_stump(spark, SF_SMALL).collect()}
    users = _stump_users(spark)
    for feat in ("n_click", "n_view", "n_days"):
        pts = sorted((getattr(u, feat), u.label) for u in users)
        t_cnt = len(pts)
        t_pos = sum(l for _, l in pts)

        def gain(thr):
            lp = sum(l for x, l in pts if x <= thr)
            lc = sum(1 for x, _ in pts if x <= thr)
            rc, rp = t_cnt - lc, t_pos - lp
            if lc == 0 or rc == 0:
                return None
            return ((lp * lp + (lc - lp) ** 2) / lc
                    + (rp * rp + (rc - rp) ** 2) / rc
                    - (t_pos * t_pos + (t_cnt - t_pos) ** 2) / t_cnt) / t_cnt

        cands = sorted({x for x, _ in pts})
        best = max((g, -thr) for thr in cands
                   if (g := gain(thr)) is not None)
        r = got[feat]
        assert math.isclose(r.gini_gain, best[0], rel_tol=1e-12)
        assert r.threshold == -best[1]
        assert r.l_cnt + r.r_cnt == t_cnt
        assert r.l_pos + r.r_pos == t_pos
        assert r.gini_gain >= 0.0  # Gini gain of the argmax split


def test_ols_normal_equations_vs_numpy(spark):
    import numpy as np

    from kmr_spark.plans.inference import users_ols_normal_equations
    from kmr_spark.session import load_tables

    got = users_ols_normal_equations(spark, SF_SMALL).collect()[0]
    ev = load_tables(spark, SF_SMALL)["events"].collect()
    per_user = {}
    for e in ev:
        u = per_user.setdefault(e.user_id, [0, 0, 0])
        if e.event_type == "view":
            u[0] += 1
        elif e.event_type == "click":
            u[1] += 1
        elif e.event_type == "purchase":
            u[2] += math.floor(e.value * 100)
    X = np.array([[1.0, v[0], v[1]] for v in per_user.values()])
    y = np.array([float(v[2]) for v in per_user.values()])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got.n == len(per_user)
    assert math.isclose(got.beta0, beta[0], rel_tol=1e-6)
    assert math.isclose(got.beta_views, beta[1], rel_tol=1e-6)
    assert math.isclose(got.beta_clicks, beta[2], rel_tol=1e-6)


def test_backlog_aging_bruteforce(spark):
    import datetime

    from kmr_spark.plans.valuation import (BACKLOG_ASOF,
                                           orders_backlog_aging)
    from kmr_spark.session import load_tables

    got = {r.age_bucket: r for r in
           orders_backlog_aging(spark, SF_SMALL).collect()}
    t = load_tables(spark, SF_SMALL)
    asof = datetime.date.fromisoformat(BACKLOG_ASOF)
    lines = {}
    for li in t["lineitem"].collect():
        d = li.l_shipdate.date() if hasattr(li.l_shipdate, "date") \
            else li.l_shipdate
        e = lines.setdefault(li.l_orderkey, [d, 0, 0])
        e[0] = max(e[0], d)
        if d > asof:
            e[1] += 1
            e[2] += math.floor(li.l_extendedprice * 100)
    buckets = {}
    for o in t["orders"].collect():
        od = o.o_orderdate.date() if hasattr(o.o_orderdate, "date") \
            else o.o_orderdate
        li = lines.get(o.o_orderkey)
        if od > asof or li is None or li[0] <= asof:
            continue
        age = (asof - od).days
        b = ("000-030d" if age <= 30 else "031-090d" if age <= 90
             else "091-365d" if age <= 365 else "366d+")
        e = buckets.setdefault(b, [0, 0, 0])
        e[0] += 1
        e[1] += li[1]
        e[2] += li[2]
    assert set(got) == set(buckets)
    for b, (n, nl, cents) in buckets.items():
        assert (got[b].n_orders, got[b].n_open_lines,
                got[b].open_value_cents) == (n, nl, cents)


def test_snapshot_diff_classification(spark):
    from kmr_spark.plans.incremental import customer_snapshot_diff
    from kmr_spark.session import load_tables

    got = {r.diff_status: r for r in
           customer_snapshot_diff(spark, SF_SMALL).collect()}
    keys = [r.c_custkey for r in
            load_tables(spark, SF_SMALL)["customer"]
            .select("c_custkey").collect()]
    removed = sum(1 for k in keys if k % 97 == 0)
    added = sum(1 for k in keys if k % 101 == 0)
    chg_bal = {k for k in keys if k % 7 == 0 and k % 97 != 0}
    chg_nat = {k for k in keys if k % 11 == 0 and k % 97 != 0}
    changed = len(chg_bal | chg_nat)
    assert got["removed"].n_keys == removed
    assert got["added"].n_keys == added
    assert got["changed"].n_keys == changed
    assert got["changed"].n_acctbal_chg == len(chg_bal)
    assert got["changed"].n_nation_chg == len(chg_nat)
    assert got["changed"].n_segment_chg == 0
    assert got["unchanged"].n_keys == len(keys) - removed - changed


def test_quantization_error_bruteforce(spark):
    from kmr_spark.llm_ops.similarity import emb_quantization_error
    from kmr_spark.session import load_tables

    got = {r.dim: r for r in
           emb_quantization_error(spark, SF_SMALL).collect()}
    vecs = [r.embedding for r in
            load_tables(spark, SF_SMALL)["embeddings"].collect()]
    ndim = len(vecs[0])
    assert set(got) == set(range(ndim))
    for dim in (0, 7, ndim - 1):
        xs = [float(v[dim]) for v in vecs]
        vmin, vmax = min(xs), max(xs)
        codes, s_q = [], 0
        for x in xs:
            c = math.floor((x - vmin) * 255.0 / (vmax - vmin) + 0.5)
            recon = vmin + float(c) * (vmax - vmin) / 255.0
            s_q += math.floor((x - recon) * (x - recon) * 1e12)
            codes.append(c)
        r = got[dim]
        assert (r.vmin, r.vmax) == (vmin, vmax)
        assert (r.code_min, r.code_max) == (min(codes), max(codes))
        assert r.code_min >= 0 and r.code_max <= 255
        assert r.sum_err2_q == s_q
        # quantization error bounded by (scale/2)^2 per element
        half = (vmax - vmin) / 255.0 / 2.0
        assert r.mse <= half * half * 1.000001


def test_generalization_ladder_monotone(spark):
    from kmr_spark.plans.privacy import privacy_generalization_ladder

    rows = {r.level: r for r in
            privacy_generalization_ladder(spark, SF_SMALL).collect()}
    l0, l1, l2 = (rows["L0_segment_nation"], rows["L1_segment_region"],
                  rows["L2_segment"])
    # coarsening strictly reduces group count and cannot shrink groups
    assert l0.n_groups >= l1.n_groups >= l2.n_groups
    assert l0.min_group <= l1.min_group <= l2.min_group
    assert l0.groups_below_k5 >= l1.groups_below_k5 >= l2.groups_below_k5
    # l-diversity of the coarser partition can only rise
    assert l0.min_l_diversity <= l1.min_l_diversity <= l2.min_l_diversity


def test_power_analysis_formula(spark):
    from kmr_spark.plans.inference import (POWER_MDE, Z_ALPHA, Z_BETA,
                                           events_power_analysis)
    from kmr_spark.session import load_tables

    got = {r.event_type: r for r in
           events_power_analysis(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].collect()
    per = {}
    for e in ev:
        per.setdefault(e.event_type, []).append(math.floor(e.value * 100))
    for t, xs in per.items():
        n, s = len(xs), sum(xs)
        q = sum(x * x for x in xs)
        var = (n * q - s * s) / (n * (n - 1))
        mean = s / n
        delta = POWER_MDE * mean
        n_arm = math.ceil(2.0 * (Z_ALPHA + Z_BETA) ** 2 * var
                          / (delta * delta))
        r = got[t]
        assert r.n == n
        assert math.isclose(r.mean_cents, mean, rel_tol=1e-12)
        assert math.isclose(r.var_cents2, var, rel_tol=1e-9)
        assert r.n_per_arm == n_arm


def test_session_gap_sensitivity_monotone(spark):
    from kmr_spark.plans.analytics import (GAP_SWEEP_MIN,
                                           events_session_gap_sensitivity)

    rows = {r.gap_minutes: r for r in
            events_session_gap_sensitivity(spark, SF_SMALL).collect()}
    assert set(rows) == set(GAP_SWEEP_MIN)
    # larger gap can only merge sessions: counts fall, size rises
    for a, b in zip(GAP_SWEEP_MIN, GAP_SWEEP_MIN[1:]):
        assert rows[a].n_sessions >= rows[b].n_sessions
        assert rows[a].n_single_event >= rows[b].n_single_event
        assert rows[a].events_per_session <= rows[b].events_per_session
    # 30-min row agrees with the canonical sessionizer
    from kmr_spark.plans.analytics import events_sessionize
    n30 = events_sessionize(spark, SF_SMALL).count()
    assert rows[30].n_sessions == n30


def test_bot_flags_census(spark):
    from kmr_spark.plans.behavior import (BOT_PEAK_PER_MIN,
                                          BOT_TOTAL_EVENTS,
                                          events_bot_flags)
    from kmr_spark.session import load_tables

    got = {(r.rate_flag, r.volume_flag): r for r in
           events_bot_flags(spark, SF_SMALL).collect()}
    ev = load_tables(spark, SF_SMALL)["events"].select(
        "user_id", F.date_trunc("minute", "ts").alias("m")).collect()
    per = {}
    for e in ev:
        per.setdefault(e.user_id, {}).setdefault(e.m, [0])[0] += 1
    census = {}
    for mins in per.values():
        peak = max(v[0] for v in mins.values())
        total = sum(v[0] for v in mins.values())
        k = (peak >= BOT_PEAK_PER_MIN, total >= BOT_TOTAL_EVENTS)
        c = census.setdefault(k, [0, 0, 0])
        c[0] += 1
        c[1] += total
        c[2] = max(c[2], total)
    assert set(got) == set(census)
    for k, (nu, ne, mx) in census.items():
        assert (got[k].n_users, got[k].n_events, got[k].max_events) \
            == (nu, ne, mx)


def test_fulfillment_lag_bruteforce(spark):
    from kmr_spark.plans.trends import orders_fulfillment_lag
    from kmr_spark.session import load_tables

    got = {r.o_orderpriority: r for r in
           orders_fulfillment_lag(spark, SF_SMALL).collect()}
    t = load_tables(spark, SF_SMALL)
    first = {}
    for li in t["lineitem"].collect():
        d = li.l_shipdate.date() if hasattr(li.l_shipdate, "date") \
            else li.l_shipdate
        k = li.l_orderkey
        first[k] = min(first.get(k, d), d)
    lags = {}
    for o in t["orders"].collect():
        if o.o_orderkey not in first:
            continue
        od = o.o_orderdate.date() if hasattr(o.o_orderdate, "date") \
            else o.o_orderdate
        lags.setdefault(o.o_orderpriority, []).append(
            (first[o.o_orderkey] - od).days)
    for p, xs in lags.items():
        xs.sort()
        n = len(xs)
        r = got[p]
        assert r.n_orders == n
        assert (r.min_days, r.max_days) == (xs[0], xs[-1])
        lo = xs[(n - 1) // 2]   # rank ceil(n/2)
        hi = xs[n // 2]         # rank n//2 + 1
        assert r.median_2x == lo + hi
        # lower integer-rank convention: rank ceil(9n/10)
        assert r.p90_days == xs[-(-9 * n // 10) - 1]


def test_centroid_drift_bruteforce(spark):
    from kmr_spark.plans.linalg import emb_centroid_drift
    from kmr_spark.session import load_tables

    got = {r.label: r for r in
           emb_centroid_drift(spark, SF_SMALL).collect()}
    rows = load_tables(spark, SF_SMALL)["embeddings"].collect()
    per = {}
    for r in rows:
        half = r.vec_id % 2
        e = per.setdefault((r.label, half), [0, None])
        vq = [math.floor(float(v) * 1e6) for v in r.embedding]
        e[0] += 1
        e[1] = vq if e[1] is None else [a + b for a, b in zip(e[1], vq)]
    for label in {l for l, _ in per}:
        na, sa = per[(label, 0)]
        nb, sb = per[(label, 1)]
        s = sum(math.floor((x / na - y / nb) * (x / na - y / nb))
                for x, y in zip(sa, sb))
        r = got[label]
        assert (r.n_even, r.n_odd) == (na, nb)
        assert r.sum_gap2_q == s
        assert math.isclose(r.l2_drift, math.sqrt(float(s)) / 1e6,
                            rel_tol=1e-12)


def test_apriori_triples_bruteforce(spark):
    from itertools import combinations

    from kmr_spark.plans.basket import (TRIPLE_MIN_SUPPORT, TRIPLE_TOP_K,
                                        basket_apriori_triples)
    from kmr_spark.session import load_tables

    got = basket_apriori_triples(spark, SF_SMALL).collect()
    t = load_tables(spark, SF_SMALL)
    brand = {r.p_partkey: r.p_brand for r in t["part"].collect()}
    baskets = {}
    for li in t["lineitem"].collect():
        baskets.setdefault(li.l_orderkey, set()).add(brand[li.l_partkey])
    singles, triples = {}, {}
    for bs in baskets.values():
        for b in bs:
            singles[b] = singles.get(b, 0) + 1
        for tri in combinations(sorted(bs), 3):
            triples[tri] = triples.get(tri, 0) + 1
    n = len(baskets)
    keep = sorted(
        ((s, tri) for tri, s in triples.items()
         if s >= TRIPLE_MIN_SUPPORT),
        key=lambda p: (-p[0], p[1]))[:TRIPLE_TOP_K]
    assert [(r.brand_a, r.brand_b, r.brand_c, r.support) for r in got] \
        == [(*tri, s) for s, tri in keep]
    for r in got:
        want = (r.support * float(n) * float(n)
                / (singles[r.brand_a] * float(singles[r.brand_b])
                   * singles[r.brand_c]))
        assert math.isclose(r.lift, want, rel_tol=1e-9)


def test_encoding_advisor_bruteforce(spark):
    from kmr_spark.plans.layout import events_encoding_advisor
    from kmr_spark.session import load_tables

    got = {r.column_name: r for r in
           events_encoding_advisor(spark, SF_SMALL).collect()}
    ev = sorted(load_tables(spark, SF_SMALL)["events"].collect(),
                key=lambda e: (e.ts, e.event_id))
    for name, fn in (("event_type", lambda e: e.event_type),
                     ("user_id", lambda e: e.user_id),
                     ("value_cents", lambda e: math.floor(e.value * 100)),
                     ("props", lambda e: e.props)):
        per_day = {}
        for e in ev:
            per_day.setdefault(e.ts.date(), []).append(fn(e))
        runs = sum(
            1 + sum(1 for a, b in zip(vs, vs[1:]) if a != b)
            for vs in per_day.values())
        vals = [fn(e) for e in ev]
        r = got[name]
        assert r.n_rows == len(vals)
        assert r.n_distinct == len(set(v for v in vals if v is not None))
        assert r.n_runs == runs
        assert r.n_null == sum(1 for v in vals if v is None)
        assert math.isclose(r.avg_run_len, len(vals) / runs,
                            rel_tol=1e-12)
    # advisor sanity: 5-value event_type must look dictionary-friendly
    assert got["event_type"].distinct_permille < 50
