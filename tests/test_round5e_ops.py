"""Semantic tests for the round-5 seventh-wave operators: BM25 vs a
pure-Python scorer with the same rational constants, the full-outer
streamed attribution vs the batch join + watermark flush rule,
curriculum ordering vs a window-rank reference, and t-closeness vs a
dict-based TV computation.  (Value parity vs DuckDB is the oracle
gate's job; these pin the MATH.)
"""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def test_bm25_python_scorer(spark):
    from kmr_spark.plans.search import BM25_TERMS, BM25_TOP, search_bm25_topk
    from kmr_spark.session import load_tables

    rows = load_tables(spark, SF_SMALL)["documents"] \
        .select("doc_id", "text").collect()
    toks = {r.doc_id: [t for t in (r.text or "").split(" ") if t != ""]
            for r in rows}
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n, s = len(dl), sum(dl.values())
    cf, df, tf = Counter(), Counter(), defaultdict(Counter)
    for d, ts in toks.items():
        for t in ts:
            cf[t] += 1
            tf[t][d] += 1
    for t, per in tf.items():
        df[t] = len(per)
    terms = sorted(cf, key=lambda t: (-cf[t], t))[:BM25_TERMS]
    scores = defaultdict(float)
    for t in terms:  # fixed term order = fixed summation order
        idf = (math.floor(math.log(2 * n + 2) * 1e6)
               - math.floor(math.log(2 * df[t] + 1) * 1e6))
        for d, f_td in tf[t].items():
            scores[d] += (float(idf) * float(44 * f_td * s)
                          / float(20 * f_td * s + 6 * s + 18 * dl[d] * n))
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOP]
    got = search_bm25_topk(spark, SF_SMALL).collect()
    assert [(r.doc_id, r.score_micro) for r in got] == want
    assert all(r.dl == dl[r.doc_id] for r in got)


def test_attribution_full_streamed_flush_rule(spark):
    from kmr_spark.plans.analytics import events_attribution_full_streamed
    from kmr_spark.session import load_tables

    got = {r.user_id: r for r in
           events_attribution_full_streamed(spark, SF_SMALL).collect()}

    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("event_id", "user_id", "ts", "event_type") \
        .filter(F.col("event_type").isin("purchase", "click")).collect()
    purchases = [(r.user_id, r.ts, r.event_id) for r in ev
                 if r.event_type == "purchase"]
    clicks = [(r.user_id, r.ts, r.event_id) for r in ev
              if r.event_type == "click"]
    from datetime import timedelta
    hour = timedelta(hours=1)
    wm = min(max(t for _, t, _ in purchases),
             max(t for _, t, _ in clicks)) - hour
    rows = []  # (user, purchase_id, click_id)
    matched_p, matched_c = set(), set()
    for pu, pt, pid in purchases:
        for cu, ct, cid in clicks:
            if cu == pu and ct < pt and ct >= pt - hour:
                rows.append((pu, pid, cid))
                matched_p.add(pid)
                matched_c.add(cid)
    for pu, pt, pid in purchases:
        if pid not in matched_p and pt < wm:
            rows.append((pu, pid, None))
    for cu, ct, cid in clicks:
        if cid not in matched_c and ct < wm - hour:
            rows.append((cu, None, cid))
    exp = defaultdict(lambda: [0, set(), 0, 0, 0, 0])
    for u, pid, cid in rows:
        e = exp[u]
        e[0] += 1
        if pid is not None:
            e[1].add(pid)
            e[4] += pid
        if pid is not None and cid is None:
            e[2] += 1
        if pid is None:
            e[3] += 1
        if cid is not None:
            e[5] += cid
    assert set(got) == set(exp)
    for u, e in exp.items():
        r = got[u]
        assert (r.n_rows, r.n_purchases, r.n_unattributed,
                r.n_unconverted_clicks, r.purchase_id_sum,
                r.click_id_sum) == \
            (e[0], len(e[1]), e[2], e[3], e[4], e[5])


def test_curriculum_interleaves_sources(spark):
    from kmr_spark.plans.training import (CURRICULUM_TOP,
                                          train_curriculum_order)
    from kmr_spark.session import load_tables

    rows = load_tables(spark, SF_SMALL)["documents"] \
        .select("doc_id", "source", "text").collect()
    per = defaultdict(list)
    for r in rows:
        n = len([t for t in (r.text or "").split(" ") if t != ""])
        per[r.source].append((n, r.doc_id))
    feed = []
    for src, lst in per.items():
        for rank, (n, d) in enumerate(sorted(lst)):
            feed.append((rank, src, d, n))
    want = sorted(feed)[:CURRICULUM_TOP]
    got = train_curriculum_order(spark, SF_SMALL).collect()
    assert [(r.src_rank, r.source, r.doc_id, r.n_tokens) for r in got] == want
    # round-robin property: the first |sources| rows are rank-0 rows,
    # one per source
    n_src = len(per)
    head = got[:n_src]
    assert {r.source for r in head} == set(per)
    assert all(r.src_rank == 0 for r in head)


def test_t_closeness_dict_reference(spark):
    from kmr_spark.plans.privacy import (T_LEVELS_PERMILLE,
                                         privacy_t_closeness)
    from kmr_spark.session import load_tables

    cust = load_tables(spark, SF_SMALL)["customer"] \
        .select("c_mktsegment", "c_nationkey", "c_acctbal").collect()
    gs, glob = Counter(), Counter()
    for r in cust:
        band = math.floor(r.c_acctbal / 1000)
        gs[(r.c_mktsegment, r.c_nationkey, band)] += 1
        glob[band] += 1
    n = len(cust)
    g_size = Counter()
    for (m, k, b), c in gs.items():
        g_size[(m, k)] += c
    tvs = {}
    for (m, k), g in g_size.items():
        sd = sum(abs(gs.get((m, k, b), 0) * n - cb * g)
                 for b, cb in glob.items())
        tvs[(m, k)] = (1000 * sd) // (2 * g * n)
    row = privacy_t_closeness(spark, SF_SMALL).collect()[0]
    assert row.n_groups == len(tvs)
    assert row.max_tv_permille == max(tvs.values())
    assert row.avg_tv_permille == sum(tvs.values()) // len(tvs)
    for t in T_LEVELS_PERMILLE:
        assert getattr(row, f"groups_above_t{t}") == \
            sum(1 for v in tvs.values() if v > t)
