"""Semantic tests for the round-5 sixth-wave operators: inverted-index
stats and phrase query vs a pure-Python index, HITS vs a dict mat-vec,
Holt recurrence vs a Python fold, hazard vs the KM table, pHash vs a
numpy DCT on the exact thumbnail pixels, deflated PCA orthogonality,
and longest-repeat vs brute force.  (Value parity vs DuckDB is the
oracle gate's job; these pin the MATH.)
"""

import math
from collections import Counter, defaultdict

SF_SMALL = "/root/testdata/sf0.001"


def _doc_tokens(spark):
    from kmr_spark.session import load_tables

    rows = load_tables(spark, SF_SMALL)["documents"] \
        .select("doc_id", "text").collect()
    return {r.doc_id: [t for t in (r.text or "").split(" ") if t != ""]
            for r in rows}


def test_inverted_index_bruteforce(spark):
    from kmr_spark.plans.search import TOP_TOKENS, search_inverted_index

    toks = _doc_tokens(spark)
    tf = defaultdict(Counter)  # token -> {doc: tf}
    for did, ts in toks.items():
        for t in ts:
            tf[t][did] += 1
    exp = {}
    for t, per in tf.items():
        max_tf = max(per.values())
        top_doc = min(d for d, c in per.items() if c == max_tf)
        exp[t] = (len(per), sum(per.values()), max_tf, top_doc)
    want = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[:TOP_TOKENS]
    got = search_inverted_index(spark, SF_SMALL).collect()
    assert len(got) == len(want)
    for row, (tok, (df, cf, max_tf, top_doc)) in zip(got, want):
        assert (row.token, row.df, row.cf, row.max_tf, row.top_doc) == \
            (tok, df, cf, max_tf, top_doc)


def test_phrase_query_bruteforce(spark):
    from kmr_spark.plans.search import TOP_DOCS, search_phrase_query

    toks = _doc_tokens(spark)
    grams = Counter()
    for ts in toks.values():
        for i in range(len(ts) - 1):
            grams[(ts[i], ts[i + 1])] += 1
    top = min(grams.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    per_doc = {}
    for did, ts in toks.items():
        pos = [i for i in range(len(ts) - 1)
               if (ts[i], ts[i + 1]) == top]
        if pos:
            per_doc[did] = (len(pos), pos[0])
    want = sorted(per_doc.items(), key=lambda kv: (-kv[1][0], kv[0]))
    want = want[:TOP_DOCS]
    got = search_phrase_query(spark, SF_SMALL).collect()
    assert [(r.doc_id, r.n_occ, r.first_pos) for r in got] == \
        [(d, n, p) for d, (n, p) in want]
    assert all((r.w1, r.w2) == top for r in got)


def test_hits_dict_matvec(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import HITS_ROUNDS, HITS_TOP, graph_hits

    edges = {(r.src, r.dst) for r in rmat_raw_edges(spark).collect()
             if r.src != r.dst}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    a = {n: 1 for n in nodes}
    for _ in range(HITS_ROUNDS):
        h = defaultdict(int)
        for u, v in edges:
            h[u] += a.get(v, 0)
        a = defaultdict(int)
        for u, v in edges:
            a[v] += h[u]
    top_a = sorted(nodes, key=lambda n: (-a.get(n, 0), n))[:HITS_TOP]
    top_h = sorted(nodes, key=lambda n: (-h.get(n, 0), n))[:HITS_TOP]
    got = graph_hits(spark, SF_SMALL).collect()
    ga = [(r.node, r.score) for r in got if r.role == "authority"]
    gh = [(r.node, r.score) for r in got if r.role == "hub"]
    assert ga == [(n, a.get(n, 0)) for n in top_a]
    assert gh == [(n, h.get(n, 0)) for n in top_h]
    # BIGINT headroom claimed in the docstring: scores stay < 2^52
    assert max(s for _, s in ga + gh) < 1 << 52


def test_holt_linear_python_fold(spark):
    from kmr_spark.plans.timeseries import (HOLT_HORIZON, HOLT_S,
                                            events_holt_linear)
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"]
    from pyspark.sql import functions as F
    daily = sorted(
        (r.d, r.x) for r in ev.select(
            F.datediff(F.to_date("ts"),
                       F.lit("2024-01-01").cast("date")).alias("d"))
        .groupBy("d").agg(F.count("*").alias("x")).collect())
    l = b = None
    for _, x in daily:
        if l is None:
            l, b = HOLT_S * x, 0
        else:
            nl = int((HOLT_S * x + 3 * (l + b)) / 4)  # trunc toward zero
            nb = int((nl - l + 7 * b) / 8)
            l, b = nl, nb
    got = events_holt_linear(spark, SF_SMALL).collect()
    assert len(got) == HOLT_HORIZON
    for i, r in enumerate(got, start=1):
        assert r.h == i
        assert (r.level_milli, r.trend_milli) == (l, b)
        assert r.forecast_milli == l + i * b
        assert r.forecast == float(l + i * b) / HOLT_S


def test_hazard_consistent_with_km(spark):
    from kmr_spark.plans.inference import (events_hazard_daily,
                                           events_survival_km)

    km = {r.duration: (r.n_event, r.n_risk)
          for r in events_survival_km(spark, SF_SMALL).collect()}
    got = events_hazard_daily(spark, SF_SMALL).collect()
    assert sorted(km) == [r.duration for r in got]
    cum = 0
    for r in got:
        d, n_risk = km[r.duration]
        assert (r.n_event, r.n_risk) == (d, n_risk)
        assert r.hazard_permille == (1000 * d) // n_risk
        cum += (1_000_000 * d) // n_risk
        assert r.cum_hazard_micro == cum
        assert r.nelson_aalen == cum / 1_000_000.0


def test_phash_numpy_reference(spark):
    import numpy as np

    from kmr_spark.llm_ops.multimodal import (PHASH_SIDE, _phash_dct_flat,
                                              multimodal_image_phash)
    from kmr_spark.session import load_tables

    docs = load_tables(spark, SF_SMALL)["documents"] \
        .select("doc_id", "text").filter("text IS NOT NULL").collect()
    t = np.array(_phash_dct_flat(), dtype=np.int64).reshape(8, 8)[:4]
    exp = {}
    for r in docs:
        w, h = (len(r.text) % 31) + 2, (r.doc_id % 17) + 2
        fill = r.doc_id % 251
        xo, yo = np.arange(PHASH_SIDE), np.arange(PHASH_SIDE)
        px = (fill + 3 * ((xo[None, :] * w) // PHASH_SIDE)
              + 5 * ((yo[:, None] * h) // PHASH_SIDE)) % 251  # px[y][x]
        s = t @ px.T.astype(np.int64) @ t.T
        bits = (s.ravel()[1:] > 0).astype(np.int64)
        exp[r.doc_id] = (int((bits << np.arange(15)).sum()),
                         int(bits.sum()))
    got = multimodal_image_phash(spark, SF_SMALL).collect()
    assert len(got) == len(exp)
    for row in got:
        assert (row.phash, row.n_ones) == exp[row.doc_id]


def _seq_dot(a, b):
    """Sequential left-fold dot, bit-identical to functions.vectors.dot."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def test_pca_two_directions(spark):
    from kmr_spark.plans.linalg import (PI_DIM, PI_Q, _pca_two_dirs,
                                        emb_pca_two)
    from kmr_spark.session import load_tables

    emb = load_tables(spark, SF_SMALL)["embeddings"].collect()
    mat = [[float(x) for x in r.embedding] for r in emb]

    def atav_mirror(v):
        # pure-Python mirror of the engine's quantized Aᵀ(A·v) pass:
        # sequential per-row dot, floor(x*s*1e9) int terms, int sums
        sums = [0] * PI_DIM
        for row in mat:
            s = _seq_dot(row, v)
            for d, x in enumerate(row):
                sums[d] += math.floor(x * s * PI_Q)
        return [sq / PI_Q for sq in sums]

    v1, v2 = _pca_two_dirs(atav_mirror)
    assert math.isclose(_seq_dot(v1, v1), 1.0, rel_tol=1e-12)
    assert math.isclose(_seq_dot(v2, v2), 1.0, rel_tol=1e-12)
    # deflation enforces orthogonality up to float rounding
    assert abs(_seq_dot(v1, v2)) < 1e-9

    rows = emb_pca_two(spark, SF_SMALL).collect()
    assert len(rows) == len(emb)
    ref = {r.vec_id: (_seq_dot(m, v1), _seq_dot(m, v2))
           for r, m in zip(emb, mat)}
    for r in rows:
        e1, e2 = ref[r.vec_id]
        assert r.score1 == e1 and r.score2 == e2  # same fold, bit-exact


def test_longest_repeat_bruteforce(spark):
    from kmr_spark.llm_ops.lexical import REPEAT_MAX_N, text_longest_repeat

    toks = _doc_tokens(spark)
    exp = Counter()
    for ts in toks.values():
        best = 0
        for n in range(1, REPEAT_MAX_N + 1):
            grams = Counter(tuple(ts[i:i + n])
                            for i in range(len(ts) - n + 1))
            if grams and grams.most_common(1)[0][1] >= 2:
                best = n
        exp[best] += 1
    got = {r.max_repeat_len: r.n_docs
           for r in text_longest_repeat(spark, SF_SMALL).collect()}
    assert got == dict(exp)
