"""Semantic test for the round-5 tenth-wave operator: IVF recall
calibration vs a numpy-free Python reference over the same centroids
and ties.  (Value parity vs DuckDB is the oracle gate's job.)
"""

import math
from collections import defaultdict

SF_SMALL = "/root/testdata/sf0.001"


def _seq_cosine(a, b):
    dot = n1 = n2 = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    for x in a:
        n1 = n1 + x * x
    for y in b:
        n2 = n2 + y * y
    return dot / (math.sqrt(n1) * math.sqrt(n2))


def test_ivf_recall_bruteforce(spark):
    from kmr_spark.llm_ops.similarity import (N_CENTROIDS, N_PROBES,
                                              N_QUERIES, TOP_K,
                                              sim_ivf_recall)
    from kmr_spark.session import load_tables

    emb = {r.vec_id: [float(x) for x in r.embedding]
           for r in load_tables(spark, SF_SMALL)["embeddings"].collect()}
    cents = [(i, emb[i]) for i in range(N_CENTROIDS)]

    def cell_ranks(v):
        scored = sorted(((-_seq_cosine(v, cv), cid) for cid, cv in cents))
        return [cid for _, cid in scored]

    cell = {vid: cell_ranks(v)[0] for vid, v in emb.items()}
    truth = []
    for q in range(N_QUERIES):
        scored = sorted(((-_seq_cosine(emb[q], v), vid)
                         for vid, v in emb.items() if vid != q))
        truth += [(q, vid) for _, vid in scored[:TOP_K]]
    possible = len(truth)
    got = {r.probes: r for r in sim_ivf_recall(spark, SF_SMALL).collect()}
    assert sorted(got) == list(range(1, N_PROBES + 1))
    prev = -1
    for p in range(1, N_PROBES + 1):
        probed = {q: set(cell_ranks(emb[q])[:p]) for q in range(N_QUERIES)}
        hits = sum(1 for q, nid in truth if cell[nid] in probed[q])
        r = got[p]
        assert (r.hits, r.possible) == (hits, possible)
        assert r.recall_permille == (1000 * hits) // possible
        assert r.recall == float(hits) / float(possible)
        assert r.hits >= prev  # more probes never lose a candidate
        prev = r.hits
