"""Semantic tests for the round-5 eighth-wave operators: Holt-Winters
vs a Python ring-state fold, the KS statistic vs a brute ECDF sweep,
and k-truss vs a dict-based peel.  (Value parity vs DuckDB is the
oracle gate's job; these pin the MATH.)
"""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _trunc_div(a: int, b: int) -> int:
    return int(a / b) if (a < 0) != (b < 0) else a // b


def test_holt_winters_python_fold(spark):
    from kmr_spark.plans.timeseries import (HOLT_HORIZON, HOLT_S, HW_PERIOD,
                                            events_holt_winters)
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"]
    daily = sorted(
        (r.d, r.x) for r in ev.select(
            F.datediff(F.to_date("ts"),
                       F.lit("2024-01-01").cast("date")).alias("d"))
        .groupBy("d").agg(F.count("*").alias("x")).collect())
    l = b = None
    s = [0] * HW_PERIOD
    for _, x in daily:
        if l is None:
            l, b = HOLT_S * x, 0
            continue
        nl = _trunc_div(HOLT_S * x - s[0] + 3 * (l + b), 4)
        nb = _trunc_div(nl - l + 7 * b, 8)
        ns = _trunc_div(HOLT_S * x - nl + 3 * s[0], 4)
        s = s[1:] + [ns]
        l, b = nl, nb
    got = events_holt_winters(spark, SF_SMALL).collect()
    assert len(got) == HOLT_HORIZON
    for i, r in enumerate(got, start=1):
        sm = s[(i - 1) % HW_PERIOD]
        assert (r.h, r.level_milli, r.trend_milli, r.seasonal_milli) == \
            (i, l, b, sm)
        assert r.forecast_milli == l + i * b + sm
        assert r.forecast == float(l + i * b + sm) / HOLT_S


def test_ks_test_bruteforce(spark):
    from kmr_spark.plans.inference import KS_ALPHA_C, events_ks_test
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"] \
        .filter("event_type = 'purchase'") \
        .select("user_id", "value").collect()
    a = sorted(math.floor(r.value * 100) for r in ev if r.user_id % 2 == 0)
    b = sorted(math.floor(r.value * 100) for r in ev if r.user_id % 2 == 1)
    na, nb = len(a), len(b)
    vals = sorted(set(a) | set(b))
    ca = Counter(a)
    cb = Counter(b)
    cum_a = cum_b = 0
    d_scaled = 0
    for v in vals:
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        d_scaled = max(d_scaled, abs(cum_a * nb - cum_b * na))
    row = events_ks_test(spark, SF_SMALL).collect()[0]
    assert (row.na, row.nb, row.d_scaled) == (na, nb, d_scaled)
    assert row.d == float(d_scaled) / (float(na) * float(nb))
    crit = KS_ALPHA_C * math.sqrt((float(na) + float(nb))
                                  / (float(na) * float(nb)))
    assert row.crit_05 == crit
    assert row.reject_05 == (row.d > crit)


def test_ktruss_python_peel(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import (TRUSS_K, TRUSS_ROUNDS, graph_ktruss)

    raw = {(r.src, r.dst) for r in rmat_raw_edges(spark).collect()}
    edges = {(min(u, v), max(u, v)) for u, v in raw if u != v}
    trace = []
    for _ in range(TRUSS_ROUNDS):
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        sup = Counter()
        for u, v in edges:
            for w in adj[u] & adj[v]:
                sup[(u, v)] += 1
        edges = {e for e in edges if sup[e] >= TRUSS_K - 2}
        trace.append((len(edges),
                      sum(u * 1048576 + v for u, v in edges)))
    got = graph_ktruss(spark, SF_SMALL).collect()
    assert [(r.round, r.n_edges, r.edge_checksum) for r in got] == \
        [(i + 1, n, c) for i, (n, c) in enumerate(trace)]
