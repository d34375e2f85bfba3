"""Semantic tests for the round-5 ninth-wave operators: exact Shapley
attribution vs a direct permutation average, and peak prominence vs a
brute scan of the hourly series.  (Value parity vs DuckDB is the
oracle gate's job; these pin the MATH.)
"""

import math
from collections import Counter
from itertools import permutations

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def test_shapley_matches_permutation_average(spark):
    from kmr_spark.plans.behavior import (SHAPLEY_CHANNELS,
                                          events_shapley_attribution)
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("user_id", "ts", "event_type").collect()
    fp = {}
    for r in ev:
        if r.event_type == "purchase":
            fp[r.user_id] = min(fp.get(r.user_id, r.ts), r.ts)
    bit = dict(SHAPLEY_CHANNELS)
    masks = Counter()
    per_user = Counter()
    for r in ev:
        if (r.event_type != "purchase" and r.user_id in fp
                and r.ts < fp[r.user_id]):
            per_user[r.user_id] |= bit[r.event_type]
    for m in per_user.values():
        if m:
            masks[m] += 1

    def v(s: int) -> int:
        return sum(c for m, c in masks.items() if m & s == m)

    # ground truth: average marginal contribution over all 4!
    # channel permutations, scaled x24 (exactly the Shapley value)
    bits = [b for _, b in SHAPLEY_CHANNELS]
    phi24 = Counter()
    for perm in permutations(bits):
        s = 0
        for b in perm:
            phi24[b] += v(s | b) - v(s)
            s |= b
    got = {r.channel: r for r in
           events_shapley_attribution(spark, SF_SMALL).collect()}
    assert set(got) == {n for n, _ in SHAPLEY_CHANNELS}
    for name, b in SHAPLEY_CHANNELS:
        assert got[name].phi_x24 == phi24[b]
        assert got[name].phi == float(phi24[b]) / 24.0
        assert got[name].n_attributable == v(15)
    # efficiency axiom: the credits sum to the full coalition value
    assert sum(r.phi_x24 for r in got.values()) == 24 * v(15)


def test_peak_prominence_bruteforce(spark):
    from kmr_spark.plans.timeseries import (PEAK_NEIGHBORHOOD, PEAK_TOP,
                                            events_peak_prominence)
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"].select("ts").collect()
    hours = Counter()
    for r in ev:
        t = (r.ts.replace(minute=0, second=0, microsecond=0)
             - __import__("datetime").datetime(2024, 1, 1))
        hours[int(t.total_seconds() // 3600)] += 1
    peaks = []
    for t, x in hours.items():
        nbrs = []
        ok = True
        for k in range(1, PEAK_NEIGHBORHOOD + 1):
            for tt in (t - k, t + k):
                if tt not in hours or hours[tt] >= x:
                    ok = False
                nbrs.append(hours.get(tt, 0))
        if ok:
            peaks.append((t, x, max(nbrs)))
    want = sorted(peaks, key=lambda p: (-p[1], p[0]))[:PEAK_TOP]
    got = events_peak_prominence(spark, SF_SMALL).collect()
    assert [(r.t, r.x, r.base, r.prominence) for r in got] == \
        [(t, x, b, x - b) for t, x, b in want]
