"""Semantic tests for the round-5 fourteenth-wave operators: SRM
chi-square vs direct counts, factorial interaction vs cell means, and
Wilson intervals vs the closed form.  (Value parity vs DuckDB is the
oracle gate's job; these pin the MATH.)
"""

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def test_srm_check_counts(spark):
    from kmr_spark.plans.inference import (SRM_CHI2_CRIT_MILLI,
                                           events_ab_srm_check)
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("event_type", "user_id").collect()
    per = defaultdict(set)
    allu = set()
    for r in ev:
        per[r.event_type].add(r.user_id)
        allu.add(r.user_id)
    per["__all__"] = allu
    got = {r.event_type: r for r in
           events_ab_srm_check(spark, SF_SMALL).collect()}
    assert set(got) == set(per)
    for t, users in per.items():
        na = sum(1 for u in users if u % 2 == 0)
        nb = len(users) - na
        chi = (1000 * (na - nb) * (na - nb)) // (na + nb)
        r = got[t]
        assert (r.na, r.nb, r.chi2_milli) == (na, nb, chi)
        assert r.srm_flag == (chi > SRM_CHI2_CRIT_MILLI)
    # the deterministic %2 split must NOT trip SRM on healthy data
    assert not got["__all__"].srm_flag


def test_factorial_interaction_cells(spark):
    from kmr_spark.plans.inference import events_factorial_interaction
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("user_id", "value").collect()
    cells = defaultdict(lambda: [0, 0])
    for r in ev:
        a, b = r.user_id % 2, (r.user_id // 2) % 2
        c = cells[(a, b)]
        c[0] += math.floor(r.value * 100)
        c[1] += 1
    m = {k: v[0] / v[1] for k, v in cells.items()}
    row = events_factorial_interaction(spark, SF_SMALL).collect()[0]
    assert (row.n00, row.n01, row.n10, row.n11) == (
        cells[(0, 0)][1], cells[(0, 1)][1],
        cells[(1, 0)][1], cells[(1, 1)][1])
    assert row.mean00 == m[(0, 0)] and row.mean11 == m[(1, 1)]
    assert row.interaction == \
        (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    assert row.effect_a == \
        (m[(1, 0)] + m[(1, 1)]) / 2.0 - (m[(0, 0)] + m[(0, 1)]) / 2.0


def test_wilson_interval_closed_form(spark):
    from kmr_spark.plans.trends import WILSON_Z, lineitem_returns_wilson
    from kmr_spark.session import load_tables

    t = load_tables(spark, SF_SMALL)
    brand = {r.p_partkey: r.p_brand for r in
             t["part"].select("p_partkey", "p_brand").collect()}
    cnt = Counter()
    ret = Counter()
    for r in t["lineitem"].select("l_partkey", "l_returnflag").collect():
        b = brand[r.l_partkey]
        cnt[b] += 1
        if r.l_returnflag == "R":
            ret[b] += 1
    got = {r.p_brand: r for r in
           lineitem_returns_wilson(spark, SF_SMALL).collect()}
    assert set(got) == set(cnt)
    z2 = WILSON_Z * WILSON_Z
    for b in cnt:
        n, r_ = float(cnt[b]), float(ret[b])
        center = (r_ + z2 / 2.0) / (n + z2)
        half = (WILSON_Z * math.sqrt(r_ * (n - r_) / n + z2 / 4.0)
                / (n + z2))
        row = got[b]
        assert (row.n, row.r) == (cnt[b], ret[b])
        assert row.rate_permille == (1000 * ret[b]) // cnt[b]
        assert row.wilson_lo == center - half
        assert row.wilson_hi == center + half
        # interval sanity: contains the point rate, inside [0, 1]
        assert 0.0 <= row.wilson_lo <= ret[b] / cnt[b] <= row.wilson_hi <= 1.0


def test_dormancy_reactivation_bruteforce(spark):
    from kmr_spark.plans.trends import (DORMANT_DAYS,
                                        orders_dormancy_reactivation)
    from kmr_spark.session import load_tables

    rows = load_tables(spark, SF_SMALL)["orders"] \
        .select("o_custkey", F.to_date("o_orderdate").alias("d")).collect()
    per = defaultdict(list)
    for r in rows:
        per[r.o_custkey].append(r.d)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # orders, first, react, cont
    for ds in per.values():
        prev = None
        for d in sorted(ds):
            m = d.strftime("%Y-%m")
            a = agg[m]
            a[0] += 1
            if prev is None:
                a[1] += 1
            elif (d - prev).days >= DORMANT_DAYS:
                a[2] += 1
            else:
                a[3] += 1
            prev = d
    got = orders_dormancy_reactivation(spark, SF_SMALL).collect()
    assert [r.month for r in got] == sorted(agg)
    for r in got:
        n, f, re_, c = agg[r.month]
        assert (r.n_orders, r.n_first, r.n_reactivated,
                r.n_continuing) == (n, f, re_, c)
        assert r.reactivation_permille == (1000 * re_) // n


def test_mde_curve_closed_form(spark):
    from kmr_spark.plans.inference import (MDE_ARM_SIZES, Z_ALPHA, Z_BETA,
                                           events_mde_curve)
    from kmr_spark.session import load_tables

    vals = [math.floor(r.value * 100) for r in
            load_tables(spark, SF_SMALL)["events"]
            .filter("event_type = 'purchase'").select("value").collect()]
    n, s, q = len(vals), sum(vals), sum(v * v for v in vals)
    var = (float(n) * float(q) - float(s) * float(s)) \
        / (float(n) * (float(n) - 1.0))
    mean = float(s) / float(n)
    got = {r.n_per_arm: r for r in events_mde_curve(spark, SF_SMALL).collect()}
    assert sorted(got) == sorted(MDE_ARM_SIZES)
    prev = float("inf")
    for arm in MDE_ARM_SIZES:
        r = got[arm]
        assert r.n_obs == n
        want = (Z_ALPHA + Z_BETA) * math.sqrt(2.0 * var / float(arm)) / mean
        assert r.mde_fraction == want
        assert r.mde_fraction < prev  # more users -> smaller MDE
        prev = r.mde_fraction


def test_attrib_window_sweep_bruteforce(spark):
    from kmr_spark.plans.trends import (ATTRIB_WINDOWS_S,
                                        events_attrib_window_sweep)
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("user_id", "event_type", F.unix_micros("ts").alias("us")) \
        .collect()
    clicks = defaultdict(list)
    for r in ev:
        if r.event_type == "click":
            clicks[r.user_id].append(r.us)
    gaps = []
    for r in ev:
        if r.event_type == "purchase":
            prior = [c for c in clicks.get(r.user_id, []) if c <= r.us]
            gaps.append(r.us - max(prior) if prior else None)
    got = {r.window_s: r for r in
           events_attrib_window_sweep(spark, SF_SMALL).collect()}
    assert sorted(got) == sorted(ATTRIB_WINDOWS_S)
    prev = -1
    for w in ATTRIB_WINDOWS_S:
        n_attr = sum(1 for g in gaps if g is not None
                     and g <= w * 1_000_000)
        r = got[w]
        assert (r.n_purchases, r.n_attributed) == (len(gaps), n_attr)
        assert r.attributed_permille == (1000 * n_attr) // len(gaps)
        assert r.n_attributed >= prev  # monotone in window length
        prev = r.n_attributed


def test_ratio_metric_delta_reference(spark):
    from kmr_spark.plans.inference import events_ratio_metric_delta
    from kmr_spark.session import load_tables

    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("user_id", "value").collect()
    per = defaultdict(lambda: [0, 0])
    for r in ev:
        u = per[r.user_id]
        u[0] += math.floor(r.value * 100)
        u[1] += 1
    arms = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n,sx,sy,sxx,syy,sxy
    for uid, (x, y) in per.items():
        a = arms[uid % 2]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += y * y
        a[5] += x * y
    got = {r.arm: r for r in
           events_ratio_metric_delta(spark, SF_SMALL).collect()}
    assert sorted(got) == [-1, 0, 1]
    ses = {}
    for arm in (0, 1):
        n, sx, sy, sxx, syy, sxy = arms[arm]
        nf = float(n)
        mx, my = float(sx) / nf, float(sy) / nf
        vx = (float(sxx) - nf * mx * mx) / (nf - 1.0)
        vy = (float(syy) - nf * my * my) / (nf - 1.0)
        cxy = (float(sxy) - nf * mx * my) / (nf - 1.0)
        ratio = float(sx) / float(sy)
        se = math.sqrt(
            (vx - 2.0 * ratio * cxy + ratio * ratio * vy) / nf) / my
        ses[arm] = (ratio, se)
        r = got[arm]
        assert (r.n_users, r.sx, r.sy) == (n, sx, sy)
        assert r.ratio_cents == ratio and r.se == se
    d = got[-1]
    assert d.ratio_cents == ses[1][0] - ses[0][0]
    assert d.se == math.sqrt(ses[0][1] ** 2 + ses[1][1] ** 2)
