"""Semantic tests for the round-5 eleventh-wave operators: the
zone-map pruning simulator vs a brute slice scan, and hierarchical
forecast reconciliation coherence.  (Value parity vs DuckDB is the
oracle gate's job; these pin the MATH.)
"""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def test_zonemap_bruteforce(spark):
    from kmr_spark.plans.layout import (ZONEMAP_GROUP_ROWS, ZONEMAP_PROBES,
                                        lineitem_zonemap_prune)
    from kmr_spark.session import load_tables

    rows = load_tables(spark, SF_SMALL)["lineitem"] \
        .select("l_orderkey", "l_linenumber",
                F.datediff(F.to_date("l_shipdate"),
                           F.lit("1992-01-01").cast("date")).alias("sday")) \
        .collect()
    recs = [(r.l_orderkey, r.l_linenumber, r.sday) for r in rows]
    want = {}
    for name, keyf in (("arrival", lambda r: (r[0], r[1])),
                       ("shipdate_sorted", lambda r: (r[2], r[0], r[1]))):
        ordered = [r[2] for r in sorted(recs, key=keyf)]
        groups = [ordered[i:i + ZONEMAP_GROUP_ROWS]
                  for i in range(0, len(ordered), ZONEMAP_GROUP_ROWS)]
        zones = [(min(g), max(g)) for g in groups]
        for probe, lo, hi in ZONEMAP_PROBES:
            scanned = sum(1 for zlo, zhi in zones
                          if zhi >= lo and zlo <= hi)
            want[(name, probe)] = (len(zones), scanned)
    got = lineitem_zonemap_prune(spark, SF_SMALL).collect()
    assert len(got) == len(want)
    for r in got:
        n, s = want[(r.layout, r.probe)]
        assert (r.n_groups, r.groups_scanned) == (n, s)
        assert r.scan_permille == (1000 * s) // n
    # the layout story itself: sorted layout never scans more groups
    by = {(r.layout, r.probe): r.groups_scanned for r in got}
    for probe, _, _ in ZONEMAP_PROBES:
        assert by[("shipdate_sorted", probe)] <= by[("arrival", probe)]


def test_forecast_reconciled_coherent(spark):
    from kmr_spark.plans.timeseries import (RECON_HORIZON,
                                            events_forecast_reconciled)
    from kmr_spark.session import load_tables

    got = events_forecast_reconciled(spark, SF_SMALL).collect()
    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("event_type", F.to_date("ts").alias("day")).collect()
    daily = Counter((r.event_type, r.day) for r in ev)
    dmax = max(d for _, d in daily)
    types = sorted({t for t, _ in daily})
    # base forecasts are the last observed week's values
    base = {}
    from datetime import timedelta
    for (t, d), x in daily.items():
        h = (d - (dmax - timedelta(days=7))).days
        if 1 <= h <= RECON_HORIZON:
            base[(h, t)] = x
    assert {(r.h, r.event_type) for r in got} == set(base)
    for r in got:
        assert r.base_fc == base[(r.h, r.event_type)]
    # coherence: per-h reconciled sums match the total forecast up to
    # one DIV truncation per type
    per_h = defaultdict(list)
    for r in got:
        per_h[r.h].append(r)
    for h, rs in per_h.items():
        total = sum(base[(h, t)] for t in types if (h, t) in base)
        s = sum(r.reconciled_milli for r in rs)
        assert 0 <= 1000 * total - s < len(rs)


def test_psi_drift_bruteforce(spark):
    import math

    from kmr_spark.plans.quality import (PSI_BIN_W, PSI_BINS, PSI_Q,
                                         PSI_SPLIT_DAY, events_psi_drift)
    from kmr_spark.session import load_tables

    from datetime import date
    ev = load_tables(spark, SF_SMALL)["events"] \
        .select("event_type", F.to_date("ts").alias("day"), "value") \
        .collect()
    epoch = date(2024, 1, 1)
    cnt = defaultdict(lambda: [0, 0])
    for r in ev:
        b = min(math.floor(r.value / PSI_BIN_W), PSI_BINS - 1)
        cur = (r.day - epoch).days >= PSI_SPLIT_DAY
        cnt[(r.event_type, b)][1 if cur else 0] += 1
    types = sorted({t for t, _ in cnt})
    got = {r.event_type: r for r in
           events_psi_drift(spark, SF_SMALL).collect()}
    assert sorted(got) == types
    for t in types:
        na = sum(v[0] for (tt, _), v in cnt.items() if tt == t)
        nb = sum(v[1] for (tt, _), v in cnt.items() if tt == t)
        s = used = degen = 0
        for (tt, _), (ca, cb) in cnt.items():
            if tt != t:
                continue
            if ca > 0 and cb > 0:
                used += 1
                s += (ca * nb - cb * na) * (
                    math.floor(math.log(ca * nb) * PSI_Q)
                    - math.floor(math.log(cb * na) * PSI_Q))
            else:
                degen += 1
        r = got[t]
        assert (r.na, r.nb, r.n_bins_used, r.n_bins_degenerate,
                r.psi_scaled) == (na, nb, used, degen, s)
        assert r.psi == float(s) / (float(PSI_Q) * float(na) * float(nb))
        assert r.psi >= 0.0  # PSI is a (scaled) symmetrized KL — nonneg


def test_record_linkage_truth(spark):
    from kmr_spark.plans.linkage import (LINK_BAND_LEN, LINK_MAX_DIST,
                                         customer_record_linkage)
    from kmr_spark.session import load_tables

    cust = load_tables(spark, SF_SMALL)["customer"] \
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment") \
        .collect()

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    def dirt(r):
        if r.c_custkey % 3 == 0:
            return r.c_name[:-2]
        if r.c_custkey % 3 == 1:
            return r.c_name[:-1] + "X"
        return r.c_name

    by_block = defaultdict(list)
    for r in cust:
        by_block[(r.c_nationkey, r.c_mktsegment,
                  r.c_name[:LINK_BAND_LEN])].append(r)
    n_cand = n_matched = n_tp = 0
    for r in cust:
        dn = dirt(r)
        # the corruption only touches the last 2 chars, so the dirty
        # record's band always equals its clean row's band
        assert dn[:LINK_BAND_LEN] == r.c_name[:LINK_BAND_LEN]
        cands = [(lev(dn, c.c_name), c.c_custkey)
                 for c in by_block[(r.c_nationkey, r.c_mktsegment,
                                    dn[:LINK_BAND_LEN])]]
        cands = [c for c in cands if c[0] <= LINK_MAX_DIST]
        n_cand += len(cands)
        if cands:
            n_matched += 1
            if min(cands)[1] == r.c_custkey:
                n_tp += 1
    row = customer_record_linkage(spark, SF_SMALL).collect()[0]
    assert (row.n_dirty, row.n_candidates, row.n_matched,
            row.n_true_pos) == (len(cust), n_cand, n_matched, n_tp)
    assert row.n_false_pos == n_matched - n_tp
    assert row.recall_permille == (1000 * n_tp) // len(cust)
    assert row.precision_permille == (1000 * n_tp) // n_matched
    # the matcher must actually work on this corruption model
    assert row.recall_permille >= 900


def test_record_linkage_blocking_is_data_scaled(spark):
    """The blocking key space must GROW with the customer table
    (VERDICT r7 §wrong-1: a fixed 125-key space makes candidate pairs
    quadratic in |customer|).  With the name-core band, distinct block
    count scales with data, so per-block size — and hence per-record
    candidate work — stays bounded."""
    from kmr_spark.plans.linkage import LINK_BAND_LEN
    from kmr_spark.session import load_tables

    def n_blocks(sf_dir):
        cust = load_tables(spark, sf_dir)["customer"]
        return (cust.select("c_nationkey", "c_mktsegment",
                            F.substring("c_name", 1, LINK_BAND_LEN))
                .distinct().count())

    small, big = n_blocks(SF_SMALL), n_blocks("/root/testdata/sf0.01")
    assert big > small, (small, big)
    # 10x the customers must mean >= ~5x the blocks (linear-ish growth,
    # generous slack for band-boundary rounding at toy scale)
    assert big >= 5 * small, (small, big)


def test_random_walks_deterministic_steps(spark):
    from kmr_spark.plans.generate import rmat_raw_edges
    from kmr_spark.plans.graphs import (WALK_STARTS, WALK_STEPS,
                                        graph_random_walks)

    edges = {(r.src, r.dst) for r in rmat_raw_edges(spark).collect()
             if r.src != r.dst}
    adj = defaultdict(list)
    odeg = Counter()
    for u, v in edges:
        adj[u].append(v)
        odeg[u] += 1
    starts = sorted(odeg, key=lambda n: (-odeg[n], n))[:WALK_STARTS]

    from kmr_spark.operators.sample import _A as A
    from kmr_spark.operators.sample import _P_MOD as P_MOD
    from kmr_spark.operators.sample import _P_PRE as P_PRE

    def h(k):
        return ((k % P_PRE + P_PRE) % P_PRE) * A % P_MOD

    want = []
    for s in starts:
        cur = s
        want.append((s, 0, s))
        for t in range(1, WALK_STEPS + 1):
            outs = adj.get(cur)
            if not outs:
                break
            cur = min(outs, key=lambda v: (
                h(((s * 1024 + cur) * 1024 + v) * 8 + t), v))
            want.append((s, t, cur))
    got = [(r.walk_id, r.step, r.node)
           for r in graph_random_walks(spark, SF_SMALL).collect()]
    assert got == sorted(want)
    # replayability: a second run is bit-identical
    got2 = [(r.walk_id, r.step, r.node)
            for r in graph_random_walks(spark, SF_SMALL).collect()]
    assert got2 == got


def test_xyz_brand_bruteforce(spark):
    import math

    from kmr_spark.plans.trends import parts_xyz_classification
    from kmr_spark.session import load_tables

    t = load_tables(spark, SF_SMALL)
    part = {r.p_partkey: r.p_brand for r in
            t["part"].select("p_partkey", "p_brand").collect()}
    li = t["lineitem"].select("l_partkey", "l_quantity",
                              F.to_date("l_shipdate").alias("d")).collect()
    from datetime import date
    epoch = date(1992, 1, 1)
    weekly = Counter()
    wks = set()
    for r in li:
        wk = (r.d - epoch).days // 7
        wks.add(wk)
        weekly[(part[r.l_partkey], wk)] += int(r.l_quantity)
    n_weeks = max(wks) - min(wks) + 1
    per = defaultdict(lambda: [0, 0, 0])  # s, qq, active
    for (b, _), q in weekly.items():
        per[b][0] += q
        per[b][1] += q * q
        per[b][2] += 1
    got = {r.p_brand: r for r in
           parts_xyz_classification(spark, SF_SMALL).collect()}
    assert sorted(got) == sorted(per)
    for b, (s, qq, act) in per.items():
        var_num = n_weeks * qq - s * s
        cls = "X" if 4 * var_num <= s * s else \
              "Y" if var_num <= s * s else "Z"
        r = got[b]
        assert (r.s, r.n_active_weeks, r.n_weeks, r.xyz_class) == \
            (s, act, n_weeks, cls)
        assert r.cv2_permille == (1000 * var_num) // (s * s)


def test_bpe_learn_merges_python(spark):
    from kmr_spark.llm_ops.lexical import (BPE_LEARN_ROUNDS,
                                           bpe_learn_merges)
    from kmr_spark.session import load_tables

    docs = load_tables(spark, SF_SMALL)["documents"] \
        .select("text").collect()
    vocab = Counter()
    for r in docs:
        for w in (r.text or "").split(" "):
            if w:
                vocab[w + "_"] += 1
    words = {" " + " ".join(w) + " ": c for w, c in vocab.items()}
    merged = Counter()
    for w, c in words.items():
        merged[w] += c
    words = merged
    got = bpe_learn_merges(spark, SF_SMALL).collect()
    assert len(got) == BPE_LEARN_ROUNDS
    for rnd in range(1, BPE_LEARN_ROUNDS + 1):
        pairs = Counter()
        for s, c in words.items():
            syms = s.strip().split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        (pa, pb), n = min(pairs.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        r = got[rnd - 1]
        assert (r.round, r.sym_a, r.sym_b, r.n) == (rnd, pa, pb, n)
        pat, rep = f" {pa} {pb} ", f" {pa}{pb} "
        nxt = Counter()
        for s, c in words.items():
            nxt[s.replace(pat, rep).replace(pat, rep)] += c
        words = nxt
