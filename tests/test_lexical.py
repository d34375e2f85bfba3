"""Lexical corpus stats + PII redaction (llm_ops/lexical.py), the
join-key skew report (plans/diagnostics.py), time-weighted averages
and path trigrams."""

from __future__ import annotations

import math

from conftest import SF_DIR, assert_matches_oracle

from kmr_spark.llm_ops.lexical import (
    PII_REDACT_SQL,
    PMI_SQL,
    TOKEN_ENTROPY_SQL,
    text_pii_redact,
    text_pmi_pairs,
    text_token_entropy,
)
from kmr_spark.plans.behavior import PATH_TRIGRAMS_SQL, events_path_trigrams
from kmr_spark.plans.diagnostics import SKEW_REPORT_SQL, skew_report_orders
from kmr_spark.plans.timeseries import TWA_SQL, events_time_weighted_avg


def test_entropy_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, text_token_entropy, TOKEN_ENTROPY_SQL)


def test_pmi_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, text_pmi_pairs, PMI_SQL)


def test_pii_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, text_pii_redact, PII_REDACT_SQL)


def test_skew_report_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, skew_report_orders, SKEW_REPORT_SQL)


def test_twa_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, events_time_weighted_avg, TWA_SQL)


def test_path_trigrams_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, events_path_trigrams,
                          PATH_TRIGRAMS_SQL)


def test_entropy_bounds(spark):
    """0 <= H <= ln(vocab); norm in (0, 1]."""
    for r in text_token_entropy(spark, SF_DIR).collect():
        assert 0.0 <= r.entropy <= math.log(r.vocab_size) + 1e-9
        assert 0.0 < r.norm_entropy <= 1.0 + 1e-9


def test_pii_redaction_counts_and_shape(spark):
    """Docs seeded with PII get exactly the expected counts; the
    redacted text never contains a raw seeded email/phone."""
    rows = text_pii_redact(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_emails == (1 if r.doc_id % 3 == 0 else 0)
        assert r.n_phones == (1 if r.doc_id % 5 == 0 else 0)


def test_skew_report_gini_in_range(spark):
    r = skew_report_orders(spark, SF_DIR).first()
    assert 0.0 <= r.gini < 1.0
    assert r.max_cnt >= r.avg_cnt
    assert abs(r.top1_share - r.max_cnt / r.n_rows) < 1e-12


def test_twa_shape_and_bounds(spark):
    """Every row spans positive time with >= 1 gap, and the TWA sits
    inside the user's [min, max] cent range (a weighted mean must)."""
    from pyspark.sql import functions as F

    from kmr_spark.session import load_tables

    rows = {r.user_id: r
            for r in events_time_weighted_avg(spark, SF_DIR).collect()}
    assert rows
    bounds = {
        r.user_id: r
        for r in load_tables(spark, SF_DIR)["events"]
        .groupBy("user_id")
        .agg(F.min(F.floor(F.col("value") * 100)).alias("lo"),
             F.max(F.floor(F.col("value") * 100)).alias("hi"))
        .collect()
    }
    for uid, r in rows.items():
        assert r.span_us > 0 and r.n_gaps >= 1
        b = bounds[uid]
        assert b.lo - 1e-9 <= r.twa_cents <= b.hi + 1e-9


def test_join_size_estimate_matches_oracle(spark, duck):
    from kmr_spark.plans.diagnostics import JOIN_SIZE_SQL, join_size_estimate

    assert_matches_oracle(spark, duck, join_size_estimate, JOIN_SIZE_SQL)


def test_join_size_estimate_equals_actual_join(spark):
    """The prediction must equal the REAL join cardinality (it is an
    exact identity when computed from full count tables)."""
    from kmr_spark.plans.diagnostics import join_size_estimate
    from kmr_spark.session import load_tables

    t = load_tables(spark, SF_DIR)
    est = {r.join_name: r.est_rows
           for r in join_size_estimate(spark, SF_DIR).collect()}
    assert est["orders_lineitem"] == t["orders"].join(
        t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey
    ).count()
    assert est["customer_orders"] == t["customer"].join(
        t["orders"], t["customer"].c_custkey == t["orders"].o_custkey
    ).count()


def test_multitouch_matches_oracle(spark, duck):
    from kmr_spark.plans.behavior import (MULTITOUCH_SQL,
                                          events_multitouch_attribution)

    assert_matches_oracle(spark, duck, events_multitouch_attribution,
                          MULTITOUCH_SQL)


def test_multitouch_weights_consistent(spark):
    from kmr_spark.plans.behavior import events_multitouch_attribution

    rows = events_multitouch_attribution(spark, SF_DIR).collect()
    assert rows and any(r.n_touches > 0 for r in rows)
    for r in rows:
        if r.n_touches == 0:
            assert r.w_per_touch is None and r.first_lag_s is None
        else:
            assert abs(r.w_per_touch * r.n_touches - 1.0) < 1e-12
            assert 0 <= r.last_lag_s <= r.first_lag_s < 3600


def test_bpe_candidates_match_oracle(spark, duck):
    from kmr_spark.llm_ops.lexical import BPE_SQL, bpe_merge_candidates

    assert_matches_oracle(spark, duck, bpe_merge_candidates, BPE_SQL)


def test_bpe_candidates_hand_corpus(spark):
    """On 'low low lower' the classic first merges dominate: 'lo' and
    'ow' appear in all 3 words; 'w_' only closes 'low' (count 2)."""
    from pyspark.sql import functions as F

    from kmr_spark.operators.sort import top_k

    docs = spark.createDataFrame([(1, "low low lower")], ["doc_id", "text"])
    words = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        .select(F.concat(F.col("w"), F.lit("_")).alias("w"), "c"))
    pairs = words.select(
        "c",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)))).alias("pair"))
    counts = {r.pair: r.n for r in
              pairs.groupBy("pair").agg(F.sum("c").alias("n")).collect()}
    assert counts["lo"] == 3 and counts["ow"] == 3
    assert counts["w_"] == 2 and counts["er"] == 1


def test_seasonal_baseline_matches_oracle(spark, duck):
    from kmr_spark.plans.timeseries import (SEASONAL_BASELINE_SQL,
                                            events_seasonal_baseline)

    assert_matches_oracle(spark, duck, events_seasonal_baseline,
                          SEASONAL_BASELINE_SQL)


def test_seasonal_baseline_prediction_is_slot_mean(spark):
    """predicted == mean of that slot's hourly counts; MAE >= 0 and 0
    only when the slot is perfectly flat."""
    from pyspark.sql import functions as F

    from kmr_spark.plans.timeseries import events_seasonal_baseline
    from kmr_spark.session import load_tables

    rows = events_seasonal_baseline(spark, SF_DIR).collect()
    assert rows
    hourly = (
        load_tables(spark, SF_DIR)["events"]
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .select("event_type", F.hour("h").alias("hod"), "n").collect())
    from collections import defaultdict

    slots = defaultdict(list)
    for r in hourly:
        slots[(r.event_type, r.hod)].append(r.n)
    for r in rows:
        ns = slots[(r.event_type, r.hod)]
        assert r.n_hours == len(ns)
        assert abs(r.predicted - sum(ns) / len(ns)) < 1e-9
        assert r.mae >= 0
        if len(set(ns)) == 1:
            assert r.mae == 0.0


def test_valuation_trio_matches_oracle(spark, duck):
    from kmr_spark.plans.valuation import (
        DECAYED_VALUE_SQL, PARETO_SQL, SPEARMAN_SQL, events_decayed_value,
        orders_pareto_share, users_spearman_freq_value)

    assert_matches_oracle(spark, duck, events_decayed_value,
                          DECAYED_VALUE_SQL)
    assert_matches_oracle(spark, duck, orders_pareto_share, PARETO_SQL)
    assert_matches_oracle(spark, duck, users_spearman_freq_value,
                          SPEARMAN_SQL)


def test_pareto_shares_monotone_to_one(spark):
    from kmr_spark.plans.valuation import orders_pareto_share

    rows = orders_pareto_share(spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(10))
    shares = [r.cum_share for r in rows]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-12
    # revenue-sorted deciles: later deciles never out-earn earlier ones
    revs = [r.decile_rev_cents for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))


def test_decayed_value_bounded_by_raw_total(spark):
    """Decay only shrinks: decayed_cents <= raw cents total per user,
    with equality only if all value sits at the reference instant."""
    from pyspark.sql import functions as F

    from kmr_spark.plans.valuation import events_decayed_value
    from kmr_spark.session import load_tables

    decayed = {r.user_id: r.decayed_cents
               for r in events_decayed_value(spark, SF_DIR).collect()}
    raw = {r.user_id: r.tot for r in
           load_tables(spark, SF_DIR)["events"].groupBy("user_id")
           .agg(F.sum(F.floor(F.col("value") * 100)).alias("tot")).collect()}
    assert decayed and set(decayed) == set(raw)
    for u, d in decayed.items():
        assert d <= raw[u] + 1e-9


def test_spearman_rho_in_range(spark):
    from kmr_spark.plans.valuation import users_spearman_freq_value

    r = users_spearman_freq_value(spark, SF_DIR).first()
    assert -1.0 <= r.rho <= 1.0
    assert r.sum_d2 >= 0 and r.n_users > 0


def test_cusum_matches_oracle(spark, duck):
    from kmr_spark.plans.timeseries import CUSUM_SQL, events_cusum_drift

    assert_matches_oracle(spark, duck, events_cusum_drift, CUSUM_SQL)


def test_cusum_equals_recursive_definition(spark):
    """The window rewrite (prefix sum minus running min) must equal the
    textbook recursion S_t = max(0, S_{t-1} + (n*x_t - total)) per
    type, computed in Python over the same hour order."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kmr_spark.plans.timeseries import events_cusum_drift
    from kmr_spark.session import load_tables

    got = defaultdict(list)
    for r in events_cusum_drift(spark, SF_DIR).collect():
        got[r.event_type].append((r.hour_ts, r.x, r.cusum_scaled))

    hourly = defaultdict(list)
    for r in (load_tables(spark, SF_DIR)["events"]
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count("*").alias("x")).collect()):
        hourly[r.event_type].append((r.h, r.x))
    for t, seq in hourly.items():
        seq.sort()
        n, tot = len(seq), sum(x for _, x in seq)
        s, expect = 0, []
        for _, x in seq:
            s = max(0, s + (n * x - tot))
            expect.append(s)
        assert [c for _, _, c in got[t]] == expect, t
        assert all(c >= 0 for _, _, c in got[t])
