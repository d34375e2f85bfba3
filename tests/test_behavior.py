"""Behavior-modeling plans (plans/behavior.py): SCD2 state history,
Markov transitions, A/B z-test — oracle parity plus the semantic
invariants the oracle cannot see (interval chaining, row-stochastic
probabilities, arm symmetry)."""

from __future__ import annotations

from collections import defaultdict

from conftest import SF_DIR, assert_matches_oracle

from kmr_spark.plans.behavior import (
    AB_TEST_SQL,
    MARKOV_SQL,
    SCD2_SQL,
    events_ab_test,
    events_markov_transitions,
    events_scd2_state,
)


def test_scd2_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, events_scd2_state, SCD2_SQL)


def test_markov_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, events_markov_transitions, MARKOV_SQL)


def test_ab_test_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, events_ab_test, AB_TEST_SQL)


def test_scd2_intervals_chain_per_user(spark):
    """Per user: intervals tile the timeline (each valid_to equals the
    next valid_from), exactly one open current row, no zero-length or
    same-state adjacent runs."""
    rows = events_scd2_state(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user
    for user, spans in by_user.items():
        assert sum(1 for s in spans if s.is_current) == 1
        assert spans[-1].is_current and spans[-1].valid_to is None
        for a, b in zip(spans, spans[1:]):
            assert a.valid_to == b.valid_from, user
            assert a.state != b.state, "adjacent runs must differ in state"


def test_markov_rows_are_stochastic(spark):
    probs = defaultdict(float)
    for r in events_markov_transitions(spark, SF_DIR).collect():
        assert r.n_trans > 0 and 0.0 < r.prob <= 1.0
        probs[r.event_type] += r.prob
    assert probs
    for t, total in probs.items():
        assert abs(total - 1.0) < 1e-9, (t, total)


def test_ab_test_arm_counts_cover_all_events(spark):
    from kmr_spark.session import load_tables

    rows = events_ab_test(spark, SF_DIR).collect()
    total = sum(r.n_a + r.n_b for r in rows)
    n_events = load_tables(spark, SF_DIR)["events"].count()
    assert total == n_events
    for r in rows:
        assert r.significant == (abs(r.z) > 1.96)


def test_ab_sequential_matches_oracle(spark, duck):
    from kmr_spark.plans.behavior import (AB_SEQUENTIAL_SQL,
                                          events_ab_test_sequential)

    assert_matches_oracle(spark, duck, events_ab_test_sequential,
                          AB_SEQUENTIAL_SQL)


def test_ab_sequential_final_day_equals_terminal_test(spark):
    """The curve's last day per type must reproduce the terminal
    events_ab_test z exactly (same moments, same expression)."""
    from kmr_spark.plans.behavior import (events_ab_test,
                                          events_ab_test_sequential)

    terminal = {r.event_type: (r.n_a, r.n_b, r.z)
                for r in events_ab_test(spark, SF_DIR).collect()}
    curve = events_ab_test_sequential(spark, SF_DIR).collect()
    last = {}
    for r in curve:
        last[r.event_type] = (r.n_a, r.n_b, r.z)  # ordered by day
    assert last == terminal
