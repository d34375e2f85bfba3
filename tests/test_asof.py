"""as-of join operator edge cases (unit level; query-level parity is
covered by events_asof_view in tests/test_plans.py)."""

from kmr_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_prior_match(spark):
    left = _mk(spark, [(1, 100, "L1"), (1, 200, "L2")], "k int, t long, lv string")
    right = _mk(spark, [(1, 50, "R1"), (1, 150, "R2")], "k int, t long, rv string")
    out = {r["lv"]: r["asof_rv"] for r in
           asof_join(left, right, on="t", by="k", right_cols=["rv"]).collect()}
    assert out == {"L1": "R1", "L2": "R2"}


def test_asof_no_prior_gives_null(spark):
    left = _mk(spark, [(1, 10, "early")], "k int, t long, lv string")
    right = _mk(spark, [(1, 50, "late")], "k int, t long, rv string")
    rows = asof_join(left, right, on="t", by="k", right_cols=["rv"]).collect()
    assert rows[0]["asof_rv"] is None


def test_asof_simultaneous_matches(spark):
    left = _mk(spark, [(1, 100, "L")], "k int, t long, lv string")
    right = _mk(spark, [(1, 100, "R")], "k int, t long, rv string")
    rows = asof_join(left, right, on="t", by="k", right_cols=["rv"]).collect()
    assert rows[0]["asof_rv"] == "R"  # ts' <= ts includes equality


def test_asof_respects_by_groups(spark):
    left = _mk(spark, [(1, 100, "L1"), (2, 100, "L2")], "k int, t long, lv string")
    right = _mk(spark, [(1, 50, "R1")], "k int, t long, rv string")
    out = {r["lv"]: r["asof_rv"] for r in
           asof_join(left, right, on="t", by="k", right_cols=["rv"]).collect()}
    assert out == {"L1": "R1", "L2": None}  # no cross-group leakage


def test_asof_latest_of_many(spark):
    left = _mk(spark, [(1, 1000, "L")], "k int, t long, lv string")
    right = _mk(spark, [(1, t, f"R{t}") for t in (10, 500, 999, 1001)],
                "k int, t long, rv string")
    rows = asof_join(left, right, on="t", by="k", right_cols=["rv"]).collect()
    assert rows[0]["asof_rv"] == "R999"  # latest prior, later rows ignored


def test_asof_simultaneous_right_ties_deterministic(spark):
    """Several right rows at the identical (by, on): the largest
    right_order value must win, every run."""
    left = _mk(spark, [(1, 100, "L")], "k int, t long, lv string")
    right = _mk(spark, [(1, 100, 7, "a"), (1, 100, 9, "b"), (1, 100, 8, "c")],
                "k int, t long, rid long, rv string")
    for _ in range(3):
        rows = asof_join(left, right, on="t", by="k",
                         right_cols=["rv", "rid"], right_order="rid").collect()
        assert rows[0]["asof_rv"] == "b" and rows[0]["asof_rid"] == 9


def test_asof_left_key_spine_matches_inline(spark):
    """The pruned-spine form (payload re-attached by left_key join) must
    return exactly what the payload-through-window form returns."""
    left = _mk(spark, [(i, 1, 100 + 10 * i, f"L{i}") for i in range(20)],
               "lid long, k int, t long, payload string")
    right = _mk(spark, [(1, t, f"R{t}") for t in (95, 105, 155, 250)],
                "k int, t long, rv string")
    inline = sorted(map(tuple, asof_join(
        left, right, on="t", by="k", right_cols=["rv"]).collect()))
    spine = sorted(map(tuple, asof_join(
        left, right, on="t", by="k", right_cols=["rv"], left_key="lid").collect()))
    assert spine == inline


def test_asof_forward_basic_next_match(spark):
    left = _mk(spark, [(1, 100, "L1"), (1, 200, "L2")], "k int, t long, lv string")
    right = _mk(spark, [(1, 150, "R1"), (1, 250, "R2")], "k int, t long, rv string")
    out = {r["lv"]: r["asof_rv"] for r in
           asof_join(left, right, on="t", by="k", right_cols=["rv"],
                     direction="forward").collect()}
    assert out == {"L1": "R1", "L2": "R2"}  # earliest at-or-after


def test_asof_forward_no_later_gives_null(spark):
    left = _mk(spark, [(1, 100, "late")], "k int, t long, lv string")
    right = _mk(spark, [(1, 50, "early")], "k int, t long, rv string")
    rows = asof_join(left, right, on="t", by="k", right_cols=["rv"],
                     direction="forward").collect()
    assert rows[0]["asof_rv"] is None


def test_asof_forward_simultaneous_matches(spark):
    left = _mk(spark, [(1, 100, "L")], "k int, t long, lv string")
    right = _mk(spark, [(1, 100, "R")], "k int, t long, rv string")
    rows = asof_join(left, right, on="t", by="k", right_cols=["rv"],
                     direction="forward").collect()
    assert rows[0]["asof_rv"] == "R"  # ts' >= ts includes equality


def test_asof_forward_earliest_of_many(spark):
    left = _mk(spark, [(1, 1000, "L")], "k int, t long, lv string")
    right = _mk(spark, [(1, t, f"R{t}") for t in (999, 1001, 1500, 2000)],
                "k int, t long, rv string")
    rows = asof_join(left, right, on="t", by="k", right_cols=["rv"],
                     direction="forward").collect()
    assert rows[0]["asof_rv"] == "R1001"  # earliest later, prior ignored


def test_asof_forward_simultaneous_right_ties_deterministic(spark):
    """Forward ties resolve to the SMALLEST right_order value."""
    left = _mk(spark, [(1, 100, "L")], "k int, t long, lv string")
    right = _mk(spark, [(1, 100, 9, "a"), (1, 100, 7, "b"), (1, 100, 8, "c")],
                "k int, t long, rid long, rv string")
    for _ in range(3):
        rows = asof_join(left, right, on="t", by="k",
                         right_cols=["rv", "rid"], right_order="rid",
                         direction="forward").collect()
        assert rows[0]["asof_rv"] == "b" and rows[0]["asof_rid"] == 7


def test_asof_bad_direction_raises(spark):
    left = _mk(spark, [(1, 1, "x")], "k int, t long, lv string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, left, on="t", by="k", right_cols=["lv"],
                  direction="nearest")
