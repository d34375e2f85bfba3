"""Property-based KVS tests (hypothesis) — randomized inputs against
pure-Python oracles, beyond the reference's fixed-fixture strategy
(SURVEY.md §5.1 notes the reference has no property testing)."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kmr_spark.kvs import KVS

pairs_strategy = st.lists(
    st.tuples(st.integers(-1000, 1000), st.integers(-10**9, 10**9)),
    min_size=1, max_size=60,
)

SETTINGS = settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(pairs=pairs_strategy)
@SETTINGS
def test_map_matches_python(spark, pairs):
    kvs = KVS.from_pairs(spark, pairs, "key long, value long")
    out = kvs.map(lambda k, v: [(k + 1, v * 2)], "key long, value long")
    expect = sorted((k + 1, v * 2) for k, v in pairs)
    assert sorted(out.collect_pairs()) == expect


@given(pairs=pairs_strategy)
@SETTINGS
def test_reduce_sum_matches_counter(spark, pairs):
    kvs = KVS.from_pairs(spark, pairs, "key long, value long")
    out = kvs.reduce_expr(F.sum("value").alias("value"))
    expect = Counter()
    for k, v in pairs:
        expect[k] += v
    assert dict(out.collect_pairs()) == dict(expect)


@given(pairs=pairs_strategy)
@SETTINGS
def test_sort_is_sorted_multiset(spark, pairs):
    kvs = KVS.from_pairs(spark, pairs, "key long, value long")
    got = kvs.sort().collect_pairs()
    assert [k for k, _ in got] == sorted(k for k, _ in pairs)
    assert Counter(got) == Counter(pairs)


@given(pairs=pairs_strategy)
@SETTINGS
def test_pairing_roundtrip(spark, pairs):
    kvs = KVS.from_pairs(spark, pairs, "key long, value long")
    back = kvs.pairing().unpairing()
    assert Counter(back.collect_pairs()) == Counter(pairs)


@given(pairs=pairs_strategy, n=st.integers(1, 8))
@SETTINGS
def test_shuffle_distribute_preserve_multiset(spark, pairs, n):
    kvs = KVS.from_pairs(spark, pairs, "key long, value long")
    assert Counter(kvs.shuffle(n).collect_pairs()) == Counter(pairs)
    assert Counter(kvs.distribute(n).collect_pairs()) == Counter(pairs)
