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


texts_strategy = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40),
    min_size=1, max_size=10,
)


@given(texts=texts_strategy)
@SETTINGS
def test_twin_hash_generators_agree(spark, texts):
    """The Spark and DuckDB sides of the hashing twin generators must
    produce identical token/shingle/minhash values on arbitrary ASCII —
    the invariant every dedup oracle rests on."""
    import duckdb
    from pyspark.sql import functions as F

    from kmr_spark.functions import hashing as H

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    th = H.token_hashes_col(H.tokens_col("text"))
    out = df.select("doc_id", th.alias("th")).select(
        "doc_id", "th", H.shingle_hashes_col(F.col("th")).alias("sh")
    ).orderBy("doc_id").collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", [(i, t) for i, t in enumerate(texts)])
    sql = (
        f"WITH a AS (SELECT doc_id, {H.sql_token_hashes(H.sql_tokens('text'))} AS th FROM d) "
        f"SELECT doc_id, th, {H.sql_shingle_hashes('th')} AS sh FROM a ORDER BY doc_id"
    )
    drows = con.execute(sql).fetchall()
    con.close()
    for s, dd in zip(out, drows):
        assert (s["doc_id"], s["th"], s["sh"]) == tuple(dd)
