"""Coverage for the remaining SURVEY §2 operators: for_some early
termination, skew leveling, matmul plan."""

from pyspark.sql import functions as F

from kmr_spark.kvs import KVS
from kmr_spark.plans import linalg
from tests.conftest import assert_matches_oracle


def test_matmul_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, linalg.QUERIES["linalg_matmul"],
                          linalg.ORACLE_SQL["linalg_matmul"])


def test_map_for_some(spark):
    kvs = KVS.from_pairs(spark, [(i, f"v{i}") for i in range(1000)],
                         "key long, value string")
    out = kvs.map_for_some(lambda k, v: [(k, v)] if k % 2 == 0 else [],
                           "key long, value string")
    rows = out.collect_pairs()
    assert len(rows) == 1 and rows[0][0] % 2 == 0


def test_reduce_for_some(spark):
    kvs = KVS.from_pairs(spark, [(i % 10, i) for i in range(100)],
                         "key long, value long")
    out = kvs.reduce_for_some(lambda k, vs: [(k, sum(vs))], "key long, value long")
    assert len(out.collect_pairs()) == 1


def test_shuffle_leveling_balances_skew(spark):
    # Zipf-ish skew: one hot key with 5000 rows, 50 cold keys with 10 each
    rows = [("hot", i) for i in range(5000)] + [
        (f"k{j}", i) for j in range(50) for i in range(10)]
    kvs = KVS.from_pairs(spark, rows, "key string, value long")
    # plain hash shuffle: the hot key's partition dwarfs the rest
    hashed = kvs.shuffle(8)
    from kmr_spark.operators.shuffle import local_element_counts

    h = local_element_counts(hashed.df)
    # leveling: range partitioning splits by volume (ties in one key may
    # still co-locate, but cold keys spread evenly instead of hashing
    # into the hot partition)
    leveled = kvs.shuffle_leveling(8)
    lv = local_element_counts(leveled.df)
    assert sum(lv) == sum(h) == 5500
    assert max(lv) <= max(h)  # no worse than hash partitioning on skew
