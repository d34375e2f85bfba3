"""Salted joins / counts, approximate sketches, checkpoint."""

from pyspark.sql import functions as F

from kmr_spark.kvs import KVS
from kmr_spark.operators.skew import (
    approx_distinct, approx_quantiles, salted_count, salted_join)


def _skewed(spark):
    rows = [("hot", i) for i in range(20000)] + [
        (f"k{j}", i) for j in range(100) for i in range(5)]
    return spark.createDataFrame(rows, "key string, value long")


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{j}", float(j)) for j in range(100)],
        "key string, weight double")
    plain = sorted(map(tuple, big.join(small, "key").collect()))
    salted = sorted(map(tuple, salted_join(big, small, "key").collect()))
    assert salted == plain


def test_salted_count_matches_plain(spark):
    big = _skewed(spark)
    plain = {r["key"]: r["count"] for r in big.groupBy("key").count().collect()}
    salted = {r["key"]: r["count"] for r in salted_count(big, "key").collect()}
    assert salted == plain


def test_approx_distinct_within_rsd(spark):
    df = spark.range(100000).select((F.col("id") % 5000).alias("v"))
    est = approx_distinct(df, "v").collect()[0]["approx_distinct"]
    assert abs(est - 5000) / 5000 < 0.15


def test_approx_quantiles_sane(spark):
    df = spark.range(10001).select(F.col("id").cast("double").alias("v"))
    q = approx_quantiles(df, "v", [0.0, 0.5, 1.0])
    assert q[0] == 0.0 and q[2] == 10000.0 and abs(q[1] - 5000) < 200


def test_checkpoint_truncates_lineage(spark):
    kvs = KVS.from_pairs(spark, [(i, i) for i in range(100)], "key long, value long")
    long_lineage = kvs
    for _ in range(5):
        long_lineage = long_lineage.map_expr(F.col("key") + 1, F.col("value"))
    ck = long_lineage.checkpoint()
    assert "LogicalRDD" in ck.df._jdf.queryExecution().logical().toString()
    assert sorted(k for k, _ in ck.collect_pairs()) == list(range(5, 105))


def test_salt_is_deterministic_across_recompute(spark):
    """The salt must be a pure function of row content: recomputing the
    DataFrame (fresh plan, different partitioning) yields identical
    salts, so a task retry can never re-salt a row mid-join."""
    from kmr_spark.operators.skew import _salt

    big = _skewed(spark)
    a = sorted(map(tuple, big.withColumn(
        "s", _salt(big.columns, 8)).collect()))
    redistributed = big.repartition(7)
    b = sorted(map(tuple, redistributed.withColumn(
        "s", _salt(redistributed.columns, 8)).collect()))
    assert a == b
    assert all(0 <= r[2] < 8 for r in a)


def test_salted_join_rejects_outer_how(spark):
    import pytest as _pytest

    big = _skewed(spark)
    small = spark.createDataFrame([("hot", 1.0)], "key string, weight double")
    with _pytest.raises(ValueError):
        salted_join(big, small, "key", how="full_outer")
    left = sorted(map(tuple, salted_join(big, small, "key", how="left").collect()))
    plain = sorted(map(tuple, big.join(small, "key", "left").collect()))
    assert left == plain
