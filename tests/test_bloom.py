"""Bloom-filter semi-join reduction (operators/bloom.py)."""

import pytest
from pyspark.sql import functions as F

from kmr_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_might_contain,
)


def test_bloom_has_no_false_negatives(spark):
    """Every inserted key must test positive — the property that makes
    the bloom a safe pre-filter (dropping a true match would corrupt
    the join result, false positives only cost wasted probe work)."""
    keys = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k", 4096)
    missed = keys.filter(~bloom_might_contain(F.col("k"), bitmap)).count()
    assert missed == 0


def test_bloom_rejects_most_absent_keys(spark):
    """FP rate must be far below 1 for a sanely-sized bitmap: sized at
    ~5.7 bits/key with k=2 probes the expected rate is ~5%."""
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k", 8192)
    absent = spark.range(1000, 11000).select(F.col("id").alias("k"))
    fp = absent.filter(bloom_might_contain(F.col("k"), bitmap)).count()
    assert fp < 0.25 * 10000, f"FP rate too high: {fp}/10000"


def test_bloom_words_stay_in_32_bits(spark):
    """32-bit packing is the portability contract (DuckDB's signed <<
    differs from the JVM's at bit 63)."""
    keys = spark.range(0, 20000).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k", 1024)
    assert all(0 <= w < (1 << BITS_PER_WORD) for w in bitmap)


def test_bloom_build_validates_m_bits(spark):
    keys = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(keys, "k", 100)


def test_bloom_filter_is_pure_expression(spark):
    """The membership test must compile into the scan as a filter — no
    join, no exchange in the pruned side's plan."""
    keys = spark.range(100).select(F.col("id").alias("k"))
    bitmap = bloom_build(keys, "k", 1024)
    fact = spark.range(100000).select(F.col("id").alias("k"))
    plan = fact.filter(
        bloom_might_contain(F.col("k"), bitmap))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_prune_query_bounds(spark):
    from kmr_spark.plans.bloomjoin import lineitem_bloom_prune

    rows = lineitem_bloom_prune(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_exact <= r.n_bloom_pass
