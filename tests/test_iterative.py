"""PageRank / k-means iterative plans vs DuckDB oracle at sf0.01."""

import pytest

from kmr_spark.plans import iterative
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(iterative.QUERIES))
def test_iterative_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, iterative.QUERIES[name], iterative.ORACLE_SQL[name])


def test_pagerank_mass_reasonable(spark):
    ranks = iterative.pagerank(spark, "/root/testdata/sf0.001")
    rows = ranks.collect()
    total = sum(r["rank"] for r in rows)
    n = len(rows)
    # fixed-point PageRank conserves ~total mass (floor-division leaks <1%)
    assert 0.9 * n * iterative.PR_SCALE < total <= n * iterative.PR_SCALE


def test_kmeans_clusters_nontrivial(spark):
    out = iterative.kmeans(spark, "/root/testdata/sf0.001")
    counts = {r["cluster"]: 1 for r in out.collect()}
    assert len(counts) > 1  # more than one cluster used


def test_pagerank_many_iterations_no_cache_leak(spark):
    """20+ rounds must not accumulate cached state: superseded rank
    snapshots are unpersisted and the edge caches dropped on return.
    (Checkpoint RDDs from the periodic lineage cut are reclaimed by the
    context cleaner; the bound allows those plus one live snapshot.)"""
    from kmr_spark.plans.iterative import pagerank

    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    out = pagerank(spark, "/root/testdata/sf0.001", iters=21)
    assert out.count() > 0
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 6, f"persistent RDDs grew {before} -> {after}"
