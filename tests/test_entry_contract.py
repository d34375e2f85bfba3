"""Guards on the driver contract surface (__spark_entry__ / bench.py).

Cheap, Spark-free checks that catch wiring drift: a query registered
without its oracle, a bench name that doesn't resolve, duplicate names
across plan modules silently shadowing each other.
"""

import __spark_entry__ as entry
import bench


def test_every_oracle_has_a_query():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs), set(osql) - set(qs)


def test_every_query_has_an_oracle():
    # all current queries are oracle-checked; if a deliberately
    # rows-only query is ever added, list it here explicitly
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(osql), set(qs) ^ set(osql)


def test_bench_names_resolve():
    qs = entry.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in qs]
    assert not missing, missing


def test_no_duplicate_names_across_modules():
    """QUERIES dicts merged in __spark_entry__ must not shadow each
    other: the union's size equals the sum of the parts."""
    from kmr_spark.llm_ops import registry
    from kmr_spark.plans import (analytics, basket, behavior, bloomjoin,
                                 corpusstats, diagnostics, generate, graphs,
                                 graysort, incremental, inference, iterative,
                                 layout, linalg, linkage, privacy,
                                 quality, rfm,
                                 robust, sampling, search, semistruct,
                                 sketches, timeseries, tpch, tpch_extra,
                                 training, trends, valuation, winfuncs,
                                 wordcount)

    parts = [tpch.QUERIES, tpch_extra.QUERIES, wordcount.QUERIES,
             graysort.QUERIES, analytics.QUERIES, iterative.QUERIES,
             linalg.QUERIES, generate.QUERIES, sampling.QUERIES,
             layout.QUERIES, graphs.QUERIES, incremental.QUERIES,
             semistruct.QUERIES, sketches.QUERIES, timeseries.QUERIES,
             quality.QUERIES, basket.QUERIES, rfm.QUERIES,
             training.QUERIES, bloomjoin.QUERIES, behavior.QUERIES,
             diagnostics.QUERIES, valuation.QUERIES, robust.QUERIES,
             corpusstats.QUERIES, trends.QUERIES, inference.QUERIES,
             privacy.QUERIES, winfuncs.QUERIES, search.QUERIES,
             linkage.QUERIES, registry.QUERIES]
    total = sum(len(p) for p in parts)
    merged = {}
    for p in parts:
        merged.update(p)
    assert len(merged) == total
    assert set(merged) == set(entry.queries())
