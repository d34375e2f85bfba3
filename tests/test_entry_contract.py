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
                                 quality, rfm, watermark,
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
             linkage.QUERIES, watermark.QUERIES, registry.QUERIES]
    total = sum(len(p) for p in parts)
    merged = {}
    for p in parts:
        merged.update(p)
    assert len(merged) == total
    assert set(merged) == set(entry.queries())

def test_driver_gate_rotation_invariants():
    """The driver checks exactly the FIRST 50 registry entries; these
    invariants make the round-8 gate deterministic:
    - the 8-name backlog window (_R8_WINDOW) iterates first, closing
      the ledger at 301/301 driver-green once CORRECTNESS_r08 lands,
    - any post-freeze additions (VERDICT r7 ask #3 caps them to the
      streaming-watermark extension) iterate right after the pinned 8
      so they get a driver row in the same round,
    - every non-driver-checked query fits inside the 50-entry window."""
    qs = entry.queries()
    names = list(qs)
    assert len(names) >= 301, f"registry must not shrink below 301, got {len(names)}"
    assert len(entry._R8_WINDOW) == 8
    assert tuple(names[:8]) == entry._R8_WINDOW
    assert not set(entry._R8_WINDOW) & entry._DRIVER_CHECKED
    unchecked = [n for n in names
                 if n not in entry._DRIVER_CHECKED
                 and n not in set(entry._R8_WINDOW)]
    # post-freeze additions sit immediately after the pinned 8, then
    # the changed-plan re-checks
    assert names[8:8 + len(unchecked)] == unchecked
    n_front = 8 + len(unchecked) + len(entry._R8_RECHECK)
    assert names[8 + len(unchecked):n_front] == list(entry._R8_RECHECK)
    assert set(entry._R8_RECHECK) <= entry._DRIVER_CHECKED
    # everything without a driver row must fit in the 50-entry check
    assert n_front <= 50, f"window overflow: {n_front} pinned-front > 50"
    assert len(entry._DRIVER_CHECKED) + 8 + len(unchecked) == len(names)


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
