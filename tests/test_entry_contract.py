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

# The exact 50-name round-7 and 8-name round-8 window plans written in
# __spark_entry__.py above _R6_WINDOW.  Mirrored here so the gate
# arithmetic is test-pinned: if a query is added (breaking the
# registry freeze), renamed, or dropped, or the window/checked sets
# drift, these fail before the driver window does.
_R7_PLAN = frozenset("""
orders_lines_histogram graph_degree_distribution text_heaps_curve
events_slo_burn events_compaction_plan events_audience_overlap
graph_clustering_coefficient graph_reciprocity events_spectral_daily
integrity_audit events_decision_stump users_ols_normal_equations
orders_backlog_aging customer_snapshot_diff emb_quantization_error
privacy_generalization_ladder events_power_analysis
events_session_gap_sensitivity events_bot_flags orders_fulfillment_lag
emb_centroid_drift basket_apriori_triples events_encoding_advisor
search_inverted_index search_phrase_query graph_hits events_holt_linear
events_hazard_daily multimodal_image_phash emb_pca_two
text_longest_repeat search_bm25_topk events_attribution_full_streamed
train_curriculum_order privacy_t_closeness events_holt_winters
events_ks_test graph_ktruss events_shapley_attribution
events_peak_prominence sim_ivf_recall lineitem_zonemap_prune
events_forecast_reconciled events_psi_drift customer_record_linkage
graph_random_walks parts_xyz_classification bpe_learn_merges
emb_random_projection graph_kcore
""".split())
_R8_PLAN = frozenset("""
events_ab_srm_check events_factorial_interaction
lineitem_returns_wilson orders_dormancy_reactivation events_mde_curve
events_attrib_window_sweep events_ratio_metric_delta
events_watermark_late_census
""".split())


def test_driver_gate_rotation_invariants():
    """The driver checks exactly the FIRST 50 registry entries; these
    invariants make the round-6 gate deterministic:
    - registry frozen at 301 (VERDICT r5 ask #4),
    - the first 50 iterated names are exactly _R6_WINDOW in order,
    - window / checked sets are disjoint and the leftover backlog
      partitions into the documented r7 (50) + r8 (8) window plans."""
    qs = entry.queries()
    names = list(qs)
    assert len(names) == 301, f"registry must stay frozen at 301, got {len(names)}"
    assert len(entry._R6_WINDOW) == 50
    assert tuple(names[:50]) == entry._R6_WINDOW
    assert not set(entry._R6_WINDOW) & entry._DRIVER_CHECKED
    backlog = {n for n in names
               if n not in entry._DRIVER_CHECKED
               and n not in set(entry._R6_WINDOW)}
    assert len(_R7_PLAN) == 50 and len(_R8_PLAN) == 8
    assert not _R7_PLAN & _R8_PLAN
    assert backlog == _R7_PLAN | _R8_PLAN, (
        backlog ^ (_R7_PLAN | _R8_PLAN))
    assert len(entry._DRIVER_CHECKED) + 50 + 50 + 8 == 301


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
