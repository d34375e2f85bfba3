"""Training-set assembly (plans/training.py) and corpus-hygiene
(llm_ops/corpus.py) operators: oracle parity + behavioral invariants."""

import pytest
from pyspark.sql import functions as F

from kmr_spark.plans import training
from tests.conftest import SF_DIR, assert_matches_oracle

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(training.QUERIES))
def test_training_plan_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, training.QUERIES[name], training.ORACLE_SQL[name])


def test_epoch_shuffle_is_permutation_per_epoch(spark):
    """Every epoch must be a complete permutation: all doc_ids present,
    positions exactly 0..N-1, and the two epochs in different orders."""
    out = training.epoch_shuffle(spark, SF_SMALL).collect()
    n_docs = len({r.doc_id for r in out})
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == set(range(1, training.N_EPOCHS + 1))
    orders = []
    for ep, rows in by_epoch.items():
        assert sorted(r.pos for r in rows) == list(range(n_docs))
        assert len({r.doc_id for r in rows}) == n_docs
        orders.append(tuple(r.doc_id for r in sorted(rows, key=lambda r: r.pos)))
    assert orders[0] != orders[1], "epochs must shuffle differently"


def test_ranking_materialized_survives_union(spark):
    """Regression: ranking() keys offsets on the task's partition id,
    which a downstream union shifts for the second child — ranks were
    silently restarting per partition. materialize=True computes ranks
    in their own job; the union of two materialized rankings must agree
    with a driver-side sort."""
    from kmr_spark.operators.sort import ranking

    df = spark.range(200).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("k"))
    a = ranking(df, [F.col("k").asc(), F.col("id").asc()], materialize=True)
    b = ranking(df, [F.col("k").desc(), F.col("id").asc()], materialize=True)
    got = a.unionAll(b).collect()
    rows = sorted((r.k, r.id) for r in df.collect())
    want_a = {(k, i): pos for pos, (k, i) in enumerate(rows)}
    rows_d = sorted(((r.k, r.id) for r in df.collect()),
                    key=lambda t: (-t[0], t[1]))
    want_b = {(k, i): pos for pos, (k, i) in enumerate(rows_d)}
    seen_a = seen_b = 0
    for r in got:
        if want_a.get((r.k, r.id)) == r.rank:
            seen_a += 1
        if want_b.get((r.k, r.id)) == r.rank:
            seen_b += 1
    # every row appears twice (once per ranking); each copy must carry
    # the rank of ITS ordering, so both tallies hit the full row count
    assert seen_a >= 200 and seen_b >= 200


def test_source_mixture_matches_python_hash(spark):
    """The kept count per source is a pure function of doc_id — cross-
    check the Spark filter against a driver-side reimplementation."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source").collect()
    P_PRE, A, P_MOD = 999983, 2654435761, 1000000007

    def kept(doc_id, rate):
        thr = int(rate * P_MOD)
        return ((doc_id % P_PRE + P_PRE) % P_PRE
                + training.MIXTURE_SALT) * A % P_MOD < thr

    want = {}
    for r in docs:
        rate = training.MIXTURE_RATES.get(r.source, 0.0)
        want.setdefault(r.source, [0, 0])
        want[r.source][0] += 1
        want[r.source][1] += int(kept(r.doc_id, rate))
    got = {r.source: (r.n_total, r.n_kept)
           for r in training.source_mixture(spark, SF_DIR).collect()}
    assert got == {s: (t, k) for s, (t, k) in want.items()}


def test_temperature_mix_upsamples_low_resource_langs(spark):
    """α < 1 must compress the domain imbalance: the kept fraction of
    the SMALLEST language must exceed that of the largest, and overall
    kept volume must land near MIX_TARGET."""
    rows = training.temperature_mix(spark, SF_DIR).collect()
    assert len(rows) >= 2
    biggest = max(rows, key=lambda r: r.n_total)
    smallest = min(rows, key=lambda r: r.n_total)
    assert biggest.n_total > smallest.n_total  # corpus is imbalanced
    assert (smallest.n_kept / smallest.n_total
            > biggest.n_kept / biggest.n_total)
    total, kept = sum(r.n_total for r in rows), sum(r.n_kept for r in rows)
    assert abs(kept / total - training.MIX_TARGET) < 0.1


def test_repetition_flags_and_ranges(spark):
    from kmr_spark.llm_ops.corpus import (TOP_BIGRAM_MAX, TOP_UNIGRAM_MAX,
                                          TTR_MIN, doc_repetition)

    rows = doc_repetition(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.ttr <= 1
        assert 0 < r.top_unigram_frac <= 1
        assert 0 < r.top_bigram_frac <= 1
        assert r.repetitive == (
            r.top_unigram_frac > TOP_UNIGRAM_MAX
            or r.top_bigram_frac > TOP_BIGRAM_MAX
            or r.ttr < TTR_MIN)
    # the synthetic small-vocab corpus must exercise both outcomes
    flags = {r.repetitive for r in rows}
    assert flags == {True, False}


def test_contamination_excludes_benchmark_and_bounds(spark):
    from kmr_spark.llm_ops.corpus import BENCH_MOD, doc_contamination

    rows = doc_contamination(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.doc_id % BENCH_MOD != 0, "benchmark docs must not be scored"
        assert 0 <= r.n_hit <= r.n_shingles
        assert r.contaminated == (r.n_hit > 0)
    assert any(r.contaminated for r in rows), \
        "shared-vocab corpus must produce at least one overlap"


def test_incremental_dedup_statuses(spark):
    """Every new-batch doc gets a status; dup_of points into history
    (never the batch) and only when status is duplicate."""
    from kmr_spark.llm_ops.dedup import BATCH_MOD, incremental_dedup

    rows = incremental_dedup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.doc_id % BATCH_MOD == 0
        assert 0 <= r.n_dups <= r.n_candidates
        if r.status == "duplicate":
            assert r.dup_of is not None and r.dup_of % BATCH_MOD != 0
        else:
            assert r.status == "keeper" and r.dup_of is None


def test_vocab_coverage_is_monotone_cdf(spark):
    from kmr_spark.llm_ops.corpus import vocab_coverage

    rows = vocab_coverage(spark, SF_SMALL).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prev_cov, prev_occ = 0.0, None
    for r in rows:
        assert r.cum_coverage >= prev_cov
        if prev_occ is not None:
            assert r.n_occ <= prev_occ, "terms must be frequency-sorted"
        prev_cov, prev_occ = r.cum_coverage, r.n_occ
    assert rows[-1].cum_coverage <= 1.0 + 1e-12


def test_leakage_safe_split_cluster_invariant(spark):
    """Every near-dup cluster lands wholly in ONE split, and the split
    rate is near TRAIN_RATE over group keys."""
    from collections import defaultdict

    from kmr_spark.llm_ops.dedup import (TRAIN_RATE,
                                         train_split_leakage_safe)

    rows = train_split_leakage_safe(spark, SF_DIR).collect()
    assert rows
    by_group = defaultdict(set)
    for r in rows:
        by_group[r.group_key].add(r.split)
    assert all(len(v) == 1 for v in by_group.values()), \
        "a cluster straddles the split"
    groups = len(by_group)
    train_groups = sum(1 for k, v in by_group.items() if "train" in v)
    assert abs(train_groups / groups - TRAIN_RATE) < 0.1


def test_containment_detects_embedded_doc(spark):
    """A short doc fully embedded in a longer one scores containment
    ~1.0 even when Jaccard is small — the asymmetry the operator
    exists for (checked on a hand-built pair through the same scoring
    arithmetic)."""
    from pyspark.sql import functions as F

    from kmr_spark.functions import hashing as H

    short = "alpha beta gamma delta epsilon zeta"
    long = ("pre one two three " + short + " post four five six seven "
            "eight nine ten eleven twelve thirteen fourteen fifteen")
    docs = spark.createDataFrame(
        [(1, short), (2, long)], ["doc_id", "text"])
    th = H.token_hash_table(docs)
    sigs = th.select(
        "doc_id",
        F.array_distinct(H.shingle_hashes_col(F.col("th"))).alias("s"))
    a = sigs.filter("doc_id = 1").select(F.col("s").alias("sa"))
    b = sigs.filter("doc_id = 2").select(F.col("s").alias("sb"))
    r = a.crossJoin(b).select(
        (F.size(F.array_intersect("sa", "sb")) / F.size("sa"))
        .alias("c_ab"),
        (F.size(F.array_intersect("sa", "sb"))
         / F.size(F.array_union("sa", "sb"))).alias("jac")).first()
    th.unpersist()
    assert r.c_ab == 1.0          # fully contained
    assert r.jac < 0.5            # Jaccard would have missed it


def test_containment_pairs_bounds(spark):
    from kmr_spark.llm_ops.dedup import (CONTAINMENT_THRESHOLD,
                                         containment_pairs)

    rows = containment_pairs(spark, SF_DIR).collect()
    for r in rows:
        assert max(r.containment_a_in_b, r.containment_b_in_a) >= \
            CONTAINMENT_THRESHOLD
        assert r.jaccard <= min(r.containment_a_in_b,
                                r.containment_b_in_a) + 1e-12


def test_dedup_summary_consistent_with_clusters(spark):
    from collections import Counter

    from kmr_spark.llm_ops.dedup import dedup_summary, duplicate_clusters

    sizes = Counter(r.cluster_size for r in
                    duplicate_clusters(spark, SF_DIR)
                    .groupBy("cluster_id").count()
                    .withColumnRenamed("count", "cluster_size").collect())
    rows = {r.cluster_size: r for r in dedup_summary(spark, SF_DIR).collect()}
    assert set(rows) == set(sizes)
    for size, r in rows.items():
        assert r.n_clusters == sizes[size]
        assert r.n_docs == size * sizes[size]
        assert r.n_dropped_keeper_only == (size - 1) * sizes[size]
        assert size >= 2  # singleton "clusters" never appear (need an edge)
