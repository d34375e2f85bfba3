"""Cross-doc duplicated-span detection (llm_ops/spans.py)."""

from __future__ import annotations

from conftest import SF_DIR, assert_matches_oracle

from kmr_spark.llm_ops.spans import SPANS_SQL, duplicated_spans


def test_spans_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, duplicated_spans, SPANS_SQL)


def test_spans_bounds_and_signal(spark):
    """dup counts bounded by totals; the synthetic small-vocab corpus
    must actually contain cross-doc duplicated spans (the operator has
    signal, not a vacuous all-zeros pass)."""
    rows = duplicated_spans(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert abs(r.dup_frac - r.n_dup_spans / r.n_spans) < 1e-12
    assert any(r.n_dup_spans > 0 for r in rows)


def test_spans_detects_planted_duplicate(spark):
    """Two docs sharing a verbatim 5-token span are both flagged; a
    doc with no shared span is not."""
    from kmr_spark.functions import hashing as H
    from kmr_spark.llm_ops.spans import SPAN_K

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over x"),
         (2, "prefix words the quick brown fox jumps tail"),
         (3, "completely different tokens here nothing shared at all")],
        ["doc_id", "text"])
    from pyspark.sql import functions as F

    th = H.token_hash_table(docs)
    doc_spans = th.select(
        "doc_id",
        F.explode(F.array_distinct(
            H.span_hashes_col(F.col("th"), SPAN_K))).alias("span"))
    carriers = doc_spans.groupBy("span").agg(F.count("*").alias("n_docs"))
    flagged = {
        r.doc_id: r.n_dup
        for r in doc_spans.join(carriers, "span")
        .groupBy("doc_id")
        .agg(F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup"))
        .collect()
    }
    th.unpersist()
    assert flagged[1] > 0 and flagged[2] > 0
    assert flagged[3] == 0


def test_novelty_first_doc_is_fully_novel_and_saturates(spark):
    """doc 0 (first in corpus order) is 100% novel; mean novelty over
    later docs is lower (saturation); exact duplicates of earlier docs
    score 0 when they exist."""
    from kmr_spark.llm_ops.spans import ngram_novelty

    rows = {r.doc_id: r for r in ngram_novelty(spark, SF_DIR).collect()}
    first_id = min(rows)
    assert rows[first_id].novelty == 1.0
    later = [r.novelty for d, r in rows.items() if d != first_id]
    assert sum(later) / len(later) < 1.0
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_novel <= r.n_shingles
