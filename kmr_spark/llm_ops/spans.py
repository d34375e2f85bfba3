"""Cross-document duplicated-span detection over the documents table.

The span-level view of training-data dedup (the ExactSubstr idea of
Lee et al., "Deduplicating Training Data Makes Language Models
Better", 2022 — there via a suffix array; here via rolling span
hashes, the scalable shuffle-friendly form): a document that shares a
verbatim k-token span with another document carries memorization
risk even when whole-document near-dedup keeps both.

Per document: how many distinct k-token spans it contains, how many
of those also appear in at least one OTHER document, and the
duplicated fraction — the score a curation pipeline thresholds to
drop or trim span-level duplicates.

Plan shape (100 TB): tokenize/hash at the scan (token_hash_table),
explode distinct span hashes -> (doc_id, span) pairs, ONE hash
shuffle on span to count carrier docs, one shuffle back on doc_id
for the per-doc rollup. No self-join, no candidate pairs: cost is
O(total spans), the same as a word count. The reference's suffix-
array analog is a single-node in-memory algorithm; this form is the
one that distributes.

Reference parity: KMR expresses the grouping as kmr_shuffle
(reference src/kmrbase.c:2094) + kmr_reduce (src/kmrbase.c:2607)
over span keys; the arithmetic is this repo's portable hashing
(functions/hashing.py) so DuckDB replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions import hashing as H
from kmr_spark.session import load_tables, materialize_release, widen

#: span length in tokens — long enough that sharing one is verbatim
#: reuse, short enough to catch partial-overlap duplication
SPAN_K = 5


def _spans_plan(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The un-materialized span-profile plan + its cached token table
    (exposed separately so plan-shape tests can inspect the real
    pipeline; the public query materializes and releases the cache)."""
    docs = widen(load_tables(spark, sf_dir)["documents"])
    th_table = H.token_hash_table(docs)
    doc_spans = (
        th_table.select(
            "doc_id",
            F.explode(
                F.array_distinct(H.span_hashes_col(F.col("th"), SPAN_K))
            ).alias("span"),
        )
    )
    carriers = doc_spans.groupBy("span").agg(
        F.count("*").alias("n_docs"))  # doc-distinct already
    out = (
        doc_spans.join(carriers, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup_spans"),
        )
        .select(
            "doc_id", "n_spans", "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans"))
            .alias("dup_frac"),
        )
    )
    return out, th_table


def duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc span duplication profile: (doc_id, n_spans,
    n_dup_spans, dup_frac), docs with >= 1 span only."""
    out, th_table = _spans_plan(spark, sf_dir)
    return materialize_release(out, th_table)


SPANS_SQL = f"""
WITH th AS (
  SELECT doc_id,
         {H.sql_token_hashes(H.sql_tokens('text'))} AS th
  FROM documents),
doc_spans AS (
  SELECT DISTINCT doc_id, span
  FROM th, unnest({H.sql_span_hashes('th', SPAN_K)}) AS t(span)),
carriers AS (
  SELECT span, COUNT(*) AS n_docs FROM doc_spans GROUP BY span)
SELECT d.doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_frac
FROM doc_spans d JOIN carriers c USING (span)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-saturation census: per document (in doc_id ingestion
    order) the fraction of its distinct shingles whose FIRST occurrence
    in the corpus is this document — the novelty curve data engineers
    watch to decide when more of a source stops adding information
    (novelty → 0 as a crawl saturates).

    Plan: same word-count shape as duplicated_spans — one shuffle
    keyed on shingle to find each shingle's min carrier, one join
    back, one per-doc rollup. O(total shingles), no pairs.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"])
    th_table = H.token_hash_table(docs)
    doc_sh = th_table.select(
        "doc_id",
        F.explode(F.array_distinct(
            H.shingle_hashes_col(F.col("th")))).alias("sh"))
    first = doc_sh.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    out = (
        doc_sh.join(first, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"),
             F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
             .alias("n_novel"))
        .select("doc_id", "n_shingles", "n_novel",
                (F.col("n_novel").cast("double") / F.col("n_shingles"))
                .alias("novelty"))
    )
    return materialize_release(out, th_table)


NOVELTY_SQL = f"""
WITH th AS (
  SELECT doc_id,
         {H.sql_token_hashes(H.sql_tokens('text'))} AS th
  FROM documents),
doc_sh AS (
  SELECT DISTINCT doc_id, sh
  FROM th, unnest({H.sql_shingle_hashes('th')}) AS t(sh)),
first AS (
  SELECT sh, MIN(doc_id) AS first_doc FROM doc_sh GROUP BY sh)
SELECT d.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty
FROM doc_sh d JOIN first f USING (sh)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


QUERIES = {"dedup_spans": duplicated_spans,
           "text_ngram_novelty": ngram_novelty}
ORACLE_SQL = {"dedup_spans": SPANS_SQL,
              "text_ngram_novelty": NOVELTY_SQL}
