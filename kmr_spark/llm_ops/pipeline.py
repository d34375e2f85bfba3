"""Composed corpus-cleaning pipeline — the deliverable the individual
llm_ops exist for: one pass that yields the kept document set.

keep(doc) = quality >= bar
          AND doc is its exact-duplicate group's keeper (min doc_id)
          AND doc is not the dominated side of a MinHash near-dup pair
              (pairs are emitted a<b; we keep a, drop b)

Composition is pure DataFrame algebra over the already-oracled stages,
so the whole pipeline stays in one Catalyst plan (the signature and
stats scans share the persisted token-hash table). At 100 TB each stage
is the banded/blocked form documented in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.llm_ops.dedup import EXACT_DEDUP_SQL, MINHASH_SQL, exact_dedup, minhash_lsh_pairs
from kmr_spark.llm_ops.textstats import QUALITY_FILTER_SQL, doc_quality_filter


def corpus_clean_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    quality = doc_quality_filter(spark, sf_dir).select("doc_id")
    exact_keep = exact_dedup(spark, sf_dir).select(F.col("keep_doc_id").alias("doc_id"))
    near_dropped = minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")).distinct()
    return (
        quality.join(exact_keep, "doc_id")
        .join(near_dropped, "doc_id", "left_anti")
    )


CORPUS_CLEAN_SQL = f"""
SELECT q.doc_id FROM ({QUALITY_FILTER_SQL}) q
WHERE q.doc_id IN (SELECT keep_doc_id FROM ({EXACT_DEDUP_SQL}))
  AND q.doc_id NOT IN (SELECT doc_b FROM ({MINHASH_SQL}))
ORDER BY q.doc_id
"""

QUERIES = {"corpus_clean_keepers": corpus_clean_keepers}
ORACLE_SQL = {"corpus_clean_keepers": CORPUS_CLEAN_SQL}
