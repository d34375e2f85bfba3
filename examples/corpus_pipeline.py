#!/usr/bin/env python
"""End-to-end training-data pipeline over the documents table:

  near-dup pairs (SimHash) -> duplicate clusters (connected components)
  -> keeper per cluster -> quality filter -> holdout split (deterministic
  hash sample) -> chunk -> pack into context windows.

Every stage is one of the engine's first-class operators; this script
just composes them the way a real corpus build would, and prints the
row-count funnel.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kmr_spark.llm_ops.chunking import chunk_documents
from kmr_spark.llm_ops.dedup import simhash_pairs
from kmr_spark.llm_ops.packing import pack_chunks
from kmr_spark.llm_ops.textstats import doc_textstats
from kmr_spark.operators.graph import connected_components
from kmr_spark.operators.sample import hash_sample
from kmr_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"]
    n_docs = docs.count()

    # 1. near-dup clusters -> keep the minimum doc_id of each cluster
    pairs = simhash_pairs(spark, sf_dir, sort=False).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b")
    losers = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id"))
    kept = docs.join(losers, "doc_id", "left_anti")
    n_kept = kept.count()

    # 2. quality filter (scores computed corpus-wide, joined to keepers)
    scored = doc_textstats(spark, sf_dir)
    good = kept.join(scored.filter(F.col("quality") >= 0.5)
                     .select("doc_id"), "doc_id")
    n_good = good.count()

    # 3. deterministic ~90/10 train/holdout split
    train = hash_sample(good, 0.9, key="doc_id", salt=1)
    n_train = train.count()

    # 4. chunk + pack
    chunks = chunk_documents(train, size=200, overlap=20)
    packed = pack_chunks(chunks)
    n_chunks = chunks.count()
    n_bins = packed.select("shard", "bin_id").distinct().count()

    print(f"docs={n_docs} after_dedup={n_kept} after_quality={n_good} "
          f"train={n_train} chunks={n_chunks} packed_bins={n_bins}")
    spark.stop()


if __name__ == "__main__":
    main()
