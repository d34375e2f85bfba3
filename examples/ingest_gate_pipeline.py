#!/usr/bin/env python
"""Batch-ingest pipeline with the round-3 operator families:

  validate (quality gate) -> incremental MERGE into per-user state
  -> sketch profile (HLL distinct + histogram quantiles)
  -> LM familiarity scoring of the incoming documents
  -> JSONL export of the violation report

The shape a scheduled ingest job has: gate the batch, maintain keyed
state incrementally, publish cheap sketches for monitoring, and export
artifacts for non-Spark consumers.

Run: python examples/ingest_gate_pipeline.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kmr_spark.llm_ops.textstats import doc_bigram_lm
from kmr_spark.plans.incremental import CUTOFF, _user_state, merge_user_state
from kmr_spark.plans.quality import validate_events
from kmr_spark.plans.sketches import events_hll_users, events_sketch_quantiles
from kmr_spark.session import get_spark, load_tables
from kmr_spark.sources.files import save_jsonl


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest-gate")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. gate the batch: refuse to publish if any rule fails
    report_rows = validate_events(spark, sf_dir).collect()
    for r in report_rows:
        print(f"  {'PASS' if r.passed else 'FAIL':4s} {r.rule}: "
              f"{r.violations}/{r.n_rows} violations")
    failed = sum(1 for r in report_rows if not r.passed)
    if failed:
        print(f"quality gate: {failed} rule(s) FAILED — batch NOT published")
        spark.stop()
        sys.exit(1)
    print("quality gate: PASS")

    # 2. incremental state maintenance: snapshot + this batch's delta
    ev = load_tables(spark, sf_dir)["events"]
    cutoff = F.to_timestamp(F.lit(CUTOFF))
    merged = merge_user_state(
        _user_state(ev.filter(F.col("ts") < cutoff)),
        _user_state(ev.filter(F.col("ts") >= cutoff)))
    print(f"merged per-user state rows: {merged.count()}")

    # 3. monitoring sketches: constant-state, mergeable
    events_hll_users(spark, sf_dir).show()
    events_sketch_quantiles(spark, sf_dir).show()

    # 4. LM familiarity: lowest-scoring docs are the OOD review queue
    lm = doc_bigram_lm(spark, sf_dir)
    print("most out-of-distribution documents:")
    lm.orderBy("lm_score").limit(5).show()

    # 5. export the violation report for non-Spark consumers
    out = os.path.join(tempfile.mkdtemp(prefix="ingest_gate_"), "report")
    save_jsonl(spark.createDataFrame(report_rows), out)
    print(f"violation report exported to {out}")

    spark.stop()


if __name__ == "__main__":
    main()
