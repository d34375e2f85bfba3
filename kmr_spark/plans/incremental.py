"""Incremental view maintenance: merge a snapshot with a changelog.

The reference's checkpoint/restart machinery (src/kmrckpt.c) re-merges
saved per-operation KVS state with new input on restart; the Spark-first
analog — and the shape every production training-data pipeline needs —
is keyed MERGE/upsert: a base state table plus a delta batch combine
into the state the full recompute would have produced.

`merge_user_state` is the reusable operator: per-key partial aggregates
(count, decimal sum, argmax-by-version "latest row") from two inputs
combine with a full outer join + associative merge expressions. Counts
and DECIMAL sums are exactly associative and the latest-row merge is a
max over a lexicographic (ts, event_id) version key, so
merge(agg(A), agg(B)) == agg(A ∪ B) holds EXACTLY — which is precisely
what the oracle checks: the Spark side computes snapshot ⊕ delta, the
DuckDB oracle computes the single-pass global aggregate, and the gate
requires bit-equality.

At 100 TB the base state is the big side (hash-partitioned by key on
disk) and the delta is a day's increment: the merge is one shuffle of
the delta plus a co-partitioned outer join — the whole point of keeping
state keyed instead of recomputing the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables, scratch_dir

CUTOFF = "2024-01-16 00:00:00"  # events span 2024-01; mid-month split


def _user_state(ev: DataFrame) -> DataFrame:
    """Per-user partial aggregate: the mergeable state record."""
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last"),
    )


def merge_user_state(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Combine two per-user state tables (full outer join + associative
    merge). NULL-safe on either side; `last` wins by (ts, event_id)."""
    b = base.select(
        "user_id", F.col("n_events").alias("n_b"),
        F.col("sum_dec").alias("s_b"), F.col("last").alias("l_b"))
    d = delta.select(
        "user_id", F.col("n_events").alias("n_d"),
        F.col("sum_dec").alias("s_d"), F.col("last").alias("l_d"))
    # SUM is NULL when every input value is NULL; the merged sum must
    # reproduce that (coalescing both NULLs to 0 would turn a NULL
    # aggregate into 0.00 and break merge == recompute exactly)
    merged_sum = F.when(
        F.col("s_b").isNull() & F.col("s_d").isNull(), F.lit(None)
    ).otherwise(
        F.coalesce(F.col("s_b"), F.lit(0).cast("decimal(18,2)"))
        + F.coalesce(F.col("s_d"), F.lit(0).cast("decimal(18,2)")))
    return b.join(d, "user_id", "full_outer").select(
        "user_id",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0))).alias("n_events"),
        merged_sum.alias("sum_dec"),
        # struct max is lexicographic on (ts, event_id, ...): the
        # higher version key wins, exactly like greatest() on rows
        F.greatest(F.col("l_b"), F.col("l_d")).alias("last"),
    )


def events_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain per-user event state across a snapshot/changelog split.

    Events before CUTOFF form the materialized snapshot; events at or
    after it are the incoming delta. The result must equal the direct
    single-pass aggregate over all events — the invariant that makes
    incremental maintenance trustworthy.
    """
    ev = load_tables(spark, sf_dir)["events"]
    cutoff = F.to_timestamp(F.lit(CUTOFF))
    snapshot = _user_state(ev.filter(F.col("ts") < cutoff))
    delta = _user_state(ev.filter(F.col("ts") >= cutoff))
    merged = merge_user_state(snapshot, delta)
    return merged.select(
        "user_id", "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_type").alias("last_event_type"),
        F.col("last.value").alias("last_value"),
    ).orderBy("user_id")


INCREMENTAL_MERGE_SQL = """
WITH ranked AS (
  SELECT user_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
aggs AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events GROUP BY user_id)
SELECT a.user_id, a.n_events, a.sum_value,
       r.ts AS last_ts, r.event_type AS last_event_type,
       r.value AS last_value
FROM aggs a JOIN ranked r ON r.user_id = a.user_id AND r.rn = 1
ORDER BY a.user_id
"""


def events_state_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form of the incremental merge: replay the events
    stream and maintain the per-user state table through a foreachBatch
    MERGE (streaming/windows.py merge_stream_to_state). The final state
    must equal the single-pass batch aggregate however the replay was
    split into micro-batches — same oracle as events_incremental_merge.
    """
    import shutil

    from kmr_spark.streaming.windows import (merge_stream_to_state,
                                             sized_state_partitions,
                                             stream_events)

    ck = scratch_dir("kmr_stream_ck_")
    st = scratch_dir("kmr_stream_state_")
    try:
        from kmr_spark.session import sized_shuffle_partitions
        with sized_shuffle_partitions(
                spark, n_partitions=sized_state_partitions(spark, sf_dir)):
            state = merge_stream_to_state(stream_events(spark, sf_dir), st, ck)
        out = state.select(
            "user_id", "n_events",
            F.col("sum_dec").cast("double").alias("sum_value"),
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_type").alias("last_event_type"),
            F.col("last.value").alias("last_value"),
        ).orderBy("user_id")
        # the state files are about to be deleted; pin the rows first
        return out.localCheckpoint()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(st, ignore_errors=True)


QUERIES = {
    "events_incremental_merge": events_incremental_merge,
    "events_state_streamed": events_state_streamed,
}
ORACLE_SQL = {
    "events_incremental_merge": INCREMENTAL_MERGE_SQL,
    "events_state_streamed": INCREMENTAL_MERGE_SQL,
}


def snapshot_diff(v1: DataFrame, v2: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Generic table-diff operator: full outer join of two snapshot
    versions on the business key, classifying every key as added /
    removed / changed / unchanged and counting per-column changes.
    The "what moved between yesterday's and today's load" primitive
    every warehouse audit and CDC backfill validation needs; one
    keyed shuffle join, null-safe comparison per column (eqNullSafe,
    the SCD2 lesson), output is one row per key — never collected.
    """
    a = v1.select([F.col(c).alias(f"a_{c}") for c in key_cols + compare_cols])
    b = v2.select([F.col(c).alias(f"b_{c}") for c in key_cols + compare_cols])
    cond = [a[f"a_{k}"] == b[f"b_{k}"] for k in key_cols]
    j = a.join(b, cond, "full_outer")
    a_present = F.col(f"a_{key_cols[0]}").isNotNull()
    b_present = F.col(f"b_{key_cols[0]}").isNotNull()
    any_diff = None
    for c in compare_cols:
        d = ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
        any_diff = d if any_diff is None else (any_diff | d)
    status = (
        F.when(a_present & ~b_present, F.lit("removed"))
        .when(~a_present & b_present, F.lit("added"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    cols = [F.coalesce(F.col(f"a_{k}"), F.col(f"b_{k}")).alias(k)
            for k in key_cols]
    cols.append(status.alias("diff_status"))
    for c in compare_cols:
        cols.append((a_present & b_present
                     & ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}")))
                    .cast("int").alias(f"chg_{c}"))
    return j.select(cols)


def customer_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_diff demo on customer: v2 applies a deterministic CDC
    batch (acctbal +10 for custkey % 7 == 0, nation reassignment for
    custkey % 11 == 0, deletes at % 97 == 0, inserts cloned at
    key+1e9 for % 101 == 0), and the diff report rolls the per-key
    classification up to status x column counts — the audit a
    pipeline publishes next to every incremental load.
    """
    cust = load_tables(spark, sf_dir)["customer"]
    v2 = (
        cust.filter(F.col("c_custkey") % 97 != 0)
        .withColumn("c_acctbal",
                    F.when(F.col("c_custkey") % 7 == 0,
                           F.col("c_acctbal") + 10.0)
                    .otherwise(F.col("c_acctbal")))
        .withColumn("c_nationkey",
                    F.when(F.col("c_custkey") % 11 == 0,
                           (F.col("c_nationkey") + 1) % 25)
                    .otherwise(F.col("c_nationkey")))
    )
    inserts = (
        cust.filter(F.col("c_custkey") % 101 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 1000000000)
    )
    v2 = v2.unionByName(inserts)
    d = snapshot_diff(cust, v2, ["c_custkey"],
                      ["c_acctbal", "c_nationkey", "c_mktsegment"])
    return (
        d.groupBy("diff_status")
        .agg(F.count("*").alias("n_keys"),
             F.sum("chg_c_acctbal").alias("n_acctbal_chg"),
             F.sum("chg_c_nationkey").alias("n_nation_chg"),
             F.sum("chg_c_mktsegment").alias("n_segment_chg"))
        .orderBy("diff_status")
    )


SNAPSHOT_DIFF_SQL = """
WITH v2 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey,
         c_mktsegment
  FROM customer WHERE c_custkey % 97 <> 0
  UNION ALL
  SELECT c_custkey + 1000000000, c_acctbal, c_nationkey, c_mktsegment
  FROM customer WHERE c_custkey % 101 = 0),
d AS (
  SELECT CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NULL
                THEN 'removed'
              WHEN a.c_custkey IS NULL AND b.c_custkey IS NOT NULL
                THEN 'added'
              WHEN a.c_acctbal IS DISTINCT FROM b.c_acctbal
                OR a.c_nationkey IS DISTINCT FROM b.c_nationkey
                OR a.c_mktsegment IS DISTINCT FROM b.c_mktsegment
                THEN 'changed'
              ELSE 'unchanged' END AS diff_status,
         CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
               AND a.c_acctbal IS DISTINCT FROM b.c_acctbal
              THEN 1 ELSE 0 END AS chg_acctbal,
         CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
               AND a.c_nationkey IS DISTINCT FROM b.c_nationkey
              THEN 1 ELSE 0 END AS chg_nation,
         CASE WHEN a.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
               AND a.c_mktsegment IS DISTINCT FROM b.c_mktsegment
              THEN 1 ELSE 0 END AS chg_segment
  FROM customer a FULL OUTER JOIN v2 b ON a.c_custkey = b.c_custkey)
SELECT diff_status, COUNT(*) AS n_keys,
       CAST(SUM(chg_acctbal) AS BIGINT) AS n_acctbal_chg,
       CAST(SUM(chg_nation) AS BIGINT) AS n_nation_chg,
       CAST(SUM(chg_segment) AS BIGINT) AS n_segment_chg
FROM d GROUP BY 1 ORDER BY 1
"""

QUERIES["customer_snapshot_diff"] = customer_snapshot_diff
ORACLE_SQL["customer_snapshot_diff"] = SNAPSHOT_DIFF_SQL
