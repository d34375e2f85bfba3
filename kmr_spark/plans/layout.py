"""Data-layout & catalog queries: Z-order clustering and table
profiling (functions/zorder.py, operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions.zorder import (
    sql_zbucket,
    sql_zorder_key,
    zbucket,
    zorder_key,
)
from kmr_spark.operators.profile import profile_table, sql_profile
from kmr_spark.session import load_tables

ZORDER_TOP = 1000

#: integer/string columns only: their CAST-to-string rendering is
#: engine-identical (double/timestamp rendering is not guaranteed)
PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey",
                "l_returnflag", "l_linestatus"]


def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (user_id, floor(value)) and the first 1000 rows
    of the Z-ordered layout — the write-side clustering pass that makes
    later range filters on either column prune files. TakeOrdered cut
    (no global sort materialization) with an event_id tie-break."""
    ev = load_tables(spark, sf_dir)["events"]
    # zorder_key needs non-negative 16-bit inputs; fold both dimensions
    # into that domain (ids >= 2^16 / negative value buckets would
    # otherwise alias arbitrary Morton keys).
    keyed = ev.select(
        "event_id", "user_id",
        F.floor("value").cast("long").alias("vbucket"),
    ).withColumn(
        "zkey",
        zorder_key(zbucket(F.col("user_id")), zbucket(F.col("vbucket"))),
    )
    return (
        keyed.orderBy("zkey", "event_id")
        .limit(ZORDER_TOP)
        .select("event_id", "user_id", "vbucket", "zkey")
    )


EVENTS_ZORDER_SQL = f"""
SELECT event_id, user_id, vbucket,
       {sql_zorder_key(sql_zbucket('user_id'), sql_zbucket('vbucket'))} AS zkey
FROM (
  SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS vbucket
  FROM events)
ORDER BY zkey, event_id
LIMIT {ZORDER_TOP}
"""


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style single-pass profile of lineitem's key columns."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return profile_table(li, PROFILE_COLS)


PROFILE_LINEITEM_SQL = sql_profile("lineitem", PROFILE_COLS)


#: compaction target bytes per output file-group (tiny on the test
#: data so the plan actually exercises multi-bucket packing; the knob
#: a real deployment sets to 128 MB << HDFS-block multiples)
COMPACTION_TARGET_BYTES = 64 * 1024


def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: assign each (day) partition of
    events to an output file-group so every group is ~TARGET bytes —
    the maintenance pass any 100 TB table needs when streaming writes
    leave thousands of KB-sized files.

    Byte sizes are a deterministic per-row proxy (fixed row overhead +
    string payload lengths) summed per day; the greedy packer is
    cum_bytes_before DIV target on the day-ordered census — an exact
    integer prefix-scan formulation of "open a new file-group when the
    current one spills over". The window runs over the post-agg day
    census (|days| rows — thousands at 100 TB, KBs), never over raw
    events; the data-sized work is the one groupBy(day) shuffle.
    """
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n_rows"),
             F.sum(F.lit(48) + F.length("event_type")
                   + F.length("props")).alias("day_bytes"))
    )
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        daily
        .withColumn("cum_before",
                    F.sum("day_bytes").over(w) - F.col("day_bytes"))
        .select(
            "day", "n_rows", "day_bytes",
            F.expr(f"cum_before DIV {COMPACTION_TARGET_BYTES}")
            .alias("file_group"))
        .orderBy("day")
    )


COMPACTION_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_rows,
         CAST(SUM(48 + len(event_type) + len(props)) AS BIGINT)
           AS day_bytes
  FROM events GROUP BY 1),
packed AS (
  SELECT day, n_rows, day_bytes,
         CAST(SUM(day_bytes) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW)
              - day_bytes AS BIGINT) AS cum_before
  FROM daily)
SELECT day, n_rows, day_bytes,
       cum_before // {COMPACTION_TARGET_BYTES} AS file_group
FROM packed ORDER BY day
"""


QUERIES = {
    "events_zorder_layout": events_zorder_layout,
    "profile_lineitem": profile_lineitem,
    "events_compaction_plan": events_compaction_plan,
}

ORACLE_SQL = {
    "events_zorder_layout": EVENTS_ZORDER_SQL,
    "profile_lineitem": PROFILE_LINEITEM_SQL,
    "events_compaction_plan": COMPACTION_SQL,
}
