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


#: columns audited by the encoding advisor (name, typed expression)
_ADVISOR_COLS = (
    ("event_type", "event_type"),
    ("user_id", "user_id"),
    ("value_cents", "CAST(floor(value * 100) AS BIGINT)"),
    ("props", "props"),
)


def events_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding advisor for the events table: per column, the
    cardinality ratio and the run-length structure the file format
    actually sees (runs counted in time-ordered day partitions — the
    layout events_zorder_layout / compaction write). Low
    distinct_permille says dictionary-encode; long avg_run_len says
    RLE wins; both near 1000/1.0 say plain encoding. This is the
    report that decides parquet encodings and sort keys before a
    100 TB rewrite, computed from the engine instead of guessed.

    Plan: one per-day ordered window pass per audited column (same
    partition spec, Catalyst reuses the sort) counting value-change
    boundaries; day partitions bound the window (no global sort). All
    counts are BIGINTs; ratios are single fixed expression trees.
    """
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir)["events"]
    outs = []
    for name, expr in _ADVISOR_COLS:
        col = ev.select(
            F.to_date("ts").alias("day"), F.col("ts"), F.col("event_id"),
            F.expr(expr).alias("v"))
        w = Window.partitionBy("day").orderBy("ts", "event_id")
        runs = col.withColumn(
            "chg",
            F.when(F.lag("v").over(w).eqNullSafe(F.col("v")), 0)
            .otherwise(1))
        outs.append(runs.agg(
            F.lit(name).alias("column_name"),
            F.count("*").alias("n_rows"),
            F.count(F.when(F.col("v").isNull(), 1)).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
            F.sum("chg").alias("n_runs"),
        ).selectExpr(
            "column_name", "n_rows", "n_null", "n_distinct", "n_runs",
            "(1000 * n_distinct) DIV n_rows AS distinct_permille",
            "CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE)"
            " AS avg_run_len"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res.orderBy("column_name")


def _advisor_sql() -> str:
    parts = []
    for name, expr in _ADVISOR_COLS:
        parts.append(f"""
SELECT '{name}' AS column_name, COUNT(*) AS n_rows,
       COUNT(CASE WHEN v IS NULL THEN 1 END) AS n_null,
       COUNT(DISTINCT v) AS n_distinct,
       CAST(SUM(chg) AS BIGINT) AS n_runs,
       (1000 * COUNT(DISTINCT v)) // COUNT(*) AS distinct_permille,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(chg) AS DOUBLE) AS avg_run_len
FROM (
  SELECT v, CASE WHEN v IS NOT DISTINCT FROM LAG(v) OVER (
         PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id)
         THEN 0 ELSE 1 END AS chg
  FROM (SELECT ts, event_id, {expr} AS v FROM events))""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name"


ENCODING_ADVISOR_SQL = _advisor_sql()

QUERIES["events_encoding_advisor"] = events_encoding_advisor
ORACLE_SQL["events_encoding_advisor"] = ENCODING_ADVISOR_SQL


#: simulated row-group size (rows) for the zone-map study
ZONEMAP_GROUP_ROWS = 4096
#: probe predicates: l_shipdate BETWEEN lo AND hi, expressed as days
#: from 1992-01-01 (the lineitem epoch); three selectivity tiers
ZONEMAP_PROBES = (
    ("week", 1460, 1466),      # ~1 week in 1996
    ("month", 1460, 1489),     # ~1 month
    ("year", 1460, 1824),      # ~1 year
)


def lineitem_zonemap_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZONE-MAP pruning simulator: how many row groups would a
    min/max-statistics reader (parquet row groups, ORC stripes) skip
    for a ship-date range predicate, under TWO physical layouts —
    arrival order (orderkey) vs shipdate-sorted? The number that
    justifies a sort-on-write pipeline stage BEFORE anyone runs it at
    100 TB: groups_scanned(sorted) / groups_scanned(arrival) is the
    I/O multiplier the layout buys, measured from the engine itself
    (companion to events_zorder_layout, which buys the same effect in
    two dimensions, and events_compaction_plan / encoding advisor).

    Row groups are simulated as ZONEMAP_GROUP_ROWS-row slices of each
    layout's global order (rank DIV group_rows); per group the
    min/max shipdate-day is the zone map; a probe skips the group when
    [lo, hi] misses [min, max]. All integers.

    Scale: the global ranks come from the distributed exscan ranking
    (no single-partition window); the zone-map census is |groups|
    rows, and the probe evaluation is a literal comparison per group.
    Each layout's ranked frame is reduced to its zone aggregate while
    the ranking's internal sort cache is live, and only the
    PROBE-COUNT rows are checkpointed — the previous
    ``ranking(materialize=True)`` form localCheckpointed the full
    ranked lineitem TWICE (once per layout), which held 2x |lineitem|
    checkpoint blocks on the heap and OOMed the sf10 (60M-row) sweep;
    now nothing larger than |groups| is ever materialized (guide §5).
    """
    from kmr_spark.operators.sort import ranking
    from kmr_spark.session import materialize_release

    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_linenumber",
        F.datediff(F.to_date("l_shipdate"),
                   F.lit("1992-01-01").cast("date")).alias("sday"))
    layouts = {
        "arrival": [F.col("l_orderkey"), F.col("l_linenumber")],
        "shipdate_sorted": [F.col("sday"), F.col("l_orderkey"),
                            F.col("l_linenumber")],
    }
    outs = []
    for name, order in layouts.items():
        reg: list = []
        ranked = ranking(li, order, cache_registry=reg)
        zones = (
            ranked.select(
                F.expr(f"rank DIV {ZONEMAP_GROUP_ROWS}").alias("grp"),
                "sday")
            .groupBy("grp")
            .agg(F.min("sday").alias("lo_day"), F.max("sday").alias("hi_day"))
        )
        # ALL probes in one aggregation pass over the zones (they are
        # conditional counts with different literals), exploded into
        # one row per probe — the per-probe zones.agg() branches each
        # re-aggregated the full ranked frame (guide §1.2: 3 passes ->
        # 1 per layout; the 6-branch union is now a 2-branch union)
        agg = zones.agg(
            F.count("*").alias("n_groups"),
            *[F.count(F.when((F.col("hi_day") >= lo)
                             & (F.col("lo_day") <= hi), 1))
              .alias(f"g_{probe}") for probe, lo, hi in ZONEMAP_PROBES])
        pr = F.explode(F.array(*[
            F.struct(F.lit(probe).alias("probe"),
                     F.col(f"g_{probe}").alias("groups_scanned"))
            for probe, _, _ in ZONEMAP_PROBES])).alias("pr")
        branch = (
            agg.select(F.lit(name).alias("layout"), pr, "n_groups")
            .select("layout", F.col("pr.probe").alias("probe"), "n_groups",
                    F.col("pr.groups_scanned").alias("groups_scanned"),
                    F.expr("(1000 * pr.groups_scanned) DIV n_groups")
                    .alias("scan_permille")))
        # materialize the |probes|-row branch (its own job: correct
        # partition ids for the rank offsets) and release the sort cache
        outs.append(materialize_release(branch, *reg))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("layout", "probe")


def _zonemap_sql() -> str:
    zone_ctes = []
    for name, order in (("arrival", "l_orderkey, l_linenumber"),
                        ("shipdate_sorted",
                         "sday, l_orderkey, l_linenumber")):
        zone_ctes.append(f"""
zones_{name} AS (
  SELECT grp, MIN(sday) AS lo_day, MAX(sday) AS hi_day
  FROM (SELECT sday,
               (row_number() OVER (ORDER BY {order}) - 1)
                 // {ZONEMAP_GROUP_ROWS} AS grp
        FROM base)
  GROUP BY grp)""")
    parts = []
    for name in ("arrival", "shipdate_sorted"):
        for probe, lo, hi in ZONEMAP_PROBES:
            hit = f"CASE WHEN hi_day >= {lo} AND lo_day <= {hi} THEN 1 END"
            parts.append(f"""
SELECT '{name}' AS layout, '{probe}' AS probe,
       COUNT(*) AS n_groups,
       COUNT({hit}) AS groups_scanned,
       (1000 * COUNT({hit})) // COUNT(*) AS scan_permille
FROM zones_{name}""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
           AS sday
  FROM lineitem),{",".join(zone_ctes)}
{body}
ORDER BY layout, probe
"""


ZONEMAP_SQL = _zonemap_sql()

QUERIES["lineitem_zonemap_prune"] = lineitem_zonemap_prune
ORACLE_SQL["lineitem_zonemap_prune"] = ZONEMAP_SQL
