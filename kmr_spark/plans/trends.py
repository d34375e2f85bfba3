"""Trend analytics: month-over-month growth over orders.

Integer-cents revenue and integer-permille growth, so the oracle is
exact (both engines' integer division truncates toward zero). The
growth window runs over the |months| series — bounded by the time
range, never by order volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables, scratch_dir


def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir)["orders"]
    monthly = (
        orders.groupBy(
            F.trunc(F.to_date("o_orderdate"), "month").alias("month"))
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
             .alias("rev_cents"),
             F.count("*").alias("n_orders")))
    w = Window.orderBy("month")  # |months| rows — calendar-bounded
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "month", "n_orders", "rev_cents",
        prev.alias("prev_cents"),
        F.expr("(1000 * (rev_cents - lag(rev_cents) OVER (ORDER BY month)))"
               " DIV lag(rev_cents) OVER (ORDER BY month)")
        .alias("growth_permille"))


MONTHLY_GROWTH_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT month, n_orders, rev_cents,
       LAG(rev_cents) OVER (ORDER BY month) AS prev_cents,
       (1000 * (rev_cents - LAG(rev_cents) OVER (ORDER BY month)))
         // LAG(rev_cents) OVER (ORDER BY month) AS growth_permille
FROM monthly
"""


QUERIES = {"orders_monthly_growth": orders_monthly_growth}
ORACLE_SQL = {"orders_monthly_growth": MONTHLY_GROWTH_SQL}


ASOF_TOLERANCE_S = 3600


def events_asof_click_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase->click as-of attribution with a 1h tolerance: each
    purchase is joined to the user's most recent prior click via the
    engine's as-of operator (operators/asof.py — union + keyed window,
    ONE shuffle, no range self-join), then the match is kept only
    within tolerance. Lag depends only on the click timestamp, so
    simultaneous-click ties cannot affect the output and the DuckDB
    ASOF JOIN oracle is exact.
    """
    from kmr_spark.operators.asof import asof_join
    from kmr_spark.session import load_tables

    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "us", F.col("us").alias("c_us"))
    joined = asof_join(purchases, clicks, on="us", by="user_id",
                       right_cols=["c_us"], left_key="event_id")
    lim = ASOF_TOLERANCE_S * 1_000_000
    within = (F.col("asof_c_us").isNotNull()
              & ((F.col("us") - F.col("asof_c_us")) <= lim))
    return joined.select(
        "event_id", "user_id",
        F.when(within, F.expr(f"(us - asof_c_us) DIV 1000000"))
        .alias("lag_s"),
        within.alias("attributed"))


ASOF_ATTRIB_SQL = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events),
p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, us AS c_us FROM e WHERE event_type = 'click')
SELECT p.event_id, p.user_id,
       CASE WHEN c.c_us IS NOT NULL
             AND p.us - c.c_us <= {ASOF_TOLERANCE_S * 1_000_000}
            THEN (p.us - c.c_us) // 1000000 END AS lag_s,
       coalesce(c.c_us IS NOT NULL
                AND p.us - c.c_us <= {ASOF_TOLERANCE_S * 1_000_000}, FALSE)
         AS attributed
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.c_us
"""


def events_asof_forward_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->NEXT-purchase SLA clock: each click is joined to the
    user's EARLIEST purchase at-or-after it via the as-of operator's
    forward direction (operators/asof.py — same union+keyed-window
    plan, frame flipped; ONE shuffle, no range self-join), kept when
    within tolerance. The lead depends only on the purchase timestamp,
    so simultaneous-purchase ties cannot affect the output and the
    DuckDB oracle (ASOF JOIN on negated keys — DuckDB only looks
    backward) is exact.
    """
    from kmr_spark.operators.asof import asof_join
    from kmr_spark.session import load_tables

    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "us")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "us", F.col("us").alias("p_us"))
    joined = asof_join(clicks, purchases, on="us", by="user_id",
                       right_cols=["p_us"], left_key="event_id",
                       direction="forward")
    lim = ASOF_TOLERANCE_S * 1_000_000
    within = (F.col("asof_p_us").isNotNull()
              & ((F.col("asof_p_us") - F.col("us")) <= lim))
    return joined.select(
        "event_id", "user_id",
        F.when(within, F.expr("(asof_p_us - us) DIV 1000000"))
        .alias("lead_s"),
        within.alias("converted"))


ASOF_FORWARD_SQL = f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events),
c AS (SELECT event_id, user_id, us, -us AS neg_us FROM e
      WHERE event_type = 'click'),
p AS (SELECT user_id, us AS p_us, -us AS neg_us FROM e
      WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id,
       CASE WHEN p.p_us IS NOT NULL
             AND p.p_us - c.us <= {ASOF_TOLERANCE_S * 1_000_000}
            THEN (p.p_us - c.us) // 1000000 END AS lead_s,
       coalesce(p.p_us IS NOT NULL
                AND p.p_us - c.us <= {ASOF_TOLERANCE_S * 1_000_000}, FALSE)
         AS converted
FROM c ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.neg_us >= p.neg_us
"""


def orders_repeat_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cohort triangle: customers grouped by first-order
    month, tracked by month offset — how many of each cohort order
    again k months later. Month arithmetic is integer (y*12+m), the
    census is |cohorts| x |month offsets|.

    Plan: per-customer min-month aggregate, broadcast-joinable back
    onto the (custkey, month) distinct pairs; everything after the
    first aggregate is cohort-sized.
    """
    from kmr_spark.session import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    om = orders.select(
        "o_custkey",
        (F.year(F.to_date("o_orderdate")) * 12
         + F.month(F.to_date("o_orderdate"))).cast("long").alias("m"))
    cust_months = om.distinct()
    first = cust_months.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    return (
        cust_months.join(first, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("month_offset"))
        .agg(F.count("*").alias("n_customers"))
        .select(F.col("m0").alias("cohort_month"), "month_offset",
                "n_customers")
    )


REPEAT_COHORT_SQL = """
WITH om AS (
  SELECT DISTINCT o_custkey,
         year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) AS m
  FROM orders),
fo AS (SELECT o_custkey, MIN(m) AS m0 FROM om GROUP BY o_custkey)
SELECT CAST(m0 AS BIGINT) AS cohort_month,
       CAST(m - m0 AS BIGINT) AS month_offset,
       COUNT(*) AS n_customers
FROM om JOIN fo USING (o_custkey)
GROUP BY m0, month_offset
"""


QUERIES["events_asof_click_attrib"] = events_asof_click_attrib
QUERIES["events_asof_forward_sla"] = events_asof_forward_sla
QUERIES["orders_repeat_cohort"] = orders_repeat_cohort
ORACLE_SQL["events_asof_click_attrib"] = ASOF_ATTRIB_SQL
ORACLE_SQL["events_asof_forward_sla"] = ASOF_FORWARD_SQL
ORACLE_SQL["orders_repeat_cohort"] = REPEAT_COHORT_SQL


def _daily_type_counts(batch: DataFrame) -> DataFrame:
    return (batch.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(F.count("*").alias("n")))


def _merge_daily_counts(base: DataFrame, delta: DataFrame) -> DataFrame:
    b = base.select("day", "event_type", F.col("n").alias("n_b"))
    d = delta.select("day", "event_type", F.col("n").alias("n_d"))
    return b.join(d, ["day", "event_type"], "full_outer").select(
        "day", "event_type",
        (F.coalesce("n_b", F.lit(0)) + F.coalesce("n_d", F.lit(0)))
        .alias("n"))


def events_trending_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 trending event types per day, maintained INCREMENTALLY
    from the event stream: per micro-batch (day, type) count deltas
    merged into a versioned state table (sum merge — associative, so
    the final counts are bit-equal to the batch recompute whatever the
    micro-batch split), then the top-3 cut runs once over the
    |days|x|types| state. The always-on trending dashboard shape;
    state never exceeds the rollup size.
    """
    import shutil

    from kmr_spark.session import sized_shuffle_partitions
    from kmr_spark.streaming.windows import (sized_state_partitions,
                                             stream_events,
                                             versioned_merge_stream)

    ck = scratch_dir("kmr_stream_ck_")
    st = scratch_dir("kmr_stream_state_")
    try:
        with sized_shuffle_partitions(
                spark, n_partitions=sized_state_partitions(spark, sf_dir)):
            counts = versioned_merge_stream(
                stream_events(spark, sf_dir), st, ck,
                _daily_type_counts, _merge_daily_counts)
        w = Window.partitionBy("day").orderBy(
            F.col("n").desc(), F.col("event_type").asc())
        out = (
            counts.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("day", "rank", "event_type", "n"))
        # state files are about to be deleted; pin rows first
        return out.localCheckpoint()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(st, ignore_errors=True)


TRENDING_SQL = """
WITH counts AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT day, event_type, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY day
                                 ORDER BY n DESC, event_type ASC)
              AS BIGINT) AS rank
  FROM counts)
SELECT day, rank, event_type, n FROM ranked WHERE rank <= 3
"""


QUERIES["events_trending_streamed"] = events_trending_streamed
ORACLE_SQL["events_trending_streamed"] = TRENDING_SQL


def lineitem_price_discount_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between extended price and discount over
    the full lineitem table — the sanity stat a pricing team tracks.
    Integer-moment form: x = price cents, y = discount permille, the
    five moments are DECIMAL(38,0) sums (order-free, overflow-safe at
    petabyte row counts), and r is one fixed float expression (sqrt is
    correctly-rounded IEEE in both engines). One map-side-combinable
    aggregate; nothing else.
    """
    li = load_tables(spark, sf_dir)["lineitem"].select(
        F.floor(F.col("l_extendedprice") * 100).cast("decimal(38,0)")
        .alias("x"),
        F.floor(F.col("l_discount") * 1000).cast("decimal(38,0)")
        .alias("y"))
    m = li.agg(F.count("*").alias("n"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"),
               F.sum(F.col("y") * F.col("y")).alias("syy"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    r = ((n * sxy - sx * sy)
         / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    return m.select("n", r.alias("pearson_r"))


PEARSON_SQL = """
WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100) AS DECIMAL(38,0)) AS x,
         CAST(floor(l_discount * 1000) AS DECIMAL(38,0)) AS y
  FROM lineitem),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM v)
SELECT n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS pearson_r
FROM m
"""


QUERIES["lineitem_price_discount_corr"] = lineitem_price_discount_corr
ORACLE_SQL["lineitem_price_discount_corr"] = PEARSON_SQL


def orders_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix: spend quartile in the first
    half of the date range vs the second (0 = inactive that half) —
    the upgrade/churn census behind every retention deck.

    Quartiles come from ONE metric-stacked exscan ranking (the RFM
    pattern: group key = half, no ntile window); the matrix is 5x5.
    """
    from kmr_spark.operators.sort import ntile_from_rank, ranking_per_group

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey",
        F.unix_date(F.to_date("o_orderdate")).alias("d"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"))
    bounds = orders.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    halves = (
        orders.crossJoin(F.broadcast(bounds))
        .select("o_custkey", "cents",
                F.when(F.col("d") * 2 < F.col("d0") + F.col("d1"),
                       F.lit("h1")).otherwise(F.lit("h2")).alias("half"))
        .groupBy("half", "o_custkey")
        .agg(F.sum("cents").alias("spend")))
    caches: list[DataFrame] = []
    ranked = ranking_per_group(
        halves, ["half"], [F.col("spend").asc(), F.col("o_custkey").asc()],
        cache_registry=caches)
    q = ntile_from_rank(F.col("rank") + F.lit(1), F.col("n_group"), 4)
    seg = ranked.select("half", "o_custkey", q.alias("q"))
    s1 = seg.filter(F.col("half") == "h1").select(
        "o_custkey", F.col("q").alias("seg_h1"))
    s2 = seg.filter(F.col("half") == "h2").select(
        "o_custkey", F.col("q").alias("seg_h2"))
    out = (
        s1.join(s2, "o_custkey", "full_outer")
        .select(F.coalesce("seg_h1", F.lit(0)).alias("seg_h1"),
                F.coalesce("seg_h2", F.lit(0)).alias("seg_h2"))
        .groupBy("seg_h1", "seg_h2")
        .agg(F.count("*").alias("n_customers")))
    from kmr_spark.session import materialize_release

    return materialize_release(out, *caches)


MIGRATION_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM o),
halves AS (
  SELECT CASE WHEN d * 2 < (SELECT d0 + d1 FROM b)
              THEN 'h1' ELSE 'h2' END AS half,
         o_custkey, CAST(SUM(cents) AS BIGINT) AS spend
  FROM o GROUP BY 1, 2),
seg AS (
  SELECT half, o_custkey,
         CAST(NTILE(4) OVER (PARTITION BY half
                             ORDER BY spend ASC, o_custkey ASC)
              AS BIGINT) AS q
  FROM halves),
s1 AS (SELECT o_custkey, q AS seg_h1 FROM seg WHERE half = 'h1'),
s2 AS (SELECT o_custkey, q AS seg_h2 FROM seg WHERE half = 'h2')
SELECT coalesce(seg_h1, 0) AS seg_h1, coalesce(seg_h2, 0) AS seg_h2,
       COUNT(*) AS n_customers
FROM s1 FULL OUTER JOIN s2 USING (o_custkey)
GROUP BY 1, 2
"""


QUERIES["orders_customer_migration"] = orders_customer_migration
ORACLE_SQL["orders_customer_migration"] = MIGRATION_SQL


def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by lineitem revenue;
    A = parts covering the first 80% of cumulative revenue, B = next
    15%, C = the tail. Output: per class, part count and revenue share
    permille.

    The cumulative revenue uses the engine's DISTRIBUTED prefix scan
    (operators/reduce.scan_distributed — two-phase exscan, KMR's own
    MPI_Exscan shape, src/kmrmoreops.c:943): no single-partition
    cumulative window over the part table at any scale. Class
    boundaries compare integer cents prefix sums against integer
    thresholds of the grand total.
    """
    from kmr_spark.operators.reduce import scan_distributed

    li = load_tables(spark, sf_dir)["lineitem"]
    per_part = (li.groupBy("l_partkey")
                .agg(F.sum(F.floor(F.col("l_extendedprice") * 100)
                           .cast("long")).alias("rev")))
    scanned = scan_distributed(
        per_part, "rev", [F.col("rev").desc(), F.col("l_partkey").asc()])
    total = scanned.agg(F.sum("rev").alias("total"))
    # scan is EXCLUSIVE: a part belongs to A while the revenue BEFORE
    # it is under 80% of total, etc. — the standard ABC cut
    cls = (F.when(F.col("scan") * 100 < F.col("total") * 80, "A")
           .when(F.col("scan") * 100 < F.col("total") * 95, "B")
           .otherwise("C"))
    out = (
        scanned.crossJoin(F.broadcast(total))
        .groupBy(cls.alias("abc_class"))
        .agg(F.count("*").alias("n_parts"),
             F.sum("rev").alias("rev_cents"))
        .crossJoin(F.broadcast(total))
        .selectExpr("abc_class", "n_parts", "rev_cents",
                    "(1000 * rev_cents) DIV total AS rev_share_permille")
    )
    # scan_distributed already materialized + released its sort cache;
    # everything here is |classes|-sized and safely lazy
    return out


ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY l_partkey),
scanned AS (
  SELECT l_partkey, rev,
         CAST(coalesce(SUM(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS BIGINT) AS scan
  FROM per_part),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total FROM per_part),
cls AS (
  SELECT CASE WHEN scan * 100 < (SELECT total FROM t) * 80 THEN 'A'
              WHEN scan * 100 < (SELECT total FROM t) * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev
  FROM scanned)
SELECT abc_class, COUNT(*) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS rev_cents,
       (1000 * CAST(SUM(rev) AS BIGINT)) // (SELECT total FROM t)
         AS rev_share_permille
FROM cls GROUP BY abc_class
"""


QUERIES["parts_abc_classification"] = parts_abc_classification
ORACLE_SQL["parts_abc_classification"] = ABC_SQL


def orders_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix and spend by month: share permille of each
    o_orderpriority per month plus its cents revenue — the SLA-mix
    report (and the only consumer of o_orderpriority outside TPC-H).
    """
    orders = load_tables(spark, sf_dir)["orders"]
    monthly = (
        orders.groupBy(
            F.trunc(F.to_date("o_orderdate"), "month").alias("month"),
            "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
             .alias("rev_cents")))
    totals = monthly.groupBy("month").agg(
        F.sum("n_orders").alias("month_total"))
    return (
        monthly.join(totals, "month")
        .selectExpr("month", "o_orderpriority", "n_orders", "rev_cents",
                    "(1000 * n_orders) DIV month_total AS share_permille"))


PRIORITY_MIX_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1, 2),
t AS (SELECT month, CAST(SUM(n_orders) AS BIGINT) AS month_total
      FROM monthly GROUP BY month)
SELECT monthly.month, o_orderpriority, n_orders, rev_cents,
       (1000 * n_orders) // month_total AS share_permille
FROM monthly JOIN t USING (month)
"""


def orders_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time histogram: per-customer gaps between
    consecutive orders in log2-day buckets — the replenishment-cycle
    profile behind subscription/repeat forecasting. The lag window
    partitions per customer (high cardinality).
    """
    from kmr_spark.llm_ops.textstats import _floor_log2

    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey", F.unix_date(F.to_date("o_orderdate")).alias("d"),
        "o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (orders.select(
        (F.col("d") - F.lag("d").over(w)).alias("gap_days"))
        .filter(F.col("gap_days").isNotNull()))
    bucket = _floor_log2(F.col("gap_days") + F.lit(1)).cast("long")
    return (gaps.groupBy(bucket.alias("gap_bucket"))
            .agg(F.count("*").alias("n_gaps"),
                 F.min("gap_days").alias("min_days"),
                 F.max("gap_days").alias("max_days")))


def _interpurchase_sql() -> str:
    from kmr_spark.llm_ops.textstats import _sql_floor_log2

    return f"""
WITH o AS (
  SELECT o_custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         o_orderkey
  FROM orders),
g AS (
  SELECT d - LAG(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS gap_days
  FROM o)
SELECT CAST({_sql_floor_log2('(gap_days + 1)')} AS BIGINT) AS gap_bucket,
       COUNT(*) AS n_gaps, MIN(gap_days) AS min_days,
       MAX(gap_days) AS max_days
FROM g WHERE gap_days IS NOT NULL
GROUP BY gap_bucket
"""


INTERPURCHASE_SQL = _interpurchase_sql()

QUERIES["orders_priority_mix"] = orders_priority_mix
QUERIES["orders_interpurchase_gaps"] = orders_interpurchase_gaps
ORACLE_SQL["orders_priority_mix"] = PRIORITY_MIX_SQL
ORACLE_SQL["orders_interpurchase_gaps"] = INTERPURCHASE_SQL


import math as _math

#: Benford expected first-digit shares in permille (floor), computed
#: once in Python — the single source of truth both engines quote
_BENFORD_PERMILLE = {d: int(1000 * _math.log10(1 + 1 / d))
                     for d in range(1, 10)}


def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen over value cents: observed vs
    expected share permille and the integer deviation — the classic
    fabricated-numbers tripwire. First digit comes from the decimal
    string (no float log), expectations are precomputed literals.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    pos = ev.filter(F.col("cents") > 0)
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("long")
    counts = pos.groupBy(digit.alias("digit")).agg(
        F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    expected = None
    for d, p in _BENFORD_PERMILLE.items():
        expected = (F.when(F.col("digit") == d, F.lit(p)) if expected is None
                    else expected.when(F.col("digit") == d, F.lit(p)))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("digit", "n",
                F.expr("(1000 * n) DIV total").alias("observed_permille"),
                expected.cast("long").alias("benford_permille"))
        .withColumn("deviation_permille",
                    F.col("observed_permille") - F.col("benford_permille")))


def _benford_sql() -> str:
    whens = " ".join(f"WHEN digit = {d} THEN {p}"
                     for d, p in _BENFORD_PERMILLE.items())
    return f"""
WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
d AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
        AS digit FROM c WHERE cents > 0),
counts AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT digit, n,
       (1000 * n) // (SELECT total FROM t) AS observed_permille,
       CAST(CASE {whens} END AS BIGINT) AS benford_permille,
       (1000 * n) // (SELECT total FROM t)
         - CAST(CASE {whens} END AS BIGINT) AS deviation_permille
FROM counts
"""


BENFORD_SQL = _benford_sql()

QUERIES["events_value_benford"] = events_value_benford
ORACLE_SQL["events_value_benford"] = BENFORD_SQL


def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle: users grouped by first-seen day, purchase
    revenue tracked by day offset, CUMULATIVE within each cohort — the
    lifetime-value curve a growth team projects payback from. Revenue
    is exact integer cents; the cumulative window runs over the
    |cohorts| x |offsets| CELL table (calendar-bounded), never rows.

    Plan: first-day aggregate (|users|), one co-keyed join of per-(user,
    day) purchase cents onto it, a cell-level aggregate, then the
    running sum over cells.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"), "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    purch = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", "day").agg(F.sum("cents").alias("c")))
    cells = (
        purch.join(first, "user_id")
        .groupBy("d0", F.datediff("day", F.col("d0")).alias("off"))
        .agg(F.count("*").alias("n_user_days"), F.sum("c").alias("rev_cents")))
    w = (Window.partitionBy("d0").orderBy("off")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        cells.select(
            F.col("d0").alias("cohort_day"), F.col("off").alias("day_offset"),
            "n_user_days", "rev_cents",
            F.sum("rev_cents").over(w).alias("cum_rev_cents"))
        .orderBy("cohort_day", "day_offset")
    )


COHORT_LTV_SQL = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events),
f AS (SELECT user_id, MIN(day) AS d0 FROM e GROUP BY user_id),
p AS (
  SELECT user_id, day, CAST(SUM(cents) AS BIGINT) AS c
  FROM e WHERE event_type = 'purchase' GROUP BY user_id, day),
cells AS (
  SELECT f.d0, day - f.d0 AS off, COUNT(*) AS n_user_days,
         CAST(SUM(p.c) AS BIGINT) AS rev_cents
  FROM p JOIN f USING (user_id) GROUP BY 1, 2)
SELECT d0 AS cohort_day, CAST(off AS INTEGER) AS day_offset,
       n_user_days, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY d0 ORDER BY off
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM cells ORDER BY cohort_day, day_offset
"""


QUERIES["events_cohort_ltv_curve"] = events_cohort_ltv_curve
ORACLE_SQL["events_cohort_ltv_curve"] = COHORT_LTV_SQL


def parts_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration screen: per part, the Herfindahl–Hirschman
    index of supplier revenue shares in basis points — HHI = Σ s_i²
    with s_i the supplier's integer basis-point share (> 2500 ≈ a
    dominant supplier; the single-source-risk census a supply-chain
    team tracks). Integer cents -> integer bp shares -> integer sum of
    squares, so the oracle is exact; share rounding is the documented
    DIV-truncation convention both engines apply identically.

    Plan: one (part, supplier) revenue aggregate (map-side combine),
    a part-total aggregate joined back (co-keyed), then a |parts|-sized
    fold. Nothing after the first aggregate is lineitem-sized.
    """
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_partkey", "l_suppkey",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"))
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("cents").alias("rev"))
    tot = ps.groupBy("l_partkey").agg(F.sum("rev").alias("total"),
                                      F.count("*").alias("n_suppliers"))
    return (
        ps.join(tot, "l_partkey")
        .select("l_partkey", "n_suppliers",
                F.expr("(10000 * rev) DIV total").alias("bp"))
        .groupBy("l_partkey", "n_suppliers")
        .agg(F.sum(F.col("bp") * F.col("bp")).alias("hhi"))
        .select(F.col("l_partkey").alias("partkey"), "n_suppliers", "hhi")
        .orderBy("partkey")
    )


SUPPLIER_HHI_SQL = """
WITH li AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem),
ps AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(cents) AS BIGINT) AS rev
  FROM li GROUP BY 1, 2),
tot AS (
  SELECT l_partkey, CAST(SUM(rev) AS BIGINT) AS total,
         COUNT(*) AS n_suppliers
  FROM ps GROUP BY 1)
SELECT ps.l_partkey AS partkey, tot.n_suppliers,
       CAST(SUM(((10000 * ps.rev) // tot.total)
                * ((10000 * ps.rev) // tot.total)) AS BIGINT) AS hhi
FROM ps JOIN tot USING (l_partkey)
GROUP BY 1, 2 ORDER BY partkey
"""


QUERIES["parts_supplier_hhi"] = parts_supplier_hhi
ORACLE_SQL["parts_supplier_hhi"] = SUPPLIER_HHI_SQL


def orders_lines_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size profile: distribution of line-item counts per order
    (how many orders have 1, 2, ... lines) with each size's share of
    total revenue in cents — the fulfillment-shape census. Two keyed
    counts (order, then size); all-integer output."""
    li = load_tables(spark, sf_dir)["lineitem"]
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .alias("rev_cents"))
    return (
        per_order.groupBy("n_lines")
        .agg(F.count("*").alias("n_orders"),
             F.sum("rev_cents").alias("rev_cents"))
        .orderBy("n_lines")
    )


LINES_HIST_SQL = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY 1)
SELECT n_lines, COUNT(*) AS n_orders,
       CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
FROM per_order GROUP BY 1 ORDER BY 1
"""


QUERIES["orders_lines_histogram"] = orders_lines_histogram
ORACLE_SQL["orders_lines_histogram"] = LINES_HIST_SQL


def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-first-shipment lag SLA report per order priority:
    min / exact median (in 2x-day units, the histogram-midrank
    recipe) / p90 / max days between order date and the order's first
    lineitem shipment — the fulfillment dashboard that makes
    '1-URGENT' mean something. Exact percentiles, not sketches,
    because the grouped value domain (days, < ~200 distinct) makes
    the histogram route cheap at any scale.

    Plan: lineitem aggregated to first-ship per order (the one
    data-sized shuffle, co-locatable by orderkey bucketing), joined to
    orders, then a per-(priority, lag) histogram + cumulative-rank
    window over the tiny post-agg frame.
    """
    t = load_tables(spark, sf_dir)
    first_ship = t["lineitem"].groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship"))
    lags = (
        t["orders"]
        .join(first_ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderpriority",
                F.datediff("first_ship", F.to_date("o_orderdate"))
                .alias("lag"))
    )
    hist = lags.groupBy("o_orderpriority", "lag").agg(
        F.count("*").alias("c"))
    w = (Window.partitionBy("o_orderpriority").orderBy("lag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("o_orderpriority")
    ranked = (
        hist.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wt))
    )
    # median in 2x units: lo = first value with 2*cum >= n (rank
    # ceil(n/2)), hi = first with 2*cum > n (rank n//2 + 1); p90 =
    # first with 10*cum >= 9n (lower integer-rank convention)
    return (
        ranked.groupBy("o_orderpriority").agg(
            F.min("lag").alias("min_days"),
            F.max("lag").alias("max_days"),
            F.min(F.when(
                (F.col("cum") * 2 >= F.col("n")), F.col("lag")))
            .alias("med_lo"),
            F.min(F.when(
                (F.col("cum") * 2 > F.col("n")), F.col("lag")))
            .alias("med_hi"),
            F.min(F.when(
                F.col("cum") * 10 >= F.col("n") * 9, F.col("lag")))
            .alias("p90_days"),
            F.max("n").alias("n_orders"))
        .select("o_orderpriority", "n_orders", "min_days",
                (F.col("med_lo") + F.col("med_hi")).alias("median_2x"),
                "p90_days", "max_days")
        .orderBy("o_orderpriority")
    )


FULFILLMENT_SQL = """
WITH first_ship AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
  FROM lineitem GROUP BY l_orderkey),
lags AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE), first_ship) AS lag
  FROM orders JOIN first_ship ON o_orderkey = l_orderkey),
hist AS (
  SELECT o_orderpriority, lag, COUNT(*) AS c
  FROM lags GROUP BY 1, 2),
ranked AS (
  SELECT o_orderpriority, lag, c,
         CAST(SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY lag
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(SUM(c) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
  FROM hist)
SELECT o_orderpriority, MAX(n) AS n_orders, MIN(lag) AS min_days,
       MIN(CASE WHEN cum * 2 >= n THEN lag END)
       + MIN(CASE WHEN cum * 2 > n THEN lag END) AS median_2x,
       MIN(CASE WHEN cum * 10 >= n * 9 THEN lag END) AS p90_days,
       MAX(lag) AS max_days
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["orders_fulfillment_lag"] = orders_fulfillment_lag
ORACLE_SQL["orders_fulfillment_lag"] = FULFILLMENT_SQL


def parts_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification (the companion axis to
    parts_abc_classification's revenue ABC), at BRAND grain: per brand,
    the squared coefficient of variation of WEEKLY shipped quantity
    over the full horizon — zero-demand weeks included — bucketed
    X (cv <= 0.5, steady), Y (cv <= 1, variable), Z (lumpy). ABC tells
    you where the money is; XYZ tells you what is forecastable — the
    two together drive safety-stock policy. (Brand grain, not part:
    per-part weekly demand in this schema is a handful of events over
    ~470 weeks — everything classifies Z and the query says nothing;
    the grain an analyst actually forecasts at is the one with a dense
    series.)

    Exactness: with S = sum(q), Q = sum(q^2) over observed weeks and n
    = GLOBAL week count (implicit zeros), cv^2 = (n*Q - S^2)/S^2, so
    the class tests are integer comparisons (4*(n*Q - S^2) <= S^2 for
    X) and cv2_permille = (1000*(n*Q - S^2)) DIV S^2 — no float, no
    densification of zero weeks.

    Scale: one (brand, week)-keyed aggregation (the brand dimension
    rides a broadcast join), one brand-keyed rollup, both map-side
    combinable; the week-count scalar is a broadcast.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_partkey", "l_quantity",
        (F.datediff(F.to_date("l_shipdate"),
                    F.lit("1992-01-01").cast("date"))
         / 7).cast("long").alias("wk"))
    part = t["part"].select("p_partkey", "p_brand")
    li = li.join(F.broadcast(part),
                 F.col("l_partkey") == F.col("p_partkey"))
    weeks = li.agg((F.max("wk") - F.min("wk") + 1).alias("n_weeks"))
    weekly = (
        li.groupBy("p_brand", "wk")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    per_brand = (
        weekly.groupBy("p_brand")
        .agg(F.sum("q").alias("s"),
             F.sum(F.col("q") * F.col("q")).alias("qq"),
             F.count("*").alias("n_active_weeks"))
        .crossJoin(F.broadcast(weeks))
    )
    var_num = F.col("n_weeks") * F.col("qq") - F.col("s") * F.col("s")
    return (
        per_brand.select(
            "p_brand", "s", "n_active_weeks", "n_weeks",
            F.expr("(1000 * (n_weeks * qq - s * s)) DIV (s * s)")
            .alias("cv2_permille"),
            F.when(4 * var_num <= F.col("s") * F.col("s"), "X")
            .when(var_num <= F.col("s") * F.col("s"), "Y")
            .otherwise("Z").alias("xyz_class"))
        .orderBy("p_brand")
    )


XYZ_SQL = """
WITH li AS (
  SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS q,
         date_diff('day', DATE '1992-01-01', CAST(l.l_shipdate AS DATE))
           // 7 AS wk
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
weeks AS (SELECT MAX(wk) - MIN(wk) + 1 AS n_weeks FROM li),
weekly AS (
  SELECT p_brand, wk, CAST(SUM(q) AS BIGINT) AS q
  FROM li GROUP BY 1, 2),
per_brand AS (
  SELECT p_brand, CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS qq,
         COUNT(*) AS n_active_weeks
  FROM weekly GROUP BY 1)
SELECT p_brand, s, n_active_weeks, w.n_weeks,
       (1000 * (w.n_weeks * qq - s * s)) // (s * s) AS cv2_permille,
       CASE WHEN 4 * (w.n_weeks * qq - s * s) <= s * s THEN 'X'
            WHEN w.n_weeks * qq - s * s <= s * s THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM per_brand CROSS JOIN weeks w
ORDER BY p_brand
"""

QUERIES["parts_xyz_classification"] = parts_xyz_classification
ORACLE_SQL["parts_xyz_classification"] = XYZ_SQL


WILSON_Z = 1.959963984540054  # two-sided 95% normal quantile


def lineitem_returns_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate per brand with a WILSON 95% score interval — the
    binomial CI that behaves at small n and extreme rates (a plain
    normal interval goes negative); the ranked-list-with-uncertainty
    readout a quality team actually publishes, where a brand is only
    flagged when its LOWER bound clears the overall rate.

    Exactness: returns/total are BIGINT counts; rate_permille is an
    integer DIV; the Wilson bounds are each one fixed expression tree
    over (r, n) with z embedded as a shared literal (sqrt is correctly
    rounded, hence portable). One broadcast-dim join + one
    map-side-combinable aggregation.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_partkey", "l_returnflag")
    part = t["part"].select("p_partkey", "p_brand")
    per = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"),
             F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("r"))
    )
    z2 = WILSON_Z * WILSON_Z
    dd = lambda c: F.col(c).cast("double")
    center = (dd("r") + F.lit(z2 / 2.0)) / (dd("n") + F.lit(z2))
    half = (F.lit(WILSON_Z)
            * F.sqrt(dd("r") * (dd("n") - dd("r")) / dd("n")
                     + F.lit(z2 / 4.0))
            / (dd("n") + F.lit(z2)))
    return (
        per.select(
            "p_brand", "n", "r",
            F.expr("(1000 * r) DIV n").alias("rate_permille"),
            (center - half).alias("wilson_lo"),
            (center + half).alias("wilson_hi"))
        .orderBy("p_brand")
    )


def _wilson_sql() -> str:
    z = repr(WILSON_Z)
    z2 = f"(CAST('{z}' AS DOUBLE) * CAST('{z}' AS DOUBLE))"
    rd, nd = "CAST(r AS DOUBLE)", "CAST(n AS DOUBLE)"
    center = f"({rd} + {z2} / 2.0) / ({nd} + {z2})"
    half = (f"CAST('{z}' AS DOUBLE) * sqrt({rd} * ({nd} - {rd}) / {nd}"
            f" + {z2} / 4.0) / ({nd} + {z2})")
    return f"""
WITH per AS (
  SELECT p.p_brand, COUNT(*) AS n,
         COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand)
SELECT p_brand, n, r,
       (1000 * r) // n AS rate_permille,
       {center} - {half} AS wilson_lo,
       {center} + {half} AS wilson_hi
FROM per ORDER BY p_brand
"""


WILSON_SQL = _wilson_sql()

QUERIES["lineitem_returns_wilson"] = lineitem_returns_wilson
ORACLE_SQL["lineitem_returns_wilson"] = WILSON_SQL


DORMANT_DAYS = 180


def orders_dormancy_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer WIN-BACK census: per order month, how many orders were
    placed by a customer whose PREVIOUS order was >= DORMANT_DAYS
    older (a reactivation), vs continuing (< DORMANT_DAYS) vs
    first-ever — the lifecycle flow behind churn/win-back programs
    (events_user_lifecycle's monthly cousin on the orders fact).
    reactivation share in exact permille of the month's orders.

    Scale: ONE window pass partitioned by o_custkey (high-cardinality
    key — each customer's orders are a handful of rows, so the
    partitioned sort is embarrassingly parallel, nothing funnels), one
    month-keyed rollup. All integers.
    """
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_custkey", F.to_date("o_orderdate").alias("d"))
    w = Window.partitionBy("o_custkey").orderBy("d", "o_custkey")
    lagd = F.lag("d").over(w)
    classed = o.select(
        F.date_format("d", "yyyy-MM").alias("month"),
        F.when(lagd.isNull(), "first")
        .when(F.datediff(F.col("d"), lagd) >= DORMANT_DAYS, "reactivated")
        .otherwise("continuing").alias("kind"))
    return (
        classed.groupBy("month")
        .agg(F.count("*").alias("n_orders"),
             F.count(F.when(F.col("kind") == "first", 1)).alias("n_first"),
             F.count(F.when(F.col("kind") == "reactivated", 1))
             .alias("n_reactivated"),
             F.count(F.when(F.col("kind") == "continuing", 1))
             .alias("n_continuing"))
        .select("month", "n_orders", "n_first", "n_reactivated",
                "n_continuing",
                F.expr("(1000 * n_reactivated) DIV n_orders")
                .alias("reactivation_permille"))
        .orderBy("month")
    )


DORMANCY_SQL = f"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
classed AS (
  SELECT strftime(d, '%Y-%m') AS month,
         CASE WHEN lag(d) OVER (PARTITION BY o_custkey
                                ORDER BY d, o_custkey) IS NULL
              THEN 'first'
              WHEN date_diff('day', lag(d) OVER (PARTITION BY o_custkey
                                                 ORDER BY d, o_custkey), d)
                   >= {DORMANT_DAYS}
              THEN 'reactivated' ELSE 'continuing' END AS kind
  FROM o)
SELECT month, COUNT(*) AS n_orders,
       COUNT(CASE WHEN kind = 'first' THEN 1 END) AS n_first,
       COUNT(CASE WHEN kind = 'reactivated' THEN 1 END) AS n_reactivated,
       COUNT(CASE WHEN kind = 'continuing' THEN 1 END) AS n_continuing,
       (1000 * COUNT(CASE WHEN kind = 'reactivated' THEN 1 END))
         // COUNT(*) AS reactivation_permille
FROM classed GROUP BY month ORDER BY month
"""

QUERIES["orders_dormancy_reactivation"] = orders_dormancy_reactivation
ORACLE_SQL["orders_dormancy_reactivation"] = DORMANCY_SQL


ATTRIB_WINDOWS_S = (900, 3600, 21600, 86400)  # 15m / 1h / 6h / 24h


def events_attrib_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window SENSITIVITY sweep: what fraction of purchases
    gets click-attributed at each candidate window (15m/1h/6h/24h)?
    The tuning companion to events_asof_click_attrib's fixed 1h, the
    same discipline as events_session_gap_sensitivity: the expensive
    part — the as-of join to the most recent prior click — runs ONCE,
    and every window is a comparison against the same lag column, so
    sweeping 4 windows costs one aggregate more than sweeping none.

    Output per window: attributed count + exact permille share. The
    curve's elbow is the defensible window choice; a share still
    climbing at 24h means click attribution is mostly coincidence.
    """
    from kmr_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "us")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "us", F.col("us").alias("c_us"))
    joined = asof_join(purchases, clicks, on="us", by="user_id",
                       right_cols=["c_us"], left_key="event_id")
    gap = F.when(F.col("asof_c_us").isNotNull(),
                 F.col("us") - F.col("asof_c_us"))
    agg = joined.select(gap.alias("gap_us")).agg(
        F.count("*").alias("n_purchases"),
        *[F.count(F.when(F.col("gap_us") <= w * 1_000_000, 1))
          .alias(f"a{w}") for w in ATTRIB_WINDOWS_S])
    # per-window rows come out of the single 1-row aggregate via a
    # literal struct-array explode (the events_spectral_daily recipe) —
    # the previous union-of-branches form re-ran the whole as-of join
    # pipeline once per window (4 extra events scans for 4 windows)
    rows = F.array(*[
        F.struct(
            F.lit(w).cast("long").alias("window_s"),
            F.col("n_purchases").alias("n_purchases"),
            F.col(f"a{w}").alias("n_attributed"),
            F.expr(f"(1000 * a{w}) DIV n_purchases")
            .alias("attributed_permille"))
        for w in ATTRIB_WINDOWS_S])
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.window_s", "r.n_purchases", "r.n_attributed",
                "r.attributed_permille")
        .orderBy("window_s"))


def _attrib_sweep_sql() -> str:
    a_cols = ",\n         ".join(
        f"COUNT(CASE WHEN gap_us <= {w * 1_000_000} THEN 1 END) AS a{w}"
        for w in ATTRIB_WINDOWS_S)
    parts = "\nUNION ALL\n".join(
        f"SELECT CAST({w} AS BIGINT) AS window_s, n_purchases,\n"
        f"       a{w} AS n_attributed,\n"
        f"       (1000 * a{w}) // n_purchases AS attributed_permille\n"
        f"FROM agg" for w in ATTRIB_WINDOWS_S)
    return f"""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events),
p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, us AS c_us FROM e WHERE event_type = 'click'),
joined AS (
  SELECT p.event_id, CASE WHEN c.c_us IS NOT NULL
                          THEN p.us - c.c_us END AS gap_us
  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.c_us),
agg AS (
  SELECT COUNT(*) AS n_purchases,
         {a_cols}
  FROM joined)
{parts}
ORDER BY window_s
"""


ATTRIB_SWEEP_SQL = _attrib_sweep_sql()

QUERIES["events_attrib_window_sweep"] = events_attrib_window_sweep
ORACLE_SQL["events_attrib_window_sweep"] = ATTRIB_SWEEP_SQL
