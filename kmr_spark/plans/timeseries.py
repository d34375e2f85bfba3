"""Time-series analytics over the events table: resample/gap-fill,
ordered funnels, cohort retention, and z-score anomaly flags.

The core shapes every event-analytics engine must express:

- resample/gap-fill: a dense hourly spine per event_type with zero-fill
  for empty hours and forward-fill of the last observed aggregate — the
  hypertable-rollup shape (regularized series feed models/dashboards).
- ordered funnel: view -> click -> purchase with strict event-time
  ordering per user — the stepwise min-timestamp chain, expressed as
  keyed aggregates + joins (no per-user UDF, no collect).

Scale notes: the spine is |types| x |hours| (tiny, broadcastable); the
fill join is one shuffle keyed (type, hour). Funnel steps are three
keyed aggregates over progressively smaller user sets; each join is
hash-partitioned on user_id — co-partitioned at scale if events are
bucketed by user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables


def events_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event_type: count + decimal sum with
    zero-fill, and forward-filled last non-empty hourly sum."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"))
    )
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"))
    spine = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour_ts"))
    w = (Window.partitionBy("event_type").orderBy("hour_ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        spine.join(hourly, ["event_type", "hour_ts"], "left")
        .select(
            "event_type", "hour_ts",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce(F.col("sum_dec"), F.lit(0).cast("decimal(18,2)"))
            .cast("double").alias("sum_value"),
            F.last("sum_dec", ignorenulls=True).over(w)
            .cast("double").alias("ffill_sum"))
        .orderBy("event_type", "hour_ts")
    )


RESAMPLE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
bounds AS (
  SELECT event_type, date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events GROUP BY event_type),
spine AS (
  SELECT event_type,
         unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds)
SELECT s.event_type, s.hour_ts,
       COALESCE(h.n, 0) AS n,
       CAST(COALESCE(h.sum_dec, 0) AS DOUBLE) AS sum_value,
       CAST(LAST_VALUE(h.sum_dec IGNORE NULLS) OVER (
              PARTITION BY s.event_type ORDER BY s.hour_ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS ffill_sum
FROM spine s LEFT JOIN hourly h
  ON h.event_type = s.event_type AND h.hour_ts = s.hour_ts
ORDER BY s.event_type, s.hour_ts
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_steps(ev: DataFrame, persist: bool = False):
    """Per-user first-step timestamps (t0, t1, t2) of the strict
    view -> click -> purchase chain.

    ``persist=True`` caches v and c (per-user frames, bounded by
    |users|): callers that read a step frame both inside the chain and
    in a separate branch (count/join) otherwise re-run the upstream
    events scans once per reference — the caller must release the
    caches via ``materialize_release(out, v, c)``."""
    v = (ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
         .groupBy("user_id").agg(F.min("ts").alias("t0")))
    if persist:
        v = v.persist()
    c = (ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t0"))
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    if persist:
        c = c.persist()
    p = (ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    return v, c, p


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: users whose first 'view'
    precedes a 'click' that precedes a 'purchase'. One row:
    (n_users, n_view, n_view_click, n_full_funnel)."""
    from kmr_spark.session import materialize_release

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts")
    v, c, p = _funnel_steps(ev, persist=True)
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    out = (
        n_users
        .crossJoin(v.agg(F.count("*").alias("n_view")))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )
    return materialize_release(out, v, c)


FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted on each subsequent active day offset — the canonical
    product-analytics rollup. Two keyed aggregates + one user-keyed
    join; the matrix itself is |cohorts| x |offsets| (tiny at any
    scale), so nothing after the per-user aggregate is corpus-sized."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"))
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_day",
                 F.datediff("day", "cohort_day").cast("long").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


RETENTION_SQL = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, day FROM ev)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_day, CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
ORDER BY cohort_day, day_offset
"""


Z_FLAG = 2.0


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-volume anomaly detection per event_type: z-score of each
    hour's count against the type's own distribution, flagging |z| >
    Z_FLAG. The moments come from INTEGER sums (n, S=Σc, Q=Σc² — all
    exact in int64), and variance uses the single fixed form
    (n·Q − S²)/n², so the float part is one division + sqrt computed
    identically in both engines — a monitoring operator whose flags are
    oracle-exact, not tolerance-compared.

    Scale: hourly counts are a map-side-combinable aggregate; the
    per-type moment fold is |types| rows and broadcasts back. Nothing
    after the first aggregate is corpus-sized.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count("*").alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("nh"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"))
    mean = F.col("s") / F.col("nh")
    var = (F.col("nh") * F.col("q") - F.col("s") * F.col("s")) \
        / (F.col("nh") * F.col("nh"))
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select("event_type", "hour_ts", "n", z.alias("z"),
                (F.abs(z) > F.lit(Z_FLAG)).alias("is_anomaly"))
        .orderBy("event_type", "hour_ts")
    )


ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
stats AS (
  SELECT event_type, COUNT(*) AS nh, SUM(n) AS s, SUM(n * n) AS q
  FROM hourly GROUP BY event_type),
z AS (
  SELECT h.event_type, h.hour_ts, h.n,
         -- numerators stay exact integers (like Spark's long
         -- arithmetic); the ONLY float ops are the final divisions
         -- and sqrt, so z is bit-identical across engines
         (h.n - CAST(st.s AS DOUBLE) / CAST(st.nh AS DOUBLE))
           / sqrt(CAST(st.nh * st.q - st.s * st.s AS DOUBLE)
                  / CAST(st.nh * st.nh AS DOUBLE)) AS z
  FROM hourly h JOIN stats st ON h.event_type = st.event_type)
SELECT event_type, hour_ts, n, z, abs(z) > {Z_FLAG} AS is_anomaly
FROM z ORDER BY event_type, hour_ts
"""


def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for fully-funneled users: whole seconds from the
    first view to the first qualifying purchase. Lags are INTEGER
    second differences, so min/max/sum are exact and the mean is one
    exact division — portable without tolerance. One summary row."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts")
    v, _, p = _funnel_steps(ev)
    lag = (p.join(v, "user_id")
           .select((F.unix_timestamp("t2") - F.unix_timestamp("t0"))
                   .alias("lag_s")))
    return lag.agg(
        F.count("*").alias("n_converted"),
        F.min("lag_s").alias("min_s"),
        F.max("lag_s").alias("max_s"),
        (F.sum("lag_s") / F.count("*")).alias("avg_s"))


CONVERSION_LAG_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id),
lag AS (
  SELECT CAST(floor(epoch(p.t2)) - floor(epoch(v.t0)) AS BIGINT) AS lag_s
  FROM p JOIN v ON p.user_id = v.user_id)
SELECT COUNT(*) AS n_converted,
       MIN(lag_s) AS min_s, MAX(lag_s) AS max_s,
       CAST(SUM(lag_s) AS DOUBLE) / COUNT(*) AS avg_s
FROM lag
"""


def events_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event dwell times: whole seconds between each user's
    consecutive events (lag window per user), summarized per event_type
    of the LATER event — the engagement-cadence stat sessionization
    thresholds are tuned from. Integer-second gaps keep min/max/sum
    exact; the mean is one exact division."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select("event_type",
                (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
                .alias("gap_s"))
    )
    return (
        gaps.groupBy("event_type")
        .agg(F.count("*").alias("n_gaps"),
             F.min("gap_s").alias("min_s"),
             F.max("gap_s").alias("max_s"),
             (F.sum("gap_s") / F.count("*")).alias("avg_s"))
        .orderBy("event_type")
    )


DWELL_SQL = """
WITH gaps AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) - floor(epoch(LAG(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
           AS gap_s
  FROM events),
g2 AS (SELECT * FROM gaps WHERE gap_s IS NOT NULL)
SELECT event_type, COUNT(*) AS n_gaps,
       MIN(gap_s) AS min_s, MAX(gap_s) AS max_s,
       CAST(SUM(gap_s) AS DOUBLE) / COUNT(*) AS avg_s
FROM g2 GROUP BY event_type ORDER BY event_type
"""


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of value per user under last-observation-
    carried-forward weighting (the TimescaleDB ``time_weight('LOCF')``
    shape): each observation holds until the next one, so its weight is
    the gap to the successor; the final observation carries no weight.
    Users with a single event have no spanned time and are skipped.

    Exactness: values quantized to integer cents, weights are integer
    microsecond gaps, the numerator is a DECIMAL(38,0) sum (order-free,
    overflow-safe at petabyte scale), and the average is one float
    division — identical in both engines.

    Plan: one per-user window pass (lead) sharing its Exchange with the
    keyed aggregate that follows; output is |users|-sized.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 100).alias("c"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.withColumn("nxt", F.lead("us").over(w)).filter(
        F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("us")
    return (
        gaps.groupBy("user_id")
        .agg(F.count("*").alias("n_gaps"),
             F.sum(dt).alias("span_us"),
             F.sum(F.col("c").cast("decimal(38,0)") * dt).alias("num"))
        .select("user_id", "n_gaps", "span_us",
                (F.col("num").cast("double") / F.col("span_us").cast("double"))
                .alias("twa_cents"))
        .orderBy("user_id")
    )


TWA_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) AS us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS nxt,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events)
SELECT user_id,
       COUNT(*) AS n_gaps,
       CAST(SUM(nxt - us) AS BIGINT) AS span_us,
       CAST(SUM(CAST(c AS HUGEINT) * (nxt - us)) AS DOUBLE)
         / CAST(SUM(nxt - us) AS DOUBLE) AS twa_cents
FROM g WHERE nxt IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""



def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecasting baseline: predict each (event_type,
    hour-of-day) slot's hourly volume as the slot's historical mean,
    and report the fit per slot — n observed hours, the prediction,
    and the mean absolute error of the baseline over history. The
    sanity yardstick every real forecasting pipeline must beat first.

    Exactness: predictions are exact integer ratios (sum/n as one
    double division); MAE compares integer counts to that double in a
    single fixed expression — no float accumulation across rows except
    the final |err| sum, which is a sum of values that are all exact
    (count - s/n) doubles... so the MAE numerator is made order-free by
    summing |n*count - s| as INTEGERS and dividing by n*n_hours once.

    Plan: hourly counts (map-side combinable) -> slot aggregate ->
    broadcast-join back for residuals -> slot rollup. Nothing after
    the first aggregate is corpus-sized.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy("event_type",
                   F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count("*").alias("n"))
        .withColumn("hod", F.hour("hour_ts"))
    )
    slots = hourly.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_hours"),
        F.sum("n").alias("s"))
    j = hourly.join(F.broadcast(slots), ["event_type", "hod"])
    # |n*count - s| is exact int64; MAE = sum(...) / (n_hours * n_hours_total)
    abs_resid = F.abs(F.col("n") * F.col("n_hours") - F.col("s"))
    return (
        j.groupBy("event_type", "hod")
        .agg(F.first("n_hours").alias("n_hours"),
             (F.first("s").cast("double") / F.first("n_hours"))
             .alias("predicted"),
             (F.sum(abs_resid).cast("double")
              / (F.first("n_hours").cast("double")
                 * F.first("n_hours").cast("double"))).alias("mae"))
        .orderBy("event_type", "hod")
    )


SEASONAL_BASELINE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
hod AS (
  SELECT event_type, EXTRACT(hour FROM hour_ts) AS hod, n FROM hourly),
slots AS (
  SELECT event_type, hod, COUNT(*) AS n_hours, SUM(n) AS s
  FROM hod GROUP BY event_type, hod)
SELECT h.event_type, CAST(h.hod AS INTEGER) AS hod,
       CAST(sl.n_hours AS BIGINT) AS n_hours,
       CAST(sl.s AS DOUBLE) / sl.n_hours AS predicted,
       CAST(SUM(abs(h.n * sl.n_hours - sl.s)) AS DOUBLE)
         / (CAST(sl.n_hours AS DOUBLE) * CAST(sl.n_hours AS DOUBLE)) AS mae
FROM hod h JOIN slots sl USING (event_type, hod)
GROUP BY h.event_type, h.hod, sl.n_hours, sl.s
ORDER BY h.event_type, hod
"""


CUSUM_H_SIGMA = 4.0  # flag threshold in per-type volume sigmas


def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection over hourly volumes per event_type — the
    sequential changepoint monitor (Page 1954) that catches a sustained
    LEVEL SHIFT long before any single hour looks anomalous (the
    z-score flags, events_anomaly_zscore, miss slow drifts by design).

    The recursive CUSUM S_t = max(0, S_{t-1} + x_t - mean) is rewritten
    window-free-of-recursion: with D_t = n*x_t - total (integer,
    mean-centered scaled by n), P_t = cumsum(D), the reset-at-zero
    statistic is exactly S_t = P_t - min_{j<=t} P_j — a prefix sum and
    a running min, both plain windows over INTEGERS, so the statistic
    is exact in both engines. The flag compares S_t against
    CUSUM_H_SIGMA sigmas (sigma from integer moments, one fixed float
    expression).

    Plan: hourly counts (map-side combine) -> per-type windows over
    |hours| rows -> broadcast moments join. Nothing after the first
    aggregate is corpus-sized.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.count("*").alias("x"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("nh"),
        F.sum("x").alias("tot"),
        F.sum(F.col("x") * F.col("x")).alias("q"))
    d = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type", "hour_ts", "x", "nh", "tot", "q",
        (F.col("nh") * F.col("x") - F.col("tot")).alias("dd"))
    w = (Window.partitionBy("event_type").orderBy("hour_ts")
         .rowsBetween(Window.unboundedPreceding, 0))
    p = d.withColumn("pp", F.sum("dd").over(w))
    # the running min must include the EMPTY prefix (P_0 = 0), or an
    # initially-positive drift would be measured from its own first
    # prefix instead of zero — that is what makes this equal to the
    # textbook recursion max(0, S_{t-1} + d_t)
    scored = p.withColumn(
        "s", F.col("pp") - F.least(F.min("pp").over(w), F.lit(0)))
    sigma = F.sqrt(
        (F.col("nh").cast("double") * F.col("q").cast("double")
         - F.col("tot").cast("double") * F.col("tot").cast("double"))
        / (F.col("nh").cast("double") * F.col("nh").cast("double")))
    # S is in n*count units; the threshold scales by n as well
    thresh = F.lit(CUSUM_H_SIGMA) * sigma * F.col("nh").cast("double")
    return (
        scored.select(
            "event_type", "hour_ts", "x",
            F.col("s").alias("cusum_scaled"),
            (F.col("s").cast("double") > thresh).alias("drift_flag"))
    )


CUSUM_SQL = f"""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, COUNT(*) AS nh, SUM(x) AS tot, SUM(x * x) AS q
  FROM hourly GROUP BY event_type),
d AS (
  SELECT h.event_type, h.hour_ts, h.x, s.nh, s.tot, s.q,
         s.nh * h.x - s.tot AS dd
  FROM hourly h JOIN stats s USING (event_type)),
p AS (
  SELECT *, SUM(dd) OVER wnd AS pp
  FROM d
  WINDOW wnd AS (PARTITION BY event_type ORDER BY hour_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
scored AS (
  SELECT *, pp - least(MIN(pp) OVER wnd, 0) AS s
  FROM p
  WINDOW wnd AS (PARTITION BY event_type ORDER BY hour_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, hour_ts, x,
       CAST(s AS BIGINT) AS cusum_scaled,
       CAST(s AS DOUBLE) >
         {CUSUM_H_SIGMA} * sqrt((CAST(nh AS DOUBLE) * CAST(q AS DOUBLE)
              - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
             / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE)))
           * CAST(nh AS DOUBLE) AS drift_flag
FROM scored
ORDER BY event_type, hour_ts
"""


WAU_HORIZON = 6  # rolling window = day and the 6 days before it


def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling active users (WAU) per calendar day.

    The naive form — COUNT(DISTINCT user_id) over a 7-day sliding
    window — re-deduplicates the user set for every day, and a windowed
    distinct over raw rows is O(days x actives) state.  The scale-correct
    rewrite never runs a windowed distinct:

    1. reduce to distinct (user_id, day) pairs (map-side combinable);
    2. per user, merge activity days into coverage islands via the
       lag/cumsum islands pattern (a day covers [d, d+6]; days <= 6
       apart fuse into one interval) — same shape as sessionize;
    3. sweep-line: +1 at island start, -1 after island end, aggregated
       to per-day deltas, prefix-summed over the dense day spine.

    Per-user work is |active days|, the sweep input is O(islands), and
    the only ordered global pass runs over the |calendar days| spine
    (bounded by the time range, not the corpus — precedent:
    events_concurrent_sessions).  All-integer; oracle states the naive
    COUNT DISTINCT semantics directly.
    """
    ev = load_tables(spark, sf_dir)["events"]
    ud = (ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE'1970-01-01')").alias("di"))
        .distinct())
    w = Window.partitionBy("user_id").orderBy("di")
    islands = (
        ud.withColumn(
            "new_island",
            F.when(F.col("di") - F.lag("di").over(w) > WAU_HORIZON, 1)
            .otherwise(0))
        .withColumn("island", F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(F.min("di").alias("start"),
             (F.max("di") + WAU_HORIZON).alias("end")))
    deltas = (
        islands.select(F.col("start").alias("di"), F.lit(1).alias("delta"))
        .unionAll(islands.select((F.col("end") + 1).alias("di"),
                                 F.lit(-1).alias("delta")))
        .groupBy("di").agg(F.sum("delta").alias("delta")))
    bounds = ud.agg(F.min("di").alias("lo"), F.max("di").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("di"))
    return (
        spine.join(deltas, "di", "left")
        .withColumn("wau", F.sum(F.coalesce("delta", F.lit(0))).over(
            Window.orderBy("di")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(
            F.expr("date_add(DATE'1970-01-01', CAST(di AS INT))")
            .alias("day"),
            F.col("wau").cast("long").alias("wau"))
        .orderBy("day")
    )


WAU_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(ts AS DATE) - DATE '1970-01-01' AS di
  FROM events),
bounds AS (SELECT MIN(di) AS lo, MAX(di) AS hi FROM ud),
grid AS (SELECT UNNEST(range(lo, hi + 1)) AS di FROM bounds)
SELECT DATE '1970-01-01' + CAST(g.di AS INT) AS day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
FROM grid g LEFT JOIN ud u
  ON u.di BETWEEN g.di - {WAU_HORIZON} AND g.di
GROUP BY g.di ORDER BY day
"""


def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-day activity streaks (gaps-and-islands):
    total active days, number of streaks, and the longest streak.

    The di − row_number() trick groups consecutive days into one
    constant key, so streaks fall out of two keyed aggregations — no
    self-join, no per-user UDF.  Both windows and both aggregations
    partition by user_id (bucketing events by user makes them
    co-partitioned at scale); all arithmetic is integer day indices.
    """
    ev = load_tables(spark, sf_dir)["events"]
    ud = (ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE'1970-01-01')").alias("di"))
        .distinct())
    w = Window.partitionBy("user_id").orderBy("di")
    streaks = (
        ud.withColumn("grp", F.col("di") - F.row_number().over(w))
        .groupBy("user_id", "grp").agg(F.count("*").alias("len")))
    return (
        streaks.groupBy("user_id")
        .agg(F.sum("len").alias("active_days"),
             F.count("*").alias("n_streaks"),
             F.max("len").alias("longest_streak"))
        .orderBy("user_id")
    )


USER_STREAKS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(ts AS DATE) - DATE '1970-01-01' AS di
  FROM events),
g AS (
  SELECT user_id, di,
         di - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY di) AS grp
  FROM ud),
s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak
FROM s GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "events_resample_1h": events_resample_1h,
    "events_funnel": events_funnel,
    "events_retention_cohorts": events_retention_cohorts,
    "events_anomaly_zscore": events_anomaly_zscore,
    "events_conversion_lag": events_conversion_lag,
    "events_dwell_time": events_dwell_time,
    "events_time_weighted_avg": events_time_weighted_avg,
    "events_seasonal_baseline": events_seasonal_baseline,
    "events_cusum_drift": events_cusum_drift,
    "events_rolling_wau": events_rolling_wau,
    "events_user_streaks": events_user_streaks,
}
ORACLE_SQL = {
    "events_resample_1h": RESAMPLE_SQL,
    "events_funnel": FUNNEL_SQL,
    "events_retention_cohorts": RETENTION_SQL,
    "events_anomaly_zscore": ANOMALY_SQL,
    "events_conversion_lag": CONVERSION_LAG_SQL,
    "events_dwell_time": DWELL_SQL,
    "events_time_weighted_avg": TWA_SQL,
    "events_seasonal_baseline": SEASONAL_BASELINE_SQL,
    "events_cusum_drift": CUSUM_SQL,
    "events_rolling_wau": WAU_SQL,
    "events_user_streaks": USER_STREAKS_SQL,
}


def events_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution: per event_type (of the later
    event), log2-bucketed histogram of per-user consecutive gaps in
    seconds — the arrival-process profile behind session-timeout and
    watermark tuning.

    The lag window partitions by user_id (high cardinality — spreads
    across the cluster); the histogram is a |types|x|buckets| count
    table. All-integer arithmetic, exact oracle.
    """
    from kmr_spark.llm_ops.textstats import _floor_log2

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"),
        "event_id")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    # integer DIV, not float-divide-then-cast: DuckDB CAST(double AS
    # BIGINT) rounds to nearest while Spark's cast truncates
    gap_s = F.expr("(us - lag(us) OVER (PARTITION BY user_id"
                   " ORDER BY us, event_id)) DIV 1000000")
    gaps = ev.select("event_type", gap_s.alias("gap_s")).filter(
        F.col("gap_s").isNotNull())
    bucket = _floor_log2(F.col("gap_s") + F.lit(1)).cast("long")
    return (
        gaps.select("event_type", bucket.alias("gap_bucket"), "gap_s")
        .groupBy("event_type", "gap_bucket")
        .agg(F.count("*").alias("n_gaps"),
             F.min("gap_s").alias("min_gap_s"),
             F.max("gap_s").alias("max_gap_s"))
    )


def _gap_hist_sql() -> str:
    from kmr_spark.llm_ops.textstats import _sql_floor_log2

    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
  FROM events),
g AS (
  SELECT event_type,
         (us - LAG(us) OVER (PARTITION BY user_id
                             ORDER BY us, event_id)) // 1000000 AS gap_s
  FROM e)
SELECT event_type,
       CAST({_sql_floor_log2('(gap_s + 1)')} AS BIGINT) AS gap_bucket,
       COUNT(*) AS n_gaps, MIN(gap_s) AS min_gap_s,
       MAX(gap_s) AS max_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY event_type, gap_bucket
"""


GAP_HIST_SQL = _gap_hist_sql()

PEAK_WINDOW_US = 60_000_000  # 60s sliding window


def events_peak_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak per-user burst rate: for each user, the max number of their
    events inside any sliding 60s window; reported as a histogram
    (peak -> how many users) so output stays bounded. The range window
    partitions by user_id — per-user event counts are bounded, and the
    RANGE frame is the exact sweep a rate limiter or bot detector runs.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.unix_micros("ts").alias("us"))
    w = (Window.partitionBy("user_id").orderBy("us")
         .rangeBetween(-(PEAK_WINDOW_US - 1), 0))
    per_user = (
        ev.select("user_id", F.count("*").over(w).alias("in_window"))
        .groupBy("user_id").agg(F.max("in_window").alias("peak"))
    )
    return per_user.groupBy("peak").agg(
        F.count("*").alias("n_users"))


PEAK_RATE_SQL = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
c AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                        RANGE BETWEEN {PEAK_WINDOW_US - 1} PRECEDING
                        AND CURRENT ROW) AS in_window
  FROM e),
p AS (SELECT user_id, MAX(in_window) AS peak FROM c GROUP BY user_id)
SELECT CAST(peak AS BIGINT) AS peak, COUNT(*) AS n_users
FROM p GROUP BY peak
"""


def events_ewma_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact hourly EWMA per event_type (alpha = 0.2 as the
    rational 2/10): fold s' = (8*s + 2*x) DIV 10 over the hour-ordered
    cents sums, seeded at 0. Transcendental-free smoothing — the
    fixed-point arithmetic makes the fold reproducible bit-for-bit in
    any engine (the float form would be summation-order-dependent).

    Scale shape: the hourly rollup is the only row-scaled aggregate;
    the fold runs over one |hours|-sized array per type.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.groupBy("event_type",
                   F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long"))
             .alias("cents")))
    series = hourly.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("hour_ts", "cents")))
        .alias("xs"))
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_hours"),
        F.expr("aggregate(xs, CAST(0 AS BIGINT),"
               " (s, x) -> (8 * s + 2 * x.cents) DIV 10)")
        .alias("ewma_cents"))


EWMA_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, date_trunc('hour', ts)),
series AS (
  SELECT event_type,
         list(cents ORDER BY hour_ts) AS xs
  FROM hourly GROUP BY event_type)
SELECT event_type, CAST(len(xs) AS BIGINT) AS n_hours,
       list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
                   (s, x) -> (8 * s + 2 * x) // 10) AS ewma_cents
FROM series
"""


QUERIES.update({
    "events_gap_histogram": events_gap_histogram,
    "events_peak_rate": events_peak_rate,
    "events_ewma_int": events_ewma_int,
})
ORACLE_SQL.update({
    "events_gap_histogram": GAP_HIST_SQL,
    "events_peak_rate": PEAK_RATE_SQL,
    "events_ewma_int": EWMA_SQL,
})


FUNNEL_WINDOW_S = 3600  # max seconds between consecutive funnel steps


def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel with a per-step time budget: first view, then
    the first click within 1h of it, then the first purchase within 1h
    of that click. One row of stage counts — the windowed variant every
    growth dashboard runs next to the unbounded funnel
    (events_funnel).

    Plan: three progressively-smaller keyed aggregates joined on
    user_id (hash-co-partitioned at scale); the corpus is scanned once
    per step with the type filter pushed to the scan.
    """
    from kmr_spark.session import materialize_release

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"))
    lim = FUNNEL_WINDOW_S * 1_000_000
    # v and c are each read twice (inside the next step's join and by
    # their count branch) — persisted per-user frames, the events_funnel
    # discipline
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("us").alias("v_us"))
         .persist())
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter((F.col("us") > F.col("v_us"))
                 & (F.col("us") <= F.col("v_us") + lim))
         .groupBy("user_id").agg(F.min("us").alias("c_us"))
         .persist())
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter((F.col("us") > F.col("c_us"))
                 & (F.col("us") <= F.col("c_us") + lim))
         .groupBy("user_id").agg(F.min("us").alias("p_us")))
    out = (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_1h")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_1h")))
    )
    return materialize_release(out, v, c)


FUNNEL_WINDOWED_SQL = f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, MIN(us) AS v_us FROM e
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(us) AS c_us FROM e JOIN v USING (user_id)
      WHERE event_type = 'click' AND us > v_us
        AND us <= v_us + {FUNNEL_WINDOW_S * 1_000_000}
      GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(us) AS p_us FROM e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND us > c_us
        AND us <= c_us + {FUNNEL_WINDOW_S * 1_000_000}
      GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click_1h,
       (SELECT COUNT(*) FROM p) AS n_purchase_1h
"""


QUERIES["events_funnel_windowed"] = events_funnel_windowed
ORACLE_SQL["events_funnel_windowed"] = FUNNEL_WINDOWED_SQL


def events_type_share_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-type-mix drift monitor: per day the L1 distance (in
    permille points) between today's and yesterday's type-share
    vectors — the input-distribution alarm in front of every model.
    All integer arithmetic over a |days| x |types| rollup; the lag
    window partitions per type over calendar-bounded rows.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
             .agg(F.count("*").alias("n")))
    totals = daily.groupBy("day").agg(F.sum("n").alias("day_total"))
    shares = (daily.join(totals, "day")
              .select("day", "event_type",
                      F.expr("(1000 * n) DIV day_total").alias("share")))
    w = Window.partitionBy("event_type").orderBy("day")
    deltas = shares.select(
        "day",
        F.abs(F.col("share") - F.lag("share").over(w)).alias("d"))
    return (deltas.filter(F.col("d").isNotNull())
            .groupBy("day")
            .agg(F.sum("d").alias("drift_l1_permille"),
                 F.count("*").alias("n_types")))


TYPE_DRIFT_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
totals AS (SELECT day, CAST(SUM(n) AS BIGINT) AS day_total
           FROM daily GROUP BY day),
shares AS (
  SELECT daily.day, event_type, (1000 * n) // day_total AS share
  FROM daily JOIN totals USING (day)),
deltas AS (
  SELECT day,
         abs(share - LAG(share) OVER (PARTITION BY event_type
                                      ORDER BY day)) AS d
  FROM shares)
SELECT day, CAST(SUM(d) AS BIGINT) AS drift_l1_permille,
       COUNT(*) AS n_types
FROM deltas WHERE d IS NOT NULL GROUP BY day
"""


QUERIES["events_type_share_drift"] = events_type_share_drift
ORACLE_SQL["events_type_share_drift"] = TYPE_DRIFT_SQL


MAD_K = 5  # flag threshold: |x - median| > MAD_K * MAD


# r12 revert: the r11 single-pass/persist rewrite of this query was a
# kept-for-scale trade pending sf10 evidence (VERDICT r11 ask #3); the
# sf10 A/B (OPTIMIZATION_r12.md) measured the pre-rewrite form faster
# at BOTH sf0.1 and sf10, so the rewrite is reverted per the verdict's
# measure-or-revert rule.
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly flags on the hourly series: median/MAD instead
    of mean/stddev (events_anomaly_zscore's fragile twin under heavy
    tails — one spike inflates a stddev but not a MAD). Integer cents
    all the way: medians are exact lo-medians via row_number over the
    calendar-bounded per-type hourly rollup, MAD is the lo-median of
    absolute deviations, flags are integer comparisons.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("hour_ts"))
              .agg(F.sum(F.floor(F.col("value") * 100).cast("long"))
                   .alias("cents")))
    wm = Window.partitionBy("event_type").orderBy("cents", "hour_ts")
    wc = Window.partitionBy("event_type")
    med = (hourly
           .withColumn("rn", F.row_number().over(wm))
           .withColumn("n", F.count("*").over(wc))
           .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .select("event_type", F.col("cents").alias("med")))
    dev = (hourly.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("cents") - F.col("med"))))
    wd = Window.partitionBy("event_type").orderBy("adev", "hour_ts")
    mad = (dev.withColumn("rn", F.row_number().over(wd))
           .withColumn("n", F.count("*").over(wc))
           .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .select("event_type", F.col("adev").alias("mad")))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_type", "hour_ts", "cents", "med", "mad",
                (F.col("adev") > F.lit(MAD_K) * F.col("mad"))
                .alias("is_anomaly"))
    )


ANOMALY_MAD_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
med AS (
  SELECT event_type, cents AS med FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cents, hour_ts) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM hourly) WHERE rn = (n + 1) // 2),
dev AS (
  SELECT h.event_type, h.hour_ts, h.cents, m.med,
         abs(h.cents - m.med) AS adev
  FROM hourly h JOIN med m USING (event_type)),
mad AS (
  SELECT event_type, adev AS mad FROM (
    SELECT event_type, adev,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY adev, hour_ts) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM dev) WHERE rn = (n + 1) // 2)
SELECT d.event_type, d.hour_ts, d.cents, d.med, ma.mad,
       d.adev > {MAD_K} * ma.mad AS is_anomaly
FROM dev d JOIN mad ma USING (event_type)
"""


QUERIES["events_anomaly_mad"] = events_anomaly_mad
ORACLE_SQL["events_anomaly_mad"] = ANOMALY_MAD_SQL


def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7x24 activity heatmap: events and cents per (day-of-week,
    hour-of-day) — the first seasonality plot on any ops dashboard.
    One map-side-combinable aggregate into 168 cells."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.dayofweek("ts").cast("long").alias("dow"),
                   F.hour("ts").cast("long").alias("hour"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.floor(F.col("value") * 100).cast("long"))
             .alias("cents")))


DOW_HOUR_SQL = """
SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1, 2
"""


QUERIES["events_dow_hour_heatmap"] = events_dow_hour_heatmap
ORACLE_SQL["events_dow_hour_heatmap"] = DOW_HOUR_SQL


#: quantized trig tables for the periodogram: round(cos(2*pi*i/P)*1e6)
#: as plain int literals, generated ONCE here and embedded verbatim in
#: both the Spark expression and the DuckDB oracle — neither engine
#: ever calls a trig function, so libm/StrictMath last-ulp divergence
#: cannot touch the driver's exact value hash.
SPECTRAL_PERIODS = (24, 168)


def _trig_tables(period: int) -> tuple[list[int], list[int]]:
    import math
    cq = [round(math.cos(2 * math.pi * i / period) * 1_000_000)
          for i in range(period)]
    sq = [round(math.sin(2 * math.pi * i / period) * 1_000_000)
          for i in range(period)]
    return cq, sq


def events_spectral_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram probe of the hourly event-count series at the two
    calendar periods that matter for traffic (daily=24h, weekly=168h):
    the correlation of approximately-mean-centered hourly counts with
    quantized cos/sin tables. "Is this metric diurnal, and how strongly"
    is the first seasonality question a forecasting pipeline asks
    before picking its model; the DFT-at-chosen-frequencies form needs
    only two keyed aggregations, unlike a full FFT.

    Plan: ONE aggregation of events to hourly counts (<= 720 rows for
    the 30-day window regardless of input size — the post-agg frame is
    KBs at 100 TB), then ONE aggregation of the hourly frame computing
    every period's raw dot products at once; the mean-centering is
    folded in algebraically (sum((x - m) * c) == sum(x * c) -
    m * sum(c), exact over BIGINTs), so the DC offset needs no second
    pass and no broadcast join, and the per-period rows come out of the
    single 1-row aggregate via a literal struct-array inline — the
    previous union-of-branches form re-aggregated the events table
    once per branch plus once for the totals (4 parquet scans; this is
    1). Exactness: counts and trig values are BIGINTs, centering uses
    integer DIV, and the final amplitude is one fixed expression
    tree (sqrt is correctly rounded per IEEE-754, hence portable).
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.select(F.expr(
            "timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', "
            "date_trunc('hour', ts))").alias("t"))
        .groupBy("t").agg(F.count("*").alias("x"))
    )
    aggs = [F.count("*").alias("n_hours"), F.sum("x").alias("sx")]
    for period in SPECTRAL_PERIODS:
        cq, sq = _trig_tables(period)
        carr = F.array(*[F.lit(c).cast("long") for c in cq])
        sarr = F.array(*[F.lit(s).cast("long") for s in sq])
        ph = (F.col("t") % period + 1).cast("int")
        aggs += [
            F.sum(F.col("x") * F.element_at(carr, ph))
            .alias(f"sxc_{period}"),
            F.sum(F.element_at(carr, ph)).alias(f"sc_{period}"),
            F.sum(F.col("x") * F.element_at(sarr, ph))
            .alias(f"sxs_{period}"),
            F.sum(F.element_at(sarr, ph)).alias(f"ss_{period}"),
        ]
    one = hourly.agg(*aggs)
    m = F.expr("sx DIV n_hours")
    rows = F.array(*[
        F.struct(
            F.lit(period).alias("period"),
            F.col("n_hours").alias("n_hours"),
            (F.col(f"sxc_{period}") - m * F.col(f"sc_{period}"))
            .alias("sum_cos_q"),
            (F.col(f"sxs_{period}") - m * F.col(f"ss_{period}"))
            .alias("sum_sin_q"))
        for period in SPECTRAL_PERIODS])
    dd = lambda c: F.col(c).cast("double")
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.period", "r.n_hours", "r.sum_cos_q", "r.sum_sin_q")
        .select(
            "period", "n_hours", "sum_cos_q", "sum_sin_q",
            (F.sqrt(dd("sum_cos_q") * dd("sum_cos_q")
                    + dd("sum_sin_q") * dd("sum_sin_q"))
             * F.lit(2.0) / (F.lit(1000000.0) * dd("n_hours")))
            .alias("amplitude"))
        .orderBy("period"))


def _spectral_sql() -> str:
    parts = []
    for period in SPECTRAL_PERIODS:
        cq, sq = _trig_tables(period)
        parts.append(f"""
SELECT {period} AS period, n_hours, sum_cos_q, sum_sin_q,
       sqrt(CAST(sum_cos_q AS DOUBLE) * CAST(sum_cos_q AS DOUBLE)
            + CAST(sum_sin_q AS DOUBLE) * CAST(sum_sin_q AS DOUBLE))
       * 2.0 / (1000000.0 * CAST(n_hours AS DOUBLE)) AS amplitude
FROM (
  SELECT MAX(n_hours) AS n_hours,
         CAST(SUM(y * ({list(cq)})[(t % {period}) + 1]) AS BIGINT)
           AS sum_cos_q,
         CAST(SUM(y * ({list(sq)})[(t % {period}) + 1]) AS BIGINT)
           AS sum_sin_q
  FROM centered)""")
    body = "\nUNION ALL\n".join(parts)
    return f"""
WITH hourly AS (
  SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                   date_trunc('hour', ts)) AS t,
         COUNT(*) AS x
  FROM events GROUP BY 1),
totals AS (
  SELECT COUNT(*) AS n_hours, CAST(SUM(x) AS BIGINT) AS sx FROM hourly),
centered AS (
  SELECT t, n_hours, x - (sx // n_hours) AS y
  FROM hourly CROSS JOIN totals)
{body}
ORDER BY period
"""


SPECTRAL_SQL = _spectral_sql()

QUERIES["events_spectral_daily"] = events_spectral_daily
ORACLE_SQL["events_spectral_daily"] = SPECTRAL_SQL


HOLT_HORIZON = 7  # forecast days
#: state scale: level/trend carried in milli-events for integer DIVs
HOLT_S = 1000


def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential (level+trend) forecast of the global
    daily event count, HOLT_HORIZON days ahead — the capacity-planning
    forecast one step up from events_ewma_int (level only) and one
    model down from seasonal snaive. Smoothing constants are exact
    binary fractions (alpha=1/4, beta=1/8) and the recurrence runs in
    scaled integers with truncating DIV:

        l_t = (S*x_t + 3*(l_{t-1} + b_{t-1})) DIV 4
        b_t = (l_t - l_{t-1} + 7*b_{t-1}) DIV 8,  l_0 = S*x_0, b_0 = 0

    so the whole fold is integer arithmetic — bit-identical in any
    engine (Spark DIV and DuckDB // both truncate toward zero, signs
    included), sidestepping the float-fold portability trap entirely.

    Plan: ONE map-side-combinable aggregation collapses the corpus to
    <=31 (day, count) rows; the inherently-sequential 30-step fold then
    runs as an array aggregate over that single tiny row — the
    right split of parallel reduction vs sequential recurrence at any
    scale (the fold's input is O(days), never O(events)).
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(F.datediff(F.to_date("ts"),
                             F.lit("2024-01-01").cast("date")).alias("d"))
        .groupBy("d").agg(F.count("*").alias("x"))
    )
    folded = daily.agg(
        F.expr(f"""
        aggregate(
          sort_array(collect_list(struct(d, x))),
          named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                       'n', CAST(0 AS BIGINT)),
          (acc, e) -> IF(acc.n = 0,
            named_struct('l', {HOLT_S} * e.x, 'b', CAST(0 AS BIGINT),
                         'n', CAST(1 AS BIGINT)),
            named_struct(
              'l', ({HOLT_S} * e.x + 3 * (acc.l + acc.b)) DIV 4,
              'b', ((({HOLT_S} * e.x + 3 * (acc.l + acc.b)) DIV 4)
                    - acc.l + 7 * acc.b) DIV 8,
              'n', acc.n + 1)))
        """).alias("st"))
    return (
        folded.select(
            F.explode(F.sequence(F.lit(1), F.lit(HOLT_HORIZON))).alias("h"),
            F.col("st.l").alias("level_milli"),
            F.col("st.b").alias("trend_milli"))
        .select(
            F.col("h").cast("long").alias("h"), "level_milli", "trend_milli",
            (F.col("level_milli") + F.col("h") * F.col("trend_milli"))
            .alias("forecast_milli"))
        .select(
            "h", "level_milli", "trend_milli", "forecast_milli",
            (F.col("forecast_milli").cast("double") / F.lit(float(HOLT_S)))
            .alias("forecast"))
        .orderBy("h")
    )


HOLT_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         COUNT(*) AS x
  FROM events GROUP BY 1),
ord AS (
  SELECT row_number() OVER (ORDER BY d) AS i, x FROM daily),
rec(i, l, b) AS (
  SELECT CAST(1 AS BIGINT), {HOLT_S} * x, CAST(0 AS BIGINT)
  FROM ord WHERE i = 1
  UNION ALL
  SELECT o.i,
         ({HOLT_S} * o.x + 3 * (r.l + r.b)) // 4,
         ((({HOLT_S} * o.x + 3 * (r.l + r.b)) // 4) - r.l + 7 * r.b) // 8
  FROM rec r JOIN ord o ON o.i = r.i + 1),
fin AS (SELECT l, b FROM rec ORDER BY i DESC LIMIT 1)
SELECT CAST(h AS BIGINT) AS h,
       l AS level_milli, b AS trend_milli,
       l + h * b AS forecast_milli,
       CAST(l + h * b AS DOUBLE) / {float(HOLT_S)} AS forecast
FROM fin, unnest(range(1, {HOLT_HORIZON + 1})) AS t(h)
ORDER BY h
"""

QUERIES["events_holt_linear"] = events_holt_linear
ORACLE_SQL["events_holt_linear"] = HOLT_SQL


HW_PERIOD = 7  # weekly seasonality on the daily series


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive HOLT-WINTERS (level + trend + weekly seasonal) forecast
    of the global daily event count, HOLT_HORIZON days ahead — the
    model events_forecast_snaive benchmarks against and
    events_holt_linear lacks the seasonal term for. Same integer
    discipline as the Holt fold (alpha=1/4, beta=1/8, gamma=1/4,
    truncating DIV, milli-scaled):

        l_t = (S*x_t - s_head + 3*(l+b)) DIV 4
        b_t = (l_t - l + 7*b) DIV 8
        s_t = (S*x_t - l_t + 3*s_head) DIV 4     (s seeded to 0 x 7)

    with the seasonal ring carried as a 7-long array (head = s_{t-7},
    rotated each step). The whole fold is integers, so Spark's array
    aggregate and DuckDB's recursive CTE (list column state) agree
    bit-for-bit; forecasts add the matching ring slot.

    Plan: identical scale shape to events_holt_linear — one map-side
    combinable daily aggregation, then an O(days) sequential fold over
    a single row.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(F.datediff(F.to_date("ts"),
                             F.lit("2024-01-01").cast("date")).alias("d"))
        .groupBy("d").agg(F.count("*").alias("x"))
    )
    zeros = ", ".join(["CAST(0 AS BIGINT)"] * HW_PERIOD)
    folded = daily.agg(
        F.expr(f"""
        aggregate(
          sort_array(collect_list(struct(d, x))),
          named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
                       's', array({zeros}), 'n', CAST(0 AS BIGINT)),
          (acc, e) -> IF(acc.n = 0,
            named_struct('l', {HOLT_S} * e.x, 'b', CAST(0 AS BIGINT),
                         's', acc.s, 'n', CAST(1 AS BIGINT)),
            named_struct(
              'l', ({HOLT_S} * e.x - acc.s[0] + 3 * (acc.l + acc.b)) DIV 4,
              'b', (((({HOLT_S} * e.x - acc.s[0] + 3 * (acc.l + acc.b))
                      DIV 4)) - acc.l + 7 * acc.b) DIV 8,
              's', concat(
                     slice(acc.s, 2, {HW_PERIOD - 1}),
                     array(({HOLT_S} * e.x
                            - (({HOLT_S} * e.x - acc.s[0]
                                + 3 * (acc.l + acc.b)) DIV 4)
                            + 3 * acc.s[0]) DIV 4)),
              'n', acc.n + 1)))
        """).alias("st"))
    return (
        folded.select(
            F.explode(F.sequence(F.lit(1), F.lit(HOLT_HORIZON))).alias("h"),
            F.col("st.l").alias("level_milli"),
            F.col("st.b").alias("trend_milli"),
            F.col("st.s").alias("ring"))
        .select(
            F.col("h").cast("long").alias("h"), "level_milli", "trend_milli",
            F.expr(f"ring[CAST((h - 1) % {HW_PERIOD} AS INT)]")
            .alias("seasonal_milli"))
        .select(
            "h", "level_milli", "trend_milli", "seasonal_milli",
            (F.col("level_milli") + F.col("h") * F.col("trend_milli")
             + F.col("seasonal_milli")).alias("forecast_milli"))
        .select(
            "*",
            (F.col("forecast_milli").cast("double") / F.lit(float(HOLT_S)))
            .alias("forecast"))
        .orderBy("h")
    )


HOLT_WINTERS_SQL = f"""
WITH RECURSIVE daily AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         COUNT(*) AS x
  FROM events GROUP BY 1),
ord AS (
  SELECT row_number() OVER (ORDER BY d) AS i, x FROM daily),
rec(i, l, b, s) AS (
  SELECT CAST(1 AS BIGINT), {HOLT_S} * x, CAST(0 AS BIGINT),
         [{", ".join(["CAST(0 AS BIGINT)"] * HW_PERIOD)}]
  FROM ord WHERE i = 1
  UNION ALL
  SELECT o.i,
         ({HOLT_S} * o.x - r.s[1] + 3 * (r.l + r.b)) // 4,
         (((({HOLT_S} * o.x - r.s[1] + 3 * (r.l + r.b)) // 4))
            - r.l + 7 * r.b) // 8,
         list_append(r.s[2:{HW_PERIOD}],
                     ({HOLT_S} * o.x
                      - (({HOLT_S} * o.x - r.s[1] + 3 * (r.l + r.b)) // 4)
                      + 3 * r.s[1]) // 4)
  FROM rec r JOIN ord o ON o.i = r.i + 1),
fin AS (SELECT l, b, s FROM rec ORDER BY i DESC LIMIT 1)
SELECT CAST(h AS BIGINT) AS h,
       l AS level_milli, b AS trend_milli,
       s[CAST((h - 1) % {HW_PERIOD} AS INTEGER) + 1] AS seasonal_milli,
       l + h * b + s[CAST((h - 1) % {HW_PERIOD} AS INTEGER) + 1]
         AS forecast_milli,
       CAST(l + h * b + s[CAST((h - 1) % {HW_PERIOD} AS INTEGER) + 1]
            AS DOUBLE) / {float(HOLT_S)} AS forecast
FROM fin, unnest(range(1, {HOLT_HORIZON + 1})) AS t(h)
ORDER BY h
"""

QUERIES["events_holt_winters"] = events_holt_winters
ORACLE_SQL["events_holt_winters"] = HOLT_WINTERS_SQL


PEAK_TOP = 10
PEAK_NEIGHBORHOOD = 2  # strict local max over +-2 hours


def events_peak_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local PEAKS of the hourly event-count series: hours strictly
    greater than every neighbor within +-PEAK_NEIGHBORHOOD (interior
    hours only — boundary hours with a missing neighbor can't qualify),
    with prominence = x - max(neighbors); top PEAK_TOP by count then
    hour. The alert-worthy-spike detector that anomaly z-score/MAD
    complement: those flag distribution outliers, this finds SHAPE
    (a spike between quieter hours, whatever the absolute level).

    Plan: one map-side-combinable hourly aggregation (<=720 rows for
    the 30-day window at ANY input size), then lag/lead windows over
    that tiny densified series — the documented post-aggregation
    window pattern. All integers.
    """
    ev = load_tables(spark, sf_dir)["events"]
    hourly = (
        ev.select(F.expr(
            "timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', "
            "date_trunc('hour', ts))").alias("t"))
        .groupBy("t").agg(F.count("*").alias("x"))
    )
    w = Window.orderBy("t")
    nbrs = [F.lag("x", k).over(w) for k in range(1, PEAK_NEIGHBORHOOD + 1)] \
        + [F.lead("x", k).over(w) for k in range(1, PEAK_NEIGHBORHOOD + 1)]
    # the hourly domain is dense here; require ALL +-k neighbors to be
    # adjacent hours too, so gaps (possible at tiny sf) disqualify
    tnbrs = [F.lag("t", k).over(w) for k in range(1, PEAK_NEIGHBORHOOD + 1)] \
        + [F.lead("t", k).over(w) for k in range(1, PEAK_NEIGHBORHOOD + 1)]
    # aligned with nbrs/tnbrs: lag(k) sits at offset -k, lead(k) at +k
    offs = [-k for k in range(1, PEAK_NEIGHBORHOOD + 1)] \
        + list(range(1, PEAK_NEIGHBORHOOD + 1))
    cond = F.lit(True)
    base = None
    for nx, nt, off in zip(nbrs, tnbrs, offs):
        cond = cond & nx.isNotNull() & (nt == F.col("t") + off) \
            & (F.col("x") > nx)
        base = nx if base is None else F.greatest(base, nx)
    peaks = (
        hourly.select("t", "x", cond.alias("is_peak"), base.alias("base"))
        .filter("is_peak")
        .select("t", "x", "base", (F.col("x") - F.col("base"))
                .alias("prominence"))
    )
    return peaks.orderBy(F.col("x").desc(), "t").limit(PEAK_TOP)


def _peak_sql() -> str:
    k = PEAK_NEIGHBORHOOD
    nbr_cols = []
    conds = []
    for i in range(1, k + 1):
        nbr_cols.append(f"lag(x, {i}) OVER w AS xm{i}")
        nbr_cols.append(f"lead(x, {i}) OVER w AS xp{i}")
        nbr_cols.append(f"lag(t, {i}) OVER w AS tm{i}")
        nbr_cols.append(f"lead(t, {i}) OVER w AS tp{i}")
        conds.append(f"xm{i} IS NOT NULL AND tm{i} = t - {i} AND x > xm{i}")
        conds.append(f"xp{i} IS NOT NULL AND tp{i} = t + {i} AND x > xp{i}")
    base = "greatest(" + ", ".join(
        [f"xm{i}" for i in range(1, k + 1)]
        + [f"xp{i}" for i in range(1, k + 1)]) + ")"
    return f"""
WITH hourly AS (
  SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                   date_trunc('hour', ts)) AS t,
         COUNT(*) AS x
  FROM events GROUP BY 1),
nb AS (
  SELECT t, x, {", ".join(nbr_cols)}
  FROM hourly WINDOW w AS (ORDER BY t)),
peaks AS (
  SELECT t, x, {base} AS base
  FROM nb WHERE {" AND ".join(conds)})
SELECT t, x, base, x - base AS prominence
FROM peaks ORDER BY x DESC, t LIMIT {PEAK_TOP}
"""


PEAK_SQL = _peak_sql()

QUERIES["events_peak_prominence"] = events_peak_prominence
ORACLE_SQL["events_peak_prominence"] = PEAK_SQL


RECON_HORIZON = 7


# r12 revert: the r11 single-pass/persist rewrite of this query was a
# kept-for-scale trade pending sf10 evidence (VERDICT r11 ask #3); the
# sf10 A/B (OPTIMIZATION_r12.md) measured the pre-rewrite form faster
# at BOTH sf0.1 and sf10, so the rewrite is reverted per the verdict's
# measure-or-revert rule.
def events_forecast_reconciled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL forecast reconciliation (top-down proportional):
    the per-type seasonal-naive forecasts and the total-series
    seasonal-naive forecast disagree (forecasts don't add up — the
    classic hierarchy problem); reconcile by distributing the TOTAL
    forecast over types by their trailing 28-day volume shares. One
    row per (h, event_type): the base snaive forecast, the reconciled
    value in integer milli-units ((1000 * total_fc * cnt_type) DIV
    cnt_all — exact), and the double. The coherence property
    |sum_types(reconciled) - 1000*total| < |types| (pure DIV
    truncation slack) is test-pinned.

    Plan: two tiny post-aggregation frames (per-type daily counts,
    <=|types|x31 rows) + broadcast share totals; the corpus is
    touched by ONE map-side-combinable aggregation.
    """
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.to_date("ts"),
                       F.lit("2024-01-01").cast("date")).alias("d"))
        .groupBy("event_type", "d").agg(F.count("*").alias("x"))
    )
    last = daily.agg(F.max("d").alias("dmax"))
    base = (
        daily.crossJoin(F.broadcast(last))
        # snaive: forecast for dmax + h repeats the value at
        # dmax + h - 7 (same weekday last observed week)
        .filter(F.col("d") > F.col("dmax") - 7)
        .select("event_type",
                (F.col("d") - (F.col("dmax") - 7)).cast("long").alias("h"),
                F.col("x").alias("base_fc"))
        .filter(F.col("h") <= RECON_HORIZON)
    )
    total_fc = base.groupBy("h").agg(F.sum("base_fc").alias("naive_total"))
    shares = (
        daily.crossJoin(F.broadcast(last))
        .filter(F.col("d") > F.col("dmax") - 28)
        .groupBy("event_type").agg(F.sum("x").alias("cnt_type"))
    )
    share_tot = shares.agg(F.sum("cnt_type").alias("cnt_all"))
    return (
        base.join(total_fc, "h")
        .join(F.broadcast(shares), "event_type")
        .crossJoin(F.broadcast(share_tot))
        .select(
            "h", "event_type", "base_fc",
            F.expr("(1000 * naive_total * cnt_type) DIV cnt_all")
            .alias("reconciled_milli"))
        .select(
            "*",
            (F.col("reconciled_milli").cast("double") / F.lit(1000.0))
            .alias("reconciled"))
        .orderBy("h", "event_type")
    )


RECONCILED_SQL = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2),
last AS (SELECT MAX(d) AS dmax FROM daily),
base AS (
  SELECT event_type, CAST(d - (dmax - 7) AS BIGINT) AS h, x AS base_fc
  FROM daily CROSS JOIN last
  WHERE d > dmax - 7 AND d - (dmax - 7) <= {RECON_HORIZON}),
total_fc AS (
  SELECT h, CAST(SUM(base_fc) AS BIGINT) AS naive_total
  FROM base GROUP BY h),
shares AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS cnt_type
  FROM daily CROSS JOIN last WHERE d > dmax - 28 GROUP BY 1),
share_tot AS (SELECT CAST(SUM(cnt_type) AS BIGINT) AS cnt_all FROM shares)
SELECT b.h, b.event_type, b.base_fc,
       (1000 * t.naive_total * s.cnt_type) // st.cnt_all
         AS reconciled_milli,
       CAST((1000 * t.naive_total * s.cnt_type) // st.cnt_all AS DOUBLE)
         / 1000.0 AS reconciled
FROM base b
JOIN total_fc t USING (h)
JOIN shares s USING (event_type)
CROSS JOIN share_tot st
ORDER BY b.h, b.event_type
"""

QUERIES["events_forecast_reconciled"] = events_forecast_reconciled
ORACLE_SQL["events_forecast_reconciled"] = RECONCILED_SQL
