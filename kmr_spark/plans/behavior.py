"""User-behavior modeling plans over the events table: SCD Type-2
state history, Markov transition matrix, and an A/B significance gate.

These are the warehouse/product-analytics operators a KMR user would
hand-roll with sorted-KVS reduces (kmr_sort + kmr_reduce over
(user, time)-keyed streams, reference src/kmrmoreops.c:391); here each
is a single declarative window/aggregate plan:

- SCD2:  one per-user window pass (lag -> change flag -> running sum)
  then a keyed aggregate — the gaps-and-islands rewrite; no self-join,
  so it scales linearly with the event log.
- Markov: lead() per user then a |types|^2-sized aggregate with
  map-side combine; the normalizing totals are a broadcast join.
- A/B:   integer-moment Welch z-test (the repo's exact-oracle pattern,
  see plans/timeseries.py events_anomaly_zscore): values quantized to
  cents so n/S/Q are exact integer sums, variance and z computed in
  one fixed float expression shape in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables, materialize_release

#: two-sided 5% significance threshold for the A/B z-test
Z_CRIT = 1.96


def events_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) state history: collapse each
    user's event stream into validity intervals of consecutive same
    event_type runs — (user_id, state, valid_from, valid_to, n_events,
    is_current), half-open [valid_from, valid_to), open-ended current
    row.

    Plan: gaps-and-islands — lag() flags run starts, a running sum
    numbers runs, one groupBy collapses them, lead() closes intervals.
    All four steps share the (user_id, time) window partitioning, so
    Spark plans ONE Exchange for the whole query; state never grows
    beyond the per-user event count.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "ts", "event_type",
        F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    # null-safe run-start flag: mirrors the oracle's IS DISTINCT FROM
    # (consecutive NULL states share a run; a != with coalesce-to-1
    # would start a new run on every NULL)
    runs = ev.withColumn(
        "chg",
        (~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)))
        .cast("long"),
    ).withColumn(
        "run_id",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    spans = runs.groupBy("user_id", "run_id").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"))
    wrun = Window.partitionBy("user_id").orderBy("run_id")
    return (
        spans.withColumn("valid_to", F.lead("valid_from").over(wrun))
        .select("user_id", "state", "valid_from", "valid_to", "n_events",
                F.col("valid_to").isNull().alias("is_current"))
    )


SCD2_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events),
runs AS (
  SELECT user_id, ts, event_type,
         SUM(chg) OVER (PARTITION BY user_id
                        ORDER BY epoch_us(ts), event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged),
spans AS (
  SELECT user_id, run_id, MIN(event_type) AS state,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM runs GROUP BY user_id, run_id)
SELECT user_id, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
         AS valid_to,
       n_events,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
         IS NULL AS is_current
FROM spans
ORDER BY user_id, valid_from
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    observed (event_type -> next_type) pair within a user's timeline,
    the transition count and the row-normalized probability.

    Plan: one lead() window pass (same Exchange as the user ordering),
    a |types|^2 aggregate with map-side combine, and a broadcast join
    against the |types|-row totals — nothing after the window is
    corpus-sized. Probability is an exact integer ratio cast once, so
    both engines emit the identical double.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_trans"))
    )
    totals = pairs.groupBy("event_type").agg(
        F.sum("n_trans").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "event_type")
        .select("event_type", "next_type", "n_trans",
                (F.col("n_trans").cast("double") / F.col("row_total"))
                .alias("prob"))
        .orderBy("event_type", "next_type")
    )


MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS next_type
  FROM events),
counts AS (
  SELECT event_type, next_type, COUNT(*) AS n_trans
  FROM pairs WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type)
SELECT c.event_type, c.next_type, c.n_trans,
       CAST(c.n_trans AS DOUBLE) / t.row_total AS prob
FROM counts c
JOIN (SELECT event_type, SUM(n_trans) AS row_total
      FROM counts GROUP BY event_type) t USING (event_type)
ORDER BY c.event_type, c.next_type
"""


def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test per event_type between experiment arms
    (arm = user_id mod 2 — the deterministic hash-split an experiment
    framework assigns): per type the arm sizes, mean values (in cents),
    the z statistic, and a |z| > 1.96 significance flag.

    Exactness: values are quantized to integer cents (floor(value*100),
    exact for identical input doubles), so n/S=Σc/Q=Σc² are integer
    moments — summed as DECIMAL(38,0) (order-free, no int64 overflow at
    petabyte row counts) — and mean/variance/z are one fixed float
    expression evaluated identically by both engines. Plan: a 2×|types|
    map-side-combinable aggregate, then a |types|-row self-merge —
    nothing after the first aggregate is corpus-sized.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        F.floor(F.col("value") * 100).cast("decimal(38,0)").alias("c"))
    m = ev.groupBy("event_type", "arm").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"))

    def stats(arm: int, suf: str) -> DataFrame:
        return m.filter(F.col("arm") == arm).select(
            "event_type", F.col("n").alias(f"n{suf}"),
            F.col("s").alias(f"s{suf}"), F.col("q").alias(f"q{suf}"))

    j = stats(0, "_a").join(stats(1, "_b"), "event_type")

    def mean(suf: str):
        return F.col(f"s{suf}").cast("double") / F.col(f"n{suf}")

    def var(suf: str):
        n = F.col(f"n{suf}").cast("double")
        s = F.col(f"s{suf}").cast("double")
        q = F.col(f"q{suf}").cast("double")
        return (n * q - s * s) / (n * (n - F.lit(1.0)))

    z = (mean("_a") - mean("_b")) / F.sqrt(
        var("_a") / F.col("n_a") + var("_b") / F.col("n_b"))
    return (
        j.select("event_type", "n_a", "n_b",
                 mean("_a").alias("mean_a_cents"),
                 mean("_b").alias("mean_b_cents"),
                 z.alias("z"),
                 (F.abs(z) > F.lit(Z_CRIT)).alias("significant"))
        .orderBy("event_type")
    )


AB_TEST_SQL = f"""
WITH q AS (
  SELECT event_type, user_id % 2 AS arm,
         CAST(floor(value * 100) AS HUGEINT) AS c
  FROM events),
m AS (
  SELECT event_type, arm, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
  FROM q GROUP BY event_type, arm),
j AS (
  SELECT a.event_type,
         a.n AS n_a, a.s AS s_a, a.q AS q_a,
         b.n AS n_b, b.s AS s_b, b.q AS q_b
  FROM m a JOIN m b USING (event_type)
  WHERE a.arm = 0 AND b.arm = 1)
SELECT event_type, n_a, n_b,
       CAST(s_a AS DOUBLE) / n_a AS mean_a_cents,
       CAST(s_b AS DOUBLE) / n_b AS mean_b_cents,
       (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         / sqrt(((CAST(n_a AS DOUBLE) * CAST(q_a AS DOUBLE)
                  - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                  / n_a
                + ((CAST(n_b AS DOUBLE) * CAST(q_b AS DOUBLE)
                  - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                  / n_b) AS z,
       abs((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         / sqrt(((CAST(n_a AS DOUBLE) * CAST(q_a AS DOUBLE)
                  - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                  / n_a
                + ((CAST(n_b AS DOUBLE) * CAST(q_b AS DOUBLE)
                  - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                  / n_b)) > {Z_CRIT} AS significant
FROM j
ORDER BY event_type
"""


def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-step event-type paths (a>b>c) across all user
    timelines — the sequence-mining census behind "what do users do
    next" product questions and next-action model features. One lead()
    window pass (two offsets share the same sort), then a |types|^3-
    bounded aggregate with map-side combine.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        ev.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "event_type", "t2", "t3").alias("path"))
        .groupBy("path").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
    )


PATH_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS t3
  FROM events)
SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
FROM seq WHERE t3 IS NOT NULL
GROUP BY path ORDER BY n DESC, path
"""



ATTR_HORIZON_US = 3_600 * 1_000_000  # 1h lookback


def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase credits ALL of
    the user's clicks in the preceding hour equally (weight 1/k). Per
    purchase: the touch count, the per-touch weight, and the first/last
    click lags in seconds — the per-conversion detail a marketing
    pipeline aggregates into channel credit.

    Plan: a RANGE window over each user's (time-ordered) event stream
    counts in-horizon clicks — NO self-join, no pair blowup; the
    window shares the single user-keyed Exchange. Weights are emitted
    per purchase (1/k, an exact IEEE division), never float-summed, so
    the oracle compares them bit-for-bit.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us"))
    is_click = (F.col("event_type") == "click").cast("long")
    w = (Window.partitionBy("user_id").orderBy("us")
         .rangeBetween(-(ATTR_HORIZON_US - 1), -1))
    touched = ev.select(
        "event_id", "user_id", "event_type", "us",
        F.sum(is_click).over(w).alias("n_touches_raw"),
        F.min(F.when(F.col("event_type") == "click", F.col("us")))
        .over(w).alias("first_click_us"),
        F.max(F.when(F.col("event_type") == "click", F.col("us")))
        .over(w).alias("last_click_us"))
    return (
        touched.filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id",
            F.coalesce("n_touches_raw", F.lit(0)).alias("n_touches"),
            F.when(F.coalesce("n_touches_raw", F.lit(0)) > 0,
                   F.lit(1.0) / F.col("n_touches_raw")).alias("w_per_touch"),
            ((F.col("us") - F.col("first_click_us")) / F.lit(1_000_000))
            .cast("long").alias("first_lag_s"),
            ((F.col("us") - F.col("last_click_us")) / F.lit(1_000_000))
            .cast("long").alias("last_lag_s"))
    )


MULTITOUCH_SQL = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
touched AS (
  SELECT event_id, user_id, event_type, us,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {ATTR_HORIZON_US - 1} PRECEDING
                       AND 1 PRECEDING) AS n_touches_raw,
         MIN(CASE WHEN event_type = 'click' THEN us END) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {ATTR_HORIZON_US - 1} PRECEDING
                       AND 1 PRECEDING) AS first_click_us,
         MAX(CASE WHEN event_type = 'click' THEN us END) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {ATTR_HORIZON_US - 1} PRECEDING
                       AND 1 PRECEDING) AS last_click_us
  FROM ev)
SELECT event_id, user_id,
       CAST(COALESCE(n_touches_raw, 0) AS BIGINT) AS n_touches,
       CASE WHEN COALESCE(n_touches_raw, 0) > 0
            THEN CAST(1.0 AS DOUBLE) / n_touches_raw END AS w_per_touch,
       CAST((us - first_click_us) // 1000000 AS BIGINT) AS first_lag_s,
       CAST((us - last_click_us) // 1000000 AS BIGINT) AS last_lag_s
FROM touched WHERE event_type = 'purchase'
ORDER BY event_id
"""


def events_ab_test_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL A/B monitoring — the peeking curve: for every
    (event_type, day) the Welch z statistic computed over all data up
    TO that day, i.e. what a dashboard shows while the experiment
    runs. Significance flags use the same 1.96 threshold; watching
    this curve is exactly the "peeking" multiple-testing hazard, which
    is why it belongs next to the terminal test (events_ab_test).

    Exactness: per-day integer moments (cents) zero-filled onto a
    dense (type, day, arm) grid, DECIMAL cumulative-sum windows (exact
    at any scale), then the fixed Welch expression — every day's z is
    bit-identical across engines. Plan: one daily aggregate, a tiny
    grid join, |types|×|days|×2-sized windows — nothing after the
    first aggregate is corpus-sized.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        F.floor(F.col("value") * 100).cast("decimal(38,0)").alias("c"))
    # |types| x |days| x 2 rollup read by the grid build, the dense
    # join, and (via dense/cum) both arm sides — persisted so the
    # events aggregation runs once (4 corpus scans before)
    daily = ev.groupBy("event_type", "day", "arm").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q")).persist()
    grid = (
        daily.select("event_type", "day").distinct()
        .crossJoin(spark.range(2).select(F.col("id").alias("arm")))
    )
    dense = (
        grid.join(daily, ["event_type", "day", "arm"], "left")
        .select("event_type", "day", "arm",
                F.coalesce("n", F.lit(0)).alias("n"),
                F.coalesce("s", F.lit(0).cast("decimal(38,0)")).alias("s"),
                F.coalesce("q", F.lit(0).cast("decimal(38,0)")).alias("q"))
    )
    w = (Window.partitionBy("event_type", "arm")
         .orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
    cum = dense.select(
        "event_type", "day", "arm",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("q").over(w).alias("cq"))

    def side(arm, suf):
        return cum.filter(F.col("arm") == arm).select(
            "event_type", "day", F.col("cn").alias(f"n{suf}"),
            F.col("cs").alias(f"s{suf}"), F.col("cq").alias(f"q{suf}"))

    j = side(0, "_a").join(side(1, "_b"), ["event_type", "day"])

    def mean(suf):
        return F.col(f"s{suf}").cast("double") / F.col(f"n{suf}")

    def var(suf):
        n = F.col(f"n{suf}").cast("double")
        sm = F.col(f"s{suf}").cast("double")
        q = F.col(f"q{suf}").cast("double")
        return (n * q - sm * sm) / (n * (n - F.lit(1.0)))

    z = (mean("_a") - mean("_b")) / F.sqrt(
        var("_a") / F.col("n_a") + var("_b") / F.col("n_b"))
    out = (
        j.filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        .select("event_type", "day", "n_a", "n_b", z.alias("z"),
                (F.abs(z) > F.lit(Z_CRIT)).alias("significant"))
        .orderBy("event_type", "day")
    )
    return materialize_release(out, daily)


AB_SEQUENTIAL_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         user_id % 2 AS arm,
         CAST(floor(value * 100) AS HUGEINT) AS c
  FROM events),
daily AS (
  SELECT event_type, day, arm, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q
  FROM ev GROUP BY event_type, day, arm),
grid AS (
  SELECT DISTINCT event_type, day FROM daily),
dense AS (
  SELECT g.event_type, g.day, a.arm,
         COALESCE(d.n, 0) AS n,
         COALESCE(d.s, 0) AS s,
         COALESCE(d.q, 0) AS q
  FROM grid g
  CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1) a
  LEFT JOIN daily d
    ON d.event_type = g.event_type AND d.day = g.day AND d.arm = a.arm),
cum AS (
  SELECT event_type, day, arm,
         SUM(n) OVER wnd AS cn, SUM(s) OVER wnd AS cs, SUM(q) OVER wnd AS cq
  FROM dense
  WINDOW wnd AS (PARTITION BY event_type, arm ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
j AS (
  SELECT a.event_type, a.day,
         a.cn AS n_a, a.cs AS s_a, a.cq AS q_a,
         b.cn AS n_b, b.cs AS s_b, b.cq AS q_b
  FROM cum a JOIN cum b
    ON a.event_type = b.event_type AND a.day = b.day
   AND a.arm = 0 AND b.arm = 1)
SELECT event_type, day,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         / sqrt(((CAST(n_a AS DOUBLE) * CAST(q_a AS DOUBLE)
                  - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                  / n_a
                + ((CAST(n_b AS DOUBLE) * CAST(q_b AS DOUBLE)
                  - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                  / n_b) AS z,
       abs((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         / sqrt(((CAST(n_a AS DOUBLE) * CAST(q_a AS DOUBLE)
                  - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                 / (CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) - 1.0)))
                  / n_a
                + ((CAST(n_b AS DOUBLE) * CAST(q_b AS DOUBLE)
                  - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE))
                 / (CAST(n_b AS DOUBLE) * (CAST(n_b AS DOUBLE) - 1.0)))
                  / n_b)) > {Z_CRIT} AS significant
FROM j WHERE n_a >= 2 AND n_b >= 2
ORDER BY event_type, day
"""


def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy of the user's
    event-type distribution (0 = habitual single-action user, ln(5) =
    uniform explorer) plus counts — the engagement-mix feature
    churn/recommendation models consume.

    Same integer-count entropy recipe as text_token_entropy: H =
    qln(n) - (sum c*q(c)/1e6)/n where q(x) = floor(ln(x)*1e6) as
    BIGINT and qln(x) = q(x)/1e6. Quantizing EVERY log term — the
    per-count terms AND the outer ln(n) — makes the fold an exact
    order-independent integer sum and erases last-ulp differences
    between Spark's JVM log and DuckDB's libm (observed: ln(74)
    differs by 1 ulp between the two engines), so the driver's
    bit-exact value hash is stable. The final double comes from one
    fixed expression tree. Two map-side-combinable aggregates,
    |users|-sized output."""
    ev = load_tables(spark, sf_dir)["events"]
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c"))
    q = F.floor(F.log(F.col("c").cast("double")) * F.lit(1e6))
    n = F.sum("c").cast("double")
    qln_n = F.floor(F.log(n) * F.lit(1e6)).cast("double") / F.lit(1e6)
    s_q = F.sum(F.col("c") * q).cast("double")
    return (
        counts.groupBy("user_id")
        .agg(F.sum("c").alias("n_events"),
             F.count("*").alias("n_types"),
             (qln_n - (s_q / F.lit(1e6)) / n).alias("entropy"))
        .orderBy("user_id")
    )


USER_ENTROPY_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       COUNT(*) AS n_types,
       CAST(floor(ln(CAST(SUM(c) AS DOUBLE)) * 1e6) AS DOUBLE) / 1e6
         - (CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6)
                              AS BIGINT)) AS DOUBLE) / 1e6)
           / CAST(SUM(c) AS DOUBLE) AS entropy
FROM counts GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "events_scd2_state": events_scd2_state,
    "events_markov_transitions": events_markov_transitions,
    "events_ab_test": events_ab_test,
    "events_path_trigrams": events_path_trigrams,
    "events_multitouch_attribution": events_multitouch_attribution,
    "events_ab_test_sequential": events_ab_test_sequential,
    "events_user_entropy": events_user_entropy,
}
ORACLE_SQL = {
    "events_scd2_state": SCD2_SQL,
    "events_markov_transitions": MARKOV_SQL,
    "events_ab_test": AB_TEST_SQL,
    "events_path_trigrams": PATH_TRIGRAMS_SQL,
    "events_multitouch_attribution": MULTITOUCH_SQL,
    "events_ab_test_sequential": AB_SEQUENTIAL_SQL,
    "events_user_entropy": USER_ENTROPY_SQL,
}


def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifecycle census: lifespan (first->last active day) in
    weeks x active-day count in log2 buckets -> number of users in
    each cell. The engagement-shape summary a growth team reads; the
    per-user aggregate is one map-side-combinable pass, the census is
    |cells|-sized.
    """
    from kmr_spark.llm_ops.textstats import _floor_log2

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"))
    per_user = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1"),
        F.count_distinct("day").alias("active_days"))
    lifespan_w = F.expr("(datediff(d1, d0) + 1) DIV 7")
    bucket = _floor_log2(F.col("active_days")).cast("long")
    return (
        per_user.select(lifespan_w.alias("lifespan_weeks"),
                        bucket.alias("active_bucket"))
        .groupBy("lifespan_weeks", "active_bucket")
        .agg(F.count("*").alias("n_users"))
    )


def _lifecycle_sql() -> str:
    from kmr_spark.llm_ops.textstats import _sql_floor_log2

    return f"""
WITH per_user AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1,
         COUNT(DISTINCT CAST(ts AS DATE)) AS active_days
  FROM events GROUP BY user_id)
SELECT CAST((date_diff('day', d0, d1) + 1) // 7 AS BIGINT)
         AS lifespan_weeks,
       CAST({_sql_floor_log2('active_days')} AS BIGINT) AS active_bucket,
       COUNT(*) AS n_users
FROM per_user GROUP BY lifespan_weeks, active_bucket
"""


LIFECYCLE_SQL = _lifecycle_sql()

QUERIES["events_user_lifecycle"] = events_user_lifecycle
ORACLE_SQL["events_user_lifecycle"] = LIFECYCLE_SQL


def events_ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout — the experimentation
    technique that cuts required sample sizes ~2-5x: each user's
    pre-period activity (value sum in the first half of the time
    range) is the covariate X, the experiment-period sum is Y, and the
    adjusted metric is Y - theta*(X - mean(X)) with
    theta = cov(X, Y)/var(X) estimated pooled. Output: one row with
    arm sizes, raw and CUPED-adjusted effect (b - a), theta, and the
    variance-reduction factor 1 - rho^2.

    Exactness: X/Y are integer cents per user; every moment is a
    DECIMAL(38,0) sum; theta/effects/rho are fixed float expressions —
    identical IEEE doubles in both engines. Plan: one per-user
    aggregate, one 2-row arm aggregate, one scalar merge.
    """
    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(F.min(F.unix_micros("ts")).alias("t0"),
                    F.max(F.unix_micros("ts")).alias("t1"))
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .select("user_id",
                F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
                F.when(F.unix_micros("ts") * 2 < F.col("t0") + F.col("t1"),
                       F.floor(F.col("value") * 100).cast("long"))
                .otherwise(F.lit(0)).alias("xc"),
                F.when(F.unix_micros("ts") * 2 >= F.col("t0") + F.col("t1"),
                       F.floor(F.col("value") * 100).cast("long"))
                .otherwise(F.lit(0)).alias("yc"))
        .groupBy("user_id", "arm")
        .agg(F.sum("xc").cast("decimal(38,0)").alias("x"),
             F.sum("yc").cast("decimal(38,0)").alias("y")))
    # ONE aggregate computes the pooled moments AND both arms' sums as
    # conditional aggregates (DECIMAL-exact): the previous m/a0/a1
    # crossJoin re-evaluated the whole per_user pipeline (and its two
    # events scans) once per branch — 6 corpus scans for one row.
    # Edge-case pin (ADVICE r11 #4): with an EMPTY arm the old
    # crossJoin(broadcast(a0)) form emitted ZERO rows, while this
    # no-GROUP-BY aggregate emits ONE row with NULL sums for that arm
    # (n_a/n_b = 0, the per-arm divisions go NULL/NaN downstream) —
    # which is exactly what the unchanged DuckDB oracle does
    # (aggregates without GROUP BY always yield a row), so the merged
    # form is the one that matches the oracle on that edge.
    j = per_user.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.count(F.when(F.col("arm") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("x"))).alias("sx_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("y"))).alias("sy_a"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("x"))).alias("sx_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("y"))).alias("sy_b"))
    d = lambda c: F.col(c).cast("double")
    n = d("n")
    varx = n * d("sxx") - d("sx") * d("sx")
    cov = n * d("sxy") - d("sx") * d("sy")
    vary = n * d("syy") - d("sy") * d("sy")
    theta = cov / varx
    mean_x = d("sx") / n
    raw = d("sy_b") / d("n_b") - d("sy_a") / d("n_a")
    adj_b = d("sy_b") / d("n_b") - theta * (d("sx_b") / d("n_b") - mean_x)
    adj_a = d("sy_a") / d("n_a") - theta * (d("sx_a") / d("n_a") - mean_x)
    rho2 = (cov * cov) / (varx * vary)
    return j.select(
        "n", F.col("n_a").alias("n_arm_a"), F.col("n_b").alias("n_arm_b"),
        theta.alias("theta"),
        raw.alias("effect_raw_cents"),
        (adj_b - adj_a).alias("effect_cuped_cents"),
        (F.lit(1.0) - rho2).alias("var_reduction_factor"))


CUPED_SQL = """
WITH b AS (SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
           FROM events),
per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(SUM(CASE WHEN epoch_us(ts) * 2 < (SELECT t0 + t1 FROM b)
                       THEN CAST(floor(value * 100) AS BIGINT)
                       ELSE 0 END) AS DECIMAL(38,0)) AS x,
         CAST(SUM(CASE WHEN epoch_us(ts) * 2 >= (SELECT t0 + t1 FROM b)
                       THEN CAST(floor(value * 100) AS BIGINT)
                       ELSE 0 END) AS DECIMAL(38,0)) AS y
  FROM events GROUP BY user_id, arm),
m AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM per_user),
a0 AS (SELECT COUNT(*) AS n_a, SUM(x) AS sx_a, SUM(y) AS sy_a
       FROM per_user WHERE arm = 0),
a1 AS (SELECT COUNT(*) AS n_b, SUM(x) AS sx_b, SUM(y) AS sy_b
       FROM per_user WHERE arm = 1)
SELECT n, n_a AS n_arm_a, n_b AS n_arm_b,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
       CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         - CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         AS effect_raw_cents,
       (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
       - (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
         AS effect_cuped_cents,
       1.0 - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
           / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS var_reduction_factor
FROM m, a0, a1
"""


QUERIES["events_ab_test_cuped"] = events_ab_test_cuped
ORACLE_SQL["events_ab_test_cuped"] = CUPED_SQL


BOUNCE_GAP_US = 30 * 60 * 1_000_000


def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate: share of sessions (30-min-gap islands per user)
    containing exactly one event — the engagement KPI next to the
    session census. One user-partitioned window pass + two bounded
    aggregates; integer permille.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = (
        F.coalesce((F.col("us") - F.lag("us").over(w)
                    > BOUNCE_GAP_US).cast("long"), F.lit(1)))
    sess = (
        ev.withColumn("new_s", new_sess)
        .withColumn("sess_id", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events")))
    return sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounces"),
        F.expr("(1000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))"
               " DIV COUNT(*)").alias("bounce_permille"))


BOUNCE_SQL = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
flagged AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id)
                   > {BOUNCE_GAP_US} THEN 1
              WHEN LAG(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) IS NULL THEN 1
              ELSE 0 END AS new_s,
         event_id
  FROM e),
sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged),
counts AS (SELECT user_id, sess_id, COUNT(*) AS n_events
           FROM sess GROUP BY user_id, sess_id)
SELECT COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST((1000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT)
         AS bounce_permille
FROM counts
"""


QUERIES["events_bounce_rate"] = events_bounce_rate
ORACLE_SQL["events_bounce_rate"] = BOUNCE_SQL


def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many active users are NEW
    (first-ever day) vs RETURNING. One distinct (user, day) pass, a
    per-user min-day aggregate, and a broadcast-scale join — the DAU
    decomposition every growth dashboard leads with.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"))
    ud = ev.distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(first, "user_id")
        .groupBy("day")
        .agg(F.sum((F.col("day") == F.col("first_day")).cast("long"))
             .alias("n_new"),
             F.sum((F.col("day") != F.col("first_day")).cast("long"))
             .alias("n_returning"))
    )


NEW_RETURNING_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id)
SELECT day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM ud JOIN f USING (user_id)
GROUP BY day
"""


ABANDON_WINDOW_US = 3600 * 1_000_000


def events_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart-abandonment census: per day, click sessions that did vs
    did not convert to a purchase within 1h of the FIRST click — the
    funnel-complement metric ops teams alarm on. Keyed aggregates +
    one user join; integer permille.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"),
        F.to_date("ts").alias("day"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .groupBy("user_id", "day").agg(F.min("us").alias("c_us")))
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("p_us"))
    converted = (
        clicks.join(purch, "user_id")
        .filter((F.col("p_us") > F.col("c_us"))
                & (F.col("p_us") <= F.col("c_us") + ABANDON_WINDOW_US))
        .select("user_id", "day").distinct())
    return (
        clicks.join(converted.withColumn("conv", F.lit(1)),
                    ["user_id", "day"], "left")
        .groupBy("day")
        .agg(F.count("*").alias("n_click_days"),
             F.sum(F.coalesce("conv", F.lit(0))).alias("n_converted"),
             F.expr("(1000 * (COUNT(*) - SUM(coalesce(conv, 0))))"
                    " DIV COUNT(*)").alias("abandon_permille"))
    )


ABANDON_SQL = f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                  CAST(ts AS DATE) AS day FROM events),
clicks AS (SELECT user_id, day, MIN(us) AS c_us FROM e
           WHERE event_type = 'click' GROUP BY user_id, day),
purch AS (SELECT user_id, us AS p_us FROM e WHERE event_type = 'purchase'),
conv AS (
  SELECT DISTINCT c.user_id, c.day
  FROM clicks c JOIN purch p ON c.user_id = p.user_id
  WHERE p.p_us > c.c_us AND p.p_us <= c.c_us + {ABANDON_WINDOW_US}),
j AS (
  SELECT c.user_id, c.day,
         CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END AS conv
  FROM clicks c LEFT JOIN conv v
    ON c.user_id = v.user_id AND c.day = v.day)
SELECT day, COUNT(*) AS n_click_days,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       CAST((1000 * (COUNT(*) - SUM(conv))) // COUNT(*) AS BIGINT)
         AS abandon_permille
FROM j GROUP BY day
"""


QUERIES["events_new_vs_returning"] = events_new_vs_returning
QUERIES["events_cart_abandonment"] = events_cart_abandonment
ORACLE_SQL["events_new_vs_returning"] = NEW_RETURNING_SQL
ORACLE_SQL["events_cart_abandonment"] = ABANDON_SQL


def events_retention_day_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D1/D7/D30 retention: of the users first seen on day D,
    what permille were active exactly N days later. One distinct
    (user, day) pass, a first-day aggregate, and N broadcast-shaped
    semi-joins; output is |cohort days| x 3 metrics.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"))
    ud = ev.distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("d0"))
    joined = ud.join(first, "user_id").select(
        "user_id", "d0", F.datediff("day", F.col("d0")).alias("off"))
    per_cohort = (
        joined.groupBy("d0")
        .agg(F.count_distinct("user_id").alias("n_cohort"),
             *[F.count_distinct(F.when(F.col("off") == n, F.col("user_id")))
               .alias(f"n_d{n}") for n in (1, 7, 30)]))
    return per_cohort.select(
        F.col("d0").alias("cohort_day"), "n_cohort",
        *[x for n in (1, 7, 30) for x in (
            F.col(f"n_d{n}"),
            F.expr(f"(1000 * n_d{n}) DIV n_cohort")
            .alias(f"retention_d{n}_permille"))])


RETENTION_DN_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS d0 FROM ud GROUP BY user_id),
j AS (SELECT ud.user_id, f.d0,
             date_diff('day', f.d0, ud.day) AS off
      FROM ud JOIN f USING (user_id))
SELECT d0 AS cohort_day, COUNT(DISTINCT user_id) AS n_cohort,
       COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END) AS n_d1,
       (1000 * COUNT(DISTINCT CASE WHEN off = 1 THEN user_id END))
         // COUNT(DISTINCT user_id) AS retention_d1_permille,
       COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END) AS n_d7,
       (1000 * COUNT(DISTINCT CASE WHEN off = 7 THEN user_id END))
         // COUNT(DISTINCT user_id) AS retention_d7_permille,
       COUNT(DISTINCT CASE WHEN off = 30 THEN user_id END) AS n_d30,
       (1000 * COUNT(DISTINCT CASE WHEN off = 30 THEN user_id END))
         // COUNT(DISTINCT user_id) AS retention_d30_permille
FROM j GROUP BY d0
"""


QUERIES["events_retention_day_n"] = events_retention_day_n
ORACLE_SQL["events_retention_day_n"] = RETENTION_DN_SQL


def events_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly stickiness (avg DAU / WAU, permille): how much of each
    week's audience shows up on an average day. Distinct (user, day)
    pass -> per-day and per-week distinct aggregates, integer ratio
    (1000 * sum of daily actives) DIV (7 * weekly actives).
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", F.to_date("ts").alias("day"))
    ud = ev.distinct().withColumn(
        "week", F.expr("CAST(unix_date(day) DIV 7 AS BIGINT)"))
    dau = (ud.groupBy("week", "day")
           .agg(F.count("*").alias("dau"))
           .groupBy("week")
           .agg(F.sum("dau").alias("sum_dau"),
                F.count("*").alias("n_days")))
    wau = ud.groupBy("week").agg(F.count_distinct("user_id").alias("wau"))
    return (
        dau.join(wau, "week")
        .selectExpr("week", "n_days", "sum_dau", "wau",
                    "(1000 * sum_dau) DIV (7 * wau)"
                    " AS stickiness_permille"))


WAU_STICKINESS_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
w AS (SELECT user_id, day,
             CAST((day - DATE '1970-01-01') // 7 AS BIGINT) AS week
      FROM ud),
dau AS (
  SELECT week, CAST(SUM(dau) AS BIGINT) AS sum_dau, COUNT(*) AS n_days
  FROM (SELECT week, day, COUNT(*) AS dau FROM w GROUP BY week, day)
  GROUP BY week),
wau AS (SELECT week, COUNT(DISTINCT user_id) AS wau FROM w GROUP BY week)
SELECT week, n_days, sum_dau, wau,
       (1000 * sum_dau) // (7 * wau) AS stickiness_permille
FROM dau JOIN wau USING (week)
"""


QUERIES["events_wau_stickiness"] = events_wau_stickiness
ORACLE_SQL["events_wau_stickiness"] = WAU_STICKINESS_SQL


def events_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth distribution: log2 histogram of events-per-session
    (30-min-gap islands) — the engagement-depth complement to the
    bounce rate. Same single window pass; bucket census output."""
    from kmr_spark.llm_ops.textstats import _floor_log2

    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_sess = (
        F.coalesce((F.col("us") - F.lag("us").over(w)
                    > BOUNCE_GAP_US).cast("long"), F.lit(1)))
    sess = (
        ev.withColumn("new_s", new_sess)
        .withColumn("sess_id", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events")))
    bucket = _floor_log2(F.col("n_events")).cast("long")
    return (sess.groupBy(bucket.alias("depth_bucket"))
            .agg(F.count("*").alias("n_sessions"),
                 F.min("n_events").alias("min_events"),
                 F.max("n_events").alias("max_events")))


def _session_depth_sql() -> str:
    from kmr_spark.llm_ops.textstats import _sql_floor_log2

    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
flagged AS (
  SELECT user_id, us, event_id,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                      ORDER BY us, event_id)
                   > {BOUNCE_GAP_US} THEN 1
              WHEN LAG(us) OVER (PARTITION BY user_id
                                 ORDER BY us, event_id) IS NULL THEN 1
              ELSE 0 END AS new_s
  FROM e),
sess AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged),
counts AS (SELECT user_id, sess_id, COUNT(*) AS n_events
           FROM sess GROUP BY user_id, sess_id)
SELECT CAST({_sql_floor_log2('n_events')} AS BIGINT) AS depth_bucket,
       COUNT(*) AS n_sessions, MIN(n_events) AS min_events,
       MAX(n_events) AS max_events
FROM counts GROUP BY depth_bucket
"""


SESSION_DEPTH_SQL = _session_depth_sql()

QUERIES["events_session_depth_histogram"] = events_session_depth_histogram
ORACLE_SQL["events_session_depth_histogram"] = SESSION_DEPTH_SQL


def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: for every pair of event types, the
    distinct-user intersection, union, and Jaccard permille — "do the
    people who error also purchase?" without materializing user sets
    anywhere but the keyed joins.

    Plan: distinct (type, user) once (one shuffle), per-type counts,
    then a user-keyed self-join producing |pairs-per-user| rows —
    bounded by |types|² per user. All integers.
    """
    ev = load_tables(spark, sf_dir)["events"]
    tu = ev.select("event_type", "user_id").distinct().persist()
    sizes = tu.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b").agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n_users").alias("n_b"))
    out = (
        both.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            (F.col("n_a") + F.col("n_b") - F.col("n_both")).alias("n_union"),
            F.expr("(n_both * 1000) DIV (n_a + n_b - n_both)")
            .alias("jaccard_permille"))
        .orderBy("type_a", "type_b")
    )
    return materialize_release(out, tu)


AUDIENCE_OVERLAP_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, COUNT(*) AS n_users FROM tu GROUP BY 1),
both_c AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_both,
       sa.n_users + sb.n_users - n_both AS n_union,
       (n_both * 1000) // (sa.n_users + sb.n_users - n_both)
         AS jaccard_permille
FROM both_c
JOIN sizes sa ON sa.event_type = type_a
JOIN sizes sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""


QUERIES["events_audience_overlap"] = events_audience_overlap
ORACLE_SQL["events_audience_overlap"] = AUDIENCE_OVERLAP_SQL


#: bot heuristics: max events in one clock minute / total volume
BOT_PEAK_PER_MIN = 2
BOT_TOTAL_EVENTS = 75


def events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abuse/bot triage census: flag users whose peak per-clock-minute
    event rate or total volume crosses the heuristic thresholds, and
    report the flag combinations with their event footprint — the
    first-pass filter a data pipeline applies before user-level
    metrics (bots inflate every engagement statistic downstream).

    Plan: per-(user, minute) count (keyed shuffle, map-side combined),
    then per-user max/sum (second small shuffle), then a 4-row census.
    Never materializes per-event state; both aggregations scale as
    keyed combiners. Integer outputs only.
    """
    ev = load_tables(spark, sf_dir)["events"]
    per_min = (
        ev.groupBy("user_id", F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count("*").alias("n"))
    )
    users = per_min.groupBy("user_id").agg(
        F.max("n").alias("peak_per_min"), F.sum("n").alias("total"))
    flagged = users.select(
        (F.col("peak_per_min") >= BOT_PEAK_PER_MIN).alias("rate_flag"),
        (F.col("total") >= BOT_TOTAL_EVENTS).alias("volume_flag"),
        "total")
    return (
        flagged.groupBy("rate_flag", "volume_flag")
        .agg(F.count("*").alias("n_users"),
             F.sum("total").alias("n_events"),
             F.max("total").alias("max_events"))
        .orderBy("rate_flag", "volume_flag")
    )


BOT_FLAGS_SQL = f"""
WITH per_min AS (
  SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
users AS (
  SELECT user_id, MAX(n) AS peak_per_min, CAST(SUM(n) AS BIGINT) AS total
  FROM per_min GROUP BY user_id)
SELECT peak_per_min >= {BOT_PEAK_PER_MIN} AS rate_flag,
       total >= {BOT_TOTAL_EVENTS} AS volume_flag,
       COUNT(*) AS n_users, CAST(SUM(total) AS BIGINT) AS n_events,
       MAX(total) AS max_events
FROM users GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["events_bot_flags"] = events_bot_flags
ORACLE_SQL["events_bot_flags"] = BOT_FLAGS_SQL


#: bit per channel (alphabetical): every non-purchase event type
SHAPLEY_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
_SHAPLEY_N = len(SHAPLEY_CHANNELS)
#: |S|! * (n-1-|S|)! for n=4, indexed by |S| — x24 integer weights
_SHAPLEY_W = (6, 2, 2, 6)


def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution: each converting user
    contributes their PRE-first-purchase touchset (the distinct
    non-purchase event types seen before their first purchase, as a
    4-bit mask), the coalition value v(S) counts users whose nonempty
    touchset fits inside S, and each channel's Shapley value is the
    classic marginal-contribution average — computed EXACTLY because
    n=4 makes the 2^4 subset lattice enumerable and the |S|!(n-1-|S|)!
    weights integral after scaling by n!=24. phi_x24 is therefore an
    integer (hash-exact); sum(phi_x24) = 24 * v(full) is test-pinned.

    Scale: everything after the two user-keyed aggregations (first
    purchase, bit_or of touch bits) is arithmetic on a <=15-row mask
    census — the subset lattice and the marginal sums are broadcast
    joins of 16-row frames regardless of input size. The multitouch /
    markov attribution queries split credit by position/transition;
    Shapley is the order-free, incrementality-flavored split.
    """
    ev = load_tables(spark, sf_dir)["events"]
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id").agg(F.min("ts").alias("fp_ts"))
    )
    bit_expr = "CASE " + " ".join(
        f"WHEN event_type = '{n}' THEN {b}"
        for n, b in SHAPLEY_CHANNELS) + " ELSE 0 END"
    masks = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("fp_ts"))
        .select("user_id", F.expr(bit_expr).alias("b"))
        .groupBy("user_id").agg(F.expr("bit_or(b)").alias("mask"))
        .filter(F.col("mask") > 0)
        .groupBy("mask").agg(F.count("*").alias("cnt"))
    )
    full = (1 << _SHAPLEY_N) - 1
    subsets = spark.range(full + 1).select(F.col("id").cast("int").alias("s"))
    # 16-row lattice frame read THREE times (vs, vc, totals) — without
    # the persist each reference re-ran the two user-keyed events
    # aggregations behind masks (6 corpus scans for a 16-row frame)
    v = (
        subsets.join(F.broadcast(masks),
                     F.expr("CAST(mask & s AS INT) = CAST(mask AS INT)"),
                     "left")
        .groupBy("s").agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("v"))
        .persist()
    )
    chan = spark.createDataFrame(
        list(SHAPLEY_CHANNELS), "channel string, bit int")
    w_case0 = "CASE " + " ".join(
        f"WHEN bit_count(CAST(s0 AS BIGINT)) = {k} THEN {w}"
        for k, w in enumerate(_SHAPLEY_W)) + " END"
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vc = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    phi = (
        chan.crossJoin(F.broadcast(vs))
        .filter(F.expr("CAST(s0 & bit AS INT) = 0"))
        .join(F.broadcast(vc), F.expr("CAST(s1 AS INT) = CAST(s0 | bit AS INT)"))
        .select("channel", "bit",
                (F.expr(f"CAST(({w_case0}) AS BIGINT)")
                 * (F.col("v1") - F.col("v0"))).alias("term"))
        .groupBy("channel", "bit").agg(F.sum("term").alias("phi_x24"))
    )
    totals = v.filter(F.col("s") == full).select(
        F.col("v").alias("n_attributable"))
    out = (
        phi.crossJoin(F.broadcast(totals))
        .select(
            "channel", "phi_x24",
            (F.col("phi_x24").cast("double") / F.lit(24.0)).alias("phi"),
            "n_attributable")
        .orderBy("channel")
    )
    return materialize_release(out, v)


def _shapley_sql() -> str:
    bit_case = "CASE " + " ".join(
        f"WHEN event_type = '{n}' THEN {b}"
        for n, b in SHAPLEY_CHANNELS) + " ELSE 0 END"
    w_case = "CASE " + " ".join(
        f"WHEN bit_count(CAST(s.s AS BIGINT)) = {k} THEN {w}"
        for k, w in enumerate(_SHAPLEY_W)) + " END"
    chans = ", ".join(f"('{n}', {b})" for n, b in SHAPLEY_CHANNELS)
    full = (1 << _SHAPLEY_N) - 1
    return f"""
WITH fp AS (
  SELECT user_id, MIN(ts) AS fp_ts FROM events
  WHERE event_type = 'purchase' GROUP BY 1),
masks AS (
  SELECT mask, COUNT(*) AS cnt FROM (
    SELECT e.user_id, bit_or({bit_case}) AS mask
    FROM events e JOIN fp ON fp.user_id = e.user_id
    WHERE e.event_type <> 'purchase' AND e.ts < fp.fp_ts
    GROUP BY e.user_id)
  WHERE mask > 0 GROUP BY mask),
subsets AS (SELECT CAST(i AS INTEGER) AS s FROM range(0, {full + 1}) t(i)),
v AS (
  SELECT s.s, CAST(COALESCE(SUM(m.cnt), 0) AS BIGINT) AS v
  FROM subsets s LEFT JOIN masks m ON (m.mask & s.s) = m.mask
  GROUP BY s.s),
chan(channel, bit) AS (VALUES {chans}),
phi AS (
  SELECT c.channel, CAST(SUM(
           CAST({w_case} AS BIGINT) * (v1.v - s.v)) AS BIGINT) AS phi_x24
  FROM chan c
  JOIN v s ON (s.s & c.bit) = 0
  JOIN v v1 ON v1.s = (s.s | c.bit)
  GROUP BY c.channel)
SELECT p.channel, p.phi_x24,
       CAST(p.phi_x24 AS DOUBLE) / 24.0 AS phi,
       t.v AS n_attributable
FROM phi p CROSS JOIN (SELECT v FROM v WHERE s = {full}) t
ORDER BY p.channel
"""


SHAPLEY_SQL = _shapley_sql()

QUERIES["events_shapley_attribution"] = events_shapley_attribution
ORACLE_SQL["events_shapley_attribution"] = SHAPLEY_SQL
