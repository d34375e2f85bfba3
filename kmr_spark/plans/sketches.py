"""Approximate-distinct sketches with fully reproducible estimates.

Spark's approx_count_distinct and DuckDB's approx_distinct use
different HLL implementations, so their estimates can't be compared.
This module implements HyperLogLog (Flajolet et al. 2007) from
scratch with PORTABLE integer arithmetic — the same multiplicative
hash, register split, and leading-zero rank on both engines — so the
*approximate* estimate is bit-reproducible and sits behind the same
exact-value oracle gate as every other query.

Why it matters at 100 TB: the register table is the whole state — m
doubles per group — and merging two sketches is a per-register MAX,
so partial aggregation (map-side combine) applies and the shuffle
carries m values per group instead of the distinct keys themselves.
That's the fundamental trade the reference's count-distinct idiom
(kmr_count_keys over a full shuffle, src/kmrmoreops.c:1009) can't
make.

The plan: one narrow projection computes (bucket, rho) per row, one
groupBy(group, bucket) MAX (combiner-friendly, duplicates collapse
map-side), one groupBy(group) to fold the registers into the estimate.
No distinct, no count(distinct) shuffle of raw keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.session import load_tables, scratch_dir

HLL_B = 6                 # 2^6 = 64 registers -> ~13% standard error
HLL_M = 1 << HLL_B
HLL_ALPHA = 0.709         # alpha_64 from the HLL paper
HASH_P = 2_147_483_647    # 2^31 - 1 (Mersenne prime)
HASH_BITS = 31            # hash domain [0, P) ⊂ [0, 2^31)
W_BITS = HASH_BITS - HLL_B


def _rho_when(w):
    """rank = leading zeros of the W_BITS-wide value + 1, as a CASE
    chain of integer comparisons (no float log2 — portable)."""
    chain = None
    for k in range(W_BITS):  # most-significant bit first
        cond = w >= F.lit(1 << (W_BITS - 1 - k))
        branch = F.lit(k + 1)
        chain = F.when(cond, branch) if chain is None else chain.when(cond, branch)
    return chain.otherwise(F.lit(W_BITS + 1))  # w == 0


def _sql_rho(w: str) -> str:
    whens = " ".join(
        f"WHEN {w} >= {1 << (W_BITS - 1 - k)} THEN {k + 1}"
        for k in range(W_BITS))
    return f"(CASE {whens} ELSE {W_BITS + 1} END)"


def _hash31(x):
    """Two square-mod rounds over the Mersenne prime 2^31-1 — enough
    mixing to break arithmetic-progression keys (measured <=10% HLL-64
    error on sequential ids vs 66% for one multiplicative round), while
    every intermediate stays under 2^63 so Spark longs and DuckDB
    BIGINTs agree exactly."""
    x0 = x % HASH_P
    x2 = ((x0 + 40_503) * (x0 + 40_503)) % HASH_P
    x3 = (x2 * 16_807 + 12_345) % HASH_P
    x4 = (x3 * x3) % HASH_P
    return (x4 * 48_271) % HASH_P


def _sql_hash31(x: str) -> str:
    x0 = f"({x} % {HASH_P})"
    x2 = f"((({x0} + 40503) * ({x0} + 40503)) % {HASH_P})"
    x3 = f"(({x2} * 16807 + 12345) % {HASH_P})"
    x4 = f"(({x3} * {x3}) % {HASH_P})"
    return f"(({x4} * 48271) % {HASH_P})"


import math as _math

#: linear-counting estimates m * ln(m / V) for every possible
#: zero-register count V, computed ONCE in Python — the single source
#: of truth both engines quote as literals (see hll_distinct).
_LINEAR_COUNT = {v: HLL_M * _math.log(HLL_M / v) for v in range(1, HLL_M)}


def _sql_linear_count(v: str) -> str:
    # CAST each literal to DOUBLE explicitly: DuckDB parses a bare
    # decimal literal as DECIMAL, and its DECIMAL->DOUBLE conversion
    # (int128 / 10^scale) can land 1 ulp off the correctly-rounded
    # string->double parse Spark's F.lit ships — caught bit-exactly by
    # events_hll_sliding's V=26 cell (57.650338901644155 vs ...16)
    whens = " ".join(
        f"WHEN {v} = {vz} THEN CAST('{est!r}' AS DOUBLE)"
        for vz, est in _LINEAR_COUNT.items())
    return f"(CASE {whens} END)"


def hll_registers(df: DataFrame, key: str,
                  group: str | list[str]) -> DataFrame:
    """The sketch STATE: (group..., bucket, m_j) register table.
    Mergeable by per-register MAX (associative + idempotent), which is
    what makes the sketch streamable and partition-order-free."""
    groups = [group] if isinstance(group, str) else list(group)
    h = _hash31(F.col(key))
    bucket = h % HLL_M
    w = (h / HLL_M).cast("long")
    return (
        df.select(*[F.col(g) for g in groups], bucket.alias("bucket"),
                  _rho_when(w).alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def merge_hll_registers(a: DataFrame, b: DataFrame,
                        groups: list[str]) -> DataFrame:
    """Fold two register tables: per-register MAX — the HLL merge."""
    return (
        a.unionByName(b)
        .groupBy(*groups, "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )


def hll_fold(regs: DataFrame, group: str | list[str]) -> DataFrame:
    """Register table -> (group..., hll_est, n_registers_hit)."""
    groups = [group] if isinstance(group, str) else list(group)
    # sum(2^-M_j) over present registers; absent registers contribute
    # 2^0 = 1 each. All terms are dyadic rationals with tiny exponent
    # spread, so the double sum is exact and order-independent.
    per_group = regs.groupBy(*groups).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("present_sum"),
        F.count("*").alias("n_present"),
    )
    raw = (F.lit(HLL_ALPHA * HLL_M * HLL_M)
           / (F.col("present_sum") + (F.lit(HLL_M) - F.col("n_present"))))
    v = F.lit(HLL_M) - F.col("n_present")  # zero registers
    # linear counting: m * ln(m/V). ln is transcendental — JVM
    # Math.log and DuckDB's libm are each only 1-ulp-accurate and may
    # disagree in the last bit, so the V -> estimate table (63 entries)
    # is precomputed in Python once and emitted as LITERALS into both
    # engines; the branch is then table lookup, not float math.
    lc = None
    for vz, est_v in _LINEAR_COUNT.items():
        lc = (F.when(v == F.lit(vz), F.lit(est_v)) if lc is None
              else lc.when(v == F.lit(vz), F.lit(est_v)))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), lc).otherwise(raw)
    return per_group.select(
        *[F.col(g) for g in groups],
        est.alias("hll_est"),
        F.col("n_present").cast("long").alias("n_registers_hit"),
    )


def hll_distinct(df: DataFrame, key: str,
                 group: str | list[str]) -> DataFrame:
    """(group..., hll_est, n_registers_hit) via portable HLL-64;
    ``group`` may be one column or a composite key list."""
    return hll_fold(hll_registers(df, key, group), group)


def events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type approximate distinct users (portable HLL-64) alongside
    the exact count — the estimate, its inputs, and its error are all
    oracle-gated."""
    ev = load_tables(spark, sf_dir)["events"]
    approx = hll_distinct(ev, "user_id", "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return (
        approx.join(exact, "event_type")
        .select("event_type", "n_exact", "hll_est", "n_registers_hit")
        .orderBy("event_type")
    )


EVENTS_HLL_SQL = f"""
WITH hashed AS (
  SELECT event_type, {_sql_hash31('user_id')} AS h
  FROM events),
rows_ AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         {_sql_rho(f"(h // {HLL_M})")} AS rho
  FROM hashed),
regs AS (
  SELECT event_type, bucket, MAX(rho) AS m_j
  FROM rows_ GROUP BY event_type, bucket),
per_group AS (
  SELECT event_type,
         SUM(POWER(2.0, -m_j)) AS present_sum,
         COUNT(*) AS n_present
  FROM regs GROUP BY event_type),
est AS (
  SELECT event_type, n_present,
         CAST({HLL_ALPHA * HLL_M * HLL_M} AS DOUBLE) / (present_sum + ({HLL_M} - n_present))
           AS raw,
         {HLL_M} - n_present AS v
  FROM per_group),
approx AS (
  SELECT event_type,
         CASE WHEN raw <= {2.5 * HLL_M} AND v > 0
              THEN {_sql_linear_count('v')}
              ELSE raw END AS hll_est,
         CAST(n_present AS BIGINT) AS n_registers_hit
  FROM est),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type)
SELECT a.event_type, e.n_exact, a.hll_est, a.n_registers_hit
FROM approx a JOIN exact e ON a.event_type = e.event_type
ORDER BY a.event_type
"""


def events_hll_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches compose with windows: per (event_type, hour) HLL-64
    distinct users — the shape of a streaming-dashboard rollup where
    per-window distinct counts must stay constant-state and mergeable.
    Group key is composite; everything else is the same portable
    register pipeline as events_hll_users."""
    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "hour_ts", F.date_trunc("hour", "ts"))
    return (
        hll_distinct(ev, "user_id", ["event_type", "hour_ts"])
        .orderBy("event_type", "hour_ts")
    )


def events_hll_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly HLL rollup maintained INCREMENTALLY from the event
    stream (streaming/windows.py hll_stream_to_state): per micro-batch
    register deltas max-merged into a versioned state table, folded to
    estimates at the end. Because register merge is associative and
    idempotent, the result is bit-equal to the batch events_hll_hourly
    whatever the micro-batch split — same oracle proves it."""
    import shutil

    from kmr_spark.session import sized_shuffle_partitions
    from kmr_spark.streaming.windows import (hll_stream_to_state,
                                             sized_state_partitions,
                                             stream_events)

    ck = scratch_dir("kmr_stream_ck_")
    st = scratch_dir("kmr_stream_state_")
    try:
        with sized_shuffle_partitions(
                spark, n_partitions=sized_state_partitions(spark, sf_dir)):
            regs = hll_stream_to_state(stream_events(spark, sf_dir), st, ck)
        out = hll_fold(regs, ["event_type", "hour_ts"]).orderBy(
            "event_type", "hour_ts")
        # the state files are about to be deleted; pin the rows first
        return out.localCheckpoint()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(st, ignore_errors=True)


def _hll_hourly_sql() -> str:
    return f"""
WITH hashed AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         {_sql_hash31('user_id')} AS h
  FROM events),
rows_ AS (
  SELECT event_type, hour_ts, h % {HLL_M} AS bucket,
         {_sql_rho(f"(h // {HLL_M})")} AS rho
  FROM hashed),
regs AS (
  SELECT event_type, hour_ts, bucket, MAX(rho) AS m_j
  FROM rows_ GROUP BY event_type, hour_ts, bucket),
per_group AS (
  SELECT event_type, hour_ts,
         SUM(POWER(2.0, -m_j)) AS present_sum,
         COUNT(*) AS n_present
  FROM regs GROUP BY event_type, hour_ts),
est AS (
  SELECT event_type, hour_ts, n_present,
         CAST({HLL_ALPHA * HLL_M * HLL_M} AS DOUBLE) / (present_sum + ({HLL_M} - n_present))
           AS raw,
         {HLL_M} - n_present AS v
  FROM per_group)
SELECT event_type, hour_ts,
       CASE WHEN raw <= {2.5 * HLL_M} AND v > 0
            THEN {_sql_linear_count('v')}
            ELSE raw END AS hll_est,
       CAST(n_present AS BIGINT) AS n_registers_hit
FROM est ORDER BY event_type, hour_ts
"""


HLL_HOURLY_SQL = _hll_hourly_sql()


N_QBUCKETS = 256
QUANTS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def events_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-type quantiles of `value` from a fixed-width
    256-bucket histogram — the mergeable-sketch alternative to the
    exact-percentile query (events_exact_percentiles), with the same
    reproducibility contract as the HLL: bucket arithmetic is identical
    IEEE ops in both engines, so the *approximate* answers are
    bit-equal and oracle-gated.

    Scale shape: one bounds aggregate, one (type, bucket) count — both
    map-side combinable, shuffling at most types x 256 rows — and a
    256-row-per-type window for the cumulative pick. The exact-quantile
    alternative shuffles every distinct value; the histogram's error is
    bounded by bucket width (range/256) while its state is constant.
    """
    from pyspark.sql import Window

    # drop NULL measurements explicitly: least()/LEAST() skip NULLs in
    # BOTH engines, so an unguarded NULL value would silently clamp
    # into the top bucket instead of erroring or being excluded
    ev = (load_tables(spark, sf_dir)["events"]
          .select("event_type", "value").filter(F.col("value").isNotNull()))
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    width_frac = (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.floor(width_frac * N_QBUCKETS), F.lit(N_QBUCKETS - 1))
    ).cast("long")
    hist = (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", "mn", "mx", bucket.alias("bucket"))
        .groupBy("event_type", "mn", "mx", "bucket")
        .agg(F.count("*").alias("c"))
    )
    w_cum = (Window.partitionBy("event_type").orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type", "mn", "mx", "bucket", "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"))
    aggs = [F.count("*").alias("_nb"), F.min("mn").alias("mn"),
            F.min("mx").alias("mx"), F.max("n").alias("n")]
    for name, q in QUANTS:
        k = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(F.min(F.when(F.col("cum") >= k, F.col("bucket")))
                    .alias(f"b_{name}"))
    folded = cum.groupBy("event_type").agg(*aggs)
    out_cols = [F.col("event_type"), F.col("n")]
    for name, _ in QUANTS:
        est = (F.col("mn")
               + F.col(f"b_{name}") * (F.col("mx") - F.col("mn")) / N_QBUCKETS)
        out_cols.append(est.alias(f"{name}_est"))
    return folded.select(*out_cols).orderBy("event_type")


def _sketch_quantiles_sql() -> str:
    qcols = ", ".join(
        f"MIN(CASE WHEN cum >= CEIL({q} * n) THEN bucket END) AS b_{name}"
        for name, q in QUANTS)
    ests = ", ".join(
        f"mn + b_{name} * (mx - mn) / {N_QBUCKETS} AS {name}_est"
        for name, _ in QUANTS)
    return f"""
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL),
bounds AS (
  SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
  FROM ev GROUP BY event_type),
bucketed AS (
  SELECT e.event_type, b.mn, b.mx,
         CAST(CASE WHEN b.mx = b.mn THEN 0
              ELSE LEAST(FLOOR((e.value - b.mn) / (b.mx - b.mn) * {N_QBUCKETS}),
                         {N_QBUCKETS - 1}) END AS BIGINT) AS bucket
  FROM ev e JOIN bounds b ON e.event_type = b.event_type),
hist AS (
  SELECT event_type, mn, mx, bucket, COUNT(*) AS c
  FROM bucketed GROUP BY event_type, mn, mx, bucket),
cum AS (
  SELECT event_type, mn, mx, bucket, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM hist),
folded AS (
  SELECT event_type, MIN(mn) AS mn, MIN(mx) AS mx,
         CAST(MAX(n) AS BIGINT) AS n, {qcols}
  FROM cum GROUP BY event_type)
SELECT event_type, n, {ests}
FROM folded ORDER BY event_type
"""


SKETCH_QUANTILES_SQL = _sketch_quantiles_sql()


QUERIES = {
    "events_hll_users": events_hll_users,
    "events_hll_hourly": events_hll_hourly,
    "events_hll_streamed": events_hll_streamed,
    "events_sketch_quantiles": events_sketch_quantiles,
}
ORACLE_SQL = {
    "events_hll_users": EVENTS_HLL_SQL,
    "events_hll_hourly": HLL_HOURLY_SQL,
    "events_hll_streamed": HLL_HOURLY_SQL,
    "events_sketch_quantiles": SKETCH_QUANTILES_SQL,
}


CMS_D = 4
CMS_W = 1024
#: per-row affine pre-mix constants (kept small so every intermediate
#: stays below 2^63 in both engines)
CMS_AB = [(1, 17), (31, 101), (257, 7), (8191, 3)]


def _cms_bucket(u, d: int):
    a, b = CMS_AB[d]
    return _hash31((u % HASH_P) * a + b) % CMS_W


def _sql_cms_bucket(u: str, d: int) -> str:
    a, b = CMS_AB[d]
    return f"({_sql_hash31(f'((({u}) % {HASH_P}) * {a} + {b})')} % {CMS_W})"


def events_heavy_users_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: a {CMS_D}x{CMS_W} counter matrix
    over user activity, read back for the exact top-20 users — per
    user the true count and the CMS estimate (an upper bound; the gap
    is the sketch's collision error). The sketch is what a 100 TB
    pipeline ships between stages instead of a user-count table: the
    counter matrix is 4KB regardless of user count.

    Deterministic affine-premix hashes shared bit-for-bit with the
    DuckDB oracle; the counter build is one map-side-combinable
    aggregate over 4x exploded (row, bucket) pairs.
    """
    ev = load_tables(spark, sf_dir)["events"].select("user_id")
    pairs = ev.select(F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _cms_bucket(F.col("user_id"), d).alias("bucket"))
        for d in range(CMS_D)
    ])).alias("p")).select("p.d", "p.bucket")
    counters = pairs.groupBy("d", "bucket").agg(F.count("*").alias("c"))
    top = (ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
           .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
           .limit(20))
    cand = top.select("user_id", "exact_n", F.explode(F.array(*[
        F.struct(F.lit(d).alias("d"),
                 _cms_bucket(F.col("user_id"), d).alias("bucket"))
        for d in range(CMS_D)
    ])).alias("p")).select("user_id", "exact_n", "p.d", "p.bucket")
    return (
        cand.join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )


def _cms_sql() -> str:
    bucket_rows = " UNION ALL ".join(
        f"SELECT user_id, {d} AS d, {_sql_cms_bucket('user_id', d)} AS bucket"
        " FROM e" for d in range(CMS_D))
    return f"""
WITH e AS (SELECT user_id FROM events),
pairs AS ({bucket_rows}),
counters AS (SELECT d, bucket, COUNT(*) AS c
             FROM pairs GROUP BY d, bucket),
top AS (SELECT user_id, COUNT(*) AS exact_n FROM e GROUP BY user_id
        ORDER BY exact_n DESC, user_id ASC LIMIT 20),
cand AS (
  SELECT t.user_id, t.exact_n, d.d,
         {_sql_cms_bucket('t.user_id', 0)} AS b0
  FROM top t, (SELECT unnest(range({CMS_D})) AS d) d),
cand2 AS (
  SELECT user_id, exact_n, d,
         CASE d {' '.join(f"WHEN {d} THEN {_sql_cms_bucket('user_id', d)}" for d in range(CMS_D))} END AS bucket
  FROM cand)
SELECT c2.user_id, c2.exact_n, MIN(ct.c) AS cms_n
FROM cand2 c2 JOIN counters ct ON c2.d = ct.d AND c2.bucket = ct.bucket
GROUP BY c2.user_id, c2.exact_n
"""


CMS_SQL = _cms_sql()

QUERIES["events_heavy_users_cms"] = events_heavy_users_cms
ORACLE_SQL["events_heavy_users_cms"] = CMS_SQL


KMV_K = 64


def events_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch set operations across event types:
    per type keep the K smallest user-id hashes; for every type pair
    estimate the audience Jaccard from the union sketch — the set
    INTERSECTION capability HLL fundamentally lacks — and report the
    exact Jaccard next to it (cheap here; at 100 TB only the sketch
    side survives, which is why it exists).

    Everything is deterministic: the same 31-bit hash both engines
    share, per-type TakeOrdered K smallest, and integer estimate
    arithmetic — full value oracle.

    Estimate: for the combined pair sketch (K smallest of the union),
    J ≈ |sketch_a ∩ sketch_b ∩ union_sketch| / K.
    """
    from kmr_spark.session import materialize_release

    ev = load_tables(spark, sf_dir)["events"]
    # the distinct (type, user) frame feeds BOTH the sketch build and
    # the exact-Jaccard calibration branch — persist it so the events
    # scan + distinct shuffle run once, not once per downstream branch
    du = ev.select("event_type", "user_id").distinct().persist()
    hashed = (du
              .select("event_type", _hash31(F.col("user_id")).alias("h"))
              .distinct())
    # two-phase bounded k-min build (no per-type funnel): each task
    # keeps its local K smallest per type (window partitioned by
    # (type, task) — bounded input), then the global K smallest are
    # picked from the <= K x n_partitions survivors. The global K-min
    # set is always a subset of the union of local K-min sets.
    wl = Window.partitionBy("event_type", "pid").orderBy("h")
    local = (hashed.withColumn("pid", F.spark_partition_id())
             .withColumn("rn", F.row_number().over(wl))
             .filter(F.col("rn") <= KMV_K)
             .select("event_type", "h"))
    w = Window.partitionBy("event_type").orderBy("h")
    # <= K rows per type — persisted: read as both pair sides below
    sk = (local
          .withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= KMV_K)
          .select("event_type", "h")
          .persist())
    a = sk.select(F.col("event_type").alias("ta"), F.col("h"))
    b = sk.select(F.col("event_type").alias("tb"), F.col("h"))
    # union sketch threshold per pair: the K-th smallest of the merged
    # hash multiset (distinct values — same hash in both sketches
    # counts once)
    merged = (a.join(b.select("tb").distinct(), F.col("ta") < F.col("tb"))
              .select("ta", "tb", "h")
              .unionAll(
                  b.join(a.select("ta").distinct(),
                         F.col("ta") < F.col("tb"))
                  .select("ta", "tb", "h"))
              .distinct())
    wp = Window.partitionBy("ta", "tb").orderBy("h")
    # <= K rows per pair — persisted: read by both inter and kth
    union_k = (merged.withColumn("rn", F.row_number().over(wp))
               .filter(F.col("rn") <= KMV_K)
               .persist())
    inter = (union_k.join(a, ["ta", "h"]).join(b, ["tb", "h"])
             .groupBy("ta", "tb").agg(F.count("*").alias("n_common")))
    kth = union_k.groupBy("ta", "tb").agg(F.count("*").alias("k_eff"))
    est = (kth.join(inter, ["ta", "tb"], "left")
           .select("ta", "tb",
                   F.coalesce("n_common", F.lit(0)).alias("n_common"),
                   "k_eff",
                   F.expr("(1000 * coalesce(n_common, 0)) DIV k_eff")
                   .alias("jaccard_est_permille")))
    # exact Jaccard per pair for calibration (distinct users per type)
    ua = du.select(F.col("event_type").alias("ta"), "user_id")
    ub = du.select(F.col("event_type").alias("tb"), "user_id")
    nab = (ua.join(ub, "user_id").filter(F.col("ta") < F.col("tb"))
           .groupBy("ta", "tb").agg(F.count("*").alias("n_inter")))
    nt = du.groupBy("event_type").agg(F.count("*").alias("n_users"))
    na = nt.select(F.col("event_type").alias("ta"), F.col("n_users").alias("na"))
    nb = nt.select(F.col("event_type").alias("tb"), F.col("n_users").alias("nb"))
    exact = (nab.join(F.broadcast(na), "ta").join(F.broadcast(nb), "tb")
             .select("ta", "tb",
                     F.expr("(1000 * n_inter) DIV (na + nb - n_inter)")
                     .alias("jaccard_exact_permille")))
    out = (est.join(exact, ["ta", "tb"])
           .select(F.col("ta").alias("type_a"), F.col("tb").alias("type_b"),
                   "n_common", "k_eff", "jaccard_est_permille",
                   "jaccard_exact_permille"))
    return materialize_release(out, du, sk, union_k)


KMV_SQL = f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
hashed AS (SELECT DISTINCT event_type, {_sql_hash31('user_id')} AS h
           FROM du),
sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed) WHERE rn <= {KMV_K}),
pairs AS (SELECT DISTINCT a.event_type AS ta, b.event_type AS tb
          FROM sk a, sk b WHERE a.event_type < b.event_type),
merged AS (
  SELECT DISTINCT p.ta, p.tb, s.h
  FROM pairs p JOIN sk s ON s.event_type = p.ta OR s.event_type = p.tb),
union_k AS (
  SELECT ta, tb, h FROM (
    SELECT ta, tb, h,
           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
    FROM merged) WHERE rn <= {KMV_K}),
agg AS (
  SELECT u.ta, u.tb, COUNT(*) AS k_eff,
         CAST(SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_common
  FROM union_k u
  LEFT JOIN sk sa ON sa.event_type = u.ta AND sa.h = u.h
  LEFT JOIN sk sb ON sb.event_type = u.tb AND sb.h = u.h
  GROUP BY u.ta, u.tb),
nt AS (SELECT event_type, COUNT(*) AS n_users FROM du GROUP BY event_type),
nab AS (
  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n_inter
  FROM du a JOIN du b ON a.user_id = b.user_id
                     AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT agg.ta AS type_a, agg.tb AS type_b, agg.n_common, agg.k_eff,
       (1000 * agg.n_common) // agg.k_eff AS jaccard_est_permille,
       (1000 * nab.n_inter) // (na.n_users + nb.n_users - nab.n_inter)
         AS jaccard_exact_permille
FROM agg JOIN nab ON agg.ta = nab.ta AND agg.tb = nab.tb
JOIN nt na ON na.event_type = agg.ta
JOIN nt nb ON nb.event_type = agg.tb
"""


QUERIES["events_kmv_overlap"] = events_kmv_overlap
ORACLE_SQL["events_kmv_overlap"] = KMV_SQL


QSEL_BUCKETS = 1024


def events_median_quickselect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median of value at MICRO precision (floor(value*1e6)) via
    distributed quickselect: each round builds a {QSEL_BUCKETS}-cell
    histogram of the surviving range (map-side-combinable — the
    shuffle carries 1024 cells per task regardless of data size), the
    driver picks the cell containing the k-th rank, and the range
    shrinks 1024x. Four rounds cover a 2^40 domain.

    This is the selection shape for UNBOUNDED value domains where the
    count-table rewrite (events_exact_percentiles) would shuffle one
    row per distinct value: here shuffle volume per pass is constant.
    The reference analog is KMR's sampled splitter selection
    (src/kmrmoreops.c:469-536) run to exactness.
    """
    ev = load_tables(spark, sf_dir)["events"].select(
        F.floor(F.col("value") * 1_000_000).cast("long").alias("m"))
    ev = ev.persist()
    try:
        row = ev.agg(F.count("*").alias("n"), F.min("m").alias("lo"),
                     F.max("m").alias("hi")).collect()[0]
        n, lo, hi = row["n"], row["lo"], row["hi"]
        if not n:  # empty input: no median to select
            return spark.createDataFrame(
                [], "n long, k long, median_micros long")
        k = (n + 1) // 2  # rank of the lower median, 1-based
        base_rank = 0     # ranks consumed below the surviving range
        while lo < hi:
            width = max(1, (hi - lo) // QSEL_BUCKETS + 1)
            hist = (ev.filter((F.col("m") >= lo) & (F.col("m") <= hi))
                    .groupBy(((F.col("m") - lo) / width).cast("long")
                             .alias("b"))
                    .agg(F.count("*").alias("c"))
                    .collect())
            cum = base_rank
            for b, c in sorted((r["b"], r["c"]) for r in hist):
                if cum + c >= k:
                    lo2 = lo + b * width
                    hi2 = min(hi, lo + (b + 1) * width - 1)
                    base_rank = cum
                    lo, hi = lo2, hi2
                    break
                cum += c
        median = lo
        return spark.createDataFrame(
            [(n, k, median)], "n long, k long, median_micros long")
    finally:
        ev.unpersist()


MEDIAN_QSEL_SQL = """
WITH v AS (SELECT CAST(floor(value * 1000000) AS BIGINT) AS m
           FROM events),
n AS (SELECT COUNT(*) AS n FROM v)
SELECT (SELECT n FROM n) AS n,
       ((SELECT n FROM n) + 1) // 2 AS k,
       (SELECT m FROM v ORDER BY m
        LIMIT 1 OFFSET (((SELECT n FROM n) + 1) // 2 - 1))
         AS median_micros
"""


QUERIES["events_median_quickselect"] = events_median_quickselect
ORACLE_SQL["events_median_quickselect"] = MEDIAN_QSEL_SQL


#: trailing window width (days) for the sliding HLL rollup
HLL_SLIDE_DAYS = 7


def events_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per (event_type, day) computed by
    MERGING per-day HLL register tables — the reason sketches exist at
    100 TB: the raw events are scanned ONCE into |days| register sets
    (64 longs each), and every sliding window is a register-max fold,
    not a rescan. COUNT(DISTINCT) over a sliding window rescans and
    reshuffles the corpus per window; this shape re-shuffles 64
    longs per (type, day).

    Plan: one register aggregate (map-side combinable), a 7x register
    EXPLODE onto target days (constant fan-out of constant-size state),
    a second register max-merge, the dyadic-exact fold. Days beyond the
    data's horizon are dropped by a semi-join against observed days.
    """
    ev = load_tables(spark, sf_dir)["events"].withColumn(
        "day", F.to_date("ts"))
    regs = hll_registers(ev, "user_id", ["event_type", "day"])
    contrib = regs.select(
        "event_type", "bucket", "m_j",
        F.explode(F.expr(
            f"sequence(day, date_add(day, {HLL_SLIDE_DAYS - 1}))"))
        .alias("day"))
    days = ev.select("day").distinct()
    merged = (
        contrib.join(days, "day", "left_semi")
        .groupBy("event_type", "day", "bucket")
        .agg(F.max("m_j").alias("m_j")))
    return (hll_fold(merged, ["event_type", "day"])
            .orderBy("event_type", "day"))


def _hll_sliding_sql() -> str:
    return f"""
WITH hashed AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         {_sql_hash31('user_id')} AS h
  FROM events),
rows_ AS (
  SELECT event_type, day, h % {HLL_M} AS bucket,
         {_sql_rho(f"(h // {HLL_M})")} AS rho
  FROM hashed),
regs AS (
  SELECT event_type, day, bucket, MAX(rho) AS m_j
  FROM rows_ GROUP BY event_type, day, bucket),
contrib AS (
  SELECT r.event_type, r.bucket, r.m_j, CAST(s.wday AS DATE) AS day
  FROM regs r,
       LATERAL (SELECT unnest(generate_series(
                  r.day, r.day + INTERVAL {HLL_SLIDE_DAYS - 1} DAY,
                  INTERVAL 1 DAY)) AS wday) s
  WHERE CAST(s.wday AS DATE) IN (SELECT DISTINCT day FROM rows_)),
merged AS (
  SELECT event_type, day, bucket, MAX(m_j) AS m_j
  FROM contrib GROUP BY 1, 2, 3),
per_group AS (
  SELECT event_type, day,
         SUM(POWER(2.0, -m_j)) AS present_sum,
         COUNT(*) AS n_present
  FROM merged GROUP BY 1, 2),
est AS (
  SELECT event_type, day, n_present,
         CAST({HLL_ALPHA * HLL_M * HLL_M} AS DOUBLE) / (present_sum + ({HLL_M} - n_present))
           AS raw,
         {HLL_M} - n_present AS v
  FROM per_group)
SELECT event_type, day,
       CASE WHEN raw <= {2.5 * HLL_M} AND v > 0
            THEN {_sql_linear_count('v')}
            ELSE raw END AS hll_est,
       CAST(n_present AS BIGINT) AS n_registers_hit
FROM est ORDER BY event_type, day
"""


HLL_SLIDING_SQL = _hll_sliding_sql()

QUERIES["events_hll_sliding"] = events_hll_sliding
ORACLE_SQL["events_hll_sliding"] = HLL_SLIDING_SQL


def events_quantile_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day p50/p90 of `value` per (event_type, day) from
    per-day 256-bucket HISTOGRAM sketches merged by SUM — the exactly-
    mergeable quantile companion to events_hll_sliding: the corpus is
    scanned once into |types|x|days|x256 integer counts, and every
    sliding window is a count merge, never a rescan. Buckets use
    GLOBAL per-type bounds (one broadcast aggregate) so a bucket means
    the same value range in every window.

    Exactness: integer counts, one fixed IEEE estimate expression —
    the sketch-quantile reproducibility contract. Scale shape: two
    map-side-combinable aggregates, a constant 7x fan-out of
    constant-size state, and a 256-row-per-cell cumulative window.
    """
    from pyspark.sql import Window

    ev = (load_tables(spark, sf_dir)["events"]
          .select("event_type", "value", F.to_date("ts").alias("day"))
          .filter(F.col("value").isNotNull()))
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    width_frac = (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.floor(width_frac * N_QBUCKETS), F.lit(N_QBUCKETS - 1))
    ).cast("long")
    hist = (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", "day", "mn", "mx", bucket.alias("bucket"))
        .groupBy("event_type", "day", "mn", "mx", "bucket")
        .agg(F.count("*").alias("c"))
    )
    contrib = hist.select(
        "event_type", "mn", "mx", "bucket", "c",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day"))
    days = ev.select("day").distinct()
    merged = (
        contrib.join(days, "day", "left_semi")
        .groupBy("event_type", "day", "mn", "mx", "bucket")
        .agg(F.sum("c").alias("c")))
    w_cum = (Window.partitionBy("event_type", "day").orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("event_type", "day")
    cum = merged.select(
        "event_type", "day", "mn", "mx", "bucket", "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"))
    aggs = [F.min("mn").alias("mn"), F.min("mx").alias("mx"),
            F.max("n").alias("n")]
    for name, q in (("p50", 0.5), ("p90", 0.9)):
        k = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(F.min(F.when(F.col("cum") >= k, F.col("bucket")))
                    .alias(f"b_{name}"))
    folded = cum.groupBy("event_type", "day").agg(*aggs)
    out = [F.col("event_type"), F.col("day"), F.col("n")]
    for name in ("p50", "p90"):
        out.append((F.col("mn") + F.col(f"b_{name}")
                    * (F.col("mx") - F.col("mn")) / N_QBUCKETS)
                   .alias(f"{name}_est"))
    return folded.select(*out).orderBy("event_type", "day")


QUANTILE_SLIDING_SQL = f"""
WITH ev AS (
  SELECT event_type, value, CAST(ts AS DATE) AS day
  FROM events WHERE value IS NOT NULL),
bounds AS (
  SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
  FROM ev GROUP BY event_type),
bucketed AS (
  SELECT e.event_type, e.day, b.mn, b.mx,
         CAST(CASE WHEN b.mx = b.mn THEN 0
              ELSE LEAST(FLOOR((e.value - b.mn) / (b.mx - b.mn) * {N_QBUCKETS}),
                         {N_QBUCKETS - 1}) END AS BIGINT) AS bucket
  FROM ev e JOIN bounds b ON e.event_type = b.event_type),
hist AS (
  SELECT event_type, day, mn, mx, bucket, COUNT(*) AS c
  FROM bucketed GROUP BY 1, 2, 3, 4, 5),
contrib AS (
  SELECT h.event_type, h.mn, h.mx, h.bucket, h.c,
         CAST(s.wday AS DATE) AS day
  FROM hist h,
       LATERAL (SELECT unnest(generate_series(
                  h.day, h.day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wday) s
  WHERE CAST(s.wday AS DATE) IN (SELECT DISTINCT day FROM ev)),
merged AS (
  SELECT event_type, day, mn, mx, bucket, CAST(SUM(c) AS BIGINT) AS c
  FROM contrib GROUP BY 1, 2, 3, 4, 5),
cum AS (
  SELECT event_type, day, mn, mx, bucket, c,
         SUM(c) OVER (PARTITION BY event_type, day ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY event_type, day) AS n
  FROM merged),
folded AS (
  SELECT event_type, day, MIN(mn) AS mn, MIN(mx) AS mx,
         CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN bucket END) AS b_p50,
         MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN bucket END) AS b_p90
  FROM cum GROUP BY 1, 2)
SELECT event_type, day, n,
       mn + b_p50 * (mx - mn) / {N_QBUCKETS} AS p50_est,
       mn + b_p90 * (mx - mn) / {N_QBUCKETS} AS p90_est
FROM folded ORDER BY event_type, day
"""

QUERIES["events_quantile_sliding"] = events_quantile_sliding
ORACLE_SQL["events_quantile_sliding"] = QUANTILE_SLIDING_SQL
