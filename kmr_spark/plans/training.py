"""Training-set assembly plans: deterministic epoch shuffling and
per-source mixture sampling — the last mile between a cleaned corpus
and the trainer's input order.

Beyond-reference per the build brief (KMR's closest idiom is
kmr_shuffle + kmr_sort, src/kmrbase.c / src/kmrmoreops.c); both plans
reuse the repo's retry-stable hash machinery (operators/sample.py) so
the shuffle order and the mixture are pure functions of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.operators.sample import hash_bucket, sql_bucket, stratified_sample
from kmr_spark.operators.sort import ranking
from kmr_spark.session import load_tables, scratch_dir, widen

N_EPOCHS = 2


def epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle per training epoch: each epoch
    orders the corpus by a salted multiplicative hash of doc_id (salt =
    epoch), so every epoch is a different but REPRODUCIBLE permutation
    — a retry, a re-run, or another engine produces byte-identical
    order (df.sample()/rand() would not survive task retries).

    Scale shape: per epoch this is exactly one range-partitioned sort
    (Spark's orderBy = sampling sort) plus the exscan ranking operator
    — no global window, no single-partition funnel. Epochs are
    independent sorts, which is how a 100 TB corpus is shuffled in
    practice (one pass per epoch, or the rank is written once per
    epoch as a layout key).
    """
    docs = widen(load_tables(spark, sf_dir)["documents"])
    epochs = []
    for ep in range(1, N_EPOCHS + 1):
        keyed = docs.select(
            F.lit(ep).alias("epoch"),
            hash_bucket(F.col("doc_id"), salt=ep).alias("shufkey"),
            "doc_id",
        )
        # materialize=True: each epoch's ranks are computed in their own
        # job (ranking's task-id offset lookup is only valid there) and
        # the union below reads the checkpointed rows
        ranked = ranking(keyed, [F.col("shufkey").asc(), F.col("doc_id").asc()],
                         materialize=True)
        epochs.append(
            ranked.select("epoch", F.col("rank").alias("pos"), "doc_id"))
    out = epochs[0]
    for e in epochs[1:]:
        out = out.unionAll(e)
    return out.orderBy("epoch", "pos")


def _epoch_shuffle_sql() -> str:
    parts = []
    for ep in range(1, N_EPOCHS + 1):
        parts.append(f"""
SELECT {ep} AS epoch,
       CAST(ROW_NUMBER() OVER (ORDER BY {sql_bucket('doc_id', salt=ep)} ASC,
                               doc_id ASC) - 1 AS BIGINT) AS pos,
       doc_id
FROM documents""")
    return " UNION ALL ".join(parts) + " ORDER BY epoch, pos"


EPOCH_SHUFFLE_SQL = _epoch_shuffle_sql()


#: Per-source mixture weights (domain reweighting): sources keep a
#: deterministic hash-fraction of their documents. The synthetic corpus
#: has 20 uniform sources src0..src19; the weight cycles 1/8..4/8 so
#: every rate bucket is exercised.
MIXTURE_RATES = {f"src{i}": ((i % 4) + 1) / 8 for i in range(20)}
MIXTURE_SALT = 7


def source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus subsample summary: apply per-source keep
    rates (the domain-mixing step of a training-data recipe) and report
    per source how many documents were available vs kept.

    Scale shape: the mixture filter is one codegen'd CASE-threshold
    pass over the scan (no shuffle, retry-stable); both summaries are
    map-side-combined aggregates over a 20-key space, broadcast-joined.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"])
    kept = stratified_sample(
        docs, MIXTURE_RATES, stratum="source", key="doc_id",
        salt=MIXTURE_SALT)
    totals = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    kepts = kept.groupBy("source").agg(F.count("*").alias("n_kept"))
    return (
        totals.join(F.broadcast(kepts), "source", "left")
        .select(
            "source",
            F.col("n_total").cast("long").alias("n_total"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


def _mixture_sql() -> str:
    # same threshold construction as stratified_sample: int(rate * P)
    whens = " ".join(
        f"WHEN source = '{s}' THEN {int(r * 1000000007)}"
        for s, r in sorted(MIXTURE_RATES.items()))
    return f"""
WITH kept AS (
  SELECT source FROM documents
  WHERE {sql_bucket('doc_id', salt=MIXTURE_SALT)} < (CASE {whens} ELSE 0 END)),
totals AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
kepts AS (SELECT source, COUNT(*) AS n_kept FROM kept GROUP BY source)
SELECT t.source, CAST(t.n_total AS BIGINT) AS n_total,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM totals t LEFT JOIN kepts k ON t.source = k.source
ORDER BY t.source
"""


SOURCE_MIXTURE_SQL = _mixture_sql()


# ------------------------------------------------- temperature mixing

#: Temperature-sampling exponent: keep-probability per domain ∝
#: n_domain^(ALPHA-1), i.e. low-resource domains are upsampled relative
#: to their share — the standard multilingual-corpus recipe
#: (p_l ∝ n_l^α with α < 1).
MIX_ALPHA = 0.5
MIX_TARGET = 0.5  # overall fraction of the corpus to keep
MIX_SALT = 11


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing over the language column:
    derive per-language keep rates r_l = C·n_l^(α-1) with C chosen so
    the expected kept volume is MIX_TARGET of the corpus, then apply
    them as one deterministic hash-threshold filter.

    The rate table is data-derived: a domain-sized aggregate (|langs|
    rows) is collected and folded in sorted-domain order with plain
    IEEE arithmetic — sqrt and the fixed-order fold are bit-identical
    in Python, the JVM, and DuckDB, so the derived thresholds agree
    across engines (the oracle SQL spells out the same expression
    tree). Scale shape: one tiny aggregate + collect (KMR-parity
    replicated state), then a single codegen'd CASE-threshold scan —
    the corpus is read twice and shuffled never.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"])
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    import math

    n_total = 0
    for lang in sorted(counts):
        n_total += counts[lang]
    ssum = 0.0
    for lang in sorted(counts):
        ssum += math.sqrt(counts[lang])
    rates = {}
    for lang, n in counts.items():
        # ((0.5 * N) / ssum) / sqrt(n): same association order as the SQL
        rates[lang] = MIX_TARGET * n_total / ssum / math.sqrt(n)
        if rates[lang] > 1.0:
            raise ValueError(
                f"temperature mix rate > 1 for {lang}; waterfilling clamp "
                "not implemented (not reachable on this corpus)")
    kept = stratified_sample(
        docs, rates, stratum="lang", key="doc_id", salt=MIX_SALT)
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    kepts = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        totals.join(F.broadcast(kepts), "lang", "left")
        .select(
            "lang",
            F.col("n_total").cast("long").alias("n_total"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


TEMPERATURE_MIX_SQL = f"""
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT SUM(n) AS n_total FROM counts),
ssum AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
                        (SELECT list(sqrt(n) ORDER BY lang) FROM counts)),
           (a, x) -> a + x) AS s),
rates AS (
  SELECT c.lang,
         CAST(floor({MIX_TARGET} * t.n_total / s.s / sqrt(c.n)
                    * 1000000007) AS BIGINT) AS thr
  FROM counts c CROSS JOIN tot t CROSS JOIN ssum s),
kept AS (
  SELECT d.lang FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE {sql_bucket('doc_id', salt=MIX_SALT)} < r.thr),
totals AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
kepts AS (SELECT lang, COUNT(*) AS n_kept FROM kept GROUP BY lang)
SELECT t.lang, CAST(t.n_total AS BIGINT) AS n_total,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM totals t LEFT JOIN kepts k ON t.lang = k.lang
ORDER BY t.lang
"""


QUERIES = {
    "train_epoch_shuffle": epoch_shuffle,
    "train_source_mixture": source_mixture,
    "train_temperature_mix": temperature_mix,
}

ORACLE_SQL = {
    "train_epoch_shuffle": EPOCH_SHUFFLE_SQL,
    "train_source_mixture": SOURCE_MIXTURE_SQL,
    "train_temperature_mix": TEMPERATURE_MIX_SQL,
}


def events_velocity_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user velocity feature vector — counts and spend (cents) in
    the trailing 1/7/30 days relative to the dataset's max timestamp:
    the feature-engineering pass that feeds churn/LTV models. One
    conditional aggregate over the corpus, map-side combinable;
    output is user-sized (the feature table a training job consumes).
    """
    from pyspark.sql import functions as F

    from kmr_spark.session import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    bounds = ev.agg(F.max(F.unix_micros("ts")).alias("t1"))
    us = F.unix_micros("ts")
    day_us = 86_400 * 1_000_000

    def within(days: int):
        return us >= F.col("t1") - F.lit(days * day_us)

    cents = F.floor(F.col("value") * 100).cast("long")
    return (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(*[x for d in (1, 7, 30) for x in (
            F.sum(F.when(within(d), 1).otherwise(0)).alias(f"n_{d}d"),
            F.sum(F.when(within(d), cents).otherwise(0))
            .alias(f"cents_{d}d"))])
    )


VELOCITY_SQL = """
WITH b AS (SELECT MAX(epoch_us(ts)) AS t1 FROM events)
SELECT user_id,
       CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT t1 FROM b) - 86400000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_1d,
       CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT t1 FROM b) - 86400000000
                     THEN CAST(floor(value * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS cents_1d,
       CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT t1 FROM b)
                          - 7 * 86400000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
       CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT t1 FROM b)
                          - 7 * 86400000000
                     THEN CAST(floor(value * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS cents_7d,
       CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT t1 FROM b)
                          - 30 * 86400000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
       CAST(SUM(CASE WHEN epoch_us(ts) >= (SELECT t1 FROM b)
                          - 30 * 86400000000
                     THEN CAST(floor(value * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS cents_30d
FROM events GROUP BY user_id
"""


QUERIES["events_velocity_features"] = events_velocity_features
ORACLE_SQL["events_velocity_features"] = VELOCITY_SQL


def users_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store assembly: one row per user joining THREE feature
    families computed from the events table — activity volume
    (n_events, n_types, active_days, longest_streak), spend
    (total cents, purchase count), and behavioral diversity (the
    quantized-log entropy of events_user_entropy) — the composed
    training matrix a churn/LTV model consumes. Every family is a
    keyed aggregate; the joins are co-partitioned on user_id, so the
    assembly adds no shape beyond its inputs.

    Exactness: counts + cents are integers; entropy reuses the
    order-independent quantized-log fold. The streak family reuses the
    di − row_number gaps-and-islands recipe (events_user_streaks).
    """
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("event_type").alias("n_types"))
    spend = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id")
             .agg(F.count("*").alias("n_purchases"),
                  F.sum(F.floor(F.col("value") * 100).cast("long"))
                  .alias("spend_cents")))
    ud = (ev.select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE'1970-01-01')").alias("di"))
        .distinct())
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("di")
    streaks = (
        ud.withColumn("grp", F.col("di") - F.row_number().over(w))
        .groupBy("user_id", "grp").agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(F.sum("len").alias("active_days"),
             F.max("len").alias("longest_streak")))
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c"))
    q = F.floor(F.log(F.col("c").cast("double")) * F.lit(1e6))
    n = F.sum("c").cast("double")
    qln_n = F.floor(F.log(n) * F.lit(1e6)).cast("double") / F.lit(1e6)
    s_q = F.sum(F.col("c") * q).cast("double")
    entropy = counts.groupBy("user_id").agg(
        (qln_n - (s_q / F.lit(1e6)) / n).alias("entropy"))
    return (
        base.join(streaks, "user_id")
        .join(entropy, "user_id")
        .join(spend, "user_id", "left")
        .select("user_id", "n_events", "n_types", "active_days",
                "longest_streak", "entropy",
                F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
                F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"))
        .orderBy("user_id")
    )


FEATURE_MATRIX_SQL = """
WITH base AS (
  SELECT user_id, COUNT(*) AS n_events,
         COUNT(DISTINCT event_type) AS n_types
  FROM events GROUP BY user_id),
spend AS (
  SELECT user_id, COUNT(*) AS n_purchases,
         CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
ud AS (
  SELECT DISTINCT user_id,
         CAST(ts AS DATE) - DATE '1970-01-01' AS di
  FROM events),
g AS (
  SELECT user_id, di,
         di - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY di) AS grp
  FROM ud),
sl AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2),
streaks AS (
  SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
         CAST(MAX(len) AS BIGINT) AS longest_streak
  FROM sl GROUP BY user_id),
counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type),
ent AS (
  SELECT user_id,
         CAST(floor(ln(CAST(SUM(c) AS DOUBLE)) * 1e6) AS DOUBLE) / 1e6
           - (CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6)
                                AS BIGINT)) AS DOUBLE) / 1e6)
             / CAST(SUM(c) AS DOUBLE) AS entropy
  FROM counts GROUP BY user_id)
SELECT b.user_id, b.n_events, b.n_types, s.active_days,
       s.longest_streak, e.entropy,
       COALESCE(p.n_purchases, 0) AS n_purchases,
       COALESCE(p.spend_cents, 0) AS spend_cents
FROM base b
JOIN streaks s USING (user_id)
JOIN ent e USING (user_id)
LEFT JOIN spend p USING (user_id)
ORDER BY b.user_id
"""


QUERIES["users_feature_matrix"] = users_feature_matrix
ORACLE_SQL["users_feature_matrix"] = FEATURE_MATRIX_SQL


EXPORT_SHARDS = 8


def train_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export sink under the gate: the user feature matrix is
    written to EXPORT_SHARDS hash-sharded parquet partitions
    (partitionBy — the layout a data loader consumes shard-by-shard),
    then the MANIFEST is recomputed from the files just written: per
    shard, row count and integer checksums over ids and spend. The
    oracle computes the same manifest from the source tables, so a row
    landing in the wrong shard, dropped, or mangled by the
    write/read breaks the hash — the export itself is what is
    verified (the events_gate_streamed sink pattern).

    Shard = portable content hash of user_id, so any engine (or a
    non-Spark loader) can recompute placement.
    """
    import shutil

    from kmr_spark.operators.sample import hash_bucket

    m = users_feature_matrix(spark, sf_dir).withColumn(
        "shard", (hash_bucket(F.col("user_id")) % EXPORT_SHARDS).cast("int"))
    d = scratch_dir("kmr_export_")
    try:
        m.write.mode("overwrite").partitionBy("shard").parquet(d)
        back = spark.read.parquet(d)
        return (
            back.groupBy("shard")
            .agg(F.count("*").alias("n_users"),
                 F.sum("user_id").alias("sum_ids"),
                 F.sum("n_events").alias("sum_events"),
                 F.sum("spend_cents").alias("sum_spend_cents"))
            .orderBy("shard")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _export_shards_sql() -> str:
    from kmr_spark.operators.sample import sql_bucket

    return f"""
WITH m AS ({FEATURE_MATRIX_SQL.replace("ORDER BY b.user_id", "")}),
sharded AS (
  SELECT *, CAST(({sql_bucket('user_id')}) % {EXPORT_SHARDS} AS INTEGER)
           AS shard
  FROM m)
SELECT shard, COUNT(*) AS n_users,
       CAST(SUM(user_id) AS BIGINT) AS sum_ids,
       CAST(SUM(n_events) AS BIGINT) AS sum_events,
       CAST(SUM(spend_cents) AS BIGINT) AS sum_spend_cents
FROM sharded GROUP BY shard ORDER BY shard
"""


EXPORT_SHARDS_SQL = _export_shards_sql()

QUERIES["train_export_shards"] = train_export_shards
ORACLE_SQL["train_export_shards"] = EXPORT_SHARDS_SQL


CURRICULUM_TOP = 24


def train_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for a training run: within each source,
    documents ranked easy-to-hard (token count, then doc_id), and the
    global feed interleaves sources ROUND-ROBIN at equal per-source
    rank — epoch position = (src_rank, source) — so early training
    sees short docs from every source instead of draining one source
    first. Returns the first CURRICULUM_TOP feed rows.

    Scale shape: the per-source rank comes from the distributed
    exscan ranking (operators/sort.ranking_per_group) — no
    Window.partitionBy(source) funneling a whole source through one
    task — and the final cut is a top-N on (src_rank, source), which
    TakeOrdered handles without a global sort."""
    from kmr_spark.operators.sort import ranking_per_group

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source", "text")
    sized = docs.select(
        "doc_id", "source",
        F.coalesce(
            F.size(F.filter(F.split("text", " "), lambda x: x != "")),
            F.lit(0)).cast("long").alias("n_tokens"))  # NULL text -> 0:
        # Spark sorts NULL first, DuckDB last — coalesce removes the
        # cross-engine NULL-ordering hazard from the rank order
    ranked = ranking_per_group(
        sized, ["source"], [F.col("n_tokens"), F.col("doc_id")],
        materialize=True)
    return (
        ranked.select("doc_id", "source", "n_tokens",
                      F.col("rank").cast("long").alias("src_rank"))
        .orderBy("src_rank", "source").limit(CURRICULUM_TOP)
    )


CURRICULUM_SQL = f"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                               x -> x <> '')), 0)
              AS BIGINT) AS n_tokens
  FROM documents),
ranked AS (
  SELECT doc_id, source, n_tokens,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY n_tokens, doc_id) - 1
              AS BIGINT) AS src_rank
  FROM sized)
SELECT doc_id, source, n_tokens, src_rank
FROM ranked ORDER BY src_rank, source LIMIT {CURRICULUM_TOP}
"""

QUERIES["train_curriculum_order"] = train_curriculum_order
ORACLE_SQL["train_curriculum_order"] = CURRICULUM_SQL
