"""LSH parameter tuning — measure, don't guess, the band/row trade.

``dedup_band_tuning`` reports, for each banding configuration of the
same 8 minhash signatures, the bucket count, the candidate-pair volume
(sum over buckets of C(size, 2) — exactly the number of pairs the
verify join would score), and the largest bucket. Run it BEFORE a
100 TB dedup pass: candidate volume is the pass's cost driver, and
the max bucket bounds its skew.

One signature scan, one count-per-bucket aggregate per config, then a
|buckets|-sized rollup — never materializes a single candidate pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions import hashing as H
from kmr_spark.llm_ops.dedup import _docs_with_sigs, _sql_sigs_cte
from kmr_spark.session import materialize_release

#: (config name, bands of signature-index tuples)
BAND_CONFIGS = [
    ("4x2", [(0, 1), (2, 3), (4, 5), (6, 7)]),
    ("2x4", [(0, 1, 2, 3), (4, 5, 6, 7)]),
]


def dedup_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs, th_table = _docs_with_sigs(spark, sf_dir)
    keys = sigs.select(
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(name), F.lit(b),
                        *[F.col(f"sig{j}") for j in band])
            for name, bands in BAND_CONFIGS
            for b, band in enumerate(bands)
        ])).alias("cfg_key"))
    config = F.split(F.col("cfg_key"), ":").getItem(0)
    buckets = (
        keys.groupBy("cfg_key").agg(F.count("*").alias("sz"))
        .select(config.alias("config"), "sz"))
    out = buckets.groupBy("config").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("sz * (sz - 1) DIV 2")).alias("candidate_pairs"),
        F.max("sz").alias("max_bucket"))
    return materialize_release(out, sigs, th_table)


def _band_tuning_sql() -> str:
    key_exprs = ", ".join(
        "'{name}:{b}:' || {sig_cat}".format(
            name=name, b=b,
            sig_cat=" || ':' || ".join(
                f"CAST(sig{j} AS VARCHAR)" for j in band))
        for name, bands in BAND_CONFIGS
        for b, band in enumerate(bands))
    return f"""
WITH {_sql_sigs_cte()},
keys AS (
  SELECT unnest([{key_exprs}]) AS cfg_key FROM sigs),
buckets AS (
  SELECT string_split(cfg_key, ':')[1] AS config, COUNT(*) AS sz
  FROM keys GROUP BY cfg_key),
rolled AS (
  SELECT config, COUNT(*) AS n_buckets,
         CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs,
         MAX(sz) AS max_bucket
  FROM buckets GROUP BY config)
SELECT * FROM rolled
"""


BAND_TUNING_SQL = _band_tuning_sql()

QUERIES = {"dedup_band_tuning": dedup_band_tuning}
ORACLE_SQL = {"dedup_band_tuning": BAND_TUNING_SQL}


def docs_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bit balance of the 32-bit SimHash over the corpus — the
    fingerprint-quality diagnostic: a healthy hash sets each bit on
    ~half the docs; a skewed bit weakens its band's selectivity.
    Output: (bit, n_set, n_docs, set_permille), 32 rows.

    One pass over the token-hash table (same narrow codegen as the
    dedup queries) into a 32-column aggregate — nothing corpus-sized
    ever shuffles.
    """
    from kmr_spark.session import load_tables, widen

    docs = widen(load_tables(spark, sf_dir)["documents"])
    th_table = H.token_hash_table(docs)
    exploded = th_table.filter(F.size("th") > 0).select(
        "doc_id", F.explode("th").alias("h"))
    bit_sums = exploded.groupBy("doc_id").agg(*[
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(1) * 2 - 1).alias(f"s{i}")
        for i in range(H.SIMHASH_BITS)
    ])
    totals = bit_sums.agg(
        F.count("*").alias("n_docs"),
        *[F.sum((F.col(f"s{i}") > 0).cast("long")).alias(f"b{i}")
          for i in range(H.SIMHASH_BITS)])
    stack = ", ".join(f"{i}L, b{i}" for i in range(H.SIMHASH_BITS))
    out = (
        totals.selectExpr(
            f"stack({H.SIMHASH_BITS}, {stack}) AS (bit, n_set)", "n_docs")
        .selectExpr("bit", "n_set", "n_docs",
                    "(1000 * n_set) DIV n_docs AS set_permille")
    )
    return materialize_release(out, th_table)


def _bit_balance_sql() -> str:
    sums = ", ".join(
        f"SUM(((h >> {i}) & 1) * 2 - 1) AS s{i}"
        for i in range(H.SIMHASH_BITS))
    bits = ", ".join(
        f"SUM(CASE WHEN s{i} > 0 THEN 1 ELSE 0 END) AS b{i}"
        for i in range(H.SIMHASH_BITS))
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS bit, CAST(b{i} AS BIGINT) AS n_set,"
        f" n_docs FROM t"
        for i in range(H.SIMHASH_BITS))
    return f"""
WITH ths AS (
  SELECT doc_id, {H.sql_token_hashes(H.sql_tokens('text'))} AS th
  FROM documents),
bits AS (
  SELECT doc_id, h FROM ths, unnest(ths.th) AS u(h) WHERE len(ths.th) > 0),
sums AS (SELECT doc_id, {sums} FROM bits GROUP BY doc_id),
t AS (SELECT COUNT(*) AS n_docs, {bits} FROM sums),
stacked AS ({rows})
SELECT bit, n_set, n_docs, (1000 * n_set) // n_docs AS set_permille
FROM stacked
"""


BIT_BALANCE_SQL = _bit_balance_sql()

QUERIES["docs_simhash_bit_balance"] = docs_simhash_bit_balance
ORACLE_SQL["docs_simhash_bit_balance"] = BIT_BALANCE_SQL


def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: SimHash near-dup pairs rolled
    up by (source, source) — the provenance report that tells a corpus
    team WHICH feeds duplicate each other (mirror sites, syndication)
    before they pick what to drop. Pair list is banded-join-sized;
    both metadata joins key on doc_id.
    """
    from kmr_spark.llm_ops.dedup import simhash_pairs
    from kmr_spark.session import load_tables

    pairs = simhash_pairs(spark, sf_dir, sort=False)
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source")
    a = docs.select(F.col("doc_id").alias("doc_a"),
                    F.col("source").alias("src_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"),
                    F.col("source").alias("src_b"))
    from pyspark.sql import Window

    cells = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select(F.least("src_a", "src_b").alias("source_lo"),
                F.greatest("src_a", "src_b").alias("source_hi"))
        .groupBy("source_lo", "source_hi")
        .agg(F.count("*").alias("n_pairs")))
    # the total over the |sources|^2-sized cells frame comes from an
    # unpartitioned window, NOT crossJoin(broadcast(cells.agg(...))):
    # the broadcast side re-ran the entire SimHash pair pipeline + both
    # metadata joins a second time (guide §1.2: the most expensive
    # subtree, evaluated twice); the window collapses the tiny cells
    # frame to one partition, which is exactly its size class
    return (
        cells.withColumn(
            "total", F.sum("n_pairs").over(
                Window.partitionBy(F.lit(1))))
        .selectExpr("source_lo", "source_hi", "n_pairs",
                    "(1000 * n_pairs) DIV total AS share_permille"))


def _dup_by_source_sql() -> str:
    from kmr_spark.llm_ops.dedup import SIMHASH_MAX_HAMMING, _SIMHASH_CANDS_CTE

    return f"""
WITH {_SIMHASH_CANDS_CTE},
pairs AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}),
cells AS (
  SELECT least(da.source, db.source) AS source_lo,
         greatest(da.source, db.source) AS source_hi,
         COUNT(*) AS n_pairs
  FROM pairs JOIN documents da ON pairs.doc_a = da.doc_id
             JOIN documents db ON pairs.doc_b = db.doc_id
  GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS total FROM cells)
SELECT source_lo, source_hi, n_pairs,
       (1000 * n_pairs) // (SELECT total FROM t) AS share_permille
FROM cells
"""


DUP_BY_SOURCE_SQL = _dup_by_source_sql()

QUERIES["docs_dup_rate_by_source"] = docs_dup_rate_by_source
ORACLE_SQL["docs_dup_rate_by_source"] = DUP_BY_SOURCE_SQL


def dedup_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the SimHash near-dup pair graph: how many
    docs have 1, 2, ... near-duplicates. The shape tells a dedup run
    apart from a pathological one BEFORE clustering — a power-law tail
    means hub documents (boilerplate) that will snowball into giant
    components. Pair-graph-sized arithmetic only.
    """
    from kmr_spark.llm_ops.dedup import simhash_pairs

    pairs = simhash_pairs(spark, sf_dir, sort=False)
    deg = (pairs.select(F.col("doc_a").alias("doc_id"))
           .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
           .groupBy("doc_id").agg(F.count("*").alias("degree")))
    return (deg.groupBy("degree").agg(F.count("*").alias("n_docs")))


def _degree_hist_sql() -> str:
    from kmr_spark.llm_ops.dedup import SIMHASH_MAX_HAMMING, _SIMHASH_CANDS_CTE

    return f"""
WITH {_SIMHASH_CANDS_CTE},
pairs AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}),
nodes AS (SELECT doc_a AS doc_id FROM pairs
          UNION ALL SELECT doc_b FROM pairs),
deg AS (SELECT doc_id, COUNT(*) AS degree FROM nodes GROUP BY doc_id)
SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY degree
"""


DEGREE_HIST_SQL = _degree_hist_sql()

QUERIES["dedup_degree_histogram"] = dedup_degree_histogram
ORACLE_SQL["dedup_degree_histogram"] = DEGREE_HIST_SQL


def docs_shingle_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle saturation per source: distinct vs total 3-gram shingles
    and the permille ratio — a LOW ratio means the feed repeats itself
    (boilerplate/templating) before any pairwise dedup is run. One
    hash pass; the distinct count is a source-keyed aggregate over
    shingle hashes.
    """
    from kmr_spark.session import load_tables, widen

    docs = widen(load_tables(spark, sf_dir)["documents"])
    th_table = H.token_hash_table(docs, ["source"])
    sh = (th_table.select("source",
                          F.explode(H.shingle_hashes_col(F.col("th")))
                          .alias("h")))
    out = (sh.groupBy("source")
           .agg(F.count("*").alias("total_shingles"),
                F.count_distinct("h").alias("distinct_shingles"))
           .selectExpr("source", "total_shingles", "distinct_shingles",
                       "(1000 * distinct_shingles) DIV total_shingles"
                       " AS saturation_permille"))
    return materialize_release(out, th_table)


SHINGLE_SAT_SQL = f"""
WITH t0 AS (SELECT source, {H.sql_token_hashes(H.sql_tokens('text'))} AS th
            FROM documents),
sh AS (SELECT source, unnest({H.sql_shingle_hashes('th')}) AS h FROM t0)
SELECT source, COUNT(*) AS total_shingles,
       COUNT(DISTINCT h) AS distinct_shingles,
       (1000 * COUNT(DISTINCT h)) // COUNT(*) AS saturation_permille
FROM sh GROUP BY source
"""


QUERIES["docs_shingle_saturation"] = docs_shingle_saturation
ORACLE_SQL["docs_shingle_saturation"] = SHINGLE_SAT_SQL


def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration on the LSH candidate pairs: for every
    banded candidate, the MinHash-ESTIMATED Jaccard (matching
    signature components / 8) next to the EXACT shingle Jaccard — the
    table that tells you whether 8 hashes are enough before a 100 TB
    pass trusts the estimate (plot est vs exact; systematic gaps mean
    more hashes, not more bands).

    Candidates come from the same banded equi-join as minhash_lsh_pairs
    (never all-pairs); both ratios are integer permille via DIV so the
    driver hash is exact.
    """
    sigs, th_table = _docs_with_sigs(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(b), F.col(f"sig{2 * b}"),
                        F.col(f"sig{2 * b + 1}"))
            for b in range(H.N_BANDS)
        ])).alias("band_key"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"),
              (F.col("a.band_key") == F.col("b.band_key"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("shset").alias("set_a"),
                     *[F.col(f"sig{j}").alias(f"a{j}")
                       for j in range(H.N_HASHES)])
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("shset").alias("set_b"),
                     *[F.col(f"sig{j}").alias(f"b{j}")
                       for j in range(H.N_HASHES)])
    n_match = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(H.N_HASHES)).cast("long")
    inter = F.size(F.array_intersect("set_a", "set_b")).cast("long")
    union = F.size(F.array_union("set_a", "set_b")).cast("long")
    out = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            n_match.alias("n_sig_match"),
            inter.alias("inter_size"), union.alias("union_size"))
        .withColumn("est_permille",
                    F.expr(f"(n_sig_match * 1000) DIV {H.N_HASHES}"))
        .withColumn("exact_permille",
                    F.expr("(inter_size * 1000) DIV union_size"))
    )
    return materialize_release(out, sigs, th_table)


CALIBRATION_SQL = f"""
WITH {_sql_sigs_cte()},
bands AS (
  SELECT doc_id, CAST(b AS VARCHAR) || ':' ||
         CAST((CASE b {' '.join(f"WHEN {b} THEN sig{2*b}" for b in range(H.N_BANDS))} END) AS VARCHAR)
         || ':' ||
         CAST((CASE b {' '.join(f"WHEN {b} THEN sig{2*b+1}" for b in range(H.N_BANDS))} END) AS VARCHAR)
         AS band_key
  FROM sigs, unnest(range({H.N_BANDS})) AS t(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST({' + '.join(f"CASE WHEN sa.sig{j} = sb.sig{j} THEN 1 ELSE 0 END" for j in range(H.N_HASHES))} AS BIGINT) AS n_sig_match,
       CAST(len(list_intersect(sa.shset, sb.shset)) AS BIGINT) AS inter_size,
       CAST(len(list_distinct(sa.shset || sb.shset)) AS BIGINT) AS union_size,
       (CAST({' + '.join(f"CASE WHEN sa.sig{j} = sb.sig{j} THEN 1 ELSE 0 END" for j in range(H.N_HASHES))} AS BIGINT) * 1000) // {H.N_HASHES} AS est_permille,
       (CAST(len(list_intersect(sa.shset, sb.shset)) AS BIGINT) * 1000)
         // len(list_distinct(sa.shset || sb.shset)) AS exact_permille
FROM cand JOIN sigs sa ON cand.doc_a = sa.doc_id
          JOIN sigs sb ON cand.doc_b = sb.doc_id
ORDER BY doc_a, doc_b
"""


QUERIES["dedup_minhash_calibration"] = dedup_minhash_calibration
ORACLE_SQL["dedup_minhash_calibration"] = CALIBRATION_SQL
