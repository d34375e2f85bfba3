"""Corpus-hygiene operators for training-data pipelines: repetition
quality signals, benchmark-contamination detection, and vocabulary
coverage — the Gopher/C4-style filters that run between raw text and
the packed training set.

Beyond-reference per the build brief (KMR has no text surface; its
closest idiom is kmr_map over lines, src/kmrbase.c). Everything here
is pure column expressions + keyed aggregates with exact DuckDB twins:
fractions are int/int divisions, n-gram hashes use the repo's shared
64-bit modular arithmetic (functions/hashing.py), so values are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions import hashing as H
from kmr_spark.session import load_tables, materialize_release, widen

# ------------------------------------------------------------ repetition

#: Gopher-style repetition thresholds (Rae et al. 2021, table A1 uses
#: per-n-gram fractions; constants here are tuned to the synthetic
#:  corpus's ~40-word vocabulary so both branches of the flag fire).
TOP_UNIGRAM_MAX = 0.10
TOP_BIGRAM_MAX = 0.08
TTR_MIN = 0.45


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: type-token ratio, top-unigram
    fraction, top-bigram fraction, and the composite `repetitive` flag.

    Plan shape at 100 TB: two explode → partial-aggregate passes (one
    per n-gram order), each map-side combined on (doc_id, gram) before
    the shuffle; the per-doc summaries then join on doc_id. The raw
    text never shuffles — only (doc_id, gram_hash, count) rows do.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"]).filter(
        F.col("text").isNotNull())
    toks = H.tokens_col("text")
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)

    uni = (
        base.select("doc_id", F.explode("toks").alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_uni"),
        )
    )
    bigrams = F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")
    bi = (
        base.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bi"))
    )
    out = (
        uni.join(bi, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_distinct") / F.col("n_tokens")).alias("ttr"),
            (F.col("top_uni") / F.col("n_tokens")).alias("top_unigram_frac"),
            (F.col("top_bi") / F.col("n_bigrams")).alias("top_bigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("top_unigram_frac") > TOP_UNIGRAM_MAX)
            | (F.col("top_bigram_frac") > TOP_BIGRAM_MAX)
            | (F.col("ttr") < TTR_MIN),
        )
    )
    return out


REPETITION_SQL = f"""
WITH t0 AS (
  SELECT doc_id, {H.sql_tokens('text')} AS toks FROM documents
  WHERE text IS NOT NULL),
base AS (SELECT doc_id, toks FROM t0 WHERE len(toks) >= 2),
unig AS (
  SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct, MAX(c) AS top_uni
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS g FROM base)
        GROUP BY doc_id, g)
  GROUP BY doc_id),
big AS (
  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bi
  FROM (SELECT doc_id, g, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1])) AS g
              FROM base)
        GROUP BY doc_id, g)
  GROUP BY doc_id)
SELECT u.doc_id,
       CAST(u.n_tokens AS BIGINT) AS n_tokens,
       CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS ttr,
       CAST(u.top_uni AS DOUBLE) / u.n_tokens AS top_unigram_frac,
       CAST(b.top_bi AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
       (CAST(u.top_uni AS DOUBLE) / u.n_tokens > {TOP_UNIGRAM_MAX}
        OR CAST(b.top_bi AS DOUBLE) / b.n_bigrams > {TOP_BIGRAM_MAX}
        OR CAST(u.n_distinct AS DOUBLE) / u.n_tokens < {TTR_MIN}) AS repetitive
FROM unig u JOIN big b USING (doc_id)
ORDER BY u.doc_id
"""

# --------------------------------------------------------- contamination

#: doc_id % BENCH_MOD == 0 plays the held-out benchmark set; everything
#: else is the training candidate pool.
BENCH_MOD = 53
NGRAM_K = 5


def _ngram5_hashes(th: F.Column) -> F.Column:
    """k=5 token-shingle hashes from the shared token-hash array: the
    same rolling fold as functions/hashing.py's k=3 shingles, extended
    two steps (acc*BETA + h mod P keeps every intermediate < 2^63)."""
    def one(i):
        acc = F.element_at(th, i + 1)
        for j in range(1, NGRAM_K):
            acc = (acc * H.BETA + F.element_at(th, i + 1 + j)) % H.P
        return acc

    return F.when(
        F.size(th) >= NGRAM_K,
        F.transform(F.sequence(F.lit(0), F.size(th) - NGRAM_K), one),
    ).otherwise(F.array().cast("array<long>"))


def _sql_ngram5(th: str) -> str:
    acc = f"({th})[i]"
    for j in range(1, NGRAM_K):
        acc = f"(({acc}) * {H.BETA} + ({th})[i + {j}]) % {H.P}"
    return (
        f"CASE WHEN len({th}) >= {NGRAM_K} THEN "
        f"list_transform(range(1, len({th}) - {NGRAM_K - 2}), i -> {acc}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag training documents sharing any
    5-gram with the held-out benchmark docs (the n-gram-overlap decontam
    pass every LLM data pipeline runs before training).

    Plan shape at 100 TB: the benchmark n-gram set is the distinct
    5-grams of the (tiny) eval suites — BROADCAST to the training scan,
    so the corpus-side cost is one explode + broadcast-hash left join +
    per-doc aggregate; the corpus itself never shuffles on the n-grams.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"]).filter(
        F.col("text").isNotNull())
    th_table = H.token_hash_table(docs)
    grams = th_table.select(
        "doc_id", F.explode(_ngram5_hashes(F.col("th"))).alias("ng"))

    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("ng").distinct()
        .withColumn("hit", F.lit(1))
    )
    train = grams.filter(F.col("doc_id") % BENCH_MOD != 0).dropDuplicates(
        ["doc_id", "ng"])
    out = (
        train.join(F.broadcast(bench), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .withColumn("contaminated", F.col("n_hit") > 0)
    )
    return materialize_release(out, th_table)


CONTAMINATION_SQL = f"""
WITH t0 AS (
  SELECT doc_id, {H.sql_token_hashes(H.sql_tokens('text'))} AS th
  FROM documents WHERE text IS NOT NULL),
grams AS (
  SELECT doc_id, unnest({_sql_ngram5('th')}) AS ng FROM t0),
bench AS (SELECT DISTINCT ng FROM grams WHERE doc_id % {BENCH_MOD} = 0),
train AS (SELECT DISTINCT doc_id, ng FROM grams WHERE doc_id % {BENCH_MOD} <> 0)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       SUM(CASE WHEN b.ng IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
FROM train t LEFT JOIN bench b ON t.ng = b.ng
GROUP BY t.doc_id
ORDER BY t.doc_id
"""

# ------------------------------------------------------- vocab coverage

VOCAB_TOP_K = 50


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary induction signal: the top-K corpus terms by
    frequency with each term's cumulative coverage of all token
    occurrences — the curve that decides how large a word-level vocab
    must be for a target OOV rate.

    Plan shape at 100 TB: explode → map-side-combined groupBy(term);
    the aggregated table is vocab-sized (≪ corpus), so the coverage
    window and the scalar total both run on a tiny input. The corpus
    is read once and never shuffled raw.
    """
    from pyspark.sql import Window

    docs = widen(load_tables(spark, sf_dir)["documents"]).filter(
        F.col("text").isNotNull())
    counts = (
        docs.select(F.explode(H.tokens_col("text")).alias("term"))
        .groupBy("term").agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c").alias("tot"))
    w = Window.orderBy(F.col("c").desc(), F.col("term").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    # the window runs on the vocab-sized aggregate, not the corpus;
    # single-partition is correct and cheap here
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("c").over(w))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("c").desc(), F.col("term").asc())
            ).cast("long"),
        )
        .filter(F.col("rank") <= VOCAB_TOP_K)
        .select(
            "rank", "term", F.col("c").cast("long").alias("n_occ"),
            (F.col("cum") / F.col("tot")).alias("cum_coverage"),
        )
        .orderBy("rank")
    )
    return ranked


VOCAB_COVERAGE_SQL = f"""
WITH counts AS (
  SELECT term, COUNT(*) AS c
  FROM (SELECT unnest({H.sql_tokens('text')}) AS term
        FROM documents WHERE text IS NOT NULL)
  GROUP BY term),
tot AS (SELECT SUM(c) AS tot FROM counts),
ranked AS (
  SELECT term, c,
         SUM(c) OVER (ORDER BY c DESC, term ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(ROW_NUMBER() OVER (ORDER BY c DESC, term ASC) AS BIGINT) AS rank
  FROM counts)
SELECT rank, term, CAST(c AS BIGINT) AS n_occ,
       CAST(cum AS DOUBLE) / tot.tot AS cum_coverage
FROM ranked CROSS JOIN tot
WHERE rank <= {VOCAB_TOP_K}
ORDER BY rank
"""


QUERIES = {
    "text_repetition": doc_repetition,
    "text_contamination": doc_contamination,
    "text_vocab_coverage": vocab_coverage,
}

ORACLE_SQL = {
    "text_repetition": REPETITION_SQL,
    "text_contamination": CONTAMINATION_SQL,
    "text_vocab_coverage": VOCAB_COVERAGE_SQL,
}
