"""Text analysis over the documents table: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure column expressions (JVM codegen, no UDFs) with exact DuckDB
twins. Ratios are int/int divisions and the score is a fixed-order
double expression, so values are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.functions import hashing as H
from kmr_spark.session import load_tables, materialize_release, widen

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

#: marker words per language for the n-gram/stopword lang-id heuristic;
#: priority order breaks ties deterministically.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "y", "las", "es"],
}
LANG_PRIORITY = ["en", "de", "fr", "es"]


def doc_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/length/stopword stats + composite quality score.

    Quality formula (fixed order, both engines):
      0.4*min(n_tokens/100, 1) + 0.3*(1 - stopword_ratio)
        + 0.3*min(avg_token_len/8, 1)
    """
    docs = widen(load_tables(spark, sf_dir)["documents"])
    toks = H.tokens_col("text")
    base = docs.select("doc_id", "n_chars", toks.alias("toks")).select(
        "doc_id",
        "n_chars",
        F.size("toks").cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(F.col("toks"), lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_tok_len"),
        F.size(F.array_intersect(F.col("toks"), F.array(*[F.lit(s) for s in STOPWORDS])))
        .cast("long").alias("n_stop_kinds"),
        F.size(F.filter(F.col("toks"), lambda t: t.isin(STOPWORDS)))
        .cast("long").alias("n_stop"),
    )
    withratios = base.select(
        "doc_id", "n_chars", "n_tokens",
        (F.col("sum_tok_len") / F.col("n_tokens")).alias("avg_tok_len"),
        (F.col("n_stop") / F.col("n_tokens")).alias("stopword_ratio"),
    )
    return withratios.select(
        "doc_id", "n_chars", "n_tokens", "avg_tok_len", "stopword_ratio",
        (
            F.lit(0.4) * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
            + F.lit(0.3) * (F.lit(1.0) - F.col("stopword_ratio"))
            + F.lit(0.3) * F.least(F.col("avg_tok_len") / F.lit(8.0), F.lit(1.0))
        ).alias("quality"),
    )


_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

TEXTSTATS_SQL = f"""
WITH t0 AS (
  SELECT doc_id, n_chars, {H.sql_tokens('text')} AS toks FROM documents),
base AS (
  SELECT doc_id, n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, x) -> a + x)
           AS sum_tok_len,
         CAST(len(list_filter(toks, t -> list_contains({_STOP_LIST}, t))) AS BIGINT) AS n_stop
  FROM t0),
ratios AS (
  SELECT doc_id, n_chars, n_tokens,
         CAST(sum_tok_len AS DOUBLE) / n_tokens AS avg_tok_len,
         CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio
  FROM base)
SELECT doc_id, n_chars, n_tokens, avg_tok_len, stopword_ratio,
       0.4 * least(n_tokens / 100.0, 1.0)
         + 0.3 * (1.0 - stopword_ratio)
         + 0.3 * least(avg_tok_len / 8.0, 1.0) AS quality
FROM ratios ORDER BY doc_id
"""


def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: count marker hits per language over the
    token multiset; argmax with fixed priority; 'und' when no hits."""
    docs = widen(load_tables(spark, sf_dir)["documents"])
    toks = H.tokens_col("text")

    def hits(markers: list[str]):
        return F.size(F.filter(toks, lambda t: t.isin(markers)))

    hit_cols = [hits(ms).alias(f"hits_{lang}") for lang, ms in LANG_MARKERS.items()]
    base = docs.select("doc_id", F.col("lang").alias("lang_label"), *hit_cols)
    pred = F.lit("und")
    # build argmax CASE from lowest priority up so higher priority wins ties
    for lang in reversed(LANG_PRIORITY):
        cond = (F.col(f"hits_{lang}") > 0)
        for o in LANG_PRIORITY[: LANG_PRIORITY.index(lang)]:
            cond = cond & (F.col(f"hits_{lang}") > F.col(f"hits_{o}"))
        for o in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1:]:
            cond = cond & (F.col(f"hits_{lang}") >= F.col(f"hits_{o}"))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return base.select("doc_id", "lang_label", pred.alias("lang_pred"))


def _langid_sql() -> str:
    hits = ", ".join(
        f"len(list_filter(toks, t -> list_contains([{', '.join(repr(m) for m in ms)}], t))) AS hits_{lang}"
        for lang, ms in LANG_MARKERS.items()
    )
    # same construction order as the Spark side: later (higher-priority)
    # WHEN clauses are built last but evaluated first
    case = "'und'"
    for lang in reversed(LANG_PRIORITY):
        conds = [f"hits_{lang} > 0"]
        for o in LANG_PRIORITY[: LANG_PRIORITY.index(lang)]:
            conds.append(f"hits_{lang} > hits_{o}")
        for o in LANG_PRIORITY[LANG_PRIORITY.index(lang) + 1:]:
            conds.append(f"hits_{lang} >= hits_{o}")
        case = f"CASE WHEN {' AND '.join(conds)} THEN '{lang}' ELSE {case} END"
    return f"""
WITH t0 AS (SELECT doc_id, lang AS lang_label, {H.sql_tokens('text')} AS toks FROM documents),
hits AS (SELECT doc_id, lang_label, {hits} FROM t0)
SELECT doc_id, lang_label, {case} AS lang_pred FROM hits ORDER BY doc_id
"""


LANGID_SQL = _langid_sql()


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min/max shingle hash + full-text
    rolling hash — the compact signature used for fast pre-filtering."""
    docs = widen(load_tables(spark, sf_dir)["documents"])
    th_table = H.token_hash_table(docs)
    base = th_table.select(
        "doc_id", F.col("th"), H.shingle_hashes_col(F.col("th")).alias("sh"))
    out = base.select(
        "doc_id",
        F.array_min("sh").alias("fp_min"),
        F.array_max("sh").alias("fp_max"),
        F.aggregate(
            F.col("th"), F.lit(0).cast("long"),
            lambda acc, x: (acc * H.BETA + x) % H.P,
        ).alias("fp_roll"),
    )
    # per-doc fingerprints are 4 longs/row — checkpointable even at
    # corpus scale (a production run writes them to the sink instead)
    return materialize_release(out, th_table)


FINGERPRINT_SQL = f"""
WITH t0 AS (SELECT doc_id, {H.sql_token_hashes(H.sql_tokens('text'))} AS th FROM documents),
t1 AS (SELECT doc_id, th, {H.sql_shingle_hashes('th')} AS sh FROM t0)
SELECT doc_id, list_min(sh) AS fp_min, list_max(sh) AS fp_max,
       list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                   (acc, x) -> (acc * {H.BETA} + x) % {H.P}) AS fp_roll
FROM t1 ORDER BY doc_id
"""


QUALITY_MIN = 0.5


def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection pipeline the stats exist for: keep documents whose
    quality score clears the bar — the shape of a corpus-cleaning pass
    (filter composes with dedup keepers downstream)."""
    stats = doc_textstats(spark, sf_dir)
    return (
        stats.filter(F.col("quality") >= QUALITY_MIN)
        .select("doc_id", "quality")
    )


QUALITY_FILTER_SQL = f"""
SELECT doc_id, quality FROM ({TEXTSTATS_SQL.replace(';', ' ')}) s
WHERE quality >= {QUALITY_MIN} ORDER BY doc_id
"""


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Log-free formulation so values are IEEE-identical across engines:
    score = (term_count / doc_len) * (N_docs / doc_freq) — every factor
    an exact integer ratio, multiplied in fixed order. Plan: one explode
    + two groupBys (term stats partial-aggregate map-side); doc-frequency
    table is term-sized and broadcast back.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"])
    terms = docs.select(
        "doc_id",
        F.explode(H.tokens_col("text")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    doclen = terms.groupBy("doc_id").agg(F.count("*").alias("len"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    # raw-table cardinality from parquet footer metadata (~ms) instead
    # of a blocking count() job through the widen shuffle (guide §1.2:
    # don't run passes you don't need); identical value to COUNT(*)
    from kmr_spark.session import parquet_num_rows
    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs is None:
        n_docs = docs.count()
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df_t), "term")
        .select(
            "doc_id", "term",
            ((F.col("c") / F.col("len")) * (F.lit(float(n_docs)) / F.col("df")))
            .alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "rn", "term", "tfidf")
    )


TFIDF_SQL = f"""
WITH t0 AS (SELECT doc_id, {H.sql_tokens('text')} AS toks FROM documents),
terms AS (SELECT doc_id, t.term FROM t0, unnest(toks) AS t(term)),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM terms GROUP BY doc_id, term),
doclen AS (SELECT doc_id, COUNT(*) AS len FROM terms GROUP BY doc_id),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         (CAST(tf.c AS DOUBLE) / doclen.len)
           * (CAST(n.n_docs AS DOUBLE) / dft.df) AS tfidf
  FROM tf JOIN doclen USING (doc_id) JOIN dft USING (term) CROSS JOIN n)
SELECT doc_id, rn, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rn
  FROM scored)
WHERE rn <= 3 ORDER BY doc_id, rn
"""


#: GPT-2-style pre-tokenizer classes, restricted to constructs that
#: behave identically in Java regex (Spark) and RE2 (DuckDB): runs of
#: letters, runs of digits, or a single other non-space character.
BPE_SPLIT_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (the pre-tokenization pass of a BPE
    tokenizer): per document, how many word / number / punctuation
    tokens the split yields, plus the total. Pure regexp_extract_all
    projection — scan-speed at any scale, no shuffle."""
    docs = widen(load_tables(spark, sf_dir)["documents"])
    toks = F.expr(f"regexp_extract_all(text, '{BPE_SPLIT_RE}', 0)")
    is_word = lambda t: t.rlike("^[A-Za-z]+$")
    is_num = lambda t: t.rlike("^[0-9]+$")
    return (
        docs.select("doc_id", toks.alias("bt"))
        .select(
            "doc_id",
            F.size("bt").cast("long").alias("n_tokens"),
            F.size(F.filter("bt", is_word)).cast("long").alias("n_word"),
            F.size(F.filter("bt", is_num)).cast("long").alias("n_number"),
            (F.size("bt")
             - F.size(F.filter("bt", is_word))
             - F.size(F.filter("bt", is_num))).cast("long").alias("n_punct"),
        )
    )


TOKEN_COUNTS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{BPE_SPLIT_RE}') AS bt
  FROM documents)
SELECT doc_id,
       CAST(len(bt) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(bt, x -> regexp_matches(x, '^[A-Za-z]+$'))) AS BIGINT) AS n_word,
       CAST(len(list_filter(bt, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_number,
       CAST(len(bt)
            - len(list_filter(bt, x -> regexp_matches(x, '^[A-Za-z]+$')))
            - len(list_filter(bt, x -> regexp_matches(x, '^[0-9]+$'))) AS BIGINT) AS n_punct
FROM t ORDER BY doc_id
"""


LOG2_MAX_BITS = 44  # counts up to ~1.7e13 — far past any corpus here


def _floor_log2(c):
    """floor(log2(c)) for a positive integer column, as a CASE chain of
    integer comparisons — no float log, bit-portable across engines."""
    chain = None
    for k in range(LOG2_MAX_BITS, 0, -1):
        cond = c >= F.lit(1 << k)
        chain = F.when(cond, F.lit(k)) if chain is None else chain.when(cond, F.lit(k))
    return chain.otherwise(F.lit(0))


def _sql_floor_log2(c: str) -> str:
    whens = " ".join(
        f"WHEN {c} >= {1 << k} THEN {k}" for k in range(LOG2_MAX_BITS, 0, -1))
    return f"(CASE {whens} ELSE 0 END)"


def doc_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model familiarity score per document.

    The corpus itself is the model: count every char bigram across all
    documents, then score each document by the mean integer-quantized
    log-frequency (floor(log2(count))) of its bigrams. Low scores mark
    out-of-distribution text — the classic cheap LM quality signal —
    and the integer quantization keeps the whole computation exact
    arithmetic (a float log-prob sum would be summation-order- and
    libm-dependent across engines; floor(log2) is a CASE chain).

    Plan shape at 100 TB: bigram explode is a narrow generator; the
    model is a groupBy(bigram) count whose distinct-key space is tiny
    (alphabet²), so the model aggregate is map-side-combine-friendly
    and the scoring join BROADCASTS the model — no corpus shuffle at
    all beyond the per-doc aggregate.
    """
    docs = widen(load_tables(spark, sf_dir)["documents"]).filter(
        F.col("text").isNotNull() & (F.length("text") >= 2))
    # pre-aggregate to (doc_id, bigram, occurrences): the scoring join
    # and the model build both read this ~2x smaller table, and the
    # raw explode is never shuffled or persisted at all
    docbg = (
        docs.select(
            "doc_id",
            F.explode(F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))")).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n_occ"))
        .persist()
    )
    model = docbg.groupBy("bg").agg(F.sum("n_occ").alias("c"))
    scored = (
        docbg.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(F.sum("n_occ").alias("n_bigrams"),
             F.sum(F.col("n_occ") * _floor_log2(F.col("c"))).alias("lm_sum"))
        .select("doc_id", "n_bigrams", "lm_sum",
                (F.col("lm_sum") / F.col("n_bigrams")).alias("lm_score"))
    )
    return materialize_release(scored, docbg)


BIGRAM_LM_SQL = f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND length(text) >= 2),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text)),
                               i -> substring(text, i, 2))) AS bg
  FROM docs2),
model AS (SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg)
SELECT b.doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM({_sql_floor_log2('m.c')}) AS BIGINT) AS lm_sum,
       CAST(SUM({_sql_floor_log2('m.c')}) AS DOUBLE) / COUNT(*) AS lm_score
FROM bg b JOIN model m ON b.bg = m.bg
GROUP BY b.doc_id ORDER BY b.doc_id
"""


def doc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first stage of every corpus
    build: collapse all whitespace runs to single spaces, trim, and
    report the cleaned form's length + digest so downstream exact-dedup
    keys on the NORMALIZED text (whitespace-only variants collapse).

    Pure codegen regexp_replace with patterns in the Java∩RE2-safe
    subset (character classes + quantifiers only), so the DuckDB twin
    is literal. At 100 TB this runs at the scan and the raw text never
    moves — only (doc_id, digest, lengths) shuffle.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    cleaned = F.trim(F.regexp_replace("text", r"[ \t\r\n]+", " "))
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("raw_len"),
            F.length(cleaned).alias("clean_len"),
            F.md5(cleaned).alias("clean_md5"))
    )


NORMALIZE_SQL = r"""
SELECT doc_id,
       length(text) AS raw_len,
       length(trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'))) AS clean_len,
       md5(trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'))) AS clean_md5
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID EVALUATION census: the confusion matrix between the
    corpus's stored lang labels and the marker-word classifier's
    predictions — (label, predicted, n, share-of-label) — the accuracy
    accounting any classifier in the curation loop needs before its
    threshold is trusted. share is an exact integer ratio.

    Plan: doc_langid's narrow scan expression followed by a
    |langs|²-bounded aggregate with map-side combine plus a broadcast
    join to the per-label totals — nothing after the scan is
    corpus-sized."""
    pred = doc_langid(spark, sf_dir)
    cm = pred.groupBy("lang_label", "lang_pred").agg(
        F.count("*").alias("n"))
    totals = cm.groupBy("lang_label").agg(F.sum("n").alias("label_total"))
    return (
        cm.join(F.broadcast(totals), "lang_label")
        .select("lang_label", "lang_pred", "n",
                (F.col("n").cast("double") / F.col("label_total"))
                .alias("share"))
        .orderBy("lang_label", "lang_pred")
    )


LANGID_CONFUSION_SQL = f"""
WITH pred AS ({LANGID_SQL.replace("ORDER BY doc_id", "")}),
cm AS (
  SELECT lang_label, lang_pred, COUNT(*) AS n
  FROM pred GROUP BY lang_label, lang_pred),
tot AS (
  SELECT lang_label, SUM(n) AS label_total FROM cm GROUP BY lang_label)
SELECT cm.lang_label, cm.lang_pred, cm.n,
       CAST(cm.n AS DOUBLE) / tot.label_total AS share
FROM cm JOIN tot USING (lang_label)
ORDER BY cm.lang_label, cm.lang_pred
"""


QUERIES = {
    "text_stats": doc_textstats,
    "text_token_counts": doc_token_counts,
    "text_langid": doc_langid,
    "text_langid_confusion": langid_confusion,
    "text_fingerprint": doc_fingerprint,
    "text_quality_filter": doc_quality_filter,
    "text_tfidf_top_terms": doc_tfidf_top_terms,
    "text_bigram_lm": doc_bigram_lm,
    "text_normalize": doc_normalize,
}

ORACLE_SQL = {
    "text_stats": TEXTSTATS_SQL,
    "text_token_counts": TOKEN_COUNTS_SQL,
    "text_langid": LANGID_SQL,
    "text_langid_confusion": LANGID_CONFUSION_SQL,
    "text_fingerprint": FINGERPRINT_SQL,
    "text_quality_filter": QUALITY_FILTER_SQL,
    "text_tfidf_top_terms": TFIDF_SQL,
    "text_bigram_lm": BIGRAM_LM_SQL,
    "text_normalize": NORMALIZE_SQL,
}
