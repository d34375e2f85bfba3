"""Corpus observability — the profiling queries a training-data
pipeline runs before/after every build: column profiles, length
distributions, tokenizer fertility, and the Zipf curve.

All integer/count arithmetic (permille ratios via integer division),
so every oracle is exact. Scale shape: each query is one map-side
combinable aggregate over the documents scan; the only windows run
over vocabulary- or bucket-sized count tables, never over rows
(the events_value_deciles precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.functions import hashing as H
from kmr_spark.llm_ops.textstats import _floor_log2, _sql_floor_log2
from kmr_spark.session import load_tables, materialize_release


def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the documents table: row count, null
    count, distinct count, and (for n_chars) min/max. One aggregate
    pass + a driver-side unpivot of the 1-row result — the ANALYZE
    TABLE shape."""
    docs = load_tables(spark, sf_dir)["documents"]
    agg = docs.agg(
        F.count("*").alias("n_rows"),
        *[x for c in ("doc_id", "text", "lang", "source", "n_chars")
          for x in (
              F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
              F.count_distinct(F.col(c)).alias(f"nd_{c}"))],
        F.min("n_chars").alias("min_n_chars"),
        F.max("n_chars").alias("max_n_chars"))
    cols = ("doc_id", "text", "lang", "source", "n_chars")
    stack = ", ".join(
        f"'{c}', nulls_{c}, nd_{c}, "
        + ("min_n_chars, max_n_chars" if c == "n_chars" else
           "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)")
        for c in cols)
    return agg.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column, n_nulls, n_distinct,"
        " min_val, max_val)", "n_rows")


PROFILE_DOCS_SQL = """
WITH a AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS nulls_doc_id,
         COUNT(DISTINCT doc_id) AS nd_doc_id,
         SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS nulls_text,
         COUNT(DISTINCT text) AS nd_text,
         SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS nulls_lang,
         COUNT(DISTINCT lang) AS nd_lang,
         SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS nulls_source,
         COUNT(DISTINCT source) AS nd_source,
         SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS nulls_n_chars,
         COUNT(DISTINCT n_chars) AS nd_n_chars,
         MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
  FROM documents)
SELECT 'doc_id' AS "column", CAST(nulls_doc_id AS BIGINT) AS n_nulls,
       nd_doc_id AS n_distinct, CAST(NULL AS BIGINT) AS min_val,
       CAST(NULL AS BIGINT) AS max_val, n_rows FROM a
UNION ALL SELECT 'text', CAST(nulls_text AS BIGINT), nd_text,
       NULL, NULL, n_rows FROM a
UNION ALL SELECT 'lang', CAST(nulls_lang AS BIGINT), nd_lang,
       NULL, NULL, n_rows FROM a
UNION ALL SELECT 'source', CAST(nulls_source AS BIGINT), nd_source,
       NULL, NULL, n_rows FROM a
UNION ALL SELECT 'n_chars', CAST(nulls_n_chars AS BIGINT), nd_n_chars,
       min_n_chars, max_n_chars, n_rows FROM a
"""


def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per language in log2 buckets —
    the first plot anyone makes of a corpus, as a count table."""
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("n_chars").isNotNull())
    bucket = _floor_log2(F.col("n_chars") + F.lit(1)).cast("long")
    return (
        docs.select("lang", bucket.alias("len_bucket"), "n_chars")
        .groupBy("lang", "len_bucket")
        .agg(F.count("*").alias("n_docs"),
             F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"),
             F.sum("n_chars").alias("sum_chars"))
    )


LENGTH_HIST_SQL = f"""
SELECT lang, CAST({_sql_floor_log2('(n_chars + 1)')} AS BIGINT)
         AS len_bucket,
       COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE n_chars IS NOT NULL
GROUP BY lang, len_bucket
"""


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-1000-chars by language — the fertility statistic a
    tokenizer team tracks per language to spot under-served scripts.
    Integer permille, exact in both engines."""
    # length > 0 keeps char_total > 0 per group — an all-empty-text
    # language would otherwise hit an integer division by zero
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull() & (F.length("text") > 0))
    toks = F.size(H.tokens_col("text")).cast("long")
    return (
        docs.select("lang", toks.alias("n_toks"),
                    F.length("text").cast("long").alias("n_char"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_toks").alias("tok_total"),
             F.sum("n_char").alias("char_total"))
        .select("lang", "n_docs", "tok_total", "char_total",
                F.expr("(tok_total * 1000) DIV char_total")
                .alias("fertility_permille"))
    )


FERTILITY_SQL = f"""
WITH t AS (
  SELECT lang, CAST(len({H.sql_tokens('text')}) AS BIGINT) AS n_toks,
         CAST(length(text) AS BIGINT) AS n_char
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
g AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS tok_total,
         CAST(SUM(n_char) AS BIGINT) AS char_total
  FROM t GROUP BY lang)
SELECT lang, n_docs, tok_total, char_total,
       CAST((tok_total * 1000) // char_total AS BIGINT)
         AS fertility_permille
FROM g
"""


ZIPF_TOP = 50


def text_zipf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-frequency (Zipf) curve: the top-50 corpus tokens with
    their counts and cumulative share (permille, integer-exact).

    Scale shape: token counts are a map-side combinable aggregate
    (vocabulary-bounded); the top-50 cut is TakeOrdered; the
    cumulative window runs over 50 rows."""
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    counts = (
        docs.select(F.explode(H.tokens_col("text")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("cnt")))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("tok").asc()).limit(
        ZIPF_TOP)
    w = Window.orderBy(F.col("cnt").desc(), F.col("tok").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "tok", "cnt",
            F.expr("(1000 * SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC"
                   " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"
                   " DIV total").alias("cum_share_permille"))
    )


ZIPF_SQL = f"""
WITH toks AS (
  SELECT unnest({H.sql_tokens('text')}) AS tok
  FROM documents WHERE text IS NOT NULL),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
top AS (SELECT tok, cnt FROM counts
        ORDER BY cnt DESC, tok ASC LIMIT {ZIPF_TOP})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT)
         AS rank,
       tok, cnt,
       CAST((1000 * SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW))
            // (SELECT total FROM total) AS BIGINT)
         AS cum_share_permille
FROM top
"""


QUERIES = {
    "profile_documents": profile_documents,
    "text_length_histogram": text_length_histogram,
    "text_tokenizer_fertility": text_tokenizer_fertility,
    "text_zipf_curve": text_zipf_curve,
}
ORACLE_SQL = {
    "profile_documents": PROFILE_DOCS_SQL,
    "text_length_histogram": LENGTH_HIST_SQL,
    "text_tokenizer_fertility": FERTILITY_SQL,
    "text_zipf_curve": ZIPF_SQL,
}


def docs_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between language and source — the
    sampling-bias check a corpus team runs on every new feed (a high
    statistic means sources are language-skewed and mixture weights
    need per-(lang, source) treatment). One row: cell count, degrees
    of freedom, chi-square.

    Exactness: all marginals are integer counts; each cell's term is
    one fixed double expression, and the cell terms are folded in
    sorted (lang, source) order on both engines — identical IEEE
    result. Everything after the first aggregate is |cells|-sized.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("lang").isNotNull() & F.col("source").isNotNull())
    # |langs| x |sources| rows, read by FOUR branches (row/col totals,
    # grand total, the term join) — persisted so the docs scan runs once
    cells = (docs.groupBy("lang", "source").agg(F.count("*").alias("c"))
             .persist())
    rows = cells.groupBy("lang").agg(F.sum("c").alias("rowt"))
    cols = cells.groupBy("source").agg(F.sum("c").alias("colt"))
    total = cells.agg(F.sum("c").alias("total"))
    e = (F.col("rowt") * F.col("colt")) / F.col("total")
    term = ((F.col("c") - e) * (F.col("c") - e) / e).alias("term")
    j = (cells.join(F.broadcast(rows), "lang")
         .join(F.broadcast(cols), "source")
         .crossJoin(F.broadcast(total))
         .select("lang", "source", term))
    out = (
        j.agg(F.count("*").alias("n_cells"),
              ((F.count_distinct("lang") - 1)
               * (F.count_distinct("source") - 1)).alias("dof"),
              F.aggregate(
                  F.sort_array(F.collect_list(
                      F.struct("lang", "source", "term"))),
                  F.lit(0.0),
                  lambda a, x: a + x["term"]).alias("chi2"))
    )
    return materialize_release(out, cells)


CHI2_SQL = """
WITH cells AS (
  SELECT lang, source, COUNT(*) AS c FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
  GROUP BY lang, source),
r AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS rowt FROM cells GROUP BY lang),
co AS (SELECT source, CAST(SUM(c) AS BIGINT) AS colt
       FROM cells GROUP BY source),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cells),
j AS (
  SELECT cells.lang, cells.source,
         (cells.c - (r.rowt * co.colt) / t.total)
           * (cells.c - (r.rowt * co.colt) / t.total)
           / ((r.rowt * co.colt) / t.total) AS term
  FROM cells JOIN r USING (lang) JOIN co USING (source), t)
SELECT COUNT(*) AS n_cells,
       (COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS dof,
       list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE), list(term ORDER BY lang, source)),
         (a, x) -> a + x) AS chi2
FROM j
"""


QUERIES["docs_lang_source_chi2"] = docs_lang_source_chi2
ORACLE_SQL["docs_lang_source_chi2"] = CHI2_SQL


# r12 revert: the r11 single-pass/persist rewrite of this query was a
# kept-for-scale trade pending sf10 evidence (VERDICT r11 ask #3); the
# sf10 A/B (OPTIMIZATION_r12.md) measured the pre-rewrite form faster
# at BOTH sf0.1 and sf10, so the rewrite is reverted per the verdict's
# measure-or-revert rule.
def docs_source_divergence_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise TOTAL-VARIATION distance between the unigram
    distributions of every source pair — the drift/mixture diagnostic
    run when a new feed joins the corpus. TV = 0.5 * sum |p - q| is
    computed as the INTEGER sum |c_a*T_b - c_b*T_a| (plus the
    missing-mass terms for tokens present in only one source), so the
    whole statistic is exact; only the final normalization is one
    float division. Requires per-source token totals < ~3e9 for the
    int64 cross products — beyond that, scale counts down first.

    Scale shape: token counts are vocabulary-bounded; the pair join is
    |pairs| x |shared vocab|.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    counts = (
        docs.select("source", F.explode(H.tokens_col("text")).alias("tok"))
        .groupBy("source", "tok").agg(F.count("*").alias("c")))
    totals = counts.groupBy("source").agg(F.sum("c").alias("t"))
    ct = counts.join(F.broadcast(totals), "source")
    a = ct.select(F.col("source").alias("sa"), "tok",
                  F.col("c").alias("ca"), F.col("t").alias("ta"))
    b = ct.select(F.col("source").alias("sb"), "tok",
                  F.col("c").alias("cb"), F.col("t").alias("tb"))
    shared = (
        a.join(b, "tok").filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb", "ta", "tb")
        .agg(F.count("*").alias("shared_toks"),
             F.sum(F.abs(F.col("ca") * F.col("tb")
                         - F.col("cb") * F.col("ta"))).alias("s_shared"),
             F.sum("ca").alias("ca_shared"),
             F.sum("cb").alias("cb_shared")))
    s_total = (F.col("s_shared")
               + (F.col("ta") - F.col("ca_shared")) * F.col("tb")
               + (F.col("tb") - F.col("cb_shared")) * F.col("ta"))
    return shared.select(
        F.col("sa").alias("source_a"), F.col("sb").alias("source_b"),
        "shared_toks", s_total.alias("s_abs"),
        (s_total / (F.lit(2.0) * F.col("ta") * F.col("tb"))).alias("tv"))


TV_DIVERGENCE_SQL = f"""
WITH toks AS (
  SELECT source, unnest({H.sql_tokens('text')}) AS tok
  FROM documents WHERE text IS NOT NULL),
counts AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t
           FROM counts GROUP BY source),
ct AS (SELECT counts.source, tok, c, t FROM counts JOIN totals USING (source)),
shared AS (
  SELECT a.source AS sa, b.source AS sb, a.t AS ta, b.t AS tb,
         COUNT(*) AS shared_toks,
         CAST(SUM(abs(a.c * b.t - b.c * a.t)) AS BIGINT) AS s_shared,
         CAST(SUM(a.c) AS BIGINT) AS ca_shared,
         CAST(SUM(b.c) AS BIGINT) AS cb_shared
  FROM ct a JOIN ct b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2, 3, 4)
SELECT sa AS source_a, sb AS source_b, shared_toks,
       CAST(s_shared + (ta - ca_shared) * tb + (tb - cb_shared) * ta
            AS BIGINT) AS s_abs,
       (s_shared + (ta - ca_shared) * tb + (tb - cb_shared) * ta)
         / (2.0 * ta * tb) AS tv
FROM shared
"""


QUERIES["docs_source_divergence_tv"] = docs_source_divergence_tv
ORACLE_SQL["docs_source_divergence_tv"] = TV_DIVERGENCE_SQL


def text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary richness per source: hapax legomena (tokens occurring
    exactly once in the source) as a permille of the source's distinct
    vocabulary — a LOW rate flags templated feeds, a very HIGH one
    noisy/OCR-ish text. One token-count aggregate, |vocab|-sized."""
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    counts = (docs.select("source",
                          F.explode(H.tokens_col("text")).alias("tok"))
              .groupBy("source", "tok").agg(F.count("*").alias("c")))
    return (counts.groupBy("source")
            .agg(F.count("*").alias("vocab"),
                 F.sum((F.col("c") == 1).cast("long")).alias("hapax"))
            .selectExpr("source", "vocab", "hapax",
                        "(1000 * hapax) DIV vocab AS hapax_permille"))


HAPAX_SQL = f"""
WITH toks AS (
  SELECT source, unnest({H.sql_tokens('text')}) AS tok
  FROM documents WHERE text IS NOT NULL),
counts AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2)
SELECT source, COUNT(*) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST((1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // COUNT(*)
            AS BIGINT)
         AS hapax_permille
FROM counts GROUP BY source
"""


QUERIES["text_hapax_rate"] = text_hapax_rate
ORACLE_SQL["text_hapax_rate"] = HAPAX_SQL


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability census: Flesch reading-ease in integer
    MILLI-points from corpus totals — words, sentences ([.!?] runs),
    and a syllable proxy (vowel runs, the standard cheap estimator).
    flesch_milli = 206835 - (1015*words) DIV sentences
                          - (84600*syllables) DIV words, all integer
    division (truncation identical in both engines), GREATEST(_,1)
    guards empty denominators. The curation use: a source whose score
    collapses is boilerplate/code, one that explodes is word salad.

    Plan: three regexp/split counts evaluated AT THE SCAN (map-only,
    codegen'd), one |sources|-sized aggregate with map-side combine —
    at 100 TB the text column never shuffles.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    per_doc = docs.select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long").alias("w"),
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("long")
        .alias("s"),
        F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+")).cast("long")
        .alias("y"))
    return (
        per_doc.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("w").alias("n_words"),
             F.sum("s").alias("n_sentences"),
             F.sum("y").alias("n_syllables"))
        .selectExpr(
            "source", "n_docs", "n_words", "n_sentences", "n_syllables",
            "206835 - (1015 * n_words) DIV greatest(n_sentences, 1)"
            " - (84600 * n_syllables) DIV greatest(n_words, 1)"
            " AS flesch_milli")
        .orderBy("source")
    )


READABILITY_SQL = r"""
WITH per_doc AS (
  SELECT source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL),
agg AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS n_words,
         CAST(SUM(s) AS BIGINT) AS n_sentences,
         CAST(SUM(y) AS BIGINT) AS n_syllables
  FROM per_doc GROUP BY source)
SELECT source, n_docs, n_words, n_sentences, n_syllables,
       206835 - (1015 * n_words) // greatest(n_sentences, 1)
              - (84600 * n_syllables) // greatest(n_words, 1)
         AS flesch_milli
FROM agg ORDER BY source
"""


QUERIES["text_readability"] = text_readability
ORACLE_SQL["text_readability"] = READABILITY_SQL


BURSTINESS_TOP_K = 20


def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (variance-to-mean ratio of per-doc counts, zeros
    included) for the corpus's top-K tokens: VMR ~ 1 means a token
    spreads Poisson-like; VMR >> 1 means it clumps into few documents
    — the content-word/function-word separator and a dedup-shingle
    quality signal.

    vmr = (N*Σc² - C²) / (N*C) over BIGINTs, one fixed tree. The
    top-K cut is ORDER BY count LIMIT (TakeOrderedAndProject — no
    vocab-sized window); per-token stats then come from one keyed
    aggregate over the per-(doc, token) counts of ONLY those K tokens
    (broadcast semi-join).
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    dw = (
        docs.select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
            .alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
        .persist()
    )
    top = (
        dw.groupBy("tok").agg(F.sum("c").alias("c_total"))
        .orderBy(F.col("c_total").desc(), F.col("tok"))
        .limit(BURSTINESS_TOP_K)
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    d = lambda c: F.col(c).cast("double")
    out = (
        dw.join(F.broadcast(top), "tok")
        .groupBy("tok")
        .agg(F.first("c_total").alias("c_total"),
             F.count("*").alias("n_docs_with"),
             F.sum(F.col("c") * F.col("c")).alias("sc2"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok", "c_total", "n_docs_with",
            ((d("n_docs") * d("sc2") - d("c_total") * d("c_total"))
             / (d("n_docs") * d("c_total"))).alias("vmr"))
        .orderBy("tok")
    )
    return materialize_release(out, dw)


BURSTINESS_SQL = f"""
WITH dw AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS tok
        FROM documents WHERE text IS NOT NULL)
  GROUP BY 1, 2),
top AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS c_total
  FROM dw GROUP BY tok
  ORDER BY c_total DESC, tok LIMIT {BURSTINESS_TOP_K}),
nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL)
SELECT dw.tok, ANY_VALUE(t.c_total) AS c_total,
       COUNT(*) AS n_docs_with,
       (CAST(ANY_VALUE(nd.n_docs) AS DOUBLE)
          * CAST(SUM(dw.c * dw.c) AS DOUBLE)
        - CAST(ANY_VALUE(t.c_total) AS DOUBLE)
          * CAST(ANY_VALUE(t.c_total) AS DOUBLE))
       / (CAST(ANY_VALUE(nd.n_docs) AS DOUBLE)
          * CAST(ANY_VALUE(t.c_total) AS DOUBLE)) AS vmr
FROM dw JOIN top t ON t.tok = dw.tok CROSS JOIN nd
GROUP BY dw.tok ORDER BY dw.tok
"""


QUERIES["text_token_burstiness"] = text_token_burstiness
ORACLE_SQL["text_token_burstiness"] = BURSTINESS_SQL


def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity per source: D = sum c*(c-1) / (N*(N-1)) over
    token counts — the probability two random tokens match, i.e. the
    log-free concentration companion to token entropy (1-D is the
    diversity). Repetitive/templated sources spike D.

    Exactness: sum c*(c-1) accumulates as DECIMAL(38,0)/HUGEINT (c^2
    passes BIGINT for web-scale token counts); the output double is
    one fixed tree. One (source, token) count + one source rollup.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    tc = (
        docs.select(
            "source",
            F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
            .alias("tok"))
        .groupBy("source", "tok").agg(F.count("*").alias("c"))
    )
    return (
        tc.groupBy("source")
        .agg(F.count("*").alias("vocab"),
             F.sum("c").alias("n_tokens"),
             F.sum((F.col("c").cast("decimal(19,0)")
                    * (F.col("c") - 1)).cast("decimal(38,0)"))
             .alias("coll"))
        .select(
            "source", "vocab", "n_tokens",
            (F.col("coll").cast("double")
             / (F.col("n_tokens").cast("double")
                * (F.col("n_tokens") - F.lit(1)).cast("double")))
            .alias("simpson"))
        .orderBy("source")
    )


SIMPSON_SQL = """
WITH tc AS (
  SELECT source, tok, COUNT(*) AS c
  FROM (SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS tok
        FROM documents WHERE text IS NOT NULL)
  GROUP BY 1, 2)
SELECT source, COUNT(*) AS vocab, CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(c AS HUGEINT) * (c - 1)) AS DOUBLE)
         / (CAST(SUM(c) AS DOUBLE)
            * CAST(SUM(c) - 1 AS DOUBLE)) AS simpson
FROM tc GROUP BY source ORDER BY source
"""


QUERIES["text_simpson_diversity"] = text_simpson_diversity
ORACLE_SQL["text_simpson_diversity"] = SIMPSON_SQL


# r12 revert: the r11 single-pass/persist rewrite of this query was a
# kept-for-scale trade pending sf10 evidence (VERDICT r11 ask #3); the
# sf10 A/B (OPTIMIZATION_r12.md) measured the pre-rewrite form faster
# at BOTH sf0.1 and sf10, so the rewrite is reverted per the verdict's
# measure-or-revert rule.
def text_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law curve: cumulative distinct vocabulary vs cumulative
    token count at 10 id-range checkpoints of the corpus — how fast
    the vocabulary still grows tells you whether more data buys new
    tokens (tokenizer/planning input). Sub-linear growth = Heaps'
    law; a linear curve flags templated/generated text.

    Exactness/scale: decile = (doc_id * 10) DIV (max_id + 1) (id-range
    deciles, one broadcast max — no global window over docs); vocab
    increments come from each token's FIRST decile (min aggregate);
    the two cumulative sums run over the 10-row census. All integers.
    """
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    mx = docs.agg((F.max("doc_id") + 1).alias("mx"))
    toks = (
        docs.crossJoin(F.broadcast(mx))
        .select(
            F.expr("(doc_id * 10) DIV mx").alias("decile"),
            F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
            .alias("tok"))
    )
    per_dec_tokens = toks.groupBy("decile").agg(
        F.count("*").alias("n_tokens"))
    first_dec = (
        toks.groupBy("tok").agg(F.min("decile").alias("decile"))
        .groupBy("decile").agg(F.count("*").alias("n_new_vocab"))
    )
    docs_per_dec = (
        docs.crossJoin(F.broadcast(mx))
        .groupBy(F.expr("(doc_id * 10) DIV mx").alias("decile"))
        .agg(F.count("*").alias("n_docs"))
    )
    w = (Window.orderBy("decile")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs_per_dec
        .join(per_dec_tokens, "decile", "left")
        .join(first_dec, "decile", "left")
        .select(
            "decile",
            F.sum("n_docs").over(w).alias("docs_cum"),
            F.sum(F.coalesce("n_tokens", F.lit(0))).over(w)
            .alias("tokens_cum"),
            F.sum(F.coalesce("n_new_vocab", F.lit(0))).over(w)
            .alias("vocab_cum"))
        .orderBy("decile")
    )


HEAPS_SQL = """
WITH mx AS (SELECT MAX(doc_id) + 1 AS mx FROM documents
            WHERE text IS NOT NULL),
toks AS (
  SELECT (doc_id * 10) // mx.mx AS decile,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents CROSS JOIN mx WHERE text IS NOT NULL),
per_dec AS (SELECT decile, COUNT(*) AS n_tokens FROM toks GROUP BY 1),
first_dec AS (
  SELECT decile, COUNT(*) AS n_new_vocab
  FROM (SELECT tok, MIN(decile) AS decile FROM toks GROUP BY tok)
  GROUP BY decile),
docs_per AS (
  SELECT (doc_id * 10) // mx.mx AS decile, COUNT(*) AS n_docs
  FROM documents CROSS JOIN mx WHERE text IS NOT NULL GROUP BY 1)
SELECT d.decile,
       CAST(SUM(d.n_docs) OVER w AS BIGINT) AS docs_cum,
       CAST(SUM(COALESCE(p.n_tokens, 0)) OVER w AS BIGINT) AS tokens_cum,
       CAST(SUM(COALESCE(f.n_new_vocab, 0)) OVER w AS BIGINT) AS vocab_cum
FROM docs_per d
LEFT JOIN per_dec p ON p.decile = d.decile
LEFT JOIN first_dec f ON f.decile = d.decile
WINDOW w AS (ORDER BY d.decile ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
ORDER BY d.decile
"""


QUERIES["text_heaps_curve"] = text_heaps_curve
ORACLE_SQL["text_heaps_curve"] = HEAPS_SQL


def docs_source_divergence_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions — the bounded, symmetric drift metric (TV's log
    companion; JS is what LLM-corpus mixture monitors report).

    Exact-hash recipe: with common denominator 2*T_a*T_b,
    ln(p/m) = ln(2*c_a*T_b) - ln(c_a*T_b + c_b*T_a) — INTEGER log
    arguments, so each term quantizes to q(x)=floor(ln(x)*1e6) BIGINTs
    and one-sided tokens need no special case (c_b=0 makes the term
    ~ln 2 naturally). JS = S(a,b)/(2*T_a*1e6) + S(b,a)/(2*T_b*1e6) is
    one fixed tree over the two ordered integer sums. Same int64
    bound as the TV query: per-source token totals < ~3e9 (scale
    counts down first beyond that — documented there).

    Plan: per-(source, token) counts once; each ordered side is the
    count table crossed with the tiny source-totals list and
    left-joined back on (token, other-source) — vocabulary-bounded.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    uni = (
        docs.select(
            "source",
            F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
            .alias("tok"))
        .groupBy("source", "tok").agg(F.count("*").alias("c"))
        .persist()
    )
    totals = uni.groupBy("source").agg(F.sum("c").alias("t"))
    q = lambda c: F.floor(F.log(c.cast("double")) * F.lit(1e6)).cast("long")
    a = uni.select(F.col("source").alias("src_a"), "tok",
                   F.col("c").alias("c_a"))
    tb = totals.select(F.col("source").alias("src_b"),
                       F.col("t").alias("t_b"))
    ta = totals.select(F.col("source").alias("src_a"),
                       F.col("t").alias("t_a"))
    b = uni.select(F.col("source").alias("src_b"),
                   F.col("tok").alias("tok"), F.col("c").alias("c_b"))
    side = (
        a.crossJoin(F.broadcast(tb))
        .filter(F.col("src_a") != F.col("src_b"))
        .join(b, ["src_b", "tok"], "left")
        .join(F.broadcast(ta), "src_a")
        .select(
            "src_a", "src_b",
            (F.col("c_a")
             * (q(2 * F.col("c_a") * F.col("t_b"))
                - q(F.col("c_a") * F.col("t_b")
                    + F.coalesce(F.col("c_b"), F.lit(0)) * F.col("t_a"))))
            .alias("term"))
        .groupBy("src_a", "src_b").agg(F.sum("term").alias("s"))
    )
    s_fwd = side.filter(F.col("src_a") < F.col("src_b"))
    s_rev = side.filter(F.col("src_a") > F.col("src_b")).select(
        F.col("src_b").alias("src_a"), F.col("src_a").alias("src_b"),
        F.col("s").alias("s_rev"))
    d = lambda c: F.col(c).cast("double")
    out = (
        s_fwd.join(s_rev, ["src_a", "src_b"])
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a", "src_b", "s", "s_rev",
            (d("s") / (F.lit(2e6) * d("t_a"))
             + d("s_rev") / (F.lit(2e6) * d("t_b"))).alias("js"))
        .orderBy("src_a", "src_b")
    )
    return materialize_release(out, uni)


_QL = lambda x: f"CAST(floor(ln(CAST({x} AS DOUBLE)) * 1e6) AS BIGINT)"

JS_DIVERGENCE_SQL = f"""
WITH uni AS (
  SELECT source, tok, COUNT(*) AS c
  FROM (SELECT source,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS tok
        FROM documents WHERE text IS NOT NULL)
  GROUP BY 1, 2),
totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM uni GROUP BY 1),
side AS (
  SELECT a.source AS src_a, tb.source AS src_b,
         CAST(SUM(a.c * ({_QL('2 * a.c * tb.t')}
                  - {_QL('a.c * tb.t + COALESCE(b.c, 0) * ta.t')}))
              AS BIGINT) AS s
  FROM uni a
  CROSS JOIN totals tb
  LEFT JOIN uni b ON b.source = tb.source AND b.tok = a.tok
  JOIN totals ta ON ta.source = a.source
  WHERE a.source <> tb.source
  GROUP BY 1, 2)
SELECT f.src_a, f.src_b, f.s, r.s AS s_rev,
       CAST(f.s AS DOUBLE) / (2e6 * CAST(ta.t AS DOUBLE))
       + CAST(r.s AS DOUBLE) / (2e6 * CAST(tb.t AS DOUBLE)) AS js
FROM side f
JOIN side r ON r.src_a = f.src_b AND r.src_b = f.src_a
JOIN totals ta ON ta.source = f.src_a
JOIN totals tb ON tb.source = f.src_b
WHERE f.src_a < f.src_b
ORDER BY f.src_a, f.src_b
"""


QUERIES["docs_source_divergence_js"] = docs_source_divergence_js
ORACLE_SQL["docs_source_divergence_js"] = JS_DIVERGENCE_SQL
