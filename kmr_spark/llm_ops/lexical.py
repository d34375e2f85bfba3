"""Lexical corpus statistics + PII scrubbing over the documents table.

Three curation-pipeline stages an LLM data engineer runs before
training, each a single declarative aggregate (KMR would express the
same as kmr_shuffle + kmr_reduce over token keys, reference
src/kmrbase.c:2094/2607):

- unigram ENTROPY per source — the corpus-diversity gate (a source
  whose token distribution collapses is boilerplate/spam);
- windowed PMI co-occurrence — word-association mining (the classic
  Church & Hanks 1990 statistic), pairs built by array expression so
  NO self-join touches the corpus;
- PII redaction — regex scrub of emails/phone numbers with per-doc
  redaction counts; the synthetic corpus contains no PII, so the
  query SEEDS deterministic PII (the encode-then-decode pattern the
  multimodal oracles use) and the oracle replays injection+redaction.

Exactness: all distribution stats come from integer token counts; the
only float steps are ln() and division in one fixed expression shape,
identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables, materialize_release

#: minimum pair occurrences for a PMI row (standard low-count cutoff:
#: PMI explodes on hapax pairs)
PMI_MIN_COUNT = 5
#: co-occurrence window: token pairs at distance 1..PMI_WINDOW
PMI_WINDOW = 2

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram Shannon entropy: n_tokens, vocab_size,
    entropy (nats), and entropy normalized by ln(vocab_size) — the
    0..1 diversity score a mixture-weighting pass consumes.

    H = qln(N) - (sum c*q(c)/1e6)/N where q(x) = floor(ln(x)*1e6) as
    BIGINT and qln(x) = q(x)/1e6: quantizing EVERY log term — the
    per-count terms AND the outer ln(N) / ln(V) — makes the fold an
    exact order-independent integer sum and erases last-ulp libm
    differences between Spark's JVM log and DuckDB (events_user_entropy
    hit a 1-ulp ln(74) divergence), so the driver's bit-exact value
    hash is stable (the recipe that fixed text_bigram_lm in r4).
    The final doubles come from one fixed expression tree.
    Plan: one (source, token) aggregate with map-side combine, then a
    |sources|-row fold. Nothing after the first aggregate is
    corpus-sized.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "source",
        F.explode(F.filter(F.split("text", " "), lambda x: x != ""))
        .alias("tok"))
    counts = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    q = F.floor(F.log(F.col("c").cast("double")) * F.lit(1e6))
    n = F.sum("c").cast("double")
    qln = lambda x: F.floor(F.log(x) * F.lit(1e6)).cast("double") / F.lit(1e6)
    s_q = F.sum(F.col("c") * q).cast("double")
    ent = qln(n) - (s_q / F.lit(1e6)) / n
    return (
        counts.groupBy("source")
        .agg(F.sum("c").alias("n_tokens"),
             F.count("*").alias("vocab_size"),
             ent.alias("entropy"),
             (ent / qln(F.count("*").cast("double")))
             .alias("norm_entropy"))
        .orderBy("source")
    )


_Q = ("CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e6)"
      " AS BIGINT)) AS DOUBLE) / 1e6")
_QLN_N = "CAST(floor(ln(CAST(SUM(c) AS DOUBLE)) * 1e6) AS DOUBLE) / 1e6"
_QLN_V = "CAST(floor(ln(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS DOUBLE) / 1e6"

TOKEN_ENTROPY_SQL = f"""
WITH toks AS (
  SELECT source, tok
  FROM documents,
       unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(tok)),
counts AS (
  SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY source, tok)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS vocab_size,
       {_QLN_N} - ({_Q}) / CAST(SUM(c) AS DOUBLE) AS entropy,
       ({_QLN_N} - ({_Q}) / CAST(SUM(c) AS DOUBLE))
         / ({_QLN_V}) AS norm_entropy
FROM counts GROUP BY source ORDER BY source
"""


def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring within
    PMI_WINDOW positions: pmi = ln((c_ab/Np) / ((c_a/Nt)*(c_b/Nt))),
    pairs canonicalized (a <= b), low-count pairs cut at PMI_MIN_COUNT.

    The pair stream is built by an ARRAY expression per document
    (positions i paired with i+1..i+W) — no corpus self-join, no
    shuffle before the keyed count; the three totals are broadcast
    scalars (the k-means replicated-state pattern).
    """
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    # guard: sequence(0, n) with n < 0 descends (auto step -1) and
    # would fabricate junk pairs for 0/1-token docs — emit no pairs
    pair_arrays = toks.filter(F.size("t") >= 2).select(
        F.explode(
            F.flatten(F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(PMI_WINDOW)),
                        lambda d: F.when(
                            i + d < F.size("t"),
                            F.struct(
                                F.least(F.element_at(F.col("t"), i + 1),
                                        F.element_at(F.col("t"), i + d + 1))
                                .alias("a"),
                                F.greatest(F.element_at(F.col("t"), i + 1),
                                           F.element_at(F.col("t"), i + d + 1))
                                .alias("b"))),
                    ),
                    lambda s: s.isNotNull()),
            ))
        ).alias("p"))
    # both keyed-count frames are read twice (totals + the final join/
    # broadcast) — persisted so the expensive pair/token explode passes
    # over the corpus run once, not once per reference
    pair_counts = (
        pair_arrays.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b").agg(F.count("*").alias("n_pair"))
        .persist()
    )
    uni = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c"))
        .persist()
    )
    n_tok = uni.agg(F.sum("c").alias("nt"))
    n_pairs = pair_counts.agg(F.sum("n_pair").alias("np"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    # pmi = ln(n_pair·nt²/(np·c_a·c_b)) decomposed into per-integer-
    # count QUANTIZED logs (q(x) = floor(ln(x)*1e6) as BIGINT) combined
    # in integer space, then one division — bit-stable across engines
    # (raw ln of the assembled ratio differs in the last ulp between
    # JVM log and libm; the events_user_entropy recipe)
    q = lambda c: F.floor(F.log(c.cast("double")) * F.lit(1e6))
    pmi = ((q(F.col("n_pair")) + F.lit(2) * q(F.col("nt")) - q(F.col("np"))
            - q(F.col("c_a")) - q(F.col("c_b"))).cast("double")
           / F.lit(1e6))
    out = (
        pair_counts.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(F.broadcast(ua), "a").join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n_tok)).crossJoin(F.broadcast(n_pairs))
        .select("a", "b", "n_pair", pmi.alias("pmi"))
        .orderBy("a", "b")
    )
    return materialize_release(out, pair_counts, uni)


PMI_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
pos AS (
  SELECT doc_id, i, t[i] AS tok
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)),
pairs AS (
  SELECT least(p1.tok, p2.tok) AS a, greatest(p1.tok, p2.tok) AS b
  FROM pos p1 JOIN pos p2
    ON p1.doc_id = p2.doc_id
   AND p2.i - p1.i BETWEEN 1 AND {PMI_WINDOW}),
pair_counts AS (
  SELECT a, b, COUNT(*) AS n_pair FROM pairs GROUP BY a, b),
uni AS (
  SELECT tok, COUNT(*) AS c FROM pos GROUP BY tok),
tot AS (
  SELECT (SELECT SUM(c) FROM uni) AS nt,
         (SELECT SUM(n_pair) FROM pair_counts) AS np)
SELECT p.a, p.b, p.n_pair,
       CAST(CAST(floor(ln(CAST(p.n_pair AS DOUBLE)) * 1e6) AS BIGINT)
            + 2 * CAST(floor(ln(CAST(t.nt AS DOUBLE)) * 1e6) AS BIGINT)
            - CAST(floor(ln(CAST(t.np AS DOUBLE)) * 1e6) AS BIGINT)
            - CAST(floor(ln(CAST(ua.c AS DOUBLE)) * 1e6) AS BIGINT)
            - CAST(floor(ln(CAST(ub.c AS DOUBLE)) * 1e6) AS BIGINT)
            AS DOUBLE) / 1e6 AS pmi
FROM pair_counts p
JOIN uni ua ON p.a = ua.tok
JOIN uni ub ON p.b = ub.tok
CROSS JOIN tot t
WHERE p.n_pair >= {PMI_MIN_COUNT}
ORDER BY p.a, p.b
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub with per-doc counts: docs are first SEEDED with
    deterministic synthetic PII (every 3rd doc an email, every 5th a
    phone number — the corpus itself contains none, and an all-zero
    redaction pass would verify nothing), then emails/phones are
    regex-redacted to [EMAIL]/[PHONE]. Returns per doc the redaction
    counts, the redacted length, and an md5 digest of the redacted
    text so the oracle pins the exact output string.

    Plan: pure per-row expression work (regexp_count/regexp_replace at
    the scan, no UDF, no shuffle) — at 100 TB this is a map-only pass
    whose cost is the parquet read.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.lit(" contact user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com")))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.lit(" call +1-555-"),
                            F.lpad((F.col("doc_id") % 10000).cast("string"),
                                   4, "0")))
            .otherwise(F.lit("")),
        ).alias("text"))
    red = F.regexp_replace(
        F.regexp_replace("text", F.lit(EMAIL_RE), F.lit("[EMAIL]")),
        F.lit(PHONE_RE), F.lit("[PHONE]"))
    return (
        seeded.select(
            "doc_id",
            F.regexp_count("text", F.lit(EMAIL_RE)).cast("long")
            .alias("n_emails"),
            F.regexp_count("text", F.lit(PHONE_RE)).cast("long")
            .alias("n_phones"),
            F.length(red).cast("long").alias("redacted_len"),
            F.md5(red).alias("digest"))
    )


PII_REDACT_SQL = f"""
WITH seeded AS (
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 3 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN ' call +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END AS text
  FROM documents),
red AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
           '{PHONE_RE}', '[PHONE]', 'g') AS r
  FROM seeded)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
         AS n_phones,
       CAST(length(r) AS BIGINT) AS redacted_len,
       md5(r) AS digest
FROM red ORDER BY doc_id
"""


BPE_TOP_K = 20


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first round of BPE tokenizer training, distributed: count
    every adjacent symbol pair over the corpus vocabulary, weighted by
    word frequency (Sennrich et al. 2016's merge-candidate table — the
    pair with the max count becomes merge #1). Returns the top
    BPE_TOP_K candidates with an end-of-word marker '_' appended to
    each word, as BPE does.

    Plan: word counts are one map-side-combinable aggregate; pair
    explosion runs over the |vocab|-sized DISTINCT word table (not the
    corpus — the weighting rides along as a column), so the heavy text
    is touched exactly once. Top-k is TakeOrderedAndProject.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        .select(F.concat(F.col("w"), F.lit("_")).alias("w"), "c")
    )
    # w always ends in the marker so length >= 2; sequence is ascending
    pairs = words.select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)))
        ).alias("pair"))
    agg = pairs.groupBy("pair").agg(F.sum("c").alias("n"))
    from kmr_spark.operators.sort import top_k

    return top_k(agg, BPE_TOP_K, F.desc("n"), F.col("pair"))


BPE_SQL = f"""
WITH words AS (
  SELECT w || '_' AS w, COUNT(*) AS c
  FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS w
        FROM documents)
  GROUP BY w),
pairs AS (
  SELECT substring(w, i, 2) AS pair, c
  FROM words, unnest(range(1, length(w))) AS t(i))
SELECT pair, CAST(SUM(c) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {BPE_TOP_K}
"""


QUERIES = {
    "text_token_entropy": text_token_entropy,
    "text_pmi_pairs": text_pmi_pairs,
    "text_pii_redact": text_pii_redact,
    "bpe_merge_candidates": bpe_merge_candidates,
}
ORACLE_SQL = {
    "text_token_entropy": TOKEN_ENTROPY_SQL,
    "text_pmi_pairs": PMI_SQL,
    "text_pii_redact": PII_REDACT_SQL,
    "bpe_merge_candidates": BPE_SQL,
}


def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram LM cross-entropy per document, the corpus as its own
    model with add-one smoothing: for each bigram occurrence (a,b),
    log P(b|a) = ln(c_ab + 1) - ln(c_a + V). The per-doc score is the
    KenLM-style quality feature corpus filters threshold on.

    Every log term is integer-quantized (q(x) = floor(ln(x)*1e6) as
    BIGINT — the entropy recipe) so the per-doc sum is order-free
    integer arithmetic; xent = -sum/(n*1e6) is one fixed expression.

    Plan: per-(doc, bigram) pre-aggregate (one shuffle keyed by doc),
    bigram model = second keyed count over the SAME pre-aggregate, the
    scoring join is keyed by bigram string — all hash equi-joins; V
    and nothing else is a broadcast scalar.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    docbg = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.element_at(F.col("t"), i + 1),
                                  F.element_at(F.col("t"), i + 2))))
            .alias("bg"))
        .groupBy("doc_id", "bg").agg(F.count("*").alias("n_occ"))
        .persist()
    )
    model_bg = docbg.groupBy("bg").agg(F.sum("n_occ").alias("c_ab"))
    uni = (
        toks.select(F.explode("t").alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("c_a"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    q = lambda c: F.floor(F.log(c.cast("double")) * F.lit(1e6)).cast("long")
    scored_model = (
        model_bg
        .withColumn("a_tok", F.split_part(F.col("bg"), F.lit(" "), F.lit(1)))
        .join(uni.withColumnRenamed("tok", "a_tok"), "a_tok")
        .crossJoin(F.broadcast(vocab))
        .select("bg", (q(F.col("c_ab") + 1)
                       - q(F.col("c_a") + F.col("v"))).alias("qlp"))
    )
    out = (
        docbg.join(scored_model, "bg")
        .groupBy("doc_id")
        .agg(F.sum("n_occ").alias("n_bigrams"),
             F.sum(F.col("n_occ") * F.col("qlp")).alias("qlp_sum"))
        .select("doc_id", "n_bigrams", "qlp_sum",
                (-F.col("qlp_sum").cast("double")
                 / (F.col("n_bigrams").cast("double") * F.lit(1e6)))
                .alias("cross_entropy"))
    )
    return materialize_release(out, docbg)


_QLN = lambda x: f"CAST(floor(ln(CAST({x} AS DOUBLE)) * 1e6) AS BIGINT)"

LM_PERPLEXITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL),
docbg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg, COUNT(*) AS n_occ
  FROM toks, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2),
model_bg AS (SELECT bg, CAST(SUM(n_occ) AS BIGINT) AS c_ab
             FROM docbg GROUP BY bg),
uni AS (
  SELECT tok, COUNT(*) AS c_a
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
vocab AS (SELECT COUNT(*) AS v FROM uni),
scored AS (
  SELECT m.bg,
         {_QLN('m.c_ab + 1')} - {_QLN('u.c_a + vocab.v')} AS qlp
  FROM model_bg m
  JOIN uni u ON u.tok = split_part(m.bg, ' ', 1)
  CROSS JOIN vocab)
SELECT d.doc_id, CAST(SUM(d.n_occ) AS BIGINT) AS n_bigrams,
       CAST(SUM(d.n_occ * s.qlp) AS BIGINT) AS qlp_sum,
       -CAST(SUM(d.n_occ * s.qlp) AS DOUBLE)
         / (CAST(SUM(d.n_occ) AS DOUBLE) * 1e6) AS cross_entropy
FROM docbg d JOIN scored s ON d.bg = s.bg
GROUP BY d.doc_id ORDER BY d.doc_id
"""


def docs_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier trained on the
    corpus's own (text, lang) pairs, reported as a confusion matrix
    (true lang x predicted lang x doc count) — the standard sanity
    gate before trusting a cheap classifier on unlabeled 100 TB data.

    score(doc, L) = q(prior_L) + sum_w n_w * [q(c_wL + 1) - q(N_L + V)]
    with all q() = floor(ln(x)*1e6) BIGINTs, so the argmax compares
    exact integers; ties break to the lexicographically first lang.

    Plan: per-(doc, token) counts shuffle once keyed by token for the
    scoring join against the (token x lang) smoothed model (built from
    vocab x langs — langs are a HANDFUL, so the model is |V|·|L| rows);
    the per-class totals and priors are broadcast scalars.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    toks = docs.select(
        "doc_id", "lang",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"))
    dw = (
        toks.filter(F.size("t") >= 1)
        .select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("n_w"))
        .persist()
    )
    q = lambda c: F.floor(F.log(c.cast("double")) * F.lit(1e6)).cast("long")
    wc = (
        toks.select("lang", F.explode("t").alias("tok"))
        .groupBy("lang", "tok").agg(F.count("*").alias("c_wl"))
    )
    class_tot = wc.groupBy("lang").agg(F.sum("c_wl").alias("n_l"))
    vocab = dw.select("tok").distinct()
    v = vocab.agg(F.count("*").alias("v"))
    model = (
        vocab.crossJoin(F.broadcast(class_tot))
        .join(wc, ["lang", "tok"], "left")
        .crossJoin(F.broadcast(v))
        .select("tok", "lang",
                (q(F.coalesce(F.col("c_wl"), F.lit(0)) + 1)
                 - q(F.col("n_l") + F.col("v"))).alias("qlw"))
    )
    priors = (
        docs.groupBy(F.col("lang")).agg(F.count("*").alias("n_docs_l"))
        .crossJoin(F.broadcast(
            docs.agg(F.count("*").alias("n_docs"))))
        .select("lang", (q(F.col("n_docs_l"))
                         - q(F.col("n_docs"))).alias("q_prior"))
    )
    scores = (
        dw.join(model, "tok")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("n_w") * F.col("qlw")).alias("q_like"))
        .join(F.broadcast(priors), "lang")
        .select("doc_id", "lang",
                (F.col("q_like") + F.col("q_prior")).alias("score"))
    )
    from pyspark.sql import Window
    pick = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang").asc())
    pred = (
        scores.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )
    out = (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang").agg(F.count("*").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )
    return materialize_release(out, dw)


NAIVE_BAYES_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL),
dw AS (
  SELECT doc_id, tok, COUNT(*) AS n_w
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks WHERE len(t) >= 1)
  GROUP BY 1, 2),
wc AS (
  SELECT lang, tok, COUNT(*) AS c_wl
  FROM (SELECT lang, unnest(t) AS tok FROM toks) GROUP BY 1, 2),
class_tot AS (SELECT lang, CAST(SUM(c_wl) AS BIGINT) AS n_l
              FROM wc GROUP BY lang),
vocab AS (SELECT DISTINCT tok FROM dw),
v AS (SELECT COUNT(*) AS v FROM vocab),
model AS (
  SELECT vocab.tok, ct.lang,
         {_QLN('COALESCE(wc.c_wl, 0) + 1')} - {_QLN('ct.n_l + v.v')} AS qlw
  FROM vocab CROSS JOIN class_tot ct
  LEFT JOIN wc ON wc.lang = ct.lang AND wc.tok = vocab.tok
  CROSS JOIN v),
priors AS (
  SELECT lang, {_QLN('COUNT(*)')}
           - {_QLN('(SELECT COUNT(*) FROM documents WHERE text IS NOT NULL)')}
           AS q_prior
  FROM documents WHERE text IS NOT NULL GROUP BY lang),
scores AS (
  SELECT dw.doc_id, m.lang,
         CAST(SUM(dw.n_w * m.qlw) AS BIGINT) + ANY_VALUE(p.q_prior) AS score
  FROM dw JOIN model m ON m.tok = dw.tok
  JOIN priors p ON p.lang = m.lang
  GROUP BY dw.doc_id, m.lang),
pred AS (
  SELECT doc_id, lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scores)
SELECT d.lang AS true_lang, p.pred_lang, COUNT(*) AS n_docs
FROM documents d JOIN pred p ON p.doc_id = d.doc_id AND p.rn = 1
WHERE d.text IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES["text_lm_perplexity"] = text_lm_perplexity
ORACLE_SQL["text_lm_perplexity"] = LM_PERPLEXITY_SQL
QUERIES["docs_naive_bayes_lang"] = docs_naive_bayes_lang
ORACLE_SQL["docs_naive_bayes_lang"] = NAIVE_BAYES_SQL


#: RAKE stopword segmenters (the synthetic corpus's function words;
#: a real deployment passes its own list)
RAKE_STOPWORDS = ("the", "a")
RAKE_MIN_OCC = 3


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs; each word scores
    degree/frequency over the phrase corpus (degree = summed length
    of phrases it appears in), and a phrase scores the sum of its
    words' scores. The cheap unsupervised keyword baseline every
    corpus intake wants next to TF-IDF.

    Integer-exact: degree and frequency are counts; word scores are
    milli-units via integer DIV, phrase scores integer sums of those.
    Plan: positions from one posexplode; run segmentation is a
    DOC-KEYED window cumsum (no global window); phrase assembly is a
    (doc, run)-keyed aggregate; word stats one more keyed count. All
    shuffles are keyed by doc or token — the wordcount shape.
    """
    docs = load_tables(spark, sf_dir)["documents"].filter(
        F.col("text").isNotNull())
    from pyspark.sql import Window
    toks = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", " "), lambda x: x != ""))
        .alias("pos", "tok"))
    runs = toks.withColumn(
        "is_stop", F.col("tok").isin(*RAKE_STOPWORDS)).withColumn(
        "run_id",
        F.sum(F.when(F.col("is_stop"), 1).otherwise(0)).over(
            Window.partitionBy("doc_id").orderBy("pos")))
    # cache WORDS (the posexplode + per-doc window cumsum subtree) and
    # PW, the two frames the plan reads twice: with only `phrases`
    # cached, the tokenize+window pipeline ran 3x (phrases build, both
    # pw branches) — guide §1.2: each subtree evaluates exactly once.
    # `phrases` itself is read once (the pw join), so it needs no cache.
    words = runs.filter(~F.col("is_stop")).persist()
    phrases = (
        words.groupBy("doc_id", "run_id")
        .agg(F.count("*").alias("phrase_len"),
             F.concat_ws(
                 " ",
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                     lambda s: s["tok"])).alias("phrase"))
    )
    pw = words.join(phrases, ["doc_id", "run_id"]).select(
        "doc_id", "run_id", "tok", "phrase_len", "phrase").persist()
    wstats = (
        pw.groupBy("tok")
        .agg(F.sum("phrase_len").alias("deg"), F.count("*").alias("freq"))
        .withColumn("w_score_milli", F.expr("(deg * 1000) DIV freq"))
    )
    phrase_occ = (
        pw.join(wstats.select("tok", "w_score_milli"), "tok")
        .groupBy("doc_id", "run_id", "phrase")
        .agg(F.sum("w_score_milli").alias("score_milli"))
    )
    out = (
        phrase_occ.groupBy("phrase")
        .agg(F.count("*").alias("n_occ"),
             F.max("score_milli").alias("score_milli"))
        .filter(F.col("n_occ") >= RAKE_MIN_OCC)
        .orderBy("phrase")
    )
    return materialize_release(out, words, pw)


_RAKE_STOP_SQL = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)

RAKE_SQL = f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL),
       unnest(range(1, len(t) + 1)) AS u(i)),
runs AS (
  SELECT doc_id, pos, tok, tok IN ({_RAKE_STOP_SQL}) AS is_stop,
         SUM(CASE WHEN tok IN ({_RAKE_STOP_SQL}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM toks),
phrases AS (
  SELECT doc_id, run_id, COUNT(*) AS phrase_len,
         string_agg(tok, ' ' ORDER BY pos) AS phrase
  FROM runs WHERE NOT is_stop GROUP BY 1, 2),
pw AS (
  SELECT r.doc_id, r.run_id, r.tok, p.phrase_len, p.phrase
  FROM runs r JOIN phrases p
    ON p.doc_id = r.doc_id AND p.run_id = r.run_id
  WHERE NOT r.is_stop),
wstats AS (
  SELECT tok, (CAST(SUM(phrase_len) AS BIGINT) * 1000) // COUNT(*)
           AS w_score_milli
  FROM pw GROUP BY tok),
phrase_occ AS (
  SELECT pw.doc_id, pw.run_id, pw.phrase,
         CAST(SUM(w.w_score_milli) AS BIGINT) AS score_milli
  FROM pw JOIN wstats w ON w.tok = pw.tok
  GROUP BY 1, 2, 3)
SELECT phrase, COUNT(*) AS n_occ,
       CAST(MAX(score_milli) AS BIGINT) AS score_milli
FROM phrase_occ GROUP BY phrase
HAVING COUNT(*) >= {RAKE_MIN_OCC}
ORDER BY phrase
"""


QUERIES["text_rake_keywords"] = text_rake_keywords
ORACLE_SQL["text_rake_keywords"] = RAKE_SQL


REPEAT_MAX_N = 5  # longest repeated n-gram probed up to this length


def text_longest_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus histogram of each document's LONGEST REPEATED n-gram
    length (1..REPEAT_MAX_N tokens; 0 = no token repeats at all) — the
    self-repetition probe behind "loopy generation" / boilerplate
    filters: a doc whose longest in-doc repeat is 4-5 tokens is almost
    always template or degenerate text (cf. text_repetition, which
    scores a fixed n; this finds the maximal n per doc).

    Plan: the repeat test never leaves the ROW — per n, the doc's
    n-grams are sorted in-array and scanned for an adjacent duplicate
    (repeat-sets are downward-closed: a repeated n-gram implies
    repeated sub-grams, so folding n ascending yields the max) — so
    the ONLY exchange in the whole query is the final |n|-row
    histogram. The first cut exploded a (doc, n, gram) stream into a
    corpus-sized shuffle; at 100 TB that shuffle IS the query, and it
    buys nothing a per-row sort doesn't."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    # the testdata table is one parquet split; the per-row sort work
    # must run wide (the llm_ops/similarity._emb rationale) — at real
    # scale the scan has many splits and this collapses into them
    n = spark.sparkContext.defaultParallelism
    toks = docs.repartition(n, "doc_id").select(
        F.filter(F.split("text", " "), lambda x: x != "").alias("tt"))
    # the 1-element transform binds the sorted gram array once per
    # (row, n) — a let-expression equivalent, so the sort runs once,
    # not once per adjacency probe
    max_rep = F.expr(f"""
      aggregate(sequence(1, {REPEAT_MAX_N}), 0, (acc, n) ->
        IF(size(tt) > n AND (
             aggregate(transform(
                 array(array_sort(transform(sequence(0, size(tt) - n),
                     i -> array_join(slice(tt, i + 1, n), ' ')))),
                 srt -> exists(sequence(1, size(srt) - 1),
                               j -> srt[j] = srt[j - 1])),
               false, (a, x) -> a OR x)),
           n, acc))
    """)
    return (
        toks.select(F.coalesce(max_rep, F.lit(0)).cast("long")
                    .alias("max_repeat_len"))
        .groupBy("max_repeat_len").agg(F.count("*").alias("n_docs"))
        .orderBy("max_repeat_len")
    )


LONGEST_REPEAT_SQL = f"""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tt
  FROM documents),
per_doc AS (
  SELECT COALESCE(list_max(list_filter(range(1, {REPEAT_MAX_N + 1}),
    n -> len(tt) > n AND len(list_filter(
           list_transform([list_sort(list_transform(
               range(0, len(tt) - n + 1),
               i -> array_to_string(list_slice(tt, i + 1, i + n), ' ')))],
             srt -> len(list_filter(range(2, len(srt) + 1),
                                    j -> srt[j] = srt[j - 1])) > 0),
           x -> x)) > 0)), 0) AS max_repeat_len
  FROM toks)
SELECT CAST(max_repeat_len AS BIGINT) AS max_repeat_len,
       COUNT(*) AS n_docs
FROM per_doc GROUP BY 1 ORDER BY 1
"""


QUERIES["text_longest_repeat"] = text_longest_repeat
ORACLE_SQL["text_longest_repeat"] = LONGEST_REPEAT_SQL


BPE_LEARN_ROUNDS = 3


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE BPE training: learn the first BPE_LEARN_ROUNDS merges
    (bpe_merge_candidates ranks round-1 candidates only; real
    tokenizer training APPLIES the winning merge and recounts). Words
    are symbol strings (' t h e _ '); each round counts weighted
    adjacent symbol pairs over the distinct-word table, picks the max
    (ties: lexicographic), and rewrites every word with the fused
    symbol. Output: the merge table (round, sym_a, sym_b, n) — the
    artifact a tokenizer ships.

    Merge application is TWO passes of string replace(' a b ',' ab ')
    per round: replace() scans left-to-right without rescanning
    (identical semantics in the JVM and DuckDB), and the second pass
    catches the alternating occurrences the first pass's consumed
    boundary space hides. For runs of one repeated symbol pair this
    bounds at textbook-BPE parity up to 4-long runs — documented
    deviation; the corpus statistics that matter (which merge wins
    each round) are computed exactly on BOTH engines from the SAME
    rewrite, so the oracle comparison is airtight either way.

    Scale: pair counting is the wordcount shape over the |vocab|-sized
    distinct-word table (corpus text is touched once); each winning
    merge is a 1-row driver value (the merge table IS driver-sized —
    the kmeans-centroid convention) re-broadcast as a literal; the
    rewrite is a narrow map.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    words = (
        docs.select(F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c"))
        .select(F.concat(
            F.lit(" "),
            F.array_join(F.expr(
                "transform(sequence(1, length(w) + 1), "
                "i -> substring(w || '_', i, 1))"), " "),
            F.lit(" ")).alias("s"), "c")
        .persist()
    )
    try:
        words.count()
        merges = []
        cur = words
        for rnd in range(1, BPE_LEARN_ROUNDS + 1):
            syms = cur.select(
                "c", F.split(F.trim(F.col("s")), " ").alias("a"))
            pairs = syms.select(
                "c", F.explode(F.expr(
                    "transform(sequence(1, size(a) - 1), "
                    "i -> struct(a[i - 1] AS pa, a[i] AS pb))")).alias("p"))
            top = (
                pairs.groupBy("p.pa", "p.pb")
                .agg(F.sum("c").alias("n"))
                .orderBy(F.col("n").desc(), "pa", "pb").limit(1)
                .collect()[0]
            )
            merges.append((rnd, top["pa"], top["pb"], top["n"]))
            cur = cur.select(
                F.expr(f"replace(replace(s, ' {top['pa']} {top['pb']} ', "
                       f"' {top['pa']}{top['pb']} '), "
                       f"' {top['pa']} {top['pb']} ', "
                       f"' {top['pa']}{top['pb']} ')").alias("s"),
                "c").localCheckpoint(eager=False)
        return spark.createDataFrame(
            merges, "round long, sym_a string, sym_b string, n long")
    finally:
        words.unpersist()


def _bpe_learn_sql() -> str:
    cte = """words0 AS MATERIALIZED (
  SELECT ' ' || array_to_string(list_transform(
           range(1, length(w || '_') + 1),
           i -> substring(w || '_', i, 1)), ' ') || ' ' AS s,
         c
  FROM (SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY w))"""
    for r in range(1, BPE_LEARN_ROUNDS + 1):
        cte += f""",
top{r} AS MATERIALIZED (
  SELECT pa, pb, CAST(SUM(c) AS BIGINT) AS n FROM (
    SELECT c, a[i] AS pa, a[i + 1] AS pb
    FROM (SELECT c, string_split(trim(s), ' ') AS a FROM words{r - 1}),
         unnest(range(1, len(a))) AS t(i))
  GROUP BY pa, pb ORDER BY n DESC, pa, pb LIMIT 1),
words{r} AS MATERIALIZED (
  SELECT replace(replace(w.s, ' ' || t.pa || ' ' || t.pb || ' ',
                         ' ' || t.pa || t.pb || ' '),
                 ' ' || t.pa || ' ' || t.pb || ' ',
                 ' ' || t.pa || t.pb || ' ') AS s, w.c
  FROM words{r - 1} w CROSS JOIN top{r} t)"""
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, pa AS sym_a, pb AS sym_b, n"
        f" FROM top{r}" for r in range(1, BPE_LEARN_ROUNDS + 1))
    return f"WITH {cte}\n{selects}\nORDER BY round"


BPE_LEARN_SQL = _bpe_learn_sql()

QUERIES["bpe_learn_merges"] = bpe_learn_merges
ORACLE_SQL["bpe_learn_merges"] = BPE_LEARN_SQL
