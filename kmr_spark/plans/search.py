"""Search/retrieval primitives: inverted-index build + phrase query.

The reference bills itself as "a scalable tool for data-processing
and search/retrieval" (/root/reference/README.md:7-21; Matsuda et al.,
IEEE CLUSTER 2013) — the retrieval half is an inverted index built as
a MapReduce (the wordcount shape, /root/reference/ex/wordcount.c, with
the doc id carried through the shuffle) and queries answered from
posting lists. Re-expressed Spark-first:

- ``search_inverted_index``: the index BUILD as one explode + two
  map-side-combinable aggregations — (token, doc) term frequencies,
  then per-token document frequency / total frequency / argmax doc.
  At 100 TB this is exactly wordcount's scale shape: the shuffle
  carries (token, doc, tf) partials, never raw text, and the final
  top-N is TakeOrdered, not a global sort.
- ``search_phrase_query``: a positional-adjacency phrase match. The
  phrase (the corpus's top bigram — derived, not hardcoded, so the
  query is meaningful at every sf) is resolved with a 1-row broadcast
  join, and adjacency is checked INSIDE each document's token array —
  no position-level self-join shuffle, which is the classic phrase-
  query scale trap (positions stay co-located with their doc).

Exactness: all outputs are integers; argmax ties are packed into one
BIGINT key (tf * 2^40 + (2^40-1-doc_id)) so "max tf, then min doc"
is a plain MAX on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables, materialize_release

TOP_TOKENS = 25
TOP_DOCS = 10
# doc_id < 2^40 by many orders of magnitude even at 100 TB scale
_PACK = 1 << 40

QUERIES = {}
ORACLE_SQL = {}

def _toks():
    """Token-array Column, built lazily: constructing Columns needs an
    active SparkContext, and this module must stay importable without
    one (the registry is imported before the driver's session in some
    paths)."""
    return F.filter(F.split("text", " "), lambda x: x != "")


_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics for the TOP_TOKENS highest-df tokens:
    document frequency, collection frequency, the max in-document tf
    and the doc that attains it (ties -> min doc_id). The build is the
    two-stage wordcount: explode once, combine (token, doc) partials
    map-side, then a token-keyed rollup whose input is |vocab x docs
    containing| — already sublinear in corpus bytes."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    tf = (
        docs.select("doc_id", F.explode(_toks()).alias("token"))
        .groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
    )
    packed = F.col("tf") * F.lit(_PACK) + (F.lit(_PACK - 1) - F.col("doc_id"))
    stats = (
        tf.groupBy("token")
        .agg(F.count("*").alias("df"),
             F.sum("tf").alias("cf"),
             F.max(packed).alias("pk"))
        .select(
            "token", "df", "cf",
            (F.col("pk") / F.lit(_PACK)).cast("long").alias("max_tf"),
            (F.lit(_PACK - 1) - F.col("pk") % F.lit(_PACK)).alias("top_doc"))
    )
    return stats.orderBy(F.col("df").desc(), "token").limit(TOP_TOKENS)


INVERTED_INDEX_SQL = f"""
WITH tf AS (
  SELECT token, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS token
        FROM documents)
  GROUP BY token, doc_id),
stats AS (
  SELECT token,
         COUNT(*) AS df,
         CAST(SUM(tf) AS BIGINT) AS cf,
         MAX(tf * {_PACK} + ({_PACK - 1} - doc_id)) AS pk
  FROM tf GROUP BY token)
SELECT token, df, cf,
       pk // {_PACK} AS max_tf,
       {_PACK - 1} - (pk % {_PACK}) AS top_doc
FROM stats ORDER BY df DESC, token LIMIT {TOP_TOKENS}
"""

QUERIES["search_inverted_index"] = search_inverted_index
ORACLE_SQL["search_inverted_index"] = INVERTED_INDEX_SQL


def search_phrase_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query against positional postings: find every document
    containing the corpus's most frequent bigram (ties -> lexicographic
    min), with per-doc occurrence count and first match position;
    top TOP_DOCS by count (ties -> min doc_id), plus the phrase
    itself so the row is self-describing.

    The phrase is resolved as a 1-row aggregate BROADCAST against the
    bigram stream — no collect, no second scan of raw text — and the
    adjacency test never leaves the row: a document's positions are
    an array local to its task."""
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    toks = docs.select("doc_id", _toks().alias("tt"))
    grams = toks.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(slice(tt, 1, greatest(size(tt) - 1, 0)), "
            "(x, i) -> struct(x AS w1, tt[i + 1] AS w2))")).alias("pos", "g"))
    counts = grams.groupBy("g.w1", "g.w2").agg(F.count("*").alias("n"))
    top1 = (
        counts.orderBy(F.col("n").desc(), "w1", "w2").limit(1)
        .select(F.col("w1").alias("p1"), F.col("w2").alias("p2"))
    )
    hits = (
        grams.join(F.broadcast(top1),
                   (F.col("g.w1") == F.col("p1"))
                   & (F.col("g.w2") == F.col("p2")))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_occ"),
             F.min("pos").alias("first_pos"),
             F.min("p1").alias("w1"), F.min("p2").alias("w2"))
    )
    return (
        hits.select("doc_id", "w1", "w2", "n_occ",
                    F.col("first_pos").cast("long").alias("first_pos"))
        .orderBy(F.col("n_occ").desc(), "doc_id").limit(TOP_DOCS)
    )


PHRASE_QUERY_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS tt FROM documents),
grams AS (
  SELECT doc_id, i AS pos, tt[i + 1] AS w1, tt[i + 2] AS w2
  FROM toks, unnest(range(0, len(tt) - 1)) AS t(i)),
top1 AS (
  SELECT w1 AS p1, w2 AS p2 FROM grams
  GROUP BY w1, w2 ORDER BY COUNT(*) DESC, w1, w2 LIMIT 1),
hits AS (
  SELECT g.doc_id, MIN(t.p1) AS w1, MIN(t.p2) AS w2,
         COUNT(*) AS n_occ, CAST(MIN(g.pos) AS BIGINT) AS first_pos
  FROM grams g JOIN top1 t ON g.w1 = t.p1 AND g.w2 = t.p2
  GROUP BY g.doc_id)
SELECT doc_id, w1, w2, n_occ, first_pos
FROM hits ORDER BY n_occ DESC, doc_id LIMIT {TOP_DOCS}
"""

QUERIES["search_phrase_query"] = search_phrase_query
ORACLE_SQL["search_phrase_query"] = PHRASE_QUERY_SQL


BM25_TERMS = 3   # query = the corpus's top-BM25_TERMS tokens by cf
BM25_TOP = 10
# k1 = 6/5, b = 3/4 as exact rationals: clearing denominators by 20*S
# turns the tf saturation into integers (num = 44*tf*S,
# den = 20*tf*S + 6*S + 18*dl*N)


def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval: BM25 top-BM25_TOP documents for a derived
    query (the corpus's BM25_TERMS most frequent tokens, ties
    lexicographic) — the scoring half of the search/retrieval story
    (inverted index -> phrase match -> ranked retrieval;
    /root/reference/README.md:7-21). Okapi BM25 with k1=1.2, b=0.75.

    Exactness: k1/b are exact rationals cleared to integers against
    20*S (S = total corpus tokens), so each term's saturation is an
    integer ratio; idf uses the common-denominator quantized-log
    recipe, idf_micro = q(2N+2) - q(2*df+1) with q(x) =
    floor(ln(x)*1e6) on an INTEGER argument (both engines take ln of
    the same exact double). A doc's score sums its <=3 term scores in
    fixed term order (pivoted columns), so every output double is one
    fixed expression tree and ORDER BY score is hash-safe.

    Scale: tf/df/dl are the inverted-index aggregates (map-side
    combined); the 3-term query and the (N, S) totals ride a
    broadcast; the final cut is TakeOrdered. Nothing joins on raw
    text; the integer numerators stay under 2^63 for corpora to ~1e14
    total tokens — past that, the same plan runs in DECIMAL(38,0).
    """
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    toks = docs.select("doc_id", F.explode(_toks()).alias("token"))
    # the inverted index (token, doc) -> tf is the ONE corpus-sized
    # pass; persisted, it also yields doc lengths (dl = SUM(tf) per
    # doc — exactly COUNT(*) over the token stream) and corpus totals,
    # so the tokenize+explode runs once instead of four times
    tf = (toks.groupBy("token", "doc_id").agg(F.count("*").alias("tf"))
          .persist())
    dl = (tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
          .persist())
    totals = dl.agg(F.count("*").alias("n_docs"),
                    F.sum("dl").alias("s_tokens"))
    from pyspark.sql import Window
    top_terms = (
        tf.groupBy("token").agg(F.sum("tf").alias("cf"),
                                F.count("*").alias("df"))
        .orderBy(F.col("cf").desc(), "token").limit(BM25_TERMS)
        # window over the BM25_TERMS-row frame only (post-limit)
        .withColumn("term_rank", F.row_number().over(
            Window.orderBy(F.col("cf").desc(), "token")))
    )
    q = F.lit(1000000.0)
    idf_micro = (F.floor(F.log(2 * F.col("n_docs") + 2) * q)
                 - F.floor(F.log(2 * F.col("df") + 1) * q))
    scored = (
        tf.join(F.broadcast(top_terms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id", "dl", "term_rank",
            (idf_micro.cast("double")
             * (44 * F.col("tf") * F.col("s_tokens")).cast("double")
             / (20 * F.col("tf") * F.col("s_tokens") + 6 * F.col("s_tokens")
                + 18 * F.col("dl") * F.col("n_docs")).cast("double"))
            .alias("ts"))
    )
    pivoted = scored.groupBy("doc_id").agg(
        F.max("dl").alias("dl"),
        *[F.coalesce(F.max(F.when(F.col("term_rank") == r, F.col("ts"))),
                     F.lit(0.0)).alias(f"s{r}")
          for r in range(1, BM25_TERMS + 1)])
    score = F.col("s1")
    for r in range(2, BM25_TERMS + 1):
        score = score + F.col(f"s{r}")
    out = (
        pivoted.select("doc_id", "dl", score.alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id").limit(BM25_TOP)
    )
    return materialize_release(out, tf, dl)


BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
totals AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS s_tokens FROM dl),
tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
top_terms AS (
  SELECT token, df,
         row_number() OVER (ORDER BY cf DESC, token) AS term_rank
  FROM (SELECT token, CAST(SUM(tf) AS BIGINT) AS cf, COUNT(*) AS df
        FROM tf GROUP BY token)
  ORDER BY cf DESC, token LIMIT {BM25_TERMS}),
scored AS (
  SELECT tf.doc_id, dl.dl, tt.term_rank,
         CAST(floor(ln(2 * t.n_docs + 2) * 1000000.0)
              - floor(ln(2 * tt.df + 1) * 1000000.0) AS DOUBLE)
         * CAST(44 * tf.tf * t.s_tokens AS DOUBLE)
         / CAST(20 * tf.tf * t.s_tokens + 6 * t.s_tokens
                + 18 * dl.dl * t.n_docs AS DOUBLE) AS ts
  FROM tf JOIN top_terms tt USING (token)
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN totals t),
pivoted AS (
  SELECT doc_id, MAX(dl) AS dl,
         {", ".join(
             f"COALESCE(MAX(CASE WHEN term_rank = {r} THEN ts END), 0.0)"
             f" AS s{r}" for r in range(1, BM25_TERMS + 1))}
  FROM scored GROUP BY doc_id)
SELECT doc_id, dl, {" + ".join(f"s{r}" for r in range(1, BM25_TERMS + 1))}
         AS score_micro
FROM pivoted ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOP}
"""

QUERIES["search_bm25_topk"] = search_bm25_topk
ORACLE_SQL["search_bm25_topk"] = BM25_SQL
