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

from kmr_spark.session import load_tables

TOP_TOKENS = 25
TOP_DOCS = 10
# doc_id < 2^40 by many orders of magnitude even at 100 TB scale
_PACK = 1 << 40

QUERIES = {}
ORACLE_SQL = {}

_TOKS = F.filter(F.split("text", " "), lambda x: x != "")
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
        docs.select("doc_id", F.explode(_TOKS).alias("token"))
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
    toks = docs.select("doc_id", _TOKS.alias("tt"))
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
