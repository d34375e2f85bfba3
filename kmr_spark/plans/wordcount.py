"""Wordcount top-k — the reference's canonical pipeline
(map -> shuffle -> reduce -> reverse -> sort -> top-k,
reference ex/wordcount.c:80-111).

Spark-first: explode + groupBy + TakeOrderedAndProject. The groupBy gets
map-side partial aggregation (KMR's combiner idiom, src/kmrmoreops.c:1009)
and the top-k never materializes a global sort — per-partition heaps merge
on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables

TOP_K = 20


def wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 words of documents.text by count (desc), word (asc)."""
    docs = load_tables(spark, sf_dir)["documents"]
    words = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word")).filter(
        F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(TOP_K)
    )


WORDCOUNT_SQL = f"""
SELECT word, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word ASC
LIMIT {TOP_K}
"""


QUERIES = {"wordcount_topk": wordcount_topk}
ORACLE_SQL = {"wordcount_topk": WORDCOUNT_SQL}
