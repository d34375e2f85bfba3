#!/usr/bin/env python
"""The reference's wordcount, step for step, on the KVS facade
(reference ex/wordcount.c:80-111: map -> shuffle -> reduce -> reverse ->
sort -> top-5).

Run: python examples/wordcount_kvs.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kmr_spark.kvs import KVS
from kmr_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("wordcount-example")
    docs = load_tables(spark, sf_dir)["documents"]

    # map: one (word, 1) per word            (ex/wordcount.c read_words_from_a_file)
    kvs = KVS.from_columns(docs, F.explode(F.split("text", " ")), F.lit(1)).filter(
        F.col("key") != "")
    # shuffle + reduce: sum counts per word  (ex/wordcount.c sum_counts_for_a_word)
    counts = kvs.shuffle().reduce_expr(F.sum("value").alias("value"))
    # reverse: (count, word), sort desc, top-5   (ex/wordcount.c:92-107)
    top5 = counts.reverse().top_k(5, descending=True)

    for count, word in top5.collect_pairs():
        print(f"{word}\t{count}")
    spark.stop()


if __name__ == "__main__":
    main()
