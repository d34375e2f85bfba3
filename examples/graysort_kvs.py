#!/usr/bin/env python
"""GraySort on the KVS facade (reference ex/graysort.c): sort opaque
binary keys globally, validate sortedness + checksum (valsort
semantics, ex/graysort.c:5-10).

Run: python examples/graysort_kvs.py [n_records]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kmr_spark.kvs import KVS
from kmr_spark.operators.sort import is_globally_sorted
from kmr_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("graysort-example")

    # gensort stand-in: 10-byte binary keys, 90-byte payloads (RECLEN 100)
    records = spark.range(n).select(
        F.substring(F.unhex(F.md5(F.col("id").cast("string"))), 1, 10).alias("key"),
        F.substring(F.repeat(F.unhex(F.md5((F.col("id") + 1).cast("string"))), 6), 1, 90)
        .alias("value"),
    )
    kvs = KVS(records)

    checksum_before = kvs.df.agg(F.sum(F.crc32("value")).alias("c")).collect()[0]["c"]
    sorted_kvs = kvs.sort()
    checksum_after = sorted_kvs.df.agg(F.sum(F.crc32("value")).alias("c")).collect()[0]["c"]

    ok_order = is_globally_sorted(sorted_kvs.df, "key")
    ok_sum = checksum_before == checksum_after
    print(f"records={n} sorted={ok_order} checksum_match={ok_sum}")
    assert ok_order and ok_sum
    spark.stop()


if __name__ == "__main__":
    main()
