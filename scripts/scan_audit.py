#!/usr/bin/env python
"""Audit: how many times does each declared query SCAN each base
parquet table (per its explain('formatted') plan)?

A query whose plan scans the same FACT table (events, lineitem,
orders, documents, embeddings) more than once re-reads data that a
single pass could provide — the guide SS1.2 "don't evaluate a subtree
twice" smell, usually from crossJoin(broadcast(df.agg(...))) share-of-
total forms. Dimension tables (region, nation, ...) are cheap at any
scale and not flagged.

Run: python scripts/scan_audit.py [--sf DIR] [query ...]
Prints one line per query with >1 scan of any fact table.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTS = ("events", "lineitem", "orders", "documents", "embeddings",
         "customer", "part", "supplier")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[2]")
             .appName("scan-audit").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = args.queries or sorted(queries)

    from plan_stub import passthrough_materialize

    for name in names:
        fn = queries[name]
        try:
            # stub materialize_release so queries ending in a
            # localCheckpoint expose their real pipeline (zero parquet
            # Locations otherwise) and are not eagerly executed just
            # to be audited (ADVICE r11 #1)
            with contextlib.redirect_stdout(io.StringIO()) as buf, \
                    passthrough_materialize():
                df = fn(spark, args.sf)
                df.explain("formatted")
            plan = buf.getvalue()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}",
                  flush=True)
            continue
        counts = {}
        for m in re.finditer(r"Location:.*?([a-z_]+)\.parquet", plan):
            t = m.group(1)
            counts[t] = counts.get(t, 0) + 1
        flagged = {t: c for t, c in counts.items()
                   if t in FACTS and c > 1}
        tag = " ".join(f"{t}x{c}" for t, c in sorted(flagged.items()))
        print(f"{name}\t{tag or '-'}\t{sum(counts.values())} scans",
              flush=True)


if __name__ == "__main__":
    main()
