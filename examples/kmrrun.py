"""kmrrun CLI parity: run a MapReduce of external programs in one
command (reference kmrrun/kmrrun.c — `kmrrun -m mapper -k kvgen -r
reducer input`), Spark edition.

    python examples/kmrrun.py -m 'cat' \
        -k 'awk {for(i=1;i<=NF;i++) print $i "\t" 1}' \
        -r 'awk -F\t {s[$1]+=$2} END{for(k in s) print k "\t" s[k]}' \
        -i /path/to/input.txt -o /tmp/out

Programs receive their partition's lines on stdin and emit lines on
stdout (commands are shlex-tokenized, not shell-evaluated). Omit -r
for a map-only job; with -o the result is written as per-key files.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from kmr_spark.sources.pipe import kmrrun_pipeline


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--mapper", required=True)
    ap.add_argument("-k", "--kvgen", default=None)
    ap.add_argument("-r", "--reducer", default=None)
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("-o", "--out-dir", default=None)
    args = ap.parse_args()
    spark = SparkSession.builder.appName("kmrrun").getOrCreate()
    df = kmrrun_pipeline(spark, args.input, args.mapper,
                         kvgen=args.kvgen, reducer=args.reducer,
                         out_dir=args.out_dir)
    for row in df.collect():
        print(f"{row['key']}\t{row['value']}")


if __name__ == "__main__":
    main()
