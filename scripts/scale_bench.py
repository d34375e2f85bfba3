#!/usr/bin/env python
"""Scale-law bench: measure how query wall clock grows with data size.

The correctness gates run at toy scale factors; this harness produces
the *scaling evidence* — for each headline query, time it at several
data scales and report the empirical scaling exponent
``alpha = d log(time) / d log(rows)``.  A distributed-safe plan shows
alpha <= ~1 (linear in data, or fixed-cost-dominated alpha ~ 0 at toy
sf); a plan hiding an all-pairs or single-task bottleneck shows
alpha >> 1 and gets caught HERE, before a real cluster does.

Two subcommands:

``generate``
    Build a larger synthetic scale from the existing driver testdata
    by replicating each table K times with disjoint key spaces
    (replica k offsets every int64 key column by k * stride, where
    stride is a per-key-domain constant derived from the base data's
    max key).  Referential integrity is preserved exactly — replica
    k's lineitem rows join replica k's orders/part/supplier rows and
    nothing else — so every join's selectivity and per-key fan-out
    match the base data and only the VOLUME grows.  Fixed dimension
    tables (region, nation) are copied as-is, like real dims.
    Output layout mirrors the driver testdata (DIR/table.parquet),
    so every registry query runs on it unchanged via load_tables.

``run``
    Time a query list across a comma-separated list of sf dirs
    (warmup + N repeats, min taken), then print per-query times,
    pairwise ratios, and the fitted exponent vs the table family the
    query actually scans (events queries scale vs events rows, text/
    dedup vs documents, sim/emb vs embeddings, default lineitem).
    Ends with one compact JSON line for machine capture.

Example (10x the sf0.1 data — "sf1-equivalent"):
    python scripts/scale_bench.py generate --out /tmp/kmr_scale/sf1
    python scripts/scale_bench.py run \
        --dirs /root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/kmr_scale/sf1
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: int64 key columns per table -> key-domain name.  Every column in one
#: domain gets the same stride so cross-table joins stay aligned.
KEY_DOMAINS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
#: copied verbatim (fixed-size dimensions, like real-world dims)
DIM_TABLES = ("region", "nation")

#: default query list for scale runs: one representative per operator
#: family whose input actually grows (brute-force kNN is excluded on
#: purpose — it is the documented O(n^2) baseline; sim_ann_ivf is the
#: scale path and stands in for the family).
SCALE_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q6", "tpch_q9", "tpch_q13",
    "tpch_q18", "tpch_q21",
    "wordcount_topk", "graysort_rank",
    "events_type_stats", "events_running_sum", "events_sessionize",
    "events_funnel", "events_tumbling_window",
    "iter_pagerank", "graph_components",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_ann_ivf",
    "text_stats", "text_token_counts",
    "pack_sequences",
]

#: which table's row count a query family scales against
def scale_table(name: str) -> str:
    if name.startswith(("events_", "graph_", "iter_", "graysort")):
        return "events"
    if name.startswith(("text_", "dedup_", "docs_", "wordcount", "doc_",
                        "corpus", "bpe_", "train_", "pack_")):
        return "documents"
    if name.startswith(("sim_", "emb_", "multimodal_")):
        return "embeddings"
    return "lineitem"


def _spark():
    from kmr_spark.session import get_spark

    spark = get_spark("kmr_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def generate(out: str, base: str, replicas: int, parts: int) -> None:
    from pyspark.sql import functions as F

    from kmr_spark.session import TABLES, load_tables

    spark = _spark()
    tables = load_tables(spark, base)
    # one stride per key domain, from the base data's max key, rounded
    # up to the next power of ten so offset keys stay human-readable
    strides: dict[str, int] = {}
    for tname, cols in KEY_DOMAINS.items():
        if tname not in tables:
            continue
        for col, dom in cols.items():
            mx = tables[tname].agg(F.max(col)).first()[0] or 0
            need = 10 ** max(1, math.ceil(math.log10(mx + 2)))
            strides[dom] = max(strides.get(dom, 0), need)
    print(json.dumps({"strides": strides, "replicas": replicas}))
    os.makedirs(out, exist_ok=True)
    rep = F.col("_rep")
    for tname in TABLES:
        if tname not in tables:
            continue
        df = tables[tname]
        dest = os.path.join(out, f"{tname}.parquet")
        if tname in DIM_TABLES:
            df.write.mode("overwrite").parquet(dest)
            continue
        # replicate: broadcast cross join with the replica ids (K rows),
        # then shift every key column into its replica's key space
        reps = spark.range(replicas).select(F.col("id").alias("_rep"))
        wide = df.crossJoin(F.broadcast(reps))
        for col, dom in KEY_DOMAINS.get(tname, {}).items():
            wide = wide.withColumn(
                col, (F.col(col) + rep * F.lit(strides[dom])).cast("long"))
        n_parts = parts if tname in ("lineitem", "orders", "events") else max(2, parts // 4)
        (wide.drop("_rep").repartition(n_parts)
         .write.mode("overwrite").parquet(dest))
        print(f"wrote {tname} x{replicas} -> {dest}")


def run(dirs: list[str], names: list[str], repeat: int,
        detail_out: str | None = None) -> None:
    import __spark_entry__ as entry
    from kmr_spark.session import parquet_num_rows

    spark = _spark()
    queries = entry.queries()
    names = [n for n in names if n in queries]
    rows = {d: {t: parquet_num_rows(d, t) or 0
                for t in ("lineitem", "events", "documents", "embeddings")}
            for d in dirs}
    print(json.dumps({"rows": rows}))
    path = detail_out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_detail.json")
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    errors: dict[str, dict[str, str]] = {}
    for d in dirs:
        for name in names:
            # one failing query / missing dir must not lose the hours of
            # timings already collected: record an error marker and move
            # on; the detail JSON is re-written after every directory.
            try:
                fn = queries[name]
                fn(spark, d).write.format("noop").mode("overwrite").save()  # warmup
                best = math.inf
                for _ in range(repeat):
                    spark.catalog.clearCache()
                    spark.sparkContext._jvm.System.gc()
                    time.sleep(0.2)
                    t0 = time.perf_counter()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                times[name][d] = round(best, 3)
                print(f"{name} @ {d}: {times[name][d]} s")
            except Exception as exc:
                errors.setdefault(name, {})[d] = f"{type(exc).__name__}: {exc}"
                print(f"{name} @ {d}: ERROR {type(exc).__name__}: {exc}")
        with open(path, "w") as f:
            json.dump({"partial_through_dir": d, "rows": rows,
                       "times": times, "errors": errors}, f, indent=1)
    # fitted exponent per query across the last dir pair (the largest
    # step is the least fixed-cost-contaminated) + across the full span
    report = {}
    for name in names:
        tbl = scale_table(name)
        pts = [(rows[d][tbl], times[name][d]) for d in dirs
               if rows[d][tbl] > 0 and times[name].get(d, 0) > 0]
        ent = {"scale_table": tbl,
               "times": {d: times[name][d] for d in dirs
                         if d in times[name]}}
        if name in errors:
            ent["errors"] = errors[name]
        if len(pts) >= 2 and pts[-1][0] > pts[-2][0]:
            n1, t1 = pts[-2]
            n2, t2 = pts[-1]
            ent["alpha_last"] = round(
                math.log(t2 / t1) / math.log(n2 / n1), 3)
        if len(pts) >= 2 and pts[-1][0] > pts[0][0]:
            ent["alpha_span"] = round(
                math.log(pts[-1][1] / pts[0][1])
                / math.log(pts[-1][0] / pts[0][0]), 3)
        report[name] = ent
        print(name, json.dumps(ent))
    summary = {
        "metric": "kmr_spark scale-law bench (min-of-%d noop-sink)" % repeat,
        "dirs": dirs,
        "n_queries": len(names),
        "alpha_last_max": max((e.get("alpha_last", 0.0)
                               for e in report.values()), default=None),
    }
    if errors:
        summary["n_errors"] = sum(len(v) for v in errors.values())
    out = {"summary": summary, "rows": rows, "report": report}
    if errors:
        out["errors"] = errors
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--out", default="/tmp/kmr_scale/sf1")
    g.add_argument("--base", default="/root/testdata/sf0.1")
    g.add_argument("--replicas", type=int, default=10)
    g.add_argument("--parts", type=int, default=32)
    r = sub.add_parser("run")
    r.add_argument("--dirs", default=",".join(
        ["/root/testdata/sf0.01", "/root/testdata/sf0.1",
         "/tmp/kmr_scale/sf1"]))
    r.add_argument("--queries", default=",".join(SCALE_QUERIES))
    r.add_argument("--repeat", type=int, default=2)
    r.add_argument("--detail-out", default=None,
                   help="where to write the JSON report "
                        "(default: repo-root scale_detail.json)")
    args = ap.parse_args()
    if args.cmd == "generate":
        generate(args.out, args.base, args.replicas, args.parts)
    else:
        run(args.dirs.split(","), args.queries.split(","), args.repeat,
            args.detail_out)


if __name__ == "__main__":
    main()
