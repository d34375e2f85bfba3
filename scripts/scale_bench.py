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

#: dup-cap salt marker appended around the group id on every token of
#: salted document replicas ("hello" -> "hello§3§" in group 3).
#: U+00A7 survives space-split tokenization and never occurs in the
#: synthetic base vocabulary (asserted at generate time).
_SALT_MARKER = "§"

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


def generate(out: str, base: str, replicas: int, parts: int,
             dup_cap: int | None = None,
             only_tables: list[str] | None = None) -> None:
    """``dup_cap`` bounds DUPLICATE MASS in the replicated documents
    table: plain replication copies every text verbatim K times, so at
    K=100 each base near-dup cluster becomes one 100x-multiplicity
    component whose within-cluster candidate-pair count grows
    quadratically — a degenerate corpus no real pipeline sees (the
    single-node OOM adjudicated in SCALE.md round 8).  With dup_cap=C,
    replicas are split into K/C groups of C; each group's texts get a
    per-group suffix appended to EVERY token ("hello world" ->
    "hello§3§ world§3§" in group 3).  Token hashes
    are per-token (functions/hashing.py sql_tokens: space-split), so
    the transform is a deterministic vocabulary rewrite: within a
    group, texts stay verbatim-identical across its C replicas and the
    base corpus's near-dup geometry is preserved under the rehashed
    vocabulary; across groups, token sets are disjoint, so no SimHash/
    MinHash/shingle affinity survives.  Result: cluster multiplicity
    is base_size x C regardless of K — bounded, like real corpora.
    Group 0 keeps the original text, embedding the base corpus
    verbatim.  n_chars is recomputed for salted rows.

    The marker is U+00A7 (a non-space char, so it survives space-split
    tokenization) rather than an alphanumeric suffix: a base token
    that happened to end in a plausible suffix (e.g. "x1g" under the
    earlier "x{g}g" scheme) would collide with a salted group's
    vocabulary and silently reintroduce cross-group shingle affinity.
    generate() now also ASSERTS base/salted disjointness by counting
    base tokens containing the marker — nonzero fails the run loudly
    instead of producing a subtly-unbounded corpus.  (The r9 sf1b/
    sf10b corpora predate the marker change; they were audited clean —
    zero base tokens matched the old suffix pattern — so their
    evidence stands.)

    ``only_tables`` restricts output (e.g. ["documents"] for a dedup
    CC stress — no need to write a 600M-row lineitem to disk to grow
    the documents table)."""
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
        if only_tables is not None and tname not in only_tables \
                and tname not in DIM_TABLES:
            continue
        df = tables[tname]
        dest = os.path.join(out, f"{tname}.parquet")
        if tname in DIM_TABLES:
            df.write.mode("overwrite").parquet(dest)
            continue
        # replicate: broadcast cross join with the replica ids (K rows),
        # then shift every key column into its replica's key space.
        # Repartition the BASE before the cross join: sf0.1 fact tables
        # are single parquet files, so without it the K-fold explode
        # runs as ONE task (observed: lineitem x100 = 60M rows through
        # a single core, ~40 min; parallelized it's minutes) — the
        # generator has to scale like the engine it feeds
        reps = spark.range(replicas).select(F.col("id").alias("_rep"))
        wide = df.repartition(parts).crossJoin(F.broadcast(reps))
        for col, dom in KEY_DOMAINS.get(tname, {}).items():
            wide = wide.withColumn(
                col, (F.col(col) + rep * F.lit(strides[dom])).cast("long"))
        if tname == "documents" and dup_cap and dup_cap < replicas:
            # base/salted vocabulary disjointness: the salt marker must
            # not occur anywhere in the base corpus, or a base token
            # could alias a salted group's vocabulary (see docstring)
            n_marker = df.filter(
                F.col("text").contains(_SALT_MARKER)).count()
            if n_marker:
                raise AssertionError(
                    f"{n_marker} base documents contain the salt marker "
                    f"{_SALT_MARKER!r}; cross-group disjointness would "
                    "be broken — pick a different marker")
            grp = F.expr(f"CAST(_rep DIV {dup_cap} AS INT)")
            salted = F.regexp_replace(
                F.col("text"), F.lit(r"(\S+)"),
                F.concat(F.lit("$1" + _SALT_MARKER),
                         grp.cast("string"), F.lit(_SALT_MARKER)))
            wide = (wide.withColumn(
                        "text", F.when(grp == 0, F.col("text"))
                        .otherwise(salted))
                    .withColumn("n_chars", F.length("text").cast("long")))
        n_parts = parts if tname in ("lineitem", "orders", "events") else max(2, parts // 4)
        (wide.drop("_rep").repartition(n_parts)
         .write.mode("overwrite").parquet(dest))
        print(f"wrote {tname} x{replicas} -> {dest}")


def run(dirs: list[str], names: list[str], repeat: int,
        detail_out: str | None = None) -> None:
    import __spark_entry__ as entry
    from kmr_spark.session import parquet_num_rows

    import bench  # repo root is on sys.path — ambient-load recording

    spark = _spark()
    queries = entry.queries()
    names = [n for n in names if n in queries]
    rows = {d: {t: parquet_num_rows(d, t) or 0
                for t in ("lineitem", "events", "documents", "embeddings")}
            for d in dirs}
    print(json.dumps({"rows": rows}))
    path = detail_out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_detail.json")
    load_start = bench._load_sample()
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
            # incremental write per (dir, query): a crash mid-directory
            # loses at most the in-flight measurement, and a watcher can
            # follow progress from the file
            with open(path, "w") as f:
                json.dump({"partial_through": [d, name], "rows": rows,
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
    out = {"summary": summary, "rows": rows, "report": report,
           # same ambient-load evidence bench.py records (loadavg,
           # machine-busy fraction, self-vs-other CPU): at-scale alpha
           # claims are timing claims too
           "machine": bench.machine_load_report(load_start,
                                                bench._load_sample())}
    if errors:
        out["errors"] = errors
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))


def verify(sf_dir: str, n_sample: int, detail_out: str | None,
           families: list[str] | None = None) -> None:
    """Engine-invariant at-scale verification for the 4 dedup-family
    queries whose DuckDB oracle hits its single-node scale wall past
    sf0.1 (dedup_editdistance / dedup_clusters / dedup_summary /
    train_split_leakage_safe — the round-7 ORACLE_TIMEOUT set).

    No oracle involved: each check either re-derives a property from
    the query's own definition with independent code (pure-Python
    Levenshtein on a seeded sample of emitted pairs; BFS connectivity
    on sampled clusters) or asserts an internal invariant that any
    wrong answer would break (edge consistency of the component
    labeling, canonical min-id labels, histogram arithmetic, the
    one-cluster-one-split contract). Everything collected to the
    driver is bounded by ``--sample``, never by corpus size.

    ``families`` restricts which query families run (default all 4) —
    e.g. ["dedup_clusters", "dedup_summary"] for a CC-focused stress
    where the banded-Levenshtein pipeline would dominate wall clock
    without adding evidence (its sampled re-verify already passed at
    the same scale in an earlier round).
    """
    from pyspark.sql import functions as F

    from kmr_spark.llm_ops import dedup as dd
    from kmr_spark.operators.sample import _A, _P_MOD, _P_PRE

    want = (lambda q: True) if not families else (lambda q: q in families)
    spark = _spark()
    report: dict[str, dict] = {}
    failures: list[str] = []

    def check(query: str, name: str, ok: bool, note) -> None:
        report.setdefault(query, {})[name] = {"ok": bool(ok), "note": note}
        print(f"{query}.{name}: {'OK' if ok else 'FAIL'} ({note})")
        if not ok:
            failures.append(f"{query}.{name}")

    def py_lev(a: str, b: str) -> int:
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")

    # --- dedup_editdistance: seeded-sample pair re-verification -----
    # cache the emitted pairs: the pipeline behind them (length-band
    # candidate join + thresholded Levenshtein) dominates this whole
    # verify at 10x+ scales, and three checks read it
    if want("dedup_editdistance"):
        # materialize to parquet, not .cache(): at 500k docs the pair
        # set plus the band-join execution memory OOMed a 48g JVM when
        # cached; a disk materialization costs one write and bounds
        # memory by the executor working set only.  A per-run tempdir
        # (not a fixed path) so concurrent verifies on different
        # corpora can't clobber each other mid-read; removed after the
        # checks (ADVICE r10).
        import shutil
        import tempfile
        pairs_dir = tempfile.mkdtemp(prefix="kmr_verify_edit_pairs_")
        try:
            pairs_path = os.path.join(pairs_dir, "pairs.parquet")
            (dd.editdistance_pairs(spark, sf_dir)
             .write.mode("overwrite").parquet(pairs_path))
            pairs = spark.read.parquet(pairs_path)
            # one fused aggregation over the (doc_a, doc_b) groups: total pair
            # rows, distinctness (max multiplicity), and ordering violations
            inv = (pairs.groupBy("doc_a", "doc_b")
                   .agg(F.count("*").alias("mult"))
                   .agg(F.sum("mult").alias("n_pairs"),
                        F.max("mult").alias("max_mult"),
                        F.count(F.when(F.col("doc_a") >= F.col("doc_b"), 1))
                        .alias("n_misordered"))
                   .first())
            sample = (
                pairs.withColumn(
                    "_h", (F.pmod(F.col("doc_a") * 1_000_003 + F.col("doc_b"),
                                  F.lit(_P_PRE))) * _A % _P_MOD)
                .orderBy("_h", "doc_a", "doc_b").limit(n_sample))
            ta = docs.select(F.col("doc_id").alias("doc_a"),
                             F.col("text").alias("text_a"))
            tb = docs.select(F.col("doc_id").alias("doc_b"),
                             F.col("text").alias("text_b"))
            rows = sample.join(ta, "doc_a").join(tb, "doc_b").collect()
            bad = [r for r in rows
                   if py_lev(r.text_a, r.text_b) != r.edit_distance
                   or not 0 <= r.edit_distance <= dd.MAX_EDITS]
            check("dedup_editdistance", "sampled_pair_reverify",
                  len(rows) and not bad,
                  f"{len(rows)} sampled of {inv.n_pairs} pairs, {len(bad)} bad")
            check("dedup_editdistance", "pairs_distinct_ordered",
                  inv.max_mult == 1 and inv.n_misordered == 0,
                  f"max multiplicity {inv.max_mult}, "
                  f"misordered {inv.n_misordered}")
        finally:
            shutil.rmtree(pairs_dir, ignore_errors=True)

    # shared intermediates for the three cluster-derived families
    if any(want(q) for q in ("dedup_clusters", "dedup_summary",
                             "train_split_leakage_safe")):
        clusters = dd.duplicate_clusters(spark, sf_dir).cache()
        edges = dd.simhash_pairs(spark, sf_dir, sort=False) \
            .select("doc_a", "doc_b").cache()
        lbl = clusters.select(F.col("doc_id").alias("n"),
                              F.col("cluster_id").alias("l"))
        canon = (clusters.groupBy("cluster_id")
                 .agg(F.min("doc_id").alias("mn"),
                      F.count("*").alias("sz"),
                      F.count(F.when(F.col("is_keeper"), 1)).alias("nk"))
                 .cache())

    # --- dedup_clusters: labeling invariants + sampled connectivity -
    if want("dedup_clusters"):
        split_edges = (
            edges.join(lbl.withColumnRenamed("n", "doc_a")
                       .withColumnRenamed("l", "l_a"), "doc_a")
            .join(lbl.withColumnRenamed("n", "doc_b")
                  .withColumnRenamed("l", "l_b"), "doc_b")
            .filter("l_a <> l_b").count())
        check("dedup_clusters", "edge_consistency", split_edges == 0,
              f"{split_edges} edges straddle two clusters")
        n_noncanon = canon.filter("mn <> cluster_id").count()
        n_badkeeper = canon.filter("nk <> 1").count()
        size_bad = (clusters.groupBy("cluster_id", "cluster_size")
                    .agg(F.count("*").alias("actual"))
                    .filter("actual <> cluster_size").count())
        check("dedup_clusters", "canonical_min_label_one_keeper",
              n_noncanon == 0 and n_badkeeper == 0 and size_bad == 0,
              f"noncanon {n_noncanon}, badkeeper {n_badkeeper}, "
              f"size-mismatch {size_bad}")
        # sampled connectivity: a merged-but-disconnected label would
        # pass edge consistency; BFS each sampled cluster's edge set to
        # prove its members really are one component
        n_cl_sample = max(20, n_sample // 20)
        # cap member count per sampled cluster so the driver-side edge
        # collect stays bounded on replicated corpora (replica-dup
        # components grow with the replica count; their within-cluster
        # edge sets grow quadratically)
        size_cap = max(1000, n_sample)
        sampled_ids = [r.cluster_id for r in
                       canon.filter(f"sz >= 2 AND sz <= {size_cap}")
                       .withColumn("_h", F.pmod(F.col("cluster_id"),
                                                F.lit(_P_PRE)) * _A % _P_MOD)
                       .orderBy("_h", "cluster_id")
                       .limit(n_cl_sample).collect()]
        mem_rows = (clusters.filter(F.col("cluster_id").isin(sampled_ids))
                    .select("cluster_id", "doc_id").collect())
        members: dict = {}
        for r in mem_rows:
            members.setdefault(r.cluster_id, set()).add(r.doc_id)
        e_rows = (edges.join(lbl.withColumnRenamed("n", "doc_a")
                             .withColumnRenamed("l", "l_a"), "doc_a")
                  .filter(F.col("l_a").isin(sampled_ids))
                  .select("l_a", "doc_a", "doc_b").collect())
        adj: dict = {}
        for r in e_rows:
            adj.setdefault(r.doc_a, set()).add(r.doc_b)
            adj.setdefault(r.doc_b, set()).add(r.doc_a)
        n_disconnected = 0
        for cid, mem in members.items():
            seen, todo = {cid}, [cid]
            while todo:
                u = todo.pop()
                for v in adj.get(u, ()):
                    if v in mem and v not in seen:
                        seen.add(v)
                        todo.append(v)
            if seen != mem:
                n_disconnected += 1
        check("dedup_clusters", "sampled_connectivity",
              members and n_disconnected == 0,
              f"{len(members)} clusters BFS-checked "
              f"({sum(len(m) for m in members.values())} docs, "
              f"{len(e_rows)} edges), {n_disconnected} disconnected")

    # --- dedup_summary: histogram arithmetic vs the cluster labels --
    if want("dedup_summary"):
        summary = dd.dedup_summary(spark, sf_dir).collect()
        recount = {r.cluster_size: r.n
                   for r in canon.groupBy(F.col("sz").alias("cluster_size"))
                   .agg(F.count("*").alias("n")).collect()}
        hist_bad = [r.cluster_size for r in summary
                    if recount.get(r.cluster_size) != r.n_clusters
                    or r.n_docs != r.cluster_size * r.n_clusters
                    or r.n_dropped_keeper_only
                    != (r.cluster_size - 1) * r.n_clusters]
        n_clustered = clusters.count()
        docs_sum = sum(r.n_docs for r in summary)
        check("dedup_summary", "histogram_consistent",
              not hist_bad and docs_sum == n_clustered
              and set(recount) == {r.cluster_size for r in summary},
              f"bad sizes {hist_bad}, docs {docs_sum} vs {n_clustered}")

    # --- train_split_leakage_safe: grouping + hash arithmetic -------
    if want("train_split_leakage_safe"):
        split = dd.train_split_leakage_safe(spark, sf_dir).cache()
        n_docs_tbl = docs.count()
        n_split = split.count()
        n_dist = split.select("doc_id").distinct().count()
        key_bad = (split.join(lbl.withColumnRenamed("n", "doc_id"),
                              "doc_id", "left")
                   .filter(F.col("group_key")
                           != F.coalesce("l", "doc_id")).count())
        straddle = (split.groupBy("group_key")
                    .agg(F.countDistinct("split").alias("ns"))
                    .filter("ns > 1").count())
        srows = (split.withColumn("_h", F.pmod(F.col("doc_id"),
                                               F.lit(_P_PRE)) * _A % _P_MOD)
                 .orderBy("_h", "doc_id").limit(n_sample).collect())
        thresh = int(dd.TRAIN_RATE * _P_MOD)
        hash_bad = sum(
            1 for r in srows
            if (("train" if ((r.group_key % _P_PRE + _P_PRE) % _P_PRE
                             + dd.SPLIT_SALT) * _A % _P_MOD < thresh
                 else "val") != r.split))
        check("train_split_leakage_safe", "split_invariants",
              n_split == n_docs_tbl == n_dist and key_bad == 0
              and straddle == 0 and hash_bad == 0,
              f"rows {n_split}/{n_docs_tbl}, key_bad {key_bad}, "
              f"straddling groups {straddle}, "
              f"hash re-derive bad {hash_bad}/{len(srows)}")

    summary_line = {
        "metric": "kmr_spark dedup-family at-scale engine verify",
        "sf_dir": sf_dir,
        "n_checks": sum(len(v) for v in report.values()),
        "failures": failures,
    }
    path = detail_out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_verify.json")
    with open(path, "w") as f:
        json.dump({"summary": summary_line, "checks": report}, f, indent=1)
    print(json.dumps(summary_line))
    if failures:
        sys.exit(1)


#: (KMR_RMAT_EDGES, KMR_RMAT_LEVELS) weak-scaling points for the graph
#: family: the R-MAT plans generate their own input (fixed 20k edges /
#: 2^10 nodes under the driver contract), so growing a parquet corpus
#: cannot scale them — the generator size knob can.  Node count grows
#: with edge count (Graph500-style weak scaling, edgefactor ~20-30):
#: scaling edges alone against fixed 2^10 nodes just saturates the
#: 1024^2 distinct-edge space and densifies hubs, which measures
#: multigraph collapse, not the algorithms.
GRAPH_POINTS = [(20_000, 10), (200_000, 13), (2_000_000, 16)]

#: default graph-family queries for the weak-scaling sweep — the three
#: VERDICT-r9-named plans plus BFS and triangles (the two classic
#: graph kernels with the sharpest frontier/wedge scaling behavior)
GRAPH_QUERIES = ["graph_components", "graph_random_walks",
                 "graph_clustering_coefficient", "graph_bfs",
                 "graph_triangles"]


def graph_scale(points: list[tuple[int, int]], names: list[str],
                repeat: int, detail_out: str | None) -> None:
    """Weak-scaling sweep for the generated-graph family + an
    engine-invariant CC verify at the largest point.

    Timing: min-of-``repeat`` noop-sink wall clock per (edges, levels)
    point, exponents fitted against EDGE count (the volume axis at a
    fixed edgefactor).  Verify (largest point only, no oracle — DuckDB
    recursive-CTE CC at 2M edges is an oracle-scale wall, the same
    adjudication as the dedup families): (a) no distinct edge straddles
    two component labels, (b) every label is the component's min node
    id and exactly one root, (c) component sizes match the label
    multiplicity, (d) sampled BFS connectivity over the label-induced
    subgraphs — a merged-but-disconnected labeling passes (a)-(c) but
    not (d)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    import bench

    spark = _spark()
    queries = entry.queries()
    names = [n for n in names if n in queries]
    path = detail_out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scale_detail_graph.json")
    from kmr_spark.plans.generate import rmat_raw_edges

    load_start = bench._load_sample()
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    errors: dict[str, dict[str, str]] = {}
    graph_shape: dict[str, dict[str, int]] = {}
    # the sweep needs REAL graph growth: the default DuckDB-replayable
    # quadrant hash collapses at scale (2M ids -> ~9.8k distinct
    # edges), so the harness switches to the xxhash64 mixer and
    # records each point's distinct-edge/node counts as evidence that
    # the graph actually grew
    # the sweep is the one sanctioned setter of the KMR_RMAT_* size
    # knobs; it declares itself via KMR_RMAT_SWEEP (the __spark_entry__
    # leak guard rejects the size vars without it) and restores the
    # environment in a finally so an exception mid-sweep cannot leak
    # the override into later plans in the same process (ADVICE r10)
    os.environ["KMR_RMAT_SWEEP"] = "1"
    os.environ["KMR_RMAT_MIX"] = "xxhash"
    try:
        for n_edges, levels in points:
            os.environ["KMR_RMAT_EDGES"] = str(n_edges)
            os.environ["KMR_RMAT_LEVELS"] = str(levels)
            key = f"E{n_edges}_L{levels}"
            from pyspark.sql import functions as _F
            ed = rmat_raw_edges(spark).select("src", "dst").distinct()
            n_distinct = ed.count()
            n_nodes = (ed.select(_F.col("src").alias("n"))
                       .unionAll(ed.select(_F.col("dst").alias("n")))
                       .distinct().count())
            graph_shape[key] = {"distinct_edges": n_distinct, "nodes": n_nodes}
            print(f"{key}: {n_distinct} distinct edges, {n_nodes} nodes")
            for name in names:
                try:
                    fn = queries[name]
                    fn(spark, "/root/testdata/sf0.1").write.format(
                        "noop").mode("overwrite").save()  # warmup
                    best = math.inf
                    for _ in range(repeat):
                        spark.catalog.clearCache()
                        spark.sparkContext._jvm.System.gc()
                        time.sleep(0.2)
                        t0 = time.perf_counter()
                        fn(spark, "/root/testdata/sf0.1").write.format(
                            "noop").mode("overwrite").save()
                        best = min(best, time.perf_counter() - t0)
                    times[name][key] = round(best, 3)
                    print(f"{name} @ {key}: {times[name][key]} s")
                except Exception as exc:
                    errors.setdefault(name, {})[key] = \
                        f"{type(exc).__name__}: {exc}"
                    print(f"{name} @ {key}: ERROR {type(exc).__name__}: {exc}")
                with open(path, "w") as f:
                    json.dump({"partial_through": [key, name],
                               "times": times, "errors": errors}, f, indent=1)

        report: dict[str, dict] = {}
        for name in names:
            pts = [(e, times[name][f"E{e}_L{l}"]) for e, l in points
                   if times[name].get(f"E{e}_L{l}", 0) > 0]
            ent: dict = {"times": times[name]}
            if name in errors:
                ent["errors"] = errors[name]
            if len(pts) >= 2:
                (x0, t0), (x1, t1) = pts[-2], pts[-1]
                ent["alpha_last"] = round(
                    math.log(t1 / t0) / math.log(x1 / x0), 3)
                (xa, ta), (xb, tb) = pts[0], pts[-1]
                ent["alpha_span"] = round(
                    math.log(tb / ta) / math.log(xb / xa), 3)
            report[name] = ent
            print(name, json.dumps(ent))

        # engine-invariant CC verify at the largest point (env still set)
        n_edges, levels = points[-1]
        checks: dict[str, dict] = {}
        failures: list[str] = []

        def check(name: str, ok: bool, note: str) -> None:
            checks[name] = {"ok": bool(ok), "note": note}
            print(f"graph_components.{name}: {'OK' if ok else 'FAIL'} ({note})")
            if not ok:
                failures.append(name)

        from kmr_spark.operators.graph import connected_components
        from kmr_spark.operators.sample import _A, _P_MOD, _P_PRE
        from kmr_spark.plans.generate import rmat_raw_edges

        edges = (rmat_raw_edges(spark).select("src", "dst")
                 .distinct().cache())
        labels = connected_components(edges, "src", "dst").cache()
        lbl_a = labels.select(F.col("node").alias("src"),
                              F.col("label").alias("l_a"))
        lbl_b = labels.select(F.col("node").alias("dst"),
                              F.col("label").alias("l_b"))
        straddle = (edges.join(lbl_a, "src").join(lbl_b, "dst")
                    .filter("l_a <> l_b").count())
        check("edge_consistency", straddle == 0,
              f"{straddle} of {edges.count()} distinct edges straddle labels")
        comp = (labels.groupBy("label")
                .agg(F.min("node").alias("mn"), F.count("*").alias("sz"))
                .cache())
        n_noncanon = comp.filter("mn <> label").count()
        check("canonical_min_label", n_noncanon == 0,
              f"{n_noncanon} non-canonical labels of {comp.count()} components")
        # sampled BFS connectivity (bounded driver collect, like verify())
        size_cap = 5000
        sampled = [r.label for r in
                   comp.filter(f"sz >= 2 AND sz <= {size_cap}")
                   .withColumn("_h", F.pmod(F.col("label"), F.lit(_P_PRE))
                               * _A % _P_MOD)
                   .orderBy("_h", "label").limit(50).collect()]
        mem_rows = (labels.filter(F.col("label").isin(sampled))
                    .select("label", "node").collect())
        members: dict = {}
        for r in mem_rows:
            members.setdefault(r.label, set()).add(r.node)
        e_rows = (edges.join(lbl_a, "src")
                  .filter(F.col("l_a").isin(sampled))
                  .select("src", "dst").collect())
        adj: dict = {}
        for r in e_rows:
            adj.setdefault(r.src, set()).add(r.dst)
            adj.setdefault(r.dst, set()).add(r.src)
        n_disconnected = 0
        for lab, mem in members.items():
            seen, todo = {lab}, [lab]
            while todo:
                u = todo.pop()
                for v in adj.get(u, ()):
                    if v in mem and v not in seen:
                        seen.add(v)
                        todo.append(v)
            if seen != mem:
                n_disconnected += 1
        check("sampled_connectivity", bool(members) and n_disconnected == 0,
              f"{len(members)} components BFS-checked "
              f"({sum(len(m) for m in members.values())} nodes, "
              f"{len(e_rows)} edges), {n_disconnected} disconnected")
    finally:
        for var in ("KMR_RMAT_EDGES", "KMR_RMAT_LEVELS", "KMR_RMAT_MIX",
                    "KMR_RMAT_SWEEP"):
            os.environ.pop(var, None)

    summary = {
        "metric": "kmr_spark graph-family weak-scaling sweep "
                  "(min-of-%d noop-sink, R-MAT size knob, xxhash mix)"
                  % repeat,
        "points": [{"edges": e, "levels": l} for e, l in points],
        "graph_shape": graph_shape,
        "n_queries": len(names),
        "alpha_last_max": max((e.get("alpha_last", 0.0)
                               for e in report.values()), default=None),
        "verify_at": {"edges": n_edges, "levels": levels},
        "verify_failures": failures,
    }
    out = {"summary": summary, "report": report,
           "verify_checks": checks,
           "machine": bench.machine_load_report(load_start,
                                                bench._load_sample())}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    if failures:
        sys.exit(1)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--out", default="/tmp/kmr_scale/sf1")
    g.add_argument("--base", default="/root/testdata/sf0.1")
    g.add_argument("--replicas", type=int, default=10)
    g.add_argument("--parts", type=int, default=32)
    g.add_argument("--dup-cap", type=int, default=None,
                   help="bound documents duplicate multiplicity: split "
                        "replicas into groups of this size with "
                        "disjoint token vocabularies (see generate())")
    g.add_argument("--tables", default=None,
                   help="comma list restricting which tables to write "
                        "(dims always written)")
    r = sub.add_parser("run")
    r.add_argument("--dirs", default=",".join(
        ["/root/testdata/sf0.01", "/root/testdata/sf0.1",
         "/tmp/kmr_scale/sf1"]))
    r.add_argument("--queries", default=",".join(SCALE_QUERIES))
    r.add_argument("--repeat", type=int, default=2)
    r.add_argument("--detail-out", default=None,
                   help="where to write the JSON report "
                        "(default: repo-root scale_detail.json)")
    v = sub.add_parser("verify")
    v.add_argument("--sf", default="/tmp/kmr_scale/sf1")
    v.add_argument("--sample", type=int, default=1000)
    v.add_argument("--detail-out", default=None)
    v.add_argument("--families", default=None,
                   help="comma list of query families to verify "
                        "(default: all 4)")
    gr = sub.add_parser("graph")
    gr.add_argument("--points", default=",".join(
        f"{e}:{l}" for e, l in GRAPH_POINTS),
        help="comma list of EDGES:LEVELS weak-scaling points")
    gr.add_argument("--queries", default=",".join(GRAPH_QUERIES))
    gr.add_argument("--repeat", type=int, default=2)
    gr.add_argument("--detail-out", default=None)
    args = ap.parse_args()
    if args.cmd == "generate":
        generate(args.out, args.base, args.replicas, args.parts,
                 args.dup_cap, args.tables.split(",") if args.tables else None)
    elif args.cmd == "verify":
        verify(args.sf, args.sample, args.detail_out,
               args.families.split(",") if args.families else None)
    elif args.cmd == "graph":
        pts = [tuple(int(x) for x in p.split(":"))
               for p in args.points.split(",")]
        graph_scale(pts, args.queries.split(","), args.repeat,
                    args.detail_out)
    else:
        run(args.dirs.split(","), args.queries.split(","), args.repeat,
            args.detail_out)


if __name__ == "__main__":
    main()
