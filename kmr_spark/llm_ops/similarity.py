"""Similarity search over the embeddings table (array<float> 64-dim).

- knn_bruteforce: exact cosine top-k for a query set — the correctness
  baseline. Plan: broadcast the (small) query side against the full
  vector table, per-pair codegen cosine, grouped top-k via row_number
  (TakeOrdered-style, no global sort).
- ann_ivf: the scale path — vectors are assigned to their nearest
  centroid (IVF coarse quantizer); a query probes only its own cell.
  At 100 TB the cell assignment is the partition key, so a probe touches
  1/n_cells of the data. Centroids here are a deterministic sample of
  the data itself (first N_CENTROIDS vec_ids) so the DuckDB oracle can
  reproduce the exact assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.functions import vectors as V
from kmr_spark.session import load_tables, materialize_release

N_QUERIES = 10  # vec_id < 10 are the query set
TOP_K = 5
N_CENTROIDS = 8
IVF_TOP_K = 3


def _emb(spark, sf_dir):
    # the testdata table is one small parquet file -> one input split;
    # every downstream broadcast join would inherit single-task map-side
    # parallelism (measured 8s+ single-core at sf0.1). Spread the vector
    # table across the cluster first: the shuffle moves ~|corpus| rows
    # once, and all per-vector work (assignment folds, pair products)
    # then runs wide. At real scale the source has many splits and this
    # repartition collapses into the scan's own partitioning choice.
    e = load_tables(spark, sf_dir)["embeddings"]
    n = spark.sparkContext.defaultParallelism
    return e.repartition(n, "vec_id").select(
        "vec_id", V.to_double_array("embedding").alias("vd"))


def _collect_centroids(emb: DataFrame) -> list[tuple[int, list[float]]]:
    """Collect the coarse-quantizer centroids to the driver — k x dim
    doubles, the same tiny replicated-state assumption kmeans makes
    (plans/iterative.py). At 100 TB the centroids come from a sampled
    k-means and are still driver-sized; the corpus itself never moves.
    """
    rows = emb.filter(F.col("vec_id") < N_CENTROIDS).collect()
    byid = {r["vec_id"]: list(r["vd"]) for r in rows}
    return [(i, byid[i]) for i in sorted(byid)]


def assign_cells(df: DataFrame, cents: list[tuple[int, list[float]]],
                 n_cells: int = 1) -> DataFrame:
    """Append `cells`: the n_cells nearest centroid ids for column `vd`,
    ordered by (csim DESC, cent_id ASC).

    This is a NARROW column expression over literal centroids (argmax via
    array_sort of (csim, cent_id) structs) — no crossJoin explode, no
    window, no Exchange. The round-1 form hash-partitioned an 8x-exploded
    copy of the whole corpus on vec_id just to take an argmax over 8
    values; at scale that exchange dominates the query. Same pattern as
    the k-means assignment expression (plans/iterative.py _assign_expr).
    Exactness: literal centroid doubles are bit-identical to the stored
    vectors, and cosine uses the same left-fold order as the oracle's
    sql_cosine, so the assignment matches DuckDB's crossJoin+row_number
    form exactly, tie-break included.
    """
    structs = []
    for cid, vec in cents:
        lit = F.array(*[F.lit(float(v)) for v in vec])
        structs.append(F.struct(
            V.cosine(F.col("vd"), lit).alias("csim"),
            F.lit(int(cid)).alias("cent_id")))
    ordered = F.array_sort(
        F.array(*structs),
        lambda a, b: F.when(a["csim"] > b["csim"], F.lit(-1))
                      .when(a["csim"] < b["csim"], F.lit(1))
                      .otherwise(a["cent_id"] - b["cent_id"]))
    return df.withColumn(
        "cells", F.slice(F.transform(ordered, lambda s: s["cent_id"]), 1, n_cells))


def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vector norms are precomputed ONCE per vector (persist is the
    # CollapseProject barrier) so the O(queries x corpus) scoring pays
    # one dot product per pair, not dot + two norm folds — bit-identical
    # to the oracle's per-pair form: same doubles, same multiply/divide
    # order, only the reuse differs
    emb = _emb(spark, sf_dir).withColumn("nv", V.norm(F.col("vd"))).persist()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vd").alias("qv"),
        F.col("nv").alias("nq"))
    pairs = F.broadcast(queries).crossJoin(emb).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (V.dot(F.col("qv"), F.col("vd")) / (F.col("nq") * F.col("nv"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "rn", "neighbor_id", "cosine")
        .orderBy("query_id", "rn")
    )
    return materialize_release(out, emb)


KNN_SQL = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {V.sql_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn
  FROM pairs)
SELECT query_id, rn, neighbor_id, cosine FROM ranked
WHERE rn <= {TOP_K} ORDER BY query_id, rn
"""


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid, then answer each query inside its own cell only."""
    emb = _emb(spark, sf_dir)
    cents = _collect_centroids(emb)
    assigned = (
        assign_cells(emb, cents, 1)
        .select("vec_id", "vd", F.col("cells")[0].alias("cell"))
        .withColumn("nv", V.norm(F.col("vd")))  # one norm per vector
        .persist()
    )
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vd").alias("qv"),
        F.col("cell"), F.col("nv").alias("nq"))
    cand = F.broadcast(queries).join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id"))
    rescored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (V.dot(F.col("qv"), F.col("vd")) / (F.col("nq") * F.col("nv"))).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (
        rescored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= IVF_TOP_K)
        .select("query_id", "rn", "neighbor_id", "cosine")
        .orderBy("query_id", "rn")
    )
    return materialize_release(out, assigned)


ANN_IVF_SQL = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
          WHERE vec_id < {N_CENTROIDS}),
assign0 AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         {V.sql_cosine('e.embedding', 'c.cv')} AS csim
  FROM emb e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY csim DESC, cent_id ASC) AS rn
    FROM assign0) WHERE rn = 1),
queries AS (
  SELECT vec_id AS query_id, embedding AS qv, cell FROM assigned
  WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {V.sql_cosine('q.qv', 'a.embedding')} AS cosine
  FROM queries q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.query_id)
SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn,
       neighbor_id, cosine
FROM cand QUALIFY rn <= {IVF_TOP_K} ORDER BY query_id, rn
"""


N_PROBES = 3


def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF: each query probes its N_PROBES nearest cells
    instead of one. Vectors still live in exactly one cell (the probe
    side fans out, the data side doesn't), so cost is N_PROBES ×
    cell-size per query — still bounded, recall close to brute force
    (see test_llm_ops recall assertions). This is the knob SCALE.md
    names for raising single-probe recall without changing plan shape.
    """
    emb = _emb(spark, sf_dir)
    cents = _collect_centroids(emb)
    assigned = (
        assign_cells(emb, cents, 1)
        .select("vec_id", "vd", F.col("cells")[0].alias("cell"))
        .withColumn("nv", V.norm(F.col("vd")))  # one norm per vector
        .persist()
    )
    probes = (
        assign_cells(emb.filter(F.col("vec_id") < N_QUERIES), cents, N_PROBES)
        .select(F.col("vec_id").alias("query_id"), F.col("vd").alias("qv"),
                V.norm(F.col("vd")).alias("nq"), F.explode("cells").alias("cell"))
    )
    cand = F.broadcast(probes).join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id"))
    rescored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (V.dot(F.col("qv"), F.col("vd")) / (F.col("nq") * F.col("nv"))).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (
        rescored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= IVF_TOP_K)
        .select("query_id", "rn", "neighbor_id", "cosine")
        .orderBy("query_id", "rn")
    )
    return materialize_release(out, assigned)


ANN_MULTIPROBE_SQL = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
          WHERE vec_id < {N_CENTROIDS}),
assign0 AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         {V.sql_cosine('e.embedding', 'c.cv')} AS csim
  FROM emb e CROSS JOIN cents c),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY csim DESC, cent_id ASC) AS rn
  FROM assign0),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, embedding AS qv, cent_id AS cell
  FROM ranked WHERE rn <= {N_PROBES} AND vec_id < {N_QUERIES}),
cand AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         {V.sql_cosine('q.qv', 'a.embedding')} AS cosine
  FROM probes q JOIN assigned a ON q.cell = a.cell AND a.vec_id <> q.query_id)
SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn,
       neighbor_id, cosine
FROM cand QUALIFY rn <= {IVF_TOP_K} ORDER BY query_id, rn
"""


def knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine against an int8 scalar-quantized corpus.

    The memory-bound form of brute-force search: each corpus vector is
    symmetric-quantized per-vector (scale = max|v| / 127, code =
    floor(v/scale + 0.5)), which is a 4x footprint cut at 100 TB — the
    whole corpus of codes fits where a quarter of the floats would.
    Scoring is ASYMMETRIC (full-precision query against dequantized
    codes), the standard SQ8 recipe: query precision is free because
    there are few queries. Everything is a narrow codegen expression —
    quantize, dequantize, and dot all stay in whole-stage codegen.

    floor(x + 0.5) rather than round() because Spark's HALF_UP
    BigDecimal rounding and DuckDB's round() disagree on ties; the
    floor form is pure IEEE arithmetic and bit-identical in both
    engines, so the oracle reproduces the exact codes.
    """
    emb = _emb(spark, sf_dir)
    maxabs = F.aggregate(F.transform(F.col("vd"), F.abs), F.lit(0.0),
                         lambda acc, x: F.greatest(acc, x))
    s0 = maxabs / F.lit(127.0)
    corpus = (
        emb.withColumn("qs", F.when(s0 == F.lit(0.0), F.lit(1.0)).otherwise(s0))
        .withColumn("dv", F.transform(
            F.col("vd"),
            lambda x: F.floor(x / F.col("qs") + F.lit(0.5)).cast("double") * F.col("qs")))
        .select("vec_id", "vd", "dv")
        .withColumn("ndv", V.norm(F.col("dv")))
        .persist()
    )
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vd").alias("qv"),
        V.norm(F.col("vd")).alias("nq"))
    pairs = F.broadcast(queries).crossJoin(corpus.drop("vd")).filter(
        F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        (V.dot(F.col("qv"), F.col("dv")) / (F.col("nq") * F.col("ndv"))).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    out = (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "rn", "neighbor_id", "cosine")
        .orderBy("query_id", "rn")
    )
    return materialize_release(out, corpus)


def _sql_maxabs(vd: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({vd}, x -> abs(x))), (x, y) -> greatest(x, y))"
    )


KNN_QUANTIZED_SQL = f"""
WITH vd0 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings),
sc AS (
  SELECT vec_id, vd, CASE WHEN m = 0 THEN 1.0 ELSE m END AS qs FROM (
    SELECT vec_id, vd, {_sql_maxabs('vd')} / 127.0 AS m FROM vd0) t),
corpus AS (
  SELECT vec_id, vd,
         list_transform(vd, x -> floor(x / qs + 0.5) * qs) AS dv
  FROM sc),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {V.sql_dot('q.vd', 'e.dv')} / ({V.sql_norm('q.vd')} * {V.sql_norm('e.dv')})
           AS cosine
  FROM corpus q JOIN corpus e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES})
SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rn,
       neighbor_id, cosine
FROM pairs QUALIFY rn <= {TOP_K} ORDER BY query_id, rn
"""


EMB_DEDUP_THRESHOLD = 0.4
EMB_DEDUP_BLOCKS = 8  # triangle sub-blocks per cell (see below)


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with IVF-cell blocking.

    Candidate pairs are generated only within a vector's IVF cell (the
    same coarse quantizer as ann_ivf), so the comparison count is
    sum-of-cell-sizes-squared, not corpus-squared — the property that
    makes embedding dedup feasible at 100 TB. Single-probe blocking
    trades recall for that bound (multi-probe raises it); the oracle
    implements the identical blocking so results match exactly.

    Parallelism: a plain self-join on ``cell`` has only N_CENTROIDS
    distinct keys, so a shuffle join caps at 8 tasks no matter how many
    executors exist. The self-join is therefore TRIANGLE-BLOCKED: each
    vector gets a content-hash sub-block blk in [0, B); the left side
    fans out to block pairs (blk, j>=blk), the right side to (i<=blk,
    blk), and the join keys on (cell, i, j) — 8*B*(B+1)/2 keys. Every
    unordered in-cell pair meets in EXACTLY one key (i<j once by
    construction; i==j deduped by vec_a < vec_b), so the output is
    bit-identical to the naive join while the key space scales with
    B^2. Fanout costs (B+1)/2 extra copies of each row — the standard
    trade of the triangle/block nested-loop family.
    """
    B = EMB_DEDUP_BLOCKS
    emb = _emb(spark, sf_dir)
    cents = _collect_centroids(emb)
    assigned = (
        assign_cells(emb, cents, 1)
        .select("vec_id", "vd", F.col("cells")[0].alias("cell"))
        .withColumn("nv", V.norm(F.col("vd")))  # one norm per vector
        .withColumn("blk", F.pmod(F.xxhash64("vec_id"), F.lit(B)).cast("int"))
        .persist()  # both sides of the in-cell self-join
    )
    a = (
        assigned.withColumn("bj", F.explode(F.sequence(F.col("blk"), F.lit(B - 1))))
        .select(F.col("vec_id").alias("vec_a"), F.col("vd").alias("vda"),
                F.col("nv").alias("nva"), "cell",
                F.col("blk").alias("bi"), "bj")
    )
    b = (
        assigned.withColumn("bi", F.explode(F.sequence(F.lit(0), F.col("blk"))))
        .select(F.col("vec_id").alias("vec_b"), F.col("vd").alias("vdb"),
                F.col("nv").alias("nvb"), "cell",
                "bi", F.col("blk").alias("bj"))
    )
    out = (
        a.join(b, ["cell", "bi", "bj"])
        # a cross-block pair meets in exactly one key and always with
        # bi < bj (the lower-block vector lands on the a side); only
        # same-block matches appear in both orientations and need the
        # id-order dedup
        .filter((F.col("bi") < F.col("bj")) | (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cosine", V.dot(F.col("vda"), F.col("vdb"))
                    / (F.col("nva") * F.col("nvb")))
        .filter(F.col("cosine") >= EMB_DEDUP_THRESHOLD)
        # canonicalize pair order (cross-block matches arrive
        # block-ordered, not id-ordered); cosine is bitwise symmetric —
        # zip_with multiplies elementwise and the fold order is fixed —
        # so only the id columns need swapping
        .select(F.least("vec_a", "vec_b").alias("vec_a"),
                F.greatest("vec_a", "vec_b").alias("vec_b"),
                "cosine")
    )
    return materialize_release(out, assigned)


EMB_DEDUP_SQL = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
          WHERE vec_id < {N_CENTROIDS}),
assign0 AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         {V.sql_cosine('e.embedding', 'c.cv')} AS csim
  FROM emb e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY csim DESC, cent_id ASC) AS rn
    FROM assign0) WHERE rn = 1)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {V.sql_cosine('a.embedding', 'b.embedding')} AS cosine
FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE {V.sql_cosine('a.embedding', 'b.embedding')} >= {EMB_DEDUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""


CLASSIFY_K = 8          # neighbors voting per query
CLASSIFY_HOLDOUT = 5    # vec_id % 5 == 0 is the unlabeled holdout


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN CLASSIFICATION — the end-use the similarity family exists
    for: every 5th vector is treated as unlabeled and receives the
    majority label of its CLASSIFY_K nearest labeled neighbors by
    cosine (ties: higher vote count, then smaller label; neighbor
    rank ties: larger cosine, then smaller id — fully deterministic).
    Output (vec_id, predicted_label, n_votes, true_label) so accuracy
    is inspectable downstream.

    Plan shape: the holdout side broadcasts (it is 1/5 of the corpus —
    at real scale the queries batch through the IVF path instead, same
    as sim_ann_ivf); scoring pays one dot per pair against precomputed
    norms; both rankings are bounded per-query windows.
    """
    emb = _emb(spark, sf_dir).withColumn("nv", V.norm(F.col("vd")))
    labels = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("label").cast("int").alias("label"))
    emb = emb.join(labels, "vec_id").persist()
    is_holdout = F.col("vec_id") % CLASSIFY_HOLDOUT == 0
    queries = emb.filter(is_holdout).select(
        F.col("vec_id").alias("query_id"), F.col("vd").alias("qv"),
        F.col("nv").alias("nq"), F.col("label").alias("true_label"))
    corpus = emb.filter(~is_holdout)
    scored = (
        F.broadcast(queries).crossJoin(corpus)
        .select(
            "query_id", "true_label", F.col("label").alias("nb_label"),
            F.col("vec_id").alias("neighbor_id"),
            (V.dot(F.col("qv"), F.col("vd")) / (F.col("nq") * F.col("nv")))
            .alias("cosine"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    votes = (
        scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= CLASSIFY_K)
        .groupBy("query_id", "true_label", "nb_label")
        .agg(F.count("*").alias("n_votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("nb_label").asc())
    out = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(F.col("query_id").alias("vec_id"),
                F.col("nb_label").alias("predicted_label"),
                F.col("n_votes").cast("long").alias("n_votes"),
                "true_label")
        .orderBy("vec_id")
    )
    return materialize_release(out, emb)


KNN_CLASSIFY_SQL = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id,
         CAST(q.label AS INTEGER) AS true_label,
         CAST(e.label AS INTEGER) AS nb_label,
         e.vec_id AS neighbor_id,
         {V.sql_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM embeddings q JOIN embeddings e
    ON q.vec_id % {CLASSIFY_HOLDOUT} = 0
   AND e.vec_id % {CLASSIFY_HOLDOUT} <> 0),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM pairs),
votes AS (
  SELECT query_id, true_label, nb_label, COUNT(*) AS n_votes
  FROM ranked WHERE rn <= {CLASSIFY_K}
  GROUP BY query_id, true_label, nb_label),
winner AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY n_votes DESC, nb_label ASC) AS vr
  FROM votes)
SELECT query_id AS vec_id, nb_label AS predicted_label,
       CAST(n_votes AS BIGINT) AS n_votes, true_label
FROM winner WHERE vr = 1
ORDER BY vec_id
"""


QUERIES = {
    "sim_knn_bruteforce": knn_bruteforce,
    "sim_ann_ivf": ann_ivf,
    "sim_ann_ivf_multiprobe": ann_ivf_multiprobe,
    "sim_knn_quantized": knn_quantized,
    "dedup_embedding": embedding_near_dup,
    "emb_knn_classify": knn_classify,
}

ORACLE_SQL = {
    "sim_knn_bruteforce": KNN_SQL,
    "sim_ann_ivf": ANN_IVF_SQL,
    "sim_ann_ivf_multiprobe": ANN_MULTIPROBE_SQL,
    "sim_knn_quantized": KNN_QUANTIZED_SQL,
    "dedup_embedding": EMB_DEDUP_SQL,
    "emb_knn_classify": KNN_CLASSIFY_SQL,
}


def emb_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-occupancy report: vectors per cell + share permille —
    the index-health check run after (re)training a coarse quantizer;
    a hot cell means probe latency and a cold one wasted centroids.
    Assignment is the same narrow literal-centroid argmax as ann_ivf
    (no Exchange); the report is |cells|-sized.
    """
    emb = _emb(spark, sf_dir)
    cents = _collect_centroids(emb)
    assigned = assign_cells(emb, cents, 1).select(
        "vec_id", F.col("cells")[0].alias("cell"))
    cells = assigned.groupBy("cell").agg(F.count("*").alias("n_vecs"))
    total = cells.agg(F.sum("n_vecs").alias("total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .selectExpr("cell", "n_vecs",
                    "(1000 * n_vecs) DIV total AS share_permille"))


IVF_CELL_BALANCE_SQL = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
          WHERE vec_id < {N_CENTROIDS}),
assign0 AS (
  SELECT e.vec_id, c.cent_id,
         {V.sql_cosine('e.embedding', 'c.cv')} AS csim
  FROM emb e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY csim DESC, cent_id ASC) AS rn
    FROM assign0) WHERE rn = 1),
cells AS (SELECT cell, COUNT(*) AS n_vecs FROM assigned GROUP BY cell),
t AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS total FROM cells)
SELECT cell, n_vecs,
       (1000 * n_vecs) // (SELECT total FROM t) AS share_permille
FROM cells
"""


QUERIES["emb_ivf_cell_balance"] = emb_ivf_cell_balance
ORACLE_SQL["emb_ivf_cell_balance"] = IVF_CELL_BALANCE_SQL


def emb_knn_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor confidence margin: per query vector the cosine
    gap between its 1st and 2nd neighbor — the retrieval-confidence
    diagnostic (a small margin marks ambiguous matches that ANN probes
    or rerankers should re-examine). Reuses the exact-kNN pipeline and
    pivots the top-2 rows; bounded output per query.
    """
    top = knn_bruteforce(spark, sf_dir).filter(F.col("rn") <= 2)
    return (
        top.groupBy("query_id")
        .agg(F.max(F.when(F.col("rn") == 1, F.col("cosine"))).alias("cos1"),
             F.max(F.when(F.col("rn") == 2, F.col("cosine"))).alias("cos2"),
             F.max(F.when(F.col("rn") == 1, F.col("neighbor_id")))
             .alias("top1_id"))
        .select("query_id", "top1_id", "cos1", "cos2",
                (F.col("cos1") - F.col("cos2")).alias("margin"))
    )


KNN_MARGIN_SQL = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {V.sql_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM pairs)
SELECT query_id,
       CAST(MAX(CASE WHEN rn = 1 THEN neighbor_id END) AS BIGINT)
         AS top1_id,
       MAX(CASE WHEN rn = 1 THEN cosine END) AS cos1,
       MAX(CASE WHEN rn = 2 THEN cosine END) AS cos2,
       MAX(CASE WHEN rn = 1 THEN cosine END)
         - MAX(CASE WHEN rn = 2 THEN cosine END) AS margin
FROM ranked WHERE rn <= 2 GROUP BY query_id
"""


QUERIES["emb_knn_margin"] = emb_knn_margin
ORACLE_SQL["emb_knn_margin"] = KNN_MARGIN_SQL


def emb_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distances between the IVF coarse-quantizer centroids —
    quantized-exact squared L2 in 1e-6 units: near-identical centroids
    mean redundant cells (probe waste), and the minimum pair bounds
    the quantizer's resolution. |centroids|^2 / 2 rows of pure integer
    arithmetic over broadcast-scale data."""
    emb = _emb(spark, sf_dir)
    cents = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"),
        F.transform(F.col("vd"),
                    lambda x: F.floor(x * 1_000_000).cast("long"))
        .alias("q"))
    a = cents.select(F.col("cent_id").alias("cent_a"),
                     F.col("q").alias("qa"))
    b = cents.select(F.col("cent_id").alias("cent_b"),
                     F.col("q").alias("qb"))
    d2 = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (a.join(b, F.col("cent_a") < F.col("cent_b"))
            .select("cent_a", "cent_b", d2.alias("d2_micro")))


CENTROID_DIST_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cent_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id < {N_CENTROIDS})
SELECT a.cent_id AS cent_a, b.cent_id AS cent_b,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, len(a.q) + 1),
                          i -> (a.q[i] - b.q[i]) * (a.q[i] - b.q[i]))),
         (acc, x) -> acc + x) AS d2_micro
FROM cents a JOIN cents b ON a.cent_id < b.cent_id
"""


QUERIES["emb_centroid_distances"] = emb_centroid_distances
ORACLE_SQL["emb_centroid_distances"] = CENTROID_DIST_SQL


# -- signed-random-projection (SRP) family: the THIRD LSH flavor      --
# -- (MinHash = Jaccard, band-hash = exact, SRP = cosine) plus the    --
# -- Johnson-Lindenstrauss scale path it shares machinery with        --

#: projected dimensions for the JL distortion census
RP_DIMS = 16
#: hyperplanes per SRP signature (256 buckets — sized so the synthetic
#: corpus actually yields candidate pairs; at 100 TB you raise planes
#: and band like dedup_band_tuning measures)
SRP_PLANES = 8
#: Knuth multiplicative constant + Mersenne modulus for the
#: deterministic +-1 hyperplane weights (positive everywhere, so both
#: engines' % agree)
_RP_A = 2654435761
_RP_P = 2147483647


def _rp_sign(h: str, d: str) -> str:
    """SQL (Spark == DuckDB dialect subset) for the deterministic ±1
    weight of hyperplane ``h`` at dimension ``d``."""
    return f"(1 - 2 * ((({h} * 64 + {d} + 1) * {_RP_A}) % {_RP_P} % 2))"


def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion census: project every embedding
    64 -> RP_DIMS with deterministic ±1 hyperplanes (Achlioptas 2003 —
    database-friendly random projections) over 1e-6-quantized
    coordinates, then report how well projected norms track true norms:
    distortion_permille = (1000·Σ proj²) / (RP_DIMS·Σ v²), bucketed by
    50-permille bins. ~1000 = the JL guarantee working; the census is
    the measurement that justifies running ANN on 4x fewer dimensions.

    All arithmetic is exact integers (±1 weights from an affine hash,
    quantized coordinates, integer sums; (125·sp) DIV (2·sq) ==
    (1000·sp)/(16·sq) as rationals so both engines truncate alike).
    Plan: narrow per-row array expressions at the scan + one
    |buckets|-sized aggregate — map-only at 100 TB, the JL scale path.
    The higher-order-function expressions are interpreted (not
    codegen'd), so the scan is WIDENED first: the one-file testdata
    table would otherwise run the whole projection on a single task
    (the _emb lesson).
    """
    from kmr_spark.session import widen

    emb = widen(load_tables(spark, sf_dir)["embeddings"])
    q = emb.select(
        "vec_id",
        F.expr("transform(embedding,"
               " x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .alias("vq"))
    proj = q.select(
        "vec_id",
        F.expr(
            f"transform(sequence(0, {RP_DIMS - 1}), h ->"
            " aggregate(sequence(0, size(vq) - 1), CAST(0 AS BIGINT),"
            f" (acc, d) -> acc + {_rp_sign('h', 'd')}"
            " * element_at(vq, d + 1)))").alias("p"),
        F.expr("aggregate(vq, CAST(0 AS BIGINT),"
               " (acc, x) -> acc + x * x)").alias("sq"))
    scored = proj.select(
        "vec_id",
        F.expr("aggregate(p, CAST(0 AS BIGINT),"
               " (acc, x) -> acc + x * x)").alias("sp"),
        "sq")
    return (
        scored.select(
            F.expr(f"((125 * sp) DIV (2 * sq)) DIV 50").alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("n_vectors"))
        .orderBy("bucket")
    )


RP_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
  FROM embeddings),
proj AS (
  SELECT vec_id, h,
         CAST(SUM({_rp_sign('h', 'd')} * vq[d + 1]) AS BIGINT) AS p
  FROM q,
       unnest(range(0, {RP_DIMS})) AS th(h),
       unnest(range(0, len(vq))) AS td(d)
  GROUP BY vec_id, h),
norms AS (
  SELECT vec_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(vq, x -> x * x)),
              (acc, x) -> acc + x) AS BIGINT) AS sq
  FROM q),
scored AS (
  SELECT p.vec_id, CAST(SUM(p.p * p.p) AS BIGINT) AS sp, n.sq
  FROM proj p JOIN norms n USING (vec_id)
  GROUP BY p.vec_id, n.sq)
SELECT ((125 * sp) // (2 * sq)) // 50 AS bucket,
       COUNT(*) AS n_vectors
FROM scored GROUP BY bucket ORDER BY bucket
"""


QUERIES["emb_random_projection"] = emb_random_projection
ORACLE_SQL["emb_random_projection"] = RP_SQL


def emb_srp_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH cosine candidate generation: every vector gets an
    SRP_PLANES-bit signature (sign of the projection onto each
    deterministic hyperplane); candidate pairs = same signature,
    verified by the EXACT quantized cosine test 100·dot² >= 64·na·nb
    (cos >= 0.8, no sqrt — squares compared in DECIMAL/HUGEINT so
    nothing overflows). Emits every candidate with its exact integer
    dot and norms plus the verification verdict — the third LSH family
    next to MinHash (Jaccard) and band-hash (exact), Charikar 2002.

    Plan: signature is a narrow scan expression; the self-join keys on
    the signature (bucketed, NEVER all-pairs — pair volume is
    Σ C(bucket,2), measurable beforehand exactly like
    dedup_band_tuning); the verify dot runs only on candidates. The
    signature pipeline is WIDENED (one-file scan would single-task the
    interpreted HOF expressions) and PERSISTED so the self-join's two
    sides compute it once, not twice.
    """
    from pyspark.storagelevel import StorageLevel

    from kmr_spark.session import widen

    emb = widen(load_tables(spark, sf_dir)["embeddings"])
    q = emb.select(
        "vec_id",
        F.expr("transform(embedding,"
               " x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .alias("vq"))
    sig = q.select(
        "vec_id", "vq",
        F.expr(
            f"aggregate(sequence(0, {SRP_PLANES - 1}), CAST(0 AS BIGINT),"
            " (acc, h) -> acc + CASE WHEN"
            " aggregate(sequence(0, size(vq) - 1), CAST(0 AS BIGINT),"
            f"  (a2, d) -> a2 + {_rp_sign('h', 'd')}"
            "  * element_at(vq, d + 1)) >= 0"
            " THEN CAST(pow(2, h) AS BIGINT) ELSE 0 END)").alias("sig"),
        F.expr("aggregate(vq, CAST(0 AS BIGINT),"
               " (acc, x) -> acc + x * x)").alias("nrm")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = sig.select(F.col("vec_id").alias("a"), F.col("vq").alias("vqa"),
                   F.col("nrm").alias("na"), "sig")
    b = sig.select(F.col("vec_id").alias("b"), F.col("vq").alias("vqb"),
                   F.col("nrm").alias("nb"), "sig")
    pairs = (
        a.join(b, "sig")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", "na", "nb",
            F.expr("aggregate(zip_with(vqa, vqb, (x, y) -> x * y),"
                   " CAST(0 AS BIGINT), (acc, x) -> acc + x)")
            .alias("dot"))
    )
    near = (
        (F.col("dot") > 0)
        & (F.lit(100).cast("decimal(38,0)") * F.col("dot").cast("decimal(38,0)")
           * F.col("dot").cast("decimal(38,0)")
           >= F.lit(64).cast("decimal(38,0)")
           * F.col("na").cast("decimal(38,0)")
           * F.col("nb").cast("decimal(38,0)")))
    out = (pairs.select("a", "b", "dot", "na", "nb", near.alias("near"))
           .orderBy("a", "b"))
    return materialize_release(out, sig)


SRP_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vq
  FROM embeddings),
proj AS (
  SELECT vec_id, h,
         CAST(SUM({_rp_sign('h', 'd')} * vq[d + 1]) AS BIGINT) AS p
  FROM q,
       unnest(range(0, {SRP_PLANES})) AS th(h),
       unnest(range(0, len(vq))) AS td(d)
  GROUP BY vec_id, h),
sigs AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN p >= 0
                  THEN CAST(pow(2, h) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS sig
  FROM proj GROUP BY vec_id),
norms AS (
  SELECT vec_id,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(vq, x -> x * x)),
              (acc, x) -> acc + x) AS BIGINT) AS nrm
  FROM q),
pairs AS (
  SELECT sa.vec_id AS a, sb.vec_id AS b
  FROM sigs sa JOIN sigs sb
    ON sa.sig = sb.sig AND sa.vec_id < sb.vec_id),
dots AS (
  SELECT p.a, p.b,
         CAST(SUM(qa.vq[d + 1] * qb.vq[d + 1]) AS BIGINT) AS dot
  FROM pairs p
  JOIN q qa ON qa.vec_id = p.a
  JOIN q qb ON qb.vec_id = p.b,
       unnest(range(0, len(qa.vq))) AS td(d)
  GROUP BY p.a, p.b)
SELECT d.a, d.b, d.dot, na.nrm AS na, nb.nrm AS nb,
       (d.dot > 0 AND
        100 * CAST(d.dot AS HUGEINT) * d.dot
          >= 64 * CAST(na.nrm AS HUGEINT) * nb.nrm) AS near
FROM dots d
JOIN norms na ON na.vec_id = d.a
JOIN norms nb ON nb.vec_id = d.b
ORDER BY d.a, d.b
"""


QUERIES["emb_srp_candidates"] = emb_srp_candidates
ORACLE_SQL["emb_srp_candidates"] = SRP_SQL


# -- sparse lexical similarity: TF-IDF cosine via an inverted index  --

#: discriminative-vocabulary band: BIGRAM terms must appear in at
#: least TFIDF_DF_MIN documents (df=1 can't pair) and at most
#: max(16, n_docs // TFIDF_DF_MAX_SHARE) — the posting-list prune that
#: bounds pair volume by sum(C(df,2)); the cap scales with the corpus
#: so the band doesn't empty out as N grows
TFIDF_DF_MIN = 2
TFIDF_DF_MAX_FLOOR = 16
TFIDF_DF_MAX_SHARE = 100
#: candidate pairs must share at least this many discriminative terms
TFIDF_MIN_SHARED = 2
#: cosine threshold for the near flag: cos >= 0.5  <=>  4*dot^2 >= na*nb
TFIDF_COS_NUM = 4


def docs_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine document similarity — the INVERTED-INDEX
    complement to the dense-embedding ANN family: the term unit is the
    WORD BIGRAM (the synthetic corpus's unigram vocabulary is ~31
    words, which makes unigram IDF degenerate; bigrams give a ~1000-way
    space), candidate pairs come from shared DISCRIMINATIVE bigrams
    (document frequency in [TFIDF_DF_MIN, max(16, N/100)] — stock
    phrases never generate a pair, the Elasticsearch more-like-this
    prune), weights are integer c·idf_permille, and the cosine verify
    compares 4·dot² >= na·nb in DECIMAL/HUGEINT (cos >= 0.5, no sqrt).
    Metric, norms, and dot are all defined over the SAME pruned
    vocabulary, so the similarity is self-consistent and the oracle
    exact.

    Scale shape: postings equi-join keyed by term — pair volume is
    Σ C(df,2), bounded by the df cap and measurable from the df table
    before materialization; MIN_SHARED then cuts accidental one-term
    overlaps. Output BIGINT casts are exact at oracle scales (the
    decimal pipeline itself carries 38 digits).
    """
    from kmr_spark.session import widen

    docs = widen(load_tables(spark, sf_dir)["documents"])
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x != '')").alias("t"))
    terms = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    # parquet-footer row count instead of a blocking count() through
    # the widen shuffle — same value as COUNT(*) FROM documents
    from kmr_spark.session import parquet_num_rows
    n_docs = parquet_num_rows(sf_dir, "documents")
    if n_docs is None:
        n_docs = docs.count()
    df_max = max(TFIDF_DF_MAX_FLOOR, n_docs // TFIDF_DF_MAX_SHARE)
    df_t = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        (F.col("df") >= TFIDF_DF_MIN) & (F.col("df") <= df_max))
    dec = lambda c: c.cast("decimal(38,0)")
    w = (tf.join(F.broadcast(df_t), "term")
         .select("doc_id", "term",
                 dec(F.col("c") * F.expr(f"(1000 * {n_docs}) DIV df"))
                 .alias("w"))
         .persist())
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("nrm"))
    a = w.select(F.col("doc_id").alias("a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("b"), "term", F.col("w").alias("wb"))
    pairs = (
        a.join(b, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"),
             F.sum(F.col("wa") * F.col("wb")).alias("dot"))
        .filter(F.col("n_shared") >= TFIDF_MIN_SHARED)
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("nrm").alias("nb"))
    near = (F.lit(TFIDF_COS_NUM).cast("decimal(38,0)")
            * F.col("dot") * F.col("dot")
            >= F.col("na") * F.col("nb"))
    out = (
        pairs.join(na, "a").join(nb, "b")
        .select("a", "b", "n_shared",
                F.col("dot").cast("long").alias("dot"),
                F.col("na").cast("long").alias("na"),
                F.col("nb").cast("long").alias("nb"),
                near.alias("near"))
        .orderBy("a", "b"))
    return materialize_release(out, w)


def _tfidf_cosine_sql() -> str:
    return f"""
WITH t0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents),
terms AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS term
  FROM t0, unnest(range(1, len(t))) AS u(i)
  WHERE len(t) >= 2),
tf AS (SELECT doc_id, term, COUNT(*) AS c FROM terms GROUP BY 1, 2),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dft AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
  HAVING COUNT(*) >= {TFIDF_DF_MIN}
     AND COUNT(*) <= greatest({TFIDF_DF_MAX_FLOOR},
                              (SELECT n_docs FROM n) // {TFIDF_DF_MAX_SHARE})),
w AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.c * ((1000 * (SELECT n_docs FROM n)) // dft.df)
              AS HUGEINT) AS w
  FROM tf JOIN dft USING (term)),
norms AS (SELECT doc_id, SUM(w * w) AS nrm FROM w GROUP BY doc_id),
pairs AS (
  SELECT wa.doc_id AS a, wb.doc_id AS b,
         COUNT(*) AS n_shared, SUM(wa.w * wb.w) AS dot
  FROM w wa JOIN w wb ON wa.term = wb.term AND wa.doc_id < wb.doc_id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {TFIDF_MIN_SHARED})
SELECT p.a, p.b, p.n_shared,
       CAST(p.dot AS BIGINT) AS dot,
       CAST(na.nrm AS BIGINT) AS na,
       CAST(nb.nrm AS BIGINT) AS nb,
       {TFIDF_COS_NUM} * p.dot * p.dot >= na.nrm * nb.nrm AS near
FROM pairs p
JOIN norms na ON na.doc_id = p.a
JOIN norms nb ON nb.doc_id = p.b
ORDER BY p.a, p.b
"""


TFIDF_COSINE_SQL = _tfidf_cosine_sql()

QUERIES["docs_tfidf_cosine_pairs"] = docs_tfidf_cosine_pairs
ORACLE_SQL["docs_tfidf_cosine_pairs"] = TFIDF_COSINE_SQL


def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per IVF cell: for each
    vector, a = squared distance to its own (nearest) centroid, b =
    squared distance to the second-nearest; s = (b - a)/max(a, b).
    Per-cell mean silhouette is THE clustering-quality readout that
    says whether the coarse quantizer's cells are actually separated
    (s near 0 = boundary-crowded cells, recall risk for single-probe
    ANN).

    Exactness: vectors and centroids quantize to 1e-6-unit longs, so
    a and b are exact integers; each point's s quantizes to milli
    units via integer DIV (both engines truncate toward zero), and
    the per-cell mean is an integer sum with one final division.
    Plan: distances come from a NARROW literal-centroid fold (the
    assign_cells pattern) — no explode, no join for assignment; one
    keyed aggregate by cell.
    """
    emb = _emb(spark, sf_dir)
    cents = [(cid, [int(_math.floor(x * 1_000_000)) for x in vec])
             for cid, vec in _collect_centroids(emb)]
    q = F.transform(F.col("vd"),
                    lambda x: F.floor(x * 1_000_000).cast("long"))
    pts = emb.select("vec_id", q.alias("qv"))
    structs = []
    for cid, qvec in cents:
        lit = F.array(*[F.lit(v).cast("long") for v in qvec])
        d2 = F.aggregate(
            F.zip_with(F.col("qv"), lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        structs.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
    ordered = F.array_sort(F.array(*structs))  # (d2, cid) lexicographic
    own = F.element_at(ordered, 1)
    nxt = F.element_at(ordered, 2)
    s_milli = F.expr("((b_d2 - a_d2) * 1000) DIV "
                     "CASE WHEN b_d2 > a_d2 THEN b_d2 ELSE a_d2 END")
    scored = (
        pts.select(
            "vec_id",
            own["cid"].alias("cell"),
            own["d2"].alias("a_d2"),
            nxt["d2"].alias("b_d2"))
        # a point ON a centroid has a=0; b>=a>0 guaranteed otherwise
        .filter(F.col("b_d2") > 0)
        .withColumn("s_milli", s_milli)
    )
    return (
        scored.groupBy("cell")
        .agg(F.count("*").alias("n_points"),
             F.sum("s_milli").alias("s_milli_sum"),
             F.min("s_milli").alias("s_min"))
        .select("cell", "n_points",
                (F.col("s_milli_sum").cast("double")
                 / (F.col("n_points").cast("double") * F.lit(1000.0)))
                .alias("mean_silhouette"),
                "s_min")
        .orderBy("cell")
    )


import math as _math  # noqa: E402  (used by emb_silhouette literals)

SILHOUETTE_SQL = f"""
WITH pts AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings),
cents AS (SELECT vec_id AS cid, qv AS cq FROM pts
          WHERE vec_id < {N_CENTROIDS}),
dists AS (
  SELECT p.vec_id, c.cid,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(p.qv) + 1),
                            i -> (p.qv[i] - c.cq[i]) * (p.qv[i] - c.cq[i]))),
           (acc, x) -> acc + x) AS d2
  FROM pts p CROSS JOIN cents c),
ranked AS (
  SELECT vec_id, cid, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM dists),
pairs AS (
  SELECT a.vec_id, a.cid AS cell, a.d2 AS a_d2, b.d2 AS b_d2
  FROM ranked a JOIN ranked b
    ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
scored AS (
  SELECT cell,
         ((b_d2 - a_d2) * 1000)
           // (CASE WHEN b_d2 > a_d2 THEN b_d2 ELSE a_d2 END) AS s_milli
  FROM pairs WHERE b_d2 > 0)
SELECT cell, COUNT(*) AS n_points,
       CAST(SUM(s_milli) AS DOUBLE)
         / (CAST(COUNT(*) AS DOUBLE) * 1000.0) AS mean_silhouette,
       CAST(MIN(s_milli) AS BIGINT) AS s_min
FROM scored GROUP BY cell ORDER BY cell
"""


QUERIES["emb_silhouette"] = emb_silhouette
ORACLE_SQL["emb_silhouette"] = SILHOUETTE_SQL


def emb_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension SQ8 scalar-quantization error report: min/max
    range, the 8-bit code scale, and the reconstruction MSE each
    dimension pays — the calibration table a vector store prints
    before committing to int8 storage (sim_knn_quantized consumes the
    codes; this measures what they cost). Dimensions whose MSE is an
    outlier want per-dim or per-block scales.

    Plan: posexplode the embedding array (narrow), ONE aggregation
    keyed by dim for min/max (256 rows out), broadcast the ranges
    back, ONE more keyed aggregation for the error sums. Exactness:
    min/max of floats are order-independent; code = floor(x*255/range
    + 0.5) and the reconstruction are fixed expression trees per
    element; the squared error is quantized to 1e-12 units (floor)
    and integer-summed, so the fold is order-free. All float32 inputs
    are exactly representable in the doubles both engines compute in.
    """
    e = load_tables(spark, sf_dir)["embeddings"]
    vals = e.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    ranges = vals.groupBy("dim").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    err = (
        vals.join(F.broadcast(ranges), "dim")
        .withColumn("code", F.expr(
            "CAST(floor((v - vmin) * 255.0 / (vmax - vmin) + 0.5) AS BIGINT)"))
        .withColumn("recon", F.expr(
            "vmin + CAST(code AS DOUBLE) * (vmax - vmin) / 255.0"))
        .withColumn("err2_q", F.expr(
            "CAST(floor((v - recon) * (v - recon) * 1e12) AS BIGINT)"))
    )
    return (
        err.groupBy("dim")
        .agg(F.count("*").alias("n"),
             F.min("vmin").alias("vmin"), F.min("vmax").alias("vmax"),
             F.min(F.col("code")).alias("code_min"),
             F.max(F.col("code")).alias("code_max"),
             F.sum("err2_q").alias("sum_err2_q"))
        .select("dim", "n", "vmin", "vmax", "code_min", "code_max",
                "sum_err2_q",
                F.expr("CAST(sum_err2_q AS DOUBLE) / (1e12 * CAST(n AS "
                       "DOUBLE))").alias("mse"))
        .orderBy("dim")
    )


QUANT_ERROR_SQL = """
WITH vals AS (
  SELECT CAST(i - 1 AS BIGINT) AS dim,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
ranges AS (
  SELECT dim, MIN(v) AS vmin, MAX(v) AS vmax FROM vals GROUP BY dim),
err AS (
  SELECT vals.dim, v, vmin, vmax,
         CAST(floor((v - vmin) * 255.0 / (vmax - vmin) + 0.5) AS BIGINT)
           AS code,
         vmin + CAST(CAST(floor((v - vmin) * 255.0 / (vmax - vmin) + 0.5)
                          AS BIGINT) AS DOUBLE) * (vmax - vmin) / 255.0
           AS recon
  FROM vals JOIN ranges ON vals.dim = ranges.dim)
SELECT dim, COUNT(*) AS n, MIN(vmin) AS vmin, MIN(vmax) AS vmax,
       MIN(code) AS code_min, MAX(code) AS code_max,
       CAST(SUM(CAST(floor((v - recon) * (v - recon) * 1e12) AS BIGINT))
            AS BIGINT) AS sum_err2_q,
       CAST(SUM(CAST(floor((v - recon) * (v - recon) * 1e12) AS BIGINT))
            AS DOUBLE) / (1e12 * CAST(COUNT(*) AS DOUBLE)) AS mse
FROM err GROUP BY dim ORDER BY dim
"""

QUERIES["emb_quantization_error"] = emb_quantization_error
ORACLE_SQL["emb_quantization_error"] = QUANT_ERROR_SQL


def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL CALIBRATION for the IVF index: for each probe budget
    p = 1..N_PROBES, what fraction of the brute-force top-TOP_K
    neighbors would IVF's candidate generation even SEE (the neighbor's
    cell is among the query's p nearest cells)? The "measure, don't
    guess" companion to dedup_minhash_calibration: pick n_probes from
    this curve, not folklore. Recall here scores candidate GENERATION
    (pre-rescoring), the quantity cell probing actually controls.

    Exactness: hits/possible are integers; recall_permille by DIV and
    one fixed-tree double. Scale: ground truth is the (bounded) query
    set x corpus scoring the brute-force baseline already pays; the
    calibration joins are Q*K-row frames against the cell assignment.
    """
    emb = _emb(spark, sf_dir)
    cents = _collect_centroids(emb)
    assigned = (
        assign_cells(emb, cents, 1)
        .select("vec_id", F.col("cells")[0].alias("cell"))
        .persist()
    )
    truth = knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    probes = (
        assign_cells(emb.filter(F.col("vec_id") < N_QUERIES), cents,
                     N_PROBES)
        .select(F.col("vec_id").alias("query_id"),
                F.posexplode("cells").alias("probe_idx", "cell"))
        .select("query_id", "cell",
                (F.col("probe_idx") + 1).alias("probe_rank"))
    )
    hit_rank = (
        truth
        .join(assigned.withColumnRenamed("vec_id", "neighbor_id"),
              "neighbor_id")
        .join(F.broadcast(probes), ["query_id", "cell"], "left")
        .groupBy().agg(
            F.count("*").alias("possible"),
            *[F.count(F.when(F.col("probe_rank") <= p, 1))
              .alias(f"h{p}") for p in range(1, N_PROBES + 1)])
    )
    # ONE evaluation of the (1-row) hit aggregate, exploded into the
    # N_PROBES output rows — the previous N_PROBES-way unionByName of
    # selects over hit_rank re-ran the whole truth-join tree per
    # branch (guide §1.2/§2.1: the same expensive subtree evaluated
    # 8x; plan went from 8 aggregate branches to 1 + a generator)
    ph = F.explode(F.array(*[
        F.struct(F.lit(p).cast("long").alias("probes"),
                 F.col(f"h{p}").alias("hits"))
        for p in range(1, N_PROBES + 1)])).alias("ph")
    out = (
        hit_rank.select(ph, "possible")
        .select(
            F.col("ph.probes").alias("probes"),
            F.col("ph.hits").alias("hits"),
            "possible",
            F.expr("(1000 * ph.hits) DIV possible").alias("recall_permille"),
            (F.col("ph.hits").cast("double")
             / F.col("possible").cast("double")).alias("recall"))
    )
    return materialize_release(out.orderBy("probes"), assigned)


def _ivf_recall_sql() -> str:
    h_cols = ",\n         ".join(
        f"COUNT(CASE WHEN probe_rank <= {p} THEN 1 END) AS h{p}"
        for p in range(1, N_PROBES + 1))
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({p} AS BIGINT) AS probes, h{p} AS hits, possible,\n"
        f"       (1000 * h{p}) // possible AS recall_permille,\n"
        f"       CAST(h{p} AS DOUBLE) / CAST(possible AS DOUBLE) AS recall\n"
        f"FROM agg" for p in range(1, N_PROBES + 1))
    return f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings
          WHERE vec_id < {N_CENTROIDS}),
assign0 AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         {V.sql_cosine('e.embedding', 'c.cv')} AS csim
  FROM emb e CROSS JOIN cents c),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY csim DESC, cent_id ASC) AS rn
  FROM assign0),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id AS cell, CAST(rn AS BIGINT)
           AS probe_rank
  FROM ranked WHERE rn <= {N_PROBES} AND vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         {V.sql_cosine('q.embedding', 'e.embedding')} AS cosine
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM pairs) WHERE rn <= {TOP_K}),
joined AS (
  SELECT t.query_id, p.probe_rank
  FROM truth t
  JOIN assigned a ON a.vec_id = t.neighbor_id
  LEFT JOIN probes p ON p.query_id = t.query_id AND p.cell = a.cell),
agg AS (
  SELECT COUNT(*) AS possible,
         {h_cols}
  FROM joined)
{selects}
ORDER BY probes
"""


IVF_RECALL_SQL = _ivf_recall_sql()

QUERIES["sim_ivf_recall"] = sim_ivf_recall
ORACLE_SQL["sim_ivf_recall"] = IVF_RECALL_SQL
