"""Distributed matrix multiply (reference capability evidence:
ex/phoenix-matrix-multiply.c, SURVEY.md §2.12).

The reference ports Phoenix's MapReduce matmul: emit (k, A_ik) and
(k, B_kj), cogroup on k, emit partial products, reduce on (i, j).
Spark-first: that is literally a join on k + groupBy (i, j) sum — the
COO (coordinate-format) sparse matmul, whose shuffle keys (k, then
(i,j)) are exactly the two exchanges any distributed matmul needs.
Entries are integers derived deterministically from lineitem, so sums
are exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.session import load_tables

A_ROWS = 40  # A is A_ROWS x INNER, B is INNER x B_COLS (sparse COO)
INNER = 30
B_COLS = 20


def matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C = A x B over COO matrices derived from lineitem; output
    (i, j, c) for nonzero cells."""
    li = load_tables(spark, sf_dir)["lineitem"]
    a = (
        li.select(
            (F.col("l_orderkey") % A_ROWS).alias("i"),
            (F.col("l_partkey") % INNER).alias("k"),
            (F.col("l_linenumber") % 5 + 1).cast("long").alias("va"),
        )
        .groupBy("i", "k").agg(F.sum("va").alias("va"))
    )
    b = (
        li.select(
            (F.col("l_partkey") % INNER).alias("k"),
            (F.col("l_suppkey") % B_COLS).alias("j"),
            (F.col("l_quantity").cast("long") % 7 + 1).alias("vb"),
        )
        .groupBy("k", "j").agg(F.sum("vb").alias("vb"))
    )
    return (
        a.join(b, "k")
        .select("i", "j", (F.col("va") * F.col("vb")).alias("p"))
        .groupBy("i", "j")
        .agg(F.sum("p").alias("c"))
        .orderBy("i", "j")
    )


MATMUL_SQL = f"""
WITH a AS (
  SELECT l_orderkey % {A_ROWS} AS i, l_partkey % {INNER} AS k,
         SUM(l_linenumber % 5 + 1) AS va
  FROM lineitem GROUP BY 1, 2),
b AS (
  SELECT l_partkey % {INNER} AS k, l_suppkey % {B_COLS} AS j,
         SUM(CAST(l_quantity AS BIGINT) % 7 + 1) AS vb
  FROM lineitem GROUP BY 1, 2)
SELECT a.i, b.j, CAST(SUM(a.va * b.vb) AS BIGINT) AS c
FROM a JOIN b ON a.k = b.k
GROUP BY a.i, b.j ORDER BY a.i, b.j
"""


def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension normalization statistics over the embeddings
    corpus — the whitening-prep pass every embedding pipeline runs
    before indexing/training: for each of the 64 dimensions, the count,
    mean, and variance of that coordinate.

    Exactness: each coordinate is INTEGER-QUANTIZED at the scan —
    vq = floor(v*1e6) as BIGINT (float32 inputs carry ~1e-7 relative
    precision, so 1e-6 quantization is below the data's own noise) —
    and both moments are exact order-free integer sums (the squares
    accumulate in DECIMAL(38,0)/HUGEINT so a trillion-row dimension
    can't overflow); mean/variance come from one fixed double
    expression tree. The previous DECIMAL(20,12) form was NOT
    bit-stable: Spark truncates the v*v product to scale 21 (38-digit
    cap) while DuckDB keeps scale 24, a last-ulp variance divergence
    the exact-float sweep caught. Plan shape: one posexplode (the
    corpus read) into a 64-key aggregate — map-side combinable, the
    shuffle carries 64 rows per partition.
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    vals = emb.select(F.posexplode(
        F.transform(F.col("embedding"),
                    lambda x: F.floor(x.cast("double") * F.lit(1e6)))
    ).alias("dim", "vq"))
    stats = vals.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("vq").alias("s"),
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq")).alias("q"))
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    q_d = F.col("q").cast("double")
    mean = s_d / F.lit(1e6) / n_d
    var = (n_d * q_d - s_d * s_d) / (n_d * n_d) / F.lit(1e12)
    return (
        stats.select(F.col("dim").cast("long").alias("dim"), "n",
                     mean.alias("mean"), var.alias("variance"))
        .orderBy("dim")
    )


EMB_DIM_STATS_SQL = """
WITH vals AS (
  SELECT CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS vq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
stats AS (
  SELECT dim, COUNT(*) AS n, CAST(SUM(vq) AS BIGINT) AS s,
         SUM(CAST(vq AS HUGEINT) * vq) AS q
  FROM vals GROUP BY dim)
SELECT dim, n,
       CAST(s AS DOUBLE) / 1e6 / n AS mean,
       (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12 AS variance
FROM stats ORDER BY dim
"""


PI_ITERS = 4
PI_Q = 10**9
PI_DIM = 64


def emb_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top singular direction of the embedding matrix by matrix-free
    POWER ITERATION — the eigen-solver for PCA/whitening (and the same
    computation pagerank is, done on a dense Gram operator): iterate
    v <- normalize(Aᵀ(A v)), then score every vector by its projection
    onto the iterated direction. Output (vec_id, score). Convergence
    speed is (σ2/σ1)^iters — fast on real embedding corpora with a
    spectral gap, slow on this deliberately isotropic synthetic data;
    the operator contract (and the gate) is the exact iteration, with
    the Rayleigh-improvement property test-asserted.

    Cross-engine exactness (the kmeans recipe, iterative.py):
    per-row dot products are fixed-order folds; the corpus-sized
    reduction Aᵀ(·) is quantized — sum(floor(a_d * s * 1e9)) as int64,
    exact and order-free; the 64-double direction state normalizes on
    the DRIVER in fixed order and re-broadcasts as literals. Per
    iteration: one narrow map + one 64-key aggregate; nothing leaves
    the executors but 64 longs. At web scale this is one shuffle-free
    pass per iteration over a columnar scan.
    """
    from kmr_spark.functions.vectors import dot, to_double_array

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", to_double_array("embedding").alias("vd")).persist()
    try:
        v = [0.125] * PI_DIM  # 1/sqrt(64), exact in binary
        for _ in range(PI_ITERS):
            v_lit = F.array(*[F.lit(x) for x in v])
            proj = emb.select("vd", dot(F.col("vd"), v_lit).alias("s"))
            sums = (
                proj.select(F.posexplode(
                    F.transform(
                        F.col("vd"),
                        lambda x: F.floor(x * F.col("s") * PI_Q).cast("long"))
                ).alias("pos", "q"))
                .groupBy("pos").agg(F.sum("q").alias("sq"))
                .collect()
            )
            w = [0.0] * PI_DIM
            for r in sums:
                w[r["pos"]] = float(r["sq"]) / PI_Q
            nrm = sum(x * x for x in w) ** 0.5
            v = [x / nrm for x in w]
        v_lit = F.array(*[F.lit(x) for x in v])
        return (
            emb.select("vec_id", dot(F.col("vd"), v_lit).alias("score"))
            .orderBy("vec_id")
        )
    finally:
        emb.unpersist()


def _power_iteration_sql() -> str:
    from kmr_spark.functions.vectors import sql_dot

    v0 = "[" + ", ".join(["CAST(0.125 AS DOUBLE)"] * PI_DIM) + "]"
    cte = f"""
emb AS (SELECT vec_id, embedding FROM embeddings),
v0 AS (SELECT {v0} AS v)"""
    for it in range(PI_ITERS):
        cte += f""",
s{it} AS (
  SELECT e.vec_id, e.embedding, {sql_dot('e.embedding', 'c.v')} AS s
  FROM emb e CROSS JOIN v{it} c),
q{it} AS (
  SELECT d - 1 AS pos,
         SUM(CAST(floor(CAST(embedding[d] AS DOUBLE) * s * {PI_Q})
                  AS BIGINT)) AS sq
  FROM s{it}, unnest(range(1, {PI_DIM} + 1)) AS t(d)
  GROUP BY pos),
w{it} AS (
  SELECT list(CAST(sq AS DOUBLE) / {PI_Q} ORDER BY pos) AS w FROM q{it}),
v{it + 1} AS (
  SELECT list_transform(w, x -> x / sqrt(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(w, y -> y * y)),
           (a, b) -> a + b))) AS v
  FROM w{it})"""
    return (
        f"WITH {cte}\n"
        f"SELECT e.vec_id, {sql_dot('e.embedding', 'c.v')} AS score\n"
        f"FROM emb e CROSS JOIN v{PI_ITERS} c ORDER BY e.vec_id"
    )


POWER_ITERATION_SQL = _power_iteration_sql()


QUERIES = {"linalg_matmul": matmul, "emb_dim_stats": emb_dim_stats,
           "emb_power_iteration": emb_power_iteration}
ORACLE_SQL = {"linalg_matmul": MATMUL_SQL,
              "emb_dim_stats": EMB_DIM_STATS_SQL,
              "emb_power_iteration": POWER_ITERATION_SQL}


NORM_Q = 1_000_000  # element quantization for the integer-exact norm


def emb_norm_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label decile bands of embedding norms — the outlier scan an
    embedding pipeline runs to catch collapsed / exploded vectors
    before indexing: quantize each coordinate to 1e-6, take the
    integer sum of squares (order-free, exact in any engine), then cut
    per-label deciles WITHOUT a rank window — the distributed exscan
    rank (ranking_per_group) + exact NTILE reconstruction, so no label
    funnels through one task.
    """
    from kmr_spark.operators.sort import ntile_from_rank, ranking_per_group

    emb = load_tables(spark, sf_dir)["embeddings"]
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * NORM_Q).cast("long"))
    qn = F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x * x)
    base = emb.select("vec_id", "label", qn.alias("qnorm"))
    caches: list = []
    # persist_input: the range sampler would otherwise run the
    # 64-element quantize+fold twice per vector
    ranked = ranking_per_group(
        base, ["label"], [F.col("qnorm").asc(), F.col("vec_id").asc()],
        cache_registry=caches, persist_input=True)
    decile = ntile_from_rank(F.col("rank") + F.lit(1), F.col("n_group"), 10)
    out = (
        ranked.select("label", decile.alias("decile"), "qnorm")
        .groupBy("label", "decile")
        .agg(F.count("*").alias("n_vecs"),
             F.min("qnorm").alias("min_qnorm"),
             F.max("qnorm").alias("max_qnorm"))
    )
    from kmr_spark.session import materialize_release

    return materialize_release(out, *caches)


EMB_NORM_DECILES_SQL = f"""
WITH q AS (
  SELECT vec_id, label,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {NORM_Q}) AS BIGINT))),
           (a, x) -> a + x * x) AS qnorm
  FROM embeddings),
r AS (
  SELECT label, qnorm,
         CAST(NTILE(10) OVER (PARTITION BY label
                              ORDER BY qnorm ASC, vec_id ASC) AS BIGINT)
           AS decile
  FROM q)
SELECT label, decile, COUNT(*) AS n_vecs,
       MIN(qnorm) AS min_qnorm, MAX(qnorm) AS max_qnorm
FROM r GROUP BY label, decile
"""


QUERIES["emb_norm_deciles"] = emb_norm_deciles
ORACLE_SQL["emb_norm_deciles"] = EMB_NORM_DECILES_SQL


def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix A^T A of the embedding table (upper triangle) — the
    tall-skinny kernel behind PCA/covariance/whitening, and the
    classic "narrow generate, tiny shuffle" MapReduce pattern: each
    Arrow batch contributes one dense d x d partial (numpy int64
    matmul over the quantized coordinates), so the exchange carries
    ~2080 keys x batches regardless of row count and no per-row pair
    expansion ever exists. (The reference's dense matmul example,
    /root/reference/ex/mm.c, materializes blocks; A^T A needs no
    second operand and no blocking.)

    Exactness: coordinates quantize to 1e-6 longs; per-batch partials
    are exact int64 (bound documented inline), and the cross-batch
    sum accumulates as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the
    sum passes BIGINT at ~1e9 rows — the output double is one cast.
    """
    emb = load_tables(spark, sf_dir)["embeddings"]
    from kmr_spark.functions import vectors as V
    q = F.transform(V.to_double_array("embedding"),
                    lambda x: F.floor(x * 1_000_000).cast("long"))
    # null embeddings contribute nothing (the prior explode path
    # dropped them row-wise; keep that contract, JVM-side)
    pts = emb.select(q.alias("qv")).filter(F.col("qv").isNotNull())

    # Arrow-batched partial grams: each ~10k-row batch contributes ONE
    # d x d integer matmul (Q^T Q, numpy int64 — exact) and emits its
    # d(d+1)/2 upper-triangle partials, so the per-row pair EXPLOSION
    # the first implementation paid (d(d+1)/2 = 2080 rows per vector
    # through codegen + hash-agg) never materializes: downstream sees
    # 2080 rows per BATCH.  Per-batch int64 is overflow-safe by
    # construction: |q| <= ~1e6 (unit-ish coords), so each product is
    # <= ~1e12 and a 10k-row batch partial is <= ~1e16 << 2^63; the
    # CROSS-batch sum is where 1e9-row scale would overflow, and that
    # stays DECIMAL(38,0) in the final aggregate exactly as before.
    # An internal 1e5-row slice cap keeps the bound independent of the
    # session's Arrow batch-size configuration.
    def _partial_grams(batches):
        import numpy as np
        import pandas as pd

        # slice cap makes the int64 bound hold regardless of the
        # session's Arrow maxRecordsPerBatch: 1e5 rows x ~1e12 max
        # product = ~1e17 per partial, two orders under 2^63
        cap = 100_000
        # int64 safety bound for the slice partial: cap rows x qmax^2
        # per cell must stay under 2^63.  qmax = 9e6 gives
        # 1e5 * (9e6)^2 = 8.1e18 < 9.22e18; numpy integer matmul wraps
        # SILENTLY past that, so a violated "unit-ish coords" input
        # assumption must fail loudly here, not corrupt the sums.
        qmax = 9_000_000
        for pdf in batches:
            for lo in range(0, len(pdf), cap):
                sl = pdf["qv"].iloc[lo:lo + cap]
                if sl.empty:
                    continue
                try:
                    Q = np.stack(sl.to_numpy()).astype(np.int64, copy=False)
                except ValueError:
                    # per-batch guard only: a corpus that is ragged
                    # ACROSS partitions but uniform within each batch
                    # passes here — cross-batch dimension consistency
                    # is the documented input invariant (FIXTURES.md
                    # pins d=64 for the embeddings table)
                    lens = sorted({len(v) for v in sl})
                    raise ValueError(
                        "emb_gram_matrix requires uniform-dimension "
                        f"embeddings; batch has dims {lens} (FIXTURES.md "
                        "pins d=64)")
                m = int(np.abs(Q).max())
                if m > qmax:
                    raise ValueError(
                        f"emb_gram_matrix coordinate |q|={m} exceeds the "
                        f"int64-safe bound {qmax} (unnormalized embedding?"
                        " raw value > 9.0); partial sums would wrap")
                G = Q.T @ Q
                iu, ju = np.triu_indices(G.shape[0])
                yield pd.DataFrame({
                    "i": iu.astype(np.int64), "j": ju.astype(np.int64),
                    "n": np.int64(len(sl)), "s": G[iu, ju]})

    partials = pts.mapInPandas(
        _partial_grams, schema="i long, j long, n long, s long")
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("n").alias("n_rows"),
             F.sum(F.col("s").cast("decimal(38,0)")).alias("s"))
        .select("i", "j", "n_rows",
                F.col("s").cast("double").alias("gram_micro2"))
        .orderBy("i", "j")
    )


GRAM_SQL = """
WITH pts AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL),
prods AS (
  SELECT i.i AS i, j.j AS j, p.qv[i.i + 1] * p.qv[j.j + 1] AS prod
  FROM pts p,
       unnest(range(0, 64)) AS i(i),
       unnest(range(0, 64)) AS j(j)
  WHERE j.j >= i.i)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(prod AS HUGEINT)) AS DOUBLE) AS gram_micro2
FROM prods GROUP BY i, j ORDER BY i, j
"""


QUERIES["emb_gram_matrix"] = emb_gram_matrix
ORACLE_SQL["emb_gram_matrix"] = GRAM_SQL


def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two deterministic halves of
    the embedding table (even vs odd vec_id — a stand-in for
    yesterday's batch vs today's): L2 distance between the half
    centroids, per label. The embedding-drift monitor a retrieval
    stack runs after every encoder redeploy — a label whose centroid
    moves is a label whose ANN cells and kNN labels went stale.

    Plan: posexplode to (label, half, dim, vq) with elements quantized
    to 1e6 units, ONE aggregation keyed by (label, half, dim) — 10 x
    2 x 64 output rows regardless of input size, map-side combined —
    then the per-dim squared mean gap is floor-quantized and
    integer-summed per label (order-free fold; the per-dim gap itself
    is one fixed expression tree over BIGINT sums).
    """
    e = load_tables(spark, sf_dir)["embeddings"]
    vals = e.select(
        "label", (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v")
    ).select("label", "half", "dim",
             F.floor(F.col("v").cast("double") * 1e6).cast("long")
             .alias("vq"))
    sums = vals.groupBy("label", "half", "dim").agg(
        F.count("*").alias("n"), F.sum("vq").alias("s"))
    a = sums.filter(F.col("half") == 0).select(
        "label", "dim", F.col("n").alias("n_a"), F.col("s").alias("s_a"))
    b = sums.filter(F.col("half") == 1).select(
        "label", "dim", F.col("n").alias("n_b"), F.col("s").alias("s_b"))
    per_dim = a.join(b, ["label", "dim"]).select(
        "label", "n_a", "n_b",
        F.expr(
            "CAST(floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
            " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
            " * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
            " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))"
            " AS BIGINT)").alias("gap2_q"))
    return (
        per_dim.groupBy("label").agg(
            F.max("n_a").alias("n_even"), F.max("n_b").alias("n_odd"),
            F.sum("gap2_q").alias("sum_gap2_q"))
        .selectExpr(
            "label", "n_even", "n_odd", "sum_gap2_q",
            "sqrt(CAST(sum_gap2_q AS DOUBLE)) / 1e6 AS l2_drift")
        .orderBy("label")
    )


CENTROID_DRIFT_SQL = """
WITH vals AS (
  SELECT label, vec_id % 2 AS half, CAST(i - 1 AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS vq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
sums AS (
  SELECT label, half, dim, COUNT(*) AS n, CAST(SUM(vq) AS BIGINT) AS s
  FROM vals GROUP BY 1, 2, 3),
per_dim AS (
  SELECT a.label, a.n AS n_a, b.n AS n_b,
         CAST(floor((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                     - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
                    * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                       - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)))
              AS BIGINT) AS gap2_q
  FROM sums a JOIN sums b
    ON a.label = b.label AND a.dim = b.dim
   AND a.half = 0 AND b.half = 1)
SELECT label, MAX(n_a) AS n_even, MAX(n_b) AS n_odd,
       CAST(SUM(gap2_q) AS BIGINT) AS sum_gap2_q,
       sqrt(CAST(SUM(gap2_q) AS DOUBLE)) / 1e6 AS l2_drift
FROM per_dim GROUP BY label ORDER BY label
"""

QUERIES["emb_centroid_drift"] = emb_centroid_drift
ORACLE_SQL["emb_centroid_drift"] = CENTROID_DRIFT_SQL


PCA2_ITERS = 3  # deflated second-direction iterations (v1 uses PI_ITERS)


def _pca_two_dirs(atav) -> tuple[list[float], list[float]]:
    """Driver-side state evolution shared by emb_pca_two and its test:
    v1 = PI_ITERS plain power-iteration rounds, v2 = PCA2_ITERS rounds
    with Hotelling deflation against v1. ``atav`` maps a direction to
    the (quantized) Aᵀ(A·v) image; all folds here are fixed-order."""
    v1 = [0.125] * PI_DIM
    for _ in range(PI_ITERS):
        w = atav(v1)
        nrm = sum(x * x for x in w) ** 0.5
        v1 = [x / nrm for x in w]
    v2 = [0.125] * PI_DIM
    for _ in range(PCA2_ITERS):
        w = atav(v2)
        p = sum(a * b for a, b in zip(v1, w))
        w = [x - p * a for x, a in zip(w, v1)]
        nrm = sum(x * x for x in w) ** 0.5
        v2 = [x / nrm for x in w]
    return v1, v2


def emb_pca_two(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TWO principal directions of the embedding matrix: v1 by the
    emb_power_iteration recurrence (PI_ITERS rounds), then v2 by
    power iteration WITH DEFLATION — after every matrix-free Aᵀ(A·u)
    step the component along v1 is subtracted (w' = w − (v1·w)·v1)
    before normalizing, the classic Hotelling deflation that PCA,
    whitening, and spectral-hashing pipelines run right after the
    first direction. Output: (vec_id, score1, score2), every vector
    projected onto both directions.

    Exactness inherits the power-iteration recipe wholesale: the
    corpus-sized reduction is the 1e9-quantized integer sum; the
    64-double state (including the deflation dot product and the
    norm) evolves on the driver in fixed order with plain IEEE ops,
    and the oracle evolves the identical state in unrolled SQL CTEs.
    Per iteration: one narrow map + one 64-key aggregate; the
    deflation itself is O(dims) driver arithmetic — nothing new
    crosses the cluster.
    """
    from kmr_spark.functions.vectors import dot, to_double_array

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", to_double_array("embedding").alias("vd")).persist()

    def _atav(v: list[float]) -> list[float]:
        """One quantized Aᵀ(A·v) pass (the emb_power_iteration step)."""
        v_lit = F.array(*[F.lit(x) for x in v])
        proj = emb.select("vd", dot(F.col("vd"), v_lit).alias("s"))
        sums = (
            proj.select(F.posexplode(
                F.transform(
                    F.col("vd"),
                    lambda x: F.floor(x * F.col("s") * PI_Q).cast("long"))
            ).alias("pos", "q"))
            .groupBy("pos").agg(F.sum("q").alias("sq"))
            .collect()
        )
        w = [0.0] * PI_DIM
        for r in sums:
            w[r["pos"]] = float(r["sq"]) / PI_Q
        return w

    try:
        v1, v2 = _pca_two_dirs(_atav)
        l1 = F.array(*[F.lit(x) for x in v1])
        l2 = F.array(*[F.lit(x) for x in v2])
        return (
            emb.select(
                "vec_id",
                dot(F.col("vd"), l1).alias("score1"),
                dot(F.col("vd"), l2).alias("score2"))
            .orderBy("vec_id")
            .localCheckpoint(eager=True)
        )
    finally:
        emb.unpersist()


def _pca_two_sql() -> str:
    from kmr_spark.functions.vectors import sql_dot

    def atav(tag: str, it: int, vname: str) -> str:
        return f""",
s{tag}{it} AS (
  SELECT e.vec_id, e.embedding, {sql_dot('e.embedding', 'c.v')} AS s
  FROM emb e CROSS JOIN {vname} c),
q{tag}{it} AS (
  SELECT d - 1 AS pos,
         SUM(CAST(floor(CAST(embedding[d] AS DOUBLE) * s * {PI_Q})
                  AS BIGINT)) AS sq
  FROM s{tag}{it}, unnest(range(1, {PI_DIM} + 1)) AS t(d)
  GROUP BY pos),
w{tag}{it} AS (
  SELECT list(CAST(sq AS DOUBLE) / {PI_Q} ORDER BY pos) AS w FROM q{tag}{it})"""

    norm_v = """list_transform(w, x -> x / sqrt(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(w, y -> y * y)),
           (a, b) -> a + b)))"""
    v0 = "[" + ", ".join(["CAST(0.125 AS DOUBLE)"] * PI_DIM) + "]"
    cte = f"""emb AS (SELECT vec_id, embedding FROM embeddings),
va0 AS (SELECT {v0} AS v)"""
    for it in range(PI_ITERS):
        cte += atav("a", it, f"va{it}")
        cte += f""",
va{it + 1} AS (SELECT {norm_v} AS v FROM wa{it})"""
    cte += f""",
vb0 AS (SELECT {v0} AS v)"""
    for it in range(PCA2_ITERS):
        cte += atav("b", it, f"vb{it}")
        # deflation: wd = w - (v1 . w) * v1, then normalize
        cte += f""",
wd{it} AS (
  SELECT list_transform(range(1, {PI_DIM} + 1),
           i -> w[i] - list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE),
                    list_transform(range(1, {PI_DIM} + 1),
                                   j -> v[j] * w[j])),
                  (a, b) -> a + b) * v[i]) AS w
  FROM wb{it} CROSS JOIN va{PI_ITERS}),
vb{it + 1} AS (SELECT {norm_v} AS v FROM wd{it})"""
    return (
        f"WITH {cte}\n"
        f"SELECT e.vec_id, {sql_dot('e.embedding', 'c1.v')} AS score1,\n"
        f"       {sql_dot('e.embedding', 'c2.v')} AS score2\n"
        f"FROM emb e CROSS JOIN va{PI_ITERS} c1 CROSS JOIN vb{PCA2_ITERS} c2\n"
        f"ORDER BY e.vec_id"
    )


PCA_TWO_SQL = _pca_two_sql()

QUERIES["emb_pca_two"] = emb_pca_two
ORACLE_SQL["emb_pca_two"] = PCA_TWO_SQL
