"""Power-iteration PCA (plans/linalg.py emb_power_iteration)."""

from __future__ import annotations

import numpy as np
from conftest import SF_DIR, assert_matches_oracle

from kmr_spark.plans.linalg import (
    POWER_ITERATION_SQL,
    emb_power_iteration,
)


def test_power_iteration_matches_oracle(spark, duck):
    assert_matches_oracle(spark, duck, emb_power_iteration,
                          POWER_ITERATION_SQL)


def test_power_iteration_equals_python_replica(spark):
    """The distributed iteration must be BIT-IDENTICAL to a pure-Python
    replica of the same quantized algorithm (same fold order, same
    floor quantization) — the property the oracle-exactness rests on —
    and the Rayleigh quotient ||A v|| must strictly improve over the
    uniform start vector (the iteration actually iterates)."""
    from kmr_spark.plans.linalg import PI_DIM, PI_ITERS, PI_Q
    from kmr_spark.session import load_tables

    rows = sorted(
        (r.vec_id, r.score)
        for r in emb_power_iteration(spark, SF_DIR).collect())
    got = [s for _, s in rows]

    emb = load_tables(spark, SF_DIR)["embeddings"].orderBy("vec_id").collect()
    A = [[float(x) for x in r.embedding] for r in emb]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    v = [0.125] * PI_DIM
    for _ in range(PI_ITERS):
        sums = [0] * PI_DIM
        for row in A:
            s = fold_dot(row, v)
            for d in range(PI_DIM):
                sums[d] += math.floor(row[d] * s * PI_Q)
        w = [float(q) / PI_Q for q in sums]
        nrm = sum(x * x for x in w) ** 0.5
        v = [x / nrm for x in w]
    expect = [fold_dot(row, v) for row in A]
    assert got == expect  # bit-identical, not approximately

    # Rayleigh improvement: the converged direction captures more
    # variance than the uniform start
    v0 = [0.125] * PI_DIM
    r0 = sum(fold_dot(row, v0) ** 2 for row in A)
    r1 = sum(x * x for x in expect)
    assert r1 > r0


def test_power_iteration_releases_cache(spark):
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    emb_power_iteration(spark, SF_DIR).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before


def test_knn_classify_matches_oracle(spark, duck):
    from kmr_spark.llm_ops.similarity import KNN_CLASSIFY_SQL, knn_classify

    assert_matches_oracle(spark, duck, knn_classify, KNN_CLASSIFY_SQL)


def test_knn_classify_shape_and_determinism(spark):
    """Every holdout vector gets exactly one prediction with a vote
    count in [1, K], and a planted tight cluster is classified
    correctly (the testdata's own labels are geometrically random, so
    accuracy there is chance by construction — the gate checks the
    vote arithmetic, this checks the classifier semantics)."""
    from pyspark.sql import functions as F

    from kmr_spark.functions import vectors as V
    from kmr_spark.llm_ops.similarity import (CLASSIFY_HOLDOUT, CLASSIFY_K,
                                              knn_classify)
    from kmr_spark.session import load_tables

    rows = knn_classify(spark, SF_DIR).collect()
    n_holdout = (load_tables(spark, SF_DIR)["embeddings"]
                 .filter(f"vec_id % {CLASSIFY_HOLDOUT} = 0").count())
    assert len(rows) == n_holdout
    for r in rows:
        assert 1 <= r.n_votes <= CLASSIFY_K

    # planted cluster: 9 labeled vectors around +e0 with label 7, one
    # query on e0; 9 labeled around -e1 with label 3 -> predict 7
    import itertools

    data = []
    for i, eps in enumerate(itertools.product([0.0, 0.01, 0.02], repeat=2)):
        data.append((i * 5 + 1, [1.0, eps[0], eps[1], 0.0], 7))
        data.append((i * 5 + 2, [0.0, -1.0, eps[0], eps[1]], 3))
    data.append((0, [1.0, 0.005, 0.0, 0.0], 99))  # query (holdout id)
    df = spark.createDataFrame(
        data, "vec_id long, vd array<double>, label int")
    q = df.filter("vec_id = 0").select(
        F.col("vd").alias("qv"), V.norm(F.col("vd")).alias("nq"))
    c = df.filter("vec_id <> 0").withColumn("nv", V.norm(F.col("vd")))
    from pyspark.sql import Window

    scored = F.broadcast(q).crossJoin(c).select(
        "label", "vec_id",
        (V.dot(F.col("qv"), F.col("vd")) / (F.col("nq") * F.col("nv")))
        .alias("cos"))
    top = (scored.withColumn(
        "rn", F.row_number().over(
            Window.orderBy(F.col("cos").desc(), F.col("vec_id"))))
        .filter(F.col("rn") <= CLASSIFY_K))
    votes = {r.label: r.n for r in
             top.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert max(votes, key=lambda k: (votes[k], -k)) == 7


def test_graph_components_matches_oracle(spark, duck):
    from kmr_spark.plans.graphs import COMPONENTS_SQL, graph_components

    assert_matches_oracle(spark, duck, graph_components, COMPONENTS_SQL)


def test_graph_components_partition_properties(spark):
    """Labels are the component minimum, exactly one root per
    component, sizes consistent, and the giant R-MAT component exists
    (power-law graphs connect most reached nodes)."""
    from collections import defaultdict

    from kmr_spark.plans.graphs import graph_components

    rows = graph_components(spark, SF_DIR).collect()
    comps = defaultdict(list)
    for r in rows:
        comps[r.component_id].append(r)
    for label, members in comps.items():
        assert min(m.node for m in members) == label
        assert sum(1 for m in members if m.is_root) == 1
        assert all(m.component_size == len(members) for m in members)
    assert max(len(m) for m in comps.values()) > len(rows) // 2
