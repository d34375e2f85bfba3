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
