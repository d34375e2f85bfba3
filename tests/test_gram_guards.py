"""Loud-failure guards of the gram-matrix batch kernel (ADVICE r8).

The per-batch int64 matmul in ``emb_gram_matrix`` is exact only under
two data invariants: coordinates are unit-ish (|q| <= 9e6 after 1e-6
quantization) and dimensions are uniform (FIXTURES.md pins d=64).
numpy integer matmul WRAPS SILENTLY when the first is violated and
``np.stack`` raises an opaque ValueError for the second — both must
fail loudly with a diagnosable message instead.
"""

import pytest


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int")
    # one file -> one scan partition -> one Arrow batch, so the ragged
    # case exercises the within-batch guard (the guard is per-batch;
    # cross-batch dimension consistency is the documented d=64 input
    # invariant, see FIXTURES.md)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_gram_rejects_unnormalized_coordinates(spark, tmp_path):
    # |x| = 20.0 quantizes to 2e7 > the 9e6 int64-safe bound; the old
    # kernel would wrap partial sums silently at scale
    sf = _write_embeddings(spark, tmp_path, [
        (1, [20.0] * 64, 0), (2, [0.1] * 64, 1)])
    from kmr_spark.plans.linalg import emb_gram_matrix

    with pytest.raises(Exception, match="int64-safe bound"):
        emb_gram_matrix(spark, sf).collect()


def test_gram_rejects_ragged_dimensions(spark, tmp_path):
    sf = _write_embeddings(spark, tmp_path, [
        (1, [0.1] * 64, 0), (2, [0.2] * 32, 1)])
    from kmr_spark.plans.linalg import emb_gram_matrix

    with pytest.raises(Exception, match="uniform-dimension"):
        emb_gram_matrix(spark, sf).collect()


def test_gram_accepts_unit_coordinates(spark, tmp_path):
    # sanity: the guards must not reject valid unit-ish input
    sf = _write_embeddings(spark, tmp_path, [
        (1, [0.5] * 64, 0), (2, [-0.25] * 64, 1)])
    from kmr_spark.plans.linalg import emb_gram_matrix

    rows = emb_gram_matrix(spark, sf).collect()
    assert len(rows) == 64 * 65 // 2
    # cell (0,0): 500000^2 + 250000^2 summed over the two rows
    assert rows[0]["gram_micro2"] == 500000.0**2 + 250000.0**2
    assert rows[0]["n_rows"] == 2
