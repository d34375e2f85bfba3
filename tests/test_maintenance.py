"""Small-file compaction + diagnosis (operators/maintenance.py)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from kmr_spark.operators.maintenance import (
    compact_parquet,
    plan_compaction,
    small_files_report,
)


def _data_files(path: str) -> list[str]:
    return [p for p in glob.glob(f"{path}/**/*", recursive=True)
            if "/_" not in p and not p.endswith((".crc", "_SUCCESS"))
            and p.endswith(".parquet")]


def test_compaction_shrinks_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).selectExpr("id", "id % 13 AS k")
    df.repartition(64).write.parquet(path)  # 64 tiny fragments
    assert len(_data_files(path)) == 64
    before = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())

    n_out = compact_parquet(spark, path, target_bytes=10**9)
    assert n_out == 1
    assert len(_data_files(path)) == 1
    after = sorted((r.id, r.k) for r in spark.read.parquet(path).collect())
    assert after == before


def test_plan_compaction_scales_with_target(spark, tmp_path):
    path = str(tmp_path / "sized")
    spark.range(50_000).selectExpr(
        "id", "CAST(id AS STRING) AS s").repartition(8).write.parquet(path)
    import os

    from kmr_spark.operators.maintenance import _is_data_file
    from kmr_spark.sources.files import enumerate_files

    total = sum(
        r.size for r in enumerate_files(spark, [path]).collect()
        if _is_data_file(os.path.basename(r.path)))
    assert plan_compaction(spark, path, target_bytes=total + 1) == 1
    n = plan_compaction(spark, path, target_bytes=max(1, total // 4))
    assert 4 <= n <= 5


def test_small_files_report_counts(spark, tmp_path):
    path = str(tmp_path / "rep")
    spark.range(1000).repartition(16).write.parquet(path)
    rep = small_files_report(spark, path, small_bytes=10**9).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_files == 16 and r.n_small == 16
    assert r.total_bytes > 0 and abs(
        r.avg_bytes - r.total_bytes / r.n_files) < 1e-6


def test_compaction_failure_leaves_source_intact(spark, tmp_path):
    import pytest

    path = str(tmp_path / "keep")
    spark.range(100).write.parquet(path)
    before = len(_data_files(path))
    # unwritable target_bytes type triggers the pre-write failure path
    with pytest.raises(TypeError):
        compact_parquet(spark, path, target_bytes="not-a-number")
    assert len(_data_files(path)) == before
    assert spark.read.parquet(path).count() == 100


def test_trimmed_mean_udaf_matches_python(spark):
    """Grouped-agg pandas UDAF == pure-Python trimmed mean per group
    (the kmr_reduce full-value-array redfn shape, §2.9)."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from kmr_spark.functions.udafs import TRIM_FRAC, trimmed_mean_col

    rows = [(i % 5, float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {r.k: r.tm for r in df.groupBy("k")
           .agg(trimmed_mean_col(F.col("v")).alias("tm")).collect()}

    groups = defaultdict(list)
    for k, v in rows:
        groups[k].append(v)
    for k, vs in groups.items():
        vs.sort()
        t = int(len(vs) * TRIM_FRAC)
        if 2 * t >= len(vs):
            t = 0
        expect = sum(vs[t:len(vs) - t]) / (len(vs) - 2 * t)
        assert math.isclose(got[k], expect, rel_tol=1e-12), (k, got[k], expect)


def test_trimmed_mean_tiny_groups_fall_back_to_mean(spark):
    from pyspark.sql import functions as F

    from kmr_spark.functions.udafs import trimmed_mean_col

    df = spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], ["k", "v"])
    got = {r.k: r.tm for r in df.groupBy("k")
           .agg(trimmed_mean_col(F.col("v")).alias("tm")).collect()}
    assert got[1] == 15.0 and got[2] == 5.0


def test_selective_delete_erases_and_audits(spark, tmp_path):
    from kmr_spark.operators.maintenance import selective_delete

    path = str(tmp_path / "users")
    spark.range(1000).selectExpr("id AS user_id", "id % 7 AS grp") \
        .repartition(8).write.parquet(path)
    audit = selective_delete(spark, path, "user_id % 10 = 3")
    assert audit == {"rows_before": 1000, "rows_deleted": 100,
                     "rows_after": 900}
    back = spark.read.parquet(path)
    assert back.count() == 900
    assert back.filter("user_id % 10 = 3").count() == 0


def test_schema_drift_reports_all_change_kinds(spark, tmp_path):
    from kmr_spark.operators.maintenance import schema_drift

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    spark.range(5).selectExpr("id", "CAST(id AS INT) AS a", "'x' AS gone") \
        .write.parquet(old_p)
    spark.range(5).selectExpr("id", "CAST(id AS DOUBLE) AS a",
                              "1.5 AS fresh").write.parquet(new_p)
    drift = {(r.column, r.change) for r in
             schema_drift(spark, old_p, new_p).collect()}
    assert drift == {("gone", "removed"), ("fresh", "added"),
                     ("a", "type_changed")}
    same = schema_drift(spark, old_p, old_p)
    assert same.count() == 0
