"""Table-maintenance operators: small-file diagnosis + compaction.

The operational reality of a 100 TB lake: streaming sinks, per-key
sinks (sources/files.py save_partitioned_by_key), and high-parallelism
writes leave thousands of KB-scale files; every subsequent scan then
pays one task + one open per file and the NameNode/listing cost grows
unbounded. The fix is a periodic compaction pass — read, re-balance to
a target file size, atomically swap. KMR's analog is the
file-reassembly path (reference src/kmrfiles.c:910 reassembly plans,
which stitch per-rank fragments back into few large files); Spark-first
this is a size-derived ``coalesce`` (NO shuffle — coalesce only merges
read partitions) or ``repartition`` when a partition column must also
be re-clustered.

Atomicity on a real object store comes from write-to-temp + rename;
here the temp dir + ``shutil`` swap models it and the tests assert
content equality + file-count reduction.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from kmr_spark.sources.files import enumerate_files

#: default compaction target (128 MiB — one HDFS/S3-friendly block)
TARGET_BYTES = 128 * 1024 * 1024


def _is_data_file(name: str) -> bool:
    """Exclude _SUCCESS/_metadata sidecars and .crc/.tmp dotfiles."""
    return not (name.startswith("_") or name.startswith("."))


def small_files_report(spark: SparkSession, path: str,
                       small_bytes: int = 4 * 1024 * 1024) -> DataFrame:
    """Per-directory small-file diagnosis over a table path:
    (dir, n_files, n_small, total_bytes, avg_bytes). Data files only
    (excludes _SUCCESS/_metadata sidecars and .crc dotfiles)."""
    from pyspark.sql import functions as F

    base = F.element_at(F.split("path", "/"), -1)
    files = enumerate_files(spark, [path]).filter(
        ~base.startswith("_") & ~base.startswith("."))
    return (
        files.select(
            F.expr("substring_index(path, '/', size(split(path, '/')) - 1)")
            .alias("dir"),
            "size")
        .groupBy("dir")
        .agg(F.count("*").alias("n_files"),
             F.sum((F.col("size") < small_bytes).cast("long"))
             .alias("n_small"),
             F.sum("size").alias("total_bytes"),
             (F.sum("size") / F.count("*")).alias("avg_bytes"))
        .orderBy("dir")
    )


def plan_compaction(spark: SparkSession, path: str,
                    target_bytes: int = TARGET_BYTES) -> int:
    """Number of output files a compaction of ``path`` should produce:
    ceil(total_data_bytes / target). Always >= 1."""
    total = sum(
        r.size for r in enumerate_files(spark, [path]).collect()
        if _is_data_file(os.path.basename(r.path)))
    return max(1, math.ceil(total / target_bytes))


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = TARGET_BYTES) -> int:
    """Compact a parquet table in place to ~``target_bytes`` files:
    read, ``coalesce`` to the size-derived count (narrow — no shuffle;
    each output task concatenates whole input partitions), write to a
    temp dir, atomically swap. Returns the output file count.

    Rows are preserved exactly (coalesce never drops/duplicates);
    ordering within files may change, as in any table compaction.
    """
    n_out = plan_compaction(spark, path, target_bytes)
    df = spark.read.parquet(path)
    tmp = tempfile.mkdtemp(prefix="kmr_compact_",
                           dir=os.path.dirname(os.path.abspath(path)))
    old = path.rstrip("/") + ".compact_old"
    try:
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        # a crashed previous run can leave the graveyard dir behind;
        # the data dir itself is intact in that case, so clearing the
        # leftover is safe and unblocks the swap
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    except Exception:
        # if the first rename landed but the second failed, the table
        # is gone from `path` and the new data is in tmp — restore the
        # graveyard copy BEFORE discarding tmp, or nothing survives
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return n_out


def selective_delete(spark: SparkSession, path: str, predicate: str) -> dict:
    """Right-to-be-forgotten rewrite: remove every row matching
    ``predicate`` (a SQL boolean expression) from a parquet table via
    the same write-temp-then-swap protocol as compaction — without a
    transactional table format this is THE erasure primitive (Delta's
    DELETE does the same rewrite under the hood). Returns an audit
    dict (rows_before / rows_deleted / rows_after) the compliance log
    stores. Output file count follows the compaction size targeting.
    """
    df = spark.read.parquet(path)
    rows_before = df.count()
    kept = df.filter(f"NOT ({predicate})")
    rows_after = kept.count()
    # size the output by the KEPT fraction, not the pre-delete bytes —
    # a delete removing most rows should not keep the old file count
    # (which would produce that many needlessly tiny files)
    n_out = plan_compaction(spark, path)
    if rows_before:
        n_out = max(1, math.ceil(n_out * rows_after / rows_before))
    tmp = tempfile.mkdtemp(prefix="kmr_delete_",
                           dir=os.path.dirname(os.path.abspath(path)))
    old = path.rstrip("/") + ".delete_old"
    try:
        kept.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    except Exception:
        # restore the graveyard copy before discarding tmp (see
        # compact_parquet) — otherwise a failed second rename loses
        # the table entirely
        if not os.path.exists(path) and os.path.exists(old):
            os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return {"rows_before": rows_before,
            "rows_deleted": rows_before - rows_after,
            "rows_after": rows_after}


def schema_drift(spark: SparkSession, old_path: str, new_path: str) -> DataFrame:
    """Schema diff between two parquet snapshots: one row per drifted
    column — (column, change ∈ {added, removed, type_changed},
    old_type, new_type). Empty result = schemas compatible. The check
    an ingest pipeline runs before appending a new day's data."""
    old = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(old_path).schema}
    new = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(new_path).schema}
    rows = []
    for c in sorted(set(old) | set(new)):
        if c not in new:
            rows.append((c, "removed", old[c], None))
        elif c not in old:
            rows.append((c, "added", None, new[c]))
        elif old[c] != new[c]:
            rows.append((c, "type_changed", old[c], new[c]))
    return spark.createDataFrame(
        rows, "column string, change string, old_type string, new_type string")
