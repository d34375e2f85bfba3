"""File sources and sinks.

The reference reads line-oriented text with mapper-side parsing
(kmr_map_getline, reference src/kmrfiles.c:1561), enumerates file trees
into a KVS (kmr_file_enumerate, src/kmrfiles.c:1157), and marshals KVSes
to byte buffers (kmr_save_kvs, src/kmrbase.c:1026). Spark equivalents:
splittable distributed reads, path globbing, parquet. Locality-aware
assignment (kmr_assign_file + Lustre stripes, src/kmriolb.c:257) is
subsumed by Spark's locality scheduling and has no object-storage
analogue, so no surface is provided.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enumerate_files(spark: SparkSession, roots: list[str], recursive: bool = True) -> DataFrame:
    """(path, size) DataFrame for every file under ``roots``
    (kmr_file_enumerate parity: expand dirs, keep files)."""
    rows = []
    for root in roots:
        if os.path.isfile(root):
            rows.append((root, os.path.getsize(root)))
        else:
            if recursive:
                for dirpath, _dirs, names in os.walk(root):
                    for n in sorted(names):
                        p = os.path.join(dirpath, n)
                        rows.append((p, os.path.getsize(p)))
            else:
                for n in sorted(os.listdir(root)):
                    p = os.path.join(root, n)
                    if os.path.isfile(p):
                        rows.append((p, os.path.getsize(p)))
    return spark.createDataFrame(rows, "path string, size long")


def read_text_lines(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """(path, line) — kmr_map_getline parity: one row per text line,
    with the originating file name (distributed, splittable read)."""
    df = spark.read.text(paths)
    return df.select(F.input_file_name().alias("path"), F.col("value").alias("line"))


def read_csv_table(spark: SparkSession, path: str, schema: str, sep: str = "|") -> DataFrame:
    """Delimited text -> typed rows: the reference's TPC-H table scan
    (scan_columns over '|'-separated .tbl files, ex/tpch.c:1056) as a
    declarative CSV read with explicit schema (no inference pass)."""
    return spark.read.csv(path, schema=schema, sep=sep)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines -> typed rows. An explicit schema skips the inference
    scan (two passes over 100 TB otherwise); when omitted, Spark
    samples per spark.sql.sources.json.samplingRatio."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def save_jsonl(df: DataFrame, path: str) -> None:
    """Rows -> JSON-lines (splittable text, one object per line) — the
    interchange sink for downstream non-Spark consumers."""
    df.write.mode("overwrite").json(path)


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """(path, modificationTime, length, content) — binary payload source
    for the multimodal pipeline (kmr_map_file_names parity where the
    mapfn reads whole files)."""
    return spark.read.format("binaryFile").load(path_glob)


def save_partitioned_by_key(df: DataFrame, path: str, key: str = "key") -> None:
    """Per-key output files — the kmrrun sink (shuffled pairs written as
    per-key files consumed by reducer programs, kmrrun/kmrrun.c:14-18)."""
    df.write.mode("overwrite").partitionBy(key).parquet(path)


def save_kvs(df: DataFrame, path: str) -> None:
    """kmr_save_kvs -> parquet (columnar, splittable, self-describing)."""
    df.write.mode("overwrite").parquet(path)


def restore_kvs(spark: SparkSession, path: str) -> DataFrame:
    """kmr_restore_kvs <- parquet."""
    return spark.read.parquet(path)


def save_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the second columnar format (Hive-ecosystem twin of
    the parquet kmr_save_kvs path; same splittable/self-describing
    contract, native vectorized reader)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source with the same pushdown/pruning properties as parquet
    (predicate pushdown + column pruning ride the format's stripe
    statistics)."""
    return spark.read.orc(path)
