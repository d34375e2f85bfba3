"""External-program map/reduce (kmrrun parity).

The reference runs whole programs as mappers/reducers: shell commands
per pair (kmr_map_ms_commands, reference src/kmrmapms.c:2421), spawned
processes (kmr_map_via_spawn, src/kmrmapms.c:1992), and the kmrrun CLI
pipeline mapper -> kv-generator -> shuffle -> reducer
(kmrrun/kmrrun.c:4-63). The Spark-native equivalent is RDD.pipe: each
partition's rows stream through the external command's stdin/stdout.
MPI_Comm_spawn semantics are out of scope (SURVEY.md §7.3) — Spark's
executor model replaces dynamic process trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pipe_map(df: DataFrame, command: str, key: str = "key", value: str = "value") -> DataFrame:
    """Stream "key<TAB>value" lines through ``command``; parse the
    program's "key<TAB>value" stdout lines back into a KVS.

    One process per partition (not per pair — the reference amortizes
    the same way by batching commands per rank).
    """
    spark = df.sparkSession
    lines = df.select(
        F.concat_ws("\t", F.col(key).cast("string"), F.col(value).cast("string")).alias("line")
    )
    piped = lines.rdd.map(lambda r: r["line"]).pipe(command)
    out = piped.map(lambda s: s.split("\t", 1)).map(
        lambda kv: (kv[0], kv[1] if len(kv) > 1 else ""))
    return spark.createDataFrame(out, "key string, value string")


def pipe_per_key_reduce(df: DataFrame, command: str, key: str = "key", value: str = "value") -> DataFrame:
    """kmrrun reducer parity: group values per key, feed each key's
    values as consecutive "key<TAB>value" lines through ``command``
    (one invocation per partition after a shuffle on key, so a key's
    lines arrive contiguously like kmrrun's per-key files)."""
    spark = df.sparkSession
    grouped = (
        df.repartition(F.col(key))
        .sortWithinPartitions(key)
        .select(F.concat_ws("\t", F.col(key).cast("string"), F.col(value).cast("string")).alias("line"))
    )
    piped = grouped.rdd.map(lambda r: r["line"]).pipe(command)
    out = piped.map(lambda s: s.split("\t", 1)).map(
        lambda kv: (kv[0], kv[1] if len(kv) > 1 else ""))
    return spark.createDataFrame(out, "key string, value string")


def kmrrun_pipeline(
    spark: SparkSession,
    input_path: str,
    mapper: str,
    kvgen: str | None = None,
    reducer: str | None = None,
    out_dir: str | None = None,
) -> DataFrame:
    """One-command kmrrun parity (reference kmrrun/kmrrun.c:4-63):
    mapper program -> key-value generator program -> shuffle -> reducer
    program -> per-key sink. Map-only when no reducer (the reference
    supports the same). Lines are TAB-separated "key<TAB>value" (the
    reference uses space-separated per-key files; TAB matches this
    package's pipe operators and survives keys with spaces).

    Each program runs once per partition with that partition's lines on
    stdin (kmrrun amortizes the same way, batching per rank); the
    shuffle before the reducer guarantees every key's lines reach
    exactly one reducer invocation contiguously.
    """
    lines = spark.read.text(input_path).rdd.map(lambda r: r["value"])
    mapped = lines.pipe(mapper)
    if kvgen:
        mapped = mapped.pipe(kvgen)
    kv = mapped.map(lambda s: s.split("\t", 1)).map(
        lambda p: (p[0], p[1] if len(p) > 1 else ""))
    df = spark.createDataFrame(kv, "key string, value string")
    if reducer:
        df = pipe_per_key_reduce(df, reducer)
    if out_dir:
        from kmr_spark.sources.files import save_partitioned_by_key

        save_partitioned_by_key(df, out_dir)
    return df
