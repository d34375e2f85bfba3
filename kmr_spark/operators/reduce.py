"""Aggregation-family operators (reference: kmr_reduce and friends,
SURVEY.md §2.5).

KMR's redfn sees *all* values of a key at once (kmr_redfn_t, reference
src/kmr.h:740-748) — the direct Spark analogue is grouped-map
``applyInPandas`` (same all-in-memory-per-group caveat). But most real
aggregations are expressible, and the expressible path gets map-side
partial aggregation for free (KMR's "reduce without shuffle is a
combiner" idiom, src/kmrbase.c:2590-2604, is automatic in
HashAggregateExec).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reduce_pairs(
    df: DataFrame,
    fn: Callable[[Any, list[Any]], list[tuple[Any, Any]]],
    schema: str = "key long, value long",
    key: str = "key",
    value: str = "value",
) -> DataFrame:
    """Arbitrary redfn over the full value array of each key
    (kmr_reduce, src/kmrbase.c:2607-2676).

    Grouped-map applyInPandas: one Arrow batch per key group. Same
    memory model as KMR (a group must fit in one worker's memory).
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        names = [f.split()[0].strip() for f in schema.split(",")]
        k = pdf[key].iloc[0]
        out = fn(k, list(pdf[value]))
        return pd.DataFrame(out, columns=names[:2]) if out else pd.DataFrame(
            {names[0]: [], names[1]: []})

    return df.groupBy(key).applyInPandas(run, schema=schema)


def reduce_expr(df: DataFrame, aggs: list[Column], key: str = "key") -> DataFrame:
    """Expression-based reduce — the fast path (JVM partial aggregation)."""
    return df.groupBy(key).agg(*aggs)


def reduce_as_one(df: DataFrame, aggs: list[Column]) -> DataFrame:
    """Whole-input single group (kmr_reduce_as_one, src/kmrbase.c:2683)."""
    return df.agg(*aggs)


def count_keys(df: DataFrame, key: str = "key") -> DataFrame:
    """(key, count) — kmr_count_keys (src/kmrmoreops.c:1009-1024).
    Spark does the local-combine + final-sum split automatically."""
    return df.groupBy(key).agg(F.count("*").alias("count"))


def get_element_count(df: DataFrame) -> int:
    """Global COUNT(*) (kmr_get_element_count, src/kmrmoreops.c:114)."""
    return df.count()


def scan_locally(df: DataFrame, value: str = "value", partition_by: str | None = None,
                 order: list[str | Column] | None = None) -> DataFrame:
    """Non-inclusive running sum within a partition-group
    (kmr_scan_locally, src/kmrbase.c:2962-3021).

    KMR scans in local insertion order; Spark needs an explicit order.
    """
    w = Window.orderBy(*(order or [value]))
    if partition_by:
        w = Window.partitionBy(partition_by).orderBy(*(order or [value]))
    w = w.rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn("scan", F.coalesce(F.sum(value).over(w), F.lit(0)))


def scan_on_values(df: DataFrame, value: str = "value",
                   order: list[str | Column] | None = None) -> DataFrame:
    """Global non-inclusive prefix sum + grand total
    (kmr_scan_on_values, src/kmrmoreops.c:943-972).

    Scale note: a single global window is one partition; for the 100 TB
    path use the two-phase form KMR itself uses — per-partition totals,
    driver-side exclusive scan of the (tiny) totals, seed-carrying local
    scans. That is exactly ``ranking``'s implementation strategy; here
    the window form is kept because prefix scans in queries are almost
    always per-group (see scan_locally), and the global form is a
    parity/debug surface.
    """
    w = Window.orderBy(*(order or [value])).rowsBetween(Window.unboundedPreceding, -1)
    total = df.agg(F.sum(value).alias("total"))
    return (
        df.withColumn("scan", F.coalesce(F.sum(value).over(w), F.lit(0)))
        .crossJoin(F.broadcast(total))
    )


def scan_distributed(df: DataFrame, value: str | list[str],
                     order: list[str | Column]) -> DataFrame:
    """Global NON-INCLUSIVE prefix sum at scale — the two-phase exscan
    KMR itself uses (MPI_Exscan over per-rank totals,
    src/kmrmoreops.c:943) and the strategy operators/sort.ranking
    already applies to row counts, generalized to an integer measure:

    1. range-partition + locally sort (orderBy, persisted);
    2. collect per-partition SUMS (tiny — one long per partition);
    3. exclusive-scan the sums on the driver, then a narrow Arrow pass
       adds partition offset + local running sum.

    No single-partition global window anywhere, so this is the form
    that survives 100 TB (scan_on_values stays as the windowed
    parity/debug surface). The measure column must be integral —
    float prefix sums would be partition-order-dependent.

    The result is materialized before returning (ranking's task-id
    caveat: the offset lookup is only valid while the sorted frame runs
    as its own job), so callers can compose it freely.
    """
    from pyspark import TaskContext
    from pyspark.storagelevel import StorageLevel

    from kmr_spark.session import materialize_release

    values = [value] if isinstance(value, str) else list(value)
    sdf = df.orderBy(*order).persist(StorageLevel.MEMORY_AND_DISK)
    totals = (
        sdf.select(F.spark_partition_id().alias("pid"),
                   *[F.col(v) for v in values])
        .groupBy("pid").agg(*[F.sum(v).alias(v) for v in values])
        .collect()
    )
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(values)
    for r in sorted(totals, key=lambda r: r["pid"]):
        offsets[r["pid"]] = list(acc)
        acc = [a + r[v] for a, v in zip(acc, values)]

    scan_cols = [f"scan_{v}" if len(values) > 1 else "scan"
                 for v in values]
    out_schema = ", ".join(f"{c} long" for c in scan_cols) + ", " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sdf.schema.fields)

    # broadcast the exscan offsets (one list per partition): closure
    # capture would re-pickle the dict into every task
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    def add_scan(batches):
        offsets = b_offsets.value
        pid = TaskContext.get().partitionId()
        pos = list(offsets.get(pid, [0] * len(values)))
        for pdf in batches:
            out = pdf.copy()
            for j, (v, c) in enumerate(zip(values, scan_cols)):
                vals = pdf[v].to_numpy()
                csum = vals.cumsum()
                # non-inclusive: shift the inclusive cumsum right by one
                out.insert(j, c, pos[j] + csum - vals)
                pos[j] += int(csum[-1]) if len(vals) else 0
            yield out

    out = sdf.mapInPandas(add_scan, schema=out_schema)
    return materialize_release(out, sdf)


def scan_max_distributed(df: DataFrame, value: str,
                         order: list[str | Column]) -> DataFrame:
    """Global NON-INCLUSIVE prefix MAX at scale — the sum exscan above
    generalized to the max monoid (KMR's MPI_Exscan accepts any op;
    src/kmrmoreops.c:943). The first row in the global order gets NULL
    (no prior element — max has no integer identity the data can't
    collide with). Same three-phase shape: range-partition sort,
    collect per-partition maxes (one long each), driver exscan, narrow
    Arrow pass. Powers watermark-lateness audits: "the largest
    timestamp seen BEFORE this row arrived".

    The measure must be integral; the result column is ``scan_max``
    (nullable long), materialized before returning (task-id caveat,
    see :func:`scan_distributed`).
    """
    from pyspark import TaskContext
    from pyspark.storagelevel import StorageLevel

    from kmr_spark.session import materialize_release

    import numpy as np
    import pandas as pd

    sdf = df.orderBy(*order).persist(StorageLevel.MEMORY_AND_DISK)
    totals = (
        sdf.select(F.spark_partition_id().alias("pid"), F.col(value))
        .groupBy("pid").agg(F.max(value).alias("m"))
        .collect()
    )
    prefix: dict[int, int | None] = {}
    acc: int | None = None
    for r in sorted(totals, key=lambda r: r["pid"]):
        prefix[r["pid"]] = acc
        if r["m"] is not None:
            acc = r["m"] if acc is None else max(acc, r["m"])

    out_schema = "scan_max long, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sdf.schema.fields)
    b_prefix = df.sparkSession.sparkContext.broadcast(prefix)

    def add_scan(batches):
        prefix = b_prefix.value
        pid = TaskContext.get().partitionId()
        pos = prefix.get(pid)
        for pdf in batches:
            n = len(pdf)
            out = pdf.copy()
            if n == 0:
                out.insert(0, "scan_max", pd.array([], dtype="Int64"))
                yield out
                continue
            vals = pdf[value].to_numpy()
            incl = np.maximum.accumulate(vals)
            cells = [pos] + [
                (int(incl[i - 1]) if pos is None
                 else max(pos, int(incl[i - 1]))) for i in range(1, n)]
            out.insert(0, "scan_max", pd.array(cells, dtype="Int64"))
            pos = int(incl[-1]) if pos is None else max(pos, int(incl[-1]))
            yield out

    out = sdf.mapInPandas(add_scan, schema=out_schema)
    return materialize_release(out, sdf)
