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
    3. add the exscan offset (array literal indexed by
       ``spark_partition_id`` — ranking's codegen recipe) plus the
       in-partition running sum from a window PARTITIONED BY the
       cached sort's partition id, ordered by the in-partition record
       number (``monotonically_increasing_id``'s documented layout).

    Step 3 is pure JVM (guide §4.1): the previous form shipped every
    ranked row JVM->Arrow->Python->JVM through a ``mapInPandas`` pass
    just to add the running-sum columns.  The per-pid window costs one
    hash exchange of the (already aggregated) input — each window
    group is exactly one sort partition, so parallelism and peak
    memory match the sort's, at any scale.

    No single-partition global window anywhere, so this is the form
    that survives 100 TB (scan_on_values stays as the windowed
    parity/debug surface). The measure column must be integral —
    float prefix sums would be partition-order-dependent.

    The result is materialized before returning (ranking's task-id
    caveat: the offset/pid columns are only the sort's partition index
    while the sorted frame executes through the persisted scan), so
    callers can compose it freely.
    """
    from pyspark.sql import Window
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
    n_parts = max(max(offsets, default=-1) + 1, 1)
    arrs = [
        F.array(*[F.lit(offsets.get(p, [0] * len(values))[j]).cast("long")
                  for p in range(n_parts)])
        for j in range(len(values))
    ]
    base = sdf.select(F.spark_partition_id().alias("__pid"),
                      F.monotonically_increasing_id().alias("__mid"), "*")
    w = (Window.partitionBy("__pid").orderBy("__mid")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = base.select(
        *[(F.element_at(arr, F.col("__pid") + 1)
           + F.coalesce(F.sum(v).over(w), F.lit(0))).cast("long").alias(c)
          for arr, v, c in zip(arrs, values, scan_cols)],
        *[F.col(f.name) for f in sdf.schema.fields])
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
    see :func:`scan_distributed`).  Same pure-JVM step 3 as
    :func:`scan_distributed` (guide §4.1): exscan prefix-max from an
    array literal (NULL for the first partition — max has no integer
    identity), in-partition prefix max from a per-pid window;
    ``greatest`` skips NULLs, so the first global row stays NULL.
    """
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from kmr_spark.session import materialize_release

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

    n_parts = max(max(prefix, default=-1) + 1, 1)
    arr = F.array(*[F.lit(prefix.get(p)).cast("long")
                    for p in range(n_parts)])
    base = sdf.select(F.spark_partition_id().alias("__pid"),
                      F.monotonically_increasing_id().alias("__mid"), "*")
    w = (Window.partitionBy("__pid").orderBy("__mid")
         .rowsBetween(Window.unboundedPreceding, -1))
    out = base.select(
        F.greatest(F.element_at(arr, F.col("__pid") + 1),
                   F.max(value).over(w)).cast("long").alias("scan_max"),
        *[F.col(f.name) for f in sdf.schema.fields])
    return materialize_release(out, sdf)
