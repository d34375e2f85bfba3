"""Ordering-family operators (reference: kmr_sort / ranking / limit,
SURVEY.md §2.6).

KMR's global sort is a sampling sort — sample keys, pick splitters,
route by range, sort locally (kmr_sort_large, reference
src/kmrmoreops.c:469-536). Spark's ``orderBy`` IS that algorithm
(RangePartitioner samples, then per-partition Tungsten sort), so the
global sort is a one-liner and the interesting parity work is ranking
and limit, which in KMR depend on rank order — here they take an
explicit ordering.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def global_sort(df: DataFrame, *order: str | Column) -> DataFrame:
    """Total order across partitions (kmr_sort, src/kmrmoreops.c:575-593).

    Output partition p holds keys <= partition p+1's keys — the same
    contract KMR's sampling sort provides, and what GraySort validation
    needs. Descending keys are ``F.desc(col)`` — no negate-and-byteswap
    key encoding (reference ex/tpch.c:3075-3080) needed.
    """
    return df.orderBy(*order)


def sort_locally(df: DataFrame, *order: str | Column) -> DataFrame:
    """Per-partition sort, no exchange (kmr_sort_locally,
    src/kmrbase.c:2051)."""
    return df.sortWithinPartitions(*order)


def is_globally_sorted(df: DataFrame, *order: str) -> bool:
    """kmr_assert_sorted (src/kmrutil.c:717): verify a total order.

    Distributed check: per-partition (min, max, sorted?) summaries, then
    a driver-side pass over the tiny summary list — no data collect.
    """
    cols = list(order)
    pid = df.select(F.spark_partition_id().alias("pid"), F.struct(*cols).alias("k"))
    summary = (
        pid.groupBy("pid")
        .agg(
            F.min("k").alias("lo"),
            F.max("k").alias("hi"),
            # within-partition sortedness: compare to the lag under pid order
            F.count("*").alias("n"),
        )
        .orderBy("pid")
        .collect()
    )
    prev_hi = None
    for r in summary:
        if prev_hi is not None and r["lo"] is not None and tuple(prev_hi) > tuple(r["lo"]):
            return False
        prev_hi = r["hi"]
    # per-partition local sortedness
    local = df.select(
        F.spark_partition_id().alias("pid"), F.struct(*cols).alias("k")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy(F.monotonically_increasing_id())
    bad = (
        local.withColumn("prev", F.lag("k").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("prev") > F.col("k")))
        .limit(1)
        .count()
    )
    return bad == 0


def ranking(df: DataFrame, order: list[str | Column],
            materialize: bool = False) -> DataFrame:
    """Global 0-based position under an explicit total order
    (kmr_ranking, src/kmrmoreops.c:764-805).

    Same algorithm as KMR (exscan of per-partition counts + local
    index), expressed Spark-first:

    1. range-partition + locally sort (``orderBy``) — persisted so the
       two downstream jobs see identical partitioning;
    2. count rows per partition (tiny collect — this is KMR's MPI_Exscan);
    3. narrow Arrow pass adds offset + local index. No global window
       (which would serialize through one partition) and no RDD
       round-trip.

    The offset lookup keys on ``TaskContext.partitionId()``, which is
    only the SORT's partition index while the ranked frame is executed
    as its own job — a downstream ``union`` shifts the second child's
    task ids and every offset would silently miss (ranks restart per
    partition). Callers that compose the result into a wider plan must
    pass ``materialize=True``: the rows are computed immediately in
    their own job (correct ids), the lineage is cut, and the internal
    sort cache is released.
    """
    sdf = df.orderBy(*order).persist(StorageLevel.MEMORY_AND_DISK)
    counts = (
        sdf.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["pid"]):
        offsets[r["pid"]] = acc
        acc += r["count"]

    out_schema = "rank long, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sdf.schema.fields
    )
    from pyspark import TaskContext

    # ship the exscan table as a broadcast, not a task closure: closure
    # capture re-pickles the dict into EVERY task; a broadcast is sent
    # once per executor (matters at high |partitions|)
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offsets = b_offsets.value
        pid = TaskContext.get().partitionId()
        pos = offsets.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf.insert(0, "rank", range(pos, pos + n))
            pos += n
            yield pdf

    out = sdf.mapInPandas(add_rank, schema=out_schema)
    if materialize:
        from kmr_spark.session import materialize_release

        return materialize_release(out, sdf)
    return out


def ranking_per_group(df: DataFrame, group_cols: list[str],
                      order: list[str | Column],
                      materialize: bool = False,
                      cache_registry: list[DataFrame] | None = None,
                      persist_input: bool = False) -> DataFrame:
    """Per-group 0-based rank + group size under an explicit total
    order, without a ``Window.partitionBy`` (kmr_ranking generalized;
    reference src/kmrmoreops.c:764-805 exscan shape).

    A rank window partitioned by a low-cardinality key (e.g. 5 event
    types) funnels the whole table through |groups| tasks. This keeps
    the data range-partitioned instead: sort by (group, order) — the
    RangePartitioner spreads each group across MANY partitions — then
    exscan per-(partition, group) counts driver-side (tiny: at most
    |partitions|x|groups| rows) and add offsets in one narrow Arrow
    pass. Adds ``rank`` (0-based within group) and ``n_group`` columns.

    Group keys must be null-free, hashable scalars (strings/ints);
    same TaskContext caveat as :func:`ranking` — pass
    ``materialize=True`` when composing into a union. With
    ``materialize=False`` the internal sorted persist stays live for
    the lazy result; callers composing several rankings can pass a
    ``cache_registry`` list to collect the persisted frames and
    release them all after one final materialization (cheaper than
    checkpointing each ranking separately).
    """
    gcols = list(group_cols)
    if persist_input:
        # the RangePartitioner's sampling job executes the upstream
        # plan once BEFORE the shuffle pass does — an expensive input
        # (JSON parse, hash pipeline) should be computed once and
        # sampled from cache
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(df)
    sdf = df.orderBy(*[F.col(c).asc() for c in gcols], *order).persist(
        StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(sdf)
    counts = (
        sdf.select(F.spark_partition_id().alias("pid"), *gcols)
        .groupBy("pid", *gcols)
        .count()
        .collect()
    )
    offsets: dict[tuple, int] = {}
    totals: dict[tuple, int] = {}
    for r in sorted(counts, key=lambda r: r["pid"]):
        key = tuple(r[c] for c in gcols)
        offsets[(r["pid"],) + key] = totals.get(key, 0)
        totals[key] = totals.get(key, 0) + r["count"]

    out_schema = "rank long, n_group long, " + ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sdf.schema.fields
    )
    from pyspark import TaskContext

    import numpy as np

    # broadcast the exscan tables (≤ |partitions|×|groups| entries):
    # closure capture would re-pickle them into every task
    b_tables = df.sparkSession.sparkContext.broadcast((offsets, totals))

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offsets, totals = b_tables.value
        pid = TaskContext.get().partitionId()
        seen: dict[tuple, int] = {}
        for pdf in batches:
            n = len(pdf)
            ranks = np.empty(n, dtype="int64")
            ngrp = np.empty(n, dtype="int64")
            if gcols:
                for key, idx in pdf.groupby(gcols, sort=False).indices.items():
                    kt = key if isinstance(key, tuple) else (key,)
                    base = offsets.get((pid,) + kt, 0) + seen.get(kt, 0)
                    ranks[idx] = base + np.arange(len(idx))
                    ngrp[idx] = totals.get(kt, 0)
                    seen[kt] = seen.get(kt, 0) + len(idx)
            else:
                base = offsets.get((pid,), 0) + seen.get((), 0)
                ranks[:] = base + np.arange(n)
                ngrp[:] = totals.get((), 0)
                seen[()] = seen.get((), 0) + n
            pdf = pdf.copy()
            pdf.insert(0, "n_group", ngrp)
            pdf.insert(0, "rank", ranks)
            yield pdf

    out = sdf.mapInPandas(add_rank, schema=out_schema)
    if materialize:
        from kmr_spark.session import materialize_release

        return materialize_release(out, sdf)
    return out


def ntile_from_rank(rn: Column, n: Column, k: int) -> Column:
    """Exact SQL NTILE(k) bucket from a 1-based rank ``rn`` and group
    size ``n`` — the first ``n % k`` buckets get ``n//k + 1`` rows, the
    rest ``n//k``. Lets a distributed exscan rank replace an NTILE
    window while staying value-identical to the window function.
    """
    q = F.floor(n / F.lit(k)).cast("long")
    r = n % F.lit(k)
    cut = r * (q + F.lit(1))
    # when n < k, q == 0 and rn <= cut always holds, so the q-division
    # branch is never evaluated (CaseWhen short-circuits per row)
    return (
        F.when(rn <= cut, F.floor((rn - 1) / (q + F.lit(1))) + F.lit(1))
        .otherwise(r + F.floor((rn - F.lit(1) - cut) / q) + F.lit(1))
        .cast("long")
    )


def choose_first_part(df: DataFrame, n: int, order: list[str | Column] | None = None) -> DataFrame:
    """Global LIMIT n (kmr_choose_first_part, src/kmrmoreops.c:1145-1163).

    KMR keeps the first n in rank order; Spark's limit after an explicit
    orderBy is the deterministic equivalent (TPC-H ``rownum <= 20``,
    reference ex/tpch.c:2932).
    """
    if order:
        df = df.orderBy(*order)
    return df.limit(n)


def top_k(df: DataFrame, k: int, *order: str | Column) -> DataFrame:
    """orderBy + limit — Spark plans this as TakeOrderedAndProject
    (per-partition heap + driver merge), the scalable top-k."""
    return df.orderBy(*order).limit(k)
