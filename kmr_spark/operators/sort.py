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
            materialize: bool = False,
            cache_registry: list[DataFrame] | None = None) -> DataFrame:
    """Global 0-based position under an explicit total order
    (kmr_ranking, src/kmrmoreops.c:764-805).

    Same algorithm as KMR (exscan of per-partition counts + local
    index), expressed Spark-first:

    1. range-partition + locally sort (``orderBy``) — persisted so the
       two downstream jobs see identical partitioning;
    2. count rows per partition (tiny collect — this is KMR's MPI_Exscan);
    3. narrow codegen projection adds offset + local index. No global
       window (which would serialize through one partition), no RDD
       round-trip, no Python boundary.

    The offset lookup keys on the execution-time partition id, which is
    only the SORT's partition index while the ranked frame is executed
    as its own job — a downstream ``union`` shifts the second child's
    task ids and every offset would silently miss (ranks restart per
    partition). Callers that compose the result into a wider plan must
    pass ``materialize=True``: the rows are computed immediately in
    their own job (correct ids), the lineage is cut, and the internal
    sort cache is released.

    ``materialize=True`` localCheckpoints the FULL ranked frame —
    correct only when the ranked rows themselves are the result
    (graysort). A caller that immediately REDUCES the ranked frame
    (zone maps, deciles) must not checkpoint the corpus (guide §5 —
    at 60M rows the checkpointed blocks OOM an 8g heap): pass
    ``cache_registry`` instead, aggregate while the sort cache is
    live, and ``materialize_release(small_result, *registry)`` —
    same pattern as :func:`ranking_per_group`.

    The offset add is PURE CODEGEN (guide §4.1: no Python boundary):
    rank = exscan_offset[partition] + in-partition row index, where the
    index comes from ``monotonically_increasing_id``'s documented
    layout (partition id in the upper bits, consecutive 0-based record
    number in the lower 33) and the offset from an array literal
    indexed by ``spark_partition_id`` — the previous ``mapInPandas``
    pass shipped every row out to Python workers and back through
    Arrow just to add this one column.
    """
    sdf = df.orderBy(*order).persist(StorageLevel.MEMORY_AND_DISK)
    if cache_registry is not None:
        cache_registry.append(sdf)
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

    n_parts = max(max(offsets, default=-1) + 1, 1)
    arr = F.array(*[F.lit(offsets.get(p, 0)).cast("long")
                    for p in range(n_parts)])
    pid = F.spark_partition_id()
    idx = (F.monotonically_increasing_id()
           - F.shiftleft(pid.cast("long"), 33))
    out = sdf.select(
        (F.element_at(arr, pid + F.lit(1)) + idx).alias("rank"), "*")
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
    |partitions|x|groups| rows) and add offsets in one narrow CODEGEN
    projection (literal-map lookup + in-partition record index — no
    Python boundary, guide §4.1). Adds ``rank`` (0-based within group)
    and ``n_group`` columns.

    Group keys must be null-free strings/ints/bools (they are rendered
    into the lookup keys with cast-to-string semantics on both sides);
    same partition-id caveat as :func:`ranking` — pass
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
    # per-(partition, group) count AND first in-partition row index
    # (min monotonically_increasing_id, masked): both jobs read the
    # SAME persisted sort, so the record numbers agree between this
    # pass and the output projection below
    mid_idx = (F.monotonically_increasing_id()
               - F.shiftleft(F.spark_partition_id().cast("long"), 33))
    counts = (
        sdf.select(F.spark_partition_id().alias("pid"), *gcols,
                   mid_idx.alias("__idx"))
        .groupBy("pid", *gcols)
        .agg(F.count("*").alias("count"), F.min("__idx").alias("start"))
        .collect()
    )
    totals: dict[tuple, int] = {}
    # adj = global-exscan offset of (pid, group) MINUS the group's
    # first in-partition row index, so rank = adj + in-partition index
    # — one codegen add per row, no Python boundary (guide §4.1; the
    # previous mapInPandas pass shipped the whole frame through Arrow)
    adj: dict[tuple, int] = {}
    for r in sorted(counts, key=lambda r: r["pid"]):
        key = tuple(r[c] for c in gcols)
        adj[(r["pid"],) + key] = totals.get(key, 0) - r["start"]
        totals[key] = totals.get(key, 0) + r["count"]

    # LITERAL MAP lookup keyed by "pid<US>group...": stays inside the
    # cached scan's codegen stage (a broadcast-join lookup measured
    # ~0.3-0.7 s SLOWER per query here — local-relation build + join
    # planning — and a map literal of |partitions|x|groups| entries is
    # KBs). Group values are rendered with Spark's own cast-to-string
    # on both sides, so the keys agree byte-for-byte.
    sep = "\x1f"
    key_of = F.concat_ws(
        sep, F.spark_partition_id().cast("string"),
        *[F.col(c).cast("string") for c in gcols])
    gkey_of = F.concat_ws(sep, *[F.col(c).cast("string") for c in gcols])

    def _str(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    adj_entries: list = []
    for pid_key, a in adj.items():
        k = sep.join([_str(pid_key[0])] + [_str(v) for v in pid_key[1:]])
        adj_entries += [F.lit(k), F.lit(int(a)).cast("long")]
    tot_entries: list = []
    for gkey, t in totals.items():
        tot_entries += [F.lit(sep.join(_str(v) for v in gkey)),
                        F.lit(int(t)).cast("long")]
    adj_map = F.create_map(*adj_entries) if adj_entries else F.create_map()
    tot_map = F.create_map(*tot_entries) if tot_entries else F.create_map()
    out = sdf.select(
        (F.element_at(adj_map, key_of) + mid_idx).alias("rank"),
        F.element_at(tot_map, gkey_of).alias("n_group"),
        "*")
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
