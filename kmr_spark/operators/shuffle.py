"""Exchange-family operators (reference: kmr_shuffle / replicate /
distribute / concatenate, SURVEY.md §2.3).

In KMR the shuffle is an explicit collective (hash by key, MPI alltoallv —
reference src/kmrbase.c:2094). In Spark the shuffle is *implicit* in
groupBy/join; these operators exist for parity and for the cases where an
explicit re-distribution genuinely helps (co-locating a reused key,
leveling skew before an expensive map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle(df: DataFrame, key: str | Column = "key", num_partitions: int | None = None) -> DataFrame:
    """Hash-partition by key (kmr_shuffle, src/kmrbase.c:2094-2230).

    ``repartition(col)`` is Spark's HashPartitioning — same idea as KMR's
    ``kmr_hash_key`` mod nprocs (src/kmrbase.c:1611). Usually unnecessary
    (groupBy/join shuffle on their own), but explicit pre-partitioning
    lets a chain of same-key operations reuse one exchange.
    """
    col = F.col(key) if isinstance(key, str) else key
    if num_partitions is None:
        return df.repartition(col)
    return df.repartition(num_partitions, col)


def replicate(df: DataFrame, rank_zero: bool = False):
    """All-gather (kmr_replicate, src/kmrbase.c:2240-2350).

    KMR copies every pair to every rank; the Spark-native equivalents are
    (a) `F.broadcast(df)` as a join input — returned here — or (b) a
    driver-side collect when ``rank_zero`` (KMR's rank_zero option).
    Never materialize a big side this way: at 100 TB the correct tool is
    a broadcast *join* of a small side only.
    """
    if rank_zero:
        return df.collect()
    return F.broadcast(df)


def distribute(df: DataFrame, num_partitions: int) -> DataFrame:
    """Round-robin re-balance to equal per-partition counts
    (kmr_distribute, src/kmrmoreops.c:835-865)."""
    return df.repartition(num_partitions)


def concatenate(*dfs: DataFrame) -> DataFrame:
    """Union by name (kmr_concatenate_kvs, src/kmrbase.c:2754-2810).

    KMR's version is O(1) block-list splicing; Spark's union is likewise
    a zero-shuffle lineage node.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def shuffle_leveling_pair_count(df: DataFrame, key: str = "key", num_partitions: int | None = None) -> DataFrame:
    """Skew-aware exchange: balance rows-per-partition while keeping equal
    keys together (kmr_shuffle_leveling_pair_count, src/kmrmoreops.c:1074).

    KMR counts per key, prefix-scans, and cuts by cumulative count.
    Spark's ``repartitionByRange`` does exactly this via reservoir
    sampling (RangePartitioner), with AQE skew handling on top — so the
    scalable translation is a range exchange, not a hand-built scan.
    """
    if num_partitions is None:
        return df.repartitionByRange(F.col(key))
    return df.repartitionByRange(num_partitions, F.col(key))


def histogram_count_by_ranks(df: DataFrame) -> DataFrame:
    """Per-partition element counts (kmr_histogram_count_by_ranks,
    src/kmrmoreops.c:1569-1634) — the skew diagnostic."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(F.count("*").alias("count"))
        .orderBy("partition")
    )


def local_element_counts(df: DataFrame) -> list[int]:
    """kmr_local_element_count per rank (src/kmrutil.c:349), as a list."""
    return [r["count"] for r in histogram_count_by_ranks(df).collect()]
