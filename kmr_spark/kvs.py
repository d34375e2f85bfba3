"""KVS — the typed key-value stream facade (reference KMR_KVS parity).

The reference's single data abstraction is a typed, partitioned multiset
of key-value pairs manipulated by eager collectives (KMR_KVS, reference
src/kmr.h:460-543; kmr4py KVS methods, python3/kmr4py.py:629-1355).
Here a KVS wraps a two-column DataFrame ``(key, value)``:

- typed fields: LongType / DoubleType / StringType / BinaryType map to
  KMR's INTEGER / FLOAT8 / CSTRING / OPAQUE with matching sort orders
  (SURVEY.md §4.2: BinaryType sorts memcmp-style, DoubleType is IEEE
  total order — the two properties KMR engineers by hand).
- operations return NEW KVS objects over lazy lineage. KMR's
  consume-on-use discipline (src/kmr.h:466-470) exists because eager
  materialization must free memory; lazy lineage makes it a no-op, which
  is strictly more general.

Chains like ``kvs.map(f).shuffle().reduce(g).sort()`` therefore build
one Catalyst plan that fuses, pushes down and broadcast-optimizes the
whole pipeline — the optimization KMR users do by hand.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kmr_spark.operators import mapping, reduce as red, search, shuffle as ex, sort as so


class KVS:
    """A typed key-value stream over a (key, value) DataFrame."""

    def __init__(self, df: DataFrame, key: str = "key", value: str = "value"):
        self.df = df
        self.key = key
        self.value = value

    # ---- construction (kmr_create_kvs + add_kv, src/kmrbase.c:568) ----

    @classmethod
    def from_pairs(
        cls,
        spark: SparkSession,
        pairs: Iterable[tuple[Any, Any]],
        schema: str = "key long, value string",
    ) -> "KVS":
        return cls(spark.createDataFrame(list(pairs), schema=schema))

    @classmethod
    def from_columns(cls, df: DataFrame, key: str | Column, value: str | Column) -> "KVS":
        k = F.col(key) if isinstance(key, str) else key
        v = F.col(value) if isinstance(value, str) else value
        return cls(df.select(k.alias("key"), v.alias("value")))

    def _wrap(self, df: DataFrame) -> "KVS":
        return KVS(df, self.key, self.value)

    # ---- map family ----

    def map(self, fn: Callable[[Any, Any], Iterable[tuple[Any, Any]]],
            schema: str = "key long, value string") -> "KVS":
        """Arbitrary Python mapfn (kmr_map): 0..n output pairs per pair."""
        return KVS(mapping.map_pairs(self.df, fn, schema))

    def map_expr(self, key_expr: Column, value_expr: Column) -> "KVS":
        """Expression map — the JVM fast path; prefer over map()."""
        return self._wrap(self.df.select(key_expr.alias("key"), value_expr.alias("value")))

    def filter(self, pred: Column) -> "KVS":
        return self._wrap(self.df.filter(pred))

    def reverse(self) -> "KVS":
        return self._wrap(mapping.reverse(self.df, self.key, self.value))

    def pairing(self) -> "KVS":
        return self._wrap(mapping.pairing(self.df, self.key, self.value))

    def unpairing(self) -> "KVS":
        return self._wrap(mapping.unpairing(self.df, self.value))

    # ---- exchange family ----

    def shuffle(self, num_partitions: int | None = None) -> "KVS":
        return self._wrap(ex.shuffle(self.df, self.key, num_partitions))

    def replicate(self):
        """Broadcast-marked DataFrame (or use .collect() for rank-zero)."""
        return ex.replicate(self.df)

    def distribute(self, num_partitions: int) -> "KVS":
        return self._wrap(ex.distribute(self.df, num_partitions))

    def concatenate(self, *others: "KVS") -> "KVS":
        return self._wrap(ex.concatenate(self.df, *[o.df for o in others]))

    # ---- reduce family ----

    def reduce(self, fn: Callable[[Any, list], list[tuple[Any, Any]]],
               schema: str = "key long, value long") -> "KVS":
        return KVS(red.reduce_pairs(self.df, fn, schema, self.key, self.value))

    def reduce_expr(self, *aggs: Column) -> "KVS":
        return self._wrap(red.reduce_expr(self.df, list(aggs), self.key))

    def count_keys(self) -> DataFrame:
        return red.count_keys(self.df, self.key)

    def get_element_count(self) -> int:
        return red.get_element_count(self.df)

    # ---- order family ----

    def sort(self, descending: bool = False) -> "KVS":
        order = F.col(self.key).desc() if descending else F.col(self.key).asc()
        return self._wrap(so.global_sort(self.df, order))

    def sort_locally(self) -> "KVS":
        return self._wrap(so.sort_locally(self.df, self.key))

    def ranking(self) -> DataFrame:
        return so.ranking(self.df, [self.key])

    def limit(self, n: int) -> "KVS":
        return self._wrap(self.df.limit(n))

    def top_k(self, k: int, descending: bool = True) -> "KVS":
        order = F.col(self.key).desc() if descending else F.col(self.key).asc()
        return self._wrap(so.top_k(self.df, k, order))

    def map_for_some(self, fn: Callable[[Any, Any], Iterable[tuple[Any, Any]]],
                     schema: str = "key long, value string") -> "KVS":
        """Stop once any output exists (kmr_map_for_some,
        src/kmrmoreops.c:1170) — lazy limit(1) over the mapped stream;
        Spark only computes the partitions needed to satisfy it."""
        return self.map(fn, schema).limit(1)

    def reduce_for_some(self, fn: Callable[[Any, list], list[tuple[Any, Any]]],
                        schema: str = "key long, value long") -> "KVS":
        """First reduce output only (kmr_reduce_for_some,
        src/kmrmoreops.c:1183)."""
        return self.reduce(fn, schema).limit(1)

    def shuffle_leveling(self, num_partitions: int | None = None) -> "KVS":
        """Skew-aware exchange (kmr_shuffle_leveling_pair_count,
        src/kmrmoreops.c:1074): range partitioning balances row counts
        while keeping equal keys together."""
        return self._wrap(ex.shuffle_leveling_pair_count(self.df, self.key, num_partitions))

    def histogram_by_partition(self) -> DataFrame:
        """Per-partition counts (kmr_histogram_count_by_ranks)."""
        return ex.histogram_count_by_ranks(self.df)

    # ---- search ----

    def find_key(self, k: Any) -> list:
        return search.find_key(self.df, k, self.key)

    def take_one(self):
        return search.take_one(self.df)

    def checkpoint(self, eager: bool = True, durable: bool = False,
                   path: str | None = None) -> "KVS":
        """Truncate lineage (kmrckpt.c parity — reference checkpoints
        every KVS to disk per operation, src/kmrckpt.c). Spark's
        lineage makes routine checkpointing unnecessary; use this at
        iteration boundaries of long loops where lineage growth or
        recompute cost matters.

        ``durable=False``: executor-local localCheckpoint — fast, lost
        with the process, exactly KMR's no-fsync mode.

        ``durable=True`` (requires ``path``): materialize to parquet on
        shared storage and re-read — the state survives a full
        application restart and any session can restore it, which is
        kmrckpt's restart guarantee (src/kmrckpt.c restart-and-merge).
        Parquet's _SUCCESS marker doubles as the commit record:
        ``checkpoint_or_build`` consults it to skip recompute on
        restart. (Spark's own reliable RDD checkpoint files are not
        readable across applications, so a self-describing columnar
        write is the Spark-first durable form.)"""
        if durable:
            if not path:
                raise ValueError("durable checkpoint requires a path")
            self.save(path)
            return KVS.restore(self.df.sparkSession, path)
        return self._wrap(self.df.localCheckpoint(eager=eager))

    @classmethod
    def checkpoint_or_build(cls, spark: SparkSession, path: str,
                            build: Callable[[], "KVS"]) -> "KVS":
        """Restart semantics (kmrckpt.c): if ``path`` holds a COMMITTED
        durable checkpoint (parquet _SUCCESS marker), restore it and
        skip the computation entirely; otherwise run ``build``, commit
        its result to ``path``, and return the restored copy."""
        import os

        if os.path.exists(os.path.join(path, "_SUCCESS")):
            return cls.restore(spark, path)
        return build().checkpoint(durable=True, path=path)

    # ---- persistence (kmr_save_kvs / kmr_restore_kvs, src/kmrbase.c:1026) ----

    def save(self, path: str) -> None:
        self.df.write.mode("overwrite").parquet(path)

    @classmethod
    def restore(cls, spark: SparkSession, path: str) -> "KVS":
        return cls(spark.read.parquet(path))

    # ---- misc ----

    def collect_pairs(self) -> list[tuple[Any, Any]]:
        """Driver-side listify (kmr4py.listify, python3/kmr4py.py:1363)."""
        return [(r[self.key], r[self.value]) for r in self.df.collect()]

    def __repr__(self) -> str:  # pragma: no cover
        return f"KVS({self.df.schema.simpleString()})"
