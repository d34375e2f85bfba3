"""Z-order (Morton) keys — multi-column data layout for 100 TB lakes.

Sorting a table by the bit-interleaved key of two filter columns
clusters rows so that a range predicate on EITHER column touches a
contiguous-ish fraction of files: the standard lakehouse layout trick
(Delta OPTIMIZE ZORDER, Iceberg sort orders) expressed as a plain
column expression + orderBy, so it works on stock Spark parquet.

The interleave is pure integer arithmetic (shift/mask/add), written as
an unrolled sum so the identical expression runs in DuckDB — the
oracle recomputes every key bit-for-bit. Values must be non-negative
and fit ``bits`` bits (callers bucket/clamp first); the key of
(a, b) places a's bit i at position 2i+1 and b's at 2i.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension -> 32-bit key, fits long with headroom


def zorder_key(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two non-negative integer columns."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftright(a.cast("long"), i).bitwiseAND(1)
                     * F.lit(1 << (2 * i + 1)))
        parts.append(F.shiftright(b.cast("long"), i).bitwiseAND(1)
                     * F.lit(1 << (2 * i)))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def zbucket(col: Column, bits: int = ZBITS) -> Column:
    """Fold an arbitrary integer column into the non-negative
    ``bits``-bit domain :func:`zorder_key` requires. Positive modulo,
    not a clamp: out-of-range values wrap uniformly instead of piling
    up on the saturation boundary key."""
    return F.pmod(col.cast("long"), F.lit(1 << bits))


def sql_zbucket(expr: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zbucket` (``%`` follows the dividend sign
    there, so positive modulo is spelled out)."""
    m = 1 << bits
    return f"((({expr}) % {m} + {m}) % {m})"


def sql_zorder_key(a_expr: str, b_expr: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zorder_key` (same shifts, same order)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr}) >> {i}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"((({b_expr}) >> {i}) & 1) * {1 << (2 * i)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_write(df: DataFrame, path: str, a_col: str, b_col: str,
                 bits: int = ZBITS, target_files: int = 16) -> None:
    """Write ``df`` as parquet clustered by the Morton key of
    (``a_col``, ``b_col``) — the write side of the layout trick.

    ``repartitionByRange`` on the key gives every output file a
    CONTIGUOUS zkey range (sampling range partitioner, one shuffle);
    the within-partition sort tightens row-group stats too. Each file's
    zkey interval is a small set of quad blocks in (a, b) space, so its
    parquet min/max footer stats are tight on BOTH columns and a range
    predicate on either one prunes most files/row-groups at scan time
    — stock parquet, no table format needed. At 100 TB this is the
    compaction pass's output layout; ``target_files`` maps to the
    file-size budget (AQE coalescing handles the small tail).
    """
    keyed = df.withColumn(
        "__zkey", zorder_key(zbucket(F.col(a_col), bits),
                             zbucket(F.col(b_col), bits), bits))
    (keyed.repartitionByRange(target_files, "__zkey")
     .sortWithinPartitions("__zkey")
     .drop("__zkey")
     .write.mode("overwrite").parquet(path))
