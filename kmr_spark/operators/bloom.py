"""Portable Bloom-filter build + membership test — the explicit form of
the runtime-filter / semi-join-reduction trick that decides whether a
100 TB fact table shuffles at all.

A selective dimension predicate (e.g. "orders over X") should not drag
every fact row into the join shuffle just to discard most of them at
the probe. Spark's AQE can inject `bloom_filter_agg` runtime filters
itself; this operator is the deterministic, engine-portable version:
the filter is built with the repo's shared modular-hash family (no
murmur seeds), its bitmap is a handful of longs collected to the
driver (KMR-parity replicated state, kmr_replicate src/kmrbase.c), and
the membership test compiles to a pure bit-test expression pushed into
the fact scan. False positives are deterministic too, so the whole
construction sits behind the exact-value oracle gate.

Layout: ``m_bits`` bits packed 32 per BIGINT word (bit 63 untouched —
DuckDB's signed ``<<`` overflows where the JVM's wraps, 32-bit packing
sidesteps the difference). k=2 hash probes from the multiplicative
family (operators/sample.py's constants with distinct salts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmr_spark.operators.sample import hash_bucket, sql_bucket

BITS_PER_WORD = 32
N_PROBES = 2
#: distinct salts decorrelate the two probe positions
PROBE_SALTS = (101, 20011)


def _positions(key: Column, m_bits: int) -> list[Column]:
    return [hash_bucket(key, salt) % m_bits
            for salt in PROBE_SALTS[:N_PROBES]]


def _sql_positions(key: str, m_bits: int) -> list[str]:
    return [f"({sql_bucket(key, salt)}) % {m_bits}"
            for salt in PROBE_SALTS[:N_PROBES]]


def bloom_build(df: DataFrame, key: str, m_bits: int) -> list[int]:
    """Aggregate the Bloom bitmap of ``df[key]`` and return it as a
    Python list of ``m_bits/32`` word values.

    Distributed shape: explode each key to its k probe positions, map
    to (word_idx, bit) pairs, and bit_or-aggregate per word — a partial-
    aggregatable groupBy over at most m/32 distinct keys, then a
    bitmap-sized collect. The bitmap is the op's output by design: it
    is broadcast state, exactly like a build-side hash table.
    """
    if m_bits % BITS_PER_WORD != 0:
        raise ValueError(f"m_bits must be a multiple of {BITS_PER_WORD}")
    pos = F.explode(F.array(*_positions(F.col(key), m_bits))).alias("pos")
    # pyspark's shiftleft() wrapper only takes a literal shift amount,
    # so spell 1<<b as pow(2, b): exact in IEEE double for b <= 31 and
    # identical to DuckDB's native `<<` on the oracle side
    words = (
        df.select(pos)
        .select((F.col("pos") / BITS_PER_WORD).cast("long").alias("w"),
                F.pow(F.lit(2.0), (F.col("pos") % BITS_PER_WORD)
                      .cast("double")).cast("long").alias("bit"))
        .groupBy("w").agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * (m_bits // BITS_PER_WORD)
    for r in words:
        bitmap[int(r["w"])] = int(r["word"])
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int]) -> Column:
    """Membership-test expression against a driver-held bitmap: for each
    probe position, index the literal word array and test the bit. Pure
    codegen — no join, no shuffle; the filter rides the fact scan."""
    m_bits = len(bitmap) * BITS_PER_WORD
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = None
    for p in _positions(key, m_bits):
        w = F.element_at(arr, (p / BITS_PER_WORD).cast("int") + 1)
        # w >> b as exact power-of-two division (words are < 2^32, so
        # the double quotient is exact and the cast is the floor)
        shifted = (w / F.pow(F.lit(2.0), (p % BITS_PER_WORD).cast("double"))
                   ).cast("long")
        bit = (shifted % 2) != 0
        cond = bit if cond is None else (cond & bit)
    return cond


def sql_bloom_words(from_sql: str, key: str, m_bits: int) -> str:
    """Oracle twin of :func:`bloom_build` as a (w, word) relation."""
    pos_union = " UNION ALL ".join(
        f"SELECT {p} AS pos FROM ({from_sql})"
        for p in _sql_positions(key, m_bits))
    return f"""
SELECT CAST(pos // {BITS_PER_WORD} AS BIGINT) AS w,
       bit_or(CAST(1 AS BIGINT) << CAST(pos % {BITS_PER_WORD} AS INT)) AS word
FROM ({pos_union}) GROUP BY 1
"""


def sql_bloom_might_contain(key: str, m_bits: int,
                            words_rel: str = "bloomwords") -> str:
    """Membership predicate against the oracle's words relation: one
    scalar-subquery word lookup per probe (missing word = 0 = miss)."""
    tests = []
    for p in _sql_positions(key, m_bits):
        word = (f"COALESCE((SELECT word FROM {words_rel} bw "
                f"WHERE bw.w = ({p}) // {BITS_PER_WORD}), 0)")
        tests.append(f"(({word}) >> CAST(({p}) % {BITS_PER_WORD} AS INT)) % 2 <> 0")
    return " AND ".join(tests)
