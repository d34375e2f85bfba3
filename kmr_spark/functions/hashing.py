"""Deterministic text-hashing primitives with twin Spark/DuckDB forms.

Everything here is plain 64-bit modular arithmetic over ASCII code
points, chosen so the SAME numbers come out of Spark SQL expressions
(JVM, whole-stage codegen) and DuckDB SQL (the correctness oracle).
Nothing engine-specific (no xxhash/murmur seeds) is in the data path.

Token hash:    h(tok)   = fold chars: (acc*31 + ascii(c)) mod P
Shingle hash:  sh(i)    = (h_i*B2 + h_{i+1}*B1 + h_{i+2}) mod P   (k=3)
MinHash sig:   sig_j    = min over shingles of (A_j*sh + B_j) mod P
SimHash:       bit b    = 1 if sum over distinct h of (2*((h>>b)&1)-1) > 0

Bounds: all intermediates < ~3e18 < 2^63 (P ~ 1e9, A_j < 1e5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007
MULT = 31
BETA = 1_000_003
B1 = BETA % P
B2 = (BETA * BETA) % P
SHINGLE_K = 3

#: MinHash hash-family parameters (j-th hash = (A[j]*x + B[j]) mod P).
MINHASH_A = [2_654_435_761 % 99_991, 40_503, 69_621, 48_271, 16_807, 65_539, 22_695, 10_007]
MINHASH_B = [97, 89_041, 12_289, 786_433, 1_013, 59_393, 32_771, 524_287]
N_HASHES = len(MINHASH_A)
N_BANDS = 4  # bands of 2 signatures each
SIMHASH_BITS = 32

# ---------------------------------------------------------------- Spark side


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokens, empties dropped (matches DuckDB list_filter)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != "")


def token_hashes_col(tokens: Column) -> Column:
    """Array of rolling char hashes, one per token."""
    return F.transform(
        tokens,
        lambda t: F.aggregate(
            F.filter(F.split(t, ""), lambda ch: ch != ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * MULT + F.ascii(ch)) % P,
        ),
    )


def shingle_hashes_col(th: Column) -> Column:
    """k=3 shingle hashes from token hashes (empty if < 3 tokens)."""
    return F.when(
        F.size(th) >= SHINGLE_K,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - SHINGLE_K),
            lambda i: (
                F.element_at(th, i + 1) * B2
                + F.element_at(th, i + 2) * B1
                + F.element_at(th, i + 3)
            )
            % P,
        ),
    ).otherwise(F.array().cast("array<long>"))


def minhash_sig_cols(sh: Column) -> list[Column]:
    """One min-hash per (A_j, B_j); null when no shingles."""
    def one(a: int, b: int) -> Column:
        return F.array_min(F.transform(sh, lambda h: (F.lit(a) * h + b) % P))

    return [one(a, b).alias(f"sig{j}") for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))]


def token_hash_table(docs, extra_cols: list[str] | None = None):
    """(doc_id, *extra_cols, th) with a persist() barrier.

    The barrier is load-bearing: without it CollapseProject inlines the
    token-hash array into every per-shingle element_at, turning an
    O(tokens) hash into O(tokens^2) per document, and predicate pushdown
    can drag the whole computation into the (often single-partition)
    parquet scan. At 100 TB this table is the checkpointed intermediate
    a dedup pipeline would persist anyway.
    """
    cols = ["doc_id", *(extra_cols or [])]
    th = token_hashes_col(tokens_col("text"))
    return docs.select(*cols, th.alias("th")).persist()


def span_hashes_col(th: Column, k: int) -> Column:
    """Rolling k-token span hashes (generalized shingle: fold
    acc*BETA + h mod P over each length-k window; k=3 reproduces
    shingle_hashes_col). Empty if the doc has < k tokens."""
    return F.when(
        F.size(th) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - k),
            lambda i: F.aggregate(
                F.slice(th, i + 1, k),
                F.lit(0).cast("long"),
                lambda acc, h: (acc * BETA + h) % P,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))


# --------------------------------------------------------------- DuckDB side
# SQL fragment generators — same math, same constants, same fold order.


def sql_tokens(text_expr: str = "text") -> str:
    return f"list_filter(string_split({text_expr}, ' '), x -> x <> '')"


def sql_token_hashes(tokens_expr: str) -> str:
    return (
        f"list_transform({tokens_expr}, t -> "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split(t, ''), ch -> ch <> ''), "
        f"ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(acc, c) -> (acc * {MULT} + c) % {P}))"
    )


def sql_shingle_hashes(th_expr: str) -> str:
    return (
        f"CASE WHEN len({th_expr}) >= {SHINGLE_K} THEN "
        f"list_transform(range(1, len({th_expr}) - 1), i -> "
        f"(({th_expr})[i] * {B2} + ({th_expr})[i+1] * {B1} + ({th_expr})[i+2]) % {P}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )


def sql_minhash_sigs(sh_expr: str) -> list[str]:
    return [
        f"list_min(list_transform({sh_expr}, h -> ({a} * h + {b}) % {P})) AS sig{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def sql_span_hashes(th_expr: str, k: int) -> str:
    """DuckDB twin of span_hashes_col: same fold, same constants."""
    return (
        f"CASE WHEN len({th_expr}) >= {k} THEN "
        f"list_transform(range(1, len({th_expr}) - {k} + 2), i -> "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_slice({th_expr}, i, i + {k} - 1)), "
        f"(acc, h) -> (acc * {BETA} + h) % {P})) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
