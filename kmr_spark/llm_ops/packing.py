"""Sequence packing: concatenate chunks into fixed-capacity context
windows — the step between chunking and the trainer in an LLM
pretraining pipeline (pack documents head-to-tail into CAPACITY-token
sequences so no batch slot is wasted).

Greedy bin packing is inherently sequential, so the scalable form is
SHARDED GREEDY: the corpus is split into content-hash shards, and
within each shard chunks are packed in deterministic (doc_id,
chunk_id) order by running token count — bin = floor(cum_tokens_before
/ capacity). One window function per shard, so the sort buffer is a
shard, never the corpus, and shards pack on different executors. The
price is at most one under-filled bin per shard (the classic sharded
packing trade); pack quality is otherwise identical to single-stream
greedy. Everything is expression-level (window sum + integer div): no
UDF, no shuffle beyond the one hash exchange on shard id.

A chunk longer than CAPACITY still lands in its own bin (floor-div
advances past it) rather than being dropped — truncation is the
tokenizer's decision, not the packer's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmr_spark.operators.sample import hash_bucket, sql_bucket

MIN_SHARDS = 32          # floor keeps small corpora parallel
TOKENS_PER_SHARD = 1 << 20  # target shard payload: bounds the window sort
CAPACITY = 256  # tokens per packed sequence


def derive_n_shards(total_size: int, tokens_per_shard: int = TOKENS_PER_SHARD,
                    min_shards: int = MIN_SHARDS) -> int:
    """Shard count from corpus size: ceil(total/tokens_per_shard) with a
    parallelism floor. Integer arithmetic only, so the DuckDB oracle
    computes the identical value from the same aggregate."""
    return max(min_shards, (total_size + tokens_per_shard - 1) // tokens_per_shard)


def pack_chunks(chunks: DataFrame, capacity: int = CAPACITY,
                n_shards: int | None = None,
                id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
                size_col: str = "chunk_len") -> DataFrame:
    """Assign every chunk a (shard, bin_id, offset): bin_id groups the
    chunks packed into one context window, offset is the chunk's start
    position inside it. Deterministic: shard is a content hash of the
    doc id, order within a shard is (doc_id, chunk_id).

    ``n_shards`` defaults to :func:`derive_n_shards` of the corpus's
    total ``size_col`` (one aggregate pre-pass, scalar collect) so the
    per-shard window input stays ~``TOKENS_PER_SHARD`` regardless of
    corpus size — a fixed shard count would cap parallelism and buffer
    corpus/N rows per task at 100 TB."""
    d, c = id_cols
    if n_shards is None:
        # NOTE: this pre-pass executes the chunk pipeline once for the
        # scalar; callers with an expensive upstream should persist the
        # chunk table first (pack_sequences does) or pass n_shards
        total = chunks.agg(F.sum(size_col)).first()[0] or 0
        n_shards = derive_n_shards(int(total))
    # portable multiplicative hash (operators/sample.py): deterministic,
    # engine-independent, so the DuckDB oracle reproduces the sharding
    sharded = chunks.withColumn(
        "shard", (hash_bucket(F.col(d)) % n_shards).cast("int"))
    w = (Window.partitionBy("shard").orderBy(d, c)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        sharded
        .withColumn("cum_before",
                    F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long"))
        .withColumn("bin_id", F.expr(f"cum_before DIV {capacity}"))
        .withColumn("offset", F.expr(f"cum_before % {capacity}"))
    )


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the documents table, pack the chunks into 256-char context
    windows across size-derived shards, and report each packed bin: how
    many chunks it holds, its fill, and an id-checksum proving WHICH
    chunks landed in it."""
    from kmr_spark.llm_ops.chunking import chunk_documents
    from kmr_spark.session import load_tables

    from kmr_spark.session import materialize_release

    docs = load_tables(spark, sf_dir)["documents"]
    # persist the chunk table: the shard-count pre-pass and the packing
    # job both consume it, and the chunking explode is the corpus-sized
    # stage — without the persist it runs twice
    chunks = chunk_documents(docs, size=200, overlap=20).persist()
    try:
        packed = pack_chunks(chunks)
        out = (
            packed.groupBy("shard", "bin_id")
            .agg(F.count("*").alias("n_chunks"),
                 F.sum("chunk_len").alias("fill"),
                 F.sum(F.col("doc_id") * 7 + F.col("chunk_id")).alias("id_sum"))
        )
        return materialize_release(out, chunks)
    except Exception:
        chunks.unpersist()
        raise


PACK_SEQUENCES_SQL = f"""
WITH chunks AS (
  SELECT doc_id,
         CAST(g // 180 AS BIGINT) AS chunk_id,
         CAST(length(substr(text, g + 1, 200)) AS BIGINT) AS chunk_len
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, greatest(length(text) - 1, 0), 180)) AS g)),
nsh AS (
  SELECT GREATEST({MIN_SHARDS},
                  (SUM(chunk_len) + {TOKENS_PER_SHARD} - 1) // {TOKENS_PER_SHARD})
         AS n
  FROM chunks),
sharded AS (
  SELECT *, CAST(({sql_bucket('doc_id')}) % (SELECT n FROM nsh) AS INTEGER) AS shard
  FROM chunks),
packed AS (
  SELECT shard, doc_id, chunk_id, chunk_len,
         COALESCE(SUM(chunk_len) OVER (PARTITION BY shard ORDER BY doc_id, chunk_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM sharded)
SELECT shard, CAST(cum_before // {CAPACITY} AS BIGINT) AS bin_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS fill,
       CAST(SUM(doc_id * 7 + chunk_id) AS BIGINT) AS id_sum
FROM packed
GROUP BY shard, bin_id
ORDER BY shard, bin_id
"""


QUERIES = {"pack_sequences": pack_sequences}
ORACLE_SQL = {"pack_sequences": PACK_SEQUENCES_SQL}
