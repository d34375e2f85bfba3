"""Document chunking for training-data pipelines.

Splits every document into fixed-size character chunks with overlap —
the step between raw corpus and tokenizer in an LLM data pipeline
(context-window packing needs bounded pieces, retrieval indexing needs
overlapping ones). Beyond-reference capability per the build brief; the
reference's closest surface is per-line splitting (kmr_map_getline,
/root/reference/src/kmrmoreops.c:760) which this generalizes to
arbitrary windows.

Scale shape: chunking is embarrassingly parallel and stays entirely in
whole-stage codegen — ``sequence`` builds the start offsets from the
already-available length, ``explode`` fans out, ``substring`` slices.
No shuffle, no UDF, no Python: a 100 TB corpus chunks at scan speed,
and the output inherits the input's partitioning (chunk rows of one
document stay in its partition, which downstream per-doc aggregation
can exploit). The only growth is row count (~len/stride per doc),
which is the job's intrinsic output size.

Chunk policy: starts at 0, stride, 2*stride, ... while start < len
(stride = size - overlap); the final chunk may be shorter than
``size`` rather than re-reading earlier text. Empty documents yield a
single empty chunk so no doc silently disappears from the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 200,
    overlap: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, chunk_start, chunk_len, chunk_text) — one row
    per chunk, chunk_id counting from 0 within each document."""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        # NULL text counts as empty (one empty chunk), not a vanished
        # doc: explode(sequence(0, NULL)) would emit zero rows
        docs.select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
        .withColumn("chunk_start", F.explode(starts))
        .withColumn("chunk_text",
                    F.expr(f"substring({text_col}, chunk_start + 1, {size})"))
        .select(
            F.col(id_col),
            F.floor(F.col("chunk_start") / stride).cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.length("chunk_text").cast("long").alias("chunk_len"),
            "chunk_text",
        )
    )


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk the documents table (size 200, overlap 20) and return every
    chunk with its position — the corpus-to-chunks pipeline stage."""
    from kmr_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    return chunk_documents(docs, size=200, overlap=20)


DOC_CHUNKS_SQL = """
SELECT doc_id,
       CAST(g // 180 AS BIGINT) AS chunk_id,
       CAST(g AS BIGINT) AS chunk_start,
       CAST(length(substr(text, g + 1, 200)) AS BIGINT) AS chunk_len,
       substr(text, g + 1, 200) AS chunk_text
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, greatest(length(text) - 1, 0), 180)) AS g)
ORDER BY doc_id, chunk_id
"""


QUERIES = {"doc_chunks": doc_chunks}
ORACLE_SQL = {"doc_chunks": DOC_CHUNKS_SQL}
