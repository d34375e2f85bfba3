"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/resize/frame-sample stages.

One codec is REAL and dependency-free: ``decode_bmp`` parses actual
BMP (Windows DIB) bytes — magic, BITMAPFILEHEADER/BITMAPINFOHEADER
field unpacking, 4-byte row-stride arithmetic, pixel-byte extraction
excluding padding. The ``multimodal_decode`` query round-trips real
encoded images through it and is oracle-gated (the DuckDB twin derives
the same header fields arithmetically from the encode parameters).

The library-dependent codecs (JPEG/ffmpeg/torchaudio classes of
decode) remain stubbed behind ``fake=True`` because those libraries
don't exist in this container; their Arrow plumbing (schemas,
partitioning, batch shapes, UDF signatures) is real and tested.

At 100 TB the pattern is: binary payloads live in their own parquet
column (column pruning means metadata-only queries never read them);
decode runs in mapInPandas so one Python worker processes an Arrow
batch of payloads at a time; heavy outputs (pixels/frames) are written
immediately, never shuffled.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: metadata schema carried next to every binary payload
MEDIA_META_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms long, payload binary"
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, mean_byte double, "
    "checksum string"
)

RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"

FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def make_media_table(spark: SparkSession, n: int = 64, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table for pipeline tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (i % 7 + 1)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}", 64 + i, 48 + i,
                     1000 * (i + 1), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_META_SCHEMA).repartition(partitions)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage: binary payload -> per-item features.

    Real decoders (PIL/ffmpeg/torchaudio) are not available in this
    container; ``fake=True`` substitutes a deterministic byte-level
    "decode" with the same Arrow batch shape so the distributed plumbing
    is fully exercised.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass fake=True for the deterministic test decoder")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len).astype("int64"),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0),
                "checksum": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            })

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage plumbing: image rows in, (media_id, w, h, payload)
    out. Fake mode truncates/pads bytes to w*h as a stand-in."""
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv; pass fake=True for the "
            "deterministic stand-in")

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            out = pdf["payload"].map(
                lambda b: bytes(b)[:target].ljust(target, b"\0"))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": width, "height": height,
                "payload": out.map(bytearray),
            })

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled frame (UDTF shape — 0..n rows out per row in)."""
    if not fake:
        raise NotImplementedError(
            "video demux requires ffmpeg; pass fake=True for the "
            "deterministic stand-in")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for j, off in enumerate(range(0, len(raw), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(bytearray(raw[off:off + every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


# ------------------------------------------------------- real BMP codec

BMP_DECODED_SCHEMA = (
    "doc_id long, width int, height int, bpp int, stride int, "
    "n_bytes long, pixel_sum long"
)

_BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_docs_as_bmp(docs: DataFrame) -> DataFrame:
    """Deterministic 24-bpp BMP per document: width from the text
    length, height and fill byte from doc_id. Real, spec-conformant
    bytes (little-endian headers, rows padded to 4-byte boundaries) —
    the encode parameters are simple arithmetic so the DuckDB oracle
    can predict every decoded field without a binary parser."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did, tlen in zip(pdf["doc_id"], pdf["tlen"]):
                did, tlen = int(did), int(tlen)
                w = (tlen % 31) + 2
                h = (did % 17) + 2
                fill = did % 251
                stride = ((w * 3 + 3) // 4) * 4
                row = bytes([fill]) * (w * 3) + b"\0" * (stride - w * 3)
                pixels = row * h
                size = _BMP_HEADER_SIZE + len(pixels)
                header = (
                    b"BM"
                    + struct.pack("<IHHI", size, 0, 0, _BMP_HEADER_SIZE)
                    + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                  len(pixels), 2835, 2835, 0, 0)
                )
                payloads.append(bytearray(header + pixels))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", F.length("text").alias("tlen")).mapInPandas(
        run, schema="doc_id long, payload binary")


def decode_bmp(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL BMP decode over Arrow batches: validates the 'BM' magic,
    unpacks the file/info headers, recomputes the 4-byte row stride,
    and sums the pixel bytes row by row (stride padding excluded).
    Raises on malformed payloads rather than guessing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "width", "height", "bpp", "stride",
                "n_bytes", "pixel_sum")}
            for did, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                if raw[:2] != b"BM":
                    raise ValueError(f"doc {did}: not a BMP (bad magic)")
                size, _, _, off = struct.unpack_from("<IHHI", raw, 2)
                hdr_sz, w, h, planes, bpp = struct.unpack_from("<IiiHH", raw, 14)
                if size != len(raw) or planes != 1 or hdr_sz < 40:
                    raise ValueError(f"doc {did}: malformed BMP header")
                stride = ((w * (bpp // 8) + 3) // 4) * 4
                psum = 0
                for y in range(abs(h)):
                    start = off + y * stride
                    psum += sum(raw[start:start + w * (bpp // 8)])
                out["doc_id"].append(int(did))
                out["width"].append(w)
                out["height"].append(abs(h))
                out["bpp"].append(bpp)
                out["stride"].append(stride)
                out["n_bytes"].append(len(raw))
                out["pixel_sum"].append(psum)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=BMP_DECODED_SCHEMA)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document as a real BMP, decode it back with the
    real parser, return the decoded header fields + pixel checksum."""
    from kmr_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    return decode_bmp(encode_docs_as_bmp(docs)).orderBy("doc_id")


MULTIMODAL_DECODE_SQL = """
WITH m AS (
  SELECT doc_id,
         (length(text) % 31) + 2 AS w,
         (doc_id % 17) + 2 AS h,
         doc_id % 251 AS fill
  FROM documents)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(24 AS INTEGER) AS bpp,
       CAST(((w * 3 + 3) // 4) * 4 AS INTEGER) AS stride,
       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
       CAST(fill * w * 3 * h AS BIGINT) AS pixel_sum
FROM m ORDER BY doc_id
"""


QUERIES = {"multimodal_decode": multimodal_decode}
ORACLE_SQL = {"multimodal_decode": MULTIMODAL_DECODE_SQL}
