"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/resize/frame-sample stages.

The Spark-side plumbing (schemas, partitioning, batch shapes, UDF
signatures) is real and tested; the codec calls themselves are stubbed
because no image/audio libraries exist in this container:

- ``decode_image`` raises NotImplementedError unless ``fake=True``,
  in which case a deterministic fake decoder (bytes -> pseudo-pixel
  stats) exercises the full pipeline shape.

At 100 TB the pattern is: binary payloads live in their own parquet
column (column pruning means metadata-only queries never read them);
decode runs in mapInPandas so one Python worker processes an Arrow
batch of payloads at a time; heavy outputs (pixels/frames) are written
immediately, never shuffled.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

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
