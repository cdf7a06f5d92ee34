"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata; the heavy
decode / feature-extract / resize / frame-sample steps run as Arrow-batched
pandas iterators over ``mapInPandas`` so each Python worker touches a whole
record batch at a time (never per-row Python — the input_hint's constraint).

The actual codec libraries (PIL/opencv/ffmpeg) are NOT in this container, so
the decode kernel is a clearly-marked deterministic STUB: it derives metadata
(width/height/n_frames/sample_rate) from the md5 of the payload bytes — the
same spec the DuckDB oracle can reproduce — while the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and tested.
Swapping ``_decode_batch`` for a real decoder changes nothing upstream.

MEDIA_SCHEMA: (doc_id long, media_type string, payload binary)
DECODED_SCHEMA adds: (byte_len long, width int, height int, n_frames int)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table: payload =
    utf-8 bytes of text, media_type round-robin by doc_id. (Test/bench stand-in
    for a real WARC media extraction.)"""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: metadata from md5(payload).

    Spec (mirrored by the DuckDB oracle in __spark_entry__.py):
      h      = int(md5(payload).hexdigest()[:15], 16)   # 60-bit
      width  = 16 + h % 2048
      height = 16 + (h // 2048) % 2048
      frames = 1 + (h // 2048 // 2048) % 64
    """
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    width = 16 + h % 2048
    height = 16 + (h // 2048) % 2048
    n_frames = 1 + (h // 2048 // 2048) % 64
    return width, height, n_frames


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas. Returns DECODED_SCHEMA.

    Real decoders would slot in per media_type here; this container has no
    codec libs, so metadata comes from the deterministic fake (see
    _fake_decode_meta). The batch shape, schema, and partitioning are real.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode_meta(p) for p in pdf["payload"]]
            pdf = pdf.copy()
            pdf["byte_len"] = [len(p) for p in pdf["payload"]]
            pdf["width"] = [m[0] for m in metas]
            pdf["height"] = [m[1] for m in metas]
            pdf["n_frames"] = [m[2] for m in metas]
            yield pdf

    return media.mapInPandas(_decode_batch, schema=DECODED_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize. Requires a codec library — not available in this
    container; the plumbing (filter to images, batched UDF boundary, output
    schema) is real, the kernel raises."""

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires PIL/opencv which are not installed; "
            "swap this kernel for a real decoder in production"
        )
        yield  # pragma: no cover

    return media.where(F.col("media_type") == "image").mapInPandas(
        _resize_batch, schema=MEDIA_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame sampling for videos: emits one row per sampled
    frame index using the stubbed n_frames metadata (frame payloads would come
    from a real demuxer). JVM-side explode — the Python boundary is only the
    decode step."""
    decoded = decode_media(media.where(F.col("media_type") == "video"))
    return decoded.select(
        "doc_id",
        "media_type",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
