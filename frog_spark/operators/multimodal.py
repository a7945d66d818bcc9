"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery — schema, partition-friendly layout, Arrow-batched
UDF signatures, frame-sampling batch shape — is real and tested. The
actual codec work is STUBBED behind a deterministic fake decoder (the
image/audio libraries are not in this container): ``decode_image_meta``
parses a tiny self-describing fake header, and ``REAL_DECODERS_AVAILABLE``
gates any attempt to use a real codec with NotImplementedError.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

REAL_DECODERS_AVAILABLE = False  # PIL / ffmpeg absent in this container

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
    ]
)

# fake payload layout: magic 'FSMM' + kind byte + width/height/frames (3x u32)
_MAGIC = b"FSMM"


def make_fake_payload(kind: str, width: int, height: int, frames: int = 1) -> bytes:
    kb = {"image": 0, "audio": 1, "video": 2}[kind]
    return _MAGIC + bytes([kb]) + struct.pack("<III", width, height, frames)


def decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode. A real build replaces this with
    PIL.Image.open / av.open — gated:"""
    if not payload.startswith(_MAGIC):
        if REAL_DECODERS_AVAILABLE:
            raise NotImplementedError("real codecs not wired up")
        raise ValueError("unknown payload format (real decoders unavailable)")
    w, h, fr = struct.unpack("<III", payload[5:17])
    return w, h, fr


_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frames", IntegerType(), True),
        StructField("n_bytes", IntegerType(), False),
    ]
)


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column; the batch
    shape (one pandas DataFrame of payloads per Arrow batch) is exactly the
    shape a real decode/resize/feature-extract stage uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                try:
                    w, h, fr = decode_meta(bytes(payload))
                except ValueError:
                    w = h = fr = None
                rows.append((int(mid), kind, w, h, fr, len(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "frames", "n_bytes"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=_META_SCHEMA
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame with a
    deterministic fake feature vector (real build: decoded RGB -> model).
    Partition shape: narrow map, output fanout bounded by frames/every_n."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                try:
                    w, h, fr = decode_meta(bytes(payload))
                except ValueError:
                    continue
                for fi in range(0, fr, every_n):
                    # deterministic fake 4-dim feature
                    rows.append(
                        (
                            int(mid),
                            fi,
                            [float(w % 251), float(h % 251), float(fi), 1.0],
                        )
                    )
            cols_mm = ["media_id", "frame_idx", "feature"]
            if rows:
                yield pd.DataFrame(rows, columns=cols_mm)
            else:
                yield pd.DataFrame({c: pd.Series([], dtype=object) for c in cols_mm})

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(run, schema=_FRAME_SCHEMA)
