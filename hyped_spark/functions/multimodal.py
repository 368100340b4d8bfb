"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing — while the actual codec step
is STUBBED (this container ships no image/audio libraries). The default
``fake=False`` raises ``NotImplementedError`` at the exact point where
Pillow/ffmpeg/torchaudio would be called — a pipeline can NEVER ship fake
features silently. Passing ``fake=True`` is an explicit opt-in for
plumbing tests: the decoders then produce deterministic synthetic features
derived from the payload bytes (stable across executors).

Scale notes: binary payloads never shuffle through these ops — decode /
feature-extract are map-only (``mapInPandas``), so the only data movement
is the parquet scan and whatever downstream groupBy the features feed.
``spark.sql.files.maxPartitionBytes`` is the knob that keeps a partition of
multi-MB blobs within executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.FloatType()),
    T.StructField("phash", T.LongType()),
])


def _fake_decode(blob: bytes) -> tuple[int, int, float, int]:
    """Deterministic stand-in for a real image decode (STUB)."""
    d = hashlib.sha256(blob).digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    luma = d[2] / 255.0
    phash = int.from_bytes(d[3:11], "big", signed=True)
    return w, h, luma, phash


def decode_image_features(df: DataFrame, blob_col: str = "image",
                          out: str = "img", fake: bool = False) -> DataFrame:
    """binary blob → typed feature struct via one map-only Arrow stage."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, IMAGE_FEATURES)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                if blob is None:
                    feats.append(None)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "real image decode needs Pillow/opencv — not in this "
                        "container; run with fake=True for plumbing tests"
                    )
                w, h, luma, ph = _fake_decode(bytes(blob))
                feats.append({"width": w, "height": h,
                              "mean_luma": float(luma), "phash": ph})
            yield pdf.assign(**{out: feats})

    return df.mapInPandas(run, out_schema)


def resize_images(df: DataFrame, blob_col: str = "image", out: str = "resized",
                  width: int = 224, height: int = 224, fake: bool = False) -> DataFrame:
    """binary → binary resize (STUB codec; deterministic fake output)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields] + [T.StructField(out, T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            blobs = []
            for blob in pdf[blob_col]:
                if blob is None:
                    blobs.append(None)
                    continue
                if not fake:
                    raise NotImplementedError("real resize needs an image codec")
                seed = hashlib.sha256(
                    bytes(blob) + f"|{width}x{height}".encode()
                ).digest()
                blobs.append(seed * 4)  # deterministic fake payload
            yield pdf.assign(**{out: blobs})

    return df.mapInPandas(run, out_schema)


def sample_video_frames(df: DataFrame, blob_col: str = "video",
                        out: str = "frames", n_frames: int = 4,
                        fake: bool = False) -> DataFrame:
    """video binary → array of frame blobs, 1 row → 1 row with array column
    (frame-sampling plumbing; STUB codec)."""
    out_schema = T.StructType(
        [f for f in df.schema.fields]
        + [T.StructField(out, T.ArrayType(T.BinaryType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            col = []
            for blob in pdf[blob_col]:
                if blob is None:
                    col.append(None)
                    continue
                if not fake:
                    raise NotImplementedError("real frame extraction needs ffmpeg")
                col.append([
                    hashlib.sha256(bytes(blob) + bytes([k])).digest()
                    for k in range(n_frames)
                ])
            yield pdf.assign(**{out: col})

    return df.mapInPandas(run, out_schema)
