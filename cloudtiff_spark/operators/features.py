"""Multimodal feature extraction over the binary image column.

Training-data-pipeline ops for image payloads (task brief: decode /
feature-extract / resize as Arrow-batched UDFs; everything here is REAL —
the container has numpy + our own codecs, so no stubs are needed):

- image_features: per-image descriptor vector — mean/std per channel,
  gradient-energy (Sobel-free |dx|+|dy|), 8-bin luma histogram — the cheap
  statistics a curation pipeline filters on.
- image_thumbnail: resize-to-thumbnail as a binary column (nearest,
  reference semantics ops.rs:70-88).

Video/audio payloads would follow the same shape (binary column + typed
metadata + mapInPandas); no such payloads exist in the fixtures, so only
the image path is implemented.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..codecs import decode_image
from .tiling import resample_nearest

FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("mean_rgb", ArrayType(DoubleType())),
        StructField("std_rgb", ArrayType(DoubleType())),
        StructField("grad_energy", DoubleType()),
        StructField("luma_hist", ArrayType(DoubleType())),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cols = (pdf[c].to_numpy() for c in ("image_id", "bytes", "fmt", "w", "h"))
            for image_id, data, fmt, w, h in zip(*cols):
                arr = decode_image(data, fmt, int(w), int(h)).astype(np.float64)
                luma = arr @ np.array([0.299, 0.587, 0.114])
                gx = np.abs(np.diff(luma, axis=1)).mean() if luma.shape[1] > 1 else 0.0
                gy = np.abs(np.diff(luma, axis=0)).mean() if luma.shape[0] > 1 else 0.0
                hist, _ = np.histogram(luma, bins=8, range=(0, 256))
                rows.append(
                    (
                        image_id,
                        arr.mean(axis=(0, 1)).round(6).tolist(),
                        arr.std(axis=(0, 1)).round(6).tolist(),
                        round(float(gx + gy), 6),
                        (hist / hist.sum()).round(6).tolist(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return images.mapInPandas(gen, schema=FEATURES_SCHEMA)


THUMB_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def image_thumbnails(images: DataFrame, max_px: int = 32) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cols = (pdf[c].to_numpy() for c in ("image_id", "bytes", "fmt", "w", "h"))
            for image_id, data, fmt, w0, h0 in zip(*cols):
                arr = decode_image(data, fmt, int(w0), int(h0))
                h, w = arr.shape[:2]
                s = max(w, h) / max_px
                tw, th = max(1, int(w / s)), max(1, int(h / s))
                rows.append((image_id, tw, th, resample_nearest(arr, tw, th).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in THUMB_SCHEMA.fields])

    return images.mapInPandas(gen, schema=THUMB_SCHEMA)
