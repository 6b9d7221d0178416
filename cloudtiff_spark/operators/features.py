"""Multimodal feature extraction over the binary image column.

Training-data-pipeline ops for image payloads (task brief: decode /
feature-extract / resize as Arrow-batched UDFs; everything here is REAL —
the container has numpy + our own codecs, so no stubs are needed):

- image_features: per-image descriptor vector — mean/std per channel,
  gradient-energy (Sobel-free |dx|+|dy|), 8-bin luma histogram — the cheap
  statistics a curation pipeline filters on.
- image_thumbnail: resize-to-thumbnail as a binary column (nearest,
  reference semantics ops.rs:70-88).

Video/audio follow the same shape (binary column + typed metadata +
mapInPandas) over the `media` fixture table:

- audio_features: REAL decode for raw PCM16 (pure numpy — no codec lib
  needed), then duration / RMS / zero-crossing rate / peak / dominant
  FFT band. Compressed codecs (opus/aac/mp3) hit the STUB path: the row
  is emitted with status='unsupported_codec' and zeroed features (the
  task-brief contract: plumbing real, compressed decode stubbed because
  no codec library exists in this container).
- video_frame_features: REAL frame handling for rawvideo rgb24 (reshape
  (n_frames, h, w, 3)), every-k-th frame sampling, mean luma + mean
  inter-frame delta. h264/... rows take the same stub path.
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
    LongType,
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
            src = "raster" if "raster" in pdf.columns else "bytes"
            cols = (pdf[c].to_numpy() for c in ("image_id", src, "fmt", "w", "h"))
            for image_id, data, fmt, w, h in zip(*cols):
                if src == "raster":  # pre-decoded RGB8 (session raster cache)
                    if data is None:  # cache-marked undecodable row
                        continue
                    arr = np.frombuffer(data, np.uint8).reshape(int(h), int(w), 3)
                    arr = arr.astype(np.float64)
                else:
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


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("status", StringType()),
        StructField("duration_milli", LongType()),
        StructField("rms_milli", LongType()),
        StructField("zcr_milli", LongType()),
        StructField("peak_milli", LongType()),
        StructField("dom_band", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio descriptors over the binary payload column (audio
    rows only). PCM16 mono decodes for real (np.frombuffer '<i2'); any
    other codec is stubbed: status='unsupported_codec', zeroed features —
    never a task failure (same row-grain tolerance as decode quarantine)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cols = (pdf[c].to_numpy() for c in ("media_id", "codec", "bytes", "sr", "n_samples"))
            for media_id, codec, data, sr, n in zip(*cols):
                if codec != "pcm16":
                    rows.append((media_id, "unsupported_codec", 0, 0, 0, 0, 0))
                    continue
                x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
                sr = int(sr)
                dur = len(x) / sr
                rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                peak = float(np.abs(x).max()) if len(x) else 0.0
                if len(x):  # rfft raises on empty input
                    spec = np.abs(np.fft.rfft(x)) ** 2
                    dom = int(np.argmax([float(b.sum()) for b in np.array_split(spec, 8)]))
                else:
                    dom = 0
                rows.append(
                    (
                        media_id,
                        "ok",
                        round(dur * 1000),
                        round(rms * 1000),
                        round(zcr * 1000),
                        round(peak * 1000),
                        dom,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media.filter("kind = 'audio'").mapInPandas(gen, schema=AUDIO_SCHEMA)


VIDEO_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("status", StringType()),
        StructField("n_sampled", LongType()),
        StructField("mean_luma_milli", LongType()),
        StructField("frame_delta_milli", LongType()),
    ]
)


def video_frame_features(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling + per-clip descriptors for video rows: rawvideo rgb24
    payloads reshape to (n_frames, h, w, 3) and every ``every``-th frame is
    kept (the frame-sample stage of a training-data pipeline); mean luma +
    mean absolute inter-frame delta over the sampled frames. Compressed
    codecs (h264/...) take the stub path (status='unsupported_codec')."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            cols = (pdf[c].to_numpy() for c in ("media_id", "codec", "bytes", "n_frames", "h", "w"))
            for media_id, codec, data, nf, h, w in zip(*cols):
                if codec != "rawvideo":
                    rows.append((media_id, "unsupported_codec", 0, 0, 0))
                    continue
                frames = np.frombuffer(data, dtype=np.uint8).reshape(int(nf), int(h), int(w), 3)
                sampled = frames[::every].astype(np.float64)
                luma = sampled @ np.array([0.299, 0.587, 0.114])
                delta = (
                    float(np.abs(np.diff(luma, axis=0)).mean()) if sampled.shape[0] > 1 else 0.0
                )
                rows.append(
                    (
                        media_id,
                        "ok",
                        sampled.shape[0],
                        round(float(luma.mean()) * 1000),
                        round(delta * 1000),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA.fields])

    return media.filter("kind = 'video'").mapInPandas(gen, schema=VIDEO_SCHEMA)


def image_thumbnails(images: DataFrame, max_px: int = 32) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            src = "raster" if "raster" in pdf.columns else "bytes"
            cols = (pdf[c].to_numpy() for c in ("image_id", src, "fmt", "w", "h"))
            for image_id, data, fmt, w0, h0 in zip(*cols):
                if src == "raster":  # pre-decoded RGB8 (session raster cache)
                    if data is None:  # cache-marked undecodable row
                        continue
                    arr = np.frombuffer(data, np.uint8).reshape(int(h0), int(w0), 3)
                else:
                    arr = decode_image(data, fmt, int(w0), int(h0))
                h, w = arr.shape[:2]
                s = max(w, h) / max_px
                tw, th = max(1, int(w / s)), max(1, int(h / s))
                rows.append((image_id, tw, th, resample_nearest(arr, tw, th).tobytes()))
            yield pd.DataFrame(rows, columns=[f.name for f in THUMB_SCHEMA.fields])

    return images.mapInPandas(gen, schema=THUMB_SCHEMA)
