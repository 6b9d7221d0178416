"""COG container operators: write real GeoTIFF bytes per image (S9 sink) and
parse them back (S1/S2 scan) — the reference's primary entry points, as
Spark stages over the images table.

- write_cogs: decode the fixture image -> full overview pyramid -> tiled
  GeoTIFF binary per row (mapInPandas; one output row per image).
- parse_cogs: the schema-on-read stage — extract per-level grid + projection
  columns from raw COG bytes (the Spark shape of CloudTiff::open,
  SURVEY.md §3 E1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..codecs import decode_image
from ..tiff import COMPRESSION_DEFLATE, COMPRESSION_LZW, cog_info, encode_cog

COG_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("cog", BinaryType()),
        StructField("cog_bytes", LongType()),
    ]
)

PARSED_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("level", IntegerType()),
        StructField("lw", IntegerType()),
        StructField("lh", IntegerType()),
        StructField("tile_w", IntegerType()),
        StructField("tile_h", IntegerType()),
        StructField("n_tiles", IntegerType()),
        StructField("compression", StringType()),
        StructField("epsg", IntegerType()),
        StructField("origin_x", DoubleType()),
        StructField("origin_y", DoubleType()),
        StructField("scale_px", DoubleType()),
    ]
)

_COMP_NAME = {COMPRESSION_DEFLATE: "deflate", COMPRESSION_LZW: "lzw", 1: "none"}


def write_cogs(images_with_geo: DataFrame) -> DataFrame:
    """images (+ epsg/origin_x/origin_y/scale_px columns) -> one COG per row.
    LZW-sourced images get LZW tiles, everything else Deflate."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            src = "raster" if "raster" in pdf.columns else "bytes"
            cols = (
                pdf[c].to_numpy()
                for c in ("image_id", src, "fmt", "w", "h", "epsg", "origin_x", "origin_y", "scale_px")
            )
            for image_id, data, fmt, w, h, epsg, ox, oy, sp in zip(*cols):
                if src == "raster":  # pre-decoded RGB8 (session raster cache)
                    if data is None:  # cache-marked undecodable row
                        continue
                    arr = np.frombuffer(data, np.uint8).reshape(int(h), int(w), 3)
                else:
                    arr = decode_image(data, fmt, int(w), int(h))
                comp = COMPRESSION_LZW if fmt == "lzw_raw" else COMPRESSION_DEFLATE
                cog = encode_cog(
                    arr, int(epsg), float(ox), float(oy), float(sp), compression=comp
                )
                rows.append((image_id, cog, len(cog)))
            yield pd.DataFrame(rows, columns=["image_id", "cog", "cog_bytes"])

    return images_with_geo.mapInPandas(gen, schema=COG_SCHEMA)


def parse_cogs(cogs: DataFrame) -> DataFrame:
    """COG binary -> per-level metadata rows (S1 header/IFD walk + S2
    analyze + P1/P2 geokey->projection)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, cog_bytes in zip(pdf["image_id"].to_numpy(), pdf["cog"].to_numpy()):
                info = cog_info(cog_bytes)
                proj = info["projection"] or {}
                for lv_i, lev in enumerate(info["levels"]):
                    rows.append(
                        (
                            image_id,
                            lv_i,
                            lev["width"],
                            lev["height"],
                            lev["tile_w"],
                            lev["tile_h"],
                            len(lev["offsets"]),
                            _COMP_NAME.get(lev["compression"], "?"),
                            int(proj.get("epsg", 0)),
                            float(proj.get("origin_x", 0.0)),
                            float(proj.get("origin_y", 0.0)),
                            float(proj.get("scale_px", 0.0)),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PARSED_SCHEMA.fields])

    return cogs.mapInPandas(gen, schema=PARSED_SCHEMA)
