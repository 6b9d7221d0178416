"""Metadata derivation: images -> levels -> tile assignments.

This is the analyze stage of the reference (CloudTiff::open,
/root/reference/src/cog/mod.rs:91-135 + Level::from_ifd level.rs:106-178)
re-expressed as pure Catalyst column math: every expression below stays
inside whole-stage codegen — no Python is involved until pixels are touched.

Input is the fixture ``images_meta`` table (the deterministic geo-anchor of
FIXTURES.md T2; in a production deployment these columns come out of the
TIFF/GeoKey parse UDF, see operators/decode.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cells import Z_JOIN, cell_id_expr, res_for_footprint_expr
from ..grid import ceil_div_expr, level_dim_expr, levels_expr


def levels_df(meta: DataFrame) -> DataFrame:
    """Explode each image into its pyramid levels (cog/mod.rs:115-126 +
    encode/mod.rs:398-408 level-count rule). Output grain: (image_id, level).
    """
    df = meta.withColumn(
        "level", F.explode(levels_expr(F.col("w"), F.col("h"), F.col("tile_w"), F.col("tile_h")))
    )
    df = (
        df.withColumn("lw", level_dim_expr(F.col("w"), F.col("level")))
        .withColumn("lh", level_dim_expr(F.col("h"), F.col("level")))
        .withColumn("cols", ceil_div_expr(F.col("lw"), F.col("tile_w")))
        .withColumn("rows", ceil_div_expr(F.col("lh"), F.col("tile_h")))
        .withColumn("n_tiles", (F.col("cols") * F.col("rows")).cast("int"))
    )
    return df


def tiles_df(levels: DataFrame) -> DataFrame:
    """Explode levels into the full tile grid with geo footprint + cell key.

    Row-major tile_idx = row*cols + col (level.rs:263, 384-388); normalized
    tile bounds clamped at 1.0 (level.rs:384-402); geo footprint = linear
    interpolation of the image's EPSG:4326 bounds (for 32609 images this is
    the 8-point bounds box, the same approximation the reference's
    bounds-based WMTS path uses, render/wmts.rs:22-44).

    ``cell``/``cell_res``: grid cell of the tile center at the resolution
    matched to the tile's ground footprint (north_star); ``cell_join``: the
    fixed-resolution ancestor used as the equi-join key (spatial.py).
    """
    tw, th = F.col("tile_w"), F.col("tile_h")
    df = (
        levels.withColumn("tile_row", F.explode(F.sequence(F.lit(0), F.col("rows") - 1)))
        .withColumn("tile_col", F.explode(F.sequence(F.lit(0), F.col("cols") - 1)))
        .withColumn("tile_idx", (F.col("tile_row") * F.col("cols") + F.col("tile_col")).cast("int"))
    )
    lw, lh = F.col("lw"), F.col("lh")
    u0 = F.col("tile_col") * tw / lw
    u1 = F.least(F.lit(1.0), (F.col("tile_col") + 1) * tw / lw)
    v0 = F.col("tile_row") * th / lh
    v1 = F.least(F.lit(1.0), (F.col("tile_row") + 1) * th / lh)
    dx = F.col("xmax") - F.col("xmin")
    dy = F.col("ymax") - F.col("ymin")
    df = (
        df.withColumn("u0", u0)
        .withColumn("v0", v0)
        .withColumn("u1", u1)
        .withColumn("v1", v1)
        .withColumn("lon_c", F.col("xmin") + (F.col("u0") + F.col("u1")) / 2 * dx)
        .withColumn("lat_c", F.col("ymax") - (F.col("v0") + F.col("v1")) / 2 * dy)
        .withColumn("cell_res", res_for_footprint_expr(dx * tw / lw))
        .withColumn("cell", cell_id_expr(F.col("lon_c"), F.col("lat_c"), F.col("cell_res")))
        .withColumn(
            "cell_join", cell_id_expr(F.col("lon_c"), F.col("lat_c"), F.lit(Z_JOIN))
        )
    )
    return df


def tile_assignments(meta: DataFrame) -> DataFrame:
    """The north-star stage-1 output: one row per (image, level, tile)."""
    return tiles_df(levels_df(meta)).select(
        "image_id",
        "level",
        "tile_idx",
        "tile_col",
        "tile_row",
        "cell",
        "cell_res",
        "cell_join",
        "lon_c",
        "lat_c",
        "caption",
        "phash",
    )
