"""Facade tests: the reference's user-facing call sites translate 1:1
(README/lib.rs surfaces: open/analyze, render builder, WMTS tiles)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from cloudtiff_spark.api import CloudTiffSpark


@pytest.fixture(scope="module")
def ct(spark):
    return CloudTiffSpark(spark)


@pytest.fixture(scope="module")
def small_tables(spark, sf_small):
    images = spark.read.parquet(os.path.join(sf_small, "images.parquet"))
    meta = spark.read.parquet(os.path.join(sf_small, "images_meta.parquet"))
    sample = [r[0] for r in images.select("image_id").limit(8).collect()]
    yield (
        images.filter(F.col("image_id").isin(sample)),
        meta.filter(F.col("image_id").isin(sample)),
    )


class TestAnalyze:
    def test_open_bytes_and_disect(self, ct):
        from cloudtiff_spark import tiff

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        data = tiff.encode_cog(img, 32609, 500000.0, 5000000.0, 10.0)
        info = ct.open_bytes(data)
        assert info["projection"]["epsg"] == 32609
        dump = ct.disect(data)
        assert "Level" in dump or "level" in dump

    def test_open_directory(self, ct, spark):
        from cloudtiff_spark.fixtures import ensure_cog_dir

        cog_dir = ensure_cog_dir("sf0.001")
        df = ct.open_directory(cog_dir)
        rows = df.collect()
        assert len(rows) > 0
        assert {"image_id", "level", "lw", "lh", "sample_format"} <= set(df.columns)


class TestRenderBuilder:
    def test_crop_render_chain(self, ct, small_tables):
        images, meta = small_tables
        out = (
            ct.renderer(images, meta)
            .with_mp_limit(0.01)
            .of_crop(0.1, 0.2, 0.9, 0.8)
            .render()
            .collect()
        )
        assert len(out) == images.count()
        for r in out[:3]:
            assert len(r.raster) == r.out_w * r.out_h * 3

    def test_output_region_chain(self, ct, small_tables, spark):
        images, meta = small_tables
        # pick a region covering the first image's bounds
        m = meta.first()
        out = (
            ct.renderer(images, meta)
            .with_mp_limit(0.01)
            .of_output_region_lat_lon_deg(m.xmin, m.ymin, m.xmax, m.ymax)
            .render()
            .collect()
        )
        assert any(r.image_id == m.image_id for r in out)

    def test_block_size_with_crop_fails_loudly(self, ct, small_tables):
        """with_block_size + of_crop must raise, not silently run the
        whole-render crop path the user set the block size to avoid."""
        import pytest as _pytest

        images, meta = small_tables
        b = ct.renderer(images, meta).with_block_size(256).of_crop(0.1, 0.2, 0.9, 0.8)
        with _pytest.raises(ValueError, match="region renders only"):
            b.render()

    def test_block_size_route_is_byte_identical(self, ct, small_tables):
        """with_block_size routes region renders through the block-tiled
        scale path — same rows, same raster bytes as the whole-render
        grain."""
        images, meta = small_tables
        m = meta.first()

        def run(builder):
            return {
                (r.query_id, r.image_id): bytes(r.raster)
                for r in builder.of_output_region_lat_lon_deg(
                    m.xmin, m.ymin, m.xmax, m.ymax
                ).with_mp_limit(0.01).render().collect()
            }

        whole = run(ct.renderer(images, meta))
        blocked = run(ct.renderer(images, meta).with_block_size(37))
        assert whole == blocked and len(whole) > 0

    def test_wmts_tile_chain(self, ct, small_tables):
        images, meta = small_tables
        m = meta.first()
        # the z=4 slippy tile containing the image center
        import math

        z, n = 4, 16
        cx = (m.xmin + m.xmax) / 2
        cy = (m.ymin + m.ymax) / 2
        x = int((cx + 180.0) / 360.0 * n)
        lat_r = math.radians(max(-85.05, min(85.05, cy)))
        y = int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n)
        out = ct.renderer(images, meta).with_mp_limit(0.005).wmts_tile(z, x, y).render()
        rows = out.collect()
        assert any(r.image_id == m.image_id for r in rows)

    def test_exact_resolution_wmts_tile(self, ct, small_tables):
        """wmts_tile + with_exact_resolution (render/mod.rs:149-151): the
        output raster is exactly the requested dims regardless of the
        tile's lon/lat aspect, and matches the operator-level wmts_render
        for the same tile byte-for-byte."""
        import math

        from cloudtiff_spark.operators.meta import levels_df
        from cloudtiff_spark.operators.render import wmts_render
        from cloudtiff_spark.operators.tiling import build_tiles

        images, meta = small_tables
        m = meta.first()
        z, n = 4, 16
        cx = (m.xmin + m.xmax) / 2
        cy = (m.ymin + m.ymax) / 2
        x = int((cx + 180.0) / 360.0 * n)
        lat_r = math.radians(max(-85.05, min(85.05, cy)))
        y = int((1.0 - math.asinh(math.tan(lat_r)) / math.pi) / 2.0 * n)
        # NO with_mp_limit: the builder derives the LOD budget from the
        # exact resolution (w*h/1e6) unless the caller overrides it, so
        # the docstring's wmts_tile+with_exact_resolution pairing picks
        # the SAME pyramid level wmts_render does (r6 review pass 1 #1)
        rows = (
            ct.renderer(images, meta)
            .wmts_tile(z, x, y)
            .with_exact_resolution(256, 256)
            .render()
            .collect()
        )
        assert rows and all(r.out_w == 256 and r.out_h == 256 for r in rows)
        assert all(len(r.raster) == 256 * 256 * 3 for r in rows)
        spark = ct.spark
        q = spark.createDataFrame(
            [("t0", "wmts", z, x, y)], "query_id string, kind string, qz int, qx int, qy int"
        )
        op = wmts_render(levels_df(meta), build_tiles(images), q, tile_px=256).collect()
        got_api = {(r.image_id): bytes(r.raster) for r in rows}
        got_op = {(r.image_id): bytes(r.raster) for r in op}
        # both paths now source bounds from the one slippy_bounds_np
        # definition, so byte equality is exact by construction
        assert set(got_op) == set(got_api)
        for k in got_op:
            assert got_op[k] == got_api[k]

    def test_exact_resolution_guards(self, ct, small_tables):
        images, meta = small_tables
        with pytest.raises(ValueError, match="region renders only"):
            ct.renderer(images, meta).with_exact_resolution(64, 64).of_crop(
                0.1, 0.2, 0.9, 0.8
            ).render()
        with pytest.raises(ValueError, match="mutually exclusive"):
            m = meta.first()
            ct.renderer(images, meta).with_exact_resolution(64, 64).with_block_size(
                128
            ).of_output_region_lat_lon_deg(m.xmin, m.ymin, m.xmax, m.ymax).render()
        with pytest.raises(ValueError, match="positive"):
            ct.renderer(images, meta).with_exact_resolution(0, 64)

    def test_unconfigured_raises(self, ct, small_tables):
        images, meta = small_tables
        with pytest.raises(ValueError, match="of_crop"):
            ct.renderer(images, meta).render()

    def test_with_tiles_injection(self, ct, small_tables):
        from cloudtiff_spark.operators.tiling import build_tiles

        images, meta = small_tables
        tiles = build_tiles(images)
        a = (
            ct.renderer(images, meta)
            .with_tiles(tiles)
            .with_mp_limit(0.01)
            .of_crop(0.2, 0.2, 0.8, 0.8)
            .render()
            .collect()
        )
        assert len(a) == images.count()
