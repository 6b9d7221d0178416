"""Tile-grid semantics tests (reference parity, SURVEY.md §1.2)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from cloudtiff_spark import grid


class TestLevels:
    def test_single_tile_image_has_one_level(self):
        assert grid.num_levels(64, 64, 64, 64) == 1
        assert grid.num_levels(10, 10, 64, 64) == 1

    def test_reference_formula_parity(self):
        # overview count == ceil(max(log2(w/tw), log2(h/th))) for fixture dims
        # (encode/mod.rs:398-401)
        for w in [64, 96, 128, 256, 300, 512]:
            for h in [64, 96, 128, 256, 300, 512]:
                expect = 1 + max(
                    0, math.ceil(max(math.log2(w / 64), math.log2(h / 64)))
                )
                assert grid.num_levels(w, h, 64, 64) == expect, (w, h)

    def test_level_dims_floor_rule(self):
        # full // 2^i (encode/mod.rs:406-408)
        assert grid.level_dims(300, 512, 1) == (150, 256)
        assert grid.level_dims(300, 512, 3) == (37, 64)
        assert grid.level_dims(1, 1, 4) == (1, 1)


class TestGridShape:
    def test_ceil_counts(self):
        assert grid.grid_shape(300, 300, 64, 64) == (5, 5)
        assert grid.grid_shape(64, 64, 64, 64) == (1, 1)
        assert grid.grid_shape(65, 64, 64, 64) == (2, 1)


class TestCropPruning:
    def test_full_crop_covers_all(self):
        tiles = grid.tiles_for_crop(300, 300, 64, 64, 0.0, 0.0, 1.0, 1.0)
        assert len(tiles) == 25
        assert tiles[0] == (0, 0, 0)
        assert tiles[-1] == (24, 4, 4)

    def test_row_major_index(self):
        tiles = grid.tiles_for_crop(300, 300, 64, 64, 0.5, 0.5, 0.6, 0.6)
        for idx, c, r in tiles:
            assert idx == r * 5 + c

    def test_boundary_exclusive(self):
        # crop ending exactly on a tile boundary excludes the next tile
        tiles = grid.tiles_for_crop(128, 128, 64, 64, 0.0, 0.0, 0.5, 0.5)
        assert [t[0] for t in tiles] == [0]

    @given(
        w=st.integers(1, 1024),
        h=st.integers(1, 1024),
        u0=st.floats(0, 1),
        du=st.floats(0.001, 1),
        v0=st.floats(0, 1),
        dv=st.floats(0.001, 1),
    )
    @settings(max_examples=100, deadline=None)
    def test_every_inner_point_covered(self, w, h, u0, du, v0, dv):
        u1, v1 = min(1.0, u0 + du), min(1.0, v0 + dv)
        tiles = grid.tiles_for_crop(w, h, 64, 64, u0, v0, u1, v1)
        assert len(tiles) >= 1
        cols, rows = grid.grid_shape(w, h, 64, 64)
        # crop center's tile must be among returned tiles
        uc, vc = (u0 + u1) / 2, (v0 + v1) / 2
        cc = min(cols - 1, int(uc * w // 64))
        rc = min(rows - 1, int(vc * h // 64))
        assert (rc * cols + cc, cc, rc) in tiles
