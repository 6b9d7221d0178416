"""Projection parity tests (P2-P5): affine y-flip, UTM round-trip, bounds."""

import numpy as np
import pytest

from cloudtiff_spark import projection as P


class TestUTM:
    def test_known_point(self):
        # EPSG:32609 central meridian: lon=-129 -> easting ~500000 (false easting)
        e, n = P.utm9n_forward(np.array([-129.0]), np.array([45.0]))
        assert abs(e[0] - 500000.0) < 1e-3
        assert 4_900_000 < n[0] < 5_000_000  # ~45 deg of meridional arc

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-132, -126, 500)
        lat = rng.uniform(0, 80, 500)
        e, n = P.utm9n_forward(lon, lat)
        lon2, lat2 = P.utm9n_inverse(e, n)
        assert np.allclose(lon, lon2, atol=1e-9)
        assert np.allclose(lat, lat2, atol=1e-9)

    def test_scale_factor_at_meridian(self):
        # k0 = 0.9996 on the central meridian: 1 deg of lat ~ 110946 m * k0
        e1, n1 = P.utm9n_forward(np.array([-129.0]), np.array([45.0]))
        e2, n2 = P.utm9n_forward(np.array([-129.0]), np.array([46.0]))
        assert abs((n2[0] - n1[0]) - 111_091) < 200


class TestAffine:
    def test_y_flip(self):
        # v grows downward: y below origin -> v > 0 (projection/mod.rs:215-217)
        u, v = P.image_coords_from_crs(10.0, 49.0, 10.0, 50.0, 1.0, 1.0)
        assert u == 0.0 and v == 1.0

    def test_roundtrip(self):
        rng = np.random.default_rng(4)
        u = rng.uniform(0, 1, 100)
        v = rng.uniform(0, 1, 100)
        x, y = P.crs_from_image_coords(u, v, 12.0, 34.0, 0.5, 0.25)
        u2, v2 = P.image_coords_from_crs(x, y, 12.0, 34.0, 0.5, 0.25)
        assert np.allclose(u, u2) and np.allclose(v, v2)


class TestBounds:
    def test_4326_identity_bounds(self):
        b = P.bounds_lat_lon(4326, 10.0, 50.0, 0.5, 0.25)
        assert b == (10.0, 49.75, 10.5, 50.0)

    def test_32609_bounds_contain_center(self):
        e, n = P.utm9n_forward(np.array([-128.0]), np.array([50.0]))
        xmin, ymin, xmax, ymax = P.bounds_lat_lon(32609, float(e[0]), float(n[0]), 1000.0, 1000.0)
        # origin is the TOP-LEFT corner; bounds must straddle it going south-east
        assert xmin <= -128.0 <= xmax
        # the rect's east corners bow slightly north of the origin latitude
        # in lon/lat space (UTM grid vs graticule), hence the loose upper gate
        assert ymax <= 50.0 + 1e-6 and ymax >= 49.99
        assert ymin < ymax and xmax - xmin < 0.1

    def test_fixture_meta_bounds_reproducible(self, sf_small):
        # the stored fixture bounds must equal a fresh P5 evaluation
        import duckdb

        con = duckdb.connect()
        rows = con.execute(
            f"SELECT epsg, origin_x, origin_y, scale_px, w, h, xmin, ymin, xmax, ymax "
            f"FROM read_parquet('{sf_small}/images_meta.parquet')"
        ).fetchall()
        for epsg, ox, oy, s, w, h, xmin, ymin, xmax, ymax in rows:
            b = P.bounds_lat_lon(epsg, ox, oy, s * w, s * h)
            assert np.allclose(b, (xmin, ymin, xmax, ymax), atol=1e-12), (epsg, ox, oy)


class TestTransformDispatch:
    def test_identity(self):
        x, y = P.transform_coords(np.array([1.0]), np.array([2.0]), 4326, 4326)
        assert x[0] == 1.0 and y[0] == 2.0

    def test_unsupported_raises(self):
        with pytest.raises(ValueError, match="unsupported CRS"):
            P.transform_coords(np.array([0.0]), np.array([0.0]), 4326, 3857)
