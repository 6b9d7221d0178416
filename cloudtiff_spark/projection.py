"""Geo-referencing: affine image<->CRS transforms and EPSG:32609 (UTM 9N).

Mirrors the reference Projection (/root/reference/src/projection/mod.rs:52-337):

- Scaled model only (Transformed is rejected by the reference too,
  projection/mod.rs:114-123): ``origin = tiepoint[3..6]``, full-image scale
  = per-pixel scale * dimensions (mod.rs:128-158 — with the §1.3 fix: y
  total scale divides by HEIGHT, not width).
- Forward: u = (x - origin_x)/scale_x ; v = (origin_y - y)/scale_y — note
  the y-axis flip (mod.rs:215-217, 255-257).
- Inverse: x = origin_x + u*scale_x ; y = origin_y - v*scale_y.
- CRS<->CRS conversion (proj4rs in the reference, projection/mod.rs:224-244)
  is a from-scratch implementation below: Transverse Mercator for all 120
  UTM zones (EPSG 326zz/327zz; public formulas: Snyder, "Map Projections —
  A Working Manual", USGS PP 1395, eqs. 8-9..8-25) plus spherical web
  mercator (EPSG 3857); arbitrary pairs route through a 4326 hub. No pyproj
  in this container.

All functions are numpy-vectorized; Spark exposure is via pandas UDFs in
operators/. Pure 4326 paths stay in native column math (no UDF).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996

# EPSG:32609 = UTM zone 9N, central meridian 129W, false easting 500km.
UTM9N_LON0 = np.radians(-129.0)
_FE = 500000.0
_FN = 0.0
_FN_SOUTH = 10_000_000.0
_R_MERC = 6378137.0  # web-mercator sphere radius (EPSG:3857)


def utm_params(epsg: int) -> tuple[float, float, float]:
    """(central meridian rad, false easting, false northing) for any UTM
    zone EPSG — 326zz north, 327zz south, zz in 1..60 (the reference
    accepts arbitrary proj4 CRSs via proj4rs; UTM + web-mercator cover the
    COG corpus this engine targets)."""
    base = epsg // 100
    zone = epsg % 100
    if base == 326 and 1 <= zone <= 60:
        return np.radians(-183.0 + 6.0 * zone), _FE, 0.0
    if base == 327 and 1 <= zone <= 60:
        return np.radians(-183.0 + 6.0 * zone), _FE, _FN_SOUTH
    from .errors import UnsupportedCrs

    raise UnsupportedCrs(epsg)


def utm_forward(
    lon_deg: np.ndarray, lat_deg: np.ndarray, epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> (easting, northing) meters in any UTM zone.

    Snyder eqs. 8-9..8-15 (series form, mm-level accuracy in-zone).
    """
    lon0, fe, fn = utm_params(epsg)
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    tan_lat = np.tan(lat)

    n = _A / np.sqrt(1 - _E2 * sin_lat**2)
    t = tan_lat**2
    c = _EP2 * cos_lat**2
    a_ = cos_lat * (lon - lon0)

    # meridional arc (Snyder 3-21)
    e2, e4, e6 = _E2, _E2**2, _E2**3
    m = _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
        - (35 * e6 / 3072) * np.sin(6 * lat)
    )
    x = _K0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * _EP2) * a_**5 / 120
    ) + fe
    y = _K0 * (
        m
        + n
        * tan_lat
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * _EP2) * a_**6 / 720
        )
    ) + fn
    return x, y


def utm_inverse(
    x_m: np.ndarray, y_m: np.ndarray, epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) any UTM zone -> (lon, lat) degrees.
    Snyder 8-17..8-25."""
    lon0, fe, fn = utm_params(epsg)
    x = np.asarray(x_m, dtype=np.float64) - fe
    y = np.asarray(y_m, dtype=np.float64) - fn

    m = y / _K0
    e2, e4, e6 = _E2, _E2**2, _E2**3
    mu = m / (_A * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - np.sqrt(1 - _E2)) / (1 + np.sqrt(1 - _E2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1 - _E2 * sin1**2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * _K0)

    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * _EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * _EP2 - 3 * c1**2) * d**6 / 720
    )
    lon = lon0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * _EP2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def utm9n_forward(lon_deg: np.ndarray, lat_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> EPSG:32609 meters (zone-9N shorthand)."""
    return utm_forward(lon_deg, lat_deg, 32609)


def utm9n_inverse(x_m: np.ndarray, y_m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:32609 meters -> (lon, lat) degrees (zone-9N shorthand)."""
    return utm_inverse(x_m, y_m, 32609)


def webmercator_forward(
    lon_deg: np.ndarray, lat_deg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> EPSG:3857 meters (spherical web mercator)."""
    lon = np.radians(np.asarray(lon_deg, np.float64))
    lat = np.radians(np.asarray(lat_deg, np.float64))
    return _R_MERC * lon, _R_MERC * np.log(np.tan(np.pi / 4 + lat / 2))


def webmercator_inverse(
    x_m: np.ndarray, y_m: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 meters -> (lon, lat) degrees."""
    x = np.asarray(x_m, np.float64)
    y = np.asarray(y_m, np.float64)
    lon = np.degrees(x / _R_MERC)
    lat = np.degrees(2 * np.arctan(np.exp(y / _R_MERC)) - np.pi / 2)
    return lon, lat


def _to_4326(xs: np.ndarray, ys: np.ndarray, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    if epsg == 4326:
        return np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    if epsg == 3857:
        return webmercator_inverse(xs, ys)
    return utm_inverse(xs, ys, epsg)  # raises on unsupported EPSG


def _from_4326(lon: np.ndarray, lat: np.ndarray, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    if epsg == 4326:
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if epsg == 3857:
        return webmercator_forward(lon, lat)
    return utm_forward(lon, lat, epsg)


def transform_coords(
    xs: np.ndarray, ys: np.ndarray, from_epsg: int, to_epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batch CRS->CRS through a 4326 hub (the reference converts arbitrary
    pairs via proj4rs, projection/mod.rs:224-244; here: 4326, 3857, and all
    120 UTM zones 326zz/327zz — the CRSs real COG corpora use)."""
    if from_epsg == to_epsg:
        return np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    lon, lat = _to_4326(xs, ys, from_epsg)
    return _from_4326(lon, lat, to_epsg)


def image_coords_from_crs(
    x: np.ndarray,
    y: np.ndarray,
    origin_x: np.ndarray,
    origin_y: np.ndarray,
    scale_x: np.ndarray,
    scale_y: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """P3 forward affine: CRS point -> normalized (u, v) with the y flip
    (projection/mod.rs:215-217). scale_* are FULL-IMAGE scales."""
    u = (np.asarray(x, np.float64) - origin_x) / scale_x
    v = (origin_y - np.asarray(y, np.float64)) / scale_y
    return u, v


def crs_from_image_coords(
    u: np.ndarray,
    v: np.ndarray,
    origin_x: np.ndarray,
    origin_y: np.ndarray,
    scale_x: np.ndarray,
    scale_y: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """P4 inverse affine (projection/mod.rs:255-257)."""
    x = origin_x + np.asarray(u, np.float64) * scale_x
    y = origin_y - np.asarray(v, np.float64) * scale_y
    return x, y


def bounds_lat_lon(
    epsg: int,
    origin_x: float,
    origin_y: float,
    scale_x: float,
    scale_y: float,
) -> tuple[float, float, float, float]:
    """P5 bounds estimate: project 8 boundary sample points (4 corners + 4
    edge midpoints, projection/mod.rs:294-337) into EPSG:4326 and fold to
    (xmin, ymin, xmax, ymax)."""
    us = np.array([0.0, 0.5, 1.0, 0.0, 1.0, 0.0, 0.5, 1.0])
    vs = np.array([0.0, 0.0, 0.0, 0.5, 0.5, 1.0, 1.0, 1.0])
    x, y = crs_from_image_coords(us, vs, origin_x, origin_y, scale_x, scale_y)
    lon, lat = transform_coords(x, y, epsg, 4326)
    return float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max())
