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
    # ETRS89 / UTM (EPSG 25828-25838) and NAD83 / UTM (EPSG 26901-26923):
    # GRS80-datum northern zones, same TM parameters as WGS84 zones
    if base == 258 and 28 <= zone <= 38:
        return np.radians(-183.0 + 6.0 * zone), _FE, 0.0
    if base == 269 and 1 <= zone <= 23:
        return np.radians(-183.0 + 6.0 * zone), _FE, 0.0
    from .errors import UnsupportedCrs

    raise UnsupportedCrs(epsg)


def _tm_forward(
    lon_deg,
    lat_deg,
    a: float,
    e2: float,
    lon0: float,
    fe: float,
    fn: float,
    k0: float,
    m0: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Generalized ellipsoidal transverse Mercator, Snyder 8-9..8-15.
    UTM fixes (k0=0.9996, m0=0, WGS84); non-UTM TM CRSs (e.g. national
    grids) pass their own ellipsoid/origin. m0 = meridional arc at lat0."""
    ep2 = e2 / (1 - e2)
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    tan_lat = np.tan(lat)

    n = a / np.sqrt(1 - e2 * sin_lat**2)
    t = tan_lat**2
    c = ep2 * cos_lat**2
    a_ = cos_lat * (lon - lon0)

    m = _merid_arc(lat, a, e2) - m0
    x = k0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * a_**5 / 120
    ) + fe
    y = k0 * (
        m
        + n
        * tan_lat
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * a_**6 / 720
        )
    ) + fn
    return x, y


def _merid_arc(lat_rad, a: float, e2: float):
    """Meridional arc length from the equator (Snyder 3-21)."""
    e4, e6 = e2**2, e2**3
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat_rad
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat_rad)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat_rad)
        - (35 * e6 / 3072) * np.sin(6 * lat_rad)
    )


def _tm_inverse(
    x_m,
    y_m,
    a: float,
    e2: float,
    lon0: float,
    fe: float,
    fn: float,
    k0: float,
    m0: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Generalized TM inverse, Snyder 8-17..8-25."""
    ep2 = e2 / (1 - e2)
    x = np.asarray(x_m, dtype=np.float64) - fe
    y = np.asarray(y_m, dtype=np.float64) - fn

    m = y / k0 + m0
    e4, e6 = e2**2, e2**3
    mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    n1 = a / np.sqrt(1 - e2 * sin1**2)
    r1 = a * (1 - e2) / (1 - e2 * sin1**2) ** 1.5
    d = x / (n1 * k0)

    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ep2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ep2 - 3 * c1**2) * d**6 / 720
    )
    lon = lon0 + (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ep2 + 24 * t1**2) * d**5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


def utm_forward(
    lon_deg: np.ndarray, lat_deg: np.ndarray, epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees -> (easting, northing) meters in any UTM zone.

    Snyder eqs. 8-9..8-15 (series form, mm-level accuracy in-zone).
    WGS84 (326zz/327zz), ETRS89 (258zz), and NAD83 (269zz) zones share the
    identical math: GRS80 and WGS84 agree to 0.1 mm and the datums are
    coincident at the accuracy this engine targets.
    """
    lon0, fe, fn = utm_params(epsg)
    return _tm_forward(lon_deg, lat_deg, _A, _E2, lon0, fe, fn, _K0, 0.0)


def utm_inverse(
    x_m: np.ndarray, y_m: np.ndarray, epsg: int
) -> tuple[np.ndarray, np.ndarray]:
    """(easting, northing) any UTM zone -> (lon, lat) degrees.
    Snyder 8-17..8-25."""
    lon0, fe, fn = utm_params(epsg)
    return _tm_inverse(x_m, y_m, _A, _E2, lon0, fe, fn, _K0, 0.0)


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


# ---------------------------------------------------------------------------
# Conic / polar-azimuthal families (Snyder, USGS PP 1395) — the "arbitrary
# proj4 pair" gap vs the reference (projection/mod.rs:224-244 via proj4rs):
# named-EPSG Lambert conformal conic, Albers equal-area, and polar
# stereographic CRSs project through the same 4326 hub. Datum note: most
# registered CRSs sit on GRS80/WGS84-coincident datums (RGF93, ETRS89,
# NAD83, WGS84) where the null datum shift is sub-meter; classical-datum
# CRSs (OSGB36 27700, TM75 29903, BD72 31370) declare a "towgs84"
# 7-parameter Helmert in their registry params (~1-2 m, the published
# accuracy of the single-Helmert fits; RD New 28992 likewise — its NTv2
# grid refines the Helmert by decimeters only; NTF 27572's 3-parameter
# shift IS the EPSG-published transformation, tfm 1193). Datums whose
# official transformation REQUIRES a distortion grid for meter-level
# accuracy (NAD27/NADCON) stay typed-unsupported rather than silently
# wrong.

#: (a, e2) pairs — GRS80 and WGS84 differ in 1/f at the 1e-9 level but we
#: keep both so the constants trace to their authorities
_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_GRS80_E2 = _GRS80_F * (2 - _GRS80_F)


def _conformal_t(lat, e):
    """Snyder 15-9 / 21-33: isometric-latitude kernel
    t = tan(pi/4 - lat/2) / ((1 - e sin lat)/(1 + e sin lat))^(e/2)."""
    sin_lat = np.sin(lat)
    return np.tan(np.pi / 4 - lat / 2) / (
        (1 - e * sin_lat) / (1 + e * sin_lat)
    ) ** (e / 2)


def _conformal_phi(t, e):
    """Invert _conformal_t by fixed-point iteration (Snyder 7-9 / 15-3)."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        es = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (e / 2))
    return phi


def _m_snyder(lat, e2):
    """Snyder 14-15: m = cos(lat)/sqrt(1 - e2 sin^2 lat)."""
    return np.cos(lat) / np.sqrt(1 - e2 * np.sin(lat) ** 2)


def _lcc2sp_consts(a, e2, p):
    e = np.sqrt(e2)
    lat0, lat1, lat2 = map(np.radians, (p["lat0"], p["lat1"], p["lat2"]))
    m1, m2 = _m_snyder(lat1, e2), _m_snyder(lat2, e2)
    t0, t1, t2 = (_conformal_t(v, e) for v in (lat0, lat1, lat2))
    n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    f_ = m1 / (n * t1**n)
    rho0 = a * f_ * t0**n
    return e, n, f_, rho0, np.radians(p["lon0"])


def lcc2sp_forward(lon_deg, lat_deg, a, e2, p):
    """Lambert conformal conic, 2 standard parallels (Snyder 15-1..15-5)."""
    e, n, f_, rho0, lon0 = _lcc2sp_consts(a, e2, p)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    rho = a * f_ * _conformal_t(lat, e) ** n
    theta = n * (lon - lon0)
    return p["fe"] + rho * np.sin(theta), p["fn"] + rho0 - rho * np.cos(theta)


def _lcc1sp_consts(a, e2, p):
    """EPSG Guidance Note 7-2 method 9801 constants. The optional "pm"
    param is the prime meridian's Greenwich longitude in degrees (EPSG
    method 8903: Paris = 2 deg 20 min 14.025 sec E = 2.5969213 grads);
    lon0 is expressed relative to that meridian, so the effective
    Greenwich-referenced origin is pm + lon0."""
    e = np.sqrt(e2)
    lat0 = np.radians(p["lat0"])
    n = np.sin(lat0)
    m0 = _m_snyder(lat0, e2)
    t0 = _conformal_t(lat0, e)
    f_ = m0 / (n * t0**n)
    r0 = a * f_ * t0**n * p["k0"]
    lon0 = np.radians(p.get("pm", 0.0) + p["lon0"])
    return e, n, f_, r0, lon0


def lcc1sp_forward(lon_deg, lat_deg, a, e2, p):
    """Lambert conformal conic, 1 standard parallel with scale factor
    (EPSG 9801; GN7-2 §1.3.1.1) — the NTF (Paris) Lambert zone layout.
    Pinned by the GN7-2 Jamaica 1969 worked example and the exact
    natural-origin invariant (Paris meridian, 52 gr) in pytest."""
    e, n, f_, r0, lon0 = _lcc1sp_consts(a, e2, p)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    r = a * f_ * _conformal_t(lat, e) ** n * p["k0"]
    theta = n * (lon - lon0)
    return p["fe"] + r * np.sin(theta), p["fn"] + r0 - r * np.cos(theta)


def lcc1sp_inverse(x_m, y_m, a, e2, p):
    """EPSG 9801 reverse formulas (GN7-2 §1.3.1.1)."""
    e, n, f_, r0, lon0 = _lcc1sp_consts(a, e2, p)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = r0 - (np.asarray(y_m, np.float64) - p["fn"])
    r = np.sign(n) * np.sqrt(x**2 + y**2)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * y)
    t = (r / (a * f_ * p["k0"])) ** (1 / n)
    lat = _conformal_phi(t, e)
    return np.degrees(theta / n + lon0), np.degrees(lat)


def lcc2sp_inverse(x_m, y_m, a, e2, p):
    """Snyder 15-8..15-11 with the conformal-latitude iteration."""
    e, n, f_, rho0, lon0 = _lcc2sp_consts(a, e2, p)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = rho0 - (np.asarray(y_m, np.float64) - p["fn"])
    rho = np.sign(n) * np.sqrt(x**2 + y**2)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * y)
    t = (rho / (a * f_)) ** (1 / n)
    lat = _conformal_phi(t, e)
    return np.degrees(theta / n + lon0), np.degrees(lat)


def _q_snyder(lat, e, e2):
    """Snyder 3-12: authalic-latitude kernel q."""
    s = np.sin(lat)
    return (1 - e2) * (s / (1 - e2 * s**2) - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))


def _authalic_phi(q, e, e2):
    """Invert q -> phi (Snyder 3-16 Newton iteration), shared by every
    equal-area inverse (Albers, oblique/polar LAEA, CEA). Runs to
    CONVERGENCE, not a fixed count: near the poles dq/dphi -> 0 and 8
    iterations leave km-scale error; values within the last ~1e-10 of
    q(pole) resolve directly to +/-pi/2."""
    q = np.asarray(q, np.float64)
    qp = _q_snyder(np.pi / 2, e, e2)
    # only snap when q is numerically AT/over the pole value — the Newton
    # converges sub-meter arbitrarily close below it (the double root just
    # needs more iterations: error halves per step near the pole)
    at_pole = np.abs(q) >= qp
    q_it = np.where(at_pole, 0.0, q)
    phi = np.arcsin(np.clip(q_it / 2, -1, 1))
    for _ in range(200):
        s = np.sin(phi)
        denom = 1 - e2 * s**2
        step = (denom**2 / (2 * np.cos(phi))) * (
            q_it / (1 - e2) - s / denom + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )
        phi = phi + step
        if np.all(np.abs(step) < 1e-16):
            break
    return np.where(at_pole, np.sign(q) * np.pi / 2, phi)


def _aea_consts(a, e2, p):
    e = np.sqrt(e2)
    lat0, lat1, lat2 = map(np.radians, (p["lat0"], p["lat1"], p["lat2"]))
    m1, m2 = _m_snyder(lat1, e2), _m_snyder(lat2, e2)
    q0, q1, q2 = (_q_snyder(v, e, e2) for v in (lat0, lat1, lat2))
    n = (m1**2 - m2**2) / (q2 - q1)
    c = m1**2 + n * q1
    rho0 = a * np.sqrt(c - n * q0) / n
    return e, n, c, rho0, np.radians(p["lon0"])


def aea2sp_forward(lon_deg, lat_deg, a, e2, p):
    """Albers equal-area conic, 2 standard parallels (Snyder 14-1..14-4)."""
    e, n, c, rho0, lon0 = _aea_consts(a, e2, p)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    q = _q_snyder(lat, e, e2)
    rho = a * np.sqrt(c - n * q) / n
    theta = n * (lon - lon0)
    return p["fe"] + rho * np.sin(theta), p["fn"] + rho0 - rho * np.cos(theta)


def aea2sp_inverse(x_m, y_m, a, e2, p):
    """Snyder 14-8..14-11; latitude by Newton iteration (Snyder 3-16)."""
    e, n, c, rho0, lon0 = _aea_consts(a, e2, p)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = rho0 - (np.asarray(y_m, np.float64) - p["fn"])
    rho = np.sqrt(x**2 + y**2)
    theta = np.arctan2(np.sign(n) * x, np.sign(n) * y)
    q = (c - (rho * n / a) ** 2) / n
    phi = _authalic_phi(q, e, e2)
    return np.degrees(theta / n + lon0), np.degrees(phi)


def _laea_consts(a, e2, p):
    e = np.sqrt(e2)
    lat0 = np.radians(p["lat0"])
    qp = _q_snyder(np.pi / 2, e, e2)
    q1 = _q_snyder(lat0, e, e2)
    beta1 = np.arcsin(q1 / qp)
    rq = a * np.sqrt(qp / 2)
    m1 = _m_snyder(lat0, e2)
    d = a * m1 / (rq * np.cos(beta1))
    return e, qp, beta1, rq, d, np.radians(p["lon0"])


def laea_forward(lon_deg, lat_deg, a, e2, p):
    """Oblique ellipsoidal Lambert azimuthal equal-area
    (Snyder 24-2..24-14) — ETRS89-LAEA Europe (EPSG:3035) family."""
    e, qp, beta1, rq, d, lon0 = _laea_consts(a, e2, p)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    q = _q_snyder(lat, e, e2)
    beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
    dlon = lon - lon0
    b = rq * np.sqrt(
        2.0 / (1.0 + np.sin(beta1) * np.sin(beta) + np.cos(beta1) * np.cos(beta) * np.cos(dlon))
    )
    x = p["fe"] + b * d * np.cos(beta) * np.sin(dlon)
    y = p["fn"] + (b / d) * (
        np.cos(beta1) * np.sin(beta) - np.sin(beta1) * np.cos(beta) * np.cos(dlon)
    )
    return x, y


def laea_inverse(x_m, y_m, a, e2, p):
    """Snyder 24-15..24-26 with the authalic-latitude Newton iteration."""
    e, qp, beta1, rq, d, lon0 = _laea_consts(a, e2, p)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = np.asarray(y_m, np.float64) - p["fn"]
    rho = np.sqrt((x / d) ** 2 + (d * y) ** 2)
    rho_safe = np.where(rho == 0.0, 1.0, rho)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
    q = qp * (
        np.cos(ce) * np.sin(beta1) + (d * y * np.sin(ce) * np.cos(beta1)) / rho_safe
    )
    q = np.where(rho == 0.0, qp * np.sin(beta1), q)
    lam = lon0 + np.arctan2(
        x * np.sin(ce),
        d * rho_safe * np.cos(beta1) * np.cos(ce) - d * d * y * np.sin(beta1) * np.sin(ce),
    )
    lam = np.where(rho == 0.0, lon0, lam)
    phi = _authalic_phi(q, e, e2)
    return np.degrees(lam), np.degrees(phi)


def laea_polar_forward(lon_deg, lat_deg, a, e2, p):
    """Polar-aspect ellipsoidal LAEA (Snyder 24-23/24-24 polar case;
    north: rho = a*sqrt(qp - q)): Arctic/Antarctic LAEA grids
    (EPSG 357x family)."""
    e = np.sqrt(e2)
    qp = _q_snyder(np.pi / 2, e, e2)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    lon0 = np.radians(p["lon0"])
    south = p.get("south", False)
    if south:
        lat = -lat
        dlon = -(lon - lon0)
    else:
        dlon = lon - lon0
    q = _q_snyder(lat, e, e2)
    rho = a * np.sqrt(np.maximum(qp - q, 0.0))
    x = rho * np.sin(dlon)
    y = -rho * np.cos(dlon)
    if south:
        x, y = -x, -y
    return p["fe"] + x, p["fn"] + y


def laea_polar_inverse(x_m, y_m, a, e2, p):
    e = np.sqrt(e2)
    qp = _q_snyder(np.pi / 2, e, e2)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = np.asarray(y_m, np.float64) - p["fn"]
    lon0 = np.radians(p["lon0"])
    south = p.get("south", False)
    if south:
        x, y = -x, -y
    rho = np.sqrt(x**2 + y**2)
    q = qp - (rho / a) ** 2
    dlon = np.arctan2(x, -y)
    phi = _authalic_phi(q, e, e2)
    dlon = np.where(rho == 0.0, 0.0, dlon)
    if south:
        phi = -phi
        dlon = -dlon
    lon = np.degrees(lon0 + dlon)
    lon = -((-lon + 180.0) % 360.0 - 180.0)
    return lon, np.degrees(phi)


def cea_forward(lon_deg, lat_deg, a, e2, p):
    """Ellipsoidal cylindrical equal-area (Snyder 10-1/10-2):
    x = a k0 dlon, y = a q/(2 k0), k0 = m(lat_ts) — the EASE-Grid 2.0
    family (EPSG 6933)."""
    e = np.sqrt(e2)
    lat_ts = np.radians(p["lat_ts"])
    k0 = _m_snyder(lat_ts, e2)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    dlon = lon - np.radians(p["lon0"])
    q = _q_snyder(lat, e, e2)
    return p["fe"] + a * k0 * dlon, p["fn"] + a * q / (2 * k0)


def cea_inverse(x_m, y_m, a, e2, p):
    e = np.sqrt(e2)
    lat_ts = np.radians(p["lat_ts"])
    k0 = _m_snyder(lat_ts, e2)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = np.asarray(y_m, np.float64) - p["fn"]
    q = 2 * k0 * y / a
    phi = _authalic_phi(q, e, e2)
    lon = np.degrees(np.radians(p["lon0"]) + x / (a * k0))
    return lon, np.degrees(phi)


def _ps_rho_factor(a, e2, p):
    """a*m_c/t_c (lat_ts form, Snyder 21-34) or 2a k0 / sqrt((1+e)^(1+e)
    (1-e)^(1-e)) (k0 form, Snyder 21-39) — the rho = factor * t scale."""
    e = np.sqrt(e2)
    if "lat_ts" in p:
        lat_ts = np.radians(abs(p["lat_ts"]))
        return e, a * _m_snyder(lat_ts, e2) / _conformal_t(lat_ts, e)
    k0 = p["k0"]
    return e, 2 * a * k0 / np.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))


def ps_forward(lon_deg, lat_deg, a, e2, p):
    """Ellipsoidal polar stereographic, north or south aspect (Snyder
    21-29..21-41). South aspect maps through the north formulas at
    (-lat, -(lon-lon0)) then mirrors both axes — the standard symmetry."""
    e, factor = _ps_rho_factor(a, e2, p)
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64))
    lon0 = np.radians(p["lon0"])
    south = p.get("south", False)
    if south:
        lat = -lat
        dlon = -(lon - lon0)
    else:
        dlon = lon - lon0
    rho = factor * _conformal_t(lat, e)
    x = rho * np.sin(dlon)
    y = -rho * np.cos(dlon)
    if south:
        x, y = -x, -y
    return p["fe"] + x, p["fn"] + y


def ps_inverse(x_m, y_m, a, e2, p):
    """Snyder 21-39/21-40 inverse with conformal-latitude iteration."""
    e, factor = _ps_rho_factor(a, e2, p)
    x = np.asarray(x_m, np.float64) - p["fe"]
    y = np.asarray(y_m, np.float64) - p["fn"]
    lon0 = np.radians(p["lon0"])
    south = p.get("south", False)
    if south:
        x, y = -x, -y
    rho = np.sqrt(x**2 + y**2)
    t = rho / factor
    lat = _conformal_phi(t, e)
    dlon = np.arctan2(x, -y)
    if south:
        lat = -lat
        dlon = -dlon
    # polar grids span all longitudes: wrap lon0 + dlon into (-180, 180]
    lon = np.degrees(lon0 + dlon)
    lon = -((-lon + 180.0) % 360.0 - 180.0)
    return lon, np.degrees(lat)


def _sterea_consts(a: float, e2: float, p: dict):
    """Oblique stereographic 'alternative' (EPSG method 9809, the RD New
    projection): double projection via the conformal sphere at lat0.
    Returns (R, n, c, chi0, lam0_rad, k0, fe, fn) per the public EPSG
    Guidance Note 7-2 formulas."""
    e = np.sqrt(e2)
    phi0 = np.radians(p["lat0"])
    sin0 = np.sin(phi0)
    rho0 = a * (1 - e2) / (1 - e2 * sin0**2) ** 1.5
    nu0 = a / np.sqrt(1 - e2 * sin0**2)
    r_sph = np.sqrt(rho0 * nu0)
    n = np.sqrt(1 + (e2 * np.cos(phi0) ** 4) / (1 - e2))
    s1 = (1 + sin0) / (1 - sin0)
    s2 = (1 - e * sin0) / (1 + e * sin0)
    w1 = (s1 * s2**e) ** n
    sin_chi00 = (w1 - 1) / (w1 + 1)
    c = (n + sin0) * (1 - sin_chi00) / ((n - sin0) * (1 + sin_chi00))
    w2 = c * w1
    chi0 = np.arcsin((w2 - 1) / (w2 + 1))
    return r_sph, n, c, chi0, np.radians(p["lon0"]), p.get("k0", 1.0), p["fe"], p["fn"]


def sterea_forward(lon_deg, lat_deg, a, e2, p):
    """EPSG 9809 forward (GN7-2): ellipsoid -> conformal sphere ->
    stereographic."""
    r_sph, n, c, chi0, lam0, k0, fe, fn = _sterea_consts(a, e2, p)
    e = np.sqrt(e2)
    lam = np.radians(np.asarray(lon_deg, np.float64))
    phi = np.radians(np.asarray(lat_deg, np.float64))
    big_lam = n * (lam - lam0) + lam0
    sin_phi = np.sin(phi)
    sa = (1 + sin_phi) / (1 - sin_phi)
    sb = (1 - e * sin_phi) / (1 + e * sin_phi)
    w = c * (sa * sb**e) ** n
    chi = np.arcsin((w - 1) / (w + 1))
    dl = big_lam - lam0
    b = 1 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(dl)
    x = fe + 2 * r_sph * k0 * np.cos(chi) * np.sin(dl) / b
    y = fn + 2 * r_sph * k0 * (np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(dl)) / b
    return x, y


def sterea_inverse(x_m, y_m, a, e2, p):
    """EPSG 9809 reverse (GN7-2): stereographic -> conformal sphere ->
    ellipsoid (fixed-count isometric-latitude iteration — elementwise
    deterministic, see _ecef_to_geodetic's rationale)."""
    r_sph, n, c, chi0, lam0, k0, fe, fn = _sterea_consts(a, e2, p)
    e = np.sqrt(e2)
    xp = np.asarray(x_m, np.float64) - fe
    yp = np.asarray(y_m, np.float64) - fn
    g = 2 * r_sph * k0 * np.tan(np.pi / 4 - chi0 / 2)
    h = 4 * r_sph * k0 * np.tan(chi0) + g
    i = np.arctan2(xp, h + yp)
    j = np.arctan2(xp, g - yp) - i
    chi = chi0 + 2 * np.arctan((yp - xp * np.tan(j / 2)) / (2 * r_sph * k0))
    big_lam = j + 2 * i + lam0
    lam = (big_lam - lam0) / n + lam0
    # conformal-sphere latitude -> ellipsoidal latitude (GN7-2 iteration)
    psi = 0.5 * np.log((1 + np.sin(chi)) / (c * (1 - np.sin(chi)))) / n
    phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
    for _ in range(8):  # quadratic; 4 passes reach <1e-14 rad, 8 = margin
        sin_phi = np.sin(phi)
        psi_i = np.log(
            np.tan(phi / 2 + np.pi / 4) * ((1 - e * sin_phi) / (1 + e * sin_phi)) ** (e / 2)
        )
        phi = phi + (psi - psi_i) * np.cos(phi) * (1 - e2 * sin_phi**2) / (1 - e2)
    return np.degrees(lam), np.degrees(phi)


def _somerc_consts(a: float, e2: float, p: dict):
    """Swiss oblique Mercator (EPSG method 9815 as used by CH1903/LV03 and
    CH1903+/LV95; swisstopo's published Rosenmund formulation): ellipsoid
    -> conformal sphere at the projection centre -> rotation to a pseudo-
    equator -> spherical Mercator."""
    e = np.sqrt(e2)
    phi0 = np.radians(p["lat0"])
    sin0 = np.sin(phi0)
    alpha = np.sqrt(1 + (e2 / (1 - e2)) * np.cos(phi0) ** 4)
    r_sph = a * np.sqrt(1 - e2) / (1 - e2 * sin0**2)
    b0 = np.arcsin(sin0 / alpha)
    k_const = (
        np.log(np.tan(np.pi / 4 + b0 / 2))
        - alpha * np.log(np.tan(np.pi / 4 + phi0 / 2))
        + alpha * (e / 2) * np.log((1 + e * sin0) / (1 - e * sin0))
    )
    return alpha, r_sph, b0, k_const, np.radians(p["lon0"]), p["fe"], p["fn"]


def somerc_forward(lon_deg, lat_deg, a, e2, p):
    alpha, r_sph, b0, k_const, lam0, fe, fn = _somerc_consts(a, e2, p)
    e = np.sqrt(e2)
    phi = np.radians(np.asarray(lat_deg, np.float64))
    lam = np.radians(np.asarray(lon_deg, np.float64))
    sin_phi = np.sin(phi)
    s = (
        alpha * np.log(np.tan(np.pi / 4 + phi / 2))
        - alpha * (e / 2) * np.log((1 + e * sin_phi) / (1 - e * sin_phi))
        + k_const
    )
    b = 2 * np.arctan(np.exp(s)) - np.pi / 2
    l = alpha * (lam - lam0)
    lbar = np.arctan2(np.sin(l), np.sin(b0) * np.tan(b) + np.cos(b0) * np.cos(l))
    bbar = np.arcsin(np.cos(b0) * np.sin(b) - np.sin(b0) * np.cos(b) * np.cos(l))
    x = fe + r_sph * lbar
    y = fn + (r_sph / 2) * np.log((1 + np.sin(bbar)) / (1 - np.sin(bbar)))
    return x, y


def somerc_inverse(x_m, y_m, a, e2, p):
    alpha, r_sph, b0, k_const, lam0, fe, fn = _somerc_consts(a, e2, p)
    e = np.sqrt(e2)
    xp = np.asarray(x_m, np.float64) - fe
    yp = np.asarray(y_m, np.float64) - fn
    lbar = xp / r_sph
    bbar = 2 * np.arctan(np.exp(yp / r_sph)) - np.pi / 2
    b = np.arcsin(np.cos(b0) * np.sin(bbar) + np.sin(b0) * np.cos(bbar) * np.cos(lbar))
    l = np.arctan2(np.sin(lbar), np.cos(b0) * np.cos(lbar) - np.sin(b0) * np.tan(bbar))
    lam = lam0 + l / alpha
    # conformal-sphere -> ellipsoid latitude: the isometric-latitude
    # fixed-point inversion is exactly _conformal_phi with t = exp(-s)
    # (fixed count, elementwise deterministic — shared with lcc2sp/ps)
    s = (np.log(np.tan(np.pi / 4 + b / 2)) - k_const) / alpha
    phi = _conformal_phi(np.exp(-s), e)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# 7-parameter Helmert datum shift (EPSG method 9606, position-vector
# convention — the +towgs84= convention). The reference reaches datum-shifted
# CRSs through proj4rs' generic pipeline (projection/mod.rs:224-244); here
# the same capability is the classic geodetic->geocentric->Helmert->geodetic
# chain through the WGS84 hub. Single-Helmert accuracy is the published
# ~1-2 m vs national grid-shift solutions (OSTN15 etc.) — grids stay typed
# UnsupportedCrs.
# ---------------------------------------------------------------------------


def _geodetic_to_ecef(lon_deg, lat_deg, a: float, e2: float):
    """Geodetic (h=0) -> geocentric cartesian on the given ellipsoid."""
    lon = np.radians(np.asarray(lon_deg, np.float64))
    lat = np.radians(np.asarray(lat_deg, np.float64))
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = a / np.sqrt(1 - e2 * sin_lat**2)
    return n * cos_lat * np.cos(lon), n * cos_lat * np.sin(lon), n * (1 - e2) * sin_lat


def _ecef_to_geodetic(x, y, z, a: float, e2: float):
    """Geocentric -> geodetic lon/lat (height solved then dropped — the 2-D
    raster chain carries no heights). FIXED 12 iterations, deliberately no
    early break: a batch-global convergence break would make the result
    depend on which OTHER elements share the batch (the blocked render
    slices grids and relies on elementwise-identical values, review r5
    pass 2 #1). Worst case measured over all registry ellipsoids incl.
    near-pole inputs is 4 iterations to <1e-13 rad — 12 is a 3x margin,
    and the iterate merely oscillates at the last ulp beyond that. The
    near-pole h branch avoids the p/cos(lat) blow-up."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1 - e2))
    for _ in range(12):
        sin_lat = np.sin(lat)
        n = a / np.sqrt(1 - e2 * sin_lat**2)
        h = np.where(
            np.abs(lat) > 1.3,
            z / np.where(sin_lat == 0, 1.0, sin_lat) - n * (1 - e2),
            p / np.cos(lat) - n,
        )
        lat = np.arctan2(z, p * (1 - e2 * n / (n + h)))
    return np.degrees(np.arctan2(y, x)), np.degrees(lat)


def _helmert_matrices(t: tuple) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(M_fwd, T_fwd, M_inv, T_inv) for v_wgs = M_fwd @ v_src + T_fwd.
    t = (dx_m, dy_m, dz_m, rx_as, ry_as, rz_as, ds_ppm), position-vector.
    The small-angle rotation matrix is not orthogonal, so the inverse is
    the EXACT 3x3 inverse — round-trips close to machine precision instead
    of leaking the O(r^2) small-angle error."""
    dx, dy, dz, rx, ry, rz, ds = t
    rx, ry, rz = (np.radians(v / 3600.0) for v in (rx, ry, rz))
    s = 1.0 + ds * 1e-6
    m = s * np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
    tv = np.array([dx, dy, dz])
    m_inv = np.linalg.inv(m)
    return m, tv, m_inv, -m_inv @ tv


_HELMERT_CACHE: dict[tuple, tuple] = {}


def _helmert_for(t: tuple) -> tuple:
    if t not in _HELMERT_CACHE:
        _HELMERT_CACHE[t] = _helmert_matrices(t)
    return _HELMERT_CACHE[t]


def _datum_to_wgs84(lon_deg, lat_deg, a: float, e2: float, t: tuple):
    """Source-datum geodetic -> WGS84 geodetic."""
    m, tv, _, _ = _helmert_for(t)
    x, y, z = _geodetic_to_ecef(lon_deg, lat_deg, a, e2)
    v = m @ np.stack([np.ravel(x), np.ravel(y), np.ravel(z)]) + tv[:, None]
    lon, lat = _ecef_to_geodetic(v[0], v[1], v[2], _A, _E2)
    return lon.reshape(np.shape(x)), lat.reshape(np.shape(x))


def _wgs84_to_datum(lon_deg, lat_deg, a: float, e2: float, t: tuple):
    """WGS84 geodetic -> source-datum geodetic (exact inverse of above)."""
    _, _, m_inv, tv_inv = _helmert_for(t)
    x, y, z = _geodetic_to_ecef(lon_deg, lat_deg, _A, _E2)
    v = m_inv @ np.stack([np.ravel(x), np.ravel(y), np.ravel(z)]) + tv_inv[:, None]
    lon, lat = _ecef_to_geodetic(v[0], v[1], v[2], a, e2)
    return lon.reshape(np.shape(x)), lat.reshape(np.shape(x))


def tm_forward_p(lon_deg, lat_deg, a: float, e2: float, p: dict):
    """Registry adapter for the generalized TM (national grids)."""
    m0 = _merid_arc(np.radians(p["lat0"]), a, e2)
    return _tm_forward(
        lon_deg, lat_deg, a, e2, np.radians(p["lon0"]), p["fe"], p["fn"], p["k0"], m0
    )


def tm_inverse_p(x_m, y_m, a: float, e2: float, p: dict):
    m0 = _merid_arc(np.radians(p["lat0"]), a, e2)
    return _tm_inverse(
        x_m, y_m, a, e2, np.radians(p["lon0"]), p["fe"], p["fn"], p["k0"], m0
    )


# non-GRS80/WGS84 ellipsoids (EPSG-published semi-major / inverse flattening)
_AIRY_A, _AIRY_F = 6377563.396, 1.0 / 299.3249646  # Airy 1830
_AIRY_E2 = _AIRY_F * (2 - _AIRY_F)
_AIRYMOD_A = 6377340.189  # Airy Modified 1849 (same flattening as Airy)
_INTL_A, _INTL_F = 6378388.0, 1.0 / 297.0  # International 1924 (Hayford)
_INTL_E2 = _INTL_F * (2 - _INTL_F)
_BESSEL_A, _BESSEL_F = 6377397.155, 1.0 / 299.1528128  # Bessel 1841
_BESSEL_E2 = _BESSEL_F * (2 - _BESSEL_F)
_CL80IGN_A, _CL80IGN_B = 6378249.2, 6356515.0  # Clarke 1880 (IGN), a/b form
_CL80IGN_E2 = 1.0 - (_CL80IGN_B / _CL80IGN_A) ** 2
_CL66_A, _CL66_B = 6378206.4, 6356583.8  # Clarke 1866 (NAD27), a/b form
_CL66_E2 = 1.0 - (_CL66_B / _CL66_A) ** 2

#: NAD27 -> WGS84 3-parameter shift: EPSG transformation 1173 ("NAD27 to
#: WGS 84 (4)", CONUS mean, dX=-8 dY=160 dZ=176), PUBLISHED accuracy 10 m.
#: The authoritative NAD27<->NAD83 transform is the NADCON distortion
#: grid; this engine takes the same documented-approximation stance the
#: reference does (proj4rs consumes +towgs84 from the CRS definition,
#: projection/mod.rs:224-244) instead of rejecting the datum outright —
#: the 10 m bound is stated here, in SURVEY.md, and in the tests rather
#: than being silent. Zones 1-22 north (EPSG 26701-26722) exist; Alaska
#: panhandle zones share the CONUS-mean shift at reduced (~tens of m)
#: fidelity, which is inside the published transformation's stated scope.
_NAD27_TOWGS84 = (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0)


def _nad27_lon0(epsg: int) -> float:
    """Central meridian (radians) for a NAD27 UTM zone EPSG 267zz."""
    return np.radians(-183.0 + 6.0 * (epsg % 100))


#: named-EPSG registry: epsg -> (family, a, e2, params). Parameters are the
#: EPSG-registry published values for each CRS. An optional params
#: key "towgs84" = (dx, dy, dz, rx", ry", rz", ds_ppm) declares a
#: position-vector Helmert shift applied between the projection's datum
#: and the WGS84 hub (see _datum_to_wgs84).
CRS_REGISTRY: dict[int, tuple[str, float, float, dict]] = {
    # RGF93 / Lambert-93 (France)
    2154: (
        "lcc2sp",
        _GRS80_A,
        _GRS80_E2,
        dict(lat0=46.5, lat1=49.0, lat2=44.0, lon0=3.0, fe=700000.0, fn=6600000.0),
    ),
    # NAD83 / Conus Albers
    5070: (
        "aea2sp",
        _GRS80_A,
        _GRS80_E2,
        dict(lat0=23.0, lat1=29.5, lat2=45.5, lon0=-96.0, fe=0.0, fn=0.0),
    ),
    # WGS84 / Antarctic Polar Stereographic
    3031: ("ps", _A, _E2, dict(lat_ts=-71.0, lon0=0.0, fe=0.0, fn=0.0, south=True)),
    # WGS84 / NSIDC Sea Ice Polar Stereographic North
    3413: ("ps", _A, _E2, dict(lat_ts=70.0, lon0=-45.0, fe=0.0, fn=0.0, south=False)),
    # WGS84 / NSIDC Sea Ice Polar Stereographic South
    3976: ("ps", _A, _E2, dict(lat_ts=-70.0, lon0=0.0, fe=0.0, fn=0.0, south=True)),
    # WGS84 / UPS North and South (k0 variant)
    32661: ("ps", _A, _E2, dict(k0=0.994, lon0=0.0, fe=2000000.0, fn=2000000.0, south=False)),
    32761: ("ps", _A, _E2, dict(k0=0.994, lon0=0.0, fe=2000000.0, fn=2000000.0, south=True)),
    # WGS84 / North Pole LAEA Europe (Arctic mapping family)
    3575: ("laea_polar", _A, _E2, dict(lon0=10.0, fe=0.0, fn=0.0, south=False)),
    # WGS84 / NSIDC EASE-Grid 2.0 Global (cylindrical equal-area)
    6933: ("cea", _A, _E2, dict(lat_ts=30.0, lon0=0.0, fe=0.0, fn=0.0)),
    # ETRS89-extended / LAEA Europe (the EU INSPIRE statistical grid)
    3035: (
        "laea",
        _GRS80_A,
        _GRS80_E2,
        dict(lat0=52.0, lon0=10.0, fe=4321000.0, fn=3210000.0),
    ),
    # ETRS89 / LCC Europe
    3034: (
        "lcc2sp",
        _GRS80_A,
        _GRS80_E2,
        dict(lat0=52.0, lat1=35.0, lat2=65.0, lon0=10.0, fe=4000000.0, fn=2800000.0),
    ),
    # OSGB36 / British National Grid — Airy 1830 + Helmert to WGS84
    # (EPSG tfm 1314; single-Helmert accuracy ~2 m vs the OSTN15 grid)
    27700: (
        "tm",
        _AIRY_A,
        _AIRY_E2,
        dict(
            lat0=49.0, lon0=-2.0, k0=0.9996012717, fe=400000.0, fn=-100000.0,
            towgs84=(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
        ),
    ),
    # TM75 / Irish Grid — Airy Modified 1849 + Helmert (EPSG tfm 1954)
    29903: (
        "tm",
        _AIRYMOD_A,
        _AIRY_E2,
        dict(
            lat0=53.5, lon0=-8.0, k0=1.000035, fe=200000.0, fn=250000.0,
            towgs84=(482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15),
        ),
    ),
    # Amersfoort / RD New (Netherlands) — oblique stereographic (EPSG
    # method 9809) on Bessel 1841 + Helmert (classic position-vector
    # parameter set; the official NTv2 correction grid refines this by
    # decimeters only)
    28992: (
        "sterea",
        _BESSEL_A,
        _BESSEL_E2,
        dict(
            lat0=52.15616055555555, lon0=5.38763888888889, k0=0.9999079,
            fe=155000.0, fn=463000.0,
            towgs84=(565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0725),
        ),
    ),
    # CH1903+ / LV95 (Switzerland) — Swiss oblique Mercator (EPSG method
    # 9815, Rosenmund) on Bessel 1841 + translation-only Helmert (the
    # CH1903+ datum is defined by exactly this 3-parameter shift)
    2056: (
        "somerc",
        _BESSEL_A,
        _BESSEL_E2,
        dict(
            lat0=46.95240555555556, lon0=7.439583333333333,
            fe=2600000.0, fn=1200000.0,
            towgs84=(674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0),
        ),
    ),
    # NTF (Paris) / Lambert zone II (centre France; the zone the bulk of
    # legacy French COGs carry) — LCC 1SP (EPSG 9801) on Clarke 1880
    # (IGN), longitudes counted from the PARIS meridian (EPSG 8903:
    # 2 deg 20 min 14.025 sec = 2.5969213 gr E of Greenwich), natural
    # origin 52 gr = 46.8 deg, plus the published NTF->WGS84 3-parameter
    # shift (EPSG tfm 1193)
    27572: (
        "lcc1sp",
        _CL80IGN_A,
        _CL80IGN_E2,
        dict(
            lat0=46.8, lon0=0.0, pm=2.0 + 20.0 / 60.0 + 14.025 / 3600.0,
            k0=0.99987742, fe=600000.0, fn=2200000.0,
            towgs84=(-168.0, -60.0, 320.0, 0.0, 0.0, 0.0, 0.0),
        ),
    ),
    # BD72 / Belgian Lambert 72 — International 1924 + Helmert (EPSG tfm
    # 15929, signs in position-vector convention)
    31370: (
        "lcc2sp",
        _INTL_A,
        _INTL_E2,
        dict(
            lat0=90.0, lat1=51.16666723333333, lat2=49.8333339,
            lon0=4.367486666666666, fe=150000.013, fn=5400088.438,
            towgs84=(-106.8686, 52.2978, -103.7239, 0.3366, -0.457, 1.8422, -1.2747),
        ),
    ),
}

_FAMILY_FWD = {
    "tm": tm_forward_p,
    "sterea": sterea_forward,
    "somerc": somerc_forward,
    "lcc1sp": lcc1sp_forward,
    "lcc2sp": lcc2sp_forward,
    "aea2sp": aea2sp_forward,
    "ps": ps_forward,
    "laea": laea_forward,
    "laea_polar": laea_polar_forward,
    "cea": cea_forward,
}
_FAMILY_INV = {
    "tm": tm_inverse_p,
    "sterea": sterea_inverse,
    "somerc": somerc_inverse,
    "lcc1sp": lcc1sp_inverse,
    "lcc2sp": lcc2sp_inverse,
    "aea2sp": aea2sp_inverse,
    "ps": ps_inverse,
    "laea": laea_inverse,
    "laea_polar": laea_polar_inverse,
    "cea": cea_inverse,
}


def crs_is_supported(epsg: int) -> bool:
    """True iff transform_coords can project this EPSG (4326/3857 hubs, all
    UTM-pattern zones, or a registry conic/polar CRS)."""
    if epsg in (4326, 3857) or epsg in CRS_REGISTRY:
        return True
    base, zone = epsg // 100, epsg % 100
    return (
        (base in (326, 327) and 1 <= zone <= 60)
        or (base == 258 and 28 <= zone <= 38)
        or (base == 269 and 1 <= zone <= 23)
        or (base == 267 and 1 <= zone <= 22)
    )


def _to_4326(xs: np.ndarray, ys: np.ndarray, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    if epsg == 4326:
        return np.asarray(xs, np.float64), np.asarray(ys, np.float64)
    if epsg == 3857:
        return webmercator_inverse(xs, ys)
    if epsg in CRS_REGISTRY:
        family, a, e2, p = CRS_REGISTRY[epsg]
        lon, lat = _FAMILY_INV[family](xs, ys, a, e2, p)
        t = p.get("towgs84")
        if t is not None:
            # projection inverse lands on the SOURCE datum; shift to WGS84
            lon, lat = _datum_to_wgs84(lon, lat, a, e2, t)
        return lon, lat
    if epsg // 100 == 267 and 1 <= epsg % 100 <= 22:
        # NAD27 / UTM north zones: standard TM on Clarke 1866, then the
        # EPSG-1173 CONUS-mean Helmert (documented 10 m accuracy above)
        lon, lat = _tm_inverse(
            xs, ys, _CL66_A, _CL66_E2, _nad27_lon0(epsg), _FE, 0.0, _K0, 0.0
        )
        return _datum_to_wgs84(lon, lat, _CL66_A, _CL66_E2, _NAD27_TOWGS84)
    return utm_inverse(xs, ys, epsg)  # raises on unsupported EPSG


def _from_4326(lon: np.ndarray, lat: np.ndarray, epsg: int) -> tuple[np.ndarray, np.ndarray]:
    if epsg == 4326:
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    if epsg == 3857:
        return webmercator_forward(lon, lat)
    if epsg in CRS_REGISTRY:
        family, a, e2, p = CRS_REGISTRY[epsg]
        t = p.get("towgs84")
        if t is not None:
            # shift the WGS84 hub coords onto the projection's datum first
            lon, lat = _wgs84_to_datum(lon, lat, a, e2, t)
        return _FAMILY_FWD[family](lon, lat, a, e2, p)
    if epsg // 100 == 267 and 1 <= epsg % 100 <= 22:
        lon, lat = _wgs84_to_datum(lon, lat, _CL66_A, _CL66_E2, _NAD27_TOWGS84)
        return _tm_forward(
            lon, lat, _CL66_A, _CL66_E2, _nad27_lon0(epsg), _FE, 0.0, _K0, 0.0
        )
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
