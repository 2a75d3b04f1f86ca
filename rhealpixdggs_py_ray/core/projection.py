"""Vectorized (r)HEALPix map projection kernels.

Re-expresses the reference's scalar projection stack —
pj_healpix.py:30-155 (HEALPix sphere/ellipsoid fwd+inv),
pj_rhealpix.py:51-257 (combine_triangles / triangle),
pj_rhealpix.py:260-411 (rhealpix sphere/ellipsoid fwd+inv),
projection_wrapper.py:89-121 (lon_0/lat_0 recentering + R_A scaling) —
as fused numpy kernels over float64 columns.

Differences from the reference, by design:
- one fused function call per batch instead of a rebuilt ``Projection``
  closure + ``importlib`` lookup per point (dggs.py:414-421);
- the matplotlib ``Path.contains_point`` bounds tests
  (pj_healpix.py:158-223, pj_rhealpix.py:414-470) are replaced by
  closed-form band/triangle tests with the same boundary fuzz;
- out-of-bounds points yield inf coordinates + a False validity mask
  instead of printing to stdout.

Scalar arithmetic (operation order, branch conditions, rotation-matrix
products by 0/±1) is kept identical, so in-bounds outputs are
bit-for-bit equal to the reference.
"""

from __future__ import annotations

import math

import numpy as np

from rhealpixdggs_py_ray.core.config import EngineConfig
from rhealpixdggs_py_ray.core.utils import auth_lat, wrap_latitude, wrap_longitude

PI = math.pi

# Region codes (int8 columns).
REGION_EQUATORIAL = 0
REGION_NORTH = 1
REGION_SOUTH = 2

# cos/sin of q anticlockwise quarter turns, exact integers.
_COSQ = np.array([1.0, 0.0, -1.0, 0.0])
_SINQ = np.array([0.0, 1.0, 0.0, -1.0])


# ---------------------------------------------------------------------------
# HEALPix, unit authalic sphere
# ---------------------------------------------------------------------------

def healpix_sphere(lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """HEALPix projection of the unit sphere (pj_healpix.py:30-61)."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    phi0 = math.asin(2.0 / 3)
    equatorial = np.abs(phi) <= phi0

    # Polar branch (evaluated everywhere; selected by mask).
    sigma = np.sqrt(3 * (1 - np.abs(np.sin(phi))))
    cap = np.floor(2 * lam / PI + 2)
    cap = np.where(cap >= 4, 3.0, cap)
    lamc = -3 * PI / 4 + (PI / 2) * cap
    x_pol = lamc + (lam - lamc) * sigma
    y_pol = np.sign(phi) * (PI / 4) * (2 - sigma)

    x = np.where(equatorial, lam, x_pol)
    y = np.where(equatorial, 3 * PI / 8 * np.sin(phi), y_pol)
    return x, y


def in_healpix_image(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Closed-form point-in-HEALPix-image test with the reference's
    eps=1e-10 boundary fuzz (pj_healpix.py:158-223)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    eps = 1e-10
    ay = np.abs(y)
    in_x = np.abs(x) <= PI + eps
    band = ay <= PI / 4 + eps
    cap = np.clip(np.floor(2 * x / PI + 2), 0, 3)
    xc = -3 * PI / 4 + (PI / 2) * cap
    tri = ay <= PI / 2 - np.abs(x - xc) + 2 * eps
    return in_x & (band | tri)


def healpix_sphere_inverse(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse HEALPix on the unit sphere (pj_healpix.py:64-107).

    Returns (lam, phi, valid); invalid points get inf.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    valid = in_healpix_image(x, y)
    ay = np.abs(y)
    equatorial = ay <= PI / 4
    poles = ay >= PI / 2

    with np.errstate(invalid="ignore", divide="ignore"):
        # Equatorial branch.
        phi_eq = np.arcsin(np.clip(8 * y / (3 * PI), -1, 1))
        # Polar (non-pole) branch.
        cap = np.floor(2 * x / PI + 2)
        cap = np.where(cap >= 4, 3.0, cap)
        xc = -3 * PI / 4 + (PI / 2) * cap
        tau = 2 - 4 * ay / PI
        lam_pol = xc + (x - xc) / tau
        lam_pol = np.clip(lam_pol, -PI, PI)
        phi_pol = np.sign(y) * np.arcsin(np.clip(1 - tau**2 / 3, -1, 1))

    lam = np.where(equatorial, x, lam_pol)
    phi = np.where(equatorial, phi_eq, phi_pol)
    lam = np.where(poles, -PI, lam)
    phi = np.where(poles, np.sign(y) * PI / 2, phi)
    lam = np.where(valid, lam, np.inf)
    phi = np.where(valid, phi, np.inf)
    return lam, phi, valid


def healpix_ellipsoid(lam, phi, cfg_or_e=0.0):
    """pj_healpix.py:110-131 — authalic latitude then HEALPix sphere."""
    beta = auth_lat(phi, cfg_or_e, radians=True)
    return healpix_sphere(lam, beta)


def healpix_ellipsoid_inverse(x, y, cfg_or_e=0.0):
    """pj_healpix.py:134-155."""
    lam, beta, valid = healpix_sphere_inverse(x, y)
    phi = np.where(valid, auth_lat(np.where(valid, beta, 0.0), cfg_or_e, radians=True, inverse=True), np.inf)
    return lam, phi, valid


# ---------------------------------------------------------------------------
# rHEALPix rearrangement
# ---------------------------------------------------------------------------

def triangle(
    x: np.ndarray,
    y: np.ndarray,
    north_square: int = 0,
    south_square: int = 0,
    inverse: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Polar-triangle number and region of each point
    (pj_rhealpix.py:120-257).  Returns (tri int64 with -1 for
    equatorial, region int8)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ns = north_square % 4
    ss = south_square % 4

    region = np.zeros(x.shape, dtype=np.int8)
    region[y > PI / 4] = REGION_NORTH
    region[y < -PI / 4] = REGION_SOUTH

    tri = np.full(x.shape, -1, dtype=np.int64)
    north = region == REGION_NORTH
    south = region == REGION_SOUTH

    if not inverse:
        # HEALPix image: triangle from x bins (pj_rhealpix.py:209-219).
        t = np.full(x.shape, 3, dtype=np.int64)
        t = np.where(x < PI / 2, 2, t)
        t = np.where(x < 0, 1, t)
        t = np.where(x < -PI / 2, 0, t)
        tri = np.where(north | south, t, tri)
    else:
        eps = 1e-15  # fuzz, pj_rhealpix.py:231
        # North polar square (pj_rhealpix.py:235-244).
        L1n = x - (-3 * PI / 4 + (ns - 1) * PI / 2)
        L2n = -x + (-3 * PI / 4 + (ns + 1) * PI / 2)
        tn = np.full(x.shape, ns, dtype=np.int64)
        tn = np.where((y > L1n + eps) & (y <= L2n + eps), (ns + 3) % 4, tn)
        tn = np.where((y >= L1n - eps) & (y > L2n + eps), (ns + 2) % 4, tn)
        tn = np.where((y < L1n - eps) & (y >= L2n - eps), (ns + 1) % 4, tn)
        # South polar square (pj_rhealpix.py:247-256).
        L1s = x - (-3 * PI / 4 + (ss + 1) * PI / 2)
        L2s = -x + (-3 * PI / 4 + (ss - 1) * PI / 2)
        ts = np.full(x.shape, ss, dtype=np.int64)
        ts = np.where((y >= L1s - eps) & (y < L2s - eps), (ss + 3) % 4, ts)
        ts = np.where((y < L1s - eps) & (y <= L2s + eps), (ss + 2) % 4, ts)
        ts = np.where((y <= L1s + eps) & (y > L2s + eps), (ss + 1) % 4, ts)
        tri = np.where(north, tn, tri)
        tri = np.where(south, ts, tri)
    return tri, region


def combine_triangles(
    x: np.ndarray,
    y: np.ndarray,
    north_square: int = 0,
    south_square: int = 0,
    inverse: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Rearrange HEALPix polar triangles into polar squares and back
    (pj_rhealpix.py:51-117).  Rotations are gathers of exact 0/±1
    cos/sin values, reproducing ``dot(ROTATE[k], xy - tc) + u``."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ns = north_square % 4
    ss = south_square % 4
    c, region = triangle(x, y, north_square=ns, south_square=ss, inverse=inverse)
    north = region == REGION_NORTH
    south = region == REGION_SOUTH
    polar = north | south
    if not np.any(polar):
        return x.copy(), y.copy()

    cpol = np.where(polar, c, 0)
    tcx = -3 * PI / 4 + cpol * (PI / 2)
    tcy = np.sign(y) * (PI / 2)
    ux = np.where(north, -3 * PI / 4 + ns * (PI / 2), -3 * PI / 4 + ss * (PI / 2))
    uy = np.where(north, PI / 2, -PI / 2)

    if not inverse:
        q = np.where(north, (cpol - ns) % 4, (-(cpol - ss)) % 4)
        px, py = tcx, tcy  # rotate about tc ...
        sx, sy = ux, uy    # ... then translate to u
    else:
        q = np.where(north, (-(cpol - ns)) % 4, (cpol - ss) % 4)
        px, py = ux, uy
        sx, sy = tcx, tcy

    cq = _COSQ[q]
    sq = _SINQ[q]
    xr = x - px
    yr = y - py
    xo = cq * xr + (-sq) * yr + sx
    yo = sq * xr + cq * yr + sy
    return np.where(polar, xo, x), np.where(polar, yo, y)


def in_rhealpix_image(
    x: np.ndarray, y: np.ndarray, north_square: int = 0, south_square: int = 0
) -> np.ndarray:
    """Closed-form point-in-rHEALPix-image test with the reference's
    eps=1e-15 fuzz (pj_rhealpix.py:414-470)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    eps = 1e-15
    ns = north_square % 4
    ss = south_square % 4
    band = (np.abs(x) <= PI + eps) & (np.abs(y) <= PI / 4 + eps)
    xn = -PI + ns * PI / 2
    north = (
        (x >= xn - eps)
        & (x <= xn + PI / 2 + eps)
        & (y >= PI / 4 - eps)
        & (y <= 3 * PI / 4 + eps)
    )
    xs = -PI + ss * PI / 2
    south = (
        (x >= xs - eps)
        & (x <= xs + PI / 2 + eps)
        & (y <= -PI / 4 + eps)
        & (y >= -3 * PI / 4 - eps)
    )
    return band | north | south


# ---------------------------------------------------------------------------
# Full fused forward / inverse (what the Ray stages call)
# ---------------------------------------------------------------------------

def forward(
    cfg: EngineConfig,
    u: np.ndarray,
    v: np.ndarray,
    region: str | None = None,
    proj: str = "rhealpix",
) -> tuple[np.ndarray, np.ndarray]:
    """Geodetic (lon, lat) in the config's angle unit -> planar (x, y)
    meters.  Fuses projection_wrapper.py:109-114 (recentering),
    pj_rhealpix.py:542-562 (deg->rad + x R_A) and the projection chain
    into one batched call.  ``region='equatorial'`` skips the polar
    rearrangement (pj_rhealpix.py:371-374); ``proj='healpix'`` stops
    before combine_triangles (dggs.py:379-395).
    """
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    lam = wrap_longitude(u - cfg.lon_0, radians=cfg.radians)
    phi = wrap_latitude(v - cfg.lat_0, radians=cfg.radians)
    if not cfg.radians:
        lam = np.deg2rad(lam)
        phi = np.deg2rad(phi)
    x, y = healpix_ellipsoid(lam, phi, cfg)
    if proj == "rhealpix" and region != "equatorial":
        x, y = combine_triangles(
            x, y, north_square=cfg.north_square, south_square=cfg.south_square
        )
    return cfg.R_A * x, cfg.R_A * y


def inverse(
    cfg: EngineConfig,
    x: np.ndarray,
    y: np.ndarray,
    region: str | None = None,
    proj: str = "rhealpix",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Planar (x, y) meters -> geodetic (lon, lat) in the config's angle
    unit.  Returns (lon, lat, valid)."""
    x = np.asarray(x, dtype=np.float64) / cfg.R_A
    y = np.asarray(y, dtype=np.float64) / cfg.R_A
    if proj == "rhealpix":
        valid = in_rhealpix_image(
            x, y, north_square=cfg.north_square, south_square=cfg.south_square
        )
        if region != "equatorial":
            x, y = combine_triangles(
                x,
                y,
                north_square=cfg.north_square,
                south_square=cfg.south_square,
                inverse=True,
            )
    else:
        valid = in_healpix_image(x, y)
    lam, phi, v2 = healpix_ellipsoid_inverse(x, y, cfg)
    valid = valid & v2
    if not cfg.radians:
        lam = np.rad2deg(lam)
        phi = np.rad2deg(phi)
    lam = np.where(
        valid, wrap_longitude(np.where(valid, lam, 0.0) + cfg.lon_0, radians=cfg.radians), np.inf
    )
    phi = np.where(
        valid, wrap_latitude(np.where(valid, phi, 0.0) + cfg.lat_0, radians=cfg.radians), np.inf
    )
    return lam, phi, valid


def xyz(cfg: EngineConfig, lam: np.ndarray, phi: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Geodetic -> 3D ECEF rectangular coordinates
    (ellipsoids.py:328-350).  Used for kNN chord-distance refinement."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if not cfg.radians:
        lam = np.deg2rad(lam)
        phi = np.deg2rad(phi)
    a = cfg.R if cfg.sphere else cfg.a
    e = cfg.e
    N = a / np.sqrt(1 - e**2 * np.sin(phi) ** 2)
    return (
        N * np.cos(lam) * np.cos(phi),
        N * np.sin(lam) * np.cos(phi),
        N * (1 - e**2) * np.sin(phi),
    )


def healpix_vertices() -> list[tuple[float, float]]:
    """Planar vertices of the HEALPix image of the unit sphere
    (pj_healpix.py:226-250)."""
    return [
        (PI, PI / 4), (3 * PI / 4, PI / 2), (PI / 2, PI / 4),
        (PI / 4, PI / 2), (0, PI / 4), (-PI / 4, PI / 2),
        (-PI / 2, PI / 4), (-3 * PI / 4, PI / 2), (-PI, PI / 4),
        (-PI, -PI / 4), (-3 * PI / 4, -PI / 2), (-PI / 2, -PI / 4),
        (-PI / 4, -PI / 2), (0, -PI / 4), (PI / 4, -PI / 2),
        (PI / 2, -PI / 4), (3 * PI / 4, -PI / 2), (PI, -PI / 4),
    ]


def rhealpix_vertices(north_square: int = 0, south_square: int = 0):
    """Planar vertices of the rHEALPix image outline
    (pj_rhealpix.py:473-508), including the reference's removal of
    degenerate corner points at the square seams."""
    ns, ss = north_square, south_square
    vertices = [
        (PI, PI / 4),
        (-PI + (ns + 1) * PI / 2, PI / 4),
        (-PI + (ns + 1) * PI / 2, 3 * PI / 4),
        (-PI + ns * PI / 2, 3 * PI / 4),
        (-PI + ns * PI / 2, PI / 4),
        (-PI, PI / 4),
        (-PI, -PI / 4),
        (-PI + ss * PI / 2, -PI / 4),
        (-PI + ss * PI / 2, -3 * PI / 4),
        (-PI + (ss + 1) * PI / 2, -3 * PI / 4),
        (-PI + (ss + 1) * PI / 2, -PI / 4),
        (PI, -PI / 4),
    ]
    if ns == 3:
        vertices.remove((PI, PI / 4))
        vertices.remove((PI, PI / 4))
    elif ns == 0:
        vertices.remove((-PI, PI / 4))
        vertices.remove((-PI, PI / 4))
    if ss == 3:
        vertices.remove((PI, -PI / 4))
        vertices.remove((PI, -PI / 4))
    elif ss == 0:
        vertices.remove((-PI, -PI / 4))
        vertices.remove((-PI, -PI / 4))
    return vertices
