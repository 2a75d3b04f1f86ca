"""Public H3-workalike cell-address API (string SUIDs).

Mirrors the reference's ``rhp_wrappers.py`` surface — the query API a
user of the reference calls — on top of the vectorized core.  Most
functions also accept/return numpy arrays (vectorized variants) where
the reference is scalar-only.

Reference parity: rhp_wrappers.py:46-674 and conversion.py:114-135.
"""

from __future__ import annotations

import re

import numpy as np

from rhealpixdggs_py_ray.core import cover as cov
from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import topology as tp
from rhealpixdggs_py_ray.core.config import CELLS0, WGS84_003, EngineConfig


def _s(u: int) -> str:
    return "".join(str(x) for x in su.suid_tuple(u))


def rhp_is_valid(rhpindex, cfg: EngineConfig = WGS84_003) -> bool:
    """rhp_wrappers.py:299-332."""
    if rhpindex is None or len(rhpindex) == 0:
        return False
    if rhpindex[0] not in CELLS0:
        return False
    num_subcells = cfg.N_side**2
    for d in rhpindex[1:]:
        if not d.isdigit() or int(d) >= num_subcells:
            return False
    return True


def geo_to_rhp(
    lat, lng, resolution: int, plane: bool = True, cfg: EngineConfig = WGS84_003
):
    """Point -> SUID string (rhp_wrappers.py:46-77).  Accepts scalars
    (returns str/None) or arrays (returns object array with None)."""
    scalar = np.isscalar(lat)
    la = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    lo = np.atleast_1d(np.asarray(lng, dtype=np.float64))
    u = idx.cell_from_point(cfg, resolution, lo, la, plane=plane)
    out = np.empty(u.shape, dtype=object)
    ok = u != idx.INVALID
    if ok.any():
        out[ok] = su.to_string(u[ok])
    out[~ok] = None
    return out[0] if scalar else out


def rhp_to_geo(
    rhpindex: str, geo_json: bool = True, plane: bool = True, cfg: EngineConfig = WGS84_003
):
    """SUID -> centroid (rhp_wrappers.py:80-120)."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    if plane:
        x, y = idx.centroid(cfg, u, plane=True)
        c = (float(x[0]), float(y[0]))
    else:
        lon, lat = idx.centroid(cfg, u, plane=False)
        c = (float(lon[0]), float(lat[0]))
    return c if geo_json else c[::-1]


def rhp_to_parent(rhpindex: str, res: int = None, cfg: EngineConfig = WGS84_003):
    """rhp_wrappers.py:123-160."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    child_res = len(rhpindex) - 1
    if child_res < 1:
        return rhpindex
    if res is None:
        return rhpindex[:-1]
    if res > child_res:
        return rhpindex
    return rhpindex[: res + 1]


def rhp_to_center_child(rhpindex: str, res: int = None, cfg: EngineConfig = WGS84_003):
    """rhp_wrappers.py:163-215."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    if cfg.N_side % 2 == 0:
        return None
    parent_res = len(rhpindex) - 1
    if res is not None and res < parent_res:
        return rhpindex
    added = 1 if res is None else res - parent_res
    c_index = int((cfg.N_side**2 - 1) / 2)
    return rhpindex + "".join(str(c_index) for _ in range(added))


def rhp_to_geo_boundary(
    rhpindex: str, geo_json: bool = True, plane: bool = True, cfg: EngineConfig = WGS84_003
):
    """rhp_wrappers.py:218-265."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    v = idx.vertices(cfg, u, plane=plane)[0]
    verts = tuple((float(p[0]), float(p[1])) for p in v)
    if not geo_json:
        return tuple(p[::-1] for p in verts)
    return verts + (verts[0],)


def rhp_get_resolution(rhpindex: str, cfg: EngineConfig = WGS84_003):
    if not rhp_is_valid(rhpindex, cfg):
        return None
    return len(rhpindex) - 1


def rhp_get_base_cell(rhpindex: str, cfg: EngineConfig = WGS84_003):
    if not rhp_is_valid(rhpindex, cfg):
        return None
    return rhpindex[0]


def cell_area(
    rhpindex: str, unit: str = "km^2", plane: bool = True, cfg: EngineConfig = WGS84_003
):
    """rhp_wrappers.py:335-368."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    area = cfg.cell_area(len(rhpindex) - 1, plane=plane)
    return area / 10**6 if unit == "km^2" else area


def _hsv_to_rgb_vec(h: np.ndarray, s: float, v: float = 1.0):
    """Vectorized stdlib colorsys.hsv_to_rgb with the exact same float
    expression order, so per-element results match the scalar routine
    bit-for-bit."""
    if s == 0.0:
        V = np.full_like(h, float(v))
        return V, V.copy(), V.copy()
    i = (h * 6.0).astype(np.int64)  # int(h*6.0): trunc toward 0; h >= 0
    f = (h * 6.0) - i
    p = np.full_like(h, v * (1.0 - s))
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i % 6
    V = np.full_like(h, float(v))
    r = np.choose(i, [V, q, p, p, t, V])
    g = np.choose(i, [t, V, V, q, p, p])
    b = np.choose(i, [p, p, t, V, V, q])
    return r, g, b


def cell_color_u64(
    u: np.ndarray, saturation: float = 0.5, cfg: EngineConfig = WGS84_003
):
    """Vectorized ``Cell.color`` (reference cell.py:1489-1504): a unique
    RGB per cell from an HSV hue derived from the SUID digits —
    hue = face_index/6 + (sum_i digit_i * N^(-2 i))/6, then
    colorsys.hsv_to_rgb(hue, saturation, 1).  Both stages replay the
    reference's float operation order (left-to-right digit sum, the
    two /6.0 divisions kept separate) for bit-identical results."""
    u = np.asarray(u, dtype=np.uint64)
    face, digits, res = su.unpack(u)
    N = cfg.N_side
    hue = face.astype(np.float64) / 6.0
    rmax = int(res.max()) if len(res) else 0
    acc = np.zeros(len(u), dtype=np.float64)
    for i in range(1, rmax + 1):
        # adding exact 0.0 beyond a row's resolution preserves parity
        acc = acc + np.where(
            res >= i, digits[:, i - 1].astype(np.float64) * (N ** (-2 * i)), 0.0
        )
    hue = hue + acc / 6.0
    return _hsv_to_rgb_vec(hue, float(saturation))


def cell_color(rhpindex: str, saturation: float = 0.5, cfg: EngineConfig = WGS84_003):
    """Scalar ``Cell.color`` workalike (reference cell.py:1489-1504)."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    r, g, b = cell_color_u64(su.from_string([rhpindex]), saturation, cfg)
    return (float(r[0]), float(g[0]), float(b[0]))


def cell_ring(rhpindex: str, k: int = 1, cfg: EngineConfig = WGS84_003):
    """rhp_wrappers.py:371-468."""
    if not rhp_is_valid(rhpindex, cfg) or k < 0:
        return None
    ring = tp.cell_ring(cfg, int(su.from_string([rhpindex])[0]), k)
    return [_s(c) for c in ring]


def k_ring(rhpindex: str, k: int = 1, cfg: EngineConfig = WGS84_003):
    """rhp_wrappers.py:471-507."""
    if not rhp_is_valid(rhpindex, cfg) or k < 0:
        return None
    cells = tp.k_ring(cfg, int(su.from_string([rhpindex])[0]), k)
    return [_s(c) for c in cells]


def compress_order_cells(cells) -> list[str]:
    """Merge complete 9-sibling groups into parents and alphanumeric-sort
    (conversion.py:114-135)."""

    def alphanum_key(key):
        return [int(c) if c.isdigit() else c for c in re.split("([0-9]+)", key)]

    cells = set(cells)
    upper: dict[str, list[str]] = {}
    for cell in cells:
        upper.setdefault(cell[:-1], []).append(cell)
    out: list[str] = []
    for k, v in upper.items():
        if len(v) == 9:
            out.append(k)
        else:
            out.extend(v)
    return sorted(out, key=alphanum_key)


def polyfill(
    geometry,
    res: int,
    plane: bool = True,
    compress: bool = False,
    cfg: EngineConfig = WGS84_003,
):
    """Polygon -> cell set by centroid containment
    (rhp_wrappers.py:510-599).  ``geometry`` is a
    core.geometry.Polygon/MultiPolygon (shapely is unavailable here; the
    types are structurally identical).  Malformed geometry (empty,
    self-intersecting, overlapping members, zero area) returns None
    exactly like the reference (rhp_wrappers.py:555-557, 810-827)."""
    if geo.malformed_geometry(geometry):
        return None
    if geometry.geom_type == "Polygon":
        geoms = [geometry]
    else:
        geoms = list(geometry.geoms)

    cells: set[str] = set()
    for geom in geoms:
        bbox = geom.bounds
        nw = (bbox[0], bbox[3])
        se = (bbox[2], bbox[1])
        roi = cov.cells_from_region(cfg, res, nw, se, plane)
        if not roi:
            continue
        flat = np.array([c for row in roi for c in row], dtype=np.uint64)
        if plane:
            cx, cy = idx.centroid(cfg, flat, plane=True)
        else:
            cx, cy = idx.centroid(cfg, flat, plane=False)
        inside = geo.points_in_polygon(cx, cy, geom)
        for c in flat[inside]:
            cells.add(_s(int(c)))
    if compress:
        cells = set(compress_order_cells(cells))
    return cells


def linetrace(
    geometry, res: int, plane: bool = True, cfg: EngineConfig = WGS84_003
):
    """Line -> ordered cell list with sequential dedup
    (rhp_wrappers.py:602-674, 849-866).  Malformed lines (empty,
    wrong type, zero length) return None like the reference
    (rhp_wrappers.py:636-638, 830-846)."""
    if geo.malformed_lines(geometry):
        return None
    if geometry.geom_type == "LineString":
        lines = [geometry]
    else:
        lines = list(geometry.geoms)
    cells: list[str] = []
    for line in lines:
        for i, j in zip(line.coords, line.coords[1:]):
            seg = cov.cells_from_line(cfg, res, i, j, plane)
            cells.extend(_s(c) for c in seg)
        # sequential dedup
        trimmed = []
        prev = None
        for c in cells:
            if c != prev:
                trimmed.append(c)
                prev = c
        cells = trimmed
    return cells


# ---------------------------------------------------------------------------
# Round-2 operator surface: ordering, row/col, ranges, boundaries,
# containment, conversion, seeded sampling
# ---------------------------------------------------------------------------

def rhp_successor(rhpindex: str, cfg: EngineConfig = WGS84_003):
    """cell.py:317-376 (same-resolution successor)."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    nxt = su.successor(su.from_string([rhpindex]), cfg)[0]
    return None if int(nxt) == 0 else _s(int(nxt))


def rhp_predecessor(rhpindex: str, cfg: EngineConfig = WGS84_003):
    """cell.py:378-435 (same-resolution predecessor)."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    prv = su.predecessor(su.from_string([rhpindex]), cfg)[0]
    return None if int(prv) == 0 else _s(int(prv))


def rhp_suid_rowcol(rhpindex: str, cfg: EngineConfig = WGS84_003):
    """cell.py:269-291: (row suid, col suid) as strings."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    r, c = su.suid_rowcol(su.from_string([rhpindex]), cfg)
    return _s(int(r[0])), _s(int(c[0]))


def rhp_interval(a: str, b: str, cfg: EngineConfig = WGS84_003):
    """dggs.py:710-735: post-order interval cell list."""
    if not (rhp_is_valid(a, cfg) and rhp_is_valid(b, cfg)):
        return None
    ua = int(su.from_string([a])[0])
    ub = int(su.from_string([b])[0])
    return [_s(int(c)) for c in su.interval_cells(ua, ub, cfg)]


def num_cells(res_1: int, res_2: int = None, subcells: bool = False,
              cfg: EngineConfig = WGS84_003) -> int:
    """dggs.py:633-669 closed forms."""
    k = cfg.N_side**2
    if subcells:
        if res_2 is None or res_2 < res_1:
            res_2 = cfg.max_resolution
        return int((k ** (res_2 - res_1 + 1) - 1) / (k - 1))
    if res_2 is None or res_2 < res_1:
        res_2 = res_1
    return int(6 * (k ** (res_2 + 1) - k**res_1) / (k - 1))


def rhp_xy_range(rhpindex: str, cfg: EngineConfig = WGS84_003):
    """cell.py:734-754: ((x_min, x_max), (y_min, y_max)) planar."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    x1, x2, y1, y2 = idx.xy_range(cfg, u)
    return (float(x1[0]), float(x2[0])), (float(y1[0]), float(y2[0]))


def rhp_boundary(rhpindex: str, n: int = 2, plane: bool = True,
                 interior: bool = False, cfg: EngineConfig = WGS84_003):
    """cell.py:756-831: 4n-4 boundary points, clockwise."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    pts = idx.boundary(cfg, u, n=n, plane=plane, interior_nudge=interior)[0]
    return [tuple(p) for p in pts]


def rhp_interior(rhpindex: str, n: int = 2, plane: bool = True,
                 flatten: bool = False, cfg: EngineConfig = WGS84_003):
    """cell.py:833-883: n x n interior sample grid (row-major)."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    g = idx.interior_grid(cfg, u, n=n, plane=plane)[0]
    if flatten:
        # reference flattens column-major (j outer, i inner)
        return [tuple(g[i, j]) for j in range(n) for i in range(n)]
    return [[tuple(g[i, j]) for j in range(n)] for i in range(n)]


def rhp_contains(rhpindex: str, p, plane: bool = True,
                 cfg: EngineConfig = WGS84_003):
    """cell.py:885-907: point-in-cell via cell_from_point equality."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    return bool(
        idx.contains(cfg, u, np.asarray([p[0]]), np.asarray([p[1]]), plane=plane)[0]
    )


def rhp_overlaps(a: str, b: str, cfg: EngineConfig = WGS84_003):
    """cell.py:959-972: SUID common-prefix overlap."""
    if not (rhp_is_valid(a, cfg) and rhp_is_valid(b, cfg)):
        return None
    return bool(su.overlaps(su.from_string([a]), su.from_string([b]))[0])


def rhp_region_overlaps(a: str, region, cfg: EngineConfig = WGS84_003):
    """cell.py:974-984."""
    if not rhp_is_valid(a, cfg):
        return None
    ua = su.from_string([a])
    ur = su.from_string(list(region))
    return bool(su.region_overlaps(ua, ur)[0])


def get_finest_containing_cell(poly, cfg: EngineConfig = WGS84_003):
    """conversion.py:7-36; returns a SUID string or None."""
    from rhealpixdggs_py_ray.core import conversion as cz

    u = cz.get_finest_containing_cell(poly, cfg)
    return None if u is None else _s(int(u))


def cell_zone_from_poly(poly, res_limit: int, cfg: EngineConfig = WGS84_003):
    """conversion.py:40-111; [(SUID string, kind), ...]."""
    from rhealpixdggs_py_ray.core import conversion as cz

    return [(_s(int(u)), k) for u, k in cz.cell_zone_from_poly(poly, res_limit, cfg)]


def seeded_random_cell(i: int, max_res: int = 10, cfg: EngineConfig = WGS84_003) -> str:
    """Deterministic stand-in for dggs.random_cell (dggs.py:1352-1370):
    every random draw is replaced by splitmix64 bit fields of the seed
    ``i``, so the sampler is reproducible and SQL-mirrorable."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    h = int(splitmix64(np.asarray([i], dtype=np.uint64))[0])
    res = h % (max_res + 1)
    face = (h >> 4) % 6
    out = [CELLS0[face]]
    for j in range(1, res + 1):
        out.append(((h >> (8 + 5 * j)) & 31) % cfg.N_side**2)
    return "".join(str(x) for x in out)


def seeded_random_point(i: int, cfg: EngineConfig = WGS84_003):
    """Deterministic stand-in for dggs.random_point (dggs.py:1333-1350):
    a uniform planar point in a splitmix-chosen res-0 cell."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    h = int(splitmix64(np.asarray([i], dtype=np.uint64))[0])
    h2 = int(splitmix64(np.asarray([i + 10_000_019], dtype=np.uint64))[0])
    face = h % 6
    u1 = (h >> 11) / float(1 << 53)
    v1 = (h2 >> 11) / float(1 << 53)
    w0 = cfg.cell_width(0)
    x = cfg.ul_vertex[face, 0] + u1 * w0
    y = cfg.ul_vertex[face, 1] - v1 * w0
    return float(x), float(y)


def rhp_subcells(rhpindex: str, res: int = None, cfg: EngineConfig = WGS84_003):
    """All resolution-``res`` subcells of a cell, in digit order
    (cell.py:456-481); ``res=None`` yields the direct children."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    L = len(rhpindex) - 1
    if res is None:
        res = L + 1
    if res < L:
        return []
    if res == L:
        return [rhpindex]
    K = cfg.N_side**2
    # vectorized digit enumeration: base-K counter over res-L levels
    depth = res - L
    i = np.arange(K**depth, dtype=np.int64)
    out = np.full(len(i), rhpindex, dtype=object)
    suffix = np.zeros((len(i), depth), dtype=np.int64)
    v = i.copy()
    for d in range(depth - 1, -1, -1):
        suffix[:, d] = v % K
        v //= K
    return [
        rhpindex + "".join(str(x) for x in row) for row in suffix
    ]


def seeded_random_point_in_cell(rhpindex: str, i: int,
                                cfg: EngineConfig = WGS84_003):
    """Deterministic stand-in for Cell.random_point (cell.py:1448-1487):
    a splitmix64-uniform planar point inside the given cell."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    x, y = idx.ul_vertex(cfg, u)
    w = float(idx.width_of(cfg, u)[0])
    h1 = int(splitmix64(np.asarray([i], dtype=np.uint64))[0])
    h2 = int(splitmix64(np.asarray([i + 7_777_777], dtype=np.uint64))[0])
    u1 = (h1 >> 11) / float(1 << 53)
    v1 = (h2 >> 11) / float(1 << 53)
    return float(x[0] + u1 * w), float(y[0] - v1 * w)


# ---------------------------------------------------------------------------
# True-RNG sampling mode (VERDICT r2 item 6)
#
# The seeded_random_* variants above replace every draw with splitmix64
# bit fields so the driver oracles can replay them in SQL.  The rng=
# mode below matches the REFERENCE's sampling instead — uniform
# longitude plus the authalic-sphere latitude trick (an equiareal
# diffeomorphism, so uniform there is uniform on the ellipsoid), with
# the same pole-avoidance band and cap-cell rejection loop
# (ellipsoids.py:149-209, dggs.py:1333-1370, cell.py:1448-1487).
# ---------------------------------------------------------------------------

def _rng_randint(rng, lo: int, hi: int) -> int:
    """Inclusive randint over stdlib random.Random or numpy Generator."""
    if hasattr(rng, "randint"):
        return int(rng.randint(lo, hi))
    return int(rng.integers(lo, hi + 1))


def _rng_uniform(rng, lo: float, hi: float) -> float:
    if hasattr(rng, "uniform"):
        return float(rng.uniform(lo, hi))
    return float(rng.random() * (hi - lo) + lo)


def ellipsoid_random_point(
    rng,
    lam_min: float = -180.0,
    lam_max: float = 180.0,
    phi_min: float = -90.0,
    phi_max: float = 90.0,
    cfg: EngineConfig = WGS84_003,
):
    """Uniform point on the ellipsoid section (degrees), the
    reference's authalic-sphere sampler (ellipsoids.py:149-209)."""
    import math

    from rhealpixdggs_py_ray.core.utils import auth_lat

    lam0, lam1, phi0, phi1 = (
        math.radians(lam_min),
        math.radians(lam_max),
        math.radians(phi_min),
        math.radians(phi_max),
    )
    while True:
        u = _rng_uniform(rng, 0.0, 1.0)
        lam = (lam1 - lam0) * u + lam0
        if lam < lam1:
            break
    delta = math.pi / 360
    while True:
        v = _rng_uniform(rng, 0.0, 1.0)
        if cfg.e == 0:
            phi = math.asin(
                (math.sin(phi1) - math.sin(phi0)) * v + math.sin(phi0)
            )
        else:
            beta0 = float(auth_lat(np.asarray(phi0), cfg, radians=True))
            beta1 = float(auth_lat(np.asarray(phi1), cfg, radians=True))
            beta = math.asin(
                (math.sin(beta1) - math.sin(beta0)) * v + math.sin(beta0)
            )
            phi = float(
                auth_lat(np.asarray(beta), cfg, inverse=True, radians=True)
            )
        if abs(phi) <= math.pi / 2 - delta:
            break
    return math.degrees(lam), math.degrees(phi)


def cell_random_point_rng(
    rhpindex: str, rng, plane: bool = True, cfg: EngineConfig = WGS84_003
):
    """Cell.random_point with an explicit rng (cell.py:1448-1487):
    planar = uniform in the cell square; ellipsoidal = authalic-sphere
    sampling over the vertex envelope (cap envelopes widened exactly
    like the reference) with rejection against ``contains``."""
    if not rhp_is_valid(rhpindex, cfg):
        return None
    u = su.from_string([rhpindex])
    verts = idx.vertices(cfg, u, plane=plane)[0]
    u_min = float(verts[:, 0].min())
    u_max = float(verts[:, 0].max())
    v_min = float(verts[:, 1].min())
    v_max = float(verts[:, 1].max())
    if plane:
        return (
            _rng_uniform(rng, u_min, u_max),
            _rng_uniform(rng, v_min, v_max),
        )
    if idx.shape_of(cfg, u)[0] == idx.SHAPE_CAP:
        u_max = 180.0
        if v_min > 0:
            v_max = 90.0
        else:
            v_min = -90.0
    elif u_max - u_min > 180.0:
        # Cell crosses the antimeridian (engine vertices wrap lon to
        # (-180, 180], so the east corner of face R comes back as -180
        # and the naive envelope is the cell's complement).  Unwrap to
        # [0, 360) for the envelope, wrap samples back before testing.
        lons = verts[:, 0]
        lons = np.where(lons < 0, lons + 360.0, lons)
        u_min = float(lons.min())
        u_max = float(lons.max())
    while True:
        lam, phi = ellipsoid_random_point(rng, u_min, u_max, v_min, v_max, cfg)
        if lam > 180.0:
            lam -= 360.0
        if idx.contains(
            cfg, u, np.asarray([lam]), np.asarray([phi]), plane=False
        )[0]:
            return lam, phi


def random_point_rng(rng, plane: bool = True, cfg: EngineConfig = WGS84_003):
    """dggs.random_point with an explicit rng (dggs.py:1333-1350):
    uniform res-0 cell, then a random point in it."""
    face = CELLS0[_rng_randint(rng, 0, 5)]
    return cell_random_point_rng(face, rng, plane=plane, cfg=cfg)


def random_cell_rng(
    rng, resolution: int | None = None, max_res: int = 10,
    cfg: EngineConfig = WGS84_003,
) -> str:
    """dggs.random_cell with an explicit rng (dggs.py:1352-1370)."""
    if resolution is None:
        resolution = _rng_randint(rng, 0, max_res)
    out = [CELLS0[_rng_randint(rng, 0, 5)]]
    for _ in range(1, resolution + 1):
        out.append(_rng_randint(rng, 0, cfg.N_side**2 - 1))
    return "".join(str(x) for x in out)
