"""DuckDB oracle-SQL generators for the driver's correctness gate.

The driver runs each Ray pipeline from ``__ray_entry__.queries()`` AND
the matching ANSI-SQL string from ``oracle_sql()`` side-by-side and
compares row counts, schemas and order-insensitive value hashes.  For
the hash to match, float64 outputs must be *bit-identical* — so these
generators re-express the engine's kernels (projection, SUID digit
extraction, coordinate derivation) as SQL arithmetic that mirrors the
numpy kernels operation-for-operation:

- every ellipsoid-derived constant (R_A, authalic series coefficients,
  face ul-vertices, cell widths) is computed once here in Python and
  embedded as a ``repr`` float literal, which round-trips exactly;
- DuckDB's ``sin``/``sqrt``/``floor``/``radians`` were verified
  ULP-identical to numpy's in this environment (both bind libm /
  IEEE-754 correctly-rounded kernels);
- the *forward* rHEALPix chain (auth_lat series -> healpix_sphere ->
  combine_triangles -> face/digit extraction) contains no ``asin`` /
  ``atan2``, the only libm calls whose last-ULP behavior differs, so
  full value parity is achievable for ``cell_from_point`` itself
  (reference semantics: dggs.py:737-831 + pj_rhealpix.py:260-411).

Engine kernels mirrored here live in core/projection.py, core/index.py,
core/suid.py; the shared deterministic id->(lon,lat) coordinate rule
for the TPC-H-ish test tables lives in both ``lonlat_from_id`` (numpy)
and ``lonlat_from_id_sql`` below.
"""

from __future__ import annotations

import math

import numpy as np

from rhealpixdggs_py_ray.core.config import CELLS0, EngineConfig, WGS84_003

PI = math.pi


# ---------------------------------------------------------------------------
# Deterministic id -> (lon, lat) rule shared by Ray queries and SQL oracles.
# Two independent 32-bit Knuth multiplicative hashes; every operation is
# exact or identically-rounded in int64/float64 on both sides.
# ---------------------------------------------------------------------------

def lonlat_from_id(ids) -> tuple[np.ndarray, np.ndarray]:
    """numpy side of the coordinate rule (int64 ids)."""
    ids = np.asarray(ids, dtype=np.int64)
    h1 = (ids * 2654435761) % 4294967296
    h2 = ((ids + 1) * 2246822519) % 4294967296
    lon = -180.0 + 360.0 * (h1 / 4294967296.0)
    lat = -84.0 + 168.0 * (h2 / 4294967296.0)
    return lon, lat


def lonlat_from_id_sql(id_expr: str) -> tuple[str, str]:
    """SQL side of the coordinate rule; mirrors lonlat_from_id exactly."""
    h1 = f"((({id_expr}) * 2654435761) % 4294967296)"
    h2 = f"(((({id_expr}) + 1) * 2246822519) % 4294967296)"
    lon = f"(-180.0 + 360.0 * ({h1} / 4294967296.0))"
    lat = f"(-84.0 + 168.0 * ({h2} / 4294967296.0))"
    return lon, lat


# ---------------------------------------------------------------------------
# cell_from_point as SQL (forward projection + face/digit extraction)
# ---------------------------------------------------------------------------

def _lit(x: float) -> str:
    """Exact float64 literal (repr round-trips)."""
    return repr(float(x))


def _proj_parts(cfg: EngineConfig):
    """Shared SQL fragments for the forward projection chain."""
    ns = cfg.north_square % 4
    ss = cfg.south_square % 4
    R = _lit(cfg.R_A)
    pi = _lit(PI)
    if cfg.e == 0:
        beta = "phi"
    else:
        coeffs = cfg.auth_coeffs_fwd
        terms = " + ".join(
            f"({_lit(coeffs[k])})*sin({2 * (k + 1)}*phi)" for k in range(6)
        )
        beta = f"phi + ({terms})"
    phi0 = _lit(math.asin(2.0 / 3))
    sigma = "sqrt(3*(1 - abs(sin(beta))))"
    cap_raw = f"floor(2*lam/{pi} + 2)"
    cap = f"(CASE WHEN {cap_raw} >= 4 THEN 3.0 ELSE {cap_raw} END)"
    lamc = f"(-3*{pi}/4 + ({pi}/2)*cap)"
    hx = f"(CASE WHEN abs(beta) <= {phi0} THEN lam ELSE {lamc} + (lam - {lamc})*sigma END)"
    hy = (
        f"(CASE WHEN abs(beta) <= {phi0} THEN 3*{pi}/8*sin(beta)"
        f" ELSE sign(beta)*({pi}/4)*(2 - sigma) END)"
    )
    tri = (
        f"(CASE WHEN hx < -{pi}/2 THEN 0 WHEN hx < 0 THEN 1"
        f" WHEN hx < {pi}/2 THEN 2 ELSE 3 END)"
    )
    qn = f"((((tri - {ns}) % 4) + 4) % 4)"
    qs = f"(((-(tri - {ss}) % 4) + 4) % 4)"
    q = f"(CASE WHEN hy > {pi}/4 THEN {qn} ELSE {qs} END)"
    cq = "(CASE q WHEN 0 THEN 1.0 WHEN 1 THEN 0.0 WHEN 2 THEN -1.0 ELSE 0.0 END)"
    sq = "(CASE q WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 WHEN 2 THEN 0.0 ELSE -1.0 END)"
    tcx = f"(-3*{pi}/4 + tri*({pi}/2))"
    tcy = f"(sign(hy)*({pi}/2))"
    ux = (
        f"(CASE WHEN hy > {pi}/4 THEN -3*{pi}/4 + {ns}*({pi}/2)"
        f" ELSE -3*{pi}/4 + {ss}*({pi}/2) END)"
    )
    uy = f"(CASE WHEN hy > {pi}/4 THEN {pi}/2 ELSE -({pi}/2) END)"
    xo = f"(({cq}*(hx - {tcx}) + (-{sq})*(hy - {tcy})) + {ux})"
    yo = f"(({sq}*(hx - {tcx}) + {cq}*(hy - {tcy})) + {uy})"
    polar = f"(abs(hy) > {pi}/4)"
    rx = f"({R} * (CASE WHEN {polar} THEN {xo} ELSE hx END))"
    ry = f"({R} * (CASE WHEN {polar} THEN {yo} ELSE hy END))"
    return {
        "beta": beta, "sigma": sigma, "cap": cap, "hx": hx, "hy": hy,
        "tri": tri, "q": q, "rx": rx, "ry": ry, "R": R, "pi": pi,
        "ns": ns, "ss": ss,
    }


def projection_sql(
    points_sql: str, cfg: EngineConfig = WGS84_003,
    id_cols: tuple[str, ...] = ("id",), extra_cols: tuple[str, ...] = (),
) -> str:
    """Subquery: (id_cols..., extra..., lon, lat degrees) -> planar
    (xm, ym) meters via the forward rHEALPix chain (projection.py:forward)."""
    if cfg.lon_0 != 0 or cfg.lat_0 != 0 or cfg.radians:
        raise NotImplementedError("oracle SQL assumes lon_0=lat_0=0, degrees")
    f = 1 - math.sqrt(1 - cfg.e**2)
    if cfg.e != 0 and abs(f) > 1 / 150:
        raise NotImplementedError("oracle SQL implements the series auth-lat path")
    p = _proj_parts(cfg)
    keep = ", ".join(id_cols + extra_cols)
    return (
        f"(WITH pts AS ({points_sql}),"
        f" rr AS MATERIALIZED (SELECT {keep}, radians(lon) AS lam, radians(lat) AS phi FROM pts),"
        f" au AS MATERIALIZED (SELECT {keep}, lam, {p['beta']} AS beta FROM rr),"
        f" h1 AS MATERIALIZED (SELECT {keep}, lam, beta, {p['sigma']} AS sigma FROM au),"
        f" h2 AS MATERIALIZED (SELECT {keep}, lam, beta, sigma, {p['cap']} AS cap FROM h1),"
        f" hp AS MATERIALIZED (SELECT {keep}, {p['hx']} AS hx, {p['hy']} AS hy FROM h2),"
        f" tq AS MATERIALIZED (SELECT {keep}, hx, hy, {p['tri']} AS tri FROM hp),"
        f" tq2 AS MATERIALIZED (SELECT {keep}, hx, hy, tri, {p['q']} AS q FROM tq)"
        f" SELECT {keep}, {p['rx']} AS xm, {p['ry']} AS ym FROM tq2)"
    )


def planar_cell_sql(
    planar_sql: str, resolution: int, cfg: EngineConfig = WGS84_003,
    id_cols: tuple[str, ...] = ("id",), extra_cols: tuple[str, ...] = (),
    keep_invalid: bool = False,
) -> str:
    """Subquery: (id_cols..., xm, ym planar meters) -> cell_id SUID at
    ``resolution`` (index.py:cell_from_point, plane=True path)."""
    p = _proj_parts(cfg)
    ns, ss = p["ns"], p["ss"]
    R, pi = p["R"], p["pi"]
    N = cfg.N_side
    keep = ", ".join(id_cols + extra_cols)
    north_face = (
        f"(ym > {R}*{pi}/4 AND ym < {R}*3*{pi}/4"
        f" AND xm > {R}*(-{pi} + {ns}*({pi}/2))"
        f" AND xm < {R}*(-{pi}/2 + {ns}*({pi}/2)))"
    )
    south_face = (
        f"(ym > (-{R})*3*{pi}/4 AND ym < -({R}*{pi}/4)"
        f" AND xm > {R}*(-{pi} + {ss}*({pi}/2))"
        f" AND xm < {R}*(-{pi}/2 + {ss}*({pi}/2)))"
    )
    eq_band = f"(ym >= -({R}*{pi}/4) AND ym <= {R}*{pi}/4)"
    bins = [
        (f"-{pi}", f"-{pi}/2"),
        (f"-{pi}/2", "0.0"),
        ("0.0", f"{pi}/2"),
        (f"{pi}/2", f"{pi}"),
    ]
    eq_cases = " ".join(
        f"WHEN {eq_band} AND xm >= {R}*({lo}) AND xm < {R}*({hi}) THEN {i + 1}"
        for i, (lo, hi) in enumerate(bins)
    )
    face = (
        f"(CASE WHEN {north_face} THEN 0 WHEN {south_face} THEN 5"
        f" {eq_cases} ELSE -1 END)"
    )
    letter = (
        "(CASE face "
        + " ".join(f"WHEN {i} THEN '{c}'" for i, c in enumerate(CELLS0))
        + " END)"
    )
    if resolution == 0:
        where = "" if keep_invalid else " WHERE face >= 0"
        return (
            f"(WITH pl AS ({planar_sql}),"
            f" fc AS MATERIALIZED (SELECT {keep}, xm, ym, {face} AS face FROM pl)"
            f" SELECT {keep}, {letter} AS cell_id FROM fc{where})"
        )
    w = cfg.cell_width(0)
    smidgen = 0.5 * cfg.cell_width(cfg.max_resolution) / w
    ul = cfg.ul_vertex
    ulx = "(CASE face " + " ".join(
        f"WHEN {i} THEN {_lit(ul[i, 0])}" for i in range(6)
    ) + " END)"
    uly = "(CASE face " + " ".join(
        f"WHEN {i} THEN {_lit(ul[i, 1])}" for i in range(6)
    ) + " END)"
    scale = _lit(float(N**resolution))
    dxe = f"(abs(xm - {ulx}) / {_lit(w)})"
    dye = f"(abs(ym - {uly}) / {_lit(w)})"
    dxs = f"(CASE WHEN dx0 = 1 THEN dx0 - {_lit(smidgen)} ELSE dx0 END)"
    dys = f"(CASE WHEN dy0 = 1 THEN dy0 - {_lit(smidgen)} ELSE dy0 END)"
    digits = "".join(
        f" || CAST(((rw // {N ** (resolution - 1 - i)}) % {N}) * {N}"
        f" + ((cl // {N ** (resolution - 1 - i)}) % {N}) AS VARCHAR)"
        for i in range(resolution)
    )
    if keep_invalid:
        # invalid (off-grid) rows survive with NULL cell_id; digit
        # arithmetic must not run on them (face -1 has no ul vertex)
        return (
            f"(WITH pl AS ({planar_sql}),"
            f" fc AS MATERIALIZED (SELECT {keep}, xm, ym, {face} AS face FROM pl),"
            f" fr AS MATERIALIZED (SELECT {keep}, xm, ym, face,"
            f"        CASE WHEN face >= 0 THEN {dxe} ELSE 0.0 END AS dx0,"
            f"        CASE WHEN face >= 0 THEN {dye} ELSE 0.0 END AS dy0 FROM fc),"
            f" fr2 AS MATERIALIZED (SELECT {keep}, face, {dxs} AS dx, {dys} AS dy FROM fr),"
            f" rc AS MATERIALIZED (SELECT {keep}, face,"
            f"        CAST(floor(dy * {scale}) AS BIGINT) AS rw,"
            f"        CAST(floor(dx * {scale}) AS BIGINT) AS cl FROM fr2)"
            f" SELECT {keep}, CASE WHEN face >= 0 THEN {letter}{digits}"
            f" ELSE NULL END AS cell_id FROM rc)"
        )
    return (
        f"(WITH pl AS ({planar_sql}),"
        f" fc AS MATERIALIZED (SELECT {keep}, xm, ym, {face} AS face FROM pl),"
        f" fr AS MATERIALIZED (SELECT {keep}, xm, ym, face, {dxe} AS dx0, {dye} AS dy0 FROM fc"
        f"        WHERE face >= 0),"
        f" fr2 AS MATERIALIZED (SELECT {keep}, face, {dxs} AS dx, {dys} AS dy FROM fr),"
        f" rc AS MATERIALIZED (SELECT {keep}, face,"
        f"        CAST(floor(dy * {scale}) AS BIGINT) AS rw,"
        f"        CAST(floor(dx * {scale}) AS BIGINT) AS cl FROM fr2)"
        f" SELECT {keep}, {letter}{digits} AS cell_id FROM rc)"
    )


def cell_from_point_sql(
    points_sql: str,
    resolution: int,
    cfg: EngineConfig = WGS84_003,
    id_cols: tuple[str, ...] = ("id",),
    extra_cols: tuple[str, ...] = (),
) -> str:
    """Subquery computing ``cell_id`` (canonical SUID string) for each
    row of ``points_sql`` (id cols + lon/lat degrees).  Composition of
    projection_sql + planar_cell_sql; mirrors core/index.py:
    cell_from_point + core/projection.py:forward exactly."""
    proj = projection_sql(points_sql, cfg, id_cols, extra_cols)
    inner = f"SELECT * FROM {proj} t"
    return planar_cell_sql(inner, resolution, cfg, id_cols, extra_cols)


def cell_from_region_sql(
    pairs_sql: str, cfg: EngineConfig = WGS84_003
) -> str:
    """Smallest single cell containing each ellipsoidal quad
    (index.py:cell_from_region / dggs.py:833-907).  ``pairs_sql`` must
    yield (pair_id, lon1, lat1, lon2, lat2 degrees, two arbitrary
    corner points).  NULL cell_id when the corners fall on different
    faces."""
    res = min(cfg.max_resolution, 14)
    corners = (
        f"WITH pr AS ({pairs_sql}),"
        " ul AS (SELECT pair_id, least(lon1, lon2) AS wlon,"
        "        greatest(lon1, lon2) AS elon, least(lat1, lat2) AS slat,"
        "        greatest(lat1, lat2) AS nlat FROM pr),"
        " cn AS ("
        "  SELECT pair_id, wlon AS lon, nlat AS lat FROM ul UNION ALL"
        "  SELECT pair_id, wlon, slat FROM ul UNION ALL"
        "  SELECT pair_id, elon, slat FROM ul UNION ALL"
        "  SELECT pair_id, elon, nlat FROM ul)"
        " SELECT pair_id, lon, lat FROM cn"
    )
    proj = projection_sql(corners, cfg, id_cols=("pair_id",))
    ext = (
        f"WITH pj AS (SELECT * FROM {proj} t)"
        " SELECT pair_id, min(xm) AS x1, max(ym) AS y1,"
        " max(xm) AS x2, min(ym) AS y2 FROM pj GROUP BY pair_id"
    )
    ca = planar_cell_sql(
        f"SELECT pair_id, x1 AS xm, y1 AS ym FROM ({ext}) e", res, cfg,
        id_cols=("pair_id",), keep_invalid=True,
    )
    cb = planar_cell_sql(
        f"SELECT pair_id, x2 AS xm, y2 AS ym FROM ({ext}) e", res, cfg,
        id_cols=("pair_id",), keep_invalid=True,
    )
    prefix_cases = " ".join(
        f"WHEN substr(a.cell_id, 1, {L}) = substr(b.cell_id, 1, {L})"
        f" THEN substr(a.cell_id, 1, {L})"
        for L in range(res + 1, 0, -1)
    )
    return (
        f"SELECT a.pair_id, CASE {prefix_cases} ELSE NULL END AS cell_id"
        f" FROM {ca} a JOIN {cb} b ON a.pair_id = b.pair_id"
    )


# ---------------------------------------------------------------------------
# Grid enumeration as SQL (suid.py:suid_from_level_order_index)
# ---------------------------------------------------------------------------

def grid_sql(resolution: int, cfg: EngineConfig = WGS84_003) -> str:
    """All 6*N^(2r) cells at a resolution, as SUID strings in canonical
    (level-order index) order — mirrors ``ray.data.range`` +
    suid_from_level_order_index (reference dggs.py:613-631 grid)."""
    N2 = cfg.N_side**2
    total = 6 * N2**resolution
    digits = "".join(
        f" || CAST((i // {N2 ** (resolution - 1 - k)}) % {N2} AS VARCHAR)"
        for k in range(resolution)
    )
    letter = (
        f"(CASE (i // {N2 ** resolution}) "
        + " ".join(f"WHEN {f} THEN '{c}'" for f, c in enumerate(CELLS0))
        + " END)"
    )
    return (
        f"SELECT {letter}{digits} AS cell_id"
        f" FROM (SELECT unnest(generate_series(0, {total - 1})) AS i)"
        f" ORDER BY i"
    )
