"""Region / line -> cell-cover builders.

Re-expresses RHEALPixDGGS.cell_latitudes, cells_from_parallel,
cells_from_meridian, cells_from_region, cells_from_line, minimal_cover
(dggs.py:909-1410) plus Cell.intersects_meridian/_parallel
(cell.py:909-957) over packed uint64 cells.

These builders produce the SMALL side of the engine's spatial joins
(polygon cover sets, broadcast to every task; SURVEY.md §3.2/§4) and so
run driver-side, scalar, exactly reproducing the reference's walk order
— including its west->east / north->south output ordering, which the
distributed side then re-derives with ``ds.sort(cell_u64)``.
"""

from __future__ import annotations

import math

import numpy as np

from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import projection as prj
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import topology as tp
from rhealpixdggs_py_ray.core.config import EngineConfig


def _shape_name(cfg, u: int) -> str:
    return idx.SHAPE_NAMES[int(idx.shape_of(cfg, np.asarray([u], dtype=np.uint64))[0])]


def cell_latitudes(
    cfg: EngineConfig,
    resolution: int,
    phi_min: float,
    phi_max: float,
    nucleus: bool = True,
    plane: bool = True,
) -> list[float]:
    """Latitudes of cell nuclei (or boundaries) in a band
    (dggs.py:909-1004).  Scalar float accumulation mirrors the reference
    exactly so band-edge membership decisions agree."""
    if phi_min > phi_max:
        return []
    R = cfg.R_A
    pi = math.pi
    if plane:
        y_min, y_max = phi_min, phi_max
    else:
        y_min = float(prj.forward(cfg, np.array([0.0]), np.array([phi_min]), proj="healpix")[1][0])
        y_max = float(prj.forward(cfg, np.array([0.0]), np.array([phi_max]), proj="healpix")[1][0])
    w = cfg.cell_width(resolution)
    if cfg.N_side % 2 == 1:
        y = -R * pi / 2 + w if nucleus else -R * pi / 2 + w / 2
    else:
        if resolution == 0:
            y = 0 if nucleus else -R * pi / 4
        else:
            y = -R * pi / 2 + w / 2 if nucleus else -R * pi / 2 + w
    if y <= y_min:
        dy = y_min - y
        y = max(y + int(math.ceil(dy / w)) * w, y + w)
    result = []
    while y < y_max:
        result.append(y)
        y += w
    if not plane:
        ys = np.array(result, dtype=np.float64)
        if ys.size:
            _, lat, _ = prj.inverse(
                cfg, np.full(ys.shape, R * pi / 4), ys, proj="healpix"
            )
            result = [float(v) for v in lat]
    return result


def intersects_meridian(cfg: EngineConfig, u: int, lam: float) -> bool:
    """cell.py:909-939."""
    if _shape_name(cfg, u) == "cap":
        return True
    v = idx.vertices(cfg, np.asarray([u], dtype=np.uint64), plane=False)[0]
    lon_min = v[:, 0].min()
    lon_max = v[:, 0].max()
    PI = cfg.pi()
    if abs(lon_min - lon_max) > PI:
        lon_min = -lon_max
        return lon_max <= lam or lam <= lon_min
    return lon_min <= lam <= lon_max


def intersects_parallel(cfg: EngineConfig, u: int, phi: float) -> bool:
    """cell.py:941-957."""
    v = idx.vertices(cfg, np.asarray([u], dtype=np.uint64), plane=False)[0]
    lat_min = v[:, 1].min()
    lat_max = v[:, 1].max()
    if _shape_name(cfg, u) == "cap":
        reg = int(idx.region_of(np.asarray([u], dtype=np.uint64))[0])
        return phi >= lat_min if reg == 1 else phi <= lat_max
    return lat_min <= phi <= lat_max


def _cell_from_point_scalar(cfg, resolution, p, plane):
    c = idx.cell_from_point(
        cfg, resolution, np.asarray([p[0]], dtype=np.float64),
        np.asarray([p[1]], dtype=np.float64), plane=plane
    )[0]
    return None if c == idx.INVALID else int(c)


def cells_from_parallel(
    cfg: EngineConfig, resolution: int, phi: float, lam_min: float, lam_max: float
) -> list[int]:
    """dggs.py:1060-1094: east-neighbor walk along a parallel."""
    if lam_min > lam_max:
        return []
    start = _cell_from_point_scalar(cfg, resolution, (lam_min, phi), plane=False)
    end = _cell_from_point_scalar(cfg, resolution, (lam_max, phi), plane=False)
    PI = cfg.pi()
    if start == end:
        if _shape_name(cfg, start) == "cap" or lam_max - lam_min < PI / 2:
            return [start]
        end = tp.neighbors(cfg, start, plane=False)["west"]
    result = []
    current = start
    while current != end:
        result.append(current)
        current = tp.neighbors(cfg, current, plane=False)["east"]
    result.append(end)
    return result


def cells_from_meridian(
    cfg: EngineConfig, resolution: int, lam: float, phi_min: float, phi_max: float
) -> list[int]:
    """dggs.py:1006-1058."""
    if phi_min > phi_max:
        return []
    start = _cell_from_point_scalar(cfg, resolution, (lam, phi_max), plane=False)
    end = _cell_from_point_scalar(cfg, resolution, (lam, phi_min), plane=False)
    if start == end:
        return [start]
    phis = cell_latitudes(cfg, resolution, phi_min, phi_max, True, plane=False)
    if not phis:
        return [start, end]
    result: list[int] = []
    for phi in reversed(phis):
        c = _cell_from_point_scalar(cfg, resolution, (lam, phi), plane=False)
        new_cells = [c]
        if _shape_name(cfg, c) in ("dart", "skew_quad"):
            nbrs = tp.neighbors(cfg, c, plane=False)
            west = nbrs["west"]
            east = nbrs["east"]
            if intersects_meridian(cfg, west, lam):
                new_cells = [west, c]
            elif intersects_meridian(cfg, east, lam):
                new_cells = [c, east]
        result.extend(new_cells)
    if start not in result[0:2]:
        result.insert(0, start)
    if end not in result[-1:-3]:
        result.append(end)
    return result


def cells_from_region(
    cfg: EngineConfig,
    resolution: int,
    ul,
    dr,
    plane: bool = True,
) -> list[list[int]]:
    """Region -> cover rows (dggs.py:1181-1331).  Planar rectangle via
    right/down neighbor walks; ellipsoidal quad/cap via rows of
    cells_from_parallel.  Output ordering identical to the reference."""
    if ul[0] > dr[0] or ul[1] < dr[1]:
        return []
    if plane:
        ur = _cell_from_point_scalar(cfg, resolution, (dr[0], ul[1]), plane)
        dl = _cell_from_point_scalar(cfg, resolution, (ul[0], dr[1]), plane)
        ulc = _cell_from_point_scalar(cfg, resolution, ul, plane)
        drc = _cell_from_point_scalar(cfg, resolution, dr, plane)
        if ur is None or dl is None:
            return []
        if ulc == drc:
            return [[ulc]]
        result = []
        row_start, row_end = ulc, ur
        while True:
            row = []
            current = row_start
            while current != row_end:
                row.append(current)
                current = int(tp.neighbor(cfg, np.asarray([current], dtype=np.uint64), 1)[0])  # right
            row.append(current)
            result.append(row)
            if current == drc:
                break
            row_start = int(tp.neighbor(cfg, np.asarray([row_start], dtype=np.uint64), 2)[0])  # down
            row_end = int(tp.neighbor(cfg, np.asarray([row_end], dtype=np.uint64), 2)[0])
        return result

    # Ellipsoidal quad or cap region.
    phi_min, phi_max = dr[1], ul[1]
    phis = cell_latitudes(cfg, resolution, phi_min, phi_max, True, plane)
    PI = cfg.pi()
    if (tuple(ul) == (-PI, PI / 2) and dr[0] == -PI) or (
        tuple(dr) == (-PI, -PI / 2) and ul[0] == -PI
    ):
        lam_min, lam_max = -PI, PI
    else:
        lam_min, lam_max = ul[0], dr[0]
    result = []
    for phi in reversed(phis):
        result.append(cells_from_parallel(cfg, resolution, phi, lam_min, lam_max))
    ul_cell = _cell_from_point_scalar(cfg, resolution, ul, plane)
    if not result or result[0][0] != ul_cell:
        result.insert(0, cells_from_parallel(cfg, resolution, phi_max, lam_min, lam_max))
    dl_cell = _cell_from_point_scalar(cfg, resolution, (ul[0], dr[1]), plane)
    if not result or result[-1][0] != dl_cell:
        result.append(cells_from_parallel(cfg, resolution, phi_min, lam_min, lam_max))
    return result


def antimeridian_check_and_flip(cfg: EngineConfig, vertices, plane: bool = True):
    """dggs.py:1412-1471."""
    if plane:
        return vertices
    half = math.pi if cfg.radians else 180.0
    lngs = [v[0] for v in vertices]
    if half not in lngs and -half not in lngs:
        return vertices
    check = half if half in lngs else -half
    fine = True
    for lng in lngs:
        if lng != check and lng * check < 0:
            fine = False
            break
    if fine:
        return vertices
    lngs = [lng if lng != check else -lng for lng in lngs]
    return [(lng, v[1]) for lng, v in zip(lngs, vertices)]


def cells_from_line(
    cfg: EngineConfig, resolution: int, lstart, lend, plane: bool = True
) -> list[int]:
    """Neighbor walk along a segment (dggs.py:1096-1179), with the
    reference's own limitations (no antimeridian crossing; cap cells
    documented-broken, dggs.py:1110-1114)."""
    start = _cell_from_point_scalar(cfg, resolution, lstart, plane)
    end = _cell_from_point_scalar(cfg, resolution, lend, plane)
    line_cells: list[int] = []
    if start is None or end is None:
        return line_cells
    if start == end:
        return [start]
    current = start
    while current != end:
        line_cells.append(current)
        nns = tp.neighbors(cfg, current, plane=plane)
        following = None
        for key in nns:
            nn = nns[key]
            verts = [
                (float(p[0]), float(p[1]))
                for p in idx.vertices(cfg, np.asarray([nn], dtype=np.uint64), plane=plane)[0]
            ]
            verts.append(verts[0])
            for a, b in zip(verts, verts[1:]):
                if following:
                    break
                a2, b2 = antimeridian_check_and_flip(cfg, [a, b], plane=plane)
                if geo.segments_intersect(lstart, lend, a2, b2) and nn not in line_cells:
                    following = nn
        if not following:
            current = end
        else:
            current = following
    line_cells.append(end)
    return line_cells


def minimal_cover(
    cfg: EngineConfig, resolution: int, points, plane: bool = True
) -> list[int]:
    """Distinct cells covering a point list (dggs.py:1372-1410);
    first-seen order like the reference's dict insertion order."""
    xs = np.asarray([p[0] for p in points], dtype=np.float64)
    ys = np.asarray([p[1] for p in points], dtype=np.float64)
    cells = idx.cell_from_point(cfg, resolution, xs, ys, plane=plane)
    seen: dict[int, None] = {}
    for c in cells:
        seen[int(c)] = None
    return list(seen.keys())
