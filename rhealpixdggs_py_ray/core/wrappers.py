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
    types are structurally identical)."""
    if geometry is None:
        return None
    if geometry.geom_type == "Polygon":
        geoms = [geometry]
    elif geometry.geom_type == "MultiPolygon":
        geoms = list(geometry.geoms)
    else:
        return None

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
    (rhp_wrappers.py:602-674, 849-866)."""
    if geometry is None:
        return None
    if geometry.geom_type == "LineString":
        lines = [geometry]
    elif geometry.geom_type == "MultiLineString":
        lines = list(geometry.geoms)
    else:
        return None
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
