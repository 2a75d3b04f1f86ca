"""Polygon -> cell-zone conversion (reference conversion.py:7-111).

``get_finest_containing_cell`` descends the cell tree to the finest
single cell containing a polygon; ``cell_zone_from_poly`` is the
quadtree polyfill with containment kinds ("bounding poly" /
"fully contained" / "nucleus") that the reference's only end-to-end
corpus (tests/test_conversion.py catchment, ~500 frozen res-9 SUIDs)
exercises.

Differences from the reference, by design:
- shapely is replaced by the engine's ray-casting / segment-crossing
  geometry kernels (core/geometry.py); ``contains`` = all vertices
  inside + no boundary crossing, and the recursion condition mirrors
  shapely ``overlaps`` (intersects and neither contains the other) —
  including the reference's quirk of NOT descending into a child that
  fully contains the polygon;
- each tree level is classified as one vectorized batch (vertices of
  the whole frontier in one inverse-projection call) instead of one
  shapely Polygon per cell.

The frozen reference corpus is pinned in tests/test_conversion.py.
"""

from __future__ import annotations

import numpy as np

from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core.config import EngineConfig, WGS84_003

KIND_BOUNDING = "bounding poly"
KIND_CONTAINED = "fully contained"
KIND_NUCLEUS = "nucleus"


def _ring_contains_polygon(ring, poly: geo.Polygon) -> bool:
    """The ring's polygon fully contains ``poly`` (all shell vertices
    inside, no boundary crossing)."""
    sx = np.array([p[0] for p in poly.shell])
    sy = np.array([p[1] for p in poly.shell])
    if not geo.points_in_ring(sx, sy, ring).all():
        return False
    m = len(poly.shell)
    for i in range(m):
        if geo.segment_intersects_ring(
            poly.shell[i], poly.shell[(i + 1) % m], ring
        ):
            return False
    return True


def _children(u: int, cfg: EngineConfig) -> np.ndarray:
    res = int(su.resolution_of(np.asarray([u], dtype=np.uint64))[0])
    K = cfg.N_side**2
    base = (np.uint64(u) & ~np.uint64(0xF)) | np.uint64(res + 1)
    out = np.full(K, base, dtype=np.uint64)
    return su.with_digit(out, res + 1, np.arange(K, dtype=np.uint64))


def _cell_rings(cfg: EngineConfig, cells: np.ndarray) -> np.ndarray:
    """(m, 4, 2) ellipsoidal vertex rings for a frontier batch."""
    return idx.vertices(cfg, np.asarray(cells, dtype=np.uint64), plane=False)


def get_finest_containing_cell(
    poly: geo.Polygon, cfg: EngineConfig = WGS84_003
):
    """Finest single cell containing ``poly`` (conversion.py:7-36);
    returns a packed uint64 or None."""
    for face in range(6):
        u = int(np.uint64(face) << np.uint64(60))
        found = _descend_finest(poly, u, cfg)
        if found is not None:
            return found
    return None


def _descend_finest(poly, u: int, cfg: EngineConfig):
    res = int(su.resolution_of(np.asarray([u], dtype=np.uint64))[0])
    if res < su.MAX_PACK_RESOLUTION:
        kids = _children(u, cfg)
        rings = _cell_rings(cfg, kids)
        for k in range(len(kids)):
            ring = [tuple(p) for p in rings[k]]
            if _ring_contains_polygon(ring, poly):
                return _descend_finest(poly, int(kids[k]), cfg)
    ring = [tuple(p) for p in _cell_rings(cfg, np.asarray([u], dtype=np.uint64))[0]]
    if _ring_contains_polygon(ring, poly):
        return u
    return None


def cell_zone_from_poly(
    poly: geo.Polygon,
    res_limit: int,
    cfg: EngineConfig = WGS84_003,
    bounding_cell: int | None = None,
) -> list[tuple[int, str]]:
    """Quadtree polyfill with containment kinds
    (conversion.py:40-111).  Returns [(packed cell, kind), ...] in the
    reference's depth-first emit order."""
    if bounding_cell is None:
        bounding_cell = get_finest_containing_cell(poly, cfg)
        if bounding_cell is None:
            return []
    out: list[tuple[int, str]] = []
    _zone_descend(poly, int(bounding_cell), res_limit, cfg, out, bounding=True)
    return out


def _zone_descend(poly, u: int, res_limit: int, cfg: EngineConfig,
                  out: list, bounding: bool = False) -> None:
    ring = [tuple(p) for p in _cell_rings(cfg, np.asarray([u], dtype=np.uint64))[0]]
    if geo.polygon_contains_ring(poly, ring):
        # edge case: polygon covers the bounding cell itself
        out.append((u, KIND_BOUNDING if bounding else KIND_CONTAINED))
        return
    res = int(su.resolution_of(np.asarray([u], dtype=np.uint64))[0])
    if res + 1 > res_limit:
        return
    kids = _children(u, cfg)
    rings = _cell_rings(cfg, kids)
    at_limit = res + 1 == res_limit
    if at_limit:
        nlon, nlat = idx.nucleus(cfg, kids, plane=False)
    for k in range(len(kids)):
        kring = [tuple(p) for p in rings[k]]
        if geo.polygon_contains_ring(poly, kring):
            out.append((int(kids[k]), KIND_CONTAINED))
        elif at_limit:
            if geo.points_in_polygon(
                np.asarray([nlon[k]]), np.asarray([nlat[k]]), poly
            )[0]:
                out.append((int(kids[k]), KIND_NUCLEUS))
        else:
            # mirror shapely `overlaps`: intersecting, and the child
            # does NOT fully contain the polygon (reference quirk)
            if geo.polygon_overlaps_ring(poly, kring) and not _ring_contains_polygon(
                kring, poly
            ):
                _zone_descend(poly, int(kids[k]), res_limit, cfg, out)
