"""Dependency-free planar geometry primitives.

The reference leans on shapely for polygon/line predicates
(rhp_wrappers.py:510-674, conversion.py, dggs.py:1096-1179).  shapely
is not available in this environment (SURVEY.md §7.0), so the engine
ships its own minimal, vectorized primitives: ray-casting
point-in-polygon (with holes), segment intersection, and tiny geometry
value types used by the public polyfill/linetrace API.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class Polygon:
    shell: list  # [(x, y), ...]
    holes: list = field(default_factory=list)

    geom_type = "Polygon"

    @property
    def bounds(self):
        xs = [p[0] for p in self.shell]
        ys = [p[1] for p in self.shell]
        return (min(xs), min(ys), max(xs), max(ys))


@dataclass
class MultiPolygon:
    geoms: list

    geom_type = "MultiPolygon"


@dataclass
class LineString:
    coords: list

    geom_type = "LineString"


@dataclass
class MultiLineString:
    geoms: list

    geom_type = "MultiLineString"


def points_in_ring(px: np.ndarray, py: np.ndarray, ring) -> np.ndarray:
    """Vectorized ray-casting point-in-polygon over one ring."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        cond = (y1 > py) != (y2 > py)
        if y2 != y1:
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            inside ^= cond & (px < xint)
    return inside


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: Polygon) -> np.ndarray:
    """Inside the shell and outside every hole."""
    inside = points_in_ring(px, py, poly.shell)
    for h in poly.holes:
        inside &= ~points_in_ring(px, py, h)
    return inside


def segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper + collinear-touching segment intersection (the semantics
    shapely's ``intersects`` gives the reference's line walks)."""

    def ccw(a, b, c):
        return (c[1] - a[1]) * (b[0] - a[0]) - (b[1] - a[1]) * (c[0] - a[0])

    d1 = ccw(p3, p4, p1)
    d2 = ccw(p3, p4, p2)
    d3 = ccw(p1, p2, p3)
    d4 = ccw(p1, p2, p4)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True

    def on(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    if d1 == 0 and on(p3, p4, p1):
        return True
    if d2 == 0 and on(p3, p4, p2):
        return True
    if d3 == 0 and on(p1, p2, p3):
        return True
    if d4 == 0 and on(p1, p2, p4):
        return True
    return False


def segment_intersects_ring(a, b, ring) -> bool:
    n = len(ring)
    for i in range(n):
        if segments_intersect(a, b, ring[i], ring[(i + 1) % n]):
            return True
    return False


def polygon_contains_ring(poly: Polygon, ring) -> bool:
    """All ring vertices inside and no boundary crossing — the polygon
    fully contains the ring's polygon (sufficient for the convex-ish
    cell quads the engine feeds it)."""
    xs = np.array([p[0] for p in ring])
    ys = np.array([p[1] for p in ring])
    if not points_in_polygon(xs, ys, poly).all():
        return False
    m = len(ring)
    for i in range(m):
        a, b = ring[i], ring[(i + 1) % m]
        if segment_intersects_ring(a, b, poly.shell):
            return False
        for h in poly.holes:
            if segment_intersects_ring(a, b, h):
                return False
    return True


def polygon_overlaps_ring(poly: Polygon, ring) -> bool:
    """Any vertex of either inside the other, or boundaries crossing."""
    xs = np.array([p[0] for p in ring])
    ys = np.array([p[1] for p in ring])
    if points_in_polygon(xs, ys, poly).any():
        return True
    sx = np.array([p[0] for p in poly.shell])
    sy = np.array([p[1] for p in poly.shell])
    if points_in_ring(sx, sy, ring).any():
        return True
    m = len(ring)
    for i in range(m):
        if segment_intersects_ring(ring[i], ring[(i + 1) % m], poly.shell):
            return True
    return False
