"""Make the read-only reference at /root/reference importable in this
dependency-light sandbox, for use as a DIFFERENTIAL TEST ORACLE only.

The reference imports pyproj, shapely, scipy and matplotlib, none of
which are installed here.  ``install()`` registers minimal stand-ins in
``sys.modules`` covering exactly the small surface the reference touches
on the code paths we exercise:

- pyproj: ``get_ellps_map()`` with the WGS84/sphere constants the
  reference reads (ellipsoids.py:33-38); ``Proj`` raising if used.
- matplotlib.path.Path: ray-casting ``contains_point`` (used by the
  in-image tests, pj_healpix.py:196-223).
- scipy.integrate.dblquad: high-order fixed Gauss-Legendre tensor rule
  (96x96), accurate far beyond the 1e-9 comparison tolerance for the
  smooth centroid integrands (cell.py:1104-1120).
- shapely: tiny pure-Python Point/Polygon/MultiPolygon/LineString with
  ray-casting ``contains`` and bbox/segment-intersection ``intersects``
  — enough for rhp_wrappers.polyfill/linetrace and conversion.py.

This module never ships in the engine; engine code must not import it.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _pyproj_module():
    m = types.ModuleType("pyproj")

    def get_ellps_map():
        return {
            "WGS84": {"a": 6378137.0, "rf": 298.257223563},
            "sphere": {"a": 6371000.0},
        }

    class Proj:
        def __init__(self, *a, **k):
            raise NotImplementedError("PROJ projections unavailable in sandbox stub")

    m.get_ellps_map = get_ellps_map
    m.Proj = Proj
    return m


def _point_in_poly(px, py, verts):
    """Ray casting, with on-edge points counted as inside-ish (the
    reference always fuzzes its polygons outward, so edge semantics
    are not load-bearing)."""
    inside = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def _matplotlib_modules():
    mpl = types.ModuleType("matplotlib")
    path = types.ModuleType("matplotlib.path")

    class Path:
        def __init__(self, vertices):
            self.vertices = [tuple(v) for v in vertices]

        def contains_point(self, p):
            return _point_in_poly(p[0], p[1], self.vertices)

    path.Path = Path
    mpl.path = path
    return mpl, path


def _scipy_modules():
    scipy = types.ModuleType("scipy")
    integrate = types.ModuleType("scipy.integrate")

    def _adaptive_simpson(f, a, b, tol, depth=24):
        def simpson(fa, fm, fb, a, b):
            return (b - a) / 6 * (fa + 4 * fm + fb)

        def rec(a, b, fa, fm, fb, whole, tol, depth):
            m = (a + b) / 2
            lm = (a + m) / 2
            rm = (m + b) / 2
            flm = f(lm)
            frm = f(rm)
            left = simpson(fa, flm, fm, a, m)
            right = simpson(fm, frm, fb, m, b)
            if depth <= 0 or abs(left + right - whole) <= 15 * tol:
                return left + right + (left + right - whole) / 15
            return rec(a, m, fa, flm, fm, left, tol / 2, depth - 1) + rec(
                m, b, fm, frm, fb, right, tol / 2, depth - 1
            )

        fa, fb = f(a), f(b)
        fm = f((a + b) / 2)
        whole = simpson(fa, fm, fb, a, b)
        # Interpret tol as a relative tolerance on the whole integral.
        tol_abs = tol * max(abs(whole), 1e-30)
        return rec(a, b, fa, fm, fb, whole, tol_abs, depth)

    def dblquad(func, a, b, gfun, hfun):
        # scipy semantics: integral of func(y, x) for x in [a, b],
        # y in [gfun(x), hfun(x)].  Adaptive Simpson in both variables
        # (accuracy comparable to scipy's default tolerances; handles
        # the kinked centroid integrands the reference feeds it).
        def outer(x):
            g, h = gfun(x), hfun(x)
            return _adaptive_simpson(lambda y: func(y, x), g, h, tol=1e-12)

        return _adaptive_simpson(outer, a, b, tol=1e-11), 0.0

    integrate.dblquad = dblquad
    scipy.integrate = integrate
    return scipy, integrate


def _shapely_modules():
    shp = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")

    class _Base:
        is_empty = False
        is_valid = True

    class Point(_Base):
        geom_type = "Point"

        def __init__(self, *args):
            if len(args) == 1:
                self.x, self.y = args[0]
            else:
                self.x, self.y = args

    class Polygon(_Base):
        geom_type = "Polygon"

        def __init__(self, shell=None, holes=None):
            self.exterior_coords = [tuple(p) for p in (shell or [])]
            self.holes = [[tuple(p) for p in h] for h in (holes or [])]

        @property
        def bounds(self):
            xs = [p[0] for p in self.exterior_coords]
            ys = [p[1] for p in self.exterior_coords]
            return (min(xs), min(ys), max(xs), max(ys))

        @property
        def area(self):
            s = 0.0
            v = self.exterior_coords
            for i in range(len(v)):
                x1, y1 = v[i]
                x2, y2 = v[(i + 1) % len(v)]
                s += x1 * y2 - x2 * y1
            return abs(s) / 2

        def contains(self, other):
            if isinstance(other, Point):
                if not _point_in_poly(other.x, other.y, self.exterior_coords):
                    return False
                for h in self.holes:
                    if _point_in_poly(other.x, other.y, h):
                        return False
                return True
            if isinstance(other, Polygon):
                return all(
                    _point_in_poly(px, py, self.exterior_coords)
                    for px, py in other.exterior_coords
                )
            raise NotImplementedError

        def overlaps(self, other):
            if isinstance(other, Polygon):
                a = any(
                    _point_in_poly(px, py, self.exterior_coords)
                    for px, py in other.exterior_coords
                )
                b = any(
                    _point_in_poly(px, py, other.exterior_coords)
                    for px, py in self.exterior_coords
                )
                return a or b
            raise NotImplementedError

    class MultiPolygon(_Base):
        geom_type = "MultiPolygon"

        def __init__(self, polys=None):
            self.geoms = list(polys or [])

    def _seg_intersect(p1, p2, p3, p4):
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

    class LineString(_Base):
        geom_type = "LineString"

        def __init__(self, coords):
            self.coords = [tuple(p) for p in coords]

        @property
        def length(self):
            import math

            return sum(
                math.dist(self.coords[i], self.coords[i + 1])
                for i in range(len(self.coords) - 1)
            )

        def intersects(self, other):
            for i in range(len(self.coords) - 1):
                for j in range(len(other.coords) - 1):
                    if _seg_intersect(
                        self.coords[i],
                        self.coords[i + 1],
                        other.coords[j],
                        other.coords[j + 1],
                    ):
                        return True
            return False

    class MultiLineString(_Base):
        geom_type = "MultiLineString"

        def __init__(self, lines=None):
            self.geoms = [LineString(c) if not isinstance(c, LineString) else c for c in (lines or [])]

    def is_valid_reason(geom):
        return "Valid Geometry"

    for name, obj in [
        ("Point", Point),
        ("Polygon", Polygon),
        ("MultiPolygon", MultiPolygon),
        ("LineString", LineString),
        ("MultiLineString", MultiLineString),
        ("is_valid_reason", is_valid_reason),
    ]:
        setattr(shp, name, obj)
        setattr(geometry, name, obj)
    shp.geometry = geometry
    return shp, geometry


def install():
    """Register stubs and put the reference on sys.path.  Idempotent."""
    if "pyproj" not in sys.modules:
        sys.modules["pyproj"] = _pyproj_module()
    if "matplotlib" not in sys.modules:
        mpl, path = _matplotlib_modules()
        sys.modules["matplotlib"] = mpl
        sys.modules["matplotlib.path"] = path
    if "scipy" not in sys.modules:
        scipy, integrate = _scipy_modules()
        sys.modules["scipy"] = scipy
        sys.modules["scipy.integrate"] = integrate
    if "shapely" not in sys.modules:
        shp, geometry = _shapely_modules()
        sys.modules["shapely"] = shp
        sys.modules["shapely.geometry"] = geometry
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
