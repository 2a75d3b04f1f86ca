"""Malformed-geometry validation (VERDICT r2 item 4).

Mirrors the reference's malformed-input rejection tests
(/root/reference/tests/test_rhp_wrappers.py test_polyfill /
test_linetrace malformed sections, rhp_wrappers.py:810-846) on the
engine's typed geometries, plus the positive sphere goldens around
them so the validators provably don't over-reject.
"""

from __future__ import annotations

from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import wrappers as W

# the reference's sphere test polygons (test_rhp_wrappers.py:471-493)
EQ_POLY_N = geo.Polygon(
    shell=[(-10, -10), (50, -10), (50, 40), (-10, 40), (-10, -10)],
    holes=[
        [(-5, 5), (25, 20), (45, 5), (-5, 5)],
        [(-5, 25), (25, 30), (45, 25), (-5, 25)],
    ],
)
EQ_POLY_S = geo.Polygon(
    shell=[(-10, 10), (-10, -40), (50, -40), (50, 10), (-10, 10)],
    holes=[
        [(-5, -5), (45, -5), (25, -20), (-5, -5)],
        [(-5, -25), (45, -25), (25, -30), (-5, -25)],
    ],
)
PO_POLY_N = geo.Polygon(
    shell=[(0, 75), (-30, 42), (0, 42), (30, 42), (0, 75)],
    holes=[[(0, 70), (5, 60), (-5, 60), (0, 70)]],
)
PO_POLY_S = geo.Polygon(
    shell=[(30, -42), (0, -75), (90, -75), (60, -42), (30, -42)],
    holes=[[(10, -70), (20, -65), (10, -65), (10, -70)]],
)


def test_validator_accepts_reference_valid_polygons():
    for p in (EQ_POLY_N, EQ_POLY_S, PO_POLY_N, PO_POLY_S):
        assert not geo.malformed_geometry(p)
    assert not geo.malformed_geometry(
        geo.MultiPolygon([EQ_POLY_N, PO_POLY_N, PO_POLY_S])
    )


def test_polyfill_positive_goldens_match_reference():
    # reference test_polyfill sphere expectations (test_rhp_wrappers.py)
    assert W.polyfill(EQ_POLY_N, 0, plane=False) == {"Q"}
    assert W.polyfill(EQ_POLY_S, 0, plane=False) == {"Q"}
    assert W.polyfill(PO_POLY_N, 1, plane=False) == {"N2"}
    assert W.polyfill(PO_POLY_S, 1, plane=False) == {"S7"}
    assert W.polyfill(
        geo.MultiPolygon([EQ_POLY_N, PO_POLY_N, PO_POLY_S]), 1, plane=False
    ) == {"N2", "Q1", "Q3", "Q4", "S7"}


def test_polyfill_rejects_malformed():
    # reference: assertIsNone for each of these
    no_area = geo.Polygon(shell=[(0, 0), (1, 0), (2, 0), (0, 0)])
    multi_overlap = geo.MultiPolygon([EQ_POLY_N, EQ_POLY_S])
    assert W.polyfill(None, 0) is None
    assert W.polyfill(geo.Polygon(shell=[]), 0) is None
    assert W.polyfill(geo.MultiPolygon([]), 0) is None
    assert W.polyfill(geo.LineString([(0, 0), (1, 1)]), 0) is None  # wrong type
    assert W.polyfill(no_area, 0) is None
    assert W.polyfill(multi_overlap, 0, plane=False) is None
    # resolution mismatch stays set(), NOT None (reference parity)
    geom_res_mismatch = geo.Polygon(
        shell=[(0, 0), (0, -40), (40, -40), (40, 0), (0, 0)]
    )
    assert W.polyfill(geom_res_mismatch, 0, plane=False) == set()


def test_self_intersecting_ring_rejected():
    bowtie = geo.Polygon(shell=[(0, 0), (10, 10), (10, 0), (0, 10), (0, 0)])
    assert geo.malformed_geometry(bowtie)
    assert W.polyfill(bowtie, 0, plane=False) is None
    hole_escapes = geo.Polygon(
        shell=[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        holes=[[(20, 20), (30, 20), (25, 30), (20, 20)]],
    )
    assert geo.malformed_geometry(hole_escapes)
    self_x_hole = geo.Polygon(
        shell=[(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
        holes=[[(1, 1), (4, 4), (4, 1), (1, 4), (1, 1)]],
    )
    assert geo.malformed_geometry(self_x_hole)


def test_linetrace_rejects_malformed():
    # reference: assertIsNone(linetrace(LineString(), 0)) and the
    # collapsed-to-a-point line
    assert W.linetrace(geo.LineString([]), 0) is None
    assert W.linetrace(geo.LineString([(1, 1), (1, 1)]), 0) is None
    assert W.linetrace(None, 0) is None
    assert W.linetrace(geo.Polygon(shell=[(0, 0), (1, 0), (1, 1)]), 0) is None
    assert W.linetrace(geo.MultiLineString([]), 0) is None


def test_linetrace_valid_still_works():
    # reference test_linetrace equatorial golden
    p_ls = geo.LineString(
        [
            (-14.793092, -37.005372),
            (-15.621138, -40.323142),
            (-18.333333, -36.483403),
            (-14, -37),
        ]
    )
    assert W.linetrace(p_ls, 3, plane=False) == [
        "P874", "P877", "P876", "P873", "P874",
    ]
    assert W.linetrace(p_ls, 2, plane=False) == ["P87"]
