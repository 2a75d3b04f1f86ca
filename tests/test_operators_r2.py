"""Round-2 operator kernels vs the reference's doctest values
(cell.py / dggs.py examples, cited per test)."""

from __future__ import annotations

import math

import numpy as np

from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import wrappers as W
from rhealpixdggs_py_ray.core.config import WGS84_003 as CFG

R = CFG.R_A


def test_predecessor_doctests():
    # cell.py:378-435 examples
    assert W.rhp_predecessor("N08") == "N07"
    assert W.rhp_predecessor("N00") is None or W.rhp_predecessor("N00") == "N"
    # first cell at res 2 has no predecessor
    assert W.rhp_predecessor("N00") is None
    # roundtrip with successor over a slice of the res-3 grid
    b = CFG.N_side**2
    base = 6 * (b**3 - 1) // (b - 1)
    u = su.suid_from_level_order_index(np.arange(1, 500) + base, CFG)
    assert np.all(su.successor(su.predecessor(u, CFG), CFG) == u)


def test_interval_doctest():
    # dggs.py:710-735 example
    assert W.rhp_interval("N1", "N") == [
        "N1", "N2", "N3", "N4", "N5", "N6", "N7", "N8",
    ]


def test_suid_rowcol_doctest():
    # cell.py:269-291 example: N73 -> (N21, N10)
    assert W.rhp_suid_rowcol("N73") == ("N21", "N10")


def test_num_cells_doctests():
    # dggs.py:633-669 examples
    assert W.num_cells(0) == 6
    assert W.num_cells(0, 1) == 60
    assert W.num_cells(0, subcells=True) == 231627523606480
    assert W.num_cells(0, 1, subcells=True) == 10
    assert W.num_cells(5, 6, subcells=True) == 10


def test_xy_range_doctest():
    # cell.py:734-754 example (UNIT_003 scaled by R_A)
    (x1, x2), (y1, y2) = W.rhp_xy_range("N")
    assert np.allclose(
        [x1 / R, x2 / R, y1 / R, y2 / R],
        [-math.pi, -math.pi / 2, math.pi / 4, 3 * math.pi / 4],
    )


def test_boundary_doctest_planar():
    # cell.py:756-831 n=3 example for N6 (UNIT_003 scaled)
    pts = np.array(W.rhp_boundary("N6", n=3, plane=True)) / R
    expect = [
        (-3.14159265358979, 1.30899693899575),
        (-2.87979326579064, 1.30899693899575),
        (-2.61799387799149, 1.30899693899575),
        (-2.61799387799149, 1.0471975511966),
        (-2.61799387799149, 0.78539816339745),
        (-2.87979326579064, 0.78539816339745),
        (-3.14159265358979, 0.78539816339745),
        (-3.14159265358979, 1.0471975511966),
    ]
    assert np.allclose(pts, expect, atol=1e-11)
    # n=2 equals vertices
    assert np.allclose(
        W.rhp_boundary("N6", n=2, plane=True),
        idx.vertices_plane(CFG, su.from_string(["N6"]))[0],
    )


def test_interior_points_inside_cell():
    # cell.py:833-883 invariant: interior points are contained
    for cell in ("N", "Q44", "S2", "P130"):
        pts = W.rhp_interior(cell, n=4, plane=True, flatten=True)
        for p in pts:
            assert W.rhp_contains(cell, p, plane=True)


def test_contains_doctest():
    # cell.py:885-907: cell from a point contains that point
    lon, lat = 45.0, 0.0
    s = W.geo_to_rhp(lat, lon, 2, plane=False)
    assert W.rhp_contains(s, (lon, lat), plane=False)


def test_overlaps_doctests():
    assert W.rhp_overlaps("N73", "N7")
    assert W.rhp_overlaps("N7", "N73")
    assert W.rhp_overlaps("N73", "N73")
    assert not W.rhp_overlaps("N73", "N4")
    assert W.rhp_region_overlaps("N73", ["S0", "N7"])
    assert not W.rhp_region_overlaps("N73", ["S0", "N4"])


def test_xyz_cube_doctest():
    # dggs.py:527-594: xyz_cube(0, 0) == (w/2, 0, -w/2) scaled
    x, y, z = idx.xyz_cube(CFG, np.array([0.0]), np.array([0.0]))
    w = CFG.cell_width(0)
    assert np.allclose([x[0] / w, y[0] / w, z[0] / w], [0.5, 0.0, -0.5])
    # fold property: every face nucleus lands on the cube surface
    b = CFG.N_side**2
    u = su.suid_from_level_order_index(np.arange(6 * b) + 6, CFG)
    cx, cy = idx.nucleus(CFG, u, plane=True)
    qx, qy, qz = idx.xyz_cube(CFG, cx, cy)
    h = w / 2
    on_face = (
        (np.abs(np.abs(qx) - h) < 1e-6)
        | (np.abs(np.abs(qy) - h) < 1e-6)
        | (np.abs(np.abs(qz) - h) < 1e-6)
    )
    assert on_face.all()


def test_seeded_samplers_deterministic_and_valid():
    for i in range(200):
        c = W.seeded_random_cell(i)
        assert W.rhp_is_valid(c)
        assert c == W.seeded_random_cell(i)
        x, y = W.seeded_random_point(i)
        u = idx.cell_from_point(CFG, 0, np.array([x]), np.array([y]), plane=True)
        assert u[0] != idx.INVALID


def test_subcells_doctest():
    # cell.py:456-481 example
    assert W.rhp_subcells("N") == [f"N{d}" for d in range(9)]
    assert len(W.rhp_subcells("N", 3)) == 9**3
    assert W.rhp_subcells("N12", 2) == ["N12"]
    assert W.rhp_subcells("N12", 1) == []


def test_random_point_in_cell_contained():
    # cell.py:1448-1487 invariant: sampled point indexes back to cell
    for cell in ("N", "Q44", "S27", "P130"):
        for i in range(5):
            p = W.seeded_random_point_in_cell(cell, i)
            assert p == W.seeded_random_point_in_cell(cell, i)
            assert W.rhp_contains(cell, p, plane=True)
