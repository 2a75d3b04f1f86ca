"""Cover builders, polyfill, linetrace, compress: frozen goldens."""

import math

import numpy as np

from rhealpixdggs_py_ray.core import cover as cov
from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import wrappers as W
from rhealpixdggs_py_ray.core.config import WGS84_003, WGS84_003_RADIANS, WGS84_123

PI = math.pi


def ss(cells_):
    return ["".join(map(str, su.suid_tuple(c))) for c in cells_]


def test_cell_latitudes_goldens():
    # dggs.py:942-958
    got = cov.cell_latitudes(WGS84_003_RADIANS, 1, -PI / 2, PI / 2, True, plane=False)
    assert [round(v, 14) for v in got] == [
        -1.02150660972679, -0.46233979145691, 0.0, 0.46233979145691, 1.02150660972679,
    ]
    got = cov.cell_latitudes(WGS84_003_RADIANS, 1, -PI / 2, PI / 2, False, plane=False)
    assert [round(v, 14) for v in got] == [
        -1.29894395947616, -0.73195363195267, -0.22506566919844,
        0.22506566919844, 0.73195363195267, 1.29894395947616,
    ]


def test_cells_from_parallel_golden():
    got = ss(cov.cells_from_parallel(WGS84_003_RADIANS, 1, PI / 3, -PI, PI))
    assert got == ["N6", "N7", "N8", "N5", "N2", "N1", "N0", "N3"]


def test_cells_from_meridian_golden():
    got = ss(cov.cells_from_meridian(WGS84_003_RADIANS, 1, 0.1, -PI / 2, PI / 2))
    assert got == ["N4", "N2", "N1", "Q0", "Q3", "Q6", "S8", "S7", "S4"]


def test_cells_from_region_goldens():
    R_A = WGS84_003_RADIANS.R_A
    M = cov.cells_from_region(
        WGS84_003_RADIANS, 1, (R_A * -0.1, R_A * PI / 4), (R_A * 0.1, -R_A * PI / 4), plane=True
    )
    assert [ss(r) for r in M] == [["P2", "Q0"], ["P5", "Q3"], ["P8", "Q6"]]
    M = cov.cells_from_region(WGS84_003_RADIANS, 1, (0, PI / 3), (PI / 2, 0), plane=False)
    assert [ss(r) for r in M] == [
        ["N2", "N1", "N0"], ["Q0", "Q1", "Q2", "R0"], ["Q3", "Q4", "Q5", "R3"],
    ]
    # dggs.py:72-82 — degrees config, WGS84_123 quad
    M = cov.cells_from_region(WGS84_123, 1, (0, 45), (90, 0), plane=False)
    assert [ss(r) for r in M] == [
        ["N8", "N5", "N2"], ["Q0", "Q1", "Q2", "R0"], ["Q3", "Q4", "Q5", "R3"],
    ]
    # defunct quad / lune
    M = cov.cells_from_region(WGS84_003_RADIANS, 1, (0, -PI / 6), (PI / 2, -PI / 2), plane=False)
    assert [ss(r) for r in M] == [
        ["Q6", "Q7", "Q8", "R6"], ["S8", "S7", "S6"], ["S4"],
    ]
    # south cap
    M = cov.cells_from_region(WGS84_003_RADIANS, 1, (-PI, -PI / 5), (-PI, -PI / 2), plane=False)
    assert [ss(r) for r in M] == [
        ["O6", "O7", "O8", "P6", "P7", "P8", "Q6", "Q7", "Q8", "R6", "R7", "R8"],
        ["S0", "S1", "S2", "S5", "S8", "S7", "S6", "S3"],
        ["S4"],
    ]
    # empty on inverted bounds (dggs.py:1263-1264)
    assert cov.cells_from_region(WGS84_003, 1, (10, 0), (0, 10), plane=False) == []


def test_cells_from_line_golden():
    got = ss(cov.cells_from_line(WGS84_003, 3, (-89.669615, 86.549596), (-134, 86), plane=False))
    assert got == ["N448", "N447"]


def test_linetrace_golden():
    line = geo.LineString([(-176.260506, -43.738058), (-176.258807, -43.738379)])
    assert W.linetrace(line, 9, plane=False) == ["S001450634", "S001450635"]


def test_polyfill_goldens():
    sq = geo.Polygon([(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)])
    assert W.polyfill(sq, 1, plane=False) == set()
    assert W.polyfill(sq, 4, plane=False) == {"Q3330"}
    assert sorted(W.polyfill(sq, 5, plane=False)) == [
        "Q33303", "Q33304", "Q33305", "Q33306", "Q33307", "Q33308",
        "Q33330", "Q33331", "Q33332",
    ]
    assert len(W.polyfill(sq, 6, plane=False)) == 80
    assert W.polyfill(None, 4) is None
    assert W.polyfill(geo.LineString([(0, 0), (1, 1)]), 4) is None


def test_polyfill_with_hole():
    outer = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    hole = [(0.2, 0.2), (0.2, 0.8), (0.8, 0.8), (0.8, 0.2)]
    full = W.polyfill(geo.Polygon(outer), 6, plane=False)
    holed = W.polyfill(geo.Polygon(outer, [hole]), 6, plane=False)
    assert holed < full


def test_compress_order_cells():
    # A full sibling group merges into the parent; sort is alphanumeric
    cells_ = ["Q3330" + str(i) for i in range(9)] + ["Q44", "P1"]
    got = W.compress_order_cells(cells_)
    assert got == ["P1", "Q44", "Q3330"]


def test_minimal_cover_golden():
    # dggs.py:1386-1398
    from rhealpixdggs_py_ray.core import index as idx

    c1 = su.from_string(["N021"])
    c2 = su.from_string(["P733"])
    n1 = idx.nucleus(WGS84_003, c1, plane=True)
    n2 = idx.nucleus(WGS84_003, c2, plane=True)
    pts = [(float(n1[0][0]), float(n1[1][0])), (float(n2[0][0]), float(n2[1][0]))]
    expect = [["N", "P"], ["N0", "P7"], ["N02", "P73"], ["N021", "P733"], ["N0214", "P7334"]]
    for r in range(5):
        got = sorted(ss(cov.minimal_cover(WGS84_003, r, pts, plane=True)))
        assert got == expect[r]


def test_wrapper_api_goldens():
    # rhp_wrappers doctests
    assert W.geo_to_rhp(-43.738058, -176.260506, 9, plane=False) == "S001450634"
    assert W.rhp_to_parent("S001450634", 0) == "S"
    assert W.rhp_to_parent("S001450634") == "S00145063"
    assert W.rhp_to_parent("INVALID") is None
    assert W.rhp_to_center_child("S001450634") == "S0014506344"
    assert W.rhp_to_center_child("S001450634", res=13) == "S0014506344444"
    assert W.rhp_get_resolution("S001450634") == 9
    assert W.rhp_get_base_cell("S001450634") == "S"
    assert W.rhp_is_valid("S001450634") and W.rhp_is_valid("N")
    assert not W.rhp_is_valid("INVALID") and not W.rhp_is_valid(None)
    assert W.cell_area("S001450634", unit="m^2", plane=False) == 219428.08748562282
    assert W.cell_area("S00145063", unit="km^2", plane=False) == 1.9748527873706059
    # rhp_to_geo_boundary geojson closure (rhp_wrappers.py:241-244)
    b = W.rhp_to_geo_boundary("S001450634", True, False)
    assert len(b) == 5 and b[0] == b[-1]
    assert round(b[0][0], 11) == round(-176.26086040756147, 11)
    # rhp_to_geo centroid golden
    c = W.rhp_to_geo("S001450634", True, False)
    assert abs(c[0] - -176.2606635452476) < 1e-9
    assert abs(c[1] - -43.73654505358369) < 1e-9


def test_cells_from_region_polar_sql_matches_engine():
    """cells_from_region_polar_sql vs the engine walk on two north-cap
    fixtures: the driver fixture (no boundary rows) and one where the
    phi_max boundary row IS inserted (dggs.py:1302-1310 path)."""
    import duckdb

    from rhealpixdggs_py_ray import oracle
    from rhealpixdggs_py_ray.core import cover as cov
    from rhealpixdggs_py_ray.core import suid as su
    from rhealpixdggs_py_ray.core.config import WGS84_003

    for ul, dr in [
        ((18.7, 71.3), (72.4, 57.9)),  # 13 nucleus rows, no boundary rows
        ((18.7, 59.0), (72.4, 51.7)),  # 6 nucleus + 1 inserted top row
    ]:
        rows = cov.cells_from_region(WGS84_003, 4, ul, dr, plane=False)
        eng = sorted(
            (r, c, su.to_string(np.array([u], dtype=np.uint64))[0])
            for r, row in enumerate(rows)
            for c, u in enumerate(row)
        )
        sql = oracle.cells_from_region_polar_sql(ul, dr, 4, WGS84_003)
        got = sorted(
            (int(a), int(b), s)
            for a, b, s in duckdb.connect().execute(sql).fetchall()
        )
        assert got == [(int(a), int(b), s) for a, b, s in eng], (ul, dr)


def test_polyfill_polar_centroid_margins():
    """The polar polyfill oracles rely on PIP decisions surviving the
    ~1e-13 summation-order difference between numpy's pairwise sum and
    DuckDB's fold: assert every SQL-side centroid stays > 1e-6 deg away
    from every polygon edge (6+ orders of magnitude of margin) for all
    three fixtures."""
    import duckdb

    from rhealpixdggs_py_ray import oracle
    from rhealpixdggs_py_ray.core.config import WGS84_003, WGS84_123
    from rhealpixdggs_py_ray.pipelines.queries import (
        POLY_POLAR, POLY_POLAR_NS, POLY_POLAR_S, POLYFILL_POLAR_RES,
    )

    def min_edge_dist(px, py, poly):
        best = np.inf
        n = len(poly)
        for i in range(n):
            (x1, y1), (x2, y2) = poly[i], poly[(i + 1) % n]
            dx, dy = x2 - x1, y2 - y1
            t = np.clip(((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy), 0, 1)
            d = np.hypot(px - (x1 + t * dx), py - (y1 + t * dy))
            best = np.minimum(best, d)
        return best

    for poly, cfg, face in (
        (POLY_POLAR, WGS84_003, 0),
        (POLY_POLAR_NS, WGS84_123, 0),
        (POLY_POLAR_S, WGS84_003, 5),
    ):
        sql = oracle.polyfill_polar_sql(poly, POLYFILL_POLAR_RES, cfg, face=face)
        # pull the centroids the PIP filter consumes: replace the final
        # projection (everything after the last CTE) with a bare select
        head, _tail = sql.rsplit("\nSELECT ", 1)
        q = head + "\nSELECT clon, clat FROM pp_cent"
        rows = duckdb.connect().execute(q).fetchall()
        assert rows
        px = np.array([r[0] for r in rows])
        py = np.array([r[1] for r in rows])
        d = min_edge_dist(px, py, poly)
        assert float(d.min()) > 1e-6, (cfg, face, float(d.min()))
