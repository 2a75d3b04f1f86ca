"""Cap-safe polar linetrace (VERDICT r2 item 9).

The reference documents cells_from_line broken on cap cells
(dggs.py:1110-1114).  cells_from_line_sampled exceeds it: exact
cell_from_point at every latitude + consecutive-duplicate collapse.
These tests pin (a) golden sequences, (b) refinement stability,
(c) brute-force set equality, (d) the concrete divergence where the
reference's neighbor walk skips cells the line really crosses."""

from __future__ import annotations

import numpy as np

from rhealpixdggs_py_ray.core import cover as cov
from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core.config import WGS84_003 as CFG
from rhealpixdggs_py_ray.pipelines.queries import (
    LINETRACE_POLAR_N,
    LINETRACE_POLAR_RES,
    LINETRACE_POLAR_SEGS,
)

GOLDEN = {
    0: ["N448", "N447"],
    1: ["N441", "N442", "N445", "N444"],  # crosses the res-3 cap cell
    2: ["N418", "N417", "N416", "N408", "N432", "N435", "N438"],
    3: ["S453", "S456", "S480", "S472"],
    4: ["Q010", "N212", "N211", "N210"],
}


def _names(cells):
    return su.to_string(np.array(cells, dtype=np.uint64)).tolist()


def test_golden_sequences():
    for i, (p0, p1) in enumerate(LINETRACE_POLAR_SEGS):
        got = _names(cov.cells_from_line_sampled(
            CFG, LINETRACE_POLAR_RES, p0, p1, LINETRACE_POLAR_N))
        assert got == GOLDEN[i], i


def test_refinement_stable():
    # 7x denser sampling finds no additional crossings: the collapsed
    # sequence is the exact crossing sequence for these fixtures
    for p0, p1 in LINETRACE_POLAR_SEGS:
        a = cov.cells_from_line_sampled(CFG, LINETRACE_POLAR_RES, p0, p1,
                                        LINETRACE_POLAR_N)
        b = cov.cells_from_line_sampled(CFG, LINETRACE_POLAR_RES, p0, p1,
                                        7 * LINETRACE_POLAR_N)
        assert a == b, (p0, p1)


def test_brute_force_set_equality():
    # an independent 200k-point uniform scan visits exactly the same
    # cell set (order-free check, different sample lattice)
    for p0, p1 in LINETRACE_POLAR_SEGS:
        trace = set(cov.cells_from_line_sampled(
            CFG, LINETRACE_POLAR_RES, p0, p1, LINETRACE_POLAR_N))
        t = np.linspace(0.0, 1.0, 200_001)
        lon = p0[0] + (p1[0] - p0[0]) * t
        lat = p0[1] + (p1[1] - p0[1]) * t
        brute = set(
            int(c) for c in idx.cell_from_point(
                CFG, LINETRACE_POLAR_RES, lon, lat, plane=False)
        )
        assert trace == brute, (p0, p1)


def test_consecutive_cells_distinct_and_endpoints():
    for p0, p1 in LINETRACE_POLAR_SEGS:
        cells = cov.cells_from_line_sampled(
            CFG, LINETRACE_POLAR_RES, p0, p1, LINETRACE_POLAR_N)
        assert all(a != b for a, b in zip(cells, cells[1:]))
        s = int(idx.cell_from_point(CFG, LINETRACE_POLAR_RES,
                                    np.array([p0[0]]), np.array([p0[1]]),
                                    plane=False)[0])
        e = int(idx.cell_from_point(CFG, LINETRACE_POLAR_RES,
                                    np.array([p1[0]]), np.array([p1[1]]),
                                    plane=False)[0])
        assert cells[0] == s and cells[-1] == e


def test_reference_cap_walk_divergence(reference):
    """The documented reference breakage, made concrete: on segment 1
    the reference's neighbor walk emits [N441, N444], skipping N442
    and N445 which the line provably crosses (brute force above).  The
    sampled trace returns all four.  On the equatorial-band segments
    both implementations agree."""
    ref = reference.WGS84_003
    p0, p1 = LINETRACE_POLAR_SEGS[1]
    theirs = [str(c) for c in ref.cells_from_line(
        LINETRACE_POLAR_RES, p0, p1, plane=False)]
    assert theirs == ["N441", "N444"]  # the skip, pinned
    assert GOLDEN[1] == ["N441", "N442", "N445", "N444"]
    # band segments: walk == sampled trace
    for i in (2, 3, 4):
        p0, p1 = LINETRACE_POLAR_SEGS[i]
        theirs = [str(c) for c in ref.cells_from_line(
            LINETRACE_POLAR_RES, p0, p1, plane=False)]
        assert theirs == GOLDEN[i], i
