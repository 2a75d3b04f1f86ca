"""Differential conformance vs the reference library itself, executed
in-process with dependency stubs (tools/refstub).  Complements the
frozen-golden tests with randomized corpora; kept small so the whole
suite stays fast."""

import random

import numpy as np
import pytest

from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import topology as tp
from rhealpixdggs_py_ray.core.config import WGS84_003


@pytest.fixture(scope="module")
def ref(reference):
    return reference.WGS84_003


def test_cell_from_point_differential(ref):
    random.seed(42)
    pts = [(random.uniform(-180, 180), random.uniform(-85, 85)) for _ in range(300)]
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    for res in (1, 9):
        ours = su.to_string(idx.cell_from_point(WGS84_003, res, lon, lat, plane=False))
        theirs = [str(ref.cell_from_point(res, p, plane=False)) for p in pts]
        assert ours.tolist() == theirs


def test_planar_neighbors_differential(ref):
    random.seed(13)
    cells = []
    for _ in range(60):
        res = random.randint(0, 9)
        cells.append(tuple(["NOPQRS"[random.randint(0, 5)]] + [random.randint(0, 8) for _ in range(res)]))
    u = np.array([su.from_suid_tuple(c) for c in cells], dtype=np.uint64)
    nb = tp.neighbors_plane(WGS84_003, u)
    for i, c in enumerate(cells):
        rn = ref.cell(list(c)).neighbors(plane=True)
        for j, d in enumerate(["up", "right", "down", "left"]):
            assert su.suid_tuple(int(nb[i, j])) == tuple(rn[d].suid), (c, d)


def test_ellipsoidal_neighbors_differential(ref):
    random.seed(14)
    for _ in range(25):
        res = random.randint(0, 5)
        c = tuple(["NOPQRS"[random.randint(0, 5)]] + [random.randint(0, 8) for _ in range(res)])
        rn = ref.cell(list(c)).neighbors(plane=False)
        ours = tp.neighbors(WGS84_003, su.from_suid_tuple(c), plane=False)
        assert {k: su.suid_tuple(v) for k, v in ours.items()} == {
            k: tuple(v.suid) for k, v in rn.items()
        }, c


def test_vertices_differential(ref):
    random.seed(15)
    for _ in range(40):
        res = random.randint(1, 6)
        c = tuple(["NOPQRS"[random.randint(0, 5)]] + [random.randint(0, 8) for _ in range(res)])
        refc = ref.cell(list(c))
        u = np.array([su.from_suid_tuple(c)], dtype=np.uint64)
        ve = idx.vertices(WGS84_003, u, plane=False)[0]
        rv = refc.vertices(plane=False)
        for i in range(4):
            assert ve[i, 0] == rv[i][0] and ve[i, 1] == rv[i][1], c
        assert idx.SHAPE_NAMES[idx.shape_of(WGS84_003, u)[0]] == refc.ellipsoidal_shape()


def test_successor_differential(ref):
    random.seed(16)
    for _ in range(40):
        res = random.randint(0, 8)
        c = tuple(["NOPQRS"[random.randint(0, 5)]] + [random.randint(0, 8) for _ in range(res)])
        refc = ref.cell(list(c)).successor()
        got = su.successor(np.array([su.from_suid_tuple(c)], dtype=np.uint64), WGS84_003)[0]
        if refc is None:
            assert got == 0
        else:
            assert su.suid_tuple(int(got)) == tuple(refc.suid)
