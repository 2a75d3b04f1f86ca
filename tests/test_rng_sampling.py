"""True-RNG sampling mode (VERDICT r2 item 6): reference-matching
authalic-sphere sampling (ellipsoids.py:149-209, dggs.py:1333-1370,
cell.py:1448-1487), property-tested for bounds and containment."""

from __future__ import annotations

import random

import numpy as np

from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import wrappers as W
from rhealpixdggs_py_ray.core.config import WGS84_003


def test_random_cell_valid_and_resolution():
    rng = random.Random(42)
    for _ in range(200):
        c = W.random_cell_rng(rng, max_res=6)
        assert W.rhp_is_valid(c)
        assert 0 <= len(c) - 1 <= 6
    # pinned resolution
    for _ in range(50):
        c = W.random_cell_rng(rng, resolution=3)
        assert len(c) - 1 == 3 and W.rhp_is_valid(c)


def test_random_cell_numpy_generator():
    rng = np.random.default_rng(7)
    cells = {W.random_cell_rng(rng, resolution=1) for _ in range(100)}
    assert all(W.rhp_is_valid(c) for c in cells)
    assert len(cells) > 10  # actually random


def test_cell_random_point_plane_contained():
    rng = random.Random(1)
    for name in ("N4", "Q3", "S8", "P012"):
        u = su.from_string([name])
        for _ in range(50):
            x, y = W.cell_random_point_rng(name, rng, plane=True)
            assert idx.contains(
                WGS84_003, u, np.asarray([x]), np.asarray([y]), plane=True
            )[0]


def test_cell_random_point_ellipsoidal_contained():
    rng = random.Random(3)
    # quad, skew/dart polar cells, the res-0 cap, and the
    # antimeridian-crossing face R (+ a child hugging lon=180)
    for name in ("Q3", "P0", "N0", "N", "R", "R8"):
        u = su.from_string([name])
        for _ in range(25):
            lam, phi = W.cell_random_point_rng(name, rng, plane=False)
            assert -180.0 <= lam <= 180.0 and -90.0 <= phi <= 90.0
            assert idx.contains(
                WGS84_003, u, np.asarray([lam]), np.asarray([phi]), plane=False
            )[0]


def test_dggs_random_point_on_ellipsoid():
    rng = random.Random(5)
    for _ in range(50):
        lam, phi = W.random_point_rng(rng, plane=False)
        assert -180.0 <= lam <= 180.0
        # reference pole-avoidance band: |phi| <= 90 - 0.5 deg
        assert abs(phi) <= 90.0 - 0.5 + 1e-9


def test_authalic_latitude_distribution_is_area_uniform():
    # On the ellipsoid, the share of samples with |lat| < 30deg must
    # approach the authalic-area share (sin of the authalic latitude),
    # not the naive lat-uniform share — this distinguishes the
    # authalic sampler from a uniform(phi) one.
    import math

    from rhealpixdggs_py_ray.core.utils import auth_lat

    rng = random.Random(11)
    n, hits = 4000, 0
    for _ in range(n):
        _, phi = W.ellipsoid_random_point(rng)
        if abs(phi) < 30.0:
            hits += 1
    beta30 = float(auth_lat(np.asarray(math.radians(30.0)), WGS84_003,
                            radians=True))
    expect = math.sin(beta30)  # area share of the +-30deg band
    assert abs(hits / n - expect) < 0.03
