"""Neighbor / rotation / ring conformance (frozen reference goldens)."""

import numpy as np

from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import topology as tp
from rhealpixdggs_py_ray.core.config import UP, RIGHT, DOWN, LEFT, WGS84_003, WGS84_123


def n1(cfg, s, d):
    u = su.from_string([s])
    return su.to_string(tp.neighbor(cfg, u, d))[0]


def test_planar_neighbor_goldens():
    # cell.py:1272-1275
    assert n1(WGS84_003, "N0", DOWN) == "N3"
    # dggs.py:63-70 — planar neighbors of N8 at WGS84_123
    nb = tp.neighbors(WGS84_123, int(su.from_string(["N8"])[0]), plane=True)
    got = {k: su.to_string(np.array([v], dtype=np.uint64))[0] for k, v in nb.items()}
    assert got == {"down": "P2", "left": "N7", "right": "Q0", "up": "N5"}
    # cell.py:1357-1363 — neighbors of N0 (WGS84_003)
    nb = tp.neighbors(WGS84_003, int(su.from_string(["N0"])[0]), plane=True)
    got = {k: su.to_string(np.array([v], dtype=np.uint64))[0] for k, v in nb.items()}
    assert got == {"down": "N3", "left": "R0", "right": "N1", "up": "Q2"}


def test_ellipsoidal_neighbors_golden():
    # dggs.py:55-62 — ellipsoidal neighbors of N8 at WGS84_123
    nb = tp.neighbors(WGS84_123, int(su.from_string(["N8"])[0]), plane=False)
    got = {k: su.to_string(np.array([v], dtype=np.uint64))[0] for k, v in sorted(nb.items())}
    assert got == {"east": "N5", "south_east": "Q0", "south_west": "P2", "west": "N7"}


def test_rotate_golden():
    # cell.py:1216-1218 — N0 rotated by 0..3 quarter turns
    u = np.repeat(su.from_string(["N0"]), 4)
    q = np.arange(4)
    got = su.to_string(tp.rotate(WGS84_003, u, q)).tolist()
    assert got == ["N0", "N2", "N8", "N6"]


def test_cell_ring_goldens():
    # rhp_wrappers.py:387-395
    def ring(s, k):
        return [
            "".join(map(str, su.suid_tuple(c)))
            for c in tp.cell_ring(WGS84_003, int(su.from_string([s])[0]), k)
        ]

    assert ring("S001450634", 1) == [
        "S001450630", "S001450631", "S001450632", "S001450635",
        "S001450638", "S001450637", "S001450636", "S001450633",
    ]
    assert ring("S001450634", 2) == [
        "S001442828", "S001450606", "S001450607", "S001450608",
        "S001450616", "S001450640", "S001450643", "S001450646",
        "S001450670", "S001450662", "S001450661", "S001450660",
        "S001442882", "S001442858", "S001442855", "S001442852",
    ]
    assert ring("S", 1) == ["P", "Q", "R", "O"]
    # tests/test_rhp_wrappers.py:207-260 cross-face rings
    assert ring("Q444", 1) == ["Q440", "Q441", "Q442", "Q445", "Q448", "Q447", "Q446", "Q443"]
    assert ring("Q3", 1) == ["P2", "Q0", "Q1", "Q4", "Q7", "Q6", "P8", "P5"]


def test_k_ring_goldens():
    # rhp_wrappers.py:481-487
    def kr(s, k):
        return [
            "".join(map(str, su.suid_tuple(c)))
            for c in tp.k_ring(WGS84_003, int(su.from_string([s])[0]), k)
        ]

    assert kr("S001450634", 0) == ["S001450634"]
    got = kr("S001450634", 1)
    assert got[0] == "S001450634" and len(got) == 9
    assert len(kr("S001450634", 2)) == 25


def test_ring_size_property():
    """Ring at distance k on a face interior has 8k cells."""
    u = int(su.from_string(["Q44444"])[0])
    for k in (1, 2, 3):
        assert len(tp.cell_ring(WGS84_003, u, k)) == 8 * k


def test_mirror_on_cube():
    assert su.suid_tuple(tp.mirror_on_cube(WGS84_003, int(su.from_string(["N"])[0]))) == ("S",)
    assert su.suid_tuple(tp.mirror_on_cube(WGS84_003, int(su.from_string(["O"])[0]))) == ("Q",)


def test_neighbor_involution_property():
    """Stepping right then left returns the original cell on face
    interiors; across faces the inverse direction may differ (cube
    topology), so restrict to interior digits."""
    rng = np.random.default_rng(4)
    ids = ["Q4" + "".join(str(rng.integers(0, 9)) for _ in range(4)) for _ in range(50)]
    u = su.from_string(ids)
    for d, inv in ((RIGHT, LEFT), (UP, DOWN)):
        v = tp.neighbor(WGS84_003, tp.neighbor(WGS84_003, u, d), inv)
        assert (v == u).all()


def test_k_ring_polar_interior_is_chebyshev():
    """For north-cap cells >= k from every face edge, k_ring's result
    SET equals the face-local Chebyshev ring even when the disk
    straddles the cap diagonals (dart relabeling turns the WALK, not
    the set) — the property sql_k_ring_polar's enumeration relies on."""
    import random

    from rhealpixdggs_py_ray.core import topology as tp
    from rhealpixdggs_py_ray.core import suid as su

    res, k, N = 4, 2, WGS84_003.N_side
    n = N**res

    def cell_id(i, j):
        digs = []
        for t in range(res):
            p = N ** (res - 1 - t)
            digs.append(N * ((i // p) % N) + ((j // p) % N))
        return "N" + "".join(map(str, digs))

    rng = random.Random(11)
    # include cells ON the diagonals and adjacent to them
    picks = [(n // 2, n // 2 + k), (10, 10), (10, n - 1 - 10), (40, 41)]
    picks += [(rng.randint(k, n - 1 - k), rng.randint(k, n - 1 - k))
              for _ in range(20)]
    for i, j in picks:
        c = su.pack(
            np.array([0], dtype=np.int64),
            np.array([[N * ((i // N ** (res - 1 - t)) % N)
                       + ((j // N ** (res - 1 - t)) % N)
                       for t in range(res)]], dtype=np.int64),
            res,
        )[0]
        ring = sorted(
            su.to_string(np.array([r], dtype=np.uint64))[0]
            for r in tp.k_ring(WGS84_003, int(c), k)
        )
        cheb = sorted(
            cell_id(a, b)
            for a in range(i - k, i + k + 1)
            for b in range(j - k, j + k + 1)
        )
        assert ring == cheb, (i, j)
