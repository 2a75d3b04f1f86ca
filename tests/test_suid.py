"""Packed SUID codec: round-trips, ordering, prefix ops, indices."""

import numpy as np

from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core.config import WGS84_003, UNIT_003


def test_string_roundtrip():
    ids = ["N", "S001450634", "Q3", "P871", "R88888", "O012345678"]
    u = su.from_string(ids)
    back = su.to_string(u)
    assert back.tolist() == ids


def test_pack_unpack():
    face = np.array([5, 0])
    digits = np.array([[0, 0, 1], [4, 8, 2]], dtype=np.uint8)
    u = su.pack(face, digits, 3)
    f, d, r = su.unpack(u)
    assert f.tolist() == [5, 0]
    assert d[:, :3].tolist() == digits.tolist()
    assert r.tolist() == [3, 3]


def test_order_isomorphic_to_suid_sort():
    rng = np.random.default_rng(0)
    ids = []
    for _ in range(500):
        res = rng.integers(0, 10)
        ids.append("NOPQRS"[rng.integers(0, 6)] + "".join(str(rng.integers(0, 9)) for _ in range(res)))
    # same-resolution groups sort identically to lexicographic strings
    for res in range(10):
        grp = [s for s in ids if len(s) - 1 == res]
        u = su.from_string(grp)
        by_u = [grp[i] for i in np.argsort(u, kind="stable")]
        assert by_u == sorted(grp)


def test_parent_and_subcell():
    u = su.from_string(["S001450634"])
    assert su.to_string(su.parent(u, 0))[0] == "S"
    assert su.to_string(su.parent(u, 4))[0] == "S0014"
    anc = su.from_string(["S0014"])
    assert su.is_subcell(u, anc)[0]
    assert not su.is_subcell(anc, u)[0]
    other = su.from_string(["S0015"])
    assert not su.is_subcell(u, other)[0]
    # cell.py:444-449: N1 subcell of N, not vice versa
    a = su.from_string(["N1"])
    b = su.from_string(["N"])
    assert su.is_subcell(a, b)[0] and not su.is_subcell(b, a)[0]


def test_successor_golden():
    # cell.py:326-333
    u = su.from_string(["N82"])
    assert su.to_string(su.successor(u, WGS84_003))[0] == "N83"
    u = su.from_string(["N88"])
    assert su.to_string(su.successor(u, WGS84_003))[0] == "O00"
    u = su.from_string(["S88"])
    assert su.successor(u, WGS84_003)[0] == 0  # past the end
    u = su.from_string(["N"])
    assert su.to_string(su.successor(u, WGS84_003))[0] == "O"


def test_level_order_index_golden():
    # cell.py:243-245: index of N2 at UNIT_003 is 8
    u = su.from_string(["N2"])
    assert su.level_order_index(u, UNIT_003)[0] == 8
    # round-trip across resolutions
    rng = np.random.default_rng(1)
    ids = []
    for _ in range(200):
        res = rng.integers(0, 6)
        ids.append("NOPQRS"[rng.integers(0, 6)] + "".join(str(rng.integers(0, 9)) for _ in range(res)))
    u = su.from_string(ids)
    li = su.level_order_index(u, WGS84_003)
    back = su.suid_from_level_order_index(li, WGS84_003)
    assert su.to_string(back).tolist() == ids


def test_suid_tuple_roundtrip():
    t = ("S", 0, 0, 1, 4, 5, 0, 6, 3, 4)
    assert su.suid_tuple(su.from_suid_tuple(t)) == t
