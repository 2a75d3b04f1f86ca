"""Cell adjacency: planar/ellipsoidal neighbors, rotations, rings.

Re-expresses the reference's Cell.neighbor / Cell.neighbors / rotate
(cell.py:1149-1446) and the wrapper ring walks cell_ring / k_ring
(rhp_wrappers.py:371-507 with helpers 680-807) on packed uint64 cells.

The planar neighbor step is fully vectorized (digit-table walk with
border carry + a precomputed per-face-pair rotation fix-up); the
ellipsoidal relabeling and ring walks operate per cell (they are
driver-side / small-k operations feeding covers and kNN expansion) and
are pure functions — the reference's temporary mutation of the shared
ellipsoid's lon_0 (cell.py:1399-1445) is replaced by an explicit
longitude shift.
"""

from __future__ import annotations

import numpy as np

from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import projection as prj
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core.config import (
    DOWN,
    LEFT,
    RIGHT,
    UP,
    CELLS0,
    DIR_INDEX,
    EngineConfig,
)
from rhealpixdggs_py_ray.core.utils import wrap_longitude

_ROTQ_CACHE: dict = {}


def _rotation_table(cfg: EngineConfig) -> np.ndarray:
    """(6, 6) int8: quarter turns to apply to a neighbor cell when a
    planar step crosses from face i to face j (cell.py:1310-1335)."""
    key = (cfg.N_side, cfg.north_square % 4, cfg.south_square % 4)
    t = _ROTQ_CACHE.get(key)
    if t is not None:
        return t
    an = cfg.face_neighbors  # (6, 4) in (up, right, down, left) order
    N_, S_ = 0, 5
    q = np.zeros((6, 6), dtype=np.int8)
    for s0 in range(6):
        for n0 in range(6):
            if (
                (s0 == S_ and n0 == an[S_, LEFT])
                or (s0 == an[S_, RIGHT] and n0 == S_)
                or (s0 == N_ and n0 == an[N_, RIGHT])
                or (s0 == an[N_, LEFT] and n0 == N_)
            ):
                q[s0, n0] = 1
            elif (
                (s0 == S_ and n0 == an[S_, DOWN])
                or (s0 == an[S_, DOWN] and n0 == S_)
                or (s0 == N_ and n0 == an[N_, UP])
                or (s0 == an[N_, UP] and n0 == N_)
            ):
                q[s0, n0] = 2
            elif (
                (s0 == S_ and n0 == an[S_, RIGHT])
                or (s0 == an[S_, LEFT] and n0 == S_)
                or (s0 == N_ and n0 == an[N_, LEFT])
                or (s0 == an[N_, RIGHT] and n0 == N_)
            ):
                q[s0, n0] = 3
    _ROTQ_CACHE[key] = q
    return q


def rotate(cfg: EngineConfig, u: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Rotate each cell's res-0 supercell by q quarter turns
    anticlockwise (cell.py:1207-1222): permute every digit."""
    u = np.asarray(u, dtype=np.uint64)
    q = np.asarray(q, dtype=np.int64)
    face, digits, res = su.unpack(u)
    rot = cfg.rotate_digit  # (4, N^2)
    out = face.astype(np.uint64) << np.uint64(60)
    for i in range(digits.shape[1]):
        d = rot[q % 4, digits[:, i]].astype(np.uint64)
        d = np.where(res > i, d, 0)
        out |= d << np.uint64(56 - 4 * i)
    out |= res.astype(np.uint64)
    return out


def neighbor(cfg: EngineConfig, u: np.ndarray, direction: int) -> np.ndarray:
    """Vectorized planar edge neighbor (cell.py:1278-1335).

    ``direction`` is one of UP/RIGHT/DOWN/LEFT.  This is the adjacency
    primitive behind ring expansion and cover walks.
    """
    u = np.asarray(u, dtype=np.uint64)
    face, digits, res = su.unpack(u)
    n = u.shape[0]
    rmax = digits.shape[1]
    resL = res.astype(np.int64)
    border = cfg._tables().digit_border  # (N^2, 4) bool
    dn = cfg.digit_neighbors

    # Deepest level whose digit is NOT on the crossed border; 0 if none.
    m = np.zeros(n, dtype=np.int64)
    for lvl in range(1, rmax + 1):
        d = digits[:, lvl - 1]
        nb = ~border[d, direction] & (resL >= lvl)
        m = np.where(nb & (lvl > m), lvl, m)

    out_face = np.where(m == 0, cfg.face_neighbors[face, direction], face).astype(
        np.uint64
    )
    out = out_face << np.uint64(60)
    for lvl in range(1, rmax + 1):
        d = digits[:, lvl - 1].astype(np.int64)
        replaced = np.where(lvl >= m, dn[d, direction], d).astype(np.uint64)
        replaced = np.where(resL >= lvl, replaced, 0)
        out |= replaced << np.uint64(56 - 4 * (lvl - 1))
    out |= res.astype(np.uint64)

    # Rotation fix-up at polar-face crossings.
    q = _rotation_table(cfg)[face, (out >> np.uint64(60)).astype(np.int64)]
    need = q != 0
    if need.any():
        out[need] = rotate(cfg, out[need], q[need])
    return out


def neighbors_plane(cfg: EngineConfig, u: np.ndarray) -> np.ndarray:
    """(n, 4) planar neighbors in (up, right, down, left) order."""
    u = np.asarray(u, dtype=np.uint64)
    out = np.empty((u.shape[0], 4), dtype=np.uint64)
    for d in range(4):
        out[:, d] = neighbor(cfg, u, d)
    return out


def neighbors(cfg: EngineConfig, u: int, plane: bool = True) -> dict:
    """Neighbor dict of one cell (cell.py:1347-1446).

    Planar keys: up/right/down/left.  Ellipsoidal keys depend on the
    cell's shape exactly as in the reference (quad: N/S/E/W; cap:
    south_0..3 or north_0..3; dart: west/east + SW/SE or NW/NE; skew
    quad: N/S/E/W).  Pure function: longitude recentering replaces the
    reference's shared-ellipsoid lon_0 mutation.
    """
    arr = np.asarray([u], dtype=np.uint64)
    pn = neighbors_plane(cfg, arr)[0]
    plane_dict = {
        "up": int(pn[UP]),
        "right": int(pn[RIGHT]),
        "down": int(pn[DOWN]),
        "left": int(pn[LEFT]),
    }
    if plane:
        return plane_dict

    shape = int(idx.shape_of(cfg, arr)[0])
    reg = int(idx.region_of(arr)[0])
    result: dict = {}
    if shape == idx.SHAPE_QUAD:
        result["north"] = plane_dict["up"]
        result["south"] = plane_dict["down"]
        result["west"] = plane_dict["left"]
        result["east"] = plane_dict["right"]
        return result

    cells = np.array(
        [plane_dict["up"], plane_dict["right"], plane_dict["down"], plane_dict["left"]],
        dtype=np.uint64,
    )
    lon, lat = idx.nucleus(cfg, cells, plane=False)

    if shape == idx.SHAPE_CAP:
        # Sort neighbors by nucleus longitude (cell.py:1379-1395).
        # Iteration order of plane_neighbors.values() in the reference
        # is left, right, down, up (cell.py:1366-1368); sort is stable
        # on (lon, lat) which never tie here.
        order_ref = [plane_dict["left"], plane_dict["right"], plane_dict["down"], plane_dict["up"]]
        lon_r, lat_r = idx.nucleus(cfg, np.array(order_ref, dtype=np.uint64), plane=False)
        trip = sorted(zip(lon_r.tolist(), lat_r.tolist(), [int(c) for c in order_ref]))
        prefix = "south" if reg == 1 else "north"
        for i in range(4):
            result[f"{prefix}_{i}"] = trip[i][2]
        return result

    # Skew quad / dart: recenter longitudes on this cell's nucleus
    # longitude to avoid east-west wrapping (cell.py:1396-1445).
    my_lon, _ = idx.nucleus(cfg, arr, plane=False)
    order_ref = ["left", "right", "down", "up"]
    # Build (lon', lat, cell) in the reference's dict-iteration order.
    ids = [plane_dict[d] for d in order_ref]
    l_r, a_r = idx.nucleus(cfg, np.array(ids, dtype=np.uint64), plane=False)
    l_s = wrap_longitude(l_r - my_lon[0], radians=cfg.radians)
    trip = list(zip(l_s.tolist(), a_r.tolist(), [int(c) for c in ids]))

    if shape == idx.SHAPE_SKEW:
        north = max(trip, key=lambda t: t[1])
        trip.remove(north)
        south = min(trip, key=lambda t: t[1])
        trip.remove(south)
        result["north"] = north[2]
        result["south"] = south[2]
        result["east"] = max(trip, key=lambda t: t[0])[2]
        result["west"] = min(trip, key=lambda t: t[0])[2]
        return result

    # Dart (cell.py:1422-1445): sort by (lon', lat).
    trip.sort()
    if reg == 1:
        keys = ["west", "south_west", "south_east", "east"]
    else:
        keys = ["west", "north_west", "north_east", "east"]
    for k, t in zip(keys, trip):
        result[k] = t[2]
    return result


# ---------------------------------------------------------------------------
# Ring walks (rhp_wrappers.py:371-507 + helpers)
# ---------------------------------------------------------------------------

_NEIGHBOURS = ["right", "down", "left", "up"]
_NEIGHBOUR_INV = {"right": "left", "down": "up", "left": "right", "up": "down"}


def _neighbor_u(cfg: EngineConfig, u: int, direction: str) -> int:
    return int(neighbor(cfg, np.asarray([u], dtype=np.uint64), DIR_INDEX[direction])[0])


def _neighbor_direction(cfg: EngineConfig, u: int, nb: int) -> str | None:
    for d in ("up", "right", "down", "left"):
        if _neighbor_u(cfg, u, d) == nb:
            return d
    return None


def mirror_on_cube(cfg: EngineConfig, u: int) -> int:
    """Antipodal cell on the cube (rhp_wrappers.py:689-715)."""
    face_map = {"N": "S", "S": "N", "O": "Q", "P": "R", "Q": "O", "R": "P"}
    t = su.suid_tuple(u)
    N = cfg.N_side
    out = [face_map[t[0]]]
    if len(t) > 1:
        region = ("north_polar" if t[0] == "N" else "south_polar" if t[0] == "S" else "equatorial")
        rows = [d // N for d in t[1:]]
        cols = [d % N for d in t[1:]]
        if region == "equatorial":
            rows = [N - r - 1 for r in rows]
        else:
            cols = [N - c - 1 for c in cols]
        out.extend(N * r + c for r, c in zip(rows, cols))
    return su.from_suid_tuple(tuple(out))


def cell_ring(cfg: EngineConfig, u: int, k: int = 1) -> list[int]:
    """Ring of cells at distance k (rhp_wrappers.py:371-468), including
    the reference's documented-incomplete behavior beyond two cube faces
    (rhp_wrappers.py:37, 799) which its tests pin."""
    if k < 0:
        return None
    if k == 0:
        return [u]
    res = int(su.resolution_of(np.asarray([u], dtype=np.uint64))[0])
    half_circle = 2 * cfg.N_side**res
    if k > half_circle:
        return [mirror_on_cube(cfg, u)]

    ring: list[int] = []
    if res == 0:
        for d in _NEIGHBOURS:
            nb = _neighbor_u(cfg, u, d)
            ring.append(su.parent(np.asarray([nb], dtype=np.uint64), 0)[0].item())
        return ring

    # _cell_ring_setup (rhp_wrappers.py:718-735)
    quarter = half_circle / 2
    if k > quarter:
        k_eff = max(int(2 * quarter - k), 0)
        cell = mirror_on_cube(cfg, u)
    else:
        k_eff = k
        cell = u
    max_steps = int(quarter) if 2 * k_eff > quarter else 2 * k_eff

    if k_eff < 1:
        return [cell]

    # _find_cell_ring_start (rhp_wrappers.py:738-807)
    directions = _NEIGHBOURS
    dir_idx = directions.index("left")
    steps_from_start = -1
    num_edges = 0
    d = 0
    while d < k_eff:
        d += 1
        direction = directions[dir_idx]
        nxt = _neighbor_u(cfg, cell, direction)
        if su.face_of(np.asarray([cell], dtype=np.uint64))[0] != su.face_of(
            np.asarray([nxt], dtype=np.uint64)
        )[0]:
            num_edges += 1
            if _neighbor_u(cfg, nxt, _NEIGHBOUR_INV[direction]) != cell:
                dir_idx = directions.index(
                    _NEIGHBOUR_INV[_neighbor_direction(cfg, nxt, cell)]
                )
        cell = nxt
        direction = directions[(dir_idx + 1) % 4]
        nxt = _neighbor_u(cfg, cell, direction)
        if su.face_of(np.asarray([cell], dtype=np.uint64))[0] != su.face_of(
            np.asarray([nxt], dtype=np.uint64)
        )[0]:
            num_edges += 1
            if _neighbor_u(cfg, nxt, _NEIGHBOUR_INV[direction]) != cell:
                dir_idx = (
                    directions.index(_NEIGHBOUR_INV[_neighbor_direction(cfg, nxt, cell)])
                    - 1
                ) % 4
            if num_edges > 1:
                dir_idx = (dir_idx - 1) % 4
                steps_from_start = d
                d = k_eff
        cell = nxt

    direction = _NEIGHBOUR_INV[directions[dir_idx]]
    if steps_from_start >= 0:
        n_steps = min(k_eff + steps_from_start - 1, max_steps)
        local_up = directions[(directions.index(direction) - 1) % 4]
        for _ in range(k_eff - steps_from_start):
            cell = _neighbor_u(cfg, cell, local_up)
    else:
        n_steps = max_steps

    # Walk the four sides (rhp_wrappers.py:444-467).
    for _ in range(4):
        step = 0
        while step < n_steps:
            ring.append(cell)
            nxt = _neighbor_u(cfg, cell, direction)
            if _neighbor_u(cfg, nxt, _NEIGHBOUR_INV[direction]) != cell:
                direction = _NEIGHBOUR_INV[_neighbor_direction(cfg, nxt, cell)]
            cell = nxt
            step += 1
        if n_steps == 2 * k_eff:
            direction = directions[(directions.index(direction) + 1) % 4]
        n_steps = max_steps
    return ring


def k_ring(cfg: EngineConfig, u: int, k: int = 1) -> list[int]:
    """Union of cell_rings at distances 0..k (rhp_wrappers.py:471-507)."""
    if k < 0:
        return None
    if k == 0:
        return [u]
    res = int(su.resolution_of(np.asarray([u], dtype=np.uint64))[0])
    distance = min(2 * cfg.N_side**res, k)
    out = [u]
    for d in range(1, distance + 1):
        out.extend(cell_ring(cfg, u, d))
    return out
