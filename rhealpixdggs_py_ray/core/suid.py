"""Packed cell-ID codec and integer SUID operations.

The reference addresses cells by SUID tuples ``(face_letter, d1..dr)``
and strings like ``'S001450634'`` (cell.py:11, cell.py:122-188).  The
engine keeps the canonical string for output/joins with reference
goldens, and additionally packs every cell into one ``uint64`` for
shuffles, sorts, prefix joins and groupbys:

    bits 63..60  face index (0..5)
    bits 59..4   up to 14 digits, 4 bits each, most significant first
    bits  3..0   resolution (0..14)

Within one resolution the packed value is order-isomorphic to the
lexicographic SUID order, which equals the reference's planar row-major
cover ordering within a face (dggs.py:1194) and its alphanumeric sort
(conversion.py:120-123).  Prefix (subcell) tests become shift/compare
(cell.py:437-454); parent truncation becomes mask+shift
(rhp_wrappers.py:123-160); successor becomes +1 in digit space
(cell.py:317-376).

Supports N_side in {2, 3} (digit < 9 < 16) and resolution <= 14, which
covers every parameterization exercised by the reference's tests; the
canonical WGS84_003 grid has max_resolution 15, and resolution-15 cells
fall back to string addressing (documented limitation).
"""

from __future__ import annotations

import numpy as np

from rhealpixdggs_py_ray.core.config import CELLS0, EngineConfig

MAX_PACK_RESOLUTION = 14
_FACE_CHARS = np.array([ord(c) for c in CELLS0], dtype=np.uint8)


def pack(face: np.ndarray, digits: np.ndarray, resolution: int) -> np.ndarray:
    """Pack (face[n], digits[n, resolution]) into uint64[n]."""
    face = np.asarray(face)
    n = face.shape[0]
    if resolution > MAX_PACK_RESOLUTION:
        raise ValueError(f"resolution {resolution} > {MAX_PACK_RESOLUTION}")
    out = face.astype(np.uint64) << np.uint64(60)
    for i in range(resolution):
        shift = np.uint64(56 - 4 * i)
        out |= digits[:, i].astype(np.uint64) << shift
    out |= np.uint64(resolution)
    return out


def unpack(u: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """uint64[n] -> (face[n] uint8, digits[n, max_res] uint8, res[n] uint8).

    Digit columns beyond each row's resolution are zero.
    """
    u = np.asarray(u, dtype=np.uint64)
    face = (u >> np.uint64(60)).astype(np.uint8)
    res = (u & np.uint64(0xF)).astype(np.uint8)
    rmax = int(res.max()) if res.size else 0
    digits = np.zeros((u.shape[0], rmax), dtype=np.uint8)
    for i in range(rmax):
        shift = np.uint64(56 - 4 * i)
        digits[:, i] = ((u >> shift) & np.uint64(0xF)).astype(np.uint8)
        digits[res <= i, i] = 0
    return face, digits, res


def resolution_of(u: np.ndarray) -> np.ndarray:
    return (np.asarray(u, dtype=np.uint64) & np.uint64(0xF)).astype(np.int64)


def face_of(u: np.ndarray) -> np.ndarray:
    return (np.asarray(u, dtype=np.uint64) >> np.uint64(60)).astype(np.int64)


def digit_at(u: np.ndarray, level: int) -> np.ndarray:
    """Digit at 1-based level (level 1 = first digit after the face)."""
    shift = np.uint64(56 - 4 * (level - 1))
    return ((np.asarray(u, dtype=np.uint64) >> shift) & np.uint64(0xF)).astype(np.int64)


def with_digit(u: np.ndarray, level: int, digit) -> np.ndarray:
    shift = np.uint64(56 - 4 * (level - 1))
    mask = ~(np.uint64(0xF) << shift)
    return (np.asarray(u, dtype=np.uint64) & mask) | (
        np.asarray(digit).astype(np.uint64) << shift
    )


def parent(u: np.ndarray, res: int) -> np.ndarray:
    """Truncate to resolution ``res`` (rhp_to_parent semantics for
    res <= cell resolution; rhp_wrappers.py:123-160)."""
    u = np.asarray(u, dtype=np.uint64)
    if res < 0:
        raise ValueError("resolution must be >= 0")
    keep = np.uint64(0xFFFFFFFFFFFFFFFF) << np.uint64(60 - 4 * res)
    return (u & keep) | np.uint64(res)


def is_subcell(child: np.ndarray, ancestor: np.ndarray) -> np.ndarray:
    """Vectorized prefix test (cell.py:437-454): child's SUID starts
    with ancestor's SUID (and child resolution >= ancestor's)."""
    child = np.asarray(child, dtype=np.uint64)
    ancestor = np.asarray(ancestor, dtype=np.uint64)
    ares = (ancestor & np.uint64(0xF)).astype(np.int64)
    cres = (child & np.uint64(0xF)).astype(np.int64)
    shift = (60 - 4 * ares).astype(np.uint64)
    trunc_child = (child >> shift) << shift
    trunc_anc = (ancestor >> shift) << shift
    return (trunc_child == trunc_anc) & (cres >= ares)


def to_string(u: np.ndarray) -> np.ndarray:
    """uint64[n] -> canonical SUID strings (cell.py:181-188), e.g.
    'S001450634'.  Vectorized via a byte matrix."""
    u = np.asarray(u, dtype=np.uint64)
    n = u.shape[0]
    face, digits, res = unpack(u)
    rmax = digits.shape[1]
    buf = np.zeros((n, 1 + rmax), dtype=np.uint8)
    buf[:, 0] = _FACE_CHARS[face]
    for i in range(rmax):
        buf[:, 1 + i] = np.where(res > i, digits[:, i] + ord("0"), 0)
    # Rows are null-terminated at their true length; decode row-wise.
    flat = buf.tobytes()
    width = 1 + rmax
    return np.array(
        [flat[i * width : i * width + 1 + int(res[i])].decode("ascii") for i in range(n)],
        dtype=object,
    )


def to_string_fixed(u: np.ndarray, resolution: int) -> np.ndarray:
    """uint64[n] (all at the same resolution) -> numpy unicode array of
    SUID strings, fully vectorized (no per-row Python).  The hot-path
    variant used by the CellIndexer stage."""
    u = np.asarray(u, dtype=np.uint64)
    n = u.shape[0]
    buf = np.empty((n, 1 + resolution), dtype=np.uint8)
    buf[:, 0] = _FACE_CHARS[(u >> np.uint64(60)).astype(np.int64)]
    for i in range(resolution):
        shift = np.uint64(56 - 4 * i)
        buf[:, 1 + i] = ((u >> shift) & np.uint64(0xF)).astype(np.uint8) + ord("0")
    flat = buf.reshape(-1).view(f"S{1 + resolution}")
    return np.char.decode(flat, "ascii")


def from_string(ids) -> np.ndarray:
    """SUID strings -> uint64 (inverse of to_string)."""
    out = np.zeros(len(ids), dtype=np.uint64)
    for i, s in enumerate(ids):
        face = CELLS0.index(s[0])
        res = len(s) - 1
        u = np.uint64(face) << np.uint64(60)
        for j, ch in enumerate(s[1:]):
            u |= np.uint64(int(ch)) << np.uint64(56 - 4 * j)
        out[i] = u | np.uint64(res)
    return out


def suid_tuple(u: int) -> tuple:
    """Single packed id -> reference-style suid tuple ('S', 0, 0, 1, ...)."""
    arr = np.asarray([u], dtype=np.uint64)
    face, digits, res = unpack(arr)
    r = int(res[0])
    return (CELLS0[int(face[0])],) + tuple(int(d) for d in digits[0, :r])


def from_suid_tuple(t) -> int:
    face = CELLS0.index(t[0])
    u = np.uint64(face) << np.uint64(60)
    for j, d in enumerate(t[1:]):
        u |= np.uint64(int(d)) << np.uint64(56 - 4 * j)
    return int(u | np.uint64(len(t) - 1))


def successor(u: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """Next cell at the same resolution in SUID order (cell.py:317-376).

    Returns 0 (invalid) past the last cell.  Vectorized base-N_side**2
    increment over the digit field.
    """
    u = np.asarray(u, dtype=np.uint64)
    face, digits, res = unpack(u)
    n = u.shape[0]
    K = cfg.N_side**2
    out_face = face.astype(np.int64)
    d = digits.astype(np.int64).copy()
    rmax = d.shape[1]
    carry = np.ones(n, dtype=bool)
    for lvl in range(rmax - 1, -1, -1):
        active = carry & (res > lvl)
        d[active, lvl] += 1
        wrapped = active & (d[:, lvl] >= K)
        d[wrapped, lvl] = 0
        carry = carry & ((res <= lvl) | wrapped)
    out_face[carry] += 1
    invalid = out_face > 5
    packed = pack(np.clip(out_face, 0, 5), d, int(res.max()) if n else 0)
    # pack() wrote a uniform resolution; restore per-row resolutions.
    packed = (packed & ~np.uint64(0xF)) | res.astype(np.uint64)
    # Zero out digit levels beyond each row's resolution (pack wrote them all).
    for lvl in range(rmax):
        shift = np.uint64(56 - 4 * lvl)
        clear = res <= lvl
        packed[clear] &= ~(np.uint64(0xF) << shift)
    packed[invalid] = 0
    return packed


def level_order_index(u: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """Level-order index of each cell (cell.py:218-267)."""
    u = np.asarray(u, dtype=np.uint64)
    face, digits, res = unpack(u)
    b = cfg.N_side**2
    resL = res.astype(np.int64)
    # num_cells(0, L-1) = 6*(b**L - 1)/(b - 1)
    base = 6 * (np.power(b, resL) - 1) // (b - 1)
    val = face.astype(np.int64)
    for i in range(digits.shape[1]):
        take = resL > i
        val = np.where(take, val * b + digits[:, i], val)
    return base + val


def suid_from_level_order_index(index: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """Inverse of level_order_index, vectorized (cell.py:89-120).
    Used by grid enumeration: ray.data.range -> packed cells."""
    index = np.asarray(index, dtype=np.int64)
    b = cfg.N_side**2
    # Find resolution L: cells at L occupy [ind(L), ind(L+1)).
    L = np.zeros(index.shape, dtype=np.int64)
    bound = np.full(index.shape, 6, dtype=np.int64)  # ind(1)
    total = np.full(index.shape, 6, dtype=np.int64)
    while True:
        more = index >= total
        if not more.any():
            break
        L[more] += 1
        bound = bound * b
        total = total + np.where(more, bound, 0)
        # total now = ind(L+1) for rows at this L
    # remainder within resolution block
    ind_L = 6 * (np.power(b, L) - 1) // (b - 1)
    rem = index - ind_L
    rmax = int(L.max()) if L.size else 0
    digits = np.zeros((index.shape[0], rmax), dtype=np.uint8)
    v = rem.copy()
    for i in range(rmax - 1, -1, -1):
        take = L > i
        digits[take, i] = (v[take] % b).astype(np.uint8)
        v = np.where(take, v // b, v)
    face = v.astype(np.uint8)  # leading base-b digit is the face
    out = pack(face, digits, rmax) if rmax else (face.astype(np.uint64) << np.uint64(60))
    out = (np.asarray(out, dtype=np.uint64) & ~np.uint64(0xF)) | L.astype(np.uint64)
    for lvl in range(rmax):
        shift = np.uint64(56 - 4 * lvl)
        clear = L <= lvl
        out[clear] &= ~(np.uint64(0xF) << shift)
    return out


def predecessor(u: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """Previous cell at the same resolution in SUID order
    (cell.py:378-435).  Returns 0 (invalid) before the first cell.
    Vectorized base-N_side**2 decrement with borrow."""
    u = np.asarray(u, dtype=np.uint64)
    face, digits, res = unpack(u)
    n = u.shape[0]
    K = cfg.N_side**2
    M = K - 1
    out_face = face.astype(np.int64)
    d = digits.astype(np.int64).copy()
    rmax = d.shape[1]
    borrow = np.ones(n, dtype=bool)
    for lvl in range(rmax - 1, -1, -1):
        active = borrow & (res > lvl)
        d[active, lvl] -= 1
        wrapped = active & (d[:, lvl] < 0)
        d[wrapped, lvl] = M
        borrow = borrow & ((res <= lvl) | wrapped)
    out_face[borrow] -= 1
    invalid = out_face < 0
    packed = pack(np.clip(out_face, 0, 5), d, rmax) if rmax else (
        np.clip(out_face, 0, 5).astype(np.uint64) << np.uint64(60)
    )
    packed = (np.asarray(packed, dtype=np.uint64) & ~np.uint64(0xF)) | res.astype(np.uint64)
    for lvl in range(rmax):
        shift = np.uint64(56 - 4 * lvl)
        clear = res <= lvl
        packed[clear] &= ~(np.uint64(0xF) << shift)
    packed[invalid] = 0
    return packed


def overlaps(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """True when the cells' SUIDs agree on their common prefix —
    i.e. one is an ancestor-or-equal of the other (cell.py:959-972)."""
    return is_subcell(a, b) | is_subcell(b, a)


def region_overlaps(a: np.ndarray, region: np.ndarray) -> np.ndarray:
    """For each cell in ``a``: does it overlap ANY cell in ``region``
    (cell.py:974-984)?  Vectorized as an (n, m) prefix matrix."""
    a = np.asarray(a, dtype=np.uint64)
    region = np.asarray(region, dtype=np.uint64)
    out = np.zeros(a.shape, dtype=bool)
    for r in region:
        out |= overlaps(a, np.full(a.shape, r, dtype=np.uint64))
    return out


def suid_rowcol(u: np.ndarray, cfg: EngineConfig) -> tuple[np.ndarray, np.ndarray]:
    """Row- and column-SUIDs (cell.py:269-291): each digit d splits into
    (d // N_side, d % N_side); returns two packed uint64 arrays on the
    same face."""
    u = np.asarray(u, dtype=np.uint64)
    face, digits, res = unpack(u)
    N = cfg.N_side
    rowd = (digits // N).astype(np.uint8)
    cold = (digits % N).astype(np.uint8)
    rmax = digits.shape[1]
    ru = pack(face, rowd, rmax) if rmax else (face.astype(np.uint64) << np.uint64(60))
    cu = pack(face, cold, rmax) if rmax else (face.astype(np.uint64) << np.uint64(60))
    for arr in (ru, cu):
        arr &= ~np.uint64(0xF)
        arr |= res.astype(np.uint64)
        for lvl in range(rmax):
            shift = np.uint64(56 - 4 * lvl)
            arr[res <= lvl] &= ~(np.uint64(0xF) << shift)
    return ru, cu


def interval_cells(a: int, b: int, cfg: EngineConfig) -> np.ndarray:
    """All cells at resolution max(res(a), res(b)) between ``a`` and
    ``b`` in post-order (dggs.py:710-735), as a vectorized level-order
    index range."""
    ua = np.asarray([a], dtype=np.uint64)
    ub = np.asarray([b], dtype=np.uint64)
    ra = int(resolution_of(ua)[0])
    rb = int(resolution_of(ub)[0])
    r = max(ra, rb)
    K = cfg.N_side**2
    if ra < r:
        # reference: start = a.successor(r) = successor at res ra, padded 0s
        nxt = successor(ua, cfg)
        if int(nxt[0]) == 0:
            return np.empty(0, dtype=np.uint64)
        start_u = nxt
        for lvl in range(ra + 1, r + 1):
            start_u = with_digit(start_u, lvl, 0)
        start_u = (start_u & ~np.uint64(0xF)) | np.uint64(r)
    else:
        start_u = (parent(ua, r) & ~np.uint64(0xF)) | np.uint64(r)
    end_u = ub
    for lvl in range(rb + 1, r + 1):
        end_u = with_digit(end_u, lvl, K - 1)
    end_u = (end_u & ~np.uint64(0xF)) | np.uint64(r)
    i0 = int(level_order_index(start_u, cfg)[0])
    i1 = int(level_order_index(end_u, cfg)[0])
    if i1 < i0:
        return np.empty(0, dtype=np.uint64)
    return suid_from_level_order_index(np.arange(i0, i1 + 1, dtype=np.int64), cfg)
