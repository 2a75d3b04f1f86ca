"""Driver-facing query suite: one Ray Data pipeline per implemented
operator family (SURVEY.md §2), each over the driver's test tables in
``sf_dir``, plus the matching DuckDB oracle SQL.

Every pair (pipeline, oracle) is value-hash comparable: float outputs
are either produced by bit-identical arithmetic on both sides (see
oracle.py) or quantized through ``floor(x * 10^k)`` integers so float
summation order can never flip a bit.

Coordinates for the spatial operators are derived from integer keys by
the shared deterministic rule ``oracle.lonlat_from_id`` — the same rule
is inlined in the SQL, so cell assignments are comparable end-to-end
down to the SUID string (reference parity: dggs.py:737-831 via
core/index.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from rhealpixdggs_py_ray import oracle, sizing
from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core.config import (
    CELLS0,
    EngineConfig,
    WGS84_002,
    WGS84_003,
    WGS84_123,
)
from rhealpixdggs_py_ray.pipelines.knn import knn_brute
from rhealpixdggs_py_ray.pipelines.tiles import aggregate_tiles
from rhealpixdggs_py_ray.stages.join import CoverSemiJoin, make_cover_ref

RES = 9          # headline indexing resolution (BASELINE.json metric)
TILE_RES = 2     # SUID-prefix tile resolution for groupby demos
CFG = WGS84_003

# Spatial-join bbox (lon1, lat1, lon2, lat2), degrees.
BBOX = (-40.0, -35.0, 95.0, 50.0)
COVER_RES = 2
COVER_PAD = 16.0  # degrees; cover stays a superset, refine stage is exact


def _read(sf_dir: str, table: str, columns=None, blocks: int | None = 16):
    # ``blocks`` is the measured bench-box profile (16 default; 4 for
    # exchange-bound queries: A/B'd in BASELINE.md — a map-only docs
    # query 0.77s @32 vs 0.38s @8 blocks, exchange fixed cost scales
    # with blocks x partitions).  sizing.read_blocks keeps that value
    # at sandbox scale and switches to fragment/128MiB-driven counts on
    # big inputs, so the override can never fuse a 100 TB read into 16
    # giant tasks (VERDICT r2 item 1).
    kwargs = {"columns": columns}
    path = f"{sf_dir}/{table}.parquet"
    if blocks is not None:
        kwargs["override_num_blocks"] = sizing.read_blocks(path, profile=blocks)
    return ray.data.read_parquet(path, **kwargs)


# ---------------------------------------------------------------------------
# Point indexing (cell_from_point, the hot path)
# ---------------------------------------------------------------------------

class DeriveAndIndex:
    """Actor-pool stage: id -> (lon, lat) -> res-RES cell.  DGGS tables
    are materialized once per actor (the reference rebuilds its
    projection closure per point, dggs.py:414-421)."""

    def __init__(self, resolution: int = RES, id_col: str = "event_id"):
        self.resolution = resolution
        self.id_col = id_col
        CFG._tables()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG, self.resolution, lon, lat, plane=False)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lon": pa.array(lon, type=pa.float64()),
                "lat": pa.array(lat, type=pa.float64()),
                "cell_u64": pa.array(u, type=pa.uint64()),
                "cell_id": pa.array(su.to_string_fixed(u, self.resolution)),
            }
        )


def indexed_events(sf_dir: str, resolution: int = RES, batch_size: int = 65536):
    ds = _read(sf_dir, "events", columns=["event_id"])
    if sizing.use_actor_pool(f"{sf_dir}/events.parquet"):
        return ds.map_batches(
            DeriveAndIndex,
            fn_constructor_kwargs={"resolution": resolution},
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            concurrency=sizing.pool(),
        )
    # small input: the same callable as a task map — the actor pool's
    # ~0.8 s launch latency never amortizes here (sizing.use_actor_pool)
    return ds.map_batches(
        DeriveAndIndex(resolution=resolution),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def q_cell_from_point(sf_dir: str):
    """events.event_id -> res-9 SUID (full projection + digit chain)."""
    return indexed_events(sf_dir).select_columns(["event_id", "cell_id"])


def _points_sql(table: str, id_col: str) -> str:
    lon, lat = oracle.lonlat_from_id_sql(id_col)
    return f"SELECT {id_col}, {lon} AS lon, {lat} AS lat FROM {table}"


def sql_cell_from_point() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",)
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


# Recentered configs (reference projection_wrapper.py:89-121 lon_0 /
# lat_0 handling) — the first SQL-oracled coverage OFF the
# lon_0=lat_0=0 grid (round-3 VERDICT gap 1).  Non-integer shifts keep
# fixture points clear of cell boundaries at every resolution.
CFG_LON0 = EngineConfig(lon_0=31.25)
CFG_SHIFTED = EngineConfig(lon_0=-47.5, lat_0=16.75)


def q_cell_from_point_lon0(sf_dir: str):
    """cell_from_point under a recentered lon_0=31.25 config: the
    engine's wrap_longitude(u - lon_0) recentering (projection.py:280,
    reference projection_wrapper.py:89) exercised end-to-end with a
    full SQL oracle (oracle._recenter_lon_sql)."""
    ds = _read(sf_dir, "events", columns=["event_id"])

    def index(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG_LON0, RES, lon, lat, plane=False)
        return pa.table({
            "event_id": batch["event_id"],
            "cell_id": pa.array(su.to_string_fixed(u, RES), type=pa.string()),
        })

    return ds.map_batches(index, batch_format="pyarrow", zero_copy_batch=True)


def sql_cell_from_point_lon0() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG_LON0, id_cols=("event_id",)
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


def _cell_from_point_cfg_q(cfg: EngineConfig, res: int = RES):
    def q(sf_dir: str):
        ds = _read(sf_dir, "events", columns=["event_id"])

        def index(batch: pa.Table) -> pa.Table:
            ids = batch["event_id"].to_numpy(zero_copy_only=False)
            lon, lat = oracle.lonlat_from_id(ids)
            u = idx.cell_from_point(cfg, res, lon, lat, plane=False)
            return pa.table({
                "event_id": batch["event_id"],
                "cell_id": pa.array(su.to_string_fixed(u, res), type=pa.string()),
            })

        return ds.map_batches(index, batch_format="pyarrow", zero_copy_batch=True)

    return q


def q_cell_from_point_nside2(sf_dir: str):
    """cell_from_point under N_side=2 (WGS84_002): the 2x2 subdivision
    digit chain, SQL-oracled (first off-N_side=3 DuckDB oracle)."""
    return _cell_from_point_cfg_q(WGS84_002)(sf_dir)


def sql_cell_from_point_nside2() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, WGS84_002,
        id_cols=("event_id",),
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


def q_cell_from_point_unit(sf_dir: str):
    """cell_from_point on the unit sphere (UNIT_003, R=1): exercises
    the R_A scaling path off the WGS84 ellipsoid, SQL-oracled."""
    from rhealpixdggs_py_ray.core.config import UNIT_003

    return _cell_from_point_cfg_q(UNIT_003)(sf_dir)


def sql_cell_from_point_unit() -> str:
    from rhealpixdggs_py_ray.core.config import UNIT_003

    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, UNIT_003,
        id_cols=("event_id",),
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


def q_cell_from_point_ns12(sf_dir: str):
    """cell_from_point under north_square=1 / south_square=2
    (WGS84_123): polar-cap rearrangement off the default squares,
    SQL-oracled."""
    return _cell_from_point_cfg_q(WGS84_123)(sf_dir)


def sql_cell_from_point_ns12() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, WGS84_123,
        id_cols=("event_id",),
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


RADIANS_N = 1000


def q_cell_from_point_radians(sf_dir: str):
    """cell_from_point under a RADIANS config (WGS84_003_RADIANS):
    angles pass to the chain unconverted (projection.py:forward skips
    deg2rad).  Fixture angles are dyadic fractions (6*m/256, 3*m/512 are
    exact doubles), so engine and SQL see bit-identical radians without
    trusting deg2rad parity."""
    from rhealpixdggs_py_ray.core.config import WGS84_003_RADIANS

    ids = np.arange(RADIANS_N, dtype=np.int64)
    lon = -3.0 + 6.0 * ((ids * 73 % 256) / 256.0)
    lat = -1.5 + 3.0 * ((ids * 151 % 512) / 512.0)
    u = idx.cell_from_point(WGS84_003_RADIANS, RES, lon, lat, plane=False)
    return pa.table({
        "pid": pa.array(ids),
        "cell_id": pa.array(su.to_string_fixed(u, RES), type=pa.string()),
    })


def sql_cell_from_point_radians() -> str:
    from rhealpixdggs_py_ray.core.config import WGS84_003_RADIANS

    pts = (
        f"SELECT k AS pid,"
        f" -3.0 + 6.0 * (CAST(k * 73 % 256 AS DOUBLE) / 256.0) AS lon,"
        f" -1.5 + 3.0 * (CAST(k * 151 % 512 AS DOUBLE) / 512.0) AS lat"
        f" FROM (SELECT unnest(generate_series(0, {RADIANS_N - 1})) AS k)"
    )
    inner = oracle.cell_from_point_sql(
        pts, RES, WGS84_003_RADIANS, id_cols=("pid",)
    )
    return f"SELECT pid, cell_id FROM {inner} t"


def q_cell_from_point_shifted(sf_dir: str):
    """cell_from_point under a doubly-recentered config (lon_0=-47.5,
    lat_0=16.75): exercises both wrap_longitude and wrap_latitude
    recentering (projection.py:280-281) with a full SQL oracle."""
    ds = _read(sf_dir, "events", columns=["event_id"])

    def index(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG_SHIFTED, RES, lon, lat, plane=False)
        return pa.table({
            "event_id": batch["event_id"],
            "cell_id": pa.array(su.to_string_fixed(u, RES), type=pa.string()),
        })

    return ds.map_batches(index, batch_format="pyarrow", zero_copy_batch=True)


def sql_cell_from_point_shifted() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG_SHIFTED,
        id_cols=("event_id",),
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


# ---------------------------------------------------------------------------
# SUID-prefix tile aggregation (combiner + salted groupby)
# ---------------------------------------------------------------------------

def q_tile_counts(sf_dir: str):
    ds = indexed_events(sf_dir)
    return aggregate_tiles(ds, TILE_RES, salt_col=None).select_columns(["tile_id", "n"])


def sql_tile_counts() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",)
    )
    return (
        f"SELECT substr(cell_id, 1, {1 + TILE_RES}) AS tile_id, COUNT(*) AS n"
        f" FROM {inner} t GROUP BY 1"
    )


def q_cell_color(sf_dir: str):
    """``Cell.color`` (reference cell.py:1489-1504) over the distinct
    res-2 event tiles: a unique HSV-derived RGB per cell (hue from the
    SUID digits, colorsys.hsv_to_rgb(hue, 0.5, 1)), vectorized in
    core/wrappers.py:cell_color_u64 and replayed bit-exactly in SQL
    from the SUID string digits; rgb quantized at 1e6 for the
    value-hash."""
    from rhealpixdggs_py_ray.core import wrappers as W

    tiles = aggregate_tiles(indexed_events(sf_dir), TILE_RES, salt_col=None)

    def colorize(batch: pa.Table) -> pa.Table:
        u = su.from_string(batch["tile_id"].to_pylist())
        r, g, b = W.cell_color_u64(u, 0.5, CFG)
        return pa.table({
            "tile_id": batch["tile_id"],
            "r_q6": pa.array(np.floor(r * 1000000.0).astype(np.int64)),
            "g_q6": pa.array(np.floor(g * 1000000.0).astype(np.int64)),
            "b_q6": pa.array(np.floor(b * 1000000.0).astype(np.int64)),
        })

    return tiles.map_batches(colorize, batch_format="pyarrow", zero_copy_batch=True)


def sql_cell_color() -> str:
    """Replays cell_color_u64's float chain exactly: left-associated
    digit sum with repr-embedded N^(-2i) constants, the two /6.0
    divisions kept separate, colorsys's expression order."""
    L = oracle._lit
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",)
    )
    six = L(6.0)
    acc = " + ".join(
        f"CAST(substr(tile_id, {1 + i + 1}, 1) AS DOUBLE) * {L(CFG.N_side ** (-2 * (i + 1)))}"
        for i in range(TILE_RES)
    )
    s, v = L(0.5), L(1.0)
    return f"""
WITH tiles AS MATERIALIZED (
  SELECT DISTINCT substr(cell_id, 1, {1 + TILE_RES}) AS tile_id FROM {inner} t
), hue AS MATERIALIZED (
  SELECT tile_id,
    CAST(strpos('NOPQRS', substr(tile_id, 1, 1)) - 1 AS DOUBLE) / {six}
      + ({acc}) / {six} AS h
  FROM tiles
), hsv AS MATERIALIZED (
  SELECT tile_id, h,
    CAST(floor(h * {six}) AS BIGINT) % 6 AS i,
    (h * {six}) - CAST(floor(h * {six}) AS BIGINT) AS f
  FROM hue
), pqt AS MATERIALIZED (
  SELECT tile_id, i,
    {v} * ({L(1.0)} - {s}) AS p,
    {v} * ({L(1.0)} - {s} * f) AS q,
    {v} * ({L(1.0)} - {s} * ({L(1.0)} - f)) AS t
  FROM hsv
)
SELECT tile_id,
  CAST(floor((CASE i WHEN 0 THEN {v} WHEN 1 THEN q WHEN 2 THEN p
              WHEN 3 THEN p WHEN 4 THEN t ELSE {v} END) * {L(1e6)}) AS BIGINT) AS r_q6,
  CAST(floor((CASE i WHEN 0 THEN t WHEN 1 THEN {v} WHEN 2 THEN {v}
              WHEN 3 THEN q WHEN 4 THEN p ELSE p END) * {L(1e6)}) AS BIGINT) AS g_q6,
  CAST(floor((CASE i WHEN 0 THEN p WHEN 1 THEN p WHEN 2 THEN t
              WHEN 3 THEN {v} WHEN 4 THEN {v} ELSE q END) * {L(1e6)}) AS BIGINT) AS b_q6
FROM pqt
"""


# ---------------------------------------------------------------------------
# Spatial join: cover semi-join (pruning) + exact refine + per-face counts
# ---------------------------------------------------------------------------

def q_spatial_join_bbox(sf_dir: str):
    lon1, lat1, lon2, lat2 = BBOX
    pad = COVER_PAD
    poly = geo.Polygon(
        [
            (max(lon1 - pad, -180.0), min(lat2 + pad, 89.9)),
            (min(lon2 + pad, 179.9), min(lat2 + pad, 89.9)),
            (min(lon2 + pad, 179.9), max(lat1 - pad, -89.9)),
            (max(lon1 - pad, -180.0), max(lat1 - pad, -89.9)),
        ]
    )
    cover_ref, _ = make_cover_ref(poly, COVER_RES, cfg=CFG, plane=False)
    ds = indexed_events(sf_dir)
    ds = ds.map_batches(
        CoverSemiJoin,
        fn_constructor_args=(cover_ref, COVER_RES),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=sizing.pool(8),
    )

    def refine(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        keep = (lon >= lon1) & (lon <= lon2) & (lat >= lat1) & (lat <= lat2)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)[keep]
        # face letter straight from the packed id (no per-row string slice)
        face = _FACE_LETTERS[su.face_of(u)]
        return pa.table({"face_id": pa.array(face, type=pa.string())})

    ds = ds.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("face_id").aggregate(Count(alias_name="n"))


_FACE_LETTERS = np.array(list(CELLS0))


def sql_spatial_join_bbox() -> str:
    lon1, lat1, lon2, lat2 = BBOX
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",),
        extra_cols=(),
    )
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    return (
        f"SELECT substr(cell_id, 1, 1) AS face_id, COUNT(*) AS n FROM {inner} t"
        f" WHERE {lon} >= {lon1!r} AND {lon} <= {lon2!r}"
        f" AND {lat} >= {lat1!r} AND {lat} <= {lat2!r} GROUP BY 1"
    )


ZONAL_ZONES = (
    ((-30.0, 35.0), (20.0, 38.0), (25.0, 5.0), (-20.0, -8.0)),
    ((0.0, 20.0), (60.0, 30.0), (70.0, -15.0), (5.0, -25.0)),
    ((-120.0, 10.0), (-60.0, 25.0), (-55.0, -20.0), (-110.0, -30.0)),
)


def q_zonal_stats(sf_dir: str):
    """Zonal statistics (the raster/vector analytics join): count the
    event points inside each of three polygons.  Per-zone padded-bbox
    covers at COVER_RES are merged into ONE broadcast (cell -> zone
    bitmask) lookup; each batch prunes by cell ancestor, then refines
    only the candidate rows per zone with the exact vectorized
    ray-casting PIP (core/geometry.points_in_polygon — the same
    arithmetic the oracle replays).  Overlapping zones count a point
    in each; only ≤ |zones| partial rows per batch reach the
    exchange."""
    from rhealpixdggs_py_ray.core import wrappers as W

    pad = COVER_PAD
    zone_cells = []
    for verts in ZONAL_ZONES:
        lons = [v[0] for v in verts]
        lats = [v[1] for v in verts]
        bbox = geo.Polygon([
            (max(min(lons) - pad, -180.0), min(max(lats) + pad, 89.9)),
            (min(max(lons) + pad, 179.9), min(max(lats) + pad, 89.9)),
            (min(max(lons) + pad, 179.9), max(min(lats) - pad, -89.9)),
            (max(min(lons) - pad, -180.0), max(min(lats) - pad, -89.9)),
        ])
        cells = W.polyfill(bbox, COVER_RES, plane=False, cfg=CFG)
        zone_cells.append(np.sort(su.from_string(sorted(cells))))
    allc = np.unique(np.concatenate(zone_cells))
    mask = np.zeros(len(allc), dtype=np.int64)
    for z, zc in enumerate(zone_cells):
        mask[np.searchsorted(allc, zc)] |= 1 << z
    look_ref = ray.put((allc, mask))

    ds = indexed_events(sf_dir)

    def zonal(batch: pa.Table) -> pa.Table:
        cells, m = ray.get(look_ref)
        u = su.parent(
            batch["cell_u64"].to_numpy(zero_copy_only=False), COVER_RES
        )
        pos = np.minimum(np.searchsorted(cells, u), len(cells) - 1)
        zm = np.where(cells[pos] == u, m[pos], 0)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        zs, ns = [], []
        for z, verts in enumerate(ZONAL_ZONES):
            cand = (zm >> z) & 1 == 1
            if not cand.any():
                continue
            inside = geo.points_in_polygon(
                lon[cand], lat[cand], geo.Polygon(list(verts))
            )
            zs.append(z)
            ns.append(int(inside.sum()))
        return pa.table({
            "zone": pa.array(np.asarray(zs, dtype=np.int64)),
            "n_points": pa.array(np.asarray(ns, dtype=np.int64)),
        })

    part = ds.map_batches(zonal, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("zone").aggregate(Sum("n_points", alias_name="n_points"))


def sql_zonal_stats() -> str:
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    parts = []
    for z, verts in enumerate(ZONAL_ZONES):
        pip = oracle._pip_sql(list(verts), "px", "py")
        parts.append(
            f"SELECT CAST({z} AS BIGINT) AS zone,"
            f" CAST(COUNT(*) AS BIGINT) AS n_points FROM pts WHERE {pip}"
        )
    return (
        f"WITH pts AS MATERIALIZED (SELECT {lon} AS px, {lat} AS py FROM events) "
        + " UNION ALL ".join(parts)
    )


# ---------------------------------------------------------------------------
# Grid enumeration (dggs.grid, embarrassingly parallel)
# ---------------------------------------------------------------------------

GRID_RES = 3


def q_grid(sf_dir: str):
    b = CFG.N_side**2
    total = 6 * b**GRID_RES
    base = 6 * (b**GRID_RES - 1) // (b - 1)  # level-order offset of res GRID_RES

    def to_suid(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        return pa.table({"cell_id": pa.array(su.to_string_fixed(u, GRID_RES))})

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 8)).map_batches(
        to_suid, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_grid() -> str:
    return oracle.grid_sql(GRID_RES, CFG)


GRID_UL_RES = 4


def q_grid_ul_r4(sf_dir: str):
    """Every res-4 cell with its planar upper-left vertex
    (cell.py:483-531 digit arithmetic) — extends the grid_ul oracle
    past the round-3 res-3 cap (VERDICT r3 item 3)."""
    b = CFG.N_side**2
    total = 6 * b**GRID_UL_RES
    base = 6 * (b**GRID_UL_RES - 1) // (b - 1)

    def to_ul(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        x, y = idx.ul_vertex(CFG, u)
        return pa.table({
            "cell_id": pa.array(su.to_string_fixed(u, GRID_UL_RES)),
            "xul_micros": pa.array(np.floor(x * 1e6).astype(np.int64)),
            "yul_micros": pa.array(np.floor(y * 1e6).astype(np.int64)),
        })

    return ray.data.range(
        total, override_num_blocks=sizing.range_blocks(total, 8)
    ).map_batches(to_ul, batch_format="pyarrow", zero_copy_batch=True)


def sql_grid_ul_r4() -> str:
    ul = oracle.grid_ul_sql(GRID_UL_RES, CFG)
    return (
        f"SELECT cell_id,"
        f" CAST(floor(xul * 1e6) AS BIGINT) AS xul_micros,"
        f" CAST(floor(yul * 1e6) AS BIGINT) AS yul_micros"
        f" FROM {ul} t"
    )


# ---------------------------------------------------------------------------
# kNN (broadcast queries + per-batch partial top-k + per-query reduce)
# ---------------------------------------------------------------------------

KNN_Q = 8
KNN_K = 5


def derived_events(sf_dir: str):
    """events.event_id -> (lon, lat) only — for consumers that never
    touch cells (brute kNN): plain task-pool map, no actor spin-up, no
    SUID string build."""
    ds = _read(sf_dir, "events", columns=["event_id"])

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "lon": pa.array(lon, type=pa.float64()),
                "lat": pa.array(lat, type=pa.float64()),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def q_knn(sf_dir: str):
    qids = np.arange(KNN_Q, dtype=np.int64)
    qlon, qlat = oracle.lonlat_from_id(qids + 1_000_000)
    ds = derived_events(sf_dir)
    out = knn_brute(
        ds,
        {"qid": qids, "lon": qlon, "lat": qlat},
        k=KNN_K,
        cfg=CFG,
        id_col="event_id",
    )
    return out.select_columns(["qid", "neighbor_id", "rank"])


def sql_knn() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    qlon, qlat = oracle.lonlat_from_id_sql("qid + 1000000")
    xyz = (
        "SELECT {id} AS pid, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*cos(radians(lon))*cos(radians(lat)) AS x, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*sin(radians(lon))*cos(radians(lat)) AS y, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*(1 - {e2})*sin(radians(lat)) AS z FROM {{src}}"
    )
    pts = xyz.format(id="event_id", src=f"(SELECT event_id, {lon} AS lon, {lat} AS lat FROM events)")
    qs = xyz.format(
        id="qid",
        src=(
            f"(SELECT qid, {qlon} AS lon, {qlat} AS lat FROM"
            f" (SELECT unnest(generate_series(0, {KNN_Q - 1})) AS qid))"
        ),
    )
    return (
        f"WITH p AS ({pts}), q AS ({qs}),"
        " d AS (SELECT q.pid AS qid, p.pid AS neighbor_id,"
        "  (q.x-p.x)*(q.x-p.x) + (q.y-p.y)*(q.y-p.y) + (q.z-p.z)*(q.z-p.z) AS d2"
        "  FROM q CROSS JOIN p)"
        " SELECT qid, neighbor_id,"
        "  row_number() OVER (PARTITION BY qid ORDER BY d2, neighbor_id) AS rank"
        f" FROM d QUALIFY rank <= {KNN_K}"
    )


# ---------------------------------------------------------------------------
# Relational shuffle patterns over the TPC-H-ish tables
# ---------------------------------------------------------------------------

class _LineitemCombiner:
    """Per-batch partial aggregation (combiner) before the small groupby:
    quantized to integer cents via floor so merge order can't change a
    single bit of the result.  Pure numpy segment sums — no pandas
    round-trip in the hot path."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rf = batch["l_returnflag"].to_numpy(zero_copy_only=False).astype("U1")
        ls = batch["l_linestatus"].to_numpy(zero_copy_only=False).astype("U1")
        q = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        b = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        d = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
        ).astype(np.int64)
        key = np.char.add(rf, ls)
        uq, inv = np.unique(key, return_inverse=True)
        k = len(uq)
        sums = np.zeros((3, k), dtype=np.int64)
        np.add.at(sums[0], inv, q)
        np.add.at(sums[1], inv, b)
        np.add.at(sums[2], inv, d)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": pa.array([s[0] for s in uq], type=pa.string()),
                "l_linestatus": pa.array([s[1] for s in uq], type=pa.string()),
                "sum_qty_c": pa.array(sums[0]),
                "sum_base_c": pa.array(sums[1]),
                "sum_disc_c": pa.array(sums[2]),
                "n_part": pa.array(n),
            }
        )


def q_agg_lineitem(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    partial = ds.map_batches(_LineitemCombiner(), batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_c"),
        Sum("sum_base_c", alias_name="sum_base_c"),
        Sum("sum_disc_c", alias_name="sum_disc_c"),
        Sum("n_part", alias_name="n"),
    )


def sql_agg_lineitem() -> str:
    return (
        "SELECT l_returnflag, l_linestatus,"
        " CAST(SUM(CAST(floor(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,"
        " CAST(SUM(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,"
        " CAST(SUM(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,"
        " COUNT(*) AS n"
        " FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )


def q_join_customer_nation(sf_dir: str):
    """Broadcast join + map-side combine: the nation table ships once
    via ray.put (zero-copy object-store read per task, no actor-pool
    startup for a stateless lookup), each batch pre-aggregates to at
    most 25 (n_name, count, sum) partial rows, and only those partials
    enter the groupby exchange (the first version shuffled all 150k
    joined rows into the sort: 3.8-5.3s vs ~1.2s)."""
    nation = (
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name"], blocks=1)
        .to_pandas()
    )
    nkeys = nation["n_nationkey"].to_numpy().astype(np.int64)
    order = np.argsort(nkeys)
    lookup_ref = ray.put((nkeys[order], nation["n_name"].to_numpy()[order]))
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"], blocks=4)

    def join_combine(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(lookup_ref)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bal_c = np.floor(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uq, inv = np.unique(nk, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, bal_c)
        pos = np.searchsorted(keys, uq)
        pos = np.clip(pos, 0, len(keys) - 1)
        hit = keys[pos] == uq  # inner-join semantics
        return pa.table(
            {
                "n_name": pa.array(names[pos][hit], type=pa.string()),
                "n_partial": pa.array(n[hit]),
                "s_partial": pa.array(s[hit]),
            }
        )

    partials = ds.map_batches(join_combine, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("n_name").aggregate(
        Sum("n_partial", alias_name="n_customers"),
        Sum("s_partial", alias_name="sum_bal_c"),
    )


def sql_join_customer_nation() -> str:
    return (
        "SELECT n_name, COUNT(*) AS n_customers,"
        " CAST(SUM(CAST(floor(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_c"
        " FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    )


def q_topk_orders(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], blocks=4)
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def sql_topk_orders() -> str:
    return (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    )


# ---------------------------------------------------------------------------
# Exact dedup (hash-partition + per-group min)
# ---------------------------------------------------------------------------

def q_curate(sf_dir: str):
    """Composed end-to-end curation pipeline — the realistic shape a
    training-data user runs: language filter (pred_lang == 'en') AND
    quality gate (n_tokens >= 5, alpha_ratio >= 0.5) -> exact dedup of
    the survivors (keep min doc_id per md5) -> per-source kept counts.
    One fused map stage computes lang + quality + md5 per batch (the
    operators compose row-aligned), then a bucket exchange dedupes and
    pre-counts, then a tiny per-source sum."""
    from rhealpixdggs_py_ray.ops.text import LangId, QualityScorer

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def curate_batch(batch: pa.Table) -> pa.Table:
        lang = LangId()(batch)
        qual = QualityScorer()(batch)
        keep = (
            (np.asarray(lang["pred_lang"]) == "en")
            & (qual["n_tokens"].to_numpy() >= 5)
            & (qual["alpha_ratio"].to_numpy() >= 0.5)
        )
        idx = np.flatnonzero(keep)
        texts = batch["text"].to_pylist()
        hexes = [hashlib.md5(texts[i].encode("utf-8")).hexdigest() for i in idx]
        bucket = np.fromiter(
            (int(h[:2], 16) & 31 for h in hexes), dtype=np.int64, count=len(hexes)
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(idx)),
                "source": batch["source"].take(pa.array(idx)),
                "text_md5": pa.array(hexes, type=pa.string()),
                "bucket": pa.array(bucket),
            }
        )

    def dedup_count(g: pa.Table) -> pa.Table:
        md5 = g["text_md5"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(md5)
        order = np.lexsort((doc, codes))
        cs = codes[order]
        first = order[np.r_[True, cs[1:] != cs[:-1]]]
        src, cnt = np.unique(
            g["source"].to_numpy(zero_copy_only=False)[first], return_counts=True
        )
        return pa.table(
            {
                "source": pa.array(src, type=pa.string()),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    kept = ds.map_batches(curate_batch, batch_format="pyarrow", zero_copy_batch=True)
    partials = kept.groupby("bucket").map_groups(dedup_count, batch_format="pyarrow")
    return partials.groupby("source").aggregate(Sum("n_partial", alias_name="n_kept"))


def sql_curate() -> str:
    from rhealpixdggs_py_ray.ops import text

    return (
        f"WITH lang AS MATERIALIZED ({text.langid_sql()}),"
        f" qual AS MATERIALIZED ({text.quality_sql()}),"
        " f AS MATERIALIZED ("
        "  SELECT d.doc_id, d.source, md5(d.text) AS h"
        "  FROM documents d"
        "  JOIN lang l ON l.doc_id = d.doc_id"
        "  JOIN qual q ON q.doc_id = d.doc_id"
        "  WHERE l.pred_lang = 'en' AND q.n_tokens >= 5 AND q.alpha_ratio >= 0.5),"
        " k AS MATERIALIZED (SELECT h, MIN(doc_id) AS keep_id FROM f GROUP BY h)"
        " SELECT f.source, COUNT(*) AS n_kept"
        " FROM f JOIN k ON f.doc_id = k.keep_id GROUP BY f.source"
    )


def q_topk_per_group(sf_dir: str):
    """Per-group top-k (top-3 orders by totalprice within each
    o_orderpriority, ties -> smaller key): every batch keeps at most
    3 rows per group (vectorized lexsort partial top-k), so the final
    exchange merges <= 3*n_groups*n_blocks tiny partials — the
    distributed shape for 'best documents per domain' selection."""
    K = 3
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        key = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(pr)
        order = np.lexsort((key, -price, codes))
        codes_s = codes[order]
        # rank within group after the (price DESC, key ASC) sort
        starts = np.flatnonzero(
            np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        )
        rank = np.arange(len(codes_s)) - np.repeat(starts, np.diff(np.append(starts, len(codes_s))))
        keep = order[rank < K]
        return pa.table(
            {
                "o_orderpriority": pa.array(pr[keep], type=pa.string()),
                "o_orderkey": pa.array(key[keep]),
                "price_c": pa.array(np.floor(price[keep] * 100).astype(np.int64)),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        key = g["o_orderkey"].to_numpy(zero_copy_only=False)
        price = g["price_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -price))[:K]
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "o_orderkey": pa.array(key[order]),
                "price_c": pa.array(price[order]),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("o_orderpriority").map_groups(final, batch_format="pyarrow")


def sql_topk_per_group() -> str:
    return (
        "SELECT o_orderpriority,"
        " CAST(row_number() OVER (PARTITION BY o_orderpriority"
        "   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,"
        " o_orderkey, CAST(floor(o_totalprice*100) AS BIGINT) AS price_c"
        " FROM orders"
        " QUALIFY rank <= 3"
    )


def q_dedup_exact(sf_dir: str):
    """Exact dedup, hash-partitioned: rows ride ONE exchange keyed by a
    small int bucket (the md5's leading byte), and each bucket group
    resolves keep_id/n_dups with a vectorized pandas groupby.  Locally
    this times about even with the string-key sort aggregate (the md5
    computation dominates at sf scale); the bucket exchange is the
    shape that holds when the distinct-key count is billions."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def key(batch: pa.Table) -> pa.Table:
        hexes = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        bucket = np.fromiter(
            (int(h[:2], 16) & 31 for h in hexes), dtype=np.int64, count=len(hexes)
        )
        return pa.table(
            {
                "text_md5": pa.array(hexes, type=pa.string()),
                "doc_id": batch["doc_id"],
                "bucket": pa.array(bucket),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(g.select(["text_md5", "doc_id"]), "text_md5").aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return out.rename_columns(["text_md5", "keep_id", "n_dups"])

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("bucket").map_groups(combine, batch_format="pyarrow")


def sql_dedup_exact() -> str:
    return (
        "SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups"
        " FROM documents GROUP BY 1"
    )


def q_dedup_normalized(sf_dir: str):
    """Normalization-aware exact dedup: lowercase, collapse every
    non-[a-z0-9] run to one space, trim, then md5-group (catches
    whitespace/punctuation/casing dups that byte-exact dedup misses —
    the first dedup stage of a real curation pipeline).  Same
    one-exchange bucket shape as dedup_exact."""
    import re as _re

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pat = _re.compile(r"[^a-z0-9]+")

    def key(batch: pa.Table) -> pa.Table:
        hexes = [
            hashlib.md5(pat.sub(" ", t.lower()).strip().encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        bucket = np.fromiter(
            (int(h[:2], 16) & 31 for h in hexes), dtype=np.int64, count=len(hexes)
        )
        return pa.table({
            "norm_md5": pa.array(hexes, type=pa.string()),
            "doc_id": batch["doc_id"],
            "bucket": pa.array(bucket),
        })

    def combine(g: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(g.select(["norm_md5", "doc_id"]), "norm_md5").aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        return out.rename_columns(["norm_md5", "keep_id", "n_dups"])

    keyed = ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("bucket").map_groups(combine, batch_format="pyarrow")


def sql_dedup_normalized() -> str:
    return (
        "SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"
        "   AS norm_md5,"
        " MIN(doc_id) AS keep_id, COUNT(*) AS n_dups"
        " FROM documents GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# Token counting / text stats
# ---------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def tok(batch: pa.Table) -> pa.Table:
        n = np.array([len(t.split()) for t in batch["text"].to_pylist()], dtype=np.int64)
        return pa.table({"source": batch["source"], "n_tokens": pa.array(n)})

    t = ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)
    return t.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
        Max("n_tokens", alias_name="max_tokens"),
    )


def sql_token_stats() -> str:
    # CASE guard: whitespace-only text must count 0 tokens (Python
    # str.split() semantics), not regexp_split_to_array's [''] == 1.
    ntok = (
        "CASE WHEN trim(text) = '' THEN 0"
        " ELSE length(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    return (
        "SELECT source, COUNT(*) AS n_docs,"
        f" CAST(SUM({ntok}) AS BIGINT) AS total_tokens,"
        f" MAX({ntok}) AS max_tokens"
        " FROM documents GROUP BY source"
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (data mixing) + corpus vocabulary
# ---------------------------------------------------------------------------

def q_sample_stratified(sf_dir: str):
    """Deterministic stratified sampling (training-data mixing): each
    source stratum keeps rows at its own dyadic rate (srcN -> rate
    ((N % 4) + 1)/4) decided by splitmix64(doc_id) < rate * 2^64 — an
    exact integer rule, so a mixture-weight sweep over a fixed corpus
    is reproducible shard-by-shard.  Pure map, no shuffle: the 100 TB
    shape (the decision never looks outside the row)."""
    import pyarrow.compute as pc

    from rhealpixdggs_py_ray.fixtures import splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def keep(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(did)
        m = (
            pc.cast(pc.utf8_slice_codeunits(batch["source"], 3), pa.int64())
            .to_numpy(zero_copy_only=False)
            % 4
        )
        # rate (m+1)/4: threshold (m+1)<<62; m==3 (rate 1.0) would
        # overflow uint64, so it keeps unconditionally
        thr = (m.astype(np.uint64) + np.uint64(1)) << np.uint64(62)
        return batch.filter(pa.array((m == 3) | (h < thr)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def sql_sample_stratified() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT doc_id, source FROM documents", "doc_id, source", "doc_id", "h"
    )
    m = "(CAST(substr(source, 4) AS BIGINT) % 4)"
    return (
        f"SELECT doc_id, source FROM {sm} t"
        f" WHERE {m} = 3"
        f" OR CAST(h AS HUGEINT) < ({m} + 1) * CAST(4611686018427387904 AS HUGEINT)"
    )


VOCAB_W = 3      # word n-gram width for the vocabulary
VOCAB_K = 50     # global top-k
VOCAB_BUCKETS = 16


def q_vocab(sf_dir: str):
    """Corpus vocabulary: global top-50 word 3-grams by total frequency
    (count DESC, gram ASC tie-break).  Distributed shape: per-batch
    np.unique partial counts -> disjoint hash buckets (every occurrence
    of a gram meets exactly one reducer, so per-bucket local top-k is
    exact) -> tiny global merge.  The exploded n-gram table itself is
    never sort-shuffled (ops/agg.py pattern; the bucket hash is
    engine-internal, so any deterministic vectorized hash works)."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch["text"].to_pylist():
            toks = t.split()
            grams.extend(
                " ".join(toks[i : i + VOCAB_W])
                for i in range(len(toks) - VOCAB_W + 1)
            )
        if not grams:
            return pa.table(
                {
                    "s": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                }
            )
        uq, cnt = np.unique(np.asarray(grams, dtype=object), return_counts=True)
        bucket = (pd.util.hash_array(uq) % VOCAB_BUCKETS).astype(np.int64)
        return pa.table(
            {
                "s": pa.array(uq, type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array(bucket),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        uq, inv = np.unique(g["s"].to_numpy(zero_copy_only=False), return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, g["n"].to_numpy(zero_copy_only=False))
        order = np.lexsort((uq, -tot))[:VOCAB_K]
        return pa.table(
            {
                "s": pa.array(uq[order], type=pa.string()),
                "n": pa.array(tot[order]),
                "g": pa.array(np.zeros(len(order), dtype=np.int64)),
            }
        )

    def final(g: pa.Table) -> pa.Table:
        s = g["s"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, -n))[:VOCAB_K]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "s": pa.array(s[order], type=pa.string()),
                "n": pa.array(n[order]),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = part.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    return merged.groupby("g").map_groups(final, batch_format="pyarrow")


def sql_vocab() -> str:
    # short docs: len(w) - 2 < 1 makes generate_series empty, matching
    # Python's empty range; whitespace-only text trims to [''] (len 1)
    # which is likewise below the width
    return f"""
WITH toks AS MATERIALIZED (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT array_to_string(w[i : i + {VOCAB_W - 1}], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w) - {VOCAB_W - 1})) AS t(i)
),
cnt AS MATERIALIZED (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY s
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, s) AS BIGINT) AS rank, s, n
FROM cnt QUALIFY rank <= {VOCAB_K}
"""


def q_label_quality(sf_dir: str):
    """Cross-modal big-big join: documents (integer token stats) joined
    to embeddings (cluster label) on doc_id = vec_id, aggregated per
    label.  Neither side is bounded, so neither is broadcast: the two
    narrow projections meet in ONE union bucket exchange on h(key) (a
    bucketed hash join without Ray JoinOperator's reserved actor-pool
    cost, cf. CLAUDE.md), and matches are reduced to per-label integer
    partials inside the resolve — only a handful of rows reach the
    final groupby."""
    from rhealpixdggs_py_ray.ops.text import QualityScorer

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"], blocks=4)
    embs = _read(sf_dir, "embeddings", columns=["vec_id", "label"], blocks=4)
    nb = 8  # exchange fixed cost ~ blocks x partitions (BASELINE r2c)

    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    def _bkt(ids: np.ndarray) -> np.ndarray:
        return hash_bucket_u64(ids, nb)

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_stop = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            n_tok[i] = len(t.split())
            padded = " " + t + " "
            n_stop[i] = sum(
                padded.count(f" {w} ") for w in QualityScorer.STOPWORDS
            )
        return pa.table({
            "bucket": pa.array(_bkt(ids)),
            "side": pa.array(np.zeros(len(ids), dtype=np.int64)),
            "key": pa.array(ids.astype(np.int64)),
            "a": pa.array(n_tok),
            "b": pa.array(n_stop),
        })

    def emb_side(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(ids), dtype=np.int64)
        return pa.table({
            "bucket": pa.array(_bkt(ids)),
            "side": pa.array(np.ones(len(ids), dtype=np.int64)),
            "key": pa.array(ids.astype(np.int64)),
            "a": pa.array(lab),
            "b": pa.array(z),
        })

    def resolve(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        dmask = side == 0
        dk, dt, dstp = key[dmask], a[dmask], b[dmask]
        ek, elab = key[~dmask], a[~dmask]
        empty = pa.table({
            "label": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
            "sum_tokens": pa.array([], type=pa.int64()),
            "sum_stop": pa.array([], type=pa.int64()),
        })
        if not len(dk) or not len(ek):
            return empty
        order = np.argsort(dk)
        dk, dt, dstp = dk[order], dt[order], dstp[order]
        pos = np.minimum(np.searchsorted(dk, ek), len(dk) - 1)
        hit = dk[pos] == ek
        if not hit.any():
            return empty
        lab = elab[hit]
        tok = dt[pos[hit]]
        stp = dstp[pos[hit]]
        lu, li = np.unique(lab, return_inverse=True)
        nd = np.zeros(len(lu), dtype=np.int64)
        np.add.at(nd, li, 1)
        st = np.zeros(len(lu), dtype=np.int64)
        np.add.at(st, li, tok)
        ss = np.zeros(len(lu), dtype=np.int64)
        np.add.at(ss, li, stp)
        return pa.table({
            "label": pa.array(lu.astype(np.int64)),
            "n_docs": pa.array(nd),
            "sum_tokens": pa.array(st),
            "sum_stop": pa.array(ss),
        })

    both = docs.map_batches(
        doc_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        embs.map_batches(emb_side, batch_format="pyarrow", zero_copy_batch=True)
    )
    part = both.groupby("bucket").map_groups(resolve, batch_format="pyarrow")
    return part.groupby("label").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_tokens", alias_name="sum_tokens"),
        Sum("sum_stop", alias_name="sum_stop"),
    )


def sql_label_quality() -> str:
    from rhealpixdggs_py_ray.ops.text import QualityScorer

    stop = " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) // {len(w) + 2} AS BIGINT)"
        for w in QualityScorer.STOPWORDS
    )
    ntok = (
        "CASE WHEN trim(text) = '' THEN 0"
        " ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) END"
    )
    return (
        "WITH p AS MATERIALIZED (SELECT doc_id, text, ' ' || text || ' ' AS p"
        "  FROM documents),"
        f" q AS MATERIALIZED (SELECT doc_id, {ntok} AS n_tokens, {stop} AS n_stop"
        "  FROM p)"
        " SELECT CAST(e.label AS BIGINT) AS label,"
        "  CAST(COUNT(*) AS BIGINT) AS n_docs,"
        "  CAST(SUM(q.n_tokens) AS BIGINT) AS sum_tokens,"
        "  CAST(SUM(q.n_stop) AS BIGINT) AS sum_stop"
        " FROM q JOIN embeddings e ON e.vec_id = q.doc_id"
        " GROUP BY e.label"
    )


SALIENT_K = 3


def q_salient_terms(sf_dir: str):
    """Per-doc salient terms: top-3 by (tf DESC, global df ASC, term
    ASC) — the tf-idf selection shape with exact integer ranking (no
    float idf that could flip a boundary bit vs the oracle).

    Two passes, docs never shuffled: (1) distributed document
    frequency — per-doc distinct terms are local to the row, per-batch
    np.unique partials meet in disjoint hash buckets (exact df per
    term, one exchange over the term table only); the df map is
    vocabulary-sized (same bounded-vocab assumption as q_vocab) and is
    broadcast once via ray.put; (2) a pure map over docs computes
    per-doc tf and the top-3 pick against the broadcast df."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        for t in batch["text"].to_pylist():
            toks = t.split()
            if toks:
                terms.extend(set(toks))
        if not terms:
            return pa.table({
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
            })
        uq, cnt = np.unique(np.asarray(terms, dtype=object), return_counts=True)
        bucket = (pd.util.hash_array(uq) % VOCAB_BUCKETS).astype(np.int64)
        return pa.table({
            "term": pa.array(uq, type=pa.string()),
            "df": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array(bucket),
        })

    def df_bucket(g: pa.Table) -> pa.Table:
        uq, inv = np.unique(g["term"].to_numpy(zero_copy_only=False), return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, g["df"].to_numpy(zero_copy_only=False))
        return pa.table({
            "term": pa.array(uq, type=pa.string()),
            "df": pa.array(tot),
        })

    df_pd = (
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(df_bucket, batch_format="pyarrow")
        .to_pandas()  # vocabulary-sized, bounded
    )
    df_ref = ray.put(dict(zip(df_pd["term"].tolist(),
                              df_pd["df"].astype(np.int64).tolist())))

    def top_terms(batch: pa.Table) -> pa.Table:
        dfm = ray.get(df_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        o_doc, o_term, o_tf, o_df, o_rank = [], [], [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            toks = t.split()
            if not toks:
                continue
            uq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            dfv = np.fromiter((dfm[x] for x in uq), dtype=np.int64, count=len(uq))
            order = np.lexsort((uq, dfv, -cnt))[:SALIENT_K]
            o_doc.extend([did] * len(order))
            o_term.extend(uq[order].tolist())
            o_tf.extend(cnt[order].astype(np.int64).tolist())
            o_df.extend(dfv[order].tolist())
            o_rank.extend(range(1, len(order) + 1))
        return pa.table({
            "doc_id": pa.array(o_doc, type=pa.int64()),
            "term": pa.array(o_term, type=pa.string()),
            "tf": pa.array(o_tf, type=pa.int64()),
            "df": pa.array(o_df, type=pa.int64()),
            "rank": pa.array(np.asarray(o_rank, dtype=np.int64)),
        })

    return ds.map_batches(top_terms, batch_format="pyarrow", zero_copy_batch=True)


def sql_salient_terms() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
tf AS MATERIALIZED (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS MATERIALIZED (
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term
)
SELECT doc_id, term, tf, df,
  CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC
  ) AS BIGINT) AS rank
FROM tf JOIN df USING (term)
QUALIFY rank <= {SALIENT_K}
"""


BOTTOMK_K = 5


def q_sample_bottomk(sf_dir: str):
    """Deterministic per-source sample WITHOUT replacement via hash
    order statistics: the BOTTOMK_K docs with the smallest
    md5(doc_id) per source.  Unlike rate-based stratified sampling
    (sample_stratified) this guarantees an exact sample SIZE, is
    mergeable (bottom-k of bottom-ks), and doubles as a KMV distinct
    sketch.  Shape: per-batch partial bottom-k per source -> one tiny
    exchange over ≤ k rows per (batch, source)."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (md5_u64(str(int(x))) for x in ids), dtype=np.uint64, count=len(ids)
        )
        keep = np.zeros(len(ids), dtype=bool)
        for s in np.unique(src):
            m = np.flatnonzero(src == s)
            order = np.lexsort((ids[m], h[m]))[:BOTTOMK_K]
            keep[m[order]] = True
        return pa.table({
            "source": pa.array(src[keep]),
            "doc_id": pa.array(ids[keep].astype(np.int64)),
            "h": pa.array(h[keep]),
        })

    def final(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, h))[:BOTTOMK_K]
        return pa.table({
            "source": g["source"].take(pa.array(order)),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[order].astype(np.int64)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("source").map_groups(final, batch_format="pyarrow")


def sql_sample_bottomk() -> str:
    return (
        "SELECT source,"
        " CAST(row_number() OVER (PARTITION BY source"
        "   ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id)"
        "  AS BIGINT) AS rnk,"
        " doc_id"
        f" FROM documents QUALIFY rnk <= {BOTTOMK_K}"
    )


CHUNK_W = 32   # tokens per chunk
CHUNK_S = 24   # stride (8-token overlap)


def q_chunk_docs(sf_dir: str):
    """Document chunking for training/RAG: fixed 32-token windows at
    stride 24 (8-token overlap).  Pure flat-map — one output row per
    (doc, window), no shuffle anywhere; chunks leave as narrow
    (doc_id, chunk_k, n_tokens, md5) rows so the 100 TB output stream
    stays bytes-per-row bounded regardless of document length."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        o_id, o_k, o_n, o_md5 = [], [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            toks = t.split()
            n = len(toks)
            if n == 0:
                continue
            k = 0
            while k * CHUNK_S < n:
                piece = toks[k * CHUNK_S : k * CHUNK_S + CHUNK_W]
                o_id.append(did)
                o_k.append(k)
                o_n.append(len(piece))
                o_md5.append(hashlib.md5(" ".join(piece).encode("utf-8")).hexdigest())
                k += 1
        return pa.table({
            "doc_id": pa.array(np.asarray(o_id, dtype=np.int64)),
            "chunk_k": pa.array(np.asarray(o_k, dtype=np.int64)),
            "n_tokens": pa.array(np.asarray(o_n, dtype=np.int64)),
            "chunk_md5": pa.array(o_md5, type=pa.string()),
        })

    return ds.map_batches(chunk, batch_format="pyarrow", zero_copy_batch=True)


def sql_chunk_docs() -> str:
    # static chunk-index range (generate_series can't take lateral
    # column parameters — CLAUDE.md); 4096 indices cover ~98k tokens,
    # far above any fixture doc; the filter keeps k*stride < len(w)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''
),
ks AS (SELECT unnest(generate_series(0, 4095)) AS k)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_k,
  CAST(least({CHUNK_W}, len(w) - k * {CHUNK_S}) AS BIGINT) AS n_tokens,
  md5(array_to_string(w[k * {CHUNK_S} + 1 : k * {CHUNK_S} + {CHUNK_W}], ' '))
    AS chunk_md5
FROM toks, ks
WHERE k * {CHUNK_S} < len(w)
"""


DECON_EVAL_MAX_ID = 50  # doc_id < 50 plays the held-out benchmark set


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag training docs sharing any word
    4-gram with the held-out eval set (doc_id < 50 plays the benchmark
    corpus).  The eval shingle set is a bounded small side — built from
    a filtered read and broadcast once via ray.put — and the corpus
    scan is a pure map emitting only contaminated (doc_id, n_hits)
    rows: the 100 TB shape (eval sets are MBs; the corpus never
    shuffles)."""
    from rhealpixdggs_py_ray.ops.dedup import shingles

    def eval_mask(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(did < DECON_EVAL_MAX_ID))

    eval_rows = (
        _read(sf_dir, "documents", columns=["doc_id", "text"], blocks=4)
        .map_batches(eval_mask, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    eval_set: set[str] = set()
    for r in eval_rows:
        eval_set.update(shingles(r["text"]))
    ev_ref = ray.put(eval_set)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_n = [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            if did < DECON_EVAL_MAX_ID:
                continue
            n = sum(1 for s in shingles(t) if s in ev)
            if n:
                out_id.append(int(did))
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_hits": pa.array(out_n, type=pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def sql_decontaminate() -> str:
    from rhealpixdggs_py_ray.ops.dedup import SHINGLE_W

    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
),
ev AS MATERIALIZED (
  SELECT DISTINCT s FROM sh WHERE doc_id < {DECON_EVAL_MAX_ID}
)
SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM sh d JOIN ev ON d.s = ev.s
WHERE d.doc_id >= {DECON_EVAL_MAX_ID}
GROUP BY d.doc_id
"""


def q_repetition(sf_dir: str):
    """Intra-document repetition score (a standard text-quality gate):
    per doc, the most frequent word 3-gram's share of all 3-grams,
    kept integer-exact as (1000 * max_count) // total.  Pure map —
    the score never looks outside the row."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_m, out_g, out_r = [], [], [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            toks = t.split()
            g = len(toks) - VOCAB_W + 1
            if g < 1:
                continue  # too short to have a 3-gram (oracle groups nothing)
            c = Counter(
                " ".join(toks[i : i + VOCAB_W]) for i in range(g)
            )
            m = max(c.values())
            out_id.append(int(did))
            out_m.append(m)
            out_g.append(g)
            out_r.append((1000 * m) // g)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "max_count": pa.array(out_m, type=pa.int64()),
                "total_grams": pa.array(out_g, type=pa.int64()),
                "rep_permille": pa.array(out_r, type=pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def sql_repetition() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT doc_id, array_to_string(w[i : i + {VOCAB_W - 1}], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w) - {VOCAB_W - 1})) AS t(i)
),
cnt AS MATERIALIZED (
  SELECT doc_id, s, COUNT(*) AS c FROM sh GROUP BY doc_id, s
)
SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_count,
  CAST(SUM(c) AS BIGINT) AS total_grams,
  CAST((1000 * MAX(c)) // SUM(c) AS BIGINT) AS rep_permille
FROM cnt GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Sessionization (event-time gap > 30 min) — groupby + map_groups
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800


def q_sessions(sf_dir: str):
    """Sessionization without one-pandas-frame-per-user overhead: users
    are hash-bucketed (64 buckets), each bucket's groups are counted in
    one vectorized lexsort + segment-reduce pass."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"], blocks=4)

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((uid * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    def sess_bucket(g: pa.Table) -> pa.Table:
        if not len(g):
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "n_sessions": pa.array([], type=pa.int64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            g["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.empty(len(uid), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(uid), dtype=bool)
        gap[0] = False
        gap[1:] = (ts[1:] - ts[:-1]) > SESSION_GAP_S * 1_000_000
        inc = (new_user | gap).astype(np.int64)
        starts = np.flatnonzero(new_user)
        n_sessions = np.add.reduceat(inc, starts)
        counts = np.diff(np.append(starts, len(uid)))
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "n_events": pa.array(counts.astype(np.int64)),
                "n_sessions": pa.array(n_sessions),
            }
        )

    b = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(sess_bucket, batch_format="pyarrow")


def sql_sessions() -> str:
    return (
        "WITH d AS (SELECT user_id, ts,"
        "  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER"
        f"  (PARTITION BY user_id ORDER BY ts) > {SESSION_GAP_S * 1_000_000}"
        "  THEN 1 ELSE 0 END AS new_s"
        " FROM events)"
        " SELECT user_id, COUNT(*) AS n_events,"
        " CAST(1 + SUM(CASE WHEN new_s IS NULL THEN 0 ELSE new_s END) AS BIGINT) AS n_sessions"
        " FROM d GROUP BY user_id"
    )


# ---------------------------------------------------------------------------
# Training-data ops: dedup, similarity search, text analysis
# (rhealpixdggs_py_ray/ops/*, SURVEY.md §2.6 extension surface)
# ---------------------------------------------------------------------------

def _docs(sf_dir: str):
    # 8 blocks: halves the pair pipelines' exchange fan-in vs 16 while
    # still feeding the 8-actor hash stages (A/B at sf0.1: minhash
    # 2.0->1.7s, ngram 2.4->1.8s; 4 blocks is no better)
    return _read(sf_dir, "documents", columns=["doc_id", "text"], blocks=8)


_MINHASH_PAIRS: dict[str, "ray.data.Dataset"] = {}


def _minhash_pairs(sf_dir: str):
    """Verified minhash pair set, materialized once per process: three
    consumers (q_minhash_lsh, q_dedup_clusters, q_contrastive_pairs)
    would otherwise each re-execute the full shingle->minhash->band->
    verify lineage (CLAUDE.md: N downstream consumers re-run lineage N
    times).  The pair set is tiny (verified near-dup pairs only), so
    the materialization is bounded."""
    if sf_dir not in _MINHASH_PAIRS:
        from rhealpixdggs_py_ray.ops import dedup

        _MINHASH_PAIRS[sf_dir] = dedup.minhash_lsh_pairs(
            _docs(sf_dir)
        ).materialize()
    return _MINHASH_PAIRS[sf_dir]


def q_minhash_lsh(sf_dir: str):
    return _minhash_pairs(sf_dir)


def sql_minhash_lsh() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.minhash_lsh_sql()


def q_dedup_clusters(sf_dir: str):
    """Near-dup cluster assignment: minhash pair graph -> connected
    components (distributed hash-min over bucket exchanges, ops/cc.py)
    -> (doc_id, cluster_id=min member, keep=canonical)."""
    from rhealpixdggs_py_ray.ops import cc

    return cc.connected_components(_minhash_pairs(sf_dir))


def sql_dedup_clusters() -> str:
    from rhealpixdggs_py_ray.ops import cc, dedup

    return cc.connected_components_sql(dedup.minhash_lsh_sql())


def q_simhash(sf_dir: str):
    from rhealpixdggs_py_ray.ops.dedup import SimHasher

    return sizing.stateful_map(
        _docs(sf_dir), SimHasher, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_simhash() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.simhash_sql()


def q_ngram_jaccard(sf_dir: str):
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.ngram_jaccard_pairs(_docs(sf_dir))


def sql_ngram_jaccard() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.ngram_jaccard_sql()


def q_embedding_dedup(sf_dir: str):
    from rhealpixdggs_py_ray.ops import dedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup.embedding_dedup_pairs(emb)


def sql_embedding_dedup() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.embedding_dedup_sql()


def q_ann_topk(sf_dir: str):
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.ann_topk(emb)


def sql_ann_topk() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.ann_topk_sql()


def q_ann_topk_lsh(sf_dir: str):
    """Approximate ANN (random-hyperplane buckets, 1-bit probes);
    hash-verified — the SQL oracle reproduces the identical pruning."""
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.ann_topk_lsh(emb)


def sql_ann_topk_lsh() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.ann_topk_lsh_sql()


def q_ann_topk_ivf(sf_dir: str):
    """IVF ANN (hash-seeded coarse quantizer + nprobe lists);
    hash-verified — the SQL oracle mirrors seeds/assignment/probing."""
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.ann_topk_ivf(emb)


def sql_ann_topk_ivf() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.ann_topk_ivf_sql()


def q_embedding_dedup_lsh(sf_dir: str):
    """Sub-quadratic embedding near-dup: LSH band buckets -> candidate
    pairs -> exact cosine via distributed joins (ops/dedup.py)."""
    from rhealpixdggs_py_ray.ops import dedup

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedup.embedding_dedup_lsh_pairs(emb)


def sql_embedding_dedup_lsh() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.embedding_dedup_lsh_sql()


EMB_D = 64  # fixture embedding width (TESTDATA.md)


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroids (cluster prototypes): map-side
    per-label vector sums + counts combined per batch, ONE tiny
    exchange over (label, dim) long-format partials.  Elements are
    quantized to integer micros BEFORE summation, so the aggregate is
    order-free and bit-exact against SQL regardless of how blocks or
    reducers interleave — the only float-parity-safe shape for a
    distributed float sum (CLAUDE.md quantization invariant)."""
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _emb_matrix(batch)  # (n, EMB_D) zero-copy from Arrow
        Q = np.floor(M.astype(np.float64) * 1000000.0).astype(np.int64)
        uq, inv = np.unique(lab, return_inverse=True)
        S = np.zeros((len(uq), Q.shape[1]), dtype=np.int64)
        np.add.at(S, inv, Q)
        cnt = np.bincount(inv).astype(np.int64)
        d = Q.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uq, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uq))),
                "sum_micros": pa.array(S.reshape(-1)),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["label", "dim"]).aggregate(
        Sum("sum_micros", alias_name="sum_micros"), Sum("n", alias_name="n")
    )


def sql_embedding_centroids() -> str:
    # static dim range (generate_series can't take lateral column
    # parameters); embedding[i] is 1-based, dim output 0-based
    return (
        "WITH e AS MATERIALIZED ("
        "  SELECT label, d.i - 1 AS dim,"
        "    CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1000000.0) AS BIGINT) AS m"
        f"  FROM embeddings, (SELECT unnest(generate_series(1, {EMB_D})) AS i) d)"
        " SELECT CAST(label AS BIGINT) AS label, dim,"
        "   CAST(SUM(m) AS BIGINT) AS sum_micros, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM e GROUP BY label, dim"
    )


def q_embedding_gram(sf_dir: str):
    """Distributed second-moment (gram) matrix of the embedding table —
    the reduction behind PCA / whitening / covariance monitoring.  Each
    batch quantizes to integer millis and matmuls Q^T Q (float64 BLAS;
    every partial product and per-batch sum stays < 2^53, so the cast
    back to int64 is exact), emitting only the 2080 upper-triangle
    partials per batch into one tiny (i, j) exchange.  The embedding
    rows themselves never shuffle.  Order-free by construction —
    integer sums commute."""
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        Q = np.floor(M.astype(np.float64) * 1000.0)
        G = (Q.T @ Q)  # exact: |q| < 2^24, n < 2^17 per batch
        d = Q.shape[1]
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "g": pa.array(G[iu, ju].astype(np.int64)),
            "n": pa.array(np.full(len(iu), Q.shape[0], dtype=np.int64)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["i", "j"]).aggregate(
        Sum("g", alias_name="g"), Sum("n", alias_name="n")
    )


def sql_embedding_gram() -> str:
    return (
        "WITH e AS MATERIALIZED ("
        "  SELECT vec_id, d.i - 1 AS i,"
        "    CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1000.0) AS BIGINT) AS m"
        f"  FROM embeddings, (SELECT unnest(generate_series(1, {EMB_D})) AS i) d)"
        " SELECT a.i AS i, b.i AS j,"
        "   CAST(SUM(a.m * b.m) AS BIGINT) AS g,"
        "   CAST(COUNT(*) AS BIGINT) AS n"
        " FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i"
        " GROUP BY a.i, b.i"
    )


def q_nearest_centroid(sf_dir: str):
    """Nearest-centroid assignment (the k-means assignment step /
    centroid classifier): the 10x64 centroid matrix is derived from the
    verified per-label sums (a bounded aggregate), broadcast once via
    ray.put, and every batch computes its distances vectorized — no
    shuffle touches the embedding rows; only <= 100 confusion partials
    per batch enter the final exchange.  Distances fold dimension-by-
    dimension left-to-right (ops/ann._seq_d2) so they are bit-identical
    to the SQL's left-associative 64-term expression, making the argmin
    (ties -> smaller label) exactly comparable."""
    from rhealpixdggs_py_ray.ops.ann import _seq_d2
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    cdf = (
        q_embedding_centroids(sf_dir)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    labels = np.sort(cdf["label"].unique()).astype(np.int64)
    C = (
        cdf["sum_micros"].to_numpy().astype(np.float64)
        / cdf["n"].to_numpy().astype(np.float64)
    ).reshape(len(labels), EMB_D)
    cent_ref = ray.put((labels, C))

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        labs, cm = ray.get(cent_ref)
        true_lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.floor(_emb_matrix(batch).astype(np.float64) * 1000000.0)
        D = _seq_d2(X, cm)
        near = labs[np.argmin(D, axis=1)]  # first win == smallest label
        pairs = true_lab * 1000 + near
        uq, cnt = np.unique(pairs, return_counts=True)
        return pa.table(
            {
                "label": pa.array(uq // 1000),
                "nearest": pa.array(uq % 1000),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    part = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["label", "nearest"]).aggregate(Sum("n", alias_name="n"))


def sql_nearest_centroid() -> str:
    cent = sql_embedding_centroids()
    cw_cols = ", ".join(
        f"MAX(CASE WHEN dim = {d} THEN CAST(sum_micros AS DOUBLE)"
        f" / CAST(n AS DOUBLE) END) AS c{d}"
        for d in range(EMB_D)
    )

    def e(d: int) -> str:
        return f"floor(CAST(embedding[{d + 1}] AS DOUBLE) * 1000000.0)"

    dist = " + ".join(f"(({e(d)}) - c{d}) * (({e(d)}) - c{d})" for d in range(EMB_D))
    return (
        f"WITH cent AS MATERIALIZED ({cent}),"
        f" cw AS MATERIALIZED (SELECT label AS clabel, {cw_cols} FROM cent GROUP BY label),"
        " d AS MATERIALIZED ("
        "   SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, cw.clabel,"
        f"    ({dist}) AS dist"
        "   FROM embeddings e CROSS JOIN cw),"
        " pick AS MATERIALIZED ("
        "   SELECT vec_id, label, clabel AS nearest FROM d"
        "   QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) = 1)"
        " SELECT label, nearest, CAST(COUNT(*) AS BIGINT) AS n"
        " FROM pick GROUP BY label, nearest"
    )


def q_kmeans_step(sf_dir: str):
    """One full Lloyd (k-means) iteration, distributed: assignment to
    the broadcast centroids (bit-parity _seq_d2 distances, ties ->
    smaller label) AND the centroid UPDATE sufficient statistics
    (per-assigned-cluster quantized element sums + counts) in the same
    single pass over the embeddings — new centroids are
    sum_micros/n.  Iterating = re-running this query with the new
    centroids; each iteration is one map + one tiny (cluster, dim)
    exchange, the 100 TB k-means shape."""
    from rhealpixdggs_py_ray.ops.ann import _seq_d2
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    cdf = (
        q_embedding_centroids(sf_dir)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    labels = np.sort(cdf["label"].unique()).astype(np.int64)
    C = (
        cdf["sum_micros"].to_numpy().astype(np.float64)
        / cdf["n"].to_numpy().astype(np.float64)
    ).reshape(len(labels), EMB_D)
    cent_ref = ray.put((labels, C))

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def step(batch: pa.Table) -> pa.Table:
        labs, cm = ray.get(cent_ref)
        X = np.floor(_emb_matrix(batch).astype(np.float64) * 1000000.0)
        D = _seq_d2(X, cm)
        near = np.argmin(D, axis=1)  # first win == smallest label
        k, d = len(labs), X.shape[1]
        S = np.zeros((k, d), dtype=np.int64)
        np.add.at(S, near, X.astype(np.int64))
        n = np.bincount(near, minlength=k).astype(np.int64)
        used = np.flatnonzero(n > 0)
        return pa.table({
            "cluster": pa.array(np.repeat(labs[used], d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(used))),
            "sum_micros": pa.array(S[used].reshape(-1)),
            "n": pa.array(np.repeat(n[used], d)),
        })

    part = ds.map_batches(step, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["cluster", "dim"]).aggregate(
        Sum("sum_micros", alias_name="sum_micros"), Sum("n", alias_name="n")
    )


def sql_kmeans_step() -> str:
    cent = sql_embedding_centroids()
    cw_cols = ", ".join(
        f"MAX(CASE WHEN dim = {d} THEN CAST(sum_micros AS DOUBLE)"
        f" / CAST(n AS DOUBLE) END) AS c{d}"
        for d in range(EMB_D)
    )

    def e(d: int) -> str:
        return f"floor(CAST(embedding[{d + 1}] AS DOUBLE) * 1000000.0)"

    dist = " + ".join(f"(({e(d)}) - c{d}) * (({e(d)}) - c{d})" for d in range(EMB_D))
    return (
        f"WITH cent AS MATERIALIZED ({cent}),"
        f" cw AS MATERIALIZED (SELECT label AS clabel, {cw_cols} FROM cent GROUP BY label),"
        " d AS MATERIALIZED ("
        "   SELECT e.vec_id, cw.clabel,"
        f"    ({dist}) AS dist"
        "   FROM embeddings e CROSS JOIN cw),"
        " pick AS MATERIALIZED ("
        "   SELECT vec_id, clabel AS cluster FROM d"
        "   QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) = 1)"
        " SELECT p.cluster, dd.i - 1 AS dim,"
        "  CAST(SUM(CAST(floor(CAST(e.embedding[dd.i] AS DOUBLE) * 1000000.0)"
        "   AS BIGINT)) AS BIGINT) AS sum_micros,"
        "  CAST(COUNT(*) AS BIGINT) AS n"
        " FROM pick p JOIN embeddings e ON e.vec_id = p.vec_id,"
        f"  (SELECT unnest(generate_series(1, {EMB_D})) AS i) dd"
        " GROUP BY p.cluster, dd.i"
    )


def q_lang_id(sf_dir: str):
    from rhealpixdggs_py_ray.ops.text import LangId

    return sizing.stateful_map(
        _docs(sf_dir), LangId, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_lang_id() -> str:
    from rhealpixdggs_py_ray.ops import text

    return text.langid_sql()


def q_quality(sf_dir: str):
    from rhealpixdggs_py_ray.ops.text import QualityScorer

    return sizing.stateful_map(
        _docs(sf_dir), QualityScorer, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_quality() -> str:
    from rhealpixdggs_py_ray.ops import text

    return text.quality_sql()


def q_fingerprint(sf_dir: str):
    from rhealpixdggs_py_ray.ops.text import Fingerprinter

    return sizing.stateful_map(
        _docs(sf_dir), Fingerprinter, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_fingerprint() -> str:
    from rhealpixdggs_py_ray.ops import text

    return text.fingerprint_sql()


# ---------------------------------------------------------------------------
# DGGS cover / topology queries (round 2: all value-hash oracled via
# closed-form cover SQL; semantics additionally golden-tested against
# the reference in tests/)
# ---------------------------------------------------------------------------

# Equatorial-band polygon so the DuckDB oracle can enumerate the cover
# closed-form (rows x cols + centroid PIP); polar-crossing polygons are
# golden-tested against the walk in tests/test_cover.py.
POLYFILL_POLY = [(-30.0, 38.0), (40.0, 41.0), (35.0, -10.0), (-25.0, -5.0)]
POLYFILL_RES = 4


def q_polyfill(sf_dir: str):
    """Polygon -> res-4 cell cover (rhp_wrappers.py:510-599 semantics)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = sorted(W.polyfill(geo.Polygon(POLYFILL_POLY), POLYFILL_RES, plane=False, cfg=CFG))
    return pa.table({"cell_id": pa.array(cells, type=pa.string())})


def sql_polyfill() -> str:
    return oracle.polyfill_sql(POLYFILL_POLY, POLYFILL_RES, CFG)


# North-cap polygon in generic position, strictly inside the top
# triangle of face N with >= 3 res-3 (>= 10 res-4) cell widths of
# diagonal margin (verified: |dy| - |dx| in [3.38, 4.35] res-3 cell
# widths at the vertices).
POLY_POLAR = [(20.0, 62.3), (70.0, 58.7), (61.0, 71.8), (33.0, 69.4)]
POLYFILL_POLAR_RES = 4


def q_polyfill_polar(sf_dir: str):
    """Polyfill over a NORTH-CAP polygon (rhp_wrappers.py:510-599 with
    the cell.py:1061-1147 skew-quad Gauss-Legendre centroid) — the
    polar cover-family case the round-3 oracles could not reach; the
    SQL side replays the 30x30 GL centroid through the full inverse
    projection (oracle.polyfill_polar_sql)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = sorted(
        W.polyfill(geo.Polygon(POLY_POLAR), POLYFILL_POLAR_RES, plane=False, cfg=CFG)
    )
    return pa.table({"cell_id": pa.array(cells, type=pa.string())})


def sql_polyfill_polar() -> str:
    return oracle.polyfill_polar_sql(POLY_POLAR, POLYFILL_POLAR_RES, CFG)


def q_compress_polar(sf_dir: str):
    """compress_order_cells over the north-cap res-4 polyfill cover
    (conversion.py:114-135 applied to a polar cover — interior sibling
    groups complete to res-3 parents)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = W.polyfill(
        geo.Polygon(POLY_POLAR), POLYFILL_POLAR_RES, plane=False, cfg=CFG
    )
    return pa.table({"cell_id": pa.array(W.compress_order_cells(list(cells)))})


def sql_compress_polar() -> str:
    return oracle.compress_cells_sql(
        POLY_POLAR, POLYFILL_POLAR_RES, CFG, polar=True
    )


# Same cap polygon rotated +90 degrees: under north_square=1 the lon
# range [90, 180) maps to the top triangle of the (relocated) N square.
POLY_POLAR_NS = [(110.0, 62.3), (160.0, 58.7), (151.0, 71.8), (123.0, 69.4)]


def q_polyfill_polar_ns12(sf_dir: str):
    """Polar polyfill under north_square=1 / south_square=2 — the
    off-default-grid axis (dggs.py:215-222 parameterization) crossed
    with the polar cover family; exercises the ns-dependent cap
    rearrangement inside the centroid inverse chain."""
    from rhealpixdggs_py_ray.core import wrappers as W
    from rhealpixdggs_py_ray.core.config import WGS84_123

    cells = sorted(
        W.polyfill(
            geo.Polygon(POLY_POLAR_NS), POLYFILL_POLAR_RES, plane=False,
            cfg=WGS84_123,
        )
    )
    return pa.table({"cell_id": pa.array(cells, type=pa.string())})


def sql_polyfill_polar_ns12() -> str:
    from rhealpixdggs_py_ray.core.config import WGS84_123

    return oracle.polyfill_polar_sql(POLY_POLAR_NS, POLYFILL_POLAR_RES, WGS84_123)


# Mirrored into the SOUTH cap's top triangle (ss=0: lon [-180, -90)).
POLY_POLAR_S = [(-160.0, -62.3), (-110.0, -58.7), (-119.0, -71.8), (-147.0, -69.4)]


def q_polyfill_polar_south(sf_dir: str):
    """Polyfill over a SOUTH-CAP polygon — exercises the south-square
    rearrangement branch (pj_rhealpix.py triangle/combine inverse,
    southern caps) through the skew-quad centroid chain."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = sorted(
        W.polyfill(geo.Polygon(POLY_POLAR_S), POLYFILL_POLAR_RES, plane=False, cfg=CFG)
    )
    return pa.table({"cell_id": pa.array(cells, type=pa.string())})


def sql_polyfill_polar_south() -> str:
    return oracle.polyfill_polar_sql(POLY_POLAR_S, POLYFILL_POLAR_RES, CFG, face=5)


def q_compress(sf_dir: str):
    """compress_order_cells over the polyfill cover (conversion.py:114-135)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = W.polyfill(geo.Polygon(POLYFILL_POLY), POLYFILL_RES, plane=False, cfg=CFG)
    return pa.table({"cell_id": pa.array(W.compress_order_cells(list(cells)))})


def sql_compress() -> str:
    return oracle.compress_cells_sql(POLYFILL_POLY, POLYFILL_RES, CFG)


KRING_RES = 5
KRING_K = 2
KRING_N_EVENTS = 200


def _band_row_col(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(band row, global column) of equatorial res-KRING_RES cells from
    the SUID digits (suid_rowcol semantics, cell.py:269-291)."""
    _, digits, _ = su.unpack(u)
    N = CFG.N_side
    row = np.zeros(len(u), dtype=np.int64)
    col = np.zeros(len(u), dtype=np.int64)
    for i in range(KRING_RES):
        row = row * N + digits[:, i] // N
        col = col * N + digits[:, i] % N
    col = (su.face_of(u) - 1) * N**KRING_RES + col
    return row, col


def q_k_ring(sf_dir: str):
    """k_ring(2) around the res-5 cells of the first 200 events that
    index to band-interior equatorial cells (the walk kernel,
    rhp_wrappers.py:471-507).  The interior restriction makes the ring
    SQL-enumerable (Chebyshev ring in band row/col space with east-west
    face wrap), so the walk itself gets a full value-hash oracle;
    polar/edge ring behavior is golden-tested in tests/test_topology.py."""
    from rhealpixdggs_py_ray.core import topology as tp

    ids = np.arange(KRING_N_EVENTS, dtype=np.int64)
    lon, lat = oracle.lonlat_from_id(ids)
    cells = idx.cell_from_point(CFG, KRING_RES, lon, lat, plane=False)
    row, _ = _band_row_col(cells)
    face = su.face_of(cells)
    nrow = CFG.N_side**KRING_RES
    safe = (face >= 1) & (face <= 4) & (row >= KRING_K) & (row <= nrow - 1 - KRING_K)
    ids, cells = ids[safe], cells[safe]
    ds = ray.data.from_arrow(
        pa.table({"event_id": pa.array(ids), "cell_u64": pa.array(cells, type=pa.uint64())})
    )

    def rings(batch: pa.Table) -> pa.Table:
        eids, orig_u, ring_u = [], [], []
        for e, c in zip(
            batch["event_id"].to_numpy(zero_copy_only=False),
            batch["cell_u64"].to_numpy(zero_copy_only=False),
        ):
            rr = tp.k_ring(CFG, int(c), KRING_K)
            eids.extend([e] * len(rr))
            orig_u.extend([c] * len(rr))
            ring_u.extend(rr)
        return pa.table(
            {
                "event_id": pa.array(np.array(eids, dtype=np.int64)),
                "origin": pa.array(
                    su.to_string(np.array(orig_u, dtype=np.uint64)), type=pa.string()
                ),
                "ring_cell": pa.array(
                    su.to_string(np.array(ring_u, dtype=np.uint64)), type=pa.string()
                ),
            }
        )

    return ds.map_batches(rings, batch_format="pyarrow", zero_copy_batch=True)


def sql_k_ring() -> str:
    """Independent oracle: rings of band-interior equatorial cells are
    Chebyshev rings in (band row, global col mod 4*3^res) space."""
    res, k, N = KRING_RES, KRING_K, CFG.N_side
    nrow = N**res
    ncol = 4 * nrow
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), res, CFG, id_cols=("event_id",)
    )
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row = "(" + " + ".join(f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)) + ")"
    colf = "(" + " + ".join(f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)) + ")"
    fidx = (
        "(CASE substr(cell_id, 1, 1) "
        + " ".join(f"WHEN '{c}' THEN {i}" for i, c in enumerate(CELLS0))
        + " END)"
    )
    gcol = f"(({fidx} - 1) * {nrow} + {colf})"
    letter2 = (
        "(CASE (c2 // " + str(nrow) + ") "
        + " ".join(f"WHEN {f - 1} THEN '{c}'" for f, c in enumerate(CELLS0))
        + " END)"
    )
    digits2 = "".join(
        f" || CAST(((r2 // {N ** (res - 1 - i)}) % {N}) * {N}"
        f" + (((c2 % {nrow}) // {N ** (res - 1 - i)}) % {N}) AS VARCHAR)"
        for i in range(res)
    )
    return (
        f"WITH pts AS MATERIALIZED ("
        f"  SELECT event_id, cell_id, {row} AS row, {gcol} AS gcol"
        f"  FROM {inner} t WHERE event_id < {KRING_N_EVENTS}),"
        f" safe AS MATERIALIZED ("
        f"  SELECT * FROM pts WHERE substr(cell_id, 1, 1) IN ('O','P','Q','R')"
        f"   AND row BETWEEN {k} AND {nrow - 1 - k}),"
        f" offs AS (SELECT dr, dc FROM"
        f"   (SELECT unnest(generate_series({-k}, {k})) AS dr),"
        f"   (SELECT unnest(generate_series({-k}, {k})) AS dc)),"
        f" ring AS (SELECT event_id, cell_id AS origin,"
        f"   row + dr AS r2, ((gcol + dc) % {ncol} + {ncol}) % {ncol} AS c2"
        f"  FROM safe, offs)"
        f" SELECT event_id, origin, {letter2}{digits2} AS ring_cell FROM ring"
    )


KRING_POLAR_RES = 4
KRING_POLAR_N = 256


def _polar_seed_lonlat(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic north-cap seed points, bit-exact on both sides:
    dyadic fractions only (m/256, m/512 are exact binary; 360*m/256 =
    45*m/32 and 44*m/512 = 11*m/128 are exact doubles)."""
    lon = -180.0 + 360.0 * ((ids * 73 % 256) / 256.0)
    lat = 45.0 + 44.0 * ((ids * 151 % 512) / 512.0)
    return lon, lat


def q_k_ring_polar(sf_dir: str):
    """k_ring(2) around POLAR-face-interior res-4 cells — the ring walk
    over the north cap, which the round-3 oracle could not reach (it was
    restricted to the equatorial band).  For cells >= k from every face
    edge the walk's result SET equals the face-local Chebyshev ring even
    across the cap diagonals (dart relabeling turns the walk but not the
    set; verified cell-by-cell in tests), so the SQL enumerates the ring
    in face-local (row, col) space off the verified cell_from_point
    chain.  Reference semantics rhp_wrappers.py:471-507."""
    from rhealpixdggs_py_ray.core import topology as tp

    ids = np.arange(KRING_POLAR_N, dtype=np.int64)
    lon, lat = _polar_seed_lonlat(ids)
    cells = idx.cell_from_point(CFG, KRING_POLAR_RES, lon, lat, plane=False)
    face = su.face_of(cells)
    _, digits, _ = su.unpack(cells)
    N = CFG.N_side
    row = np.zeros(len(cells), dtype=np.int64)
    col = np.zeros(len(cells), dtype=np.int64)
    for i in range(KRING_POLAR_RES):
        row = row * N + digits[:, i] // N
        col = col * N + digits[:, i] % N
    n = N**KRING_POLAR_RES
    safe = (
        (face == 0)
        & (row >= KRING_K) & (row <= n - 1 - KRING_K)
        & (col >= KRING_K) & (col <= n - 1 - KRING_K)
    )
    ids, cells = ids[safe], cells[safe]
    ds = ray.data.from_arrow(
        pa.table({"seed_id": pa.array(ids), "cell_u64": pa.array(cells, type=pa.uint64())})
    )

    def rings(batch: pa.Table) -> pa.Table:
        sids, orig_u, ring_u = [], [], []
        for e, c in zip(
            batch["seed_id"].to_numpy(zero_copy_only=False),
            batch["cell_u64"].to_numpy(zero_copy_only=False),
        ):
            rr = tp.k_ring(CFG, int(c), KRING_K)
            sids.extend([e] * len(rr))
            orig_u.extend([c] * len(rr))
            ring_u.extend(rr)
        # one vectorized stringify for the whole batch (per-element
        # to_string calls measured 2.5s -> this shape is ~0.3s)
        return pa.table(
            {
                "seed_id": pa.array(np.array(sids, dtype=np.int64)),
                "origin": pa.array(
                    su.to_string(np.array(orig_u, dtype=np.uint64)), type=pa.string()
                ),
                "ring_cell": pa.array(
                    su.to_string(np.array(ring_u, dtype=np.uint64)), type=pa.string()
                ),
            }
        )

    return ds.map_batches(rings, batch_format="pyarrow", zero_copy_batch=True)


def sql_k_ring_polar() -> str:
    res, k, N = KRING_POLAR_RES, KRING_K, CFG.N_side
    n = N**res
    pts = (
        f"SELECT k AS seed_id,"
        f" -180.0 + 360.0 * (CAST(k * 73 % 256 AS DOUBLE) / 256.0) AS lon,"
        f" 45.0 + 44.0 * (CAST(k * 151 % 512 AS DOUBLE) / 512.0) AS lat"
        f" FROM (SELECT unnest(generate_series(0, {KRING_POLAR_N - 1})) AS k)"
    )
    inner = oracle.cell_from_point_sql(pts, res, CFG, id_cols=("seed_id",))
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row = "(" + " + ".join(f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)) + ")"
    col = "(" + " + ".join(f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)) + ")"
    digits2 = "".join(
        f" || CAST(3 * ((r2 // {N ** (res - 1 - i)}) % {N})"
        f" + ((c2 // {N ** (res - 1 - i)}) % {N}) AS VARCHAR)"
        for i in range(res)
    )
    return (
        f"WITH kp_pts AS MATERIALIZED ("
        f"  SELECT seed_id, cell_id, {row} AS row, {col} AS col"
        f"  FROM {inner} t),"
        f" kp_safe AS MATERIALIZED ("
        f"  SELECT * FROM kp_pts WHERE substr(cell_id, 1, 1) = 'N'"
        f"   AND row BETWEEN {k} AND {n - 1 - k}"
        f"   AND col BETWEEN {k} AND {n - 1 - k}),"
        f" kp_offs AS (SELECT dr, dc FROM"
        f"   (SELECT unnest(generate_series({-k}, {k})) AS dr),"
        f"   (SELECT unnest(generate_series({-k}, {k})) AS dc)),"
        f" kp_ring AS (SELECT seed_id, cell_id AS origin,"
        f"   row + dr AS r2, col + dc AS c2"
        f"  FROM kp_safe, kp_offs)"
        f" SELECT seed_id, origin, 'N'{digits2} AS ring_cell FROM kp_ring"
    )


def q_cell_geometry(sf_dir: str):
    """Per-cell geometry columns (nucleus micros + shape) for every
    res-2 cell (cell.py:625-732, 1008-1059); oracled by the full SQL
    inverse-projection chain (oracle.cell_geometry_sql)."""
    b = CFG.N_side**2
    total = 6 * b**2
    base = 6 * (b**2 - 1) // (b - 1)

    def geom(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        nlon, nlat = idx.nucleus(CFG, u, plane=False)
        shape_names = np.array(idx.SHAPE_NAMES)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 2)),
                "nuc_lon_micros": pa.array(np.floor(nlon * 1e6).astype(np.int64)),
                "nuc_lat_micros": pa.array(np.floor(nlat * 1e6).astype(np.int64)),
                "shape": pa.array(
                    shape_names[np.asarray(idx.shape_of(CFG, u), dtype=np.int64)],
                    type=pa.string(),
                ),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4)).map_batches(
        geom, batch_format="pyarrow", zero_copy_batch=True
    )


def q_cell_geometry_r3(sf_dir: str):
    """Per-cell geometry (nucleus micros + shape) for every res-3 cell
    — the cell_geometry oracle generalized past res 2 (round-3 VERDICT
    gap 2; oracle.cell_geometry_sql is digit-parametric now)."""
    res3 = 3
    b = CFG.N_side**2
    total = 6 * b**res3
    base = 6 * (b**res3 - 1) // (b - 1)

    def geom(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        nlon, nlat = idx.nucleus(CFG, u, plane=False)
        shape_names = np.array(idx.SHAPE_NAMES)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, res3)),
                "nuc_lon_micros": pa.array(np.floor(nlon * 1e6).astype(np.int64)),
                "nuc_lat_micros": pa.array(np.floor(nlat * 1e6).astype(np.int64)),
                "shape": pa.array(
                    shape_names[np.asarray(idx.shape_of(CFG, u), dtype=np.int64)],
                    type=pa.string(),
                ),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4)).map_batches(
        geom, batch_format="pyarrow", zero_copy_batch=True
    )


def q_cell_geometry_radians(sf_dir: str):
    """Per-cell geometry for every res-2 cell under the RADIANS config
    — the inverse-projection chain (nucleus lon/lat) oracled in
    radians (inverse_sql radians branch), closing the last angle-unit
    gap of SURVEY 8.1."""
    from rhealpixdggs_py_ray.core.config import WGS84_003_RADIANS

    b = WGS84_003_RADIANS.N_side**2
    total = 6 * b**2
    base = 6 * (b**2 - 1) // (b - 1)

    def geom(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, WGS84_003_RADIANS)
        nlon, nlat = idx.nucleus(WGS84_003_RADIANS, u, plane=False)
        shape_names = np.array(idx.SHAPE_NAMES)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 2)),
                "nuc_lon_micros": pa.array(np.floor(nlon * 1e6).astype(np.int64)),
                "nuc_lat_micros": pa.array(np.floor(nlat * 1e6).astype(np.int64)),
                "shape": pa.array(
                    shape_names[np.asarray(idx.shape_of(WGS84_003_RADIANS, u), dtype=np.int64)],
                    type=pa.string(),
                ),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4)).map_batches(
        geom, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_cell_geometry_radians() -> str:
    from rhealpixdggs_py_ray.core.config import WGS84_003_RADIANS

    return oracle.cell_geometry_sql(2, WGS84_003_RADIANS)


RASTER_RES = 3
RASTER_NX = 256  # power-of-two sample grid: i/256, j/128 are exact
RASTER_NY = 128  # binary fractions, so lon/lat are bit-identical in SQL


def q_raster_sample_global(sf_dir: str):
    """Latitude-UNRESTRICTED sampled rasterization: a 256x128 global
    lon/lat grid (power-of-two fractions -> bit-exact floats on both
    sides, the linetrace_polar technique) mapped through the full
    forward projection INCLUDING the polar-cap rearrangement, counted
    per res-3 cell.  This is the first cover-family oracle that
    exercises the polar faces (N/S) in SQL — round-3 VERDICT gap 2:
    cover oracles were equatorial-band only."""
    total = RASTER_NX * RASTER_NY

    def raster(batch: pa.Table) -> pa.Table:
        k = batch["id"].to_numpy(zero_copy_only=False)
        i = k % RASTER_NX
        j = k // RASTER_NX
        lon = -180.0 + 360.0 * (i / float(RASTER_NX))
        lat = -84.0 + 168.0 * ((j + 0.5) / float(RASTER_NY))
        u = idx.cell_from_point(CFG, RASTER_RES, lon, lat, plane=False)
        cu, cnt = np.unique(u, return_counts=True)
        return pa.table({
            "cell_id": pa.array(
                su.to_string_fixed(cu, RASTER_RES), type=pa.string()
            ),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return (
        ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4))
        .map_batches(raster, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell_id")
        .aggregate(Sum("n", alias_name="n"))
    )


def sql_raster_sample_global() -> str:
    pts = (
        f"SELECT k,"
        f" -180.0 + 360.0 * (CAST(k % {RASTER_NX} AS DOUBLE) / {float(RASTER_NX)!r}) AS lon,"
        f" -84.0 + 168.0 * ((CAST(k // {RASTER_NX} AS DOUBLE) + 0.5) / {float(RASTER_NY)!r}) AS lat"
        f" FROM (SELECT unnest(generate_series(0, {RASTER_NX * RASTER_NY - 1})) AS k)"
    )
    inner = oracle.cell_from_point_sql(pts, RASTER_RES, CFG, id_cols=("k",))
    return (
        f"SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n"
        f" FROM {inner} t GROUP BY cell_id"
    )


def q_image_pipeline(sf_dir: str):
    """Multimodal plumbing: deterministic image fixture table (the
    input_hint schema) -> actor-pool decode + payload verification ->
    per-face tile counts.  The oracle recomputes faces from phash and
    channel means from the generative pixel formula in SQL (see
    _image_src_sql), so the decode chain is value-hash verified."""
    import os

    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.pipelines.flagship import index_images
    from rhealpixdggs_py_ray.stages.indexer import PayloadVerifier

    n = 2000
    out_dir = f"/tmp/graft_images_{n}"
    write_images_table(out_dir, n)
    ds = ray.data.read_parquet(out_dir, override_num_blocks=sizing.read_blocks(out_dir, profile=8))
    ds = ds.map_batches(
        PayloadVerifier,
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=sizing.pool(),
    )
    from rhealpixdggs_py_ray.stages.indexer import CellIndexer

    ds = ds.map_batches(
        CellIndexer,
        fn_constructor_kwargs={"resolution": 9},
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=sizing.pool(),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        # per-batch combine on the int8 face column (CellIndexer emits it)
        fi = batch["face"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = batch["payload_ok"].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, inv = np.unique(fi, return_inverse=True)
        n = np.bincount(inv)
        n_ok = np.zeros(len(uq), dtype=np.int64)
        np.add.at(n_ok, inv, ok)
        return pa.table(
            {
                "face": pa.array(_FACE_LETTERS[uq], type=pa.string()),
                "n": pa.array(n.astype(np.int64)),
                "n_ok": pa.array(n_ok),
            }
        )

    part = ds.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("face").aggregate(
        Sum("n", alias_name="n"), Sum("n_ok", alias_name="n_ok")
    )


# ---------------------------------------------------------------------------
# Hierarchy / ordering / validation operators (SQL-oracled)
# ---------------------------------------------------------------------------

def q_hierarchy(sf_dir: str):
    """Per res-3 grid cell: parent (res 2) and center child (res 5) —
    rhp_to_parent / rhp_to_center_child (rhp_wrappers.py:123-215) as
    u64 mask/append kernels."""
    from rhealpixdggs_py_ray.core import wrappers as W

    b = CFG.N_side**2
    total = 6 * b**3
    base = 6 * (b**3 - 1) // (b - 1)
    center = (CFG.N_side**2 - 1) // 2  # digit 4 for N_side=3

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        par = su.parent(u, 2)
        child = u
        for lvl in (4, 5):
            child = su.with_digit(child, lvl, center)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 3)),
                "parent_id": pa.array(su.to_string_fixed(par, 2)),
                "center_child_id": pa.array(su.to_string_fixed(child, 5)),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 8)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_hierarchy() -> str:
    grid = oracle.grid_sql(3, CFG)
    center = (CFG.N_side**2 - 1) // 2
    return (
        f"SELECT cell_id, substr(cell_id, 1, 3) AS parent_id,"
        f" cell_id || '{center}{center}' AS center_child_id FROM ({grid}) g"
    )


def q_successor(sf_dir: str):
    """Post-order successor of every res-3 cell but the last
    (cell.py:317-376 semantics via packed-index increment)."""
    b = CFG.N_side**2
    total = 6 * b**3
    base = 6 * (b**3 - 1) // (b - 1)

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        keep = i < total - 1
        i = i[keep]
        u = su.suid_from_level_order_index(i + base, CFG)
        nxt = su.successor(u, CFG)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 3)),
                "successor_id": pa.array(su.to_string_fixed(nxt, 3)),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 8)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_successor() -> str:
    b = CFG.N_side**2
    total = 6 * b**3
    digits = "".join(
        f" || CAST(({{v}} // {b ** (3 - 1 - k)}) % {b} AS VARCHAR)" for k in range(3)
    )
    letter = (
        "(CASE ({v} // " + str(b**3) + ") "
        + " ".join(f"WHEN {f} THEN '{c}'" for f, c in enumerate(CELLS0))
        + " END)"
    )
    mk = lambda v: letter.format(v=v) + digits.format(v=v)
    return (
        f"SELECT {mk('i')} AS cell_id, {mk('(i + 1)')} AS successor_id"
        f" FROM (SELECT unnest(generate_series(0, {total - 2})) AS i)"
    )


VALIDATE_RE = r"^[NOPQRS][0-8]{0,15}$"


def q_validate(sf_dir: str):
    """rhp_is_valid (rhp_wrappers.py:299-332) over a deterministic mix
    of valid SUIDs and corrupted variants derived from events.  Fully
    Arrow-vectorized: corruption via utf8 slice/concat kernels,
    validation via match_substring_regex."""
    import pyarrow.compute as pc

    ds = indexed_events(sf_dir, resolution=5)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        cells = batch["cell_id"]
        m3 = pa.array(ids % 3 == 0)
        m5 = pa.array((ids % 5 == 0) & (ids % 3 != 0))
        # corrupt every 3rd id: bad face; every 5th: digit '9'
        bad_face = pc.binary_join_element_wise("X", pc.utf8_slice_codeunits(cells, 1, 6), "")
        bad_digit = pc.binary_join_element_wise(pc.utf8_slice_codeunits(cells, 0, 5), "9", "")
        cand = pc.if_else(m3, bad_face, pc.if_else(m5, bad_digit, cells))
        # anchored full-match == Python re.match on the ^...$ pattern
        ok = pc.match_substring_regex(cand, VALIDATE_RE)
        return pa.table(
            {
                "event_id": pa.array(ids, type=pa.int64()),
                "candidate": cand,
                "is_valid": ok,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sql_validate() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), 5, CFG, id_cols=("event_id",)
    )
    cand = (
        "CASE WHEN event_id % 3 = 0 THEN 'X' || substr(cell_id, 2)"
        " WHEN event_id % 5 = 0 THEN substr(cell_id, 1, length(cell_id) - 1) || '9'"
        " ELSE cell_id END"
    )
    return (
        f"SELECT event_id, {cand} AS candidate,"
        f" regexp_matches({cand}, '{VALIDATE_RE}') AS is_valid"
        f" FROM {inner} t"
    )


def q_minimal_cover(sf_dir: str):
    """minimal_cover (dggs.py:1372-1410): distinct res-5 cells hit by
    the events points — exact dedup via per-batch combine + bucketed
    merge on the packed key (ops/agg.py; a string-keyed sort aggregate
    here measured ~10s for 26k groups)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = indexed_events(sf_dir, resolution=5)

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"cell_u64": batch["cell_u64"],
             "one": pa.array(np.ones(len(batch), dtype=np.int64))}
        )

    counted = sum_by_u64_key(
        ds.map_batches(ones, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "n_points",
    )

    def to_id(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"cell_id": pa.array(su.to_string_fixed(u, 5)),
             "n_points": batch["n_points"]}
        )

    return counted.map_batches(to_id, batch_format="pyarrow", zero_copy_batch=True)


def sql_minimal_cover() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), 5, CFG, id_cols=("event_id",)
    )
    return f"SELECT cell_id, COUNT(*) AS n_points FROM {inner} t GROUP BY cell_id"


def q_priority_revenue(sf_dir: str):
    """Big-big fact join (TPC-H Q3 shape): lineitem ⋈ orders on
    orderkey, revenue per order priority.  Lineitem rows are combined
    per orderkey INSIDE each batch (map-side pre-aggregation), then
    both narrow sides meet in ONE union bucket exchange on
    h(orderkey); the resolve joins and immediately reduces to
    per-priority partials, so only a handful of rows reach the final
    groupby.  Revenue quantizes floor(price*(1-disc)*100) per row
    before any summation — order-free and bit-exact vs SQL."""
    # blocks=4/nb=8: the sort exchange's fixed cost scales with input
    # blocks x partitions (A/B at sf0.1: 8.2s @16 blocks/32 buckets vs
    # 1.9s @4/8 — remote compute is ~300ms either way); at 100 TB the
    # fragment count and a proportional bucket count take over.
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"],
               blocks=4)
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"],
               blocks=4)
    nb = 8

    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    def _bkt(ids: np.ndarray) -> np.ndarray:
        return hash_bucket_u64(ids, nb)

    def li_side(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False)
        r = np.floor(p * (1 - d) * 100).astype(np.int64)
        uq, inv = np.unique(k, return_inverse=True)
        rev = np.zeros(len(uq), dtype=np.int64)
        np.add.at(rev, inv, r)
        nl = np.zeros(len(uq), dtype=np.int64)
        np.add.at(nl, inv, 1)
        return pa.table({
            "bucket": pa.array(_bkt(uq)),
            "side": pa.array(np.zeros(len(uq), dtype=np.int64)),
            "key": pa.array(uq.astype(np.int64)),
            "rev": pa.array(rev),
            "nl": pa.array(nl),
            "prio": pa.array([""] * len(uq), type=pa.string()),
        })

    def od_side(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(_bkt(k)),
            "side": pa.array(np.ones(len(k), dtype=np.int64)),
            "key": pa.array(k.astype(np.int64)),
            "rev": pa.array(np.zeros(len(k), dtype=np.int64)),
            "nl": pa.array(np.zeros(len(k), dtype=np.int64)),
            "prio": batch["o_orderpriority"],
        })

    def resolve(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        lmask = side == 0
        rev_all = g["rev"].to_numpy(zero_copy_only=False)
        nl_all = g["nl"].to_numpy(zero_copy_only=False)
        lk, lrev, lnl = key[lmask], rev_all[lmask], nl_all[lmask]
        ok = key[~lmask]
        opr = g["prio"].to_numpy(zero_copy_only=False)[~lmask]
        empty = pa.table({
            "o_orderpriority": pa.array([], type=pa.string()),
            "n_orders": pa.array([], type=pa.int64()),
            "n_lines": pa.array([], type=pa.int64()),
            "revenue_c": pa.array([], type=pa.int64()),
        })
        if not len(lk) or not len(ok):
            return empty
        # combine lineitem partials per key (a key spans many batches)
        uq, inv = np.unique(lk, return_inverse=True)
        rev = np.zeros(len(uq), dtype=np.int64)
        np.add.at(rev, inv, lrev)
        nl = np.zeros(len(uq), dtype=np.int64)
        np.add.at(nl, inv, lnl)
        order = np.argsort(ok)
        ok, opr = ok[order], opr[order]
        pos = np.minimum(np.searchsorted(ok, uq), len(ok) - 1)
        hit = ok[pos] == uq
        if not hit.any():
            return empty
        pr = opr[pos[hit]]
        pu, pi = np.unique(pr, return_inverse=True)
        n_ord = np.zeros(len(pu), dtype=np.int64)
        np.add.at(n_ord, pi, 1)
        n_li = np.zeros(len(pu), dtype=np.int64)
        np.add.at(n_li, pi, nl[hit])
        rv = np.zeros(len(pu), dtype=np.int64)
        np.add.at(rv, pi, rev[hit])
        return pa.table({
            "o_orderpriority": pa.array(pu, type=pa.string()),
            "n_orders": pa.array(n_ord),
            "n_lines": pa.array(n_li),
            "revenue_c": pa.array(rv),
        })

    both = li.map_batches(
        li_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(od.map_batches(od_side, batch_format="pyarrow", zero_copy_batch=True))
    part = both.groupby("bucket").map_groups(resolve, batch_format="pyarrow")
    return part.groupby("o_orderpriority").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("n_lines", alias_name="n_lines"),
        Sum("revenue_c", alias_name="revenue_c"),
    )


def q_nation_revenue(sf_dir: str):
    """Three-way join: orders ⋈ customer (big-big, one bucket exchange
    on h(custkey)) ⋈ nation (25-row dimension, ray.put broadcast into
    the resolve) -> order count + total-price cents per nation name.
    The canonical star-schema rollup: one exchange total, the fact
    table pre-combined map-side per custkey."""
    # blocks=4/nb=8: exchange fixed cost scales with blocks x
    # partitions (see priority_revenue / BASELINE.md round-2c note)
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
               blocks=4)
    cu = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"],
               blocks=4)
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"], blocks=1).to_pandas()
    nk = nation["n_nationkey"].to_numpy().astype(np.int64)
    order = np.argsort(nk)
    n_ref = ray.put((nk[order], nation["n_name"].to_numpy()[order]))
    nb = 8
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    def od_side(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pc_ = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uq, inv = np.unique(k, return_inverse=True)
        tp = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tp, inv, pc_)
        n = np.zeros(len(uq), dtype=np.int64)
        np.add.at(n, inv, 1)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uq, nb)),
            "side": pa.array(np.zeros(len(uq), dtype=np.int64)),
            "key": pa.array(uq.astype(np.int64)),
            "a": pa.array(tp), "b": pa.array(n),
        })

    def cu_side(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        nkk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(k, nb)),
            "side": pa.array(np.ones(len(k), dtype=np.int64)),
            "key": pa.array(k.astype(np.int64)),
            "a": pa.array(nkk), "b": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        keys, names = ray.get(n_ref)
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        a_all = g["a"].to_numpy(zero_copy_only=False)
        b_all = g["b"].to_numpy(zero_copy_only=False)
        omask = side == 0
        okey, otp, on = key[omask], a_all[omask], b_all[omask]
        ckey, cnat = key[~omask], a_all[~omask]
        empty = pa.table({
            "n_name": pa.array([], type=pa.string()),
            "n_orders": pa.array([], type=pa.int64()),
            "total_c": pa.array([], type=pa.int64()),
        })
        if not len(okey) or not len(ckey):
            return empty
        uq, inv = np.unique(okey, return_inverse=True)
        tp = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tp, inv, otp)
        n = np.zeros(len(uq), dtype=np.int64)
        np.add.at(n, inv, on)
        order = np.argsort(ckey)
        ckey, cnat = ckey[order], cnat[order]
        pos = np.minimum(np.searchsorted(ckey, uq), len(ckey) - 1)
        hit = ckey[pos] == uq
        if not hit.any():
            return empty
        nat = cnat[pos[hit]]
        nu, ni = np.unique(nat, return_inverse=True)
        cnt = np.zeros(len(nu), dtype=np.int64)
        np.add.at(cnt, ni, n[hit])
        tot = np.zeros(len(nu), dtype=np.int64)
        np.add.at(tot, ni, tp[hit])
        name = names[np.searchsorted(keys, nu)]
        return pa.table({
            "n_name": pa.array(name, type=pa.string()),
            "n_orders": pa.array(cnt),
            "total_c": pa.array(tot),
        })

    both = od.map_batches(
        od_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(cu.map_batches(cu_side, batch_format="pyarrow", zero_copy_batch=True))
    part = both.groupby("bucket").map_groups(resolve, batch_format="pyarrow")
    return part.groupby("n_name").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_c", alias_name="total_c"),
    )


def sql_nation_revenue() -> str:
    return (
        "SELECT n.n_name,"
        " CAST(COUNT(*) AS BIGINT) AS n_orders,"
        " CAST(SUM(CAST(floor(o.o_totalprice*100) AS BIGINT)) AS BIGINT)"
        "  AS total_c"
        " FROM orders o"
        " JOIN customer c ON c.c_custkey = o.o_custkey"
        " JOIN nation n ON n.n_nationkey = c.c_nationkey"
        " GROUP BY n.n_name"
    )


def sql_priority_revenue() -> str:
    return (
        "WITH l AS MATERIALIZED (SELECT l_orderkey,"
        " CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS r"
        " FROM lineitem)"
        " SELECT o.o_orderpriority,"
        " CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines,"
        " CAST(SUM(l.r) AS BIGINT) AS revenue_c"
        " FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey"
        " GROUP BY o.o_orderpriority"
    )


def q_running_totals(sf_dir: str):
    """Ordered window function: per-user running total of value cents
    over event time (SUM OVER (PARTITION BY user ORDER BY ts,
    event_id)).  One bucket exchange on h(user_id) co-locates each
    user's history; the resolve lexsorts the bucket once and computes
    every user's cumulative sum vectorized (segmented cumsum — no
    per-user loop, no per-user ray group)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"], blocks=4)
    nb = 8  # exchange fixed cost ~ blocks x partitions (BASELINE r2c)

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, nb)),
            "user_id": batch["user_id"],
            "t": pa.array(ts.astype(np.int64)),
            "event_id": batch["event_id"],
            "v_c": pa.array(np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        })

    def window(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["v_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, t, eid, v = uid[order], t[order], eid[order], v[order]
        cum = np.cumsum(v)
        # segmented: subtract the global running total just before each
        # user's first row (sign-safe, unlike a max-accumulate trick)
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_base = np.where(starts > 0, cum[starts - 1], 0)
        seg_id = np.cumsum(new_seg) - 1
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "cum_value_c": pa.array(cum - seg_base[seg_id]),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(window, batch_format="pyarrow")


def sql_running_totals() -> str:
    return (
        "SELECT event_id, user_id,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) OVER ("
        "  PARTITION BY user_id ORDER BY ts, event_id"
        " ) AS BIGINT) AS cum_value_c"
        " FROM events"
    )


REG_EPOCH_DAYS = 19723  # days(1970-01-01 .. 2024-01-01); centers x so
#                          every sufficient statistic stays far below 2^63


def q_regression_stats(sf_dir: str):
    """Distributed least-squares sufficient statistics per event_type
    (value trend over time): n, Σx, Σy, Σxx, Σxy with x = days since
    2024-01-01 and y = value cents — all exact integers, so the
    distributed sum is order-free and the user derives slope/intercept
    from five numbers instead of re-scanning 100 TB.  The
    sufficient-statistics shape is the general pattern for distributed
    closed-form model fits."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        x = ts.astype(np.int64) // 86_400_000_000 - REG_EPOCH_DAYS
        y = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(et, return_inverse=True)
        out = {}
        for name, arr in (
            ("n", np.ones(len(x), dtype=np.int64)),
            ("sum_x", x), ("sum_y", y), ("sum_xx", x * x), ("sum_xy", x * y),
        ):
            s = np.zeros(len(uq), dtype=np.int64)
            np.add.at(s, inv, arr)
            out[name] = pa.array(s)
        return pa.table({"event_type": pa.array(uq), **out})

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("event_type").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_x", alias_name="sum_x"),
        Sum("sum_y", alias_name="sum_y"),
        Sum("sum_xx", alias_name="sum_xx"),
        Sum("sum_xy", alias_name="sum_xy"),
    )


def sql_regression_stats() -> str:
    x = f"(epoch_us(ts) // 86400000000 - {REG_EPOCH_DAYS})"
    y = "CAST(floor(value*100) AS BIGINT)"
    return (
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,"
        f" CAST(SUM({x}) AS BIGINT) AS sum_x,"
        f" CAST(SUM({y}) AS BIGINT) AS sum_y,"
        f" CAST(SUM({x} * {x}) AS BIGINT) AS sum_xx,"
        f" CAST(SUM({x} * {y}) AS BIGINT) AS sum_xy"
        " FROM events GROUP BY event_type"
    )


def _fragmented_events(sf_dir: str, n_frags: int = 24) -> str:
    """24-fragment copy of the events table under /tmp (the small-file
    problem fixture; idempotent, marker-guarded)."""
    import os

    import pyarrow.parquet as pq

    src = f"/tmp/graft_compact_src_{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(src, ".complete")
    if not os.path.exists(marker):
        os.makedirs(src, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
        n = t.num_rows
        per = -(-n // n_frags)
        for k in range(n_frags):
            pq.write_table(t.slice(k * per, per), os.path.join(src, f"f{k:03d}.parquet"))
        open(marker, "w").close()
    return src


def q_compact_files(sf_dir: str):
    """Small-file compaction — the 100 TB table-maintenance op: a
    24-fragment copy of the events table is read with per-fragment
    fan-out, repartitioned to the byte-target block count
    (sizing.compute_read_blocks with no fragment floor), and written
    back as few large files; the compacted copy is then proven
    content-equal via an order-free splitmix64 checksum.  File-count
    reduction itself is pinned in tests (the oracle proves content)."""
    import os
    import shutil

    from rhealpixdggs_py_ray.fixtures import splitmix64

    src = _fragmented_events(sf_dir)
    out = f"/tmp/graft_compact_out_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out, ignore_errors=True)

    total_bytes, n_frags = sizing._stat_input(src)
    target = max(1, -(-total_bytes // sizing.TARGET_BLOCK_BYTES))
    ds = ray.data.read_parquet(
        src, override_num_blocks=sizing.read_blocks(src, profile=4)
    )
    ds.repartition(target).write_parquet(out)

    comp = ray.data.read_parquet(out, columns=["event_id"])

    def chk(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        s = np.add.reduce(h) if len(h) else np.uint64(0)  # wraps mod 2^64
        return pa.table({
            "chk": pa.array([s], type=pa.uint64()),
            "n": pa.array([len(ids)], type=pa.int64()),
        })

    # one partial row per block -> bounded driver fold
    parts = comp.map_batches(chk, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    total = np.uint64(0)
    for v in parts["chk"].to_numpy():
        total = np.uint64((int(total) + int(v)) % (1 << 64))
    n = int(parts["n"].sum())
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "chk_hi": pa.array([int(total) >> 32], type=pa.int64()),
        "chk_lo": pa.array([int(total) & 0xFFFFFFFF], type=pa.int64()),
    })


def sql_compact_files() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT event_id FROM events", "event_id", "event_id", "h"
    )
    m = str(1 << 64)
    return (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        f" CAST((SUM(CAST(h AS HUGEINT)) % {m}) // 4294967296 AS BIGINT) AS chk_hi,"
        f" CAST((SUM(CAST(h AS HUGEINT)) % {m}) % 4294967296 AS BIGINT) AS chk_lo"
        f" FROM {sm} t"
    )


def q_table_checksum(sf_dir: str):
    """Order-free integrity fingerprint of the documents and events
    tables: per-row md5 summed with uint64 wraparound (commutative —
    any block order, any reducer interleaving, same checksum), emitted
    as two BIGINT halves.  The standard migration/replication
    validation pass: one map, one scalar-sized exchange, never a
    sort."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    def doc_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        h = np.fromiter(
            (md5_u64(f"{int(did)}|{t}") for did, t in zip(ids, texts)),
            dtype=np.uint64, count=len(ids),
        )
        s = np.add.reduce(h) if len(h) else np.uint64(0)  # wraps mod 2^64
        return pa.table({
            "tbl": pa.array(["documents"]), "g": pa.array([0], type=pa.int64()),
            "chk": pa.array([s], type=pa.uint64()),
            "n": pa.array([len(ids)], type=pa.int64()),
        })

    def ev_partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (md5_u64(f"{int(eid)}|{int(u)}") for eid, u in zip(ids, uid)),
            dtype=np.uint64, count=len(ids),
        )
        s = np.add.reduce(h) if len(h) else np.uint64(0)  # wraps mod 2^64
        return pa.table({
            "tbl": pa.array(["events"]), "g": pa.array([0], type=pa.int64()),
            "chk": pa.array([s], type=pa.uint64()),
            "n": pa.array([len(ids)], type=pa.int64()),
        })

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        doc_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    evs = _read(sf_dir, "events", columns=["event_id", "user_id"]).map_batches(
        ev_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def resolve(g: pa.Table) -> pa.Table:
        tbl = g["tbl"].to_numpy(zero_copy_only=False)
        chk = g["chk"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = g["n"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(tbl, return_inverse=True)  # sorted table names
        hi, lo, nr = [], [], []
        for i in range(len(uq)):
            m = inv == i
            s = np.add.reduce(chk[m])
            hi.append(int(s >> np.uint64(32)))
            lo.append(int(s & np.uint64(0xFFFFFFFF)))
            nr.append(int(n[m].sum()))
        return pa.table({
            "tbl": pa.array(uq, type=pa.string()),
            "chk_hi": pa.array(hi, type=pa.int64()),
            "chk_lo": pa.array(lo, type=pa.int64()),
            "n_rows": pa.array(nr, type=pa.int64()),
        })

    return docs.union(evs).groupby("g").map_groups(resolve, batch_format="pyarrow")


def sql_table_checksum() -> str:
    m = "18446744073709551616"  # 2^64
    return f"""
SELECT 'documents' AS tbl,
  CAST((SUM(CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '|' || text)
    AS HUGEINT)) % {m}) // 4294967296 AS BIGINT) AS chk_hi,
  CAST((SUM(CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '|' || text)
    AS HUGEINT)) % {m}) % 4294967296 AS BIGINT) AS chk_lo,
  CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents
UNION ALL
SELECT 'events' AS tbl,
  CAST((SUM(CAST(md5_number_lower(CAST(event_id AS VARCHAR) || '|'
    || CAST(user_id AS VARCHAR)) AS HUGEINT)) % {m}) // 4294967296 AS BIGINT),
  CAST((SUM(CAST(md5_number_lower(CAST(event_id AS VARCHAR) || '|'
    || CAST(user_id AS VARCHAR)) AS HUGEINT)) % {m}) % 4294967296 AS BIGINT),
  CAST(COUNT(*) AS BIGINT)
FROM events
"""


def q_props_parse(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` column with
    a zero-copy pyarrow.compute regex kernel (no Python per row), then
    aggregate value stats per extracted key.  The parse+combine is one
    map; only ≤ |k| partial rows per batch reach the exchange."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", columns=["props", "value"])

    def parse(batch: pa.Table) -> pa.Table:
        ks = pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        vc = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uq, inv = np.unique(k, return_inverse=True)
        n = np.zeros(len(uq), dtype=np.int64)
        np.add.at(n, inv, 1)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, vc)
        return pa.table({
            "k": pa.array(uq),
            "n": pa.array(n),
            "sum_value_c": pa.array(s),
        })

    part = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("k").aggregate(
        Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c")
    )


def sql_props_parse() -> str:
    return (
        "SELECT CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT) AS k,"
        " CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c"
        " FROM events GROUP BY 1"
    )


CSV_FIXTURE_N = 20000
CSV_FIXTURE_PATH = f"/tmp/graft_csv_fixture_{CSV_FIXTURE_N}.csv"


def _write_csv_fixture() -> str:
    """Deterministic CSV fixture (integer columns only — no float ever
    crosses the text boundary); idempotent, safe whichever side (Ray
    query or DuckDB oracle) runs first."""
    import os

    import pyarrow.csv as pacsv

    if os.path.exists(CSV_FIXTURE_PATH):
        return CSV_FIXTURE_PATH
    i = np.arange(CSV_FIXTURE_N, dtype=np.int64)
    t = pa.table({
        "event_id": pa.array(i),
        "event_type": pa.array(
            np.array([f"t{k}" for k in range(5)], dtype=object)[i % 5],
            type=pa.string(),
        ),
        "v_c": pa.array((i * 2654435761) % 100000),
    })
    tmp = CSV_FIXTURE_PATH + ".tmp"
    pacsv.write_csv(t, tmp)
    os.replace(tmp, CSV_FIXTURE_PATH)
    return CSV_FIXTURE_PATH


def q_csv_source(sf_dir: str):
    """Second source format: ray.data.read_csv over a deterministic
    CSV fixture, aggregated per type.  The oracle reads the identical
    file with DuckDB read_csv, so the source-parse-aggregate loop is
    value-hash verified end-to-end."""
    path = _write_csv_fixture()
    ds = ray.data.read_csv(path)
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("v_c", alias_name="sum_v_c")
    )


def sql_csv_source() -> str:
    path = _write_csv_fixture()  # driver may run the SQL side first
    return (
        "SELECT event_type, COUNT(*) AS n,"
        " CAST(SUM(v_c) AS BIGINT) AS sum_v_c"
        f" FROM read_csv('{path}', header=true,"
        " columns={'event_id': 'BIGINT', 'event_type': 'VARCHAR',"
        " 'v_c': 'BIGINT'})"
        " GROUP BY event_type"
    )


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) + COUNT(*) per event_type.

    Shape: per-batch lexsort dedup of (event_type, user_id) pairs with
    a raw-row tally -> ONE exchange bucketed by h(user_id) (a pair
    lives in exactly one bucket, so per-bucket distinct is globally
    exact) -> per-bucket partials -> tiny final groupby over the
    handful of event types.  Never a per-user ray group."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"], blocks=4)
    n_buckets = sizing.exchange_buckets(32)

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et_uniq, et_inv = np.unique(et, return_inverse=True)
        order = np.lexsort((uid, et_inv))
        ei, ui = et_inv[order], uid[order]
        new = np.ones(len(ui), dtype=bool)
        new[1:] = (ei[1:] != ei[:-1]) | (ui[1:] != ui[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(ui))).astype(np.int64)
        ei, ui = ei[starts], ui[starts]
        from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

        bucket = hash_bucket_u64(ui, n_buckets)
        return pa.table({
            "bucket": pa.array(bucket),
            "event_type": pa.array(et_uniq[ei]),
            "user_id": pa.array(ui),
            "cnt": pa.array(cnt),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        et = g["event_type"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        et_uniq, et_inv = np.unique(et, return_inverse=True)
        order = np.lexsort((uid, et_inv))
        ei, ui, ci = et_inv[order], uid[order], cnt[order]
        new = np.ones(len(ui), dtype=bool)
        new[1:] = (ei[1:] != ei[:-1]) | (ui[1:] != ui[:-1])
        n_users = np.zeros(len(et_uniq), dtype=np.int64)
        np.add.at(n_users, ei[new], 1)
        n_events = np.zeros(len(et_uniq), dtype=np.int64)
        np.add.at(n_events, ei, ci)
        return pa.table({
            "event_type": pa.array(et_uniq, type=pa.string()),
            "n_users": pa.array(n_users),
            "n_events": pa.array(n_events),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    buckets = part.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    return buckets.groupby("event_type").aggregate(
        Sum("n_users", alias_name="n_users"),
        Sum("n_events", alias_name="n_events"),
    )


def sql_distinct_users() -> str:
    return (
        "SELECT event_type,"
        " CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,"
        " CAST(COUNT(*) AS BIGINT) AS n_events"
        " FROM events GROUP BY event_type"
    )


def q_windowed_counts(sf_dir: str):
    """Tumbling 1-hour event-time window per event_type (streaming-style
    windowed aggregate over the events table)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"], blocks=4)

    def bucket(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = ts.astype(np.int64) // 3_600_000_000
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": pa.array(hour),
                "event_type": batch["event_type"],
                "v_c": pa.array(np.floor(v * 100).astype(np.int64)),
            }
        )

    b = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby(["hour", "event_type"]).aggregate(
        Count(alias_name="n"), Sum("v_c", alias_name="sum_value_c")
    )


def sql_windowed_counts() -> str:
    return (
        "SELECT epoch_us(ts) // 3600000000 AS hour, event_type,"
        " COUNT(*) AS n,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c"
        " FROM events GROUP BY 1, 2"
    )


def q_sliding_counts(sf_dir: str):
    """Sliding event-time windows (1 h window, 15 min slide): every
    event belongs to exactly 4 windows.  The 4x expansion happens on
    the per-batch (quarter, type) PARTIALS, not the raw rows — combine
    first, replicate the handful of partials, recombine, then one
    bounded (window, type) exchange.  The streaming construct the
    reference lacks (SURVEY §2.6), windowed_counts' tumbling sibling."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        q = ts.astype(np.int64) // 900_000_000  # 15-min quarter index
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        vc = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"q": q, "event_type": et, "v": vc})
        g = df.groupby(["q", "event_type"], sort=False).agg(
            n=("v", "size"), s=("v", "sum")
        ).reset_index()
        # replicate each (quarter, type) partial into the 4 windows
        # [q-3 .. q] that cover it; window label = start quarter
        win = (g["q"].to_numpy()[None, :] - np.arange(4)[:, None]).reshape(-1)
        return pa.table({
            "win_q": pa.array(win.astype(np.int64)),
            "event_type": pa.array(np.tile(g["event_type"].to_numpy(), 4)),
            "n": pa.array(np.tile(g["n"].to_numpy().astype(np.int64), 4)),
            "sum_value_c": pa.array(np.tile(g["s"].to_numpy().astype(np.int64), 4)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["win_q", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("sum_value_c", alias_name="sum_value_c")
    )


def sql_sliding_counts() -> str:
    return (
        "SELECT (epoch_us(ts) // 900000000) - k.k AS win_q, event_type,"
        " CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c"
        " FROM events, (VALUES (0),(1),(2),(3)) k(k)"
        " GROUP BY 1, 2"
    )


HLL_P = 8  # 2^8 = 256 registers


def q_hll_registers(sf_dir: str):
    """HyperLogLog register sketch of distinct user_ids per event_type
    — the approximate-distinct aggregate the reference has no analogue
    for (SURVEY §2.6 notes it has no sketches at all).  Deterministic
    md5 hashing (ops/dedup.md5_u64 == DuckDB md5_number_lower), so the
    REGISTERS themselves are exact integers the oracle reproduces; the
    user applies the harmonic-mean estimator downstream.  Shape:
    per-batch distinct-uid hash + np.maximum partials -> one tiny
    (event_type, reg) max exchange; mergeable by construction (max is
    commutative), i.e. the 100 TB shape for distinct monitoring."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    mask56 = np.uint64((1 << 56) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et_uniq, et_inv = np.unique(et, return_inverse=True)
        # hash each distinct uid once per batch
        uu, ui = np.unique(uid, return_inverse=True)
        h = np.fromiter(
            (md5_u64(str(int(x))) for x in uu), dtype=np.uint64, count=len(uu)
        )[ui]
        reg = (h >> np.uint64(56)).astype(np.int64)
        suf = h & mask56
        # exact bit_length via 56 vectorized compares (float frexp is
        # NOT exact above 2^53)
        bl = np.zeros(len(suf), dtype=np.int64)
        for k in range(56):
            bl += (suf >= np.uint64(1 << k)).astype(np.int64)
        rho = 57 - bl  # suffix==0 -> bl 0 -> rho 57
        key = et_inv * 256 + reg
        ku, ki = np.unique(key, return_inverse=True)
        mx = np.zeros(len(ku), dtype=np.int64)
        np.maximum.at(mx, ki, rho)
        return pa.table({
            "event_type": pa.array(et_uniq[ku // 256]),
            "reg": pa.array((ku % 256).astype(np.int64)),
            "rho": pa.array(mx),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["event_type", "reg"]).aggregate(
        Max("rho", alias_name="rho")
    )


def sql_hll_registers() -> str:
    return (
        "WITH h AS MATERIALIZED (SELECT event_type,"
        "  md5_number_lower(CAST(user_id AS VARCHAR)) AS h FROM events)"
        " SELECT event_type, CAST(h >> 56 AS BIGINT) AS reg,"
        "  MAX(CASE WHEN h % 72057594037927936 = 0 THEN 57"
        "    ELSE 57 - length(printf('%b',"
        "      CAST(h % 72057594037927936 AS BIGINT))) END) AS rho"
        " FROM h GROUP BY 1, 2"
    )


def q_quantiles(sf_dir: str):
    """Distributed EXACT quantiles (p50/p90/p99 of events.value per
    event_type) via cent-quantized histograms: each batch emits a
    partial (event_type, cent, n) histogram, one small exchange merges
    them per type, and the quantile is read off the cumulative counts
    with pure-integer rank arithmetic (k_q = ceil(q*N) as (q_num*N +
    q_den-1) // q_den) — the streaming shape for value-distribution
    monitoring over a 100 TB corpus, with no per-row sort anywhere."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part_hist(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": et, "c": c})
            .groupby(["event_type", "c"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"].to_numpy(), type=pa.string()),
                "c": pa.array(g["c"].to_numpy()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        c = g["c"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, n)
        cum = np.cumsum(s)
        tot = int(cum[-1])
        ranks = ((tot + 1) // 2, (9 * tot + 9) // 10, (99 * tot + 99) // 100)
        p = [int(uq[np.searchsorted(cum, k)]) for k in ranks]
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n": pa.array([tot], type=pa.int64()),
                "p50_c": pa.array([p[0]], type=pa.int64()),
                "p90_c": pa.array([p[1]], type=pa.int64()),
                "p99_c": pa.array([p[2]], type=pa.int64()),
            }
        )

    part = ds.map_batches(part_hist, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("event_type").map_groups(resolve, batch_format="pyarrow")


def sql_quantiles() -> str:
    return (
        "WITH h AS MATERIALIZED (SELECT event_type,"
        " CAST(floor(value*100) AS BIGINT) AS c, COUNT(*) AS n"
        " FROM events GROUP BY 1, 2),"
        " cum AS (SELECT event_type, c,"
        "  SUM(n) OVER (PARTITION BY event_type ORDER BY c) AS cn,"
        "  SUM(n) OVER (PARTITION BY event_type) AS tot FROM h)"
        " SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n,"
        "  MIN(CASE WHEN cn >= (tot+1)//2 THEN c END) AS p50_c,"
        "  MIN(CASE WHEN cn >= (9*tot+9)//10 THEN c END) AS p90_c,"
        "  MIN(CASE WHEN cn >= (99*tot+99)//100 THEN c END) AS p99_c"
        " FROM cum GROUP BY event_type"
    )


LATBAND_FIXTURES = ((-35.0, 18.0), (-12.5, 38.0), (5.0, 9.0))
LATBAND_RES = 4


def q_cell_latitudes(sf_dir: str):
    """cell_latitudes (dggs.py:909-1004): nucleus and boundary parallels
    of the res-4 grid inside fixture latitude bands (equatorial region,
    where the closed-form SQL chain is exact — CLAUDE.md band rule).
    The sequential ``y += w`` float walk is mirrored bit-for-bit by a
    recursive CTE; latitudes compare through floor(lat*1e6)."""
    import math as _math

    from rhealpixdggs_py_ray.core import cover as cov

    rows = []
    for bid, (pmin, pmax) in enumerate(LATBAND_FIXTURES):
        for nuc in (True, False):
            lats = cov.cell_latitudes(
                CFG, LATBAND_RES, pmin, pmax, nucleus=nuc, plane=False
            )
            for k, lat in enumerate(lats):
                rows.append((bid, 1 if nuc else 0, k, _math.floor(lat * 1e6)))
    arr = np.array(rows, dtype=np.int64).reshape(-1, 4)
    return pa.table({
        "band": pa.array(arr[:, 0]),
        "nucleus": pa.array(arr[:, 1]),
        "k": pa.array(arr[:, 2]),
        "lat_micros": pa.array(arr[:, 3]),
    })


def sql_cell_latitudes() -> str:
    import math as _math

    R = CFG.R_A
    w = CFG.cell_width(LATBAND_RES)
    xm = R * _math.pi / 4
    L = oracle._lit

    def band_sql(bid: int, pmin: float, pmax: float, nucleus: bool) -> str:
        # N_side=3 (odd): first candidate parallel below the south pole
        # edge (dggs.py:975-991), computed in the same float op order
        yb = -R * _math.pi / 2 + w if nucleus else -R * _math.pi / 2 + w / 2
        pts = (
            f"SELECT * FROM (VALUES (0, 0.0, {L(pmin)}), (1, 0.0, {L(pmax)}))"
            " v(id, lon, lat)"
        )
        fwd = oracle.projection_sql(pts, CFG, id_cols=("id",))
        inv = oracle.inverse_sql(
            f"(SELECT k, {L(xm)} AS xm, y AS ym FROM ys)", CFG, id_cols=("k",)
        )
        return f"""
WITH RECURSIVE
mm AS MATERIALIZED (
  SELECT MAX(CASE WHEN id = 0 THEN ym END) AS ymin,
         MAX(CASE WHEN id = 1 THEN ym END) AS ymax
  FROM {fwd} q
),
snap AS MATERIALIZED (
  SELECT CASE WHEN {L(yb)} <= ymin
    THEN greatest({L(yb)} + CAST(ceil((ymin - {L(yb)}) / {L(w)}) AS BIGINT) * {L(w)},
                  {L(yb)} + {L(w)})
    ELSE {L(yb)} END AS y0, ymax
  FROM mm
),
ys(k, y, ymax) AS (
  SELECT 0, y0, ymax FROM snap WHERE y0 < ymax
  UNION ALL
  SELECT k + 1, y + {L(w)}, ymax FROM ys WHERE y + {L(w)} < ymax
)
SELECT CAST({bid} AS BIGINT) AS band,
  CAST({1 if nucleus else 0} AS BIGINT) AS nucleus,
  CAST(k AS BIGINT) AS k,
  CAST(floor(lat * 1000000.0) AS BIGINT) AS lat_micros
FROM {inv} q
"""

    parts = []
    for bid, (pmin, pmax) in enumerate(LATBAND_FIXTURES):
        for nuc in (True, False):
            parts.append(band_sql(bid, pmin, pmax, nuc))
    return " UNION ALL ".join(
        f"SELECT * FROM ({p}) u{i}" for i, p in enumerate(parts)
    )


def q_winsorize(sf_dir: str):
    """Outlier clipping (winsorization): clamp events.value to the
    exact per-type [p05, p95] cent thresholds, then aggregate.  Pass 1
    reuses the quantile histogram exchange to produce the tiny
    threshold table (one row per event type), broadcast via ray.put;
    pass 2 is a pure map emitting integer partials (clip counts +
    clamped cent sums, bit-exact under any summation order) merged by
    a final handful-of-groups aggregate."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def part_hist(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": et, "c": c})
            .groupby(["event_type", "c"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table({
            "event_type": pa.array(g["event_type"].to_numpy(), type=pa.string()),
            "c": pa.array(g["c"].to_numpy()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64)),
        })

    def thresholds(g: pa.Table) -> pa.Table:
        c = g["c"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, n)
        cum = np.cumsum(s)
        tot = int(cum[-1])
        lo = int(uq[np.searchsorted(cum, (5 * tot + 99) // 100)])
        hi = int(uq[np.searchsorted(cum, (95 * tot + 99) // 100)])
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            "lo": pa.array([lo], type=pa.int64()),
            "hi": pa.array([hi], type=pa.int64()),
        })

    thr = (
        ds.map_batches(part_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(thresholds, batch_format="pyarrow")
        .to_pandas()  # one row per event type
    )
    thr_ref = ray.put({
        r.event_type: (int(r.lo), int(r.hi)) for r in thr.itertuples()
    })

    def clamp_partial(batch: pa.Table) -> pa.Table:
        bounds = ray.get(thr_ref)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        et_uniq, et_inv = np.unique(et, return_inverse=True)
        lo = np.array([bounds[e][0] for e in et_uniq], dtype=np.int64)[et_inv]
        hi = np.array([bounds[e][1] for e in et_uniq], dtype=np.int64)[et_inv]
        clamped = np.clip(c, lo, hi)
        n = np.zeros(len(et_uniq), dtype=np.int64)
        np.add.at(n, et_inv, 1)
        nlo = np.zeros(len(et_uniq), dtype=np.int64)
        np.add.at(nlo, et_inv, (c < lo).astype(np.int64))
        nhi = np.zeros(len(et_uniq), dtype=np.int64)
        np.add.at(nhi, et_inv, (c > hi).astype(np.int64))
        sc = np.zeros(len(et_uniq), dtype=np.int64)
        np.add.at(sc, et_inv, clamped)
        return pa.table({
            "event_type": pa.array(et_uniq, type=pa.string()),
            "n": pa.array(n), "n_clip_lo": pa.array(nlo),
            "n_clip_hi": pa.array(nhi), "sum_clamped_c": pa.array(sc),
        })

    part = ds.map_batches(clamp_partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("event_type").aggregate(
        Sum("n", alias_name="n"),
        Sum("n_clip_lo", alias_name="n_clip_lo"),
        Sum("n_clip_hi", alias_name="n_clip_hi"),
        Sum("sum_clamped_c", alias_name="sum_clamped_c"),
    )


def sql_winsorize() -> str:
    return (
        "WITH h AS MATERIALIZED (SELECT event_type,"
        " CAST(floor(value*100) AS BIGINT) AS c, COUNT(*) AS n"
        " FROM events GROUP BY 1, 2),"
        " cum AS (SELECT event_type, c,"
        "  SUM(n) OVER (PARTITION BY event_type ORDER BY c) AS cn,"
        "  SUM(n) OVER (PARTITION BY event_type) AS tot FROM h),"
        " thr AS MATERIALIZED (SELECT event_type,"
        "  MIN(CASE WHEN cn >= (5*tot+99)//100 THEN c END) AS lo,"
        "  MIN(CASE WHEN cn >= (95*tot+99)//100 THEN c END) AS hi"
        "  FROM cum GROUP BY event_type),"
        " e AS (SELECT e.event_type,"
        "  CAST(floor(e.value*100) AS BIGINT) AS c, t.lo, t.hi"
        "  FROM events e JOIN thr t USING (event_type))"
        " SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,"
        "  CAST(SUM(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,"
        "  CAST(SUM(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,"
        "  CAST(SUM(least(greatest(c, lo), hi)) AS BIGINT) AS sum_clamped_c"
        " FROM e GROUP BY event_type"
    )


N_ASOF_BUCKETS = 8  # exchange fixed cost ~ blocks x partitions


def q_asof_join(sf_dir: str):
    """Per-user AS-OF join: every event matches the latest order of the
    same customer with o_orderdate <= ts (date tie -> max o_orderkey);
    events with no prior order drop (inner as-of).  The reference has
    no as-of operator — engine-only training-data surface.

    Distributed shape: both sides hash-bucket by the join key into ONE
    union + groupby exchange (the _attach_pair_sides pattern); inside a
    bucket the match is a single merged np.lexsort over
    (key, t, okey-with-event-sentinel) plus a cumulative order counter
    — no per-key loop, no JoinOperator, no O(|events| x |orders|)
    intermediate (the SQL oracle's join + QUALIFY builds ~10x the rows
    this pipeline ever materializes)."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)
    od = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        blocks=4,
    )

    def _bkt(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
        ).astype(np.int64) % N_ASOF_BUCKETS

    def tag_events(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        n = len(uid)
        return pa.table(
            {
                "bkt": pa.array(_bkt(uid)),
                "kind": pa.array(np.ones(n, dtype=np.int64)),
                "key": pa.array(uid),
                "t": pa.array(ts),
                "okey": pa.array(np.zeros(n, dtype=np.int64)),
                "eid": batch["event_id"],
                "price_c": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        dt = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        n = len(ck)
        return pa.table(
            {
                "bkt": pa.array(_bkt(ck)),
                "kind": pa.array(np.zeros(n, dtype=np.int64)),
                "key": pa.array(ck),
                "t": pa.array(dt),
                "okey": batch["o_orderkey"],
                "eid": pa.array(np.zeros(n, dtype=np.int64)),
                "price_c": pa.array(np.floor(price * 100).astype(np.int64)),
            }
        )

    u = ev.map_batches(tag_events, batch_format="pyarrow", zero_copy_batch=True).union(
        od.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def resolve(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        key_all = g["key"].to_numpy(zero_copy_only=False)
        t_all = g["t"].to_numpy(zero_copy_only=False)
        okey_all = g["okey"].to_numpy(zero_copy_only=False)
        pc_all = g["price_c"].to_numpy(zero_copy_only=False)
        eid_all = g["eid"].to_numpy(zero_copy_only=False)
        om = kind == 0
        em = ~om
        empty = pa.table(
            {
                c: pa.array([], type=pa.int64())
                for c in ("event_id", "user_id", "o_orderkey", "price_c")
            }
        )
        if not om.any() or not em.any():
            return empty
        ko = key_all[om]
        to = t_all[om]
        oo = okey_all[om]
        pc = pc_all[om]
        ke = key_all[em]
        te = t_all[em]
        ide = eid_all[em]
        n_o = len(ko)
        key = np.concatenate([ko, ke])
        t = np.concatenate([to, te])
        # events sort AFTER every same-(key, t) order via the okey
        # sentinel, so "last order before me" ties to max o_orderkey
        okey_s = np.concatenate(
            [oo, np.full(len(ke), np.iinfo(np.int64).max, dtype=np.int64)]
        )
        kindc = np.concatenate(
            [np.zeros(n_o, dtype=np.int8), np.ones(len(ke), dtype=np.int8)]
        )
        srt = np.lexsort((okey_s, t, key))
        ks = kindc[srt]
        cnt = np.cumsum(ks == 0)
        ordpos = np.flatnonzero(ks == 0)
        evpos = np.flatnonzero(ks == 1)
        c = cnt[evpos]
        has = c > 0
        cand = srt[ordpos[c[has] - 1]]  # concat index of candidate order
        evi = srt[evpos[has]] - n_o  # index into the event arrays
        good = ko[cand] == ke[evi]
        cand, evi = cand[good], evi[good]
        return pa.table(
            {
                "event_id": pa.array(ide[evi]),
                "user_id": pa.array(ke[evi]),
                "o_orderkey": pa.array(oo[cand]),
                "price_c": pa.array(pc[cand]),
            }
        )

    return u.groupby("bkt").map_groups(resolve, batch_format="pyarrow")


def sql_asof_join() -> str:
    return (
        "SELECT e.event_id, e.user_id, o.o_orderkey,"
        " CAST(floor(o.o_totalprice*100) AS BIGINT) AS price_c"
        " FROM events e JOIN orders o"
        " ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts"
        " QUALIFY row_number() OVER (PARTITION BY e.event_id"
        " ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1"
    )


# 24 OVERLAPPING numeric bands over events.value (each 30 wide, step
# 20): events in an overlap region match two bands (multi-match range
# semantics).  Constants integral -> exact float64 on both sides.
RANGE_BANDS = [(20.0 * i, 20.0 * i + 30.0) for i in range(24)]


def q_range_join(sf_dir: str):
    """Numeric range (interval) join: events.value against the tiny
    overlapping band table.  Small-side range joins never shuffle: the
    24 intervals are a broadcast constant, each batch evaluates one
    vector mask per band and emits per-batch (band_id, n, sum) partials
    — the only exchange is the 24-group final aggregate."""
    ds = _read(sf_dir, "events", columns=["value"])
    los = np.array([b[0] for b in RANGE_BANDS])
    his = np.array([b[1] for b in RANGE_BANDS])

    def bands(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        vc = np.floor(v * 100).astype(np.int64)
        out_b, out_n, out_s = [], [], []
        for i in range(len(los)):
            m = (v >= los[i]) & (v < his[i])
            k = int(m.sum())
            if k:
                out_b.append(i)
                out_n.append(k)
                out_s.append(int(vc[m].sum()))
        return pa.table(
            {
                "band_id": pa.array(np.array(out_b, dtype=np.int64)),
                "n": pa.array(np.array(out_n, dtype=np.int64)),
                "s": pa.array(np.array(out_s, dtype=np.int64)),
            }
        )

    t = ds.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
    return t.groupby("band_id").aggregate(
        Sum("n", alias_name="n_events"), Sum("s", alias_name="sum_value_c")
    )


def sql_range_join() -> str:
    from rhealpixdggs_py_ray.oracle import _lit

    rows = ", ".join(
        f"({i}, {_lit(lo)}, {_lit(hi)})" for i, (lo, hi) in enumerate(RANGE_BANDS)
    )
    return (
        f"WITH bands(band_id, lo, hi) AS (VALUES {rows})"
        " SELECT CAST(band_id AS BIGINT) AS band_id, COUNT(*) AS n_events,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c"
        " FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi"
        " GROUP BY band_id"
    )


def q_spatial_antijoin(sf_dir: str):
    """Anti-join twin of q_spatial_join_bbox: points OUTSIDE the bbox
    (cover complement prune + exact refine), per-face counts."""
    lon1, lat1, lon2, lat2 = BBOX
    ds = indexed_events(sf_dir)

    def refine(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        keep = ~((lon >= lon1) & (lon <= lon2) & (lat >= lat1) & (lat <= lat2))
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)[keep]
        face = _FACE_LETTERS[su.face_of(u)]
        return pa.table({"face_id": pa.array(face, type=pa.string())})

    ds = ds.map_batches(refine, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("face_id").aggregate(Count(alias_name="n"))


def sql_spatial_antijoin() -> str:
    lon1, lat1, lon2, lat2 = BBOX
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",)
    )
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    return (
        f"SELECT substr(cell_id, 1, 1) AS face_id, COUNT(*) AS n FROM {inner} t"
        f" WHERE NOT ({lon} >= {lon1!r} AND {lon} <= {lon2!r}"
        f" AND {lat} >= {lat1!r} AND {lat} <= {lat2!r}) GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# Line / region covers, ring kNN, checkpointed run
# ---------------------------------------------------------------------------

# Equatorial-band polylines in generic position so the walk is
# oracle-checkable (closed-form Liang-Barsky cover SQL); polar
# segments are golden-tested in tests/test_cover.py.
LINETRACE_LINES = [
    [(-29.63, -10.2), (40.37, 25.3)],
    [(100.4, 10.3), (140.2, -34.7), (169.6, 0.45)],
    [(-119.5, 30.2), (-60.3, 40.3)],
]
LINETRACE_RES = 4


def q_linetrace(sf_dir: str):
    """linetrace (rhp_wrappers.py:602-674) over a small set of
    deterministic great-lines; one flat_map row per (line, seq, cell)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    lines = [geo.LineString(c) for c in LINETRACE_LINES]
    ds = ray.data.from_items(
        [{"line_id": i} for i in range(len(lines))], override_num_blocks=3
    )

    def trace(batch: pa.Table) -> pa.Table:
        lid, seq, cell = [], [], []
        for i in batch["line_id"].to_pylist():
            for j, c in enumerate(
                W.linetrace(lines[i], LINETRACE_RES, plane=False, cfg=CFG)
            ):
                lid.append(i)
                seq.append(j)
                cell.append(c)
        return pa.table(
            {
                "line_id": pa.array(np.array(lid, dtype=np.int64)),
                "seq": pa.array(np.array(seq, dtype=np.int64)),
                "cell_id": pa.array(cell, type=pa.string()),
            }
        )

    return ds.map_batches(trace, batch_format="pyarrow", zero_copy_batch=True)


def sql_linetrace() -> str:
    return oracle.linetrace_sql(LINETRACE_LINES, LINETRACE_RES, CFG)


REGION_UL = (-20.0, 40.0)
REGION_DR = (50.0, -15.0)


def q_cells_from_region(sf_dir: str):
    """cells_from_region cover rows (dggs.py:1181-1331), W->E / N->S
    order preserved via (row, col) output columns."""
    from rhealpixdggs_py_ray.core import cover as cov

    rows = cov.cells_from_region(CFG, 4, REGION_UL, REGION_DR, plane=False)
    ri, ci, cid = [], [], []
    for r, row in enumerate(rows):
        for c, u in enumerate(row):
            ri.append(r)
            ci.append(c)
            cid.append(su.to_string(np.array([u], dtype=np.uint64))[0])
    return pa.table(
        {
            "row": pa.array(np.array(ri, dtype=np.int64)),
            "col": pa.array(np.array(ci, dtype=np.int64)),
            "cell_id": pa.array(cid, type=pa.string()),
        }
    )


def sql_cells_from_region() -> str:
    return oracle.cells_from_region_sql(REGION_UL, REGION_DR, 4, CFG)


# North-cap region strictly inside the lon (0, 90) quadrant (the top
# triangle of face N under north_square=0), generic-position bounds.
REGION_POLAR_UL = (18.7, 71.3)
REGION_POLAR_DR = (72.4, 57.9)


def q_cells_from_region_polar(sf_dir: str):
    """Ellipsoidal cells_from_region over a NORTH-CAP region
    (dggs.py:1181-1331 polar path: rows of parallels on the cap face)
    — the cover-walk case the round-3 oracles restricted to the
    equatorial band; oracle.cells_from_region_polar_sql replays the
    ring enumeration + east walk + boundary-row insertion in SQL."""
    from rhealpixdggs_py_ray.core import cover as cov

    rows = cov.cells_from_region(
        CFG, 4, REGION_POLAR_UL, REGION_POLAR_DR, plane=False
    )
    ri, ci, cid = [], [], []
    for r, row in enumerate(rows):
        for c, u in enumerate(row):
            ri.append(r)
            ci.append(c)
            cid.append(su.to_string(np.array([u], dtype=np.uint64))[0])
    return pa.table(
        {
            "row": pa.array(np.array(ri, dtype=np.int64)),
            "col": pa.array(np.array(ci, dtype=np.int64)),
            "cell_id": pa.array(cid, type=pa.string()),
        }
    )


def sql_cells_from_region_polar() -> str:
    return oracle.cells_from_region_polar_sql(
        REGION_POLAR_UL, REGION_POLAR_DR, 4, CFG
    )


# North-cap parallels, lon span inside the (0, 90) quadrant => the walk
# is one straight descending-column run on the ring's top edge.
PARALLEL_POLAR_FIXTURES = [
    (6.3, 83.1, 47.2),
    (11.9, 78.4, 58.6),
    (23.7, 66.2, 70.9),
    (31.4, 58.8, 79.3),
]


def q_cells_from_parallel_polar(sf_dir: str):
    """cells_from_parallel at NORTH-CAP latitudes (dggs.py:1060-1094
    polar path: the east walk rides a cap ring's top edge) — W->E order
    preserved as col."""
    from rhealpixdggs_py_ray.core import cover as cov

    pid_l, col_l, cid_l = [], [], []
    for pid, (lam_min, lam_max, phi) in enumerate(PARALLEL_POLAR_FIXTURES):
        cells = cov.cells_from_parallel(CFG, COVER_LINE_RES, phi, lam_min, lam_max)
        u = np.array(cells, dtype=np.uint64)
        pid_l.append(np.full(len(u), pid, dtype=np.int64))
        col_l.append(np.arange(len(u), dtype=np.int64))
        cid_l.append(su.to_string(u))
    return pa.table(
        {
            "pid": pa.array(np.concatenate(pid_l)),
            "col": pa.array(np.concatenate(col_l)),
            "cell_id": pa.array(np.concatenate(cid_l), type=pa.string()),
        }
    )


def sql_cells_from_parallel_polar() -> str:
    """Each polar parallel's walk = [col(lam_min) .. col(lam_max)]
    descending on the top edge of one cap ring; endpoints through the
    verified forward cell chain, columns enumerated in SQL."""
    res, N = COVER_LINE_RES, CFG.N_side
    pts = " UNION ALL ".join(
        f"SELECT CAST({pid} AS BIGINT) AS pid, {s} AS side,"
        f" {oracle._lit(lam_min if s == 0 else lam_max)} AS lon,"
        f" {oracle._lit(phi)} AS lat"
        for pid, (lam_min, lam_max, phi) in enumerate(PARALLEL_POLAR_FIXTURES)
        for s in (0, 1)
    )
    cells = oracle.cell_from_point_sql(pts, res, CFG, id_cols=("pid", "side"))
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row_i = "(" + " + ".join(
        f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    col_j = "(" + " + ".join(
        f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    digits2 = "".join(
        f" || CAST({N} * ((fi // {N ** (res - 1 - i)}) % {N})"
        f" + ((j2 // {N ** (res - 1 - i)}) % {N}) AS VARCHAR)"
        for i in range(res)
    )
    return (
        f"WITH pp2_cells AS MATERIALIZED ("
        f"  SELECT pid, side, cell_id, {row_i} AS fi, {col_j} AS fj"
        f"  FROM {cells} cc),"
        f" pp2_rows AS MATERIALIZED ("
        f"  SELECT pid, max(CASE WHEN side = 0 THEN fi END) AS fi,"
        f"         max(CASE WHEN side = 0 THEN fj END) AS j_start,"
        f"         max(CASE WHEN side = 1 THEN fj END) AS j_end"
        f"  FROM pp2_cells GROUP BY pid)"
        f" SELECT pid, j_start - j2 AS col, 'N'{digits2} AS cell_id"
        f" FROM (SELECT pid, fi, j_start,"
        f"              unnest(generate_series(j_end, j_start)) AS j2"
        f"       FROM pp2_rows) e"
    )


# Equatorial-band fixtures (|authalic lat| < asin(2/3); fractional
# degrees keep every point off the res-3 row/column boundaries, which
# sit at multiples of 90/27 deg in projected space).
PARALLEL_FIXTURES = [
    (-60.4, 25.2, 17.3),
    (-88.7, -1.6, -29.7),
    (3.9, 77.1, 5.1),
    (100.3, 171.2, 33.3),
    (-170.2, -95.8, -11.9),
    (22.6, 101.4, 24.7),
]
MERIDIAN_FIXTURES = [
    (17.3, -28.6, 31.4),
    (-141.8, -33.2, 12.9),
    (76.4, -5.7, 34.1),
    (-12.1, -34.4, -3.3),
    (155.9, 8.2, 29.8),
]
COVER_LINE_RES = 3


def q_cells_from_parallel(sf_dir: str):
    """cells_from_parallel (dggs.py:1060-1094): east-neighbor walk
    along each fixture parallel, W->E order preserved as the col
    column.  Inside the equatorial band the walk equals one cover row,
    so the closed-form region-cover SQL with a degenerate quad is an
    exact oracle."""
    from rhealpixdggs_py_ray.core import cover as cov

    pid_l, col_l, cid_l = [], [], []
    for pid, (lam_min, lam_max, phi) in enumerate(PARALLEL_FIXTURES):
        cells = cov.cells_from_parallel(CFG, COVER_LINE_RES, phi, lam_min, lam_max)
        u = np.array(cells, dtype=np.uint64)
        pid_l.append(np.full(len(u), pid, dtype=np.int64))
        col_l.append(np.arange(len(u), dtype=np.int64))
        cid_l.append(su.to_string(u))
    return pa.table(
        {
            "pid": pa.array(np.concatenate(pid_l)),
            "col": pa.array(np.concatenate(col_l)),
            "cell_id": pa.array(np.concatenate(cid_l), type=pa.string()),
        }
    )


def sql_cells_from_parallel() -> str:
    parts = []
    for pid, (lam_min, lam_max, phi) in enumerate(PARALLEL_FIXTURES):
        sub = oracle.cells_from_region_sql(
            (lam_min, phi), (lam_max, phi), COVER_LINE_RES, CFG
        )
        parts.append(
            f"SELECT CAST({pid} AS BIGINT) AS pid, col, cell_id FROM ({sub}) q{pid}"
        )
    return " UNION ALL ".join(parts)


def q_cells_from_meridian(sf_dir: str):
    """cells_from_meridian (dggs.py:1006-1058): nucleus-latitude walk
    down each fixture meridian segment (N->S as the row column).
    In-band every cell is a quad, so the walk equals one cover column —
    oracled by the degenerate-quad region SQL (the meridian as an
    epsilon-wide lon range inside one column)."""
    from rhealpixdggs_py_ray.core import cover as cov

    mid_l, row_l, cid_l = [], [], []
    for mid, (lam, phi_min, phi_max) in enumerate(MERIDIAN_FIXTURES):
        cells = cov.cells_from_meridian(CFG, COVER_LINE_RES, lam, phi_min, phi_max)
        u = np.array(cells, dtype=np.uint64)
        mid_l.append(np.full(len(u), mid, dtype=np.int64))
        row_l.append(np.arange(len(u), dtype=np.int64))
        cid_l.append(su.to_string(u))
    return pa.table(
        {
            "mid": pa.array(np.concatenate(mid_l)),
            "row": pa.array(np.concatenate(row_l)),
            "cell_id": pa.array(np.concatenate(cid_l), type=pa.string()),
        }
    )


def sql_cells_from_meridian() -> str:
    parts = []
    for mid, (lam, phi_min, phi_max) in enumerate(MERIDIAN_FIXTURES):
        sub = oracle.cells_from_meridian_sql(
            lam, phi_min, phi_max, COVER_LINE_RES, CFG
        )
        parts.append(
            f"SELECT CAST({mid} AS BIGINT) AS mid, row, cell_id FROM ({sub}) m{mid}"
        )
    return " UNION ALL ".join(parts)


def q_knn_rings(sf_dir: str):
    """Ring-expansion kNN (scale path): prune to k_ring(2) cells around
    each query, exact chord top-k on survivors.  Equals brute within
    the ring radius (tests/test_ray_pipelines.py pins equality)."""
    from rhealpixdggs_py_ray.pipelines.knn import knn_rings

    qids = np.arange(KNN_Q, dtype=np.int64)
    qlon, qlat = oracle.lonlat_from_id(qids + 1_000_000)
    ds = indexed_events(sf_dir, resolution=2)
    out = knn_rings(
        ds,
        {"qid": qids, "lon": qlon, "lat": qlat},
        k=KNN_K,
        cfg=CFG,
        resolution=2,
        expand=2,
        id_col="event_id",
        cell_col="cell_u64",
    )
    return out.select_columns(["qid", "neighbor_id", "rank"])


def q_resumable_tiling(sf_dir: str):
    """Checkpointed per-partition run (state/checkpoint.py): the events
    table split into two key-range partitions (predicate-pushdown
    reads), run CONCURRENTLY (CheckpointedRun.run overlaps partition
    sub-pipelines from driver threads), manifests with lineage +
    metrics; second invocation skips completed partitions
    (byte-identical output pinned in tests).  Per-partition tile
    partials are re-aggregated at the end (one tiny exchange over
    ~#tiles rows)."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from rhealpixdggs_py_ray.state.checkpoint import CheckpointedRun

    out_dir = f"/tmp/graft_ckpt_{os.path.basename(sf_dir.rstrip('/'))}"
    shutil.rmtree(out_dir, ignore_errors=True)

    path = f"{sf_dir}/events.parquet"
    n = pq.ParquetFile(path).metadata.num_rows
    mid = n // 2
    # Key-range partitions (event_id is the layout key); at cluster
    # scale these would be file subsets — here one file, two ranges.
    parts = [[path, 0, mid], [path, mid, n]]

    def pipeline_fn(spec, part_out):
        f, lo, hi = spec
        ds = ray.data.read_parquet(
            f, columns=["event_id"],
            filter=(pc.field("event_id") >= lo) & (pc.field("event_id") < hi),
        )
        ds = ds.map_batches(
            DeriveAndIndex,
            fn_constructor_kwargs={"resolution": RES},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=sizing.pool(8),
        )
        tiles = aggregate_tiles(ds, TILE_RES, salt_col=None)
        tiles.write_parquet(part_out)
        # Row count from the written files' parquet metadata — re-running
        # tiles.count() would execute the whole lineage a second time.
        import pyarrow.dataset as pads

        return {"rows_out": pads.dataset(part_out, format="parquet").count_rows()}

    run = CheckpointedRun(out_root=out_dir, config_payload={"res": RES, "tile_res": TILE_RES})
    run.run(parts, pipeline_fn)
    # resumability: a second run must skip the completed partitions
    before = run.completed_partitions()
    run.run(parts, pipeline_fn)
    assert run.completed_partitions().keys() == before.keys()
    # Final merge: per-partition tile partials are bounded by the grid
    # cardinality at TILE_RES (x P partitions) — small enough to combine
    # on the driver; a groupby exchange here costs ~1s fixed for ~1k rows.
    t = pq.read_table(
        sorted(glob.glob(f"{out_dir}/part=*/*.parquet")),
        columns=["tile_u64", "n"],
    )
    k = t["tile_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
    v = t["n"].to_numpy(zero_copy_only=False)
    uq, inv = np.unique(k, return_inverse=True)
    s = np.zeros(len(uq), dtype=np.int64)
    np.add.at(s, inv, v)
    return pa.table({
        "tile_id": pa.array(su.to_string_fixed(uq, TILE_RES)),
        "n": pa.array(s),
    })


def sql_resumable_tiling() -> str:
    return sql_tile_counts()


def q_image_features(sf_dir: str):
    """Multimodal feature pipeline: decode -> resize(32x32) -> channel
    stats + pixel phash (ops/multimodal.py) -> per-face aggregates."""
    import os

    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.ops.multimodal import DecodeResizeFeatures
    from rhealpixdggs_py_ray.stages.indexer import CellIndexer

    n = 2000
    out_dir = f"/tmp/graft_images_{n}"
    write_images_table(out_dir, n)
    ds = ray.data.read_parquet(out_dir, override_num_blocks=sizing.read_blocks(out_dir, profile=8))
    ds = ds.map_batches(
        DecodeResizeFeatures,
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=sizing.pool(),
    )
    ds = ds.map_batches(
        CellIndexer,
        fn_constructor_kwargs={"resolution": 9},
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=sizing.pool(),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        fi = batch["face"].to_numpy(zero_copy_only=False).astype(np.int64)
        fm = np.array(batch["feat_mean"].to_pylist(), dtype=np.float64)
        mean_r_c = np.floor(fm[:, 0] * 100).astype(np.int64)
        uq, inv = np.unique(fi, return_inverse=True)
        n = np.bincount(inv)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, mean_r_c)
        return pa.table(
            {
                "face": pa.array(_FACE_LETTERS[uq], type=pa.string()),
                "n": pa.array(n.astype(np.int64)),
                "sum_mean_r_c": pa.array(s),
            }
        )

    part = ds.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("face").aggregate(
        Sum("n", alias_name="n"), Sum("sum_mean_r_c", alias_name="sum_mean_r_c")
    )


def q_cell_stats(sf_dir: str):
    """cell_width / cell_area closed forms per resolution 0..15
    (dggs.py:671-708) — quantized to integer micrometers / m^2 so the
    SQL power() parity cannot flip a bit."""
    rows = np.arange(CFG.max_resolution + 1, dtype=np.int64)
    width = np.array([CFG.cell_width(int(r)) for r in rows])
    area_p = np.array([CFG.cell_area(int(r), plane=True) for r in rows])
    area_e = np.array([CFG.cell_area(int(r), plane=False) for r in rows])
    return pa.table(
        {
            "resolution": pa.array(rows),
            "width_um": pa.array(np.floor(width * 1e6).astype(np.int64)),
            "area_plane_m2": pa.array(np.floor(area_p).astype(np.int64)),
            "area_ellipsoid_m2": pa.array(np.floor(area_e).astype(np.int64)),
        }
    )


def sql_cell_stats() -> str:
    from rhealpixdggs_py_ray.oracle import _lit

    R = _lit(CFG.R_A)
    # mirrors cfg.cell_width: R_A * (pi/2) * N ** (-res); python's
    # int**-int and DuckDB power() both bind C pow (parity verified in
    # tests)
    w = f"({R} * (pi() / 2) * power({CFG.N_side}, -resolution))"
    return (
        "SELECT resolution,"
        f" CAST(floor({w} * 1e6) AS BIGINT) AS width_um,"
        f" CAST(floor({w} * {w}) AS BIGINT) AS area_plane_m2,"
        f" CAST(floor(8 / (3 * pi()) * ({w} * {w})) AS BIGINT) AS area_ellipsoid_m2"
        f" FROM (SELECT unnest(generate_series(0, {CFG.max_resolution})) AS resolution)"
    )


PYRAMID_MAX_RES = 3


def q_tile_pyramid(sf_dir: str):
    """Aggregation pyramid: per-tile counts at resolutions 0..3 from a
    SINGLE res-9 indexing pass — every batch emits (res, tile, n)
    partials for all levels (np.unique on the packed-SUID prefix via
    su.parent), and one exchange carries the whole pyramid; no
    per-level re-index or re-shuffle.  The standard DGGS rollup shape
    for serving map tiles at every zoom from one scan."""
    ds = indexed_events(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        res_out, tile_out, n_out = [], [], []
        for r in range(PYRAMID_MAX_RES + 1):
            uq, cnt = np.unique(su.parent(u, r), return_counts=True)
            res_out.append(np.full(len(uq), r, dtype=np.int64))
            tile_out.append(su.to_string_fixed(uq, r))
            n_out.append(cnt.astype(np.int64))
        return pa.table(
            {
                "res": pa.array(np.concatenate(res_out)),
                "tile_id": pa.array(np.concatenate(tile_out), type=pa.string()),
                "n": pa.array(np.concatenate(n_out)),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["res", "tile_id"]).aggregate(Sum("n", alias_name="n"))


def sql_tile_pyramid() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",)
    )
    return (
        f"WITH pts AS MATERIALIZED (SELECT cell_id FROM {inner} t)"
        " SELECT r.res, substr(cell_id, 1, 1 + r.res) AS tile_id,"
        "   CAST(COUNT(*) AS BIGINT) AS n"
        " FROM pts CROSS JOIN"
        f"  (SELECT unnest(generate_series(0, {PYRAMID_MAX_RES})) AS res) r"
        " GROUP BY r.res, tile_id"
    )


def q_tile_counts_salted(sf_dir: str):
    """Same result as tile_counts but through the salted two-stage merge
    (combiner -> groupby(tile, salt) -> groupby(tile)) — the explicit
    skew path for hot polar cap/dart tiles (BASELINE.json north rule;
    skew test: tests/test_ops.py::test_salted_tile_agg_on_skew)."""
    ds = indexed_events(sf_dir)

    def add_salt_src(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("phash", pa.array(ids, type=pa.int64()))

    ds = ds.map_batches(add_salt_src, batch_format="pyarrow", zero_copy_batch=True)
    return aggregate_tiles(ds, TILE_RES, salt_col="phash", salt_bits=3).select_columns(
        ["tile_id", "n"]
    )


N_REGION_PAIRS = 200
REGION_PAIR_OFFSET = 3000


def q_cell_from_region(sf_dir: str):
    """Smallest single cell containing each of 200 derived ellipsoidal
    quads (dggs.py:833-907 semantics: project the 4 corners, index the
    planar extremes at depth 14, take the longest common SUID prefix;
    NULL when the corners straddle faces)."""

    def fn(batch: pa.Table) -> pa.Table:
        pids = batch["pair_id"].to_numpy(zero_copy_only=False)
        lon1, lat1 = oracle.lonlat_from_id(REGION_PAIR_OFFSET + 2 * pids)
        lon2, lat2 = oracle.lonlat_from_id(REGION_PAIR_OFFSET + 2 * pids + 1)
        out = []
        for k in range(len(pids)):
            ul = (min(lon1[k], lon2[k]), max(lat1[k], lat2[k]))
            dr = (max(lon1[k], lon2[k]), min(lat1[k], lat2[k]))
            c = idx.cell_from_region(CFG, ul, dr, plane=False)
            out.append(
                None if c is None else su.to_string(np.array([c], dtype=np.uint64))[0]
            )
        return pa.table(
            {
                "pair_id": pa.array(pids, type=pa.int64()),
                "cell_id": pa.array(out, type=pa.string()),
            }
        )

    ds = ray.data.from_items(
        [{"pair_id": i} for i in range(N_REGION_PAIRS)], override_num_blocks=4
    )
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sql_cell_from_region() -> str:
    lon1, lat1 = oracle.lonlat_from_id_sql(f"{REGION_PAIR_OFFSET} + 2 * pair_id")
    lon2, lat2 = oracle.lonlat_from_id_sql(f"{REGION_PAIR_OFFSET} + 2 * pair_id + 1")
    pairs = (
        f"SELECT pair_id, {lon1} AS lon1, {lat1} AS lat1,"
        f" {lon2} AS lon2, {lat2} AS lat2"
        f" FROM (SELECT unnest(generate_series(0, {N_REGION_PAIRS - 1})) AS pair_id)"
    )
    return oracle.cell_from_region_sql(pairs, CFG)


def sql_cell_geometry() -> str:
    return oracle.cell_geometry_sql(2, CFG)


def sql_cell_geometry_r3() -> str:
    return oracle.cell_geometry_sql(3, CFG)


# ---------------------------------------------------------------------------
# Round-2 operator queries: ordering, row/col decomposition, counts,
# ranges, boundaries, interiors, containment, seeded sampling
# ---------------------------------------------------------------------------

def q_predecessor(sf_dir: str):
    """Post-order predecessor of every res-3 cell but the first
    (cell.py:378-435 via packed-index decrement)."""
    b = CFG.N_side**2
    total = 6 * b**3
    base = 6 * (b**3 - 1) // (b - 1)

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        keep = i > 0
        i = i[keep]
        u = su.suid_from_level_order_index(i + base, CFG)
        prv = su.predecessor(u, CFG)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 3)),
                "predecessor_id": pa.array(su.to_string_fixed(prv, 3)),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 8)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_predecessor() -> str:
    b = CFG.N_side**2
    total = 6 * b**3
    digits = "".join(
        f" || CAST(({{v}} // {b ** (3 - 1 - k)}) % {b} AS VARCHAR)" for k in range(3)
    )
    letter = (
        "(CASE ({v} // " + str(b**3) + ") "
        + " ".join(f"WHEN {f} THEN '{c}'" for f, c in enumerate(CELLS0))
        + " END)"
    )
    mk = lambda v: letter.format(v=v) + digits.format(v=v)
    return (
        f"SELECT {mk('i')} AS cell_id, {mk('(i - 1)')} AS predecessor_id"
        f" FROM (SELECT unnest(generate_series(1, {total - 1})) AS i)"
    )


INTERVAL_PAIRS = [("N1", "N8"), ("O23", "O45"), ("Q888", "R011"), ("S00", "S12")]


def q_interval(sf_dir: str):
    """interval(a, b) post-order enumeration (dggs.py:710-735) for a
    fixture list of SUID pairs; one row per (pair_id, seq, cell_id)."""
    pid, seq, cid = [], [], []
    for i, (a, b) in enumerate(INTERVAL_PAIRS):
        ua = int(su.from_string([a])[0])
        ub = int(su.from_string([b])[0])
        cells = su.interval_cells(ua, ub, CFG)
        for j, c in enumerate(cells):
            pid.append(i)
            seq.append(j)
            cid.append("".join(str(x) for x in su.suid_tuple(int(c))))
    return pa.table(
        {
            "pair_id": pa.array(np.array(pid, dtype=np.int64)),
            "seq": pa.array(np.array(seq, dtype=np.int64)),
            "cell_id": pa.array(cid, type=pa.string()),
        }
    )


def sql_interval() -> str:
    """Level-order-index arithmetic on the literal SUID strings —
    independent of the engine's packed codec."""
    b = CFG.N_side**2
    parts = []
    for i, (a, bb) in enumerate(INTERVAL_PAIRS):
        res = len(a) - 1
        assert len(bb) - 1 == res, "fixture pairs share a resolution"

        def loi(s: str) -> str:
            f = f"(CASE substr('{s}', 1, 1) " + " ".join(
                f"WHEN '{c}' THEN {k}" for k, c in enumerate(CELLS0)
            ) + " END)"
            v = f
            for d in range(res):
                v = f"({v} * {b} + CAST(substr('{s}', {d + 2}, 1) AS BIGINT))"
            return v

        # enumerate seq = 0 .. (loi(b) - loi(a)); rebuild suid from value
        val = f"({loi(a)} + seq)"
        letter = (
            f"(CASE ({val} // {b ** res}) "
            + " ".join(f"WHEN {k} THEN '{c}'" for k, c in enumerate(CELLS0))
            + " END)"
        )
        dstr = "".join(
            f" || CAST(({val} // {b ** (res - 1 - k)}) % {b} AS VARCHAR)"
            for k in range(res)
        )
        parts.append(
            f"SELECT CAST({i} AS BIGINT) AS pair_id, seq, {letter}{dstr} AS cell_id FROM"
            f" (SELECT unnest(generate_series(0, {loi(bb)} - {loi(a)})) AS seq)"
        )
    return " UNION ALL ".join(parts)


def q_suid_rowcol(sf_dir: str):
    """Row/column SUID decomposition of every res-3 cell
    (cell.py:269-291)."""
    b = CFG.N_side**2
    total = 6 * b**3
    base = 6 * (b**3 - 1) // (b - 1)

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        r, c = su.suid_rowcol(u, CFG)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 3)),
                "row_suid": pa.array(su.to_string_fixed(r, 3)),
                "col_suid": pa.array(su.to_string_fixed(c, 3)),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 8)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_suid_rowcol() -> str:
    b = CFG.N_side**2
    N = CFG.N_side
    total = 6 * b**3
    letter = (
        f"(CASE (i // {b ** 3}) "
        + " ".join(f"WHEN {f} THEN '{c}'" for f, c in enumerate(CELLS0))
        + " END)"
    )
    dig = lambda k: f"((i // {b ** (3 - 1 - k)}) % {b})"
    cell = letter + "".join(f" || CAST({dig(k)} AS VARCHAR)" for k in range(3))
    rows = letter + "".join(f" || CAST({dig(k)} // {N} AS VARCHAR)" for k in range(3))
    cols = letter + "".join(f" || CAST({dig(k)} % {N} AS VARCHAR)" for k in range(3))
    return (
        f"SELECT {cell} AS cell_id, {rows} AS row_suid, {cols} AS col_suid"
        f" FROM (SELECT unnest(generate_series(0, {total - 1})) AS i)"
    )


def q_num_cells(sf_dir: str):
    """num_cells closed forms (dggs.py:633-669) over a grid of
    (res_1, res_2, subcells) combinations."""
    from rhealpixdggs_py_ray.core import wrappers as W

    r1l, r2l, scl, nl = [], [], [], []
    for r1 in range(0, 11):
        for r2 in (None, r1, r1 + 1, r1 + 3):
            for sc in (False, True):
                r1l.append(r1)
                r2l.append(-1 if r2 is None else r2)
                scl.append(sc)
                nl.append(W.num_cells(r1, r2, sc, CFG))
    return pa.table(
        {
            "res_1": pa.array(np.array(r1l, dtype=np.int64)),
            "res_2": pa.array(np.array(r2l, dtype=np.int64)),
            "subcells": pa.array(scl, type=pa.bool_()),
            "n_cells": pa.array(np.array(nl, dtype=np.int64)),
        }
    )


def sql_num_cells() -> str:
    k = CFG.N_side**2
    mx = CFG.max_resolution
    r2eff_sub = f"(CASE WHEN res_2 < res_1 THEN {mx} ELSE res_2 END)"
    r2eff = "(CASE WHEN res_2 < res_1 THEN res_1 ELSE res_2 END)"
    ncell = (
        f"CASE WHEN subcells THEN"
        f" CAST((power({k}, {r2eff_sub} - res_1 + 1) - 1) / ({k} - 1) AS BIGINT)"
        f" ELSE CAST(6 * (power({k}, {r2eff} + 1) - power({k}, res_1)) / ({k} - 1) AS BIGINT) END"
    )
    return (
        "WITH g AS (SELECT r1.res_1, r2o.res_2, sc.subcells FROM"
        " (SELECT unnest(generate_series(0, 10)) AS res_1) r1,"
        " LATERAL (SELECT unnest([-1, res_1, res_1 + 1, res_1 + 3]) AS res_2) r2o,"
        " (SELECT unnest([false, true]) AS subcells) sc)"
        f" SELECT res_1, res_2, subcells, {ncell} AS n_cells FROM g"
    )


def q_xy_range(sf_dir: str):
    """Planar extent of every res-2 cell (cell.py:734-754), micros."""
    b = CFG.N_side**2
    total = 6 * b**2
    base = 6 * (b**2 - 1) // (b - 1)

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        x1, x2, y1, y2 = idx.xy_range(CFG, u)
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 2)),
                "x_min_mm": pa.array(np.floor(x1 * 1e3).astype(np.int64)),
                "x_max_mm": pa.array(np.floor(x2 * 1e3).astype(np.int64)),
                "y_min_mm": pa.array(np.floor(y1 * 1e3).astype(np.int64)),
                "y_max_mm": pa.array(np.floor(y2 * 1e3).astype(np.int64)),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_xy_range() -> str:
    ul = oracle.grid_ul_sql(2, CFG)
    w = oracle._lit(CFG.cell_width(2))
    return (
        f"SELECT cell_id,"
        f" CAST(floor(xul * 1e3) AS BIGINT) AS x_min_mm,"
        f" CAST(floor((xul + {w}) * 1e3) AS BIGINT) AS x_max_mm,"
        f" CAST(floor((yul - {w}) * 1e3) AS BIGINT) AS y_min_mm,"
        f" CAST(floor(yul * 1e3) AS BIGINT) AS y_max_mm"
        f" FROM {ul} t"
    )


# boundary(n=3) corner-relative offset plan, mirroring the reference's
# accumulated-corner arithmetic (cell.py:756-831): entries are
# (x_expr_kind, y_expr_kind) consumed by both the numpy kernel and SQL
BOUNDARY_N = 3


def q_cell_boundary(sf_dir: str):
    """Densified ellipsoidal boundary (n=3 -> 8 points) of every res-2
    cell (cell.py:756-831).  Points are emitted WITHOUT a sequence
    column: the reference rotates the ring to start at the northwest
    vertex, so the point SET is rotation-invariant and order-
    insensitively hashable; the ordered walk is pinned against the
    reference in tests/test_index.py."""
    b = CFG.N_side**2
    total = 6 * b**2
    base = 6 * (b**2 - 1) // (b - 1)

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        pts = idx.boundary(CFG, u, n=BOUNDARY_N, plane=False)
        m, npts = pts.shape[0], pts.shape[1]
        return pa.table(
            {
                "cell_id": pa.array(np.repeat(su.to_string_fixed(u, 2), npts)),
                "pt_lon_micros": pa.array(
                    np.floor(pts[:, :, 0].ravel() * 1e6).astype(np.int64)
                ),
                "pt_lat_micros": pa.array(
                    np.floor(pts[:, :, 1].ravel() * 1e6).astype(np.int64)
                ),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_cell_boundary() -> str:
    ul = oracle.grid_ul_sql(2, CFG)
    w = CFG.cell_width(2)
    delta = oracle._lit((w - 2 * 0.0) / (BOUNDARY_N - 1))
    # corner-relative point expressions (see q_cell_boundary docstring)
    pts = [
        ("xul", "yul"),
        (f"xul + {delta}", "yul"),
        ("cx1", "yul"),
        (f"cx1", f"yul - {delta}"),
        ("cx1", "cy2"),
        (f"cx1 - {delta}", "cy2"),
        (f"cx1 - 2*{delta}", "cy2"),
        (f"cx1 - 2*{delta}", f"cy2 + {delta}"),
    ]
    sel = " UNION ALL ".join(
        f"SELECT cell_id, {px} AS xm, {py} AS ym FROM corners" for px, py in pts
    )
    base = (
        f"(WITH ulv AS (SELECT cell_id, xul, yul FROM {ul} t),"
        f" corners AS (SELECT cell_id, xul, yul,"
        f"   xul + 2*{delta} AS cx1, yul - 2*{delta} AS cy2 FROM ulv)"
        f" {sel})"
    )
    inv = oracle.inverse_sql(
        f"SELECT cell_id, xm, ym FROM {base} t", CFG, id_cols=("cell_id",)
    )
    return (
        f"SELECT cell_id,"
        f" CAST(floor(lon * 1e6) AS BIGINT) AS pt_lon_micros,"
        f" CAST(floor(lat * 1e6) AS BIGINT) AS pt_lat_micros"
        f" FROM {inv} t"
    )


INTERIOR_N = 3


def q_cell_interior(sf_dir: str):
    """n x n ellipsoidal interior sample grid of every res-1 cell
    (cell.py:833-883), row-major indices explicit."""
    b = CFG.N_side**2
    total = 6 * b
    base = 6

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        g = idx.interior_grid(CFG, u, n=INTERIOR_N, plane=False)
        m, n = g.shape[0], g.shape[1]
        gi = np.tile(np.repeat(np.arange(n), n), m)
        gj = np.tile(np.tile(np.arange(n), n), m)
        return pa.table(
            {
                "cell_id": pa.array(np.repeat(su.to_string_fixed(u, 1), n * n)),
                "gi": pa.array(gi.astype(np.int64)),
                "gj": pa.array(gj.astype(np.int64)),
                "pt_lon_micros": pa.array(
                    np.floor(g[:, :, :, 0].reshape(m, -1).ravel() * 1e6).astype(np.int64)
                ),
                "pt_lat_micros": pa.array(
                    np.floor(g[:, :, :, 1].reshape(m, -1).ravel() * 1e6).astype(np.int64)
                ),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 2)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_cell_interior() -> str:
    ul = oracle.grid_ul_sql(1, CFG)
    w = CFG.cell_width(1)
    eps = oracle._lit(1e-6)
    delta = oracle._lit((w - 2 * 1e-6) / (INTERIOR_N - 1))
    base = (
        f"(WITH ulv AS (SELECT cell_id, xul, yul FROM {ul} t),"
        f" ij AS (SELECT gi.gi, gj.gj FROM"
        f"   (SELECT unnest(generate_series(0, {INTERIOR_N - 1})) AS gi) gi,"
        f"   (SELECT unnest(generate_series(0, {INTERIOR_N - 1})) AS gj) gj)"
        f" SELECT cell_id, gi, gj,"
        f"  ((xul + {eps}) + {delta}*gj) AS xm,"
        f"  ((yul - {eps}) - {delta}*gi) AS ym"
        f" FROM ulv, ij)"
    )
    inv = oracle.inverse_sql(
        f"SELECT cell_id, gi, gj, xm, ym FROM {base} t", CFG,
        id_cols=("cell_id", "gi", "gj"),
    )
    return (
        f"SELECT cell_id, gi, gj,"
        f" CAST(floor(lon * 1e6) AS BIGINT) AS pt_lon_micros,"
        f" CAST(floor(lat * 1e6) AS BIGINT) AS pt_lat_micros"
        f" FROM {inv} t"
    )


CONTAINS_RES = 3
CONTAINS_N = 2000


def q_cell_contains(sf_dir: str):
    """Point-in-cell predicate (cell.py:885-907): does event i's point
    fall in event (i+1)'s res-3 cell?  Exercises idx.contains on a
    nontrivial truth distribution (in_own is the always-true check)."""
    ids = np.arange(CONTAINS_N, dtype=np.int64)
    lon, lat = oracle.lonlat_from_id(ids)
    own = idx.cell_from_point(CFG, CONTAINS_RES, lon, lat, plane=False)
    lon2, lat2 = oracle.lonlat_from_id(ids + 1)
    nxt = idx.cell_from_point(CFG, CONTAINS_RES, lon2, lat2, plane=False)
    in_own = idx.contains(CFG, own, lon, lat, plane=False)
    in_next = idx.contains(CFG, nxt, lon, lat, plane=False)
    return pa.table(
        {
            "event_id": pa.array(ids),
            "cell_id": pa.array(su.to_string_fixed(own, CONTAINS_RES)),
            "in_own": pa.array(in_own),
            "in_next": pa.array(in_next),
        }
    )


def sql_cell_contains() -> str:
    ids = f"(SELECT unnest(generate_series(0, {CONTAINS_N - 1})) AS event_id)"
    own = oracle.cell_from_point_sql(
        f"SELECT event_id, {oracle.lonlat_from_id_sql('event_id')[0]} AS lon,"
        f" {oracle.lonlat_from_id_sql('event_id')[1]} AS lat FROM {ids}",
        CONTAINS_RES, CFG, id_cols=("event_id",),
    )
    nxt = oracle.cell_from_point_sql(
        f"SELECT event_id, {oracle.lonlat_from_id_sql('(event_id + 1)')[0]} AS lon,"
        f" {oracle.lonlat_from_id_sql('(event_id + 1)')[1]} AS lat FROM {ids}",
        CONTAINS_RES, CFG, id_cols=("event_id",),
    )
    return (
        f"SELECT a.event_id, a.cell_id, TRUE AS in_own,"
        f" (a.cell_id = b.cell_id) AS in_next"
        f" FROM {own} a JOIN {nxt} b ON a.event_id = b.event_id"
    )


OVERLAP_REGION = ["N4", "P12", "Q", "S888"]


def q_cell_overlaps(sf_dir: str):
    """SUID-prefix overlap counts of every res-3 cell against a fixture
    region list (cell.py:959-984)."""
    b = CFG.N_side**2
    total = 6 * b**3
    base = 6 * (b**3 - 1) // (b - 1)
    region = su.from_string(OVERLAP_REGION)

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        n_ov = np.zeros(len(u), dtype=np.int64)
        for r in region:
            n_ov += su.overlaps(u, np.full(u.shape, r, dtype=np.uint64))
        return pa.table(
            {
                "cell_id": pa.array(su.to_string_fixed(u, 3)),
                "n_overlapping": pa.array(n_ov),
                "any_overlap": pa.array(n_ov > 0),
            }
        )

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 8)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_cell_overlaps() -> str:
    grid = oracle.grid_sql(3, CFG)
    terms = []
    for r in OVERLAP_REGION:
        L = len(r)
        if L <= 4:
            terms.append(
                f"(CASE WHEN substr(cell_id, 1, {L}) = '{r}'"
                f" OR substr('{r}', 1, length(cell_id)) = cell_id"
                f" THEN 1 ELSE 0 END)"
            )
    n_ov = "(" + " + ".join(terms) + ")"
    return (
        f"SELECT cell_id, CAST({n_ov} AS BIGINT) AS n_overlapping,"
        f" {n_ov} > 0 AS any_overlap FROM ({grid}) g"
    )


RANDOM_N = 5000
RANDOM_MAX_RES = 10


def q_random_cells(sf_dir: str):
    """Seeded random-cell sampler (deterministic stand-in for
    dggs.random_cell, dggs.py:1352-1370): splitmix64 bit fields."""
    from rhealpixdggs_py_ray.core import wrappers as W

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        cells = [W.seeded_random_cell(int(x), RANDOM_MAX_RES, CFG) for x in i]
        return pa.table(
            {
                "i": pa.array(i, type=pa.int64()),
                "cell_id": pa.array(cells, type=pa.string()),
            }
        )

    return ray.data.range(RANDOM_N, override_num_blocks=sizing.range_blocks(RANDOM_N, 4)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_random_cells() -> str:
    b = CFG.N_side**2
    sm = oracle.splitmix64_sql_ctes(
        f"SELECT unnest(generate_series(0, {RANDOM_N - 1})) AS i", "i", "i", "h"
    )
    letter = (
        "(CASE CAST((h >> 4) % 6 AS BIGINT) "
        + " ".join(f"WHEN {k} THEN '{c}'" for k, c in enumerate(CELLS0))
        + " END)"
    )
    digs = "".join(
        f" || (CASE WHEN CAST(h % {RANDOM_MAX_RES + 1} AS BIGINT) >= {j}"
        f" THEN CAST(CAST(((h >> {8 + 5 * j}) & 31) % {b} AS BIGINT) AS VARCHAR)"
        f" ELSE '' END)"
        for j in range(1, RANDOM_MAX_RES + 1)
    )
    return f"SELECT i, {letter}{digs} AS cell_id FROM {sm} t"


def q_random_points(sf_dir: str):
    """Seeded uniform planar points (deterministic stand-in for
    dggs.random_point, dggs.py:1333-1350) + their res-5 planar cells."""
    from rhealpixdggs_py_ray.core import wrappers as W

    def fn(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        xy = np.array([W.seeded_random_point(int(x), CFG) for x in i])
        u = idx.cell_from_point(CFG, 5, xy[:, 0], xy[:, 1], plane=True)
        return pa.table(
            {
                "i": pa.array(i, type=pa.int64()),
                "x_mm": pa.array(np.floor(xy[:, 0] * 1e3).astype(np.int64)),
                "y_mm": pa.array(np.floor(xy[:, 1] * 1e3).astype(np.int64)),
                "cell_id": pa.array(su.to_string_fixed(u, 5)),
            }
        )

    return ray.data.range(RANDOM_N, override_num_blocks=sizing.range_blocks(RANDOM_N, 4)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_random_points() -> str:
    sm1 = oracle.splitmix64_sql_ctes(
        f"SELECT unnest(generate_series(0, {RANDOM_N - 1})) AS i", "i", "i", "h",
        prefix="sma",
    )
    sm2 = oracle.splitmix64_sql_ctes(
        f"SELECT i, h, i + 10000019 AS i2 FROM {sm1} t", "i, h", "i2", "h2",
        prefix="smb",
    )
    w0 = oracle._lit(CFG.cell_width(0))
    two53 = oracle._lit(float(1 << 53))
    ulx = "(CASE CAST(h % 6 AS BIGINT) " + " ".join(
        f"WHEN {k} THEN {oracle._lit(CFG.ul_vertex[k, 0])}" for k in range(6)
    ) + " END)"
    uly = "(CASE CAST(h % 6 AS BIGINT) " + " ".join(
        f"WHEN {k} THEN {oracle._lit(CFG.ul_vertex[k, 1])}" for k in range(6)
    ) + " END)"
    pts = (
        f"(SELECT i,"
        f" ({ulx} + (CAST(h >> 11 AS DOUBLE) / {two53}) * {w0}) AS xm,"
        f" ({uly} - (CAST(h2 >> 11 AS DOUBLE) / {two53}) * {w0}) AS ym"
        f" FROM {sm2} t)"
    )
    cells = oracle.planar_cell_sql(
        f"SELECT i, xm, ym FROM {pts} t", 5, CFG, id_cols=("i",),
        extra_cols=("xm", "ym"),
    )
    return (
        f"SELECT i, CAST(floor(xm * 1e3) AS BIGINT) AS x_mm,"
        f" CAST(floor(ym * 1e3) AS BIGINT) AS y_mm, cell_id"
        f" FROM {cells} t"
    )


ZONE_POLY = [
    (18.0, 14.0), (24.0, 12.0), (27.0, 6.0), (24.0, 1.0),
    (19.0, -2.0), (14.0, 2.0), (12.0, 8.0), (14.0, 12.0),
]
ZONE_RES = 6


def q_cell_zone(sf_dir: str):
    """CellZoneFromPoly quadtree polyfill with containment kinds
    (conversion.py:40-111) over a fixture polygon; the reference's
    frozen catchment corpus (254 res-9 cells) is pinned in
    tests/test_conversion.py.  The quadtree descent is reproduced
    relationally in SQL (oracle.cell_zone_sql): value-hash checked."""
    from rhealpixdggs_py_ray.core import conversion as cz

    zone = cz.cell_zone_from_poly(geo.Polygon(ZONE_POLY), ZONE_RES, CFG)
    return pa.table(
        {
            "seq": pa.array(np.arange(len(zone), dtype=np.int64)),
            "cell_id": pa.array(
                ["".join(str(x) for x in su.suid_tuple(int(u))) for u, _ in zone],
                type=pa.string(),
            ),
            "kind": pa.array([k for _, k in zone], type=pa.string()),
        }
    )


def sql_cell_zone() -> str:
    return oracle.cell_zone_sql(ZONE_POLY, ZONE_RES, CFG)


# ---------------------------------------------------------------------------
# Image-query oracles: DuckDB reads the SAME deterministic fixture
# parquet and recomputes faces from phash plus channel means from the
# GENERATIVE pixel formula (fixtures.gen_pixels) — so the oracle
# independently verifies the Ray side's decode -> resize -> feature
# chain (any decode bug shifts the Ray means off the closed form).
# Integer pixel sums / 2^10 divisions are order-independent floats, so
# the comparison is bit-exact.
# ---------------------------------------------------------------------------

IMG_N = 2000
IMG_DIR = f"/tmp/graft_images_{IMG_N}"


def _image_src_sql() -> str:
    from rhealpixdggs_py_ray.fixtures import write_images_table

    write_images_table(IMG_DIR, IMG_N)  # idempotent; driver may run SQL first
    M = "18446744073709551616"
    u = f"CAST(((CAST(phash AS HUGEINT) % {M}) + {M}) % {M} AS UBIGINT)"
    r2d = oracle._lit(180.0 / np.pi)
    scale = oracle._lit(84.0 / 90.0)
    lon = f"(-180.0 + 360.0 * (CAST((u >> 32) & 4294967295 AS DOUBLE) / 4294967296.0))"
    lat = f"((asin(2.0 * (CAST(u & 4294967295 AS DOUBLE) / 4294967296.0) - 1.0) * {r2d}) * {scale})"
    return (
        f"(SELECT image_id, w, h, phash, u, {lon} AS lon, {lat} AS lat FROM"
        f" (SELECT image_id, w, h, phash, {u} AS u"
        f"  FROM read_parquet('{IMG_DIR}/*.parquet')) q)"
    )


def sql_image_pipeline() -> str:
    src = _image_src_sql()
    faced = oracle.cell_from_point_sql(
        f"SELECT image_id, lon, lat FROM {src} t", 0, CFG, id_cols=("image_id",)
    )
    # n_ok == n is the constructed-fixture invariant (lossless payloads
    # + exact captions); the Ray side PROVES it by decoding, the oracle
    # pins the distribution
    return (
        f"SELECT cell_id AS face, COUNT(*) AS n, COUNT(*) AS n_ok"
        f" FROM {faced} t GROUP BY cell_id"
    )


def sql_image_features() -> str:
    src = _image_src_sql()
    faced = oracle.cell_from_point_sql(
        f"SELECT image_id, w, h, u, lon, lat FROM {src} t", 0, CFG,
        id_cols=("image_id",), extra_cols=("w", "h", "u"),
    )
    # channel-0 mean of the 32x32 nearest-resized generative pattern:
    # pix(y, x, 0) = (x*3 + y*5 + (phash & 255)) % 256, sampled at
    # yi = gi*h//32, xi = gj*w//32 (ops/multimodal.resize_nearest)
    val = (
        "(((CAST(gj AS BIGINT) * w) // 32) * 3"
        " + ((CAST(gi AS BIGINT) * h) // 32) * 5"
        " + CAST(u & 255 AS BIGINT)) % 256"
    )
    return (
        f"WITH f AS MATERIALIZED (SELECT image_id, w, h, u, cell_id FROM {faced} t),"
        f" g AS (SELECT gi.gi, gj.gj FROM"
        f"  (SELECT unnest(generate_series(0, 31)) AS gi) gi,"
        f"  (SELECT unnest(generate_series(0, 31)) AS gj) gj),"
        f" mm AS (SELECT image_id, cell_id,"
        f"   CAST(floor((SUM({val}) / 1024.0) * 100) AS BIGINT) AS mean_r_c"
        f"  FROM f, g GROUP BY image_id, cell_id)"
        f" SELECT cell_id AS face, COUNT(*) AS n,"
        f" CAST(SUM(mean_r_c) AS BIGINT) AS sum_mean_r_c"
        f" FROM mm GROUP BY cell_id"
    )


PATCH_PX = 16


def q_image_patches(sf_dir: str):
    """ViT-style patchification: decode -> non-overlapping 16x16 patch
    grid -> per-patch per-channel integer pixel sums (the patch-
    embedding precursor; one row per (image, patch_y, patch_x, chan)).
    Actor-pool decode; payload bytes never leave the decode stage —
    only the small (id, py, px, c, s) rows do.  The oracle replays the
    closed-form fixture pixel rule over every patch lattice with
    chained lateral generate_series (~10M pixel terms in DuckDB)."""
    from rhealpixdggs_py_ray.fixtures import write_images_table

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(
        IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8)
    )

    class Patchify:
        def __init__(self, patch: int = PATCH_PX):
            self.patch = patch

        def __call__(self, batch: pa.Table) -> pa.Table:
            from rhealpixdggs_py_ray.fixtures import decode_image

            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy()
            hs = batch["h"].to_numpy()
            ids = batch["image_id"].to_pylist()
            P = self.patch
            cid, cpy, cpx, cc, cs = [], [], [], [], []
            for k in range(len(blobs)):
                w, h = int(ws[k]), int(hs[k])
                pix = decode_image(blobs[k], fmts[k], w, h)
                gy, gx = h // P, w // P
                v = (
                    pix[: gy * P, : gx * P, :]
                    .reshape(gy, P, gx, P, 3)
                    .sum(axis=(1, 3), dtype=np.int64)
                )  # (gy, gx, 3)
                py, px, c = np.indices((gy, gx, 3))
                cid.append(np.repeat(ids[k], v.size))
                cpy.append(py.ravel())
                cpx.append(px.ravel())
                cc.append(c.ravel())
                cs.append(v.ravel())
            return pa.table({
                "image_id": pa.array(np.concatenate(cid), type=pa.string()),
                "py": pa.array(np.concatenate(cpy).astype(np.int64)),
                "px": pa.array(np.concatenate(cpx).astype(np.int64)),
                "c": pa.array(np.concatenate(cc).astype(np.int64)),
                "s": pa.array(np.concatenate(cs)),
            })

    return ds.map_batches(
        Patchify, batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )


def sql_image_patches() -> str:
    src = _image_src_sql()
    P = PATCH_PX
    return f"""
WITH src AS MATERIALIZED (SELECT image_id, w, h, u FROM {src} q2),
p1 AS MATERIALIZED (
  SELECT image_id, w, u, t.py FROM src,
    unnest(generate_series(0, h // {P} - 1)) AS t(py)),
p2 AS MATERIALIZED (
  SELECT image_id, u, py, t.px FROM p1,
    unnest(generate_series(0, w // {P} - 1)) AS t(px)),
p3 AS MATERIALIZED (
  SELECT image_id, py, px, t.c,
    CAST((u >> CAST(8 * t.c AS INTEGER)) & 255 AS BIGINT) AS chan
  FROM p2, unnest(generate_series(0, 2)) AS t(c)),
p4 AS MATERIALIZED (
  SELECT image_id, py, px, c, chan, t.dy FROM p3,
    unnest(generate_series(0, {P - 1})) AS t(dy))
SELECT image_id, py, px, c,
  CAST(SUM(((px * {P} + t.dx) * 3 + (py * {P} + dy) * 5 + c * 7 + chan)
       % 256) AS BIGINT) AS s
FROM p4, unnest(generate_series(0, {P - 1})) AS t(dx)
GROUP BY image_id, py, px, c
"""


NEARDUP_MAX_HAMMING = 6
_IMG_NEARDUP_PAIRS: dict[str, "ray.data.Dataset"] = {}


def q_image_neardup(sf_dir: str):
    """Image near-dup detection over the fixture images table: decode
    -> 64-bit perceptual hash -> 4x16-bit band LSH -> candidate pairs
    -> exact Hamming verify (ops/multimodal.image_near_dup_pairs; the
    image axis of the graft).  Payload bytes never ride a shuffle —
    only (id, phash64) rows do.  The oracle recomputes phash64
    closed-form from the generative pixel formula (the same tie-exact
    integer threshold the kernel uses) and replays the identical
    band-LSH candidate rule in SQL, so hashes, candidate recall and
    Hamming distances are all value-hash checked."""
    import pyarrow.compute as pc

    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.ops.multimodal import image_near_dup_pairs

    # Materialized once per process: four consumers (image_neardup,
    # image_clusters, triangle_count, multimodal_neardup) would each
    # re-execute the decode->phash->LSH->verify lineage; the verified
    # pair set is tiny (near-dup pairs only).
    if IMG_DIR not in _IMG_NEARDUP_PAIRS:
        write_images_table(IMG_DIR, IMG_N)
        ds = ray.data.read_parquet(
            IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8)
        )

        def add_idx(batch: pa.Table) -> pa.Table:
            ii = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 3, 15), pa.int64())
            return batch.append_column("img_idx", ii)

        ds = ds.map_batches(add_idx, batch_format="pyarrow", zero_copy_batch=True)
        # carry (w, h) through the verify exchange so image_retention
        # (loser = fewer pixels) reads the SAME cached pair set instead
        # of paying a second decode->phash->LSH pass
        _IMG_NEARDUP_PAIRS[IMG_DIR] = image_near_dup_pairs(
            ds, max_hamming=NEARDUP_MAX_HAMMING, extra_val_cols=("w", "h")
        ).materialize()
    return _IMG_NEARDUP_PAIRS[IMG_DIR].select_columns(["a", "b", "hamming"])


def sql_image_neardup() -> str:
    # phash64 closed form: the 32x32 nearest-resize of the generative
    # pattern sampled at the 8x8 grid collapses to pixel
    # (yi, xi) = ((a*h)//8, (b*w)//8); the 3-channel integer sum s is
    # thresholded tie-exactly as 64*s > sum(s) (exactly the kernel's
    # g8*64.0 > g8.sum() — all quantities are integers < 2^53).
    src = _image_src_sql()
    val = (
        "((((b.b * w) // 8) * 3 + ((a.a * h) // 8) * 5 + c.c * 7"
        " + CAST((u >> CAST(8 * c.c AS UBIGINT)) & 255 AS BIGINT)) % 256)"
    )
    return (
        f"WITH src AS MATERIALIZED (SELECT CAST(substr(image_id, 4) AS BIGINT)"
        f"  AS idx, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, u"
        f"  FROM {src} tt),"
        f" samp AS MATERIALIZED (SELECT idx, a.a, b.b, SUM({val}) AS s"
        f"  FROM src,"
        f"   (SELECT unnest(generate_series(0, 7)) AS a) a,"
        f"   (SELECT unnest(generate_series(0, 7)) AS b) b,"
        f"   (SELECT unnest(generate_series(0, 2)) AS c) c"
        f"  GROUP BY idx, a.a, b.b),"
        f" ph AS MATERIALIZED (SELECT idx,"
        f"  CAST(SUM(CASE WHEN 64 * s > tot THEN CAST(1 AS HUGEINT)"
        f"   << CAST(a * 8 + b AS INTEGER) ELSE CAST(0 AS HUGEINT) END)"
        f"   AS UBIGINT) AS ph64"
        f"  FROM (SELECT idx, a, b, s, SUM(s) OVER (PARTITION BY idx) AS tot"
        f"        FROM samp) q GROUP BY idx),"
        f" bands AS MATERIALIZED (SELECT idx,"
        f"  t.t AS t, CAST((ph64 >> CAST(16 * t.t AS UBIGINT)) & 65535 AS BIGINT)"
        f"   AS bkey"
        f"  FROM ph, (SELECT unnest(generate_series(0, 3)) AS t) t),"
        f" pairs AS (SELECT DISTINCT l.idx AS a, r.idx AS b"
        f"  FROM bands l JOIN bands r"
        f"  ON l.t = r.t AND l.bkey = r.bkey AND l.idx < r.idx)"
        f" SELECT p.a, p.b, CAST(bit_count(xor(x.ph64, y.ph64)) AS BIGINT)"
        f"  AS hamming"
        f" FROM pairs p JOIN ph x ON x.idx = p.a JOIN ph y ON y.idx = p.b"
        f" WHERE bit_count(xor(x.ph64, y.ph64)) <= {NEARDUP_MAX_HAMMING}"
    )


def q_multimodal_neardup(sf_dir: str):
    """Joint image+caption near-dup: phash-verified image pairs
    (image_near_dup_pairs) annotated with exact caption token-set
    jaccard — the cross-modal dedup decision a web-scale image-text
    curation pipeline makes.  Caption attach is ONE fused bucketed
    exchange (pack mode); the image payload and raw captions never
    ride a pair-keyed shuffle."""
    import pyarrow.compute as pc

    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.ops.dedup import (
        _attach_pair_sides_fused,
        _pair_sides_pivot,
    )

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8))

    def add_idx(batch: pa.Table) -> pa.Table:
        ii = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 3, 15), pa.int64())
        return batch.append_column("img_idx", ii)

    ds = ds.map_batches(add_idx, batch_format="pyarrow", zero_copy_batch=True)
    pairs = q_image_neardup(sf_dir)  # materialized + shared (cache above)

    def cap_kv(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["img_idx"],
            "caption": batch["caption"],
        })

    caps = ds.map_batches(cap_kv, batch_format="pyarrow", zero_copy_batch=True)

    def kv_pack(sub: pd.DataFrame) -> dict:
        sets = [sorted(set(c.split())) for c in sub["caption"].tolist()]
        return {
            "capset": ["\n".join(s) for s in sets],
            "ncap": np.array([len(s) for s in sets], dtype=np.int64),
        }

    att = _attach_pair_sides_fused(
        pairs,
        caps,
        pair_sums=[("hamming", "hamming")],
        val_cols=[("capset", pa.string()), ("ncap", pa.int64())],
        kv_mode="pack",
        kv_pack=kv_pack,
        kv_in_cols=[("caption", pa.string())],
    )

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        # vectorized |A ∩ B|: within-side token lists are unique, so a
        # (pair, token) key occurring twice across the two sides is an
        # intersection hit — factorize tokens once (np.unique), pack
        # (pair, code) into u64, sort, count adjacent-equal per pair
        if len(m):
            arr_a = pc.split_pattern(pa.array(m["capset_a"], type=pa.string()), "\n")
            arr_b = pc.split_pattern(pa.array(m["capset_b"], type=pa.string()), "\n")
            idx_a = np.repeat(np.arange(len(m), dtype=np.int64),
                              pc.list_value_length(arr_a).to_numpy())
            idx_b = np.repeat(np.arange(len(m), dtype=np.int64),
                              pc.list_value_length(arr_b).to_numpy())
            tokens = np.concatenate([
                pc.list_flatten(arr_a).to_numpy(zero_copy_only=False),
                pc.list_flatten(arr_b).to_numpy(zero_copy_only=False),
            ])
            idxs = np.concatenate([idx_a, idx_b])
            vocab, codes = np.unique(tokens, return_inverse=True)
            key = (idxs.astype(np.uint64) * np.uint64(len(vocab) + 1)
                   + codes.astype(np.uint64))
            order = np.argsort(key)
            k = key[order]
            dup = k[1:] == k[:-1]
            ni = np.bincount(idxs[order][1:][dup], minlength=len(m)).astype(np.int64)
        else:
            ni = np.zeros(0, dtype=np.int64)
        na = m["ncap_a"].to_numpy().astype(np.int64)
        nb = m["ncap_b"].to_numpy().astype(np.int64)
        j = ni.astype(np.float64) / (na + nb - ni).astype(np.float64)
        return pd.DataFrame({
            "a": m["a"].to_numpy(),
            "b": m["b"].to_numpy(),
            "hamming": m["hamming_a"].to_numpy().astype(np.int64),
            "jac_micros": np.floor(j * 1000000.0).astype(np.int64),
        })

    return _pair_sides_pivot(att, verify, ["capset", "ncap", "hamming"])


def sql_multimodal_neardup() -> str:
    # caption reconstruction mirrors fixtures.py:138 exactly
    cap = (
        "'caption ' || CAST(idx AS VARCHAR) || ': cell of img'"
        " || lpad(CAST(idx AS VARCHAR), 12, '0')"
    )
    return f"""
WITH pairs AS MATERIALIZED (
{sql_image_neardup()}
),
ids AS MATERIALIZED (
  SELECT a AS idx FROM pairs UNION SELECT b FROM pairs
),
tok AS MATERIALIZED (
  SELECT DISTINCT idx, unnest(regexp_split_to_array({cap}, ' ')) AS t
  FROM ids
),
sizes AS MATERIALIZED (
  SELECT idx, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY idx
),
inter AS MATERIALIZED (
  SELECT p.a, p.b, CAST(COUNT(*) AS BIGINT) AS ni
  FROM pairs p
  JOIN tok ta ON ta.idx = p.a
  JOIN tok tb ON tb.idx = p.b AND tb.t = ta.t
  GROUP BY p.a, p.b
)
SELECT p.a, p.b, p.hamming,
  CAST(floor(CAST(COALESCE(i.ni, 0) AS DOUBLE)
    / (sa.n + sb.n - COALESCE(i.ni, 0)) * 1000000.0)
    AS BIGINT) AS jac_micros
FROM pairs p
LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
JOIN sizes sa ON sa.idx = p.a
JOIN sizes sb ON sb.idx = p.b
"""


# ---------------------------------------------------------------------------
# Round 2c: split assignment, pivot, set ops, JSON source
# ---------------------------------------------------------------------------

def q_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment: every doc hashes
    to a split via md5(doc_id) % 100 (<90 train, <95 val, else test) —
    the standard leakage-free dataset split (content-independent, so
    re-crawls land in the same split).  Pure map over the corpus;
    per-batch (split, lang) np.unique partials; one tiny exchange."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    names = np.array(["test", "train", "val"], dtype=object)  # sorted

    def partial(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (md5_u64(str(int(d))) for d in did), dtype=np.uint64, count=len(did)
        ) % np.uint64(100)
        split = np.where(h < 90, 1, np.where(h < 95, 2, 0))  # idx into names
        lang_uniq, lang_inv = np.unique(lang, return_inverse=True)
        key = split * len(lang_uniq) + lang_inv
        key_uniq, key_inv = np.unique(key, return_inverse=True)
        n = np.zeros(len(key_uniq), dtype=np.int64)
        np.add.at(n, key_inv, 1)
        chars = np.zeros(len(key_uniq), dtype=np.int64)
        np.add.at(chars, key_inv, nch)
        return pa.table({
            "split": pa.array(names[key_uniq // len(lang_uniq)], type=pa.string()),
            "lang": pa.array(lang_uniq[key_uniq % len(lang_uniq)]),
            "n_docs": pa.array(n),
            "sum_chars": pa.array(chars),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["split", "lang"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_chars", alias_name="sum_chars"),
    )


def sql_split_assign() -> str:
    return """
SELECT CASE
    WHEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 100 < 90
      THEN 'train'
    WHEN CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % 100 < 95
      THEN 'val'
    ELSE 'test' END AS split,
  lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1, 2
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events(sf_dir: str):
    """Pivot / wide aggregation: one row per day, one count column per
    event_type (the columnar report shape).  The pivot happens on the
    MAP side — each batch emits already-wide per-day partials (5 known
    type columns), so the exchange carries ~days × 6 ints, never a
    (day, type) long table."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        day = ts.astype(np.int64) // 86_400_000_000
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        day_uniq, day_inv = np.unique(day, return_inverse=True)
        cols = {"day": pa.array(day_uniq)}
        for t in PIVOT_TYPES:
            n = np.zeros(len(day_uniq), dtype=np.int64)
            np.add.at(n, day_inv[et == t], 1)
            cols[f"n_{t}"] = pa.array(n)
        tot = np.zeros(len(day_uniq), dtype=np.int64)
        np.add.at(tot, day_inv, 1)
        cols["n_total"] = pa.array(tot)
        return pa.table(cols)

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in PIVOT_TYPES]
    aggs.append(Sum("n_total", alias_name="n_total"))
    return p.groupby("day").aggregate(*aggs)


def sql_pivot_events() -> str:
    cols = ",\n  ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in PIVOT_TYPES
    )
    return f"""
SELECT epoch_us(ts) // 86400000000 AS day,
  {cols},
  CAST(COUNT(*) AS BIGINT) AS n_total
FROM events GROUP BY 1
"""


def q_user_setops(sf_dir: str):
    """Distributed set algebra between two key sets (event users vs
    order customers): INTERSECT / EXCEPT / UNION cardinalities in one
    pass.  Per-batch distinct partials with a side bitmask -> ONE
    h(key) bucket exchange (each key lands in exactly one bucket, so
    per-bucket bit-OR is globally exact) -> 1-row fold."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ev = _read(sf_dir, "events", columns=["user_id"], blocks=4)
    od = _read(sf_dir, "orders", columns=["o_custkey"], blocks=4)

    def side(col: str, bit: int):
        def partial(batch: pa.Table) -> pa.Table:
            k = np.unique(batch[col].to_numpy(zero_copy_only=False))
            return pa.table({
                "bucket": pa.array(hash_bucket_u64(k, n_buckets)),
                "key": pa.array(k.astype(np.int64)),
                "sides": pa.array(np.full(len(k), bit, dtype=np.int64)),
            })
        return partial

    both = ev.map_batches(
        side("user_id", 1), batch_format="pyarrow", zero_copy_batch=True
    ).union(od.map_batches(
        side("o_custkey", 2), batch_format="pyarrow", zero_copy_batch=True
    ))

    def per_bucket(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        sides = g["sides"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(key, return_inverse=True)
        mask = np.zeros(len(uniq), dtype=np.int64)
        np.bitwise_or.at(mask, inv, sides)
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "n_events_only": pa.array([int(np.count_nonzero(mask == 1))], type=pa.int64()),
            "n_orders_only": pa.array([int(np.count_nonzero(mask == 2))], type=pa.int64()),
            "n_both": pa.array([int(np.count_nonzero(mask == 3))], type=pa.int64()),
        })

    b = both.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        eo = int(pc.sum(g["n_events_only"]).as_py())
        oo = int(pc.sum(g["n_orders_only"]).as_py())
        nb = int(pc.sum(g["n_both"]).as_py())
        return pa.table({
            "n_event_users": pa.array([eo + nb], type=pa.int64()),
            "n_order_custs": pa.array([oo + nb], type=pa.int64()),
            "n_both": pa.array([nb], type=pa.int64()),
            "n_events_only": pa.array([eo], type=pa.int64()),
            "n_orders_only": pa.array([oo], type=pa.int64()),
            "n_union": pa.array([eo + oo + nb], type=pa.int64()),
        })

    return b.groupby("g").map_groups(resolve, batch_format="pyarrow")


def sql_user_setops() -> str:
    return """
WITH e AS MATERIALIZED (SELECT DISTINCT user_id AS k FROM events),
o AS MATERIALIZED (SELECT DISTINCT o_custkey AS k FROM orders),
b AS MATERIALIZED (SELECT k FROM e INTERSECT SELECT k FROM o),
eo AS MATERIALIZED (SELECT k FROM e EXCEPT SELECT k FROM o),
oo AS MATERIALIZED (SELECT k FROM o EXCEPT SELECT k FROM e)
SELECT
  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_event_users,
  CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_order_custs,
  CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_both,
  CAST((SELECT COUNT(*) FROM eo) AS BIGINT) AS n_events_only,
  CAST((SELECT COUNT(*) FROM oo) AS BIGINT) AS n_orders_only,
  CAST((SELECT COUNT(*) FROM (SELECT k FROM e UNION SELECT k FROM o)) AS BIGINT)
    AS n_union
"""


JSON_FIXTURE_N = 48_000
JSON_FIXTURE_PATH = f"/tmp/graft_json_fixture_{JSON_FIXTURE_N}.jsonl"


def _write_json_fixture() -> str:
    """Deterministic JSON-lines fixture (integer payloads only);
    idempotent, safe whichever side runs first."""
    import os

    if os.path.exists(JSON_FIXTURE_PATH):
        return JSON_FIXTURE_PATH
    i = np.arange(JSON_FIXTURE_N, dtype=np.int64)
    kind = i % 4
    val = (i * 6364136223846793005) % 1_000_000
    lines = [
        '{"rec_id": %d, "kind": "k%d", "val": %d}' % (int(a), int(b), int(c))
        for a, b, c in zip(i, kind, val)
    ]
    tmp = JSON_FIXTURE_PATH + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, JSON_FIXTURE_PATH)
    return JSON_FIXTURE_PATH


def q_json_source(sf_dir: str):
    """Third source format: ray.data.read_json over a deterministic
    JSON-lines fixture, aggregated per kind; the oracle reads the
    identical file with DuckDB read_json_auto, so the parse-aggregate
    loop is value-hash verified end-to-end (csv_source's sibling)."""
    path = _write_json_fixture()
    ds = ray.data.read_json(path)
    return ds.groupby("kind").aggregate(
        Count(alias_name="n"),
        Sum("val", alias_name="sum_val"),
        Min("rec_id", alias_name="min_rec"),
        Max("rec_id", alias_name="max_rec"),
    )


def sql_json_source() -> str:
    path = _write_json_fixture()
    return f"""
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(val) AS BIGINT) AS sum_val,
  CAST(MIN(rec_id) AS BIGINT) AS min_rec,
  CAST(MAX(rec_id) AS BIGINT) AS max_rec
FROM read_json_auto('{path}')
GROUP BY kind
"""


# ---------------------------------------------------------------------------
# Round 2c: sequence packing (distributed prefix scan) + focal statistics
# ---------------------------------------------------------------------------

PACK_CTX = 384        # tokens per packed training context window
PACK_BUCKET_W = 128   # doc_id range-bucket width (order-preserving)


def q_pack_sequences(sf_dir: str):
    """Sequence packing for LLM training: concatenate the corpus in
    doc_id order and split into fixed PACK_CTX-token context windows;
    emit each doc's global token offset and the pack range it spans.

    This is the canonical DISTRIBUTED PREFIX SCAN: (1) narrow
    (doc_id, n_tokens) map, materialized once; (2) per-range-bucket
    token totals folded on the driver (one tiny row per bucket per
    block — at 100 TB this fold is a tree reduce over ~1e4 bucket
    partials, never the corpus); (3) exclusive prefix over bucket
    totals broadcast via ray.put; (4) ONE order-preserving range
    exchange where each bucket cumsums locally on top of its broadcast
    base.  No global sort, no O(N) driver state."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tok(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = np.array(
            [len(t.split()) for t in batch["text"].to_pylist()], dtype=np.int64
        )
        return pa.table({
            "doc_id": pa.array(did),
            "n_tokens": pa.array(n),
            "bucket": pa.array(did // PACK_BUCKET_W),
        })

    toks = ds.map_batches(
        tok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # shared by the totals pass and the scan pass

    def bucket_sums(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        s = np.zeros(len(ub), dtype=np.int64)
        np.add.at(s, inv, n)
        return pa.table({"bucket": pa.array(ub), "s": pa.array(s)})

    totals: dict[int, int] = {}
    for bt in toks.map_batches(
        bucket_sums, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        for b, s in zip(
            bt["bucket"].to_numpy(zero_copy_only=False),
            bt["s"].to_numpy(zero_copy_only=False),
        ):
            totals[int(b)] = totals.get(int(b), 0) + int(s)
    base: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        base[b] = acc
        acc += totals[b]
    base_ref = ray.put(base)

    def per_bucket(g: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(did)
        did, n = did[order], n[order]
        b0 = int(g["bucket"][0].as_py())
        start = bases[b0] + np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
        pf = start // PACK_CTX
        pl = np.where(n == 0, pf, (start + np.maximum(n, 1) - 1) // PACK_CTX)
        return pa.table({
            "doc_id": pa.array(did),
            "n_tokens": pa.array(n),
            "start_tok": pa.array(start),
            "pack_first": pa.array(pf),
            "pack_last": pa.array(pl),
        })

    return toks.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_pack_sequences() -> str:
    ntok = (
        "CASE WHEN trim(text) = '' THEN 0"
        " ELSE length(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, {ntok} AS n FROM documents
),
c AS MATERIALIZED (
  SELECT doc_id, n,
    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_tok
  FROM t
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, start_tok,
  start_tok // {PACK_CTX} AS pack_first,
  CASE WHEN n = 0 THEN start_tok // {PACK_CTX}
    ELSE (start_tok + n - 1) // {PACK_CTX} END AS pack_last
FROM c
"""


FOCAL_RES = 4  # 81 rows x 324 cols equatorial grid


def _cells_from_band_rowcol(r: np.ndarray, c: np.ndarray, res: int) -> np.ndarray:
    """Inverse of _band_row_col: (band row, global col) -> packed SUID
    on the equatorial faces (suid_rowcol semantics, cell.py:269-291)."""
    N = CFG.N_side
    nrow = N**res
    face = 1 + c // nrow
    digits = np.empty((len(r), res), dtype=np.int64)
    rr = r.astype(np.int64).copy()
    cc = (c % nrow).astype(np.int64)
    for i in range(res - 1, -1, -1):
        digits[:, i] = (rr % N) * N + (cc % N)
        rr //= N
        cc //= N
    return su.pack(face.astype(np.int64), digits, res)


def q_focal_stats(sf_dir: str):
    """Focal (moving-window) statistics: for every band-interior
    equatorial res-4 cell with events, the 3x3-neighborhood event count
    (raster focal sum in DGGS space — for band-interior cells the 8
    grid neighbors ARE the true planar DGGS neighbors).

    Shape: index + per-batch (cell, count) np.unique partials -> each
    partial emits 1 self row + 9 neighbor CONTRIBUTION rows (counts
    sum linearly, so expanding combined partials is exact) -> ONE
    h(cell) bucket exchange -> per-bucket (cell, side) sums, inner
    join in-resolve.  The 10x expansion runs on partials (bounded by
    distinct cells per block), never on raw events."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(32)
    nrow = CFG.N_side**FOCAL_RES
    ncol = 4 * nrow
    ds = _read(sf_dir, "events", columns=["event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG, FOCAL_RES, lon, lat, plane=False)
        face = su.face_of(u)
        eq = (face >= 1) & (face <= 4)
        cu, cnt_inv = np.unique(u[eq], return_inverse=True)
        cnt = np.zeros(len(cu), dtype=np.int64)
        np.add.at(cnt, cnt_inv, 1)
        _, digits, _ = su.unpack(cu)
        N = CFG.N_side
        row = np.zeros(len(cu), dtype=np.int64)
        col = np.zeros(len(cu), dtype=np.int64)
        for i in range(FOCAL_RES):
            row = row * N + digits[:, i] // N
            col = col * N + digits[:, i] % N
        gcol = (su.face_of(cu).astype(np.int64) - 1) * nrow + col
        # self rows: band-interior only (where the 3x3 grid = true DGGS
        # neighbors); contributions: from every equatorial cell
        interior = (row >= 1) & (row <= nrow - 2)
        tgt = [cu[interior]]
        side = [np.zeros(int(interior.sum()), dtype=np.int64)]
        val = [cnt[interior]]
        for dr in (-1, 0, 1):
            r2 = row + dr
            ok = (r2 >= 0) & (r2 <= nrow - 1)
            for dc in (-1, 0, 1):
                c2 = (gcol[ok] + dc) % ncol
                tgt.append(_cells_from_band_rowcol(r2[ok], c2, FOCAL_RES))
                side.append(np.ones(int(ok.sum()), dtype=np.int64))
                val.append(cnt[ok])
        tgt_a = np.concatenate(tgt)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(tgt_a, n_buckets)),
            "cell_u64": pa.array(tgt_a, type=pa.uint64()),
            "side": pa.array(np.concatenate(side)),
            "cnt": pa.array(np.concatenate(val)),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pa.Table) -> pa.Table:
        cu = g["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = g["side"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(cu, return_inverse=True)
        n_self = np.zeros(len(uniq), dtype=np.int64)
        n_focal = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n_self, inv[side == 0], cnt[side == 0])
        np.add.at(n_focal, inv[side == 1], cnt[side == 1])
        keep = n_self > 0
        return pa.table({
            "cell_id": pa.array(su.to_string_fixed(uniq[keep], FOCAL_RES), type=pa.string()),
            "n_self": pa.array(n_self[keep]),
            "n_focal": pa.array(n_focal[keep]),
        })

    return p.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_focal_stats() -> str:
    res, N = FOCAL_RES, CFG.N_side
    nrow = N**res
    ncol = 4 * nrow
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), res, CFG, id_cols=("event_id",)
    )
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row = "(" + " + ".join(
        f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    colf = "(" + " + ".join(
        f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    fidx = (
        "(CASE substr(cell_id, 1, 1) "
        + " ".join(f"WHEN '{c}' THEN {i}" for i, c in enumerate(CELLS0))
        + " END)"
    )
    gcol = f"(({fidx} - 1) * {nrow} + {colf})"
    return f"""
WITH idxp AS MATERIALIZED (
  SELECT event_id, cell_id FROM {inner} t
),
eq AS MATERIALIZED (
  SELECT cell_id, {row} AS row, {gcol} AS gcol, COUNT(*) AS n
  FROM idxp WHERE substr(cell_id, 1, 1) IN ('O', 'P', 'Q', 'R')
  GROUP BY 1, 2, 3
),
offs AS (SELECT dr, dc FROM
  (SELECT unnest(generate_series(-1, 1)) AS dr),
  (SELECT unnest(generate_series(-1, 1)) AS dc)),
f AS MATERIALIZED (
  SELECT a.row + dr AS r2, ((a.gcol + dc) % {ncol} + {ncol}) % {ncol} AS c2,
    CAST(SUM(a.n) AS BIGINT) AS nf
  FROM eq a, offs
  WHERE a.row + dr BETWEEN 0 AND {nrow - 1}
  GROUP BY 1, 2
)
SELECT a.cell_id, CAST(a.n AS BIGINT) AS n_self, f.nf AS n_focal
FROM eq a JOIN f ON f.r2 = a.row AND f.c2 = a.gcol
WHERE a.row BETWEEN 1 AND {nrow - 2}
"""


# ---------------------------------------------------------------------------
# Round 2c: bloom decontamination, percentile rank, count-min sketch,
# left outer join
# ---------------------------------------------------------------------------

BLOOM_M = 16384  # bits
BLOOM_K = 3      # hash functions


def q_bloom_decontaminate(sf_dir: str):
    """Bloom-filter benchmark decontamination: the eval set's 4-gram
    shingles populate a BLOOM_M-bit, BLOOM_K-hash filter (2 KB — vs
    the exact set's unbounded growth); the corpus scan flags any doc
    with a shingle whose K bits are all set.  Deterministic md5 bit
    positions, so the oracle replays the filter bit-for-bit including
    FALSE POSITIVES — the real at-scale trade (constant-memory filter,
    auditable FP rate).  Eval set is MBs and driver-built (same bound
    as decontaminate); the corpus never shuffles — pure map."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64, shingles

    def eval_mask(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(did < DECON_EVAL_MAX_ID))

    eval_rows = (
        _read(sf_dir, "documents", columns=["doc_id", "text"], blocks=4)
        .map_batches(eval_mask, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    bits = np.zeros(BLOOM_M, dtype=bool)
    for r in eval_rows:
        for s in shingles(r["text"]):
            for j in range(BLOOM_K):
                bits[md5_u64(f"{j}|{s}") % BLOOM_M] = True
    bits_ref = ray.put(bits)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        dids, n_sh, n_hits = [], [], []
        for did, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            if did < DECON_EVAL_MAX_ID:
                continue
            sh = shingles(text)
            hits = sum(
                1 for s in sh
                if all(b[md5_u64(f"{j}|{s}") % BLOOM_M] for j in range(BLOOM_K))
            )
            if hits:
                dids.append(did)
                n_sh.append(len(sh))
                n_hits.append(hits)
        return pa.table({
            "doc_id": pa.array(np.array(dids, dtype=np.int64)),
            "n_shingles": pa.array(np.array(n_sh, dtype=np.int64)),
            "n_hits": pa.array(np.array(n_hits, dtype=np.int64)),
        })

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


def sql_bloom_decontaminate() -> str:
    from rhealpixdggs_py_ray.ops.dedup import SHINGLE_W

    pos = (
        "CAST(md5_number_lower(CAST(j AS VARCHAR) || '|' || s) AS HUGEINT)"
        f" % {BLOOM_M}"
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
),
js AS (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS j),
bloom AS MATERIALIZED (
  SELECT DISTINCT {pos} AS pos
  FROM (SELECT DISTINCT s FROM sh WHERE doc_id < {DECON_EVAL_MAX_ID}), js
),
probe AS MATERIALIZED (
  SELECT doc_id, s, j, {pos} AS pos
  FROM (SELECT doc_id, s FROM sh WHERE doc_id >= {DECON_EVAL_MAX_ID}), js
),
hit AS MATERIALIZED (
  -- one probe row per (doc, s, j); a j passes iff its pos bit is set,
  -- so COUNT(*) = K even when two j's collide on one position
  SELECT doc_id, s FROM probe JOIN bloom USING (pos)
  GROUP BY doc_id, s HAVING COUNT(*) = {BLOOM_K}
),
ns AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM sh GROUP BY doc_id
)
SELECT h.doc_id, ns.n_shingles, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM hit h JOIN ns ON ns.doc_id = h.doc_id
GROUP BY h.doc_id, ns.n_shingles
"""


def q_percentile_rank(sf_dir: str):
    """Exact percentile-rank normalization of a per-doc metric within
    its language (quality-threshold calibration): pct_micros =
    floor(1e6 * n_smaller / (n_lang - 1)).  Two passes, ZERO
    exchanges: (1) per-batch (lang, n_chars) histogram partials folded
    on the driver (bounded by metric cardinality, not corpus size);
    (2) broadcast cumulative histogram + np.searchsorted lookup map."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def hist(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        lu, li = np.unique(lang, return_inverse=True)
        vu, vi = np.unique(v, return_inverse=True)
        key = li * len(vu) + vi
        ku, kc = np.unique(key, return_counts=True)
        return pa.table({
            "lang": pa.array(lu[ku // len(vu)]),
            "val": pa.array(vu[ku % len(vu)]),
            "n": pa.array(kc.astype(np.int64)),
        })

    folded: dict[str, dict[int, int]] = {}
    for bt in ds.map_batches(
        hist, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        for lg, v, n in zip(
            bt["lang"].to_pylist(),
            bt["val"].to_numpy(zero_copy_only=False),
            bt["n"].to_numpy(zero_copy_only=False),
        ):
            d = folded.setdefault(lg, {})
            d[int(v)] = d.get(int(v), 0) + int(n)
    lookup = {}
    for lg, d in folded.items():
        vals = np.array(sorted(d), dtype=np.int64)
        cnts = np.array([d[int(v)] for v in vals], dtype=np.int64)
        cum = np.concatenate(([0], np.cumsum(cnts)[:-1]))  # n strictly smaller
        lookup[lg] = (vals, cum, int(cnts.sum()))
    lut_ref = ray.put(lookup)

    def rank(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        n_lt = np.zeros(len(v), dtype=np.int64)
        pct = np.zeros(len(v), dtype=np.int64)
        for lg in np.unique(lang):
            vals, cum, total = lut[lg]
            m = lang == lg
            lt = cum[np.searchsorted(vals, v[m])]
            n_lt[m] = lt
            if total > 1:
                pct[m] = lt * 1_000_000 // (total - 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
            "n_lt": pa.array(n_lt),
            "pct_micros": pa.array(pct),
        })

    return ds.map_batches(rank, batch_format="pyarrow", zero_copy_batch=True)


def sql_percentile_rank() -> str:
    return """
WITH r AS MATERIALIZED (
  SELECT doc_id, lang, n_chars,
    CAST(RANK() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS BIGINT)
      AS n_lt,
    COUNT(*) OVER (PARTITION BY lang) AS n_lang
  FROM documents
)
SELECT doc_id, lang, n_chars, n_lt,
  CASE WHEN n_lang > 1 THEN n_lt * 1000000 // (n_lang - 1)
    ELSE 0 END AS pct_micros
FROM r
"""


CMS_D = 4    # sketch depth (hash functions)
CMS_W = 256  # sketch width
CMS_HH_MIN = 50  # heavy-hitter true-count threshold


def q_cms_heavy_hitters(sf_dir: str):
    """Count-Min-Sketch heavy hitters over event user_ids: per-batch
    (D x W) register partials sum into one tiny driver-folded matrix
    (registers are counters — merge = add, the mergeable-sketch
    property); candidates' exact counts come from one h(user) bucket
    exchange filtered to n >= threshold (output bounded by the
    threshold, not user cardinality).  Estimates are min-over-rows
    reads of the folded sketch — the oracle replays registers AND the
    over-estimate bias exactly."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = _read(sf_dir, "events", columns=["user_id"])

    def reg_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(uid, return_counts=True)
        reg = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        for u, c in zip(uu, cnt):
            for j in range(CMS_D):
                reg[j, md5_u64(f"{j}|{int(u)}") % CMS_W] += int(c)
        j, p = np.nonzero(reg)
        return pa.table({
            "j": pa.array(j.astype(np.int64)),
            "pos": pa.array(p.astype(np.int64)),
            "n": pa.array(reg[j, p]),
        })

    reg = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for bt in ds.map_batches(
        reg_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        np.add.at(
            reg,
            (bt["j"].to_numpy(zero_copy_only=False),
             bt["pos"].to_numpy(zero_copy_only=False)),
            bt["n"].to_numpy(zero_copy_only=False),
        )

    def cnt_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(uid, return_counts=True)
        return pa.table({
            "user_id": pa.array(uu.astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    heavy = (
        ds.map_batches(cnt_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n_true"))
        .map_batches(
            lambda t: t.filter(
                pa.array(
                    t["n_true"].to_numpy(zero_copy_only=False) >= CMS_HH_MIN
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )  # bounded by the threshold: at most total_rows / CMS_HH_MIN rows
    uids = np.array(sorted(r["user_id"] for r in heavy), dtype=np.int64)
    true_n = {int(r["user_id"]): int(r["n_true"]) for r in heavy}
    est = np.array([
        min(reg[j, md5_u64(f"{j}|{int(u)}") % CMS_W] for j in range(CMS_D))
        for u in uids
    ], dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array(uids),
        "n_true": pa.array(np.array([true_n[int(u)] for u in uids], dtype=np.int64)),
        "n_est": pa.array(est),
    }))


def sql_cms_heavy_hitters() -> str:
    pos = (
        "CAST(md5_number_lower(CAST(js.j AS VARCHAR) || '|'"
        f" || CAST(user_id AS VARCHAR)) AS HUGEINT) % {CMS_W}"
    )
    return f"""
WITH js AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS j),
reg AS MATERIALIZED (
  SELECT j, {pos} AS pos, CAST(COUNT(*) AS BIGINT) AS n
  FROM events, js GROUP BY 1, 2
),
heavy AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM events GROUP BY user_id HAVING COUNT(*) >= {CMS_HH_MIN}
)
SELECT h.user_id, h.n_true, MIN(r.n) AS n_est
FROM heavy h CROSS JOIN js
JOIN reg r ON r.j = js.j AND r.pos = {pos.replace('user_id', 'h.user_id')}
GROUP BY h.user_id, h.n_true
"""


def q_left_join_orders(sf_dir: str):
    """LEFT OUTER join: every customer row survives, order aggregates
    COALESCE to zero for the no-order customers (the join type the
    engine's inner/semi/anti trio lacked).  Both sides route through
    ONE union bucket exchange on custkey; the outer semantics cost
    nothing extra — the left side is kept whether or not the bucket
    holds matching right rows."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"], blocks=4)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], blocks=4)

    def left_rows(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(k, n_buckets)),
            "key": pa.array(k.astype(np.int64)),
            "seg": batch["c_mktsegment"],
            "n": pa.array(np.zeros(len(k), dtype=np.int64)),
            "cents": pa.array(np.zeros(len(k), dtype=np.int64)),
            "side": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    def right_partial(batch: pa.Table) -> pa.Table:
        k = batch["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ku, ki = np.unique(k, return_inverse=True)
        n = np.zeros(len(ku), dtype=np.int64)
        np.add.at(n, ki, 1)
        s = np.zeros(len(ku), dtype=np.int64)
        np.add.at(s, ki, cents)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ku, n_buckets)),
            "key": pa.array(ku.astype(np.int64)),
            "seg": pa.array(np.full(len(ku), "", dtype=object), type=pa.string()),
            "n": pa.array(n),
            "cents": pa.array(s),
            "side": pa.array(np.ones(len(ku), dtype=np.int64)),
        })

    both = cust.map_batches(
        left_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(
        right_partial, batch_format="pyarrow", zero_copy_batch=True
    ))

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        n_all = g["n"].to_numpy(zero_copy_only=False)
        c_all = g["cents"].to_numpy(zero_copy_only=False)
        lm = side == 0
        rk = key[~lm]
        ru, ri = np.unique(rk, return_inverse=True)
        rn = np.zeros(len(ru), dtype=np.int64)
        np.add.at(rn, ri, n_all[~lm])
        rc = np.zeros(len(ru), dtype=np.int64)
        np.add.at(rc, ri, c_all[~lm])
        lk = key[lm]
        pos = np.searchsorted(ru, lk)
        hit = (pos < len(ru)) & (ru[np.minimum(pos, len(ru) - 1)] == lk)
        n = np.where(hit, rn[np.minimum(pos, len(ru) - 1)], 0)
        cents = np.where(hit, rc[np.minimum(pos, len(ru) - 1)], 0)
        return pa.table({
            "c_custkey": pa.array(lk),
            "c_mktsegment": g["seg"].filter(pa.array(lm)),
            "n_orders": pa.array(n),
            "sum_cents": pa.array(cents),
        })

    return both.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_left_join_orders() -> str:
    return """
SELECT c.c_custkey, c.c_mktsegment,
  CAST(COUNT(o.o_custkey) AS BIGINT) AS n_orders,
  CAST(COALESCE(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
    AS sum_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 2c: BM25 retrieval (integer-exact scoring)
# ---------------------------------------------------------------------------

BM25_NQ = 4        # query docs: doc_id 0..3 ("more-like-this" retrieval)
BM25_K = 10        # results per query
BM25_TF_SCALE = 10_000
BM25_IDF_SCALE = 1_000_000


def q_bm25_topk(sf_dir: str):
    """BM25 top-k retrieval with INTEGER-EXACT scoring: k1=6/5 and
    b=3/4 are kept rational and avgdl enters as dl*N/T, so the tf
    normalization is one integer division —
      tf_part = (44*T*tf*S1) // (20*T*tf + 6*T + 18*dl*N)
    — and the idf substitute ((N-df)*S2)//(df+1) is integer too: no
    float log anywhere, the oracle replays every division exactly.

    Shape: query-doc terms broadcast (bounded: BM25_NQ docs); pass A
    folds corpus stats (N, T, per-query-term df — bounded by the query
    vocabulary, never the corpus vocabulary) from per-batch partials;
    pass B scores candidates in one map and keeps per-batch partial
    top-k, so the final exchange merges <= K*NQ*n_blocks tiny rows."""
    from collections import Counter

    def q_mask(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(did < BM25_NQ))

    qrows = (
        _read(sf_dir, "documents", columns=["doc_id", "text"], blocks=4)
        .map_batches(q_mask, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    qterms = {int(r["doc_id"]): sorted(set(r["text"].split())) for r in qrows}
    qvocab = sorted({t for ts in qterms.values() for t in ts})
    qv_set = set(qvocab)
    q_ref = ray.put((qterms, qvocab))

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        _, qv = ray.get(q_ref)
        qvs = set(qv)
        n_docs = 0
        n_toks = 0
        df: Counter = Counter()
        for did, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            if did < BM25_NQ:
                continue
            toks = text.split()
            if not toks:  # SQL's dl CTE drops token-less docs
                continue
            n_docs += 1
            n_toks += len(toks)
            for t in set(toks) & qvs:
                df[t] += 1
        terms = sorted(df)
        return pa.table({
            "term": pa.array(["\x00N", "\x00T"] + terms, type=pa.string()),
            "n": pa.array(
                np.array([n_docs, n_toks] + [df[t] for t in terms],
                         dtype=np.int64)
            ),
        })

    n_corpus = 0
    t_corpus = 0
    df_map: dict[str, int] = {}
    for bt in ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        for term, n in zip(bt["term"].to_pylist(),
                           bt["n"].to_numpy(zero_copy_only=False)):
            if term == "\x00N":
                n_corpus += int(n)
            elif term == "\x00T":
                t_corpus += int(n)
            else:
                df_map[term] = df_map.get(term, 0) + int(n)
    stats_ref = ray.put((n_corpus, t_corpus, df_map))

    def score_partial(batch: pa.Table) -> pa.Table:
        qt, _ = ray.get(q_ref)
        N, T, df = ray.get(stats_ref)
        out_q, out_d, out_s = [], [], []
        per_q: dict[int, list[tuple[int, int]]] = {q: [] for q in qt}
        for did, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            if did < BM25_NQ:
                continue
            toks = text.split()
            dl = len(toks)
            tf = Counter(toks)
            for qid, terms in qt.items():
                s = 0
                for t in terms:
                    f = tf.get(t, 0)
                    if not f:
                        continue
                    tf_part = (44 * T * f * BM25_TF_SCALE) // (
                        20 * T * f + 6 * T + 18 * dl * N
                    )
                    idf = ((N - df.get(t, 0)) * BM25_IDF_SCALE) // (
                        df.get(t, 0) + 1
                    )
                    s += tf_part * idf
                if s > 0:
                    per_q[qid].append((int(did), s))
        for qid, rows in per_q.items():
            rows.sort(key=lambda r: (-r[1], r[0]))
            for did, s in rows[:BM25_K]:
                out_q.append(qid)
                out_d.append(did)
                out_s.append(s)
        return pa.table({
            "qid": pa.array(np.array(out_q, dtype=np.int64)),
            "doc_id": pa.array(np.array(out_d, dtype=np.int64)),
            "score": pa.array(np.array(out_s, dtype=np.int64)),
        })

    part = ds.map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def final(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["score"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s))[:BM25_K]
        return pa.table({
            "qid": g["qid"].take(pa.array(order)),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(d[order]),
            "score": pa.array(s[order]),
        })

    return part.groupby("qid").map_groups(final, batch_format="pyarrow")


def sql_bm25_topk() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents WHERE trim(text) <> ''
),
dl AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks
  WHERE doc_id >= {BM25_NQ} GROUP BY doc_id
),
corpus AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM dl
),
qterm AS MATERIALIZED (
  SELECT DISTINCT doc_id AS qid, t FROM toks WHERE doc_id < {BM25_NQ}
),
qvocab AS MATERIALIZED (SELECT DISTINCT t FROM qterm),
df AS MATERIALIZED (
  SELECT k.t, CAST(COUNT(DISTINCT k.doc_id) AS BIGINT) AS df
  FROM toks k JOIN qvocab v ON v.t = k.t
  WHERE k.doc_id >= {BM25_NQ} GROUP BY k.t
),
tf AS MATERIALIZED (
  SELECT k.doc_id, k.t, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks k JOIN qvocab v ON v.t = k.t
  WHERE k.doc_id >= {BM25_NQ} GROUP BY k.doc_id, k.t
),
scores AS MATERIALIZED (
  SELECT q.qid, tf.doc_id,
    CAST(SUM(
      ((44 * c.t * tf.f * {BM25_TF_SCALE})
        // (20 * c.t * tf.f + 6 * c.t + 18 * d.dl * c.n))
      * (((c.n - COALESCE(df.df, 0)) * {BM25_IDF_SCALE})
        // (COALESCE(df.df, 0) + 1))
    ) AS BIGINT) AS score
  FROM qterm q
  JOIN tf ON tf.t = q.t
  JOIN dl d ON d.doc_id = tf.doc_id
  LEFT JOIN df ON df.t = q.t
  CROSS JOIN corpus c
  GROUP BY q.qid, tf.doc_id
),
ranked AS (
  SELECT qid, doc_id, score,
    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)
      AS rank
  FROM scores WHERE score > 0
)
SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM ranked WHERE rank <= {BM25_K}
"""


# ---------------------------------------------------------------------------
# Round 2c: distance join, funnel, type-token ratio, count-of-counts
# ---------------------------------------------------------------------------

DISTJOIN_NPOI = 5
DISTJOIN_D2 = 1.44e12  # (1200 km)^2 chord threshold in m^2


def q_distance_join(sf_dir: str):
    """Distance-threshold spatial join: events within 1200 km (ECEF
    chord) of any of 5 deterministic POIs, per-POI counts.  POIs
    broadcast once (5 x 3 matrix — never a shuffle); per-batch xyz +
    one (n x 3)@(3 x 5) matmul; partial counts fold in a tiny final
    groupby.  d2 is computed in the exact operation order of the SQL
    so the threshold compare is bit-stable; the reported min distance
    quantizes d2 // 1e6 to keep 1-ulp trig differences sub-floor."""
    from rhealpixdggs_py_ray.core import projection as proj

    pid = np.arange(DISTJOIN_NPOI, dtype=np.int64)
    plon, plat = oracle.lonlat_from_id(pid + 2_000_000)
    px, py, pz = proj.xyz(CFG, plon, plat)

    ds = _read(sf_dir, "events", columns=["event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        x, y, z = proj.xyz(CFG, lon, lat)
        out_p, out_n, out_m = [], [], []
        for j in range(DISTJOIN_NPOI):
            dx = x - px[j]
            dy = y - py[j]
            dz = z - pz[j]
            d2 = dx * dx + dy * dy + dz * dz  # SQL's operand order
            hit = d2 <= DISTJOIN_D2
            n = int(np.count_nonzero(hit))
            if n:
                out_p.append(j)
                out_n.append(n)
                out_m.append(int(np.floor(d2[hit].min() / 1e6)))
        return pa.table({
            "poi_id": pa.array(np.array(out_p, dtype=np.int64)),
            "n": pa.array(np.array(out_n, dtype=np.int64)),
            "min_d2_mm2": pa.array(np.array(out_m, dtype=np.int64)),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("poi_id").aggregate(
        Sum("n", alias_name="n_within"),
        Min("min_d2_mm2", alias_name="min_d2_mm2"),
    )


def sql_distance_join() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    qlon, qlat = oracle.lonlat_from_id_sql("poi_id + 2000000")
    xyz = (
        "SELECT {id}, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*cos(radians(lon))*cos(radians(lat)) AS x, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*sin(radians(lon))*cos(radians(lat)) AS y, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*(1 - {e2})*sin(radians(lat)) AS z FROM {{src}}"
    )
    pts = xyz.format(
        id="event_id",
        src=f"(SELECT event_id, {lon} AS lon, {lat} AS lat FROM events)",
    )
    poi = xyz.format(
        id="poi_id",
        src=(
            f"(SELECT poi_id, {qlon} AS lon, {qlat} AS lat FROM"
            f" (SELECT unnest(generate_series(0, {DISTJOIN_NPOI - 1})) AS poi_id))"
        ),
    )
    return (
        f"WITH p AS MATERIALIZED ({pts}), q AS MATERIALIZED ({poi}),"
        " d AS (SELECT q.poi_id, "
        "  (q.x-p.x)*(q.x-p.x) + (q.y-p.y)*(q.y-p.y) + (q.z-p.z)*(q.z-p.z) AS d2"
        "  FROM q CROSS JOIN p)"
        " SELECT poi_id, CAST(COUNT(*) AS BIGINT) AS n_within,"
        "  CAST(MIN(CAST(floor(d2 / 1000000.0) AS BIGINT)) AS BIGINT)"
        "   AS min_d2_mm2"
        f" FROM d WHERE d2 <= {DISTJOIN_D2!r} GROUP BY poi_id"
    )


def q_funnel(sf_dir: str):
    """Funnel analysis (view -> click -> purchase): users whose first
    click strictly follows their first view, and first purchase
    strictly follows that click.  ONE h(user) bucket exchange; inside
    a bucket the three stage timestamps resolve with vectorized pandas
    groupby mins (no per-user loop); only 1-row stage-count partials
    leave the bucket."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "view") | (et == "click") | (et == "purchase")
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)[keep]
        )
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_type": pa.array(et[keep], type=pa.string()),
        })

    def _group_min(u: np.ndarray, t: np.ndarray):
        uu, inv = np.unique(u, return_inverse=True)
        mn = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, inv, t)
        return uu, mn

    def _first_after(u: np.ndarray, t: np.ndarray, bu: np.ndarray, bt: np.ndarray):
        # min t per user where the user has a base time and t > base
        if not len(bu) or not len(u):
            return bu[:0], bt[:0]
        pos = np.searchsorted(bu, u)
        safe = np.minimum(pos, len(bu) - 1)
        ok = (bu[safe] == u) & (t > bt[safe])
        return _group_min(u[ok], t[ok])

    def per_bucket(g: pa.Table) -> pa.Table:
        et = g["event_type"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        vm = et == "view"
        vu, vt = _group_min(uid[vm], t[vm])
        cm = et == "click"
        cu_, ct = _first_after(uid[cm], t[cm], vu, vt)
        pm = et == "purchase"
        pu, _pt = _first_after(uid[pm], t[pm], cu_, ct)
        return pa.table({
            "g": pa.array([0], type=pa.int64()),
            "n_view": pa.array([len(vu)], type=pa.int64()),
            "n_click": pa.array([len(cu_)], type=pa.int64()),
            "n_purchase": pa.array([len(pu)], type=pa.int64()),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    out = b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        return pa.table({
            "n_view": pa.array([int(pc.sum(g["n_view"]).as_py())], type=pa.int64()),
            "n_click": pa.array([int(pc.sum(g["n_click"]).as_py())], type=pa.int64()),
            "n_purchase": pa.array([int(pc.sum(g["n_purchase"]).as_py())], type=pa.int64()),
        })

    return out.groupby("g").map_groups(resolve, batch_format="pyarrow")


def sql_funnel() -> str:
    return """
WITH v AS MATERIALIZED (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS MATERIALIZED (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1
),
p AS MATERIALIZED (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase
"""


def q_ttr(sf_dir: str):
    """Type-token ratio (lexical diversity, a quality gate the float
    entropy score can't beat for oracle-exactness): per doc,
    1000 * distinct_words // words.  Pure map — never a shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        dids, n_t, n_d, ttr = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            toks = text.split()
            if not toks:
                continue
            dids.append(did)
            n_t.append(len(toks))
            n_d.append(len(set(toks)))
            ttr.append(1000 * len(set(toks)) // len(toks))
        return pa.table({
            "doc_id": pa.array(np.array(dids, dtype=np.int64)),
            "n_tokens": pa.array(np.array(n_t, dtype=np.int64)),
            "n_distinct": pa.array(np.array(n_d, dtype=np.int64)),
            "ttr_permille": pa.array(np.array(ttr, dtype=np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def sql_ttr() -> str:
    return """
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents WHERE trim(text) <> ''
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(COUNT(DISTINCT t) AS BIGINT) AS n_distinct,
  1000 * COUNT(DISTINCT t) // COUNT(*) AS ttr_permille
FROM toks GROUP BY doc_id
"""


def q_count_of_counts(sf_dir: str):
    """Skew diagnostic: the distribution of per-user event counts
    (count-of-counts).  Per-batch (user, n) partials -> ONE h(user)
    bucket exchange (per-user totals exact per bucket) -> per-bucket
    count-of-count partials -> tiny final fold over distinct counts."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["user_id"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(uid, return_counts=True)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uu, n_buckets)),
            "user_id": pa.array(uu.astype(np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(uid, return_inverse=True)
        tot = np.zeros(len(uu), dtype=np.int64)
        np.add.at(tot, inv, n)
        cu, cc = np.unique(tot, return_counts=True)
        return pa.table({
            "n_events": pa.array(cu),
            "n_users": pa.array(cc.astype(np.int64)),
        })

    b = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
        .groupby("n_events").aggregate(Sum("n_users", alias_name="n_users"))
    )


def sql_count_of_counts() -> str:
    return """
SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_users FROM (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
) GROUP BY n_events
"""


# ---------------------------------------------------------------------------
# Round 2c: DGGS image mosaic + trajectory segmentation
# ---------------------------------------------------------------------------

MOSAIC_RES = 2


def q_image_mosaic(sf_dir: str):
    """DGGS raster mosaic: decode every image (actor pool), index it
    to its res-2 cell, and aggregate per-tile channel statistics (n +
    per-channel mean sums in centi-units) — the canonical
    'rasters into a discrete global grid' aggregation.  Payload bytes
    never shuffle: only (tile, 3 ints) partials leave the decode
    stage."""
    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.ops.multimodal import DecodeResizeFeatures
    from rhealpixdggs_py_ray.stages.indexer import CellIndexer

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8))
    ds = ds.map_batches(
        DecodeResizeFeatures,
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=sizing.pool(),
    )
    ds = ds.map_batches(
        CellIndexer,
        fn_constructor_kwargs={"resolution": MOSAIC_RES},
        batch_format="pyarrow",
        batch_size=256,
        zero_copy_batch=True,
        concurrency=sizing.pool(),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        cid = batch["cell_id"].to_numpy(zero_copy_only=False)
        fm = np.array(batch["feat_mean"].to_pylist(), dtype=np.float64)
        cm = np.floor(fm * 100).astype(np.int64)  # (n, 3) centi-means
        uq, inv = np.unique(cid, return_inverse=True)
        n = np.bincount(inv)
        sums = np.zeros((len(uq), 3), dtype=np.int64)
        np.add.at(sums, inv, cm)
        return pa.table({
            "tile_id": pa.array(uq, type=pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "sum_mean_r_c": pa.array(sums[:, 0]),
            "sum_mean_g_c": pa.array(sums[:, 1]),
            "sum_mean_b_c": pa.array(sums[:, 2]),
        })

    part = ds.map_batches(summarize, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("tile_id").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_mean_r_c", alias_name="sum_mean_r_c"),
        Sum("sum_mean_g_c", alias_name="sum_mean_g_c"),
        Sum("sum_mean_b_c", alias_name="sum_mean_b_c"),
    )


def sql_image_mosaic() -> str:
    src = _image_src_sql()
    tiled = oracle.cell_from_point_sql(
        f"SELECT image_id, w, h, u, lon, lat FROM {src} t", MOSAIC_RES, CFG,
        id_cols=("image_id",), extra_cols=("w", "h", "u"),
    )
    # channel-c mean of the 32x32 nearest-resized generative pattern:
    # pix(y, x, c) = (x*3 + y*5 + c*7 + ((phash >> 8c) & 255)) % 256
    def val(c: int) -> str:
        return (
            "(((CAST(gj AS BIGINT) * w) // 32) * 3"
            " + ((CAST(gi AS BIGINT) * h) // 32) * 5"
            f" + {c * 7} + CAST((u >> {8 * c}) & 255 AS BIGINT)) % 256"
        )

    means = ", ".join(
        f"CAST(floor((SUM({val(c)}) / 1024.0) * 100) AS BIGINT) AS m{c}"
        for c in range(3)
    )
    return f"""
WITH f AS MATERIALIZED (SELECT image_id, w, h, u, cell_id FROM {tiled} t),
g AS (SELECT gi.gi, gj.gj FROM
  (SELECT unnest(generate_series(0, 31)) AS gi) gi,
  (SELECT unnest(generate_series(0, 31)) AS gj) gj),
mm AS MATERIALIZED (
  SELECT image_id, cell_id, {means} FROM f, g GROUP BY image_id, cell_id
)
SELECT cell_id AS tile_id, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(m0) AS BIGINT) AS sum_mean_r_c,
  CAST(SUM(m1) AS BIGINT) AS sum_mean_g_c,
  CAST(SUM(m2) AS BIGINT) AS sum_mean_b_c
FROM mm GROUP BY cell_id
"""


TRAJ_D2 = 6.4e13  # (8000 km)^2 chord-step segmentation threshold


def q_trajectory_segments(sf_dir: str):
    """GPS-trajectory segmentation: each user's events ordered by
    (ts, event_id) form a track; a new segment starts where the ECEF
    chord step exceeds 8000 km.  ONE h(user) bucket exchange; inside a
    bucket one lexsort + vectorized diff over the whole bucket (user
    boundaries masked) — no per-user loop."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        lon, lat = oracle.lonlat_from_id(eid)
        x, y, z = proj.xyz(CFG, lon, lat)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(eid.astype(np.int64)),
            "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, x, y, z = (
            uid[order],
            g["x"].to_numpy(zero_copy_only=False)[order],
            g["y"].to_numpy(zero_copy_only=False)[order],
            g["z"].to_numpy(zero_copy_only=False)[order],
        )
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        dz = z[1:] - z[:-1]
        d2 = dx * dx + dy * dy + dz * dz  # SQL operand order
        same = uid[1:] == uid[:-1]
        uu, inv = np.unique(uid, return_inverse=True)
        n_pts = np.bincount(inv).astype(np.int64)
        brk = np.zeros(len(uu), dtype=np.int64)
        np.add.at(brk, inv[1:][same], (d2[same] > TRAJ_D2).astype(np.int64))
        mx = np.zeros(len(uu), dtype=np.int64)
        step_mm2 = np.floor(d2[same] / 1e6).astype(np.int64)
        np.maximum.at(mx, inv[1:][same], step_mm2)
        return pa.table({
            "user_id": pa.array(uu),
            "n_points": pa.array(n_pts),
            "n_segments": pa.array(1 + brk),
            "max_step_mm2": pa.array(mx),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_trajectory_segments() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    nn = f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))"
    return f"""
WITH pts AS MATERIALIZED (
  SELECT user_id, ts, event_id,
    {nn}*cos(radians(lon))*cos(radians(lat)) AS x,
    {nn}*sin(radians(lon))*cos(radians(lat)) AS y,
    {nn}*(1 - {e2})*sin(radians(lat)) AS z
  FROM (SELECT user_id, ts, event_id, {lon} AS lon, {lat} AS lat FROM events)
),
lagged AS MATERIALIZED (
  SELECT user_id,
    lag(x) OVER w AS px, lag(y) OVER w AS py, lag(z) OVER w AS pz, x, y, z
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
steps AS MATERIALIZED (
  SELECT user_id,
    CASE WHEN px IS NULL THEN NULL
      ELSE (x-px)*(x-px) + (y-py)*(y-py) + (z-pz)*(z-pz) END AS d2
  FROM lagged
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
  CAST(1 + COUNT(*) FILTER (WHERE d2 > {TRAJ_D2!r}) AS BIGINT) AS n_segments,
  CAST(COALESCE(MAX(CAST(floor(d2 / 1000000.0) AS BIGINT)), 0) AS BIGINT)
    AS max_step_mm2
FROM steps GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Round 2c: anomaly filter (quantile-gated) + rollup aggregation
# ---------------------------------------------------------------------------

def q_anomaly_filter(sf_dir: str):
    """Quantile-gated anomaly detection: events whose cent-quantized
    value strictly exceeds their type's EXACT p99 (monitoring's
    standard alert rule).  Pass 1 folds the bounded (type, cent)
    histogram on the driver and reads p99 off cumulative counts with
    pure-integer rank arithmetic (k = (99*N + 99) // 100); pass 2 is a
    broadcast-threshold pure-map filter — the corpus never shuffles."""
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def part_hist(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        eu, ei = np.unique(et, return_inverse=True)
        cu, ci = np.unique(c, return_inverse=True)
        key = ei * len(cu) + ci
        ku, kc = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": pa.array(eu[ku // len(cu)]),
            "c": pa.array(cu[ku % len(cu)]),
            "n": pa.array(kc.astype(np.int64)),
        })

    hist: dict[str, dict[int, int]] = {}
    for bt in ds.map_batches(
        part_hist, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        for et, c, n in zip(
            bt["event_type"].to_pylist(),
            bt["c"].to_numpy(zero_copy_only=False),
            bt["n"].to_numpy(zero_copy_only=False),
        ):
            d = hist.setdefault(et, {})
            d[int(c)] = d.get(int(c), 0) + int(n)
    p99: dict[str, int] = {}
    for et, d in hist.items():
        cs = np.array(sorted(d), dtype=np.int64)
        cum = np.cumsum([d[int(c)] for c in cs])
        tot = int(cum[-1])
        k = (99 * tot + 99) // 100
        p99[et] = int(cs[np.searchsorted(cum, k)])
    p99_ref = ray.put(p99)

    def flag(batch: pa.Table) -> pa.Table:
        thr = ray.get(p99_ref)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        lim = np.array([thr[t] for t in et], dtype=np.int64)
        keep = c > lim
        return pa.table({
            "event_id": batch["event_id"].filter(pa.array(keep)),
            "event_type": batch["event_type"].filter(pa.array(keep)),
            "value_c": pa.array(c[keep]),
            "p99_c": pa.array(lim[keep]),
        })

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def sql_anomaly_filter() -> str:
    return """
WITH h AS MATERIALIZED (
  SELECT event_type, CAST(floor(value*100) AS BIGINT) AS c, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
cum AS MATERIALIZED (
  SELECT event_type, c,
    SUM(n) OVER (PARTITION BY event_type ORDER BY c) AS cn,
    SUM(n) OVER (PARTITION BY event_type) AS tot
  FROM h
),
thr AS MATERIALIZED (
  SELECT event_type,
    MIN(CASE WHEN cn >= (99*tot+99)//100 THEN c END) AS p99_c
  FROM cum GROUP BY event_type
)
SELECT e.event_id, e.event_type,
  CAST(floor(e.value*100) AS BIGINT) AS value_c, t.p99_c
FROM events e JOIN thr t ON t.event_type = e.event_type
WHERE CAST(floor(e.value*100) AS BIGINT) > t.p99_c
"""


def q_rollup_revenue(sf_dir: str):
    """Multi-granularity ROLLUP in ONE pass: revenue by
    (priority, status), per-priority subtotals and the grand total all
    derive from the same per-batch partials — the finest level is
    aggregated once and coarser levels are re-reduced from it
    (tile_pyramid's relational sibling), never a second scan."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        st = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pu, pi = np.unique(pr, return_inverse=True)
        su_, si = np.unique(st, return_inverse=True)
        key = pi * len(su_) + si
        ku, ki = np.unique(key, return_inverse=True)
        n = np.bincount(ki).astype(np.int64)
        s = np.zeros(len(ku), dtype=np.int64)
        np.add.at(s, ki, cents)
        return pa.table({
            "g": pa.array(np.zeros(len(ku), dtype=np.int64)),
            "prio": pa.array(pu[ku // len(su_)], type=pa.string()),
            "status": pa.array(su_[ku % len(su_)], type=pa.string()),
            "n": pa.array(n),
            "cents": pa.array(s),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        pr = g["prio"].to_numpy(zero_copy_only=False)
        st = g["status"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)

        def _reduce(pkeys, skeys):
            pu, pi = np.unique(pkeys, return_inverse=True)
            su_, si = np.unique(skeys, return_inverse=True)
            key = pi * len(su_) + si
            ku, ki = np.unique(key, return_inverse=True)
            nn = np.zeros(len(ku), dtype=np.int64)
            np.add.at(nn, ki, n)
            cc = np.zeros(len(ku), dtype=np.int64)
            np.add.at(cc, ki, cents)
            return pu[ku // len(su_)], su_[ku % len(su_)], nn, cc

        fp, fs, fn, fc = _reduce(pr, st)
        sp, ss, sn, sc = _reduce(pr, np.full(len(pr), "ALL", dtype=object))
        out_p = np.concatenate([fp, sp, np.array(["ALL"], dtype=object)])
        out_s = np.concatenate([fs, ss, np.array(["ALL"], dtype=object)])
        out_n = np.concatenate([fn, sn, np.array([fn.sum()], dtype=np.int64)])
        out_c = np.concatenate([fc, sc, np.array([fc.sum()], dtype=np.int64)])
        return pa.table({
            "prio": pa.array(out_p, type=pa.string()),
            "status": pa.array(out_s, type=pa.string()),
            "n_orders": pa.array(out_n),
            "revenue_c": pa.array(out_c),
        })

    return p.groupby("g").map_groups(resolve, batch_format="pyarrow")


def sql_rollup_revenue() -> str:
    return """
SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
  COALESCE(o_orderstatus, 'ALL') AS status,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_c
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# Round 2c: geofence cap cover
# ---------------------------------------------------------------------------

CAP_NPOI = 3
CAP_D2 = 9.0e12  # (3000 km)^2 ECEF chord


def q_cap_cover(sf_dir: str):
    """Geofence materialization: every res-2 cell whose NUCLEUS lies
    within 3000 km (ECEF chord) of a POI -> (poi_id, cell_id, d2).
    Grid enumeration is a pure map over the level-order index range
    (at res 9 that's 2.5e9 cells split across range partitions — no
    driver list); POIs broadcast.  Both sides derive xyz from the SAME
    floor(1e6)-quantized nucleus micros, so the threshold compare sees
    bit-identical inputs (the cell_geometry parity rule)."""
    from rhealpixdggs_py_ray.core import projection as proj

    pid = np.arange(CAP_NPOI, dtype=np.int64)
    plon, plat = oracle.lonlat_from_id(pid + 3_000_000)
    px, py, pz = proj.xyz(CFG, plon, plat)

    b = CFG.N_side**2
    total = 6 * b**2
    base = 6 * (b**2 - 1) // (b - 1)

    def cover(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        u = su.suid_from_level_order_index(i + base, CFG)
        nlon, nlat = idx.nucleus(CFG, u, plane=False)
        qlon = np.floor(nlon * 1e6).astype(np.int64) / 1e6
        qlat = np.floor(nlat * 1e6).astype(np.int64) / 1e6
        x, y, z = proj.xyz(CFG, qlon, qlat)
        cid = su.to_string_fixed(u, 2)
        out_p, out_c, out_d = [], [], []
        for j in range(CAP_NPOI):
            dx = x - px[j]
            dy = y - py[j]
            dz = z - pz[j]
            d2 = dx * dx + dy * dy + dz * dz
            hit = d2 <= CAP_D2
            out_p.append(np.full(int(hit.sum()), j, dtype=np.int64))
            out_c.append(cid[hit])
            out_d.append(np.floor(d2[hit] / 1e6).astype(np.int64))
        return pa.table({
            "poi_id": pa.array(np.concatenate(out_p)),
            "cell_id": pa.array(np.concatenate(out_c), type=pa.string()),
            "d2_mm2": pa.array(np.concatenate(out_d)),
        })

    return ray.data.range(total, override_num_blocks=sizing.range_blocks(total, 4)).map_batches(
        cover, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_cap_cover() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    qlon, qlat = oracle.lonlat_from_id_sql("poi_id + 3000000")
    geom = oracle.cell_geometry_sql(2, CFG)
    nn = f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))"
    return f"""
WITH geom AS MATERIALIZED (
  SELECT cell_id, nuc_lon_micros / 1000000.0 AS lon,
    nuc_lat_micros / 1000000.0 AS lat
  FROM ({geom}) g
),
cells AS MATERIALIZED (
  SELECT cell_id,
    {nn}*cos(radians(lon))*cos(radians(lat)) AS x,
    {nn}*sin(radians(lon))*cos(radians(lat)) AS y,
    {nn}*(1 - {e2})*sin(radians(lat)) AS z
  FROM geom
),
poi AS MATERIALIZED (
  SELECT poi_id,
    {nn}*cos(radians(lon))*cos(radians(lat)) AS x,
    {nn}*sin(radians(lon))*cos(radians(lat)) AS y,
    {nn}*(1 - {e2})*sin(radians(lat)) AS z
  FROM (SELECT poi_id, {qlon} AS lon, {qlat} AS lat FROM
    (SELECT unnest(generate_series(0, {CAP_NPOI - 1})) AS poi_id))
),
d AS (
  SELECT p.poi_id, c.cell_id,
    (c.x-p.x)*(c.x-p.x) + (c.y-p.y)*(c.y-p.y) + (c.z-p.z)*(c.z-p.z) AS d2
  FROM poi p CROSS JOIN cells c
)
SELECT poi_id, cell_id, CAST(floor(d2 / 1000000.0) AS BIGINT) AS d2_mm2
FROM d WHERE d2 <= {CAP_D2!r}
"""


# ---------------------------------------------------------------------------
# Round 2d: co-occurrence matrix + constraint audit
# ---------------------------------------------------------------------------

def q_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered event_type
    pair, the number of (user, day) baskets containing both.  ONE
    h(user, day) bucket exchange; inside a bucket each basket
    collapses to a 5-bit type mask and the 10 pair counters bump off
    the mask — partials leaving a bucket are <= 15 rows."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    types = list(PIVOT_TYPES)
    t_idx = {t: i for i, t in enumerate(types)}
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        day = ts // 86_400_000_000
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        bit = np.array([1 << t_idx[t] for t in et], dtype=np.int64)
        basket = uid * 1_000_000 + day  # day < 1e6: collision-free key
        # per-batch partial: OR the bits per basket
        bu, bi = np.unique(basket, return_inverse=True)
        mask = np.zeros(len(bu), dtype=np.int64)
        np.bitwise_or.at(mask, bi, bit)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(bu, n_buckets)),
            "basket": pa.array(bu),
            "mask": pa.array(mask),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        b = g["basket"].to_numpy(zero_copy_only=False)
        m = g["mask"].to_numpy(zero_copy_only=False)
        bu, bi = np.unique(b, return_inverse=True)
        full = np.zeros(len(bu), dtype=np.int64)
        np.bitwise_or.at(full, bi, m)
        ta, tb, nb = [], [], []
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                n = int(np.count_nonzero(
                    (full & (1 << i)).astype(bool) & (full & (1 << j)).astype(bool)
                ))
                if n:
                    ta.append(types[i])
                    tb.append(types[j])
                    nb.append(n)
        return pa.table({
            "type_a": pa.array(ta, type=pa.string()),
            "type_b": pa.array(tb, type=pa.string()),
            "n_baskets": pa.array(nb, type=pa.int64()),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return (
        b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_baskets", alias_name="n_baskets"))
    )


def sql_cooccurrence() -> str:
    return """
WITH basket AS MATERIALIZED (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day, event_type
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(COUNT(*) AS BIGINT) AS n_baskets
FROM basket a
JOIN basket b ON b.user_id = a.user_id AND b.day = a.day
  AND b.event_type > a.event_type
GROUP BY 1, 2
"""


def q_constraint_audit(sf_dir: str):
    """Data-quality constraint audit in one pass per table (the
    'dbt tests at 100 TB' shape — every check is a map-side count, the
    referential check is the bucket anti-join): duplicate order keys,
    out-of-range values, orphan orders (o_custkey missing from
    customer), negative prices.  Output: one row per check."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"],
                   blocks=4)
    cust = _read(sf_dir, "customer", columns=["c_custkey"], blocks=4)
    events = _read(sf_dir, "events", columns=["value"], blocks=4)

    def ev_checks(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "check_name": pa.array(["events_value_negative"]),
            "n": pa.array(
                np.array([np.count_nonzero(v < 0)], dtype=np.int64)
            ),
        })

    def ord_checks(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "check_name": pa.array(["orders_price_nonpositive"]),
            "n": pa.array(
                np.array([np.count_nonzero(p <= 0)], dtype=np.int64)
            ),
        })

    # referential + uniqueness need co-location: one union bucket
    # exchange keyed by the integer key
    def ord_keys(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        ku, kc = np.unique(ok, return_counts=True)
        cu, cc = np.unique(ck, return_counts=True)
        return pa.table({
            "bucket": pa.array(np.concatenate([
                hash_bucket_u64(ku, n_buckets), hash_bucket_u64(cu, n_buckets),
            ])),
            "key": pa.array(np.concatenate([ku, cu]).astype(np.int64)),
            "kind": pa.array(np.concatenate([
                np.zeros(len(ku), dtype=np.int64),   # order key count
                np.full(len(cu), 1, dtype=np.int64),  # custkey reference
            ])),
            "n": pa.array(np.concatenate([kc, cc]).astype(np.int64)),
        })

    def cust_keys(batch: pa.Table) -> pa.Table:
        k = np.unique(batch["c_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(k, n_buckets)),
            "key": pa.array(k.astype(np.int64)),
            "kind": pa.array(np.full(len(k), 2, dtype=np.int64)),  # cust dim
            "n": pa.array(np.ones(len(k), dtype=np.int64)),
        })

    keyed = orders.map_batches(
        ord_keys, batch_format="pyarrow", zero_copy_batch=True
    ).union(cust.map_batches(
        cust_keys, batch_format="pyarrow", zero_copy_batch=True
    ))

    def per_bucket(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        # duplicate orderkeys: total per key > 1 among kind-0 rows
        ok = kind == 0
        ku, ki = np.unique(key[ok], return_inverse=True)
        cnt = np.zeros(len(ku), dtype=np.int64)
        np.add.at(cnt, ki, n[ok])
        dup = int(np.count_nonzero(cnt > 1))
        # orphan orders: kind-1 custkeys with no kind-2 row
        refs = kind == 1
        ru, ri = np.unique(key[refs], return_inverse=True)
        rn = np.zeros(len(ru), dtype=np.int64)
        np.add.at(rn, ri, n[refs])
        dim = np.unique(key[kind == 2])
        pos = np.searchsorted(dim, ru)
        present = (pos < len(dim)) & (dim[np.minimum(pos, len(dim) - 1)] == ru)
        orphan = int(rn[~present].sum())
        return pa.table({
            "check_name": pa.array(
                ["orders_orderkey_duplicate", "orders_custkey_orphan"],
                type=pa.string(),
            ),
            "n": pa.array([dup, orphan], type=pa.int64()),
        })

    audits = (
        events.map_batches(ev_checks, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            orders.map_batches(
                ord_checks, batch_format="pyarrow", zero_copy_batch=True
            ),
            keyed.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow"),
        )
    )
    return audits.groupby("check_name").aggregate(Sum("n", alias_name="n"))


def sql_constraint_audit() -> str:
    return """
SELECT 'events_value_negative' AS check_name,
  CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT) AS n FROM events
UNION ALL
SELECT 'orders_price_nonpositive',
  CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
UNION ALL
SELECT 'orders_orderkey_duplicate',
  CAST(COUNT(*) AS BIGINT) FROM (
    SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
UNION ALL
SELECT 'orders_custkey_orphan',
  CAST(COUNT(*) AS BIGINT) FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


# ---------------------------------------------------------------------------
# Round 2d: image quality filter + thumbnail pyramid
# ---------------------------------------------------------------------------

IMGVAR_MIN = 4_000_000_000  # 1024^2-scaled channel-0 variance threshold


def q_image_quality_filter(sf_dir: str):
    """Low-texture image filter (the visual twin of the text quality
    gate): decode -> resize(32) -> INTEGER per-channel variance
    var_q = 1024*sum(px^2) - sum(px)^2 (exact — no float std), flag
    images with channel-0 var_q below threshold.  Actor-pool decode,
    small batches, payloads never shuffle; emits only flagged rows."""
    from rhealpixdggs_py_ray.fixtures import decode_image, write_images_table
    from rhealpixdggs_py_ray.ops.multimodal import resize_nearest

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8))

    class VarStage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy()
            hs = batch["h"].to_numpy()
            ids = batch["image_id"].to_pylist()
            out = {"image_id": [], "var_r_q": [], "var_g_q": [], "var_b_q": []}
            for k in range(len(blobs)):
                pix = decode_image(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
                small = resize_nearest(pix, 32, 32).astype(np.int64)
                s = small.sum(axis=(0, 1))
                s2 = (small * small).sum(axis=(0, 1))
                v = 1024 * s2 - s * s
                if v[0] < IMGVAR_MIN:
                    out["image_id"].append(ids[k])
                    out["var_r_q"].append(int(v[0]))
                    out["var_g_q"].append(int(v[1]))
                    out["var_b_q"].append(int(v[2]))
            return pa.table({
                "image_id": pa.array(out["image_id"], type=pa.string()),
                "var_r_q": pa.array(np.array(out["var_r_q"], dtype=np.int64)),
                "var_g_q": pa.array(np.array(out["var_g_q"], dtype=np.int64)),
                "var_b_q": pa.array(np.array(out["var_b_q"], dtype=np.int64)),
            })

    return ds.map_batches(
        VarStage, batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )


def sql_image_quality_filter() -> str:
    src = _image_src_sql()

    def val(c: int) -> str:
        return (
            "(((CAST(gj AS BIGINT) * w) // 32) * 3"
            " + ((CAST(gi AS BIGINT) * h) // 32) * 5"
            f" + {c * 7} + CAST((u >> {8 * c}) & 255 AS BIGINT)) % 256"
        )

    vars_ = ", ".join(
        f"1024 * SUM(({val(c)}) * ({val(c)})) - SUM({val(c)}) * SUM({val(c)})"
        f" AS v{c}"
        for c in range(3)
    )
    return f"""
WITH f AS MATERIALIZED (SELECT image_id, w, h, u FROM {src} t),
g AS (SELECT gi.gi, gj.gj FROM
  (SELECT unnest(generate_series(0, 31)) AS gi) gi,
  (SELECT unnest(generate_series(0, 31)) AS gj) gj),
v AS MATERIALIZED (
  SELECT image_id, {vars_} FROM f, g GROUP BY image_id
)
SELECT image_id, CAST(v0 AS BIGINT) AS var_r_q, CAST(v1 AS BIGINT)
  AS var_g_q, CAST(v2 AS BIGINT) AS var_b_q
FROM v WHERE v0 < {IMGVAR_MIN}
"""


PYRAMID_LEVELS = (32, 16, 8)


def q_image_pyramid(sf_dir: str):
    """Thumbnail pyramid in ONE decode pass: each image decodes once
    and resizes to 32/16/8; per-level channel-0 centi-mean sums
    aggregate globally.  The multi-output map shape for 'generate all
    serving resolutions in one read' — 3 output rows per image, never
    3 decodes."""
    from rhealpixdggs_py_ray.fixtures import decode_image, write_images_table
    from rhealpixdggs_py_ray.ops.multimodal import resize_nearest

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8))

    class PyramidStage:
        def __call__(self, batch: pa.Table) -> pa.Table:
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy()
            hs = batch["h"].to_numpy()
            n = len(blobs)
            levels = np.empty((n, len(PYRAMID_LEVELS)), dtype=np.int64)
            for k in range(n):
                pix = decode_image(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
                for li, L in enumerate(PYRAMID_LEVELS):
                    small = resize_nearest(pix, L, L).astype(np.int64)
                    m = small[:, :, 0].sum() / (L * L)
                    levels[k, li] = int(np.floor(m * 100))
            out_lv, out_n, out_s = [], [], []
            for li, L in enumerate(PYRAMID_LEVELS):
                out_lv.append(L)
                out_n.append(n)
                out_s.append(int(levels[:, li].sum()))
            return pa.table({
                "level": pa.array(np.array(out_lv, dtype=np.int64)),
                "n": pa.array(np.array(out_n, dtype=np.int64)),
                "sum_mean_r_c": pa.array(np.array(out_s, dtype=np.int64)),
            })

    p = ds.map_batches(
        PyramidStage, batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )
    return p.groupby("level").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_mean_r_c", alias_name="sum_mean_r_c"),
    )


def sql_image_pyramid() -> str:
    src = _image_src_sql()
    parts = []
    for L in PYRAMID_LEVELS:
        val = (
            f"(((CAST(gj AS BIGINT) * w) // {L}) * 3"
            f" + ((CAST(gi AS BIGINT) * h) // {L}) * 5"
            " + CAST(u & 255 AS BIGINT)) % 256"
        )
        parts.append(f"""
SELECT CAST({L} AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(m) AS BIGINT) AS sum_mean_r_c FROM (
  SELECT image_id,
    CAST(floor((SUM({val}) / {float(L * L)!r}) * 100) AS BIGINT) AS m
  FROM (SELECT image_id, w, h, u FROM {src} t) f,
    (SELECT gi.gi, gj.gj FROM
      (SELECT unnest(generate_series(0, {L - 1})) AS gi) gi,
      (SELECT unnest(generate_series(0, {L - 1})) AS gj) gj) g
  GROUP BY image_id)""")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# Round 2d: stream-stream window join + exact deep pagination
# ---------------------------------------------------------------------------

SSJOIN_WINDOW_US = 3_600_000_000  # 1 h


def q_window_join(sf_dir: str):
    """Stream-stream interval self-join: (click, purchase) pairs by the
    same user with 0 < t_purchase - t_click <= 1 h — the classic
    attribution join.  ONE h(user) bucket exchange; inside a bucket a
    merged lexsort + two-pointer vectorized searchsorted counts pairs
    per user without materializing the pair table (the SQL oracle's
    join DOES build it — the pipeline is strictly cheaper).  Output:
    per-user pair count + matched-purchase count."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)[keep]
        )
        is_p = (et[keep] == "purchase").astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "is_p": pa.array(is_p),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        is_p = g["is_p"].to_numpy(zero_copy_only=False).astype(bool)
        out_u, out_pairs, out_m = [], [], []
        order = np.lexsort((t, uid))
        uid, t, is_p = uid[order], t[order], is_p[order]
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]])
        )
        ends = np.append(starts[1:], len(uid))
        for s, e in zip(starts, ends):
            ct = t[s:e][~is_p[s:e]]
            pt = t[s:e][is_p[s:e]]
            if len(ct) == 0 or len(pt) == 0:
                continue
            # pairs per purchase: clicks in [pt - W, pt)
            lo = np.searchsorted(ct, pt - SSJOIN_WINDOW_US)
            hi = np.searchsorted(ct, pt)  # strict: click < purchase
            cnt = hi - lo
            n_pairs = int(cnt.sum())
            if n_pairs:
                out_u.append(int(uid[s]))
                out_pairs.append(n_pairs)
                out_m.append(int(np.count_nonzero(cnt > 0)))
        return pa.table({
            "user_id": pa.array(np.array(out_u, dtype=np.int64)),
            "n_pairs": pa.array(np.array(out_pairs, dtype=np.int64)),
            "n_matched_purchases": pa.array(np.array(out_m, dtype=np.int64)),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_window_join() -> str:
    return f"""
WITH c AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'
),
p AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS t FROM events
  WHERE event_type = 'purchase'
),
pairs AS MATERIALIZED (
  -- purchase EVENTS, not timestamps: two purchases at the same ts are
  -- distinct matches (surfaced by the hot-key skew test)
  SELECT p.user_id, p.event_id AS pe, c.t AS ct
  FROM p JOIN c ON c.user_id = p.user_id
    AND c.t < p.t AND c.t >= p.t - {SSJOIN_WINDOW_US}
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
  CAST(COUNT(DISTINCT pe) AS BIGINT) AS n_matched_purchases
FROM pairs GROUP BY user_id
"""


PAGE_OFFSET = 100
PAGE_SIZE = 10


def q_page_orders(sf_dir: str):
    """Exact deep pagination (rows ranked 101..110 by totalprice DESC,
    orderkey ASC) WITHOUT a global sort: a driver-folded cent
    histogram finds the price cut that brackets the page, only the
    ~page-sized candidate slice ships to the driver for the final
    exact ordering — the OFFSET/LIMIT shape that stays O(page), not
    O(offset), at 100 TB."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def hist(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cu, cc = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(cu), "n": pa.array(cc.astype(np.int64))})

    folded: dict[int, int] = {}
    for bt in ds.map_batches(
        hist, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        for c, n in zip(bt["c"].to_numpy(zero_copy_only=False),
                        bt["n"].to_numpy(zero_copy_only=False)):
            folded[int(c)] = folded.get(int(c), 0) + int(n)
    cs = np.array(sorted(folded, reverse=True), dtype=np.int64)  # DESC
    cum = np.cumsum([folded[int(c)] for c in cs])
    # the page needs ranks (PAGE_OFFSET, PAGE_OFFSET + PAGE_SIZE];
    # candidates: every row with cent >= the cent at rank OFFSET+SIZE
    cut = int(cs[np.searchsorted(cum, PAGE_OFFSET + PAGE_SIZE)])

    def cand(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keep = c >= cut
        return pa.table({
            "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
            "price_c": pa.array(c[keep]),
        })

    rows = ds.map_batches(
        cand, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: <= OFFSET + SIZE + ties at the cut cent
    rows.sort(key=lambda r: (-r["price_c"], r["o_orderkey"]))
    page = rows[PAGE_OFFSET:PAGE_OFFSET + PAGE_SIZE]
    return ray.data.from_arrow(pa.table({
        "rank": pa.array(
            np.arange(PAGE_OFFSET + 1, PAGE_OFFSET + 1 + len(page),
                      dtype=np.int64)
        ),
        "o_orderkey": pa.array(
            np.array([r["o_orderkey"] for r in page], dtype=np.int64)
        ),
        "price_c": pa.array(
            np.array([r["price_c"] for r in page], dtype=np.int64)
        ),
    }))


def sql_page_orders() -> str:
    return f"""
SELECT CAST(rn AS BIGINT) AS rank, o_orderkey, price_c FROM (
  SELECT o_orderkey,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
    row_number() OVER (
      ORDER BY floor(o_totalprice * 100) DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn > {PAGE_OFFSET} AND rn <= {PAGE_OFFSET + PAGE_SIZE}
"""


def q_dedup_editdist(sf_dir: str):
    """Edit-distance near-dup refine: exact Levenshtein over the
    minhash-LSH candidate pairs (ops/dedup.editdist_pairs) — the
    byte-accurate last pass after cheap LSH blocking."""
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.editdist_pairs(_docs(sf_dir))


def sql_dedup_editdist() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.editdist_sql()


# ---------------------------------------------------------------------------
# Round 2e: ANN recall evaluation + incremental ingest merge
# ---------------------------------------------------------------------------

def q_ann_recall(sf_dir: str):
    """ANN quality evaluation as a first-class pipeline: recall@k of
    the LSH index against exact brute-force, per query.  Both sides
    are the existing distributed pipelines; their outputs are
    Q x k-bounded, so the compare is a driver-side set intersection —
    the eval harness a production ANN deployment runs per re-index."""
    from rhealpixdggs_py_ray.ops import ann

    import concurrent.futures as cf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    emb2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    with cf.ThreadPoolExecutor(2) as ex:  # both pipelines execute at once
        fb = ex.submit(lambda: ann.ann_topk(emb).take_all())
        fa = ex.submit(lambda: ann.ann_topk_lsh(emb2).take_all())
        brute, approx = fb.result(), fa.result()
    b_by_q: dict[int, set[int]] = {}
    for r in brute:
        b_by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    a_by_q: dict[int, set[int]] = {}
    for r in approx:
        a_by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    qids = sorted(b_by_q)
    n_brute = np.array([len(b_by_q[q]) for q in qids], dtype=np.int64)
    n_hit = np.array(
        [len(b_by_q[q] & a_by_q.get(q, set())) for q in qids], dtype=np.int64
    )
    return ray.data.from_arrow(pa.table({
        "qid": pa.array(np.array(qids, dtype=np.int64)),
        "n_brute": pa.array(n_brute),
        "n_hit": pa.array(n_hit),
        "recall_micros": pa.array(n_hit * 1_000_000 // n_brute),
    }))


def sql_ann_recall() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return f"""
WITH b AS MATERIALIZED ({ann.ann_topk_sql()}),
l AS MATERIALIZED ({ann.ann_topk_lsh_sql()}),
hit AS MATERIALIZED (
  SELECT b.qid, CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit
  FROM b LEFT JOIN l ON l.qid = b.qid AND l.vec_id = b.vec_id
  GROUP BY b.qid
),
nb AS MATERIALIZED (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_brute FROM b GROUP BY qid
)
SELECT nb.qid, nb.n_brute, hit.n_hit,
  hit.n_hit * 1000000 // nb.n_brute AS recall_micros
FROM nb JOIN hit ON hit.qid = nb.qid
"""


INCR_SPLIT_DAY = 15


def q_incremental_merge(sf_dir: str):
    """Incremental materialized-view maintenance: the per-type
    (count, sum) state built from the first half of the month MERGES
    with the second half's delta — associative integer partials, so
    merge(old_state, delta) == full recompute, which is exactly what
    the oracle computes.  The at-scale shape: yesterday's state is a
    tiny table, only the delta is scanned."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def half(which: int):
        def partial(batch: pa.Table) -> pa.Table:
            ts = (
                batch["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
            day = ts // 86_400_000_000 - 19723  # days since 2024-01-01
            m = (day < INCR_SPLIT_DAY) if which == 0 else (day >= INCR_SPLIT_DAY)
            et = batch["event_type"].to_numpy(zero_copy_only=False)[m]
            vc = np.floor(
                batch["value"].to_numpy(zero_copy_only=False)[m] * 100
            ).astype(np.int64)
            eu, ei = np.unique(et, return_inverse=True)
            n = np.bincount(ei, minlength=len(eu)).astype(np.int64)
            s = np.zeros(len(eu), dtype=np.int64)
            np.add.at(s, ei, vc)
            return pa.table({
                "event_type": pa.array(eu),
                "n": pa.array(n),
                "sum_value_c": pa.array(s),
            })
        return partial

    state = ds.map_batches(
        half(0), batch_format="pyarrow", zero_copy_batch=True
    )
    delta = ds.map_batches(
        half(1), batch_format="pyarrow", zero_copy_batch=True
    )
    return state.union(delta).groupby("event_type").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_value_c", alias_name="sum_value_c"),
    )


def sql_incremental_merge() -> str:
    return (
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) AS BIGINT)"
        " AS sum_value_c FROM events GROUP BY event_type"
    )


# ---------------------------------------------------------------------------
# Round 2e: BPE merge-candidate counting
# ---------------------------------------------------------------------------

BPE_TOPK = 20


def q_bpe_pairs(sf_dir: str):
    """The inner loop of BPE tokenizer training: corpus-wide counts of
    ADJACENT token pairs, global top-20 (count DESC, pair ASC).
    Per-batch np.unique partials over the pair strings -> disjoint
    hash-bucket exchange -> exact per-bucket top-k -> tiny final merge
    (the vocab query's bigram sibling; same no-global-sort shape)."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        cnt: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = text.split()
            for i in range(len(toks) - 1):
                cnt[(toks[i], toks[i + 1])] += 1
        t1 = [k[0] for k in cnt]
        t2 = [k[1] for k in cnt]
        n = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
        bucket = np.fromiter(
            (md5_u64(f"{a}\x01{b}") % n_buckets for a, b in cnt),
            dtype=np.int64, count=len(cnt),
        )
        return pa.table({
            "bucket": pa.array(bucket),
            "t1": pa.array(t1, type=pa.string()),
            "t2": pa.array(t2, type=pa.string()),
            "n": pa.array(n),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        t1 = g["t1"].to_numpy(zero_copy_only=False)
        t2 = g["t2"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        key = np.fromiter(
            (a + "\x01" + b for a, b in zip(t1, t2)), dtype=object, count=len(t1)
        )
        uq, first, inv = np.unique(key, return_index=True, return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, n)
        u1, u2 = t1[first], t2[first]
        order = np.lexsort((u2, u1, -tot))[:BPE_TOPK]
        return pa.table({
            "t1": pa.array(u1[order], type=pa.string()),
            "t2": pa.array(u2[order], type=pa.string()),
            "n": pa.array(tot[order]),
        })

    b = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        t1 = g["t1"].to_numpy(zero_copy_only=False)
        t2 = g["t2"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t2, t1, -n))[:BPE_TOPK]
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "t1": pa.array(t1[order], type=pa.string()),
            "t2": pa.array(t2[order], type=pa.string()),
            "n": pa.array(n[order]),
        })

    return parts.map_batches(
        lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow",
    ).groupby("g").map_groups(final, batch_format="pyarrow")


def sql_bpe_pairs() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''
),
pairs AS MATERIALIZED (
  SELECT w[i] AS t1, w[i + 1] AS t2, CAST(COUNT(*) AS BIGINT) AS n
  FROM toks, unnest(generate_series(1, len(w) - 1)) AS g(i)
  GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, t1, t2) AS BIGINT) AS rank,
  t1, t2, n
FROM pairs ORDER BY n DESC, t1, t2 LIMIT {BPE_TOPK}
"""


# ---------------------------------------------------------------------------
# Round 2e: uncompact (compress's inverse)
# ---------------------------------------------------------------------------

def q_uncompact_cells(sf_dir: str):
    """uncompact: expand the COMPRESSED polyfill cover back to uniform
    POLYFILL_RES — compress_order_cells' inverse, completing the
    H3-workalike compact/uncompact pair.  The expansion is a
    distributed map over the compressed cells (each emits its
    N^(2*(res-r')) descendants via vectorized digit appends); the
    oracle is the ORIGINAL uniform cover, so round-trip losslessness
    is what the hash verifies."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = W.polyfill(geo.Polygon(POLYFILL_POLY), POLYFILL_RES, plane=False, cfg=CFG)
    comp = W.compress_order_cells(list(cells))
    ds = ray.data.from_arrow(
        pa.table({"cell_id": pa.array(comp, type=pa.string())})
    )

    def expand(batch: pa.Table) -> pa.Table:
        N = CFG.N_side
        ids = batch["cell_id"].to_pylist()
        u = su.from_string(ids)
        res = su.resolution_of(u)
        out = []
        for k in range(len(u)):
            need = POLYFILL_RES - int(res[k])
            cur = np.array([u[k]], dtype=np.uint64)
            for lvl in range(need):
                # append every digit 0..N^2-1 at the next level
                # (with_digit levels are 1-based)
                reps = np.repeat(cur, N * N)
                digs = np.tile(np.arange(N * N, dtype=np.int64), len(cur))
                cur = su.with_digit(reps, int(res[k]) + lvl + 1, digs)
            # stamp the packed resolution field to the target res
            cur = (cur & ~np.uint64(0xF)) | np.uint64(POLYFILL_RES)
            out.append(cur)
        allu = np.concatenate(out) if out else np.array([], dtype=np.uint64)
        return pa.table({
            "cell_id": pa.array(
                np.sort(su.to_string_fixed(allu, POLYFILL_RES)),
                type=pa.string(),
            )
        })

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def sql_uncompact_cells() -> str:
    return oracle.polyfill_sql(POLYFILL_POLY, POLYFILL_RES, CFG)


# ---------------------------------------------------------------------------
# Round 2e: grid distance (h3_distance workalike)
# ---------------------------------------------------------------------------

GRIDDIST_RES = 4


def q_grid_distance(sf_dir: str):
    """Grid (Chebyshev) distance between consecutive events of each
    user, in band (row, col-mod-wrap) space at res 4 — the
    h3_distance workalike, defined on equatorial-face pairs where the
    planar grid metric is closed-form (CLAUDE.md band rule).  Pure map
    after ONE h(user) bucket exchange (same shape as
    trajectory_segments); pairs with either endpoint off the
    equatorial band drop."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    nrow = CFG.N_side**GRIDDIST_RES
    ncol = 4 * nrow
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        lon, lat = oracle.lonlat_from_id(eid)
        u = idx.cell_from_point(CFG, GRIDDIST_RES, lon, lat, plane=False)
        face = su.face_of(u)
        _, digits, _ = su.unpack(u)
        N = CFG.N_side
        row = np.zeros(len(u), dtype=np.int64)
        col = np.zeros(len(u), dtype=np.int64)
        for i in range(GRIDDIST_RES):
            row = row * N + digits[:, i] // N
            col = col * N + digits[:, i] % N
        gcol = (face.astype(np.int64) - 1) * nrow + col
        eq = (face >= 1) & (face <= 4)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(eid.astype(np.int64)),
            "row": pa.array(np.where(eq, row, -1)),
            "gcol": pa.array(gcol),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, eid = uid[order], eid[order]
        row = g["row"].to_numpy(zero_copy_only=False)[order]
        gcol = g["gcol"].to_numpy(zero_copy_only=False)[order]
        same = uid[1:] == uid[:-1]
        both_eq = (row[1:] >= 0) & (row[:-1] >= 0)
        m = same & both_eq
        dr = np.abs(row[1:] - row[:-1])
        dcol_raw = np.abs(gcol[1:] - gcol[:-1])
        dc = np.minimum(dcol_raw, ncol - dcol_raw)  # east-west wrap
        d = np.maximum(dr, dc)
        return pa.table({
            "event_id": pa.array(eid[1:][m]),          # the later endpoint
            "user_id": pa.array(uid[1:][m]),
            "grid_dist": pa.array(d[m].astype(np.int64)),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_grid_distance() -> str:
    res, N = GRIDDIST_RES, CFG.N_side
    nrow = N**res
    ncol = 4 * nrow
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), res, CFG, id_cols=("event_id",)
    )
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row = "(" + " + ".join(
        f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    colf = "(" + " + ".join(
        f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    fidx = (
        "(CASE substr(cell_id, 1, 1) "
        + " ".join(f"WHEN '{c}' THEN {i}" for i, c in enumerate(CELLS0))
        + " END)"
    )
    return f"""
WITH cells AS MATERIALIZED (
  SELECT event_id, cell_id,
    CASE WHEN substr(cell_id, 1, 1) IN ('O','P','Q','R')
      THEN {row} ELSE -1 END AS row,
    ({fidx} - 1) * {nrow} + {colf} AS gcol
  FROM {inner} t
),
ev AS MATERIALIZED (
  SELECT e.event_id, e.user_id, e.ts, c.row, c.gcol
  FROM events e JOIN cells c ON c.event_id = e.event_id
),
lagged AS MATERIALIZED (
  SELECT event_id, user_id, row, gcol,
    lag(row) OVER w AS prow, lag(gcol) OVER w AS pgcol
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
  CAST(greatest(abs(row - prow),
    least(abs(gcol - pgcol), {ncol} - abs(gcol - pgcol))) AS BIGINT)
    AS grid_dist
FROM lagged
WHERE prow IS NOT NULL AND row >= 0 AND prow >= 0
"""


GRIDPATH_MAX = 16  # pairs farther than this many cells are dropped


def q_grid_path(sf_dir: str):
    """Lattice line between consecutive events of each user — the
    h3 grid_path_cells workalike: integer DDA on the global equatorial
    lattice (row, wrapped global column) at res 4.  For a pair at
    Chebyshev distance n, step k=0..n lands on
    (r0 + round(k*dr/n), (c0 + round(k*dc/n)) mod W) with round-half-up
    done in exact integer arithmetic ((2*k*d + n) // (2n)), dc taken
    the short way around the seam; pairs farther than GRIDPATH_MAX
    drop (corridor queries are short hops).  One h(user) exchange, then
    a bounded constant fan-out per pair — same scale shape as
    trajectory_segments + line_buffer."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    res = GRIDDIST_RES
    nrow = CFG.N_side**res
    W = 4 * nrow
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        lon, lat = oracle.lonlat_from_id(eid)
        u = idx.cell_from_point(CFG, res, lon, lat, plane=False)
        face = su.face_of(u)
        _, digits, _ = su.unpack(u)
        N = CFG.N_side
        row = np.zeros(len(u), dtype=np.int64)
        col = np.zeros(len(u), dtype=np.int64)
        for i in range(res):
            row = row * N + digits[:, i] // N
            col = col * N + digits[:, i] % N
        gcol = (face.astype(np.int64) - 1) * nrow + col
        eq = (face >= 1) & (face <= 4)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(eid.astype(np.int64)),
            "row": pa.array(np.where(eq, row, -1)),
            "gcol": pa.array(gcol),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, eid = uid[order], eid[order]
        row = g["row"].to_numpy(zero_copy_only=False)[order]
        gcol = g["gcol"].to_numpy(zero_copy_only=False)[order]
        same = uid[1:] == uid[:-1]
        both_eq = (row[1:] >= 0) & (row[:-1] >= 0)
        dr = row[1:] - row[:-1]
        # signed shortest east-west step: nonneg residue, then recenter
        dcn = ((gcol[1:] - gcol[:-1]) % W + W) % W
        dc = np.where(dcn >= W // 2, dcn - W, dcn)
        n = np.maximum(np.abs(dr), np.abs(dc))
        m = same & both_eq & (n <= GRIDPATH_MAX)
        eid2, uid2 = eid[1:][m], uid[1:][m]
        r0, c0 = row[:-1][m], gcol[:-1][m]
        dr, dc, n = dr[m], dc[m], n[m]
        # explode: one row per step k = 0..n (bounded fan-out)
        reps = n + 1
        j = np.repeat(np.arange(len(n)), reps)
        k = np.arange(len(j)) - np.repeat(np.cumsum(reps) - reps, reps)
        nn = np.maximum(n[j], 1)  # n==0 pairs only emit k=0 (k*d==0)
        rk = r0[j] + (2 * k * dr[j] + nn) // (2 * nn)
        ck = (c0[j] + (2 * k * dc[j] + nn) // (2 * nn)) % W
        return pa.table({
            "event_id": pa.array(eid2[j]),
            "user_id": pa.array(uid2[j]),
            "seq": pa.array(k.astype(np.int64)),
            "cell_id": pa.array(
                _cell_string_array_from_lattice(rk, ck, res), type=pa.string()),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_grid_path() -> str:
    res, N = GRIDDIST_RES, CFG.N_side
    nrow = N**res
    W = 4 * nrow
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), res, CFG, id_cols=("event_id",)
    )
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row = "(" + " + ".join(
        f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    colf = "(" + " + ".join(
        f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    fidx = (
        "(CASE substr(cell_id, 1, 1) "
        + " ".join(f"WHEN '{c}' THEN {i}" for i, c in enumerate(CELLS0))
        + " END)"
    )
    # rebuild the cell string from (rk, ck): face letter from the global
    # column, then res interleaved digits (row-digit*3 + col-digit)
    digits_sql = " || ".join(
        f"CAST((rk // {N ** (res - 1 - i)}) % {N} * {N} +"
        f" (ck % {nrow}) // {N ** (res - 1 - i)} % {N} AS VARCHAR)"
        for i in range(res)
    )
    return f"""
WITH cells AS MATERIALIZED (
  SELECT event_id,
    CASE WHEN substr(cell_id, 1, 1) IN ('O','P','Q','R')
      THEN {row} ELSE -1 END AS row,
    ({fidx} - 1) * {nrow} + {colf} AS gcol
  FROM {inner} t
),
ev AS MATERIALIZED (
  SELECT e.event_id, e.user_id, e.ts, c.row, c.gcol
  FROM events e JOIN cells c ON c.event_id = e.event_id
),
lagged AS MATERIALIZED (
  SELECT event_id, user_id, row, gcol,
    lag(row) OVER w AS prow, lag(gcol) OVER w AS pgcol
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pairs AS MATERIALIZED (
  SELECT event_id, user_id, prow AS r0, pgcol AS c0,
    row - prow AS dr,
    CASE WHEN (((gcol - pgcol) % {W}) + {W}) % {W} >= {W // 2}
      THEN (((gcol - pgcol) % {W}) + {W}) % {W} - {W}
      ELSE (((gcol - pgcol) % {W}) + {W}) % {W} END AS dc
  FROM lagged
  WHERE prow IS NOT NULL AND row >= 0 AND prow >= 0
),
bounded AS MATERIALIZED (
  SELECT *, greatest(abs(dr), abs(dc)) AS n FROM pairs
  WHERE greatest(abs(dr), abs(dc)) <= {GRIDPATH_MAX}
),
steps AS MATERIALIZED (
  SELECT event_id, user_id, k AS seq,
    r0 + CAST(floor((2.0 * k * dr + greatest(n, 1))
      / (2 * greatest(n, 1))) AS BIGINT) AS rk,
    ((c0 + CAST(floor((2.0 * k * dc + greatest(n, 1))
      / (2 * greatest(n, 1))) AS BIGINT)) % {W} + {W}) % {W} AS ck
  FROM bounded, unnest(generate_series(0, n)) AS t(k)
)
SELECT event_id, user_id, seq,
  substr('OPQR', CAST(ck // {nrow} AS INTEGER) + 1, 1) || {digits_sql} AS cell_id
FROM steps
"""


# ---------------------------------------------------------------------------
# Round 2e: snapshot diff (CDC-style table compare)
# ---------------------------------------------------------------------------

SNAPDIFF_CUT_DAY = 20
SNAPDIFF_REMOVE_DAY = 28


def q_snapshot_diff(sf_dir: str):
    """CDC-style snapshot diff: the old snapshot (all events) vs the
    new one (day>=28 rows dropped, day 20..27 values perturbed) —
    per-event_type modified / removed / unchanged counts.  Both snapshots meet in ONE
    h(event_id) union bucket exchange carrying only (key, row-hash)
    pairs — the migration-validation shape where neither side fits
    anywhere whole."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    n_buckets = sizing.exchange_buckets(8)
    ds_old = _read(sf_dir, "events",
                   columns=["event_id", "ts", "event_type", "value"], blocks=4)
    ds_new = _read(sf_dir, "events",
                   columns=["event_id", "ts", "event_type", "value"], blocks=4)

    def side(which: int):
        def partial(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False)
            ts = (
                batch["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
            day = ts // 86_400_000_000 - 19723
            et = batch["event_type"].to_numpy(zero_copy_only=False)
            vc = np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            if which == 0:  # old snapshot: every row, original values
                m = np.ones(len(eid), dtype=bool)
            else:  # new snapshot: day>=28 rows dropped ("removed"),
                # day 20..27 rows value-perturbed ("modified")
                m = day < SNAPDIFF_REMOVE_DAY
                vc = np.where(day >= SNAPDIFF_CUT_DAY, vc + 1, vc)
            eid, et, vc = eid[m], et[m], vc[m]
            h = np.fromiter(
                (md5_u64(f"{int(e)}|{int(v)}") for e, v in zip(eid, vc)),
                dtype=np.uint64, count=len(eid),
            ).view(np.int64)
            return pa.table({
                "bucket": pa.array(hash_bucket_u64(eid, n_buckets)),
                "key": pa.array(eid.astype(np.int64)),
                "event_type": pa.array(et),
                "h": pa.array(h),
                "side": pa.array(np.full(len(eid), which, dtype=np.int64)),
            })
        return partial

    both = ds_old.map_batches(
        side(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(ds_new.map_batches(
        side(1), batch_format="pyarrow", zero_copy_batch=True
    ))

    def per_bucket(g: pa.Table) -> pa.Table:
        key = g["key"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        sd = g["side"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        om = sd == 0
        oo = np.argsort(key[om])
        ok_, oh, oet = key[om][oo], h[om][oo], et[om][oo]
        nk, nh, net = key[~om], h[~om], et[~om]
        status = np.full(len(nk), "added", dtype=object)
        if len(ok_) and len(nk):
            pos = np.minimum(np.searchsorted(ok_, nk), len(ok_) - 1)
            hit = ok_[pos] == nk
            status[hit] = np.where(
                oh[pos[hit]] == nh[hit], "unchanged", "modified"
            )
        if len(nk) and len(ok_):
            no = np.sort(nk)
            pos2 = np.minimum(np.searchsorted(no, ok_), len(no) - 1)
            removed_m = no[pos2] != ok_
        else:
            removed_m = np.ones(len(ok_), dtype=bool)
        et_all = np.concatenate([net, oet[removed_m]])
        st_all = np.concatenate(
            [status, np.full(int(removed_m.sum()), "removed", dtype=object)]
        )
        pk = np.fromiter(
            (a + "\x01" + b for a, b in zip(et_all, st_all)),
            dtype=object, count=len(et_all),
        )
        uq, first, cnt = np.unique(pk, return_index=True, return_counts=True)
        return pa.table({
            "event_type": pa.array(et_all[first], type=pa.string()),
            "status": pa.array(st_all[first], type=pa.string()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    return (
        both.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["event_type", "status"]).aggregate(Sum("n", alias_name="n"))
    )


def sql_snapshot_diff() -> str:
    # the statuses are closed-form in event day: >=28 removed,
    # 20..27 modified, else unchanged — the oracle needs no join
    day = "(epoch_us(ts) // 86400000000 - 19723)"
    return f"""
SELECT event_type,
  CASE WHEN {day} >= {SNAPDIFF_REMOVE_DAY} THEN 'removed'
    WHEN {day} >= {SNAPDIFF_CUT_DAY} THEN 'modified'
    ELSE 'unchanged' END AS status,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 2e: in-memory polars/Arrow source
# ---------------------------------------------------------------------------

POLARS_N = 64_000


def q_polars_source(sf_dir: str):
    """Fourth source format: a deterministic in-memory polars frame
    enters Ray Data zero-copy via Arrow (from_arrow) and aggregates
    per group — the 'dataframe handoff' path (parquet, CSV, JSON-lines
    and Arrow-memory sources now all gate-verified)."""
    import polars as pl

    i = np.arange(POLARS_N, dtype=np.int64)
    frame = pl.DataFrame({
        "k": (i % 7),
        "v": (i * 2654435761) % 1_000_003,
    })
    ds = ray.data.from_arrow(frame.to_arrow())
    return ds.groupby("k").aggregate(
        Count(alias_name="n"),
        Sum("v", alias_name="sum_v"),
        Min("v", alias_name="min_v"),
        Max("v", alias_name="max_v"),
    )


def sql_polars_source() -> str:
    return f"""
SELECT i % 7 AS k, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM((i * 2654435761) % 1000003) AS BIGINT) AS sum_v,
  CAST(MIN((i * 2654435761) % 1000003) AS BIGINT) AS min_v,
  CAST(MAX((i * 2654435761) % 1000003) AS BIGINT) AS max_v
FROM (SELECT unnest(generate_series(0, {POLARS_N - 1})) AS i)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round 2e: space-time cube
# ---------------------------------------------------------------------------

CUBE_RES = 2


def q_space_time_cube(sf_dir: str):
    """Space-time cube: event counts per (res-2 cell, day) — the
    standard geo-analytics aggregation (hotspot detection input).
    Index + per-batch (cell, day) np.unique partials; one small
    exchange over the bounded (cells x days) key space."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        day = ts // 86_400_000_000
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG, CUBE_RES, lon, lat, plane=False)
        du, di = np.unique(day, return_inverse=True)
        cu, ci = np.unique(u, return_inverse=True)
        key = di * len(cu) + ci
        ku, kc = np.unique(key, return_counts=True)
        return pa.table({
            "cell_id": pa.array(
                su.to_string_fixed(cu[ku % len(cu)], CUBE_RES),
                type=pa.string(),
            ),
            "day": pa.array(du[ku // len(cu)]),
            "n": pa.array(kc.astype(np.int64)),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["cell_id", "day"]).aggregate(Sum("n", alias_name="n"))


def sql_space_time_cube() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), CUBE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
SELECT t.cell_id, epoch_us(e.ts) // 86400000000 AS day,
  CAST(COUNT(*) AS BIGINT) AS n
FROM {inner} t JOIN events e ON e.event_id = t.event_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 2f: window frames, watermarks, outer joins, span dedup, vector tiles
# ---------------------------------------------------------------------------

MOV_FRAME = 4  # ROWS BETWEEN 3 PRECEDING AND CURRENT ROW


def q_moving_avg(sf_dir: str):
    """Sliding window FRAME aggregate: per-user moving sum/count of
    value cents over the last MOV_FRAME events by time (SUM ... OVER
    (PARTITION BY user ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW)).  Same single h(user) bucket exchange as
    running_totals; the frame is a vectorized difference of the
    segmented cumsum — no per-row loop, no per-user group."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, nb)),
            "user_id": batch["user_id"],
            "t": pa.array(ts.astype(np.int64)),
            "event_id": batch["event_id"],
            "v_c": pa.array(np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        })

    def window(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["v_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, t, eid, v = uid[order], t[order], eid[order], v[order]
        n = len(v)
        cum = np.cumsum(v)
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        seg_start = starts[seg_id]
        i = np.arange(n)
        lo = np.maximum(i - (MOV_FRAME - 1), seg_start)
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "mov_sum_c": pa.array(cum - base),
            "n_frame": pa.array((i - lo + 1).astype(np.int64)),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(window, batch_format="pyarrow")


def sql_moving_avg() -> str:
    return (
        "SELECT event_id, user_id,"
        " CAST(SUM(CAST(floor(value*100) AS BIGINT)) OVER w AS BIGINT)"
        "  AS mov_sum_c,"
        " CAST(COUNT(*) OVER w AS BIGINT) AS n_frame"
        " FROM events WINDOW w AS ("
        f"  PARTITION BY user_id ORDER BY ts, event_id"
        f"  ROWS BETWEEN {MOV_FRAME - 1} PRECEDING AND CURRENT ROW)"
    )


LATE_GAP_US = 900_000_000  # 15 min watermark lag


def q_late_events(sf_dir: str):
    """Streaming watermark semantics, replayed deterministically: the
    arrival order of each user's events is the splitmix64(event_id)
    permutation (a fixed shuffle of the time order), the watermark is
    (max event time seen so far for that user) - 15 min, and an event
    is LATE if it arrives below the watermark (the row a streaming
    engine would drop or side-output).  One h(user) bucket exchange;
    the per-bucket resolve is a segmented running max (pandas groupby
    cummax, C-vectorized) + shift, not a per-event loop."""
    from rhealpixdggs_py_ray.fixtures import splitmix64
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, nb)),
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "t": pa.array(ts.astype(np.int64)),
            "arr": pa.array(splitmix64(eid.astype(np.uint64)).view(np.int64)),
        })

    def flag(g: pa.Table) -> pa.Table:
        arr_u = g["arr"].to_numpy(zero_copy_only=False).view(np.uint64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, arr_u, uid))
        eid, uid, t = eid[order], uid[order], t[order]
        n = len(t)
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        seg_id = np.cumsum(new_seg) - 1
        # segmented prefix-max via the offset trick: lift each segment
        # by seg_id*BIG so earlier segments can never win the
        # accumulate; falls back to a per-segment loop if the lift
        # would overflow int64 (gigantic buckets x time range)
        tm = t - t.min() if n else t
        big = int(tm.max()) + 1 if n else 1
        n_seg = int(seg_id[-1]) + 1 if n else 0
        if n and n_seg * big < (1 << 62):
            lifted = tm + seg_id * big
            cm = np.maximum.accumulate(lifted) - seg_id * big + t.min()
        else:
            cm = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(new_seg)
            for s, e in zip(starts, np.append(starts[1:], n)):
                cm[s:e] = np.maximum.accumulate(t[s:e])
        pm = np.empty(n, dtype=np.int64)
        pm[1:] = cm[:-1]
        has_pm = ~new_seg
        late = has_pm & (t < np.where(has_pm, pm, 0) - LATE_GAP_US)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "late": pa.array(late.astype(np.int64)),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(flag, batch_format="pyarrow")


def sql_late_events() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT event_id FROM events", "event_id", "event_id", "h"
    )
    return f"""
WITH arr AS MATERIALIZED (SELECT event_id, h FROM {sm} t),
e AS MATERIALIZED (
  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS t, arr.h
  FROM events e JOIN arr USING (event_id)
),
w AS (
  SELECT event_id, user_id, t,
    MAX(t) OVER (PARTITION BY user_id ORDER BY h, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM e
)
SELECT event_id, user_id,
  CAST(CASE WHEN pm IS NOT NULL AND t < pm - {LATE_GAP_US}
       THEN 1 ELSE 0 END AS BIGINT) AS late
FROM w
"""


def q_full_outer_days(sf_dir: str):
    """FULL OUTER join (completes the inner/left/semi/anti family):
    per-epoch-day event counts vs order counts, days surviving from
    EITHER side with the missing side COALESCEd to zero.  Both sides
    arrive as map-side per-day partials through ONE union bucket
    exchange on h(day); outer-ness is free in the resolve (a day's
    group emits whichever sides it holds)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    nb = 8
    events = _read(sf_dir, "events", columns=["ts"], blocks=4)
    orders = _read(sf_dir, "orders", columns=["o_orderdate"], blocks=4)

    def side_partial(col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ts = batch[col].to_numpy(zero_copy_only=False)
            day = ts.astype("datetime64[us]").astype(np.int64) // 86_400_000_000
            du, dc = np.unique(day, return_counts=True)
            return pa.table({
                "bucket": pa.array(hash_bucket_u64(du.astype(np.uint64), nb)),
                "day": pa.array(du),
                "n": pa.array(dc.astype(np.int64)),
                "side": pa.array(np.full(len(du), side, dtype=np.int64)),
            })
        return fn

    both = events.map_batches(
        side_partial("ts", 0), batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(
        side_partial("o_orderdate", 1), batch_format="pyarrow",
        zero_copy_batch=True,
    ))

    def resolve(g: pa.Table) -> pa.Table:
        day = g["day"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        du, di = np.unique(day, return_inverse=True)
        ev = np.zeros(len(du), dtype=np.int64)
        od = np.zeros(len(du), dtype=np.int64)
        np.add.at(ev, di[side == 0], n[side == 0])
        np.add.at(od, di[side == 1], n[side == 1])
        return pa.table({
            "day": pa.array(du),
            "n_events": pa.array(ev),
            "n_orders": pa.array(od),
        })

    return both.groupby("bucket").map_groups(resolve, batch_format="pyarrow")


def sql_full_outer_days() -> str:
    return """
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
o AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT COALESCE(e.day, o.day) AS day,
  CAST(COALESCE(e.n, 0) AS BIGINT) AS n_events,
  CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
FROM e FULL OUTER JOIN o ON e.day = o.day
"""


def q_rank_orders(sf_dir: str):
    """Ranking window functions (rank + dense_rank, the tie-aware pair
    row_number can't express): each order ranked by totalprice cents
    DESC within its customer.  One h(custkey) bucket exchange; ranks
    come from flag arithmetic on the lexsorted bucket (rank = offset of
    the latest price-change row within the segment, dense = count of
    price-change rows), fully vectorized."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ck.astype(np.uint64), nb)),
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "price_c": pa.array(np.floor(
                batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        })

    def ranks(g: pa.Table) -> pa.Table:
        ck = g["o_custkey"].to_numpy(zero_copy_only=False)
        ok = g["o_orderkey"].to_numpy(zero_copy_only=False)
        pc = g["price_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -pc, ck))
        ck, ok, pc = ck[order], ok[order], pc[order]
        n = len(ck)
        i = np.arange(n)
        new_seg = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        seg_start = starts[seg_id]
        chg = new_seg | np.r_[True, pc[1:] != pc[:-1]]
        last_chg = np.maximum.accumulate(np.where(chg, i, 0))
        cnt = np.cumsum(chg)
        return pa.table({
            "o_orderkey": pa.array(ok),
            "o_custkey": pa.array(ck),
            "price_c": pa.array(pc),
            "rnk": pa.array((last_chg - seg_start + 1).astype(np.int64)),
            "drnk": pa.array((cnt - cnt[seg_start] + 1).astype(np.int64)),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(ranks, batch_format="pyarrow")


def sql_rank_orders() -> str:
    return """
SELECT o_orderkey, o_custkey,
  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
  CAST(rank() OVER w AS BIGINT) AS rnk,
  CAST(dense_rank() OVER w AS BIGINT) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC)
"""


SPAN_W = 8  # tokens per span (substring-level dedup granule)


def q_dup_spans(sf_dir: str):
    """Substring-level duplication detection (the Lee-et-al "exact
    substring dedup" granule): every SPAN_W-token span of every
    document is fingerprinted (md5 of the space-joined window) and
    spans occurring in >= 2 distinct documents are reported with their
    document and occurrence counts.  Per-batch partials collapse each
    batch's spans to (span, n_occ, n_docs) before the single
    h(span) bucket exchange — the exploded span table itself never
    shuffles."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"], blocks=8)
    nb = 16

    def partial(batch: pa.Table) -> pa.Table:
        occ: dict[str, int] = {}
        docs: dict[str, int] = {}
        for text in batch["text"].to_pylist():
            toks = text.split()
            if len(toks) < SPAN_W:
                continue
            seen: set[str] = set()
            for i in range(len(toks) - SPAN_W + 1):
                h = hashlib.md5(
                    " ".join(toks[i:i + SPAN_W]).encode("utf-8")
                ).hexdigest()
                occ[h] = occ.get(h, 0) + 1
                seen.add(h)
            for h in seen:
                docs[h] = docs.get(h, 0) + 1
        grams = np.array(sorted(occ.keys()), dtype=object)
        gu64 = np.array(
            [int(h[:16], 16) for h in grams], dtype=np.uint64
        ) if len(grams) else np.array([], dtype=np.uint64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(gu64, nb)),
            "gram_md5": pa.array(grams, type=pa.string()),
            "occ": pa.array(
                np.array([occ[h] for h in grams], dtype=np.int64)),
            "docs": pa.array(
                np.array([docs[h] for h in grams], dtype=np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        gm = g["gram_md5"].to_numpy(zero_copy_only=False)
        gu, gi = np.unique(gm, return_inverse=True)
        occ = np.zeros(len(gu), dtype=np.int64)
        dcs = np.zeros(len(gu), dtype=np.int64)
        np.add.at(occ, gi, g["occ"].to_numpy(zero_copy_only=False))
        np.add.at(dcs, gi, g["docs"].to_numpy(zero_copy_only=False))
        keep = dcs >= 2
        return pa.table({
            "gram_md5": pa.array(gu[keep], type=pa.string()),
            "n_docs": pa.array(dcs[keep]),
            "n_occ": pa.array(occ[keep]),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(resolve, batch_format="pyarrow")


def sql_dup_spans() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''
),
grams AS MATERIALIZED (
  SELECT doc_id, md5(array_to_string(w[i:i + {SPAN_W - 1}], ' ')) AS gram_md5
  FROM toks, unnest(generate_series(1, len(w) - {SPAN_W - 1})) AS t(i)
)
SELECT gram_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS BIGINT) AS n_occ
FROM grams GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
"""


def q_vector_tiles(sf_dir: str):
    """Raster->vector tile export (the north rule's raster<->vector
    leg as ONE artifact): every res-TILE_RES tile holding events is
    emitted as its 4-corner ellipsoidal polygon (unordered vertex set,
    rotation-invariant like cell_boundary) annotated with the tile's
    event count — i.e. a vector layer ready for a tile server.  The
    count comes from the salted-combiner tile aggregation; the
    vertices are computed once per surviving tile (a few hundred
    rows), never per event."""
    ds = q_tile_counts(sf_dir)

    def expand(batch: pa.Table) -> pa.Table:
        tid = batch["tile_id"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        if len(tid) == 0:
            return pa.table({
                "tile_id": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "pt_lon_micros": pa.array([], type=pa.int64()),
                "pt_lat_micros": pa.array([], type=pa.int64()),
            })
        u = su.from_string(tid)
        v = idx.vertices(CFG, u, plane=False)  # (m, 4, 2) NW-rotated
        return pa.table({
            "tile_id": pa.array(np.repeat(tid, 4)),
            "n": pa.array(np.repeat(n, 4).astype(np.int64)),
            "pt_lon_micros": pa.array(
                np.floor(v[:, :, 0].ravel() * 1e6).astype(np.int64)),
            "pt_lat_micros": pa.array(
                np.floor(v[:, :, 1].ravel() * 1e6).astype(np.int64)),
        })

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def sql_vector_tiles() -> str:
    counts = sql_tile_counts()
    ul = oracle.grid_ul_sql(TILE_RES, CFG)
    w = oracle._lit(CFG.cell_width(TILE_RES))
    corners = (
        f"(WITH ulv AS (SELECT cell_id, xul, yul FROM {ul} t)"
        f" SELECT cell_id, xul AS xm, yul AS ym FROM ulv"
        f" UNION ALL SELECT cell_id, xul + {w}, yul FROM ulv"
        f" UNION ALL SELECT cell_id, xul + {w}, yul - {w} FROM ulv"
        f" UNION ALL SELECT cell_id, xul, yul - {w} FROM ulv)"
    )
    inv = oracle.inverse_sql(
        f"SELECT cell_id, xm, ym FROM {corners} t", CFG, id_cols=("cell_id",)
    )
    return f"""
WITH counts AS MATERIALIZED ({counts}),
pts AS MATERIALIZED (
  SELECT cell_id,
    CAST(floor(lon * 1e6) AS BIGINT) AS pt_lon_micros,
    CAST(floor(lat * 1e6) AS BIGINT) AS pt_lat_micros
  FROM {inv} t
)
SELECT c.tile_id, CAST(c.n AS BIGINT) AS n, p.pt_lon_micros, p.pt_lat_micros
FROM counts c JOIN pts p ON p.cell_id = c.tile_id
"""


# ---------------------------------------------------------------------------
# Round 2g: batching plans, mixture weights, normalization, overlay, Moran
# ---------------------------------------------------------------------------

LB_MAX_B = 15  # length buckets 2^0 .. 2^15 (fixture max is 100 tokens)


def q_length_buckets(sf_dir: str):
    """Sequence-length bucketing plan (the padding-waste audit a
    training data loader runs before batching): docs binned to
    power-of-two token-length buckets [2^b, 2^(b+1)), per bucket the
    doc count, true token total, padded token total (every doc padded
    to the bucket cap 2^(b+1)) and the implied waste.  Pure map +
    16-key combine — never a shuffle."""
    ds = _read(sf_dir, "documents", columns=["text"], blocks=4)
    powers = (1 << np.arange(LB_MAX_B + 2)).astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        n = np.array(
            [len(t.split()) for t in batch["text"].to_pylist()],
            dtype=np.int64,
        )
        n = n[n >= 1]
        b = np.searchsorted(powers, n, side="right") - 1
        bu, bi = np.unique(b, return_inverse=True)
        cnt = np.zeros(len(bu), dtype=np.int64)
        tok = np.zeros(len(bu), dtype=np.int64)
        np.add.at(cnt, bi, 1)
        np.add.at(tok, bi, n)
        return pa.table({
            "bucket": pa.array(bu),
            "n_docs": pa.array(cnt),
            "sum_tokens": pa.array(tok),
        })

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bucket").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_tokens", alias_name="sum_tokens"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        nd = batch["n_docs"].to_numpy(zero_copy_only=False)
        st = batch["sum_tokens"].to_numpy(zero_copy_only=False)
        cap = (np.int64(1) << (b + 1)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(b.astype(np.int64)),
            "n_docs": pa.array(nd.astype(np.int64)),
            "sum_tokens": pa.array(st.astype(np.int64)),
            "padded_tokens": pa.array(nd * cap),
            "waste_tokens": pa.array(nd * cap - st),
        })

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def sql_length_buckets() -> str:
    return f"""
WITH t AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
    ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n
  FROM documents
),
b AS (SELECT unnest(generate_series(0, {LB_MAX_B})) AS bucket),
m AS (
  SELECT b.bucket, t.n, (CAST(1 AS BIGINT) << (b.bucket + 1)) AS cap
  FROM t JOIN b ON t.n >= (CAST(1 AS BIGINT) << b.bucket)
    AND t.n < (CAST(1 AS BIGINT) << (b.bucket + 1))
  WHERE t.n >= 1
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n) AS BIGINT) AS sum_tokens,
  CAST(COUNT(*) * cap AS BIGINT) AS padded_tokens,
  CAST(COUNT(*) * cap - SUM(n) AS BIGINT) AS waste_tokens
FROM m GROUP BY bucket, cap
"""


MIX_ALPHA_NOTE = "alpha = 0.5 (sqrt temperature)"


def q_mixture_weights(sf_dir: str):
    """Data-mixture weights with temperature alpha=0.5 (the
    multi-source sampling schedule of large-corpus training): per
    source the token total T_s, weight_ppm = floor(1e6 * sqrt(T_s) /
    S) with S the left-to-right fold of sqrt(T_s) in source-name
    order (the engine's list_sum parity rule, ops/ann._seq_*).
    Map-side per-source token partials -> tiny groupby -> the global
    fold runs in-dataset on the one-block repartition."""
    ds = _read(sf_dir, "documents", columns=["source", "text"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        n = np.array(
            [len(t.split()) for t in batch["text"].to_pylist()],
            dtype=np.int64,
        )
        su_, si = np.unique(src, return_inverse=True)
        tok = np.zeros(len(su_), dtype=np.int64)
        np.add.at(tok, si, n)
        return pa.table({
            "source": pa.array(su_, type=pa.string()),
            "sum_tokens": pa.array(tok),
        })

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("source").aggregate(Sum("sum_tokens", alias_name="sum_tokens"))

    def weights(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        tok = batch["sum_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(src)  # name order = the SQL list ORDER BY
        s = 0.0
        for v in np.sqrt(tok[order].astype(np.float64)):
            s += v
        w = np.floor(
            (1e6 * np.sqrt(tok.astype(np.float64))) / s
        ).astype(np.int64)
        return pa.table({
            "source": pa.array(src, type=pa.string()),
            "sum_tokens": pa.array(tok),
            "weight_ppm": pa.array(w),
        })

    return agg.repartition(1).map_batches(
        weights, batch_format="pyarrow", zero_copy_batch=True
    )


def sql_mixture_weights() -> str:
    return """
WITH t AS MATERIALIZED (
  SELECT source,
    CAST(SUM(CASE WHEN trim(text) = '' THEN 0
      ELSE length(regexp_split_to_array(trim(text), '\\s+')) END)
      AS BIGINT) AS sum_tokens
  FROM documents GROUP BY 1
),
s AS (
  SELECT list_sum(list(sqrt(CAST(sum_tokens AS DOUBLE)) ORDER BY source))
    AS total FROM t
)
SELECT t.source, t.sum_tokens,
  CAST(floor((1e6 * sqrt(CAST(t.sum_tokens AS DOUBLE))) / s.total)
    AS BIGINT) AS weight_ppm
FROM t, s
"""


def q_zscore_events(sf_dir: str):
    """Per-group z-score normalization (feature scaling as a
    distributed two-pass): per event type the exact integer sufficient
    stats (n, Sigma c, Sigma c^2) are combined map-side and broadcast
    via ray.put, then a pure map emits z_milli = floor(1000 * (n*c -
    Sc) / sqrt(n*Sq - Sc^2)) — numerator and radicand are exact
    int64 (envelope: value<=561 -> c<=56101, safe through ~1e6 rows
    per type), so both sides floor the identical IEEE double."""
    import ray

    stats_ds = _read(sf_dir, "events", columns=["event_type", "value"], blocks=4)

    def spartial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        tu, ti = np.unique(et, return_inverse=True)
        n = np.zeros(len(tu), dtype=np.int64)
        sc = np.zeros(len(tu), dtype=np.int64)
        sq = np.zeros(len(tu), dtype=np.int64)
        np.add.at(n, ti, 1)
        np.add.at(sc, ti, c)
        np.add.at(sq, ti, c * c)
        return pa.table({
            "event_type": pa.array(tu, type=pa.string()),
            "n": pa.array(n), "sc": pa.array(sc), "sq": pa.array(sq),
        })

    stats = stats_ds.map_batches(
        spartial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Sum("sc", alias_name="sc"),
        Sum("sq", alias_name="sq"),
    ).take_all()  # bounded: one row per event type
    table = {
        r["event_type"]: (int(r["n"]), int(r["sc"]), int(r["sq"]))
        for r in stats
    }
    ref = ray.put(table)

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"], blocks=4)

    def zmap(batch: pa.Table) -> pa.Table:
        tab = ray.get(ref)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        tu, ti = np.unique(et, return_inverse=True)  # lookups per TYPE
        n = np.array([tab[t][0] for t in tu], dtype=np.int64)[ti]
        sc = np.array([tab[t][1] for t in tu], dtype=np.int64)[ti]
        sq = np.array([tab[t][2] for t in tu], dtype=np.int64)[ti]
        den2 = n * sq - sc * sc
        num = 1000 * (n * c - sc)
        z = np.zeros(len(c), dtype=np.int64)
        ok = den2 > 0
        z[ok] = np.floor(
            num[ok].astype(np.float64) / np.sqrt(den2[ok].astype(np.float64))
        ).astype(np.int64)
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "z_milli": pa.array(z),
        })

    return ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True)


def sql_zscore_events() -> str:
    return """
WITH c AS MATERIALIZED (
  SELECT event_id, event_type,
    CAST(floor(value * 100) AS BIGINT) AS c
  FROM events
),
s AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS sq
  FROM c GROUP BY 1
)
SELECT e.event_id, e.event_type,
  CAST(CASE WHEN s.n * s.sq - s.sc * s.sc <= 0 THEN 0
    ELSE floor(CAST(1000 * (s.n * e.c - s.sc) AS DOUBLE)
               / sqrt(CAST(s.n * s.sq - s.sc * s.sc AS DOUBLE)))
    END AS BIGINT) AS z_milli
FROM c e JOIN s USING (event_type)
"""


OVERLAY_A = [(-20.3, 30.2), (25.4, 33.1), (22.2, -8.4), (-18.7, -4.6)]
OVERLAY_B = [(0.3, 20.2), (45.6, 24.1), (41.4, -14.3), (2.6, -10.2)]
OVERLAY_RES = 4


def q_polygon_overlay(sf_dir: str):
    """Polygon overlay analysis via DGGS covers (the vector-GIS
    intersect/union estimate without polygon clipping): both polygons
    are rasterized to res-4 cell covers (polyfill semantics), the two
    cover sets meet in one cell groupby with a side bitmask, and the
    overlap report is (n_a, n_b, n_both, jaccard_ppm).  Cover sizes
    are resolution-bound, so the final gather is O(cover), never
    O(events)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    ca = sorted(W.polyfill(geo.Polygon(OVERLAY_A), OVERLAY_RES, plane=False, cfg=CFG))
    cb = sorted(W.polyfill(geo.Polygon(OVERLAY_B), OVERLAY_RES, plane=False, cfg=CFG))
    a_ds = ray.data.from_arrow(pa.table({
        "cell_id": pa.array(ca, type=pa.string()),
        "side": pa.array(np.ones(len(ca), dtype=np.int64)),
    }))
    b_ds = ray.data.from_arrow(pa.table({
        "cell_id": pa.array(cb, type=pa.string()),
        "side": pa.array(np.full(len(cb), 2, dtype=np.int64)),
    }))
    masks = a_ds.union(b_ds).groupby("cell_id").aggregate(
        Sum("side", alias_name="mask")
    )
    rows = masks.take_all()  # bounded by the covers
    m = np.array([r["mask"] for r in rows], dtype=np.int64)
    n_a = int(((m & 1) > 0).sum())
    n_b = int((m >= 2).sum())
    n_both = int((m == 3).sum())
    union = n_a + n_b - n_both
    return pa.table({
        "n_a": pa.array([n_a], type=pa.int64()),
        "n_b": pa.array([n_b], type=pa.int64()),
        "n_both": pa.array([n_both], type=pa.int64()),
        "jaccard_ppm": pa.array(
            [1_000_000 * n_both // union if union else 0], type=pa.int64()),
    })


def sql_polygon_overlay() -> str:
    a = oracle.polyfill_sql(OVERLAY_A, OVERLAY_RES, CFG)
    b = oracle.polyfill_sql(OVERLAY_B, OVERLAY_RES, CFG)
    return f"""
WITH a AS MATERIALIZED (SELECT cell_id FROM ({a}) t),
b AS MATERIALIZED (SELECT cell_id FROM ({b}) t),
m AS (
  SELECT (a.cell_id IS NOT NULL) AS ia, (b.cell_id IS NOT NULL) AS ib
  FROM a FULL OUTER JOIN b ON a.cell_id = b.cell_id
),
c AS (
  SELECT CAST(SUM(CASE WHEN ia THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN ib THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN ia AND ib THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM m
)
SELECT n_a, n_b, n_both,
  CAST(CASE WHEN n_a + n_b - n_both = 0 THEN 0
    ELSE (1000000 * n_both) // (n_a + n_b - n_both) END AS BIGINT)
    AS jaccard_ppm
FROM c
"""


MORAN_RES = 2  # 9 rows x 36 cols equatorial lattice


def q_morans_i(sf_dir: str):
    """Moran's I spatial-autocorrelation sufficient statistics over
    the equatorial res-2 event lattice (hotspot detection): x_i =
    event count per lattice cell (0 for empty cells), deviations
    d_i = n_cells*x_i - Sigma x kept integer, and the report is the
    exact integer pair (num = Sigma_{i~j} d_i d_j over the 8-neighbor
    lattice with east-west wrap, den = Sigma d_i^2) plus W = pair
    count; I = (n/W) * num/den for the caller.  Counting is
    distributed; the lattice fold is O(324), resolution-bound.
    Envelope: |d| <= 324 * n_events keeps num/den in int64 through
    ~1e7 events."""
    nrow = CFG.N_side**MORAN_RES
    ncol = 4 * nrow
    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG, MORAN_RES, lon, lat, plane=False)
        face = su.face_of(u)
        eq = (face >= 1) & (face <= 4)
        cu, ci = np.unique(u[eq], return_inverse=True)
        cnt = np.zeros(len(cu), dtype=np.int64)
        np.add.at(cnt, ci, 1)
        _, digits, _ = su.unpack(cu)
        N = CFG.N_side
        row = np.zeros(len(cu), dtype=np.int64)
        col = np.zeros(len(cu), dtype=np.int64)
        for i in range(MORAN_RES):
            row = row * N + digits[:, i] // N
            col = col * N + digits[:, i] % N
        k = row * ncol + (su.face_of(cu).astype(np.int64) - 1) * nrow + col
        return pa.table({"k": pa.array(k), "n": pa.array(cnt)})

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("k").aggregate(Sum("n", alias_name="n"))
    rows = agg.take_all()  # bounded: <= nrow*ncol lattice cells
    x = np.zeros(nrow * ncol, dtype=np.int64)
    for r in rows:
        x[int(r["k"])] = int(r["n"])
    x = x.reshape(nrow, ncol)
    nc = nrow * ncol
    sx = int(x.sum())
    d = (nc * x - sx).astype(object)  # python ints: exact at any scale
    num = 0
    w_pairs = 0
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            shifted = np.roll(d, -dc, axis=1)
            if dr == -1:
                a, b = d[1:, :], shifted[:-1, :]
            elif dr == 1:
                a, b = d[:-1, :], shifted[1:, :]
            else:
                a, b = d, shifted
            num += int((a * b).sum())
            w_pairs += a.size
    den = int((d * d).sum())
    assert abs(num) < 2**63 and den < 2**63
    return pa.table({
        "n_cells": pa.array([nc], type=pa.int64()),
        "sum_x": pa.array([sx], type=pa.int64()),
        "w_pairs": pa.array([w_pairs], type=pa.int64()),
        "num": pa.array([num], type=pa.int64()),
        "den": pa.array([den], type=pa.int64()),
    })


def sql_morans_i() -> str:
    res, N = MORAN_RES, CFG.N_side
    nrow = N**res
    ncol = 4 * nrow
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), res, CFG, id_cols=("event_id",)
    )
    dig = lambda i: f"CAST(substr(cell_id, {i + 2}, 1) AS BIGINT)"
    row = "(" + " + ".join(
        f"({dig(i)} // {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    colf = "(" + " + ".join(
        f"({dig(i)} % {N}) * {N ** (res - 1 - i)}" for i in range(res)
    ) + ")"
    fidx = (
        "(CASE substr(cell_id, 1, 1) "
        + " ".join(f"WHEN '{c}' THEN {i}" for i, c in enumerate(CELLS0))
        + " END)"
    )
    gcol = f"(({fidx} - 1) * {nrow} + {colf})"
    return f"""
WITH idxp AS MATERIALIZED (
  SELECT event_id, cell_id FROM {inner} t
),
eq AS MATERIALIZED (
  SELECT {row} AS row, {gcol} AS gcol, CAST(COUNT(*) AS BIGINT) AS n
  FROM idxp WHERE substr(cell_id, 1, 1) IN ('O', 'P', 'Q', 'R')
  GROUP BY 1, 2
),
lat AS (
  SELECT r.row, c.gcol FROM
    (SELECT unnest(generate_series(0, {nrow - 1})) AS row) r,
    (SELECT unnest(generate_series(0, {ncol - 1})) AS gcol) c
),
x AS MATERIALIZED (
  SELECT l.row, l.gcol, COALESCE(eq.n, 0) AS n
  FROM lat l LEFT JOIN eq ON eq.row = l.row AND eq.gcol = l.gcol
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS sx, CAST(COUNT(*) AS BIGINT) AS nc FROM x),
d AS MATERIALIZED (
  SELECT row, gcol, CAST(tot.nc * x.n - tot.sx AS BIGINT) AS d
  FROM x, tot
),
offs AS (
  SELECT dr.dr, dc.dc FROM
    (SELECT unnest(generate_series(-1, 1)) AS dr) dr,
    (SELECT unnest(generate_series(-1, 1)) AS dc) dc
  WHERE NOT (dr.dr = 0 AND dc.dc = 0)
),
pairs AS (
  SELECT CAST(a.d AS HUGEINT) * b.d AS p
  FROM d a JOIN offs o ON TRUE
  JOIN d b ON b.row = a.row + o.dr
    AND b.gcol = ((a.gcol + o.dc) % {ncol} + {ncol}) % {ncol}
)
SELECT tot.nc AS n_cells, tot.sx AS sum_x,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS w_pairs,
  (SELECT CAST(SUM(p) AS BIGINT) FROM pairs) AS num,
  (SELECT CAST(SUM(CAST(d AS HUGEINT) * d) AS BIGINT) FROM d) AS den
FROM tot
"""


# ---------------------------------------------------------------------------
# Round 2h: iterative k-means training, event debounce, behavioral Gini
# ---------------------------------------------------------------------------

KM_ITERS = 3


def _kmeans_pass(sf_dir: str, labels: np.ndarray, C: np.ndarray):
    """One distributed Lloyd pass against broadcast centroids (the
    q_kmeans_step kernel, parameterized so iterations can chain):
    returns the (cluster, dim, sum_micros, n) update statistics."""
    from rhealpixdggs_py_ray.ops.ann import _seq_d2
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    cent_ref = ray.put((labels, C))
    # 2 read blocks: the exchange fixed cost scales with blocks x
    # partitions and the per-iteration latency IS the query cost here
    ds = _read(sf_dir, "embeddings", columns=["embedding"], blocks=2)

    def step(batch: pa.Table) -> pa.Table:
        labs, cm = ray.get(cent_ref)
        X = np.floor(_emb_matrix(batch).astype(np.float64) * 1000000.0)
        D = _seq_d2(X, cm)
        near = np.argmin(D, axis=1)  # first win == smallest label
        k, d = len(labs), X.shape[1]
        S = np.zeros((k, d), dtype=np.int64)
        np.add.at(S, near, X.astype(np.int64))
        n = np.bincount(near, minlength=k).astype(np.int64)
        used = np.flatnonzero(n > 0)
        return pa.table({
            "cluster": pa.array(np.repeat(labs[used], d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(used))),
            "sum_micros": pa.array(S[used].reshape(-1)),
            "n": pa.array(np.repeat(n[used], d)),
        })

    part = ds.map_batches(step, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby(["cluster", "dim"]).aggregate(
        Sum("sum_micros", alias_name="sum_micros"), Sum("n", alias_name="n")
    )


def q_kmeans_train(sf_dir: str):
    """THE iterative distributed-training loop: KM_ITERS full Lloyd
    iterations of k-means over the embeddings, each iteration one
    broadcast (ray.put centroids) + one map + one tiny (cluster, dim)
    exchange; between iterations only the k x d sufficient statistics
    land on the driver (the irreducible synchronization point of
    distributed k-means).  Clusters that lose all members drop out of
    the next round, matching the SQL replay exactly."""
    cdf = (
        q_embedding_centroids(sf_dir)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    labels = np.sort(cdf["label"].unique()).astype(np.int64)
    C = (
        cdf["sum_micros"].to_numpy().astype(np.float64)
        / cdf["n"].to_numpy().astype(np.float64)
    ).reshape(len(labels), EMB_D)
    for it in range(KM_ITERS):
        stats = _kmeans_pass(sf_dir, labels, C)
        if it == KM_ITERS - 1:
            return stats
        sdf = (
            stats.to_pandas()
            .sort_values(["cluster", "dim"])
            .reset_index(drop=True)
        )  # bounded: k x d rows
        labels = np.sort(sdf["cluster"].unique()).astype(np.int64)
        C = (
            sdf["sum_micros"].to_numpy().astype(np.float64)
            / sdf["n"].to_numpy().astype(np.float64)
        ).reshape(len(labels), EMB_D)


def sql_kmeans_train() -> str:
    def e(d: int) -> str:
        return f"floor(CAST(e.embedding[{d + 1}] AS DOUBLE) * 1000000.0)"

    dist = " + ".join(
        f"(({e(d)}) - c{d}) * (({e(d)}) - c{d})" for d in range(EMB_D)
    )
    ctes = [f"cent0 AS MATERIALIZED ({sql_embedding_centroids()})"]
    prev, prev_label = "cent0", "label"
    for it in range(1, KM_ITERS + 1):
        cw_cols = ", ".join(
            f"MAX(CASE WHEN dim = {d} THEN CAST(sum_micros AS DOUBLE)"
            f" / CAST(n AS DOUBLE) END) AS c{d}"
            for d in range(EMB_D)
        )
        ctes.append(
            f"cw{it} AS MATERIALIZED (SELECT {prev_label} AS clabel,"
            f" {cw_cols} FROM {prev} GROUP BY {prev_label})"
        )
        ctes.append(
            f"d{it} AS MATERIALIZED (SELECT e.vec_id, cw{it}.clabel,"
            f" ({dist}) AS dist FROM embeddings e CROSS JOIN cw{it})"
        )
        ctes.append(
            f"pick{it} AS MATERIALIZED (SELECT vec_id, clabel AS cluster"
            f" FROM d{it} QUALIFY row_number() OVER"
            f" (PARTITION BY vec_id ORDER BY dist, clabel) = 1)"
        )
        ctes.append(
            f"stats{it} AS MATERIALIZED (SELECT p.cluster, dd.i - 1 AS dim,"
            f" CAST(SUM(CAST(floor(CAST(e.embedding[dd.i] AS DOUBLE)"
            f" * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micros,"
            f" CAST(COUNT(*) AS BIGINT) AS n"
            f" FROM pick{it} p JOIN embeddings e ON e.vec_id = p.vec_id,"
            f" (SELECT unnest(generate_series(1, {EMB_D})) AS i) dd"
            f" GROUP BY p.cluster, dd.i)"
        )
        prev, prev_label = f"stats{it}", "cluster"
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT cluster, dim, sum_micros, n FROM stats{KM_ITERS}"
    )


DEBOUNCE_US = 3_600_000_000  # 1 h (fixture gaps: min ~8 s at sf0.01,
#   ~9 min at sf0.001 — 1 h makes the suppression branch fire at every sf)


def q_debounce(sf_dir: str):
    """Event debouncing (the duplicate-suppression rule of telemetry
    ingestion): within each (user, event_type) stream ordered by (ts,
    event_id), an event is kept iff it is the stream head or arrives
    >= 60 s after its predecessor (LAG semantics, not chained-kept —
    both sides implement the same rule).  One h(user) bucket exchange;
    the resolve is one lexsort + one vectorized diff."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, nb)),
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "t": pa.array(ts.astype(np.int64)),
        })

    def flag(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, et, uid))
        uid, et, eid, t = uid[order], et[order], eid[order], t[order]
        new_seg = np.r_[True, (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])]
        prev_t = np.r_[0, t[:-1]]
        keep = new_seg | (t - prev_t >= DEBOUNCE_US)
        return pa.table({
            "event_id": pa.array(eid),
            "user_id": pa.array(uid),
            "event_type": pa.array(et, type=pa.string()),
            "keep": pa.array(keep.astype(np.int64)),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(flag, batch_format="pyarrow")


def sql_debounce() -> str:
    return f"""
WITH w AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS t,
    lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS pt
  FROM events
)
SELECT event_id, user_id, event_type,
  CAST(CASE WHEN pt IS NULL OR t - pt >= {DEBOUNCE_US}
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM w
"""


def q_user_gini(sf_dir: str):
    """Behavioral diversity per user: Gini impurity of the user's
    event-type distribution, exact-integer ppm (1e6 - (1e6 * Sigma
    n_t^2) // n^2).  Per-batch (user, type) count partials -> ONE
    h(user) bucket exchange -> both aggregation levels resolve
    in-bucket."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"], blocks=4)
    nb = 8

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        key = np.char.add(np.char.add(uid.astype("U20"), "|"), et.astype("U16"))
        ku, ki = np.unique(key, return_inverse=True)
        cnt = np.zeros(len(ku), dtype=np.int64)
        np.add.at(cnt, ki, 1)
        u_of = np.array([k.split("|")[0] for k in ku], dtype=np.int64)
        t_of = np.array([k.split("|")[1] for k in ku], dtype=object)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(u_of.astype(np.uint64), nb)),
            "user_id": pa.array(u_of),
            "event_type": pa.array(t_of, type=pa.string()),
            "nt": pa.array(cnt),
        })

    def resolve(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        nt_in = g["nt"].to_numpy(zero_copy_only=False)
        key = np.fromiter(
            (f"{u}|{t}" for u, t in zip(uid, et)), dtype=object, count=len(uid)
        )
        ku, first, ki = np.unique(key, return_index=True, return_inverse=True)
        nt = np.zeros(len(ku), dtype=np.int64)
        np.add.at(nt, ki, nt_in)
        u_of = uid[first]
        uu, ui = np.unique(u_of, return_inverse=True)
        n = np.zeros(len(uu), dtype=np.int64)
        s2 = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n, ui, nt)
        np.add.at(s2, ui, nt * nt)
        return pa.table({
            "user_id": pa.array(uu),
            "n_events": pa.array(n),
            "gini_ppm": pa.array(1_000_000 - (1_000_000 * s2) // (n * n)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(resolve, batch_format="pyarrow")


def sql_user_gini() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS nt
  FROM events GROUP BY 1, 2
),
u AS (
  SELECT user_id, CAST(SUM(nt) AS BIGINT) AS n,
    CAST(SUM(nt * nt) AS BIGINT) AS s2
  FROM c GROUP BY 1
)
SELECT user_id, n AS n_events,
  CAST(1000000 - (1000000 * s2) // (n * n) AS BIGINT) AS gini_ppm
FROM u
"""


# ---------------------------------------------------------------------------
# Round 2h (cont.): image retention policy, nearest-POI assignment
# ---------------------------------------------------------------------------

def q_image_retention(sf_dir: str):
    """Near-dup retention policy (the curation step AFTER detection):
    from every verified phash near-dup pair, the lower-resolution
    member (fewer pixels; ties -> larger index) is marked dropped, and
    the query reports the distinct dropped images with their
    dimensions.  The (w, h) dims ride the near-dup pipeline's OWN
    fused verify exchange (image_near_dup_pairs extra_val_cols) so the
    loser pick is a pure map over verified pairs, followed by one
    bucketed distinct — no driver-side table read, no max-index-sized
    broadcast array (round 2 built an O(#images) dense driver lookup
    here; at 10^12 images that is a multi-TB driver array — VERDICT r2
    item 2)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    # verified pairs with dims come from the process-wide cached pair
    # set (q_image_neardup) — one decode->phash->LSH->verify pass
    # feeds all five near-dup consumers
    q_image_neardup(sf_dir)
    pairs = _IMG_NEARDUP_PAIRS[IMG_DIR]

    def pick_losers(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        wa = batch["w_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ha = batch["h_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        wb = batch["w_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        hb = batch["h_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        pxa, pxb = wa * ha, wb * hb
        loser = np.where(pxa < pxb, a, np.where(pxb < pxa, b, np.maximum(a, b)))
        is_a = loser == a
        return pa.table({
            "img_idx": pa.array(loser),
            "w": pa.array(np.where(is_a, wa, wb)),
            "h": pa.array(np.where(is_a, ha, hb)),
        })

    lo = pairs.map_batches(pick_losers, batch_format="pyarrow", zero_copy_batch=True)

    nb = sizing.exchange_buckets(16)

    def add_bucket(batch: pa.Table) -> pa.Table:
        i = batch["img_idx"].to_numpy(zero_copy_only=False)
        return batch.append_column("lbkt", pa.array(hash_bucket_u64(i, nb)))

    def distinct(g: pa.Table) -> pa.Table:
        i = g["img_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, first = np.unique(i, return_index=True)
        return pa.table({
            "img_idx": pa.array(uq),
            "w": pa.array(g["w"].to_numpy(zero_copy_only=False).astype(np.int64)[first]),
            "h": pa.array(g["h"].to_numpy(zero_copy_only=False).astype(np.int64)[first]),
        })

    return (
        lo.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lbkt")
        .map_groups(distinct, batch_format="pyarrow")
    )


def sql_image_retention() -> str:
    nd = sql_image_neardup()
    return f"""
WITH pr AS MATERIALIZED (SELECT a, b FROM ({nd}) t),
dims AS MATERIALIZED (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS idx,
    CAST(w AS BIGINT) * h AS px, CAST(w AS BIGINT) AS w,
    CAST(h AS BIGINT) AS h
  FROM read_parquet('{IMG_DIR}/*.parquet')
),
losers AS (
  SELECT DISTINCT CASE WHEN da.px < db.px THEN p.a
    WHEN db.px < da.px THEN p.b
    ELSE greatest(p.a, p.b) END AS idx
  FROM pr p JOIN dims da ON da.idx = p.a JOIN dims db ON db.idx = p.b
)
SELECT l.idx AS img_idx, d.w, d.h FROM losers l JOIN dims d ON d.idx = l.idx
"""


def q_nearest_poi(sf_dir: str):
    """Nearest-POI assignment (reverse-geocoding shape): every event
    assigned to the argmin-chord-distance POI of the broadcast 5-POI
    set (ties -> smaller poi_id), with the quantized squared distance.
    Pure map over the events — the (n x 5) distance block is computed
    in the SQL's exact operand order so the argmin is bit-stable."""
    from rhealpixdggs_py_ray.core import projection as proj

    pid = np.arange(DISTJOIN_NPOI, dtype=np.int64)
    plon, plat = oracle.lonlat_from_id(pid + 2_000_000)
    px, py, pz = proj.xyz(CFG, plon, plat)

    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        x, y, z = proj.xyz(CFG, lon, lat)
        D = np.empty((len(ids), DISTJOIN_NPOI), dtype=np.float64)
        for j in range(DISTJOIN_NPOI):
            dx = px[j] - x
            dy = py[j] - y
            dz = pz[j] - z
            D[:, j] = dx * dx + dy * dy + dz * dz  # SQL operand order
        near = np.argmin(D, axis=1)  # first win == smaller poi_id
        d2 = D[np.arange(len(ids)), near]
        return pa.table({
            "event_id": batch["event_id"],
            "poi_id": pa.array(near.astype(np.int64)),
            "d2_mm2": pa.array(np.floor(d2 / 1e6).astype(np.int64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def sql_nearest_poi() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    qlon, qlat = oracle.lonlat_from_id_sql("poi_id + 2000000")
    xyz = (
        "SELECT {id}, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*cos(radians(lon))*cos(radians(lat)) AS x, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*sin(radians(lon))*cos(radians(lat)) AS y, "
        f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))*(1 - {e2})*sin(radians(lat)) AS z FROM {{src}}"
    )
    pts = xyz.format(
        id="event_id",
        src=f"(SELECT event_id, {lon} AS lon, {lat} AS lat FROM events)",
    )
    poi = xyz.format(
        id="poi_id",
        src=(
            f"(SELECT poi_id, {qlon} AS lon, {qlat} AS lat FROM"
            f" (SELECT unnest(generate_series(0, {DISTJOIN_NPOI - 1})) AS poi_id))"
        ),
    )
    return (
        f"WITH p AS MATERIALIZED ({pts}), q AS MATERIALIZED ({poi}),"
        " d AS (SELECT p.event_id, q.poi_id,"
        "  (q.x-p.x)*(q.x-p.x) + (q.y-p.y)*(q.y-p.y) + (q.z-p.z)*(q.z-p.z) AS d2"
        "  FROM p CROSS JOIN q)"
        " SELECT event_id, poi_id,"
        "  CAST(floor(d2 / 1000000.0) AS BIGINT) AS d2_mm2"
        " FROM d QUALIFY row_number() OVER"
        "  (PARTITION BY event_id ORDER BY d2, poi_id) = 1"
    )


# ---------------------------------------------------------------------------
# Round 2h (cont.): custom Datasource (generated image shards, no disk)
# ---------------------------------------------------------------------------

def q_generator_source(sf_dir: str):
    """Custom ``ray.data.Datasource`` connector: the image table
    GENERATED inside read tasks (sources/generator.ImagesDatasource) —
    the extension-surface shape of any object-store / record-service
    source.  The query proves the full row contract: per (w, h) shard
    of the dimension lattice it reports row count, raw-format count,
    the TOTAL raw payload bytes measured from the actual binary
    buffers (pc.binary_length, zero-copy), and the signed phash
    min/max — all replayed closed-form by the oracle from the
    generative rule (splitmix64 + lattice), with no parquet read on
    either side."""
    import pyarrow.compute as pc

    from rhealpixdggs_py_ray.sources.generator import ImagesDatasource

    ds = ray.data.read_datasource(ImagesDatasource(IMG_N), override_num_blocks=sizing.range_blocks(IMG_N, 8))

    def partial(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        raw = np.asarray(batch["fmt"].to_pylist(), dtype=object) == "raw"
        blen = pc.binary_length(batch["bytes"]).to_numpy(zero_copy_only=False).astype(np.int64)
        key = w * 1000 + h
        ku, ki = np.unique(key, return_inverse=True)
        n = np.zeros(len(ku), dtype=np.int64)
        nr = np.zeros(len(ku), dtype=np.int64)
        rb = np.zeros(len(ku), dtype=np.int64)
        mn = np.full(len(ku), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(ku), np.iinfo(np.int64).min, dtype=np.int64)
        np.add.at(n, ki, 1)
        np.add.at(nr, ki[raw], 1)
        np.add.at(rb, ki[raw], blen[raw])
        np.minimum.at(mn, ki, ph)
        np.maximum.at(mx, ki, ph)
        return pa.table({
            "w": pa.array(ku // 1000), "h": pa.array(ku % 1000),
            "n": pa.array(n), "n_raw": pa.array(nr),
            "raw_bytes": pa.array(rb),
            "min_phash": pa.array(mn), "max_phash": pa.array(mx),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["w", "h"]).aggregate(
        Sum("n", alias_name="n"), Sum("n_raw", alias_name="n_raw"),
        Sum("raw_bytes", alias_name="raw_bytes"),
        Min("min_phash", alias_name="min_phash"),
        Max("max_phash", alias_name="max_phash"),
    )


def sql_generator_source() -> str:
    sm = oracle.splitmix64_sql_ctes(
        f"SELECT unnest(generate_series(0, {IMG_N - 1})) AS i", "i", "i", "hsh"
    )
    signed = (
        "CAST(CAST(hsh AS HUGEINT)"
        " - (CASE WHEN hsh >= CAST(9223372036854775808 AS UBIGINT)"
        "    THEN CAST(18446744073709551616 AS HUGEINT) ELSE CAST(0 AS HUGEINT)"
        "    END) AS BIGINT)"
    )
    return f"""
WITH g AS MATERIALIZED (
  SELECT i, {signed} AS phash,
    16 + (i % 4) * 16 AS w, 16 + ((i // 4) % 4) * 16 AS h,
    (i % 2 = 0) AS is_raw
  FROM {sm} t
)
SELECT CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN is_raw THEN 1 ELSE 0 END) AS BIGINT) AS n_raw,
  CAST(SUM(CASE WHEN is_raw THEN w * h * 3 ELSE 0 END) AS BIGINT)
    AS raw_bytes,
  CAST(MIN(phash) AS BIGINT) AS min_phash,
  CAST(MAX(phash) AS BIGINT) AS max_phash
FROM g GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 2i: 4-way star join over the last unused dimension tables
# ---------------------------------------------------------------------------

def q_brand_nation_revenue(sf_dir: str):
    """TPC-H-Q9-shaped profit rollup: lineitem joined to part (brand),
    supplier and nation — revenue cents per (brand, supplier nation).
    Both dimension sides are small, so the 4-way join is ONE ray.put
    broadcast of two int->label lookups (partkey->brand idx,
    suppkey->nation name idx) and the combine happens map-side per
    batch; only (brand, nation, partials) rows reach the tiny final
    groupby.  This is the canonical star-schema shape at 100 TB: facts
    never shuffle, dimensions ride the object store once."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"], blocks=1).to_pandas()
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"], blocks=1).to_pandas()
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"], blocks=1).to_pandas()

    brands = np.sort(part["p_brand"].unique())
    b_of = dict(zip(brands, range(len(brands))))
    pk = part["p_partkey"].to_numpy()
    part_brand = np.full(int(pk.max()) + 2, -1, dtype=np.int64)  # -1 = no part
    part_brand[pk] = np.array([b_of[b] for b in part["p_brand"]], dtype=np.int64)

    nnames = nation.set_index("n_nationkey")["n_name"]
    sk = supp["s_suppkey"].to_numpy()
    names = np.sort(nation["n_name"].unique())
    n_of = dict(zip(names, range(len(names))))
    supp_nation = np.full(int(sk.max()) + 1, -1, dtype=np.int64)  # -1 = no supp
    supp_nation[sk] = np.array(
        [n_of[nnames[k]] for k in supp["s_nationkey"]], dtype=np.int64
    )
    ref = ray.put((part_brand, supp_nation, brands, names))

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice",
                        "l_discount"], blocks=4)

    def combine(batch: pa.Table) -> pa.Table:
        pb, sn, br, nm = ray.get(ref)
        r = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
        ).astype(np.int64)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        bi = np.where(lpk < len(pb), pb[np.minimum(lpk, len(pb) - 1)], -1)
        ni = np.where(lsk < len(sn), sn[np.minimum(lsk, len(sn) - 1)], -1)
        hit = (bi >= 0) & (ni >= 0)  # inner-join semantics on both dims
        bi, ni, r = bi[hit], ni[hit], r[hit]
        key = bi * len(nm) + ni
        ku, ki = np.unique(key, return_inverse=True)
        n = np.zeros(len(ku), dtype=np.int64)
        s = np.zeros(len(ku), dtype=np.int64)
        np.add.at(n, ki, 1)
        np.add.at(s, ki, r)
        return pa.table({
            "p_brand": pa.array(br[ku // len(nm)], type=pa.string()),
            "n_name": pa.array(nm[ku % len(nm)], type=pa.string()),
            "n_items": pa.array(n),
            "revenue_c": pa.array(s),
        })

    p = ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["p_brand", "n_name"]).aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_c", alias_name="revenue_c"),
    )


def sql_brand_nation_revenue() -> str:
    return """
SELECT p.p_brand, n.n_name,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
    AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 2j: mixed-resolution zonal counts, origin-destination matrix
# ---------------------------------------------------------------------------

def q_mixed_res_counts(sf_dir: str):
    """Adaptive/mixed-resolution zonal counts: events aggregated onto
    the COMPACTED polygon cover (compress_order_cells output — cells of
    resolutions 1..4 mixed), each event assigned by LONGEST-PREFIX
    match, the IP-routing-table discipline of variable-resolution DGGS
    layers.  The compacted cover (resolution-bound) broadcasts as
    per-resolution u64 sets; matching is four vectorized set probes per
    batch, deepest hit wins; counts combine map-side."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cover = W.compress_order_cells(
        list(W.polyfill(geo.Polygon(POLYFILL_POLY), POLYFILL_RES,
                        plane=False, cfg=CFG))
    )
    by_res: dict[int, np.ndarray] = {}
    for c in cover:
        by_res.setdefault(len(c) - 1, []).append(c)
    by_res = {
        r: np.sort(su.from_string(np.array(v, dtype=object)))
        for r, v in by_res.items()
    }
    ref = ray.put(by_res)

    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def assign(batch: pa.Table) -> pa.Table:
        tabs = ray.get(ref)
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG, POLYFILL_RES, lon, lat, plane=False)
        out = np.zeros(len(u), dtype=np.uint64)
        depth = np.full(len(u), -1, dtype=np.int64)
        for r in sorted(tabs):  # deepest probe last wins
            p = su.parent(u, r)
            srt = tabs[r]
            pos = np.searchsorted(srt, p)
            hit = (pos < len(srt)) & (srt[np.minimum(pos, len(srt) - 1)] == p)
            out[hit] = p[hit]
            depth[hit] = r
        m = depth >= 0
        cu, ci = np.unique(out[m], return_inverse=True)
        cnt = np.zeros(len(cu), dtype=np.int64)
        np.add.at(cnt, ci, 1)
        rr = np.array([su.resolution_of(c) for c in cu], dtype=np.int64) \
            if len(cu) else np.array([], dtype=np.int64)
        return pa.table({
            "cell_id": pa.array(
                [su.to_string_fixed(np.array([c], dtype=np.uint64),
                                    int(r))[0] for c, r in zip(cu, rr)],
                type=pa.string()),
            "n": pa.array(cnt),
        })

    p = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby("cell_id").aggregate(Sum("n", alias_name="n"))


def sql_mixed_res_counts() -> str:
    cover = sql_compress()
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), POLYFILL_RES, CFG,
        id_cols=("event_id",),
    )
    return f"""
WITH cover AS MATERIALIZED ({cover}),
pts AS MATERIALIZED (SELECT event_id, cell_id FROM {inner} t),
m AS (
  SELECT p.event_id, c.cell_id,
    row_number() OVER (PARTITION BY p.event_id
                       ORDER BY length(c.cell_id) DESC) AS rk
  FROM pts p JOIN cover c
    ON c.cell_id = substr(p.cell_id, 1, length(c.cell_id))
)
SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n
FROM m WHERE rk = 1 GROUP BY 1
"""


OD_RES = 2


def q_od_matrix(sf_dir: str):
    """Origin-destination matrix (mobility analytics): per (user, day),
    the res-2 cells of the user's first and last events (order by ts,
    event_id), counted per (origin, destination) pair.  Two integer
    bucket exchanges: h(user) to assemble each user-day's endpoints
    from one lexsort, then h(od-pair) to fold the per-bucket partial
    counts (cells travel as u64 — NEVER a string-keyed ray aggregate,
    which measured 70 s of remote time on 32k rows)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        lon, lat = oracle.lonlat_from_id(ids)
        u = idx.cell_from_point(CFG, OD_RES, lon, lat, plane=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, nb)),
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "day": pa.array(ts.astype(np.int64) // 86_400_000_000),
            "t": pa.array(ts.astype(np.int64)),
            "cell": pa.array(u, type=pa.uint64()),
        })

    def endpoints(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        cell = g["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((eid, t, day, uid))
        uid, day, cell = uid[order], day[order], cell[order]
        new_seg = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        starts = np.flatnonzero(new_seg)
        ends = np.r_[starts[1:] - 1, len(uid) - 1]
        # od key: a res-2 cell is face+2 digits in bits 63..52 — pack
        # both 12-bit tops into one 24-bit integer
        key = ((cell[starts] >> np.uint64(52)) << np.uint64(12)) \
            | (cell[ends] >> np.uint64(52))
        ku, ki = np.unique(key, return_inverse=True)
        n = np.zeros(len(ku), dtype=np.int64)
        np.add.at(n, ki, 1)
        return pa.table({
            "bucket2": pa.array(hash_bucket_u64(ku, nb)),
            "od": pa.array(ku.view(np.int64)),
            "n": pa.array(n),
        })

    def fold(g: pa.Table) -> pa.Table:
        od = g["od"].to_numpy(zero_copy_only=False).view(np.uint64)
        ku, ki = np.unique(od, return_inverse=True)
        n = np.zeros(len(ku), dtype=np.int64)
        np.add.at(n, ki, g["n"].to_numpy(zero_copy_only=False))
        o_u64 = ((ku >> np.uint64(12)) << np.uint64(52)) | np.uint64(OD_RES)
        d_u64 = ((ku & np.uint64(0xFFF)) << np.uint64(52)) | np.uint64(OD_RES)
        return pa.table({
            "origin": pa.array(su.to_string_fixed(o_u64, OD_RES), type=pa.string()),
            "dest": pa.array(su.to_string_fixed(d_u64, OD_RES), type=pa.string()),
            "n_user_days": pa.array(n),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    agg = part.groupby("bucket").map_groups(endpoints, batch_format="pyarrow")
    return agg.groupby("bucket2").map_groups(fold, batch_format="pyarrow")


def sql_od_matrix() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), OD_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH c AS MATERIALIZED (SELECT event_id, cell_id FROM {inner} t),
e AS MATERIALIZED (
  SELECT ev.user_id, epoch_us(ev.ts) // 86400000000 AS day,
    ev.ts, ev.event_id, c.cell_id
  FROM events ev JOIN c USING (event_id)
),
ends AS (
  SELECT user_id, day,
    first_value(cell_id) OVER w AS origin,
    last_value(cell_id) OVER
      (PARTITION BY user_id, day ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS dest,
    row_number() OVER w AS rk
  FROM e WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)
)
SELECT origin, dest, CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM ends WHERE rk = 1 GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 2j (cont.): CUBE grouping sets
# ---------------------------------------------------------------------------

def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(priority, status) in one pass: all four grouping
    sets — (prio, status), (prio), (status), () — re-reduced from the
    same per-batch finest-level partials (rollup_revenue plus the
    column-wise marginal ROLLUP can't express)."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
               blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        pr = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        st = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pu, pi = np.unique(pr, return_inverse=True)
        su_, si = np.unique(st, return_inverse=True)
        key = pi * len(su_) + si
        ku, ki = np.unique(key, return_inverse=True)
        n = np.bincount(ki).astype(np.int64)
        s = np.zeros(len(ku), dtype=np.int64)
        np.add.at(s, ki, cents)
        return pa.table({
            "g": pa.array(np.zeros(len(ku), dtype=np.int64)),
            "prio": pa.array(pu[ku // len(su_)], type=pa.string()),
            "status": pa.array(su_[ku % len(su_)], type=pa.string()),
            "n": pa.array(n),
            "cents": pa.array(s),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        pr = g["prio"].to_numpy(zero_copy_only=False)
        st = g["status"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        cents = g["cents"].to_numpy(zero_copy_only=False)

        def _reduce(pkeys, skeys):
            pu, pi = np.unique(pkeys, return_inverse=True)
            su_, si = np.unique(skeys, return_inverse=True)
            key = pi * len(su_) + si
            ku, ki = np.unique(key, return_inverse=True)
            nn = np.zeros(len(ku), dtype=np.int64)
            np.add.at(nn, ki, n)
            cc = np.zeros(len(ku), dtype=np.int64)
            np.add.at(cc, ki, cents)
            return pu[ku // len(su_)], su_[ku % len(su_)], nn, cc

        all_p = np.full(len(pr), "ALL", dtype=object)
        fp, fs, fn, fc = _reduce(pr, st)
        pp, ps, pn, pcn = _reduce(pr, all_p)
        sp, ss, sn, sc = _reduce(all_p, st)
        out_p = np.concatenate([fp, pp, sp, np.array(["ALL"], dtype=object)])
        out_s = np.concatenate([fs, ps, ss, np.array(["ALL"], dtype=object)])
        out_n = np.concatenate([fn, pn, sn, np.array([fn.sum()], dtype=np.int64)])
        out_c = np.concatenate([fc, pcn, sc, np.array([fc.sum()], dtype=np.int64)])
        return pa.table({
            "prio": pa.array(out_p, type=pa.string()),
            "status": pa.array(out_s, type=pa.string()),
            "n_orders": pa.array(out_n),
            "revenue_c": pa.array(out_c),
        })

    return p.groupby("g").map_groups(resolve, batch_format="pyarrow")


def sql_cube_revenue() -> str:
    return """
SELECT COALESCE(o_orderpriority, 'ALL') AS prio,
  COALESCE(o_orderstatus, 'ALL') AS status,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_c
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# Round 2j (cont.): contrastive training-pair mining
# ---------------------------------------------------------------------------

def q_contrastive_pairs(sf_dir: str):
    """Contrastive training-pair mining: POSITIVES are the verified
    MinHash-LSH near-dup pairs (label 1, with their exact Jaccard);
    NEGATIVES are one deterministic splitmix64 partner per document
    (label 0), minus any that collide with a positive — the anti-join
    runs distributed through the same union bucket exchange as every
    other pair op (positive side rows kill matching negative
    candidates in-resolve; no pair list ever lands on the driver)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    nb = 16
    pos = _minhash_pairs(sf_dir)
    n = _ndocs(sf_dir)

    def _key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a.astype(np.uint64) * np.uint64(1_000_000_007) + b.astype(np.uint64)

    def pos_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(_key(a, b), nb)),
            "a": batch["a"], "b": batch["b"],
            "jac_micros": batch["jac_micros"],
            "side": pa.array(np.ones(len(a), dtype=np.int64)),
        })

    docs = _read(sf_dir, "documents", columns=["doc_id"], blocks=4)

    def neg_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = splitmix64(d.astype(np.uint64))
        partner = (d + 1 + (h % np.uint64(n - 1)).astype(np.int64)) % n
        a = np.minimum(d, partner)
        b = np.maximum(d, partner)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(_key(a, b), nb)),
            "a": pa.array(a), "b": pa.array(b),
            "jac_micros": pa.array(np.zeros(len(a), dtype=np.int64)),
            "side": pa.array(np.zeros(len(a), dtype=np.int64)),
        })

    both = pos.map_batches(
        pos_rows, batch_format="pyarrow", zero_copy_batch=True
    ).union(docs.map_batches(
        neg_rows, batch_format="pyarrow", zero_copy_batch=True
    ))

    def resolve(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        jac = g["jac_micros"].to_numpy(zero_copy_only=False)
        key = _key(a, b)
        pos_keys = np.unique(key[side == 1])
        if len(pos_keys):
            p = np.searchsorted(pos_keys, key)
            is_pos = pos_keys[np.minimum(p, len(pos_keys) - 1)] == key
        else:
            is_pos = np.zeros(len(key), dtype=bool)
        keep = (side == 1) | ~is_pos
        kk = key[keep]
        lab = side[keep]
        # two docs can pick the same negative pair — dedup per pair
        _, first = np.unique(kk * np.uint64(2) + lab.astype(np.uint64),
                             return_index=True)
        return pa.table({
            "a": pa.array(a[keep][first]),
            "b": pa.array(b[keep][first]),
            "label": pa.array(lab[first]),
            "jac_micros": pa.array(jac[keep][first]),
        })

    return both.groupby("bucket").map_groups(resolve, batch_format="pyarrow")


_NDOCS_CACHE: dict[str, int] = {}


def _ndocs(sf_dir: str) -> int:
    if sf_dir not in _NDOCS_CACHE:
        import pyarrow.parquet as pq

        _NDOCS_CACHE[sf_dir] = pq.ParquetFile(
            f"{sf_dir}/documents.parquet"
        ).metadata.num_rows
    return _NDOCS_CACHE[sf_dir]


def sql_contrastive_pairs() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT doc_id FROM documents", "doc_id", "doc_id", "h"
    )
    return f"""
WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
sm AS MATERIALIZED (SELECT doc_id, h FROM {sm} t),
cand AS (
  SELECT s.doc_id,
    CAST((s.doc_id + 1
          + CAST(s.h % CAST(nn.n - 1 AS UBIGINT) AS BIGINT)) % nn.n
         AS BIGINT) AS partner
  FROM sm s, nn
),
neg AS (
  SELECT DISTINCT least(doc_id, partner) AS a,
    greatest(doc_id, partner) AS b
  FROM cand
),
pos AS MATERIALIZED ({sql_minhash_lsh()})
SELECT a, b, CAST(1 AS BIGINT) AS label, jac_micros FROM pos
UNION ALL
SELECT n.a, n.b, CAST(0 AS BIGINT) AS label, CAST(0 AS BIGINT) AS jac_micros
FROM neg n WHERE NOT EXISTS
  (SELECT 1 FROM pos p WHERE p.a = n.a AND p.b = n.b)
"""


# ---------------------------------------------------------------------------
# Round 2j (cont.): calendar-aware date functions
# ---------------------------------------------------------------------------

def q_hourly_profile(sf_dir: str):
    """Hour-of-day activity profile per event type (the diurnal
    seasonality report): pure integer arithmetic (epoch_us // 3600e6
    mod 24), map-side combined on a 5x24 key space — never a wide
    exchange."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        t = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        hod = (t // 3_600_000_000) % 24
        tu, ti = np.unique(et, return_inverse=True)
        key = ti * 24 + hod
        ku, ki = np.unique(key, return_inverse=True)
        n = np.bincount(ki).astype(np.int64)
        return pa.table({
            "event_type": pa.array(tu[ku // 24], type=pa.string()),
            "hour": pa.array((ku % 24).astype(np.int64)),
            "n": pa.array(n),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["event_type", "hour"]).aggregate(Sum("n", alias_name="n"))


def sql_hourly_profile() -> str:
    return """
SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


def q_monthly_orders(sf_dir: str):
    """Calendar seasonality: orders and revenue cents per civil
    (year, month) — the calendar-aware date extraction the epoch-day
    windows can't express.  numpy's datetime64[M] conversion is the
    same proleptic-Gregorian calendar DuckDB's year()/month() use."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"],
               blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        months = d.astype("datetime64[M]").astype(np.int64)  # since 1970-01
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        mu, mi = np.unique(months, return_inverse=True)
        n = np.bincount(mi).astype(np.int64)
        s = np.zeros(len(mu), dtype=np.int64)
        np.add.at(s, mi, cents)
        yy = 1970 + mu // 12
        mm = mu % 12 + 1
        return pa.table({
            "y": pa.array(yy), "m": pa.array(mm),
            "n_orders": pa.array(n), "revenue_c": pa.array(s),
        })

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return p.groupby(["y", "m"]).aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_c", alias_name="revenue_c"),
    )


def sql_monthly_orders() -> str:
    return """
SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
  CAST(month(o_orderdate) AS BIGINT) AS m,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_c
FROM orders GROUP BY 1, 2
"""


def q_retention_cohorts(sf_dir: str):
    """Cohort retention matrix (the product-analytics staple): users
    cohorted by the civil month of their FIRST event; for every
    (cohort, months-since) cell, the count of distinct users active in
    that month.  One h(user) bucket exchange assembles each user's
    distinct activity months (users are bucket-local, so cohort = the
    segment min and the matrix partials are exact); the final fold is
    a tiny int-keyed aggregate."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["user_id", "ts"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        mi = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64) // 604_800_000_000  # epoch weeks
        # per-batch (user, month) dedup before the exchange
        key = uid.astype(np.uint64) * np.uint64(4096) + mi.astype(np.uint64)
        ku = np.unique(key)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ku >> np.uint64(12), nb)),
            "user_id": pa.array((ku >> np.uint64(12)).view(np.int64)),
            "mi": pa.array((ku & np.uint64(0xFFF)).view(np.int64)),
        })

    def matrix(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        mi = g["mi"].to_numpy(zero_copy_only=False)
        key = uid.astype(np.uint64) * np.uint64(4096) + mi.astype(np.uint64)
        ku = np.unique(key)  # cross-batch dedup of (user, month)
        uid = (ku >> np.uint64(12)).view(np.int64)
        mi = (ku & np.uint64(0xFFF)).view(np.int64)
        # segments are sorted by user then month: cohort = segment min
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        cohort = mi[starts][seg_id]
        off = mi - cohort
        ck = cohort * 4096 + off
        cu, ci = np.unique(ck, return_inverse=True)
        n = np.bincount(ci).astype(np.int64)
        return pa.table({
            "cohort_week": pa.array(cu // 4096),
            "weeks_since": pa.array(cu % 4096),
            "n_users": pa.array(n),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    agg = part.groupby("bucket").map_groups(matrix, batch_format="pyarrow")
    return agg.groupby(["cohort_week", "weeks_since"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


def sql_retention_cohorts() -> str:
    return """
WITH m AS MATERIALIZED (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS mi
  FROM events
),
c AS (SELECT user_id, MIN(mi) AS cohort FROM m GROUP BY 1)
SELECT c.cohort AS cohort_week,
  CAST(m.mi - c.cohort AS BIGINT) AS weeks_since,
  CAST(COUNT(*) AS BIGINT) AS n_users
FROM m JOIN c USING (user_id)
GROUP BY 1, 2
"""


# Cap-safe polar linetrace (round 3; BEYOND the reference, which
# documents cap cells broken in cells_from_line, dggs.py:1110-1114).
# The first segment is the reference's own doctest line; the second is
# a pole-adjacent crossing where the reference's neighbor walk skips
# N442/N445 (pinned in tests/test_polar_linetrace.py).
LINETRACE_POLAR_SEGS = [
    ((-89.669615, 86.549596), (-134.0, 86.0)),
    ((10.1, 87.9), (-79.3, 88.4)),
    ((23.7, 82.3), (157.3, 83.1)),
    ((-42.1, -84.7), (31.9, -83.3)),
    ((12.3, 41.2), (15.9, 44.8)),
]
LINETRACE_POLAR_RES = 3
LINETRACE_POLAR_N = 4096  # power of two: i/N exact, SQL parity


def q_linetrace_polar(sf_dir: str):
    """Sampling linetrace valid at all latitudes (caps included);
    cover.py:cells_from_line_sampled.  One row per (line, seq, cell)."""
    from rhealpixdggs_py_ray.core import cover as cov

    ds = ray.data.from_items(
        [{"line_id": i} for i in range(len(LINETRACE_POLAR_SEGS))],
        override_num_blocks=2,
    )

    def trace(batch: pa.Table) -> pa.Table:
        lid, seq, cell = [], [], []
        for i in batch["line_id"].to_pylist():
            p0, p1 = LINETRACE_POLAR_SEGS[i]
            cells = cov.cells_from_line_sampled(
                CFG, LINETRACE_POLAR_RES, p0, p1, LINETRACE_POLAR_N
            )
            names = su.to_string(np.array(cells, dtype=np.uint64))
            lid.extend([i] * len(cells))
            seq.extend(range(len(cells)))
            cell.extend(names.tolist())
        return pa.table({
            "line_id": pa.array(np.array(lid, dtype=np.int64)),
            "seq": pa.array(np.array(seq, dtype=np.int64)),
            "cell_id": pa.array(cell, type=pa.string()),
        })

    return ds.map_batches(trace, batch_format="pyarrow", zero_copy_batch=True)


def sql_linetrace_polar() -> str:
    return oracle.linetrace_sampled_sql(
        LINETRACE_POLAR_SEGS, LINETRACE_POLAR_RES, LINETRACE_POLAR_N, CFG
    )


# Text lon/lat points source (Ellipsoid.get_points, ellipsoids.py:306-326)
POINTS_FIXTURE_PATH = "/tmp/graft_points_fixture.txt"
POINTS_FIXTURE_N = 4000
POINTS_RES = 4
# junk lines the leading-char rule must skip — incl. the quirk cases:
# leading '0', leading '+', leading '.' are all ignored (py2 reference
# behavior; see sources/points.py docstring)
POINTS_JUNK = ["# comment line", "", "lon lat", "0.25 33.25",
               "+17.5 2.5", ".5 .5"]


def _write_points_fixture() -> str:
    """Deterministic whitespace-delimited text fixture; repr() floats
    so both float parsers (Arrow cast, DuckDB CAST) see identical
    shortest-round-trip decimal strings.  Idempotent."""
    import os

    if os.path.exists(POINTS_FIXTURE_PATH):
        return POINTS_FIXTURE_PATH
    rows = []
    for i in range(POINTS_FIXTURE_N):
        if i % 7 == 3:
            rows.append(POINTS_JUNK[i % len(POINTS_JUNK)])
        lon = ((i * 2654435761) % 360000) / 1000.0 - 180.0
        lat = ((i * 40503 + 137) % 170000) / 1000.0 - 85.0
        rows.append(f"{lon!r} {lat!r}")
    tmp = POINTS_FIXTURE_PATH + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(rows) + "\n")
    os.replace(tmp, POINTS_FIXTURE_PATH)
    return POINTS_FIXTURE_PATH


def q_points_source(sf_dir: str):
    """Text-source pipeline: distributed read_text -> vectorized Arrow
    line parse (sources/points.py) -> cell_from_point at res 4 ->
    per-cell counts.  ~1 point per res-4 cell, i.e. a high-cardinality
    key: np.unique partials + the u64 hash-bucket exchange
    (ops/agg.py), never a per-string-key ray group."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key
    from rhealpixdggs_py_ray.sources.points import read_points_text

    path = _write_points_fixture()
    ds = read_points_text(path)

    def index_count(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        cells = idx.cell_from_point(CFG, POINTS_RES, lon, lat, plane=False)
        uniq, cnt = np.unique(cells, return_counts=True)
        return pa.table({
            "cell_u64": pa.array(uniq, type=pa.uint64()),
            "n": pa.array(cnt.astype(np.int64)),
        })

    part = ds.map_batches(index_count, batch_format="pyarrow",
                          zero_copy_batch=True)
    agg = sum_by_u64_key(part, "cell_u64", "n", "n", n_buckets=8)

    def to_name(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "cell_id": pa.array(su.to_string(u).tolist(), type=pa.string()),
            "n": batch["n"],
        })

    return agg.map_batches(to_name, batch_format="pyarrow",
                           zero_copy_batch=True)


def sql_points_source() -> str:
    path = _write_points_fixture()
    pts = (
        "SELECT row_number() OVER () AS id,"
        " CAST(split_part(line, ' ', 1) AS DOUBLE) AS lon,"
        " CAST(split_part(line, ' ', 2) AS DOUBLE) AS lat"
        f" FROM read_csv('{path}', header=false,"
        " columns={'line': 'VARCHAR'}, delim='|', quote='')"
        " WHERE regexp_matches(line, '^[-1-9]')"
    )
    cells = oracle.cell_from_point_sql(pts, POINTS_RES, CFG, id_cols=("id",))
    return (
        f"SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n FROM {cells} t"
        " GROUP BY cell_id"
    )


def q_pii_redact(sf_dir: str):
    """PII redaction over documents (engine-only LLM-pipeline op).

    The synthetic corpus carries no PII, so the stage first APPENDS
    deterministic doc_id-derived PII spans (emails x (doc_id%3),
    a phone on even ids, an IPv4 always — integer arithmetic only, so
    the SQL oracle rebuilds the identical augmented text), then runs
    the real operator under test: RE2 count + chained typed-token
    scrub (ops/text.py:pii_counts/pii_redact, vectorized Arrow
    kernels), and an order-free u64-wraparound md5 checksum of the
    scrubbed text proving the redacted bytes match DuckDB's
    regexp_replace chain exactly.  Partials per (batch, lang);
    one tiny exchange."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64_many
    from rhealpixdggs_py_ray.ops.text import pii_counts, pii_redact

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def scrub(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        aug = []
        for i, t in zip(did, texts):
            i = int(i)
            parts = [t, " contact",
                     (" u%d@m%d.example.com" % (i, i % 7)) * (i % 3)]
            if i % 2 == 0:
                parts.append(" or +1 %d %d %d" % (
                    100 + i % 900, 200 + i % 800, 1000 + i % 9000))
            parts.append(" from %d.%d.%d.%d" % (
                i % 256, (i // 256) % 256, (i // 7) % 256, i % 254 + 1))
            aug.append("".join(parts))
        arr = pa.array(aug, type=pa.string())
        ne, np_, ni = pii_counts(arr)
        red = pii_redact(arr).to_pylist()
        h = md5_u64_many([f"{int(i)}|{r}" for i, r in zip(did, red)])
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        lu, li = np.unique(lang, return_inverse=True)
        n = np.bincount(li).astype(np.int64)
        sums = []
        for col in (ne, np_, ni):
            s = np.zeros(len(lu), dtype=np.int64)
            np.add.at(s, li, col)
            sums.append(s)
        chk = np.zeros(len(lu), dtype=np.uint64)
        np.add.at(chk, li, h)  # wraps mod 2^64, commutative
        return pa.table({
            "lang": pa.array(lu.tolist(), type=pa.string()),
            "n_docs": pa.array(n),
            "n_email": pa.array(sums[0]),
            "n_phone": pa.array(sums[1]),
            "n_ip": pa.array(sums[2]),
            "chk": pa.array(chk, type=pa.uint64()),
        })

    part = ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        chk = np.add.reduce(
            g["chk"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        out = {
            "lang": g["lang"].slice(0, 1),
            "n_docs": pa.array([int(np.sum(g["n_docs"].to_numpy()))], type=pa.int64()),
        }
        for c in ("n_email", "n_phone", "n_ip"):
            out[c] = pa.array([int(np.sum(g[c].to_numpy()))], type=pa.int64())
        out["chk_hi"] = pa.array([int(chk >> np.uint64(32))], type=pa.int64())
        out["chk_lo"] = pa.array([int(chk & np.uint64(0xFFFFFFFF))], type=pa.int64())
        return pa.table(out)

    return part.groupby("lang").map_groups(resolve, batch_format="pyarrow")


def sql_pii_redact() -> str:
    from rhealpixdggs_py_ray.ops.text import PII_CHAIN

    m = "18446744073709551616"  # 2^64
    aug = (
        "text || ' contact'"
        " || repeat(' u' || CAST(doc_id AS VARCHAR) || '@m'"
        "   || CAST(doc_id % 7 AS VARCHAR) || '.example.com',"
        "   CAST(doc_id % 3 AS INTEGER))"
        " || CASE WHEN doc_id % 2 = 0 THEN ' or +1 '"
        "   || CAST(100 + doc_id % 900 AS VARCHAR) || ' '"
        "   || CAST(200 + doc_id % 800 AS VARCHAR) || ' '"
        "   || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END"
        " || ' from ' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)"
        " || '.' || CAST((doc_id // 7) % 256 AS VARCHAR)"
        " || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)"
    )
    red = "t"
    for pat, tok in PII_CHAIN:
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS c{i}"
        for i, (pat, _) in enumerate(PII_CHAIN)
    )
    return f"""
WITH aug AS MATERIALIZED (
  SELECT doc_id, lang, {aug} AS t FROM documents
),
red AS MATERIALIZED (
  SELECT doc_id, lang, {counts}, {red} AS rt FROM aug
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(c0) AS BIGINT) AS n_email,
  CAST(SUM(c1) AS BIGINT) AS n_phone,
  CAST(SUM(c2) AS BIGINT) AS n_ip,
  CAST((SUM(CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '|' || rt)
    AS HUGEINT)) % {m}) // 4294967296 AS BIGINT) AS chk_hi,
  CAST((SUM(CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '|' || rt)
    AS HUGEINT)) % {m}) % 4294967296 AS BIGINT) AS chk_lo
FROM red GROUP BY lang
"""


def q_ann_topk_filtered(sf_dir: str):
    """Metadata-filtered exact vector search: per-query label predicate
    applied as a mask inside the scoring batch (ops/ann.py)."""
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
    return ann.ann_topk_filtered(emb)


def sql_ann_topk_filtered() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.ann_topk_filtered_sql()


# SDXL-style aspect-ratio bucketing for image-batch packing
ASPECT_BINS = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16)]


def q_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing (the image-training batch-packing prep):
    assign every image to the nearest canonical ratio bin by exact
    integer permille distance (ties -> lower bin index), then audit
    each bucket: count, canonical pad target (max w, max h) and the
    pixel padding waste of padding every member to it.  Metadata-only
    (w, h columns pruned at the read; payload bytes never load)."""
    from rhealpixdggs_py_ray.fixtures import write_images_table

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(
        IMG_DIR, columns=["w", "h"],
        override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8),
    )
    bm = np.array([(1000 * n) // d for n, d in ASPECT_BINS], dtype=np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        arm = (1000 * w) // h
        bucket = np.argmin(np.abs(arm[:, None] - bm[None, :]), axis=1)
        uq, inv = np.unique(bucket, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        spx = np.zeros(len(uq), dtype=np.int64)
        np.add.at(spx, inv, w * h)
        mw = np.zeros(len(uq), dtype=np.int64)
        mh = np.zeros(len(uq), dtype=np.int64)
        np.maximum.at(mw, inv, w)
        np.maximum.at(mh, inv, h)
        return pa.table({
            "bucket": pa.array(uq.astype(np.int64)),
            "n": pa.array(n), "spx": pa.array(spx),
            "mw": pa.array(mw), "mh": pa.array(mh),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        n = int(np.sum(g["n"].to_numpy()))
        spx = int(np.sum(g["spx"].to_numpy()))
        mw = int(np.max(g["mw"].to_numpy()))
        mh = int(np.max(g["mh"].to_numpy()))
        nm, dn = ASPECT_BINS[b]
        return pa.table({
            "bucket": pa.array([b], type=pa.int64()),
            "ratio": pa.array([f"{nm}:{dn}"], type=pa.string()),
            "n_images": pa.array([n], type=pa.int64()),
            "max_w": pa.array([mw], type=pa.int64()),
            "max_h": pa.array([mh], type=pa.int64()),
            "pad_waste": pa.array([n * mw * mh - spx], type=pa.int64()),
        })

    return part.groupby("bucket").map_groups(resolve, batch_format="pyarrow")


def sql_aspect_buckets() -> str:
    from rhealpixdggs_py_ray.fixtures import write_images_table

    write_images_table(IMG_DIR, IMG_N)
    bins = ", ".join(
        f"({i}, '{n}:{d}', {(1000 * n) // d})"
        for i, (n, d) in enumerate(ASPECT_BINS)
    )
    return f"""
WITH img AS MATERIALIZED (
  SELECT CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         (1000 * CAST(w AS BIGINT)) // CAST(h AS BIGINT) AS arm
  FROM read_parquet('{IMG_DIR}/*.parquet')
),
bins(bucket, ratio, bm) AS (VALUES {bins}),
dw AS MATERIALIZED (SELECT DISTINCT w, h, arm FROM img),
asg AS MATERIALIZED (
  SELECT w, h, bucket, ratio FROM (
    SELECT dw.w, dw.h, b.bucket, b.ratio,
      row_number() OVER (PARTITION BY dw.w, dw.h
                         ORDER BY abs(dw.arm - b.bm), b.bucket) AS rn
    FROM dw CROSS JOIN bins b) t WHERE rn = 1
),
j AS MATERIALIZED (
  SELECT img.w, img.h, asg.bucket, asg.ratio FROM img
  JOIN asg ON img.w = asg.w AND img.h = asg.h
)
SELECT CAST(bucket AS BIGINT) AS bucket, ratio,
  CAST(COUNT(*) AS BIGINT) AS n_images,
  CAST(MAX(w) AS BIGINT) AS max_w,
  CAST(MAX(h) AS BIGINT) AS max_h,
  CAST(COUNT(*) * MAX(w) * MAX(h) - SUM(w * h) AS BIGINT) AS pad_waste
FROM j GROUP BY bucket, ratio
"""


# Iterative link analysis (PageRank), round 3
PAGERANK_ITERS = 3
PAGERANK_TOPK = 20
PAGERANK_NODE_CAP = 8_000_000  # driver rank-vector bound (same budget as
# ops/cc.py's union-find cap: 8M nodes = 64 MB; beyond it the rank
# table must live as a src-bucketed dataset joined to the edges each
# iteration — the hash-min CC shape, 2 exchanges/iteration)


def q_pagerank(sf_dir: str):
    """PageRank over a deterministic event graph (src = user_id,
    dst = splitmix64(event_id) mod n_nodes), 3 damped iterations in
    EXACT integer arithmetic: contrib = r[src] // outdeg[src],
    r' = 150000 + (85 * sum_in(contrib)) // 100 — every step is
    order-free, so block/reducer interleaving can't move a bit.

    Shape: edges materialized once as a narrow (src, dst) projection
    (payloads never enter); per iteration ONE map pass emitting
    per-batch np.unique dst-partials, driver-combined into the rank
    vector (n_nodes-bounded, cap documented above; k-means syncs k*d
    the same way).  Returns the top-20 nodes by final rank."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"])
    n = int(ds.max("user_id")) + 1
    if n > PAGERANK_NODE_CAP:
        # beyond the driver-vector budget: the fully distributed path
        # (bucketed rank dataset, 2 exchanges/iteration) takes over
        return q_pagerank_distributed(sf_dir)

    def mk_edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = (splitmix64(eid) % np.uint64(n)).astype(np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = ds.map_batches(
        mk_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed 1 + ITERS times; never recompute lineage

    def deg_part(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["src"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"k": pa.array(u), "c": pa.array(c.astype(np.int64))})

    deg = np.zeros(n, dtype=np.int64)
    for b in edges.map_batches(
        deg_part, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            np.add.at(deg, b["k"].to_numpy(zero_copy_only=False),
                      b["c"].to_numpy(zero_copy_only=False))

    r = np.full(n, 1_000_000, dtype=np.int64)
    for _ in range(PAGERANK_ITERS):
        contrib_ref = ray.put(r // np.maximum(deg, 1))

        def spart(batch: pa.Table, _ref=contrib_ref) -> pa.Table:
            c = ray.get(_ref)  # zero-copy plasma view
            s = batch["src"].to_numpy(zero_copy_only=False)
            d = batch["dst"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(d, return_inverse=True)
            acc = np.zeros(len(u), dtype=np.int64)
            np.add.at(acc, inv, c[s])
            return pa.table({"k": pa.array(u), "c": pa.array(acc)})

        snew = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(
            spart, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                np.add.at(snew, b["k"].to_numpy(zero_copy_only=False),
                          b["c"].to_numpy(zero_copy_only=False))
        r = 150000 + (85 * snew) // 100

    order = np.lexsort((np.arange(n), -r))[:PAGERANK_TOPK]
    return pa.table({
        "node": pa.array(order.astype(np.int64)),
        "rank_micros": pa.array(r[order]),
    })


def sql_pagerank() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT event_id, user_id AS src FROM events", "src", "event_id", "h"
    )
    iters = []
    prev = "r0"
    for t in (1, 2, 3):
        iters.append(f"""
s{t} AS MATERIALIZED (
  SELECT e.dst AS node, SUM(r.r // g.d) AS s
  FROM edges e JOIN deg g ON g.src = e.src
  JOIN {prev} r ON r.node = e.src
  GROUP BY e.dst),
r{t} AS MATERIALIZED (
  SELECT n.node, 150000 + (85 * COALESCE(s.s, 0)) // 100 AS r
  FROM nodes n LEFT JOIN s{t} s ON s.node = n.node)""")
        prev = f"r{t}"
    chain = ",".join(iters)
    return f"""
WITH mx AS MATERIALIZED (SELECT MAX(user_id) + 1 AS n FROM events),
edges AS MATERIALIZED (
  SELECT src, CAST(h % CAST((SELECT n FROM mx) AS UBIGINT) AS BIGINT) AS dst
  FROM {sm} t),
deg AS MATERIALIZED (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src),
nodes AS MATERIALIZED (
  SELECT unnest(generate_series(0, (SELECT n FROM mx) - 1)) AS node),
r0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
{chain}
SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS rank_micros
FROM r3 ORDER BY r DESC, node LIMIT {PAGERANK_TOPK}
"""


def q_pagerank_distributed(sf_dir: str):
    """The beyond-cap PageRank shape (ops/graph.py): rank table as a
    node-hash-bucketed DATASET, two exchanges per iteration, no
    O(n_nodes) driver state.  Bit-identical to q_pagerank (same exact
    integer rule), so it shares the same unrolled-CTE oracle."""
    from rhealpixdggs_py_ray.fixtures import splitmix64
    from rhealpixdggs_py_ray.ops.graph import pagerank_distributed

    # exchange-bound (6 exchanges over 3 iterations): read narrow at
    # the 4-block profile so blocks x partitions stays small
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)
    n = int(ds.max("user_id")) + 1

    def mk_edges(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        src = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = (splitmix64(eid) % np.uint64(n)).astype(np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = ds.map_batches(
        mk_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    ranks = pagerank_distributed(edges, n, iters=PAGERANK_ITERS)
    return ranks.sort(["rank_micros", "node"], descending=[True, False]).limit(
        PAGERANK_TOPK
    )


def sql_pagerank_distributed() -> str:
    return sql_pagerank()


def q_pareto_docs(sf_dir: str):
    """Skyline / Pareto-front curation: the documents that are
    non-dominated on (length, lexical diversity) — the multi-criteria
    shortlist a data-curation pass keeps when no single score wins.

    Distributed anti-chain reduction (ops/agg.py:pareto_front_mask):
    each batch emits its LOCAL front's distinct (n_tokens, ttr) pairs
    with doc counts + min doc_id (a global-front pair survives every
    local front it appears in, so counts merge exactly); one tiny
    exchange; the final resolve re-sweeps the merged pairs."""
    from rhealpixdggs_py_ray.ops.agg import pareto_front_mask

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        dids, xs, ys = [], [], []
        for did, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        ):
            toks = text.split()
            if not toks:
                continue
            dids.append(did)
            xs.append(len(toks))
            ys.append(1000 * len(set(toks)) // len(toks))
        did = np.array(dids, dtype=np.int64)
        x = np.array(xs, dtype=np.int64)
        y = np.array(ys, dtype=np.int64)
        key = x.astype(np.uint64) * np.uint64(1024) + y.astype(np.uint64)
        uq, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mind = np.full(len(uq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mind, inv, did)
        ux = (uq // np.uint64(1024)).astype(np.int64)
        uy = (uq % np.uint64(1024)).astype(np.int64)
        m = pareto_front_mask(ux, uy)
        return pa.table({
            "g": pa.array(np.zeros(int(m.sum()), dtype=np.int64)),
            "x": pa.array(ux[m]), "y": pa.array(uy[m]),
            "n": pa.array(n[m]), "mind": pa.array(mind[m]),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        from rhealpixdggs_py_ray.ops.agg import pareto_front_mask as pfm

        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        mind = g["mind"].to_numpy(zero_copy_only=False)
        key = x.astype(np.uint64) * np.uint64(1024) + y.astype(np.uint64)
        uq, inv = np.unique(key, return_inverse=True)
        ns = np.zeros(len(uq), dtype=np.int64)
        np.add.at(ns, inv, n)
        ms = np.full(len(uq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(ms, inv, mind)
        ux = (uq // np.uint64(1024)).astype(np.int64)
        uy = (uq % np.uint64(1024)).astype(np.int64)
        m = pfm(ux, uy)
        return pa.table({
            "n_tokens": pa.array(ux[m]), "ttr_permille": pa.array(uy[m]),
            "n_docs": pa.array(ns[m]), "min_doc": pa.array(ms[m]),
        })

    return part.groupby("g").map_groups(resolve, batch_format="pyarrow")


def sql_pareto_docs() -> str:
    return """
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents WHERE trim(text) <> ''
),
m AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS x,
    1000 * COUNT(DISTINCT t) // COUNT(*) AS y
  FROM toks GROUP BY doc_id
),
gx AS MATERIALIZED (SELECT x, MAX(y) AS y FROM m GROUP BY x),
w AS MATERIALIZED (
  SELECT x, y, MAX(y) OVER (ORDER BY x DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM gx
),
front AS MATERIALIZED (SELECT x, y FROM w WHERE pm IS NULL OR y > pm)
SELECT f.x AS n_tokens, CAST(f.y AS BIGINT) AS ttr_permille,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(MIN(m.doc_id) AS BIGINT) AS min_doc
FROM m JOIN front f ON m.x = f.x AND m.y = f.y
GROUP BY f.x, f.y
"""


def q_image_augment(sf_dir: str):
    """Deterministic augmentation plumbing: actor-pool decode of the
    REAL payload bytes (raw/png codec) -> center square crop ->
    horizontal flip when phash is odd -> position-weighted pixel
    checksum (sum of (row*s + col + 1) * pixel; flip-sensitive, unlike
    a plain sum).  The oracle replays crop/flip index remapping on the
    generative pixel rule, so the whole decode+transform chain is
    value-verified byte-for-byte.  Payload never shuffles: output is
    4 ints per image."""
    from rhealpixdggs_py_ray.fixtures import decode_image, write_images_table

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(
        IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8)
    )

    class Augment:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy(zero_copy_only=False)
            hs = batch["h"].to_numpy(zero_copy_only=False)
            phs = batch["phash"].to_numpy(zero_copy_only=False)
            idx, size, flip, chk = [], [], [], []
            for iid, data, fmt, w, h, ph in zip(ids, blobs, fmts, ws, hs, phs):
                w, h = int(w), int(h)
                pix = decode_image(data, fmt, w, h).astype(np.int64)
                s = min(w, h)
                x0, y0 = (w - s) // 2, (h - s) // 2
                crop = pix[y0:y0 + s, x0:x0 + s, :]
                f = int(ph) & 1
                if f:
                    crop = crop[:, ::-1, :]
                wgt = np.arange(s, dtype=np.int64)[:, None] * s \
                    + np.arange(s, dtype=np.int64)[None, :] + 1
                idx.append(int(iid[3:]))
                size.append(s)
                flip.append(f)
                chk.append(int((crop.sum(axis=2) * wgt).sum()))
            return pa.table({
                "idx": pa.array(np.array(idx, dtype=np.int64)),
                "out_size": pa.array(np.array(size, dtype=np.int64)),
                "flipped": pa.array(np.array(flip, dtype=np.int64)),
                "chk": pa.array(np.array(chk, dtype=np.int64)),
            })

    return ds.map_batches(
        Augment, batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )


def sql_image_augment() -> str:
    from rhealpixdggs_py_ray.fixtures import write_images_table

    write_images_table(IMG_DIR, IMG_N)
    M = "18446744073709551616"
    u = f"CAST(((CAST(phash AS HUGEINT) % {M}) + {M}) % {M} AS UBIGINT)"
    val = (
        "((x * 3 + y * 5 + cc * 7"
        " + CAST((u >> CAST(8 * cc AS UBIGINT)) & 255 AS BIGINT)) % 256)"
    )
    return f"""
WITH src AS MATERIALIZED (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS idx,
    CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, u,
    least(CAST(w AS BIGINT), CAST(h AS BIGINT)) AS s,
    CAST(u & 1 AS BIGINT) AS flip
  FROM (SELECT image_id, w, h, {u} AS u
        FROM read_parquet('{IMG_DIR}/*.parquet')) q
),
cells AS MATERIALIZED (
  SELECT idx, s, flip, u, aa, bb, cc,
    (w - s) // 2 + CASE WHEN flip = 1 THEN s - 1 - bb ELSE bb END AS x,
    (h - s) // 2 + aa AS y
  FROM src,
    unnest(generate_series(0, s - 1)) AS ta(aa),
    unnest(generate_series(0, s - 1)) AS tb(bb),
    (SELECT unnest(generate_series(0, 2)) AS cc) tc
)
SELECT idx, MIN(s) AS out_size, MIN(flip) AS flipped,
  CAST(SUM((aa * s + bb + 1) * {val}) AS BIGINT) AS chk
FROM cells GROUP BY idx
"""


def q_ewma_user(sf_dir: str):
    """Per-user exponentially-decayed activity state (the streaming
    feature-store fold): over each user's events ordered by (ts,
    event_id), r := (r * 7) // 8 + v_cents, seeded with the first
    value.  The integer floor makes the fold NON-associative — unlike
    running_totals' cumsum it cannot be prefix-scanned — so the
    resolve runs all users of a bucket in LOCKSTEP: one vectorized
    gather per event position (max events/user iterations), never a
    per-user Python loop (the fingerprint fold pattern, ops/text.py).
    One h(user) bucket exchange total."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "value"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, nb)),
            "user_id": batch["user_id"],
            "t": pa.array(ts.astype(np.int64)),
            "event_id": batch["event_id"],
            "v_c": pa.array(np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "user_id" not in g.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "ewma_c": pa.array([], type=pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        v = g["v_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, v = uid[order], v[order]
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(starts, len(uid)))
        r = v[starts].copy()  # seed: first value per user
        jmax = int(seg_len.max()) if len(seg_len) else 0
        for j in range(1, jmax):
            alive = seg_len > j
            pos = starts[alive] + j
            r[alive] = (r[alive] * 7) // 8 + v[pos]
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "n_events": pa.array(seg_len.astype(np.int64)),
            "ewma_c": pa.array(r),
        })

    part = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("bucket").map_groups(fold, batch_format="pyarrow")


def sql_ewma_user() -> str:
    return """
WITH e AS MATERIALIZED (
  SELECT user_id, ts, event_id, CAST(floor(value * 100) AS BIGINT) AS v
  FROM events
),
l AS MATERIALIZED (
  SELECT user_id, list(v ORDER BY ts, event_id) AS vs FROM e GROUP BY user_id
)
SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
  CAST(CASE WHEN len(vs) = 1 THEN vs[1]
    ELSE list_reduce(vs, (a, b) -> (a * 7) // 8 + b) END AS BIGINT)
  AS ewma_c
FROM l
"""


# ---------------------------------------------------------------------------
# Dissolve: raster -> vector boundary of the occupied-cell region
# ---------------------------------------------------------------------------

DISSOLVE_RES = 4      # res-4 equatorial lattice: 4*3^4 = 324 cols, 81 rows
DISSOLVE_LAT = 35.0   # keeps every point inside faces O..R (caps start ~41.9)


def _dissolve_boundary(sf_dir: str):
    """Raster->vector dissolve (the north-star's raster<->vector tiling,
    vector direction): events -> occupied res-4 cells (exact distinct)
    -> outer/inner boundary RINGS of the occupied region as directed
    lattice edges, via edge cancellation.

    Inside the equatorial band the res-k cells of faces O..R form one
    global integer lattice (row from the base-3 row digits, col from
    face order O,P,Q,R + col digits; verified empirically and pinned in
    tests).  Every cell emits its 4 directed boundary edges weighted
    4+dir on an undirected edge key; an edge shared by two occupied
    cells is traversed twice in OPPOSITE directions (weight sum >= 8),
    so after one exact u64-key sum the boundary is ``wsum < 8`` and the
    surviving direction bit is ``wsum - 4``.  Two bucket exchanges
    total (cell distinct, edge cancel); both are mergeable partial sums
    -- the 10^12-row shape.  Vertical edges wrap modulo 4*3^k, so the
    dissolve is correct across the antimeridian seam.
    """
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        u = u[np.abs(lat) <= DISSOLVE_LAT]
        return pa.table({
            "cell_u64": pa.array(u, type=pa.uint64()),
            "one": pa.array(np.ones(len(u), dtype=np.int64)),
        })

    occ = sum_by_u64_key(
        indexed_events(sf_dir, resolution=k).map_batches(
            cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "n_pts",
    )

    def edges(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        # undirected key: typ<<41 | y<<21 | x ; weight 4 + direction
        def key(typ, y, x):
            return (np.int64(typ) << np.int64(41)) | (y << np.int64(21)) | x
        ekey = np.concatenate([
            key(0, gy, gx),                 # top,    traversed +x
            key(0, gy + 1, gx),             # bottom, traversed -x
            key(1, gy, (gx + 1) % W),       # right,  traversed +y
            key(1, gy, gx),                 # left,   traversed -y
        ])
        n = len(gx)
        w = np.concatenate([
            np.full(n, 5, dtype=np.int64), np.full(n, 4, dtype=np.int64),
            np.full(n, 5, dtype=np.int64), np.full(n, 4, dtype=np.int64),
        ])
        return pa.table({"ekey": pa.array(ekey.astype(np.uint64)),
                         "w": pa.array(w)})

    bd = sum_by_u64_key(
        occ.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True),
        "ekey", "w", "wsum",
    )

    def decode(batch: pa.Table) -> pa.Table:
        key = batch["ekey"].to_numpy(zero_copy_only=False).astype(np.int64)
        wsum = batch["wsum"].to_numpy(zero_copy_only=False)
        m = wsum < 8
        key, wsum = key[m], wsum[m]
        typ = key >> np.int64(41)
        y = (key >> np.int64(21)) & np.int64((1 << 20) - 1)
        x = key & np.int64((1 << 20) - 1)
        fwd = wsum == 5
        x1 = np.where(typ == 0, np.where(fwd, x, x + 1), x)
        x2 = np.where(typ == 0, np.where(fwd, x + 1, x), x)
        y1 = np.where(typ == 0, y, np.where(fwd, y, y + 1))
        y2 = np.where(typ == 0, y, np.where(fwd, y + 1, y))
        return pa.table({
            "ekey": pa.array(key), "x1": pa.array(x1), "y1": pa.array(y1),
            "x2": pa.array(x2), "y2": pa.array(y2),
        })

    return bd.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def q_dissolve(sf_dir: str):
    """Raster->vector dissolve output surface: the directed boundary
    edges only (see _dissolve_boundary's docstring for the algorithm;
    q_dissolve_rings chains the rings)."""
    return _dissolve_boundary(sf_dir).select_columns(["x1", "y1", "x2", "y2"])


def _dissolve_rowcol_sql(k: int) -> tuple[str, str]:
    """Closed-form (gy, gx) from the cell_id string digits."""
    side = 3 ** k
    gy = " + ".join(
        f"(CAST(substr(cell_id, {1 + i}, 1) AS INT) // 3) * {3 ** (k - i)}"
        for i in range(1, k + 1)
    )
    gx = " + ".join(
        f"(CAST(substr(cell_id, {1 + i}, 1) AS INT) % 3) * {3 ** (k - i)}"
        for i in range(1, k + 1)
    )
    face = ("(CASE substr(cell_id, 1, 1) WHEN 'O' THEN 0 WHEN 'P' THEN 1"
            f" WHEN 'Q' THEN 2 ELSE 3 END) * {side}")
    return gy, f"{face} + {gx}"


def sql_dissolve() -> str:
    k = DISSOLVE_RES
    W = 4 * 3 ** k
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    return f"""
WITH cells AS MATERIALIZED (
  SELECT DISTINCT cell_id FROM {idx_sql} t
),
rc AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx FROM cells
),
edges AS MATERIALIZED (
  SELECT 0 AS typ, gy AS ey, gx AS ex, 5 AS w FROM rc
  UNION ALL SELECT 0, gy + 1, gx, 4 FROM rc
  UNION ALL SELECT 1, gy, (gx + 1) % {W}, 5 FROM rc
  UNION ALL SELECT 1, gy, gx, 4 FROM rc
),
g AS MATERIALIZED (
  SELECT typ, ey, ex, SUM(w) AS wsum FROM edges
  GROUP BY 1, 2, 3 HAVING SUM(w) < 8
)
SELECT
  CAST(CASE WHEN typ = 0 AND wsum = 4 THEN ex + 1 ELSE ex END AS BIGINT) AS x1,
  CAST(CASE WHEN typ = 1 AND wsum = 4 THEN ey + 1 ELSE ey END AS BIGINT) AS y1,
  CAST(CASE WHEN typ = 0 AND wsum = 5 THEN ex + 1 ELSE ex END AS BIGINT) AS x2,
  CAST(CASE WHEN typ = 1 AND wsum = 5 THEN ey + 1 ELSE ey END AS BIGINT) AS y2
FROM g
"""


# ---------------------------------------------------------------------------
# Line buffer cover: Chebyshev-r dilation of the linetrace supercover
# ---------------------------------------------------------------------------

LINE_BUFFER_R = 2  # lattice Chebyshev radius (cells)


def _lattice_from_cell_strings(cell_id: np.ndarray, k: int):
    """Vectorized (gy, gx) from fixed-width equatorial cell_id strings.
    Faces O..R are contiguous ASCII (79..82), digit chars are '0'..'8'."""
    b = np.frombuffer(
        np.asarray(cell_id, dtype=f"S{k + 1}").tobytes(), dtype=np.uint8
    ).reshape(-1, k + 1)
    side = 3 ** k
    face_col = b[:, 0].astype(np.int64) - 79
    d = b[:, 1:].astype(np.int64) - 48
    pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
    gy = (d // 3) @ pw
    gx = face_col * side + (d % 3) @ pw
    return gy, gx


def _cell_string_array_from_lattice(gy, gx, k) -> np.ndarray:
    side = 3 ** k
    out = np.empty((len(gy), k + 1), dtype=np.uint8)
    out[:, 0] = 79 + gx // side
    gxw = gx % side
    for i in range(k):
        p = 3 ** (k - 1 - i)
        out[:, 1 + i] = 48 + ((gy // p) % 3) * 3 + ((gxw // p) % 3)
    return out.view(f"S{k + 1}").ravel().astype(str)


def q_line_buffer(sf_dir: str):
    """Buffered polyline cover: every res-4 cell within lattice
    Chebyshev distance LINE_BUFFER_R of the linetrace supercover of
    each fixture polyline (the corridor-query shape: 'all tiles within
    r cells of this route').  Dilation happens on the same global
    equatorial lattice as q_dissolve: per trace cell a (2r+1)^2 offset
    fan, rows clipped to the band, columns wrapped modulo 4*3^k, then
    one exact u64-key distinct.  Scale shape: the trace is tiny (one
    row per crossed cell), the fan is constant-size, and the distinct
    is one bucket exchange."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = LINETRACE_RES
    side = 3 ** k
    W = 4 * side
    r = LINE_BUFFER_R
    trace = q_linetrace(sf_dir)

    offs = np.arange(-r, r + 1, dtype=np.int64)
    dy, dx = [a.ravel() for a in np.meshgrid(offs, offs, indexing="ij")]

    def dilate(batch: pa.Table) -> pa.Table:
        lid = batch["line_id"].to_numpy(zero_copy_only=False)
        gy, gx = _lattice_from_cell_strings(
            batch["cell_id"].to_numpy(zero_copy_only=False), k)
        gy2 = (gy[:, None] + dy[None, :]).ravel()
        gx2 = ((gx[:, None] + dx[None, :]) % W).ravel()
        lid2 = np.repeat(lid, len(dy))
        keep = (gy2 >= 0) & (gy2 < side)
        gy2, gx2, lid2 = gy2[keep], gx2[keep], lid2[keep]
        key = (lid2 << np.int64(32)) | (gy2 * W + gx2)
        return pa.table({
            "key": pa.array(key.astype(np.uint64)),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    dil = sum_by_u64_key(
        trace.map_batches(dilate, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n",
    )

    def decode(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        lid = key >> np.int64(32)
        yx = key & np.int64((1 << 32) - 1)
        gy, gx = yx // W, yx % W
        return pa.table({
            "line_id": pa.array(lid),
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy, gx, k), type=pa.string()),
        })

    return dil.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)


def sql_line_buffer() -> str:
    k = LINETRACE_RES
    side = 3 ** k
    W = 4 * side
    r = LINE_BUFFER_R
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx2 // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy2 // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx2 % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    return f"""
WITH trace AS MATERIALIZED ({oracle.linetrace_sql(LINETRACE_LINES, k, CFG)}),
rc AS MATERIALIZED (
  SELECT DISTINCT line_id, {gy} AS gy, {gx} AS gx FROM trace
),
dil AS MATERIALIZED (
  SELECT DISTINCT line_id, gy + dy AS gy2, (gx + dx + {W}) % {W} AS gx2
  FROM rc,
       (SELECT unnest(generate_series(-{r}, {r})) AS dy) a,
       (SELECT unnest(generate_series(-{r}, {r})) AS dx) b
  WHERE gy + dy >= 0 AND gy + dy < {side}
)
SELECT line_id, {rebuild} AS cell_id FROM dil
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup inside nearest-centroid clusters
# ---------------------------------------------------------------------------

SEMDEDUP_TAU = 0.4


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023 shape): embeddings -> nearest-
    centroid clusters -> exact cosine near-dup removal WITHIN each
    cluster, keeping the smallest vec_id of every near-dup pair.
    Output one row per vector: (vec_id, cluster, keep).

    Scale shape: centroids are a bounded broadcast (ray.put once), the
    corpus shuffles ONCE by cluster id, and the quadratic verify runs
    per cluster — at 10^12 rows the quantizer's k grows with N so
    per-cluster size stays bounded (here k = the 10 fixture labels).
    Float parity: assignment distances and cosines fold left-to-right
    (ops/ann._seq_*) mirroring the SQL list folds; ties -> smaller
    label, matching the QUALIFY ordering."""
    from rhealpixdggs_py_ray.ops.ann import _seq_d2, _seq_dots, _seq_norm
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    cdf = (
        q_embedding_centroids(sf_dir)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    labels = np.sort(cdf["label"].unique()).astype(np.int64)
    C = (
        cdf["sum_micros"].to_numpy().astype(np.float64)
        / cdf["n"].to_numpy().astype(np.float64)
    ).reshape(len(labels), EMB_D)
    cent_ref = ray.put((labels, C))

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(batch: pa.Table) -> pa.Table:
        labs, cm = ray.get(cent_ref)
        X = np.floor(_emb_matrix(batch).astype(np.float64) * 1000000.0)
        near = labs[np.argmin(_seq_d2(X, cm), axis=1)]
        return batch.append_column("cluster", pa.array(near))

    asg = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "vec_id" not in g.column_names:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cluster": pa.array([], type=pa.int64()),
                             "keep": pa.array([], type=pa.int64())})
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = g["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = _emb_matrix(g)
        nrm = _seq_norm(M)
        S = _seq_dots(M, M) / (nrm[:, None] * nrm[None, :])
        smaller = ids[:, None] < ids[None, :]  # [i, j]: i precedes j
        dropped = ((S >= SEMDEDUP_TAU) & smaller).any(axis=0)
        return pa.table({
            "vec_id": pa.array(ids),
            "cluster": pa.array(cl),
            "keep": pa.array((~dropped).astype(np.int64)),
        })

    return asg.groupby("cluster").map_groups(resolve, batch_format="pyarrow")


def sql_semdedup() -> str:
    cent = sql_embedding_centroids()
    cw_cols = ", ".join(
        f"MAX(CASE WHEN dim = {d} THEN CAST(sum_micros AS DOUBLE)"
        f" / CAST(n AS DOUBLE) END) AS c{d}"
        for d in range(EMB_D)
    )

    def e(d: int) -> str:
        return f"floor(CAST(embedding[{d + 1}] AS DOUBLE) * 1000000.0)"

    dist = " + ".join(f"(({e(d)}) - c{d}) * (({e(d)}) - c{d})" for d in range(EMB_D))
    cos = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)),"
        " i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))"
        " / (a.nrm * b.nrm)"
    )
    return f"""
WITH cent AS MATERIALIZED ({cent}),
cw AS MATERIALIZED (SELECT label AS clabel, {cw_cols} FROM cent GROUP BY label),
d AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, cw.clabel, ({dist}) AS dist
  FROM embeddings e CROSS JOIN cw
),
asg AS MATERIALIZED (
  SELECT vec_id, embedding, clabel AS cluster FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) = 1
),
n AS MATERIALIZED (
  SELECT vec_id, cluster, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM asg
),
drops AS MATERIALIZED (
  SELECT DISTINCT b.vec_id FROM n a
  JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {cos} >= {SEMDEDUP_TAU!r}
)
SELECT n.vec_id, CAST(n.cluster AS BIGINT) AS cluster,
  CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM n LEFT JOIN drops dr ON n.vec_id = dr.vec_id
"""


def q_knn_graph(sf_dir: str):
    """Exact cosine k-NN graph (every vector a query) via chunk-pair
    partial top-k + bucketed resolve (ops/ann.knn_graph)."""
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.knn_graph(emb)


def sql_knn_graph() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.knn_graph_sql()


# ---------------------------------------------------------------------------
# IDW interpolation raster: inverse-distance-weighted field per tile
# ---------------------------------------------------------------------------

IDW_NPOI = 5


def q_idw_raster(sf_dir: str):
    """Spatial interpolation raster: every event location gets an
    inverse-squared-chord-distance weighted value from the broadcast
    5-station set (value_j = (j+1)*10), then the res-2 tile aggregate
    of the quantized field -> (tile_id, n, sum_idw_micros).  The IDW
    numerator/denominator fold station-by-station in SQL operand order
    so the double division is bit-identical; per-tile sums are int64
    micros (order-free).  Pure map + one small-cardinality aggregate —
    the interpolate-a-field-at-10^12-points shape."""
    from rhealpixdggs_py_ray.core import projection as proj

    pid = np.arange(IDW_NPOI, dtype=np.int64)
    plon, plat = oracle.lonlat_from_id(pid + 3_000_000)
    px, py, pz = proj.xyz(CFG, plon, plat)
    pval = ((pid + 1) * 10).astype(np.float64)

    ds = indexed_events(sf_dir, resolution=TILE_RES)

    def idw(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        x, y, z = proj.xyz(CFG, lon, lat)
        num = np.zeros(len(lon), dtype=np.float64)
        den = np.zeros(len(lon), dtype=np.float64)
        for j in range(IDW_NPOI):
            dx = px[j] - x
            dy = py[j] - y
            dz = pz[j] - z
            d2 = dx * dx + dy * dy + dz * dz  # SQL operand order
            num = num + pval[j] / d2
            den = den + 1.0 / d2
        val = np.floor(num / den * 1000000.0).astype(np.int64)
        return pa.table({
            "tile_id": batch["cell_id"],
            "idw_micros": pa.array(val),
            "one": pa.array(np.ones(len(val), dtype=np.int64)),
        })

    part = ds.map_batches(idw, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("tile_id").aggregate(
        Sum("idw_micros", alias_name="sum_idw_micros"),
        Sum("one", alias_name="n"),
    )


def sql_idw_raster() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )

    def xyz_exprs(lon_e: str, lat_e: str):
        nrm = f"{a}/sqrt(1 - {e2}*sin(radians({lat_e}))*sin(radians({lat_e})))"
        return (
            f"{nrm}*cos(radians({lon_e}))*cos(radians({lat_e}))",
            f"{nrm}*sin(radians({lon_e}))*cos(radians({lat_e}))",
            f"{nrm}*(1 - {e2})*sin(radians({lat_e}))",
        )

    x, y, z = xyz_exprs("lon", "lat")
    pid = np.arange(IDW_NPOI, dtype=np.int64)
    plon, plat = oracle.lonlat_from_id(pid + 3_000_000)
    num_terms, den_terms = [], []
    for j in range(IDW_NPOI):
        pxe, pye, pze = xyz_exprs(repr(float(plon[j])), repr(float(plat[j])))
        d2 = (f"(({pxe})-x)*(({pxe})-x) + (({pye})-y)*(({pye})-y)"
              f" + (({pze})-z)*(({pze})-z)")
        num_terms.append(f"{float((j + 1) * 10)!r} / ({d2})")
        den_terms.append(f"1.0 / ({d2})")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
WITH xyzp AS MATERIALIZED (
  SELECT event_id, lon, lat, {x} AS x, {y} AS y, {z} AS z
  FROM (SELECT event_id, {lon} AS lon, {lat} AS lat FROM events) p
),
cells AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
v AS MATERIALIZED (
  SELECT cells.cell_id AS tile_id,
    CAST(floor(({num}) / ({den}) * 1000000.0) AS BIGINT) AS idw_micros
  FROM xyzp JOIN cells ON xyzp.event_id = cells.event_id
)
SELECT tile_id, CAST(SUM(idw_micros) AS BIGINT) AS sum_idw_micros,
  CAST(COUNT(*) AS BIGINT) AS n
FROM v GROUP BY tile_id
"""


# ---------------------------------------------------------------------------
# Per-source quota (CCNet-style corpus balancing) + reverse-kNN counts
# ---------------------------------------------------------------------------

SOURCE_CAP = 40


def q_source_cap(sf_dir: str):
    """Per-source document quota (the CCNet/C4 corpus-balancing shape):
    within each source keep the SOURCE_CAP docs with the smallest
    doc_id (deterministic priority), flag the rest.  One h(source)
    bucket exchange; the per-bucket resolve ranks every source of the
    bucket in one segmented vectorized pass.  Output (doc_id, source,
    rank, keep)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(src.astype(object)).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(nb)).astype(np.int64)))

    def rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "doc_id" not in g.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "keep": pa.array([], type=pa.int64())})
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["source"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        d, s = d[order], s[order]
        new_seg = np.r_[True, s[1:] != s[:-1]]
        starts = np.flatnonzero(new_seg)
        rk = np.arange(len(d), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(d)))) + 1
        return pa.table({
            "doc_id": pa.array(d),
            "source": pa.array(s, type=pa.string()),
            "rank": pa.array(rk),
            "keep": pa.array((rk <= SOURCE_CAP).astype(np.int64)),
        })

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rank, batch_format="pyarrow")
    )


def sql_source_cap() -> str:
    return f"""
SELECT doc_id, source,
  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank,
  CAST(CASE WHEN row_number() OVER (PARTITION BY source ORDER BY doc_id)
       <= {SOURCE_CAP} THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents
"""


def q_rknn_counts(sf_dir: str):
    """Reverse-kNN in-degree: for every vector, how many other vectors
    list it among their top-k (hubness audit of the embedding space).
    The graph's neighbor column and a zero row per vector from the
    embeddings table enter the SAME bucket exchange as mergeable
    partials (union -> one exact u64-key sum) — zero-in-degree vectors
    appear with no driver-side table and no join."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.ann import knn_graph

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    g = knn_graph(emb)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, cnt = np.unique(v, return_counts=True)
        return pa.table({
            "vec_id": pa.array(uq),
            "n": pa.array(cnt.astype(np.int64)),
            "bucket": pa.array(hash_bucket_u64(uq.astype(np.uint64), 8)),
        })

    def zeros(batch: pa.Table) -> pa.Table:
        v = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(v),
            "n": pa.array(np.zeros(len(v), dtype=np.int64)),
            "bucket": pa.array(hash_bucket_u64(v.astype(np.uint64), 8)),
        })

    def reduce_(gr: pa.Table) -> pa.Table:
        if gr.num_rows == 0 or "vec_id" not in gr.column_names:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "indeg": pa.array([], type=pa.int64())})
        v = gr["vec_id"].to_numpy(zero_copy_only=False)
        n = gr["n"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(v, return_inverse=True)
        sm = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sm, inv, n)
        return pa.table({"vec_id": pa.array(uq), "indeg": pa.array(sm)})

    parts = g.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        _read(sf_dir, "embeddings", columns=["vec_id"]).map_batches(
            zeros, batch_format="pyarrow", zero_copy_batch=True)
    )
    return parts.groupby("bucket").map_groups(reduce_, batch_format="pyarrow")


def sql_rknn_counts() -> str:
    from rhealpixdggs_py_ray.ops.ann import knn_graph_sql

    return f"""
WITH g AS MATERIALIZED ({knn_graph_sql()})
SELECT e.vec_id, CAST(coalesce(COUNT(g.qid), 0) AS BIGINT) AS indeg
FROM embeddings e LEFT JOIN g ON g.vec_id = e.vec_id
GROUP BY e.vec_id
"""


# ---------------------------------------------------------------------------
# Dissolve rings: chain the boundary into closed rings (cc composition)
# ---------------------------------------------------------------------------

def q_dissolve_rings(sf_dir: str):
    """Ring decomposition of the dissolve boundary: directed edges are
    graph nodes, consecutive edges (end vertex == start vertex) are
    graph edges, and each closed ring is a connected component
    (ops/cc.connected_components — the same machinery as the dedup
    cluster step, composed onto geometry).  Output one row per ring:
    (ring_id = min member ekey, n_edges, area2 = directed shoelace
    sum, exact integer).  Pinch vertices (2 ends x 2 starts) merge the
    touching rings identically on both sides.  Exchanges: one h(vertex)
    pair build, the cc forest pass, one h(ekey) label+coords attach,
    one h(ring) final sum."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.cc import connected_components

    bnd = _dissolve_boundary(sf_dir).materialize()  # two consumers
    nb = 8

    def vertex_rows(batch: pa.Table) -> pa.Table:
        ek = batch["ekey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch["x1"].to_numpy(zero_copy_only=False)
        y1 = batch["y1"].to_numpy(zero_copy_only=False)
        x2 = batch["x2"].to_numpy(zero_copy_only=False)
        y2 = batch["y2"].to_numpy(zero_copy_only=False)
        # vertex keys take x modulo the seam width so rings chain
        # across the antimeridian (x == W and x == 0 are the same
        # geodesic vertex)
        W = 4 * 3 ** DISSOLVE_RES
        v_end = (x2 % W) * (1 << 21) + y2    # this edge ENDS here
        v_start = (x1 % W) * (1 << 21) + y1  # this edge STARTS here
        vk = np.concatenate([v_end, v_start])
        side = np.concatenate([np.zeros(len(ek), dtype=np.int64),
                               np.ones(len(ek), dtype=np.int64)])
        ek2 = np.concatenate([ek, ek])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(vk.astype(np.uint64), nb)),
            "vk": pa.array(vk),
            "side": pa.array(side),
            "ekey": pa.array(ek2),
        })

    def make_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "vk" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        vk = g["vk"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        ek = g["ekey"].to_numpy(zero_copy_only=False)
        e_vk, e_ek = vk[side == 0], ek[side == 0]
        s_vk, s_ek = vk[side == 1], ek[side == 1]
        eo = np.lexsort((e_ek, e_vk)); e_vk, e_ek = e_vk[eo], e_ek[eo]
        so = np.lexsort((s_ek, s_vk)); s_vk, s_ek = s_vk[so], s_ek[so]
        # segment cross product per shared vertex (1x1 normally, 2x2 at
        # pinches): for each end row, locate its vertex's start range
        lo = np.searchsorted(s_vk, e_vk, side="left")
        hi = np.searchsorted(s_vk, e_vk, side="right")
        cnt = hi - lo
        a = np.repeat(e_ek, cnt)
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)]) \
            if len(lo) else np.array([], dtype=np.int64)
        b = s_ek[idx]
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs = (
        bnd.map_batches(vertex_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(make_pairs, batch_format="pyarrow")
    )
    lab = connected_components(pairs)  # (doc_id=ekey, cluster_id, keep)

    def lab_rows(batch: pa.Table) -> pa.Table:
        ek = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = batch["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ek.astype(np.uint64), nb)),
            "ekey": pa.array(ek), "cl": pa.array(cl),
            "cross": pa.array(np.zeros(len(ek), dtype=np.int64)),
            "is_lab": pa.array(np.ones(len(ek), dtype=np.int64)),
        })

    def edge_rows(batch: pa.Table) -> pa.Table:
        ek = batch["ekey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cross = (batch["x1"].to_numpy(zero_copy_only=False)
                 * batch["y2"].to_numpy(zero_copy_only=False)
                 - batch["x2"].to_numpy(zero_copy_only=False)
                 * batch["y1"].to_numpy(zero_copy_only=False))
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ek.astype(np.uint64), nb)),
            "ekey": pa.array(ek), "cl": pa.array(np.zeros(len(ek), dtype=np.int64)),
            "cross": pa.array(cross.astype(np.int64)),
            "is_lab": pa.array(np.zeros(len(ek), dtype=np.int64)),
        })

    def attach(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "ekey" not in g.column_names:
            return pa.table({"cl": pa.array([], type=pa.int64()),
                             "cross": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        ek = g["ekey"].to_numpy(zero_copy_only=False)
        cl = g["cl"].to_numpy(zero_copy_only=False)
        cross = g["cross"].to_numpy(zero_copy_only=False)
        is_lab = g["is_lab"].to_numpy(zero_copy_only=False).astype(bool)
        lk, lv = ek[is_lab], cl[is_lab]
        lo_ = np.argsort(lk); lk, lv = lk[lo_], lv[lo_]
        dk, dx = ek[~is_lab], cross[~is_lab]
        pos = np.clip(np.searchsorted(lk, dk), 0, max(len(lk) - 1, 0))
        if len(lk) == 0 or not np.array_equal(lk[pos], dk):
            raise AssertionError("unlabeled boundary edge — rings not closed")
        ring = lv[pos]
        uq, inv = np.unique(ring, return_inverse=True)
        sx = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sx, inv, dx)
        nn = np.bincount(inv, minlength=len(uq)).astype(np.int64)
        return pa.table({"cl": pa.array(uq), "cross": pa.array(sx),
                         "n": pa.array(nn)})

    merged = (
        lab.map_batches(lab_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(bnd.map_batches(edge_rows, batch_format="pyarrow",
                               zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(attach, batch_format="pyarrow")
    )

    def final_key(batch: pa.Table) -> pa.Table:
        c = batch["cl"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(c.astype(np.uint64), nb)),
            "cl": batch["cl"], "cross": batch["cross"], "n": batch["n"],
        })

    def final_sum(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "cl" not in g.column_names:
            return pa.table({"ring_id": pa.array([], type=pa.int64()),
                             "n_edges": pa.array([], type=pa.int64()),
                             "area2": pa.array([], type=pa.int64())})
        c = g["cl"].to_numpy(zero_copy_only=False)
        x = g["cross"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(c, return_inverse=True)
        sx = np.zeros(len(uq), dtype=np.int64); np.add.at(sx, inv, x)
        sn = np.zeros(len(uq), dtype=np.int64); np.add.at(sn, inv, n)
        return pa.table({"ring_id": pa.array(uq), "n_edges": pa.array(sn),
                         "area2": pa.array(sx)})

    return (
        merged.map_batches(final_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final_sum, batch_format="pyarrow")
    )


def _dissolve_boundary_sql_ctes() -> str:
    """Boundary-edge CTE chain shared by sql_dissolve_rings (names
    prefixed b- to avoid collisions inside WITH RECURSIVE)."""
    k = DISSOLVE_RES
    W = 4 * 3 ** k
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    return f"""
bcells AS MATERIALIZED (
  SELECT DISTINCT cell_id FROM {idx_sql} t
),
brc AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx FROM bcells
),
bed AS MATERIALIZED (
  SELECT 0 AS typ, gy AS ey, gx AS ex, 5 AS w FROM brc
  UNION ALL SELECT 0, gy + 1, gx, 4 FROM brc
  UNION ALL SELECT 1, gy, (gx + 1) % {W}, 5 FROM brc
  UNION ALL SELECT 1, gy, gx, 4 FROM brc
),
bg AS MATERIALIZED (
  SELECT typ, ey, ex, SUM(w) AS wsum FROM bed
  GROUP BY 1, 2, 3 HAVING SUM(w) < 8
),
bnd AS MATERIALIZED (
  SELECT (typ * {1 << 41} + ey * {1 << 21} + ex) AS ekey,
    CAST(CASE WHEN typ = 0 AND wsum = 4 THEN ex + 1 ELSE ex END AS BIGINT) AS x1,
    CAST(CASE WHEN typ = 1 AND wsum = 4 THEN ey + 1 ELSE ey END AS BIGINT) AS y1,
    CAST(CASE WHEN typ = 0 AND wsum = 5 THEN ex + 1 ELSE ex END AS BIGINT) AS x2,
    CAST(CASE WHEN typ = 1 AND wsum = 5 THEN ey + 1 ELSE ey END AS BIGINT) AS y2
  FROM bg
)"""


def sql_dissolve_rings() -> str:
    W = 4 * 3 ** DISSOLVE_RES
    return f"""
WITH RECURSIVE {_dissolve_boundary_sql_ctes()},
p AS MATERIALIZED (
  SELECT e.ekey AS a, s.ekey AS b FROM bnd e
  JOIN bnd s ON (e.x2 % {W}) = (s.x1 % {W}) AND e.y2 = s.y1
),
ed2 AS MATERIALIZED (
  SELECT a AS u, b AS v FROM p UNION ALL SELECT b AS u, a AS v FROM p
),
reach(n, m) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM ed2) t
  UNION
  SELECT r.n, e.v FROM reach r JOIN ed2 e ON e.u = r.m
),
lab AS MATERIALIZED (
  SELECT n AS ekey, MIN(m) AS ring_id FROM reach GROUP BY n
)
SELECT l.ring_id, CAST(COUNT(*) AS BIGINT) AS n_edges,
  CAST(SUM(bnd.x1 * bnd.y2 - bnd.x2 * bnd.y1) AS BIGINT) AS area2
FROM bnd JOIN lab l ON bnd.ekey = l.ekey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Zonal median + OOV-rate quality score
# ---------------------------------------------------------------------------

def q_tile_median(sf_dir: str):
    """Exact per-tile median event value (zonal stats beyond the sums):
    values quantized to integer cents ride ONE h(tile) bucket exchange;
    the per-bucket resolve takes each tile's lower median by segmented
    selection (lexsort + positional pick) — never a per-tile Ray
    aggregate.  Output (tile_id, n, median_cents)."""
    from rhealpixdggs_py_ray.core import index as cidx

    ds = _read(sf_dir, "events", columns=["event_id", "value"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = su.to_string_fixed(u, TILE_RES)
        v = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        h = (pd.util.hash_array(tile.astype(object)) % np.uint64(nb)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(h),
            "tile_id": pa.array(tile, type=pa.string()),
            "v": pa.array(v),
        })

    def median(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tile_id" not in g.column_names:
            return pa.table({"tile_id": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "median_cents": pa.array([], type=pa.int64())})
        t = g["tile_id"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, t))
        t, v = t[order], v[order]
        new_seg = np.r_[True, t[1:] != t[:-1]]
        starts = np.flatnonzero(new_seg)
        n = np.diff(np.append(starts, len(t)))
        pick = starts + (n - 1) // 2  # lower median
        return pa.table({
            "tile_id": pa.array(t[starts], type=pa.string()),
            "n": pa.array(n.astype(np.int64)),
            "median_cents": pa.array(v[pick]),
        })

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(median, batch_format="pyarrow")
    )


def sql_tile_median() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH v AS MATERIALIZED (
  SELECT t.cell_id AS tile_id, CAST(floor(e.value * 100) AS BIGINT) AS v
  FROM {idx_sql} t JOIN events e ON t.event_id = e.event_id
),
r AS MATERIALIZED (
  SELECT tile_id, v,
    row_number() OVER (PARTITION BY tile_id ORDER BY v) AS rn,
    COUNT(*) OVER (PARTITION BY tile_id) AS n
  FROM v
)
SELECT tile_id, CAST(n AS BIGINT) AS n, v AS median_cents
FROM r WHERE rn = (n + 1) // 2
"""


OOV_K = 64


def q_oov_rate(sf_dir: str):
    """LM-style data-quality score: per-doc out-of-vocabulary token
    ratio against the global top-K unigram vocabulary.  Pass 1 builds
    the vocab with the np.unique-partial -> disjoint-hash-bucket
    pattern (exact counts, bounded K result); pass 2 broadcasts the
    K-word set and scores every doc map-only.  Output (doc_id, total,
    oov, oov_micros); empty docs score 0."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    nb = 16

    def partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in batch["text"].to_pylist():
            toks.extend(t.split())
        if not toks:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.int64())})
        uq, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        bucket = (pd.util.hash_array(uq) % np.uint64(nb)).astype(np.int64)
        return pa.table({"s": pa.array(uq, type=pa.string()),
                         "n": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(bucket)})

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "s" not in g.column_names:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        uq, inv = np.unique(g["s"].to_numpy(zero_copy_only=False),
                            return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, g["n"].to_numpy(zero_copy_only=False))
        order = np.lexsort((uq, -tot))[:OOV_K]
        return pa.table({"s": pa.array(uq[order], type=pa.string()),
                         "n": pa.array(tot[order])})

    cand = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    ).to_pandas()  # bounded: <= nb * K rows
    s = cand["s"].to_numpy()
    n = cand["n"].to_numpy()
    order = np.lexsort((s, -n))[:OOV_K]
    vocab_ref = ray.put(frozenset(s[order].tolist()))

    def score(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        out_t, out_o = [], []
        for t in batch["text"].to_pylist():
            toks = t.split()
            out_t.append(len(toks))
            out_o.append(sum(1 for w in toks if w not in vocab))
        total = np.array(out_t, dtype=np.int64)
        oov = np.array(out_o, dtype=np.int64)
        safe = np.maximum(total, 1)
        micros = np.floor(
            oov.astype(np.float64) / safe.astype(np.float64) * 1000000.0
        ).astype(np.int64)
        micros[total == 0] = 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "total": pa.array(total),
            "oov": pa.array(oov),
            "oov_micros": pa.array(micros),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def sql_oov_rate() -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE len(trim(text)) > 0
),
cnt AS MATERIALIZED (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
topk AS MATERIALIZED (
  SELECT w FROM cnt QUALIFY row_number() OVER (ORDER BY c DESC, w) <= {OOV_K}
),
per AS MATERIALIZED (
  SELECT t.doc_id, COUNT(*) AS total,
    SUM(CASE WHEN k.w IS NULL THEN 1 ELSE 0 END) AS oov
  FROM toks t LEFT JOIN topk k ON t.w = k.w
  GROUP BY t.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(per.total, 0) AS BIGINT) AS total,
  CAST(coalesce(per.oov, 0) AS BIGINT) AS oov,
  CAST(CASE WHEN per.total IS NULL THEN 0
       ELSE floor(CAST(per.oov AS DOUBLE) / per.total * 1000000.0)
       END AS BIGINT) AS oov_micros
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
"""


# ---------------------------------------------------------------------------
# Grid flood: depth-capped multi-source BFS over the occupied lattice
# ---------------------------------------------------------------------------

FLOOD_D = 4       # BFS depth cap == halo width
FLOOD_T = 27      # tile size (divides both 81 rows and 324 cols)
FLOOD_SEED_MOD = 97


def q_grid_flood(sf_dir: str):
    """Cost-distance raster: BFS distance (4-neighborhood, steps
    through OCCUPIED cells only, antimeridian wrap) from the seed cells
    (cells containing an event with event_id % 97 == 0) out to depth
    FLOOD_D.  The distributed shape is a HALO EXCHANGE: one exact
    u64-key sum builds (occupied cell, seed flag); each cell is then
    routed to its home tile plus every adjacent tile whose D-halo
    contains it (any BFS path of length <= D stays within Manhattan D
    of its endpoint, so the halo is sufficient), and each tile runs a
    dense vectorized BFS locally and emits only its home window.  Two
    exchanges total, independent of D.  Output (cell_id, dist)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D, T = FLOOD_D, FLOOD_T
    n_tx = W // T
    n_ty = side // T
    L = T + 2 * D

    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        u, ids = u[m], ids[m]
        return pa.table({
            "cell_u64": pa.array(u, type=pa.uint64()),
            "seed": pa.array((ids % FLOOD_SEED_MOD == 0).astype(np.int64)),
        })

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "seed", "n_seed",
    )

    def halo(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nseed = batch["n_seed"].to_numpy(zero_copy_only=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        home_ty = gy // T
        home_tx = gx // T
        tiles, lys, lxs, seeds = [], [], [], []
        for dty in (-1, 0, 1):
            for dtx in (-1, 0, 1):
                ty = home_ty + dty
                tx = (home_tx + dtx) % n_tx
                ok = (ty >= 0) & (ty < n_ty)
                off = ((gx - tx * T + W // 2) % W) - W // 2
                ly = gy - ty * T + D
                lx = off + D
                ok &= (ly >= 0) & (ly < L) & (lx >= 0) & (lx < L)
                tiles.append((ty * n_tx + tx)[ok])
                lys.append(ly[ok])
                lxs.append(lx[ok])
                seeds.append(nseed[ok])
        return pa.table({
            "tile": pa.array(np.concatenate(tiles)),
            "ly": pa.array(np.concatenate(lys)),
            "lx": pa.array(np.concatenate(lxs)),
            "n_seed": pa.array(np.concatenate(seeds)),
        })

    def bfs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tile" not in g.column_names:
            return pa.table({"cell_id": pa.array([], type=pa.string()),
                             "dist": pa.array([], type=pa.int64())})
        tile = int(g["tile"][0].as_py())
        ty, tx = tile // n_tx, tile % n_tx
        ly = g["ly"].to_numpy(zero_copy_only=False)
        lx = g["lx"].to_numpy(zero_copy_only=False)
        ns = g["n_seed"].to_numpy(zero_copy_only=False)
        occg = np.zeros((L, L), dtype=bool)
        occg[ly, lx] = True
        dist = np.full((L, L), -1, dtype=np.int64)
        dist[ly[ns > 0], lx[ns > 0]] = 0
        frontier = dist == 0
        for dd in range(1, D + 1):
            nxt = np.zeros_like(frontier)
            nxt[1:, :] |= frontier[:-1, :]
            nxt[:-1, :] |= frontier[1:, :]
            nxt[:, 1:] |= frontier[:, :-1]
            nxt[:, :-1] |= frontier[:, 1:]
            nxt &= occg & (dist < 0)
            dist[nxt] = dd
            frontier = nxt
        hy, hx = np.nonzero((dist >= 0)
                            & (np.arange(L)[:, None] >= D)
                            & (np.arange(L)[:, None] < T + D)
                            & (np.arange(L)[None, :] >= D)
                            & (np.arange(L)[None, :] < T + D))
        gy_out = ty * T + hy - D
        gx_out = (tx * T + hx - D) % W
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy_out, gx_out, k),
                type=pa.string()),
            "dist": pa.array(dist[hy, hx]),
        })

    return (
        occ.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile")
        .map_groups(bfs, batch_format="pyarrow")
    )


def sql_grid_flood() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    return f"""
WITH RECURSIVE fidx AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
focc AS MATERIALIZED (
  SELECT DISTINCT {gy} AS gy, {gx} AS gx FROM fidx
),
fseeds AS MATERIALIZED (
  SELECT DISTINCT {gy} AS gy, {gx} AS gx FROM fidx
  WHERE event_id % {FLOOD_SEED_MOD} = 0
),
fnbr AS MATERIALIZED (
  SELECT gy, gx, gy AS ny, (gx + 1) % {W} AS nx FROM focc
  UNION ALL SELECT gy, gx, gy, (gx + {W - 1}) % {W} FROM focc
  UNION ALL SELECT gy, gx, gy + 1, gx FROM focc
  UNION ALL SELECT gy, gx, gy - 1, gx FROM focc
),
fadj AS MATERIALIZED (
  SELECT n.gy AS ay, n.gx AS ax, o.gy AS by_, o.gx AS bx
  FROM fnbr n JOIN focc o ON o.gy = n.ny AND o.gx = n.nx
),
walk(gy, gx, d) AS (
  SELECT gy, gx, 0 FROM fseeds
  UNION
  SELECT a.by_, a.bx, w.d + 1 FROM walk w
  JOIN fadj a ON a.ay = w.gy AND a.ax = w.gx
  WHERE w.d < {FLOOD_D}
),
best AS MATERIALIZED (
  SELECT gy, gx, MIN(d) AS dist FROM walk GROUP BY 1, 2
)
SELECT {rebuild} AS cell_id, CAST(dist AS BIGINT) AS dist FROM best
"""


# ---------------------------------------------------------------------------
# Per-tile HLL registers + largest-remainder quota sampling
# ---------------------------------------------------------------------------

def q_tile_hll(sf_dir: str):
    """Per-tile HyperLogLog registers over distinct user_ids (the
    distinct-visitors-per-zone monitoring sketch): md5 register/rho
    exactly as q_hll_registers, keyed by the res-2 cell of the event
    location.  Registers are mergeable maxima — per-batch partials on
    a PACKED u64 key (tile top-bits << 8 | reg; a two-column aggregate
    with a string key is the measured 70 s anti-pattern, CLAUDE.md),
    one integer bucket exchange, strings rebuilt only at the end."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import max_by_u64_key
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)
    mask56 = np.uint64((1 << 56) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        uu, ui = np.unique(uid, return_inverse=True)
        h = np.fromiter(
            (md5_u64(str(int(x))) for x in uu), dtype=np.uint64, count=len(uu)
        )[ui]
        reg = h >> np.uint64(56)
        suf = h & mask56
        bl = np.zeros(len(suf), dtype=np.int64)
        for kk in range(56):
            bl += (suf >= np.uint64(1 << kk)).astype(np.int64)
        rho = 57 - bl
        # a res-2 cell is face+2 digits in bits 63..52 of the u64
        key = ((u.astype(np.uint64) >> np.uint64(52)) << np.uint64(8)) | reg
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "rho": pa.array(rho),
        })

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    folded = max_by_u64_key(part, "key", "rho", "rho", n_buckets=8)

    def stringify(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t_u64 = ((key >> np.uint64(8)) << np.uint64(52)) | np.uint64(TILE_RES)
        return pa.table({
            "tile_id": pa.array(
                su.to_string_fixed(t_u64, TILE_RES), type=pa.string()),
            "reg": pa.array((key & np.uint64(0xFF)).astype(np.int64)),
            "rho": pa.array(batch["rho"]),
        })

    return folded.map_batches(stringify, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_tile_hll() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return (
        f"WITH tl AS MATERIALIZED (SELECT event_id, cell_id FROM {idx_sql} t),"
        " h AS MATERIALIZED (SELECT tl.cell_id AS tile_id,"
        "  md5_number_lower(CAST(e.user_id AS VARCHAR)) AS h"
        "  FROM events e JOIN tl ON e.event_id = tl.event_id)"
        " SELECT tile_id, CAST(h >> 56 AS BIGINT) AS reg,"
        "  MAX(CASE WHEN h % 72057594037927936 = 0 THEN 57"
        "    ELSE 57 - length(printf('%b',"
        "      CAST(h % 72057594037927936 AS BIGINT))) END) AS rho"
        " FROM h GROUP BY 1, 2"
    )


QUOTA_N = 73


def q_quota_sample(sf_dir: str):
    """Largest-remainder proportional allocation (the exact data-mixing
    primitive): QUOTA_N sample slots split across sources proportional
    to their doc counts — base = N*cnt // total, the leftover slots go
    to the largest remainders (ties -> source ASC) — then each source
    keeps its quota of smallest doc_ids.  Counts are one tiny bucket
    exchange; the per-source quota table is bounded (one row per
    source) and broadcast; selection reuses the segmented-rank resolve.
    Output (doc_id, source, rank, quota)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"], blocks=4)
    nb = 8

    def cnt_partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        uq, c = np.unique(src, return_counts=True)
        h = (pd.util.hash_array(uq) % np.uint64(nb)).astype(np.int64)
        return pa.table({"source": pa.array(uq, type=pa.string()),
                         "n": pa.array(c.astype(np.int64)),
                         "bucket": pa.array(h)})

    def cnt_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "source" not in g.column_names:
            return pa.table({"source": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        s = g["source"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(s, return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"source": pa.array(uq, type=pa.string()),
                         "n": pa.array(tot)})

    cnts = (
        ds.map_batches(cnt_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(cnt_reduce, batch_format="pyarrow")
    ).to_pandas()  # bounded: one row per source
    src = cnts["source"].to_numpy()
    n = cnts["n"].to_numpy().astype(np.int64)
    order = np.argsort(src)
    src, n = src[order], n[order]
    total = int(n.sum())
    base = QUOTA_N * n // total
    rem = QUOTA_N * n % total
    extra_slots = QUOTA_N - int(base.sum())
    rank_rem = np.lexsort((src, -rem))  # rem DESC, source ASC
    extra = np.zeros(len(src), dtype=np.int64)
    extra[rank_rem[:extra_slots]] = 1
    quota = dict(zip(src.tolist(), (base + extra).tolist()))
    quota_ref = ray.put(quota)

    def keyed(batch: pa.Table) -> pa.Table:
        s = batch["source"].to_numpy(zero_copy_only=False)
        h = (pd.util.hash_array(s.astype(object)) % np.uint64(nb)).astype(np.int64)
        return batch.append_column("bucket", pa.array(h))

    def select(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "doc_id" not in g.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "source": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "quota": pa.array([], type=pa.int64())})
        q = ray.get(quota_ref)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        s = g["source"].to_numpy(zero_copy_only=False)
        order_ = np.lexsort((d, s))
        d, s = d[order_], s[order_]
        new_seg = np.r_[True, s[1:] != s[:-1]]
        starts = np.flatnonzero(new_seg)
        rk = np.arange(len(d), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(d)))) + 1
        qv = np.array([q.get(x, 0) for x in s[starts]], dtype=np.int64)
        qfull = np.repeat(qv, np.diff(np.append(starts, len(d))))
        keep = rk <= qfull
        return pa.table({
            "doc_id": pa.array(d[keep]),
            "source": pa.array(s[keep], type=pa.string()),
            "rank": pa.array(rk[keep]),
            "quota": pa.array(qfull[keep]),
        })

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(select, batch_format="pyarrow")
    )


def sql_quota_sample() -> str:
    return f"""
WITH cnt AS MATERIALIZED (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
),
tot AS MATERIALIZED (SELECT SUM(n) AS total FROM cnt),
alloc AS MATERIALIZED (
  SELECT source, n,
    ({QUOTA_N} * n) // total AS base,
    ({QUOTA_N} * n) % total AS rem,
    row_number() OVER (ORDER BY ({QUOTA_N} * n) % total DESC, source) AS rrank
  FROM cnt CROSS JOIN tot
),
slots AS MATERIALIZED (
  SELECT {QUOTA_N} - SUM(base) AS extra FROM alloc
),
quota AS MATERIALIZED (
  SELECT source, base + CASE WHEN rrank <= (SELECT extra FROM slots)
    THEN 1 ELSE 0 END AS quota
  FROM alloc
),
ranked AS MATERIALIZED (
  SELECT d.doc_id, d.source,
    row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rank,
    q.quota
  FROM documents d JOIN quota q ON d.source = q.source
)
SELECT doc_id, source, rank, CAST(quota AS BIGINT) AS quota
FROM ranked WHERE rank <= quota
"""


def q_image_clusters(sf_dir: str):
    """Near-dup image clusters: the phash band-LSH + Hamming-verified
    pair graph (q_image_neardup) resolved to canonical clusters with
    the same distributed connected-components machinery as the text
    dedup family (ops/cc) — (doc_id=image idx, cluster_id=min member,
    keep=canonical)."""
    from rhealpixdggs_py_ray.ops import cc

    return cc.connected_components(q_image_neardup(sf_dir))


def sql_image_clusters() -> str:
    from rhealpixdggs_py_ray.ops import cc

    return cc.connected_components_sql(sql_image_neardup())


def q_image_equalize(sf_dir: str):
    """Histogram equalization (the classic contrast transform) over the
    REAL payload bytes: actor-pool decode -> per-image 256-bin joint
    histogram -> integer CDF LUT e(v) = ((cdf(v) - cdf_min) * 255) //
    (n_pix - cdf_min) -> position-weighted checksum of the equalized
    pixels.  Payload never shuffles; output is 3 ints per image.  The
    oracle replays the histogram, CDF and LUT on the generative pixel
    rule in SQL, so the decode+equalize chain is value-verified."""
    from rhealpixdggs_py_ray.fixtures import decode_image, write_images_table

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(
        IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8)
    )

    class Equalize:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy(zero_copy_only=False)
            hs = batch["h"].to_numpy(zero_copy_only=False)
            idx, nv, chk = [], [], []
            for iid, data, fmt, w, h in zip(ids, blobs, fmts, ws, hs):
                w, h = int(w), int(h)
                pix = decode_image(data, fmt, w, h).astype(np.int64)
                hist = np.bincount(pix.ravel(), minlength=256)
                cdf = np.cumsum(hist)
                nz = np.flatnonzero(hist)
                cdf_min = int(cdf[nz[0]])
                n = pix.size
                denom = max(n - cdf_min, 1)
                lut = (cdf - cdf_min) * 255 // denom
                eq = lut[pix]
                wgt = (np.arange(h, dtype=np.int64)[:, None] * w
                       + np.arange(w, dtype=np.int64)[None, :] + 1)
                idx.append(int(iid[3:]))
                nv.append(int(len(nz)))
                chk.append(int((eq.sum(axis=2) * wgt).sum()))
            return pa.table({
                "idx": pa.array(np.array(idx, dtype=np.int64)),
                "n_values": pa.array(np.array(nv, dtype=np.int64)),
                "chk": pa.array(np.array(chk, dtype=np.int64)),
            })

    return ds.map_batches(
        Equalize, batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )


def sql_image_equalize() -> str:
    from rhealpixdggs_py_ray.fixtures import write_images_table

    write_images_table(IMG_DIR, IMG_N)
    M = "18446744073709551616"
    u = f"CAST(((CAST(phash AS HUGEINT) % {M}) + {M}) % {M} AS UBIGINT)"
    val = (
        "((x * 3 + y * 5 + cc * 7"
        " + CAST((u >> CAST(8 * cc AS UBIGINT)) & 255 AS BIGINT)) % 256)"
    )
    return f"""
WITH esrc AS MATERIALIZED (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS idx,
    CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h, u
  FROM (SELECT image_id, w, h, {u} AS u
        FROM read_parquet('{IMG_DIR}/*.parquet')) q
),
epix AS MATERIALIZED (
  SELECT idx, w, h, x, y, {val} AS v
  FROM esrc,
    unnest(generate_series(0, w - 1)) AS tx(x),
    unnest(generate_series(0, h - 1)) AS ty(y),
    (SELECT unnest(generate_series(0, 2)) AS cc) tc
),
ehist AS MATERIALIZED (
  SELECT idx, v, COUNT(*) AS c FROM epix GROUP BY idx, v
),
ecdf0 AS MATERIALIZED (
  SELECT idx, v,
    SUM(c) OVER (PARTITION BY idx ORDER BY v) AS cdf,
    SUM(c) OVER (PARTITION BY idx) AS n,
    COUNT(*) OVER (PARTITION BY idx) AS n_values
  FROM ehist
),
ecdf AS MATERIALIZED (
  SELECT idx, v, cdf, n, n_values,
    MIN(cdf) OVER (PARTITION BY idx) AS cdf_min
  FROM ecdf0
),
elut AS MATERIALIZED (
  SELECT idx, v, n_values,
    ((cdf - cdf_min) * 255) // greatest(n - cdf_min, 1) AS e
  FROM ecdf
)
SELECT p.idx, CAST(MIN(l.n_values) AS BIGINT) AS n_values,
  CAST(SUM((p.y * p.w + p.x + 1) * l.e) AS BIGINT) AS chk
FROM epix p JOIN elut l ON p.idx = l.idx AND p.v = l.v
GROUP BY p.idx
"""


# ---------------------------------------------------------------------------
# Adaptive (density-split) cover — data-dependent mixed-resolution tiling
# ---------------------------------------------------------------------------

ADAPT_MAX_RES = 4
ADAPT_CAP = 120


def q_adaptive_cover(sf_dir: str):
    """Adaptive quadtree-style tiling: a cell is in the cover iff its
    count fits the cap while its parent's does not (root cells with
    small counts stay whole; res-ADAPT_MAX_RES cells keep the overflow
    — the variable-resolution tiling every map/serving layer wants).
    Derived from ONE pyramid-counts pass (per-batch prefix partials,
    one exchange); the selection runs on the counts table, which is
    bounded by the GRID size at max res (6*9^4 cells), not the corpus.
    Output (cell_id, res, n)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = indexed_events(sf_dir, resolution=ADAPT_MAX_RES)

    def partial(batch: pa.Table) -> pa.Table:
        # the packed SUID already carries its resolution, so ONE u64
        # key covers every pyramid level — a single cheap exchange
        # instead of a two-key string aggregate (the CLAUDE.md
        # pathology; this stage measured 6.0 s -> ~2.5 s at sf0.1)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        keys, ns = [], []
        for r in range(ADAPT_MAX_RES + 1):
            uq, cnt = np.unique(su.parent(u, r), return_counts=True)
            keys.append(uq)
            ns.append(cnt.astype(np.int64))
        return pa.table({
            "key": pa.array(np.concatenate(keys).astype(np.uint64)),
            "one": pa.array(np.concatenate(ns)),
        })

    counts_ds = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n",
    ).to_pandas()  # bounded by grid size at max res, not by data
    ku = counts_ds["key"].to_numpy().astype(np.uint64)
    r = su.resolution_of(ku)
    t = np.empty(len(ku), dtype=object)
    for rr in range(ADAPT_MAX_RES + 1):
        m_ = r == rr
        if m_.any():
            t[m_] = su.to_string_fixed(ku[m_], rr)
    n = counts_ds["n"].to_numpy().astype(np.int64)
    parent = np.array([x[:rr] if rr > 0 else "" for x, rr in zip(t, r)],
                      dtype=object)
    lut = dict(zip(t, n))
    pn = np.array([lut.get(x, 0) for x in parent], dtype=np.int64)
    keep = ((n <= ADAPT_CAP) & ((r == 0) | (pn > ADAPT_CAP))) | (
        (r == ADAPT_MAX_RES) & (n > ADAPT_CAP))
    order = np.argsort(t[keep])
    tk, rk, nk = t[keep][order], r[keep][order], n[keep][order]
    return pa.table({
        "cell_id": pa.array(tk, type=pa.string()),
        "res": pa.array(rk),
        "n": pa.array(nk),
    })


def sql_adaptive_cover() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), ADAPT_MAX_RES, CFG,
        id_cols=("event_id",)
    )
    return f"""
WITH apts AS MATERIALIZED (SELECT cell_id FROM {inner} t),
acnt AS MATERIALIZED (
  SELECT r.res, substr(cell_id, 1, 1 + r.res) AS tile_id,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM apts CROSS JOIN
    (SELECT unnest(generate_series(0, {ADAPT_MAX_RES})) AS res) r
  GROUP BY r.res, tile_id
)
SELECT c.tile_id AS cell_id, c.res, c.n
FROM acnt c
LEFT JOIN acnt p
  ON p.res = c.res - 1 AND p.tile_id = substr(c.tile_id, 1, c.res)
WHERE (c.n <= {ADAPT_CAP} AND (c.res = 0 OR p.n > {ADAPT_CAP}))
   OR (c.res = {ADAPT_MAX_RES} AND c.n > {ADAPT_CAP})
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints + balanced level-order range sharding
# ---------------------------------------------------------------------------

WINNOW_K = 5   # char k-gram
WINNOW_W = 8   # window of consecutive k-gram hashes


def q_winnow_fingerprint(sf_dir: str):
    """Winnowing fingerprint selection (Schleimer et al., the MOSS
    document-fingerprint scheme): rolling k-gram hashes, one selected
    hash per window of W consecutive positions (the window minimum,
    rightmost on ties), deduplicated per doc.  Guarantees every match
    of length >= W+K-1 shares a selected fingerprint.  Fully
    vectorized: the hash matrix folds K shifted code columns; the
    window minimum scans W shifted slices with <=-updates for the
    rightmost-tie rule.  Map-only.  Output (doc_id, pos, h)."""
    from rhealpixdggs_py_ray.ops.text import FP_BASE, FP_MOD

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    K, W = WINNOW_K, WINNOW_W

    def winnow(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(texts)
        out_d, out_p, out_h = [], [], []
        if n:
            lens = np.array([len(t) for t in texts], dtype=np.int64)
            mx = max(int(lens.max()), K)
            codes = np.zeros((n, mx), dtype=np.int64)
            for i, t in enumerate(texts):
                codes[i, : len(t)] = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32)
            npos = mx - K + 1
            H = np.zeros((n, npos), dtype=np.int64)
            for j in range(K):
                H = H * FP_BASE + codes[:, j:j + npos]
            H %= FP_MOD
            n_pos = np.maximum(lens - K + 1, 0)  # valid positions/row
            nw = npos - W + 1
            if nw > 0:
                best = np.full((n, nw), np.iinfo(np.int64).max, dtype=np.int64)
                bpos = np.zeros((n, nw), dtype=np.int64)
                for o in range(W):
                    v = H[:, o:o + nw]
                    upd = v <= best  # <= keeps the RIGHTMOST minimum
                    best = np.where(upd, v, best)
                    bpos = np.where(upd, o + np.arange(nw)[None, :], bpos)
                n_win = np.maximum(n_pos - W + 1, 0)
                for i in range(n):
                    w_i = int(n_win[i])
                    if w_i <= 0:
                        continue
                    sel = np.unique(bpos[i, :w_i])
                    out_d.append(np.full(len(sel), dids[i], dtype=np.int64))
                    out_p.append(sel + 1)  # 1-based, matches SQL substr
                    out_h.append(H[i, sel])
        if not out_d:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_d)),
            "pos": pa.array(np.concatenate(out_p)),
            "h": pa.array(np.concatenate(out_h)),
        })

    return ds.map_batches(winnow, batch_format="pyarrow", zero_copy_batch=True)


def sql_winnow_fingerprint() -> str:
    from rhealpixdggs_py_ray.ops.text import FP_BASE, FP_MOD

    K, W = WINNOW_K, WINNOW_W
    # ((((c1*B + c2)*B + c3)*B + c4)*B + c5) % M — codes <= 0x10FFFF so the
    # pre-mod value stays < 2^53 and a single trailing mod is exact.
    # Rightmost-tie window minimum in ONE window scan: minimize the
    # packed key h * 2^21 + (2^21 - 1 - i)  (h < 2^31, i < 2^21, so the
    # key < 2^52 is exact).
    poly = "CAST(ascii(substr(text, i, 1)) AS BIGINT)"
    for j in range(1, K):
        poly = f"({poly}) * {FP_BASE} + CAST(ascii(substr(text, i + {j}, 1)) AS BIGINT)"
    P = 1 << 21
    return f"""
WITH wpos AS MATERIALIZED (
  SELECT doc_id, i, (({poly}) % {FP_MOD}) * {P} + ({P - 1} - i) AS packed
  FROM documents, unnest(generate_series(1, length(text) - {K - 1})) AS t(i)
),
wwin AS MATERIALIZED (
  SELECT doc_id, i AS wi,
    MIN(packed) OVER (PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN CURRENT ROW AND {W - 1} FOLLOWING) AS pmn,
    COUNT(*) OVER (PARTITION BY doc_id) AS np
  FROM wpos QUALIFY i <= np - {W - 1}
)
SELECT DISTINCT doc_id,
  {P - 1} - (pmn % {P}) AS pos,
  pmn // {P} AS h
FROM wwin
"""


SHARDS_S = 16
SHARDS_RES = 4


def q_range_shards(sf_dir: str):
    """Balanced range partitioner (the shuffle/storage planning
    primitive): per-cell counts at res SHARDS_RES (one exact u64-key
    exchange), then contiguous level-order key ranges with ~equal point
    mass — shard(cell) = floor(cum_before * S / total).  Within one
    resolution, level order == lexicographic SUID order, so the SQL
    mirror is a plain string-ordered window cumsum.  The planning table
    is bounded by the grid at res K, never the corpus.  Output per
    shard: (shard, start_cell, end_cell, n_cells, n_points)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = indexed_events(sf_dir, resolution=SHARDS_RES)

    def cells(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell_u64": pa.array(u, type=pa.uint64()),
            "one": pa.array(np.ones(len(u), dtype=np.int64)),
        })

    counts = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "n",
    ).to_pandas()  # bounded by the res-K grid
    u = counts["cell_u64"].to_numpy().astype(np.uint64)
    n = counts["n"].to_numpy().astype(np.int64)
    cid = su.to_string_fixed(u, SHARDS_RES)
    order = np.argsort(cid)
    cid, n = cid[order], n[order]
    total = int(n.sum())
    cum_before = np.cumsum(n) - n
    shard = (cum_before * SHARDS_S) // total
    out = []
    for sh in np.unique(shard):
        m = shard == sh
        out.append((int(sh), cid[m][0], cid[m][-1], int(m.sum()),
                    int(n[m].sum())))
    return pa.table({
        "shard": pa.array(np.array([a for a, *_ in out], dtype=np.int64)),
        "start_cell": pa.array([b for _, b, *_ in out], type=pa.string()),
        "end_cell": pa.array([c for _, _, c, *_ in out], type=pa.string()),
        "n_cells": pa.array(np.array([d for *_, d, _ in out], dtype=np.int64)),
        "n_points": pa.array(np.array([e for *_, e in out], dtype=np.int64)),
    })


def sql_range_shards() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), SHARDS_RES, CFG,
        id_cols=("event_id",)
    )
    return f"""
WITH scnt AS MATERIALIZED (
  SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n
  FROM {inner} t GROUP BY cell_id
),
scum AS MATERIALIZED (
  SELECT cell_id, n,
    SUM(n) OVER (ORDER BY cell_id) - n AS cum_before,
    SUM(n) OVER () AS total
  FROM scnt
)
SELECT CAST((cum_before * {SHARDS_S}) // total AS BIGINT) AS shard,
  MIN(cell_id) AS start_cell, MAX(cell_id) AS end_cell,
  CAST(COUNT(*) AS BIGINT) AS n_cells,
  CAST(SUM(n) AS BIGINT) AS n_points
FROM scum GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Distance-band pair counting (Ripley's K numerator)
# ---------------------------------------------------------------------------

PAIR_RES = 3
PAIR_R_M = 150000.0  # chord radius; < half the res-3 cell width so the 3x3
                    # lattice neighborhood is a guaranteed candidate superset


def q_pair_counts(sf_dir: str):
    """Spatial pair statistic: per res-3 cell, the number of unordered
    event pairs within PAIR_R_M chord meters whose smaller-id endpoint
    homes in that cell (sum = the Ripley's K numerator).  Distributed
    shape: each point replicates to its home cell plus the 8 lattice
    ring cells as GHOSTS (the halo pattern again — pairs never cross a
    group boundary), one bucket exchange, segmented vectorized
    candidate expansion + exact chord filter per cell.  The ghost trick
    is the 10^12-point shape: candidate pairs are generated only inside
    a 3x3 cell neighborhood, never corpus-quadratic; the brute oracle
    cross-join certifies the superset is lossless at fixture scale."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    k = PAIR_RES
    side = 3 ** k
    W = 4 * side
    r2 = PAIR_R_M * PAIR_R_M
    nb = 8

    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        m = np.abs(lat) <= DISSOLVE_LAT
        ids, lon, lat = ids[m], lon[m], lat[m]
        x, y, z = proj.xyz(CFG, lon, lat)
        u = cidx.cell_from_point(CFG, k, lon, lat, plane=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        t_l, e_l, x_l, y_l, z_l, h_l = [], [], [], [], [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ty = gy + dy
                ok = (ty >= 0) & (ty < side)
                tx = (gx + dx) % W
                tkey = ty * W + tx
                t_l.append(tkey[ok])
                e_l.append(ids[ok])
                x_l.append(x[ok]); y_l.append(y[ok]); z_l.append(z[ok])
                h_l.append(np.full(ok.sum(), int(dy == 0 and dx == 0),
                                   dtype=np.int64))
        tk = np.concatenate(t_l)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(tk.astype(np.uint64), nb)),
            "tcell": pa.array(tk),
            "eid": pa.array(np.concatenate(e_l)),
            "x": pa.array(np.concatenate(x_l)),
            "y": pa.array(np.concatenate(y_l)),
            "z": pa.array(np.concatenate(z_l)),
            "home": pa.array(np.concatenate(h_l)),
        })

    def count_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tcell" not in g.column_names:
            return pa.table({"cell_id": pa.array([], type=pa.string()),
                             "n_pairs": pa.array([], type=pa.int64())})
        t = g["tcell"].to_numpy(zero_copy_only=False)
        e = g["eid"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        z = g["z"].to_numpy(zero_copy_only=False)
        hm = g["home"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((e, t))
        t, e, x, y, z, hm = (a[order] for a in (t, e, x, y, z, hm))
        hidx = np.flatnonzero(hm)
        lo = np.searchsorted(t, t[hidx], side="left")
        hi = np.searchsorted(t, t[hidx], side="right")
        cnt = hi - lo
        if not len(hidx):
            return pa.table({"cell_id": pa.array([], type=pa.string()),
                             "n_pairs": pa.array([], type=pa.int64())})
        a_rep = np.repeat(hidx, cnt)
        b_idx = np.concatenate(
            [np.arange(l, h) for l, h in zip(lo, hi)])
        dx = x[a_rep] - x[b_idx]
        dy = y[a_rep] - y[b_idx]
        dz = z[a_rep] - z[b_idx]
        hit = (e[a_rep] < e[b_idx]) & (dx * dx + dy * dy + dz * dz <= r2)
        tc = t[a_rep][hit]
        uq, n = np.unique(tc, return_counts=True)
        gy_out, gx_out = uq // W, uq % W
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy_out, gx_out, k),
                type=pa.string()),
            "n_pairs": pa.array(n.astype(np.int64)),
        })

    return (
        ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(count_pairs, batch_format="pyarrow")
    )


def sql_pair_counts() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    idx_sql = oracle.cell_from_point_sql(
        f"SELECT event_id, lon, lat FROM (SELECT event_id, {lon} AS lon,"
        f" {lat} AS lat FROM events) q WHERE abs(lat) <= {DISSOLVE_LAT!r}",
        PAIR_RES, CFG, id_cols=("event_id",))
    nrm = f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))"
    return f"""
WITH pxyz AS MATERIALIZED (
  SELECT event_id,
    {nrm}*cos(radians(lon))*cos(radians(lat)) AS x,
    {nrm}*sin(radians(lon))*cos(radians(lat)) AS y,
    {nrm}*(1 - {e2})*sin(radians(lat)) AS z
  FROM (SELECT event_id, {lon} AS lon, {lat} AS lat FROM events) q
  WHERE abs(lat) <= {DISSOLVE_LAT!r}
),
pcell AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
)
SELECT c.cell_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pxyz pa_ JOIN pxyz pb
  ON pa_.event_id < pb.event_id
  AND (pa_.x - pb.x) * (pa_.x - pb.x) + (pa_.y - pb.y) * (pa_.y - pb.y)
      + (pa_.z - pb.z) * (pa_.z - pb.z) <= {repr(PAIR_R_M * PAIR_R_M)}
JOIN pcell c ON c.event_id = pa_.event_id
GROUP BY c.cell_id
"""


# ---------------------------------------------------------------------------
# Merkle checksum tree over tiles (anti-entropy / replica repair)
# ---------------------------------------------------------------------------

def q_merkle_tiles(sf_dir: str):
    """Merkle tree over the tiled event table (the anti-entropy /
    replica-repair structure): leaf digest per res-2 tile = order-free
    wraparound sum of md5(event_id) (mergeable partials, one exchange);
    each upper level hashes the sorted 'child:digest' list of its
    children; one global root.  Comparing two replicas' trees localizes
    divergent tiles in O(log) probes.  Upper levels are grid-bounded
    driver work.  Output (res, tile_id, digest) with res -1 = root."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.dedup import md5_u64, md5_u64_many

    ds = _read(sf_dir, "events", columns=["event_id"])
    M = 1 << 64
    nb = 8

    def leaf_partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = su.to_string_fixed(u, TILE_RES)
        h = md5_u64_many([str(int(i)) for i in ids]).astype(np.uint64)
        t_uniq, t_inv = np.unique(tile, return_inverse=True)
        s = np.zeros(len(t_uniq), dtype=np.uint64)
        np.add.at(s, t_inv, h)  # wraparound mod 2^64 by dtype
        hb = (pd.util.hash_array(t_uniq) % np.uint64(nb)).astype(np.int64)
        return pa.table({"tile_id": pa.array(t_uniq, type=pa.string()),
                         "s": pa.array(s),
                         "bucket": pa.array(hb)})

    def leaf_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tile_id" not in g.column_names:
            return pa.table({"tile_id": pa.array([], type=pa.string()),
                             "s": pa.array([], type=pa.uint64())})
        t = g["tile_id"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False).astype(np.uint64)
        uq, inv = np.unique(t, return_inverse=True)
        acc = np.zeros(len(uq), dtype=np.uint64)
        np.add.at(acc, inv, s)
        return pa.table({"tile_id": pa.array(uq, type=pa.string()),
                         "s": pa.array(acc)})

    leaves = (
        ds.map_batches(leaf_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(leaf_reduce, batch_format="pyarrow")
    ).to_pandas()  # grid-bounded
    tiles = leaves["tile_id"].to_numpy()
    digs = leaves["s"].to_numpy().astype(np.uint64)
    order = np.argsort(tiles)
    tiles, digs = tiles[order], digs[order]

    out_res = [np.full(len(tiles), TILE_RES, dtype=np.int64)]
    out_tile = [tiles]
    out_dig = [digs.astype(np.uint64)]
    cur_t, cur_d = tiles, digs
    for r in range(TILE_RES - 1, -1, -1):
        parents = np.array([t[: 1 + r] for t in cur_t], dtype=object)
        pu = np.unique(parents)
        pd_ = []
        for p in pu:
            m = parents == p
            payload = "|".join(
                f"{c}:{int(d)}" for c, d in zip(cur_t[m], cur_d[m]))
            pd_.append(md5_u64(payload))
        cur_t = pu.astype(str)
        cur_d = np.array(pd_, dtype=np.uint64)
        out_res.append(np.full(len(pu), r, dtype=np.int64))
        out_tile.append(cur_t)
        out_dig.append(cur_d)
    root_payload = "|".join(
        f"{c}:{int(d)}" for c, d in zip(cur_t, cur_d))
    out_res.append(np.array([-1], dtype=np.int64))
    out_tile.append(np.array(["ROOT"], dtype=object))
    out_dig.append(np.array([md5_u64(root_payload)], dtype=np.uint64))
    return pa.table({
        "res": pa.array(np.concatenate(out_res)),
        "tile_id": pa.array(np.concatenate([a.astype(str) for a in out_tile]),
                            type=pa.string()),
        "digest": pa.array(np.concatenate(out_dig).astype(np.int64)),
    })


def sql_merkle_tiles() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    M = "18446744073709551616"
    lvls = []
    lvls.append(f"""
m2 AS MATERIALIZED (
  SELECT cell_id AS tile_id,
    CAST(SUM(CAST(md5_number_lower(CAST(event_id AS VARCHAR)) AS HUGEINT))
      % {M} AS UBIGINT) AS dig
  FROM {inner} t GROUP BY cell_id
)""")
    prev = "m2"
    for r in range(TILE_RES - 1, -1, -1):
        lvls.append(f"""
m{r} AS MATERIALIZED (
  SELECT substr(tile_id, 1, {1 + r}) AS tile_id,
    md5_number_lower(string_agg(tile_id || ':' || CAST(dig AS VARCHAR),
      '|' ORDER BY tile_id)) AS dig
  FROM {prev} GROUP BY 1
)""")
        prev = f"m{r}"
    root = f"""
mroot AS MATERIALIZED (
  SELECT 'ROOT' AS tile_id,
    md5_number_lower(string_agg(tile_id || ':' || CAST(dig AS VARCHAR),
      '|' ORDER BY tile_id)) AS dig
  FROM {prev}
)"""
    selects = [
        f"SELECT CAST({TILE_RES} AS BIGINT) AS res, tile_id,"
        f" CAST(CAST(dig AS HUGEINT) - CASE WHEN dig >= {1 << 63} THEN {M}"
        f" ELSE 0 END AS BIGINT) AS digest FROM m2"
    ]
    for r in range(TILE_RES - 1, -1, -1):
        selects.append(
            f"SELECT CAST({r} AS BIGINT), tile_id,"
            f" CAST(CAST(dig AS HUGEINT) - CASE WHEN dig >= {1 << 63} THEN {M}"
            f" ELSE 0 END AS BIGINT) FROM m{r}")
    selects.append(
        f"SELECT CAST(-1 AS BIGINT), tile_id,"
        f" CAST(CAST(dig AS HUGEINT) - CASE WHEN dig >= {1 << 63} THEN {M}"
        f" ELSE 0 END AS BIGINT) FROM mroot")
    return "WITH " + ",".join(lvls) + "," + root + "\n" + "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# Triangle counting + dissolve region moments
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str):
    """Distributed triangle counting over the image near-dup graph
    (cluster cohesion audit): the classic wedge-join — each node's
    ordered adjacency emits its wedges (n1 < n2 pairs of neighbors),
    wedges and edges meet in ONE union bucket exchange keyed by the
    packed wedge endpoints, and a wedge closed by an edge is a
    triangle, attributed to its smallest vertex.  Output (node,
    n_triangles) for nodes in >= 1 triangle."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    pairs = q_image_neardup(sf_dir)
    nb = 8

    def wedge_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(b) and int(b.max()) >= (1 << 32):
            raise AssertionError(
                "triangle_count pair packing overflow (node id >= 2^32)")
        # edge rows keyed by the (a, b) pair itself (a < b by contract)
        ekey = a * (1 << 32) + b
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ekey.astype(np.uint64), nb)),
            "k": pa.array(ekey),
            "apex": pa.array(np.full(len(a), -1, dtype=np.int64)),  # edge marker
        })

    # adjacency (and wedges) need all edges of a node together: one
    # h(node) exchange first
    def adj_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.concatenate([a, b])
        o = np.concatenate([b, a])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(n.astype(np.uint64), nb)),
            "n": pa.array(n),
            "o": pa.array(o),
        })

    def make_wedges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "n" not in g.column_names:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "k": pa.array([], type=pa.int64()),
                             "apex": pa.array([], type=pa.int64())})
        n = g["n"].to_numpy(zero_copy_only=False)
        o = g["o"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, n))
        n, o = n[order], o[order]
        starts = np.flatnonzero(np.r_[True, n[1:] != n[:-1]])
        lens = np.diff(np.append(starts, len(n)))
        k_l, apex_l = [], []
        for s, L in zip(starts, lens):
            # only neighbors ABOVE the apex: each triangle {x<y<z} is
            # emitted exactly once, as apex x's wedge (y, z)
            nb_ = np.sort(o[s:s + L])
            nb_ = nb_[nb_ > n[s]]
            m_ = len(nb_)
            if m_ < 2:
                continue
            i, j = np.triu_indices(m_, k=1)
            k_l.append(nb_[i] * (1 << 32) + nb_[j])
            apex_l.append(np.full(len(i), n[s], dtype=np.int64))
        if not k_l:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "k": pa.array([], type=pa.int64()),
                             "apex": pa.array([], type=pa.int64())})
        k = np.concatenate(k_l)
        apex = np.concatenate(apex_l)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(k.astype(np.uint64), nb)),
            "k": pa.array(k),
            "apex": pa.array(apex),
        })

    pairs_m = pairs.materialize()  # two consumers: edges + adjacency
    wedges = (
        pairs_m.map_batches(adj_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(make_wedges, batch_format="pyarrow")
    )
    edges = pairs_m.map_batches(wedge_rows, batch_format="pyarrow",
                                zero_copy_batch=True)

    def close_wedges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "k" not in g.column_names:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "n_triangles": pa.array([], type=pa.int64())})
        k = g["k"].to_numpy(zero_copy_only=False)
        apex = g["apex"].to_numpy(zero_copy_only=False)
        is_edge = apex == -1
        ek = np.unique(k[is_edge])
        wk, wapex = k[~is_edge], apex[~is_edge]
        pos = np.searchsorted(ek, wk)
        pos = np.clip(pos, 0, max(len(ek) - 1, 0))
        closed = len(ek) > 0
        m = (ek[pos] == wk) if closed else np.zeros(len(wk), dtype=bool)
        # wedges were emitted with apex < n1 < n2, so the apex IS the
        # triangle's smallest vertex
        uq, cnt = np.unique(wapex[m], return_counts=True)
        return pa.table({"node": pa.array(uq),
                         "n_triangles": pa.array(cnt.astype(np.int64))})

    merged = wedges.union(edges).groupby("bucket").map_groups(
        close_wedges, batch_format="pyarrow")
    # a node's triangles can land in several buckets (different wedge
    # keys) — one final tiny exact sum
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    def rekey(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node_u": pa.array(batch["node"].to_numpy(
                zero_copy_only=False).astype(np.uint64)),
            "n": batch["n_triangles"],
        })

    out = sum_by_u64_key(
        merged.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True),
        "node_u", "n", "n_triangles")

    def fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.array(batch["node_u"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "n_triangles": batch["n_triangles"],
        })

    return out.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True)


def sql_triangle_count() -> str:
    return f"""
WITH tp AS MATERIALIZED ({sql_image_neardup()}),
tri AS MATERIALIZED (
  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
  FROM tp e1 JOIN tp e2 ON e2.a = e1.b JOIN tp e3
    ON e3.a = e1.a AND e3.b = e2.b
)
SELECT v1 AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM tri GROUP BY v1
"""


def q_region_moments(sf_dir: str):
    """First moments of the dissolved region per ring: integer shoelace
    area2 plus the centroid numerators 6A*Cx = sum (x1+x2)(x1*y2-x2*y1)
    and 6A*Cy = sum (y1+y2)(x1*y2-x2*y1) — exact integers, so the
    downstream centroid is a single division.  Same exchanges as
    q_dissolve_rings with the moment partials riding the label
    attach."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.cc import connected_components

    bnd = _dissolve_boundary(sf_dir).materialize()  # two consumers
    nb = 8

    def vertex_rows(batch: pa.Table) -> pa.Table:
        ek = batch["ekey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch["x1"].to_numpy(zero_copy_only=False)
        y1 = batch["y1"].to_numpy(zero_copy_only=False)
        x2 = batch["x2"].to_numpy(zero_copy_only=False)
        y2 = batch["y2"].to_numpy(zero_copy_only=False)
        W = 4 * 3 ** DISSOLVE_RES
        v_end = (x2 % W) * (1 << 21) + y2
        v_start = (x1 % W) * (1 << 21) + y1
        vk = np.concatenate([v_end, v_start])
        side = np.concatenate([np.zeros(len(ek), dtype=np.int64),
                               np.ones(len(ek), dtype=np.int64)])
        ek2 = np.concatenate([ek, ek])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(vk.astype(np.uint64), nb)),
            "vk": pa.array(vk), "side": pa.array(side), "ekey": pa.array(ek2),
        })

    def make_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "vk" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        vk = g["vk"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        ek = g["ekey"].to_numpy(zero_copy_only=False)
        e_vk, e_ek = vk[side == 0], ek[side == 0]
        s_vk, s_ek = vk[side == 1], ek[side == 1]
        eo = np.lexsort((e_ek, e_vk)); e_vk, e_ek = e_vk[eo], e_ek[eo]
        so = np.lexsort((s_ek, s_vk)); s_vk, s_ek = s_vk[so], s_ek[so]
        lo = np.searchsorted(s_vk, e_vk, side="left")
        hi = np.searchsorted(s_vk, e_vk, side="right")
        cnt = hi - lo
        a = np.repeat(e_ek, cnt)
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)]) \
            if len(lo) else np.array([], dtype=np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(s_ek[idx])})

    pairs = (
        bnd.map_batches(vertex_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(make_pairs, batch_format="pyarrow")
    )
    lab = connected_components(pairs)

    def lab_rows(batch: pa.Table) -> pa.Table:
        ek = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = batch["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(ek), dtype=np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ek.astype(np.uint64), nb)),
            "ekey": pa.array(ek), "cl": pa.array(cl),
            "cross": pa.array(z), "mx": pa.array(z), "my": pa.array(z),
            "is_lab": pa.array(np.ones(len(ek), dtype=np.int64)),
        })

    def edge_rows(batch: pa.Table) -> pa.Table:
        ek = batch["ekey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch["x1"].to_numpy(zero_copy_only=False)
        y1 = batch["y1"].to_numpy(zero_copy_only=False)
        x2 = batch["x2"].to_numpy(zero_copy_only=False)
        y2 = batch["y2"].to_numpy(zero_copy_only=False)
        cr = x1 * y2 - x2 * y1
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(ek.astype(np.uint64), nb)),
            "ekey": pa.array(ek),
            "cl": pa.array(np.zeros(len(ek), dtype=np.int64)),
            "cross": pa.array(cr.astype(np.int64)),
            "mx": pa.array(((x1 + x2) * cr).astype(np.int64)),
            "my": pa.array(((y1 + y2) * cr).astype(np.int64)),
            "is_lab": pa.array(np.zeros(len(ek), dtype=np.int64)),
        })

    def attach(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "ekey" not in g.column_names:
            return pa.table({"ring_id": pa.array([], type=pa.int64()),
                             "area2": pa.array([], type=pa.int64()),
                             "mx6": pa.array([], type=pa.int64()),
                             "my6": pa.array([], type=pa.int64())})
        ek = g["ekey"].to_numpy(zero_copy_only=False)
        cl = g["cl"].to_numpy(zero_copy_only=False)
        cr = g["cross"].to_numpy(zero_copy_only=False)
        mx = g["mx"].to_numpy(zero_copy_only=False)
        my = g["my"].to_numpy(zero_copy_only=False)
        is_lab = g["is_lab"].to_numpy(zero_copy_only=False).astype(bool)
        lk, lv = ek[is_lab], cl[is_lab]
        o = np.argsort(lk); lk, lv = lk[o], lv[o]
        dk = ek[~is_lab]
        pos = np.clip(np.searchsorted(lk, dk), 0, max(len(lk) - 1, 0))
        if len(lk) == 0 or not np.array_equal(lk[pos], dk):
            raise AssertionError("unlabeled boundary edge")
        ring = lv[pos]
        uq, inv = np.unique(ring, return_inverse=True)
        sa = np.zeros(len(uq), dtype=np.int64); np.add.at(sa, inv, cr[~is_lab])
        sx = np.zeros(len(uq), dtype=np.int64); np.add.at(sx, inv, mx[~is_lab])
        sy = np.zeros(len(uq), dtype=np.int64); np.add.at(sy, inv, my[~is_lab])
        return pa.table({"ring_id": pa.array(uq), "area2": pa.array(sa),
                         "mx6": pa.array(sx), "my6": pa.array(sy)})

    partials = (
        lab.map_batches(lab_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(bnd.map_batches(edge_rows, batch_format="pyarrow",
                               zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(attach, batch_format="pyarrow")
    )

    def final_key(batch: pa.Table) -> pa.Table:
        c = batch["ring_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "bucket", pa.array(hash_bucket_u64(c.astype(np.uint64), nb)))

    def final_sum(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "ring_id" not in g.column_names:
            return pa.table({"ring_id": pa.array([], type=pa.int64()),
                             "area2": pa.array([], type=pa.int64()),
                             "mx6": pa.array([], type=pa.int64()),
                             "my6": pa.array([], type=pa.int64())})
        c = g["ring_id"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(c, return_inverse=True)
        outs = {}
        for col in ("area2", "mx6", "my6"):
            v = g[col].to_numpy(zero_copy_only=False)
            acc = np.zeros(len(uq), dtype=np.int64)
            np.add.at(acc, inv, v)
            outs[col] = acc
        return pa.table({"ring_id": pa.array(uq),
                         "area2": pa.array(outs["area2"]),
                         "mx6": pa.array(outs["mx6"]),
                         "my6": pa.array(outs["my6"])})

    return (
        partials.map_batches(final_key, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final_sum, batch_format="pyarrow")
    )


def sql_region_moments() -> str:
    W = 4 * 3 ** DISSOLVE_RES
    return f"""
WITH RECURSIVE {_dissolve_boundary_sql_ctes()},
p AS MATERIALIZED (
  SELECT e.ekey AS a, s.ekey AS b FROM bnd e
  JOIN bnd s ON (e.x2 % {W}) = (s.x1 % {W}) AND e.y2 = s.y1
),
ed2 AS MATERIALIZED (
  SELECT a AS u, b AS v FROM p UNION ALL SELECT b AS u, a AS v FROM p
),
reach(n, m) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM ed2) t
  UNION
  SELECT r.n, e.v FROM reach r JOIN ed2 e ON e.u = r.m
),
lab AS MATERIALIZED (
  SELECT n AS ekey, MIN(m) AS ring_id FROM reach GROUP BY n
)
SELECT l.ring_id,
  CAST(SUM(bnd.x1 * bnd.y2 - bnd.x2 * bnd.y1) AS BIGINT) AS area2,
  CAST(SUM((bnd.x1 + bnd.x2) * (bnd.x1 * bnd.y2 - bnd.x2 * bnd.y1))
    AS BIGINT) AS mx6,
  CAST(SUM((bnd.y1 + bnd.y2) * (bnd.x1 * bnd.y2 - bnd.x2 * bnd.y1))
    AS BIGINT) AS my6
FROM bnd JOIN lab l ON bnd.ekey = l.ekey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Trajectory analytics: geofence dwell time + impossible-travel flags
# ---------------------------------------------------------------------------

DWELL_BBOX = (-40.0, -35.0, 95.0, 50.0)  # same fence as BBOX


def q_dwell_time(sf_dir: str):
    """Per-user time spent inside the geofence: order each user's
    events by (ts, event_id), credit an interval to the fence iff its
    STARTING point is inside (step-function semantics), sum integer
    microseconds.  One h(user) bucket exchange, segmented vectorized
    diff — the fleet/footfall dwell metric.  Output (user_id, n_inside,
    dwell_us)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    lon1, lat1, lon2, lat2 = DWELL_BBOX
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"],
               blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        inside = ((lon >= lon1) & (lon <= lon2)
                  & (lat >= lat1) & (lat <= lat2))
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid.astype(np.uint64), nb)),
            "user_id": pa.array(uid),
            "t": pa.array(ts),
            "event_id": pa.array(ids),
            "inside": pa.array(inside.astype(np.int64)),
        })

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "user_id" not in g.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_inside": pa.array([], type=pa.int64()),
                             "dwell_us": pa.array([], type=pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ins = g["inside"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, t, ins = uid[order], t[order], ins[order]
        same_next = np.r_[uid[1:] == uid[:-1], False]
        dt = np.zeros(len(t), dtype=np.int64)
        dt[:-1] = t[1:] - t[:-1]
        credit = np.where(same_next & (ins == 1), dt, 0)
        uq, inv = np.unique(uid, return_inverse=True)
        dwell = np.zeros(len(uq), dtype=np.int64)
        np.add.at(dwell, inv, credit)
        n_in = np.zeros(len(uq), dtype=np.int64)
        np.add.at(n_in, inv, ins)
        return pa.table({"user_id": pa.array(uq),
                         "n_inside": pa.array(n_in),
                         "dwell_us": pa.array(dwell)})

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(fold, batch_format="pyarrow")
    )


def sql_dwell_time() -> str:
    lon1, lat1, lon2, lat2 = DWELL_BBOX
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    return f"""
WITH dpts AS MATERIALIZED (
  SELECT user_id, ts, event_id,
    CASE WHEN ({lon}) >= {lon1!r} AND ({lon}) <= {lon2!r}
         AND ({lat}) >= {lat1!r} AND ({lat}) <= {lat2!r}
      THEN 1 ELSE 0 END AS inside
  FROM events
),
seq AS MATERIALIZED (
  SELECT user_id, inside,
    epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt,
    lead(user_id) OVER w AS next_uid
  FROM dpts WINDOW w AS (ORDER BY user_id, ts, event_id)
)
SELECT user_id,
  CAST(SUM(inside) AS BIGINT) AS n_inside,
  CAST(coalesce(SUM(CASE WHEN inside = 1 AND next_uid = user_id
    THEN dt END), 0) AS BIGINT) AS dwell_us
FROM seq GROUP BY user_id
"""


TRAVEL_V_MPS = 250.0  # flag transitions implying > 250 m/s sustained


def q_impossible_travel(sf_dir: str):
    """Impossible-travel detection (account-integrity shape): for each
    consecutive pair of a user's events, flag chord_distance >
    v * dt — computed as d2 > (v * dt_s)^2 in doubles with mirrored
    operand order (dt_s = dt_us / 1e6).  Output one row per flagged
    transition (user_id, event_id, next_event_id, dt_us, d2_floor)."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"],
               blocks=4)
    nb = 8
    v = TRAVEL_V_MPS

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        x, y, z = proj.xyz(CFG, lon, lat)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid.astype(np.uint64), nb)),
            "user_id": pa.array(uid), "t": pa.array(ts),
            "event_id": pa.array(ids),
            "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        })

    def flag(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "user_id" not in g.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "event_id": pa.array([], type=pa.int64()),
                             "next_event_id": pa.array([], type=pa.int64()),
                             "dt_us": pa.array([], type=pa.int64()),
                             "d2_floor": pa.array([], type=pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        z = g["z"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, t, eid, x, y, z = (a[order] for a in (uid, t, eid, x, y, z))
        same = uid[1:] == uid[:-1]
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        dz = z[1:] - z[:-1]
        d2 = dx * dx + dy * dy + dz * dz
        dt_s = (t[1:] - t[:-1]).astype(np.float64) / 1000000.0
        lim = v * dt_s
        hot = same & (d2 > lim * lim)
        return pa.table({
            "user_id": pa.array(uid[:-1][hot]),
            "event_id": pa.array(eid[:-1][hot]),
            "next_event_id": pa.array(eid[1:][hot]),
            "dt_us": pa.array((t[1:] - t[:-1])[hot]),
            "d2_floor": pa.array(np.floor(d2[hot]).astype(np.int64)),
        })

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(flag, batch_format="pyarrow")
    )


def sql_impossible_travel() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    nrm = f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))"
    return f"""
WITH txyz AS MATERIALIZED (
  SELECT user_id, ts, event_id,
    {nrm}*cos(radians(lon))*cos(radians(lat)) AS x,
    {nrm}*sin(radians(lon))*cos(radians(lat)) AS y,
    {nrm}*(1 - {e2})*sin(radians(lat)) AS z
  FROM (SELECT user_id, ts, event_id, {lon} AS lon, {lat} AS lat
        FROM events) q
),
seq AS MATERIALIZED (
  SELECT user_id, event_id, ts, x, y, z,
    lead(user_id) OVER w AS nu, lead(event_id) OVER w AS ne,
    lead(ts) OVER w AS nt,
    lead(x) OVER w AS nx, lead(y) OVER w AS ny, lead(z) OVER w AS nz
  FROM txyz WINDOW w AS (ORDER BY user_id, ts, event_id)
)
SELECT user_id, event_id, ne AS next_event_id,
  CAST(epoch_us(nt) - epoch_us(ts) AS BIGINT) AS dt_us,
  CAST(floor((nx - x) * (nx - x) + (ny - y) * (ny - y)
    + (nz - z) * (nz - z)) AS BIGINT) AS d2_floor
FROM seq
WHERE nu = user_id
  AND (nx - x) * (nx - x) + (ny - y) * (ny - y) + (nz - z) * (nz - z)
    > ({TRAVEL_V_MPS!r} * ((epoch_us(nt) - epoch_us(ts)) / 1000000.0))
      * ({TRAVEL_V_MPS!r} * ((epoch_us(nt) - epoch_us(ts)) / 1000000.0))
"""


# ---------------------------------------------------------------------------
# Predicate-pushdown scan + stubbed CLIP-style pair scoring
# ---------------------------------------------------------------------------

def q_pruned_scan(sf_dir: str):
    """Predicate + projection pushdown at the READ: the row filter and
    the two-column projection are evaluated inside the parquet scan
    (pyarrow dataset filter -> row-group pruning + late
    materialization), so only qualifying rows of only the needed
    columns ever leave storage — the prune-at-the-read discipline the
    100 TB target demands.  Output: per-status order counts + total
    cents among 1996 orders."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lo = np.datetime64("1996-01-01T00:00:00", "us")
    hi = np.datetime64("1997-01-01T00:00:00", "us")
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi),
    )

    def agg(batch: pa.Table) -> pa.Table:
        st = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uq, inv = np.unique(st, return_inverse=True)
        n = np.bincount(inv, minlength=len(uq)).astype(np.int64)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"o_orderstatus": pa.array(uq, type=pa.string()),
                         "n": pa.array(n), "sum_cents": pa.array(s)})

    part = ds.map_batches(agg, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("o_orderstatus").aggregate(
        Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))


def sql_pruned_scan() -> str:
    return """
SELECT o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderstatus
"""


CLIP_D = 16
CLIP_TAU = 0.0


def q_clip_filter(sf_dir: str):
    """Image-text alignment filtering with a tiny REAL two-tower
    scorer over decoded pixels (deterministic numpy weights stand in
    for trained CLIP weights — no model weights exist in this
    sandbox, but the full pipeline is real: decode raw/png payload ->
    nearest-resize 16x16 -> per-(row, channel) pooled pixel sums (a
    48-dim image feature) -> linear projection P_img; captions ->
    token-hash votes -> P_txt; score = seq-fold cosine).  The actor
    pool loads both projection matrices once per actor (__init__);
    scoring is vectorized per batch.  Keep pairs with score >=
    CLIP_TAU.  Output (idx, score_micros, keep).  The oracle replays
    decode+resize+pool closed-form from the generative pixel formula
    (fixtures.gen_pixels) and the identical fold order, so scores
    are value-hash checked end-to-end."""
    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.ops.ann import _seq_dots, _seq_norm
    from rhealpixdggs_py_ray.ops.dedup import md5_u64_many

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(
        IMG_DIR, columns=["image_id", "caption", "bytes", "fmt", "w", "h"],
        override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8),
    )

    class ClipScorer:
        def __init__(self):
            from rhealpixdggs_py_ray.fixtures import splitmix64
            i = np.arange(48 * CLIP_D, dtype=np.uint64)
            f = (splitmix64(i + np.uint64(424242)) >> np.uint64(11)
                 ).astype(np.float64) / float(1 << 53)
            self.P_img = (2.0 * f - 1.0).reshape(48, CLIP_D)
            j = np.arange(64 * CLIP_D, dtype=np.uint64)
            g = (splitmix64(j + np.uint64(515151)) >> np.uint64(11)
                 ).astype(np.float64) / float(1 << 53)
            self.P_txt = (2.0 * g - 1.0).reshape(64, CLIP_D)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from rhealpixdggs_py_ray.fixtures import decode_image
            from rhealpixdggs_py_ray.ops.multimodal import resize_nearest

            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy(zero_copy_only=False)
            hs = batch["h"].to_numpy(zero_copy_only=False)
            n = len(blobs)
            B = np.empty((n, 48), dtype=np.float64)
            for k in range(n):
                pix = decode_image(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
                small = resize_nearest(pix, 16, 16).astype(np.int64)
                # pooled row sums per channel, feature index gi*3 + c
                B[k] = small.sum(axis=1).reshape(48).astype(np.float64)
            img = _seq_dots(B, self.P_img.T)
            caps = batch["caption"].to_pylist()
            toks_all, doc_idx = [], []
            for i, c in enumerate(caps):
                tk = c.split()
                toks_all.extend(tk)
                doc_idx.extend([i] * len(tk))
            T = np.zeros((n, 64), dtype=np.float64)
            if toks_all:
                h = md5_u64_many(toks_all)
                bit = (h % np.uint64(64)).astype(np.int64)
                np.add.at(T, (np.array(doc_idx), bit), 1.0)
            txt = _seq_dots(T, self.P_txt.T)
            num = np.zeros(n, dtype=np.float64)
            for d in range(CLIP_D):
                num = num + img[:, d] * txt[:, d]
            s = num / (_seq_norm(img) * _seq_norm(txt))
            idx = np.array([int(i[3:]) for i in
                            batch["image_id"].to_pylist()], dtype=np.int64)
            keep = (s >= CLIP_TAU).astype(np.int64)
            return pa.table({
                "idx": pa.array(idx),
                "score_micros": pa.array(
                    np.floor(s * 1000000.0).astype(np.int64)),
                "keep": pa.array(keep),
            })

    return ds.map_batches(
        ClipScorer, batch_format="pyarrow", batch_size=512,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )


def _clip_sql_parts():
    """Shared oracle pieces for the two-tower CLIP-style ops: the CTE
    chain from the images source through per-image (cimg) and
    per-caption (ctxt) embeddings, plus the fold-ordered cosine
    expression fragments.  Returns (prefix, num, inrm, tnrm)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64, write_images_table

    write_images_table(IMG_DIR, IMG_N)
    i = np.arange(48 * CLIP_D, dtype=np.uint64)
    P_img = (2.0 * ((splitmix64(i + np.uint64(424242)) >> np.uint64(11)
                     ).astype(np.float64) / float(1 << 53)) - 1.0
             ).reshape(48, CLIP_D)
    j = np.arange(64 * CLIP_D, dtype=np.uint64)
    P_txt = (2.0 * ((splitmix64(j + np.uint64(515151)) >> np.uint64(11)
                     ).astype(np.float64) / float(1 << 53)) - 1.0
             ).reshape(64, CLIP_D)
    M = "18446744073709551616"
    u = f"CAST(((CAST(phash AS HUGEINT) % {M}) + {M}) % {M} AS UBIGINT)"
    from rhealpixdggs_py_ray.oracle import _lit
    # pooled pixel features: p{gi*3+c} = sum over gj of the decoded
    # 16x16 nearest-resized pixel (closed-form fixtures.gen_pixels:
    # (xi*3 + yi*5 + c*7 + ((u >> 8c) & 255)) % 256 at yi = gi*h//16,
    # xi = gj*w//16) — exact integers, cast to DOUBLE once
    pool_cols = ", ".join(
        "CAST(SUM(CASE WHEN gi = {gi} AND c = {c} THEN pxv ELSE 0 END)"
        " AS DOUBLE) AS p{i}".format(gi=i_ // 3, c=i_ % 3, i=i_)
        for i_ in range(48)
    )
    img_d = []
    for d in range(CLIP_D):
        terms = " + ".join(
            f"p{b} * ({_lit(float(P_img[b, d]))})" for b in range(48))
        img_d.append(f"({terms})")
    txt_d = []
    for d in range(CLIP_D):
        terms = " + ".join(
            f"tv{b} * ({_lit(float(P_txt[b, d]))})" for b in range(64))
        txt_d.append(f"({terms})")
    tv_cols = ", ".join(
        f"CAST(SUM(CASE WHEN bit = {b} THEN 1 ELSE 0 END) AS DOUBLE) AS tv{b}"
        for b in range(64))
    num = " + ".join(f"i{d} * t{d}" for d in range(CLIP_D))
    inrm = " + ".join(f"i{d} * i{d}" for d in range(CLIP_D))
    tnrm = " + ".join(f"t{d} * t{d}" for d in range(CLIP_D))
    img_cols = ", ".join(f"{e} AS i{d}" for d, e in enumerate(img_d))
    txt_cols = ", ".join(f"{e} AS t{d}" for d, e in enumerate(txt_d))
    prefix = f"""csrc AS MATERIALIZED (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS idx, caption,
    CAST(w AS BIGINT) AS iw, CAST(h AS BIGINT) AS ih, {u} AS u
  FROM read_parquet('{IMG_DIR}/*.parquet')
),
ctoks AS MATERIALIZED (
  SELECT idx, CAST(md5_number_lower(w) % 64 AS BIGINT) AS bit
  FROM (SELECT idx, unnest(regexp_split_to_array(trim(caption), '\\s+')) AS w
        FROM csrc) q
),
cvotes AS MATERIALIZED (
  SELECT idx, {tv_cols} FROM ctoks GROUP BY idx
),
lat AS MATERIALIZED (
  SELECT gi.gi, gj.gj, c.c FROM
    (SELECT unnest(generate_series(0, 15)) AS gi) gi,
    (SELECT unnest(generate_series(0, 15)) AS gj) gj,
    (SELECT unnest(generate_series(0, 2)) AS c) c
),
cpix AS MATERIALIZED (
  SELECT s.idx, l.gi, l.c,
    ((CAST(l.gj AS BIGINT) * s.iw) // 16) * 3
      + ((CAST(l.gi AS BIGINT) * s.ih) // 16) * 5
      + CAST(l.c AS BIGINT) * 7
      + CAST((s.u >> CAST(8 * l.c AS UBIGINT)) & 255 AS BIGINT) AS raw
  FROM csrc s, lat l
),
cpool AS MATERIALIZED (
  SELECT idx, {pool_cols}
  FROM (SELECT idx, gi, c, raw % 256 AS pxv FROM cpix) q
  GROUP BY idx
),
cimg AS MATERIALIZED (
  SELECT idx, {img_cols} FROM cpool
),
ctxt AS MATERIALIZED (
  SELECT idx, {txt_cols} FROM cvotes
)"""
    return prefix, num, inrm, tnrm


def sql_clip_filter() -> str:
    from rhealpixdggs_py_ray.oracle import _lit

    prefix, num, inrm, tnrm = _clip_sql_parts()
    return f"""
WITH {prefix},
cs AS MATERIALIZED (
  SELECT cimg.idx,
    ({num}) / (sqrt({inrm}) * sqrt({tnrm})) AS s
  FROM cimg JOIN ctxt ON cimg.idx = ctxt.idx
)
SELECT idx, CAST(floor(s * 1000000.0) AS BIGINT) AS score_micros,
  CAST(CASE WHEN s >= {_lit(CLIP_TAU)} THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM cs
"""


# ---------------------------------------------------------------------------
# Grid DBSCAN over the occupied lattice
# ---------------------------------------------------------------------------

DBSCAN_RES = 3
DBSCAN_MINPTS = 16


def q_dbscan_cells(sf_dir: str):
    """Grid DBSCAN (density-based clustering on the res-3 lattice):
    a cell is CORE iff its 3x3 focal point count >= MINPTS; clusters
    are connected components of 8-adjacent cores; occupied non-core
    cells adjacent to a core join the smallest adjacent core's
    cluster as BORDER.  Exchanges: point count, focal contribution
    (the focal_stats expansion), core-edge build, cc, and the border/
    singleton resolve — every one a bucketed mergeable exchange on the
    packed lattice key, the 10^12-point density-clustering shape.
    Output (cell_id, cluster, kind 1=core 2=border), cluster = packed
    key of the smallest member core."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key
    from rhealpixdggs_py_ray.ops.cc import connected_components

    k = DBSCAN_RES
    side = 3 ** k
    W = 4 * side
    nb = 8
    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def cells(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        m = np.abs(lat) <= DISSOLVE_LAT
        u = cidx.cell_from_point(CFG, k, lon[m], lat[m], plane=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        key = ((d // 3) @ pw) * W + (
            (face.astype(np.int64) - 1) * side + (d % 3) @ pw)
        return pa.table({"key": pa.array(key.astype(np.uint64)),
                         "one": pa.array(np.ones(len(key), dtype=np.int64))})

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n")

    def _neighbors(key: np.ndarray, include_self: bool):
        gy, gx = key // W, key % W
        outs = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0 and not include_self:
                    continue
                ty = gy + dy
                ok = (ty >= 0) & (ty < side)
                tk = ty * W + (gx + dx) % W
                outs.append((tk[ok], ok, dy == 0 and dx == 0))
        return outs

    def focal_emit(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False)
        t_l, w_l, o_l = [], [], []
        for tk, ok, is_self in _neighbors(key, include_self=True):
            t_l.append(tk)
            w_l.append(n[ok])
            o_l.append(n[ok] if is_self else np.zeros(ok.sum(), dtype=np.int64))
        tk = np.concatenate(t_l)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(tk.astype(np.uint64), nb)),
            "key": pa.array(tk),
            "w": pa.array(np.concatenate(w_l)),
            "own": pa.array(np.concatenate(o_l)),
        })

    def focal_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "focal": pa.array([], type=pa.int64())})
        kk = g["key"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        own = g["own"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(kk, return_inverse=True)
        sw = np.zeros(len(uq), dtype=np.int64); np.add.at(sw, inv, w)
        so = np.zeros(len(uq), dtype=np.int64); np.add.at(so, inv, own)
        m = so > 0  # occupied only
        return pa.table({"key": pa.array(uq[m]), "n": pa.array(so[m]),
                         "focal": pa.array(sw[m])})

    cellstats = (
        occ.map_batches(focal_emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(focal_reduce, batch_format="pyarrow")
    ).materialize()  # consumed by edges, borders, and output

    def core_edges(batch: pa.Table) -> pa.Table:
        kk = batch["key"].to_numpy(zero_copy_only=False)
        focal = batch["focal"].to_numpy(zero_copy_only=False)
        core = kk[focal >= DBSCAN_MINPTS].astype(np.int64)
        t_l, s_l, self_l = [], [], []
        for tk, ok, _ in _neighbors(core, include_self=False):
            t_l.append(tk)
            s_l.append(core[ok])
        t = np.concatenate(t_l) if t_l else np.array([], dtype=np.int64)
        s = np.concatenate(s_l) if s_l else np.array([], dtype=np.int64)
        # neighbor-candidate rows plus self-marker rows
        key = np.concatenate([t, core])
        src = np.concatenate([s, np.full(len(core), -1, dtype=np.int64)])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(key.astype(np.uint64), nb)),
            "key": pa.array(key), "src": pa.array(src),
        })

    def edge_resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        kk = g["key"].to_numpy(zero_copy_only=False)
        src = g["src"].to_numpy(zero_copy_only=False)
        is_core = src == -1
        coreset = np.unique(kk[is_core])
        ck, cs = kk[~is_core], src[~is_core]
        pos = np.clip(np.searchsorted(coreset, ck), 0,
                      max(len(coreset) - 1, 0))
        m = (coreset[pos] == ck) if len(coreset) else np.zeros(len(ck), bool)
        a = np.minimum(ck[m], cs[m])
        b = np.maximum(ck[m], cs[m])
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    edges = (
        cellstats.map_batches(core_edges, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("bucket").map_groups(edge_resolve, batch_format="pyarrow")
    )
    lab = connected_components(edges)

    # final resolve: core labels (cc result, default self for isolated
    # cores), then border assignment — one union bucket exchange.
    def lab_rows(batch: pa.Table) -> pa.Table:
        kk = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = batch["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(kk.astype(np.uint64), nb)),
            "key": pa.array(kk), "val": pa.array(cl),
            "kind": pa.array(np.full(len(kk), 0, dtype=np.int64)),  # cc label
        })

    def stat_rows(batch: pa.Table) -> pa.Table:
        kk = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        focal = batch["focal"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(kk.astype(np.uint64), nb)),
            "key": pa.array(kk),
            "val": pa.array((focal >= DBSCAN_MINPTS).astype(np.int64)),
            "kind": pa.array(np.full(len(kk), 1, dtype=np.int64)),  # occupied
        })

    def core_label_resolve(g: pa.Table) -> pa.Table:
        # emits per-core final label rows AND per-border candidate
        # emissions would need core labels first: resolve labels here
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64()),
                             "is_core": pa.array([], type=pa.int64())})
        kk = g["key"].to_numpy(zero_copy_only=False)
        val = g["val"].to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        occ_k = kk[kind == 1]
        occ_core = val[kind == 1] == 1
        lk, lv = kk[kind == 0], val[kind == 0]
        o = np.argsort(lk); lk, lv = lk[o], lv[o]
        pos = np.clip(np.searchsorted(lk, occ_k), 0, max(len(lk) - 1, 0))
        has = (lk[pos] == occ_k) if len(lk) else np.zeros(len(occ_k), bool)
        label = np.where(has, lv[pos] if len(lk) else 0, occ_k)
        m = occ_core
        return pa.table({"key": pa.array(occ_k[m]),
                         "label": pa.array(label[m]),
                         "is_core": pa.array(np.ones(m.sum(), dtype=np.int64))})

    core_labeled = (
        lab.map_batches(lab_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(cellstats.map_batches(stat_rows, batch_format="pyarrow",
                                     zero_copy_batch=True))
        .groupby("bucket").map_groups(core_label_resolve,
                                      batch_format="pyarrow")
    ).materialize()

    # border pass: cores emit (neighbor, label); occupied non-core rows
    # pick the min; cores emit their own final row
    def border_emit(batch: pa.Table) -> pa.Table:
        kk = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        lb = batch["label"].to_numpy(zero_copy_only=False)
        t_l, l_l = [], []
        for tk, ok, _ in _neighbors(kk, include_self=False):
            t_l.append(tk)
            l_l.append(lb[ok])
        t = np.concatenate(t_l) if t_l else np.array([], dtype=np.int64)
        lv = np.concatenate(l_l) if l_l else np.array([], dtype=np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(t.astype(np.uint64), nb)),
            "key": pa.array(t), "val": pa.array(lv),
            "kind": pa.array(np.full(len(t), 2, dtype=np.int64)),  # candidate
        })

    def final_resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"cell_id": pa.array([], type=pa.string()),
                             "cluster": pa.array([], type=pa.int64()),
                             "kind": pa.array([], type=pa.int64())})
        kk = g["key"].to_numpy(zero_copy_only=False)
        val = g["val"].to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        # occupied rows (kind 1, val=is_core), candidates (kind 2),
        # core labels (kind 0 from core_labeled re-keyed)
        occ_k = kk[kind == 1]
        occ_core = val[kind == 1] == 1
        # core final labels
        lk, lv = kk[kind == 0], val[kind == 0]
        o = np.argsort(lk); lk, lv = lk[o], lv[o]
        # min candidate label per key
        ck, cv = kk[kind == 2], val[kind == 2]
        co = np.lexsort((cv, ck)); ck, cv = ck[co], cv[co]
        first = (np.r_[True, ck[1:] != ck[:-1]] if len(ck)
                 else np.zeros(0, dtype=bool))
        mk, mv = ck[first], cv[first]
        out_k, out_c, out_kind = [], [], []
        # cores
        if len(lk):
            pos = np.clip(np.searchsorted(lk, occ_k), 0, len(lk) - 1)
            core_m = occ_core & (lk[pos] == occ_k)
            out_k.append(occ_k[core_m]); out_c.append(lv[pos][core_m])
            out_kind.append(np.ones(core_m.sum(), dtype=np.int64))
        # borders: occupied, not core, with >= 1 candidate
        if len(mk):
            bpos = np.clip(np.searchsorted(mk, occ_k), 0, len(mk) - 1)
            bm = (~occ_core) & (mk[bpos] == occ_k)
            out_k.append(occ_k[bm]); out_c.append(mv[bpos][bm])
            out_kind.append(np.full(bm.sum(), 2, dtype=np.int64))
        if not out_k:
            return pa.table({"cell_id": pa.array([], type=pa.string()),
                             "cluster": pa.array([], type=pa.int64()),
                             "kind": pa.array([], type=pa.int64())})
        ko = np.concatenate(out_k); cl = np.concatenate(out_c)
        kd = np.concatenate(out_kind)
        gy_, gx_ = ko // W, ko % W
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy_, gx_, k), type=pa.string()),
            "cluster": pa.array(cl),
            "kind": pa.array(kd),
        })

    def core_label_rows(batch: pa.Table) -> pa.Table:
        kk = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(kk.astype(np.uint64), nb)),
            "key": pa.array(kk), "val": batch["label"],
            "kind": pa.array(np.zeros(len(kk), dtype=np.int64)),
        })

    return (
        core_labeled.map_batches(core_label_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
        .union(core_labeled.map_batches(border_emit, batch_format="pyarrow",
                                        zero_copy_batch=True))
        .union(cellstats.map_batches(stat_rows, batch_format="pyarrow",
                                     zero_copy_batch=True))
        .groupby("bucket").map_groups(final_resolve, batch_format="pyarrow")
    )


def sql_dbscan_cells() -> str:
    k = DBSCAN_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE (key % {W}) // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST((((key // {W}) // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + ((((key % {W}) % {side}) // {3 ** (k - 1 - i)}) % 3)"
            " AS VARCHAR)"
            for i in range(k)
        )
    )
    offs = ", ".join(f"({dy}, {dx})" for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return f"""
WITH RECURSIVE docc AS MATERIALIZED (
  SELECT ({gy}) * {W} + ({gx}) AS key, COUNT(*) AS n
  FROM {idx_sql} t GROUP BY 1
),
doffs(dy, dx) AS (SELECT * FROM (VALUES {offs})),
dfocal AS MATERIALIZED (
  SELECT o.key, MAX(o.n) AS n, SUM(b.n) AS focal
  FROM docc o
  JOIN doffs f ON TRUE
  JOIN docc b ON b.key = ((o.key // {W}) + f.dy) * {W}
    + (((o.key % {W}) + f.dx + {W}) % {W})
    AND (o.key // {W}) + f.dy >= 0 AND (o.key // {W}) + f.dy < {side}
  GROUP BY o.key
),
dcore AS MATERIALIZED (
  SELECT key FROM dfocal WHERE focal >= {DBSCAN_MINPTS}
),
dedge AS MATERIALIZED (
  SELECT least(a.key, b.key) AS u, greatest(a.key, b.key) AS v
  FROM dcore a
  JOIN doffs f ON NOT (f.dy = 0 AND f.dx = 0)
  JOIN dcore b ON b.key = ((a.key // {W}) + f.dy) * {W}
    + (((a.key % {W}) + f.dx + {W}) % {W})
    AND (a.key // {W}) + f.dy >= 0 AND (a.key // {W}) + f.dy < {side}
),
ded2 AS MATERIALIZED (
  SELECT u, v FROM dedge UNION ALL SELECT v, u FROM dedge
),
dreach(n, m) AS (
  SELECT key, key FROM dcore
  UNION
  SELECT r.n, e.v FROM dreach r JOIN ded2 e ON e.u = r.m
),
dlab AS MATERIALIZED (
  SELECT n AS key, MIN(m) AS label FROM dreach GROUP BY n
),
dborder AS MATERIALIZED (
  SELECT o.key, MIN(l.label) AS label
  FROM dfocal o
  JOIN doffs f ON NOT (f.dy = 0 AND f.dx = 0)
  JOIN dcore c ON c.key = ((o.key // {W}) + f.dy) * {W}
    + (((o.key % {W}) + f.dx + {W}) % {W})
    AND (o.key // {W}) + f.dy >= 0 AND (o.key // {W}) + f.dy < {side}
  JOIN dlab l ON l.key = c.key
  WHERE o.focal < {DBSCAN_MINPTS}
  GROUP BY o.key
)
SELECT {rebuild} AS cell_id, CAST(label AS BIGINT) AS cluster,
  CAST(1 AS BIGINT) AS kind
FROM dlab
UNION ALL
SELECT {rebuild}, CAST(label AS BIGINT), CAST(2 AS BIGINT) FROM dborder
"""


# ---------------------------------------------------------------------------
# Space-time co-location (contact tracing join)
# ---------------------------------------------------------------------------

COLOC_RES = 4
COLOC_T_S = 3600 * 24 * 7  # contact window: same cell within 7 days


def q_colocation_pairs(sf_dir: str):
    """Contact-tracing join: pairs of DIFFERENT users with events in
    the SAME res-4 cell within COLOC_T_S seconds.  The space-time key
    (lattice cell, time bucket of width T) partitions the stream; each
    event lands in its own bucket and the NEXT one (time halo), so
    every qualifying pair meets exactly where the later event is home
    — counted once, no dedup pass.  One space-time exchange + one tiny
    per-user-pair sum.  Output (user_a, user_b, n_contacts)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    k = COLOC_RES
    side = 3 ** k
    W = 4 * side
    T_us = COLOC_T_S * 1_000_000
    nb = 8
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"],
               blocks=4)

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        m = np.abs(lat) <= DISSOLVE_LAT
        ids = ids[m]
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[m]
        t = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)[m]
        u = cidx.cell_from_point(CFG, k, lon[m], lat[m], plane=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        ck = ((d // 3) @ pw) * W + (
            (face.astype(np.int64) - 1) * side + (d % 3) @ pw)
        tb = t // T_us
        stk0 = ck * (1 << 32) + tb
        stk1 = ck * (1 << 32) + tb + 1
        stk = np.concatenate([stk0, stk1])
        home = np.concatenate([np.ones(len(ck), dtype=np.int64),
                               np.zeros(len(ck), dtype=np.int64)])
        rep = lambda a: np.concatenate([a, a])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(stk.astype(np.uint64), nb)),
            "stk": pa.array(stk),
            "eid": pa.array(rep(ids)),
            "uid": pa.array(rep(uid)),
            "t": pa.array(rep(t)),
            "home": pa.array(home),
        })

    def pair_count(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "stk" not in g.column_names:
            return pa.table({"pkey": pa.array([], type=pa.uint64()),
                             "n": pa.array([], type=pa.int64())})
        stk = g["stk"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        home = g["home"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((eid, stk))
        stk, eid, uid, t, home = (a[order] for a in (stk, eid, uid, t, home))
        hidx = np.flatnonzero(home)
        if not len(hidx):
            return pa.table({"pkey": pa.array([], type=pa.uint64()),
                             "n": pa.array([], type=pa.int64())})
        lo = np.searchsorted(stk, stk[hidx], side="left")
        hi = np.searchsorted(stk, stk[hidx], side="right")
        cnt = hi - lo
        a_rep = np.repeat(hidx, cnt)
        b_idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)])
        # a = LATER home event, b = strictly-earlier-by-(t, eid) event
        dt = t[a_rep] - t[b_idx]
        earlier = (dt > 0) | ((dt == 0) & (eid[b_idx] < eid[a_rep]))
        hit = earlier & (dt <= T_us) & (uid[a_rep] != uid[b_idx])
        ua = np.minimum(uid[a_rep][hit], uid[b_idx][hit]).astype(np.uint64)
        ub = np.maximum(uid[a_rep][hit], uid[b_idx][hit]).astype(np.uint64)
        if len(ub) and int(ub.max()) >= (1 << 32):
            raise AssertionError(
                "colocation pair packing overflow (user id >= 2^32)")
        pk = ua * np.uint64(1 << 32) + ub
        uq, n = np.unique(pk, return_counts=True)
        return pa.table({"pkey": pa.array(uq),
                         "n": pa.array(n.astype(np.int64))})

    partials = (
        ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pair_count, batch_format="pyarrow")
    )
    summed = sum_by_u64_key(partials, "pkey", "n", "n_contacts")

    def decode(batch: pa.Table) -> pa.Table:
        pk = batch["pkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "user_a": pa.array((pk >> np.uint64(32)).astype(np.int64)),
            "user_b": pa.array((pk & np.uint64((1 << 32) - 1)).astype(np.int64)),
            "n_contacts": batch["n_contacts"],
        })

    return summed.map_batches(decode, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_colocation_pairs() -> str:
    k = COLOC_RES
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    T_us = COLOC_T_S * 1_000_000
    return f"""
WITH ce AS MATERIALIZED (
  SELECT t.event_id, t.cell_id, e.user_id, epoch_us(e.ts) AS tus
  FROM {idx_sql} t JOIN events e ON e.event_id = t.event_id
)
SELECT least(a.user_id, b.user_id) AS user_a,
  greatest(a.user_id, b.user_id) AS user_b,
  CAST(COUNT(*) AS BIGINT) AS n_contacts
FROM ce a JOIN ce b
  ON a.cell_id = b.cell_id
  AND a.user_id <> b.user_id
  AND (b.tus - a.tus > 0 OR (b.tus = a.tus AND a.event_id < b.event_id))
  AND b.tus - a.tus <= {T_us}
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Home-cell inference + dictionary topic tagging
# ---------------------------------------------------------------------------

HOME_RES = 3


def q_home_cells(sf_dir: str):
    """Per-user home-location inference: the user's modal res-3 cell
    (ties -> lexicographically smallest cell), with its visit count and
    the user's total events.  One h(user) bucket exchange; the resolve
    is a segmented (user, cell) count + per-user argmax, all
    vectorized.  Output (user_id, home_cell, n_home, n_total)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)
    nb = 8

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, HOME_RES, lon, lat, plane=False)
        cell = su.to_string_fixed(u, HOME_RES)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid.astype(np.uint64), nb)),
            "user_id": pa.array(uid),
            "cell": pa.array(cell, type=pa.string()),
        })

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "user_id" not in g.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "home_cell": pa.array([], type=pa.string()),
                             "n_home": pa.array([], type=pa.int64()),
                             "n_total": pa.array([], type=pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        cell = g["cell"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"u": uid, "c": cell})
        cnt = df.groupby(["u", "c"], sort=False).size().reset_index(name="n")
        tot = df.groupby("u", sort=False).size()
        cnt = cnt.sort_values(["u", "n", "c"],
                              ascending=[True, False, True])
        first = cnt.drop_duplicates("u", keep="first")
        return pa.table({
            "user_id": pa.array(first["u"].to_numpy()),
            "home_cell": pa.array(first["c"].to_numpy(), type=pa.string()),
            "n_home": pa.array(first["n"].to_numpy().astype(np.int64)),
            "n_total": pa.array(tot.loc[first["u"]].to_numpy().astype(np.int64)),
        })

    return (
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_home_cells() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), HOME_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH hc AS MATERIALIZED (
  SELECT e.user_id, t.cell_id FROM {idx_sql} t
  JOIN events e ON e.event_id = t.event_id
),
cnt AS MATERIALIZED (
  SELECT user_id, cell_id, COUNT(*) AS n FROM hc GROUP BY 1, 2
),
tot AS MATERIALIZED (
  SELECT user_id, COUNT(*) AS n_total FROM hc GROUP BY 1
)
SELECT c.user_id, c.cell_id AS home_cell,
  CAST(c.n AS BIGINT) AS n_home, CAST(t.n_total AS BIGINT) AS n_total
FROM cnt c JOIN tot t ON c.user_id = t.user_id
QUALIFY row_number() OVER (PARTITION BY c.user_id
  ORDER BY c.n DESC, c.cell_id) = 1
"""


TOPIC_DICT = [
    ("commerce", ["order", "price", "ship", "pay"]),
    ("geo", ["cell", "map", "region", "tile"]),
    ("tech", ["data", "model", "train", "index"]),
]


def q_topic_tag(sf_dir: str):
    """Dictionary topic classifier (the seeded-keyword corpus router):
    per doc, count whole-word hits of each topic's keyword list (RE2
    word-boundary counts — Arrow and DuckDB bind the same regex
    engine), assign the argmax topic (ties -> dictionary order), or
    'none' when nothing hits.  Map-only.  Output (doc_id, topic,
    n_hits)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hits = np.zeros((n, len(TOPIC_DICT)), dtype=np.int64)
        for ti, (_t, words) in enumerate(TOPIC_DICT):
            for w in words:
                hits[:, ti] += pc.count_substring_regex(
                    batch["text"], rf"\b{w}\b").to_numpy(zero_copy_only=False)
        best = np.argmax(hits, axis=1)  # first max == dictionary order
        n_hits = hits[np.arange(n), best]
        topics = np.array([t for t, _ in TOPIC_DICT], dtype=object)[best]
        topics = np.where(n_hits > 0, topics, "none")
        return pa.table({
            "doc_id": batch["doc_id"],
            "topic": pa.array(topics.astype(str), type=pa.string()),
            "n_hits": pa.array(n_hits),
        })

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def sql_topic_tag() -> str:
    cols = []
    for ti, (_t, words) in enumerate(TOPIC_DICT):
        terms = " + ".join(
            f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in words)
        cols.append(f"({terms}) AS h{ti}")
    case = "CASE "
    for ti, (t, _w) in enumerate(TOPIC_DICT):
        others = " AND ".join(
            f"h{ti} >= h{tj}" for tj in range(len(TOPIC_DICT)) if tj != ti)
        prior = " AND ".join(
            f"h{ti} > h{tj}" for tj in range(ti))
        cond = others if not prior else f"{others} AND {prior}"
        # argmax with first-wins ties: topic ti wins iff >= all and
        # strictly greater than every EARLIER topic
        case += f"WHEN {cond} THEN '{t}' "
    case += "END"
    hits_max = "greatest(" + ", ".join(
        f"h{ti}" for ti in range(len(TOPIC_DICT))) + ")"
    return f"""
WITH th AS MATERIALIZED (
  SELECT doc_id, {', '.join(cols)} FROM documents
)
SELECT doc_id,
  CASE WHEN {hits_max} > 0 THEN {case} ELSE 'none' END AS topic,
  CAST({hits_max} AS BIGINT) AS n_hits
FROM th
"""


# ---------------------------------------------------------------------------
# Antimeridian fence + group-aware split + rendezvous sharding
# ---------------------------------------------------------------------------

DATELINE_FENCE = (170.0, -25.0, -170.0, 25.0)  # lon wraps across +-180


def q_dateline_fence(sf_dir: str):
    """Fence that CROSSES the antimeridian (lon >= 170 OR lon <= -170):
    per res-2 face, count of contained events — the wrap case every
    naive bbox filter gets wrong.  Pure map + tiny aggregate."""
    lon1, lat1, lon2, lat2 = DATELINE_FENCE
    ds = indexed_events(sf_dir, resolution=2)

    def refine(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        keep = ((lon >= lon1) | (lon <= lon2)) & (lat >= lat1) & (lat <= lat2)
        cell = batch["cell_id"].to_numpy(zero_copy_only=False)[keep]
        face = np.array([c[0] for c in cell], dtype=object)
        uq, n = np.unique(face, return_counts=True)
        return pa.table({"face_id": pa.array(uq.astype(str), type=pa.string()),
                         "n": pa.array(n.astype(np.int64))})

    return ds.map_batches(
        refine, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("face_id").aggregate(Sum("n", alias_name="n"))


def sql_dateline_fence() -> str:
    lon1, lat1, lon2, lat2 = DATELINE_FENCE
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), 2, CFG, id_cols=("event_id",)
    )
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    return (
        f"SELECT substr(cell_id, 1, 1) AS face_id, CAST(COUNT(*) AS BIGINT)"
        f" AS n FROM {inner} t"
        f" WHERE (({lon}) >= {lon1!r} OR ({lon}) <= {lon2!r})"
        f" AND ({lat}) >= {lat1!r} AND ({lat}) <= {lat2!r} GROUP BY 1"
    )


def q_group_split(sf_dir: str):
    """Group-aware train/val/test split (leakage prevention): the WHOLE
    source goes to one split by md5(source) % 100 (< 80 train, < 90
    val, else test) — documents of one origin can never straddle the
    boundary.  Map-only.  Output (doc_id, source, split)."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64_many

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def tag(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        h = md5_u64_many(src) % np.uint64(100)
        split = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "split": pa.array(split.astype(str), type=pa.string()),
        })

    return ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)


def sql_group_split() -> str:
    return """
SELECT doc_id, source,
  CASE WHEN md5_number_lower(source) % 100 < 80 THEN 'train'
       WHEN md5_number_lower(source) % 100 < 90 THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


RENDEZVOUS_SERVERS = 8
RENDEZVOUS_R = 3


def q_rendezvous_shards(sf_dir: str):
    """Rendezvous (highest-random-weight) replica placement: every
    occupied res-2 tile picks its top-R of S servers by
    md5(tile || ':' || server) — adding/removing a server moves only
    1/S of the keys, the standard serving-shard assignment.  Map-only
    over the bounded distinct-tile set.  Output (tile_id, server,
    rank)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = indexed_events(sf_dir, resolution=2)

    def cells(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(u, type=pa.uint64()),
                         "one": pa.array(np.ones(len(u), dtype=np.int64))})

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n")

    def place(batch: pa.Table) -> pa.Table:
        u = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tiles = su.to_string_fixed(u, 2)
        S, R = RENDEZVOUS_SERVERS, RENDEZVOUS_R
        n = len(tiles)
        H = np.empty((n, S), dtype=np.uint64)
        for s in range(S):
            H[:, s] = np.fromiter(
                (md5_u64(f"{t}:{s}") for t in tiles), dtype=np.uint64,
                count=n)
        # exact u64 descending with (w DESC, server ASC) ties: bitwise
        # NOT inverts the order losslessly, stable argsort keeps the
        # lower server first on (impossible) ties
        order = np.argsort(~H, axis=1, kind="stable")
        top = order[:, :R]
        return pa.table({
            "tile_id": pa.array(np.repeat(tiles, R), type=pa.string()),
            "server": pa.array(top.ravel().astype(np.int64)),
            "rank": pa.array(np.tile(np.arange(1, R + 1, dtype=np.int64), n)),
        })

    return occ.map_batches(place, batch_format="pyarrow", zero_copy_batch=True)


def sql_rendezvous_shards() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), 2, CFG, id_cols=("event_id",)
    )
    S, R = RENDEZVOUS_SERVERS, RENDEZVOUS_R
    return f"""
WITH rtiles AS MATERIALIZED (
  SELECT DISTINCT cell_id AS tile_id FROM {inner} t
),
rw AS MATERIALIZED (
  SELECT tile_id, s.s AS server,
    md5_number_lower(tile_id || ':' || CAST(s.s AS VARCHAR)) AS w
  FROM rtiles, (SELECT unnest(generate_series(0, {S - 1})) AS s) s
)
SELECT tile_id, CAST(server AS BIGINT) AS server,
  row_number() OVER (PARTITION BY tile_id ORDER BY w DESC, server) AS rank
FROM rw QUALIFY rank <= {R}
"""


# ---------------------------------------------------------------------------
# Global sort + embedding int8 quantization audit
# ---------------------------------------------------------------------------

def q_global_sort(sf_dir: str):
    """Top-100 events by (value DESC, event_id ASC) through Ray Data's
    native distributed sort-exchange (`Dataset.sort`) — the one
    operator family the suite otherwise avoids in favor of bucketed
    exchanges; kept narrow (2 columns in, 100 rows out) so the
    all-to-all moves minimum bytes.  Output (rank, event_id, cents)."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"], blocks=4)

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "neg_cents": pa.array(-np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)),
        })

    top = (
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["neg_cents", "event_id"])
        .limit(100)
    ).to_pandas()
    return pa.table({
        "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        "event_id": pa.array(top["event_id"].to_numpy().astype(np.int64)),
        "cents": pa.array((-top["neg_cents"].to_numpy()).astype(np.int64)),
    })


def sql_global_sort() -> str:
    return """
SELECT row_number() OVER (ORDER BY CAST(floor(value * 100) AS BIGINT) DESC,
    event_id) AS rank,
  event_id, CAST(floor(value * 100) AS BIGINT) AS cents
FROM events
ORDER BY rank LIMIT 100
"""


QUANT_BITS = 127


def q_quantize_embeddings(sf_dir: str):
    """Int8 scalar quantization audit (the vector-store compression
    step): per vector, scale = max_abs/127, q_i = floor(x_i/scale)
    clipped to [-127, 127], reporting the exact reconstruction error
    sum((x - q*scale)^2) as floor(err * 1e12).  Map-only; the fold
    mirrors the SQL list expressions element-by-element.  Output
    (vec_id, max_abs_micros, err_e12)."""
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        M = _emb_matrix(batch)
        amax = np.zeros(M.shape[0], dtype=np.float64)
        for i in range(M.shape[1]):  # seq fold == SQL list_max order
            amax = np.maximum(amax, np.abs(M[:, i]))
        # all-zero vector guard: amax==0 -> scale 1.0 (rows are all
        # zeros, so q=0, d=0, err=0 — no NaN); SQL mirrors the CASE
        scale = np.where(amax > 0.0, amax, 127.0) / 127.0
        err = np.zeros(M.shape[0], dtype=np.float64)
        for i in range(M.shape[1]):
            q = np.clip(np.floor(M[:, i] / scale), -127, 127)
            d = M[:, i] - q * scale
            err = err + d * d
        return pa.table({
            "vec_id": pa.array(ids),
            "max_abs_micros": pa.array(
                np.floor(amax * 1000000.0).astype(np.int64)),
            "err_e12": pa.array(np.floor(err * 1e12).astype(np.int64)),
        })

    return ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def sql_quantize_embeddings() -> str:
    return f"""
WITH qe AS MATERIALIZED (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding,
      x -> abs(CAST(x AS DOUBLE)))) AS amax
  FROM embeddings
), qs AS MATERIALIZED (
  -- all-zero vector guard: amax==0 -> scale 1.0 (numpy mirror)
  SELECT vec_id, embedding, amax,
    CASE WHEN amax > 0 THEN amax ELSE 127.0 END / 127.0 AS scale
  FROM qe
)
SELECT vec_id,
  CAST(floor(amax * 1000000.0) AS BIGINT) AS max_abs_micros,
  CAST(floor(list_sum(list_transform(embedding, x ->
    (CAST(x AS DOUBLE) - greatest(least(floor(CAST(x AS DOUBLE)
        / scale), 127.0), -127.0) * scale)
    * (CAST(x AS DOUBLE) - greatest(least(floor(CAST(x AS DOUBLE)
        / scale), 127.0), -127.0) * scale)
  )) * 1e12) AS BIGINT) AS err_e12
FROM qs
"""


def q_daily_p95(sf_dir: str):
    """Per-day exact p95 of event value (the SLO/latency monitoring
    shape): per-batch (day, cent) histogram partials -> one bucketed
    exchange -> per-day cumulative-rank pick k = ceil(0.95 n) as
    (19n + 19) // 20.  Output (day, n, p95_c)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["ts", "value"], blocks=4)
    nb = 8

    def part(batch: pa.Table) -> pa.Table:
        t = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        day = t.astype(np.int64)
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        if len(c) and (np.abs(c) >= 500_000).any():
            raise AssertionError("daily_p95 cent packing overflow (|value| >= 5000)")
        key = day * 1_000_000 + (c + 500_000)  # cents within +-5e5, asserted
        uq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(
                (uq // 1_000_000).astype(np.uint64), nb)),
            "key": pa.array(uq),
            "n": pa.array(cnt.astype(np.int64)),
        })

    def pick(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"day": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "p95_c": pa.array([], type=pa.int64())})
        key = g["key"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        # merge duplicate (day, cent) partials, then rank within day
        uq, inv = np.unique(key, return_inverse=True)
        cnt = np.zeros(len(uq), dtype=np.int64)
        np.add.at(cnt, inv, n)
        day = uq // 1_000_000
        c = uq % 1_000_000 - 500_000
        starts = np.flatnonzero(np.r_[True, day[1:] != day[:-1]])
        lens = np.diff(np.append(starts, len(day)))
        out_d, out_n, out_p = [], [], []
        for s, L in zip(starts, lens):
            cc = cnt[s:s + L]
            tot = int(cc.sum())
            k = (19 * tot + 19) // 20
            pos = int(np.searchsorted(np.cumsum(cc), k))
            out_d.append(int(day[s]))
            out_n.append(tot)
            out_p.append(int(c[s + pos]))
        days = np.array(out_d, dtype="datetime64[D]")
        return pa.table({
            "day": pa.array(np.datetime_as_string(days, unit="D"),
                            type=pa.string()),
            "n": pa.array(np.array(out_n, dtype=np.int64)),
            "p95_c": pa.array(np.array(out_p, dtype=np.int64)),
        })

    return (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


def sql_daily_p95() -> str:
    return """
WITH h AS MATERIALIZED (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
    CAST(floor(value * 100) AS BIGINT) AS c, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
cum AS MATERIALIZED (
  SELECT day, c,
    SUM(n) OVER (PARTITION BY day ORDER BY c) AS cn,
    SUM(n) OVER (PARTITION BY day) AS tot
  FROM h
)
SELECT day, CAST(MAX(tot) AS BIGINT) AS n,
  MIN(CASE WHEN cn >= (19 * tot + 19) // 20 THEN c END) AS p95_c
FROM cum GROUP BY day
"""


# ---------------------------------------------------------------------------
# Fixed-width binary record source
# ---------------------------------------------------------------------------

BINREC_N = 60000
BINREC_SHARDS = 8
BINREC_DIR = "/tmp/graft_binrec"


def _write_binrec_fixture():
    """Deterministic packed little-endian records (id:i64, v:i64
    micros) across BINREC_SHARDS files — v = splitmix64(id) % 10^9."""
    import os

    from rhealpixdggs_py_ray.fixtures import splitmix64

    marker = os.path.join(BINREC_DIR, f".done_{BINREC_N}_{BINREC_SHARDS}")
    if os.path.exists(marker):
        return
    os.makedirs(BINREC_DIR, exist_ok=True)
    per = BINREC_N // BINREC_SHARDS
    for s in range(BINREC_SHARDS):
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        v = (splitmix64(ids.astype(np.uint64))
             % np.uint64(1_000_000_000)).astype(np.int64)
        rec = np.empty((per, 2), dtype="<i8")
        rec[:, 0] = ids
        rec[:, 1] = v
        with open(os.path.join(BINREC_DIR, f"part-{s:03d}.bin"), "wb") as f:
            f.write(rec.tobytes())
    open(marker, "w").close()


def q_binary_source(sf_dir: str):
    """Fixed-width binary record source: raw shard files read with
    ``ray.data.read_binary_files`` (one row per file, bytes column),
    parsed zero-copy with np.frombuffer inside map_batches, then a
    tiny modulo-bucket aggregate.  The byte-level connector shape for
    proprietary record formats at 100 TB: one read task per shard,
    parse vectorized, nothing but partials shuffles."""
    _write_binrec_fixture()
    ds = ray.data.read_binary_files(BINREC_DIR, file_extensions=["bin"])

    def parse(batch: pa.Table) -> pa.Table:
        outs_k, outs_n, outs_s = [], [], []
        for blob in batch["bytes"].to_pylist():
            rec = np.frombuffer(blob, dtype="<i8").reshape(-1, 2)
            ids, v = rec[:, 0], rec[:, 1]
            k = ids % 7
            uq, inv = np.unique(k, return_inverse=True)
            n = np.bincount(inv, minlength=len(uq)).astype(np.int64)
            sv = np.zeros(len(uq), dtype=np.int64)
            np.add.at(sv, inv, v)
            outs_k.append(uq)
            outs_n.append(n)
            outs_s.append(sv)
        return pa.table({
            "k": pa.array(np.concatenate(outs_k)),
            "n": pa.array(np.concatenate(outs_n)),
            "sum_v": pa.array(np.concatenate(outs_s)),
        })

    part = ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
    return part.groupby("k").aggregate(
        Sum("n", alias_name="n"), Sum("sum_v", alias_name="sum_v"))


def sql_binary_source() -> str:
    # the records are generated from the same splitmix64 formula the
    # fixture wrote, so the oracle replays the rule over a series
    _write_binrec_fixture()
    sm = oracle.splitmix64_sql_ctes(
        f"SELECT unnest(generate_series(0, {BINREC_N - 1})) AS id",
        "id", "id", "h", prefix="bsm")
    return f"""
SELECT CAST(id % 7 AS BIGINT) AS k,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(h % 1000000000 AS BIGINT)) AS BIGINT) AS sum_v
FROM {sm} t GROUP BY 1
"""


# ---------------------------------------------------------------------------
# SimHash near-dup clusters (band LSH + Hamming verify + cc)
# ---------------------------------------------------------------------------

SIMHAM_MAX = 8


def q_simhash_clusters(sf_dir: str):
    """SimHash near-dup clusters, completing the dedup-family symmetry
    (minhash and phash both have cluster steps): 64-bit simhash ->
    4x16-bit band candidates (signatures ride the band rows, 16 bytes)
    -> exact Hamming verify inside the band bucket -> per-pair dedup
    (min over the duplicate band hits) -> connected components.
    Output (doc_id, cluster_id, keep)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.cc import connected_components
    from rhealpixdggs_py_ray.ops.dedup import SimHasher

    nb = 8
    sigs = sizing.stateful_map(
        _docs(sf_dir), SimHasher, batch_format="pyarrow",
        zero_copy_batch=True)

    def bands(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        hi = batch["sim_hi"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo = batch["sim_lo"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sig = (hi << np.uint64(32)) | lo
        t_l, b_l, d_l, s_l = [], [], [], []
        for t in range(4):
            bk = ((sig >> np.uint64(16 * t)) & np.uint64(0xFFFF)).astype(np.int64)
            key = np.int64(t) * np.int64(1 << 16) + bk
            t_l.append(key)
            d_l.append(d)
            s_l.append(sig)
        key = np.concatenate(t_l)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(key.astype(np.uint64), nb)),
            "bandkey": pa.array(key),
            "doc_id": pa.array(np.concatenate(d_l)),
            "sig": pa.array(np.concatenate(s_l)),
        })

    def cand_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "bandkey" not in g.column_names:
            return pa.table({"pkey": pa.array([], type=pa.uint64()),
                             "ham": pa.array([], type=pa.int64())})
        bk = g["bandkey"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        sig = g["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((d, bk))
        bk, d, sig = bk[order], d[order], sig[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        lens = np.diff(np.append(starts, len(bk)))
        pk_l, hm_l = [], []
        for s, L in zip(starts, lens):
            if L < 2:
                continue
            dd = d[s:s + L]
            ss = sig[s:s + L]
            i, j = np.triu_indices(L, k=1)
            x = ss[i] ^ ss[j]
            ham = np.zeros(len(x), dtype=np.int64)
            for b in range(64):
                ham += ((x >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            keep = (ham <= SIMHAM_MAX) & (dd[i] != dd[j])
            a = np.minimum(dd[i][keep], dd[j][keep]).astype(np.uint64)
            b2 = np.maximum(dd[i][keep], dd[j][keep]).astype(np.uint64)
            if len(b2) and int(b2.max()) >= (1 << 32):
                raise AssertionError(
                    "simhash pair packing overflow (doc id >= 2^32)")
            pk_l.append(a * np.uint64(1 << 32) + b2)
            hm_l.append(ham[keep])
        if not pk_l:
            return pa.table({"pkey": pa.array([], type=pa.uint64()),
                             "ham": pa.array([], type=pa.int64())})
        return pa.table({"pkey": pa.array(np.concatenate(pk_l)),
                         "ham": pa.array(np.concatenate(hm_l))})

    cand = (
        sigs.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(cand_pairs, batch_format="pyarrow")
    )

    def dedup_key(batch: pa.Table) -> pa.Table:
        pk = batch["pkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array(hash_bucket_u64(pk, nb)))

    def dedup_reduce(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "pkey" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        pk = g["pkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        uq = np.unique(pk)
        return pa.table({
            "a": pa.array((uq >> np.uint64(32)).astype(np.int64)),
            "b": pa.array((uq & np.uint64((1 << 32) - 1)).astype(np.int64)),
        })

    pairs = (
        cand.map_batches(dedup_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(dedup_reduce, batch_format="pyarrow")
    )
    return connected_components(pairs)


def sql_simhash_clusters() -> str:
    from rhealpixdggs_py_ray.ops import cc, dedup

    sig = dedup.simhash_sql()
    pairs = f"""
WITH ssig AS MATERIALIZED ({sig}),
sfull AS MATERIALIZED (
  SELECT doc_id,
    CAST(sim_hi AS UBIGINT) * 4294967296 + CAST(sim_lo AS UBIGINT) AS sig
  FROM ssig
),
sbands AS MATERIALIZED (
  SELECT doc_id, sig, t.t AS t,
    CAST((sig >> CAST(16 * t.t AS UBIGINT)) & 65535 AS BIGINT) AS bkey
  FROM sfull, (SELECT unnest(generate_series(0, 3)) AS t) t
)
SELECT DISTINCT least(l.doc_id, r.doc_id) AS a,
  greatest(l.doc_id, r.doc_id) AS b
FROM sbands l JOIN sbands r
  ON l.t = r.t AND l.bkey = r.bkey AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.sig, r.sig)) <= {SIMHAM_MAX}
"""
    return cc.connected_components_sql(pairs)


TILE_CHANGE_SPLIT = "2024-01-16"


def q_tile_change(sf_dir: str):
    """Spatiotemporal change detection: per res-2 tile, event counts
    before/after the split date and the signed delta — the
    monitoring diff that drives re-tiling and anomaly review.  One
    pass, one tiny tile aggregate (side packed into the partial)."""
    from rhealpixdggs_py_ray.core import index as cidx

    split = np.datetime64(TILE_CHANGE_SPLIT, "us")
    ds = _read(sf_dir, "events", columns=["event_id", "ts"], blocks=4)

    def part(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = su.to_string_fixed(u, TILE_RES)
        after = (ts >= split).astype(np.int64)
        df = pd.DataFrame({"t": tile, "a": after})
        g = df.groupby(["t", "a"], sort=False).size().reset_index(name="n")
        return pa.table({
            "tile_id": pa.array(g["t"].to_numpy(), type=pa.string()),
            "n_before": pa.array(
                np.where(g["a"].to_numpy() == 0, g["n"].to_numpy(), 0
                         ).astype(np.int64)),
            "n_after": pa.array(
                np.where(g["a"].to_numpy() == 1, g["n"].to_numpy(), 0
                         ).astype(np.int64)),
        })

    out = (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile_id")
        .aggregate(Sum("n_before", alias_name="n_before"),
                   Sum("n_after", alias_name="n_after"))
    )

    def delta(batch: pa.Table) -> pa.Table:
        nb_ = batch["n_before"].to_numpy(zero_copy_only=False)
        na_ = batch["n_after"].to_numpy(zero_copy_only=False)
        return pa.table({
            "tile_id": batch["tile_id"],
            "n_before": pa.array(nb_), "n_after": pa.array(na_),
            "delta": pa.array(na_ - nb_),
        })

    return out.map_batches(delta, batch_format="pyarrow", zero_copy_batch=True)


def sql_tile_change() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
SELECT t.cell_id AS tile_id,
  CAST(SUM(CASE WHEN e.ts < TIMESTAMP '{TILE_CHANGE_SPLIT}' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_before,
  CAST(SUM(CASE WHEN e.ts >= TIMESTAMP '{TILE_CHANGE_SPLIT}' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_after,
  CAST(SUM(CASE WHEN e.ts >= TIMESTAMP '{TILE_CHANGE_SPLIT}' THEN 1 ELSE -1 END)
    AS BIGINT) AS delta
FROM {inner} t JOIN events e ON e.event_id = t.event_id
GROUP BY 1
"""


Q3_DATE = "1998-06-15"


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape end-to-end: orders placed before Q3_DATE joined
    to lineitems shipped after it, per-order revenue, global top-10 by
    (revenue DESC, orderkey).  Both narrow filtered sides meet in ONE
    union bucket exchange on h(orderkey); each bucket emits only its
    local top-10, the driver merges 8x10 rows.  Output (rank,
    o_orderkey, revenue_c)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    D = np.datetime64(Q3_DATE, "us")
    nb = 8
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"], blocks=4)
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"],
               blocks=4)

    def li_side(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]")
        m = ship > D
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        d = batch["l_discount"].to_numpy(zero_copy_only=False)[m]
        r = np.floor(p * (1 - d) * 100).astype(np.int64)
        uq, inv = np.unique(k, return_inverse=True)
        rev = np.zeros(len(uq), dtype=np.int64)
        np.add.at(rev, inv, r)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uq.astype(np.uint64), nb)),
            "side": pa.array(np.zeros(len(uq), dtype=np.int64)),
            "key": pa.array(uq.astype(np.int64)),
            "rev": pa.array(rev),
        })

    def od_side(batch: pa.Table) -> pa.Table:
        odt = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]")
        m = odt < D
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)[m]
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(k.astype(np.uint64), nb)),
            "side": pa.array(np.ones(len(k), dtype=np.int64)),
            "key": pa.array(k.astype(np.int64)),
            "rev": pa.array(np.zeros(len(k), dtype=np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"o_orderkey": pa.array([], type=pa.int64()),
                             "revenue_c": pa.array([], type=pa.int64())})
        side = g["side"].to_numpy(zero_copy_only=False)
        key = g["key"].to_numpy(zero_copy_only=False)
        rev = g["rev"].to_numpy(zero_copy_only=False)
        lk, lr = key[side == 0], rev[side == 0]
        ok = np.unique(key[side == 1])
        uq, inv = np.unique(lk, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, lr)
        if len(ok):
            pos = np.clip(np.searchsorted(ok, uq), 0, len(ok) - 1)
            m = ok[pos] == uq
        else:
            m = np.zeros(len(uq), dtype=bool)
        uq, s = uq[m], s[m]
        order = np.lexsort((uq, -s))[:10]  # local top-10
        return pa.table({"o_orderkey": pa.array(uq[order]),
                         "revenue_c": pa.array(s[order])})

    merged = (
        li.map_batches(li_side, batch_format="pyarrow", zero_copy_batch=True)
        .union(od.map_batches(od_side, batch_format="pyarrow",
                              zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    ).to_pandas()  # <= nb*10 rows
    order = np.lexsort((merged["o_orderkey"].to_numpy(),
                        -merged["revenue_c"].to_numpy()))[:10]
    top = merged.iloc[order]
    return pa.table({
        "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
        "o_orderkey": pa.array(top["o_orderkey"].to_numpy().astype(np.int64)),
        "revenue_c": pa.array(top["revenue_c"].to_numpy().astype(np.int64)),
    })


def sql_shipping_priority() -> str:
    return f"""
WITH r AS MATERIALIZED (
  SELECT l.l_orderkey AS o_orderkey,
    SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
      AS revenue_c
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_shipdate > TIMESTAMP '{Q3_DATE}'
    AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
  GROUP BY 1
)
SELECT row_number() OVER (ORDER BY revenue_c DESC, o_orderkey) AS rank,
  o_orderkey, CAST(revenue_c AS BIGINT) AS revenue_c
FROM r ORDER BY rank LIMIT 10
"""


# ---------------------------------------------------------------------------
# Round-4 LLM-pipeline additions: Gopher-style quality gate, corpus
# bigram-LM scoring (the perplexity-filter shape), product quantization.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "a", "and", "of")  # presence, not frequency


def q_gopher_rules(sf_dir: str):
    """Gopher/C4-style composite quality gate (Rae et al. 2021 §A1.1
    repertoire, re-expressed with exact-integer rules so the oracle is
    bit-free): per doc — word count in [3, 10000]; mean word length in
    [3, 10] (as 3*n_words <= n_word_chars <= 10*n_words, no float
    division); symbol-to-word ratio <= 0.1 (10*(n_hash + n_ellipsis)
    <= n_words); >= 80 % of words contain an alphabetic char
    (5*n_alpha_words >= 4*n_words); and at least 2 distinct stopwords
    present.  Pure map over documents.  Output (doc_id, n_words, five
    rule flags, pass_gate)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_words = np.zeros(n, dtype=np.int64)
        n_wchars = np.zeros(n, dtype=np.int64)
        n_sym = np.zeros(n, dtype=np.int64)
        n_alpha = np.zeros(n, dtype=np.int64)
        n_stop = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            n_words[i] = len(toks)
            n_wchars[i] = sum(len(w) for w in toks)
            n_sym[i] = t.count("#") + t.count("...")
            n_alpha[i] = sum(
                1 for w in toks
                if any(("a" <= c <= "z") or ("A" <= c <= "Z") for c in w))
            padded = f" {t} "
            n_stop[i] = sum(1 for w in GOPHER_STOPWORDS if f" {w} " in padded)
        r_words = ((n_words >= 3) & (n_words <= 10000)).astype(np.int64)
        r_mean = ((3 * n_words <= n_wchars)
                  & (n_wchars <= 10 * n_words)).astype(np.int64)
        r_symbol = (10 * n_sym <= n_words).astype(np.int64)
        r_alpha = (5 * n_alpha >= 4 * n_words).astype(np.int64)
        r_stop = (n_stop >= 2).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "r_words": pa.array(r_words),
            "r_mean": pa.array(r_mean),
            "r_symbol": pa.array(r_symbol),
            "r_alpha": pa.array(r_alpha),
            "r_stop": pa.array(r_stop),
            "pass_gate": pa.array(
                r_words & r_mean & r_symbol & r_alpha & r_stop),
        })

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def sql_gopher_rules() -> str:
    stop = " + ".join(
        f"CASE WHEN contains(p, ' {w} ') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPWORDS)
    nw = ("CASE WHEN trim(text) = '' THEN 0 ELSE"
          " CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"
          " END")
    nalpha = ("CASE WHEN trim(text) = '' THEN 0 ELSE"
              " CAST(length(list_filter(regexp_split_to_array(trim(text),"
              " '\\s+'), w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) END")
    return f"""
WITH p AS MATERIALIZED (
  SELECT doc_id, text, ' ' || text || ' ' AS p FROM documents
), f AS MATERIALIZED (
  SELECT doc_id,
    {nw} AS n_words,
    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_wchars,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
      AS n_sym,
    {nalpha} AS n_alpha,
    CAST({stop} AS BIGINT) AS n_stop
  FROM p
), r AS MATERIALIZED (
  SELECT doc_id, n_words,
    CASE WHEN n_words >= 3 AND n_words <= 10000 THEN 1 ELSE 0 END AS r_words,
    CASE WHEN 3 * n_words <= n_wchars AND n_wchars <= 10 * n_words
      THEN 1 ELSE 0 END AS r_mean,
    CASE WHEN 10 * n_sym <= n_words THEN 1 ELSE 0 END AS r_symbol,
    CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS r_alpha,
    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
  FROM f
)
SELECT doc_id, n_words,
  CAST(r_words AS BIGINT) AS r_words, CAST(r_mean AS BIGINT) AS r_mean,
  CAST(r_symbol AS BIGINT) AS r_symbol, CAST(r_alpha AS BIGINT) AS r_alpha,
  CAST(r_stop AS BIGINT) AS r_stop,
  CAST(r_words * r_mean * r_symbol * r_alpha * r_stop AS BIGINT) AS pass_gate
FROM r
"""


BG_SCALE = 1_000_000_000  # per-bigram score quantum: (1e9 * nb) // nf
BG_PACK = 1 << 21         # unicode code points < 2^21 pack into u64


def _bigram_pairs(texts: list[str]):
    """All adjacent char-pair codes over a batch of texts, vectorized
    via the (n, max_len) code matrix (the Fingerprinter layout).
    Returns (doc_index, packed_bigram) int64 arrays."""
    n = len(texts)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    mx = max(int(lens.max()), 2)
    codes = np.zeros((n, mx), dtype=np.int64)
    for i, t in enumerate(texts):
        if t:
            codes[i, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32)
    valid = np.arange(mx - 1)[None, :] < (lens - 1)[:, None]
    packed = codes[:, :-1] * BG_PACK + codes[:, 1:]
    di, pj = np.nonzero(valid)
    return di, packed[di, pj]


def _train_bigram_lm(sf_dir: str):
    """Phase 1 of the perplexity-filter shape: distributed char-bigram
    counts over the whole corpus (per-batch np.unique partials -> one
    u64-bucket exchange), gathered to a charset^2-bounded table.
    Returns (sorted packed keys, per-bigram quantized score q(b) =
    (BG_SCALE * count(b)) // count(first_char_position(b)))."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "documents", columns=["text"], blocks=4)

    def part(batch: pa.Table) -> pa.Table:
        _di, bg = _bigram_pairs(batch["text"].to_pylist())
        uq, cnt = np.unique(bg, return_counts=True)
        return pa.table({"bg": pa.array(uq.astype(np.uint64)),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = sum_by_u64_key(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        "bg", "n", "nb", n_buckets=8)
    keys_l, nb_l = [], []
    for b in counts.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            keys_l.append(b["bg"].to_numpy(zero_copy_only=False))
            nb_l.append(b["nb"].to_numpy(zero_copy_only=False))
    keys = np.concatenate(keys_l).astype(np.int64) if keys_l else np.zeros(0, np.int64)
    nb = np.concatenate(nb_l) if nb_l else np.zeros(0, np.int64)
    # broadcast table is charset^2-bounded; guard the bound AND the
    # BG_SCALE * nb packing headroom explicitly
    assert len(keys) < (1 << 22), "bigram table exceeded broadcast bound"
    assert nb.max(initial=0) < (1 << 62) // BG_SCALE, "bigram count overflow"
    order = np.argsort(keys)
    keys, nb = keys[order], nb[order]
    first = keys // BG_PACK
    fu, fi = np.unique(first, return_inverse=True)
    nf = np.zeros(len(fu), dtype=np.int64)
    np.add.at(nf, fi, nb)
    q = (BG_SCALE * nb) // nf[fi]
    return keys, q


def q_bigram_score(sf_dir: str):
    """Corpus bigram language-model scoring (the perplexity-filter
    shape of CCNet/Gopher, with an exact-integer likelihood instead of
    a float log-prob): train char-bigram counts over the WHOLE corpus
    (one bounded exchange), broadcast the model via ray.put, then a
    pure map scores every doc as the order-free integer sum of q(b)
    over its bigram occurrences.  Output (doc_id, n_bigrams, score)."""
    keys, q = _train_bigram_lm(sf_dir)
    model_ref = ray.put((keys, q))
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        mkeys, mq = ray.get(model_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        di, bg = _bigram_pairs(batch["text"].to_pylist())
        pos = np.searchsorted(mkeys, bg)  # every bigram is in-corpus
        n_bg = np.zeros(len(ids), dtype=np.int64)
        np.add.at(n_bg, di, 1)
        sc = np.zeros(len(ids), dtype=np.int64)
        np.add.at(sc, di, mq[pos])
        return pa.table({
            "doc_id": pa.array(ids),
            "n_bigrams": pa.array(n_bg),
            "score": pa.array(sc),
        })

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def sql_bigram_score() -> str:
    return f"""
WITH bg AS MATERIALIZED (
  SELECT doc_id,
    unnest([substr(text, i, 2) for i in generate_series(1, length(text) - 1)])
      AS b
  FROM documents WHERE length(text) >= 2
), cb AS MATERIALIZED (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM bg GROUP BY b
), cf AS MATERIALIZED (
  SELECT substr(b, 1, 1) AS c, CAST(SUM(nb) AS BIGINT) AS nf
  FROM cb GROUP BY substr(b, 1, 1)
), qt AS MATERIALIZED (
  SELECT b, ({BG_SCALE} * nb) // nf AS qv
  FROM cb JOIN cf ON substr(cb.b, 1, 1) = cf.c
), sc AS MATERIALIZED (
  SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
    CAST(SUM(qv) AS BIGINT) AS score
  FROM bg JOIN qt USING (b) GROUP BY bg.doc_id
)
SELECT d.doc_id,
  COALESCE(sc.n_bigrams, 0) AS n_bigrams,
  COALESCE(sc.score, 0) AS score
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""


PQ_M, PQ_K, PQ_D = 4, 8, 16  # 4 subspaces x 16 dims, 8 codes each


def _pq_codebook() -> np.ndarray:
    """Deterministic (M, K, D) codebook on the 1/64 lattice: every
    centroid coordinate is ((k*37 + j*11 + s*5) % 16 - 7.5) / 32 — a
    multiple of 1/64, exact in binary, so the SQL mirror reproduces it
    bit-identically from the same closed form."""
    s = np.arange(PQ_M)[:, None, None]
    k = np.arange(PQ_K)[None, :, None]
    j = np.arange(PQ_D)[None, None, :]
    return (((k * 37 + j * 11 + s * 5) % 16) - 7.5) / 32.0


def q_pq_encode(sf_dir: str):
    """Product-quantization encode (Jégou et al. 2011, the
    vector-store compression step): split each 64-dim embedding into
    4 subspaces of 16 dims, assign each to the nearest of 8
    deterministic codebook centroids, pack the 4 codes base-8, and
    report the total quantized reconstruction error.  Distances are
    order-free integer sums of floor((x-c)^2 * 1e12) so the argmin and
    the error are exactly replayable in SQL.  Pure map over
    embeddings.  Output (vec_id, pq_code, err_q)."""
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    C = _pq_codebook()  # (M, K, D)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        M = _emb_matrix(batch)
        n = M.shape[0]
        if n == 0:
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "pq_code": pa.array([], type=pa.int64()),
                             "err_q": pa.array([], type=pa.int64())})
        X = M.reshape(n, PQ_M, 1, PQ_D)          # (n, M, 1, D)
        d = X - C[None, :, :, :]                 # (n, M, K, D)
        t = np.floor((d * d) * 1e12).astype(np.int64)
        D = t.sum(axis=3)                        # (n, M, K) int64
        code = np.argmin(D, axis=2)              # first-min == lowest k
        dmin = np.take_along_axis(D, code[:, :, None], axis=2)[:, :, 0]
        w = (PQ_K ** np.arange(PQ_M - 1, -1, -1)).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids),
            "pq_code": pa.array(code @ w),
            "err_q": pa.array(dmin.sum(axis=1)),
        })

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def sql_pq_encode() -> str:
    c_expr = ("(CAST((k * 37 + j * 11 + s * 5) % 16 AS DOUBLE)"
              f" - {oracle._lit(7.5)}) / {oracle._lit(32.0)}")
    x_expr = f"CAST(embedding[s * {PQ_D} + j + 1] AS DOUBLE)"
    pack = " ".join(
        f"WHEN {s} THEN {PQ_K ** (PQ_M - 1 - s)}" for s in range(PQ_M))
    return f"""
WITH t AS MATERIALIZED (
  SELECT vec_id, s, k,
    CAST(SUM(CAST(floor((({x_expr} - {c_expr}) * ({x_expr} - {c_expr}))
      * {oracle._lit(1e12)}) AS BIGINT)) AS BIGINT) AS d
  FROM embeddings
  CROSS JOIN generate_series(0, {PQ_M - 1}) su(s)
  CROSS JOIN generate_series(0, {PQ_K - 1}) ku(k)
  CROSS JOIN generate_series(0, {PQ_D - 1}) ju(j)
  GROUP BY vec_id, s, k
), m AS MATERIALIZED (
  SELECT vec_id, s, MIN(d) AS dmin FROM t GROUP BY vec_id, s
), cd AS MATERIALIZED (
  SELECT t.vec_id, t.s, CAST(MIN(t.k) AS BIGINT) AS code, MIN(t.d) AS d
  FROM t JOIN m ON t.vec_id = m.vec_id AND t.s = m.s AND t.d = m.dmin
  GROUP BY t.vec_id, t.s
)
SELECT vec_id,
  CAST(SUM(code * CASE s {pack} END) AS BIGINT) AS pq_code,
  CAST(SUM(d) AS BIGINT) AS err_q
FROM cd GROUP BY vec_id
"""


COSTD_H = 4        # hop cap == halo width (weights make it a cost cap 4..16)
COSTD_WMOD = 4     # per-cell entry weight 1 + (7*gy + 13*gx) % 4


def q_cost_distance(sf_dir: str):
    """Weighted cost-distance raster (the GIS cost-surface / Dijkstra
    shape): minimum path cost from the seed cells through OCCUPIED
    cells only, where entering lattice cell (gy, gx) costs the
    deterministic integer weight 1 + (7*gy + 13*gx) % 4, over paths of
    at most COSTD_H hops (4-neighborhood, antimeridian wrap).  Same
    halo-exchange shape as q_grid_flood — a <=H-hop path stays within
    Manhattan H of its endpoint, so each tile plus an H-halo runs a
    dense hop-capped Bellman-Ford (Jacobi relaxation, H vectorized
    min-plus sweeps) locally; two exchanges total regardless of H.
    Output (cell_id, cost)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D, T = COSTD_H, FLOOD_T
    n_tx = W // T
    n_ty = side // T
    L = T + 2 * D
    INF = np.int64(1 << 40)

    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        u, ids = u[m], ids[m]
        return pa.table({
            "cell_u64": pa.array(u, type=pa.uint64()),
            "seed": pa.array((ids % FLOOD_SEED_MOD == 0).astype(np.int64)),
        })

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "seed", "n_seed",
    )

    def halo(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nseed = batch["n_seed"].to_numpy(zero_copy_only=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        home_ty = gy // T
        home_tx = gx // T
        tiles, lys, lxs, seeds = [], [], [], []
        for dty in (-1, 0, 1):
            for dtx in (-1, 0, 1):
                ty = home_ty + dty
                tx = (home_tx + dtx) % n_tx
                ok = (ty >= 0) & (ty < n_ty)
                off = ((gx - tx * T + W // 2) % W) - W // 2
                ly = gy - ty * T + D
                lx = off + D
                ok &= (ly >= 0) & (ly < L) & (lx >= 0) & (lx < L)
                tiles.append((ty * n_tx + tx)[ok])
                lys.append(ly[ok])
                lxs.append(lx[ok])
                seeds.append(nseed[ok])
        return pa.table({
            "tile": pa.array(np.concatenate(tiles)),
            "ly": pa.array(np.concatenate(lys)),
            "lx": pa.array(np.concatenate(lxs)),
            "n_seed": pa.array(np.concatenate(seeds)),
        })

    def bellman(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tile" not in g.column_names:
            return pa.table({"cell_id": pa.array([], type=pa.string()),
                             "cost": pa.array([], type=pa.int64())})
        tile = int(g["tile"][0].as_py())
        ty, tx = tile // n_tx, tile % n_tx
        ly = g["ly"].to_numpy(zero_copy_only=False)
        lx = g["lx"].to_numpy(zero_copy_only=False)
        ns = g["n_seed"].to_numpy(zero_copy_only=False)
        # global coords of every local slot (gx wraps at the seam)
        gys = ty * T + np.arange(L) - D
        gxs = (tx * T + np.arange(L) - D) % W
        wgrid = 1 + (7 * gys[:, None] + 13 * gxs[None, :]) % COSTD_WMOD
        occg = np.zeros((L, L), dtype=bool)
        occg[ly, lx] = True
        dist = np.full((L, L), INF, dtype=np.int64)
        dist[ly[ns > 0], lx[ns > 0]] = 0
        for _hop in range(D):
            cand = np.full((L, L), INF, dtype=np.int64)
            cand[1:, :] = np.minimum(cand[1:, :], dist[:-1, :])
            cand[:-1, :] = np.minimum(cand[:-1, :], dist[1:, :])
            cand[:, 1:] = np.minimum(cand[:, 1:], dist[:, :-1])
            cand[:, :-1] = np.minimum(cand[:, :-1], dist[:, 1:])
            cand = np.where(cand >= INF, INF, cand + wgrid)
            dist = np.where(occg, np.minimum(dist, cand), INF)
        hy, hx = np.nonzero((dist < INF)
                            & (np.arange(L)[:, None] >= D)
                            & (np.arange(L)[:, None] < T + D)
                            & (np.arange(L)[None, :] >= D)
                            & (np.arange(L)[None, :] < T + D))
        gy_out = ty * T + hy - D
        gx_out = (tx * T + hx - D) % W
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy_out, gx_out, k),
                type=pa.string()),
            "cost": pa.array(dist[hy, hx]),
        })

    return (
        occ.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile")
        .map_groups(bellman, batch_format="pyarrow")
    )


def sql_cost_distance() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    return f"""
WITH RECURSIVE cidx AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
cocc AS MATERIALIZED (
  SELECT DISTINCT {gy} AS gy, {gx} AS gx FROM cidx
),
cseeds AS MATERIALIZED (
  SELECT DISTINCT {gy} AS gy, {gx} AS gx FROM cidx
  WHERE event_id % {FLOOD_SEED_MOD} = 0
),
cnbr AS MATERIALIZED (
  SELECT gy, gx, gy AS ny, (gx + 1) % {W} AS nx FROM cocc
  UNION ALL SELECT gy, gx, gy, (gx + {W - 1}) % {W} FROM cocc
  UNION ALL SELECT gy, gx, gy + 1, gx FROM cocc
  UNION ALL SELECT gy, gx, gy - 1, gx FROM cocc
),
cadj AS MATERIALIZED (
  SELECT n.gy AS ay, n.gx AS ax, o.gy AS by_, o.gx AS bx,
    1 + (7 * o.gy + 13 * o.gx) % {COSTD_WMOD} AS wt
  FROM cnbr n JOIN cocc o ON o.gy = n.ny AND o.gx = n.nx
),
walk(gy, gx, d, c) AS (
  SELECT gy, gx, 0, 0 FROM cseeds
  UNION
  SELECT a.by_, a.bx, w.d + 1, w.c + a.wt FROM walk w
  JOIN cadj a ON a.ay = w.gy AND a.ax = w.gx
  WHERE w.d < {COSTD_H}
),
cbest AS MATERIALIZED (
  SELECT gy, gx, MIN(c) AS cost FROM walk GROUP BY 1, 2
)
SELECT {rebuild} AS cell_id, CAST(cost AS BIGINT) AS cost FROM cbest
"""


def q_ann_topk_ivfpq(sf_dir: str):
    """IVF-PQ ANN (coarse-quantizer pruning + integer asymmetric-
    distance PQ scan — the FAISS IVFPQ shape); see ops/ann.py
    ann_topk_ivfpq."""
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.ann_topk_ivfpq(emb)


def sql_ann_topk_ivfpq() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.ann_topk_ivfpq_sql()


MMR_NQ = 5      # queries (vec_id < MMR_NQ)
MMR_C = 8       # ANN candidate pool per query
MMR_S = 4       # diversified picks per query
MMR_WR, MMR_WD = 7, 3   # lambda = 0.7 scaled to integers


def q_mmr_rerank(sf_dir: str):
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998,
    the search-result diversification stage): the exact cosine top-C
    pool per query comes from the distributed ann_topk scan; the
    greedy MMR selection then runs over integer-quantized scores —
    rel_q = floor(cos(q, v) * 1e6), sim_q = floor(cos(v, w) * 1e6),
    step score = 7*rel_q - 3*max(sim_q to picked) — so every pick
    (ties -> smaller vec_id) replays exactly in SQL.  The rerank pool
    is n_queries x C rows BY CONSTRUCTION (the bounded output of the
    ANN stage), so candidate embeddings are a bounded gather; at
    100 TB only the ann_topk scan touches the corpus.  Output (qid,
    vec_id, step, score)."""
    from rhealpixdggs_py_ray.ops import ann
    from rhealpixdggs_py_ray.ops.ann import _seq_dots, _seq_norm
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cands = ann.ann_topk(emb, n_queries=MMR_NQ, k=MMR_C).to_pandas()
    cand_ids = np.unique(cands["vec_id"].to_numpy())

    def keep(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(vid, cand_ids)))

    # bounded: <= MMR_NQ * MMR_C distinct candidate rows
    rows = emb.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = _seq_norm(M)
    S = _seq_dots(M, M) / (nrm[:, None] * nrm[None, :])
    simq = np.floor(S * 1e6).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}

    out_q, out_v, out_s, out_sc = [], [], [], []
    for qid, g in cands.groupby("qid"):
        vids = g["vec_id"].to_numpy()
        rel = g["cos_micros"].to_numpy().astype(np.int64)
        order = np.argsort(vids)
        vids, rel = vids[order], rel[order]
        picked: list[int] = []
        remaining = list(range(len(vids)))
        for step in range(1, MMR_S + 1):
            best_i, best_score = None, None
            for i in remaining:
                if picked:
                    pen = max(simq[pos[int(vids[i])], pos[int(vids[p])]]
                              for p in picked)
                    sc = MMR_WR * rel[i] - MMR_WD * pen
                else:
                    sc = MMR_WR * rel[i]
                # argmax, ties -> smaller vec_id (remaining is vid-asc)
                if best_score is None or sc > best_score:
                    best_i, best_score = i, sc
            picked.append(best_i)
            remaining.remove(best_i)
            out_q.append(int(qid))
            out_v.append(int(vids[best_i]))
            out_s.append(step)
            out_sc.append(int(best_score))
    return pa.table({
        "qid": pa.array(out_q, type=pa.int64()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "step": pa.array(out_s, type=pa.int64()),
        "score": pa.array(out_sc, type=pa.int64()),
    })


def sql_mmr_rerank() -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)),"
        " i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))"
    )
    nrm = "sqrt(list_sum(list_transform({t}.embedding, x -> CAST(x AS DOUBLE) * x)))"
    # greedy steps unrolled: pick1..pick4, each argmax over the
    # remaining candidates with the integer MMR score
    steps = []
    for s in range(2, MMR_S + 1):
        prev = ", ".join(f"p{j}" for j in range(1, s))
        prev_cte = f"picked{s - 1}"
        steps.append(f"""
rem{s} AS MATERIALIZED (
  SELECT c.qid, c.vec_id, c.rel_q,
    {MMR_WR} * c.rel_q - {MMR_WD} * (
      SELECT MAX(sq.sim_q) FROM simq sq
      JOIN {prev_cte} pk ON pk.qid = c.qid
      WHERE sq.a_id = c.vec_id AND sq.b_id IN ({prev.replace('p', 'pk.pick')})
    ) AS score
  FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM {prev_cte} pk WHERE pk.qid = c.qid
      AND c.vec_id IN ({prev.replace('p', 'pk.pick')})
  )
),
sel{s} AS MATERIALIZED (
  SELECT qid, vec_id, score FROM (
    SELECT qid, vec_id, score,
      row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
    FROM rem{s}
  ) WHERE rn = 1
),
picked{s} AS MATERIALIZED (
  SELECT p.qid, {", ".join(f"p.pick{j}" for j in range(1, s))}, s.vec_id AS pick{s}
  FROM picked{s - 1} p JOIN sel{s} s ON s.qid = p.qid
)""")
    return f"""
WITH b AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
a AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {MMR_NQ}
),
d AS MATERIALIZED (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
    {dot} / ({nrm.format(t='a')} * {nrm.format(t='b')}) AS cos
  FROM a CROSS JOIN b WHERE a.vec_id <> b.vec_id
),
cand AS MATERIALIZED (
  SELECT qid, vec_id, CAST(floor(cos * 1000000.0) AS BIGINT) AS rel_q
  FROM (
    SELECT qid, vec_id, cos,
      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
    FROM d
  ) WHERE rank <= {MMR_C}
),
cids AS MATERIALIZED (SELECT DISTINCT vec_id FROM cand),
simq AS MATERIALIZED (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
    CAST(floor(({dot} / ({nrm.format(t='a')} * {nrm.format(t='b')}))
      * 1000000.0) AS BIGINT) AS sim_q
  FROM (SELECT e.* FROM embeddings e JOIN cids ON cids.vec_id = e.vec_id) a
  CROSS JOIN (SELECT e.* FROM embeddings e JOIN cids ON cids.vec_id = e.vec_id) b
),
sel1 AS MATERIALIZED (
  SELECT qid, vec_id, {MMR_WR} * rel_q AS score FROM (
    SELECT qid, vec_id, rel_q,
      row_number() OVER (PARTITION BY qid ORDER BY rel_q DESC, vec_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
picked1 AS MATERIALIZED (SELECT qid, vec_id AS pick1 FROM sel1),
{",".join(steps)}
SELECT qid, vec_id, CAST(step AS BIGINT) AS step, score FROM (
  SELECT qid, vec_id, 1 AS step, score FROM sel1
  {" ".join(f"UNION ALL SELECT qid, vec_id, {s}, score FROM sel{s}"
             for s in range(2, MMR_S + 1))}
) ORDER BY qid, step
"""


ZORD_SHIFT = 8   # 2^8 morton positions per layout block


def _morton_interleave(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """Bit-interleaved Morton key (gx even bits, gy odd bits), loop
    over 9 static bit positions — mirrored term-for-term in SQL."""
    m = np.zeros(len(gx), dtype=np.int64)
    for b in range(9):
        m += ((gx >> b) & 1) * (4 ** b) + ((gy >> b) & 1) * (2 * 4 ** b)
    return m


def q_zorder_layout(sf_dir: str):
    """Z-order data-layout statistics (the OPTIMIZE ZORDER /
    clustering-for-pruning shape): events map to the res-4 equatorial
    lattice, cells get a bit-interleaved Morton key, and Morton-prefix
    blocks (key >> 8) are the target file layout.  Per block: event
    and distinct-cell counts plus the gx/gy bounding box — the min/max
    column stats a scan planner would prune files with.  Per-batch
    partials collapse to distinct (block, cell) rows before ONE
    h(block)-bucket exchange.  Output (block, n_events, n_cells,
    gx_min, gx_max, gy_min, gy_max)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    k = DISSOLVE_RES
    side = 3 ** k
    nb = 8
    ds = indexed_events(sf_dir, resolution=k)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        u = u[m].astype(np.uint64)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        cell = gy * (4 * side) + gx
        uq, inv = np.unique(cell, return_inverse=True)
        n = np.zeros(len(uq), dtype=np.int64)
        np.add.at(n, inv, 1)
        ugy, ugx = uq // (4 * side), uq % (4 * side)
        block = _morton_interleave(ugx, ugy) >> ZORD_SHIFT
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(
                block.astype(np.uint64), nb)),
            "block": pa.array(block),
            "cell": pa.array(uq),
            "n": pa.array(n),
        })

    def resolve(g: pa.Table) -> pa.Table:
        cols = ["block", "n_events", "n_cells",
                "gx_min", "gx_max", "gy_min", "gy_max"]
        if g.num_rows == 0 or "block" not in g.column_names:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        blk = g["block"].to_numpy(zero_copy_only=False)
        cell = g["cell"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        # same cell may arrive from several batches: collapse first
        cu, cinv = np.unique(cell, return_inverse=True)
        cn = np.zeros(len(cu), dtype=np.int64)
        np.add.at(cn, cinv, n)
        cgy, cgx = cu // (4 * side), cu % (4 * side)
        cblk = np.zeros(len(cu), dtype=np.int64)
        cblk[cinv] = blk  # block is a function of cell
        bu, binv = np.unique(cblk, return_inverse=True)
        ne = np.zeros(len(bu), dtype=np.int64)
        np.add.at(ne, binv, cn)
        nc = np.zeros(len(bu), dtype=np.int64)
        np.add.at(nc, binv, 1)
        gx_min = np.full(len(bu), np.iinfo(np.int64).max)
        gx_max = np.full(len(bu), np.iinfo(np.int64).min)
        gy_min = np.full(len(bu), np.iinfo(np.int64).max)
        gy_max = np.full(len(bu), np.iinfo(np.int64).min)
        np.minimum.at(gx_min, binv, cgx)
        np.maximum.at(gx_max, binv, cgx)
        np.minimum.at(gy_min, binv, cgy)
        np.maximum.at(gy_max, binv, cgy)
        return pa.table({
            "block": pa.array(bu), "n_events": pa.array(ne),
            "n_cells": pa.array(nc),
            "gx_min": pa.array(gx_min), "gx_max": pa.array(gx_max),
            "gy_min": pa.array(gy_min), "gy_max": pa.array(gy_max),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_zorder_layout() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    morton = " + ".join(
        f"((gx // {1 << b}) % 2) * {4 ** b} + ((gy // {1 << b}) % 2) * {2 * 4 ** b}"
        for b in range(9))
    return f"""
WITH zidx AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
), zg AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx FROM zidx
), zb AS MATERIALIZED (
  SELECT gy, gx, ({morton}) // {1 << ZORD_SHIFT} AS block FROM zg
)
SELECT CAST(block AS BIGINT) AS block,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT gy * {W} + gx) AS BIGINT) AS n_cells,
  CAST(MIN(gx) AS BIGINT) AS gx_min, CAST(MAX(gx) AS BIGINT) AS gx_max,
  CAST(MIN(gy) AS BIGINT) AS gy_min, CAST(MAX(gy) AS BIGINT) AS gy_max
FROM zb GROUP BY block
"""


PRIOSAMPLE_K = 50


def q_priority_sample(sf_dir: str):
    """Weighted sample without replacement via integer priority order
    statistics (the bottom-k flavor of Efraimidis-Spirakis / priority
    sampling): priority(doc) = md5_u64(doc_id) // max(n_chars, 1) —
    heavier docs draw proportionally smaller priorities — and the
    global sample is the K smallest (priority, doc_id).  Mergeable
    (bottom-k of per-batch bottom-ks), one tiny exchange of <= K rows
    per batch.  Output (rnk, doc_id, n_chars)."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64_many

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        h = md5_u64_many([str(int(i)) for i in ids])
        prio = (h // np.maximum(nch, 1).astype(np.uint64)).astype(np.uint64)
        sel = np.lexsort((ids, prio))[:PRIOSAMPLE_K]
        return pa.table({
            "prio": pa.array(prio[sel]),
            "doc_id": pa.array(ids[sel]),
            "n_chars": pa.array(nch[sel]),
            "one": pa.array(np.zeros(len(sel), dtype=np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "prio" not in g.column_names:
            return pa.table({"rnk": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "n_chars": pa.array([], type=pa.int64())})
        prio = g["prio"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        nch = g["n_chars"].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ids, prio))[:PRIOSAMPLE_K]
        return pa.table({
            "rnk": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[sel]),
            "n_chars": pa.array(nch[sel]),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("one")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_priority_sample() -> str:
    return (
        "SELECT CAST(row_number() OVER (ORDER BY"
        "   md5_number_lower(CAST(doc_id AS VARCHAR))"
        "     // greatest(CAST(n_chars AS UBIGINT), 1), doc_id)"
        " AS BIGINT) AS rnk, doc_id, n_chars"
        f" FROM documents QUALIFY rnk <= {PRIOSAMPLE_K}"
    )


def q_char_diversity(sf_dir: str):
    """Per-doc character diversity (the gibberish / low-entropy text
    filter, with Gini impurity instead of Shannon entropy so the
    number is a RATIONAL of exact integers — log2 differs by ulps
    between numpy and DuckDB and can flip a floor boundary): distinct
    char count, top char frequency, and gini_e9 = (n^2 - sum cnt^2)
    * 1e9 // n^2.  Pure map.  Output (doc_id, n_distinct, top_cnt,
    gini_e9)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def div(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        nd = np.zeros(len(texts), dtype=np.int64)
        top = np.zeros(len(texts), dtype=np.int64)
        gini = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            _u, cnt = np.unique(codes, return_counts=True)
            n = np.int64(len(codes))
            nd[i] = len(cnt)
            top[i] = cnt.max()
            s2 = np.int64((cnt.astype(np.int64) ** 2).sum())
            gini[i] = ((n * n - s2) * 1_000_000_000) // (n * n)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_distinct": pa.array(nd),
            "top_cnt": pa.array(top),
            "gini_e9": pa.array(gini),
        })

    return ds.map_batches(div, batch_format="pyarrow", zero_copy_batch=True)


def sql_char_diversity() -> str:
    return """
WITH chd AS MATERIALIZED (
  SELECT doc_id,
    unnest([substr(text, i, 1) for i in generate_series(1, length(text))]) AS c
  FROM documents WHERE length(text) > 0
), ccd AS MATERIALIZED (
  SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM chd GROUP BY doc_id, c
), agd AS MATERIALIZED (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
    CAST(MAX(cnt) AS BIGINT) AS top_cnt,
    CAST(SUM(cnt * cnt) AS BIGINT) AS s2, CAST(SUM(cnt) AS BIGINT) AS n
  FROM ccd GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(a.n_distinct, 0) AS n_distinct,
  COALESCE(a.top_cnt, 0) AS top_cnt,
  COALESCE(((a.n * a.n - a.s2) * 1000000000) // (a.n * a.n), 0) AS gini_e9
FROM documents d LEFT JOIN agd a ON a.doc_id = d.doc_id
"""


def q_inverted_index(sf_dir: str):
    """Inverted-index build (the search-engine indexing shape): per
    term — document frequency, total term frequency, and an ORDER-FREE
    posting-list fingerprint (uint64-wraparound sum of
    md5_u64('term:doc:tf') over its postings, split hi/lo), so two
    index replicas compare per-term without shipping postings.
    Per-batch partials collapse each batch's (term, doc, tf) postings
    to one row per term before the single term-bucket exchange — the
    posting table itself never shuffles.  Output (term, df, tf,
    chk_hi, chk_lo)."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        df: dict[str, int] = {}
        tf: dict[str, int] = {}
        chk: dict[str, int] = {}
        for did, t in zip(ids, batch["text"].to_pylist()):
            toks = t.split()
            if not toks:
                continue
            uq, cnt = np.unique(np.asarray(toks, dtype=object),
                                return_counts=True)
            for w, c in zip(uq, cnt):
                df[w] = df.get(w, 0) + 1
                tf[w] = tf.get(w, 0) + int(c)
                h = md5_u64(f"{w}:{int(did)}:{int(c)}")
                chk[w] = (chk.get(w, 0) + h) & 0xFFFFFFFFFFFFFFFF
        terms = np.array(sorted(df.keys()), dtype=object)
        bucket = (pd.util.hash_array(terms) % VOCAB_BUCKETS).astype(np.int64) \
            if len(terms) else np.array([], dtype=np.int64)
        return pa.table({
            "bucket": pa.array(bucket),
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(np.array([df[w] for w in terms], dtype=np.int64)),
            "tf": pa.array(np.array([tf[w] for w in terms], dtype=np.int64)),
            "chk": pa.array(np.array([chk[w] for w in terms],
                                     dtype=np.uint64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        cols = {"term": pa.string(), "df": pa.int64(), "tf": pa.int64(),
                "chk_hi": pa.int64(), "chk_lo": pa.int64()}
        if g.num_rows == 0 or "term" not in g.column_names:
            return pa.table({c: pa.array([], type=t) for c, t in cols.items()})
        terms = g["term"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(terms, return_inverse=True)
        df = np.zeros(len(uq), dtype=np.int64)
        tf = np.zeros(len(uq), dtype=np.int64)
        chk = np.zeros(len(uq), dtype=np.uint64)
        np.add.at(df, inv, g["df"].to_numpy(zero_copy_only=False))
        np.add.at(tf, inv, g["tf"].to_numpy(zero_copy_only=False))
        np.add.at(chk, inv,
                  g["chk"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({
            "term": pa.array(uq, type=pa.string()),
            "df": pa.array(df), "tf": pa.array(tf),
            "chk_hi": pa.array((chk >> np.uint64(32)).astype(np.int64)),
            "chk_lo": pa.array((chk & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_inverted_index() -> str:
    m = str(1 << 64)
    return f"""
WITH iitok AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
), iipost AS MATERIALIZED (
  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM iitok GROUP BY term, doc_id
), iih AS MATERIALIZED (
  SELECT term, doc_id, tf,
    md5_number_lower(term || ':' || CAST(doc_id AS VARCHAR)
      || ':' || CAST(tf AS VARCHAR)) AS h
  FROM iipost
)
SELECT term,
  CAST(COUNT(*) AS BIGINT) AS df,
  CAST(SUM(tf) AS BIGINT) AS tf,
  CAST((SUM(CAST(h AS HUGEINT)) % {m}) // 4294967296 AS BIGINT) AS chk_hi,
  CAST((SUM(CAST(h AS HUGEINT)) % {m}) % 4294967296 AS BIGINT) AS chk_lo
FROM iih GROUP BY term
"""


def _split_of(ids: np.ndarray) -> np.ndarray:
    """md5(doc_id) % 100 -> train/val/test (the q_split_assign rule)."""
    from rhealpixdggs_py_ray.ops.dedup import md5_u64

    h = np.fromiter((md5_u64(str(int(d))) for d in ids), dtype=np.uint64,
                    count=len(ids)) % np.uint64(100)
    return np.where(h < 90, "train", np.where(h < 95, "val", "test"))


def q_split_leakage(sf_dir: str):
    """Train/test contamination audit (the leakage check an eval
    pipeline must run after splitting): verified minhash near-dup
    pairs whose two documents landed in DIFFERENT splits under the
    q_split_assign hash rule.  Reuses the materialized shared pair
    intermediate (_minhash_pairs) — zero extra corpus passes; the
    pair set is tiny, the split rule is a pure map over it.  Output
    (a, b, split_a, split_b, jac_micros)."""
    pairs = _minhash_pairs(sf_dir)

    def leak(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        sa, sb = _split_of(a), _split_of(b)
        m = sa != sb
        return pa.table({
            "a": pa.array(a[m]),
            "b": pa.array(b[m]),
            "split_a": pa.array(sa[m], type=pa.string()),
            "split_b": pa.array(sb[m], type=pa.string()),
            "jac_micros": batch["jac_micros"].filter(pa.array(m)),
        })

    return pairs.map_batches(leak, batch_format="pyarrow",
                             zero_copy_batch=True)


def sql_split_leakage() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    def split(col: str) -> str:
        h = f"CAST(md5_number_lower(CAST({col} AS VARCHAR)) AS HUGEINT) % 100"
        return (f"CASE WHEN {h} < 90 THEN 'train'"
                f" WHEN {h} < 95 THEN 'val' ELSE 'test' END")

    return f"""
WITH lk_pairs AS MATERIALIZED (
  SELECT * FROM ({dedup.minhash_lsh_sql()}) t
)
SELECT a, b, {split('a')} AS split_a, {split('b')} AS split_b, jac_micros
FROM lk_pairs WHERE {split('a')} <> {split('b')}
"""


def q_dedup_keep_best(sf_dir: str):
    """Dedup with representative selection (what a curation pipeline
    actually ships): per near-dup cluster keep the LONGEST member
    (max n_chars, ties -> smaller doc_id) and report cluster size.
    Composition: shared minhash pairs -> connected components (tiny)
    -> broadcast membership -> one pass over documents emitting only
    member rows -> mergeable per-cluster argmax partials -> one
    h(cluster) bucket exchange.  Output (cluster_id, keep_doc,
    n_chars, n_members)."""
    from rhealpixdggs_py_ray.ops import cc
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    clusters = cc.connected_components(_minhash_pairs(sf_dir))
    # bounded: one row per doc that appears in a verified near-dup pair
    rows = clusters.take_all()
    m_ids = np.array([int(r["doc_id"]) for r in rows], dtype=np.int64)
    m_cl = np.array([int(r["cluster_id"]) for r in rows], dtype=np.int64)
    order = np.argsort(m_ids)
    memb_ref = ray.put((m_ids[order], m_cl[order]))
    nb = 8

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        mk, mv = ray.get(memb_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(mk, ids)
        pos = np.minimum(pos, max(len(mk) - 1, 0))
        sel = np.flatnonzero((len(mk) > 0) & (mk[pos] == ids))
        if not len(sel):
            return pa.table({
                "bucket": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
                "n_members": pa.array([], type=pa.int64()),
            })
        cl = mv[pos[sel]]
        ids, nch = ids[sel], nch[sel]
        # per-batch argmax per cluster: (n_chars DESC, doc_id ASC)
        order = np.lexsort((ids, -nch, cl))
        clo = cl[order]
        first = np.r_[True, clo[1:] != clo[:-1]]
        cnt = np.diff(np.r_[np.flatnonzero(first), len(clo)])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(
                clo[first].astype(np.uint64), nb)),
            "cluster_id": pa.array(clo[first]),
            "doc_id": pa.array(ids[order][first]),
            "n_chars": pa.array(nch[order][first]),
            "n_members": pa.array(cnt.astype(np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        cols = ["cluster_id", "keep_doc", "n_chars", "n_members"]
        if g.num_rows == 0 or "cluster_id" not in g.column_names:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        cl = g["cluster_id"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        nch = g["n_chars"].to_numpy(zero_copy_only=False)
        nm = g["n_members"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -nch, cl))
        clo = cl[order]
        first = np.r_[True, clo[1:] != clo[:-1]]
        uq, inv = np.unique(cl, return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, nm)
        return pa.table({
            "cluster_id": pa.array(clo[first]),
            "keep_doc": pa.array(ids[order][first]),
            "n_chars": pa.array(nch[order][first]),
            "n_members": pa.array(tot),  # uq order == clo[first] order
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_dedup_keep_best() -> str:
    return f"""
WITH kb_clusters AS MATERIALIZED (
  SELECT * FROM ({sql_dedup_clusters()}) t
), kb_rank AS MATERIALIZED (
  SELECT c.cluster_id, d.doc_id, d.n_chars,
    row_number() OVER (PARTITION BY c.cluster_id
                       ORDER BY d.n_chars DESC, d.doc_id) AS rn,
    COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM kb_clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id, doc_id AS keep_doc,
  CAST(n_chars AS BIGINT) AS n_chars, CAST(n_members AS BIGINT) AS n_members
FROM kb_rank WHERE rn = 1
"""


def q_ann_recall_pq(sf_dir: str):
    """Recall@k of the IVF-PQ index against exact brute-force cosine —
    the compression-loss eval a vector store runs before switching an
    index to PQ codes.  Same shape as q_ann_recall: both distributed
    pipelines execute concurrently, outputs are Q x k-bounded, the
    compare is a driver-side set intersection."""
    from rhealpixdggs_py_ray.ops import ann

    import concurrent.futures as cf

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    emb2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    with cf.ThreadPoolExecutor(2) as ex:
        fb = ex.submit(lambda: ann.ann_topk(emb).take_all())
        fa = ex.submit(lambda: ann.ann_topk_ivfpq(emb2).take_all())
        brute, approx = fb.result(), fa.result()
    b_by_q: dict[int, set[int]] = {}
    for r in brute:
        b_by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    a_by_q: dict[int, set[int]] = {}
    for r in approx:
        a_by_q.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
    qids = sorted(b_by_q)
    n_brute = np.array([len(b_by_q[q]) for q in qids], dtype=np.int64)
    n_hit = np.array(
        [len(b_by_q[q] & a_by_q.get(q, set())) for q in qids], dtype=np.int64
    )
    return ray.data.from_arrow(pa.table({
        "qid": pa.array(np.array(qids, dtype=np.int64)),
        "n_brute": pa.array(n_brute),
        "n_hit": pa.array(n_hit),
        "recall_micros": pa.array(n_hit * 1_000_000 // n_brute),
    }))


def sql_ann_recall_pq() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return f"""
WITH rb AS MATERIALIZED ({ann.ann_topk_sql()}),
rp AS MATERIALIZED ({ann.ann_topk_ivfpq_sql()}),
rhit AS MATERIALIZED (
  SELECT rb.qid, CAST(COUNT(rp.vec_id) AS BIGINT) AS n_hit
  FROM rb LEFT JOIN rp ON rp.qid = rb.qid AND rp.vec_id = rb.vec_id
  GROUP BY rb.qid
),
rnb AS MATERIALIZED (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_brute FROM rb GROUP BY qid
)
SELECT rnb.qid, rnb.n_brute, rhit.n_hit,
  rhit.n_hit * 1000000 // rnb.n_brute AS recall_micros
FROM rnb JOIN rhit ON rhit.qid = rnb.qid
"""


def q_local_ij(sf_dir: str):
    """cellToLocalIj workalike (h3's experimental local integer
    coordinates): every distinct equatorial-band res-4 cell touched by
    an event maps to its global lattice coordinates (gy = row digits,
    gx = face offset + col digits, wrapping at the antimeridian seam)
    and back — the roundtrip rebuild is the output cell_id, so the
    compare itself proves ij -> cell inverts exactly.  Map + one
    distinct-cell exchange.  Output (cell_id, gi, gj)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        return pa.table({
            "cell_u64": pa.array(u[m], type=pa.uint64()),
            "one": pa.array(np.ones(int(m.sum()), dtype=np.int64)),
        })

    dist = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "n",
    )

    def ij(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy, gx, k), type=pa.string()),
            "gi": pa.array(gy),
            "gj": pa.array(gx),
        })

    return dist.map_batches(ij, batch_format="pyarrow", zero_copy_batch=True)


def sql_local_ij() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    return f"""
WITH ijx AS MATERIALIZED (
  SELECT DISTINCT cell_id FROM {idx_sql} t
)
SELECT cell_id, CAST({gy} AS BIGINT) AS gi, CAST({gx} AS BIGINT) AS gj
FROM ijx
"""


INGEST_MOD, INGEST_RES = 10, 7   # doc_id % 10 == 7 -> "new ingest batch"


def q_dedup_incremental(sf_dir: str):
    """Incremental ingest dedup (the daily-crawl shape: probe the NEW
    batch against the EXISTING corpus index, keep only cross-side
    collisions): verified minhash near-dup pairs with exactly one
    endpoint in the ingest batch (doc_id % 10 == 7).  Composition over
    the shared materialized pair intermediate — zero extra corpus
    passes here; at 100 TB the refinement is a side-aware in-bucket
    pair expansion (index x new only, never index x index), same
    exchanges.  Output (new_doc, index_doc, jac_micros)."""
    pairs = _minhash_pairs(sf_dir)

    def cross(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        na = (a % INGEST_MOD) == INGEST_RES
        nb = (b % INGEST_MOD) == INGEST_RES
        m = na != nb
        new = np.where(na[m], a[m], b[m])
        idx_side = np.where(na[m], b[m], a[m])
        return pa.table({
            "new_doc": pa.array(new),
            "index_doc": pa.array(idx_side),
            "jac_micros": batch["jac_micros"].filter(pa.array(m)),
        })

    return pairs.map_batches(cross, batch_format="pyarrow",
                             zero_copy_batch=True)


def sql_dedup_incremental() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    new = f"(a % {INGEST_MOD} = {INGEST_RES})"
    newb = f"(b % {INGEST_MOD} = {INGEST_RES})"
    return f"""
WITH inc_pairs AS MATERIALIZED (
  SELECT * FROM ({dedup.minhash_lsh_sql()}) t
)
SELECT CASE WHEN {new} THEN a ELSE b END AS new_doc,
  CASE WHEN {new} THEN b ELSE a END AS index_doc,
  jac_micros
FROM inc_pairs WHERE {new} <> {newb}
"""


CLIP_NQ, CLIP_K = 8, 5   # retrieval: 8 query captions, top-5 images


def q_clip_retrieval(sf_dir: str):
    """Text-to-image retrieval over the two-tower features (the CLIP
    retrieval shape): the first CLIP_NQ captions are queries; their
    64-dim token-vote embeddings project through P_txt on the driver
    (bounded: CLIP_NQ rows) and broadcast; every image batch decodes,
    pools and projects through P_img in the actor pool, scores all
    queries with the fold-ordered cosine, and keeps its per-batch
    top-CLIP_K — only ~K rows per (query, batch) reach the per-qid
    resolve.  Output (qid, vec_id, rank, cos_micros)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64, write_images_table
    from rhealpixdggs_py_ray.ops.ann import (
        _final_topk, _partial_topk_table, _seq_dots, _seq_norm)
    from rhealpixdggs_py_ray.ops.dedup import md5_u64_many

    write_images_table(IMG_DIR, IMG_N)
    j = np.arange(64 * CLIP_D, dtype=np.uint64)
    P_txt = (2.0 * ((splitmix64(j + np.uint64(515151)) >> np.uint64(11)
                     ).astype(np.float64) / float(1 << 53)) - 1.0
             ).reshape(64, CLIP_D)
    # query captions via a streaming masked scan (bounded result:
    # CLIP_NQ rows — never a whole-table driver read)
    def qmask(batch: pa.Table) -> pa.Table:
        ids_b = np.array([int(x[3:]) for x in
                          batch["image_id"].to_pylist()], dtype=np.int64)
        return batch.filter(pa.array(ids_b < CLIP_NQ))

    cap_rows = (
        ray.data.read_parquet(IMG_DIR, columns=["image_id", "caption"])
        .map_batches(qmask, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    cap_rows.sort(key=lambda r: int(r["image_id"][3:]))
    qids = np.array([int(r["image_id"][3:]) for r in cap_rows],
                    dtype=np.int64)
    caps = [r["caption"] for r in cap_rows]
    T = np.zeros((len(qids), 64), dtype=np.float64)
    for i, c in enumerate(caps):
        tk = c.split()
        if tk:
            h = md5_u64_many(tk)
            np.add.at(T, (np.full(len(tk), i), (h % np.uint64(64)).astype(np.int64)), 1.0)
    txt = _seq_dots(T, P_txt.T)
    tn = _seq_norm(txt)
    ref = ray.put((qids, txt, tn))

    ds = ray.data.read_parquet(
        IMG_DIR, columns=["image_id", "bytes", "fmt", "w", "h"],
        override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8),
    )

    class RetrScorer:
        def __init__(self):
            i = np.arange(48 * CLIP_D, dtype=np.uint64)
            f = (splitmix64(i + np.uint64(424242)) >> np.uint64(11)
                 ).astype(np.float64) / float(1 << 53)
            self.P_img = (2.0 * f - 1.0).reshape(48, CLIP_D)
            self.qids, self.txt, self.tn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from rhealpixdggs_py_ray.fixtures import decode_image
            from rhealpixdggs_py_ray.ops.multimodal import resize_nearest

            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy(zero_copy_only=False)
            hs = batch["h"].to_numpy(zero_copy_only=False)
            n = len(blobs)
            B = np.empty((n, 48), dtype=np.float64)
            for k in range(n):
                pix = decode_image(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
                small = resize_nearest(pix, 16, 16).astype(np.int64)
                B[k] = small.sum(axis=1).reshape(48).astype(np.float64)
            img = _seq_dots(B, self.P_img.T)          # (n, D)
            S = np.zeros((n, len(self.qids)), dtype=np.float64)
            for d in range(CLIP_D):                   # fold order == SQL
                S = S + img[:, d, None] * self.txt[None, :, d]
            S = S / (_seq_norm(img)[:, None] * self.tn[None, :])
            idx = np.array([int(i[3:]) for i in
                            batch["image_id"].to_pylist()], dtype=np.int64)
            return _partial_topk_table(self.qids, idx, S, CLIP_K)

    # bandwidth-bound decode stage: keep the capped actor pool
    partials = ds.map_batches(
        RetrScorer, batch_format="pyarrow", batch_size=512,
        zero_copy_batch=True, concurrency=sizing.pool(),
    )
    return partials.groupby("qid").map_groups(
        _final_topk(CLIP_K), batch_format="pyarrow")


def sql_clip_retrieval() -> str:
    prefix, num, inrm, tnrm = _clip_sql_parts()
    return f"""
WITH {prefix},
rq AS MATERIALIZED (
  SELECT * FROM ctxt WHERE idx < {CLIP_NQ}
),
rs AS MATERIALIZED (
  SELECT rq.idx AS qid, cimg.idx AS vec_id,
    ({num}) / (sqrt({inrm}) * sqrt({tnrm})) AS s
  FROM cimg CROSS JOIN rq
)
SELECT qid, vec_id,
  row_number() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rank,
  CAST(floor(s * 1000000.0) AS BIGINT) AS cos_micros
FROM rs QUALIFY rank <= {CLIP_K}
"""


def _gi_z(gi, ki, n, sx, sxx):
    """Canonical Gi* z expression — the SAME IEEE op sequence as the
    SQL (sqrt/divide are correctly rounded, all inputs exact ints, so
    the doubles are bit-identical).  s2 <= 0 (constant surface) -> 0."""
    nf = n.astype(np.float64) if hasattr(n, "astype") else float(n)
    xbar = sx / nf
    s2 = sxx / nf - xbar * xbar
    kf = ki.astype(np.float64)
    den = np.sqrt(s2) * np.sqrt((nf * kf - kf * kf) / (nf - 1.0))
    z = np.where(
        (s2 > 0) & (den > 0), (gi.astype(np.float64) - kf * xbar) / np.where(den > 0, den, 1.0), 0.0)
    return z


def q_hotspot_gi(sf_dir: str):
    """Getis-Ord Gi* hotspot detection over the res-4 equatorial
    lattice (the local sibling of q_morans_i): x = per-cell event
    count over the OCCUPIED-cell universe; for each occupied cell,
    gi = 3x3-neighborhood sum of x (seam wrap), ki = occupied
    neighbors, z from the global (n, sum x, sum x^2).  Shape: one
    exact u64 count exchange -> tile+1-halo dense stencil (grid_flood
    template, one more exchange); global stats are a driver fold over
    the counts table, which is BOUNDED by the lattice itself
    (4*3^4 * 3^4 = 26,244 cells max at any data scale).  Output
    (cell_id, gi, ki, z_micros)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D, T = 1, FLOOD_T
    n_tx, n_ty = W // T, side // T
    L = T + 2 * D

    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        return pa.table({
            "cell_u64": pa.array(u[m], type=pa.uint64()),
            "one": pa.array(np.ones(int(m.sum()), dtype=np.int64)),
        })

    counts = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "x",
    ).materialize()  # two consumers: global stats + stencil

    # global stats: lattice-bounded (<= 26,244 rows)
    n_tot, sx, sxx = 0, 0, 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            xv = b["x"].to_numpy(zero_copy_only=False)
            n_tot += len(xv)
            sx += int(xv.sum())
            sxx += int((xv * xv).sum())

    def halo(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = batch["x"].to_numpy(zero_copy_only=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        home_ty, home_tx = gy // T, gx // T
        tiles, lys, lxs, xs = [], [], [], []
        for dty in (-1, 0, 1):
            for dtx in (-1, 0, 1):
                ty = home_ty + dty
                tx = (home_tx + dtx) % n_tx
                ok = (ty >= 0) & (ty < n_ty)
                off = ((gx - tx * T + W // 2) % W) - W // 2
                ly = gy - ty * T + D
                lx = off + D
                ok &= (ly >= 0) & (ly < L) & (lx >= 0) & (lx < L)
                tiles.append((ty * n_tx + tx)[ok])
                lys.append(ly[ok])
                lxs.append(lx[ok])
                xs.append(x[ok])
        return pa.table({
            "tile": pa.array(np.concatenate(tiles)),
            "ly": pa.array(np.concatenate(lys)),
            "lx": pa.array(np.concatenate(lxs)),
            "x": pa.array(np.concatenate(xs)),
        })

    def stencil(g: pa.Table) -> pa.Table:
        cols = {"cell_id": pa.string(), "gi": pa.int64(), "ki": pa.int64(),
                "z_micros": pa.int64()}
        if g.num_rows == 0 or "tile" not in g.column_names:
            return pa.table({c: pa.array([], type=t) for c, t in cols.items()})
        tile = int(g["tile"][0].as_py())
        ty, tx = tile // n_tx, tile % n_tx
        ly = g["ly"].to_numpy(zero_copy_only=False)
        lx = g["lx"].to_numpy(zero_copy_only=False)
        xv = g["x"].to_numpy(zero_copy_only=False)
        occ = np.zeros((L, L), dtype=bool)
        X = np.zeros((L, L), dtype=np.int64)
        occ[ly, lx] = True
        X[ly, lx] = xv
        giq = np.zeros((L, L), dtype=np.int64)
        kiq = np.zeros((L, L), dtype=np.int64)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                giq += np.roll(np.roll(X, dy, axis=0), dx, axis=1)
                kiq += np.roll(np.roll(occ.astype(np.int64), dy, axis=0),
                               dx, axis=1)
        # np.roll wraps tile-locally which is WRONG at tile borders —
        # but home cells sit >= D from the local edge, so their 3x3
        # window never touches a rolled-in value
        hy, hx = np.nonzero(occ
                            & (np.arange(L)[:, None] >= D)
                            & (np.arange(L)[:, None] < T + D)
                            & (np.arange(L)[None, :] >= D)
                            & (np.arange(L)[None, :] < T + D))
        gy_out = ty * T + hy - D
        gx_out = (tx * T + hx - D) % W
        gi = giq[hy, hx]
        ki = kiq[hy, hx]
        z = _gi_z(gi, ki, n_tot, float(sx), float(sxx))
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy_out, gx_out, k),
                type=pa.string()),
            "gi": pa.array(gi),
            "ki": pa.array(ki),
            "z_micros": pa.array(np.floor(z * 1e6).astype(np.int64)),
        })

    return (
        counts.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile")
        .map_groups(stencil, batch_format="pyarrow")
    )


def sql_hotspot_gi() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    return f"""
WITH hidx AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
hx AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx, CAST(COUNT(*) AS BIGINT) AS x
  FROM hidx GROUP BY 1, 2
),
hglob AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
    CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM hx
),
hoff AS MATERIALIZED (
  SELECT dy.dy, dx.dx FROM
    (SELECT unnest(generate_series(-1, 1)) AS dy) dy,
    (SELECT unnest(generate_series(-1, 1)) AS dx) dx
),
hnb AS MATERIALIZED (
  SELECT h.gy AS hy, h.gx AS hx2,
    CAST(SUM(o.x) AS BIGINT) AS gi, CAST(COUNT(*) AS BIGINT) AS ki
  FROM hx h
  JOIN hoff f ON TRUE
  JOIN hx o ON o.gy = h.gy + f.dy
    AND o.gx = ((h.gx + f.dx) % {W} + {W}) % {W}
  GROUP BY 1, 2
),
hz AS MATERIALIZED (
  SELECT hy AS gy, hx2 AS gx, gi, ki,
    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS s2,
    CAST(n AS DOUBLE) AS nf, CAST(ki AS DOUBLE) AS kf
  FROM hnb, hglob
)
SELECT {rebuild} AS cell_id, gi, ki,
  CAST(floor(CASE WHEN s2 > 0
    AND sqrt(s2) * sqrt((nf * kf - kf * kf) / (nf - {oracle._lit(1.0)})) > 0
    THEN (CAST(gi AS DOUBLE) - kf * xbar)
      / (sqrt(s2) * sqrt((nf * kf - kf * kf) / (nf - {oracle._lit(1.0)})))
    ELSE {oracle._lit(0.0)} END * {oracle._lit(1e6)}) AS BIGINT) AS z_micros
FROM hz
"""


SNAP_LINE = [(-58.37, -17.23), (-21.64, 6.91), (12.58, -4.47),
             (41.19, 13.77), (58.83, 1.29)]   # equatorial band, non-integer
SNAP_R2 = 4.0e12   # snap radius^2 in m^2 (2,000 km)


def _snap_segments():
    """Driver-side projected polyline segments as exact float64
    constants: (ax, ay, dxab, dyab, len2) per segment.  The SQL embeds
    these via repr literals (shortest-round-trip parse is bit-exact),
    so both sides snap against the IDENTICAL planar geometry."""
    from rhealpixdggs_py_ray.core import projection as proj

    lon = np.array([p[0] for p in SNAP_LINE], dtype=np.float64)
    lat = np.array([p[1] for p in SNAP_LINE], dtype=np.float64)
    vx, vy = proj.forward(CFG, lon, lat)
    segs = []
    for i in range(len(SNAP_LINE) - 1):
        ax, ay = float(vx[i]), float(vy[i])
        dxab, dyab = float(vx[i + 1] - vx[i]), float(vy[i + 1] - vy[i])
        segs.append((ax, ay, dxab, dyab, float(dxab * dxab + dyab * dyab)))
    return segs


def q_snap_to_line(sf_dir: str):
    """Map-matching-lite: snap every event within SNAP_R2 of the fixed
    polyline to its nearest segment point in planar rHEALPix meters —
    nearest (d2, seg) wins, t clamped to [0, 1].  Pure map over events
    (the full forward projection runs in-batch); every float op
    mirrors the SQL expression shape exactly, so t/d2 quantizations
    are bit-identical.  Output (event_id, seg, t_e6, d2_sc)."""
    from rhealpixdggs_py_ray.core import projection as proj

    segs = _snap_segments()
    ds = _read(sf_dir, "events", columns=["event_id"])

    def snap(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        px, py = proj.forward(CFG, lon, lat)
        n = len(ids)
        D2 = np.empty((n, len(segs)), dtype=np.float64)
        T = np.empty((n, len(segs)), dtype=np.float64)
        for i, (ax, ay, dxab, dyab, len2) in enumerate(segs):
            t = ((px - ax) * dxab + (py - ay) * dyab) / len2
            t = np.minimum(np.maximum(t, 0.0), 1.0)
            ddx = px - (ax + t * dxab)
            ddy = py - (ay + t * dyab)
            D2[:, i] = ddx * ddx + ddy * ddy
            T[:, i] = t
        seg = np.argmin(D2, axis=1)       # first min == smallest seg
        rows = np.arange(n)
        d2 = D2[rows, seg]
        t = T[rows, seg]
        m = d2 <= SNAP_R2
        return pa.table({
            "event_id": pa.array(ids[m]),
            "seg": pa.array(seg[m].astype(np.int64)),
            "t_e6": pa.array(np.floor(t[m] * 1e6).astype(np.int64)),
            "d2_sc": pa.array(np.floor(d2[m] * 1e-6).astype(np.int64)),
        })

    return ds.map_batches(snap, batch_format="pyarrow", zero_copy_batch=True)


def sql_snap_to_line() -> str:
    segs = _snap_segments()
    L = oracle._lit
    proj_sql = oracle.projection_sql(
        _points_sql("events", "event_id"), CFG, id_cols=("event_id",))
    t_cols, d_cols = [], []
    for i, (ax, ay, dxab, dyab, len2) in enumerate(segs):
        t = (f"least(greatest(((xm - {L(ax)}) * {L(dxab)}"
             f" + (ym - {L(ay)}) * {L(dyab)}) / {L(len2)},"
             f" {L(0.0)}), {L(1.0)})")
        t_cols.append(f"{t} AS t{i}")
        d_cols.append(
            f"(xm - ({L(ax)} + t{i} * {L(dxab)}))"
            f" * (xm - ({L(ax)} + t{i} * {L(dxab)}))"
            f" + (ym - ({L(ay)} + t{i} * {L(dyab)}))"
            f" * (ym - ({L(ay)} + t{i} * {L(dyab)})) AS d{i}")
    ns = len(segs)
    seg_rows = " UNION ALL ".join(
        f"SELECT event_id, {i} AS seg, t{i} AS t, d{i} AS d2 FROM sd"
        for i in range(ns))
    return f"""
WITH sp AS MATERIALIZED (
  SELECT event_id, xm, ym FROM {proj_sql} q
), st AS MATERIALIZED (
  SELECT event_id, xm, ym, {", ".join(t_cols)} FROM sp
), sd AS MATERIALIZED (
  SELECT event_id, {", ".join(f"t{i}" for i in range(ns))},
    {", ".join(d_cols)} FROM st
), su AS MATERIALIZED ({seg_rows}),
sbest AS MATERIALIZED (
  SELECT event_id, seg, t, d2 FROM (
    SELECT event_id, seg, t, d2,
      row_number() OVER (PARTITION BY event_id ORDER BY d2, seg) AS rn
    FROM su
  ) WHERE rn = 1
)
SELECT event_id, CAST(seg AS BIGINT) AS seg,
  CAST(floor(t * {L(1e6)}) AS BIGINT) AS t_e6,
  CAST(floor(d2 * {L(1e-6)}) AS BIGINT) AS d2_sc
FROM sbest WHERE d2 <= {L(SNAP_R2)}
"""


WDIST_W = 7   # rolling window: distinct users over the trailing 7 days


def q_window_distinct(sf_dir: str):
    """Rolling 7-day EXACT distinct users per day (the DAU/WAU
    overlap metric, where sketches are the usual compromise): each
    distinct (user, day) pair replicates into the 7 windows it ends
    in; windows hash to buckets so one exchange carries only distinct
    pairs and each window's dedup is local to its bucket.  Output
    (day, n_users)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ds = _read(sf_dir, "events", columns=["ts", "user_id"], blocks=4)
    nb = 8

    def part(batch: pa.Table) -> pa.Table:
        t = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        assert uid.max(initial=0) < (1 << 32), "user id packing overflow"
        pair = np.unique(t * (1 << 32) + uid)
        d = pair >> 32
        u = pair & ((1 << 32) - 1)
        w = (d[:, None] + np.arange(WDIST_W)[None, :]).ravel()
        uu = np.repeat(u, WDIST_W)
        key = np.unique(w * (1 << 32) + uu)
        wk = (key >> 32).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(wk.astype(np.uint64), nb)),
            "key": pa.array(key.astype(np.uint64)),
            "w": pa.array(wk),
        })

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"day": pa.array([], type=pa.int64()),
                             "n_users": pa.array([], type=pa.int64())})
        key = np.unique(g["key"].to_numpy(zero_copy_only=False)
                        .astype(np.uint64))
        wk = (key >> np.uint64(32)).astype(np.int64)
        uq, cnt = np.unique(wk, return_counts=True)
        return pa.table({"day": pa.array(uq),
                         "n_users": pa.array(cnt.astype(np.int64))})

    return (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_window_distinct() -> str:
    return f"""
WITH wdp AS MATERIALIZED (
  SELECT DISTINCT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
    user_id
  FROM events
), wdw AS MATERIALIZED (
  SELECT user_id,
    unnest([d + i for i in generate_series(0, {WDIST_W - 1})]) AS w
  FROM wdp
)
SELECT CAST(w AS BIGINT) AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
  AS n_users
FROM wdw GROUP BY w
"""


def q_dataset_profile(sf_dir: str):
    """One-pass dataset card (the profiling block at the top of a
    dataset README): doc count, total/min/max chars, exact median
    length (rank rule k = (n+1)//2 over merged per-batch length
    histograms), language count and per-language doc counts — all
    from ONE scan emitting tiny mergeable partials.  Output tall
    (metric, value) rows."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def part(batch: pa.Table) -> pa.Table:
        nch = batch["n_chars"].to_numpy(zero_copy_only=False)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        lu, lc = np.unique(lang, return_counts=True)
        hu, hc = np.unique(nch, return_counts=True)
        keys = (["n_docs", "sum_chars"]
                + [f"lang_{x}" for x in lu]
                + [f"hist_{int(x)}" for x in hu])
        vals = ([len(nch), int(nch.sum())]
                + lc.astype(np.int64).tolist()
                + hc.astype(np.int64).tolist())
        return pa.table({
            "one": pa.array(np.zeros(len(keys), dtype=np.int64)),
            "metric": pa.array(keys, type=pa.string()),
            "value": pa.array(np.array(vals, dtype=np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "metric" not in g.column_names:
            return pa.table({"metric": pa.array([], type=pa.string()),
                             "value": pa.array([], type=pa.int64())})
        mk = g["metric"].to_numpy(zero_copy_only=False)
        mv = g["value"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(mk, return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, mv)
        agg = dict(zip(uq.tolist(), tot.tolist()))
        hist = sorted((int(k[5:]), v) for k, v in agg.items()
                      if k.startswith("hist_"))
        lens = np.array([h[0] for h in hist], dtype=np.int64)
        cnts = np.array([h[1] for h in hist], dtype=np.int64)
        n = int(cnts.sum())
        csum = np.cumsum(cnts)
        p50 = int(lens[np.searchsorted(csum, (n + 1) // 2)]) if n else 0
        out = {
            "n_docs": agg.get("n_docs", 0),
            "sum_chars": agg.get("sum_chars", 0),
            "min_chars": int(lens[0]) if n else 0,
            "max_chars": int(lens[-1]) if n else 0,
            "p50_chars": p50,
            "n_langs": sum(1 for k in agg if k.startswith("lang_")),
        }
        for k in sorted(agg):
            if k.startswith("lang_"):
                out[k] = agg[k]
        return pa.table({
            "metric": pa.array(list(out.keys()), type=pa.string()),
            "value": pa.array(np.array(list(out.values()), dtype=np.int64)),
        })

    return (
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("one")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_dataset_profile() -> str:
    return """
WITH dpm AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
    CAST(MIN(n_chars) AS BIGINT) AS min_chars,
    CAST(MAX(n_chars) AS BIGINT) AS max_chars,
    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents
), dpr AS MATERIALIZED (
  SELECT CAST(n_chars AS BIGINT) AS v,
    row_number() OVER (ORDER BY n_chars) AS rn,
    COUNT(*) OVER () AS n
  FROM documents
), dp50 AS MATERIALIZED (
  SELECT v AS p50 FROM dpr WHERE rn = (n + 1) // 2
)
SELECT 'n_docs' AS metric, n_docs AS value FROM dpm
UNION ALL SELECT 'sum_chars', sum_chars FROM dpm
UNION ALL SELECT 'min_chars', min_chars FROM dpm
UNION ALL SELECT 'max_chars', max_chars FROM dpm
UNION ALL SELECT 'p50_chars', p50 FROM dp50
UNION ALL SELECT 'n_langs', n_langs FROM dpm
UNION ALL SELECT 'lang_' || lang, CAST(COUNT(*) AS BIGINT)
  FROM documents GROUP BY lang
"""


def q_image_keep_best(sf_dir: str):
    """Image-dedup representative selection (the multimodal sibling of
    q_dedup_keep_best): per near-dup image cluster keep the
    largest-area member (w*h DESC, ties -> smaller idx) with cluster
    size.  Same shape: bounded cluster membership broadcast ->
    one metadata-only pass over the images table (payload bytes never
    read) -> mergeable per-cluster argmax partials -> one bucket
    exchange.  Output (cluster_id, keep_idx, area, n_members)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    clusters = q_image_clusters(sf_dir)
    # bounded: one row per image in a verified near-dup pair
    rows = clusters.take_all()
    m_ids = np.array([int(r["doc_id"]) for r in rows], dtype=np.int64)
    m_cl = np.array([int(r["cluster_id"]) for r in rows], dtype=np.int64)
    order = np.argsort(m_ids)
    memb_ref = ray.put((m_ids[order], m_cl[order]))
    nb = 8

    ds = ray.data.read_parquet(
        IMG_DIR, columns=["image_id", "w", "h"],
        override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8))

    def partial(batch: pa.Table) -> pa.Table:
        mk, mv = ray.get(memb_ref)
        ids = np.array([int(x[3:]) for x in batch["image_id"].to_pylist()],
                       dtype=np.int64)
        area = (batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
                * batch["h"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(mk, ids)
        pos = np.minimum(pos, max(len(mk) - 1, 0))
        sel = np.flatnonzero((len(mk) > 0) & (mk[pos] == ids))
        cols = ["bucket", "cluster_id", "idx", "area", "n_members"]
        if not len(sel):
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        cl = mv[pos[sel]]
        ids, area = ids[sel], area[sel]
        order2 = np.lexsort((ids, -area, cl))
        clo = cl[order2]
        first = np.r_[True, clo[1:] != clo[:-1]]
        cnt = np.diff(np.r_[np.flatnonzero(first), len(clo)])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(
                clo[first].astype(np.uint64), nb)),
            "cluster_id": pa.array(clo[first]),
            "idx": pa.array(ids[order2][first]),
            "area": pa.array(area[order2][first]),
            "n_members": pa.array(cnt.astype(np.int64)),
        })

    def resolve(g: pa.Table) -> pa.Table:
        cols = ["cluster_id", "keep_idx", "area", "n_members"]
        if g.num_rows == 0 or "cluster_id" not in g.column_names:
            return pa.table({c: pa.array([], type=pa.int64()) for c in cols})
        cl = g["cluster_id"].to_numpy(zero_copy_only=False)
        ids = g["idx"].to_numpy(zero_copy_only=False)
        area = g["area"].to_numpy(zero_copy_only=False)
        nm = g["n_members"].to_numpy(zero_copy_only=False)
        order2 = np.lexsort((ids, -area, cl))
        clo = cl[order2]
        first = np.r_[True, clo[1:] != clo[:-1]]
        uq, inv = np.unique(cl, return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, nm)
        return pa.table({
            "cluster_id": pa.array(clo[first]),
            "keep_idx": pa.array(ids[order2][first]),
            "area": pa.array(area[order2][first]),
            "n_members": pa.array(tot),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_image_keep_best() -> str:
    src = _image_src_sql()
    return f"""
WITH ikc AS MATERIALIZED (
  SELECT * FROM ({sql_image_clusters()}) t
), iks AS MATERIALIZED (
  SELECT CAST(substr(image_id, 4) AS BIGINT) AS idx,
    CAST(w AS BIGINT) * CAST(h AS BIGINT) AS area
  FROM {src} q3
), ikr AS MATERIALIZED (
  SELECT c.cluster_id, s.idx, s.area,
    row_number() OVER (PARTITION BY c.cluster_id
                       ORDER BY s.area DESC, s.idx) AS rn,
    COUNT(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM ikc c JOIN iks s ON s.idx = c.doc_id
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id, idx AS keep_idx, area,
  CAST(n_members AS BIGINT) AS n_members
FROM ikr WHERE rn = 1
"""


def q_tile_modality_balance(sf_dir: str):
    """Cross-modal spatial coverage audit (do we have imagery where we
    have activity?): per res-2 tile, image count (from the images
    table's phash-derived coordinates) vs event count, and the image
    share as an exact integer permille-of-million.  Both modalities
    emit per-batch (tile, side) count partials; ONE union bucket
    exchange resolves.  Payload bytes are never read — metadata-only
    on the image side.  Output (tile_id, n_images, n_events,
    img_share_e6)."""
    from rhealpixdggs_py_ray.fixtures import write_images_table
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.stages.indexer import CellIndexer

    write_images_table(IMG_DIR, IMG_N)
    nb = 8

    def part_of(cell_u64: np.ndarray, side: int) -> pa.Table:
        uq, cnt = np.unique(cell_u64.astype(np.uint64), return_counts=True)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uq, nb)),
            "tile_u64": pa.array(uq, type=pa.uint64()),
            "n_img": pa.array(cnt.astype(np.int64) * (1 if side else 0)),
            "n_evt": pa.array(cnt.astype(np.int64) * (0 if side else 1)),
        })

    img_idx = CellIndexer(resolution=TILE_RES, emit_cell_id=False)

    def img_part(batch: pa.Table) -> pa.Table:
        out = img_idx(batch)
        return part_of(out["cell_u64"].to_numpy(zero_copy_only=False), 1)

    from rhealpixdggs_py_ray.core import index as cidx

    def evt_part(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        return part_of(u, 0)

    imgs = ray.data.read_parquet(
        IMG_DIR, columns=["phash"],
        override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8),
    ).map_batches(img_part, batch_format="pyarrow", zero_copy_batch=True)
    evts = _read(sf_dir, "events", columns=["event_id"], blocks=4).map_batches(
        evt_part, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        cols = {"tile_id": pa.string(), "n_images": pa.int64(),
                "n_events": pa.int64(), "img_share_e6": pa.int64()}
        if g.num_rows == 0 or "tile_u64" not in g.column_names:
            return pa.table({c: pa.array([], type=t) for c, t in cols.items()})
        u = g["tile_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ni = g["n_img"].to_numpy(zero_copy_only=False)
        ne = g["n_evt"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(u, return_inverse=True)
        si = np.zeros(len(uq), dtype=np.int64)
        se = np.zeros(len(uq), dtype=np.int64)
        np.add.at(si, inv, ni)
        np.add.at(se, inv, ne)
        return pa.table({
            "tile_id": pa.array(su.to_string_fixed(uq, TILE_RES),
                                type=pa.string()),
            "n_images": pa.array(si),
            "n_events": pa.array(se),
            "img_share_e6": pa.array((si * 1_000_000) // (si + se)),
        })

    return (
        imgs.union(evts)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def sql_tile_modality_balance() -> str:
    src = _image_src_sql()
    img_pts = (f"SELECT image_id, lon, lat FROM {src} q4")
    img_idx = oracle.cell_from_point_sql(
        img_pts, TILE_RES, CFG, id_cols=("image_id",))
    evt_idx = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG,
        id_cols=("event_id",))
    return f"""
WITH tmi AS MATERIALIZED (
  SELECT cell_id AS tile_id, CAST(COUNT(*) AS BIGINT) AS n_images
  FROM {img_idx} a GROUP BY cell_id
), tme AS MATERIALIZED (
  SELECT cell_id AS tile_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM {evt_idx} b GROUP BY cell_id
)
SELECT COALESCE(i.tile_id, e.tile_id) AS tile_id,
  COALESCE(i.n_images, 0) AS n_images,
  COALESCE(e.n_events, 0) AS n_events,
  (COALESCE(i.n_images, 0) * 1000000)
    // (COALESCE(i.n_images, 0) + COALESCE(e.n_events, 0)) AS img_share_e6
FROM tmi i FULL OUTER JOIN tme e ON e.tile_id = i.tile_id
"""


def q_cell_edges(sf_dir: str):
    """Directed-edge API workalike (h3's cellsToDirectedEdge /
    originToDirectedEdges family) on the res-4 equatorial lattice:
    every distinct occupied cell emits its 4 directed edges — edge_id
    packs (gy, gx, dir), the neighbor is the lattice step with
    antimeridian wrap; steps off the band's gy range drop (the polar
    crossings belong to the topology kernel, not the integer lattice).
    Map + one distinct-cell exchange.  Output (cell_id, dir, edge_id,
    nbr_cell_id)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        return pa.table({
            "cell_u64": pa.array(u[m], type=pa.uint64()),
            "one": pa.array(np.ones(int(m.sum()), dtype=np.int64)),
        })

    dist = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "n",
    )

    # dir 0=E, 1=W, 2=N (gy-1), 3=S (gy+1)
    DX = np.array([1, -1, 0, 0], dtype=np.int64)
    DY = np.array([0, 0, -1, 1], dtype=np.int64)

    def edges(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        n = len(u)
        gy4 = np.repeat(gy, 4)
        gx4 = np.repeat(gx, 4)
        dir4 = np.tile(np.arange(4, dtype=np.int64), n)
        ny = gy4 + DY[dir4]
        nx = (gx4 + DX[dir4]) % W
        ok = (ny >= 0) & (ny < side)
        gy4, gx4, dir4, ny, nx = gy4[ok], gx4[ok], dir4[ok], ny[ok], nx[ok]
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy4, gx4, k),
                type=pa.string()),
            "dir": pa.array(dir4),
            "edge_id": pa.array((gy4 * W + gx4) * 4 + dir4),
            "nbr_cell_id": pa.array(
                _cell_string_array_from_lattice(ny, nx, k),
                type=pa.string()),
        })

    return dist.map_batches(edges, batch_format="pyarrow",
                            zero_copy_batch=True)


def sql_cell_edges() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)

    def rebuild(gy_e: str, gx_e: str) -> str:
        return (
            f"CASE ({gx_e}) // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
            " WHEN 2 THEN 'Q' ELSE 'R' END || "
            + " || ".join(
                f"CAST(((({gy_e}) // {3 ** (k - 1 - i)}) % 3) * 3"
                f" + (((({gx_e}) % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
                for i in range(k)
            )
        )

    return f"""
WITH ceidx AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
cec AS MATERIALIZED (
  SELECT DISTINCT {gy} AS gy, {gx} AS gx FROM ceidx
),
ced AS MATERIALIZED (
  SELECT gy, gx, dir,
    gy + CASE dir WHEN 2 THEN -1 WHEN 3 THEN 1 ELSE 0 END AS ny,
    ((gx + CASE dir WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END) % {W} + {W})
      % {W} AS nx
  FROM cec CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS dir) dd
)
SELECT {rebuild('gy', 'gx')} AS cell_id, CAST(dir AS BIGINT) AS dir,
  CAST((gy * {W} + gx) * 4 + dir AS BIGINT) AS edge_id,
  {rebuild('ny', 'nx')} AS nbr_cell_id
FROM ced WHERE ny >= 0 AND ny < {side}
"""


# ---------------------------------------------------------------------------
# Round 4c: geofence enter/exit transitions
# ---------------------------------------------------------------------------

FENCE_RES = 1
FENCE_CELLS = ("N4", "S4")


def q_geofence_transitions(sf_dir: str):
    """Geofence monitoring: each user's events ordered by (ts,
    event_id) form a track; the fence is the union of two res-1 cells
    (N4, S4), membership decided by the full cell_from_point chain.
    Per user: events inside, enters (outside->inside steps; an inside
    FIRST event counts as an entry), exits, and the final state.  ONE
    h(user) bucket exchange; inside a bucket one lexsort + vectorized
    flag diff over the whole bucket (user boundaries masked) — the
    trajectory_segments scale shape."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    fence = su.from_string(list(FENCE_CELLS)).astype(np.uint64)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        lon, lat = oracle.lonlat_from_id(eid)
        u = idx.cell_from_point(CFG, FENCE_RES, lon, lat, plane=False)
        ins = np.isin(u.astype(np.uint64), fence).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(eid.astype(np.int64)),
            "ins": pa.array(ins),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ins = g["ins"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, ins = uid[order], ins[order]
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        prev = np.r_[0, ins[:-1]]
        enter = (ins == 1) & (new_seg | (prev == 0))
        exit_ = (ins == 0) & ~new_seg & (prev == 1)
        uu, inv = np.unique(uid, return_inverse=True)
        n_ev = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        n_in = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n_in, inv, ins)
        n_ent = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n_ent, inv, enter.astype(np.int64))
        n_ex = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n_ex, inv, exit_.astype(np.int64))
        ends = np.r_[np.flatnonzero(new_seg)[1:] - 1, len(uid) - 1]
        return pa.table({
            "user_id": pa.array(uu),
            "n_events": pa.array(n_ev),
            "n_inside": pa.array(n_in),
            "n_enter": pa.array(n_ent),
            "n_exit": pa.array(n_ex),
            "last_inside": pa.array(ins[ends].astype(np.int64)),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_geofence_transitions() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), FENCE_RES, CFG,
        id_cols=("event_id",),
    )
    fence = ", ".join(f"'{c}'" for c in FENCE_CELLS)
    return f"""
WITH gfidx AS MATERIALIZED (
  SELECT event_id,
    CASE WHEN cell_id IN ({fence}) THEN 1 ELSE 0 END AS ins
  FROM {inner} t
),
gfe AS MATERIALIZED (
  SELECT e.user_id, e.ts, e.event_id, c.ins
  FROM events e JOIN gfidx c USING (event_id)
),
gfl AS MATERIALIZED (
  SELECT user_id, ins,
    lag(ins) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pins,
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
      event_id DESC) AS rn_last
  FROM gfe
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(*) FILTER (WHERE ins = 1) AS BIGINT) AS n_inside,
  CAST(COUNT(*) FILTER (WHERE ins = 1 AND (pins IS NULL OR pins = 0))
    AS BIGINT) AS n_enter,
  CAST(COUNT(*) FILTER (WHERE ins = 0 AND pins = 1) AS BIGINT) AS n_exit,
  CAST(MAX(CASE WHEN rn_last = 1 THEN ins END) AS BIGINT) AS last_inside
FROM gfl GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Round 4c: symmetric Hausdorff distance (user point set vs reference set)
# ---------------------------------------------------------------------------

HAUS_PTS = [(-97.43, 31.17), (-58.37, -17.23), (-3.82, 42.61),
            (12.58, -4.47), (77.21, 23.93), (139.67, -33.41)]


def _haus_xy():
    """Driver-side projected reference points as exact float64
    constants (repr literals cross to SQL bit-identically — the
    snap_to_line pattern)."""
    from rhealpixdggs_py_ray.core import projection as proj

    lon = np.array([p[0] for p in HAUS_PTS], dtype=np.float64)
    lat = np.array([p[1] for p in HAUS_PTS], dtype=np.float64)
    vx, vy = proj.forward(CFG, lon, lat)
    return [(float(x), float(y)) for x, y in zip(vx, vy)]


def q_hausdorff(sf_dir: str):
    """Symmetric Hausdorff distance between every user's event point
    set and a fixed reference point set, in planar rHEALPix meters —
    the trajectory-vs-route similarity primitive.  Distances are
    integer-quantized PER PAIR (floor(d2 * 1e-6)) before any min/max,
    so every reduction is an order-free integer fold: per batch one
    wide partial row per user (max of per-event min, and per-ref-point
    min); ONE h(user) exchange folds partials.  The corpus never
    shuffles raw points.  Output (user_id, h_ab = max_a min_b,
    h_ba = max_b min_a, hausdorff = max of the two)."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    pts = _haus_xy()
    J = len(pts)
    n_buckets = sizing.exchange_buckets(8)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        px, py = proj.forward(CFG, lon, lat)
        n = len(ids)
        Q = np.empty((n, J), dtype=np.int64)
        for j, (ax, ay) in enumerate(pts):
            ddx = px - ax
            ddy = py - ay
            Q[:, j] = np.floor((ddx * ddx + ddy * ddy) * 1e-6).astype(np.int64)
        emin = Q.min(axis=1)
        uu, inv = np.unique(uid, return_inverse=True)
        amax = np.full(len(uu), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(amax, inv, emin)
        cols = {
            "bucket": pa.array(hash_bucket_u64(uu, n_buckets)),
            "user_id": pa.array(uu.astype(np.int64)),
            "amax": pa.array(amax),
        }
        for j in range(J):
            mj = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mj, inv, Q[:, j])
            cols[f"m{j}"] = pa.array(mj)
        return pa.table(cols)

    def resolve(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(uid, return_inverse=True)
        h_ab = np.full(len(uu), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(h_ab, inv, g["amax"].to_numpy(zero_copy_only=False))
        h_ba = np.full(len(uu), np.iinfo(np.int64).min, dtype=np.int64)
        for j in range(J):
            mj = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mj, inv, g[f"m{j}"].to_numpy(zero_copy_only=False))
            h_ba = np.maximum(h_ba, mj)
        return pa.table({
            "user_id": pa.array(uu),
            "h_ab": pa.array(h_ab),
            "h_ba": pa.array(h_ba),
            "hausdorff": pa.array(np.maximum(h_ab, h_ba)),
        })

    b = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(resolve, batch_format="pyarrow")


def sql_hausdorff() -> str:
    pts = _haus_xy()
    L = oracle._lit
    proj_sql = oracle.projection_sql(
        _points_sql("events", "event_id"), CFG, id_cols=("event_id",))
    q_cols = ", ".join(
        f"CAST(floor(((xm - {L(ax)}) * (xm - {L(ax)})"
        f" + (ym - {L(ay)}) * (ym - {L(ay)})) * {L(1e-6)}) AS BIGINT) AS q{j}"
        for j, (ax, ay) in enumerate(pts))
    J = len(pts)
    qs = ", ".join(f"q{j}" for j in range(J))
    mins = ", ".join(f"MIN(q{j})" for j in range(J))
    return f"""
WITH hsp AS MATERIALIZED (
  SELECT event_id, xm, ym FROM {proj_sql} q
),
hsd AS MATERIALIZED (
  SELECT e.user_id, {q_cols}
  FROM hsp p JOIN events e USING (event_id)
),
hsr AS MATERIALIZED (
  SELECT user_id, MAX(least({qs})) AS h_ab, greatest({mins}) AS h_ba
  FROM hsd GROUP BY user_id
)
SELECT user_id, h_ab, h_ba, greatest(h_ab, h_ba) AS hausdorff FROM hsr
"""


# ---------------------------------------------------------------------------
# Round 4c: viewshed (line-of-sight raster over the res-4 lattice)
# ---------------------------------------------------------------------------

VIEW_R = 16       # Chebyshev visibility radius (cells)
VIEW_OBS = (40, 162)   # observer (gy, gx) — mid-band, mid-seam-free
VIEW_OBS_H = 50   # observer mast height above terrain (m)


def _view_elev(gy, gx):
    """Deterministic integer terrain: elev(gy, gx) = (11*gy + 17*gx)
    % 997 — trivially mirrored in SQL (the cost_distance weight
    pattern)."""
    return (11 * gy + 17 * gx) % 997


def q_viewshed(sf_dir: str):
    """Viewshed: which occupied res-4 lattice cells within Chebyshev
    radius VIEW_R of a fixed observer are VISIBLE over deterministic
    integer terrain.  The sightline to a target at distance n is
    sampled on the grid_path DDA (round-half-up in exact integer
    arithmetic); step k blocks iff elev_k * n > h0*(n-k) + ht*k — an
    integer cross-multiplication, so visibility is bit-exact with no
    float slope anywhere.  Distinct occupied cells come from ONE
    u64-keyed exchange; the DDA loop is vectorized across all targets
    (k = 1..R-1 sweeps, each a masked numpy step).  Output (cell_id,
    dist, elev, visible)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    oy, ox = VIEW_OBS
    h0 = _view_elev(oy, ox) + VIEW_OBS_H

    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        return pa.table({
            "cell_u64": pa.array(u[m], type=pa.uint64()),
            "one": pa.array(np.ones(int(m.sum()), dtype=np.int64)),
        })

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "n",
    )

    def los(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        dr = gy - oy
        dcn = ((gx - ox) % W + W) % W
        dc = np.where(dcn >= W // 2, dcn - W, dcn)
        n = np.maximum(np.abs(dr), np.abs(dc))
        m = (n >= 1) & (n <= VIEW_R)
        gy, gx, dr, dc, n = gy[m], gx[m], dr[m], dc[m], n[m]
        ht = _view_elev(gy, gx)
        blocked = np.zeros(len(n), dtype=bool)
        for kk in range(1, VIEW_R):
            live = kk < n
            if not live.any():
                break
            rk = oy + (2 * kk * dr + n) // (2 * n)
            ck = (ox + (2 * kk * dc + n) // (2 * n)) % W
            ek = _view_elev(rk, ck)
            blocked |= live & (ek * n > h0 * (n - kk) + ht * kk)
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy, gx, k), type=pa.string()),
            "dist": pa.array(n),
            "elev": pa.array(ht),
            "visible": pa.array((~blocked).astype(np.int64)),
        })

    return occ.map_batches(los, batch_format="pyarrow", zero_copy_batch=True)


def sql_viewshed() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    oy, ox = VIEW_OBS
    h0 = _view_elev(oy, ox) + VIEW_OBS_H
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    return f"""
WITH vsi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
vsc AS MATERIALIZED (
  SELECT DISTINCT {gy} AS gy, {gx} AS gx FROM vsi
),
vsb AS MATERIALIZED (
  SELECT gy, gx, dr,
    CASE WHEN dcn >= {W // 2} THEN dcn - {W} ELSE dcn END AS dc,
    greatest(abs(dr), abs(CASE WHEN dcn >= {W // 2} THEN dcn - {W}
      ELSE dcn END)) AS n,
    (11 * gy + 17 * gx) % 997 AS ht
  FROM (
    SELECT gy, gx, gy - {oy} AS dr,
      (((gx - {ox}) % {W}) + {W}) % {W} AS dcn
    FROM vsc
  )
  WHERE greatest(abs(dr), abs(CASE WHEN dcn >= {W // 2} THEN dcn - {W}
    ELSE dcn END)) BETWEEN 1 AND {VIEW_R}
),
vss AS MATERIALIZED (
  SELECT gy, gx,
    ({oy} + CAST(floor((2.0 * kk * dr + n) / (2 * n)) AS BIGINT)) AS rk,
    (({ox} + CAST(floor((2.0 * kk * dc + n) / (2 * n)) AS BIGINT)) % {W}
      + {W}) % {W} AS ck,
    n, ht, kk
  FROM vsb, unnest(generate_series(1, n - 1)) AS t(kk)
),
vsk AS MATERIALIZED (
  SELECT gy, gx, CAST(COUNT(*) FILTER (
    WHERE (11 * rk + 17 * ck) % 997 * n > {h0} * (n - kk) + ht * kk
  ) AS BIGINT) AS nb
  FROM vss GROUP BY gy, gx
)
SELECT {rebuild} AS cell_id, CAST(n AS BIGINT) AS dist,
  CAST(ht AS BIGINT) AS elev,
  CAST(CASE WHEN COALESCE(nb, 0) = 0 THEN 1 ELSE 0 END AS BIGINT) AS visible
FROM vsb LEFT JOIN vsk USING (gy, gx)
"""


# ---------------------------------------------------------------------------
# Round 4c: discrete Frechet distance (capped trajectory vs reference route)
# ---------------------------------------------------------------------------

FRECHET_P = 6   # per-user trajectory cap (first P points by ts, event_id)


def _frechet_ref():
    """SNAP_LINE vertices projected once on the driver (exact float64
    constants, repr-crossable)."""
    from rhealpixdggs_py_ray.core import projection as proj

    lon = np.array([p[0] for p in SNAP_LINE], dtype=np.float64)
    lat = np.array([p[1] for p in SNAP_LINE], dtype=np.float64)
    vx, vy = proj.forward(CFG, lon, lat)
    return [(float(x), float(y)) for x, y in zip(vx, vy)]


def q_frechet(sf_dir: str):
    """Discrete Frechet distance (the leash metric for route
    similarity) between each user's first FRECHET_P events (ordered by
    ts, event_id) and the fixed reference route, in planar rHEALPix
    meters.  Per-pair costs are integer-quantized (floor(d2 * 1e-6))
    BEFORE the DP, so every max/min in the recurrence is an order-free
    integer fold and SQL replays it as 30 unrolled lateral-alias
    columns.  ONE h(user) exchange; the DP is vectorized ACROSS users
    (P x M sweeps of whole-bucket numpy ops, no per-user loop).
    Output (user_id, n_pts, frechet)."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    ref = _frechet_ref()
    M = len(ref)
    P = FRECHET_P
    n_buckets = sizing.exchange_buckets(8)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        px, py = proj.forward(CFG, *oracle.lonlat_from_id(ids))
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(ids.astype(np.int64)),
            "px": pa.array(px), "py": pa.array(py),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        px = g["px"].to_numpy(zero_copy_only=False)[order]
        py = g["py"].to_numpy(zero_copy_only=False)[order]
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        rank = np.arange(len(uid)) - np.repeat(
            starts, np.diff(np.append(starts, len(uid))))
        keep = rank < P
        uid, px, py, rank = uid[keep], px[keep], py[keep], rank[keep]
        uu, inv = np.unique(uid, return_inverse=True)
        nu = len(uu)
        n_pts = np.bincount(inv, minlength=nu).astype(np.int64)
        # cost cube C[u, i, j]; slots beyond n_pts stay at sentinel and
        # are never read (the answer indexes row n_pts-1)
        C = np.full((nu, P, M), np.int64(1 << 60), dtype=np.int64)
        for j, (ax, ay) in enumerate(ref):
            ddx = px - ax
            ddy = py - ay
            C[inv, rank, j] = np.floor(
                (ddx * ddx + ddy * ddy) * 1e-6).astype(np.int64)
        D = np.empty_like(C)
        for i in range(P):
            for j in range(M):
                if i == 0 and j == 0:
                    best = C[:, 0, 0]
                elif i == 0:
                    best = np.maximum(C[:, 0, j], D[:, 0, j - 1])
                elif j == 0:
                    best = np.maximum(C[:, i, 0], D[:, i - 1, 0])
                else:
                    best = np.maximum(C[:, i, j], np.minimum(
                        np.minimum(D[:, i - 1, j], D[:, i, j - 1]),
                        D[:, i - 1, j - 1]))
                D[:, i, j] = best
        return pa.table({
            "user_id": pa.array(uu),
            "n_pts": pa.array(n_pts),
            "frechet": pa.array(D[np.arange(nu), n_pts - 1, M - 1]),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_frechet() -> str:
    ref = _frechet_ref()
    M = len(ref)
    P = FRECHET_P
    L = oracle._lit
    proj_sql = oracle.projection_sql(
        _points_sql("events", "event_id"), CFG, id_cols=("event_id",))
    cost_cols = ", ".join(
        f"CAST(floor(((xm - {L(ax)}) * (xm - {L(ax)})"
        f" + (ym - {L(ay)}) * (ym - {L(ay)})) * {L(1e-6)}) AS BIGINT) AS c{j}"
        for j, (ax, ay) in enumerate(ref))
    pivot = ", ".join(
        f"MAX(CASE WHEN rn = {i + 1} THEN c{j} END) AS c{i}{j}"
        for i in range(P) for j in range(M))
    dp = []
    for i in range(P):
        for j in range(M):
            if i == 0 and j == 0:
                dp.append("c00 AS d00")
            elif i == 0:
                dp.append(f"greatest(c0{j}, d0{j - 1}) AS d0{j}")
            elif j == 0:
                dp.append(f"greatest(c{i}0, d{i - 1}0) AS d{i}0")
            else:
                dp.append(
                    f"greatest(c{i}{j}, least(d{i - 1}{j}, d{i}{j - 1},"
                    f" d{i - 1}{j - 1})) AS d{i}{j}")
    final = " ".join(
        f"WHEN {i + 1} THEN d{i}{M - 1}" for i in range(P))
    return f"""
WITH frp AS MATERIALIZED (
  SELECT event_id, xm, ym FROM {proj_sql} q
),
fre AS MATERIALIZED (
  SELECT e.user_id, {cost_cols},
    row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
      AS rn
  FROM frp p JOIN events e USING (event_id)
),
frw AS MATERIALIZED (
  SELECT user_id, CAST(least(COUNT(*), {P}) AS BIGINT) AS n_pts, {pivot}
  FROM fre WHERE rn <= {P} GROUP BY user_id
),
frd AS MATERIALIZED (
  SELECT user_id, n_pts, {", ".join(dp)} FROM frw
)
SELECT user_id, n_pts, CASE n_pts {final} END AS frechet FROM frd
"""


# ---------------------------------------------------------------------------
# Round 4c: n-gram containment (asymmetric near-dup / quotation detector)
# ---------------------------------------------------------------------------

def q_dedup_containment(sf_dir: str):
    """Shingle containment ni / min(na, nb): catches a short doc fully
    quoted inside a long one, which symmetric Jaccard dilutes away.
    Same fused 3-exchange inverted-index plumbing as ngram_jaccard
    (ops/dedup.py:928) — only the resolve formula differs."""
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.ngram_jaccard_pairs(_docs(sf_dir), jaccard_min=0.4,
                                     metric="containment")


def sql_dedup_containment() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return dedup.ngram_containment_sql(0.4)


# ---------------------------------------------------------------------------
# Round 4c: Imai-Iri polyline simplification (min-vertex track within eps)
# ---------------------------------------------------------------------------

SIMP_P = 8           # per-user track cap (first P points by ts, event_id)
SIMP_EPS2 = 9.0e12   # corridor half-width^2 in planar m^2 (3,000 km)


def q_simplify_track(sf_dir: str):
    """Imai-Iri polyline simplification (the optimal counterpart of
    Douglas-Peucker): per user, the MINIMUM number of vertices of a
    subsequence chain whose every shortcut (i, j) keeps all skipped
    points within sqrt(SIMP_EPS2) of the segment, over the first
    SIMP_P track points.  Shortcut tests reuse the snap_to_line
    clamp-projection float shape (bit-identical in SQL); the DAG
    shortest path is ONE ascending Bellman sweep vectorized across all
    users in a bucket.  ONE h(user) exchange.  Output (user_id, n_pts,
    n_kept, direct_ok)."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    P = SIMP_P
    n_buckets = sizing.exchange_buckets(8)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        px, py = proj.forward(CFG, *oracle.lonlat_from_id(ids))
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(ids.astype(np.int64)),
            "px": pa.array(px), "py": pa.array(py),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        px = g["px"].to_numpy(zero_copy_only=False)[order]
        py = g["py"].to_numpy(zero_copy_only=False)[order]
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        rank = np.arange(len(uid)) - np.repeat(
            starts, np.diff(np.append(starts, len(uid))))
        keep = rank < P
        uid, px, py, rank = uid[keep], px[keep], py[keep], rank[keep]
        uu, inv = np.unique(uid, return_inverse=True)
        nu = len(uu)
        n_pts = np.bincount(inv, minlength=nu).astype(np.int64)
        X = np.zeros((nu, P), dtype=np.float64)
        Y = np.zeros((nu, P), dtype=np.float64)
        X[inv, rank] = px
        Y[inv, rank] = py
        # shortcut admissibility: E[:, i, j] (slots past n_pts unused)
        E = np.zeros((nu, P, P), dtype=bool)
        for i in range(P - 1):
            for j in range(i + 1, P):
                dx = X[:, j] - X[:, i]
                dy = Y[:, j] - Y[:, i]
                len2 = dx * dx + dy * dy
                ok = np.ones(nu, dtype=bool)
                for k in range(i + 1, j):
                    tt = ((X[:, k] - X[:, i]) * dx
                          + (Y[:, k] - Y[:, i]) * dy) / len2
                    tt = np.minimum(np.maximum(tt, 0.0), 1.0)
                    ddx = X[:, k] - (X[:, i] + tt * dx)
                    ddy = Y[:, k] - (Y[:, i] + tt * dy)
                    ok &= (ddx * ddx + ddy * ddy) <= SIMP_EPS2
                E[:, i, j] = ok
        # DAG min-hop: one ascending sweep (edges only go forward)
        INF = np.int64(1 << 40)
        dist = np.full((nu, P), INF, dtype=np.int64)
        dist[:, 0] = 0
        for j in range(1, P):
            for i in range(j):
                cand = np.where(E[:, i, j], dist[:, i] + 1, INF)
                dist[:, j] = np.minimum(dist[:, j], cand)
        n_kept = np.where(
            n_pts == 1, 1, dist[np.arange(nu), n_pts - 1] + 1)
        direct = E[np.arange(nu), 0, np.maximum(n_pts - 1, 1)]
        direct = np.where(n_pts <= 2, 1, direct.astype(np.int64))
        return pa.table({
            "user_id": pa.array(uu),
            "n_pts": pa.array(n_pts),
            "n_kept": pa.array(n_kept.astype(np.int64)),
            "direct_ok": pa.array(direct.astype(np.int64)),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_simplify_track() -> str:
    P = SIMP_P
    L = oracle._lit
    proj_sql = oracle.projection_sql(
        _points_sql("events", "event_id"), CFG, id_cols=("event_id",))
    # chained min-hop CTEs: std1 = nodes reachable in 1 hop from rn=1,
    # std_h extends by one edge, MIN-merged; P-1 hops always suffice
    chain = []
    prev = "std1"
    chain.append(
        "std1 AS MATERIALIZED (SELECT user_id, j AS node, 1 AS d"
        " FROM ste WHERE i = 1)")
    for h in range(2, P):
        cur = f"std{h}"
        chain.append(
            f"{cur} AS MATERIALIZED (SELECT user_id, node, MIN(d) AS d FROM ("
            f" SELECT user_id, node, d FROM {prev}"
            f" UNION ALL"
            f" SELECT e.user_id, e.j AS node, p.d + 1 AS d"
            f" FROM {prev} p JOIN ste e ON e.user_id = p.user_id"
            f" AND e.i = p.node"
            f") GROUP BY user_id, node)")
        prev = cur
    tt = (f"least(greatest(((k.xm - a.xm) * (b.xm - a.xm)"
          f" + (k.ym - a.ym) * (b.ym - a.ym))"
          f" / ((b.xm - a.xm) * (b.xm - a.xm)"
          f" + (b.ym - a.ym) * (b.ym - a.ym)), {L(0.0)}), {L(1.0)})")
    d2 = (f"(k.xm - (a.xm + {tt} * (b.xm - a.xm)))"
          f" * (k.xm - (a.xm + {tt} * (b.xm - a.xm)))"
          f" + (k.ym - (a.ym + {tt} * (b.ym - a.ym)))"
          f" * (k.ym - (a.ym + {tt} * (b.ym - a.ym)))")
    return f"""
WITH stpp AS MATERIALIZED (
  SELECT event_id, xm, ym FROM {proj_sql} q
),
stp AS MATERIALIZED (
  SELECT user_id, xm, ym, rn FROM (
    SELECT e.user_id, p.xm, p.ym,
      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
        AS rn
    FROM stpp p JOIN events e USING (event_id)
  ) WHERE rn <= {P}
),
stn AS MATERIALIZED (
  SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n FROM stp GROUP BY user_id
),
ste AS MATERIALIZED (
  SELECT a.user_id, a.rn AS i, b.rn AS j
  FROM stp a
  JOIN stp b ON b.user_id = a.user_id AND b.rn > a.rn
  LEFT JOIN stp k ON k.user_id = a.user_id AND k.rn > a.rn AND k.rn < b.rn
  GROUP BY a.user_id, a.rn, b.rn
  HAVING bool_and(k.rn IS NULL OR {d2} <= {L(SIMP_EPS2)})
),
{", ".join(chain)}
SELECT s.user_id, s.n AS n_pts,
  CAST(CASE WHEN s.n = 1 THEN 1 ELSE d.d + 1 END AS BIGINT) AS n_kept,
  CAST(CASE WHEN s.n <= 2 THEN 1
    WHEN EXISTS (SELECT 1 FROM ste e WHERE e.user_id = s.user_id
      AND e.i = 1 AND e.j = s.n) THEN 1 ELSE 0 END AS BIGINT) AS direct_ok
FROM stn s LEFT JOIN std{P - 1} d ON d.user_id = s.user_id AND d.node = s.n
"""


# ---------------------------------------------------------------------------
# Round 4c: Viterbi map-matching (HMM over the reference route segments)
# ---------------------------------------------------------------------------

MM_T = 6                 # per-user observation cap
MM_PEN = 2_000_000       # transition penalty per segment of jump (d2-micros)


def q_map_match(sf_dir: str):
    """HMM map-matching (the Viterbi core of every GPS-to-road-network
    matcher): states = the 4 reference route segments, emissions =
    integer-quantized clamp-projection distances (the snap_to_line
    float shape, floor(d2 * 1e-6) BEFORE the DP), transitions =
    MM_PEN * |segment jump|.  All-integer Viterbi -> order-free
    min/adds that SQL replays as 24 unrolled lateral-alias columns.
    ONE h(user) exchange; the DP is vectorized across users (T x S
    sweeps).  Output (user_id, n_pts, cost, end_seg)."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    segs = _snap_segments()
    S = len(segs)
    T = MM_T
    n_buckets = sizing.exchange_buckets(8)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        px, py = proj.forward(CFG, *oracle.lonlat_from_id(ids))
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(ids.astype(np.int64)),
            "px": pa.array(px), "py": pa.array(py),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        tt_ = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tt_, uid))
        uid = uid[order]
        px = g["px"].to_numpy(zero_copy_only=False)[order]
        py = g["py"].to_numpy(zero_copy_only=False)[order]
        new_seg = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_seg)
        rank = np.arange(len(uid)) - np.repeat(
            starts, np.diff(np.append(starts, len(uid))))
        keep = rank < T
        uid, px, py, rank = uid[keep], px[keep], py[keep], rank[keep]
        uu, inv = np.unique(uid, return_inverse=True)
        nu = len(uu)
        n_pts = np.bincount(inv, minlength=nu).astype(np.int64)
        E = np.full((nu, T, S), np.int64(1 << 50), dtype=np.int64)
        for s, (ax, ay, dxab, dyab, len2) in enumerate(segs):
            tcl = ((px - ax) * dxab + (py - ay) * dyab) / len2
            tcl = np.minimum(np.maximum(tcl, 0.0), 1.0)
            ddx = px - (ax + tcl * dxab)
            ddy = py - (ay + tcl * dyab)
            E[inv, rank, s] = np.floor(
                (ddx * ddx + ddy * ddy) * 1e-6).astype(np.int64)
        V = np.empty_like(E)
        V[:, 0, :] = E[:, 0, :]
        for t in range(1, T):
            for s in range(S):
                best = V[:, t - 1, 0] + MM_PEN * abs(s - 0)
                for sp in range(1, S):
                    best = np.minimum(
                        best, V[:, t - 1, sp] + MM_PEN * abs(s - sp))
                V[:, t, s] = E[:, t, s] + best
        rows = np.arange(nu)
        fin = V[rows, n_pts - 1, :]
        cost = fin.min(axis=1)
        end_seg = fin.argmin(axis=1)
        return pa.table({
            "user_id": pa.array(uu),
            "n_pts": pa.array(n_pts),
            "cost": pa.array(cost),
            "end_seg": pa.array(end_seg.astype(np.int64)),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_map_match() -> str:
    segs = _snap_segments()
    S = len(segs)
    T = MM_T
    L = oracle._lit
    proj_sql = oracle.projection_sql(
        _points_sql("events", "event_id"), CFG, id_cols=("event_id",))
    e_cols = []
    for s, (ax, ay, dxab, dyab, len2) in enumerate(segs):
        tcl = (f"least(greatest(((xm - {L(ax)}) * {L(dxab)}"
               f" + (ym - {L(ay)}) * {L(dyab)}) / {L(len2)},"
               f" {L(0.0)}), {L(1.0)})")
        e_cols.append(
            f"CAST(floor(((xm - ({L(ax)} + {tcl} * {L(dxab)}))"
            f" * (xm - ({L(ax)} + {tcl} * {L(dxab)}))"
            f" + (ym - ({L(ay)} + {tcl} * {L(dyab)}))"
            f" * (ym - ({L(ay)} + {tcl} * {L(dyab)}))) * {L(1e-6)})"
            f" AS BIGINT) AS e{s}")
    pivot = ", ".join(
        f"MAX(CASE WHEN rn = {t + 1} THEN e{s} END) AS e{t}{s}"
        for t in range(T) for s in range(S))
    dp = [f"e0{s} AS v0{s}" for s in range(S)]
    for t in range(1, T):
        for s in range(S):
            terms = ", ".join(
                f"v{t - 1}{sp} + {MM_PEN * abs(s - sp)}" for sp in range(S))
            dp.append(f"e{t}{s} + least({terms}) AS v{t}{s}")
    fin_cost, fin_seg = [], []
    for n in range(1, T + 1):
        vs = ", ".join(f"v{n - 1}{s}" for s in range(S))
        fin_cost.append(f"WHEN {n} THEN least({vs})")
        seg_case = " ".join(
            f"WHEN v{n - 1}{s} = least({vs}) THEN {s}" for s in range(S))
        fin_seg.append(f"WHEN {n} THEN (CASE {seg_case} END)")
    return f"""
WITH mmp AS MATERIALIZED (
  SELECT event_id, xm, ym FROM {proj_sql} q
),
mme AS MATERIALIZED (
  SELECT e.user_id, {", ".join(e_cols)},
    row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)
      AS rn
  FROM mmp p JOIN events e USING (event_id)
),
mmw AS MATERIALIZED (
  SELECT user_id, CAST(least(COUNT(*), {T}) AS BIGINT) AS n_pts, {pivot}
  FROM mme WHERE rn <= {T} GROUP BY user_id
),
mmd AS MATERIALIZED (
  SELECT user_id, n_pts, {", ".join(dp)} FROM mmw
)
SELECT user_id, n_pts,
  CASE n_pts {" ".join(fin_cost)} END AS cost,
  CAST(CASE n_pts {" ".join(fin_seg)} END AS BIGINT) AS end_seg
FROM mmd
"""


# ---------------------------------------------------------------------------
# Round 4c: per-user trip statistics (integer-quantized chord legs)
# ---------------------------------------------------------------------------

def q_trip_stats(sf_dir: str):
    """Trip-level mobility stats: each user's events ordered by (ts,
    event_id) form one trip; per-leg ECEF chord length is quantized to
    integer millimeters BEFORE summation (sqrt is IEEE exact-rounded,
    so floor(sqrt(d2) * 1e3) is bit-identical both sides and the SUM
    is an order-free integer fold).  Output per user: n_legs, total
    path length, longest leg, and mean leg length (integer division).
    ONE h(user) bucket exchange — the trajectory_segments shape."""
    from rhealpixdggs_py_ray.core import projection as proj
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        lon, lat = oracle.lonlat_from_id(eid)
        x, y, z = proj.xyz(CFG, lon, lat)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(eid.astype(np.int64)),
            "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        x = g["x"].to_numpy(zero_copy_only=False)[order]
        y = g["y"].to_numpy(zero_copy_only=False)[order]
        z = g["z"].to_numpy(zero_copy_only=False)[order]
        dx = x[1:] - x[:-1]
        dy = y[1:] - y[:-1]
        dz = z[1:] - z[:-1]
        d2 = dx * dx + dy * dy + dz * dz
        leg_mm = np.floor(np.sqrt(d2) * 1e3).astype(np.int64)
        same = uid[1:] == uid[:-1]
        uu, inv = np.unique(uid, return_inverse=True)
        n_legs = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n_legs, inv[1:][same], 1)
        tot = np.zeros(len(uu), dtype=np.int64)
        np.add.at(tot, inv[1:][same], leg_mm[same])
        mx = np.zeros(len(uu), dtype=np.int64)
        np.maximum.at(mx, inv[1:][same], leg_mm[same])
        mean = np.where(n_legs > 0, tot // np.maximum(n_legs, 1), 0)
        return pa.table({
            "user_id": pa.array(uu),
            "n_legs": pa.array(n_legs),
            "total_mm": pa.array(tot),
            "max_leg_mm": pa.array(mx),
            "mean_leg_mm": pa.array(mean),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_trip_stats() -> str:
    a = repr(CFG.a)
    e2 = repr(CFG.e**2)
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    nn = f"{a}/sqrt(1 - {e2}*sin(radians(lat))*sin(radians(lat)))"
    return f"""
WITH tsp AS MATERIALIZED (
  SELECT user_id, ts, event_id,
    {nn}*cos(radians(lon))*cos(radians(lat)) AS x,
    {nn}*sin(radians(lon))*cos(radians(lat)) AS y,
    {nn}*(1 - {e2})*sin(radians(lat)) AS z
  FROM (SELECT user_id, ts, event_id, {lon} AS lon, {lat} AS lat FROM events)
),
tsl AS MATERIALIZED (
  SELECT user_id,
    lag(x) OVER w AS px, lag(y) OVER w AS py, lag(z) OVER w AS pz, x, y, z
  FROM tsp WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tsm AS MATERIALIZED (
  SELECT user_id,
    CASE WHEN px IS NULL THEN NULL
      ELSE CAST(floor(sqrt((x-px)*(x-px) + (y-py)*(y-py) + (z-pz)*(z-pz))
        * 1000.0) AS BIGINT) END AS leg_mm
  FROM tsl
)
SELECT user_id,
  CAST(COUNT(leg_mm) AS BIGINT) AS n_legs,
  CAST(COALESCE(SUM(leg_mm), 0) AS BIGINT) AS total_mm,
  CAST(COALESCE(MAX(leg_mm), 0) AS BIGINT) AS max_leg_mm,
  CAST(CASE WHEN COUNT(leg_mm) > 0
    THEN COALESCE(SUM(leg_mm), 0) // COUNT(leg_mm) ELSE 0 END AS BIGINT)
    AS mean_leg_mm
FROM tsm GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Round 4c: Web-Mercator XYZ tile export (slippy-map interop)
# ---------------------------------------------------------------------------

WEBT_Z = 6


def q_web_tiles(sf_dir: str):
    """Slippy-map interop: count events per Web-Mercator XYZ tile at
    zoom WEBT_Z and emit the Bing-style quadkey for each occupied tile
    — the export shape every web-map ingestion expects.  The Mercator
    y uses the OSM formula (ln/tan/cos are the same libm on both
    sides; event lats stay within +/-84 so no clamp branch).  Tile
    keys pack to u64 -> ONE integer bucket exchange; quadkeys are
    built only on the folded (<= 4096-row) result.  Output (z, xt, yt,
    quadkey, n)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    Z = WEBT_Z
    n_side = 1 << Z
    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def tiles(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        xt = np.floor((lon + 180.0) / 360.0 * n_side).astype(np.int64)
        rad = np.radians(lat)
        yt = np.floor(
            (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi)
            / 2.0 * n_side).astype(np.int64)
        key = (yt * n_side + xt).astype(np.uint64)
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(tiles, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=8,
    )

    def stringify(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        yt = key // n_side
        xt = key % n_side
        digs = []
        for b in range(Z - 1, -1, -1):
            digs.append((((xt >> b) & 1) + 2 * ((yt >> b) & 1)).astype(np.int64))
        qk = np.array([''.join(str(d[i]) for d in digs)
                       for i in range(len(key))], dtype=object)
        return pa.table({
            "z": pa.array(np.full(len(key), Z, dtype=np.int64)),
            "xt": pa.array(xt),
            "yt": pa.array(yt),
            "quadkey": pa.array(qk, type=pa.string()),
            "n": pa.array(batch["n"]),
        })

    return folded.map_batches(stringify, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_web_tiles() -> str:
    Z = WEBT_Z
    n_side = 1 << Z
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    qk = " || ".join(
        f"CAST(((xt >> {b}) & 1) + 2 * ((yt >> {b}) & 1) AS VARCHAR)"
        for b in range(Z - 1, -1, -1))
    return f"""
WITH wtt AS MATERIALIZED (
  SELECT
    CAST(floor((lon + 180.0) / 360.0 * {n_side}) AS BIGINT) AS xt,
    CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
      / 2.0 * {n_side}) AS BIGINT) AS yt
  FROM (SELECT {lon} AS lon, {lat} AS lat FROM events)
)
SELECT CAST({Z} AS BIGINT) AS z, xt, yt, {qk} AS quadkey,
  CAST(COUNT(*) AS BIGINT) AS n
FROM wtt GROUP BY xt, yt
"""


# ---------------------------------------------------------------------------
# Round 4c: near-dup source matrix (where does duplication come from?)
# ---------------------------------------------------------------------------

def q_dup_source_matrix(sf_dir: str):
    """Curation analytics: the symmetric source-pair matrix of verified
    minhash near-dup pairs — which corpus sources duplicate each other
    (mirror sites, cross-posts) vs self-duplicate.  Reuses the cached
    pair set (_minhash_pairs) and attaches each endpoint's source code
    through the ONE fused attach exchange (ops/dedup.py
    _attach_pair_sides_fused, kv_mode=direct); per-bucket partial
    counts fold through one integer-key exchange.  Output (src_lo,
    src_hi, n_pairs)."""
    import pandas as pd
    import pyarrow.compute as pc

    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key
    from rhealpixdggs_py_ray.ops.dedup import (
        _attach_pair_sides_fused, _pair_sides_pivot)

    pairs = _minhash_pairs(sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"], blocks=4)

    def kv(batch: pa.Table) -> pa.Table:
        src = pc.cast(pc.utf8_slice_codeunits(batch["source"], 3, 10),
                      pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "src": src})

    kv_ds = docs.map_batches(kv, batch_format="pyarrow", zero_copy_batch=True)
    att = _attach_pair_sides_fused(
        pairs, kv_ds, pair_sums=[], val_cols=[("src", pa.int64())],
        kv_mode="direct",
    )

    def fin(m: pd.DataFrame) -> pd.DataFrame:
        sa = m["src_a"].to_numpy().astype(np.int64)
        sb = m["src_b"].to_numpy().astype(np.int64)
        key = np.minimum(sa, sb) * 1024 + np.maximum(sa, sb)
        ku, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": ku.astype(np.uint64),
                             "n": cnt.astype(np.int64)})

    part = _pair_sides_pivot(att, fin, ["src"])
    folded = sum_by_u64_key(part, "key", "n", "n_pairs", n_buckets=8)

    def stringify(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src_lo": pa.array(key // 1024),
            "src_hi": pa.array(key % 1024),
            "n_pairs": pa.array(batch["n_pairs"]),
        })

    return folded.map_batches(stringify, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_dup_source_matrix() -> str:
    from rhealpixdggs_py_ray.ops import dedup

    return f"""
WITH dsmp AS MATERIALIZED ({dedup.minhash_lsh_sql()}),
dsms AS MATERIALIZED (
  SELECT doc_id, CAST(substr(source, 4) AS BIGINT) AS src FROM documents
)
SELECT least(sa.src, sb.src) AS src_lo, greatest(sa.src, sb.src) AS src_hi,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM dsmp p JOIN dsms sa ON sa.doc_id = p.a JOIN dsms sb ON sb.doc_id = p.b
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 4c: embedding norm outliers (embedding-table quality control)
# ---------------------------------------------------------------------------

def q_embedding_norm_outliers(sf_dir: str):
    """Embedding QC: exact quartiles of the (micro-quantized) L2 norm
    distribution and the count of vectors outside the 1.5-IQR Tukey
    fences — the standard screen for broken/degenerate vectors before
    ANN indexing.  One streaming pass emits per-batch (norm, count)
    histogram partials; the driver folds the bounded histogram
    (<= #distinct micro-norms rows) and reads quartiles + outlier
    counts straight off the cumulative counts — no second corpus pass,
    nothing large on the driver.  Output one row (n, q1_micros,
    q3_micros, fence_lo, fence_hi, n_lo, n_hi)."""
    from rhealpixdggs_py_ray.ops.ann import _seq_norm
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["embedding"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        nm = np.floor(_seq_norm(M) * 1e6).astype(np.int64)
        uq, cnt = np.unique(nm, return_counts=True)
        return pa.table({"nm": pa.array(uq),
                         "c": pa.array(cnt.astype(np.int64))})

    hist: dict[int, int] = {}
    for bt in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        for v, c in zip(bt["nm"].to_numpy(zero_copy_only=False),
                        bt["c"].to_numpy(zero_copy_only=False)):
            hist[int(v)] = hist.get(int(v), 0) + int(c)
    vals = np.array(sorted(hist), dtype=np.int64)
    cnts = np.array([hist[int(v)] for v in vals], dtype=np.int64)
    n = int(cnts.sum())
    csum = np.cumsum(cnts)
    k1 = max((n + 1) // 4, 1)
    k3 = min((3 * (n + 1)) // 4, n)
    q1 = int(vals[np.searchsorted(csum, k1)])
    q3 = int(vals[np.searchsorted(csum, k3)])
    span = (3 * (q3 - q1)) // 2
    flo, fhi = q1 - span, q3 + span
    n_lo = int(cnts[vals < flo].sum())
    n_hi = int(cnts[vals > fhi].sum())
    return pa.table({
        "n": pa.array([n], type=pa.int64()),
        "q1_micros": pa.array([q1], type=pa.int64()),
        "q3_micros": pa.array([q3], type=pa.int64()),
        "fence_lo": pa.array([flo], type=pa.int64()),
        "fence_hi": pa.array([fhi], type=pa.int64()),
        "n_lo": pa.array([n_lo], type=pa.int64()),
        "n_hi": pa.array([n_hi], type=pa.int64()),
    })


def sql_embedding_norm_outliers() -> str:
    return """
WITH eno AS MATERIALIZED (
  SELECT CAST(floor(sqrt(list_sum(list_transform(embedding,
    x -> CAST(x AS DOUBLE) * x))) * 1000000.0) AS BIGINT) AS nm
  FROM embeddings
),
enr AS MATERIALIZED (
  SELECT nm, row_number() OVER (ORDER BY nm) AS r,
    COUNT(*) OVER () AS n
  FROM eno
),
enq AS MATERIALIZED (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
    MAX(CASE WHEN r = greatest((n + 1) // 4, 1) THEN nm END) AS q1_micros,
    MAX(CASE WHEN r = least((3 * (n + 1)) // 4, n) THEN nm END) AS q3_micros
  FROM enr
),
enf AS MATERIALIZED (
  SELECT n, q1_micros, q3_micros,
    q1_micros - (3 * (q3_micros - q1_micros)) // 2 AS fence_lo,
    q3_micros + (3 * (q3_micros - q1_micros)) // 2 AS fence_hi
  FROM enq
)
SELECT f.n, f.q1_micros, f.q3_micros, f.fence_lo, f.fence_hi,
  CAST((SELECT COUNT(*) FROM eno WHERE nm < f.fence_lo) AS BIGINT) AS n_lo,
  CAST((SELECT COUNT(*) FROM eno WHERE nm > f.fence_hi) AS BIGINT) AS n_hi
FROM enf f
"""


# ---------------------------------------------------------------------------
# Round 4c: user lifetime survival curve (retention analytics)
# ---------------------------------------------------------------------------

def q_survival_curve(sf_dir: str):
    """Retention survival: per user the observed lifetime in whole
    days (last event day - first event day), then the survival curve
    S(d) = #users with lifetime >= d for every observed lifetime d —
    all integers.  Per-batch (user -> min/max day) partials fold
    through ONE h(user) exchange; the tiny per-lifetime histogram
    resolves driver-side via cumulative counts (bounded by #distinct
    lifetimes).  Output (d, n_surviving, n_total)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(8)
    ds = _read(sf_dir, "events", columns=["user_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        day = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        )
        uu, inv = np.unique(uid, return_inverse=True)
        lo = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lo, inv, day)
        hi = np.full(len(uu), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(hi, inv, day)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uu, n_buckets)),
            "user_id": pa.array(uu.astype(np.int64)),
            "lo": pa.array(lo), "hi": pa.array(hi),
        })

    def resolve(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(uid, return_inverse=True)
        lo = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lo, inv, g["lo"].to_numpy(zero_copy_only=False))
        hi = np.full(len(uu), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(hi, inv, g["hi"].to_numpy(zero_copy_only=False))
        life = hi - lo
        lu, lc = np.unique(life, return_counts=True)
        return pa.table({"d": pa.array(lu),
                         "c": pa.array(lc.astype(np.int64))})

    hist: dict[int, int] = {}
    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    for bt in (
        part.groupby("bucket").map_groups(resolve, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        if bt.num_rows == 0 or "d" not in bt.column_names:
            continue
        for v, c in zip(bt["d"].to_numpy(zero_copy_only=False),
                        bt["c"].to_numpy(zero_copy_only=False)):
            hist[int(v)] = hist.get(int(v), 0) + int(c)
    ds_ = np.array(sorted(hist), dtype=np.int64)
    cs = np.array([hist[int(v)] for v in ds_], dtype=np.int64)
    n = int(cs.sum())
    # survivors at d = users with lifetime >= d (suffix sums)
    surv = (n - np.r_[0, np.cumsum(cs)[:-1]]).astype(np.int64)
    return pa.table({
        "d": pa.array(ds_),
        "n_surviving": pa.array(surv),
        "n_total": pa.array(np.full(len(ds_), n, dtype=np.int64)),
    })


def sql_survival_curve() -> str:
    return """
WITH svl AS MATERIALIZED (
  SELECT user_id,
    CAST(CAST(MAX(ts) AS DATE) - CAST(MIN(ts) AS DATE) AS BIGINT) AS life
  FROM events GROUP BY user_id
),
svh AS MATERIALIZED (
  SELECT life AS d, CAST(COUNT(*) AS BIGINT) AS c FROM svl GROUP BY life
)
SELECT d,
  CAST(SUM(c) OVER (ORDER BY d DESC) AS BIGINT) AS n_surviving,
  CAST(SUM(c) OVER () AS BIGINT) AS n_total
FROM svh ORDER BY d
"""


# ---------------------------------------------------------------------------
# Round 4c: per-doc n-gram novelty (corpus contribution accounting)
# ---------------------------------------------------------------------------

def q_ngram_novelty(sf_dir: str):
    """Novelty accounting (the dedup-report metric RefinedWeb-style
    pipelines publish): attribute every distinct shingle to its
    minimum doc_id OWNER; a doc's novelty is the share of its shingles
    it owns (1.0 = contributes only new text, ~0 = re-states earlier
    docs).  Exchange 1: hash(shingle) buckets -> per-bucket min-doc ->
    (owner, novel-count) partials; exchange 2: ONE h(doc) union
    exchange folds novel partials with map-side per-doc totals.
    Output (doc_id, n_grams, n_novel)."""
    import pandas as pd

    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64
    from rhealpixdggs_py_ray.ops.dedup import N_PAIR_BUCKETS, ShingleExploder

    sh = sizing.stateful_map(
        _docs(sf_dir), ShingleExploder, batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # two consumers (owners + totals): explode once

    npb = sizing.exchange_buckets(N_PAIR_BUCKETS)
    ndb = sizing.exchange_buckets(8)

    def add_bucket(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        bucket = (pd.util.hash_array(s) % np.uint64(npb)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    def owners(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "s" not in g.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "kind": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        s = g["s"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        su_, inv = np.unique(s, return_inverse=True)
        own = np.full(len(su_), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(own, inv, d)
        ou, oc = np.unique(own, return_counts=True)
        return pa.table({"doc_id": pa.array(ou),
                         "kind": pa.array(np.zeros(len(ou), dtype=np.int64)),
                         "v": pa.array(oc.astype(np.int64))})

    novel = (
        sh.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(owners, batch_format="pyarrow")
    )

    def totals(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        du, dc = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(du),
                         "kind": pa.array(np.ones(len(du), dtype=np.int64)),
                         "v": pa.array(dc.astype(np.int64))})

    tot = sh.map_batches(totals, batch_format="pyarrow", zero_copy_batch=True)

    def key2(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket2", pa.array(hash_bucket_u64(d, ndb)))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "doc_id" not in g.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_grams": pa.array([], type=pa.int64()),
                             "n_novel": pa.array([], type=pa.int64())})
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        kind = g["kind"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        du, inv = np.unique(d, return_inverse=True)
        ng = np.zeros(len(du), dtype=np.int64)
        np.add.at(ng, inv[kind == 1], v[kind == 1])
        nv = np.zeros(len(du), dtype=np.int64)
        np.add.at(nv, inv[kind == 0], v[kind == 0])
        return pa.table({"doc_id": pa.array(du),
                         "n_grams": pa.array(ng),
                         "n_novel": pa.array(nv)})

    both = novel.map_batches(
        key2, batch_format="pyarrow", zero_copy_batch=True
    ).union(tot.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True))
    return both.groupby("bucket2").map_groups(resolve, batch_format="pyarrow")


def sql_ngram_novelty() -> str:
    from rhealpixdggs_py_ray.ops.dedup import SHINGLE_W

    return f"""
WITH nvt AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
nvs AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM nvt, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
),
nvo AS MATERIALIZED (
  SELECT s, MIN(doc_id) AS owner FROM nvs GROUP BY s
),
nvn AS MATERIALIZED (
  SELECT owner AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
  FROM nvo GROUP BY owner
)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
  COALESCE(MAX(n.n_novel), 0) AS n_novel
FROM nvs t LEFT JOIN nvn n ON n.doc_id = t.doc_id
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# Round 4c: per-tile event-type diversity (Gini impurity, exact integers)
# ---------------------------------------------------------------------------

EVT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_tile_gini(sf_dir: str):
    """Spatial behavioral diversity: Gini impurity of the event-type
    mix per res-2 tile (the land-use-mix / audience-mix analytic) as a
    RATIONAL of exact integers — gini_e9 = (n^2 - sum cnt^2) * 1e9 //
    n^2 (char_diversity's ulp-safe rule).  Per-batch counts pack
    (tile top-bits << 3 | type code) into ONE u64-keyed exchange; the
    folded (<= tiles x 5 row) table resolves per tile in a second tiny
    integer exchange.  Output (tile_id, n_events, n_types, top_cnt,
    gini_e9)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"],
               blocks=4)
    codes = {t: i for i, t in enumerate(EVT_TYPES)}

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        code = np.array([codes[x] for x in et], dtype=np.uint64)
        key = ((u.astype(np.uint64) >> np.uint64(52)) << np.uint64(3)) | code
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "cnt", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        tile = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                >> np.uint64(3))
        return batch.append_column("bucket2",
                                   pa.array(hash_bucket_u64(tile, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"tile_id": pa.array([], type=pa.string()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_types": pa.array([], type=pa.int64()),
                             "top_cnt": pa.array([], type=pa.int64()),
                             "gini_e9": pa.array([], type=pa.int64())})
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        tile = key >> np.uint64(3)
        tu, inv = np.unique(tile, return_inverse=True)
        n = np.zeros(len(tu), dtype=np.int64)
        np.add.at(n, inv, cnt)
        s2 = np.zeros(len(tu), dtype=np.int64)
        np.add.at(s2, inv, cnt * cnt)
        nt = np.zeros(len(tu), dtype=np.int64)
        np.add.at(nt, inv, 1)
        top = np.zeros(len(tu), dtype=np.int64)
        np.maximum.at(top, inv, cnt)
        t_u64 = (tu << np.uint64(52)) | np.uint64(TILE_RES)
        return pa.table({
            "tile_id": pa.array(su.to_string_fixed(t_u64, TILE_RES),
                                type=pa.string()),
            "n_events": pa.array(n),
            "n_types": pa.array(nt),
            "top_cnt": pa.array(top),
            "gini_e9": pa.array(((n * n - s2) * 1_000_000_000) // (n * n)),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_tile_gini() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH tgi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
tgc AS MATERIALIZED (
  SELECT tl.cell_id AS tile_id, e.event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events e JOIN tgi tl ON e.event_id = tl.event_id
  GROUP BY 1, 2
)
SELECT tile_id,
  CAST(SUM(cnt) AS BIGINT) AS n_events,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(MAX(cnt) AS BIGINT) AS top_cnt,
  CAST((SUM(cnt) * SUM(cnt) - SUM(cnt * cnt)) * 1000000000
    // (SUM(cnt) * SUM(cnt)) AS BIGINT) AS gini_e9
FROM tgc GROUP BY tile_id
"""


# ---------------------------------------------------------------------------
# Round 4d: movement-heading histogram (integer octants, one exchange)
# ---------------------------------------------------------------------------


def q_heading_histogram(sf_dir: str):
    """Per-user movement-direction histogram: consecutive events (by
    ts, event_id) give a (dlon, dlat) step in integer microdegrees;
    the step buckets into one of 8 octants by SIGN and |dx| vs |dy|
    comparisons only — no atan2, so the bucket is an exact integer
    decision that replays bit-identically in SQL.  Octant code =
    4*(dy<0) + 2*(dx<0) + (|dy|>|dx|); 8 = zero step.  ONE h(user)
    bucket exchange (the trip_stats shape).  Output (user_id, octant,
    n) for occupied octants."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        lon, lat = oracle.lonlat_from_id(eid)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "user_id": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "event_id": pa.array(eid.astype(np.int64)),
            "xi": pa.array(np.floor(lon * 1e6).astype(np.int64)),
            "yi": pa.array(np.floor(lat * 1e6).astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        xi = g["xi"].to_numpy(zero_copy_only=False)[order]
        yi = g["yi"].to_numpy(zero_copy_only=False)[order]
        same = uid[1:] == uid[:-1]
        dx = (xi[1:] - xi[:-1])[same]
        dy = (yi[1:] - yi[:-1])[same]
        u = uid[1:][same]
        octant = (4 * (dy < 0) + 2 * (dx < 0)
                  + (np.abs(dy) > np.abs(dx))).astype(np.int64)
        octant[(dx == 0) & (dy == 0)] = 8
        key, cnt = np.unique(u * 16 + octant, return_counts=True)
        return pa.table({
            "user_id": pa.array(key // 16),
            "octant": pa.array(key % 16),
            "n": pa.array(cnt.astype(np.int64)),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_heading_histogram() -> str:
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    return f"""
WITH hhp AS MATERIALIZED (
  SELECT user_id, ts, event_id,
    CAST(floor({lon} * 1000000.0) AS BIGINT) AS xi,
    CAST(floor({lat} * 1000000.0) AS BIGINT) AS yi
  FROM events
),
hhd AS MATERIALIZED (
  SELECT user_id,
    xi - lag(xi) OVER w AS dx, yi - lag(yi) OVER w AS dy
  FROM hhp WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
  CAST(CASE WHEN dx = 0 AND dy = 0 THEN 8
    ELSE 4 * CASE WHEN dy < 0 THEN 1 ELSE 0 END
       + 2 * CASE WHEN dx < 0 THEN 1 ELSE 0 END
       + CASE WHEN abs(dy) > abs(dx) THEN 1 ELSE 0 END
  END AS BIGINT) AS octant,
  CAST(COUNT(*) AS BIGINT) AS n
FROM hhd WHERE dx IS NOT NULL
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 4d: per-user autocorrelation of hourly activity (exact integers)
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3)


def q_acf_lag(sf_dir: str):
    """Activity-rhythm autocorrelation: per-user hourly event counts
    c[h] (missing hours are implicit zeros), raw autocorrelation at
    lags 1..3 as exact integers — num = sum c[h]*c[h+L] (zero terms
    vanish, so only matching hour pairs contribute), den = sum c[h]^2,
    acf_e9 = num*1e9 // den.  Per-batch (user,hour) partial counts
    fold through ONE u64-keyed exchange; lags resolve per user bucket
    with sorted-key searchsorted matching.  Output (user_id, lag,
    num, den, acf_e9)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["user_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        hour = (ts // 3_600_000_000).astype(np.uint64)
        if len(uid) and int(uid.max()) >= (1 << 31):
            raise AssertionError("acf_lag packing needs user_id < 2^31")
        key = uid.astype(np.uint64) * np.uint64(1 << 32) + hour
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        uid = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
               >> np.uint64(32))
        return batch.append_column(
            "bucket2", pa.array(hash_bucket_u64(uid, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "lag": pa.array([], type=pa.int64()),
                          "num": pa.array([], type=pa.int64()),
                          "den": pa.array([], type=pa.int64()),
                          "acf_e9": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(key)
        key, c = key[order], c[order]
        uid = (key >> np.uint64(32)).astype(np.int64)
        uu, inv = np.unique(uid, return_inverse=True)
        den = np.zeros(len(uu), dtype=np.int64)
        np.add.at(den, inv, c * c)
        out_u, out_l, out_n, out_d = [], [], [], []
        for L in ACF_LAGS:
            tgt = key + np.uint64(L)
            pos = np.searchsorted(key, tgt)
            pos_c = np.minimum(pos, len(key) - 1)
            hit = (key[pos_c] == tgt) & (pos < len(key))
            num = np.zeros(len(uu), dtype=np.int64)
            np.add.at(num, inv[hit], c[hit] * c[pos_c[hit]])
            out_u.append(uu)
            out_l.append(np.full(len(uu), L, dtype=np.int64))
            out_n.append(num)
            out_d.append(den)
        return pa.table({
            "user_id": pa.array(np.concatenate(out_u)),
            "lag": pa.array(np.concatenate(out_l)),
            "num": pa.array(np.concatenate(out_n)),
            "den": pa.array(np.concatenate(out_d)),
            "acf_e9": pa.array(np.concatenate(out_n) * 1_000_000_000
                               // np.concatenate(out_d)),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_acf_lag() -> str:
    lags = ", ".join(str(x) for x in ACF_LAGS)
    return f"""
WITH afc AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
afd AS MATERIALIZED (
  SELECT user_id, CAST(SUM(c * c) AS BIGINT) AS den FROM afc GROUP BY 1
),
afl AS (SELECT unnest([{lags}]) AS lag),
afn AS MATERIALIZED (
  SELECT a.user_id, l.lag, CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS num
  FROM afc a CROSS JOIN afl l
  LEFT JOIN afc b ON b.user_id = a.user_id AND b.hour = a.hour + l.lag
  GROUP BY 1, 2
)
SELECT n.user_id, CAST(n.lag AS BIGINT) AS lag, n.num, d.den,
  CAST(n.num * 1000000000 // d.den AS BIGINT) AS acf_e9
FROM afn n JOIN afd d ON d.user_id = n.user_id
"""


# ---------------------------------------------------------------------------
# Round 4d: CUSUM changepoint over per-user daily activity (exact integers)
# ---------------------------------------------------------------------------


def q_cusum_changepoint(sf_dir: str):
    """Changepoint detection: per user, daily event counts over the
    user's own [first_day, last_day] span (missing days = 0); the
    CUSUM statistic at split k (1 <= k < n_days) is |n*P_k - k*T|
    where P_k is the k-day prefix sum and T the total — the mean-shift
    score scaled by n so everything stays integer.  The reported
    changepoint is the argmax split (ties -> earliest day).  Users
    with a single active day have no valid split and are excluded —
    mirrored in SQL.  ONE h(user) bucket exchange on per-batch
    (user, day) partials.  Output (user_id, n_days, total,
    change_day, score)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["user_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        if len(uid) and int(uid.max()) >= (1 << 31):
            raise AssertionError("cusum packing needs user_id < 2^31")
        key = uid.astype(np.uint64) * np.uint64(1 << 32) + day
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        uid = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
               >> np.uint64(32))
        return batch.append_column(
            "bucket2", pa.array(hash_bucket_u64(uid, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_days": pa.array([], type=pa.int64()),
                          "total": pa.array([], type=pa.int64()),
                          "change_day": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        uid = (key >> np.uint64(32)).astype(np.int64)
        day = (key & np.uint64((1 << 32) - 1)).astype(np.int64)
        out = {k: [] for k in ("user_id", "n_days", "total",
                               "change_day", "score")}
        for u in np.unique(uid):
            m = uid == u
            d, cc = day[m], c[m]
            d0, d1 = int(d.min()), int(d.max())
            n = d1 - d0 + 1
            if n < 2:
                continue
            dense = np.zeros(n, dtype=np.int64)
            dense[d - d0] = cc
            pref = np.cumsum(dense)[:-1]          # P_1 .. P_{n-1}
            k = np.arange(1, n, dtype=np.int64)
            score = np.abs(n * pref - k * int(pref[-1] + dense[-1]))
            best = int(np.argmax(score))          # first max = earliest day
            out["user_id"].append(u)
            out["n_days"].append(n)
            out["total"].append(int(dense.sum()))
            out["change_day"].append(d0 + best + 1)
            out["score"].append(int(score[best]))
        return pa.table({k: pa.array(np.array(v, dtype=np.int64))
                         for k, v in out.items()})

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_cusum_changepoint() -> str:
    return """
WITH cuc AS MATERIALIZED (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
cur AS MATERIALIZED (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1,
    CAST(SUM(c) AS BIGINT) AS total
  FROM cuc GROUP BY 1 HAVING MAX(day) > MIN(day)
),
cud AS MATERIALIZED (
  SELECT r.user_id, r.d0, r.d1, r.total,
    unnest(generate_series(r.d0, r.d1)) AS day
  FROM cur r
),
cup AS MATERIALIZED (
  SELECT d.user_id, d.day, d.d0, d.d1, d.total,
    SUM(COALESCE(c.c, 0)) OVER (
      PARTITION BY d.user_id ORDER BY d.day
      ROWS UNBOUNDED PRECEDING) AS pref
  FROM cud d LEFT JOIN cuc c ON c.user_id = d.user_id AND c.day = d.day
),
cus AS (
  SELECT user_id, d1 - d0 + 1 AS n_days, total, day + 1 AS change_day,
    abs((d1 - d0 + 1) * pref - (day - d0 + 1) * total) AS score
  FROM cup WHERE day < d1
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days, total,
  CAST(change_day AS BIGINT) AS change_day, CAST(score AS BIGINT) AS score
FROM cus
QUALIFY row_number() OVER (
  PARTITION BY user_id ORDER BY score DESC, change_day ASC) = 1
"""


# ---------------------------------------------------------------------------
# Round 4d: geohash export (base32 interop, exact integer interleave)
# ---------------------------------------------------------------------------

GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
GH_PREC = 5  # 25 bits: 13 lon + 12 lat, lon leads (standard geohash)


def q_geohash_encode(sf_dir: str):
    """Geohash interop export: count events per precision-5 geohash
    (the join key for the external geohash ecosystems, like web_tiles
    is for slippy maps).  xi = floor((lon+180)/360 * 2^13) and yi =
    floor((lat+90)/180 * 2^12) are single exact-rounded IEEE ops, so
    both sides derive identical integers; the 25-bit interleave
    (lon on even bit positions from the LSB, per the standard) and the
    base32 digits are pure integer/bit arithmetic.  ONE u64 exchange;
    strings built only on the folded result.  Output (geohash, n)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def code(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        xi = np.floor((lon + 180.0) / 360.0 * 8192.0).astype(np.int64)
        yi = np.floor((lat + 90.0) / 180.0 * 4096.0).astype(np.int64)
        g = np.zeros(len(xi), dtype=np.int64)
        for j in range(13):
            g |= ((xi >> j) & 1) << (2 * j)
        for j in range(12):
            g |= ((yi >> j) & 1) << (2 * j + 1)
        return pa.table({
            "key": pa.array(g.astype(np.uint64), type=pa.uint64()),
            "one": pa.array(np.ones(len(g), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(code, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=8,
    )

    alpha = np.frombuffer(GH_ALPHA.encode(), dtype=np.uint8)

    def stringify(batch: pa.Table) -> pa.Table:
        g = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        chars = np.empty((len(g), GH_PREC), dtype=np.uint8)
        for i in range(GH_PREC):
            chars[:, i] = alpha[(g >> (5 * (GH_PREC - 1 - i))) & 31]
        gh = chars.tobytes()
        out = [gh[i * GH_PREC:(i + 1) * GH_PREC].decode() for i in
               range(len(g))]
        return pa.table({"geohash": pa.array(out, type=pa.string()),
                         "n": batch["n"]})

    return folded.map_batches(stringify, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_geohash_encode() -> str:
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    inter = " + ".join(
        [f"((xi // {1 << j}) % 2) * {1 << (2 * j)}" for j in range(13)]
        + [f"((yi // {1 << j}) % 2) * {1 << (2 * j + 1)}" for j in range(12)]
    )
    digits = " || ".join(
        f"substr('{GH_ALPHA}', CAST((g // {1 << (5 * (GH_PREC - 1 - i))})"
        f" % 32 AS INTEGER) + 1, 1)"
        for i in range(GH_PREC)
    )
    return f"""
WITH ghq AS MATERIALIZED (
  SELECT CAST(floor(({lon} + 180.0) / 360.0 * 8192.0) AS BIGINT) AS xi,
    CAST(floor(({lat} + 90.0) / 180.0 * 4096.0) AS BIGINT) AS yi
  FROM events
),
ghg AS MATERIALIZED (
  SELECT {inter} AS g, CAST(COUNT(*) AS BIGINT) AS n FROM ghq GROUP BY 1
)
SELECT {digits} AS geohash, n FROM ghg
"""


# ---------------------------------------------------------------------------
# Round 4d: tile-to-tile audience similarity (Jaccard over user sets)
# ---------------------------------------------------------------------------


def q_tile_similarity(sf_dir: str):
    """Audience overlap between spatial tiles: for every pair of res-2
    tiles sharing at least one visitor, the Jaccard similarity of
    their DISTINCT user sets (the place-similarity analytic behind
    "people who visit A also visit B").  Distinct (user, tile) visits
    fold through one u64 exchange; within-user tile pairs (bounded by
    each user's distinct-tile count) fold through a second; per-tile
    user counts are a <= 486-row table (res-2 cell count) gathered on
    the driver and closed over the final map.  Output (tile_a, tile_b,
    n_common, n_a, n_b, jacc_e9)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)

    def visits(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        if len(uid) and int(uid.max()) >= (1 << 31):
            raise AssertionError("tile_similarity needs user_id < 2^31")
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = (u.astype(np.uint64) >> np.uint64(52)).astype(np.uint64)
        key = np.unique((uid.astype(np.uint64) << np.uint64(12)) | tile)
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    dvis = sum_by_u64_key(
        ds.map_batches(visits, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "m", n_buckets=8,
    ).materialize()  # bounded: <= n_users x 486 distinct visit rows

    # per-tile distinct-user counts: <= 486 rows, combined on the driver
    tile_users: dict[int, int] = {}
    for b in dvis.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        t = (b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
             & np.uint64((1 << 12) - 1))
        tu, tc = np.unique(t, return_counts=True)
        for k, c in zip(tu.tolist(), tc.tolist()):
            tile_users[k] = tile_users.get(k, 0) + c

    def by_user(batch: pa.Table) -> pa.Table:
        uid = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
               >> np.uint64(12))
        return batch.append_column(
            "bucket2", pa.array(hash_bucket_u64(uid, 8)))

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"pkey": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        key = np.sort(g["key"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
        uid = key >> np.uint64(12)
        tile = key & np.uint64((1 << 12) - 1)
        # within-user (ta < tb) pairs; sorted key => tiles sorted per user
        uu, start = np.unique(uid, return_index=True)
        cnt = np.diff(np.append(start, len(uid)))
        out = []
        for s, c in zip(start.tolist(), cnt.tolist()):
            t = tile[s:s + c]
            ia, ib = np.triu_indices(c, k=1)
            out.append((t[ia] << np.uint64(12)) | t[ib])
        pk = np.concatenate(out) if out else np.array([], dtype=np.uint64)
        return pa.table({
            "pkey": pa.array(pk, type=pa.uint64()),
            "one": pa.array(np.ones(len(pk), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        dvis.map_batches(by_user, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("bucket2").map_groups(pairs, batch_format="pyarrow"),
        "pkey", "one", "n_common", n_buckets=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        pk = batch["pkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        nc = batch["n_common"].to_numpy(zero_copy_only=False)
        ta = (pk >> np.uint64(12)).astype(np.uint64)
        tb = (pk & np.uint64((1 << 12) - 1)).astype(np.uint64)
        na = np.array([tile_users[int(x)] for x in ta], dtype=np.int64)
        nb_ = np.array([tile_users[int(x)] for x in tb], dtype=np.int64)
        res = np.uint64(TILE_RES)
        return pa.table({
            "tile_a": pa.array(su.to_string_fixed(
                (ta << np.uint64(52)) | res, TILE_RES), type=pa.string()),
            "tile_b": pa.array(su.to_string_fixed(
                (tb << np.uint64(52)) | res, TILE_RES), type=pa.string()),
            "n_common": pa.array(nc),
            "n_a": pa.array(na),
            "n_b": pa.array(nb_),
            "jacc_e9": pa.array(nc * 1_000_000_000 // (na + nb_ - nc)),
        })

    return folded.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_tile_similarity() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH tsv AS MATERIALIZED (
  SELECT DISTINCT e.user_id, t.cell_id AS tile
  FROM events e JOIN (SELECT event_id, cell_id FROM {idx_sql} q) t
    ON t.event_id = e.event_id
),
tsn AS MATERIALIZED (
  SELECT tile, CAST(COUNT(*) AS BIGINT) AS nu FROM tsv GROUP BY 1
),
tsp AS MATERIALIZED (
  SELECT a.tile AS tile_a, b.tile AS tile_b,
    CAST(COUNT(*) AS BIGINT) AS n_common
  FROM tsv a JOIN tsv b ON a.user_id = b.user_id AND a.tile < b.tile
  GROUP BY 1, 2
)
SELECT p.tile_a, p.tile_b, p.n_common, na.nu AS n_a, nb.nu AS n_b,
  CAST(p.n_common * 1000000000 // (na.nu + nb.nu - p.n_common) AS BIGINT)
    AS jacc_e9
FROM tsp p
JOIN tsn na ON na.tile = p.tile_a
JOIN tsn nb ON nb.tile = p.tile_b
"""


# ---------------------------------------------------------------------------
# Round 4d: co-presence user graph (shared res-2 tile-day) + graph analytics
# ---------------------------------------------------------------------------

CN_DEG = 32   # per-middle neighbor cap for wedge generation (deterministic:
              # the CN_DEG smallest neighbor ids; row_number mirror in SQL)
KCORE_K = 3
KCORE_ITERS = 8

_copresence_cache: dict[str, "ray.data.Dataset"] = {}


def _copresence_edges(sf_dir: str):
    """Undirected user-user edges (ua < ub): the two users share at
    least one distinct (res-2 tile, epoch day) visit.  Distinct visits
    fold through one u64 exchange; per-(tile,day) groups emit pair
    partials (group size bounded by concurrent visitors of one tile on
    one day); a second fold dedups edges.  Cached per sf_dir and
    MATERIALIZED (one process = one Ray session in every entry path)
    because common_neighbors and k_core both consume it."""
    hit = _copresence_cache.get(sf_dir)
    if hit is not None:
        return hit
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def visits(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        if len(uid) and (int(uid.max()) >= (1 << 31)
                         or int(day.max()) >= (1 << 15)):
            raise AssertionError(
                "copresence packing needs user_id < 2^31, epoch day < 2^15"
                " (valid until 2059; repack if fixtures move)")
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        key = np.unique(((tile << np.uint64(15)) | day) << np.uint64(32)
                        | uid.astype(np.uint64))
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    dvis = sum_by_u64_key(
        ds.map_batches(visits, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "m", n_buckets=8,
    )

    def by_td(batch: pa.Table) -> pa.Table:
        td = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
              >> np.uint64(32))
        return batch.append_column(
            "bucket2", pa.array(hash_bucket_u64(td, 8)))

    def pair_partials(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        key = np.sort(g["key"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
        td = key >> np.uint64(32)
        uid = key & np.uint64((1 << 32) - 1)
        _, start = np.unique(td, return_index=True)
        cnt = np.diff(np.append(start, len(td)))
        out = []
        for s, c in zip(start.tolist(), cnt.tolist()):
            u = uid[s:s + c]  # sorted (key sorted within equal td prefix)
            ia, ib = np.triu_indices(c, k=1)
            out.append((u[ia] << np.uint64(32)) | u[ib])
        ek = np.concatenate(out) if out else np.array([], dtype=np.uint64)
        ek = np.unique(ek)
        return pa.table({
            "key": pa.array(ek, type=pa.uint64()),
            "one": pa.array(np.ones(len(ek), dtype=np.int64)),
        })

    edges = sum_by_u64_key(
        dvis.map_batches(by_td, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(pair_partials, batch_format="pyarrow"),
        "key", "one", "w", n_buckets=8,
    ).materialize()
    _copresence_cache[sf_dir] = edges
    return edges


def _copresence_sql_ctes() -> str:
    """Shared cnv/cne CTE text: distinct visits + deduped edges."""
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
cnv AS MATERIALIZED (
  SELECT DISTINCT e.user_id, t.cell_id AS tile,
    epoch_us(e.ts) // 86400000000 AS day
  FROM events e JOIN (SELECT event_id, cell_id FROM {idx_sql} q) t
    ON t.event_id = e.event_id
),
cne AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
  FROM cnv a JOIN cnv b
    ON a.tile = b.tile AND a.day = b.day AND a.user_id < b.user_id
)"""


def q_common_neighbors(sf_dir: str):
    """Link prediction by common-neighbor count: for every NON-adjacent
    user pair of the co-presence graph, the number of shared neighbors
    (friend-of-friend recommendation).  Wedges are generated from each
    middle node's CN_DEG smallest-id neighbors (the deterministic
    degree cap that bounds wedge fan-out at scale; SQL mirrors it with
    row_number).  Adjacency is eliminated IN the same fold: edge rows
    enter the wedge exchange carrying -2^40, so any folded sum < 0
    means the pair is already an edge — no join operator, no broadcast.
    Output (user_a, user_b, n_common)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    edges = _copresence_edges(sf_dir)
    EDGE_MARK = np.int64(-(1 << 40))

    def directed(batch: pa.Table) -> pa.Table:
        ek = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ua = ek >> np.uint64(32)
        ub = ek & np.uint64((1 << 32) - 1)
        m = np.concatenate([ua, ub])
        x = np.concatenate([ub, ua])
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(m, 8)),
            "m": pa.array(m, type=pa.uint64()),
            "x": pa.array(x, type=pa.uint64()),
        })

    def wedges(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "m" not in g.column_names:
            return pa.table({"pkey": pa.array([], type=pa.uint64()),
                             "v": pa.array([], type=pa.int64())})
        m = g["m"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((x, m))
        m, x = m[order], x[order]
        _, start = np.unique(m, return_index=True)
        cnt = np.diff(np.append(start, len(m)))
        out = []
        for s, c in zip(start.tolist(), cnt.tolist()):
            nb_ = x[s:s + min(c, CN_DEG)]  # CN_DEG smallest ids (sorted)
            ia, ib = np.triu_indices(len(nb_), k=1)
            out.append((nb_[ia] << np.uint64(32)) | nb_[ib])
        pk = np.concatenate(out) if out else np.array([], dtype=np.uint64)
        return pa.table({
            "pkey": pa.array(pk, type=pa.uint64()),
            "v": pa.array(np.ones(len(pk), dtype=np.int64)),
        })

    def edge_marks(batch: pa.Table) -> pa.Table:
        ek = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "pkey": pa.array(ek, type=pa.uint64()),
            "v": pa.array(np.full(len(ek), EDGE_MARK)),
        })

    wedge_partials = (
        edges.map_batches(directed, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("bucket").map_groups(wedges, batch_format="pyarrow")
    )
    marks = edges.map_batches(edge_marks, batch_format="pyarrow",
                              zero_copy_batch=True)
    folded = sum_by_u64_key(wedge_partials.union(marks), "pkey", "v",
                            "n_common", n_buckets=8)

    def finish(batch: pa.Table) -> pa.Table:
        pk = batch["pkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["n_common"].to_numpy(zero_copy_only=False)
        keep = v > 0
        pk, v = pk[keep], v[keep]
        return pa.table({
            "user_a": pa.array((pk >> np.uint64(32)).astype(np.int64)),
            "user_b": pa.array((pk & np.uint64((1 << 32) - 1))
                               .astype(np.int64)),
            "n_common": pa.array(v),
        })

    return folded.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_common_neighbors() -> str:
    return f"""
WITH {_copresence_sql_ctes()},
cnd AS MATERIALIZED (
  SELECT ua AS m, ub AS x FROM cne UNION ALL SELECT ub AS m, ua AS x FROM cne
),
cnn AS MATERIALIZED (
  SELECT m, x FROM (
    SELECT m, x, row_number() OVER (PARTITION BY m ORDER BY x) AS rn FROM cnd
  ) WHERE rn <= {CN_DEG}
),
cnw AS MATERIALIZED (
  SELECT n1.x AS ua, n2.x AS ub, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM cnn n1 JOIN cnn n2 ON n1.m = n2.m AND n1.x < n2.x
  GROUP BY 1, 2
)
SELECT CAST(w.ua AS BIGINT) AS user_a, CAST(w.ub AS BIGINT) AS user_b,
  w.n_common
FROM cnw w
WHERE NOT EXISTS (SELECT 1 FROM cne e WHERE e.ua = w.ua AND e.ub = w.ub)
"""


def q_k_core(sf_dir: str):
    """K-core decomposition (KCORE_K, KCORE_ITERS unrolled peel
    rounds): repeatedly drop users whose degree within the surviving
    edge set is < K, then drop edges touching a dropped user; report
    the endpoints of the final edge set with their within-core degree.
    The edge list is the cached co-presence graph; peeling runs on the
    driver over the gathered edge array (bounded: asserts <= 8M edges,
    the ops/cc.py driver-union-find cap — beyond it the peel IS the
    2-exchange/iteration distributed degree-filter loop,
    ops/graph.k_core_distributed, parity-pinned in tests).  Output
    (user_id, deg)."""
    edges = _copresence_edges(sf_dir)
    if edges.count() > 8_000_000:  # driver peel cap (see ops/cc.py)
        from rhealpixdggs_py_ray.ops.graph import k_core_distributed
        return k_core_distributed(edges, KCORE_K, KCORE_ITERS)
    parts = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b["key"].to_numpy(zero_copy_only=False)
                         .astype(np.uint64))
    ek = (np.concatenate(parts) if parts
          else np.array([], dtype=np.uint64))
    ua = (ek >> np.uint64(32)).astype(np.int64)
    ub = (ek & np.uint64((1 << 32) - 1)).astype(np.int64)
    for _ in range(KCORE_ITERS):
        if not len(ua):
            break
        u, c = np.unique(np.concatenate([ua, ub]), return_counts=True)
        alive = u[c >= KCORE_K]
        m = np.isin(ua, alive) & np.isin(ub, alive)
        if m.all():
            break  # fixpoint: later rounds are identity
        ua, ub = ua[m], ub[m]
    u, c = (np.unique(np.concatenate([ua, ub]), return_counts=True)
            if len(ua) else (np.array([], dtype=np.int64),
                             np.array([], dtype=np.int64)))
    return pa.table({
        "user_id": pa.array(u.astype(np.int64)),
        "deg": pa.array(c.astype(np.int64)),
    })


def sql_k_core() -> str:
    steps = []
    prev = "cne"
    prev_nodes = ("(SELECT ua AS u FROM cne UNION "
                  "SELECT ub AS u FROM cne)")
    for i in range(KCORE_ITERS):
        steps.append(f"""
kdeg{i} AS MATERIALIZED (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT ua AS u FROM {prev} UNION ALL SELECT ub AS u FROM {prev}
  ) GROUP BY 1
),
kal{i} AS MATERIALIZED (
  SELECT u FROM kdeg{i} WHERE deg >= {KCORE_K}
),
ked{i} AS MATERIALIZED (
  SELECT e.ua, e.ub FROM {prev} e
  JOIN kal{i} x ON x.u = e.ua JOIN kal{i} y ON y.u = e.ub
)""")
        prev = f"ked{i}"
    body = ",".join(steps)
    return f"""
WITH {_copresence_sql_ctes()},{body}
SELECT u AS user_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
  SELECT ua AS u FROM {prev} UNION ALL SELECT ub AS u FROM {prev}
) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round 4d: first-order Markov transitions over event types
# ---------------------------------------------------------------------------


def q_markov_transitions(sf_dir: str):
    """Behavioral Markov chain: global transition counts between
    consecutive event types per user (ordered by ts, event_id) and the
    row-normalized transition probability as an exact integer ratio
    p_e9 = n * 1e9 // row_total.  ONE h(user) bucket exchange emits
    packed (prev*8 | next) partial counts; the folded table is <= 25
    rows (5 event types), combined on the driver (resumable_tiling
    precedent for tiny final merges).  Output (prev_type, next_type,
    n, p_e9)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    codes = {t: i for i, t in enumerate(EVT_TYPES)}
    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        code = np.array([codes[x] for x in et], dtype=np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "eid": pa.array(eid.astype(np.int64)),
            "code": pa.array(code),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "uid" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        code = g["code"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, code = uid[order], code[order]
        same = uid[1:] == uid[:-1]
        key = (code[:-1][same] * 8 + code[1:][same]).astype(np.uint64)
        uq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uq, type=pa.uint64()),
                         "one": pa.array(cnt.astype(np.int64))})

    folded = sum_by_u64_key(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow"),
        "key", "one", "n", n_buckets=4,
    )
    # <= 25 rows: combine on the driver
    keys, ns = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            keys.append(b["key"].to_numpy(zero_copy_only=False))
            ns.append(b["n"].to_numpy(zero_copy_only=False))
    key = np.concatenate(keys).astype(np.int64)
    n = np.concatenate(ns)
    prev, nxt = key // 8, key % 8
    row_tot = np.zeros(len(EVT_TYPES), dtype=np.int64)
    np.add.at(row_tot, prev, n)
    types = np.array(EVT_TYPES, dtype=object)
    return pa.table({
        "prev_type": pa.array(types[prev], type=pa.string()),
        "next_type": pa.array(types[nxt], type=pa.string()),
        "n": pa.array(n),
        "p_e9": pa.array(n * 1_000_000_000 // row_tot[prev]),
    })


def sql_markov_transitions() -> str:
    return """
WITH mkp AS MATERIALIZED (
  SELECT event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev
  FROM events
),
mkc AS MATERIALIZED (
  SELECT prev AS prev_type, event_type AS next_type,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM mkp WHERE prev IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
  CAST(n * 1000000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
    AS p_e9
FROM mkc
"""


# ---------------------------------------------------------------------------
# Round 4d: Zipf rank-frequency slope over word bigrams
# ---------------------------------------------------------------------------

ZIPF_K = 256


def q_zipf_slope(sf_dir: str):
    """Corpus naturalness check: least-squares slope of ln(freq) vs
    ln(rank) over the top-ZIPF_K word bigrams (count DESC, gram ASC) —
    natural text sits near -1.  ln is bit-identical libm both sides;
    each term quantizes to integer micros BEFORE the sums, and the
    bignum regression (driver Python ints / SQL HUGEINT — the sums
    overflow int64 by design) is exact on both sides.  Distributed
    shape: vocab-style disjoint-bucket exact top-K, tiny driver
    finish.  Output one row (k, slope_e6, intercept_e6)."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for t in batch["text"].to_pylist():
            toks = t.split()
            grams.extend(" ".join(toks[i:i + 2])
                         for i in range(len(toks) - 1))
        if not grams:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "bucket": pa.array([], type=pa.int64())})
        uq, cnt = np.unique(np.asarray(grams, dtype=object),
                            return_counts=True)
        bucket = (pd.util.hash_array(uq) % 8).astype(np.int64)
        return pa.table({"s": pa.array(uq, type=pa.string()),
                         "n": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(bucket)})

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "s" not in g.column_names:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        uq, inv = np.unique(g["s"].to_numpy(zero_copy_only=False),
                            return_inverse=True)
        tot = np.zeros(len(uq), dtype=np.int64)
        np.add.at(tot, inv, g["n"].to_numpy(zero_copy_only=False))
        order = np.lexsort((uq, -tot))[:ZIPF_K]
        return pa.table({"s": pa.array(uq[order], type=pa.string()),
                         "n": pa.array(tot[order])})

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    )
    s_all, n_all = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            s_all.extend(b["s"].to_pylist())
            n_all.extend(b["n"].to_pylist())
    order = sorted(range(len(s_all)), key=lambda i: (-n_all[i], s_all[i]))
    order = order[:ZIPF_K]
    k = len(order)
    # exact bignum regression over quantized ln terms
    import math
    Sx = Sy = Sxx = Sxy = 0
    for rank, i in enumerate(order, start=1):
        x = math.floor(math.log(float(rank)) * 1_000_000)
        y = math.floor(math.log(float(n_all[i])) * 1_000_000)
        Sx += x
        Sy += y
        Sxx += x * x
        Sxy += x * y
    den = k * Sxx - Sx * Sx
    num = k * Sxy - Sx * Sy

    def tdiv(a: int, b: int) -> int:
        # DuckDB integer // truncates toward zero; Python floors —
        # mirror DuckDB (the CLAUDE.md negative-mod rule, division form)
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    slope_e6 = tdiv(num * 1_000_000, den) if den else 0
    intercept_e6 = tdiv(Sy - tdiv(slope_e6 * Sx, 1_000_000), k)
    return pa.table({
        "k": pa.array([k], type=pa.int64()),
        "slope_e6": pa.array([slope_e6], type=pa.int64()),
        "intercept_e6": pa.array([intercept_e6], type=pa.int64()),
    })


def sql_zipf_slope() -> str:
    return f"""
WITH zpt AS MATERIALIZED (
  SELECT string_split(text, ' ') AS toks FROM documents
),
zpg AS MATERIALIZED (
  SELECT toks[i] || ' ' || toks[i + 1] AS s
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM zpt)
),
zpc AS MATERIALIZED (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM zpg GROUP BY 1
),
zpr AS MATERIALIZED (
  SELECT s, n, row_number() OVER (ORDER BY n DESC, s ASC) AS rank
  FROM zpc QUALIFY rank <= {ZIPF_K}
),
zpq AS MATERIALIZED (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS HUGEINT) AS x,
    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT) AS y
  FROM zpr
),
zps AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM zpq
)
SELECT CAST(k AS BIGINT) AS k,
  CAST((k * sxy - sx * sy) * 1000000 // (k * sxx - sx * sx) AS BIGINT)
    AS slope_e6,
  CAST((sy - ((k * sxy - sx * sy) * 1000000 // (k * sxx - sx * sx))
    * sx // 1000000) // k AS BIGINT) AS intercept_e6
FROM zps
"""


# ---------------------------------------------------------------------------
# Round 4d: per-user convex hull (exact integer hull edges)
# ---------------------------------------------------------------------------

HULL_CAP = 32


def q_convex_hull(sf_dir: str):
    """Per-user convex hull of visited locations: over each user's
    HULL_CAP smallest event_ids, quantize (lon, lat) to integer
    microdegrees, dedupe, and emit every directed hull edge (a, b) —
    defined declaratively so degeneracies replay exactly: all other
    points have cross((b-a), (c-a)) >= 0 and none is collinear strictly
    inside the segment's bbox.  The engine evaluates the same rule as
    one vectorized n^3 integer tensor per user (n <= 32 -> 33k ops;
    the at-scale path for bigger n is a monotone-chain per group).
    Cross products stay < 1.2e17 << 2^63.  Output (user_id, x1, y1,
    x2, y2) directed CCW edges."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "eid": pa.array(eid.astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "x1": pa.array([], type=pa.int64()),
                          "y1": pa.array([], type=pa.int64()),
                          "x2": pa.array([], type=pa.int64()),
                          "y2": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "uid" not in g.column_names:
            return empty
        uid = g["uid"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, uid))
        uid, eid = uid[order], eid[order]
        uu, start = np.unique(uid, return_index=True)
        cnt = np.diff(np.append(start, len(uid)))
        out_u, out = [], []
        for u, s, c in zip(uu.tolist(), start.tolist(), cnt.tolist()):
            ids = eid[s:s + min(c, HULL_CAP)]
            lon, lat = oracle.lonlat_from_id(ids)
            x = np.floor(lon * 1e6).astype(np.int64)
            y = np.floor(lat * 1e6).astype(np.int64)
            pts = np.unique(np.stack([x, y], axis=1), axis=0)
            n = len(pts)
            if n < 2:
                continue
            X, Y = pts[:, 0], pts[:, 1]
            # cross[i,j,k] = (xj-xi)*(yk-yi) - (yj-yi)*(xk-xi)
            dxj = X[None, :, None] - X[:, None, None]
            dyj = Y[None, :, None] - Y[:, None, None]
            dxk = X[None, None, :] - X[:, None, None]
            dyk = Y[None, None, :] - Y[:, None, None]
            cross = dxj * dyk - dyj * dxk
            left_ok = (cross >= 0).all(axis=2)
            lox = np.minimum(X[:, None], X[None, :])[:, :, None]
            hix = np.maximum(X[:, None], X[None, :])[:, :, None]
            loy = np.minimum(Y[:, None], Y[None, :])[:, :, None]
            hiy = np.maximum(Y[:, None], Y[None, :])[:, :, None]
            inbox = ((X[None, None, :] >= lox) & (X[None, None, :] <= hix)
                     & (Y[None, None, :] >= loy) & (Y[None, None, :] <= hiy))
            is_a = np.zeros((n, n, n), dtype=bool)
            idx_n = np.arange(n)
            is_a[idx_n, :, idx_n] = True
            is_b = np.zeros((n, n, n), dtype=bool)
            is_b[:, idx_n, idx_n] = True
            bad = ((cross == 0) & inbox & ~is_a & ~is_b).any(axis=2)
            edge = left_ok & ~bad & ~np.eye(n, dtype=bool)
            ii, jj = np.nonzero(edge)
            if len(ii):
                out_u.append(np.full(len(ii), u, dtype=np.int64))
                out.append(np.stack([X[ii], Y[ii], X[jj], Y[jj]], axis=1))
        if not out:
            return empty
        e = np.concatenate(out)
        return pa.table({
            "user_id": pa.array(np.concatenate(out_u)),
            "x1": pa.array(e[:, 0]), "y1": pa.array(e[:, 1]),
            "x2": pa.array(e[:, 2]), "y2": pa.array(e[:, 3]),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_convex_hull() -> str:
    lon, lat = oracle.lonlat_from_id_sql("event_id")
    return f"""
WITH chp AS MATERIALIZED (
  SELECT user_id, event_id FROM (
    SELECT user_id, event_id,
      row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
    FROM events
  ) WHERE rn <= {HULL_CAP}
),
chq AS MATERIALIZED (
  SELECT DISTINCT user_id,
    CAST(floor({lon} * 1000000.0) AS BIGINT) AS x,
    CAST(floor({lat} * 1000000.0) AS BIGINT) AS y
  FROM chp
)
SELECT a.user_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
FROM chq a JOIN chq b
  ON a.user_id = b.user_id AND (a.x <> b.x OR a.y <> b.y)
WHERE NOT EXISTS (
    SELECT 1 FROM chq c WHERE c.user_id = a.user_id
      AND (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) < 0)
  AND NOT EXISTS (
    SELECT 1 FROM chq c WHERE c.user_id = a.user_id
      AND NOT (c.x = a.x AND c.y = a.y) AND NOT (c.x = b.x AND c.y = b.y)
      AND (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) = 0
      AND c.x BETWEEN least(a.x, b.x) AND greatest(a.x, b.x)
      AND c.y BETWEEN least(a.y, b.y) AND greatest(a.y, b.y))
"""


# ---------------------------------------------------------------------------
# Round 4d: hybrid retrieval — reciprocal-rank fusion of text + vector lists
# ---------------------------------------------------------------------------

RRF_K = 20   # depth of each input ranking
RRF_N = 10   # fused results returned
RRF_C = 60   # classic RRF constant


def q_hybrid_rank(sf_dir: str):
    """Hybrid retrieval for doc/vec 0: fuse a lexical ranking (distinct-
    term overlap with doc 0, overlap DESC / doc_id ASC, depth RRF_K)
    and the cosine ANN ranking (ops/ann.py ann_topk, one query) with
    reciprocal-rank fusion — score = sum of 1e9 // (RRF_C + rank) over
    the lists containing the doc, an exact integer.  Both rankings are
    bit-identical to their SQL mirrors (cosine via the _seq_ fold
    parity), so the fused top-RRF_N is too.  Lexical side: broadcast
    doc-0 term set, per-batch partial top-K, one tiny merge.  Output
    (doc_id, rrf_e9)."""
    from rhealpixdggs_py_ray.ops import ann
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    q0 = docs.filter(expr="doc_id == 0").take_all()  # bounded: 1 row
    qset = frozenset(q0[0]["text"].split())
    q_ref = ray.put(qset)

    def overlap_partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        ov = np.array(
            [len(set(t.split()) & qs) for t in batch["text"].to_pylist()],
            dtype=np.int64)
        m = (ov > 0) & (did != 0)
        did, ov = did[m], ov[m]
        order = np.lexsort((did, -ov))[:RRF_K]
        return pa.table({
            "doc_id": pa.array(did[order].astype(np.int64)),
            "ov": pa.array(ov[order]),
            "g": pa.array(np.zeros(len(order), dtype=np.int64)),
        })

    def text_rank(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "doc_id" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "v": pa.array([], type=pa.int64())})
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        ov = g["ov"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -ov))[:RRF_K]
        rank = np.arange(1, len(order) + 1, dtype=np.int64)
        return pa.table({
            "key": pa.array(did[order].astype(np.uint64), type=pa.uint64()),
            "v": pa.array(1_000_000_000 // (RRF_C + rank)),
        })

    textl = (
        docs.map_batches(overlap_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("g").map_groups(text_rank, batch_format="pyarrow")
    )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    vec = ann.ann_topk(emb, n_queries=1, k=RRF_K)

    def vec_rank(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        rank = batch["rank"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array(vid.astype(np.uint64), type=pa.uint64()),
            "v": pa.array(1_000_000_000 // (RRF_C + rank)),
        })

    vecl = vec.map_batches(vec_rank, batch_format="pyarrow",
                           zero_copy_batch=True)
    fused = sum_by_u64_key(textl.union(vecl), "key", "v", "rrf_e9",
                           n_buckets=4)

    def topn(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "rrf_e9": pa.array([], type=pa.int64())})
        did = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = g["rrf_e9"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -v))[:RRF_N]
        return pa.table({"doc_id": pa.array(did[order]),
                         "rrf_e9": pa.array(v[order])})

    def const(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "g", pa.array(np.zeros(batch.num_rows, dtype=np.int64)))

    # fused candidate set is <= 2*RRF_K rows: one tiny final group
    return (fused.map_batches(const, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("g").map_groups(topn, batch_format="pyarrow"))


def sql_hybrid_rank() -> str:
    from rhealpixdggs_py_ray.ops import ann

    vec_sql = ann.ann_topk_sql(n_queries=1, k=RRF_K)
    return f"""
WITH hyq AS MATERIALIZED (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id = 0
),
hyo AS MATERIALIZED (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS ov FROM (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
    FROM documents WHERE doc_id <> 0
  ) t JOIN hyq q ON q.w = t.w
  GROUP BY 1
),
hyt AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY ov DESC, doc_id ASC) AS rn
  FROM hyo QUALIFY rn <= {RRF_K}
),
hyv AS MATERIALIZED ({vec_sql}),
hyr AS MATERIALIZED (
  SELECT doc_id, 1000000000 // ({RRF_C} + rn) AS v FROM hyt
  UNION ALL
  SELECT vec_id AS doc_id, 1000000000 // ({RRF_C} + rank) AS v FROM hyv
)
SELECT doc_id, CAST(SUM(v) AS BIGINT) AS rrf_e9
FROM hyr GROUP BY 1
ORDER BY rrf_e9 DESC, doc_id ASC LIMIT {RRF_N}
"""


# ---------------------------------------------------------------------------
# Round 4d: per-user event-type entropy (quantized-ln exact integers)
# ---------------------------------------------------------------------------


def q_session_entropy(sf_dir: str):
    """Behavioral diversity as Shannon entropy: per user, H = ln(n) -
    sum(c_i * ln(c_i)) / n over event-type counts c_i.  ln is
    bit-identical libm on both sides (round-4c note), each term
    floor-quantizes to integer nano-nats BEFORE the sum (order-free),
    and the division is integer — entropy_e9 = floor(ln(n)*1e9) -
    sum_i floor(c_i*ln(c_i)*1e9) // n.  Same one-packed-key-exchange
    shape as tile_gini.  Output (user_id, n_events, n_types,
    entropy_e9)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    codes = {t: i for i, t in enumerate(EVT_TYPES)}
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        if len(uid) and int(uid.max()) >= (1 << 60):
            raise AssertionError("session_entropy packing bound")
        code = np.array([codes[x] for x in et], dtype=np.uint64)
        key = (uid.astype(np.uint64) << np.uint64(3)) | code
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        uid = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
               >> np.uint64(3))
        return batch.append_column("bucket2",
                                   pa.array(hash_bucket_u64(uid, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_types": pa.array([], type=pa.int64()),
                             "entropy_e9": pa.array([], type=pa.int64())})
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        uid = (key >> np.uint64(3)).astype(np.int64)
        term = np.floor(c.astype(np.float64)
                        * np.log(c.astype(np.float64))
                        * 1e9).astype(np.int64)
        uu, inv = np.unique(uid, return_inverse=True)
        n = np.zeros(len(uu), dtype=np.int64)
        np.add.at(n, inv, c)
        st = np.zeros(len(uu), dtype=np.int64)
        np.add.at(st, inv, term)
        nt = np.zeros(len(uu), dtype=np.int64)
        np.add.at(nt, inv, 1)
        h = (np.floor(np.log(n.astype(np.float64)) * 1e9).astype(np.int64)
             - st // n)
        return pa.table({
            "user_id": pa.array(uu),
            "n_events": pa.array(n),
            "n_types": pa.array(nt),
            "entropy_e9": pa.array(h),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_session_entropy() -> str:
    return """
WITH sec AS MATERIALIZED (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id,
  CAST(SUM(c) AS BIGINT) AS n_events,
  CAST(COUNT(*) AS BIGINT) AS n_types,
  CAST(CAST(floor(ln(CAST(SUM(c) AS DOUBLE)) * 1000000000.0) AS BIGINT)
    - SUM(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        * 1000000000.0) AS BIGINT)) // SUM(c) AS BIGINT) AS entropy_e9
FROM sec GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Round 4d: per-tile burst day + coverage gaps
# ---------------------------------------------------------------------------


def q_tile_burst(sf_dir: str):
    """Spatio-temporal burst detection: for each res-2 tile, the day
    whose count most exceeds the tile's own daily mean — score =
    D * c_day - total over the tile's [first_day, last_day] span D
    (exact integers; argmax over ACTIVE days, ties -> earliest), plus
    the number of silent days inside the span (coverage gaps).  One
    packed (tile, day) u64 exchange, per-tile integer resolve.
    Output (tile_id, n_events, n_days_active, n_zero_days, burst_day,
    burst_score)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        if len(day) and int(day.max()) >= (1 << 15):
            raise AssertionError("tile_burst day packing bound (< 2^15)")
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        key = (tile << np.uint64(15)) | day
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        tile = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                >> np.uint64(15))
        return batch.append_column("bucket2",
                                   pa.array(hash_bucket_u64(tile, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"tile_id": pa.array([], type=pa.string()),
                             "n_events": pa.array([], type=pa.int64()),
                             "n_days_active": pa.array([], type=pa.int64()),
                             "n_zero_days": pa.array([], type=pa.int64()),
                             "burst_day": pa.array([], type=pa.int64()),
                             "burst_score": pa.array([], type=pa.int64())})
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(key)  # per tile: days ascending (packed)
        key, c = key[order], c[order]
        tile = key >> np.uint64(15)
        day = (key & np.uint64((1 << 15) - 1)).astype(np.int64)
        tu, start = np.unique(tile, return_index=True)
        cnt = np.diff(np.append(start, len(tile)))
        rows = {k: [] for k in ("tile", "n", "na", "nz", "bd", "bs")}
        for t, s, m in zip(tu.tolist(), start.tolist(), cnt.tolist()):
            d, cc = day[s:s + m], c[s:s + m]
            D = int(d[-1] - d[0] + 1)
            tot = int(cc.sum())
            score = D * cc - tot
            best = int(np.argmax(score))  # ties -> earliest (sorted days)
            rows["tile"].append(t)
            rows["n"].append(tot)
            rows["na"].append(m)
            rows["nz"].append(D - m)
            rows["bd"].append(int(d[best]))
            rows["bs"].append(int(score[best]))
        t_u64 = (np.array(rows["tile"], dtype=np.uint64) << np.uint64(52)) \
            | np.uint64(TILE_RES)
        return pa.table({
            "tile_id": pa.array(su.to_string_fixed(t_u64, TILE_RES),
                                type=pa.string()),
            "n_events": pa.array(np.array(rows["n"], dtype=np.int64)),
            "n_days_active": pa.array(np.array(rows["na"], dtype=np.int64)),
            "n_zero_days": pa.array(np.array(rows["nz"], dtype=np.int64)),
            "burst_day": pa.array(np.array(rows["bd"], dtype=np.int64)),
            "burst_score": pa.array(np.array(rows["bs"], dtype=np.int64)),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_tile_burst() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH tbi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
tbc AS MATERIALIZED (
  SELECT i.cell_id AS tile_id, epoch_us(e.ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events e JOIN tbi i ON i.event_id = e.event_id
  GROUP BY 1, 2
),
tbt AS MATERIALIZED (
  SELECT tile_id, CAST(SUM(c) AS BIGINT) AS n_events,
    CAST(COUNT(*) AS BIGINT) AS n_days_active,
    MAX(day) - MIN(day) + 1 - COUNT(*) AS n_zero_days,
    MAX(day) - MIN(day) + 1 AS span
  FROM tbc GROUP BY 1
)
SELECT c.tile_id, t.n_events, t.n_days_active,
  CAST(t.n_zero_days AS BIGINT) AS n_zero_days,
  CAST(c.day AS BIGINT) AS burst_day,
  CAST(t.span * c.c - t.n_events AS BIGINT) AS burst_score
FROM tbc c JOIN tbt t ON t.tile_id = c.tile_id
QUALIFY row_number() OVER (
  PARTITION BY c.tile_id
  ORDER BY t.span * c.c - t.n_events DESC, c.day ASC) = 1
"""


# ---------------------------------------------------------------------------
# Round 4d: kernel-density raster over the equatorial lattice
# ---------------------------------------------------------------------------

KDE_R = 3  # triangular Chebyshev kernel: w(d) = KDE_R - d for d < KDE_R


def q_kde_raster(sf_dir: str):
    """Kernel-density surface: density(c) = sum over event cells o of
    count(o) * (R - cheb(c, o)) for Chebyshev distance < R on the
    res-4 equatorial lattice (antimeridian wrap) — the hotspot raster
    behind every density map, exact because the kernel weights are
    integers.  Distributed shape = the grid_flood halo exchange: exact
    per-cell counts route to home tile + (R-1)-halo neighbors, each
    tile runs a dense 25-shift integer convolution locally and emits
    only its home window.  Two exchanges total.  Output (cell_id,
    density) for density > 0 cells."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D = KDE_R - 1
    T = FLOOD_T
    n_tx = W // T
    n_ty = side // T
    L = T + 2 * D

    ds = indexed_events(sf_dir, resolution=k)

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        u = batch["cell_u64"].to_numpy(zero_copy_only=False)
        m = np.abs(lat) <= DISSOLVE_LAT
        u = u[m]
        return pa.table({
            "cell_u64": pa.array(u, type=pa.uint64()),
            "one": pa.array(np.ones(len(u), dtype=np.int64)),
        })

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "cell_u64", "one", "cnt",
    )

    def halo(batch: pa.Table) -> pa.Table:
        u = batch["cell_u64"].to_numpy(zero_copy_only=False).astype(np.uint64)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        home_ty = gy // T
        home_tx = gx // T
        tiles, lys, lxs, cs = [], [], [], []
        for dty in (-1, 0, 1):
            for dtx in (-1, 0, 1):
                ty = home_ty + dty
                tx = (home_tx + dtx) % n_tx
                ok = (ty >= 0) & (ty < n_ty)
                off = ((gx - tx * T + W // 2) % W) - W // 2
                ly = gy - ty * T + D
                lx = off + D
                ok &= (ly >= 0) & (ly < L) & (lx >= 0) & (lx < L)
                tiles.append((ty * n_tx + tx)[ok])
                lys.append(ly[ok])
                lxs.append(lx[ok])
                cs.append(cnt[ok])
        return pa.table({
            "tile": pa.array(np.concatenate(tiles)),
            "ly": pa.array(np.concatenate(lys)),
            "lx": pa.array(np.concatenate(lxs)),
            "cnt": pa.array(np.concatenate(cs)),
        })

    def conv(g: pa.Table) -> pa.Table:
        empty = pa.table({"cell_id": pa.array([], type=pa.string()),
                          "density": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "tile" not in g.column_names:
            return empty
        tile = int(g["tile"][0].as_py())
        ty, tx = tile // n_tx, tile % n_tx
        cg = np.zeros((L, L), dtype=np.int64)
        np.add.at(cg, (g["ly"].to_numpy(zero_copy_only=False),
                       g["lx"].to_numpy(zero_copy_only=False)),
                  g["cnt"].to_numpy(zero_copy_only=False))
        dens = np.zeros((L, L), dtype=np.int64)
        for dy in range(-D, D + 1):
            for dx in range(-D, D + 1):
                w = KDE_R - max(abs(dy), abs(dx))
                sy0, sy1 = max(0, -dy), L - max(0, dy)
                sx0, sx1 = max(0, -dx), L - max(0, dx)
                dens[sy0 + dy:sy1 + dy, sx0 + dx:sx1 + dx] += \
                    w * cg[sy0:sy1, sx0:sx1]
        win = dens[D:D + T, D:D + T]
        yy, xx = np.nonzero(win)
        if not len(yy):
            return empty
        gy = ty * T + yy
        gx = (tx * T + xx) % W
        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy, gx, k),
                type=pa.string()),
            "density": pa.array(win[yy, xx]),
        })

    return (
        occ.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile").map_groups(conv, batch_format="pyarrow")
    )


def sql_kde_raster() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D = KDE_R - 1
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    offs = ", ".join(
        f"({dy}, {dx}, {KDE_R - max(abs(dy), abs(dx))})"
        for dy in range(-D, D + 1) for dx in range(-D, D + 1)
    )
    return f"""
WITH kidx AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
kcnt AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM kidx GROUP BY 1, 2
),
koff(dy, dx, w) AS (VALUES {offs}),
kde AS MATERIALIZED (
  SELECT c.gy + o.dy AS gy, ((c.gx + o.dx) % {W} + {W}) % {W} AS gx,
    CAST(SUM(c.cnt * o.w) AS BIGINT) AS density
  FROM kcnt c CROSS JOIN koff o
  WHERE c.gy + o.dy BETWEEN 0 AND {side - 1}
  GROUP BY 1, 2
)
SELECT {rebuild} AS cell_id, density FROM kde
"""


# ---------------------------------------------------------------------------
# Round 4d: NDCG@10 of the IVF index vs exact cosine top-5
# ---------------------------------------------------------------------------

NDCG_Q = 10   # queries (vec_id < NDCG_Q)
NDCG_REL = 5  # exact top-REL defines the relevant set
NDCG_AT = 10  # IVF list depth scored


def q_ndcg_eval(sf_dir: str):
    """Graded ANN quality eval: NDCG@10 of the IVF ranking against the
    exact cosine top-5 (binary relevance) — the positional metric a
    retrieval deployment tracks next to recall (q_ann_recall).  Both
    rankings are the existing distributed pipelines, run concurrently;
    their outputs are Q x k bounded, so the metric itself is a driver
    fold.  Discount weights quantize BEFORE summation —
    w(i) = floor(1e9 * ln(2) / ln(i+1)) — so DCG/IDCG are exact
    integer sums and ndcg_e9 an exact integer ratio.  Output (qid,
    n_rel_found, dcg, idcg, ndcg_e9)."""
    import concurrent.futures as cf

    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    emb2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    with cf.ThreadPoolExecutor(2) as ex:
        f_exact = ex.submit(lambda: ann.ann_topk(
            emb, n_queries=NDCG_Q, k=NDCG_REL).take_all())
        f_ivf = ex.submit(lambda: ann.ann_topk_ivf(
            emb2, n_queries=NDCG_Q, k=NDCG_AT).take_all())
        exact, ivf = f_exact.result(), f_ivf.result()  # bounded: Q*k rows

    rel = {(int(r["qid"]), int(r["vec_id"])) for r in exact}
    n_exact: dict[int, int] = {}
    for r in exact:
        n_exact[int(r["qid"])] = n_exact.get(int(r["qid"]), 0) + 1

    def w(i: int) -> int:
        return int(np.floor(1000000000.0 * np.log(2.0) / np.log(i + 1.0)))

    dcg: dict[int, int] = {q: 0 for q in n_exact}
    hits: dict[int, int] = {q: 0 for q in n_exact}
    for r in ivf:
        q, v, rank = int(r["qid"]), int(r["vec_id"]), int(r["rank"])
        if (q, v) in rel:
            dcg[q] += w(rank)
            hits[q] += 1
    rows = []
    for q in sorted(n_exact):
        idcg = sum(w(i) for i in range(1, n_exact[q] + 1))
        rows.append((q, hits[q], dcg[q], idcg,
                     dcg[q] * 1_000_000_000 // idcg))
    a = np.array(rows, dtype=np.int64).reshape(-1, 5)
    return pa.table({
        "qid": pa.array(a[:, 0]),
        "n_rel_found": pa.array(a[:, 1]),
        "dcg": pa.array(a[:, 2]),
        "idcg": pa.array(a[:, 3]),
        "ndcg_e9": pa.array(a[:, 4]),
    })


def sql_ndcg_eval() -> str:
    from rhealpixdggs_py_ray.ops import ann

    wexpr = ("CAST(floor(1000000000.0 * ln(2.0)"
             " / ln(CAST({i} + 1 AS DOUBLE))) AS BIGINT)")
    return f"""
WITH nde AS MATERIALIZED ({ann.ann_topk_sql(NDCG_Q, NDCG_REL)}),
ndi AS MATERIALIZED ({ann.ann_topk_ivf_sql(NDCG_Q, NDCG_AT)}),
ndh AS MATERIALIZED (
  SELECT i.qid, i.rank FROM ndi i
  JOIN nde e ON e.qid = i.qid AND e.vec_id = i.vec_id
),
ndd AS MATERIALIZED (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel_found,
    CAST(SUM({wexpr.format(i='rank')}) AS BIGINT) AS dcg
  FROM ndh GROUP BY 1
),
ndq AS MATERIALIZED (
  SELECT qid, CAST(COUNT(*) AS BIGINT) AS ne FROM nde GROUP BY 1
),
ndic AS MATERIALIZED (
  SELECT qid, CAST(SUM({wexpr.format(i='i')}) AS BIGINT) AS idcg
  FROM (SELECT qid, unnest(generate_series(1, ne)) AS i FROM ndq)
  GROUP BY 1
)
SELECT q.qid, COALESCE(d.n_rel_found, 0) AS n_rel_found,
  COALESCE(d.dcg, 0) AS dcg, c.idcg,
  CAST(COALESCE(d.dcg, 0) * 1000000000 // c.idcg AS BIGINT) AS ndcg_e9
FROM ndq q
JOIN ndic c ON c.qid = q.qid
LEFT JOIN ndd d ON d.qid = q.qid
"""


# ---------------------------------------------------------------------------
# Round 4d: distributed PCA top component (integer power iteration)
# ---------------------------------------------------------------------------

PCA_ITERS = 96  # tight eigengap on isotropic fixtures (0.93-0.98): 96
# rescaled integer iterations measured cos>=0.994 / lam err<=3e-4 vs eigh
PCA_SCALE = 1 << 20


def q_pca_power(sf_dir: str):
    """Top principal direction of the embedding second moment: the
    distributed integer gram matrix (q_embedding_gram's reduction —
    embedding rows never shuffle, 2080 upper-triangle partials per
    batch) followed by PCA_ITERS exact-integer power iterations on the
    driver's 64x64 copy.  Each iteration rescales by w * 2^20 //
    max|w| with DuckDB-style TRUNCATED division (bignum Python ints
    mirror SQL HUGEINT, nothing ever rounds), so the direction and its
    Rayleigh quotient replay bit-exactly.  Output 64 rows (i, v_q20,
    lam) — the quantized eigenvector and the shared eigenvalue
    estimate."""
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        Q = np.floor(M.astype(np.float64) * 1000.0)
        G = Q.T @ Q  # exact: |q| < 2^24, n < 2^17 per batch
        d = Q.shape[1]
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "g": pa.array(G[iu, ju].astype(np.int64)),
        })

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    folded = part.groupby(["i", "j"]).aggregate(Sum("g", alias_name="g"))

    # 2080-row bounded gather; the heavy reduction already happened
    G = [[0] * EMB_D for _ in range(EMB_D)]
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        for i, j, g in zip(b["i"].to_pylist(), b["j"].to_pylist(),
                           b["g"].to_pylist()):
            G[i][j] = g
            G[j][i] = g

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    v = [1] * EMB_D
    for _ in range(PCA_ITERS):
        w = [sum(G[i][j] * v[j] for j in range(EMB_D))
             for i in range(EMB_D)]
        m = max(abs(x) for x in w)
        v = [tdiv(x * PCA_SCALE, m) for x in w]
    w2 = [sum(G[i][j] * v[j] for j in range(EMB_D)) for i in range(EMB_D)]
    num = sum(v[i] * w2[i] for i in range(EMB_D))
    den = sum(x * x for x in v)
    lam = tdiv(num, den)
    return pa.table({
        "i": pa.array(np.arange(EMB_D, dtype=np.int64)),
        "v_q20": pa.array(np.array(v, dtype=np.int64)),
        "lam": pa.array(np.full(EMB_D, lam, dtype=np.int64)),
    })


def sql_pca_power() -> str:
    steps = []
    prev = "pcv0"
    for t in range(1, PCA_ITERS + 1):
        steps.append(f"""
pcw{t} AS MATERIALIZED (
  SELECT s.i AS i, CAST(SUM(s.g * v.val) AS HUGEINT) AS val
  FROM pcsym s JOIN {prev} v ON v.i = s.j GROUP BY 1
),
pcm{t} AS MATERIALIZED (SELECT MAX(abs(val)) AS m FROM pcw{t}),
pcv{t} AS MATERIALIZED (
  SELECT i, CAST(val * {PCA_SCALE} // (SELECT m FROM pcm{t}) AS HUGEINT)
    AS val
  FROM pcw{t}
)""")
        prev = f"pcv{t}"
    body = ",".join(steps)
    return f"""
WITH pce AS MATERIALIZED (
  SELECT vec_id, d.i - 1 AS i,
    CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1000.0) AS BIGINT) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {EMB_D})) AS i) d
),
pcg AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.m * b.m) AS HUGEINT) AS g
  FROM pce a JOIN pce b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
),
pcsym AS MATERIALIZED (
  SELECT i, j, g FROM pcg
  UNION ALL SELECT j AS i, i AS j, g FROM pcg WHERE i <> j
),
pcv0 AS MATERIALIZED (
  SELECT unnest(generate_series(0, {EMB_D - 1})) AS i,
    CAST(1 AS HUGEINT) AS val
),{body},
pcw AS MATERIALIZED (
  SELECT s.i AS i, CAST(SUM(s.g * v.val) AS HUGEINT) AS val
  FROM pcsym s JOIN {prev} v ON v.i = s.j GROUP BY 1
),
pcr AS MATERIALIZED (
  SELECT SUM(v.val * w.val) AS num, SUM(v.val * v.val) AS den
  FROM {prev} v JOIN pcw w ON w.i = v.i
)
SELECT CAST(v.i AS BIGINT) AS i, CAST(v.val AS BIGINT) AS v_q20,
  CAST((SELECT num // den FROM pcr) AS BIGINT) AS lam
FROM {prev} v
"""


# ---------------------------------------------------------------------------
# Round 4d: mobility sequence mining + predictability
# ---------------------------------------------------------------------------

TRIGRAM_K = 25


def q_tile_trigrams(sf_dir: str):
    """Sequential pattern mining: the TRIGRAM_K most frequent 3-step
    tile sequences across all users (consecutive events by ts,
    event_id; steps may repeat a tile).  Each user-bucket group packs
    its trigrams into 36-bit u64 keys (3 x 12-bit res-2 tiles); exact
    global counts come from ONE u64 fold and the top-K from per-bucket
    partial top-K + a tiny merge (count DESC, key ASC — vocab's
    disjoint-bucket exactness argument).  Output (t1, t2, t3, n)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        lon, lat = oracle.lonlat_from_id(eid)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "eid": pa.array(eid.astype(np.int64)),
            "tile": pa.array(u >> np.uint64(52), type=pa.uint64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "uid" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        tile = g["tile"].to_numpy(zero_copy_only=False).astype(
            np.uint64)[order]
        same3 = (uid[2:] == uid[:-2])
        key = ((tile[:-2] << np.uint64(24)) | (tile[1:-1] << np.uint64(12))
               | tile[2:])[same3]
        uq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uq, type=pa.uint64()),
                         "one": pa.array(cnt.astype(np.int64))})

    folded = sum_by_u64_key(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow"),
        "key", "one", "n", n_buckets=8,
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = batch["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -n))[:TRIGRAM_K]
        return pa.table({
            "key": pa.array(key[order], type=pa.uint64()),
            "n": pa.array(n[order]),
            "g": pa.array(np.zeros(len(order), dtype=np.int64)),
        })

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"t1": pa.array([], type=pa.string()),
                             "t2": pa.array([], type=pa.string()),
                             "t3": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -n))[:TRIGRAM_K]
        key, n = key[order], n[order]
        res = np.uint64(TILE_RES)
        mask = np.uint64((1 << 12) - 1)

        def s(tt):
            return su.to_string_fixed((tt << np.uint64(52)) | res, TILE_RES)
        return pa.table({
            "t1": pa.array(s((key >> np.uint64(24)) & mask),
                           type=pa.string()),
            "t2": pa.array(s((key >> np.uint64(12)) & mask),
                           type=pa.string()),
            "t3": pa.array(s(key & mask), type=pa.string()),
            "n": pa.array(n),
        })

    return (
        folded.map_batches(partial_topk, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("g").map_groups(final, batch_format="pyarrow")
    )


def sql_tile_trigrams() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH tgx AS MATERIALIZED (
  SELECT e.user_id, e.ts, e.event_id, t.cell_id AS tile
  FROM events e JOIN (SELECT event_id, cell_id FROM {idx_sql} q) t
    ON t.event_id = e.event_id
),
tgs AS MATERIALIZED (
  SELECT tile AS t3,
    lag(tile, 1) OVER w AS t2, lag(tile, 2) OVER w AS t1
  FROM tgx WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tgc AS MATERIALIZED (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
  FROM tgs WHERE t1 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT t1, t2, t3, n FROM tgc
ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC LIMIT {TRIGRAM_K}
"""


def q_mobility_entropy(sf_dir: str):
    """Mobility predictability: per-user conditional entropy of the
    next res-2 tile given the current one — N*H = sum_c n_c*ln(n_c) -
    sum_ct n_ct*ln(n_ct), every term floor-quantized to nano-nats
    (session_entropy's order-free rule), h_cond_e9 = (term1 - term2)
    // N.  Low entropy = predictable commuter, high = explorer.  ONE
    h(user) bucket exchange.  Output (user_id, n_trans, n_states,
    h_cond_e9)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        lon, lat = oracle.lonlat_from_id(eid)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "eid": pa.array(eid.astype(np.int64)),
            "tile": pa.array(u >> np.uint64(52), type=pa.uint64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n_trans": pa.array([], type=pa.int64()),
                          "n_states": pa.array([], type=pa.int64()),
                          "h_cond_e9": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "uid" not in g.column_names:
            return empty
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        tile = g["tile"].to_numpy(zero_copy_only=False).astype(
            np.uint64)[order]
        same = uid[1:] == uid[:-1]
        u = uid[1:][same]
        pair = ((tile[:-1][same] << np.uint64(12)) | tile[1:][same])
        if not len(u):
            return empty

        def qln(n):
            return np.floor(n.astype(np.float64)
                            * np.log(n.astype(np.float64)) * 1e9
                            ).astype(np.int64)

        # per (user, cur, next) counts
        k2 = (u.astype(np.uint64) << np.uint64(24)) | pair
        ku, kc = np.unique(k2, return_counts=True)
        # per (user, cur) counts
        k1 = ku >> np.uint64(12)
        cu, cinv = np.unique(k1, return_inverse=True)
        n_c = np.zeros(len(cu), dtype=np.int64)
        np.add.at(n_c, cinv, kc)
        # per user
        uu2, uinv2 = np.unique((cu >> np.uint64(12)).astype(np.int64),
                               return_inverse=True)
        term1 = np.zeros(len(uu2), dtype=np.int64)
        np.add.at(term1, uinv2, qln(n_c))
        nstates = np.zeros(len(uu2), dtype=np.int64)
        np.add.at(nstates, uinv2, 1)
        uu3, uinv3 = np.unique((ku >> np.uint64(24)).astype(np.int64),
                               return_inverse=True)
        term2 = np.zeros(len(uu3), dtype=np.int64)
        np.add.at(term2, uinv3, qln(kc))
        ntrans = np.zeros(len(uu3), dtype=np.int64)
        np.add.at(ntrans, uinv3, kc)
        assert (uu2 == uu3).all()
        return pa.table({
            "user_id": pa.array(uu2),
            "n_trans": pa.array(ntrans),
            "n_states": pa.array(nstates),
            "h_cond_e9": pa.array((term1 - term2) // ntrans),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_mobility_entropy() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    qln = ("CAST(floor(CAST({n} AS DOUBLE) * ln(CAST({n} AS DOUBLE))"
           " * 1000000000.0) AS BIGINT)")
    return f"""
WITH mex AS MATERIALIZED (
  SELECT e.user_id, e.ts, e.event_id, t.cell_id AS tile
  FROM events e JOIN (SELECT event_id, cell_id FROM {idx_sql} q) t
    ON t.event_id = e.event_id
),
mep AS MATERIALIZED (
  SELECT user_id, lag(tile) OVER w AS cur, tile AS nxt
  FROM mex WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
mec AS MATERIALIZED (
  SELECT user_id, cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM mep WHERE cur IS NOT NULL GROUP BY 1, 2, 3
),
mes AS MATERIALIZED (
  SELECT user_id, cur, CAST(SUM(n) AS BIGINT) AS n_c,
    CAST(SUM({qln.format(n='n')}) AS BIGINT) AS t2
  FROM mec GROUP BY 1, 2
)
SELECT user_id,
  CAST(SUM(n_c) AS BIGINT) AS n_trans,
  CAST(COUNT(*) AS BIGINT) AS n_states,
  CAST((SUM({qln.format(n='n_c')}) - SUM(t2)) // SUM(n_c) AS BIGINT)
    AS h_cond_e9
FROM mes GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Round 4d: per-tile seasonal-naive forecast backtest
# ---------------------------------------------------------------------------


def q_tile_forecast(sf_dir: str):
    """Forecast backtesting: for each res-2 tile, predict every active
    day's count as the TRUNCATED mean of the tile's PRIOR same-weekday
    counts (seasonal-naive baseline; zero-filled days inside the
    tile's own span) and score the total absolute error — the
    walk-forward eval a forecasting deployment runs.  All integers:
    pred_d = sum_prior // n_prior; days with no prior same-weekday
    observation are skipped.  One packed (tile, day) exchange, dense
    per-tile replay (span <= fixture month).  Output (tile_id,
    n_scored, total_abs_err, mae_milli)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        key = (tile << np.uint64(15)) | day
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        tile = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                >> np.uint64(15))
        return batch.append_column("bucket2",
                                   pa.array(hash_bucket_u64(tile, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"tile_id": pa.array([], type=pa.string()),
                          "n_scored": pa.array([], type=pa.int64()),
                          "total_abs_err": pa.array([], type=pa.int64()),
                          "mae_milli": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(key)
        key, c = key[order], c[order]
        tile = key >> np.uint64(15)
        day = (key & np.uint64((1 << 15) - 1)).astype(np.int64)
        tu, start = np.unique(tile, return_index=True)
        cnt = np.diff(np.append(start, len(tile)))
        rows = {k: [] for k in ("tile", "ns", "err")}
        for t, s, m in zip(tu.tolist(), start.tolist(), cnt.tolist()):
            d, cc = day[s:s + m], c[s:s + m]
            d0, d1 = int(d[0]), int(d[-1])
            dense = np.zeros(d1 - d0 + 1, dtype=np.int64)
            dense[d - d0] = cc
            n_sc = 0
            err = 0
            # prior same-weekday running sums (span <= ~31 days here;
            # at scale the span bound is the retention window)
            for wd in range(7):
                seq = dense[wd::7] if wd < len(dense) else None
                if seq is None or len(seq) < 2:
                    continue
                csum = np.cumsum(seq)
                n_prior = np.arange(1, len(seq), dtype=np.int64)
                pred = csum[:-1] // n_prior
                err += int(np.abs(seq[1:] - pred).sum())
                n_sc += len(seq) - 1
            if n_sc == 0:
                continue
            rows["tile"].append(t)
            rows["ns"].append(n_sc)
            rows["err"].append(err)
        if not rows["tile"]:
            return empty
        t_u64 = (np.array(rows["tile"], dtype=np.uint64) << np.uint64(52)) \
            | np.uint64(TILE_RES)
        ns = np.array(rows["ns"], dtype=np.int64)
        err = np.array(rows["err"], dtype=np.int64)
        return pa.table({
            "tile_id": pa.array(su.to_string_fixed(t_u64, TILE_RES),
                                type=pa.string()),
            "n_scored": pa.array(ns),
            "total_abs_err": pa.array(err),
            "mae_milli": pa.array(err * 1000 // ns),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_tile_forecast() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH tfi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
tfc AS MATERIALIZED (
  SELECT i.cell_id AS tile_id, epoch_us(e.ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events e JOIN tfi i ON i.event_id = e.event_id
  GROUP BY 1, 2
),
tfr AS MATERIALIZED (
  SELECT tile_id, MIN(day) AS d0, MAX(day) AS d1 FROM tfc GROUP BY 1
),
tfd AS MATERIALIZED (
  SELECT r.tile_id, unnest(generate_series(r.d0, r.d1)) AS day, r.d0
  FROM tfr r
),
tfz AS MATERIALIZED (
  SELECT d.tile_id, d.day, (d.day - d.d0) % 7 AS wd,
    COALESCE(c.c, 0) AS c
  FROM tfd d LEFT JOIN tfc c ON c.tile_id = d.tile_id AND c.day = d.day
),
tfp AS MATERIALIZED (
  SELECT tile_id, day, c,
    SUM(c) OVER w AS prior_sum, COUNT(*) OVER w AS n_prior
  FROM tfz
  WINDOW w AS (PARTITION BY tile_id, wd ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
tfe AS MATERIALIZED (
  SELECT tile_id, abs(c - prior_sum // n_prior) AS ae
  FROM tfp WHERE n_prior >= 1
)
SELECT tile_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
  CAST(SUM(ae) AS BIGINT) AS total_abs_err,
  CAST(SUM(ae) * 1000 // COUNT(*) AS BIGINT) AS mae_milli
FROM tfe GROUP BY tile_id
"""


# ---------------------------------------------------------------------------
# Round 4d: decision-stump feature importance over embedding dims
# ---------------------------------------------------------------------------


def q_decision_stump(sf_dir: str):
    """Per-feature best Gini split against the label (the feature-
    importance table a tree trainer derives): for every embedding
    dimension, the threshold (on milli-quantized values) maximizing
    sum(cL^2)*nR + sum(cR^2)*nL over nL*nR — the integer-cleared form
    of minimizing weighted Gini impurity.  score_e6 floor-quantizes
    the rational identically on both sides; ties break by smaller
    threshold.  Distributed shape: per-batch (dim, value, label)
    partial counts -> one packed u64 fold (bounded by 64 dims x value
    grid x 10 labels, NOT by rows) -> per-dim prefix-sum resolve.
    int64 bound: A*1e6 <= 2*N^3*1e6 needs N <= ~16k rows (asserted;
    beyond that the resolve switches to Python bignums).  Output one
    row per dim (dim, thr_milli, score_e6, n_left, n_right)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch)
        vq = np.floor(M.astype(np.float64) * 1000.0).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        n, d = vq.shape
        assert np.abs(vq).max() < 2048 and lab.max() < 16
        dim = np.repeat(np.arange(d, dtype=np.int64), n)
        v = vq.T.ravel()
        lb = np.tile(lab, d)
        key = ((dim.astype(np.uint64) << np.uint64(16))
               | ((v + 2048).astype(np.uint64) << np.uint64(4))
               | lb.astype(np.uint64))
        uq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uq, type=pa.uint64()),
                         "one": pa.array(cnt.astype(np.int64))})

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        dim = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
               >> np.uint64(16))
        return batch.append_column("bucket2",
                                   pa.array(hash_bucket_u64(dim, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"dim": pa.array([], type=pa.int64()),
                          "thr_milli": pa.array([], type=pa.int64()),
                          "score_e6": pa.array([], type=pa.int64()),
                          "n_left": pa.array([], type=pa.int64()),
                          "n_right": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(key)
        key, c = key[order], c[order]
        dim = (key >> np.uint64(16)).astype(np.int64)
        v = ((key >> np.uint64(4)) & np.uint64(4095)).astype(np.int64) - 2048
        lab = (key & np.uint64(15)).astype(np.int64)
        out = {k: [] for k in ("dim", "thr", "sc", "nl", "nr")}
        for dm in np.unique(dim):
            m = dim == dm
            vd, ld, cd = v[m], lab[m], c[m]
            vals = np.unique(vd)
            N = int(cd.sum())
            assert N <= 16_000, "decision_stump int64 score bound"
            # label-count matrix over the value grid
            vidx = np.searchsorted(vals, vd)
            cm = np.zeros((len(vals), 16), dtype=np.int64)
            np.add.at(cm, (vidx, ld), cd)
            pref = np.cumsum(cm, axis=0)          # cL at thr = vals[i]
            nL = pref.sum(axis=1)
            if len(vals) < 2:
                continue
            pref, nL = pref[:-1], nL[:-1]         # thr = max is degenerate
            nR = N - nL
            sL2 = (pref * pref).sum(axis=1)
            tot = cm.sum(axis=0)
            cR = tot[None, :] - pref
            sR2 = (cR * cR).sum(axis=1)
            A = sL2 * nR + sR2 * nL
            score = A * 1_000_000 // (nL * nR)
            best = int(np.argmax(score))          # ties -> smaller thr
            out["dim"].append(int(dm))
            out["thr"].append(int(vals[best]))
            out["sc"].append(int(score[best]))
            out["nl"].append(int(nL[best]))
            out["nr"].append(int(nR[best]))
        if not out["dim"]:
            return empty
        return pa.table({
            "dim": pa.array(np.array(out["dim"], dtype=np.int64)),
            "thr_milli": pa.array(np.array(out["thr"], dtype=np.int64)),
            "score_e6": pa.array(np.array(out["sc"], dtype=np.int64)),
            "n_left": pa.array(np.array(out["nl"], dtype=np.int64)),
            "n_right": pa.array(np.array(out["nr"], dtype=np.int64)),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_decision_stump() -> str:
    return f"""
WITH dse AS MATERIALIZED (
  SELECT d.i - 1 AS dim,
    CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1000.0) AS BIGINT) AS v,
    label
  FROM embeddings, (SELECT unnest(generate_series(1, {EMB_D})) AS i) d
),
dsc AS MATERIALIZED (
  SELECT dim, v, label, CAST(COUNT(*) AS BIGINT) AS c
  FROM dse GROUP BY 1, 2, 3
),
dsg AS MATERIALIZED (
  SELECT g.dim, g.v, l.label, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT dim, v FROM dsc) g
  CROSS JOIN (SELECT DISTINCT label FROM dsc) l
  LEFT JOIN dsc c ON c.dim = g.dim AND c.v = g.v AND c.label = l.label
),
dsp AS MATERIALIZED (
  SELECT dim, v, label,
    SUM(c) OVER (PARTITION BY dim, label ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS cl,
    SUM(c) OVER (PARTITION BY dim, label) AS ct
  FROM dsg
),
dst AS MATERIALIZED (
  SELECT dim, v AS thr,
    CAST(SUM(cl * cl) AS BIGINT) AS sl2,
    CAST(SUM((ct - cl) * (ct - cl)) AS BIGINT) AS sr2,
    CAST(SUM(cl) AS BIGINT) AS nl, CAST(SUM(ct - cl) AS BIGINT) AS nr
  FROM dsp GROUP BY 1, 2
),
dss AS MATERIALIZED (
  SELECT dim, thr, nl, nr,
    CAST((sl2 * nr + sr2 * nl) * 1000000 // (nl * nr) AS BIGINT) AS score
  FROM dst WHERE nl > 0 AND nr > 0
)
SELECT CAST(dim AS BIGINT) AS dim, thr AS thr_milli, score AS score_e6,
  nl AS n_left, nr AS n_right
FROM dss
QUALIFY row_number() OVER (
  PARTITION BY dim ORDER BY score DESC, thr ASC) = 1
"""


# ---------------------------------------------------------------------------
# Round 4d: A/B experiment readout (two-proportion z per event type)
# ---------------------------------------------------------------------------


def q_ab_test(sf_dir: str):
    """Experimentation readout: users split into arms by user_id % 2;
    per event type, the share of users with >= 1 such event is
    compared between arms with a two-proportion z-score.  The float
    chain (pA-pB) / sqrt(p*(1-p)*(1/nA+1/nB)) uses one exact-rounded
    op per node in the SAME order both sides, then floor-quantizes to
    z_e6 — micro-level parity without integerizing the statistics.
    Distinct (user, type) pairs fold through one u64 exchange; the
    readout itself is a <= (5 types x 2 arms + 2)-row driver fold.
    Output (event_type, x_a, n_a, x_b, n_b, z_e6)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    codes = {t: i for i, t in enumerate(EVT_TYPES)}
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        code = np.array([codes[x] for x in et], dtype=np.uint64)
        key = np.unique((uid.astype(np.uint64) << np.uint64(3)) | code)
        # sentinel code 7 marks "user exists" rows for the arm sizes
        ukey = (np.unique(uid).astype(np.uint64) << np.uint64(3)) \
            | np.uint64(7)
        allk = np.concatenate([key, ukey])
        return pa.table({
            "key": pa.array(allk, type=pa.uint64()),
            "one": pa.array(np.ones(len(allk), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "m", n_buckets=8,
    )
    # bounded driver fold: 12 counters (5 types + sentinel, 2 arms)
    x = np.zeros((8, 2), dtype=np.int64)
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        key = b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        code = (key & np.uint64(7)).astype(np.int64)
        arm = ((key >> np.uint64(3)) % np.uint64(2)).astype(np.int64)
        np.add.at(x, (code, arm), 1)
    n_a, n_b = int(x[7, 0]), int(x[7, 1])
    rows = []
    for t, i in codes.items():
        xa, xb = int(x[i, 0]), int(x[i, 1])
        if xa + xb == 0 or xa + xb == n_a + n_b:
            z_e6 = 0
        else:
            pa_ = xa / n_a
            pb_ = xb / n_b
            p = (xa + xb) / (n_a + n_b)
            inv = 1.0 / n_a + 1.0 / n_b
            se = np.sqrt(p * (1.0 - p) * inv)
            z_e6 = int(np.floor((pa_ - pb_) / se * 1000000.0))
        rows.append((t, xa, n_a, xb, n_b, z_e6))
    rows.sort()
    return pa.table({
        "event_type": pa.array([r[0] for r in rows], type=pa.string()),
        "x_a": pa.array(np.array([r[1] for r in rows], dtype=np.int64)),
        "n_a": pa.array(np.array([r[2] for r in rows], dtype=np.int64)),
        "x_b": pa.array(np.array([r[3] for r in rows], dtype=np.int64)),
        "n_b": pa.array(np.array([r[4] for r in rows], dtype=np.int64)),
        "z_e6": pa.array(np.array([r[5] for r in rows], dtype=np.int64)),
    })


def sql_ab_test() -> str:
    return """
WITH abu AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type FROM events
),
abn AS MATERIALIZED (
  SELECT
    CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)
      AS BIGINT) AS n_a,
    CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END)
      AS BIGINT) AS n_b
  FROM events
),
abx AS MATERIALIZED (
  SELECT event_type,
    CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS x_a,
    CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS x_b
  FROM abu GROUP BY 1
)
SELECT x.event_type, x.x_a, n.n_a, x.x_b, n.n_b,
  CAST(CASE
    WHEN x.x_a + x.x_b = 0 OR x.x_a + x.x_b = n.n_a + n.n_b THEN 0
    ELSE floor(
      (CAST(x.x_a AS DOUBLE) / n.n_a - CAST(x.x_b AS DOUBLE) / n.n_b)
      / sqrt(
          (CAST(x.x_a + x.x_b AS DOUBLE) / (n.n_a + n.n_b))
          * (1.0 - CAST(x.x_a + x.x_b AS DOUBLE) / (n.n_a + n.n_b))
          * (1.0 / n.n_a + 1.0 / n.n_b))
      * 1000000.0)
  END AS BIGINT) AS z_e6
FROM abx x CROSS JOIN abn n
"""


# ---------------------------------------------------------------------------
# Round 4d: gravity-model distance decay over OD tile flows
# ---------------------------------------------------------------------------

DECAY_RES = 2


def q_distance_decay(sf_dir: str):
    """Spatial-interaction fit: the distance-decay exponent of
    origin-destination flows — least-squares slope of ln(flow) on
    ln(chebyshev tile distance) over consecutive same-user moves whose
    endpoints BOTH sit in the equatorial band and in different res-2
    tiles.  Distances are exact integers on the global res-2 lattice
    (seam wrap); ln terms quantize to micro-nats and the regression is
    the zipf_slope bignum/tdiv pattern.  One user-bucket exchange for
    transitions, one u64 flow fold, bounded (<= eq-lattice^2 = 104k
    pair rows) driver finish.  Output one row (n_pairs, n_moves,
    slope_e6, intercept_e6)."""
    import math

    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    k = DECAY_RES
    side = 3 ** k
    W = 4 * side
    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        lon, lat = oracle.lonlat_from_id(eid)
        inband = np.abs(lat) <= DISSOLVE_LAT
        u = cidx.cell_from_point(CFG, k, lon, lat, plane=False)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        # polar faces produce face ids outside O..R; inband mask hides
        # them before any lattice use
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "eid": pa.array(eid.astype(np.int64)),
            "gy": pa.array(np.where(inband, gy, -1)),
            "gx": pa.array(np.where(inband, gx, -1)),
        })

    def moves(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "uid" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid = uid[order]
        gy = g["gy"].to_numpy(zero_copy_only=False)[order]
        gx = g["gx"].to_numpy(zero_copy_only=False)[order]
        ok = ((uid[1:] == uid[:-1]) & (gy[1:] >= 0) & (gy[:-1] >= 0)
              & ((gy[1:] != gy[:-1]) | (gx[1:] != gx[:-1])))
        a = (gy[:-1][ok] * W + gx[:-1][ok]).astype(np.uint64)
        b = (gy[1:][ok] * W + gx[1:][ok]).astype(np.uint64)
        key = (a << np.uint64(16)) | b
        uq, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uq, type=pa.uint64()),
                         "one": pa.array(cnt.astype(np.int64))})

    folded = sum_by_u64_key(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(moves, batch_format="pyarrow"),
        "key", "one", "n", n_buckets=8,
    )
    Sx = Sy = Sxx = Sxy = 0
    K = 0
    n_moves = 0
    for bt in folded.iter_batches(batch_format="pyarrow"):
        if bt.num_rows == 0:
            continue
        key = bt["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = bt["n"].to_numpy(zero_copy_only=False)
        a = (key >> np.uint64(16)).astype(np.int64)
        b = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
        dy = np.abs(a // W - b // W)
        dxr = np.abs(a % W - b % W)
        cheb = np.maximum(dy, np.minimum(dxr, W - dxr))
        x = np.floor(np.log(cheb.astype(np.float64)) * 1e6).astype(np.int64)
        y = np.floor(np.log(n.astype(np.float64)) * 1e6).astype(np.int64)
        K += len(x)
        n_moves += int(n.sum())
        Sx += int(x.sum())
        Sy += int(y.sum())
        Sxx += int((x * x).sum())
        Sxy += int((x * y).sum())

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    den = K * Sxx - Sx * Sx
    num = K * Sxy - Sx * Sy
    slope_e6 = tdiv(num * 1_000_000, den) if den else 0
    intercept_e6 = tdiv(Sy - tdiv(slope_e6 * Sx, 1_000_000), K) if K else 0
    return pa.table({
        "n_pairs": pa.array([K], type=pa.int64()),
        "n_moves": pa.array([n_moves], type=pa.int64()),
        "slope_e6": pa.array([slope_e6], type=pa.int64()),
        "intercept_e6": pa.array([intercept_e6], type=pa.int64()),
    })


def sql_distance_decay() -> str:
    k = DECAY_RES
    W = 4 * 3 ** k
    pts = _points_sql("events", "event_id")
    idx_sql = oracle.cell_from_point_sql(
        f"SELECT event_id, lon, lat FROM ({pts}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}",
        k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    return f"""
WITH ddi AS MATERIALIZED (
  SELECT event_id, {gy} AS gy, {gx} AS gx
  FROM (SELECT event_id, cell_id FROM {idx_sql} t)
),
ddm AS MATERIALIZED (
  SELECT e.user_id, e.ts, e.event_id, i.gy, i.gx
  FROM events e LEFT JOIN ddi i ON i.event_id = e.event_id
),
ddp AS MATERIALIZED (
  SELECT gy AS by_, gx AS bx,
    lag(gy) OVER w AS ay, lag(gx) OVER w AS ax,
    lag(user_id) OVER w AS pu, user_id
  FROM ddm WINDOW w AS (ORDER BY user_id, ts, event_id)
),
ddf AS MATERIALIZED (
  SELECT ay * {W} + ax AS a, by_ * {W} + bx AS b,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM ddp
  WHERE pu = user_id AND ay IS NOT NULL AND by_ IS NOT NULL
    AND (ay <> by_ OR ax <> bx)
  GROUP BY 1, 2
),
ddq AS MATERIALIZED (
  SELECT n,
    greatest(abs(a // {W} - b // {W}),
             least(abs(a % {W} - b % {W}),
                   {W} - abs(a % {W} - b % {W}))) AS cheb
  FROM ddf
),
dds AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS k, CAST(SUM(n) AS BIGINT) AS nm,
    SUM(CAST(floor(ln(CAST(cheb AS DOUBLE)) * 1000000.0) AS HUGEINT)) AS sx,
    SUM(CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT)) AS sy,
    SUM(CAST(floor(ln(CAST(cheb AS DOUBLE)) * 1000000.0) AS HUGEINT)
      * CAST(floor(ln(CAST(cheb AS DOUBLE)) * 1000000.0) AS HUGEINT)) AS sxx,
    SUM(CAST(floor(ln(CAST(cheb AS DOUBLE)) * 1000000.0) AS HUGEINT)
      * CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT)) AS sxy
  FROM ddq
)
SELECT CAST(k AS BIGINT) AS n_pairs, nm AS n_moves,
  CAST((k * sxy - sx * sy) * 1000000 // (k * sxx - sx * sx) AS BIGINT)
    AS slope_e6,
  CAST((sy - ((k * sxy - sx * sy) * 1000000 // (k * sxx - sx * sx))
    * sx // 1000000) // k AS BIGINT) AS intercept_e6
FROM dds
"""


# ---------------------------------------------------------------------------
# Round 4d: deterministic bootstrap CI of the daily event-count mean
# ---------------------------------------------------------------------------

BOOT_B = 64


def q_bootstrap_ci(sf_dir: str):
    """Uncertainty quantification: a seeded bootstrap CI for the mean
    daily event count — BOOT_B resamples of the (zero-filled) day
    series, resample b drawing day index splitmix64(b*n + i) % n,
    means truncated to integers, CI = order statistics [B//40] and
    [B - 1 - B//40] of the sorted means (~2.5/97.5%).  splitmix64 is
    the engine's seeded-RNG primitive (fixtures.py:38), already SQL-
    mirrored; everything downstream is exact integers.  The day table
    is a bounded (span-length) fold; resampling is a driver finish.
    Output one row (n_days, mean_milli, lo_milli, hi_milli)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        return pa.table({
            "key": pa.array(day, type=pa.uint64()),
            "one": pa.array(np.ones(len(day), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=4,
    )
    days, cnts = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            days.append(b["key"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
            cnts.append(b["c"].to_numpy(zero_copy_only=False))
    day = np.concatenate(days)
    c = np.concatenate(cnts)
    d0, d1 = int(day.min()), int(day.max())
    n = d1 - d0 + 1
    dense = np.zeros(n, dtype=np.int64)
    dense[day - d0] = c
    b_i = np.arange(BOOT_B, dtype=np.uint64)[:, None] * np.uint64(n) \
        + np.arange(n, dtype=np.uint64)[None, :]
    idx = (splitmix64(b_i.ravel()) % np.uint64(n)).astype(np.int64)
    means = dense[idx].reshape(BOOT_B, n).sum(axis=1) * 1000 // n
    means.sort()
    lo_i = BOOT_B // 40
    return pa.table({
        "n_days": pa.array([n], type=pa.int64()),
        "mean_milli": pa.array([int(dense.sum()) * 1000 // n],
                               type=pa.int64()),
        "lo_milli": pa.array([int(means[lo_i])], type=pa.int64()),
        "hi_milli": pa.array([int(means[BOOT_B - 1 - lo_i])],
                             type=pa.int64()),
    })


def sql_bootstrap_ci() -> str:
    n_expr = "(SELECT d1 - d0 + 1 FROM bcr)"
    sm = oracle.splitmix64_sql_ctes(
        f"SELECT b, i, b * {n_expr} + i AS s FROM bcb", "b, i", "s", "h",
        prefix="bcs")
    return f"""
WITH bcc AS MATERIALIZED (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
bcr AS MATERIALIZED (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM bcc),
bcz AS MATERIALIZED (
  SELECT d.day - r.d0 AS i, COALESCE(c.c, 0) AS c
  FROM (SELECT unnest(generate_series(r2.d0, r2.d1)) AS day FROM bcr r2) d
  CROSS JOIN bcr r LEFT JOIN bcc c ON c.day = d.day
),
bcb AS MATERIALIZED (
  SELECT b.b, i.i FROM
    (SELECT unnest(generate_series(0, {BOOT_B - 1})) AS b) b
  CROSS JOIN (SELECT i FROM bcz) i
),
bch AS MATERIALIZED (
  SELECT b, i, h FROM {sm} q
),
bcm AS MATERIALIZED (
  SELECT h.b,
    CAST(SUM(z.c) * 1000 // {n_expr} AS BIGINT) AS mean_m
  FROM bch h JOIN bcz z ON z.i = CAST(h.h % CAST({n_expr} AS UBIGINT)
    AS BIGINT)
  GROUP BY 1
),
bco AS MATERIALIZED (
  SELECT mean_m, row_number() OVER (ORDER BY mean_m, b) AS rk FROM bcm
)
SELECT CAST({n_expr} AS BIGINT) AS n_days,
  CAST((SELECT SUM(c) FROM bcz) * 1000 // {n_expr} AS BIGINT) AS mean_milli,
  (SELECT mean_m FROM bco WHERE rk = {BOOT_B // 40 + 1}) AS lo_milli,
  (SELECT mean_m FROM bco WHERE rk = {BOOT_B - BOOT_B // 40}) AS hi_milli
"""


# ---------------------------------------------------------------------------
# Round 4d: Cohen's kappa of the nearest-centroid classifier
# ---------------------------------------------------------------------------


def q_cohens_kappa(sf_dir: str):
    """Chance-corrected agreement of the nearest-centroid classifier
    with the true labels: kappa = (po - pe) / (1 - pe) cleared to the
    exact integer rational (N*trace - sum_i row_i*col_i) * 1e9 //
    (N^2 - sum_i row_i*col_i) over the confusion matrix that
    q_nearest_centroid already computes distributed (<= 100 bounded
    rows).  DuckDB-truncated division mirrored.  Output one row
    (n, trace, pe_num, kappa_e9)."""
    conf = q_nearest_centroid(sf_dir).to_pandas()  # bounded: <=10x10 rows
    N = int(conf["n"].sum())
    trace = int(conf[conf["label"] == conf["nearest"]]["n"].sum())
    row = conf.groupby("label")["n"].sum()
    col = conf.groupby("nearest")["n"].sum()
    labels = sorted(set(row.index) | set(col.index))
    pe_num = sum(int(row.get(l, 0)) * int(col.get(l, 0)) for l in labels)

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    kappa_e9 = tdiv((N * trace - pe_num) * 1_000_000_000, N * N - pe_num)
    return pa.table({
        "n": pa.array([N], type=pa.int64()),
        "trace": pa.array([trace], type=pa.int64()),
        "pe_num": pa.array([pe_num], type=pa.int64()),
        "kappa_e9": pa.array([kappa_e9], type=pa.int64()),
    })


def sql_cohens_kappa() -> str:
    return f"""
WITH ckc AS MATERIALIZED ({sql_nearest_centroid()}),
ckr AS MATERIALIZED (
  SELECT label AS l, CAST(SUM(n) AS BIGINT) AS r FROM ckc GROUP BY 1
),
ckl AS MATERIALIZED (
  SELECT nearest AS l, CAST(SUM(n) AS BIGINT) AS c FROM ckc GROUP BY 1
),
ckp AS MATERIALIZED (
  SELECT CAST(SUM(COALESCE(r.r, 0) * COALESCE(l.c, 0)) AS BIGINT) AS pe_num
  FROM (SELECT l FROM ckr UNION SELECT l FROM ckl) u
  LEFT JOIN ckr r ON r.l = u.l LEFT JOIN ckl l ON l.l = u.l
),
cks AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
    CAST(SUM(CASE WHEN label = nearest THEN n ELSE 0 END) AS BIGINT)
      AS trace
  FROM ckc
)
SELECT s.nn AS n, s.trace, p.pe_num,
  CAST((s.nn * s.trace - p.pe_num) * 1000000000
    // (s.nn * s.nn - p.pe_num) AS BIGINT) AS kappa_e9
FROM cks s CROSS JOIN ckp p
"""


# ---------------------------------------------------------------------------
# Round 4d: last-touch click attribution
# ---------------------------------------------------------------------------

ATTR_T_S = 3600


def q_attribution(sf_dir: str):
    """Marketing attribution: each purchase is credited to the same
    user's most recent PRIOR click within ATTR_T_S seconds (order by
    ts, event_id; the strictly-earlier rule of colocation_pairs).
    ONE h(user) bucket exchange; inside each group a vectorized
    running-last-click scan (np.maximum.accumulate over click
    positions) attributes every purchase in O(n).  Output
    (event_id, click_event_id, dt_us) for attributed purchases."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

    T_us = ATTR_T_S * 1_000_000
    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        b = batch.filter(pa.array(keep))
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        ts = (b["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "t": pa.array(ts),
            "eid": pa.array(b["event_id"].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "is_click": pa.array(
                (b["event_type"].to_numpy(zero_copy_only=False)
                 == "click").astype(np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], type=pa.int64()),
                          "click_event_id": pa.array([], type=pa.int64()),
                          "dt_us": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "uid" not in g.column_names:
            return empty
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        ic = g["is_click"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((eid, t, uid))
        uid, t, eid, ic = uid[order], t[order], eid[order], ic[order]
        idx = np.arange(len(uid))
        last_click = np.maximum.accumulate(np.where(ic, idx, -1))
        isp = ~ic
        j = last_click[isp]
        ok = j >= 0
        pi = idx[isp][ok]
        j = j[ok]
        ok2 = (uid[j] == uid[pi]) & (t[pi] - t[j] <= T_us)
        pi, j = pi[ok2], j[ok2]
        return pa.table({
            "event_id": pa.array(eid[pi]),
            "click_event_id": pa.array(eid[j]),
            "dt_us": pa.array(t[pi] - t[j]),
        })

    b = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return b.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")


def sql_attribution() -> str:
    T_us = ATTR_T_S * 1_000_000
    return f"""
WITH ate AS MATERIALIZED (
  SELECT event_id, user_id, ts, event_type FROM events
  WHERE event_type IN ('click', 'purchase')
)
SELECT p.event_id, c.event_id AS click_event_id,
  epoch_us(p.ts) - epoch_us(c.ts) AS dt_us
FROM ate p JOIN ate c
  ON c.user_id = p.user_id AND c.event_type = 'click'
  AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
  AND epoch_us(p.ts) - epoch_us(c.ts) <= {T_us}
WHERE p.event_type = 'purchase'
QUALIFY row_number() OVER (
  PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC) = 1
"""


# ---------------------------------------------------------------------------
# Round 4d: persisted IVF index lifecycle (build -> pruned query)
# ---------------------------------------------------------------------------


def q_ann_ivf_persisted(sf_dir: str):
    """Index lifecycle as a first-class pipeline: build the IVF index
    (assignments written as parquet PARTITIONED BY inverted list),
    then answer the standard query set by reading ONLY the probed
    list partitions — at scale a query touches nprobe/n_lists of the
    index bytes and never the corpus.  Same seeds/assignment/probing
    as ann_topk_ivf, so the transient path's oracle verifies the
    persisted one (parity also pinned in tests)."""
    from rhealpixdggs_py_ray.ops import ann

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    emb2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.ann_topk_ivf_persisted(emb, emb2)


def sql_ann_ivf_persisted() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return ann.ann_topk_ivf_sql()


# ---------------------------------------------------------------------------
# Round 4d: image row-projection profiles (document-layout analysis shape)
# ---------------------------------------------------------------------------


def q_image_row_profile(sf_dir: str):
    """Projection profiling over REAL payload bytes: decode each image
    (actor pool, per-(w,h) base-lattice cache), sum channel 0 per
    pixel row, report the peak row (ties -> smallest y) and the total
    — the horizontal-projection primitive of document layout analysis.
    The oracle replays the generative pixel formula over a w x h
    series, so the decode path is value-hash verified end-to-end.
    Output (image_id, w, h, peak_y, peak_sum, total)."""
    from rhealpixdggs_py_ray.fixtures import decode_image, write_images_table

    write_images_table(IMG_DIR, IMG_N)
    ds = ray.data.read_parquet(
        IMG_DIR, override_num_blocks=sizing.read_blocks(IMG_DIR, profile=8))

    class RowProfile:
        def __call__(self, batch: pa.Table) -> pa.Table:
            blobs = batch["bytes"].to_pylist()
            fmts = batch["fmt"].to_pylist()
            ws = batch["w"].to_numpy()
            hs = batch["h"].to_numpy()
            ids = batch["image_id"].to_pylist()
            out = {k: [] for k in ("id", "w", "h", "py", "ps", "tot")}
            for k in range(len(blobs)):
                img = decode_image(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
                rs = img[:, :, 0].astype(np.int64).sum(axis=1)
                py = int(np.argmax(rs))
                out["id"].append(ids[k])
                out["w"].append(int(ws[k]))
                out["h"].append(int(hs[k]))
                out["py"].append(py)
                out["ps"].append(int(rs[py]))
                out["tot"].append(int(rs.sum()))
            return pa.table({
                "image_id": pa.array(out["id"], type=pa.string()),
                "w": pa.array(np.array(out["w"], dtype=np.int64)),
                "h": pa.array(np.array(out["h"], dtype=np.int64)),
                "peak_y": pa.array(np.array(out["py"], dtype=np.int64)),
                "peak_sum": pa.array(np.array(out["ps"], dtype=np.int64)),
                "total": pa.array(np.array(out["tot"], dtype=np.int64)),
            })

    return ds.map_batches(RowProfile, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True,
                          concurrency=sizing.pool())


def sql_image_row_profile() -> str:
    src = _image_src_sql()
    val = "(x * 3 + y * 5 + CAST(u & 255 AS BIGINT)) % 256"
    return f"""
WITH irp AS MATERIALIZED (
  SELECT image_id, w, h, u FROM {src} t
),
irr AS MATERIALIZED (
  SELECT i.image_id, i.w, i.h, y.y, CAST(SUM({val}) AS BIGINT) AS rowsum
  FROM irp i,
    LATERAL (SELECT unnest(generate_series(0, i.h - 1)) AS y) y,
    LATERAL (SELECT unnest(generate_series(0, i.w - 1)) AS x) x
  GROUP BY 1, 2, 3, 4
),
irt AS MATERIALIZED (
  SELECT image_id, CAST(SUM(rowsum) AS BIGINT) AS total FROM irr GROUP BY 1
)
SELECT r.image_id, CAST(r.w AS BIGINT) AS w, CAST(r.h AS BIGINT) AS h,
  CAST(r.y AS BIGINT) AS peak_y, r.rowsum AS peak_sum, t.total
FROM irr r JOIN irt t ON t.image_id = r.image_id
QUALIFY row_number() OVER (
  PARTITION BY r.image_id ORDER BY r.rowsum DESC, r.y ASC) = 1
"""


# ---------------------------------------------------------------------------
# Round 4d: hive-partitioned source with partition pruning
# ---------------------------------------------------------------------------

HIVE_TYPES = ("click", "purchase")


def q_hive_partitioned_source(sf_dir: str):
    """Source-side partition pruning: the events table is laid out
    once as hive-partitioned parquet (partition key = event_type,
    idempotent per sf_dir fingerprint) and the query reads ONLY the
    click/purchase partition directories — the other three event
    types never leave storage (the layout+pruning contract a lakehouse
    source relies on at 100 TB).  Per-partition daily counts prove the
    read.  Output (event_type, day, n)."""
    import glob
    import os

    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"/tmp/graft_hive_events_{tag}"
    marker = os.path.join(root, "_DONE")
    if not os.path.exists(marker):
        ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"],
                   blocks=4)

        def addcols(batch: pa.Table) -> pa.Table:
            et = batch["event_type"].to_numpy(zero_copy_only=False)
            # partition col consumed by the writer; "etype" rides in data
            t = batch.append_column("ptype", pa.array(et, type=pa.string()))
            return t
        ds.map_batches(addcols, batch_format="pyarrow",
                       zero_copy_batch=True).write_parquet(
            root, partition_cols=["ptype"])
        open(marker, "w").write("ok")

    paths = []
    for t in HIVE_TYPES:
        paths.extend(sorted(glob.glob(os.path.join(root, f"ptype={t}",
                                                   "*.parquet"))))
    pruned = ray.data.read_parquet(paths, columns=["ts", "event_type"])
    codes = {t: i for i, t in enumerate(EVT_TYPES)}

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        code = np.array([codes[x] for x in et], dtype=np.uint64)
        key = (day << np.uint64(3)) | code
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(pruned.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=4)

    def finish(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        types = np.array(EVT_TYPES, dtype=object)
        return pa.table({
            "event_type": pa.array(
                types[(key & np.uint64(7)).astype(np.int64)],
                type=pa.string()),
            "day": pa.array((key >> np.uint64(3)).astype(np.int64)),
            "n": batch["n"],
        })

    return folded.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def sql_hive_partitioned_source() -> str:
    types = ", ".join(f"'{t}'" for t in HIVE_TYPES)
    return f"""
SELECT event_type, epoch_us(ts) // 86400000000 AS day,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE event_type IN ({types})
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Round 4d: two-sample Kolmogorov-Smirnov test between A/B arms
# ---------------------------------------------------------------------------


def q_ks_test(sf_dir: str):
    """Distribution-shift detection: the exact two-sample KS statistic
    between the event-value distributions of the user_id%2 arms.
    D = max_x |F_A(x) - F_B(x)| cleared to integers — D_num =
    max |cumA*nB - cumB*nA| over the ordered distinct values, d_e9 =
    D_num * 1e9 // (nA*nB).  Values are positive doubles, so their
    IEEE bit patterns order numerically and serve as the fold key;
    both arms' counts pack into ONE summed value (cntA<<32 | cntB) so
    a single u64 exchange carries the joint histogram.  The ordered
    cumsum runs over the folded DISTINCT-value table (bounded by the
    value grid, not rows).  Output one row (n_a, n_b, d_num, d_e9)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["user_id", "value"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        # +0.0 has bit pattern 0 and sorts first: bit order ==
        # numeric order for all NON-NEGATIVE doubles
        assert (v >= 0).all(), "bit-order key needs non-negative values"
        bits = v.view(np.uint64)
        arm = (uid % 2).astype(np.int64)
        packed = np.where(arm == 0, np.int64(1) << np.int64(32), np.int64(1))
        return pa.table({
            "key": pa.array(bits, type=pa.uint64()),
            "one": pa.array(packed),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "pc", n_buckets=8,
    )
    keys, pcs = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            keys.append(b["key"].to_numpy(zero_copy_only=False)
                        .astype(np.uint64))
            pcs.append(b["pc"].to_numpy(zero_copy_only=False))
    key = np.concatenate(keys)
    pc = np.concatenate(pcs)
    order = np.argsort(key)  # positive doubles: bit order == value order
    pc = pc[order]
    ca = pc >> np.int64(32)
    cb = pc & np.int64((1 << 32) - 1)
    na, nb_ = int(ca.sum()), int(cb.sum())
    cumA = np.cumsum(ca)
    cumB = np.cumsum(cb)
    d_num = int(np.abs(cumA * nb_ - cumB * na).max())
    return pa.table({
        "n_a": pa.array([na], type=pa.int64()),
        "n_b": pa.array([nb_], type=pa.int64()),
        "d_num": pa.array([d_num], type=pa.int64()),
        "d_e9": pa.array([d_num * 1_000_000_000 // (na * nb_)],
                         type=pa.int64()),
    })


def sql_ks_test() -> str:
    return """
WITH ksc AS MATERIALIZED (
  SELECT value,
    CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS ca,
    CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS cb
  FROM events GROUP BY 1
),
ksn AS MATERIALIZED (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
  FROM ksc
),
ksw AS MATERIALIZED (
  SELECT SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
  FROM ksc WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
)
SELECT n.na AS n_a, n.nb AS n_b,
  CAST(MAX(abs(w.cuma * n.nb - w.cumb * n.na)) AS BIGINT) AS d_num,
  CAST(MAX(abs(w.cuma * n.nb - w.cumb * n.na)) * 1000000000
    // (n.na * n.nb) AS BIGINT) AS d_e9
FROM ksw w CROSS JOIN ksn n
GROUP BY n.na, n.nb
"""


# ---------------------------------------------------------------------------
# Round 4d: seeded random walks over the co-presence graph (DeepWalk stage 1)
# ---------------------------------------------------------------------------

RW_LEN = 4
RW_WALKS = 2


def q_random_walks(sf_dir: str):
    """Graph-embedding corpus generation: RW_WALKS deterministic
    random walks of length RW_LEN from every node of the co-presence
    graph — step t from node cur picks neighbor rank
    splitmix64(cur*64 + w*8 + t) % deg(cur) over the CN_DEG-capped
    ascending neighbor list (the DeepWalk sampling stage, made
    replayable by the engine's seeded-RNG primitive).  Reported as
    per-node visit counts (starts included).  Driver-vectorized under
    the 8M-edge cap (k_core precedent); SQL unrolls the fixed-length
    walk as chained CTE joins against a precomputed hash table.
    Output (user_id, visits)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    edges = _copresence_edges(sf_dir)
    parts = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b["key"].to_numpy(zero_copy_only=False)
                         .astype(np.uint64))
    ek = (np.concatenate(parts) if parts else np.array([], dtype=np.uint64))
    assert len(ek) <= 8_000_000, "random_walks driver cap (see ops/cc.py)"
    ua = (ek >> np.uint64(32)).astype(np.int64)
    ub = (ek & np.uint64((1 << 32) - 1)).astype(np.int64)
    # capped ascending neighbor lists (common_neighbors' CN_DEG rule)
    m = np.concatenate([ua, ub])
    x = np.concatenate([ub, ua])
    order = np.lexsort((x, m))
    m, x = m[order], x[order]
    nodes, start = np.unique(m, return_index=True)
    cnt = np.minimum(np.diff(np.append(start, len(m))), CN_DEG)
    nid = {int(n): i for i, n in enumerate(nodes)}
    nbr_start = np.zeros(len(nodes) + 1, dtype=np.int64)
    nbr_start[1:] = np.cumsum(cnt)
    nbr_flat = np.concatenate([x[s:s + c] for s, c in
                               zip(start.tolist(), cnt.tolist())]) \
        if len(nodes) else np.array([], dtype=np.int64)
    visits = np.zeros(len(nodes), dtype=np.int64)
    # walk state: one row per (start node, walk id)
    cur = np.repeat(nodes, RW_WALKS)
    w = np.tile(np.arange(RW_WALKS, dtype=np.int64), len(nodes))
    idx_of = np.vectorize(nid.get, otypes=[np.int64]) if len(nodes) else None
    visits += np.bincount(idx_of(cur), minlength=len(nodes)) \
        if len(cur) else 0
    for t in range(1, RW_LEN + 1):
        ci = idx_of(cur)
        deg = cnt[ci]
        h = splitmix64((cur * 64 + w * 8 + t).astype(np.uint64))
        pick = (h % deg.astype(np.uint64)).astype(np.int64)
        cur = nbr_flat[nbr_start[ci] + pick]
        # walked-to nodes may only appear as neighbors; all neighbors
        # are nodes of the graph (undirected edge set) so idx_of holds
        visits += np.bincount(idx_of(cur), minlength=len(nodes))
    return pa.table({
        "user_id": pa.array(nodes),
        "visits": pa.array(visits),
    })


def sql_random_walks() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT node, w, t, CAST(node * 64 + w * 8 + t AS BIGINT) AS s"
        " FROM rwd", "node, w, t", "s", "h", prefix="rws")
    steps = []
    prev = "rw0"
    for t in range(1, RW_LEN + 1):
        steps.append(f"""
rw{t} AS MATERIALIZED (
  SELECT p.node0, p.w, n.x AS cur
  FROM {prev} p
  JOIN rwg g ON g.node = p.cur
  JOIN rwh h ON h.node = p.cur AND h.w = p.w AND h.t = {t}
  JOIN rwn n ON n.m = p.cur AND n.rn = CAST(h.h % CAST(g.deg AS UBIGINT)
    AS BIGINT)
)""")
        prev = f"rw{t}"
    body = ",".join(steps)
    visits_union = " UNION ALL ".join(
        f"SELECT cur AS node FROM rw{t}" for t in range(0, RW_LEN + 1))
    return f"""
WITH {_copresence_sql_ctes()},
rwdir AS MATERIALIZED (
  SELECT ua AS m, ub AS x FROM cne UNION ALL SELECT ub AS m, ua AS x FROM cne
),
rwn AS MATERIALIZED (
  SELECT m, x, rn FROM (
    SELECT m, x, row_number() OVER (PARTITION BY m ORDER BY x) - 1 AS rn
    FROM rwdir
  ) WHERE rn < {CN_DEG}
),
rwg AS MATERIALIZED (
  SELECT m AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM rwn GROUP BY 1
),
rwd AS MATERIALIZED (
  SELECT g.node, w.w, t.t FROM rwg g,
    (SELECT unnest(generate_series(0, {RW_WALKS - 1})) AS w) w,
    (SELECT unnest(generate_series(1, {RW_LEN})) AS t) t
),
rwh AS MATERIALIZED (
  SELECT node, w, t, h FROM {sm} q
),
rw0 AS MATERIALIZED (
  SELECT node AS node0, w.w, node AS cur FROM rwg,
    (SELECT unnest(generate_series(0, {RW_WALKS - 1})) AS w) w
),{body}
SELECT node AS user_id, CAST(COUNT(*) AS BIGINT) AS visits
FROM ({visits_union}) GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round 4d: association rules over session baskets
# ---------------------------------------------------------------------------


def q_assoc_rules(sf_dir: str):
    """Market-basket mining: sessions (the SESSION_GAP_S rule) are
    baskets of distinct event types; for every type pair (a < b) the
    support, per-type session counts, confidence(a->b) and lift as
    exact integer rationals — conf_e9 = n_ab*1e9 // n_a, lift_e9 =
    n_ab*N*1e9 // (n_a*n_b).  ONE h(user) bucket exchange sessionizes
    and emits packed partial counts (pair/type/total namespaces share
    one u64 fold); the readout is a <= 41-row driver fold.  Output
    (type_a, type_b, n_ab, n_a, n_b, n_sessions, conf_e9, lift_e9)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    codes = {t: i for i, t in enumerate(EVT_TYPES)}
    n_buckets = sizing.exchange_buckets(16)
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"], blocks=4)

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(uid, n_buckets)),
            "uid": pa.array(uid.astype(np.int64)),
            "t": pa.array(batch["ts"].to_numpy(zero_copy_only=False)
                          .astype("datetime64[us]").astype(np.int64)),
            "eid": pa.array(batch["event_id"].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "code": pa.array(np.array(
                [codes[x] for x in
                 batch["event_type"].to_numpy(zero_copy_only=False)],
                dtype=np.int64)),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "uid" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        uid = g["uid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        code = g["code"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, uid))
        uid, t, code = uid[order], t[order], code[order]
        new = np.ones(len(uid), dtype=np.int64)
        new[1:] = ((uid[1:] != uid[:-1])
                   | ((t[1:] - t[:-1]) > SESSION_GAP_S * 1_000_000))
        sess = np.cumsum(new)  # global session index within the bucket
        # distinct (session, type)
        st = np.unique(sess * 8 + code)
        s, c = st // 8, st % 8
        out = []
        # type membership counts: key = (1<<16) | code
        uq, cnt = np.unique(c, return_counts=True)
        out.append(((np.uint64(1) << np.uint64(16))
                    | uq.astype(np.uint64), cnt))
        # pair counts: key = (2<<16) | a*8+b over within-session pairs
        su_, start = np.unique(s, return_index=True)
        n_sess = len(su_)
        ccnt = np.diff(np.append(start, len(s)))
        pairs = []
        for st_, cc_ in zip(start.tolist(), ccnt.tolist()):
            types = c[st_:st_ + cc_]  # ascending (packed sort)
            ia, ib = np.triu_indices(cc_, k=1)
            pairs.append(types[ia] * 8 + types[ib])
        if pairs:
            pk = np.concatenate(pairs)
            uqp, cntp = np.unique(pk, return_counts=True)
            out.append(((np.uint64(2) << np.uint64(16))
                        | uqp.astype(np.uint64), cntp))
        # total sessions: key = 0
        out.append((np.array([0], dtype=np.uint64),
                    np.array([n_sess], dtype=np.int64)))
        keys = np.concatenate([o[0] for o in out])
        vals = np.concatenate([o[1].astype(np.int64) for o in out])
        return pa.table({"key": pa.array(keys, type=pa.uint64()),
                         "one": pa.array(vals)})

    folded = sum_by_u64_key(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow"),
        "key", "one", "n", n_buckets=4,
    )
    counts: dict[int, int] = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["n"].to_pylist()):
                counts[int(k)] = counts.get(int(k), 0) + int(v)
    N = counts.get(0, 0)
    types = list(EVT_TYPES)
    rows = []
    for a in range(len(types)):
        for bb in range(a + 1, len(types)):
            n_ab = counts.get((2 << 16) | (a * 8 + bb), 0)
            if n_ab == 0:
                continue
            n_a = counts[(1 << 16) | a]
            n_b = counts[(1 << 16) | bb]
            rows.append((types[a], types[bb], n_ab, n_a, n_b, N,
                         n_ab * 10**9 // n_a,
                         n_ab * N * 10**9 // (n_a * n_b)))
    return pa.table({
        "type_a": pa.array([r[0] for r in rows], type=pa.string()),
        "type_b": pa.array([r[1] for r in rows], type=pa.string()),
        "n_ab": pa.array(np.array([r[2] for r in rows], dtype=np.int64)),
        "n_a": pa.array(np.array([r[3] for r in rows], dtype=np.int64)),
        "n_b": pa.array(np.array([r[4] for r in rows], dtype=np.int64)),
        "n_sessions": pa.array(np.array([r[5] for r in rows],
                                        dtype=np.int64)),
        "conf_e9": pa.array(np.array([r[6] for r in rows], dtype=np.int64)),
        "lift_e9": pa.array(np.array([r[7] for r in rows], dtype=np.int64)),
    })


def sql_assoc_rules() -> str:
    gap = SESSION_GAP_S * 1_000_000
    return f"""
WITH asg AS MATERIALIZED (
  SELECT user_id, event_type,
    SUM(CASE WHEN gap IS NULL OR gap > {gap} THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS sess
  FROM (
    SELECT user_id, ts, event_id, event_type,
      epoch_us(ts) - lag(epoch_us(ts))
        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
    FROM events)
),
asb AS MATERIALIZED (
  SELECT DISTINCT user_id, sess, event_type FROM asg
),
asn AS MATERIALIZED (
  SELECT CAST(COUNT(DISTINCT user_id * 1000000 + sess) AS BIGINT) AS n
  FROM asg
),
ast AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM asb GROUP BY 1
),
asp AS MATERIALIZED (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM asb a JOIN asb b
    ON a.user_id = b.user_id AND a.sess = b.sess
    AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_ab, ta.n AS n_a, tb.n AS n_b,
  s.n AS n_sessions,
  CAST(p.n_ab * 1000000000 // ta.n AS BIGINT) AS conf_e9,
  CAST(p.n_ab * s.n * 1000000000 // (ta.n * tb.n) AS BIGINT) AS lift_e9
FROM asp p
JOIN ast ta ON ta.event_type = p.type_a
JOIN ast tb ON tb.event_type = p.type_b
CROSS JOIN asn s
"""


# ---------------------------------------------------------------------------
# Round 4d: Haar wavelet energy spectrum per tile
# ---------------------------------------------------------------------------

HAAR_LEN = 32  # power-of-two day window from each tile's first day


def q_haar_energy(sf_dir: str):
    """Multi-scale temporal signature: the Haar detail energy per
    level over each res-2 tile's 32-day zero-padded count series
    (level 1 = day-to-day, level 5 = half-month vs half-month) — the
    scale decomposition behind seasonality/burst classification, exact
    because Haar details of integers are integers.  One packed
    (tile, day) exchange, dense per-tile transform.  Output (tile_id,
    level, energy)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        key = (tile << np.uint64(15)) | day
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        tile = (batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                >> np.uint64(15))
        return batch.append_column("bucket2",
                                   pa.array(hash_bucket_u64(tile, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table({"tile_id": pa.array([], type=pa.string()),
                          "level": pa.array([], type=pa.int64()),
                          "energy": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        key = g["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(key)
        key, c = key[order], c[order]
        tile = key >> np.uint64(15)
        day = (key & np.uint64((1 << 15) - 1)).astype(np.int64)
        tu, start = np.unique(tile, return_index=True)
        cnt = np.diff(np.append(start, len(tile)))
        tiles_out, levels_out, en_out = [], [], []
        for t, s, m in zip(tu.tolist(), start.tolist(), cnt.tolist()):
            d, cc = day[s:s + m], c[s:s + m]
            d0 = int(d[0])
            series = np.zeros(HAAR_LEN, dtype=np.int64)
            inw = (d - d0) < HAAR_LEN
            series[(d - d0)[inw]] = cc[inw]
            lvl = 1
            while len(series) > 1:
                a, b = series[0::2], series[1::2]
                diff = a - b
                tiles_out.append(t)
                levels_out.append(lvl)
                en_out.append(int((diff * diff).sum()))
                series = a + b
                lvl += 1
        t_u64 = (np.array(tiles_out, dtype=np.uint64) << np.uint64(52)) \
            | np.uint64(TILE_RES)
        return pa.table({
            "tile_id": pa.array(su.to_string_fixed(t_u64, TILE_RES),
                                type=pa.string()),
            "level": pa.array(np.array(levels_out, dtype=np.int64)),
            "energy": pa.array(np.array(en_out, dtype=np.int64)),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_haar_energy() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    n_levels = HAAR_LEN.bit_length() - 1
    steps, energies = [], []
    prev = "hw0"
    for lvl in range(1, n_levels + 1):
        steps.append(f"""
hw{lvl} AS MATERIALIZED (
  SELECT tile_id, i // 2 AS i,
    CAST(SUM(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS BIGINT) AS d,
    CAST(SUM(v) AS BIGINT) AS v
  FROM {prev} GROUP BY 1, 2
)""")
        energies.append(
            f"SELECT tile_id, {lvl} AS level,"
            f" CAST(SUM(d * d) AS BIGINT) AS energy FROM hw{lvl} GROUP BY 1")
        prev = f"hw{lvl}"
    return f"""
WITH hwi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
hwc AS MATERIALIZED (
  SELECT i.cell_id AS tile_id, epoch_us(e.ts) // 86400000000 AS day,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM events e JOIN hwi i ON i.event_id = e.event_id
  GROUP BY 1, 2
),
hwr AS MATERIALIZED (
  SELECT tile_id, MIN(day) AS d0 FROM hwc GROUP BY 1
),
hw0 AS MATERIALIZED (
  SELECT g.tile_id, g.i, COALESCE(c.c, 0) AS v
  FROM (SELECT r.tile_id, r.d0, unnest(generate_series(0, {HAAR_LEN - 1}))
          AS i FROM hwr r) g
  LEFT JOIN hwc c ON c.tile_id = g.tile_id AND c.day = g.d0 + g.i
),{",".join(steps)}
SELECT tile_id, CAST(level AS BIGINT) AS level, energy
FROM ({" UNION ALL ".join(energies)})
"""


# ---------------------------------------------------------------------------
# Round 4d: per-source embedding centroid drift (domain QC)
# ---------------------------------------------------------------------------


def q_source_centroid_shift(sf_dir: str):
    """Training-data domain QC: squared distance between the embedding
    centroids of every source pair — the drift score that flags a
    corpus slice living in its own region of embedding space.  Exact:
    embeddings quantize to integer millis; per-(source, dim) sums fold
    via the union-attach exchange (doc->source tag rows and embedding
    rows meet in ONE bucketed groupby — no join operator; embeddings
    cross a shuffle once, as integer lists); the pairwise readout is a
    bounded (n_sources x 64)-row driver fold with bignum-exact
    rationals: d2 = sum_dim (sa*nb - sb*na)^2 // (na*nb)^2 (in milli^2
    units, SQL HUGEINT mirror).  Output (source_a, source_b, n_a, n_b,
    d2_milli2)."""
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key
    from rhealpixdggs_py_ray.ops.dedup import _emb_matrix

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    # bounded: the distinct source list (20 here; ≤ thousands at scale)
    srcs = sorted({r["source"] for r in
                   docs.groupby("source").count().take_all()})
    scode = {s: i for i, s in enumerate(srcs)}
    sref = ray.put(scode)

    def tag_docs(batch: pa.Table) -> pa.Table:
        sc = ray.get(sref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        codes = np.array([sc[s] for s in
                          batch["source"].to_pylist()], dtype=np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(did.astype(np.uint64), 8)),
            "id": pa.array(did.astype(np.int64)),
            "scode": pa.array(codes),
            "q": pa.array([None] * len(did),
                          type=pa.list_(pa.int64())),
        })

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def tag_emb(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        Q_ = np.floor(_emb_matrix(batch).astype(np.float64)
                      * 1000.0).astype(np.int64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(vid.astype(np.uint64), 8)),
            "id": pa.array(vid.astype(np.int64)),
            "scode": pa.array(np.full(len(vid), -1, dtype=np.int64)),
            "q": pa.array(list(Q_), type=pa.list_(pa.int64())),
        })

    def attach(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "id" not in g.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "v": pa.array([], type=pa.int64())})
        ids = g["id"].to_numpy(zero_copy_only=False)
        sc = g["scode"].to_numpy(zero_copy_only=False)
        tag_m = sc >= 0
        id2s = dict(zip(ids[tag_m].tolist(), sc[tag_m].tolist()))
        emb_m = ~tag_m
        if not emb_m.any():
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "v": pa.array([], type=pa.int64())})
        eid = ids[emb_m]
        Q_ = np.array(g.filter(pa.array(emb_m))["q"].to_pylist(),
                      dtype=np.int64)
        codes = np.array([id2s[i] for i in eid.tolist()], dtype=np.int64)
        d = Q_.shape[1]
        cu, cinv = np.unique(codes, return_inverse=True)
        sums = np.zeros((len(cu), d), dtype=np.int64)
        np.add.at(sums, cinv, Q_)
        cnts = np.bincount(cinv)
        keys, vals = [], []
        for i, code in enumerate(cu.tolist()):
            keys.append(code * 64 + np.arange(d, dtype=np.int64))
            vals.append(sums[i])
            keys.append(np.array([(1 << 20) | code], dtype=np.int64))
            vals.append(np.array([cnts[i]], dtype=np.int64))
        return pa.table({
            "key": pa.array(np.concatenate(keys).astype(np.uint64),
                            type=pa.uint64()),
            "v": pa.array(np.concatenate(vals)),
        })

    folded = sum_by_u64_key(
        docs.map_batches(tag_docs, batch_format="pyarrow",
                         zero_copy_batch=True)
        .union(emb.map_batches(tag_emb, batch_format="pyarrow",
                               zero_copy_batch=True))
        .groupby("bucket").map_groups(attach, batch_format="pyarrow"),
        "key", "v", "s", n_buckets=4,
    )
    S: dict[int, int] = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["s"].to_pylist()):
                S[int(k)] = S.get(int(k), 0) + int(v)
    rows = []
    for a in range(len(srcs)):
        na = S.get((1 << 20) | a, 0)
        for bb in range(a + 1, len(srcs)):
            nb_ = S.get((1 << 20) | bb, 0)
            if na == 0 or nb_ == 0:
                continue
            num = sum((S.get(a * 64 + d_, 0) * nb_
                       - S.get(bb * 64 + d_, 0) * na) ** 2
                      for d_ in range(EMB_D))
            rows.append((srcs[a], srcs[bb], na, nb_,
                         num // (na * nb_) ** 2))
    return pa.table({
        "source_a": pa.array([r[0] for r in rows], type=pa.string()),
        "source_b": pa.array([r[1] for r in rows], type=pa.string()),
        "n_a": pa.array(np.array([r[2] for r in rows], dtype=np.int64)),
        "n_b": pa.array(np.array([r[3] for r in rows], dtype=np.int64)),
        "d2_milli2": pa.array(np.array([r[4] for r in rows],
                                       dtype=np.int64)),
    })


def sql_source_centroid_shift() -> str:
    return f"""
WITH sce AS MATERIALIZED (
  SELECT d.source, dim.i - 1 AS dim,
    CAST(floor(CAST(e.embedding[dim.i] AS DOUBLE) * 1000.0) AS BIGINT) AS q
  FROM documents d
  JOIN embeddings e ON e.vec_id = d.doc_id,
    (SELECT unnest(generate_series(1, {EMB_D})) AS i) dim
),
scs AS MATERIALIZED (
  SELECT source, dim, CAST(SUM(q) AS HUGEINT) AS s
  FROM sce GROUP BY 1, 2
),
scn AS MATERIALIZED (
  SELECT d.source, CAST(COUNT(*) AS HUGEINT) AS n
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  GROUP BY 1
),
scp AS MATERIALIZED (
  SELECT a.source AS source_a, b.source AS source_b, na.n AS na, nb.n AS nb,
    CAST(SUM((a.s * nb.n - b.s * na.n) * (a.s * nb.n - b.s * na.n))
      AS HUGEINT) AS num
  FROM scs a
  JOIN scs b ON b.dim = a.dim AND a.source < b.source
  JOIN scn na ON na.source = a.source
  JOIN scn nb ON nb.source = b.source
  GROUP BY 1, 2, 3, 4
)
SELECT source_a, source_b, CAST(na AS BIGINT) AS n_a,
  CAST(nb AS BIGINT) AS n_b,
  CAST(num // ((na * nb) * (na * nb)) AS BIGINT) AS d2_milli2
FROM scp
"""


# ---------------------------------------------------------------------------
# Round 4d: V-optimal histogram binning of the daily series
# ---------------------------------------------------------------------------

VOPT_K = 4


def q_vopt_bins(sf_dir: str):
    """Optimal histogram construction: partition the zero-filled
    global daily count series into VOPT_K contiguous bins minimizing
    total within-bin SSE — the V-optimal binning query optimizers
    build.  Segment cost clears to integers as (L*S2 - S1^2) * 1e6
    // L (Python bignums mirror SQL HUGEINT); the DP tie-breaks on
    the smaller split.  The day table is one bounded fold; the DP is
    a driver finish over n<=span days.  Output VOPT_K rows (bin,
    start_day, end_day, cost_q)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["ts"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        return pa.table({
            "key": pa.array(day, type=pa.uint64()),
            "one": pa.array(np.ones(len(day), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "c", n_buckets=4,
    )
    days, cnts = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            days.append(b["key"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
            cnts.append(b["c"].to_numpy(zero_copy_only=False))
    day = np.concatenate(days)
    c = np.concatenate(cnts)
    d0 = int(day.min())
    n = int(day.max()) - d0 + 1
    v = [0] * n
    for dd, cc in zip(day.tolist(), c.tolist()):
        v[dd - d0] = int(cc)
    assert n >= VOPT_K
    ps1 = [0] * (n + 1)
    ps2 = [0] * (n + 1)
    for i in range(n):
        ps1[i + 1] = ps1[i] + v[i]
        ps2[i + 1] = ps2[i] + v[i] * v[i]

    def cost(j: int, i: int) -> int:  # inclusive 0-based segment [j, i]
        L = i - j + 1
        s1 = ps1[i + 1] - ps1[j]
        s2 = ps2[i + 1] - ps2[j]
        return (L * s2 - s1 * s1) * 1_000_000 // L

    NEG = -1
    INF = float("inf")
    dp = [[INF] * n for _ in range(VOPT_K + 1)]
    arg = [[NEG] * n for _ in range(VOPT_K + 1)]
    for i in range(n):
        dp[1][i] = cost(0, i)
        arg[1][i] = 0
    for k in range(2, VOPT_K + 1):
        for i in range(k - 1, n):
            best, bj = INF, NEG
            for j in range(k - 1, i + 1):  # bin k starts at j
                val = dp[k - 1][j - 1] + cost(j, i)
                if val < best:  # strict: ties keep the SMALLER j
                    best, bj = val, j
            dp[k][i] = best
            arg[k][i] = bj
    bins = []
    i = n - 1
    for k in range(VOPT_K, 0, -1):
        j = arg[k][i]
        bins.append((k, d0 + j, d0 + i, cost(j, i)))
        i = j - 1
    bins.sort()
    return pa.table({
        "bin": pa.array(np.array([b[0] for b in bins], dtype=np.int64)),
        "start_day": pa.array(np.array([b[1] for b in bins],
                                       dtype=np.int64)),
        "end_day": pa.array(np.array([b[2] for b in bins], dtype=np.int64)),
        "cost_q": pa.array(np.array([b[3] for b in bins], dtype=np.int64)),
    })


def sql_vopt_bins() -> str:
    # dp CTEs per k: dpk{k}(i, val, j) with argmin tie-break smaller j
    steps = []
    for k in range(2, VOPT_K + 1):
        steps.append(f"""
dpk{k} AS MATERIALIZED (
  SELECT i, val, j FROM (
    SELECT s.i, p.val + s.cost AS val, s.j,
      row_number() OVER (PARTITION BY s.i ORDER BY p.val + s.cost, s.j)
        AS rn
    FROM vseg s JOIN dpk{k - 1} p ON p.i = s.j - 1
    WHERE s.i >= {k - 1} AND s.j >= {k - 1}
  ) WHERE rn = 1
)""")
    bt = ["""
bt{K} AS MATERIALIZED (
  SELECT {K} AS bin, d.j AS s, d.i AS e FROM dpk{K} d
  WHERE d.i = (SELECT n - 1 FROM vn)
)""".replace("{K}", str(VOPT_K))]
    for k in range(VOPT_K - 1, 0, -1):
        bt.append(f"""
bt{k} AS MATERIALIZED (
  SELECT {k} AS bin, d.j AS s, d.i AS e
  FROM dpk{k} d JOIN bt{k + 1} b ON d.i = b.s - 1
)""")
    union = " UNION ALL ".join(
        f"SELECT bin, s, e FROM bt{k}" for k in range(1, VOPT_K + 1))
    return f"""
WITH vdc AS MATERIALIZED (
  SELECT epoch_us(ts) // 86400000000 AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
vr AS MATERIALIZED (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM vdc),
vz AS MATERIALIZED (
  SELECT d.day - r.d0 AS i, CAST(COALESCE(c.c, 0) AS HUGEINT) AS v
  FROM (SELECT unnest(generate_series(r2.d0, r2.d1)) AS day FROM vr r2) d
  CROSS JOIN vr r LEFT JOIN vdc c ON c.day = d.day
),
vn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vz),
vps AS MATERIALIZED (
  SELECT i, SUM(v) OVER w AS s1, SUM(v * v) OVER w AS s2
  FROM vz WINDOW w AS (ORDER BY i ROWS UNBOUNDED PRECEDING)
),
vseg AS MATERIALIZED (
  SELECT j.i AS j, i.i AS i,
    CAST((CAST(i.i - j.i + 1 AS HUGEINT)
        * (i.s2 - COALESCE(jp.s2, 0))
      - (i.s1 - COALESCE(jp.s1, 0)) * (i.s1 - COALESCE(jp.s1, 0)))
      * 1000000 // CAST(i.i - j.i + 1 AS HUGEINT) AS HUGEINT) AS cost
  FROM vps i JOIN vps j ON j.i <= i.i
  LEFT JOIN vps jp ON jp.i = j.i - 1
),
dpk1 AS MATERIALIZED (
  SELECT i, cost AS val, j FROM vseg WHERE j = 0
),{",".join(steps)},{",".join(bt)}
SELECT CAST(u.bin AS BIGINT) AS bin,
  CAST(u.s + r.d0 AS BIGINT) AS start_day,
  CAST(u.e + r.d0 AS BIGINT) AS end_day,
  CAST(g.cost AS BIGINT) AS cost_q
FROM ({union}) u
JOIN vseg g ON g.j = u.s AND g.i = u.e
CROSS JOIN vr r
"""


# ---------------------------------------------------------------------------
# Round 4d: density-based embedding outliers (LOF-lite on the kNN graph)
# ---------------------------------------------------------------------------

LOF_K = 5


def q_lof_outliers(sf_dir: str):
    """Density-based outlier scoring over the exact kNN graph
    (complements the distributional q_embedding_norm_outliers): each
    vector's k-distance mass dsum = sum over its k neighbors of
    (1e6 - cos_micros); the LOF-style score compares the neighbors'
    average mass to one's own — lof_e6 = (sum_{o in N(p)} dsum_o) *
    1e6 // (k * dsum_p), all integers.  Neighbor masses attach through
    ONE bucketed union exchange (dsum rows + edge rows meet per
    vec_id; no join operator).  Output (qid, dsum, nb_sum, lof_e6)."""
    from rhealpixdggs_py_ray.ops import ann
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    g = ann.knn_graph(emb, k=LOF_K).materialize()  # consumed twice

    def dsum_partial(batch: pa.Table) -> pa.Table:
        qid = batch["qid"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dist = (1_000_000
                - batch["cos_micros"].to_numpy(zero_copy_only=False))
        return pa.table({"key": pa.array(qid, type=pa.uint64()),
                         "one": pa.array(dist.astype(np.int64))})

    dsum = sum_by_u64_key(
        g.map_batches(dsum_partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        "key", "one", "dsum", n_buckets=8,
    ).materialize()  # n vectors rows; consumed twice below

    # attach neighbor masses: edge rows bucket by NEIGHBOR id, dsum
    # rows by their own id; resolve emits (qid, dsum_neighbor) partials
    def edge_rows(batch: pa.Table) -> pa.Table:
        nb_ = batch["vec_id"].to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(nb_, 8)),
            "node": pa.array(nb_, type=pa.uint64()),
            "qid": pa.array(batch["qid"].to_numpy(zero_copy_only=False)
                            .astype(np.int64)),
            "dsum": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
        })

    def dsum_rows(batch: pa.Table) -> pa.Table:
        node = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(node, 8)),
            "node": pa.array(node, type=pa.uint64()),
            "qid": pa.array(np.full(batch.num_rows, -1, dtype=np.int64)),
            "dsum": pa.array(batch["dsum"].to_numpy(zero_copy_only=False)),
        })

    def attach(gr: pa.Table) -> pa.Table:
        if gr.num_rows == 0 or "node" not in gr.column_names:
            return pa.table({"key": pa.array([], type=pa.uint64()),
                             "one": pa.array([], type=pa.int64())})
        node = gr["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        qid = gr["qid"].to_numpy(zero_copy_only=False)
        ds_ = gr["dsum"].to_numpy(zero_copy_only=False)
        own = qid < 0
        mass = dict(zip(node[own].tolist(), ds_[own].tolist()))
        em = ~own
        nb_mass = np.array([mass[n] for n in node[em].tolist()],
                           dtype=np.int64)
        return pa.table({
            "key": pa.array(qid[em].astype(np.uint64), type=pa.uint64()),
            "one": pa.array(nb_mass),
        })

    nb_sum = sum_by_u64_key(
        g.map_batches(edge_rows, batch_format="pyarrow",
                      zero_copy_batch=True)
        .union(dsum.map_batches(dsum_rows, batch_format="pyarrow",
                                zero_copy_batch=True))
        .groupby("bucket").map_groups(attach, batch_format="pyarrow"),
        "key", "one", "nb_sum", n_buckets=8,
    )

    # final attach: own dsum + neighbor sums meet per qid
    def own_rows(batch: pa.Table) -> pa.Table:
        node = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(node, 8)),
            "node": pa.array(node, type=pa.uint64()),
            "v": pa.array(batch["dsum"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
        })

    def nbs_rows(batch: pa.Table) -> pa.Table:
        node = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "bucket": pa.array(hash_bucket_u64(node, 8)),
            "node": pa.array(node, type=pa.uint64()),
            "v": pa.array(batch["nb_sum"].to_numpy(zero_copy_only=False)),
            "kind": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    def finish(gr: pa.Table) -> pa.Table:
        if gr.num_rows == 0 or "node" not in gr.column_names:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "dsum": pa.array([], type=pa.int64()),
                             "nb_sum": pa.array([], type=pa.int64()),
                             "lof_e6": pa.array([], type=pa.int64())})
        node = gr["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = gr["v"].to_numpy(zero_copy_only=False)
        kind = gr["kind"].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(node, return_inverse=True)
        own = np.zeros(len(uq), dtype=np.int64)
        nbs = np.zeros(len(uq), dtype=np.int64)
        np.add.at(own, inv[kind == 0], v[kind == 0])
        np.add.at(nbs, inv[kind == 1], v[kind == 1])
        return pa.table({
            "qid": pa.array(uq),
            "dsum": pa.array(own),
            "nb_sum": pa.array(nbs),
            "lof_e6": pa.array(nbs * 1_000_000 // (LOF_K * own)),
        })

    return (
        dsum.map_batches(own_rows, batch_format="pyarrow",
                         zero_copy_batch=True)
        .union(nb_sum.map_batches(nbs_rows, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .groupby("bucket").map_groups(finish, batch_format="pyarrow")
    )


def sql_lof_outliers() -> str:
    from rhealpixdggs_py_ray.ops import ann

    return f"""
WITH lkg AS MATERIALIZED ({ann.knn_graph_sql(LOF_K)}),
lds AS MATERIALIZED (
  SELECT qid, CAST(SUM(1000000 - cos_micros) AS BIGINT) AS dsum
  FROM lkg GROUP BY 1
),
lnb AS MATERIALIZED (
  SELECT g.qid, CAST(SUM(d.dsum) AS BIGINT) AS nb_sum
  FROM lkg g JOIN lds d ON d.qid = g.vec_id
  GROUP BY 1
)
SELECT o.qid, o.dsum, n.nb_sum,
  CAST(n.nb_sum * 1000000 // ({LOF_K} * o.dsum) AS BIGINT) AS lof_e6
FROM lds o JOIN lnb n ON n.qid = o.qid
"""


# ---------------------------------------------------------------------------
# Round 4d: spectral bisection of the co-presence graph (Fiedler-lite)
# ---------------------------------------------------------------------------

SPEC_ITERS = 32  # sign pattern stabilizes early; 64 doubled oracle bind time
SPEC_SCALE = 1 << 20


def q_spectral_partition(sf_dir: str):
    """Community structure via spectral bisection: SPEC_ITERS exact-
    integer power iterations of (cI - L) (c = max degree + 1) on the
    co-presence graph, deflating the trivial eigenvector by truncated-
    mean subtraction each round and rescaling by x*2^20 // max|x| —
    the procedure converges toward the Fiedler vector and every step
    is integer, so Python and SQL HUGEINT replay it bit-exactly.
    Start vector is seeded per node (splitmix64 % 2001 - 1000).
    Driver iteration under the 8M-edge cap (k_core precedent); the
    oracle unrolls the same iterations as chained CTEs joining the
    edge table.  Output (user_id, v_q20, side)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    edges = _copresence_edges(sf_dir)
    parts = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b["key"].to_numpy(zero_copy_only=False)
                         .astype(np.uint64))
    ek = (np.concatenate(parts) if parts else np.array([], dtype=np.uint64))
    assert len(ek) <= 8_000_000, "spectral driver cap (see ops/cc.py)"
    ua = (ek >> np.uint64(32)).astype(np.int64)
    ub = (ek & np.uint64((1 << 32) - 1)).astype(np.int64)
    nodes = np.unique(np.concatenate([ua, ub]))
    nid = {int(n): i for i, n in enumerate(nodes)}
    n = len(nodes)
    ai = np.array([nid[int(v)] for v in ua], dtype=np.int64)
    bi = np.array([nid[int(v)] for v in ub], dtype=np.int64)
    deg = np.bincount(np.concatenate([ai, bi]), minlength=n)
    c = int(deg.max()) + 1

    def tdiv_vec(a: np.ndarray, b: int) -> np.ndarray:
        q = np.abs(a) // abs(b)
        return np.where((a < 0) != (b < 0), -q, q)

    x = (splitmix64(nodes.astype(np.uint64))
         % np.uint64(2001)).astype(np.int64) - 1000
    for _ in range(SPEC_ITERS):
        y = (c - deg) * x
        np.add.at(y, ai, x[bi])
        np.add.at(y, bi, x[ai])
        m = int(y.sum())
        mm = tdiv_vec(np.array([m], dtype=np.int64), n)[0]
        y = y - mm
        mx = int(np.abs(y).max())
        assert mx > 0, "degenerate spectral iterate"
        x = tdiv_vec(y * SPEC_SCALE, mx)
    return pa.table({
        "user_id": pa.array(nodes),
        "v_q20": pa.array(x),
        "side": pa.array((x >= 0).astype(np.int64)),
    })


def sql_spectral_partition() -> str:
    sm = oracle.splitmix64_sql_ctes(
        "SELECT node, CAST(node AS BIGINT) AS s FROM spn",
        "node", "s", "h", prefix="sps")
    steps = []
    prev = "spx0"
    for t in range(1, SPEC_ITERS + 1):
        steps.append(f"""
spa{t} AS MATERIALIZED (
  SELECT e.a AS node, CAST(SUM(x2.val) AS HUGEINT) AS s
  FROM spe e JOIN {prev} x2 ON x2.node = e.b GROUP BY 1
),
spy{t} AS MATERIALIZED (
  SELECT d.node,
    CAST((SELECT c FROM spc) - d.deg AS HUGEINT) * x.val
      + COALESCE(a.s, 0) AS val
  FROM spd d JOIN {prev} x ON x.node = d.node
  LEFT JOIN spa{t} a ON a.node = d.node
),
spm{t} AS MATERIALIZED (
  SELECT CAST(SUM(val) AS HUGEINT) AS s,
    CAST(COUNT(*) AS HUGEINT) AS n FROM spy{t}
),
spz{t} AS MATERIALIZED (
  SELECT node, val - (SELECT s // n FROM spm{t}) AS val FROM spy{t}
),
spq{t} AS MATERIALIZED (SELECT MAX(abs(val)) AS m FROM spz{t}),
spx{t} AS MATERIALIZED (
  SELECT node, CAST(val * {SPEC_SCALE} // (SELECT m FROM spq{t})
    AS HUGEINT) AS val
  FROM spz{t}
)""")
        prev = f"spx{t}"
    return f"""
WITH {_copresence_sql_ctes()},
spe AS MATERIALIZED (
  SELECT ua AS a, ub AS b FROM cne UNION ALL SELECT ub AS a, ua AS b FROM cne
),
spd AS MATERIALIZED (
  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM spe GROUP BY 1
),
spc AS MATERIALIZED (SELECT MAX(deg) + 1 AS c FROM spd),
spn AS MATERIALIZED (SELECT node FROM spd),
sph AS MATERIALIZED (SELECT node, h FROM {sm} q),
spx0 AS MATERIALIZED (
  SELECT node, CAST(CAST(h % 2001 AS BIGINT) - 1000 AS HUGEINT) AS val
  FROM sph
),{",".join(steps)}
SELECT CAST(node AS BIGINT) AS user_id, CAST(val AS BIGINT) AS v_q20,
  CAST(CASE WHEN val >= 0 THEN 1 ELSE 0 END AS BIGINT) AS side
FROM {prev}
"""


# ---------------------------------------------------------------------------
# Round 4d: empirical-Bayes shrinkage of per-tile purchase rates
# ---------------------------------------------------------------------------

EB_ALPHA = 20


def q_eb_shrinkage(sf_dir: str):
    """Small-area estimation: each res-2 tile's purchase rate shrunk
    toward the global rate with prior strength EB_ALPHA — shrunk_e9 =
    (x*1e9*(n_g) + alpha*x_g*1e9) // ((n + alpha) * n_g) ... kept as
    the exact integer rational (x + alpha*x_g/n_g) / (n + alpha)
    cleared to (x*n_g + alpha*x_g) * 1e9 // ((n + alpha) * n_g).
    The sparse-tile stabilizer every geospatial risk map needs.  One
    packed (tile, is_purchase) exchange + a global fold.  Output
    (tile_id, x, n, raw_e9, shrunk_e9)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "event_type"],
               blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        # value packs (purchase << 32) | 1 so one fold carries x and n
        isp = (et == "purchase").astype(np.int64)
        return pa.table({
            "key": pa.array(tile, type=pa.uint64()),
            "one": pa.array((isp << np.int64(32)) | np.int64(1)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "pc", n_buckets=8,
    ).materialize()  # <= 486 rows

    xg = ng = 0
    rows = []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["pc"].to_pylist()):
                x, n = int(v) >> 32, int(v) & ((1 << 32) - 1)
                xg += x
                ng += n
                rows.append((int(k), x, n))
    out = []
    for tile, x, n in rows:
        raw = x * 10**9 // n
        shr = (x * ng + EB_ALPHA * xg) * 10**9 // ((n + EB_ALPHA) * ng)
        out.append((tile, x, n, raw, shr))
    t_u64 = (np.array([o[0] for o in out], dtype=np.uint64)
             << np.uint64(52)) | np.uint64(TILE_RES)
    return pa.table({
        "tile_id": pa.array(su.to_string_fixed(t_u64, TILE_RES),
                            type=pa.string()),
        "x": pa.array(np.array([o[1] for o in out], dtype=np.int64)),
        "n": pa.array(np.array([o[2] for o in out], dtype=np.int64)),
        "raw_e9": pa.array(np.array([o[3] for o in out], dtype=np.int64)),
        "shrunk_e9": pa.array(np.array([o[4] for o in out],
                                       dtype=np.int64)),
    })


def sql_eb_shrinkage() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH ebi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
ebc AS MATERIALIZED (
  SELECT i.cell_id AS tile_id,
    CAST(COUNT(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS BIGINT)
      AS x,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events e JOIN ebi i ON i.event_id = e.event_id
  GROUP BY 1
),
ebg AS (
  SELECT CAST(SUM(x) AS BIGINT) AS xg, CAST(SUM(n) AS BIGINT) AS ng
  FROM ebc
)
SELECT c.tile_id, c.x, c.n,
  CAST(c.x * 1000000000 // c.n AS BIGINT) AS raw_e9,
  CAST((c.x * g.ng + {EB_ALPHA} * g.xg) * 1000000000
    // ((c.n + {EB_ALPHA}) * g.ng) AS BIGINT) AS shrunk_e9
FROM ebc c CROSS JOIN ebg g
"""


# ---------------------------------------------------------------------------
# Round 4d: leave-one-out target encoding of event_type
# ---------------------------------------------------------------------------


def q_target_encoding(sf_dir: str):
    """Feature engineering: leave-one-out target encoding of
    event_type against the value column — enc = (S_type - v) //
    (n_type - 1) over micro-quantized integer values, the leakage-free
    categorical encoder.  Values quantize BEFORE the sums (order-free
    ints); per-type sums are one tiny fold broadcast into a pure map.
    Output (event_id, event_type, v_micro, enc_micro)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    codes = {t: i for i, t in enumerate(EVT_TYPES)}
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1e6).astype(np.int64)
        code = np.array([codes[x] for x in et], dtype=np.uint64)
        # two key namespaces (code*2 = value sum, code*2+1 = count) so
        # neither can overflow into the other at any scale
        return pa.table({
            "key": pa.array(np.concatenate([code * 2, code * 2 + 1]),
                            type=pa.uint64()),
            "one": pa.array(np.concatenate(
                [v, np.ones(len(v), dtype=np.int64)])),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "pc", n_buckets=4,
    )
    raw = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["pc"].to_pylist()):
                raw[int(k)] = raw.get(int(k), 0) + int(v)
    stats = {c: (raw.get(c * 2, 0), raw.get(c * 2 + 1, 0))
             for c in range(len(EVT_TYPES))}
    sref = ray.put(stats)

    def tdiv(a, b):
        q = np.abs(a) // np.abs(b)
        return np.where((a < 0) != (b < 0), -q, q)

    def encode(batch: pa.Table) -> pa.Table:
        st = ray.get(sref)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1e6).astype(np.int64)
        code = np.array([codes[x] for x in et], dtype=np.int64)
        S = np.array([st[c][0] for c in code.tolist()], dtype=np.int64)
        n = np.array([st[c][1] for c in code.tolist()], dtype=np.int64)
        enc = tdiv(S - v, np.maximum(n - 1, 1))
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "v_micro": pa.array(v),
            "enc_micro": pa.array(enc),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def sql_target_encoding() -> str:
    return """
WITH tec AS MATERIALIZED (
  SELECT event_type,
    CAST(SUM(CAST(floor(value * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
  CAST(floor(e.value * 1000000.0) AS BIGINT) AS v_micro,
  CAST((t.s - CAST(floor(e.value * 1000000.0) AS BIGINT))
    // greatest(t.n - 1, 1) AS BIGINT) AS enc_micro
FROM events e JOIN tec t ON t.event_type = e.event_type
"""


# ---------------------------------------------------------------------------
# Round 4d: greedy maximum-coverage facility placement over tiles
# ---------------------------------------------------------------------------

FAC_K = 5


def q_facility_placement(sf_dir: str):
    """Operations research on the grid: pick FAC_K res-2 tiles
    greedily maximizing newly covered distinct visitors (the classic
    (1 - 1/e) max-coverage heuristic behind store/antenna placement).
    Ties break on the smaller tile id.  Distinct visits fold through
    one u64 exchange; the greedy runs on the driver over the bounded
    (n_users x occupied-tiles) visit set; the oracle unrolls the
    selection as chained CTEs (mmr_rerank pattern).  Output (rank,
    tile_id, gain, covered_total)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id"], blocks=4)

    def visits(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        key = np.unique((uid.astype(np.uint64) << np.uint64(12)) | tile)
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    dvis = sum_by_u64_key(
        ds.map_batches(visits, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "m", n_buckets=8,
    )
    ks = []
    for b in dvis.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            ks.append(b["key"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
    key = np.concatenate(ks)
    uid = (key >> np.uint64(12)).astype(np.int64)
    tile = (key & np.uint64((1 << 12) - 1)).astype(np.int64)
    uu = np.unique(uid)
    uidx = {int(u_): i for i, u_ in enumerate(uu)}
    ui = np.array([uidx[int(u_)] for u_ in uid], dtype=np.int64)
    covered = np.zeros(len(uu), dtype=bool)
    out = []
    tot = 0
    for r in range(1, FAC_K + 1):
        # gain per tile over uncovered users
        live = ~covered[ui]
        tl, gain = np.unique(tile[live], return_counts=True) \
            if live.any() else (np.array([], dtype=np.int64),
                                np.array([], dtype=np.int64))
        if not len(tl):
            break
        best = int(np.argmax(gain))  # first max -> smallest tile (sorted)
        bt = int(tl[best])
        g = int(gain[best])
        covered[ui[(tile == bt)]] = True
        tot += g
        out.append((r, bt, g, tot))
    t_u64 = (np.array([o[1] for o in out], dtype=np.uint64)
             << np.uint64(52)) | np.uint64(TILE_RES)
    return pa.table({
        "rank": pa.array(np.array([o[0] for o in out], dtype=np.int64)),
        "tile_id": pa.array(su.to_string_fixed(t_u64, TILE_RES),
                            type=pa.string()),
        "gain": pa.array(np.array([o[2] for o in out], dtype=np.int64)),
        "covered_total": pa.array(np.array([o[3] for o in out],
                                           dtype=np.int64)),
    })


def sql_facility_placement() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    steps = []
    for r in range(1, FAC_K + 1):
        cov_pred = (f"AND NOT EXISTS (SELECT 1 FROM cov{r - 1} c"
                    f" WHERE c.user_id = v.user_id)") if r > 1 else ""
        picked = " UNION ".join(f"SELECT tile FROM pick{i}"
                                for i in range(1, r + 1))
        steps.append(f"""
gain{r} AS MATERIALIZED (
  SELECT v.tile, CAST(COUNT(*) AS BIGINT) AS g
  FROM fpv v WHERE 1=1 {cov_pred}
  GROUP BY 1
),
pick{r} AS MATERIALIZED (
  SELECT {r} AS rank, tile, g FROM gain{r}
  ORDER BY g DESC, tile ASC LIMIT 1
),
cov{r} AS MATERIALIZED (
  SELECT DISTINCT v.user_id FROM fpv v
  WHERE v.tile IN ({picked})
)""")
    picks_union = " UNION ALL ".join(
        f"SELECT rank, tile, g FROM pick{r}" for r in range(1, FAC_K + 1))
    return f"""
WITH fpi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
fpv AS MATERIALIZED (
  SELECT DISTINCT e.user_id, i.cell_id AS tile
  FROM events e JOIN fpi i ON i.event_id = e.event_id
),{",".join(steps)}
SELECT CAST(p.rank AS BIGINT) AS rank, p.tile AS tile_id, p.g AS gain,
  CAST(SUM(p.g) OVER (ORDER BY p.rank ROWS UNBOUNDED PRECEDING)
    AS BIGINT) AS covered_total
FROM ({picks_union}) p
"""


# ---------------------------------------------------------------------------
# Round 4d: 1-D earth-mover distance between A/B arms
# ---------------------------------------------------------------------------


def q_emd_1d(sf_dir: str):
    """Total distribution shift (companion to ks_test's max): the 1-D
    Wasserstein/EMD between the arms' value distributions clears to
    W_num = sum over the ordered value grid of |cumA*nB - cumB*nA| *
    gap, where gap is the micro-quantized step to the next distinct
    value — all integers (same single-exchange bit-order fold as
    ks_test).  Output one row (n_a, n_b, w_num, emd_micro)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["user_id", "value"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        assert (v >= 0).all()
        bits = v.view(np.uint64)
        arm = (uid % 2).astype(np.int64)
        packed = np.where(arm == 0, np.int64(1) << np.int64(32), np.int64(1))
        return pa.table({
            "key": pa.array(bits, type=pa.uint64()),
            "one": pa.array(packed),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "pc", n_buckets=8,
    )
    keys, pcs = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            keys.append(b["key"].to_numpy(zero_copy_only=False)
                        .astype(np.uint64))
            pcs.append(b["pc"].to_numpy(zero_copy_only=False))
    key = np.concatenate(keys)
    pc_ = np.concatenate(pcs)
    order = np.argsort(key)
    key, pc_ = key[order], pc_[order]
    vq = np.floor(key.view(np.float64) * 1e6).astype(np.int64)
    ca = pc_ >> np.int64(32)
    cb = pc_ & np.int64((1 << 32) - 1)
    na, nb_ = int(ca.sum()), int(cb.sum())
    cumA = np.cumsum(ca)[:-1]
    cumB = np.cumsum(cb)[:-1]
    gap = np.diff(vq)
    w_num = int((np.abs(cumA * nb_ - cumB * na) * gap).sum())
    return pa.table({
        "n_a": pa.array([na], type=pa.int64()),
        "n_b": pa.array([nb_], type=pa.int64()),
        "w_num": pa.array([w_num], type=pa.int64()),
        "emd_micro": pa.array([w_num // (na * nb_)], type=pa.int64()),
    })


def sql_emd_1d() -> str:
    return """
WITH emc AS MATERIALIZED (
  SELECT value, CAST(floor(value * 1000000.0) AS BIGINT) AS vq,
    CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS ca,
    CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS cb
  FROM events GROUP BY 1
),
emn AS MATERIALIZED (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
  FROM emc
),
emw AS MATERIALIZED (
  SELECT vq, SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb,
    lead(vq) OVER (ORDER BY value) AS vnext
  FROM emc WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
)
SELECT n.na AS n_a, n.nb AS n_b,
  CAST(SUM(abs(w.cuma * n.nb - w.cumb * n.na) * (w.vnext - w.vq))
    AS BIGINT) AS w_num,
  CAST(SUM(abs(w.cuma * n.nb - w.cumb * n.na) * (w.vnext - w.vq))
    // (n.na * n.nb) AS BIGINT) AS emd_micro
FROM emw w CROSS JOIN emn n
WHERE w.vnext IS NOT NULL
GROUP BY n.na, n.nb
"""


# ---------------------------------------------------------------------------
# Round 4d: dead-letter quarantine sink
# ---------------------------------------------------------------------------


def q_quarantine_sink(sf_dir: str):
    """Poison-row handling: a validation map splits the stream — rows
    whose props key is divisible by 97 ('suspect_k', checked first) or
    whose micro-quantized value is zero ('zero_value') are WRITTEN to
    a quarantine parquet sink from inside the tasks (the dead-letter
    queue every ingestion pipeline needs), good rows flow on.  The
    summary counts re-read the sink, proving the side-channel: good
    from the main stream, quarantined per reason from the quarantine
    directory.  Output (bucket, n)."""
    import os
    import shutil
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    qdir = f"/tmp/graft_quarantine_{tag}"
    shutil.rmtree(qdir, ignore_errors=True)
    os.makedirs(qdir, exist_ok=True)

    ds = _read(sf_dir, "events", columns=["event_id", "props", "value"],
               blocks=4)

    def split(batch: pa.Table) -> pa.Table:
        ks = pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64()).to_numpy(
            zero_copy_only=False)
        vq = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * 1e6).astype(np.int64)
        suspect = (k % 97) == 0
        zero = (vq == 0) & ~suspect
        bad = suspect | zero
        if bad.any():
            reasons = np.where(suspect, "suspect_k", "zero_value")[bad]
            qt = pa.table({
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False)[bad]),
                "reason": pa.array(reasons.astype(str), type=pa.string()),
            })
            pq.write_table(qt, os.path.join(qdir, f"{uuid.uuid4()}.parquet"))
        return pa.table({
            "key": pa.array(np.zeros(int((~bad).sum()), dtype=np.uint64),
                            type=pa.uint64()),
            "one": pa.array(np.ones(int((~bad).sum()), dtype=np.int64)),
        })

    good = sum_by_u64_key(
        ds.map_batches(split, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=2,
    ).materialize()  # barrier: quarantine files are all written now
    n_good = 0
    for b in good.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            n_good += int(b["n"].to_numpy(zero_copy_only=False).sum())
    counts = {"good": n_good, "suspect_k": 0, "zero_value": 0}
    files = [os.path.join(qdir, f) for f in os.listdir(qdir)]
    if files:
        qds = ray.data.read_parquet(files)
        for b in qds.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                uq, cnt = np.unique(
                    b["reason"].to_numpy(zero_copy_only=False),
                    return_counts=True)
                for r, c in zip(uq.tolist(), cnt.tolist()):
                    counts[r] += int(c)
    buckets = sorted(b for b in counts if counts[b] > 0)  # GROUP BY
    return pa.table({
        "bucket": pa.array(buckets, type=pa.string()),
        "n": pa.array(np.array([counts[b] for b in buckets],
                               dtype=np.int64)),
    })


def sql_quarantine_sink() -> str:
    return """
SELECT CASE
    WHEN CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 97 = 0
      THEN 'suspect_k'
    WHEN CAST(floor(value * 1000000.0) AS BIGINT) = 0 THEN 'zero_value'
    ELSE 'good' END AS bucket,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round 4d: geographically weighted mean surface (GWR-lite)
# ---------------------------------------------------------------------------


def q_gw_mean(sf_dir: str):
    """Locally weighted value surface: at every res-4 cell within
    KDE_R-1 of data, the kernel-weighted mean of event values —
    wmean = (sum_o w(c,o)*sv_o) // (sum_o w(c,o)*n_o) with the
    triangular Chebyshev kernel and micro-quantized values; the
    spatial smoother behind price/risk heatmaps, exact end-to-end.
    Same grid_flood halo shape as kde_raster with TWO integer
    accumulators riding one exchange (key namespaces cell*2 /
    cell*2+1).  Output (cell_id, wsum, wcnt, wmean_micro)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D = KDE_R - 1
    T = FLOOD_T
    n_tx = W // T
    n_ty = side // T
    L = T + 2 * D

    from rhealpixdggs_py_ray.core import index as cidx

    raw = _read(sf_dir, "events", columns=["event_id", "value"], blocks=4)

    def cells2(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 1e6).astype(np.int64)
        lon, lat = oracle.lonlat_from_id(ids)
        m = np.abs(lat) <= DISSOLVE_LAT
        ids, v = ids[m], v[m]
        u = cidx.cell_from_point(CFG, k, lon[m], lat[m], plane=False)
        cu = u.astype(np.uint64)
        return pa.table({
            "key": pa.array(np.concatenate([cu * np.uint64(2),
                                            cu * np.uint64(2) + np.uint64(1)]),
                            type=pa.uint64()),
            "one": pa.array(np.concatenate(
                [np.ones(len(cu), dtype=np.int64), v])),
        })

    occ = sum_by_u64_key(
        raw.map_batches(cells2, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "s",
    )

    def halo(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = batch["s"].to_numpy(zero_copy_only=False)
        u = key >> np.uint64(1)
        is_sv = (key & np.uint64(1)).astype(np.int64)
        face, digits, _res = su.unpack(u)
        d = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (d // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (d % 3) @ pw
        home_ty = gy // T
        home_tx = gx // T
        tiles, lys, lxs, ss, kinds = [], [], [], [], []
        for dty in (-1, 0, 1):
            for dtx in (-1, 0, 1):
                ty = home_ty + dty
                tx = (home_tx + dtx) % n_tx
                ok = (ty >= 0) & (ty < n_ty)
                off = ((gx - tx * T + W // 2) % W) - W // 2
                ly = gy - ty * T + D
                lx = off + D
                ok &= (ly >= 0) & (ly < L) & (lx >= 0) & (lx < L)
                tiles.append((ty * n_tx + tx)[ok])
                lys.append(ly[ok])
                lxs.append(lx[ok])
                ss.append(s[ok])
                kinds.append(is_sv[ok])
        return pa.table({
            "tile": pa.array(np.concatenate(tiles)),
            "ly": pa.array(np.concatenate(lys)),
            "lx": pa.array(np.concatenate(lxs)),
            "s": pa.array(np.concatenate(ss)),
            "kind": pa.array(np.concatenate(kinds)),
        })

    def conv(g: pa.Table) -> pa.Table:
        empty = pa.table({"cell_id": pa.array([], type=pa.string()),
                          "wsum": pa.array([], type=pa.int64()),
                          "wcnt": pa.array([], type=pa.int64()),
                          "wmean_micro": pa.array([], type=pa.int64())})
        if g.num_rows == 0 or "tile" not in g.column_names:
            return empty
        tile = int(g["tile"][0].as_py())
        ty, tx = tile // n_tx, tile % n_tx
        kind = g["kind"].to_numpy(zero_copy_only=False)
        cg = np.zeros((2, L, L), dtype=np.int64)
        np.add.at(cg, (kind,
                       g["ly"].to_numpy(zero_copy_only=False),
                       g["lx"].to_numpy(zero_copy_only=False)),
                  g["s"].to_numpy(zero_copy_only=False))
        acc = np.zeros((2, L, L), dtype=np.int64)
        for dy in range(-D, D + 1):
            for dx in range(-D, D + 1):
                w = KDE_R - max(abs(dy), abs(dx))
                sy0, sy1 = max(0, -dy), L - max(0, dy)
                sx0, sx1 = max(0, -dx), L - max(0, dx)
                acc[:, sy0 + dy:sy1 + dy, sx0 + dx:sx1 + dx] += \
                    w * cg[:, sy0:sy1, sx0:sx1]
        den = acc[0, D:D + T, D:D + T]
        num = acc[1, D:D + T, D:D + T]
        yy, xx = np.nonzero(den)
        if not len(yy):
            return empty
        gy = ty * T + yy
        gx = (tx * T + xx) % W
        wsum = num[yy, xx]
        wcnt = den[yy, xx]

        def tdiv_vec(a, b):
            q = np.abs(a) // np.abs(b)
            return np.where((a < 0) != (b < 0), -q, q)

        return pa.table({
            "cell_id": pa.array(
                _cell_string_array_from_lattice(gy, gx, k),
                type=pa.string()),
            "wsum": pa.array(wsum),
            "wcnt": pa.array(wcnt),
            "wmean_micro": pa.array(tdiv_vec(wsum, wcnt)),
        })

    return (
        occ.map_batches(halo, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile").map_groups(conv, batch_format="pyarrow")
    )


def sql_gw_mean() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    D = KDE_R - 1
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    rebuild = (
        f"CASE gx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
        " WHEN 2 THEN 'Q' ELSE 'R' END || "
        + " || ".join(
            f"CAST(((gy // {3 ** (k - 1 - i)}) % 3) * 3"
            f" + (((gx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
            for i in range(k)
        )
    )
    offs = ", ".join(
        f"({dy}, {dx}, {KDE_R - max(abs(dy), abs(dx))})"
        for dy in range(-D, D + 1) for dx in range(-D, D + 1)
    )
    return f"""
WITH gwi AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
gwc AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx, CAST(COUNT(*) AS BIGINT) AS cnt,
    CAST(SUM(CAST(floor(e.value * 1000000.0) AS BIGINT)) AS BIGINT) AS sv
  FROM gwi i JOIN events e ON e.event_id = i.event_id
  GROUP BY 1, 2
),
gwo(dy, dx, w) AS (VALUES {offs}),
gws AS MATERIALIZED (
  SELECT c.gy + o.dy AS gy, ((c.gx + o.dx) % {W} + {W}) % {W} AS gx,
    CAST(SUM(c.cnt * o.w) AS BIGINT) AS wcnt,
    CAST(SUM(c.sv * o.w) AS BIGINT) AS wsum
  FROM gwc c CROSS JOIN gwo o
  WHERE c.gy + o.dy BETWEEN 0 AND {side - 1}
  GROUP BY 1, 2
)
SELECT {rebuild} AS cell_id, wsum, wcnt,
  CAST(wsum // wcnt AS BIGINT) AS wmean_micro
FROM gws
"""


# ---------------------------------------------------------------------------
# Round 4d: chi-square independence test (event_type x arm)
# ---------------------------------------------------------------------------


def q_chi_square(sf_dir: str):
    """Categorical independence check: the chi-square statistic of the
    event_type x user-parity-arm contingency table, each cell cleared
    to integers — term_e6 = (O*N - r*c)^2 * 1e6 // (r*c*N) summed over
    cells (bignum/HUGEINT; N*O etc exceed int64 by design).  One
    packed (type, arm) fold; 10-cell driver readout.  Output one row
    (n, dof, chi2_e6)."""
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    codes = {t: i for i, t in enumerate(EVT_TYPES)}
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"], blocks=4)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        code = np.array([codes[x] for x in et], dtype=np.uint64)
        key = code * np.uint64(2) + (uid % 2).astype(np.uint64)
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=2,
    )
    O = {}
    for b in folded.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["n"].to_pylist()):
                O[int(k)] = O.get(int(k), 0) + int(v)
    types = [c for c in range(len(EVT_TYPES))
             if O.get(c * 2, 0) + O.get(c * 2 + 1, 0) > 0]
    arms = [a for a in (0, 1)
            if sum(O.get(c * 2 + a, 0) for c in types) > 0]
    N = sum(O.values())
    chi2 = 0
    for c in types:
        r = O.get(c * 2, 0) + O.get(c * 2 + 1, 0)
        for a in arms:
            col = sum(O.get(c2 * 2 + a, 0) for c2 in types)
            o = O.get(c * 2 + a, 0)
            chi2 += (o * N - r * col) ** 2 * 1_000_000 // (r * col * N)
    dof = (len(types) - 1) * (len(arms) - 1)
    return pa.table({
        "n": pa.array([N], type=pa.int64()),
        "dof": pa.array([dof], type=pa.int64()),
        "chi2_e6": pa.array([chi2], type=pa.int64()),
    })


def sql_chi_square() -> str:
    return """
WITH chc AS MATERIALIZED (
  SELECT event_type, user_id % 2 AS arm, CAST(COUNT(*) AS HUGEINT) AS o
  FROM events GROUP BY 1, 2
),
chr_ AS MATERIALIZED (
  SELECT event_type, CAST(SUM(o) AS HUGEINT) AS r FROM chc GROUP BY 1
),
chl AS MATERIALIZED (
  SELECT arm, CAST(SUM(o) AS HUGEINT) AS c FROM chc GROUP BY 1
),
chn AS (SELECT CAST(SUM(o) AS HUGEINT) AS n FROM chc),
chg AS MATERIALIZED (
  SELECT r.event_type, l.arm, r.r, l.c,
    COALESCE(x.o, 0) AS o
  FROM chr_ r CROSS JOIN chl l
  LEFT JOIN chc x ON x.event_type = r.event_type AND x.arm = l.arm
)
SELECT CAST((SELECT n FROM chn) AS BIGINT) AS n,
  CAST((COUNT(DISTINCT g.event_type) - 1)
    * (COUNT(DISTINCT g.arm) - 1) AS BIGINT) AS dof,
  CAST(SUM((g.o * (SELECT n FROM chn) - g.r * g.c)
    * (g.o * (SELECT n FROM chn) - g.r * g.c) * 1000000
    // (g.r * g.c * (SELECT n FROM chn))) AS BIGINT) AS chi2_e6
FROM chg g
"""


# ---------------------------------------------------------------------------
# Round 4d: time-respecting influence spread (SIR-lite over tile-days)
# ---------------------------------------------------------------------------

SPREAD_SEED_MOD = 97


def q_influence_spread(sf_dir: str):
    """Temporal-graph reachability: seeds (user_id % SPREAD_SEED_MOD
    == 0) are infected on the global first day; on every later day d,
    any user sharing a (res-2 tile, day d) visit with a user infected
    STRICTLY BEFORE d becomes infected on d — the time-respecting
    cascade a same-day rule would ill-define.  Distinct visits fold
    once; the day loop runs on the driver over the bounded visit set
    (<= users x 486 rows; the distributed fallback is one exchange per
    day).  Output (user_id, inf_day) for reached users."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"],
               blocks=4)

    def visits(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        day = (ts // 86_400_000_000).astype(np.uint64)
        lon, lat = oracle.lonlat_from_id(ids)
        u = cidx.cell_from_point(CFG, TILE_RES, lon, lat, plane=False)
        tile = u.astype(np.uint64) >> np.uint64(52)
        key = np.unique((uid.astype(np.uint64) << np.uint64(32))
                        | (tile << np.uint64(15)) | day)
        return pa.table({
            "key": pa.array(key, type=pa.uint64()),
            "one": pa.array(np.ones(len(key), dtype=np.int64)),
        })

    dvis = sum_by_u64_key(
        ds.map_batches(visits, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "m", n_buckets=8,
    )
    ks = []
    for b in dvis.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            ks.append(b["key"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64))
    key = np.concatenate(ks)
    uid = (key >> np.uint64(32)).astype(np.int64)
    td = (key & np.uint64((1 << 32) - 1)).astype(np.int64)  # tile<<15|day
    day = td & ((1 << 15) - 1)
    d0, d1 = int(day.min()), int(day.max())
    users = np.unique(uid)
    uidx = {int(u_): i for i, u_ in enumerate(users)}
    ui = np.array([uidx[int(u_)] for u_ in uid], dtype=np.int64)
    inf_day = np.full(len(users), -1, dtype=np.int64)
    inf_day[users % SPREAD_SEED_MOD == 0] = d0
    for d in range(d0 + 1, d1 + 1):
        m = day == d
        if not m.any():
            continue
        infected_before = (inf_day[ui[m]] >= 0) & (inf_day[ui[m]] < d)
        hot_tiles = np.unique(td[m][infected_before])
        newly = np.isin(td[m], hot_tiles) & (inf_day[ui[m]] < 0)
        inf_day[ui[m][newly]] = d
    reached = inf_day >= 0
    return pa.table({
        "user_id": pa.array(users[reached]),
        "inf_day": pa.array(inf_day[reached]),
    })


def sql_influence_spread() -> str:
    idx_sql = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), TILE_RES, CFG, id_cols=("event_id",)
    )
    return f"""
WITH RECURSIVE isv AS MATERIALIZED (
  SELECT DISTINCT e.user_id, t.cell_id AS tile,
    epoch_us(e.ts) // 86400000000 AS day
  FROM events e JOIN (SELECT event_id, cell_id FROM {idx_sql} q) t
    ON t.event_id = e.event_id
),
isr AS MATERIALIZED (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM isv),
walk(user_id, inf_day) AS (
  SELECT DISTINCT user_id, (SELECT d0 FROM isr) AS inf_day FROM isv
  WHERE user_id % {SPREAD_SEED_MOD} = 0
  UNION
  SELECT v2.user_id, v1.day AS inf_day
  FROM walk w
  JOIN isv v1 ON v1.user_id = w.user_id AND v1.day > w.inf_day
  JOIN isv v2 ON v2.tile = v1.tile AND v2.day = v1.day
)
SELECT user_id, CAST(MIN(inf_day) AS BIGINT) AS inf_day
FROM walk GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Round 4d: Hilbert-curve storage layout over the res-4 lattice
# ---------------------------------------------------------------------------

HILB_BITS = 9   # 512x512 square covers the 324x81 equatorial lattice
HILB_SHARDS = 16


def q_hilbert_layout(sf_dir: str):
    """Locality-preserving storage layout (the z-order alternative):
    each in-band event's res-4 lattice cell maps to its Hilbert-curve
    index (classic xy2d — per-bit rotate/reflect, exact integers, the
    loop unrolls to HILB_BITS chained steps in SQL), indexes shard into
    HILB_SHARDS equal key ranges, and the layout quality report is
    per-shard row count + index span (tight spans = good clustering).
    One u64 fold; per-shard readout.  Output (shard, n, d_min,
    d_max)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64, sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    n_sq = 1 << HILB_BITS
    shard_w = (n_sq * n_sq) // HILB_SHARDS

    ds = _read(sf_dir, "events", columns=["event_id"], blocks=4)

    def hilbert_d(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
        x = gx.copy()
        y = gy.copy()
        d = np.zeros(len(x), dtype=np.int64)
        s = n_sq // 2
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate/reflect quadrant
            swap = ry == 0
            flip = rx[swap] == 1
            xf, yf = x[swap], y[swap]
            nx = np.where(flip, s - 1 - yf, yf)
            ny = np.where(flip, s - 1 - xf, xf)
            x[swap] = nx
            y[swap] = ny
            s //= 2
        return d

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = oracle.lonlat_from_id(ids)
        m = np.abs(lat) <= DISSOLVE_LAT
        u = cidx.cell_from_point(CFG, k, lon[m], lat[m], plane=False)
        face, digits, _res = su.unpack(u)
        dg = digits[:, :k].astype(np.int64)
        pw = (3 ** np.arange(k - 1, -1, -1)).astype(np.int64)
        gy = (dg // 3) @ pw
        gx = (face.astype(np.int64) - 1) * side + (dg % 3) @ pw
        d = hilbert_d(gx, gy)
        return pa.table({
            "key": pa.array(d.astype(np.uint64), type=pa.uint64()),
            "one": pa.array(np.ones(len(d), dtype=np.int64)),
        })

    folded = sum_by_u64_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=8,
    )

    def key2(batch: pa.Table) -> pa.Table:
        d = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shard = (d // np.uint64(shard_w)).astype(np.uint64)
        return batch.append_column(
            "bucket2", pa.array(hash_bucket_u64(shard, 8)))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "key" not in g.column_names:
            return pa.table({"shard": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "d_min": pa.array([], type=pa.int64()),
                             "d_max": pa.array([], type=pa.int64())})
        d = g["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False)
        shard = d // shard_w
        uq, inv = np.unique(shard, return_inverse=True)
        cnt = np.zeros(len(uq), dtype=np.int64)
        np.add.at(cnt, inv, n)
        dmin = np.full(len(uq), np.iinfo(np.int64).max)
        np.minimum.at(dmin, inv, d)
        dmax = np.zeros(len(uq), dtype=np.int64)
        np.maximum.at(dmax, inv, d)
        return pa.table({
            "shard": pa.array(uq),
            "n": pa.array(cnt),
            "d_min": pa.array(dmin),
            "d_max": pa.array(dmax),
        })

    return (
        folded.map_batches(key2, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket2").map_groups(resolve, batch_format="pyarrow")
    )


def sql_hilbert_layout() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    n_sq = 1 << HILB_BITS
    shard_w = (n_sq * n_sq) // HILB_SHARDS
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    steps = []
    prev = "hl0"
    s = n_sq // 2
    t = 1
    while s > 0:
        steps.append(f"""
hl{t} AS MATERIALIZED (
  SELECT event_id,
    d + {s * s} * xor(CASE WHEN (x & {s}) > 0 THEN 3 ELSE 0 END,
      CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d,
    CASE WHEN (y & {s}) > 0 THEN x
         WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END AS x,
    CASE WHEN (y & {s}) > 0 THEN y
         WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END AS y
  FROM {prev}
)""")
        prev = f"hl{t}"
        s //= 2
        t += 1
    return f"""
WITH hli AS MATERIALIZED (
  SELECT event_id, cell_id FROM {idx_sql} t
),
hl0 AS MATERIALIZED (
  SELECT event_id, {gx} AS x, {gy} AS y, CAST(0 AS BIGINT) AS d FROM hli
),{",".join(steps)}
SELECT CAST(d // {shard_w} AS BIGINT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(MIN(d) AS BIGINT) AS d_min, CAST(MAX(d) AS BIGINT) AS d_max
FROM {prev} GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Round 4d: RFM customer segmentation over orders
# ---------------------------------------------------------------------------


def q_rfm_segments(sf_dir: str):
    """Classic RFM segmentation: per customer the Recency (last order
    epoch-day), Frequency (order count) and Monetary (total cents)
    metrics, each quintiled by exact rank — q = (rank-1)*5 // n with
    (metric ASC, custkey ASC) rank order — and the 0..124 segment code
    r_q*25 + f_q*5 + m_q.  Sums/max fold through namespaced u64
    exchanges; ranking runs on the gathered per-customer table
    (asserted under the 8M driver cap; beyond it the rank is a
    distributed sort).  Output (custkey, r_day, f, m_cents, r_q, f_q,
    m_q, segment)."""
    from rhealpixdggs_py_ray.ops.agg import max_by_u64_key, sum_by_u64_key

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"],
               blocks=4)

    def sums(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        cents = np.floor(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "key": pa.array(np.concatenate([ck * 2, ck * 2 + 1]),
                            type=pa.uint64()),
            "one": pa.array(np.concatenate(
                [np.ones(len(ck), dtype=np.int64), cents])),
        })

    def lastday(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        day = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)
               // 86_400_000_000)
        return pa.table({"key": pa.array(ck, type=pa.uint64()),
                         "v": pa.array(day)})

    fm = sum_by_u64_key(
        ds.map_batches(sums, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "s", n_buckets=8,
    )
    rd = max_by_u64_key(
        ds.map_batches(lastday, batch_format="pyarrow",
                       zero_copy_batch=True),
        "key", "v", "r", n_buckets=8,
    )
    f_map: dict[int, int] = {}
    m_map: dict[int, int] = {}
    r_map: dict[int, int] = {}
    for b in fm.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["s"].to_pylist()):
                (f_map if int(k) % 2 == 0 else m_map)[int(k) // 2] = \
                    (f_map if int(k) % 2 == 0 else m_map).get(
                        int(k) // 2, 0) + int(v)
    for b in rd.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            for k, v in zip(b["key"].to_pylist(), b["r"].to_pylist()):
                r_map[int(k)] = max(r_map.get(int(k), -1), int(v))
    cks = np.array(sorted(f_map), dtype=np.int64)
    assert len(cks) <= 8_000_000, "rfm driver rank cap"
    f = np.array([f_map[c] for c in cks.tolist()], dtype=np.int64)
    m = np.array([m_map[c] for c in cks.tolist()], dtype=np.int64)
    r = np.array([r_map[c] for c in cks.tolist()], dtype=np.int64)
    n = len(cks)

    def quintile(metric: np.ndarray) -> np.ndarray:
        order = np.lexsort((cks, metric))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(1, n + 1)
        return (rank - 1) * 5 // n

    rq, fq, mq = quintile(r), quintile(f), quintile(m)
    return pa.table({
        "custkey": pa.array(cks),
        "r_day": pa.array(r),
        "f": pa.array(f),
        "m_cents": pa.array(m),
        "r_q": pa.array(rq),
        "f_q": pa.array(fq),
        "m_q": pa.array(mq),
        "segment": pa.array(rq * 25 + fq * 5 + mq),
    })


def sql_rfm_segments() -> str:
    return """
WITH rfa AS MATERIALIZED (
  SELECT o_custkey AS custkey,
    CAST(MAX(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS r_day,
    CAST(COUNT(*) AS BIGINT) AS f,
    CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
      AS m_cents
  FROM orders GROUP BY 1
),
rfq AS MATERIALIZED (
  SELECT custkey, r_day, f, m_cents,
    (row_number() OVER (ORDER BY r_day, custkey) - 1) * 5
      // (SELECT COUNT(*) FROM rfa) AS r_q,
    (row_number() OVER (ORDER BY f, custkey) - 1) * 5
      // (SELECT COUNT(*) FROM rfa) AS f_q,
    (row_number() OVER (ORDER BY m_cents, custkey) - 1) * 5
      // (SELECT COUNT(*) FROM rfa) AS m_q
  FROM rfa
)
SELECT custkey, r_day, f, m_cents,
  CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
  CAST(m_q AS BIGINT) AS m_q,
  CAST(r_q * 25 + f_q * 5 + m_q AS BIGINT) AS segment
FROM rfq
"""


# ---------------------------------------------------------------------------
# Round 4d: degree assortativity of the co-presence graph
# ---------------------------------------------------------------------------


def q_degree_assortativity(sf_dir: str):
    """Mixing-pattern diagnostic: the Pearson correlation of endpoint
    degrees over directed edges (Newman's assortativity).  Everything
    clears to integers; the final denominator sqrt uses EXACT integer
    isqrt — Python math.isqrt vs SQL floor(sqrt(double)) CORRECTED by
    +-1 integer comparisons, so both sides land on the same floor
    square root no matter what the double rounding did.  r_e6 =
    (M*Sxy - Sx*Sy) * 1e6 // isqrt((M*Sxx - Sx^2) * (M*Syy - Sy^2)).
    Output one row (m2, sx, sxy, sxx, r_e6)."""
    import math

    edges = _copresence_edges(sf_dir)
    parts = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            parts.append(b["key"].to_numpy(zero_copy_only=False)
                         .astype(np.uint64))
    ek = (np.concatenate(parts) if parts else np.array([], dtype=np.uint64))
    assert len(ek) <= 8_000_000
    ua = (ek >> np.uint64(32)).astype(np.int64)
    ub = (ek & np.uint64((1 << 32) - 1)).astype(np.int64)
    nodes, deg = np.unique(np.concatenate([ua, ub]), return_counts=True)
    dmap = dict(zip(nodes.tolist(), deg.tolist()))
    da = np.array([dmap[u] for u in ua.tolist()], dtype=np.int64)
    db = np.array([dmap[u] for u in ub.tolist()], dtype=np.int64)
    # directed: each edge contributes both (da, db) and (db, da)
    x = np.concatenate([da, db]).astype(object)
    y = np.concatenate([db, da]).astype(object)
    M = len(x)
    Sx = int(x.sum())
    Sxy = int((x * y).sum())
    Sxx = int((x * x).sum())
    num = M * Sxy - Sx * Sx  # Sy == Sx, Syy == Sxx by symmetry
    den2 = (M * Sxx - Sx * Sx) ** 2
    den = math.isqrt(den2)
    r_e6 = (abs(num) * 10**6 // den) * (1 if num >= 0 else -1) \
        if den else 0
    return pa.table({
        "m2": pa.array([M], type=pa.int64()),
        "sx": pa.array([Sx], type=pa.int64()),
        "sxy": pa.array([Sxy], type=pa.int64()),
        "sxx": pa.array([Sxx], type=pa.int64()),
        "r_e6": pa.array([r_e6], type=pa.int64()),
    })


def sql_degree_assortativity() -> str:
    # exact integer sqrt: float candidate corrected by +-1 integer tests
    cand = "CAST(floor(sqrt(CAST(den2 AS DOUBLE))) AS HUGEINT)"
    isq = (f"(CASE WHEN ({cand} + 1) * ({cand} + 1) <= den2"
           f" THEN {cand} + 1"
           f" WHEN {cand} * {cand} > den2 THEN {cand} - 1"
           f" ELSE {cand} END)")
    return f"""
WITH {_copresence_sql_ctes()},
dad AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT ua AS node FROM cne UNION ALL SELECT ub FROM cne
  ) GROUP BY 1
),
dae AS MATERIALIZED (
  SELECT x.deg AS dx, y.deg AS dy FROM cne e
  JOIN dad x ON x.node = e.ua JOIN dad y ON y.node = e.ub
  UNION ALL
  SELECT y.deg, x.deg FROM cne e
  JOIN dad x ON x.node = e.ua JOIN dad y ON y.node = e.ub
),
das AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
    CAST(SUM(CAST(dx AS HUGEINT)) AS HUGEINT) AS sx,
    CAST(SUM(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy,
    CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx
  FROM dae
),
dar AS MATERIALIZED (
  SELECT m, sx, sxy, sxx,
    m * sxy - sx * sx AS num,
    (m * sxx - sx * sx) * (m * sxx - sx * sx) AS den2
  FROM das
)
SELECT CAST(m AS BIGINT) AS m2, CAST(sx AS BIGINT) AS sx,
  CAST(sxy AS BIGINT) AS sxy, CAST(sxx AS BIGINT) AS sxx,
  CAST(CASE WHEN den2 = 0 THEN 0
    ELSE (abs(num) * 1000000 // {isq})
      * (CASE WHEN num >= 0 THEN 1 ELSE -1 END) END AS BIGINT) AS r_e6
FROM dar
"""
