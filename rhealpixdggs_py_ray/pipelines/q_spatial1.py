"""Query-suite family module: spatial1 (split from queries.py).

Every q_*/sql_* pair here is re-exported through
pipelines/queries.py; see qbase.py for shared helpers."""

from rhealpixdggs_py_ray.pipelines.qbase import *  # noqa: F401,F403



def q_cell_from_point(sf_dir: str):
    """events.event_id -> res-9 SUID (full projection + digit chain)."""
    return indexed_events(sf_dir).select_columns(["event_id", "cell_id"])


def sql_cell_from_point() -> str:
    inner = oracle.cell_from_point_sql(
        _points_sql("events", "event_id"), RES, CFG, id_cols=("event_id",)
    )
    return f"SELECT event_id, cell_id FROM {inner} t"


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


def q_polyfill(sf_dir: str):
    """Polygon -> res-4 cell cover (rhp_wrappers.py:510-599 semantics)."""
    from rhealpixdggs_py_ray.core import wrappers as W

    cells = sorted(W.polyfill(geo.Polygon(POLYFILL_POLY), POLYFILL_RES, plane=False, cfg=CFG))
    return pa.table({"cell_id": pa.array(cells, type=pa.string())})


def sql_polyfill() -> str:
    return oracle.polyfill_sql(POLYFILL_POLY, POLYFILL_RES, CFG)


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


def q_dissolve(sf_dir: str):
    """Raster->vector dissolve output surface: the directed boundary
    edges only (see _dissolve_boundary's docstring for the algorithm;
    q_dissolve_rings chains the rings)."""
    return _dissolve_boundary(sf_dir).select_columns(["x1", "y1", "x2", "y2"])


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

    return _schema_anchor(
        core_labeled.map_batches(core_label_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
        .union(core_labeled.map_batches(border_emit, batch_format="pyarrow",
                                        zero_copy_batch=True))
        .union(cellstats.map_batches(stat_rows, batch_format="pyarrow",
                                     zero_copy_batch=True))
        .groupby("bucket").map_groups(final_resolve, batch_format="pyarrow"),
        pa.table({"cell_id": pa.array([], type=pa.string()),
                  "cluster": pa.array([], type=pa.int64()),
                  "kind": pa.array([], type=pa.int64())}))


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

    return _schema_anchor(
        summed.map_batches(decode, batch_format="pyarrow",
                           zero_copy_batch=True),
        pa.table({"user_a": pa.array([], type=pa.int64()),
                  "user_b": pa.array([], type=pa.int64()),
                  "n_contacts": pa.array([], type=pa.int64())}))


def q_join_counts(sf_dir: str):
    """Join-count statistics of the occupied res-4 equatorial lattice
    (the classic binary spatial-autocorrelation test that complements
    morans_i): BB = rook-adjacent pairs BOTH occupied, BW = occupied
    cell bordering an empty one, plus the occupied count and the
    total directed adjacency slots.  ONE undirected-edge fold: every
    occupied cell emits its <= 4 valid rook neighbors keyed by the
    canonical pair key; folded count 2 = BB, 1 = BW.  Exact integers
    end-to-end.  Output one row (n_occupied, bb_joins, bw_joins,
    adjacency_slots)."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    M = side * W
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
        "key", "one", "n").materialize()
    n_occ = occ.count()

    def emit(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        gy, gx = key // W, key % W
        us, vs = [], []
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ty = gy + dy
            ok = (ty >= 0) & (ty < side)
            us.append(key[ok])
            vs.append(ty[ok] * W + (gx[ok] + dx + W) % W)
        u = np.concatenate(us)
        v = np.concatenate(vs)
        pk = (np.minimum(u, v) * M + np.maximum(u, v)).astype(np.uint64)
        return pa.table({"pk": pa.array(pk),
                         "one": pa.array(np.ones(len(pk), dtype=np.int64))})

    folded = sum_by_u64_key(
        occ.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        "pk", "one", "c", n_buckets=8)

    def partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bb": pa.array([int((c == 2).sum())], type=pa.int64()),
            "bw": pa.array([int((c == 1).sum())], type=pa.int64()),
            "slots": pa.array([int(c.sum())], type=pa.int64()),
        })

    bb = bw = slots = 0
    for b in folded.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
                   .iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            bb += int(b["bb"].to_numpy(zero_copy_only=False).sum())
            bw += int(b["bw"].to_numpy(zero_copy_only=False).sum())
            slots += int(b["slots"].to_numpy(zero_copy_only=False).sum())
    return pa.table({
        "n_occupied": pa.array([n_occ], type=pa.int64()),
        "bb_joins": pa.array([bb], type=pa.int64()),
        "bw_joins": pa.array([bw], type=pa.int64()),
        "adjacency_slots": pa.array([slots], type=pa.int64()),
    })


def sql_join_counts() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    M = side * W
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    return f"""
WITH jcc AS MATERIALIZED (
  SELECT DISTINCT cell_id FROM {idx_sql} t
),
jco AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx FROM jcc
),
jcd(dy, dx) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)),
jce AS MATERIALIZED (
  SELECT (o.gy * {W} + o.gx) AS u,
    ((o.gy + d.dy) * {W} + ((o.gx + d.dx + {W}) % {W})) AS v
  FROM jco o, jcd d
  WHERE o.gy + d.dy >= 0 AND o.gy + d.dy < {side}
),
jcp AS MATERIALIZED (
  SELECT least(u, v) * {M} + greatest(u, v) AS pk,
    CAST(COUNT(*) AS BIGINT) AS c
  FROM jce GROUP BY 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM jco) AS n_occupied,
  CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS bb_joins,
  CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS bw_joins,
  CAST(SUM(c) AS BIGINT) AS adjacency_slots
FROM jcp
"""



GAP_MIN_NBRS = 3  # unoccupied cell with >= this many occupied rooks


def q_coverage_gaps(sf_dir: str):
    """Coverage-gap QA over the res-4 equatorial lattice: unoccupied
    cells surrounded by >= GAP_MIN_NBRS occupied rook neighbors — the
    holes a collection campaign should fill.  ONE fold with the
    in-fold anti-join: every occupied cell emits +1 to each valid
    rook neighbor AND -2^40 to itself, so a folded sum s identifies
    occupied cells (s < 0) and gap candidates (s >= GAP_MIN_NBRS) in
    the same exchange — no join operator, no second pass.  Output
    (cell_id, n_occupied_nbrs) sorted by cell_id."""
    from rhealpixdggs_py_ray.core import index as cidx
    from rhealpixdggs_py_ray.ops.agg import sum_by_u64_key

    OCC_MARK = np.int64(-(1 << 40))
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
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
        uq = np.unique(key)
        return pa.table({"key": pa.array(uq.astype(np.uint64)),
                         "one": pa.array(np.ones(len(uq), dtype=np.int64))})

    occ = sum_by_u64_key(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True),
        "key", "one", "n", n_buckets=8).materialize()

    def emit(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        gy, gx = key // W, key % W
        ks, vs = [key], [np.full(len(key), OCC_MARK)]
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ty = gy + dy
            ok = (ty >= 0) & (ty < side)
            ks.append(ty[ok] * W + (gx[ok] + dx + W) % W)
            vs.append(np.ones(int(ok.sum()), dtype=np.int64))
        return pa.table({
            "tk": pa.array(np.concatenate(ks).astype(np.uint64)),
            "v": pa.array(np.concatenate(vs)),
        })

    folded = sum_by_u64_key(
        occ.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        "tk", "v", "s", n_buckets=8)

    keys_l, n_l = [], []
    for b in folded.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        tk = b["tk"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = b["s"].to_numpy(zero_copy_only=False)
        m = (s >= GAP_MIN_NBRS)  # occupied cells fold to s < 0
        keys_l.append(tk[m])
        n_l.append(s[m])
    tk = (np.concatenate(keys_l) if keys_l
          else np.array([], dtype=np.int64))
    nn = np.concatenate(n_l) if n_l else np.array([], dtype=np.int64)
    cell_id = _cell_string_array_from_lattice(tk // W, tk % W, k)
    order = np.argsort(cell_id)
    return pa.table({
        "cell_id": pa.array(cell_id[order].tolist(), type=pa.string()),
        "n_occupied_nbrs": pa.array(nn[order]),
    })


def sql_coverage_gaps() -> str:
    k = DISSOLVE_RES
    side = 3 ** k
    W = 4 * side
    pts = (
        f"SELECT event_id, lon, lat FROM ({_points_sql('events', 'event_id')}) p"
        f" WHERE abs(lat) <= {DISSOLVE_LAT!r}"
    )
    idx_sql = oracle.cell_from_point_sql(pts, k, CFG, id_cols=("event_id",))
    gy, gx = _dissolve_rowcol_sql(k)
    # rebuild cell_id string from (gy, gx) — digit i packs
    # 3*((gy // 3^(k-1-i)) % 3) + ((gx % side) // 3^(k-1-i)) % 3
    digits = " || ".join(
        f"CAST(3 * ((ty // {3 ** (k - 1 - i)}) % 3)"
        f" + (((tx % {side}) // {3 ** (k - 1 - i)}) % 3) AS VARCHAR)"
        for i in range(k))
    rebuild = (f"CASE tx // {side} WHEN 0 THEN 'O' WHEN 1 THEN 'P'"
               f" WHEN 2 THEN 'Q' ELSE 'R' END || {digits}")
    return f"""
WITH cgc AS MATERIALIZED (
  SELECT DISTINCT cell_id FROM {idx_sql} t
),
cgo AS MATERIALIZED (
  SELECT {gy} AS gy, {gx} AS gx FROM cgc
),
cgd(dy, dx) AS (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)),
cgn AS MATERIALIZED (
  SELECT (o.gy + d.dy) AS ty, ((o.gx + d.dx + {W}) % {W}) AS tx,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM cgo o, cgd d
  WHERE o.gy + d.dy >= 0 AND o.gy + d.dy < {side}
  GROUP BY 1, 2
)
SELECT {rebuild} AS cell_id, n AS n_occupied_nbrs
FROM cgn
WHERE n >= {GAP_MIN_NBRS}
  AND NOT EXISTS (SELECT 1 FROM cgo o2
                  WHERE o2.gy = cgn.ty AND o2.gx = cgn.tx)
"""


__all__ = [
    "q_coverage_gaps",
    "sql_coverage_gaps",
    "GAP_MIN_NBRS",
    "q_join_counts",
    "sql_join_counts",
    "q_cell_from_point",
    "sql_cell_from_point",
    "q_cell_from_point_lon0",
    "sql_cell_from_point_lon0",
    "q_cell_from_point_nside2",
    "sql_cell_from_point_nside2",
    "q_cell_from_point_unit",
    "sql_cell_from_point_unit",
    "q_cell_from_point_ns12",
    "sql_cell_from_point_ns12",
    "q_cell_from_point_radians",
    "sql_cell_from_point_radians",
    "q_cell_from_point_shifted",
    "sql_cell_from_point_shifted",
    "q_cell_color",
    "sql_cell_color",
    "q_spatial_join_bbox",
    "sql_spatial_join_bbox",
    "q_zonal_stats",
    "sql_zonal_stats",
    "q_grid",
    "sql_grid",
    "q_grid_ul_r4",
    "sql_grid_ul_r4",
    "q_knn",
    "sql_knn",
    "q_polyfill",
    "sql_polyfill",
    "q_polyfill_polar",
    "sql_polyfill_polar",
    "q_compress_polar",
    "sql_compress_polar",
    "q_polyfill_polar_ns12",
    "sql_polyfill_polar_ns12",
    "q_polyfill_polar_south",
    "sql_polyfill_polar_south",
    "q_compress",
    "sql_compress",
    "q_k_ring",
    "sql_k_ring",
    "q_k_ring_polar",
    "sql_k_ring_polar",
    "q_cell_geometry",
    "q_cell_geometry_r3",
    "q_cell_geometry_radians",
    "sql_cell_geometry_radians",
    "q_raster_sample_global",
    "sql_raster_sample_global",
    "q_hierarchy",
    "sql_hierarchy",
    "q_successor",
    "sql_successor",
    "q_validate",
    "sql_validate",
    "q_minimal_cover",
    "sql_minimal_cover",
    "q_cell_latitudes",
    "sql_cell_latitudes",
    "q_spatial_antijoin",
    "sql_spatial_antijoin",
    "q_linetrace",
    "sql_linetrace",
    "q_cells_from_region",
    "sql_cells_from_region",
    "q_cells_from_region_polar",
    "sql_cells_from_region_polar",
    "q_cells_from_parallel_polar",
    "sql_cells_from_parallel_polar",
    "q_cells_from_parallel",
    "sql_cells_from_parallel",
    "q_cells_from_meridian",
    "sql_cells_from_meridian",
    "q_knn_rings",
    "q_cell_stats",
    "sql_cell_stats",
    "q_cell_from_region",
    "sql_cell_from_region",
    "sql_cell_geometry",
    "sql_cell_geometry_r3",
    "q_predecessor",
    "sql_predecessor",
    "q_interval",
    "sql_interval",
    "q_suid_rowcol",
    "sql_suid_rowcol",
    "q_num_cells",
    "sql_num_cells",
    "q_xy_range",
    "sql_xy_range",
    "q_cell_boundary",
    "sql_cell_boundary",
    "q_cell_interior",
    "sql_cell_interior",
    "q_cell_contains",
    "sql_cell_contains",
    "q_cell_overlaps",
    "sql_cell_overlaps",
    "q_random_cells",
    "sql_random_cells",
    "q_random_points",
    "sql_random_points",
    "q_cell_zone",
    "sql_cell_zone",
    "q_focal_stats",
    "sql_focal_stats",
    "q_distance_join",
    "sql_distance_join",
    "q_trajectory_segments",
    "sql_trajectory_segments",
    "q_cap_cover",
    "sql_cap_cover",
    "q_uncompact_cells",
    "sql_uncompact_cells",
    "q_grid_distance",
    "sql_grid_distance",
    "q_grid_path",
    "sql_grid_path",
    "q_space_time_cube",
    "sql_space_time_cube",
    "q_dup_spans",
    "sql_dup_spans",
    "q_polygon_overlay",
    "sql_polygon_overlay",
    "q_morans_i",
    "sql_morans_i",
    "q_nearest_poi",
    "sql_nearest_poi",
    "q_mixed_res_counts",
    "sql_mixed_res_counts",
    "q_od_matrix",
    "sql_od_matrix",
    "q_linetrace_polar",
    "sql_linetrace_polar",
    "q_aspect_buckets",
    "sql_aspect_buckets",
    "q_dissolve",
    "sql_dissolve",
    "q_line_buffer",
    "sql_line_buffer",
    "q_idw_raster",
    "sql_idw_raster",
    "q_dissolve_rings",
    "sql_dissolve_rings",
    "q_grid_flood",
    "sql_grid_flood",
    "q_adaptive_cover",
    "sql_adaptive_cover",
    "q_dwell_time",
    "sql_dwell_time",
    "q_impossible_travel",
    "sql_impossible_travel",
    "q_dbscan_cells",
    "sql_dbscan_cells",
    "q_colocation_pairs",
]
