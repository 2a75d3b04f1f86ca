"""End-to-end Ray Data pipeline tests on the deterministic synthetic
image table (FIXTURES.md §1 + §3 invariants)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from rhealpixdggs_py_ray import fixtures as FX
from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import index as idx
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import wrappers as W
from rhealpixdggs_py_ray.core.config import WGS84_003

N_ROWS = 1200
IMAGES_DIR = "/tmp/rhp_test_images"


@pytest.fixture(scope="module")
def images_dir(ray_session):
    FX.write_images_table(IMAGES_DIR, N_ROWS, rows_per_file=300)
    return IMAGES_DIR


def test_fixture_codecs():
    pix = FX.gen_pixels(32, 16, 12345678901234)
    assert FX.decode_png(FX.encode_png(pix)).tolist() == pix.tolist()
    assert FX.decode_image(pix.tobytes(), "raw", 32, 16).tolist() == pix.tolist()


def test_index_images_matches_reference_semantics(images_dir):
    from rhealpixdggs_py_ray.pipelines import index_images

    ds = index_images(images_dir, resolution=9, override_num_blocks=8)
    df = ds.to_pandas()
    assert len(df) == N_ROWS
    # Engine cell equals the wrapper-API (reference-conformant) answer.
    sample = df.sample(50, random_state=0)
    for _, r in sample.iterrows():
        lon, lat = FX.phash_to_lonlat(np.array([r.phash]))
        assert W.geo_to_rhp(float(lat[0]), float(lon[0]), 9, plane=False) == r.cell_id
    # face column consistent with cell_id
    assert (df.cell_id.str[0].map({"N": 0, "O": 1, "P": 2, "Q": 3, "R": 4, "S": 5}) == df.face).all()


def test_payload_verifier(images_dir):
    import ray.data

    from rhealpixdggs_py_ray.stages.indexer import PayloadVerifier

    ds = ray.data.read_parquet(images_dir).map_batches(
        PayloadVerifier, batch_format="pyarrow", batch_size=256, concurrency=2
    )
    df = ds.to_pandas()
    assert len(df) == N_ROWS
    assert df.payload_ok.all()
    assert np.isinf(df.psnr_db).all()  # lossless formats decode exactly


def test_tile_aggregation_exact(images_dir):
    from rhealpixdggs_py_ray.pipelines import aggregate_tiles, index_images

    ds = index_images(images_dir, resolution=9, override_num_blocks=8)
    tiles = aggregate_tiles(ds, tile_res=1).to_pandas()
    # Oracle: pandas groupby on the same rows.
    df = index_images(images_dir, resolution=9, override_num_blocks=8).to_pandas()
    expect = df.groupby(df.cell_id.str[:2]).size()
    got = tiles.set_index("tile_id")["n"]
    assert got.sort_index().tolist() == expect.sort_index().tolist()
    assert sorted(got.index) == sorted(expect.index)
    assert got.sum() == N_ROWS


def test_cover_semi_join_matches_polyfill(images_dir):
    from rhealpixdggs_py_ray.pipelines import spatial_join_tiling

    poly = geo.Polygon([(-40.0, -25.0), (-40.0, 35.0), (60.0, 35.0), (60.0, -25.0)])
    out = spatial_join_tiling(
        images_dir, region_polygon=poly, resolution=9, cover_res=2, tile_res=2,
        override_num_blocks=8,
    ).to_pandas()
    # Oracle: local polyfill membership on every row.
    cover = W.polyfill(poly, 2, plane=False)
    df = pd.read_parquet(sorted(glob.glob(os.path.join(images_dir, "*.parquet"))))
    lon, lat = FX.phash_to_lonlat(df.phash.to_numpy())
    cells = idx.cell_from_point(WGS84_003, 9, lon, lat, plane=False)
    anc = su.to_string_fixed(su.parent(cells, 2), 2)
    expect_ids = set(df.image_id[np.isin(anc, list(cover))])
    assert set(out.image_id) == expect_ids
    assert len(out) > 0
    # tile assignment is the res-2 prefix
    assert (out.tile_id == out.cell_id.str[:3]).all()


def test_knn_brute_exact(images_dir, ray_session):
    from rhealpixdggs_py_ray.core import projection as prj
    from rhealpixdggs_py_ray.pipelines import index_images, knn_brute

    queries = {
        "qid": np.array([0, 1, 2], dtype=np.int64),
        "lon": np.array([0.0, 100.0, -170.0]),
        "lat": np.array([0.0, 45.0, -80.0]),
    }
    ds = index_images(images_dir, resolution=9, override_num_blocks=8)
    got = knn_brute(ds, queries, k=5).to_pandas().sort_values(["qid", "rank"])
    # Oracle: local numpy brute force.
    df = index_images(images_dir, resolution=9, override_num_blocks=8).to_pandas()
    x, y, z = prj.xyz(WGS84_003, df.lon.to_numpy(), df.lat.to_numpy())
    pts = np.stack([x, y, z], axis=1)
    qx, qy, qz = prj.xyz(WGS84_003, queries["lon"], queries["lat"])
    for qi in range(3):
        d = np.sqrt(((pts - np.array([qx[qi], qy[qi], qz[qi]])) ** 2).sum(axis=1))
        order = np.lexsort((df.image_id.to_numpy(), d))[:5]
        expect = df.image_id.to_numpy()[order].tolist()
        assert got[got.qid == qi].neighbor_id.tolist() == expect


def test_knn_rings_matches_brute_on_dense_region(images_dir, ray_session):
    from rhealpixdggs_py_ray.pipelines import index_images, knn_brute, knn_rings

    queries = {
        "qid": np.array([0], dtype=np.int64),
        "lon": np.array([10.0]),
        "lat": np.array([10.0]),
    }
    ds = index_images(images_dir, resolution=9, override_num_blocks=8)
    brute = knn_brute(ds, queries, k=3).to_pandas().sort_values("rank")
    ds2 = index_images(images_dir, resolution=9, override_num_blocks=8)
    rings = (
        knn_rings(ds2, queries, k=3, resolution=1, expand=2)
        .to_pandas()
        .sort_values("rank")
    )
    assert rings.neighbor_id.tolist() == brute.neighbor_id.tolist()


def test_checkpoint_resume_byte_identical(images_dir, ray_session, tmp_path):
    import pyarrow.parquet as pq

    from rhealpixdggs_py_ray.pipelines import index_images
    from rhealpixdggs_py_ray.state import CheckpointedRun

    files = sorted(glob.glob(os.path.join(images_dir, "*.parquet")))
    partitions = [files[:2], files[2:]]

    def pipeline(fs, out_dir):
        ds = index_images(fs, resolution=9, override_num_blocks=4)
        ds.write_parquet(out_dir)
        return {"rows_out": N_ROWS}

    def read_sorted(root):
        t = pq.read_table(
            sorted(glob.glob(os.path.join(root, "part=*", "*.parquet")))
        ).to_pandas()
        return t.sort_values(["cell_u64", "image_id"]).reset_index(drop=True)

    out1 = str(tmp_path / "run")
    run = CheckpointedRun(out_root=out1, config_payload={"res": 9})
    s1 = run.run(partitions, pipeline)
    assert s1["fresh"] == [0, 1]
    full = read_sorted(out1)

    # Simulate a crash: partition 1's output + manifest vanish.
    import shutil

    shutil.rmtree(os.path.join(out1, "part=00001"))
    os.remove(os.path.join(out1, "part=00001.manifest.json"))
    s2 = run.run(partitions, pipeline)
    assert s2["reused"] == [0] and s2["fresh"] == [1]
    resumed = read_sorted(out1)
    pd.testing.assert_frame_equal(full, resumed)

    # Config change invalidates checkpoints.
    run2 = CheckpointedRun(out_root=out1, config_payload={"res": 8})
    assert run2.completed_partitions() == {}


def test_asof_join_matches_pandas(ray_session):
    """The bucketed merged-lexsort as-of join equals a per-event pandas
    reference (latest order with o_orderdate <= ts, ties -> max
    o_orderkey; unmatched events drop)."""
    from rhealpixdggs_py_ray.pipelines.queries import q_asof_join

    sf = "/root/testdata/sf0.001"
    got = (
        q_asof_join(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    )

    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    od = pd.read_parquet(
        f"{sf}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    m = ev.merge(od, left_on="user_id", right_on="o_custkey")
    m = m[m["o_orderdate"] <= m["ts"]]
    m = m.sort_values(["event_id", "o_orderdate", "o_orderkey"]).groupby("event_id").tail(1)
    want = pd.DataFrame(
        {
            "event_id": m["event_id"].to_numpy(),
            "user_id": m["user_id"].to_numpy(),
            "o_orderkey": m["o_orderkey"].to_numpy(),
            "price_c": np.floor(m["o_totalprice"].to_numpy() * 100).astype(np.int64),
        }
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_range_join_overlap_multimatch(ray_session):
    """Overlapping bands double-count events in the overlap region and
    the per-band aggregates equal a vectorized numpy reference."""
    from rhealpixdggs_py_ray.pipelines.queries import RANGE_BANDS, q_range_join

    sf = "/root/testdata/sf0.001"
    got = q_range_join(sf).to_pandas().set_index("band_id").sort_index()

    v = pd.read_parquet(f"{sf}/events.parquet", columns=["value"])["value"].to_numpy()
    vc = np.floor(v * 100).astype(np.int64)
    n_match = 0
    for i, (lo, hi) in enumerate(RANGE_BANDS):
        m = (v >= lo) & (v < hi)
        n_match += int(m.sum())
        if not m.any():
            assert i not in got.index
            continue
        assert got.loc[i, "n_events"] == int(m.sum())
        assert got.loc[i, "sum_value_c"] == int(vc[m].sum())
    # overlap regions double-count: total matches exceed matched rows
    in_any = (v >= min(b[0] for b in RANGE_BANDS)) & (
        v < max(b[1] for b in RANGE_BANDS)
    )
    assert n_match > int(in_any.sum())
    assert int(got["n_events"].sum()) == n_match


def test_flagship_partitioned_write_roundtrip(images_dir, ray_session, tmp_path):
    """spatial_join_tiling(out_dir=...) writes one directory per face
    (the resumable layout) and the read-back equals the lazy result."""
    from rhealpixdggs_py_ray.pipelines import spatial_join_tiling

    poly = geo.Polygon([(-40.0, -25.0), (-40.0, 35.0), (60.0, 35.0), (60.0, -25.0)])
    kw = dict(
        region_polygon=poly, resolution=9, cover_res=2, tile_res=2,
        override_num_blocks=8,
    )
    lazy = (
        spatial_join_tiling(images_dir, **kw)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    out_dir = str(tmp_path / "tiled")
    written = (
        spatial_join_tiling(images_dir, out_dir=out_dir, **kw)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    parts = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "face=*")))
    assert parts and all(p.startswith("face=") for p in parts)
    cols = ["image_id", "cell_id", "tile_id"]
    pd.testing.assert_frame_equal(lazy[cols], written[cols])


def test_compaction_reduces_file_count(ray_session):
    """q_compact_files must actually compact: the 24-fragment source
    collapses to the byte-target file count (1 at sandbox scale), and
    the checksum row equals the source table's."""
    import glob

    from rhealpixdggs_py_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    t = Q.q_compact_files(sf)
    out = f"/tmp/graft_compact_out_{os.path.basename(sf.rstrip('/'))}"
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert 1 <= len(files) < 24
    import duckdb

    got = duckdb.connect().execute(
        Q.sql_compact_files().replace(
            "FROM events", f"FROM read_parquet('{sf}/events.parquet')", 1
        )
    ).fetchone()
    row = t.to_pydict()
    assert (row["n"][0], row["chk_hi"][0], row["chk_lo"][0]) == got


def test_checkpoint_truncated_manifest_tolerated(ray_session, tmp_path):
    """A truncated manifest (crash mid-publish) must read as
    not-completed, not crash the resume scan."""
    import json

    from rhealpixdggs_py_ray.state import CheckpointedRun

    run = CheckpointedRun(out_root=str(tmp_path), config_payload={"res": 9})
    ok = {
        "partition": 0, "status": "complete",
        "config_hash": __import__(
            "rhealpixdggs_py_ray.state.checkpoint", fromlist=["_config_hash"]
        )._config_hash({"res": 9}),
    }
    with open(tmp_path / "part=00000.manifest.json", "w") as fh:
        json.dump(ok, fh)
    with open(tmp_path / "part=00001.manifest.json", "w") as fh:
        fh.write('{"partition": 1, "status": "comp')  # truncated
    done = run.completed_partitions()
    assert set(done) == {0}
