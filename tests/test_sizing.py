"""Scale-adaptive execution profile (sizing.py; VERDICT r2 item 1).

The rules must (a) reproduce the measured bench-box profile exactly at
sandbox scale — every BENCH number depends on it — and (b) switch to
data/cluster-driven sizing on the 100 TB target: read blocks never
fewer than the input's fragments, pools scale with cluster CPUs,
exchange buckets bounded by group heap size.
"""

from __future__ import annotations

from rhealpixdggs_py_ray import sizing


def test_read_blocks_small_input_keeps_profile():
    # sf-scale: one 20 MB fragment -> the measured profile wins
    assert sizing.compute_read_blocks(20 << 20, 1, profile=16) == 16
    assert sizing.compute_read_blocks(20 << 20, 1, profile=4) == 4


def test_read_blocks_never_below_fragments():
    # 100 TB over 4096 lance/parquet fragments: blocks >= fragments
    # (a low override would fuse fragments into giant read tasks)
    tb100 = 100 * (1 << 40)
    nb = sizing.compute_read_blocks(tb100, 4096, profile=16)
    assert nb >= 4096
    # and >= the 128 MiB block target
    assert nb >= tb100 // sizing.TARGET_BLOCK_BYTES


def test_read_blocks_bytes_driven_when_fragments_are_huge():
    # 16 fragments x 1 TB each: bytes term forces fine-grained tasks
    nb = sizing.compute_read_blocks(16 << 40, 16, profile=16)
    assert nb == (16 << 40) // sizing.TARGET_BLOCK_BYTES


def test_pool_scales_with_cluster_cpus():
    # sandbox profile: 32 cpus -> 8-actor pools (measured optimum)
    assert sizing.pool_max(cpus=32) == 8
    assert sizing.pool(cpus=32) == (1, 8)
    # 256-node x 32-cpu cluster -> pools grow linearly
    assert sizing.pool_max(cpus=256 * 32) == 2048
    # monotone, never zero
    assert sizing.pool_max(cpus=1) == 1
    assert sizing.pool_max(cpus=8192) > sizing.pool_max(cpus=32)
    # secondary pools (divisor=8) coexist: 32 cpus -> 4
    assert sizing.pool_max(8, cpus=32) == 4


def test_exchange_buckets_profile_wins_locally():
    # bench box: exchange fixed cost scales with blocks x partitions,
    # so the measured 8/16/32-bucket profiles must survive at 32 cpus
    for prof in (8, 16, 32, 64):
        assert sizing.exchange_buckets(prof, cpus=32) == prof


def test_exchange_buckets_scale_with_cluster_and_bytes():
    # wide cluster: at least one bucket per 8 cpus keeps the
    # all-to-all wide enough
    assert sizing.exchange_buckets(8, cpus=8192) == 1024
    # 1 TB through the exchange: groups capped at TARGET_GROUP_BYTES
    b = sizing.exchange_buckets(8, approx_bytes=1 << 40, cpus=32)
    assert b >= (1 << 40) // sizing.TARGET_GROUP_BYTES


def test_range_blocks():
    assert sizing.range_blocks(10_000, 8) == 8  # bench scale: profile
    assert sizing.range_blocks(10**12, 8) == 10**12 // sizing.TARGET_RANGE_ROWS


def test_stat_input_single_file(tmp_path):
    f = tmp_path / "t.parquet"
    f.write_bytes(b"x" * 1000)
    sizing._stat_input.cache_clear()
    assert sizing._stat_input(str(f)) == (1000, 1)
    d = tmp_path / "dir"
    d.mkdir()
    for i in range(3):
        (d / f"p{i}.parquet").write_bytes(b"y" * 10)
    assert sizing._stat_input(str(d)) == (30, 3)


def test_multi_fragment_read_rehearsal(ray_session, tmp_path):
    """VERDICT r3 item 8: the read_blocks fragment rule exercised by
    REAL fragmented input — a 24-file variant of the images table must
    (a) size the headline read by fragment count (not the low profile)
    and (b) produce block-level parallelism >= the fragment count with
    identical pipeline output to the single-fragment run."""
    from rhealpixdggs_py_ray import fixtures as FX
    from rhealpixdggs_py_ray.pipelines import index_images

    n_rows = 1200
    frag_dir = str(tmp_path / "frags")
    files = FX.write_images_table(frag_dir, n_rows, rows_per_file=50)
    assert len(files) == 24
    one_dir = str(tmp_path / "one")
    FX.write_images_table(one_dir, n_rows, rows_per_file=n_rows)

    sizing._stat_input.cache_clear()
    nb = sizing.read_blocks(frag_dir, profile=4)
    assert nb >= 24  # fragment term drives the read, not the profile

    frag = index_images(frag_dir, resolution=9, override_num_blocks=nb)
    mat = frag.materialize()
    # The READ must fan out per fragment (downstream bundling may merge
    # the tiny output blocks — that's Ray's min-block coalescing, fine).
    import re

    m = re.search(r"ReadParquet: (\d+) tasks executed", mat.stats())
    assert m and int(m.group(1)) >= 24
    got = mat.to_pandas().sort_values("image_id").reset_index(drop=True)
    want = (
        index_images(one_dir, resolution=9, override_num_blocks=4)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got[["image_id", "cell_id", "face"]].equals(
        want[["image_id", "cell_id", "face"]]
    )


def test_use_actor_pool_rule():
    from rhealpixdggs_py_ray import sizing

    # sandbox sf tables are far below the amortization bound
    assert not sizing.compute_use_actor_pool(10 << 20)
    # the 100 TB shard is far above it
    assert sizing.compute_use_actor_pool(1 << 40)
    assert sizing.compute_use_actor_pool(sizing.ACTOR_POOL_MIN_BYTES)
