"""Scale-adaptive execution profile (round-3; VERDICT r2 item 1).

Round 1/2 hardcoded the bench-box tuning directly into pipeline code:
``override_num_blocks=16`` reads, 4-block/8-bucket exchanges, and
``concurrency=(1, 8)`` actor pools.  Those values are MEASURED optima
for this sandbox (32 shared cpus, memory-bandwidth-bound above ~16
active kernel cores; see BASELINE.md perf log), but on the real target
— a multi-node cluster streaming ~100 TB — a hard 16-block override
forces 16 giant read tasks and an 8-actor pool starves the cluster.

This module is the single place that turns (input size, fragment
count, cluster CPUs) into block / bucket / pool sizes.  The rules are
written so that at the sandbox's scale they reproduce the measured
profile EXACTLY (all BENCH numbers carry over), and at cluster scale
the data-driven terms take over:

- read blocks:  never fewer than the input's file fragments, never
  bigger than ~128 MiB per block (Ray's own target); the recorded
  profile value is the floor that keeps small-input parallelism.
- exchange buckets:  at least the measured profile; grows with the
  exchanged bytes (so one bucket group always fits a worker heap) and
  with cluster width (≥ cpus/8 keeps the all-to-all wide enough).
  The profile stays the winner on the bench box because exchange
  fixed cost scales with blocks × partitions (BASELINE.md perf #9).
- actor pools:  cpus // 4 (= the measured 8 on the 32-cpu box), so
  pools scale with the cluster while still leaving slots for the
  other CPU stages in the same DAG (full-slot pools starve them —
  measured, BASELINE.md operator-starvation note).

Everything is pure-function testable (tests/test_sizing.py); the
path-taking wrappers stat the filesystem once per path per session.
"""

from __future__ import annotations

import functools
import os

TARGET_BLOCK_BYTES = 128 << 20  # at-scale read-block target (Ray default)
TARGET_GROUP_BYTES = 64 << 20   # max bytes per exchange bucket group
TARGET_RANGE_ROWS = 2_000_000   # synthetic-range rows per block (headline span)


def cluster_cpus() -> int:
    """Total cluster CPUs (the sandbox is one node; on the target this
    sums every node ray reports)."""
    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 0))
            if n > 0:
                return n
    except Exception:
        pass
    return os.cpu_count() or 8


@functools.lru_cache(maxsize=512)
def _stat_input(path: str) -> tuple[int, int]:
    """(total_bytes, n_fragments) for a parquet file or directory."""
    if os.path.isdir(path):
        total, n = 0, 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.startswith("."):
                    continue
                total += os.path.getsize(os.path.join(root, f))
                n += 1
        return total, max(1, n)
    try:
        return os.path.getsize(path), 1
    except OSError:
        return 0, 1


def compute_read_blocks(
    total_bytes: int, n_fragments: int, profile: int, cpus: int | None = None
) -> int:
    """Read-task count: the recorded profile is the small-input floor;
    large inputs are sized by fragments and the 128 MiB block target
    (never fewer blocks than fragments — a lower override would fuse
    fragments into giant tasks)."""
    want = max(n_fragments, -(-total_bytes // TARGET_BLOCK_BYTES))
    return max(profile, want)


def read_blocks(path: str, profile: int = 16) -> int:
    total_bytes, n_fragments = _stat_input(path)
    return compute_read_blocks(total_bytes, n_fragments, profile)


def range_blocks(n_rows: int, profile: int) -> int:
    """Block count for synthetic ``ray.data.range``/``from_items``
    inputs: the profile at bench scale, rows/2M at generator scale."""
    return max(profile, -(-int(n_rows) // TARGET_RANGE_ROWS))


def exchange_buckets(
    profile: int, approx_bytes: int | None = None, cpus: int | None = None
) -> int:
    """Hash-bucket count for the union+groupby exchanges.  The profile
    (the measured bench-box value) wins locally; at scale the bucket
    count follows exchanged bytes (heap bound) and cluster width."""
    c = cpus if cpus is not None else cluster_cpus()
    want = max(profile, c // 8)
    if approx_bytes:
        want = max(want, -(-int(approx_bytes) // TARGET_GROUP_BYTES))
    return want


def pool_max(divisor: int = 4, cpus: int | None = None) -> int:
    """Actor-pool upper bound: cpus // divisor (8 on the 32-cpu bench
    box with the default divisor — the measured optimum that leaves
    slots for coexisting CPU stages), scaling linearly with the
    cluster."""
    c = cpus if cpus is not None else cluster_cpus()
    return max(1, c // divisor)


def pool(divisor: int = 4, cpus: int | None = None) -> tuple[int, int]:
    """``concurrency=`` tuple for an autoscaling actor pool."""
    return (1, pool_max(divisor, cpus))


ACTOR_POOL_MIN_BYTES = 256 << 20  # below this, task maps beat pools


def compute_use_actor_pool(total_bytes: int, min_bytes: int | None = None) -> bool:
    """Stateful-stage dispatch rule: an actor pool pays ~0.8 s of
    launch latency per query on this box (measured warm A/B at sf0.1:
    1.03 s actor-pool vs 0.23 s task map for the identical indexing
    stage), which only amortizes when the input is big enough to keep
    the pool busy.  Small inputs run the SAME callable as a task map
    (its per-actor state is trivially cheap to rebuild — DGGS tables
    build in 0.2 ms); at-scale inputs (>= 256 MiB) keep the pool, the
    correct 100 TB shape."""
    return total_bytes >= (ACTOR_POOL_MIN_BYTES if min_bytes is None else min_bytes)


def use_actor_pool(path: str, min_bytes: int | None = None) -> bool:
    total_bytes, _ = _stat_input(path)
    return compute_use_actor_pool(total_bytes, min_bytes)


def use_actor_pool_ds(ds) -> bool:
    """``use_actor_pool`` for a Dataset: sums its input files when the
    lineage exposes them (a bare read does; chained datasets return []
    — treat unknown as big, the scale-safe default)."""
    try:
        files = ds.input_files()
    except Exception:
        return True
    if not files:
        return True
    total = 0
    for f in files:
        p = f[len("local://"):] if f.startswith("local://") else f
        try:
            total += os.path.getsize(p)
        except OSError:
            return True
    return compute_use_actor_pool(total)


def stateful_map(ds, cls, ctor_kwargs=None, divisor: int = 4,
                 pool_hint: bool | None = None, **kw):
    """Dispatch a stateful batch stage: actor pool when the input is
    big enough to amortize the pool's launch latency (or unknown),
    else the same callable instantiated once on the driver and run as
    a task map (measured: 1.0-1.3 s actor vs 0.2-0.4 s task warm on
    sandbox-scale inputs, identical output).  ``pool_hint`` lets a
    caller that knows the input size decide explicitly."""
    big = use_actor_pool_ds(ds) if pool_hint is None else pool_hint
    if big:
        return ds.map_batches(cls, fn_constructor_kwargs=ctor_kwargs,
                              concurrency=pool(divisor), **kw)
    return ds.map_batches(cls(**(ctor_kwargs or {})), **kw)
