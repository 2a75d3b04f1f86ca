"""Custom ``ray.data.Datasource``: the deterministic image table
generated in shards, no disk I/O.

This is the engine's Ray-Data *extension-surface* demo — the same
connector shape a real deployment would implement against an object
store or a feature service.  Each ``ReadTask`` materializes one closed-
form slice of the canonical images table (fixtures.images_batch:
phash = splitmix64(i), w/h from the 4x4 dimension lattice, raw/png
payload alternating), so the streaming executor schedules generation
exactly like it schedules file fragments: per-task row counts are
declared up front in ``BlockMetadata``, parallelism is honored by
re-slicing, and payload bytes are produced inside the read task —
never shipped from the driver.

At 100 TB the identical structure wraps any record service: the
ReadTask closure holds only (start, count), a few bytes, regardless of
shard size.
"""

from __future__ import annotations

from typing import List, Optional

from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask


def _meta_batch(start: int, count: int):
    """Metadata columns of fixtures.images_batch WITHOUT rendering the
    payload (vectorized id formatting; the pixel/PNG work is the whole
    cost of the full rows)."""
    import numpy as np
    import pyarrow as pa

    from rhealpixdggs_py_ray.fixtures import splitmix64

    i = np.arange(start, start + count, dtype=np.uint64)
    phash = splitmix64(i).view(np.int64)
    ii = i.astype(np.int64)
    w = (16 + (ii % 4) * 16).astype(np.int32)
    h = (16 + ((ii // 4) % 4) * 16).astype(np.int32)
    fmts = np.where(ii % 2 == 0, "raw", "png")
    ids = np.char.add("img", np.char.zfill(ii.astype("U12"), 12))
    return pa.table({
        "image_id": pa.array(ids, type=pa.string()),
        "w": pa.array(w, type=pa.int32()),
        "h": pa.array(h, type=pa.int32()),
        "fmt": pa.array(fmts, type=pa.string()),
        "phash": pa.array(phash, type=pa.int64()),
    })


class ImagesDatasource(Datasource):
    """n_rows of the canonical images table, sliced into read tasks."""

    def __init__(self, n_rows: int, meta_only: bool = False):
        self._n = int(n_rows)
        self._meta_only = bool(meta_only)

    def get_name(self) -> str:
        return "ImagesGenerator"

    def estimate_inmemory_data_size(self) -> Optional[int]:
        # raw payload dominates: mean w*h*3 over the 4x4 lattice = 40*40*3
        return self._n * (40 * 40 * 3 + 96) if not self._meta_only else self._n * 64

    def get_read_tasks(self, parallelism: int) -> List[ReadTask]:
        from rhealpixdggs_py_ray.fixtures import images_batch

        parallelism = max(1, min(parallelism, self._n))
        per = -(-self._n // parallelism)  # ceil
        meta_only = self._meta_only

        def make_read_fn(start: int, count: int):
            def read_fn():
                if meta_only:
                    yield _meta_batch(start, count)
                else:
                    yield images_batch(start, count)

            return read_fn

        tasks = []
        for start in range(0, self._n, per):
            count = min(per, self._n - start)
            meta = BlockMetadata(
                num_rows=count, size_bytes=None, exec_stats=None,
                input_files=None,
            )
            tasks.append(ReadTask(make_read_fn(start, count), meta))
        return tasks
