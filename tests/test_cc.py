"""Connected components over dup pairs (ops/cc.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from rhealpixdggs_py_ray.ops import cc


def test_union_find_label_path_and_clique():
    # path 1-2-3-4 (worst case for hash-min), clique {10,11,12}, isolated 99
    u = np.array([2, 3, 4, 10, 10, 11, 99], dtype=np.int64)
    v = np.array([1, 2, 3, 11, 12, 12, 99], dtype=np.int64)
    nodes, lab = cc._union_find_label(u, v)
    got = dict(zip(nodes.tolist(), lab.tolist()))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def _pairs_ds():
    # two components: {1,2,3,4} via a path, {7,9} — split across blocks
    t = pa.table({
        "a": pa.array([1, 2, 3, 7], type=pa.int64()),
        "b": pa.array([2, 3, 4, 9], type=pa.int64()),
    })
    return ray.data.from_arrow(t).repartition(3)


EXPECT = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 7, 9],
    "cluster_id": [1, 1, 1, 1, 7, 7],
    "keep": [True, False, False, False, True, False],
})


def _canon(df):
    return df.sort_values("doc_id").reset_index(drop=True)[EXPECT.columns]


def test_connected_components_fast_path(ray_session):
    out = cc.connected_components(_pairs_ds()).to_pandas()
    pd.testing.assert_frame_equal(_canon(out), EXPECT)


def test_connected_components_iterative_path(ray_session):
    # driver_cap=0 forces the fully distributed exchange + hash-min path
    out = cc.connected_components(_pairs_ds(), driver_cap=0).to_pandas()
    pd.testing.assert_frame_equal(_canon(out), EXPECT)


def test_connected_components_empty(ray_session):
    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
    }))
    out = cc.connected_components(empty).to_pandas()
    assert len(out) == 0
    # ray's to_pandas drops the schema of all-empty datasets; when
    # columns do surface they must be the contract ones
    assert list(out.columns) in ([], ["doc_id", "cluster_id", "keep"])
