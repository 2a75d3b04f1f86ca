"""Scale/skew behavior of the distributed dedup verification paths
(round-2: no O(corpus) driver materialization anywhere in ops/)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from rhealpixdggs_py_ray.ops import dedup

SF01 = "/root/testdata/sf0.1"


def test_minhash_verify_join_at_sf01(ray_session):
    """The semi-join + pair-join verification handles the 48k-doc corpus
    and every emitted pair is exactly verified above threshold."""
    docs = ray.data.read_parquet(
        f"{SF01}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    rows = dedup.minhash_lsh_pairs(docs, jaccard_min=0.5).take_all()
    assert len(rows) > 0
    for r in rows:
        assert r["a"] < r["b"]
        assert r["jac_micros"] >= 500_000


def test_minhash_skewed_hot_bucket(ray_session):
    """Heavy duplication (60 identical docs) makes one LSH bucket hot;
    the bucketed pair expansion + joins must still produce exactly
    C(60,2) verified pairs among the clones."""
    n_dup, n_uniq = 60, 500
    texts = ["the quick brown fox jumps over the lazy dog again and again"] * n_dup
    rng = np.random.RandomState(7)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"])
    for i in range(n_uniq):
        texts.append(" ".join(rng.choice(words, size=12).tolist()) + f" tail{i}")
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
         "text": pa.array(texts, type=pa.string())}
    )
    ds = ray.data.from_arrow(t).repartition(8)
    rows = dedup.minhash_lsh_pairs(ds, jaccard_min=0.9).take_all()
    clone_pairs = {(r["a"], r["b"]) for r in rows if r["a"] < n_dup and r["b"] < n_dup}
    assert len(clone_pairs) == n_dup * (n_dup - 1) // 2
    for r in rows:
        if r["a"] < n_dup and r["b"] < n_dup:
            assert r["jac_micros"] == 1_000_000


def test_embedding_dedup_chunked_multitask(ray_session):
    """Exact chunk-pair cross product with a forced small chunk size:
    many chunk-pair tasks, same result as the single-chunk path."""
    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    a = {
        (r["a"], r["b"], r["cos_micros"])
        for r in dedup.embedding_dedup_pairs(emb, chunk_rows=100).take_all()
    }
    b = {
        (r["a"], r["b"], r["cos_micros"])
        for r in dedup.embedding_dedup_pairs(emb, chunk_rows=10_000).take_all()
    }
    assert a == b
    assert a
