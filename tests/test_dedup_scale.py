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


def test_attach_pair_sides_lookup_and_inner_semantics(ray_session):
    """_attach_pair_sides resolves each endpoint through one bucketed
    exchange: values land on the right side rows, endpoints missing
    from the kv table drop the whole side row (inner semantics), and a
    hot doc referenced by many pairs resolves in every bucket."""
    pairs = pa.table(
        {
            "a": pa.array([1, 1, 1, 2, 5], type=pa.int64()),
            "b": pa.array([2, 3, 4, 3, 6], type=pa.int64()),
            "ni": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
        }
    )
    kv = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 6], type=pa.int64()),  # 5 missing
            "n": pa.array([100, 200, 300, 400, 600], type=pa.int64()),
        }
    )
    att = dedup._attach_pair_sides(
        ray.data.from_arrow(pairs).repartition(3),
        ray.data.from_arrow(kv).repartition(2),
        pair_extra=["ni"],
        val_cols=[("n", pa.int64())],
        n_buckets=4,
    ).take_all()
    got = {(r["a"], r["b"], r["side"]): (r["n"], r["ni"]) for r in att}
    # doc 5 is not in kv: pair (5, 6) keeps only its side-1 row
    assert (5, 6, 0) not in got and got[(5, 6, 1)] == (600, 14)
    # hot doc 1 resolves on every pair it appears in
    assert got[(1, 2, 0)] == (100, 10)
    assert got[(1, 3, 0)] == (100, 11)
    assert got[(1, 4, 0)] == (100, 12)
    assert got[(1, 2, 1)] == (200, 10)
    assert got[(2, 3, 0)] == (200, 13)
    assert len(att) == 9  # 5 pairs x 2 sides - 1 dropped


def test_pair_sides_pivot_joins_both_sides(ray_session):
    """_pair_sides_pivot lands both side rows of a pair in one bucket
    and the finisher sees _a/_b suffixed columns."""
    import pandas as pd

    att = pa.table(
        {
            "a": pa.array([7, 7, 8, 8], type=pa.int64()),
            "b": pa.array([9, 9, 11, 11], type=pa.int64()),
            "side": pa.array([0, 1, 0, 1], type=pa.int64()),
            "n": pa.array([70, 90, 80, 110], type=pa.int64()),
        }
    )

    def fin(m: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy(),
                "b": m["b"].to_numpy(),
                "tot": (m["n_a"] + m["n_b"]).to_numpy(),
            }
        )

    out = dedup._pair_sides_pivot(
        ray.data.from_arrow(att).repartition(2), fin, ["n"], n_buckets=2
    ).take_all()
    got = {(r["a"], r["b"]): r["tot"] for r in out}
    assert got == {(7, 9): 160, (8, 11): 190}


def test_attach_pair_sides_fused_presum_and_kv_sum(ray_session):
    """The fused attach sums duplicate pair partials per (a, b, side)
    and partial kv rows per doc inside ONE exchange, with the same
    inner-join drop semantics as the plain attach."""
    pairs = pa.table(
        {
            "a": pa.array([1, 1, 1, 2, 5], type=pa.int64()),
            "b": pa.array([2, 2, 3, 3, 6], type=pa.int64()),
            "ni_partial": pa.array([10, 5, 11, 13, 14], type=pa.int64()),
        }
    )
    kv = pa.table(
        {
            "doc_id": pa.array([1, 2, 2, 3, 6], type=pa.int64()),  # 5 missing
            "n": pa.array([100, 150, 50, 300, 600], type=pa.int64()),
        }
    )
    att = dedup._attach_pair_sides_fused(
        ray.data.from_arrow(pairs).repartition(3),
        ray.data.from_arrow(kv).repartition(2),
        pair_sums=[("ni", "ni_partial")],
        val_cols=[("n", pa.int64())],
        kv_mode="sum",
        n_buckets=4,
    ).take_all()
    got = {(r["a"], r["b"], r["side"]): (r["n"], r["ni"]) for r in att}
    # duplicate (1, 2) partials summed on both sides; kv partials for
    # doc 2 summed to 200
    assert got[(1, 2, 0)] == (100, 15)
    assert got[(1, 2, 1)] == (200, 15)
    assert got[(1, 3, 0)] == (100, 11)
    assert got[(2, 3, 0)] == (200, 13)
    # doc 5 missing from kv drops only pair (5, 6)'s side-0 row
    assert (5, 6, 0) not in got and got[(5, 6, 1)] == (600, 14)
    assert len(att) == 7  # 4 distinct pairs x 2 sides - 1 dropped


def test_attach_pair_sides_fused_pack_mode(ray_session):
    """Pack mode dedupes pairs and builds values only for docs some
    endpoint references, from raw kv rows, inside the exchange."""
    import pandas as pd

    pairs = pa.table(
        {
            "a": pa.array([1, 1, 2], type=pa.int64()),
            "b": pa.array([2, 2, 3], type=pa.int64()),
        }
    )
    kv = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["aa bb", "cc", "dd ee ff", "unused"]),
        }
    )

    def kv_pack(sub: pd.DataFrame) -> dict:
        toks = [t.split() for t in sub["text"].tolist()]
        return {
            "packed": [" ".join(reversed(t)) for t in toks],
            "n": np.array([len(t) for t in toks], dtype=np.int64),
        }

    att = dedup._attach_pair_sides_fused(
        ray.data.from_arrow(pairs).repartition(2),
        ray.data.from_arrow(kv),
        pair_sums=[],
        val_cols=[("packed", pa.string()), ("n", pa.int64())],
        kv_mode="pack",
        kv_pack=kv_pack,
        kv_in_cols=[("text", pa.string())],
        n_buckets=4,
    ).take_all()
    got = {(r["a"], r["b"], r["side"]): (r["packed"], r["n"]) for r in att}
    assert got[(1, 2, 0)] == ("bb aa", 2)
    assert got[(1, 2, 1)] == ("cc", 1)
    assert got[(2, 3, 1)] == ("ff ee dd", 3)
    assert len(att) == 4  # pairs deduped: 2 distinct pairs x 2 sides
