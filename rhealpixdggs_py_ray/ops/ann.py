"""Approximate-nearest-neighbor search over the embeddings table.

- ``ann_topk``: exact brute-force cosine top-k — the correctness
  baseline.  Query matrix broadcast once (ray.put); each batch does a
  vectorized similarity block and keeps its per-batch top-k, so only
  ~k rows per (query, batch) reach the final per-query reduction.
- ``ann_topk_lsh``: the scale path — random-hyperplane (SimHash-style)
  bucketing; only rows whose bucket is within ``probes`` Hamming-ball
  distance of the query's bucket are scored.  At 10^12 rows the bucket
  column is precomputed and hash-partitioned so a query touches a
  vanishing fraction of blocks.

Float parity with the DuckDB oracle: dot products and norms are
accumulated dimension-by-dimension in the same left-to-right order as
``list_sum(list_transform(...))`` folds, so similarities are
bit-identical; outputs quantize to ``cos_micros = floor(cos * 1e6)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _seq_norm(M: np.ndarray) -> np.ndarray:
    """Left-to-right sum of squares per row (matches list_sum fold)."""
    acc = np.zeros(M.shape[0], dtype=np.float64)
    for i in range(M.shape[1]):
        acc = acc + M[:, i] * M[:, i]
    return np.sqrt(acc)


def _seq_dots(B: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """(n, d) x (q, d) -> (n, q) dot products, accumulated left-to-right
    per dimension so float rounding matches the SQL fold exactly."""
    acc = np.zeros((B.shape[0], Q.shape[0]), dtype=np.float64)
    for i in range(B.shape[1]):
        acc = acc + B[:, i, None] * Q[None, :, i]
    return acc


def ann_topk(emb_ds, n_queries: int = 10, k: int = 5):
    """(qid, vec_id, rank, cos_micros) for the first ``n_queries``
    vec_ids as queries, self-matches excluded."""
    qrows = sorted(
        (r for r in emb_ds.take(limit=10_000) if r["vec_id"] < n_queries),
        key=lambda r: r["vec_id"],
    )
    Q = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qn = _seq_norm(Q)
    ref = ray.put((qids, Q, qn))

    class PartialTopK:
        def __init__(self):
            self.qids, self.Q, self.qn = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False)
            B = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
            bn = _seq_norm(B)
            S = _seq_dots(B, self.Q) / (bn[:, None] * self.qn[None, :])
            S[vid[:, None] == self.qids[None, :]] = -np.inf  # self-match
            kk = min(self.k, S.shape[0])
            part = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, q): row idx per query
            qi, vi, cv = [], [], []
            for j in range(S.shape[1]):
                for i in range(kk):
                    r = part[i, j]
                    qi.append(self.qids[j])
                    vi.append(vid[r])
                    cv.append(S[r, j])
            return pa.table(
                {
                    "qid": pa.array(np.array(qi, dtype=np.int64)),
                    "vec_id": pa.array(np.array(vi, dtype=np.int64)),
                    "cos": pa.array(np.array(cv, dtype=np.float64)),
                }
            )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "qid": g["qid"],
                "vec_id": g["vec_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cos_micros": np.floor(g["cos"].to_numpy() * 1000000.0).astype(np.int64),
            }
        )

    partials = emb_ds.map_batches(
        PartialTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    return partials.groupby("qid").map_groups(final, batch_format="pandas")


def ann_topk_sql(n_queries: int = 10, k: int = 5) -> str:
    dot = (
        "list_sum(list_transform(generate_series(1, len(a.embedding)),"
        " i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i]))"
    )
    nrm = "sqrt(list_sum(list_transform({t}.embedding, x -> CAST(x AS DOUBLE) * x)))"
    return f"""
WITH b AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
a AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}),
d AS MATERIALIZED (
  SELECT a.vec_id AS qid, b.vec_id AS vec_id,
    {dot} / ({nrm.format(t='a')} * {nrm.format(t='b')}) AS cos
  FROM a CROSS JOIN b WHERE a.vec_id <> b.vec_id
)
SELECT qid, vec_id,
  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank,
  CAST(floor(cos * 1000000.0) AS BIGINT) AS cos_micros
FROM d QUALIFY rank <= {k}
"""


def ann_topk_lsh(emb_ds, n_queries: int = 10, k: int = 5, n_planes: int = 8):
    """LSH-bucketed ANN: random-hyperplane signs -> bucket id; score
    only rows in the query's bucket or adjacent (1-bit flip) buckets.
    Approximate by design; returns the same schema as ann_topk plus
    recall is validated in tests against the brute baseline."""
    rows = sorted(
        (r for r in emb_ds.take(limit=10_000) if r["vec_id"] < n_queries),
        key=lambda r: r["vec_id"],
    )
    Q = np.array([r["embedding"] for r in rows], dtype=np.float64)
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    dim = Q.shape[1]
    rng = np.random.RandomState(1234)
    planes = rng.standard_normal((n_planes, dim))
    qsig = (Q @ planes.T > 0).astype(np.uint32)
    qbuck = (qsig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    # query bucket + all 1-bit-flip probes
    probe_sets = []
    for qb in qbuck:
        probes = {int(qb)} | {int(qb) ^ (1 << p) for p in range(n_planes)}
        probe_sets.append(probes)
    allowed = set().union(*probe_sets)
    qn = _seq_norm(Q)
    ref = ray.put((qids, Q, qn, planes, probe_sets, allowed))

    class BucketTopK:
        def __init__(self):
            (self.qids, self.Q, self.qn, self.planes,
             self.probe_sets, self.allowed) = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False)
            B = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
            sig = (B @ self.planes.T > 0).astype(np.uint32)
            buck = (sig << np.arange(self.planes.shape[0], dtype=np.uint32)).sum(axis=1)
            keep = np.array([int(x) in self.allowed for x in buck])
            if not keep.any():
                return pa.table(
                    {"qid": pa.array([], type=pa.int64()),
                     "vec_id": pa.array([], type=pa.int64()),
                     "cos": pa.array([], type=pa.float64())}
                )
            B, vid, buck = B[keep], vid[keep], buck[keep]
            bn = _seq_norm(B)
            S = _seq_dots(B, self.Q) / (bn[:, None] * self.qn[None, :])
            S[vid[:, None] == self.qids[None, :]] = -np.inf
            qi, vi, cv = [], [], []
            for j in range(S.shape[1]):
                mask = np.array([int(x) in self.probe_sets[j] for x in buck])
                if not mask.any():
                    continue
                rows_j = np.flatnonzero(mask)
                kk = min(self.k, len(rows_j))
                top = rows_j[np.argpartition(-S[rows_j, j], kk - 1)[:kk]]
                for r in top:
                    qi.append(self.qids[j])
                    vi.append(vid[r])
                    cv.append(S[r, j])
            return pa.table(
                {
                    "qid": pa.array(np.array(qi, dtype=np.int64)),
                    "vec_id": pa.array(np.array(vi, dtype=np.int64)),
                    "cos": pa.array(np.array(cv, dtype=np.float64)),
                }
            )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "qid": g["qid"],
                "vec_id": g["vec_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cos_micros": np.floor(g["cos"].to_numpy() * 1000000.0).astype(np.int64),
            }
        )

    partials = emb_ds.map_batches(
        BucketTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    return partials.groupby("qid").map_groups(final, batch_format="pandas")


def _kmeans_centroids(M: np.ndarray, k: int = 16, iters: int = 10, seed: int = 7):
    """Deterministic mini k-means on (a sample of) the corpus — the IVF
    coarse quantizer.  At 10^12 rows this runs on a driver-side sample;
    assignment happens distributed."""
    rng = np.random.RandomState(seed)
    C = M[rng.choice(len(M), size=min(k, len(M)), replace=False)].copy()
    for _ in range(iters):
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(C)):
            sel = assign == j
            if sel.any():
                C[j] = M[sel].mean(axis=0)
    return C


def ann_topk_ivf(emb_ds, n_queries: int = 10, k: int = 5, n_lists: int = 16,
                 nprobe: int = 4):
    """IVF ANN: k-means coarse quantizer (driver-side sample), then each
    batch scores only vectors whose inverted list is among the query's
    ``nprobe`` closest lists.  Same output schema as ann_topk."""
    rows = emb_ds.take_all()
    ids_all = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M_all = np.array([r["embedding"] for r in rows], dtype=np.float64)
    C = _kmeans_centroids(M_all, k=n_lists)

    qsel = ids_all < n_queries
    order = np.argsort(ids_all[qsel])
    Q = M_all[qsel][order]
    qids = ids_all[qsel][order]
    qn = _seq_norm(Q)
    qd2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probe_lists = np.argsort(qd2, axis=1)[:, :nprobe]  # (q, nprobe)
    ref = ray.put((qids, Q, qn, C, probe_lists))

    class IvfTopK:
        def __init__(self):
            self.qids, self.Q, self.qn, self.C, self.probes = ray.get(ref)
            self.k = k
            self.allowed = set(self.probes.ravel().tolist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False)
            B = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
            d2 = ((B[:, None, :] - self.C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            keep = np.isin(assign, list(self.allowed))
            if not keep.any():
                return pa.table(
                    {"qid": pa.array([], type=pa.int64()),
                     "vec_id": pa.array([], type=pa.int64()),
                     "cos": pa.array([], type=pa.float64())}
                )
            B, vid, assign = B[keep], vid[keep], assign[keep]
            bn = _seq_norm(B)
            S = _seq_dots(B, self.Q) / (bn[:, None] * self.qn[None, :])
            S[vid[:, None] == self.qids[None, :]] = -np.inf
            qi, vi, cv = [], [], []
            for j in range(S.shape[1]):
                mask = np.isin(assign, self.probes[j])
                rows_j = np.flatnonzero(mask)
                if not len(rows_j):
                    continue
                kk = min(self.k, len(rows_j))
                top = rows_j[np.argpartition(-S[rows_j, j], kk - 1)[:kk]]
                for r in top:
                    qi.append(self.qids[j])
                    vi.append(vid[r])
                    cv.append(S[r, j])
            return pa.table(
                {
                    "qid": pa.array(np.array(qi, dtype=np.int64)),
                    "vec_id": pa.array(np.array(vi, dtype=np.int64)),
                    "cos": pa.array(np.array(cv, dtype=np.float64)),
                }
            )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "qid": g["qid"],
                "vec_id": g["vec_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "cos_micros": np.floor(g["cos"].to_numpy() * 1000000.0).astype(np.int64),
            }
        )

    partials = emb_ds.map_batches(
        IvfTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    return partials.groupby("qid").map_groups(final, batch_format="pandas")
