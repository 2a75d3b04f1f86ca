"""Deduplication operators over the documents / embeddings tables.

Five dedup families, each a streaming Ray Data pipeline with a
value-hash-parity DuckDB oracle (see pipelines/queries.py wiring):

- exact:          md5(text) hash-partition + per-group min
- minhash + LSH:  word-shingle -> 8 minhashes -> 4 bands -> bucket
                  groupby -> candidate pairs -> exact-jaccard verify
- simhash:        64-bit token-hash sign aggregate per doc
- n-gram jaccard: inverted-index pair generation + exact jaccard
- embedding:      cosine near-dup pairs via blocked matmul against a
                  broadcast matrix

Hash parity trick: the base hash is ``md5`` (bit-identical between
hashlib and DuckDB; DuckDB's ``md5_number_lower`` = little-endian
uint64 of digest bytes [8:16]), and the minhash permutation family is
``(a_s * h + b_s) mod 2**64`` with 32-bit odd ``a_s`` — numpy uint64
wraparound on one side, HUGEINT modular arithmetic on the other, both
exact.

At 10^12-row scale the pair-verification size join becomes a hash
join on doc_id instead of the broadcast used here; the shingle
explode -> band groupby shuffle structure is unchanged (band keys are
uniform by construction, no salting needed).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min, Sum

# MinHash parameters (shared with the SQL oracle).
N_PERM = 8
N_BANDS = 4  # 2 rows per band
SHINGLE_W = 4  # word n-gram width
MOD64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_constants() -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_s odd 32-bit, b_s 64-bit) for s in [0, N_PERM)."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    s = np.arange(N_PERM, dtype=np.uint64)
    a = (splitmix64(s) | np.uint64(1)) & np.uint64(0xFFFFFFFF)
    b = splitmix64(s + np.uint64(1000))
    return a, b


PERM_A, PERM_B = None, None


def perm_constants():
    global PERM_A, PERM_B
    if PERM_A is None:
        PERM_A, PERM_B = _perm_constants()
    return PERM_A, PERM_B


def md5_u64(s: str) -> int:
    """Python mirror of DuckDB md5_number_lower."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:])[0]


def shingles(text: str, w: int = SHINGLE_W) -> list[str]:
    toks = text.split()
    return sorted({" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)})


# ---------------------------------------------------------------------------
# MinHash signatures + LSH band keys
# ---------------------------------------------------------------------------

class MinHasher:
    """Actor stage: doc -> N_PERM minhashes + N_BANDS band-key rows.

    Emits one row per (doc, band): (doc_id, band, k1, k2) where k1/k2
    are the two minhashes of the band (the LSH bucket key).
    """

    def __init__(self):
        self.a, self.b = perm_constants()

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_doc, out_band, out_k1, out_k2 = [], [], [], []
        for d, t in zip(doc_ids, texts):
            sh = shingles(t)
            if not sh:
                continue
            h = np.array([md5_u64(x) for x in sh], dtype=np.uint64)
            # perm_s(h) = a_s * h + b_s  (mod 2^64, numpy wraparound)
            mh = (self.a[:, None] * h[None, :] + self.b[:, None]).min(axis=1)
            for band in range(N_BANDS):
                out_doc.append(d)
                out_band.append(band)
                out_k1.append(mh[2 * band])
                out_k2.append(mh[2 * band + 1])
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int64()),
                "k1": pa.array(np.array(out_k1, dtype=np.uint64)),
                "k2": pa.array(np.array(out_k2, dtype=np.uint64)),
            }
        )


N_PAIR_BUCKETS = 64


def _pairs_within_keys(g: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """Vectorized pair expansion: for every distinct key (the group-by
    unit), emit all (a < b) doc pairs.  Called once per hash BUCKET of
    keys (not once per key): a map_groups over one group per key costs
    more in per-group overhead than the pair math itself at 10^5+
    keys."""
    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "ni_partial": pd.Series([], dtype=np.int64),
        }
    )
    if not len(g):
        return empty
    codes, _ = pd.factorize(
        g[key_cols[0]].astype(str) if len(key_cols) == 1
        else g[key_cols].astype(str).agg("|".join, axis=1)
    )
    ids = g["doc_id"].to_numpy()
    order = np.lexsort((ids, codes))
    codes, ids = codes[order], ids[order]
    counts = np.bincount(codes)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out_a, out_b = [], []
    for k in np.flatnonzero(counts >= 2):
        grp = ids[starts[k] : starts[k] + counts[k]]
        i, j = np.triu_indices(len(grp), 1)
        out_a.append(grp[i])
        out_b.append(grp[j])
    if not out_a:
        return empty
    # Pre-aggregate within the bucket (combiner): multiplicity is
    # semantic — the ngram path counts one unit per shared shingle (the
    # intersection size), the minhash path one per matching band — but
    # the downstream shuffle only needs the per-bucket partial sums,
    # not tens of millions of raw pair rows.
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
    uq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv)
    return pd.DataFrame(
        {
            "a": (uq >> np.uint64(32)).astype(np.int64),
            "b": (uq & np.uint64(0xFFFFFFFF)).astype(np.int64),
            "ni_partial": cnt.astype(np.int64),
        }
    )


def _sum_by_pair(pairs_ds, alias: str, n_buckets: int = 32):
    """Exact per-(a, b) sum of ``ni_partial`` without a many-group sort
    aggregate: hash-partition pairs into a few buckets, combine each
    bucket vectorized.  (ray.data's sort-based Aggregate measured 18s
    on 48k rows with ~40k groups; this path is <1s and identical.)"""

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (((a * np.uint64(2654435761)) ^ b) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return batch.append_column("pair_bucket", pa.array(bucket))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy().astype(np.uint64)
        b = g["b"].to_numpy().astype(np.uint64)
        v = g["ni_partial"].to_numpy()
        key = (a << np.uint64(32)) | b
        uq, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, v)
        return pd.DataFrame(
            {
                "a": (uq >> np.uint64(32)).astype(np.int64),
                "b": (uq & np.uint64(0xFFFFFFFF)).astype(np.int64),
                alias: s,
            }
        )

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair_bucket")
        .map_groups(combine, batch_format="pandas")
    )


def minhash_lsh_pairs(docs_ds, jaccard_min: float = 0.5):
    """documents Dataset -> verified near-dup pairs
    (a, b, jac_micros int64).  Structure: minhash map -> band-bucket
    groupby -> in-bucket pair expansion -> distinct -> exact-jaccard
    verification join."""
    sig = docs_ds.map_batches(
        MinHasher, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        k1 = batch["k1"].to_numpy(zero_copy_only=False)
        k2 = batch["k2"].to_numpy(zero_copy_only=False)
        b = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((k1 ^ (k2 >> np.uint64(1)) ^ b) % np.uint64(N_PAIR_BUCKETS)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    cand = (
        sig.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_within_keys(g, ["band", "k1", "k2"]),
            batch_format="pandas",
        )
    )
    cand = _sum_by_pair(cand, "n_bands")
    # Verification: exact jaccard on the pair's shingle sets.  The doc
    # texts are re-read once and broadcast (small side); at larger scale
    # this becomes a hash join of (pair, side) against the shingle table.
    texts = {
        r["doc_id"]: r["text"] for r in docs_ds.select_columns(["doc_id", "text"]).take_all()
    }
    texts_ref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            jac = np.empty(len(a), dtype=np.float64)
            for i in range(len(a)):
                A = set(shingles(self.texts[int(a[i])]))
                B = set(shingles(self.texts[int(b[i])]))
                inter = len(A & B)
                jac[i] = inter / (len(A) + len(B) - inter)
            keep = jac >= jaccard_min
            t = pa.table(
                {
                    "a": pa.array(a, type=pa.int64()),
                    "b": pa.array(b, type=pa.int64()),
                    "jac_micros": pa.array(
                        np.floor(jac * 1000000.0).astype(np.int64)
                    ),
                }
            )
            return t.filter(pa.array(keep))

    return cand.map_batches(
        Verify, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    ).select_columns(["a", "b", "jac_micros"])


def minhash_lsh_sql(jaccard_min: float = 0.5) -> str:
    """DuckDB oracle: identical minhash family + bands + verification."""
    a, b = perm_constants()
    perm_rows = ", ".join(f"({s}, {int(a[s])}, {int(b[s])})" for s in range(N_PERM))
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id,
    array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
),
hs AS MATERIALIZED (
  SELECT doc_id, md5_number_lower(s) AS h FROM sh
),
perms(s, pa, pb) AS (VALUES {perm_rows}),
mh AS MATERIALIZED (
  SELECT doc_id, s,
    MIN(CAST((CAST(pa AS HUGEINT) * CAST(h AS HUGEINT) + CAST(pb AS HUGEINT))
        % 18446744073709551616 AS UBIGINT)) AS m
  FROM hs CROSS JOIN perms GROUP BY doc_id, s
),
bands AS MATERIALIZED (
  SELECT e.doc_id, b.band,
    MAX(CASE WHEN e.s = 2*b.band THEN e.m END) AS k1,
    MAX(CASE WHEN e.s = 2*b.band + 1 THEN e.m END) AS k2
  FROM mh e CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
  WHERE e.s // 2 = b.band
  GROUP BY e.doc_id, b.band
),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.k1 = y.k1 AND x.k2 = y.k2 AND x.doc_id < y.doc_id
),
sizes AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
),
inter AS MATERIALIZED (
  SELECT c.a, c.b, COUNT(*) AS ni
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b AND sb.s = sa.s
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
  CAST(floor(CAST(ni AS DOUBLE) / (za.n + zb.n - ni) * 1000000.0) AS BIGINT)
    AS jac_micros
FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
WHERE CAST(ni AS DOUBLE) / (za.n + zb.n - ni) >= {jaccard_min!r}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash per doc from whitespace tokens (md5 bit votes)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        bits = np.arange(64, dtype=np.uint64)
        hi = np.empty(len(texts), dtype=np.int64)
        lo = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            h = np.array([md5_u64(x) for x in uniq], dtype=np.uint64)
            bm = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
            v = (counts[:, None] * (2 * bm - 1)).sum(axis=0)
            sig = np.uint64(0)
            for j in range(64):
                if v[j] > 0:
                    sig |= np.uint64(1) << np.uint64(j)
            hi[i] = int(sig >> np.uint64(32))
            lo[i] = int(sig & np.uint64(0xFFFFFFFF))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "sim_hi": pa.array(hi),
                "sim_lo": pa.array(lo),
            }
        )


def simhash_sql() -> str:
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id, t AS token, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM documents)
  GROUP BY doc_id, t
),
th AS MATERIALIZED (
  SELECT doc_id, c, md5_number_lower(token) AS h FROM tok
),
votes AS MATERIALIZED (
  SELECT doc_id, j,
    SUM(c * (2 * CAST((h >> j) & 1 AS BIGINT) - 1)) AS v
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j)
  GROUP BY doc_id, j
)
SELECT doc_id,
  CAST(SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS UBIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS sim_hi,
  CAST(SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS UBIGINT) << j) ELSE 0 END) AS BIGINT) AS sim_lo
FROM votes GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# N-gram jaccard pairs (no hashing — exact inverted-index join)
# ---------------------------------------------------------------------------

class ShingleExploder:
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        od, os_ = [], []
        for d, t in zip(doc_ids, texts):
            for s in shingles(t):
                od.append(d)
                os_.append(s)
        return pa.table(
            {"doc_id": pa.array(od, type=pa.int64()), "s": pa.array(os_, type=pa.string())}
        )


def ngram_jaccard_pairs(docs_ds, jaccard_min: float = 0.2):
    """Exact jaccard near-dup pairs via shingle inverted index:
    explode -> groupby(shingle) pair expansion -> per-pair shared-count
    -> size join -> threshold.  (a, b, jac_micros)."""
    sh = docs_ds.map_batches(
        ShingleExploder, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = np.array(
            [md5_u64(s) % N_PAIR_BUCKETS for s in batch["s"].to_pylist()],
            dtype=np.int64,
        )
        return batch.append_column("bucket", pa.array(bucket))

    inter = (
        sh.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_within_keys(g, ["s"]), batch_format="pandas"
        )
    )
    inter = _sum_by_pair(inter, "ni")
    sizes = {
        r["doc_id"]: r["n"]
        for r in sh.groupby("doc_id").aggregate(Count(alias_name="n")).take_all()
    }
    sizes_ref = ray.put(sizes)

    class Jac:
        def __init__(self):
            self.sizes = ray.get(sizes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            ni = batch["ni"].to_numpy(zero_copy_only=False).astype(np.float64)
            za = np.array([self.sizes[int(x)] for x in a], dtype=np.int64)
            zb = np.array([self.sizes[int(x)] for x in b], dtype=np.int64)
            jac = ni / (za + zb - ni.astype(np.int64)).astype(np.float64)
            keep = jac >= jaccard_min
            t = pa.table(
                {
                    "a": pa.array(a, type=pa.int64()),
                    "b": pa.array(b, type=pa.int64()),
                    "jac_micros": pa.array(np.floor(jac * 1000000.0).astype(np.int64)),
                }
            )
            return t.filter(pa.array(keep))

    return inter.map_batches(
        Jac, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    ).select_columns(["a", "b", "jac_micros"])


def ngram_jaccard_sql(jaccard_min: float = 0.2) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {SHINGLE_W - 1}], ' ') AS s
  FROM toks, unnest(generate_series(1, len(w) - {SHINGLE_W - 1})) AS t(i)
),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (
  SELECT sa.doc_id AS a, sb.doc_id AS b, COUNT(*) AS ni
  FROM sh sa JOIN sh sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b,
  CAST(floor(CAST(ni AS DOUBLE) / (za.n + zb.n - ni) * 1000000.0) AS BIGINT)
    AS jac_micros
FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
WHERE CAST(ni AS DOUBLE) / (za.n + zb.n - ni) >= {jaccard_min!r}
"""


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dedup_pairs(emb_ds, tau: float = 0.4):
    """Cosine near-dup pairs (a < b, cos >= tau) via blocked matmul:
    the full normalized matrix is broadcast once (ray.put) and every
    batch computes its slice of the similarity matrix.  At 10^12 scale
    the broadcast side becomes an IVF/LSH bucket table; the per-batch
    matmul structure is unchanged.  Output (a, b, cos_micros)."""
    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, Mn))

    class Block:
        def __init__(self):
            self.ids, self.Mn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bid = batch["vec_id"].to_numpy(zero_copy_only=False)
            B = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            S = Bn @ self.Mn.T
            ai, bj = np.nonzero((S >= tau) & (bid[:, None] < self.ids[None, :]))
            cos = S[ai, bj]
            return pa.table(
                {
                    "a": pa.array(bid[ai], type=pa.int64()),
                    "b": pa.array(self.ids[bj], type=pa.int64()),
                    "cos_micros": pa.array(np.floor(cos * 1000000.0).astype(np.int64)),
                }
            )

    return emb_ds.map_batches(
        Block, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )


def embedding_dedup_sql(tau: float = 0.4) -> str:
    return f"""
WITH n AS MATERIALIZED (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b,
  CAST(floor(list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm)
      * 1000000.0) AS BIGINT) AS cos_micros
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm)
      >= {tau!r}
"""
