"""Properties of the round-2b operators (sliding windows, HLL sketch,
chunking, winsorize, distinct counts) beyond the exact-value gate."""

import hashlib
import struct

import numpy as np
import pandas as pd

from rhealpixdggs_py_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def test_sliding_windows_conservation(ray_session):
    # every event lands in exactly 4 sliding windows, so window totals
    # must be exactly 4x the tumbling-quarter totals
    slid = Q.q_sliding_counts(SF).to_pandas()
    ev = Q._read(SF, "events", columns=["ts"]).count()
    assert slid["n"].sum() == 4 * ev


def test_hll_registers_match_reference_hll(ray_session):
    # recompute the registers serially from the raw table
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    regs: dict = {}
    for et, uid in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        h = struct.unpack("<Q", hashlib.md5(str(uid).encode()).digest()[8:])[0]
        reg = h >> 56
        suf = h & ((1 << 56) - 1)
        rho = 57 - suf.bit_length()
        key = (et, reg)
        regs[key] = max(regs.get(key, 0), rho)
    got = Q.q_hll_registers(SF).to_pandas()
    got_map = {
        (r.event_type, int(r.reg)): int(r.rho) for r in got.itertuples()
    }
    assert got_map == regs


def test_hll_bitlength_vectorization():
    # the 56-compare loop must equal int.bit_length on edge values
    suf = np.array(
        [0, 1, 2, 3, (1 << 53) - 1, 1 << 53, (1 << 56) - 1], dtype=np.uint64
    )
    bl = np.zeros(len(suf), dtype=np.int64)
    for k in range(56):
        bl += (suf >= np.uint64(1 << k)).astype(np.int64)
    assert bl.tolist() == [int(x).bit_length() for x in suf.tolist()]


def test_chunking_covers_every_token(ray_session):
    chunks = Q.q_chunk_docs(SF).to_pandas()
    toks = Q.q_token_stats(SF).to_pandas()
    total_tokens = int(toks["total_tokens"].sum())
    per_doc = chunks.sort_values(["doc_id", "chunk_k"]).groupby("doc_id")
    doc_total = 0
    for _, g in per_doc:
        k = g["chunk_k"].to_numpy()
        n = g["n_tokens"].to_numpy()
        assert list(k) == list(range(len(k)))  # contiguous windows
        n_doc = Q.CHUNK_S * int(k[-1]) + int(n[-1])  # last chunk ends at doc end
        # exact window rule for every chunk
        assert all(
            int(x) == min(Q.CHUNK_W, n_doc - Q.CHUNK_S * int(kk))
            for kk, x in zip(k, n)
        )
        doc_total += n_doc
    assert doc_total == total_tokens


def test_winsorize_clip_bounds(ray_session):
    w = Q.q_winsorize(SF).to_pandas()
    # at most 5% clipped on each side (exact-rank ceil rule)
    assert (w["n_clip_lo"] <= np.ceil(0.05 * w["n"])).all()
    assert (w["n_clip_hi"] <= np.ceil(0.05 * w["n"]) + 1).all()


def test_distinct_users_vs_pandas(ray_session):
    got = Q.q_distinct_users(SF).to_pandas().set_index("event_type")
    import pyarrow.parquet as pq

    df = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "user_id"]
    ).to_pandas()
    exp = df.groupby("event_type")["user_id"].agg(["nunique", "size"])
    for et, row in exp.iterrows():
        assert got.loc[et, "n_users"] == row["nunique"]
        assert got.loc[et, "n_events"] == row["size"]


def _write_skew_dir(tmp_path):
    """events table where one user and one event_type dominate (hot
    key); documents/embeddings with a single label."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 20_000
    uid = np.where(np.arange(n) % 100 == 0, np.arange(n), 7).astype(np.int64)
    et = np.where(np.arange(n) % 1000 == 0, "rare", "hot")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            np.datetime64("2024-01-01", "us")
            + np.arange(n).astype("timedelta64[us]") * 1_000_000
        ),
        "user_id": pa.array(uid),
        "event_type": pa.array(et.astype(object), type=pa.string()),
        "value": pa.array(np.linspace(0.0, 10.0, n)),
        "props": pa.array(['{"k": 1}'] * n, type=pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return uid, et


def test_distinct_users_skewed_hot_key(ray_session, tmp_path):
    uid, et = _write_skew_dir(tmp_path)
    got = Q.q_distinct_users(str(tmp_path)).to_pandas().set_index("event_type")
    df = pd.DataFrame({"et": et, "uid": uid})
    exp = df.groupby("et")["uid"].agg(["nunique", "size"])
    for e, row in exp.iterrows():
        assert got.loc[e, "n_users"] == row["nunique"]
        assert got.loc[e, "n_events"] == row["size"]


def test_hll_and_sliding_on_skewed_input(ray_session, tmp_path):
    uid, et = _write_skew_dir(tmp_path)
    hll = Q.q_hll_registers(str(tmp_path)).to_pandas()
    # registers bounded and present for both types
    assert set(hll["event_type"]) == {"hot", "rare"}
    assert (hll["rho"] >= 1).all() and (hll["rho"] <= 57).all()
    slid = Q.q_sliding_counts(str(tmp_path)).to_pandas()
    assert slid["n"].sum() == 4 * len(uid)
