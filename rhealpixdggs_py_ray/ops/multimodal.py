"""Multimodal (image/audio/video) actor-pool stages.

The payload discipline at 100 TB: ``bytes`` stays an opaque binary
column with typed metadata (w, h, fmt); decode and per-pixel work run
in actor pools over SMALL batches (wide rows), and pixel arrays never
enter a shuffle — only derived features do.

Codec reality in this sandbox (SURVEY.md §7.0): no PIL/ffmpeg, so
lossless raw/png decode is real (fixtures.decode_image) and the lossy
/ video paths are deterministic stubs behind NotImplementedError with
the Ray-side plumbing (schema, actor signatures, batch sizing) fully
exercised.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rhealpixdggs_py_ray.fixtures import decode_image
from rhealpixdggs_py_ray import sizing


def resize_nearest(pix: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (h_out, w_out, 3) — pure numpy."""
    sh, sw = pix.shape[:2]
    yi = (np.arange(h) * sh // h).astype(np.int64)
    xi = (np.arange(w) * sw // w).astype(np.int64)
    return pix[yi][:, xi]


class DecodeResizeFeatures:
    """Actor stage: decode payload -> resize -> per-image features.

    Appends ``feat_mean`` (list<float64> channel means of the resized
    image), ``feat_std`` (channel stds) and ``phash64`` (64-bit
    mean-threshold hash of the resized grayscale) — the
    feature-extraction step of an image training-data pipeline.
    Decode is per-row (variable-size blobs); everything after is
    vectorized per image.  Small batches: rows are wide.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        n = len(blobs)
        means = np.empty((n, 3), dtype=np.float64)
        stds = np.empty((n, 3), dtype=np.float64)
        ph = np.empty(n, dtype=np.int64)
        for k in range(n):
            pix = decode_image(blobs[k], fmts[k], int(ws[k]), int(hs[k]))
            small = resize_nearest(pix, self.out_w, self.out_h).astype(np.float64)
            means[k] = small.mean(axis=(0, 1))
            stds[k] = small.std(axis=(0, 1))
            # tie-exact mean threshold: compare 64*g3 > sum(g3) on the
            # 3-channel integer sums (exact in float64, values < 2^53)
            # instead of g8 > g8.mean() on thirds — same predicate
            # mathematically, but bitwise-reproducible in SQL (ADVICE
            # parity discipline; ties resolve to 0 on both sides)
            g3 = small.sum(axis=2)
            g8 = resize_nearest(g3[:, :, None], 8, 8)[:, :, 0]
            bits = (g8 * 64.0 > g8.sum()).ravel()
            ph[k] = int(
                np.uint64(
                    sum(int(b) << i for i, b in enumerate(bits))
                ).view(np.int64)
            )
        return (
            batch.append_column("feat_mean", pa.array(list(means)))
            .append_column("feat_std", pa.array(list(stds)))
            .append_column("phash64", pa.array(ph))
        )


class FrameSampler:
    """Video frame-sampling stage (STUB: no video codec in this
    container).  The Ray-side plumbing is real and runs end-to-end
    under ``fake_decode=True`` (a deterministic stand-in that slices
    the payload instead of decoding it — tests/test_ops.py exercises
    the actor pool, batch explode and output layout); the real decode
    path raises until ffmpeg/PyAV exists.

    Contract: input (id, bytes, fmt, n_frames) -> one output row per
    sampled frame (id, frame_idx, frame_bytes)."""

    FAKE_FRAME_BYTES = 64

    def __init__(self, every_n_frames: int = 30, fake_decode: bool = False):
        self.every_n_frames = every_n_frames
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode:
            raise NotImplementedError(
                "video decode needs ffmpeg/PyAV, unavailable in this "
                "environment; schema contract: input (id, bytes, fmt, "
                "n_frames) -> output (id, frame_idx, frame_bytes)"
            )
        ids = batch["id"].to_numpy(zero_copy_only=False)
        blobs = batch["bytes"].to_pylist()
        n_frames = batch["n_frames"].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_fb = [], [], []
        W = self.FAKE_FRAME_BYTES
        for i, blob in enumerate(blobs):
            for f in range(0, int(n_frames[i]), self.every_n_frames):
                s = (f * W) % max(1, len(blob))
                out_id.append(int(ids[i]))
                out_idx.append(f)
                out_fb.append(blob[s : s + W])
        return pa.table(
            {
                "id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int64()),
                "frame_bytes": pa.array(out_fb, type=pa.binary()),
            }
        )


class AudioFeatureStub:
    """Audio feature stage (STUB: no audio codec in this container).
    As with FrameSampler, ``fake_decode=True`` runs the real Ray
    plumbing with a deterministic splitmix64-derived feature vector in
    place of a mel transform; the real path raises.

    Contract: (id, bytes, fmt, sample_rate) -> (id, feat list<double>)."""

    N_FEAT = 8

    def __init__(self, fake_decode: bool = False):
        self.fake_decode = fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake_decode:
            raise NotImplementedError(
                "audio decode needs soundfile/librosa, unavailable here"
            )
        from rhealpixdggs_py_ray.fixtures import splitmix64

        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        j = np.arange(self.N_FEAT, dtype=np.uint64)
        h = splitmix64(
            (ids.astype(np.uint64)[:, None] * np.uint64(self.N_FEAT)) + j[None, :]
        )
        feats = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return pa.table(
            {
                "id": pa.array(ids),
                "feat": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count):
    byte-view + unpackbits-free nibble table."""
    b = v.view(np.uint8).reshape(len(v), 8)
    table = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return table[b].sum(axis=1).astype(np.int64)


def image_near_dup_pairs(ds, id_col: str = "img_idx", max_hamming: int = 6,
                         concurrency=None, extra_val_cols=()):
    """End-to-end image near-dup: decode -> 64-bit perceptual hash ->
    4x16-bit band LSH -> candidate pairs -> exact Hamming verify.

    The image payload never enters a shuffle: the decode actor pool
    reduces each row to (id, phash64), and only those 16 bytes ride the
    band groupby.  ``id_col`` must be int64.  Output
    (a, b, hamming) for pairs with hamming <= max_hamming.

    ``extra_val_cols``: int64 columns of ``ds`` to carry through the
    SAME fused verify exchange and emit per endpoint as ``{c}_a`` /
    ``{c}_b`` — downstream per-pair policies (e.g. retention picking
    the lower-resolution member by w*h) read them as a pure map
    instead of paying a second attach+pivot exchange."""
    from rhealpixdggs_py_ray.ops.dedup import (
        _attach_pair_sides_fused,
        _pair_sides_pivot,
        _pairs_within_keys,
    )

    import pandas as pd

    # two consumers (bands + the verify attach kv side): materialize
    # the tiny (id, phash64) projection once so the decode actor pool
    # doesn't re-execute per consumer
    feat = ds.map_batches(
        DecodeResizeFeatures, batch_format="pyarrow", batch_size=256,
        zero_copy_batch=True, concurrency=concurrency or sizing.pool(),
    ).select_columns([id_col, "phash64", *extra_val_cols]).materialize()

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = batch["phash64"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        band = np.tile(np.arange(4, dtype=np.int64), n)
        key = np.empty(4 * n, dtype=np.int64)
        for t in range(4):
            key[t::4] = ((ph >> np.uint64(16 * t)) & np.uint64(0xFFFF)).astype(np.int64)
        bucket = (band * 65536 + key) % 64
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4)),
                "band": pa.array(band),
                "bkey": pa.array(key),
                "bucket": pa.array(bucket),
            }
        )

    cand = (
        feat.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_within_keys(g, ["band", "bkey"]), batch_format="pyarrow"
        )
    )
    # exact verify: both endpoints' phashes reach each candidate pair
    # through ONE fused bucketed exchange (pair dedupe across bands
    # happens in-resolve) + the pivot exchange — replaces the round-2
    # _sum_by_pair distinct + two JoinOperators (each ~3s fixed setup
    # locally) at identical output.
    def as_doc_kv(batch: pa.Table) -> pa.Table:
        cols = {"doc_id": batch[id_col], "phash64": batch["phash64"]}
        for c in extra_val_cols:
            cols[c] = batch[c].cast(pa.int64())
        return pa.table(cols)

    att = _attach_pair_sides_fused(
        cand,
        feat.map_batches(as_doc_kv, batch_format="pyarrow", zero_copy_batch=True),
        pair_sums=[],
        val_cols=[("phash64", pa.int64())]
        + [(c, pa.int64()) for c in extra_val_cols],
        kv_mode="direct",
    )

    extra_out = [f"{c}_{side}" for c in extra_val_cols for side in ("a", "b")]

    def verify(m: pd.DataFrame) -> pd.DataFrame:
        if not len(m):
            cols = {
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "hamming": pd.Series([], dtype=np.int64),
            }
            for c in extra_out:
                cols[c] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        pa_ = np.ascontiguousarray(m["phash64_a"].to_numpy().astype(np.int64)).view(np.uint64)
        pb_ = np.ascontiguousarray(m["phash64_b"].to_numpy().astype(np.int64)).view(np.uint64)
        ham = _popcount64(np.bitwise_xor(pa_, pb_))
        keep = ham <= max_hamming
        cols = {
            "a": m["a"].to_numpy()[keep].astype(np.int64),
            "b": m["b"].to_numpy()[keep].astype(np.int64),
            "hamming": ham[keep],
        }
        for c in extra_out:
            cols[c] = m[c].to_numpy()[keep].astype(np.int64)
        return pd.DataFrame(cols)

    return _pair_sides_pivot(att, verify, ["phash64", *extra_val_cols])


class PcmFeatures:
    """REAL audio feature stage over raw-PCM payloads — no codec
    needed: int16 little-endian samples decode with one numpy
    frombuffer, so unlike FrameSampler/AudioFeatureStub (codec-blocked
    in this container) this path runs the actual bytes.  Per row:
    sample count, energy (sum of squares), zero crossings
    (sign-product < 0 over adjacent samples), peak |amplitude|, and
    the integer sample sum — all exact integers, so the DuckDB oracle
    replays the generative sample formula through generate_series and
    value-hash-verifies the whole decode chain.  Payload bytes never
    leave the stage (features only).

    Contract: (audio_id, bytes, fmt, sr, n_samples) ->
    (audio_id, n_samples, energy, zero_cross, peak_abs, sample_sum)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = {k: [] for k in ("id", "n", "e", "z", "p", "s")}
        for aid, blob, fmt in zip(ids, blobs, fmts):
            if fmt != "pcm_s16le":
                raise NotImplementedError(
                    f"compressed audio ({fmt}) needs soundfile/librosa, "
                    "unavailable here; raw pcm_s16le is the real path")
            v = np.frombuffer(blob, dtype="<i2").astype(np.int64)
            out["id"].append(aid)
            out["n"].append(len(v))
            out["e"].append(int((v * v).sum()))
            out["z"].append(int((v[:-1] * v[1:] < 0).sum()))
            out["p"].append(int(np.abs(v).max()) if len(v) else 0)
            out["s"].append(int(v.sum()))
        return pa.table({
            "audio_id": pa.array(out["id"], type=pa.string()),
            "n_samples": pa.array(out["n"], type=pa.int64()),
            "energy": pa.array(out["e"], type=pa.int64()),
            "zero_cross": pa.array(out["z"], type=pa.int64()),
            "peak_abs": pa.array(out["p"], type=pa.int64()),
            "sample_sum": pa.array(out["s"], type=pa.int64()),
        })


class RawVideoFrameStats:
    """REAL video frame-sampling stage over rawvideo payloads — no
    codec needed: frames are fixed-stride w*h*3 byte windows, so the
    decode is a numpy frombuffer + reshape per sampled frame (unlike
    FrameSampler's compressed path, which stays codec-blocked).
    Samples every ``every_n_frames``-th frame and emits exact integer
    per-frame statistics (sum, min, max over uint8 values) — features
    only, payload bytes never leave the stage.

    Contract: (video_id, bytes, w, h, fmt, n_frames) ->
    (video_id, frame_idx, px_sum, px_min, px_max)."""

    def __init__(self, every_n_frames: int = 2):
        self.every = every_n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        fmts = batch["fmt"].to_pylist()
        nfs = batch["n_frames"].to_numpy(zero_copy_only=False)
        out = {k: [] for k in ("id", "f", "s", "lo", "hi")}
        for k in range(len(ids)):
            if fmts[k] != "rawvideo":
                raise NotImplementedError(
                    f"compressed video ({fmts[k]}) needs ffmpeg/PyAV, "
                    "unavailable here; rawvideo is the real path")
            stride = int(ws[k]) * int(hs[k]) * 3
            v = np.frombuffer(blobs[k], dtype=np.uint8)
            for f in range(0, int(nfs[k]), self.every):
                fr = v[f * stride:(f + 1) * stride].astype(np.int64)
                out["id"].append(ids[k])
                out["f"].append(f)
                out["s"].append(int(fr.sum()))
                out["lo"].append(int(fr.min()))
                out["hi"].append(int(fr.max()))
        return pa.table({
            "video_id": pa.array(out["id"], type=pa.string()),
            "frame_idx": pa.array(out["f"], type=pa.int64()),
            "px_sum": pa.array(out["s"], type=pa.int64()),
            "px_min": pa.array(out["lo"], type=pa.int64()),
            "px_max": pa.array(out["hi"], type=pa.int64()),
        })
