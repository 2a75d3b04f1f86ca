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
            gray = small.mean(axis=2)
            g8 = resize_nearest(gray[:, :, None], 8, 8)[:, :, 0]
            bits = (g8 > g8.mean()).ravel()
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
    container).  The Ray-side contract is real — input rows carry
    (bytes, fmt='mp4', meta), output explodes to one row per sampled
    frame — but calling it raises until a decoder exists."""

    def __init__(self, every_n_frames: int = 30):
        self.every_n_frames = every_n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decode needs ffmpeg/PyAV, unavailable in this "
            "environment; schema contract: input (id, bytes, fmt, "
            "n_frames) -> output (id, frame_idx, frame_bytes)"
        )


class AudioFeatureStub:
    """Audio feature stage (STUB: no audio codec in this container).
    Contract: (id, bytes, fmt, sample_rate) -> (id, list<float64>
    mel-ish features)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decode needs soundfile/librosa, unavailable here"
        )
