"""Whitespace-delimited lon/lat text source — the engine's take on
``Ellipsoid.get_points`` (reference ellipsoids.py:306-326), expressed
Ray-Data-natively: ``ray.data.read_text`` (distributed, block-split
at line boundaries) followed by a vectorized Arrow parse stage.

Semantics match the reference's DOCUMENTED contract and its exact
leading-character rule: a line participates iff its first character
is one of ``-123456789`` — note NOT ``0``, ``+`` or ``.``; the quirk
is preserved on purpose and pinned by tests.  (The reference's own
py3 implementation opens the file in binary mode and compares
``line[0]`` — an int under py3 — against one-char strings, so it
silently returns `[]`; the engine implements what the docstring and
py2 behavior specify.)
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from rhealpixdggs_py_ray.core.config import WGS84_003, EngineConfig

_LINE_RE = r"^\s*(?P<lon>\S+)\s+(?P<lat>\S+)"


def parse_points_block(batch: pa.Table, radians: bool = False) -> pa.Table:
    """Vectorized parse of a block of text lines -> (lon, lat) doubles."""
    lines = batch["text"]
    if lines.num_chunks != 1:
        lines = lines.combine_chunks()
    keep = pc.match_substring_regex(lines, r"^[-1-9]")
    kept = pc.filter(lines, keep)
    m = pc.extract_regex(kept, _LINE_RE)
    lon = pc.cast(pc.struct_field(m, "lon"), pa.float64())
    lat = pc.cast(pc.struct_field(m, "lat"), pa.float64())
    if radians:
        d2r = math.pi / 180.0
        lon = pc.multiply(lon, pa.scalar(d2r))
        lat = pc.multiply(lat, pa.scalar(d2r))
    return pa.table({"lon": lon, "lat": lat})


def read_points_text(
    paths, cfg: EngineConfig = WGS84_003, **read_kwargs
) -> ray.data.Dataset:
    """Distributed reader: one (lon, lat) row per qualifying line.
    Angles are returned in degrees, or radians when ``cfg.radians``
    (the reference converts on read, ellipsoids.py:323-326)."""
    radians = bool(cfg.radians)
    ds = ray.data.read_text(paths, **read_kwargs)
    return ds.map_batches(
        lambda b: parse_points_block(b, radians=radians),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
