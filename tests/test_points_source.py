"""Text lon/lat points source (Ellipsoid.get_points,
ellipsoids.py:306-326): documented semantics + the reference's exact
leading-character rule (lines starting with '0', '+', '.', '#' or
blank are skipped)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from rhealpixdggs_py_ray.core.config import UNIT_003_RADIANS
from rhealpixdggs_py_ray.sources.points import parse_points_block, read_points_text

LINES = [
    "# comment",
    "12.5 3.25",
    "-7.125 44.0",
    "0.25 33.25",   # leading '0' — skipped (reference quirk)
    "+17.5 2.5",    # leading '+' — skipped
    ".5 .5",        # leading '.' — skipped
    "",
    "lon lat",
    "179.875 -89.5",
]


def _block():
    return pa.table({"text": pa.array(LINES, type=pa.string())})


def test_parse_rules():
    t = parse_points_block(_block())
    assert t.column_names == ["lon", "lat"]
    assert t["lon"].to_pylist() == [12.5, -7.125, 179.875]
    assert t["lat"].to_pylist() == [3.25, 44.0, -89.5]


def test_parse_radians():
    t = parse_points_block(_block(), radians=True)
    d2r = math.pi / 180.0
    assert t["lon"].to_pylist() == [12.5 * d2r, -7.125 * d2r, 179.875 * d2r]


def test_read_points_text_dataset(ray_session, tmp_path):
    p = tmp_path / "pts.txt"
    p.write_text("\n".join(LINES) + "\n")
    ds = read_points_text(str(p))
    rows = sorted(ds.take_all(), key=lambda r: r["lon"])
    assert [r["lon"] for r in rows] == [-7.125, 12.5, 179.875]
    # radians config converts on read, like the reference
    ds_r = read_points_text(str(p), cfg=UNIT_003_RADIANS)
    got = sorted(r["lat"] for r in ds_r.take_all())
    want = sorted(np.radians([3.25, 44.0, -89.5]).tolist())
    assert got == want


def test_fixture_row_count(ray_session):
    from rhealpixdggs_py_ray.pipelines.queries import (
        POINTS_FIXTURE_N,
        _write_points_fixture,
    )

    path = _write_points_fixture()
    ds = read_points_text(path)
    # the leading-char rule also eats DATA lines with lon in [0, 1)
    # (repr starts with '0') — that's the reference quirk, preserved;
    # recompute the expectation with the same rule
    import re

    with open(path) as f:
        expect = sum(1 for ln in f if re.match(r"^[-1-9]", ln))
    assert 0 < expect < POINTS_FIXTURE_N
    assert ds.count() == expect
