"""Pins CellZoneFromPoly / get_finest_containing_cell against the
reference's only end-to-end corpus: the catchment polygon and its
frozen res-9 SUID list in /root/reference/tests/test_conversion.py
(parsed as DATA — no reference code is executed or imported)."""

from __future__ import annotations

import re

import numpy as np
import pytest

from rhealpixdggs_py_ray.core import conversion as cz
from rhealpixdggs_py_ray.core import geometry as geo
from rhealpixdggs_py_ray.core import suid as su
from rhealpixdggs_py_ray.core import wrappers as W
from rhealpixdggs_py_ray.core.config import WGS84_003 as CFG

REF_TEST = "/root/reference/tests/test_conversion.py"


def _load_corpus():
    src = open(REF_TEST).read()
    wkt = re.search(r"MULTIPOLYGON \(\(\((.*?)\)\)\)", src, re.S).group(1)
    pts = [tuple(map(float, p.split())) for p in re.split(r",\s*", wkt.replace("\n", " "))]
    shell = pts[:-1] if pts[0] == pts[-1] else pts
    body = re.search(
        r"ground_truth_cells_for_catchment_12104622_at_res_9 = \[(.*?)\]", src, re.S
    ).group(1)
    truth = re.findall(r'"([NOPQRS][0-8]+)"', body)
    comp_body = re.search(
        r"ground_truth_ordered_compressed_cells_for_catchment_12104622_at_res_9"
        r" = \[(.*?)\]",
        src,
        re.S,
    ).group(1)
    compressed = re.findall(r'"([NOPQRS][0-8]+)"', comp_body)
    return geo.Polygon(shell), truth, compressed


@pytest.fixture(scope="module")
def corpus():
    return _load_corpus()


def test_get_finest_containing_cell_matches_reference(corpus):
    poly, _, _ = corpus
    u = cz.get_finest_containing_cell(poly, CFG)
    assert "".join(str(x) for x in su.suid_tuple(int(u))) == "R78518"


def test_cell_zone_matches_frozen_corpus(corpus):
    poly, truth, _ = corpus
    zone = cz.cell_zone_from_poly(poly, 9, CFG)
    got = {"".join(str(x) for x in su.suid_tuple(int(c))) for c, _ in zone}
    assert got == set(truth)
    assert len(zone) == len(truth)  # no duplicate emits
    kinds = {k for _, k in zone}
    assert kinds <= {cz.KIND_BOUNDING, cz.KIND_CONTAINED, cz.KIND_NUCLEUS}


def test_compress_matches_frozen_corpus(corpus):
    _, truth, compressed = corpus
    assert W.compress_order_cells(truth) == compressed


def test_zone_contained_cells_really_inside(corpus):
    poly, _, _ = corpus
    zone = cz.cell_zone_from_poly(poly, 9, CFG)
    from rhealpixdggs_py_ray.core import index as idx

    contained = np.array(
        [c for c, k in zone if k == cz.KIND_CONTAINED], dtype=np.uint64
    )
    if len(contained):
        v = idx.vertices(CFG, contained, plane=False)
        inside = geo.points_in_polygon(
            v[:, :, 0].ravel(), v[:, :, 1].ravel(), poly
        ).reshape(-1, 4)
        assert inside.all()
