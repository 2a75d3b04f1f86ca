"""Ray-Data-native rHEALPix DGGS spatial-join + tiling engine.

A from-scratch, vectorized, distributed re-expression of the query
semantics of manaakiwhenua/rhealpixdggs-py (reference read-only at
/root/reference) on top of ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches.

Layout:

- ``core``      pure-numpy kernels (no Ray): projection, SUID codec,
                point->cell indexing, cell geometry, topology, covers.
- ``stages``    ``map_batches`` callables (actor-pool stages).
- ``sources``   readers/writers for the image table + helpers.
- ``functions`` training-data kernels: dedup, text stats, embeddings.
- ``pipelines`` end-to-end Dataset pipelines (flagship spatial join,
                tiling, kNN, dedup...).
- ``state``     per-partition checkpoint manifest for resumable runs.
"""

from rhealpixdggs_py_ray.core.config import (  # noqa: F401
    EngineConfig,
    WGS84_003,
    WGS84_003_RADIANS,
    UNIT_003,
    WGS84_123,
    WGS84_002,
)

# The reference's rhp_wrappers surface (H3-workalike string API), so a
# user switching from `rhealpixdggs.rhp_wrappers` keeps their imports:
# `from rhealpixdggs_py_ray import geo_to_rhp, polyfill, k_ring, ...`.
from rhealpixdggs_py_ray.core.wrappers import (  # noqa: F401
    cell_area,
    cell_ring,
    compress_order_cells,
    geo_to_rhp,
    get_finest_containing_cell,
    k_ring,
    linetrace,
    num_cells,
    polyfill,
    rhp_get_base_cell,
    rhp_get_resolution,
    rhp_is_valid,
    rhp_to_center_child,
    rhp_to_geo,
    rhp_to_geo_boundary,
    rhp_to_parent,
)

from rhealpixdggs_py_ray.core.projection_dispatch import Projection

__version__ = "0.1.0"
