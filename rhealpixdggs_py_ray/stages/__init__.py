"""map_batches stage callables (actor-pool classes) for Ray Data
pipelines."""

from rhealpixdggs_py_ray.stages.indexer import CellIndexer, PayloadVerifier  # noqa: F401
from rhealpixdggs_py_ray.stages.join import CoverSemiJoin, make_cover_ref  # noqa: F401
