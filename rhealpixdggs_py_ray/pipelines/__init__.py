from rhealpixdggs_py_ray.pipelines.flagship import (  # noqa: F401
    index_images,
    spatial_join_tiling,
)
from rhealpixdggs_py_ray.pipelines.tiles import aggregate_tiles  # noqa: F401
from rhealpixdggs_py_ray.pipelines.knn import knn_brute, knn_rings  # noqa: F401
