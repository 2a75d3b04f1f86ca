from rhealpixdggs_py_ray.sources.images import read_images  # noqa: F401
