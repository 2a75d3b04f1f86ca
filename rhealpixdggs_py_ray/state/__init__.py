from rhealpixdggs_py_ray.state.checkpoint import CheckpointedRun  # noqa: F401
