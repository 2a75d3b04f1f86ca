import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver contract: the
    library never calls ray.init itself; only this fixture, bench.py and
    CLI entry points own a session)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def reference():
    """The reference library itself, imported with dependency stubs —
    used by differential tests only."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from refstub import install

    install()
    import rhealpixdggs.dggs as rd

    return rd
