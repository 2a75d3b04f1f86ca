"""Named-projection dispatch — the reference's ``Projection`` wrapper
(projection_wrapper.py:38-121) re-expressed for the vectorized engine.

The reference dispatches by name: 'healpix'/'rhealpix' resolve to its
homemade closures via ``importlib.import_module`` ON EVERY CALL
(projection_wrapper.py:98-104 — the per-point cost BASELINE.md
measures at 40.6 µs/pt); anything else goes to ``pyproj.Proj``.  This
workalike keeps the same surface — ``Projection(cfg, 'rhealpix')(u,
v, inverse=False)`` — but binds the vectorized kernel once at
construction, accepts scalars or arrays, and routes unknown names to
pyproj when that package exists (it does not in this sandbox, so the
path degrades to an ImportError that NAMES the missing dependency —
the same observable behavior a reference user without pyproj sees).
"""

from __future__ import annotations

import numpy as np

from rhealpixdggs_py_ray.core import projection as _proj
from rhealpixdggs_py_ray.core.config import EngineConfig, WGS84_003

HOMEMADE_PROJECTIONS = ("healpix", "rhealpix")  # projection_wrapper.py:34-35


class Projection:
    """Callable ``(u, v, inverse=False) -> (x, y)``; reference parity:
    projection_wrapper.py:89-121 (recentering lives in the kernel via
    ``cfg.lon_0``/``lat_0``, identical wrap rule)."""

    def __init__(self, cfg: EngineConfig = WGS84_003, proj: str = "rhealpix"):
        self.cfg = cfg
        self.proj = proj
        if proj in HOMEMADE_PROJECTIONS:
            self._pyproj = None
        else:
            # a WORKING pyproj is required: the differential tests stub
            # an import-only pyproj into sys.modules for the reference,
            # so failure at Proj-construction must degrade the same way
            # as a missing package
            try:
                import pyproj

                self._pyproj = pyproj.Proj(
                    proj=proj, a=cfg.a, f=1 - np.sqrt(1 - cfg.e**2),
                    lon_0=cfg.lon_0, lat_0=cfg.lat_0,
                )  # pragma: no cover - pyproj absent here
            except Exception as e:
                raise ImportError(
                    f"projection {proj!r} is not one of the homemade kernels "
                    f"{HOMEMADE_PROJECTIONS} and requires a working pyproj "
                    "(reference projection_wrapper.py:105-108), which is not "
                    "available"
                ) from e

    def __call__(self, u, v, inverse: bool = False):
        scalar = np.isscalar(u) and np.isscalar(v)
        ua = np.atleast_1d(np.asarray(u, dtype=np.float64))
        va = np.atleast_1d(np.asarray(v, dtype=np.float64))
        if self._pyproj is not None:  # pragma: no cover - pyproj absent here
            x, y = self._pyproj(ua, va, inverse=inverse)
        elif inverse:
            x, y, _valid = _proj.inverse(self.cfg, ua, va, proj=self.proj)
        else:
            x, y = _proj.forward(self.cfg, ua, va, proj=self.proj)
        if scalar:
            return float(x[0]), float(y[0])
        return x, y
