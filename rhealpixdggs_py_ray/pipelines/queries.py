"""Driver-facing query suite facade: the full q_*/sql_* namespace,
re-exported from the per-family modules (split from the former
36k-line monolith; the public surface — every name tests,
__ray_entry__ and tools used before the split — is unchanged)."""

from rhealpixdggs_py_ray.pipelines.qbase import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_ann import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_dedup import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_multimodal import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_stats1 import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_spatial2 import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_graph import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_lakehouse import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_spatial1 import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_stats2 import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_text import *  # noqa: F401,F403
from rhealpixdggs_py_ray.pipelines.q_timeseries import *  # noqa: F401,F403
