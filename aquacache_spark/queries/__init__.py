"""Query registry package — one module per tier, the shared
registry/fixture core in ``_common``. Importing this package
registers all queries (each tier module registers into
``_common.QUERIES`` / ``_common.ORACLES`` at import time).

``from aquacache_spark import queries as Q`` keeps working: this
module re-exports QUERIES, ORACLES, and every name the original flat
module exposed.
"""

from ._common import *  # noqa: F401,F403
from . import _common as _c
from . import core, hydrology, dedup, ann, multimodal, web  # noqa: F401

QUERIES = _c.QUERIES
ORACLES = _c.ORACLES

# compatibility: the original flat module exposed every section-level
# symbol; keep them reachable (first definition wins, _common first)
for _m in (_c, core, hydrology, dedup, ann, multimodal, web):
    for _k, _v in vars(_m).items():
        if not _k.startswith("__") and _k not in globals():
            globals()[_k] = _v
del _m, _k, _v, _c
