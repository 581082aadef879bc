"""Import all query modules so their @query decorators populate REGISTRY."""

from .registry import REGISTRY, oracles_dict, queries_dict, query  # noqa: F401

# Each import registers its queries as a side effect.
from . import flagship  # noqa: E402,F401

_MODULES = [
    "relational",
    "advanced",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "assets_per_type",
]
for _m in _MODULES:
    try:
        __import__(f"{__name__}.{_m}")
    except ImportError:
        pass  # module not built yet (incremental rounds)
