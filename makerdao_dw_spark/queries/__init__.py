"""Import all query modules so their @query decorators populate REGISTRY."""

from .registry import REGISTRY, oracles_dict, queries_dict, query  # noqa: F401

# Each import registers its queries as a side effect. Imports are
# deliberately NOT wrapped in try/except: a broken module must fail the
# whole registry, not silently shrink the declared surface.
from . import (  # noqa: E402,F401
    advanced,
    assets_per_type,
    compliance,
    dedup,
    evaluation,
    evaluation2,
    experiments,
    experiments2,
    flagship,
    graph,
    incremental,
    indexing,
    modern,
    modern2,
    multimodal,
    olap,
    relational,
    similarity,
    similarity2,
    sketches,
    streaming,
    text,
    text2,
    timeseries,
    tpch2,
    tpch3,
    tpch4,
    training,
    training2,
    training3,
    training4,
    training5,
    training6,
    training7,
    training8,
    training9,
    training10,
    training11,
    udaf,
    warehouse,
)
