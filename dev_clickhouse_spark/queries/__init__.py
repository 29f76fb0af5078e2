"""Query pack: importing this package populates the registry."""

from . import (  # noqa: F401
    agg_extras,
    agg_extras2,
    analytics,
    behavioral,
    combinators,
    extended,
    func_parity9,
    gold_star,
    iterative,
    mutation_parity,
    projection_parity,
    relational,
    scalar_parity,
    skip_scan,
    sql_api,
    state_rollup,
    stats_parity,
    stats_tests,
    stats_tests3,
    stats_tests4,
    string_geo,
    subquery_range,
    tpch_rest,
)
from ..llm import (  # noqa: F401
    cluster,
    curation,
    dedup,
    multimodal,
    sampling,
    signals,
    similarity,
    substring,
    text,
)
from .registry import REGISTRY, QuerySpec, register  # noqa: F401
