"""Query pack: importing this package populates the registry."""

from . import analytics, extended, gold_star, relational, sql_api  # noqa: F401
from ..llm import dedup, multimodal, similarity, text  # noqa: F401
from .registry import REGISTRY, QuerySpec, register  # noqa: F401
