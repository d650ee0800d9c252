"""Query layer: the reference's serving surface (REST endpoints +
ES-demo query set, SURVEY §2.11) plus the engine's analytics/extension
queries, each paired with a DuckDB oracle for correctness checking.
"""

from .queries import REGISTRY, oracle_sql, queries
from . import llm_queries  # noqa: F401 — populates REGISTRY on import
from . import log_queries  # noqa: F401 — populates REGISTRY on import
from . import cdc_queries  # noqa: F401 — populates REGISTRY on import

__all__ = ["REGISTRY", "queries", "oracle_sql"]
