"""Driver-facing query registry.

Every operator from SURVEY.md §2 (plus the implied relational surface
and the LLM-pipeline extensions) registers one named query here, with a
DuckDB oracle SQL string where the semantics are SQL-expressible.
``/root/repo/__spark_entry__.py`` re-exports this registry.
"""

from .base import ORACLES, QUERIES, REGISTRY

# importing the modules populates the registry
from . import reference_ops  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import tpch_more  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401

__all__ = ["REGISTRY", "QUERIES", "ORACLES"]
