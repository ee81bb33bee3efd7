"""Query plans: the engine's operator surface exercised end-to-end.

Importing this package registers every query + DuckDB oracle pair in
``registry.QUERIES`` / ``registry.ORACLES``.
"""

from dask_awkward_sandbox_spark.plans import (  # noqa: F401  (registration side effects)
    events,
    io_queries,
    llm,
    nested,
    strings_queries,
    tpch,
)
from dask_awkward_sandbox_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
