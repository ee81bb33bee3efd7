"""Query plans: the engine's operator surface exercised end-to-end.

Importing this package registers every query + DuckDB oracle pair in
``registry.QUERIES`` / ``registry.ORACLES``.
"""

# Registration order IS the driver's check order (the correctness gate
# consumes the first 50 registered queries): flagship relational (tpch)
# and string surfaces first, and the total is kept at exactly 50 so
# every query gets a driver correctness row.
from dask_awkward_sandbox_spark.plans import (  # noqa: F401  (registration side effects)
    tpch,
    strings_queries,
    events,
    relational,
    io_queries,
    llm,
    nested,
)
from dask_awkward_sandbox_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
