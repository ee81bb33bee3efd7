"""PySpark-native nested-array analytics engine.

A from-scratch re-expression of the capabilities of dask-awkward
(reference: /root/reference, ContinuumIO/dask-awkward-sandbox) on
Apache Spark. The mapping:

- a partitioned awkward ``Array`` of nested values  ->  a Spark
  ``DataFrame`` with complex-typed columns (``array<T>``, ``struct``,
  ``array<struct>``);
- awkward axis=1 operations (per-list)  ->  JVM-side higher-order
  functions (``transform``/``filter``/``aggregate``/``zip_with``)
  composed as Column -> Column functions (see ``operators/``);
- awkward axis=0 / full reductions  ->  ``groupBy().agg()`` / global
  aggregation;
- the Dask task graph + necessary-columns optimization  ->  Catalyst
  logical plans + nested-schema pruning;
- ``map_partitions``  ->  ``mapInArrow`` / ``mapInPandas``.

Everything in the per-row hot path stays inside Spark whole-stage
codegen; Python UDFs appear only where semantics genuinely require
them (none of the reference's operator surface does).
"""

from dask_awkward_sandbox_spark.session import get_spark, load_tables, TABLES
from dask_awkward_sandbox_spark import core
from dask_awkward_sandbox_spark import inspect
from dask_awkward_sandbox_spark.operators import reducers, strings, structure

__all__ = [
    "get_spark",
    "load_tables",
    "TABLES",
    "core",
    "inspect",
    "structure",
    "reducers",
    "strings",
]

__version__ = "0.1.0"
