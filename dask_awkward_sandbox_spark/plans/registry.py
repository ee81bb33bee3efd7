"""Registry for (query, oracle) pairs consumed by __spark_entry__.

Determinism contract for oracle-checked queries (the driver compares
Spark vs DuckDB by row-count + schema + order-insensitive value
hash):

- money/quantity values are integerized ("cents") BEFORE summing:
  sums of integer-valued doubles below 2**53 are exact and
  order-independent, so both engines agree bit-for-bit with no float
  rounding fragility;
- derived ratios (mean/var/corr/...) are computed from those exact
  sums with the SAME arithmetic expression on both sides, then
  defensively rounded;
- integer outputs are cast to bigint on both sides (Spark size() is
  int, DuckDB len() is bigint);
- any top-k uses a total order (value desc, unique id asc).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB SQL over the registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings). Omit for non-SQL-expressible ops (driver
    then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
