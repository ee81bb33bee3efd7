"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship nested-analytics query; ``queries()``
exposes every implemented operator from SURVEY.md §2; ``oracle_sql()``
gives the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the per-order
    nested array<struct> collection (the dask-awkward data model in
    Spark), then run a chain of axis=1 structure ops + reducers —
    all JVM higher-order functions, no Python in the row path."""
    from pyspark.sql import functions as F

    from dask_awkward_sandbox_spark.operators import reducers as red
    from dask_awkward_sandbox_spark.operators import structure as st
    from dask_awkward_sandbox_spark.plans.common import cents, fld_map, order_items

    it = order_items(spark, "/root/testdata/sf0.001")
    items = F.col("items")
    qty_c = fld_map(items, "l_quantity", cents)
    price_c = fld_map(items, "l_extendedprice", cents)
    revenue = F.zip_with(qty_c, price_c, lambda q, p: q * p)
    return it.select(
        "l_orderkey",
        st.num(items).alias("n_items"),
        st.firsts(items)["l_linenumber"].cast("long").alias("first_ln"),
        red.sum(qty_c).cast("long").alias("sum_qty_c"),
        red.max(price_c).cast("long").alias("max_price_c"),
        red.mean(qty_c).alias("mean_qty_c"),
        red.argmax(price_c).alias("argmax_price"),
        red.sum(revenue).cast("long").alias("dot_c"),
        F.round(red.std(qty_c), 4).alias("std_qty_c"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from dask_awkward_sandbox_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query; keys
    absent here (LSH joins, approximate search) get rows-only checks."""
    from dask_awkward_sandbox_spark.plans import ORACLES

    return dict(ORACLES)
