"""Extended TPC-H-style surface (q4/q14/q16/q19 shapes): value parity
is covered by the registered-query gate (tests/test_oracle_parity.py
parametrizes over the registry); here live the plan-shape assertions
for the join strategies each query exists to exercise."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("DWAX_TEST_SF", "/root/testdata/sf0.001")


def test_q4_uses_semi_join(spark):
    from dask_awkward_sandbox_spark.plans import tpch

    plan = tpch.q4_priority_semi(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan


def test_q19_single_scan_no_union(spark):
    """The disjunction must stay ONE scan + one filter, not a union of
    three branch scans."""
    from dask_awkward_sandbox_spark.plans import tpch

    plan = tpch.q19_disjunctive(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 2  # lineitem + part, once each


def test_q16_distinct_is_two_level(spark):
    """count(distinct) must expand to the two-level aggregate (partial
    per partition, exact merge), visible as two HashAggregate layers
    keyed by the distinct column — not a row explosion."""
    from dask_awkward_sandbox_spark.plans import tpch

    plan = tpch.q16_supplier_breadth(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 3, plan
