"""Extended TPC-H-style surface (q4/q14/q16/q19 shapes, adapted to the
testdata's columns) — tests-only DuckDB parity, same comparator as the
registered-query gate, plus plan-shape assertions for the join
strategies each query exists to exercise."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("DWAX_TEST_SF", "/root/testdata/sf0.001")

DP = "cast(round(l_extendedprice*100) as bigint) * (100 - cast(round(l_discount*100) as bigint))"

CASES = {
    "q4_priority_semi": f"""
        select o_orderpriority, cast(count(*) as bigint) as n_orders
        from orders o
        where o.o_orderdate >= timestamp '1997-01-01'
          and o.o_orderdate <  timestamp '1998-01-01'
          and exists (select 1 from lineitem l
                      where l.l_orderkey = o.o_orderkey and l.l_returnflag = 'R')
        group by o_orderpriority
    """,
    "q14_promo_effect": f"""
        select cast(sum(case when p.p_type like 'PROMO%' then {DP} else 0 end) as bigint)
                 as promo_u,
               cast(sum({DP}) as bigint) as total_u,
               100.0 * sum(case when p.p_type like 'PROMO%' then {DP} else 0 end)
                     / sum({DP}) as promo_pct
        from lineitem l join part p on p.p_partkey = l.l_partkey
        where l.l_shipdate >= timestamp '1997-09-01'
          and l.l_shipdate <  timestamp '1997-10-01'
    """,
    "q16_supplier_breadth": """
        select p.p_brand, substr(p.p_type, 1, 6) as p_type6,
               cast(count(distinct l.l_suppkey) as bigint) as n_suppliers,
               cast(count(*) as bigint) as n_items
        from lineitem l join part p on p.p_partkey = l.l_partkey
        group by p.p_brand, p_type6
    """,
    "q19_disjunctive": f"""
        select cast(sum({DP}) as bigint) as revenue_u, cast(count(*) as bigint) as n
        from lineitem l join part p on p.p_partkey = l.l_partkey
        where (p.p_brand = 'Brand#1' and p.p_size <= 10
               and l.l_quantity between 1 and 20)
           or (p.p_brand = 'Brand#2' and p.p_size <= 20
               and l.l_quantity between 10 and 30)
           or (p.p_brand = 'Brand#3' and p.p_size <= 30
               and l.l_quantity between 20 and 40)
    """,
}


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon(df_pandas):
    cols = sorted(df_pandas.columns)
    return cols, sorted(
        tuple(_canon_cell(r[c]) for c in cols) for r in df_pandas.to_dict("records")
    )


@pytest.mark.parametrize("name", sorted(CASES))
def test_tpch_extra_matches_oracle(spark, name):
    from dask_awkward_sandbox_spark.plans import tpch

    got = _canon(getattr(tpch, name)(spark, SF_DIR).toPandas())

    con = duckdb.connect()
    for t in ["orders", "lineitem", "part"]:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = _canon(con.execute(CASES[name]).df())
    assert got[0] == want[0], f"{name}: columns {got[0]} != {want[0]}"
    assert got[1] == want[1], f"{name}: first mismatches {[p for p in zip(got[1], want[1]) if p[0] != p[1]][:3]}"


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
