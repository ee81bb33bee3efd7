"""Form-parity pins for the r10 codegen-aggregate rewrites (the
test_dedup_edges simhash-pin move): the registered flat hash-aggregate
forms of q_sort_argsort and q_concatenate's axis=None legs must stay
row-identical to the retained nested-HOF compositions — two
implementations of one contract may not drift, and the pin is what
transfers the driver gate's authority to the HOF operator forms."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _rows(df, key=None):
    out = [r.asDict() for r in df.collect()]
    if key:
        out.sort(key=lambda d: d[key])
    return out


def test_sort_argsort_forms_agree(spark):
    from dask_awkward_sandbox_spark.plans.nested import (
        q_sort_argsort,
        q_sort_argsort_hof,
    )

    fast = _rows(q_sort_argsort(spark, SF), key="l_orderkey")
    hof = _rows(q_sort_argsort_hof(spark, SF), key="l_orderkey")
    assert len(fast) == len(hof) > 0
    assert fast == hof


def test_concatenate_axis_none_forms_agree(spark):
    from dask_awkward_sandbox_spark.plans.nested import (
        q_concatenate,
        q_concatenate_axis_none_hof,
    )

    hof = _rows(q_concatenate_axis_none_hof(spark, SF))
    assert len(hof) == 1
    # the registered slot broadcasts the same 9 columns onto every
    # returnflag row — project them back out for the comparison
    fast_full = _rows(q_concatenate(spark, SF))
    cols = list(hof[0])
    fast = [{c: r[c] for c in cols} for r in fast_full]
    assert all(f == hof[0] for f in fast)


def test_reduce_order_count_forms_agree(spark):
    from dask_awkward_sandbox_spark.plans.nested import (
        q_reduce_order_count,
        q_reduce_order_count_hof,
    )

    fast = _rows(q_reduce_order_count(spark, SF), key="l_orderkey")
    hof = _rows(q_reduce_order_count_hof(spark, SF), key="l_orderkey")
    assert len(fast) == len(hof) > 0
    assert fast == hof


def test_cartesian_combinations_forms_agree(spark):
    from dask_awkward_sandbox_spark.plans.nested import (
        q_cartesian_combinations,
        q_cartesian_combinations_hof,
    )

    fast = _rows(q_cartesian_combinations(spark, SF), key="l_orderkey")
    hof = _rows(q_cartesian_combinations_hof(spark, SF), key="l_orderkey")
    assert len(fast) == len(hof) > 0
    assert fast == hof
