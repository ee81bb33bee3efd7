"""Histogram operators pinned against numpy.histogram / histogram2d
(edge semantics: half-open bins, last bin closed, under/overflow
split out), on real testdata and hypothesis-generated ragged lists."""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF_DIR = os.environ.get("DWAX_TEST_SF", "/root/testdata/sf0.01")


def test_flat_histogram_matches_numpy(spark):
    from dask_awkward_sandbox_spark.operators import histogram as hg

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        r["bin"]: (r["lo_edge"], r["hi_edge"], r["n"])
        for r in hg.histogram(li, "l_quantity", bins=10, lo=0.0, hi=50.0).collect()
    }
    vals = np.array([r[0] for r in li.select("l_quantity").collect()])
    counts, edges = np.histogram(vals, bins=10, range=(0.0, 50.0))
    assert len(got) == 10
    for i in range(10):
        assert got[i][2] == counts[i], (i, got[i], counts[i])
        assert got[i][0] == pytest.approx(edges[i])
        assert got[i][1] == pytest.approx(edges[i + 1])


def test_flat_histogram_flow_bins(spark):
    from dask_awkward_sandbox_spark.operators import histogram as hg

    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 2.5, 5.0, 7.0, None]], "x double"
    )
    got = {r["bin"]: r["n"] for r in hg.histogram(df, "x", 2, 0.0, 5.0, flow=True).collect()}
    # -5 underflow; 0,2.4.. bin0; 2.5 bin1; 5.0 == hi -> last bin; 7 overflow
    assert got == {-1: 1, 0: 1, 1: 2, 2: 1}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(
    st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=0, max_size=10),
    min_size=1, max_size=6,
))
def test_ragged_histograms_match_numpy(spark, rows):
    from dask_awkward_sandbox_spark.operators import histogram as hg

    df = spark.createDataFrame(
        [(i, [float(v) for v in xs]) for i, xs in enumerate(rows)],
        "i long, xs array<double>",
    )
    per_row = {
        r["i"]: r["h"]
        for r in df.select(
            "i", hg.histogram_axis1(F.col("xs"), 4, -8.0, 8.0).alias("h")
        ).collect()
    }
    for i, xs in enumerate(rows):
        counts, _ = np.histogram(xs, bins=4, range=(-8.0, 8.0)) if xs else (np.zeros(4), None)
        assert per_row[i] == [int(c) for c in counts], (i, xs)

    glob = {
        r["bin"]: r["n"]
        for r in hg.histogram_global(df, "xs", 4, -8.0, 8.0).collect()
    }
    allv = [v for xs in rows for v in xs]
    gcounts, _ = np.histogram(allv, bins=4, range=(-8.0, 8.0)) if allv else (np.zeros(4), None)
    assert glob == {i: int(c) for i, c in enumerate(gcounts)}


def test_histogram2d_matches_numpy(spark):
    from dask_awkward_sandbox_spark.operators import histogram as hg

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(2000)
    rows = li.select("l_quantity", "l_discount").collect()
    xs = np.array([r[0] for r in rows])
    ys = np.array([r[1] for r in rows])
    want, _, _ = np.histogram2d(xs, ys, bins=(5, 4), range=((0, 50), (0, 0.1)))
    got = {
        (r["xbin"], r["ybin"]): r["n"]
        for r in hg.histogram2d(
            li, "l_quantity", "l_discount", (5, 4), (0.0, 50.0), (0.0, 0.1)
        ).collect()
    }
    for i in range(5):
        for j in range(4):
            assert got.get((i, j), 0) == int(want[i][j]), (i, j)


def test_global_histogram_plan_has_no_explode(spark):
    """The ragged global histogram must reduce count VECTORS, not
    exploded elements: no Generate (explode of data) feeding the
    aggregate — the only explode allowed is the bins-wide output
    formatting on the 1-row aggregate result."""
    from dask_awkward_sandbox_spark.operators import histogram as hg

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.col("l_quantity")).alias("qs")
    )
    plan = (
        hg.histogram_global(nested, "qs", 8, 0.0, 50.0)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    agg_part = plan.split("Aggregate")[-1]
    assert "Generate explode" not in agg_part, plan
