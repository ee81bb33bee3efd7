"""Weighted reducers (mean/var/std/covar/corr/linear_fit with a
parallel weight list) — surface the REFERENCE declares but raises
DaskAwkwardNotImplemented for (reference lib/reducers.py:338 mean,
:255 covar, :177 corr). Pinned against numpy formulas on
hypothesis-generated ragged data, and w=1 must reproduce the
unweighted reducers exactly."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_vals = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=0,
    max_size=8,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, xs, ys, ws) for i, (xs, ys, ws) in enumerate(rows)],
        "i long, xs array<double>, ys array<double>, ws array<double>",
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=st.lists(st.tuples(_vals, _vals, _vals), min_size=1, max_size=6))
def test_weighted_mean_var_match_numpy(spark, data):
    from dask_awkward_sandbox_spark.operators import reducers as red

    rows = []
    for xs, ys, ws in data:
        n = min(len(xs), len(ws))
        # positive weights: zero/negative total-weight edge is covered
        # separately below
        rows.append((xs[:n], ys[:n], [abs(w) + 0.5 for w in ws[:n]]))
    df = _frame(spark, rows)
    out = {
        r["i"]: (r["m"], r["v"])
        for r in df.select(
            "i",
            red.mean(F.col("xs"), weight=F.col("ws")).alias("m"),
            red.var(F.col("xs"), weight=F.col("ws")).alias("v"),
        ).collect()
    }
    for i, (xs, _, ws) in enumerate(rows):
        if len(xs) == 0:
            assert out[i] == (None, None)
            continue
        mu = np.average(xs, weights=ws)
        var = float(np.sum(np.array(ws) * (np.array(xs) - mu) ** 2) / np.sum(ws))
        assert out[i][0] == pytest.approx(mu, rel=1e-9, abs=1e-9)
        assert out[i][1] == pytest.approx(var, rel=1e-9, abs=1e-9)


def test_unit_weight_reproduces_unweighted(spark):
    from dask_awkward_sandbox_spark.operators import reducers as red

    df = _frame(
        spark,
        [([1.0, 2.0, 5.0], [2.0, 4.0, 7.0], [1.0, 1.0, 1.0]),
         ([3.0], [9.0], [1.0])],
    )
    got = df.select(
        red.mean(F.col("xs")).alias("m0"),
        red.mean(F.col("xs"), weight=F.col("ws")).alias("m1"),
        red.var(F.col("xs"), ddof=1).alias("v0"),
        red.var(F.col("xs"), ddof=1, weight=F.col("ws")).alias("v1"),
        red.covar(F.col("xs"), F.col("ys")).alias("c0"),
        red.covar(F.col("xs"), F.col("ys"), weight=F.col("ws")).alias("c1"),
        red.corr(F.col("xs"), F.col("ys")).alias("r0"),
        red.corr(F.col("xs"), F.col("ys"), weight=F.col("ws")).alias("r1"),
        red.linear_fit(F.col("xs"), F.col("ys")).alias("f0"),
        red.linear_fit(F.col("xs"), F.col("ys"), weight=F.col("ws")).alias("f1"),
    ).collect()
    for r in got:
        assert r["m0"] == r["m1"]
        assert r["v0"] == r["v1"]
        assert r["c0"] == r["c1"]
        assert r["r0"] == r["r1"]
        assert r["f0"] == r["f1"]


def test_weighted_linear_fit_matches_numpy_polyfit(spark):
    from dask_awkward_sandbox_spark.operators import reducers as red

    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [1.0, 3.0, 4.9, 7.2, 9.0]
    ws = [1.0, 2.0, 0.5, 3.0, 1.5]
    df = _frame(spark, [(xs, ys, ws)])
    r = df.select(
        red.linear_fit(F.col("xs"), F.col("ys"), weight=F.col("ws")).alias("f")
    ).collect()[0]["f"]
    slope, intercept = np.polyfit(xs, ys, 1, w=np.sqrt(ws))
    assert r["slope"] == pytest.approx(float(slope), rel=1e-9)
    assert r["intercept"] == pytest.approx(float(intercept), rel=1e-9)


def test_weighted_null_pairs_skipped_and_empty_null(spark):
    from dask_awkward_sandbox_spark.operators import reducers as red

    df = spark.createDataFrame(
        [(0, [1.0, None, 3.0], [2.0, 5.0, None])],
        "i long, xs array<double>, ws array<double>",
    )
    m = df.select(red.mean(F.col("xs"), weight=F.col("ws")).alias("m")).collect()[0]["m"]
    # only the (1.0, 2.0) pair survives
    assert m == pytest.approx(1.0)
    e = spark.createDataFrame([(0, [], [])], "i long, xs array<double>, ws array<double>")
    assert (
        e.select(red.mean(F.col("xs"), weight=F.col("ws")).alias("m")).collect()[0]["m"]
        is None
    )
