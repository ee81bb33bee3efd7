"""Elementwise / ufunc surface tests — parity cases mirroring
reference tests/test_ufunc.py (add, sub-reflected, sin, ufunc-method
raise) plus the generic elementwise() verb and plan shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.operators.elementwise import NestedArray, elementwise


def _one(df, col):
    return df.select(col.alias("r")).collect()[0]["r"]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [([1.0, 2.0, None, 4.0], [10.0, 20.0, 30.0, None])],
        "x array<double>, y array<double>",
    )


def test_add_scalar(spark, df):
    # reference tests/test_ufunc.py::test_ufunc_add: daa.points.x + 2
    a = NestedArray(F.col("x"))
    assert _one(df, (a + 2).alias("r")) == [3.0, 4.0, None, 6.0]


def test_rsub_scalar(spark, df):
    # reference tests/test_ufunc.py::test_ufunc_sub: 2 - daa.points.x
    a = NestedArray(F.col("x"))
    assert _one(df, (2 - a).alias("r")) == [1.0, 0.0, None, -2.0]


def test_np_sin(spark, df):
    # reference tests/test_ufunc.py::test_ufunc_sin: np.sin(daa)
    a = NestedArray(F.col("x"))
    got = _one(df, np.sin(a).alias("r"))
    assert got[2] is None
    assert all(
        math.isclose(g, math.sin(v))
        for g, v in zip(got, [1.0, 2.0, None, 4.0])
        if g is not None
    )


def test_np_binary_and_reflected(spark, df):
    a, b = NestedArray(F.col("x")), NestedArray(F.col("y"))
    assert _one(df, np.add(a, b).alias("r")) == [11.0, 22.0, None, None]
    assert _one(df, np.multiply(3.0, a).alias("r")) == [3.0, 6.0, None, 12.0]


def test_ufunc_method_raises(spark, df):
    # reference tests/test_ufunc.py::test_ufunc_method_raise
    a = NestedArray(F.col("x"))
    with pytest.raises(RuntimeError, match="only method"):
        np.add.reduce(a, a)
    with pytest.raises(RuntimeError, match="only method"):
        np.add.accumulate(a, a)


def test_operator_sugar_matrix(spark, df):
    a, b = NestedArray(F.col("x")), NestedArray(F.col("y"))
    assert _one(df, (a * b).alias("r")) == [10.0, 40.0, None, None]
    assert _one(df, (a**2).alias("r")) == [1.0, 4.0, None, 16.0]
    assert _one(df, (b / a).alias("r")) == [10.0, 10.0, None, None]
    assert _one(df, (-a).alias("r")) == [-1.0, -2.0, None, -4.0]
    assert _one(df, abs(a - b).alias("r")) == [9.0, 18.0, None, None]
    assert _one(df, (a < 2.5).alias("r")) == [True, True, None, False]


def test_elementwise_nary(spark, df):
    got = _one(
        df,
        elementwise(
            lambda x, y, x2: x + y + x2, F.col("x"), F.col("y"), F.col("x")
        ).alias("r"),
    )
    assert got == [12.0, 24.0, None, None]


def test_elementwise_validates(spark):
    with pytest.raises(ValueError):
        elementwise(lambda x: x)


def test_no_python_in_row_path(spark, df):
    """The whole surface must lower to JVM HOF expressions — no
    Arrow/Python eval nodes in the plan."""
    from dask_awkward_sandbox_spark.core import visualize

    a, b = NestedArray(F.col("x")), NestedArray(F.col("y"))
    plan = visualize(df.select((np.sqrt(a * b + 2)).alias("r")))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
