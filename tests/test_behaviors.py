"""Behavior (mixin-class) dispatch over named nested records.

Mirrors reference tests/test_behavior.py: a Point mixin registered in
a behavior dict contributes ``distance``/``x2``/``np.abs`` and the
dask_property / dask_method dispatch variants; with_name attaches the
record name; attribute access composes Catalyst expressions.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.operators import behaviors as B
from dask_awkward_sandbox_spark.operators import structure as S
from dask_awkward_sandbox_spark.operators.elementwise import NestedArray

behaviors: dict = {}


@B.mixin_class(behaviors)
class Point:
    def distance(self, other):
        return np.sqrt((self.x - other.x) ** 2 + (self.y - other.y) ** 2)

    @property
    def x2(self):
        return self.x * self.x

    @B.mixin_class_method(np.abs)
    def point_abs(self):
        return np.sqrt(self.x**2 + self.y**2)

    @B.dask_property
    def some_property(self):
        return "this is a non-dask property"

    @some_property.dask
    def some_property_dask(self, array):
        return f"this is a dask property ({type(array).__name__})"

    @B.dask_property(no_dispatch=True)
    def some_property_both(self):
        return "this is a dask AND non-dask property"

    @B.dask_method
    def some_method(self):
        return None

    @some_method.dask
    def some_method_dask(self, array):
        return array

    @B.dask_method(no_dispatch=True)
    def some_method_both(self):
        return "NO DISPATCH!"


POINTS1 = [
    [(1.0, 1.1), (2.0, 2.2), (3.0, 3.3)],
    [],
    [(4.0, 4.4), (5.0, 5.5)],
]
POINTS2 = [
    [(0.9, 1.0), (2.0, 2.2), (2.9, 3.0)],
    [],
    [(3.9, 4.0), (5.0, 5.5)],
]


@pytest.fixture(scope="module")
def pts(spark):
    rows = [
        (i, [{"x": x, "y": y} for x, y in p1], [{"x": x, "y": y} for x, y in p2])
        for i, (p1, p2) in enumerate(zip(POINTS1, POINTS2))
    ]
    return spark.createDataFrame(
        rows,
        "i long, points array<struct<x double, y double>>, "
        "points2 array<struct<x double, y double>>",
    )


def _vals(df, col) -> list:
    return [r[0] for r in df.orderBy("i").select(col).collect()]


def _flat(nested) -> list:
    return [v for sub in nested for v in sub]


def named(col: str) -> NestedArray:
    return B.with_name(F.col(col), "Point", behavior=behaviors)


def test_distance_behavior(pts) -> None:
    daa1, daa2 = named("points"), named("points2")
    got = _vals(pts.select("i", daa1.distance(daa2).alias("d")), "d")
    want = [
        [
            math.sqrt((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2)
            for a, b in zip(p1, p2)
        ]
        for p1, p2 in zip(POINTS1, POINTS2)
    ]
    assert _flat(got) == pytest.approx(_flat(want))


def test_ufunc_behavior(pts) -> None:
    got = _vals(pts.select("i", np.abs(named("points")).alias("m")), "m")
    want = [[math.hypot(x, y) for x, y in p] for p in POINTS1]
    assert _flat(got) == pytest.approx(_flat(want))


def test_property_method_behavior(pts) -> None:
    daa = named("points")
    got = _vals(pts.select("i", daa.x2.alias("v")), "v")
    assert _flat(got) == pytest.approx(_flat([[x * x for x, _ in p] for p in POINTS1]))

    assert daa.behavior == behaviors

    # concrete mixin instances use the eager bodies; the lazy array
    # routes through the .dask variants (reference parity, with the
    # lazy type name being this engine's wrapper)
    concrete = Point()
    assert concrete.some_property == "this is a non-dask property"
    assert daa.some_property == "this is a dask property (NestedArray)"

    assert daa.some_method() is daa
    assert concrete.some_method() is None

    assert (
        daa.some_property_both
        == concrete.some_property_both
        == "this is a dask AND non-dask property"
    )
    assert daa.some_method_both() == concrete.some_method_both() == "NO DISPATCH!"


def test_nonexistent_behavior(pts) -> None:
    # unnamed array: 'distance' falls through to field access (lazy),
    # so CALLING it fails — the engine's analogue of the reference's
    # AttributeError("distance not in fields")
    plain = NestedArray(F.col("points"))
    with pytest.raises(TypeError):
        plain.distance(named("points2"))
    # named but attribute absent from the mixin: also field fallback
    assert isinstance(named("points").nope, NestedArray)


def test_behavior_from_parameters_roundtrip(pts, tmp_path) -> None:
    # storage half (schema metadata, parquet-transported) rehydrates
    # the dispatch half
    tagged = S.with_name(pts, "points", "Point")
    path = str(tmp_path / "pts.parquet")
    tagged.write.mode("overwrite").parquet(path)
    back = tagged.sparkSession.read.parquet(path)
    assert S.parameters(back, "points")["__record__"] == "Point"
    daa = B.behavior_from_parameters(back, "points", behaviors)
    got = _vals(back.select("i", daa.x2.alias("v")), "v")
    assert _flat(got) == pytest.approx(_flat([[x * x for x, _ in p] for p in POINTS1]))


def test_plan_is_jvm_side(pts) -> None:
    # the behavior method is driver-side sugar: the resulting plan is
    # one Project over HOF expressions, no Python evaluation
    df = pts.select(named("points").distance(named("points2")).alias("d"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
