"""Getitem dispatch parity — modeled on reference tests/test_getitem.py
(single/multi/layered strings, ints, slices, boolean masks, Ellipsis,
tuples, and the error surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.operators.elementwise import NestedArray
from dask_awkward_sandbox_spark.operators import getitem as G


POINTS = [
    [{"x": 1.0, "y": 1.1}, {"x": 2.0, "y": 2.2}, {"x": 3.0, "y": 3.3}],
    [],
    [{"x": 4.0, "y": 4.4}, {"x": 5.0, "y": 5.5}],
    [{"x": 6.0, "y": 6.6}, {"x": 7.0, "y": 7.7}, {"x": 8.0, "y": 8.8}, {"x": 9.0, "y": 9.9}],
]


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(POINTS)],
        "id long, points array<struct<x: double, y: double>>",
    )


def _vals(df, expr):
    return [r["o"] for r in df.select("id", expr.alias("o")).orderBy("id").collect()]


def test_single_string(pts):
    # reference test_getitem.py:test_single_string
    got = _vals(pts, G.getitem(F.col("points"), "x"))
    assert got == [[e["x"] for e in p] for p in POINTS]


def test_multi_string(pts):
    # reference test_getitem.py:test_multi_string — projection keeps
    # only the named fields
    got = _vals(pts, G.getitem(F.col("points"), ["y", "x"]))
    as_dicts = [[e.asDict() for e in row] for row in got]
    assert as_dicts == [[{"y": e["y"], "x": e["x"]} for e in p] for p in POINTS]
    # field ORDER follows the selection, and only those fields survive
    assert all(not row or list(row[0].asDict().keys()) == ["y", "x"] for row in got)


def test_layered_string(pts):
    # reference test_getitem.py:test_layered_string — a["points"]["x"]
    na = NestedArray(F.col("points"))
    got = _vals(pts, na["x"].col)
    assert got == [[e["x"] for e in p] for p in POINTS]
    # attribute sugar too (reference Array.__getattr__)
    got2 = _vals(pts, na.x.col)
    assert got2 == got


def test_list_with_ints_raise(pts):
    # reference test_getitem.py:test_list_with_ints_raise
    with pytest.raises(RuntimeError, match="Lists containing integers"):
        G.getitem(F.col("points"), [1, 2])


def test_single_int_and_negative(pts):
    xs = G.getitem(F.col("points"), "x")
    first = _vals(pts, G.getitem(xs, 0))
    last = _vals(pts, G.getitem(xs, -1))
    exp_first = [p[0]["x"] if p else None for p in POINTS]
    exp_last = [p[-1]["x"] if p else None for p in POINTS]
    assert first == exp_first
    assert last == exp_last


def test_tuple_int_then_string(pts):
    # a[0, "x"]-style at column level: pick struct then field
    na = NestedArray(F.col("points"), ndim=1)
    got = _vals(pts, na[(0, "x")].col)
    assert got == [p[0]["x"] if p else None for p in POINTS]
    # string first, then int — same thing, field select is axis-free
    got2 = _vals(pts, na[("x", 0)].col)
    assert got2 == got


def test_empty_and_ellipsis_identity(pts):
    na = NestedArray(F.col("points"))
    assert _vals(pts, na[:].col) == _vals(pts, na[...].col) == _vals(
        pts, F.col("points")
    )


def test_slice_semantics(spark):
    # exhaustive Python-slice parity: all 400 (start, stop, step)
    # combos become projected columns of ONE single-row plan — one
    # Spark job instead of 400
    data = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame([(data,)], "a array<double>")
    combos = [
        slice(start, stop, step)
        for start in [None, 0, 1, 2, 3, 5, -1, -2, -4, -7]
        for stop in [None, 0, 2, 3, 5, -1, -3, -7]
        for step in [1, 2, 3, -1, -2]
    ]
    row = df.select(
        *[G.list_slice(F.col("a"), sl).alias(f"c{i}") for i, sl in enumerate(combos)]
    ).first()
    for i, sl in enumerate(combos):
        assert row[f"c{i}"] == data[sl], f"slice({sl.start},{sl.stop},{sl.step})"


def test_slice_null_list_stays_null(spark):
    # option preservation: a NULL list slices to null, not []
    df = spark.createDataFrame([(1, None), (2, [1.0, 2.0, 3.0])], "id long, a array<double>")
    got = {
        r["id"]: (r["g"], r["f"])
        for r in df.select(
            "id",
            G.list_slice(F.col("a"), slice(None, None, -1)).alias("g"),  # general path
            G.list_slice(F.col("a"), slice(1, None)).alias("f"),  # fast path
        ).collect()
    }
    assert got[1] == (None, None)
    assert got[2] == ([3.0, 2.0, 1.0], [2.0, 3.0])


def test_slice_on_jagged(pts):
    xs = G.getitem(F.col("points"), "x")
    got = _vals(pts, G.getitem(xs, slice(1, None, 2)))
    assert got == [[e["x"] for e in p][1::2] for p in POINTS]
    got_rev = _vals(pts, G.getitem(xs, slice(None, None, -1)))
    assert got_rev == [[e["x"] for e in p][::-1] for p in POINTS]


def test_boolean_array(pts):
    # reference test_getitem.py:test_boolean_array — a.x[a.x > 2]
    na = NestedArray(F.col("points"))
    x = na["x"]
    got = _vals(pts, x[x > 2.0].col)
    assert got == [[e["x"] for e in p if e["x"] > 2.0] for p in POINTS]


def test_tuple_boolean_raise(pts):
    # reference test_getitem.py:test_tuple_boolean_array_raise
    na = NestedArray(F.col("points"), ndim=1)
    sel = na["x"] > 2.0
    with pytest.raises(NotImplementedError, match="tuple style input boolean"):
        na[(sel, "x")]


def test_ellipsis_3d(spark):
    # reference test_getitem.py:test_firstarg_ellipsis_3d — a[..., 1:3]
    # on a (rows, 5, 5) array: at column level ndim=2, slice lands on
    # the LAST axis
    rows = [[[float(r * 100 + i * 10 + j) for j in range(5)] for i in range(5)] for r in range(4)]
    df = spark.createDataFrame(
        [(k, m) for k, m in enumerate(rows)], "id long, a array<array<double>>"
    )
    na = NestedArray(F.col("a"), ndim=2)
    got = _vals(df, na[..., 1:3].col)
    assert got == [[row[1:3] for row in m] for m in rows]
    got2 = _vals(df, na[..., 0:, 2:4].col)
    assert got2 == [[row[2:4] for row in m[0:]] for m in rows]


def test_ellipsis_2d(spark):
    rows = [[float(i * 10 + j) for j in range(5)] for i in range(9)]
    df = spark.createDataFrame(
        [(k, m) for k, m in enumerate(rows)], "id long, a array<double>"
    )
    na = NestedArray(F.col("a"), ndim=1)
    got = _vals(df, na[..., 1:3].col)
    assert got == [m[1:3] for m in rows]


def test_ellipsis_too_deep(spark):
    # reference test_getitem.py:test_firstarg_ellipsis_bad — more
    # sliced axes than the array has
    na = NestedArray(F.col("a"), ndim=1)
    with pytest.raises(ValueError, match="sliced axes is greater than"):
        na[..., 0:, 1:3]


def test_rows_int_bool_slice(pts):
    one = G.rows(pts, 2).collect()
    assert len(one) == 1 and one[0]["id"] == 2
    neg = G.rows(pts, -1).collect()
    assert len(neg) == 1 and neg[0]["id"] == 3
    filt = G.rows(pts, F.size("points") >= 3)
    assert sorted(r["id"] for r in filt.collect()) == [0, 3]
    sl = G.rows(pts, slice(1, 3))
    assert sl.count() == 2
    with pytest.raises(IndexError):
        G.rows(pts, -99).collect()


def test_iter_raises(pts):
    # reference test_core.py:test_iter — and guards against Python's
    # __getitem__-fallback infinite iteration
    na = NestedArray(F.col("points"))
    with pytest.raises(NotImplementedError, match="Iteration"):
        list(na)


def test_head_partition_local(spark, sf):
    from dask_awkward_sandbox_spark.core import head, npartitions

    df = spark.read.parquet(f"{sf}/nation.parquet")
    rows = head(df, 3)
    assert len(rows) == 3
    lazy = head(df, 3, compute=False)
    assert lazy.count() == 3
    # never more rows than the first partition holds
    if npartitions(df) > 1:
        import dask_awkward_sandbox_spark.core as core

        first = core.partitions(df, 0, 1).count()
        assert len(head(df, 10**6)) == first


def test_setitem(pts):
    # reference test_structure.py:test_setitem — a["points", "z"] =
    # sqrt(x^2 + y^2), element-aligned
    import numpy as np

    na = NestedArray(F.col("points"))
    z = np.sqrt(na["x"] ** 2.0 + na["y"] ** 2.0)
    na["z"] = z
    got = _vals(pts, na["z"].col)
    import math

    exp = [[math.sqrt(e["x"] ** 2 + e["y"] ** 2) for e in p] for p in POINTS]
    for g, e in zip(got, exp):
        assert g == pytest.approx(e)
    # scalar assignment
    na2 = NestedArray(F.col("points"))
    na2["w"] = 7
    assert _vals(pts, na2["w"].col) == [[7] * len(p) for p in POINTS]
    # unsupported value type raises like the reference
    with pytest.raises(NotImplementedError, match="Number"):
        na2["q"] = "hi there"


def test_str_accessor(spark):
    # the dak.str namespace as NestedArray sugar: scalar string fns
    # lifted elementwise over the list
    df = spark.createDataFrame(
        [(1, ["Hello", "WORLD", "abc"])], "id long, w array<string>"
    )
    na = NestedArray(F.col("w"))
    row = df.select(
        na.str.upper().alias("u"),
        na.str.lower().alias("l"),
        na.str.length().alias("n"),
        na.str.starts_with("He").alias("h"),
    ).first()
    assert row["u"] == ["HELLO", "WORLD", "ABC"]
    assert row["l"] == ["hello", "world", "abc"]
    assert row["n"] == [5, 5, 3]
    assert row["h"] == [True, False, False]
    with pytest.raises(AttributeError):
        na.str.not_a_function


def test_nested_array_still_arithmetic(pts):
    # getitem composes with the ufunc surface: (a["x"] * 2)[0]
    na = NestedArray(F.col("points"))
    got = _vals(pts, (na["x"] * 2.0)[0].col)
    assert got == [p[0]["x"] * 2.0 if p else None for p in POINTS]
