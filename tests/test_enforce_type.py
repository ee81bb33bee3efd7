"""enforce_type: whole-frame schema coercion (reference
lib/structure.py:enforce_type -> ak.enforce_type)."""

from __future__ import annotations

from pyspark.sql import types as T


def test_enforce_type_nested(spark):
    from dask_awkward_sandbox_spark.operators.structure import enforce_type

    df = spark.createDataFrame(
        [
            (1, [{"x": 1, "y": "10"}, {"x": 2, "y": "oops"}], "7"),
            (2, [], "not-a-number"),
            (3, None, None),
        ],
        "id long, items array<struct<x: long, y: string>>, v string",
    )
    out = enforce_type(
        df,
        "id int, items array<struct<x: smallint, y: bigint, z: double>>, v bigint, w string",
    )
    # simpleString: nullability flags differ (coercion output can be
    # tighter than the all-nullable DDL default); the type SHAPE must match
    assert out.schema.simpleString() == T.StructType.fromDDL(
        "id int, items array<struct<x: smallint, y: bigint, z: double>>, v bigint, w string"
    ).simpleString()
    rows = {r["id"]: r for r in out.collect()}
    # atomic try_cast: parseable -> value, unparseable -> null option
    assert rows[1]["v"] == 7 and rows[2]["v"] is None and rows[3]["v"] is None
    # struct recursion: y parsed per element, z (new field) all-null
    items = [r.asDict() for r in rows[1]["items"]]
    assert items == [
        {"x": 1, "y": 10, "z": None},
        {"x": 2, "y": None, "z": None},
    ]
    assert rows[2]["items"] == [] and rows[3]["items"] is None
    # new top-level column is all-null with the requested type
    assert all(rows[i]["w"] is None for i in rows)


def test_enforce_type_drops_and_mismatch(spark):
    import pytest

    from dask_awkward_sandbox_spark.operators.structure import enforce_type

    df = spark.createDataFrame([(1, "a", 2.5)], "id long, s string, x double")
    out = enforce_type(df, "id long, x long")
    assert out.columns == ["id", "x"]
    assert out.collect()[0]["x"] == 2  # try_cast double->long truncates toward zero

    with pytest.raises(TypeError):
        enforce_type(df, "id array<long>, s string, x double").collect()


def test_enforce_type_map(spark):
    from dask_awkward_sandbox_spark.operators.structure import enforce_type

    df = spark.createDataFrame(
        [(1, {"a": "10", "b": "x"})], "id long, m map<string, string>"
    )
    out = enforce_type(df, "id long, m map<string, bigint>")
    m = out.collect()[0]["m"]
    assert m == {"a": 10, "b": None}  # unparseable value -> null option


def test_enforce_type_preserves_missing(spark):
    """A NULL struct (or null array element) must stay null — not be
    materialized into a present all-null-fields record."""
    from dask_awkward_sandbox_spark.operators.structure import enforce_type

    df = spark.createDataFrame(
        [(1, {"x": 2}, [{"x": 1}, None]), (2, None, None)],
        "id long, s struct<x: long>, a array<struct<x: long>>",
    )
    out = enforce_type(df, "id long, s struct<x: int, z: double>, a array<struct<x: int>>")
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2]["s"] is None and rows[2]["a"] is None
    assert rows[1]["s"].asDict() == {"x": 2, "z": None}
    assert rows[1]["a"][0].asDict() == {"x": 1}
    assert rows[1]["a"][1] is None
