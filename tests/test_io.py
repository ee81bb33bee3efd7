"""IO module tests beyond the oracle-checked roundtrips: JSON schema
inference, multiline JSON, JSON-column parsing, custom text
delimiters, from_map."""

from __future__ import annotations

import json
import os

SCRATCH = "/root/repo/.scratch/iotest"


def test_from_json_infers_schema(spark):
    from dask_awkward_sandbox_spark.io import from_json, to_json

    src = spark.createDataFrame(
        [(1, "a", [1, 2]), (2, "b", [])], "id long, s string, v array<long>"
    )
    path = os.path.join(SCRATCH, "infer")
    to_json(src, path)
    back = from_json(spark, path)  # no schema: inference scan
    assert {f.name for f in back.schema.fields} == {"id", "s", "v"}
    assert back.count() == 2


def test_from_json_multiline(spark):
    from dask_awkward_sandbox_spark.io import from_json

    path = os.path.join(SCRATCH, "multiline")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "a.json"), "w") as f:
        json.dump([{"id": 1, "x": 1.5}, {"id": 2, "x": 2.5}], f, indent=2)
    back = from_json(spark, path, schema="id long, x double", line_delimited=False)
    assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_parse_json_column_and_schema_of(spark):
    from pyspark.sql import functions as F

    from dask_awkward_sandbox_spark.io.json import json_schema_of, parse_json_column

    sample = '{"k": 1, "tags": ["a"]}'
    ddl = json_schema_of(spark, sample)
    assert "k" in ddl and "tags" in ddl
    df = spark.createDataFrame([(sample,), ('{"k": 7, "tags": []}',)], "js string")
    out = df.select(parse_json_column(F.col("js"), ddl).alias("p")).select("p.k")
    assert sorted(r["k"] for r in out.collect()) == [1, 7]


def test_from_text_custom_delimiter(spark):
    from dask_awkward_sandbox_spark.io.text import from_text

    path = os.path.join(SCRATCH, "delim")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "a.txt"), "w") as f:
        f.write("alpha|beta|gamma")
    got = sorted(r["value"] for r in from_text(spark, path, delimiter="|").collect())
    assert got == ["alpha", "beta", "gamma"]


def test_from_map_unions_lazily(spark):
    from dask_awkward_sandbox_spark.io.io import from_map

    def builder(s, n):
        return s.range(n).withColumnRenamed("id", "x")

    out = from_map(builder, [3, 4], spark)
    assert out.count() == 7
    assert out.columns == ["x"]
