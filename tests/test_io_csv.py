"""CSV / ORC sources and sinks: roundtrips, schema-skips-inference,
nested-column guard, and ORC pushdown parity with parquet."""

from __future__ import annotations

import os

SF_DIR = os.environ.get("DWAX_TEST_SF", "/root/testdata/sf0.001")


def test_csv_roundtrip_with_schema(spark, tmp_path):
    from dask_awkward_sandbox_spark.io import from_csv, to_csv

    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    p = str(tmp_path / "nation_csv")
    to_csv(nat, p)
    back = from_csv(
        spark, p, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    # nullability flags are a per-source storage artifact; names+types
    # are the contract
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in nat.schema
    ]
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nat.collect()))


def test_csv_rejects_nested(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from dask_awkward_sandbox_spark.io import to_csv

    df = spark.range(3).select("id", F.array(F.lit(1)).alias("xs"))
    with pytest.raises(ValueError, match="xs"):
        to_csv(df, str(tmp_path / "bad"))


def test_orc_roundtrip_nested_and_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from dask_awkward_sandbox_spark.io import from_orc, to_orc

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(500)
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_linenumber", "l_quantity")).alias("items")
    )
    p = str(tmp_path / "nested_orc")
    to_orc(nested, p)
    back = from_orc(spark, p)
    assert back.schema.simpleString() == nested.schema.simpleString()
    assert back.count() == nested.count()
    # pruning + pushdown reach the ORC scan like parquet
    pruned = from_orc(spark, p, columns=["l_orderkey"]).filter(
        F.col("l_orderkey") > 100
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey), GreaterThan(l_orderkey,100)]" in plan
    assert "items" not in plan.split("ReadSchema")[1][:120]


def test_avro_clear_error_without_jar(spark, tmp_path):
    import pytest

    from dask_awkward_sandbox_spark.io import to_avro

    df = spark.range(3)
    try:
        to_avro(df, str(tmp_path / "avro_out"))
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
    except Exception:
        pytest.fail("expected RuntimeError with guidance, or success")
