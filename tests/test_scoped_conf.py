"""r14 optimization round: the generic scoped-conf helper used by the
q_small_sources lake legs (shuffle partitions scoped to the gate
table's bucket count) must restore the previous session value — set
OR unset — on both clean exit and exception."""

import pytest

from dask_awkward_sandbox_spark.plans.common import scoped_conf

KEY = "spark.sql.shuffle.partitions"


def test_scoped_conf_restores_previous_value(spark):
    prev = spark.conf.get(KEY)
    with scoped_conf(spark, KEY, "7"):
        assert spark.conf.get(KEY) == "7"
    assert spark.conf.get(KEY) == prev


def test_scoped_conf_restores_on_exception(spark):
    prev = spark.conf.get(KEY)
    with pytest.raises(RuntimeError):
        with scoped_conf(spark, KEY, "7"):
            raise RuntimeError("boom")
    assert spark.conf.get(KEY) == prev


def test_scoped_conf_unsets_when_previously_unset(spark):
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    # ensure unset going in
    try:
        spark.conf.unset(key)
    except Exception:
        pass
    with scoped_conf(spark, key, "true"):
        assert spark.conf.get(key) == "true"
    # restored to the session default (the conf's default value)
    assert spark.conf.get(key) == "false"
