"""Hypertable rollup cascade: every coarser grain derived from the
finer ROLLUP must equal the same grain computed directly from raw
data — lossless re-aggregation is the whole contract — and the raw
table must be scanned exactly once per cascade."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("DWAX_TEST_SF", "/root/testdata/sf0.01")


def _events(spark):
    from dask_awkward_sandbox_spark.plans.common import read

    return read(spark, SF_DIR, "events")


def _measures():
    return {
        "sum_value_c": F.sum(F.round(F.col("value") * 100).cast("long")),
        "min_value_c": F.min(F.round(F.col("value") * 100).cast("long")),
        "max_value_c": F.max(F.round(F.col("value") * 100).cast("long")),
    }


def _canon(df):
    rows = [tuple(r) for r in df.select(sorted(df.columns)).collect()]
    return sorted(rows, key=repr)


def test_cascade_equals_direct_at_every_grain(spark):
    from dask_awkward_sandbox_spark.functions import rollup as ru

    ev = _events(spark)
    cascade = ru.rollup_cascade(
        ev, "ts", ["hour", "day", "month"], _measures(), group_by=["event_type"]
    )
    for grain in ("hour", "day", "month"):
        direct = ru.rollup_once(ev, "ts", grain, _measures(), group_by=["event_type"])
        assert _canon(cascade[grain]) == _canon(direct), grain


def test_cascade_hll_distinct_matches_direct_sketch(spark):
    """Sketches merged up the cascade must equal the direct
    whole-grain sketch estimate (same registers, deterministic
    merge), and land within HLL error of the exact count."""
    from dask_awkward_sandbox_spark.functions import rollup as ru

    ev = _events(spark)
    cascade = ru.rollup_cascade(
        ev, "ts", ["day", "month"], _measures(), distinct_cols=["user_id"], lg_k=14
    )
    merged = {
        r["bucket"]: r["approx_distinct_user_id"]
        for r in ru.sketch_estimate(cascade["month"], "user_id").collect()
    }
    direct_sketch = ru.rollup_once(
        ev, "ts", "month", _measures(), distinct_cols=["user_id"], lg_k=14
    )
    direct = {
        r["bucket"]: r["approx_distinct_user_id"]
        for r in ru.sketch_estimate(direct_sketch, "user_id").collect()
    }
    assert merged == direct
    exact = {
        r["bucket"]: r["n"]
        for r in ev.groupBy(F.date_trunc("month", "ts").alias("bucket"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for b, n in exact.items():
        assert abs(merged[b] - n) <= max(2, 0.05 * n), (b, merged[b], n)


def test_cascade_scans_raw_once(spark):
    from dask_awkward_sandbox_spark.functions import rollup as ru

    ev = _events(spark)
    cascade = ru.rollup_cascade(ev, "ts", ["hour", "day", "month"], _measures())
    plan = cascade["month"]._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_bad_measure_name_rejected_before_scan(spark):
    import pytest

    from dask_awkward_sandbox_spark.functions import rollup as ru

    with pytest.raises(ValueError, match="re-aggregation rule"):
        ru.rollup_cascade(
            _events(spark), "ts", ["day", "month"],
            {"avg_value": F.avg("value")},
        )


def test_week_rejected_as_intermediate_grain(spark):
    """Calendar weeks straddle month/quarter/year boundaries, so a
    cascade deriving a coarser grain FROM a week rollup would assign
    whole cross-boundary weeks to their Monday's month — rejected
    before any scan (r6, ADVICE). Week as the FINAL grain is fine."""
    import pytest

    from dask_awkward_sandbox_spark.functions import rollup as ru

    with pytest.raises(ValueError, match="FINAL grain"):
        ru.rollup_cascade(
            _events(spark), "ts", ["day", "week", "month"], _measures()
        )
    out = ru.rollup_cascade(_events(spark), "ts", ["day", "week"], _measures())
    assert set(out) == {"day", "week"}


def test_week_final_grain_equals_direct(spark):
    """['day','week'] cascade's week rollup == week computed directly
    from raw — day buckets DO nest losslessly into ISO weeks."""
    from dask_awkward_sandbox_spark.functions import rollup as ru

    cascade = ru.rollup_cascade(_events(spark), "ts", ["day", "week"], _measures())
    direct = ru.rollup_once(_events(spark), "ts", "week", _measures())
    assert _canon(cascade["week"]) == _canon(direct)
