"""ROOT/TTree ingestion plumbing (io/root.py).

The decode backend is the deterministic SyntheticNanoBackend (uproot
is not in this container); everything around it — entry-range
planning, the task-per-partition layout, branch pruning, the Arrow
hand-off, composition with jagged operators — is the real code the
uproot backend would run through unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions.multimodal import DecodeUnavailable
from dask_awkward_sandbox_spark.io.root import (
    SyntheticNanoBackend,
    UprootBackend,
    from_root,
    plan_tasks,
)

FILES = {"/fake/dy_a.root": 23, "/fake/dy_b.root": 10, "/fake/empty.root": 0}


@pytest.fixture(scope="module")
def backend():
    return SyntheticNanoBackend(FILES)


def test_plan_tasks_slices_per_file(backend):
    tasks = plan_tasks(sorted(FILES), "Events", backend, step_size=10)
    # 23 -> [0,10),[10,20),[20,23); 10 -> [0,10); empty -> nothing
    assert tasks == [
        ("/fake/dy_a.root", 0, 10),
        ("/fake/dy_a.root", 10, 20),
        ("/fake/dy_a.root", 20, 23),
        ("/fake/dy_b.root", 0, 10),
    ]
    with pytest.raises(ValueError):
        plan_tasks(sorted(FILES), "Events", backend, step_size=0)


def test_from_root_rows_and_partitions(spark, backend):
    df = from_root(spark, sorted(FILES), backend=backend, step_size=10)
    # one task per partition: 4 tasks above
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 33
    assert df.columns == ["event", "nMuon", "Muon_pt", "Muon_eta"]
    # no duplicate/dropped entries across slice boundaries
    assert df.select("event").distinct().count() == 33


def test_branch_pruning_reaches_backend(spark, backend):
    df = from_root(
        spark, "/fake/dy_a.root", branches=["event", "Muon_pt"],
        backend=backend, step_size=100,
    )
    # schema is exactly the requested branches, in request order —
    # the backend only ever saw (and built) those two columns
    assert df.columns == ["event", "Muon_pt"]
    assert df.count() == 23


def test_branch_regex_filter(spark, backend):
    df = from_root(
        spark, "/fake/dy_b.root", branches=r"Muon_.*",
        backend=backend, step_size=100,
    )
    assert df.columns == ["Muon_pt", "Muon_eta"]
    with pytest.raises(ValueError, match="matched nothing"):
        from_root(spark, "/fake/dy_b.root", branches=r"Electron_.*", backend=backend)


def test_values_match_formula_and_jagged_ops_compose(spark, backend):
    df = from_root(spark, sorted(FILES), backend=backend, step_size=7)
    # jagged len == scalar counter branch, via the structure operator
    from dask_awkward_sandbox_spark.operators import structure

    bad = df.filter(structure.num(F.col("Muon_pt")) != F.col("nMuon")).count()
    assert bad == 0
    got = df.agg(
        F.sum(F.aggregate("Muon_pt", F.lit(0.0), lambda a, x: a + x)).alias("s")
    ).collect()[0]["s"]
    exp = sum(
        sum(SyntheticNanoBackend.row(p, i)["Muon_pt"])
        for p, n in FILES.items()
        for i in range(n)
    )
    assert got == pytest.approx(exp, rel=1e-12)


def test_unknown_tree_and_empty_inputs(spark, backend):
    with pytest.raises(KeyError):
        from_root(spark, "/fake/dy_a.root", tree="Muons", backend=backend)
    with pytest.raises(ValueError, match="no entries"):
        from_root(spark, "/fake/empty.root", backend=backend)
    with pytest.raises(ValueError, match="at least one file"):
        from_root(spark, [], backend=backend)


def test_uproot_backend_gated():
    with pytest.raises(DecodeUnavailable, match="uproot"):
        UprootBackend().num_entries("/fake/x.root", "Events")


def test_necessary_branches_traces_downstream(spark, backend):
    """The Catalyst-as-typetracer projection (the reference's
    report_necessary_columns + uproot column projection,
    tests/test_inspect.py:85-95)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    from dask_awkward_sandbox_spark.io.root import necessary_branches

    schema = from_arrow_schema(backend.arrow_schema("/fake/dy_a.root", "Events", None))

    def down(df):
        return df.select(
            "event", F.explode("Muon_pt").alias("pt")
        ).filter(F.col("pt") > 10.0)

    assert necessary_branches(spark, schema, down) == ["event", "Muon_pt"]
    # a plan touching nothing reads nothing
    assert necessary_branches(spark, schema, lambda df: df.select(F.lit(1).alias("x"))) == []


def test_from_root_projected_matches_unprojected(spark, backend):
    from dask_awkward_sandbox_spark.io.root import from_root_projected

    def down(df):
        return (
            df.select(F.explode("Muon_pt").alias("pt"))
            .agg(F.sum("pt").alias("s"), F.count(F.lit(1)).alias("n"))
        )

    got = from_root_projected(
        spark, sorted(FILES), down, backend=backend, step_size=10
    ).collect()[0]
    full = down(
        from_root(spark, sorted(FILES), backend=backend, step_size=10)
    ).collect()[0]
    assert (got["s"], got["n"]) == (full["s"], full["n"])

    # the projection really narrowed the source: a downstream that
    # whines if it sees extra columns proves only Muon_pt arrived
    seen = {}

    def spy(df):
        seen["cols"] = df.columns
        return df.select(F.explode("Muon_pt").alias("pt")).agg(F.sum("pt").alias("s"))

    from_root_projected(
        spark, "/fake/dy_b.root", spy, backend=backend
    ).collect()
    assert seen["cols"] == ["Muon_pt"]


def test_from_root_projected_count_only_keeps_one_branch(spark, backend):
    from dask_awkward_sandbox_spark.io.root import from_root_projected

    n = from_root_projected(
        spark, "/fake/dy_a.root", lambda df: df.select(F.lit(1).alias("one")),
        backend=backend,
    ).count()
    assert n == 23
