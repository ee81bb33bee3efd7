from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    # r15 (verdict item 2 — the driver's pytest window): the suite
    # runs KB-scale data (sf0.001) through the production session
    # builder, where test wall is dominated by per-shuffle fixed cost,
    # and this sandbox's block device intermittently makes tiny
    # shuffle-file writes cost seconds (measured: 132s of shuffle
    # write time for 4.4 MB of payload; the same suite read 24min and
    # 54min on different days with identical code). Two test-harness-
    # only mitigations, neither touching the bench/driver session:
    # - shuffle files on tmpfs (spark.local.dir via the env hook) so
    #   suite wall stops depending on the device's mood;
    # - 8 shuffle partitions (guide §2.2: KB-scale shuffles at 64
    #   partitions are pure per-task overhead; every test is
    #   partitioning-invariant by the determinism contract).
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/dwax-test-spark")
    from dask_awkward_sandbox_spark.session import get_spark

    s = get_spark("dwax-tests")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s


@pytest.fixture(scope="session")
def sf(request):
    return "/root/testdata/sf0.001"
