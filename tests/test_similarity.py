"""ANN quality gates: the approximate indexes (hyperplane LSH, IVF)
must recover a healthy fraction of the exact brute-force neighbors.
Both are deterministic (fixed planes / init), so the recall floor is a
stable regression bound, not a flaky statistical one."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _truth_and_approx(spark, approx_fn):
    from dask_awkward_sandbox_spark.functions import similarity
    from dask_awkward_sandbox_spark.plans.common import read

    e = read(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    truth = {
        (r["q_id"], r["nb_id"])
        for r in similarity.brute_force_topk(e, q, k=5).collect()
    }
    approx = {(r["q_id"], r["nb_id"]) for r in approx_fn(e, q).collect()}
    return truth, approx


def test_ivf_recall(spark):
    from dask_awkward_sandbox_spark.functions import similarity

    truth, approx = _truth_and_approx(
        spark,
        lambda e, q: similarity.ivf_topk(e, q, k=5, nlist=16, nprobe=4, iters=3),
    )
    assert truth, "no ground-truth neighbors"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_lsh_recall(spark):
    from dask_awkward_sandbox_spark.functions import similarity

    truth, approx = _truth_and_approx(
        spark,
        lambda e, q: similarity.lsh_bucket_topk(e, q, dim=64, k=5, planes=3),
    )
    assert truth, "no ground-truth neighbors"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"LSH recall {recall:.2f} below floor"


def test_ivf_cost_bound(spark):
    """Every query probes exactly nprobe of nlist posting lists — the
    scan-fraction contract that makes IVF the scale path."""
    from dask_awkward_sandbox_spark.functions import similarity
    from dask_awkward_sandbox_spark.plans.common import read

    e = read(spark, SF, "embeddings")
    cents = similarity.kmeans_train(e, "embedding", "vec_id", nlist=8, iters=2)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    assigned = e.select(
        similarity.assign_nearest_centroid(
            similarity.as_double(F.col("embedding")), cents
        ).alias("list_id")
    )
    n_lists = assigned.select("list_id").distinct().count()
    assert 1 < n_lists <= 8


def test_ivf_indexed_probe_matches_and_prunes(spark):
    """Materialize-and-reuse IVF: the indexed probe must (a) return
    exactly what the inline ivf_topk returns for the same quantizer,
    (b) partition-prune the corpus scan to the probed lists
    (PartitionFilters on list_id), and (c) never shuffle the corpus
    side (queries broadcast — no Exchange between scan and join)."""
    import os

    from dask_awkward_sandbox_spark.functions import similarity
    from dask_awkward_sandbox_spark.plans.common import read

    e = read(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    path = os.path.join("/root/repo/.scratch", "ivf_index_test")
    cents = similarity.ivf_write_index(e, path, nlist=16, iters=3)

    probe = similarity.ivf_probe_indexed(spark, path, q, cents, k=5, nprobe=4)
    inline = similarity.ivf_topk(e, q, k=5, nlist=16, nprobe=4, iters=3)
    got = {(r["q_id"], r["nb_id"]) for r in probe.collect()}
    want = {(r["q_id"], r["nb_id"]) for r in inline.collect()}
    assert got == want and got

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # corpus side must go scan -> join without an Exchange
    assert "SortMergeJoin" not in plan


def test_adaptive_planes_formula():
    """Occupancy-constant plane count (r5): floors at min_planes,
    grows ceil(log2(n/target)), matches the SQL-side greatest/ceil
    formula at the boundaries the gate uses (sf0.01/0.1 -> 3,
    sf1 -> 7)."""
    import math

    from dask_awkward_sandbox_spark.functions.similarity import adaptive_planes

    assert adaptive_planes(0) == 3
    assert adaptive_planes(200) == 3       # sf0.01
    assert adaptive_planes(2000) == 3      # sf0.1: ceil(log2(8)) = 3
    assert adaptive_planes(2001) == 4
    assert adaptive_planes(20000) == 7     # sf1: ceil(log2(80)) = 7
    assert adaptive_planes(250 * 1024) == 10  # exact power: log2 exact both engines
    for n in (1, 10, 500, 3000, 123457, 10**7):
        got = adaptive_planes(n)
        assert got >= 3
        if n > 250:
            assert 250 * 2**got >= n > 250 * 2 ** (got - 1) or got == 3
            assert got == max(3, math.ceil(math.log2(n / 250.0)))
