"""Edge cases the synthetic corpus doesn't contain: token-less
documents (empty/whitespace text). Cluster dedup must emit them as
singleton clusters (totality — every input doc gets a cluster) and
simhash blocking must not pair them (a degenerate simhash of 0 would
otherwise pair every empty doc with every other at hamming 0)."""

from __future__ import annotations

from pyspark.sql import functions as F

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, ""),
    (3, "   "),
    (4, "completely different text about spark engines"),
    (5, None),
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_clusters_include_tokenless_singletons(spark):
    from dask_awkward_sandbox_spark.functions import dedup

    out = dedup.minhash_dedup_clusters(_docs(spark), "text", "doc_id", 8, 4)
    got = {r["doc"]: r["cluster"] for r in out.collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}, "every doc must receive a cluster"
    assert got[0] == got[1] == 0, "exact dups share the min-id cluster"
    assert got[2] == 2 and got[3] == 3 and got[5] == 5, "token-less are singletons"
    assert got[4] == 4


def test_simhash_neardups_exclude_tokenless(spark):
    from dask_awkward_sandbox_spark.functions import dedup

    pairs = dedup.simhash_neardups(_docs(spark), "text", "doc_id", max_hamming=3)
    ids = {i for r in pairs.collect() for i in (r["id_a"], r["id_b"])}
    assert 2 not in ids and 3 not in ids and 5 not in ids
    assert (0, 1) in {(r["id_a"], r["id_b"]) for r in pairs.collect()}


def test_sample_factor_zero_rejected(spark):
    import pytest

    from dask_awkward_sandbox_spark import inspect as ins

    with pytest.raises(ValueError):
        ins.sample(spark.range(10), factor=0)


def test_salted_join_rejects_outer(spark):
    import pytest

    from dask_awkward_sandbox_spark.operators.joins import salted_join

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full")
