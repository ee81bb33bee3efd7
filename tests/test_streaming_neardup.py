"""Streaming MinHash-LSH near-dup dedup (streaming/neardup.py).

The dedup contract is replayed by a pure-python reference over the
observed micro-batch assignment: a doc is dropped iff a band bucket
pairs it with an earlier KEPT doc (prior batch) or a smaller-id doc
of its own batch, with signature agreement >= min_match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions.dedup import minhash_band_buckets, minhash_signature
from dask_awkward_sandbox_spark.streaming import stream_neardup_dedup

NUM_PERMS, BANDS, MIN_MATCH = 16, 4, 0.75


def _mk_docs():
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")  # 1/13 tokens differ
    uniq = [
        f"document {i} talks about completely distinct topic number {i * 7}"
        for i in range(6)
    ]
    # batch files: ids inside a file, near/exact dups across files
    return [
        [(0, base), (1, uniq[0]), (2, base)],          # 2 dups 0 in-batch
        [(10, near), (11, uniq[1]), (12, uniq[2])],    # 10 near-dups 0 cross-batch
        [(20, base), (21, uniq[3]), (22, near), (23, uniq[4])],
    ]


def _collect_state(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signature(df.select("doc_id", "text"), "text", NUM_PERMS)
    sigs = {
        r["doc_id"]: [r[f"minhash_{i}"] for i in range(NUM_PERMS)]
        for r in sig.collect()
    }
    bks: dict[int, set] = {r["doc_id"]: set() for r in df.collect()}
    for r in minhash_band_buckets(df, "text", "doc_id", NUM_PERMS, BANDS).collect():
        bks[r["doc"]].add((r["band"], r["key"]))
    return sigs, bks


def _reference(batches, sigs, bks):
    """Sequential replay of the documented contract."""
    kept: list[int] = []
    decisions = {}

    def match(a, b):
        if not (bks[a] & bks[b]):
            return False
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        return agree / NUM_PERMS >= MIN_MATCH

    for batch in batches:
        batch = sorted(batch)
        for d in batch:
            earlier = kept + [o for o in batch if o < d]
            dup_of = sorted(o for o in earlier if o != d and match(d, o))
            decisions[d] = dup_of[0] if dup_of else None
        for d in batch:
            if decisions[d] is None:
                kept.append(d)
    return decisions


def test_stream_matches_reference(spark, tmp_path):
    batches = _mk_docs()
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").json(f"{src}/f{i}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/f*")
    )
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    stream_neardup_dedup(
        stream, store, out, str(tmp_path / "ckpt"),
        num_perms=NUM_PERMS, bands=BANDS, min_match=MIN_MATCH,
    )

    dec = spark.read.parquet(out).collect()
    all_rows = [r for b in batches for r in b]
    assert len(dec) == len(all_rows)
    # real micro-batches, not one big one
    assert len({r["batch_id"] for r in dec}) >= 2

    # reference over the OBSERVED batch assignment
    by_batch: dict[int, list[int]] = {}
    for r in dec:
        by_batch.setdefault(r["batch_id"], []).append(r["doc"])
    sigs, bks = _collect_state(spark, all_rows)
    exp = _reference([by_batch[k] for k in sorted(by_batch)], sigs, bks)

    got = {r["doc"]: r["dup_of"] for r in dec}
    assert got == exp
    # the planted shape: at least one in-batch dup and one cross-batch
    dup_docs = {d for d, o in exp.items() if o is not None}
    assert 2 in dup_docs and 10 in dup_docs

    # store holds exactly the kept docs, never the dups
    stored = {r["doc"] for r in spark.read.parquet(store).collect()}
    kept = {d for d, o in exp.items() if o is None}
    # token-less docs would be kept but not stored; none here
    assert stored == kept


def test_empty_first_batch_store_does_not_crash_stream(spark, tmp_path):
    """r7 ADVICE regression: a first batch keeping NO bucketed docs
    (all docs token-less -> empty band buckets) writes a store dir
    holding only _SUCCESS; the next batch's store read must treat it
    as empty instead of crashing on schema inference."""
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)
    # batch 0: token-less docs (punctuation only -> no shingles, no
    # buckets, kept but nothing stored); batch 1: real docs
    b0 = [(0, "..."), (1, "!!!")]
    b1 = [(10, "alpha beta gamma delta epsilon zeta eta theta"),
          (11, "alpha beta gamma delta epsilon zeta eta theta")]
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.json(f"{src}/f{i}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/f*")
    )
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    stream_neardup_dedup(
        stream, store, out, str(tmp_path / "ckpt"),
        num_perms=NUM_PERMS, bands=BANDS, min_match=MIN_MATCH,
    )
    dec = {r["doc"]: r for r in spark.read.parquet(out).collect()}
    assert set(dec) == {0, 1, 10, 11}
    # token-less docs keep (no LSH signal); the in-batch exact pair
    # still dedups in the later batch
    assert not dec[0]["is_dup"] and not dec[1]["is_dup"]
    assert not dec[10]["is_dup"] and dec[11]["is_dup"]
    assert dec[11]["dup_of"] == 10


def test_replay_guard_ignores_own_partial_write(spark, tmp_path):
    """A replayed batch must not see its OWN earlier partial store
    write: plant a stale batch_id=0 store partition containing the
    batch's docs, rerun batch 0 from a fresh checkpoint, and nothing
    may be flagged dup (without the batch_id < current filter every
    doc would match 'itself')."""
    rows = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "one two three four five six seven eight")]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.json(
        f"{src}/f0"
    )
    store, out = str(tmp_path / "store"), str(tmp_path / "out")

    # stale partial write from the "crashed" first attempt
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stale = (
        minhash_band_buckets(df, "text", "doc_id", NUM_PERMS, BANDS)
        .join(
            minhash_signature(df, "text", NUM_PERMS).select(
                F.col("doc_id").alias("doc"),
                F.array(*[f"minhash_{i}" for i in range(NUM_PERMS)]).alias("sig"),
            ),
            "doc",
        )
        .withColumn("batch_id", F.lit(0))
    )
    stale.write.partitionBy("batch_id").parquet(store)

    stream = spark.readStream.schema("doc_id long, text string").json(f"{src}/f*")
    stream_neardup_dedup(
        stream, store, out, str(tmp_path / "ckpt"),
        num_perms=NUM_PERMS, bands=BANDS, min_match=MIN_MATCH,
    )
    dec = spark.read.parquet(out).collect()
    assert len(dec) == 2
    assert all(not r["is_dup"] for r in dec)
    # and the replay REPLACED the stale partition (dynamic overwrite)
    stored = spark.read.parquet(store)
    assert stored.filter(F.col("batch_id") == 0).count() > 0
