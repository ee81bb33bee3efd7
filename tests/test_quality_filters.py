"""Corpus-curation filter tests — hand-computed Gopher-style
repetition signals, PII redaction, contamination, and the
deterministic stratified sampler."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions import quality_filters as qf


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 4 lines, "dup" appears twice (2/4 lines, 6/16 chars)
        (0, "dup\nunique one\ndup\nother"),
        # no repetition
        (1, "all lines differ\nhere"),
        # heavy n-gram repetition: "a b" 2-gram dominates
        (2, "a b a b a b c"),
        (3, ""),
        (4, "contact me at jo.doe+x@mail.co or 10.0.0.1 call 555-123-4567 now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df, expr, doc_id):
    return df.filter(F.col("doc_id") == doc_id).select(expr.alias("o")).first()["o"]


def test_dup_line_fractions(docs):
    assert _one(docs, qf.dup_line_fraction(F.col("text")), 0) == pytest.approx(2 / 4)
    # dup chars: "dup" twice = 6 of 3+10+3+5=21 line chars
    assert _one(docs, qf.dup_line_char_fraction(F.col("text")), 0) == pytest.approx(6 / 21)
    assert _one(docs, qf.dup_line_fraction(F.col("text")), 1) == 0.0
    assert _one(docs, qf.dup_line_fraction(F.col("text")), 3) == 0.0


def test_ngrams_and_top_fraction(docs):
    grams = _one(docs, qf.ngrams(F.split(F.lit("w x y z"), " "), 2), 0)
    assert grams == ["w x", "x y", "y z"]
    assert _one(docs, qf.ngrams(F.split(F.lit("w"), " "), 3), 0) == []
    # doc 2: tokens a b a b a b c; 2-grams: "a b" x3, "b a" x2, "b c" x1
    # top = "a b" count 3, len 3; text len 13
    got = _one(docs, qf.top_ngram_char_fraction(F.col("text"), 2), 2)
    assert got == pytest.approx(3 * 3 / 13)
    assert _one(docs, qf.top_ngram_char_fraction(F.col("text"), 2), 3) == 0.0


def test_dup_ngram_fraction(docs):
    # doc 2 2-grams: dup occurrences = "a b"(3) + "b a"(2) = 5 grams x 3 chars
    got = _one(docs, qf.dup_ngram_char_fraction(F.col("text"), 2), 2)
    assert got == pytest.approx(15 / 13)
    assert _one(docs, qf.dup_ngram_char_fraction(F.col("text"), 2), 1) == 0.0


def test_pii(docs):
    c = _one(docs, qf.pii_counts(F.col("text")), 4)
    assert (c["emails"], c["ips"], c["phones"]) == (1, 1, 1)
    red = _one(docs, qf.redact_pii(F.col("text")), 4)
    assert red == "contact me at <EMAIL> or <IP> call <PHONE> now"
    assert _one(docs, qf.pii_counts(F.col("text")), 1)["emails"] == 0


def test_contamination(spark, docs):
    corpus = spark.createDataFrame(
        [
            (10, "one two three four five six seven eight nine"),
            (11, "totally different words in this document here friend"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "zzz one two three four five six seven eight yyy")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["contam_ngrams"]
        for r in qf.ngram_contamination(corpus, bench, n=8).collect()
    }
    # doc 10 shares the 8-gram "one two three four five six seven eight"
    assert out == {10: 1, 11: 0}
    plan = qf.ngram_contamination(corpus, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_stratified_token_sample(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr", "tok " * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = qf.stratified_token_sample(df, "lang", budget_tokens=500)
    got = out.collect()
    assert len(got) == 200
    # per-stratum tokens = 100 docs x 10 = 1000; share = 250 -> rate 25%
    rates = {r["stratum"]: r["rate_ppm"] for r in got}
    assert rates == {"en": 250_000, "fr": 250_000}
    # keep decision is the md5 hash replayed here exactly
    for r in got:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:14], 16) % qf.SAMPLE_PPM
        assert r["keep"] == (h < r["rate_ppm"])
    kept = sum(1 for r in got if r["keep"])
    assert 20 < kept < 80  # ~25% of 200, loose band


def test_budget_overflow_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "en", "d e")], "doc_id long, lang string, text string"
    )
    out = qf.stratified_token_sample(df, "lang", budget_tokens=10**9).collect()
    assert all(r["keep"] for r in out)
    assert all(r["rate_ppm"] == qf.SAMPLE_PPM for r in out)


def test_chunk_documents(spark):
    """Token-window chunking with overlap: windows cover [i*step,
    i*step+max); short docs one chunk; empty docs survive as one
    empty chunk; overlap repeats the tail tokens."""
    from dask_awkward_sandbox_spark.functions.quality_filters import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),       # 7 tokens
            (2, "x y"),                  # short
            (3, ""),                     # empty
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, max_tokens=3, overlap=1).collect()
    }
    # step=2: starts 0,2,4,6 for 7 tokens
    assert got[(1, 0)] == (3, "a b c")
    assert got[(1, 1)] == (3, "c d e")
    assert got[(1, 2)] == (3, "e f g")
    assert got[(1, 3)] == (1, "g")
    assert got[(2, 0)] == (2, "x y")
    assert got[(3, 0)] == (0, "")
    assert len(got) == 6
    # no overlap: disjoint cover
    got2 = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in chunk_documents(df, max_tokens=4).collect()
    }
    assert got2[(1, 0)] == "a b c d" and got2[(1, 1)] == "e f g"
    # reassembling no-overlap chunks recovers the token stream
    assert " ".join([got2[(1, 0)], got2[(1, 1)]]).split() == "a b c d e f g".split()
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents(df, max_tokens=3, overlap=3)


def test_pack_chunks(spark):
    """Greedy packing: budget respected (except single oversized
    chunks), offsets are within-example prefix sums, deterministic,
    and every chunk appears exactly once."""
    from dask_awkward_sandbox_spark.functions.quality_filters import (
        chunk_documents,
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range((i * 37) % 90 + 1))) for i in range(40)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, max_tokens=32)
    packed = pack_chunks(chunks, max_tokens=64, shards=4).collect()
    assert len(packed) == chunks.count()

    by_seq: dict = {}
    for r in packed:
        by_seq.setdefault(r["seq_id"], []).append(r)
    for seq, rows in by_seq.items():
        rows.sort(key=lambda r: r["seq_offset"])
        total, off = 0, 0
        for r in rows:
            assert r["seq_offset"] == off
            off += r["n_chunk_tokens"]
            total += r["n_chunk_tokens"]
        assert total <= 64 or len(rows) == 1
    # packing actually packs: fewer examples than chunks
    assert len(by_seq) < len(packed)

    again = pack_chunks(chunks, max_tokens=64, shards=4).collect()
    key = lambda r: (r["doc_id"], r["chunk_idx"])  # noqa: E731
    assert sorted(packed, key=key) == sorted(again, key=key)


def test_deterministic_shuffle(spark):
    """Same (id, seed) -> same global order, independent of input
    partitioning; different seed -> different order; no rows lost."""
    from dask_awkward_sandbox_spark.functions.quality_filters import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = [r["doc_id"] for r in deterministic_shuffle(df, seed=7, shards=4).collect()]
    b = [
        r["doc_id"]
        for r in deterministic_shuffle(df.repartition(13), seed=7, shards=4).collect()
    ]
    c = [r["doc_id"] for r in deterministic_shuffle(df, seed=8, shards=4).collect()]
    assert a == b                       # partitioning-independent
    assert sorted(a) == list(range(500))  # total
    assert a != c                       # epoch reshuffle
    assert a != list(range(500))        # actually shuffled


def test_pack_chunks_greedy_maximality(spark):
    """Within a shard, consecutive examples cannot be merged: the
    example boundary only falls where the next chunk would overflow —
    the greedy contract that bounds padding waste."""
    from dask_awkward_sandbox_spark.functions.quality_filters import (
        chunk_documents,
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [(i, " ".join("w" for _ in range((i * 13) % 50 + 1))) for i in range(60)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, max_tokens=30)
    rows = pack_chunks(chunks, max_tokens=48, shards=3).collect()
    per_shard: dict = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in per_shard.values():
        shard_rows.sort(key=lambda r: (r["seq_id"], r["seq_offset"]))
        seqs: dict = {}
        for r in shard_rows:
            seqs.setdefault(r["seq_id"], []).append(r)
        ordered = sorted(seqs)
        for a, b in zip(ordered, ordered[1:]):
            total_a = sum(r["n_chunk_tokens"] for r in seqs[a])
            first_b = seqs[b][0]["n_chunk_tokens"]
            assert total_a + first_b > 48, "mergeable adjacent examples"


# ---------------------------------------------------------------------------
# target-weight mixture planning
# ---------------------------------------------------------------------------


def test_plan_mixture_math(spark):
    # three domains, token counts 10/6/2 per doc — avail 100/60/20;
    # weights 2:1:1 -> T = min(100/2, 60/1, 20/1) = 20
    # rates: a: 2*20/100=0.4, b: 1*20/60=1/3, c: 20/20=1.0
    rows = []
    for i in range(10):
        rows += [(i, "a", "w " * 10), (100 + i, "b", "w " * 6),
                 (200 + i, "c", "w " * 2)]
    docs = spark.createDataFrame(rows, "doc_id long, dom string, text string")
    plan = {r["domain"]: r for r in qf.plan_mixture(
        docs, "dom", {"a": 2.0, "b": 1.0, "c": 1.0}).collect()}
    assert plan["a"]["avail_tokens"] == 100
    assert plan["a"]["rate_ppm"] == 400_000
    assert plan["b"]["rate_ppm"] == 333_333  # floor(1/3 * 1e6)
    assert plan["c"]["rate_ppm"] == 1_000_000  # binding domain keeps all


def test_plan_mixture_unknown_domain_drops(spark):
    docs = spark.createDataFrame(
        [(0, "a", "x y z"), (1, "junk", "x y z")],
        "doc_id long, dom string, text string",
    )
    plan = qf.plan_mixture(docs, "dom", {"a": 1.0})
    rates = {r["domain"]: r["rate_ppm"] for r in plan.collect()}
    assert rates == {"a": 1_000_000, "junk": 0}
    out = qf.apply_mixture(docs, plan, "dom")
    kept = {r["doc_id"] for r in out.filter("keep").collect()}
    assert kept == {0}


def test_apply_mixture_deterministic_and_salted(spark):
    docs = spark.createDataFrame(
        [(i, "a", "w " * 5) for i in range(400)],
        "doc_id long, dom string, text string",
    )
    # force a partial rate by demanding domain 'a' contribute only
    # half its weight vs a phantom... simpler: two domains, a huge
    rows = [(i, "a", "w " * 5) for i in range(400)]
    rows += [(1000 + i, "b", "w " * 5) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, dom string, text string")
    plan = qf.plan_mixture(docs, "dom", {"a": 1.0, "b": 1.0})
    # b binds (equal weights, b has fewer tokens): a's rate = 25%
    out = qf.apply_mixture(docs, plan, "dom")
    k1 = {r["doc_id"]: r["keep"] for r in out.collect()}
    k2 = {r["doc_id"]: r["keep"] for r in
          qf.apply_mixture(docs.repartition(7), plan, "dom").collect()}
    assert k1 == k2  # partition-independent
    frac = sum(k1[i] for i in range(400)) / 400
    assert 0.17 < frac < 0.33  # ~25% of a kept
    # salt decorrelates from the stratified sampler's unsalted hash
    strat = {r["doc_id"]: r["keep"] for r in qf.stratified_token_sample(
        docs, "dom", budget_tokens=1250).collect()}
    assert any(k1[i] != strat[i] for i in k1)


def test_apply_mixture_plan_shape(spark):
    docs = spark.createDataFrame(
        [(i, "a", "w") for i in range(50)],
        "doc_id long, dom string, text string",
    )
    plan = qf.plan_mixture(docs, "dom", {"a": 1.0})
    out = qf.apply_mixture(docs, plan, "dom")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p and "CartesianProduct" not in p


def test_plan_mixture_zero_avail_domain(spark):
    """A weighted domain with zero available tokens cannot supply any
    share: it must be EXCLUDED from the solve (rate 0) instead of
    forcing T=0 for everyone or tripping ANSI division-by-zero."""
    docs = spark.createDataFrame(
        [(0, "a", "x y z"), (1, "b", "   "), (2, "a", "p q")],
        "doc_id long, dom string, text string",
    )
    plan = {r["domain"]: r for r in qf.plan_mixture(
        docs, "dom", {"a": 1.0, "b": 1.0}).collect()}
    assert plan["b"]["avail_tokens"] == 0 and plan["b"]["rate_ppm"] == 0
    assert plan["a"]["rate_ppm"] == 1_000_000  # a binds among suppliers
