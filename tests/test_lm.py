"""Bigram-LM perplexity (functions/lm.py): exact counts vs a
hand-rolled reference model, held-out scoring with unseen pairs and
OOV contexts, vocabulary-cutoff mapping, the filter contract, and the
broadcast-mapping plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions import lm

SF = "/root/testdata/sf0.001"


def _py_model(texts, vocab_size):
    """Reference implementation: identical tokenization, cutoff,
    mapping, counts."""
    docs = [t.split() for t in texts]
    uni_raw = {}
    for ts in docs:
        for w in ts:
            uni_raw[w] = uni_raw.get(w, 0) + 1
    vocab = {
        w for w, _ in sorted(uni_raw.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    }
    m = lambda w: w if w in vocab else lm.UNK
    uni, bi = {}, {}
    for w, c in uni_raw.items():
        uni[m(w)] = uni.get(m(w), 0) + c
    for ts in docs:
        for a, b in zip(ts, ts[1:]):
            bi[(m(a), m(b))] = bi.get((m(a), m(b)), 0) + 1
    return vocab, uni, bi, len(vocab) + 1


def _py_score(ts, vocab, uni, bi, vn):
    m = lambda w: w if w in vocab else lm.UNK
    pairs = [(m(a), m(b)) for a, b in zip(ts, ts[1:])]
    if not pairs:
        return None
    slp = sum(
        math.log(bi.get(p, 0) + 1) - math.log(uni.get(p[0], 0) + vn)
        for p in pairs
    )
    return (
        len(pairs),
        sum(bi.get(p, 0) for p in pairs),
        round(slp / len(pairs), 6),
        round(math.exp(-slp / len(pairs)), 3),
    )


TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "the dog ran",
    "zzq",                      # single token: no pairs
    "",                         # no tokens at all
    "cat the on sat mat the",   # same words, scrambled order
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_exact_vs_reference(spark, docs):
    vocab, uni, bi, vn = _py_model(TEXTS, 4096)
    model = lm.lm_train(docs, vocab_size=4096)
    assert model.vn == vn
    got = {
        r["doc_id"]: r for r in lm.lm_score(docs, model).collect()
    }
    for i, t in enumerate(TEXTS):
        ts = t.split()
        exp = _py_score(ts, vocab, uni, bi, vn)
        r = got[i]
        assert r["n_tokens"] == len(ts)
        if exp is None:
            assert r["n_pairs"] is None and r["avg_logp"] is None
        else:
            assert (r["n_pairs"], r["sum_bi"]) == exp[:2]
            assert r["avg_logp"] == pytest.approx(exp[2], abs=2e-6)
            assert r["ppl"] == pytest.approx(exp[3], abs=2e-3)


def test_vocab_cutoff_maps_unk(spark, docs):
    # vocab_size 3 keeps only the 3 most frequent tokens; everything
    # else scores through <unk>, and the reference model agrees
    vocab, uni, bi, vn = _py_model(TEXTS, 3)
    model = lm.lm_train(docs, vocab_size=3)
    assert {r["w"] for r in model.vocab.collect()} == vocab
    assert model.vn == 4
    got = {r["doc_id"]: r for r in lm.lm_score(docs, model).collect()}
    for i, t in enumerate(TEXTS):
        exp = _py_score(t.split(), vocab, uni, bi, vn)
        if exp is not None:
            assert (got[i]["n_pairs"], got[i]["sum_bi"]) == exp[:2]
            assert got[i]["avg_logp"] == pytest.approx(exp[2], abs=2e-6)


def test_held_out_unseen_pairs(spark, docs):
    vocab, uni, bi, vn = _py_model(TEXTS, 4096)
    model = lm.lm_train(docs, vocab_size=4096)
    held = spark.createDataFrame(
        [
            (100, "mat on dog the"),     # seen tokens, unseen pairs
            (101, "wholly novel words"),  # OOV everywhere -> unk path
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lm.lm_score(held, model).collect()}
    for did, text in [(100, "mat on dog the"), (101, "wholly novel words")]:
        exp = _py_score(text.split(), vocab, uni, bi, vn)
        r = got[did]
        assert (r["n_pairs"], r["sum_bi"]) == exp[:2]
        assert r["avg_logp"] == pytest.approx(exp[2], abs=2e-6)
    # the all-OOV doc is maximally surprising: every pair scores
    # ln(c_bi+1)-ln(c_unk+vn) with c_bi=0 (unk-unk never trained)
    assert got[101]["sum_bi"] == 0


def test_filter_keeps_low_ppl_and_degenerate(spark, docs):
    model = lm.lm_train(docs, vocab_size=4096)
    scored = {r["doc_id"]: r["ppl"] for r in lm.lm_score(docs, model).collect()}
    cut = sorted(p for p in scored.values() if p is not None)[1]
    kept = {
        r["doc_id"]
        for r in lm.perplexity_filter(docs, model, max_ppl=cut).collect()
    }
    expect = {d for d, p in scored.items() if p is None or p <= cut}
    assert kept == expect
    assert 3 in kept and 4 in kept  # pair-less docs pass through


def test_real_corpus_and_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = lm.lm_perplexity(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # vocab/unigram mapping sides
    rows = out.collect()
    assert len(rows) == docs.count()
    ppls = [r["ppl"] for r in rows if r["ppl"] is not None]
    assert ppls and all(p > 0 for p in ppls)


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def test_tf_idf_vs_reference(spark):
    import math

    from dask_awkward_sandbox_spark.functions import text_analysis as ta

    texts = {
        0: "apple banana apple cherry",
        1: "banana cherry cherry date",
        2: "apple elderberry elderberry elderberry",
        3: "",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    n = len(texts)
    tf = {(d, w): t.split().count(w) for d, t in texts.items() for w in set(t.split())}
    df = {}
    for d, t in texts.items():
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    exp = {}
    for d, t in texts.items():
        scores = sorted(
            (
                (-round(tf[(d, w)] * math.log((n + 1) / (df[w] + 1)), 6), w)
                for w in set(t.split())
            )
        )[:2]
        exp[d] = [(w, -s) for s, w in scores]
    got = {}
    for r in ta.tf_idf_top_terms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    for d in texts:
        rows = sorted(got.get(d, []))
        assert [(t, s) for _, t, s in rows] == [
            (w, pytest.approx(s, abs=2e-6)) for w, s in exp[d]
        ]
    assert 3 not in got  # empty doc emits nothing


def test_tf_idf_plan_has_window_group_limit(spark):
    from dask_awkward_sandbox_spark.functions import text_analysis as ta

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        ta.tf_idf_top_terms(docs, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan   # map-side per-doc top-k
    assert "BroadcastHashJoin" in plan  # df table broadcasts onto tf
    assert "CartesianProduct" not in plan


def test_literal_unk_token_in_corpus(spark):
    """A corpus containing the LITERAL token '<unk>' must not produce
    two '<unk>' unigram rows (which would fan out the scoring join):
    the literal occurrences and the OOV mass merge into one count,
    exactly as the reference model's dict merge does."""
    texts = ["<unk> appears here", "<unk> again rare1 rare2", "x <unk>"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    model = lm.lm_train(docs, vocab_size=3)  # '<unk>' (3x) makes the cut
    uni = model.unigrams.collect()
    assert len([r for r in uni if r["w"] == lm.UNK]) == 1
    vocab, pyuni, bi, vn = _py_model(texts, 3)
    assert {r["w"]: r["c"] for r in uni} == pyuni
    got = {r["doc_id"]: r for r in lm.lm_score(docs, model).collect()}
    for i, t in enumerate(texts):
        exp = _py_score(t.split(), vocab, pyuni, bi, vn)
        assert (got[i]["n_pairs"], got[i]["sum_bi"]) == exp[:2]
        assert got[i]["avg_logp"] == pytest.approx(exp[2], abs=2e-6)


def test_perplexity_tokenize_once_persist_parity(spark):
    """r14 optimization: lm_perplexity tokenizes the corpus ONCE into a
    persisted frame (guide §1.2/§5). The persisted and recompute forms
    must be bit-identical (same expression tree, evaluated once vs
    five times), the returned plan must actually read the cache
    (InMemoryRelation), and the module cache must hold at most ONE
    resident frame across invocations."""
    SF = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fast = lm.lm_perplexity(docs)
    slow = lm.lm_perplexity(docs, persist_tokens=False)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    rows_fast = {r["doc_id"]: tuple(r) for r in fast.collect()}
    rows_slow = {r["doc_id"]: tuple(r) for r in slow.collect()}
    assert rows_fast == rows_slow
    assert len(lm._TOK_CACHE) <= 1  # single resident tokenized frame
    # a second invocation replaces (unpersists) the previous entry
    lm.lm_perplexity(docs).collect()
    assert len(lm._TOK_CACHE) <= 1
