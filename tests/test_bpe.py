"""Learned BPE (functions/bpe.py): merges vs an independent reference
trainer, encode/training consistency, determinism across partition
layouts, and the real-corpus scan."""

from __future__ import annotations

from collections import Counter

from dask_awkward_sandbox_spark.functions import bpe

SF = "/root/testdata/sf0.001"


def _ref_train(texts, num_merges):
    """Independent reference: the textbook Sennrich loop written a
    different way (Counter over exploded corpus words, list splits)."""
    wf = Counter(w for t in texts for w in t.split())
    splits = {w: [c for c in w] for w in wf}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, f in wf.items():
            s = splits[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        top = max(pc.values())
        best = min(p for p, c in pc.items() if c == top)
        merges.append(best)
        for w, s in splits.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            splits[w] = out
    return merges, splits


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide widest new low",
]


def test_merges_match_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    ref_merges, _ = _ref_train(TEXTS, 12)
    model = bpe.bpe_train(docs, num_merges=12)
    assert model.merges == ref_merges


def test_encode_reproduces_training_splits(spark):
    # rank-order encoding of a training word must reproduce the
    # trainer's final split for that word (the classic BPE property)
    ref_merges, splits = _ref_train(TEXTS, 12)
    model = bpe.BPEModel(ref_merges)
    for w, s in splits.items():
        assert bpe.encode_word(w, model.ranks) == s


def test_tokenize_deterministic_across_partitions(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 10)], "doc_id long, text string"
    )
    model = bpe.bpe_train(docs, num_merges=8)
    a = sorted(map(tuple, bpe.bpe_tokenize(docs, model).collect()))
    b = sorted(
        map(tuple, bpe.bpe_tokenize(docs.repartition(13), model).collect())
    )
    assert a == b
    # flat token stream re-concatenates to the original words
    for r in bpe.bpe_tokenize(docs, model).collect():
        assert "".join(r["bpe_tokens"]) == "".join(
            TEXTS[r["doc_id"] % len(TEXTS)].split()
        )


def test_word_budget_caps_driver_table(spark):
    docs = spark.createDataFrame(
        [(i, f"common common rare{i}") for i in range(50)],
        "doc_id long, text string",
    )
    # budget 1 keeps only 'common'; merges never involve rare words
    model = bpe.bpe_train(docs, num_merges=10, word_budget=1)
    assert all(a + b in "common" for a, b in model.merges)


def test_real_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = bpe.bpe_train(docs, num_merges=50, word_budget=4096)
    assert len(model.merges) == 50
    out = bpe.bpe_tokenize(docs, model)
    rows = out.collect()
    assert len(rows) == docs.count()
    # BPE always tokenizes at least as coarsely as characters and at
    # most down to characters: n_bpe between n_words and n_chars
    joined = {r["doc_id"]: r for r in rows}
    for t in docs.select("doc_id", "text").collect():
        words = t["text"].split()
        r = joined[t["doc_id"]]
        assert len(words) <= r["n_bpe"] <= sum(len(w) for w in words)
