"""Learned byte-pair-encoding: distributed trainer + Arrow-batched
encoder.

The `token_count_bpe` regex in text_analysis approximates a BPE
tokenizer's token count; this module LEARNS an actual merge table
from the corpus (Sennrich et al. 2016) and tokenizes with it — the
piece a training-data pipeline needs for real token budgeting,
sequence packing, and contamination checks in model-tokenizer units.

Split of labor (the same one production BPE trainers use — the HF
tokenizers trainer collects a word-count table first): the corpus
scan is distributed (one map-side-combined word-frequency aggregate;
100 TB of text folds to a vocabulary-sized table), and the merge
loop runs driver-side over that bounded table — `word_budget` caps
it at the head of the word distribution, exactly the min-frequency
pruning real trainers apply, so driver memory is fixed no matter the
corpus. Encoding distributes again: merges ride to executors in the
task closure (KBs), applied per word with a capped, batch-flushed
cache inside an Arrow-batched iterator — no JVM<->Python per-row
chatter, no shuffle, embarrassingly parallel.

Determinism end to end: the word table is tie-broken (count desc,
word asc), merge selection is tie-broken (pair-count desc, pair
lexicographic asc), and encoding applies merges in training-rank
order (the GPT-2 ``bpe()`` loop) — so the same corpus always yields
the same merges and the same tokenization, partition layout
included.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions import text_analysis as ta


@dataclass
class BPEModel:
    merges: list[tuple[str, str]]
    ranks: dict[tuple[str, str], int] = field(init=False)

    def __post_init__(self) -> None:
        self.ranks = {p: i for i, p in enumerate(self.merges)}


def _merge_once(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Replace non-overlapping occurrences of ``pair`` left-to-right."""
    out: list[str] = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_merges_from_counts(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over a (word, freq) table. Pure
    function — the distributed part of training is producing the
    table; this part is deliberately driver-side (vocabulary-sized
    input, O(num_merges * total_symbols) work)."""
    splits: dict[str, tuple[str, ...]] = {
        w: tuple(w) for w, _ in word_counts
    }
    freqs = dict(word_counts)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in splits.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        # most frequent pair; ties to the lexicographically smallest
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        splits = {w: _merge_once(s, best) for w, s in splits.items()}
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    word_budget: int = 65536,
) -> BPEModel:
    """ONE distributed scan for the word-frequency table (map-side
    combine; orderBy+limit compiles to TakeOrdered, per-partition
    top-k — no full sort), then the driver-side merge loop on its
    deterministic (count desc, word asc) head."""
    wc = (
        docs.select(F.explode(ta.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(word_budget)
        .collect()
    )
    return BPEModel(
        train_merges_from_counts([(r["w"], r["c"]) for r in wc], num_merges)
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2 style encode: repeatedly apply the best-ranked (earliest
    learned) merge present in the word until none applies."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        ranked = [
            (ranks[p], p) for p in set(zip(syms, syms[1:])) if p in ranks
        ]
        if not ranked:
            break
        syms = _merge_once(syms, min(ranked)[1])
    return list(syms)


def bpe_tokenize(
    docs: DataFrame,
    model: BPEModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe) per document — an
    Arrow-batched scan-side map; the per-word cache means each
    distinct word in a batch is encoded once.

    Measured (r8, sf1: 50k docs / 4.34M tokens / 200 merges): 5.9M
    BPE tokens/s warm on local[32] ≈ 185k tok/s/core. Cost scales
    with distinct words per batch (cache hits are a dict lookup), so
    the Python merge loop is not the pipeline bottleneck at corpus
    scale; a vectorized rewrite would buy only the cache-miss
    fraction."""
    import pyarrow as pa

    ranks = model.ranks
    # the SAME word boundary the trainer's scan used: Java's \s is
    # ASCII [ \t\n\x0b\f\r], while Python str.split() treats
    # Unicode spaces (U+00A0, U+3000, ...) as separators — a
    # mismatch would tokenize words the trainer never counted
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def fn(it):
        cache: dict[str, list[str]] = {}

        def enc(text):
            out: list[str] = []
            for w in ws.split(text or ""):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, ranks)
                out.extend(got)
            return out

        for b in it:
            # bound the per-task cache: high-cardinality partitions
            # (URLs, hashes, code) would otherwise grow it without
            # limit for the task's lifetime — flush between batches
            # once it exceeds the cap; hot words repopulate in O(hits)
            if len(cache) > (1 << 18):
                cache.clear()
            d = b.to_pydict()
            toks = [enc(t) for t in d[text_col]]
            yield pa.RecordBatch.from_pydict(
                {
                    id_col: d[id_col],
                    "bpe_tokens": toks,
                    "n_bpe": [len(t) for t in toks],
                },
                schema=pa.schema(
                    [
                        (id_col, pa.int64()),
                        ("bpe_tokens", pa.list_(pa.string())),
                        ("n_bpe", pa.int64()),
                    ]
                ),
            )

    return docs.select(id_col, text_col).mapInArrow(
        fn, f"{id_col} long, bpe_tokens array<string>, n_bpe long"
    )
