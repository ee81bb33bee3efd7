"""Text analysis for LLM-data pipelines: tokenization, language ID,
quality scoring, fingerprinting.

All JVM-side expressions (no Python UDFs): at 100 TB these run inside
whole-stage codegen over the parquet scan with full column pruning —
per-document cost is a handful of regex/hash evaluations, perfectly
data-parallel, zero shuffles.

The 56-bit word hash is md5-derived so an independent engine (DuckDB
oracle: ``('0x'||substr(md5(w),1,14))::bigint``) reproduces it
exactly — every op built on it (minhash, simhash, fingerprints) is
cross-engine checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, no empties (array<string>)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: F.length(t) > 0)


def word_hash56(w: Column) -> Column:
    """Deterministic 56-bit hash: first 14 hex chars of md5."""
    return F.conv(F.substring(F.md5(w), 1, 14), 16, 10).cast("long")


def word_hash(w: Column) -> Column:
    """word_hash56 reduced mod p = 1e9+7 — small enough that products
    with per-permutation coefficients stay exact in int64."""
    return F.pmod(word_hash56(w), F.lit(MOD))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.regexp_count(text, F.lit(BPE_PATTERN)).cast("long")


def en_stopword_score(text: Column) -> Column:
    """Count of English stopword occurrences (\\b-delimited)."""
    return (
        F.regexp_count(text, F.lit(r"\bthe\b"))
        + F.regexp_count(text, F.lit(r"\band\b"))
        + F.regexp_count(text, F.lit(r"\bof\b"))
    ).cast("long")


def lang_id(text: Column, threshold: int = 3) -> Column:
    """N-gram/stopword language-ID heuristic: 'en' when enough English
    stopwords appear, else 'other'. (Real pipelines add per-language
    stopword tables — same shape, more branches.)"""
    return F.when(en_stopword_score(text) > threshold, F.lit("en")).otherwise(F.lit("other"))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("long")


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length saturation + lexical
    diversity + (1 - punctuation density). Deterministic exact-integer
    inputs -> identical doubles in any engine."""
    return quality_score_tokens(tokens(text), text)


def fingerprint_tokens(toks: Column) -> Column:
    """:func:`fingerprint` over an already-tokenized array — lets a
    multi-leg plan tokenize once and feed every leg (see
    q_text_metrics two-step select)."""
    weighted = F.transform(toks, lambda w, i: word_hash(w) * (i.cast("long") + 1))
    total = F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)
    return F.pmod(total, F.lit(MOD))


def fingerprint(text: Column) -> Column:
    """Position-weighted rolling document fingerprint:
    sum_i (hash(w_i) * i) mod p over 1-based token positions.
    Order-sensitive (unlike a bag-of-words hash) yet expressible as a
    plain aggregate in any SQL engine."""
    return fingerprint_tokens(tokens(text))


def quality_score_tokens(toks: Column, text: Column) -> Column:
    """:func:`quality_score` with the token array supplied."""
    n = F.size(toks).cast("double")
    d = F.size(F.array_distinct(toks)).cast("double")
    ln = F.length(text).cast("double")
    np = punct_count(text).cast("double")
    return F.when(
        (n > 0) & (ln > 0),
        F.lit(0.3) * F.least(n / 200.0, F.lit(1.0))
        + F.lit(0.3) * (d / n)
        + F.lit(0.4) * (F.lit(1.0) - np / ln),
    ).otherwise(F.lit(0.0))


def tf_idf_top_terms(
    docs,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
):
    """Per-document top-``k`` TF-IDF terms — the keyword-extraction /
    topic-tagging stage (and the classic retrieval weighting):
    ``score = tf * ln((N + 1) / (df + 1))`` (add-one smoothed IDF so
    a corpus-universal term scores 0-ish instead of dividing by
    surprise), ties (score desc, term asc).

    Returns (id, rank, term, score) — score rounded to 6 digits so a
    cross-engine ln ulp cannot flip a hash.

    100 TB shape: tf is one (doc, term) map-side-combined aggregate
    off the exploded scan; df aggregates the per-doc DISTINCT terms
    (list_distinct scan-side, so the explode never over-counts) into
    a vocabulary-sized table that broadcasts back onto tf; the
    per-doc top-k is a rank()<=k window whose WindowGroupLimit does
    map-side per-doc pruning before the shuffle. ``n_docs`` (corpus
    size) is a driver-side scalar — pass it when known to skip the
    count job.
    """
    from pyspark.sql import Window

    if n_docs is None:
        n_docs = docs.count()
    toks = tokens(F.col(text_col))
    tf = (
        docs.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = (
        docs.select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # round BEFORE ranking (the same rule knn_join applies to its
    # cosines): the rank must be a function of the published value,
    # or a cross-engine ln last-ulp between two near-equal scores
    # could flip the order while both engines print the same numbers
    scored = tf.join(F.broadcast(df_t), "term").select(
        id_col,
        "term",
        F.round(
            F.col("tf").cast("double")
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + F.lit(1.0))),
            6,
        ).alias("_score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "term",
            F.col("_score").alias("score"),
        )
    )
