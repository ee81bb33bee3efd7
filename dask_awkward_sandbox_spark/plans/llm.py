"""LLM-data-pipeline queries: dedup, text analysis, similarity search,
multimodal plumbing — each wired to functions/ and a DuckDB oracle.
The md5-derived word hash is reproducible in SQL, so minhash
signatures, band-join candidates, connected-component clusters,
simhash keys/near-dup pairs and fingerprints are ALL value-checked;
only the two approximate ANN searches (LSH, IVF) are rows-only, each
with a pytest recall floor vs the exact oracle-checked brute force.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions import dedup, similarity, text_analysis as ta
from dask_awkward_sandbox_spark.plans.common import read
from dask_awkward_sandbox_spark.plans.registry import query

# DuckDB fragments mirroring text_analysis definitions exactly.
TOKENS = r"list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0)"
H9 = "(('0x'||substr(md5(w),1,14))::bigint % 1000000007)"
NUM_PERMS = 8


def _docs(spark, sf_dir):
    return read(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return read(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@query(
    "q_token_count",
    rf"""
    select doc_id,
           cast(len({TOKENS}) as bigint) as n_ws,
           cast(len(regexp_extract_all(text, '{ta.BPE_PATTERN}')) as bigint) as n_bpe
    from documents
    """,
)
def q_token_count(spark, sf_dir):
    """Whitespace + BPE-ish token counting (regexp, JVM-side)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        ta.token_count_ws(F.col("text")).alias("n_ws"),
        ta.token_count_bpe(F.col("text")).alias("n_bpe"),
    )


@query(
    "q_lang_id",
    r"""
    select doc_id,
           cast(len(regexp_extract_all(text, '\bthe\b'))
                + len(regexp_extract_all(text, '\band\b'))
                + len(regexp_extract_all(text, '\bof\b')) as bigint) as en_score,
           case when len(regexp_extract_all(text, '\bthe\b'))
                     + len(regexp_extract_all(text, '\band\b'))
                     + len(regexp_extract_all(text, '\bof\b')) > 3
                then 'en' else 'other' end as pred_lang
    from documents
    """,
)
def q_lang_id(spark, sf_dir):
    """Stopword-count language-ID heuristic."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        ta.en_stopword_score(F.col("text")).alias("en_score"),
        ta.lang_id(F.col("text")).alias("pred_lang"),
    )


@query(
    "q_quality",
    rf"""
    with s as (
      select doc_id,
             cast(len({TOKENS}) as double) as n,
             cast(len(list_distinct({TOKENS})) as double) as d,
             cast(length(text) as double) as ln,
             cast(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) as double) as np
      from documents)
    select doc_id,
           case when n > 0 and ln > 0
                then 0.3 * least(n / 200.0, 1.0) + 0.3 * (d / n) + 0.4 * (1.0 - np / ln)
                else 0.0 end as quality
    from s
    """,
)
def q_quality(spark, sf_dir):
    """Heuristic quality score: identical expression tree both engines."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", ta.quality_score(F.col("text")).alias("quality"))


@query(
    "q_fingerprint",
    rf"""
    with t as (select doc_id, unnest({TOKENS}) as w,
                      generate_subscripts({TOKENS}, 1) as i
               from documents)
    select doc_id, cast(sum({H9} * i) % 1000000007 as bigint) as fp
    from t group by doc_id
    """,
)
def q_fingerprint(spark, sf_dir):
    """Position-weighted rolling fingerprint on the shared word hash."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", ta.fingerprint(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    """
    select md5(text) as text_hash,
           cast(count(*) as bigint) as n_copies,
           cast(min(doc_id) as bigint) as keep_id
    from documents group by md5(text)
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash."""
    return dedup.exact_dedup(_docs(spark, sf_dir), "text", "doc_id")


def _perm_values_sql(n: int = NUM_PERMS) -> str:
    rows = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(dedup.minhash_perms(n))
    )
    return f"(values {rows})"


@query(
    "q_minhash_sig",
    rf"""
    with t as (select doc_id, {H9.replace('w', 'unnest(' + TOKENS + ')')} as h from documents),
    p(pid, a, b) as {{perms}}
    select doc_id, cast(pid as bigint) as perm_id,
           cast(min((a * h + b) % 1000000007) as bigint) as minhash
    from t cross join p group by doc_id, pid
    """.replace("{perms}", _perm_values_sql()),
)
def q_minhash_sig(spark, sf_dir):
    """MinHash signatures (8 permutations) — oracle-checked exactly:
    both engines compute min over (a*h+b) mod p of the shared word
    hash. The LSH banding join built on these is q_dedup_minhash."""
    sig = dedup.minhash_signature(_docs(spark, sf_dir), "text", NUM_PERMS)
    cols = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("perm_id"),
                F.col(f"minhash_{i}").alias("minhash"),
            )
            for i in range(NUM_PERMS)
        ]
    )
    ex = sig.select("doc_id", F.explode(cols).alias("s"))
    return ex.select("doc_id", F.col("s.perm_id").alias("perm_id"), F.col("s.minhash").alias("minhash"))


@query(
    "q_dedup_simhash",
    rf"""
    with tok as (select doc_id, {H9.replace('w', 'unnest(' + TOKENS + ')')} as h from documents),
    bits as (select unnest(generate_series(0, 15)) as b),
    w as (select doc_id, b, sum(((h >> b) & 1) * 2 - 1) as wb
          from tok cross join bits group by doc_id, b)
    select doc_id,
           cast(sum(case when wb > 0 then 1::bigint << b else 0 end) as bigint) as simhash
    from w group by doc_id
    """,
)
def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash from the shared word hash — exact oracle."""
    return dedup.simhash(_docs(spark, sf_dir), "text", bits=16).select("doc_id", "simhash")


@query(
    "q_ngram_jaccard",
    rf"""
    with tok as (select doc_id, unnest(list_distinct({TOKENS})) as w from documents),
    c as (select doc_id, count(*) as na from tok group by doc_id),
    i as (select t1.doc_id, count(*) as ni from tok t1
          join tok t2 on t2.doc_id = t1.doc_id + 1 and t2.w = t1.w
          group by t1.doc_id)
    select c1.doc_id,
           cast(coalesce(i.ni, 0) as double)
                 / (c1.na + c2.na - coalesce(i.ni, 0)) as jaccard
    from c c1
    join c c2 on c2.doc_id = c1.doc_id + 1
    left join i on i.doc_id = c1.doc_id
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard between consecutive doc ids (the
    verification kernel the LSH pipeline applies to candidates)."""
    d = _docs(spark, sf_dir)
    pairs = d.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    j = dedup.ngram_jaccard_pairs(d, "text", "doc_id", pairs, n=1)
    return j.select(F.col("id_a").alias("doc_id"), F.col("jaccard").alias("jaccard"))


@query(
    "q_dedup_minhash",
    rf"""
    with t as (select doc_id, {H9.replace('w', 'unnest(' + TOKENS + ')')} as h from documents),
    p(pid, a, b) as {{perms16}},
    sig as (select doc_id, pid, min((a * h + b) % 1000000007) as mh
            from t cross join p group by doc_id, pid),
    bkey as (select doc_id, pid // 4 as band,
                    md5(string_agg(mh::varchar, '_' order by pid)) as key
             from sig group by doc_id, pid // 4)
    select a.doc_id as id_a, b.doc_id as id_b,
           cast(count(*) as bigint) as n_shared_bands
    from bkey a join bkey b on a.band = b.band and a.key = b.key
                           and a.doc_id < b.doc_id
    group by a.doc_id, b.doc_id
    """.replace("{perms16}", _perm_values_sql(16)),
)
def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH candidate pairs (16 perms, 4 bands of 4): the
    equi-join-on-band-keys candidate generator. Full value oracle:
    DuckDB rebuilds signatures, band keys and the blocking join.
    (For corpora with giant dup clusters use
    q_dedup_minhash_clusters — this one's output is inherently
    O(sum bucket^2).)"""
    d = _docs(spark, sf_dir)
    return dedup.minhash_lsh_candidates(d, "text", "doc_id", num_perms=16, bands=4).orderBy(
        "id_a", "id_b"
    )


@query(
    "q_dedup_minhash_clusters",
    rf"""
    with recursive
    t as (select doc_id, {H9.replace('w', 'unnest(' + TOKENS + ')')} as h from documents),
    p(pid, a, b) as {{perms}},
    sig as (select doc_id, pid, min((a * h + b) % 1000000007) as mh
            from t cross join p group by doc_id, pid),
    bkey as (select doc_id, pid // 2 as band,
                    md5(string_agg(mh::varchar, '_' order by pid)) as key
             from sig group by doc_id, pid // 2),
    edges as (select distinct a.doc_id as src, b.doc_id as dst
              from bkey a join bkey b on a.band = b.band and a.key = b.key),
    walk(doc, lab) as (
        select doc_id, doc_id from documents
        union
        select e.src, w.lab from walk w join edges e on e.dst = w.doc
    )
    select cast(doc as bigint) as doc, cast(min(lab) as bigint) as cluster
    from walk group by doc
    """.replace("{perms}", _perm_values_sql()),
)
def q_dedup_minhash_clusters(spark, sf_dir):
    """MinHash-LSH dedup, the scale path: connected components over
    the shares-a-band-bucket graph (8 perms, 4 bands of 2), labels =
    component-min doc id. Unlike the all-pairs candidate query, a
    bucket of n near-dups costs n rows, not n^2/2 — boilerplate-heavy
    corpora (and this testdata's planted dup clusters) stay linear.
    Oracle: DuckDB recursive-CTE transitive closure over the same
    bucket graph, min label per doc."""
    d = _docs(spark, sf_dir)
    return dedup.minhash_dedup_clusters(
        d, "text", "doc_id", num_perms=NUM_PERMS, bands=4
    ).orderBy("doc")


@query(
    "q_simhash_neardups",
    rf"""
    with tok as (select doc_id, {H9.replace('w', 'unnest(' + TOKENS + ')')} as h from documents),
    bits as (select unnest(generate_series(0, 15)) as b),
    w as (select doc_id, b, sum(((h >> b) & 1) * 2 - 1) as wb
          from tok cross join bits group by doc_id, b),
    sh as (select doc_id,
                  cast(sum(case when wb > 0 then 1::bigint << b else 0 end) as bigint) as simhash
           from w group by doc_id),
    bands as (select unnest(generate_series(0, 3)) as band),
    bk as (select doc_id, simhash, band, (simhash >> (band * 4)) & 15 as key
           from sh cross join bands)
    select distinct a.doc_id as id_a, b2.doc_id as id_b,
           cast(bit_count(xor(a.simhash, b2.simhash)) as bigint) as hamming
    from bk a join bk b2 on a.band = b2.band and a.key = b2.key and a.doc_id < b2.doc_id
    where bit_count(xor(a.simhash, b2.simhash)) <= 3
    """,
)
def q_simhash_neardups(spark, sf_dir):
    """SimHash near-dup pairs with pigeonhole band blocking (4 bands
    of 4 bits: any pair within hamming 3 shares a band). Full value
    oracle: DuckDB rebuilds the simhash, bands, blocking join and
    hamming filter."""
    out = dedup.simhash_neardups(_docs(spark, sf_dir), "text", "doc_id", max_hamming=3)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@query(
    "q_ann_bruteforce",
    """
    with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    q as (select * from e where vec_id % 50 = 0)
    select q.vec_id as q_id, e.vec_id as nb_id,
           round(list_cosine_similarity(q.v, e.v), 6) as sim
    from q join e on e.vec_id <> q.vec_id
    qualify row_number() over (partition by q.vec_id order by sim desc, nb_id asc) <= 5
    """,
)
def q_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for every 50th vector (broadcast queries,
    corpus streams through one narrow stage)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.brute_force_topk(e, q, k=5)


@query(
    "q_embedding_neardup",
    """
    with e as (select vec_id, embedding::DOUBLE[] as v from embeddings)
    select a.vec_id as id_a, b.vec_id as id_b,
           round(list_cosine_similarity(a.v, b.v), 6) as sim
    from e a join e b on b.vec_id > a.vec_id
    where round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """,
)
def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs above threshold."""
    return similarity.neardup_pairs(_emb(spark, sf_dir), threshold=0.4)


@query("q_ann_ivf")  # rows-only: approximate by construction
def q_ann_ivf(spark, sf_dir):
    """IVF top-k: k-means coarse quantizer (deterministic init +
    fixed Lloyd iterations), queries probe their 4 nearest of 16
    posting lists. The corpus-partitioned scale path — cost ~nprobe/
    nlist of brute force; recall vs brute force pytest-asserted."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.ivf_topk(e, q, k=5, nlist=16, nprobe=4, iters=3).orderBy(
        "q_id", "nb_id"
    )


@query("q_ann_lsh")  # rows-only: approximate by construction
def q_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH bucketed top-k — the 1e9-vector scale path.
    Deterministic planes, so results are stable run-to-run; recall vs
    brute force is pytest-asserted."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.lsh_bucket_topk(e, q, dim=64, k=5, planes=3).orderBy("q_id", "nb_id")


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@query(
    "q_multimodal_features",
    """
    select doc_id, cast(octet_length(encode(text)) as bigint) as n_bytes
    from documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Binary-column plumbing over real data: utf-8 payload bytes ->
    Arrow-batched feature extraction (fake_feature stands in for the
    codec). Oracle checks the byte accounting; feature values are
    pytest-verified against the pure-python reference."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    ).withColumnRenamed("doc_id", "media_id")

    from dask_awkward_sandbox_spark.functions.multimodal import extract_features

    feats = extract_features(d)
    return feats.select(F.col("media_id").alias("doc_id"), F.col("n_bytes"))
