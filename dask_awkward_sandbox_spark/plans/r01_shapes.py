"""r01-equivalent query shapes for the baseline-mapped grading gate
(r14, generalizing the q_events_windowed decomposition the r13 verdict
asked for in item 6).

BASELINE.md pins BENCH_r01's per-slot rows as the standing baseline,
but most of today's mapped slots carry strictly MORE gate legs than
their r01 ancestors (merged slots, added oracle legs, the hof twins) —
so slot-wall / r01-row conflates real regression with added work. Each
function here reproduces ONE r01 headliner's exact work content —
same operators, same parameters (8 minhash perms, 16 simhash bits,
ivf iters=3 where r01 used 3), same output shape — using TODAY's
operator implementations, so bench.py can measure "the r01 slot's
work on today's engine" standalone every run. The per-shape walls
ride the bench aux line (``r01_shapes``) and their total-vs-total
ratio rides the final line: the comparable-work answer to "is the
engine at parity with its round-1 self?", decidable from the driver
artifact.

Shape sources (resurrected from the r01 tree, commit b5be721^):
plans/nested.py q_sort/q_reduce_sum, plans/strings_queries.py
q_str_split_join, plans/llm.py q_token_count/q_fingerprint/
q_minhash_sig/q_dedup_simhash/q_ann_bruteforce/q_ann_ivf.

These are UNREGISTERED: the 50-slot registry and its oracles are
untouched; the shapes exist only as bench measurement subjects. Slots
at or below their r01 rows in the running panel (q_cartesian_
combinations, q_events_sessionize, the five TPC-H controls,
q_dedup_minhash_clusters) need no shape — their full slot IS the
comparable, and the four controls double as the box normalizer. Since
the late-r14 leg relocation q_events_windowed is in that group too:
the registered slot is byte-equivalent to its r01 query again (the
rollup/hh/hll legs moved to q_events_funnel_retention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions import dedup, similarity
from dask_awkward_sandbox_spark.functions import text_analysis as ta
from dask_awkward_sandbox_spark.operators import reducers as red
from dask_awkward_sandbox_spark.operators import strings as s
from dask_awkward_sandbox_spark.operators import structure as st
from dask_awkward_sandbox_spark.plans.common import cents, order_items, read

_R01_NUM_PERMS = 8  # r01 llm.py NUM_PERMS
_R01_SIMHASH_BITS = 16  # r01 simhash width (widened to 56 in r9)


def _docs(spark, sf_dir):
    return read(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return read(spark, sf_dir, "embeddings")


def _qty_c(items):
    return F.transform(items, lambda x: cents(x["l_quantity"]))


def sort_r01_shape(spark, sf_dir):
    """r01 q_sort: ak.sort descending + top-2 slice, exploded."""
    it = order_items(spark, sf_dir, fields=["l_linenumber", "l_quantity"])
    top2 = F.slice(st.sort(_qty_c(F.col("items")), ascending=False), 1, 2)
    return it.select("l_orderkey", F.explode(top2).alias("qty_c"))


def reduce_sum_r01_shape(spark, sf_dir):
    """r01 q_reduce_sum: ak.sum / ak.prod (axis=1) per order."""
    it = order_items(
        spark, sf_dir,
        fields=["l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )
    disc = F.transform(
        F.col("items"), lambda x: F.greatest(cents(x["l_discount"]), F.lit(1))
    )
    price = F.transform(F.col("items"), lambda x: cents(x["l_extendedprice"]))
    return it.select(
        "l_orderkey",
        red.sum(_qty_c(F.col("items"))).cast("long").alias("sum_qty_c"),
        red.sum(price).cast("long").alias("sum_price_c"),
        F.round(red.prod(disc)).cast("long").alias("prod_disc_c"),
    )


def str_split_join_r01_shape(spark, sf_dir):
    """r01 q_str_split_join: split_whitespace / join / slice."""
    d = _docs(spark, sf_dir)
    toks = s.split_whitespace(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        s.join(F.slice(toks, 1, 3), "-").alias("first3"),
        s.length(s.join(toks, " ")).alias("rejoined_len"),
    )


def token_count_r01_shape(spark, sf_dir):
    """r01 q_token_count: whitespace + BPE-ish counting."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        ta.token_count_ws(F.col("text")).alias("n_ws"),
        ta.token_count_bpe(F.col("text")).alias("n_bpe"),
    )


def fingerprint_r01_shape(spark, sf_dir):
    """r01 q_fingerprint: position-weighted rolling fingerprint."""
    return _docs(spark, sf_dir).select(
        "doc_id", ta.fingerprint(F.col("text")).alias("fp")
    )


def minhash_sig_r01_shape(spark, sf_dir):
    """r01 q_minhash_sig: 8-perm signatures, exploded to rows."""
    sig = dedup.minhash_signature(_docs(spark, sf_dir), "text", _R01_NUM_PERMS)
    cols = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("perm_id"),
                F.col(f"minhash_{i}").alias("minhash"),
            )
            for i in range(_R01_NUM_PERMS)
        ]
    )
    ex = sig.select("doc_id", F.explode(cols).alias("s"))
    return ex.select(
        "doc_id",
        F.col("s.perm_id").alias("perm_id"),
        F.col("s.minhash").alias("minhash"),
    )


def simhash_r01_shape(spark, sf_dir):
    """r01 q_dedup_simhash: 16-bit SimHash per doc."""
    return dedup.simhash(
        _docs(spark, sf_dir), "text", bits=_R01_SIMHASH_BITS
    ).select("doc_id", "simhash")


def ann_bruteforce_r01_shape(spark, sf_dir):
    """r01 q_ann_bruteforce: exact cosine top-5 for every 50th vec."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.brute_force_topk(e, q, k=5)


def ann_ivf_r01_shape(spark, sf_dir):
    """r01 q_ann_ivf: IVF top-k, nlist=16 nprobe=4 iters=3."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0)
    return similarity.ivf_topk(e, q, k=5, nlist=16, nprobe=4, iters=3).orderBy(
        "q_id", "nb_id"
    )


# mapped slot -> list of (r01 slot name, BENCH_r01 row seconds, shape fn).
# Rows are the same numbers BASELINE_MAPPED sums per slot (q_text_metrics
# maps TWO r01 slots, their rows add — the bench.py mapping comment).
R01_SHAPES = {
    "q_sort_argsort": [("q_sort", 1.213, sort_r01_shape)],
    "q_reduce_order_count": [("q_reduce_sum", 1.787, reduce_sum_r01_shape)],
    "q_str_surface": [("q_str_split_join", 0.352, str_split_join_r01_shape)],
    "q_text_metrics": [
        ("q_token_count", 0.316, token_count_r01_shape),
        ("q_fingerprint", 0.573, fingerprint_r01_shape),
    ],
    "q_dedup_minhash": [("q_minhash_sig", 0.959, minhash_sig_r01_shape)],
    "q_dedup_simhash": [("q_dedup_simhash_r01", 1.599, simhash_r01_shape)],
    "q_ann_bruteforce": [
        ("q_ann_bruteforce_r01", 1.218, ann_bruteforce_r01_shape)
    ],
    "q_ann_ivf_assign": [("q_ann_ivf", 1.923, ann_ivf_r01_shape)],
    # q_events_windowed needs no shape since the late-r14 leg
    # relocation: the registered slot IS the r01 query again (the
    # rollup/hh/hll legs moved to q_events_funnel_retention).
}
