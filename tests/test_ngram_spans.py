"""Substring-level dedup (functions/dedup.py duplicate_ngram_spans).

Cross-checked against an independent DuckDB derivation (inverted
index + gaps-and-islands span merge) on real testdata documents, plus
planted edge cases for the merge fold.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.functions.dedup import (
    duplicate_ngram_spans,
    ngram_occurrences,
)

_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> len(t) > 0)"


def _oracle(sf_dir: str, n: int, min_count: int = 2):
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(
        f"""
        with tokn as (select doc_id, {_TOKS} as toks from documents),
        occ as (select doc_id, i - 1 as pos,
                       ('0x' || substr(md5(array_to_string(toks[i:i+{n - 1}], ' ')), 1, 14))::bigint as g
                from tokn
                cross join unnest(range(1, greatest(len(toks) - {n - 2}, 1))) as t(i)),
        dupg as (select g from occ group by g having count(*) >= {min_count}),
        d as (select occ.doc_id, occ.pos from occ join dupg using (g)),
        isl as (select doc_id, pos,
                       case when pos - lag(pos) over
                                 (partition by doc_id order by pos) <= {n}
                            then 0 else 1 end as brk
                from d),
        gid as (select doc_id, pos,
                       sum(brk) over (partition by doc_id order by pos) as grp
                from isl),
        sp as (select doc_id, min(pos) as s, max(pos) + {n} as e
               from gid group by doc_id, grp)
        select doc_id, cast(sum(e - s) as bigint) as dup_tokens,
               string_agg(s || '-' || e, ',' order by s) as spans
        from sp group by doc_id order by doc_id
        """
    ).fetchall()


def test_matches_duckdb_on_testdata(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: (
            r["n_dup_tokens"],
            ",".join(f"{s['start']}-{s['end']}" for s in r["spans"]),
        )
        for r in duplicate_ngram_spans(docs, "text", "doc_id", n=8).collect()
        if r["n_dup_tokens"] > 0
    }
    exp = {doc_id: (dup, spans) for doc_id, dup, spans in _oracle(sf, 8)}
    assert got == exp
    assert len(exp) > 0  # non-vacuous on real data


def test_span_merge_chain_and_adjacency(spark):
    # windows at 0,1,2 chain-overlap into one span; a window starting
    # exactly at a span's end is ADJACENT and merges too
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h a b c d e f g h"),  # within-doc repeat, n=4:
            # dup grams at every pos 0..12 -> one span [0,16)
            (2, "p q r s t u v w"),
        ],
        "doc_id long, text string",
    )
    r = {
        x["doc_id"]: x
        for x in duplicate_ngram_spans(df, "text", "doc_id", n=4).collect()
    }
    assert [(s["start"], s["end"]) for s in r[1]["spans"]] == [(0, 16)]
    assert r[1]["clean_text"] == ""
    assert r[2]["spans"] == [] and r[2]["clean_text"] == "p q r s t u v w"


def test_disjoint_spans_and_clean_text(spark):
    shared = "one two three four five"
    df = spark.createDataFrame(
        [
            (1, f"{shared} AAA BBB CCC DDD {shared}"),
            (2, f"{shared} xxx yyy zzz www vvv"),
        ],
        "doc_id long, text string",
    )
    r = {
        x["doc_id"]: x
        for x in duplicate_ngram_spans(df, "text", "doc_id", n=5).collect()
    }
    # doc 1: dup windows at 0 and 9 -> two disjoint spans
    assert [(s["start"], s["end"]) for s in r[1]["spans"]] == [(0, 5), (9, 14)]
    assert r[1]["clean_text"] == "AAA BBB CCC DDD"
    assert r[1]["n_dup_tokens"] == 10
    assert r[2]["clean_text"] == "xxx yyy zzz www vvv"


def test_short_docs_and_min_count(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "")],
        "doc_id long, text string",
    )
    # docs shorter than n contribute no grams and come back clean
    r = duplicate_ngram_spans(df, "text", "doc_id", n=8)
    assert r.filter(F.col("n_dup_tokens") > 0).count() == 0
    assert r.count() == 3
    # min_count above the corpus max -> nothing flagged even with dups
    df2 = spark.createDataFrame(
        [(1, "x y z w v"), (2, "x y z w v")], "doc_id long, text string"
    )
    assert (
        duplicate_ngram_spans(df2, "text", "doc_id", n=5, min_count=3)
        .filter(F.col("n_dup_tokens") > 0)
        .count()
        == 0
    )
    assert (
        duplicate_ngram_spans(df2, "text", "doc_id", n=5, min_count=2)
        .filter(F.col("n_dup_tokens") > 0)
        .count()
        == 2
    )


def test_planted_case_idempotent(spark):
    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"head {shared} tail"), (2, f"{shared} other stuff here")],
        "doc_id long, text string",
    )
    first = duplicate_ngram_spans(df, "text", "doc_id", n=8).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    second = duplicate_ngram_spans(first, "text", "doc_id", n=8)
    assert second.filter(F.col("n_dup_tokens") > 0).count() == 0


def test_occurrence_plan_is_scan_side(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = ngram_occurrences(docs, "text", "doc_id", 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # tokenize+explode shuffles nothing
    assert "CartesianProduct" not in plan
