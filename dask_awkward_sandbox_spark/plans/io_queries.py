"""IO-surface queries: parquet/json/text roundtrips, from_lists,
to_dataframe, unflatten.

Roundtrip pattern: the Spark side WRITES derived data to a scratch
dir, reads it back through the io/ module, and computes a summary;
the oracle computes the same summary straight from the source views.
A roundtrip bug (schema drift, lost rows, mangled nesting) breaks the
match.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.io import (
    from_json,
    from_lists,
    from_parquet,
    from_text,
    to_dataframe,
    to_json,
    to_parquet,
)
from dask_awkward_sandbox_spark.io.text import to_text
from dask_awkward_sandbox_spark.operators import structure as st
from dask_awkward_sandbox_spark.plans.common import cents, fld_map, order_items, read
from dask_awkward_sandbox_spark.plans.registry import query

SCRATCH = "/root/repo/.scratch"


def _scratch(sf_dir: str, name: str) -> str:
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(SCRATCH, tag, name)


@query(
    "q_parquet_roundtrip",
    """
    select l_orderkey, cast(count(*) as bigint) as n_items,
           cast(sum(cast(round(l_quantity*100) as bigint)) as bigint) as sum_qty_c
    from lineitem group by l_orderkey
    """,
)
def q_parquet_roundtrip(spark, sf_dir):
    """Nested array<struct> -> parquet -> read back (with column
    projection) -> reduce. Exercises nested parquet write/read and
    read-side schema pruning."""
    it = order_items(spark, sf_dir, fields=["l_linenumber", "l_quantity"])
    path = _scratch(sf_dir, "nested_items")
    to_parquet(it, path, max_records_per_file=100_000)
    back = from_parquet(spark, path, columns=["l_orderkey", "items"])
    q = fld_map(F.col("items"), "l_quantity", cents)
    return back.select(
        "l_orderkey",
        st.num(F.col("items")).alias("n_items"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_qty_c"),
    )


@query(
    "q_json_io",
    """
    select event_type, cast(count(*) as bigint) as n,
           cast(sum(cast(round(value*100) as bigint)) as bigint) as sum_value_c,
           cast(sum(cast(regexp_extract(props, '"k": ([0-9]+)', 1) as bigint)) as bigint)
             as sum_k,
           cast(sum(try_cast(regexp_extract(props, '([0-9]+)', 1) as bigint)) as bigint)
             as sum_k2,
           cast(count(case when try_cast(regexp_extract(props, '([0-9]+)', 1) as bigint)
                           is null then 1 end) as bigint) as n_unparseable
    from events group by event_type
    """,
)
def q_json_io(spark, sf_dir):
    """events -> line-delimited JSON -> schema-ed read -> aggregate.
    The semi-structured props column rides through the roundtrip and
    is decoded twice on the Spark side: a real from_json (schema'd
    JVM parse) and ak.strings_astype (elementwise try_cast of digit
    strings, null on failure); the oracle regex-extracts the same
    numbers straight from the source view — independent parses, same
    values."""
    e = read(spark, sf_dir, "events").select(
        "event_id", "event_type", cents(F.col("value")).alias("value_c"), "props"
    )
    path = _scratch(sf_dir, "events_json")
    to_json(e, path)
    back = from_json(
        spark, path, schema="event_id long, event_type string, value_c long, props string"
    )
    k = F.from_json(F.col("props"), "k long")["k"]
    digits = F.regexp_extract(F.col("props"), "([0-9]+)", 1)
    k2 = F.get(st.strings_astype(F.array(digits), "long"), 0)
    return back.select("event_type", "value_c", k.alias("k"), k2.alias("k2")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_c").alias("sum_value_c"),
        F.sum("k").alias("sum_k"),
        F.sum("k2").alias("sum_k2"),
        F.count(F.when(F.col("k2").isNull(), 1)).alias("n_unparseable"),
    )


_LISTS_ROWS = [
    (1, [1.0, 2.0, 3.0]),
    (2, []),
    (3, [5.0, None]),
    (4, None),
    (5, [7.5]),
]

_SMALL_SOURCES_ORACLE = """
    with t(id, n_items, sum_v) as (values
      (1, 3, 6.0), (2, 0, 0.0), (3, 2, 5.0), (4, null, null), (5, 1, 7.5)),
    d as (select cast(count(*) as bigint) as n_lines,
                 cast(sum(length(text)) as bigint) as total_chars,
                 cast(min(length(text)) as bigint) as min_len
          from documents)
    select cast(id as bigint) as id, cast(n_items as bigint) as n_items,
           cast(sum_v as double) as sum_v,
           d.n_lines, d.total_chars, d.min_len
    from t cross join d
"""


@query("q_small_sources", _SMALL_SOURCES_ORACLE)
def q_small_sources(spark, sf_dir):
    """from_lists with ragged/None edges (empty list, null element,
    null list — the option-type semantics) x from_text (documents.text
    -> plain text file -> line stats; doc texts contain no newlines,
    so lines == documents). The 1-row text aggregate broadcast-crosses
    onto the 5-row lists frame."""
    from dask_awkward_sandbox_spark.operators import reducers as red

    d = read(spark, sf_dir, "documents")
    path = _scratch(sf_dir, "docs_text")
    to_text(d, "text", path)
    lines = from_text(spark, path)
    text_stats = lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.min(F.length("value")).alias("min_len"),
    )

    df = from_lists(spark, _LISTS_ROWS, "id long, v array<double>", num_partitions=2)
    lists = df.select(
        "id",
        st.num(F.col("v")).alias("n_items"),
        F.when(F.col("v").isNotNull(), red.sum(F.col("v"))).alias("sum_v"),
    )
    return lists.crossJoin(F.broadcast(text_stats))


@query(
    "q_to_dataframe",
    """
    select l_orderkey, cast(l_linenumber as bigint) as items_l_linenumber,
           cast(round(l_quantity*100) as bigint) as qty_c
    from lineitem
    """,
)
def q_to_dataframe(spark, sf_dir):
    """Nested collection -> flat columnar frame (explode + struct
    flattening), the dd.DataFrame conversion."""
    it = order_items(spark, sf_dir, fields=["l_linenumber", "l_quantity"])
    flat = to_dataframe(it, explode_col="items")
    return flat.select(
        "l_orderkey",
        F.col("items_l_linenumber").cast("long").alias("items_l_linenumber"),
        cents(F.col("items_l_quantity")).alias("qty_c"),
    )


@query(
    "q_unflatten",
    """
    with r as (select n_chars,
                      (row_number() over (order by doc_id) - 1) // 100 as gid
               from documents)
    select cast(gid as bigint) as gid, cast(count(*) as bigint) as n,
           cast(sum(n_chars) as bigint) as sum_chars
    from r group by gid
    """,
)
def q_unflatten(spark, sf_dir):
    """ak.unflatten: re-nest a flat ordered column into given counts.
    Range-partitioned rank assignment (per-partition offsets, no
    global window) — see operators/structure.py:unflatten."""
    d = read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = d.count()
    counts = [100] * (n // 100) + ([n % 100] if n % 100 else [])
    out = st.unflatten(d, "n_chars", "doc_id", counts)
    from dask_awkward_sandbox_spark.operators import reducers as red

    return out.select(
        "gid",
        st.num(F.col("n_chars")).alias("n"),
        red.sum(F.col("n_chars")).cast("long").alias("sum_chars"),
    ).orderBy("gid")
