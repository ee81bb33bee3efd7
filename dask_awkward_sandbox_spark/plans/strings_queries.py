"""String-operator coverage queries over the documents table.

``q_str_surface`` exercises the whole dak.str namespace slice-by-slice
(case/shape, pad/trim, match/replace, split/join, classify,
dictionary membership) in ONE scan of documents — one output column
per operator, with a DuckDB oracle computing every transform
independently. Full-text outputs are md5-hashed so the comparison is
exact without hauling long strings through the harness.
tests/test_strings_sweep.py additionally drives every function in the
namespace.

Scale note: a single consolidated projection is also the honest shape
at 100 TB — 30 string kernels in one codegen'd pass over the corpus
instead of three separate scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_awkward_sandbox_spark.operators import strings as s
from dask_awkward_sandbox_spark.plans.common import read
from dask_awkward_sandbox_spark.plans.registry import query

LANGS = ["en", "de", "fr", "es", "zh"]

_TOKENS_SQL = r"list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0)"


@query(
    "q_str_surface",
    rf"""
    select doc_id,
           -- case/shape family
           upper(substr(text, 1, 20)) as head_u,
           cast(length(text) as bigint) as len,
           reverse(lang) as rlang,
           upper(substr(source, 1, 1)) || lower(substr(source, 2)) as cap_src,
           repeat(lang, 3) as lang3,
           -- pad/trim family
           case when length(lang) >= 8 then lang else lpad(lang, 8, '.') end as lp,
           case when length(lang) >= 8 then lang else rpad(lang, 8, '.') end as rp,
           repeat('*', cast(floor(greatest(9 - length(lang), 0) / 2) as int)) || lang ||
             repeat('*', cast(greatest(9 - length(lang), 0)
                              - floor(greatest(9 - length(lang), 0) / 2) as int)) as ctr,
           ltrim(source, 'srci0123456789') as lt,
           trim(concat(' ', lang, '  ')) as tw,
           -- match family
           cast(starts_with(text, 'the') as int) as sw,
           cast(case when text like '%scan' then 1 else 0 end as int) as ew,
           cast((length(text) - length(replace(text, 'data', ''))) / 4 as bigint) as n_data,
           cast(len(regexp_extract_all(text, 'jo[a-z]+')) as bigint) as n_jo,
           cast(strpos(text, 'spark') - 1 as bigint) as f_spark,
           cast(regexp_matches(text, 'wind[a-z]+') as int) as m_wind,
           cast(case when text like '%group%' then 1 else 0 end as int) as lk,
           -- replace family
           md5(replace(text, 'data', 'DATA')) as r_sub,
           md5(regexp_replace(text, '\s+', '_', 'g')) as r_re,
           md5('<<' || substr(text, 11)) as r_slice,
           nullif(regexp_extract(text, '(jo[a-z]+)', 1), '') as ex,
           -- split/join family
           cast(len({_TOKENS_SQL}) as bigint) as n_tokens,
           array_to_string(({_TOKENS_SQL})[1:3], '-') as first3,
           cast(length(array_to_string({_TOKENS_SQL}, ' ')) as bigint) as rejoined_len,
           -- classification + dictionary membership
           cast(regexp_matches(lang, '^[a-zA-Z]+$') as int) as alpha_lang,
           cast(regexp_matches(text, '^[\x00-\x7F]*$') as int) as ascii_text,
           cast(case when length(regexp_extract(source, '([0-9]+)', 1)) > 0
                then 1 else 0 end as int) as digit_src,
           cast(lang = lower(lang) and regexp_matches(lang, '[a-z]') as int) as lower_lang,
           cast(case lang {" ".join(f"when '{v}' then {i}" for i, v in enumerate(LANGS))}
                else null end as bigint) as lang_idx,
           cast(lang in ({", ".join(repr(v) for v in LANGS)}) as int) as lang_known
    from documents
    """,
)
def q_str_surface(spark, sf_dir):
    """The dak.str surface in one documents scan, one column per
    operator: case/shape (lower/upper/capitalize/length/reverse/
    repeat/slice), pad/trim (lpad/rpad/center/ltrim(charset)/
    trim_whitespace), match (starts/ends_with, count_substring(_regex),
    find_substring, match_substring_regex, match_like), replace
    (replace_substring(_regex), replace_slice, extract_regex),
    split/join (split_whitespace/join/list slice), classification
    (is_alpha/is_ascii/is_digit/is_lower), and dictionary membership
    (is_in/index_in)."""
    d = read(spark, sf_dir, "documents")
    toks = s.split_whitespace(F.col("text"))
    digits = F.regexp_extract(F.col("source"), "([0-9]+)", 1)
    return d.select(
        "doc_id",
        # case/shape
        s.upper(s.slice(F.col("text"), 0, 20)).alias("head_u"),
        s.length(F.col("text")).alias("len"),
        s.reverse(F.col("lang")).alias("rlang"),
        s.capitalize(F.col("source")).alias("cap_src"),
        s.repeat(F.col("lang"), 3).alias("lang3"),
        # pad/trim
        s.lpad(F.col("lang"), 8, ".").alias("lp"),
        s.rpad(F.col("lang"), 8, ".").alias("rp"),
        s.center(F.col("lang"), 9, "*").alias("ctr"),
        s.ltrim(F.col("source"), "srci0123456789").alias("lt"),
        s.trim_whitespace(F.concat(F.lit(" "), F.col("lang"), F.lit("  "))).alias("tw"),
        # match
        s.starts_with(F.col("text"), "the").cast("int").alias("sw"),
        s.ends_with(F.col("text"), "scan").cast("int").alias("ew"),
        s.count_substring(F.col("text"), "data").alias("n_data"),
        s.count_substring_regex(F.col("text"), "jo[a-z]+").alias("n_jo"),
        s.find_substring(F.col("text"), "spark").alias("f_spark"),
        s.match_substring_regex(F.col("text"), "wind[a-z]+").cast("int").alias("m_wind"),
        s.match_like(F.col("text"), "%group%").cast("int").alias("lk"),
        # replace
        F.md5(s.replace_substring(F.col("text"), "data", "DATA")).alias("r_sub"),
        F.md5(s.replace_substring_regex(F.col("text"), r"\s+", "_")).alias("r_re"),
        F.md5(s.replace_slice(F.col("text"), 0, 10, "<<")).alias("r_slice"),
        s.extract_regex(F.col("text"), "(jo[a-z]+)", 1).alias("ex"),
        # split/join
        F.size(toks).cast("long").alias("n_tokens"),
        s.join(F.slice(toks, 1, 3), "-").alias("first3"),
        s.length(s.join(toks, " ")).alias("rejoined_len"),
        # classification + membership
        s.is_alpha(F.col("lang")).cast("int").alias("alpha_lang"),
        s.is_ascii(F.col("text")).cast("int").alias("ascii_text"),
        s.is_digit(digits).cast("int").alias("digit_src"),
        s.is_lower(F.col("lang")).cast("int").alias("lower_lang"),
        s.index_in(F.col("lang"), LANGS).alias("lang_idx"),
        s.is_in(F.col("lang"), LANGS).cast("int").alias("lang_known"),
    )


@query(
    "q_to_categorical",
    """
    select event_type,
           cast(dense_rank() over (order by event_type) - 1 as bigint) as code,
           cast(count(*) as bigint) as n
    from events group by event_type
    """,
)
def q_to_categorical(spark, sf_dir):
    """ak.str.to_categorical: dictionary-encode event_type, then count
    per (value, code) — codes are dense, 0-based, value-ordered in
    both engines."""
    from dask_awkward_sandbox_spark.operators.strings import to_categorical

    e = read(spark, sf_dir, "events")
    encoded, _ = to_categorical(e, "event_type")
    return encoded.groupBy("event_type", F.col("event_type_code").alias("code")).agg(
        F.count(F.lit(1)).alias("n")
    )
