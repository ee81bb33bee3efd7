"""String operations mirroring the reference's ``dak.str`` namespace.

Spark-first re-expression of
``/root/reference/src/dask_awkward/lib/str.py`` (which wraps
pyarrow.compute string kernels). Here each function is a Column ->
Column expression over Spark's JVM string functions; ``lift(fn)``
maps any of them elementwise over an ``array<string>`` column via
``F.transform`` — the awkward "strings are lists but act like
scalars" behavior.

All regex functions use Java regex (Spark-native). The reference uses
RE2 via Arrow; the dialects agree on the subset used here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lift(fn, *args, **kwargs):
    """Apply a scalar string op elementwise over array<string>."""

    def inner(arr: Column) -> Column:
        return F.transform(arr, lambda x: fn(x, *args, **kwargs))

    return inner


# -- case ------------------------------------------------------------------


def lower(s: Column) -> Column:
    return F.lower(s)


def upper(s: Column) -> Column:
    return F.upper(s)


def capitalize(s: Column) -> Column:
    """First char upper, rest lower (pyarrow utf8_capitalize)."""
    return F.concat(F.upper(F.substring(s, 1, 1)), F.lower(F.substring(s, 2, 2147483647)))


def title(s: Column) -> Column:
    """Title-case each word (pyarrow utf8_title ≙ initcap)."""
    return F.initcap(s)


def swapcase(s: Column) -> Column:
    """Swap case of each character — char-level transform, JVM-side."""
    return F.concat_ws(
        "",
        F.transform(
            F.split(s, ""),
            lambda c: F.when(c == F.upper(c), F.lower(c)).otherwise(F.upper(c)),
        ),
    )


# -- shape -----------------------------------------------------------------


def length(s: Column) -> Column:
    return F.length(s).cast("long")


def reverse(s: Column) -> Column:
    return F.reverse(s)


def repeat(s: Column, n: int) -> Column:
    return F.repeat(s, n)


def slice(s: Column, start: int, stop: int | None = None) -> Column:  # noqa: A001
    """0-based [start, stop) slice (pyarrow utf8_slice_codeunits)."""
    if stop is None:
        return F.substring(s, start + 1, 2147483647)
    return F.substring(s, start + 1, max(stop - start, 0))


# -- pad / trim ------------------------------------------------------------


def lpad(s: Column, width: int, fill: str = " ") -> Column:
    return F.when(F.length(s) >= width, s).otherwise(F.lpad(s, width, fill))


def rpad(s: Column, width: int, fill: str = " ") -> Column:
    return F.when(F.length(s) >= width, s).otherwise(F.rpad(s, width, fill))


def center(s: Column, width: int, fill: str = " ") -> Column:
    total = F.greatest(F.lit(width) - F.length(s), F.lit(0))
    left = F.floor(total / 2).cast("int")
    return F.concat(
        F.repeat(F.lit(fill), left), s, F.repeat(F.lit(fill), (total - left).cast("int"))
    )


def ltrim_whitespace(s: Column) -> Column:
    return F.ltrim(s)


def rtrim_whitespace(s: Column) -> Column:
    return F.rtrim(s)


def trim_whitespace(s: Column) -> Column:
    return F.trim(s)


def ltrim(s: Column, chars: str) -> Column:
    return F.regexp_replace(s, f"^[{_esc_class(chars)}]+", "")


def rtrim(s: Column, chars: str) -> Column:
    return F.regexp_replace(s, f"[{_esc_class(chars)}]+$", "")


def trim(s: Column, chars: str) -> Column:
    return rtrim(ltrim(s, chars), chars)


def _esc_class(chars: str) -> str:
    return "".join("\\" + c if c in r"\^]-[" else c for c in chars)


# -- predicates ------------------------------------------------------------


def starts_with(s: Column, prefix: str) -> Column:
    return s.startswith(prefix)


def ends_with(s: Column, suffix: str) -> Column:
    return s.endswith(suffix)


def match_substring(s: Column, pat: str) -> Column:
    return s.contains(pat)


def match_substring_regex(s: Column, pat: str) -> Column:
    return s.rlike(pat)


def match_like(s: Column, pat: str) -> Column:
    return s.like(pat)


def count_substring(s: Column, pat: str) -> Column:
    """Non-overlapping occurrence count (pyarrow count_substring)."""
    return F.when(
        F.length(F.lit(pat)) > 0,
        ((F.length(s) - F.length(F.replace(s, F.lit(pat), F.lit("")))) / F.length(F.lit(pat))).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))


def count_substring_regex(s: Column, pat: str) -> Column:
    return F.regexp_count(s, F.lit(pat)).cast("long")


def find_substring(s: Column, pat: str) -> Column:
    """0-based index of first occurrence, -1 if absent (pyarrow find_substring)."""
    return (F.instr(s, pat) - 1).cast("long")


def find_substring_regex(s: Column, pat: str) -> Column:
    idx = F.regexp_instr(s, F.lit(pat))
    return (idx - 1).cast("long")


def _char_class_pred(s: Column, cls: str) -> Column:
    return (F.length(s) > 0) & s.rlike(f"^{cls}+$")


def is_alnum(s: Column) -> Column:
    return _char_class_pred(s, r"[\p{L}\p{N}]")


def is_alpha(s: Column) -> Column:
    return _char_class_pred(s, r"\p{L}")


def is_ascii(s: Column) -> Column:
    return s.rlike(r"^[\x00-\x7F]*$")


def is_decimal(s: Column) -> Column:
    return _char_class_pred(s, r"\p{Nd}")


def is_digit(s: Column) -> Column:
    return _char_class_pred(s, r"\p{Nd}")


def is_numeric(s: Column) -> Column:
    return _char_class_pred(s, r"\p{N}")


def is_lower(s: Column) -> Column:
    return s.rlike(r"\p{Ll}") & (s == F.lower(s))


def is_upper(s: Column) -> Column:
    return s.rlike(r"\p{Lu}") & (s == F.upper(s))


def is_space(s: Column) -> Column:
    return _char_class_pred(s, r"\s")


def is_title(s: Column) -> Column:
    return (F.length(s) > 0) & (s == F.initcap(F.lower(s)))


def is_printable(s: Column) -> Column:
    return s.rlike(r"^[^\p{Cc}\p{Cf}\p{Co}\p{Cn}]*$")


# -- replace / extract -----------------------------------------------------


def replace_substring(s: Column, pat: str, repl: str) -> Column:
    return F.replace(s, F.lit(pat), F.lit(repl))


def replace_substring_regex(s: Column, pat: str, repl: str) -> Column:
    return F.regexp_replace(s, pat, repl)


def replace_slice(s: Column, start: int, stop: int, repl: str) -> Column:
    """Replace 0-based [start, stop) with ``repl`` (pyarrow utf8_replace_slice)."""
    return F.concat(
        F.substring(s, 1, start), F.lit(repl), F.substring(s, stop + 1, 2147483647)
    )


def extract_regex(s: Column, pat: str, group: int = 1) -> Column:
    """First match's capture group; null when no match (pyarrow extract_regex)."""
    return F.when(s.rlike(pat), F.regexp_extract(s, pat, group))


# -- split / join ----------------------------------------------------------


def split_whitespace(s: Column) -> Column:
    """Split on whitespace runs, no empty tokens (pyarrow utf8_split_whitespace)."""
    return F.filter(F.split(F.trim(s), r"\s+"), lambda t: F.length(t) > 0)


def split_pattern(s: Column, pat: str) -> Column:
    import re

    return F.split(s, re.escape(pat))


def split_pattern_regex(s: Column, pat: str) -> Column:
    return F.split(s, pat)


def join(arr: Column, sep: str) -> Column:
    """Join each list of strings with ``sep`` (pyarrow binary_join)."""
    return F.array_join(arr, sep)


def join_element_wise(a: Column, b: Column, sep: str, lists: bool = False) -> Column:
    """Element-wise join across parallel columns with ``sep`` (pyarrow
    binary_join_element_wise: one joined string per row). Pass
    ``lists=True`` for parallel array<string> columns, joining
    position-wise within each pair of lists."""
    if lists:
        return F.zip_with(a, b, lambda x, y: F.concat_ws(sep, x, y))
    return F.concat_ws(sep, a, b)


# -- membership ------------------------------------------------------------


def is_in(s: Column, values: list[str]) -> Column:
    return s.isin(values)


def index_in(s: Column, values: list[str]) -> Column:
    """0-based index of s in values, null if absent (pyarrow index_in)."""
    arr = F.array(*[F.lit(v) for v in values])
    pos = F.array_position(arr, s)
    return F.when(pos > 0, (pos - 1).cast("long"))


def to_categorical(df, col: str, max_distinct: int = 1_000_000):
    """Dictionary-encode a string column (ak.str.to_categorical):
    returns (encoded_df, dictionary_df) where the dictionary maps each
    distinct value to a dense 0-based code (ordered by value, so codes
    are deterministic) and encoded_df carries ``<col>_code``.

    CARDINALITY CONTRACT: the dictionary must be broadcast-sized — it
    is broadcast-joined back onto the fact table, and its global
    ``row_number`` window runs on a single task. Both are fine exactly
    because a *categorical* column has bounded distinct values; a
    near-unique column is not categorical and is rejected by the
    ``max_distinct`` guard (default 1M ≈ tens of MB of short strings,
    inside a sane broadcast budget — raise it only with the memory to
    match). NOTE the guard makes this call EAGER: it counts the
    distinct table when invoked; the distinct frame is cached so the
    guard's shuffle is reused by the dictionary/encode that follows.

    Scale: the dictionary is distinct-values-sized — aggregate it
    (one shuffle over distinct values, tiny output) and broadcast it
    back; the fact table never shuffles. Parquet already
    dictionary-encodes low-cardinality strings at the page level; this
    operator is for when the CODES themselves are the feature.
    """
    from pyspark.sql import Window

    distinct = df.select(col).distinct().cache()
    try:
        n = distinct.count()
        if n > max_distinct:
            raise ValueError(
                f"to_categorical: {n} distinct values in {col!r} exceeds "
                f"max_distinct={max_distinct}; this column is not categorical "
                "(the dictionary must fit the broadcast threshold)"
            )
        w = Window.orderBy(col)
        # localCheckpoint MATERIALIZES the dictionary (guard-bounded,
        # executor-stored) so the cached distinct frame can be released
        # here instead of leaking one cached relation per call — the
        # guard's shuffle is still the one that feeds it
        dictionary = distinct.withColumn(
            "code", (F.row_number().over(w) - 1).cast("long")
        ).localCheckpoint(eager=True)
    finally:
        distinct.unpersist()
    encoded = df.join(F.broadcast(dictionary), col, "left").withColumnRenamed(
        "code", f"{col}_code"
    )
    return encoded, dictionary
