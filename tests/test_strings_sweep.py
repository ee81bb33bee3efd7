"""One-pass sweep of the full string-function surface against
Python-computed expectations on a fixed adversarial corpus — every
function from operators/strings.py fires at least once (the oracle
queries cover the hot families; this closes the tail).

Semantics note: the suite pins OUR documented semantics (which follow
Spark builtins where they exist), not cpython's — e.g. title() is
initcap (whitespace-delimited), is_decimal/is_digit/is_numeric are
the ASCII [0-9] interpretation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

CORPUS = [
    "hello world",
    "HELLO",
    "MiXeD Case 123",
    "  padded  ",
    "tab\tsep",
    "",
    "123",
    "abc123",
    "no",
    "a,b,,c",
    "Title Case Here",
    "ALL CAPS STOP",
]


def _df(spark):
    return spark.createDataFrame([(i, s) for i, s in enumerate(CORPUS)], "id long, s string")


def _run(spark, col):
    rows = _df(spark).select("id", col.alias("r")).collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["id"])]


def test_case_functions(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    assert _run(spark, ss.lower(F.col("s"))) == [s.lower() for s in CORPUS]
    assert _run(spark, ss.upper(F.col("s"))) == [s.upper() for s in CORPUS]
    assert _run(spark, ss.capitalize(F.col("s"))) == [s.capitalize() for s in CORPUS]
    assert _run(spark, ss.swapcase(F.col("s"))) == [s.swapcase() for s in CORPUS]
    # title == initcap: every whitespace-delimited word capitalized
    got = _run(spark, ss.title(F.col("s")))
    assert got[0] == "Hello World" and got[2] == "Mixed Case 123"


def test_shape_functions(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    assert _run(spark, ss.length(F.col("s"))) == [len(s) for s in CORPUS]
    assert _run(spark, ss.reverse(F.col("s"))) == [s[::-1] for s in CORPUS]
    assert _run(spark, ss.repeat(F.col("s"), 2)) == [s * 2 for s in CORPUS]
    assert _run(spark, ss.slice(F.col("s"), 1, 4)) == [s[1:4] for s in CORPUS]
    assert _run(spark, ss.replace_slice(F.col("s"), 1, 3, "XY")) == [
        s[:1] + "XY" + s[3:] for s in CORPUS
    ]


def test_pad_trim(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    # pyarrow pad semantics: pad to width, never truncate
    assert _run(spark, ss.lpad(F.col("s"), 4, "*")) == [s.rjust(4, "*") for s in CORPUS]
    assert _run(spark, ss.trim_whitespace(F.col("s"))) == [s.strip() for s in CORPUS]
    assert _run(spark, ss.ltrim_whitespace(F.col("s"))) == [s.lstrip() for s in CORPUS]
    assert _run(spark, ss.rtrim_whitespace(F.col("s"))) == [s.rstrip() for s in CORPUS]
    assert _run(spark, ss.trim(F.col("s"), "ab")) == [s.strip("ab") for s in CORPUS]
    assert _run(spark, ss.ltrim(F.col("s"), "ab")) == [s.lstrip("ab") for s in CORPUS]
    assert _run(spark, ss.rtrim(F.col("s"), "ab")) == [s.rstrip("ab") for s in CORPUS]
    got = _run(spark, ss.center(F.col("s"), 6, "-"))
    assert got[8] == "no".center(6, "-")


def test_match_find_count(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    assert _run(spark, ss.starts_with(F.col("s"), "he")) == [
        s.startswith("he") for s in CORPUS
    ]
    assert _run(spark, ss.ends_with(F.col("s"), "o")) == [s.endswith("o") for s in CORPUS]
    assert _run(spark, ss.match_substring(F.col("s"), "l")) == ["l" in s for s in CORPUS]
    assert _run(spark, ss.match_substring_regex(F.col("s"), "^[a-z]+$")) == [
        bool(__import__("re").fullmatch("[a-z]+", s)) for s in CORPUS
    ]
    assert _run(spark, ss.match_like(F.col("s"), "%world%")) == [
        "world" in s for s in CORPUS
    ]
    assert _run(spark, ss.count_substring(F.col("s"), "l")) == [
        s.count("l") for s in CORPUS
    ]
    assert _run(spark, ss.count_substring_regex(F.col("s"), "[0-9]")) == [
        sum(c.isdigit() for c in s) for s in CORPUS
    ]
    assert _run(spark, ss.find_substring(F.col("s"), "o")) == [s.find("o") for s in CORPUS]
    got = _run(spark, ss.find_substring_regex(F.col("s"), "[0-9]"))
    import re

    want = [(m.start() if (m := re.search("[0-9]", s)) else -1) for s in CORPUS]
    assert got == want


def test_classify(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    checks = {
        "is_alnum": lambda s: bool(s) and s.isalnum(),
        "is_alpha": lambda s: bool(s) and s.isalpha(),
        "is_ascii": lambda s: s.isascii(),
        "is_lower": str.islower,
        "is_upper": str.isupper,
        "is_space": lambda s: bool(s) and all(c.isspace() for c in s),
    }
    for name, pyfn in checks.items():
        got = _run(spark, getattr(ss, name)(F.col("s")))
        want = [pyfn(s) for s in CORPUS]
        assert got == want, f"{name}: {got} != {want}"
    # digit family: ASCII [0-9]-only interpretation
    for name in ("is_decimal", "is_digit", "is_numeric"):
        got = _run(spark, getattr(ss, name)(F.col("s")))
        assert got == [bool(s) and all("0" <= c <= "9" for c in s) for s in CORPUS], name
    got = _run(spark, ss.is_title(F.col("s")))
    assert got[10] is True and got[0] is False
    got = _run(spark, ss.is_printable(F.col("s")))
    assert got[4] is False and got[0] is True


def test_replace_extract_split_join(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    assert _run(spark, ss.replace_substring(F.col("s"), "l", "L")) == [
        s.replace("l", "L") for s in CORPUS
    ]
    assert _run(spark, ss.replace_substring_regex(F.col("s"), "[0-9]+", "#")) == [
        __import__("re").sub("[0-9]+", "#", s) for s in CORPUS
    ]
    got = _run(spark, ss.extract_regex(F.col("s"), "([0-9]+)"))
    assert got[6] == "123" and got[0] is None
    assert _run(spark, ss.split_pattern(F.col("s"), ",")) == [s.split(",") for s in CORPUS]
    got = _run(spark, ss.split_pattern_regex(F.col("s"), "\\s+"))
    assert got[0] == ["hello", "world"]
    assert _run(spark, ss.join(ss.split_pattern(F.col("s"), ","), "|")) == [
        "|".join(s.split(",")) for s in CORPUS
    ]
    got = _run(spark, ss.join_element_wise(F.col("s"), F.col("s"), "+"))
    assert got == [s + "+" + s for s in CORPUS]


def test_membership(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    vals = ["hello world", "123", "nope"]
    assert _run(spark, ss.is_in(F.col("s"), vals)) == [s in vals for s in CORPUS]
    assert _run(spark, ss.index_in(F.col("s"), vals)) == [
        vals.index(s) if s in vals else None for s in CORPUS
    ]


def test_join_element_wise_lists(spark):
    from dask_awkward_sandbox_spark.operators import strings as ss

    df = spark.createDataFrame(
        [(["a", "b"], ["x", "y"])], "u array<string>, v array<string>"
    )
    got = df.select(
        ss.join_element_wise(F.col("u"), F.col("v"), "-", lists=True).alias("r")
    ).collect()[0]["r"]
    assert got == ["a-x", "b-y"]
