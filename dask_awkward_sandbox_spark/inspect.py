"""Introspection + decimation utilities (reference: lib/inspect.py,
lib/describe.py).

``report_necessary_columns`` answers the same question as the
reference's necessary-buffers report — "which IO columns does this
computation actually read?" — but from Catalyst's physical plan: the
pruned ReadSchema of every parquet scan, post column-pruning and
nested-schema pruning. What the optimizer kept IS the necessary set.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTITION_ROW_MASK = (1 << 33) - 1  # monotonically_increasing_id low bits


def sample(
    df: DataFrame,
    factor: int | None = None,
    probability: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Decimate to fewer rows (reference inspect.py:sample).

    ``factor``: keep every Nth row, counting restarting per partition
    (monotonically_increasing_id's low 33 bits are the within-partition
    counter — same contract as the reference's per-partition ``[::N]``).
    ``probability``: each row survives independently with probability p
    (seeded, so the plan is reproducible).
    """
    if (factor is None and probability is None) or (
        factor is not None and probability is not None
    ):
        raise ValueError("Give exactly one of factor or probability")
    if factor is not None:
        if factor < 1:
            raise ValueError(f"factor must be >= 1, got {factor}")
        within = F.monotonically_increasing_id().bitwiseAND(F.lit(_PARTITION_ROW_MASK))
        return df.filter(within % factor == 0)
    return df.filter(F.rand(seed) < float(probability))


def report_necessary_columns(df: DataFrame) -> dict[str, frozenset[str]]:
    """Map each scanned file location to the column set the optimized
    plan actually reads (reference inspect.py:report_necessary_columns).

    Nested fields appear as dotted paths (``items.l_quantity``) — if a
    wide struct shows up un-narrowed here, some expression defeated
    nested pruning (see plans/common.py:fld)."""
    from dask_awkward_sandbox_spark.core import visualize

    # the formatted explain: plain toString truncates long scan lines,
    # losing Location/ReadSchema entirely on wide tables
    plan = visualize(df)
    out: dict[str, frozenset[str]] = {}
    loc = None
    for line in plan.splitlines():
        line = line.strip()
        m = re.match(r"Location: \w+ \[([^\]]*)\]", line)
        if m:
            loc = m.group(1).split(",")[0].strip()
            continue
        m = re.match(r"ReadSchema: (struct<.*>)$", line)
        if m and loc is not None:
            leaves = frozenset(_schema_leaves(m.group(1)))
            out[loc] = out.get(loc, frozenset()) | leaves
            loc = None
    return out


def _schema_leaves(schema: str) -> list[str]:
    """Flatten ``struct<a:bigint,b:array<struct<c:double>>>`` to
    dotted leaf paths [a, b.c]."""
    body = schema[len("struct<") : -1]
    leaves: list[str] = []

    def walk(s: str, prefix: str) -> None:
        depth, start = 0, 0
        parts = []
        for i, ch in enumerate(s):
            if ch in "<([":
                depth += 1
            elif ch in ">)]":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(s[start:i])
                start = i + 1
        if s[start:]:
            parts.append(s[start:])
        for part in parts:
            name, _, typ = part.partition(":")
            name = name.strip()
            m = re.match(r"(?:array<)*struct<(.*?)>+$", typ)
            if m:
                walk(m.group(1), f"{prefix}{name}.")
            else:
                leaves.append(f"{prefix}{name}")

    walk(body, "")
    return leaves


class NecessaryBuffers(NamedTuple):
    """Per-scan buffer report (reference inspect.py:NecessaryBuffers).

    awkward distinguishes data buffers from shape-only (offsets)
    buffers. The Spark/parquet mapping documented here:

    - ``data_and_shape``: ReadSchema leaf paths whose VALUES are
      consumed by some expression in the optimized plan.
    - ``shape_only``: leaf paths the pruned scan still reads but whose
      values feed nothing — they survive only to materialize list
      offsets / row cardinality (e.g. the single leaf Spark must keep
      under an array that only feeds ``size()``). This is the moral
      twin of awkward's offsets-only buffers: bytes read for shape.
    """

    data_and_shape: frozenset[str]
    shape_only: frozenset[str]


# expression heads whose operands are consumed for cardinality, not value
_SHAPE_CLASSES = {"Size", "ArraySize", "Cardinality", "IsNull", "IsNotNull"}
# expression heads that ARE a column / nested-field reference
_REF_CLASSES = {"AttributeReference", "GetStructField", "GetArrayStructFields"}


def _plan_value_refs(df: DataFrame) -> tuple[set[str], set[str]]:
    """Walk the optimized Catalyst plan's expression trees, collecting
    dotted column paths referenced as values (data) vs only inside
    cardinality contexts (shape)."""
    data: set[str] = set()
    shape: set[str] = set()

    def nodes(pl):
        yield pl
        for i in range(pl.children().size()):
            yield from nodes(pl.children().apply(i))

    def walk(e, in_shape: bool) -> None:
        cls = e.getClass().getSimpleName()
        if cls in _REF_CLASSES:
            (shape if in_shape else data).add(e.sql().replace("`", ""))
            return  # a deeper walk would re-add the chain's base attr
        # a cardinality head consumes only its PURE-REFERENCE operands
        # as shape; anything nested deeper (e.g. the predicate inside
        # size(filter(arr, p)) still reads values) reverts to data —
        # conservative: over-reporting data never understates bytes
        nxt = cls in _SHAPE_CLASSES if not in_shape else False
        for j in range(e.children().size()):
            walk(e.children().apply(j), nxt)

    for n in nodes(df._jdf.queryExecution().optimizedPlan()):
        if n.children().size() == 0:
            continue  # leaf relations list their outputs, consuming nothing
        ex = n.expressions()
        for i in range(ex.size()):
            walk(ex.apply(i), False)
    return data, shape


def report_necessary_buffers(df: DataFrame) -> dict[str, NecessaryBuffers]:
    """Split each scan's necessary columns into data vs shape-only
    buffers (reference inspect.py:report_necessary_buffers; see
    :class:`NecessaryBuffers` for the documented Spark mapping).

    Known limit: value references are collected plan-wide and matched
    to scans BY NAME, so in a multi-scan plan a leaf that is data in
    one scan marks the same-named leaf in every other scan as data too
    (conservative — shape_only is never over-reported)."""
    cols = report_necessary_columns(df)
    data, _ = _plan_value_refs(df)

    def is_data(leaf: str) -> bool:
        return any(
            leaf == r or leaf.startswith(r + ".") or r.startswith(leaf + ".")
            for r in data
        )

    out: dict[str, NecessaryBuffers] = {}
    for loc, leaves in cols.items():
        d = frozenset(leaf for leaf in leaves if is_data(leaf))
        out[loc] = NecessaryBuffers(data_and_shape=d, shape_only=frozenset(leaves) - d)
    return out


def fields(
    df_or_col: DataFrame | Column | None, col: str | None = None
) -> list[str]:
    """Record field names (reference describe.py:fields): top-level
    column names of a DataFrame, or — given a column name — the
    element struct's field names through any list nesting
    (``fields(df, "points")`` ≙ the reference's
    ``dak.fields(daa.points)``). Non-record leaves give ``[]`` like
    the reference's no-fields case."""
    if not isinstance(df_or_col, DataFrame):
        raise TypeError("fields() takes a DataFrame")
    if col is None:
        return list(df_or_col.columns)
    from pyspark.sql import types as T

    dt = df_or_col.schema[col].dataType
    while isinstance(dt, T.ArrayType):
        dt = dt.elementType
    if isinstance(dt, T.StructType):
        return [f.name for f in dt.fields]
    return []


def backend(*_args) -> str:
    """Reference describe.py:backend — ours is always Spark."""
    return "spark"


def ndim(df: DataFrame, col: str | None = None) -> int:
    """Number of axes (reference describe.py:ndim / test_core.py:
    test_ndim): the row axis plus the column's list depth. With no
    column, the max depth over all columns — matching the reference's
    whole-record ndim."""
    from pyspark.sql import types as T

    def depth(dt) -> int:
        d = 0
        while isinstance(dt, T.ArrayType):
            d += 1
            dt = dt.elementType
        if isinstance(dt, T.StructType):
            d += max((depth(f.dataType) for f in dt.fields), default=0)
        return d

    if col is not None:
        return 1 + depth(df.schema[col].dataType)
    return 1 + max((depth(f.dataType) for f in df.schema.fields), default=0)


# ---------------------------------------------------------------------------
# awkward-style type rendering (reference lib/core.py:2396 ``_type``,
# exported as ``dak.type``; Array._typestr at core.py:1081)
# ---------------------------------------------------------------------------

_ATOM_NAMES = {
    "long": "int64",
    "bigint": "int64",
    "int": "int32",
    "integer": "int32",
    "short": "int16",
    "smallint": "int16",
    "byte": "int8",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool",
    "binary": "bytes",
    "date": "datetime64[D]",
    "timestamp": "datetime64[us]",
    "timestamp_ntz": "datetime64[us]",
}


def _render_type(dt, nullable: bool) -> str:
    """Spark DataType -> awkward type-string fragment.

    Mapping: array<T> -> ``var * T`` (Spark arrays are always
    variable-length), struct -> ``{f: T, ...}``, nullable -> ``?T``
    (or awkward's ``option[...]`` form when the inner type is a list /
    record, which cannot take the ``?`` prefix), atomics by numpy
    name. Maps (no awkward analogue) render via their Arrow layout:
    ``var * {key: K, value: V}``. Decimals keep their SQL name —
    honest extension, awkward has no decimal."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        inner = f"var * {_render_type(dt.elementType, dt.containsNull)}"
    elif isinstance(dt, T.StructType):
        fields = ", ".join(
            f"{f.name}: {_render_type(f.dataType, f.nullable)}" for f in dt.fields
        )
        inner = "{" + fields + "}"
    elif isinstance(dt, T.MapType):
        kv = (
            f"key: {_render_type(dt.keyType, False)}, "
            f"value: {_render_type(dt.valueType, dt.valueContainsNull)}"
        )
        inner = "var * {" + kv + "}"
    else:
        simple = dt.simpleString()
        inner = _ATOM_NAMES.get(simple, simple)

    if not nullable:
        return inner
    if inner.startswith("var * ") or inner.startswith("{"):
        return f"option[{inner}]"
    return f"?{inner}"


def typestr(df_or_schema, max: int = 0) -> str:  # noqa: A002 - mirrors _typestr
    """awkward-style type string of a collection (reference
    Array._typestr, core.py:1081): ``var * {x: int64, y: var *
    ?float64}`` — the leading ``var`` is the partitioned row
    dimension, exactly as the reference renders it. ``max`` truncates
    like the reference (``"... }"`` suffix).

    Accepts a DataFrame, a StructType, or any Spark DataType (a
    single column's type renders without the row dimension wrapper —
    pass ``df.schema["c"].dataType``)."""
    from pyspark.sql import types as T

    if isinstance(df_or_schema, DataFrame):
        schema: T.DataType = df_or_schema.schema
    else:
        schema = df_or_schema
    tstr = _render_type(schema, False)
    if max and len(tstr) > max:
        tstr = f"{tstr[0:max]} ... }}"
    return f"var * {tstr}"


def shorttypestr(df_or_schema, max: int = 10) -> str:  # noqa: A002
    """First ``max`` characters of the inner type (reference
    Array._shorttypestr, core.py:1078)."""
    return typestr(df_or_schema)[len("var * ") :][0:max]


# reference backwards-compat export alias (dask_awkward/__init__.py:
# ``necessary_columns = report_necessary_columns``)
necessary_columns = report_necessary_columns
