"""JSON IO for nested collections.

Parity: /root/reference/src/dask_awkward/lib/io/json.py
(from_json/to_json, line-delimited and schema-ed variants). Spark's
JSON source is already partitioned line-delimited JSON; an explicit
schema string replaces the reference's jsonschema path, and
``schema_of_json``/sampling replaces its meta inference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def from_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    line_delimited: bool = True,
) -> DataFrame:
    """Read JSON files; ``schema`` (DDL string) skips inference — at
    100 TB inference means an extra full scan, so production callers
    always pass it (the reference takes a jsonschema for the same
    reason)."""
    r = spark.read
    if schema:
        r = r.schema(schema)
    if not line_delimited:
        r = r.option("multiLine", "true")
    return r.json(path)


def to_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write line-delimited JSON (one object per row, nested values
    as JSON structures) — the reference's to_json layout."""
    df.write.mode(mode).json(path)


def parse_json_column(col: Column, schema: str) -> Column:
    """Parse a JSON-string column into a typed struct (the streaming /
    semi-structured path: events.props)."""
    return F.from_json(col, schema)


def json_schema_of(spark: SparkSession, sample: str) -> str:
    """Infer a DDL schema from a sample JSON string (meta inference)."""
    row = spark.range(1).select(F.schema_of_json(F.lit(sample)).alias("s")).head()
    return row["s"]
