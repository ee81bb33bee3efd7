"""Text IO.

Parity: /root/reference/src/dask_awkward/lib/io/text.py (from_text:
delimiter-split byte chunks -> string array). Spark's text source
splits on newlines with the same parallel byte-range strategy the
reference implements by hand; custom delimiters map to
``lineSep``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_text(spark: SparkSession, path: str, delimiter: str | None = None) -> DataFrame:
    """Read text file(s) into one string column named ``value``."""
    r = spark.read
    if delimiter and delimiter != "\n":
        r = r.option("lineSep", delimiter)
    return r.text(path)


def to_text(df: DataFrame, column: str, path: str, mode: str = "overwrite") -> None:
    """Write one column as plain text, one row per line."""
    df.select(df[column].alias("value")).write.mode(mode).text(path)
