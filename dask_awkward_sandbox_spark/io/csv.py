"""CSV / ORC / Avro IO.

The reference's IO surface is parquet/json/text (lib/io/); a user
moving a production pipeline onto this engine also needs the
flat-file interchange formats Spark ships natively. CSV and ORC are
built in; Avro needs the external spark-avro package, so those
functions raise a clear error when the jar is absent rather than an
opaque ClassNotFound at execution time.

Scale notes: CSV with an explicit schema is splittable and scans in
parallel like text; inferSchema costs an extra full pass (same rule
as io/json.py — production callers pass the DDL). ORC gets the same
predicate pushdown / column pruning treatment as parquet
(PushedFilters visible in .explain), so the plan tests' pruning
guarantees carry over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def from_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
    **options: str,
) -> DataFrame:
    """Read CSV file(s). ``schema`` (DDL string) skips inference — at
    100 TB inference is an extra full scan. Extra ``options`` pass
    through to the Spark CSV source (quote, escape, nullValue, ...)."""
    r = spark.read.option("header", str(header).lower()).option("sep", delimiter)
    if schema:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.csv(path)


def to_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
) -> None:
    """Write CSV. Nested columns are not representable in CSV — fail
    loudly with the offending columns instead of Spark's generic
    AnalysisException."""
    bad = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("array", "struct", "map")
    ]
    if bad:
        raise ValueError(
            f"CSV cannot represent nested columns {bad}; flatten or "
            "to_json them first (io/json.py)"
        )
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def from_orc(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Read ORC file(s); ``columns`` prunes at the scan like
    from_parquet's projection."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def to_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ORC (full nested-type support, like parquet)."""
    df.write.mode(mode).orc(path)


def from_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read Avro file(s). Requires the spark-avro package jar."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - jar-dependent
        raise RuntimeError(
            "Avro source requires the external spark-avro package "
            "(org.apache.spark:spark-avro); add it to spark.jars.packages"
        ) from exc


def to_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write Avro. Requires the spark-avro package jar."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:  # pragma: no cover - jar-dependent
        raise RuntimeError(
            "Avro sink requires the external spark-avro package "
            "(org.apache.spark:spark-avro); add it to spark.jars.packages"
        ) from exc
