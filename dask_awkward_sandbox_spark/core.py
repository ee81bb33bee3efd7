"""Collection-level API: the Spark face of the reference's lazy
Array/Record/Scalar collections (reference: lib/core.py).

The mapping is intentionally thin — a partitioned nested collection IS
a DataFrame with complex-typed columns, so the reference's
collection verbs become DataFrame verbs:

- ``map_partitions``  -> ``mapInArrow`` (Arrow record batches, the
  zero-copy path) or ``mapInPandas`` (pandas convenience);
- ``repartition``     -> ``repartition`` / ``coalesce`` (coalesce when
  shrinking: no shuffle);
- ``persist``         -> ``cache``; ``compute`` -> ``collect``;
- ``visualize``       -> the Catalyst plan (``explain`` string) — the
  task graph the reference would draw;
- ``to_list``         -> collected plain-Python rows (ak.to_list).

Scale notes: ``map_partitions`` user functions run once per Arrow
batch, not per row; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. ``compute``/
``to_list`` pull to the driver — summaries only, never the corpus.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def map_partitions(
    df: DataFrame,
    fn: Callable,
    schema: str,
    arrow: bool = True,
) -> DataFrame:
    """Arbitrary per-partition transformation (dak.map_partitions,
    reference lib/core.py).

    ``fn`` receives an iterator of ``pyarrow.RecordBatch`` (arrow=True)
    or ``pandas.DataFrame`` (arrow=False) and yields the same type
    conforming to ``schema``. Prefer Column expressions for anything
    they can express — this is the escape hatch, and it pays the
    JVM<->Python Arrow transfer.
    """
    if arrow:
        return df.mapInArrow(fn, schema)
    return df.mapInPandas(fn, schema)


def repartition(df: DataFrame, num_partitions: int, shuffle: bool | None = None) -> DataFrame:
    """Change partition count. ``shuffle=False`` coalesces (narrow, no
    shuffle — only valid when shrinking), ``shuffle=True`` forces a
    round-robin exchange; the default inspects the DataFrame's ACTUAL
    partition count and coalesces only when provably shrinking —
    coalesce cannot grow, so guessing from session conf could silently
    return the original count. The inspection plans (not runs) the
    query via ``df.rdd``; pass ``shuffle`` explicitly to skip it."""
    if shuffle is None:
        current = df.rdd.getNumPartitions()
        shuffle = num_partitions > current
    if not shuffle:
        return df.coalesce(num_partitions)
    return df.repartition(num_partitions)


def _scan_files(df: DataFrame) -> list[str] | None:
    """Sorted input files when ``df`` is a pure parquet scan, else None."""
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001
    if (
        plan.children().size() == 0
        and "parquet" in plan.toString().lower()
        and df.inputFiles()
    ):
        return sorted(df.inputFiles())
    return None


def npartitions(df: DataFrame) -> int:
    """Partition count of the collection (reference Array.npartitions).

    For a pure file scan this is the INPUT FILE count — the same index
    space :func:`partitions` slices (dask's parquet partitions are
    file/row-group chunks). Spark's runtime scan tasks bin-pack or
    split files, so ``rdd.getNumPartitions()`` would disagree with the
    slicing contract; it remains the answer for derived frames, where
    ``partitions`` also falls back to runtime partition ids.
    """
    files = _scan_files(df)
    if files is not None:
        return len(files)
    return df.rdd.getNumPartitions()


def partitions(df: DataFrame, start: int, stop: int | None = None) -> DataFrame:
    """Partition-wise getitem: ``Array.partitions[start:stop]``
    (reference lib/core.py, the ``.partitions`` accessor).

    For a pure file scan (the overwhelmingly common case — the
    reference's accessor is used to peek at a slice of a parquet
    dataset), the selected partitions map to input FILES and the
    result is a re-read of only those files: the other files are never
    opened, matching the reference's graph-slicing efficiency. Files
    are sorted by path, mirroring the deterministic partition order of
    ``from_parquet``.

    For a derived DataFrame (joins/aggs upstream), partition identity
    only exists at runtime, so the fallback filters on
    ``spark_partition_id()`` — every partition is computed but only the
    selected ones survive. Callers who need the fast path should slice
    straight after the read, like reference users do.

    Index space: ``range(npartitions(df))`` — input files on the fast
    path (hive partition-column values are recovered via ``basePath``,
    the files' common root), runtime partition ids on the fallback.
    """
    import os

    from pyspark.sql import functions as F

    if stop is None:
        stop = start + 1
    if start < 0 or stop < start:
        raise ValueError(f"bad partition range [{start}, {stop})")

    files = _scan_files(df)
    if files is not None:
        sel = files[start:stop]
        if not sel:
            return df.sparkSession.createDataFrame([], df.schema)
        # basePath = the dataset root (common dir of ALL files, not
        # just the slice): without it a partitionBy-layout read would
        # silently null every partition-column value
        base = os.path.commonpath([os.path.dirname(f) for f in files])
        return (
            df.sparkSession.read.schema(df.schema)
            .option("basePath", base)
            .parquet(*sel)
        )
    pid = F.spark_partition_id()
    return df.filter((pid >= F.lit(start)) & (pid < F.lit(stop)))


def persist(df: DataFrame) -> DataFrame:
    """Materialize-on-first-use caching (dask persist)."""
    return df.cache()


def compute(df: DataFrame) -> list:
    """Eager evaluation to driver rows (dask compute)."""
    return df.collect()


def to_list(df: DataFrame) -> list[dict]:
    """ak.to_list: plain-Python nested values."""
    return [row.asDict(recursive=True) for row in df.collect()]


def visualize(df: DataFrame, extended: bool = False) -> str:
    """The query plan as text — the engine's task graph."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "extended" if extended else "formatted"
    )


def map_batches_pandas(
    df: DataFrame, fn: Callable[[object], object], schema: str
) -> DataFrame:
    """Convenience: per-batch pandas function lifted to the iterator
    protocol mapInPandas expects."""

    def gen(it: Iterator):
        for pdf in it:
            yield fn(pdf)

    return df.mapInPandas(gen, schema)


def copy(df: DataFrame) -> DataFrame:
    """ak.copy: DataFrames are immutable — identity. Parity:
    structure.py:copy."""
    return df


def to_packed(df: DataFrame) -> DataFrame:
    """ak.to_packed: Spark/Tungsten rows carry no unreachable buffers
    to strip — identity. Parity: structure.py:to_packed."""
    return df
