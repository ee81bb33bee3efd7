"""Lakehouse-style mutable-table operations on plain parquet.

The r5 verdict's item 5 asked for a Delta/Iceberg sink with
MERGE-based upsert dedup — the production shape of streaming exact
dedup at 100 TB. This container has NO lakehouse jars (pyspark 4.1.2
ships 287 jars; `grep -iE 'delta|iceberg|hudi'` over them matches
nothing but avro, `import delta` raises ModuleNotFoundError, and the
environment is offline — `probe_lakehouse()` records the exact
failures). So this module implements the OPERATIONAL CONTRACT those
formats provide for upsert — "a MERGE touches only the files holding
matched keys, and replaying the same batch is a no-op" — on plain
parquet, via the one mutation primitive vanilla Spark does have:
dynamic partition overwrite.

Layout: the table is partitioned by ``_mbucket = pmod(xxhash64(key),
n_buckets)``. An upsert batch computes the bucket set its keys touch,
reads ONLY those partitions back (directory pruning — the read never
scans the untouched 100 TB), anti-joins the old rows whose key is
being replaced, unions the new rows, and dynamic-overwrites exactly
the touched partition directories. Cost per merge is O(batch +
touched-bucket bytes), not O(table) — the same asymptotics as a
Delta MERGE over a key-clustered table (file-level skipping there,
directory-level here; a real deployment sizes n_buckets so a bucket
is a few GB).

Idempotence: replaying a batch rewrites the same buckets with the
same contents — exactly-once results from at-least-once delivery,
which is what `merge_sink` (the foreachBatch streaming face) needs.

NOT provided (recorded in SURVEY §3): time travel, snapshot
isolation for concurrent writers, and schema evolution — those need
a transaction log, i.e. the missing jars. Single-writer pipelines
(the training-data-curation shape) don't need them for correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_mbucket"


def probe_lakehouse() -> dict[str, str]:
    """Record exactly why the real formats are unavailable here —
    {format: error}. Empty dict would mean a real sink is possible."""
    out: dict[str, str] = {}
    try:
        import delta  # noqa: F401
    except Exception as e:  # pragma: no cover - environment-dependent
        out["delta"] = f"{type(e).__name__}: {e}"
    try:
        import os

        import pyspark

        jars = os.listdir(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
        hits = [j for j in jars if any(k in j.lower() for k in ("iceberg", "hudi"))]
        if not hits:
            out["iceberg"] = f"no iceberg/hudi jar among {len(jars)} bundled jars"
    except Exception as e:  # pragma: no cover
        out["iceberg"] = f"{type(e).__name__}: {e}"
    return out


def _with_bucket(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    )


def create_merge_table(
    df: DataFrame, path: str, keys: list[str], n_buckets: int = 64
) -> None:
    """Materialize the initial table, hash-partitioned on the merge
    key so later upserts prune to touched buckets. ``n_buckets`` is a
    physical-layout choice: size it so one bucket's bytes are a
    comfortable task unit at the target scale (64 here for testdata;
    thousands at 100 TB)."""
    _with_bucket(df, keys, n_buckets).write.partitionBy(BUCKET_COL).mode(
        "overwrite"
    ).parquet(path)


def read_merge_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back without the layout column."""
    return spark.read.parquet(path).drop(BUCKET_COL)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    n_buckets: int = 64,
) -> None:
    """MERGE (upsert): rows in ``updates`` replace same-key rows in
    the table; new keys insert. Duplicate keys WITHIN the batch are
    collapsed deterministically (min over the full remaining row, so
    replay order cannot change the outcome).

    Only the partitions whose bucket appears in the batch are read
    and rewritten: ``spark.sql.sources.partitionOverwriteMode=dynamic``
    scoped to this write. The untouched table is never scanned."""
    upd = _with_bucket(updates, keys, n_buckets)
    # deterministic within-batch collapse: ONE whole row per key (the
    # struct-min picks the lexicographically smallest full row, so
    # columns never mix across duplicate rows and replay order cannot
    # change the outcome)
    others = [c for c in upd.columns if c not in keys and c != BUCKET_COL]
    upd = (
        upd.groupBy(*keys, BUCKET_COL)
        .agg(F.min(F.struct(*[F.col(c) for c in others])).alias("_r"))
        .select(*keys, BUCKET_COL, *[F.col(f"_r.{c}").alias(c) for c in others])
    )
    touched = [r[BUCKET_COL] for r in upd.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return
    existing = (
        spark.read.parquet(path)
        .filter(F.col(BUCKET_COL).isin(touched))
        .join(upd.select(*keys), keys, "left_anti")
    )
    out = existing.unionByName(upd.select(*existing.columns))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def merge_dedup_sink(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    n_buckets: int = 64,
):
    """The streaming face: foreachBatch MERGE — the production shape
    of streaming exact dedup. dropDuplicatesWithinWatermark bounds
    state by TIME; this bounds it by KEY SPACE for keys that can
    recur beyond any watermark (document ids in a curation pipeline):
    every micro-batch upserts, so the TABLE is the dedup state, with
    no executor-memory growth. Replayed batches (at-least-once
    sources) rewrite the same buckets with the same bytes —
    exactly-once table contents."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        import os

        if not os.path.isdir(path):
            create_merge_table(batch_df, path, keys, n_buckets)
        else:
            merge_upsert(spark, path, batch_df, keys, n_buckets)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
