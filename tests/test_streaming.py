"""Structured-streaming tests: stream results must equal the batch
plans computed over the same events (which are themselves
oracle-checked in test_oracle_parity)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SCRATCH = "/root/repo/.scratch/streamtest"


def _write_stream_input(spark):
    from dask_awkward_sandbox_spark.plans.common import read

    path = os.path.join(SCRATCH, "events_json")
    e = read(spark, SF, "events")
    # single file: the file-source offers no cross-file time ordering,
    # and gap sessionization needs in-order arrival (the in-batch sort
    # handles intra-file order)
    from dask_awkward_sandbox_spark.streaming.events import JSON_TS_FORMAT

    e.repartition(1).write.mode("overwrite").option(
        "timestampFormat", JSON_TS_FORMAT
    ).json(path)
    return path


def test_windowed_counts_stream_equals_batch(spark):
    from dask_awkward_sandbox_spark.plans.events import q_events_windowed
    from dask_awkward_sandbox_spark.streaming import (
        stream_events_from_dir,
        windowed_counts,
    )
    from dask_awkward_sandbox_spark.streaming.events import run_stream_to_memory

    path = _write_stream_input(spark)
    stream = stream_events_from_dir(spark, path)
    assert stream.isStreaming
    name = run_stream_to_memory(windowed_counts(stream), "win_counts")
    got = {
        (r["event_type"], r["bucket_start"]): (r["n"], r["sum_value_c"])
        for r in spark.table(name).collect()
    }
    want = {
        (r["event_type"], r["bucket_start"]): (r["n"], r["sum_value_c"])
        for r in q_events_windowed(spark, SF).collect()
    }
    assert got == want


def test_sessionize_stateful_closed_sessions(spark):
    """The stateful sessionizer's closed sessions must agree with the
    batch (window-function) sessionization for every session that is
    closed by a later event. (The final open session per user only
    closes on timeout, so it is excluded from the comparison.)"""
    from pyspark.sql import Window

    from dask_awkward_sandbox_spark.plans.common import read
    from dask_awkward_sandbox_spark.streaming import sessionize_stateful
    from dask_awkward_sandbox_spark.streaming.events import (
        SESSION_GAP_US,
        stream_events_from_dir,
    )

    path = _write_stream_input(spark)
    stream = stream_events_from_dir(spark, path)
    out = sessionize_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start_us"]): r["n_events"]
        for r in spark.table("sessions").collect()
    }

    # batch reference: window-function sessionization, drop each user's
    # last session (still open in the stateful version)
    e = read(spark, SF, "events")
    byu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tus = F.unix_micros(F.col("ts"))
    prev = F.lag(tus).over(byu)
    byu_flat = Window.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        tus.alias("tus"),
        F.when(prev.isNull() | ((tus - prev) > SESSION_GAP_US), 1).otherwise(0).alias("ns"),
    ).withColumn(
        "sess", F.sum("ns").over(byu_flat.rowsBetween(Window.unboundedPreceding, 0))
    )
    per = flagged.groupBy("user_id", "sess").agg(
        F.min("tus").alias("start_us"), F.count(F.lit(1)).alias("n")
    )
    wmax = Window.partitionBy("user_id")
    closed = per.withColumn("maxs", F.max("sess").over(wmax)).filter(
        F.col("sess") < F.col("maxs")
    )
    want = {
        (r["user_id"], r["start_us"]): r["n"] for r in closed.collect()
    }
    # every batch-closed session must appear identically in the stream output
    for k, v in want.items():
        assert got.get(k) == v, f"session {k}: stream={got.get(k)} batch={v}"


def test_stream_dedup_exact(spark):
    """Planted duplicates (the input written twice) must collapse to
    the distinct event set, matching batch dropDuplicates."""
    from dask_awkward_sandbox_spark.plans.common import read
    from dask_awkward_sandbox_spark.streaming import stream_dedup_exact
    from dask_awkward_sandbox_spark.streaming.events import (
        JSON_TS_FORMAT,
        run_stream_to_memory,
        stream_events_from_dir,
    )

    path = os.path.join(SCRATCH, "events_dup_json")
    e = read(spark, SF, "events")
    doubled = e.unionAll(e)
    doubled.repartition(1).write.mode("overwrite").option(
        "timestampFormat", JSON_TS_FORMAT
    ).json(path)

    stream = stream_events_from_dir(spark, path)
    name = run_stream_to_memory(
        stream_dedup_exact(stream, ["event_id"]), "dedup_events", output_mode="append"
    )
    got = spark.table(name).count()
    want = e.select("event_id").distinct().count()
    assert got == want


def test_enrich_with_dim_and_parquet_sink(spark):
    """Stream-static join decorates each event with its user's dim row;
    the foreachBatch parquet sink lands exactly the input rows."""
    import shutil

    from pyspark.sql import functions as F

    from dask_awkward_sandbox_spark.plans.common import read
    from dask_awkward_sandbox_spark.streaming import (
        enrich_with_dim,
        run_stream_to_parquet,
    )
    from dask_awkward_sandbox_spark.streaming.events import stream_events_from_dir

    path = _write_stream_input(spark)
    users = (
        read(spark, SF, "events")
        .select("user_id")
        .distinct()
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "a").otherwise("b"))
    )
    out_dir = os.path.join(SCRATCH, "enriched_parquet")
    ckpt = os.path.join(SCRATCH, "enriched_ckpt")
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    stream = stream_events_from_dir(spark, path)
    enriched = enrich_with_dim(stream, users, "user_id")
    run_stream_to_parquet(enriched, out_dir, ckpt)

    back = spark.read.parquet(out_dir)
    src = read(spark, SF, "events")
    assert back.count() == src.count()
    assert "tier" in back.columns
    got = {r["user_id"]: r["tier"] for r in back.select("user_id", "tier").distinct().collect()}
    assert all(t == ("a" if uid % 2 == 0 else "b") for uid, t in got.items())
