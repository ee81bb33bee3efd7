"""Structured Streaming over the events stream.

The streaming surface of the engine: file-source readStream ->
watermarked event-time windows -> sinks, plus an
applyInPandasWithState custom sessionizer (the stateful operator the
reference's users would hand-roll with map_partitions + carry-over
state).

The batch plans in plans/events.py run the SAME aggregations, so the
DuckDB oracle checks these semantics; tests/test_streaming.py runs
the streams to completion and asserts stream == batch.

Scale notes: windowed aggs shuffle once on (key, window) with
watermark-bounded state; the sessionizer keeps one small state row
per user (timeout-driven eviction), which is the canonical
applyInPandasWithState memory contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_GAP_US = 1_800_000_000

# Spark's default JSON timestampFormat keeps only milliseconds; event
# times are microsecond-resolution, so both the writer (tests/feeders)
# and the stream reader must pin a micros-preserving format.
JSON_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def stream_events_from_dir(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream of events (json lines written by tests /
    upstream collectors). maxFilesPerTrigger bounds batch size (files
    are picked up oldest-modification-time first, so tests can stage
    late arrivals as later files)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("timestampFormat", JSON_TS_FORMAT)
        .json(path)
    )


def windowed_counts(stream: DataFrame, window: str = "15 minutes", watermark: str = "1 hour"):
    """Event-time tumbling window per event_type with late-data
    watermark (tests pin it to its batch twin — since the late-r14 leg
    relocation that twin is the registered q_events_windowed slot
    itself again; the rollup cascade lives in
    q_events_funnel_retention)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w")["start"]).alias("bucket_start"),
            "n",
            "sum_value_c",
        )
    )


def sessionize_stateful(
    stream: DataFrame, gap_us: int = SESSION_GAP_US, watermark: str = "1 hour"
):
    """Custom stateful operator: per-user gap sessionization with
    applyInPandasWithState. Emits one row per CLOSED session
    (user_id, session_start_us, n_events); open sessions stay in
    state until the event-time gap timeout closes them.

    Uses EventTimeTimeout (not ProcessingTimeTimeout): session close
    is an event-time fact, the watermark makes eviction deterministic
    under replay, and — operationally — processing-time timeouts force
    the no-new-data micro-batch loop that never lets Trigger.AvailableNow
    terminate.

    Late-data correctness: state buffers the user's not-yet-emitted
    event times (sorted), and every batch re-sessionizes the merged
    buffer — an out-of-order event admitted by the watermark lands in
    its time-order position, extending/bridging sessions exactly as a
    batch computation would. A session is EMITTED only once the
    watermark passes its last event + gap, at which point no admissible
    event can extend or bridge it (any future event has ts >= watermark
    > last + gap), so emissions are final. State is bounded by the
    watermark horizon per user: emitted sessions' events are dropped,
    and the watermark caps how far back an un-emittable event can sit.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, session_start_us long, n_events long"
    state_schema = "times array<long>"

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        buf: list[int] = []
        if state.exists:
            (times,) = state.get
            buf.extend(times)
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                buf.extend((pdf["ts"].astype("int64") // 1000).tolist())
        buf.sort()
        if not buf:
            state.remove()
            return

        # session boundaries over the merged, sorted buffer
        sessions = []  # (start index, end index) half-open
        s = 0
        for i in range(1, len(buf)):
            if buf[i] - buf[i - 1] > gap_us:
                sessions.append((s, i))
                s = i
        sessions.append((s, len(buf)))

        out = []
        keep_from = len(buf)
        first_kept_last = None
        for a, b in sessions:
            last = buf[b - 1]
            if last + gap_us <= wm_us:
                out.append((user_id, buf[a], b - a))
            else:
                keep_from = a
                first_kept_last = last
                break
        kept = buf[keep_from:]
        if kept:
            state.update((kept,))
            # wake when the earliest kept session becomes closeable;
            # must be strictly beyond the current watermark
            state.setTimeoutTimestamp(
                max((first_kept_last + gap_us) // 1000, wm_ms + 1)
            )
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in out],
                    "session_start_us": [c[1] for c in out],
                    "n_events": [c[2] for c in out],
                }
            )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DF to a memory sink until all input is
    consumed; returns the in-memory table name.

    Uses Trigger.AvailableNow: the query processes everything the
    source currently has and then terminates itself. This matters for
    stateful operators with ProcessingTimeTimeout, where the default
    trigger schedules empty micro-batches forever to poll for timed-out
    state, so ``processAllAvailable()`` never observes an idle query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def stream_dedup_exact(stream: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"):
    """Streaming exact dedup: keep the first arrival per key within
    the watermark horizon (the streaming face of
    functions.dedup.exact_dedup).

    State holds one entry per key seen and is evicted once the
    watermark passes — bounded memory under any input rate, which is
    the contract that lets this run forever on the collector feed.
    """
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_with_dim(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins the (small) static
    dimension. Spark broadcasts the static side per batch — no
    stateful join state, no watermark requirement; the standard way to
    decorate an event stream with reference data."""
    return stream.join(F.broadcast(dim), on)


def run_stream_to_parquet(stream_df: DataFrame, path: str, checkpoint: str):
    """Drive a stream into parquet via foreachBatch with a checkpoint.

    Exactly-once comes from idempotent replay: each batch overwrites
    its own ``batch_id=N`` subdirectory, so a batch re-run after a
    crash-before-checkpoint-commit replaces its earlier partial output
    instead of appending duplicates. Readers of ``path`` see batch_id
    as an extra partition column. Processes everything currently
    available, then stops."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stream_attribution_join(
    stream: DataFrame,
    first_type: str = "view",
    then_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INTERVAL join: attribute each ``then_type`` event
    to every ``first_type`` event by the same user in the preceding
    ``within`` window — the canonical attribution shape (view ->
    purchase), expressed as two watermarked streams over the same
    source.

    Scale/state contract: both sides carry a watermark and the join
    condition bounds event-time distance, so Spark evicts buffered
    rows once the watermark passes their join horizon — state is
    O(rate x within), never unbounded. The equi-part of the condition
    (user_id) is the shuffle key; the range part prunes in-state.
    Inner joins under AvailableNow are exactly the batch interval
    join, which is the pytest oracle."""
    v = (
        stream.filter(F.col("event_type") == first_type)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_event"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    p = (
        stream.filter(F.col("event_type") == then_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_event"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("v_user").alias("user_id"),
        "v_event",
        "p_event",
        F.unix_micros("v_ts").alias("v_us"),
        F.unix_micros("p_ts").alias("p_us"),
    )


def streaming_rollup(
    stream: DataFrame,
    ts_col: str,
    grain: str,
    measures: dict,
    group_by: list[str] | None = None,
    distinct_cols: list[str] | None = None,
    watermark: str = "1 hour",
    lg_k: int = 12,
):
    """Continuous-aggregate maintenance: the streaming face of
    functions.rollup.rollup_once. Incoming events fold into
    time-bucketed rollup rows as they arrive; the watermark bounds
    both late-data admission and per-bucket state lifetime (a bucket
    finalizes once the watermark passes its end, exactly the window
    state contract). Distinct counts are carried as HLL sketches, so
    the emitted rollup table cascades upward with
    functions.rollup-style re-aggregation — write the finest grain
    from the stream, derive day/month/year in batch without touching
    raw events again.

    Measures use rollup.py's prefix contract (sum_/min_/max_/n_) so
    the emitted table is cascade-ready; validated before the stream
    starts, not at runtime.
    """
    from dask_awkward_sandbox_spark.functions.rollup import (
        _reagg_column,
        time_bucket,
    )

    for name in measures:
        _reagg_column(name)  # fail before the query launches
    aggs = [expr.alias(name) for name, expr in measures.items()]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    for c in distinct_cols or []:
        aggs.append(F.hll_sketch_agg(F.col(c), F.lit(lg_k)).alias(f"hll_{c}"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            time_bucket(F.col(ts_col), grain).alias("bucket"),
            *(group_by or []),
        )
        .agg(*aggs)
    )
