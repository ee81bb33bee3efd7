from dask_awkward_sandbox_spark.streaming.events import (
    sessionize_stateful,
    stream_dedup_exact,
    stream_events_from_dir,
    windowed_counts,
)

__all__ = [
    "stream_events_from_dir",
    "windowed_counts",
    "sessionize_stateful",
    "stream_dedup_exact",
]
