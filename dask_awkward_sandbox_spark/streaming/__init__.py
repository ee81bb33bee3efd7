from dask_awkward_sandbox_spark.streaming.curation import stream_curation_scores
from dask_awkward_sandbox_spark.streaming.neardup import stream_neardup_dedup
from dask_awkward_sandbox_spark.streaming.similarity import stream_ivf_append
from dask_awkward_sandbox_spark.streaming.events import (
    enrich_with_dim,
    run_stream_to_parquet,
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
    "enrich_with_dim",
    "run_stream_to_parquet",
    "stream_ivf_append",
    "stream_neardup_dedup",
    "stream_curation_scores",
]
