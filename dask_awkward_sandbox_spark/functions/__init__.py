from dask_awkward_sandbox_spark.functions import (
    dedup,
    multimodal,
    quality_filters,
    rollup,
    similarity,
    sketches,
    text_analysis,
)

__all__ = [
    "dedup",
    "similarity",
    "rollup",
    "sketches",
    "text_analysis",
    "multimodal",
    "quality_filters",
]
