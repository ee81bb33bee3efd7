from dask_awkward_sandbox_spark.functions import (
    dedup,
    lm,
    multimodal,
    quality_filters,
    rollup,
    similarity,
    sketches,
    text_analysis,
)

__all__ = [
    "dedup",
    "lm",
    "similarity",
    "rollup",
    "sketches",
    "text_analysis",
    "multimodal",
    "quality_filters",
]
