from dask_awkward_sandbox_spark.functions import (
    bpe,
    dedup,
    jpegcodec,
    lm,
    multimodal,
    quality_filters,
    rollup,
    similarity,
    sketches,
    text_analysis,
)

__all__ = [
    "bpe",
    "dedup",
    "jpegcodec",
    "lm",
    "similarity",
    "rollup",
    "sketches",
    "text_analysis",
    "multimodal",
    "quality_filters",
]
