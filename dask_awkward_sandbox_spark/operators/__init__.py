from dask_awkward_sandbox_spark.operators import (
    elementwise,
    getitem,
    joins,
    reducers,
    strings,
    structure,
)

__all__ = ["structure", "reducers", "strings", "joins", "elementwise", "getitem"]
