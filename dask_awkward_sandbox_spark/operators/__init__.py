from dask_awkward_sandbox_spark.operators import reducers, strings, structure

__all__ = ["structure", "reducers", "strings"]
