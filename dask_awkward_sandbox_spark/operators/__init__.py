from dask_awkward_sandbox_spark.operators import joins, reducers, strings, structure

__all__ = ["structure", "reducers", "strings", "joins"]
