"""PySpark-native nested-array analytics engine.

A from-scratch re-expression of the capabilities of dask-awkward
(reference: /root/reference, ContinuumIO/dask-awkward-sandbox) on
Apache Spark. The mapping:

- a partitioned awkward ``Array`` of nested values  ->  a Spark
  ``DataFrame`` with complex-typed columns (``array<T>``, ``struct``,
  ``array<struct>``);
- awkward axis=1 operations (per-list)  ->  JVM-side higher-order
  functions (``transform``/``filter``/``aggregate``/``zip_with``)
  composed as Column -> Column functions (see ``operators/``);
- awkward axis=0 / full reductions  ->  ``groupBy().agg()`` / global
  aggregation;
- the Dask task graph + necessary-columns optimization  ->  Catalyst
  logical plans + nested-schema pruning;
- ``map_partitions``  ->  ``mapInArrow`` / ``mapInPandas``.

Everything in the per-row hot path stays inside Spark whole-stage
codegen; Python UDFs appear only where semantics genuinely require
them (none of the reference's operator surface does).
"""

from dask_awkward_sandbox_spark.session import get_spark, load_tables, TABLES
from dask_awkward_sandbox_spark import core
from dask_awkward_sandbox_spark import inspect
from dask_awkward_sandbox_spark.operators import reducers, strings, structure
# the reference exposes the string namespace as `dak.str` (its
# __init__.py:9 does `import dask_awkward.lib.str as str`); mirror the
# attribute so ported `dak.str.split_whitespace(...)` calls resolve
from dask_awkward_sandbox_spark.operators import strings as str  # noqa: A001

# Flat namespace mirroring the reference's `import dask_awkward as dak`
# export surface (reference src/dask_awkward/__init__.py) — the verbs a
# reference user calls as dak.flatten(...) resolve here the same way.
# Of the documented API (reference docs/api/*.rst) only the
# dask/awkward in-memory interop constructors (from_awkward,
# from_dask_array, to_dask_array, to_dask_bag) remain non-goals
# (SURVEY §3: neither library ships with a Spark cluster);
# from_delayed/to_delayed have per-partition lazy-frame analogues.
from dask_awkward_sandbox_spark.core import (  # noqa: F401
    PartitionCompatibility,
    compatible_partitions,
    compute,
    head,
    map_partitions,
    partition_compatibility,
    persist,
    repartition,
    to_list,
    to_packed,
    visualize,
)
from dask_awkward_sandbox_spark.core import copy as copy  # noqa: PLC0414
from dask_awkward_sandbox_spark.inspect import (  # noqa: F401
    backend,
    fields,
    ndim,
    report_necessary_buffers,
    report_necessary_columns,
    sample,
    typestr,
)
from dask_awkward_sandbox_spark.inspect import typestr as type  # noqa: A001
from dask_awkward_sandbox_spark.io import (  # noqa: F401
    from_avro,
    from_csv,
    from_delayed,
    from_json,
    from_lists,
    from_map,
    from_orc,
    from_parquet,
    from_root,
    layout_to_jsonschema,
    from_text,
    to_avro,
    to_csv,
    to_dataframe,
    to_delayed,
    to_json,
    to_orc,
    to_parquet,
)
from dask_awkward_sandbox_spark.operators.elementwise import (  # noqa: F401
    NestedArray,
    elementwise,
)
from dask_awkward_sandbox_spark.operators.getitem import getitem  # noqa: F401
from dask_awkward_sandbox_spark.operators.histogram import (  # noqa: F401
    histogram,
    histogram2d,
    histogram_axis1,
    histogram_global,
)
from dask_awkward_sandbox_spark.operators.reducers import (  # noqa: F401
    argmax,
    argmin,
    corr,
    count,
    count_nonzero,
    covar,
    linear_fit,
    mean,
    moment,
    prod,
    ptp,
    softmax,
    std,
    var,
)
from dask_awkward_sandbox_spark.operators.reducers import all as all  # noqa: A001
from dask_awkward_sandbox_spark.operators.reducers import any as any  # noqa: A001
from dask_awkward_sandbox_spark.operators.reducers import max as max  # noqa: A001
from dask_awkward_sandbox_spark.operators.reducers import min as min  # noqa: A001
from dask_awkward_sandbox_spark.operators.reducers import sum as sum  # noqa: A001
from dask_awkward_sandbox_spark.operators.structure import (  # noqa: F401
    argcartesian,
    argcombinations,
    argsort,
    broadcast_arrays,
    cartesian,
    combinations,
    concatenate,
    drop_none,
    fill_none,
    firsts,
    flatten,
    from_regular,
    full_like,
    is_none,
    isclose,
    local_index,
    mask,
    nan_to_num,
    num,
    ones_like,
    pad_none,
    ravel,
    run_lengths,
    singletons,
    sort,
    strings_astype,
    to_regular,
    unflatten,
    unzip,
    values_astype,
    where,
    with_field,
    with_parameter,
    without_field,
    without_parameters,
    zeros_like,
)
from dask_awkward_sandbox_spark.operators.structure import zip as zip  # noqa: A001
from dask_awkward_sandbox_spark import utils  # noqa: F401
from dask_awkward_sandbox_spark.utils import (  # noqa: F401
    ConcretizationTypeError,
    IncompatiblePartitions,
    assert_compatible_partitions,
)
from dask_awkward_sandbox_spark.operators.behaviors import (  # noqa: F401
    behavior_from_parameters,
    dask_method,
    dask_property,
    mixin_class,
    mixin_class_method,
)


def with_name(df_or_array, *args, **kwargs):
    """ak.with_name, both halves: on a DataFrame (``with_name(df,
    column, name)``) sets the ``__record__`` schema-metadata parameter
    (:func:`operators.structure.with_name` — parquet-transported); on
    a NestedArray / Column (``with_name(arr, name, behavior=...)``)
    attaches the record name + mixin registry for behavior dispatch
    (:func:`operators.behaviors.with_name` — reference
    tests/test_behavior.py)."""
    from pyspark.sql import Column as _Column

    from dask_awkward_sandbox_spark.operators import behaviors as _behaviors
    from dask_awkward_sandbox_spark.operators import structure as _structure

    if isinstance(df_or_array, (_Column, NestedArray)):
        return _behaviors.with_name(df_or_array, *args, **kwargs)
    return _structure.with_name(df_or_array, *args, **kwargs)

__all__ = [
    "get_spark",
    "load_tables",
    "TABLES",
    "core",
    "inspect",
    "structure",
    "reducers",
    "strings",
]

# The reference's three collection types, mapped to this engine's
# (SURVEY §2 "Array/Record/Scalar ≙ DataFrame w/ complex cols"):
# a lazy ragged collection IS a DataFrame of nested columns; one lazy
# record is a Row; a lazy scalar is an unevaluated Column expression
# (NestedArray wraps the list-typed case). Exported so user code and
# isinstance checks written against the reference's names port over.
from pyspark.sql import Column as Scalar  # noqa: F401, E402
from pyspark.sql import DataFrame as Array  # noqa: F401, E402
from pyspark.sql import Row as Record  # noqa: F401, E402

__version__ = "0.1.0"
