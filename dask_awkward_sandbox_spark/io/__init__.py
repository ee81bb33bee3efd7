from dask_awkward_sandbox_spark.io.csv import (
    from_avro,
    from_csv,
    from_orc,
    to_avro,
    to_csv,
    to_orc,
)
from dask_awkward_sandbox_spark.io.json import (
    from_json,
    layout_to_jsonschema,
    schema_to_jsonschema,
    to_json,
)
from dask_awkward_sandbox_spark.io.parquet import (
    from_parquet,
    from_table,
    to_bucketed_table,
    to_parquet,
)
from dask_awkward_sandbox_spark.io.root import (
    RawRootBackend,
    SyntheticNanoBackend,
    UprootBackend,
    from_root,
    from_root_projected,
    necessary_branches,
)
from dask_awkward_sandbox_spark.io.text import from_text
from dask_awkward_sandbox_spark.io.io import (
    from_delayed,
    from_lists,
    from_map,
    to_dataframe,
    to_delayed,
)

__all__ = [
    "from_csv",
    "to_csv",
    "from_orc",
    "to_orc",
    "from_avro",
    "to_avro",
    "from_json",
    "layout_to_jsonschema",
    "schema_to_jsonschema",
    "to_json",
    "from_parquet",
    "to_parquet",
    "to_bucketed_table",
    "from_table",
    "from_root",
    "from_root_projected",
    "necessary_branches",
    "UprootBackend",
    "SyntheticNanoBackend",
    "RawRootBackend",
    "from_text",
    "from_lists",
    "from_map",
    "from_delayed",
    "to_delayed",
    "to_dataframe",
]
