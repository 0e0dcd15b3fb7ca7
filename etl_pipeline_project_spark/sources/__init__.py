from etl_pipeline_project_spark.sources.readers import (
    load_table,
    read_csv_glob,
    scan_keys,
)
from etl_pipeline_project_spark.sources.sinks import (
    write_append,
    write_csv,
    write_overwrite,
)

__all__ = [
    "load_table",
    "read_csv_glob",
    "scan_keys",
    "write_append",
    "write_csv",
    "write_overwrite",
]
