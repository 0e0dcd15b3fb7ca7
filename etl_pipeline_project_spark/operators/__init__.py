from etl_pipeline_project_spark.operators.dedup import dedup_keyed, distinct_values
from etl_pipeline_project_spark.operators.joins import anti_incremental, left_enrich
from etl_pipeline_project_spark.operators.relational import (
    drop_null_rows,
    rename_columns,
    select_existing,
)
from etl_pipeline_project_spark.operators.setops import union_all, union_single_column

__all__ = [
    "dedup_keyed",
    "distinct_values",
    "anti_incremental",
    "left_enrich",
    "drop_null_rows",
    "rename_columns",
    "select_existing",
    "union_all",
    "union_single_column",
]
