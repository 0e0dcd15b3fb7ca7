from etl_pipeline_project_spark.functions.keys import concat_key, hash_key
from etl_pipeline_project_spark.functions.timefn import time_dimension_cols
from etl_pipeline_project_spark.functions.scalars import coalesce_first

__all__ = ["concat_key", "hash_key", "time_dimension_cols", "coalesce_first"]
