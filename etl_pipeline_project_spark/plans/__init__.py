from etl_pipeline_project_spark.plans.adapter import ADAPTER_CTE, derive_reference_tables
from etl_pipeline_project_spark.plans.mart import build_mart
from etl_pipeline_project_spark.plans.operational import load_operational

__all__ = ["ADAPTER_CTE", "derive_reference_tables", "build_mart", "load_operational"]
