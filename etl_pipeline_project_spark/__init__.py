"""etl_pipeline_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of
saalwalf/ETL-Pipeline-Project (a pandas + Airflow ETL: API/CSV ingestion,
keyed dedup, rename/project/NOT-NULL filtering, incremental anti-join
loads, and a 7-dim + 4-fact star schema with a derived time dimension),
rebuilt on idiomatic Spark: DataFrame/SQL on Catalyst for batch,
Structured Streaming for the incremental-load pattern, every operator
designed for 100 TB scale (partitioned ingest, broadcast/anti joins, AQE,
no driver-side materialization).

See SURVEY.md for the operator inventory and the reference file:line map.
"""

from etl_pipeline_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
