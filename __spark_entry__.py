"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``etl_pipeline_project_spark``; this module is
the thin contract adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_project_spark.queries import ORACLE, REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the dim_waktu time-dimension
    build (reference `data/transformation_dw.py:136-153`) — union the
    timestamp columns of orders/lineitem/events, distinct non-null, derive
    jam/hari/tanggal/bulan/tahun."""
    return REGISTRY["q_time_dimension"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(REGISTRY)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query key."""
    return dict(ORACLE)
