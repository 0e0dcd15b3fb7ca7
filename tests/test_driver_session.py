"""Regression: the engine must work under a caller-supplied SparkSession
that has NONE of the engine's session configs (the round-1 driver harness
ran exactly that way and 11 queries died on PARQUET_TYPE_ILLEGAL for the
events table's TIMESTAMP(NANOS) column).

`load_table` is responsible for setting every runtime-settable conf it
depends on; these tests strip those confs first, then run the flagship
paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_pipeline_project_spark.queries import REGISTRY
from etl_pipeline_project_spark.sources.readers import load_table


@pytest.fixture()
def bare_confs(spark):
    """Simulate the driver's config-less session: unset the confs the
    engine's session factory normally bakes in, restore afterwards."""
    saved = {}
    for key in ("spark.sql.legacy.parquet.nanosAsLong",):
        saved[key] = spark.conf.get(key, None)
        try:
            spark.conf.unset(key)
        except Exception:
            pass
    yield spark
    for key, val in saved.items():
        if val is not None:
            spark.conf.set(key, val)


def test_load_events_without_engine_confs(bare_confs, sf_dir):
    ev = load_table(bare_confs, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    assert ev.limit(5).count() == 5


def test_flagship_time_dimension_without_engine_confs(bare_confs, sf_dir):
    out = REGISTRY["q_time_dimension"](bare_confs, sf_dir)
    cols = set(out.columns)
    assert {"timestamp_datetime", "jam", "hari", "tanggal", "bulan", "tahun"} <= cols
    assert out.count() > 0


def test_stream_ingest_without_engine_confs(bare_confs, sf_dir):
    out = REGISTRY["q_stream_ingest"](bare_confs, sf_dir)
    assert out.count() > 0
