"""Round-4 batch-90: streaming Python DataSource (offset-tracked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_stream_python_source


def test_stream_python_source_drains_exactly_once(spark, sf_dir):
    out = q_stream_python_source(spark, sf_dir)
    rows = {r["mod7"]: r for r in out.collect()}
    assert len(rows) == 7
    # each id 0..999 exactly once across all micro-batches
    assert sum(r["n"] for r in rows.values()) == 1000
    assert min(r["min_id"] for r in rows.values()) == 0
    assert max(r["max_id"] for r in rows.values()) == 999
    for m, r in rows.items():
        want = sum((x * x) % 101 for x in range(1000) if x % 7 == m)
        assert r["sum_score"] == want


def test_stream_python_source_idempotent_rerun(spark, sf_dir):
    a = {tuple(r) for r in q_stream_python_source(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_stream_python_source(spark, sf_dir).collect()}
    assert a == b
