"""Round-3 batch-77: temporal co-occurrence, conversion by path."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_conversion_by_path,
    q_temporal_cooccurrence,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_temporal_pairs_canonical(spark, sf_dir):
    rows = q_temporal_cooccurrence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_cooccur"] >= 1
    # at most C(5,2) unordered type pairs
    assert len(rows) <= 10


def test_conversion_by_path_covers_users(spark, sf_dir):
    rows = q_conversion_by_path(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_users"] for r in rows) == ev.select("user_id").distinct().count()
    purchasers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_converted"] for r in rows) == purchasers
    for r in rows:
        assert 0.0 <= r["conversion_rate"] <= 1.0
        assert r["conversion_rate"] == r["n_converted"] / r["n_users"]
