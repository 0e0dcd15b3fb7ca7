"""Round-3 batch-39: streaming hopping windows + deterministic sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_bloom_membership,
    q_cms_heavy_hitters,
    q_stream_hopping,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_stream_hopping_equals_batch_hopping(spark, sf_dir):
    out = q_stream_hopping(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_cms_overestimates_only(spark, sf_dir):
    rows = q_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cms_estimate"] >= r["true_count"] > 0


def test_bloom_no_false_negatives(spark, sf_dir):
    r = q_bloom_membership(spark, sf_dir).first()
    # every true member must probe positive
    assert r["n_positive"] >= r["n_members"]
    assert r["n_positive"] - r["n_false_positive"] == r["n_members"]
    assert 0 <= r["n_false_positive"] <= r["n_probes"] - r["n_members"]
