"""Round-4 batch-91: stream-static point-in-time enrichment."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_stream_pit_enrich
from etl_pipeline_project_spark.sources.readers import load_table


def test_stream_pit_enrich_covers_every_event_once(spark, sf_dir):
    out = q_stream_pit_enrich(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    # intervals partition time, so each event matches exactly one version
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()


def test_stream_pit_enrich_splits_on_the_cut(spark, sf_dir):
    rows = q_stream_pit_enrich(spark, sf_dir).collect()
    pre = {r["segment"] for r in rows if not r["segment"].startswith("POST-")}
    post = {r["segment"] for r in rows if r["segment"].startswith("POST-")}
    # both sides of the version cut appear, and POST names mirror pre names
    assert pre and post
    assert {f"POST-{s}" for s in pre} >= post
