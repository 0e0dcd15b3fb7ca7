"""Round-4 batch-88: streaming SCD2 maintenance."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_stream_scd2
from etl_pipeline_project_spark.sources.readers import load_table


def test_stream_scd2_one_open_version_per_user(spark, sf_dir):
    v = q_stream_scd2(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    open_per_user = v.filter(F.col("is_current")).groupBy("user_id").count()
    assert open_per_user.count() == n_users
    assert open_per_user.filter(F.col("count") != 1).count() == 0


def test_stream_scd2_intervals_contiguous(spark, sf_dir):
    """Consecutive versions chain exactly: valid_to of one = valid_from of
    the next; attribute changes at every boundary."""
    v = q_stream_scd2(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("valid_from")
    x = v.select(
        "user_id",
        "event_type",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    closed = x.filter(F.col("next_from").isNotNull())
    assert closed.filter(F.col("valid_to") != F.col("next_from")).count() == 0
    assert closed.filter(F.col("event_type") == F.col("next_type")).count() == 0


def test_stream_scd2_double_run_exactly_once(spark, sf_dir):
    a = {tuple(r) for r in q_stream_scd2(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_stream_scd2(spark, sf_dir).collect()}
    assert a == b
