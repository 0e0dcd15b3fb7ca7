"""Round-3 batch-33: rolling exact distinct (bitmap MAU)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_rolling_mau
from etl_pipeline_project_spark.sources.readers import load_table


def test_rolling_mau_bounds(spark, sf_dir):
    out = q_rolling_mau(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    n_users = ev.select("user_id").distinct().count()
    assert out.count() == n_days
    # 7-day distinct is at least the single-day distinct and at most all users
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.countDistinct("user_id").alias("d1")
    )
    joined = out.join(daily, "day")
    assert joined.filter(F.col("active_users_7d") < F.col("d1")).count() == 0
    assert out.filter(F.col("active_users_7d") > n_users).count() == 0


def test_rolling_mau_is_monotone_in_window_growth(spark, sf_dir):
    # days 2..7 accumulate history, so the first week is non-decreasing
    rows = sorted(
        q_rolling_mau(spark, sf_dir).collect(), key=lambda r: r["day"]
    )[:7]
    vals = [r["active_users_7d"] for r in rows]
    assert vals == sorted(vals)
