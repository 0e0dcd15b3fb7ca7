"""Round-3 batch-28: bitmap exact distinct, chi-square test, Holt
linear-trend smoothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_bitmap_distinct,
    q_chi_square,
    q_holt_linear,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    out = {
        r["event_type"]: r["n_distinct_users"]
        for r in q_bitmap_distinct(spark, sf_dir).collect()
    }
    direct = {
        r["event_type"]: r["d"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert out == direct


def test_chi_square_non_negative_and_cells_bounded(spark, sf_dir):
    r = q_chi_square(spark, sf_dir).first()
    assert r["chi2"] >= 0.0
    ev = load_table(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    assert r["n_cells"] <= n_types * 7


def test_holt_constant_series_has_zero_trend(spark):
    # synthetic: constant series -> level == the constant, trend == 0
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 5,
            "event_id": range(5),
            "value": [7.0] * 5,
            "ts": pd.date_range("2024-01-01", periods=5, freq="h"),
        }
    )
    sdf = spark.createDataFrame(pdf)
    agg = sdf.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "series"
        )
    )
    vals = F.transform(F.col("series"), lambda s: s["value"].cast("double"))
    init = F.struct(
        F.element_at(vals, 1).alias("l"),
        (F.element_at(vals, 2) - F.element_at(vals, 1)).alias("b"),
    )
    rest = F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0)))

    def step(acc, x):
        nl = F.lit(0.2) * x + F.lit(0.8) * (acc["l"] + acc["b"])
        nb = F.lit(0.1) * (
            (F.lit(0.2) * x + F.lit(0.8) * (acc["l"] + acc["b"])) - acc["l"]
        ) + F.lit(0.9) * acc["b"]
        return F.struct(nl.alias("l"), nb.alias("b"))

    st = F.aggregate(rest, init, step)
    row = agg.select(st["l"].alias("level"), st["b"].alias("trend")).first()
    assert abs(row["level"] - 7.0) < 1e-12
    assert abs(row["trend"]) < 1e-12


def test_holt_series_count_matches(spark, sf_dir):
    out = q_holt_linear(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    n_multi = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).filter("n >= 2").count()
    )
    assert out.count() == n_multi
