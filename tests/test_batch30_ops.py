"""Round-3 batch-30: CUSUM change detection, mutual information."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_cusum_detect, q_mutual_information
from etl_pipeline_project_spark.sources.readers import load_table


def test_cusum_invariants(spark, sf_dir):
    out = q_cusum_detect(spark, sf_dir)
    assert out.count() == (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    bad = out.filter(
        (F.col("final_cusum") < 0)
        | (F.col("max_cusum") < F.col("final_cusum"))
        | (F.col("n_alarm_steps") < 0)
        | (F.col("n_alarm_steps") > F.col("n_events"))
    )
    assert bad.count() == 0


def test_cusum_constant_series_never_alarms(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 10,
            "event_id": range(10),
            "value": [5.0] * 10,
            "ts": pd.date_range("2024-01-01", periods=10, freq="h"),
        }
    )
    sdf = spark.createDataFrame(pdf)
    # constant series: v - mean == 0 every step -> S stays 0
    v = F.floor(F.col("value") * 1000).cast("long")
    series = sdf.groupBy("user_id").agg(
        F.expr("sum(CAST(floor(value * 1000) AS BIGINT)) DIV count(*)").alias("k"),
        F.sort_array(F.collect_list(F.struct("ts", "event_id", v.alias("v")))).alias(
            "series"
        ),
    )
    vals = F.transform(F.col("series"), lambda s: s["v"])
    zero = F.lit(0).cast("long")

    def step(acc, x):
        s_new = F.greatest(zero, F.get(acc, 0) + x - F.col("k"))
        return F.array(s_new, F.greatest(F.get(acc, 1), s_new), F.get(acc, 2))

    st = F.aggregate(vals, F.array(zero, zero, zero), step)
    r = series.select(F.get(st, 1).alias("mx")).first()
    assert r["mx"] == 0


def test_mutual_information_non_negative(spark, sf_dir):
    r = q_mutual_information(spark, sf_dir).first()
    # MI is >= 0 up to float round-off of the sorted fold
    assert r["mi_nats"] > -1e-12
    assert r["n_cells"] > 0
