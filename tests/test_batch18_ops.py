"""Round-2 batch-18 operators: mode tie-break determinism and linear
regression slope recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.aggregates import exact_sum


def test_mode_tie_breaks_to_larger_value(spark):
    """On a frequency tie the engine's mode picks the LARGER value —
    pinned, not arbitrary."""
    df = spark.createDataFrame(
        [("g", 1.0), ("g", 1.0), ("g", 9.0), ("g", 9.0), ("g", 5.0)],
        "grp STRING, v DOUBLE",
    )
    counts = df.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c"))
    out = counts.groupBy("grp").agg(
        F.expr("max_by(v, struct(c, v))").alias("mode_v"), F.max("c").alias("n")
    ).first()
    assert out["mode_v"] == 9.0 and out["n"] == 2


def test_linreg_recovers_exact_line(spark):
    """Points on y = 3x + 7 regress to exactly slope 3, intercept 7 (all
    moments exact in decimal, closed form on exact doubles)."""
    pts = spark.createDataFrame(
        [(float(i), 3.0 * i + 7.0) for i in range(10)], "x DOUBLE, y DOUBLE"
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("x"), 6).alias("sx"),
        exact_sum(F.col("y"), 6).alias("sy"),
        exact_sum(F.col("x") * F.col("x"), 6).alias("sxx"),
        exact_sum(F.col("x") * F.col("y"), 6).alias("sxy"),
    ).first()
    n = float(m["n"])
    slope = (n * m["sxy"] - m["sx"] * m["sy"]) / (n * m["sxx"] - m["sx"] * m["sx"])
    intercept = m["sy"] / n - slope * (m["sx"] / n)
    assert slope == 3.0 and intercept == 7.0
