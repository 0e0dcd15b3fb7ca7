"""Round-2 batch-14 operators: stream-stream join equivalence, share
normalization, referential orphan detection, and time-weighted-average
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import REGISTRY
from etl_pipeline_project_spark.sources.readers import load_table


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """The availableNow final state of the stream-stream attribution join
    must equal the batch join with the same predicate."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    batch = v.join(
        p,
        F.expr("vu = pu AND pts >= vts AND pts <= vts + interval 1 hour"),
    ).select("vid", "pid")
    stream = REGISTRY["q_stream_stream_join"](spark, sf_dir).select(
        F.col("view_id").alias("vid"), F.col("purchase_id").alias("pid")
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_pct_of_total_shares_sum_to_one(spark, sf_dir):
    total = (
        REGISTRY["q_pct_of_total"](spark, sf_dir)
        .agg(F.sum("revenue_share"))
        .first()[0]
    )
    assert abs(total - 1.0) < 1e-9


def test_referential_gate_detects_planted_orphan(spark):
    """A child row with no parent must count as an orphan."""
    from etl_pipeline_project_spark.operators.setops import union_all  # noqa: F401

    child = spark.createDataFrame([(1, 10), (2, 99)], "id INT, parent_id INT")
    parent = spark.createDataFrame([(10,)], "pid INT")
    orphans = child.join(
        parent.select(F.col("pid").alias("parent_id")), "parent_id", "left_anti"
    )
    assert orphans.count() == 1 and orphans.first()["id"] == 2


def test_twa_constant_signal_is_exact(spark):
    """A constant reading's time-weighted average is the constant,
    regardless of irregular sampling."""
    rows = [
        (1, "2024-01-01 00:00:00", 7.5),
        (1, "2024-01-01 00:00:03", 7.5),
        (1, "2024-01-01 02:00:00", 7.5),
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts_s STRING, value DOUBLE").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value"
    ).withColumn("event_id", F.monotonically_increasing_id())
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    dur = F.unix_micros("next_ts") - F.unix_micros("ts")
    s = seq.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1000000).cast("decimal(38,0)") * dur).alias("s"),
        F.sum(dur).alias("t"),
    ).first()
    assert float(s["s"]) / s["t"] / 1e6 == 7.5
