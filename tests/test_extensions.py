"""Tests for the beyond-reference extensions: as-of join (both
implementations agree), sessionization invariants, pivot/cube shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.joins import asof_join, asof_join_grouped
from etl_pipeline_project_spark.operators.windows import sessionize
from etl_pipeline_project_spark.sources.readers import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")


def test_asof_window_and_grouped_impls_agree(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    a = asof_join(
        ev, clicks, key="user_id", left_ts="ts", right_ts="ts", left_id="event_id",
        right_cols=["ts"],
    ).select("event_id", F.col("r_ts"))
    b = asof_join_grouped(
        ev, clicks, key="user_id", left_ts="ts", right_ts="ts", right_value="ts"
    ).select("event_id", F.col("r_ts"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_asof_match_is_at_or_before(spark, sf_dir):
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(
        ev, clicks, key="user_id", left_ts="ts", right_ts="ts", left_id="event_id",
        right_cols=["ts"],
    )
    assert out.filter(F.col("r_ts") > F.col("ts")).count() == 0
    assert out.count() == ev.count()  # left join preserves all rows


def test_sessionize_invariants(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak="event_id")
    assert out.count() == ev.count()
    # session ids start at 1 and are contiguous per user
    per_user = out.groupBy("user_id").agg(
        F.min("session_id").alias("lo"),
        F.max("session_id").alias("hi"),
        F.countDistinct("session_id").alias("n"),
    )
    bad = per_user.filter((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count()
    assert bad == 0
    # within a session, consecutive gaps never exceed the threshold
    w = F.window  # noqa: F841 — readability
    from pyspark.sql import Window as W

    win = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    gaps = out.withColumn("prev", F.lag(F.unix_timestamp("ts")).over(win)).filter(
        F.col("prev").isNotNull() & (F.unix_timestamp("ts") - F.col("prev") > 1800)
    )
    assert gaps.count() == 0
