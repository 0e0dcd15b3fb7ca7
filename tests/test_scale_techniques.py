"""Plan-level tests for the 100 TB techniques (SURVEY §4.2): bucketed
co-located joins (no exchange), partition pruning at the scan, salted
skew joins, and broadcast verification. These assert on the *executed
plan*, not just results — the property that survives a 1000× scale-up."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.joins import salted_join
from etl_pipeline_project_spark.sources.readers import load_table

SCRATCH = "/root/repo/.scratch"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Bucketing co-locates join keys at write time: the later join reads
    matching buckets directly — zero shuffle, the reason to bucket a
    repeatedly-joined 100 TB fact table."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "b_orders"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "b_lineitem"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness unchanged
        plain = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_lineitem")


def test_partitioned_write_prunes_at_scan(spark, sf_dir):
    """Date-partitioned ingest (the engine's replacement for the
    reference's filename timestamps) lets a date filter skip whole
    directories — PartitionFilters, not data filters."""
    ev = load_table(spark, sf_dir, "events").withColumn("dt", F.to_date("ts"))
    path = f"{SCRATCH}/events_partitioned"
    ev.write.mode("overwrite").partitionBy("dt").parquet(path)
    back = spark.read.parquet(path).filter(F.col("dt") == "2024-01-05")
    plan = _plan(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dt" in m.group(1), plan
    assert back.count() == ev.filter(F.col("dt") == "2024-01-05").count()


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting redistributes a hot key without changing join semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    # make a skewed left side: collapse most keys onto one hot key
    skewed = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 3 == 0, F.lit(1)).otherwise(F.col("l_orderkey"))
    ).select("k", "l_extendedprice")
    dim = (
        li.select(F.col("l_orderkey").alias("k")).distinct().withColumn("tag", F.col("k") % 100)
    )
    plain = skewed.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("tag").alias("s")
    ).collect()[0]
    salted = salted_join(skewed, dim, "k", salt_parts=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("tag").alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_left_salted_join_preserves_left_rows(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    users = ev.select("user_id").distinct().filter(F.col("user_id") % 2 == 0)
    out = salted_join(ev, users.withColumn("even", F.lit(True)), "user_id", how="left")
    assert out.count() == ev.count()
    assert out.filter(F.col("even").isNull()).count() == ev.filter(
        F.col("user_id") % 2 == 1
    ).count()
