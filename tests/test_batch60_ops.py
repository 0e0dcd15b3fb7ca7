"""Round-3 batch-60: late-data watermark drop, parameterized SQL,
IDENTIFIER references."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_sql_identifier,
    q_sql_parameterized,
    q_stream_late_drop,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_late_rows_never_reach_sink(spark, sf_dir):
    rows = {r["day"]: r["n_events"] for r in q_stream_late_drop(spark, sf_dir).collect()}
    assert rows
    # no window before the on-time cut exists: all late data was dropped
    assert all(d >= "2024-01-10" for d in rows)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp")
    )
    direct = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # every emitted (closed) window matches the batch count exactly
    for d, n in rows.items():
        assert n == direct[d]
    # the unfinalized tail windows were withheld, not emitted partially
    assert set(rows) < set(direct)


def test_parameterized_sql_binds_typed_values(spark, sf_dir):
    out = {r["o_orderpriority"]: r["n"] for r in q_sql_parameterized(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    direct = {
        r["o_orderpriority"]: r["n"]
        for r in orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_totalprice") > 50000)
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == direct


def test_identifier_counts(spark, sf_dir):
    rows = {r["table_name"]: r["n_rows"] for r in q_sql_identifier(spark, sf_dir).collect()}
    for t in ("orders", "customer", "nation"):
        assert rows[t] == load_table(spark, sf_dir, t).count()
