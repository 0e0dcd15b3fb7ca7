"""Round-3 batch-80: SELECT * EXCEPT, all-ties mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_mode_all_ties,
    q_select_except,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_select_except_drops_only_named(spark, sf_dir):
    df = q_select_except(spark, sf_dir)
    assert df.columns == ["o_orderkey", "o_orderpriority", "o_orderstatus"]
    orders = load_table(spark, sf_dir, "orders")
    assert df.count() == orders.filter(F.col("o_orderkey") % 100 == 0).count()


def test_mode_all_ties_complete(spark, sf_dir):
    rows = q_mode_all_ties(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert len(rows) == ev.select("user_id").distinct().count()
    counts = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        modes = r["modes"].split(",")
        assert len(modes) == r["n_modes"]
        assert modes == sorted(modes)
        for m in modes:
            assert counts[(r["user_id"], m)] == r["mode_count"]
