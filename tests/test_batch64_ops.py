"""Round-3 batch-64: nested denormalization round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_nest_denormalize
from etl_pipeline_project_spark.sources.readers import load_table


def test_nested_roundtrip_conserves_lines(spark, sf_dir):
    rows = {r["o_orderpriority"]: r for r in q_nest_denormalize(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r["n_lines"] for r in rows.values()) == li.count()
    # only orders with at least one line appear in the nested model
    with_lines = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi").count()
    )
    assert sum(r["n_orders"] for r in rows.values()) == with_lines
    for r in rows.values():
        assert r["sum_first_qty"] >= r["n_orders"]  # quantities are >= 1
