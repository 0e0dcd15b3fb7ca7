"""Round-3 batch-75: backlog curve, SLA compliance."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_backlog_curve,
    q_sla_compliance,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_backlog_peak_bounds(spark, sf_dir):
    r = q_backlog_curve(spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    n_with_lines = li.select("l_orderkey").distinct().count()
    assert r["n_orders"] == n_with_lines
    assert 0 < r["n_closed"] <= r["n_orders"]
    assert 1 <= r["peak_backlog"] <= r["n_orders"]
    assert r["peak_day"] is not None


def test_sla_compliance_monotone_in_budget(spark, sf_dir):
    rows = {r["o_orderpriority"]: r for r in q_sla_compliance(spark, sf_dir).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert 0 <= r["n_within_sla"] <= r["n_lines"]
        assert r["compliance"] == r["n_within_sla"] / r["n_lines"]
    # ship-lag distribution is priority-independent in the synthetic data,
    # so a bigger SLA budget means weakly higher compliance
    order = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    comps = [rows[p]["compliance"] for p in order]
    assert all(a <= b + 0.02 for a, b in zip(comps, comps[1:]))
