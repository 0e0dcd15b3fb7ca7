"""Round-3 batch-72: CTE reuse, distinct complex types."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_cte_reuse,
    q_distinct_complex,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_cte_reuse_counts(spark, sf_dir):
    r = q_cte_reuse(spark, sf_dir).first()
    orders = load_table(spark, sf_dir, "orders")
    assert r["n_customers"] == orders.select("o_custkey").distinct().count()
    assert r["n_above_mean"] + r["n_at_or_below_mean"] == r["n_customers"]
    assert 0 < r["n_above_mean"] < r["n_customers"]


def test_distinct_complex_sets(spark, sf_dir):
    rows = q_distinct_complex(spark, sf_dir).collect()
    sets = [r["prio_set"] for r in rows]
    # truly distinct
    assert len(sets) == len(set(sets))
    for r in rows:
        parts = r["prio_set"].split(",")
        assert parts == sorted(parts)
        assert len(parts) == r["set_size"]
        assert 1 <= r["set_size"] <= 5
