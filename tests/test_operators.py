"""Unit tests for the core relational operators — the invariants the
reference relies on (SURVEY §5 step 4): dedup idempotence, anti-join⇒append
convergence, deterministic survivor choice."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.dedup import dedup_keyed, distinct_values
from etl_pipeline_project_spark.operators.joins import anti_incremental, left_enrich
from etl_pipeline_project_spark.operators.relational import (
    rename_columns,
    select_existing,
)
from etl_pipeline_project_spark.operators.setops import union_all
from etl_pipeline_project_spark.sources.readers import load_table


def test_dedup_is_deterministic_and_idempotent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    tb = ["l_linenumber", "l_partkey", "l_suppkey"]
    once = dedup_keyed(li, "l_orderkey", tiebreak=tb)
    twice = dedup_keyed(once, "l_orderkey", tiebreak=tb)
    assert once.count() == li.select("l_orderkey").distinct().count()
    assert twice.exceptAll(once).count() == 0
    # deterministic across evaluations
    a = sorted(once.select("l_orderkey", "l_linenumber").collect())
    b = sorted(dedup_keyed(li, "l_orderkey", tiebreak=tb).select("l_orderkey", "l_linenumber").collect())
    assert a == b


def test_anti_join_converges(spark, sf_dir):
    """Running the incremental load twice adds zero rows
    (`data/transformation_db.py:91-121` idempotency-by-design)."""
    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 2 == 0)
    staged = orders
    new = anti_incremental(staged, target, "o_orderkey")
    assert new.filter(F.col("o_orderkey") % 2 == 0).count() == 0
    after_load = union_all(target, new)
    second_pass = anti_incremental(staged, after_load, "o_orderkey")
    assert second_pass.count() == 0


def test_left_enrich_preserves_fact_rows(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    out = left_enrich(
        orders,
        cust.select("c_custkey", "c_name"),
        orders["o_custkey"] == F.col("c_custkey"),
    )
    assert out.count() == orders.count()


def test_left_enrich_broadcasts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    out = left_enrich(
        orders, cust.select("c_custkey", "c_name"), orders["o_custkey"] == F.col("c_custkey")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_select_existing_tolerates_missing(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    out = select_existing(cust, ["c_custkey", "no_such_col"])
    assert out.columns == ["c_custkey"]


def test_rename_ignores_unknown_keys(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    out = rename_columns(cust, {"c_custkey": "id", "ghost": "boo"})
    assert "id" in out.columns and "ghost" not in out.columns and "boo" not in out.columns


def test_distinct_values_nonnull(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    vals = [r[0] for r in distinct_values(cust, "c_mktsegment").collect()]
    assert len(vals) == len(set(vals))
    assert None not in vals


def test_or_fallback_falls_through_on_empty_string(spark):
    """The reference's Python-`or` semantics (SURVEY §2.F divergence note):
    falls through on null AND empty string, unlike SQL coalesce."""
    from etl_pipeline_project_spark.functions.scalars import coalesce_first, or_fallback

    df = spark.createDataFrame(
        [("x", "a"), ("", "b"), (None, "c")], "primary string, fallback string"
    )
    rows = df.select(
        or_fallback("primary", "fallback").alias("o"),
        coalesce_first("primary", "fallback").alias("c"),
    ).collect()
    assert [r["o"] for r in rows] == ["x", "b", "c"]
    assert [r["c"] for r in rows] == ["x", "", "c"]  # coalesce keeps ""
