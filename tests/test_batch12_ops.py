"""Round-2 batch-12 operators: partitioned sink pruning, argmax
aggregates, the data-quality gate, and lexical repetition. Oracle parity
is covered by tools/oracle_check.py; these tests pin the semantic
properties the oracles can't see (plan-level pruning, null-rule
semantics, aggregate/window equivalence)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.profiling import dq_violations
from etl_pipeline_project_spark.queries import REGISTRY
from etl_pipeline_project_spark.sources.readers import load_table


def test_partitioned_sink_prunes_read(spark, sf_dir):
    """The year filter must become directory pruning, not a row filter:
    the scan's partition filters carry the predicate and only the one
    matching partition directory is planned."""
    REGISTRY["q_sink_partitioned"](spark, sf_dir).collect()
    # the sink path is session-keyed (scratch-isolation policy) — read the
    # same path the query wrote, not a fixed literal
    back = spark.read.parquet(
        f"/root/repo/.scratch/orders_by_year_{spark.sparkContext.applicationId}"
    ).filter(F.col("o_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_year" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]


def test_dq_null_predicate_counts_as_violation(spark):
    """A rule whose predicate evaluates to NULL (null check input) must be
    a violation, not a silent pass."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id INT, amount DOUBLE"
    )
    out = {
        r["rule"]: r["n_violations"]
        for r in dq_violations(df, [("positive_amount", F.col("amount") > 0)]).collect()
    }
    assert out["positive_amount"] == 2  # the NULL and the negative


def test_argmax_matches_window_formulation(spark, sf_dir):
    """max_by with a struct tie-break must agree with the explicit
    row_number() formulation on every group."""
    orders = load_table(spark, sf_dir, "orders")
    agg = {
        r["o_orderpriority"]: r["top_orderkey"]
        for r in REGISTRY["q_agg_argmax"](spark, sf_dir).collect()
    }
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    win = {
        r["o_orderpriority"]: r["o_orderkey"]
        for r in orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert agg == win


def test_ttr_bounds_and_planted_repetition(spark):
    """rep_ratio is 0 for an all-distinct doc and approaches 1 for a
    single repeated token."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x")], "doc_id INT, text STRING"
    )
    toks = F.split(F.col("text"), " ")
    out = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id",
            (1 - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
                "rep"
            ),
        ).collect()
    }
    assert out[1] == 0.0 and out[2] == 0.75
