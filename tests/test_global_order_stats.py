"""Unit tests for operators.windows.global_order_stats — the round-8
two-pass global-rank helper that replaced every unbounded
Exchange SinglePartition window (round-7 verdict item 1).

Each test builds a seeded random frame, computes the helper's outputs,
and compares against the naive single-partition window formulation row
by row — the helper must be VALUE-IDENTICAL to `... OVER (ORDER BY ...)`
while never planning a single-partition window itself.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.windows import (
    global_order_stats,
    grouped_order_stats,
)


def _frame(spark, seed: int, n: int = 400):
    rng = random.Random(seed)
    rows = [
        # duplicate-heavy v so range partitions carry ties; unique k
        (rng.randrange(40), k, rng.randrange(-50, 50))
        for k in range(n)
    ]
    return spark.createDataFrame(rows, "v int, k int, w int")


def test_rank_and_total_match_window(spark) -> None:
    df = _frame(spark, 1)
    got = {
        r["k"]: (r["rn"], r["n"])
        for r in global_order_stats(df, ["v", "k"], rn_col="rn", n_col="n").collect()
    }
    w = Window.orderBy("v", "k")
    want = {
        r["k"]: (r["rn"], r["n"])
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        ).collect()
    }
    assert got == want


def test_rank_descending_order(spark) -> None:
    df = _frame(spark, 2)
    order = [F.col("v").desc(), F.col("k")]
    got = {
        r["k"]: r["rn"]
        for r in global_order_stats(df, order, rn_col="rn").collect()
    }
    want = {
        r["k"]: r["rn"]
        for r in df.select(
            "k", F.row_number().over(Window.orderBy(*order)).alias("rn")
        ).collect()
    }
    assert got == want


def test_inclusive_running_sum(spark) -> None:
    df = _frame(spark, 3)
    got = {
        r["k"]: r["cw"]
        for r in global_order_stats(df, ["v", "k"], cum_cols={"w": "cw"}).collect()
    }
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cw"]
        for r in df.select("k", F.sum("w").over(w).alias("cw")).collect()
    }
    assert got == want


def test_exclusive_running_max_with_nulls(spark) -> None:
    # nullable source: the carry must skip nulls (ignore-nulls last-value
    # semantics) and be NULL when no prior non-null exists
    df = _frame(spark, 4).withColumn(
        "src", F.when(F.col("w") > 0, F.col("w"))
    )
    got = {
        r["k"]: r["mx"]
        for r in global_order_stats(
            df, ["v", "k"], max_cols_excl={"src": "mx"}
        ).collect()
    }
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["k"]: r["mx"]
        for r in df.select("k", F.max("src").over(w).alias("mx")).collect()
    }
    assert got == want


def test_reversed_exclusive_running_min_struct(spark) -> None:
    # struct carry — the q_matched_pairs_att shape: next non-null control
    df = _frame(spark, 5).withColumn(
        "src", F.when(F.col("w") % 3 == 0, F.struct("v", "k"))
    )
    got = {
        r["k"]: r["nx"]
        for r in global_order_stats(
            df, ["v", "k"], min_cols_excl_rev={"src": "nx"}
        ).select("k", F.col("nx").cast("string").alias("nx")).collect()
    }
    w = Window.orderBy("v", "k").rowsBetween(1, Window.unboundedFollowing)
    want = {
        r["k"]: r["nx"]
        for r in df.select(
            "k", F.min("src").over(w).cast("string").alias("nx")
        ).collect()
    }
    assert got == want


def test_nullable_cum_leading_null_partitions(spark) -> None:
    # the round-8 ADVICE divergence: a nullable cum source whose leading
    # rows of a non-first range partition are NULL must still carry the
    # prior prefix sum (and stay NULL before the first non-null anywhere)
    df = _frame(spark, 7).withColumn(
        # NULL for most rows: long all-NULL prefixes straddle partitions
        "src", F.when(F.col("k") % 97 == 0, F.col("w"))
    )
    got = {
        r["k"]: r["cw"]
        for r in global_order_stats(
            df, ["v", "k"], cum_cols={"src": "cw"}, num_parts=16
        ).collect()
    }
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cw"]
        for r in df.select("k", F.sum("src").over(w).alias("cw")).collect()
    }
    assert got == want
    assert any(v is None for v in want.values())  # the regime is exercised


def _grouped_frame(spark, seed: int, n: int = 600):
    rng = random.Random(seed)
    rows = [
        # 3-way enum group (the q_spearman_rho shape), duplicate-heavy v,
        # unique k tie-break
        ("ABC"[rng.randrange(3)], rng.randrange(25), k, rng.randrange(-50, 50))
        for k in range(n)
    ]
    return spark.createDataFrame(rows, "g string, v int, k int, w int")


def test_grouped_rank_and_cum_match_window(spark) -> None:
    df = _grouped_frame(spark, 11)
    got = {
        r["k"]: (r["rn"], r["cw"], r["n"])
        for r in grouped_order_stats(
            df, ["g"], ["v", "k"], rn_col="rn", cum_cols={"w": "cw"},
            grp_n_col="n",
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "k")
    want = {
        r["k"]: (r["rn"], r["cw"], r["n"])
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
            F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
        ).collect()
    }
    assert got == want


def test_grouped_nullable_cum(spark) -> None:
    df = _grouped_frame(spark, 12).withColumn(
        "src", F.when(F.col("k") % 89 == 0, F.col("w"))
    )
    got = {
        r["k"]: r["cw"]
        for r in grouped_order_stats(
            df, ["g"], ["v", "k"], cum_cols={"src": "cw"}, num_parts=16
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("v", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["k"]: r["cw"]
        for r in df.select("k", F.sum("src").over(w).alias("cw")).collect()
    }
    assert got == want
    assert any(v is None for v in want.values())


def test_grouped_single_group_column_string_arg(spark) -> None:
    # `group` accepts a bare string; descending order columns work
    df = _grouped_frame(spark, 13)
    order = [F.col("v").desc(), F.col("k")]
    got = {
        r["k"]: r["rn"]
        for r in grouped_order_stats(df, "g", order, rn_col="rn").collect()
    }
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        r["k"]: r["rn"]
        for r in df.select(
            "k", F.row_number().over(w).cast("long").alias("rn")
        ).collect()
    }
    assert got == want


def test_grouped_plan_never_hash_partitions_by_group_alone(spark) -> None:
    # the entire point: no Exchange hashpartitioning on the bare enum
    # group over the corpus-scaled input, and every Window is keyed by
    # the range id or runs over the bounded (_pid, group) aggregate
    df = _grouped_frame(spark, 14)
    out = grouped_order_stats(
        df, ["g"], ["v", "k"], rn_col="rn", cum_cols={"w": "cw"}, grp_n_col="n"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_pid" in plan
    lines = plan.splitlines()

    def _indent(s: str) -> int:
        i = s.find("- ")
        return i if i >= 0 else 0

    for i, line in enumerate(lines):
        if "Exchange hashpartitioning" not in line or "_pid" in line:
            continue
        # a hash exchange keyed by the bare group is allowed ONLY above
        # the (_pid, g) aggregate — bounded to #ranges + #groups rows —
        # never over the raw corpus-scaled input
        d = _indent(line)
        subtree = []
        for below in lines[i + 1 :]:
            if _indent(below) <= d:
                break
            subtree.append(below)
        assert any("keys=[_pid" in s for s in subtree), plan


def test_no_single_partition_window_in_plan(spark) -> None:
    df = _frame(spark, 6)
    out = global_order_stats(
        df, ["v", "k"], rn_col="rn", n_col="n", cum_cols={"w": "cw"}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the helper's one Window is keyed by the range id, never global
    assert "windowspecdefinition(_pid" in plan
    for i, line in enumerate(plan.splitlines()):
        if "Exchange SinglePartition" in line:
            # the only allowed SinglePartition is the bounded scalar
            # total (an Aggregate with no grouping keys sits beneath it)
            below = "\n".join(plan.splitlines()[i + 1 : i + 3])
            assert "keys=[]" in below, plan


def test_tot_sum_cols_match_global_window_sum(spark) -> None:
    """r13: tot_sum_cols must equal SUM(x) OVER () exactly, including the
    all-NULL-source → NULL case, and ride the same broadcast scalar as
    n_col (no extra pass over the input)."""
    df = _frame(spark, 9).withColumn(
        "wn", F.when(F.col("k") % 3 == 0, F.col("w"))  # nullable source
    )
    out = global_order_stats(
        df,
        ["v", "k"],
        rn_col="rn",
        n_col="n",
        cum_cols={"w": "cw"},
        tot_sum_cols={"w": "tw", "wn": "twn"},
    )
    rows = out.collect()
    want_tw = df.agg(F.sum("w")).collect()[0][0]
    want_twn = df.agg(F.sum("wn")).collect()[0][0]
    assert all(r["tw"] == want_tw for r in rows)
    assert all(r["twn"] == want_twn for r in rows)
    # all-NULL source stays NULL (SUM over () of no non-nulls)
    nulls = df.withColumn("z", F.lit(None).cast("long"))
    out2 = global_order_stats(nulls, ["v", "k"], tot_sum_cols={"z": "tz"})
    assert all(r["tz"] is None for r in out2.collect())


def test_sum_cols_reject_float_sources(spark) -> None:
    """Re-associated partial sums are exact only for integral/decimal
    sources; float sources must fail loudly (r12 ADVICE)."""
    import pytest

    df = _frame(spark, 10).withColumn("f", F.col("w").cast("double"))
    with pytest.raises(TypeError, match="tot_sum_cols"):
        global_order_stats(df, ["v", "k"], tot_sum_cols={"f": "tf"})._jdf
    with pytest.raises(TypeError, match="grp_sum_cols"):
        grouped_order_stats(df, ["v"], ["k"], grp_sum_cols={"f": "tf"})._jdf
