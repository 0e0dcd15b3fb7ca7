"""Round-2 batch-16 operators: interpolation exactness and point-in-time
join uniqueness."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import REGISTRY


def test_interp_recovers_linear_signal(spark):
    """On a perfectly linear signal, interpolation at any interior grid
    point reproduces the line exactly (lerp of exact operands)."""
    rows = [
        (1, "2024-01-01 00:00:00", 0.0),
        (1, "2024-01-03 00:00:00", 2.0),
    ]
    ev = (
        spark.createDataFrame(rows, "user_id INT, ts_s STRING, value DOUBLE")
        .select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    )
    # midpoint of the two readings sits on day 2 → exactly 1.0
    from pyspark.sql import Window

    base = Window.partitionBy("user_id").orderBy("t", "is_grid")
    u = ev.select(
        "user_id", F.unix_micros("ts").alias("t"), F.col("value").alias("v"),
        F.lit(0).alias("is_grid"),
    ).unionByName(
        spark.createDataFrame([(1,)], "user_id INT").select(
            "user_id",
            F.unix_micros(F.lit("2024-01-02 00:00:00").cast("timestamp")).alias("t"),
            F.lit(None).cast("double").alias("v"),
            F.lit(1).alias("is_grid"),
        )
    )
    wprev = base.rowsBetween(Window.unboundedPreceding, 0)
    wnext = base.rowsBetween(0, Window.unboundedFollowing)
    t_of_v = F.when(F.col("v").isNotNull(), F.col("t"))
    m = u.select(
        "is_grid", "t",
        F.last("v", True).over(wprev).alias("pv"),
        F.last(t_of_v, True).over(wprev).alias("pt"),
        F.first("v", True).over(wnext).alias("nv"),
        F.first(t_of_v, True).over(wnext).alias("nt"),
    ).filter(F.col("is_grid") == 1).first()
    lerp = m["pv"] + (m["nv"] - m["pv"]) * ((m["t"] - m["pt"]) / float(m["nt"] - m["pt"]))
    assert lerp == 1.0


def test_interp_null_outside_observed_range(spark, sf_dir):
    """Grid points before a user's first reading carry NULL — the operator
    never extrapolates."""
    out = REGISTRY["q_interp_linear"](spark, sf_dir)
    from etl_pipeline_project_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = out.join(firsts, "user_id").filter(
        F.col("g_day").cast("timestamp") < F.col("first_ts")
    )
    assert joined.filter(F.col("interp_value").isNotNull()).count() == 0


def test_pit_join_at_most_one_version_per_fact(spark, sf_dir):
    """Half-open validity intervals guarantee ≤1 dimension version per
    fact ROW: joined multiplicity never exceeds the fact key's own
    multiplicity (the testdata contains genuine full-row lineitem
    duplicates, so key counts — not uniqueness — are the invariant)."""
    from etl_pipeline_project_spark.sources.readers import load_table

    out = REGISTRY["q_scd2_pit_join"](spark, sf_dir)
    keys = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    li = load_table(spark, sf_dir, "lineitem")
    fact_counts = li.groupBy(*keys).count().withColumnRenamed("count", "n_fact")
    out_counts = out.groupBy(*keys).count()
    excess = out_counts.join(fact_counts, keys).filter(
        F.col("count") > F.col("n_fact")
    )
    assert excess.count() == 0
