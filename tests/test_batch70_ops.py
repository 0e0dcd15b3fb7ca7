"""Round-3 batch-70: grouped-map pandas, min-max scaling."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_grouped_map_pandas,
    q_minmax_scale,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_grouped_map_fold_invariants(spark, sf_dir):
    rows = {r["user_id"]: r for r in q_grouped_map_pandas(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    direct = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"),
        )
        .collect()
    }
    assert set(rows) == set(direct)
    for u, r in rows.items():
        assert r["n_events"] == direct[u]["n"]
        assert r["total_cents"] == direct[u]["c"]
        assert 0 <= r["first_half_cents"] <= r["total_cents"]


def test_minmax_scale_bounds(spark, sf_dir):
    rows = q_minmax_scale(spark, sf_dir).collect()
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        # each scaled value lies in [0, 1e6] so the sum is bounded
        assert 0 <= r["sum_scaled_ppm"] <= r["n"] * 1_000_000
