"""Round-4 batch-86: embedding dimension stats, dedup threshold sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_dedup_threshold_sweep,
    q_embed_dim_stats,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_embed_dim_stats_shape_and_counts(spark, sf_dir):
    s = q_embed_dim_stats(spark, sf_dir)
    rows = s.collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    assert len(rows) == 64
    assert all(r["n"] == n_vecs for r in rows)
    # sumsq is non-negative by construction; sums parse as integers
    for r in rows:
        assert int(r["sumsq_micros"]) >= 0
        int(r["sum_micros"])


def test_dedup_threshold_sweep_monotone(spark, sf_dir):
    rows = {r["threshold"]: r for r in q_dedup_threshold_sweep(spark, sf_dir).collect()}
    ths = sorted(rows)
    # pair and doc counts are non-increasing in the threshold
    for lo, hi in zip(ths, ths[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]
        assert rows[lo]["n_docs"] >= rows[hi]["n_docs"]
    # a pair involves exactly 2 docs; n_docs bounded by 2*n_pairs
    for r in rows.values():
        assert 2 <= r["n_docs"] <= 2 * r["n_pairs"]
