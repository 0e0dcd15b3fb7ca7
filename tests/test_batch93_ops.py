"""Round-4 batch-93: shared-prefix clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import q_prefix_cluster
from etl_pipeline_project_spark.sources.readers import load_table


def test_prefix_clusters_are_real_groups(spark, sf_dir):
    c = q_prefix_cluster(spark, sf_dir)
    rows = c.collect()
    assert rows, "corpus contains prefix-sharing near-dups by construction"
    for r in rows:
        assert r["n_docs"] >= 2
        assert 1 <= r["n_sources"] <= r["n_docs"]
    # clustered docs never exceed the shingleable corpus
    docs = load_table(spark, sf_dir, "documents")
    n_eligible = docs.filter(F.size(F.split("text", " ")) >= 5).count()
    assert sum(r["n_docs"] for r in rows) <= n_eligible


def test_prefix_cluster_members_share_the_prefix(spark, sf_dir):
    """Recompute membership independently and confirm the exemplar's
    5-word prefix matches every member's."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    p = docs.filter(F.size(words) >= 5).select(
        "doc_id", F.array_join(F.slice(words, 1, 5), " ").alias("head")
    )
    clusters = q_prefix_cluster(spark, sf_dir)
    ex = clusters.join(
        p.withColumnRenamed("doc_id", "exemplar"), "exemplar"
    ).select("pfx", F.col("head").alias("ex_head"), "n_docs")
    sizes = (
        p.join(ex, p["head"] == ex["ex_head"])
        .groupBy("pfx", "n_docs")
        .agg(F.count(F.lit(1)).alias("n_same_head"))
    )
    assert sizes.filter(F.col("n_same_head") != F.col("n_docs")).count() == 0
