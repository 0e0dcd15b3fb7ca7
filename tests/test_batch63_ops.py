"""Round-3 batch-63: embedding drift, cross-source dups, fertility."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_cross_source_dups,
    q_embed_drift,
    q_tokenizer_fertility,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_embed_drift_per_label(spark, sf_dir):
    rows = {r["label"]: r for r in q_embed_drift(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert set(rows) == labels
    for r in rows.values():
        assert r["n_dims"] == dim
        assert r["l1_num_fp"] >= 0
        assert r["den"] > 0


def test_cross_source_dup_split(spark, sf_dir):
    r = q_cross_source_dups(spark, sf_dir).first()
    assert r["n_pairs"] == r["n_cross_source"] + r["n_same_source"]
    assert r["n_pairs"] > 0


def test_fertility_at_least_one(spark, sf_dir):
    rows = q_tokenizer_fertility(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        # a tokenizer emits at least one token per whitespace word
        assert r["fertility"] >= 1.0
        assert r["fertility"] == r["n_tokens"] / r["n_words"]
