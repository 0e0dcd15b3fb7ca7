"""Round-3 batch-35: boilerplate strip, keywords, quantile/vector
normalization, split-leakage audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_boilerplate_strip,
    q_doc_keywords,
    q_quantile_normalize,
    q_split_leakage,
    q_vector_normalize,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_boilerplate_preserves_word_order(spark, sf_dir):
    out = q_boilerplate_strip(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    joined = out.join(docs, "doc_id").select("text", "text_clean", "n_removed")
    for r in joined.limit(50).collect():
        orig = r["text"].split(" ")
        clean = r["text_clean"].split(" ") if r["text_clean"] else []
        # clean must be a subsequence of orig
        it = iter(orig)
        assert all(w in it for w in clean)
        assert len(orig) - len(clean) == r["n_removed"]


def test_boilerplate_removes_only_high_df_words(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    df = {r["word"]: r["c"] for r in toks.groupBy("word").agg(F.count(F.lit(1)).alias("c")).collect()}
    out = q_boilerplate_strip(spark, sf_dir)
    joined = out.join(docs, "doc_id")
    r = joined.first()
    kept = set(r["text_clean"].split(" ")) if r["text_clean"] else set()
    removed = set(r["text"].split(" ")) - kept
    for w in removed:
        assert df[w] * 5 >= n_docs * 4
    for w in kept:
        assert df[w] * 5 < n_docs * 4


def test_doc_keywords_top3_per_doc(spark, sf_dir):
    out = q_doc_keywords(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("k"))
    assert per_doc.filter(F.col("k") > 3).count() == 0
    # score is monotone within a doc as rank increases
    for r in out.filter(F.col("doc_id") == out.first()["doc_id"]).orderBy("rk").collect():
        assert r["score_ppm"] == r["tf"] * 1000000 // r["df_docs"]


def test_quantile_normalize_uniformity(spark, sf_dir):
    out = q_quantile_normalize(spark, sf_dir)
    stats = out.groupBy("event_type").agg(
        F.min("q_ppm").alias("lo"),
        F.max("q_ppm").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in stats.collect():
        # mid-rank quantiles live strictly inside (0, 1)
        assert 0 < r["lo"] <= r["hi"] < 1_000_000
    ev = load_table(spark, sf_dir, "events")
    assert out.count() == ev.count()


def test_vector_normalize_unit_bounds(spark, sf_dir):
    for r in q_vector_normalize(spark, sf_dir).limit(100).collect():
        assert r["dim"] == 64
        assert r["l2_norm"] > 0
        assert -1.0 - 1e-12 <= r["u_min"] <= r["u_max"] <= 1.0 + 1e-12
        assert r["u_min"] <= r["u_first"] <= r["u_max"]


def test_split_leakage_pairs_straddle_splits(spark, sf_dir):
    rows = q_split_leakage(spark, sf_dir).collect()
    for r in rows:
        assert r["split_lo"] < r["split_hi"]
        assert r["n_leak_pairs"] > 0
