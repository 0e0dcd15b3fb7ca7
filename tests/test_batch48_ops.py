"""Round-3 batch-48: dup spans, corpus report, cluster sizes."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_cluster_size_stats,
    q_corpus_report,
    q_dup_span_detect,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_dup_spans_bounds(spark, sf_dir):
    rows = q_dup_span_detect(spark, sf_dir).collect()
    assert rows  # the corpus plants near-dup docs, so spans exist
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        n_words = len(docs[r["doc_id"]].split(" "))
        assert 5 <= r["max_span_words"] <= n_words
        assert r["n_dup_spans"] >= 1
        # positions can't exceed the number of 5-gram slots
        assert r["n_dup_positions"] <= n_words - 4


def test_dup_span_ground_truth_single_doc(spark, sf_dir):
    # any doc pair sharing a 5-gram must both appear in the output
    out_ids = {r["doc_id"] for r in q_dup_span_detect(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    grams: dict[str, set] = {}
    for r in docs:
        toks = r["text"].split(" ")
        for i in range(len(toks) - 4):
            grams.setdefault(" ".join(toks[i : i + 5]), set()).add(r["doc_id"])
    expect = set()
    for ids in grams.values():
        if len(ids) >= 2:
            expect |= ids
    assert out_ids == expect


def test_corpus_report_consistency(spark, sf_dir):
    r = q_corpus_report(spark, sf_dir).first()
    docs = load_table(spark, sf_dir, "documents")
    assert r["n_docs"] == docs.count()
    assert r["n_distinct_texts"] <= r["n_docs"]
    # each dup set of size c contributes c docs but only c-1 excess copies
    assert r["n_docs_in_dup_sets"] >= r["n_docs"] - r["n_distinct_texts"]
    assert 0.0 <= r["exact_dup_frac"] <= 1.0
    assert r["n_tokens"] > 0 and r["n_chars"] > r["n_tokens"]


def test_cluster_sizes_match_groups(spark, sf_dir):
    from etl_pipeline_project_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        neardup_groups,
    )

    docs = load_table(spark, sf_dir, "documents")
    groups = neardup_groups(
        minhash_lsh_pairs(docs, "doc_id", "text", jaccard_distance_threshold=0.4)
    )
    n_docs_in_groups = groups.count()
    rows = q_cluster_size_stats(spark, sf_dir).collect()
    assert sum(r["cluster_size"] * r["n_clusters"] for r in rows) == n_docs_in_groups
    for r in rows:
        assert r["cluster_size"] >= 2  # only paired docs enter components
        assert r["n_removable_docs"] == (r["cluster_size"] - 1) * r["n_clusters"]
