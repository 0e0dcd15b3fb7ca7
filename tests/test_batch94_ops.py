"""Round-5 batch 94: XML round-trip, hybrid-search RRF, source TV
distance, blocking evaluation, streaming quality gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_blocking_eval,
    q_hybrid_search_rrf,
    q_scan_xml_roundtrip,
    q_source_tv_distance,
    q_stream_quality_gate,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_xml_roundtrip_lossless(spark, sf_dir):
    x = q_scan_xml_roundtrip(spark, sf_dir)
    nat = load_table(spark, sf_dir, "nation")
    assert x.agg(F.sum("n_nations")).first()[0] == nat.count()
    assert x.count() == nat.select("n_regionkey").distinct().count()


def test_hybrid_rrf_ranks_and_scores(spark, sf_dir):
    x = q_hybrid_search_rrf(spark, sf_dir).collect()
    by_id = {r["doc_id"]: r for r in x}
    # every row carries at least one rank, and the integer RRF contribution
    # reconstructs exactly from the ranks
    for r in x:
        assert r["bm25_rank"] is not None or r["ann_rank"] is not None
        expect = 0
        if r["bm25_rank"] is not None:
            assert 1 <= r["bm25_rank"] <= 20
            expect += 1000000 // (60 + r["bm25_rank"])
        if r["ann_rank"] is not None:
            assert 1 <= r["ann_rank"] <= 10
            expect += 1000000 // (60 + r["ann_rank"])
        assert r["rrf_ppm"] == expect
    # rank lists are dense permutations
    bm = sorted(r["bm25_rank"] for r in x if r["bm25_rank"] is not None)
    assert bm == list(range(1, 21))
    ann = sorted(r["ann_rank"] for r in x if r["ann_rank"] is not None)
    assert ann == list(range(1, 11))
    # a doc present in both lists must outscore any doc holding only the
    # immediately-worse rank in either single list
    both = [r for r in x if r["bm25_rank"] and r["ann_rank"]]
    single = [r for r in x if (r["bm25_rank"] is None) != (r["ann_rank"] is None)]
    if both and single:
        assert max(r["rrf_ppm"] for r in both) >= max(
            r["rrf_ppm"] for r in single
        )
    assert len(by_id) == len(x)  # one row per doc


def test_source_tv_distance_bounds_and_symmetric_cover(spark, sf_dir):
    rows = q_source_tv_distance(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2  # every unordered pair once
    for r in rows:
        assert 0.0 <= r["tv_distance"] <= 1.0
        assert r["tv_num"] <= r["tv_denom"]
        # the emitted double is exactly the emitted integer ratio
        assert r["tv_distance"] == r["tv_num"] / r["tv_denom"]


def test_blocking_eval_confusion_matrix_consistent(spark, sf_dir):
    r = q_blocking_eval(spark, sf_dir).first()
    assert r["n_pred"] == r["tp"] + r["fp"]
    assert r["n_truth"] == r["tp"] + r["fn"]
    if r["n_pred"]:
        assert r["precision_"] == r["tp"] / r["n_pred"]
    if r["n_truth"]:
        assert r["recall_"] == r["tp"] / r["n_truth"]


def test_stream_quality_gate_routes_reconcile(spark, sf_dir):
    x = q_stream_quality_gate(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert x.agg(F.sum("n_rows")).first()[0] == ev.count()
    rows = {(r["route"], r["reason"]): r["n_rows"] for r in x.collect()}
    # 'ok' rows ride the good route and only them
    for (route, reason), _n in rows.items():
        assert (reason == "ok") == (route == "good")
    # rule chain is first-match: out_of_range count equals the batch filter
    n_oor = ev.filter(F.col("value").isNotNull() & (F.col("value") >= 400)).count()
    assert rows.get(("dlq", "out_of_range"), 0) == n_oor


def test_stream_quality_gate_rerun_is_exactly_once(spark, sf_dir):
    a = {tuple(r) for r in q_stream_quality_gate(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_stream_quality_gate(spark, sf_dir).collect()}
    assert a == b
