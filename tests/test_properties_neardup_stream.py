"""Property-based test for incremental streaming near-dup
(streaming/neardup.py): the union of pairs emitted across micro-batch
waves must EQUAL the batch minhash_lsh_pairs output on the full corpus
— same pairs, same exactly-verified distances — for arbitrary generated
corpora and arbitrary wave splits, and re-delivering a wave must change
nothing (exactly-once gate + idempotent appends)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.dedup_text import minhash_lsh_pairs
from etl_pipeline_project_spark.streaming.neardup import (
    merge_neardup_batch,
    neardup_pairs_state,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

VOCAB = [f"w{i}" for i in range(6)]
LSH = dict(k=2, num_hashes=16, band_rows=2, jaccard_distance_threshold=0.8)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=2, max_size=7).map(" ".join),
    min_size=0,
    max_size=8,
)


def _pairs_dict(rows):
    return {(r["id_a"], r["id_b"]): r["jaccard_distance"] for r in rows}


@given(texts=corpus_strategy, split=st.integers(min_value=0, max_value=8))
@_SETTINGS
def test_incremental_neardup_equals_batch(spark, tmp_path_factory, texts, split):
    base = tmp_path_factory.mktemp("neardup")
    sig_store, pair_store = str(base / "sigs"), str(base / "pairs")
    docs = list(enumerate(texts))
    split = min(split, len(docs))
    waves = [docs[:split], docs[split:]]
    for wave in waves:
        if wave:
            merge_neardup_batch(
                spark.createDataFrame(wave, SCHEMA), sig_store, pair_store, **LSH
            )
    try:
        got = _pairs_dict(neardup_pairs_state(spark, pair_store).collect())
    except AnalysisException:
        got = {}

    expect = {}
    if docs:
        expect = _pairs_dict(
            minhash_lsh_pairs(
                spark.createDataFrame(docs, SCHEMA), "doc_id", "text", **LSH
            ).collect()
        )
    assert got == expect

    # idempotence: re-delivering the last non-empty wave adds nothing
    last = waves[1] or waves[0]
    if last:
        merge_neardup_batch(
            spark.createDataFrame(last, SCHEMA), sig_store, pair_store, **LSH
        )
        again = _pairs_dict(neardup_pairs_state(spark, pair_store).collect())
        assert again == got
