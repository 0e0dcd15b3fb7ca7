"""Property-based test for corpus-level TF-IDF vocabulary extraction
against a Python reference on generated documents: total_tf / df counts
must be integer-exact, the score must equal ``round(tf * ln(N/df), 6)``,
and the (score desc, term asc) top-k cut must match."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.text_analysis import tfidf_top_terms

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

VOCAB = ["alpha", "beta", "gamma", "delta", "xy"]  # "xy" < min_len, filtered

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=docs_strategy, k=st.integers(min_value=1, max_value=6))
@_SETTINGS
def test_tfidf_top_terms_matches_reference(spark, texts, k):
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    got = [
        (r["term"], r["total_tf"], r["df"], r["tfidf"])
        for r in tfidf_top_terms(df, k=k, min_len=3).collect()
    ]
    n = len(texts)
    tf: dict[str, int] = {}
    dfreq: dict[str, set] = {}
    for i, t in enumerate(texts):
        for w in t.split():
            if len(w) >= 3:
                tf[w] = tf.get(w, 0) + 1
                dfreq.setdefault(w, set()).add(i)
    scored = [
        (w, tf[w], len(dfreq[w]), round(tf[w] * math.log(n / len(dfreq[w])), 6))
        for w in tf
    ]
    scored.sort(key=lambda r: (-r[3], r[0]))
    assert got == scored[:k]
