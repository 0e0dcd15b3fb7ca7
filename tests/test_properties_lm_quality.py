"""Property-based test for the char-bigram LM quality scorer against a
Python reference: Laplace-smoothed integer micro-bit weights per bigram
and the per-document mean bits-per-char must match exactly on generated
corpora (mixed alphabets exercise the '_' closed-alphabet mapping;
one-char docs produce no bigrams and must be absent from the output)."""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.text_analysis import (
    LM_ALPHABET_SIZE,
    lm_bigram_model,
    lm_quality_score,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

texts = st.lists(
    st.text(alphabet="ab1 .X", min_size=0, max_size=20), min_size=1, max_size=8
)


def _norm(t: str) -> str:
    return re.sub(r"[^a-z0-9 ]", "_", t.lower())


def _bigrams(t: str) -> list[str]:
    s = _norm(t)
    return [s[i : i + 2] for i in range(len(s) - 1)]


def _model(ts: list[str]) -> dict[str, int]:
    cnt: dict[str, int] = {}
    for t in ts:
        for bg in _bigrams(t):
            cnt[bg] = cnt.get(bg, 0) + 1
    tot: dict[str, int] = {}
    for bg, c in cnt.items():
        tot[bg[0]] = tot.get(bg[0], 0) + c
    # HALF_UP like Spark's round (weights are positive)
    return {
        bg: int(math.floor(-math.log2((c + 1) / (tot[bg[0]] + LM_ALPHABET_SIZE)) * 1e6 + 0.5))
        for bg, c in cnt.items()
    }


@given(ts=texts)
@_SETTINGS
def test_lm_bigram_model_matches_reference(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), SCHEMA)
    got = {r["bg"]: r["nbits_micro"] for r in lm_bigram_model(df).collect()}
    assert got == _model(ts)


@given(ts=texts)
@_SETTINGS
def test_lm_quality_score_matches_reference(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), SCHEMA)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_char"])
        for r in lm_quality_score(df).collect()
    }
    model = _model(ts)
    expect = {}
    for i, t in enumerate(ts):
        bgs = _bigrams(t)
        if not bgs:
            continue  # sub-2-char docs have no bigrams and no score row
        s = sum(model[bg] for bg in bgs)
        expect[i] = (len(bgs), s / (len(bgs) * 1e6))
    assert got == expect
