"""Property-based test for the language-ID heuristic against a Python
re-implementation: CJK presence ⇒ zh, else stopword-hit argmax with the
declared en>de>fr>es tie precedence, 'und' on zero hits — over generated
texts that mix stopwords from several languages (incl. the shared 'und'
DE-stopword / language-code pun, uppercase forms, and substring traps
like 'and' vs 'und' needing the word boundary)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.text_analysis import LANG_STOPWORDS, lang_id

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

WORDS = (
    [w for ws in LANG_STOPWORDS.values() for w in ws]
    + ["THE", "Und", "banana", "lesson", "toand", "中文", "x"]
)

texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=10,
)

SCHEMA = T.StructType(
    [T.StructField("i", T.LongType(), False), T.StructField("t", T.StringType(), False)]
)


def _ref_lang(t: str) -> str:
    if re.search(r"[一-鿿]", t):
        return "zh"
    hits = {
        lang: len(re.findall(r"\b(" + "|".join(ws) + r")\b", t.lower()))
        for lang, ws in LANG_STOPWORDS.items()
        if ws
    }
    best = max(hits.values())
    if best == 0:
        return "und"
    for lang in ["en", "de", "fr", "es"]:
        if hits[lang] == best:
            return lang
    return "und"


@given(ts=texts)
@_SETTINGS
def test_lang_id_matches_reference(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), SCHEMA)
    got = {r["i"]: r["lang"] for r in df.select("i", lang_id("t").alias("lang")).collect()}
    for i, t in enumerate(ts):
        assert got[i] == _ref_lang(t), t
