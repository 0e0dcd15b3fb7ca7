"""Property-based tests for the PII scrub and the md5 split bucket
against Python references.

- pii_redact / pii_hit_count: the Catalyst regexp chain must equal a
  sequential re.sub / findall reference over generated texts assembled
  from PII-shaped fragments (emails, URLs, digit runs) and noise.
- hash_bucket: the md5-prefix bucket must equal
  int(md5(value)[:8], 16) % buckets — the reproducible-split contract
  (pure function of the id, stable across engines and cluster sizes).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.text_analysis import (
    PII_PATTERNS,
    hash_bucket,
    pii_hit_count,
    pii_redact,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

fragments = st.sampled_from(
    [
        "plain words here",
        "bob.smith+x@mail-host.co",
        "a@b.io",
        "http://ex.com/p?q=1",
        "https://x.y/z#frag",
        "1234",
        "98765432101",
        "123",  # below the 4-digit floor — must NOT redact
        "not@an@email",
        "httpx://nope",
        "tail",
    ]
)
texts = st.lists(
    st.lists(fragments, min_size=0, max_size=6).map(" ".join), min_size=1, max_size=8
)

SCHEMA = T.StructType(
    [T.StructField("i", T.LongType(), False), T.StructField("t", T.StringType(), False)]
)


@given(ts=texts)
@_SETTINGS
def test_pii_redact_matches_re(spark, ts):
    df = spark.createDataFrame(list(enumerate(ts)), SCHEMA)
    got = {
        r["i"]: (r["red"], r["hits"])
        for r in df.select(
            "i", pii_redact("t").alias("red"), pii_hit_count("t").alias("hits")
        ).collect()
    }
    for i, t in enumerate(ts):
        red = t
        for pattern, placeholder in PII_PATTERNS:
            red = re.sub(pattern, placeholder, red)
        hits = sum(len(re.findall(pattern, t)) for pattern, _ in PII_PATTERNS)
        assert got[i] == (red, hits)


@given(
    vals=st.lists(st.text(alphabet="abc01@. ", min_size=0, max_size=10), min_size=1, max_size=12),
    buckets=st.integers(min_value=1, max_value=10),
)
@_SETTINGS
def test_hash_bucket_matches_md5(spark, vals, buckets):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        T.StructType(
            [T.StructField("i", T.LongType(), False), T.StructField("v", T.StringType(), False)]
        ),
    )
    got = {r["i"]: r["b"] for r in df.select("i", hash_bucket("v", buckets).alias("b")).collect()}
    for i, v in enumerate(vals):
        expect = int(hashlib.md5(v.encode("utf-8")).hexdigest()[:8], 16) % buckets
        assert got[i] == expect
