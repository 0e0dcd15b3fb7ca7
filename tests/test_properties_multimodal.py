"""Property-based tests for the multimodal plumbing over GENERATED binary
payloads (empty blobs, 1-byte blobs, blobs bigger than the frame stride):
the mapInPandas schema/batch contracts and the metadata layout must hold
for arbitrary bytes, with Python references computing the same
deterministic stand-in transforms (byte-bucket histogram features,
stride decimation, fixed-stride frame slices)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    resize_payload,
    to_multimodal,
)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

blobs = st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=8)


def _mm(spark, bs):
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(bs)], RAW_SCHEMA
    )
    return to_multimodal(df, "doc_id", "payload", "img")


@given(bs=blobs)
@_SETTINGS
def test_to_multimodal_metadata(spark, bs):
    rows = {r["doc_id"]: r for r in _mm(spark, bs).collect()}
    assert set(rows) == set(range(len(bs)))
    for i, b in enumerate(bs):
        r = rows[i]
        assert bytes(r["content"]) == b
        assert r["meta"]["format"] == "img"
        assert r["meta"]["n_bytes"] == len(b)
        assert r["meta"]["checksum"] == hashlib.sha256(b).hexdigest()


@given(bs=blobs)
@_SETTINGS
def test_extract_features_matches_reference(spark, bs):
    rows = {r["doc_id"]: r for r in extract_features(_mm(spark, bs)).collect()}
    assert set(rows) == set(range(len(bs)))  # one output row per input, no drops
    for i, b in enumerate(bs):
        r = rows[i]
        assert r["n_bytes"] == len(b)
        hist = [0] * FEATURE_DIM
        for byte in b:
            hist[byte % FEATURE_DIM] += 1
        expect = [h / max(len(b), 1) for h in hist]
        assert r["features"] == expect
        # L1-normalized (sums to 1 for non-empty blobs)
        if b:
            assert math.isclose(sum(r["features"]), 1.0, rel_tol=1e-12)


@given(bs=blobs, target=st.integers(min_value=1, max_value=80))
@_SETTINGS
def test_resize_payload_matches_reference(spark, bs, target):
    rows = {
        r["doc_id"]: r
        for r in resize_payload(_mm(spark, bs), target_bytes=target).collect()
    }
    assert set(rows) == set(range(len(bs)))
    for i, b in enumerate(bs):
        r = rows[i]
        stride = max((len(b) + target - 1) // target, 1)
        dec = b[::stride]
        assert r["n_bytes"] == len(b)
        assert r["out_bytes"] == len(dec)
        assert r["out_bytes"] <= target  # bounded output regardless of skew
        assert r["resized_checksum"] == hashlib.sha256(dec).hexdigest()


@given(bs=blobs, stride=st.integers(min_value=1, max_value=100), max_frames=st.integers(min_value=1, max_value=5))
@_SETTINGS
def test_frame_sample_matches_reference(spark, bs, stride, max_frames):
    rows = frame_sample(
        _mm(spark, bs), every_n_bytes=stride, max_frames=max_frames
    ).collect()
    got = {(r["doc_id"], r["frame_no"]): r["frame_checksum"] for r in rows}
    assert len(got) == len(rows)  # (doc, frame) unique
    expect = {}
    for i, b in enumerate(bs):
        for f in range(max_frames):
            off = f * stride
            if off < len(b):
                expect[(i, f)] = hashlib.sha256(b[off : off + stride]).hexdigest()
    assert got == expect
