"""Round-2 batch-13 operators: resize decimation bounds, transition
totals, and map parse null-safety — the properties the DuckDB oracles
don't pin."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.multimodal import (
    resize_payload,
    to_multimodal,
)
from etl_pipeline_project_spark.queries import REGISTRY


def test_resize_bounds_and_exact_decimation(spark):
    """out_bytes ≤ target for any input size, and the checksum is exactly
    sha256 of the stride-decimated bytes."""
    blob = bytes(range(256)) * 3  # 768 bytes -> stride 12 -> 64 out
    df = spark.createDataFrame([(1, blob), (2, b"ab")], "doc_id LONG, payload BINARY")
    out = {
        r["doc_id"]: r
        for r in resize_payload(
            to_multimodal(df, "doc_id", "payload", "bin"), target_bytes=64
        ).collect()
    }
    assert out[1]["out_bytes"] == 64
    assert out[1]["resized_checksum"] == hashlib.sha256(blob[::12]).hexdigest()
    # tiny payloads pass through whole (stride clamps to 1)
    assert out[2]["out_bytes"] == 2
    assert out[2]["resized_checksum"] == hashlib.sha256(b"ab").hexdigest()


def test_transition_counts_conserve_events(spark, sf_dir):
    """Every user with k events contributes exactly k-1 transitions."""
    from etl_pipeline_project_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    n_transitions = (
        REGISTRY["q_event_transitions"](spark, sf_dir)
        .agg(F.sum("n"))
        .first()[0]
    )
    assert n_transitions == n_events - n_users


def test_map_parse_null_safe(spark):
    """Malformed JSON parses to NULL map — element_at and map_keys stay
    null-safe instead of erroring the batch."""
    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json")], "event_id INT, props STRING"
    )
    m = F.from_json("props", "map<string,int>")
    rows = {
        r["event_id"]: r
        for r in df.select(
            "event_id", F.element_at(m, "k").alias("k_value")
        ).collect()
    }
    assert rows[1]["k_value"] == 5 and rows[2]["k_value"] is None
