"""Property-based tests for the streaming SCD2 store (streaming/scd2.py)
against a Python run-collapse reference over generated change events.

Invariants checked for every generated event set, delivered as ordered
micro-batches:
1. the store equals the reference version chain (key, attr, valid_from,
   valid_to) computed by collapsing equal-attribute runs per key;
2. exactly one open (is_current) row per key, intervals chain without
   gaps or overlaps (valid_to == next valid_from);
3. idempotence: re-delivering an already-folded batch (duplicate file /
   retry) leaves the store unchanged.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.streaming.scd2 import merge_scd2_batch, scd2_state

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_id", T.LongType(), False),
    ]
)

# (key, ts) unique via dict keys => run collapse is deterministic without
# leaning on the (ts, id) tie-break
events_strategy = st.dictionaries(
    st.tuples(st.integers(min_value=0, max_value=3), st.integers(min_value=0, max_value=60)),
    st.sampled_from(["view", "click", "buy"]),
    min_size=0,
    max_size=20,
)


def _reference_chain(events):
    """Per key: sort by ts, collapse equal-attr runs, chain validity."""
    by_key: dict[int, list[tuple[int, str]]] = {}
    for (k, ts), attr in events.items():
        by_key.setdefault(k, []).append((ts, attr))
    expect = set()
    for k, evs in by_key.items():
        evs.sort()
        runs = [(ts, attr) for i, (ts, attr) in enumerate(evs) if i == 0 or evs[i - 1][1] != attr]
        for i, (ts, attr) in enumerate(runs):
            valid_to = runs[i + 1][0] if i + 1 < len(runs) else None
            expect.add((k, attr, ts, valid_to))
    return expect


@given(events=events_strategy, cut=st.integers(min_value=0, max_value=60))
@_SETTINGS
def test_scd2_store_matches_reference(spark, tmp_path_factory, events, cut):
    store = str(tmp_path_factory.mktemp("scd2") / "store")
    rows = [(k, ts, attr, 1000 + i) for i, (((k, ts), attr)) in enumerate(sorted(events.items()))]
    # two waves split on an event-time cut — the ordering contract
    wave1 = [r for r in rows if r[1] <= cut]
    wave2 = [r for r in rows if r[1] > cut]
    for wave in (wave1, wave2):
        if wave:
            merge_scd2_batch(spark.createDataFrame(wave, SCHEMA), store)
    if not rows:
        return  # nothing written, no store to read

    state = scd2_state(spark, store).collect()
    got = {(r["user_id"], r["event_type"], r["valid_from"], r["valid_to"]) for r in state}
    assert got == _reference_chain(events)

    # exactly one current row per key; intervals chain without gap/overlap
    by_key: dict[int, list] = {}
    for r in state:
        by_key.setdefault(r["user_id"], []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in versions if r["is_current"]) == 1
        assert versions[-1]["valid_to"] is None
        for prev, nxt in zip(versions, versions[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            assert prev["event_type"] != nxt["event_type"]

    # idempotence: re-delivering the last wave changes nothing
    last = wave2 or wave1
    merge_scd2_batch(spark.createDataFrame(last, SCHEMA), store)
    again = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in scd2_state(spark, store).collect()
    }
    assert again == got
