"""Round-5 batch 96: left-outer stream-stream join, bitemporal as-of
grid, deterministic k-fold assignment, semi-additive daily balance."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_bitemporal_join,
    q_kfold_assign,
    q_semi_additive_balance,
    q_stream_stream_left_join,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_stream_left_join_equals_batch_left_join(spark, sf_dir):
    out = q_stream_stream_left_join(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("vts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = v.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pts") >= F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("interval 1 hour")),
        "left",
    ).select("user_id", "view_id", "purchase_id")
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
    # outer semantics actually exercised: some views are unconverted
    assert any(r[2] is None for r in got)
    # no sentinel leaked
    assert all(r[0] >= 0 for r in got)


def test_bitemporal_late_knowledge_monotone(spark, sf_dir):
    rows = q_bitemporal_join(spark, sf_dir).collect()
    # within a fixed valid anchor, later transaction anchors can only know
    # MORE: the chosen version's valid_from is non-decreasing in t_idx
    best = {(r["v_idx"], r["t_idx"], r["user_id"]): r["event_id"] for r in rows}
    ev = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, sf_dir, "events").select("event_id", "ts").collect()
    }
    users = {r["user_id"] for r in rows}
    for u in users:
        for v_idx in (1, 2, 3):
            picks = [
                ev[best[(v_idx, t, u)]] for t in (1, 2, 3) if (v_idx, t, u) in best
            ]
            assert picks == sorted(picks)
    # more cells answered at larger T (knowledge only grows)
    n_by_t = {t: sum(1 for r in rows if r["t_idx"] == t) for t in (1, 2, 3)}
    assert n_by_t[1] <= n_by_t[2] <= n_by_t[3]
    # every answered cell respects both axes
    for r in rows:
        valid_anchor_day = 1 + r["v_idx"] * 7
        assert ev[r["event_id"]].day <= valid_anchor_day or ev[
            r["event_id"]
        ].month == 1  # valid_from <= V (coarse day-level check)


def test_kfold_reproducible_and_complete(spark, sf_dir):
    rows = q_kfold_assign(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    # recompute the fold census independently
    census = {}
    for d in docs:
        h = int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16)
        census[(h % 5, d["source"])] = census.get((h % 5, d["source"]), 0) + 1
    got = {(r["fold"], r["source"]): r["n_docs"] for r in rows}
    assert got == census
    assert sum(r["n_docs"] for r in rows) == len(docs)
    for r in rows:
        assert r["share_ppm"] == r["n_docs"] * 1_000_000 // r["fold_total"]
        assert 0 <= r["fold"] <= 4


def test_semi_additive_sums_closing_balances_only(spark, sf_dir):
    rows = sorted(q_semi_additive_balance(spark, sf_dir).collect(), key=lambda r: r["day"])
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # independent recompute of one day's closing total
    import math

    day0 = rows[0]["day"]
    per_user = {}
    for r in ev.filter(F.col("ts").cast("date") == F.lit(day0)).collect():
        key = r["user_id"]
        cand = (r["ts"], r["event_id"], math.floor(r["value"] * 1_000_000))
        if key not in per_user or (cand[0], cand[1]) > (
            per_user[key][0],
            per_user[key][1],
        ):
            per_user[key] = cand
    assert rows[0]["n_accounts"] == len(per_user)
    assert rows[0]["total_balance_micro"] == sum(v[2] for v in per_user.values())
    # deltas chain exactly
    assert rows[0]["delta_micro"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["delta_micro"] == cur["total_balance_micro"] - prev["total_balance_micro"]
