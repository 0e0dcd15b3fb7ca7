"""Round-5 batch 97: parallel LTTB downsampling, 4-gram LM pairs,
Poisson bootstrap, rendezvous-hash shard assignment."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_lttb_downsample,
    q_ngram_lm_pairs,
    q_poisson_bootstrap,
    q_rendezvous_hash,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_lttb_one_point_per_interior_bucket(spark, sf_dir):
    rows = q_lttb_downsample(spark, sf_dir).collect()
    seen = {(r["user_id"], r["bucket"]) for r in rows}
    assert len(seen) == len(rows)  # exactly one survivor per bucket
    # interior buckets only: for each user the min and max bucket of the
    # full series never appear (they lack a neighbor)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    spans = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in ev.select(
            "user_id", F.expr("unix_timestamp(ts) div 86400").alias("b")
        )
        .groupBy("user_id")
        .agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
        .collect()
    }
    for u, b in seen:
        lo, hi = spans[u]
        assert lo < b < hi
    # areas are non-negative and finite
    assert all(r["area2"] >= 0 and math.isfinite(r["area2"]) for r in rows)


def test_lttb_picks_max_area_point(spark, sf_dir):
    # recompute one bucket's argmax from raw points
    out = q_lttb_downsample(spark, sf_dir).collect()
    pick = out[0]
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.unix_timestamp("ts").alias("x"),
            F.floor(F.col("value") * 1000000).cast("long").alias("y"),
            F.expr("unix_timestamp(ts) div 86400").alias("bucket"),
        )
        .filter(F.col("user_id") == pick["user_id"])
        .collect()
    )
    def centroid(b):
        grp = [p for p in pts if p["bucket"] == b]
        return sum(p["x"] for p in grp) / len(grp), sum(p["y"] for p in grp) / len(grp)

    buckets = sorted({p["bucket"] for p in pts})
    i = buckets.index(pick["bucket"])
    ax, ay = centroid(buckets[i - 1])
    cx, cy = centroid(buckets[i + 1])
    best = max(
        (abs((ax - cx) * (p["y"] - ay) - (ax - p["x"]) * (cy - ay)), -1)
        for p in pts
        if p["bucket"] == pick["bucket"]
    )[0]
    assert abs(best - pick["area2"]) < 1e-6 * max(1.0, abs(best))


def test_ngram_lm_probabilities_partition(spark, sf_dir):
    rows = q_ngram_lm_pairs(spark, sf_dir).collect()
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r["context"], []).append(r)
        assert len(r["context"].split(",")) == 3
        assert r["prob_ppm"] == r["n_pairs"] * 1_000_000 // r["ctx_total"]
    for ctx, grp in by_ctx.items():
        total = grp[0]["ctx_total"]
        assert all(g["ctx_total"] == total for g in grp)
        assert sum(g["n_pairs"] for g in grp) == total
    # pair mass = events with >= 3 predecessors per user
    ev = load_table(spark, sf_dir, "events")
    per_user = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    expect = sum(max(0, n - 3) for n in per_user.values())
    assert sum(r["n_pairs"] for r in rows) == expect


def test_poisson_bootstrap_draws_match_recompute(spark, sf_dir):
    rows = {r["replica"]: r for r in q_poisson_bootstrap(spark, sf_dir).collect()}
    assert sorted(rows) == list(range(32))
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    thresholds = [1580030168, 3160060337, 3950075421, 4213413783,
                  4279248373, 4292415291, 4294609777, 4294923276, 4294962463]
    for b in (0, 7, 31):
        n_draws = sum_chars = 0
        for d in docs:
            u = int(hashlib.md5(f"{d['doc_id']}:{b}".encode()).hexdigest()[:8], 16)
            c = next((k for k, t in enumerate(thresholds) if u < t), 9)
            n_draws += c
            sum_chars += c * d["n_chars"]
        assert rows[b]["n_draws"] == n_draws
        assert rows[b]["sum_chars"] == sum_chars
        assert abs(rows[b]["mean_chars"] - sum_chars / n_draws) < 1e-9
    # replica sizes concentrate around the corpus size (Poisson(1) mean 1)
    n = len(docs)
    for r in rows.values():
        assert 0.7 * n < r["n_draws"] < 1.3 * n


def test_rendezvous_minimal_disruption(spark, sf_dir):
    rows = q_rendezvous_hash(spark, sf_dir).collect()
    docs_n = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == docs_n
    for r in rows:
        if r["node_before"] != 3:
            # only node 3's keys move
            assert r["node_after"] == r["node_before"]
        else:
            assert r["node_after"] != 3
    # node 3's keys are redistributed across survivors, not dumped on one
    moved = [r for r in rows if r["node_before"] == 3]
    assert len(moved) >= 2
