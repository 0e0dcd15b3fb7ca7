"""Round-5 batch 95: M4 visual downsampling, deterministic priority
sampling, model-calibration bins, data-mixing epoch plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_calibration_bins,
    q_epoch_plan,
    q_m4_downsample,
    q_priority_sample,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_m4_keeps_exact_extrema(spark, sf_dir):
    out = q_m4_downsample(spark, sf_dir)
    rows = out.collect()
    # <=4 surviving rows per (series, bucket), every row carries a role
    per_bucket = {}
    for r in rows:
        per_bucket.setdefault((r["user_id"], r["bucket"]), []).append(r)
        assert r["is_first"] or r["is_last"] or r["is_min"] or r["is_max"]
    assert per_bucket and all(len(v) <= 4 for v in per_bucket.values())
    # the flagged min/max match a ground-truth recompute per bucket
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    truth = {
        (r["user_id"], r["bucket"]): r
        for r in ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("bucket"),
            "value",
        )
        .groupBy("user_id", "bucket")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for k, group in per_bucket.items():
        mins = [r["value"] for r in group if r["is_min"]]
        maxs = [r["value"] for r in group if r["is_max"]]
        assert mins == [truth[k]["lo"]] and maxs == [truth[k]["hi"]]
    # every bucket of the input survives (first row always kept)
    assert len(per_bucket) == len(truth)


def test_m4_first_last_are_temporal_extremes(spark, sf_dir):
    rows = q_m4_downsample(spark, sf_dir).collect()
    per_bucket = {}
    for r in rows:
        per_bucket.setdefault((r["user_id"], r["bucket"]), []).append(r)
    for group in per_bucket.values():
        firsts = [r for r in group if r["is_first"]]
        lasts = [r for r in group if r["is_last"]]
        assert len(firsts) == 1 and len(lasts) == 1
        ts_all = [r["ts"] for r in group]
        assert firsts[0]["ts"] == min(ts_all)
        assert lasts[0]["ts"] == max(ts_all)


def test_priority_sample_is_topk_and_deterministic(spark, sf_dir):
    a = q_priority_sample(spark, sf_dir).collect()
    b = q_priority_sample(spark, sf_dir).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert len(a) == 32
    ranks = sorted(r["rank"] for r in a)
    assert ranks == list(range(1, 33))
    # tau is the 33rd priority: every kept priority >= tau
    taus = {r["tau_q"] for r in a}
    assert len(taus) == 1
    tau = taus.pop()
    assert all(r["priority_q"] >= tau for r in a)
    # priority = weight * 2^40 div (h32+1) recomputes exactly
    import hashlib

    for r in a:
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        assert r["priority_q"] == (r["weight"] * (1 << 40)) // (h + 1)


def test_calibration_bins_partition_population(spark, sf_dir):
    rows = q_calibration_bins(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    n = ev.count()
    assert sorted(r["bin"] for r in rows) == list(range(1, 11))
    assert sum(r["n_rows"] for r in rows) == n
    # equal-count bins: sizes differ by at most 1
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert 0 <= r["n_pos"] <= r["n_rows"]
        assert abs(r["frac_pos"] - r["n_pos"] / r["n_rows"]) < 1e-12
        assert (
            abs(r["mean_score"] - r["sum_score_micro"] / r["n_rows"] / 1e6) < 1e-12
        )
    # mean predicted score is monotone across rank-ordered bins
    by_bin = sorted(rows, key=lambda r: r["bin"])
    scores = [r["mean_score"] for r in by_bin]
    assert scores == sorted(scores)


def test_epoch_plan_budget_allocates_uniformly(spark, sf_dir):
    rows = q_epoch_plan(spark, sf_dir).collect()
    total = sum(r["tokens"] for r in rows)
    n_src = len(rows)
    planned = (2 * total) // n_src
    for r in rows:
        assert r["planned_tokens"] == planned
        assert r["share_ppm"] == r["tokens"] * 1_000_000 // total
        assert r["epochs_milli"] == planned * 1000 // r["tokens"]
        assert r["over_cap"] == (r["epochs_milli"] > 4000)
    # ppm shares sum to ~1e6 (floor rounding loses < n_src ppm)
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - n_src <= s <= 1_000_000
