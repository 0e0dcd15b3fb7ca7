"""Round-5 batch 103: lagged cross-correlation, Fano dispersion,
forecast backtest, n-gram novelty."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_cross_correlation,
    q_fano_dispersion,
    q_forecast_backtest,
    q_ngram_novelty,
)
from etl_pipeline_project_spark.sources.readers import load_table


def _daily(spark, sf_dir, etype):
    ev = load_table(spark, sf_dir, "events")
    return {
        r["d"]: r["n"]
        for r in ev.filter(F.col("event_type") == etype)
        .groupBy(F.expr("unix_timestamp(ts) div 86400").alias("d"))
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }


def test_cross_correlation_recompute(spark, sf_dir):
    rows = {r["lag"]: r for r in q_cross_correlation(spark, sf_dir).collect()}
    assert sorted(rows) == [-3, -2, -1, 0, 1, 2, 3]
    clicks = _daily(spark, sf_dir, "click")
    buys = _daily(spark, sf_dir, "purchase")
    days = sorted(set(clicks) | set(buys))
    for lag in (-2, 0, 3):
        pairs = [
            (clicks.get(d, 0), buys.get(d + lag, 0))
            for d in days
            if d + lag in days and d in days
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        r = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert rows[lag]["n"] == n
        assert abs(rows[lag]["r"] - r) < 1e-9
        assert -1 - 1e-9 <= rows[lag]["r"] <= 1 + 1e-9


def test_fano_dispersion_fraction(spark, sf_dir):
    rows = q_fano_dispersion(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert 0 < len(rows) <= n_users
    for r in rows:
        assert r["n_days"] >= 2
        assert abs(r["dispersion"] - r["disp_num"] / r["disp_den"]) < 1e-12
        assert r["bursty"] == (r["disp_num"] * 2 > r["disp_den"] * 3)
        assert r["disp_num"] >= 0  # variance numerator non-negative


def test_forecast_backtest_mase(spark, sf_dir):
    rows = q_forecast_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mase"] == r["sae_seasonal"] / r["sae_naive1"]
        assert r["n_eval"] > 0
    # spot recompute one event type
    pick = rows[0]["event_type"]
    d = _daily(spark, sf_dir, pick)
    sae_s = sae_1 = n = 0
    for day, x in d.items():
        if day - 7 in d and day - 1 in d:
            n += 1
            sae_s += abs(x - d[day - 7])
            sae_1 += abs(x - d[day - 1])
    r0 = next(r for r in rows if r["event_type"] == pick)
    assert (r0["n_eval"], r0["sae_seasonal"], r0["sae_naive1"]) == (n, sae_s, sae_1)


def test_ngram_novelty_first_doc_all_novel(spark, sf_dir):
    rows = {r["doc_id"]: r for r in q_ngram_novelty(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    first_id = docs.agg(F.min("doc_id")).first()[0]
    # the earliest document is 100% novel by construction
    assert rows[first_id]["novel"] == rows[first_id]["n_grams"]
    assert rows[first_id]["novelty_ppm"] == 1_000_000
    # recompute one later doc against all earlier docs
    sample = sorted(rows)[len(rows) // 2]
    texts = {
        r["doc_id"]: re.findall("[a-z]+", r["text"].lower())
        for r in docs.filter(F.col("doc_id") <= sample).collect()
    }

    def grams(ws):
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    mine = grams(texts[sample])
    earlier = set()
    for did, ws in texts.items():
        if did < sample:
            earlier |= grams(ws)
    novel = {g for g in mine if g not in earlier}
    assert rows[sample]["n_grams"] == len(mine)
    assert rows[sample]["novel"] == len(novel)
    assert rows[sample]["novelty_ppm"] == len(novel) * 1_000_000 // len(mine)
