"""Round-3 batch-76: centered MA, multi-offset lags."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_centered_ma,
    q_multi_offset_lags,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_centered_ma_edges_shrink(spark, sf_dir):
    rows = sorted(q_centered_ma(spark, sf_dir).collect(), key=lambda r: r["day"])
    n = len(rows)
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    assert n == ev.select(F.col("ts").cast("date")).distinct().count()
    # interior windows hold 7 days; the first/last shrink to 4
    assert rows[0]["ma_den"] == 4 and rows[-1]["ma_den"] == 4
    for r in rows[3 : n - 3]:
        assert r["ma_den"] == 7
    for r in rows:
        assert r["centered_ma"] == r["ma_num"] / r["ma_den"]


def test_multi_offset_lags_identities(spark, sf_dir):
    rows = sorted(q_multi_offset_lags(spark, sf_dir).collect(), key=lambda r: r["day"])
    cents = [r["cents"] for r in rows]
    for i, r in enumerate(rows):
        for off, col in ((1, "dod_cents"), (7, "wow_cents"), (14, "w2w_cents")):
            if i >= off:
                assert r[col] == cents[i] - cents[i - off]
            else:
                assert r[col] is None
