"""Round-3 batch-50: binary-file source, nearest as-of, gains table,
keyset pagination."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_gains_table,
    q_join_asof_nearest,
    q_keyset_pagination,
    q_scan_binaryfile,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_binaryfile_reconciles_bytes(spark, sf_dir):
    out = {r["source"]: r for r in q_scan_binaryfile(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    direct = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("text")).alias("b"),
        )
        .collect()
    }
    assert set(out) == set(direct)
    for s in out:
        assert out[s]["n_files"] == direct[s]["n"]
        assert out[s]["total_bytes"] == direct[s]["b"]


def test_asof_nearest_is_truly_nearest(spark, sf_dir):
    out = q_join_asof_nearest(spark, sf_dir)
    rows = out.limit(50).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    purch = {
        r["user_id"]: r
        for r in ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.collect_list(F.struct("ts", "event_id")).alias("ps"))
        .collect()
    }
    clicks = {
        r["event_id"]: r
        for r in ev.filter(F.col("event_type") == "click").collect()
    }
    for r in rows:
        c = clicks[r["click_id"]]
        cands = purch[r["user_id"]]["ps"]
        best = min(abs((p["ts"] - c["ts"]).total_seconds()) for p in cands)
        assert r["gap_seconds"] == int(best)
        assert r["gap_seconds"] <= 86400
    # one match per click at most
    assert out.groupBy("click_id").count().filter(F.col("count") > 1).count() == 0


def test_gains_table_front_loads(spark, sf_dir):
    rows = sorted(q_gains_table(spark, sf_dir).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    total_pos = sum(r["n_pos"] for r in rows)
    assert rows[-1]["cum_pos"] == total_pos
    assert abs(rows[-1]["cum_capture"] - 1.0) < 1e-12
    cums = [r["cum_pos"] for r in rows]
    assert cums == sorted(cums)


def test_keyset_pages_stable(spark, sf_dir):
    rows = {r["page"]: r for r in q_keyset_pagination(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["n_rows"] == 50 for r in rows.values())
    # page 1 holds the global max price
    orders = load_table(spark, sf_dir, "orders")
    assert rows[1]["top_price"] == orders.agg(F.max("o_totalprice")).first()[0]
    assert rows[1]["top_price"] >= rows[2]["top_price"] >= rows[3]["top_price"]
