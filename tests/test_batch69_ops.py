"""Round-3 batch-69: MTD/YTD, business days, aging report."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_aging_report,
    q_business_days,
    q_mtd_ytd,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_mtd_resets_ytd_accumulates(spark, sf_dir):
    rows = sorted(q_mtd_ytd(spark, sf_dir).collect(), key=lambda r: r["day"])
    assert rows
    # YTD is globally nondecreasing; MTD resets at month boundaries
    ytd = [r["ytd_cents"] for r in rows]
    assert ytd == sorted(ytd)
    for prev, cur in zip(rows, rows[1:]):
        if prev["day"][:7] == cur["day"][:7]:
            assert cur["mtd_cents"] == prev["mtd_cents"] + cur["cents"]
        else:
            assert cur["mtd_cents"] == cur["cents"]
    assert ytd[-1] == sum(r["cents"] for r in rows)


def test_business_days_closed_form(spark, sf_dir):
    r = q_business_days(spark, sf_dir).first()
    assert 0 < r["sum_business_days"] <= r["sum_cal_days"]
    # weekdays are at least 5/7 of any span (minus boundary slack)
    assert r["sum_business_days"] * 7 >= r["sum_cal_days"] * 5 - 2 * r["n_pairs"] * 7

    # spot-check the closed form against Python's weekday loop
    ev = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select("o_orderdate", "l_shipdate")
        .limit(50)
        .collect()
    )

    def bdays(d0: dt.date, d1: dt.date) -> int:
        n = 0
        d = d0
        while d < d1:
            d += dt.timedelta(days=1)
            if d.isoweekday() <= 5:
                n += 1
        return n

    from etl_pipeline_project_spark.queries import REGISTRY  # noqa: F401

    # recompute the Spark formula locally for the same 50 pairs
    def f(k: int) -> int:
        return (k // 7) * 5 + min(5, k % 7 + 1)

    for row in ev:
        d0, d1 = row["o_orderdate"], row["l_shipdate"]
        w = d0.isoweekday()
        cal = (d1 - d0).days
        assert f(cal + w - 1) - f(w - 1) == bdays(d0, d1)


def test_aging_buckets_cover_open_orders(spark, sf_dir):
    rows = {r["age_bucket"]: r for r in q_aging_report(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    n_open = orders.filter(F.col("o_orderstatus") == "O").count()
    assert sum(r["n_orders"] for r in rows.values()) == n_open
    assert set(rows) <= {"0-30", "31-60", "61-90", "90+"}
    # a 7-year corpus puts most open orders deep in the 90+ tail
    assert rows["90+"]["n_orders"] > 0
