"""Round-5 batch 106: McNemar test, Cohen's kappa, cost-sensitive
threshold, matched-pairs ATT."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_cohen_kappa,
    q_cost_threshold,
    q_matched_pairs_att,
    q_mcnemar_test,
)
from etl_pipeline_project_spark.sources.readers import load_table


def _rules(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    cells = {"both": 0, "a_only": 0, "b_only": 0, "neither": 0}
    for d in docs:
        a = d["n_chars"] >= 300
        b = len(set(re.findall("[a-z]+", d["text"].lower()))) >= 26
        key = (
            "both" if a and b else "a_only" if a else "b_only" if b else "neither"
        )
        cells[key] += 1
    return cells, len(docs)


def test_mcnemar_cells_and_chi2(spark, sf_dir):
    r = q_mcnemar_test(spark, sf_dir).first()
    cells, n = _rules(spark, sf_dir)
    assert r["n"] == n
    assert r["keep_both"] == cells["both"]
    assert r["a_only"] == cells["a_only"]
    assert r["b_only"] == cells["b_only"]
    assert r["neither"] == cells["neither"]
    b, c = cells["a_only"], cells["b_only"]
    assert abs(r["chi2"] - (b - c) ** 2 / (b + c)) < 1e-9


def test_cohen_kappa_identity(spark, sf_dir):
    r = q_cohen_kappa(spark, sf_dir).first()
    cells, n = _rules(spark, sf_dir)
    ka = cells["both"] + cells["a_only"]
    kb = cells["both"] + cells["b_only"]
    agree = cells["both"] + cells["neither"]
    pe_num = ka * kb + (n - ka) * (n - kb)
    assert r["kappa_num"] == n * agree - pe_num
    assert r["kappa_den"] == n * n - pe_num
    assert abs(r["kappa"] - r["kappa_num"] / r["kappa_den"]) < 1e-12
    # classic identity: kappa equals (po - pe) / (1 - pe)
    po, pe = agree / n, pe_num / n**2
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-9
    # the two rules are positively associated (long docs have rich vocab)
    assert r["kappa"] > 0


def test_cost_threshold_confusion_and_optimum(spark, sf_dir):
    rows = q_cost_threshold(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    n = len(docs)
    min_cost = min(r["cost"] for r in rows)
    assert sum(1 for r in rows if r["is_optimal"]) >= 1
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert r["cost"] == r["fp"] + 3 * r["fn"]
        assert r["is_optimal"] == (r["cost"] == min_cost)
        # recompute the confusion cells
        tp = sum(1 for d in docs if d["n_chars"] >= r["threshold"] and d["lang"] == "en")
        fp = sum(1 for d in docs if d["n_chars"] >= r["threshold"] and d["lang"] != "en")
        assert (r["tp"], r["fp"]) == (tp, fp)


def test_matched_pairs_att_nearest(spark, sf_dir):
    r = q_matched_pairs_att(spark, sf_dir).first()
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    units = (
        ev.groupBy("user_id", (F.col("user_id") % 2).alias("grp"))
        .agg(
            F.count(F.when(F.dayofmonth("ts") <= 15, 1)).alias("score"),
            F.sum(
                F.when(
                    F.dayofmonth("ts") > 15,
                    F.floor(F.col("value") * 1000000).cast("long"),
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    treated = [(u["score"], u["user_id"], u["y"]) for u in units if u["grp"] == 1]
    controls = sorted(
        (u["score"], u["user_id"], u["y"]) for u in units if u["grp"] == 0
    )
    assert r["n_pairs"] == len(treated)
    # nearest-score matching with replacement: total distance matches
    total_dist = 0
    for s, _, _ in treated:
        total_dist += min(abs(s - cs) for cs, _, _ in controls)
    assert r["total_match_dist"] == total_dist
    assert abs(
        r["att"]
        - (r["sum_treated_micro"] - r["sum_matched_micro"]) / r["n_pairs"] / 1e6
    ) < 1e-12
    assert math.isfinite(r["att"])
