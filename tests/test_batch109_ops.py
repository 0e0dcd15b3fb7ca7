"""Round-5 batch 109: capture-recapture, raking, vocab richness, hash
collision audit."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import (
    q_capture_recapture,
    q_hash_collision_audit,
    q_raking,
    q_vocab_richness,
)
from etl_pipeline_project_spark.sources.readers import load_table


def test_capture_recapture_chapman(spark, sf_dir):
    r = q_capture_recapture(spark, sf_dir).first()
    ev = load_table(spark, sf_dir, "events")
    users = [x["user_id"] for x in ev.select("user_id").distinct().collect()]
    s1 = {u for u in users if int(hashlib.md5(f"{u}s1".encode()).hexdigest()[:8], 16) % 2 == 0}
    s2 = {u for u in users if int(hashlib.md5(f"{u}s2".encode()).hexdigest()[:8], 16) % 2 == 0}
    assert (r["n1"], r["n2"], r["m"]) == (len(s1), len(s2), len(s1 & s2))
    assert r["true_n"] == len(users)
    assert r["chapman_est"] == (len(s1) + 1) * (len(s2) + 1) // (len(s1 & s2) + 1) - 1
    # the estimator lands within a factor of 2 of the truth here
    assert r["true_n"] / 2 <= r["chapman_est"] <= r["true_n"] * 2


def test_raking_converges_to_uniform_margins(spark, sf_dir):
    rows = q_raking(spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    n_types = len({r["event_type"] for r in rows})
    row_target = total * 10000 // n_types
    col_target = total * 10000 // 2
    # column margins are exact after the final column sweep (up to the
    # fixed-point quantum: integer div loses < n_cells units)
    col_mass = {}
    row_mass = {}
    for r in rows:
        col_mass.setdefault(r["grp"], r["col_mass"])
        row_mass.setdefault(r["event_type"], r["row_mass"])
    for cm in col_mass.values():
        assert abs(cm - col_target) <= 10 * 10000
    # row margins are approximately uniform after two sweeps
    for rm in row_mass.values():
        assert abs(rm - row_target) / row_target < 0.05
    # weights stay positive and total mass is conserved approximately
    assert all(r["weight_dmilli"] > 0 for r in rows)
    mass = sum(r["weight_dmilli"] for r in rows)
    assert abs(mass - total * 10000) / (total * 10000) < 0.01


def test_vocab_richness_recompute(spark, sf_dir):
    r = q_vocab_richness(spark, sf_dir).first()
    docs = load_table(spark, sf_dir, "documents").collect()
    from collections import Counter

    tf = Counter()
    for d in docs:
        tf.update(re.findall("[a-z]+", d["text"].lower()))
    f1 = sum(1 for c in tf.values() if c == 1)
    f2 = sum(1 for c in tf.values() if c == 2)
    assert r["s_obs"] == len(tf)
    assert r["n_tokens"] == sum(tf.values())
    assert (r["f1"], r["f2"]) == (f1, f2)
    assert r["chao1_est"] == len(tf) + (f1 * f1) // (2 * max(f2, 1))
    assert r["chao1_est"] >= r["s_obs"]  # Chao1 is a lower-bound ADD-ON
    assert abs(r["gt_unseen_mass"] - f1 / sum(tf.values())) < 1e-12


def test_hash_collision_near_birthday_bound(spark, sf_dir):
    r = q_hash_collision_audit(spark, sf_dir).first()
    docs = load_table(spark, sf_dir, "documents").collect()
    from collections import Counter

    buckets = Counter(
        int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:4], 16) for d in docs
    )
    assert r["n"] == len(docs)
    assert r["n_distinct"] == len(buckets)
    assert r["coll_pairs"] == sum(k * (k - 1) // 2 for k in buckets.values())
    assert r["max_bucket"] == max(buckets.values())
    assert r["expected_num"] == r["n"] * (r["n"] - 1)
    # md5 behaves: observed pairs within 5x of the birthday expectation
    if r["expected_pairs"] >= 1:
        assert r["coll_pairs"] <= 5 * r["expected_pairs"]
