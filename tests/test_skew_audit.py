"""Gate for tools/skew_audit.py — the data-skew companion to the plan
audit (round-10 verdict item 6).

plan_audit gates plan-SHAPE scale killers; these tests gate the
DATA-dependent one: hot keys on pair-producing shuffles. Three layers:

1. Every registered probe passes its documented bound on the driver's
   own testdata (the corpus the oracle-checked registry keys run on).
2. The fair-share gate FIRES on a corpus with a planted hot shingle —
   a boilerplate footer shared by a whole source block (the web-corpus
   page-footer regime) — the violation being the audit's signal.
3. The ``max_df`` capped path provably bounds the measured quadratic
   work (via the operators' own df.observe metrics), stays a subset of
   the exact result, and still finds planted TRUE duplicates (clones),
   which is the exactness trade the cap documents: only hot-shingle
   (boilerplate) overlap is under-counted, never clone-level overlap.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from tools.skew_audit import FAIR_SHARE_PARTS, PROBES, SMALL_DATA_FLOOR, run_probe

FOOTER = " copyright footer terms privacy contact about"
CLONE_SHIFT = 10_000_000


@pytest.mark.parametrize("probe", sorted(PROBES))
def test_probe_within_documented_bound(spark, sf_dir, probe) -> None:
    rec = run_probe(spark, sf_dir, probe)
    assert rec["ok"], rec


def _planted_corpus(spark, sf_dir):
    """documents + 10 clones of src0 docs (true dups, ids +CLONE_SHIFT),
    then a 6-word boilerplate footer appended to every src0 doc: each
    footer shingle's posting list spans the whole hot block, so the
    exact inverted-index join pays ~4·n_hot² rows on 4 keys.
    Returns (corpus, n_hot, clone_id_pairs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    originals = docs.filter(F.col("source") == "src0").orderBy("doc_id").limit(10)
    clone_ids = [r.doc_id for r in originals.select("doc_id").collect()]
    clones = originals.withColumn("doc_id", F.col("doc_id") + F.lit(CLONE_SHIFT))
    corpus = docs.unionByName(clones).withColumn(
        "text",
        F.when(
            F.col("source") == "src0", F.concat(F.col("text"), F.lit(FOOTER))
        ).otherwise(F.col("text")),
    )
    n_hot = corpus.filter(F.col("source") == "src0").count()
    return corpus, n_hot, [(i, i + CLONE_SHIFT) for i in clone_ids]


_SF01 = "/root/testdata/sf0.1"


@pytest.mark.skipif(
    not os.path.exists(f"{_SF01}/documents.parquet"),
    reason="needs the driver-generated sf0.1 corpus (hot-shingle regime "
    "requires corpus scale; sf0.001 cannot clear the small-data floor)",
)
def test_audit_detects_planted_hot_shingle(spark) -> None:
    """At corpus scale the footer posting list owns more than a fair
    share of the quadratic work and clears the small-data floor: the
    gate must fire. Scale is simulated with the sf0.1 corpus replicated
    3x by key shift (the sf1_replay derivation) — blocks grow with the
    corpus while natural shingle dfs stay low, which is exactly the
    real web-corpus shape where a page footer spans a whole domain
    block. (A uniform N-x replication alone cannot produce the regime:
    it scales the hot key's d² and the total Σdf² by the same N², so
    the planted block must dominate its block, as footers do.)"""
    from etl_pipeline_project_spark.operators.dedup_text import word_shingles

    docs = spark.read.parquet(f"{_SF01}/documents.parquet")
    copies = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(3)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    hot = big.withColumn(
        "text",
        F.when(
            F.col("source") == "src0", F.concat(F.col("text"), F.lit(FOOTER))
        ).otherwise(F.col("text")),
    )
    s = (
        hot.select(
            F.col("source").alias("k1"),
            F.explode(word_shingles(F.col("text"), 3)).alias("k2"),
        )
        .groupBy("k1", "k2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(
            F.max("cnt").alias("max_cnt"),
            F.sum((F.col("cnt") * F.col("cnt")).cast("long")).alias("sum_sq"),
        )
        .collect()[0]
    )
    hot_pairs = int(s["max_cnt"]) ** 2
    limit = max(int(s["sum_sq"]) // FAIR_SHARE_PARTS, SMALL_DATA_FLOOR)
    assert hot_pairs > limit, (hot_pairs, limit)


def test_capped_path_bounds_pair_work_and_keeps_true_dups(spark, sf_dir) -> None:
    from etl_pipeline_project_spark.operators.dedup_text import containment_pairs

    corpus, n_hot, clone_pairs = _planted_corpus(spark, sf_dir)
    corpus = corpus.localCheckpoint(eager=True)  # two runs, one derivation

    exact_obs = Observation("exact_skew")
    exact = containment_pairs(
        corpus, "doc_id", "text", "source", k=3, threshold=0.15,
        observation=exact_obs,
    )
    exact_rows = {(r.id_a, r.id_b) for r in exact.collect()}
    ex_m = exact_obs.get

    cap = 20
    capped_obs = Observation("capped_skew")
    capped = containment_pairs(
        corpus, "doc_id", "text", "source", k=3, threshold=0.15,
        max_df=cap, observation=capped_obs,
    )
    capped_rows = {(r.id_a, r.id_b) for r in capped.collect()}
    cp_m = capped_obs.get

    # the exact path really is in the hot regime: the footer posting
    # lists span the block, and the measured quadratic work exceeds the
    # capped path's by at least the hottest list's d² (4 footer shingles
    # of df = n_hot each are dropped by the cap)
    assert ex_m["max_df"] >= n_hot, ex_m
    assert cp_m["max_df"] <= cap, cp_m
    assert ex_m["pair_rows_upper"] >= cp_m["pair_rows_upper"] + n_hot * n_hot, (
        ex_m, cp_m, n_hot,
    )
    # the cap only removes intersection counts, so capped containment
    # <= exact containment pairwise: the capped result is a subset
    assert capped_rows <= exact_rows, sorted(capped_rows - exact_rows)[:5]
    # true duplicates survive the cap: a clone shares ALL shingles with
    # its original — dropping the 4 footer-only shingles leaves
    # containment ~(|A|-4)/|A| >> threshold
    for a, b in clone_pairs:
        assert (a, b) in capped_rows, (a, b)
        assert (b, a) in capped_rows, (b, a)


def test_simhash_bucket_cap_and_exact_first(spark, sf_dir) -> None:
    """The sf1 skew audit found the band-bucket analog of the hot
    shingle: exact clones share ALL bands, so clone swarms make
    mega-buckets and the 16-bit key space makes bucket size linear in
    corpus size. Both documented remedies must hold:

    1. max_bucket=huge is the identity; max_bucket=1 empties the join
       (every candidate needs a bucket of >= 2).
    2. exact-dedup-first: planting 50 exact clones of one doc must not
       change the candidate set once dedup_exact runs first (clones are
       the mega-bucket; removing them restores the unique corpus).
    3. the operator's observation reports the planted bucket (max_df >=
       51 on the cloned corpus) and the capped run bounds it.
    """
    from etl_pipeline_project_spark.operators.dedup_text import (
        dedup_exact,
        simhash_candidates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = simhash_candidates(docs, "doc_id", "text")
    base_rows = {(r.id_a, r.id_b) for r in base.collect()}

    capped_high = simhash_candidates(docs, "doc_id", "text", max_bucket=10**9)
    assert {(r.id_a, r.id_b) for r in capped_high.collect()} == base_rows
    assert simhash_candidates(docs, "doc_id", "text", max_bucket=1).count() == 0

    one = docs.orderBy("doc_id").limit(1)
    clones = one.crossJoin(
        spark.range(1, 51).select((F.col("id") + CLONE_SHIFT).alias("_cid"))
    ).select(
        F.col("_cid").alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    cloned = docs.unionByName(clones)

    obs = Observation("simhash_skew")
    hot = simhash_candidates(cloned, "doc_id", "text", observation=obs)
    hot.write.mode("overwrite").format("noop").save()
    assert obs.get["max_df"] >= 51, obs.get

    cap_obs = Observation("simhash_capped")
    capped = simhash_candidates(
        cloned, "doc_id", "text", max_bucket=40, observation=cap_obs
    )
    capped.write.mode("overwrite").format("noop").save()
    assert cap_obs.get["max_df"] <= 40, cap_obs.get

    deduped = dedup_exact(cloned, "text", "doc_id").drop("fingerprint")
    exact_first = simhash_candidates(deduped, "doc_id", "text")
    assert {(r.id_a, r.id_b) for r in exact_first.collect()} == base_rows


def test_minhash_bucket_cap_identity_and_metrics(spark, sf_dir) -> None:
    """Band-join instance #3 (MinHash-LSH batch self-join): a huge cap is
    the identity, cap=1 empties the candidate join, and the observation
    reports the band-bucket distribution from the join's own pass."""
    from etl_pipeline_project_spark.operators.dedup_text import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = minhash_lsh_pairs(docs, "doc_id", "text")
    base_rows = {(r.id_a, r.id_b) for r in base.collect()}

    obs = Observation("mh_skew")
    hi = minhash_lsh_pairs(
        docs, "doc_id", "text", max_bucket=10**9, observation=obs
    )
    assert {(r.id_a, r.id_b) for r in hi.collect()} == base_rows
    m = obs.get
    assert m["max_df"] >= 2 and m["pair_rows_upper"] >= m["n_postings"], m
    assert minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=1).count() == 0
