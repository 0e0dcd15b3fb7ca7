"""Round-12 verdict item 2: a ``max_df``/``max_bucket`` below the
corpus's largest exact clone group silently erases that group's pairs
(the measured sf3 behavior: clone groups of 30 vs max_df=20 → 0 rows,
0 errors). These tests pin the two loud surfaces added for it:

1. the observation metrics ``uncapped_max_df`` / ``cap_below_top_group``
   fire on the sf3-style planted corpus (clone multiplicity above cap)
   and stay quiet when the cap covers the top group;
2. ``assert_cap_covers_clones`` turns the silent no-op into a hard job
   failure, and passes again after ``dedup_exact`` (the documented
   remedy) or with an adequate cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.dedup_text import (
    dedup_exact,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_candidates,
)

CLONE_SHIFT = 10_000_000
MULTIPLICITY = 6  # sf3-style clone groups, scaled to the smoke corpus


def _cloned_corpus(spark, sf_dir):
    """Every src0 doc replicated to an exact clone group of MULTIPLICITY
    (ids shifted per copy) — the sf1/sf3 derivation's shape at smoke
    scale. Returns (corpus, clone ids of one group)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.filter(F.col("source") == "src0")
    parts = [docs] + [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * CLONE_SHIFT))
        for i in range(1, MULTIPLICITY)
    ]
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    one_id = base.agg(F.min("doc_id")).collect()[0][0]
    group = [one_id + i * CLONE_SHIFT for i in range(MULTIPLICITY)]
    return corpus, group


def test_flag_fires_when_cap_below_clone_multiplicity(spark, sf_dir) -> None:
    """cap=3 < clone multiplicity 6: every shingle of a cloned doc has
    df ≥ 6, so the cap drops ALL the group's postings — the output holds
    no clone pair, and the observation says so loudly."""
    corpus, group = _cloned_corpus(spark, sf_dir)
    obs = Observation("cap_loss")
    out = jaccard_pairs(
        corpus, "doc_id", "text", "source",
        k=3, threshold=0.02, max_df=3, observation=obs,
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    m = obs.get
    assert m["cap_below_top_group"] is True
    assert m["uncapped_max_df"] >= MULTIPLICITY
    # post-cap metrics keep their pre-round-12 semantics
    assert m["max_df"] is None or m["max_df"] <= 3
    # ... and the silent no-op is real: the clone group's pairs are gone
    clone_pairs = {
        (a, b) for a in group for b in group if a < b
    }
    assert not (pairs & clone_pairs), "cap<multiplicity must erase clone pairs"


def test_flag_quiet_when_cap_covers_top_group(spark, sf_dir) -> None:
    corpus, group = _cloned_corpus(spark, sf_dir)
    obs = Observation("cap_ok")
    out = jaccard_pairs(
        corpus, "doc_id", "text", "source",
        k=3, threshold=0.02, max_df=10_000, observation=obs,
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    m = obs.get
    assert m["cap_below_top_group"] is False
    assert m["uncapped_max_df"] == m["max_df"]
    clone_pairs = {(a, b) for a in group for b in group if a < b}
    assert clone_pairs <= pairs, "adequate cap keeps every clone pair"


def test_assert_mode_fails_the_job_loudly(spark, sf_dir) -> None:
    corpus, _ = _cloned_corpus(spark, sf_dir)
    out = jaccard_pairs(
        corpus, "doc_id", "text", "source",
        k=3, threshold=0.02, max_df=3, assert_cap_covers_clones=True,
    )
    with pytest.raises(Exception, match="cap_below_top_group"):
        out.collect()


def test_assert_mode_passes_after_dedup_exact(spark, sf_dir) -> None:
    """The documented remedy: exact-dedup first collapses clone groups
    to multiplicity 1, so the same strict cap passes."""
    corpus, _ = _cloned_corpus(spark, sf_dir)
    reps = dedup_exact(corpus, "text", "doc_id").drop("fingerprint")
    out = jaccard_pairs(
        reps, "doc_id", "text", "source",
        k=3, threshold=0.02, max_df=3, assert_cap_covers_clones=True,
    )
    out.collect()  # must not raise


def test_assert_mode_passes_with_adequate_cap(spark, sf_dir) -> None:
    corpus, group = _cloned_corpus(spark, sf_dir)
    out = jaccard_pairs(
        corpus, "doc_id", "text", "source",
        k=3, threshold=0.02, max_df=10_000, assert_cap_covers_clones=True,
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    clone_pairs = {(a, b) for a in group for b in group if a < b}
    assert clone_pairs <= pairs


def test_simhash_flag_and_assert(spark, sf_dir) -> None:
    """Clones share ALL four bands, so every band bucket of the group is
    ≥ MULTIPLICITY and max_bucket=3 erases the group's candidates."""
    corpus, group = _cloned_corpus(spark, sf_dir)
    obs = Observation("sim_cap_loss")
    out = simhash_candidates(
        corpus, "doc_id", "text", max_bucket=3, observation=obs
    )
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    m = obs.get
    assert m["cap_below_top_group"] is True
    assert m["uncapped_max_df"] >= MULTIPLICITY
    clone_pairs = {(a, b) for a in group for b in group if a < b}
    assert not (pairs & clone_pairs)

    strict = simhash_candidates(
        corpus, "doc_id", "text", max_bucket=3, assert_cap_covers_clones=True
    )
    with pytest.raises(Exception, match="cap_below_top_group"):
        strict.collect()

    deduped = dedup_exact(corpus, "text", "doc_id").drop("fingerprint")
    ok = simhash_candidates(
        deduped, "doc_id", "text", max_bucket=3, assert_cap_covers_clones=True
    )
    ok.collect()  # must not raise


def test_minhash_assert_and_misuse_guard(spark, sf_dir) -> None:
    corpus, _ = _cloned_corpus(spark, sf_dir)
    strict = minhash_lsh_pairs(
        corpus, "doc_id", "text", max_bucket=3, assert_cap_covers_clones=True
    )
    with pytest.raises(Exception, match="cap_below_top_group"):
        strict.collect()
    with pytest.raises(ValueError, match="requires max_bucket"):
        minhash_lsh_pairs(
            corpus, "doc_id", "text", assert_cap_covers_clones=True
        )
    with pytest.raises(ValueError, match="requires max_df"):
        jaccard_pairs(
            corpus, "doc_id", "text", "source", assert_cap_covers_clones=True
        )
