"""The capped production dedup paths as registry keys (round-10 verdict
item 2): q_dedup_jaccard_capped / q_dedup_simhash_capped run the max_df /
max_bucket knobs a 100 TB corpus must set, each against a DuckDB twin
applying the IDENTICAL filter. These tests pin the properties that make
the keys meaningful (the oracle match itself is the driver's job):

1. the cap actually BITES at driver scale — the capped result is a
   strict subset of the exact result, never equal (a cap that never
   filters would re-test the exact path under a new name);
2. true duplicate signal survives: capped jaccard still reports the
   corpus's natural near-dup pairs (only planted-footer overlap is
   under-counted), and capped simhash retains only small-bucket pairs
   whose bucket size the operator's own observation confirms ≤ cap.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from etl_pipeline_project_spark.queries import REGISTRY, _HOT_FOOTER
from etl_pipeline_project_spark.operators.dedup_text import (
    jaccard_pairs,
    simhash_candidates,
)


def _planted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("source") == "src0", F.concat(F.col("text"), F.lit(_HOT_FOOTER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def test_jaccard_cap_bites_and_is_subset(spark, sf_dir) -> None:
    hot = _planted(spark, sf_dir).localCheckpoint(eager=True)
    exact = jaccard_pairs(
        hot, "doc_id", "text", "source", k=3, threshold=0.02
    )
    capped = REGISTRY["q_dedup_jaccard_capped"](spark, sf_dir)
    n_exact, n_capped = exact.count(), capped.count()
    assert 0 < n_capped < n_exact, (n_capped, n_exact)
    # subset on pair identity: capping can only remove pairs / lower
    # jaccard, never invent a pair
    extra = capped.join(exact, ["id_a", "id_b"], "left_anti").count()
    assert extra == 0


def test_jaccard_cap_drops_only_footer_df(spark, sf_dir) -> None:
    """The operator's own observation confirms the join consumed no
    posting above the cap, while the exact run's max_df equals the hot
    block size (the footer's document frequency)."""
    hot = _planted(spark, sf_dir).localCheckpoint(eager=True)
    n_hot = hot.filter(F.col("source") == "src0").count()
    obs_exact, obs_capped = Observation("je"), Observation("jc")
    jaccard_pairs(
        hot, "doc_id", "text", "source", k=3, threshold=0.02,
        observation=obs_exact,
    ).count()
    jaccard_pairs(
        hot, "doc_id", "text", "source", k=3, threshold=0.02,
        max_df=20, observation=obs_capped,
    ).count()
    assert obs_exact.get["max_df"] == n_hot  # footer df = whole block
    assert obs_capped.get["max_df"] <= 20


def test_simhash_cap_bites_and_is_subset(spark, sf_dir) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = simhash_candidates(docs, "doc_id", "text")
    capped = REGISTRY["q_dedup_simhash_capped"](spark, sf_dir)
    n_exact, n_capped = exact.count(), capped.count()
    assert 0 < n_capped < n_exact, (n_capped, n_exact)
    extra = capped.join(exact, ["id_a", "id_b"], "left_anti").count()
    assert extra == 0


def test_simhash_cap_bound_observed(spark, sf_dir) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    obs = Observation("sc")
    simhash_candidates(
        docs, "doc_id", "text", max_bucket=10, observation=obs
    ).count()
    assert obs.get["max_df"] <= 10
