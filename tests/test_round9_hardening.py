"""Round-9 hardening regressions.

1. Overflow guards must bound the per-row OPERANDS, not max() of the
   already-wrapped int64 product: a single row whose true product
   exceeds 2^63 wraps BEFORE max() sees it, so a product-based guard can
   read a small magnitude and wave the corrupted sum through (round-8
   ADVICE low on q_time_weighted_avg / q_model_score_broadcast).
2. A group whose guarded terms are all NULL (or an empty input) must
   keep its pre-guard NULL semantics — assert_true(NULL) raises, so the
   predicate is coalesced to true.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401 (import parity)

LIM = float(1 << 61)


def _agg(df):
    return df.groupBy("k").agg(
        F.sum(F.col("v") * F.col("d")).alias("s"),
        F.max(F.abs(F.col("v") * F.col("d"))).alias("_mt"),  # the OLD style
        F.max(F.abs("v")).alias("_mv"),
        F.max(F.abs("d")).alias("_md"),
        F.count(F.lit(1)).alias("_c"),
    )


def test_wrapped_product_fools_old_guard_but_not_operand_guard(spark) -> None:
    # Under this engine's ANSI default (Spark 4 ships ansi=true) the
    # overflow raises on its own; the guard exists for non-ANSI
    # deployments where v*d = 2^64 + 4 wraps SILENTLY to +4 in int64:
    # tiny |product|, corrupt sum — exercise that regime explicitly.
    v, d = 4, (1 << 62) + 1
    df = spark.createDataFrame([(1, v, d)], "k int, v long, d long")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        row = _agg(df).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert row["_mt"] == 4, "the wrapped product really does look tiny"
    old_safe = float(row["_c"]) * float(row["_mt"]) < LIM
    new_safe = float(row["_c"]) * float(row["_mv"]) * float(row["_md"]) < LIM
    assert old_safe, "old guard waves the corrupt sum through"
    assert not new_safe, "operand guard catches it"


def test_all_null_group_keeps_null_not_error(spark) -> None:
    # all-NULL terms: sum/max are NULL; the coalesced guard must stay
    # true (keep the NULL result) instead of assert_true(NULL) raising
    df = spark.createDataFrame(
        [(1, None, None)], "k int, v long, d long"
    )
    agg = _agg(df)
    safe = F.coalesce(
        F.col("_c").cast("double")
        * F.col("_mv").cast("double")
        * F.col("_md").cast("double")
        < F.lit(LIM),
        F.lit(True),
    )
    guard = F.assert_true(safe, F.lit("boom"))
    out = agg.select("k", F.when(guard.isNull(), F.col("s")).alias("s")).collect()
    assert out[0]["s"] is None  # NULL result survives; no raise

    # and the un-coalesced predicate would indeed raise on NULL
    bare = F.assert_true(
        F.col("_c").cast("double")
        * F.col("_mv").cast("double")
        * F.col("_md").cast("double")
        < F.lit(LIM),
        F.lit("boom"),
    )
    with pytest.raises(Exception, match="boom"):
        agg.select(F.when(bare.isNull(), F.col("s")).alias("s")).collect()


# ---------------------------------------------------------------------------
# Salted block-pair enumeration (the join-side enum scale-killer fix)
# ---------------------------------------------------------------------------


def _plain_pairs(emb, ordered: bool):
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("bl"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("br"), F.col("embedding").alias("vb")
    )
    cond = F.col("id_a") < F.col("id_b") if ordered else F.col("id_a") != F.col("id_b")
    return a.join(b, F.col("bl") == F.col("br")).filter(cond).select("id_a", "id_b")


@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("splits", [8, "auto"])
def test_salted_block_pairs_is_exactly_the_plain_join_pair_set(
    spark, sf_dir, ordered, splits
) -> None:
    """The salt is a pure parallelism transform: the enumerated pair SET
    must equal the plain block-equi-join's, for the ordered (id_a < id_b)
    and directed (id_a != id_b) variants, under both a fixed split count
    and the per-block auto sizing."""
    from etl_pipeline_project_spark.operators.similarity import salted_block_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    salted = salted_block_pairs(
        emb,
        id_col="vec_id",
        vec_col="embedding",
        block_col="label",
        ordered=ordered,
        splits=splits,
    ).select("id_a", "id_b")
    plain = _plain_pairs(emb, ordered)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_block_pairs_auto_bounds_cells_under_skew(spark) -> None:
    """Auto sizing must bound every grid cell's pair count near
    target_cell_rows² even when one block dwarfs the rest — the
    straggler-free property a fixed split count cannot give. Skewed
    frame: one 400-row block, one 10-row block."""
    from etl_pipeline_project_spark.operators.similarity import salted_block_pairs

    rows = [(i, 0 if i < 400 else 1, [float(i), 1.0]) for i in range(410)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    pairs = salted_block_pairs(
        df,
        id_col="vec_id",
        vec_col="embedding",
        block_col="label",
        splits="auto",
        target_cell_rows=50,
    )
    # exact set vs plain join on the same frame
    plain = _plain_pairs(
        df.withColumnRenamed("label", "label"), True
    )
    assert pairs.select("id_a", "id_b").exceptAll(plain).count() == 0
    assert plain.exceptAll(pairs.select("id_a", "id_b")).count() == 0
    # per-cell bound: with target 50, the 400-row block splits into G=8
    # slices of ~50 rows — no cell may see more than ~2x the target²
    # ordered pairs (hash imbalance allowance)
    cell_counts = (
        df.selectExpr(
            "label",
            "pmod(xxhash64(vec_id), 8) as g",
        )
        .where("label = 0")
        .groupBy("g")
        .count()
        .collect()
    )
    assert max(r["count"] for r in cell_counts) <= 2 * 50


def test_salted_block_pairs_distributes_cells_not_blocks(spark, sf_dir) -> None:
    """With B blocks, the plain join bounds parallelism by B regardless of
    cluster size; the salted plan must spread the quadratic work over the
    FULL configured shuffle parallelism (an explicit Exchange on the
    grid-cell key, every shuffle partition occupied) — i.e. the pair
    stream's task count is set by the session, not by the block count."""
    from etl_pipeline_project_spark.operators.similarity import salted_block_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_blocks = emb.select("label").distinct().count()
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pairs = salted_block_pairs(
        emb, id_col="vec_id", vec_col="embedding", block_col="label", splits=8
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(block" in plan
    occupied = pairs.select(F.spark_partition_id().alias("p")).distinct().count()
    # 8 splits x B blocks = 8²·B cells >> nparts, so nearly every shuffle
    # partition holds work — the plain join could never occupy more than
    # B distinct reducers on the pair-generating stage. `occupied ==
    # nparts` exactly would flake: hashing ~640 cells into nparts buckets
    # leaves a bucket empty with small but real probability. The property
    # claimed is that occupancy tracks the CONFIGURED parallelism (640
    # cells >> nparts), not the block count, so assert near-full
    # occupancy of nparts whatever the session's nparts/B ratio is.
    assert occupied >= 0.9 * nparts, (occupied, nparts, n_blocks)


def test_containment_max_df_caps_hot_shingles_exactly(spark, sf_dir) -> None:
    """max_df=None is the exact oracle-checked contract; a huge cap must
    change nothing, and a cap of 1 must drop every co-occurring shingle
    (posting lists of length >= 2) and so emit no pairs."""
    from etl_pipeline_project_spark.operators.dedup_text import containment_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = containment_pairs(docs, "doc_id", "text", "source", k=3, threshold=0.15)
    capped_high = containment_pairs(
        docs, "doc_id", "text", "source", k=3, threshold=0.15, max_df=10**9
    )
    assert exact.exceptAll(capped_high).count() == 0
    assert capped_high.exceptAll(exact).count() == 0
    capped_one = containment_pairs(
        docs, "doc_id", "text", "source", k=3, threshold=0.15, max_df=1
    )
    assert capped_one.count() == 0
