"""Data-skew audit — the DATA-dependent companion to tools/plan_audit.py.

plan_audit gates every plan-SHAPE scale-killer class (CartesianProduct,
row-Python, single-partition windows, enum-partitioned windows, enum-keyed
shuffle joins). The one class a plan-text audit cannot see is the hot KEY:
a pair-producing shuffle whose key multiplicity d contributes d² join rows
on ONE reducer — posting lists (boilerplate shingles), LSH band buckets,
SimHash bands, grid cells. This tool measures the realized key-multiplicity
distribution of every pair-producing shuffle key in the engine at a given
scale and asserts the documented bound for each.

The bound is phrased scale-robustly, not as a magic constant: for the
quadratic (self-join) probes the gate is the hottest key's FAIR SHARE of
the quadratic work —

    max_cnt² ≤ max(Σ cnt² / FAIR_SHARE_PARTS, SMALL_DATA_FLOOR)

i.e. no single key may own more than 1/32 of the pair-join's total work
(one shuffle partition's share at the session default parallelism), with a
small-data floor so tiny corpora cannot trip it. A corpus that violates it
(every real web corpus does — page footers are hot shingles) must run the
capped path (``max_df`` on jaccard/containment_pairs) or re-block; the
violation is the signal, exactly like a plan_audit hit. The grid-cell probe
has a CONSTRUCTIVE bound instead: auto-sized cells are ≤ target_cell_rows
in expectation, so max cell ≤ HASH_VARIANCE_SLACK × target.

Writes SKEW_AUDIT.json; exits non-zero on any unexplained violation.
Gated by tests/test_skew_audit.py at sf0.01 per round.

Usage: python tools/skew_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

FAIR_SHARE_PARTS = 32  # session parallelism the hot key must not exceed 1/N of
SMALL_DATA_FLOOR = 100_000  # pairs; below this a "hot" key cannot straggle
HASH_VARIANCE_SLACK = 3  # x target_cell_rows: xxhash64 slice-assignment variance


def _postings_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(block, shingle) posting lists feeding the q_ngram_jaccard /
    q_dedup_containment inverted-index self-join (k=3, singleton-pruned —
    the exact rows the registry keys join on)."""
    from etl_pipeline_project_spark.operators.dedup_text import word_shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex = docs.select(
        F.col("source").alias("k1"),
        F.explode(word_shingles(F.col("text"), 3)).alias("k2"),
    )
    return ex.groupBy("k1", "k2").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    )


def _minhash_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, bkey) LSH buckets feeding the q_dedup_minhash_lsh candidate
    self-join (and the streaming neardup path, same seed family)."""
    from etl_pipeline_project_spark.operators.dedup_text import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = minhash_signatures(docs, "doc_id", "text", k=3, num_hashes=64, band_rows=2)
    bands = sig.select(F.explode("bands").alias("bk")).select(
        F.col("bk.band").alias("k1"), F.col("bk.bkey").alias("k2")
    )
    return bands.groupBy("k1", "k2").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    )


def _simhash_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, key16) SimHash bands feeding q_dedup_simhash's candidate
    self-join."""
    from etl_pipeline_project_spark.operators.dedup_text import simhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sig = simhash_signatures(docs, "doc_id", "text")
    bands = sig.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("k1"),
                        F.shiftrightunsigned("simhash64", i * 16)
                        .bitwiseAND(F.lit((1 << 16) - 1))
                        .alias("k2"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk")
    ).select("bk.k1", "bk.k2")
    return bands.groupBy("k1", "k2").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") > 1
    )


def _basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey) basket sizes feeding the co-purchase pair self-joins
    (q_item_similarity, q_assoc_confidence, q_graph_2hop's edge build,
    q_market_basket): a basket of b distinct items emits b² join rows on
    one orderkey."""
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    return (
        li.groupBy(F.col("l_orderkey").alias("k1"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("k2", F.lit(0))
        .filter(F.col("cnt") > 1)
    )


def _graph_2hop_wedges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intermediate-node degrees of the support-pruned co-purchase edge
    list — the join key of q_graph_2hop's wedge join (e1.dst = e2.src):
    a hub of degree d routes ~d² two-hop paths through one key."""
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, c = li.alias("a"), li.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("c.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("c.l_partkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    return (
        e.groupBy(F.col("dst").alias("k1"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("k2", F.lit(0))
        .filter(F.col("cnt") > 1)
    )


def _grid_defaults() -> tuple[int, int]:
    """salted_block_pairs' own default (target_cell_rows, max_splits),
    read from its signature so this probe tracks the operator — a
    literal copy here would silently measure a distribution the engine
    no longer produces if the operator's sizing changed (round-10
    ADVICE)."""
    import inspect

    from etl_pipeline_project_spark.operators.similarity import salted_block_pairs

    sig = inspect.signature(salted_block_pairs)
    return (
        sig.parameters["target_cell_rows"].default,
        sig.parameters["max_splits"].default,
    )


def _salted_grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(block, ga) grid slices produced by salted_block_pairs(splits="auto")
    on embeddings — the q_knn_graph_blocked / q_embed_neardup pair stage.
    Constructive bound: auto sizing targets ≤ target_cell_rows per slice."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    target, max_splits = _grid_defaults()
    counts = emb.groupBy(F.col("label").alias("k1")).agg(F.count(F.lit(1)).alias("_nb"))
    g = F.least(
        F.greatest(F.ceil(F.col("_nb") / F.lit(target)), F.lit(1)), F.lit(max_splits)
    ).cast("int")
    sized = emb.join(
        F.broadcast(counts.select("k1", g.alias("_g"))), emb["label"] == F.col("k1")
    )
    cells = sized.select(
        "k1", F.pmod(F.xxhash64("vec_id"), F.col("_g").cast("bigint")).alias("k2")
    )
    return cells.groupBy("k1", "k2").agg(F.count(F.lit(1)).alias("cnt"))


# probe -> (builder, bound kind, documented rationale)
# "fair_share": max_cnt² ≤ max(Σcnt²/FAIR_SHARE_PARTS, SMALL_DATA_FLOOR)
# "absolute:N": max_cnt ≤ N (constructive bound from the operator itself)
PROBES = {
    "jaccard_containment_postings": (
        _postings_jaccard,
        "fair_share",
        "hot boilerplate shingle ⇒ d² pairs on one (block,shingle) key; "
        "violation ⇒ run the capped path (max_df) — the cap's exactness "
        "trade is documented on q_dedup_containment/q_ngram_jaccard",
    ),
    "minhash_band_buckets": (
        _minhash_band_buckets,
        "fair_share",
        "a band bucket of d docs ⇒ d² candidate pairs; hot buckets mean "
        "the corpus has massive exact-dup clusters — exact-dedup first, "
        "or raise band_rows (lowers collision probability per band)",
    ),
    "simhash_band_buckets": (
        _simhash_band_buckets,
        "fair_share",
        "a 16-bit band key shared by d docs ⇒ d² candidates; hot bands "
        "mean low-entropy documents — lengthen bands or pre-dedup exact",
    ),
    "salted_grid_cells": (
        _salted_grid_cells,
        # resolved at run time to 3 x salted_block_pairs' own
        # target_cell_rows default (HASH_VARIANCE_SLACK covers xxhash64
        # slice-assignment variance) so the gate tracks the operator
        "absolute:3x_target",
        "auto split sizing bounds E[cell] ≤ the operator's "
        "target_cell_rows default; 3x slack covers xxhash64 "
        "slice-assignment variance",
    ),
    "basket_pairs": (
        _basket_pairs,
        "fair_share",
        "a basket of b distinct items ⇒ b² co-purchase pair rows on one "
        "orderkey (item_similarity / assoc_confidence / graph_2hop / "
        "market_basket); violation ⇒ cap basket size before the square — "
        "a thousand-item basket carries ~no pairwise signal (standard "
        "market-basket practice) — or grid-salt the self-join",
    ),
    "graph_2hop_wedges": (
        _graph_2hop_wedges,
        "fair_share",
        "a hub node of pruned degree d routes ~d² two-hop paths through "
        "one wedge-join key; violation ⇒ raise the support floor, cap "
        "hub degree (keep top-w edges per node), or salt the hub's "
        "neighbor list — the output itself is quadratic in d, so the cap "
        "is a semantic choice documented on the key",
    ),
}


def run_probe(spark: SparkSession, sf_dir: str, name: str) -> dict:
    builder, bound, why = PROBES[name]
    t0 = time.perf_counter()
    stats = (
        builder(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.percentile_approx("cnt", 0.99).alias("p99_cnt"),
            F.sum(F.col("cnt").cast("long")).alias("sum_cnt"),
            F.sum((F.col("cnt") * F.col("cnt")).cast("long")).alias("sum_sq"),
        )
        .collect()[0]
        .asDict()
    )
    stats = {k: (int(v) if v is not None else 0) for k, v in stats.items()}
    stats["sec"] = round(time.perf_counter() - t0, 2)
    stats["bound"] = bound
    stats["why"] = why
    if bound == "fair_share":
        limit = max(stats["sum_sq"] // FAIR_SHARE_PARTS, SMALL_DATA_FLOOR)
        stats["hot_key_pairs"] = stats["max_cnt"] ** 2
        stats["limit_pairs"] = limit
        stats["ok"] = stats["hot_key_pairs"] <= limit
    else:
        spec = bound.split(":")[1]
        if spec == "3x_target":
            limit = HASH_VARIANCE_SLACK * _grid_defaults()[0]
        else:
            limit = int(spec)
        stats["limit_max_cnt"] = limit
        stats["ok"] = stats["max_cnt"] <= limit
    return stats


def main() -> int:
    from etl_pipeline_project_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew_audit")
    results = {}
    failures = []
    for name in PROBES:
        rec = run_probe(spark, sf_dir, name)
        results[name] = rec
        tag = "PASS " if rec["ok"] else "FAIL "
        print(
            f"{tag} {name}: max_cnt={rec['max_cnt']} p99={rec['p99_cnt']} "
            f"keys={rec['n_keys']} sum_sq={rec['sum_sq']} ({rec['sec']}s)",
            flush=True,
        )
        if not rec["ok"]:
            failures.append(name)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SKEW_AUDIT.json")
    with open(out, "w") as fh:
        json.dump(
            {
                "__meta__": {
                    "sf_dir": sf_dir,
                    "fair_share_parts": FAIR_SHARE_PARTS,
                    "small_data_floor": SMALL_DATA_FLOOR,
                    "failures": failures,
                },
                **results,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {out}; {len(failures)} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
