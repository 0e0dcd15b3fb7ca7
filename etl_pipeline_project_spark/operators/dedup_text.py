"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

North-star extension block for training-data pipelines. The scale story:

- **Exact** dedup is a hash-groupBy on a sha-256 fingerprint — one shuffle
  on an evenly distributed key; works unchanged at 100 TB.
- **n-gram Jaccard** is exact pairwise similarity. All-pairs is O(n²) and
  never viable at scale, so candidate pairs are *blocked* (here: by source;
  in production: by LSH band — see MinHash below) and Jaccard is computed
  only within blocks.
- **MinHash+LSH** is the 100 TB near-dup path: shingle → fixed-size MinHash
  signature → band-hash → bucket-join, turning O(n²) into a shuffle on
  band-hash keys. Implemented with spark.ml's MinHashLSH (public Spark API)
  over a HashingTF shingle vector; recall vs exact Jaccard is asserted in
  tests (approximate results have no SQL oracle).
- **SimHash** gives a single 64-bit near-dup key per document (Hamming
  proximity ≈ cosine similarity of token multisets) — computed in one
  Arrow-batched Pandas UDF pass, then duplicate candidates fall out of a
  groupBy on rotated prefixes or a band-join, no pairwise work.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.dedup import dedup_keyed
from etl_pipeline_project_spark.operators.text_analysis import doc_fingerprint


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-copy removal: group by normalized-text sha-256, keep the
    lowest id (deterministic — SURVEY §1.4 Q3 discipline)."""
    with_fp = df.withColumn("fingerprint", doc_fingerprint(text_col))
    return dedup_keyed(with_fp, "fingerprint", tiebreak=[id_col])


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles. Single-space split to stay expression-
    identical with the DuckDB oracle's string_split."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(c, " ")
    n = F.size(words)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return F.array_distinct(F.when(n >= k, make).otherwise(F.array().cast("array<string>")))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    *,
    k: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard over blocked candidate pairs.

    Pairs are generated only within ``block_col`` groups (the all-pairs
    join is O(n²) — blocking is what makes this an operator instead of an
    accident). Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col), F.col(block_col).alias("block"), word_shingles(text_col, k).alias("shingles")
    )
    # Inverted-index plan: explode shingles and count co-occurrences per
    # pair instead of intersecting shingle arrays for every block pair.
    # Only pairs sharing ≥1 shingle are ever materialized (any pair with
    # jaccard ≥ threshold shares one), and the work is a shuffle on
    # (block, shingle) — the shape that survives a 100 TB corpus, vs. the
    # O(pairs × |shingles|) array-intersect version.
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("sz"))
    ex = sh.select(F.col(id_col), "block", F.explode("shingles").alias("tok"))
    a = ex.select(F.col(id_col).alias("id_a"), "block", "tok")
    b = ex.select(F.col(id_col).alias("id_b"), "block", "tok")
    inter = (
        a.join(b, ["block", "tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    union = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    jac = F.col("n_inter").cast("double") / F.greatest(union, F.lit(1)).cast("double")
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 3,
    num_hash_tables: int = 5,
    jaccard_distance_threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs via MinHash+LSH (the 100 TB path).

    shingle → HashingTF sparse vector → MinHashLSH signature → band-bucket
    join (`approxSimilarityJoin` shuffles on band hashes, never all-pairs).
    Output: (id_a, id_b, jaccard_distance), id_a < id_b. Approximate ⇒ no
    SQL oracle; recall against `jaccard_pairs` is asserted in tests.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = df.select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, k).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    vecs = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, jaccard_distance_threshold, distCol="jaccard_distance"
    )
    return (
        joined.select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


_SIMHASH_BITS = 64


def _simhash_one(text: str) -> int:
    """64-bit SimHash over whitespace tokens with md5 token hashes.
    Deterministic across runs/machines (md5, no PYTHONHASHSEED). Bit
    unpacking is vectorized in numpy — the per-token × per-bit Python loop
    was the hot spot of the whole documents pass."""
    import numpy as np

    toks = text.split()
    if not toks:
        return 0
    hashes = np.frombuffer(
        b"".join(hashlib.md5(t.encode("utf-8")).digest()[:8] for t in toks), dtype=">u8"
    )
    bits = (hashes[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
    weights = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = int(((weights > 0).astype(np.uint64) << np.arange(_SIMHASH_BITS, dtype=np.uint64)).sum())
    # surface as signed int64 for Spark LongType
    return out - (1 << 64) if out >= (1 << 63) else out


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:  # noqa: D103 — see _simhash_one
    return texts.map(lambda t: _simhash_one(t or ""))


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash64) per document — one Arrow-batched UDF pass; near-dup
    candidates are then a band-join on signature prefixes (no pairwise
    scan)."""
    return df.select(F.col(id_col), simhash_udf(F.col(text_col)).alias("simhash64"))


def simhash_candidates(df: DataFrame, id_col: str, text_col: str, *, band_bits: int = 16) -> DataFrame:
    """Near-dup candidate pairs: documents sharing any of the four 16-bit
    SimHash bands (standard 64-bit simhash blocking: Hamming distance ≤ 3
    guarantees one shared band)."""
    sig = simhash_signatures(df, id_col, text_col)
    bands = sig.select(
        id_col,
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash64", i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for i in range(_SIMHASH_BITS // band_bits)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash64", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash64").alias("sh_a"), "band", "key"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash64").alias("sh_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
    )
