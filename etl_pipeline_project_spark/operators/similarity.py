"""Embedding similarity search: brute-force top-k and LSH/IVF scale paths.

North-star extension block. Three tiers, by scale:

1. **Brute-force top-k** (`ann_bruteforce_topk`): broadcast the (small)
   query set, stream the corpus through a map-side dot product, window
   top-k. Exact; corpus never shuffles. The dot product is a built-in
   ``zip_with``/``aggregate`` expression pair — JVM-side, no Python — and
   accumulates left-to-right in double, which DuckDB's
   ``list_sum(list_transform(list_zip(...)))`` reproduces bit-identically
   (verified), so this operator is fully oracle-checked.
2. **Blocked/IVF near-dup pairs** (`cosine_neardup_pairs`): all-pairs
   cosine restricted to coarse partitions (here the ``label`` column plays
   the IVF cluster-id role; production would assign nearest-centroid ids).
   O(n²/partitions) instead of O(n²).
3. **Random-projection LSH** (`ann_lsh_topk`): spark.ml
   BucketedRandomProjectionLSH — sub-linear candidate generation at 100 TB;
   approximate ⇒ recall asserted in tests, no SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.windows import topk_per_group


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Exact double dot product of two float-array columns (element-wise
    double cast, sequential accumulation)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    c = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "dot",
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    The query side is broadcast (small by contract); the corpus is scanned
    map-side — no corpus shuffle at any corpus size. Output:
    (qid, nid, score, rank), ties broken by neighbor id.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    score = dot_product("qvec", "nvec") if metric == "dot" else cosine_sim("qvec", "nvec")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", score.alias("score"))
    )
    return topk_per_group(
        scored, "qid", [F.col("score").desc(), F.col("nid")], k, rank_col="rank"
    ).select("qid", "nid", "score", "rank")


def cosine_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    top_n: int = 20,
) -> DataFrame:
    """Most-similar vector pairs within coarse blocks (IVF-style): exact
    dot product on blocked pairs, global top-n by similarity. Output:
    (id_a, id_b, score) with id_a < id_b, deterministic tie-breaks."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(block_col).alias("block"), F.col(vec_col).alias("va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("block"), F.col(vec_col).alias("vb")
    )
    pairs = (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot_product("va", "vb").alias("score"))
    )
    return pairs.orderBy(F.col("score").desc(), "id_a", "id_b").limit(top_n)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer →
    per-cluster inverted lists → probe the ``nprobe`` nearest cells per
    query. The 100 TB recipe: the corpus is scanned once to assign cells
    (then persisted partitioned by cell in production), and each query
    touches ~nprobe/nlist of the corpus instead of all of it. Exact within
    probed cells; recall is the only approximation (tested on clustered
    data; near-uniform corpora defeat any cell-based index).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(k=nlist, seed=seed, featuresCol="features", predictionCol="cid").fit(c)
    inverted = model.transform(c).select("nid", "nvec", "cid")

    cents = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cid int, centroid array<double>",
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probed = topk_per_group(
        q.crossJoin(F.broadcast(cents)).select(
            "qid", "qvec", "cid", dot_product("qvec", "centroid").alias("cdot")
        ),
        "qid",
        [F.col("cdot").desc(), F.col("cid")],
        nprobe,
        rank_col="probe_rank",
    ).select("qid", "qvec", "cid")

    cand = probed.join(inverted, "cid").filter(F.col("qid") != F.col("nid"))
    scored = cand.select("qid", "nid", dot_product("qvec", "nvec").alias("score"))
    return topk_per_group(
        scored, "qid", [F.col("score").desc(), F.col("nid")], k, rank_col="rank"
    ).select("qid", "nid", "score", "rank")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via random-projection LSH (spark.ml). Unit-norm
    embeddings make euclidean and cosine rankings equivalent
    (d² = 2 − 2·cos). Approximate ⇒ tests assert recall vs brute force."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(F.col(id_col).alias("nid"), array_to_vector(F.col(vec_col)).alias("features"))
    q = queries.select(F.col(id_col).alias("qid"), array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    # 2.0 euclidean threshold = the whole unit sphere; candidates are still
    # bucket-limited, which is the point of LSH
    joined = model.approxSimilarityJoin(q, c, 2.0, distCol="dist")
    cand = joined.select(
        F.col("datasetA.qid").alias("qid"),
        F.col("datasetB.nid").alias("nid"),
        F.col("dist").alias("dist"),
    ).filter(F.col("qid") != F.col("nid"))
    return topk_per_group(
        cand, "qid", [F.col("dist").asc(), F.col("nid")], k, rank_col="rank"
    ).select("qid", "nid", F.round("dist", 6).alias("dist"), "rank")


def centroid_fixed_point(
    embeddings: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group embedding centroid with **order-independent exact
    accumulation**: each component is floored to fixed-point micros
    (``floor(v * scale)`` — IEEE-exact and engine-portable, unlike
    float/decimal rounding), summed as int64, and divided back out in
    one final double op. Distributed float summation is
    order-dependent (per-partition order varies run to run); fixed-point
    int sums are associative/commutative, so a 1000-executor partial
    aggregate is bit-identical to a single-node one — the property the
    cross-engine oracle certifies. One shuffle on (group, dim) after a
    map-side posexplode; partial aggregation halves what moves.

    int64 headroom: |v| ≤ 1 (unit-norm) ⇒ per-row ≤ scale; overflow
    needs > 9.2e12 rows per (group, dim) at scale=1e6 — not reachable
    even at 100 TB per-group cardinalities.

    Returns (group, dim, n_vecs, centroid) with ``dim`` 0-based.
    """
    exploded = embeddings.select(
        F.col(group_col).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    ).select(
        "grp",
        "dim",
        F.floor(F.col("v").cast("double") * scale).cast("long").alias("v_fp"),
    )
    return (
        exploded.groupBy("grp", "dim")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("v_fp").alias("s_fp"))
        .select(
            F.col("grp").alias(group_col),
            "dim",
            "n_vecs",
            (
                F.col("s_fp").cast("double") / F.lit(float(scale)) / F.col("n_vecs").cast("double")
            ).alias("centroid"),
        )
    )
