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


def dot_product(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Exact double dot product of two float-array columns (element-wise
    double cast, sequential accumulation).

    ``dim`` is the pair-scoring hot-path lever: higher-order functions
    (``zip_with``/``aggregate``) are CodegenFallback in Spark — every
    element goes through the interpreted expression evaluator, which is
    what dominated the sf1 replay's blocked-pair keys (q_knn_graph_blocked
    300 s: ~40M pairs x 64 dims, each a lambda dispatch). When the vector
    width is a schema contract (embeddings are fixed dim-64 here; any real
    embedding column has one width), passing it unrolls the dot product
    into a flat ``get``/multiply/add expression tree that whole-stage
    codegen compiles — same left-associated accumulation from the same
    0.0 seed, so the result is IEEE-bit-identical to the fold. A
    ``size``-guard keeps the fold as the fallback branch, so rows whose
    arrays are not exactly ``dim`` wide (NULLs, ragged data) keep the
    fold's semantics verbatim; CaseWhen evaluates branches lazily, so the
    fallback costs nothing on contract-conforming rows.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    fold = F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if dim is None:
        return fold
    # Build the unrolled sum as ONE parsed expression when both inputs are
    # plain column names (every caller): the Column-by-Column loop issued
    # ~6 py4j round-trips per dimension (~400 for dim=64), ~0.4 s of pure
    # driver time per call site per run (round 12, guide §1.2 — the plan
    # and the left-associated double accumulation are identical, only the
    # construction path changes).
    if isinstance(a, str) and isinstance(b, str) and a.isidentifier() and b.isidentifier():
        # backticks: isidentifier() is the injection guard, the quoting is
        # for SQL reserved words that pass it (a column named 'order'/'end')
        unrolled = F.expr(
            "CAST(0.0 AS DOUBLE) + "
            + " + ".join(
                f"CAST(get(`{a}`, {i}) AS DOUBLE) * CAST(get(`{b}`, {i}) AS DOUBLE)"
                for i in range(dim)
            )
        )
    else:
        unrolled = F.lit(0.0)
        for i in range(dim):
            unrolled = unrolled + F.get(ca, i).cast("double") * F.get(cb, i).cast("double")
    return F.when((F.size(ca) == dim) & (F.size(cb) == dim), unrolled).otherwise(fold)


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    c = F.col(a) if isinstance(a, str) else a
    fold = F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    if dim is None:
        return fold
    if isinstance(a, str) and a.isidentifier():
        # one parsed expression instead of ~4 py4j calls per dim — see
        # dot_product; same tree, same accumulation order
        unrolled = F.expr(
            "CAST(0.0 AS DOUBLE) + "
            + " + ".join(
                f"CAST(get(`{a}`, {i}) AS DOUBLE) * CAST(get(`{a}`, {i}) AS DOUBLE)"
                for i in range(dim)
            )
        )
    else:
        unrolled = F.lit(0.0)
        for i in range(dim):
            x = F.get(c, i).cast("double")
            unrolled = unrolled + x * x
    return F.when(F.size(c) == dim, F.sqrt(unrolled)).otherwise(fold)


def cosine_sim(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    return dot_product(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def ann_bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "dot",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    The query side is broadcast (small by contract); the corpus is scanned
    map-side — no corpus shuffle at any corpus size. Output:
    (qid, nid, score, rank), ties broken by neighbor id.
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    score = (
        dot_product("qvec", "nvec", dim)
        if metric == "dot"
        else cosine_sim("qvec", "nvec", dim)
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", score.alias("score"))
    )
    return topk_per_group(
        scored, "qid", [F.col("score").desc(), F.col("nid")], k, rank_col="rank"
    ).select("qid", "nid", "score", "rank")


def salted_block_pairs(
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    block_col: str,
    splits: int | str = 8,
    ordered: bool = True,
    target_cell_rows: int = 256,
    max_splits: int = 1024,
) -> DataFrame:
    """Enumerate within-block vector pairs with salted parallelism.

    A plain self-join on the block column hash-partitions on the block
    key, so a corpus with B coarse blocks runs its pair enumeration on at
    most B tasks — with B=10 IVF-style labels, 10 reducers own ALL the
    O(Σ n_b²) work no matter how many executors exist (the join-side
    sibling of the enum-partitioned-window scale-killer; measured: the
    sf1 replay's q_knn_graph_blocked pinned ~10 of 32 cores). This
    operator sub-chunks each block into G deterministic slices
    (``pmod`` on the id — no RNG) and joins on the (block, ga, gb) grid
    cell instead: each side is replicated G× (vectors only — the
    replication cost is O(pairs / target_cell_rows), i.e. proportional
    to the quadratic work the caller asked for, never more), the pair
    SET is exactly the plain join's, and parallelism becomes Σ G_b²
    cells, with O((n_b/G_b)²) pairs per cell.

    ``splits`` is a fixed integer, or ``"auto"``: size G PER BLOCK as
    ``clamp(ceil(n_b / target_cell_rows), 1, max_splits)`` from one
    cheap count aggregate (one row per block, broadcast back). Auto is
    the skew-safe production path — with a fixed G, one hot block of
    10⁸ rows still yields (10⁸/G)²-pair straggler cells while
    thousands of small blocks pay G× replication for nothing; per-block
    sizing bounds every cell at ~target_cell_rows² pairs so a
    1000-executor stage has no stragglers. A block that would need more
    than ``max_splits`` slices (n_b > target·max_splits) is beyond
    exact pair enumeration at any parallelism — route such corpora
    through the ANN tier (``ann_ivf_topk``/``ann_lsh_topk``) instead.
    Rows whose block column is NULL never pair (in auto mode the inner
    broadcast join with the per-block counts drops them; in fixed mode
    the NULL-rejecting equi-join condition does) — identical to the
    plain block equi-join this operator replaces, where NULL = NULL is
    not a match.

    Output columns: ``id_a``, ``id_b``, ``va``, ``vb``, ``block`` —
    ordered pairs (``id_a`` < ``id_b``) when ``ordered``, else all
    directed pairs (``id_a`` != ``id_b``).
    """
    if splits == "auto":
        counts = df.groupBy(F.col(block_col).alias("_cb")).agg(
            F.count(F.lit(1)).alias("_nb")
        )
        g_col = F.least(
            F.greatest(F.ceil(F.col("_nb") / F.lit(target_cell_rows)), F.lit(1)),
            F.lit(max_splits),
        ).cast("int")
        sized = df.join(
            F.broadcast(counts.select("_cb", g_col.alias("_g"))),
            df[block_col] == F.col("_cb"),
        ).drop("_cb")
    else:
        sized = df.withColumn("_g", F.lit(int(splits)))
    g_of = lambda c: F.pmod(F.xxhash64(c), F.col("_g").cast("bigint"))  # noqa: E731
    # bigint salt to match g_of's type: Murmur3 hashes int and long
    # differently, so an int salt column would make the explicit
    # repartition's distribution unusable for the bigint-keyed join and
    # Spark would insert a second redundant exchange on both sides.
    salt = F.explode(
        F.sequence(F.lit(0).cast("bigint"), (F.col("_g") - 1).cast("bigint"))
    )
    a = sized.select(
        F.col(id_col).alias("id_a"),
        F.col(block_col).alias("block"),
        F.col(vec_col).alias("va"),
        g_of(F.col(id_col)).alias("_ga"),
        salt.alias("_gb"),
    )
    b = sized.select(
        F.col(id_col).alias("id_b"),
        F.col(block_col).alias("_block_b"),
        F.col(vec_col).alias("vb"),
        salt.alias("_ga_b"),
        g_of(F.col(id_col)).alias("_gb_b"),
    )
    cond = F.col("id_a") < F.col("id_b") if ordered else F.col("id_a") != F.col("id_b")
    # Distribute grid cells explicitly: the quadratic work is O(pairs)
    # while the INPUT is O(rows) — a 10 MB embedding file arrives as one
    # scan split, so without this shuffle a broadcast join would run all
    # Σ n_b² scoring on one task no matter how well the cells are salted
    # (file-split parallelism tracks bytes, not downstream work). BOTH
    # sides are repartitioned because a broadcast join's output inherits
    # the STREAMED side's partitioning and the planner may build either
    # side — the linear extra shuffle is the price of making the
    # quadratic stage's parallelism independent of that choice.
    sess = df.sparkSession
    try:
        nparts = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        # AQE-managed platforms set the conf to the string "auto"
        nparts = sess.sparkContext.defaultParallelism
    a = a.repartition(nparts, "block", "_ga", "_gb")
    b = b.repartition(nparts, "_block_b", "_ga_b", "_gb_b")
    return (
        a.join(
            b,
            (F.col("block") == F.col("_block_b"))
            & (F.col("_ga") == F.col("_ga_b"))
            & (F.col("_gb") == F.col("_gb_b")),
        )
        .filter(cond)
        .select("id_a", "id_b", "va", "vb", "block")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    top_n: int = 20,
    dim: int | None = None,
    splits: int | str = 8,
) -> DataFrame:
    """Most-similar vector pairs within coarse blocks (IVF-style): exact
    dot product on blocked pairs, global top-n by similarity. Output:
    (id_a, id_b, score) with id_a < id_b, deterministic tie-breaks.
    Pair enumeration is salted (``salted_block_pairs``) so a small block
    count cannot serialize the quadratic work onto a handful of tasks."""
    pairs = salted_block_pairs(
        df, id_col=id_col, vec_col=vec_col, block_col=block_col, splits=splits
    ).select("id_a", "id_b", dot_product("va", "vb", dim).alias("score"))
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
    dim: int | None = None,
    max_iter: int = 20,
    init_mode: str = "k-means||",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer →
    per-cluster inverted lists → probe the ``nprobe`` nearest cells per
    query. The 100 TB recipe: the corpus is scanned once to assign cells
    (then persisted partitioned by cell in production), and each query
    touches ~nprobe/nlist of the corpus instead of all of it. Exact within
    probed cells; recall is the only approximation (tested on clustered
    data; near-uniform corpora defeat any cell-based index).

    ``max_iter`` / ``init_mode`` expose the quantizer's training budget:
    centroid quality moves RECALL only, never correctness of the probed
    scores. A probe-complete caller (nprobe = nlist — every cell probed,
    result exact by construction, e.g. q_ann_ivf's oracle configuration)
    is invariant to clustering, so it should spend ~nothing here
    (round 12, guide §1.2: k-means|| init alone is ~5 driver-blocking
    jobs, each default-20-iteration step several more).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    model = KMeans(
        k=nlist,
        seed=seed,
        featuresCol="features",
        predictionCol="cid",
        maxIter=max_iter,
        initMode=init_mode,
    ).fit(c)
    inverted = model.transform(c).select("nid", "nvec", "cid")

    cents = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cid int, centroid array<double>",
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    probed = topk_per_group(
        q.crossJoin(F.broadcast(cents)).select(
            "qid", "qvec", "cid", dot_product("qvec", "centroid", dim).alias("cdot")
        ),
        "qid",
        [F.col("cdot").desc(), F.col("cid")],
        nprobe,
        rank_col="probe_rank",
    ).select("qid", "qvec", "cid")

    cand = probed.join(inverted, "cid").filter(F.col("qid") != F.col("nid"))
    scored = cand.select("qid", "nid", dot_product("qvec", "nvec", dim).alias("score"))
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
