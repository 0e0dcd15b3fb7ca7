"""Streaming near-duplicate detection: incremental MinHash-LSH.

The reference's incremental-load pattern (`data/transformation_db.py:
91-121` — "load only keys the target hasn't seen") applied to the
LLM-dedup tier: documents arrive as file-source micro-batches, and each
batch is deduplicated against the FULL history through a persistent
signature store, never a rescan of the corpus.

Per micro-batch (``merge_neardup_batch``):

1. **exactly-once gate** — batch docs anti-join the signature store on
   doc_id; re-delivered docs (epoch retry, duplicate files) contribute
   nothing, which is what makes the whole pipeline idempotent.
2. genuinely-new docs get MinHash signatures + LSH band keys
   (`operators.dedup_text.minhash_signatures` — the SAME seeded hash
   family as the batch path, so signatures from different batches
   band-join against each other correctly).
3. **candidates = new × (store ∪ new)** on (band, bkey) — each incoming
   document is compared only against band-bucket collisions, never the
   whole corpus; the batch-vs-history work is proportional to the batch,
   not the history.
4. candidates are exactly verified against stored shingle sets and the
   surviving pairs append to a pair store.
5. the new signatures append to the signature store LAST; a crash between
   4 and 5 re-emits the same pairs on retry, which the final
   ``dropDuplicates`` projection absorbs — end-state idempotence without
   a transaction (a Delta/Iceberg deployment gets atomicity for free via
   MERGE; the parquet-append emulation mirrors streaming/upsert.py).

State story at 100 TB: Spark's own streaming state is EMPTY — no
stateful operator runs inside the stream; the dedup memory lives in the
signature store (grows with the corpus, as any dedup-against-history
must, but per-batch cost is O(batch × collisions)). The union over
batches of emitted pairs equals the batch `minhash_lsh_pairs` output on
the full corpus exactly — a pair (a, b) is found when its later member
arrives — which is what gives the streaming key a full SQL oracle.
"""

from __future__ import annotations

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_project_spark.operators.dedup_text import (
    minhash_signatures,
    verify_pairs_exact,
)


def _explode_bands(sigs: DataFrame) -> DataFrame:
    return sigs.select("doc_id", F.explode("bands").alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def merge_neardup_batch(
    batch: DataFrame,
    sig_store: str,
    pair_store: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_distance_threshold: float = 0.4,
    k: int = 3,
    num_hashes: int = 64,
    band_rows: int = 2,
) -> None:
    """Merge one micro-batch of documents into the near-dup state (see
    module docstring for the step-by-step contract)."""
    spark = batch.sparkSession
    new = batch.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).dropDuplicates(["doc_id"])
    try:
        store = spark.read.parquet(sig_store)
    except AnalysisException:
        store = None
    if store is not None:
        new = new.join(store.select("doc_id"), "doc_id", "left_anti")

    new_sigs = minhash_signatures(
        new, "doc_id", "text", k=k, num_hashes=num_hashes, band_rows=band_rows
    ).localCheckpoint(eager=True)
    if new_sigs.isEmpty():
        return
    all_sigs = new_sigs if store is None else store.unionByName(new_sigs)
    all_sigs = all_sigs.localCheckpoint(eager=True)

    nb = _explode_bands(new_sigs).withColumnRenamed("doc_id", "n_id")
    ab = _explode_bands(all_sigs).withColumnRenamed("doc_id", "o_id")
    cand = (
        nb.join(ab, ["band", "bkey"])
        .filter(F.col("n_id") != F.col("o_id"))
        .select(
            F.least("n_id", "o_id").alias("id_a"),
            F.greatest("n_id", "o_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    fresh = verify_pairs_exact(cand, all_sigs, jaccard_distance_threshold)
    # pairs first, signatures last (see module docstring for the crash
    # analysis); both are plain appends — the scalable store shape
    fresh.write.mode("append").parquet(pair_store)
    new_sigs.write.mode("append").parquet(sig_store)


def foreach_batch_neardup(sig_store: str, pair_store: str, **kwargs):
    """Adapter for ``writeStream.foreachBatch``."""

    def apply(batch: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        merge_neardup_batch(batch, sig_store, pair_store, **kwargs)

    return apply


def neardup_pairs_state(spark, pair_store: str) -> DataFrame:
    """The accumulated near-dup pair set: (id_a, id_b, jaccard_distance),
    deduplicated — equals the batch MinHash-LSH output on everything that
    has arrived (identical values: epoch-retry re-emissions are exact
    duplicates, so the projection is deterministic)."""
    return spark.read.parquet(pair_store).dropDuplicates(["id_a", "id_b"])
