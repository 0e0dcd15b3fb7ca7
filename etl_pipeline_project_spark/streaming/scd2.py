"""Streaming SCD2 maintenance: versioned-dimension upkeep in foreachBatch.

The warehouse twin of streaming/neardup.py's incremental pattern: change
events arrive as file-source micro-batches and maintain a Type-2
slowly-changing dimension (one row per (key, attribute-run) with
``[valid_from, valid_to)`` validity) in a persistent store.

Design — *re-derive per affected key from change points*:

1. the store holds only CHANGE POINTS (key, attr, valid_from, change id),
   which is exactly the collapsed representation SCD2 is; raw events never
   persist.
2. per micro-batch: affected keys = keys present in the batch; their
   stored change points union the batch's raw events, the run-collapse
   (attr != lag(attr) over (ts, id)) re-derives the version chain, and
   ``valid_to = lead(valid_from)`` closes intervals. Unaffected keys'
   rows pass through untouched.
3. idempotent by construction: re-delivered events collapse into the runs
   they already created, so a retry (or a duplicate file) changes nothing.

Ordering contract: batches must arrive in event-time order per key (the
staging splits waves on a ts cut). An event arriving BEHIND an already-
collapsed run cannot be replayed from change points alone — a late-data
deployment keeps raw events inside the watermark horizon and re-derives
from those (same collapse, bigger state); the contract here is the
no-late-data half, matching the reference's ordered daily loads.

At 100 TB: state is one row per version (not per event), the per-batch
work is proportional to batch keys (left-semi/anti split of the store),
and the store rewrite becomes a keyed MERGE on a Delta/Iceberg table —
the DataFrame logic is unchanged.
"""

from __future__ import annotations

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_scd2_batch(
    batch: DataFrame,
    store_path: str,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    attr: str = "event_type",
    id_col: str = "event_id",
) -> None:
    """Fold one micro-batch of change events into the SCD2 store."""
    spark = batch.sparkSession
    b = batch.select(key, ts_col, attr, id_col).dropDuplicates([id_col])
    try:
        store = spark.read.parquet(store_path)
    except AnalysisException:
        store = None

    if store is not None:
        affected = b.select(key).distinct()
        touched = store.join(affected, key, "left_semi").select(
            F.col(key),
            F.col("valid_from").alias(ts_col),
            F.col(attr),
            F.col(id_col),
        )
        keep = store.join(affected, key, "left_anti")
        merged = touched.unionByName(b)
    else:
        keep, merged = None, b

    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    runs = merged.withColumn("__prev", F.lag(attr).over(w))
    ch = runs.filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col(attr))
    ).drop("__prev")
    v = ch.select(
        F.col(key),
        F.col(attr),
        F.col(ts_col).alias("valid_from"),
        F.col(id_col),
    ).withColumn(
        "valid_to",
        F.lead("valid_from").over(
            Window.partitionBy(key).orderBy("valid_from", id_col)
        ),
    )
    new_store = v if keep is None else keep.unionByName(v.select(*keep.columns))
    # materialize before overwriting the path the plan reads from
    new_store.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        store_path
    )


def foreach_batch_scd2(store_path: str, **kwargs):
    """Adapter for ``writeStream.foreachBatch``."""

    def apply(batch: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        merge_scd2_batch(batch, store_path, **kwargs)

    return apply


def scd2_state(
    spark,
    store_path: str,
    *,
    key: str = "user_id",
    attr: str = "event_type",
) -> DataFrame:
    """The maintained dimension: one row per version with an is_current
    flag (open interval). ``key``/``attr`` mirror the kwargs of
    ``merge_scd2_batch`` so a store built with non-default column names
    reads back through the same accessor."""
    s = spark.read.parquet(store_path)
    return s.select(
        key,
        attr,
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
