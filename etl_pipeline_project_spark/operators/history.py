"""Change-history operators: SCD Type-2 versioning and CDC log collapse.

The reference pipeline reloads dimensions wholesale on every run
(`data/transformation_dw.py:122-334` rebuilds each dim from scratch), so
historical attribute values are lost. These operators supply the two
standard remedies a warehouse actually deploys:

- ``scd2_versions``: turn an append-only change feed into Type-2 slowly
  changing dimension rows (effective_from / effective_to / is_current),
  one window pass per key — a single shuffle on the entity key, no
  self-join, no iteration. At 100 TB the shuffle is on the dimension's
  natural key (high cardinality, even), and each partition's window is
  processed streaming-sorted — no memory blowup on wide histories.
- ``cdc_latest``: collapse a CDC changelog (insert/update/delete ops)
  into current state: latest record per key wins, deletes drop the key.
  Same single-shuffle shape (row_number over the key, keep rank 1) —
  the standard "compaction" step before serving a snapshot.

Both require a TOTAL ordering within each key (a timestamp plus a
monotonic id tie-break) so the result is deterministic under any
partitioning — the cross-engine oracle depends on it (SURVEY §1.4 Q3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    changes: DataFrame,
    key: str,
    order_by: Sequence[str],
    attrs: Sequence[str],
) -> DataFrame:
    """Type-2 history: one output row per change record, carrying
    ``version`` (1-based per key), ``effective_from`` (the change's own
    order head), ``effective_to`` (next change's head, null = open), and
    ``is_current``. ``order_by`` must totally order rows within a key."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order_by])
    head = F.col(order_by[0])
    return changes.select(
        key,
        *attrs,
        F.row_number().over(w).alias("version"),
        head.alias("effective_from"),
        F.lead(head).over(w).alias("effective_to"),
        F.lead(head).over(w).isNull().alias("is_current"),
    )


def cdc_latest(
    log: DataFrame,
    key: str,
    order_by: Sequence[str],
    op_col: Column,
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a changelog to current state: the latest record per key
    (by ``order_by`` descending) survives unless its op is a delete.
    ``op_col`` is evaluated against ``log``'s columns."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        log.withColumn("_op", op_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") != delete_op))
        .drop("_rn")
        .withColumnRenamed("_op", "op")
    )
