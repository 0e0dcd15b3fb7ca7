"""Table sinks.

Reference behaviors re-expressed:

- Full-refresh mart load (`data/transformation_dw.py:154-156` and 10 more
  ``WRITE_TRUNCATE`` load jobs; SURVEY §1.4 Q8) → ``mode("overwrite")`` —
  idempotent by construction.
- Append-only operational load after the incremental anti-join
  (`data/transformation_db.py:116`: ``to_sql(if_exists='append')``) →
  ``mode("append")``.
- Timestamped CSV staging upload with a skip-if-empty guard
  (`data/utils.py:6-26`) → partitioned CSV write; the filename-timestamp
  convention becomes real partition columns, which is what makes partition
  pruning possible at 100 TB. The empty guard is unnecessary under lazy
  eval (an empty write is a no-op), so it is not reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_overwrite(df: DataFrame, path: str, *, fmt: str = "parquet", partition_by: list[str] | None = None) -> None:
    """Idempotent full-refresh sink (reference WRITE_TRUNCATE semantics)."""
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_append(df: DataFrame, path: str, *, fmt: str = "parquet", partition_by: list[str] | None = None) -> None:
    """Append sink — pair with ``operators.joins.anti_incremental`` so only
    never-seen keys are appended (the reference's load_data_if_new,
    `data/transformation_db.py:91-121`)."""
    writer = df.write.mode("append").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """CSV staging sink (reference `data/utils.py:6-26`). Partition columns
    replace the reference's in-filename timestamps."""
    writer = df.write.mode(mode).option("header", "true").format("csv")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact_parquet(
    spark,
    source_path: str,
    target_path: str,
    *,
    target_partitions: int | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Small-file compaction: rewrite a fragmented parquet prefix into
    size-targeted files. One distributed read → ``repartition`` (a single
    round-robin shuffle, the only way to *merge* undersized splits —
    ``coalesce`` would also narrow the read parallelism) → write with
    ``maxRecordsPerFile`` as the upper bound so no output file overshoots.

    At scale, run per partition-directory with ``target_partitions ≈
    bytes/128MB``; the op is idempotent (overwrite) and safe to re-run
    after every streaming ingest window."""
    df = spark.read.parquet(source_path)
    if target_partitions is not None:
        df = df.repartition(target_partitions)
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(target_path)
    )


def merge_upsert(spark, target_path: str, changes: DataFrame, key: str) -> None:
    """Batch MERGE (upsert) into a parquet target: rows whose key appears
    in ``changes`` are replaced by the change row, unmatched target rows
    are kept, never-seen keys are inserted — the UPDATE+INSERT half of
    SQL MERGE, expressed as anti-join ∪ changes (Spark has no in-place
    update; a lakehouse rewrite is the physical form of MERGE anyway).

    At 100 TB the full-table rewrite is wrong: partition the target (by
    day/bucket), derive the touched partitions from ``changes``' keys,
    and rewrite only those via dynamic partition overwrite
    (``spark.sql.sources.partitionOverwriteMode=dynamic``) — the plan
    here is unchanged, only the write scope narrows."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from etl_pipeline_project_spark.operators.joins import anti_incremental
    from etl_pipeline_project_spark.operators.setops import union_all

    changes = changes.dropDuplicates([key])
    try:
        existing = spark.read.parquet(target_path)
    except AnalysisException:
        merged = changes
    else:
        kept = anti_incremental(existing, changes, key)
        merged = union_all(kept, changes.select(*existing.columns))
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(target_path)
