"""E2 — staged files → operational tables (`data/transformation_db.py:91-162`).

The reference's ``load_data_if_new`` chain per table: keyed dedup (:97) →
rename (:100-101) → tolerant projection (:104-105) → existing-keys scan
(:109) → anti-join (:113) → append (:116). Here it is one lazy lineage —
the whole chain pipelines into a single stage plus the anti-join exchange
(broadcast when the existing-key set is small, shuffled hash otherwise;
never driver memory — SURVEY §1.4 Q7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from etl_pipeline_project_spark.operators.dedup import dedup_keyed
from etl_pipeline_project_spark.operators.joins import anti_incremental
from etl_pipeline_project_spark.operators.relational import rename_columns, select_existing


def load_operational(
    staged: DataFrame,
    existing: DataFrame | None,
    *,
    key: str,
    tiebreak: list[Column | str],
    rename: dict[str, str] | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """New-rows-only load: the rows to append to the operational table.

    ``tiebreak`` declares which duplicate survives (the reference's
    keep-first is concat-order-dependent; SURVEY §1.4 Q3).
    """
    df = dedup_keyed(staged, key, tiebreak=tiebreak)
    if rename:
        df = rename_columns(df, rename)
    if columns:
        df = select_existing(df, columns)
    if existing is not None:
        df = anti_incremental(df, existing, key)
    return df
