"""Keyed dedup and distinct — the reference's signature operator (9 uses).

Reference: ``drop_duplicates(subset=[key])`` before every staging/dim load
(`data/transformation_db.py:97`; `data/transformation_dw.py:178,192,203,
214,226,238`) — pandas "keep first" in file-concat order. Distributed Spark
has no stable "first" (SURVEY §1.4 Q3), so the engine's canonical form is
deterministic: ``row_number`` over a declared tie-break ordering. The cheap
nondeterministic form (`dropDuplicates`) is available when the caller
explicitly doesn't care which row survives.

Scale notes: the window form shuffles once on the key — the same exchange
``dropDuplicates`` needs — so determinism costs only the per-partition sort.
AQE handles skewed keys. No driver-side state at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keyed(
    df: DataFrame,
    keys: list[str] | str,
    tiebreak: list[Column | str] | None = None,
) -> DataFrame:
    """One surviving row per key.

    ``tiebreak`` declares which row "first" means (e.g. lowest line number,
    newest timestamp). With no tiebreak this degrades to ``dropDuplicates``
    — fine for semantics, not for hash-stable comparisons.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not tiebreak:
        return df.dropDuplicates(keys)
    order = [F.col(c) if isinstance(c, str) else c for c in tiebreak]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct non-null scalar set (`data/transformation_dw.py:144`:
    ``all_timestamps.dropna().unique()``). Partial (map-side) distinct runs
    before the exchange, so the shuffle carries only unique values."""
    return df.select(col).na.drop().distinct()
