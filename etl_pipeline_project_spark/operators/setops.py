"""Set operations.

Reference behaviors re-expressed:

- UNION ALL of homogeneous frames: per-file concat (`data/utils.py:44`),
  the pemasukan+pengeluaran project union (`data/transformation_dw.py:
  223-226`), the four-table timestamp union (`:136-143`) → ``unionByName``,
  which is name-resolved (the reference's concat aligns on column labels,
  not positions, so positional ``union`` would be wrong).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_all(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    """UNION ALL by column name."""
    if not dfs:
        raise ValueError("union_all needs at least one DataFrame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs)


def union_single_column(frames_and_cols: list[tuple[DataFrame, str]], out_name: str) -> DataFrame:
    """The dim_waktu input pattern (`data/transformation_dw.py:136-143`):
    pull one column from each of several tables into a single unioned
    column. Each side projects before the union, so only that column moves.
    """
    parts = [df.select(F.col(c).alias(out_name)) for df, c in frames_and_cols]
    return union_all(*parts)
