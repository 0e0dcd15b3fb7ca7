"""Joins: left-enrichment and the incremental anti-join.

Reference behaviors re-expressed:

- Fact⟕dim enrichment (`data/transformation_dw.py:266-271`: tweets merged
  with ``places[['place_id','name']]`` how='left') → broadcast left join.
  Dimension tables are small by construction; broadcasting removes the
  shuffle of the (large) fact side entirely — at 100 TB the fact scan
  streams through map tasks with a hash probe, no exchange.
- Incremental "only new keys" load (`data/transformation_db.py:109-113`:
  pull ALL existing ids into a Python set, filter with ``.isin``) — O(table)
  driver memory, the reference's worst scale hazard (SURVEY §1.4 Q7) → a
  true ``left_anti`` join that never touches the driver. Catalyst/AQE picks
  broadcast when the key side is small, shuffled hash otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def left_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | list[str] | str,
    *,
    dim_cols: list[str] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left join a (small) dimension onto a (large) fact.

    ``dim_cols`` projects the dim before the join — the reference does the
    same manually (`data/transformation_dw.py:267`); under Catalyst the
    projection also prunes the dim scan.
    """
    d = dim.select(*dim_cols) if dim_cols else dim
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, on, "left")


def anti_incremental(staged: DataFrame, existing: DataFrame, key: list[str] | str) -> DataFrame:
    """Keep staged rows whose key is not already loaded
    (`data/transformation_db.py:109-116`, scalably)."""
    keys = [key] if isinstance(key, str) else list(key)
    return staged.join(existing.select(*keys), keys, "left_anti")


def semi_filter(df: DataFrame, other: DataFrame, key: list[str] | str) -> DataFrame:
    """EXISTS-style filter (left_semi) — not reference-mandated, exposed for
    completeness alongside the anti form."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.join(other.select(*keys), keys, "left_semi")
