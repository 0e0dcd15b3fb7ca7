"""Misc scalar expressions: coalesce-merge, casts, conditionals, list-join.

Reference behaviors re-expressed (all Catalyst built-ins, no UDFs):

- Detail-vs-search field merge (`data/extraction.py:139-148`:
  ``details.get(x) or search.get(x)``) → SQL ``coalesce``. Note the
  divergence documented in SURVEY §2.F: Python ``or`` also falls through
  on ``""``/``0``; the engine uses true null-only coalesce.
- List → delimited string (`data/extraction.py:59,66,144`:
  ``" | ".join(...)``, ``", ".join(...)``) → ``array_join``.
- Casts (`manual_tools/manual_finance_uploader.py:90,103` str→int;
  `data/extraction.py:97,102` id→str) → ``.cast``. Engine semantics for
  double→long is truncation toward zero (Spark's cast), matched by
  ``TRUNC`` on the oracle side.
- Null-safe conditionals (`data/extraction.py:100,103,104`:
  ``x.isoformat() if x else None``) → ``when/otherwise``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coalesce_first(*cols: Column | str) -> Column:
    """First non-null across sources (`data/extraction.py:141,144-146`)."""
    return F.coalesce(*[F.col(c) if isinstance(c, str) else c for c in cols])


def or_fallback(*cols: Column | str) -> Column:
    """The reference's *literal* Python ``or`` semantics: fall through on
    null AND on empty string / zero. Provided for byte-faithful replays;
    pipelines default to `coalesce_first`."""
    cols_ = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = cols_[-1]
    for col in reversed(cols_[:-1]):
        falsy = col.isNull() | (col.cast("string") == "")
        out = F.when(falsy, out).otherwise(col)
    return out


def array_join_col(col: Column | str, sep: str = ", ") -> Column:
    """List→string collapse (`data/extraction.py:59,66,144`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(c, sep)
