"""Surrogate-key expressions.

The reference builds review ids by plain string concat
(`data/extraction.py:46`: ``f"{place_id}_{author_url}_{timestamp}"``)
while its docstring promises a hash (`data/extraction.py:24,32-33` —
``hashlib`` imported, never used; SURVEY §1.4 Q4). The engine exposes
both: the faithful concat surrogate and the intended sha-256 key.

Both are pure Catalyst column expressions — JVM-side, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def concat_key(*cols: Column | str, sep: str = "_") -> Column:
    """Concat surrogate key (reference `data/extraction.py:46`).

    ``concat_ws`` skips nulls (the reference's f-string would render the
    string ``"None"`` instead — we do not reproduce that accident).
    """
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def hash_key(*cols: Column | str, sep: str = "_", num_bits: int = 256) -> Column:
    """The hashed key the reference intended (SURVEY §1.4 Q4): sha2 over the
    concat form. Stable across engines (DuckDB ``sha256`` twin)."""
    return F.sha2(concat_key(*cols, sep=sep), num_bits)
