"""Pandas-UDF extension surface (SURVEY §2.I).

The reference has no user-extensibility surface — all its row-wise Python
(`data/extraction.py:44-55,94-105,139-148`) maps to built-in expressions.
The engine's extension API is the standard PySpark Pandas-UDF family:
Arrow-batched, vectorized, ~10-100× faster than row-at-a-time Python UDFs.

NOTE: this module intentionally does NOT use ``from __future__ import
annotations`` — pandas_udf resolves real type hints at decoration time.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def concat3_udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
    """Vectorized reimplementation of `functions.keys.concat_key` for three
    columns (reference `data/extraction.py:46`) — exists to demonstrate and
    test the Arrow UDF path against the built-in expression."""
    return a.astype("string") + "_" + b.astype("string") + "_" + c.astype("string")


@F.pandas_udf(T.DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Grouped-aggregate Pandas UDF (Series → scalar): exact median per
    group. The UDAF half of the extension surface — Arrow ships each
    group's column batch to Python once; the sort is per-group, never
    global. np.median's even-count midpoint average is the same
    interpolation as SQL percentile_cont(0.5)."""
    import numpy as np

    return float(np.median(v.to_numpy()))


try:  # Python UDTFs need Spark 4.x / arrow-enabled builds
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitWordsUDTF:
        """Python UDTF (table function): text → one row per token of the
        first ``limit`` space-separated tokens. The UDTF half of §2.I —
        lateral-joinable from SQL. Row-at-a-time Python is the slow path
        by design (the built-in explode/split covers the fast path);
        this exists to exercise the extension surface."""

        def eval(self, text: str, limit: int):  # noqa: ANN001
            toks = (text or "").split(" ")
            for i, tok in enumerate(toks[: limit or 0]):
                yield i, tok

except ImportError:  # pragma: no cover - older runtimes
    SplitWordsUDTF = None


@F.pandas_udf(T.LongType())
def cents_mod97_udf(v: pd.Series) -> pd.Series:
    """Deterministic integer checksum feature (cents % 97) — exists as the
    SQL-catalog registration example (`q_udf_sql_registered`): registered
    via ``spark.udf.register`` so pure-SQL callers reach the Arrow-batched
    Python path.

    Mirrors the SQL twin ``CAST(ROUND(value*100, 0) AS BIGINT) % 97``
    exactly on the FULL input domain, not just today's data: ROUND is
    half-away-from-zero (pandas ``Series.round`` is half-even — 2.5 vs 3),
    and SQL ``%`` follows the dividend's sign (pandas ``%`` is Python
    modulo, always non-negative for a positive divisor — negative inputs
    would diverge). Nulls pass through as nulls."""
    import numpy as np

    mask = v.isna()
    a = v.fillna(0).astype("float64").to_numpy()
    cents = np.sign(a) * np.floor(np.abs(a) * 100.0 + 0.5)  # half away from 0
    out = pd.Series(np.fmod(cents, 97.0), index=v.index).astype("Int64")
    out[mask] = pd.NA
    return out
