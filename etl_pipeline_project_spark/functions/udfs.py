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
