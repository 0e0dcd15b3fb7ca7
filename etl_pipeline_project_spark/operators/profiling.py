"""Table profiling — the "ANALYZE TABLE"-style data-quality report.

The reference eyeballs data quality manually (its notebooks print
``df.info()`` / ``df.isna().sum()`` — `data/transformation_db.py:87-96`
drops nulls blind). This operator computes the per-column profile a
pipeline gate actually wants — row count, null count, distinct count,
min / max — in **one pass over the table**: a single aggregate row of
``count / count_distinct / min / max`` per column, then an unpivot
(``stack``) into one row per column. No per-column scans, no shuffle
except the final single-row aggregate; at 100 TB this is the same cost
as any full-scan aggregate, with partial aggregation map-side.

Min/max are surfaced as strings so one schema fits every column type;
only integral and string columns are accepted (double formatting is not
cross-engine stable — callers cast first if they need it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per profiled column: (column_name, n_rows, n_null,
    n_distinct, min_value, max_value) — strings for min/max."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    # unpivot: stack(n, 'col1', nn1, nd1, min1, max1, 'col2', ...)
    parts = ", ".join(
        f"'{c}', `_nn_{c}`, `_nd_{c}`, `_min_{c}`, `_max_{c}`" for c in cols
    )
    stacked = one.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {parts}) AS (column_name, n_notnull, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_null"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def dq_violations(df: DataFrame, rules: Sequence[tuple[str, "F.Column"]]) -> DataFrame:
    """Rule-based data-quality gate: one row per rule with its violation
    count, computed in ONE pass over the table.

    The reference's only quality mechanism is a blind ``dropna`` before
    load (`data/transformation_db.py:87-96`, `data/transformation_dw.py`
    NOT-NULL subsets) — it destroys evidence instead of reporting it. A
    pipeline gate wants the opposite: keep the data, surface per-rule
    violation counts, let the operator downstream decide. All rules fold
    into a single aggregate row (map-side partial aggregation — one scan,
    one single-row shuffle regardless of rule count), then ``stack`` to
    (rule, n_violations, n_rows). A row violates a rule when the predicate
    is not TRUE (i.e. FALSE *or* NULL — a null check-input is a failure,
    not a free pass).
    """
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.count(F.when(~F.coalesce(pred, F.lit(False)), 1)).alias(f"_v_{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    one = df.agg(*aggs)
    parts = ", ".join(f"'{name}', `_v_{i}`" for i, (name, _) in enumerate(rules))
    return one.select(
        F.expr(f"stack({len(rules)}, {parts}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    )
