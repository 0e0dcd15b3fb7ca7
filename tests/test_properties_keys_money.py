"""Property-based tests for the surrogate-key functions and the exact
money aggregate.

- hash_key must equal Python hashlib.sha256 over the concat_ws form
  (nulls skipped) — a cross-implementation check of the key contract
  that the incremental loads and the DuckDB twins both depend on.
- money_sum must be partition- and order-INDEPENDENT (bit-identical
  under repartition/reversal — the property double summation lacks and
  the reason the accumulator is decimal) and exact against a Fraction
  reference on inputs with exactly-representable cents.
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.functions.keys import concat_key, hash_key
from etl_pipeline_project_spark.operators.aggregates import money_sum

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

key_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.text(alphabet="abc_-0189", max_size=6)),
        st.one_of(st.none(), st.integers(min_value=-999, max_value=999)),
    ),
    min_size=1,
    max_size=12,
)


@given(rows=key_rows)
@_SETTINGS
def test_hash_key_matches_hashlib(spark, rows):
    schema = T.StructType(
        [T.StructField("a", T.StringType(), True), T.StructField("b", T.LongType(), True)]
    )
    df = spark.createDataFrame(rows, schema)
    got = [
        (r["ck"], r["hk"])
        for r in df.select(
            concat_key("a", "b").alias("ck"), hash_key("a", "b").alias("hk")
        ).collect()
    ]
    for (a, b), (ck, hk) in zip(rows, got):
        # concat_ws skips nulls entirely (no "None" rendering, no empty slot)
        parts = [p for p in (a, None if b is None else str(b)) if p is not None]
        expect_ck = "_".join(parts)
        assert ck == expect_ck
        assert hk == hashlib.sha256(expect_ck.encode("utf-8")).hexdigest()


# quarter-cent-free money values: k/4 is exact in binary AND ≤2 decimal
# places, so decimal accumulation and the Fraction reference are both exact
money_rows = st.lists(
    st.integers(min_value=-4 * 10**6, max_value=4 * 10**6).map(lambda k: k / 4.0),
    min_size=1,
    max_size=25,
)


@given(vals=money_rows, parts=st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_money_sum_exact_and_order_independent(spark, vals, parts):
    schema = T.StructType([T.StructField("amt", T.DoubleType(), False)])
    df = spark.createDataFrame([(v,) for v in vals], schema)
    base = df.agg(money_sum(F.col("amt")).alias("s")).collect()[0]["s"]
    expect = float(sum(Fraction(v) for v in vals))
    assert base == expect
    # bit-identical under a different partitioning and reversed input —
    # the associativity/order-independence the decimal accumulator buys
    shuffled = (
        spark.createDataFrame([(v,) for v in reversed(vals)], schema)
        .repartition(parts)
        .agg(money_sum(F.col("amt")).alias("s"))
        .collect()[0]["s"]
    )
    assert shuffled == base
