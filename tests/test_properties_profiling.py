"""Property-based tests for the profiling and data-quality operators
against Python references on generated dirty data (nulls everywhere,
all-null columns, rules whose predicate itself evaluates to NULL)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.profiling import dq_violations, profile_columns

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
    ]
)

rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c", ""])),
        st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
    ),
    min_size=1,
    max_size=20,
)


@given(rows=rows_strategy)
@_SETTINGS
def test_profile_columns_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["column_name"]: r for r in profile_columns(df, ["s", "v"]).collect()}
    for col, idx in (("s", 0), ("v", 1)):
        vals = [r[idx] for r in rows]
        nn = [x for x in vals if x is not None]
        p = got[col]
        assert p["n_rows"] == len(rows)
        assert p["n_null"] == len(vals) - len(nn)
        assert p["n_distinct"] == len(set(nn))
        assert p["min_value"] == (str(min(nn)) if nn else None)
        assert p["max_value"] == (str(max(nn)) if nn else None)


@given(rows=rows_strategy)
@_SETTINGS
def test_dq_violations_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    rules = [
        ("s_notnull", F.col("s").isNotNull()),
        ("v_positive", F.col("v") > 0),  # NULL v => NULL predicate => violation
        ("s_nonempty", F.col("s") != ""),
    ]
    got = {r["rule"]: (r["n_violations"], r["n_rows"]) for r in dq_violations(df, rules).collect()}
    n = len(rows)
    # a row violates when the predicate is not TRUE (FALSE or NULL)
    expect = {
        "s_notnull": sum(1 for s, _ in rows if s is None),
        "v_positive": sum(1 for _, v in rows if not (v is not None and v > 0)),
        "s_nonempty": sum(1 for s, _ in rows if not (s is not None and s != "")),
    }
    assert got == {k: (v, n) for k, v in expect.items()}
