"""Property-based tests (hypothesis) for the three invariants the
reference's design depends on (SURVEY §5 item 4): dedup idempotence,
anti-join⇒append convergence, and overwrite idempotence — over generated
dirty inputs (duplicate keys, nulls, overlap), not just the fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.dedup import dedup_keyed
from etl_pipeline_project_spark.operators.joins import anti_incremental
from etl_pipeline_project_spark.operators.setops import union_all

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), True),
        T.StructField("v", T.LongType(), True),
        T.StructField("w", T.StringType(), True),
    ]
)

rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),  # few keys → many dups
        st.integers(min_value=-1000, max_value=1000),
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
    ),
    min_size=0,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame([tuple(r) for r in data], SCHEMA)


@given(data=rows)
@_SETTINGS
def test_dedup_idempotent_and_key_unique(spark, data):
    df = _df(spark, data)
    tb = [F.col("v").asc_nulls_first(), F.col("w").asc_nulls_first()]
    once = dedup_keyed(df, "k", tiebreak=tb)
    assert once.count() == df.select("k").distinct().count()
    twice = dedup_keyed(once, "k", tiebreak=tb)
    assert twice.exceptAll(once).count() == 0
    assert once.exceptAll(twice).count() == 0


@given(data=rows, already=rows)
@_SETTINGS
def test_anti_join_append_converges(spark, data, already):
    staged = _df(spark, data)
    target = dedup_keyed(_df(spark, already), "k", tiebreak=["v", "w"])
    fresh = anti_incremental(
        dedup_keyed(staged, "k", tiebreak=["v", "w"]), target, "k"
    )
    after = union_all(target, fresh)
    # convergence: a second pass of the same staged data adds nothing
    again = anti_incremental(dedup_keyed(staged, "k", tiebreak=["v", "w"]), after, "k")
    assert again.count() == 0
    # keys are now the union of both key sets, each exactly once
    expected_keys = {r[0] for r in data} | {r[0] for r in already}
    assert after.count() == len(expected_keys)


@given(data=rows)
@_SETTINGS
def test_overwrite_idempotent(spark, tmp_path_factory, data):
    path = str(tmp_path_factory.mktemp("ow") / "t")
    df = _df(spark, data)
    df.write.mode("overwrite").parquet(path)
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
