"""Property-based tests for the similarity tier.

- ann_ivf_topk with nprobe == nlist (probe-complete) must EQUAL
  ann_bruteforce_topk — the operator's own contract ("exact within
  probed cells; recall is the only approximation"), checked on generated
  vector sets rather than the clustered fixture.
- centroid_fixed_point must be bit-identical under repartitioning (the
  order-independence the fixed-point accumulator exists for) and match
  a Python integer-arithmetic reference exactly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    centroid_fixed_point,
)

_SETTINGS = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
    ]
)

# distinct integer-valued vectors: scores are exact in float64, and KMeans
# always has >= nlist distinct points
vectors = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=-5, max_value=5),
    ),
    min_size=3,
    max_size=9,
    unique=True,
)


@given(vecs=vectors, k=st.integers(min_value=1, max_value=4))
@_SETTINGS
def test_ivf_probe_complete_equals_bruteforce(spark, vecs, k):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], VEC_SCHEMA
    )
    exact = {
        (r["qid"], r["rank"]): (r["nid"], r["score"])
        for r in ann_bruteforce_topk(df, df, k=k, metric="dot").collect()
    }
    ivf = {
        (r["qid"], r["rank"]): (r["nid"], r["score"])
        for r in ann_ivf_topk(df, df, k=k, nlist=2, nprobe=2).collect()
    }
    assert ivf == exact


GRP_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
    ]
)

grouped_vectors = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.tuples(
            st.integers(min_value=-9, max_value=9), st.integers(min_value=-9, max_value=9)
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(rows=grouped_vectors, parts=st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_centroid_fixed_point_exact_and_order_independent(spark, rows, parts):
    scale = 1_000_000
    df = spark.createDataFrame(
        [(g, [float(x) for x in v]) for g, v in rows], GRP_SCHEMA
    )
    got = {
        (r["grp"], r["dim"]): (r["n_vecs"], r["centroid"])
        for r in centroid_fixed_point(df, "grp").collect()
    }
    # Python reference with the IDENTICAL arithmetic: exact int sum of
    # floor(v*scale), then the same two-division chain
    acc: dict[tuple, list] = {}
    for g, v in rows:
        for d, x in enumerate(v):
            s = acc.setdefault((g, d), [0, 0])
            s[0] += x * scale  # floor is exact for integer-valued components
            s[1] += 1
    expect = {gd: (n, s / float(scale) / float(n)) for gd, (s, n) in acc.items()}
    assert got == expect
    # bit-identical under a different partitioning (int accumulation is
    # associative; a 1000-executor partial agg must equal single-node)
    again = {
        (r["grp"], r["dim"]): (r["n_vecs"], r["centroid"])
        for r in centroid_fixed_point(df.repartition(parts), "grp").collect()
    }
    assert again == got
