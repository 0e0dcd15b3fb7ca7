"""Property-based tests for the text-dedup primitives against Python
set-arithmetic references on generated word-soup documents.

- jaccard_pairs / containment_pairs: the inverted-index plans must emit
  exactly the pairs a brute-force shingle-set computation emits (the
  DF-pruning and co-occurrence-count tricks are optimizations, not
  semantics).
- minhash_lsh_pairs: SOUNDNESS only — every emitted pair carries the
  true (exactly verified) jaccard distance and clears the threshold;
  recall is probabilistic by design and is covered by the dedicated
  recall tests.
- SimHash: bag-of-tokens invariants that hold by construction —
  order-independence and whitespace-normalization — checked without
  Spark (pure function).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.operators.dedup_text import (
    _simhash_one,
    containment_pairs,
    jaccard_pairs,
    minhash_lsh_pairs,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

VOCAB = [f"w{i}" for i in range(6)]

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("block", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=7).map(" ".join),
    ),
    min_size=0,
    max_size=8,
)


def _shingles(text: str, k: int) -> set[str]:
    # mirror word_shingles: single-space split, no shingles below k words
    words = text.split(" ")
    if len(words) < k:
        return set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


@given(docs=docs_strategy)
@_SETTINGS
def test_jaccard_pairs_match_reference(spark, docs):
    k, threshold = 2, 0.25
    df = spark.createDataFrame(
        [(i, b, t) for i, (b, t) in enumerate(docs)], DOC_SCHEMA
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", "text", "block", k=k, threshold=threshold).collect()
    }
    expect = {}
    for a, (ba, ta) in enumerate(docs):
        for b in range(a + 1, len(docs)):
            bb, tb = docs[b]
            if ba != bb:
                continue
            sa, sb = _shingles(ta, k), _shingles(tb, k)
            inter = len(sa & sb)
            if inter == 0:  # the inverted index never materializes disjoint pairs
                continue
            jac = inter / max(len(sa) + len(sb) - inter, 1)
            if jac >= threshold:
                expect[(a, b)] = jac
    assert got == expect


@given(docs=docs_strategy)
@_SETTINGS
def test_containment_pairs_match_reference(spark, docs):
    k, threshold = 2, 0.3
    df = spark.createDataFrame(
        [(i, b, t) for i, (b, t) in enumerate(docs)], DOC_SCHEMA
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, "doc_id", "text", "block", k=k, threshold=threshold).collect()
    }
    expect = {}
    for a, (ba, ta) in enumerate(docs):
        for b, (bb, tb) in enumerate(docs):
            if a == b or ba != bb:
                continue
            sa, sb = _shingles(ta, k), _shingles(tb, k)
            inter = len(sa & sb)
            if inter == 0:
                continue
            cont = inter / max(len(sa), 1)
            if cont >= threshold:
                expect[(a, b)] = cont
    assert got == expect


# minhash docs: at least k=2 words so every doc has a non-empty shingle set
minhash_docs = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=2, max_size=7).map(" ".join),
    min_size=0,
    max_size=8,
)


@given(texts=minhash_docs)
@_SETTINGS
def test_minhash_lsh_pairs_sound(spark, texts):
    k, dist_threshold = 2, 0.8
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )
    df = spark.createDataFrame(list(enumerate(texts)), schema)
    rows = minhash_lsh_pairs(
        df, "doc_id", "text", k=k, num_hashes=16, band_rows=2,
        jaccard_distance_threshold=dist_threshold,
    ).collect()
    seen = set()
    for r in rows:
        a, b = r["id_a"], r["id_b"]
        assert a < b and (a, b) not in seen
        seen.add((a, b))
        sa, sb = _shingles(texts[a], k), _shingles(texts[b], k)
        inter = len(sa & sb)
        true_dist = 1.0 - inter / max(len(sa) + len(sb) - inter, 1)
        # exact verification: the emitted distance IS the true distance
        assert r["jaccard_distance"] == true_dist
        assert r["jaccard_distance"] < dist_threshold
    # identical texts have distance 0 and band-collide with certainty:
    # every identical pair MUST be emitted (soundness test's one recall
    # guarantee that is deterministic, not probabilistic)
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if texts[a] == texts[b]:
                assert (a, b) in seen


tokens_strategy = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10)


@given(toks=tokens_strategy, seed=st.randoms(use_true_random=False))
@_SETTINGS
def test_simhash_bag_invariants(toks, seed):
    base = _simhash_one(" ".join(toks))
    # order-independent: SimHash sums per-token bit votes
    shuffled = list(toks)
    seed.shuffle(shuffled)
    assert _simhash_one(" ".join(shuffled)) == base
    # whitespace-normalizing: .split() collapses runs of whitespace
    assert _simhash_one("  ".join(toks) + " ") == base
    # deterministic across calls (md5-based, no PYTHONHASHSEED surface)
    assert _simhash_one(" ".join(toks)) == base


def test_shingle_frame_equals_word_shingles(spark):
    """r13 (r12 ADVICE): direct equality of the NGram-based shingle_frame
    with the word_shingles reference for every k the engine uses
    (jaccard/containment/minhash use k∈{2,3}; q_decontaminate uses k=5),
    over the awkward inputs: NULL text, empty string, repeated spaces,
    fewer-than-k words, duplicate shingles."""
    from etl_pipeline_project_spark.operators.dedup_text import (
        shingle_frame,
        word_shingles,
    )
    from pyspark.sql import functions as F

    texts = [
        None,
        "",
        " ",
        "  ",
        "a",
        "a b",
        "a b c",
        "a  b   c",
        "a b c d e f g",
        "x x x x x x",
        "a b a b a b a b",
        " leading space",
        "trailing space ",
        "tab\tinside stays one token",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")
    for k in (2, 3, 5):
        got = {
            r["id"]: r["sh"]
            for r in shingle_frame(df, "text", "sh", k, keep=["id"]).collect()
        }
        want = {
            r["id"]: r["sh"]
            for r in df.select("id", word_shingles("text", k).alias("sh")).collect()
        }
        assert got == want, (k, got, want)
