"""Char-bigram LM quality scoring (operators/text_analysis.py)."""

def test_lm_quality_flags_gibberish(spark):
    """Fluent repeated-pattern text must score fewer bits/char than
    uniform-random gibberish under the corpus bigram LM."""
    import random

    from etl_pipeline_project_spark.operators.text_analysis import lm_quality_score

    rng = random.Random(7)
    fluent = "the quick brown fox jumps over the lazy dog " * 20
    gibberish = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ") for _ in range(800))
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(20)] + [(100, gibberish)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["bits_per_char"] for r in lm_quality_score(docs).collect()}
    assert rows[100] > rows[0] + 1.0  # gibberish clearly worse
    assert all(v > 0 for v in rows.values())
