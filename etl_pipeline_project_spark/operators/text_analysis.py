"""Text-analysis operators for large-scale training-data pipelines.

North-star extension block (not present in the reference, which only ever
flattens API text fields — `data/extraction.py:44-55,94-105`): language ID,
quality scoring, token counting, and document fingerprinting over a
``documents`` table. Everything here is built-in Catalyst expressions —
JVM-side, codegen'd, no Python in the hot path — so a 100 TB documents
scan stays a single whole-stage-codegen'd map with no shuffle at all.

Regex patterns are restricted to the dialect shared by Java regex and RE2
(character classes, alternation, ``\\b``) so the DuckDB oracles compute the
same thing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenization: letter runs, digit runs, single punctuation marks.
# Explicit whitespace class instead of \s: Java's \s (Spark) includes
# vertical tab \x0B while DuckDB's RE2 \s does not, so a document
# containing \x0B would tokenize/fingerprint differently per engine.
# This class is interpreted identically by both. (Don't use \v: in Java
# regex \v is a vertical-whitespace CLASS, not the vertical-tab char.)
WS_CLASS = r"[ \t\n\r\f\x0b]"
NON_WS_CLASS = r"[^ \t\n\r\f\x0b]"

BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0b]"
PUNCT_PATTERN = r"[^A-Za-z0-9 \t\n\r\f\x0b]"

# Minimal per-language stopword signals for the n-gram/stopword-hit
# heuristic. Order matters: ties resolve by this precedence.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "es", "una"],  # "la"/"y" shared forms omitted
    "zh": [],  # zh has no space-delimited stopwords; detected by CJK chars
}
CJK_PATTERN = r"[一-鿿]"


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, trimmed, whitespace
    collapsed. Collapse runs FIRST, then trim: Spark's ``trim`` strips
    ASCII spaces only, so trimming the collapsed form (edges are at most
    one space) gives full whitespace-trim semantics — ``"a\\n"`` and
    ``"a"`` must fingerprint identically or edge-newline duplicates
    survive dedup (found by hypothesis in tests/test_properties_history_text.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), WS_CLASS + "+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """sha-256 fingerprint of the normalized text — the exact-dedup key."""
    return F.sha2(normalize_text(col), 256)


def word_count(col: Column | str) -> Column:
    """Whitespace-separated word count. Counts over the collapsed+trimmed
    form: ``trim`` alone strips only ASCII spaces, so a leading tab or
    newline would leave an empty head token and overcount by one."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(c, WS_CLASS + "+", " "))
    return (
        F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))).cast("long")
    )


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count via regex (letters / digits / punct marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.regexp_count(c, F.lit(PUNCT_PATTERN)).cast("double")
        / F.greatest(F.length(c), F.lit(1)).cast("double")
    )


def stopword_hits(col: Column | str, words: list[str]) -> Column:
    """Count of stopword occurrences (word-boundary matches)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pattern)).cast("long")


def stopword_ratio(col: Column | str, words: list[str] | None = None) -> Column:
    words = words or LANG_STOPWORDS["en"]
    return stopword_hits(col, words).cast("double") / F.greatest(
        word_count(col), F.lit(1)
    ).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: enough words, low punctuation
    noise, natural stopword density. Deterministic arithmetic only."""
    wc = word_count(col).cast("double")
    length_term = F.least(wc / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 5, F.lit(1.0))
    # no rounding: the identical expression tree on the oracle side is
    # bit-deterministic; rounding would only add half-up/half-even risk
    return (length_term + punct_term + stop_term) / 3


# PII scrubbing patterns — dialect shared by Java regex and RE2 so the
# DuckDB twin matches. Emails, URLs, and long digit runs (phone/account
# numbers); extend per deployment.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^ \t\n\r\f\x0b]+", "<URL>"),
    (r"[0-9]{4,}", "<NUM>"),
]


def pii_redact(col: Column | str) -> Column:
    """Replace PII-shaped spans with typed placeholders — the standard
    pre-training scrub. Pure Catalyst regexp_replace chain: JVM-side,
    codegen'd, no shuffle; a 100 TB corpus pass stays map-only."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, placeholder in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def pii_hit_count(col: Column | str) -> Column:
    """Number of PII-shaped spans (before redaction) — the audit metric a
    scrubbing pipeline reports per document."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for pattern, _ in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pattern))
    return total.cast("long")


def hash_bucket(col: Column | str, buckets: int) -> Column:
    """Deterministic [0, buckets) bucket from the md5 of the value —
    engine-portable (md5 hex is identical everywhere, unlike xxhash64 /
    DuckDB hash()). The basis for reproducible stratified sampling and
    train/val/test splits: the assignment is a pure function of the id,
    stable across runs, engines, and cluster sizes."""
    c = F.col(col) if isinstance(col, str) else col
    # first 8 hex chars → 32-bit int → mod buckets; conv() returns a
    # base-10 string, cast to long before the mod
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long") % buckets


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword-hit language heuristic: CJK characters ⇒ zh, else
    argmax of per-language stopword hits (precedence en>de>fr>es on ties),
    'und' when nothing matches."""
    c = F.col(col) if isinstance(col, str) else col
    hits = {
        lang: stopword_hits(c, words)
        for lang, words in LANG_STOPWORDS.items()
        if words
    }
    best = F.greatest(*hits.values())
    expr = F.when(F.regexp_count(c, F.lit(CJK_PATTERN)) > 0, F.lit("zh")).when(
        best == 0, F.lit("und")
    )
    for lang in ["en", "de", "fr", "es"]:
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def chunk_text(
    text_col: Column | str,
    size: int,
    stride: int,
) -> Column:
    """Overlapping fixed-size character windows over a document — the
    context-window chunking step of a training/RAG pipeline. Returns an
    ``array<struct<chunk_id:int, chunk:string>>``; callers ``inline`` it
    to one row per chunk. Pure Catalyst (``sequence`` + ``transform`` +
    ``substring``) — at 100 TB this is a map-only pass with no shuffle
    and no Python; the output explodes ~len/stride× rows, which is the
    unavoidable payload growth of overlapped chunking, not an engine
    cost. Empty documents produce a single empty chunk so no document is
    silently dropped (auditable row-count: sum(ceil(len/stride)) + empties).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # last window head: largest multiple of stride strictly below length
    # (so a doc of exactly `size` chars yields one chunk, not two)
    offsets = F.sequence(
        F.lit(0),
        F.greatest((F.length(c) - 1), F.lit(0)),
        F.lit(stride),
    )
    return F.transform(
        offsets,
        lambda off, i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.substring(c, off + 1, size).alias("chunk"),
        ),
    )


def ngram_pairs(text_col: Column | str) -> Column:
    """Adjacent whitespace-token bigrams as an ``array<string>`` — the
    vocabulary-building primitive. Guarded to an empty array below two
    tokens.

    Formulated as ``zip_with(toks[:-1], toks[1:])`` — one linear pass.
    The obvious ``transform(sequence(0, n-2), i -> element_at(toks, i+1)
    …)`` is quadratic in practice: Catalyst inlines the ``split`` subtree
    into every ``element_at`` call, re-tokenizing the document once per
    bigram (measured 11× slower at sf0.1)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(c), WS_CLASS + "+")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, bigrams).otherwise(F.array().cast("array<string>"))


def tfidf_top_terms(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
    min_len: int = 3,
):
    """Corpus-level TF-IDF vocabulary: the ``k`` most *distinctive* terms,
    scored ``total_tf * ln(N / df)`` (raw term frequency summed over the
    corpus, unsmoothed IDF; terms present in every document score 0).

    Scale shape: one map-side tokenize+explode, then a single shuffle on
    the term key computing ``total_tf`` (sum of per-doc counts) and ``df``
    (distinct docs) in the same partial+final aggregate, then
    TakeOrdered(k). No all-pairs, no second scan: N comes from a scalar
    subquery-style broadcast count. All aggregates are integer-exact, so
    1000-executor partials equal the single-node result; the only float op
    is the final per-term ``tf * ln(N/df)``, rounded to 6 dp for a stable
    cross-engine ordering (ties broken by term).
    """
    c = F.lower(F.col(text_col))
    terms = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.regexp_extract_all(c, F.lit("[a-z]+"), 0)).alias("term"),
    ).filter(F.length("term") >= min_len)
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    per_term = (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("total_tf"),
            F.countDistinct("__doc").alias("df"),
        )
        .crossJoin(F.broadcast(n_docs))
    )
    scored = per_term.select(
        "term",
        "total_tf",
        "df",
        F.round(
            F.col("total_tf").cast("double")
            * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
            6,
        ).alias("tfidf"),
    )
    return scored.orderBy(F.col("tfidf").desc(), F.col("term").asc()).limit(k)


# ---------------------------------------------------------------------------
# Char-bigram language-model quality scoring (KenLM-perplexity proxy).
# ---------------------------------------------------------------------------

LM_ALPHABET_SIZE = 38  # [a-z] + [0-9] + space + '_' (everything else → '_')


def lm_normalize(col: Column | str) -> Column:
    """Closed-alphabet normal form for the char LM: lowercase, every char
    outside [a-z0-9 ] mapped to '_'. The bounded alphabet caps the model
    at 38² rows no matter the corpus size — that is what makes the model
    broadcastable at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", "_")


def char_bigrams(col: Column | str) -> Column:
    """All overlapping 2-char substrings — zip_with over shifted slices of
    one split, the word_bigrams pattern. The naive
    ``transform(sequence(…), i -> substring(s, i, 2))`` re-inlines the
    full upstream expression (here: the regexp normalize) into every
    lambda call — O(len²) per document, measured ~50× slower at
    sf0.001."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    n = F.size(chars)
    grams = F.zip_with(
        F.slice(chars, 1, n - 1), F.slice(chars, 2, n - 1), lambda a, b: F.concat(a, b)
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def lm_bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus char-bigram model: per bigram, Laplace-smoothed conditional
    negative log-likelihood in integer micro-bits.

    ``nbits_micro(c1c2) = round(-log2((count(c1c2)+1) / (count(c1·)+38)) * 1e6)``

    Scale shape: one map-side explode + two tiny aggregates. The grouped
    bigram count does a partial (map-side) combine, so the shuffle moves at
    most 38² rows per task regardless of corpus size; the prefix total is a
    broadcast join between two ≤38²-row frames. Integer counts make the
    probability ratio — and hence the rounded micro-bit weight —
    bit-identical across engines.
    """
    big = docs.select(
        F.explode(char_bigrams(lm_normalize(text_col))).alias("bg")
    )
    model = big.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt"))
    return _nbits_from_counts(model)


def _nbits_from_counts(model_counts: DataFrame) -> DataFrame:
    """(bg, cnt) → (bg, nbits_micro): the Laplace-smoothed conditional
    NLL shared by :func:`lm_bigram_model` and :func:`lm_quality_score` —
    the prefix total is a broadcast join between two ≤38²-row frames."""
    pref = model_counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("tot")
    )
    return (
        model_counts.join(F.broadcast(pref), F.substring("bg", 1, 1) == F.col("c1"))
        .select(
            "bg",
            F.round(
                -F.log2(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("tot") + F.lit(LM_ALPHABET_SIZE)).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("nbits_micro"),
        )
    )


def lm_quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean bits-per-char under the corpus char-bigram LM —
    the classic perplexity-proxy quality filter (gibberish, boilerplate
    and wrong-charset docs score high; fluent text scores low).

    ONE pass over the text (r13, guide §2.4): the normalize+explode runs
    once into a per-(doc, bigram) count frame; the corpus model counts
    are its per-bigram re-sum (identical integers — associativity), and
    scoring weights each (doc, bigram) row by its count instead of
    re-exploding the corpus (Σ c·nbits ≡ the per-instance sum, exact in
    int64: c ≤ doc length, nbits_micro ≤ ~3e7). The model (≤38² rows)
    broadcasts; the only float op is one final division per doc.
    Interleaved A/B vs the two-explode r12 shape: min 4.25 s → 3.22 s
    unpinned, → 2.78 s with the per-(doc, bigram) frame lazily
    localCheckpoint-ed (three consumers — model counts, prefix totals,
    scoring join — read ONE materialization instead of re-running the
    explode subtree; bit-identical output at every step).
    """
    perdoc = (
        docs.select(
            F.col(id_col), F.explode(char_bigrams(lm_normalize(text_col))).alias("bg")
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c_db"))
        .localCheckpoint(eager=False)
    )
    model = _nbits_from_counts(perdoc.groupBy("bg").agg(F.sum("c_db").alias("cnt")))
    return (
        perdoc.join(F.broadcast(model), "bg")
        .groupBy(id_col)
        .agg(
            F.sum("c_db").alias("n_bigrams"),
            F.sum(F.col("c_db") * F.col("nbits_micro")).alias("sum_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            (
                F.col("sum_micro").cast("double")
                / (F.col("n_bigrams").cast("double") * 1e6)
            ).alias("bits_per_char"),
        )
    )
