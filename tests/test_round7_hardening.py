"""Round-7 hardening tests — properties of the int64-only twin sweep
(round-6 verdict items 1 and 4).

1. SimHash two's-complement identity: summing the signed per-bit
   contributions directly (+2^j below the sign bit, −2^63 for it — the
   round-7 twin form) equals building the unsigned 64-bit word and
   wrapping it (the r6 HUGEINT form) for EVERY bit pattern. Hypothesis
   sweeps random patterns; the proof obligation is the algebraic identity
   u − bit63·2^64 = Σ_{j<63} bit_j·2^j − bit63·2^63.
2. Cross-engine IEEE determinism of the model-score residual sign: the
   q_model_score_broadcast twin evaluates a cross-product too large for
   int64 in doubles, claiming two engines agree bit-for-bit when the
   expression text is identical and every input is < 2^53. Python floats
   ARE IEEE-754 doubles with left-associated evaluation, so DuckDB's
   result must equal Python's exactly — an independent second
   implementation validating the claim the Spark twin relies on.
3. The milli-quantized time-weighted-average identity used by the
   q_time_weighted_avg rewrite: integer `div`/`%` reconstruction
   (q·total + r == s) and DuckDB `//`/`%` ≡ Python `//`/`%` on the
   non-negative operands the query guarantees.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# 1. SimHash signed-sum ≡ unsigned-wrap
# ---------------------------------------------------------------------------


def _signed_direct(bits: int) -> int:
    s = 0
    for j in range(63):
        if bits >> j & 1:
            s += 1 << j
    if bits >> 63 & 1:
        s -= 1 << 63
    return s


def _unsigned_wrap(bits: int) -> int:
    u = bits & ((1 << 64) - 1)
    return u - (1 << 64) if u >= 1 << 63 else u


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=300, deadline=None)
def test_simhash_twos_complement_identity(bits: int) -> None:
    got = _signed_direct(bits)
    assert got == _unsigned_wrap(bits)
    assert -(1 << 63) <= got < 1 << 63  # always projects as a BIGINT


def test_simhash_twin_form_in_duckdb_matches_python() -> None:
    """Run the twin's exact CASE/SUM shape over explicit bit tables for
    edge patterns (sign bit alone, all bits, alternating) and compare to
    Python — proves the SQL formulation, not just the algebra."""
    con = duckdb.connect()
    patterns = [0, 1, 1 << 63, (1 << 64) - 1, 0xAAAAAAAAAAAAAAAA,
                0x5555555555555555, (1 << 63) | 1]
    for bits in patterns:
        rows = ", ".join(
            f"({j}, {1 if bits >> j & 1 else -1})" for j in range(64)
        )
        (got,) = con.execute(
            f"""
            SELECT CAST(SUM(CASE
                WHEN w > 0 AND j < 63 THEN CAST(1 AS BIGINT) << CAST(j AS INTEGER)
                WHEN w > 0 AND j = 63 THEN CAST(-9223372036854775807 AS BIGINT) - 1
                ELSE CAST(0 AS BIGINT) END) AS BIGINT)
            FROM (VALUES {rows}) t(j, w)
            """
        ).fetchone()
        assert got == _signed_direct(bits), hex(bits)


# ---------------------------------------------------------------------------
# 2. Residual-sign double expression: DuckDB ≡ Python IEEE evaluation
# ---------------------------------------------------------------------------

_SAFE = int(2**53) - 1


@given(
    st.integers(min_value=1, max_value=_SAFE),          # n
    st.integers(min_value=-_SAFE, max_value=_SAFE),     # num
    st.integers(min_value=0, max_value=_SAFE),          # den
    st.integers(min_value=-_SAFE, max_value=_SAFE),     # sx
    st.integers(min_value=0, max_value=_SAFE),          # sy
    st.integers(min_value=0, max_value=1_000_000),      # y
    st.integers(min_value=-50_000, max_value=50_000),   # xc
)
@settings(max_examples=120, deadline=None)
def test_residual_sign_double_expr_duckdb_equals_python(
    n, num, den, sx, sy, y, xc
) -> None:
    con = duckdb.connect()
    (got,) = con.execute(
        """
        SELECT CAST(? AS DOUBLE) * CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
             - CAST(? AS DOUBLE) * CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
             - CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
             + CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
        """,
        [n, den, y, n, num, xc, den, sy, num, sx],
    ).fetchone()
    # Python floats are IEEE doubles; same left-associated shape
    want = (
        float(n) * float(den) * float(y)
        - float(n) * float(num) * float(xc)
        - float(den) * float(sy)
        + float(num) * float(sx)
    )
    assert got == want or (got != got and want != want)  # NaN-safe bitwise-equal


# Above 2^53 an int64 no longer converts to double exactly — but BOTH
# engines use the same IEEE round-to-nearest-even int64→double cast, so
# the identically-shaped expression must STILL be bit-equal (round-7
# ADVICE: the >=2^53 regime was untested even though den = n·Sxx − Sx²
# can plausibly reach it before the overflow guard fires).
_WIDE = int(2**62)


@given(
    st.integers(min_value=1, max_value=_WIDE),          # n
    st.integers(min_value=-_WIDE, max_value=_WIDE),     # num
    st.integers(min_value=0, max_value=_WIDE),          # den
    st.integers(min_value=-_WIDE, max_value=_WIDE),     # sx
    st.integers(min_value=0, max_value=_WIDE),          # sy
    st.integers(min_value=0, max_value=1_000_000),      # y
    st.integers(min_value=-50_000, max_value=50_000),   # xc
)
@settings(max_examples=120, deadline=None)
def test_residual_sign_double_expr_above_2_53(
    n, num, den, sx, sy, y, xc
) -> None:
    con = duckdb.connect()
    (got,) = con.execute(
        """
        SELECT CAST(? AS DOUBLE) * CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
             - CAST(? AS DOUBLE) * CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
             - CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
             + CAST(? AS DOUBLE) * CAST(? AS DOUBLE)
        """,
        [n, den, y, n, num, xc, den, sy, num, sx],
    ).fetchone()
    want = (
        float(n) * float(den) * float(y)
        - float(n) * float(num) * float(xc)
        - float(den) * float(sy)
        + float(num) * float(sx)
    )
    assert got == want or (got != got and want != want)


# ---------------------------------------------------------------------------
# 3. Milli-quantized TWA integer identities
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=560_210),      # v_milli
            st.integers(min_value=0, max_value=507_105_852),  # dur_ms
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_twa_divmod_reconstruction(pairs) -> None:
    s = sum(v * d for v, d in pairs)
    total = sum(d for _, d in pairs)
    assert abs(s) < 2**63 and total < 2**63
    if total == 0:
        return  # NULLIF path: both engines project NULL
    q, r = s // total, s % total
    assert q * total + r == s
    assert 0 <= r < total


def test_twa_divmod_duckdb_matches_python() -> None:
    con = duckdb.connect()
    cases = [(221_965_063_619_717, 2_275_500_027), (0, 58), (7, 7), (6, 7)]
    for s, t in cases:
        got = con.execute(
            "SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT), "
            "CAST(? AS BIGINT) % CAST(? AS BIGINT)",
            [s, t, s, t],
        ).fetchone()
        assert got == (s // t, s % t)
    # NULLIF guard: zero divisor yields NULL, not an error, on both engines
    got = con.execute(
        "SELECT CAST(0 AS BIGINT) // NULLIF(CAST(0 AS BIGINT), 0), "
        "CAST(0 AS BIGINT) % NULLIF(CAST(0 AS BIGINT), 0)"
    ).fetchone()
    assert got == (None, None)
