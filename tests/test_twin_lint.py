"""CI gate for tools/twin_lint.py (round-5 verdict item 4).

Every ORACLE twin is statically scanned for the DuckDB-version-sensitive
surfaces that caused the q_time_weighted_avg driver hash-FAIL in rounds 4
and 5 (precision-overflowing decimal products, decimal floor-division,
scale-0 decimal ROUND). A new hit fails pytest, so the trap cannot be
reintroduced by a future twin.
"""

from __future__ import annotations

from tools.twin_lint import lint_all, lint_sql


def test_all_twins_version_stable() -> None:
    hits = lint_all()
    assert not hits, "version-sensitive twin SQL:\n" + "\n".join(hits)


def test_lint_catches_the_original_trap() -> None:
    """Regression self-test: the exact r4/r5 q_time_weighted_avg twin shape
    must be flagged, and the HUGEINT rewrite must pass clean."""
    trap = (
        "SELECT CAST(SUM(CAST(v_micro AS DECIMAL(38,0)) * "
        "date_diff('microsecond', ts, next_ts)) AS DECIMAL(24,0)) FROM t"
    )
    assert any(h.startswith("H1") for h in lint_sql("k", trap))
    fix = (
        "SELECT CAST(SUM(CAST(v_micro AS HUGEINT) * "
        "date_diff('microsecond', ts, next_ts)) AS DECIMAL(24,0)) FROM t"
    )
    assert not lint_sql("k", fix)


def test_lint_allows_known_good_patterns() -> None:
    # the _msum money pattern: ROUND over scale-10, outer cast to DOUBLE,
    # double * literal product — all version-stable
    msum = (
        "SELECT CAST(CAST(ROUND(SUM(CAST(v AS DECIMAL(38,10))), 2) "
        "AS DECIMAL(38,2)) AS DOUBLE) * 0.01 FROM t"
    )
    assert not lint_sql("k", msum)
    # integer and explicit-HUGEINT floor division are stable
    assert not lint_sql("k", "SELECT (rn - 1) * 10 // n FROM t")
    assert not lint_sql("k", "SELECT CAST(s AS HUGEINT) // total_us FROM t")


def test_lint_flags_decimal_floor_division() -> None:
    assert any(
        h.startswith("H2")
        for h in lint_sql("k", "SELECT CAST(s AS DECIMAL(20,0)) // n FROM t")
    )
