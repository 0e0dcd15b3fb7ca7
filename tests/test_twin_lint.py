"""CI gate for tools/twin_lint.py (round-5 verdict item 4, hardened in
round 7 per round-6 verdict item 4).

Every ORACLE twin is statically scanned for DuckDB-version-sensitive
surfaces: precision-overflowing decimal products (H1), scale-0 decimal
ROUND (H3), ANY HUGEINT (H4 — the r6 twin passed the old lint and still
failed the driver, so wide types are now banned outright), and floor-div/
modulo touching a wide operand (H6). The data-driven H5 magnitude scan
(run every twin on real parquet; flag wide projected types and >=2^63
values) is exercised here at sf0.001 so plain pytest drives it too; the
full sf0.1 sweep runs via ``python tools/twin_lint.py --magnitude-scan``.
"""

from __future__ import annotations

import os

from tools.twin_lint import lint_all, lint_sql, magnitude_scan

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_all_twins_version_stable() -> None:
    hits = lint_all()
    assert not hits, "version-sensitive twin SQL:\n" + "\n".join(hits)


def test_lint_catches_the_original_trap() -> None:
    """Regression self-test: the r4/r5 decimal-product twin shape and the
    r6 HUGEINT shape must BOTH be flagged; the r7 int64-only rewrite must
    pass clean."""
    trap_r45 = (
        "SELECT CAST(SUM(CAST(v_micro AS DECIMAL(38,0)) * "
        "date_diff('microsecond', ts, next_ts)) AS DECIMAL(24,0)) FROM t"
    )
    assert any(h.startswith("H1") for h in lint_sql("k", trap_r45))
    trap_r6 = (
        "SELECT CAST(SUM(CAST(v_micro AS HUGEINT) * "
        "date_diff('microsecond', ts, next_ts)) AS DECIMAL(24,0)) FROM t"
    )
    assert any(h.startswith("H4") for h in lint_sql("k", trap_r6))
    fix_r7 = (
        "SELECT CAST(SUM(v_milli * dur_ms) AS BIGINT) AS s, "
        "s // NULLIF(total_ms, 0) AS q, s % NULLIF(total_ms, 0) AS r FROM t"
    )
    assert not lint_sql("k", fix_r7)


def test_lint_allows_known_good_patterns() -> None:
    # the _msum money pattern: ROUND over scale-10, outer cast to DOUBLE,
    # double * literal product — all version-stable
    msum = (
        "SELECT CAST(CAST(ROUND(SUM(CAST(v AS DECIMAL(38,10))), 2) "
        "AS DECIMAL(38,2)) AS DOUBLE) * 0.01 FROM t"
    )
    assert not lint_sql("k", msum)
    # pure-integer floor division / modulo are the sanctioned forms
    assert not lint_sql("k", "SELECT (rn - 1) * 10 // n FROM t")
    assert not lint_sql("k", "SELECT o_orderkey % 100 FROM orders")
    # `%` inside string literals (LIKE patterns, strftime) never flags
    assert not lint_sql("k", "SELECT * FROM t WHERE s LIKE '%abc%'")
    assert not lint_sql("k", "SELECT strftime(ts, '%Y-%m') FROM t")


def test_lint_flags_wide_floor_division_and_modulo() -> None:
    # DECIMAL on the left of `//`
    assert any(
        h.startswith("H6")
        for h in lint_sql("k", "SELECT CAST(s AS DECIMAL(20,0)) // n FROM t")
    )
    # HUGEINT on the left of `//` (sanctioned pre-r7, banned now)
    assert any(
        h.startswith("H6")
        for h in lint_sql("k", "SELECT CAST(s AS HUGEINT) // total_us FROM t")
    )
    # wide cast on the RIGHT of `%`
    assert any(
        h.startswith("H6")
        for h in lint_sql("k", "SELECT s % CAST(n AS DECIMAL(20,0)) FROM t")
    )


def test_lint_flags_unordered_aggregates() -> None:
    """H7: a bare list()/string_agg() cell is order-unspecified even
    though the driver's row compare is order-insensitive."""
    assert any(
        h.startswith("H7")
        for h in lint_sql("k", "SELECT g, list(x) AS xs FROM t GROUP BY g")
    )
    assert any(
        h.startswith("H7")
        for h in lint_sql("k", "SELECT string_agg(x, ',') FROM t")
    )
    # sanctioned forms: internal ORDER BY, sort wrap (even through a
    # NULL-guarding COALESCE), and prose in -- comments
    assert not lint_sql("k", "SELECT list(x ORDER BY x) FROM t")
    assert not lint_sql("k", "SELECT list_sort(list_distinct(list(x))) FROM t")
    assert not lint_sql(
        "k", "SELECT list_sort(list_distinct(COALESCE(list(x) FILTER (y > 0), []))) FROM t"
    )
    assert not lint_sql("k", "SELECT 1 -- the list() aggregate is mentioned here\nFROM t")
    # the whitelist is per-key and per-function
    assert not lint_sql("q_boilerplate_strip", "SELECT coalesce(list(word), []) FROM t")
    assert any(
        h.startswith("H7")
        for h in lint_sql("q_boilerplate_strip", "SELECT string_agg(w, ' ') FROM t")
    )


def test_magnitude_scan_runs_clean_on_testdata() -> None:
    """H5 end-to-end at the small SF: no twin may fail to execute, project
    a wide type, or produce a >=2^63 magnitude. (Warnings — values in
    [2^53, 2^63) — are allowed; the expected ones today are the simhash64
    column and its pair-output aliases sh_a/sh_b
    (q_dedup_simhash_capped), each a verbatim 64-bit hash carried
    through unchanged, not arithmetic.)"""
    errors, warnings = magnitude_scan(SF_SMALL)
    assert not errors, "H5 magnitude errors:\n" + "\n".join(errors)
    # exact (key, column) exemptions — each a verbatim 64-bit hash
    # carried through unchanged, not arithmetic (structured tuples per
    # ADVICE r11: substring matching on warning text silently widened
    # the exemption to any column containing the token)
    allowed = {
        ("q_dedup_simhash", "simhash64"),
        ("q_dedup_simhash_capped", "sh_a"),
        ("q_dedup_simhash_capped", "sh_b"),
    }
    unexpected = [m for k, c, m in warnings if (k, c) not in allowed]
    assert not unexpected, "new H5 warnings:\n" + "\n".join(unexpected)
