"""Twin-SQL version-sensitivity lint (round-5 verdict item 4).

The q_time_weighted_avg driver hash-FAIL (rounds 4 and 5) came from a
DuckDB-version-dependent surface in the ORACLE twin, not the Spark side:
``DECIMAL(38,0) * BIGINT`` exceeds precision 38, and DuckDB's handling of
precision-overflowing decimal arithmetic changed across releases (clamp in
1.0.0, convert-to-DOUBLE — lossy above 2^53 — in newer versions). The
local twin passed while the driver's DuckDB diverged: invisible to every
local replay.

This lint statically scans every twin in ``oracle_sql()`` for the three
version-sensitive surfaces the round-5 verdict named, so the trap cannot
be reintroduced:

H1  decimal product whose RESULT precision exceeds 38
    (``CAST(x AS DECIMAL(p,s)) * y`` with p + p_other > 38; a non-decimal
    integer operand counts as DECIMAL(18,0) per DuckDB's binary-arithmetic
    promotion). Fix pattern: accumulate in HUGEINT, cast once at the end.
H2  ``//`` (floor division) with a DECIMAL operand — integer `//` and
    explicit-HUGEINT `//` are stable; decimal `//` semantics are not.
H3  ``ROUND`` applied directly to a scale-0 decimal — an implicit rescale
    with no fractional digits to round is a rewrite smell (the known-good
    ``_msum`` pattern rounds scale-10 decimals and is NOT flagged).

Round-7 additions (round-6 verdict item 4 — the r6 HUGEINT twin passed
the lint and still failed the driver, so the rules harden from "no
version-sensitive DECIMAL" to "no wide type at all"):

H4  ANY ``HUGEINT`` token in a twin. The r6 lesson: HUGEINT arithmetic is
    exact under every semantics observable against the single DuckDB
    pinned in this container, yet the driver's DuckDB still diverged —
    wide-type behavior is UNFALSIFIABLE locally, so it is banned outright.
    Rewrite pattern: quantize the inputs until every intermediate and
    every projected value fits BIGINT (see q_time_weighted_avg /
    q_dedup_simhash / q_model_score_broadcast, round 7).
H5  (data-driven, ``--magnitude-scan [sf_dir]``) run every twin against
    the committed parquet and flag any result column that (a) comes back
    with a HUGEINT/DECIMAL(p>18) type — an implicit wide projected
    surface the static rules can't see — or (b) holds an integer/decimal
    value with |v| ≥ 2^63, which PROVES wide arithmetic happened. Values
    in [2^53, 2^63) on integer columns are reported as warnings (any
    driver-side path through DOUBLE would corrupt them).
H6  ``//`` or ``%`` adjacent to a DECIMAL or HUGEINT cast — floor-div /
    modulo must only ever touch BIGINT operands (integer semantics are
    the only version-invariant ones).
H7  order-NONDETERMINISTIC aggregate — ``list()`` / ``array_agg()`` /
    ``string_agg()`` / ``group_concat()`` without an ORDER BY inside the
    call and without an enclosing ``list_sort``/``list_distinct``: the
    produced cell's element order is unspecified, so it can differ by
    DuckDB version/thread count even though the row-level compare is
    order-insensitive. Two audited exceptions are whitelisted per key
    (membership-only and constant-per-group uses).

Run: ``python tools/twin_lint.py`` (exit 1 on any static hit) or
``python tools/twin_lint.py --magnitude-scan /root/testdata/sf0.1``
(adds the H5 data scan; ~minutes at sf0.1). Also enforced by
``tests/test_twin_lint.py`` so plain pytest is the CI gate.
"""

from __future__ import annotations

import os
import re
import sys

# derive the repo root from this file's location (tools/..) so the lint
# works from any checkout path, matching tools/rotate.py
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DECIMAL_RE = re.compile(r"DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", re.IGNORECASE)

# DuckDB promotes integer operands of decimal arithmetic to decimals:
# TINYINT..BIGINT -> up to DECIMAL(18,0); HUGEINT is exempt (H1 fix path).
INT_OPERAND_PRECISION = 18
MAX_PRECISION = 38


def _matching_paren(sql: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx (-1 if unbalanced)."""
    depth = 0
    for i in range(open_idx, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _cast_target(sql: str, open_idx: int, close_idx: int) -> str:
    """The cast's OWN target type: the text after the last depth-1 `AS`
    inside CAST( body ) — nested casts sit at depth >= 2 and are skipped."""
    depth = 0
    last_as_end = -1
    i = open_idx
    while i <= close_idx:
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 1 and sql[i : i + 2].upper() == "AS" and (
            i + 2 > close_idx or not (sql[i + 2].isalnum() or sql[i + 2] == "_")
        ) and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")):
            last_as_end = i + 2
        i += 1
    if last_as_end < 0:
        return ""
    return sql[last_as_end:close_idx].strip()


def _cast_spans(sql: str):
    """Yield (start, end, precision, scale) for every CAST whose own
    target type is DECIMAL(p,s) — a CAST(... AS DOUBLE) wrapping an inner
    decimal cast is NOT a decimal span (its product type is DOUBLE)."""
    for m in re.finditer(r"\bCAST\s*\(", sql, re.IGNORECASE):
        open_idx = m.end() - 1
        close = _matching_paren(sql, open_idx)
        if close < 0:
            continue
        target = _cast_target(sql, open_idx, close)
        dm = re.match(r"DECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s*$", target, re.IGNORECASE)
        if dm:
            yield m.start(), close, int(dm.group(1)), int(dm.group(2))


def _adjacent_star(sql: str, start: int, end: int) -> bool:
    """True if the span [start, end] is an operand of a `*` product."""
    i = end + 1
    while i < len(sql) and sql[i] in " \n\t":
        i += 1
    if i < len(sql) and sql[i] == "*":
        return True
    j = start - 1
    while j >= 0 and sql[j] in " \n\t":
        j -= 1
    return j >= 0 and sql[j] == "*"


def _operand_precision_from_cast(sql: str, cast_kw_start: int) -> int:
    """Precision contributed by a CAST expression starting at cast_kw_start
    (the 'C' of CAST): its own target's precision if DECIMAL, 0 if HUGEINT
    (the sanctioned exact path), else the integer-promotion default."""
    m = re.match(r"CAST\s*\(", sql[cast_kw_start:], re.IGNORECASE)
    if not m:
        return INT_OPERAND_PRECISION
    open_idx = cast_kw_start + m.end() - 1
    close = _matching_paren(sql, open_idx)
    if close < 0:
        return INT_OPERAND_PRECISION
    target = _cast_target(sql, open_idx, close)
    dm = re.match(r"DECIMAL\s*\(\s*(\d+)\s*,", target, re.IGNORECASE)
    if dm:
        return int(dm.group(1))
    if re.match(r"HUGEINT\b", target, re.IGNORECASE):
        return 0
    return INT_OPERAND_PRECISION


def _other_operand_precision(sql: str, start: int, end: int) -> int:
    """Precision of the operand on the other side of the `*` (18 for a
    plain integer expression, its own p for a decimal cast, 0 for HUGEINT
    which is the sanctioned exact path)."""
    i = end + 1
    while i < len(sql) and sql[i] in " \n\t":
        i += 1
    if i < len(sql) and sql[i] == "*":
        j = i + 1
        while j < len(sql) and sql[j] in " \n\t":
            j += 1
        if sql[j : j + 4].upper() == "CAST":
            return _operand_precision_from_cast(sql, j)
        return INT_OPERAND_PRECISION
    # `*` on the left: find the expression ending just before it
    j = start - 1
    while j >= 0 and sql[j] in " \n\t":
        j -= 1
    # sql[j] == '*' here (caller guaranteed _adjacent_star); step left of it
    j -= 1
    while j >= 0 and sql[j] in " \n\t":
        j -= 1
    if j >= 0 and sql[j] == ")":
        # walk back to the matching '(' then check for a CAST keyword
        depth = 0
        k = j
        while k >= 0:
            if sql[k] == ")":
                depth += 1
            elif sql[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        lead = max(0, k - 10)
        kw = re.search(r"CAST\s*\($", sql[lead : k + 1], re.IGNORECASE)
        if kw:
            return _operand_precision_from_cast(sql, lead + kw.start())
    return INT_OPERAND_PRECISION


# H7 whitelist: unordered-aggregate call sites audited as order-safe.
# q_boilerplate_strip: list(word) is consumed ONLY via list_contains —
#   set membership, element order can't reach the projected surface.
# q_dedup_threshold_sweep: ANY_VALUE(n_docs) over a group where n_docs is
#   functionally determined by the group key (joined USING the key) —
#   every candidate value is identical.
H7_WHITELIST: dict[str, set[str]] = {
    "q_boilerplate_strip": {"list"},
    "q_dedup_threshold_sweep": {"any_value"},
}

_H7_AGGS = r"\b(list|array_agg|string_agg|group_concat|any_value|arbitrary)\s*\("


def lint_sql(key: str, sql: str) -> list[str]:
    hits: list[str] = []

    # H7 — order-nondeterministic aggregates (see module doc). Scan with
    # `--` line comments stripped (prose mentioning "list()" is not SQL).
    bare = re.sub(r"--[^\n]*", "", sql)
    for m in re.finditer(_H7_AGGS, bare, re.IGNORECASE):
        fn = m.group(1).lower()
        open_idx = bare.index("(", m.start())
        close_idx = _matching_paren(bare, open_idx)
        body = bare[open_idx : close_idx + 1] if close_idx > 0 else bare[open_idx:]
        if "ORDER BY" in body.upper():
            continue
        # an enclosing list_sort/list_distinct (possibly through a
        # NULL-guarding COALESCE) makes the order canonical downstream
        lead = bare[max(0, m.start() - 120) : m.start()].rstrip()
        while re.search(r"COALESCE\s*\($", lead, re.IGNORECASE):
            lead = re.sub(r"COALESCE\s*\($", "", lead, flags=re.IGNORECASE).rstrip()
        if re.search(r"(list_sort|list_distinct)\s*\($", lead, re.IGNORECASE):
            continue
        if fn in H7_WHITELIST.get(key, set()):
            continue
        hits.append(
            f"H7 {key}: {fn}(...) without ORDER BY or a list_sort/"
            "list_distinct wrap — element order is unspecified and can "
            "vary by DuckDB version/threads; sort it or whitelist with "
            "an audit note."
        )

    # H4 — any HUGEINT at all (round-7: banned outright, see module doc)
    if re.search(r"\bHUGEINT\b", sql, re.IGNORECASE):
        hits.append(
            f"H4 {key}: twin mentions HUGEINT — wide-type arithmetic is "
            "unfalsifiable against the single local DuckDB and has burned "
            "three driver rounds; quantize inputs until BIGINT suffices."
        )

    # H1 — decimal product exceeding precision 38
    for start, end, p, s in _cast_spans(sql):
        if _adjacent_star(sql, start, end):
            other = _other_operand_precision(sql, start, end)
            if other and p + other > MAX_PRECISION:
                hits.append(
                    f"H1 {key}: DECIMAL({p},{s}) product with a "
                    f"~DECIMAL({other}) operand -> result precision "
                    f"{p + other} > {MAX_PRECISION}; DuckDB's overflow "
                    "handling is version-dependent (clamp vs DOUBLE). "
                    "Accumulate in HUGEINT and cast once at the end."
                )

    # H2/H6 — floor division or modulo with a wide (DECIMAL/HUGEINT)
    # operand on either side. `%` inside string literals (LIKE patterns,
    # strftime formats) never sits adjacent to a wide cast, so the
    # adjacency test is naturally immune to those.
    wide_close = re.compile(
        r"AS\s+(DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)|HUGEINT)\s*\)*$", re.IGNORECASE
    )
    wide_open = re.compile(r"^\s*CAST\s*\((?:(?!AS\b).)*AS\s+(DECIMAL|HUGEINT)", re.IGNORECASE | re.DOTALL)
    for m in re.finditer(r"//|%", sql):
        op = m.group()
        before = sql[max(0, m.start() - 120) : m.start()].rstrip()
        after = sql[m.end() : m.end() + 120]
        if wide_close.search(before) or wide_open.match(after):
            hits.append(
                f"H6 {key}: `{op}` with a DECIMAL/HUGEINT operand — only "
                "pure-BIGINT floor-div/modulo is version-invariant; "
                "quantize the inputs until BIGINT suffices."
            )

    # H3 — ROUND whose first argument IS (at top level) a scale-0 decimal
    # cast: an implicit rescale with no fractional digits to round. A
    # DOUBLE expression that merely CONTAINS a nested decimal cast (the
    # _msum pattern) is fine and not flagged.
    for m in re.finditer(r"\bROUND\s*\(", sql, re.IGNORECASE):
        close = _matching_paren(sql, m.end() - 1)
        if close < 0:
            continue
        arg = sql[m.end() : close].strip()
        if arg.upper().startswith("CAST"):
            km = re.match(r"CAST\s*\(", arg, re.IGNORECASE)
            inner_close = _matching_paren(arg, km.end() - 1)
            if inner_close >= 0:
                target = _cast_target(arg, km.end() - 1, inner_close)
                dm = re.match(
                    r"DECIMAL\s*\(\s*(\d+)\s*,\s*0\s*\)", target, re.IGNORECASE
                )
                if dm:
                    hits.append(
                        f"H3 {key}: ROUND over a scale-0 "
                        f"DECIMAL({dm.group(1)},0) — an implicit rescale "
                        "with nothing to round; drop the ROUND or round "
                        "before narrowing."
                    )
    return hits


def lint_all() -> list[str]:
    sys.path.insert(0, REPO)
    import __spark_entry__ as contract

    hits: list[str] = []
    for key, sql in sorted(contract.oracle_sql().items()):
        hits.extend(lint_sql(key, sql))
    return hits


# H5 thresholds: beyond INT64_EDGE the value PROVES wide arithmetic; in
# [DOUBLE_EDGE, INT64_EDGE) an integer value would be corrupted by any
# driver-side transit through DOUBLE — warn so the headroom stays visible.
INT64_EDGE = 2**63
DOUBLE_EDGE = 2**53


def magnitude_scan(
    sf_dir: str, keys=None, timeout_sec: float | None = 120.0
) -> tuple[list[str], list[tuple[str, str | None, str]]]:
    """H5: execute every twin on DuckDB over `sf_dir` and inspect the
    RESULT — wide projected types and >=2^63 magnitudes are errors,
    integer values at [2^53, 2^63) are warnings. Warnings are structured
    ``(key, column, message)`` tuples (column None for timeout warnings)
    so the test allowlist can exempt exact (key, column) pairs instead
    of substring-matching message text (ADVICE r11). Catches implicit wide
    surfaces (e.g. a bare SUM(BIGINT) projecting HUGEINT) that the static
    rules can't see, driven by the committed data rather than analysis.

    `timeout_sec` caps each twin with con.interrupt (same mechanism as
    tools/duckdb_bench.py): the all-pairs twins are O(n²) by design and
    would run for hours at sf0.1 — a capped twin is reported as a warning
    and should be covered by a smaller-SF scan instead (pytest runs the
    full uncapped scan at sf0.001)."""
    import threading

    import duckdb

    sys.path.insert(0, REPO)
    import __spark_entry__ as contract
    from etl_pipeline_project_spark.schemas import TESTDATA_TABLES

    errors: list[str] = []
    warnings: list[tuple[str, str | None, str]] = []
    twins = contract.oracle_sql()

    def _mk_con():
        # one FRESH connection per twin: a timed-out probe's interrupt can
        # land after its fn() returns but before timer.cancel(), and a
        # pending interrupt on a SHARED connection would cancel the NEXT
        # twin's probe (round-7 ADVICE flake). A per-twin connection makes
        # any stale interrupt die with its connection.
        c = duckdb.connect()
        c.execute("SET threads TO 16")
        for t in TESTDATA_TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    def _capped(con, fn):
        timer = None
        if timeout_sec:
            timer = threading.Timer(timeout_sec, con.interrupt)
            timer.start()
        try:
            return fn()
        finally:
            if timer:
                timer.cancel()

    for key in sorted(keys or twins):
        sql = twins[key]
        con = _mk_con()
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t).upper() for t in rel.types]
        except Exception as exc:  # noqa: BLE001 - report, don't abort the sweep
            errors.append(f"H5 {key}: twin failed to execute: {exc}")
            con.close()
            continue
        probes = []
        for c, t in zip(cols, types):
            if "HUGEINT" in t or re.match(r"DECIMAL\((?:19|[2-9]\d)", t):
                errors.append(
                    f"H5 {key}: projected column {c} has wide type {t} — "
                    "an implicit wide surface (narrow the twin to BIGINT)."
                )
            if ("INT" in t and "INTERVAL" not in t) or t.startswith("DECIMAL"):
                probes.append(c)
        if not probes:
            con.close()
            continue
        sel = ", ".join(f'max(abs("{c}"))' for c in probes)
        try:
            row = _capped(
                con, lambda: con.sql(f"SELECT {sel} FROM ({sql})").fetchone()
            )
        except duckdb.InterruptException:
            warnings.append((
                key, None,
                f"H5-warn {key}: magnitude probe exceeded {timeout_sec}s at "
                f"{sf_dir} (O(n²)-by-design twin) — rely on the smaller-SF scan.",
            ))
            con.close()
            continue
        except Exception as exc:  # noqa: BLE001
            errors.append(f"H5 {key}: magnitude probe failed: {exc}")
            con.close()
            continue
        con.close()
        for c, v in zip(probes, row):
            if v is None:
                continue
            v = int(v)
            if v >= INT64_EDGE:
                errors.append(
                    f"H5 {key}: |{c}| reaches {v:.3e} >= 2^63 at this SF — "
                    "wide arithmetic happened; re-quantize."
                )
            elif v >= DOUBLE_EDGE:
                warnings.append((
                    key, c,
                    f"H5-warn {key}: |{c}| reaches {v:.3e} in [2^53, 2^63) "
                    "— exact today, but any DOUBLE transit would corrupt it.",
                ))
    return errors, warnings


def main() -> int:
    argv = sys.argv[1:]
    hits = lint_all()
    for h in hits:
        print(h)
    import __spark_entry__ as contract

    n = len(contract.oracle_sql())
    print(f"twin_lint: {len(hits)} static hit(s) across {n} twins")
    if "--magnitude-scan" in argv:
        i = argv.index("--magnitude-scan")
        sf_dir = (
            argv[i + 1]
            if i + 1 < len(argv) and not argv[i + 1].startswith("-")
            else "/root/testdata/sf0.1"
        )
        errors, warnings = magnitude_scan(sf_dir)
        for _, _, msg in warnings:
            print(msg)
        for e in errors:
            print(e)
        print(
            f"twin_lint H5 @ {sf_dir}: {len(errors)} error(s), "
            f"{len(warnings)} warning(s)"
        )
        hits.extend(errors)
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
