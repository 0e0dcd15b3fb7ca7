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

Run: ``python tools/twin_lint.py`` (exit 1 on any hit). Also enforced by
``tests/test_twin_lint.py`` so plain pytest is the CI gate.
"""

from __future__ import annotations

import re
import sys

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


def lint_sql(key: str, sql: str) -> list[str]:
    hits: list[str] = []

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

    # H2 — floor division with a DECIMAL operand
    for m in re.finditer(r"//", sql):
        window = sql[max(0, m.start() - 120) : m.start()]
        # a decimal cast closing right before `//` (allow a chain of casts)
        seg = window.rstrip()
        if re.search(r"AS\s+DECIMAL\s*\(\s*\d+\s*,\s*\d+\s*\)\s*\)*$", seg, re.IGNORECASE):
            hits.append(
                f"H2 {key}: `//` applied to a DECIMAL operand — decimal "
                "floor-division semantics are version-sensitive; CAST to "
                "HUGEINT first."
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
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as contract

    hits: list[str] = []
    for key, sql in sorted(contract.oracle_sql().items()):
        hits.extend(lint_sql(key, sql))
    return hits


def main() -> int:
    hits = lint_all()
    for h in hits:
        print(h)
    import __spark_entry__ as contract

    n = len(contract.oracle_sql())
    print(f"twin_lint: {len(hits)} hit(s) across {n} twins")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
