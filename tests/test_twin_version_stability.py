"""Demonstrates the q_time_weighted_avg twin's r4/r5 failure mechanism and
that the round-6 HUGEINT rewrite removes it (round-5 verdict items 1 and 8).

The driver's DuckDB converted the precision-overflowing
``DECIMAL(38,0) * BIGINT`` product to DOUBLE (newer-release behavior),
lossy above 2^53, while local DuckDB 1.0.0 clamped it — producing the
rows-pass/schema-pass/hash-FAIL signature two rounds running. A second
DuckDB version cannot be installed in this container (no pip), so instead
this test reproduces the newer-version semantics EXPLICITLY (accumulate
via DOUBLE) inside the local engine and shows:

1. the magnitudes in the actual testdata exceed 2^53, so the DOUBLE path
   genuinely diverges here (the mechanism is real at this SF, not
   hypothetical), and
2. the shipped HUGEINT twin is bit-identical to arbitrary-precision
   Python integer arithmetic over the same rows (no version-discretion
   surface remains).
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    yield c
    c.close()


_SEQ = """
  SELECT user_id, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v_micro, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
"""


def test_double_accumulation_diverges_above_2_53(con) -> None:
    """Newer DuckDB releases convert the precision-overflowing decimal
    product to DOUBLE; emulate that explicitly and verify it disagrees
    with exact HUGEINT arithmetic on the real testdata — i.e. the r4/r5
    driver hash-FAIL is fully explained by this mechanism."""
    row = con.execute(
        f"""
        WITH seq AS ({_SEQ}), agg AS (
          SELECT user_id,
            SUM(CAST(v_micro AS HUGEINT)
                * date_diff('microsecond', ts, next_ts)) AS s_exact,
            CAST(SUM(CAST(v_micro AS DOUBLE)
                * date_diff('microsecond', ts, next_ts)) AS HUGEINT) AS s_dbl
          FROM seq WHERE next_ts IS NOT NULL GROUP BY 1
        )
        SELECT count(*) AS n,
               count(*) FILTER (s_exact <> s_dbl) AS n_diverged,
               max(abs(s_exact)) AS max_s
        FROM agg
        """
    ).fetchone()
    n, n_diverged, max_s = row
    assert n > 0
    assert int(max_s) > 2**53, (
        "testdata magnitudes no longer exceed 2^53 — the mechanism test "
        "is vacuous at this SF; raise the SF or the quantization factor"
    )
    assert n_diverged > 0, (
        "DOUBLE-converted accumulation matched exact arithmetic — the "
        "mechanism this test documents has disappeared?"
    )


def test_hugeint_twin_matches_python_bigints(con) -> None:
    """The shipped twin accumulation (HUGEINT x BIGINT) must equal
    arbitrary-precision Python integers over the same rows — exact in
    every DuckDB release, no overflow/rounding discretion anywhere."""
    per_row = con.execute(
        f"""
        WITH seq AS ({_SEQ})
        SELECT user_id, v_micro,
               date_diff('microsecond', ts, next_ts) AS dur_us
        FROM seq WHERE next_ts IS NOT NULL
        """
    ).fetchall()
    expect: dict[str, int] = {}
    for user_id, v_micro, dur_us in per_row:
        expect[user_id] = expect.get(user_id, 0) + int(v_micro) * int(dur_us)

    got = dict(
        con.execute(
            f"""
            WITH seq AS ({_SEQ})
            SELECT user_id,
                   CAST(SUM(CAST(v_micro AS HUGEINT)
                       * date_diff('microsecond', ts, next_ts))
                     AS DECIMAL(24,0)) AS s
            FROM seq WHERE next_ts IS NOT NULL GROUP BY 1
            """
        ).fetchall()
    )
    assert {k: int(v) for k, v in got.items()} == expect
