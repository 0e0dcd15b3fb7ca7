"""Driver-contract smoke tests (SURVEY §5 t1/t2 shape)."""

from __future__ import annotations

import __spark_entry__ as contract


def test_entry_runs_and_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"timestamp_datetime", "jam", "hari", "tanggal", "bulan", "tahun"}


def test_every_oracle_key_has_a_query():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_all_queries_return_dataframes(spark, sf_dir):
    for key, fn in contract.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{key} returned no columns"


# q_empty_relation's contract IS the zero-row result (empty-relation
# propagation with schema preservation) — the one key allowed to be empty
_EMPTY_BY_DESIGN = {"q_empty_relation"}


def test_all_queries_nonempty(spark, sf_dir):
    for key, fn in contract.queries().items():
        if key in _EMPTY_BY_DESIGN:
            continue
        assert fn(spark, sf_dir).limit(1).count() > 0, f"{key} returned zero rows"
