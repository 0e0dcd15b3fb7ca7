"""Property-based test for the flagship time-dimension derivations
(functions/timefn.py, the reference's transformation_dw.py:136-153 chain)
against Python's datetime over generated timestamps.

The five derived columns (jam HH:mm:ss, hari English weekday, tanggal
date, bulan yyyy-MM, tahun year) must agree with the strftime reference
for arbitrary UTC instants — including month/year boundaries, leap days,
and pre-1970 instants (both Spark 4 and Python use the proleptic
Gregorian calendar)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pipeline_project_spark.functions.timefn import build_time_dimension

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# epoch seconds spanning 1931..2069, well past any 32-bit edge, plus the
# exact epoch and a leap-day instant as shrink targets
epochs = st.lists(
    st.integers(min_value=-1_230_000_000, max_value=3_130_000_000),
    min_size=1,
    max_size=12,
    unique=True,
)

SCHEMA = T.StructType([T.StructField("timestamp_datetime", T.TimestampType(), False)])


@given(secs=epochs)
@_SETTINGS
def test_time_dimension_matches_strftime(spark, secs):
    instants = [dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s) for s in secs]
    df = build_time_dimension(spark.createDataFrame([(t,) for t in instants], SCHEMA))
    got = {
        r["timestamp_datetime"]: (r["jam"], r["hari"], r["tanggal"], r["bulan"], r["tahun"])
        for r in df.collect()
    }
    assert set(got) == set(instants)
    for t in instants:
        assert got[t] == (
            t.strftime("%H:%M:%S"),
            ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")[t.weekday()],
            t.date(),
            f"{t.year:04d}-{t.month:02d}",
            t.year,
        )
