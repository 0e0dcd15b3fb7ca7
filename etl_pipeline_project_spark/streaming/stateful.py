"""Custom stateful streaming operator via applyInPandasWithState.

The engine's extension point for stateful logic the built-in operators
don't cover (SURVEY §2.H: watermark/dedup/window are built-ins; anything
else is ``applyInPandasWithState``). Demonstrated with a per-key running
aggregate: each micro-batch updates (count, sum) state per key and emits
the running totals — the streaming twin of a grouped aggregate, with the
state layout under our control (e.g. for decayed counters, top-k sketches,
or rate limiting, none of which groupBy can express).

State is bounded by key cardinality; production deployments add a timeout
(`GroupStateTimeout.ProcessingTimeTimeout`) to expire idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def stream_running_totals(stream: DataFrame) -> DataFrame:
    """Running (count, sum) per user over an events stream."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
