"""Custom Python DataSource (Spark 4 DataSource API) — the engine's
extension point for REST-like paged sources.

The reference ingests from paged HTTP APIs by looping pages in driver
Python and concatenating DataFrames (`data/extraction.py:108-180`). The
Spark-4 Python DataSource API is the distributed re-expression: the
planner asks the source for `partitions()` (one per page/shard) and each
executor pulls its own partition through `read()` — the driver never
touches row data, and a 10⁶-page crawl fans out across the cluster
exactly like a parquet scan.

The in-container source below is deterministic synthetic "pages" (no
network in the test environment): ids are sharded into contiguous
partitions, and every derived column is pure integer arithmetic so a SQL
oracle can reproduce it exactly. A real REST deployment swaps `read()`'s
loop body for the page fetch; everything else (schema declaration,
partition planning, pushed options) is the production shape.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import LongType, StructField, StructType


class PagedNumbersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", "1000"))
        self.parts = int(options.get("parts", "8"))

    def partitions(self):
        # one InputPartition per "page": the planner schedules these across
        # executors — the distributed replacement for the reference's
        # driver-side pagination loop
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        i = partition.value
        per = self.n // self.parts
        lo = i * per
        hi = (i + 1) * per if i < self.parts - 1 else self.n
        for x in range(lo, hi):
            # deterministic page payload: pure integer arithmetic
            yield (x, x % 7, (x * x) % 101)


class PagedNumbersSource(DataSource):
    """`spark.read.format("pagednumbers")` after registration."""

    @classmethod
    def name(cls) -> str:
        return "pagednumbers"

    def schema(self):
        return StructType(
            [
                StructField("id", LongType()),
                StructField("mod7", LongType()),
                StructField("score", LongType()),
            ]
        )

    def reader(self, schema):
        return PagedNumbersReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(PagedNumbersSource)


# ---------------------------------------------------------------------------
# Streaming half of the Python DataSource API (Spark 4): an offset-tracked
# synthetic stream with the Kafka-shaped contract — initialOffset / read /
# readBetweenOffsets — so the engine's checkpoint machinery gives
# exactly-once across restarts for a PYTHON source. A real deployment swaps
# read()'s range loop for a poll of the upstream cursor (REST page token,
# Kafka offset, CDC LSN); the offset bookkeeping is the production shape.
# ---------------------------------------------------------------------------

try:  # SimpleDataSourceStreamReader needs Spark 4.x
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class CounterStreamReader(SimpleDataSourceStreamReader):
        """Each micro-batch advances the offset by ``step`` ids until
        ``total`` — deterministic payload, so the drained stream carries a
        full SQL oracle."""

        def __init__(self, options: dict):
            self.step = int(options.get("step", "250"))
            self.total = int(options.get("total", "1000"))

        def initialOffset(self):
            return {"offset": 0}

        def _rows(self, lo: int, hi: int):
            return iter([(x, x % 7, (x * x) % 101) for x in range(lo, hi)])

        def read(self, start):
            s = start["offset"]
            e = min(s + self.step, self.total)
            return self._rows(s, e), {"offset": e}

        def readBetweenOffsets(self, start, end):
            # exact replay between committed offsets — what makes a crash
            # between prepare and commit recoverable without duplicates
            return self._rows(start["offset"], end["offset"])

    class PagedNumbersStreamSource(DataSource):
        """`spark.readStream.format("pagednumbers_stream")` after
        registration."""

        @classmethod
        def name(cls) -> str:
            return "pagednumbers_stream"

        def schema(self):
            return StructType(
                [
                    StructField("id", LongType()),
                    StructField("mod7", LongType()),
                    StructField("score", LongType()),
                ]
            )

        def simpleStreamReader(self, schema):
            return CounterStreamReader(self.options)

except ImportError:  # pragma: no cover - pre-4.x runtimes
    PagedNumbersStreamSource = None


def register_stream(spark) -> None:
    """Idempotent registration of the streaming source."""
    if PagedNumbersStreamSource is None:
        raise NotImplementedError(
            "SimpleDataSourceStreamReader requires Spark 4.x"
        )
    spark.dataSource.register(PagedNumbersStreamSource)
