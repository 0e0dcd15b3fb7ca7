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
