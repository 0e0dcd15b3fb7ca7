"""Table scans and multi-file ingestion.

Reference behaviors re-expressed:

- Multi-file CSV scan + union (`data/utils.py:28-45`: list GCS blobs under a
  prefix, filter ``*.csv``, read each into pandas, ``pd.concat``) → a single
  glob scan. Spark's multi-file reader subsumes the loop-and-concat and
  parallelizes the read across executors; at 100 TB the file listing itself
  is distributed and the per-file work never touches the driver.
- Full table scan (`data/transformation_dw.py:130-133`: ``pd.read_sql_table``)
  → ``spark.read.parquet`` / ``spark.table`` — lazy, columnar, with column
  pruning and predicate pushdown handled by Catalyst.
- Single-column key scan (`data/transformation_db.py:109`:
  ``SELECT {id_column} FROM {table}``) → ``.select(key)``; the parquet scan
  reads exactly one column (check ``ReadSchema`` in the plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.schemas import TESTDATA_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver-testdata parquet table with its declared schema.

    Parquet is self-describing, so no schema is forced — but we validate
    against the registry to fail fast on drift instead of mid-query.

    The constructed (lazy) DataFrame is memoized per (session, path,
    file-stat): ``spark.read.parquet`` re-lists the path and re-reads a
    footer for the schema on EVERY call — pure driver-side metadata work
    that repeated ~1,500× across a bench run (optimization guide §6: table
    formats exist largely to cache exactly this). The cache holds only the
    unexecuted plan; every action still scans the parquet files, and the
    stat key (mtime, size) invalidates the entry if anyone rewrites the
    table in place. Invalidation scope (r12 ADVICE): exact for
    SINGLE-FILE tables (the driver testdata); for a parquet *directory*
    the stat only changes on file add/remove — an in-place rewrite of an
    existing part file keeps the directory stat, so directory tables are
    assumed immutable-once-written (the standard lakehouse contract;
    rewriters create new files).
    """
    # The driver testdata stores `ts` as parquet TIMESTAMP(NANOS); vanilla
    # Spark sessions reject that type outright (PARQUET_TYPE_ILLEGAL). The
    # legacy flag is a *runtime-settable* SQL conf, so set it here rather
    # than relying on the session builder (session.py) — callers (the
    # correctness driver, notebooks) routinely hand us their own session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp→string renderings (dim_waktu's jam/hari/bulan) must agree
    # with the UTC-naive DuckDB oracles under any caller session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        stat_key = (st.st_mtime_ns, st.st_size)
    except OSError:
        stat_key = None  # let spark.read raise its own (clearer) error
    cache = getattr(spark, "_sg_table_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._sg_table_cache = cache
        except AttributeError:  # session type forbids attributes — skip memo
            cache = None
    if cache is not None:
        hit = cache.get(path)
        if hit is not None and hit[0] == stat_key:
            return hit[1]
    df = spark.read.parquet(path)
    expected = TESTDATA_SCHEMAS.get(name)
    if expected is not None:
        got = {f.name: f.dataType for f in df.schema.fields}
        missing = set(expected.fieldNames()) - set(got)
        if missing:
            raise ValueError(f"table {name!r} at {sf_dir} is missing columns {sorted(missing)}")
        # TIMESTAMP(NANOS) parquet columns arrive differently per Spark
        # version/config: as long nanos under spark.sql.legacy.parquet
        # .nanosAsLong, or (Spark 4.1+) natively as TIMESTAMP_NTZ. Normalize
        # both to TimestampType so downstream event-time operators
        # (withWatermark, unix_micros, window) — which reject NTZ — work
        # under any caller session. Long path: integer µs division (floor —
        # matches DuckDB's nanos→micros truncation; `div` keeps it in int64,
        # a double division would lose precision above 2^53 ns). NTZ path:
        # plain cast — session tz is pinned to UTC above, so the wall-clock
        # is preserved and renders identically to the DuckDB oracles.
        fixes = {}
        for f in expected.fields:
            if not isinstance(f.dataType, T.TimestampType):
                continue
            if isinstance(got[f.name], T.LongType):
                fixes[f.name] = F.timestamp_micros(F.expr(f"{f.name} div 1000"))
            elif isinstance(got[f.name], T.TimestampNTZType):
                fixes[f.name] = F.col(f.name).cast(T.TimestampType())
        if fixes:
            df = df.withColumns(fixes)
    if cache is not None:
        cache[path] = (stat_key, df)
    return df


def read_csv_glob(
    spark: SparkSession,
    path_glob: str,
    schema: T.StructType,
    *,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    """One logical table from many files (reference `data/utils.py:28-45`).

    The reference lists blobs, filters ``.csv``, reads each file eagerly and
    concatenates on the driver — O(dataset) driver memory. Here the glob is
    pushed to the source: Spark plans one distributed scan over all matched
    files, and the explicit schema avoids the reference's inference drift
    (SURVEY §1.4 Q2). ``infer=True`` restores inference for exploration only.
    """
    reader = spark.read.option("header", str(header).lower())
    if infer:
        reader = reader.option("inferSchema", "true")
    else:
        reader = reader.schema(schema)
    # pathGlobFilter mirrors the reference's `.csv`-suffix filter (utils.py:35)
    return reader.option("pathGlobFilter", "*.csv").csv(path_glob)


def scan_keys(df: DataFrame, key: str) -> DataFrame:
    """SELECT key FROM t — the reference's existing-ids scan
    (`data/transformation_db.py:109`). Column pruning reaches the parquet
    footer: the scan reads exactly one column.
    """
    return df.select(key)
