"""Lakehouse-format and JDBC connectors — gated stubs.

This container ships no Delta/Iceberg jars and no JDBC drivers (per the
build environment: "Delta/Iceberg/Hudi need their jars on the classpath —
not in the v1 image; stub connectors behind an import-try"). The engine's
call sites are real; the gate raises a clear error listing the deploy-time
requirement instead of failing deep inside the JVM.

On a cluster with the jars present:
- `delta_table` / `write_delta` light up unchanged (delta-spark pip pkg +
  `io.delta:delta-spark` jar, configs
  ``spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension``).
- `merge_batch` in streaming/upsert.py collapses to a native
  ``DeltaTable.merge().whenNotMatchedInsertAll()``.
- `read_jdbc` needs the driver jar on ``spark.jars`` (e.g.
  ``org.postgresql:postgresql``) — it replaces the reference's
  ``pd.read_sql_table`` operational-store scans
  (`data/transformation_dw.py:130-133`) with a partitioned parallel read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake classes are on the session's classpath.

    Uses ``Class.forName`` — bare ``_jvm.io.delta...`` attribute access
    returns a silent JavaPackage stub even when the class is absent.
    """
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:  # noqa: BLE001
        return False


def write_delta(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Delta sink — ACID upserts/time-travel at 100 TB. Gated."""
    spark = df.sparkSession
    if not delta_available(spark):
        raise NotImplementedError(
            "Delta Lake jars not on the classpath in this environment; "
            "deploy with delta-spark to enable (parquet sinks in "
            "sources/sinks.py are the in-container equivalent)"
        )
    df.write.format("delta").mode(mode).save(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """Parallel JDBC scan (reference `pd.read_sql_table` twin). Requires
    the driver jar at deploy time; partitioned by ``partition_column`` so
    the read fans out across executors instead of a single connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # noqa: BLE001
        raise NotImplementedError(
            f"JDBC read failed — is the driver jar for {url.split(':')[1] if ':' in url else url} "
            f"on spark.jars? ({e})"
        ) from e


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module is usable as a data source
    (``org.apache.spark:spark-avro_2.13`` — not bundled with pyspark).

    Class.forName is NOT sufficient here: this container resolves
    ``o.a.s.sql.avro.AvroFileFormat`` yet the ServiceLoader registration
    is absent, so writes still fail with "Failed to find data source".
    The probe therefore asks Spark's own ``DataSource.lookupDataSource``
    — exactly the check the reader/writer performs."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def write_avro(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Avro sink — the row-oriented interchange format for Kafka/schema-
    registry pipelines. Gated on the spark-avro jar; probed per-session so
    the path lights up automatically in a container that ships the jar."""
    if not avro_available(df.sparkSession):
        raise NotImplementedError(
            "spark-avro jar not on the classpath in this environment; "
            "deploy with org.apache.spark:spark-avro to enable (parquet "
            "sinks in sources/sinks.py are the in-container equivalent)"
        )
    df.write.format("avro").mode(mode).save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source — gated like `write_avro`."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro jar not on the classpath in this environment; "
            "deploy with org.apache.spark:spark-avro to enable"
        )
    return spark.read.format("avro").load(path)
