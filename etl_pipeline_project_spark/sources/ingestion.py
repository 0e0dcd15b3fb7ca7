"""Ingestion adapters: REST APIs and interactive manual entry.

Re-expresses the reference's two non-file sources (SURVEY §2.A):

- **REST connector** (`data/extraction.py`): Google Places text search
  (:14-19), Place Details + reviews (:28-71), Twitter recent search
  (:73-106). The reference flattens nested JSON and coalesce-merges
  detail-vs-search fields row by row in Python. Here the connector only
  *fetches and shapes* driver-side (unavoidable — the API is the driver's
  network edge); every transform — coalesce, surrogate keys, epoch
  normalization, list collapse, dedup — is a Catalyst expression applied
  after ``createDataFrame``, so the compute scales with executors, and the
  fetch layer is injectable for fixture-substitution testing (no network
  in CI, SURVEY §2.A note).
- **Manual-entry adapter** (`manual_tools/manual_finance_uploader.py`):
  builds validated one-record DataFrames for pemasukan/pengeluaran with
  the uploader's checks (strptime format :58-62, int amounts :90,103)
  expressed as schema casts.

The per-call result cap (``max_results=10``, `data/extraction.py:77-81`)
is a connector parameter — the LIMIT is pushed to the source.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.functions.keys import concat_key
from etl_pipeline_project_spark.functions.scalars import coalesce_first
from etl_pipeline_project_spark.schemas import OPERATIONAL_SCHEMAS

FetchFn = Callable[[str], list[dict]]

# Raw shapes as fetched (pre-coalesce): search and detail fields side by side
_RAW_PLACE_SCHEMA = T.StructType(
    [
        T.StructField("place_id", T.StringType()),
        T.StructField("name_detail", T.StringType()),
        T.StructField("name_search", T.StringType()),
        T.StructField("phone_number", T.StringType()),
        T.StructField("opening_hours", T.ArrayType(T.StringType())),
        T.StructField("types_detail", T.ArrayType(T.StringType())),
        T.StructField("types_search", T.ArrayType(T.StringType())),
        T.StructField("lat_detail", T.DoubleType()),
        T.StructField("lat_search", T.DoubleType()),
        T.StructField("lng_detail", T.DoubleType()),
        T.StructField("lng_search", T.DoubleType()),
        T.StructField("rating_search", T.DoubleType()),
    ]
)

_RAW_REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("place_id", T.StringType()),
        T.StructField("author_url", T.StringType()),
        T.StructField("time_epoch", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("rating", T.DoubleType()),
    ]
)


class RestIngestion:
    """REST → DataFrame connector with injectable fetchers.

    ``fetch_search`` / ``fetch_details`` stand in for the Places text
    search and Place Details HTTP calls; production wiring passes real
    HTTP clients, tests pass fixtures (the reference hard-codes
    ``requests.get`` — `data/extraction.py:18,38` — and is untestable
    offline).
    """

    def __init__(self, spark: SparkSession, fetch_search: FetchFn, fetch_details: FetchFn):
        self.spark = spark
        self.fetch_search = fetch_search
        self.fetch_details = fetch_details

    def _raw_rows(self, query: str) -> tuple[list[dict], list[dict]]:
        places, reviews = [], []
        seen: set[str] = set()  # `processed_place_ids` guard (extraction.py:120)
        for s in self.fetch_search(query):
            pid = s.get("place_id")
            if not pid or pid in seen:
                continue
            seen.add(pid)
            d = (self.fetch_details(pid) or [{}])[0]
            geo_s = (s.get("geometry") or {}).get("location") or {}
            geo_d = (d.get("geometry") or {}).get("location") or {}
            places.append(
                {
                    "place_id": pid,
                    "name_detail": d.get("name"),
                    "name_search": s.get("name"),
                    "phone_number": d.get("international_phone_number"),
                    "opening_hours": (d.get("opening_hours") or {}).get("weekday_text"),
                    "types_detail": d.get("types"),
                    "types_search": s.get("types"),
                    "lat_detail": geo_d.get("lat"),
                    "lat_search": geo_s.get("lat"),
                    "lng_detail": geo_d.get("lng"),
                    "lng_search": geo_s.get("lng"),
                    "rating_search": s.get("rating"),
                }
            )
            for r in d.get("reviews") or []:
                # field-presence guard (extraction.py:43)
                if r.get("time") is None or not r.get("author_url"):
                    continue
                reviews.append(
                    {
                        "place_id": pid,
                        "author_url": r["author_url"],
                        "time_epoch": int(r["time"]),
                        "text": r.get("text"),
                        "rating": float(r["rating"]) if r.get("rating") is not None else None,
                    }
                )
        return places, reviews

    def ingest_places(self, query: str) -> tuple[DataFrame, DataFrame]:
        """(places_df, reviews_df) in the operational schemas.

        The reference's row-wise Python becomes column expressions:
        detail-vs-search merge → ``coalesce`` (extraction.py:139-148),
        weekday list → ``" | "``-join (:59), types list → ``", "``-join
        (:66), review id → concat surrogate (:46), epoch → UTC timestamp
        (:50), seen-set dedup → ``dropDuplicates`` (:120).
        """
        raw_places, raw_reviews = self._raw_rows(query)
        pdf = self.spark.createDataFrame(raw_places, _RAW_PLACE_SCHEMA)
        places = pdf.select(
            "place_id",
            coalesce_first("name_detail", "name_search").alias("name"),
            F.col("phone_number"),
            F.array_join("opening_hours", " | ").alias("opening_hours_text"),
            F.array_join(coalesce_first("types_detail", "types_search"), ", ").alias("types"),
            coalesce_first("lat_detail", "lat_search").alias("lat"),
            coalesce_first("lng_detail", "lng_search").alias("lng"),
            F.col("rating_search"),
        ).dropDuplicates(["place_id"])

        rdf = self.spark.createDataFrame(raw_reviews, _RAW_REVIEW_SCHEMA)
        reviews = rdf.select(
            concat_key("place_id", "author_url", "time_epoch").alias("id_review"),
            F.timestamp_seconds("time_epoch").alias("timestamp_review"),
            F.col("place_id"),
            F.col("author_url"),
            F.col("text").alias("review_text"),
            F.col("rating"),
        ).dropDuplicates(["id_review"])
        return places, reviews


_MANUAL_TS_FORMAT = "%Y-%m-%d %H:%M:%S"


def manual_finance_record(
    spark: SparkSession,
    table: str,
    values: dict[str, object],
) -> DataFrame:
    """One validated finance record (`manual_tools/manual_finance_uploader.py:
    46-112`): timestamp must parse with the uploader's strptime format
    (:58-62), amounts are ints (:90,103), and the row lands in the declared
    operational schema — naive local timestamps are interpreted as UTC
    (SURVEY §1.4 Q6 normalization)."""
    if table not in ("pemasukan", "pengeluaran"):
        raise ValueError(f"unknown finance table {table!r}")
    schema = OPERATIONAL_SCHEMAS[table]
    row = dict(values)
    ts = row.get("timestamp")
    if isinstance(ts, str):
        row["timestamp"] = datetime.strptime(ts, _MANUAL_TS_FORMAT).replace(tzinfo=timezone.utc)
    if row.get("jumlah") is not None:
        row["jumlah"] = int(row["jumlah"])  # uploader's int() cast
    missing = {f.name for f in schema.fields} - set(row)
    for name in missing:
        row[name] = None
    return spark.createDataFrame([tuple(row[f.name] for f in schema.fields)], schema)


def ingest_batch(spark: SparkSession, records: Iterable[dict], table: str) -> DataFrame:
    """Batch form of the manual adapter: many records, one DataFrame."""
    schema = OPERATIONAL_SCHEMAS[table]
    rows = []
    for values in records:
        row = dict(values)
        ts = row.get("timestamp")
        if isinstance(ts, str):
            row["timestamp"] = datetime.strptime(ts, _MANUAL_TS_FORMAT).replace(
                tzinfo=timezone.utc
            )
        if row.get("jumlah") is not None:
            row["jumlah"] = int(row["jumlah"])
        rows.append(tuple(row.get(f.name) for f in schema.fields))
    return spark.createDataFrame(rows, schema)
