"""E3 — operational tables → star schema (`data/transformation_dw.py:122-334`).

Eleven mart tables (7 dims + 4 facts), each a project→rename→NOT-NULL-
filter→dedup (→union / →join) chain over the five operational tables, per
the reference's build (with its quirks fixed by design):

- Q2: `reviews.rating` flows through to fact_maps (the reference's schema
  drift made this impossible).
- Q3: every dedup declares a deterministic tie-break (ascending non-key
  columns, NULLS FIRST — stated explicitly so the DuckDB oracle orders
  identically; DuckDB's ASC default is NULLS LAST).
- Q5: declared schemas make empty inputs well-typed.
- Q6: timestamps are UTC TimestampType before they get here.
- Q8: all loads are idempotent overwrites (sinks are the caller's concern;
  these builders return DataFrames).

Scale notes: the five source tables are cached by `build_mart` because
eleven sub-plans share them (the reference instead re-reads `places` from
the DB — `data/transformation_dw.py:265`). The one join (fact_twitter ⟕
dim-side places) broadcasts the projected dim. Everything else is
shuffle-free except the dedup exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_project_spark.functions.timefn import build_time_dimension
from etl_pipeline_project_spark.operators.dedup import dedup_keyed
from etl_pipeline_project_spark.operators.joins import left_enrich
from etl_pipeline_project_spark.operators.relational import drop_null_rows, rename_columns
from etl_pipeline_project_spark.operators.setops import union_all, union_single_column


def dim_waktu(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:136-153`: union the four timestamp
    columns, distinct non-null, derive jam/hari/tanggal/bulan/tahun."""
    all_ts = union_single_column(
        [
            (ops["reviews"], "timestamp_review"),
            (ops["tweets"], "created_at_tweet"),
            (ops["pemasukan"], "timestamp"),
            (ops["pengeluaran"], "timestamp"),
        ],
        "timestamp_datetime",
    )
    return build_time_dimension(all_ts.na.drop().distinct())


def dim_place(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:161-179`."""
    out = rename_columns(
        ops["places"],
        {
            "name": "nama_tempat",
            "lat": "latitude",
            "lng": "longitude",
            "phone_number": "nomor_telepon",
            "opening_hours_text": "jam_operasional",
            "types": "jenis_tempat",
        },
    ).select(
        "place_id", "nama_tempat", "latitude", "longitude",
        "nomor_telepon", "jam_operasional", "jenis_tempat",
    )
    out = drop_null_rows(out, subset=["place_id", "nama_tempat", "latitude", "longitude"])
    return dedup_keyed(out, "place_id", tiebreak=["nama_tempat", "latitude", "longitude"])


def dim_user(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:186-193`."""
    out = ops["tweets"].select(
        F.col("id_author_twitter").alias("id_user"),
        F.col("author_location").alias("lokasi_user"),
    )
    out = drop_null_rows(out, subset=["id_user"])
    return dedup_keyed(out, "id_user", tiebreak=[F.col("lokasi_user").asc_nulls_first()])


def dim_vendor(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:201-205`."""
    out = drop_null_rows(
        ops["pengeluaran"].select("id_vendor", "nama_vendor"), subset=["id_vendor"]
    )
    return dedup_keyed(out, "id_vendor", tiebreak=["nama_vendor"])


def dim_departemen(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:212-216`."""
    out = drop_null_rows(
        ops["pengeluaran"].select("id_departemen", "nama_departemen"), subset=["id_departemen"]
    )
    return dedup_keyed(out, "id_departemen", tiebreak=["nama_departemen"])


def dim_proyek(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:223-229`: union the project columns of
    both finance tables, dedup on id_proyek."""
    cols = ["id_proyek", "nama_proyek", "sektor_pariwisata"]
    out = union_all(ops["pemasukan"].select(*cols), ops["pengeluaran"].select(*cols))
    out = drop_null_rows(out, subset=["id_proyek"])
    return dedup_keyed(out, "id_proyek", tiebreak=["nama_proyek", "sektor_pariwisata"])


def dim_penyumbang(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:236-240`."""
    out = drop_null_rows(
        ops["pemasukan"].select("id_penyumbang", "nama_penyumbang", "jenis_penyumbang"),
        subset=["id_penyumbang"],
    )
    return dedup_keyed(out, "id_penyumbang", tiebreak=["nama_penyumbang", "jenis_penyumbang"])


def fact_maps(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:248-257` — carries `rating` (Q2 fix)."""
    out = ops["reviews"].select(
        "id_review", "timestamp_review", "place_id", "author_url", "review_text", "rating"
    )
    return drop_null_rows(
        out, subset=["id_review", "timestamp_review", "place_id", "review_text", "rating"]
    )


def fact_twitter(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:265-285`: tweets ⟕ places for the place
    name (broadcast dim), rename, NOT-NULL filter drops dangling FKs."""
    places_dim = ops["places"].select("place_id", F.col("name").alias("nama_tempat"))
    joined = left_enrich(
        ops["tweets"],
        places_dim,
        ops["tweets"]["place_id_source"] == places_dim["place_id"],
    ).drop("place_id")
    out = rename_columns(
        joined, {"place_id_source": "place_id", "id_author_twitter": "id_user"}
    ).select(
        "id_tweet", "created_at_tweet", "place_id", "nama_tempat",
        "id_user", "keyword_search", "text_tweet",
    )
    return drop_null_rows(
        out, subset=["id_tweet", "created_at_tweet", "place_id", "nama_tempat", "id_user"]
    )


def fact_pengeluaran(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:293-307` — money as DECIMAL(38,9)
    (BigQuery BIGNUMERIC twin, SURVEY §1.2)."""
    out = ops["pengeluaran"].select(
        F.col("id_transaksi_original").alias("id_transaksi"),
        "timestamp", "id_proyek", "id_vendor", "id_departemen", "jenis_kebutuhan",
        F.col("jumlah").cast("decimal(38,9)").alias("jumlah_pengeluaran"),
        F.col("bukti").alias("bukti_transaksi"),
    )
    return drop_null_rows(
        out,
        subset=["id_transaksi", "timestamp", "id_proyek", "id_vendor",
                "id_departemen", "jumlah_pengeluaran"],
    )


def fact_pemasukan(ops: dict[str, DataFrame]) -> DataFrame:
    """`data/transformation_dw.py:315-329`."""
    out = ops["pemasukan"].select(
        F.col("id_transaksi_original").alias("id_transaksi"),
        "timestamp", "id_proyek", "id_penyumbang", "jenis_pemasukan",
        F.col("jumlah").cast("decimal(38,9)").alias("jumlah_pemasukan"),
        F.col("bukti").alias("bukti_transaksi"),
    )
    return drop_null_rows(
        out,
        subset=["id_transaksi", "timestamp", "id_proyek", "id_penyumbang", "jumlah_pemasukan"],
    )


_BUILDERS = {
    "dim_waktu": dim_waktu,
    "dim_place": dim_place,
    "dim_user": dim_user,
    "dim_vendor": dim_vendor,
    "dim_departemen": dim_departemen,
    "dim_proyek": dim_proyek,
    "dim_penyumbang": dim_penyumbang,
    "fact_maps": fact_maps,
    "fact_twitter": fact_twitter,
    "fact_pengeluaran": fact_pengeluaran,
    "fact_pemasukan": fact_pemasukan,
}


def build_mart(ops: dict[str, DataFrame], *, cache_sources: bool = True) -> dict[str, DataFrame]:
    """All eleven mart tables. Sources are cached once — eleven consumers
    (the reference re-reads its inputs per table)."""
    if cache_sources:
        ops = {name: df.cache() for name, df in ops.items()}
    return {name: fn(ops) for name, fn in _BUILDERS.items()}
