"""Schema registry — explicit StructTypes for every table the engine touches.

The reference declares schemas twice (SQLite DDL `data/transformation_db.py:18-85`,
BigQuery DDL `data/transformation_dw.py:6-120`) but lets in-flight pandas frames
infer types from CSV (`data/utils.py:38`) — the source of its rating-column
schema drift (SURVEY §1.4 Q2). This engine applies explicit schemas at read
time (`spark.read.schema(...)`); inference exists only behind an option.

Two families:
- TESTDATA: the driver's TPC-H-ish parquet tables (TESTDATA.md) used by the
  correctness/bench contract.
- Operational + mart: the reference's five source tables and eleven
  star-schema tables (FIXTURES.md), used by the pipeline builders in
  `plans/`.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


def _d(name: str) -> T.StructField:
    return T.StructField(name, T.DoubleType(), True)


def _l(name: str) -> T.StructField:
    return T.StructField(name, T.LongType(), True)


def _i(name: str) -> T.StructField:
    return T.StructField(name, T.IntegerType(), True)


def _ts(name: str) -> T.StructField:
    return T.StructField(name, T.TimestampType(), True)


# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md) — TPC-H-ish star schema + events stream table.
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([_i("r_regionkey"), _s("r_name")]),
    "nation": T.StructType([_i("n_nationkey"), _s("n_name"), _i("n_regionkey")]),
    "customer": T.StructType(
        [_l("c_custkey"), _s("c_name"), _i("c_nationkey"), _d("c_acctbal"), _s("c_mktsegment")]
    ),
    "supplier": T.StructType([_l("s_suppkey"), _s("s_name"), _i("s_nationkey"), _d("s_acctbal")]),
    "part": T.StructType(
        [_l("p_partkey"), _s("p_name"), _s("p_brand"), _s("p_type"), _i("p_size"), _d("p_retailprice")]
    ),
    "orders": T.StructType(
        [
            _l("o_orderkey"),
            _l("o_custkey"),
            _s("o_orderstatus"),
            _d("o_totalprice"),
            _ts("o_orderdate"),
            _s("o_orderpriority"),
        ]
    ),
    "lineitem": T.StructType(
        [
            _l("l_orderkey"),
            _l("l_partkey"),
            _l("l_suppkey"),
            _i("l_linenumber"),
            _d("l_quantity"),
            _d("l_extendedprice"),
            _d("l_discount"),
            _d("l_tax"),
            _s("l_returnflag"),
            _s("l_linestatus"),
            _ts("l_shipdate"),
        ]
    ),
    "events": T.StructType(
        [_l("event_id"), _ts("ts"), _l("user_id"), _s("event_type"), _d("value"), _s("props")]
    ),
    "documents": T.StructType([_l("doc_id"), _s("text"), _s("lang"), _s("source"), _l("n_chars")]),
    "embeddings": T.StructType(
        [
            _l("vec_id"),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            _i("label"),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


# ---------------------------------------------------------------------------
# Operational source tables — reference DDL `data/transformation_db.py:18-85`,
# column notes in FIXTURES.md. `reviews.rating` is carried through despite
# being absent from the reference's operational DDL: the mart's fact_maps
# requires it NOT NULL (`data/transformation_dw.py:78,249`; SURVEY §1.4 Q2).
# ---------------------------------------------------------------------------

OPERATIONAL_SCHEMAS: dict[str, T.StructType] = {
    # data/transformation_db.py:18-29
    "places": T.StructType(
        [
            _s("place_id"),
            _s("name"),
            _s("phone_number"),
            _s("opening_hours_text"),
            _s("types"),
            _d("lat"),
            _d("lng"),
            _d("rating_search"),
        ]
    ),
    # data/transformation_db.py:31-39 (+ rating, §1.4 Q2)
    "reviews": T.StructType(
        [
            _s("id_review"),
            _ts("timestamp_review"),
            _s("place_id"),
            _s("author_url"),
            _s("review_text"),
            _d("rating"),
        ]
    ),
    # data/transformation_db.py:41-52
    "tweets": T.StructType(
        [
            _s("id_tweet"),
            _s("place_id_source"),
            _s("keyword_search"),
            _ts("created_at_tweet"),
            _s("text_tweet"),
            _s("id_author_twitter"),
            _s("author_location"),
            _s("tweet_geo_place_id"),
        ]
    ),
    # data/transformation_db.py:54-68
    "pemasukan": T.StructType(
        [
            _s("id_transaksi_original"),
            _ts("timestamp"),
            _s("id_proyek"),
            _s("nama_proyek"),
            _s("sektor_pariwisata"),
            _s("id_penyumbang"),
            _s("nama_penyumbang"),
            _s("jenis_penyumbang"),
            _s("jenis_pemasukan"),
            _l("jumlah"),
            _s("bukti"),
        ]
    ),
    # data/transformation_db.py:70-85
    "pengeluaran": T.StructType(
        [
            _s("id_transaksi_original"),
            _ts("timestamp"),
            _s("id_proyek"),
            _s("nama_proyek"),
            _s("sektor_pariwisata"),
            _s("id_vendor"),
            _s("nama_vendor"),
            _s("id_departemen"),
            _s("nama_departemen"),
            _s("jenis_kebutuhan"),
            _l("jumlah"),
            _s("bukti"),
        ]
    ),
}

# Primary keys used by the keyed-dedup + incremental anti-join load
# (data/transformation_db.py:91-121, key map at :130-160).
OPERATIONAL_KEYS: dict[str, str] = {
    "places": "place_id",
    "reviews": "id_review",
    "tweets": "id_tweet",
    "pemasukan": "id_transaksi_original",
    "pengeluaran": "id_transaksi_original",
}


# ---------------------------------------------------------------------------
# Mart (star schema) — reference DDL `data/transformation_dw.py:6-120`.
# TIME has no stable Spark type → `jam` is an HH:mm:ss string (SURVEY §1.2).
# BIGNUMERIC money facts → DecimalType(38, 9).
# ---------------------------------------------------------------------------

_MONEY = T.DecimalType(38, 9)

MART_SCHEMAS: dict[str, T.StructType] = {
    # data/transformation_dw.py:11-20
    "dim_waktu": T.StructType(
        [
            _ts("timestamp_datetime"),
            _s("jam"),
            _s("hari"),
            T.StructField("tanggal", T.DateType(), True),
            _s("bulan"),
            _l("tahun"),
        ]
    ),
    # data/transformation_dw.py:21-32
    "dim_place": T.StructType(
        [
            _s("place_id"),
            _s("nama_tempat"),
            _d("latitude"),
            _d("longitude"),
            _s("tipe_tempat"),
            _s("kontak"),
            _s("jam_operasional"),
        ]
    ),
    # data/transformation_dw.py:33-39
    "dim_user": T.StructType([_s("id_user"), _s("lokasi_user")]),
    # data/transformation_dw.py:40-46
    "dim_vendor": T.StructType([_s("id_vendor"), _s("nama_vendor")]),
    # data/transformation_dw.py:47-53
    "dim_departemen": T.StructType([_s("id_departemen"), _s("nama_departemen")]),
    # data/transformation_dw.py:54-61
    "dim_proyek": T.StructType([_s("id_proyek"), _s("nama_proyek"), _s("sektor_pariwisata")]),
    # data/transformation_dw.py:62-69
    "dim_penyumbang": T.StructType([_s("id_penyumbang"), _s("nama_penyumbang"), _s("jenis_penyumbang")]),
    # data/transformation_dw.py:71-81
    "fact_maps": T.StructType(
        [
            _s("id_review"),
            _ts("timestamp_datetime"),
            _s("place_id"),
            _s("author_url"),
            _s("review_longtext"),
            _d("rating"),
        ]
    ),
    # data/transformation_dw.py:82-91
    "fact_twitter": T.StructType(
        [
            _s("id_tweet"),
            _ts("created_at_datetime"),
            _s("id_user"),
            _s("nama_lokasi"),
            _s("text_tweet"),
        ]
    ),
    # data/transformation_dw.py:92-104
    "fact_pengeluaran": T.StructType(
        [
            _s("id_transaksi"),
            _ts("timestamp_datetime"),
            _s("jenis_kebutuhan"),
            _s("id_vendor"),
            _s("id_departemen"),
            T.StructField("jumlah_pengeluaran", _MONEY, True),
            _s("bukti_pengeluaran"),
            _s("id_proyek"),
        ]
    ),
    # data/transformation_dw.py:105-116
    "fact_pemasukan": T.StructType(
        [
            _s("id_transaksi_income"),
            _ts("timestamp_datetime"),
            _s("jenis_pemasukan"),
            _s("id_penyumbang"),
            T.StructField("jumlah_pemasukan", _MONEY, True),
            _s("bukti_pemasukan"),
            _s("id_proyek"),
        ]
    ),
}
