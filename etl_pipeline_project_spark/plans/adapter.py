"""Testdata→reference-shape adapter.

Derives the reference's five operational source tables (places, reviews,
tweets, pemasukan, pengeluaran — DDL `data/transformation_db.py:18-85`)
deterministically from the driver's TPC-H-ish parquet, complete with the
FIXTURES.md dirt profile: nulls in NOT-NULL mart columns, dangling FKs in
tweets.place_id_source, shared id_proyek across the two finance tables,
repeated dim keys.

Every derivation is a pure column expression mirrored 1:1 by the
``ADAPTER_CTE`` DuckDB SQL, so the *entire* star-schema pipeline built on
top (plans/mart.py, plans/operational.py) is differentially verifiable
against the oracle — the strongest parity evidence available for the
reference's E2+E3 flows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_project_spark.sources.readers import load_table


def _places(part: DataFrame) -> DataFrame:
    pk = F.col("p_partkey")
    return part.select(
        F.concat(F.lit("p_"), pk).alias("place_id"),
        F.when(pk % 37 == 0, F.lit(None)).otherwise(F.col("p_name")).alias("name"),
        F.when(pk % 11 == 0, F.lit(None)).otherwise(F.concat(F.lit("+62-"), pk)).alias(
            "phone_number"
        ),
        F.col("p_type").alias("opening_hours_text"),
        F.concat(F.col("p_brand"), F.lit(", "), F.col("p_type")).alias("types"),
        F.when(pk % 41 == 0, F.lit(None)).otherwise(F.col("p_size") * 1.5 - 6.2).alias("lat"),
        (F.col("p_retailprice") / 10.0).alias("lng"),
        ((pk % 50) / 10.0).alias("rating_search"),
    )


def _reviews(lineitem: DataFrame) -> DataFrame:
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    return lineitem.select(
        F.concat_ws("_", ok, F.col("l_linenumber"), pk, sk).alias("id_review"),
        F.when(pk % 43 == 0, F.lit(None)).otherwise(F.col("l_shipdate")).alias(
            "timestamp_review"
        ),
        F.concat(F.lit("p_"), pk).alias("place_id"),
        F.concat(F.lit("u_"), sk).alias("author_url"),
        F.when(ok % 29 == 0, F.lit(None))
        .otherwise(F.concat(F.col("l_returnflag"), F.lit(" "), F.col("l_linestatus")))
        .alias("review_text"),
        ((F.col("l_quantity").cast("long") % 5) + 1.0).alias("rating"),
    )


def _tweets(events: DataFrame) -> DataFrame:
    eid, uid = F.col("event_id"), F.col("user_id")
    return events.select(
        eid.cast("string").alias("id_tweet"),
        F.when(uid % 10 == 0, F.concat(F.lit("p_missing_"), uid))
        .otherwise(F.concat(F.lit("p_"), eid % 100 + 1))
        .alias("place_id_source"),
        F.col("event_type").alias("keyword_search"),
        F.when(eid % 53 == 0, F.lit(None)).otherwise(F.col("ts")).alias("created_at_tweet"),
        F.col("props").alias("text_tweet"),
        F.when(eid % 47 == 0, F.lit(None)).otherwise(F.concat(F.lit("a_"), uid)).alias(
            "id_author_twitter"
        ),
        F.when(uid % 7 == 0, F.lit(None)).otherwise(F.concat(F.lit("loc_"), uid % 20)).alias(
            "author_location"
        ),
        F.when(eid % 17 == 0, F.concat(F.lit("g_"), eid)).otherwise(F.lit(None)).alias(
            "tweet_geo_place_id"
        ),
    )


def _pemasukan(orders: DataFrame) -> DataFrame:
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    return orders.filter(ok % 2 == 0).select(
        F.concat(F.lit("in_"), ok).alias("id_transaksi_original"),
        F.col("o_orderdate").alias("timestamp"),
        F.concat(F.lit("proj_"), ck % 50).alias("id_proyek"),
        F.concat(F.lit("proyek "), ck % 50).alias("nama_proyek"),
        F.col("o_orderpriority").alias("sektor_pariwisata"),
        F.concat(F.lit("d_"), ck % 100).alias("id_penyumbang"),
        F.concat(F.lit("donor "), ck % 100).alias("nama_penyumbang"),
        F.col("o_orderstatus").alias("jenis_penyumbang"),
        F.when(ok % 3 == 0, F.lit("donasi"))
        .when(ok % 3 == 1, F.lit("tiket"))
        .otherwise(F.lit("sponsor"))
        .alias("jenis_pemasukan"),
        F.col("o_totalprice").cast("long").alias("jumlah"),
        F.when(ok % 13 == 0, F.lit(None)).otherwise(F.concat(F.lit("bukti_"), ok)).alias("bukti"),
    )


def _pengeluaran(orders: DataFrame) -> DataFrame:
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    return orders.filter(ok % 2 == 1).select(
        F.concat(F.lit("out_"), ok).alias("id_transaksi_original"),
        F.col("o_orderdate").alias("timestamp"),
        F.concat(F.lit("proj_"), ck % 50).alias("id_proyek"),
        F.concat(F.lit("proyek "), ck % 50).alias("nama_proyek"),
        F.col("o_orderpriority").alias("sektor_pariwisata"),
        F.concat(F.lit("v_"), ck % 40).alias("id_vendor"),
        F.concat(F.lit("vendor "), ck % 40).alias("nama_vendor"),
        F.concat(F.lit("dept_"), ck % 8).alias("id_departemen"),
        F.concat(F.lit("departemen "), ck % 8).alias("nama_departemen"),
        F.col("o_orderpriority").alias("jenis_kebutuhan"),
        F.col("o_totalprice").cast("long").alias("jumlah"),
        F.when(ok % 13 == 0, F.lit(None)).otherwise(F.concat(F.lit("bukti_"), ok)).alias("bukti"),
    )


def derive_reference_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The five operational tables, reference-shaped, from driver testdata."""
    return {
        "places": _places(load_table(spark, sf_dir, "part")),
        "reviews": _reviews(load_table(spark, sf_dir, "lineitem")),
        "tweets": _tweets(load_table(spark, sf_dir, "events")),
        "pemasukan": _pemasukan(load_table(spark, sf_dir, "orders")),
        "pengeluaran": _pengeluaran(load_table(spark, sf_dir, "orders")),
    }


# DuckDB twin of the adapter, kept expression-for-expression identical with
# the Spark derivations above. Prepend to every mart oracle query.
ADAPTER_CTE = """
WITH places AS (
  SELECT 'p_' || p_partkey AS place_id,
         CASE WHEN p_partkey % 37 = 0 THEN NULL ELSE p_name END AS name,
         CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE '+62-' || p_partkey END AS phone_number,
         p_type AS opening_hours_text,
         p_brand || ', ' || p_type AS types,
         -- e0 suffix: force DOUBLE literals (bare 1.5 is DECIMAL in DuckDB,
         -- which would compute exactly where Spark's double rounds)
         CASE WHEN p_partkey % 41 = 0 THEN NULL ELSE p_size * 1.5e0 - 6.2e0 END AS lat,
         p_retailprice / 10.0e0 AS lng,
         (p_partkey % 50) / 10.0e0 AS rating_search
  FROM part
), reviews AS (
  SELECT concat_ws('_', l_orderkey, l_linenumber, l_partkey, l_suppkey) AS id_review,
         CASE WHEN l_partkey % 43 = 0 THEN NULL ELSE l_shipdate END AS timestamp_review,
         'p_' || l_partkey AS place_id,
         'u_' || l_suppkey AS author_url,
         CASE WHEN l_orderkey % 29 = 0 THEN NULL
              ELSE l_returnflag || ' ' || l_linestatus END AS review_text,
         (CAST(l_quantity AS BIGINT) % 5) + 1.0e0 AS rating
  FROM lineitem
), tweets AS (
  SELECT CAST(event_id AS VARCHAR) AS id_tweet,
         CASE WHEN user_id % 10 = 0 THEN 'p_missing_' || user_id
              ELSE 'p_' || (event_id % 100 + 1) END AS place_id_source,
         event_type AS keyword_search,
         CASE WHEN event_id % 53 = 0 THEN NULL ELSE ts END AS created_at_tweet,
         props AS text_tweet,
         CASE WHEN event_id % 47 = 0 THEN NULL ELSE 'a_' || user_id END AS id_author_twitter,
         CASE WHEN user_id % 7 = 0 THEN NULL ELSE 'loc_' || (user_id % 20) END AS author_location,
         CASE WHEN event_id % 17 = 0 THEN 'g_' || event_id ELSE NULL END AS tweet_geo_place_id
  FROM events
), pemasukan AS (
  SELECT 'in_' || o_orderkey AS id_transaksi_original,
         o_orderdate AS "timestamp",
         'proj_' || (o_custkey % 50) AS id_proyek,
         'proyek ' || (o_custkey % 50) AS nama_proyek,
         o_orderpriority AS sektor_pariwisata,
         'd_' || (o_custkey % 100) AS id_penyumbang,
         'donor ' || (o_custkey % 100) AS nama_penyumbang,
         o_orderstatus AS jenis_penyumbang,
         CASE WHEN o_orderkey % 3 = 0 THEN 'donasi'
              WHEN o_orderkey % 3 = 1 THEN 'tiket'
              ELSE 'sponsor' END AS jenis_pemasukan,
         CAST(TRUNC(o_totalprice) AS BIGINT) AS jumlah,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE 'bukti_' || o_orderkey END AS bukti
  FROM orders WHERE o_orderkey % 2 = 0
), pengeluaran AS (
  SELECT 'out_' || o_orderkey AS id_transaksi_original,
         o_orderdate AS "timestamp",
         'proj_' || (o_custkey % 50) AS id_proyek,
         'proyek ' || (o_custkey % 50) AS nama_proyek,
         o_orderpriority AS sektor_pariwisata,
         'v_' || (o_custkey % 40) AS id_vendor,
         'vendor ' || (o_custkey % 40) AS nama_vendor,
         'dept_' || (o_custkey % 8) AS id_departemen,
         'departemen ' || (o_custkey % 8) AS nama_departemen,
         o_orderpriority AS jenis_kebutuhan,
         CAST(TRUNC(o_totalprice) AS BIGINT) AS jumlah,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE 'bukti_' || o_orderkey END AS bukti
  FROM orders WHERE o_orderkey % 2 = 1
)
"""
