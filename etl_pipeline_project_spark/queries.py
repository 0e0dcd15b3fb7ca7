"""Driver-contract query registry.

One entry per operator from SURVEY.md §2: ``REGISTRY[key]`` is a
``(spark, sf_dir) -> DataFrame`` callable exercising the operator on the
driver testdata, and ``ORACLE[key]`` (where present) is the equivalent
DuckDB SQL over the same parquet tables. Keys without an oracle are
rows-only checks (sinks, streaming, UDF demonstrations).

Cross-engine determinism rules (SURVEY §5 t2):
- every computed column is aliased identically on both sides;
- double aggregates accumulate in DECIMAL(38,10) then cast to double —
  exact, order-independent, so distributed partial aggregation cannot
  produce run-to-run or engine-to-engine drift;
- dedup/top-k declare full tie-break orderings (SURVEY §1.4 Q3);
- session timezone is UTC on the Spark side (SURVEY §1.4 Q6); all
  timestamps stay naive-UTC in DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_project_spark.functions.keys import concat_key, hash_key
from etl_pipeline_project_spark.functions.scalars import array_join_col, coalesce_first
from etl_pipeline_project_spark.functions.timefn import (
    build_time_dimension,
    parse_timestamp,
)
from etl_pipeline_project_spark.operators.aggregates import (
    count_distinct_by,
    exact_sum,
    money_sum,
    rollup_by,
    windowed_daily,
)
from etl_pipeline_project_spark.operators.dedup import dedup_keyed, distinct_values
from etl_pipeline_project_spark.operators.history import cdc_latest, scd2_versions
from etl_pipeline_project_spark.operators.joins import anti_incremental, fuzzy_match, left_enrich
from etl_pipeline_project_spark.operators.profiling import dq_violations, profile_columns
from etl_pipeline_project_spark.operators.relational import (
    drop_null_rows,
    rename_columns,
    select_existing,
)
from etl_pipeline_project_spark.operators.setops import union_all, union_single_column
from etl_pipeline_project_spark.operators.windows import sort_limit, topk_per_group
from etl_pipeline_project_spark.sources.readers import load_table, scan_keys

QueryFn = Callable[[SparkSession, str], DataFrame]


def _msum(expr: str) -> str:
    """DuckDB twin of ``operators.aggregates.money_sum`` — exact decimal
    accumulation, round to cents, narrow before the double cast (wide-scale
    int128→double conversion differs from the JVM by 1 ULP)."""
    return f"CAST(CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE)"

REGISTRY: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def _q(key: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[key] = fn
        if oracle is not None:
            ORACLE[key] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# §2.A — scans
# ---------------------------------------------------------------------------


@_q("q_scan_table", "SELECT * FROM region")
def q_scan_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (`data/transformation_dw.py:130-133`)."""
    return load_table(spark, sf_dir, "region")


@_q(
    "q_scan_union_files",
    """
    SELECT * FROM lineitem WHERE l_linenumber <= 3
    UNION ALL
    SELECT * FROM lineitem WHERE l_linenumber > 3
    """,
)
def q_scan_union_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file scan + union-all (`data/utils.py:28-45`). Testdata analog:
    two filtered halves re-unioned by name."""
    li = load_table(spark, sf_dir, "lineitem")
    return union_all(li.filter(F.col("l_linenumber") <= 3), li.filter(F.col("l_linenumber") > 3))


@_q("q_scan_project_ids", "SELECT o_orderkey FROM orders")
def q_scan_project_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-column key scan (`data/transformation_db.py:109`); column
    pruning reaches the parquet reader (ReadSchema shows one column)."""
    return scan_keys(load_table(spark, sf_dir, "orders"), "o_orderkey")


# ---------------------------------------------------------------------------
# §2.B — projections / renames / filters
# ---------------------------------------------------------------------------


@_q("q_project_select", "SELECT c_custkey, c_name, c_mktsegment FROM customer")
def q_project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant projection (`data/transformation_db.py:104-105`) — the
    requested-but-absent column is silently skipped."""
    cust = load_table(spark, sf_dir, "customer")
    return select_existing(cust, ["c_custkey", "c_name", "c_mktsegment", "c_phone_missing"])


@_q(
    "q_rename_cols",
    """
    SELECT l_orderkey AS orderkey, l_partkey AS partkey,
           l_quantity AS quantity, l_extendedprice AS price
    FROM lineitem
    """,
)
def q_rename_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk rename (`data/transformation_db.py:100-101,133-139`)."""
    li = load_table(spark, sf_dir, "lineitem")
    renamed = rename_columns(
        li,
        {
            "l_orderkey": "orderkey",
            "l_partkey": "partkey",
            "l_quantity": "quantity",
            "l_extendedprice": "price",
            "not_a_column": "ignored",
        },
    )
    return renamed.select("orderkey", "partkey", "quantity", "price")


@_q(
    "q_filter_notnull",
    "SELECT event_id, ts, event_type, value, props FROM events "
    "WHERE props IS NOT NULL AND value IS NOT NULL",
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-NULL enforcement (`data/transformation_dw.py:153,175-177,...`)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value", "props")
    return drop_null_rows(ev, subset=["props", "value"])


@_q(
    "q_filter_predicate",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row predicate (`data/extraction.py:43`; `data/utils.py:35`). The
    conjunctive filter is pushed to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate").filter(
        (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )


# ---------------------------------------------------------------------------
# §2.C — joins
# ---------------------------------------------------------------------------


@_q(
    "q_join_left_equi",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name AS customer_name
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_left_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⟕dim enrichment (`data/transformation_dw.py:266-271`), dim side
    broadcast — no shuffle of the fact table at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = left_enrich(
        orders,
        cust.select(F.col("c_custkey"), F.col("c_name").alias("customer_name")),
        orders["o_custkey"] == F.col("c_custkey"),
    )
    return joined.select("o_orderkey", "o_custkey", "o_totalprice", "customer_name")


@_q(
    "q_join_anti_incremental",
    """
    SELECT o.* FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders e
      WHERE e.o_orderdate < TIMESTAMP '1998-01-01' AND e.o_orderkey = o.o_orderkey
    )
    """,
)
def q_join_anti_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental 'only new keys' load (`data/transformation_db.py:109-113`)
    as a true left_anti join — replaces the reference's driver-memory id set
    (SURVEY §1.4 Q7)."""
    orders = load_table(spark, sf_dir, "orders")
    already_loaded = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    return anti_incremental(orders, already_loaded, "o_orderkey")


# ---------------------------------------------------------------------------
# §2.D — dedup / distinct
# ---------------------------------------------------------------------------


@_q(
    "q_dedup_keyed",
    """
    SELECT * FROM lineitem
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
    ) = 1
    """,
)
def q_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-key dedup (`data/transformation_db.py:97` et al.) in the
    deterministic row_number form (SURVEY §1.4 Q3): 'first' is declared by a
    *total* tie-break order — (linenumber, partkey, suppkey) is unique within
    an order in the testdata; a partial order would leave survivor choice to
    the engine."""
    li = load_table(spark, sf_dir, "lineitem")
    return dedup_keyed(li, "l_orderkey", tiebreak=["l_linenumber", "l_partkey", "l_suppkey"])


@_q(
    "q_distinct_values",
    "SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL",
)
def q_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct non-null scalar set (`data/transformation_dw.py:144`)."""
    return distinct_values(load_table(spark, sf_dir, "customer"), "c_mktsegment")


# ---------------------------------------------------------------------------
# §2.E — set operations
# ---------------------------------------------------------------------------


@_q(
    "q_union_all",
    """
    SELECT c_custkey AS entity_id, c_name AS entity_name, 'customer' AS entity_kind
    FROM customer
    UNION ALL
    SELECT s_suppkey, s_name, 'supplier' FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of homogeneous tables (`data/utils.py:44`;
    `data/transformation_dw.py:223-226`)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("entity_kind"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("entity_kind"),
    )
    return union_all(cust, supp)


# ---------------------------------------------------------------------------
# §2.F — scalar functions
# ---------------------------------------------------------------------------

_TIME_DIM_ORACLE = """
WITH all_ts AS (
  SELECT o_orderdate AS ts FROM orders
  UNION ALL SELECT l_shipdate FROM lineitem
  UNION ALL SELECT ts FROM events
), d AS (SELECT DISTINCT ts FROM all_ts WHERE ts IS NOT NULL)
SELECT ts AS timestamp_datetime,
       strftime(ts, '%H:%M:%S') AS jam,
       dayname(ts) AS hari,
       CAST(ts AS DATE) AS tanggal,
       strftime(ts, '%Y-%m') AS bulan,
       year(ts) AS tahun
FROM d
"""


@_q("q_time_dimension", _TIME_DIM_ORACLE)
def q_time_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the dim_waktu build (`data/transformation_dw.py:136-153`) —
    union timestamp columns of three tables, distinct non-null, derive
    time-of-day / weekday / date / year-month / year."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    all_ts = union_single_column(
        [(orders, "o_orderdate"), (li, "l_shipdate"), (ev, "ts")], "timestamp_datetime"
    )
    return build_time_dimension(all_ts.na.drop().distinct())


@_q(
    "q_ts_parse",
    """
    SELECT event_id,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_parsed,
           make_timestamp(user_id * 1000000) AS ts_from_epoch
    FROM events
    """,
)
def q_ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp parse/normalize (`data/transformation_dw.py:143`;
    `data/extraction.py:50`): string→timestamp roundtrip at seconds
    precision + epoch→UTC timestamp."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        parse_timestamp(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_parsed"
        ),
        F.timestamp_micros(F.col("user_id") * 1000000).alias("ts_from_epoch"),
    )


@_q(
    "q_concat_key",
    """
    SELECT l_orderkey, l_linenumber,
           concat_ws('_', l_orderkey, l_partkey, l_linenumber) AS surrogate_key
    FROM lineitem
    """,
)
def q_concat_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat surrogate key (`data/extraction.py:46`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        concat_key("l_orderkey", "l_partkey", "l_linenumber").alias("surrogate_key"),
    )


@_q(
    "q_hash_key",
    """
    SELECT l_orderkey, l_linenumber,
           sha256(concat_ws('_', l_orderkey, l_partkey, l_linenumber)) AS hashed_key
    FROM lineitem
    """,
)
def q_hash_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sha-256 key the reference intended (SURVEY §1.4 Q4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        hash_key("l_orderkey", "l_partkey", "l_linenumber").alias("hashed_key"),
    )


@_q(
    "q_string_join_array",
    """
    SELECT p_partkey,
           array_to_string(string_split(p_type, ' '), ' | ') AS type_joined
    FROM part
    """,
)
def q_string_join_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List→delimited string collapse (`data/extraction.py:59,66,144`):
    split/join round-trip over the part type tags."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", array_join_col(F.split(F.col("p_type"), " "), " | ").alias("type_joined")
    )


@_q(
    "q_coalesce",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), c_name) AS merged
    FROM customer
    """,
)
def q_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-non-null source merge (`data/extraction.py:139-148`) — true SQL
    coalesce, not Python-`or` (divergence documented in SURVEY §2.F)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        coalesce_first(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.col("c_name")).alias(
            "merged"
        ),
    )


@_q(
    "q_cast_types",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS orderkey_str,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS totalprice_int,
           strftime(o_orderdate, '%Y%m%d') AS order_yyyymmdd
    FROM orders
    """,
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts (`manual_tools/manual_finance_uploader.py:90,103`;
    `data/extraction.py:97,102`; `data/utils.py:15`). double→long is
    truncation toward zero on both sides."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").cast("string").alias("orderkey_str"),
        F.col("o_totalprice").cast("long").alias("totalprice_int"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("order_yyyymmdd"),
    )


@_q(
    "q_conditional_expr",
    """
    SELECT event_id,
           CASE WHEN value > 100 THEN 'high'
                WHEN value > 10 THEN 'mid'
                ELSE 'low' END AS value_band,
           CASE WHEN props IS NOT NULL THEN upper(event_type) ELSE NULL END AS typ
    FROM events
    """,
)
def q_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe conditional projection (`data/extraction.py:100,103,104`)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") > 100, "high")
        .when(F.col("value") > 10, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.when(F.col("props").isNotNull(), F.upper("event_type"))
        .otherwise(F.lit(None).cast("string"))
        .alias("typ"),
    )


# ---------------------------------------------------------------------------
# §2.G — aggregations / windows / sort (engine extensions over the mart)
# ---------------------------------------------------------------------------


@_q(
    "q_agg_sum_by_dim",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_msum('l_quantity')} AS sum_qty,
           {_msum('l_extendedprice * (1 - l_discount)')} AS sum_revenue,
           {_msum('l_quantity')} / COUNT(*) AS avg_l_quantity,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_sum_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped SUM/AVG/COUNT of fact amounts (TPC-H-Q1-shaped; motivated by
    the money facts `data/transformation_dw.py:92-116`). Decimal-exact
    accumulation; partial+final hash agg."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(qty).alias("sum_qty"),
        money_sum(rev).alias("sum_revenue"),
        (money_sum(qty) / F.count(F.lit(1))).alias("avg_l_quantity"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_q(
    "q_agg_rollup",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           {_msum('o_totalprice')} AS total,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_o_orderpriority
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a dim hierarchy (`data/transformation_dw.py:47-61`
    motivates proyek→departemen subtotals)."""
    orders = load_table(spark, sf_dir, "orders")
    return rollup_by(orders, ["o_orderstatus", "o_orderpriority"], "o_totalprice", sum_col="total")


@_q(
    "q_agg_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_l_partkey,
           COUNT(DISTINCT l_suppkey) AS n_l_suppkey
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (generalizes §2.D dedup)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_l_partkey"),
        F.countDistinct("l_suppkey").alias("n_l_suppkey"),
    )


@_q("q_agg_approx_distinct")
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the one-pass fixed-memory 100 TB path
    (no oracle: approximation is engine-specific; accuracy is asserted in
    tests/test_aggregates.py against the exact count)."""
    li = load_table(spark, sf_dir, "lineitem")
    return count_distinct_by(li, ["l_returnflag"], "l_partkey")


@_q(
    "q_window_rank",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_extendedprice DESC, l_linenumber
           ) AS INTEGER) AS rn
    FROM lineitem
    QUALIFY rn <= 3
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group under a declared deterministic ordering (SURVEY
    §1.4 Q3 generalized)."""
    li = load_table(spark, sf_dir, "lineitem")
    ranked = topk_per_group(
        li,
        "l_orderkey",
        [F.col("l_extendedprice").desc(), F.col("l_linenumber")],
        k=3,
    )
    return ranked.select("l_orderkey", "l_linenumber", "l_extendedprice", "rn")


@_q(
    "q_sort_limit",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return sort_limit(
        orders.select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        10,
    )


@_q(
    "q_agg_window_day",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           COUNT(*) AS n_events,
           {_msum('value')} AS sum_value
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
)
def q_agg_window_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily aggregate — batch twin of the streaming window
    (`dags/tourism_finance_etl_dag.py:15` daily cadence)."""
    ev = load_table(spark, sf_dir, "events")
    return windowed_daily(ev, "ts", "value")


# ---------------------------------------------------------------------------
# §2.A ⊘ — sinks (materializing queries; verified by read-back)
# ---------------------------------------------------------------------------

_SCRATCH = "/root/repo/.scratch"


def _fp_tag(sf_dir: str, table: str) -> str:
    """Scratch-fixture cache key: sf_dir + a cheap content fingerprint of
    the fixture's source table (parquet footer row count + byte size, read
    without scanning data). Regenerating testdata at the same path changes
    the tag, so a fixture staged from a previous generation can never be
    silently served against the new live-table oracle — it just becomes an
    orphan directory."""
    import hashlib
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        import pyarrow.parquet as pq

        fp = f"{pq.ParquetFile(path).metadata.num_rows}:{os.path.getsize(path)}"
    except FileNotFoundError:
        fp = "absent"
    except Exception:
        # Footer unreadable (corrupt file, pyarrow missing): a constant tag
        # here would collapse the fingerprint back to path-only and re-enable
        # stale-fixture aliasing, so fall back to size+mtime — regenerating
        # the file still rotates the tag.
        try:
            st = os.stat(path)
            fp = f"unreadable:{st.st_size}:{st.st_mtime_ns}"
        except OSError:
            fp = "absent"
    return hashlib.md5(f"{sf_dir}|{table}|{fp}".encode()).hexdigest()[:10]


def _staged_fixture(name: str, tag: str, build) -> str:
    """Build-once scratch fixture with crash- and concurrency-safe staging.

    ``build(tmp)`` assembles the COMPLETE fixture into a private temp dir,
    which is then os.rename()d into place as the last step (atomic on a
    local FS / object-store manifest commit in a deployment). Two
    guarantees the bare ``if not os.path.exists(base): write(base)``
    pattern lacks:

    - an interrupted first build leaves only an orphaned ``.tmp-*`` dir
      that later runs ignore and rebuild — never a partial fixture that
      every later run silently reuses;
    - two concurrent processes (bench + pytest) race safely: both may
      build, exactly one rename wins, the loser discards its temp dir and
      reads the winner's.
    """
    import os
    import shutil
    import uuid

    base = f"{_SCRATCH}/{name}_{tag}"
    if os.path.exists(base):
        return base
    os.makedirs(_SCRATCH, exist_ok=True)
    tmp = f"{base}.tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
    try:
        build(tmp)
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # lost the publish race
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return base


@_q("q_sink_overwrite", "SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL")
def q_sink_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-refresh sink (`data/transformation_dw.py:154-156` WRITE_TRUNCATE,
    SURVEY §1.4 Q8). Written twice to demonstrate idempotence, then read
    back — the oracle checks the round-tripped result."""
    from etl_pipeline_project_spark.sources.sinks import write_overwrite

    out = f"{_SCRATCH}/sink_overwrite_{spark.sparkContext.applicationId}"
    seg = distinct_values(load_table(spark, sf_dir, "customer"), "c_mktsegment")
    write_overwrite(seg, out)
    write_overwrite(seg, out)  # idempotent by construction
    return spark.read.parquet(out)


@_q("q_sink_append", "SELECT * FROM orders")
def q_sink_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append sink behind the incremental anti-join
    (`data/transformation_db.py:109-116`): overwrite a base load (orders
    before 1998), append only never-seen keys from the full staged set, read
    back. The read-back equals the staged table exactly once per key —
    running the load twice adds zero rows."""
    from etl_pipeline_project_spark.sources.sinks import write_append, write_overwrite

    out = f"{_SCRATCH}/sink_append_{spark.sparkContext.applicationId}"
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    write_overwrite(base, out)
    target = spark.read.parquet(out)
    # localCheckpoint materializes the anti-join result before the append
    # touches the same path it scans
    new_rows = anti_incremental(orders, target, "o_orderkey").localCheckpoint(eager=True)
    write_append(new_rows, out)
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# §2.H — Structured Streaming (availableNow-driven, deterministic key-level
# results → oracle-checkable despite being streaming plans)
# ---------------------------------------------------------------------------


@_q("q_stream_ingest", "SELECT event_id, ts, user_id, event_type, value, props FROM events")
def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source micro-batch ingest (`data/utils.py:28-45` prefix polling
    as a stream)."""
    from etl_pipeline_project_spark.streaming.ops import read_events_stream, run_to_memory

    out = run_to_memory(read_events_stream(spark, sf_dir))
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")


@_q("q_stream_dedup", "SELECT DISTINCT user_id, event_type FROM events")
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful keyed dedup with watermark-bounded state
    (`data/transformation_db.py:91-121` as a stream; SURVEY §2.H)."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        stream_dedup_keys,
    )

    stream = stream_dedup_keys(read_events_stream(spark, sf_dir), ["user_id", "event_type"])
    return run_to_memory(stream)


@_q("q_stream_upsert", "SELECT event_id, ts, user_id, event_type, value, props FROM events")
def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch keyed upsert (MERGE-WHEN-NOT-MATCHED emulation on
    parquet — streaming/upsert.py): stream the events table into a target
    twice; exactly-once per key means the second pass changes nothing and
    the read-back equals the source."""
    import shutil

    from etl_pipeline_project_spark.streaming.ops import read_events_stream
    from etl_pipeline_project_spark.streaming.upsert import foreach_batch_merge

    target = f"{_SCRATCH}/stream_upsert_{spark.sparkContext.applicationId}"
    shutil.rmtree(target, ignore_errors=True)
    for _ in range(2):  # idempotence: second run adds zero rows
        q = (
            read_events_stream(spark, sf_dir)
            .writeStream.foreachBatch(foreach_batch_merge(target, "event_id"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(target).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


@_q("q_stream_stateful", "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id")
def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState
    (streaming/stateful.py): per-key running totals; the final state per
    key equals the batch aggregate (the oracle). The float running sum is
    excluded from the compare — its accumulation order is batch-dependent."""
    from etl_pipeline_project_spark.streaming.ops import read_events_stream, run_to_memory
    from etl_pipeline_project_spark.streaming.stateful import stream_running_totals

    out = run_to_memory(
        stream_running_totals(read_events_stream(spark, sf_dir)), output_mode="update"
    )
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@_q(
    "q_stream_window",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling daily aggregate (`dags/tourism_finance_etl_dag.py:15`
    daily cadence as a stream). Complete output mode so every window is
    emitted in the final state."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        stream_windowed_counts,
    )

    stream = stream_windowed_counts(read_events_stream(spark, sf_dir), "ts", "event_type")
    return run_to_memory(stream, output_mode="complete")


# ---------------------------------------------------------------------------
# North-star: text analysis over `documents` (SURVEY §7 step 7)
# ---------------------------------------------------------------------------

# Collapse whitespace runs BEFORE trim on both engines: both Spark's and
# DuckDB's trim strip ASCII spaces only, so trimming the collapsed form is
# what gives full whitespace-trim semantics (edge tabs/newlines otherwise
# leave an empty head token / a padded fingerprint — hypothesis-found).
_WS_NORM = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
_WC_SQL = (
    f"CASE WHEN {_WS_NORM} = '' THEN 0 "
    f"ELSE CAST(len(string_split({_WS_NORM}, ' ')) AS BIGINT) END"
)
_BPE_SQL = "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)"
_PUNCT_SQL = "CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) / CAST(GREATEST(length(text), 1) AS DOUBLE)"
_STOP_SQL = (
    "CAST(len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is)\\b')) AS BIGINT)"
)
_FP_SQL = "sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


@_q(
    "q_text_token_count",
    f"""
    SELECT doc_id, {_WC_SQL} AS n_words, {_BPE_SQL} AS n_bpe_tokens
    FROM documents
    """,
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex tokens."""
    from etl_pipeline_project_spark.operators.text_analysis import token_count_bpe, word_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        word_count("text").alias("n_words"),
        token_count_bpe("text").alias("n_bpe_tokens"),
    )


@_q(
    "q_text_quality",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           {_WC_SQL} AS n_words,
           {_PUNCT_SQL} AS punct_ratio,
           CAST({_STOP_SQL} AS DOUBLE) / CAST(GREATEST({_WC_SQL}, 1) AS DOUBLE) AS stopword_ratio,
           (LEAST(CAST({_WC_SQL} AS DOUBLE) / 50.0, 1.0)
            + (1.0 - LEAST(({_PUNCT_SQL}) * 4, 1.0))
            + LEAST((CAST({_STOP_SQL} AS DOUBLE) / CAST(GREATEST({_WC_SQL}, 1) AS DOUBLE)) * 5, 1.0)
           ) / 3 AS quality
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword heuristics (built-in
    expressions only — a 100 TB documents scan stays one codegen'd map)."""
    from etl_pipeline_project_spark.operators.text_analysis import (
        punct_ratio,
        quality_score,
        stopword_ratio,
        word_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_measured"),
        word_count("text").alias("n_words"),
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


_LANG_HITS = {
    "en": "the|a|and|of|to|in|is",
    "de": "der|die|das|und|nicht|ist",
    "fr": "le|la|les|et|est|une",
    "es": "el|los|las|es|una",
}
_LANG_HIT_SQL = {
    lang: f"CAST(len(regexp_extract_all(lower(text), '\\b({pat})\\b')) AS BIGINT)"
    for lang, pat in _LANG_HITS.items()
}
_LANG_BEST = "GREATEST(" + ", ".join(f"h_{lang}" for lang in _LANG_HITS) + ")"


@_q(
    "q_text_lang_id",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
             {', '.join(f"{sql} AS h_{lang}" for lang, sql in _LANG_HIT_SQL.items())},
             len(regexp_extract_all(text, '[一-鿿]')) AS zh_chars
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN zh_chars > 0 THEN 'zh'
                WHEN {_LANG_BEST} = 0 THEN 'und'
                WHEN h_en = {_LANG_BEST} THEN 'en'
                WHEN h_de = {_LANG_BEST} THEN 'de'
                WHEN h_fr = {_LANG_BEST} THEN 'fr'
                WHEN h_es = {_LANG_BEST} THEN 'es'
                ELSE 'und' END AS lang_pred
    FROM h
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by stopword-hit argmax (+ CJK character detection),
    fixed precedence on ties."""
    from etl_pipeline_project_spark.operators.text_analysis import lang_id

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id("text").alias("lang_pred"))


@_q(
    "q_doc_fingerprint",
    f"SELECT doc_id, {_FP_SQL} AS fingerprint FROM documents",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: sha-256 over whitespace-normalized text."""
    from etl_pipeline_project_spark.operators.text_analysis import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


# ---------------------------------------------------------------------------
# North-star: deduplication over `documents`
# ---------------------------------------------------------------------------


@_q(
    "q_dedup_exact_docs",
    f"""
    WITH fp AS (SELECT doc_id, {_FP_SQL} AS fingerprint FROM documents)
    SELECT doc_id, fingerprint FROM fp
    QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
    """,
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the content fingerprint, keep lowest
    doc_id (deterministic keep-one, SURVEY §1.4 Q3 discipline)."""
    from etl_pipeline_project_spark.operators.dedup_text import dedup_exact

    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact(docs, "text", "doc_id").select("doc_id", "fingerprint")


_SHINGLE_SQL = """
    list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
      THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
      ELSE [] END)
"""


@_q(
    "q_ngram_jaccard",
    f"""
    WITH sh AS (SELECT doc_id, source, {_SHINGLE_SQL} AS s FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(GREATEST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1) AS DOUBLE)
               AS jaccard
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    )
    SELECT * FROM pairs WHERE jaccard >= 0.02
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs over source-blocked candidates
    (blocking is what keeps pairwise similarity off the O(n²) cliff; the
    unblocked path is MinHash-LSH, `q_dedup_minhash_lsh`)."""
    from etl_pipeline_project_spark.operators.dedup_text import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "doc_id", "text", "source", k=3, threshold=0.02)


@_q(
    "q_dedup_minhash_lsh",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             1.0 - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(GREATEST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1) AS DOUBLE)
               AS jaccard_distance
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard_distance FROM p WHERE jaccard_distance < 0.4
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates — the 100 TB dedup path (banded
    signatures → bucket join, no all-pairs; candidates exactly verified).

    Oracle-exact: precision is 1.0 by construction (exact verification) and
    at r=2/b=32 the banding recall at J ≥ 0.6 (distance < 0.4) is
    1−(1−0.36)²·³² ≈ 1−1.6e-6 — verified equal to the exact all-pairs
    DuckDB twin on the test corpora. Looser thresholds (where recall is
    genuinely probabilistic) remain covered by the recall tests in
    tests/test_llm_ops.py."""
    from etl_pipeline_project_spark.operators.dedup_text import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", jaccard_distance_threshold=0.4)


@_q(
    "q_dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      FROM documents
    ),
    h AS (SELECT doc_id, CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS hv FROM toks),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (hv >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS w
      FROM h CROSS JOIN (SELECT unnest(range(0, 64)) AS j) js
      GROUP BY doc_id, j
    ),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN w > 0 THEN CAST(1 AS HUGEINT) << CAST(j AS INTEGER)
                 ELSE CAST(0 AS HUGEINT) END) AS u
      FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN COALESCE(u, 0) >= CAST('9223372036854775808' AS HUGEINT)
                THEN COALESCE(u, 0) - CAST('18446744073709551616' AS HUGEINT)
                ELSE COALESCE(u, 0) END AS BIGINT) AS simhash64
    FROM documents d LEFT JOIN sig USING (doc_id)
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures (md5 token hashes — deterministic across
    runs/engines). One Arrow-batched UDF pass; banded candidate pairing
    exercised in tests/test_llm_ops.py.

    The DuckDB twin rebuilds the signature bit-for-bit: md5-prefix token
    hashes (big-endian uint64), per-bit ±1 weights, sign bits assembled in
    HUGEINT with *exact* integer constants for the two's-complement fold
    (a floating 2**63 would corrupt the low bits). Token split parity
    holds because the corpus is space-separated printable ASCII."""
    from etl_pipeline_project_spark.operators.dedup_text import simhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    return simhash_signatures(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# North-star: embedding similarity search over `embeddings`
# ---------------------------------------------------------------------------

_DOT_SQL = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)


@_q(
    "q_ann_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, e.vec_id AS nid,
             {_DOT_SQL.format(a='q.qvec', b='e.embedding')} AS score
      FROM q, embeddings e
      WHERE e.vec_id != q.qid
    )
    SELECT qid, nid, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS INTEGER) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors by dot product (embeddings are unit-norm ⇒
    cosine): broadcast query set, map-side scored corpus, window top-k. The
    corpus never shuffles — the plan that still works when the corpus is
    100 TB. Dot product accumulation is bit-identical to the DuckDB twin."""
    from etl_pipeline_project_spark.operators.similarity import ann_bruteforce_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_bruteforce_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@_q(
    "q_embed_neardup",
    f"""
    WITH p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS score
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, score FROM p ORDER BY score DESC, id_a, id_b LIMIT 20
    """,
)
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: exact pairs within coarse blocks (label =
    IVF cluster-id stand-in), global top-20 most similar."""
    from etl_pipeline_project_spark.operators.similarity import cosine_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, top_n=20)


@_q(
    "q_ann_ivf",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, e.vec_id AS nid,
             {_DOT_SQL.format(a='q.qvec', b='e.embedding')} AS score
      FROM q, embeddings e
      WHERE e.vec_id != q.qid
    )
    SELECT qid, nid, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS INTEGER) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (KMeans coarse quantizer + probed inverted lists —
    operators/similarity.py), run probe-complete (nprobe = nlist) so the
    result is exact by construction and carries the brute-force oracle:
    the union of all probed cells is the whole corpus, and per-candidate
    scoring is the same JVM dot product as `q_ann_bruteforce`. Pruning
    configurations (nprobe < nlist) are the scale path and are
    recall-tested on clustered data in tests/test_llm_ops.py — the
    driver's uniform-sphere embeddings defeat any cell index, so a pruned
    probe here would only measure noise."""
    from etl_pipeline_project_spark.operators.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, nlist=8, nprobe=8)


@_q("q_ann_lsh")
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection LSH top-k — the sub-linear scale path. Approximate
    ⇒ no SQL oracle; recall vs brute force asserted in tests."""
    from etl_pipeline_project_spark.operators.similarity import ann_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# ---------------------------------------------------------------------------
# North-star: multimodal columns (binary payload + typed metadata)
# ---------------------------------------------------------------------------


@_q(
    "q_multimodal_meta",
    """
    SELECT doc_id, 'text' AS format,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS checksum
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingestion layout: opaque binary payload + typed metadata
    struct. Filters/pruning run on metadata columns only — payload bytes
    are never read for a metadata-only query."""
    from etl_pipeline_project_spark.operators.multimodal import to_multimodal

    docs = load_table(spark, sf_dir, "documents")
    mm = to_multimodal(docs, "doc_id", "text", "text")
    return mm.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


def _features_oracle() -> str:
    """DuckDB twin of the byte-bucket histogram: extract each UTF-8 byte of
    the payload via hex-pair decoding (DuckDB blobs have no direct byte
    indexing), bucket by ``byte % FEATURE_DIM``, L1-normalize. Integer/int
    → double division is correctly-rounded IEEE in both engines, so values
    hash identically."""
    dims = ",\n".join(
        f"  CAST(len(list_filter(bl, x -> x = {k})) AS DOUBLE)"
        f" / greatest(n_bytes, 1) AS f{k}"
        for k in range(8)
    )
    return f"""
    WITH b AS (
      SELECT doc_id, encode(text) AS blob, octet_length(encode(text)) AS n_bytes
      FROM documents
    ), buckets AS (
      SELECT doc_id, n_bytes,
        [CAST(('0x' || substr(hex(blob), i*2+1, 2)) AS INTEGER) % 8
         FOR i IN range(0, CAST(n_bytes AS INTEGER))] AS bl
      FROM b
    )
    SELECT doc_id, n_bytes,
{dims}
    FROM buckets
    """


@_q("q_multimodal_features", _features_oracle())
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (deterministic byte-histogram stand-in for a decoder —
    codec libs absent in this container; see operators/multimodal.py).

    The contract projection explodes the feature vector into per-dimension
    scalar doubles (f0..f7) — scalar columns are hashable by the driver's
    row-check and give the query an exact DuckDB twin."""
    from etl_pipeline_project_spark.operators.multimodal import FEATURE_DIM, extract_features, to_multimodal

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(to_multimodal(docs, "doc_id", "text", "text"))
    return feats.select(
        "doc_id",
        "n_bytes",
        *[F.col("features")[k].alias(f"f{k}") for k in range(FEATURE_DIM)],
    )


@_q(
    "q_multimodal_frame_sample",
    """
    WITH b AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    f AS (SELECT doc_id, text, n_bytes, unnest(range(0, 4)) AS frame_no FROM b)
    SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
           sha256(substr(text, CAST(frame_no * 64 + 1 AS INTEGER), 64)) AS frame_checksum
    FROM f WHERE frame_no * 64 < n_bytes
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: explode fixed-stride byte windows of each
    payload into one row per 'frame' with a checksum.

    DuckDB twin: this build's sha256() only accepts VARCHAR, so the twin
    slices the *string* — byte-identical to Spark's binary substring
    because the corpus is printable ASCII (1 byte/char, every slice valid
    UTF-8); checked for all scale factors."""
    from etl_pipeline_project_spark.operators.multimodal import frame_sample, to_multimodal

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(to_multimodal(docs, "doc_id", "text", "text"))


# ---------------------------------------------------------------------------
# Reference pipeline parity (SURVEY §3 E2+E3): the star-schema build over
# reference-shaped operational tables derived from the driver testdata
# (plans/adapter.py). Every mart table is differentially verified.
# ---------------------------------------------------------------------------


def _mart_q(table: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from etl_pipeline_project_spark.plans.adapter import derive_reference_tables
        from etl_pipeline_project_spark.plans import mart

        ops = derive_reference_tables(spark, sf_dir)
        out = getattr(mart, table)(ops)
        # Contract projection only: DECIMAL money columns go out as DOUBLE —
        # the driver's value-hash renders DuckDB decimals and Spark decimals
        # differently (r2: fact_pengeluaran/pemasukan hash-mismatch with
        # identical values). The mart builders stay decimal-exact.
        dec_fix = {
            f.name: F.col(f.name).cast("double")
            for f in out.schema.fields
            if isinstance(f.dataType, T.DecimalType)
        }
        return out.withColumns(dec_fix) if dec_fix else out

    fn.__name__ = f"q_mart_{table}"
    fn.__doc__ = f"Star-schema build of `{table}` (plans/mart.py) over the adapter tables."
    return fn


def _register_mart_queries() -> None:
    from etl_pipeline_project_spark.plans.adapter import ADAPTER_CTE

    oracles = {
        "dim_waktu": """
            , all_ts AS (
              SELECT timestamp_review AS ts FROM reviews
              UNION ALL SELECT created_at_tweet FROM tweets
              UNION ALL SELECT "timestamp" FROM pemasukan
              UNION ALL SELECT "timestamp" FROM pengeluaran
            ), d AS (SELECT DISTINCT ts FROM all_ts WHERE ts IS NOT NULL)
            SELECT ts AS timestamp_datetime,
                   strftime(ts, '%H:%M:%S') AS jam,
                   dayname(ts) AS hari,
                   CAST(ts AS DATE) AS tanggal,
                   strftime(ts, '%Y-%m') AS bulan,
                   year(ts) AS tahun
            FROM d
        """,
        "dim_place": """
            , renamed AS (
              SELECT place_id, name AS nama_tempat, lat AS latitude, lng AS longitude,
                     types AS tipe_tempat, phone_number AS kontak,
                     opening_hours_text AS jam_operasional
              FROM places
              WHERE place_id IS NOT NULL AND name IS NOT NULL
                AND lat IS NOT NULL AND lng IS NOT NULL AND types IS NOT NULL
            )
            SELECT * FROM renamed
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY place_id
              ORDER BY nama_tempat ASC NULLS FIRST, latitude ASC NULLS FIRST,
                       longitude ASC NULLS FIRST) = 1
        """,
        "dim_user": """
            , u AS (
              SELECT id_author_twitter AS id_user, author_location AS lokasi_user
              FROM tweets WHERE id_author_twitter IS NOT NULL
            )
            SELECT * FROM u
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY id_user ORDER BY lokasi_user ASC NULLS FIRST) = 1
        """,
        "dim_vendor": """
            , v AS (
              SELECT id_vendor, nama_vendor FROM pengeluaran
              WHERE id_vendor IS NOT NULL AND nama_vendor IS NOT NULL
            )
            SELECT * FROM v
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY id_vendor ORDER BY nama_vendor ASC NULLS FIRST) = 1
        """,
        "dim_departemen": """
            , d AS (
              SELECT id_departemen, nama_departemen FROM pengeluaran
              WHERE id_departemen IS NOT NULL AND nama_departemen IS NOT NULL
            )
            SELECT * FROM d
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY id_departemen ORDER BY nama_departemen ASC NULLS FIRST) = 1
        """,
        "dim_proyek": """
            , p AS (
              SELECT id_proyek, nama_proyek, sektor_pariwisata FROM pemasukan
              UNION ALL
              SELECT id_proyek, nama_proyek, sektor_pariwisata FROM pengeluaran
            )
            SELECT * FROM p
            WHERE id_proyek IS NOT NULL AND nama_proyek IS NOT NULL
              AND sektor_pariwisata IS NOT NULL
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY id_proyek
              ORDER BY nama_proyek ASC NULLS FIRST, sektor_pariwisata ASC NULLS FIRST) = 1
        """,
        "dim_penyumbang": """
            , p AS (
              SELECT id_penyumbang, nama_penyumbang, jenis_penyumbang FROM pemasukan
              WHERE id_penyumbang IS NOT NULL AND nama_penyumbang IS NOT NULL
                AND jenis_penyumbang IS NOT NULL
            )
            SELECT * FROM p
            QUALIFY ROW_NUMBER() OVER (
              PARTITION BY id_penyumbang
              ORDER BY nama_penyumbang ASC NULLS FIRST, jenis_penyumbang ASC NULLS FIRST) = 1
        """,
        "fact_maps": """
            SELECT id_review, timestamp_review AS timestamp_datetime, place_id,
                   author_url, review_text AS review_longtext, rating
            FROM reviews
            WHERE id_review IS NOT NULL AND timestamp_review IS NOT NULL
              AND place_id IS NOT NULL AND author_url IS NOT NULL
              AND review_text IS NOT NULL AND rating IS NOT NULL
        """,
        "fact_twitter": """
            , joined AS (
              SELECT t.id_tweet, t.created_at_tweet AS created_at_datetime,
                     t.id_author_twitter AS id_user, p.name AS nama_lokasi,
                     t.text_tweet
              FROM tweets t LEFT JOIN places p ON t.place_id_source = p.place_id
            )
            SELECT * FROM joined
            WHERE id_tweet IS NOT NULL AND created_at_datetime IS NOT NULL
              AND id_user IS NOT NULL AND nama_lokasi IS NOT NULL
              AND text_tweet IS NOT NULL
        """,
        "fact_pengeluaran": """
            SELECT id_transaksi_original AS id_transaksi,
                   "timestamp" AS timestamp_datetime, jenis_kebutuhan,
                   id_vendor, id_departemen,
                   CAST(jumlah AS DOUBLE) AS jumlah_pengeluaran,
                   bukti AS bukti_pengeluaran, id_proyek
            FROM pengeluaran
            WHERE id_transaksi_original IS NOT NULL AND "timestamp" IS NOT NULL
              AND jenis_kebutuhan IS NOT NULL AND id_vendor IS NOT NULL
              AND id_departemen IS NOT NULL AND jumlah IS NOT NULL
              AND id_proyek IS NOT NULL
        """,
        "fact_pemasukan": """
            SELECT id_transaksi_original AS id_transaksi_income,
                   "timestamp" AS timestamp_datetime, jenis_pemasukan,
                   id_penyumbang,
                   CAST(jumlah AS DOUBLE) AS jumlah_pemasukan,
                   bukti AS bukti_pemasukan, id_proyek
            FROM pemasukan
            WHERE id_transaksi_original IS NOT NULL AND "timestamp" IS NOT NULL
              AND jenis_pemasukan IS NOT NULL AND id_penyumbang IS NOT NULL
              AND jumlah IS NOT NULL AND id_proyek IS NOT NULL
        """,
    }
    for table, tail in oracles.items():
        _q(f"q_mart_{table}", ADAPTER_CTE + tail)(_mart_q(table))


_register_mart_queries()


def _attach_mart_analytics_oracle() -> None:
    from etl_pipeline_project_spark.plans.adapter import ADAPTER_CTE

    ORACLE["q_mart_analytics"] = ADAPTER_CTE + f"""
        , fact AS (
          SELECT id_transaksi_original AS id_transaksi_income, id_proyek,
                 CAST(jumlah AS DECIMAL(38,9)) AS jumlah_pemasukan
          FROM pemasukan
          WHERE id_transaksi_original IS NOT NULL AND "timestamp" IS NOT NULL
            AND jenis_pemasukan IS NOT NULL AND id_penyumbang IS NOT NULL
            AND jumlah IS NOT NULL AND id_proyek IS NOT NULL
        ), proyek AS (
          SELECT id_proyek, nama_proyek, sektor_pariwisata FROM (
            SELECT id_proyek, nama_proyek, sektor_pariwisata FROM pemasukan
            UNION ALL
            SELECT id_proyek, nama_proyek, sektor_pariwisata FROM pengeluaran
          ) WHERE id_proyek IS NOT NULL AND nama_proyek IS NOT NULL
              AND sektor_pariwisata IS NOT NULL
          QUALIFY ROW_NUMBER() OVER (
            PARTITION BY id_proyek
            ORDER BY nama_proyek ASC NULLS FIRST, sektor_pariwisata ASC NULLS FIRST) = 1
        )
        SELECT p.sektor_pariwisata, f.id_proyek, p.nama_proyek,
               {_msum('f.jumlah_pemasukan')} AS total_pemasukan,
               COUNT(*) AS n_transaksi
        FROM fact f JOIN proyek p ON f.id_proyek = p.id_proyek
        GROUP BY p.sektor_pariwisata, f.id_proyek, p.nama_proyek
    """


@_q("q_mart_analytics")
def q_mart_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytics layer the star schema exists for (SURVEY §2.G intro):
    income totals by sektor × proyek, computed over the *built* mart —
    fact_pemasukan ⟕ dim_proyek (broadcast dim) → grouped decimal-exact
    sum. Exercises builder composition end-to-end with an oracle."""
    from etl_pipeline_project_spark.plans.adapter import derive_reference_tables
    from etl_pipeline_project_spark.plans.mart import dim_proyek, fact_pemasukan

    ops = derive_reference_tables(spark, sf_dir)
    fact = fact_pemasukan(ops)
    proyek = dim_proyek(ops)
    joined = left_enrich(fact, proyek, "id_proyek")
    return joined.groupBy("sektor_pariwisata", "id_proyek", "nama_proyek").agg(
        money_sum(F.col("jumlah_pemasukan")).alias("total_pemasukan"),
        F.count(F.lit(1)).alias("n_transaksi"),
    )


_attach_mart_analytics_oracle()


@_q(
    "q_ops_load_incremental",
    None,  # oracle attached below (needs ADAPTER_CTE)
)
def q_ops_load_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 parity (`data/transformation_db.py:91-121`): staged files with
    cross-file duplicate keys → deterministic dedup → anti-join against
    already-loaded keys → rows to append. Duplicates are simulated by
    unioning the staged table with a jumlah-doubled copy; 'first' is
    declared as lowest jumlah (the original)."""
    from etl_pipeline_project_spark.plans.adapter import derive_reference_tables
    from etl_pipeline_project_spark.plans.operational import load_operational

    pem = derive_reference_tables(spark, sf_dir)["pemasukan"]
    staged = union_all(pem, pem.withColumn("jumlah", F.col("jumlah") * 2))
    existing = pem.filter(F.col("timestamp") < F.lit("1998-01-01").cast("timestamp"))
    return load_operational(
        staged,
        existing,
        key="id_transaksi_original",
        tiebreak=[F.col("jumlah").asc_nulls_first()],
    )


def _attach_ops_load_oracle() -> None:
    from etl_pipeline_project_spark.plans.adapter import ADAPTER_CTE

    ORACLE["q_ops_load_incremental"] = ADAPTER_CTE + """
        , staged AS (
          SELECT * FROM pemasukan
          UNION ALL
          SELECT id_transaksi_original, "timestamp", id_proyek, nama_proyek,
                 sektor_pariwisata, id_penyumbang, nama_penyumbang, jenis_penyumbang,
                 jenis_pemasukan, jumlah * 2 AS jumlah, bukti
          FROM pemasukan
        ), dd AS (
          SELECT * FROM staged
          QUALIFY ROW_NUMBER() OVER (
            PARTITION BY id_transaksi_original ORDER BY jumlah ASC NULLS FIRST) = 1
        )
        SELECT * FROM dd
        WHERE NOT EXISTS (
          SELECT 1 FROM pemasukan e
          WHERE e."timestamp" < TIMESTAMP '1998-01-01'
            AND e.id_transaksi_original = dd.id_transaksi_original
        )
    """


_attach_ops_load_oracle()


# ---------------------------------------------------------------------------
# Engine extensions beyond §2: set ops, cube/pivot, sessionization, as-of
# join, SQL entry (SURVEY §2.C/§2.E "absent in reference" rows + the common
# OLAP patterns a mart user needs)
# ---------------------------------------------------------------------------


@_q(
    "q_set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — nations present on both sides."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@_q(
    "q_set_except",
    """
    SELECT c_custkey AS entity_key FROM customer
    EXCEPT
    SELECT s_suppkey FROM supplier
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — customer keys outside the supplier
    key range."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("entity_key"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("entity_key"))
    return cust.subtract(supp)


@_q(
    "q_pivot",
    f"""
    SELECT l_returnflag,
           {_msum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE NULL END")} AS "O",
           {_msum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE NULL END")} AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide conditional aggregation) over explicit values —
    explicit so the plan is one pass (value discovery would scan twice)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(money_sum(F.col("l_quantity")))
    )


@_q(
    "q_agg_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           {_msum('o_totalprice')} AS total,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_o_orderpriority
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping sets over the two dims (rollup's superset)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        money_sum(F.col("o_totalprice")).alias("total"),
        F.grouping("o_orderstatus").cast("int").alias("g_o_orderstatus"),
        F.grouping("o_orderpriority").cast("int").alias("g_o_orderpriority"),
    )


@_q(
    "q_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(epoch(ts)::BIGINT) OVER w IS NULL
                    OR epoch(ts)::BIGINT - lag(epoch(ts)::BIGINT) OVER w > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): lag + cumulative sum — the
    batch twin of streaming `session_window`."""
    from etl_pipeline_project_spark.operators.windows import sessionize

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize(ev, key="user_id", ts="ts", gap_seconds=1800, tiebreak="event_id")


@_q(
    "q_join_asof",
    """
    SELECT e.event_id, e.user_id, e.ts, c."r_ts" AS last_click_ts
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, ts AS "r_ts" FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (absent from both the reference and native
    Spark — SURVEY §2.C): for every event, the latest click of the same
    user at or before it. Composition form (range join + row_number);
    DuckDB's native ASOF JOIN is the oracle."""
    from etl_pipeline_project_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(
        ev,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_id="event_id",
        right_cols=["ts"],
    )
    return out.select("event_id", "user_id", "ts", F.col("r_ts").alias("last_click_ts"))


@_q(
    "q_sql_entry",
    f"""
    SELECT l_orderkey,
           {_msum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-string entry point (TPC-H-Q3-shaped): register the tables as
    views and run `spark.sql` — same Catalyst plan as the DataFrame DSL
    (SURVEY §3 E2 note). The three-way join broadcasts the filtered
    customer side under AQE."""
    for t in ["customer", "orders", "lineitem"]:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        f"""
        SELECT l_orderkey,
               CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


@_q(
    "q_join_semi",
    """
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order —
    the probe side never duplicates rows, unlike an inner-join+distinct."""
    from etl_pipeline_project_spark.operators.joins import semi_filter

    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_filter(cust, big, "c_custkey").select("c_custkey", "c_name")


@_q(
    "q_join_range",
    """
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range-predicate join (lineitems shipped within 30 days of
    their order): the hash join runs on the equi key and the range
    predicate evaluates as a post-join filter — the scalable shape for
    key-scoped interval joins (a pure range join with no equi key would
    need bucketized interval keys; SURVEY §2.C absent-row note)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] >= orders["o_orderdate"])
        & (li["l_shipdate"] < orders["o_orderdate"] + F.expr("INTERVAL 30 DAY"))
    )
    return orders.join(li, cond).select("o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate")


@_q(
    "q_window_running",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_so_far,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) OVER w AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames (rowsBetween): running order count + running revenue
    per customer. The running sum accumulates in DECIMAL — windowed double
    sums are association-order-dependent across engines (segment-tree vs
    sequential evaluation)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n_orders_so_far"),
        F.sum(F.col("o_totalprice").cast("decimal(38,10)")).over(w).cast("double").alias(
            "running_total"
        ),
    )


@_q(
    "q_window_lag",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderdate) OVER w AS prev_orderdate,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT)
             AS days_since_prev,
           first_value(o_orderkey) OVER w AS first_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window offset functions: lag + day gap to the previous order +
    first_value per customer (deterministic total ordering per Q3 rule)."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_orderdate"),
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@_q(
    "q_null_fill",
    """
    SELECT place_id,
           COALESCE(name, '(unknown)') AS name_filled,
           COALESCE(lat, 0.0e0) AS lat_filled,
           CASE WHEN name IS NULL THEN 1 ELSE 0 END AS was_null
    FROM (
      SELECT 'p_' || p_partkey AS place_id,
             CASE WHEN p_partkey % 37 = 0 THEN NULL ELSE p_name END AS name,
             CASE WHEN p_partkey % 41 = 0 THEN NULL ELSE p_size * 1.5e0 - 6.2e0 END AS lat
      FROM part
    )
    """,
)
def q_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null defaulting (na.fill) over the adapter's dirty places table —
    the complement of the NOT-NULL drop filter."""
    from etl_pipeline_project_spark.plans.adapter import derive_reference_tables

    places = derive_reference_tables(spark, sf_dir)["places"]
    return (
        places.select(
            "place_id", "name", "lat", F.when(F.col("name").isNull(), 1).otherwise(0).alias("was_null")
        )
        .na.fill({"name": "(unknown)", "lat": 0.0})
        .withColumnsRenamed({"name": "name_filled", "lat": "lat_filled"})
    )


@_q(
    "q_quantiles",
    """
    SELECT l_returnflag,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (SQL percentile_cont
    semantics: pos = p·(n−1), lerp between the bracketing order
    statistics), computed by the count-based quantile plan rather than
    the sort-based percentile aggregate — that aggregate buffers every
    group value on one reducer, the thing that cannot work at 100 TB.
    groupBy (flag, value) collapses the fact table map-side to distinct
    values; one cumulative window finds the bracketing ranks
    (floor(pos)+1 and +2 via min-over-threshold); the lerp runs the same
    double expression the native aggregates use. Rounded to 4dp: the
    interpolation arithmetic is the only cross-engine float risk. The
    one-pass approximate path is `q_quantiles_approx`."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    dist = counts.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def pcont(p: float):
        pos = F.lit(p) * (F.col("n") - 1).cast("double")
        lo_rank = F.floor(pos) + 1
        hi_rank = F.least(lo_rank + 1, F.col("n"))
        frac = pos - F.floor(pos).cast("double")
        v_lo = F.min(
            F.when(F.col("cum") >= lo_rank, F.col("l_extendedprice"))
        )
        v_hi = F.min(
            F.when(F.col("cum") >= hi_rank, F.col("l_extendedprice"))
        )
        return v_lo + frac * (v_hi - v_lo)

    # pos/frac depend only on n (constant per group) — safe inside agg
    agg = dist.groupBy("l_returnflag", "n").agg(
        F.round(pcont(0.5), 4).alias("p50"),
        F.round(pcont(0.95), 4).alias("p95"),
    )
    return agg.select("l_returnflag", "p50", "p95")


@_q("q_quantiles_approx")
def q_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) — the one-pass fixed-memory
    100 TB path; accuracy vs the exact form asserted in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50_approx"),
    )


@_q(
    "q_json_extract",
    """
    SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_value,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid_json
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (SURVEY §2.F: JSON
    functions are built-in when ingestion needs them) — stays in codegen,
    no UDF."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.when(F.try_parse_json("props").isNotNull(), 1).otherwise(0).alias("is_valid_json"),
    )


@_q(
    "q_explode_collect",
    """
    SELECT word, COUNT(*) AS n, MIN(p_partkey) AS first_part,
           array_to_string(list_sort(list(p_partkey)), ',') AS part_keys
    FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    """,
)
def q_explode_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode + grouped collect round-trip: one row per word of the
    part name, then per-word stats with a deterministic (sorted, joined)
    key list — collect_list order is nondeterministic, sort_array fixes it."""
    part = load_table(spark, sf_dir, "part")
    words = part.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_partkey").alias("first_part"),
        F.array_join(F.sort_array(F.collect_list("p_partkey")), ",").alias("part_keys"),
    )


_Q5_SQL_TEMPLATE = """
    SELECT n_name,
           {msum} AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
"""


@_q(
    "q_sql_q5",
    _Q5_SQL_TEMPLATE.format(
        msum=_msum("l_extendedprice * (1 - l_discount)")
    ),
)
def q_sql_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped six-table join (region→nation→supplier⋈customer→
    orders→lineitem): the join-reordering/CBO showcase. Catalyst broadcasts
    the filtered region/nation/supplier chain and keeps lineitem — the only
    100 TB-scale table — as the streamed probe side; the date filter pushes
    to the orders scan."""
    from etl_pipeline_project_spark.sources.catalog import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        _Q5_SQL_TEMPLATE.format(
            msum="CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) "
            "AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE)"
        )
    )


# ---------------------------------------------------------------------------
# §2.I — UDF surface demonstration
# ---------------------------------------------------------------------------


@_q(
    "q_udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           concat_ws('_', l_orderkey, l_partkey, l_linenumber) AS surrogate_key
    FROM lineitem
    """,
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas_udf reimplementation of `q_concat_key` —
    demonstrates the engine's extension surface (SURVEY §2.I); verified by
    the same oracle as the built-in form."""
    from etl_pipeline_project_spark.functions.udfs import concat3_udf

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        concat3_udf("l_orderkey", "l_partkey", "l_linenumber").alias("surrogate_key"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline extensions, round 2: PII scrubbing, deterministic
# stratified sampling, corpus token statistics, and near-dup group
# assignment (connected components over the MinHash pair graph).
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"
_PII_NUM = r"[0-9]{4,}"


@_q(
    "q_text_pii_redact",
    f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_URL}', '<URL>', 'g'),
             '{_PII_NUM}', '<NUM>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}'))
              + len(regexp_extract_all(text, '{_PII_URL}'))
              + len(regexp_extract_all(text, '{_PII_NUM}')) AS BIGINT) AS n_pii
    FROM documents
    """,
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails/URLs/long digit runs → typed placeholders) —
    the standard pre-training redaction pass plus the per-doc audit count.
    Pure Catalyst regexp chain, map-only at any scale; patterns restricted
    to the Java-regex ∩ RE2 dialect so the DuckDB twin is exact."""
    from etl_pipeline_project_spark.operators.text_analysis import pii_hit_count, pii_redact

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        pii_redact("text").alias("redacted"),
        pii_hit_count("text").alias("n_pii"),
    )


@_q(
    "q_stratified_sample",
    """
    SELECT doc_id, source,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
             AS bucket
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% sample via md5 hash-bucketing of the id — the
    reproducible train/val/test split primitive. Unlike rand()-sampling,
    membership is a pure function of the id: stable across runs, engines,
    partitionings and cluster sizes, and the same doc never migrates
    between splits when the corpus grows. Map-only filter; the predicate
    pushes to the scan."""
    from etl_pipeline_project_spark.operators.text_analysis import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket("doc_id", 100)
    return docs.select("doc_id", "source", bucket.alias("bucket")).filter(
        F.col("bucket") < 20
    )


@_q(
    "q_token_stats_by_source",
    f"""
    WITH t AS (SELECT source, {_BPE_SQL} AS n_tokens FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tokens,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_tokens), 4) AS p50_tokens,
           ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY n_tokens), 4) AS p95_tokens
    FROM t GROUP BY source
    """,
)
def q_token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per-source document/token counts and the
    token-length distribution — what a data-mix dashboard reads. One
    partial+final aggregate; token sums < 2^53 are double-exact."""
    from etl_pipeline_project_spark.operators.text_analysis import token_count_bpe

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("source", token_count_bpe("text").alias("n_tokens"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_tokens"
        ),
        F.round(F.percentile("n_tokens", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("n_tokens", F.lit(0.95)), 4).alias("p95_tokens"),
    )


_NEARDUP_GROUPS_ORACLE = f"""
    WITH RECURSIVE sh AS MATERIALIZED (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE 1.0 - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / CAST(GREATEST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1) AS DOUBLE)
            < 0.4
    ),
    edges AS MATERIALIZED (
      -- MATERIALIZED: the recursive closure references edges every
      -- iteration; without the hint DuckDB re-evaluates the O(n²) pair
      -- computation per round (14.9s -> 4.9s at sf0.01)
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS group_id
    FROM reach GROUP BY src
    """


@_q("q_dedup_groups", _NEARDUP_GROUPS_ORACLE)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup *group assignment*: connected components over the
    MinHash-LSH pair graph via iterative min-label propagation
    (operators/dedup_text.py `neardup_groups`) — the step that turns
    pairwise similarity into keep/drop decisions (keep doc_id == group_id).
    The DuckDB twin computes the transitive closure with a recursive CTE
    over the same exact pair set."""
    from etl_pipeline_project_spark.operators.dedup_text import minhash_lsh_pairs, neardup_groups

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_distance_threshold=0.4)
    return neardup_groups(pairs)


@_q(
    "q_join_full_outer",
    """
    WITH l AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0),
    r AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      WHERE o_custkey % 2 = 0 GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, o_custkey, n_orders,
           COALESCE(c_custkey, o_custkey) AS entity_key
    FROM l FULL OUTER JOIN r ON c_custkey = o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join — both-sides-preserved reconciliation (the
    join type the reference's pandas merges never used). Unmatched rows
    surface from both inputs; COALESCE re-derives the unified key."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    left = cust.filter(F.col("c_custkey") % 3 == 0).select("c_custkey", "c_name")
    right = (
        orders.filter(F.col("o_custkey") % 2 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return left.join(right, left.c_custkey == right.o_custkey, "full_outer").select(
        "c_custkey",
        "c_name",
        "o_custkey",
        "n_orders",
        F.coalesce("c_custkey", "o_custkey").alias("entity_key"),
    )


@_q(
    "q_window_distribution",
    """
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile) —
    the ranking complement to q_window_rank. The window orders by a total
    key (totalprice, orderkey) so every function is deterministic."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@_q(
    "q_agg_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube, §2.G) with
    GROUPING() disambiguating aggregate nulls from data nulls — via the
    SQL surface, the same Catalyst Expand node as q_agg_rollup."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS BIGINT) AS gid
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Change history / CDC — the incremental-warehouse operators the
# reference's full-reload design lacks (SURVEY §1.4 Q5).
# ---------------------------------------------------------------------------


def _msum6(expr: str) -> str:
    """Scale-6 twin of `_msum` for pre-normalized moment terms (values
    O(1), so a scale-6 sum's unscaled form stays far below 2^53)."""
    return f"CAST(CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,10))), 6) AS DECIMAL(38,6)) AS DOUBLE)"


@_q(
    "q_scd2_dim",
    """
    SELECT o_custkey, o_orderpriority, o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS version,
           o_orderdate AS effective_from,
           lead(o_orderdate) OVER w AS effective_to,
           lead(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
    """,
)
def q_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 versioning: each customer's order stream becomes
    effective-dated dimension rows (version / effective_from /
    effective_to / is_current). One window pass = one shuffle on the
    entity key; no self-join, no iteration. The reference reloads dims
    wholesale and loses history (`data/transformation_dw.py:122-334`)."""
    orders = load_table(spark, sf_dir, "orders")
    return scd2_versions(
        orders,
        "o_custkey",
        ["o_orderdate", "o_orderkey"],
        ["o_orderpriority", "o_totalprice"],
    ).select(
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
        "version",
        "effective_from",
        "effective_to",
        "is_current",
    )


@_q(
    "q_cdc_apply",
    """
    WITH ranked AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
      FROM events
    )
    SELECT user_id, ts, event_type, value, op FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog compaction: latest record per key wins, keys whose
    final op is a delete drop out — the standard snapshot-serving step.
    Single shuffle (row_number over the key), map-side prunable; total
    order (ts, event_id) makes the survivor deterministic."""
    ev = load_table(spark, sf_dir, "events")
    op = F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    return cdc_latest(ev, "user_id", ["ts", "event_id"], op, delete_op="D").select(
        "user_id", "ts", "event_type", "value", "op"
    )


# ---------------------------------------------------------------------------
# Profiling / statistics — the data-quality gate surface.
# ---------------------------------------------------------------------------


@_q(
    "q_profile_stats",
    """
    SELECT 'c_custkey' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(c_custkey) AS n_null, COUNT(DISTINCT c_custkey) AS n_distinct,
           CAST(MIN(c_custkey) AS VARCHAR) AS min_value, CAST(MAX(c_custkey) AS VARCHAR) AS max_value
    FROM customer
    UNION ALL
    SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name), COUNT(DISTINCT c_name),
           CAST(MIN(c_name) AS VARCHAR), CAST(MAX(c_name) AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey), COUNT(DISTINCT c_nationkey),
           CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment),
           CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR) FROM customer
    """,
)
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column profile (rows / nulls / distincts /
    min / max) in ONE scan: a single aggregate row unpivoted with
    ``stack`` — vs the oracle's 4 scans. The reference eyeballs quality
    manually (`data/transformation_db.py:87-96` drops nulls blind)."""
    cust = load_table(spark, sf_dir, "customer")
    return profile_columns(cust, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])


@_q(
    "q_corr_exact",
    f"""
    WITH sc AS (
      SELECT l_returnflag,
             l_quantity * 1e-2 AS x, l_extendedprice * 1e-5 AS y
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             {_msum6('x')} AS sx, {_msum6('y')} AS sy,
             {_msum6('x*x')} AS sxx,
             {_msum6('x*y')} AS sxy,
             {_msum6('y*y')} AS syy
      FROM sc GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE)*sxy - sx*sy)
             / sqrt((CAST(n AS DOUBLE)*sxx - sx*sx) * (CAST(n AS DOUBLE)*syy - sy*sy))
             AS corr_qty_price
    FROM s
    """,
)
def q_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal moment sums. Native
    corr()/covar() accumulate in doubles (order-dependent ⇒ run-to-run
    drift under distributed partials AND engine-to-engine drift); here
    the five moments accumulate exactly, and only the final closed-form
    combination runs in (deterministic, identical-expression) double
    arithmetic. Correlation is scale-invariant, so both variables are
    pre-normalized (x·1e-2, y·1e-5 — the same IEEE multiply on both
    engines) to keep every moment's unscaled decimal below 2^53: the
    final decimal(38,6)→double narrowing is then a single
    correctly-rounded conversion on both engines (a wide unscaled
    int128 would convert with engine-dependent 1-ULP drift). Same
    single-shuffle cost as any grouped aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity") * F.lit(1e-2)
    y = F.col("l_extendedprice") * F.lit(1e-5)
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(x, 6).alias("sx"),
        exact_sum(y, 6).alias("sy"),
        exact_sum(x * x, 6).alias("sxx"),
        exact_sum(x * y, 6).alias("sxy"),
        exact_sum(y * y, 6).alias("syy"),
    )
    nd = F.col("n").cast("double")
    corr = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return g.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@_q(
    "q_array_ops",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS arr_len,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS v_min,
           CAST(list_sort(embedding)[len(embedding)] AS DOUBLE) AS v_max,
           CAST(list_sort(embedding)[1] AS DOUBLE)
             + CAST(list_sort(embedding)[2] AS DOUBLE)
             + CAST(list_sort(embedding)[3] AS DOUBLE) AS low3_sum,
           CAST(len(list_distinct(embedding)) AS INTEGER) AS n_distinct_vals
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (sort / index / distinct / size) over the
    embedding column — all Catalyst built-ins, map-only, no shuffle.
    Scalars (not raw arrays) come back so results are hashable and
    engine-comparable; float→double widening is exact on both sides."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = F.sort_array(F.col("embedding"))
    first3 = (
        F.element_at(s, 1).cast("double")
        + F.element_at(s, 2).cast("double")
        + F.element_at(s, 3).cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("arr_len"),
        F.element_at(s, 1).cast("double").alias("v_min"),
        F.element_at(s, F.size("embedding")).cast("double").alias("v_max"),
        first3.alias("low3_sum"),
        F.size(F.array_distinct("embedding")).alias("n_distinct_vals"),
    )


# ---------------------------------------------------------------------------
# LLM-pipeline additions: chunking, vocabulary, fuzzy matching, centroids.
# ---------------------------------------------------------------------------


@_q(
    "q_doc_chunk",
    """
    SELECT doc_id,
           CAST(off // 150 AS INTEGER) AS chunk_id,
           substr(text, CAST(off AS INTEGER) + 1, 200) AS chunk,
           CAST(length(substr(text, CAST(off AS INTEGER) + 1, 200)) AS INTEGER) AS chunk_len
    FROM documents,
         UNNEST(generate_series(0, greatest(length(text) - 1, 0), 150)) AS t(off)
    """,
)
def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (size 200 chars, stride 150)
    — the document→training-sample expansion step. Pure Catalyst
    (sequence/transform/substring + inline): a 100 TB corpus chunks in
    one map-only pass, no Python, no shuffle; row growth is the
    intended ~len/stride× payload. Empty docs yield one empty chunk
    (nothing silently dropped)."""
    from etl_pipeline_project_spark.operators.text_analysis import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.inline(chunk_text("text", 200, 150))
    ).select(
        "doc_id",
        "chunk_id",
        "chunk",
        F.length("chunk").alias("chunk_len"),
    )


@_q(
    "q_text_ngram_freq",
    r"""
    WITH toks AS (
      SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
      SELECT unnest(CASE WHEN len(t) >= 2
             THEN list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])
             ELSE CAST([] AS VARCHAR[]) END) AS bigram
      FROM toks
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY bigram
    ORDER BY cnt DESC, bigram ASC LIMIT 100
    """,
)
def q_text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram vocabulary, top-100 by frequency — the
    vocabulary-building primitive (BPE seeding, phrase mining). Map-side
    bigram explode → one shuffle on the bigram key with partial
    aggregation → TakeOrdered(100). Tie-break (cnt DESC, bigram ASC) is
    total, so the truncated set is deterministic cross-engine."""
    from etl_pipeline_project_spark.operators.text_analysis import ngram_pairs

    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select(F.explode(ngram_pairs("text")).alias("bigram"))
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(100)
    )


@_q(
    "q_fuzzy_match",
    """
    WITH q AS (
      SELECT p_partkey AS q_id, p_name AS q_text, p_brand AS blk
      FROM part WHERE p_partkey % 100 = 0
    )
    SELECT q.q_id, c.p_partkey AS c_id,
           CAST(levenshtein(q.q_text, c.p_name) AS INTEGER) AS edit_distance
    FROM q JOIN part c
      ON q.blk = c.p_brand
     AND q.q_id <> c.p_partkey
     AND abs(length(q.q_text) - length(c.p_name)) <= 4
    WHERE levenshtein(q.q_text, c.p_name) <= 4
    """,
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: levenshtein ≤ 4 between a probe set
    (every 100th part) and the catalog, blocked by brand + length band.
    The probe side broadcasts, so the 100 TB side never shuffles; the
    length band (necessary condition for edit distance) prunes
    candidates before any levenshtein evaluates."""
    part = load_table(spark, sf_dir, "part")
    probes = part.filter(F.col("p_partkey") % 100 == 0)
    return fuzzy_match(
        probes, part, "p_partkey", "p_partkey", "p_name", 4, block_col="p_brand"
    )


@_q(
    "q_embed_centroid",
    """
    WITH ex AS (
      SELECT label, CAST(i - 1 AS INTEGER) AS dim,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v_fp
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT label, dim, COUNT(*) AS n_vecs,
           CAST(SUM(v_fp) AS DOUBLE) / 1e6 / CAST(COUNT(*) AS DOUBLE) AS centroid
    FROM ex GROUP BY label, dim
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding centroid with order-independent exact
    accumulation: components floor to fixed-point micros (IEEE-exact,
    engine-portable), sum as int64 (associative ⇒ 1000-executor partials
    == single-node), divide back out in one final double op. The
    k-means-update / class-prototype primitive. One shuffle on
    (label, dim) after map-side posexplode + partial aggregation."""
    from etl_pipeline_project_spark.operators.similarity import centroid_fixed_point

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_fixed_point(emb, "label")


# ---------------------------------------------------------------------------
# Round-2 batch 2: corpus statistics, robust aggregation, runtime-filter
# and skew-join techniques as contract keys, the composed cleaning pass,
# stream-static enrichment, and unpivot.
# ---------------------------------------------------------------------------

_CATEGORY_SQL = (
    "CASE WHEN event_type IN ('click', 'view') THEN 'engagement' ELSE 'system' END"
)


def _event_category() -> F.Column:
    return (
        F.when(F.col("event_type").isin("click", "view"), F.lit("engagement"))
        .otherwise(F.lit("system"))
        .alias("category")
    )


@_q(
    "q_tfidf_top_terms",
    """
    WITH t AS (
      SELECT doc_id, term FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
      ) WHERE length(term) >= 3
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    pt AS (
      SELECT term, COUNT(*) AS total_tf, COUNT(DISTINCT doc_id) AS df
      FROM t GROUP BY term
    )
    SELECT term, total_tf, df,
           ROUND(CAST(total_tf AS DOUBLE)
                 * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
    FROM pt, n
    ORDER BY tfidf DESC, term ASC
    LIMIT 100
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF vocabulary: top-100 distinctive terms. Map-side
    tokenize+explode, ONE shuffle on the term key (total_tf and df in the
    same partial+final aggregate), broadcast scalar N, TakeOrdered(100).
    Integer aggregates ⇒ partials are exact; the single float op
    (tf·ln(N/df)) rounds to 6 dp for a stable cross-engine ordering."""
    from etl_pipeline_project_spark.operators.text_analysis import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=100)


@_q(
    "q_text_lm_quality",
    """
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9 ]', '_', 'g') AS s
      FROM documents),
    big0 AS (
      SELECT doc_id, s, unnest(generate_series(1, length(s) - 1)) AS i
      FROM norm),
    big AS (SELECT doc_id, substring(s, i, 2) AS bg FROM big0),
    model AS (SELECT bg, count(*) AS cnt FROM big GROUP BY 1),
    pref AS (SELECT substring(bg, 1, 1) AS c1, sum(cnt) AS tot
             FROM model GROUP BY 1),
    lp AS (
      SELECT m.bg,
             CAST(round(-log2((m.cnt + 1) / CAST(p.tot + 38 AS DOUBLE)) * 1e6)
                  AS BIGINT) AS nbits_micro
      FROM model m JOIN pref p ON substring(m.bg, 1, 1) = p.c1)
    SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(l.nbits_micro) AS DOUBLE) / (count(*) * 1e6) AS bits_per_char
    FROM big b JOIN lp l ON b.bg = l.bg
    GROUP BY 1
    """,
)
def q_text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-bigram LM quality score (KenLM-perplexity proxy): per-doc mean
    bits-per-char under the corpus's own Laplace-smoothed bigram model —
    the standard cheap quality filter for pretraining data (gibberish /
    wrong-charset / boilerplate docs score high). Closed 38-char alphabet
    ⇒ the model is ≤38² rows and broadcasts; scoring is a map-side
    explode + ONE per-doc shuffle accumulating integer micro-bits
    (order-independent — executor partials are exact)."""
    from etl_pipeline_project_spark.operators.text_analysis import lm_quality_score

    docs = load_table(spark, sf_dir, "documents")
    return lm_quality_score(docs, "doc_id", "text")


def _msum4(expr: str) -> str:
    return (
        f"CAST(CAST(ROUND(SUM(CAST({expr} AS DECIMAL(38,10))), 4) "
        "AS DECIMAL(38,4)) AS DOUBLE)"
    )


@_q(
    "q_winsorized_agg",
    f"""
    WITH th AS (
      SELECT event_type,
             ROUND(percentile_cont(0.05) WITHIN GROUP (ORDER BY value), 4) AS lo,
             ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY value), 4) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped,
           {_msum4('LEAST(GREATEST(value, lo), hi)')} AS winsorized_sum
    FROM events e JOIN th USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_winsorized_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clipped) aggregation: per-type p05/p95 fences
    from exact percentiles, values clipped into the fences, then an exact
    decimal sum — the robust-metrics primitive. Two aggregates over the
    same grouping key: the tiny fences table (one row per type)
    broadcasts back onto the fact scan, so the big side shuffles once.
    Fences round to 4 dp so the clip comparisons are engine-portable."""
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 4).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("hi"),
    )
    clipped = ev.join(F.broadcast(fences), on="event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "clipped"
        ),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("clipped"), 1).otherwise(0)).cast("long").alias("n_clipped"),
        exact_sum(F.col("w"), 4).alias("winsorized_sum"),
    )


@_q(
    "q_outlier_zscore",
    """
    WITH s AS (
      SELECT user_id,
             CAST(ROUND(value * 100, 0) AS HUGEINT) AS x,
             CAST(COUNT(*) OVER w AS HUGEINT) AS n,
             SUM(CAST(ROUND(value * 100, 0) AS HUGEINT)) OVER w AS s1,
             SUM(CAST(ROUND(value * 100, 0) AS HUGEINT)
                 * CAST(ROUND(value * 100, 0) AS HUGEINT)) OVER w AS s2
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN (n * x - s1) * (n * x - s1) > 9 * (n * s2 - s1 * s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM s GROUP BY user_id
    """,
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score outlier counts (|z| > 3, population σ) computed
    entirely in exact integer arithmetic: values scale to cents, the
    per-key moments S1/S2 come from one window pass, and the z test
    rewrites to (n·x−S1)² > 9·(n·S2−S1²) — no float division, so
    1000-executor partials and any accumulation order give the identical
    answer. One shuffle on user_id, reused by the window and the final
    aggregate (Catalyst sees the same partitioning — no second exchange)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.round(F.col("value") * 100, 0).cast("decimal(38,0)")
    w = Window.partitionBy("user_id")
    s = ev.select(
        "user_id",
        x.alias("x"),
        F.count(F.lit(1)).over(w).cast("decimal(38,0)").alias("n"),
        F.sum(x).over(w).cast("decimal(38,0)").alias("s1"),
        F.sum(x * x).over(w).cast("decimal(38,0)").alias("s2"),
    )
    # no ** (it routes through double): explicit decimal multiplies stay exact
    d = F.col("n") * F.col("x") - F.col("s1")
    rhs = F.lit(9).cast("decimal(38,0)") * (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    return s.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum(F.when(d * d > rhs, 1).otherwise(0)).cast("long").alias("n_outliers"),
    )


@_q(
    "q_interval_months",
    f"""
    WITH m AS (
      SELECT o_orderkey, o_totalprice,
             unnest(generate_series(date_trunc('month', o_orderdate),
                                    date_trunc('month', o_orderdate + INTERVAL 29 DAY),
                                    INTERVAL 1 MONTH)) AS month
      FROM orders
    )
    SELECT CAST(month AS TIMESTAMP) AS month,
           COUNT(*) AS n_active,
           {{MSUM}} AS active_value
    FROM m GROUP BY 1
    """.replace("{MSUM}", _msum("o_totalprice")),
)
def q_interval_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap aggregation — "how many orders are active in each
    calendar month", each order active for 30 days. Instead of a range
    join (every month × every order, O(n·m) comparisons), each interval
    explodes to the ≤2 month buckets it covers and the overlap becomes a
    plain equi-aggregate: map-only expansion, one shuffle on the month
    key. This bucketed decomposition is how interval joins stay linear at
    100 TB; the generic range-join fallback is q_join_range."""
    orders = load_table(spark, sf_dir, "orders")
    months = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col("o_orderdate")),
                F.date_trunc(
                    "month", F.col("o_orderdate") + F.expr("INTERVAL 29 DAYS")
                ),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month"),
    )
    return months.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_active"),
        money_sum(F.col("o_totalprice")).alias("active_value"),
    )


@_q(
    "q_bloom_prune_semi",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           {{MSUM}} AS total_value
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """.replace("{MSUM}", _msum("o_totalprice")),
)
def q_bloom_prune_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter semi join: the dim keys hash into a 4096-slot
    membership array (~32 KB) that broadcasts and prunes the fact scan
    *before* the exact semi join (operators/joins.py
    `coarse_bucket_semi_join`) — Spark's bloom-filter join rewrite made
    explicit. The pre-filter passes a superset, the exact join refines,
    so the answer never depends on the filter; at 100 TB the shuffle
    volume drops by ≈ the dim filter's selectivity."""
    from etl_pipeline_project_spark.operators.joins import coarse_bucket_semi_join

    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    hits = coarse_bucket_semi_join(orders, dim, "o_custkey", "c_custkey")
    return hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total_value"),
    )


@_q(
    "q_join_skew_salted",
    f"""
    WITH d AS (
      SELECT event_type, {_CATEGORY_SQL} AS category
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT d.category, COUNT(*) AS n_events,
           {{MSUM}} AS total_value
    FROM events e JOIN d USING (event_type)
    GROUP BY d.category
    """.replace("{MSUM}", _msum("value")),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe dimension join as a contract key: the fact side's join
    key has 5 distinct values (extreme skew — a hash join would put ~20%
    of 100 TB on each of 5 reducers), so the join salts the hot keys
    across 8 sub-partitions and replicates the 5-row dim once per salt
    (operators/joins.py `salted_join`). The oracle is the plain join —
    salting must be invisible in the result."""
    from etl_pipeline_project_spark.operators.joins import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.select("event_type").distinct().select("event_type", _event_category())
    joined = salted_join(ev, dim, "event_type", salt_parts=8)
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum(F.col("value")).alias("total_value"),
    )


_CLEAN_QUALITY_SQL = f"""
    (LEAST(CAST({_WC_SQL} AS DOUBLE) / 50.0, 1.0)
     + (1.0 - LEAST(({_PUNCT_SQL}) * 4, 1.0))
     + LEAST((CAST({_STOP_SQL} AS DOUBLE) / CAST(GREATEST({_WC_SQL}, 1) AS DOUBLE)) * 5, 1.0)
    ) / 3
"""


@_q(
    "q_clean_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id, source, {_BPE_SQL} AS n_tokens, {_FP_SQL} AS fp
      FROM documents
      WHERE lang = 'en' AND length(text) BETWEEN 100 AND 20000
        AND {_CLEAN_QUALITY_SQL} >= 0.5
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY source
    """,
)
def q_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style cleaning pass — language filter → length
    bounds → quality threshold → exact near-identity dedup (keep lowest
    doc_id per fingerprint) → corpus-mix report. All filters are map-only
    Catalyst expressions evaluated in one scan pass; the only shuffles
    are the fingerprint dedup and the final per-source aggregate. This is
    the end-to-end recipe the individual q_text_* / q_dedup_* keys
    exist to serve."""
    from etl_pipeline_project_spark.operators.text_analysis import (
        doc_fingerprint,
        quality_score,
        token_count_bpe,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = (
        docs.filter(F.col("lang") == "en")
        .filter(F.length("text").between(100, 20000))
        .filter(quality_score("text") >= 0.5)
        .select(
            "doc_id",
            "source",
            token_count_bpe("text").alias("n_tokens"),
            doc_fingerprint("text").alias("fp"),
        )
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@_q(
    "q_stream_join",
    f"""
    WITH d AS (
      SELECT event_type, {_CATEGORY_SQL} AS category
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start, category,
           COUNT(*) AS n_events
    FROM events e JOIN d USING (event_type)
    GROUP BY 1, 2
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: each micro-batch joins the unbounded
    events stream to a broadcast static dimension (stateless — no join
    state store), then a watermarked tumbling-day aggregate by the
    enriched attribute. The final availableNow state equals the batch
    join+aggregate (the oracle)."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        stream_static_enrich,
    )

    static_ev = load_table(spark, sf_dir, "events")
    dim = static_ev.select("event_type").distinct().select(
        "event_type", _event_category()
    )
    enriched = stream_static_enrich(read_events_stream(spark, sf_dir), dim, "event_type")
    out = (
        enriched.groupBy(F.window(F.col("ts"), "1 day"), "category")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("day_start"), "category", "n_events")
    )
    return run_to_memory(out, output_mode="complete")


@_q(
    "q_unpivot",
    f"""
    WITH u AS (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    )
    SELECT measure, COUNT(*) AS n_rows, {{MSUM}} AS total
    FROM u GROUP BY measure
    """.replace("{MSUM}", _msum("val")),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of the lineitem measures, then a grouped
    exact sum per measure. Spark's native `unpivot` expands map-side
    (no shuffle for the reshape itself — the only exchange is the final
    3-group aggregate); the DuckDB twin is the UNION ALL formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("val")).alias("total"),
    )


# ---------------------------------------------------------------------------
# Round-2 batch 3: product-analytics surface (funnel, retention, rolling
# time windows, calendar gap-fill) and lakehouse small-file compaction.
# ---------------------------------------------------------------------------


@_q(
    "q_funnel",
    """
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
      FROM s1
    ),
    s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3
      FROM s2
    ),
    u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
          FROM s3 GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(t1) AS n_signup,
           COUNT(t2) AS n_click_after_signup,
           COUNT(t3) AS n_purchase_after_click
    FROM u
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → later click → later purchase): per-user
    stage timestamps via three chained min-over-partition windows, then
    one global rollup. All three Window operators share the user_id
    partitioning, so Catalyst plans ONE exchange for the whole funnel —
    the chained-window formulation avoids the classic 3-self-join funnel
    (3 shuffles of the full fact table) entirely."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    ev = load_table(spark, sf_dir, "events")
    s1 = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w).alias("t1"),
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_click_after_signup"),
        F.count("t3").alias("n_purchase_after_click"),
    )


@_q(
    "q_retention_cohort",
    """
    WITH f AS (
      SELECT user_id, ts,
             MIN(date_trunc('month', ts)) OVER (PARTITION BY user_id) AS cohort
      FROM events
    )
    SELECT CAST(cohort AS TIMESTAMP) AS cohort_month,
           CAST(datediff('month', cohort, date_trunc('month', ts)) AS INTEGER)
             AS months_since,
           COUNT(DISTINCT user_id) AS n_active_users
    FROM f
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity month,
    counted distinct in each subsequent month offset — the
    product-analytics staple. One window pass for the cohort assignment
    (shuffle on user_id) + one distinct aggregate on (cohort, offset).
    months_between on month-truncated timestamps is integral, so the
    offset is exact cross-engine."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    f = ev.select(
        "user_id",
        F.min(F.date_trunc("month", F.col("ts"))).over(w).alias("cohort_month"),
        F.date_trunc("month", F.col("ts")).alias("activity_month"),
    )
    return (
        f.select(
            "user_id",
            "cohort_month",
            F.months_between("activity_month", "cohort_month")
            .cast("int")
            .alias("months_since"),
        )
        .groupBy("cohort_month", "months_since")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@_q(
    "q_window_range_time",
    """
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))) OVER w, 2)
                AS DECIMAL(38,2)) AS DOUBLE) AS sum_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day per-user event count and exact sum via a TIME-RANGE
    window frame (not row-count): the frame key is unix microseconds, so
    `RANGE 604800000000 PRECEDING` is exactly "the last 7 days" at full
    timestamp precision on both engines, duplicate-timestamp peers
    included. One shuffle on user_id + one sort per partition; the
    decimal accumulator keeps the rolling sum order-independent."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-604_800_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
        F.round(F.sum(F.col("value").cast("decimal(38,10)")).over(w), 2)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("sum_7d"),
    )


@_q(
    "q_gap_fill",
    """
    WITH span AS (
      SELECT user_id,
             date_trunc('day', MIN(ts)) AS d0,
             date_trunc('day', MAX(ts)) AS d1
      FROM events GROUP BY user_id
    ),
    cal AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span
    ),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT cal.user_id, CAST(cal.day AS TIMESTAMP) AS day,
           COALESCE(daily.n, 0) AS n_events
    FROM cal LEFT JOIN daily USING (user_id, day)
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: densify each user's activity to a contiguous
    daily series (zero-filled) between their first and last event — the
    prerequisite for any rolling/365-day metric downstream. The calendar
    side generates from the per-user span (two tiny aggregates), so the
    join is (users × days) against the daily rollup, both pre-shrunk —
    the raw fact table is never joined row-level."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return cal.join(daily, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce("n", F.lit(0)).alias("n_events")
    )


@_q(
    "q_compact_files",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           {{MSUM}} AS total_value
    FROM events GROUP BY event_type
    """.replace("{MSUM}", _msum("value")),
)
def q_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance op every streaming
    ingest needs: a fragmented landing zone (64 shards here, standing in
    for per-micro-batch files) is rewritten into size-targeted files in
    one distributed pass (`repartition` + `maxRecordsPerFile`), then read
    back. Content must be byte-for-byte the same table (the oracle); the
    file-count collapse is asserted in tests. At 100 TB this is the
    difference between a scan planning 10M splits and 10k."""
    from etl_pipeline_project_spark.sources.sinks import compact_parquet

    ev = load_table(spark, sf_dir, "events")
    landing = f"{_SCRATCH}/compact_landing_{spark.sparkContext.applicationId}"
    compacted = f"{_SCRATCH}/compact_out_{spark.sparkContext.applicationId}"
    ev.repartition(64).write.mode("overwrite").parquet(landing)
    compact_parquet(spark, landing, compacted, target_partitions=4)
    out = spark.read.parquet(compacted)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum(F.col("value")).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Round-2 batch 4: CSV staging round-trip, balanced per-class sampling,
# corpus length histogram, bag-semantics EXCEPT ALL, null-safe join, and
# schema-evolution reads.
# ---------------------------------------------------------------------------


@_q(
    "q_scan_csv_roundtrip",
    """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events GROUP BY event_type
    """,
)
def q_scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV staging round-trip as a contract key (reference staging tier,
    `data/utils.py:6-45`): events → partitioned CSV prefix → glob read
    with the explicit schema (no inference, SURVEY §1.4 Q2) → aggregate.
    Timestamps cross CSV as ISO strings; the aggregate projects only
    engine-portable columns (cents as integers — CSV carries no float
    precision contract)."""
    import pyspark.sql.types as T

    from etl_pipeline_project_spark.sources.readers import read_csv_glob
    from etl_pipeline_project_spark.sources.sinks import write_csv

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = f"{_SCRATCH}/csv_stage_{spark.sparkContext.applicationId}"
    write_csv(ev, out, partition_by=["event_type"])
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # partition column event_type comes back from the directory layout
    back = read_csv_glob(spark, out, schema)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("value_cents"),
    )


@_q(
    "q_balanced_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source, rn FROM ranked WHERE rn <= 50
    """,
)
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-class sampling: exactly ≤N docs per source, chosen by
    rank over a hash of the id — the class-rebalancing primitive for
    training mixes. Hash-ordering makes the pick pseudo-random yet a pure
    function of the id: stable across runs, engines and cluster sizes
    (rand() would be none of those). One shuffle on the class key; at
    100 TB per-class TopK pushes partial limits map-side."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
    )


@_q(
    "q_length_histogram",
    f"""
    WITH t AS (SELECT {_BPE_SQL} AS n_tokens FROM documents)
    SELECT CAST(n_tokens // 64 AS BIGINT) AS bucket,
           CAST(n_tokens // 64 * 64 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM t GROUP BY 1, 2
    """,
)
def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (64-token buckets) — the sequence-length
    distribution every packing/truncation decision reads. Map-side
    tokenize + integer bucketing, one tiny aggregate; nothing but the
    histogram leaves the executors."""
    from etl_pipeline_project_spark.operators.text_analysis import token_count_bpe

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(token_count_bpe("text").alias("n_tokens"))
    b = F.floor(F.col("n_tokens") / 64).cast("long")
    return t.groupBy(
        b.alias("bucket"), (b * 64).cast("long").alias("bucket_lo")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@_q(
    "q_set_except_all",
    """
    SELECT l_orderkey AS order_key FROM lineitem WHERE l_linestatus = 'O'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each occurrence on the right cancels
    ONE occurrence on the left (multiplicity arithmetic, not membership).
    The distinct-semantics variant is q_set_except; both plan as one
    shuffle on the full row."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_orderkey").alias("order_key")
    )
    right = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("order_key")
    )
    return left.exceptAll(right)


@_q(
    "q_join_null_safe",
    """
    WITH l AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k
      FROM events
    ),
    d AS (
      SELECT DISTINCT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS k
      FROM events
    )
    SELECT d.k AS event_kind, COUNT(*) AS n_events
    FROM l JOIN d ON l.k IS NOT DISTINCT FROM d.k
    GROUP BY d.k
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    each other instead of silently dropping — the semantics a plain equi
    join gets wrong when the join key is nullable. Catalyst plans `<=>`
    as a hash join key (not a cartesian + filter), so it broadcasts and
    scales exactly like `=`."""
    ev = load_table(spark, sf_dir, "events")
    k = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(
        F.col("event_type")
    )
    left = ev.select("event_id", k.alias("k"))
    dim = ev.select(k.alias("dk")).distinct()
    return (
        left.join(F.broadcast(dim), left["k"].eqNullSafe(dim["dk"]))
        .groupBy(F.col("dk").alias("event_kind"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@_q(
    "q_schema_evolution",
    """
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority
    FROM orders
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches with different
    schemas (the second adds o_orderpriority) unify under
    ``mergeSchema`` — old files surface NULL for the added column, no
    rewrite of historical data. This is how a 100 TB table takes a new
    column for free; the oracle synthesizes the same null pattern."""
    orders = load_table(spark, sf_dir, "orders")
    out = f"{_SCRATCH}/schema_evo_{spark.sparkContext.applicationId}"
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(f"{out}/batch=1")
    v2.write.mode("overwrite").parquet(f"{out}/batch=2")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Round-2 batch 5: training-batch assembly (sequence packing), tokenizer
# evaluation (vocabulary coverage / OOV rate), and corpus entropy.
# ---------------------------------------------------------------------------


@_q(
    "q_pack_sequences",
    f"""
    WITH t AS (
      SELECT doc_id, source, {_BPE_SQL} AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin_id,
           CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign documents to fixed-capacity (2048-token)
    training bins by contiguous fill in doc_id order per source: bin_id =
    floor(preceding-cumsum / capacity). Unlike first-fit-decreasing
    (inherently sequential, driver-bound), contiguous fill is one window
    cumsum — a single shuffle on source + per-partition sort, fully
    distributed, and a pure function of the corpus (stable across runs and
    cluster sizes). Docs longer than the capacity simply span bins, which
    is exactly how packed pre-training batches treat overlong documents."""
    from pyspark.sql import Window

    from etl_pipeline_project_spark.operators.text_analysis import token_count_bpe

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", token_count_bpe("text").alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / 2048).cast("long").alias("bin_id"),
        (start % 2048).cast("long").alias("bin_offset"),
    )


@_q(
    "q_vocab_coverage",
    """
    WITH toks AS (
      SELECT doc_id, term FROM (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
      )
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
        ORDER BY cnt DESC, term ASC LIMIT 64
      )
    ),
    marked AS (
      SELECT t.doc_id, CASE WHEN v.term IS NULL THEN 0 ELSE 1 END AS hit
      FROM toks t LEFT JOIN vocab v USING (term)
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(hit) AS BIGINT) AS n_in_vocab,
           CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_oov
    FROM marked GROUP BY doc_id
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV-rate report: build the top-64 corpus
    vocabulary (frequency-ranked, term tie-break), then mark every token
    in-vocab or OOV per document — the tokenizer-evaluation loop. The
    vocabulary is two aggregates + TakeOrdered (tiny), then broadcasts
    into a map-side LEFT join against the exploded token stream: the
    100 TB side shuffles once (the per-doc rollup), never for the probe."""
    c = F.lower(F.col("text"))
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(c, F.lit("[a-z]+"), 0)).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(64)
        .select("term", F.lit(1).alias("hit"))
    )
    marked = toks.join(F.broadcast(vocab), on="term", how="left").select(
        "doc_id", F.coalesce("hit", F.lit(0)).alias("hit")
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("hit").cast("long").alias("n_in_vocab"),
        (F.count(F.lit(1)) - F.sum("hit")).cast("long").alias("n_oov"),
    )


@_q(
    "q_source_entropy",
    """
    WITH tc AS (
      SELECT source, term, COUNT(*) AS c FROM (
        SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
      ) GROUP BY source, term
    ),
    tot AS (SELECT source, SUM(c) AS n, COUNT(*) AS n_terms FROM tc GROUP BY source)
    SELECT tc.source,
           CAST(MAX(tot.n) AS BIGINT) AS n_tokens,
           CAST(MAX(tot.n_terms) AS BIGINT) AS n_distinct_terms,
           ROUND(ln(CAST(MAX(tot.n) AS DOUBLE))
                 - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                   / CAST(MAX(tot.n) AS DOUBLE), 4) AS token_entropy_nats
    FROM tc JOIN tot USING (source)
    GROUP BY tc.source
    """,
)
def q_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token Shannon entropy (nats) — the corpus-diversity
    metric a data-mix dashboard tracks (low entropy = repetitive/templated
    source). Uses H = ln(N) − Σc·ln(c)/N so the only cross-engine float
    work is one ln per distinct term and one final sum, rounded to 4 dp;
    counts stay integer-exact through both shuffles (term rollup → source
    rollup)."""
    c = F.lower(F.col("text"))
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source",
            F.explode(F.regexp_extract_all(c, F.lit("[a-z]+"), 0)).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tc.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_terms")
    )
    joined = tc.join(F.broadcast(tot), on="source")
    return joined.groupBy("source").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.max("n_terms").cast("long").alias("n_distinct_terms"),
        F.round(
            F.log(F.max("n").cast("double"))
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            / F.max("n").cast("double"),
            4,
        ).alias("token_entropy_nats"),
    )


# ---------------------------------------------------------------------------
# Round-2 batch 6: lakehouse maintenance — batch MERGE (upsert) and
# incremental aggregate maintenance (associative partial-state merge).
# ---------------------------------------------------------------------------


@_q(
    "q_merge_upsert",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderdate >= TIMESTAMP '1996-06-01'
                THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
    FROM orders
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE: load the full orders table as the target, then merge a
    change set (every order from 1996-06 on, with doubled totalprice) —
    matched keys take the change row, unmatched rows survive, and the
    read-back equals the oracle's CASE projection. ×2 is an exact IEEE
    op, so the updated values are engine-portable."""
    from etl_pipeline_project_spark.sources.sinks import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    out = f"{_SCRATCH}/merge_upsert_{spark.sparkContext.applicationId}"
    base = orders.select("o_orderkey", "o_totalprice")
    base.write.mode("overwrite").parquet(out)
    changes = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-06-01").cast("timestamp")
    ).select("o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice"))
    merge_upsert(spark, out, changes, "o_orderkey")
    return spark.read.parquet(out)


@_q(
    "q_incr_agg_maintenance",
    f"""
    SELECT event_type, COUNT(*) AS n_events, {{MSUM}} AS total_value
    FROM events GROUP BY event_type
    """.replace("{MSUM}", _msum("value")),
)
def q_incr_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (materialized-view refresh): the
    standing aggregate state is kept as mergeable partials (count +
    DECIMAL sum — both associative and commutative), a new batch produces
    its own partials, and refresh is partial ⊎ partial — the new batch is
    touched once and the base table never re-scanned. The oracle is the
    full recompute, which must be indistinguishable. Decimal partials are
    what make this sound: float partials would make the refreshed state
    depend on merge order."""
    ev = load_table(spark, sf_dir, "events")
    state_path = f"{_SCRATCH}/agg_state_{spark.sparkContext.applicationId}"

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,10)")).alias("s"),
        )

    # standing state from the "old" half, new batch = the other half
    partials(ev.filter(F.col("event_id") % 2 == 0)).write.mode("overwrite").parquet(
        state_path
    )
    state = spark.read.parquet(state_path)
    delta = partials(ev.filter(F.col("event_id") % 2 == 1))
    refreshed = (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    return refreshed.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("s"), 2).cast("decimal(38,2)").cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Round-2 batch 7: the rest of the §2.I extension surface (grouped-agg
# pandas UDF, Python UDTF) and the cogroup/merge_asof scale path as a
# contract key.
# ---------------------------------------------------------------------------


@_q(
    "q_join_asof_grouped",
    """
    SELECT e.event_id, e.user_id, c."r_value"
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value AS "r_value" FROM events
                    WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def q_join_asof_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, streaming scale path: both sides union into one stream,
    hash-partition on the key, sort within partitions by (key, ts, side),
    then one ``mapInPandas`` pass forward-fills the last right value —
    executor memory is one Arrow batch regardless of key skew (the round-3
    cogroup form held whole key groups; it survives as asof_join_cogroup
    with an explicit max_group_rows guard). The shape for dense per-key
    timelines where the composition form's range-join candidate set
    explodes. Same semantics as q_join_asof (asserted equivalent in
    tests); DuckDB's native ASOF JOIN is the oracle."""
    from etl_pipeline_project_spark.operators.joins import asof_join_grouped

    # project before the stream union: every column here crosses Arrow twice
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
    )
    out = asof_join_grouped(
        ev, clicks, key="user_id", left_ts="ts", right_ts="ts", right_value="value"
    )
    return out.select("event_id", "user_id", "r_value")


@_q(
    "q_udaf_grouped_median",
    """
    SELECT event_type,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4)
             AS median_value
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate via grouped-agg Pandas UDF: exact per-group
    median computed in Arrow-shipped numpy. Each group's sort stays
    inside its executor; only (group, scalar) leaves. The built-in
    percentile path is q_quantiles — this key exists to exercise the
    UDAF extension surface against the same oracle semantics."""
    from etl_pipeline_project_spark.functions.udfs import median_udaf

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(median_udaf("value"), 4).alias("median_value")
    )


@_q(
    "q_udtf_split",
    """
    SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos, toks[t.i] AS token
    FROM (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE n_chars > 0
    ), UNNEST(generate_series(1, LEAST(len(toks), 5))) AS t(i)
    """,
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) via LATERAL join: one output row per
    token of each document's first 5 space-split tokens. Row-at-a-time
    Python — deliberately the slow path (explode/split is the fast
    path, q_doc_chunk/q_text_token_count); registered and invoked
    through SQL to exercise the full UDTF surface."""
    from etl_pipeline_project_spark.functions.udfs import SplitWordsUDTF
    from etl_pipeline_project_spark.sources.catalog import register_testdata_views

    if SplitWordsUDTF is None:  # pragma: no cover
        raise NotImplementedError("Python UDTFs need Spark 4.x")
    register_testdata_views(spark, sf_dir)
    spark.udtf.register("split_words", SplitWordsUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.token
        FROM documents d, LATERAL split_words(d.text, 5) s
        WHERE d.n_chars > 0
        """
    )


# ---------------------------------------------------------------------------
# Round-2 batch 8: retrieval & classification — BM25 full-text scoring,
# k-NN majority-vote classification, shingle containment dedup.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "scan")


@_q(
    "q_search_bm25",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                  * CAST(n_docs AS DOUBLE) / CAST(total_toks AS DOUBLE)))
               * 1e6, 0) AS BIGINT) AS s_fp
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    )
    SELECT doc_id, COUNT(*) AS n_terms_hit, CAST(SUM(s_fp) AS BIGINT) AS bm25_micros
    FROM scored GROUP BY doc_id
    ORDER BY bm25_micros DESC, doc_id LIMIT 20
    """,
)
def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text retrieval: BM25 top-20 for the query {join, hash, scan}
    (k1=1.2, b=0.75, Lucene-style idf). The per-(doc,term) score is one
    deterministic float expression over integer stats (tf, df, dl, N,
    Σdl), then ROUNDS TO MICRO-UNITS and sums as int64 — so the per-doc
    score is order-independent (float partial sums would drift across
    engines/partitionings) and the top-20 ordering is pure integer.
    Plan: tokenize once, doc-length + tf + df from the same exploded
    stream, tiny df/stats broadcast back, TakeOrdered(20)."""
    c = F.lower(F.col("text"))
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(c, F.lit("[a-z]+"), 0)).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_toks"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = F.col("n_docs").cast("double")
    idf = F.log(
        (nd - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    norm = F.lit(1.2) * (
        F.lit(0.25)
        + F.lit(0.75)
        * F.col("dl").cast("double")
        * nd
        / F.col("total_toks").cast("double")
    )
    s_fp = F.round(idf * (tfd * F.lit(2.2)) / (tfd + norm) * F.lit(1e6), 0).cast("long")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s_fp.alias("s_fp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.sum("s_fp").cast("long").alias("bm25_micros"),
        )
        .orderBy(F.col("bm25_micros").desc(), F.col("doc_id"))
        .limit(20)
    )


@_q(
    "q_knn_classify",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10),
    s AS (
      SELECT q.qid, e.vec_id AS nid, e.label,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY {_DOT_SQL.format(a='q.qvec', b='e.embedding')} DESC, e.vec_id
             ) AS rk
      FROM embeddings e, q WHERE e.vec_id <> q.qid
    ),
    votes AS (SELECT qid, label, COUNT(*) AS votes FROM s WHERE rk <= 5 GROUP BY qid, label),
    best AS (
      SELECT qid, label, votes,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rr
      FROM votes
    )
    SELECT qid, label AS predicted_label, votes FROM best WHERE rr = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification (k=5, majority vote, ties → lowest label): the
    label-propagation / weak-annotation primitive over the embedding
    corpus. Same broadcast-queries map-side-scored plan as
    q_ann_bruteforce (the corpus never shuffles), plus two tiny
    aggregates over the 10×5 neighbor rows. Vote counts are integers, the
    dot-product ordering is bit-identical cross-engine."""
    from etl_pipeline_project_spark.operators.similarity import dot_product
    from etl_pipeline_project_spark.operators.windows import topk_per_group

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    scored = (
        emb.select(F.col("vec_id").alias("nid"), F.col("label"), F.col("embedding"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid", "nid", "label", dot_product("qvec", "embedding").alias("score")
        )
    )
    top = topk_per_group(
        scored, "qid", [F.col("score").desc(), F.col("nid")], 5, rank_col="rk"
    )
    votes = top.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("votes"))
    best = topk_per_group(
        votes, "qid", [F.col("votes").desc(), F.col("label")], 1, rank_col="rr"
    )
    return best.select("qid", F.col("label").alias("predicted_label"), "votes")


@_q(
    "q_dedup_containment",
    f"""
    WITH sh AS (SELECT doc_id, source, {_SHINGLE_SQL} AS s FROM documents)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / CAST(GREATEST(len(a.s), 1) AS DOUBLE) AS containment
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id <> b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / CAST(GREATEST(len(a.s), 1) AS DOUBLE) >= 0.15
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle containment |A∩B|/|A| — catches near-SUPERSET
    duplicates (a short doc quoted inside a long one) that Jaccard
    misses because the union is dominated by the long side. Same
    inverted-index plan as q_ngram_jaccard; directed pairs."""
    from etl_pipeline_project_spark.operators.dedup_text import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", "source", k=3, threshold=0.15)


# ---------------------------------------------------------------------------
# Round-2 batch 9: native streaming session windows.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_session",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           COUNT(*) AS n_events
    FROM islands GROUP BY user_id, sid
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows — `session_window(ts, '30 minutes')`
    merges events into dynamic per-key sessions in the state store, the
    native streaming form of q_sessionize's batch gap-islands. Session
    ranges are [start, last+gap): a gap of exactly 30 min starts a new
    session, which the batch twin mirrors with `>= 1800s ⇒ new island`.
    Complete output mode; final availableNow state = the batch result."""
    from etl_pipeline_project_spark.streaming.ops import read_events_stream, run_to_memory

    stream = read_events_stream(spark, sf_dir)
    out = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.session_window(F.col("ts"), "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    return run_to_memory(out, output_mode="complete")


# ---------------------------------------------------------------------------
# Round-2 batch 10: geo-spatial radius join over the reference's
# places domain (tourism lat/lng).
# ---------------------------------------------------------------------------

_GEO_PROBES = [(0.5, 95.0), (30.0, 130.0), (55.0, 180.0)]

from etl_pipeline_project_spark.plans.adapter import ADAPTER_CTE as _ADAPTER_CTE  # noqa: E402


@_q(
    "q_geo_radius_join",
    _ADAPTER_CTE
    + """
    , probes(probe_id, qlat, qlng) AS (
      SELECT * FROM (VALUES (0, 0.5e0, 95.0e0), (1, 30.0e0, 130.0e0),
                            (2, 55.0e0, 180.0e0)) t
    )
    SELECT probe_id, place_id,
           sqrt((lat - qlat) * (lat - qlat) + (lng - qlng) * (lng - qlng))
             AS degree_dist
    FROM places, probes
    WHERE lat IS NOT NULL
      AND lat BETWEEN qlat - 40.0e0 AND qlat + 40.0e0
      AND lng BETWEEN qlng - 40.0e0 AND qlng + 40.0e0
      AND sqrt((lat - qlat) * (lat - qlat) + (lng - qlng) * (lng - qlng)) <= 40.0e0
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo radius join over the reference's places domain: all places
    within distance R of each probe point. The bounding-box prefilter
    (pure comparisons, pushable to the scan) prunes before the distance
    evaluates — the standard spatial-join shape; at 100 TB the box becomes
    a geohash-cell equi-join (same decomposition as q_interval_months).
    Distance is degree-space euclidean: -, ×, +, sqrt are all IEEE
    correctly-rounded, so the values and the radius cut are bit-identical
    cross-engine (haversine's libm trig would not be)."""
    from etl_pipeline_project_spark.plans.adapter import derive_reference_tables

    places = derive_reference_tables(spark, sf_dir)["places"].filter(
        F.col("lat").isNotNull()
    )
    probes = spark.createDataFrame(
        [(i, la, ln) for i, (la, ln) in enumerate(_GEO_PROBES)],
        ["probe_id", "qlat", "qlng"],
    )
    r = F.lit(40.0)
    boxed = (
        places.crossJoin(F.broadcast(probes))
        .filter(F.col("lat").between(F.col("qlat") - r, F.col("qlat") + r))
        .filter(F.col("lng").between(F.col("qlng") - r, F.col("qlng") + r))
    )
    dist = F.sqrt(
        (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat"))
        + (F.col("lng") - F.col("qlng")) * (F.col("lng") - F.col("qlng"))
    )
    return boxed.select(
        "probe_id", "place_id", dist.alias("degree_dist")
    ).filter(F.col("degree_dist") <= r)


# ---------------------------------------------------------------------------
# Round-2 batch 11: bucketed co-located join as a contract key, and two
# null-semantics showcases (anti join vs NOT IN, explode_outer).
# ---------------------------------------------------------------------------


@_q(
    "q_join_bucketed",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           {{MSUM}} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """.replace("{MSUM}", _msum("l_extendedprice * (1 - l_discount)")),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join: both tables are written
    bucketed+sorted on the join key, so the join plans SortMergeJoin with
    ZERO exchange — the bucket layout IS the shuffle, paid once at write
    time and amortized over every subsequent join. This is the core
    technique for a repeatedly-joined 100 TB fact pair; the plan property
    (no Exchange) is asserted in tests/test_scale_techniques.py and the
    result must equal the plain join (the oracle)."""
    import hashlib

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # the bucket layout is the ONE-TIME cost this technique amortizes, so
    # build it once per input dataset (sf-tagged table names) and reuse it
    # on every subsequent call — re-bucketing per query would charge the
    # write to every join, which is exactly what bucketing exists to avoid
    tag = _fp_tag(sf_dir, "orders")
    t_orders, t_li = f"bq_orders_{tag}", f"bq_lineitem_{tag}"
    if not spark.catalog.tableExists(t_orders) or not spark.catalog.tableExists(t_li):
        # explicit paths: saveAsTable would otherwise land in
        # $PWD/spark-warehouse, which under a caller-supplied session may
        # be outside the repo
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).option("path", f"{_SCRATCH}/{t_orders}").saveAsTable(t_orders)
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).option("path", f"{_SCRATCH}/{t_li}").saveAsTable(t_li)
    joined = spark.table(t_orders).join(
        spark.table(t_li), F.col("o_orderkey") == F.col("l_orderkey")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@_q(
    "q_anti_null_semantics",
    """
    WITH keys AS (
      SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderpriority = '1-URGENT'
    )
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM keys WHERE keys.k = c_custkey)
    """,
)
def q_anti_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join against a key set CONTAINING NULLS — the classic NOT IN
    trap: `NOT IN (…, NULL)` is three-valued and returns zero rows, while
    left_anti / NOT EXISTS ignores the nulls and answers the question
    actually asked. The engine's anti-join operator deliberately has
    NOT-EXISTS semantics (SURVEY §1.4 discipline); this key pins that
    choice cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select(
        F.when(F.col("o_orderkey") % 1000 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return cust.join(keys, on="c_custkey", how="left_anti")


@_q(
    "q_explode_outer",
    """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{12,}') AS long_words
      FROM documents
    )
    SELECT doc_id, CASE WHEN len(long_words) = 0 THEN NULL ELSE w END AS long_word
    FROM toks LEFT JOIN LATERAL (SELECT unnest(long_words) AS w) u ON TRUE
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — array flattening that PRESERVES rows with empty
    arrays (NULL element) instead of silently dropping them. The
    difference between "docs and their rare long words" and "only docs
    that have long words" — an audit query needs the former; plain
    explode quietly gives the latter."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]{12,}"), 0).alias(
            "long_words"
        ),
    )
    return toks.select("doc_id", F.explode_outer("long_words").alias("long_word"))


# ---------------------------------------------------------------------------
# Batch 12 — partition-pruned sink, argmax/conditional aggregates, a
# data-quality gate, lexical repetition, string/date function suites, and
# zero-filled dimension grids.
# ---------------------------------------------------------------------------


@_q(
    "q_sink_partitioned",
    """
    SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
           count(*) AS n_orders,
           CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
    FROM orders
    WHERE year(o_orderdate) = 1997
    GROUP BY 1, 2
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-PRUNED read-back: the
    layout that makes a 100 TB fact table queryable. Writing with
    ``partitionBy(year)`` turns the year predicate into directory pruning —
    the 1997 query never opens a non-1997 file (PartitionFilters in the
    scan node, asserted in tests/test_scale_techniques.py). The reference
    rewrites whole tables per load (`data/transformation_dw.py`
    ``if_exists='replace'``); partitioned overwrite is the scalable form —
    each load replaces only its own partition."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = f"{_SCRATCH}/orders_by_year_{spark.sparkContext.applicationId}"
    orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_year") == 1997)
    return back.groupBy("o_year", F.month("o_orderdate").alias("o_month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )


@_q(
    "q_agg_argmax",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
        row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
      FROM orders
    )
    SELECT o_orderpriority,
           max(CASE WHEN rd = 1 THEN o_orderkey END) AS top_orderkey,
           max(CASE WHEN ra = 1 THEN o_orderkey END) AS bottom_orderkey,
           max(o_totalprice) AS top_price,
           min(o_totalprice) AS bottom_price
    FROM ranked GROUP BY 1
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin as a single aggregate (``max_by``/``min_by`` with a
    struct tie-break) — the "which row achieved the extreme" question
    answered WITHOUT a window sort: one partial-aggregable pass instead of
    a per-group ordering, which at 100 TB is the difference between a
    map-side combine and a full shuffle-sort. The oracle pins identical
    semantics through DuckDB window functions (DuckDB's arg_max cannot
    express the composite tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("max_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "top_orderkey"
        ),
        F.expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").alias(
            "bottom_orderkey"
        ),
        F.max("o_totalprice").alias("top_price"),
        F.min("o_totalprice").alias("bottom_price"),
    )


@_q(
    "q_agg_conditional",
    """
    SELECT l_returnflag,
           count(*) FILTER (l_quantity > 25) AS n_bulk,
           count(*) FILTER (l_discount > 0.05) AS n_discounted,
           bool_and(l_tax >= 0) AS all_taxed,
           bool_or(l_quantity >= 49) AS has_jumbo
    FROM lineitem GROUP BY 1
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — COUNT ... FILTER and boolean AND/OR
    aggregates in one grouped pass. The reference computes per-condition
    counts with separate filtered dataframes (one scan per condition);
    folding every condition into a single aggregate reads the table once
    regardless of condition count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_bulk"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.expr("bool_and(l_tax >= 0)").alias("all_taxed"),
        F.expr("bool_or(l_quantity >= 49)").alias("has_jumbo"),
    )


@_q(
    "q_dq_checks",
    """
    SELECT 'positive_total' AS rule,
           count(*) FILTER (NOT COALESCE(o_totalprice > 0, FALSE)) AS n_violations,
           count(*) AS n_rows
    FROM orders
    UNION ALL
    SELECT 'known_status',
           count(*) FILTER (NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'has_custkey', count(*) FILTER (o_custkey IS NULL), count(*) FROM orders
    UNION ALL
    SELECT 'urgent_not_pending',
           count(*) FILTER (NOT COALESCE(o_orderpriority <> '1-URGENT'
                                         OR o_orderstatus <> 'P', FALSE)),
           count(*)
    FROM orders
    """,
)
def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/profiling.py
    ``dq_violations``): per-rule violation counts in ONE scan. Replaces
    the reference's blind ``dropna`` quality policy
    (`data/transformation_db.py:87-96`) with evidence: nothing is
    destroyed, every rule reports, downstream decides."""
    orders = load_table(spark, sf_dir, "orders")
    return dq_violations(
        orders,
        [
            ("positive_total", F.col("o_totalprice") > 0),
            ("known_status", F.col("o_orderstatus").isin("O", "F", "P")),
            ("has_custkey", F.col("o_custkey").isNotNull()),
            (
                "urgent_not_pending",
                (F.col("o_orderpriority") != "1-URGENT")
                | (F.col("o_orderstatus") != "P"),
            ),
        ],
    )


@_q(
    "q_text_ttr",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id, len(words) AS n_tokens, len(list_distinct(words)) AS n_types,
           1 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS rep_ratio
    FROM toks
    """,
)
def q_text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical repetition (1 − type/token ratio) — the C4-style
    within-document repetition signal used to drop template/boilerplate
    pages from training corpora. Pure Catalyst array expressions, map-only:
    no shuffle, no Python, scales linearly with corpus bytes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        (
            1
            - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("rep_ratio"),
    )


@_q(
    "q_string_suite",
    """
    SELECT c_custkey,
           split_part(c_name, '#', 2) AS cust_num,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_folded,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len
    FROM customer
    """,
)
def q_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (§2.F): split_part / lpad / translate /
    substring / length — the reference's pandas ``.str`` pipeline
    (`data/transformation_db.py:133-139`) re-expressed as JVM-side
    Catalyst expressions inside whole-stage codegen; no Python touches the
    hot path."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_folded"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.length(F.col("c_name")).alias("name_len"),
    )


@_q(
    "q_date_suite",
    """
    SELECT o_orderkey,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_trunc('week', o_orderdate) AS week_start,
           dayofyear(o_orderdate) AS doy,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           quarter(o_orderdate) AS qtr
    FROM orders
    """,
)
def q_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function surface (§2.F): last_day / week truncation /
    day-of-year / day arithmetic / quarter — the calendar derivations the
    reference hand-rolls in Python per-row (`data/transformation_dw.py`
    dim_waktu fields), as vectorized JVM expressions. Both engines
    truncate weeks to Monday; the week column is cast to date because
    DuckDB's week-trunc yields DATE while Spark's yields TIMESTAMP."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_95"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@_q(
    "q_grid_zero_fill",
    """
    WITH pri AS (SELECT DISTINCT o_orderpriority FROM orders),
         st  AS (SELECT DISTINCT o_orderstatus FROM orders),
         agg AS (
           SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
                  CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
           FROM orders GROUP BY 1, 2
         )
    SELECT pri.o_orderpriority, st.o_orderstatus,
           COALESCE(agg.n_orders, 0) AS n_orders,
           COALESCE(agg.revenue, 0.0) AS revenue
    FROM pri CROSS JOIN st
    LEFT JOIN agg ON agg.o_orderpriority = pri.o_orderpriority
                 AND agg.o_orderstatus = st.o_orderstatus
    """,
)
def q_grid_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense dimension grid with zero-fill: cross join of the (tiny)
    distinct dimension sets, left-joined to the sparse aggregate — the
    report shape where absent combinations must show 0, not vanish. The
    cartesian side is 5×3 rows (BroadcastNestedLoopJoin over broadcast
    singleton dims — the only join shape where a cross join is the right
    plan); the aggregate side is one shuffle on the grouping key."""
    orders = load_table(spark, sf_dir, "orders")
    pri = orders.select("o_orderpriority").distinct()
    st = orders.select("o_orderstatus").distinct()
    agg = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )
    grid = pri.crossJoin(st)
    return grid.join(agg, ["o_orderpriority", "o_orderstatus"], "left").select(
        "o_orderpriority",
        "o_orderstatus",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Batch 13 — multimodal resize plumbing, event-sequence analytics,
# adoption curves, week-over-week deltas, bitwise aggregates, map-typed
# column operations.
# ---------------------------------------------------------------------------


@_q(
    "q_multimodal_resize",
    """
    WITH b AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
             greatest(CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT), 1) AS stride
      FROM documents
    ),
    pos AS (
      SELECT doc_id, text, n_bytes, unnest(range(0, n_bytes, stride)) AS p FROM b
    ),
    agg AS (
      SELECT doc_id, n_bytes,
             string_agg(substr(text, CAST(p + 1 AS INTEGER), 1), '' ORDER BY p) AS resized
      FROM pos GROUP BY doc_id, n_bytes
    )
    SELECT doc_id, n_bytes, CAST(length(resized) AS BIGINT) AS out_bytes,
           sha256(resized) AS resized_checksum
    FROM agg
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload resize plumbing (operators/multimodal.py ``resize_payload``):
    Arrow-batched stride decimation of each blob to ≤64 bytes — the
    mapInPandas shape of a real image/audio resize with the codec swapped
    for deterministic byte decimation (codec libs absent in-container).
    DuckDB twin decimates the *string* at the same stride positions —
    byte-identical on the printable-ASCII corpus (1 byte/char), same
    argument as q_multimodal_frame_sample's twin."""
    from etl_pipeline_project_spark.operators.multimodal import (
        resize_payload,
        to_multimodal,
    )

    docs = load_table(spark, sf_dir, "documents")
    return resize_payload(to_multimodal(docs, "doc_id", "text", "text"))


@_q(
    "q_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (Markov first-order counts): each user's
    clickstream ordered by (ts, event_id) — a total order, so lead() is
    deterministic — then grouped by (from, to). One shuffle on user_id for
    the window, one map-side-combinable aggregate; the 25-cell output is
    driver-safe at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "q_adoption_curve",
    """
    WITH firsts AS (
      SELECT user_id, event_type, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT event_type, first_day AS day, count(*) AS n_new
      FROM firsts GROUP BY 1, 2
    )
    SELECT event_type, day, n_new,
           CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS n_cum
    FROM daily
    """,
)
def q_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption curve: per event type, how many users performed it
    for the FIRST time each day, plus the cumulative total. The exact
    distributed form of 'cumulative distinct users over time' — a naive
    COUNT(DISTINCT) per day rescans all history per day; reducing each
    (user, type) to its min-date first makes the cumulative sum a tiny
    per-type window over daily rows."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily = (
        firsts.withColumnRenamed("first_day", "day")
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "n_new",
        F.sum("n_new").over(w).cast("long").alias("n_cum"),
    )


@_q(
    "q_wow_change",
    """
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS week_start, count(*) AS n_orders,
             CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT week_start, n_orders, revenue,
           revenue / lag(revenue) OVER (ORDER BY week_start) - 1 AS wow_change
    FROM wk
    """,
)
def q_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth: weekly rollup, then lag() for the relative
    delta (NULL on the first week, as SQL semantics dictate). The
    unpartitioned window runs over the weekly AGGREGATE — a few hundred
    rows regardless of fact-table size, so the single-partition sort that
    would be a scale-killer on raw data is free here. Both revenues are
    exact decimal-rounded doubles, so the division is bit-identical
    cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    wk = orders.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )
    w = Window.orderBy("week_start")
    return wk.select(
        "week_start",
        "n_orders",
        "revenue",
        (F.col("revenue") / F.lag("revenue").over(w) - 1).alias("wow_change"),
    )


@_q(
    "q_agg_bitwise",
    """
    SELECT l_returnflag,
           bit_and(l_linenumber) AS flags_and,
           bit_or(l_linenumber) AS flags_or,
           bit_xor(l_linenumber) AS flags_xor
    FROM lineitem GROUP BY 1
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates (§2.F) — the flag-mask rollup shape
    (permission masks, feature bitsets). Fully associative/commutative, so
    partial aggregation is map-side and engine-order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("bit_and(l_linenumber)").alias("flags_and"),
        F.expr("bit_or(l_linenumber)").alias("flags_or"),
        F.expr("bit_xor(l_linenumber)").alias("flags_xor"),
    )


@_q(
    "q_map_ops",
    """
    SELECT event_id,
           CAST(props->>'k' AS INTEGER) AS k_value,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_sorted,
           json_extract(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (§2.F): parse the JSON props column into a typed
    ``map<string,int>`` once, then operate with native map expressions —
    element_at, sorted map_keys, map_contains_key — all inside codegen.
    The map parse is the schema-on-read pattern for semi-structured
    columns: downstream operators see typed fields, not JSON strings."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_value"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        F.map_contains_key(m, "k").alias("has_k"),
    )


# ---------------------------------------------------------------------------
# Batch 14 — stream-stream join, percent-of-total, referential-integrity
# DQ, time-weighted average.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_stream_join",
    """
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM join (§2.H): view→purchase attribution within 1 hour,
    both sides live streams (streaming/ops.py
    ``stream_stream_attribution``). The event-time range condition bounds
    the state store to watermark + horizon; the inner join's final
    availableNow state equals the batch join, hence the full oracle."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        stream_stream_attribution,
    )

    ev = read_events_stream(spark, sf_dir)
    # State-store parallelism is fixed at stream start by
    # spark.sql.shuffle.partitions. A dual-sided join keeps 2 stores per
    # partition; at contract scale 8 partitions cuts per-batch store setup
    # ~4× (14s→4s) with zero semantic change. A production deployment
    # sizes this to stream throughput instead (state partitions ≈
    # cores × small factor), exactly like any shuffle sizing call.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_memory(
            stream_stream_attribution(
                ev.filter(F.col("event_type") == "view"),
                ev.filter(F.col("event_type") == "purchase"),
            )
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
    )


@_q(
    "q_pct_of_total",
    """
    WITH agg AS (
      SELECT o_orderpriority, count(*) AS n_orders,
             CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE) AS total
      FROM orders
    )
    SELECT o_orderpriority, n_orders, revenue,
           revenue / total AS revenue_share
    FROM agg CROSS JOIN tot
    """,
)
def q_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total report: grouped rollup joined to the grand total,
    each group's share = revenue / total. The total comes from a second
    EXACT decimal aggregate (broadcast single row), not from window-summing
    the per-group doubles — float re-summation order would differ between
    engines, while the decimal path is order-independent; the share then
    divides two exactly-agreed doubles, bit-stable cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("revenue"),
    )
    tot = orders.agg(money_sum(F.col("o_totalprice")).alias("total"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "o_orderpriority",
        "n_orders",
        "revenue",
        (F.col("revenue") / F.col("total")).alias("revenue_share"),
    )


@_q(
    "q_dq_referential",
    """
    SELECT 'lineitem->orders' AS fk,
           count(*) FILTER (NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           count(*) AS n_rows
    FROM lineitem l
    UNION ALL
    SELECT 'orders->customer',
           count(*) FILTER (NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           count(*)
    FROM orders o
    """,
)
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate: orphan counts per foreign-key edge via
    left-anti joins, unioned into one report. Each edge is one
    broadcast/shuffle anti join + a count — no row ever leaves the
    executors; the report is O(edges) rows. Complements q_dq_checks
    (single-table rules) with the cross-table rules a star schema needs
    before a mart build (the reference loads facts with no FK check at
    all — transformation_dw.py writes blind)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def edge(name: str, child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
        orphans = child.join(
            parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
        )
        return (
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(child.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(F.lit(name).alias("fk"), "n_orphans", "n_rows")
        )

    return union_all(
        edge("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        edge("orders->customer", orders, "o_custkey", cust, "c_custkey"),
    )


@_q(
    "q_time_weighted_avg",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(floor(value * 1000000) AS BIGINT) AS v_micro, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    agg AS (
      SELECT user_id,
             CAST(SUM(CAST(v_micro AS HUGEINT) * date_diff('microsecond', ts, next_ts)) AS DECIMAL(24,0)) AS s,
             SUM(date_diff('microsecond', ts, next_ts)) AS total_us
      FROM seq WHERE next_ts IS NOT NULL GROUP BY 1
    )
    SELECT user_id, s, total_us,
           CAST(CAST(s AS HUGEINT) // total_us AS BIGINT) AS q,
           CAST(CAST(s AS HUGEINT) % total_us AS BIGINT) AS r
    FROM agg
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average — the TSDB aggregate where each reading is
    weighted by how long it was current (interval to the next reading),
    not by sample count. lead() over the (ts, event_id) total order gives
    each reading's holding interval.

    Determinism recipe (engine-version-proof, per the round-5 verdict):
    the reading is quantized to integer micro-units with ``floor(value·1e6)``
    (floor is rounding-MODE-free). The twin accumulates in HUGEINT —
    ``SUM(CAST(v_micro AS HUGEINT) * date_diff(...))`` — because
    HUGEINT×BIGINT is exact in EVERY DuckDB release, whereas the previous
    ``DECIMAL(38,0) * BIGINT`` product overflows precision 38 and DuckDB's
    handling of that overflow changed across versions (clamp in 1.0.0,
    convert-to-DOUBLE — lossy above 2^53 — in newer releases): exactly the
    rows check-pass / schema check-pass / hash-FAIL driver signature seen in
    r4 and r5. One final CAST narrows the exact sum to decimal(24,0) (sf0.1
    max |s| ~ 2.2e20, 1e4x headroom; Spark mirrors with decimal(38,0)
    accumulation, which never overflows there because Spark's sum widens
    correctly — only the DuckDB side had the version trap). The PROJECTED
    surface is integers only — user_id, s, total_us, q = s div total_us,
    r = s mod total_us (mathematically determined div/mod on non-negative
    operands; value >= 0 implies s >= 0) — so the hash contains ZERO IEEE
    operations of any provenance; a consumer reconstructs the average as
    (q + r/total_us)/1e6."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "v_micro", F.floor(F.col("value") * 1000000).cast("long")
    ).withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    dur_us = F.unix_micros("next_ts") - F.unix_micros("ts")
    # decimal BEFORE the multiply: a µs gap can span days (~1e11), so the
    # int64 product v_micro × dur overflows; decimal × long is exact
    # s narrows to decimal(24,0) (≥100× headroom over the sf0.1 magnitude):
    # at (38,0) the ×1e-12 rescale product would exceed precision 38 and
    # Spark would clip it to scale 6 with an intermediate half-up round —
    # double rounding that flips the 4th decimal vs DuckDB's exact scale-12
    # product. (24,0)×(13,12) = precision 38: exact in both engines.
    agg = seq.groupBy("user_id").agg(
        F.sum(F.col("v_micro").cast("decimal(38,0)") * dur_us).cast(
            "decimal(24,0)"
        ).alias("s"),
        F.sum(dur_us).alias("total_us"),
    )
    return agg.select(
        "user_id",
        "s",
        "total_us",
        F.expr("CAST(s div total_us AS BIGINT)").alias("q"),
        F.expr("CAST(s % total_us AS BIGINT)").alias("r"),
    )


@_q(
    "q_ewma",
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                       (acc, x) -> acc * 0.75e0 + x * 0.25e0) AS ewma
    FROM events GROUP BY 1
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.25) per series — the
    TSDB smoothing primitive with a recursive definition windows can't
    express. Plan: ONE shuffle groups each series, sort_array orders the
    collected (ts, event_id, value) structs, and an aggregate() fold
    applies `acc·(1−α) + x·α` left-to-right — identical association
    order to DuckDB's list_reduce, so the IEEE doubles hash identically
    with no rounding. Each series folds inside its executor; only
    (key, scalar) leaves — the same shape at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("series"),
    )
    vals = F.transform(F.col("series"), lambda s: s["value"])
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(0.75) + x * F.lit(0.25),
    )
    return agg.select("user_id", "n_events", fold.alias("ewma"))


# ---------------------------------------------------------------------------
# Batch 15 — OHLC downsampling, discrete derivative, ORC format
# round-trip.
# ---------------------------------------------------------------------------


@_q(
    "q_ohlc_downsample",
    """
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
        row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                           ORDER BY ts, event_id) AS rf,
        row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT user_id, day,
           max(CASE WHEN rf = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rl = 1 THEN value END) AS close,
           count(*) AS n_ticks
    FROM ranked GROUP BY 1, 2
    """,
)
def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the TSDB/finance rollup: per (series, bucket),
    first/last/extreme readings. open/close are ``min_by``/``max_by`` over
    the (ts, event_id) total order — single-pass, partial-aggregable, NO
    window sort over the raw series (the DuckDB twin uses row_number
    windows because its arg_min can't take a composite key; the Spark plan
    is one grouped aggregate)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.expr("min_by(value, struct(ts, event_id))").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.expr("max_by(value, struct(ts, event_id))").alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


@_q(
    "q_derivative",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nv,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
      FROM events
    )
    SELECT user_id, event_id,
           (nv - value) / date_diff('microsecond', ts, nts) * 1000000 AS rate_per_sec
    FROM seq WHERE nts IS NOT NULL
    """,
)
def q_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete derivative (rate of change per second) between consecutive
    readings of each series — the TSDB ``rate()`` primitive. Every operand
    pair is identical in both engines and the three IEEE ops are applied
    in the same association order, so the doubles hash identically without
    any rounding."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("nv", F.lead("value").over(w))
        .withColumn("nts", F.lead("ts").over(w))
        .filter(F.col("nts").isNotNull())
    )
    dur_us = F.unix_micros("nts") - F.unix_micros("ts")
    return seq.select(
        "user_id",
        "event_id",
        ((F.col("nv") - F.col("value")) / dur_us * 1000000).alias("rate_per_sec"),
    )


@_q(
    "q_scan_orc_roundtrip",
    """
    SELECT o_orderpriority, count(*) AS n_orders, min(o_orderkey) AS first_key
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY 1
    """,
)
def q_scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan round-trip (§2.A format coverage beyond
    parquet/CSV): columnar write with predicate-pushdown-capable read-back.
    The aggregate runs over the ORC copy; the oracle runs over the
    original parquet — equality proves the round-trip is lossless."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    # per-session path: a concurrent process overwriting a shared fixture
    # mid-read raises FILE_NOT_EXIST (write-then-read is only atomic
    # within one session)
    path = f"{_SCRATCH}/orders_orc_{spark.sparkContext.applicationId}"
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderkey").alias("first_key"),
    )


# ---------------------------------------------------------------------------
# Batch 16 — linear-interpolation resampling, SCD2 point-in-time join.
# ---------------------------------------------------------------------------


@_q(
    "q_interp_linear",
    """
    WITH bounds AS (
      SELECT user_id, CAST(min(CAST(ts AS DATE)) AS TIMESTAMP) AS d0,
             CAST(max(CAST(ts AS DATE)) AS TIMESTAMP) AS d1
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS g FROM bounds
    ),
    unioned AS (
      SELECT user_id, epoch_us(ts) AS t, value AS v, 0 AS is_grid,
             CAST(NULL AS DATE) AS g_day
      FROM events
      UNION ALL
      SELECT user_id, epoch_us(g), NULL, 1, CAST(g AS DATE) FROM grid
    ),
    w AS (
      SELECT user_id, t, is_grid, g_day,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM unioned
    )
    SELECT user_id, g_day,
           CASE WHEN pt IS NULL OR nt IS NULL THEN NULL
                WHEN nt = pt THEN pv
                ELSE pv + (nv - pv) * ((t - pt) / CAST(nt - pt AS DOUBLE)) END
             AS interp_value
    FROM w WHERE is_grid = 1
    """,
)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling to a regular daily grid — the TSDB
    ``interpolate``/gap-fill primitive. Grid points union into the reading
    stream, then two directional ignore-nulls windows carry the bracketing
    readings to each grid row and one lerp fills the value (NULL outside
    the observed range — no extrapolation). One shuffle on the series key;
    grid density is a constant factor, never a join blow-up. The lerp's
    IEEE ops run in the same association order in both engines on
    identical operands — no rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).cast("timestamp").alias("d0"),
        F.max(F.col("ts").cast("date")).cast("timestamp").alias("d1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("g"),
    )
    readings = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.col("value").alias("v"),
        F.lit(0).alias("is_grid"),
        F.lit(None).cast("date").alias("g_day"),
    )
    grid_rows = grid.select(
        "user_id",
        F.unix_micros("g").alias("t"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
        F.col("g").cast("date").alias("g_day"),
    )
    u = readings.unionByName(grid_rows)
    base = Window.partitionBy("user_id").orderBy("t", "is_grid")
    wprev = base.rowsBetween(Window.unboundedPreceding, 0)
    wnext = base.rowsBetween(0, Window.unboundedFollowing)
    t_of_v = F.when(F.col("v").isNotNull(), F.col("t"))
    marked = u.select(
        "user_id",
        "t",
        "is_grid",
        "g_day",
        F.last("v", ignorenulls=True).over(wprev).alias("pv"),
        F.last(t_of_v, ignorenulls=True).over(wprev).alias("pt"),
        F.first("v", ignorenulls=True).over(wnext).alias("nv"),
        F.first(t_of_v, ignorenulls=True).over(wnext).alias("nt"),
    )
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("pt")) / (F.col("nt") - F.col("pt")).cast("double")
    )
    return marked.filter(F.col("is_grid") == 1).select(
        "user_id",
        "g_day",
        F.when(F.col("pt").isNull() | F.col("nt").isNull(), F.lit(None).cast("double"))
        .when(F.col("nt") == F.col("pt"), F.col("pv"))
        .otherwise(lerp)
        .alias("interp_value"),
    )


@_q(
    "q_scd2_pit_join",
    """
    WITH dim AS (
      SELECT o_custkey, o_orderpriority,
             CAST(row_number() OVER w AS INTEGER) AS version,
             o_orderdate AS effective_from,
             lead(o_orderdate) OVER w AS effective_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    fact AS (
      SELECT l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
             l.l_shipdate, o.o_custkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT f.l_orderkey, f.l_partkey, f.l_suppkey, f.l_linenumber, f.o_custkey,
           d.o_orderpriority AS priority_at_ship, d.version
    FROM fact f JOIN dim d
      ON f.o_custkey = d.o_custkey
     AND d.effective_from <= f.l_shipdate
     AND (d.effective_to IS NULL OR f.l_shipdate < d.effective_to)
    """,
)
def q_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension: each fact row picks
    the dimension VERSION that was effective at its own timestamp
    (from ≤ t < to, half-open so versions never overlap) — the temporal
    correctness rule that prevents training-data leakage from
    future-dated attributes. Physically an equi join on the entity key
    with a range residual: the shuffle is on custkey, each key's few
    versions prune the residual to exactly one match. Facts before the
    entity's first version drop (inner semantics, pinned by the oracle
    row count)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = scd2_versions(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], ["o_orderpriority"]
    ).select(
        "o_custkey",
        "o_orderpriority",
        "version",
        F.col("effective_from"),
        F.col("effective_to"),
    )
    fact = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate", "o_custkey")
    joined = fact.join(dim, "o_custkey").filter(
        (F.col("effective_from") <= F.col("l_shipdate"))
        & (F.col("effective_to").isNull() | (F.col("l_shipdate") < F.col("effective_to")))
    )
    return joined.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "o_custkey",
        F.col("o_orderpriority").alias("priority_at_ship"),
        "version",
    )


# ---------------------------------------------------------------------------
# Batch 17 — benchmark decontamination screen.
# ---------------------------------------------------------------------------


@_q(
    "q_decontaminate",
    """
    WITH sh AS (
      SELECT doc_id,
        list_distinct(CASE WHEN len(string_split(text, ' ')) >= 5
          THEN list_transform(generate_series(1, len(string_split(text, ' ')) - 4),
                              i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))
          ELSE [] END) AS s
      FROM documents
    ),
    ev AS (SELECT doc_id, unnest(s) AS tok FROM sh WHERE doc_id % 20 = 0),
    tr AS (SELECT doc_id, unnest(s) AS tok FROM sh WHERE doc_id % 20 <> 0)
    SELECT tr.doc_id,
           count(DISTINCT ev.doc_id) AS n_eval_docs,
           count(DISTINCT tok) AS n_shared_shingles
    FROM tr JOIN ev USING (tok)
    GROUP BY tr.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination screen — the training-corpus hygiene step:
    flag every training document sharing a 5-gram with the held-out eval
    set (here: doc_id % 20, standing in for an external benchmark). Same
    inverted-index shape as the dedup tier: explode 5-gram shingles on
    both sides, equi-join on the shingle (shuffle on the token, never
    all-pairs), group by the flagged doc. 5-grams are long enough that
    only genuine near-copies collide — word-frequency noise dies out, as
    n-gram-overlap decontamination assumes. At 100 TB the eval side is
    tiny and could broadcast, but the token-shuffle plan also survives an
    eval set too big for memory."""
    from etl_pipeline_project_spark.operators.dedup_text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", word_shingles("text", 5).alias("s"))
    ev = sh.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("eval_id"), F.explode("s").alias("tok")
    )
    tr = sh.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.explode("s").alias("tok")
    )
    return tr.join(ev, "tok").groupBy("doc_id").agg(
        F.countDistinct("eval_id").alias("n_eval_docs"),
        F.countDistinct("tok").alias("n_shared_shingles"),
    )


# ---------------------------------------------------------------------------
# Batch 18 — deterministic grouped mode, exact-moment linear regression.
# ---------------------------------------------------------------------------


@_q(
    "q_agg_mode",
    """
    WITH counts AS (
      SELECT l_returnflag, l_quantity, count(*) AS c FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT l_returnflag, l_quantity, c,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY c DESC, l_quantity DESC) AS rn
      FROM counts
    )
    SELECT l_returnflag, l_quantity AS mode_qty, c AS n_occurrences
    FROM ranked WHERE rn = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode with a DETERMINISTIC tie-break — the built-in mode()
    returns an arbitrary value on frequency ties (SURVEY §1.4 Q3
    discipline: no arbitrary survivors), so the engine's form is
    count-then-argmax with (count, value) as the composite ordering: two
    partial-aggregable passes, no window over raw data. The DuckDB twin
    uses row_number because its arg_max can't take the composite key."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("c")
    )
    return counts.groupBy("l_returnflag").agg(
        F.expr("max_by(l_quantity, struct(c, l_quantity))").alias("mode_qty"),
        F.max("c").alias("n_occurrences"),
    )


@_q(
    "q_linreg_trend",
    f"""
    WITH pts AS (
      SELECT o_orderpriority,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) * 1e-3 AS x,
             o_totalprice * 1e-5 AS y
      FROM orders
    ),
    m AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             {{sx}} AS sx, {{sy}} AS sy, {{sxx}} AS sxx, {{sxy}} AS sxy
      FROM pts GROUP BY 1
    )
    SELECT o_orderpriority, n,
           (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx) * 100
             AS slope_per_day,
           (sy / CAST(n AS DOUBLE)
             - (CAST(n AS DOUBLE)*sxy - sx*sy) / (CAST(n AS DOUBLE)*sxx - sx*sx)
               * (sx / CAST(n AS DOUBLE))) * 1e5 AS intercept
    FROM m
    """.format(
        sx=_msum6("x"), sy=_msum6("y"), sxx=_msum6("x*x"), sxy=_msum6("x*y")
    ),
)
def q_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend line per group from exact decimal moments —
    distributed linear regression as one grouped aggregate (the ML-adjacent
    analytics primitive: drift/trend detection per segment). Same recipe as
    q_corr_exact: pre-normalize both variables so every moment's unscaled
    decimal stays below 2^53 (x = days·1e-3, y = price·1e-5), accumulate
    the four moments exactly, then run the closed-form slope/intercept in
    identically-written IEEE double arithmetic; the final ×100 / ×1e5
    un-scalings are exact-power-of-ten multiplies."""
    orders = load_table(spark, sf_dir, "orders")
    x = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        * F.lit(1e-3)
    )
    y = F.col("o_totalprice") * F.lit(1e-5)
    pts = orders.select("o_orderpriority", x.alias("x"), y.alias("y"))
    m = pts.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("x"), 6).alias("sx"),
        exact_sum(F.col("y"), 6).alias("sy"),
        exact_sum(F.col("x") * F.col("x"), 6).alias("sxx"),
        exact_sum(F.col("x") * F.col("y"), 6).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope_scaled = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (
        F.col("sy") / nd - slope_scaled * (F.col("sx") / nd)
    ) * F.lit(1e5)
    return m.select(
        "o_orderpriority",
        "n",
        (slope_scaled * 100).alias("slope_per_day"),
        intercept.alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Batch 19 — discrete percentiles, ranking-semantics matrix.
# ---------------------------------------------------------------------------


@_q(
    "q_percentile_disc",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cd
      FROM lineitem
    )
    SELECT l_returnflag,
           min(l_extendedprice) FILTER (cd >= 0.5) AS p50_disc,
           min(l_extendedprice) FILTER (cd >= 0.95) AS p95_disc
    FROM ranked GROUP BY 1
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles — the SQL-standard percentile_disc: the
    smallest actual value whose cumulative distribution reaches p. Unlike
    the interpolating q_quantiles, the result is always a real data value
    (no float blending), so it needs no rounding to hash identically.

    Plan: the count-based quantile (same as q_iqr_outliers), NOT the
    sort-based percentile_disc aggregate — that buffers every group value
    on one reducer, which dies at 100 TB. groupBy (flag, value) collapses
    the fact table map-side to its distinct values; a cumulative window
    over the distinct-value table applies the CDF rule in exact integer
    form (2·cum ≥ n ⟺ cume_dist ≥ 0.5; 20·cum ≥ 19·n ⟺ ≥ 0.95)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    dist = counts.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    return dist.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cum") * 2 >= F.col("n"), F.col("l_extendedprice"))
        ).alias("p50_disc"),
        F.min(
            F.when(F.col("cum") * 20 >= F.col("n") * 19, F.col("l_extendedprice"))
        ).alias("p95_disc"),
    )


@_q(
    "q_window_rank_semantics",
    """
    SELECT DISTINCT l_returnflag, l_quantity,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
)
def q_window_rank_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() vs dense_rank() on real ties, side by side: rank leaves gaps
    after tie groups, dense_rank doesn't — the difference that silently
    corrupts 'top N' reports built with the wrong one. Every row of a tie
    group carries identical outputs, so DISTINCT collapses to one row per
    (group, value): fully deterministic without a row-level tie-break
    (row_number is deliberately absent — it IS arbitrary on ties)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return (
        li.select(
            "l_returnflag",
            "l_quantity",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Batch 20 — skyline, running distinct, robust-stats outliers, quartile
# buckets, heavy-hitter skew diagnosis, Gini concentration.
# ---------------------------------------------------------------------------


@_q(
    "q_skyline",
    """
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM orders q
      WHERE q.o_totalprice < o.o_totalprice
        AND q.o_orderdate > o.o_orderdate)
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): orders not strictly dominated on
    (cheaper price, later date). The oracle states the declarative
    NOT-EXISTS dominance definition (an O(n^2) inequality join); the
    engine plan is the O(n log n) sweep — max order date per distinct
    price level, running max over strictly-cheaper levels, keep rows whose
    date reaches that running max. The global window ranges over DISTINCT
    price levels only (cardinality << rows), so at 100 TB the sort input
    is the aggregated level table, not the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    per_price = orders.groupBy("o_totalprice").agg(
        F.max("o_orderdate").alias("grp_max_date")
    )
    w = Window.orderBy("o_totalprice").rowsBetween(Window.unboundedPreceding, -1)
    levels = per_price.select(
        "o_totalprice", F.max("grp_max_date").over(w).alias("prior_max_date")
    )
    return (
        orders.join(F.broadcast(levels), "o_totalprice")
        .where(
            F.col("prior_max_date").isNull()
            | (F.col("prior_max_date") <= F.col("o_orderdate"))
        )
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@_q(
    "q_running_distinct",
    """
    WITH firsts AS (
      SELECT o_custkey, min(o_orderdate) AS first_date FROM orders GROUP BY 1),
    daily AS (
      SELECT first_date AS o_orderdate, CAST(count(*) AS BIGINT) AS new_customers
      FROM firsts GROUP BY 1)
    SELECT o_orderdate, new_customers,
           CAST(sum(new_customers) OVER (ORDER BY o_orderdate) AS BIGINT)
             AS cum_customers
    FROM daily
    """,
)
def q_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative COUNT(DISTINCT) over time — the window neither engine
    supports natively (COUNT(DISTINCT) OVER is illegal in both). The
    scalable rewrite: a customer contributes on its first-seen date only
    (min-date per key = one shuffle), then a running sum over the tiny
    per-day series. State is O(days), never O(customers), so the plan
    holds when the distinct key set itself no longer fits one node."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_date"))
    daily = firsts.groupBy(F.col("first_date").alias("o_orderdate")).agg(
        F.count("*").alias("new_customers")
    )
    w = Window.orderBy("o_orderdate").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.withColumn("cum_customers", F.sum("new_customers").over(w))


@_q(
    "q_iqr_outliers",
    """
    WITH fences AS (
      SELECT l_returnflag,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q1,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS q3
      FROM lineitem GROUP BY 1)
    SELECT f.l_returnflag, f.q1, f.q3,
           CAST(count(*) FILTER (
             l.l_extendedprice < f.q1 - 1.5 * (f.q3 - f.q1)
             OR l.l_extendedprice > f.q3 + 1.5 * (f.q3 - f.q1)) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM fences f JOIN lineitem l USING (l_returnflag)
    GROUP BY 1, 2, 3
    """,
)
def q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection from DISCRETE quartiles, computed by
    the count-based quantile plan rather than percentile_disc: a sort-based
    percentile aggregate buffers every group value on one reducer — the
    thing that cannot work at 100 TB. Instead (1) groupBy (flag, value)
    counts collapse the fact table map-side to its distinct values, (2) a
    cumulative window over the distinct-value table (bounded by the value
    DOMAIN, not row count) finds the quartiles by the same CDF rule
    percentile_disc implements — smallest x with cum ≥ p·n, checked in
    exact integer form 4·cum ≥ k·n — and (3) the 3-row fence table
    broadcast-joins back for a map-side conditional count. The 1.5×IQR
    fence arithmetic is a fixed scalar double expression, IEEE-identical
    across engines, so the whole check stays exact with no rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    dist = counts.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    fences = dist.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("cum") * 4 >= F.col("n"), F.col("l_extendedprice"))
        ).alias("q1"),
        F.min(
            F.when(F.col("cum") * 4 >= F.col("n") * 3, F.col("l_extendedprice"))
        ).alias("q3"),
    )
    lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    return (
        li.join(F.broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.count(
                F.when((F.col("l_extendedprice") < lo) | (F.col("l_extendedprice") > hi), F.lit(1))
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@_q(
    "q_ntile_quartiles",
    f"""
    WITH t AS (
      SELECT o_totalprice,
             ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders)
    SELECT quartile, CAST(count(*) AS BIGINT) AS n,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi,
           {_msum('o_totalprice')} AS bucket_total
    FROM t GROUP BY 1
    """,
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) equi-height bucketing with per-bucket profile. ntile
    assigns by row position, so ties MUST be broken by a total order —
    (o_totalprice, o_orderkey) — or the bucket boundaries are
    run-dependent; this key pins that discipline. Bucket totals use the
    exact decimal accumulator. Scale note: a global ntile is a
    range-partitioned sort (Spark's Exchange rangepartitioning), the same
    machinery as orderBy — linear shuffle, no single-node bottleneck."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = orders.select("o_totalprice", F.ntile(4).over(w).alias("quartile"))
    return t.groupBy("quartile").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        money_sum(F.col("o_totalprice")).alias("bucket_total"),
    )


@_q(
    "q_heavy_hitters",
    """
    WITH counts AS (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM counts)
    SELECT c.l_suppkey, c.cnt,
           CAST(c.cnt * 1000000 // t.total AS BIGINT) AS share_ppm,
           CAST(c.cnt * t.n_keys * 1000 // t.total AS BIGINT) AS skew_x1000
    FROM counts c, tot t
    ORDER BY c.cnt DESC, c.l_suppkey
    LIMIT 20
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis — the profile you run BEFORE picking a join or
    shuffle strategy at 100 TB: top-20 hottest keys with parts-per-million
    share and x1000 skew ratio vs the mean key load (skew_x1000 >> 1000
    means salting / AQE skew-join territory). All-integer arithmetic
    (floor division both engines) — no float, no rounding. Plan: one
    groupBy shuffle, a broadcast single-row total, TakeOrdered(20)."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count("*").alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "l_suppkey",
            "cnt",
            F.expr("cnt * 1000000 div total").alias("share_ppm"),
            F.expr("cnt * n_keys * 1000 div total").alias("skew_x1000"),
        )
        .orderBy(F.col("cnt").desc(), "l_suppkey")
        .limit(20)
    )


@_q(
    "q_gini",
    """
    WITH spend AS (
      SELECT c.c_nationkey, o.o_custkey,
             CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(38,10))), 2)
                  AS DECIMAL(18,2)) AS spend
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT c_nationkey, spend,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY spend, o_custkey)
                  AS DECIMAL(10,0)) AS i
      FROM spend),
    moms AS (
      SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(spend) AS DECIMAL(30,2)) AS s,
             CAST(SUM(i * spend) AS DECIMAL(32,2)) AS s1
      FROM ranked GROUP BY 1)
    SELECT c_nationkey, n,
           ROUND(CAST(2 * s1 - CAST(n + 1 AS DECIMAL(6,0)) * s AS DOUBLE)
                 / CAST(CAST(n AS DECIMAL(6,0)) * s AS DOUBLE), 6) AS gini
    FROM moms
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend per nation, via the exact
    rank formulation G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
    spend sorted ascending with a custkey tie-break. Every moment stays
    in decimal (i narrowed to DECIMAL(10,0) so the product precision
    10+18+1 <= 38 stays exact — Spark clips the scale past 38; n+1
    narrowed to DECIMAL(6,0) for the same reason); only the final ratio
    goes through double, rounded to 6 dp. The per-nation window sorts
    customers-per-nation, not order rows — fine at scale."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(38,10)")), 2)
            .cast("decimal(18,2)")
            .alias("spend")
        )
    )
    wi = Window.partitionBy("c_nationkey").orderBy("spend", "o_custkey")
    ranked = spend.select(
        "c_nationkey",
        "spend",
        F.row_number().over(wi).cast("decimal(10,0)").alias("i"),
    )
    moms = ranked.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum("spend").cast("decimal(30,2)").alias("s"),
        F.sum(F.col("i") * F.col("spend")).cast("decimal(32,2)").alias("s1"),
    )
    return moms.select(
        "c_nationkey",
        "n",
        F.round(
            (
                F.lit(2) * F.col("s1")
                - (F.col("n") + F.lit(1)).cast("decimal(6,0)") * F.col("s")
            ).cast("double")
            / (F.col("n").cast("decimal(6,0)") * F.col("s")).cast("double"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Batch 21 — repetition filters, concentration indices, interval overlap,
# rolling robust statistics, rollup-cascade reuse.
# ---------------------------------------------------------------------------


@_q(
    "q_text_repetition",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, len(t) AS n_words,
             unnest(CASE WHEN len(t) >= 2
               THEN list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])
               ELSE CAST([] AS VARCHAR[]) END) AS bigram
      FROM toks
    ),
    counts AS (
      SELECT doc_id, n_words, bigram, count(*) AS cnt
      FROM bg GROUP BY 1, 2, 3
    ),
    top AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY cnt DESC, bigram ASC) AS rn
      FROM counts
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, bigram AS top_bigram,
           CAST(cnt AS BIGINT) AS top_cnt,
           CAST(cnt * 1000000 // (n_words - 1) AS BIGINT) AS rep_ppm,
           cnt * 1000000 // (n_words - 1) >= 60000 AS flag_repetitive
    FROM top WHERE rn = 1
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition filter: per document, the
    most-frequent word bigram and the fraction of bigram slots it
    occupies (parts-per-million, all-integer floor arithmetic — no float
    anywhere). Docs whose top bigram exceeds 6% of slots are flagged as
    repetitive boilerplate.

    Plan: the statistic is *document-local*, so no row ever needs to
    leave its partition — the per-doc mode is a sorted-array fold
    (array_sort + aggregate HOF tracking (current-run, best-run)), a
    pure map with ZERO shuffles. The previous explode → groupBy(doc,
    bigram) → window-argmax plan shuffled every bigram occurrence twice
    to compute a per-doc answer; the fold is 4.4× faster at sf0.1 and
    at 100 TB removes the dominant exchange entirely. Ascending sort +
    strict `>` update reproduces the (cnt DESC, bigram ASC) tie-break."""
    from etl_pipeline_project_spark.operators.text_analysis import ngram_pairs

    docs = load_table(spark, sf_dir, "documents")
    fold = """
    aggregate(
      array_sort(__bg),
      named_struct('bv', '', 'bc', 0L, 'cv', '', 'cc', 0L),
      (acc, x) -> named_struct(
        'bv', IF(IF(x = acc.cv, acc.cc + 1, 1L) > acc.bc, x, acc.bv),
        'bc', IF(IF(x = acc.cv, acc.cc + 1, 1L) > acc.bc,
                 IF(x = acc.cv, acc.cc + 1, 1L), acc.bc),
        'cv', x,
        'cc', IF(x = acc.cv, acc.cc + 1, 1L)))
    """
    return (
        docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
            ngram_pairs("text").alias("__bg"),
        )
        .where(F.size("__bg") >= 1)
        .select("doc_id", "n_words", F.expr(fold).alias("st"))
        .select(
            "doc_id",
            "n_words",
            F.col("st.bv").alias("top_bigram"),
            F.col("st.bc").alias("top_cnt"),
            F.expr("st.bc * 1000000 div (n_words - 1)").alias("rep_ppm"),
            (F.expr("st.bc * 1000000 div (n_words - 1)") >= 60000).alias(
                "flag_repetitive"
            ),
        )
    )


@_q(
    "q_hhi",
    """
    WITH rev AS (
      SELECT s.s_nationkey,
             l.l_suppkey,
             CAST(CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                      AS DECIMAL(38,10))), 2)
                       AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    shares AS (
      SELECT s_nationkey, l_suppkey,
             cents * 1000000 // CAST(sum(cents) OVER (PARTITION BY s_nationkey)
                                     AS BIGINT) AS share_ppm
      FROM rev)
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(share_ppm * share_ppm) // 10000 AS BIGINT) AS hhi_x100
    FROM shares GROUP BY 1
    """,
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within each
    nation, fully integer-deterministic: exact-decimal revenue -> cents
    (bigint), floor-division ppm shares, HHI = sum(share^2)/1e4 (so
    hhi_x100 = 1_000_000 means monopoly). No double ever enters — the
    cross-engine recipe when a ratio-of-sums must hash identically.
    Plan: one shuffle to (nation, supplier), a nation-partitioned window
    for the denominator, one tiny final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == sup.s_suppkey,
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,10)"
                    )
                ),
                2,
            )
            .cast("decimal(18,2)")
            .alias("rev")
        )
        .select(
            "s_nationkey",
            "l_suppkey",
            (F.col("rev") * 100).cast("bigint").alias("cents"),
        )
    )
    wn = Window.partitionBy("s_nationkey")
    shares = rev.select(
        "s_nationkey",
        "l_suppkey",
        F.expr("cents * 1000000 div sum(cents) OVER (PARTITION BY s_nationkey)")
        .alias("share_ppm"),
    )
    return shares.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.expr("sum(share_ppm * share_ppm) div 10000").alias("hhi_x100"),
    )


@_q(
    "q_interval_overlap",
    """
    WITH w AS (
      SELECT o_orderkey, o_custkey, o_orderdate AS s,
             o_orderdate + INTERVAL 7 DAY AS e
      FROM orders)
    SELECT a.o_custkey, CAST(count(*) AS BIGINT) AS n_overlaps
    FROM w a JOIN w b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s < b.e AND b.s < a.e
    GROUP BY 1
    """,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self join: pairs of 7-day order windows of the
    same customer that intersect (half-open [start, start+7d)
    semantics, a.key < b.key to count each unordered pair once). The
    equi key (customer) carries the hash join; the interval predicate is
    a post-join filter — the scalable shape for key-scoped interval
    joins, since per-key cardinality is bounded while a keyless interval
    join would need bucketized interval banding."""
    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    a = w.alias("a")
    b = w.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )


@_q(
    "q_rolling_median",
    f"""
    WITH daily AS (
      SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
             {_msum('l_extendedprice * (1 - l_discount)')} AS rev
      FROM lineitem WHERE l_suppkey <= 10 GROUP BY 1, 2)
    SELECT l_suppkey, d, rev,
           median(rev) OVER (PARTITION BY l_suppkey ORDER BY d
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
    FROM daily
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-observation median of daily supplier revenue — a
    windowed ORDER-STATISTIC, not a windowed sum: the frame re-sorts its
    7 values at every row. Daily revenues are exact-decimal-rounded
    doubles, and both engines interpolate even-count medians as the mean
    of the two middles ((a+b)/2 is a single IEEE op — bit-identical), so
    no output rounding is needed. Spark refuses aggregate `median` over
    a frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the engine
    collects the <=7-value frame and takes the order statistic with
    array_sort — O(1) per row because the frame is bounded, and the
    partition key bounds window state. ORDER BY d is unique per
    supplier, making frames deterministic."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 10)
    daily = li.groupBy(
        "l_suppkey", F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("rev")
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.withColumn(
        "frame", F.array_sort(F.collect_list("rev").over(w))
    ).select(
        "l_suppkey",
        "d",
        "rev",
        F.expr(
            """
            CASE WHEN size(frame) % 2 = 1
                 THEN element_at(frame, CAST((size(frame) + 1) DIV 2 AS INT))
                 ELSE (element_at(frame, CAST(size(frame) DIV 2 AS INT))
                       + element_at(frame, CAST(size(frame) DIV 2 + 1 AS INT)))
                      / 2
            END
            """
        ).alias("med7"),
    )


@_q(
    "q_mad_outliers",
    """
    WITH med AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY 1),
    mad AS (
      SELECT e.event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med))
               AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1)
    SELECT m.event_type, m.med, a.mad,
           CAST(count(*) FILTER (abs(e.value - m.med) > 3 * a.mad) AS BIGINT)
             AS n_outliers,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events e JOIN med m USING (event_type) JOIN mad a USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier flagging per event type — the
    robust alternative to z-scores (the median/MAD pair is immune to the
    outliers it hunts). Both medians are DISCRETE order statistics
    (actual data values), and |x - med| > 3*MAD is a fixed scalar double
    expression, so the whole check is exact with zero rounding. Three
    passes over events, each a broadcast-joined aggregate; no sort of
    the fact table."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_mad")
    return spark.sql(
        """
        WITH med AS (
          SELECT event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med
          FROM ev_mad GROUP BY event_type),
        mad AS (
          SELECT e.event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med))
                   AS mad
          FROM ev_mad e JOIN med m USING (event_type) GROUP BY e.event_type)
        SELECT m.event_type, m.med, a.mad,
               count(*) FILTER (WHERE abs(e.value - m.med) > 3 * a.mad)
                 AS n_outliers,
               count(*) AS n_rows
        FROM ev_mad e JOIN med m USING (event_type) JOIN mad a USING (event_type)
        GROUP BY m.event_type, m.med, a.mad
        """
    )


@_q(
    "q_rollup_cascade",
    f"""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           CAST(count(*) AS BIGINT) AS n_events,
           {_msum('value')} AS total
    FROM events GROUP BY 1
    """,
)
def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup cascade: the monthly aggregate is computed
    FROM the daily pre-aggregate, not by re-scanning raw events — the
    incremental-maintenance pattern where each granularity feeds the
    next (hour->day->month), so a 100 TB event store aggregates once and
    every coarser rollup reads only rollup rows. The oracle aggregates
    raw events directly: cascade == direct holds exactly because the
    day level keeps the unrounded DECIMAL(38,10) accumulator, rounding
    only at the final month projection."""
    ev = load_table(spark, sf_dir, "events")
    day = ev.groupBy(F.date_trunc("day", "ts").alias("day_ts")).agg(
        F.sum(F.col("value").cast("decimal(38,10)")).alias("day_dec"),
        F.count(F.lit(1)).alias("day_n"),
    )
    return day.groupBy(
        F.date_trunc("month", "day_ts").cast("date").alias("month")
    ).agg(
        F.sum("day_n").alias("n_events"),
        F.round(F.sum("day_dec"), 2)
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total"),
    )


# ---------------------------------------------------------------------------
# Batch 22 — TPC-H classics, co-occurrence mining, exact higher moments,
# privacy suppression, regex surface, deterministic splits, JSON staging
# ---------------------------------------------------------------------------


@_q(
    "q_sql_q1",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {_msum('l_extendedprice')} AS sum_base_price,
           {_msum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_msum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
           {_msum('l_discount')} AS sum_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sql_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the canonical scan-heavy report the
    reference's summary tier approximates with pandas groupbys
    (`data/transformation_dw.py` aggregate marts). One full scan, one
    hash aggregate on a 6-value grouping key: map-side partial
    aggregation collapses 600k rows to 6 per partition before the
    shuffle, so network cost is O(partitions), not O(rows) — the shape
    that holds at 100 TB. Money sums accumulate in DECIMAL(38,10)
    (exact, order-independent); averages are a final double division of
    exact sums, so both engines compute bit-identical results."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        money_sum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("sum_charge"),
        money_sum(F.col("l_discount")).alias("sum_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        "sum_disc",
        "count_order",
    )


@_q(
    "q_sql_q3",
    f"""
    SELECT l.l_orderkey,
           {_msum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_sql_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: top-10 open BUILDING-segment orders
    by outstanding revenue. The segment filter prunes customer BEFORE
    the join (predicate pushdown to the scan), the filtered customer
    side broadcasts (small by selectivity), and the top-10 is a
    TakeOrdered — no global sort materializes. revenue ties break on
    l_orderkey so the limit is deterministic (SURVEY §1.4 Q3)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@_q(
    "q_sql_q18",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_sql_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds 250. The HAVING filter runs on the aggregate BEFORE any
    join — the surviving set is tiny (~0.3% of orders), so it
    broadcasts into orders and customer rather than shuffling either
    fact table a second time. Quantity sums are integer-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
    )


@_q(
    "q_market_basket",
    """
    SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-purchased in the same order,
    kept at support >= 2. The self-join carries the equi key
    (l_orderkey), so the shuffle is one hash partition of lineitem and
    the pair blow-up is per-order local — O(k^2) for k lines per order,
    with k bounded (~7), never a global cross product. This is the
    a-priori candidate-generation step shaped for 100 TB: support
    counting is a map-side-combinable aggregate on the pair key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )


_MOMENTS_SQL = """
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
      FROM {table} GROUP BY l_returnflag),
    r AS (
      SELECT l_returnflag, n,
             CAST(s1 AS DOUBLE) / n AS mean,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM s),
    c AS (
      SELECT l_returnflag, n, mean,
             r2 - mean * mean AS m2,
             r3 - 3 * mean * r2 + 2 * mean * mean * mean AS m3,
             r4 - 4 * mean * r3 + 6 * mean * mean * r2
                - 3 * mean * mean * mean * mean AS m4
      FROM r)
    SELECT l_returnflag, n, mean, m2 AS variance,
           m3 / (m2 * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3 AS kurtosis_excess
    FROM c
"""


@_q("q_moments_skew_kurt", _MOMENTS_SQL.format(table="lineitem"))
def q_moments_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skewness and excess kurtosis per return flag. Built-in
    skewness()/kurtosis() accumulate running doubles whose value depends
    on partition order; here the power sums are INTEGER-exact (quantity
    is integral <= 50, so q^4 <= 6.25e6 is exact in int64 and sums are
    associative), and the central-moment formula is a fixed scalar
    double expression evaluated once per group — identical text on both
    engines, so the doubles match bit-for-bit. Distributed cost: one
    map-side-combinable aggregate, no second pass (vs the naive
    mean-subtract-rescan two-pass formulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("moments_src")
    return spark.sql(_MOMENTS_SQL.format(table="moments_src"))


@_q(
    "q_k_anonymize",
    """
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2)
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(count(*) FILTER (WHERE n >= 5) AS BIGINT) AS released_cells,
           CAST(COALESCE(SUM(CASE WHEN n >= 5 THEN n END), 0) AS BIGINT) AS released_rows,
           CAST(COALESCE(SUM(CASE WHEN n < 5 THEN n END), 0) AS BIGINT) AS suppressed_rows
    FROM cells GROUP BY c_nationkey
    """,
)
def q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression audit (k=5) over the quasi-identifier
    pair (nation, market segment): cells smaller than k are suppressed,
    and the audit reports per-nation how many rows survive release —
    the privacy gate a training-data pipeline runs before exporting
    user-derived records. Two cheap aggregates; the cell table is
    bounded by the QI domain product, not by row count, so the second
    aggregate is trivially small at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cells.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.count(F.when(F.col("n") >= 5, 1)).alias("released_cells"),
        F.coalesce(
            F.sum(F.when(F.col("n") >= 5, F.col("n"))), F.lit(0)
        ).alias("released_rows"),
        F.coalesce(
            F.sum(F.when(F.col("n") < 5, F.col("n"))), F.lit(0)
        ).alias("suppressed_rows"),
    )


@_q(
    "q_regex_suite",
    """
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
           (text LIKE '%the%') AS has_the,
           CAST(length(regexp_replace(text, '[0-9]+', '', 'g')) AS BIGINT) AS len_no_digits
    FROM documents
    """,
)
def q_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface (reference's pandas `.str` tier,
    `data/transformation_dw.py` text cleanups): extract / count-all /
    LIKE / strip-replace, all JVM-side Catalyst expressions inside one
    whole-stage-codegen span — no Python, no shuffle, embarrassingly
    parallel at any scale. Spark's regexp_replace is replace-all by
    default; the DuckDB twin needs the explicit 'g' flag."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.size(F.expr("regexp_extract_all(text, '[0-9]+')"))
        .cast("long")
        .alias("n_digit_runs"),
        F.col("text").like("%the%").alias("has_the"),
        F.length(F.regexp_replace("text", r"[0-9]+", "")).cast("long").alias(
            "len_no_digits"
        ),
    )


@_q(
    "q_hash_split",
    """
    WITH b AS (
      SELECT n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY 1
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-stable hash —
    THE way to split 100 TB of training data: no global shuffle, no
    random() (which is neither reproducible across runs nor stable
    under repartitioning), just a pure per-row md5 of the document key
    mod 100 → 80/10/10. Any engine, any partitioning, any day produces
    the same assignment, which is what makes downstream decontamination
    and eval-set hygiene auditable. Assignment is a scalar expression;
    the only aggregate is the audit count."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


@_q(
    "q_scan_json_roundtrip",
    """
    SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(length(text)) AS BIGINT) AS sum_text_len
    FROM documents GROUP BY source, lang
    """,
)
def q_scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines staging round-trip: documents → newline-delimited JSON
    (the interchange format of every LLM data pipeline) → read back with
    the EXPLICIT schema (no inference pass — inference would double the
    scan at scale, SURVEY §1.4 Q2) → aggregate. Unicode text survives
    the encode/decode; the oracle aggregates the source table directly,
    so the check proves the round-trip is lossless."""
    import pyspark.sql.types as T

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = f"{_SCRATCH}/json_stage_{spark.sparkContext.applicationId}"
    docs.write.mode("overwrite").json(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(out)
    return back.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.length("text")).cast("long").alias("sum_text_len"),
    )


# ---------------------------------------------------------------------------
# Batch 23 — iterative graph rank, more TPC-H, Arrow-native UDF, robust
# scaling, window value-function matrix
# ---------------------------------------------------------------------------


@_q(
    "q_pagerank_nations",
    """
    WITH RECURSIVE
    edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    nodes AS (SELECT n_nationkey AS node FROM nation),
    w AS (
      SELECT src, dst, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY src) AS BIGINT) AS outc
      FROM edges
      UNION ALL
      SELECT node, node, CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM nodes),
    pr AS (
      SELECT 0 AS it, node, CAST(1000000000000 // 25 AS BIGINT) AS fp FROM nodes
      UNION ALL
      SELECT p.it + 1, t.dst AS node,
             CAST(6000000000
                  + (85 * SUM((p.fp * t.cnt) // t.outc)) // 100 AS BIGINT)
      FROM pr p JOIN w t ON t.src = p.node
      WHERE p.it < 10
      GROUP BY p.it, t.dst)
    SELECT node AS n_nationkey,
           CAST(fp AS DOUBLE) / 1000000000000 AS pagerank
    FROM pr WHERE it = 10
    """,
)
def q_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 10 synchronous iterations) over the nation trade
    graph: an edge customer-nation → supplier-nation per lineitem. The
    iterative-algorithm pattern shaped for scale: ONE heavy pass
    collapses 100 TB of facts into a graph bounded by the key domain
    (25 nodes here), and the iterations run on the collapsed graph —
    never re-scanning the fact table. The iteration runs in FIXED-POINT
    int64 (scale 10^12): rank*cnt div out-degree with integer division,
    damping as 6e9 + 85*sum div 100 — every op exact and associative,
    so the result is bit-identical under any partitioning, any engine,
    any reduction order (float accumulation would drift by ULPs per
    partition). Zero-contribution self-loops keep in-edge-less nodes
    alive through the recursion; the only float appears in the final
    projection (fp/1e12, correctly rounded from an exact int)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wsum = Window.partitionBy("src")
    w = edges.select(
        "src", "dst", "cnt", F.sum("cnt").over(wsum).cast("long").alias("outc")
    )
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    # the collapsed graph is tiny (|nation|^2 rows max): pin it to one
    # partition so each Pregel-style superstep is one small task, and
    # localCheckpoint each iteration to truncate lineage — without it the
    # unrolled loop re-analyzes a quadratically growing plan (measured 15s
    # of pure planning at 10 iterations). At cluster scale the same two
    # calls are how you iterate on any bounded aggregate state.
    w_aug = (
        w.unionByName(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).cast("long").alias("cnt"),
                F.lit(1).cast("long").alias("outc"),
            )
        )
        .coalesce(1)
        .localCheckpoint()
    )
    ranks = nodes.select(
        "node", F.lit(1_000_000_000_000 // 25).cast("long").alias("fp")
    ).coalesce(1)
    for _ in range(10):
        contrib = (
            ranks.join(w_aug, ranks.node == w_aug.src)
            .groupBy("dst")
            .agg(F.sum(F.expr("(fp * cnt) div outc")).alias("s"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.expr("CAST(6000000000 + (85 * s) div 100 AS BIGINT)").alias("fp"),
        ).localCheckpoint()
    return ranks.select(
        F.col("node").alias("n_nationkey"),
        (F.col("fp").cast("double") / F.lit(1_000_000_000_000)).alias("pagerank"),
    )


@_q(
    "q_sql_q7",
    f"""
    WITH sh AS (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
          OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 00:00:00')
    SELECT supp_nation, cust_nation, l_year, {_msum('volume')} AS revenue
    FROM sh GROUP BY 1, 2, 3
    """,
)
def q_sql_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations, both directions, by
    ship year. The nation filter reduces BOTH fact-side dimensions
    before the big join: supplier and customer shrink to ~1/25 each and
    broadcast, so lineitem and orders shuffle once on the order key and
    nothing else moves. The OR-of-pairs predicate is applied post-join
    on broadcast-local columns — no second shuffle."""
    n1 = load_table(spark, sf_dir, "nation")
    picked = n1.where(F.col("n_name").isin("NATION_20", "NATION_11"))
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(picked.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                picked.select(
                    F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
                )
            ),
            F.col("c_nationkey") == F.col("nk2"),
        )
        .select("c_custkey", "cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(
            (
                (F.col("supp_nation") == "NATION_20")
                & (F.col("cust_nation") == "NATION_11")
            )
            | (
                (F.col("supp_nation") == "NATION_11")
                & (F.col("cust_nation") == "NATION_20")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@_q(
    "q_sql_q10",
    f"""
    SELECT c.c_custkey, c.c_name,
           {_msum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_sql_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    lost to returns in one quarter. The quarter filter prunes orders at
    the scan (PushedFilters), the returnflag filter prunes lineitem,
    nation broadcasts, and the top-20 is a TakeOrdered with c_custkey
    tiebreak — no global sort."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_q(
    "q_udf_arrow_batch",
    """
    SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_py
    FROM documents
    """,
)
def q_udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch UDF (`mapInArrow`): the zero-copy tier BELOW
    pandas UDFs — record batches flow from the JVM to Python as Arrow
    buffers and are processed with vectorized pyarrow.compute kernels,
    no pandas materialization at all. This is the template for custom
    Python logic over 100 TB: per-batch, columnar, no per-row Python.
    The computation (UTF-8 code-point length) has an exact SQL twin, so
    the Arrow path is value-verified against the JVM expression."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def count_chars(batches):
        for batch in batches:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.utf8_length(batch.column(1)), pa.int64()),
                ],
                names=["doc_id", "n_chars_py"],
            )

    return docs.mapInArrow(count_chars, "doc_id long, n_chars_py long")


_ROBUST_SCALER_SQL = """
    WITH st AS (
      SELECT event_type,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS med,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY value)
               - percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS iqr
      FROM {table} GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           (e.value - s.med) / s.iqr AS scaled
    FROM {table} e JOIN st s ON e.event_type = s.event_type
"""


@_q("q_robust_scaler", _ROBUST_SCALER_SQL.format(table="events"))
def q_robust_scaler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature scaling (value - median) / IQR per event type —
    the outlier-immune normalizer an ML feature pipeline applies before
    training. Median and quartiles are DISCRETE order statistics
    (actual data values, exact), and the scaling is two IEEE ops per
    row, so outputs are bit-identical cross-engine with zero rounding.
    One stats aggregate (grouped sort bounded per type) + one broadcast
    join back onto the stream — the fact table never sorts globally."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("robust_src")
    return spark.sql(_ROBUST_SCALER_SQL.format(table="robust_src"))


_WINDOW_VALUES_SQL = """
    SELECT event_id, user_id,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_v,
           last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
           nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_v,
           lag(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_v
    FROM {table}
"""


@_q("q_window_first_last", _WINDOW_VALUES_SQL.format(table="events"))
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value-function matrix: first_value / last_value /
    nth_value over the full-partition frame plus lag with an explicit
    default — the semantics corners (frame defaults, missing nth, lag
    fill) pinned under a TOTAL ordering (ts, event_id): event_id breaks
    ts ties, so every engine sees the same neighbor. One shuffle on
    user_id serves all four functions (same window spec)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("winval_src")
    return spark.sql(_WINDOW_VALUES_SQL.format(table="winval_src"))


# ---------------------------------------------------------------------------
# Batch 24 — promo share, EXISTS date-arithmetic, graph triangles,
# Morton z-order clustering, Welch's t-test, golden-record survivorship
# ---------------------------------------------------------------------------


@_q(
    "q_sql_q14",
    f"""
    WITH j AS (
      SELECT p.p_type, l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'),
    s AS (
      SELECT {_msum("CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END")} AS promo_rev,
             {_msum('rev')} AS total_rev
      FROM j)
    SELECT promo_rev, total_rev,
           100 * (promo_rev / total_rev) AS promo_share_pct
    FROM s
    """,
)
def q_sql_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: share of one month's revenue from
    PROMO parts. part is a dimension — it broadcasts, so lineitem never
    shuffles; the month filter is pushed to the lineitem scan. Both
    revenue sums are exact decimals rounded to cents, and the share is
    one double division of those — deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            money_sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
            ).alias("promo_rev"),
            money_sum(rev).alias("total_rev"),
        )
    )
    return agg.select(
        "promo_rev",
        "total_rev",
        (F.lit(100) * (F.col("promo_rev") / F.col("total_rev"))).alias(
            "promo_share_pct"
        ),
    )


@_q(
    "q_sql_q4_exists",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY 1
    """,
)
def q_sql_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: orders in one quarter with
    at least one line shipped >30 days after ordering. EXISTS compiles
    to a LEFT SEMI hash join on the order key with the date comparison
    as the join residual — lineitem is never widened, each order
    short-circuits on first match, and the count is per-priority.
    The quarter filter prunes the orders scan first."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_TRADE_EDGES_CTE = """
    de AS (
      SELECT DISTINCT LEAST(c.c_nationkey, s.s_nationkey) AS a,
                      GREATEST(c.c_nationkey, s.s_nationkey) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey)
"""


@_q(
    "q_graph_triangles",
    f"""
    WITH {_TRADE_EDGES_CTE}
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM de e1
    JOIN de e2 ON e1.b = e2.a
    JOIN de e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the undirected nation trade graph — the
    clustering-coefficient primitive. Same scale discipline as
    PageRank: one heavy pass collapses the fact tables to a DISTINCT
    edge set bounded by the key-domain square, then the triangle
    enumeration (ordered wedge join a<b<c, each triangle counted once)
    runs on the collapsed edges only. On a real 100 TB graph the same
    plan applies with degree-ordered orientation keeping wedge counts
    subquadratic."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    de = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    e1 = de.alias("e1")
    e2 = de.alias("e2")
    e3 = de.alias("e3")
    return (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def _morton16(xcol: str, ycol: str) -> str:
    """Bit-interleave two 8-bit bins into a 16-bit Morton (z-order) key —
    plain `>> & <<` integer ops, identical text on both engines."""
    terms = []
    for i in range(8):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@_q(
    "q_zorder_cluster",
    f"""
    WITH b AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice / 2000) AS BIGINT) & 255 AS x,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) & 255 AS y
      FROM orders)
    SELECT o_orderkey, x, y, {_morton16('x', 'y')} AS zkey
    FROM b
    """,
)
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over (price bin, day bin) — the
    multi-dimensional data-layout technique behind Delta/Iceberg
    OPTIMIZE ZORDER: sorting 100 TB by this key co-locates rows close
    in BOTH dimensions, so 2-D range predicates prune most files
    instead of one dimension's worth. The interleave is pure integer
    bit arithmetic (generated once, same text both engines);
    floor-before-cast pins the double→int conversion (Spark truncates,
    DuckDB rounds — floor makes them agree)."""
    orders = load_table(spark, sf_dir, "orders")
    b = orders.select(
        "o_orderkey",
        (F.floor(F.col("o_totalprice") / 2000).cast("long").bitwiseAND(255)).alias(
            "x"
        ),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') & 255"
        ).alias("y"),
    )
    return b.select("o_orderkey", "x", "y", F.expr(_morton16("x", "y")).alias("zkey"))


@_q(
    "q_ab_welch_ttest",
    f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             {_msum6('value')} AS s1, {_msum6('value * value')} AS s2
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
    m AS (
      SELECT event_type, n, s1 / CAST(n AS DOUBLE) AS mean,
             (s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var
      FROM g)
    SELECT a.n AS n_a, b.n AS n_b, a.mean AS mean_a, b.mean AS mean_b,
           (a.mean - b.mean)
             / sqrt(a.var / CAST(a.n AS DOUBLE) + b.var / CAST(b.n AS DOUBLE))
             AS t_stat
    FROM m a, m b
    WHERE a.event_type = 'click' AND b.event_type = 'view'
    """,
)
def q_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t statistic (click vs view event values) from
    exact decimal power sums — the A/B-test primitive computed in ONE
    distributed pass per group (no mean-subtract rescan): sample
    variance via s2 - s1²/n on exact sums, then a fixed scalar double
    formula both engines evaluate identically. At 100 TB this is a
    map-side-combinable aggregate; the final t is O(1)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select("event_type", "value")
    )
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("value"), 6).alias("s1"),
        exact_sum(F.col("value") * F.col("value"), 6).alias("s2"),
    )
    m = g.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n").cast("double")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n").cast("double"))
            / (F.col("n").cast("double") - 1)
        ).alias("var"),
    )
    a = m.where(F.col("event_type") == "click").alias("a")
    b = m.where(F.col("event_type") == "view").alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.col("a.mean").alias("mean_a"),
        F.col("b.mean").alias("mean_b"),
        (
            (F.col("a.mean") - F.col("b.mean"))
            / F.sqrt(
                F.col("a.var") / F.col("a.n").cast("double")
                + F.col("b.var") / F.col("b.n").cast("double")
            )
        ).alias("t_stat"),
    )


@_q(
    "q_golden_record",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS first_seen,
           max(ts) AS last_seen,
           arg_max(CAST(json_extract_string(props, '$.k') AS BIGINT), ts)
             AS last_k,
           arg_max(value, ts) FILTER (WHERE event_type = 'purchase')
             AS last_purchase_value
    FROM events GROUP BY user_id
    """,
)
def q_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship: one consolidated row per user with
    most-recent-wins per attribute — the master-data-management merge
    (reference's keep-latest dedup generalized to per-COLUMN
    survivorship). max_by(attr, ts) picks the latest value per
    attribute independently; the FILTER clause scopes one attribute to
    purchase events only, leaving NULL for users who never purchased
    (absent evidence survives as NULL, not as a stale value). One
    map-side-combinable aggregate — no sort, no window, no self-join;
    ts is unique per user in this data, so arg-max is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.expr(
            "max_by(CAST(get_json_object(props, '$.k') AS BIGINT), ts)"
        ).alias("last_k"),
        F.expr(
            "max_by(value, ts) FILTER (WHERE event_type = 'purchase')"
        ).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Batch 25 — TPC-H suite completion (every classic the testdata schema
# can express: Q6, Q8, Q13, Q15, Q17, Q19, Q22-adapted)
# ---------------------------------------------------------------------------


@_q(
    "q_sql_q6",
    f"""
    SELECT {_msum('l_extendedprice * l_discount')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: pure scan-filter-aggregate.
    All three predicates push to the parquet scan (PushedFilters) and
    the projection prunes to 2 columns — at 100 TB this reads a small
    fraction of row groups via min/max statistics and shuffles nothing
    (single scalar aggregate, map-side partials only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "q_sql_q8",
    f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             n2.n_name AS supp_nation,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA'),
    a AS (
      SELECT o_year,
             {_msum("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END")}
               AS nation_rev,
             {_msum('volume')} AS total_rev
      FROM vol GROUP BY 1)
    SELECT o_year, nation_rev, total_rev,
           nation_rev / total_rev AS mkt_share
    FROM a
    """,
)
def q_sql_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_1 suppliers' slice of
    ASIA-customer revenue per year. Every dimension (customer, nation,
    region, supplier) broadcasts after the region filter; lineitem and
    orders shuffle once on the order key. The share is one double
    division of two exact cent-rounded sums."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cnk"))
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cnk"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    a = vol.groupBy("o_year").agg(
        money_sum(
            F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(
                F.lit(0)
            )
        ).alias("nation_rev"),
        money_sum(F.col("volume")).alias("total_rev"),
    )
    return a.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
    )


@_q(
    "q_sql_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def q_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution. The LEFT join keeps
    zero-order customers (count(o_orderkey) counts only non-null
    matches — the NULL-skipping semantics the outer join exists for),
    then the histogram collapses 150k customers to ~40 buckets. Two
    shuffles: one on the join key, one trivial on the count."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "q_sql_q15",
    f"""
    WITH r AS (
      SELECT l_suppkey, {_msum('l_extendedprice * (1 - l_discount)')} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT l_suppkey, total_rev
    FROM (SELECT l_suppkey, total_rev, max(total_rev) OVER () AS mx FROM r) t
    WHERE total_rev = mx
    """,
)
def q_sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the supplier(s) achieving the maximum
    quarterly revenue — the view + scalar-subquery formulation
    re-expressed as an empty-partition window max, which Spark executes
    as a single-row broadcast exchange over the (tiny) per-supplier
    aggregate, never re-scanning lineitem. Ties all surface (no
    arbitrary pick), and revenue is exact-cent-rounded so the equality
    is well-defined cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    r = li.groupBy("l_suppkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_rev"
        )
    )
    w = Window.partitionBy()
    return (
        r.withColumn("mx", F.max("total_rev").over(w))
        .where(F.col("total_rev") == F.col("mx"))
        .select("l_suppkey", "total_rev")
    )


@_q(
    "q_sql_q17",
    f"""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*))
               AS thr
      FROM lineitem GROUP BY l_partkey)
    SELECT {_msum('l.l_extendedprice')} / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.thr
    """,
)
def q_sql_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lines below 20% of their
    part's average quantity. The correlated subquery decorrelates into
    a per-part aggregate joined back on the part key — one shuffle each
    side, same key, and the threshold (0.2 * exact-integer mean) is a
    deterministic double. At 100 TB both sides partition on l_partkey,
    so the join is co-located after the aggregate's shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("thr")
    )
    return (
        li.join(pa, "l_partkey")
        .where(F.col("l_quantity") < F.col("thr"))
        .agg(
            (money_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@_q(
    "q_sql_q19",
    f"""
    SELECT {_msum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q_sql_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted-revenue brackets: a disjunction of three
    (brand, quantity-range, size-range) predicates spanning both join
    sides. The bracket OR cannot push below the join whole, but its
    single-side residuals can — Catalyst extracts `p_brand IN (...)`
    AND `p_size <= 15` onto the part scan and `l_quantity <= 30` onto
    lineitem, so the broadcast hash join sees pre-pruned inputs and the
    full disjunction runs as the join residual."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.where(bracket).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@_q(
    "q_sql_q22",
    f"""
    WITH avg_bal AS (
      SELECT {_msum6('c_acctbal')} / count(*) AS a
      FROM customer WHERE c_acctbal > 0),
    rich_idle AS (
      SELECT c.c_nationkey, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (SELECT a FROM avg_bal)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'))
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           {_msum('c_acctbal')} AS totacctbal
    FROM rich_idle GROUP BY c_nationkey
    """,
)
def q_sql_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity (adapted: recency replaces the
    missing phone prefix): above-average-balance customers with no
    recent orders, grouped by nation. The scalar average broadcasts as
    a literal-like single row; the NOT EXISTS is a LEFT ANTI join
    against date-pruned orders. The average threshold is exact-decimal
    sum / count — a deterministic double both engines reproduce."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    cust = load_table(spark, sf_dir, "customer")
    avg_bal = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            (exact_sum(F.col("c_acctbal"), 6) / F.count(F.lit(1))).alias("a")
        )
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a")).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        money_sum(F.col("c_acctbal")).alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# TPC-H completion batch (round 3): Q2, Q9, Q11, Q12, Q16, Q20, Q21 —
# the seven shapes missing from the suite. The driver testdata carries no
# partsupp table (and no commit/receipt dates or ship modes), so these are
# TPC-H-*shaped* adaptations: identical join/subquery/decorrelation
# structure over a deterministically *derived* supply table
#   partsupp := per (l_partkey, l_suppkey): min unit price as supplycost,
#               integer-exact total quantity as availqty
# mirrored expression-for-expression in the oracle CTE, and lateness
# predicates (shipdate vs orderdate + interval) replacing the missing
# commit/receipt-date columns.
# ---------------------------------------------------------------------------

_PARTSUPP_CTE = """
    WITH partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty
      FROM lineitem GROUP BY 1, 2)
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived supply table (see block comment). min of IEEE doubles
    over the same operand set and an int64 quantity sum — both
    deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast("long")).alias("ps_availqty"),
    )


@_q(
    "q_sql_q2",
    _PARTSUPP_CTE
    + """
    , rs AS (
      SELECT ps.ps_partkey, ps.ps_supplycost, s.s_name, s.s_acctbal, n.n_name
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT t.s_acctbal, t.s_name, t.n_name, t.ps_partkey AS p_partkey,
           p.p_brand, t.ps_supplycost
    FROM (
      SELECT *, min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS mn
      FROM rs) t
    JOIN part p ON t.ps_partkey = p.p_partkey
    WHERE p.p_size = 1 AND p.p_type = 'ECONOMY' AND t.ps_supplycost = t.mn
    """,
)
def q_sql_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier: for each qualifying part, the
    EUROPE supplier(s) quoting the regional minimum supply cost. The
    correlated MIN subquery decorrelates into a window min partitioned
    by part key — computed once on the already region-filtered supply
    rows, no re-scan. supplier⋈nation⋈region collapses to a broadcast
    chain (both dims are tiny); the only real shuffle is the window's
    hash partition on ps_partkey, which AQE coalesces. Ties surface
    (all min-cost suppliers), matching the SQL twin exactly."""
    ps = _derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    rs = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    best = rs.withColumn("mn", F.min("ps_supplycost").over(w)).where(
        F.col("ps_supplycost") == F.col("mn")
    )
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 1) & (F.col("p_type") == "ECONOMY")
    )
    return best.join(F.broadcast(part), best.ps_partkey == part.p_partkey).select(
        "s_acctbal",
        "s_name",
        "n_name",
        F.col("ps_partkey").alias("p_partkey"),
        "p_brand",
        "ps_supplycost",
    )


@_q(
    "q_sql_q9",
    _PARTSUPP_CTE
    + f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {_msum('l.l_extendedprice * (1 - l.l_discount) - ps.ps_supplycost * l.l_quantity')}
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def q_sql_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit by nation × order year. Five joins:
    part (name-filtered, broadcast), supplier+nation (broadcast),
    orders (shuffle on the order key), and the derived supply table —
    which partitions on (partkey, suppkey), the same key the lineitem
    side aggregates by, so AQE sees a co-partitioned pair. Profit
    terms are IEEE-identical doubles cross-engine; the sum is exact
    decimal accumulation rounded to cents."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    ps = _derived_partsupp(spark, sf_dir)
    profit = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    return profit.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("ps_supplycost") * F.col("l_quantity")
        ).alias("sum_profit")
    )


@_q(
    "q_sql_q11",
    _PARTSUPP_CTE
    + f"""
    , scoped AS (
      SELECT ps.ps_partkey, ps.ps_supplycost * ps.ps_availqty AS value
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3')
    SELECT ps_partkey, {_msum('value')} AS value
    FROM scoped
    GROUP BY ps_partkey
    HAVING {_msum('value')} > (SELECT {_msum('value')} * 0.01 FROM scoped)
    """,
)
def q_sql_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: parts whose inventory value within one
    nation exceeds a fraction of that nation's total. The scalar
    subquery is a single-row aggregate broadcast against the per-part
    aggregate — the scoped rows are computed once and feed both sides
    (Spark reuses the exchange; no second scan). Both the per-part and
    grand-total sums are exact-decimal, cent-rounded, so the threshold
    comparison is bit-stable cross-engine."""
    ps = _derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    scoped = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"),
        )
    )
    per_part = scoped.groupBy("ps_partkey").agg(
        money_sum(F.col("value")).alias("value")
    )
    total = scoped.agg((money_sum(F.col("value")) * 0.01).alias("thr"))
    return per_part.join(F.broadcast(total), F.col("value") > F.col("thr")).select(
        "ps_partkey", "value"
    )


@_q(
    "q_sql_q12",
    """
    SELECT l.l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q_sql_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority split (adapted: the return flag
    stands in for the missing ship-mode column, and 'shipped more than
    60 days after ordering' for the missing commit/receipt lateness
    pair). One shuffle joins the two facts on the order key — the
    year filter pushes to the lineitem scan; the lateness predicate
    spans both sides so it runs as the join residual — then the
    conditional counts collapse in a single grouped aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@_q(
    "q_sql_q16",
    _PARTSUPP_CTE
    + """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_suppkey % 17 = 0)
    GROUP BY 1, 2, 3
    """,
)
def q_sql_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 supplier count by part attributes (adapted: the
    'customer complaints' comment scan becomes a deterministic key
    predicate — no comment column exists). The NOT IN over a
    null-free key set is a LEFT ANTI broadcast join; part filters push
    to the scan before the supply join; COUNT(DISTINCT) shuffles once
    on the (brand, type, size) group key with partial distinct
    map-side."""
    ps = _derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 17 == 0)
        .select("s_suppkey")
    )
    return (
        ps.join(bad_supp, ps.ps_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


@_q(
    "q_sql_q20",
    _PARTSUPP_CTE
    + """
    , shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
    JOIN partsupp ps ON ps.ps_suppkey = s.s_suppkey
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                   AND sh.l_suppkey = ps.ps_suppkey
    WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
      AND ps.ps_availqty > 2 * sh.q96
    """,
)
def q_sql_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 excess-stock suppliers (adapted lateness-free form):
    EUROPE suppliers holding more than twice what they shipped of a
    'small%' part during 1996. The nested IN-chains decorrelate to a
    broadcast semi join (part names) plus a co-partitioned equi-join
    between the derived supply table and the year-scoped shipment
    aggregate — both partition on (partkey, suppkey), so the join
    adds no exchange beyond the two aggregates' own. DISTINCT
    collapses the per-part multiplicity to one row per supplier."""
    ps = _derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q96"))
    )
    small = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    sn = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        ps.join(F.broadcast(small), ps.ps_partkey == small.p_partkey, "left_semi")
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty") > 2 * F.col("q96"))
        .join(F.broadcast(sn), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@_q(
    "q_sql_q21",
    """
    WITH fo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY) AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM fo GROUP BY 1)
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM fo
    JOIN per_order po ON po.l_orderkey = fo.l_orderkey
    JOIN supplier s ON s.s_suppkey = fo.l_suppkey
    WHERE fo.late AND po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY 1
    """,
)
def q_sql_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers-who-kept-orders-waiting (adapted: 'shipped
    more than 45 days after ordering' replaces the missing
    commit/receipt lateness). The classic EXISTS + NOT-EXISTS pair
    over the same fact decorrelates into per-order WINDOW aggregates —
    n_supp > 1 is the EXISTS (another supplier contributed), and
    n_late_supp = 1 is the NOT EXISTS (nobody else was late) — sharing
    the one l_orderkey exchange with the rows they filter, so lineitem
    shuffles exactly once instead of three self-join passes. Supplier
    names resolve via broadcast at the end, against the already-tiny
    qualifying set."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    fo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias(
            "late"
        ),
    )
    # per-order EXISTS/NOT-EXISTS as window aggregates over the SAME
    # exchange the filter consumes — fo is computed once and lineitem
    # shuffles exactly once on the order key (a separate groupBy would
    # re-shuffle fo to join the aggregate back)
    w = Window.partitionBy("l_orderkey")
    scoped = fo.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        scoped.where(
            F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(supp), scoped.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Batch 26 — TSDB completions (LOCF gap-fill, counter-reset rate, lag-1
# autocorrelation) and cross-system reconciliation (order-insensitive
# table checksum, keyed snapshot diff).
# ---------------------------------------------------------------------------


@_q(
    "q_locf_fill",
    """
    WITH bounds AS (
      SELECT user_id, CAST(min(CAST(ts AS DATE)) AS TIMESTAMP) AS d0,
             CAST(max(CAST(ts AS DATE)) AS TIMESTAMP) AS d1
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS g FROM bounds
    ),
    unioned AS (
      SELECT user_id, epoch_us(ts) AS t, value AS v, 0 AS is_grid,
             CAST(NULL AS DATE) AS g_day
      FROM events
      UNION ALL
      SELECT user_id, epoch_us(g), NULL, 1, CAST(g AS DATE) FROM grid
    ),
    w AS (
      SELECT user_id, t, is_grid, g_day,
        last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, is_grid
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt
      FROM unioned
    )
    SELECT user_id, g_day, pv AS locf_value, t - pt AS staleness_us
    FROM w WHERE is_grid = 1
    """,
)
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF (last-observation-carried-forward) resampling to a daily grid —
    the step-function sibling of `q_interp_linear` and the TSDB default for
    gauges that hold until restated. Grid points union into the reading
    stream; ONE backward ignore-nulls window carries the latest reading and
    its timestamp to every grid row; `staleness_us` (grid time − reading
    time) is the monitoring-world freshness metric. NULL before the first
    observation — LOCF never invents history. One shuffle on the series key,
    same association-free semantics in both engines (values are carried,
    never combined, so no float arithmetic happens at all)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).cast("timestamp").alias("d0"),
        F.max(F.col("ts").cast("date")).cast("timestamp").alias("d1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("g"),
    )
    readings = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.col("value").alias("v"),
        F.lit(0).alias("is_grid"),
        F.lit(None).cast("date").alias("g_day"),
    )
    grid_rows = grid.select(
        "user_id",
        F.unix_micros("g").alias("t"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_grid"),
        F.col("g").cast("date").alias("g_day"),
    )
    u = readings.unionByName(grid_rows)
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "user_id",
        "t",
        "is_grid",
        "g_day",
        F.last("v", ignorenulls=True).over(wprev).alias("pv"),
        F.last(
            F.when(F.col("v").isNotNull(), F.col("t")), ignorenulls=True
        ).over(wprev).alias("pt"),
    )
    return filled.filter(F.col("is_grid") == 1).select(
        "user_id",
        "g_day",
        F.col("pv").alias("locf_value"),
        (F.col("t") - F.col("pt")).alias("staleness_us"),
    )


@_q(
    "q_counter_increase",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(floor(value * 1000) AS BIGINT) AS v_milli,
             lead(CAST(floor(value * 1000) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nv
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN nv >= v_milli THEN nv - v_milli ELSE nv END)
                AS BIGINT) AS increase_milli,
           CAST(count(CASE WHEN nv < v_milli THEN 1 END) AS BIGINT) AS n_resets
    FROM seq WHERE nv IS NOT NULL
    GROUP BY 1
    """,
)
def q_counter_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus-style ``increase()`` over a monotone counter with reset
    detection: per consecutive pair, a drop in the raw reading means the
    counter restarted at zero, so the contribution is the new reading
    itself rather than a (negative) delta. Readings quantize to integer
    milli-units with mode-free floor, deltas sum in int64 — bit-exact in
    any engine at any parallelism. One window sort + one grouped aggregate
    sharing the same user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
        "ts",
        "event_id",
    ).withColumn("nv", F.lead("v_milli").over(w)).filter(F.col("nv").isNotNull())
    inc = F.when(
        F.col("nv") >= F.col("v_milli"), F.col("nv") - F.col("v_milli")
    ).otherwise(F.col("nv"))
    return seq.groupBy("user_id").agg(
        F.sum(inc).alias("increase_milli"),
        F.count(F.when(F.col("nv") < F.col("v_milli"), F.lit(1))).alias("n_resets"),
    )


@_q(
    "q_autocorr_lag1",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(floor(value * 1000) AS BIGINT) AS x,
             lead(CAST(floor(value * 1000) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
      FROM events
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM seq WHERE y IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr_lag1
    FROM m WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per series — the TSDB seasonality/persistence
    probe (Pearson r between consecutive readings). Same exact-moments
    recipe as q_linreg_trend: readings quantize to integer milli-units
    (≤1e6 here), so every moment and every n·S−S·S combination stays
    int64-exact (≤~1e18 at sf0.1's ~670 rows/series) — order-independent
    partial aggregation, zero cross-engine drift. Only the final Pearson
    ratio is IEEE, applied in one declared association order
    (num / (sqrt(dxx) · sqrt(dyy))) on identical int64→double operands.
    One window + one aggregate on the same user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.select(
            "user_id",
            F.floor(F.col("value") * 1000).cast("long").alias("x"),
            "ts",
            "event_id",
        )
        .withColumn("y", F.lead("x").over(w))
        .filter(F.col("y").isNotNull())
    )
    m = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        m.filter((dxx > 0) & (dyy > 0))
        .select(
            "user_id",
            "n",
            (
                num.cast("double")
                / (F.sqrt(dxx.cast("double")) * F.sqrt(dyy.cast("double")))
            ).alias("autocorr_lag1"),
        )
    )


@_q(
    "q_table_checksum",
    """
    WITH rows_h AS (
      SELECT o_orderstatus,
             CAST(('0x' || substr(md5(concat_ws('|',
               CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
               o_orderstatus, CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
               CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR),
               o_orderpriority)), 1, 12)) AS BIGINT) AS row_sig
      FROM orders
    )
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(row_sig) AS BIGINT) AS xor_sig,
           CAST(SUM(row_sig % 1000003) AS BIGINT) AS sum_sig
    FROM rows_h GROUP BY 1
    """,
)
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint — the cross-system
    reconciliation primitive (does the warehouse copy equal the lake
    copy?) that never moves the data: each row canonicalizes to a
    delimited string (doubles as mode-free floor cents, timestamps as
    ISO dates), hashes to a 48-bit md5 prefix, and the per-group XOR +
    bounded SUM of row signatures commute — any partitioning, any
    engine, any row order produces the same fingerprint. Scale shape:
    pure map + one partial-aggregable groupBy; comparing two 100 TB
    tables costs two scans and exchanges only (status, 3 longs)."""
    orders = load_table(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("date").cast("string"),
        F.floor(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.col("o_orderpriority"),
    )
    sig = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("long")
    return (
        orders.select("o_orderstatus", sig.alias("row_sig"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(row_sig)").alias("xor_sig"),
            F.sum(F.col("row_sig") % 1000003).alias("sum_sig"),
        )
    )


@_q(
    "q_table_diff",
    """
    WITH snap_a AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS payload
      FROM orders WHERE o_orderkey % 97 < 95
    ),
    snap_b AS (
      SELECT o_orderkey AS k,
             CAST(floor(o_totalprice * 100) AS BIGINT)
               + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS payload
      FROM orders WHERE o_orderkey % 89 < 87
    ),
    classified AS (
      SELECT COALESCE(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.payload <> b.payload THEN 'changed'
                  ELSE 'unchanged' END AS change_type
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
           min(k) AS min_key, max(k) AS max_key
    FROM classified GROUP BY 1
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot diff — the data-engineering reconciliation report
    (what changed between yesterday's load and today's?): FULL OUTER join
    on the key, rows classified added / removed / changed / unchanged by
    null-side and payload comparison. The two snapshots here derive
    deterministically from `orders` (modular key filters simulate deletes
    and inserts; a +1-cent perturbation simulates updates) so the report
    is exactly reproducible. Scale shape: both sides shuffle once on the
    join key (sort-merge under AQE), the classification is a map, and only
    (type, count, min, max) leaves the executors — a 100 TB table diff is
    two scans + one co-partitioned join, no driver materialization."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    snap_a = orders.filter(F.col("o_orderkey") % 97 < 95).select(
        F.col("o_orderkey").alias("k"), cents.alias("payload")
    )
    snap_b = orders.filter(F.col("o_orderkey") % 89 < 87).select(
        F.col("o_orderkey").alias("k"),
        (
            cents
            + F.when(F.col("o_orderkey") % 13 == 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("payload"),
    )
    joined = snap_a.alias("a").join(
        snap_b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer"
    )
    change = (
        F.when(F.col("a.k").isNull(), F.lit("added"))
        .when(F.col("b.k").isNull(), F.lit("removed"))
        .when(F.col("a.payload") != F.col("b.payload"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("a.k"), F.col("b.k")).alias("k"),
            change.alias("change_type"),
        )
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 27 — training-data featurization: hashing-trick features, int8
# embedding quantization, deterministic domain-mix sampling, fixed-width
# numeric histogram.
# ---------------------------------------------------------------------------


@_q(
    "q_feature_hash",
    """
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
      FROM documents WHERE trim(text) <> ''
    )
    SELECT CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 64 AS bucket,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT token) AS BIGINT) AS n_terms
    FROM tok GROUP BY 1
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (the vocabulary-free bag-of-words
    encoder): every token maps to one of 64 feature buckets by md5 — no
    vocabulary build, no dictionary broadcast, the same bucket for the
    same token on any engine, run, or cluster size, which is what makes
    feature pipelines reproducible at 100 TB. The corpus-level report
    (tokens / documents / distinct terms per bucket) is the collision
    audit that picks the bucket width. Plan: map-side split+explode+hash,
    one shuffle on the bucket key with partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.filter(F.trim(F.col("text")) != "")
        .select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long") % 64
    )
    return (
        tok.select("doc_id", "token", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("token").alias("n_terms"),
        )
    )


@_q(
    "q_embed_quantize_int8",
    """
    WITH scaled AS (
      SELECT vec_id, label,
             CAST(len(embedding) AS BIGINT) AS n_dims,
             127e0 / list_max(list_transform(embedding,
                                             x -> abs(CAST(x AS DOUBLE)))) AS scale,
             embedding
      FROM embeddings
      WHERE list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
    ),
    q AS (
      SELECT vec_id, label, n_dims, scale,
             list_transform(embedding,
               x -> CAST(least(127, greatest(-127,
                      floor(CAST(x AS DOUBLE) * scale + 0.5e0))) AS BIGINT)) AS qv
      FROM scaled
    )
    SELECT vec_id, label, n_dims, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS q_sumsq,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max
    FROM q
    """,
)
def q_embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embedding vectors — the 4×
    compression step every billion-vector ANN index applies before
    sharding. Per vector: scale = 127/max|x| (one IEEE division on
    identical operands in both engines), q_i = floor(x·scale + 0.5)
    clamped to [−127,127] — floor(+0.5) is rounding-mode-free, unlike
    round(), whose half-up vs half-even tie-break differs by engine.
    The per-vector audit (sum, sum-of-squares, min, max of the codes) is
    integer-exact; map-only, zero shuffles, embarrassingly parallel."""
    emb = load_table(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    scaled = emb.filter(maxabs > 0).select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("n_dims"),
        (F.lit(127.0) / maxabs).alias("scale"),
        "embedding",
    )
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.least(
            F.lit(127),
            F.greatest(
                F.lit(-127),
                F.floor(x.cast("double") * F.col("scale") + F.lit(0.5)),
            ),
        ).cast("long"),
    )
    q = scaled.select("vec_id", "label", "n_dims", "scale", qv.alias("qv"))
    zero = F.lit(0).cast("long")
    return q.select(
        "vec_id",
        "label",
        "n_dims",
        "scale",
        F.aggregate("qv", zero, lambda a, v: a + v).alias("q_sum"),
        F.aggregate("qv", zero, lambda a, v: a + v * v).alias("q_sumsq"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    )


@_q(
    "q_domain_mix_sample",
    """
    WITH rated AS (
      SELECT source, n_chars,
             CASE CAST(substr(source, 4) AS INTEGER) % 4
               WHEN 0 THEN 10000 WHEN 1 THEN 5000
               WHEN 2 THEN 2500 ELSE 1000 END AS rate_bp,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 10000 AS draw
      FROM documents
    )
    SELECT source, rate_bp,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(CASE WHEN draw < rate_bp THEN 1 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN draw < rate_bp THEN n_chars END) AS BIGINT)
             AS kept_chars
    FROM rated GROUP BY 1, 2
    """,
)
def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mix downsampling — the data-mixing primitive
    behind corpus reweighting (oversample curated sources, downsample
    crawl): each source carries a target keep-rate in basis points; a
    document survives iff its content-stable md5 draw falls under the
    rate. No random(), no global sort, no state: the same document makes
    the same decision on every engine, run, and partitioning — re-running
    the pipeline tomorrow keeps the training set stable. Map-only
    assignment + one audit aggregate per source."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 4 == 0, 10000)
        .when(F.substring("source", 4, 10).cast("int") % 4 == 1, 5000)
        .when(F.substring("source", 4, 10).cast("int") % 4 == 2, 2500)
        .otherwise(1000)
    )
    from etl_pipeline_project_spark.operators.text_analysis import hash_bucket

    rated = docs.select(
        "source",
        "n_chars",
        rate.alias("rate_bp"),
        hash_bucket(F.col("doc_id"), 10000).alias("draw"),
    )
    kept = F.col("draw") < F.col("rate_bp")
    return rated.groupBy("source", "rate_bp").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, F.lit(1))).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars"))).alias("kept_chars"),
    )


@_q(
    "q_numeric_histogram",
    """
    SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
           CAST(floor(l_extendedprice / 5000) AS BIGINT) * 5000 AS bin_lo,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(max(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM lineitem GROUP BY 1
    """,
)
def q_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram — the profiling/visualization
    primitive (and the sketch behind range-partition planning): mode-free
    floor binning, integer-cent extrema and mass per bin. One map + one
    partial-aggregable groupBy on the bin id; bin count is bounded by the
    value domain, not the row count, so the result stays tiny at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    bin_col = F.floor(F.col("l_extendedprice") / 5000).cast("long")
    return (
        li.select(bin_col.alias("bin"), cents.alias("cents"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "bin",
            (F.col("bin") * 5000).alias("bin_lo"),
            "n",
            "min_cents",
            "max_cents",
            "sum_cents",
        )
    )


# ---------------------------------------------------------------------------
# Batch 28 — bitmap-index exact distinct, chi-square independence test,
# Holt linear-trend smoothing.
# ---------------------------------------------------------------------------


@_q(
    "q_bitmap_distinct",
    """
    WITH words AS (
      SELECT event_type, user_id // 32 AS word_idx,
             bit_or(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS word
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(bit_count(word)) AS BIGINT) AS n_distinct_users,
           CAST(count(*) AS BIGINT) AS n_words
    FROM words GROUP BY 1
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index EXACT distinct count — the OLAP-engine trick (Doris /
    ClickHouse bitmap aggregates) for dense integer keys: pack presence
    into 32-bit words keyed by ``id DIV 32`` (bit_or is idempotent ⇒
    duplicate events collapse map-side), then popcount-sum the words.
    Both aggregation levels are associative and partial-aggregable, so
    the 100 TB plan is two thin exchanges of (type, word) integers —
    no count-distinct row explosion, no HLL approximation error."""
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            "event_type",
            (F.col("user_id") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("event_type", "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).alias("n_distinct_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


@_q(
    "q_chi_square",
    """
    WITH cells AS (
      SELECT event_type, dayofweek(ts) AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS r_tot,
             SUM(o) OVER (PARTITION BY dow) AS c_tot,
             SUM(o) OVER () AS n
      FROM cells
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             list(
               {'k': event_type || '|' || CAST(dow AS VARCHAR),
                'o': CAST(o AS DOUBLE),
                'e': CAST(r_tot AS DOUBLE) / CAST(n AS DOUBLE)
                       * CAST(c_tot AS DOUBLE)}
               ORDER BY event_type, dow) AS cells
      FROM tot
    )
    SELECT n_cells,
           list_reduce(list_prepend(0e0, list_transform(cells,
               c -> (c.o - c.e) * (c.o - c.e) / c.e)),
             (acc, x) -> acc + x) AS chi2
    FROM folded
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test over the (event_type × weekday)
    contingency table — the categorical-drift / A-B sanity statistic.
    Observed counts are exact; expected counts derive in one declared
    IEEE order ((R/N)·C); the per-cell contributions fold in sorted cell
    order, so the double sum has ONE association order in both engines —
    the same sorted-fold determinism recipe as q_ewma. The cell table is
    bounded by the category product, not row count: aggregating 100 TB
    yields ~49 cells, and the windows run on that tiny table."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.dayofweek("ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("o")
    )
    tot = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("c_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    folded = tot.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.concat_ws("|", F.col("event_type"), F.col("dow").cast("string")).alias("k"),
                    F.col("o").cast("double").alias("o"),
                    (
                        F.col("r_tot").cast("double") / F.col("n").cast("double")
                        * F.col("c_tot").cast("double")
                    ).alias("e"),
                )
            )
        ).alias("cells"),
    )
    contrib = F.transform(
        F.col("cells"), lambda c: (c["o"] - c["e"]) * (c["o"] - c["e"]) / c["e"]
    )
    return folded.select(
        "n_cells",
        F.aggregate(contrib, F.lit(0.0), lambda acc, x: acc + x).alias("chi2"),
    )


@_q(
    "q_holt_linear",
    """
    WITH series AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1 HAVING count(*) >= 2
    ),
    fitted AS (
      SELECT user_id, n_events,
             -- 2-element [level, trend] list accumulator: DuckDB 1.0's
             -- list_reduce mis-evaluates STRUCT accumulators after the
             -- first step (verified minimal repro); DOUBLE-list folds are
             -- correct and keep the same association order as the Spark
             -- struct fold
             list_reduce(
               list_prepend([vals[1], vals[2] - vals[1]],
                            list_transform(vals[3:], x -> [x, 0e0])),
               (acc, c) ->
                 [0.2e0 * c[1] + 0.8e0 * (acc[1] + acc[2]),
                  0.1e0 * ((0.2e0 * c[1] + 0.8e0 * (acc[1] + acc[2])) - acc[1])
                         + 0.9e0 * acc[2]]) AS st
      FROM series
    )
    SELECT user_id, n_events, st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_1
    FROM fitted
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend double exponential smoothing (α=0.2, β=0.1) per
    series, with the one-step-ahead forecast — the second rung of the
    TSDB forecasting ladder above q_ewma, and another recursion windows
    cannot express. The (level, trend) pair folds through a struct
    accumulator over the sorted series: identical literals, identical
    association order, and identical operand trees in both engines, so
    the IEEE doubles hash bit-exact with no rounding. One shuffle on the
    series key; each series folds inside its executor and only
    (key, level, trend, forecast) leaves."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("series"),
        )
        .filter(F.col("n_events") >= 2)
    )
    vals = F.transform(F.col("series"), lambda s: s["value"].cast("double"))
    init = F.struct(
        F.element_at(vals, 1).alias("l"),
        (F.element_at(vals, 2) - F.element_at(vals, 1)).alias("b"),
    )
    rest = F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0)))

    def step(acc, x):
        nl = F.lit(0.2) * x + F.lit(0.8) * (acc["l"] + acc["b"])
        nb = F.lit(0.1) * (
            (F.lit(0.2) * x + F.lit(0.8) * (acc["l"] + acc["b"])) - acc["l"]
        ) + F.lit(0.9) * acc["b"]
        return F.struct(nl.alias("l"), nb.alias("b"))

    st = F.aggregate(rest, init, step)
    return agg.select(
        "user_id",
        "n_events",
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"]).alias("forecast_1"),
    )


# ---------------------------------------------------------------------------
# Batch 29 — rolling-band anomaly detection, classifier evaluation,
# ranking evaluation.
# ---------------------------------------------------------------------------


@_q(
    "q_bollinger_bands",
    """
    WITH seq AS (
      SELECT user_id, event_id,
             CAST(floor(value * 1000) AS BIGINT) AS v,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS s,
             CAST(SUM(CAST(floor(value * 1000) AS BIGINT)
                      * CAST(floor(value * 1000) AS BIGINT)) OVER w AS BIGINT) AS q
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, v, n,
           ((v * n - s) * (v * n - s) > 4 * n * (n * q - s * s)) AS breach
    FROM seq WHERE n = 20
    """,
)
def q_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach detection — the rolling mean ± 2σ anomaly
    flag, evaluated ENTIRELY in integer arithmetic: readings quantize to
    milli-units; over the 20-row frame the window keeps (n, Σv, Σv²); and
    |v − mean| > 2σ is tested in cross-multiplied square form
    (v·n − S)² > 4·n·(n·Q − S²) — no division, no sqrt, no float at all,
    so the flag is bit-exact at any parallelism on any engine (max
    magnitude ~5×10¹⁴, inside int64). One window sort on the series-key
    exchange; emits only full windows (warm-up rows are not comparable)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        v.alias("v"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(v).over(w).alias("s"),
        F.sum(v * v).over(w).alias("q"),
    )
    dev = F.col("v") * F.col("n") - F.col("s")
    var4 = F.lit(4) * F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
    return seq.filter(F.col("n") == 20).select(
        "user_id", "event_id", "v", "n", (dev * dev > var4).alias("breach")
    )


@_q(
    "q_eval_metrics",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec, label AS true_label
               FROM embeddings WHERE vec_id < 100),
    s AS (
      SELECT q.qid, q.true_label, e.label,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY {{DOT}} DESC, e.vec_id
             ) AS rk
      FROM embeddings e, q WHERE e.vec_id <> q.qid
    ),
    votes AS (SELECT qid, true_label, label, COUNT(*) AS votes
              FROM s WHERE rk <= 5 GROUP BY 1, 2, 3),
    pred AS (
      SELECT qid, true_label, label AS predicted_label
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY votes DESC, label) AS rr FROM votes)
      WHERE rr = 1
    ),
    per_class AS (
      SELECT c.label,
        (SELECT COUNT(*) FROM pred
          WHERE true_label = c.label AND predicted_label = c.label) AS tp,
        (SELECT COUNT(*) FROM pred
          WHERE true_label <> c.label AND predicted_label = c.label) AS fp,
        (SELECT COUNT(*) FROM pred
          WHERE true_label = c.label AND predicted_label <> c.label) AS fn
      FROM (SELECT DISTINCT true_label AS label FROM pred) c
    )
    SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(CASE WHEN tp + fp > 0
                     THEN tp * 1000000 // (tp + fp) ELSE NULL END AS BIGINT)
             AS precision_ppm,
           CAST(CASE WHEN tp + fn > 0
                     THEN tp * 1000000 // (tp + fn) ELSE NULL END AS BIGINT)
             AS recall_ppm
    FROM per_class
    """.replace("{DOT}", "list_reduce(list_transform(generate_series(1, len(q.qvec)), i -> CAST(q.qvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (a, b) -> a + b)"),
)
def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation — leave-one-out k-NN (k=5) over the first
    100 vectors, reduced to per-class tp/fp/fn with precision/recall in
    integer parts-per-million (exact integer division: no float ratio to
    drift). The scoring pass is the broadcast-queries ANN shape (corpus
    never shuffles); the confusion reduction is two tiny aggregates.
    This is the quality-gate op a labeling/weak-supervision pipeline
    runs after every model refresh."""
    from etl_pipeline_project_spark.operators.similarity import dot_product
    from etl_pipeline_project_spark.operators.windows import topk_per_group

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("true_label"),
    )
    scored = (
        emb.select(F.col("vec_id").alias("nid"), F.col("label"), F.col("embedding"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "true_label",
            "nid",
            "label",
            dot_product("qvec", "embedding").alias("score"),
        )
    )
    top = topk_per_group(
        scored, "qid", [F.col("score").desc(), F.col("nid")], 5, rank_col="rk"
    )
    votes = top.groupBy("qid", "true_label", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("label"))
    pred = (
        votes.withColumn("rr", F.row_number().over(wv))
        .filter(F.col("rr") == 1)
        .select("qid", "true_label", F.col("label").alias("predicted_label"))
    )
    per_class = pred.select(
        F.col("true_label").alias("label"),
        (F.col("true_label") == F.col("predicted_label")).alias("hit"),
    ).groupBy("label").agg(
        F.count(F.when(F.col("hit"), F.lit(1))).alias("tp"),
        F.count(F.when(~F.col("hit"), F.lit(1))).alias("fn"),
    )
    fp = (
        pred.filter(F.col("true_label") != F.col("predicted_label"))
        .groupBy(F.col("predicted_label").alias("label"))
        .agg(F.count(F.lit(1)).alias("fp"))
    )
    out = per_class.join(fp, "label", "left").na.fill({"fp": 0})
    return out.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("tp * 1000000 DIV (tp + fp)"),
        ).alias("precision_ppm"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr("tp * 1000000 DIV (tp + fn)"),
        ).alias("recall_ppm"),
    )


@_q(
    "q_ndcg_bm25",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                  * CAST(n_docs AS DOUBLE) / CAST(total_toks AS DOUBLE)))
               * 1e6, 0) AS BIGINT) AS s_fp
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    ranked AS (
      SELECT doc_id, CAST(SUM(s_fp) AS BIGINT) AS bm25_micros,
             CAST(doc_id % 4 AS DOUBLE) AS rel
      FROM scored GROUP BY doc_id
      ORDER BY bm25_micros DESC, doc_id LIMIT 10
    ),
    lists AS (
      SELECT CAST(count(*) AS BIGINT) AS n_ranked,
             list(rel ORDER BY bm25_micros DESC, doc_id) AS by_rank,
             list(rel ORDER BY rel DESC, doc_id) AS ideal
      FROM ranked
    ),
    gains AS (
      SELECT n_ranked,
        list_reduce(list_prepend(0e0, list_transform(
            generate_series(1, CAST(n_ranked AS INTEGER)),
            i -> by_rank[i] / log2(CAST(i AS DOUBLE) + 1.0e0))),
          (a, b) -> a + b) AS dcg,
        list_reduce(list_prepend(0e0, list_transform(
            generate_series(1, CAST(n_ranked AS INTEGER)),
            i -> ideal[i] / log2(CAST(i AS DOUBLE) + 1.0e0))),
          (a, b) -> a + b) AS idcg
      FROM lists
    )
    SELECT n_ranked, dcg, idcg, dcg / idcg AS ndcg_10 FROM gains
    """,
)
def q_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking evaluation: NDCG@10 of the BM25 ranking (same integer
    micro-unit scores as q_search_bm25) against a deterministic graded
    relevance (doc_id mod 4 — a reproducible stand-in for editorial
    judgments). Both DCG and ideal-DCG fold the ranked relevance list in
    ONE declared order (rank ascending), so the log2-discounted double
    sums associate identically in both engines. The ranking itself is
    pure-integer ordering; everything after the top-10 cut runs on ≤10
    rows — evaluation cost is independent of corpus size."""
    c = F.lower(F.col("text"))
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.regexp_extract_all(c, F.lit("[a-z]+"), 0)).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_toks"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = F.col("n_docs").cast("double")
    idf = F.log(
        (nd - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfd = F.col("tf").cast("double")
    norm = tfd + F.lit(1.2) * (
        F.lit(0.25)
        + F.lit(0.75)
        * F.col("dl").cast("double")
        * nd
        / F.col("total_toks").cast("double")
    )
    s_fp = F.round(idf * (tfd * F.lit(2.2)) / norm * F.lit(1e6), 0).cast("long")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", s_fp.alias("s_fp"))
    )
    ranked = (
        scored.groupBy("doc_id")
        .agg(F.sum("s_fp").cast("long").alias("bm25_micros"))
        .select(
            "doc_id",
            "bm25_micros",
            (F.col("doc_id") % 4).cast("double").alias("rel"),
        )
        .orderBy(F.col("bm25_micros").desc(), "doc_id")
        .limit(10)
    )
    lists = ranked.agg(
        F.count(F.lit(1)).alias("n_ranked"),
        # sort_array ascending on (-score, doc_id) == rank order
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("bm25_micros")).alias("neg"), F.col("doc_id").alias("d"), F.col("rel").alias("r")))
            ),
            lambda s: s["r"],
        ).alias("by_rank"),
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col("rel")).alias("negr"), F.col("doc_id").alias("d"), F.col("rel").alias("r")))
            ),
            lambda s: s["r"],
        ).alias("ideal"),
    )

    def dcg_of(col_name: str):
        idxs = F.sequence(F.lit(1), F.col("n_ranked").cast("int"))
        return F.aggregate(
            F.transform(
                idxs,
                lambda i: F.get(F.col(col_name), i - 1)
                / F.log2(i.cast("double") + F.lit(1.0)),
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )

    gains = lists.select(
        "n_ranked",
        dcg_of("by_rank").alias("dcg"),
        dcg_of("ideal").alias("idcg"),
    )
    return gains.select(
        "n_ranked", "dcg", "idcg", (F.col("dcg") / F.col("idcg")).alias("ndcg_10")
    )


# ---------------------------------------------------------------------------
# Batch 30 — CUSUM change detection, mutual information.
# ---------------------------------------------------------------------------


@_q(
    "q_cusum_detect",
    """
    WITH series AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
                  // count(*) AS BIGINT) AS k,
             list(CAST(floor(value * 1000) AS BIGINT)
                  ORDER BY ts, event_id) AS vals
      FROM events GROUP BY 1
    ),
    folded AS (
      SELECT user_id, n_events, k,
             list_reduce(
               list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                             CAST(0 AS BIGINT)],
                            list_transform(vals, x -> [x, CAST(0 AS BIGINT),
                                                       CAST(0 AS BIGINT)])),
               (acc, c) -> [
                 greatest(CAST(0 AS BIGINT), acc[1] + c[1] - k),
                 greatest(acc[2], greatest(CAST(0 AS BIGINT), acc[1] + c[1] - k)),
                 acc[3] + CASE WHEN greatest(CAST(0 AS BIGINT),
                                             acc[1] + c[1] - k) > 200000
                               THEN 1 ELSE 0 END]) AS st
      FROM series
    )
    SELECT user_id, n_events, k AS ref_milli, st[1] AS final_cusum,
           st[2] AS max_cusum, st[3] AS n_alarm_steps
    FROM folded
    """,
)
def q_cusum_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart per series — the classic
    change-point/drift detector: S_t = max(0, S_{t−1} + (x_t − k)) with
    the per-series integer floor-mean as reference k, alarm while S
    exceeds 200 milli-units. The recursion (another one windows cannot
    express) folds a [S, max_S, alarm_steps] int64 accumulator over the
    sorted series: every operation is integer, so the result is bit-exact
    at any parallelism with NO float anywhere. One shuffle on the series
    key; per-series state never leaves its executor."""
    ev = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000).cast("long")
    series = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            "sum(CAST(floor(value * 1000) AS BIGINT)) DIV count(*)"
        ).alias("k"),
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", v.alias("v")))
        ).alias("series"),
    )
    vals = F.transform(F.col("series"), lambda s: s["v"])
    zero = F.lit(0).cast("long")
    init = F.array(zero, zero, zero)

    def step(acc, x):
        s_new = F.greatest(zero, F.get(acc, 0) + x - F.col("k"))
        return F.array(
            s_new,
            F.greatest(F.get(acc, 1), s_new),
            F.get(acc, 2)
            + F.when(s_new > 200000, F.lit(1).cast("long")).otherwise(zero),
        )

    st = F.aggregate(vals, init, step)
    return series.select(
        "user_id",
        "n_events",
        F.col("k").alias("ref_milli"),
        F.get(st, 0).alias("final_cusum"),
        F.get(st, 1).alias("max_cusum"),
        F.get(st, 2).alias("n_alarm_steps"),
    )


@_q(
    "q_mutual_information",
    """
    WITH cells AS (
      SELECT event_type, dayofweek(ts) AS dow, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, dow, c,
             SUM(c) OVER (PARTITION BY event_type) AS r_tot,
             SUM(c) OVER (PARTITION BY dow) AS c_tot,
             SUM(c) OVER () AS n
      FROM cells
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             list({'k': event_type || '|' || CAST(dow AS VARCHAR),
                   'mi': (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                          * ln(CAST(n AS DOUBLE) * CAST(c AS DOUBLE)
                               / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE)))}
                  ORDER BY event_type, dow) AS cells
      FROM tot
    )
    SELECT n_cells,
           list_reduce(list_prepend(0e0, list_transform(cells, c -> c.mi)),
                       (a, b) -> a + b) AS mi_nats
    FROM folded
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; weekday) in nats — the
    feature-selection / dependence statistic next to q_chi_square, same
    determinism recipe: exact integer contingency cells, per-cell double
    contribution with one declared operand order, summed by a sorted
    fold so the association order is engine-identical. Cell table is
    bounded by the category product — at 100 TB the windows and the fold
    run on ~49 rows."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.dayofweek("ts").alias("dow")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cells.select(
        "event_type",
        "dow",
        "c",
        F.sum("c").over(Window.partitionBy("event_type")).alias("r_tot"),
        F.sum("c").over(Window.partitionBy("dow")).alias("c_tot"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    cd = F.col("c").cast("double")
    nd = F.col("n").cast("double")
    mi = (cd / nd) * F.log(
        nd * cd / (F.col("r_tot").cast("double") * F.col("c_tot").cast("double"))
    )
    folded = tot.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.concat_ws(
                        "|", F.col("event_type"), F.col("dow").cast("string")
                    ).alias("k"),
                    mi.alias("mi"),
                )
            )
        ).alias("cells"),
    )
    return folded.select(
        "n_cells",
        F.aggregate(
            F.transform(F.col("cells"), lambda c: c["mi"]),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# Batch 31 — hopping-window aggregation, Kolmogorov-Smirnov drift test.
# ---------------------------------------------------------------------------


@_q(
    "q_agg_window_hopping",
    f"""
    WITH contrib AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
               - INTERVAL 6 HOUR * CAST(h AS INTEGER)
               + INTERVAL 6 HOUR
               * CAST(CAST(date_part('hour', ts) AS INTEGER) // 6 AS INTEGER)
               AS window_start,
             value
      FROM events, UNNEST(generate_series(0, 3)) AS t(h)
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
           {{MSUM}} AS sum_value
    FROM contrib GROUP BY 1
    """.replace("{MSUM}", _msum("value")),
)
def q_agg_window_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregate — 1-day windows advancing every
    6 hours, so each event lands in 4 overlapping windows. Spark's
    ``window(ts, '1 day', '6 hours')`` expands contributions natively and
    the aggregate stays partial+final on the window-start key; the DuckDB
    twin spells out the same 4-fold expansion with generate_series. The
    ×slide-factor row growth is the inherent semantics of overlap, not an
    engine cost — at 100 TB the shuffle still moves only (window, partial)
    pairs."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "sum_value"
        )
    )


@_q(
    "q_ks_test",
    """
    WITH tagged AS (
      SELECT l_extendedprice AS v,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_b
      FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    per_value AS (
      SELECT v, CAST(SUM(1 - is_b) AS BIGINT) AS ca,
             CAST(SUM(is_b) AS BIGINT) AS cb
      FROM tagged GROUP BY v
    ),
    cum AS (
      SELECT SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
             SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
      FROM per_value
    )
    SELECT CAST(max(abs(cum_a * nb - cum_b * na)) AS BIGINT) AS d_num,
           CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           CAST(max(abs(cum_a * nb - cum_b * na)) AS DOUBLE)
             / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)) AS d_stat
    FROM cum
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (returned-vs-kept price
    distributions) — the distribution-drift gate a data pipeline runs
    between ingestion batches. D = max|CDF_a − CDF_b| evaluated in EXACT
    cross-multiplied integer form |cum_a·n_b − cum_b·n_a| (max ~3.6×10¹¹,
    inside int64) — no per-step float CDFs to drift; the one double
    division happens once on the final maxima. Plan: groupBy distinct
    value (map-side collapse), one cumulative window over the distinct
    values, one max-aggregate. The distinct-value table is bounded by the
    value domain — the same count-based-quantile scale argument."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    tagged = li.select(
        F.col("l_extendedprice").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_b"),
    )
    per_value = tagged.groupBy("v").agg(
        F.sum(1 - F.col("is_b")).alias("ca"),
        F.sum("is_b").alias("cb"),
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per_value.select(
        F.sum("ca").over(wcum).alias("cum_a"),
        F.sum("cb").over(wcum).alias("cum_b"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    d_num = F.max(F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")))
    return cum.agg(
        d_num.alias("d_num"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        (
            d_num.cast("double")
            / (F.max("na").cast("double") * F.max("nb").cast("double"))
        ).alias("d_stat"),
    )


# ---------------------------------------------------------------------------
# Batch 32 — catalog-wide uniqueness audit, partition-layout migration.
# ---------------------------------------------------------------------------


@_q(
    "q_dq_uniqueness",
    """
    WITH per_table AS (
      SELECT 'region' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT r_regionkey) AS BIGINT) AS n_keys FROM region
      UNION ALL
      SELECT 'nation', count(*), count(DISTINCT n_nationkey) FROM nation
      UNION ALL
      SELECT 'customer', count(*), count(DISTINCT c_custkey) FROM customer
      UNION ALL
      SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
      UNION ALL
      SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
      UNION ALL
      SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
      UNION ALL
      SELECT 'lineitem', count(*),
             count(DISTINCT l_orderkey * 16 + l_linenumber) FROM lineitem
      UNION ALL
      SELECT 'events', count(*), count(DISTINCT event_id) FROM events
      UNION ALL
      SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents
      UNION ALL
      SELECT 'embeddings', count(*), count(DISTINCT vec_id) FROM embeddings
    )
    SELECT table_name, n_rows, n_keys,
           n_rows - n_keys AS n_dup_rows,
           (n_rows = n_keys) AS pk_unique
    FROM per_table
    """,
)
def q_dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-wide primary-key uniqueness audit — the DQ sweep a
    warehouse runs nightly over every table's declared key (the
    reference's PK DDL, `data/transformation_db.py:18-85`, enforced
    procedurally). One partial-aggregable count-distinct per table, all
    ten unioned into a single report; each table's check is an
    independent scan stage, so the sweep parallelizes across tables and
    scales per-table like any grouped aggregate. lineitem's composite
    key folds to one integer (orderkey·16 + linenumber, linenumber ≤ 7)
    so the distinct runs on a primitive, not a struct."""
    specs = [
        ("region", F.col("r_regionkey")),
        ("nation", F.col("n_nationkey")),
        ("customer", F.col("c_custkey")),
        ("supplier", F.col("s_suppkey")),
        ("part", F.col("p_partkey")),
        ("orders", F.col("o_orderkey")),
        ("lineitem", F.col("l_orderkey") * 16 + F.col("l_linenumber")),
        ("events", F.col("event_id")),
        ("documents", F.col("doc_id")),
        ("embeddings", F.col("vec_id")),
    ]
    parts = []
    for name, key in specs:
        t = load_table(spark, sf_dir, name)
        parts.append(
            t.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(key).alias("n_keys"),
            )
        )
    report = parts[0]
    for p in parts[1:]:
        report = report.unionByName(p)
    return report.select(
        "table_name",
        "n_rows",
        "n_keys",
        (F.col("n_rows") - F.col("n_keys")).alias("n_dup_rows"),
        (F.col("n_rows") == F.col("n_keys")).alias("pk_unique"),
    )


@_q(
    "q_partition_migration",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           {{MSUM}} AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-01' AND isodow(ts) = 1
    GROUP BY 1
    """.replace("{MSUM}", _msum("value")),
)
def q_partition_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout migration read — the lakehouse reality that a
    table's physical layout changes mid-life: half the history is written
    partitioned by day, the newer half re-partitioned by (day, event_type),
    and ONE logical view unions both generations. Partition pruning still
    applies per generation (PartitionFilters on `day` reach both; the v2
    layout additionally prunes event_type), and the query result is
    layout-independent — proven by the oracle running on the unpartitioned
    original. Mondays-only filter keeps the pruned-read property visible
    in the plan."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    import hashlib

    tag = _fp_tag(sf_dir, "events")
    v1_path = f"{_SCRATCH}/events_v1_{tag}"
    v2_path = f"{_SCRATCH}/events_v2_{tag}"
    import os

    if not (os.path.exists(v1_path) and os.path.exists(v2_path)):
        lo, hi = ev.agg(F.min("day"), F.max("day")).first()
        cut = F.lit(lo) + F.expr(f"INTERVAL {max((hi - lo).days // 2, 1)} DAY")
        ev.filter(F.col("day") < cut).write.mode("overwrite").partitionBy(
            "day"
        ).parquet(v1_path)
        ev.filter(F.col("day") >= cut).write.mode("overwrite").partitionBy(
            "day", "event_type"
        ).parquet(v2_path)
    v1 = spark.read.parquet(v1_path)
    v2 = spark.read.parquet(v2_path)
    unioned = v1.select("day", "event_type", "ts", "value").unionByName(
        v2.select("day", "event_type", "ts", "value")
    )
    return (
        unioned.filter(
            # weekday(): Monday=0 — matches the twin's isodow(ts)=1 (Spark's
            # dayofweek() numbers Sunday=1 vs DuckDB's Sunday=0; weekday/
            # isodow are the unambiguous pair)
            (F.col("day") >= F.lit("2024-01-01").cast("date"))
            & (F.expr("weekday(ts)") == 0)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 33 — rolling exact distinct via daily bitmaps.
# ---------------------------------------------------------------------------


@_q(
    "q_rolling_mau",
    """
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT d.day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
    FROM days d
    JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
    GROUP BY 1
    """,
)
def q_rolling_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day EXACT distinct users per day — the MAU/WAU metric
    whose naive form (re-scan a week of raw events per day, the oracle's
    range join) is O(days × week-of-data). The scalable plan composes the
    bitmap-distinct trick with the rolling window: one pass collapses
    events to per-(day, word) presence bitmaps — the ONLY row-count-scale
    aggregate — then each day ORs the last 7 days' bitmaps (a range join
    on the tiny day × word table, |days|·|users|/32 rows) and popcount-
    sums. Dedup-across-days happens in the bitmap OR, so raw events are
    touched exactly once no matter the window length."""
    ev = load_table(spark, sf_dir, "events")
    words = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            (F.col("user_id") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("day", "word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    days = words.select("day").distinct()
    rolled = (
        days.alias("d")
        .join(
            words.alias("w"),
            (F.col("w.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("w.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("w.word_idx"))
        .agg(F.expr("bit_or(word)").alias("merged"))
    )
    return rolled.groupBy("day").agg(
        F.sum(F.bit_count("merged")).alias("active_users_7d")
    )


# ---------------------------------------------------------------------------
# Batch 34 — attribution, gaps-and-islands, rank statistics, recursion.
# ---------------------------------------------------------------------------


@_q(
    "q_attribution_last_touch",
    f"""
    WITH tagged AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      FROM events
    )
    SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
           {_msum('value')} AS attributed_revenue
    FROM tagged WHERE event_type = 'purchase' AND channel IS NOT NULL
    GROUP BY 1
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution — each purchase credits the most
    recent preceding non-purchase event of the same user. One window
    (IGNORE-NULLS last over an unbounded-preceding ROWS frame) on the
    user_id exchange tags every purchase with its channel, then a grouped
    exact-decimal revenue rollup. Total order (ts, event_id) makes the
    frame deterministic under ties; the whole plan is one shuffle on
    user_id plus one ~4-row aggregate — no self-join against the event
    history (the naive per-purchase lookback at 100 TB)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.withColumn(
        "channel",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        tagged.filter(
            (F.col("event_type") == "purchase") & F.col("channel").isNotNull()
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            money_sum(F.col("value")).alias("attributed_revenue"),
        )
    )


@_q(
    "q_streak_longest",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS island
      FROM days
    ),
    s AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id, CAST(max(streak) AS BIGINT) AS longest_streak,
           CAST(sum(streak) AS BIGINT) AS n_active_days
    FROM s GROUP BY 1
    """,
)
def q_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands rewrite: distinct (user, day), then `day − row_number`
    is constant exactly within a consecutive run, so streaks fall out of a
    grouped count with NO self-join and NO iteration. Plan: one exchange
    on user_id reused by the distinct, the window, and both aggregates
    (Catalyst collapses the chain); at 100 TB the state is bounded by
    distinct (user, day), not raw events."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    isl = days.withColumn("island", F.date_sub(F.col("day"), rn))
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak").alias("longest_streak"),
        F.sum("streak").alias("n_active_days"),
    )


@_q(
    "q_weighted_median",
    """
    WITH vw AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, price_c, w,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c)
                  AS BIGINT) AS cw,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
      FROM vw
    )
    SELECT l_returnflag, CAST(min(tw) AS BIGINT) AS total_weight,
           CAST(min(price_c) AS DOUBLE) / 100 AS weighted_median_price
    FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower) of extended price weighted by quantity —
    the count-based quantile plan extended to weights: collapse to
    distinct cent-values with exact integer weight sums (the only
    row-count-scale aggregate), then a running weight sum over the
    distinct-value table picks the first value where 2·cum ≥ total.
    No per-group row buffering (the sort-based percentile aggregate's
    scale hazard) — state is bounded by distinct values, and every
    comparison is int64-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    vw = (
        li.select(
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_returnflag", "price_c")
        .agg(F.sum("q").alias("w"))
    )
    wv = Window.partitionBy("l_returnflag").orderBy("price_c")
    wt = Window.partitionBy("l_returnflag")
    c = vw.select(
        "l_returnflag",
        "price_c",
        F.sum("w").over(wv).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("tw").alias("total_weight"),
            (F.min("price_c").cast("double") / 100).alias("weighted_median_price"),
        )
    )


@_q(
    "q_spearman_rho",
    f"""
    WITH r AS (
      SELECT l_returnflag,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                                RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
               - 1 AS rx2,
             2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                                RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
               - 1 AS ry2
      FROM lineitem
    ),
    sc AS (SELECT l_returnflag, rx2 * 1e-7 AS x, ry2 * 1e-7 AS y FROM r),
    s AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             {_msum6('x')} AS sx, {_msum6('y')} AS sy,
             {_msum6('x*x')} AS sxx, {_msum6('x*y')} AS sxy,
             {_msum6('y*y')} AS syy
      FROM sc GROUP BY 1
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE)*sxy - sx*sy)
             / sqrt((CAST(n AS DOUBLE)*sxx - sx*sx)
                    * (CAST(n AS DOUBLE)*syy - sy*sy)) AS spearman_rho
    FROM s
    """,
)
def q_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (average-tie convention) — Pearson on
    ranks, kept cross-engine exact by integerizing the tie-averaged rank:
    2·avg_rank = 2·rank() + |peers| − 1 is always an integer, and |peers|
    comes from a RANGE CURRENT ROW frame that reuses the rank's own sort
    (one l_returnflag exchange, two sorts — NOT a second shuffle on the
    value column). Doubled ranks then run the q_corr_exact recipe:
    pre-scale ×1e-7 so decimal(38,6) moments stay below 2^53, exact
    moment accumulation, one identically-written IEEE combination.
    Spearman is shift/scale-invariant, so doubling leaves rho unchanged."""
    li = load_table(spark, sf_dir, "lineitem")

    def rank2(order_col: str) -> F.Column:
        ws = Window.partitionBy("l_returnflag").orderBy(order_col)
        peers = ws.rangeBetween(Window.currentRow, Window.currentRow)
        return (
            2 * F.rank().over(ws) + F.count(F.lit(1)).over(peers) - 1
        )

    r = li.select(
        "l_returnflag",
        (rank2("l_quantity") * F.lit(1e-7)).alias("x"),
        (rank2("l_extendedprice") * F.lit(1e-7)).alias("y"),
    )
    s = r.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        exact_sum(F.col("x"), 6).alias("sx"),
        exact_sum(F.col("y"), 6).alias("sy"),
        exact_sum(F.col("x") * F.col("x"), 6).alias("sxx"),
        exact_sum(F.col("x") * F.col("y"), 6).alias("sxy"),
        exact_sum(F.col("y") * F.col("y"), 6).alias("syy"),
    )
    nd = F.col("n").cast("double")
    rho = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("l_returnflag", "n", rho.alias("spearman_rho"))


@_q(
    "q_mann_whitney_u",
    """
    WITH pts AS (
      SELECT isodow(ts) AS weekday, event_type AS g,
             CAST(floor(value * 1000) AS BIGINT) AS v
      FROM events WHERE event_type IN ('click', 'view')
    ),
    r AS (
      SELECT weekday, g,
             2 * rank() OVER (PARTITION BY weekday ORDER BY v)
               + count(*) OVER (PARTITION BY weekday ORDER BY v
                                RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
               - 1 AS r2
      FROM pts
    ),
    s AS (
      SELECT weekday,
             CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN g = 'click' THEN r2 ELSE 0 END) AS BIGINT)
               AS rsum1_x2
      FROM r GROUP BY 1
    )
    SELECT CAST(weekday AS BIGINT) AS weekday, n1, n2,
           CAST(rsum1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(2 * n1 * n2 - (rsum1_x2 - n1 * (n1 + 1)) AS BIGINT) AS u2_x2
    FROM s
    """,
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (click vs view engagement value, per
    ISO weekday) — the non-parametric A/B companion to q_ab_welch_ttest.
    Fully integer-exact: milli-unit quantization, the doubled
    tie-averaged rank (2·rank() + |peers| − 1, peers from a RANGE frame
    on the SAME sort), and U reported in doubled units (u1_x2/u2_x2) so
    tie-induced half-steps never touch IEEE floats. Identity check
    u1+u2 = n1·n2 holds by construction. One weekday exchange, one sort,
    one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.filter(F.col("event_type").isin("click", "view")).select(
        (F.expr("weekday(ts)") + 1).cast("long").alias("weekday"),
        F.col("event_type").alias("g"),
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
    )
    ws = Window.partitionBy("weekday").orderBy("v")
    peers = ws.rangeBetween(Window.currentRow, Window.currentRow)
    r = pts.select(
        "weekday",
        "g",
        (2 * F.rank().over(ws) + F.count(F.lit(1)).over(peers) - 1).alias("r2"),
    )
    s = r.groupBy("weekday").agg(
        F.sum(F.when(F.col("g") == "click", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("g") == "view", 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("g") == "click", F.col("r2")).otherwise(0)).alias(
            "rsum1_x2"
        ),
    )
    u1 = F.col("rsum1_x2") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        "weekday",
        "n1",
        "n2",
        u1.alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2") - u1).alias("u2_x2"),
    )


@_q(
    "q_tree_reachability",
    """
    WITH RECURSIVE chain(origin, node, depth) AS (
      SELECT DISTINCT user_id, user_id, 0 FROM events
      UNION ALL
      SELECT origin, node // 2, depth + 1 FROM chain WHERE node > 1
    ),
    d AS (SELECT origin, max(depth) AS depth FROM chain GROUP BY 1)
    SELECT CAST(depth AS INTEGER) AS depth_to_root,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(origin) AS BIGINT) AS min_user,
           CAST(max(origin) AS BIGINT) AS max_user
    FROM d GROUP BY 1
    """,
)
def q_tree_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE graph reachability (Spark 4 WITH RECURSIVE) — each
    user walks the implicit binary-tree ancestry edge u → u div 2 to the
    root, and the result histograms depth-to-root. Exercises Spark's
    iterative-union recursion: each step is a narrow map over the
    frontier (no shuffle inside the loop), depth is bounded by
    log2(max id) ≈ 17 ≪ the 100-level recursion guard, and the frontier
    SHRINKS monotonically — the shape that survives a 1000-executor
    scale-up, unlike driver-side iteration. Registered views let the
    identical SQL skeleton run on both engines."""
    from etl_pipeline_project_spark.sources.catalog import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE chain(origin, node, depth) AS (
          SELECT DISTINCT user_id, user_id, 0 FROM events
          UNION ALL
          SELECT origin, node div 2, depth + 1 FROM chain WHERE node > 1
        ),
        d AS (SELECT origin, max(depth) AS depth FROM chain GROUP BY origin)
        SELECT CAST(depth AS INT) AS depth_to_root,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(min(origin) AS BIGINT) AS min_user,
               CAST(max(origin) AS BIGINT) AS max_user
        FROM d GROUP BY depth
        """
    )


# ---------------------------------------------------------------------------
# Batch 35 — LLM-pipeline deepening: boilerplate strip, per-doc keywords,
# quantile normalization, vector normalization, split-leakage audit.
# ---------------------------------------------------------------------------


@_q(
    "q_boilerplate_strip",
    """
    WITH tot AS (SELECT count(*) AS n_docs FROM documents),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    df AS (SELECT word, count(DISTINCT doc_id) AS d FROM toks GROUP BY 1),
    boiler AS (
      SELECT coalesce(list(word), []) AS bl
      FROM df, tot WHERE d * 5 >= n_docs * 4
    )
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(text, ' '), w -> NOT list_contains(b.bl, w)),
             ' ') AS text_clean,
           CAST(len(string_split(text, ' '))
                - len(list_filter(string_split(text, ' '),
                                  w -> NOT list_contains(b.bl, w)))
                AS BIGINT) AS n_removed
    FROM documents, boiler b
    """,
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate removal — drop every word whose document
    frequency is ≥ 80% of the corpus (navigation chrome / license
    headers / template text in a real crawl), preserving the order of
    the surviving words. The boilerplate vocabulary is two aggregates
    over the token stream and is tiny by construction (bounded by the
    words that fit in 80% of documents), so it BROADCASTS into a
    map-side anti join against the posexploded stream; reassembly is
    one groupBy(doc_id) with an array_sort(collect_list(struct(pos,
    word))) — position-exact, no driver round-trip, one shuffle on
    doc_id for the 100 TB side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = (
        toks.select("doc_id", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    boiler = (
        df.crossJoin(F.broadcast(n_docs))
        .filter(F.col("d") * 5 >= F.col("n_docs") * 4)
        .select("word")
    )
    kept = toks.join(F.broadcast(boiler), "word", "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x.word,
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return base.join(clean, "doc_id", "left").select(
        "doc_id",
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


@_q(
    "q_doc_keywords",
    """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df_docs,
             CAST(tf.tf * 1000000 // df.df_docs AS BIGINT) AS score_ppm
      FROM tf JOIN df USING (term)
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_ppm DESC, term ASC) AS rk
      FROM scored
    )
    SELECT doc_id, term, tf, df_docs, score_ppm, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction — top-3 terms by document-
    frequency-penalized term frequency (tf/df, the monotone core of
    TF-IDF). The score is exact integer arithmetic (tf·10⁶ div df) so
    ranking is bit-identical across engines — no transcendental log in
    the ORDER BY key, which would expose 1-ULP engine drift exactly
    where ties decide output membership. df is a term-level aggregate
    (vocabulary-sized → broadcast join back onto tf); top-3 is a
    row_number window that AQE executes as WindowGroupLimit — no
    full per-doc sort materialization."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df_docs",
        F.expr("(tf * 1000000) div df_docs").alias("score_ppm"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df_docs", "score_ppm", "rk")
    )


@_q(
    "q_quantile_normalize",
    """
    WITH pts AS (
      SELECT event_id, event_type,
             CAST(floor(value * 1000) AS BIGINT) AS v
      FROM events
    ),
    r AS (
      SELECT event_id, event_type,
             2 * rank() OVER (PARTITION BY event_type ORDER BY v)
               + count(*) OVER (PARTITION BY event_type ORDER BY v
                                RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
               - 1 AS r2,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM pts
    )
    SELECT event_id, event_type,
           CAST((r2 - 1) * 500000 // n AS BIGINT) AS q_ppm
    FROM r
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization — replace each reading by its within-group
    mid-rank quantile (the rank-to-uniform transform used to align
    feature distributions before training). Same doubled tie-averaged
    rank as q_spearman_rho; the quantile (avg_rank − ½)/n is emitted in
    exact integer ppm ((r2−1)·5·10⁵ div n), so the output is engine- and
    partitioning-independent. One event_type exchange carries the rank
    sort, the peer RANGE frame, and the group count — three windows,
    one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
    )
    ws = Window.partitionBy("event_type").orderBy("v")
    peers = ws.rangeBetween(Window.currentRow, Window.currentRow)
    wp = Window.partitionBy("event_type")
    r = pts.select(
        "event_id",
        "event_type",
        (2 * F.rank().over(ws) + F.count(F.lit(1)).over(peers) - 1).alias("r2"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return r.select(
        "event_id",
        "event_type",
        F.expr("((r2 - 1) * 500000) div n").alias("q_ppm"),
    )


@_q(
    "q_vector_normalize",
    """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_transform(v, x -> x * x),
                              (a, b) -> a + b)) AS l2_norm
      FROM e
    )
    SELECT vec_id, CAST(len(v) AS INTEGER) AS dim, l2_norm,
           v[1] / l2_norm AS u_first,
           list_min(v) / l2_norm AS u_min,
           list_max(v) / l2_norm AS u_max
    FROM n WHERE l2_norm > 0
    """,
)
def q_vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 vector normalization — the preprocessing step in front of every
    cosine-similarity ANN index. Map-only Catalyst higher-order
    functions (transform/aggregate), zero shuffles, zero Python; the
    sum-of-squares fold runs in one declared left-to-right association
    order so the JVM and DuckDB produce bit-identical norms. The
    contract projects scalar probes (first/min/max components) rather
    than the raw array — driver row-hashers reject array cells
    (VERDICT r1 §what's-wrong 3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = emb.select("vec_id", v.alias("v"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    n = e.select("vec_id", "v", norm.alias("l2_norm"))
    return n.filter(F.col("l2_norm") > 0).select(
        "vec_id",
        F.size("v").alias("dim"),
        "l2_norm",
        (F.element_at("v", 1) / F.col("l2_norm")).alias("u_first"),
        (F.array_min("v") / F.col("l2_norm")).alias("u_min"),
        (F.array_max("v") / F.col("l2_norm")).alias("u_max"),
    )


@_q(
    "q_split_leakage",
    f"""
    WITH sp AS (
      SELECT doc_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             1.0 - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(GREATEST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1) AS DOUBLE)
               AS jd
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    ),
    leak AS (
      SELECT LEAST(sa.split, sb.split) AS split_lo,
             GREATEST(sa.split, sb.split) AS split_hi
      FROM p
      JOIN sp sa ON p.id_a = sa.doc_id
      JOIN sp sb ON p.id_b = sb.doc_id
      WHERE p.jd < 0.4 AND sa.split <> sb.split
    )
    SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_leak_pairs
    FROM leak GROUP BY 1, 2
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split-leakage audit — near-duplicate pairs (MinHash-LSH
    banded candidates, exactly verified, distance < 0.4) that STRADDLE
    the deterministic hash split: the eval-hygiene check every training
    pipeline needs before publishing benchmark numbers. Composition of
    two existing scale paths: bucketed LSH (never all-pairs) plus the
    content-stable md5 split; split labels broadcast onto the pair
    stream. Oracle runs the exact all-pairs twin — recall at distance
    < 0.4 with r=2/b=32 banding is 1−1.6e-6 (q_dedup_minhash_lsh)."""
    from etl_pipeline_project_spark.operators.dedup_text import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_distance_threshold=0.4
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    sp = docs.select(
        "doc_id",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    leak = (
        pairs.join(
            F.broadcast(sp.withColumnRenamed("split", "split_a")),
            pairs.id_a == sp.doc_id,
        )
        .drop("doc_id")
        .join(
            F.broadcast(sp.withColumnRenamed("split", "split_b")),
            pairs.id_b == F.col("doc_id"),
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return leak.groupBy(
        F.least("split_a", "split_b").alias("split_lo"),
        F.greatest("split_a", "split_b").alias("split_hi"),
    ).agg(F.count(F.lit(1)).alias("n_leak_pairs"))


# ---------------------------------------------------------------------------
# Batch 36 — lakehouse tier: stats-driven file skipping, manifest time
# travel, compaction planning, pure-theta broadcast join.
# ---------------------------------------------------------------------------


@_q(
    "q_file_stats_pruning",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           {_msum('value')} AS sum_value
    FROM events WHERE ts >= TIMESTAMP '2024-01-23 00:00:00'
    GROUP BY 1
    """,
)
def q_file_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-driven data skipping — the min/max zone-map mechanic behind
    Delta/Iceberg file pruning, built from parts: (1) events land as
    range-partitioned, ts-sorted files (the clustered layout that makes
    zone maps tight); (2) a per-file stats table (min/max ts, row count)
    comes from one grouped scan over `_metadata.file_path`; (3) the
    predicate consults ONLY the stats table to choose files — a
    planner-side decision over a files-count-sized table, exactly where
    real table formats do it — and the data scan opens just the
    surviving files before applying the residual filter. At 100 TB the
    stats table is ~1 row per file; the pruned scan reads the last week,
    not the whole history. Oracle proves layout-independence by running
    the plain filter on the original table."""
    import hashlib
    import os

    ev = load_table(spark, sf_dir, "events")
    tag = _fp_tag(sf_dir, "events")
    path = f"{_SCRATCH}/events_clustered_{tag}"
    if not os.path.exists(path):
        ev.repartitionByRange(8, "ts").sortWithinPartitions("ts").write.mode(
            "overwrite"
        ).parquet(path)
    back = spark.read.parquet(path)
    stats = back.groupBy(F.col("_metadata.file_path").alias("file")).agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    cutoff = "2024-01-23 00:00:00"
    # planner-side manifest consultation: the stats table is O(n_files)
    chosen = [
        r["file"]
        for r in stats.filter(
            F.col("max_ts") >= F.lit(cutoff).cast("timestamp")
        ).collect()
    ]
    pruned = spark.read.parquet(*chosen)
    return (
        pruned.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("sum_value"),
        )
    )


@_q(
    "q_snapshot_time_travel",
    f"""
    WITH v1 AS (
      SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT 'v1' AS version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey % 1000003) AS BIGINT) AS key_sig,
           {_msum('o_totalprice')} AS sum_total
    FROM v1
    UNION ALL
    SELECT 'v2' AS version, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey % 1000003) AS BIGINT) AS key_sig,
           {_msum('o_totalprice')} AS sum_total
    FROM orders
    """,
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-based snapshot time travel — the poor-man's Delta/Iceberg
    log: version 1 lands as files, version 2 APPENDS new files (old data
    is never rewritten), and a manifest table records which files belong
    to which snapshot. Reading "as of v1" opens only v1's files; "as of
    v2" opens both generations. The manifest is planner-sized (rows =
    files); appends are O(new data); both snapshot reads are
    content-addressed with zero copies — the structure that makes
    time travel free at 100 TB. Both snapshots are summarized with an
    order-insensitive signature, twinned against the logical snapshot
    definitions."""
    import hashlib
    import json
    import os

    orders = load_table(spark, sf_dir, "orders")
    tag = _fp_tag(sf_dir, "orders")
    base = f"{_SCRATCH}/orders_versions_{tag}"
    manifest_path = f"{base}/manifest.json"
    cut = F.lit("1998-01-01").cast("timestamp")
    if not os.path.exists(manifest_path):
        orders.filter(F.col("o_orderdate") < cut).write.mode("overwrite").parquet(
            f"{base}/gen1"
        )
        orders.filter(F.col("o_orderdate") >= cut).write.mode("overwrite").parquet(
            f"{base}/gen2"
        )
        manifest = {"v1": [f"{base}/gen1"], "v2": [f"{base}/gen1", f"{base}/gen2"]}
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)
    with open(manifest_path) as fh:
        manifest = json.load(fh)

    def snapshot(version: str) -> DataFrame:
        df = spark.read.parquet(*manifest[version])
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_orderkey") % 1000003).alias("key_sig"),
            money_sum(F.col("o_totalprice")).alias("sum_total"),
        ).select(F.lit(version).alias("version"), "*")

    return snapshot("v1").unionByName(snapshot("v2"))


@_q(
    "q_compaction_plan",
    """
    WITH per_file AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1
    ),
    c AS (
      SELECT day, n_rows,
             CAST(coalesce(SUM(n_rows) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM per_file
    )
    SELECT CAST(cum_before // 1000 AS BIGINT) AS group_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows
    FROM c GROUP BY 1
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNING — bin-pack the per-file row counts
    of a day-partitioned layout into ~1000-row target groups (cumulative
    count div target), the maintenance query every lakehouse table
    service runs before rewriting. File inventory comes from one grouped
    scan over `_metadata.file_path` (the day-partitioned scratch layout
    guarantees file ↔ day equivalence, which is what lets the oracle
    reason per-day); the plan itself is a window over an
    O(n_files)-sized table — planner-scale regardless of data volume.
    Complements q_compact_files, which EXECUTES a compaction."""
    import hashlib
    import os

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    tag = _fp_tag(sf_dir, "events")
    path = f"{_SCRATCH}/events_daily_{tag}"
    if not os.path.exists(path):
        ev.repartition(F.col("day")).write.mode("overwrite").partitionBy(
            "day"
        ).parquet(path)
    back = spark.read.parquet(path)
    per_file = back.groupBy(
        F.col("_metadata.file_path").alias("file"), F.col("day")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = per_file.select(
        "day",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        c.select(F.expr("cum_before div 1000").alias("group_id"), "n_rows")
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


@_q(
    "q_join_theta_bnl",
    f"""
    WITH bands AS (
      SELECT r_name, r_regionkey * 100000.0 AS lo,
             (r_regionkey + 1) * 100000.0 AS hi
      FROM region
    )
    SELECT r_name AS price_band, CAST(count(*) AS BIGINT) AS n_orders,
           {_msum('o_totalprice')} AS sum_total
    FROM orders JOIN bands
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY 1
    """,
)
def q_join_theta_bnl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join — NO equi-key at all, only interval containment
    against a 5-row band table. Catalyst's only correct strategy here is
    BroadcastNestedLoopJoin, and that is exactly the right 100 TB plan:
    the band side is O(bands) and broadcasts, the fact side streams
    map-side with zero shuffle, and each row tests 5 predicates. The
    trap this key guards against is a shuffle-based fallback (cartesian
    with post-filter); the plan audit asserts BNLJ + broadcast. Distinct
    from q_join_range, whose equi component admits a hash join."""
    orders = load_table(spark, sf_dir, "orders")
    region = load_table(spark, sf_dir, "region")
    bands = region.select(
        F.col("r_name").alias("price_band"),
        (F.col("r_regionkey") * 100000.0).alias("lo"),
        ((F.col("r_regionkey") + 1) * 100000.0).alias("hi"),
    )
    joined = orders.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo"))
        & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("price_band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("sum_total"),
    )


# ---------------------------------------------------------------------------
# Batch 37 — SAX symbolization, conversion-lag cohorts, FIFO costing.
# ---------------------------------------------------------------------------


@_q(
    "q_sax_symbolize",
    """
    WITH r AS (
      SELECT user_id, ts, event_id,
             ntile(4) OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(value * 1000) AS BIGINT),
                                     event_id) AS nt
      FROM events
    )
    SELECT user_id,
           string_agg(substr('abcd', nt, 1), '' ORDER BY ts, event_id) AS sax,
           CAST(count(*) AS BIGINT) AS n_points
    FROM r GROUP BY 1
    """,
)
def q_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization — each user's reading stream becomes a string
    over {a,b,c,d} by per-series quartile discretization (rank-based, so
    no mean/σ floats cross engines), emitted in TIME order while the
    quartile assignment is in VALUE order. ntile runs on the value sort,
    the ordered reassembly is the sorted-fold idiom
    (array_sort(collect_list(struct)) → transform → concat_ws) — both on
    ONE user_id exchange. The discretize-to-symbols step is what makes
    motif mining / anomaly grammars tractable on 100 TB of raw series:
    downstream operators see short strings, not doubles. Total order
    (value_milli, event_id) makes ntile deterministic under ties."""
    ev = load_table(spark, sf_dir, "events")
    ws = Window.partitionBy("user_id").orderBy(
        F.floor(F.col("value") * 1000).cast("long"), "event_id"
    )
    r = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.ntile(4).over(ws).alias("nt"),
    ).withColumn("letter", F.expr("substring('abcd', nt, 1)"))
    return r.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "letter"))),
                lambda x: x.letter,
            ),
        ).alias("sax"),
        F.count(F.lit(1)).alias("n_points"),
    )


@_q(
    "q_time_to_convert",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT CAST(s_ts AS DATE) AS cohort_day,
             CAST(floor(epoch(p_ts)) AS BIGINT)
               - CAST(floor(epoch(s_ts)) AS BIGINT) AS delta_sec
      FROM firsts WHERE s_ts IS NOT NULL AND p_ts IS NOT NULL AND p_ts >= s_ts
    ),
    stats AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_converted,
             CAST(SUM(delta_sec) AS BIGINT) AS sum_delta
      FROM conv GROUP BY 1
    ),
    vw AS (
      SELECT cohort_day, delta_sec, CAST(count(*) AS BIGINT) AS c
      FROM conv GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_day, delta_sec,
             CAST(SUM(c) OVER (PARTITION BY cohort_day ORDER BY delta_sec)
                  AS BIGINT) AS cw,
             CAST(SUM(c) OVER (PARTITION BY cohort_day) AS BIGINT) AS tw
      FROM vw
    ),
    med AS (
      SELECT cohort_day, CAST(min(delta_sec) AS BIGINT) AS p50_delta_sec
      FROM cum WHERE 2 * cw >= tw GROUP BY 1
    )
    SELECT s.cohort_day, s.n_converted,
           CAST(s.sum_delta AS DOUBLE) / s.n_converted AS mean_delta_sec,
           m.p50_delta_sec
    FROM stats s JOIN med m USING (cohort_day)
    """,
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion lag by signup-day cohort — first-touch
    funnel timing. One conditional-min aggregate per user finds both
    firsts in a single events pass (no signup⋈purchase self-join);
    deltas are integer seconds (floored epochs — engine-exact); the
    cohort median uses the count-based distinct-value cumulative plan
    (no per-cohort sort buffering) and the mean divides two exact
    integers in one final double op."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p_ts"),
    )
    conv = firsts.filter(
        F.col("s_ts").isNotNull()
        & F.col("p_ts").isNotNull()
        & (F.col("p_ts") >= F.col("s_ts"))
    ).select(
        F.col("s_ts").cast("date").alias("cohort_day"),
        (
            F.unix_timestamp("p_ts") - F.unix_timestamp("s_ts")
        ).alias("delta_sec"),
    )
    stats = conv.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.sum("delta_sec").alias("sum_delta"),
    )
    vw = conv.groupBy("cohort_day", "delta_sec").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("cohort_day").orderBy("delta_sec")
    wt = Window.partitionBy("cohort_day")
    cum = vw.select(
        "cohort_day",
        "delta_sec",
        F.sum("c").over(wv).alias("cw"),
        F.sum("c").over(wt).alias("tw"),
    )
    med = (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("cohort_day")
        .agg(F.min("delta_sec").alias("p50_delta_sec"))
    )
    return stats.join(med, "cohort_day").select(
        "cohort_day",
        "n_converted",
        (F.col("sum_delta").cast("double") / F.col("n_converted")).alias(
            "mean_delta_sec"
        ),
        "p50_delta_sec",
    )


@_q(
    "q_inventory_fifo",
    """
    WITH lots AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS lot_qty,
             min(l_shipdate) AS lot_date,
             CAST(floor(min(l_extendedprice / l_quantity) * 100) AS BIGINT)
               AS unit_cents
      FROM lineitem GROUP BY 1, 2
    ),
    lot_c AS (
      SELECT pk, sk, lot_qty, unit_cents,
             CAST(SUM(lot_qty) OVER (PARTITION BY pk ORDER BY lot_date, sk)
                  AS BIGINT) AS l_end
      FROM lots
    ),
    lot_iv AS (SELECT pk, sk, unit_cents, l_end - lot_qty AS l_start, l_end
               FROM lot_c),
    dem AS (
      SELECT l_partkey AS pk,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(SUM(CAST(l_quantity AS BIGINT))
                  OVER (PARTITION BY l_partkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_suppkey)
                  AS BIGINT) AS d_end
      FROM lineitem
    ),
    dem_iv AS (SELECT pk, d_end - q AS d_start, d_end FROM dem),
    alloc AS (
      SELECT l.pk, l.sk, l.unit_cents,
             LEAST(l.l_end, d.d_end) - GREATEST(l.l_start, d.d_start) AS a
      FROM lot_iv l JOIN dem_iv d
        ON l.pk = d.pk AND l.l_start < d.d_end AND d.d_start < l.l_end
    )
    SELECT sk AS s_suppkey,
           CAST(SUM(a) AS BIGINT) AS allocated_qty,
           CAST(SUM(a * unit_cents) AS BIGINT) AS fifo_cost_cents
    FROM alloc GROUP BY 1
    """,
)
def q_inventory_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO inventory costing — the interval-algebra rewrite of the
    classic \"consume lots in order\" loop: supplier lots and the demand
    stream each become cumulative-quantity intervals per part (one
    window each on the SAME l_partkey exchange), and a FIFO allocation
    is exactly the pairwise overlap of the two interval sets — an
    equi-join on part plus an interval predicate, the range-join shape,
    never a sequential scan. Quantities are integer-exact throughout;
    costs are cents. Each demand overlaps O(1) lots, so output is
    ~|lineitem| before the supplier rollup regardless of scale."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    lots = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.sum(q).alias("lot_qty"),
        F.min("l_shipdate").alias("lot_date"),
        F.floor(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")) * 100
        ).cast("long").alias("unit_cents"),
    )
    wl = Window.partitionBy("pk").orderBy("lot_date", "sk")
    lot_iv = lots.select(
        "pk",
        "sk",
        "unit_cents",
        (F.sum("lot_qty").over(wl) - F.col("lot_qty")).alias("l_start"),
        F.sum("lot_qty").over(wl).alias("l_end"),
    )
    wd = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "l_suppkey"
    )
    dem_iv = li.select(
        F.col("l_partkey").alias("pk"),
        (F.sum(q).over(wd) - q).alias("d_start"),
        F.sum(q).over(wd).alias("d_end"),
    )
    alloc = lot_iv.join(
        dem_iv,
        (lot_iv.pk == dem_iv.pk)
        & (lot_iv.l_start < dem_iv.d_end)
        & (dem_iv.d_start < lot_iv.l_end),
    ).select(
        "sk",
        "unit_cents",
        (
            F.least(F.col("l_end"), F.col("d_end"))
            - F.greatest(F.col("l_start"), F.col("d_start"))
        ).alias("a"),
    )
    return alloc.groupBy(F.col("sk").alias("s_suppkey")).agg(
        F.sum("a").alias("allocated_qty"),
        F.sum(F.col("a") * F.col("unit_cents")).alias("fifo_cost_cents"),
    )


# ---------------------------------------------------------------------------
# Batch 38 — modern SQL/engine surface: VARIANT, LATERAL, correlated
# scalar subqueries, error-safe arithmetic, join hints, observed metrics.
# ---------------------------------------------------------------------------


@_q(
    "q_variant_json",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY 1
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type —
    parse_json builds the typed binary variant once, variant_get
    extracts a path with a target type, and the whole pipeline stays in
    Catalyst (no per-row Python, no string re-parsing per access —
    the shredded-encoding advantage over get_json_object at 100 TB,
    where a document parsed once serves many extractions). Complements
    q_json_extract (string-path API) and q_map_ops (typed map)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@_q(
    "q_lateral_topk",
    """
    SELECT n.n_name, l.c_name, l.c_acctbal
    FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) l
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT —
    the SQL-standard spelling of top-k-per-group. Catalyst decorrelates
    it into the same window/rank plan as q_window_rank (one shuffle on
    the correlation key, per-group limit pushed below the sort) — the
    point of the key is that the DECLARATIVE form arrives at the scale
    plan, not a per-nation re-scan loop. Deterministic tie-break
    (acctbal DESC, name)."""
    from etl_pipeline_project_spark.sources.catalog import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.c_acctbal
        FROM nation n,
             LATERAL (SELECT c_name, c_acctbal FROM customer c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name LIMIT 2) l
        """
    )


@_q(
    "q_scalar_subquery_corr",
    f"""
    WITH flagged AS (
      SELECT o_custkey, o_totalprice,
             (SELECT {_msum('o2.o_totalprice')} / count(*)
              FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
      FROM orders o
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_above_avg
    FROM flagged WHERE o_totalprice > cust_avg
    GROUP BY 1
    """,
)
def q_scalar_subquery_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — each order compared against ITS
    customer's average order value. Catalyst decorrelates the subquery
    into one aggregate-then-join on o_custkey (visible in the plan as a
    single exchange + join, not an O(orders × customers) re-execution),
    which is the only survivable shape at scale. The per-customer
    average uses the exact-decimal money sum on both engines so the
    strict `>` comparison can't flip on 1-ULP drift."""
    from etl_pipeline_project_spark.sources.catalog import register_testdata_views

    register_testdata_views(spark, sf_dir)
    # identical exact-decimal average spelling, Spark dialect
    return spark.sql(
        """
        WITH flagged AS (
          SELECT o_custkey, o_totalprice,
                 (SELECT CAST(CAST(ROUND(SUM(CAST(o2.o_totalprice AS DECIMAL(38,10))), 2)
                              AS DECIMAL(38,2)) AS DOUBLE) / count(*)
                  FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS cust_avg
          FROM orders o
        )
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_above_avg
        FROM flagged WHERE o_totalprice > cust_avg
        GROUP BY o_custkey
        """
    )


@_q(
    "q_try_arith",
    """
    WITH t AS (
      SELECT event_type,
             CASE WHEN user_id % 3 = 0 THEN NULL
                  ELSE value / CAST(user_id % 3 AS DOUBLE) END AS ratio,
             CASE WHEN event_id >= 2 THEN NULL
                  ELSE event_id * 4611686018427387904 END AS big
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN ratio IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           CAST(SUM(CASE WHEN big IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overflow,
           CAST(SUM(CAST(ROUND(CAST(ratio AS DECIMAL(38,10)), 4)
                    AS DECIMAL(38,4))) AS DOUBLE) AS sum_ratio
    FROM t GROUP BY 1
    """,
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode — try_divide returns NULL on
    a zero divisor instead of raising, try_multiply returns NULL on
    int64 overflow (event_id·2^62 overflows for every event_id ≥ 2).
    The operational point: a 100 TB batch job must degrade poisoned rows
    to NULLs it can count (the n_div_null / n_overflow audit columns),
    not die at task 9,997 of 10,000. The DuckDB twin spells the same
    semantics with guards, proving the NULL contract is
    engine-portable."""
    ev = load_table(spark, sf_dir, "events")
    ratio = F.expr("try_divide(value, CAST(user_id % 3 AS DOUBLE))")
    big = F.expr("try_multiply(event_id, 4611686018427387904L)")
    t = ev.select("event_type", ratio.alias("ratio"), big.alias("big"))
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ratio").isNull(), 1).otherwise(0)).alias("n_div_null"),
        F.sum(F.when(F.col("big").isNull(), 1).otherwise(0)).alias("n_overflow"),
        F.sum(
            F.round(F.col("ratio").cast("decimal(38,10)"), 4).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("sum_ratio"),
    )


@_q(
    "q_hint_suite",
    f"""
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
           {_msum('c_acctbal')} AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q_hint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hints — the escape hatch when statistics mislead the
    optimizer at 100 TB (a "small" side that isn't, a broadcast that
    OOMs the executors). This key forces the nation side through a
    SHUFFLE_MERGE hint (overriding the default broadcast choice for a
    25-row dim) purely to prove the control surface works; the plan
    test asserts SortMergeJoin appears under the hint and the result is
    bit-identical to the unhinted plan. Production guidance stays
    \"let Catalyst choose\" — hints are for the documented exceptions."""
    from etl_pipeline_project_spark.sources.catalog import register_testdata_views

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ SHUFFLE_MERGE(nation) */ n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,10))), 2)
                    AS DECIMAL(38,2)) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


@_q(
    "q_observe_metrics",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases,
           {_msum('value')} AS sum_value
    FROM events
    """,
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via df.observe() — named accumulator-style
    metrics collected AS A SIDE EFFECT of the pass the job already runs
    (zero extra scans: at 100 TB a separate audit query doubles cost;
    observe rides the existing one). The metrics land on the driver as
    one tiny row, re-emitted here as the contract DataFrame and twinned
    against a plain aggregate to prove observed == computed."""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("audit")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        money_sum(F.col("value")).alias("sum_value"),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_purchases"], m["sum_value"])],
        "n_rows long, n_purchases long, sum_value double",
    )


# ---------------------------------------------------------------------------
# Batch 39 — streaming hopping windows + deterministic sketch tier
# (count-min, Bloom) built as exact SQL constructions.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_hopping",
    """
    WITH contrib AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
               - INTERVAL 6 HOUR * CAST(h AS INTEGER)
               + INTERVAL 6 HOUR
               * CAST(CAST(date_part('hour', ts) AS INTEGER) // 6 AS INTEGER)
               AS window_start,
             event_type
      FROM events, UNNEST(generate_series(0, 3)) AS t(h)
    )
    SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM contrib GROUP BY 1, 2
    """,
)
def q_stream_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hopping-window aggregate — 1-day windows sliding every
    6 hours over the watermarked event stream (the streaming twin of
    q_agg_window_hopping). Each event contributes to 4 open windows; the
    state store holds only (window, type) partial counts and the
    watermark expires windows past the horizon, so state is bounded by
    slide-factor × active windows — not by stream length. Complete
    output mode emits every finalized window deterministically under
    availableNow."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
    )

    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 day")
        .groupBy(
            F.window("ts", "1 day", "6 hours").alias("w"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    return run_to_memory(stream, output_mode="complete")


@_q(
    "q_cms_heavy_hitters",
    """
    WITH seeds AS (SELECT unnest(['r0', 'r1', 'r2', 'r3']) AS seed),
    hashed AS (
      SELECT e.user_id, s.seed,
             CAST(('0x' || substr(md5(s.seed || CAST(e.user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 64 AS bucket
      FROM events e, seeds s
    ),
    counters AS (
      SELECT seed, bucket, CAST(count(*) AS BIGINT) AS c
      FROM hashed GROUP BY 1, 2
    ),
    truth AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_count FROM events GROUP BY 1
    ),
    probes AS (
      SELECT t.user_id, s.seed,
             CAST(('0x' || substr(md5(s.seed || CAST(t.user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 64 AS bucket
      FROM truth t, seeds s
    ),
    est AS (
      SELECT p.user_id, CAST(min(c.c) AS BIGINT) AS cms_estimate
      FROM probes p JOIN counters c USING (seed, bucket)
      GROUP BY 1
    )
    SELECT t.user_id, t.true_count, e.cms_estimate
    FROM truth t JOIN est e USING (user_id)
    ORDER BY e.cms_estimate DESC, t.user_id LIMIT 10
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters — the sketch built IN the engine as
    an exact construction: d=4 deterministic md5 hash rows × w=64
    buckets. The sketch is one grouped count whose state is d·w counters
    regardless of stream size (mergeable partial aggregation — the whole
    point of CMS on a 1000-executor cluster); estimates take the min
    over the item's d counters and obey est ≥ true by construction
    (tested). Deterministic hashes make the sketch bit-identical across
    engines, so unlike a seeded-random sketch it carries a full oracle.
    Top-10 with total-order tie-break."""
    ev = load_table(spark, sf_dir, "events")
    seeds = F.array(*[F.lit(s) for s in ("r0", "r1", "r2", "r3")])

    def bucket(seed_col: F.Column, key_col: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(seed_col, key_col.cast("string"))), 1, 8),
                16,
                10,
            ).cast("long")
            % 64
        )

    hashed = ev.select(
        "user_id", F.explode(seeds).alias("seed")
    ).withColumn("bucket", bucket(F.col("seed"), F.col("user_id")))
    counters = hashed.groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    truth = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    probes = truth.select(
        "user_id", F.explode(seeds).alias("seed")
    ).withColumn("bucket", bucket(F.col("seed"), F.col("user_id")))
    est = (
        probes.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return (
        truth.join(est, "user_id")
        .orderBy(F.col("cms_estimate").desc(), "user_id")
        .limit(10)
    )


@_q(
    "q_bloom_membership",
    """
    WITH members AS (
      SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    ),
    hashes AS (SELECT unnest(['b0', 'b1', 'b2']) AS h),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(h || CAST(k AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1024 AS pos
      FROM members, hashes
    ),
    probe_pos AS (
      SELECT c.c_custkey, h.h,
             CAST(('0x' || substr(md5(h.h || CAST(c.c_custkey AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1024 AS pos
      FROM customer c, hashes h
    ),
    verdicts AS (
      SELECT p.c_custkey,
             CAST(SUM(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS BIGINT) = 3
               AS bloom_positive
      FROM probe_pos p LEFT JOIN bits b USING (pos)
      GROUP BY 1
    ),
    truth AS (
      SELECT c_custkey, c_custkey IN (SELECT k FROM members) AS is_member
      FROM customer
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN t.is_member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(SUM(CASE WHEN v.bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           CAST(SUM(CASE WHEN v.bloom_positive AND NOT t.is_member
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive
    FROM verdicts v JOIN truth t USING (c_custkey)
    """,
)
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership — m=1024 bits, k=3 deterministic md5
    hashes, built and probed entirely in the engine. The bit set is a
    DISTINCT over member hash positions (≤ m rows no matter how many
    members — the compression that makes Bloom filters the standard
    shuffle-pruning sidecar), broadcast to probe the full customer
    table map-side. The contract reports the honest confusion counts:
    no false negatives ever (tested invariant n_positive ≥ n_members),
    false positives counted exactly. Deterministic hashing ⇒ full
    oracle, unlike a seeded built-in sketch."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    hashes = F.array(F.lit("b0"), F.lit("b1"), F.lit("b2"))

    def pos(h: F.Column, key: F.Column) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(h, key.cast("string"))), 1, 8), 16, 10
            ).cast("long")
            % 1024
        )

    members = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = (
        members.select(F.explode(hashes).alias("h"), "k")
        .select(pos(F.col("h"), F.col("k")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe_pos = cust.select(
        "c_custkey", F.explode(hashes).alias("h")
    ).withColumn("pos", pos(F.col("h"), F.col("c_custkey")))
    verdicts = (
        probe_pos.join(F.broadcast(bits), "pos", "left")
        .groupBy("c_custkey")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == 3).alias("bloom_positive"))
    )
    truth = cust.join(
        members, cust.c_custkey == members.k, "left"
    ).select("c_custkey", F.col("k").isNotNull().alias("is_member"))
    both = verdicts.join(truth, "c_custkey")
    return both.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0)).alias("n_positive"),
        F.sum(
            F.when(F.col("bloom_positive") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_positive"),
    )


# ---------------------------------------------------------------------------
# Batch 40 — calendar/timezone exactness, t-closeness, retention sweep.
# ---------------------------------------------------------------------------


@_q(
    "q_tz_convert",
    """
    WITH ny AS (
      SELECT timezone('America/New_York',
                      CAST(o_orderdate AS TIMESTAMPTZ)) AS ny_ts,
             o_totalprice
      FROM orders
    )
    SELECT CAST(date_part('hour', ny_ts) AS INTEGER) AS ny_hour,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(CAST(CAST(ny_ts AS DATE) AS VARCHAR)) AS VARCHAR)
             AS first_ny_date
    FROM ny GROUP BY 1
    """,
)
def q_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DST-aware timezone conversion — UTC order timestamps re-expressed
    as America/New_York wall-clock. Midnight UTC lands at 19:00 EST in
    winter and 20:00 EDT in summer, so the rollup produces exactly the
    two DST buckets — the off-by-an-hour class of bug this key pins
    down (both engines resolve the IANA tzdb identically; the session
    stays UTC and conversion is explicit, never ambient). Calendar
    logic is a scalar map — no shuffle beyond the audit aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    ny = orders.select(
        F.expr(
            "convert_timezone('UTC', 'America/New_York', o_orderdate)"
        ).alias("ny_ts"),
    )
    return ny.groupBy(F.hour("ny_ts").alias("ny_hour")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.col("ny_ts").cast("date").cast("string")).alias("first_ny_date"),
    )


@_q(
    "q_iso_week_rollup",
    f"""
    SELECT CAST(isoyear(o_orderdate) AS INTEGER) AS iso_year,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_msum('o_totalprice')} AS sum_total
    FROM orders GROUP BY 1, 2
    """,
)
def q_iso_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week rollup — the reporting calendar where Jan 1 can
    belong to the PREVIOUS iso-year's week 52/53 (1995-01-01 → 1994-W52
    in this data). Pairing YEAROFWEEK with weekofyear is the correct
    grouping; pairing plain year() with weekofyear is the classic
    year-boundary double-count bug this key guards. One grouped
    aggregate; both engines implement ISO 8601 identically."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.expr("extract(YEAROFWEEK FROM o_orderdate)")
        .cast("int")
        .alias("iso_year"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("sum_total"),
    )


@_q(
    "q_emd_tcloseness",
    """
    WITH b AS (
      SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT t.event_type, v.bucket,
             coalesce(b.c, 0) AS c
      FROM (SELECT DISTINCT event_type FROM b) t
      CROSS JOIN (SELECT DISTINCT bucket FROM b) v
      LEFT JOIN b ON b.event_type = t.event_type AND b.bucket = v.bucket
    ),
    cums AS (
      SELECT event_type, bucket,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bucket)
                  AS BIGINT) AS cg,
             CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS ng
      FROM grid
    ),
    gtot AS (
      SELECT bucket, CAST(SUM(c) AS BIGINT) AS gc
      FROM grid GROUP BY 1
    ),
    gcum AS (
      SELECT bucket,
             CAST(SUM(gc) OVER (ORDER BY bucket) AS BIGINT) AS cglob,
             CAST(SUM(gc) OVER () AS BIGINT) AS nglob
      FROM gtot
    )
    SELECT c.event_type, CAST(min(c.ng) AS BIGINT) AS n_group,
           CAST(SUM(abs(c.cg * g.nglob - g.cglob * c.ng)) AS BIGINT)
             AS emd_num,
           CAST(min(c.ng) * min(g.nglob) AS BIGINT) AS emd_denom
    FROM cums c JOIN gcum g USING (bucket)
    GROUP BY 1
    """,
)
def q_emd_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness via earth-mover's distance — per event_type, how far
    the value distribution drifts from the corpus-wide distribution,
    the privacy test that k-anonymity and l-diversity miss. On an
    ordered domain EMD is the L1 gap between cumulative histograms;
    every term here is the cross-multiplied integer form
    |cg·N − Cglob·ng| (the q_ks_test recipe, summed instead of maxed),
    so the statistic is exact — publish emd_num/emd_denom and compare
    against t·denom without ever dividing. Buckets are a 50-unit floor
    grid densified per group (EMD needs aligned supports); work is two
    histogram aggregates + windows over the tiny bucket grid."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.floor(F.col("value") / 50).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))
    types = b.select("event_type").distinct()
    buckets = b.select("bucket").distinct()
    grid = (
        types.crossJoin(buckets)
        .join(b, ["event_type", "bucket"], "left")
        .select("event_type", "bucket", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wg = Window.partitionBy("event_type").orderBy("bucket")
    wn = Window.partitionBy("event_type")
    cums = grid.select(
        "event_type",
        "bucket",
        F.sum("c").over(wg).alias("cg"),
        F.sum("c").over(wn).alias("ng"),
    )
    glob = grid.groupBy("bucket").agg(F.sum("c").alias("gc"))
    wgl = Window.orderBy("bucket")
    gcum = glob.select(
        "bucket",
        F.sum("gc").over(wgl).alias("cglob"),
        F.sum("gc").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("nglob"),
    )
    joined = cums.join(F.broadcast(gcum), "bucket")
    return joined.groupBy("event_type").agg(
        F.min("ng").alias("n_group"),
        F.sum(
            F.abs(F.col("cg") * F.col("nglob") - F.col("cglob") * F.col("ng"))
        ).alias("emd_num"),
        (F.min("ng") * F.min("nglob")).alias("emd_denom"),
    )


@_q(
    "q_retention_sweep",
    """
    WITH policy AS (
      SELECT * FROM (VALUES ('error', 7), ('click', 14), ('view', 14),
                            ('signup', 60), ('purchase', 60)) p(t, keep_days)
    )
    SELECT e.event_type,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE)
                         >= DATE '2024-01-31' - p.keep_days
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN CAST(e.ts AS DATE)
                         < DATE '2024-01-31' - p.keep_days
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purged
    FROM events e JOIN policy p ON e.event_type = p.t
    GROUP BY 1
    """,
)
def q_retention_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class retention sweep — the GDPR/data-lifecycle maintenance
    job: each event class carries its own retention horizon (errors 7
    days, engagement 14, account events 60, all relative to the fixed
    as-of date 2024-01-31), rows past horizon are purged via an
    overwrite of the survivors, and the audit reports kept/purged per
    class. The policy table broadcasts; the sweep is one filtered write
    (at scale: partition-aligned so expired partitions drop whole);
    the audit counts come from the read-back survivors plus the
    pre-sweep totals — proving the physical sweep matched the policy."""
    import hashlib

    ev = load_table(spark, sf_dir, "events")
    policy = spark.createDataFrame(
        [("error", 7), ("click", 14), ("view", 14), ("signup", 60), ("purchase", 60)],
        "t string, keep_days int",
    )
    asof = F.lit("2024-01-31").cast("date")
    tagged = ev.join(
        F.broadcast(policy), ev.event_type == policy.t
    ).withColumn(
        "keep",
        F.col("ts").cast("date") >= F.date_sub(asof, F.col("keep_days")),
    )
    tag = _fp_tag(sf_dir, "events")
    path = f"{_SCRATCH}/events_retained_{tag}"
    tagged.filter(F.col("keep")).select(ev.columns).write.mode(
        "overwrite"
    ).parquet(path)
    kept = (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept, "event_type", "left").select(
        "event_type",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).alias("n_purged"),
    )


# ---------------------------------------------------------------------------
# Batch 41 — exact integer allocation, Benford audit, partitioned RFM
# segmentation, association confidence/lift, survival risk table,
# duplicate-shingle coverage, exact range-partition planning.
# ---------------------------------------------------------------------------


@_q(
    "q_alloc_largest_remainder",
    """
    WITH rev AS (
      SELECT c_nationkey,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    ),
    q AS (
      SELECT c_nationkey, cents,
             (cents * 1000000) // SUM(cents) OVER () AS fl,
             (cents * 1000000) % SUM(cents) OVER () AS rem
      FROM rev
    ),
    r AS (
      SELECT *, SUM(fl) OVER () AS sfl,
             ROW_NUMBER() OVER (ORDER BY rem DESC, c_nationkey) AS rn
      FROM q
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(cents AS BIGINT) AS cents,
           CAST(fl + CASE WHEN rn <= 1000000 - sfl THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_units
    FROM r
    """,
)
def q_alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment: 1,000,000 budget units
    allocated across nations proportional to exact cent revenue. The whole
    computation is integer arithmetic — cents scale to decimal(38,0), the
    floor share is `qn div tot`, the remainder `qn % tot` — so every
    allocation sums to exactly 1,000,000 under any partial-aggregation
    order (the float version misallocates units whenever rounding drifts).
    Shuffle profile: one groupBy on nationkey; the apportionment windows
    run over the 25-row aggregate, not the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(cents).alias("cents"))
    )
    w_all = Window.partitionBy()
    q = rev.select(
        "c_nationkey",
        "cents",
        F.expr("cents * CAST(1000000 AS DECIMAL(38,0))").alias("qn"),
        F.sum("cents").over(w_all).alias("tot"),
    ).select(
        "c_nationkey",
        "cents",
        F.expr("qn div tot").alias("fl"),
        F.expr("qn % tot").alias("rem"),
    )
    r = q.select(
        "*",
        F.sum("fl").over(w_all).alias("sfl"),
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("c_nationkey")))
        .alias("rn"),
    )
    return r.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("cents").cast("long").alias("cents"),
        (
            F.col("fl")
            + F.when(F.col("rn") <= F.lit(1000000) - F.col("sfl"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_units"),
    )


@_q(
    "q_benford_digits",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS leading_digit
      FROM orders
    )
    SELECT leading_digit, CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) AS DOUBLE) / CAST(SUM(count(*)) OVER () AS DOUBLE)
             AS frac
    FROM d GROUP BY 1
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order amounts — the
    classic fraud/synthetic-data screen. Counts are exact integers; the
    digit frequency is a single integer→double division, bit-identical
    across engines and accumulation orders. One map-side-combinable
    aggregate on a 9-value key; the window runs over 9 rows."""
    orders = load_table(spark, sf_dir, "orders")
    digit = (
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("leading_digit")
    )
    g = orders.groupBy(digit).agg(F.count(F.lit(1)).alias("n"))
    return g.select(
        "leading_digit",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy()).cast("double")
        ).alias("frac"),
    )


@_q(
    "q_rfm_segments",
    """
    WITH m AS (
      SELECT c_mktsegment AS seg, o_custkey AS custkey,
             max(o_orderdate) AS last_d, count(*) AS f,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT *, date_diff('day', last_d,
                          (SELECT max(o_orderdate) FROM orders)) AS rec
      FROM m
    ),
    r AS (
      SELECT seg, cents,
             ((RANK() OVER (PARTITION BY seg ORDER BY rec) - 1) * 5)
               // COUNT(*) OVER (PARTITION BY seg) + 1 AS r_q,
             ((RANK() OVER (PARTITION BY seg ORDER BY f) - 1) * 5)
               // COUNT(*) OVER (PARTITION BY seg) + 1 AS f_q,
             ((RANK() OVER (PARTITION BY seg ORDER BY cents) - 1) * 5)
               // COUNT(*) OVER (PARTITION BY seg) + 1 AS m_q
      FROM g
    )
    SELECT seg, CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM r GROUP BY 1, 2, 3, 4
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation, computed
    per market segment. Quintile assignment is rank-based in exact integer
    arithmetic — q = ((rank−1)·5) div n + 1 — so ties land in one bucket
    deterministically (ntile splits ties arbitrarily and is therefore
    unhashable across engines). Windows PARTITION BY mktsegment: ranking
    parallelizes across segments instead of funneling every customer
    through one global sort. Monetary stays in exact cents end-to-end."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    m = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("f"),
            F.sum(cents).alias("cents"),
        )
    )
    maxd = orders.agg(F.max("o_orderdate").alias("max_d"))
    g = m.crossJoin(F.broadcast(maxd)).withColumn("rec", F.datediff("max_d", "last_d"))
    w_n = Window.partitionBy("seg")
    r = g.select(
        "seg",
        "cents",
        F.rank().over(w_n.orderBy("rec")).alias("rk_r"),
        F.rank().over(w_n.orderBy("f")).alias("rk_f"),
        F.rank().over(w_n.orderBy("cents")).alias("rk_m"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    ).select(
        "seg",
        "cents",
        F.expr("(rk_r - 1) * 5 div n + 1").alias("r_q"),
        F.expr("(rk_f - 1) * 5 div n + 1").alias("f_q"),
        F.expr("(rk_m - 1) * 5 div n + 1").alias("m_q"),
    )
    return r.groupBy("seg", "r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("sum_cents"),
    )


@_q(
    "q_assoc_confidence",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
    item AS (SELECT l_partkey, count(*) AS s FROM b GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             count(*) AS s_ab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT part_a, part_b, CAST(s_ab AS BIGINT) AS s_ab,
           CAST(ia.s AS BIGINT) AS s_a, CAST(ib.s AS BIGINT) AS s_b,
           CAST(s_ab AS DOUBLE) / CAST(ia.s AS DOUBLE) AS confidence,
           CAST(s_ab * n_orders AS DOUBLE) / CAST(ia.s * ib.s AS DOUBLE)
             AS lift
    FROM pair JOIN item ia ON part_a = ia.l_partkey
              JOIN item ib ON part_b = ib.l_partkey, n
    """,
)
def q_assoc_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule strength for co-purchased part pairs: support,
    confidence = s(a,b)/s(a) and lift = s(a,b)·N / (s(a)·s(b)). All
    supports are exact integer counts; each ratio is a single
    integer→double division (the products stay < 2^53), so the floats are
    bit-identical across engines and partial-aggregation orders. The pair
    blow-up is per-order local (same shape as q_market_basket); the
    item-support joins broadcast the small aggregate sides."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select(F.countDistinct("l_orderkey").alias("n_orders"))
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = li.alias("a")
    c = li.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("c.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .filter(F.col("s_ab") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("s_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("s_b"))
    out = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
    )
    return out.select(
        "part_a",
        "part_b",
        "s_ab",
        "s_a",
        "s_b",
        (F.col("s_ab").cast("double") / F.col("s_a").cast("double")).alias(
            "confidence"
        ),
        (
            (F.col("s_ab") * F.col("n_orders")).cast("double")
            / (F.col("s_a") * F.col("s_b")).cast("double")
        ).alias("lift"),
    )


@_q(
    "q_survival_table",
    """
    WITH c AS (
      SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l,
             count(*) AS n
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT max(o_orderdate) AS gmax FROM orders),
    d AS (
      SELECT CASE WHEN n >= 2 THEN date_diff('day', f, l)
                  ELSE date_diff('day', f, gmax) END AS t,
             CASE WHEN n >= 2 THEN 1 ELSE 0 END AS ev
      FROM c, mx
    ),
    g AS (
      SELECT t, SUM(ev) AS n_events, SUM(1 - ev) AS n_censored,
             count(*) AS m
      FROM d GROUP BY 1
    )
    SELECT CAST(t AS BIGINT) AS duration_days,
           CAST(SUM(m) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_censored AS BIGINT) AS n_censored
    FROM g
    """,
)
def q_survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table over customer lifetimes (first→last order;
    single-order customers are right-censored at the corpus horizon).
    Emits the estimator's sufficient statistics — n_at_risk / n_events /
    n_censored per distinct duration — all exact integers (the survival
    product Π(1−dᵢ/nᵢ) is float-associative, so the contract surface stays
    on the integer risk table any downstream can fold deterministically).
    n_at_risk is a descending cumulative sum over *distinct durations*
    (bounded by the date-range span, not the row count)."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("f"),
        F.max("o_orderdate").alias("l"),
        F.count(F.lit(1)).alias("n"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("gmax"))
    d = c.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("n") >= 2, F.datediff("l", "f"))
        .otherwise(F.datediff("gmax", "f"))
        .alias("t"),
        F.when(F.col("n") >= 2, 1).otherwise(0).alias("ev"),
    )
    g = d.groupBy("t").agg(
        F.sum("ev").alias("n_events"),
        F.sum(1 - F.col("ev")).alias("n_censored"),
        F.count(F.lit(1)).alias("m"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        F.col("t").cast("long").alias("duration_days"),
        F.sum("m").over(w).cast("long").alias("n_at_risk"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_censored").cast("long").alias("n_censored"),
    )


@_q(
    "q_dup_ngram_coverage",
    f"""
    WITH sh AS (SELECT doc_id, unnest({_SHINGLE_SQL}) AS s FROM documents),
    cnt AS (SELECT s, count(*) AS nd FROM sh GROUP BY 1),
    per AS (
      SELECT sh.doc_id, count(*) AS n_shingles,
             SUM(CASE WHEN cnt.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM sh JOIN cnt USING (s) GROUP BY 1
    )
    SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_dup AS BIGINT) AS n_dup_shingles,
           CAST(n_dup AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS dup_frac
    FROM per
    """,
)
def q_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-text fraction: the share of a doc's distinct
    3-gram shingles that occur in ≥2 corpus documents — the corpus-QC
    metric behind 'duplicate n-gram coverage' filters in web-scale
    training-data pipelines. Inverted-index plan: explode distinct
    shingles, count document frequency per shingle (map-side combinable),
    join back on the shingle and re-aggregate per doc — two key-partitioned
    shuffles, never a doc×doc comparison. dup_frac is one integer→double
    division, bit-identical across engines."""
    from etl_pipeline_project_spark.operators.dedup_text import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(word_shingles("text", 3)).alias("s"))
    cnt = sh.groupBy("s").agg(F.count(F.lit(1)).alias("nd"))
    per = (
        sh.join(cnt, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_shingles"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_dup_shingles",
        (
            F.col("n_dup_shingles").cast("double")
            / F.col("n_shingles").cast("double")
        ).alias("dup_frac"),
    )


@_q(
    "q_partition_bounds",
    """
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             count(*) AS c
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT cents, c,
             COALESCE(SUM(c) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt,
             SUM(c) OVER () AS n
      FROM v
    )
    SELECT CAST((cum_lt * 8) // n + 1 AS BIGINT) AS partition_id,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM w GROUP BY 1
    """,
)
def q_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth range-partition planning — the boundary table a
    repartitionByRange / distributed sort needs, computed exactly instead
    of by sampling (Spark's RangePartitioner samples; a skewed sample
    yields straggler partitions). Count-based plan: collapse to distinct
    cent values map-side, one cumulative window over the distinct-value
    table, then pid = (rows_below·P) div n + 1 in pure integer arithmetic
    — equal values never straddle a boundary, and every partition's row
    count + upper bound is reproducible under any accumulation order."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    v = orders.groupBy(cents.alias("cents")).agg(F.count(F.lit(1)).alias("c"))
    w_lt = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "cents",
        "c",
        F.coalesce(F.sum("c").over(w_lt), F.lit(0)).alias("cum_lt"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    return (
        w.select("cents", "c", F.expr("cum_lt * 8 div n + 1").alias("partition_id"))
        .groupBy("partition_id")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.max("cents").cast("long").alias("hi_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 42 — deterministic KMV distinct sketch, union-by-name, l-diversity,
# text-source round-trip, LTV cohort revenue curves.
# ---------------------------------------------------------------------------


@_q(
    "q_kmv_distinct",
    """
    WITH h AS (
      SELECT md5(CAST(l_partkey AS VARCHAR)) AS hv
      FROM (SELECT DISTINCT l_partkey FROM lineitem)
    ),
    kmin AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
    kth AS (SELECT max(hv) AS kth_hash, count(*) AS k FROM kmin),
    ex AS (SELECT count(*) AS exact_distinct FROM h)
    SELECT CAST(k AS BIGINT) AS k, kth_hash,
           CASE WHEN k < 256 THEN CAST(k AS DOUBLE)
                ELSE CAST(k - 1 AS DOUBLE)
                  / (CAST(CAST('0x' || substr(kth_hash, 1, 13) AS UBIGINT)
                          AS DOUBLE) / 4503599627370496.0)
           END AS est_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM kth, ex
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=256, built on md5 so
    the sketch is DETERMINISTIC and cross-engine exact — unlike HLL
    (q_agg_approx_distinct, engine-private hashing → rows-only check), this
    approximate operator carries a full value oracle. The k smallest hashes
    come from a distributed TakeOrdered (per-partition top-k, then a k-row
    merge on the driver side of the exchange — never a global sort), which
    is also the mergeability story at 100 TB: per-partition KMV states
    union by keeping the k smallest of the union. The estimate
    (k−1)/u_k uses the first 13 hex chars (52 bits — exact in a double);
    lexicographic order on fixed-width hex equals numeric order, so both
    engines pick the identical k-th hash."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    h = li.select(F.md5(F.col("l_partkey").cast("string").cast("binary")).alias("hv"))
    kmin = h.orderBy("hv").limit(256)
    kth = kmin.agg(F.max("hv").alias("kth_hash"), F.count(F.lit(1)).alias("k"))
    ex = h.agg(F.count(F.lit(1)).alias("exact_distinct"))
    u_k = F.conv(F.substring("kth_hash", 1, 13), 16, 10).cast("double") / F.lit(
        4503599627370496.0
    )
    return (
        kth.crossJoin(F.broadcast(ex))
        .select(
            F.col("k").cast("long").alias("k"),
            "kth_hash",
            # under-full sketch (< k keys seen) holds every hash: exact
            F.when(F.col("k") < 256, F.col("k").cast("double"))
            .otherwise((F.col("k") - 1).cast("double") / u_k)
            .alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
    )


@_q(
    "q_union_by_name",
    """
    SELECT o_orderkey, o_totalprice, CAST(NULL AS DATE) AS o_orderdate,
           'amount' AS src
    FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderdate,
           'dates' AS src
    FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-tolerant union: two branches with DIFFERENT column sets
    combined by NAME with nulls for the missing columns
    (`unionByName(allowMissingColumns=True)` — the reference's staging
    union `data/utils.py:44` silently relies on pandas concat doing exactly
    this). Positional UNION ALL would misalign or reject these branches;
    by-name alignment is the contract. Narrow per-branch projections keep
    the scans pruned; no shuffle at all — union is a partition concat."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice", F.lit("amount").alias("src")
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", "o_orderdate", F.lit("dates").alias("src")
    )
    return a.unionByName(b, allowMissingColumns=True)


@_q(
    "q_l_diversity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS n_orders,
             count(DISTINCT o_orderpriority) AS l_distinct
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment,
           CAST(n_orders AS BIGINT) AS n_orders,
           CAST(l_distinct AS BIGINT) AS l_distinct,
           l_distinct >= 3 AS is_l_diverse
    FROM g
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the privacy check k-anonymity (q_k_anonymize)
    misses: a quasi-identifier group is safe only if the SENSITIVE
    attribute takes ≥ l distinct values inside it (a k-anonymous group
    where everyone shares one diagnosis still leaks it). Quasi-group =
    (nation, market segment); sensitive = order priority; l = 3. One
    grouped count-distinct — partial-aggregatable, one shuffle on the
    quasi-identifier key."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    g = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("l_distinct"),
        )
    )
    return g.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "c_mktsegment",
        "n_orders",
        "l_distinct",
        (F.col("l_distinct") >= 3).alias("is_l_diverse"),
    )


@_q(
    "q_scan_text_roundtrip",
    """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids
    FROM documents GROUP BY 1
    """,
)
def q_scan_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source/sink round-trip (`spark.read.text`), completing
    the format matrix (parquet/CSV/JSON/ORC keys elsewhere): documents go
    out as one tab-delimited line each, come back through the line-oriented
    reader, get re-split, and must aggregate identically to the parquet
    original. Text files carry no schema — the split/cast layer IS the
    schema, which is the failure mode this key pins (a doc with a stray
    delimiter or newline would corrupt the frame shape). Line-oriented
    reads parallelize by HDFS split at scale."""
    docs = load_table(spark, sf_dir, "documents")
    out = f"{_SCRATCH}/text_stage_{spark.sparkContext.applicationId}"
    docs.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), "source", "text").alias(
            "value"
        )
    ).write.mode("overwrite").text(out)
    back = spark.read.text(out).select(
        F.split("value", "\t").alias("parts")
    ).select(
        F.col("parts")[0].alias("doc_id"),
        F.col("parts")[1].alias("source"),
        F.col("parts")[2].alias("text"),
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("sum_chars"),
        F.countDistinct("doc_id").alias("n_ids"),
    )


@_q(
    "q_ltv_cohort_curve",
    """
    WITH first_o AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_m
      FROM orders GROUP BY 1
    ),
    rev AS (
      SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - cohort_m
                  AS BIGINT) AS month_idx,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents,
             count(DISTINCT o_custkey) AS n_active
      FROM orders JOIN first_o USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT cohort_m, month_idx,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(SUM(cents) OVER (PARTITION BY cohort_m ORDER BY month_idx)
                AS BIGINT) AS cum_cents
    FROM rev
    """,
)
def q_ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, cumulative revenue per cohort by months-since-acquisition — the
    revenue companion to q_retention_cohort (which counts activity).
    Revenue stays in exact integer cents through the cumulative window, so
    the curve is reproducible under any partial-aggregation order. Plan:
    one groupBy for cohort assignment, join back on o_custkey (the shuffle
    key both sides already share), aggregate to (cohort, month) — the
    cumulative window then runs over the tiny cohort×month grid, not the
    fact table."""
    orders = load_table(spark, sf_dir, "orders")
    mkey = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first_o = orders.groupBy("o_custkey").agg(F.min(mkey).alias("cohort_m"))
    rev = (
        orders.join(first_o, "o_custkey")
        .groupBy(
            F.col("cohort_m").cast("long").alias("cohort_m"),
            (mkey - F.col("cohort_m")).cast("long").alias("month_idx"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
            F.countDistinct("o_custkey").alias("n_active"),
        )
    )
    w = Window.partitionBy("cohort_m").orderBy("month_idx")
    return rev.select(
        "cohort_m",
        "month_idx",
        "n_active",
        F.sum("cents").over(w).cast("long").alias("cum_cents"),
    )


# ---------------------------------------------------------------------------
# Batch 43 — ordered string aggregation, integer-exact log2 histogram,
# calendar-seasonality anomalies, PERMISSIVE corrupt-record ingestion,
# complete-mode streaming aggregation.
# ---------------------------------------------------------------------------


@_q(
    "q_string_agg_ordered",
    """
    SELECT n_name,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segments,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM (
      SELECT DISTINCT n_name, c_mktsegment, c_custkey
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) GROUP BY n_name
    """,
)
def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg semantics): per
    nation, the '|'-joined ordered list of member segments. Unordered
    collect_list is nondeterministic under distribution — the contractual
    form is array_join(array_sort(collect_list(...))), which gives the
    same string under any partial-aggregation order. Strings stay bounded
    because aggregation is per-customer-distinct first (the general
    at-scale guard: never string_agg an unbounded group)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_mktsegment", "c_custkey")
        .distinct()
    )
    return base.groupBy("n_name").agg(
        F.array_join(F.array_sort(F.collect_list("c_mktsegment")), "|").alias(
            "segments"
        ),
        F.count(F.lit(1)).alias("n_customers"),
    )


@_q(
    "q_log2_histogram",
    """
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents
    FROM c GROUP BY 1
    """,
)
def q_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logarithmic (power-of-two) histogram of order amounts — the
    long-tail distribution view linear bins (q_numeric_histogram) flatten.
    The bucket is floor(log2(cents)) computed WITHOUT floating log —
    length(bin(x))−1 is the integer bit length, exact at every power-of-two
    boundary where float log2 rounds either way. One map-side-combinable
    aggregate on ≤64 buckets."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        orders.select(cents.alias("cents"))
        .groupBy((F.length(F.bin("cents")) - 1).cast("long").alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


@_q(
    "q_seasonal_residual",
    """
    WITH x AS (
      -- DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based (Sun=1)
      SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    s AS (
      SELECT dow, hod, v,
             count(*) OVER w AS n,
             SUM(v) OVER w AS s1,
             SUM(v * v) OVER w AS s2
      FROM x WINDOW w AS (PARTITION BY dow, hod)
    )
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN (n * v - s1) * (n * v - s1)
                              > 9 * (n * s2 - s1 * s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM s GROUP BY 1, 2
    """,
)
def q_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-seasonality anomaly screen: each event is compared against
    its OWN (day-of-week, hour-of-day) profile — the seasonal baseline
    that a global z-score (q_outlier_zscore, per-user) washes out. The |x−μ|
    > 3σ test is rewritten to cross-multiplied integer form (n·x−S1)² >
    9·(n·S2−S1²): no division, no float accumulation, identical under any
    partial order. Values scale to cents in int64 — |v|≤~10⁶ cents and
    n·S2 products stay < 2^63 at the profile-bucket cardinalities this
    partitioning produces. One shuffle on the 7×24 profile key, reused by
    the window and the final aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = ev.select(
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    w = Window.partitionBy("dow", "hod")
    s = x.select(
        "dow",
        "hod",
        "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v").over(w).alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("s2"),
    )
    d = F.col("n") * F.col("v") - F.col("s1")
    rhs = F.lit(9) * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    return s.groupBy(
        F.col("dow").cast("long").alias("dow"), F.col("hod").cast("long").alias("hod")
    ).agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum(F.when(d * d > rhs, 1).otherwise(0)).cast("long").alias("n_anomalies"),
    )


@_q(
    "q_scan_csv_permissive",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(5 AS BIGINT) AS n_corrupt,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events WHERE value IS NOT NULL
    """,
)
def q_scan_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE malformed-record ingestion: a CSV staging prefix with 5
    planted corrupt lines reads back with every good row intact, the bad
    rows quarantined into _corrupt_record instead of failing the job — the
    production posture for web-scale scrapes (FAILFAST dies on one bad
    line; DROPMALFORMED silently loses data with no audit trail). The
    quarantine column is materialized via cache() before filtering —
    Spark's parser only populates _corrupt_record for rows it actually
    parses in the same pass. Counts and cent sums must equal the parquet
    source exactly."""
    import hashlib
    import os

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    # build-once per content fingerprint: re-invoking must NOT overwrite
    # the staging dir — Spark's CacheManager reuses the prior invocation's
    # cached plan (identical path ⇒ identical logical plan), and if its
    # partitions were evicted the recompute would read the just-deleted
    # files (FileNotFoundException under memory pressure at sf0.1).
    # _staged_fixture publishes the csv + bad-rows append atomically, so
    # an interrupted first run can never leave a partial fixture behind.
    def _build(tmp: str) -> None:
        ev.write.mode("overwrite").option("header", "false").csv(tmp)
        bad = spark.createDataFrame(
            [
                ("not_a_number,xyz",),
                ("1e999,,trailing",),
                ("###",),
                (",,,,",),
                ("a,b",),
            ],
            "value string",
        )
        bad.coalesce(1).write.mode("append").text(tmp)

    out = _staged_fixture("csv_permissive", _fp_tag(sf_dir, "events"), _build)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(f"{out}/*")
        .cache()
    )
    good = back.filter(F.col("_corrupt_record").isNull())
    corrupt = back.filter(F.col("_corrupt_record").isNotNull())
    return good.agg(F.count(F.lit(1)).alias("n_good")).crossJoin(
        corrupt.agg(F.count(F.lit(1)).alias("n_corrupt"))
    ).crossJoin(
        good.agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("value_cents")
        )
    )


@_q(
    "q_stream_complete_agg",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_stream_complete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete-output-mode streaming aggregation: an unwatermarked global
    groupBy over the stream, re-emitting the full result table every
    micro-batch — the dashboard-refresh output mode (append: immutable
    finalized rows; update: changed rows; complete: whole table). Final
    state after availableNow equals the batch aggregate exactly. State
    here is bounded by key cardinality (event types), which is the only
    regime where complete mode is scale-safe — the docstring contract a
    100 TB deployment inherits."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
    )

    agg = (
        read_events_stream(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return run_to_memory(agg, output_mode="complete")


# ---------------------------------------------------------------------------
# Batch 44 — struct ordering, higher-order array lambdas, exact AUC-ROC,
# snapshot vacuum planning.
# ---------------------------------------------------------------------------


@_q(
    "q_struct_ops",
    """
    WITH s AS (
      SELECT c_nationkey,
             {'cents': CAST(ROUND(c_acctbal * 100, 0) AS BIGINT),
              'name': c_name} AS st
      FROM customer
    ),
    agg AS (
      SELECT c_nationkey, min(st) AS mn, max(st) AS mx, count(*) AS n
      FROM s GROUP BY 1
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(mn.cents AS BIGINT) AS min_cents, mn.name AS min_name,
           CAST(mx.cents AS BIGINT) AS max_cents, mx.name AS max_name,
           CAST(n AS BIGINT) AS n_customers
    FROM agg
    """,
)
def q_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-typed ordering semantics: min/max over a composite
    struct(cents, name) compares field-by-field lexicographically — the
    argmin/argmax-with-tiebreak idiom that needs no window sort (the same
    single-pass trick as q_agg_argmax, here exercising the struct type
    itself as a first-class orderable value). Customer names are unique,
    so the composite order is total and the extracted fields are
    deterministic. One partial-aggregatable groupBy."""
    cust = load_table(spark, sf_dir, "customer")
    st = F.struct(
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("cents"),
        F.col("c_name").alias("name"),
    )
    agg = cust.groupBy("c_nationkey").agg(
        F.min(st).alias("mn"), F.max(st).alias("mx"), F.count(F.lit(1)).alias("n")
    )
    return agg.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("mn.cents").alias("min_cents"),
        F.col("mn.name").alias("min_name"),
        F.col("mx.cents").alias("max_cents"),
        F.col("mx.name").alias("max_name"),
        F.col("n").alias("n_customers"),
    )


@_q(
    "q_lambda_array_suite",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(l, x -> length(x) > 5)) AS BIGINT) AS n_long,
           list_bool_or(list_transform(l, x -> x = 'the')) AS has_the,
           list_bool_and(list_transform(l, x -> length(x) > 0))
             AS all_nonempty,
           CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT)
             AS total_chars,
           array_to_string(list_transform(l[1:3], x -> upper(x)), ' ')
             AS head3_upper
    FROM t
    """,
)
def q_lambda_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a contract surface — filter /
    exists / forall / aggregate(fold) / transform+slice, all evaluated
    inside Catalyst (lambda expressions compile to codegen'd loops over
    the array, zero Python). The integer fold (total_chars) is exact under
    any evaluation order; the head-3 uppercase join pins slice semantics
    (1-based, length-bounded) across engines. Map-only: no shuffle at
    all."""
    docs = load_table(spark, sf_dir, "documents")
    l = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(l, lambda x: F.length(x) > 5)).cast("long").alias("n_long"),
        F.exists(l, lambda x: x == "the").alias("has_the"),
        F.forall(l, lambda x: F.length(x) > 0).alias("all_nonempty"),
        F.aggregate(
            l, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice(l, 1, 3), lambda x: F.upper(x)), " "
        ).alias("head3_upper"),
    )


@_q(
    "q_auc_roc",
    """
    WITH x AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ),
    dv AS (
      SELECT v, count(*) AS c, SUM(y) AS pos_c FROM x GROUP BY 1
    ),
    r AS (
      SELECT v, c, pos_c,
             SUM(c) OVER (ORDER BY v) AS cum
      FROM dv
    ),
    s AS (
      SELECT SUM(pos_c * (2 * (cum - c) + c + 1)) AS s2,
             SUM(pos_c) AS n1, SUM(c - pos_c) AS n0
      FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           CAST(s2 - n1 * (n1 + 1) AS BIGINT) AS u_doubled,
           CAST(s2 - n1 * (n1 + 1) AS DOUBLE)
             / CAST(2 * n1 * n0 AS DOUBLE) AS auc
    FROM s
    """,
)
def q_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC-ROC with average-rank tie handling, via the
    AUC = U/(n₁·n₀) identity with the Mann-Whitney U statistic
    (q_mann_whitney_u's doubled-rank integerization: 2·avg_rank =
    2·rank + peers − 1, accumulated per DISTINCT score so no row-level
    rank window is needed). Everything up to the final single division is
    int64 — the sort-free, tie-correct way to evaluate a ranking model on
    10^11 scored rows: one groupBy on the score value, one cumulative
    window over distinct scores."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = ev.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    dv = x.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("pos_c")
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    r = dv.select("v", "c", "pos_c", F.sum("c").over(wcum).alias("cum"))
    s = r.agg(
        F.sum(
            F.col("pos_c") * (2 * (F.col("cum") - F.col("c")) + F.col("c") + 1)
        ).alias("s2"),
        F.sum("pos_c").alias("n1"),
        F.sum(F.col("c") - F.col("pos_c")).alias("n0"),
    )
    u2 = F.col("s2") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        F.col("n1").cast("long").alias("n_pos"),
        F.col("n0").cast("long").alias("n_neg"),
        u2.cast("long").alias("u_doubled"),
        (
            u2.cast("double") / (2 * F.col("n1") * F.col("n0")).cast("double")
        ).alias("auc"),
    )


@_q(
    "q_vacuum_plan",
    """
    WITH gens AS (
      SELECT 'gen1' AS gen,
             (SELECT count(*) FROM orders
              WHERE o_orderdate < DATE '1997-01-01') AS n_rows
      UNION ALL
      SELECT 'gen2',
             (SELECT count(*) FROM orders
              WHERE o_orderdate >= DATE '1997-01-01') AS n_rows
      UNION ALL
      SELECT 'gen3', (SELECT count(*) FROM orders)
    )
    SELECT gen, CAST(n_rows AS BIGINT) AS n_rows,
           gen IN ('gen1', 'gen2') AS deletable
    FROM gens
    """,
)
def q_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM planning over the manifest-based snapshot log
    (q_snapshot_time_travel's structure, with a compaction generation):
    v1 = {gen1}, v2 = {gen1, gen2}, v3 rewrites everything into {gen3}.
    Expiring snapshots older than the current one makes gen1/gen2
    unreferenced — the deletable set is reachability set-algebra over the
    MANIFEST (planner-sized), never a data scan; per-generation row counts
    come from parquet footers. This is exactly Delta/Iceberg VACUUM:
    retention math on metadata, physical deletes as an O(files) side
    effect."""
    import hashlib
    import json
    import os

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("date")

    def _build(tmp: str) -> None:
        orders.filter(F.col("o_orderdate") < cut).write.mode("overwrite").parquet(
            f"{tmp}/gen1"
        )
        orders.filter(F.col("o_orderdate") >= cut).write.mode("overwrite").parquet(
            f"{tmp}/gen2"
        )
        spark.read.parquet(f"{tmp}/gen1", f"{tmp}/gen2").write.mode(
            "overwrite"
        ).parquet(f"{tmp}/gen3")
        manifest = {
            "v1": ["gen1"],
            "v2": ["gen1", "gen2"],
            "v3": ["gen3"],
            "current": "v3",
        }
        # manifest written last inside tmp; the fixture publishes whole
        with open(f"{tmp}/manifest.json", "w") as fh:
            json.dump(manifest, fh)

    base = _staged_fixture("orders_vacuum", _fp_tag(sf_dir, "orders"), _build)
    manifest_path = f"{base}/manifest.json"
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    current = manifest[manifest["current"]]
    all_gens = sorted({g for v, gens in manifest.items() if v != "current" for g in gens})
    rows = []
    for gen in all_gens:
        n = spark.read.parquet(f"{base}/{gen}").count()
        rows.append((gen, n, gen not in current))
    return spark.createDataFrame(
        rows, "gen string, n_rows long, deletable boolean"
    )


# ---------------------------------------------------------------------------
# Batch 45 — Python DataSource connector, SQL pipe syntax, GROUP BY ALL,
# full-clause MERGE matrix.
# ---------------------------------------------------------------------------


@_q(
    "q_scan_python_datasource",
    """
    WITH t AS (
      SELECT id, id % 7 AS mod7, (id * id) % 101 AS score
      FROM range(0, 1000) r(id)
    )
    SELECT CAST(mod7 AS BIGINT) AS mod7,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(score) AS BIGINT) AS sum_score,
           CAST(min(id) AS BIGINT) AS min_id,
           CAST(max(id) AS BIGINT) AS max_id
    FROM t GROUP BY 1
    """,
)
def q_scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 DataSource API) — the distributed
    replacement for the reference's driver-side paged-API loop
    (`data/extraction.py:108-180`): `partitions()` declares one split per
    page, executors pull pages in parallel through `read()`, and the rows
    enter the plan exactly like a parquet scan (schema declared, options
    pushed). The synthetic page payload is pure integer arithmetic so the
    oracle reproduces it from a range() relation. See
    sources/pydatasource.py for the production-shape connector."""
    from etl_pipeline_project_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("pagednumbers")
        .option("n", "1000")
        .option("parts", "8")
        .load()
    )
    return df.groupBy("mod7").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score").alias("sum_score"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


@_q(
    "q_sql_pipe",
    f"""
    SELECT l_returnflag,
           {_msum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY 1
    HAVING count(*) > 10
    """,
)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators) — the linear query form
    where each stage feeds the next: FROM |> WHERE |> AGGREGATE ... GROUP
    BY |> WHERE(having). Same Catalyst plan as the nested-SQL twin (the
    pipe parser is sugar, not a different engine path) — this key pins
    that equivalence. Exact-decimal money accumulation as everywhere."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe")
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE
             CAST(CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(38,10))), 2) AS DECIMAL(38,2)) AS DOUBLE)
               AS revenue,
             COUNT(*) AS n_lines
           GROUP BY l_returnflag
        |> WHERE n_lines > 10
        |> SELECT l_returnflag, revenue, n_lines
        """
    )


@_q(
    "q_group_by_all",
    f"""
    SELECT o_orderpriority, o_orderstatus, year(o_orderdate) AS yr,
           CAST(count(*) AS BIGINT) AS n,
           {_msum('o_totalprice')} AS total
    FROM orders
    GROUP BY ALL
    """,
)
def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — every non-aggregate select item becomes a grouping
    key implicitly (the refactor-safe form: adding a dimension column
    can't silently fall out of the GROUP BY). Both engines resolve the
    same three keys; plan is one partial+final aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, year(o_orderdate) AS yr,
               COUNT(*) AS n,
               CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2)
                    AS DECIMAL(38,2)) AS DOUBLE) AS total
        FROM orders_gba
        GROUP BY ALL
        """
    )


@_q(
    "q_merge_all_clauses",
    """
    WITH src AS (
      SELECT o_custkey AS custkey,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS order_cents
      FROM orders WHERE o_orderdate >= DATE '1998-04-01' GROUP BY 1
    ),
    tgt AS (
      SELECT c_custkey AS custkey,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      FROM customer WHERE c_acctbal > 0
    ),
    merged AS (
      SELECT COALESCE(t.custkey, s.custkey) AS custkey,
             CASE
               WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                    AND s.order_cents > 20000000
                 THEN 'update'
               WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                 THEN 'delete_matched'
               WHEN t.custkey IS NULL THEN 'insert'
               ELSE 'delete_by_source'
             END AS action,
             CASE
               WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL
                    AND s.order_cents > 20000000
                 THEN t.bal_cents + s.order_cents
               WHEN t.custkey IS NULL THEN s.order_cents
               ELSE NULL
             END AS new_cents
      FROM tgt t FULL OUTER JOIN src s ON t.custkey = s.custkey
    )
    SELECT action, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(new_cents) AS BIGINT) AS sum_new_cents
    FROM merged GROUP BY 1
    """,
)
def q_merge_all_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MERGE clause matrix — WHEN MATCHED AND cond THEN UPDATE /
    WHEN MATCHED THEN DELETE / WHEN NOT MATCHED THEN INSERT / WHEN NOT
    MATCHED BY SOURCE THEN DELETE — emulated the way every engine
    physically executes MERGE: one full-outer equi-join between target and
    source, a per-row action decision, then the survivor projection
    (q_merge_upsert covers the two-clause upsert; this key pins the
    4-clause semantics incl. conditional update and by-source deletes).
    One shuffle on the merge key; balances stay in exact cents."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # recent-window source + threshold chosen so all four clauses fire on
    # the testdata (incl. by-source deletes for stale target rows)
    src = (
        orders.filter(F.col("o_orderdate") >= F.lit("1998-04-01").cast("date"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "order_cents"
            )
        )
    )
    tgt = cust.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    t = tgt.alias("t")
    s = src.alias("s")
    j = t.join(s, F.col("t.custkey") == F.col("s.custkey"), "full_outer")
    in_t = F.col("t.custkey").isNotNull()
    in_s = F.col("s.custkey").isNotNull()
    big = F.col("s.order_cents") > 20000000
    action = (
        F.when(in_t & in_s & big, "update")
        .when(in_t & in_s, "delete_matched")
        .when(~in_t, "insert")
        .otherwise("delete_by_source")
    )
    new_cents = (
        F.when(in_t & in_s & big, F.col("t.bal_cents") + F.col("s.order_cents"))
        .when(~in_t, F.col("s.order_cents"))
        .otherwise(F.lit(None).cast("long"))
    )
    merged = j.select(action.alias("action"), new_cents.alias("new_cents"))
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("new_cents").cast("long").alias("sum_new_cents"),
    )


# ---------------------------------------------------------------------------
# Batch 46 — functional-dependency audit, explicit null ordering, array
# set algebra, id-gap range detection.
# ---------------------------------------------------------------------------


@_q(
    "q_fd_audit",
    """
    WITH fd1 AS (
      SELECT 'o_orderkey->o_custkey' AS fd,
             count(*) AS n_lhs,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating_lhs
      FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nd
            FROM orders GROUP BY 1)
    ),
    fd2 AS (
      SELECT 'o_custkey->o_orderpriority' AS fd,
             count(*) AS n_lhs,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating_lhs
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY 1)
    ),
    fd3 AS (
      SELECT 'c_custkey->c_nationkey' AS fd,
             count(*) AS n_lhs,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating_lhs
      FROM (SELECT c_custkey, count(DISTINCT c_nationkey) AS nd
            FROM customer GROUP BY 1)
    )
    SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs,
           CAST(n_violating_lhs AS BIGINT) AS n_violating_lhs,
           n_violating_lhs = 0 AS holds
    FROM (SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
          UNION ALL SELECT * FROM fd3)
    """,
)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery/audit — does A determine B? For each
    candidate FD, group by the determinant and count left-hand sides with
    more than one distinct dependent value (schema-inference and
    normalization tooling runs exactly this probe). o_orderkey→o_custkey
    and c_custkey→c_nationkey hold (key FDs); o_custkey→o_orderpriority is
    the negative control. Each FD is one partial-aggregatable
    groupBy+count-distinct; the verdict is integer counts."""

    def fd(df: DataFrame, lhs: str, rhs: str, name: str) -> DataFrame:
        per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        return per.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).alias("n_lhs"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_violating_lhs"),
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    u = (
        fd(orders, "o_orderkey", "o_custkey", "o_orderkey->o_custkey")
        .unionByName(
            fd(orders, "o_custkey", "o_orderpriority", "o_custkey->o_orderpriority")
        )
        .unionByName(fd(cust, "c_custkey", "c_nationkey", "c_custkey->c_nationkey"))
    )
    return u.select(
        "fd", "n_lhs", "n_violating_lhs", (F.col("n_violating_lhs") == 0).alias("holds")
    )


@_q(
    "q_null_ordering",
    """
    WITH x AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
      FROM events
    ),
    nf AS (
      SELECT event_id, ROW_NUMBER() OVER (ORDER BY value ASC NULLS FIRST,
                                          event_id) AS rn
      FROM x
    ),
    nl AS (
      SELECT event_id, ROW_NUMBER() OVER (ORDER BY value ASC NULLS LAST,
                                          event_id) AS rn
      FROM x
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST((SELECT count(*) FROM x WHERE value IS NULL) AS BIGINT)
             AS n_nulls,
           CAST((SELECT min(event_id) FROM nf WHERE rn = 1) AS BIGINT)
             AS first_nulls_first,
           CAST((SELECT min(event_id) FROM nl WHERE rn = 1) AS BIGINT)
             AS first_nulls_last
    FROM x
    """,
)
def q_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST / NULLS LAST ordering — the portability trap
    this engine never leaves implicit: Spark's ASC default is NULLS FIRST,
    DuckDB's (and Postgres's) is NULLS LAST, so any cross-engine ORDER BY
    on a nullable key MUST spell the placement out. The key materializes
    both orderings' first row over the nullable value column; they differ
    exactly when nulls exist. Sort is windowed row_number with a unique
    tie-break."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        # the testdata carries no physical nulls: derive a deterministic
        # nullable column (errors report no value) to pin the semantics
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value"),
    )
    w_nf = Window.orderBy(F.col("value").asc_nulls_first(), "event_id")
    w_nl = Window.orderBy(F.col("value").asc_nulls_last(), "event_id")
    nf = ev.select("event_id", F.row_number().over(w_nf).alias("rn")).filter(
        F.col("rn") == 1
    )
    nl = ev.select("event_id", F.row_number().over(w_nl).alias("rn")).filter(
        F.col("rn") == 1
    )
    tot = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
    )
    return (
        tot.crossJoin(
            F.broadcast(nf.select(F.col("event_id").alias("first_nulls_first")))
        ).crossJoin(
            F.broadcast(nl.select(F.col("event_id").alias("first_nulls_last")))
        )
    )


@_q(
    "q_array_set_ops",
    """
    WITH a AS (
      SELECT o_custkey AS custkey,
             list_sort(list_distinct(list(o_orderpriority))) AS prios_all,
             -- COALESCE to []: a customer with no qualifying rows gets NULL
             -- from the filtered list() aggregate, where Spark's collect_set
             -- gives an EMPTY array ('' after join, [] in set algebra) —
             -- invisible until a no-recent-orders customer appears (sf0.1+)
             list_sort(list_distinct(COALESCE(list(o_orderpriority)
               FILTER (o_orderdate >= DATE '1996-01-01'), []))) AS prios_recent
      FROM orders GROUP BY 1
    )
    SELECT custkey,
           array_to_string(prios_all, ',') AS all_prios,
           -- array_to_string([]) is NULL in DuckDB where Spark's
           -- array_join gives '' — coalesce every possibly-empty list
           COALESCE(array_to_string(prios_recent, ','), '') AS recent_prios,
           COALESCE(array_to_string(list_sort(list_intersect(prios_all, prios_recent)),
                           ','), '') AS both_prios,
           COALESCE(array_to_string(list_sort(list_filter(prios_all,
                           x -> NOT list_contains(prios_recent, x))), ','), '')
             AS only_old,
           len(prios_all) > 0 AND len(prios_recent) > 0
             AND len(list_intersect(prios_all, prios_recent)) > 0 AS overlaps
    FROM a
    """,
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — union/intersect/except/overlap on collected
    per-key sets, all inside Catalyst (array_intersect/array_except/
    arrays_overlap), emitted as canonical sorted CSV strings so the
    comparison is representation-independent. The per-customer priority
    sets are bounded (≤5 values) — the collect_set is safe by domain, the
    at-scale contract for any collect-based plan. One shuffle on
    custkey."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("prios_all"),
        F.array_sort(
            F.collect_set(
                F.when(
                    F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"),
                    F.col("o_orderpriority"),
                )
            )
        ).alias("prios_recent"),
    )
    return a.select(
        "custkey",
        F.array_join("prios_all", ",").alias("all_prios"),
        F.array_join("prios_recent", ",").alias("recent_prios"),
        F.array_join(
            F.array_sort(F.array_intersect("prios_all", "prios_recent")), ","
        ).alias("both_prios"),
        F.array_join(
            F.array_sort(F.array_except("prios_all", "prios_recent")), ","
        ).alias("only_old"),
        (
            (F.size("prios_all") > 0)
            & (F.size("prios_recent") > 0)
            & F.arrays_overlap("prios_all", "prios_recent")
        ).alias("overlaps"),
    )


@_q(
    "q_id_gap_ranges",
    """
    WITH k AS (SELECT DISTINCT l_orderkey AS id FROM lineitem),
    g AS (
      SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM k
    )
    SELECT CAST(id + 1 AS BIGINT) AS gap_start,
           CAST(nxt - 1 AS BIGINT) AS gap_end,
           CAST(nxt - id - 1 AS BIGINT) AS gap_len
    FROM g WHERE nxt - id > 1
    """,
)
def q_id_gap_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id range detection over a sparse key domain (the orderkeys
    referenced by lineitem — a subset of the order sequence, so holes
    exist by construction): each hole in the sequence becomes
    one (gap_start, gap_end, gap_len) row via a single lead() pass over
    the distinct keys — no sequence table is ever materialized, which is
    the difference between O(distinct keys) and O(key domain) at 10^12
    ids. The classic completeness audit for ingest pipelines with
    monotonic ids."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.select(F.col("l_orderkey").alias("id")).distinct()
    g = k.select("id", F.lead("id").over(Window.orderBy("id")).alias("nxt"))
    return g.filter(F.col("nxt") - F.col("id") > 1).select(
        (F.col("id") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("id") - 1).alias("gap_len"),
    )


# ---------------------------------------------------------------------------
# Batch 47 — price/volume bridge, ABC classification, segment migration,
# inter-arrival histogram.
# ---------------------------------------------------------------------------


@_q(
    "q_price_volume_bridge",
    """
    WITH li AS (
      SELECT p_brand,
             year(o_orderdate) AS yr,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                  AS BIGINT) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE year(o_orderdate) IN (1995, 1996)
    ),
    agg AS (
      SELECT p_brand,
             SUM(CASE WHEN yr = 1995 THEN q ELSE 0 END) AS q0,
             SUM(CASE WHEN yr = 1996 THEN q ELSE 0 END) AS q1,
             SUM(CASE WHEN yr = 1995 THEN cents ELSE 0 END) AS r0,
             SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS r1
      FROM li GROUP BY 1
      HAVING SUM(CASE WHEN yr = 1995 THEN q ELSE 0 END) > 0
         AND SUM(CASE WHEN yr = 1996 THEN q ELSE 0 END) > 0
    )
    SELECT p_brand,
           CAST(q0 AS BIGINT) AS q0, CAST(q1 AS BIGINT) AS q1,
           CAST(r0 AS BIGINT) AS r0_cents, CAST(r1 AS BIGINT) AS r1_cents,
           CAST((q1 * r0) // q0 - r0 AS BIGINT) AS volume_effect_cents,
           CAST(r1 - (q1 * r0) // q0 AS BIGINT) AS price_effect_cents
    FROM agg
    """,
)
def q_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (price/volume decomposition), 1995→1996 per brand:
    volume effect = revenue at constant unit price for the new volume,
    price effect = the remainder — the two ALWAYS sum to Δrevenue exactly
    because both terms share the single floor division (q1·r0) div q0 on
    exact cent/quantity integers (the float formulation leaks cents and
    never reconciles to the ledger). One three-way join (part broadcasts),
    one grouped aggregate; the bridge arithmetic runs on 25 brand rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1995, 1996))
        .select(
            "p_brand",
            "yr",
            F.col("l_quantity").cast("long").alias("q"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            )
            .cast("long")
            .alias("cents"),
        )
    )
    agg = (
        base.groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("yr") == 1995, F.col("q")).otherwise(0)).alias("q0"),
            F.sum(F.when(F.col("yr") == 1996, F.col("q")).otherwise(0)).alias("q1"),
            F.sum(F.when(F.col("yr") == 1995, F.col("cents")).otherwise(0)).alias(
                "r0"
            ),
            F.sum(F.when(F.col("yr") == 1996, F.col("cents")).otherwise(0)).alias(
                "r1"
            ),
        )
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    const_rev = F.expr("(q1 * r0) div q0")
    return agg.select(
        "p_brand",
        F.col("q0").alias("q0"),
        F.col("q1").alias("q1"),
        F.col("r0").alias("r0_cents"),
        F.col("r1").alias("r1_cents"),
        (const_rev - F.col("r0")).cast("long").alias("volume_effect_cents"),
        (F.col("r1") - const_rev).cast("long").alias("price_effect_cents"),
    )


@_q(
    "q_abc_classes",
    """
    WITH p AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                      AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1
    ),
    c AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS cum,
             SUM(cents) OVER () AS total
      FROM p
    ),
    cls AS (
      SELECT CASE WHEN cum * 5 <= total * 4 THEN 'A'
                  WHEN cum * 20 <= total * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM c
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents) AS DOUBLE)
             / CAST((SELECT SUM(cents) FROM p) AS DOUBLE) AS revenue_share
    FROM cls GROUP BY 1
    """,
)
def q_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    class A = the prefix holding ≤80% of cumulative revenue, B to 95%,
    C the tail — thresholds applied in cross-multiplied integer form
    (cum·5 ≤ total·4) with a (cents DESC, partkey) total order so ties
    can't straddle classes nondeterministically. The cumulative window
    runs over the part aggregate (bounded by part count), not lineitem;
    revenue_share is one integer→double division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
        ).alias("cents")
    )
    wcum = Window.orderBy(F.col("cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    c = p.select(
        "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(wall).alias("total"),
    )
    cls = c.select(
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "total",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").alias("cents"),
        (F.sum("cents").cast("double") / F.max("total").cast("double")).alias(
            "revenue_share"
        ),
    )


@_q(
    "q_segment_migration",
    """
    WITH per AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ),
    tiered AS (
      SELECT o_custkey, yr,
             ((RANK() OVER (PARTITION BY yr ORDER BY cents, o_custkey) - 1)
              * 3) // COUNT(*) OVER (PARTITION BY yr) + 1 AS tier
      FROM per
    ),
    m AS (
      SELECT a.tier AS tier_1995, b.tier AS tier_1996
      FROM tiered a JOIN tiered b
        ON a.o_custkey = b.o_custkey AND a.yr = 1995 AND b.yr = 1996
    )
    SELECT CAST(tier_1995 AS BIGINT) AS tier_1995,
           CAST(tier_1996 AS BIGINT) AS tier_1996,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM m GROUP BY 1, 2
    """,
)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier migration matrix, 1995→1996: customers ranked
    into terciles within each year (the exact integer ((rank−1)·3) div n
    bucketing with a custkey tie-break — deterministic under ties), then
    the year-over-year transition counts. The churn/upsell diagnostic in
    one self-join on custkey; ranking windows partition by year."""
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.withColumn("yr", F.year("o_orderdate"))
        .filter(F.col("yr").isin(1995, 1996))
        .groupBy("o_custkey", "yr")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    w = Window.partitionBy("yr")
    tiered = per.select(
        "o_custkey",
        "yr",
        F.rank().over(w.orderBy("cents", "o_custkey")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    ).select("o_custkey", "yr", F.expr("(rk - 1) * 3 div n + 1").alias("tier"))
    a = tiered.filter(F.col("yr") == 1995).select(
        "o_custkey", F.col("tier").alias("tier_1995")
    )
    b = tiered.filter(F.col("yr") == 1996).select(
        "o_custkey", F.col("tier").alias("tier_1996")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("tier_1995", "tier_1996")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@_q(
    "q_interarrival_histogram",
    """
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate,
                                                       o_orderkey),
                       o_orderdate) AS gap
      FROM orders
    )
    SELECT CASE WHEN gap <= 7 THEN '0-7'
                WHEN gap <= 30 THEN '8-30'
                WHEN gap <= 90 THEN '31-90'
                WHEN gap <= 365 THEN '91-365'
                ELSE '365+' END AS gap_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(min(gap) AS BIGINT) AS min_gap,
           CAST(max(gap) AS BIGINT) AS max_gap
    FROM seq WHERE gap IS NOT NULL
    GROUP BY 1
    """,
)
def q_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival (repurchase-cadence) histogram: day gaps between each
    customer's consecutive orders, bucketed into operational bands. The
    gap multiset is tie-stable — equal-date orders contribute zero-gaps
    regardless of their relative order, and the lag window still carries a
    unique (date, orderkey) tie-break so each PAIRING is reproducible.
    One custkey-partitioned window; integer day arithmetic throughout."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    bucket = (
        F.when(F.col("gap") <= 7, "0-7")
        .when(F.col("gap") <= 30, "8-30")
        .when(F.col("gap") <= 90, "31-90")
        .when(F.col("gap") <= 365, "91-365")
        .otherwise("365+")
    )
    return seq.groupBy(bucket.alias("gap_bucket")).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap"),
        F.max("gap").cast("long").alias("max_gap"),
    )


# ---------------------------------------------------------------------------
# Batch 48 — duplicated-span detection, corpus report card, near-dup
# cluster-size statistics.
# ---------------------------------------------------------------------------


@_q(
    "q_dup_span_detect",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE len(string_split(text, ' ')) >= 5
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(l) - 4),
                    i -> array_to_string(list_slice(l, i, i + 4), ' '))) AS s,
             unnest(generate_series(1, len(l) - 4)) AS pos
      FROM t
    ),
    df AS (
      SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS nd
                     FROM sh GROUP BY 1) WHERE nd >= 2
    ),
    dup AS (
      SELECT sh.doc_id, sh.pos,
             sh.pos - ROW_NUMBER() OVER (PARTITION BY sh.doc_id
                                         ORDER BY sh.pos) AS island
      FROM sh JOIN df USING (s)
    ),
    spans AS (
      SELECT doc_id, island, count(*) + 4 AS span_words
      FROM dup GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_dup_spans,
           CAST(SUM(span_words - 4) AS BIGINT) AS n_dup_positions,
           CAST(max(span_words) AS BIGINT) AS max_span_words
    FROM spans GROUP BY 1
    """,
)
def q_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-SPAN detection — the shuffle-bounded approximation of
    exact substring deduplication (suffix-array dedup à la 'Deduplicating
    Training Data Makes Language Models Better'): positional 5-gram
    shingles, document frequency ≥ 2 marks a position as duplicated, and
    runs of consecutive duplicated positions merge into maximal spans via
    the gaps-and-islands pos − row_number key. Per doc: span count,
    duplicated-position count, longest span in words. Inverted-index
    shuffle on the shingle, window on (doc, pos) — never doc×doc, never a
    corpus-wide suffix array in one memory."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("l")).filter(
        F.size("l") >= 5
    )
    shingles = t.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - 4),
                lambda i: F.array_join(F.slice("l", i, 5), " "),
            )
        ).alias("pos0", "s"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "s")
    df = (
        shingles.groupBy("s")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("s")
    )
    dup = shingles.join(df, "s").select(
        "doc_id",
        "pos",
        (
            F.col("pos")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos"))
        ).alias("island"),
    )
    spans = dup.groupBy("doc_id", "island").agg(
        (F.count(F.lit(1)) + 4).alias("span_words")
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_words") - 4).cast("long").alias("n_dup_positions"),
        F.max("span_words").cast("long").alias("max_span_words"),
    )


@_q(
    "q_corpus_report",
    """
    WITH base AS (
      SELECT doc_id, text, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             len(text) AS n_chars, md5(text) AS h
      FROM documents
    ),
    hashes AS (SELECT h, count(*) AS c FROM base GROUP BY 1)
    SELECT CAST((SELECT count(*) FROM base) AS BIGINT) AS n_docs,
           CAST((SELECT count(DISTINCT source) FROM base) AS BIGINT)
             AS n_sources,
           CAST((SELECT count(DISTINCT lang) FROM base) AS BIGINT) AS n_langs,
           CAST((SELECT SUM(n_tokens) FROM base) AS BIGINT) AS n_tokens,
           CAST((SELECT SUM(n_chars) FROM base) AS BIGINT) AS n_chars,
           CAST((SELECT count(*) FROM hashes) AS BIGINT) AS n_distinct_texts,
           CAST((SELECT COALESCE(SUM(c), 0) FROM hashes WHERE c > 1)
                AS BIGINT) AS n_docs_in_dup_sets,
           CAST((SELECT COALESCE(SUM(c), 0) FROM hashes WHERE c > 1)
                AS DOUBLE) / CAST((SELECT count(*) FROM base) AS DOUBLE)
             AS exact_dup_frac
    """,
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus report card — the dataset-card summary a training
    run starts from: document/source/language cardinalities, token and
    character volume, exact-duplicate accounting via content hash. Every
    number is an exact integer except the final single-division dup
    fraction. Three partial-aggregatable passes (base stats, hash
    groupBy, distinct counts) joined as broadcast scalars."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    hashes = base.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    hstats = hashes.agg(
        F.count(F.lit(1)).alias("n_distinct_texts"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
        )
        .cast("long")
        .alias("n_docs_in_dup_sets"),
    )
    return (
        stats.crossJoin(F.broadcast(hstats))
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "n_tokens",
            "n_chars",
            "n_distinct_texts",
            "n_docs_in_dup_sets",
            (
                F.col("n_docs_in_dup_sets").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("exact_dup_frac"),
        )
    )


@_q(
    "q_cluster_size_stats",
    f"""
    WITH g AS ({_NEARDUP_GROUPS_ORACLE}),
    sizes AS (SELECT group_id, count(*) AS size FROM g GROUP BY 1)
    SELECT CAST(size AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(SUM(size - 1) AS BIGINT) AS n_removable_docs
    FROM sizes GROUP BY 1
    """,
)
def q_cluster_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution — the dedup planning view: for
    each connected-component size, how many clusters exist and how many
    documents a keep-one policy would remove (Σ(size−1)). Reuses the
    MinHash-LSH pair graph + min-label components (q_dedup_groups); the
    histogram is two tiny aggregates over the component assignment."""
    from etl_pipeline_project_spark.operators.dedup_text import (
        minhash_lsh_pairs,
        neardup_groups,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_distance_threshold=0.4)
    groups = neardup_groups(pairs)
    sizes = groups.groupBy("group_id").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy(F.col("size").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("size") - 1).cast("long").alias("n_removable_docs"),
    )


# ---------------------------------------------------------------------------
# Batch 49 — normalized dedup, session path mining, peak detection, VWAP,
# run-length history compression.
# ---------------------------------------------------------------------------


@_q(
    "q_dedup_normalized",
    """
    WITH n AS (
      SELECT doc_id,
             md5(text) AS h_raw,
             md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS h_norm
      FROM documents
    ),
    raw_d AS (SELECT count(*) - count(DISTINCT h_raw) AS extra FROM n),
    norm_d AS (SELECT count(*) - count(DISTINCT h_norm) AS extra FROM n)
    SELECT CAST((SELECT count(*) FROM n) AS BIGINT) AS n_docs,
           CAST((SELECT extra FROM raw_d) AS BIGINT) AS n_raw_dups,
           CAST((SELECT extra FROM norm_d) AS BIGINT) AS n_norm_dups,
           CAST((SELECT extra FROM norm_d) - (SELECT extra FROM raw_d)
                AS BIGINT) AS n_extra_from_normalization
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-aware exact dedup: content hashing after
    case-folding + whitespace collapapse finds the near-identical copies
    raw byte hashing misses (the standard first normalization rung of a
    web-corpus dedup ladder, before shingle methods take over). Reports
    raw-hash vs normalized-hash duplicate counts and the delta — each an
    exact count-distinct over md5, two partial-aggregatable passes."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select(
        F.md5(F.col("text").cast("binary")).alias("h_raw"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("text"), " +", " ")).cast("binary")
        ).alias("h_norm"),
    )
    agg = n.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("h_raw")).alias("n_raw_dups"),
        (F.count(F.lit(1)) - F.countDistinct("h_norm")).alias("n_norm_dups"),
    )
    return agg.select(
        "n_docs",
        "n_raw_dups",
        "n_norm_dups",
        (F.col("n_norm_dups") - F.col("n_raw_dups")).alias(
            "n_extra_from_normalization"
        ),
    )


@_q(
    "q_session_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM seq WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY 1
    """,
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-path mining: each user's first three events as an ordered
    '>'-joined path, counted across users — the onboarding-flow analysis
    (which openings lead where). Ordering is total ((ts, event_id)
    tie-break), and reassembly uses the deterministic
    array_sort(collect_list(struct(rn, type))) fold, so the path strings
    are reproducible under distribution. One user_id exchange shared by
    the window and the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = seq.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


@_q(
    "q_peak_detect",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    w AS (
      SELECT day, cents,
             lag(cents) OVER (ORDER BY day) AS prev,
             lead(cents) OVER (ORDER BY day) AS nxt
      FROM daily
    )
    SELECT day, CAST(cents AS BIGINT) AS cents,
           CASE WHEN cents > prev AND cents > nxt THEN 'peak'
                WHEN cents < prev AND cents < nxt THEN 'trough'
                ELSE 'none' END AS extremum
    FROM w WHERE prev IS NOT NULL AND nxt IS NOT NULL
    """,
)
def q_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-extremum detection on the daily revenue series: a day is a
    peak (trough) when strictly above (below) both neighbors — lag/lead
    over the aggregated daily table in exact cents, so the comparisons
    are integer and the labels deterministic. Boundary days (no both-side
    neighbors) are excluded. The window runs over the distinct-day table,
    bounded by the calendar, not the event count."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    x = daily.select(
        "day",
        "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("nxt"),
    ).filter(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    return x.select(
        "day",
        "cents",
        F.when((F.col("cents") > F.col("prev")) & (F.col("cents") > F.col("nxt")), "peak")
        .when((F.col("cents") < F.col("prev")) & (F.col("cents") < F.col("nxt")), "trough")
        .otherwise("none")
        .alias("extremum"),
    )


@_q(
    "q_vwap",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS BIGINT)
             AS notional_num,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
             AS vwap_cents
    FROM lineitem GROUP BY 1
    """,
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price: Σ(price·qty)/Σ(qty) with BOTH sums
    accumulated as exact int64 (cents × integral quantities) and the
    division applied once at the end — the weighted mean that stays
    bit-identical across engines and partial orders (a running float VWAP
    drifts). One map-side-combinable aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qty = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.sum(cents * qty).alias("notional_num"),
        F.sum(qty).alias("volume"),
        (F.sum(cents * qty).cast("double") / F.sum(qty).cast("double")).alias(
            "vwap_cents"
        ),
    )


@_q(
    "q_history_compress",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_t
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, rn - rn_t AS island,
             count(*) AS run_len,
             min(ts) AS run_start, max(ts) AS run_end
      FROM seq GROUP BY 1, 2, 3
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(SUM(run_len) AS BIGINT) AS n_events,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_runs_ge3
    FROM runs GROUP BY 1
    """,
)
def q_history_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length compression of per-user event streams: maximal runs of
    the same event_type collapse to (start, end, length) via the two-
    row_number islands key (rn − rn_per_type is constant within a run) —
    the state-history compaction every SCD/data-vault pipeline applies
    before storing change records. Output is the per-user compression
    report: run count vs raw event count (the compression ratio), longest
    run, runs ≥ 3. One user_id exchange carries both windows and the
    aggregates; all integers."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("island"),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_events"),
        F.max("run_len").cast("long").alias("longest_run"),
        F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0))
        .cast("long")
        .alias("n_runs_ge3"),
    )


# ---------------------------------------------------------------------------
# Batch 50 — binary-file source, nearest-direction as-of join, gains/lift
# table, keyset pagination.
# ---------------------------------------------------------------------------


@_q(
    "q_scan_binaryfile",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(SUM(len(text)) AS BIGINT) AS total_bytes,
           CAST(max(len(text)) AS BIGINT) AS max_bytes
    FROM documents WHERE doc_id % 50 = 0 GROUP BY 1
    """,
)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source — the opaque-blob ingestion edge for multimodal
    corpora (image/audio payloads enter as whole-file binary + metadata,
    SURVEY north-star): documents are staged one file per doc named
    `<source>__<doc_id>.bin`, read back via `format("binaryFile")`, and
    the (path, length, content) records must reconcile byte-for-byte with
    the table of origin. The ASCII corpus makes length(text) the exact
    byte count. File-granular parallelism is the scale story — each blob
    is one task input, no line-splitting assumptions."""
    import hashlib
    import os

    # deterministic 1-in-50 sample keeps the per-file fixture bounded at
    # every sf (blob-store staging cost, not an engine property)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)

    def _build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        # one file per doc: filename carries (source, doc_id); written once
        # per dataset fingerprint via the driver-side loop ONLY because the
        # local FS sink for per-record files is the fixture itself — a real
        # deployment writes blobs from executors (foreachPartition)
        for r in docs.select("doc_id", "source", "text").toLocalIterator():
            with open(f"{tmp}/{r['source']}__{r['doc_id']}.bin", "wb") as fh:
                fh.write(r["text"].encode("ascii"))

    # atomic publish: an interrupted first run leaves an orphaned tmp dir,
    # never a partial blob set silently reused by later runs
    base = _staged_fixture("blob_stage", _fp_tag(sf_dir, "documents"), _build)
    back = spark.read.format("binaryFile").load(base)
    parsed = back.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"^(.+?)__", 1
        ).alias("source"),
        F.col("length"),
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("length").cast("long").alias("total_bytes"),
        F.max("length").cast("long").alias("max_bytes"),
    )


@_q(
    "q_join_asof_nearest",
    """
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, ts AS pts, event_id AS pid FROM events
      WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT c.user_id, c.event_id, p.pid,
             abs(epoch_us(c.ts) - epoch_us(p.pts)) // 1000000 AS gap_s,
             abs(epoch_us(c.ts) - epoch_us(p.pts)) AS gap_us
      FROM clicks c JOIN purch p ON c.user_id = p.user_id
      WHERE abs(epoch_us(c.ts) - epoch_us(p.pts)) <= 86400000000
    ),
    best AS (
      SELECT user_id, event_id, pid, gap_s,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY gap_us, pid) AS rn
      FROM cand
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS click_id,
           CAST(pid AS BIGINT) AS nearest_purchase_id,
           CAST(gap_s AS BIGINT) AS gap_seconds
    FROM best WHERE rn = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join with tolerance — each click matched to
    the closest purchase by the same user within ±1 day (backward asof is
    q_join_asof; forward-lag analysis is q_time_to_convert; this key
    completes the direction matrix). Plan: user-equi join bounds the pair
    blow-up to within-user pairs, the tolerance predicate prunes, and a
    (gap, id)-ordered row_number picks one winner deterministically even
    when a click sits exactly between two purchases. Integer-second
    arithmetic throughout."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    gap_us = F.abs(F.unix_micros("cts") - F.unix_micros("pts"))
    cand = clicks.join(purch, clicks.user_id == purch.pu).select(
        "user_id",
        "click_id",
        "pid",
        F.expr("abs(unix_micros(cts) - unix_micros(pts)) div 1000000").alias("gap_s"),
        gap_us.alias("gap_us"),
    ).filter(F.col("gap_us") <= 86400000000)
    w = Window.partitionBy("click_id").orderBy("gap_us", "pid")
    return (
        cand.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "click_id",
            F.col("pid").alias("nearest_purchase_id"),
            F.col("gap_s").alias("gap_seconds"),
        )
    )


@_q(
    "q_gains_table",
    """
    WITH x AS (
      SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT y,
             ((RANK() OVER (ORDER BY v DESC, event_id) - 1) * 10)
               // COUNT(*) OVER () + 1 AS decile
      FROM x
    ),
    d AS (
      SELECT decile, count(*) AS n, SUM(y) AS pos FROM ranked GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n,
           CAST(pos AS BIGINT) AS n_pos,
           CAST(SUM(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           CAST(SUM(pos) OVER (ORDER BY decile) AS DOUBLE)
             / CAST(SUM(pos) OVER () AS DOUBLE) AS cum_capture
    FROM d
    """,
)
def q_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table — the decile view of ranking quality that pairs
    with q_auc_roc: rows ranked by score descending, cut into exact
    integer deciles ((rank−1)·10 div n, tie-stable with the event_id
    tie-break), positives counted per decile with cumulative capture
    rate. A well-ranked model front-loads positives; cum_capture is the
    one float, a single integer division per row of a 10-row table."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = ev.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        "event_id",
    )
    w = Window.orderBy(F.col("v").desc(), "event_id")
    ranked = x.select(
        "y",
        F.rank().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).select("y", F.expr("(rk - 1) * 10 div n + 1").alias("decile"))
    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return d.select(
        "decile",
        "n",
        F.col("pos").cast("long").alias("n_pos"),
        F.sum("pos").over(wcum).cast("long").alias("cum_pos"),
        (
            F.sum("pos").over(wcum).cast("double")
            / F.sum("pos").over(wall).cast("double")
        ).alias("cum_capture"),
    )


@_q(
    "q_keyset_pagination",
    """
    WITH ordered AS (
      SELECT o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT CAST((rn - 1) // 50 + 1 AS BIGINT) AS page,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS first_key_by_id,
           CAST(max(o_totalprice) AS DOUBLE) AS top_price
    FROM ordered WHERE rn <= 150 GROUP BY 1
    """,
)
def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination over a total order: the first three
    50-row pages of orders by (totalprice DESC, orderkey). The total order
    is what makes every page stable and gap-free — OFFSET pagination over
    a non-total order duplicates/drops rows between requests. The rn ≤ 150
    prefix compiles to a rank-limited window (WindowGroupLimit pushes the
    top-N into the sort, never materializing the full ranked table) — the
    at-scale seek story. Page summary per page keeps the contract
    compact."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    ordered = orders.select(
        "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 150)
    return ordered.groupBy(F.expr("(rn - 1) div 50 + 1").alias("page")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("first_key_by_id"),
        F.max("o_totalprice").alias("top_price"),
    )


# ---------------------------------------------------------------------------
# Batch 51 — INTERSECT ALL, linear multi-touch attribution, seasonality
# index, ML feature assembly.
# ---------------------------------------------------------------------------


@_q(
    "q_set_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each nation appears min(c_count,
    s_count) times (q_set_intersect is the distinct form; q_set_except_all
    already covers EXCEPT ALL, so this completes the bag set-op matrix).
    Engines implement it as a counted semi-structure, not row pairing —
    one shuffle per side on the key."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersectAll(supp)


@_q(
    "q_attribution_linear",
    """
    WITH p AS (
      SELECT user_id, ts AS pts, event_id AS pid,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    t AS (
      SELECT user_id, ts AS tts, event_id AS tid, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    touches AS (
      SELECT p.pid, p.cents, t.event_type, t.tid,
             count(*) OVER (PARTITION BY p.pid) AS n_touch,
             ROW_NUMBER() OVER (PARTITION BY p.pid
                                ORDER BY t.tts, t.tid) AS rn
      FROM p JOIN t ON p.user_id = t.user_id
       AND t.tts <= p.pts
       AND epoch_us(p.pts) - epoch_us(t.tts) <= 86400000000
    ),
    split AS (
      SELECT event_type,
             cents // n_touch
               + CASE WHEN rn <= cents % n_touch THEN 1 ELSE 0 END
               AS share_cents
      FROM touches
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(SUM(share_cents) AS BIGINT) AS attributed_cents
    FROM split GROUP BY 1
    """,
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution — each purchase's cents split evenly
    across its qualifying touches (clicks/views in the prior 24h), with
    the largest-remainder rule assigning the leftover cents to the
    earliest touches so every purchase's attribution sums to its revenue
    EXACTLY (the float 1/n split leaks cents; q_attribution_last_touch is
    the winner-takes-all contrast). The touch join is user-equi +
    time-band — within-user pair blow-up only; the per-purchase windows
    share one pid partition."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        "event_type",
    )
    touches = p.join(
        t,
        (F.col("pu") == F.col("user_id"))
        & (F.col("tts") <= F.col("pts"))
        & (F.unix_micros("pts") - F.unix_micros("tts") <= 86400000000),
    ).select("pid", "cents", "event_type", "tid", "tts")
    w = Window.partitionBy("pid")
    counted = touches.select(
        "event_type",
        "cents",
        F.count(F.lit(1)).over(w).alias("n_touch"),
        F.row_number().over(w.orderBy("tts", "tid")).alias("rn"),
    )
    share = F.expr("cents div n_touch") + F.when(
        F.col("rn") <= F.expr("cents % n_touch"), 1
    ).otherwise(0)
    return counted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(share).cast("long").alias("attributed_cents"),
    )


@_q(
    "q_seasonality_index",
    """
    WITH d AS (
      SELECT dayofweek(o_orderdate) + 1 AS dow,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ),
    g AS (
      SELECT dow, count(*) AS n, SUM(cents) AS s FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(s) AS ts FROM g)
    SELECT CAST(dow AS BIGINT) AS dow,
           CAST(n AS BIGINT) AS n_orders,
           CAST(s AS BIGINT) AS cents,
           CAST(s * tn AS DOUBLE) / CAST(n * ts AS DOUBLE)
             AS seasonality_index
    FROM g, tot
    """,
)
def q_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: (day's mean order value) / (overall
    mean), computed as the single division (s·tn)/(n·ts) of two exact
    integer products — no intermediate float means, so the index is
    bit-identical under any accumulation order. Index ≈ 1 everywhere on
    uniform synthetic data; the operator's value is the exact-ratio
    pattern itself. One 7-row aggregate + broadcast scalar."""
    orders = load_table(spark, sf_dir, "orders")
    # Spark dayofweek is 1-based (Sun=1); the oracle's DuckDB dayofweek+1
    # matches it
    d = orders.select(
        F.dayofweek("o_orderdate").alias("dow"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    g = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    tot = g.agg(F.sum("n").alias("tn"), F.sum("s").alias("ts"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("n").alias("n_orders"),
            F.col("s").alias("cents"),
            (
                (F.col("s") * F.col("tn")).cast("double")
                / (F.col("n") * F.col("ts")).cast("double")
            ).alias("seasonality_index"),
        )
    )


@_q(
    "q_feature_assembly",
    """
    WITH mx AS (SELECT max(o_orderdate) AS gmax FROM orders),
    f AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT gmax FROM mx)) AS recency_days,
             count(*) AS frequency,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS monetary_cents,
             date_diff('day', min(o_orderdate), max(o_orderdate))
               AS tenure_days,
             count(DISTINCT year(o_orderdate)) AS n_active_years,
             SUM(CASE WHEN o_orderdate >= DATE '1999-01-01'
                      THEN 1 ELSE 0 END) AS n_recent_orders
      FROM orders GROUP BY 1
    )
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary_cents AS BIGINT) AS monetary_cents,
           CAST(tenure_days AS BIGINT) AS tenure_days,
           CAST(n_active_years AS BIGINT) AS n_active_years,
           CAST(n_recent_orders AS BIGINT) AS n_recent_orders
    FROM f
    """,
)
def q_feature_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity ML feature assembly — the wide feature table a churn/LTV
    model trains on: recency, frequency, exact-cent monetary, tenure,
    active-year count, recent-window activity, all from ONE grouped pass
    over the fact table (every feature is a partial-aggregatable
    expression — no per-feature scans, no joins except the broadcast
    global-max scalar). Integer features end-to-end: reproducible
    training data under any cluster layout."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("gmax"))
    f = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("gmax"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "monetary_cents"
            ),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias(
                "tenure_days"
            ),
            F.countDistinct(F.year("o_orderdate")).alias("n_active_years"),
            F.sum(
                F.when(
                    F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"), 1
                ).otherwise(0)
            ).alias("n_recent_orders"),
        )
    )
    return f.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        F.col("recency_days").cast("long").alias("recency_days"),
        "frequency",
        "monetary_cents",
        F.col("tenure_days").cast("long").alias("tenure_days"),
        "n_active_years",
        F.col("n_recent_orders").cast("long").alias("n_recent_orders"),
    )


# ---------------------------------------------------------------------------
# Batch 52 — CEP pattern matching, inverted-index stats, daily percentile
# bands, language-ID evaluation.
# ---------------------------------------------------------------------------


@_q(
    "q_pattern_match_triple",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_matches
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY 1
    """,
)
def q_pattern_match_triple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern matching (MATCH_RECOGNIZE semantics, strict
    contiguity): occurrences of the exact consecutive view→click→purchase
    triple in each user's event stream, via two lead() offsets on one
    totally-ordered window — the funnel keys allow intervening events;
    this is the strict-sequence CEP contract. One user_id exchange; the
    pattern test is a row-local predicate, so 10^12 events cost one
    window pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


@_q(
    "q_inverted_index_stats",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    per_doc AS (
      SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    stats AS (
      SELECT term,
             count(*) AS df,
             SUM(tf) AS cf,
             max(tf) AS max_tf
      FROM per_doc GROUP BY 1
    )
    SELECT term, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
           CAST(max_tf AS BIGINT) AS max_tf
    FROM stats
    ORDER BY df DESC, term LIMIT 50
    """,
)
def q_inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index build statistics — the posting-list metadata (document
    frequency, collection frequency, max term frequency) a BM25/impact
    index stores per term, computed with the two-level aggregate that
    keeps everything map-side combinable: (term, doc) partial counts
    collapse before the term-level rollup. Top-50 by (df, term) total
    order; at corpus scale the full stats table IS the index metadata —
    this key bounds the contract output, not the plan."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.max("tf").cast("long").alias("max_tf"),
    )
    return stats.orderBy(F.col("df").desc(), "term").limit(50)


@_q(
    "q_daily_percentile_bands",
    """
    WITH x AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT day, v, count(*) AS c FROM x GROUP BY 1, 2
    ),
    cum AS (
      SELECT day, v,
             SUM(c) OVER (PARTITION BY day ORDER BY v) AS cumc,
             SUM(c) OVER (PARTITION BY day) AS n
      FROM counts
    )
    SELECT day,
           CAST(min(CASE WHEN cumc * 2 >= n THEN v END) AS BIGINT) AS p50,
           CAST(min(CASE WHEN cumc * 20 >= n * 19 THEN v END) AS BIGINT)
             AS p95,
           CAST(max(n) AS BIGINT) AS n_values
    FROM cum GROUP BY 1
    """,
)
def q_daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p95 bands over the value series — the SLO/latency
    dashboard primitive, computed with the count-based discrete-percentile
    plan PARTITIONED BY DAY (distinct values per day collapse map-side;
    the cumulative window and the CDF rule 2·cum ≥ n run per-day in exact
    integers — no per-group sort buffering, the same scale posture as
    q_percentile_disc). Day count bounds the output."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v"),
    )
    counts = x.groupBy("day", "v").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("day")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("day")
    cum = counts.select(
        "day",
        "v",
        F.sum("c").over(wcum).alias("cumc"),
        F.sum("c").over(wall).alias("n"),
    )
    return cum.groupBy("day").agg(
        F.min(F.when(F.col("cumc") * 2 >= F.col("n"), F.col("v"))).alias("p50"),
        F.min(F.when(F.col("cumc") * 20 >= F.col("n") * 19, F.col("v"))).alias(
            "p95"
        ),
        F.max("n").cast("long").alias("n_values"),
    )


@_q(
    "q_langid_eval",
    None,  # oracle attached after definition (composes q_text_lang_id's SQL)
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation against the corpus ground-truth labels: the
    predicted×actual confusion matrix plus per-cell counts — the
    model-quality loop for the heuristic classifier (q_text_lang_id emits
    predictions; this key grades them). Exact counts; accuracy derives
    as the diagonal share downstream. One grouped aggregate over the
    map-only predictor."""
    from etl_pipeline_project_spark.operators.text_analysis import lang_id

    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select("lang", lang_id("text").alias("lang_pred"))
    return pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


# compose the evaluation oracle from the registered lang-ID twin
ORACLE["q_langid_eval"] = f"""
    WITH pred AS ({ORACLE["q_text_lang_id"]})
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Batch 53 — bucketed shuffle-free aggregation, salted skew aggregation,
# dynamic partition pruning, streaming checkpoint resume.
# ---------------------------------------------------------------------------


@_q(
    "q_agg_bucketed",
    """
    SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
    FROM (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
          FROM lineitem GROUP BY 1)
    GROUP BY 1
    """,
)
def q_agg_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free aggregation on a bucketed table: lineitem bucketed on
    l_orderkey (the same amortized layout q_join_bucketed builds) lets the
    per-orderkey groupBy run with NO exchange — bucket files already
    partition by the grouping key, so each task aggregates its buckets
    locally. The only shuffle left is the 7-row histogram rollup. The
    write-once-aggregate-forever layout is how a 100 TB fact table serves
    keyed aggregations interactively."""
    import hashlib

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    tag = _fp_tag(sf_dir, "lineitem")
    t_li = f"bq_lineitem_{tag}"
    if not spark.catalog.tableExists(t_li):
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).option("path", f"{_SCRATCH}/{t_li}").saveAsTable(t_li)
    per_key = (
        spark.table(t_li)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return per_key.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))


@_q(
    "q_agg_salted_skew",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events WHERE value IS NOT NULL GROUP BY 1
    """,
)
def q_agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation for skewed keys: phase 1 groups on
    (key, salt=hash%16) so a hot key's rows spread over 16 reducers, phase
    2 merges the ≤16 partials per key. Counts and integer cents merge
    exactly, so the result is identical to the direct aggregate (the
    oracle) — the manual fallback when one key holds 30% of 100 TB and
    even map-side combine leaves a straggler reducer. Spark's partial
    aggregation makes this redundant for algebraic aggregates; the
    pattern matters for the holistic ones (collect/median), and this key
    pins its correctness."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100, 0).cast("long")
    salted = ev.select(
        "event_type",
        F.pmod(F.hash("event_id"), F.lit(16)).alias("salt"),
        cents.alias("cents"),
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("cents").alias("pc")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n"),
        F.sum("pc").cast("long").alias("cents"),
    )


@_q(
    "q_join_dpp",
    f"""
    SELECT year(o_orderdate) AS yr,
           CAST(count(*) AS BIGINT) AS n_orders,
           {_msum('o_totalprice')} AS total
    FROM orders WHERE year(o_orderdate) IN (1996, 1999)
    GROUP BY 1
    """,
)
def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out partitioned
    by year; the filter arrives through a JOIN against a tiny year dim
    (filtered to 2 of 7 years), so static pruning can't apply — the
    runtime DPP subquery broadcasts the dim's year set into the fact scan
    and only 2/7 partitions are read (plan shows
    `dynamicpruningexpression` in PartitionFilters). THE mechanism that
    turns star-schema date filters into partition skips on a 100 TB
    fact."""
    import hashlib
    import os

    orders = load_table(spark, sf_dir, "orders")
    tag = _fp_tag(sf_dir, "orders")
    base = f"{_SCRATCH}/orders_by_year_{tag}"
    if not os.path.exists(base):
        orders.withColumn("yr", F.year("o_orderdate")).write.partitionBy(
            "yr"
        ).mode("overwrite").parquet(base)
    fact = spark.read.parquet(base)
    dim = (
        fact.select("yr")
        .distinct()
        .filter(F.col("yr").isin(1996, 1999))
        .select(F.col("yr").alias("dim_yr"))
    )
    joined = fact.join(F.broadcast(dim), fact.yr == F.col("dim_yr"))
    return joined.groupBy(F.col("yr").cast("int").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )


@_q(
    "q_stream_checkpoint_resume",
    "SELECT event_id, user_id, event_type FROM events",
)
def q_stream_checkpoint_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed streaming RESUME — the exactly-once-across-restarts
    contract: run 1 ingests the first file batch into a parquet sink with
    a durable checkpoint; new files land; run 2 starts from the SAME
    checkpoint and processes ONLY the new files (the file-source log
    remembers what's consumed — the reference's 'which staged CSVs did I
    already load' convention, `data/transformation_db.py:91-121`, made
    crash-safe). The sink must hold every event exactly once afterward;
    a third run adds nothing. This is the durability story q_stream_*'s
    in-memory sinks don't exercise."""
    import hashlib
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/stream_ckpt_{tag}"
    stage, ckpt, sink = f"{base}/stage", f"{base}/ckpt", f"{base}/sink"

    def run_stream() -> None:
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(stage)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if not os.path.exists(base):
        # batch 1 arrives, stream consumes it
        ev.filter(F.col("user_id") <= 75).write.mode("overwrite").parquet(stage)
        run_stream()
        # batch 2 lands later; resumed stream must process ONLY these files
        ev.filter(F.col("user_id") > 75).write.mode("append").parquet(stage)
        run_stream()
    # idempotence under re-invocation: no new files -> no new rows
    run_stream()
    return spark.read.parquet(sink)


# ---------------------------------------------------------------------------
# Batch 54 — map-lambda suite, SQL-registered pandas UDF, high-watermark
# incremental load, dead-letter routing.
# ---------------------------------------------------------------------------


@_q(
    "q_lambda_map_suite",
    """
    WITH a AS (
      SELECT o_custkey AS custkey,
             list_sort(list_distinct(list(o_orderpriority))) AS ks
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT custkey, ks,
             list_transform(ks, k -> len(k)) AS vs
      FROM a
    )
    SELECT custkey,
           array_to_string(list_transform(list_zip(ks, vs),
             z -> z[1] || '=' || CAST(z[2] * 2 AS VARCHAR)), ',')
             AS doubled_entries,
           COALESCE(array_to_string(
             list_sort(list_filter(ks, k -> k LIKE '%URGENT%')), ','), '')
             AS urgent_keys,
           CAST(len(ks) AS BIGINT) AS n_keys
    FROM m
    """,
)
def q_lambda_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order functions — transform_values / map_filter /
    map_keys over a per-customer map built with map_from_arrays, emitted
    as canonical sorted entry strings (maps have no cross-engine physical
    order; the entry-string projection is the portable contract, mirrored
    in DuckDB via zipped-list lambdas). All lambdas codegen inside
    Catalyst; one shuffle for the collect_set."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("ks")
    )
    m = a.select(
        "custkey",
        "ks",
        F.map_from_arrays(
            "ks", F.transform("ks", lambda k: F.length(k))
        ).alias("mp"),
    )
    doubled = F.transform_values(F.col("mp"), lambda k, v: v * 2)
    entries = F.transform(
        F.map_entries(doubled),
        lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
    )
    urgent = F.map_filter(F.col("mp"), lambda k, v: k.like("%URGENT%"))
    return m.select(
        "custkey",
        F.array_join(F.array_sort(entries), ",").alias("doubled_entries"),
        F.array_join(F.array_sort(F.map_keys(urgent)), ",").alias("urgent_keys"),
        F.size(F.map_keys("mp")).cast("long").alias("n_keys"),
    )


@_q(
    "q_udf_sql_registered",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT) % 97) AS BIGINT)
             AS mod_sum
    FROM events WHERE value IS NOT NULL GROUP BY 1
    """,
)
def q_udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF registered into the SQL function catalog
    (spark.udf.register) and invoked from a SQL string — the path by
    which pure-SQL users reach Python extensions. The UDF body is
    Arrow-batched numpy (cents % 97 — deterministic integer), never
    row-at-a-time; the oracle reproduces the arithmetic natively. One
    grouped aggregate over the UDF column."""
    from etl_pipeline_project_spark.functions.udfs import cents_mod97_udf

    spark.udf.register("cents_mod97", cents_mod97_udf)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_udfreg")
    return spark.sql(
        """
        SELECT event_type, COUNT(*) AS n,
               SUM(cents_mod97(value)) AS mod_sum
        FROM events_udfreg WHERE value IS NOT NULL GROUP BY event_type
        """
    )


@_q(
    "q_incremental_watermark",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (ts >= TIMESTAMP '2024-01-20 00:00:00')
                AS BIGINT) AS n_batch2,
           CAST(0 AS BIGINT) AS n_batch3
    FROM events
    """,
)
def q_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental loading — the OTHER incremental pattern
    (q_join_anti_incremental / q_ops_load_incremental key on IDs; this
    keys on a monotonic timestamp): each run loads only rows with ts >
    stored watermark, then advances the watermark to max(ts). Run 1 takes
    the backlog (< Jan 20), run 2 the remainder, run 3 NOTHING — the
    target ends exactly once per event and the third-run count is the
    idempotence proof. Watermark state is one scalar row, the cheapest
    possible incremental bookkeeping at 100 TB."""
    import hashlib
    import json
    import os

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")

    def watermark(state: str) -> str | None:
        if not os.path.exists(f"{state}/watermark.json"):
            return None
        with open(f"{state}/watermark.json") as fh:
            return json.load(fh)["max_ts"]

    def advance(df: DataFrame, state: str) -> int:
        wm = watermark(state)
        new = df if wm is None else df.filter(
            F.col("ts") > F.lit(wm).cast("timestamp")
        )
        n = new.count()
        if n:
            new.write.mode("append").parquet(f"{state}/target")
            mx = new.agg(F.max("ts")).first()[0]
            os.makedirs(state, exist_ok=True)
            with open(f"{state}/watermark.json", "w") as fh:
                json.dump({"max_ts": str(mx)}, fh)
        return n

    def _build(tmp: str) -> None:
        # runs 1+2 stage into a private dir and publish atomically — a
        # crash between them can never leave a half-advanced watermark
        # behind, and concurrent processes can't double-append the backlog
        advance(ev.filter(F.col("ts") < cut), tmp)  # run 1: backlog
        advance(ev, tmp)  # run 2: only rows past the watermark survive

    base = _staged_fixture("wm_incr", _fp_tag(sf_dir, "events"), _build)
    n3 = advance(ev, base)  # run 3: nothing new
    loaded = spark.read.parquet(f"{base}/target")
    return loaded.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("long")
        .alias("n_batch2"),
    ).select("n_total", "n_batch2", F.lit(n3).cast("long").alias("n_batch3"))


@_q(
    "q_dead_letter_route",
    """
    WITH routed AS (
      SELECT CASE
               WHEN value IS NULL THEN 'dlq:null_value'
               WHEN value < 0 THEN 'dlq:negative'
               WHEN event_type NOT IN ('view','click','purchase',
                                       'signup','error')
                 THEN 'dlq:unknown_type'
               ELSE 'clean'
             END AS route
      FROM events
    )
    SELECT route, CAST(count(*) AS BIGINT) AS n_rows
    FROM routed GROUP BY 1
    """,
)
def q_dead_letter_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing — semantic-validation triage (the complement of
    q_scan_csv_permissive's parse-level quarantine): every row is assigned
    exactly one route by a first-match rule cascade (null value → negative
    → unknown type → clean), so clean + DLQ partitions always sum to the
    input and nothing is silently dropped. One map-side classification +
    grouped count; in production each route becomes a partition of the
    DLQ sink."""
    ev = load_table(spark, sf_dir, "events")
    route = (
        F.when(F.col("value").isNull(), "dlq:null_value")
        .when(F.col("value") < 0, "dlq:negative")
        .when(
            ~F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            ),
            "dlq:unknown_type",
        )
        .otherwise("clean")
    )
    return ev.groupBy(route.alias("route")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


# ---------------------------------------------------------------------------
# Batch 55 — per-entity caps, leave-one-out target encoding, profile
# drift, bounce rate.
# ---------------------------------------------------------------------------


@_q(
    "q_per_user_cap",
    """
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_input,
           CAST(count(*) FILTER (rn <= 5) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (rn > 5) AS BIGINT) AS n_capped,
           CAST(count(DISTINCT (user_id, day)) AS BIGINT) AS n_user_days
    FROM ranked
    """,
)
def q_per_user_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity rate capping — keep at most K=5 records per (user, day),
    earliest-first: the contributor/domain cap every training-data
    pipeline applies so one prolific source can't dominate the corpus
    (and the API-throttle shape in event pipelines). Selection is a
    row_number over the (entity, day) partition with a total (ts,
    event_id) order — deterministic survivors, exact kept/capped
    accounting. One shuffle on the cap key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    ranked = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        F.row_number().over(w).alias("rn"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("rn") <= 5, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") > 5, 1).otherwise(0))
        .cast("long")
        .alias("n_capped"),
        F.countDistinct("user_id", "day").alias("n_user_days"),
    )


@_q(
    "q_target_encode_loo",
    """
    WITH x AS (
      SELECT event_id, event_type,
             CASE WHEN value IS NOT NULL AND value > 50 THEN 1 ELSE 0 END
               AS y
      FROM events
    ),
    g AS (
      SELECT event_type, SUM(y) AS sum_y, count(*) AS n
      FROM x GROUP BY 1
    )
    SELECT x.event_id, x.event_type,
           CAST(x.y AS BIGINT) AS y,
           CAST(g.sum_y - x.y AS BIGINT) AS loo_num,
           CAST(g.n - 1 AS BIGINT) AS loo_den,
           CAST(g.sum_y - x.y AS DOUBLE) / CAST(g.n - 1 AS DOUBLE)
             AS loo_encoding
    FROM x JOIN g USING (event_type)
    """,
)
def q_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical
    feature: each row's category is encoded as the target mean of all
    OTHER rows in that category, (Σy − yᵢ)/(n − 1). The naive mean leaks
    the row's own label into its feature; LOO is the standard fix, and it
    costs just one grouped aggregate + a broadcastable join back (the
    category table is small by construction). Numerator/denominator stay
    integer; the encoding is one division per row."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("value").isNotNull() & (F.col("value") > 50), 1)
        .otherwise(0)
        .alias("y"),
    )
    g = x.groupBy("event_type").agg(
        F.sum("y").alias("sum_y"), F.count(F.lit(1)).alias("n")
    )
    j = x.join(F.broadcast(g), "event_type")
    num = F.col("sum_y") - F.col("y")
    den = F.col("n") - 1
    return j.select(
        "event_id",
        "event_type",
        F.col("y").cast("long").alias("y"),
        num.cast("long").alias("loo_num"),
        den.cast("long").alias("loo_den"),
        (num.cast("double") / den.cast("double")).alias("loo_encoding"),
    )


@_q(
    "q_profile_drift",
    """
    WITH a AS (
      SELECT 'h1' AS half, count(*) AS n,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents,
             count(*) - count(value) AS n_null
      FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
      UNION ALL
      SELECT 'h2', count(*),
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)),
             count(*) - count(value)
      FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
    )
    SELECT half, CAST(n AS BIGINT) AS n_rows,
           CAST(cents AS BIGINT) AS cents,
           CAST(n_null AS BIGINT) AS n_null,
           CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents
    FROM a
    """,
)
def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal profile drift — the monitoring table that catches
    distribution shift between ingestion windows: per half-month window,
    row volume, exact cent totals, null counts and the derived mean
    (single division). Pairs with q_ks_test (which grades the shift);
    this key is the cheap always-on profile a 100 TB pipeline logs per
    batch. Two filtered aggregates over one scan each."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    cents = F.round(F.col("value") * 100, 0).cast("long")

    def side(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("half"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(cents).cast("long").alias("cents"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
        )

    u = side("h1", ev.filter(F.col("ts") < cut)).unionByName(
        side("h2", ev.filter(F.col("ts") >= cut))
    )
    return u.select(
        "half",
        "n_rows",
        "cents",
        "n_null",
        (F.col("cents").cast("double") / F.col("n_rows").cast("double")).alias(
            "mean_cents"
        ),
    )


@_q(
    "q_session_bounce",
    """
    WITH sess AS (
      SELECT user_id, ts, event_id,
             SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
      FROM (
        SELECT user_id, ts, event_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id))
                 AS gap_us
        FROM events
      )
    ),
    per AS (
      SELECT user_id, sess_id, count(*) AS n_events
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (n_events = 1) AS BIGINT) AS n_bounces,
           CAST(count(*) FILTER (n_events = 1) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM per
    """,
)
def q_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate over gap-based sessions (30-minute inactivity
    boundary, the same sessionization rule as q_sessionize): sessions
    with exactly one event are bounces; the rate is one integer division.
    The session id is a cumulative boundary count — integer microsecond
    gaps, total (ts, event_id) order, so session assignment is
    reproducible. One user_id exchange carries the lag, the boundary
    cumsum and the per-session rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )
    boundary = F.when(
        F.col("gap_us").isNull() | (F.col("gap_us") > 1800000000), 1
    ).otherwise(0)
    sess = gaps.select(
        "user_id",
        F.sum(boundary)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    per = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        (
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# Batch 56 — pre-aggregation before join, 4-4-5 fiscal calendar, dynamic
# partition overwrite.
# ---------------------------------------------------------------------------


@_q(
    "q_preagg_before_join",
    f"""
    SELECT c_mktsegment,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM (
      SELECT o_custkey, count(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ) o JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def q_preagg_before_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual pre-aggregation BELOW the join — the single highest-leverage
    rewrite on a 100 TB star query: collapse the fact table to one row
    per join key FIRST (10^12 → 10^8 rows), then join the aggregate to
    the dimension (Catalyst does not push aggregates through joins for
    you). The join input shrinks by the fan-in factor and the final
    rollup is over the already-small result. Exact cents; the oracle is
    the same two-level form."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pre = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"),
    )
    j = pre.join(cust, pre.o_custkey == cust.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


@_q(
    "q_fiscal_445",
    """
    WITH d AS (
      SELECT o_orderdate,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CAST(isoyear(o_orderdate) AS BIGINT) AS fy,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS wk
      FROM orders
    ),
    f AS (
      SELECT fy, cents,
             CASE WHEN wk >= 53 THEN 11
                  ELSE CAST(((wk - 1) // 13) * 3
                       + CASE WHEN (wk - 1) % 13 < 4 THEN 0
                              WHEN (wk - 1) % 13 < 8 THEN 1
                              ELSE 2 END AS BIGINT)
             END AS fp0
      FROM d
    )
    SELECT fy AS fiscal_year, CAST(fp0 + 1 AS BIGINT) AS fiscal_period,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM f GROUP BY 1, 2
    """,
)
def q_fiscal_445(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal calendar rollup — the retail reporting calendar:
    each quarter = 4+4+5 ISO weeks, so periods are comparable
    week-for-week across years (unlike Gregorian months). Period =
    quarter·3 + {0,1,2} by week offset within the 13-week quarter, week
    53 folding into the final period — pure integer arithmetic on
    (isoyear, weekofyear), both engines ISO-8601-identical. One grouped
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.expr("extract(YEAROFWEEK FROM o_orderdate)")
        .cast("long")
        .alias("fy"),
        F.weekofyear("o_orderdate").cast("long").alias("wk"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    wk0 = F.col("wk") - 1
    fp0 = F.when(F.col("wk") >= 53, F.lit(11)).otherwise(
        F.expr("(wk - 1) div 13") * 3
        + F.when(wk0 % 13 < 4, 0).when(wk0 % 13 < 8, 1).otherwise(2)
    )
    f = d.select(F.col("fy").alias("fiscal_year"), (fp0 + 1).alias("fiscal_period"), "cents")
    return f.groupBy("fiscal_year", "fiscal_period").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


@_q(
    "q_dynamic_partition_overwrite",
    """
    SELECT year(o_orderdate) AS yr,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(CASE WHEN year(o_orderdate) = 1996 THEN count(*)
                     ELSE 0 END AS BIGINT) AS n_restated
    FROM orders GROUP BY 1
    """,
)
def q_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (partitionOverwriteMode=dynamic): a
    restatement batch rewrites ONLY the partitions it contains — 1996's
    rows are replaced with RESTATED copies while every other year
    survives untouched (static overwrite mode would TRUNCATE the whole
    table first; the dynamic mode is how daily restatements land on a
    partitioned 100 TB fact). The read-back must show all years, with
    exactly 1996 restated — the oracle reproduces that end state from
    the source table."""
    import hashlib
    import os

    orders = load_table(spark, sf_dir, "orders")
    tag = _fp_tag(sf_dir, "orders")
    base = f"{_SCRATCH}/orders_dpo_{tag}"
    marker = f"{base}/_restated"
    src = orders.withColumn("yr", F.year("o_orderdate"))
    if not os.path.exists(marker):
        src.write.partitionBy("yr").mode("overwrite").parquet(base)
        restated = src.filter(F.col("yr") == 1996).withColumn(
            "o_orderpriority", F.lit("RESTATED")
        )
        restated.write.partitionBy("yr").mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(base)
        os.makedirs(marker, exist_ok=True)
    back = spark.read.parquet(base)
    # oracle's end state: every 1996 row restated, all other years intact
    return back.groupBy(F.col("yr").cast("int").alias("yr")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderpriority") == "RESTATED", 1).otherwise(0))
        .cast("long")
        .alias("n_restated"),
    )


# ---------------------------------------------------------------------------
# Batch 57 — Bayesian-smoothed rates, nested schema pruning,
# entity-consistent sampling.
# ---------------------------------------------------------------------------


@_q(
    "q_rate_smoothed",
    """
    WITH g AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(x AS BIGINT) AS n_purchases,
           CAST(n AS BIGINT) AS n_events,
           CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate,
           CAST(x + 1 AS DOUBLE) / CAST(n + 20 AS DOUBLE) AS smoothed_rate
    FROM g
    """,
)
def q_rate_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian (additive) rate smoothing — (x+α)/(n+β) with a
    Beta(1,19) prior: the ranking-safe conversion rate that stops a
    1-for-1 user from outranking a 90-for-100 one (the classic
    small-sample CTR pathology). Integer numerators/denominators, each
    rate ONE division — bit-identical cross-engine. One grouped
    aggregate; the prior is a constant, not data-dependent state."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "x"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    return g.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("x").cast("long").alias("n_purchases"),
        F.col("n").alias("n_events"),
        (F.col("x").cast("double") / F.col("n").cast("double")).alias("raw_rate"),
        (
            (F.col("x") + 1).cast("double") / (F.col("n") + 20).cast("double")
        ).alias("smoothed_rate"),
    )


@_q(
    "q_nested_schema_pruning",
    """
    SELECT n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def q_nested_schema_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct schema pruning: customers land in parquet as one
    deep struct column (profile.ident.nation, profile.money.balance,
    plus payload fields), and the query touches TWO leaf fields — the
    scan's ReadSchema must contain only those leaves, not the whole
    struct (tests assert it). On a 100 TB nested table (logs, protobuf
    drops) leaf-level pruning is the IO difference between reading 2%
    and 100% of every row group. Result twins against the flat table."""
    import hashlib
    import os

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    tag = _fp_tag(sf_dir, "customer")
    base = f"{_SCRATCH}/cust_nested_{tag}"
    if not os.path.exists(base):
        nested = cust.select(
            F.struct(
                F.struct(
                    F.col("c_custkey").alias("key"),
                    F.col("c_nationkey").alias("nation"),
                ).alias("ident"),
                F.struct(
                    F.col("c_acctbal").alias("balance"),
                    F.col("c_mktsegment").alias("segment"),
                ).alias("money"),
                F.struct(
                    F.col("c_name").alias("name"),
                    F.col("c_custkey").alias("key_copy"),
                ).alias("payload"),
            ).alias("profile")
        )
        nested.write.mode("overwrite").parquet(base)
    back = spark.read.parquet(base).select(
        F.col("profile.ident.nation").alias("nationkey"),
        F.col("profile.money.balance").alias("balance"),
    )
    j = back.join(F.broadcast(nation), back.nationkey == nation.n_nationkey)
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("balance") * 100, 0).cast("long")).alias("cents"),
    )


@_q(
    "q_entity_sample",
    """
    WITH kept_users AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2)
                 AS INTEGER) % 10 = 0
    )
    SELECT CAST((SELECT count(*) FROM kept_users) AS BIGINT) AS n_users_kept,
           CAST(count(*) AS BIGINT) AS n_events_kept,
           CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
             AS n_users_total
    FROM events WHERE user_id IN (SELECT user_id FROM kept_users)
    """,
)
def q_entity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY-consistent sampling: keep ~10% of USERS (content-stable md5
    draw on the user id) and every one of their events — row-level
    sampling shreds sessions/sequences; entity-level keeps each sampled
    user's history complete, which is what sessionization, funnels and
    per-author training-data work need. The draw is a pure hash
    expression (no RNG, reproducible on any cluster); membership is a
    map-side predicate, no join required."""
    ev = load_table(spark, sf_dir, "events")
    draw = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 2), 16, 10)
        .cast("int")
        % 10
        == 0
    )
    kept = ev.filter(draw)
    return kept.agg(
        F.countDistinct("user_id").alias("n_users_kept"),
        F.count(F.lit(1)).alias("n_events_kept"),
    ).crossJoin(
        F.broadcast(
            ev.agg(F.countDistinct("user_id").alias("n_users_total"))
        )
    )


# ---------------------------------------------------------------------------
# Batch 58 — collation-aware grouping, day-time interval arithmetic,
# delimited key-value parsing.
# ---------------------------------------------------------------------------


@_q(
    "q_collation_group",
    """
    WITH w AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer
    )
    SELECT lower(seg) AS seg_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
    FROM w GROUP BY 1
    """,
)
def q_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): a mixed-case segment
    column grouped under UTF8_LCASE collapses case variants WITHOUT
    rewriting the data through lower() — the collation is a column
    property the engine's comparators/hashes honor everywhere (joins,
    sorts, distinct). The emitted key is canonicalized to lower() because
    a collated group's representative is arbitrary; the per-group case-
    variant count (2 for every segment here) proves the collation did
    the collapsing. One grouped aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    w = cust.select(
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        )
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    g = w.groupBy(F.collate("seg", "UTF8_LCASE").alias("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.collate("seg", "UTF8_BINARY")).alias("n_case_variants"),
    )
    return g.select(
        F.lower(F.col("k").cast("string")).alias("seg_ci"),
        "n",
        "n_case_variants",
    )


@_q(
    "q_interval_daytime",
    """
    WITH x AS (
      SELECT ts,
             ts + INTERVAL 90 MINUTE AS sla_deadline,
             ts - INTERVAL 36 HOUR AS lookback_start,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS next_hour
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(sla_deadline AS DATE) <> CAST(ts AS DATE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_deadline_next_day,
           CAST(min(epoch_us(next_hour) - epoch_us(ts)) AS BIGINT)
             AS min_us_to_hour,
           CAST(max(epoch_us(next_hour) - epoch_us(ts)) AS BIGINT)
             AS max_us_to_hour,
           CAST(SUM(epoch_us(ts) - epoch_us(lookback_start)) AS BIGINT)
             // CAST(count(*) AS BIGINT) AS lookback_us
    FROM x
    """,
)
def q_interval_daytime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-TIME interval arithmetic (the companion to q_interval_months'
    year-month intervals): SLA deadlines (+90 minutes), lookback windows
    (−36 hours), and next-hour boundaries (date_trunc + 1 hour) — the
    timestamp algebra operational pipelines run constantly. All audits
    reduce to integer microsecond deltas: the constant 36-hour lookback
    verifies as an exact integer division, the to-next-hour gap is
    bounded by (0, 1h]."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "ts",
        F.col("ts") + F.expr("INTERVAL 90 MINUTE"),
        (F.col("ts") - F.expr("INTERVAL 36 HOUR")).alias("lookback_start"),
        (F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")).alias(
            "next_hour"
        ),
    ).toDF("ts", "sla_deadline", "lookback_start", "next_hour")
    return x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                F.col("sla_deadline").cast("date") != F.col("ts").cast("date"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_deadline_next_day"),
        F.min(F.unix_micros("next_hour") - F.unix_micros("ts")).alias(
            "min_us_to_hour"
        ),
        F.max(F.unix_micros("next_hour") - F.unix_micros("ts")).alias(
            "max_us_to_hour"
        ),
        F.expr(
            "CAST(SUM(unix_micros(ts) - unix_micros(lookback_start)) AS BIGINT)"
            " div CAST(count(*) AS BIGINT)"
        ).alias("lookback_us"),
    )


@_q(
    "q_str_to_map",
    """
    WITH raw AS (
      SELECT event_id,
             'type=' || event_type || ';uid=' || CAST(user_id AS VARCHAR)
               || ';day=' || CAST(CAST(ts AS DATE) AS VARCHAR) AS kv
      FROM events
    ),
    parsed AS (
      SELECT event_id,
             list_transform(string_split(kv, ';'),
                            p -> string_split(p, '=')) AS pairs
      FROM raw
    ),
    m AS (
      SELECT event_id,
             pairs[1][2] AS type_v, pairs[2][2] AS uid_v, pairs[3][2] AS day_v
      FROM parsed
    )
    SELECT type_v AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT uid_v) AS BIGINT) AS n_users,
           CAST(count(DISTINCT day_v) AS BIGINT) AS n_days
    FROM m GROUP BY 1
    """,
)
def q_str_to_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited key=value parsing (str_to_map) — the log-line/query-string
    decoder: 'k=v;k=v' unpacks to a typed map in one expression, fields
    extracted by key (order-independent, unlike positional splits). The
    round-trip is self-proving: rebuilt fields re-aggregate to the source
    distributions. Map-only parse, one grouped aggregate."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.concat(
            F.lit("type="),
            "event_type",
            F.lit(";uid="),
            F.col("user_id").cast("string"),
            F.lit(";day="),
            F.col("ts").cast("date").cast("string"),
        ).alias("kv")
    )
    m = raw.select(F.expr("str_to_map(kv, ';', '=')").alias("mp"))
    fields = m.select(
        F.element_at("mp", "type").alias("event_type"),
        F.element_at("mp", "uid").alias("uid_v"),
        F.element_at("mp", "day").alias("day_v"),
    )
    return fields.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("uid_v").alias("n_users"),
        F.countDistinct("day_v").alias("n_days"),
    )


# ---------------------------------------------------------------------------
# Batch 59 — deterministic negative sampling, monotonic-id audit, dedup
# survivor-policy matrix.
# ---------------------------------------------------------------------------


@_q(
    "q_negative_sampling",
    """
    WITH pk AS (
      SELECT min(p_partkey) AS lo,
             max(p_partkey) - min(p_partkey) + 1 AS span
      FROM part
    ),
    pos AS (
      SELECT event_id, user_id FROM events WHERE event_type = 'purchase'
    ),
    negs AS (
      SELECT pos.event_id, pos.user_id, k.i,
             lo + CAST('0x' || substr(md5(CAST(pos.event_id AS VARCHAR)
                       || '_' || CAST(k.i AS VARCHAR)), 1, 8) AS BIGINT)
                  % span AS neg_partkey
      FROM pos, pk, (SELECT unnest([1, 2]) AS i) k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_positives,
           CAST(count(DISTINCT neg_partkey) AS BIGINT) AS n_distinct_negs,
           CAST(SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dangling
    FROM negs LEFT JOIN part ON neg_partkey = p_partkey
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE sampling for contrastive training pairs:
    each positive (purchase) gets k=2 pseudo-random item negatives drawn
    by hashing (event_id, i) into the contiguous part-key domain — O(k·
    positives) arithmetic, never a positives×items cross join, and the
    same pairs on every run/cluster (no RNG). The left join back to part
    proves every drawn key resolves (n_dangling = 0 on the dense key
    range) — the integrity check a feature-store join would rely on."""
    ev = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    pk = part.agg(
        F.min("p_partkey").alias("lo"),
        (F.max("p_partkey") - F.min("p_partkey") + 1).alias("span"),
    )
    pos = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id"
    )
    ks = spark.range(1, 3).select(F.col("id").alias("i"))
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit("_"),
                    F.col("i").cast("string"),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    negs = (
        pos.crossJoin(F.broadcast(pk))
        .crossJoin(F.broadcast(ks))
        .select(
            "event_id",
            "user_id",
            (F.col("lo") + draw % F.col("span")).alias("neg_partkey"),
        )
    )
    j = negs.join(part, negs.neg_partkey == part.p_partkey, "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("event_id").alias("n_positives"),
        F.countDistinct("neg_partkey").alias("n_distinct_negs"),
        F.sum(F.when(F.col("p_partkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_dangling"),
    )


@_q(
    "q_monotonic_ids",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_distinct_ids,
           true AS ids_unique
    FROM orders
    """,
)
def q_monotonic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """monotonically_increasing_id() — the distributed surrogate-key
    generator: partition-prefixed 64-bit ids, unique by construction but
    NOT stable across runs/layouts, so the CONTRACT here is the
    uniqueness invariant (n_distinct == n_rows), never the values — the
    docstring rule any deployment must inherit (stable keys come from
    content hashes, q_hash_key). Zero shuffle to generate; one aggregate
    to audit."""
    orders = load_table(spark, sf_dir, "orders")
    ids = orders.select(F.monotonically_increasing_id().alias("mid"))
    return ids.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("mid").alias("n_distinct_ids"),
    ).select(
        "n_rows",
        "n_distinct_ids",
        (F.col("n_rows") == F.col("n_distinct_ids")).alias("ids_unique"),
    )


@_q(
    "q_dedup_policy_matrix",
    """
    WITH ranked AS (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_last,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY value DESC NULLS LAST, event_id)
               AS rn_best
      FROM events
    )
    SELECT CAST(count(*) FILTER (rn_first = 1) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN rn_first = 1 AND rn_last = 1
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_first_eq_last,
           CAST(SUM(CASE WHEN rn_first = 1 AND rn_best = 1
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_first_eq_best
    FROM ranked
    """,
)
def q_dedup_policy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-policy matrix for keyed dedup — keep-FIRST (earliest),
    keep-LAST (latest), keep-BEST (highest value): all three are
    row_number picks under different total orders on ONE shuffled
    partition, and the matrix quantifies how often they choose the same
    physical row (singleton keys agree trivially; multi-row keys
    disagree). The reference's drop_duplicates inherited file order
    (SURVEY §1.4 Q3); this key is the policy decision made explicit and
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type")
    ranked = ev.select(
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn_first"),
        F.row_number()
        .over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_last"),
        F.row_number()
        .over(w.orderBy(F.col("value").desc_nulls_last(), "event_id"))
        .alias("rn_best"),
    )
    return ranked.agg(
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_keys"),
        F.sum(
            F.when((F.col("rn_first") == 1) & (F.col("rn_last") == 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_first_eq_last"),
        F.sum(
            F.when((F.col("rn_first") == 1) & (F.col("rn_best") == 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_first_eq_best"),
    )


# ---------------------------------------------------------------------------
# Batch 60 — watermark late-data semantics, parameterized SQL,
# IDENTIFIER() dynamic references.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_late_drop",
    """
    WITH ot AS (
      SELECT ts FROM events WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    ),
    mx AS (SELECT max(ts) AS mt FROM ot)
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM ot, mx
    WHERE CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY
            <= mt - INTERVAL 1 DAY
    GROUP BY 1
    """,
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics, end to end: run 1 streams the
    on-time slice through a 1-day-watermarked daily aggregate in APPEND
    mode (only windows the watermark has closed reach the sink); run 2
    resumes from the checkpoint and replays a file of LATE rows — all
    older than the persisted watermark, so the state store drops every
    one. The sink therefore holds exactly the closed on-time windows:
    no late contamination, no unfinalized tail window — which is
    precisely what the twin computes from the batch table. This is the
    bounded-state guarantee that lets the aggregation run forever at
    100 TB/day."""
    import hashlib
    import os

    from etl_pipeline_project_spark.streaming.ops import read_events_stream

    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-10 00:00:00").cast("timestamp")
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/stream_late_{tag}"
    stage, ckpt, sink = f"{base}/stage", f"{base}/ckpt", f"{base}/sink"

    def run_stream() -> None:
        src = (
            spark.readStream.schema(
                ev.select("ts", "event_id").schema
            ).parquet(stage)
        )
        agg = (
            src.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("window.start").cast("date").cast("string").alias("day"),
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if not os.path.exists(base):
        ev.select("ts", "event_id").filter(F.col("ts") >= cut).write.mode(
            "overwrite"
        ).parquet(stage)
        run_stream()  # run 1: on-time slice; watermark advances, windows close
        ev.select("ts", "event_id").filter(F.col("ts") < cut).write.mode(
            "append"
        ).parquet(stage)
        run_stream()  # run 2: late rows arrive below the watermark -> dropped
    run_stream()  # idempotent re-invocation
    return spark.read.parquet(sink)


@_q(
    "q_sql_parameterized",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           {_msum('o_totalprice')} AS total
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_totalprice > 50000
    GROUP BY 1
    """,
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named parameter markers) — user inputs bind as
    TYPED VALUES, never string-spliced into the query text: the
    SQL-injection-proof templating surface (the reference interpolates
    f-strings into SQL, `data/transformation_db.py:109` — this is the
    engine's safe replacement). The parameters reach Catalyst as
    literals, so pushdown/pruning work exactly as with inline
    constants."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_param")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 2)
                    AS DECIMAL(38,2)) AS DOUBLE) AS total
        FROM orders_param
        WHERE o_orderdate >= :start_date AND o_totalprice > :min_total
        GROUP BY o_orderpriority
        """,
        args={"start_date": "1997-01-01", "min_total": 50000},
    )


@_q(
    "q_sql_identifier",
    """
    SELECT 'orders' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    UNION ALL
    SELECT 'customer', CAST(count(*) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'nation', CAST(count(*) AS BIGINT) FROM nation
    """,
)
def q_sql_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() dynamic object references — table names arrive as
    parameters but resolve through the SAFE identifier channel (no SQL
    string concatenation, no injection, catalog resolution rules apply):
    the generic-tooling surface for catalog sweeps like q_dq_uniqueness.
    One templated count per table, unioned."""
    parts = []
    for name in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"idtbl_{name}")
        parts.append(
            spark.sql(
                "SELECT :label AS table_name, COUNT(*) AS n_rows "
                "FROM IDENTIFIER(:tbl)",
                args={"label": name, "tbl": f"idtbl_{name}"},
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Batch 61 — rolling regression slopes, role-playing dimensions.
# ---------------------------------------------------------------------------


@_q(
    "q_rolling_slope",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS x,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    w AS (
      SELECT user_id, day,
             count(*) OVER win AS n,
             SUM(x) OVER win AS sx,
             SUM(y) OVER win AS sy,
             SUM(x * y) OVER win AS sxy,
             SUM(x * x) OVER win AS sxx
      FROM daily
      WINDOW win AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(day AS VARCHAR) AS day,
           CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END
             AS slope_cents_per_day
    FROM w WHERE n >= 3
    """,
)
def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING least-squares trend: per user, the 7-observation windowed
    slope of daily spend — q_linreg_trend's exact-moment formulation
    moved into a sliding ROWS frame, so every window's S1/Sxy/Sxx moments
    are integer sums and the slope is one guarded division (num/den also
    emitted as exact integers). One user_id exchange carries the daily
    pre-aggregate and all four moment windows; no per-window refit, no
    Python."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # one explicit user_id exchange up front: hash(user_id) clusters every
    # (user_id, day) group AND satisfies the downstream user_id window, so
    # Catalyst inserts no second shuffle (groupBy(user, day) alone would
    # partition on the pair, which the window can't reuse)
    daily = ev.repartition("user_id").groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.expr("CAST(unix_micros(min(ts)) div 86400000000 AS BIGINT)").alias("x"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("y"),
    )
    win = (
        Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    )
    w = daily.select(
        "user_id",
        "day",
        F.count(F.lit(1)).over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
    ).filter(F.col("n") >= 3)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return w.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("day").cast("string").alias("day"),
        F.col("n").alias("n_days"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope_cents_per_day"),
    )


@_q(
    "q_role_playing_dim",
    """
    WITH dd AS (
      SELECT DISTINCT CAST(d AS DATE) AS d, year(CAST(d AS DATE)) AS yr
      FROM (SELECT o_orderdate AS d FROM orders
            UNION ALL SELECT l_shipdate FROM lineitem)
    )
    SELECT od.yr AS order_year, sd.yr AS ship_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN dd od ON o_orderdate = od.d
    JOIN dd sd ON l_shipdate = sd.d
    GROUP BY 1, 2
    """,
)
def q_role_playing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing dimension — ONE date dimension joined twice under two
    roles (order date, ship date), the standard star-schema pattern a
    single physical dim table serves through aliases: both joins
    broadcast the same small dim, the fact table shuffles once for the
    orders join, and the (order_year × ship_year) matrix exposes the
    cross-role lag structure. Aliasing correctness (no column capture
    between the two roles) is exactly what this key pins."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    dd = (
        orders.select(F.col("o_orderdate").alias("d"))
        .unionByName(li.select(F.col("l_shipdate").alias("d")))
        .distinct()
        .select("d", F.year("d").alias("yr"))
    )
    od = dd.select(F.col("d").alias("od_d"), F.col("yr").alias("order_year"))
    sd = dd.select(F.col("d").alias("sd_d"), F.col("yr").alias("ship_year"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(od), F.col("o_orderdate") == F.col("od_d"))
        .join(F.broadcast(sd), F.col("l_shipdate") == F.col("sd_d"))
    )
    return j.groupBy("order_year", "ship_year").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )


# ---------------------------------------------------------------------------
# Batch 62 — unknown-member dimension pattern, accumulating-snapshot fact.
# ---------------------------------------------------------------------------


@_q(
    "q_unknown_member",
    """
    WITH dim AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 7 <> 0
    )
    SELECT COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unknown
    FROM orders LEFT JOIN dim ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def q_unknown_member(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNKNOWN-member pattern: fact rows whose dimension key has no
    dim row (here a dim with 1-in-7 members deliberately missing) map to
    the reserved 'UNKNOWN' member instead of silently dropping out of an
    inner join — every fact row survives, the unknown bucket is
    measurable, and the report totals reconcile to the fact table (THE
    referential-integrity posture for late-arriving dims at 100 TB;
    q_dq_referential counts the orphans, this key keeps them). Left
    broadcast join + coalesce remap, one aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 7 != 0)
        .select("c_custkey", "c_mktsegment")
    )
    j = orders.join(
        F.broadcast(dim), orders.o_custkey == dim.c_custkey, "left"
    )
    return j.groupBy(
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unknown"),
    )


@_q(
    "q_accumulating_snapshot",
    """
    WITH m AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_first_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_first_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS t_first_purchase
      FROM events GROUP BY 1
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(t_signup AS VARCHAR) AS t_signup,
           CAST(CASE WHEN t_signup IS NOT NULL AND t_first_view > t_signup
                     THEN (epoch_us(t_first_view) - epoch_us(t_signup))
                          // 1000000 END AS BIGINT) AS signup_to_view_s,
           CAST(CASE WHEN t_first_click IS NOT NULL
                          AND t_first_purchase > t_first_click
                     THEN (epoch_us(t_first_purchase)
                           - epoch_us(t_first_click)) // 1000000
                END AS BIGINT) AS click_to_purchase_s,
           CAST(t_signup IS NOT NULL AND t_first_view IS NOT NULL
                AND t_first_click IS NOT NULL
                AND t_first_purchase IS NOT NULL AS BOOLEAN)
             AS funnel_complete
    FROM m
    """,
)
def q_accumulating_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACCUMULATING-SNAPSHOT fact — the third Kimball fact type (the mart
    covers transaction facts, q_ohlc_downsample the periodic snapshot):
    one row per process instance (user funnel) whose milestone columns
    fill in as events arrive — first signup/view/click/purchase
    timestamps, inter-milestone lags in integer seconds, completion flag.
    Built in ONE conditional-min pass over the event stream (no
    per-milestone scans, no updates-in-place — the rebuild-from-log
    formulation that scales); incremental maintenance would MERGE by
    least(min) per column."""
    ev = load_table(spark, sf_dir, "events")

    def first(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    m = ev.groupBy("user_id").agg(
        first("signup").alias("t_signup"),
        first("view").alias("t_first_view"),
        first("click").alias("t_first_click"),
        first("purchase").alias("t_first_purchase"),
    )
    lag_sv = F.when(
        F.col("t_signup").isNotNull()
        & (F.col("t_first_view") > F.col("t_signup")),
        F.expr(
            "(unix_micros(t_first_view) - unix_micros(t_signup)) div 1000000"
        ),
    )
    lag_cp = F.when(
        F.col("t_first_click").isNotNull()
        & (F.col("t_first_purchase") > F.col("t_first_click")),
        F.expr(
            "(unix_micros(t_first_purchase) - unix_micros(t_first_click))"
            " div 1000000"
        ),
    )
    return m.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("t_signup").cast("string").alias("t_signup"),
        lag_sv.cast("long").alias("signup_to_view_s"),
        lag_cp.cast("long").alias("click_to_purchase_s"),
        (
            F.col("t_signup").isNotNull()
            & F.col("t_first_view").isNotNull()
            & F.col("t_first_click").isNotNull()
            & F.col("t_first_purchase").isNotNull()
        ).alias("funnel_complete"),
    )


# ---------------------------------------------------------------------------
# Batch 63 — embedding centroid drift, cross-source duplicate provenance,
# tokenizer fertility.
# ---------------------------------------------------------------------------


@_q(
    "q_embed_drift",
    """
    WITH ex AS (
      SELECT label, vec_id % 2 AS half, CAST(i - 1 AS INTEGER) AS dim,
             CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
               AS v_fp
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    ),
    c AS (
      SELECT label, half, dim, count(*) AS n, SUM(v_fp) AS s
      FROM ex GROUP BY 1, 2, 3
    ),
    j AS (
      SELECT a.label, a.dim,
             abs(a.s * b.n - b.s * a.n) AS num, a.n * b.n AS den
      FROM c a JOIN c b
        ON a.label = b.label AND a.dim = b.dim
       AND a.half = 0 AND b.half = 1
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(SUM(num) AS BIGINT) AS l1_num_fp,
           CAST(max(den) AS BIGINT) AS den
    FROM j GROUP BY 1
    """,
)
def q_embed_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-centroid DRIFT between two deterministic corpus halves,
    per label: the monitoring signal for 'did my embedding distribution
    move' (model swap, upstream feature change). Each half's centroid
    uses the fixed-point int64 accumulation of q_embed_centroid; the
    per-dim |mean_a − mean_b| comparison cross-multiplies to integers
    (|s_a·n_b − s_b·n_a|) so the L1 drift numerator is EXACT — no float
    means compared, no tolerance needed. One (label, half, dim) shuffle,
    then a dim-count-sized join."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "v"),
    ).select(
        "label",
        "half",
        "dim",
        F.floor(F.col("v").cast("double") * 1000000).cast("long").alias("v_fp"),
    )
    c = ex.groupBy("label", "half", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_fp").alias("s")
    )
    a = c.filter(F.col("half") == 0).select(
        "label", "dim", F.col("n").alias("na"), F.col("s").alias("sa")
    )
    b = c.filter(F.col("half") == 1).select(
        "label", "dim", F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    j = a.join(b, ["label", "dim"]).select(
        "label",
        "dim",
        F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")).alias("num"),
        (F.col("na") * F.col("nb")).alias("den"),
    )
    return j.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.sum("num").cast("long").alias("l1_num_fp"),
        F.max("den").cast("long").alias("den"),
    )


@_q(
    "q_cross_source_dups",
    f"""
    WITH sh AS (SELECT doc_id, source, {_SHINGLE_SQL} AS s FROM documents),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE 1.0 - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / CAST(GREATEST(len(a.s) + len(b.s)
                   - len(list_intersect(a.s, b.s)), 1) AS DOUBLE) < 0.4
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN src_a <> src_b THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_source,
           CAST(SUM(CASE WHEN src_a = src_b THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_source
    FROM pairs
    """,
)
def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate PROVENANCE: of the near-dup pairs (the exact MinHash-LSH
    pair set), how many straddle DIFFERENT sources vs stay within one —
    the syndication/mirror-site signal that decides whether dedup should
    be source-local (cheap, blocked) or global (the expensive path is
    only justified if cross-source dups exist). Reuses the banded LSH
    pair plan + a source-pair classification; the oracle recomputes the
    pair set exactly all-pairs."""
    from etl_pipeline_project_spark.operators.dedup_text import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_distance_threshold=0.4
    )
    src = docs.select("doc_id", "source")
    pa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    pb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    lab = pairs.join(F.broadcast(pa), "id_a").join(F.broadcast(pb), "id_b")
    return lab.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("src_a") != F.col("src_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_cross_source"),
        F.sum(F.when(F.col("src_a") == F.col("src_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_same_source"),
    )


@_q(
    "q_tokenizer_fertility",
    """
    WITH t AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+'))
               AS n_tokens
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)
             AS fertility
    FROM t GROUP BY 1
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY (tokens per word) by source — the corpus-mix
    cost metric: a source whose text fragments into more subword tokens
    per word consumes proportionally more of a training budget. Both
    counts come from one map-only pass (whitespace words + the BPE-ish
    pretokenizer regex, RE2∩Java-safe: no lookahead); the ratio is one
    integer→double division per source."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.size(F.split("text", " ")).alias("n_words"),
        F.size(
            F.expr(r"regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+', 0)")
        ).alias("n_tokens"),
    )
    return t.groupBy("source").agg(
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        (
            F.sum("n_tokens").cast("double") / F.sum("n_words").cast("double")
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# Batch 64 — nested document-model denormalization round-trip.
# ---------------------------------------------------------------------------


@_q(
    "q_nest_denormalize",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(first_qty) AS BIGINT) AS sum_first_qty
    FROM (
      SELECT o_orderkey, o_orderpriority, count(*) AS n_lines,
             CAST(min_by(l_quantity,
                         l_linenumber * 100000000000000
                         + l_partkey * 10000000 + l_suppkey)
                  AS BIGINT) AS first_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ) GROUP BY 1
    """,
)
def q_nest_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-model DENORMALIZATION round-trip: orders nest their line
    items as a SORTED array<struct> (total (linenumber, partkey, suppkey)
    order — collect_list alone is partition-order-dependent), land as
    nested parquet, read back, and unnest again — the one-to-many
    materialization that trades join cost for storage locality (the
    nested layout answers per-order questions with zero joins at read
    time). The audit checks line counts and the first line's quantity
    per order survive both hops exactly."""
    import hashlib
    import os

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
    )
    def _build(tmp: str) -> None:
        nested = (
            li.groupBy("l_orderkey")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"
                        )
                    )
                ).alias("lines")
            )
            .join(orders, F.col("l_orderkey") == orders.o_orderkey)
            .select("o_orderkey", "o_orderpriority", "lines")
        )
        nested.write.mode("overwrite").parquet(tmp)

    base = _staged_fixture("orders_nested", _fp_tag(sf_dir, "lineitem"), _build)
    back = spark.read.parquet(base)
    per_order = back.select(
        "o_orderpriority",
        F.size("lines").alias("n_lines"),
        F.col("lines")[0]["l_quantity"].cast("long").alias("first_qty"),
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.sum("first_qty").cast("long").alias("sum_first_qty"),
    )


# ---------------------------------------------------------------------------
# Batch 65 — empty-relation propagation, UNION DISTINCT, inline VALUES
# dims, try_cast matrix.
# ---------------------------------------------------------------------------


@_q(
    "q_empty_relation",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE 1 = 0 GROUP BY 1
    """,
)
def q_empty_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-relation propagation: a contradiction filter collapses the
    whole join+aggregate to an empty LocalRelation at OPTIMIZATION time —
    zero tasks, zero scans (PropagateEmptyRelation) — while the SCHEMA
    survives intact, which is the contract downstream unions/writers
    depend on. The zero-row result still hash-matches the twin; at
    100 TB this is the reason a no-op incremental window costs
    nothing."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.lit(1) == F.lit(0))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "q_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct semantics) — completing the set-op matrix
    (UNION ALL / INTERSECT [ALL] / EXCEPT [ALL] have keys already):
    engines execute it as union-all + aggregate-distinct, one shuffle on
    the full width. Small key domain here; the semantics, not the
    volume, are the contract."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


@_q(
    "q_inline_dim_join",
    """
    WITH sla(o_orderpriority, sla_days) AS (
      VALUES ('1-URGENT', 2), ('2-HIGH', 5), ('3-MEDIUM', 10),
             ('4-NOT SPECIFIED', 21), ('5-LOW', 30)
    )
    SELECT sla_days,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders JOIN sla USING (o_orderpriority)
    GROUP BY 1
    """,
)
def q_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension — config-as-code lookup tables (SLA
    policies, tier maps) declared in the query itself and broadcast into
    the fact scan: no staging table, no file, versioned with the code.
    The literal relation is a LocalRelation the planner folds and
    broadcasts for free; every fact row must match (count reconciles) —
    the guard that a policy map covers its domain."""
    orders = load_table(spark, sf_dir, "orders")
    sla = spark.createDataFrame(
        [
            ("1-URGENT", 2),
            ("2-HIGH", 5),
            ("3-MEDIUM", 10),
            ("4-NOT SPECIFIED", 21),
            ("5-LOW", 30),
        ],
        "o_orderpriority string, sla_days int",
    )
    return (
        orders.join(F.broadcast(sla), "o_orderpriority")
        .groupBy("sla_days")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


@_q(
    "q_try_cast_matrix",
    """
    WITH x AS (
      SELECT props,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
             TRY_CAST(event_type AS BIGINT) AS type_as_int,
             TRY_CAST(CAST(ts AS VARCHAR) AS DATE) AS ts_as_date
      FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(k_int) AS BIGINT) AS n_k_parsed,
           CAST(count(type_as_int) AS BIGINT) AS n_type_parsed,
           CAST(count(ts_as_date) AS BIGINT) AS n_date_parsed,
           CAST(SUM(k_int) AS BIGINT) AS sum_k
    FROM x
    """,
)
def q_try_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast degradation matrix — the ingestion posture for dirty typed
    fields: JSON-extracted numerics parse (count survives), alphabetic
    strings degrade to NULL instead of failing the task, and
    timestamp-string→date round-trips (both engines parse the leading
    ISO date from 'YYYY-MM-DD HH:MM:SS'). NULL-counting audits make the
    degradation measurable (pairs with q_try_arith's arithmetic half).
    Map-only + one aggregate."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").alias(
            "k_int"
        ),
        F.expr("try_cast(event_type AS BIGINT)").alias("type_as_int"),
        F.expr("try_cast(CAST(ts AS STRING) AS DATE)").alias("ts_as_date"),
    )
    return x.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("k_int").alias("n_k_parsed"),
        F.count("type_as_int").alias("n_type_parsed"),
        F.count("ts_as_date").alias("n_date_parsed"),
        F.sum("k_int").cast("long").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# Batch 66 — vocabulary drift, time-based debounce, hierarchical shares.
# ---------------------------------------------------------------------------


@_q(
    "q_vocab_drift",
    """
    WITH tok AS (
      SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    df AS (
      SELECT term,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1
      FROM tok GROUP BY 1
    ),
    tot AS (SELECT SUM(n0) AS t0, SUM(n1) AS t1 FROM df)
    SELECT term, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(n1 * t0 - n0 * t1 AS BIGINT) AS drift_num,
           CAST(t0 * t1 AS BIGINT) AS drift_den
    FROM df, tot
    ORDER BY abs(n1 * t0 - n0 * t1) DESC, term
    LIMIT 30
    """,
)
def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two deterministic corpus halves: per term,
    the relative-frequency shift n1/t1 − n0/t0 in CROSS-MULTIPLIED exact
    integer form (n1·t0 − n0·t1 over t0·t1) — the text companion to
    q_embed_drift and q_ks_test, ranked by absolute shift with a term
    tie-break. The token counts are one map-side-combinable aggregate;
    the totals broadcast. Top-30 bounds the contract output."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    df = tok.groupBy("term").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("n1"),
    )
    tot = df.agg(F.sum("n0").alias("t0"), F.sum("n1").alias("t1"))
    j = df.crossJoin(F.broadcast(tot))
    num = F.col("n1") * F.col("t0") - F.col("n0") * F.col("t1")
    return (
        j.select(
            "term",
            F.col("n0").cast("long").alias("n0"),
            F.col("n1").cast("long").alias("n1"),
            num.cast("long").alias("drift_num"),
            (F.col("t0") * F.col("t1")).cast("long").alias("drift_den"),
        )
        .orderBy(F.abs(F.col("drift_num")).desc(), "term")
        .limit(30)
    )


@_q(
    "q_debounce",
    """
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id))
               AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 300000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 300000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM seq GROUP BY 1
    """,
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based DEBOUNCE: an event is suppressed when the same user
    emitted the same type within the last 5 minutes — the telemetry
    duplicate-burst filter (double-clicks, retry storms). Complementary
    to q_per_user_cap (count-based budget): debounce is gap-based, and a
    chain of sub-threshold events keeps only its first. One lag over the
    (user, type) partition with a total order; integer-µs gaps; kept +
    debounced always sums to the input."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
    )
    keep = F.col("gap_us").isNull() | (F.col("gap_us") > 300000000)
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~keep, 1).otherwise(0)).cast("long").alias("n_debounced"),
    )


@_q(
    "q_hierarchical_share",
    """
    WITH base AS (
      SELECT r_name, n_name,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    ),
    lv AS (
      SELECT r_name, n_name, cents,
             SUM(cents) OVER (PARTITION BY r_name) AS region_cents,
             SUM(cents) OVER () AS total_cents
      FROM base
    )
    SELECT r_name, n_name, CAST(cents AS BIGINT) AS cents,
           CAST(cents AS DOUBLE) / CAST(region_cents AS DOUBLE)
             AS share_of_region,
           CAST(region_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
             AS region_share_of_total,
           CAST(cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
             AS share_of_total
    FROM lv
    """,
)
def q_hierarchical_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share decomposition — nation-within-region and
    region-within-total proportions from ONE aggregate: the two window
    levels run over the 25-row nation rollup (never the fact table), each
    share is a single division of exact cent integers, and the identity
    share_of_total = share_of_region × region_share_of_total holds to
    the division's rounding. The drill-path percentages every BI rollup
    reports."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    w_r = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    lv = base.select(
        "r_name",
        "n_name",
        "cents",
        F.sum("cents").over(w_r).alias("region_cents"),
        F.sum("cents").over(w_all).alias("total_cents"),
    )
    return lv.select(
        "r_name",
        "n_name",
        "cents",
        (F.col("cents").cast("double") / F.col("region_cents").cast("double")).alias(
            "share_of_region"
        ),
        (
            F.col("region_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("region_share_of_total"),
        (F.col("cents").cast("double") / F.col("total_cents").cast("double")).alias(
            "share_of_total"
        ),
    )


# ---------------------------------------------------------------------------
# Batch 67 — broadcast-model batch scoring.
# ---------------------------------------------------------------------------


@_q(
    "q_model_score_broadcast",
    """
    WITH x AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS HUGEINT) AS xd,
             CAST(ROUND(value * 100, 0) AS HUGEINT) AS y
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n, SUM(xd) AS sx, SUM(y) AS sy,
             SUM(xd * y) AS sxy, SUM(xd * xd) AS sxx
      FROM x
    ),
    sc AS (
      SELECT (n * sxy - sx * sy) AS num, (n * sxx - sx * sx) AS den,
             n, sx, sy
      FROM m
    ),
    r AS (
      -- residual sign of y_i vs the fitted line, scaled by n*den (exact):
      -- n*den*y_i - n*num*x_i - den*sy + num*sx
      SELECT CASE WHEN n * den * y - n * num * xd - den * sy + num * sx > 0
                  THEN 1 WHEN n * den * y - n * num * xd - den * sy
                              + num * sx < 0 THEN -1 ELSE 0 END AS sgn
      FROM x, sc
    )
    SELECT CAST((SELECT count(*) FROM x) AS BIGINT) AS n_scored,
           CAST((SELECT num FROM sc) AS BIGINT) AS slope_num,
           CAST((SELECT den FROM sc) AS BIGINT) AS slope_den,
           CAST(SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above_line,
           CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_line,
           CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_on_line
    FROM r
    """,
)
def q_model_score_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN-then-SCORE with a broadcast model — the batch-inference
    pattern: fit a global OLS line from exact decimal moments (one
    aggregate), broadcast the 1-row model, and score every event
    map-side. The residual SIGN test cross-multiplies to
    n·den·y − n·num·x − den·Σy + num·Σx (decimal(38,0) headroom), so
    above/below-line counts are exact under any order — no float
    prediction is ever compared. Two passes over the fact table, zero
    extra shuffles (the score pass is map-only + one aggregate)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = ev.select(
        F.expr("CAST(unix_micros(ts) div 86400000000 AS DECIMAL(38,0))").alias(
            "xd"
        ),
        F.round(F.col("value") * 100, 0).cast("decimal(38,0)").alias("y"),
    )
    m = x.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("xd").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("xd") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).cast("decimal(38,0)").alias("sxx"),
    ).select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
    )
    scored = x.crossJoin(F.broadcast(m))
    resid = (
        F.col("n") * F.col("den") * F.col("y")
        - F.col("n") * F.col("num") * F.col("xd")
        - F.col("den") * F.col("sy")
        + F.col("num") * F.col("sx")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.max(F.col("num").cast("long")).alias("slope_num"),
        F.max(F.col("den").cast("long")).alias("slope_den"),
        F.sum(F.when(resid > 0, 1).otherwise(0)).cast("long").alias("n_above_line"),
        F.sum(F.when(resid < 0, 1).otherwise(0)).cast("long").alias("n_below_line"),
        F.sum(F.when(resid == 0, 1).otherwise(0)).cast("long").alias("n_on_line"),
    )


# ---------------------------------------------------------------------------
# Batch 68 — watermark-bounded streaming dedup, partitioned streaming sink.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_dedup_watermarked",
    """
    SELECT CAST(count(DISTINCT (user_id, event_type)) AS BIGINT)
             AS n_distinct_keys,
           CAST(count(*) AS BIGINT) AS n_input
    FROM events
    """,
)
def q_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — the state-BOUNDED streaming dedup
    (Spark 3.5+): duplicate keys are suppressed only within the watermark
    horizon, so state expires instead of growing forever (plain
    dropDuplicates without watermark keeps every key eternally — the
    state-leak q_stream_dedup's watermarked form already avoids; this API
    makes the bound explicit per key arrival). The corpus spans one
    horizon here, so the survivor KEY COUNT equals global distinct — the
    deterministic contract (survivor rows are arrival-order dependent,
    hence the count projection)."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
    )

    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "31 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = run_to_memory(stream)
    n_input = load_table(spark, sf_dir, "events").count()
    return out.agg(
        F.count(F.lit(1)).alias("n_distinct_keys"),
        F.lit(n_input).cast("long").alias("n_input"),
    )


@_q(
    "q_stream_sink_partitioned",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_stream_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned STREAMING sink — writeStream.partitionBy(event_type):
    each micro-batch lands Hive-partitioned, so downstream readers get
    partition pruning on the streaming output exactly as on a batch table
    (the read-back below filters one partition per type and must
    reconcile). The layout decision happens once in the sink config; at
    100 TB/day this is what keeps the streaming lake queryable."""
    import hashlib
    import os

    from etl_pipeline_project_spark.streaming.ops import read_events_stream

    ev = load_table(spark, sf_dir, "events")
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/stream_part_{tag}"
    sink, ckpt = f"{base}/sink", f"{base}/ckpt"
    q = (
        read_events_stream(spark, sf_dir)
        .select("event_id", "event_type")
        .writeStream.format("parquet")
        .partitionBy("event_type")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(sink)
    return back.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


# ---------------------------------------------------------------------------
# Batch 69 — MTD/YTD running totals, business-day arithmetic, aging
# report.
# ---------------------------------------------------------------------------


@_q(
    "q_mtd_ytd",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(SUM(cents) OVER (PARTITION BY date_trunc('month', day)
                                 ORDER BY day) AS BIGINT) AS mtd_cents,
           CAST(SUM(cents) OVER (PARTITION BY date_trunc('quarter', day)
                                 ORDER BY day) AS BIGINT) AS qtd_cents,
           CAST(SUM(cents) OVER (ORDER BY day) AS BIGINT) AS ytd_cents
    FROM daily
    """,
)
def q_mtd_ytd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTD / QTD / YTD running totals — the period-to-date triad every
    finance dashboard renders: three cumulative windows whose PARTITION
    keys are calendar truncations of the same date, over the daily
    aggregate (365 rows — the windows never see the fact table). Exact
    cents; window frames default to RANGE-to-current which is what
    period-to-date means. One year keeps the contract output bounded."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    w_m = Window.partitionBy(F.date_trunc("month", "day")).orderBy("day")
    w_q = Window.partitionBy(F.date_trunc("quarter", "day")).orderBy("day")
    w_y = Window.orderBy("day")
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "cents",
        F.sum("cents").over(w_m).cast("long").alias("mtd_cents"),
        F.sum("cents").over(w_q).cast("long").alias("qtd_cents"),
        F.sum("cents").over(w_y).cast("long").alias("ytd_cents"),
    )


@_q(
    "q_business_days",
    """
    WITH x AS (
      SELECT o_orderdate AS d0, l_shipdate AS d1
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= o_orderdate
    ),
    e AS (
      -- closed-form weekday count over (d0, d1]: f(k) = 5*(k//7) +
      -- least(5, k%7 + 1); bdays = f(cal + w - 1) - f(w - 1), w = isodow
      SELECT date_diff('day', d0, d1) AS cal_days,
             ((date_diff('day', d0, d1) + isodow(d0) - 1) // 7) * 5
             + least(5, (date_diff('day', d0, d1) + isodow(d0) - 1) % 7 + 1)
             - ((isodow(d0) - 1) // 7) * 5
             - least(5, (isodow(d0) - 1) % 7 + 1)
               AS bdays
      FROM x
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(cal_days) AS BIGINT) AS sum_cal_days,
           CAST(SUM(bdays) AS BIGINT) AS sum_business_days,
           CAST(max(cal_days - bdays) AS BIGINT) AS max_weekend_days
    FROM e
    """,
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUSINESS-day interval arithmetic in closed form — weekdays between
    order and ship dates without a calendar-spine join: weekdays((0,n]
    from weekday w) = f(n+w−1) − f(w−1) where f(k) = 5·(k div 7) +
    min(5, k mod 7 + 1), pure integer ops both engines evaluate
    identically (the calendar-table join is the O(span) alternative; the
    closed form is O(1) per row — the difference at 10^12 pairs). SLA
    reporting's canonical date function."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    x = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderdate").alias("d0"), F.col("l_shipdate").alias("d1")
        )
    )
    cal = F.datediff("d1", "d0")
    # Spark: dayofweek is Sun=1..Sat=7; ISO dow = ((dayofweek+5) % 7) + 1
    isodow0 = (F.dayofweek("d0") + 5) % 7 + 1

    def f(k):
        return F.floor(k / 7).cast("long") * 5 + F.least(F.lit(5), k % 7 + 1)

    e = x.select(
        cal.alias("cal_days"),
        (
            f(cal + isodow0 - 1) - f(isodow0 - 1)
        ).alias("bdays"),
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("cal_days").cast("long").alias("sum_cal_days"),
        F.sum("bdays").cast("long").alias("sum_business_days"),
        F.max(F.col("cal_days") - F.col("bdays")).cast("long").alias(
            "max_weekend_days"
        ),
    )


@_q(
    "q_aging_report",
    """
    WITH mx AS (SELECT max(o_orderdate) AS horizon FROM orders),
    aged AS (
      SELECT date_diff('day', o_orderdate, horizon) AS age,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders, mx WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age <= 30 THEN '0-30'
                WHEN age <= 60 THEN '31-60'
                WHEN age <= 90 THEN '61-90'
                ELSE '90+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM aged GROUP BY 1
    """,
)
def q_aging_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Receivables AGING report — open orders bucketed by days outstanding
    at the data horizon (0-30/31-60/61-90/90+), the finance close-process
    standard: age is integer day arithmetic against a broadcast horizon
    scalar, buckets are a first-match cascade, money stays in exact
    cents. One filtered aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("horizon"))
    aged = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff("horizon", "o_orderdate").alias("age"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return aged.groupBy(bucket.alias("age_bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Batch 70 — grouped-map pandas transform, min-max feature scaling.
# ---------------------------------------------------------------------------


@_q(
    "q_grouped_map_pandas",
    """
    WITH o AS (
      SELECT user_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN rn * 2 <= n THEN cents ELSE 0 END) AS BIGINT)
             AS first_half_cents
    FROM o GROUP BY 1
    """,
)
def q_grouped_map_pandas(
    spark: SparkSession, sf_dir: str, *, max_group_rows: int = 5_000_000
) -> DataFrame:
    """Grouped-MAP pandas transform (applyInPandas) — the general
    per-group imperative escape hatch (the UDF surface between scalar
    pandas_udf and cogroup): each user's events arrive as ONE pandas
    frame, get sorted by the total (ts, event_id) order in Python, and
    fold to a per-user summary incl. a sequence-dependent feature (the
    first half of the ordered stream's spend) that a plain aggregate
    can't express without windows. Arrow-batched; groups never cross
    executors; the twin reproduces the fold relationally.

    Memory bound: applyInPandas materializes each GROUP whole in one
    executor — inherent to the API, and the reason the streaming
    sort-merge form (operators/joins.py asof_join_grouped) exists for
    unbounded keys. ``max_group_rows`` guards that honestly (same
    pattern as asof_join_cogroup): a user_id holding more rows than the
    bound (~4 cols × 8 B × 5M ≈ 160 MB of pandas) fails the task with a
    clear error instead of a silent executor OOM. The testdata's
    user_id groups are ~4k rows at sf0.1 (~400k at 100 TB's sf) — far
    inside the default."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select("user_id", "ts", "event_id", "value")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"q_grouped_map_pandas: group user_id="
                f"{pdf['user_id'].iloc[0]} has {len(pdf)} rows > "
                f"max_group_rows={max_group_rows}; use a windowed/"
                "streaming formulation for unbounded keys"
            )
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        cents = (pdf["value"] * 100).round(0).astype("int64")
        n = len(pdf)
        half = n // 2
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "total_cents": [int(cents.sum())],
                "first_half_cents": [int(cents.iloc[:half].sum())],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fold,
        "user_id long, n_events long, total_cents long, first_half_cents long",
    )


@_q(
    "q_minmax_scale",
    """
    WITH b AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             min(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS lo,
             max(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS hi
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(lo) AS BIGINT) AS lo_cents,
           CAST(max(hi) AS BIGINT) AS hi_cents,
           CAST(SUM(CASE WHEN hi > lo
                         THEN ((cents - lo) * 1000000) // (hi - lo)
                         ELSE 0 END) AS BIGINT) AS sum_scaled_ppm
    FROM b GROUP BY 1
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max feature scaling in EXACT integer ppm — (x−min)·10⁶ div
    (max−min) per group: the [0,1] normalization (as parts-per-million
    ints) with zero float division per row, so the scaled features are
    reproducible bit-for-bit on any cluster (q_robust_scaler is the
    outlier-resistant sibling). One event_type exchange shared by the
    min/max window and the final aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = Window.partitionBy("event_type")
    b = ev.select(
        "event_type",
        cents.alias("cents"),
        F.min(cents).over(w).alias("lo"),
        F.max(cents).over(w).alias("hi"),
    )
    scaled = F.when(
        F.col("hi") > F.col("lo"),
        F.expr("((cents - lo) * 1000000) div (hi - lo)"),
    ).otherwise(0)
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lo").cast("long").alias("lo_cents"),
        F.max("hi").cast("long").alias("hi_cents"),
        F.sum(scaled).cast("long").alias("sum_scaled_ppm"),
    )


# ---------------------------------------------------------------------------
# Batch 71 — group-vs-rest comparison, catalog freshness audit.
# ---------------------------------------------------------------------------


@_q(
    "q_group_vs_rest",
    """
    WITH g AS (
      SELECT c_mktsegment AS seg, count(*) AS n,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS s
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    ),
    t AS (SELECT SUM(n) AS tn, SUM(s) AS ts FROM g)
    SELECT seg, CAST(n AS BIGINT) AS n_orders,
           CAST(s AS BIGINT) AS cents,
           -- mean_group vs mean_rest in cross-multiplied exact form:
           -- sign(s*(tn-n) - (ts-s)*n)
           CASE WHEN s * (tn - n) > (ts - s) * n THEN 'above_rest'
                WHEN s * (tn - n) < (ts - s) * n THEN 'below_rest'
                ELSE 'equal' END AS vs_rest,
           CAST(s * (tn - n) - (ts - s) * n AS BIGINT) AS diff_num,
           CAST(n * (tn - n) AS BIGINT) AS diff_den
    FROM g, t
    """,
)
def q_group_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-vs-REST comparison — each segment's mean order value against
    the mean of everyone ELSE (the self-excluding baseline that avoids a
    group diluting its own benchmark): mean_g ⋛ mean_rest cross-multiplies
    to s·(T_n−n) ⋛ (T_s−s)·n, exact integers, with the difference's
    numerator/denominator emitted for downstream magnitude math. One
    aggregate + broadcast totals — the leave-one-group-out pattern at
    group granularity (row granularity is q_target_encode_loo)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    g = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("s"),
        )
    )
    t = g.agg(F.sum("n").alias("tn"), F.sum("s").alias("ts"))
    j = g.crossJoin(F.broadcast(t))
    lhs = F.col("s") * (F.col("tn") - F.col("n"))
    rhs = (F.col("ts") - F.col("s")) * F.col("n")
    return j.select(
        "seg",
        F.col("n").alias("n_orders"),
        F.col("s").alias("cents"),
        F.when(lhs > rhs, "above_rest")
        .when(lhs < rhs, "below_rest")
        .otherwise("equal")
        .alias("vs_rest"),
        (lhs - rhs).cast("long").alias("diff_num"),
        (F.col("n") * (F.col("tn") - F.col("n"))).cast("long").alias("diff_den"),
    )


@_q(
    "q_freshness_audit",
    """
    WITH f AS (
      SELECT 'orders' AS tbl,
             CAST(max(o_orderdate) AS VARCHAR) AS max_event,
             count(*) AS n_rows
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(max(l_shipdate) AS VARCHAR), count(*)
      FROM lineitem
      UNION ALL
      SELECT 'events', CAST(max(CAST(ts AS DATE)) AS VARCHAR), count(*)
      FROM events
    )
    SELECT tbl, max_event, CAST(n_rows AS BIGINT) AS n_rows,
           max_event = max(max_event) OVER () AS is_freshest
    FROM f
    """,
)
def q_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-wide FRESHNESS audit — per table, the latest event-time
    high-water mark and row volume, flagged against the freshest table:
    the staleness monitor a daily pipeline alerts on (a fact table whose
    max date stops advancing is the classic silent-failure signature;
    q_dq_uniqueness is the key-integrity sweep, this is the recency
    sweep). Each probe is a min/max-only scan — parquet footer statistics
    answer it without reading data pages."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    f = (
        orders.agg(
            F.lit("orders").alias("tbl"),
            F.max("o_orderdate").cast("string").alias("max_event"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .unionByName(
            li.agg(
                F.lit("lineitem").alias("tbl"),
                F.max("l_shipdate").cast("string").alias("max_event"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
        .unionByName(
            ev.agg(
                F.lit("events").alias("tbl"),
                F.max(F.col("ts").cast("date")).cast("string").alias("max_event"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )
    )
    return f.select(
        "tbl",
        "max_event",
        "n_rows",
        (
            F.col("max_event")
            == F.max("max_event").over(Window.partitionBy())
        ).alias("is_freshest"),
    )


# ---------------------------------------------------------------------------
# Batch 72 — exchange reuse across CTE references, distinct on complex
# types.
# ---------------------------------------------------------------------------


@_q(
    "q_cte_reuse",
    """
    WITH per_cust AS (
      SELECT o_custkey, count(*) AS n,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1
    ),
    hi AS (SELECT count(*) AS n_hi FROM per_cust
           WHERE cents > (SELECT CAST(SUM(cents) // count(*) AS BIGINT)
                          FROM per_cust))
    SELECT CAST((SELECT count(*) FROM per_cust) AS BIGINT) AS n_customers,
           CAST((SELECT n_hi FROM hi) AS BIGINT) AS n_above_mean,
           CAST((SELECT count(*) FROM per_cust) -
                (SELECT n_hi FROM hi) AS BIGINT) AS n_at_or_below_mean
    """,
)
def q_cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange/subtree REUSE across repeated CTE references: the
    per-customer aggregate feeds three consumers (total count,
    above-mean count, and the mean subquery itself) and the engine
    materializes the shuffle ONCE (ReusedExchange / CTE caching) instead
    of recomputing the fact-table aggregate per reference — the
    difference between 1× and 3× fact scans on a 100 TB table. The
    integer mean threshold uses floor division, identical in both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents"
        ),
    )
    tot = per_cust.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr("CAST(SUM(cents) div count(*) AS BIGINT)").alias("mean_cents"),
    )
    hi = (
        per_cust.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") > F.col("mean_cents"))
        .agg(F.count(F.lit(1)).alias("n_above_mean"))
    )
    return (
        tot.select("n_customers")
        .crossJoin(F.broadcast(hi))
        .select(
            "n_customers",
            "n_above_mean",
            (F.col("n_customers") - F.col("n_above_mean")).alias(
                "n_at_or_below_mean"
            ),
        )
    )


@_q(
    "q_distinct_complex",
    """
    WITH s AS (
      SELECT list_sort(list_distinct(list(o_orderpriority))) AS prios
      FROM orders GROUP BY o_custkey
    )
    SELECT array_to_string(prios, ',') AS prio_set,
           CAST(len(prios) AS BIGINT) AS set_size
    FROM (SELECT DISTINCT prios FROM s)
    """,
)
def q_distinct_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a COMPLEX type: the per-customer priority SET (a
    sorted array — canonical form, since set semantics have no inherent
    order) deduplicated across customers: which distinct priority
    combinations exist at all. Array equality/hashing inside the engine
    does the dedup (no string serialization needed internally — the CSV
    projection exists only for the cross-engine contract). Two
    aggregates: per-customer set build, then distinct on the array."""
    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_custkey").agg(
        F.array_sort(F.collect_set("o_orderpriority")).alias("prios")
    )
    d = s.select("prios").distinct()
    return d.select(
        F.array_join("prios", ",").alias("prio_set"),
        F.size("prios").cast("long").alias("set_size"),
    )


# ---------------------------------------------------------------------------
# Batch 73 — item-item Jaccard similarity, 2-hop graph neighborhoods.
# ---------------------------------------------------------------------------


@_q(
    "q_item_similarity",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey, count(*) AS s FROM b GROUP BY 1),
    pair AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             count(*) AS s_ab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT part_a, part_b, CAST(s_ab AS BIGINT) AS s_ab,
           CAST(ia.s + ib.s - s_ab AS BIGINT) AS s_union,
           CAST(s_ab AS DOUBLE) / CAST(ia.s + ib.s - s_ab AS DOUBLE)
             AS jaccard
    FROM pair JOIN item ia ON part_a = ia.l_partkey
              JOIN item ib ON part_b = ib.l_partkey
    """,
)
def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative similarity — Jaccard of the ORDER SETS of
    co-purchased part pairs, |A∩B| / |A∪B|: the neighborhood model behind
    'customers also bought' (q_assoc_confidence's lift measures
    direction; Jaccard is the symmetric affinity). Supports stay integer;
    the union comes from inclusion-exclusion (no second join), and the
    similarity is one division. Pair blow-up is per-order local, support
    floor prunes the tail."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a = li.alias("a")
    c = li.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("s_ab"))
        .filter(F.col("s_ab") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("s_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("s_b"))
    j = pairs.join(ia, "part_a").join(ib, "part_b")
    union = F.col("s_a") + F.col("s_b") - F.col("s_ab")
    return j.select(
        "part_a",
        "part_b",
        "s_ab",
        union.cast("long").alias("s_union"),
        (F.col("s_ab").cast("double") / union.cast("double")).alias("jaccard"),
    )


@_q(
    "q_graph_2hop",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS src, c.l_partkey AS dst
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey <> c.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    deg AS (SELECT src, count(*) AS n_1hop FROM e GROUP BY 1),
    two AS (
      SELECT e1.src, e2.dst
      FROM e e1 JOIN e e2 ON e1.dst = e2.src
      WHERE e2.dst <> e1.src
    ),
    g AS (SELECT src, count(DISTINCT dst) AS n_2hop FROM two GROUP BY 1)
    SELECT CAST(src AS BIGINT) AS part,
           CAST(n_1hop AS BIGINT) AS n_1hop,
           CAST(n_2hop AS BIGINT) AS n_2hop
    FROM g JOIN deg USING (src)
    """,
)
def q_graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-HOP neighborhood expansion over the co-purchase graph
    (friends-of-friends): one self-join of the support-pruned edge list,
    distinct-counted per source with self-loops excluded — the candidate
    generation step of neighborhood recommenders and the canonical
    'does the pair blow-up stay bounded' graph test (edges are pruned by
    support BEFORE the square; the unpruned square is the mistake).
    Alongside q_graph_triangles (closed wedges) this covers the open-
    wedge side."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    c = li.alias("c")
    e = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("c.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("c.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("n_1hop"))
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    two = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .filter(F.col("e2.dst") != F.col("e1.src"))
        .select(F.col("e1.src").alias("src"), F.col("e2.dst").alias("dst"))
    )
    g = two.groupBy("src").agg(F.countDistinct("dst").alias("n_2hop"))
    return g.join(deg, "src").select(
        F.col("src").cast("long").alias("part"), "n_1hop", "n_2hop"
    )


# ---------------------------------------------------------------------------
# Batch 74 — composition-over-time shares, sweep-line max concurrency.
# ---------------------------------------------------------------------------


@_q(
    "q_composition_shares",
    """
    WITH g AS (
      SELECT year(o_orderdate) AS yr, o_orderpriority,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT CAST(yr AS BIGINT) AS yr, o_orderpriority,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY yr) AS DOUBLE) AS share
    FROM g
    """,
)
def q_composition_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition-over-time: each priority's share WITHIN its year — the
    stacked-area chart feed (q_pct_of_total is the global single-period
    form; partitioning the total by period is what makes mix shifts
    visible). Shares are single integer→double divisions over the
    year-partitioned window on the small rollup; per-year shares sum to
    1 by construction."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"), "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("yr")
    return g.select(
        "yr",
        "o_orderpriority",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias(
            "share"
        ),
    )


@_q(
    "q_max_concurrency",
    """
    WITH spans AS (
      SELECT o_custkey, min(o_orderdate) AS d0, max(o_orderdate) AS d1
      FROM orders GROUP BY 1
    ),
    deltas AS (
      SELECT d0 AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT d1 + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
      SELECT d, SUM(delta) AS net FROM deltas GROUP BY 1
    ),
    run AS (
      SELECT d, SUM(net) OVER (ORDER BY d) AS concurrent FROM daily
    )
    SELECT CAST(max(concurrent) AS BIGINT) AS max_concurrent,
           CAST((SELECT count(*) FROM spans) AS BIGINT) AS n_spans,
           CAST(min(d) AS VARCHAR) AS first_day,
           CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_breakpoints
    FROM run
    """,
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line MAX CONCURRENCY over activity spans (each customer's
    first→last order dates, inclusive): +1 at span start, −1 the day
    after span end, cumulative-sum the breakpoint deltas, take the max —
    O(distinct breakpoints) instead of the span×calendar explosion (the
    interval-overlap JOIN answers per-pair questions, q_interval_overlap;
    the sweep answers the global gauge — concurrent sessions, license
    seats, room occupancy). All-integer counter algebra on the
    date-bounded breakpoint table."""
    orders = load_table(spark, sf_dir, "orders")
    spans = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    deltas = spans.select(F.col("d0").alias("d"), F.lit(1).alias("delta")).unionByName(
        spans.select(F.date_add("d1", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select("d", F.sum("net").over(w).alias("concurrent"))
    stats = run.agg(
        F.max("concurrent").cast("long").alias("max_concurrent"),
        F.min("d").cast("string").alias("first_day"),
    )
    n_spans = spans.agg(F.count(F.lit(1)).alias("n_spans"))
    n_break = daily.agg(F.count(F.lit(1)).alias("n_breakpoints"))
    return (
        stats.crossJoin(F.broadcast(n_spans))
        .crossJoin(F.broadcast(n_break))
        .select("max_concurrent", "n_spans", "first_day", "n_breakpoints")
    )


# ---------------------------------------------------------------------------
# Batch 75 — backlog curve, SLA compliance.
# ---------------------------------------------------------------------------


@_q(
    "q_backlog_curve",
    """
    WITH life AS (
      SELECT o_orderkey, min(o_orderdate) AS placed,
             max(l_shipdate) AS done
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1
    ),
    deltas AS (
      SELECT placed AS d, 1 AS delta FROM life
      UNION ALL
      SELECT done + INTERVAL 1 DAY, -1 FROM life WHERE done >= placed
    ),
    daily AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY 1),
    run AS (SELECT d, SUM(net) OVER (ORDER BY d) AS backlog FROM daily)
    SELECT CAST(max(backlog) AS BIGINT) AS peak_backlog,
           CAST((SELECT count(*) FROM life) AS BIGINT) AS n_orders,
           CAST((SELECT count(*) FROM life WHERE done >= placed) AS BIGINT)
             AS n_closed,
           CAST(min(CASE WHEN backlog = (SELECT max(backlog) FROM run)
                         THEN d END) AS VARCHAR) AS peak_day
    FROM run
    """,
)
def q_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order BACKLOG over time, by interval sweep: +1 the day an
    order is placed, −1 the day after its last line ships — the
    cumulative breakpoint counter yields the backlog curve and its peak
    in O(distinct dates) (the per-day join formulation costs
    days × orders). Orders whose synthetic ship dates precede placement
    never close and stay in the terminal backlog — reported, not hidden
    (n_orders − n_closed). The WIP/throughput gauge of operational
    reporting."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    life = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(orders.o_orderkey)
        .agg(
            F.min("o_orderdate").alias("placed"),
            F.max("l_shipdate").alias("done"),
        )
    )
    closed = life.filter(F.col("done") >= F.col("placed"))
    deltas = life.select(F.col("placed").alias("d"), F.lit(1).alias("delta")).unionByName(
        closed.select(F.date_add("done", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select("d", F.sum("net").over(w).alias("backlog"))
    peak = run.agg(F.max("backlog").alias("peak"))
    peak_day = (
        run.crossJoin(F.broadcast(peak))
        .filter(F.col("backlog") == F.col("peak"))
        .agg(F.min("d").cast("string").alias("peak_day"))
    )
    stats = life.agg(F.count(F.lit(1)).alias("n_orders")).crossJoin(
        F.broadcast(closed.agg(F.count(F.lit(1)).alias("n_closed")))
    )
    return (
        peak.select(F.col("peak").cast("long").alias("peak_backlog"))
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(peak_day))
        .select("peak_backlog", "n_orders", "n_closed", "peak_day")
    )


@_q(
    "q_sla_compliance",
    """
    WITH sla(o_orderpriority, sla_bdays) AS (
      VALUES ('1-URGENT', 5), ('2-HIGH', 10), ('3-MEDIUM', 20),
             ('4-NOT SPECIFIED', 40), ('5-LOW', 60)
    ),
    x AS (
      SELECT o_orderpriority, sla_bdays,
             date_diff('day', o_orderdate, l_shipdate) AS cal,
             isodow(o_orderdate) AS w
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN sla USING (o_orderpriority)
      WHERE l_shipdate >= o_orderdate
    ),
    b AS (
      SELECT o_orderpriority, sla_bdays,
             ((cal + w - 1) // 7) * 5 + least(5, (cal + w - 1) % 7 + 1)
             - ((w - 1) // 7) * 5 - least(5, (w - 1) % 7 + 1) AS bdays
      FROM x
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN bdays <= sla_bdays THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_sla,
           CAST(SUM(CASE WHEN bdays <= sla_bdays THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS compliance
    FROM b GROUP BY 1
    """,
)
def q_sla_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA COMPLIANCE per priority — the composition the pieces exist
    for: inline VALUES policy dim (q_inline_dim_join) × closed-form
    business days (q_business_days) × a single-division compliance rate.
    Per line: business days from order to ship vs the priority's SLA
    budget, all-integer comparison; the dashboard number every ops
    review opens with."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sla = spark.createDataFrame(
        [
            ("1-URGENT", 5),
            ("2-HIGH", 10),
            ("3-MEDIUM", 20),
            ("4-NOT SPECIFIED", 40),
            ("5-LOW", 60),
        ],
        "o_orderpriority string, sla_bdays int",
    )
    x = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sla), "o_orderpriority")
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
    )
    cal = F.datediff("l_shipdate", "o_orderdate")
    w0 = (F.dayofweek("o_orderdate") + 5) % 7 + 1

    def f(k):
        return F.floor(k / 7).cast("long") * 5 + F.least(F.lit(5), k % 7 + 1)

    b = x.select(
        "o_orderpriority",
        "sla_bdays",
        (f(cal + w0 - 1) - f(w0 - 1)).alias("bdays"),
    )
    within = F.when(F.col("bdays") <= F.col("sla_bdays"), 1).otherwise(0)
    return b.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(within).cast("long").alias("n_within_sla"),
        (F.sum(within).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "compliance"
        ),
    )


# ---------------------------------------------------------------------------
# Batch 76 — centered moving average, multi-offset seasonal lags.
# ---------------------------------------------------------------------------


@_q(
    "q_centered_ma",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(SUM(cents) OVER w AS BIGINT) AS ma_num,
           CAST(count(*) OVER w AS BIGINT) AS ma_den,
           CAST(SUM(cents) OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE) AS centered_ma
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
)
def q_centered_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CENTERED 7-day moving average — the trend smoother that does not
    lag the signal (trailing frames shift the trend half a window late;
    the centered ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING frame is the
    decomposition-analysis standard). Edges shrink the window naturally
    (count(*) OVER w is the true denominator — no padding bias). Exact
    integer numerator/denominator emitted beside the single-division
    mean; the window runs over the daily aggregate, not the event
    stream. Completes the frame matrix: trailing / unbounded / RANGE /
    centered."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "cents",
        F.sum("cents").over(w).cast("long").alias("ma_num"),
        F.count(F.lit(1)).over(w).cast("long").alias("ma_den"),
        (
            F.sum("cents").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("centered_ma"),
    )


@_q(
    "q_multi_offset_lags",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(cents - lag(cents, 1) OVER w AS BIGINT) AS dod_cents,
           CAST(cents - lag(cents, 7) OVER w AS BIGINT) AS wow_cents,
           CAST(cents - lag(cents, 14) OVER w AS BIGINT) AS w2w_cents
    FROM daily WINDOW w AS (ORDER BY day)
    """,
)
def q_multi_offset_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-offset seasonal deltas in ONE window pass — day-over-day,
    week-over-week and fortnight comparisons share a single sort (three
    lag() offsets over the same WINDOW spec; re-sorting per offset is
    the naive 3× plan). Integer cent deltas, NULL where the offset
    precedes the series — the period-comparison row every daily KPI
    table carries. The window runs over the day-bounded aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    w = Window.orderBy("day")
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "cents",
        (F.col("cents") - F.lag("cents", 1).over(w)).cast("long").alias("dod_cents"),
        (F.col("cents") - F.lag("cents", 7).over(w)).cast("long").alias("wow_cents"),
        (F.col("cents") - F.lag("cents", 14).over(w)).cast("long").alias("w2w_cents"),
    )


# ---------------------------------------------------------------------------
# Batch 77 — temporal co-occurrence, conversion by entry path.
# ---------------------------------------------------------------------------


@_q(
    "q_temporal_cooccurrence",
    """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id FROM events
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM e a JOIN e b
        ON a.user_id = b.user_id
       AND a.event_id < b.event_id
       AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000
       AND a.event_type < b.event_type
    )
    SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_cooccur
    FROM pairs GROUP BY 1, 2
    """,
)
def q_temporal_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL co-occurrence basket: event-type pairs fired by the same
    user within one hour — market-basket analysis where the basket is a
    TIME WINDOW instead of an order (the cross-sell/context signal for
    behavioral data). The pair join is user-equi + time-band, so the
    blow-up is within-user-within-hour local, never a global product;
    (event_id, type) orderings dedup each unordered pair exactly once.
    One shuffle on user_id; integer-µs band."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (
            F.abs(F.unix_micros(F.col("a.ts")) - F.unix_micros(F.col("b.ts")))
            <= 3600000000
        )
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
    )
    return pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_cooccur")
    )


@_q(
    "q_conversion_by_path",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM seq WHERE rn <= 3 GROUP BY user_id
    ),
    conv AS (
      SELECT user_id, 1 AS converted FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(COALESCE(converted, 0)) AS BIGINT) AS n_converted,
           CAST(SUM(COALESCE(converted, 0)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS conversion_rate
    FROM paths LEFT JOIN conv USING (user_id)
    GROUP BY 1
    """,
)
def q_conversion_by_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate BY ENTRY PATH — which openings convert: the
    first-3-event path (q_session_paths' deterministic reassembly) joined
    against ever-purchased flags, one rate per path (single integer
    division). The onboarding-optimization table: path mining tells you
    what users do first; this key tells you which of those beginnings
    end in revenue. Two user_id-keyed aggregates + one broadcastable
    flag join."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = seq.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    j = paths.join(conv, "user_id", "left")
    return j.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.coalesce("converted", F.lit(0))).cast("long").alias("n_converted"),
        (
            F.sum(F.coalesce("converted", F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


# ---------------------------------------------------------------------------
# Batch 78 — bit-shift decayed frequency, decile spread.
# ---------------------------------------------------------------------------


@_q(
    "q_decayed_frequency",
    """
    WITH mx AS (SELECT max(CAST(ts AS DATE)) AS horizon FROM events),
    w AS (
      SELECT user_id,
             date_diff('day', CAST(ts AS DATE), horizon) // 7 AS age_w
      FROM events, mx
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN age_w >= 20 THEN 0
                         ELSE (1048576 >> age_w) END) AS BIGINT)
             AS decayed_score_fp
    FROM w GROUP BY 1
    """,
)
def q_decayed_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-DECAYED frequency with EXACT half-life weights: each event
    contributes 2^20 >> age_weeks fixed-point units (a one-week half-life
    as a pure integer bit shift — no float exp(), no accumulation-order
    drift, and the score is mergeable across partitions like any integer
    sum). The engagement score that ranks a user active yesterday above
    one equally active last month; weights vanish exactly at 20 weeks.
    One grouped aggregate over a broadcast horizon."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("horizon"))
    w = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.floor(F.datediff("horizon", F.col("ts").cast("date")) / 7)
        .cast("int")
        .alias("age_w"),
    )
    weight = F.when(F.col("age_w") >= 20, F.lit(0)).otherwise(
        F.expr("shiftright(1048576, age_w)")
    )
    return w.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(weight).cast("long").alias("decayed_score_fp"),
    )


@_q(
    "q_decile_spread",
    """
    WITH c AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS v, count(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v,
             SUM(n) OVER (PARTITION BY event_type ORDER BY v) AS cumn,
             SUM(n) OVER (PARTITION BY event_type) AS tot
      FROM c
    ),
    q AS (
      SELECT event_type,
             min(CASE WHEN cumn * 10 >= tot THEN v END) AS p10,
             min(CASE WHEN cumn * 10 >= tot * 9 THEN v END) AS p90
      FROM cum GROUP BY 1
    )
    SELECT event_type, CAST(p10 AS BIGINT) AS p10_cents,
           CAST(p90 AS BIGINT) AS p90_cents,
           CAST(p90 AS DOUBLE) / CAST(p10 AS DOUBLE) AS spread_ratio
    FROM q
    """,
)
def q_decile_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P90/P10 DECILE SPREAD per group — the dispersion/inequality ratio
    (compensation analytics, latency SLOs): both endpoints come from the
    count-based discrete-percentile plan (distinct values collapse
    map-side, integer CDF rule 10·cum ≥ k·n), and the spread is ONE
    division of two exact data values. No sort-based percentile
    buffering anywhere."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = ev.groupBy(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v")
    ).agg(F.count(F.lit(1)).alias("n"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wa = Window.partitionBy("event_type")
    cum = c.select(
        "event_type",
        "v",
        F.sum("n").over(wc).alias("cumn"),
        F.sum("n").over(wa).alias("tot"),
    )
    q = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cumn") * 10 >= F.col("tot"), F.col("v"))).alias(
            "p10"
        ),
        F.min(
            F.when(F.col("cumn") * 10 >= F.col("tot") * 9, F.col("v"))
        ).alias("p90"),
    )
    return q.select(
        "event_type",
        F.col("p10").cast("long").alias("p10_cents"),
        F.col("p90").cast("long").alias("p90_cents"),
        (F.col("p90").cast("double") / F.col("p10").cast("double")).alias(
            "spread_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Batch 79 — one-hot encoding, per-column checksums.
# ---------------------------------------------------------------------------


@_q(
    "q_onehot_encode",
    """
    WITH oh AS (
      SELECT o_custkey,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent,
             CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS high,
             CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS medium,
             CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                  THEN 1 ELSE 0 END AS notspec,
             CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS low
      FROM orders
    )
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(urgent) AS BIGINT) AS n_urgent,
           CAST(SUM(high) AS BIGINT) AS n_high,
           CAST(SUM(medium) AS BIGINT) AS n_medium,
           CAST(SUM(notspec) AS BIGINT) AS n_notspec,
           CAST(SUM(low) AS BIGINT) AS n_low
    FROM oh GROUP BY 1
    """,
)
def q_onehot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-HOT encoding with a DECLARED category vocabulary — the fixed-
    schema form (indicator columns enumerated in code, never inferred:
    schema stability is what lets yesterday's model read today's
    features; pivot-style inference breaks the contract when a category
    vanishes from a batch). Rolled up per customer the indicators become
    count features; row-wise each sums to 1. Map-only encode + one
    grouped aggregate — completes the encoder family (frequency /
    target-LOO / min-max / robust / hashing live in earlier keys)."""
    orders = load_table(spark, sf_dir, "orders")
    cats = {
        "n_urgent": "1-URGENT",
        "n_high": "2-HIGH",
        "n_medium": "3-MEDIUM",
        "n_notspec": "4-NOT SPECIFIED",
        "n_low": "5-LOW",
    }
    aggs = [F.count(F.lit(1)).alias("n_orders")] + [
        F.sum(F.when(F.col("o_orderpriority") == v, 1).otherwise(0))
        .cast("long")
        .alias(k)
        for k, v in cats.items()
    ]
    return orders.groupBy(
        F.col("o_custkey").cast("long").alias("custkey")
    ).agg(*aggs)


@_q(
    "q_column_checksums",
    """
    WITH h AS (
      SELECT
        CAST('o_orderkey' AS VARCHAR) AS col,
        SUM(CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)
                 AS BIGINT) AS HUGEINT)) AS checksum,
        count(o_orderkey) AS n_nonnull
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             SUM(CAST(CAST('0x' || substr(md5(o_orderpriority), 1, 12)
                      AS BIGINT) AS HUGEINT)),
             count(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice_cents',
             SUM(CAST(CAST('0x' || substr(md5(CAST(CAST(ROUND(o_totalprice
                      * 100, 0) AS BIGINT) AS VARCHAR)), 1, 12) AS BIGINT)
                      AS HUGEINT)),
             count(o_totalprice)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             SUM(CAST(CAST('0x' || substr(md5(CAST(o_orderdate AS VARCHAR)),
                      1, 12) AS BIGINT) AS HUGEINT)),
             count(o_orderdate)
      FROM orders
    )
    SELECT col, CAST(checksum AS VARCHAR) AS checksum,
           CAST(n_nonnull AS BIGINT) AS n_nonnull
    FROM h
    """,
)
def q_column_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-COLUMN content checksums — drift LOCALIZATION for
    reconciliation: q_table_checksum says 'the tables differ', this key
    says WHICH column (each column's order-insensitive md5-prefix sum is
    compared independently; a migration that mangled only timestamps
    flags only the date column). Canonical renderings (cents as integers,
    ISO dates) keep the checksum engine-portable; sums are commutative so
    1000 partials merge exactly. ALL columns checksum in ONE scan + ONE
    wide aggregate (the round-3 form unioned one aggregate per column —
    4 scans of the fact table, which at 100 TB multiplies the audit cost
    by the column count); the per-column rows then unpivot from the
    single 1-row result for free."""
    orders = load_table(spark, sf_dir, "orders")

    def cksum(rendered: F.Column):
        # 48-bit prefixes overflow int64 beyond ~10^5 rows: accumulate in
        # decimal(38,0) (exact to ~10^24 rows) and emit the string form
        h = F.conv(F.substring(F.md5(rendered.cast("binary")), 1, 12), 16, 10)
        return (
            F.sum(h.cast("decimal(38,0)")).cast("decimal(38,0)").cast("string")
        )

    probes = [
        ("o_orderkey", F.col("o_orderkey").cast("string"), "o_orderkey"),
        ("o_orderpriority", F.col("o_orderpriority"), "o_orderpriority"),
        (
            "o_totalprice_cents",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
            "o_totalprice",
        ),
        ("o_orderdate", F.col("o_orderdate").cast("string"), "o_orderdate"),
    ]
    agg = orders.agg(
        *[
            c
            for i, (_, rendered, src) in enumerate(probes)
            for c in (
                cksum(rendered).alias(f"c{i}"),
                F.count(src).alias(f"n{i}"),
            )
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col"),
                F.col(f"c{i}").alias("checksum"),
                F.col(f"n{i}").alias("n_nonnull"),
            )
            for i, (name, _, _) in enumerate(probes)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        "r.col", "r.checksum", "r.n_nonnull"
    )


# ---------------------------------------------------------------------------
# Batch 80 — SELECT * EXCEPT projection, all-ties mode.
# ---------------------------------------------------------------------------


@_q(
    "q_select_except",
    """
    SELECT * EXCLUDE (o_comment_hash)
    FROM (
      SELECT o_orderkey, o_orderpriority, o_orderstatus,
             md5(CAST(o_orderkey AS VARCHAR)) AS o_comment_hash
      FROM orders WHERE o_orderkey % 100 = 0
    )
    """,
)
def q_select_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(...) — subtractive projection: keep everything BUT
    the named columns (DuckDB spells it EXCLUDE), the wide-table
    ergonomics that makes 'drop the 3 PII columns from this 400-column
    table' a one-liner instead of a 397-name list — and, unlike an
    explicit list, it keeps passing NEW columns through as the schema
    evolves. Column pruning still reaches the scan: the excluded
    column's expression is never evaluated downstream."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.md5(F.col("o_orderkey").cast("string").cast("binary")).alias(
            "o_comment_hash"
        ),
    )
    wide.createOrReplaceTempView("orders_wide_exc")
    return spark.sql("SELECT * EXCEPT (o_comment_hash) FROM orders_wide_exc")


@_q(
    "q_mode_all_ties",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT user_id, event_type, n,
             max(n) OVER (PARTITION BY user_id) AS mx
      FROM c
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(mx) AS BIGINT) AS mode_count,
           string_agg(CASE WHEN n = mx THEN event_type END, ','
                      ORDER BY event_type) AS modes,
           CAST(SUM(CASE WHEN n = mx THEN 1 ELSE 0 END) AS BIGINT)
             AS n_modes
    FROM m GROUP BY 1
    """,
)
def q_mode_all_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-ties mode: when several values share the maximum frequency,
    emit the COMPLETE mode set as a sorted list (q_agg_mode picks one
    deterministic winner; hiding multimodality is how a 'typical value'
    report lies about a bimodal distribution — n_modes > 1 is itself the
    signal). Frequency table + per-key max window + ordered reassembly,
    all on one user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id")
    m = c.select(
        "user_id", "event_type", "n", F.max("n").over(w).alias("mx")
    )
    return m.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max("mx").cast("long").alias("mode_count"),
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("n") == F.col("mx"), F.col("event_type"))
                )
            ),
            ",",
        ).alias("modes"),
        F.sum(F.when(F.col("n") == F.col("mx"), 1).otherwise(0))
        .cast("long")
        .alias("n_modes"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 81 — streaming near-duplicate detection: the incremental-
# load pattern applied to the LLM-dedup tier (the capability seam between
# the streaming and dedup tiers the round-3 verdict called out).
# ---------------------------------------------------------------------------


@_q(
    "q_stream_neardup",
    f"""
    WITH sh AS (SELECT doc_id, {_SHINGLE_SQL} AS s FROM documents),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             1.0 - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(GREATEST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 1) AS DOUBLE)
               AS jaccard_distance
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard_distance FROM p WHERE jaccard_distance < 0.4
    """,
)
def q_stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash near-dup — documents arrive as file-source
    micro-batches and each batch dedups against the FULL history through a
    persistent signature store (streaming/neardup.py): anti-join gate for
    exactly-once, band-bucket join of new docs vs store for candidates
    (work ∝ batch, never ∝ history), exact shingle verification, appends.
    Two arrival waves + a no-new-files idempotence run; the accumulated
    pair set equals batch `minhash_lsh_pairs` on the whole corpus — same
    seeded hash family across batches — so the exact all-pairs DuckDB twin
    of q_dedup_minhash_lsh is the oracle (recall ≈ 1−1.6e-6 at distance
    < 0.4 with r=2/b=32). Spark streaming state is empty by design: the
    dedup memory lives in the store, which is the only structure that can
    hold a 100 TB corpus' history."""
    import os
    import shutil

    from etl_pipeline_project_spark.streaming.neardup import (
        foreach_batch_neardup,
        neardup_pairs_state,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tag = _fp_tag(sf_dir, "documents")
    base = f"{_SCRATCH}/stream_neardup_{tag}"
    stage, ckpt = f"{base}/stage", f"{base}/ckpt"
    sig_store, pair_store = f"{base}/signatures", f"{base}/pairs"

    def run_stream() -> None:
        q = (
            spark.readStream.schema(docs.schema)
            .parquet(stage)
            .writeStream.foreachBatch(
                foreach_batch_neardup(sig_store, pair_store)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    marker = f"{base}/_staged_complete"
    if not os.path.exists(marker):
        # marker written after BOTH arrival waves: an attempt that died
        # mid-way is discarded whole, never resumed half-staged
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(stage)
        run_stream()  # wave 1 becomes the stored history
        docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(stage)
        run_stream()  # wave 2 dedups against the store, not a corpus rescan
        with open(marker, "w") as fh:
            fh.write("ok")
    run_stream()  # no new files -> no state change (exactly-once)
    return neardup_pairs_state(spark, pair_store)


# ---------------------------------------------------------------------------
# Round-4 batch 82 — training-data shard packing, bipartite degree
# histogram, partition-level checksums.
# ---------------------------------------------------------------------------


@_q(
    "q_shard_manifest",
    """
    WITH c AS (
      SELECT source, doc_id, n_chars,
             COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_excl
      FROM documents
    )
    SELECT source, CAST(cum_excl // 4096 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS shard_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM c GROUP BY 1, 2
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard MANIFEST — pack each source's documents into
    ~4 KiB-budget shards in deterministic doc_id order (the tar/webdataset
    layout step of a training-data pipeline): shard_id = exclusive running
    bytes div budget, so every doc lands in exactly one shard, shards
    close as soon as the budget is crossed, and the assignment is
    reproducible run-to-run (no RNG, no partition-count dependence). One
    per-source window (sources are the natural parallel unit — a skewed
    source streams through the RANGE-free ROWS frame without buffering)
    + one aggregate. At 100 TB this manifest IS the shuffle plan for the
    shard writer; the data itself moves once, directly to shard files."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = docs.withColumn(
        "cum_excl", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    )
    return (
        c.groupBy(
            "source", F.expr("cum_excl div 4096").cast("long").alias("shard_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@_q(
    "q_bipartite_degree",
    """
    WITH deg AS (
      SELECT l_partkey, count(DISTINCT l_suppkey) AS degree
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(min(l_partkey) AS BIGINT) AS min_part,
           CAST(max(l_partkey) AS BIGINT) AS max_part
    FROM deg GROUP BY 1
    """,
)
def q_bipartite_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree DISTRIBUTION of the part–supplier bipartite graph — the
    first diagnostic run on any graph before choosing join strategies
    (a heavy-tailed degree histogram is what tells you a vertex-keyed
    shuffle will skew and wedge-style joins will blow up). Distinct-count
    per part collapses map-side (partial dedup before the exchange), then
    the histogram is a second thin aggregate over one row per part."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    deg = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("degree")
    )
    return deg.groupBy(F.col("degree").cast("long").alias("degree")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
    )


@_q(
    "q_partition_checksums",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CAST('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR)
               ), 1, 12) AS BIGINT) AS HUGEINT)) AS VARCHAR) AS checksum
    FROM orders GROUP BY 1
    """,
)
def q_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-PARTITION content checksums — drift localization along the
    table's physical partition axis (q_table_checksum says the tables
    differ, q_column_checksums says which column, this says which
    partition — so the re-sync recopies one year, not 100 TB). Row
    rendering folds key + money-cents into one md5 prefix; per-year sums
    are commutative decimals, so 1000 partial aggregates merge exactly
    and two engines agree digit-for-digit. One scan, one exchange."""
    orders = load_table(spark, sf_dir, "orders")
    rendered = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"),
    )
    h = F.conv(F.substring(F.md5(rendered.cast("binary")), 1, 12), 16, 10)
    return (
        orders.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(h.cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 batch 83 — exact-money dimension applications: as-of currency
# conversion, progressive bracket decomposition.
# ---------------------------------------------------------------------------


@_q(
    "q_currency_convert",
    """
    WITH fx(yr, mo, rate_num) AS (
      SELECT yr, mo, 80 + ((yr * 12 + mo) % 7)
      FROM (SELECT unnest(range(1990, 2031)) AS yr) y
      CROSS JOIN (SELECT unnest(range(1, 13)) AS mo) m
    ),
    x AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mo,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(x.yr AS BIGINT) AS yr, CAST(x.mo AS BIGINT) AS mo,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CAST(SUM(cents * rate_num // 100) AS BIGINT) AS converted_cents
    FROM x JOIN fx ON x.yr = fx.yr AND x.mo = fx.mo
    GROUP BY 1, 2
    """,
)
def q_currency_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency conversion against a MONTHLY RATE dimension — the exact-
    money discipline applied to a time-varying multiplier: rates live as
    integer basis points (rate_num/100), conversion is per-row integer
    multiply + floor-div (never a float product that drifts between
    engines), and the rate dim (84 rows) broadcasts so the fact table
    joins map-side. The rate table is generated deterministically in both
    engines (80 + (yr*12+mo) mod 7) — the point is the plan shape and the
    exact arithmetic, not real FX data."""
    months = spark.range(1990, 2031).select(
        F.col("id").alias("yr"),
        F.explode(F.sequence(F.lit(1), F.lit(12))).alias("mo"),
    )
    fx = months.withColumn(
        "rate_num", (F.lit(80) + (F.col("yr") * 12 + F.col("mo")) % 7)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    return (
        orders.join(F.broadcast(fx), ["yr", "mo"])
        .groupBy(F.col("yr").cast("long").alias("yr"), F.col("mo").cast("long").alias("mo"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
            F.sum(F.expr("cents * rate_num div 100"))
            .cast("long")
            .alias("converted_cents"),
        )
    )


@_q(
    "q_tax_brackets",
    """
    WITH br(bracket, lo, hi) AS (
      VALUES ('b1_0_100k',        0,      10000000),
             ('b2_100k_200k',     10000000, 20000000),
             ('b3_200k_350k',     20000000, 35000000),
             ('b4_350k_up',       35000000, NULL)
    ),
    x AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT bracket,
           CAST(count(*) FILTER (cents > lo) AS BIGINT) AS n_orders_reaching,
           CAST(SUM(GREATEST(LEAST(cents, COALESCE(hi, cents)) - lo, 0))
                AS BIGINT) AS cents_in_bracket
    FROM x CROSS JOIN br
    GROUP BY bracket, lo, hi
    """,
)
def q_tax_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE BRACKET decomposition — each order's cents split across
    marginal bands (the tax/commission/tiered-pricing computation):
    amount-in-bracket = clamp(cents, lo, hi) − lo, floored at 0, so the
    four bands sum back to the exact order total by construction
    (reconciliation asserted in tests — decompositions that don't
    re-add are how tiered revenue reports silently lose money). The
    4-row bracket dim broadcasts; the fact side is one map pass + one
    grouped aggregate, all integer cents."""
    br = spark.createDataFrame(
        [
            ("b1_0_100k", 0, 10_000_000),
            ("b2_100k_200k", 10_000_000, 20_000_000),
            ("b3_200k_350k", 20_000_000, 35_000_000),
            ("b4_350k_up", 35_000_000, None),
        ],
        "bracket string, lo long, hi long",
    )
    x = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    joined = x.crossJoin(F.broadcast(br))
    in_bracket = F.greatest(
        F.least(F.col("cents"), F.coalesce(F.col("hi"), F.col("cents")))
        - F.col("lo"),
        F.lit(0),
    )
    return joined.groupBy("bracket").agg(
        F.sum(F.when(F.col("cents") > F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_orders_reaching"),
        F.sum(in_bracket).cast("long").alias("cents_in_bracket"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 84 — ops diagnostics: rate-spike alerting on dual RANGE
# frames, shuffle-skew report, session census.
# ---------------------------------------------------------------------------


@_q(
    "q_event_rate_alert",
    """
    WITH hourly AS (
      SELECT event_type, CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, hr, n,
             COALESCE(SUM(n) OVER w, 0) AS base_sum,
             COUNT(n) OVER w AS base_n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, CAST(hr AS BIGINT) AS hr, CAST(n AS BIGINT) AS n,
           CAST(base_sum AS BIGINT) AS base_sum,
           CAST(base_n AS BIGINT) AS base_n,
           (base_n > 0 AND n * base_n > 3 * base_sum) AS spike
    FROM base
    """,
)
def q_event_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-SPIKE alerting: each hour's event count per type compared to
    its own trailing-24h baseline — the first page of any ops runbook.
    The hour axis is an integer (epoch div 3600) so the trailing window
    is a RANGE frame over VALUES, not rows: gap hours genuinely shrink
    the baseline instead of silently stretching it. The spike predicate
    cross-multiplies (n·base_n > 3·base_sum) — zero floats, so both
    engines agree on every boundary case. Hourly pre-aggregation first:
    the window runs over O(types × hours) rows, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    # floor, not cast-truncation: the twin's FLOOR(epoch/3600) rounds toward
    # -inf, so a bare .cast('long') would disagree on pre-1970 timestamps
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-24, -1)
    )
    base = hourly.select(
        "event_type",
        "hr",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("base_sum"),
        F.count("n").over(w).alias("base_n"),
    )
    return base.select(
        "event_type",
        "hr",
        "n",
        F.col("base_sum").cast("long").alias("base_sum"),
        F.col("base_n").cast("long").alias("base_n"),
        (
            (F.col("base_n") > 0)
            & (F.col("n") * F.col("base_n") > 3 * F.col("base_sum"))
        ).alias("spike"),
    )


@_q(
    "q_skew_report",
    """
    WITH per_key AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rk
      FROM per_key
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top1_rows,
           CAST(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) AS BIGINT)
             AS top10_rows,
           (MAX(CASE WHEN rk = 1 THEN n END) * count(*) > 5 * SUM(n))
             AS skewed
    FROM ranked
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-SKEW report for a prospective join/aggregation key — the
    diagnostic you run BEFORE shipping a 100 TB job keyed on user_id:
    key cardinality, total rows, the heaviest key's row count, and the
    top-10 concentration, plus a cross-multiplied skew verdict
    (top1 · n_keys > 5 · n_rows ⇔ the hottest key holds >5× its fair
    share — the threshold where AQE skew-split or salting starts paying).
    Per-key counts partial-aggregate map-side; the ranked scan is over
    one row per key."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(
        Window.orderBy(F.col("n").desc(), F.col("user_id"))
    )
    ranked = per_key.select("n", rk.alias("rk"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max(F.when(F.col("rk") == 1, F.col("n"))).cast("long").alias("top1_rows"),
        F.sum(F.when(F.col("rk") <= 10, F.col("n")).otherwise(0))
        .cast("long")
        .alias("top10_rows"),
        (
            F.max(F.when(F.col("rk") == 1, F.col("n"))) * F.count(F.lit(1))
            > 5 * F.sum("n")
        ).alias("skewed"),
    )


@_q(
    "q_session_census",
    """
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                    - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT user_id, sec,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM x
    ),
    per_sess AS (
      SELECT user_id, sess, count(*) AS n_events,
             max(sec) - min(sec) AS dur_s
      FROM s GROUP BY 1, 2
    )
    SELECT CAST(LEAST(n_events, 10) AS BIGINT) AS events_band,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(SUM(dur_s) AS BIGINT) AS total_duration_s,
           CAST(MAX(dur_s) AS BIGINT) AS max_duration_s
    FROM per_sess GROUP BY 1
    """,
)
def q_session_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session CENSUS — the length/duration distribution of 30-minute-gap
    sessions (how q_sessionize's output is actually consumed: 'are
    sessions getting shorter?'): gap-break flags → running-sum session
    ids → per-session (events, duration) → a banded histogram capped at
    10+ events. The break flag, the session id, and the per-session
    rollup all ride ONE user_id exchange; duration stays in integer
    epoch seconds end-to-end."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # two-step: the break flag is itself a window expression, so the
    # running session id must be computed in a second select (Catalyst
    # still plans both windows on ONE user_id exchange + sort)
    x = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(wo).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(wo))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    s = x.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess"),
    )
    per_sess = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "dur_s"
        ),
    )
    return per_sess.groupBy(
        F.least(F.col("n_events"), F.lit(10)).cast("long").alias("events_band")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_s").cast("long").alias("total_duration_s"),
        F.max("dur_s").cast("long").alias("max_duration_s"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 85 — audience overlap via inverted index.
# ---------------------------------------------------------------------------


@_q(
    "q_audience_overlap",
    """
    WITH m AS (SELECT DISTINCT user_id, event_type FROM events),
    sz AS (SELECT event_type, count(*) AS sz FROM m GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_both
      FROM m a JOIN m b ON a.user_id = b.user_id
      WHERE a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(sa.sz AS BIGINT) AS n_a, CAST(sb.sz AS BIGINT) AS n_b,
           CAST(n_both AS DOUBLE)
             / CAST(sa.sz + sb.sz - n_both AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.event_type = inter.type_a
    JOIN sz sb ON sb.event_type = inter.type_b
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE overlap between event types — pairwise user-set Jaccard
    computed by the inverted-index pattern (shuffle on user_id, count
    co-memberships), never a set×set comparison: the same shape that
    makes q_ngram_jaccard scale, applied to segment analysis. Membership
    dedups map-side; the pair space is types², tiny, while the user
    dimension — the big one — is a single hash exchange. One exact
    integer→double division for the final ratio."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select("user_id", "event_type").distinct()
    sz = m.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a = m.select("user_id", F.col("event_type").alias("type_a"))
    b = m.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    out = (
        inter.join(
            F.broadcast(sz.select(F.col("event_type").alias("type_a"), F.col("sz").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(sz.select(F.col("event_type").alias("type_b"), F.col("sz").alias("n_b"))),
            "type_b",
        )
    )
    return out.select(
        "type_a",
        "type_b",
        F.col("n_both").cast("long").alias("n_both"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("n_both").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 86 — embedding hygiene: per-dimension fixed-point stats,
# dedup threshold sweep.
# ---------------------------------------------------------------------------


@_q(
    "q_embed_dim_stats",
    """
    WITH e AS (
      SELECT i - 1 AS dim,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
                  AS BIGINT) AS q
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(SUM(q) AS HUGEINT) AS VARCHAR) AS sum_micros,
           CAST(SUM(CAST(q AS HUGEINT) * q) AS VARCHAR) AS sumsq_micros
    FROM e GROUP BY 1
    """,
)
def q_embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding statistics — the whitening/normalization
    diagnostic (a dimension whose variance dwarfs the rest dominates every
    cosine; a dead dimension wastes index bits). Components quantize to
    integer micros FIRST, so the sums are exact, order-independent, and
    merge across 1000 partial aggregates without float drift (the same
    fixed-point discipline as the money tier, applied to vectors).
    posexplode → ONE partial+final aggregate keyed by dimension — 64
    groups, map-side combine does nearly all the work."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.round(F.col("e").cast("double") * 1_000_000, 0).cast("long")
    ex = emb.select(F.posexplode("embedding").alias("dim", "e")).select(
        F.col("dim").cast("long").alias("dim"), q.alias("q")
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sum_micros"),
        F.sum((F.col("q").cast("decimal(19,0)") * F.col("q")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("sumsq_micros"),
    )


@_q(
    "q_dedup_threshold_sweep",
    f"""
    WITH sh AS (SELECT doc_id, source, {_SHINGLE_SQL} AS s FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(GREATEST(len(a.s) + len(b.s)
                       - len(list_intersect(a.s, b.s)), 1) AS DOUBLE)
               AS jaccard
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    ),
    th(threshold) AS (SELECT CAST(x AS DOUBLE) FROM (VALUES (0.02), (0.05),
        (0.1), (0.2), (0.4), (0.6), (0.8)) v(x)),
    at AS (
      SELECT threshold, id_a, id_b FROM pairs CROSS JOIN th
      WHERE jaccard >= threshold
    ),
    docs_at AS (
      SELECT threshold, count(DISTINCT d) AS n_docs FROM (
        SELECT threshold, id_a AS d FROM at
        UNION ALL SELECT threshold, id_b FROM at
      ) GROUP BY 1
    )
    SELECT a.threshold, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(ANY_VALUE(n_docs) AS BIGINT) AS n_docs
    FROM at a JOIN docs_at USING (threshold)
    GROUP BY 1
    """,
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup THRESHOLD curve — how many pairs (and how many documents)
    a near-dup pass would touch at each Jaccard cutoff, from ONE pair
    computation: the evidence you choose a dedup aggressiveness with,
    instead of re-running the pipeline per candidate threshold. The pair
    table (source-blocked exact Jaccard, the q_ngram_jaccard plan) is
    computed once and checkpointed; the 7-row threshold dim broadcasts
    over it. Pairs-vs-docs at each cutoff also bounds the removable
    fraction: keep-one-per-pair removes between n_docs/2 and
    n_docs − n_components docs."""
    from etl_pipeline_project_spark.operators.dedup_text import jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, "doc_id", "text", "source", k=3, threshold=0.02
    ).localCheckpoint(eager=False)
    th = spark.createDataFrame(
        [(0.02,), (0.05,), (0.1,), (0.2,), (0.4,), (0.6,), (0.8,)],
        "threshold double",
    )
    at = pairs.crossJoin(F.broadcast(th)).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    n_pairs = at.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    docs_at = (
        at.select(
            "threshold", F.explode(F.array("id_a", "id_b")).alias("d")
        )
        .groupBy("threshold")
        .agg(F.count_distinct("d").alias("n_docs"))
    )
    return n_pairs.join(docs_at, "threshold").select(
        "threshold",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 87 — existence matrix (N semi-joins → one aggregate),
# multi-measure pivot.
# ---------------------------------------------------------------------------


@_q(
    "q_join_existence_matrix",
    """
    WITH flags AS (
      SELECT o_custkey,
             MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS has_urgent,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998
                      THEN 1 ELSE 0 END) AS has_1998
      FROM orders GROUP BY 1
    )
    SELECT (flags.o_custkey IS NOT NULL) AS has_orders,
           COALESCE(has_urgent, 0) = 1 AS has_urgent,
           COALESCE(has_1998, 0) = 1 AS has_1998,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer LEFT JOIN flags ON c_custkey = flags.o_custkey
    GROUP BY 1, 2, 3
    """,
)
def q_join_existence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTENCE matrix — 'which customers have any order / any urgent
    order / any 1998 order' answered with ONE fact aggregate + ONE join
    instead of three EXISTS semi-joins: each extra predicate is one more
    conditional MAX inside the same groupBy, so the fact table shuffles
    once no matter how many existence flags the report needs (three
    semi-joins = three fact shuffles at 100 TB). The per-customer flag
    table is customer-sized and joins broadcast-or-shuffled as AQE
    prefers."""
    orders = load_table(spark, sf_dir, "orders")
    flags = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("has_urgent"),
        F.max(
            F.when(F.year("o_orderdate") == 1998, 1).otherwise(0)
        ).alias("has_1998"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    j = cust.join(flags, cust.c_custkey == flags.o_custkey, "left")
    return j.groupBy(
        F.col("o_custkey").isNotNull().alias("has_orders"),
        (F.coalesce(F.col("has_urgent"), F.lit(0)) == 1).alias("has_urgent"),
        (F.coalesce(F.col("has_1998"), F.lit(0)) == 1).alias("has_1998"),
    ).agg(F.count(F.lit(1)).alias("n_customers"))


@_q(
    "q_pivot_multi_agg",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
             AS urgent_n,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             FILTER (o_orderpriority = '1-URGENT'), 0) AS BIGINT)
             AS urgent_cents,
           CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT)
             AS low_n,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             FILTER (o_orderpriority = '5-LOW'), 0) AS BIGINT)
             AS low_cents
    FROM orders GROUP BY 1
    """,
)
def q_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-MEASURE pivot — two aggregates (count + exact cents) per
    pivoted value in one pass (q_pivot carries one measure; real
    cross-tabs carry several). The pivot values are DECLARED, which is
    the scale contract: no distinct-values pre-scan, stable output schema
    regardless of which slices exist in a partition. Spark evaluates all
    value×measure cells in a single partial+final aggregate; nulls from
    absent slices are canonicalized to 0 so both engines emit identical
    cells."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("yr"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    p = (
        orders.groupBy("yr")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
    )
    return p.select(
        "yr",
        F.coalesce(F.col("`1-URGENT_n`"), F.lit(0)).cast("long").alias("urgent_n"),
        F.coalesce(F.col("`1-URGENT_cents`"), F.lit(0))
        .cast("long")
        .alias("urgent_cents"),
        F.coalesce(F.col("`5-LOW_n`"), F.lit(0)).cast("long").alias("low_n"),
        F.coalesce(F.col("`5-LOW_cents`"), F.lit(0)).cast("long").alias("low_cents"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 88 — streaming SCD2 maintenance.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_scd2",
    """
    WITH runs AS (
      SELECT user_id, ts, event_type, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    ch AS (
      SELECT user_id, ts, event_type, event_id FROM runs
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL AS is_current
    FROM ch
    """,
)
def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 — a Type-2 versioned dimension maintained in
    foreachBatch (streaming/scd2.py): each micro-batch re-derives the
    version chains of ONLY the keys it touches, from stored change points
    ∪ batch events (state is one row per version, never per event; work
    ∝ batch keys). Two event-time-ordered arrival waves + an idempotence
    run; the final store equals the batch lag-collapse derivation over
    all events — the SQL twin. The streaming face of q_scd2_dim, and the
    second instance (after q_stream_neardup) of the incremental-load
    pattern carrying a full oracle."""
    import os
    import shutil

    from etl_pipeline_project_spark.streaming.scd2 import (
        foreach_batch_scd2,
        scd2_state,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/stream_scd2_{tag}"
    stage, ckpt, store = f"{base}/stage", f"{base}/ckpt", f"{base}/store"

    def run_stream() -> None:
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(stage)
            .writeStream.foreachBatch(foreach_batch_scd2(store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    marker = f"{base}/_staged_complete"
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        ev.filter(F.col("ts") < cut).write.mode("overwrite").parquet(stage)
        run_stream()  # wave 1: first half of event time
        ev.filter(F.col("ts") >= cut).write.mode("append").parquet(stage)
        run_stream()  # wave 2 extends/reopens only the touched keys' chains
        with open(marker, "w") as fh:
            fh.write("ok")
    run_stream()  # no new files -> store unchanged (exactly-once)
    return scd2_state(spark, store)


# ---------------------------------------------------------------------------
# Round-4 batch 89 — streaming state-store introspection (State Data
# Source, Spark 4.x).
# ---------------------------------------------------------------------------


@_q(
    "q_state_store_read",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATE-STORE introspection — the streaming ops capability Spark 4
    ships as the State Data Source: after a checkpointed streaming
    aggregation completes, ``spark.read.format("statestore")`` opens the
    operator's state as a plain DataFrame (key struct, value struct,
    partition id). This is how a 100 TB deployment debugs 'why is this
    key's aggregate wrong' or audits state growth WITHOUT adding probes
    to the running query — the state files themselves become a queryable
    table. The state of an availableNow groupBy-count over events must
    equal the batch aggregate exactly, which is the SQL oracle; the
    stream builds once per dataset fingerprint and every later invocation
    reads state only."""
    import os
    import shutil

    from etl_pipeline_project_spark.streaming.ops import read_events_stream

    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/state_read_{tag}"
    ckpt = f"{base}/ckpt"
    marker = f"{base}/_complete"
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        stream = read_events_stream(spark, sf_dir)
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events")
        )
        q = (
            agg.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        with open(marker, "w") as fh:
            fh.write("ok")
    # Touch the StreamingQueryManager before the state read: the State
    # Data Source resolves the StateStoreCoordinator RPC endpoint, which
    # is only registered once the session's streaming machinery
    # initializes — a fresh session that never ran a stream fails with
    # CANNOT_LOAD_STATE_STORE otherwise.
    _ = spark.streams.active
    st = spark.read.format("statestore").load(ckpt)
    # the value struct's field is named by the physical agg function
    # (count), not the query alias — resolve it structurally
    vf = st.schema["value"].dataType.names[0]
    return st.select(
        F.col("key.event_type").alias("event_type"),
        F.col(f"value.{vf}").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 90 — streaming Python DataSource (offset-tracked custom
# source, the Kafka-shaped contract in Python).
# ---------------------------------------------------------------------------


@_q(
    "q_stream_python_source",
    """
    WITH t AS (SELECT unnest(range(0, 1000)) AS id)
    SELECT CAST(id % 7 AS BIGINT) AS mod7,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM((id * id) % 101) AS BIGINT) AS sum_score,
           CAST(min(id) AS BIGINT) AS min_id,
           CAST(max(id) AS BIGINT) AS max_id
    FROM t GROUP BY 1
    """,
)
def q_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Python DataSource — the streaming half of the Spark-4
    Python DataSource API (the batch half is q_scan_python_datasource):
    an offset-tracked custom source with the Kafka-shaped contract
    (initialOffset / read / readBetweenOffsets), drained through a
    checkpointed parquet file sink. Python simple stream readers don't
    support AvailableNow (Spark falls back to single-batch execution), so
    the drain is ceil(total/step) = 4 checkpointed runs — which is
    exactly the demonstration: every restart resumes from the committed
    offset, replay between offsets is exact, and the drained sink holds
    each id exactly once. The deterministic payload gives the stream a
    full SQL oracle; a real deployment swaps the range loop for a REST
    page token / CDC cursor poll."""
    import os
    import shutil

    from etl_pipeline_project_spark.sources.pydatasource import register_stream

    register_stream(spark)
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/pystream_{tag}"
    ckpt, sink = f"{base}/ckpt", f"{base}/sink"
    total, step = 1000, 250

    def run_once() -> None:
        q = (
            spark.readStream.format("pagednumbers_stream")
            .option("total", str(total))
            .option("step", str(step))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)  # falls back to single-batch
            .start()
        )
        q.awaitTermination()

    marker = f"{base}/_drained"
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        for _ in range(total // step):
            run_once()  # each run advances the committed offset one batch
        with open(marker, "w") as fh:
            fh.write("ok")
    run_once()  # offset at total: reads nothing, sink unchanged
    out = spark.read.parquet(sink)
    return out.groupBy("mod7").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score").cast("long").alias("sum_score"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 91 — stream-static point-in-time enrichment.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_pit_enrich",
    """
    WITH dim AS (
      SELECT c_custkey AS user_id, c_mktsegment AS segment,
             TIMESTAMP '1900-01-01 00:00:00' AS valid_from,
             TIMESTAMP '2024-01-15 00:00:00' AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 'POST-' || c_mktsegment,
             TIMESTAMP '2024-01-15 00:00:00',
             TIMESTAMP '9999-12-31 00:00:00'
      FROM customer
    )
    SELECT segment, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from AND e.ts < d.valid_to
    GROUP BY 1
    """,
)
def q_stream_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static POINT-IN-TIME enrichment — each streaming event joins
    the dimension version that was valid AT ITS EVENT TIME (user equi-key
    + interval containment), not the current one: the streaming face of
    q_scd2_pit_join, and the join shape every CDC-fed feature pipeline
    needs ('what segment was this user in when the event happened').
    Stream-static joins accept arbitrary conditions because the static
    side broadcasts and the join is STATELESS — no watermark, no state
    store; interval containment costs nothing beyond the hash probe. The
    versioned dim here is two deterministic versions per customer around
    a mid-January cut; the enriched stream materializes via availableNow
    and the final aggregate equals the batch PIT join — the SQL oracle."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("seg0"),
    )
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    lo = F.lit("1900-01-01 00:00:00").cast("timestamp")
    hi = F.lit("9999-12-31 00:00:00").cast("timestamp")
    dim = cust.select(
        "user_id",
        F.col("seg0").alias("segment"),
        lo.alias("valid_from"),
        cut.alias("valid_to"),
    ).unionByName(
        cust.select(
            "user_id",
            F.concat(F.lit("POST-"), F.col("seg0")).alias("segment"),
            cut.alias("valid_from"),
            hi.alias("valid_to"),
        )
    )
    stream = read_events_stream(spark, sf_dir)
    enriched = stream.join(
        F.broadcast(dim),
        (stream.user_id == dim.user_id)
        & (stream.ts >= dim.valid_from)
        & (stream.ts < dim.valid_to),
    ).select(stream.user_id.alias("user_id"), "segment")
    mat = run_to_memory(enriched)
    return mat.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 92 — capacity-paced backfill ingestion.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_backfill_paced",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
)
def q_stream_backfill_paced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-PACED backfill — ingesting a deep file backlog under
    ``maxFilesPerTrigger`` so one availableNow run drains it as a SERIES
    of bounded micro-batches instead of one giant batch (the difference
    between a backfill that coexists with live traffic and one that
    OOMs the cluster or starves it): the stage is split into 8 files,
    the source admits 2 per micro-batch, and the checkpoint commits
    each batch independently — a crash mid-backfill resumes at the next
    uncommitted batch, never from zero. The drained sink must hold every
    event exactly once (the batch aggregate is the oracle); the ≥4
    micro-batch pacing itself is asserted in tests via the checkpoint's
    commit log."""
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/backfill_{tag}"
    stage, ckpt, sink = f"{base}/stage", f"{base}/ckpt", f"{base}/sink"

    marker = f"{base}/_drained"
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        # a deep backlog: 8 stage files (repartition(8) writes one per task)
        ev.repartition(8).write.mode("overwrite").parquet(stage)
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(stage)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        with open(marker, "w") as fh:
            fh.write("ok")
    out = spark.read.parquet(sink)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Round-4 batch 93 — shared-prefix clustering (crawl-boilerplate blocking).
# ---------------------------------------------------------------------------


@_q(
    "q_prefix_cluster",
    """
    WITH p AS (
      SELECT doc_id, source,
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS pfx
      FROM documents WHERE len(string_split(text, ' ')) >= 5
    )
    SELECT pfx, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(doc_id) AS BIGINT) AS exemplar
    FROM p GROUP BY 1 HAVING count(*) >= 2
    """,
)
def q_prefix_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-PREFIX clustering — documents opening with the same 5 words
    form a cluster (the cheap blocking pass that catches crawl/template
    boilerplate and truncation-duplicates BEFORE any shingling: a
    near-dup whose divergence is only in the tail always shares the
    head). One md5 per doc over the sliced prefix, one grouped aggregate
    with a HAVING-style post-filter — map-only until a single exchange on
    the prefix hash, the same key a 100 TB run would shuffle on to route
    cluster members together. n_sources > 1 flags template text leaking
    across supposedly-independent sources (the cross-source contamination
    smell q_cross_source_dups quantifies pairwise)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    p = docs.filter(F.size(words) >= 5).select(
        "doc_id",
        "source",
        F.md5(
            F.array_join(F.slice(words, 1, 5), " ").cast("binary")
        ).alias("pfx"),
    )
    return (
        p.groupBy("pfx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("exemplar"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Round-5 batch 94 — XML source format, hybrid-search RRF fusion,
# corpus-slice distribution distance, blocking-quality evaluation,
# streaming data-quality gate.
# ---------------------------------------------------------------------------


@_q(
    "q_scan_xml_roundtrip",
    """
    SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
           min(n_name) AS first_nation
    FROM nation GROUP BY 1
    """,
)
def q_scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + scan round-trip — the remaining built-in Spark 4 file
    format after parquet/ORC/CSV/JSON/text/binaryFile (Avro stays
    env-gated; sources/lakehouse.py). Row-tag framing, schema re-inference
    on read-back, explicit casts to pin inferred types; the aggregate runs
    over the XML copy while the oracle reads the original parquet —
    equality proves the round-trip is lossless. Per-session path like
    q_scan_orc_roundtrip (write-then-read is only atomic in-session)."""
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = f"{_SCRATCH}/nation_xml_{spark.sparkContext.applicationId}"
    nat.write.mode("overwrite").format("xml").option("rowTag", "nation").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .load(path)
        .select(
            F.col("n_nationkey").cast("long"),
            F.col("n_name").cast("string"),
            F.col("n_regionkey").cast("long"),
        )
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_nation"),
    )


@_q(
    "q_hybrid_search_rrf",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_toks FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'scan') GROUP BY doc_id, term
    ),
    idf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * 2.2)
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                                  * CAST(n_docs AS DOUBLE) / CAST(total_toks AS DOUBLE)))
               * 1e6, 0) AS BIGINT) AS s_fp
      FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    ),
    bm AS (
      SELECT doc_id, CAST(SUM(s_fp) AS BIGINT) AS bm25_micros
      FROM scored GROUP BY doc_id
      ORDER BY bm25_micros DESC, doc_id LIMIT 20
    ),
    bmr AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY bm25_micros DESC, doc_id)
             AS INTEGER) AS bm25_rank
      FROM bm
    ),
    annq AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    anns AS (
      SELECT e.vec_id AS doc_id,
             {_DOT_SQL.format(a='annq.qvec', b='e.embedding')} AS score
      FROM annq, embeddings e WHERE e.vec_id != 0
    ),
    annr AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
               AS ann_rank
      FROM anns ORDER BY score DESC, doc_id LIMIT 10
    )
    SELECT COALESCE(bmr.doc_id, annr.doc_id) AS doc_id,
           bmr.bm25_rank, annr.ann_rank,
           CAST(COALESCE(1000000 // (60 + bmr.bm25_rank), 0)
                + COALESCE(1000000 // (60 + annr.ann_rank), 0) AS BIGINT)
             AS rrf_ppm
    FROM bmr FULL OUTER JOIN annr ON bmr.doc_id = annr.doc_id
    """,
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion — the standard way to
    combine a lexical (BM25) and a dense (embedding ANN) ranker without
    score calibration (Cormack/Clarke/Buettcher, SIGIR'09): each list
    contributes 1/(k+rank), k=60. Candidates: BM25 top-20 for
    {join, hash, scan} (q_search_bm25's fixed-point scorer) fused with the
    exact top-10 dot-product neighbors of query vector vec_id=0
    (doc_id and vec_id share one id space). Determinism: RRF contributions
    are INTEGER 1e6 div (60+rank) — a monotone integer transform of the
    textbook formula, so the fused ordering is engine-exact with no float
    sum anywhere. Plan: both rank lists are tiny (top-k'd before the
    fusion join), so the fusion is a broadcast full-outer over ≤30 rows
    regardless of corpus size — the ranker stages carry all the scale
    (map-side scored corpus, TakeOrdered)."""
    from etl_pipeline_project_spark.operators.similarity import (
        ann_bruteforce_topk,
    )

    bm = q_search_bm25(spark, sf_dir)
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25_micros").desc(), F.col("doc_id")))
        .cast("int")
        .alias("bm25_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    annr = (
        ann_bruteforce_topk(emb, emb.filter(F.col("vec_id") == 0), k=10)
        .select(F.col("nid").alias("doc_id"), F.col("rank").cast("int").alias("ann_rank"))
    )
    fused = bmr.join(annr, "doc_id", "full_outer")
    contrib = F.coalesce(
        F.expr("1000000 div (60 + bm25_rank)"), F.lit(0)
    ) + F.coalesce(F.expr("1000000 div (60 + ann_rank)"), F.lit(0))
    return fused.select(
        "doc_id", "bm25_rank", "ann_rank", contrib.cast("long").alias("rrf_ppm")
    )


@_q(
    "q_source_tv_distance",
    """
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    counts AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
               FROM toks GROUP BY 1, 2),
    totals AS (SELECT source, CAST(count(*) AS BIGINT) AS t
               FROM toks GROUP BY 1),
    shared AS (
      SELECT a.source AS src_a, b.source AS src_b,
             SUM(ABS(a.c * tb.t - b.c * ta.t)) AS n_shared,
             SUM(a.c) AS ca_shared, SUM(b.c) AS cb_shared
      FROM counts a
      JOIN counts b ON a.term = b.term AND a.source < b.source
      JOIN totals ta ON ta.source = a.source
      JOIN totals tb ON tb.source = b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b,
           CAST(n_shared + (ta.t - ca_shared) * tb.t
                         + (tb.t - cb_shared) * ta.t AS BIGINT) AS tv_num,
           CAST(2 * ta.t * tb.t AS BIGINT) AS tv_denom,
           CAST(n_shared + (ta.t - ca_shared) * tb.t
                         + (tb.t - cb_shared) * ta.t AS DOUBLE)
             / CAST(2 * ta.t * tb.t AS DOUBLE) AS tv_distance
    FROM shared
    JOIN totals ta ON ta.source = src_a
    JOIN totals tb ON tb.source = src_b
    """,
)
def q_source_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the unigram distributions of every
    source pair — the log-free distribution-shift metric for corpus
    mixture analysis (KL/JSD need transcendental logs whose libm rounding
    differs across engines; TV = ½·Σ|p−q| stays rational). Exact integer
    form: |c_a·T_b − c_b·T_a| summed over SHARED terms only (inverted-
    index self-join on term — never a full vocab outer join); the
    one-sided mass folds in algebraically as (T_a−Σc_a_shared)·T_b +
    (T_b−Σc_b_shared)·T_a. Surface: exact integer numerator/denominator
    plus ONE double division (numerators < 2^53 at any tested SF; a
    100 TB corpus would carry them as decimal and split q/r like
    q_time_weighted_avg). Plan: one token shuffle, one term-keyed join,
    one pair-keyed aggregate — O(shared vocab), skew-bounded by the
    stopword head."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    counts = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = toks.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("t"))
    a = counts.select(F.col("source").alias("src_a"), "term", F.col("c").alias("ca"))
    b = counts.select(F.col("source").alias("src_b"), "term", F.col("c").alias("cb"))
    ta = totals.select(F.col("source").alias("src_a"), F.col("t").alias("ta"))
    tb = totals.select(F.col("source").alias("src_b"), F.col("t").alias("tb"))
    shared = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(F.abs(F.col("ca") * F.col("tb") - F.col("cb") * F.col("ta"))).alias("n_shared"),
            F.sum("ca").alias("ca_shared"),
            F.sum("cb").alias("cb_shared"),
        )
    )
    num = (
        F.col("n_shared")
        + (F.col("ta") - F.col("ca_shared")) * F.col("tb")
        + (F.col("tb") - F.col("cb_shared")) * F.col("ta")
    )
    denom = F.lit(2) * F.col("ta") * F.col("tb")
    return (
        shared.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            num.cast("long").alias("tv_num"),
            denom.cast("long").alias("tv_denom"),
            (num.cast("double") / denom.cast("double")).alias("tv_distance"),
        )
    )


@_q(
    "q_blocking_eval",
    f"""
    WITH sh AS (SELECT doc_id, source, {_SHINGLE_SQL} AS s FROM documents),
    truth AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
      WHERE len(a.s) + len(b.s) > 0
        AND 51 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s)
    ),
    p AS (
      SELECT doc_id, source,
             array_to_string(string_split(text, ' ')[1:5], ' ') AS pfx
      FROM documents WHERE len(string_split(text, ' ')) >= 5
    ),
    pred AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM p a JOIN p b ON a.source = b.source AND a.pfx = b.pfx
                       AND a.doc_id < b.doc_id
    ),
    m AS (
      SELECT COALESCE(pred.id_a, truth.id_a) AS id_a,
             pred.id_a IS NOT NULL AS in_pred,
             truth.id_a IS NOT NULL AS in_truth
      FROM pred FULL OUTER JOIN truth
        ON pred.id_a = truth.id_a AND pred.id_b = truth.id_b
    )
    SELECT CAST(COUNT(*) FILTER (in_pred) AS BIGINT) AS n_pred,
           CAST(COUNT(*) FILTER (in_truth) AS BIGINT) AS n_truth,
           CAST(COUNT(*) FILTER (in_pred AND in_truth) AS BIGINT) AS tp,
           CAST(COUNT(*) FILTER (in_pred AND NOT in_truth) AS BIGINT) AS fp,
           CAST(COUNT(*) FILTER (in_truth AND NOT in_pred) AS BIGINT) AS fn,
           CAST(COUNT(*) FILTER (in_pred AND in_truth) AS DOUBLE)
             / NULLIF(COUNT(*) FILTER (in_pred), 0) AS precision_,
           CAST(COUNT(*) FILTER (in_pred AND in_truth) AS DOUBLE)
             / NULLIF(COUNT(*) FILTER (in_truth), 0) AS recall_
    FROM m
    """,
)
def q_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation: precision/recall of the CHEAP
    candidate generator (shared-5-word-prefix blocking, q_prefix_cluster)
    against near-dup ground truth (source-blocked 3-gram Jaccard ≥ 1/50,
    the q_ngram_jaccard regime) — the measurement every dedup pipeline
    needs before trading the shingle pass for a cheaper blocker. The
    threshold compare is cross-multiplied to integers (51·|∩| ≥
    |s_a|+|s_b| ⇔ jaccard ≥ 1/50) so membership is engine-exact;
    precision/recall are single integer→double divisions. Truth pairs
    come from the inverted-index path (explode + term join — no
    all-pairs shingle intersect); DF-pruning drops single-doc shingles.
    One row out: n_pred, n_truth, tp, fp, fn, precision_, recall_."""
    docs = load_table(spark, sf_dir, "documents")
    from etl_pipeline_project_spark.operators.dedup_text import word_shingles

    sh = docs.select(
        "doc_id", "source", word_shingles("text", 3).alias("s")
    ).select("doc_id", "source", "s", F.size("s").alias("sz"))
    ex = sh.select("doc_id", "source", F.explode("s").alias("tok"))
    w = Window.partitionBy("source", "tok")
    ex = ex.withColumn("df_", F.count(F.lit(1)).over(w)).filter(
        F.col("df_") > 1
    ).drop("df_")
    ia = ex.select(F.col("doc_id").alias("id_a"), "source", "tok")
    ib = ex.select(F.col("doc_id").alias("id_b"), "source", "tok")
    inter = (
        ia.join(ib, ["source", "tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sh.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sh.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    truth = (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .filter(
            (F.col("sz_a") + F.col("sz_b") > 0)
            & (F.lit(51) * F.col("n_inter") >= F.col("sz_a") + F.col("sz_b"))
        )
        .select("id_a", "id_b")
    )
    words = F.split(F.col("text"), " ")
    p = docs.filter(F.size(words) >= 5).select(
        "doc_id", "source", F.array_join(F.slice(words, 1, 5), " ").alias("pfx")
    )
    pa = p.select(F.col("doc_id").alias("id_a"), "source", "pfx")
    pb = p.select(F.col("doc_id").alias("id_b"), "source", "pfx")
    pred = (
        pa.join(pb, ["source", "pfx"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    m = pred.withColumn("in_pred", F.lit(True)).join(
        truth.withColumn("in_truth", F.lit(True)),
        ["id_a", "id_b"],
        "full_outer",
    ).select(
        F.coalesce(F.col("in_pred"), F.lit(False)).alias("in_pred"),
        F.coalesce(F.col("in_truth"), F.lit(False)).alias("in_truth"),
    )
    tp = F.sum(F.when(F.col("in_pred") & F.col("in_truth"), 1).otherwise(0)).cast("long")
    n_pred = F.sum(F.when(F.col("in_pred"), 1).otherwise(0)).cast("long")
    n_truth = F.sum(F.when(F.col("in_truth"), 1).otherwise(0)).cast("long")
    return m.agg(
        n_pred.alias("n_pred"),
        n_truth.alias("n_truth"),
        tp.alias("tp"),
        F.sum(F.when(F.col("in_pred") & ~F.col("in_truth"), 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(F.col("in_truth") & ~F.col("in_pred"), 1).otherwise(0)).cast("long").alias("fn"),
    ).select(
        "n_pred",
        "n_truth",
        "tp",
        "fp",
        "fn",
        (F.col("tp").cast("double") / F.nullif(F.col("n_pred"), F.lit(0))).alias("precision_"),
        (F.col("tp").cast("double") / F.nullif(F.col("n_truth"), F.lit(0))).alias("recall_"),
    )


@_q(
    "q_stream_quality_gate",
    """
    SELECT CASE WHEN value IS NULL OR value >= 400 OR user_id % 97 = 0
                THEN 'dlq' ELSE 'good' END AS route,
           CASE WHEN value IS NULL THEN 'null_value'
                WHEN value >= 400 THEN 'out_of_range'
                WHEN user_id % 97 = 0 THEN 'quarantined_user'
                ELSE 'ok' END AS reason,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality gate: each micro-batch is routed through a
    first-match rule chain (null value → bounds → quarantined user) and
    written good/dead-letter WITH the violated rule attached — the
    streaming face of q_dead_letter_route, and the gate every ingest
    pipeline puts in front of a bronze table. Exactly-once without a
    transactional sink: foreachBatch writes each epoch to its own
    partition directory with overwrite, so a replayed batch overwrites
    its own output instead of double-appending (the parquet-level
    idempotence trick; a lakehouse deployment swaps in a MERGE). Two
    arrival waves + a no-new-files re-run prove it; the final per-route/
    reason census equals the batch CASE twin over all events."""
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id", "value"
    )
    tag = _fp_tag(sf_dir, "events")
    base = f"{_SCRATCH}/stream_qgate_{tag}"
    stage, ckpt, store = f"{base}/stage", f"{base}/ckpt", f"{base}/store"

    reason = (
        F.when(F.col("value").isNull(), "null_value")
        .when(F.col("value") >= 400, "out_of_range")
        .when(F.col("user_id") % 97 == 0, "quarantined_user")
        .otherwise("ok")
    )

    def route_batch(batch: DataFrame, epoch_id: int) -> None:
        out = batch.withColumn("reason", reason).withColumn(
            "route",
            F.when(F.col("reason") == "ok", "good").otherwise("dlq"),
        )
        # per-epoch overwrite = replay-idempotent append
        out.write.mode("overwrite").parquet(f"{store}/epoch={epoch_id}")

    def run_stream() -> None:
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(stage)
            .writeStream.foreachBatch(route_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    marker = f"{base}/_staged_complete"
    if not os.path.exists(marker):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        ev.filter(F.col("ts") < cut).write.mode("overwrite").parquet(stage)
        run_stream()
        ev.filter(F.col("ts") >= cut).write.mode("append").parquet(stage)
        run_stream()
        with open(marker, "w") as fh:
            fh.write("ok")
    run_stream()  # no new files -> routed store unchanged (exactly-once)
    routed = spark.read.parquet(store)
    return routed.groupBy("route", "reason").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 95 — M4 visual downsampling, deterministic priority
# sampling, model-calibration bins, data-mixing epoch plan.
# ---------------------------------------------------------------------------


@_q(
    "q_m4_downsample",
    """
    WITH b AS (
      SELECT user_id, event_id, ts, value,
             CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id) AS rf,
        ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS rl,
        ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY value, ts, event_id) AS rmin,
        ROW_NUMBER() OVER (PARTITION BY user_id, bucket ORDER BY value DESC, ts, event_id) AS rmax
      FROM b
    )
    SELECT user_id, bucket, event_id, ts, value,
           rf = 1 AS is_first, rl = 1 AS is_last,
           rmin = 1 AS is_min, rmax = 1 AS is_max
    FROM r WHERE rf = 1 OR rl = 1 OR rmin = 1 OR rmax = 1
    """,
)
def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per series
    and per day bucket keep exactly the first, last, min and max points —
    the four extrema that make a pixel-width-bounded line rendering
    error-free, and the standard TSDB answer to "plot a year of raw
    points". Bucketing uses FLOOR(epoch/86400) (negative-epoch-safe);
    role selection is four ROW_NUMBER ranks with total-order tie-breaks,
    so both engines pick identical rows even on duplicate (value, ts).
    Plan: ONE exchange on (user_id, bucket) reused by all four window
    sorts; output is ≤4 rows per series-bucket regardless of input rate —
    the reduction that keeps a 100 TB scan renderable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("bucket"),
    )
    pk = ["user_id", "bucket"]
    rf = F.row_number().over(Window.partitionBy(*pk).orderBy("ts", "event_id"))
    rl = F.row_number().over(
        Window.partitionBy(*pk).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    )
    rmin = F.row_number().over(
        Window.partitionBy(*pk).orderBy("value", "ts", "event_id")
    )
    rmax = F.row_number().over(
        Window.partitionBy(*pk).orderBy(F.col("value").desc(), "ts", "event_id")
    )
    r = b.select(
        "user_id", "bucket", "event_id", "ts", "value",
        rf.alias("rf"), rl.alias("rl"), rmin.alias("rmin"), rmax.alias("rmax"),
    )
    return r.filter(
        (F.col("rf") == 1) | (F.col("rl") == 1) | (F.col("rmin") == 1) | (F.col("rmax") == 1)
    ).select(
        "user_id", "bucket", "event_id", "ts", "value",
        (F.col("rf") == 1).alias("is_first"),
        (F.col("rl") == 1).alias("is_last"),
        (F.col("rmin") == 1).alias("is_min"),
        (F.col("rmax") == 1).alias("is_max"),
    )


@_q(
    "q_priority_sample",
    """
    WITH pr AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
             CAST(CAST(n_chars AS BIGINT) * 1099511627776 AS BIGINT)
               // (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
               AS priority_q
      FROM documents
    ),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY priority_q DESC, doc_id)
                AS INTEGER) AS rank
      FROM pr
    ),
    tau AS (SELECT priority_q AS tau_q FROM rk WHERE rank = 33)
    SELECT doc_id, source, weight, priority_q, rank, tau.tau_q
    FROM rk, tau WHERE rank <= 32
    """,
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via PRIORITY SAMPLING
    (Duffield/Lund/Thorup, JACM 2007): each item gets priority w/u with
    u uniform in (0,1]; the top-k by priority is a size-k weighted sample
    and the (k+1)-th priority is the estimation threshold τ. Made
    deterministic and engine-exact: u comes from an md5-derived 32-bit
    integer (the q_hash_split discipline) and the priority is the INTEGER
    quotient w·2^40 div (h+1) — no float division anywhere, so rank order
    and τ hash-match across engines and days (reproducible sampling is
    what makes a 100 TB curation run auditable). Plan: map-side scalar
    priorities + one TakeOrdered(33); nothing shuffles but the top rows."""
    docs = load_table(spark, sf_dir, "documents")
    h32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    pr = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        F.expr(
            "CAST(n_chars AS BIGINT) * 1099511627776L div "
            "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) + 1)"
        ).alias("priority_q"),
    )
    rk = pr.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("priority_q").desc(), F.col("doc_id")))
        .cast("int")
        .alias("rank"),
    ).filter(F.col("rank") <= 33)
    tau = rk.filter(F.col("rank") == 33).select(F.col("priority_q").alias("tau_q"))
    return (
        rk.filter(F.col("rank") <= 32)
        .crossJoin(F.broadcast(tau))
        .select("doc_id", "source", "weight", "priority_q", "rank", "tau_q")
    )


@_q(
    "q_calibration_bins",
    """
    WITH s AS (
      SELECT CAST(FLOOR(value * 2000) AS BIGINT) AS score_micro,
             CAST(event_type = 'purchase' AS INTEGER) AS label,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score_micro, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM s
    )
    SELECT CAST((rn - 1) * 10 // n + 1 AS INTEGER) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           CAST(SUM(score_micro) AS BIGINT) AS sum_score_micro,
           CAST(SUM(label) AS DOUBLE) / count(*) AS frac_pos,
           CAST(SUM(score_micro) AS DOUBLE) / count(*) / 1000000 AS mean_score
    FROM rk GROUP BY 1
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration (reliability) table: rank the scored population
    into 10 equal-count bins and compare mean predicted score against
    observed positive rate per bin — the diagram behind every "is the
    model calibrated" review. Proxy model: score = value/500 clamped by
    construction, label = purchase events. Determinism recipe: scores
    quantized to integer micros with FLOOR, bins assigned rank-based
    ((rn−1)·k div n + 1 — the engine-stable ntile), aggregates are
    integer sums with exactly two final divisions. One global sort
    (rank), one aggregate — at scale the rank shuffles once on the
    score, same as any percentile pass."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        F.floor(F.col("value") * 2000).cast("long").alias("score_micro"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
        "event_id",
    )
    w = Window.orderBy("score_micro", "event_id")
    rk = s.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    binc = F.expr("((rn - 1) * 10) div n + 1")
    return (
        rk.groupBy(binc.cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("label").cast("long").alias("n_pos"),
            F.sum("score_micro").cast("long").alias("sum_score_micro"),
        )
        .select(
            "bin",
            "n_rows",
            "n_pos",
            "sum_score_micro",
            (F.col("n_pos").cast("double") / F.col("n_rows")).alias("frac_pos"),
            (
                F.col("sum_score_micro").cast("double") / F.col("n_rows") / F.lit(1000000)
            ).alias("mean_score"),
        )
    )


@_q(
    "q_epoch_plan",
    """
    WITH toks AS (
      SELECT source, count(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_src FROM toks)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, tokens,
           CAST(tokens * 1000000 // total AS BIGINT) AS share_ppm,
           CAST((2 * total) // n_src AS BIGINT) AS planned_tokens,
           CAST(((2 * total) // n_src) * 1000 // tokens AS BIGINT) AS epochs_milli,
           ((2 * total) // n_src) * 1000 // tokens > 4000 AS over_cap
    FROM toks, tot
    """,
)
def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing epoch plan: given a token budget of 2× the corpus and
    a UNIFORM target mixture across sources, how many epochs (repeats)
    of each source does the sampler need? epochs = planned/available —
    >1000 milli-epochs means upsampling (repeat), the >4-epoch flag marks
    sources the plan would over-repeat (the repetition-harm threshold the
    data-recipe literature converges on). All integer division — budget
    allocation must reproduce bit-exact between the planner and the
    sampler job or shard manifests drift. One token-count aggregate per
    source + a broadcast scalar total; O(sources) output."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0))
        )
        .cast("long")
        .alias("tokens"),
    )
    tot = toks.agg(
        F.sum("tokens").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_src"),
    )
    planned = F.expr("(2 * total) div n_src")
    return toks.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        F.expr("tokens * 1000000 div total").cast("long").alias("share_ppm"),
        planned.cast("long").alias("planned_tokens"),
        F.expr("((2 * total) div n_src) * 1000 div tokens")
        .cast("long")
        .alias("epochs_milli"),
        (F.expr("((2 * total) div n_src) * 1000 div tokens") > 4000).alias("over_cap"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 96 — watermarked left-outer stream-stream join, bitemporal
# as-of grid, deterministic k-fold assignment, semi-additive daily balance.
# ---------------------------------------------------------------------------


def _stream_sentinel_build(sf_dir: str):
    """Build fn for the sentinel-closed events stream fixture: the events
    file plus one far-future row per joined side (view + purchase), so
    watermarks advance past every real row and outer/append streaming
    state flushes before availableNow terminates. Shared by
    q_stream_stream_left_join and q_stream_window_append."""
    import datetime
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        shutil.copy(f"{sf_dir}/events.parquet", f"{tmp}/events.parquet")
        schema = pq.ParquetFile(f"{sf_dir}/events.parquet").schema_arrow
        far = datetime.datetime(2024, 12, 31)
        for i, etype in enumerate(("view", "purchase")):
            sent = pa.table(
                {
                    "event_id": pa.array([-1 - i], type=schema.field("event_id").type),
                    "ts": pa.array([far], type=schema.field("ts").type),
                    "user_id": pa.array([-1], type=schema.field("user_id").type),
                    "event_type": pa.array([etype], type=schema.field("event_type").type),
                    "value": pa.array([0.0], type=schema.field("value").type),
                    "props": pa.array(["{}"], type=schema.field("props").type),
                },
                schema=schema,
            )
            pq.write_table(sent, f"{tmp}/events.sentinel{i}.parquet")

    return _build


@_q(
    "q_stream_stream_left_join",
    """
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS vts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id, view_id, purchase_id
    FROM v LEFT JOIN p
      ON v.user_id = p.user_id
     AND pts >= vts AND pts <= vts + INTERVAL 1 HOUR
    """,
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream join (§2.H): every view either attributed
    to the purchases that follow it within 1 hour, or emitted null-padded
    as unconverted — the attribution report batch systems rerun nightly,
    produced incrementally. The outer side is the hard part: Spark emits
    a null-padded row only when the global watermark passes the view's
    last possible match time, so a tail of views normally stays buffered
    forever at end-of-stream. The fixture closes the stream honestly: one
    far-future sentinel row per side (staged atomically next to the
    events file) advances both per-side watermarks past every real row,
    the availableNow no-data final batch flushes the state store, and the
    final table equals the batch LEFT JOIN exactly — hence the full
    oracle. State stays bounded by watermark × horizon per key at any
    scale; sentinels are filtered from the output."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
        stream_stream_attribution,
    )

    stage = _staged_fixture(
        "stream_leftjoin", _fp_tag(sf_dir, "events"), _stream_sentinel_build(sf_dir)
    )
    ev = read_events_stream(spark, stage)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_memory(
            stream_stream_attribution(
                ev.filter(F.col("event_type") == "view"),
                ev.filter(F.col("event_type") == "purchase"),
                how="leftOuter",
            )
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.filter(F.col("v_user") >= 0).select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id"
    )


@_q(
    "q_bitemporal_join",
    """
    WITH grid AS (
      SELECT v_idx, t_idx,
             TIMESTAMP '2024-01-01' + v_idx * INTERVAL 7 DAY AS v_ts,
             TIMESTAMP '2024-01-01' + t_idx * INTERVAL 10 DAY AS t_ts
      FROM (SELECT UNNEST([1,2,3]) AS v_idx), (SELECT UNNEST([1,2,3]) AS t_idx)
    ),
    ver AS (
      SELECT user_id, event_id, value, ts AS valid_from,
             ts + (event_id % 72) * INTERVAL 1 HOUR AS tx_from
      FROM events
    ),
    known AS (
      SELECT g.v_idx, g.t_idx, ver.*,
             ROW_NUMBER() OVER (
               PARTITION BY g.v_idx, g.t_idx, user_id
               ORDER BY valid_from DESC, event_id DESC) AS rn
      FROM ver JOIN grid g
        ON valid_from <= g.v_ts AND tx_from <= g.t_ts
    )
    SELECT v_idx, t_idx, user_id, event_id, value
    FROM known WHERE rn = 1
    """,
)
def q_bitemporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal point-in-time query (Snodgrass two-axis temporal model):
    each event is a VERSION with valid-time start = event time and
    transaction-time start = ingestion time (event time + a deterministic
    0-71 h landing delay), and the query asks, for a 3×3 grid of
    (valid-time V, transaction-time T) anchors, "what was each user's
    state at V, as the warehouse KNEW it at T". Early T anchors therefore
    answer with stale versions — the as-reported-then semantics audit and
    restatement tooling need, one axis more than SCD2's single-timeline
    point-in-time join (q_scd2_pit_join). Plan: a 9-row broadcast grid
    joined to the version scan, then one ROW_NUMBER argmax per (grid
    cell, user) with a total-order tie-break — a single exchange on the
    compound key; grid cells scale the shuffle linearly and independently
    of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    grid = spark.range(1, 4).select(F.col("id").cast("int").alias("v_idx")).crossJoin(
        spark.range(1, 4).select(F.col("id").cast("int").alias("t_idx"))
    ).select(
        "v_idx",
        "t_idx",
        F.expr(
            "TIMESTAMP '2024-01-01' + make_interval(0,0,0, v_idx * 7, 0,0,0)"
        ).alias("v_ts"),
        F.expr(
            "TIMESTAMP '2024-01-01' + make_interval(0,0,0, t_idx * 10, 0,0,0)"
        ).alias("t_ts"),
    )
    ver = ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.expr(
            "ts + make_interval(0,0,0,0, CAST(event_id % 72 AS INT), 0,0)"
        ).alias("tx_from"),
    )
    known = ver.join(
        F.broadcast(grid),
        (F.col("valid_from") <= F.col("v_ts")) & (F.col("tx_from") <= F.col("t_ts")),
    )
    w = Window.partitionBy("v_idx", "t_idx", "user_id").orderBy(
        F.col("valid_from").desc(), F.col("event_id").desc()
    )
    return (
        known.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("v_idx", "t_idx", "user_id", "event_id", "value")
    )


@_q(
    "q_kfold_assign",
    """
    WITH f AS (
      SELECT doc_id, source,
             CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 5 AS INTEGER) AS fold
      FROM documents
    ),
    cell AS (
      SELECT fold, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
      FROM f GROUP BY 1, 2
    ),
    tot AS (SELECT fold, CAST(SUM(n_docs) AS BIGINT) AS fold_total FROM cell GROUP BY 1)
    SELECT cell.fold, source, n_docs, min_doc, max_doc, fold_total,
           CAST(n_docs * 1000000 // fold_total AS BIGINT) AS share_ppm
    FROM cell JOIN tot ON cell.fold = tot.fold
    """,
)
def q_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5): fold =
    md5(doc_id) mod k, so the split reproduces bit-identically on any
    engine, any day, any cluster size — the property that makes CV
    results comparable across reruns of a 100 TB corpus (same discipline
    as q_hash_split's train/val/test fractions, extended to folds). The
    output is the fold × source census with integer ppm shares: the
    evidence a reviewer needs that no fold is source-skewed. Plan:
    map-side fold hashing, one partial/final aggregate, then a fold-level
    re-aggregate joined back (k rows, broadcast) — O(k·sources) output."""
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 5
        )
        .cast("int")
        .alias("fold"),
    )
    cell = f.groupBy("fold", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )
    tot = cell.groupBy("fold").agg(F.sum("n_docs").cast("long").alias("fold_total"))
    return cell.join(F.broadcast(tot), "fold").select(
        "fold",
        "source",
        "n_docs",
        "min_doc",
        "max_doc",
        "fold_total",
        F.expr("n_docs * 1000000 div fold_total").cast("long").alias("share_ppm"),
    )


@_q(
    "q_semi_additive_balance",
    """
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS bal_micro
      FROM events WHERE value IS NOT NULL
    ),
    last_obs AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn
        FROM obs
      ) WHERE rn = 1
    ),
    daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_accounts,
             CAST(SUM(bal_micro) AS BIGINT) AS total_balance_micro
      FROM last_obs GROUP BY 1
    )
    SELECT day, n_accounts, total_balance_micro,
           total_balance_micro
             - LAG(total_balance_micro) OVER (ORDER BY day) AS delta_micro
    FROM daily
    """,
)
def q_semi_additive_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-additive measure rollup (Kimball): balances sum across
    ACCOUNTS but not across TIME, so the daily fact is each account's
    LAST observed balance that day (closing balance), then the day total
    sums those closing balances — never the raw observations. Values are
    quantized to integer micros before any aggregation so 1000 partial
    sums merge without float drift, and the day-over-day delta is an
    integer LAG. Plan: one exchange on (user_id, day) for the closing-
    balance argmax (WindowGroupLimit prunes to the top row per group),
    one partial/final day aggregate, one O(days) window — the third
    shuffle is over ~365 rows/year regardless of account count."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    obs = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000000).cast("long").alias("bal_micro"),
    )
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last_obs = obs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    daily = last_obs.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_accounts"),
        F.sum("bal_micro").cast("long").alias("total_balance_micro"),
    )
    return daily.select(
        "day",
        "n_accounts",
        "total_balance_micro",
        (
            F.col("total_balance_micro")
            - F.lag("total_balance_micro").over(Window.orderBy("day"))
        ).alias("delta_micro"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 97 — parallel LTTB downsampling, n-gram LM pair extraction,
# Poisson bootstrap, rendezvous-hash shard assignment.
# ---------------------------------------------------------------------------


@_q(
    "q_lttb_downsample",
    """
    WITH pts AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS x,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS y,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS bucket
      FROM events WHERE value IS NOT NULL
    ),
    stats AS (
      SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
      FROM pts GROUP BY 1, 2
    ),
    nb AS (
      SELECT user_id, bucket,
             LAG(n)  OVER w AS np, LAG(sx)  OVER w AS sxp, LAG(sy)  OVER w AS syp,
             LEAD(n) OVER w AS nn, LEAD(sx) OVER w AS sxn, LEAD(sy) OVER w AS syn
      FROM stats
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
    ),
    scored AS (
      SELECT p.user_id, p.bucket, p.event_id, p.ts,
             ABS((CAST(sxp AS DOUBLE)/np - CAST(sxn AS DOUBLE)/nn)
                   * (CAST(y AS DOUBLE) - CAST(syp AS DOUBLE)/np)
               - (CAST(sxp AS DOUBLE)/np - CAST(x AS DOUBLE))
                   * (CAST(syn AS DOUBLE)/nn - CAST(syp AS DOUBLE)/np)) AS area2
      FROM pts p JOIN nb USING (user_id, bucket)
      WHERE np IS NOT NULL AND nn IS NOT NULL
    )
    SELECT user_id, bucket, event_id, ts, area2
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, bucket ORDER BY area2 DESC, ts, event_id) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013), the
    PARALLEL variant: classic LTTB anchors each bucket's triangle on the
    previously SELECTED point (inherently sequential), so this uses the
    standard parallelization — anchor on the neighbor buckets' average
    points instead, which decouples every bucket and turns the pass into
    pure dataflow. Per series-day, keep the point maximizing the triangle
    area between the previous bucket's centroid and the next bucket's
    centroid. Determinism: x (whole epoch seconds) and y (value micros)
    are exact integers; centroids and the area are computed by the
    IDENTICAL scalar IEEE expression on both engines (no float
    accumulation — sums are integer, divisions happen in the final
    formula), ties broken by (ts, event_id). Plan: one aggregate on
    (user, bucket), one O(buckets) window per user, one co-keyed join
    back — the per-bucket argmax is WindowGroupLimit-pruned. Complements
    q_m4_downsample: M4 preserves extremes, LTTB preserves shape."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_timestamp("ts").alias("x"),
        F.floor(F.col("value") * 1000000).cast("long").alias("y"),
        F.expr("unix_timestamp(ts) div 86400").alias("bucket"),
    )
    stats = pts.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    nb = stats.select(
        "user_id",
        "bucket",
        F.lag("n").over(w).alias("np"),
        F.lag("sx").over(w).alias("sxp"),
        F.lag("sy").over(w).alias("syp"),
        F.lead("n").over(w).alias("nn"),
        F.lead("sx").over(w).alias("sxn"),
        F.lead("sy").over(w).alias("syn"),
    )
    scored = (
        pts.join(nb, ["user_id", "bucket"])
        .filter(F.col("np").isNotNull() & F.col("nn").isNotNull())
        .select(
            "user_id",
            "bucket",
            "event_id",
            "ts",
            F.abs(
                (
                    F.col("sxp").cast("double") / F.col("np")
                    - F.col("sxn").cast("double") / F.col("nn")
                )
                * (F.col("y").cast("double") - F.col("syp").cast("double") / F.col("np"))
                - (
                    F.col("sxp").cast("double") / F.col("np")
                    - F.col("x").cast("double")
                )
                * (
                    F.col("syn").cast("double") / F.col("nn")
                    - F.col("syp").cast("double") / F.col("np")
                )
            ).alias("area2"),
        )
    )
    wr = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("area2").desc(), "ts", "event_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket", "event_id", "ts", "area2")
    )


@_q(
    "q_ngram_lm_pairs",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type, 3) OVER w AS l3,
             LAG(event_type, 2) OVER w AS l2,
             LAG(event_type, 1) OVER w AS l1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    pairs AS (
      SELECT l3 || ',' || l2 || ',' || l1 AS context, event_type AS target,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM seq WHERE l3 IS NOT NULL GROUP BY 1, 2
    )
    SELECT context, target, n_pairs,
           CAST(SUM(n_pairs) OVER (PARTITION BY context) AS BIGINT) AS ctx_total,
           CAST(n_pairs * 1000000 // SUM(n_pairs) OVER (PARTITION BY context)
                AS BIGINT) AS prob_ppm
    FROM pairs
    """,
)
def q_ngram_lm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-gram language-model estimation from event streams: (3-event
    context → next event) pair counts with conditional probability — the
    "build next-token prediction data from logs" pass, one order deeper
    than q_event_transitions' first-order matrix. Context windows come
    from three LAG columns over the per-user total order (ts, event_id),
    so pair extraction is deterministic and never buffers a whole
    sequence; probabilities are integer ppm (count·1e6 div context
    total). Plan: one exchange on user_id for the lags, one
    map-side-combinable aggregate on (context, target), one O(vocab⁴)-
    bounded window for context totals — at 100 TB the output stays
    |vocab|⁴ no matter the event count."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 3).over(w).alias("l3"),
        F.lag("event_type", 2).over(w).alias("l2"),
        F.lag("event_type", 1).over(w).alias("l1"),
    )
    pairs = (
        seq.filter(F.col("l3").isNotNull())
        .select(
            F.concat_ws(",", "l3", "l2", "l1").alias("context"),
            F.col("event_type").alias("target"),
        )
        .groupBy("context", "target")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    wc = Window.partitionBy("context")
    return pairs.select(
        "context",
        "target",
        "n_pairs",
        F.sum("n_pairs").over(wc).cast("long").alias("ctx_total"),
        F.expr(
            "n_pairs * 1000000 div SUM(n_pairs) OVER (PARTITION BY context)"
        )
        .cast("long")
        .alias("prob_ppm"),
    )


@_q(
    "q_poisson_bootstrap",
    """
    WITH grid AS (SELECT UNNEST(range(32)) AS b),
    draws AS (
      SELECT b, CAST(n_chars AS BIGINT) AS x,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) AS u
      FROM documents CROSS JOIN grid
    ),
    cnt AS (
      SELECT b, x,
             CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1
                  WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3
                  WHEN u < 4279248373 THEN 4 WHEN u < 4292415291 THEN 5
                  WHEN u < 4294609777 THEN 6 WHEN u < 4294923276 THEN 7
                  WHEN u < 4294962463 THEN 8 ELSE 9 END AS c
      FROM draws
    )
    SELECT CAST(b AS INTEGER) AS replica,
           CAST(SUM(c) AS BIGINT) AS n_draws,
           CAST(SUM(c * x) AS BIGINT) AS sum_chars,
           CAST(SUM(c * x) AS DOUBLE) / SUM(c) AS mean_chars
    FROM cnt GROUP BY 1
    """,
)
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the streaming-scale bootstrap: per replica,
    each row is drawn Poisson(1) times instead of exact-n multinomial —
    the only resampling scheme that works in one pass over a distributed
    corpus): 32 replicas of mean document length, giving a CI without
    ever materializing a resample. Determinism: the Poisson draw
    inverse-CDF-inverts an md5-derived 32-bit uniform against
    hard-coded integer thresholds (floor(CDF_Poisson(1)(k)·2³²)), so
    every engine draws the identical counts; replica means are integer
    sums with ONE final division. Plan: a 32-row broadcast grid fans out
    map-side (no shuffle of the corpus ×32 — the explode happens inside
    the scan stage), then one partial/final aggregate to 32 rows."""
    docs = load_table(spark, sf_dir, "documents")
    grid = spark.range(32).select(F.col("id").cast("int").alias("b"))
    draws = docs.crossJoin(F.broadcast(grid)).select(
        "b",
        F.col("n_chars").cast("long").alias("x"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("u"),
    )
    c = (
        F.when(F.col("u") < 1580030168, 0)
        .when(F.col("u") < 3160060337, 1)
        .when(F.col("u") < 3950075421, 2)
        .when(F.col("u") < 4213413783, 3)
        .when(F.col("u") < 4279248373, 4)
        .when(F.col("u") < 4292415291, 5)
        .when(F.col("u") < 4294609777, 6)
        .when(F.col("u") < 4294923276, 7)
        .when(F.col("u") < 4294962463, 8)
        .otherwise(9)
    )
    return (
        draws.select("b", "x", c.alias("c"))
        .groupBy(F.col("b").alias("replica"))
        .agg(
            F.sum("c").cast("long").alias("n_draws"),
            F.sum(F.col("c") * F.col("x")).cast("long").alias("sum_chars"),
        )
        .select(
            "replica",
            "n_draws",
            "sum_chars",
            (F.col("sum_chars").cast("double") / F.col("n_draws")).alias("mean_chars"),
        )
    )


@_q(
    "q_rendezvous_hash",
    """
    WITH nodes AS (SELECT UNNEST(range(5)) AS node),
    sc AS (
      SELECT doc_id, node,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(node AS VARCHAR)), 1, 8)) AS BIGINT) AS w
      FROM documents CROSS JOIN nodes
    ),
    before AS (
      SELECT doc_id, CAST(node AS INTEGER) AS node_before FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w DESC, node) AS rn
        FROM sc
      ) WHERE rn = 1
    ),
    after AS (
      SELECT doc_id, CAST(node AS INTEGER) AS node_after FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w DESC, node) AS rn
        FROM sc WHERE node <> 3
      ) WHERE rn = 1
    )
    SELECT node_before, node_after, CAST(count(*) AS BIGINT) AS n_docs
    FROM before JOIN after USING (doc_id)
    GROUP BY 1, 2
    """,
)
def q_rendezvous_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing — the shard-assignment
    scheme whose defining property is MINIMAL DISRUPTION: when a node
    leaves, exactly the keys that lived on it move, everything else stays
    put (unlike mod-N, which reshuffles almost everything). Each doc
    scores all 5 nodes with an md5-derived weight and lands on the
    argmax; the query recomputes the assignment with node 3 removed and
    emits the (before, after) migration matrix — off-diagonal mass exists
    ONLY in the node_before=3 rows, which the pytest asserts. Plan: a
    5-row broadcast grid fans out map-side, two ROW_NUMBER argmaxes share
    one exchange on doc_id, and the output is ≤ nodes² rows at any corpus
    size. This is the assignment logic a 1000-executor ingest uses to
    route documents to stateful writers without a coordinator."""
    docs = load_table(spark, sf_dir, "documents")
    nodes = spark.range(5).select(F.col("id").cast("int").alias("node"))
    sc = docs.crossJoin(F.broadcast(nodes)).select(
        "doc_id",
        "node",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        F.col("node").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("w"),
    )
    wb = Window.partitionBy("doc_id").orderBy(F.col("w").desc(), "node")
    before = (
        sc.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("node").alias("node_before"))
    )
    after = (
        sc.filter(F.col("node") != 3)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("node").alias("node_after"))
    )
    return (
        before.join(after, "doc_id")
        .groupBy("node_before", "node_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Round-5 batch 98 — experimentation & survey statistics: difference-in-
# differences, delta-method ratio CI, Neyman allocation, PMI collocations.
# ---------------------------------------------------------------------------


@_q(
    "q_diff_in_diff",
    f"""
    WITH base AS (
      SELECT
        CAST(count(*) FILTER (WHERE user_id % 2 = 1 AND day(ts) > 15) AS BIGINT) AS n_t2,
        CAST(count(*) FILTER (WHERE user_id % 2 = 1 AND day(ts) <= 15) AS BIGINT) AS n_t1,
        CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND day(ts) > 15) AS BIGINT) AS n_c2,
        CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND day(ts) <= 15) AS BIGINT) AS n_c1,
        {_msum6("CASE WHEN user_id % 2 = 1 AND day(ts) > 15 THEN value END")} AS s_t2,
        {_msum6("CASE WHEN user_id % 2 = 1 AND day(ts) <= 15 THEN value END")} AS s_t1,
        {_msum6("CASE WHEN user_id % 2 = 0 AND day(ts) > 15 THEN value END")} AS s_c2,
        {_msum6("CASE WHEN user_id % 2 = 0 AND day(ts) <= 15 THEN value END")} AS s_c1
      FROM events WHERE value IS NOT NULL
    )
    SELECT n_t1, n_t2, n_c1, n_c2,
           s_t2 / n_t2 - s_t1 / n_t1 AS delta_treat,
           s_c2 / n_c2 - s_c1 / n_c1 AS delta_ctrl,
           (s_t2 / n_t2 - s_t1 / n_t1) - (s_c2 / n_c2 - s_c1 / n_c1) AS did
    FROM base
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse quasi-experimental
    estimator: treatment group (odd user_id) vs control, pre-period
    (days 1-15) vs post, DiD = (T̄₂−T̄₁) − (C̄₂−C̄₁). All four cells
    come from ONE map-side-combinable pass (conditional counts +
    exact decimal sums — no per-cell rescan), then the estimate is a
    fixed scalar double expression on exactly-agreed inputs. At 100 TB
    this is a single aggregate to one row; the cell layout generalizes
    to any cohort × period grid by adding CASE columns, not passes."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    treat = F.col("user_id") % 2 == 1
    post = F.dayofmonth("ts") > 15
    def cell(cond):
        return (
            F.count(F.when(cond, 1)).cast("long"),
            exact_sum(F.when(cond, F.col("value")), 6),
        )
    base = ev.agg(
        cell(treat & post)[0].alias("n_t2"),
        cell(treat & ~post)[0].alias("n_t1"),
        cell(~treat & post)[0].alias("n_c2"),
        cell(~treat & ~post)[0].alias("n_c1"),
        cell(treat & post)[1].alias("s_t2"),
        cell(treat & ~post)[1].alias("s_t1"),
        cell(~treat & post)[1].alias("s_c2"),
        cell(~treat & ~post)[1].alias("s_c1"),
    )
    dt = F.col("s_t2") / F.col("n_t2") - F.col("s_t1") / F.col("n_t1")
    dc = F.col("s_c2") / F.col("n_c2") - F.col("s_c1") / F.col("n_c1")
    return base.select(
        "n_t1",
        "n_t2",
        "n_c1",
        "n_c2",
        dt.alias("delta_treat"),
        dc.alias("delta_ctrl"),
        (dt - dc).alias("did"),
    )


@_q(
    "q_ratio_delta_method",
    f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp,
             {_msum6("value")} AS x, CAST(count(*) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
             {_msum6("x")} AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             {_msum6("x * x")} AS sxx,
             {_msum6("x * y")} AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM u GROUP BY 1
    )
    SELECT grp, n_users, sx, sy,
           sx / sy AS ratio,
           sqrt(((sxx - 2 * (sx / sy) * sxy + (sx / sy) * (sx / sy) * syy)
                  / (n_users - 1))
                / n_users)
             / (CAST(sy AS DOUBLE) / n_users) AS se
    FROM g
    """,
)
def q_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    event, users as randomization units) — the experimentation-platform
    primitive naive per-row variance gets wrong, because both numerator
    and denominator vary per user. Per group: user-level exact sums
    (x_i, y_i), ratio R = Σx/Σy, and the linearized variance
    Var(x̄ − R·ȳ)/ȳ² via the standard delta expansion — all moments are
    exact decimal/integer sums, the SE is one fixed scalar expression
    (sqrt is IEEE correctly-rounded, hence engine-identical). Plan: one
    exchange on user_id for the unit aggregation, one tiny group
    aggregate — two passes total regardless of corpus size."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        exact_sum(F.col("value"), 6).alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    g = u.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        exact_sum(F.col("x"), 6).alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        exact_sum(F.col("x") * F.col("x"), 6).alias("sxx"),
        exact_sum(F.col("x") * F.col("y"), 6).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    r = F.col("sx") / F.col("sy")
    se = F.sqrt(
        (
            (F.col("sxx") - 2 * r * F.col("sxy") + r * r * F.col("syy"))
            / (F.col("n_users") - 1)
        )
        / F.col("n_users")
    ) / (F.col("sy").cast("double") / F.col("n_users"))
    return g.select("grp", "n_users", "sx", "sy", r.alias("ratio"), se.alias("se"))


@_q(
    "q_neyman_allocation",
    f"""
    WITH s AS (
      SELECT o_orderpriority AS stratum, CAST(count(*) AS BIGINT) AS n_h,
             {_msum6("o_totalprice")} AS s1,
             {_msum6("o_totalprice * o_totalprice")} AS s2
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT stratum, n_h,
             CAST(FLOOR(n_h * sqrt((s2 - s1 * s1 / n_h) / (n_h - 1)))
                  AS BIGINT) AS w_unit
      FROM s
    ),
    t AS (SELECT CAST(SUM(w_unit) AS BIGINT) AS w_tot FROM w)
    SELECT stratum, n_h, w_unit,
           CAST(w_unit * 1000000 // w_tot AS BIGINT) AS share_ppm,
           CAST((1000 * w_unit) // w_tot AS BIGINT)
             + CASE WHEN ROW_NUMBER() OVER (
                      ORDER BY (1000 * w_unit) % w_tot DESC, stratum)
                    <= 1000 - CAST(SUM((1000 * w_unit) // w_tot) OVER () AS BIGINT)
               THEN 1 ELSE 0 END AS n_alloc
    FROM w, t
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified-sampling allocation: a 1000-row audit
    sample is split across order-priority strata proportionally to
    N_h·S_h (stratum size × stratum standard deviation) — the allocation
    that minimizes the estimator's variance, and the reason a 100 TB
    quality audit doesn't sample uniformly. Determinism: variance comes
    from exact decimal power sums, S_h from one correctly-rounded sqrt,
    and the weight is floored to an integer BEFORE the cross-stratum
    total — so the sum is associative-integer, never order-dependent
    float (N_h·S_h is large, so whole units lose nothing; the integer
    headroom bounds: share_ppm needs w·1e6 < 2^63, i.e. Σ N_h·S_h below
    ~9e12 — rescale the weight unit for corpora beyond that). Integer counts are then assigned by largest remainder
    (total-order tie-break), guaranteeing the allocations sum to exactly
    1000. Plan: one aggregate, a broadcast scalar total, an O(strata)
    window — corpus-size-independent output."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        exact_sum(F.col("o_totalprice"), 6).alias("s1"),
        exact_sum(F.col("o_totalprice") * F.col("o_totalprice"), 6).alias("s2"),
    )
    w = s.select(
        "stratum",
        "n_h",
        F.floor(
            F.col("n_h")
            * F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_h"))
                / (F.col("n_h") - 1)
            )
        )
        .cast("long")
        .alias("w_unit"),
    )
    t = w.agg(F.sum("w_unit").cast("long").alias("w_tot"))
    wt = w.crossJoin(F.broadcast(t))
    base = wt.select(
        "stratum",
        "n_h",
        "w_unit",
        F.expr("w_unit * 1000000 div w_tot").cast("long").alias("share_ppm"),
        F.expr("(1000 * w_unit) div w_tot").cast("long").alias("fl"),
        F.expr("(1000 * w_unit) % w_tot").alias("rem"),
    )
    wr = Window.orderBy(F.col("rem").desc(), "stratum")
    wall = Window.partitionBy()
    return base.select(
        "stratum",
        "n_h",
        "w_unit",
        "share_ppm",
        (
            F.col("fl")
            + F.when(
                F.row_number().over(wr)
                <= 1000 - F.sum("fl").over(wall).cast("long"),
                1,
            ).otherwise(0)
        ).alias("n_alloc"),
    )


@_q(
    "q_term_pmi",
    """
    WITH terms AS (
      SELECT DISTINCT doc_id, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM terms GROUP BY 1),
    vocab AS (
      SELECT term, n FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rn FROM df
      ) WHERE rn <= 50
    ),
    post AS (SELECT t.doc_id, t.term, v.n FROM terms t JOIN vocab v USING (term)),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    pairs AS (
      SELECT a.term AS t1, b.term AS t2,
             CAST(count(*) AS BIGINT) AS n_xy,
             CAST(MIN(a.n) AS BIGINT) AS n_x, CAST(MIN(b.n) AS BIGINT) AS n_y
      FROM post a JOIN post b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2
    )
    SELECT t1, t2, n_xy, n_x, n_y,
           CAST(n_xy * n_docs AS DOUBLE) / (n_x * n_y) AS pmi_ratio
    FROM pairs, tot WHERE n_xy >= 5
    """,
)
def q_term_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining over the top-50 vocabulary: for every term
    pair, the pointwise-mutual-information RATIO p(x,y)/(p(x)p(y)) =
    n_xy·N / (n_x·n_y) — phrase/collocation discovery for corpus
    curation, kept log-free so the score is an exact integer ratio with
    ONE final double division (ranking by pmi_ratio ≡ ranking by PMI,
    log is monotone). Scale discipline: the vocabulary is CAPPED (top-50
    by document frequency, total-order tie-break) and broadcast, so the
    posting self-join explodes at most vocab²/2 pairs per document —
    never the raw term×term blow-up; co-occurrence counts are one
    map-side-combinable aggregate. The same shape at 100 TB just raises
    the vocab cap."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    ).distinct()
    df = terms.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    vocab = (
        df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("n").desc(), "term"))
        )
        .filter(F.col("rn") <= 50)
        .select("term", "n")
    )
    post = terms.join(F.broadcast(vocab), "term").select("doc_id", "term", "n")
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    a = post.select(
        "doc_id", F.col("term").alias("t1"), F.col("n").alias("na")
    )
    b = post.select(
        "doc_id", F.col("term").alias("t2"), F.col("n").alias("nb")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_xy"),
            F.min("na").cast("long").alias("n_x"),
            F.min("nb").cast("long").alias("n_y"),
        )
        .filter(F.col("n_xy") >= 5)
    )
    return pairs.crossJoin(F.broadcast(tot)).select(
        "t1",
        "t2",
        "n_xy",
        "n_x",
        "n_y",
        (
            (F.col("n_xy") * F.col("n_docs")).cast("double")
            / (F.col("n_x") * F.col("n_y"))
        ).alias("pmi_ratio"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 99 — experiment analysis completions: CUPED variance
# reduction, MDE power analysis, quantile treatment effects,
# post-stratified ATE.
# ---------------------------------------------------------------------------


@_q(
    "q_cuped",
    f"""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp,
             {_msum6("CASE WHEN day(ts) <= 15 THEN value END")} AS x,
             {_msum6("CASE WHEN day(ts) > 15 THEN value END")} AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
      HAVING count(*) FILTER (WHERE day(ts) <= 15) > 0
         AND count(*) FILTER (WHERE day(ts) > 15) > 0
    ),
    pool AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {_msum6("x")} AS sx, {_msum6("y")} AS sy,
             {_msum6("x * y")} AS sxy, {_msum6("x * x")} AS sxx
      FROM u
    ),
    th AS (
      SELECT n, sx / n AS xbar,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta
      FROM pool
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
             {_msum6("x")} AS gx, {_msum6("y")} AS gy
      FROM u GROUP BY 1
    )
    SELECT grp, n_users, theta,
           gy / n_users AS mean_y,
           gy / n_users - theta * (gx / n_users - xbar) AS mean_y_adj
    FROM g, th
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. WSDM'13) — the industry-standard variance-reduction adjustment:
    regress the experiment metric on a pre-period covariate (θ =
    cov(X,Y)/var(X), pooled) and report each group's adjusted mean
    ȳ_g − θ(x̄_g − x̄). Pre-period = days 1-15 per user, outcome = days
    16-30; users lacking either period are excluded (the standard CUPED
    cohort rule). All moments are exact decimal sums; θ and the adjusted
    means are fixed scalar expressions — engine-identical doubles. Plan:
    one exchange on user_id (unit aggregation with conditional sums in
    the SAME pass), then two tiny aggregates and a broadcast scalar —
    nothing rescans the fact table."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pre = F.dayofmonth("ts") <= 15
    u = (
        ev.groupBy("user_id", (F.col("user_id") % 2).cast("int").alias("grp"))
        .agg(
            exact_sum(F.when(pre, F.col("value")), 6).alias("x"),
            exact_sum(F.when(~pre, F.col("value")), 6).alias("y"),
            F.count(F.when(pre, 1)).alias("n_pre"),
            F.count(F.when(~pre, 1)).alias("n_post"),
        )
        .filter((F.col("n_pre") > 0) & (F.col("n_post") > 0))
        .select("user_id", "grp", "x", "y")
    )
    pool = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        exact_sum(F.col("x"), 6).alias("sx"),
        exact_sum(F.col("y"), 6).alias("sy"),
        exact_sum(F.col("x") * F.col("y"), 6).alias("sxy"),
        exact_sum(F.col("x") * F.col("x"), 6).alias("sxx"),
    )
    th = pool.select(
        "n",
        (F.col("sx") / F.col("n")).alias("xbar"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("theta"),
    )
    g = u.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        exact_sum(F.col("x"), 6).alias("gx"),
        exact_sum(F.col("y"), 6).alias("gy"),
    )
    return g.crossJoin(F.broadcast(th)).select(
        "grp",
        "n_users",
        "theta",
        (F.col("gy") / F.col("n_users")).alias("mean_y"),
        (
            F.col("gy") / F.col("n_users")
            - F.col("theta") * (F.col("gx") / F.col("n_users") - F.col("xbar"))
        ).alias("mean_y_adj"),
    )


@_q(
    "q_mde_power",
    f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             {_msum6("value")} AS s1, {_msum6("value * value")} AS s2
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n,
           s1 / n AS mean,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd,
           (1.959963984540054 + 0.8416212335729143)
             * sqrt(2 * ((s2 - s1 * s1 / n) / (n - 1)) / (n // 2)) AS mde_abs,
           (1.959963984540054 + 0.8416212335729143)
             * sqrt(2 * ((s2 - s1 * s1 / n) / (n - 1)) / (n // 2))
             / (s1 / n) AS mde_rel
    FROM g
    """,
)
def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect (power analysis) per metric segment:
    with the observed n and variance, the smallest true lift a 50/50
    two-sample test detects at α=0.05 / power 0.8 — MDE =
    (z_{0.975}+z_{0.8})·√(2σ²/(n/2)), the go/no-go arithmetic every
    experiment review starts with. The z constants are exact double
    LITERALS (no inverse-normal evaluation at query time), variance
    comes from exact decimal power sums in one pass, and the MDE is a
    fixed scalar expression with correctly-rounded sqrt — deterministic
    on any engine. Plan: one map-side-combinable aggregate; O(segments)
    output."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        exact_sum(F.col("value"), 6).alias("s1"),
        exact_sum(F.col("value") * F.col("value"), 6).alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    zsum = F.lit(1.959963984540054) + F.lit(0.8416212335729143)
    mde = zsum * F.sqrt(2 * var / F.expr("n div 2"))
    return g.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(var).alias("sd"),
        mde.alias("mde_abs"),
        (mde / (F.col("s1") / F.col("n"))).alias("mde_rel"),
    )


@_q(
    "q_quantile_treatment_effect",
    """
    WITH v AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS grp, value,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, value, c,
             SUM(c) OVER (PARTITION BY grp ORDER BY value) AS cum,
             SUM(c) OVER (PARTITION BY grp) AS n
      FROM v
    ),
    pgrid AS (SELECT UNNEST([25, 50, 75, 90]) AS p),
    hit AS (
      SELECT p, grp, MIN(value) AS q
      FROM cum JOIN pgrid ON cum * 100 >= p * n
      GROUP BY 1, 2
    )
    SELECT CAST(p AS INTEGER) AS p,
           MIN(CASE WHEN grp = 1 THEN q END) AS q_treat,
           MIN(CASE WHEN grp = 0 THEN q END) AS q_ctrl,
           MIN(CASE WHEN grp = 1 THEN q END)
             - MIN(CASE WHEN grp = 0 THEN q END) AS qte
    FROM hit GROUP BY 1
    """,
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — where in the distribution the
    treatment moves mass (a mean shift can hide a tail effect): QTE(p) =
    q_treat(p) − q_ctrl(p) at p ∈ {25,50,75,90}. Quantiles use the
    count-based discrete rule (smallest value with cum·100 ≥ p·n, exact
    integer comparison — no interpolation, no per-group sort buffering:
    the same scale-safe recipe as q_percentile_disc), so every output is
    a real data value and the effect is a subtraction of two
    exactly-agreed doubles. Plan: map-side collapse to distinct values,
    one cumulative window per group, a 4-row broadcast grid — the fact
    table is read once."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.groupBy(
        (F.col("user_id") % 2).cast("int").alias("grp"), "value"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.partitionBy("grp").orderBy("value")
    cum = v.select(
        "grp",
        "value",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n"),
    )
    pgrid = spark.createDataFrame([(25,), (50,), (75,), (90,)], "p int")
    hit = (
        cum.join(F.broadcast(pgrid), F.col("cum") * 100 >= F.col("p") * F.col("n"))
        .groupBy("p", "grp")
        .agg(F.min("value").alias("q"))
    )
    return hit.groupBy("p").agg(
        F.min(F.when(F.col("grp") == 1, F.col("q"))).alias("q_treat"),
        F.min(F.when(F.col("grp") == 0, F.col("q"))).alias("q_ctrl"),
        (
            F.min(F.when(F.col("grp") == 1, F.col("q")))
            - F.min(F.when(F.col("grp") == 0, F.col("q")))
        ).alias("qte"),
    )


@_q(
    "q_post_stratified_ate",
    f"""
    WITH cells AS (
      SELECT event_type AS stratum, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(count(*) AS BIGINT) AS n, {_msum6("value")} AS s
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    wide AS (
      SELECT stratum,
             MIN(CASE WHEN grp = 1 THEN n END) AS n_t,
             MIN(CASE WHEN grp = 0 THEN n END) AS n_c,
             MIN(CASE WHEN grp = 1 THEN s END) AS s_t,
             MIN(CASE WHEN grp = 0 THEN s END) AS s_c
      FROM cells GROUP BY 1
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(SUM(n_t + n_c) AS BIGINT) AS n_total,
             CAST(SUM(n_t) AS BIGINT) AS nt_total,
             CAST(SUM(n_c) AS BIGINT) AS nc_total,
             {_msum6("s_t")} AS st_total, {_msum6("s_c")} AS sc_total,
             list({{'k': stratum,
                   'w': CAST(n_t + n_c AS DOUBLE),
                   'd': s_t / n_t - s_c / n_c}} ORDER BY stratum) AS cells
      FROM wide
    )
    SELECT n_strata, n_total,
           st_total / nt_total - sc_total / nc_total AS naive_diff,
           list_reduce(list_prepend(0e0, list_transform(cells,
               c -> c.w / n_total * c.d)),
             (acc, x) -> acc + x) AS ate
    FROM folded
    """,
)
def q_post_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified average treatment effect: the per-stratum
    treatment-minus-control differences, weighted by stratum share —
    the adjustment that removes composition bias when assignment is
    imbalanced across segments (vs the naive pooled difference, emitted
    alongside for contrast). Determinism: per-cell means come from exact
    sums; the cross-strata weighted sum folds in SORTED stratum order
    (the q_chi_square sorted-fold recipe), so the double accumulation
    has ONE association order on both engines. Plan: one conditional
    aggregate to strata × 2 cells, then O(strata) list fold — the fact
    table is scanned once."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = ev.groupBy(
        F.col("event_type").alias("stratum"),
        (F.col("user_id") % 2).cast("int").alias("grp"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        exact_sum(F.col("value"), 6).alias("s"),
    )
    wide = cells.groupBy("stratum").agg(
        F.min(F.when(F.col("grp") == 1, F.col("n"))).alias("n_t"),
        F.min(F.when(F.col("grp") == 0, F.col("n"))).alias("n_c"),
        F.min(F.when(F.col("grp") == 1, F.col("s"))).alias("s_t"),
        F.min(F.when(F.col("grp") == 0, F.col("s"))).alias("s_c"),
    )
    folded = wide.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum(F.col("n_t") + F.col("n_c")).cast("long").alias("n_total"),
        F.sum("n_t").cast("long").alias("nt_total"),
        F.sum("n_c").cast("long").alias("nc_total"),
        exact_sum(F.col("s_t"), 6).alias("st_total"),
        exact_sum(F.col("s_c"), 6).alias("sc_total"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("stratum").alias("k"),
                    (F.col("n_t") + F.col("n_c")).cast("double").alias("w"),
                    (
                        F.col("s_t") / F.col("n_t") - F.col("s_c") / F.col("n_c")
                    ).alias("d"),
                )
            )
        ).alias("cells"),
    )
    contrib = F.transform(
        F.col("cells"), lambda c: c["w"] / F.col("n_total") * c["d"]
    )
    return folded.select(
        "n_strata",
        "n_total",
        (
            F.col("st_total") / F.col("nt_total")
            - F.col("sc_total") / F.col("nc_total")
        ).alias("naive_diff"),
        F.aggregate(contrib, F.lit(0.0), lambda acc, x: acc + x).alias("ate"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 100 — Shapley attribution over the exposure lattice, KMV
# sketch set-algebra, uplift deciles, two-proportion z-test.
# ---------------------------------------------------------------------------


@_q(
    "q_shapley_attribution",
    """
    WITH u AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END)
               + MAX(CASE WHEN event_type = 'view'   THEN 2 ELSE 0 END)
               + MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END)
               AS INTEGER) AS mask,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS INTEGER) AS conv
      FROM events GROUP BY 1
    ),
    cm AS (SELECT mask, CAST(SUM(conv) AS BIGINT) AS conv FROM u GROUP BY 1),
    sets AS (SELECT UNNEST(range(8)) AS s),
    v AS (
      SELECT s, CAST(COALESCE(SUM(cm.conv), 0) AS BIGINT) AS v
      FROM sets LEFT JOIN cm ON (cm.mask & ~CAST(s AS INTEGER)) = 0
      GROUP BY 1
    ),
    ch AS (SELECT UNNEST([1, 2, 4]) AS bit, UNNEST(['click','view','signup']) AS channel),
    marg AS (
      SELECT ch.channel,
             CAST(SUM((CASE WHEN vs.s IN (0, 7 - ch.bit) THEN 2 ELSE 1 END)
                      * (vi.v - vs.v)) AS BIGINT) AS shapley_sixths
      FROM ch
      JOIN v vs ON (vs.s & ch.bit) = 0
      JOIN v vi ON vi.s = vs.s + ch.bit
      GROUP BY 1
    )
    SELECT channel, shapley_sixths,
           CAST(shapley_sixths AS DOUBLE) / 6 AS shapley
    FROM marg
    """,
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value marketing attribution over the 3-channel
    exposure lattice (click/view/signup → purchase): coalition value
    v(S) = conversions among users whose exposure set ⊆ S, channel
    credit = the Shapley average of marginal contributions over all
    coalition orders — the game-theoretically fair split that last-touch
    and linear attribution (q_attribution_last_touch/_linear) only
    approximate. With 3 channels the 2³ lattice is enumerated exactly;
    weights (1/3,1/6,1/6,1/3) are held as integer SIXTHS so the credit
    is an exact integer until ONE final division — and efficiency
    (Σφᵢ = v(N) − v(∅)) is pytest-asserted to the integer. Plan: one
    aggregate to per-user masks, one to 8 coalition counts; the lattice
    algebra runs on an 8-row broadcast table at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + F.max(F.when(F.col("event_type") == "view", 2).otherwise(0))
            + F.max(F.when(F.col("event_type") == "signup", 4).otherwise(0))
        )
        .cast("int")
        .alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("int")
        .alias("conv"),
    )
    cm = u.groupBy("mask").agg(F.sum("conv").cast("long").alias("conv"))
    sets = spark.range(8).select(F.col("id").cast("int").alias("s"))
    v = (
        sets.join(
            F.broadcast(cm),
            F.expr("(mask & ~s) = 0"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(
        [(1, "click"), (2, "view"), (4, "signup")], "bit int, channel string"
    )
    vs = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    marg = (
        F.broadcast(ch)
        .join(F.broadcast(vs), F.expr("(s0 & bit) = 0"))
        .join(F.broadcast(vi), F.expr("s1 = s0 + bit"))
        .groupBy("channel")
        .agg(
            F.sum(
                F.when(
                    (F.col("s0") == 0) | (F.col("s0") == 7 - F.col("bit")), 2
                ).otherwise(1)
                * (F.col("v1") - F.col("v0"))
            )
            .cast("long")
            .alias("shapley_sixths")
        )
    )
    return marg.select(
        "channel",
        "shapley_sixths",
        (F.col("shapley_sixths").cast("double") / 6).alias("shapley"),
    )


@_q(
    "q_kmv_set_ops",
    """
    WITH terms AS (
      SELECT DISTINCT source, UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS term
      FROM documents
    ),
    hashed AS (SELECT source, term, md5(term) AS h FROM terms),
    topk AS (
      SELECT source, h FROM (
        SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= 256
    ),
    prs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM documents) a
      JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
    ),
    unioned AS (
      SELECT p.source_a, p.source_b, t.h,
             CAST(MAX(CASE WHEN t.source = p.source_a THEN 1 ELSE 0 END)
                + MAX(CASE WHEN t.source = p.source_b THEN 1 ELSE 0 END)
               AS INTEGER) AS sides,
             ROW_NUMBER() OVER (PARTITION BY p.source_a, p.source_b ORDER BY t.h) AS rn
      FROM prs p JOIN topk t ON t.source IN (p.source_a, p.source_b)
      GROUP BY 1, 2, 3
    ),
    sk AS (
      SELECT source_a, source_b,
             CAST(count(*) AS BIGINT) AS k,
             CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_k,
             MAX(CASE WHEN rn = 256 THEN h END) AS u_k
      FROM unioned WHERE rn <= 256
      GROUP BY 1, 2
    ),
    ex AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS exact_inter
      FROM terms a JOIN terms b
        ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    ),
    est AS (
      SELECT source_a, source_b, k, shared_k,
             CASE WHEN k < 256 THEN CAST(k AS DOUBLE)
                  ELSE CAST((k - 1) AS DOUBLE)
                       / (CAST(('0x' || substr(u_k, 1, 13)) AS BIGINT)
                          / 4503599627370496.0) END AS union_est
      FROM sk
    )
    SELECT est.source_a, est.source_b, k, shared_k, union_est,
           CAST(shared_k AS DOUBLE) / k * union_est AS inter_est,
           COALESCE(ex.exact_inter, 0) AS exact_inter
    FROM est LEFT JOIN ex USING (source_a, source_b)
    """,
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the mergeability story that makes
    bottom-k sketches the distributed choice: per-source vocabulary
    sketches (k=256 smallest md5 hashes, deterministic — q_kmv_distinct's
    discipline) combine into a union sketch by keeping the k smallest of
    the concatenation, the union SIZE estimate is (k−1)/u_k, the Jaccard
    estimate is the shared fraction inside the union sketch, and the
    intersection estimate is their product — set cardinality algebra on
    O(k) state per source instead of a full distinct count per pair.
    Exact intersections ride along for error inspection. Hex prefix of
    13 chars = 52 bits, exact in a double; lexicographic order on
    fixed-width hex IS numeric order. Plan: one distinct + per-source
    top-k (WindowGroupLimit), then all pair algebra on ≤ sources·k rows."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term"),
    ).distinct()
    hashed = terms.select("source", "term", F.md5("term").alias("h"))
    wk = Window.partitionBy("source").orderBy("h")
    topk = (
        hashed.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= 256)
        .select("source", "h")
    )
    srcs = docs.select("source").distinct()
    prs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    unioned = (
        prs.join(
            topk,
            (F.col("source") == F.col("source_a"))
            | (F.col("source") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "h")
        .agg(
            (
                F.max(F.when(F.col("source") == F.col("source_a"), 1).otherwise(0))
                + F.max(F.when(F.col("source") == F.col("source_b"), 1).otherwise(0))
            )
            .cast("int")
            .alias("sides")
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source_a", "source_b").orderBy("h")
            ),
        )
    )
    sk = (
        unioned.filter(F.col("rn") <= 256)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.when(F.col("sides") == 2, 1).otherwise(0))
            .cast("long")
            .alias("shared_k"),
            F.max(F.when(F.col("rn") == 256, F.col("h"))).alias("u_k"),
        )
    )
    ta = terms.select(F.col("source").alias("source_a"), "term")
    tb = terms.select(F.col("source").alias("source_b"), "term")
    ex = (
        ta.join(tb, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    u_frac = F.conv(F.substring("u_k", 1, 13), 16, 10).cast("double") / F.lit(
        4503599627370496.0
    )
    # non-full sketch (|A∪B| < k) is EXACT by the KMV convention
    union_est = F.when(F.col("k") < 256, F.col("k").cast("double")).otherwise(
        (F.col("k") - 1).cast("double") / u_frac
    )
    return sk.join(ex, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        "k",
        "shared_k",
        union_est.alias("union_est"),
        (F.col("shared_k").cast("double") / F.col("k") * union_est).alias(
            "inter_est"
        ),
        F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
    )


@_q(
    "q_uplift_deciles",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(count(*) FILTER (WHERE day(ts) <= 15) AS BIGINT) AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                           THEN 1 ELSE 0 END) AS INTEGER) AS conv
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM u
    )
    SELECT CAST((rn - 1) * 10 // n + 1 AS INTEGER) AS decile,
           CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_t,
           CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_c,
           CAST(SUM(conv) FILTER (WHERE grp = 1) AS BIGINT) AS conv_t,
           CAST(SUM(conv) FILTER (WHERE grp = 0) AS BIGINT) AS conv_c,
           CAST(SUM(conv) FILTER (WHERE grp = 1) AS DOUBLE)
             / count(*) FILTER (WHERE grp = 1)
             - CAST(SUM(conv) FILTER (WHERE grp = 0) AS DOUBLE)
               / count(*) FILTER (WHERE grp = 0) AS uplift
    FROM rk GROUP BY 1
    """,
)
def q_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile (the Qini/uplift-model evaluation table): users
    ranked by a pre-period activity score into 10 equal-count bins shared
    by both arms, then per decile the treated-minus-control conversion
    rate — where the incremental effect concentrates. Deciles are
    rank-based ((rn−1)·10 div n, total-order tie-break), counts are
    integers, and the uplift is two divisions subtracted in one fixed
    expression. Plan: one aggregate to user grain, one global rank
    (single-shuffle, same as any percentile pass), one decile aggregate."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        F.count(F.when(F.dayofmonth("ts") <= 15, 1)).cast("long").alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.dayofmonth("ts") > 15), 1
            ).otherwise(0)
        )
        .cast("int")
        .alias("conv"),
    )
    rk = u.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "user_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    t = F.col("grp") == 1
    return (
        rk.groupBy(F.expr("((rn - 1) * 10) div n + 1").cast("int").alias("decile"))
        .agg(
            F.count(F.when(t, 1)).cast("long").alias("n_t"),
            F.count(F.when(~t, 1)).cast("long").alias("n_c"),
            F.sum(F.when(t, F.col("conv"))).cast("long").alias("conv_t"),
            F.sum(F.when(~t, F.col("conv"))).cast("long").alias("conv_c"),
        )
        .select(
            "decile",
            "n_t",
            "n_c",
            "conv_t",
            "conv_c",
            (
                F.col("conv_t").cast("double") / F.col("n_t")
                - F.col("conv_c").cast("double") / F.col("n_c")
            ).alias("uplift"),
        )
    )


@_q(
    "q_two_proportion_ztest",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 100
                           THEN 1 ELSE 0 END) AS INTEGER) AS conv
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT
        CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n1,
        CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n0,
        CAST(SUM(conv) FILTER (WHERE grp = 1) AS BIGINT) AS x1,
        CAST(SUM(conv) FILTER (WHERE grp = 0) AS BIGINT) AS x0
      FROM u
    )
    SELECT n1, n0, x1, x0,
           CAST(x1 AS DOUBLE) / n1 AS p1,
           CAST(x0 AS DOUBLE) / n0 AS p0,
           (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
             / sqrt(CAST(x1 + x0 AS DOUBLE) / (n1 + n0)
                    * (1 - CAST(x1 + x0 AS DOUBLE) / (n1 + n0))
                    * (1.0 / n1 + 1.0 / n0)) AS z
    FROM g
    """,
)
def q_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on user-level big-purchase conversion (the categorical
    sibling of q_ab_welch_ttest): pooled-variance z statistic from four
    integer counts — the A/B arithmetic for binary outcomes, where the
    naive per-event rate would double-count multi-purchase users (hence
    the user-grain MAX first). Every input to the z expression is an
    exact integer; the statistic is one fixed scalar IEEE expression.
    Plan: one aggregate to user grain, one conditional aggregate to a
    single row."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 100), 1
            ).otherwise(0)
        )
        .cast("int")
        .alias("conv")
    )
    t = F.col("grp") == 1
    g = u.agg(
        F.count(F.when(t, 1)).cast("long").alias("n1"),
        F.count(F.when(~t, 1)).cast("long").alias("n0"),
        F.sum(F.when(t, F.col("conv"))).cast("long").alias("x1"),
        F.sum(F.when(~t, F.col("conv"))).cast("long").alias("x0"),
    )
    p1 = F.col("x1").cast("double") / F.col("n1")
    p0 = F.col("x0").cast("double") / F.col("n0")
    pp = (F.col("x1") + F.col("x0")).cast("double") / (F.col("n1") + F.col("n0"))
    z = (p1 - p0) / F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n0"))
    )
    return g.select(
        "n1", "n0", "x1", "x0", p1.alias("p1"), p0.alias("p0"), z.alias("z")
    )


# ---------------------------------------------------------------------------
# Round-5 batch 101 — append-mode final windows, SCD Type 3, blocked kNN
# graph + recall evaluation.
# ---------------------------------------------------------------------------


@_q(
    "q_stream_window_append",
    """
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 21600 * 21600 AS window_start_epoch,
           event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed streaming aggregate — each 6-hour tumbling
    window is emitted EXACTLY ONCE, when the watermark closes it (the
    production pattern for append-only sinks like parquet, where
    q_stream_window's complete-mode re-emission would duplicate rows).
    Finality needs the watermark to pass every real window, so this
    reuses the far-future sentinel fixture from q_stream_stream_left_join:
    the sentinel advances the watermark past all of January, the
    availableNow no-data batch flushes the state store, and the
    sentinel's OWN window never closes — it is excluded by the semantics
    themselves, not a filter. Final table = the batch tumbling aggregate
    exactly. Window starts are emitted as epoch seconds (integer) so the
    contract carries no timestamp-conversion surface."""
    from etl_pipeline_project_spark.streaming.ops import (
        read_events_stream,
        run_to_memory,
    )

    # the left-join fixture (events + 2 far-future sentinel rows) is built
    # by q_stream_stream_left_join's _build; reuse the same staged dir
    stage = _staged_fixture(
        "stream_leftjoin",
        _fp_tag(sf_dir, "events"),
        _stream_sentinel_build(sf_dir),
    )
    ev = read_events_stream(spark, stage)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        agg = (
            ev.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        out = run_to_memory(agg, output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
        "event_type",
        "n",
    )


@_q(
    "q_scd3_dim",
    """
    WITH cur AS (
      SELECT o_custkey, o_orderpriority AS current_priority,
             o_orderdate AS last_order_date
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    ),
    prev AS (
      SELECT o_custkey, o_orderpriority AS prev_priority FROM (
        SELECT o.*, ROW_NUMBER() OVER (
          PARTITION BY o.o_custkey
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM orders o JOIN cur c
          ON o.o_custkey = c.o_custkey
         AND o.o_orderpriority <> c.current_priority
      ) WHERE rn = 1
    ),
    n AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1)
    SELECT cur.o_custkey, current_priority, prev.prev_priority,
           n_orders, last_order_date
    FROM cur LEFT JOIN prev ON cur.o_custkey = prev.o_custkey
    JOIN n ON cur.o_custkey = n.o_custkey
    """,
)
def q_scd3_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE 3 dimension build — current value plus ONE previous-value
    column (the limited-history alternative to Type 2's full row
    versioning, used when only \"what changed most recently\" matters):
    per customer, the latest order priority, the most recent DIFFERENT
    priority before it (NULL for never-changed customers), order count
    and last activity. Both argmaxes use total-order tie-breaks
    (o_orderdate, o_orderkey). Plan: the current/previous/count branches
    all hash on o_custkey — one logical key partitioning reused across
    the joins, WindowGroupLimit prunes each argmax."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    cur = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("current_priority"),
            F.col("o_orderdate").alias("last_order_date"),
        )
    )
    prev = (
        orders.join(cur, "o_custkey")
        .filter(F.col("o_orderpriority") != F.col("current_priority"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("prev_priority"))
    )
    n = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    return (
        cur.join(prev, "o_custkey", "left")
        .join(n, "o_custkey")
        .select(
            "o_custkey",
            "current_priority",
            "prev_priority",
            "n_orders",
            "last_order_date",
        )
    )


@_q(
    "q_knn_graph_blocked",
    f"""
    WITH p AS (
      SELECT a.vec_id, b.vec_id AS nid, a.label,
             {_DOT_SQL.format(a='a.embedding', b='b.embedding')} AS score
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, nid, label, score,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY vec_id ORDER BY score DESC, nid) AS INTEGER) AS rank
    FROM p QUALIFY rank <= 3
    """,
)
def q_knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH construction (k=3) with label blocking — the
    all-vectors-need-neighbors problem (dedup clustering, graph-based
    retrieval indexes like HNSW take this as input), which brute force
    solves in O(n²) full-corpus pairs. Blocking on the coarse label
    bounds the pair explosion to Σ bucket², the same candidate-generation
    shape as q_dedup_minhash_lsh — the 100 TB plan swaps the given label
    for an IVF/LSH bucket (q_ann_ivf) with identical dataflow; the
    recall cost of blocking is measured honestly by q_knn_recall_eval.
    Dot products (unit-norm ⇒ cosine) fold element-wise in index order —
    the q_ann_bruteforce determinism discipline. Plan: one self-join
    co-partitioned on label, per-vector argmax WindowGroupLimit-pruned."""
    from etl_pipeline_project_spark.operators.similarity import dot_product

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select("vec_id", "label", "embedding")
    b = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = (
        a.join(b, (F.col("label") == F.col("lb")) & (F.col("vec_id") != F.col("nid")))
        .select(
            "vec_id",
            "nid",
            "label",
            dot_product("embedding", "emb_b").alias("score"),
        )
    )
    wr = Window.partitionBy("vec_id").orderBy(F.col("score").desc(), "nid")
    return (
        pairs.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("vec_id", "nid", "label", "score", "rank")
    )


@_q(
    "q_knn_recall_eval",
    f"""
    WITH probes AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 20),
    exact AS (
      SELECT vec_id, nid FROM (
        SELECT p.vec_id, e.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                 ORDER BY list_sum(list_transform(list_zip(p.embedding, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) DESC, e.vec_id) AS rn
        FROM probes p JOIN embeddings e ON e.vec_id <> p.vec_id
      ) WHERE rn <= 3
    ),
    blocked AS (
      SELECT vec_id, nid FROM (
        SELECT p.vec_id, e.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                 ORDER BY list_sum(list_transform(list_zip(p.embedding, e.embedding), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) DESC, e.vec_id) AS rn
        FROM probes p JOIN embeddings e
          ON e.label = p.label AND e.vec_id <> p.vec_id
      ) WHERE rn <= 3
    )
    SELECT exact.vec_id,
           CAST(count(*) FILTER (WHERE blocked.nid IS NOT NULL) AS BIGINT) AS hits,
           CAST(count(*) FILTER (WHERE blocked.nid IS NOT NULL) AS DOUBLE) / 3
             AS recall_at_3
    FROM exact LEFT JOIN blocked USING (vec_id, nid)
    GROUP BY 1
    """,
)
def q_knn_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of label-blocked kNN against exact brute force, per probe
    (20 deterministic probes) — the honesty metric every blocked/ANN
    index owes its users: how many of the TRUE top-3 does the cheap
    candidate set keep? Both rankings share the exact fold-order dot
    product and total-order tie-breaks, so the recall is a pure integer
    intersection count with one final division. Plan: probes broadcast
    twice (full corpus scan for truth, label-pruned scan for the index
    side), two WindowGroupLimit top-k passes, one tiny join — the
    corpus never shuffles."""
    from etl_pipeline_project_spark.operators.similarity import dot_product

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("pid"),
        F.col("label").alias("plabel"),
        F.col("embedding").alias("pvec"),
    )

    def topk(joined):
        wr = Window.partitionBy("pid").orderBy(F.col("score").desc(), "nid")
        return (
            joined.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= 3)
            .select(F.col("pid").alias("vec_id"), "nid")
        )

    corpus = emb.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("embedding").alias("nvec"),
    )
    exact = topk(
        F.broadcast(probes)
        .join(corpus, F.col("nid") != F.col("pid"))
        .select("pid", "nid", dot_product("pvec", "nvec").alias("score"))
    )
    blocked = topk(
        F.broadcast(probes)
        .join(
            corpus,
            (F.col("nlabel") == F.col("plabel")) & (F.col("nid") != F.col("pid")),
        )
        .select("pid", "nid", dot_product("pvec", "nvec").alias("score"))
    )
    hit = blocked.withColumn("hit", F.lit(1))
    return (
        exact.join(hit, ["vec_id", "nid"], "left")
        .groupBy("vec_id")
        .agg(F.count("hit").cast("long").alias("hits"))
        .select(
            "vec_id",
            "hits",
            (F.col("hits").cast("double") / 3).alias("recall_at_3"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 batch 102 — incremental join-view maintenance, deletion-vector
# merge-on-read, bootstrap difference CI, watermark sensitivity sweep.
# ---------------------------------------------------------------------------


@_q(
    "q_incr_join_maintenance",
    """
    WITH base_o AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
    delta_o AS (SELECT * FROM orders WHERE o_orderkey % 10 = 0),
    base_l AS (SELECT * FROM lineitem WHERE l_suppkey % 7 <> 0),
    delta_l AS (SELECT * FROM lineitem WHERE l_suppkey % 7 = 0),
    incr AS (
      SELECT o.o_orderkey, l.l_partkey, l.l_suppkey, 'delta_o' AS via
      FROM delta_o o JOIN base_l l ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT o.o_orderkey, l.l_partkey, l.l_suppkey, 'delta_l' AS via
      FROM base_o o JOIN delta_l l ON o.o_orderkey = l.l_orderkey
      UNION ALL
      SELECT o.o_orderkey, l.l_partkey, l.l_suppkey, 'delta_both' AS via
      FROM delta_o o JOIN delta_l l ON o.o_orderkey = l.l_orderkey
    )
    SELECT via, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey,
           CAST(SUM(l_partkey * 31 + l_suppkey) AS BIGINT) AS checksum
    FROM incr GROUP BY 1
    """,
)
def q_incr_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance — the delta-rule algebra behind
    every materialized join view: Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB,
    so a view over 100 TB refreshes by joining only the delta against
    the base (plus the tiny delta×delta term), never recomputing the
    full join. Deltas are deterministic key-mod slices; the output is the
    per-term row census with integer checksums, and the pytest asserts
    the three terms together equal exactly FULL_JOIN − BASE_JOIN. Plan:
    three key-equi joins sharing the o_orderkey/l_orderkey partitioning;
    the delta sides are small by construction, so AQE broadcasts them —
    the refresh cost tracks the delta, not the base."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    base_o = orders.filter(F.col("o_orderkey") % 10 != 0)
    delta_o = orders.filter(F.col("o_orderkey") % 10 == 0)
    base_l = li.filter(F.col("l_suppkey") % 7 != 0)
    delta_l = li.filter(F.col("l_suppkey") % 7 == 0)

    def term(o, l, tag):
        return o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
            "o_orderkey", "l_partkey", "l_suppkey", F.lit(tag).alias("via")
        )

    incr = (
        term(delta_o, base_l, "delta_o")
        .unionAll(term(base_o, delta_l, "delta_l"))
        .unionAll(term(delta_o, delta_l, "delta_both"))
    )
    return incr.groupBy("via").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("o_orderkey").cast("long").alias("sum_okey"),
        F.sum(F.col("l_partkey") * 31 + F.col("l_suppkey"))
        .cast("long")
        .alias("checksum"),
    )


@_q(
    "q_delete_vectors_apply",
    """
    WITH filed AS (
      SELECT *, CAST(o_orderkey // 1000 AS BIGINT) AS file_id FROM orders
    ),
    dv AS (
      SELECT o_orderkey FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
            % 20 = 0
    )
    SELECT file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(dv.o_orderkey) AS BIGINT) AS n_deleted,
           CAST(count(*) - count(dv.o_orderkey) AS BIGINT) AS n_live,
           CAST(SUM(CASE WHEN dv.o_orderkey IS NULL THEN filed.o_orderkey END)
                AS BIGINT) AS live_key_sum,
           count(dv.o_orderkey) * 5 >= count(*) AS rewrite_candidate
    FROM filed LEFT JOIN dv ON filed.o_orderkey = dv.o_orderkey
    GROUP BY 1
    """,
)
def q_delete_vectors_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector MERGE-ON-READ — the lakehouse delete mechanic
    (Delta deletion vectors / Iceberg position deletes): deletes are a
    side table of tombstoned keys, reads apply them with an anti-join
    instead of rewriting data files, and files whose tombstone fraction
    crosses a threshold (≥20% here) are flagged for compaction rewrite.
    Files are modeled as 1000-key ranges; the tombstone set is an
    md5-selected deterministic ~5%. The output is the per-file
    live/deleted census with a live-key checksum — exactly the manifest
    a MOR reader consults. Plan: one broadcast-able LEFT join (the
    delete vector is ~5% of keys and bounded per file) + one aggregate;
    at 100 TB this is why deletes cost O(Δ), not O(table)."""
    orders = load_table(spark, sf_dir, "orders")
    filed = orders.select(
        "o_orderkey", F.expr("o_orderkey div 1000").alias("file_id")
    )
    dv = orders.select("o_orderkey").filter(
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 20
        == 0
    ).select(F.col("o_orderkey").alias("del_key"))
    joined = filed.join(
        dv, F.col("o_orderkey") == F.col("del_key"), "left"
    )
    return joined.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("del_key").cast("long").alias("n_deleted"),
        (F.count(F.lit(1)) - F.count("del_key")).cast("long").alias("n_live"),
        F.sum(F.when(F.col("del_key").isNull(), F.col("o_orderkey")))
        .cast("long")
        .alias("live_key_sum"),
        (F.count("del_key") * 5 >= F.count(F.lit(1))).alias("rewrite_candidate"),
    )


@_q(
    "q_bootstrap_diff_ci",
    """
    WITH grid AS (SELECT UNNEST(range(32)) AS b),
    draws AS (
      SELECT b, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS v_micro,
             CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                    || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) < 1580030168 THEN 0
                  WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                    || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) < 3160060337 THEN 1
                  WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                    || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) < 3950075421 THEN 2
                  ELSE 3 END AS c
      FROM events CROSS JOIN grid WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT b,
             CAST(SUM(CASE WHEN grp = 1 THEN c * v_micro END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN grp = 1 THEN c END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp = 0 THEN c * v_micro END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN grp = 0 THEN c END) AS BIGINT) AS n0
      FROM draws GROUP BY 1
    ),
    d AS (
      SELECT b, CAST(s1 AS DOUBLE) / n1 / 1000000
                - CAST(s0 AS DOUBLE) / n0 / 1000000 AS diff
      FROM rep
    )
    SELECT CAST(b AS INTEGER) AS replica, diff,
           CAST(ROW_NUMBER() OVER (ORDER BY diff, b) AS INTEGER) AS diff_rank
    FROM d
    """,
)
def q_bootstrap_diff_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap distribution of the TREATMENT-MINUS-CONTROL mean
    difference — the resampled CI experimenters actually report (the
    2nd/31st ranked replicas of 32 bracket a ~94% interval): each
    replica draws every event Poisson(1) times (md5-uniform against the
    hard-coded integer CDF thresholds, truncated at 3 — q_poisson_
    bootstrap's discipline), computes both arm means from integer-micro
    sums, and emits the difference with its rank. Determinism: integer
    draws, integer sums, two divisions and a subtraction in one fixed
    expression, rank tie-broken by replica. Plan: map-side 32× fan-out
    inside the scan stage, ONE partial/final aggregate to 32 rows, an
    O(32) rank window."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    grid = spark.range(32).select(F.col("id").cast("int").alias("b"))
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit(":"),
                    F.col("b").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    c = (
        F.when(u < 1580030168, 0)
        .when(u < 3160060337, 1)
        .when(u < 3950075421, 2)
        .otherwise(3)
    )
    draws = ev.crossJoin(F.broadcast(grid)).select(
        "b",
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.floor(F.col("value") * 1000000).cast("long").alias("v_micro"),
        c.alias("c"),
    )
    t = F.col("grp") == 1
    rep = draws.groupBy("b").agg(
        F.sum(F.when(t, F.col("c") * F.col("v_micro"))).cast("long").alias("s1"),
        F.sum(F.when(t, F.col("c"))).cast("long").alias("n1"),
        F.sum(F.when(~t, F.col("c") * F.col("v_micro"))).cast("long").alias("s0"),
        F.sum(F.when(~t, F.col("c"))).cast("long").alias("n0"),
    )
    d = rep.select(
        "b",
        (
            F.col("s1").cast("double") / F.col("n1") / F.lit(1000000)
            - F.col("s0").cast("double") / F.col("n0") / F.lit(1000000)
        ).alias("diff"),
    )
    return d.select(
        F.col("b").cast("int").alias("replica"),
        "diff",
        F.row_number().over(Window.orderBy("diff", "b")).cast("int").alias("diff_rank"),
    )


@_q(
    "q_watermark_sweep",
    """
    WITH arr AS (
      SELECT event_id, CAST(event_id % 72 AS BIGINT) AS delay_h
      FROM events
    ),
    grid AS (SELECT UNNEST([1, 6, 12, 24, 48, 72]) AS wm_h),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM arr)
    SELECT CAST(wm_h AS INTEGER) AS wm_h,
           CAST(count(*) FILTER (WHERE delay_h > wm_h) AS BIGINT) AS dropped,
           n AS total,
           CAST(count(*) FILTER (WHERE delay_h > wm_h) * 1000000 // n AS BIGINT)
             AS dropped_ppm
    FROM arr CROSS JOIN grid CROSS JOIN tot
    GROUP BY 1, n
    """,
)
def q_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay sensitivity sweep — the table that decides a
    streaming job's single most consequential knob: for candidate
    watermark delays {1,6,12,24,48,72}h, how many events would arrive
    LATER than the delay after their event time and be dropped
    (completeness), vs how much state the delay holds open (cost).
    Arrival lag uses the deterministic event_id-mod-72h landing-delay
    model shared with q_bitemporal_join, so the sweep reproduces
    bit-exactly. Plan: a 6-row broadcast grid over a map-side lag
    column, one aggregate — the fact table is scanned once for all six
    candidate configurations (vs six re-runs of the stream)."""
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select("event_id", (F.col("event_id") % 72).cast("long").alias("delay_h"))
    grid = spark.createDataFrame(
        [(1,), (6,), (12,), (24,), (48,), (72,)], "wm_h int"
    )
    tot = arr.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        arr.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(tot))
        .groupBy("wm_h", "n")
        .agg(
            F.count(F.when(F.col("delay_h") > F.col("wm_h"), 1))
            .cast("long")
            .alias("dropped")
        )
        .select(
            "wm_h",
            "dropped",
            F.col("n").alias("total"),
            F.expr("dropped * 1000000 div n").cast("long").alias("dropped_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 batch 103 — lagged cross-correlation, Fano dispersion,
# seasonal-naive forecast backtest, n-gram novelty by arrival order.
# ---------------------------------------------------------------------------


@_q(
    "q_cross_correlation",
    """
    WITH daily AS (
      SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    lags AS (SELECT UNNEST([-3, -2, -1, 0, 1, 2, 3]) AS lag),
    pairs AS (
      SELECT l.lag, a.x, b.y
      FROM lags l JOIN daily a ON TRUE JOIN daily b ON b.d = a.d + l.lag
    ),
    m AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS INTEGER) AS lag, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r
    FROM m
    """,
)
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged CROSS-correlation between two event series (clicks leading
    purchases): Pearson r of (clicks on day d, purchases on day d+L) for
    L ∈ −3..3 — the lead-lag discovery table behind "does engagement
    predict revenue, and by how many days". All five moments are exact
    integer sums over the ~30-row daily table (counts are integers, so
    unlike q_corr_exact's decimal path nothing needs scaling), and each
    r is one fixed scalar IEEE expression. Plan: one aggregate collapses
    the fact table to days; the 7-lag × day self-join and the moment
    pass run on O(days) rows — corpus-size-independent."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("y"),
    )
    lags = spark.createDataFrame([(-3,), (-2,), (-1,), (0,), (1,), (2,), (3,)], "lag int")
    a = daily.select("d", "x")
    b = daily.select(F.col("d").alias("d2"), "y")
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("d2") == F.col("d") + F.col("lag"))
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n = F.col("n").cast("double")
    r = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(F.col("lag").cast("int").alias("lag"), "n", r.alias("r"))


@_q(
    "q_fano_dispersion",
    """
    WITH daily AS (
      SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS total,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT user_id, n_days, total,
           CAST(n_days * sxx - total * total AS BIGINT) AS disp_num,
           CAST((n_days - 1) * total AS BIGINT) AS disp_den,
           CAST(n_days * sxx - total * total AS DOUBLE)
             / ((n_days - 1) * total) AS dispersion,
           (n_days * sxx - total * total) * 2
             > (n_days - 1) * total * 3 AS bursty
    FROM m WHERE n_days >= 2
    """,
)
def q_fano_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, var/mean of daily activity) per
    user — the burstiness statistic bot/spam curation filters key on: a
    Poisson-like organic user sits near 1, schedulers and scrapers spike
    far above. Dispersion is carried as an exact integer fraction
    (n·Σx² − (Σx)²) / ((n−1)·Σx) — numerator and denominator emitted as
    integers, the double is ONE division, and the bursty flag (>1.5)
    is a cross-multiplied INTEGER comparison (·2 vs ·3), never a float
    threshold. Plan: two map-side-combinable aggregates (events→user-day,
    user-day→user); output is O(users)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    m = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("total"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxx") - F.col("total") * F.col("total")
    den = (F.col("n_days") - 1) * F.col("total")
    return m.filter(F.col("n_days") >= 2).select(
        "user_id",
        "n_days",
        "total",
        num.cast("long").alias("disp_num"),
        den.cast("long").alias("disp_den"),
        (num.cast("double") / den).alias("dispersion"),
        (num * 2 > den * 3).alias("bursty"),
    )


@_q(
    "q_forecast_backtest",
    """
    WITH daily AS (
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT a.event_type, a.d, a.x,
             s.x AS f_seasonal, p.x AS f_naive
      FROM daily a
      JOIN daily s ON s.event_type = a.event_type AND s.d = a.d - 7
      JOIN daily p ON p.event_type = a.event_type AND p.d = a.d - 1
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
           CAST(SUM(ABS(x - f_seasonal)) AS BIGINT) AS sae_seasonal,
           CAST(SUM(ABS(x - f_naive)) AS BIGINT) AS sae_naive1,
           CAST(SUM(ABS(x - f_seasonal)) AS DOUBLE) / SUM(ABS(x - f_naive))
             AS mase
    FROM j GROUP BY 1
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST: seasonal-naive (ŷ_d = y_{d−7}) vs naive-1
    (ŷ_d = y_{d−1}) on daily event counts, scored by MASE — the
    scale-free "is your model better than repeating last week" gate
    every capacity-planning forecast must clear (MASE < 1 ⇒ weekly
    seasonality is real signal). Errors are exact integer absolute sums;
    MASE is ONE division of two integers. Evaluation days are those with
    both a 7-day and 1-day predecessor — identical join semantics on
    both engines. Plan: one aggregate to the daily grid, two self-joins
    and the error pass on O(days·types) rows — the backtest costs
    nothing at any corpus size once the daily rollup exists."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    a = daily
    s = daily.select(
        F.col("event_type").alias("et_s"),
        F.col("d").alias("d_s"),
        F.col("x").alias("f_seasonal"),
    )
    p = daily.select(
        F.col("event_type").alias("et_p"),
        F.col("d").alias("d_p"),
        F.col("x").alias("f_naive"),
    )
    j = a.join(
        s, (F.col("et_s") == F.col("event_type")) & (F.col("d_s") == F.col("d") - 7)
    ).join(
        p, (F.col("et_p") == F.col("event_type")) & (F.col("d_p") == F.col("d") - 1)
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(F.abs(F.col("x") - F.col("f_seasonal"))).cast("long").alias("sae_seasonal"),
        F.sum(F.abs(F.col("x") - F.col("f_naive"))).cast("long").alias("sae_naive1"),
    ).select(
        "event_type",
        "n_eval",
        "sae_seasonal",
        "sae_naive1",
        (
            F.col("sae_seasonal").cast("double") / F.col("sae_naive1")
        ).alias("mase"),
    )


@_q(
    "q_ngram_novelty",
    """
    WITH grams AS (
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
      FROM (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w
        FROM documents
      ) WHERE len(w) >= 3
    ),
    first_seen AS (
      SELECT gram, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM grams GROUP BY 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE first_doc = doc_id) AS BIGINT) AS novel,
           CAST(count(*) FILTER (WHERE first_doc = doc_id) * 1000000 // count(*)
                AS BIGINT) AS novelty_ppm
    FROM grams JOIN first_seen USING (gram)
    GROUP BY 1
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram NOVELTY by arrival order: per document, the fraction of its
    distinct 3-word shingles appearing for the FIRST time in the corpus
    (arrival = doc_id order) — the curation signal that separates fresh
    content from recombinations of what the corpus already holds
    (q_dup_ngram_coverage asks "shared with anyone"; novelty asks "was I
    first"). First occurrence is an argmin over the inverted index
    (MIN(doc_id) per shingle — map-side combinable), joined back on the
    shingle; novelty is an integer ppm. Plan: the standard two-exchange
    inverted-index shape — explode distinct shingles, aggregate per
    shingle, join back, aggregate per doc; never doc×doc."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0).alias("w"),
    )
    grams = (
        words.filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 3), "
                    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    first_seen = grams.groupBy("gram").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    return (
        grams.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1))
            .cast("long")
            .alias("novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "novel",
            F.expr("novel * 1000000 div n_grams").cast("long").alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 batch 104 — offline policy evaluation (IPS/SNIPS), optimistic-
# concurrency conflict detection, arc elasticity, SLA burn rate.
# ---------------------------------------------------------------------------


@_q(
    "q_offline_policy_eval",
    """
    WITH logged AS (
      SELECT event_type AS ctx,
             CAST(event_id % 3 AS INTEGER) AS action,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS r_micro,
             CAST(CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT) % 3
               AS INTEGER) AS pi_action
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE action = pi_action) AS BIGINT) AS n_matched,
           CAST(SUM(CASE WHEN action = pi_action THEN r_micro END) AS BIGINT)
             AS matched_reward_micro,
           CAST(SUM(CASE WHEN action = pi_action THEN r_micro END) AS DOUBLE)
             * 3 / count(*) / 1000000 AS ips,
           CAST(SUM(CASE WHEN action = pi_action THEN r_micro END) AS DOUBLE)
             / count(*) FILTER (WHERE action = pi_action) / 1000000 AS snips,
           CAST(SUM(r_micro) AS DOUBLE) / count(*) / 1000000 AS logged_mean
    FROM logged
    """,
)
def q_offline_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline (counterfactual) policy evaluation — IPS and SNIPS, the
    estimators that let a logged dataset grade a NEW policy without
    deploying it: behavior logs actions uniformly over 3 arms
    (propensity 1/3), the target policy picks a deterministic md5-hashed
    arm per context, and IPS reweights matched rewards by 1/propensity
    (= ×3) while SNIPS self-normalizes by the matched weight mass (= the
    matched-reward mean, robust to propensity drift). Rewards are
    integer micros, both estimators are fixed expressions with division
    last. Plan: ONE map-side-combinable aggregate over the log — at
    100 TB of logged interactions this is a single pass, the property
    that makes offline evaluation viable at all."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    logged = ev.select(
        (F.col("event_id") % 3).cast("int").alias("action"),
        F.floor(F.col("value") * 1000000).cast("long").alias("r_micro"),
        (
            F.conv(F.substring(F.md5("event_type"), 1, 8), 16, 10).cast("long") % 3
        )
        .cast("int")
        .alias("pi_action"),
    )
    m = F.col("action") == F.col("pi_action")
    return logged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(m, 1)).cast("long").alias("n_matched"),
        F.sum(F.when(m, F.col("r_micro"))).cast("long").alias("matched_reward_micro"),
        F.sum("r_micro").cast("long").alias("total_reward_micro"),
    ).select(
        "n",
        "n_matched",
        "matched_reward_micro",
        (
            F.col("matched_reward_micro").cast("double")
            * 3
            / F.col("n")
            / F.lit(1000000)
        ).alias("ips"),
        (
            F.col("matched_reward_micro").cast("double")
            / F.col("n_matched")
            / F.lit(1000000)
        ).alias("snips"),
        (
            F.col("total_reward_micro").cast("double") / F.col("n") / F.lit(1000000)
        ).alias("logged_mean"),
    )


@_q(
    "q_occ_conflicts",
    """
    WITH a AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 7 = 0
    ),
    b AS (
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || 'b'), 1, 8)) AS BIGINT) % 8 = 0
    )
    SELECT COALESCE(a.o_orderpriority, b.o_orderpriority) AS priority,
           CAST(count(a.o_orderkey) AS BIGINT) AS n_a,
           CAST(count(b.o_orderkey) AS BIGINT) AS n_b,
           CAST(count(*) FILTER (WHERE a.o_orderkey IS NOT NULL
                                   AND b.o_orderkey IS NOT NULL) AS BIGINT)
             AS n_conflict
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    GROUP BY 1
    """,
)
def q_occ_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency conflict detection — the commit-time check
    of every snapshot-isolation table format (Delta/Iceberg commit
    protocol): two concurrent changesets (deterministic md5-selected key
    sets, ~14% and ~12.5%) are compared; keys BOTH writers touched are
    the conflicts that force one writer to retry, everything else
    commits cleanly. Emitted as a per-priority census from one FULL
    OUTER join on the key. Plan: two filtered scans + one key-equi
    join + one aggregate — commit validation costs O(changesets), never
    O(table), which is why optimistic writers scale."""
    orders = load_table(spark, sf_dir, "orders")

    def pick(salt: str, mod: int):
        col = F.col("o_orderkey").cast("string")
        if salt:
            col = F.concat(col, F.lit(salt))
        return orders.filter(
            F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % mod == 0
        ).select("o_orderkey", "o_orderpriority")

    a = pick("", 7).select(
        F.col("o_orderkey").alias("key_a"), F.col("o_orderpriority").alias("pri_a")
    )
    b = pick("b", 8).select(
        F.col("o_orderkey").alias("key_b"), F.col("o_orderpriority").alias("pri_b")
    )
    j = a.join(b, F.col("key_a") == F.col("key_b"), "full_outer")
    return j.groupBy(
        F.coalesce("pri_a", "pri_b").alias("priority")
    ).agg(
        F.count("key_a").cast("long").alias("n_a"),
        F.count("key_b").cast("long").alias("n_b"),
        F.count(F.when(F.col("key_a").isNotNull() & F.col("key_b").isNotNull(), 1))
        .cast("long")
        .alias("n_conflict"),
    )


@_q(
    "q_arc_elasticity",
    f"""
    WITH g AS (
      SELECT o_orderpriority,
             CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1998-01-01')
               AS BIGINT) AS q1,
             CAST(count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01')
               AS BIGINT) AS q2,
             {_msum6("CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN o_totalprice END")} AS s1,
             {_msum6("CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN o_totalprice END")} AS s2
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, q1, q2,
           s1 / q1 AS p1, s2 / q2 AS p2,
           (CAST(q2 - q1 AS DOUBLE) / (q2 + q1))
             / ((s2 / q2 - s1 / q1) / (s2 / q2 + s1 / q1)) AS elasticity
    FROM g
    """,
)
def q_arc_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARC price elasticity of demand (the midpoint formula —
    symmetric, so period order doesn't flip the sign): per order
    priority, compare the early era (<1998) with the late era on order
    volume (quantity proxy) and average order value (price proxy);
    elasticity = %Δq_midpoint / %Δp_midpoint. Counts are integers,
    price sums are exact decimals, and the elasticity is one fixed
    scalar expression — division last. Plan: ONE conditional aggregate
    pass over orders (both eras in the same scan — no per-period
    rescan), O(priorities) output."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    orders = load_table(spark, sf_dir, "orders")
    early = F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.when(early, 1)).cast("long").alias("q1"),
        F.count(F.when(~early, 1)).cast("long").alias("q2"),
        exact_sum(F.when(early, F.col("o_totalprice")), 6).alias("s1"),
        exact_sum(F.when(~early, F.col("o_totalprice")), 6).alias("s2"),
    )
    p1 = F.col("s1") / F.col("q1")
    p2 = F.col("s2") / F.col("q2")
    el = ((F.col("q2") - F.col("q1")).cast("double") / (F.col("q2") + F.col("q1"))) / (
        (p2 - p1) / (p2 + p1)
    )
    return g.select(
        "o_orderpriority", "q1", "q2", p1.alias("p1"), p2.alias("p2"), el.alias("elasticity")
    )


@_q(
    "q_sla_burn_rate",
    """
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    w AS (
      SELECT event_type,
             CAST(count(*) FILTER (WHERE ts > mx - INTERVAL 24 HOUR) AS BIGINT) AS n_24h,
             CAST(count(*) FILTER (WHERE ts > mx - INTERVAL 24 HOUR AND value < 10)
               AS BIGINT) AS err_24h,
             CAST(count(*) FILTER (WHERE ts > mx - INTERVAL 6 HOUR) AS BIGINT) AS n_6h,
             CAST(count(*) FILTER (WHERE ts > mx - INTERVAL 6 HOUR AND value < 10)
               AS BIGINT) AS err_6h
      FROM events, anchor GROUP BY 1
    )
    SELECT event_type, n_24h, err_24h, n_6h, err_6h,
           CAST(err_24h AS DOUBLE) / n_24h / 0.05 AS burn_24h,
           CAST(err_6h AS DOUBLE) / n_6h / 0.05 AS burn_6h,
           err_24h * 20 > n_24h * 2 AND err_6h * 20 > n_6h * 2 AS page
    FROM w WHERE n_6h > 0
    """,
)
def q_sla_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget BURN RATE with multi-window alerting (the SRE
    workbook pattern): error rate over a long (24h) and a short (6h)
    window, each divided by the 5% budget; paging requires BOTH windows
    to burn >2× budget — the long window keeps alerts significant, the
    short one makes them fast-resetting. Windows anchor on MAX(ts)
    (deterministic, no wall clock); burn rates are one division each and
    the page flag is a cross-multiplied INTEGER comparison (err·20 >
    n·2), never a float threshold. Plan: one broadcast scalar anchor +
    one conditional-aggregate pass — both windows from a single scan."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("mx"))
    j = ev.crossJoin(F.broadcast(anchor))
    in24 = F.col("ts") > F.col("mx") - F.expr("INTERVAL 24 HOURS")
    in6 = F.col("ts") > F.col("mx") - F.expr("INTERVAL 6 HOURS")
    err = F.col("value") < 10
    w = j.groupBy("event_type").agg(
        F.count(F.when(in24, 1)).cast("long").alias("n_24h"),
        F.count(F.when(in24 & err, 1)).cast("long").alias("err_24h"),
        F.count(F.when(in6, 1)).cast("long").alias("n_6h"),
        F.count(F.when(in6 & err, 1)).cast("long").alias("err_6h"),
    )
    return w.filter(F.col("n_6h") > 0).select(
        "event_type",
        "n_24h",
        "err_24h",
        "n_6h",
        "err_6h",
        (F.col("err_24h").cast("double") / F.col("n_24h") / F.lit(0.05)).alias(
            "burn_24h"
        ),
        (F.col("err_6h").cast("double") / F.col("n_6h") / F.lit(0.05)).alias(
            "burn_6h"
        ),
        (
            (F.col("err_24h") * 20 > F.col("n_24h") * 2)
            & (F.col("err_6h") * 20 > F.col("n_6h") * 2)
        ).alias("page"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 105 — relational division, Allen interval relations,
# cents-digit bias forensics, rank-biased overlap.
# ---------------------------------------------------------------------------


@_q(
    "q_relational_division",
    """
    WITH need AS (SELECT DISTINCT o_orderpriority AS p FROM orders),
    have AS (SELECT DISTINCT o_custkey, o_orderpriority AS p FROM orders),
    divided AS (
      SELECT o_custkey
      FROM have GROUP BY 1
      HAVING count(*) = (SELECT count(*) FROM need)
    )
    SELECT d.o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS n_priorities
    FROM divided d JOIN orders o ON o.o_custkey = d.o_custkey
    GROUP BY 1
    """,
)
def q_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIONAL DIVISION (Codd's ÷, the textbook operator SQL never
    got a keyword for): customers who have placed orders under ALL
    order priorities — "suppliers who supply every part" in its classic
    phrasing. Implemented the scale-right way: distinct (customer,
    priority) pairs collapse map-side, a per-customer distinct count is
    compared to the divisor's cardinality (a broadcast scalar) — never
    the double-NOT-EXISTS correlated form, which rescans per candidate.
    Divisor cardinality is data-derived, so the query adapts if a
    priority disappears upstream. Plan: two map-side-combinable
    aggregates + one scalar subquery + one join back for the census."""
    orders = load_table(spark, sf_dir, "orders")
    need = orders.select("o_orderpriority").distinct().count()
    have = orders.select("o_custkey", "o_orderpriority").distinct()
    divided = (
        have.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np") == need)
        .select("o_custkey")
    )
    return (
        divided.join(orders, "o_custkey")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
        )
    )


@_q(
    "q_allen_relations",
    """
    WITH spans AS (
      SELECT user_id, event_type, MIN(ts) AS s, MAX(ts) AS e
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    ),
    ab AS (
      SELECT a.user_id, a.s AS as_, a.e AS ae, b.s AS bs, b.e AS be
      FROM spans a JOIN spans b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
    ),
    rel AS (
      SELECT user_id,
             CASE WHEN ae < bs THEN 'before'
                  WHEN be < as_ THEN 'after'
                  WHEN ae = bs THEN 'meets'
                  WHEN be = as_ THEN 'met_by'
                  WHEN as_ = bs AND ae = be THEN 'equals'
                  WHEN as_ = bs AND ae < be THEN 'starts'
                  WHEN as_ = bs AND ae > be THEN 'started_by'
                  WHEN ae = be AND as_ > bs THEN 'finishes'
                  WHEN ae = be AND as_ < bs THEN 'finished_by'
                  WHEN as_ > bs AND ae < be THEN 'during'
                  WHEN as_ < bs AND ae > be THEN 'contains'
                  WHEN as_ < bs AND ae < be THEN 'overlaps'
                  ELSE 'overlapped_by' END AS relation
      FROM ab
    )
    SELECT relation, CAST(count(*) AS BIGINT) AS n_users
    FROM rel GROUP BY 1
    """,
)
def q_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALLEN'S INTERVAL ALGEBRA census (Allen 1983 — the 13 exhaustive,
    mutually exclusive relations between two intervals): per user,
    classify how the click-activity span relates to the purchase-
    activity span (before/meets/overlaps/starts/during/finishes/equals
    + inverses) and count users per relation — the temporal-reasoning
    vocabulary behind overlap joins, conflict detection and timeline
    QA, reduced to ONE deterministic CASE chain evaluated identically
    on both engines (order of WHEN arms IS the tie-break). Plan: one
    aggregate to per-user spans, a per-user 1×1 join, a 13-ary map-side
    CASE, and an O(13) census."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    a = spans.filter(F.col("event_type") == "click").select(
        "user_id", F.col("s").alias("as_"), F.col("e").alias("ae")
    )
    b = spans.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid_b"),
        F.col("s").alias("bs"),
        F.col("e").alias("be"),
    )
    ab = a.join(b, F.col("user_id") == F.col("uid_b"))
    rel = (
        F.when(F.col("ae") < F.col("bs"), "before")
        .when(F.col("be") < F.col("as_"), "after")
        .when(F.col("ae") == F.col("bs"), "meets")
        .when(F.col("be") == F.col("as_"), "met_by")
        .when((F.col("as_") == F.col("bs")) & (F.col("ae") == F.col("be")), "equals")
        .when((F.col("as_") == F.col("bs")) & (F.col("ae") < F.col("be")), "starts")
        .when(
            (F.col("as_") == F.col("bs")) & (F.col("ae") > F.col("be")), "started_by"
        )
        .when((F.col("ae") == F.col("be")) & (F.col("as_") > F.col("bs")), "finishes")
        .when(
            (F.col("ae") == F.col("be")) & (F.col("as_") < F.col("bs")), "finished_by"
        )
        .when((F.col("as_") > F.col("bs")) & (F.col("ae") < F.col("be")), "during")
        .when((F.col("as_") < F.col("bs")) & (F.col("ae") > F.col("be")), "contains")
        .when((F.col("as_") < F.col("bs")) & (F.col("ae") < F.col("be")), "overlaps")
        .otherwise("overlapped_by")
    )
    return (
        ab.select("user_id", rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@_q(
    "q_cents_digit_bias",
    """
    WITH c AS (
      SELECT CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) % 100 AS INTEGER)
               AS cents
      FROM orders
    ),
    census AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM census)
    SELECT cents, n, CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
           n * 10000 > total * 150 AS overrepresented
    FROM census, tot
    """,
)
def q_cents_digit_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cents-digit bias census — the forensic-accounting companion to
    q_benford_digits: humans inventing numbers over-pick round and
    "psychological" endings (.00, .99, .50), so the last-two-digit
    distribution of amounts flags fabricated or price-pointed
    populations (uniform expectation: 1% per ending; the flag marks
    endings above 1.5%, compared as integers n·10000 > total·150).
    Cents come from ROUND(price·100) — the same decimal discipline as
    the money helpers — and shares are integer ppm. Plan: one map-side
    mod + one aggregate + a broadcast scalar total; ≤100 output rows at
    any corpus size."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        (F.round(F.col("o_totalprice") * 100, 0).cast("long") % 100)
        .cast("int")
        .alias("cents")
    )
    census = c.groupBy("cents").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = census.agg(F.sum("n").cast("long").alias("total"))
    return census.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n",
        F.expr("n * 1000000 div total").cast("long").alias("share_ppm"),
        (F.col("n") * 10000 > F.col("total") * 150).alias("overrepresented"),
    )


@_q(
    "q_rank_biased_overlap",
    """
    WITH ra AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
        AS INTEGER) AS r FROM documents QUALIFY r <= 10
    ),
    rb AS (
      SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY nw DESC, doc_id)
        AS INTEGER) AS r
      FROM (
        SELECT doc_id,
               len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS nw
        FROM documents
      ) QUALIFY r <= 10
    ),
    common AS (
      SELECT GREATEST(ra.r, rb.r) AS m
      FROM ra JOIN rb USING (doc_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_common,
           CAST(COALESCE(SUM(CASE m
             WHEN 1 THEN 5932493265528 WHEN 2 THEN 3412493265528
             WHEN 3 THEN 2278493265528 WHEN 4 THEN 1598093265528
             WHEN 5 THEN 1138823265528 WHEN 6 THEN 808148865528
             WHEN 7 THEN 560143065528 WHEN 8 THEN 368824305528
             WHEN 9 THEN 218160782028 ELSE 97629963228 END), 0) AS BIGINT)
             AS rbo_num,
           CAST(25200000000000 AS BIGINT) AS rbo_den,
           CAST(COALESCE(SUM(CASE m
             WHEN 1 THEN 5932493265528 WHEN 2 THEN 3412493265528
             WHEN 3 THEN 2278493265528 WHEN 4 THEN 1598093265528
             WHEN 5 THEN 1138823265528 WHEN 6 THEN 808148865528
             WHEN 7 THEN 560143065528 WHEN 8 THEN 368824305528
             WHEN 9 THEN 218160782028 ELSE 97629963228 END), 0) AS DOUBLE)
             / 25200000000000 AS rbo
    FROM common
    """,
)
def q_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-Biased Overlap (Webber/Moffat/Zobel, TOIS 2010) between two
    top-10 rankings — the top-weighted ranking-similarity metric for
    comparing retrieval systems (here: longest-docs vs richest-
    vocabulary rankings): RBO@10, p=0.9 = (1−p)·Σ_d p^(d−1)·|A_d∩B_d|/d.
    Made EXACT: a doc in both lists joins the intersection at depth
    m = max(r_A, r_B) and contributes the suffix sum Σ_{d≥m} w_d, where
    w_d = 9^(d−1)·10^(9−(d−1))·(2520/d) are PRE-REDUCED integer weights
    over the common denominator 10·10⁹·2520 — so RBO is an exact integer
    fraction with ONE final division, no floating powers of p anywhere.
    Plan: two TakeOrdered top-10s + a ≤10-row join; corpus scanned once
    per ranking."""
    docs = load_table(spark, sf_dir, "documents")
    ra = (
        docs.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("n_chars").desc(), "doc_id"))
            .cast("int")
            .alias("r"),
        )
        .filter(F.col("r") <= 10)
        .withColumnRenamed("r", "ra")
    )
    rb = (
        docs.select(
            "doc_id",
            F.size(
                F.array_distinct(
                    F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
                )
            ).alias("nw"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("nw").desc(), "doc_id"))
            .cast("int")
            .alias("rb"),
        )
        .filter(F.col("rb") <= 10)
    )
    suffix = (
        F.when(F.col("m") == 1, 5932493265528)
        .when(F.col("m") == 2, 3412493265528)
        .when(F.col("m") == 3, 2278493265528)
        .when(F.col("m") == 4, 1598093265528)
        .when(F.col("m") == 5, 1138823265528)
        .when(F.col("m") == 6, 808148865528)
        .when(F.col("m") == 7, 560143065528)
        .when(F.col("m") == 8, 368824305528)
        .when(F.col("m") == 9, 218160782028)
        .otherwise(97629963228)
    )
    common = ra.join(rb, "doc_id").select(
        F.greatest("ra", "rb").alias("m")
    )
    return common.agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.coalesce(F.sum(suffix), F.lit(0)).cast("long").alias("rbo_num"),
    ).select(
        "n_common",
        "rbo_num",
        F.lit(25200000000000).cast("long").alias("rbo_den"),
        (F.col("rbo_num").cast("double") / F.lit(25200000000000)).alias("rbo"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 106 — paired-classifier McNemar test, Cohen's kappa,
# cost-sensitive threshold selection, matched-pairs ATT.
# ---------------------------------------------------------------------------


@_q(
    "q_mcnemar_test",
    """
    WITH lab AS (
      SELECT doc_id,
             CAST(n_chars >= 300 AS INTEGER) AS a,
             CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+')))
               >= 26 AS INTEGER) AS b
      FROM documents
    ),
    cells AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE a = 1 AND b = 1) AS BIGINT) AS keep_both,
             CAST(count(*) FILTER (WHERE a = 1 AND b = 0) AS BIGINT) AS a_only,
             CAST(count(*) FILTER (WHERE a = 0 AND b = 1) AS BIGINT) AS b_only,
             CAST(count(*) FILTER (WHERE a = 0 AND b = 0) AS BIGINT) AS neither
      FROM lab
    )
    SELECT n, keep_both, a_only, b_only, neither,
           CAST((a_only - b_only) * (a_only - b_only) AS DOUBLE)
             / (a_only + b_only) AS chi2
    FROM cells
    """,
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST on two paired quality filters (length rule vs
    vocabulary-richness rule over the same documents) — the paired
    comparison that answers "do these two filters disagree
    SYSTEMATICALLY, or just randomly": only the discordant cells matter,
    χ² = (b−c)²/(b+c). The 2×2 cells are one conditional-aggregate pass
    of integer counts; χ² is ONE division. This is how a curation team
    compares a new keep/drop rule against the incumbent without ground
    truth. Plan: a single map-side-combinable aggregate to one row."""
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        (F.col("n_chars") >= 300).cast("int").alias("a"),
        (
            F.size(
                F.array_distinct(
                    F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
                )
            )
            >= 26
        )
        .cast("int")
        .alias("b"),
    )
    cells = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("keep_both"),
        F.count(F.when((F.col("a") == 1) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("a_only"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 1), 1))
        .cast("long")
        .alias("b_only"),
        F.count(F.when((F.col("a") == 0) & (F.col("b") == 0), 1))
        .cast("long")
        .alias("neither"),
    )
    return cells.select(
        "n",
        "keep_both",
        "a_only",
        "b_only",
        "neither",
        (
            ((F.col("a_only") - F.col("b_only")) * (F.col("a_only") - F.col("b_only")))
            .cast("double")
            / (F.col("a_only") + F.col("b_only"))
        ).alias("chi2"),
    )


@_q(
    "q_cohen_kappa",
    """
    WITH lab AS (
      SELECT CAST(n_chars >= 300 AS INTEGER) AS a,
             CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+')))
               >= 26 AS INTEGER) AS b
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(a) AS BIGINT) AS ka, CAST(SUM(b) AS BIGINT) AS kb,
             CAST(count(*) FILTER (WHERE a = b) AS BIGINT) AS agree
      FROM lab
    )
    SELECT n, ka, kb, agree,
           CAST(n * agree - (ka * kb + (n - ka) * (n - kb)) AS BIGINT) AS kappa_num,
           CAST(n * n - (ka * kb + (n - ka) * (n - kb)) AS BIGINT) AS kappa_den,
           CAST(n * agree - (ka * kb + (n - ka) * (n - kb)) AS DOUBLE)
             / (n * n - (ka * kb + (n - ka) * (n - kb))) AS kappa
    FROM c
    """,
)
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA — chance-corrected agreement between two labelers
    (the same paired rules as q_mcnemar_test, asking the complementary
    question: "how much do they AGREE beyond chance", the standard
    inter-annotator metric for labeling pipelines). Algebraically
    cleared of its inner divisions: κ = (p_o − p_e)/(1 − p_e) =
    (n·agree − (k_a·k_b + (n−k_a)(n−k_b))) / (n² − (k_a·k_b +
    (n−k_a)(n−k_b))) — an exact INTEGER fraction emitted as num/den
    plus ONE final division. Plan: one aggregate pass to one row."""
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        (F.col("n_chars") >= 300).cast("int").alias("a"),
        (
            F.size(
                F.array_distinct(
                    F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
                )
            )
            >= 26
        )
        .cast("int")
        .alias("b"),
    )
    c = lab.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("ka"),
        F.sum("b").cast("long").alias("kb"),
        F.count(F.when(F.col("a") == F.col("b"), 1)).cast("long").alias("agree"),
    )
    pe_num = F.col("ka") * F.col("kb") + (F.col("n") - F.col("ka")) * (
        F.col("n") - F.col("kb")
    )
    num = F.col("n") * F.col("agree") - pe_num
    den = F.col("n") * F.col("n") - pe_num
    return c.select(
        "n",
        "ka",
        "kb",
        "agree",
        num.cast("long").alias("kappa_num"),
        den.cast("long").alias("kappa_den"),
        (num.cast("double") / den).alias("kappa"),
    )


@_q(
    "q_cost_threshold",
    """
    WITH scored AS (
      SELECT n_chars AS score, CAST(lang = 'en' AS INTEGER) AS label
      FROM documents
    ),
    grid AS (
      SELECT DISTINCT score AS t FROM (
        SELECT score, ROW_NUMBER() OVER (ORDER BY score, label) AS rn,
               COUNT(*) OVER () AS n
        FROM scored
      ) WHERE (rn - 1) * 10 // n <> rn * 10 // n OR rn = 1
    ),
    conf AS (
      SELECT t,
             CAST(count(*) FILTER (WHERE score >= t AND label = 1) AS BIGINT) AS tp,
             CAST(count(*) FILTER (WHERE score >= t AND label = 0) AS BIGINT) AS fp,
             CAST(count(*) FILTER (WHERE score < t AND label = 1) AS BIGINT) AS fn,
             CAST(count(*) FILTER (WHERE score < t AND label = 0) AS BIGINT) AS tn
      FROM scored CROSS JOIN grid GROUP BY 1
    )
    SELECT CAST(t AS BIGINT) AS threshold, tp, fp, fn, tn,
           CAST(fp + 3 * fn AS BIGINT) AS cost,
           fp + 3 * fn = MIN(fp + 3 * fn) OVER () AS is_optimal
    FROM conf
    """,
)
def q_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COST-SENSITIVE threshold selection — pick the operating point of
    a classifier (score = document length, label = English) under an
    asymmetric cost matrix (FP costs 1, FN costs 3 — missing a good doc
    hurts more than keeping a bad one): the full confusion matrix at
    each of ~10 decile-boundary candidate thresholds, integer cost
    fp + 3·fn, optimum flagged by an integer window MIN. The candidate
    grid is rank-derived (decile boundaries with total-order ties), so
    the sweep is data-adaptive yet deterministic. Plan: one rank pass
    builds the tiny grid, one broadcast-grid conditional aggregate
    builds ALL confusion matrices in a single scan."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("n_chars").alias("score"), (F.col("lang") == "en").cast("int").alias("label")
    )
    rk = scored.select(
        "score",
        F.row_number().over(Window.orderBy("score", "label")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    grid = (
        rk.filter(
            F.expr("(rn - 1) * 10 div n <> rn * 10 div n OR rn = 1")
        )
        .select(F.col("score").alias("t"))
        .distinct()
    )
    conf = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("t")
        .agg(
            F.count(F.when((F.col("score") >= F.col("t")) & (F.col("label") == 1), 1))
            .cast("long")
            .alias("tp"),
            F.count(F.when((F.col("score") >= F.col("t")) & (F.col("label") == 0), 1))
            .cast("long")
            .alias("fp"),
            F.count(F.when((F.col("score") < F.col("t")) & (F.col("label") == 1), 1))
            .cast("long")
            .alias("fn"),
            F.count(F.when((F.col("score") < F.col("t")) & (F.col("label") == 0), 1))
            .cast("long")
            .alias("tn"),
        )
    )
    cost = F.col("fp") + 3 * F.col("fn")
    return conf.select(
        F.col("t").cast("long").alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        cost.cast("long").alias("cost"),
        (cost == F.min(cost).over(Window.partitionBy())).alias("is_optimal"),
    )


@_q(
    "q_matched_pairs_att",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(count(*) FILTER (WHERE day(ts) <= 15) AS BIGINT) AS score,
             CAST(SUM(CASE WHEN day(ts) > 15
               THEN CAST(FLOOR(value * 1000000) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS y_micro
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    s AS (
      SELECT *,
             LAST_VALUE(CASE WHEN grp = 0 THEN score END IGNORE NULLS)
               OVER w AS prev_cs,
             LAST_VALUE(CASE WHEN grp = 0 THEN y_micro END IGNORE NULLS)
               OVER w AS prev_cy,
             FIRST_VALUE(CASE WHEN grp = 0 THEN score END IGNORE NULLS)
               OVER w2 AS next_cs,
             FIRST_VALUE(CASE WHEN grp = 0 THEN y_micro END IGNORE NULLS)
               OVER w2 AS next_cy
      FROM u
      WINDOW w AS (ORDER BY score, grp, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (ORDER BY score, grp, user_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    matched AS (
      SELECT user_id, score, y_micro,
             CASE WHEN next_cs IS NULL THEN prev_cy
                  WHEN prev_cs IS NULL THEN next_cy
                  WHEN score - prev_cs <= next_cs - score THEN prev_cy
                  ELSE next_cy END AS yc_micro,
             CASE WHEN next_cs IS NULL THEN score - prev_cs
                  WHEN prev_cs IS NULL THEN next_cs - score
                  WHEN score - prev_cs <= next_cs - score THEN score - prev_cs
                  ELSE next_cs - score END AS match_dist
      FROM s WHERE grp = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(SUM(y_micro) AS BIGINT) AS sum_treated_micro,
           CAST(SUM(yc_micro) AS BIGINT) AS sum_matched_micro,
           CAST(SUM(match_dist) AS BIGINT) AS total_match_dist,
           CAST(SUM(y_micro) - SUM(yc_micro) AS DOUBLE) / count(*) / 1000000
             AS att
    FROM matched
    """,
)
def q_matched_pairs_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor MATCHED-PAIRS ATT (average treatment effect on
    the treated) — observational causal inference's workhorse: every
    treated user is matched WITH REPLACEMENT to the control whose
    pre-period activity score is closest, and the ATT is the mean
    treated-minus-matched outcome. Exact nearest-neighbor at scale uses
    the as-of trick, not a cross join: one global sort of both arms by
    (score, grp, user_id), carry the last/next control via IGNORE-NULLS
    window frames, pick the closer side (ties prefer the predecessor —
    a total order both engines share). Outcomes are integer micros; the
    ATT is one fixed expression; total match distance rides along as
    the match-quality diagnostic. Plan: one unit aggregate + one sorted
    window pass — O(n log n), no candidate explosion."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        F.count(F.when(F.dayofmonth("ts") <= 15, 1)).cast("long").alias("score"),
        F.sum(
            F.when(
                F.dayofmonth("ts") > 15,
                F.floor(F.col("value") * 1000000).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("y_micro"),
    )
    wprev = Window.orderBy("score", "grp", "user_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wnext = Window.orderBy("score", "grp", "user_id").rowsBetween(
        1, Window.unboundedFollowing
    )
    ctrl_s = F.when(F.col("grp") == 0, F.col("score"))
    ctrl_y = F.when(F.col("grp") == 0, F.col("y_micro"))
    s = u.select(
        "*",
        F.last(ctrl_s, ignorenulls=True).over(wprev).alias("prev_cs"),
        F.last(ctrl_y, ignorenulls=True).over(wprev).alias("prev_cy"),
        F.first(ctrl_s, ignorenulls=True).over(wnext).alias("next_cs"),
        F.first(ctrl_y, ignorenulls=True).over(wnext).alias("next_cy"),
    )
    prefer_prev = (F.col("next_cs").isNull()) | (
        F.col("prev_cs").isNotNull()
        & (F.col("score") - F.col("prev_cs") <= F.col("next_cs") - F.col("score"))
    )
    matched = s.filter(F.col("grp") == 1).select(
        "user_id",
        "score",
        "y_micro",
        F.when(prefer_prev, F.col("prev_cy")).otherwise(F.col("next_cy")).alias(
            "yc_micro"
        ),
        F.when(prefer_prev, F.col("score") - F.col("prev_cs"))
        .otherwise(F.col("next_cs") - F.col("score"))
        .alias("match_dist"),
    )
    return matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("y_micro").cast("long").alias("sum_treated_micro"),
        F.sum("yc_micro").cast("long").alias("sum_matched_micro"),
        F.sum("match_dist").cast("long").alias("total_match_dist"),
    ).select(
        "n_pairs",
        "sum_treated_micro",
        "sum_matched_micro",
        "total_match_dist",
        (
            (F.col("sum_treated_micro") - F.col("sum_matched_micro")).cast("double")
            / F.col("n_pairs")
            / F.lit(1000000)
        ).alias("att"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 107 — group-sequential interim analysis, Beta posterior,
# empirical-Bayes shrinkage, Bonferroni pairwise comparisons.
# ---------------------------------------------------------------------------


@_q(
    "q_interim_analysis",
    f"""
    WITH cuts AS (SELECT UNNEST([10, 20, 30]) AS cut_day),
    g AS (
      SELECT cut_day,
             CAST(count(*) FILTER (WHERE user_id % 2 = 1 AND day(ts) <= cut_day)
               AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE user_id % 2 = 0 AND day(ts) <= cut_day)
               AS BIGINT) AS n0,
             {_msum6("CASE WHEN user_id % 2 = 1 AND day(ts) <= cut_day THEN value END")} AS s1,
             {_msum6("CASE WHEN user_id % 2 = 0 AND day(ts) <= cut_day THEN value END")} AS s0,
             {_msum6("CASE WHEN user_id % 2 = 1 AND day(ts) <= cut_day THEN value * value END")} AS q1,
             {_msum6("CASE WHEN user_id % 2 = 0 AND day(ts) <= cut_day THEN value * value END")} AS q0
      FROM events CROSS JOIN cuts WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT CAST(cut_day AS INTEGER) AS cut_day, n1, n0,
           (s1 / n1 - s0 / n0)
             / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                    + (q0 - s0 * s0 / n0) / (n0 - 1) / n0) AS z,
           ABS((s1 / n1 - s0 / n0)
             / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                    + (q0 - s0 * s0 / n0) / (n0 - 1) / n0)) > 2.289 AS crossed
    FROM g
    """,
)
def q_interim_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-SEQUENTIAL interim analysis (Pocock design, K=3 looks): the
    Welch z statistic for treatment-vs-control at three interim data
    cuts (days ≤10/≤20/≤30), each compared against the constant Pocock
    boundary 2.289 that keeps the FAMILY-wISE error at 5% across the
    three peeks — the discipline that lets an experiment stop early
    without p-hacking itself. All three cuts come from ONE conditional-
    aggregate pass (the cut grid broadcasts map-side); moments are exact
    decimal sums and each z is a fixed scalar expression, the boundary
    an exact literal. Plan: one scan, one aggregate to 3 rows."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cuts = spark.createDataFrame([(10,), (20,), (30,)], "cut_day int")
    j = ev.crossJoin(F.broadcast(cuts))
    inc = F.dayofmonth("ts") <= F.col("cut_day")
    t = F.col("user_id") % 2 == 1
    g = j.groupBy("cut_day").agg(
        F.count(F.when(t & inc, 1)).cast("long").alias("n1"),
        F.count(F.when(~t & inc, 1)).cast("long").alias("n0"),
        exact_sum(F.when(t & inc, F.col("value")), 6).alias("s1"),
        exact_sum(F.when(~t & inc, F.col("value")), 6).alias("s0"),
        exact_sum(F.when(t & inc, F.col("value") * F.col("value")), 6).alias("q1"),
        exact_sum(F.when(~t & inc, F.col("value") * F.col("value")), 6).alias("q0"),
    )
    z = (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")) / F.sqrt(
        (F.col("q1") - F.col("s1") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1)
        / F.col("n1")
        + (F.col("q0") - F.col("s0") * F.col("s0") / F.col("n0"))
        / (F.col("n0") - 1)
        / F.col("n0")
    )
    return g.select(
        F.col("cut_day").cast("int").alias("cut_day"),
        "n1",
        "n0",
        z.alias("z"),
        (F.abs(z) > 2.289).alias("crossed"),
    )


@_q(
    "q_beta_posterior",
    """
    WITH u AS (
      SELECT user_id, event_type,
             CAST(MAX(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS INTEGER) AS conv
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS x
      FROM u GROUP BY 1
    )
    SELECT event_type, n, x,
           CAST(1 + x AS BIGINT) AS alpha, CAST(1 + n - x AS BIGINT) AS beta,
           CAST(1 + x AS DOUBLE) / (2 + n) AS post_mean,
           CAST((1 + x) * (1 + n - x) AS BIGINT) AS var_num,
           CAST((2 + n) * (2 + n) * (3 + n) AS BIGINT) AS var_den,
           CAST((1 + x) * (1 + n - x) AS DOUBLE)
             / ((2 + n) * (2 + n) * (3 + n)) AS post_var
    FROM g
    """,
)
def q_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETA-BINOMIAL posterior summary — the Bayesian conversion-rate
    report: with a uniform Beta(1,1) prior and x successes in n users,
    the posterior is Beta(1+x, 1+n−x); its mean (1+x)/(2+n) and variance
    αβ/((α+β)²(α+β+1)) are EXACT RATIONALS of the integer counts, so the
    whole posterior summary is emitted as integer numerators/denominators
    plus one division per double — no special functions, no sampling.
    This is the smoothing that keeps small segments from reporting 0% or
    100% rates. Plan: a user-grain aggregate then a segment aggregate —
    two map-side-combinable passes."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id", "event_type").agg(
        F.max(F.when(F.col("value") > 100, 1).otherwise(0)).cast("int").alias("conv")
    )
    g = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    alpha = 1 + F.col("x")
    beta = 1 + F.col("n") - F.col("x")
    return g.select(
        "event_type",
        "n",
        "x",
        alpha.cast("long").alias("alpha"),
        beta.cast("long").alias("beta"),
        (alpha.cast("double") / (2 + F.col("n"))).alias("post_mean"),
        (alpha * beta).cast("long").alias("var_num"),
        ((2 + F.col("n")) * (2 + F.col("n")) * (3 + F.col("n")))
        .cast("long")
        .alias("var_den"),
        (
            (alpha * beta).cast("double")
            / ((2 + F.col("n")) * (2 + F.col("n")) * (3 + F.col("n")))
        ).alias("post_var"),
    )


@_q(
    "q_eb_shrinkage",
    """
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(x) AS BIGINT) AS gx, CAST(SUM(n) AS BIGINT) AS gn FROM u
    )
    SELECT user_id, n, x,
           CAST(x AS DOUBLE) / n AS raw_rate,
           CAST(gx AS DOUBLE) / gn AS global_rate,
           (x + 20 * (CAST(gx AS DOUBLE) / gn)) / (n + 20) AS shrunk_rate,
           CAST(x * gn AS BIGINT) AS rank_num, CAST(n * gx AS BIGINT) AS rank_den
    FROM u, tot
    """,
)
def q_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES shrinkage of per-user purchase rates toward the
    corpus rate (the batting-average estimator): shrunk = (x + m·p̄)/
    (n + m) with prior strength m=20 pseudo-observations — the fix for
    small-sample leaderboards where a 1/1 user would otherwise outrank a
    95/100 user. The global rate is ONE division of two broadcast
    integers; the shrunk rate is a fixed expression; rank_num/rank_den
    emit the raw-vs-global comparison as an exact integer cross-product
    (x·gn vs n·gx) so over/under-performers are flagged without float
    thresholds. Plan: one unit aggregate + broadcast scalar totals —
    map-side arithmetic, O(users) output."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("long")
        .alias("x"),
    )
    tot = u.agg(
        F.sum("x").cast("long").alias("gx"), F.sum("n").cast("long").alias("gn")
    )
    j = u.crossJoin(F.broadcast(tot))
    grate = F.col("gx").cast("double") / F.col("gn")
    return j.select(
        "user_id",
        "n",
        "x",
        (F.col("x").cast("double") / F.col("n")).alias("raw_rate"),
        grate.alias("global_rate"),
        ((F.col("x") + 20 * grate) / (F.col("n") + 20)).alias("shrunk_rate"),
        (F.col("x") * F.col("gn")).cast("long").alias("rank_num"),
        (F.col("n") * F.col("gx")).cast("long").alias("rank_den"),
    )


@_q(
    "q_pairwise_bonferroni",
    f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             {_msum6("value")} AS s1, {_msum6("value * value")} AS s2
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b, a.n AS n_a, b.n AS n_b,
           (a.s1 / a.n - b.s1 / b.n)
             / sqrt((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
                    + (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n) AS z,
           ABS((a.s1 / a.n - b.s1 / b.n)
             / sqrt((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
                    + (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n))
             > 2.807033768343811 AS significant
    FROM g a JOIN g b ON a.event_type < b.event_type
    """,
)
def q_pairwise_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL-PAIRS mean comparison with BONFERRONI correction — the
    multiple-testing discipline for "which segments actually differ":
    Welch z for every unordered pair of event types, declared
    significant only beyond z_{α/(2m)} with m = 10 pairs (the exact
    double literal 2.807033768343811 = Φ⁻¹(1 − 0.05/20), hard-coded —
    no inverse-normal evaluation at query time). Uncorrected pairwise
    peeks at 10 pairs would fire falsely ~40% of the time. Moments are
    exact decimal sums; each z is one fixed expression over the 5-row
    aggregate's self-join. Plan: one aggregate pass + an O(groups²)
    broadcast self-join."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        exact_sum(F.col("value"), 6).alias("s1"),
        exact_sum(F.col("value") * F.col("value"), 6).alias("s2"),
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("s1").alias("sa1"),
        F.col("s2").alias("sa2"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("s1").alias("sb1"),
        F.col("s2").alias("sb2"),
    )
    j = a.join(b, F.col("type_a") < F.col("type_b"))
    z = (F.col("sa1") / F.col("n_a") - F.col("sb1") / F.col("n_b")) / F.sqrt(
        (F.col("sa2") - F.col("sa1") * F.col("sa1") / F.col("n_a"))
        / (F.col("n_a") - 1)
        / F.col("n_a")
        + (F.col("sb2") - F.col("sb1") * F.col("sb1") / F.col("n_b"))
        / (F.col("n_b") - 1)
        / F.col("n_b")
    )
    return j.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        z.alias("z"),
        (F.abs(z) > 2.807033768343811).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 108 — Benjamini-Hochberg FDR, Page-Hinkley drift,
# Simpson-reversal detector, storage tiering plan.
# ---------------------------------------------------------------------------


@_q(
    "q_benjamini_hochberg",
    f"""
    WITH g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             {_msum6("value")} AS s1, {_msum6("value * value")} AS s2
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    pz AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             (a.s1 / a.n - b.s1 / b.n)
               / sqrt((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) / a.n
                      + (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) / b.n) AS z
      FROM g a JOIN g b ON a.event_type < b.event_type
    ),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY ABS(z) DESC, type_a, type_b)
        AS INTEGER) AS bh_rank
      FROM pz
    ),
    crit AS (
      SELECT *, CAST(CASE bh_rank
        WHEN 1 THEN 2.8070337683438114 WHEN 2 THEN 2.5758293035489
        WHEN 3 THEN 2.432379058584449 WHEN 4 THEN 2.3263478740408408
        WHEN 5 THEN 2.2414027276049464 WHEN 6 THEN 2.17009037758456
        WHEN 7 THEN 2.1083583991691093 WHEN 8 THEN 2.053748910631822
        WHEN 9 THEN 2.0046544617650963 ELSE 1.9599639845400536 END
        AS DOUBLE) AS crit_z
      FROM rk
    ),
    k AS (
      SELECT *, MAX(CASE WHEN ABS(z) >= crit_z THEN bh_rank ELSE 0 END)
        OVER () AS k_star
      FROM crit
    )
    SELECT type_a, type_b, z, bh_rank, crit_z,
           bh_rank <= k_star AS rejected,
           ABS(z) > 2.8070337683438114 AS bonferroni_sig
    FROM k
    """,
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG step-up FDR control over the 10 pairwise mean
    comparisons — the modern multiple-testing correction (controls the
    FALSE DISCOVERY RATE instead of Bonferroni's family-wise error, so
    it rejects everything Bonferroni does and usually more; the
    bonferroni_sig column rides along to show exactly that). The p-value
    sort is replaced by the equivalent |z| sort, the 10 rank-dependent
    critical values Φ⁻¹(1 − α·i/(2m)) are EXACT double literals (no
    inverse-normal at query time), and the step-up "largest passing
    rank" is one integer window MAX — every comparison is double-vs-
    literal or integer. Plan: one aggregate + O(pairs) self-join +
    O(pairs) windows."""
    from etl_pipeline_project_spark.operators.aggregates import exact_sum

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        exact_sum(F.col("value"), 6).alias("s1"),
        exact_sum(F.col("value") * F.col("value"), 6).alias("s2"),
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("s1").alias("sa1"),
        F.col("s2").alias("sa2"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("s1").alias("sb1"),
        F.col("s2").alias("sb2"),
    )
    z = (F.col("sa1") / F.col("n_a") - F.col("sb1") / F.col("n_b")) / F.sqrt(
        (F.col("sa2") - F.col("sa1") * F.col("sa1") / F.col("n_a"))
        / (F.col("n_a") - 1)
        / F.col("n_a")
        + (F.col("sb2") - F.col("sb1") * F.col("sb1") / F.col("n_b"))
        / (F.col("n_b") - 1)
        / F.col("n_b")
    )
    pz = a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a", "type_b", z.alias("z")
    )
    rk = pz.withColumn(
        "bh_rank",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("z")).desc(), "type_a", "type_b"))
        .cast("int"),
    )
    crit = (
        F.when(F.col("bh_rank") == 1, 2.8070337683438114)
        .when(F.col("bh_rank") == 2, 2.5758293035489)
        .when(F.col("bh_rank") == 3, 2.432379058584449)
        .when(F.col("bh_rank") == 4, 2.3263478740408408)
        .when(F.col("bh_rank") == 5, 2.2414027276049464)
        .when(F.col("bh_rank") == 6, 2.17009037758456)
        .when(F.col("bh_rank") == 7, 2.1083583991691093)
        .when(F.col("bh_rank") == 8, 2.053748910631822)
        .when(F.col("bh_rank") == 9, 2.0046544617650963)
        .otherwise(1.9599639845400536)
    )
    kdf = rk.withColumn("crit_z", crit).withColumn(
        "k_star",
        F.max(
            F.when(F.abs(F.col("z")) >= F.col("crit_z"), F.col("bh_rank")).otherwise(0)
        ).over(Window.partitionBy()),
    )
    return kdf.select(
        "type_a",
        "type_b",
        "z",
        "bh_rank",
        "crit_z",
        (F.col("bh_rank") <= F.col("k_star")).alias("rejected"),
        (F.abs(F.col("z")) > 2.8070337683438114).alias("bonferroni_sig"),
    )


@_q(
    "q_page_hinkley",
    """
    WITH daily AS (
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             list(x ORDER BY d) AS xs
      FROM daily GROUP BY 1
    ),
    -- accumulator = [n, sum, m, m_min, ph_max] as a DOUBLE list; elements
    -- are wrapped [v] so both fold arguments are DOUBLE[] (DuckDB 1.0
    -- list_reduce mis-evaluates STRUCT accumulators — the q_holt_linear
    -- workaround)
    folded AS (
      SELECT event_type, n_days,
             list_reduce(
               list_prepend([0e0, 0e0, 0e0, 0e0, 0e0],
                            list_transform(xs, v -> [v])),
               (acc, c) -> [
                 acc[1] + 1,
                 acc[2] + c[1],
                 acc[3] + c[1] - (acc[2] + c[1]) / (acc[1] + 1) - 0.5,
                 LEAST(acc[4], acc[3] + c[1] - (acc[2] + c[1]) / (acc[1] + 1) - 0.5),
                 GREATEST(acc[5],
                   acc[3] + c[1] - (acc[2] + c[1]) / (acc[1] + 1) - 0.5
                     - LEAST(acc[4],
                         acc[3] + c[1] - (acc[2] + c[1]) / (acc[1] + 1) - 0.5))
               ]) AS acc
      FROM series
    )
    SELECT event_type, n_days,
           acc[3] AS m_final, acc[4] AS m_min, acc[5] AS ph_max,
           acc[5] > 20.0 AS drift_alarm
    FROM folded
    """,
)
def q_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-HINKLEY drift detection over each event type's daily-count
    series — the sequential change detector streaming-ML monitors run on
    feature/label distributions: m_t accumulates deviations from the
    RUNNING mean (tolerance δ=0.5), and the test statistic is
    PH_t = m_t − min_{i≤t} m_i, alarming when it exceeds λ=20. The fold
    is inherently sequential, so it runs as a per-series sorted-list
    reduce with a 5-slot DOUBLE-list accumulator ([n, Σx, m, min m,
    max PH] — the q_holt_linear fold discipline; both engines evaluate
    the identical association order, so the doubles match bit-for-bit).
    Series are bounded (days per type), never row-count-sized. Plan: one
    aggregate to the daily grid, one bounded fold per series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.array_sort(F.collect_list(F.struct("d", "x"))).alias("pairs"),
    )
    xs = F.transform(F.col("pairs"), lambda p: p["x"])

    def step(acc, x):
        m_new = acc[2] + x - (acc[1] + x) / (acc[0] + 1) - 0.5
        mmin_new = F.least(acc[3], m_new)
        return F.array(
            acc[0] + 1,
            acc[1] + x,
            m_new,
            mmin_new,
            F.greatest(acc[4], m_new - mmin_new),
        )

    folded = series.select(
        "event_type",
        "n_days",
        F.aggregate(
            xs,
            F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
            step,
        ).alias("acc"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("acc")[2].alias("m_final"),
        F.col("acc")[3].alias("m_min"),
        F.col("acc")[4].alias("ph_max"),
        (F.col("acc")[4] > 20.0).alias("drift_alarm"),
    )


@_q(
    "q_simpson_detect",
    """
    WITH u AS (
      SELECT user_id, event_type, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(MAX(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS INTEGER) AS conv
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    cells AS (
      SELECT event_type AS stratum,
             CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_t,
             CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_c,
             CAST(SUM(conv) FILTER (WHERE grp = 1) AS BIGINT) AS x_t,
             CAST(SUM(conv) FILTER (WHERE grp = 0) AS BIGINT) AS x_c
      FROM u GROUP BY 1
    ),
    pooled AS (
      SELECT CAST(SUM(n_t) AS BIGINT) AS pn_t, CAST(SUM(n_c) AS BIGINT) AS pn_c,
             CAST(SUM(x_t) AS BIGINT) AS px_t, CAST(SUM(x_c) AS BIGINT) AS px_c
      FROM cells
    )
    SELECT stratum, n_t, n_c, x_t, x_c,
           CAST(x_t * n_c - x_c * n_t AS BIGINT) AS stratum_sign_num,
           CAST(px_t * pn_c - px_c * pn_t AS BIGINT) AS pooled_sign_num,
           (x_t * n_c - x_c * n_t) * (px_t * pn_c - px_c * pn_t) < 0 AS reversed
    FROM cells, pooled
    """,
)
def q_simpson_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX detector: per stratum, does the treatment-vs-
    control conversion-rate difference point the OPPOSITE way from the
    pooled difference — the composition trap every segmented report
    should check before anyone acts on the pooled number. Rate
    comparisons are exact INTEGER cross-products (x_t·n_c vs x_c·n_t —
    never a float rate), the pooled sign is a broadcast scalar, and the
    reversal flag is a product-sign test on two integers. Plan: one
    user-grain aggregate, one stratum aggregate, one broadcast scalar —
    a single fact scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy(
        "user_id", "event_type", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        F.max(F.when(F.col("value") > 100, 1).otherwise(0)).cast("int").alias("conv")
    )
    t = F.col("grp") == 1
    cells = u.groupBy(F.col("event_type").alias("stratum")).agg(
        F.count(F.when(t, 1)).cast("long").alias("n_t"),
        F.count(F.when(~t, 1)).cast("long").alias("n_c"),
        F.sum(F.when(t, F.col("conv"))).cast("long").alias("x_t"),
        F.sum(F.when(~t, F.col("conv"))).cast("long").alias("x_c"),
    )
    pooled = cells.agg(
        F.sum("n_t").cast("long").alias("pn_t"),
        F.sum("n_c").cast("long").alias("pn_c"),
        F.sum("x_t").cast("long").alias("px_t"),
        F.sum("x_c").cast("long").alias("px_c"),
    )
    j = cells.crossJoin(F.broadcast(pooled))
    ssign = F.col("x_t") * F.col("n_c") - F.col("x_c") * F.col("n_t")
    psign = F.col("px_t") * F.col("pn_c") - F.col("px_c") * F.col("pn_t")
    return j.select(
        "stratum",
        "n_t",
        "n_c",
        "x_t",
        "x_c",
        ssign.cast("long").alias("stratum_sign_num"),
        psign.cast("long").alias("pooled_sign_num"),
        (ssign * psign < 0).alias("reversed"),
    )


@_q(
    "q_storage_tiering",
    """
    WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
    tiered AS (
      SELECT CASE WHEN ts > mx - INTERVAL 7 DAY THEN 'hot'
                  WHEN ts > mx - INTERVAL 21 DAY THEN 'warm'
                  ELSE 'cold' END AS tier,
             CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(FLOOR(COALESCE(value, 0) * 1000000) AS BIGINT) AS v_micro
      FROM events, anchor
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
    SELECT tier,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT d) AS BIGINT) AS n_days,
           CAST(SUM(v_micro) AS BIGINT) AS value_micro,
           CAST(count(*) * 1000000 // n AS BIGINT) AS share_ppm,
           CASE tier WHEN 'hot' THEN 'keep-on-ssd'
                     WHEN 'warm' THEN 'compact-and-standard'
                     ELSE 'archive-columnar-max-compression' END AS action
    FROM tiered, tot GROUP BY 1, n
    """,
)
def q_storage_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage LIFECYCLE TIERING plan — the table-maintenance pass that
    keeps a petabyte table affordable: partitions bucket into hot
    (≤7 days from the data's own horizon — no wall clock), warm (≤21)
    and cold, each with its row/day/value census, corpus share in
    integer ppm, and the maintenance action a lifecycle policy would
    emit (SSD / compact / archive). Plan: one broadcast scalar anchor +
    one aggregate with a distinct-day count — a single scan produces
    the entire tiering manifest; at scale the CASE runs on partition
    values, making the plan metadata-only."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("mx"))
    j = ev.crossJoin(F.broadcast(anchor))
    tier = (
        F.when(F.col("ts") > F.col("mx") - F.expr("INTERVAL 7 DAYS"), "hot")
        .when(F.col("ts") > F.col("mx") - F.expr("INTERVAL 21 DAYS"), "warm")
        .otherwise("cold")
    )
    tiered = j.select(
        tier.alias("tier"),
        F.expr("unix_timestamp(ts) div 86400").alias("d"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 1000000)
        .cast("long")
        .alias("v_micro"),
    )
    tot = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    action = (
        F.when(F.col("tier") == "hot", "keep-on-ssd")
        .when(F.col("tier") == "warm", "compact-and-standard")
        .otherwise("archive-columnar-max-compression")
    )
    return (
        tiered.crossJoin(F.broadcast(tot))
        .groupBy("tier", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("d").cast("long").alias("n_days"),
            F.sum("v_micro").cast("long").alias("value_micro"),
        )
        .select(
            "tier",
            "n_rows",
            "n_days",
            "value_micro",
            F.expr("n_rows * 1000000 div n").cast("long").alias("share_ppm"),
            action.alias("action"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 batch 109 — capture-recapture coverage, fixed-point raking,
# Chao1 vocabulary richness, hash-collision audit.
# ---------------------------------------------------------------------------


@_q(
    "q_capture_recapture",
    """
    WITH pop AS (SELECT DISTINCT user_id FROM events),
    marks AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 's1'), 1, 8))
               AS BIGINT) % 2 = 0 AS in_s1,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || 's2'), 1, 8))
               AS BIGINT) % 2 = 0 AS in_s2
      FROM pop
    )
    SELECT CAST(count(*) FILTER (WHERE in_s1) AS BIGINT) AS n1,
           CAST(count(*) FILTER (WHERE in_s2) AS BIGINT) AS n2,
           CAST(count(*) FILTER (WHERE in_s1 AND in_s2) AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS true_n,
           CAST((count(*) FILTER (WHERE in_s1) + 1)
                * (count(*) FILTER (WHERE in_s2) + 1)
                // (count(*) FILTER (WHERE in_s1 AND in_s2) + 1) - 1
             AS BIGINT) AS chapman_est
    FROM marks
    """,
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE-RECAPTURE population estimation (Chapman's corrected
    Lincoln-Petersen) — the data-quality technique for estimating how
    many entities exist when no source sees them all: two independent
    "capture" samples (deterministic md5 halves of the user population),
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 from the overlap m. Here the true N
    rides along, so the estimator's error is inspectable — in
    production the two samples are two ingestion pipelines and N is
    unknown. The estimate is computed in INTEGER arithmetic (floor
    division — a whole-entity count). Plan: one distinct + one
    conditional aggregate to a single row."""
    ev = load_table(spark, sf_dir, "events")
    pop = ev.select("user_id").distinct()

    def mark(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("user_id").cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )

    marks = pop.select(mark("s1").alias("in_s1"), mark("s2").alias("in_s2"))
    g = marks.agg(
        F.count(F.when(F.col("in_s1"), 1)).cast("long").alias("n1"),
        F.count(F.when(F.col("in_s2"), 1)).cast("long").alias("n2"),
        F.count(F.when(F.col("in_s1") & F.col("in_s2"), 1)).cast("long").alias("m"),
        F.count(F.lit(1)).cast("long").alias("true_n"),
    )
    return g.select(
        "n1",
        "n2",
        "m",
        "true_n",
        (
            F.expr("(n1 + 1) * (n2 + 1) div (m + 1)") - 1
        )
        .cast("long")
        .alias("chapman_est"),
    )


@_q(
    "q_raking",
    """
    WITH cells AS (
      SELECT event_type AS e, CAST(user_id % 2 AS INTEGER) AS g,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(count(DISTINCT e) AS BIGINT) AS n_rows_dim
      FROM cells
    ),
    w0 AS (SELECT e, g, n, n * 10000 AS w, total, n_rows_dim FROM cells, t),
    r1 AS (
      SELECT e, g, n, total, n_rows_dim,
             w * (total * 10000 // n_rows_dim)
               // SUM(w) OVER (PARTITION BY e) AS w
      FROM w0
    ),
    c1 AS (
      SELECT e, g, n, total, n_rows_dim,
             w * (total * 10000 // 2) // SUM(w) OVER (PARTITION BY g) AS w
      FROM r1
    ),
    r2 AS (
      SELECT e, g, n, total, n_rows_dim,
             w * (total * 10000 // n_rows_dim)
               // SUM(w) OVER (PARTITION BY e) AS w
      FROM c1
    ),
    c2 AS (
      SELECT e, g, n, total, n_rows_dim,
             w * (total * 10000 // 2) // SUM(w) OVER (PARTITION BY g) AS w
      FROM r2
    )
    SELECT e AS event_type, g AS grp, n,
           CAST(w AS BIGINT) AS weight_dmilli,
           CAST(SUM(w) OVER (PARTITION BY e) AS BIGINT) AS row_mass,
           CAST(SUM(w) OVER (PARTITION BY g) AS BIGINT) AS col_mass
    FROM c2
    """,
)
def q_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKING (iterative proportional fitting) of the event-type × group
    cell table to UNIFORM margins — survey statistics' post-
    stratification workhorse, two full row/column sweeps. Determinism is
    the hard part: real IPF multiplies by float ratios whose margin sums
    are order-dependent, so this is FIXED-POINT raking — weights live in
    integer 10⁻⁴ units, every margin sum is an associative integer SUM,
    and each adjustment is integer multiply-then-div. The emitted
    row/col masses show convergence toward the targets (exactness to the
    target is bounded by the fixed-point quantum — documented, not
    hidden). Plan: one aggregate + four O(cells) window passes; the
    fact table is scanned once."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("e"), (F.col("user_id") % 2).cast("int").alias("g")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = cells.agg(
        F.sum("n").cast("long").alias("total"),
        F.countDistinct("e").cast("long").alias("n_rows_dim"),
    )
    w0 = cells.crossJoin(F.broadcast(t)).select(
        "e", "g", "n", "total", "n_rows_dim", (F.col("n") * 10000).alias("w")
    )
    we = Window.partitionBy("e")
    wg = Window.partitionBy("g")
    row_t = F.expr("total * 10000 div n_rows_dim")
    col_t = F.expr("total * 10000 div 2")

    def row_sweep(df):
        return df.select(
            "e",
            "g",
            "n",
            "total",
            "n_rows_dim",
            F.expr(
                "w * (total * 10000 div n_rows_dim) div rowsum"
            ).alias("w"),
        )

    r1 = w0.withColumn("rowsum", F.sum("w").over(we))
    r1 = row_sweep(r1)
    c1 = r1.withColumn("colsum", F.sum("w").over(wg)).select(
        "e",
        "g",
        "n",
        "total",
        "n_rows_dim",
        F.expr("w * (total * 10000 div 2) div colsum").alias("w"),
    )
    r2 = c1.withColumn("rowsum", F.sum("w").over(we))
    r2 = row_sweep(r2)
    c2 = r2.withColumn("colsum", F.sum("w").over(wg)).select(
        "e",
        "g",
        "n",
        "total",
        "n_rows_dim",
        F.expr("w * (total * 10000 div 2) div colsum").alias("w"),
    )
    return c2.select(
        F.col("e").alias("event_type"),
        F.col("g").alias("grp"),
        "n",
        F.col("w").cast("long").alias("weight_dmilli"),
        F.sum("w").over(we).cast("long").alias("row_mass"),
        F.sum("w").over(wg).cast("long").alias("col_mass"),
    )


@_q(
    "q_vocab_richness",
    """
    WITH tf AS (
      SELECT t.term, CAST(count(*) AS BIGINT) AS f
      FROM (
        SELECT UNNEST(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
      ) t GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS s_obs,
             CAST(SUM(f) AS BIGINT) AS n_tokens,
             CAST(count(*) FILTER (WHERE f = 1) AS BIGINT) AS f1,
             CAST(count(*) FILTER (WHERE f = 2) AS BIGINT) AS f2
      FROM tf
    )
    SELECT s_obs, n_tokens, f1, f2,
           s_obs + (f1 * f1) // (2 * GREATEST(f2, 1)) AS chao1_est,
           CAST(f1 AS DOUBLE) / n_tokens AS gt_unseen_mass
    FROM s
    """,
)
def q_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY RICHNESS estimation — Chao1 (ecology's species-
    richness lower bound, standard in corpus linguistics): how many word
    types exist beyond the S_obs observed, estimated from the singleton/
    doubleton counts as S + f₁²/(2f₂); plus the GOOD-TURING unseen
    probability mass f₁/N — the fraction of the NEXT token expected to
    be a never-seen word, the number that tells a corpus curator whether
    more data still buys vocabulary. Chao1 is integer arithmetic (floor
    div, f₂ guarded to ≥1 per the bias-corrected convention); GT mass is
    ONE division. Plan: explode + one term-frequency aggregate + one
    reduction to a single row — the inverted-index shape again."""
    docs = load_table(spark, sf_dir, "documents")
    tf = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("term")
    ).groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("f"))
    s = tf.agg(
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.when(F.col("f") == 1, 1)).cast("long").alias("f1"),
        F.count(F.when(F.col("f") == 2, 1)).cast("long").alias("f2"),
    )
    return s.select(
        "s_obs",
        "n_tokens",
        "f1",
        "f2",
        (
            F.col("s_obs")
            + F.expr("(f1 * f1) div (2 * GREATEST(f2, CAST(1 AS BIGINT)))")
        )
        .cast("long")
        .alias("chao1_est"),
        (F.col("f1").cast("double") / F.col("n_tokens")).alias("gt_unseen_mass"),
    )


@_q(
    "q_hash_collision_audit",
    """
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
        AS h16
      FROM documents
    ),
    buckets AS (SELECT h16, CAST(count(*) AS BIGINT) AS k FROM h GROUP BY 1),
    s AS (
      SELECT CAST(SUM(k) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(SUM(k * (k - 1) // 2) AS BIGINT) AS coll_pairs,
             CAST(MAX(k) AS BIGINT) AS max_bucket
      FROM buckets
    )
    SELECT n, n_distinct, coll_pairs, max_bucket,
           CAST(n * (n - 1) AS BIGINT) AS expected_num,
           CAST(131072 AS BIGINT) AS expected_den,
           CAST(n * (n - 1) AS DOUBLE) / 131072 AS expected_pairs
    FROM s
    """,
)
def q_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-COLLISION audit (birthday-bound check) for a 16-bit hash
    prefix over document ids — the sanity pass any hash-partitioned or
    hash-bucketed scheme owes its operator: observed colliding pairs
    Σk(k−1)/2 against the birthday expectation n(n−1)/2·2⁻¹⁶ (emitted
    as an exact integer fraction n(n−1)/131072 plus one double), and the
    worst bucket's load. A healthy hash sits near the expectation; a
    broken or truncated one blows past it and silently skews every
    downstream salt/shard/bucket decision. Plan: one map-side hash, one
    aggregate to buckets, one reduction row."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("h16")
    )
    buckets = h.groupBy("h16").agg(F.count(F.lit(1)).cast("long").alias("k"))
    s = buckets.agg(
        F.sum("k").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.expr("k * (k - 1) div 2")).cast("long").alias("coll_pairs"),
        F.max("k").cast("long").alias("max_bucket"),
    )
    return s.select(
        "n",
        "n_distinct",
        "coll_pairs",
        "max_bucket",
        (F.col("n") * (F.col("n") - 1)).cast("long").alias("expected_num"),
        F.lit(131072).cast("long").alias("expected_den"),
        (
            (F.col("n") * (F.col("n") - 1)).cast("double") / F.lit(131072)
        ).alias("expected_pairs"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 110 — standardized residuals, complementary suppression,
# newsvendor fractile, ABC-XYZ planning matrix.
# ---------------------------------------------------------------------------


@_q(
    "q_haberman_residuals",
    """
    WITH cells AS (
      -- DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based
      SELECT event_type, dayofweek(ts) + 1 AS dow, CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, dow, o,
             CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r_tot,
             CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS c_tot,
             CAST(SUM(o) OVER () AS BIGINT) AS n
      FROM cells
    )
    SELECT event_type, CAST(dow AS INTEGER) AS dow, o, r_tot, c_tot,
           CAST(r_tot AS DOUBLE) / n * c_tot AS expected,
           (o - CAST(r_tot AS DOUBLE) / n * c_tot)
             / sqrt(CAST(r_tot AS DOUBLE) / n * c_tot
                    * (1 - CAST(r_tot AS DOUBLE) / n)
                    * (1 - CAST(c_tot AS DOUBLE) / n)) AS adj_residual,
           ABS((o - CAST(r_tot AS DOUBLE) / n * c_tot)
             / sqrt(CAST(r_tot AS DOUBLE) / n * c_tot
                    * (1 - CAST(r_tot AS DOUBLE) / n)
                    * (1 - CAST(c_tot AS DOUBLE) / n))) > 1.959963984540054
             AS outlier_cell
    FROM m
    """,
)
def q_haberman_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HABERMAN ADJUSTED RESIDUALS for the event-type × weekday
    contingency table — the cell-level diagnostic q_chi_square's omnibus
    statistic can't give: WHICH cells drive the dependence, each as
    (O−E)/√(E(1−p_r)(1−p_c)), approximately N(0,1) under independence,
    flagged beyond the exact z_{0.975} literal. Every input to the fixed
    scalar expression is an exact integer margin (the windows run on the
    ≤49-cell table); the expectation and residual are identical IEEE
    expression trees on both engines. Plan: one fact aggregate, three
    O(cells) windows — at 100 TB the residual table costs nothing beyond
    the census."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.dayofweek("ts").alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    m = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).cast("long").alias("r_tot"),
        F.sum("o").over(Window.partitionBy("dow")).cast("long").alias("c_tot"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("n"),
    )
    expected = F.col("r_tot").cast("double") / F.col("n") * F.col("c_tot")
    resid = (F.col("o") - expected) / F.sqrt(
        expected
        * (1 - F.col("r_tot").cast("double") / F.col("n"))
        * (1 - F.col("c_tot").cast("double") / F.col("n"))
    )
    return m.select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        "o",
        "r_tot",
        "c_tot",
        expected.alias("expected"),
        resid.alias("adj_residual"),
        (F.abs(resid) > 1.959963984540054).alias("outlier_cell"),
    )


@_q(
    "q_complementary_suppression",
    """
    WITH cells AS (
      SELECT event_type, CAST(user_id % 4 AS INTEGER) AS cohort,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    primary_s AS (SELECT *, n < 20 AS primary_sup FROM cells),
    ranked AS (
      SELECT *,
             CAST(SUM(CASE WHEN primary_sup THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type) AS INTEGER) AS n_sup_row,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY primary_sup, n, cohort) AS rn_small
      FROM primary_s
    )
    SELECT event_type, cohort, n,
           primary_sup,
           n_sup_row = 1 AND rn_small = 1 AS complementary_sup,
           primary_sup OR (n_sup_row = 1 AND rn_small = 1) AS suppressed,
           CASE WHEN primary_sup OR (n_sup_row = 1 AND rn_small = 1)
                THEN NULL ELSE n END AS published_n
    FROM ranked
    """,
)
def q_complementary_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATISTICAL DISCLOSURE CONTROL — primary + COMPLEMENTARY cell
    suppression: cells under the threshold (n<20 distinct users) are
    primary-suppressed, but a row with exactly ONE suppressed cell leaks
    it through the row total, so the smallest unsuppressed cell in that
    row is suppressed too (total-order tie-break (primary, n, cohort) —
    both engines pick the same victim). This is the step census
    agencies run after k-anonymity-style thresholds (q_k_anonymize stops
    at primary suppression). Published values are NULLed, never zeroed —
    absence of data is not a value. Plan: one aggregate + two O(cells)
    windows."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 4).cast("int").alias("cohort")
    ).agg(F.countDistinct("user_id").cast("long").alias("n"))
    primary_s = cells.withColumn("primary_sup", F.col("n") < 20)
    we = Window.partitionBy("event_type")
    ranked = primary_s.select(
        "*",
        F.sum(F.when(F.col("primary_sup"), 1).otherwise(0))
        .over(we)
        .cast("int")
        .alias("n_sup_row"),
        F.row_number()
        .over(we.orderBy("primary_sup", "n", "cohort"))
        .alias("rn_small"),
    )
    comp = (F.col("n_sup_row") == 1) & (F.col("rn_small") == 1)
    sup = F.col("primary_sup") | comp
    return ranked.select(
        "event_type",
        "cohort",
        "n",
        "primary_sup",
        comp.alias("complementary_sup"),
        sup.alias("suppressed"),
        F.when(sup, F.lit(None).cast("long")).otherwise(F.col("n")).alias(
            "published_n"
        ),
    )


@_q(
    "q_newsvendor",
    """
    WITH daily AS (
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(count(*) AS BIGINT) AS demand
      FROM events GROUP BY 1, 2
    ),
    dist AS (
      SELECT event_type, demand, CAST(count(*) AS BIGINT) AS c,
             CAST(SUM(count(*)) OVER (PARTITION BY event_type ORDER BY demand)
               AS BIGINT) AS cum,
             CAST(SUM(count(*)) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      FROM daily GROUP BY 1, 2
    ),
    q AS (
      SELECT event_type, MIN(demand) AS q_star
      FROM dist WHERE cum * 4 >= nd * 3
      GROUP BY 1
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_days, q.q_star,
           CAST(SUM(GREATEST(d.demand - q.q_star, 0)) AS BIGINT) AS total_underage,
           CAST(SUM(GREATEST(q.q_star - d.demand, 0)) AS BIGINT) AS total_overage,
           CAST(3 * SUM(GREATEST(d.demand - q.q_star, 0))
                + SUM(GREATEST(q.q_star - d.demand, 0)) AS BIGINT) AS total_cost
    FROM daily d JOIN q ON d.event_type = q.event_type
    GROUP BY 1, q.q_star
    """,
)
def q_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWSVENDOR critical-fractile stocking — operations research's
    canonical single-period inventory decision: with underage cost 3 and
    overage cost 1, stock at the demand distribution's cu/(cu+co) = 75%
    fractile. The quantile is the count-based discrete rule on the daily
    demand distribution (integer cum·4 ≥ nd·3 — the q_percentile_disc
    discipline), and the realized backtest cost 3·Σ(d−Q)⁺ + Σ(Q−d)⁺ is
    pure integer arithmetic — the optimality of Q* at this fractile is
    pytest-asserted against its ±1 neighbors. Plan: one aggregate to the
    daily grid, one cumulative window over distinct demands, a broadcast
    Q* join back."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("demand"))
    dist = daily.groupBy("event_type", "demand").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = Window.partitionBy("event_type").orderBy("demand")
    dist = dist.select(
        "event_type",
        "demand",
        F.sum("c").over(wcum).cast("long").alias("cum"),
        F.sum("c").over(Window.partitionBy("event_type")).cast("long").alias("nd"),
    )
    q = (
        dist.filter(F.col("cum") * 4 >= F.col("nd") * 3)
        .groupBy("event_type")
        .agg(F.min("demand").alias("q_star"))
    )
    j = daily.join(F.broadcast(q), "event_type")
    under = F.greatest(F.col("demand") - F.col("q_star"), F.lit(0))
    over = F.greatest(F.col("q_star") - F.col("demand"), F.lit(0))
    return j.groupBy("event_type", "q_star").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(under).cast("long").alias("total_underage"),
        F.sum(over).cast("long").alias("total_overage"),
        (F.sum(under * 3) + F.sum(over)).cast("long").alias("total_cost"),
    ).select(
        "event_type", "n_days", "q_star", "total_underage", "total_overage", "total_cost"
    )


@_q(
    "q_abc_xyz",
    """
    WITH part_rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
               AS BIGINT) AS sqq
      FROM lineitem GROUP BY 1
    ),
    abc AS (
      SELECT *,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT)
               AS cum,
             CAST(SUM(cents) OVER () AS BIGINT) AS tot
      FROM part_rev
    ),
    cls AS (
      SELECT l_partkey, cents, n, sq, sqq,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B' ELSE 'C' END AS abc,
             -- XYZ on the demand variability: cv^2 = (n*sqq - sq^2)/sq^2,
             -- classed by INTEGER cross-multiplication (X: cv^2<=1/16,
             -- Y: cv^2<=1/4, Z above)
             CASE WHEN (n * sqq - sq * sq) * 16 <= sq * sq THEN 'X'
                  WHEN (n * sqq - sq * sq) * 4 <= sq * sq THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM abc WHERE n >= 2
    )
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM cls GROUP BY 1, 2
    """,
)
def q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ PLANNING MATRIX — the two-axis inventory segmentation
    supply planners actually use: ABC = revenue concentration
    (q_abc_classes' cross-multiplied Pareto cut), XYZ = demand
    VARIABILITY (coefficient of variation of per-line quantities,
    classed at cv ≤ 0.25 / ≤ 0.5 / above — compared as the INTEGER
    cross-multiplication (n·Σq²−(Σq)²)·k ≤ (Σq)², no float cv anywhere).
    AX items get automated replenishment, CZ items get manual review —
    the 9-cell census with revenue mass is the planning dashboard. Plan:
    one lineitem aggregate to parts, two O(parts) windows, a 9-row
    census."""
    li = load_table(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sq"),
        F.sum(F.col("l_quantity").cast("long") * F.col("l_quantity").cast("long"))
        .cast("long")
        .alias("sqq"),
    )
    wcum = Window.orderBy(F.col("cents").desc(), "l_partkey")
    abc = part_rev.select(
        "*",
        F.sum("cents").over(wcum).cast("long").alias("cum"),
        F.sum("cents").over(Window.partitionBy()).cast("long").alias("tot"),
    )
    var_num = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    cls = abc.filter(F.col("n") >= 2).select(
        "l_partkey",
        "cents",
        F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("abc"),
        F.when(var_num * 16 <= F.col("sq") * F.col("sq"), "X")
        .when(var_num * 4 <= F.col("sq") * F.col("sq"), "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return cls.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 111 — inspection paradox, Wilson interval, Palma ratio,
# Mann-Kendall trend test.
# ---------------------------------------------------------------------------


@_q(
    "q_inspection_paradox",
    """
    WITH gaps AS (
      SELECT user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT)
               - LAG(CAST(FLOOR(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(SUM(g) AS BIGINT) AS sg,
             CAST(SUM(g * g) AS BIGINT) AS sgg
      FROM gaps WHERE g IS NOT NULL
    )
    SELECT n_gaps, sg, sgg,
           CAST(sg AS DOUBLE) / n_gaps AS mean_gap_sec,
           CAST(sgg AS DOUBLE) / sg AS observer_mean_gap_sec,
           CAST(sgg AS DOUBLE) / sg / (CAST(sg AS DOUBLE) / n_gaps)
             AS paradox_ratio
    FROM s
    """,
)
def q_inspection_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INSPECTION PARADOX (length-biased sampling) quantified on the
    event stream: the mean interarrival gap is Σg/n, but a probe landing
    at a RANDOM INSTANT falls into a gap with probability proportional
    to its length, so the gap it observes averages Σg²/Σg — always ≥ the
    plain mean (ratio = 1 + CV²). This is why "time since last event"
    monitors over-report staleness and why sampled latencies skew long —
    a bias every ops dashboard should correct for, computed here from
    three exact integer sums with two final divisions. Plan: one
    partitioned lag window + one map-side-combinable reduction."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    gaps = ev.select((sec - F.lag(sec).over(w)).alias("g")).filter(
        F.col("g").isNotNull()
    )
    s = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sgg"),
    )
    mean_gap = F.col("sg").cast("double") / F.col("n_gaps")
    obs_mean = F.col("sgg").cast("double") / F.col("sg")
    return s.select(
        "n_gaps",
        "sg",
        "sgg",
        mean_gap.alias("mean_gap_sec"),
        obs_mean.alias("observer_mean_gap_sec"),
        (obs_mean / mean_gap).alias("paradox_ratio"),
    )


@_q(
    "q_wilson_interval",
    """
    WITH u AS (
      SELECT user_id, event_type,
             CAST(MAX(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS INTEGER) AS conv
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS x
      FROM u GROUP BY 1
    )
    SELECT event_type, n, x,
           CAST(x AS DOUBLE) / n AS p_hat,
           (CAST(x AS DOUBLE) / n + 3.8414588206941254 / (2 * n)
             - 1.959963984540054 * sqrt(CAST(x AS DOUBLE) / n
                 * (1 - CAST(x AS DOUBLE) / n) / n
                 + 3.8414588206941254 / (4.0 * n * n)))
             / (1 + 3.8414588206941254 / n) AS wilson_lo,
           (CAST(x AS DOUBLE) / n + 3.8414588206941254 / (2 * n)
             + 1.959963984540054 * sqrt(CAST(x AS DOUBLE) / n
                 * (1 - CAST(x AS DOUBLE) / n) / n
                 + 3.8414588206941254 / (4.0 * n * n)))
             / (1 + 3.8414588206941254 / n) AS wilson_hi
    FROM g
    """,
)
def q_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE confidence interval for segment conversion rates —
    the CI that behaves at the boundaries where the naive Wald interval
    collapses (p̂±z√(p̂q̂/n) gives zero width at 0% or 100% and escapes
    [0,1]): center (p̂ + z²/2n)/(1 + z²/n) with the score-test radius.
    z = 1.959963984540054 and z² = 3.8414588206941254 are exact double
    LITERALS; the interval is a fixed scalar IEEE expression over two
    integers, so both engines agree bit-for-bit. Plan: user-grain
    aggregate + segment aggregate — two map-side-combinable passes."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id", "event_type").agg(
        F.max(F.when(F.col("value") > 100, 1).otherwise(0)).cast("int").alias("conv")
    )
    g = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conv").cast("long").alias("x"),
    )
    p = F.col("x").cast("double") / F.col("n")
    z = F.lit(1.959963984540054)
    z2 = F.lit(3.8414588206941254)
    radius = z * F.sqrt(p * (1 - p) / F.col("n") + z2 / (4.0 * F.col("n") * F.col("n")))
    denom = 1 + z2 / F.col("n")
    return g.select(
        "event_type",
        "n",
        "x",
        p.alias("p_hat"),
        ((p + z2 / (2 * F.col("n")) - radius) / denom).alias("wilson_lo"),
        ((p + z2 / (2 * F.col("n")) + radius) / denom).alias("wilson_hi"),
    )


@_q(
    "q_palma_ratio",
    """
    WITH u AS (
      SELECT user_id,
             CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    rk AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM u
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN rn * 10 <= n THEN v END) AS BIGINT) AS top10_micro,
           CAST(SUM(CASE WHEN (n - rn) * 10 < n * 4 THEN v END) AS BIGINT)
             AS bottom40_micro,
           CAST(SUM(CASE WHEN rn * 10 <= n THEN v END) AS DOUBLE)
             / SUM(CASE WHEN (n - rn) * 10 < n * 4 THEN v END) AS palma
    FROM rk
    """,
)
def q_palma_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PALMA RATIO — the inequality measure that reads directly (top-10%
    share over bottom-40% share; the Gini compresses exactly the part of
    the distribution that moves) — here over per-user value mass, the
    whale-concentration number a marketplace/abuse team tracks next to
    q_gini and q_hhi. Membership in the decile groups is decided by
    INTEGER rank arithmetic (rn·10 ≤ n for the top, (n−rn)·10 < 4n for
    the bottom — total-order tie-break by user), the masses are integer
    micro sums, the ratio ONE division. Plan: one unit aggregate + one
    global rank (single shuffle) + one reduction."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 1000000).cast("long"))
        .cast("long")
        .alias("v")
    )
    rk = u.select(
        "v",
        "user_id",
        F.row_number().over(Window.orderBy(F.col("v").desc(), "user_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    top = F.when(F.col("rn") * 10 <= F.col("n"), F.col("v"))
    bot = F.when((F.col("n") - F.col("rn")) * 10 < F.col("n") * 4, F.col("v"))
    return rk.agg(
        F.max("n").cast("long").alias("n_users"),
        F.sum(top).cast("long").alias("top10_micro"),
        F.sum(bot).cast("long").alias("bottom40_micro"),
    ).select(
        "n_users",
        "top10_micro",
        "bottom40_micro",
        (
            F.col("top10_micro").cast("double") / F.col("bottom40_micro")
        ).alias("palma"),
    )


@_q(
    "q_mann_kendall",
    """
    WITH daily AS (
      SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
    ),
    s AS (
      SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1
    ),
    nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1)
    SELECT s.event_type, n, s_stat, n_pairs,
           CAST(n * (n - 1) * (2 * n + 5) AS BIGINT) AS var18_num,
           (CAST(s_stat AS DOUBLE)
              - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
             / sqrt(CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE) / 18) AS z,
           ABS((CAST(s_stat AS DOUBLE)
              - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
             / sqrt(CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE) / 18))
             > 1.959963984540054 AS trending
    FROM s JOIN nn ON s.event_type = nn.event_type
    """,
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test per daily series — the nonparametric
    "is this metric actually trending" test (no normality or linearity
    assumption; the standard in environmental and capacity monitoring):
    S = Σ_{i<j} sign(x_j − x_i) over all day pairs, variance
    n(n−1)(2n+5)/18 (no-ties form — emitted as the integer numerator),
    continuity-corrected z against the exact z_{0.975} literal. S and
    the pair census are pure integers from a self-join of the ~30-row
    daily rollup; z is one fixed expression. Plan: one fact aggregate,
    one O(days²)-on-the-rollup join — corpus-size-independent."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    a = daily.select("event_type", F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("db"),
        F.col("x").alias("xb"),
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("db") > F.col("da"))
    ).select(
        "event_type",
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    s = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("long").alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    nn = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = s.join(nn, "event_type")
    var18 = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)).cast("long")
    cc = (
        F.when(F.col("s_stat") > 0, 1).when(F.col("s_stat") < 0, -1).otherwise(0)
    )
    z = (F.col("s_stat").cast("double") - cc) / F.sqrt(var18.cast("double") / 18)
    return j.select(
        "event_type",
        "n",
        "s_stat",
        "n_pairs",
        var18.alias("var18_num"),
        z.alias("z"),
        (F.abs(z) > 1.959963984540054).alias("trending"),
    )


# ---------------------------------------------------------------------------
# Round-5 batch 112 — Brier score with Murphy decomposition, expected
# calibration error, Qini curve, risk-coverage curve.
# ---------------------------------------------------------------------------


@_q(
    "q_brier_score",
    """
    WITH s AS (
      SELECT LEAST(CAST(FLOOR(value * 2000) AS BIGINT), 1000000) AS p_micro,
             CAST(CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END
               AS BIGINT) AS y_micro
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(SUM((p_micro - y_micro) * (p_micro - y_micro)) AS BIGINT)
             AS sq_err_micro2,
           CAST(SUM((p_micro - y_micro) * (p_micro - y_micro)) AS DOUBLE)
             / count(*) / 1000000000000 AS brier,
           CAST(SUM(y_micro) AS BIGINT) AS pos_micro,
           (CAST(SUM(y_micro) AS DOUBLE) / count(*) / 1000000)
             * (1 - CAST(SUM(y_micro) AS DOUBLE) / count(*) / 1000000)
             AS uncertainty
    FROM s
    """,
)
def q_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIER SCORE — mean squared error of a probability forecast
    (score = value/500 as the proxy model, outcome = purchase), plus the
    UNCERTAINTY term of Murphy's decomposition (p̄(1−p̄), the score a
    climatology forecast would get — the floor any model must beat).
    Determinism: probabilities and outcomes are integer MICROS, so the
    squared-error sum is an exact associative integer (≤10¹² per row)
    and the Brier is ONE division; uncertainty is a fixed expression on
    two integers. The proxy probability is clamped with LEAST(·, 1e6) on
    BOTH engines so rows with value > 500 cannot produce p > 1 and break
    the Murphy-decomposition floor semantics (round-5 ADVICE low). Plan:
    a single map-side-combinable aggregate — grading a 100 TB forecast
    log costs one pass."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        F.least(
            F.floor(F.col("value") * 2000).cast("long"), F.lit(1000000)
        ).alias("p_micro"),
        F.when(F.col("event_type") == "purchase", 1000000)
        .otherwise(0)
        .cast("long")
        .alias("y_micro"),
    )
    d = F.col("p_micro") - F.col("y_micro")
    g = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d * d).cast("long").alias("sq_err_micro2"),
        F.sum("y_micro").cast("long").alias("pos_micro"),
    )
    pbar = F.col("pos_micro").cast("double") / F.col("n") / F.lit(1000000)
    return g.select(
        "n",
        "sq_err_micro2",
        (
            F.col("sq_err_micro2").cast("double")
            / F.col("n")
            / F.lit(1000000000000)
        ).alias("brier"),
        "pos_micro",
        (pbar * (1 - pbar)).alias("uncertainty"),
    )


@_q(
    "q_expected_calibration_error",
    """
    WITH s AS (
      SELECT CAST(FLOOR(value * 2000) AS BIGINT) AS p_micro,
             CAST(event_type = 'purchase' AS INTEGER) AS y,
             event_id
      FROM events WHERE value IS NOT NULL
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY p_micro, event_id) AS rn,
             COUNT(*) OVER () AS n
      FROM s
    ),
    bins AS (
      SELECT CAST((rn - 1) * 10 // n + 1 AS INTEGER) AS bin,
             CAST(count(*) AS BIGINT) AS n_bin,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro,
             CAST(MAX(n) AS BIGINT) AS n_total
      FROM rk GROUP BY 1
    )
    SELECT bin, n_bin, pos, sum_p_micro,
           ABS(CAST(pos AS DOUBLE) / n_bin
               - CAST(sum_p_micro AS DOUBLE) / n_bin / 1000000) AS bin_gap,
           ABS(CAST(pos AS DOUBLE) / n_bin
               - CAST(sum_p_micro AS DOUBLE) / n_bin / 1000000)
             * n_bin / n_total AS ece_contrib
    FROM bins
    """,
)
def q_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED CALIBRATION ERROR (per-bin contributions) — the modern
    "is the model's confidence honest" metric: in each of 10 rank-based
    equal-count bins, |observed positive rate − mean predicted
    probability|, weighted by bin mass; ECE is the sum of the emitted
    ece_contrib column (the per-bin table is the contract surface, so no
    cross-bin float summation order enters the hash). Probabilities are
    integer micros, bins use the engine-stable rank rule, each gap is a
    fixed expression with divisions last. Extends q_calibration_bins
    from the reliability TABLE to the reliability METRIC. Plan: one
    global rank + one aggregate — a percentile-pass shape."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s = ev.select(
        F.floor(F.col("value") * 2000).cast("long").alias("p_micro"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        "event_id",
    )
    rk = s.select(
        "*",
        F.row_number().over(Window.orderBy("p_micro", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    bins = rk.groupBy(
        F.expr("((rn - 1) * 10) div n + 1").cast("int").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_bin"),
        F.sum("y").cast("long").alias("pos"),
        F.sum("p_micro").cast("long").alias("sum_p_micro"),
        F.max("n").cast("long").alias("n_total"),
    )
    gap = F.abs(
        F.col("pos").cast("double") / F.col("n_bin")
        - F.col("sum_p_micro").cast("double") / F.col("n_bin") / F.lit(1000000)
    )
    return bins.select(
        "bin",
        "n_bin",
        "pos",
        "sum_p_micro",
        gap.alias("bin_gap"),
        (gap * F.col("n_bin") / F.col("n_total")).alias("ece_contrib"),
    )


@_q(
    "q_qini_curve",
    """
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS grp,
             CAST(count(*) FILTER (WHERE day(ts) <= 15) AS BIGINT) AS score,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND day(ts) > 15
                           THEN 1 ELSE 0 END) AS INTEGER) AS conv
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rn,
             COUNT(*) OVER () AS n
      FROM u
    ),
    dec AS (
      SELECT CAST((rn - 1) * 10 // n + 1 AS INTEGER) AS decile,
             CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n_t,
             CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n_c,
             CAST(SUM(conv) FILTER (WHERE grp = 1) AS BIGINT) AS conv_t,
             CAST(SUM(conv) FILTER (WHERE grp = 0) AS BIGINT) AS conv_c
      FROM rk GROUP BY 1
    ),
    cum AS (
      SELECT decile,
             CAST(SUM(n_t) OVER w AS BIGINT) AS cum_nt,
             CAST(SUM(n_c) OVER w AS BIGINT) AS cum_nc,
             CAST(SUM(conv_t) OVER w AS BIGINT) AS cum_ct,
             CAST(SUM(conv_c) OVER w AS BIGINT) AS cum_cc
      FROM dec
      WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT decile, cum_nt, cum_nc, cum_ct, cum_cc,
           CAST(cum_ct * cum_nc - cum_cc * cum_nt AS BIGINT) AS qini_num,
           CAST(GREATEST(cum_nc, 1) AS BIGINT) AS qini_den_nc,
           CAST(cum_ct AS DOUBLE)
             - CAST(cum_cc AS DOUBLE) * cum_nt / GREATEST(cum_nc, 1)
             AS qini_y
    FROM cum
    """,
)
def q_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QINI CURVE points — uplift modeling's cumulative-gain chart: rank
    the population by the targeting score, and at each decile plot the
    incremental conversions cum_ct − cum_cc·(n_t/n_c) (treated
    conversions beyond what the control rate predicts for the treated
    mass). The curve's integer core rides along (qini_num =
    cum_ct·cum_nc − cum_cc·cum_nt — the sign and ordering carrier),
    the y value is one fixed expression. Extends q_uplift_deciles from
    per-bucket rates to the cumulative targeting-policy view. Plan: one
    unit aggregate, one global rank, one O(10) cumulative window."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        F.count(F.when(F.dayofmonth("ts") <= 15, 1)).cast("long").alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.dayofmonth("ts") > 15), 1
            ).otherwise(0)
        )
        .cast("int")
        .alias("conv"),
    )
    rk = u.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "user_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    t = F.col("grp") == 1
    dec = rk.groupBy(
        F.expr("((rn - 1) * 10) div n + 1").cast("int").alias("decile")
    ).agg(
        F.count(F.when(t, 1)).cast("long").alias("n_t"),
        F.count(F.when(~t, 1)).cast("long").alias("n_c"),
        F.sum(F.when(t, F.col("conv"))).cast("long").alias("conv_t"),
        F.sum(F.when(~t, F.col("conv"))).cast("long").alias("conv_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = dec.select(
        "decile",
        F.sum("n_t").over(w).cast("long").alias("cum_nt"),
        F.sum("n_c").over(w).cast("long").alias("cum_nc"),
        F.sum("conv_t").over(w).cast("long").alias("cum_ct"),
        F.sum("conv_c").over(w).cast("long").alias("cum_cc"),
    )
    den = F.greatest(F.col("cum_nc"), F.lit(1))
    return cum.select(
        "decile",
        "cum_nt",
        "cum_nc",
        "cum_ct",
        "cum_cc",
        (
            F.col("cum_ct") * F.col("cum_nc") - F.col("cum_cc") * F.col("cum_nt")
        )
        .cast("long")
        .alias("qini_num"),
        den.cast("long").alias("qini_den_nc"),
        (
            F.col("cum_ct").cast("double")
            - F.col("cum_cc").cast("double") * F.col("cum_nt") / den
        ).alias("qini_y"),
    )


@_q(
    "q_risk_coverage",
    """
    WITH s AS (
      SELECT n_chars AS conf, CAST(lang <> 'en' AS INTEGER) AS err, doc_id
      FROM documents
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY conf DESC, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM s
    ),
    dec AS (
      SELECT CAST((rn - 1) * 10 // n + 1 AS INTEGER) AS decile,
             CAST(count(*) AS BIGINT) AS n_bin,
             CAST(SUM(err) AS BIGINT) AS errs,
             CAST(MAX(n) AS BIGINT) AS n_total
      FROM rk GROUP BY 1
    )
    SELECT decile,
           CAST(SUM(n_bin) OVER w AS BIGINT) AS covered,
           CAST(SUM(errs) OVER w AS BIGINT) AS cum_errs,
           CAST(SUM(n_bin) OVER w AS DOUBLE) / MAX(n_total) OVER () AS coverage,
           CAST(SUM(errs) OVER w AS DOUBLE) / SUM(n_bin) OVER w AS risk
    FROM dec
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
)
def q_risk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RISK-COVERAGE CURVE — selective prediction's operating chart:
    rank items by model confidence (proxy: document length predicting
    English), and at each coverage decile report the error rate among
    the items the model would answer on (abstaining on the rest). The
    curve answers "how much coverage can we keep at ≤X% risk" — the
    abstention-policy question every selective classifier and every
    LLM-routing cascade asks. Counts are integers through the cumulative
    windows; coverage and risk are one division each. Plan: one global
    rank + one aggregate + an O(10) cumulative window."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        F.col("n_chars").alias("conf"),
        (F.col("lang") != "en").cast("int").alias("err"),
        "doc_id",
    )
    rk = s.select(
        "*",
        F.row_number().over(Window.orderBy(F.col("conf").desc(), "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    dec = rk.groupBy(
        F.expr("((rn - 1) * 10) div n + 1").cast("int").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_bin"),
        F.sum("err").cast("long").alias("errs"),
        F.max("n").cast("long").alias("n_total"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return dec.select(
        "decile",
        F.sum("n_bin").over(w).cast("long").alias("covered"),
        F.sum("errs").over(w).cast("long").alias("cum_errs"),
        (
            F.sum("n_bin").over(w).cast("double") / F.max("n_total").over(wall)
        ).alias("coverage"),
        (F.sum("errs").over(w).cast("double") / F.sum("n_bin").over(w)).alias(
            "risk"
        ),
    )


# ---------------------------------------------------------------------------
# Registry ordering. The correctness driver checks keys in registration
# order and caps how many it checks per round, so ordering is evidence
# policy: (1) an explicit priority block — keys that most need fresh driver
# evidence (previously erred, newly oracled, or never reached behind the
# round-1 horizon: the whole mart layer, the extension joins/windows, the
# flagship time-dimension path); (2) every remaining oracle-backed key;
# (3) rows-only keys (approximate/streaming-sink demos with no SQL twin)
# at the tail, where a capped check loses the least information.
# ---------------------------------------------------------------------------

# The round whose CORRECTNESS_r*.json files were the input to the current
# rotation below. tests/test_registry_order.py asserts the rotation never
# lags the newest committed driver artifact by more than one round, so the
# re-rotation step cannot be silently skipped (round-5 verdict item 7).
_ROTATION_INPUT_ROUNDS = 5

_CHECK_PRIORITY = [
    # --- round-6 rotation (regenerated each round from the union of
    # committed CORRECTNESS_r*.json — see tests/test_registry_order.py,
    # which enforces this policy so it cannot silently regress).
    # Position 1: q_time_weighted_avg — the r4+r5 driver hash-FAIL, twin
    # rewritten this round to HUGEINT accumulation + an integer-only
    # projected surface (round-5 verdict item 1); first so CORRECTNESS_r06
    # re-checks the fix.
    "q_time_weighted_avg",
    # --- batches 108-112 (landed after the r5 driver check ran; never
    # driver-sampled) ---
    "q_benjamini_hochberg", "q_page_hinkley", "q_simpson_detect",
    "q_storage_tiering", "q_capture_recapture", "q_raking",
    "q_vocab_richness", "q_hash_collision_audit", "q_haberman_residuals",
    "q_complementary_suppression", "q_newsvendor", "q_abc_xyz",
    "q_inspection_paradox", "q_wilson_interval", "q_palma_ratio",
    "q_mann_kendall", "q_brier_score", "q_expected_calibration_error",
    "q_qini_curve", "q_risk_coverage",
    # --- remaining never-driver-checked keys, OLDEST FIRST (registration
    # order): the r2-r3 mid-tier — TPC-H q2-q22, stats/TSDB batches,
    # warehouse tier — drains before anything newer. New-key production is
    # FROZEN this round (round-5 verdict item 2) so the backlog converges.
    "q_text_pii_redact", "q_stratified_sample", "q_token_stats_by_source",
    "q_dedup_groups", "q_join_full_outer", "q_window_distribution",
    "q_agg_grouping_sets", "q_scd2_dim", "q_cdc_apply",
    "q_profile_stats", "q_corr_exact", "q_array_ops",
    "q_doc_chunk", "q_text_ngram_freq", "q_fuzzy_match",
    "q_embed_centroid", "q_text_lm_quality", "q_ewma",
    "q_hash_split", "q_scan_json_roundtrip", "q_pagerank_nations",
    "q_sql_q7", "q_sql_q10", "q_udf_arrow_batch",
    "q_robust_scaler", "q_window_first_last", "q_sql_q14",
    "q_sql_q4_exists", "q_graph_triangles", "q_zorder_cluster",
    "q_ab_welch_ttest", "q_golden_record", "q_sql_q6",
    "q_sql_q8", "q_sql_q13", "q_sql_q15",
    "q_sql_q17", "q_sql_q19", "q_sql_q22",
    "q_sql_q2", "q_sql_q9", "q_sql_q11",
    "q_sql_q12", "q_sql_q16", "q_sql_q20",
    "q_sql_q21", "q_locf_fill", "q_counter_increase",
    "q_autocorr_lag1", "q_table_checksum", "q_table_diff",
    "q_feature_hash", "q_embed_quantize_int8", "q_domain_mix_sample",
    "q_numeric_histogram", "q_bitmap_distinct", "q_chi_square",
    "q_holt_linear", "q_bollinger_bands", "q_eval_metrics",
    "q_ndcg_bm25", "q_cusum_detect", "q_mutual_information",
    "q_agg_window_hopping", "q_ks_test", "q_dq_uniqueness",
    "q_partition_migration", "q_rolling_mau", "q_attribution_last_touch",
    "q_streak_longest", "q_weighted_median", "q_spearman_rho",
    "q_mann_whitney_u", "q_tree_reachability", "q_boilerplate_strip",
    "q_doc_keywords", "q_quantile_normalize", "q_vector_normalize",
    "q_split_leakage", "q_file_stats_pruning", "q_snapshot_time_travel",
    "q_compaction_plan", "q_join_theta_bnl", "q_sax_symbolize",
    "q_time_to_convert", "q_inventory_fifo", "q_variant_json",
    "q_lateral_topk", "q_scalar_subquery_corr", "q_try_arith",
    "q_hint_suite", "q_observe_metrics", "q_stream_hopping",
    "q_cms_heavy_hitters", "q_bloom_membership", "q_tz_convert",
    "q_iso_week_rollup", "q_emd_tcloseness", "q_retention_sweep",
    "q_alloc_largest_remainder", "q_benford_digits", "q_rfm_segments",
    "q_assoc_confidence", "q_survival_table", "q_dup_ngram_coverage",
    "q_partition_bounds", "q_kmv_distinct", "q_union_by_name",
    "q_l_diversity", "q_scan_text_roundtrip", "q_ltv_cohort_curve",
    "q_string_agg_ordered", "q_log2_histogram", "q_seasonal_residual",
    "q_scan_csv_permissive", "q_stream_complete_agg", "q_struct_ops",
    "q_lambda_array_suite", "q_auc_roc", "q_vacuum_plan",
    "q_scan_python_datasource", "q_sql_pipe", "q_group_by_all",
    "q_merge_all_clauses", "q_fd_audit", "q_null_ordering",
    "q_array_set_ops", "q_id_gap_ranges", "q_price_volume_bridge",
    "q_abc_classes", "q_segment_migration", "q_interarrival_histogram",
    "q_dup_span_detect", "q_corpus_report", "q_cluster_size_stats",
    "q_dedup_normalized", "q_session_paths", "q_peak_detect",
    "q_vwap", "q_history_compress", "q_scan_binaryfile",
    "q_join_asof_nearest", "q_gains_table", "q_keyset_pagination",
    "q_set_intersect_all", "q_attribution_linear", "q_seasonality_index",
    "q_feature_assembly", "q_pattern_match_triple", "q_inverted_index_stats",
    "q_daily_percentile_bands", "q_langid_eval", "q_agg_bucketed",
    "q_agg_salted_skew", "q_join_dpp", "q_stream_checkpoint_resume",
    "q_lambda_map_suite", "q_udf_sql_registered", "q_incremental_watermark",
    "q_dead_letter_route", "q_per_user_cap", "q_target_encode_loo",
    "q_profile_drift", "q_session_bounce", "q_preagg_before_join",
    "q_fiscal_445", "q_dynamic_partition_overwrite", "q_rate_smoothed",
    "q_nested_schema_pruning", "q_entity_sample", "q_collation_group",
    "q_interval_daytime", "q_str_to_map", "q_negative_sampling",
    "q_monotonic_ids", "q_dedup_policy_matrix", "q_stream_late_drop",
    "q_sql_parameterized", "q_sql_identifier", "q_rolling_slope",
    "q_role_playing_dim", "q_unknown_member", "q_accumulating_snapshot",
    "q_embed_drift", "q_cross_source_dups", "q_tokenizer_fertility",
    "q_nest_denormalize", "q_empty_relation", "q_union_distinct",
    "q_inline_dim_join", "q_try_cast_matrix", "q_vocab_drift",
    "q_debounce", "q_hierarchical_share", "q_model_score_broadcast",
    "q_stream_dedup_watermarked", "q_stream_sink_partitioned", "q_mtd_ytd",
    "q_business_days", "q_aging_report", "q_grouped_map_pandas",
    "q_minmax_scale", "q_group_vs_rest", "q_freshness_audit",
    "q_cte_reuse", "q_distinct_complex", "q_item_similarity",
    "q_graph_2hop", "q_composition_shares", "q_max_concurrency",
    "q_backlog_curve", "q_sla_compliance", "q_centered_ma",
    "q_multi_offset_lags", "q_temporal_cooccurrence", "q_conversion_by_path",
    "q_decayed_frequency", "q_decile_spread", "q_onehot_encode",
    "q_column_checksums", "q_select_except", "q_mode_all_ties",
    "q_mcnemar_test", "q_cohen_kappa", "q_cost_threshold",
    "q_matched_pairs_att", "q_interim_analysis", "q_beta_posterior",
    "q_eb_shrinkage", "q_pairwise_bonferroni",
    # --- never-checked rows-only keys (no SQL twin; a driver sample gives
    # only the weaker rows-check, so they drain after the oracled tier) ---
    "q_quantiles_approx",
    # --- driver-green in r1-r5 (230 keys; regression coverage
    # continues via pytest + tools/oracle_check.py full replays) ---
    "q_scan_table", "q_scan_union_files", "q_scan_project_ids",
    "q_project_select", "q_rename_cols", "q_filter_notnull",
    "q_filter_predicate", "q_join_left_equi", "q_join_anti_incremental",
    "q_dedup_keyed", "q_distinct_values", "q_union_all",
    "q_time_dimension", "q_ts_parse", "q_concat_key",
    "q_hash_key", "q_string_join_array", "q_coalesce",
    "q_cast_types", "q_conditional_expr", "q_agg_sum_by_dim",
    "q_agg_rollup", "q_agg_count_distinct", "q_agg_approx_distinct",
    "q_window_rank", "q_sort_limit", "q_agg_window_day",
    "q_sink_overwrite", "q_sink_append", "q_stream_ingest",
    "q_stream_dedup", "q_stream_upsert", "q_stream_stateful",
    "q_stream_window", "q_text_token_count", "q_text_quality",
    "q_text_lang_id", "q_doc_fingerprint", "q_dedup_exact_docs",
    "q_ngram_jaccard", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_ann_bruteforce", "q_embed_neardup", "q_ann_ivf",
    "q_ann_lsh", "q_multimodal_meta", "q_multimodal_features",
    "q_multimodal_frame_sample", "q_mart_analytics", "q_ops_load_incremental",
    "q_set_intersect", "q_set_except", "q_pivot",
    "q_agg_cube", "q_sessionize", "q_join_asof",
    "q_sql_entry", "q_join_semi", "q_join_range",
    "q_window_running", "q_window_lag", "q_null_fill",
    "q_quantiles", "q_json_extract", "q_explode_collect",
    "q_sql_q5", "q_udf_pandas_scalar", "q_tfidf_top_terms",
    "q_winsorized_agg", "q_outlier_zscore", "q_interval_months",
    "q_bloom_prune_semi", "q_join_skew_salted", "q_clean_pipeline",
    "q_stream_join", "q_unpivot", "q_funnel",
    "q_retention_cohort", "q_window_range_time", "q_gap_fill",
    "q_compact_files", "q_scan_csv_roundtrip", "q_balanced_sample",
    "q_length_histogram", "q_set_except_all", "q_join_null_safe",
    "q_schema_evolution", "q_pack_sequences", "q_vocab_coverage",
    "q_source_entropy", "q_merge_upsert", "q_incr_agg_maintenance",
    "q_join_asof_grouped", "q_udaf_grouped_median", "q_udtf_split",
    "q_search_bm25", "q_knn_classify", "q_dedup_containment",
    "q_stream_session", "q_geo_radius_join", "q_join_bucketed",
    "q_anti_null_semantics", "q_explode_outer", "q_sink_partitioned",
    "q_agg_argmax", "q_agg_conditional", "q_dq_checks",
    "q_text_ttr", "q_string_suite", "q_date_suite",
    "q_grid_zero_fill", "q_multimodal_resize", "q_event_transitions",
    "q_adoption_curve", "q_wow_change", "q_agg_bitwise",
    "q_map_ops", "q_stream_stream_join", "q_pct_of_total",
    "q_dq_referential", "q_ohlc_downsample", "q_derivative",
    "q_scan_orc_roundtrip", "q_interp_linear", "q_scd2_pit_join",
    "q_decontaminate", "q_agg_mode", "q_linreg_trend",
    "q_percentile_disc", "q_window_rank_semantics", "q_skyline",
    "q_running_distinct", "q_iqr_outliers", "q_ntile_quartiles",
    "q_heavy_hitters", "q_gini", "q_text_repetition",
    "q_hhi", "q_interval_overlap", "q_rolling_median",
    "q_mad_outliers", "q_rollup_cascade", "q_sql_q1",
    "q_sql_q3", "q_sql_q18", "q_market_basket",
    "q_moments_skew_kurt", "q_k_anonymize", "q_regex_suite",
    "q_stream_neardup", "q_shard_manifest", "q_bipartite_degree",
    "q_partition_checksums", "q_currency_convert", "q_tax_brackets",
    "q_event_rate_alert", "q_skew_report", "q_session_census",
    "q_audience_overlap", "q_embed_dim_stats", "q_dedup_threshold_sweep",
    "q_join_existence_matrix", "q_pivot_multi_agg", "q_stream_scd2",
    "q_state_store_read", "q_stream_python_source", "q_stream_pit_enrich",
    "q_stream_backfill_paced", "q_prefix_cluster", "q_scan_xml_roundtrip",
    "q_hybrid_search_rrf", "q_source_tv_distance", "q_blocking_eval",
    "q_stream_quality_gate", "q_m4_downsample", "q_priority_sample",
    "q_calibration_bins", "q_epoch_plan", "q_stream_stream_left_join",
    "q_bitemporal_join", "q_kfold_assign", "q_semi_additive_balance",
    "q_lttb_downsample", "q_ngram_lm_pairs", "q_poisson_bootstrap",
    "q_rendezvous_hash", "q_diff_in_diff", "q_ratio_delta_method",
    "q_neyman_allocation", "q_term_pmi", "q_cuped",
    "q_mde_power", "q_quantile_treatment_effect", "q_post_stratified_ate",
    "q_shapley_attribution", "q_kmv_set_ops", "q_uplift_deciles",
    "q_two_proportion_ztest", "q_stream_window_append", "q_scd3_dim",
    "q_knn_graph_blocked", "q_knn_recall_eval", "q_incr_join_maintenance",
    "q_delete_vectors_apply", "q_bootstrap_diff_ci", "q_watermark_sweep",
    "q_cross_correlation", "q_fano_dispersion", "q_forecast_backtest",
    "q_ngram_novelty", "q_offline_policy_eval", "q_occ_conflicts",
    "q_arc_elasticity", "q_sla_burn_rate", "q_relational_division",
    "q_allen_relations", "q_cents_digit_bias", "q_rank_biased_overlap",
    "q_mart_dim_departemen", "q_mart_dim_penyumbang", "q_mart_dim_place",
    "q_mart_dim_proyek", "q_mart_dim_user", "q_mart_dim_vendor",
    "q_mart_dim_waktu", "q_mart_fact_maps", "q_mart_fact_pemasukan",
    "q_mart_fact_pengeluaran", "q_mart_fact_twitter",
]


def _reorder_registry() -> None:
    ordered = [k for k in _CHECK_PRIORITY if k in REGISTRY]
    ordered += [k for k in REGISTRY if k in ORACLE and k not in set(ordered)]
    ordered += [k for k in REGISTRY if k not in ORACLE and k not in set(ordered)]
    assert len(ordered) == len(REGISTRY)
    snapshot = dict(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update({k: snapshot[k] for k in ordered})


_reorder_registry()
