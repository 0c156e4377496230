"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` — one named entry per implemented operator from
SURVEY.md §2 (+ extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Design notes for oracle comparability:
- every computed column is aliased identically on both sides;
- floating aggregates are rounded (sums 2dp, ratios/avgs 4dp) so
  double summation-order differences can't flip the value hash;
- timestamps cross the boundary as epoch-second BIGINTs;
- window orderings always carry a unique tiebreak column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eggv_spark.functions.extract import regexp_extract_null, strip_prefix_cast_long
from eggv_spark.operators import relational as R
from eggv_spark.operators.events import sessionize, tumbling_window_counts
from eggv_spark.sources.readers import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative chain off genomic data: scan -> pushed filter ->
    broadcast join -> split/explode -> group count (the same operator
    skeleton as the reference's GVF pipeline: SRC-04, FLT-01, JOIN-01,
    STR-05, EXP-01, dedup-as-agg)."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    filtered = lineitem.filter(F.col("l_quantity") > 25).select("l_partkey")
    part_dim = part.select("p_partkey", "p_name")
    joined = R.left_join(
        filtered, part_dim,
        filtered["l_partkey"] == part_dim["p_partkey"], broadcast_right=True,
    )
    exploded = R.explode_split(joined, "p_name", " ", "token")
    return exploded.groupBy("token").agg(F.count("*").alias("n"))


_FLAGSHIP_SQL = """
SELECT token, count(*) AS n
FROM (
    SELECT unnest(string_split(p.p_name, ' ')) AS token
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity > 25
)
GROUP BY token
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# §2.1 sources
# ---------------------------------------------------------------------------

def _src_scan(spark, sf_dir):
    return R.project(_t(spark, sf_dir, "region"), ["r_regionkey", "r_name"])


# ---------------------------------------------------------------------------
# §2.2 projection / scalar transforms
# ---------------------------------------------------------------------------

def _prj_projection(spark, sf_dir):
    return R.project(
        _t(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_linenumber", "l_quantity"],
    )


def _prj_rename_cast(spark, sf_dir):
    df = R.rename(
        _t(spark, sf_dir, "orders"),
        {"o_orderkey": "order_id", "o_orderpriority": "priority"},
    )
    df = R.cast_columns(df, {"o_custkey": "string"})
    return R.rename(
        R.project(df, ["order_id", "o_custkey", "priority"]),
        {"o_custkey": "custkey_str"},
    )


def _str_prefix_concat(spark, sf_dir):
    df = R.prefix_concat(_t(spark, sf_dir, "nation"), "n_name", "n_", "prefixed")
    return R.project(df, ["n_nationkey", "prefixed"])


def _str_regexp_extract(spark, sf_dir):
    df = _t(spark, sf_dir, "events")
    return df.select(
        "event_id",
        regexp_extract_null("props", r'"k": (\d+)').cast("long").alias("k_val"),
        regexp_extract_null("props", r'"missing": (\d+)').alias("missing_val"),
    )


def _str_strip_cast(spark, sf_dir):
    df = _t(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        strip_prefix_cast_long("c_name", "Customer#").alias("custkey_from_name"),
    )


def _str_concat_ws(spark, sf_dir):
    df = R.concat_with_sep(
        _t(spark, sf_dir, "part"), ["p_brand", "p_type"], ",", "brand_type"
    )
    return R.project(df, ["p_partkey", "brand_type"])


def _str_split_get(spark, sf_dir):
    df = _t(spark, sf_dir, "part")
    df = R.split_get(df, "p_name", " ", 0, "adjective")
    df = R.split_get(df, "p_name", " ", 1, "noun")
    df = R.split_get(df, "p_name", " ", 5, "sixth_token")  # out of bounds -> null
    return R.project(df, ["p_partkey", "adjective", "noun", "sixth_token"])


def _exp_explode(spark, sf_dir):
    df = R.explode_split(_t(spark, sf_dir, "part"), "p_name", " ", "token")
    return R.project(df, ["p_partkey", "token"])


def _nul_fill(spark, sf_dir):
    df = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif("o_orderpriority", F.lit("5-LOW")).alias("priority")
    )
    return R.fill_null(df, {"priority": "none"})


def _nul_drop(spark, sf_dir):
    df = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif("o_orderpriority", F.lit("5-LOW")).alias("priority")
    )
    return R.drop_null_keys(df, ["priority"])


# ---------------------------------------------------------------------------
# §2.3 filters
# ---------------------------------------------------------------------------

def _flt_eq(spark, sf_dir):
    return R.project(
        R.filter_eq(_t(spark, sf_dir, "orders"), "o_orderstatus", "O"),
        ["o_orderkey", "o_custkey"],
    )


def _flt_isin(spark, sf_dir):
    return R.project(
        R.filter_isin(
            _t(spark, sf_dir, "orders"), "o_orderpriority",
            ["1-URGENT", "2-HIGH"],
        ),
        ["o_orderkey", "o_orderpriority"],
    )


def _flt_neg_notnull(spark, sf_dir):
    df = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.nullif("o_orderpriority", F.lit("5-LOW")).alias("priority"),
    )
    return R.filter_not_in_and_notnull(df, "o_orderstatus", ["F"], "priority")


# ---------------------------------------------------------------------------
# §2.4 join
# ---------------------------------------------------------------------------

def _join_left_broadcast(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    joined = R.left_join(
        orders, customer, orders["o_custkey"] == customer["c_custkey"],
        broadcast_right=True,
    )
    return joined.select("o_orderkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# §2.6 dedup
# ---------------------------------------------------------------------------

def _ddp_dedup_all(spark, sf_dir):
    return R.dedupe(
        R.project(_t(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"])
    )


def _ddp_dedup_keys(spark, sf_dir):
    return R.dedupe(R.project(_t(spark, sf_dir, "orders"), ["o_custkey"]))


def _ddp_first_by_key(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    first = R.dedupe_first_by_key(
        df, ["o_custkey"], [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    )
    return first.select(
        "o_custkey",
        "o_orderkey",
        # NTZ -> LTZ (session tz is UTC) -> epoch seconds.
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )


def _ddp_dedup_composite(spark, sf_dir):
    return R.dedupe(
        R.project(_t(spark, sf_dir, "events"), ["user_id", "event_type"])
    )


# ---------------------------------------------------------------------------
# aggregation / windows (engine extensions beyond the reference, §2.8)
# ---------------------------------------------------------------------------

def _agg_pricing_summary(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("n_rows"),
        )
    )


def _win_topk_per_group(spark, sf_dir):
    df = _t(spark, sf_dir, "orders")
    top = R.top_k_per_group(
        df, ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 3,
    )
    return top.select("o_custkey", "o_orderkey", "rank")


def _evt_tumbling_window(spark, sf_dir):
    counts = tumbling_window_counts(_t(spark, sf_dir, "events"), "ts", "1 hour")
    return counts.select(
        F.col("window_start").cast("long").alias("window_epoch"),
        "n_events",
        "sum_value",
    )


def _evt_sessionize(spark, sf_dir):
    sessions = sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").cast("long").alias("start_epoch"),
            F.max("ts").cast("long").alias("end_epoch"),
        )
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_token_pipeline": _flagship,
        "src_scan": _src_scan,
        "prj_projection": _prj_projection,
        "prj_rename_cast": _prj_rename_cast,
        "str_prefix_concat": _str_prefix_concat,
        "str_regexp_extract": _str_regexp_extract,
        "str_strip_cast": _str_strip_cast,
        "str_concat_ws": _str_concat_ws,
        "str_split_get": _str_split_get,
        "exp_explode": _exp_explode,
        "nul_fill": _nul_fill,
        "nul_drop": _nul_drop,
        "flt_eq": _flt_eq,
        "flt_isin": _flt_isin,
        "flt_neg_notnull": _flt_neg_notnull,
        "join_left_broadcast": _join_left_broadcast,
        "ddp_dedup_all": _ddp_dedup_all,
        "ddp_dedup_keys": _ddp_dedup_keys,
        "ddp_first_by_key": _ddp_first_by_key,
        "ddp_dedup_composite": _ddp_dedup_composite,
        "agg_pricing_summary": _agg_pricing_summary,
        "win_topk_per_group": _win_topk_per_group,
        "evt_tumbling_window": _evt_tumbling_window,
        "evt_sessionize": _evt_sessionize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_token_pipeline": _FLAGSHIP_SQL,
        "src_scan": "SELECT r_regionkey, r_name FROM region",
        "prj_projection": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
        ),
        "prj_rename_cast": (
            "SELECT o_orderkey AS order_id, CAST(o_custkey AS VARCHAR) AS custkey_str,"
            " o_orderpriority AS priority FROM orders"
        ),
        "str_prefix_concat": (
            "SELECT n_nationkey, 'n_' || n_name AS prefixed FROM nation"
        ),
        "str_regexp_extract": (
            "SELECT event_id,"
            " CAST(nullif(regexp_extract(props, '\"k\": (\\d+)', 1), '') AS BIGINT) AS k_val,"
            " nullif(regexp_extract(props, '\"missing\": (\\d+)', 1), '') AS missing_val"
            " FROM events"
        ),
        "str_strip_cast": (
            "SELECT c_custkey,"
            " CAST(regexp_replace(c_name, '^Customer#', '') AS BIGINT) AS custkey_from_name"
            " FROM customer"
        ),
        "str_concat_ws": (
            "SELECT p_partkey, p_brand || ',' || p_type AS brand_type FROM part"
        ),
        "str_split_get": (
            "SELECT p_partkey,"
            " list_extract(string_split(p_name, ' '), 1) AS adjective,"
            " list_extract(string_split(p_name, ' '), 2) AS noun,"
            " list_extract(string_split(p_name, ' '), 6) AS sixth_token"
            " FROM part"
        ),
        "exp_explode": (
            "SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token FROM part"
        ),
        "nul_fill": (
            "SELECT o_orderkey,"
            " coalesce(nullif(o_orderpriority, '5-LOW'), 'none') AS priority"
            " FROM orders"
        ),
        "nul_drop": (
            "SELECT o_orderkey, o_orderpriority AS priority FROM orders"
            " WHERE nullif(o_orderpriority, '5-LOW') IS NOT NULL"
        ),
        "flt_eq": (
            "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'O'"
        ),
        "flt_isin": (
            "SELECT o_orderkey, o_orderpriority FROM orders"
            " WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
        ),
        "flt_neg_notnull": (
            "SELECT o_orderkey, o_orderstatus,"
            " nullif(o_orderpriority, '5-LOW') AS priority FROM orders"
            " WHERE o_orderstatus NOT IN ('F')"
            " AND nullif(o_orderpriority, '5-LOW') IS NOT NULL"
        ),
        "join_left_broadcast": (
            "SELECT o_orderkey, c_name, c_mktsegment FROM orders"
            " LEFT JOIN customer ON o_custkey = c_custkey"
        ),
        "ddp_dedup_all": (
            "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
        ),
        "ddp_dedup_keys": "SELECT DISTINCT o_custkey FROM orders",
        "ddp_first_by_key": (
            "SELECT o_custkey, o_orderkey,"
            " CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch FROM ("
            "  SELECT *, row_number() OVER ("
            "    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC"
            "  ) AS rn FROM orders"
            ") WHERE rn = 1"
        ),
        "ddp_dedup_composite": "SELECT DISTINCT user_id, event_type FROM events",
        "agg_pricing_summary": (
            "SELECT l_returnflag, l_linestatus,"
            " round(sum(l_quantity), 2) AS sum_qty,"
            " round(sum(l_extendedprice), 2) AS sum_base,"
            " round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,"
            " round(avg(l_quantity), 4) AS avg_qty,"
            " count(*) AS n_rows"
            " FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'"
            " GROUP BY l_returnflag, l_linestatus"
        ),
        "win_topk_per_group": (
            "SELECT o_custkey, o_orderkey, rank FROM ("
            "  SELECT o_custkey, o_orderkey, row_number() OVER ("
            "    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC"
            "  ) AS rank FROM orders"
            ") WHERE rank <= 3"
        ),
        "evt_tumbling_window": (
            "SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_epoch,"
            " count(*) AS n_events, round(sum(value), 4) AS sum_value"
            " FROM events GROUP BY 1"
        ),
        "evt_sessionize": (
            "WITH lagged AS ("
            "  SELECT user_id, ts,"
            "   CASE WHEN epoch(ts) - lag(epoch(ts)) OVER ("
            "     PARTITION BY user_id ORDER BY ts, event_id"
            "   ) > 1800 THEN 1 ELSE 0 END AS boundary"
            "  FROM events"
            "), sess AS ("
            "  SELECT user_id, ts,"
            "   CAST(sum(boundary) OVER ("
            "     PARTITION BY user_id ORDER BY ts"
            "   ) AS BIGINT) AS session_id"
            "  FROM lagged"
            ") SELECT user_id, session_id, count(*) AS n_events,"
            " CAST(floor(epoch(min(ts))) AS BIGINT) AS start_epoch,"
            " CAST(floor(epoch(max(ts))) AS BIGINT) AS end_epoch"
            " FROM sess GROUP BY user_id, session_id"
        ),
    }
