"""Query catalog: named engine queries + their DuckDB oracle SQL.

This is the single registry behind ``__spark_entry__.py``'s driver
contract (``queries()`` / ``oracle_sql()``). Every implemented operator
from SURVEY.md §2 (and the extension tier) appears here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus — wherever the
semantics are SQL-expressible — an equivalent DuckDB SQL string over
the same testdata tables.

The log-pipeline queries run the *real* engine end-to-end: a log file
is deterministically rendered from the ``events`` table
(:mod:`sressentials_spark.loggen`), the Spark pipelines parse it back,
and the oracle restates the expected output relationally using the very
same SQL fragments that generated the log — so scan, JSON/regex parse,
routing, normalization and aggregation are all on the hook, not just
the final agg.

Column names/aliases match between Spark and SQL on purpose: the
driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sressentials_spark import loggen
from sressentials_spark.operators.text import (
    exact_dedup_groups,
    quality_scores,
    token_stats,
)
from sressentials_spark.plans.mongo import analyze_mongo_log
from sressentials_spark.plans.mysql import analyze_mysql_log
from sressentials_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Log pipelines (reference surface, SURVEY §2: M1-M14, S1-S9, N1-N6)
# --------------------------------------------------------------------------

_sheets_cache: dict[tuple[str, str], dict[str, DataFrame]] = {}


def _mongo_sheet(spark: SparkSession, sf_dir: str, sheet: str) -> DataFrame:
    path = loggen.ensure_mongo_log(sf_dir)
    key = ("mongo", path)
    if key not in _sheets_cache:
        _sheets_cache[key] = analyze_mongo_log(spark, path)
    return _sheets_cache[key][sheet]


def _mysql_sheet(spark: SparkSession, sf_dir: str, sheet: str) -> DataFrame:
    path = loggen.ensure_mysql_log(sf_dir)
    key = ("mysql", path)
    if key not in _sheets_cache:
        _sheets_cache[key] = analyze_mysql_log(spark, path)
    return _sheets_cache[key][sheet]


_MONGO_SLOW_FILTER = "NOT malformed AND event_type IN ('click', 'view', 'purchase')"


@register(
    "mongo_slow_detailed",
    f"""
WITH ev AS ({loggen.MONGO_EV})
SELECT ({loggen.MONGO_CMD})      AS "Command",
       {loggen.MONGO_COLLECTION} AS "Collection",
       appname                   AS "AppName",
       dur                       AS "Duration(ms)",
       keys_ex                   AS "KeysExamined",
       docs_ex                   AS "DocsExamined",
       yields                    AS "numYields",
       nret                      AS "nreturned",
       {loggen.MONGO_FILTER}     AS "Filter",
       plan                      AS "Plan",
       tss                       AS "timestamp"
FROM ev WHERE {_MONGO_SLOW_FILTER}
""",
)
def mongo_slow_detailed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M9, M13: slow-query detailed metrics sheet."""
    return _mongo_sheet(spark, sf_dir, "detailed")


@register(
    "mongo_query_stats",
    f"""
WITH ev AS ({loggen.MONGO_EV}),
s AS (SELECT * FROM ev WHERE {_MONGO_SLOW_FILTER})
SELECT ({loggen.MONGO_PATTERN})         AS "Query Pattern",
       COUNT(*)                         AS "Executions",
       MIN(dur)                         AS "Min Duration(ms)",
       MAX(dur)                         AS "Max Duration(ms)",
       ROUND(AVG(dur), 2)               AS "Avg Duration(ms)",
       MIN_BY(({loggen.MONGO_CMD}), event_id) AS "Sample Full Query"
FROM s GROUP BY 1
""",
)
def mongo_query_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10/M12 + N1: per-pattern aggregation with file-order samples."""
    return _mongo_sheet(spark, sf_dir, "query_stats")


@register(
    "mongo_error_rollup",
    f"""
WITH ev AS ({loggen.MONGO_EV}),
e AS (SELECT * FROM ev WHERE NOT malformed AND event_type = 'error')
SELECT MIN(line_no)                  AS "OriginalLineNumber",
       'Connection error'            AS "msg",
       'E' || errcode                AS "error",
       'network error ' || errcode   AS "errmsg",
       COUNT(*)                      AS "totalCount",
       MIN_BY(({loggen.MONGO_ERR_LINE}), event_id) AS "SampleLine"
FROM e GROUP BY errcode
""",
)
def mongo_error_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4/M11: error rollup by (msg, codeName, errmsg)."""
    return _mongo_sheet(spark, sf_dir, "errors")


@register(
    "mongo_non_slow",
    f"""
WITH ev AS ({loggen.MONGO_EV})
SELECT ({loggen.MONGO_NOISE_LINE}) AS "LogLine"
FROM ev WHERE NOT malformed AND event_type = 'signup'
""",
)
def mongo_non_slow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: passthrough of valid lines matching neither route."""
    return _mongo_sheet(spark, sf_dir, "non_slow")


@register(
    "mongo_parse_errors",
    f"""
WITH ev AS ({loggen.MONGO_EV})
SELECT 'Line ' || line_no || ': Invalid JSON. Skipped.' AS "message"
FROM ev WHERE malformed
""",
)
def mongo_parse_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M14: parse-error diagnostics channel."""
    return _mongo_sheet(spark, sf_dir, "parse_errors")


@register(
    "mysql_detailed",
    f"""
WITH ev AS ({loggen.MYSQL_EV})
SELECT tstr                  AS "Time",
       uh                    AS "User@Host",
       qt_ms                 AS "Query_time (ms)",
       lock_str              AS "Lock_time",
       rows_sent             AS "Rows_sent",
       rows_ex               AS "Rows_examined",
       ({loggen.MYSQL_QUERY}) AS "Query",
       ({loggen.MYSQL_NQ})    AS "Normalized_Query"
FROM ev WHERE event_type <> 'error'
""",
)
def mysql_detailed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S5, N2/N3: per-entry extracted metrics sheet."""
    return _mysql_sheet(spark, sf_dir, "detailed")


@register(
    "mysql_aggregate",
    f"""
WITH ev AS ({loggen.MYSQL_EV}),
ok AS (SELECT * FROM ev WHERE event_type <> 'error')
SELECT ({loggen.MYSQL_NQ})       AS "Normalized_Query",
       COUNT(*)                  AS "Executions",
       MIN(qt_ms)                AS "Min_Query_time_ms",
       MAX(qt_ms)                AS "Max_Query_time_ms",
       ROUND(AVG(qt_ms), 2)      AS "Avg_Query_time_ms",
       MIN_BY(({loggen.MYSQL_QUERY}), event_id) AS "Sample_Query"
FROM ok GROUP BY 1
""",
)
def mysql_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/S7: per-normalized-query aggregation."""
    return _mysql_sheet(spark, sf_dir, "aggregate")


@register(
    "mysql_skip_warnings",
    f"""
WITH ev AS ({loggen.MYSQL_EV})
SELECT entry_no AS "entry_no",
       'Skipped log entry ' || entry_no || ' due to missing fields. Details: ' ||
       'T:True, UH:True, QT:False, LT:False, RS:False, RE:False, Q:True' ||
       '. Content snippet: ' || substr({loggen.MYSQL_SKIP_ENTRY}, 1, 200) || '...'
         AS "message"
FROM ev WHERE event_type = 'error'
""",
)
def mysql_skip_warnings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/S9: validation-gate diagnostics for incomplete entries."""
    return _mysql_sheet(spark, sf_dir, "warnings")


# --------------------------------------------------------------------------
# Relational extension tier (joins / windows / aggregations — SURVEY §2.8)
# --------------------------------------------------------------------------

def _ssum(c, scale: int):
    """Deterministic double sum via scaled-long accumulation.

    Double sums are summation-order-dependent (and Spark/DuckDB
    partition differently), while long sums are exact and associative;
    per-row ``round(x*scale)`` is deterministic on both engines (values
    here are positive, so HALF_UP == half-away-from-zero). Decimal-typed
    ``sum()`` would also be exact but hits a pathological
    ``Decimal.changePrecision`` path in codegen (measured 1.3s→104s on
    the same data); long accumulation stays in whole-stage codegen.
    Headroom: max |x*scale| ~1e11 over 2^53 rows of slack — fine up to
    ~1e7 rows per value domain used here; production-scale exact money
    aggregation would two-level this (long partials, decimal final).
    """
    return F.sum(F.round(c * scale).cast("long")) / F.lit(float(scale))


@register(
    "tpch_q1_pricing_summary",
    """
SELECT l_returnflag,
       l_linestatus,
       SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0      AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
         AS sum_disc_price,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) / 1000000.0
         AS sum_charge,
       SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: filter → partial/final hash agg.

    The shipdate predicate is pushed to the parquet scan; sums use
    decimal accumulation for cross-engine determinism, surfaced as
    doubles.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _ssum(F.col("l_quantity"), 100).alias("sum_qty"),
        _ssum(F.col("l_extendedprice"), 100).alias("sum_base_price"),
        _ssum(disc_price, 10000).alias("sum_disc_price"),
        _ssum(charge, 1000000).alias("sum_charge"),
        (_ssum(F.col("l_quantity"), 100) / F.count(F.lit(1))).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "join_revenue_by_nation",
    """
SELECT r_name,
       n_name,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) / 10000.0
         AS revenue,
       COUNT(DISTINCT c_custkey) AS n_customers,
       COUNT(*)                  AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join chain with broadcast dimensions.

    ``nation``/``region`` are broadcast explicitly (constant-size dims);
    the fact-fact ``lineitem ⋈ orders`` shuffles on the join key and
    AQE handles skew at scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            _ssum(rev, 10000).alias("revenue"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "window_top3_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (top-k per group) with a deterministic tie-break."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "events_hourly_by_type",
    """
SELECT date_trunc('hour', ts) AS hour,
       event_type,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (hourly) event rollup — the batch twin of the
    streaming slow-query-rate query."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _ssum(F.col("value"), 100).alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "events_props_kpi",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def events_props_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: JSON-path extraction inside an agg
    (the reference's tolerant ``.get()`` pattern over ``props``)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# Training-data pipeline tier: dedup + text analysis
# --------------------------------------------------------------------------

@register(
    "dedup_exact_documents",
    """
SELECT md5(text) AS fingerprint,
       COUNT(*)  AS n_copies,
       MIN(doc_id) AS keep_doc_id
FROM documents
GROUP BY 1
""",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by 128-bit content hash (uniform shuffle key)."""
    return exact_dedup_groups(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_stats",
    r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
         AS n_distinct_tokens,
       CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
         / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document tokenization statistics (narrow, codegen-only)."""
    return token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_quality_scores",
    r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT)
         AS n_stopwords,
       CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
         / len(toks) AS stopword_ratio,
       CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio,
       (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
         * (1.0 - CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
                  / len(toks)) AS quality_score
FROM t
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals (stopword ratio, lexical diversity)."""
    return quality_scores(load_table(spark, sf_dir, "documents"))
