"""Column profiling: per-column data-quality statistics in one pass
per column.

Every serious analytics engine ships a profiler (row counts, null
counts, distinct cardinality, value ranges) — it is the first query a
user runs against an unfamiliar 100 TB table. The shape here is one
tiny aggregate PER COLUMN unioned together rather than one wide
aggregate with N ``count_distinct``s: multiple distinct aggregates in
a single ``agg`` compile to an ``Expand`` that multiplies every input
row by N (the regression the retention query had to be rewritten away
from), while N separate aggregates against a COLUMNAR source each scan
only their own column — so total I/O matches the single-scan plan and
no row blow-up ever exists. Min/max are computed on the native type
and stringified afterwards (stringify-then-min would order numerics
lexically).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: ``(col_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)`` with the extrema rendered as
    strings (computed on the native type)."""
    parts = []
    for c in cols:
        col = F.col(c)
        parts.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(col.isNull(), 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias("n_nulls"),
                F.countDistinct(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def profile_columns_oracle_sql(table: str, cols: list[str]) -> str:
    """DuckDB restatement of :func:`profile_columns`."""
    selects = [
        f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)


def key_skew_profile(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Join/shuffle-key skew diagnostics: one row per candidate key
    column with its cardinality, hottest key, and a skew ratio.

    This is the "why is my join slow" tool — run it on a prospective
    shuffle key BEFORE keying a 100 TB join on it. Every metric is a
    two-stage aggregate: per-key counts (one uniform shuffle on the
    key itself), then a global fold of the counts table plus a
    broadcast scalar join to name the hottest key deterministically
    (smallest key among those at the max count — no engine-specific
    ``arg_max`` tie behavior). ``skew_ratio_permille`` is
    ``1000 × max_count × n_keys / n_rows`` (integer floor): 1000 means
    perfectly uniform, and the value approximates how many times
    slower the hottest task runs than the average.

    No windows and no quantiles over the counts table on purpose: a
    global order statistic would funnel the (possibly billion-row)
    counts table through one partition — the very anti-pattern this
    profiler exists to catch.
    """
    parts = []
    for c in key_cols:
        counts = df.groupBy(F.col(c).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        totals = counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.coalesce(F.sum("cnt"), F.lit(0).cast("long")).alias("n_rows"),
            F.max("cnt").alias("max_count"),
        )
        top = (
            counts.join(
                F.broadcast(totals.select("max_count")),
                counts["cnt"] == F.col("max_count"),
            )
            .agg(F.min("k").alias("top_key"))
        )
        parts.append(
            totals.crossJoin(F.broadcast(top)).select(
                F.lit(c).alias("key_col"),
                "n_rows",
                "n_keys",
                "max_count",
                "top_key",
                F.expr(
                    "CASE WHEN n_keys = 0 THEN 0 ELSE n_rows div n_keys END"
                ).alias("mean_count"),
                F.expr(
                    "CASE WHEN n_rows = 0 THEN 0"
                    " ELSE (1000 * max_count * n_keys) div n_rows END"
                ).alias("skew_ratio_permille"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def key_skew_profile_oracle_sql(table: str, key_cols: list[str]) -> str:
    """DuckDB restatement of :func:`key_skew_profile`."""
    selects = [
        f"""
SELECT '{c}' AS key_col, n_rows, n_keys, max_count, top_key,
       CASE WHEN n_keys = 0 THEN 0 ELSE CAST(n_rows // n_keys AS BIGINT) END AS mean_count,
       CASE WHEN n_rows = 0 THEN 0
            ELSE CAST((1000 * max_count * n_keys) // n_rows AS BIGINT) END AS skew_ratio_permille
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_count
  FROM (SELECT CAST({c} AS VARCHAR) AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1)
) t
CROSS JOIN (
  SELECT MIN(k) AS top_key
  FROM (SELECT CAST({c} AS VARCHAR) AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1) c1
  WHERE cnt = (SELECT MAX(cnt) FROM
               (SELECT COUNT(*) AS cnt FROM {table} GROUP BY CAST({c} AS VARCHAR)) m)
) tk"""
        for c in key_cols
    ]
    return "\nUNION ALL\n".join(selects)
