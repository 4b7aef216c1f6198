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
                F.sum(F.when(col.isNull(), 1).otherwise(0))
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
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects)
