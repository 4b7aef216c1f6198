"""SQL surface for the engine's scalar functions.

``register_sql_functions(spark)`` exposes the normalizers (N1/N2/N3/
N5) and the shared 60-bit md5 hash to ``spark.sql`` users as SQL UDFs
(Spark 4 ``CREATE FUNCTION ... RETURN <expr>``). These are DECLARED
functions, not Python UDFs: the body is a SQL expression that Catalyst
inlines into the calling plan, so they codegen and push down exactly
like the `pyspark.sql.functions` originals — registering them costs
nothing at execution time. (Contrast ``spark.udf.register`` of a
Python lambda, which would put a serialized-Python round trip in the
hot path — the slow path this engine avoids everywhere.)

The expression bodies mirror :mod:`sressentials_spark.functions.
normalize` and :func:`sressentials_spark.operators.dedup.md5_long`;
``tests/test_sql_registry.py`` pins SQL-vs-DataFrame equality on the
fuzz corpus so the two surfaces cannot drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from sressentials_spark.functions.normalize import (
    _PY_WHITESPACE,
    MONGO_NORMALIZE_PATTERN,
    MYSQL_NORMALIZE_PATTERN,
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine's scalar functions as temporary SQL UDFs;
    returns the registered names."""
    defs = {
        "sre_normalize_mongo": f"""
CREATE OR REPLACE TEMPORARY FUNCTION sre_normalize_mongo(cmd STRING)
RETURNS STRING
RETURN regexp_replace(cmd, {_sql_quote(MONGO_NORMALIZE_PATTERN)}, ':<value>')
""",
        "sre_normalize_mysql": f"""
CREATE OR REPLACE TEMPORARY FUNCTION sre_normalize_mysql(q STRING)
RETURNS STRING
RETURN upper(regexp_replace(q, {_sql_quote(MYSQL_NORMALIZE_PATTERN)}, '?'))
""",
        "sre_query_time_ms": """
CREATE OR REPLACE TEMPORARY FUNCTION sre_query_time_ms(sec STRING)
RETURNS DOUBLE
RETURN coalesce(try_cast(sec AS DOUBLE), 0.0d) * 1000.0d
""",
        "sre_strip": f"""
CREATE OR REPLACE TEMPORARY FUNCTION sre_strip(s STRING)
RETURNS STRING
RETURN btrim(s, {_sql_quote(_PY_WHITESPACE)})
""",
        "sre_md5_60bit": """
CREATE OR REPLACE TEMPORARY FUNCTION sre_md5_60bit(s STRING)
RETURNS BIGINT
RETURN CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 15), 16, 10) AS BIGINT)
""",
    }
    for ddl in defs.values():
        spark.sql(ddl)
    return sorted(defs)
