"""Scalar column functions (native Catalyst expressions — no Python UDFs).

The reference's only scalar transforms are two regex normalizers, a
unit conversion, rounding and trimming (SURVEY.md §2.3). All are
expressed as JVM-side column expressions so they stay inside
whole-stage codegen.
"""

from sressentials_spark.functions.normalize import (
    normalize_mongo_command,
    normalize_mysql_query,
    query_time_ms,
    strip_ws,
)

__all__ = [
    "normalize_mongo_command",
    "normalize_mysql_query",
    "query_time_ms",
    "strip_ws",
]
