"""MySQL slow-query analysis plan (reference S2-S9, N2, N3).

Reproduces ``parse_mysql_log_content`` (``MySql/mysqlLogParser.py:16-134``)
as lazy DataFrame pipelines: six regex field extractions + the
multi-line query extraction, the all-fields-required validation gate,
seconds→ms conversion, query normalization, and the per-pattern
aggregate — all native column expressions inside whole-stage codegen.

Fidelity notes (verified against the executed reference, SURVEY §2/§5):

* ``Lock_time`` / ``Rows_sent`` / ``Rows_examined`` stay **strings**
  (``MySql/mysqlLogParser.py:76-78``) — no cast.
* A ``COMMIT;``-only entry IS captured as a query (the reference
  test's contrary comment is empirically wrong).
* The aggregate sheet is implicitly sorted ascending by
  ``Normalized_Query`` (pandas ``groupby(sort=True)``) — Spark's
  ``groupBy`` does not sort, so the order-by is explicit here.
* ``Sample_Query`` uses ``min_by(Query, entry_no)`` for a
  deterministic "first in file order" under partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sressentials_spark.functions.normalize import (
    normalize_mysql_query,
    query_time_ms,
    strip_ws,
)
from sressentials_spark.sources.mysql_log import read_mysql_log

#: The seven patterns of ``MySql/mysqlLogParser.py:18-27``. Java regex
#: accepts them as-is; ``\z`` replaces Python's ``\Z`` (same meaning).
PATTERNS = {
    "Time": r"# Time: (.*)",
    "User@Host": r"# User@Host: (.*?) thread_id:",
    "Query_time": r"# Query_time: (.*?) Lock_time:",
    "Lock_time": r"Lock_time: (.*?) Rows_sent:",
    "Rows_sent": r"Rows_sent: (.*?) Rows_examined:",
    "Rows_examined": r"Rows_examined: (.*?)\n",
    "Query": r"(?s)SET timestamp=.*?;\n(.*?)(?=\n# Time:|\z)",
}

_EMPTY_QUERY = "N/A (Query not captured)"

DETAILED_COLUMNS = [
    "Time",
    "User@Host",
    "Query_time (ms)",
    "Lock_time",
    "Rows_sent",
    "Rows_examined",
    "Query",
    "Normalized_Query",
]
AGGREGATE_COLUMNS = [
    "Normalized_Query",
    "Executions",
    "Min_Query_time_ms",
    "Max_Query_time_ms",
    "Avg_Query_time_ms",
    "Sample_Query",
]


def _matches_all(entry: Column) -> Column:
    """S4: entry kept only if every regex finds a match (``:67``)."""
    cond = F.lit(True)
    for pat in PATTERNS.values():
        cond = cond & entry.rlike(pat)
    return cond


def extract_entries(base: DataFrame) -> DataFrame:
    """S2/S3: regex projections + ``matched`` gate flag on raw entries."""
    entry = F.col("entry")
    cols = [
        strip_ws(F.regexp_extract(entry, PATTERNS[name], 1)).alias(f"_{name}")
        for name in PATTERNS
    ]
    return base.select("entry", "entry_no", *cols).withColumn("matched", _matches_all(entry))


def detailed_metrics(base: DataFrame) -> DataFrame:
    """Per-entry metric rows (Detailed Metrics sheet), file order.

    Returns the 8 reference columns plus ``entry_no``.
    """
    return detailed_from_extracted(extract_entries(base))


def detailed_from_extracted(ext: DataFrame) -> DataFrame:
    """As :func:`detailed_metrics`, over pre-extracted entries (so the
    regex pass can be persisted once and shared across sheets)."""
    ext = ext.filter(F.col("matched"))
    query = F.when(F.col("_Query") == "", F.lit(_EMPTY_QUERY)).otherwise(F.col("_Query"))
    return ext.select(
        F.col("entry_no"),
        F.col("_Time").alias("Time"),
        F.col("_User@Host").alias("User@Host"),
        query_time_ms(F.col("_Query_time")).alias("Query_time (ms)"),
        F.col("_Lock_time").alias("Lock_time"),
        F.col("_Rows_sent").alias("Rows_sent"),
        F.col("_Rows_examined").alias("Rows_examined"),
        query.alias("Query"),
        F.when(F.col("_Query") == "", F.lit(_EMPTY_QUERY))
        .otherwise(normalize_mysql_query(query))
        .alias("Normalized_Query"),
    )


def aggregate_results(detailed: DataFrame) -> DataFrame:
    """S6 + S7: per-normalized-query stats, ascending by pattern."""
    return (
        detailed.groupBy("Normalized_Query")
        .agg(
            F.count(F.lit(1)).alias("Executions"),
            F.min("Query_time (ms)").alias("Min_Query_time_ms"),
            F.max("Query_time (ms)").alias("Max_Query_time_ms"),
            F.round(F.avg("Query_time (ms)"), 2).alias("Avg_Query_time_ms"),
            F.min_by("Query", "entry_no").alias("Sample_Query"),
        )
        .select(*AGGREGATE_COLUMNS)
        .orderBy("Normalized_Query")
    )


def skip_warnings(base: DataFrame) -> DataFrame:
    """S9: per-entry skip diagnostics with field-match booleans (``:92-96``)."""
    return warnings_from_extracted(extract_entries(base))


def warnings_from_extracted(ext: DataFrame) -> DataFrame:
    """As :func:`skip_warnings`, over pre-extracted entries."""
    ext = ext.filter(~F.col("matched"))
    entry = F.col("entry")

    def b(pat: str) -> Column:
        return F.when(entry.rlike(pat), "True").otherwise("False")

    details = F.concat_ws(
        ", ",
        F.concat(F.lit("T:"), b(PATTERNS["Time"])),
        F.concat(F.lit("UH:"), b(PATTERNS["User@Host"])),
        F.concat(F.lit("QT:"), b(PATTERNS["Query_time"])),
        F.concat(F.lit("LT:"), b(PATTERNS["Lock_time"])),
        F.concat(F.lit("RS:"), b(PATTERNS["Rows_sent"])),
        F.concat(F.lit("RE:"), b(PATTERNS["Rows_examined"])),
        F.concat(F.lit("Q:"), b(PATTERNS["Query"])),
    )
    message = F.concat(
        F.lit("Skipped log entry "),
        F.col("entry_no"),
        F.lit(" due to missing fields. Details: "),
        details,
        F.lit(". Content snippet: "),
        F.substring(entry, 1, 200),
        F.lit("..."),
    )
    return ext.orderBy("entry_no").select(F.col("entry_no"), message.alias("message"))


def analyze_mysql_log(spark: SparkSession, path: str, cache: bool = True) -> dict[str, DataFrame]:
    """Full 2-sheet analysis + diagnostics (reference
    ``parse_mysql_log_content``): ``detailed / aggregate / warnings``.
    """
    base = read_mysql_log(spark, path)
    # Persist AFTER the regex extraction: the 14 regex passes are the
    # dominant cost, and all three sheets branch off their result.
    ext = extract_entries(base)
    if cache:
        ext = ext.persist()
    detailed = detailed_from_extracted(ext)
    return {
        "detailed": detailed.orderBy("entry_no").select(*DETAILED_COLUMNS),
        "aggregate": aggregate_results(detailed),
        "warnings": warnings_from_extracted(ext),
        # Private handle to the persisted root so callers that cache the
        # sheet dict can unpersist it when done (never a display sheet).
        "_base": ext,
    }
