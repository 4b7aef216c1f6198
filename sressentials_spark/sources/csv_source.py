"""CSV corpus source (schema-on-read with a corrupt channel).

Format breadth alongside the JSONL connector: the same
text-scan-plus-typed-parse idiom (``spark.read.text`` → one
``from_csv`` per line against an explicit schema — never
``inferSchema``, which is a second full scan at 100 TB), with
unparseable rows surfacing through the in-struct corrupt column.
Going through ``from_csv`` over a text scan (rather than the raw CSV
file source) sidesteps Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
restriction, so the diagnostics channel can be counted/collected
freely — identical reasoning to :mod:`.jsonl`.

Parser options pin RFC-4180 quoting (``escape='"'`` — doubled quotes
inside quoted fields), matching the deterministic fixture rendered by
:func:`sressentials_spark.loggen.ensure_documents_csv` (a malformed
row every 89th doc). The default reader is line-based on purpose —
embedded newlines would serialize each file through a single reader
at scale; corpora that genuinely need them go through the separate
:func:`read_documents_csv_multiline` path, which makes that cost
explicit (parallelism then comes from file count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

#: DDL form (from_csv takes a schema string); corrupt column rides in
#: the struct — on a malformed row the parseable prefix fields keep
#: their values and the raw line lands here (PERMISSIVE semantics).
DOCUMENTS_CSV_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, "
    f"n_chars LONG, {CORRUPT_COL} STRING"
)

_OPTIONS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": CORRUPT_COL,
    "quote": '"',
    "escape": '"',
    "header": "false",
}


def read_documents_csv(spark: SparkSession, path: str) -> DataFrame:
    """Text scan + one typed ``from_csv`` parse per line."""
    parsed = F.from_csv(
        F.col("value"), DOCUMENTS_CSV_SCHEMA, _OPTIONS
    )
    return spark.read.text(path).select(F.col("value"), parsed.alias("parsed"))


def split_documents_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good rows flattened, corrupt lines) — the routing split."""
    raw = read_documents_csv(spark, path)
    ok = F.col(f"parsed.{CORRUPT_COL}").isNull()
    good = raw.filter(ok).select("parsed.*").drop(CORRUPT_COL)
    bad = raw.filter(~ok).select(F.col("value").alias(CORRUPT_COL))
    return good, bad


def read_documents_csv_multiline(spark: SparkSession, path: str) -> DataFrame:
    """The OTHER side of the one-record-per-line trade-off: quoted
    fields with REAL embedded newlines, read through the native CSV
    source with ``multiLine=true``.

    The cost is explicit and structural: multiLine disables newline
    record splitting, so each FILE is parsed by a single task
    (``spark.read.text`` + ``from_csv`` parallelizes within a file;
    this path cannot). At 100 TB that means parallelism comes from
    file COUNT — a corpus export that needs embedded newlines must be
    sharded into many files upstream. The engine offers both readers
    and documents when each applies; the default connector stays
    line-based.

    Schema is explicit (no ``inferSchema`` second scan); quoting is
    the same RFC-4180 pinning as the line-based reader.
    """
    return (
        spark.read.schema(
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
        )
        .options(multiLine="true", quote='"', escape='"', header="false")
        .csv(path)
    )
