"""JSON-lines corpus source (schema-on-read with a corrupt channel).

The documents-table twin of the Mongo log source: one JSON object per
line, scanned with ``spark.read.text`` and parsed once by ``from_json``
against an explicit typed schema (never ``inferSchema`` — a second
full scan at 100 TB), with unparseable lines surfacing through the
in-struct corrupt column instead of killing the job. Parsing via
``from_json`` over a text scan — the same idiom as the Mongo log
source — also sidesteps Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN
restriction on raw JSON file sources, so the diagnostics channel can
be counted/collected freely. The JSONL fixture is rendered
deterministically from ``documents.parquet``
(:func:`sressentials_spark.loggen.ensure_documents_jsonl`) with a
malformed line every 97th doc so the corrupt channel is exercised on
every run, not just in error-path tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CORRUPT_COL = "_corrupt_record"

#: Typed envelope; the corrupt column rides inside the struct, so a
#: malformed line yields a struct whose only non-null field is the
#: raw text (PERMISSIVE semantics).
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Text scan + one typed ``from_json`` parse per line."""
    parsed = F.from_json(
        F.col("value"),
        DOCUMENTS_JSONL_SCHEMA,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return spark.read.text(path).select(
        F.col("value"), parsed.alias("parsed")
    )


def split_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good rows flattened, corrupt lines) — the routing split."""
    raw = read_documents_jsonl(spark, path)
    ok = F.col(f"parsed.{CORRUPT_COL}").isNull()
    good = raw.filter(ok).select("parsed.*").drop(CORRUPT_COL)
    bad = raw.filter(~ok).select(F.col("value").alias(CORRUPT_COL))
    return good, bad
