"""JSONL corpus source: corrupt-channel routing and schema fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sressentials_spark import loggen
from sressentials_spark.sources.jsonl import split_documents_jsonl
from sressentials_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_corrupt_channel_catches_every_broken_line(spark):
    path = loggen.ensure_documents_jsonl(SF_DIR)
    good, bad = split_documents_jsonl(spark, path)
    docs = load_table(spark, SF_DIR, "documents")
    n_broken = docs.filter(
        F.col("doc_id") % loggen.JSONL_BROKEN_EVERY == 0
    ).count()
    assert bad.count() == n_broken > 0
    assert good.count() == docs.count() - n_broken
    # Corrupt lines carry the raw text for diagnostics.
    assert all("BROKEN" in r["_corrupt_record"] for r in bad.collect())


def test_good_rows_round_trip_all_columns(spark):
    path = loggen.ensure_documents_jsonl(SF_DIR)
    good, _ = split_documents_jsonl(spark, path)
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % loggen.JSONL_BROKEN_EVERY != 0
    )
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = sorted(tuple(r) for r in good.select(cols).collect())
    b = sorted(tuple(r) for r in docs.select(cols).collect())
    assert a == b
