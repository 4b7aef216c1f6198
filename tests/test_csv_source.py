"""CSV corpus source: corrupt-channel routing and schema fidelity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sressentials_spark import loggen
from sressentials_spark.sources.csv_source import split_documents_csv
from sressentials_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_corrupt_channel_catches_every_broken_row(spark):
    path = loggen.ensure_documents_csv(SF_DIR)
    good, bad = split_documents_csv(spark, path)
    docs = load_table(spark, SF_DIR, "documents")
    n_broken = docs.filter(
        F.col("doc_id") % loggen.CSV_BROKEN_EVERY == 0
    ).count()
    assert bad.count() == n_broken > 0
    assert good.count() == docs.count() - n_broken
    # Corrupt lines carry the raw row for diagnostics.
    assert all("NOTANUMBER" in r["_corrupt_record"] for r in bad.collect())


def test_good_rows_round_trip_all_columns(spark):
    path = loggen.ensure_documents_csv(SF_DIR)
    good, _ = split_documents_csv(spark, path)
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % loggen.CSV_BROKEN_EVERY != 0
    )
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = sorted(tuple(r) for r in good.select(cols).collect())
    b = sorted(tuple(r) for r in docs.select(cols).collect())
    assert a == b


def test_rfc4180_quote_doubling_round_trips(spark, tmp_path):
    """Embedded quotes/commas survive the doubled-quote convention the
    connector's parser options pin (quote='\"', escape='\"')."""
    line = '7,"she said ""hi, there"" twice",en,web,25'
    p = tmp_path / "one.csv"
    p.write_text(line)
    good, bad = split_documents_csv(spark, str(p))
    assert bad.count() == 0
    row = good.collect()[0]
    assert row["text"] == 'she said "hi, there" twice'
    assert row["doc_id"] == 7 and row["n_chars"] == 25


def test_multiline_reader_round_trips_embedded_newlines(spark):
    """The multiLine path: every 7th doc's quoted text carries real
    newlines (the fixture has MORE physical lines than records — a
    line-based reader would shred it) and must round-trip exactly,
    with the newline substitution applied to the ground truth."""
    from sressentials_spark.sources.csv_source import (
        read_documents_csv_multiline,
    )

    path = loggen.ensure_documents_csv_multiline(SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    with open(path) as fh:
        n_lines = sum(1 for _ in fh)
    assert n_lines > n_docs  # records genuinely span lines

    got = read_documents_csv_multiline(spark, path)
    assert got.count() == n_docs
    expected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % loggen.CSV_MULTILINE_EVERY == 0,
            F.regexp_replace("text", " ", "\n"),
        ).otherwise(F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = sorted(tuple(r) for r in got.select(cols).collect())
    b = sorted(tuple(r) for r in expected.select(cols).collect())
    assert a == b
