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
