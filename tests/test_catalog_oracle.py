"""Driver-gate rehearsal: every catalog query vs its DuckDB oracle.

Mirrors the driver's correctness check (row count + schema + order-
insensitive values) at sf0.001 so oracle drift is caught locally before
the per-round sf0.01 run.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from sressentials_spark import catalog
from sressentials_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = con.execute(sql).fetchdf()
    con.close()
    return out


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.iloc[key.argsort(kind="mergesort")]
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(catalog.ORACLE_SQL))
def test_query_matches_oracle(spark, name):
    spark_df = catalog.QUERIES[name](spark, SF_DIR).toPandas()
    oracle_df = run_oracle(catalog.ORACLE_SQL[name])
    assert len(spark_df) == len(oracle_df), f"{name}: row count mismatch"
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), f"{name}: columns"
    left, right = canonical(spark_df), canonical(oracle_df)
    for col in left.columns:
        l, r = left[col], right[col]
        if pd.api.types.is_datetime64_any_dtype(l) or pd.api.types.is_datetime64_any_dtype(r):
            l = pd.to_datetime(l).astype("datetime64[us]")
            r = pd.to_datetime(r).astype("datetime64[us]")
        pd.testing.assert_series_equal(
            l, r, check_dtype=False, check_names=False, check_exact=True, obj=f"{name}.{col}"
        )


def test_all_queries_have_rows(spark):
    """Every registered query returns a non-degenerate result at sf0.001."""
    for name, fn in catalog.QUERIES.items():
        assert fn(spark, SF_DIR).limit(1).count() == 1, f"{name} returned 0 rows"


def test_documents_fixture_is_ascii():
    """multimodal_features' engine side sums raw payload BYTES while its
    oracle counts characters (ascii/substr); they agree only on ASCII
    text, so the fixture must stay ASCII-only (see catalog docstring)."""
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
            " WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n == 0, f"{sf}: non-ASCII document text breaks byte/char oracle parity"
    con.close()
