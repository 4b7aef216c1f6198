"""Seeded-fuzz engine parity for the micro-quantized-ln operators.

The DSIR weights, unigram log-loss, and PSI drift metrics all rest on
one claim: quantizing each ``ln`` of an exact integer ratio to integer
micronats makes every downstream value BIGINT-exact, so Spark (JVM
``StrictMath.log``) and DuckDB (libm ``log``) agree bit-for-bit unless
a cross-engine ULP difference straddles a 0.5-micronat rounding
boundary. The golden corpus pins one distribution; this fuzz hammers
MANY random count shapes (skewed vocabularies, tiny and lopsided
cohorts, empty-ish documents) and requires exact equality of every
output cell across several seeds — if the boundary risk were real at
any plausible rate, hundreds of random ratios would surface it.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from sressentials_spark.operators.curation import (
    dsir_importance_weights,
    dsir_importance_weights_oracle_sql,
    unigram_logloss,
    unigram_logloss_oracle_sql,
)
from sressentials_spark.operators.drift import (
    histogram_drift,
    histogram_drift_oracle_sql,
)

VOCAB = [f"w{i}" for i in range(40)]


def _random_docs(seed: int, n_docs: int = 60) -> list[tuple[int, str, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        # Zipf-ish skew: low word ids much more likely.
        k = rng.randint(1, 30)
        words = [VOCAB[min(int(rng.expovariate(0.12)), 39)] for _ in range(k)]
        src = rng.choice(["tgt", "web", "web", "web"])
        rows.append((i, " ".join(words), src))
    return rows


def _duck(sql: str, docs: list[tuple[int, str, str]]) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    out = con.execute(sql).fetchdf()
    con.close()
    return out


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(sorted(df.columns)).reset_index(drop=True).astype(str)


def test_dsir_weights_match_duckdb_across_seeds(spark):
    for seed in (11, 23, 47):
        docs = _random_docs(seed)
        sdf = (
            dsir_importance_weights(
                spark.createDataFrame(
                    docs, "doc_id long, text string, source string"
                ),
                target_source="tgt",
            )
            .toPandas()
        )
        odf = _duck(dsir_importance_weights_oracle_sql(target_source="tgt"), docs)
        assert _canon(sdf).equals(_canon(odf)), f"seed {seed}"


def test_unigram_logloss_matches_duckdb_across_seeds(spark):
    for seed in (5, 17):
        docs = _random_docs(seed)
        sdf = unigram_logloss(
            spark.createDataFrame(docs, "doc_id long, text string, source string")
        ).toPandas()
        odf = _duck(unigram_logloss_oracle_sql(), docs)
        assert _canon(sdf).equals(_canon(odf)), f"seed {seed}"


def test_histogram_drift_matches_duckdb_across_seeds(spark):
    for seed in (7, 31):
        rng = random.Random(seed)
        rows = []
        for i in range(500):
            grp = rng.choice(["a", "b"])
            # Current cohort for group b drawn from a shifted range so
            # some runs alarm and some don't.
            is_ref = rng.random() < 0.5
            base = 400.0 if (grp == "b" and not is_ref) else 0.0
            rows.append((i, grp, base + rng.random() * 120.0, is_ref))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events(event_id BIGINT, event_type VARCHAR,"
            " value DOUBLE, is_ref BOOLEAN)"
        )
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
        odf = con.execute(
            histogram_drift_oracle_sql(split_sql="is_ref")
        ).fetchdf()
        con.close()
        sdf = histogram_drift(
            spark.createDataFrame(
                rows, "event_id long, event_type string, value double, is_ref boolean"
            ),
            split_expr="is_ref",
        ).toPandas()
        assert _canon(sdf).equals(_canon(odf)), f"seed {seed}"
