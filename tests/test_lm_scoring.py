"""Frozen-LM streaming scorer: batching invariance and OOV charging.

The catalog oracle test pins streaming_lm_quality_scoring cell-exactly
against the DuckDB split oracle; these pin the two properties the
oracle can't see in isolation: the streamed per-batch union equals the
one-shot batch scoring (frozen model + per-document independence),
and out-of-vocabulary terms are charged exactly the model's Laplace
unseen mass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sressentials_spark.operators.curation import (
    score_unigram_logloss,
    unigram_lm,
)
from sressentials_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_stream_union_equals_batch_scoring(spark):
    from sressentials_spark.streaming.lm_scoring import run_lm_scoring_stream

    streamed = (
        run_lm_scoring_stream(spark, SF)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    decile = F.pmod(F.col("doc_id"), F.lit(10))
    model = unigram_lm(docs.filter(decile < 7))
    batch = (
        score_unigram_logloss(docs.filter(decile >= 7), model)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert streamed.equals(batch)


def test_oov_terms_charged_unseen_mass(spark):
    train = spark.createDataFrame(
        [(0, "aa bb aa bb"), (1, "aa cc")], "doc_id long, text string"
    )
    model = unigram_lm(train)
    scal = model.select("unseen_nll_micro").limit(1).collect()[0]
    out = (
        score_unigram_logloss(
            spark.createDataFrame([(9, "zz zz zz")], "doc_id long, text string"),
            model,
        )
        .collect()[0]
    )
    # Every token OOV: total = 3 * unseen mass, and an all-OOV doc is
    # never kept (unseen mass -ln(1/(N+V)) > ln V exactly when N >= V,
    # true for any corpus with a repeated token).
    assert out["nll_micro_total"] == 3 * scal["unseen_nll_micro"]
    assert not out["keep"]
