"""Streaming IVF-PQ serving (streaming/ann_serving.py): the union of
per-micro-batch top-ks must equal the one-shot batch IVFADC search
row-for-row — batching invariance is what lets the streaming query
share the batch oracle."""

from __future__ import annotations

import pandas as pd

from sressentials_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def _canon(df) -> pd.DataFrame:
    pdf = df.toPandas()
    return (
        pdf.sort_values(["query_id", "rank"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_streamed_topk_equals_batch_ivfadc(spark):
    streamed = _canon(QUERIES["streaming_ivfpq_topk_serving"](spark, SF))
    batch = _canon(QUERIES["sim_pq_adc_topk_ivf"](spark, SF))
    pd.testing.assert_frame_equal(streamed, batch)
    # Every staged query answered with a full top-k.
    assert set(streamed["query_id"]) == set(range(5))
    assert (streamed.groupby("query_id")["rank"].max() == 10).all()
