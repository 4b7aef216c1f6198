from __future__ import annotations

import datetime as dt

from sressentials_spark.operators.rangejoin import time_band_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    )


def t(seconds: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=seconds)


class TestTimeBandCounts:
    def test_band_semantics(self, spark):
        # a@0, b@200, c@400: |a-b|=200 in band, |b-c|=200 in band,
        # |a-c|=400 out of band (band = 300 s).
        df = _ev(
            spark,
            [(1, "click", t(0)), (2, "click", t(200)), (3, "click", t(400))],
        )
        out = {r["event_id"]: r["n_concurrent"] for r in time_band_counts(df).collect()}
        assert out == {1: 1, 2: 2, 3: 1}

    def test_bucket_boundary_pairs_found_once(self, spark):
        # 299 vs 301 s straddles the 300-s bucket boundary; exactly-300
        # lands on the inclusive band edge. Each pair must count once.
        df = _ev(
            spark,
            [(1, "view", t(299)), (2, "view", t(301)), (3, "view", t(599)), (4, "view", t(601))],
        )
        out = {r["event_id"]: r["n_concurrent"] for r in time_band_counts(df).collect()}
        # |1-2|=2s, |2-3|=298s, |3-4|=2s, |1-3|=300s (inclusive edge!),
        # |2-4|=300s (inclusive), |1-4|=302s (out of band).
        assert out == {1: 2, 2: 3, 3: 3, 4: 2}

    def test_type_partitioning_and_zero_counts(self, spark):
        df = _ev(
            spark,
            [(1, "click", t(0)), (2, "view", t(10)), (3, "click", t(20)), (4, "error", t(30))],
        )
        out = {r["event_id"]: r["n_concurrent"] for r in time_band_counts(df).collect()}
        assert out == {1: 1, 2: 0, 3: 1, 4: 0}
        assert len(out) == 4  # zero-match events are kept
