"""Stream-stream join state: views must be BUFFERED across micro-batch
boundaries to match purchases arriving in later batches. A single-file
availableNow replay runs one batch and never exercises that, so these
tests build a two-file fixture with a KNOWN view→purchase pair split
across the files (``maxFilesPerTrigger=1`` → two batches) — that pair
only appears in the output if the view row survived in join state
across the boundary. Also pins the negative case: a purchase more
than the attribution window after every view matches nothing."""

from __future__ import annotations

import shutil
import time
from datetime import datetime

from sressentials_spark.streaming.attribution import run_attribution_batch

COLS = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _write_batches(spark, tmp_path, batch1, batch2):
    src = tmp_path / "stage"
    dst = tmp_path / "events_dir"
    dst.mkdir()
    for i, rows in enumerate([batch1, batch2]):
        d = src / str(i)
        spark.createDataFrame(rows, COLS).coalesce(1).write.parquet(str(d))
        pq = next(d.glob("*.parquet"))
        if i == 1:
            time.sleep(1.1)  # distinct mtimes => deterministic batch order
        shutil.copy(pq, dst / f"part{i}.parquet")
    return str(dst)


def _ts(h, m):
    return datetime(2024, 5, 1, h, m)


def _pairs(df):
    return {
        (r["user_id"], r["view_event_id"], r["purchase_event_id"])
        for r in df.collect()
    }


def test_view_buffered_across_batch_matches_later_purchase(spark, tmp_path):
    batch1 = [
        (1, _ts(10, 0), 1, "view", 1.0, "{}"),
        (2, _ts(10, 5), 2, "view", 1.0, "{}"),
        (3, _ts(10, 10), 2, "purchase", 5.0, "{}"),  # same-batch pair
    ]
    batch2 = [
        (4, _ts(10, 30), 1, "purchase", 9.0, "{}"),  # CROSS-batch pair
        (5, _ts(12, 0), 1, "view", 1.0, "{}"),
        (6, _ts(12, 20), 1, "purchase", 2.0, "{}"),  # same-batch pair
        (7, _ts(15, 0), 2, "purchase", 3.0, "{}"),  # outside every window
    ]
    path = _write_batches(spark, tmp_path, batch1, batch2)
    got = _pairs(
        run_attribution_batch(
            spark, path, glob="*.parquet", max_files_per_trigger=1
        )
    )
    assert got == {(1, 1, 4), (2, 2, 3), (1, 5, 6)}


def test_purchase_before_view_never_matches(spark, tmp_path):
    batch1 = [(1, _ts(9, 0), 1, "purchase", 5.0, "{}")]
    batch2 = [(2, _ts(9, 30), 1, "view", 1.0, "{}")]
    path = _write_batches(spark, tmp_path, batch1, batch2)
    got = _pairs(
        run_attribution_batch(
            spark, path, glob="*.parquet", max_files_per_trigger=1
        )
    )
    assert got == set()


def test_full_outer_emits_both_nonmatch_directions(spark):
    """FULL OUTER: never-converted views appear null-padded on the
    purchase side, organic purchases null-padded on the view side, and
    the matched pairs agree with the batch full-join restatement."""
    from pyspark.sql import functions as F

    from sressentials_spark.sources.tables import load_table
    from sressentials_spark.streaming.attribution import (
        run_attribution_full_outer_batch,
    )

    sf = "/root/testdata/sf0.001"
    got = run_attribution_full_outer_batch(spark, sf)

    e = load_table(spark, sf, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_uid"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expect = v.join(
        p,
        (F.col("v_uid") == F.col("p_uid"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    ).select(
        F.coalesce("v_uid", "p_uid").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        "view_ts",
        "purchase_ts",
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # Both non-match directions genuinely occur in the corpus.
    assert got.filter(F.col("purchase_event_id").isNull()).count() > 0
    assert got.filter(F.col("view_event_id").isNull()).count() > 0
