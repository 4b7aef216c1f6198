"""Stream-static enrichment across micro-batches: the complete-mode
windowed rollup must MERGE partial counts when the same (window,
nation, type) key arrives in different batches — two files with
``maxFilesPerTrigger=1`` force exactly that, and the settled result
must equal the one-shot batch aggregate."""

from __future__ import annotations

import shutil
import time
from datetime import datetime

from sressentials_spark.streaming.enrich import run_enriched_rollup_batch

EV_COLS = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _ts(h, m):
    return datetime(2024, 5, 1, h, m)


def _fixture_dir(spark, tmp_path):
    dst = tmp_path / "enrich_src"
    dst.mkdir()
    # Static dims the stream joins against.
    spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey long, c_nationkey int"
    ).coalesce(1).write.parquet(str(tmp_path / "cust"))
    spark.createDataFrame(
        [(0, "FRANCE"), (1, "GERMANY")], "n_nationkey int, n_name string"
    ).coalesce(1).write.parquet(str(tmp_path / "nat"))
    shutil.copy(
        next((tmp_path / "cust").glob("*.parquet")), dst / "customer.parquet"
    )
    shutil.copy(next((tmp_path / "nat").glob("*.parquet")), dst / "nation.parquet")
    # Two event batches: user 1 (FRANCE) clicks in hour 10 in BOTH
    # batches — the per-(window, nation, type) count must merge to 2.
    batch1 = [
        (1, _ts(10, 5), 1, "click", 1.00, "{}"),
        (2, _ts(10, 10), 2, "view", 2.50, "{}"),
    ]
    batch2 = [
        (3, _ts(10, 40), 1, "click", 3.00, "{}"),
        (4, _ts(11, 5), 2, "view", 4.25, "{}"),
    ]
    for i, rows in enumerate([batch1, batch2]):
        d = tmp_path / f"ev{i}"
        spark.createDataFrame(rows, EV_COLS).coalesce(1).write.parquet(str(d))
        if i == 1:
            time.sleep(1.1)
        shutil.copy(next(d.glob("*.parquet")), dst / f"ev{i}.parquet")
    return str(dst)


def test_windowed_counts_merge_across_batches(spark, tmp_path):
    path = _fixture_dir(spark, tmp_path)
    got = {
        (str(r["window_start"]), r["nation"], r["event_type"]): (
            r["n_events"],
            r["revenue_cents"],
        )
        for r in run_enriched_rollup_batch(
            spark, path, glob="ev*.parquet", max_files_per_trigger=1
        ).collect()
    }
    assert got == {
        ("2024-05-01 10:00:00", "FRANCE", "click"): (2, 400),
        ("2024-05-01 10:00:00", "GERMANY", "view"): (1, 250),
        ("2024-05-01 11:00:00", "GERMANY", "view"): (1, 425),
    }


def test_rate_limited_multibatch_matches_single_batch(spark):
    """The staged one-file-per-micro-batch replay must settle to the
    same rollup as the one-shot availableNow replay (state merges
    across genuine batch boundaries; dimension broadcast re-planned
    per batch)."""
    from sressentials_spark.streaming.enrich import (
        run_enriched_rollup_multibatch,
    )

    sf = "/root/testdata/sf0.001"
    multi = run_enriched_rollup_multibatch(spark, sf)
    single = run_enriched_rollup_batch(spark, sf)
    assert multi.exceptAll(single).count() == 0
    assert single.exceptAll(multi).count() == 0
    assert multi.count() > 0
