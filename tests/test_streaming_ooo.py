"""Out-of-order sessionizer: late-data OBSERVABILITY.

The OOO reorder buffer is correct only while arrival disorder stays
under ``OOO_DELAY`` — rows behind the watermark are discarded by
Spark's late-data filter BEFORE the state update, which is silent row
loss unless surfaced. ``run_sessionize_ooo_batch`` therefore reports
``numRowsDroppedByWatermark`` (summed over the replay's batches) in
``LAST_OOO_STATS``; a production deployment alerts on it. This test
stages one genuinely beyond-delay arrival and pins that it is COUNTED
and absent from the output — dropped loudly, not lost silently.

Batch geometry mirrors tests/test_streaming_late_data.py: the drop
filter uses the watermark committed before the batch was planned (one
batch of lag), so the late row rides the third file — batch A advances
the watermark, batch B commits it, batch C delivers the late row.
"""

from __future__ import annotations

import datetime as dt
import os

from sressentials_spark.streaming import sessionize as sz


def _write_arrival(spark, path: str, rows, mtime: int) -> None:
    spark.createDataFrame(
        [(int(e), int(u), ts) for e, u, ts in rows],
        "event_id long, user_id long, ts timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    for name in os.listdir(path):
        if name.startswith("part-"):
            os.utime(os.path.join(path, name), (mtime, mtime))


def test_beyond_delay_arrival_is_counted_not_silently_lost(spark, tmp_path):
    d = str(tmp_path / "stage")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(minutes: float) -> dt.datetime:
        return t0 + dt.timedelta(minutes=minutes)

    # Batch A: user 1 opens a session at 10:00/10:05; a 12:00 event
    # pushes the watermark to 12:00 - OOO_DELAY(15m) = 11:45.
    _write_arrival(
        spark, f"{d}/f1",
        [(1, 1, at(0)), (2, 1, at(5)), (3, 2, at(120))], 1_000_000,
    )
    # Batch B: fresh event — commits the advanced watermark (one-batch
    # lag of the late filter).
    _write_arrival(spark, f"{d}/f2", [(4, 2, at(125))], 2_000_000)
    # Batch C: event 5 arrives for 10:30 — 75 minutes of disorder,
    # far beyond the 15-minute delay, behind the 11:45 watermark.
    _write_arrival(spark, f"{d}/f3", [(5, 1, at(30))], 3_000_000)
    # Sentinel: far-future dummy user pushes the global watermark past
    # every real event so all reorder buffers drain.
    _write_arrival(spark, f"{d}/f4", [(-1, -1, at(600))], 4_000_000)

    out = sz.run_sessionize_ooo_batch(
        spark, sf_dir=d, stage_dir=d, prestaged=True
    )
    got = {
        int(r["event_id"]): int(r["session_id"]) for r in out.collect()
    }

    # The beyond-delay row is gone from the output...
    assert 5 not in got
    # ...but COUNTED: one row dropped by the watermark filter.
    assert sz.LAST_OOO_STATS["dropped_late"] == 1
    # emitted covers exactly the four surviving real rows (the
    # sentinel itself stays buffered — the watermark never passes it).
    assert sz.LAST_OOO_STATS["emitted"] == 4

    # Surviving rows sessionized exactly as the batch window spec
    # would over the on-time prefix: user 1 one session (10:00/10:05),
    # user 2 one session (12:00/12:05).
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_clean_replay_reports_zero_dropped(spark):
    """The staged corpus replay keeps disorder under the watermark
    delay by construction — the counter must read 0 and the emitted
    count must cover every real event, proving zero silent loss. (The
    sentinel row itself never flushes: the watermark never passes it.)"""
    from sressentials_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = sz.run_sessionize_ooo_batch(spark, sf)
    n_events = load_table(spark, sf, "events").count()
    assert sz.LAST_OOO_STATS["dropped_late"] == 0
    assert sz.LAST_OOO_STATS["emitted"] == n_events
    assert out.count() == n_events
