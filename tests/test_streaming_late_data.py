"""Watermark late-data semantics, pinned across micro-batches.

Append-mode windowed aggregation emits a window once the watermark
passes its end and DROPS events that arrive behind the watermark.
Single-batch replays can't observe either behavior (the watermark
starts at -inf), and the drop filter uses the watermark *committed
before the batch was planned* — one batch behind the eviction
watermark — so the replay needs three batches: batch A advances the
watermark past the first window's end, batch B commits it, and batch C
delivers the late event (dropped) plus a fresh one (absorbed into a
still-open window, not yet emitted). This one-batch lag is exactly the
documented Spark guarantee: drops are guaranteed only beyond the
watermark horizon; inclusion closer in is best-effort.
"""

from __future__ import annotations

import json
import os

from sressentials_spark.streaming.slow_rate import slow_rate_stream


def _slow_line(ts: str, coll: str, dur: int) -> str:
    return json.dumps(
        {
            "t": {"$date": ts},
            "s": "I",
            "c": "COMMAND",
            "msg": "Slow query",
            "attr": {"ns": f"app.{coll}", "durationMillis": dur},
        }
    )


def test_late_event_behind_watermark_is_dropped(spark, tmp_path):
    d = str(tmp_path)
    # Batch A: 10:05/10:20 plus 13:30 — watermark after A is
    # 13:30 - 2h = 11:30, past the [10:00, 11:00) window end.
    with open(os.path.join(d, "a.log"), "w") as f:
        f.write(_slow_line("2026-01-01T10:05:00.000000Z", "users", 10) + "\n")
        f.write(_slow_line("2026-01-01T10:20:00.000000Z", "users", 20) + "\n")
        f.write(_slow_line("2026-01-01T13:30:00.000000Z", "users", 30) + "\n")
    # Batch B: one fresh event — commits the advanced watermark so the
    # NEXT batch's late filter uses it (one-batch lag, see module doc).
    with open(os.path.join(d, "b.log"), "w") as f:
        f.write(_slow_line("2026-01-01T13:40:00.000000Z", "users", 35) + "\n")
    # Batch C: a LATE event for the closed 10:00 window (behind the
    # watermark → dropped) plus one for the open 13:00 window.
    with open(os.path.join(d, "c.log"), "w") as f:
        f.write(_slow_line("2026-01-01T10:40:00.000000Z", "users", 99) + "\n")
        f.write(_slow_line("2026-01-01T13:45:00.000000Z", "users", 40) + "\n")
    for i, n in enumerate(["a.log", "b.log", "c.log"]):
        os.utime(os.path.join(d, n), (1_000_000 * (i + 1),) * 2)

    q = (
        slow_rate_stream(spark, d, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("late_data_pin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        str(r["window_start"]): r for r in spark.table("late_data_pin").collect()
    }
    # The 10:00 window emitted exactly once, WITHOUT the late event:
    # n=2 and max duration 20 (the late 99 was dropped, not merged).
    assert set(rows) == {"2026-01-01 10:00:00"}
    w10 = rows["2026-01-01 10:00:00"]
    assert w10["n_slow"] == 2
    assert w10["max_duration_ms"] == 20
    # The 13:00 window is still open (watermark < 14:00): append mode
    # has not emitted it — asserted by the set equality above.
