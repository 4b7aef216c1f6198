"""Absence detection (streaming/absence.py): timer-driven alerts must
match the LEAD-window restatement exactly, including mid-stream
silences (user returns after the alert) — not just trailing ones."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from sressentials_spark.streaming.absence import (
    SILENCE_GAP_US,
    run_absence_batch,
)

SF = "/root/testdata/sf0.001"


def _expected_alerts(events: pd.DataFrame) -> pd.DataFrame:
    df = events.sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    ).copy()
    us = df["ts"].astype("datetime64[us]").astype("int64")
    nxt = us.groupby(df["user_id"]).shift(-1)
    keep = nxt.isna() | (nxt - us > SILENCE_GAP_US)
    out = df.loc[keep, ["user_id"]].copy()
    out["last_ts"] = df.loc[keep, "ts"].astype("datetime64[us]")
    return out.sort_values(["user_id", "last_ts"]).reset_index(drop=True)


def test_alerts_match_reference_and_include_midstream(spark):
    events = pq.read_table(f"{SF}/events.parquet").to_pandas()
    events["ts"] = events["ts"].astype("datetime64[us]")
    exp = _expected_alerts(events)

    got = (
        run_absence_batch(spark, SF)
        .toPandas()
        .sort_values(["user_id", "last_ts"])
        .reset_index(drop=True)
    )
    got["last_ts"] = got["last_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp)

    # Every user's trailing silence alerted exactly once.
    finals = events.groupby("user_id")["ts"].max()
    trailing = got.merge(
        finals.rename("final_ts"), left_on="user_id", right_index=True
    )
    n_trailing = (trailing["last_ts"] == trailing["final_ts"]).sum()
    assert n_trailing == events["user_id"].nunique()


def test_midstream_silence_emits_once_and_user_restarts(spark, tmp_path):
    """The return-after-silence path, which the sf0.001 corpus never
    hits (its users are too dense to go quiet mid-stream): a user with
    an 8-day mid-stream gap must alert exactly TWICE — once for the
    mid-stream silence (timer fires, state clears, the user restarts
    fresh) and once for the trailing silence — never more, despite the
    timer firing mid-replay."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(days=8)),        # returns after 8d gap
        (3, 1, t0 + dt.timedelta(days=8, hours=1)),
        (4, 2, t0),
        (5, 2, t0 + dt.timedelta(hours=1)),       # dense: trailing only
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = (
        run_absence_batch(spark, str(tmp_path))
        .toPandas()
        .sort_values(["user_id", "last_ts"])
        .reset_index(drop=True)
    )
    alerts = [
        (int(r["user_id"]), pd.Timestamp(r["last_ts"]).to_pydatetime())
        for _, r in got.iterrows()
    ]
    assert alerts == [
        (1, t0),                                   # mid-stream silence
        (1, t0 + dt.timedelta(days=8, hours=1)),   # trailing
        (2, t0 + dt.timedelta(hours=1)),           # trailing
    ]


def _write_arrival(spark, path, rows, mtime):
    spark.createDataFrame(
        [(int(e), int(u), ts) for e, u, ts in rows],
        "event_id long, user_id long, ts timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(path)
    import os

    for name in os.listdir(path):
        if name.startswith("part-"):
            os.utime(os.path.join(path, name), (mtime, mtime))


def test_beyond_delay_arrival_is_counted_not_silently_lost(spark, tmp_path):
    """Late-data observability, mirroring the sessionizer's pattern
    (tests/test_streaming_ooo.py): a row behind the watermark is
    discarded by Spark's late filter BEFORE the state function — for
    an absence detector that silent loss can suppress a real silence
    alert or invent a phantom one, so it must be COUNTED
    (``LAST_ABSENCE_STATS['dropped_late']``), never lost silently.
    Batch geometry: the drop filter uses the watermark committed
    before the batch was planned (one-batch lag), so batch A advances
    the watermark, batch B commits it, batch C delivers the late row."""
    import datetime as dt

    from sressentials_spark.streaming import absence as ab

    d = str(tmp_path / "stage")
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    def at(minutes: float) -> dt.datetime:
        return t0 + dt.timedelta(minutes=minutes)

    # Batch A: user 1 at 10:00; user 2 at 13:00 pushes the watermark
    # to 13:00 - ABSENCE_DELAY(1m) = 12:59.
    _write_arrival(
        spark, f"{d}/f1", [(1, 1, at(0)), (2, 2, at(180))], 1_000_000
    )
    # Batch B: fresh on-time event — commits the advanced watermark.
    _write_arrival(spark, f"{d}/f2", [(3, 2, at(185))], 2_000_000)
    # Batch C: event 4 for user 1 at 10:30 — behind the 12:59
    # watermark, dropped by the late filter; event 5 is on time.
    _write_arrival(
        spark, f"{d}/f3", [(4, 1, at(30)), (5, 2, at(190))], 3_000_000
    )
    # Sentinel: pushes the final watermark past every user's
    # last + gap so the trailing timers drain.
    _write_arrival(
        spark,
        f"{d}/f4",
        [(-1, -1, t0 + dt.timedelta(days=8))],
        4_000_000,
    )

    got = (
        run_absence_batch(spark, str(tmp_path), stage_dir=d)
        .toPandas()
        .sort_values(["user_id", "last_ts"])
        .reset_index(drop=True)
    )
    # The late row is counted, not silently lost.
    assert ab.LAST_ABSENCE_STATS["dropped_late"] == 1
    # Alerts reflect the surviving rows only: each user's trailing
    # silence, anchored at their last ON-TIME event (user 1's late
    # 10:30 row did not move last_ts).
    alerts = [
        (int(r["user_id"]), pd.Timestamp(r["last_ts"]).to_pydatetime())
        for _, r in got.iterrows()
    ]
    assert alerts == [(1, at(0)), (2, at(190))]


def test_clean_replay_reports_zero_dropped(spark):
    """The canonical staging is event-time ordered — the counter must
    read 0 (and run_absence_batch would raise otherwise)."""
    from sressentials_spark.streaming import absence as ab

    run_absence_batch(spark, SF).count()
    assert ab.LAST_ABSENCE_STATS["dropped_late"] == 0
