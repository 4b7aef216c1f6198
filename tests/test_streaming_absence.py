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
