"""Streaming sessionization: a custom stateful operator built on
``applyInPandasWithState``.

The streaming face of the batch ``window_sessionize_events`` query
(catalog.py): per-user session ids assigned from 30-minute inactivity
gaps, but computed incrementally — per-user state (last-seen event
time µs + running session counter) lives in the state store and
carries across micro-batches, so a user whose events span many batches
keeps one consistent session numbering. This is the shape of every
custom stateful operator in this engine: groupBy(key) →
``applyInPandasWithState`` with an explicit state schema, Arrow-batched
pandas on the partition side, no driver participation.

Ordering contract: within a micro-batch each user's rows are sorted by
``(ts, event_id)`` before assignment — identical to the batch window
spec — and batches are assumed event-time-ordered per user *across*
batches (true for an ``availableNow`` replay of time-partitioned files
and for ordered ingest). Out-of-order arrivals across batch boundaries
would need a watermark + reordering buffer in front of the state
update; that variant is deliberately out of scope (the batch query is
the late-data-correct restatement). The contract is ENFORCED, not just
documented: a batch whose earliest per-user event time precedes the
stored ``last_us`` raises inside the state update and fails the query,
so violations surface as an error instead of silently mis-numbered
sessions.

Scale: state is two longs per active user; the stateful shuffle keys
on ``user_id`` (uniform). At 100 TB the same plan runs with a RocksDB
state store and a timeout evicting users idle past the session gap
(their next event would start a new session anyway — eviction is
semantically free).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Inactivity gap that closes a session (must match catalog's
#: ``_SESSION_GAP_US`` so the oracle restates both queries).
SESSION_GAP_US = 30 * 60 * 1_000_000

_OUTPUT_SCHEMA = "event_id long, user_id long, ts timestamp, session_id long"
_STATE_SCHEMA = "last_us long, session_id long"


def _ts_us(ts: pd.Series) -> pd.Series:
    """Event time → epoch µs (exact: testdata is µs-precision)."""
    return ts.astype("datetime64[us]").astype("int64")


def _assign_sessions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
    us = _ts_us(pdf["ts"])
    if state.exists:
        last_us, sid = state.get
        # Ordering-contract guard: batches must arrive event-time-
        # ordered per user (see module docstring). A batch whose
        # earliest event precedes the stored last-seen time is a state
        # regression — session ids from here on would be silently
        # wrong, so fail the query loudly instead.
        if len(us) and int(us.iloc[0]) < last_us:
            raise ValueError(
                f"sessionize ordering contract violated for key {key}: "
                f"batch min event time {int(us.iloc[0])}us precedes "
                f"stored last-seen {last_us}us; cross-batch arrivals "
                "must be event-time-ordered per user (use the batch "
                "window query for late/out-of-order data)"
            )
    else:
        last_us, sid = None, 0
    session_ids = []
    for t in us:
        if last_us is None or t - last_us > SESSION_GAP_US:
            sid += 1
        last_us = t
        session_ids.append(sid)
    state.update((int(last_us), int(sid)))
    out = pdf[["event_id", "user_id", "ts"]].copy()
    out["session_id"] = pd.Series(session_ids, dtype="int64")
    yield out


def sessionize_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental per-user sessionization over a parquet file source."""
    schema = spark.read.parquet(f"{sf_dir}/{glob}").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        # Source option: bounds each micro-batch to N files, so an
        # availableNow replay becomes a multi-batch run (tests use this
        # to exercise the cross-batch state hand-off).
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(sf_dir)
    events = stream.select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _assign_sessions,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_batch(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay the stream to completion (availableNow) and return the
    sessionized table. ``max_files_per_trigger`` forces multi-batch
    replays in tests so the cross-batch state hand-off is exercised."""
    from sressentials_spark.streaming import (
        DEFAULT_STATE_PARTITIONS,
        state_partitions,
    )

    run_key = f"{sf_dir}|{glob}|{max_files_per_trigger}"
    name = "stream_sessionize_" + hashlib.md5(run_key.encode()).hexdigest()[:10]
    with state_partitions(spark, DEFAULT_STATE_PARTITIONS):
        src = sessionize_stream(
            spark, sf_dir, glob=glob, max_files_per_trigger=max_files_per_trigger
        )
        q = (
            src.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
