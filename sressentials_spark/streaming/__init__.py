"""Structured Streaming operators.

Shared sizing rule: a streaming STATE partition count is baked into
the query at planning time from ``spark.sql.shuffle.partitions``, and
every state store instance pays fixed per-micro-batch maintenance
(snapshot, commit, file I/O) regardless of how little state it holds.
Unlike batch shuffles — where AQE coalesces over-partitioning away —
streaming state cannot coalesce after the fact, so the right count
tracks STATE SIZE (≈ state_bytes / 200 MB at production scale), not
cluster cores. Measured here: the stream-stream attribution replay
runs 8.8 s with 32 one-core-box state partitions and 2.9 s with 8 —
pure fixed-cost multiplication. :func:`state_partitions` scopes the
setting around a streaming query's planning + execution and restores
the batch default afterwards.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from sressentials_spark.scratch import scratch_dir

#: Default state partition count for the availableNow replays in this
#: engine: test-scale state is KBs, so a handful of stores suffices.
DEFAULT_STATE_PARTITIONS = 8


@contextmanager
def state_partitions(spark: SparkSession, n: int | None):
    """Temporarily pin ``spark.sql.shuffle.partitions`` (which fixes
    the streaming state partition count at query planning) to ``n``;
    ``None`` leaves the session setting untouched."""
    if n is None:
        yield
        return
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


#: State-store backend required by ``transformWithStateInPandas``
#: (Spark 4's arbitrary-state API is RocksDB-only). Bundled with the
#: Spark distribution; also the production choice at scale — state
#: lives off-heap on local disk with incremental checkpointing to the
#: checkpoint location, instead of fully in executor memory.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@contextmanager
def state_store_provider(spark: SparkSession, provider: str):
    """Temporarily pin the streaming state-store backend (read at
    query start; restored afterwards so other replays keep the
    default HDFS-backed store)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    spark.conf.set(key, provider)
    try:
        yield
    finally:
        spark.conf.set(key, old)


def ephemeral_checkpoint() -> str:
    """Explicit checkpoint dir for a memory-sink availableNow replay.

    Without it Spark creates a temporary checkpoint under
    ``java.io.tmpdir`` — on this sandbox that is ext4 at 5-9 ms/fsync,
    and the commit/offset/state files fsync per micro-batch per state
    partition. Routing through :func:`scratch_dir` keeps every replay's
    checkpoint on the engine's fast scratch base (tmpfs here), removed
    at process exit exactly like the auto-created one."""
    return os.path.join(scratch_dir("sressentials_ckpt_"), "ckpt")


def replay_to_parquet(
    spark: SparkSession, stream_df: DataFrame, name: str
) -> tuple[DataFrame, list[dict]]:
    """Run an append-mode streaming DataFrame to completion
    (``availableNow``) through a PARQUET sink and read the result back
    as a batch DataFrame; also returns the query's progress records.

    The per-event replay harnesses (sessionize / dedup / attribution)
    previously used ``format("memory")``, which materializes every
    output row into DRIVER memory — fine for few-row aggregate
    streams, but an O(events) driver bottleneck for per-event outputs
    at scale. A parquet sink keeps the pipeline distributed end to
    end: executors write their own files, the driver tracks only the
    ``_spark_metadata`` commit log, and the read-back is an ordinary
    distributed scan — the exact shape of a production streaming job
    landing on object storage. Output + checkpoint live in a fresh
    temp dir per replay (no cross-run state bleed) and are removed at
    process exit.

    Progress records are returned so callers can surface watermark
    observability (``numRowsDroppedByWatermark``) — see
    :func:`sressentials_spark.streaming.sessionize.run_sessionize_ooo_batch`.
    """
    out = scratch_dir(f"sressentials_replay_{name}_")
    data_dir = os.path.join(out, "data")
    os.makedirs(data_dir, exist_ok=True)
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", data_dir)
        .option("checkpointLocation", os.path.join(out, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = [
        json.loads(p) if isinstance(p, str) else p for p in q.recentProgress
    ]
    # Explicit schema: a replay with zero output rows leaves no data
    # files, and schema inference over an empty dir would fail.
    return spark.read.schema(stream_df.schema).parquet(data_dir), progress


def dropped_by_watermark(progress: list[dict]) -> int:
    """Total rows Spark's late-data filter silently discarded across a
    replay, summed from the per-batch state-operator metrics. Nonzero
    means arrival disorder exceeded the watermark delay — the output
    is missing rows, and a production job should alert on it."""
    return sum(
        int(op.get("numRowsDroppedByWatermark", 0))
        for p in progress
        for op in p.get("stateOperators", [])
    )
