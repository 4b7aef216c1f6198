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

from contextlib import contextmanager

from pyspark.sql import SparkSession

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
