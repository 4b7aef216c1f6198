"""Streaming exact deduplication: first-seen content hashes.

The streaming face of ``operators.text.exact_dedup_groups`` — a corpus
arriving as files (the 100 TB ingest shape: object-store drops picked
up by the file source) is deduplicated on content hash as it streams,
emitting each distinct hash once. ``dropDuplicates`` keeps per-key
state in the state store; for an unbounded hash space at production
scale that store would be RocksDB-backed and, if the stream carried
event time, watermarked so state for closed windows ages out. For a
bounded corpus replay (availableNow) the state IS the dedup set —
exactly the semantics wanted.

Only the hash column rides the stream after the projection, so the
stateful shuffle carries 32 bytes per row, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def exact_dedup_stream(
    spark: SparkSession, sf_dir: str, glob: str = "documents.parquet"
) -> DataFrame:
    """Streaming distinct content hashes over a parquet file source."""
    schema = spark.read.parquet(f"{sf_dir}/{glob}").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    return stream.select(
        F.md5(F.col("text").cast("binary")).alias("content_hash")
    ).dropDuplicates(["content_hash"])


def run_exact_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the dedup stream to completion (availableNow) and return the
    distinct-hash result table."""
    from sressentials_spark.streaming import (
        DEFAULT_STATE_PARTITIONS,
        state_partitions,
    )

    from sressentials_spark.streaming import replay_to_parquet

    with state_partitions(spark, DEFAULT_STATE_PARTITIONS):
        out, _ = replay_to_parquet(
            spark, exact_dedup_stream(spark, sf_dir), "dedup"
        )
    return out
