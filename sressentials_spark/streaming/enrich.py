"""Stream-static enrichment join: streaming events against a static
dimension, then a tumbling-window rollup.

This is the canonical production streaming shape the engine had not
yet covered: a fact STREAM joined per-micro-batch against slowly-
changing dimension TABLES (customer → nation here), with the join
small-side broadcast so each batch pays a map-side hash join and no
stateful join state at all (stream-static joins are stateless in
Structured Streaming — the static side is simply re-planned per
batch). The windowed aggregate's state is per
``(window, nation, event_type)`` — tiny and bounded by the watermark.

At 100 TB/day the identical plan runs continuously: the dimension
snapshot is refreshed by re-planning (or a Delta/lakehouse read per
batch), the broadcast is a few MB, and the only shuffle is the final
windowed partial aggregation on a low-cardinality composite key.

Money is integer cents end-to-end (``round(value*100)`` per event,
summed as BIGINT) so the DuckDB oracle restates the rollup exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def enriched_event_rollup_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming purchases per (hour, nation, event_type) with revenue.

    The static side (customer ⋈ nation, projected to the two columns
    the join needs) is built ONCE from the batch reader and broadcast
    into every micro-batch's hash join.
    """
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .join(
            spark.read.parquet(f"{sf_dir}/nation.parquet").select(
                "n_nationkey", "n_name"
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation"))
    )
    schema = spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        # Bounds each micro-batch to N files: tests use it to prove the
        # complete-mode rollup merges partial counts across batches.
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(sf_dir)
    events = stream.select(
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    joined = events.join(F.broadcast(dim), "user_id")
    return (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "nation", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_cents").alias("revenue_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "nation",
            "event_type",
            "n_events",
            "revenue_cents",
        )
    )


def run_enriched_rollup_batch(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay the stream to completion (availableNow) and return the
    settled rollup."""
    from sressentials_spark.streaming import (
        DEFAULT_STATE_PARTITIONS,
        state_partitions,
    )

    run_key = f"{sf_dir}|{window}|{glob}|{max_files_per_trigger}"
    name = "enrich_" + hashlib.md5(run_key.encode()).hexdigest()[:10]
    with state_partitions(spark, DEFAULT_STATE_PARTITIONS):
        q = (
            enriched_event_rollup_stream(
                spark,
                sf_dir,
                window,
                glob=glob,
                max_files_per_trigger=max_files_per_trigger,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
