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


def _stage_document_arrivals(
    spark: SparkSession, sf_dir: str, split: int, n_files: int = 4
) -> str:
    """Write the new-split documents as ``n_files`` id-ranged,
    mtime-ordered arrival files for a rate-limited replay."""
    import glob as globmod
    import os
    import time

    from sressentials_spark.scratch import scratch_dir
    from sressentials_spark.sources.tables import load_table

    d = scratch_dir("sressentials_dedup_ingest_stage_")
    (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= split)
        .repartitionByRange(n_files, "doc_id")
        .write.mode("overwrite")
        .parquet(f"{d}/arrivals")
    )
    base = time.time() - 3600
    for i, p in enumerate(sorted(globmod.glob(f"{d}/arrivals/part-*.parquet"))):
        os.utime(p, (base + i, base + i))
    return d


def run_minhash_ingest_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming near-dup triage at ingest: documents arrive as files,
    each micro-batch is MinHash-triaged against the PERSISTED bucketed
    dedup index inside ``foreachBatch`` (history-only verdicts —
    batching-invariant by construction, see
    ``operators.dedup.minhash_history_triage``), and verdicts append
    to a parquet sink (executors write their own files; the driver
    tracks only the commit log). Per micro-batch the cost is the
    batch's own shingles/signatures plus one bucket-aligned band join
    whose history side never shuffles — O(batch), never O(corpus) —
    which is exactly what lets this run synchronously in the ingest
    path at 100 TB/day. New-vs-new dups within the arrival window are
    the nightly compaction's job (`dedup_incremental_ingest`)."""
    import os

    from sressentials_spark.operators import dedup as D
    from sressentials_spark.scratch import scratch_dir
    from sressentials_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    split = (max_id + 1) * 7 // 10

    def _build_index() -> D.DedupIndexTables:
        import re as _re

        from sressentials_spark.scratch import register_scratch

        app = _re.sub(r"\W", "_", spark.sparkContext.applicationId)
        tag = _re.sub(
            r"\W", "_", os.path.basename(os.path.normpath(sf_dir))
        )
        base = f"/tmp/sressentials_dedup_index/{app}/{tag}_{split}"
        prefix = f"ssk_dedup_idx_{app}_{tag}_{split}"
        register_scratch(f"/tmp/sressentials_dedup_index/{app}")
        return D.build_dedup_index(
            docs.filter(F.col("doc_id") < split), base, prefix
        )

    index = D.get_or_build_disk_artifact(
        spark, ("dedup_index", sf_dir, split), _build_index
    )

    def _replay() -> str:
        stage = D.get_or_build_disk_artifact(
            spark,
            ("dedup_ingest_stage", sf_dir, split),
            lambda: _stage_document_arrivals(spark, sf_dir, split),
        )
        d = scratch_dir("sressentials_dedup_ingest_out_")
        out = os.path.join(d, "verdicts")
        schema = spark.read.parquet(f"{stage}/arrivals").schema

        def triage(batch: DataFrame, batch_id: int) -> None:
            D.minhash_history_triage(
                batch.sparkSession, batch, index, split
            ).write.mode("append").parquet(out)
            D.release_persisted()

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stage}/arrivals")
            .writeStream.foreachBatch(triage)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    final = D.get_or_build_disk_artifact(
        spark, ("dedup_ingest_stream", sf_dir, split), _replay
    )
    return spark.read.parquet(final)
