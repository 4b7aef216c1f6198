"""Micro-batch ingest INTO the manifest-versioned ANN index —
exactly-once via the manifest as the transaction log.

The batch lifecycle already has crash-atomic ingest
(operators/ivf_versioned.py): every batch commits one atomically
published manifest version. This module puts an ARRIVAL STREAM in
front of it: embedding batches land as files, and each Structured
Streaming micro-batch appends into the index inside ``foreachBatch``.

The hazard ``foreachBatch`` adds is REDELIVERY: Spark's contract is
at-least-once per batch id, and a blind replay of an append verb
would double-ingest the batch's rows. The recipe (the classic
transactional-sink pattern) is to make the sink itself remember the
batch id: every ingest stamps ``stream_batch_id`` into the manifest
it publishes (``manifest_extra``), and a redelivered batch whose id
is already committed — by ANY live or expired-but-visible version —
is skipped before any work is staged. Because the stamp and the rows
land in ONE atomic manifest publish, there is no window where the
rows committed but the stamp did not (or vice versa): the manifest IS
the transaction log, and ingest becomes exactly-once end to end.

Frozen-centroid encoding is batch-invariant (each batch is assigned
under the same v1 centroids), so the streamed index's final state is
bit-equal to a one-shot build-then-ingest over the same rows — which
is what lets the composition share the batch ingest oracle when it
registers. Pinned row-for-row in tests/test_streaming_ann_ingest.py,
including a full-redelivery replay (fresh checkpoint, same files)
committing nothing.

At 100 TB this is the online index-maintenance tier: arrival batches
are O(batch) encode + append jobs, the manifest publish is O(files)
JSON, and readers never block on the writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sressentials_spark.operators import ivf_versioned as V

_STAMP = "stream_batch_id"


def committed_stream_batch(base_path: str) -> int:
    """The newest committed micro-batch id, or -1: scan versions
    descending for the latest manifest carrying the stamp. Every
    descendant publish — ingest, rebalance, refresh, compact, delete —
    carries riders forward (``ivf_versioned._carry_manifest_extra``),
    so the LATEST manifest normally holds the high-water mark and the
    stamp survives maintenance followed by ``vacuum(keep_last=1)``;
    the descending scan is belt and braces for manifests published
    before that rule existed. Raw read: the stamp rides in the version
    JSON itself, so the scan never loads a two-level version's entry
    blocks — O(1) per version regardless of index size."""
    for v in reversed(V.ivf_index_versions(base_path)):
        man = V._read_manifest_raw(base_path, v)
        if _STAMP in man:
            return int(man[_STAMP])
    return -1


def _run_ingest_stream(
    spark: SparkSession,
    arrivals_dir: str,
    base_path: str,
    checkpoint_dir: str,
    ingest_verb,
    id_col: str,
) -> None:
    """Shared exactly-once micro-batch loop: each arrival file is one
    trigger; a batch whose id is already stamped is skipped driver-side
    before any staging; otherwise ``ingest_verb`` commits the batch's
    rows and the stamp in ONE atomic manifest publish.

    An EMPTY arrival micro-batch never publishes its stamp (the ingest
    verbs early-return before staging when the encode yields no
    entries), so ``committed_stream_batch`` does not advance past it.
    That is harmless BY the exactly-once argument, not by accident:
    redelivering an unstamped empty batch re-ingests zero rows (a
    no-op), so the invariant that matters — no row commits twice —
    holds even though "stamp == highest delivered batch id" does not.
    Pinned by tests/test_streaming_ann_ingest.py::
    test_empty_batch_skips_stamp_and_redelivery_is_noop; if the
    early-return in the ingest verbs ever changes, that test is the
    tripwire."""

    def ingest(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= committed_stream_batch(base_path):
            return  # redelivered: its rows are already committed
        ingest_verb(
            batch,
            base_path,
            id_col=id_col,
            manifest_extra={_STAMP: int(batch_id)},
        )

    q = (
        spark.readStream.schema(f"{id_col} long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_versioned_ingest_stream(
    spark: SparkSession,
    arrivals_dir: str,
    base_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
) -> None:
    """Replay the staged embedding arrivals (one file per trigger)
    through exactly-once versioned ingest: each micro-batch whose id
    is not yet stamped commits one manifest version; redelivered
    batches are skipped driver-side before any staging."""
    _run_ingest_stream(
        spark,
        arrivals_dir,
        base_path,
        checkpoint_dir,
        V.ingest_ivf_index_versioned,
        id_col,
    )


def run_versioned_ivfpq_ingest_stream(
    spark: SparkSession,
    arrivals_dir: str,
    base_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
) -> None:
    """The PQ-tier twin: arrival batches are ENCODED under the latest
    manifest's frozen coarse centroids and residual codebooks (one
    assign + encode pass per batch, O(batch) — quantizer drift is the
    refresh gauge's business) and committed with the same exactly-once
    stamp discipline. Frozen-artifact encoding is batch-invariant, so
    the streamed store's final state is bit-equal to the one-shot
    build-then-ingest over the same rows — pinned in
    tests/test_streaming_ann_ingest.py, which is what lets a future
    registration share the batch PQ-ingest oracle."""
    _run_ingest_stream(
        spark,
        arrivals_dir,
        base_path,
        checkpoint_dir,
        V.ingest_ivfpq_index_versioned,
        id_col,
    )
