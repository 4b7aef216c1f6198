"""Table maintenance: small-file compaction.

The small-files problem is the quiet killer of 100 TB lakehouse
tables: a streaming sink or over-parallel batch write lands thousands
of KB-scale parquet files per partition, and every subsequent scan
pays per-file open/footer costs that dwarf the data read (plus
NameNode/object-store listing pressure). Compaction rewrites a
directory to size-targeted files WITHOUT a shuffle: the row data never
re-keys, so ``coalesce`` (a narrow dependency that concatenates input
partitions) is the whole physical plan — each output task streams N
input files into one output file. Contrast ``repartition``, which
would pay a full shuffle of the table to achieve the same file count.

Sizing comes from the filesystem manifest, not a guess: output file
count = ceil(total_bytes / target_bytes), so the rewrite hits the
target regardless of how skewed the input files are. (Object-store
deployments read the same numbers from the listing API; a lakehouse
table format — Delta/Iceberg — from its manifest.)

Caveat, documented not hidden: ``coalesce`` concatenates partitions in
index order, so a directory whose files are range-clustered (the
Z-order / range layouts in ``sources.columnar``) keeps its clustering
only if input listing order matches cluster order — true for the
sorted part-file naming Spark emits. Min/max pruning survives
compaction in that case; a clustering-destroying compaction would need
the range-repartition write path instead.
"""

from __future__ import annotations

import glob as globmod
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Production-shaped target (the parquet sweet spot on object storage).
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def file_manifest(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet part file under ``path``."""
    return [
        (p, os.path.getsize(p))
        for p in sorted(globmod.glob(os.path.join(path, "part-*.parquet")))
    ]


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite ``src_dir``'s parquet files into ceil(total/target)
    size-targeted files at ``out_dir`` with a shuffle-free plan.
    Returns the before/after manifest stats (pinned by tests)."""
    manifest = file_manifest(src_dir)
    if not manifest:
        raise ValueError(f"no parquet part files under {src_dir}")
    total = sum(b for _, b in manifest)
    n_out = max(1, -(-total // target_bytes))
    (
        spark.read.parquet(src_dir)
        .coalesce(n_out)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    out_manifest = file_manifest(out_dir)
    return {
        "files_before": len(manifest),
        "files_after": len(out_manifest),
        "bytes_before": total,
        "bytes_after": sum(b for _, b in out_manifest),
        "target_files": n_out,
    }


@contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    """Scope ``partitionOverwriteMode=dynamic``: ``mode("overwrite")``
    then replaces ONLY the partitions present in the written data —
    STATIC (the default) would truncate the whole table first, which on
    a 3-year fact table turns a one-day repair into a total rewrite."""
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def overwrite_day_partition(
    spark: SparkSession, layout_path: str, day_rows: DataFrame
) -> None:
    """Idempotently rebuild the day partition(s) covered by
    ``day_rows`` (which must carry the ``d`` partition column) in a
    day-partitioned parquet layout. Dynamic partition overwrite makes
    this the atomic unit of backfill/repair: re-running it converges
    to the same state, and untouched days' files are never listed,
    read, or rewritten (pinned by tests/test_maintenance.py via file
    mtimes). This is the everyday maintenance verb on a partitioned
    100 TB fact table — a corrupted or late-restated day is recomputed
    from source and swapped in, with readers of other days unaffected."""
    with _dynamic_partition_overwrite(spark):
        (
            day_rows.repartition("d")
            .write.mode("overwrite")
            .partitionBy("d")
            .parquet(layout_path)
        )


def corrupt_then_rebuild_day(
    spark: SparkSession, sf_dir: str, layout_path: str, day: str
) -> DataFrame:
    """Repair drill for the partition-overwrite query: deliberately
    clobber one day's partition (half the rows, values zeroed — a
    botched backfill), rebuild it from the source of truth, and return
    the repaired day re-read from the layout. The oracle then asserts
    the repaired partition equals the source exactly — proof the
    overwrite both fixed the target day and touched nothing else."""
    from sressentials_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    day_src = events.filter(F.to_date("ts") == F.lit(day)).withColumn(
        "d", F.to_date("ts")
    )
    bad = day_src.filter(F.col("event_id") % 2 == 0).withColumn(
        "value", F.lit(0.0)
    )
    overwrite_day_partition(spark, layout_path, bad)
    overwrite_day_partition(spark, layout_path, day_src)
    return (
        spark.read.parquet(layout_path)
        .filter(F.col("d") == F.lit(day))
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
