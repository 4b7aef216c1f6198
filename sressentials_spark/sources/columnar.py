"""Columnar-layout fixtures: ORC rendering and partitioned parquet.

Two disk-backed layout artifacts behind the format/layout-breadth
queries (built once per (session, sf_dir) through
``get_or_build_disk_artifact``, removed at exit via ``scratch_dir``):

* an ORC copy of ``documents`` — same corpus through Spark's other
  built-in columnar format, proving the engine's scan/pushdown story
  is format-agnostic (ORC carries its own min/max indexes and
  PushedFilters the way parquet does);
* a date-partitioned parquet copy of ``events`` (``d=YYYY-MM-DD/``
  directories) — THE canonical 100 TB fact-table layout: a time-range
  predicate becomes partition PRUNING (directories never opened, not
  just row groups skipped), which is the difference between scanning
  a week and scanning three years.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sressentials_spark.scratch import scratch_dir
from sressentials_spark.sources.tables import load_table

#: File count for the rendered layouts — small but >1 so scans are
#: genuinely multi-task.
LAYOUT_FILES = 4


def _render_documents_orc(spark: SparkSession, sf_dir: str) -> str:
    d = scratch_dir("sressentials_orc_docs_")
    out = os.path.join(d, "documents_orc")
    (
        load_table(spark, sf_dir, "documents")
        .repartition(LAYOUT_FILES)
        .write.mode("overwrite")
        .orc(out)
    )
    return out


def ensure_documents_orc(spark: SparkSession, sf_dir: str) -> str:
    """Render (once per session/sf_dir) ``documents`` as ORC."""
    from sressentials_spark.operators.dedup import get_or_build_disk_artifact

    return get_or_build_disk_artifact(
        spark, ("orc_docs", sf_dir), lambda: _render_documents_orc(spark, sf_dir)
    )


def _render_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    d = scratch_dir("sressentials_events_part_")
    out = os.path.join(d, "events_by_day")
    (
        load_table(spark, sf_dir, "events")
        .withColumn("d", F.to_date("ts"))
        # One file per (day) partition directory: repartition on the
        # partition column so the write doesn't emit LAYOUT_FILES tiny
        # files per day (the small-files problem, self-inflicted).
        .repartition("d")
        .write.mode("overwrite")
        .partitionBy("d")
        .parquet(out)
    )
    return out


def ensure_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    """Render (once per session/sf_dir) ``events`` day-partitioned."""
    from sressentials_spark.operators.dedup import get_or_build_disk_artifact

    return get_or_build_disk_artifact(
        spark,
        ("events_partitioned", sf_dir),
        lambda: _render_events_partitioned(spark, sf_dir),
    )


def pruned_week_rollup(
    spark: SparkSession, sf_dir: str, start: str = "2024-01-08", end: str = "2024-01-14"
) -> DataFrame:
    """Per-(day, type) rollup over ONE week of the day-partitioned
    events layout. The ``d`` predicate is a partition filter: Spark
    prunes to the 7 matching ``d=.../`` directories at planning time
    (PartitionFilters in the scan node, pinned by
    tests/test_columnar_layout.py) — the other 23 days' files are
    never listed into tasks, let alone read."""
    path = ensure_events_partitioned(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter((F.col("d") >= F.lit(start)) & (F.col("d") <= F.lit(end)))
        .groupBy("d", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("sum_value"),
        )
    )


def _render_lineitem_clustered(spark: SparkSession, sf_dir: str) -> str:
    d = scratch_dir("sressentials_lineitem_clust_")
    out = os.path.join(d, "lineitem_by_shipdate")
    (
        load_table(spark, sf_dir, "lineitem")
        # Range-cluster on the hot predicate column: files end up with
        # DISJOINT l_shipdate ranges (pinned via parquet footer stats
        # in tests), so a time filter skips whole files/row groups via
        # min/max statistics — the unpartitioned complement of
        # directory pruning (what Delta/Iceberg data-skipping and
        # Z-ordering generalize to several columns).
        .repartitionByRange(2 * LAYOUT_FILES, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def ensure_lineitem_clustered(spark: SparkSession, sf_dir: str) -> str:
    """Render (once per session/sf_dir) ``lineitem`` range-clustered
    on ``l_shipdate``."""
    from sressentials_spark.operators.dedup import get_or_build_disk_artifact

    return get_or_build_disk_artifact(
        spark,
        ("lineitem_clustered", sf_dir),
        lambda: _render_lineitem_clustered(spark, sf_dir),
    )


def clustered_month_rollup(
    spark: SparkSession,
    sf_dir: str,
    start: str = "1997-06-01",
    end: str = "1997-07-01",
) -> DataFrame:
    """Per-day line count + revenue for ONE month of the
    shipdate-clustered lineitem layout. The pushed-down time filter
    meets row groups whose footer min/max are disjoint from the month
    for all but ~1-2 of the files, so the scan READS only those —
    statistics-level skipping with no partition directories at all
    (tests/test_columnar_layout.py pins the disjointness and the
    pushdown)."""
    path = ensure_lineitem_clustered(spark, sf_dir)
    li = spark.read.parquet(path)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                )
                / 100.0
            ).alias("revenue"),
        )
    )
