"""Write-side sinks: partitioned and bucketed parquet output.

The reference's only sink is a driver-side Excel workbook
(``Mongo/mongo_parser.py:134-143``, ``MySql/mysqlLogParser.py:137-144``
— handled by :mod:`sressentials_spark.report`). At 100 TB the results
that matter (dedup verdicts, curation scores, packed shards) are
themselves large tables consumed by *further* joins, so the write side
is part of the engine:

* :func:`write_partitioned` — directory-partitioned parquet. Reads
  that filter on the partition column prune whole directories before
  any I/O (partition pruning is Catalyst-native for parquet sources).
  Use for low-cardinality routing columns: ``split``, ``lang``, date.

* :func:`write_bucketed` — hash-bucketed (and sorted) table via
  ``bucketBy``/``saveAsTable``. Both sides of a downstream equi-join
  written with the same bucket spec join with ZERO shuffle exchanges:
  Spark plans a sort-merge join whose children are already
  co-partitioned by bucket file. This converts the dominant cost of
  every fact-fact join (two full-corpus shuffles) into a scan — the
  intended consumption pattern for ``connected_components`` output
  (``join canonical_id verdicts back to documents on doc_id``), which
  is pinned by ``tests/test_sinks.py``.

Bucket-count sizing: buckets are fixed at write time and each bucket
is one file per writing task's output split, so pick
``num_buckets ≈ table_bytes / 256 MB`` at the target scale; both join
sides must use the SAME count (or one a divisor of the other with AQE)
for the shuffle-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet write (reads prune on
    ``partition_cols`` predicates before any file I/O)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    num_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed parquet table registered in the session catalog.

    ``sort=True`` additionally sorts each bucket file on ``keys`` so
    the downstream sort-merge join skips its per-partition sort as
    well (the plan is scan → merge-join, nothing else).
    """
    w = df.write.bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.option("path", path).mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table WITH its bucket metadata (a bare
    ``spark.read.parquet(path)`` would lose the bucket spec and
    reintroduce the shuffle)."""
    return spark.table(table)
