"""Stable, file-order global row numbering (reference M13/S8).

The reference numbers lines with ``enumerate`` in a single process
(``Mongo/mongo_parser.py:28``, ``MySql/mysqlLogParser.py:52``). In a
distributed engine a faithful 1-based file-order number needs care:

* a global ``row_number()`` window funnels all data through one
  partition — unusable at scale;
* RDD ``zipWithIndex`` / ``mapInPandas`` drag every row through
  Python serde from PySpark — off the codegen fast path.

This implements ``zipWithIndex``'s two-pass scheme entirely JVM-side,
shuffle-free and codegen-friendly:

1. a cheap counting job per partition (only ``numPartitions`` tiny
   rows reach the driver);
2. a narrow projection ``offset[pid] + intra_partition_index + 1``,
   where the intra-partition index is decoded from
   ``monotonically_increasing_id()`` (documented layout: partition id
   in the upper bits, per-partition record counter in the lower 33).

Requires a deterministic input partitioning (file scans are: Spark
orders a single file's splits by offset — equal-length splits keep
their order under the stable by-length sort). Both passes must see the
same partitioning, which holds for file sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PID = "__ssk_pid"

#: Above this many partitions the offsets literal map would bloat the
#: plan; fall back to a broadcast join on partition id.
_MAP_LITERAL_MAX = 1024


def with_row_numbers(df: DataFrame, name: str = "line_no") -> DataFrame:
    """Add a 1-based, input-order row number column without a shuffle.

    Row order follows partition order (file order for text/parquet
    scans). Costs one extra counting pass over the input, like
    ``zipWithIndex`` — but stays inside whole-stage codegen.
    """
    counts = {
        r[_PID]: r["cnt"]
        for r in df.groupBy(F.spark_partition_id().alias(_PID))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    if not counts:
        return df.withColumn(name, F.lit(None).cast("long"))

    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    pid = F.spark_partition_id().cast("long")
    intra = F.monotonically_increasing_id() - F.shiftleft(pid, 33)

    if len(offsets) <= _MAP_LITERAL_MAX:
        pairs = [x for p, off in offsets.items() for x in (F.lit(p), F.lit(off))]
        offset = F.element_at(F.create_map(*pairs), pid.cast("int"))
        return df.withColumn(name, (offset + intra + 1).cast("long"))

    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], f"{_PID} int, __ssk_off long"
    )
    return (
        df.withColumn(_PID, pid.cast("int"))
        .withColumn("__ssk_intra", intra)
        .join(F.broadcast(off_df), _PID, "left")
        .withColumn(name, (F.col("__ssk_off") + F.col("__ssk_intra") + 1).cast("long"))
        .drop(_PID, "__ssk_off", "__ssk_intra")
    )
