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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sressentials_spark.localrel import local_df

_PID = "__ssk_pid"


def fan_out_numbered(df: DataFrame, scan_partitions: int) -> DataFrame:
    """Round-robin repartition an already-NUMBERED scan to the
    session's parallelism when the file split count underfills it.

    A single medium log file splits into only a handful of scan tasks
    (ceil(bytes / maxPartitionBytes)), and everything fused into that
    stage — the envelope parse, routing flags, the persist — is then
    pinned to that many cores (profiled: the 25 MB mongo parse ran 18 s
    of executor time on 6 of 32 cores). Repartitioning AFTER the row
    numbers are assigned keeps the numbering exact (the projection
    stays below the exchange; ``monotonically_increasing_id`` is
    non-deterministic so Catalyst may not move it past the shuffle) and
    spreads the expensive downstream projections across the cluster.
    Scale-adaptive by construction: a 100 TB log directory already
    yields far more splits than cores, and this is a no-op.
    """
    para = df.sparkSession.sparkContext.defaultParallelism
    if scan_partitions >= para:
        return df
    return df.repartition(para)

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
    off_df = local_df(
        spark, [(p, o) for p, o in offsets.items()], f"{_PID} int, __ssk_off long"
    )
    return (
        df.withColumn(_PID, pid.cast("int"))
        .withColumn("__ssk_intra", intra)
        .join(F.broadcast(off_df), _PID, "left")
        .withColumn(name, (F.col("__ssk_off") + F.col("__ssk_intra") + 1).cast("long"))
        .drop(_PID, "__ssk_off", "__ssk_intra")
    )


def with_file_row_numbers(
    df: DataFrame, name: str = "line_no", file_col: str | None = None
) -> DataFrame:
    """Per-FILE 1-based row numbering for multi-file scans.

    The 100 TB shape of :func:`with_row_numbers`: a directory/glob
    input has no meaningful single global order, but "line N of file F"
    is stable and is what log diagnostics reference. Same two-pass
    scheme, keyed by *file fragment*:

    1. one counting pass per ``(partition, input_file_name)`` fragment —
       Spark both packs many small files into one partition and splits
       one large file across many, so neither key alone is enough. Each
       fragment's row count and minimum ``monotonically_increasing_id``
       come back to the driver (fragment count ≈ max(files, splits) —
       tiny relative to data);
    2. driver-side, each file's fragments are ordered by partition id
       (a split file's chunks are equal-length, and the stable
       by-length packing preserves their offset order — the same
       split-ordering property the global scheme relies on) and
       prefix-summed into per-fragment offsets;
    3. a broadcast join on ``(partition_id, file)`` attaches
       ``offset + (mid - fragment_min_mid) + 1`` — the subtraction
       cancels the partition-id high bits, leaving the position within
       the fragment.

    ``file_col`` (optional) additionally exposes the source file path.
    """
    pid = F.spark_partition_id().cast("int")
    # Stage the non-deterministic sources as plain columns first — an
    # aggregate over bare monotonically_increasing_id() is rejected.
    frags = (
        df.select(
            pid.alias(_PID),
            F.input_file_name().alias("__ssk_file"),
            F.monotonically_increasing_id().alias("__ssk_mid"),
        )
        .groupBy(_PID, "__ssk_file")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("__ssk_mid").alias("mi"))
        .collect()
    )
    out = df
    if file_col is not None:
        out = out.withColumn(file_col, F.input_file_name())
    if not frags:
        return out.withColumn(name, F.lit(None).cast("long"))

    offsets: dict[str, int] = {}
    rows = []
    for r in sorted(frags, key=lambda r: (r["__ssk_file"], r[_PID])):
        off = offsets.get(r["__ssk_file"], 0)
        rows.append((r[_PID], r["__ssk_file"], off, r["mi"]))
        offsets[r["__ssk_file"]] = off + r["cnt"]

    off_df = local_df(
        df.sparkSession,
        rows, f"{_PID} int, __ssk_file string, __ssk_off long, __ssk_mi long"
    )
    return (
        out.withColumn(_PID, pid)
        .withColumn("__ssk_file", F.input_file_name())
        .withColumn("__ssk_mid", F.monotonically_increasing_id())
        .join(F.broadcast(off_df), [_PID, "__ssk_file"], "left")
        .withColumn(
            name,
            (F.col("__ssk_off") + (F.col("__ssk_mid") - F.col("__ssk_mi")) + 1).cast(
                "long"
            ),
        )
        .drop(_PID, "__ssk_file", "__ssk_off", "__ssk_mi", "__ssk_mid")
    )


def with_global_rank(
    df: DataFrame,
    cols: list[str],
    name: str = "rank",
    total_name: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based rank over a total order — no global window.

    A bare ``row_number() OVER (ORDER BY ...)`` funnels the whole
    relation through one task ("No Partition Defined"); this computes
    the identical numbering distributively, in ONE plan with no driver
    collect:

    1. stamp each row with a range-bucket id computed BY VALUE: ``P-1``
       approximate-quantile boundaries of the leading sort key (one
       tiny 1-row aggregate, broadcast) and
       ``bucket = #boundaries < key``. Boundary quality only affects
       bucket *balance*, never correctness — and because the bucket is
       a deterministic, order-monotonic function of the row's value,
       every branch of the plan agrees on it (unlike
       ``repartitionByRange``, whose sampled boundaries can differ
       between two physical exchanges of the same logical child);
    2. per-BUCKET ``row_number`` window — every window partition is a
       range bucket, so no single-partition WindowExec touches the
       data;
    3. per-bucket counts are folded into a SINGLE ROW (``collect_list``
       of ≤P tiny (bucket, count) pairs — bounded by cluster config,
       not data) whose higher-order ``aggregate`` produces the prefix
       sums, exploded back to a ≤P-row offsets relation;
    4. a broadcast equi-join attaches each bucket's offset:
       ``rank = offset[bucket] + local row_number``.

    ``cols`` must be a total order (include a unique tie-break) for the
    numbering to be deterministic, and the leading column must be
    orderable by ``percentile_approx`` (numeric/date/timestamp).
    ``total_name`` optionally exposes the relation's row count on every
    row (needed by e.g. NTILE arithmetic) — it rides the same
    broadcast, no extra job.
    """
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    key = cols[0]
    if p >= 2:
        fracs = F.array(*[F.lit(i / p) for i in range(1, p)])
        bounds = df.agg(
            F.sort_array(
                F.percentile_approx(key, fracs, 10000)
            ).alias("__ssk_bounds")
        )
        rs = (
            df.join(F.broadcast(bounds))
            .withColumn(
                # coalesce/greatest: an all-NULL key column yields NULL
                # bounds → NULL/-1 size; pin those rows to bucket 0 (they
                # sort first anyway) so the offsets equi-join keeps them.
                _PID,
                F.greatest(
                    F.lit(0),
                    F.coalesce(
                        F.size(
                            F.filter("__ssk_bounds", lambda b: b < F.col(key))
                        ),
                        F.lit(0),
                    ),
                ).cast("int"),
            )
            .drop("__ssk_bounds")
        )
    else:
        rs = df.withColumn(_PID, F.lit(0))
    counts = rs.groupBy(_PID).agg(F.count(F.lit(1)).alias("__ssk_cnt"))
    folded = counts.agg(
        F.sort_array(F.collect_list(F.struct(_PID, "__ssk_cnt"))).alias("pc")
    ).select(
        F.aggregate(
            "pc",
            F.struct(
                F.lit(0).cast("long").alias("acc"),
                F.array()
                .cast(f"array<struct<{_PID}:int,__ssk_off:bigint>>")
                .alias("offs"),
            ),
            lambda a, x: F.struct(
                (a["acc"] + x["__ssk_cnt"]).alias("acc"),
                F.concat(
                    a["offs"],
                    F.array(
                        F.struct(
                            x[_PID].alias(_PID), a["acc"].alias("__ssk_off")
                        )
                    ),
                ).alias("offs"),
            ),
        ).alias("st")
    )
    offs = folded.select(
        F.explode("st.offs").alias("e"), F.col("st.acc").alias("__ssk_n")
    ).select(
        F.col(f"e.{_PID}").alias(_PID),
        F.col("e.__ssk_off").alias("__ssk_off"),
        "__ssk_n",
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    out = rs.join(F.broadcast(offs), _PID).withColumn(
        name, (F.row_number().over(w) + F.col("__ssk_off")).cast("long")
    )
    if total_name is not None:
        out = out.withColumn(total_name, F.col("__ssk_n"))
    return out.drop(_PID, "__ssk_off", "__ssk_n")
