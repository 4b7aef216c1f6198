"""Plan-shape invariants: the Catalyst behaviors SCALING.md relies on,
pinned as assertions on the physical plan rather than prose.

These are the mechanisms that keep the engine 100 TB-shaped: filters
reaching the parquet scan, projection pruning the read schema,
partition pruning skipping files, and dimension tables broadcasting
instead of shuffling the fact side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sressentials_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    df = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1].split("]")[0]
    # ReadSchema carries only the needed columns, not the full table.
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_comment" not in read_schema


def test_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    load_table(spark, SF, "events").write.partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(df)
    part_filters = plan.split("PartitionFilters")[1].split("]")[0]
    assert "event_type" in part_filters  # pruning happens at the scan
    # Pruned scan returns exactly the one partition's rows.
    expect = (
        load_table(spark, SF, "events").filter(F.col("event_type") == "click").count()
    )
    assert df.count() == expect


def test_star_join_broadcasts_dimensions(spark):
    from sressentials_spark.catalog import QUERIES

    plan = _plan(QUERIES["join_revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan  # dims ride broadcast, fact never shuffles for them
