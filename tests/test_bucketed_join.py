"""Bucketed co-located join: the SCALING.md claim, demonstrated.

Writing both join sides bucketed (and sorted) on the join key lets
Spark plan a sort-merge join with ZERO shuffle exchanges — each bucket
pair joins locally. At 100 TB this converts the dominant cost of every
fact-fact join (two full-corpus shuffles) into a scan; this test pins
the plan shape, not just the row counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sressentials_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    # Table names derived from tmp_path: concurrent runs (pytest-xdist)
    # or stale state from a crashed prior run can never collide with
    # this run's tables in the shared session catalog.
    tag = f"t{abs(hash(str(tmp_path))) % 10**9}"
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable(t_orders)
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .mode("overwrite")
        .saveAsTable(t_lineitem)
    )
    yield t_orders, t_lineitem
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    # Force the sort-merge path: a broadcast join would trivially skip
    # the shuffle and prove nothing about bucketing.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_lineitem).join(
            spark.table(t_orders),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle anywhere
        # And the same join without bucketing DOES shuffle both sides.
        plain = load_table(spark, SF, "lineitem").join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        # Semantics unchanged.
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
