"""SQL-UDF surface: the declared SQL functions must agree with the
DataFrame originals on adversarial inputs, and must stay on the
codegen path (expression inlining, no Python evaluation node)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sressentials_spark.functions.normalize import (
    normalize_mongo_command,
    normalize_mysql_query,
    query_time_ms,
    strip_ws,
)
from sressentials_spark.functions.sql_registry import register_sql_functions
from sressentials_spark.operators.dedup import md5_long

SAMPLES = [
    '{"find": "users", "filter": {"age": 42, "name": "bob"}}',
    "SELECT * FROM t WHERE id = 123 AND name = 'x''y'",
    "  padded\twith\nwhitespace\x0b\x0c  ",
    "",
    "no specials",
    "Query_time: 1.25",
    "-3.5",
    "not a number",
    "unicode héé 42 'août'",
]


def test_sql_functions_match_dataframe_originals(spark):
    names = register_sql_functions(spark)
    assert names == [
        "sre_md5_60bit",
        "sre_normalize_mongo",
        "sre_normalize_mysql",
        "sre_query_time_ms",
        "sre_strip",
    ]
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    df.createOrReplaceTempView("sql_registry_samples")
    via_sql = spark.sql(
        """
        SELECT sre_normalize_mongo(s) AS n1,
               sre_normalize_mysql(s) AS n2,
               sre_query_time_ms(s) AS n3,
               sre_strip(s) AS n5,
               sre_md5_60bit(s) AS h
        FROM sql_registry_samples
        """
    ).collect()
    via_df = df.select(
        normalize_mongo_command("s").alias("n1"),
        normalize_mysql_query("s").alias("n2"),
        query_time_ms("s").alias("n3"),
        strip_ws("s").alias("n5"),
        md5_long(F.col("s")).alias("h"),
    ).collect()
    assert via_sql == via_df


def test_sql_functions_inline_into_codegen(spark):
    register_sql_functions(spark)
    df = spark.createDataFrame([("a 1 b",)], "s string")
    df.createOrReplaceTempView("sql_registry_one")
    plan = (
        spark.sql("SELECT sre_normalize_mysql(s) FROM sql_registry_one")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # A declared SQL UDF inlines as an expression: no Python runner
    # node may appear in the physical plan.
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
