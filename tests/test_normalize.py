"""Golden tests for N1/N2/N3 — pinned to the reference's *verified*
behavior (SURVEY §2.3: the code wins over its stale tests; e.g. N1
normalizes structural keys like ``"find"`` too)."""

from __future__ import annotations

import pytest

from sressentials_spark.functions import (
    normalize_mongo_command,
    normalize_mysql_query,
    query_time_ms,
)

N1_CASES = [
    (
        '{"find":"mycollection","filter":{"name":"test"},"sort":{"age":-1},"limit":10}',
        '{"find":<value>,"filter":{"name":<value>},"sort":{"age":<value>},"limit":<value>}',
    ),
    (
        '{"find": "c", "filter": {"a": 1, "b": "x"}}',
        '{"find":<value>, "filter": {"a":<value>, "b":<value>}}',
    ),
    ("{}", "{}"),
    ('{"n": 1.5, "b": true, "x": null}', '{"n":<value>, "b":<value>, "x":<value>}'),
    # array values untouched, object values untouched
    ('{"pipeline":[{"$match":{"s":"A"}}],"cursor":{}}', '{"pipeline":[{"$match":{"s":<value>}}],"cursor":{}}'),
]

N2_CASES = [
    ("SELECT * FROM table1 WHERE id = 1;", "SELECT * FROM TABLE1 WHERE ID = ?;"),
    (
        "SELECT name FROM users WHERE status = 'active' AND age > 30;",
        "SELECT NAME FROM USERS WHERE STATUS = ? AND AGE > ?;",
    ),
    # decimals become ?.? ; identifiers are uppercased too
    ("SELECT * FROM products WHERE price = 19.99;", "SELECT * FROM PRODUCTS WHERE PRICE = ?.?;"),
    ("COMMIT;", "COMMIT;"),
]


def _run_one(spark, expr_fn, value):
    return spark.createDataFrame([(value,)], ["q"]).select(expr_fn("q").alias("r")).head()["r"]


@pytest.mark.parametrize("raw,expected", N1_CASES)
def test_normalize_mongo(spark, raw, expected):
    assert _run_one(spark, normalize_mongo_command, raw) == expected


@pytest.mark.parametrize("raw,expected", N2_CASES)
def test_normalize_mysql(spark, raw, expected):
    assert _run_one(spark, normalize_mysql_query, raw) == expected


@pytest.mark.parametrize(
    "raw,expected",
    [("0.000123", 0.123), ("2", 2000.0), ("garbage", 0.0), ("", 0.0)],
)
def test_query_time_ms(spark, raw, expected):
    assert _run_one(spark, query_time_ms, raw) == pytest.approx(expected)
