"""Component tests for the MySQL plan against hand-computed golden
expectations (reference semantics incl. verified divergences: COMMIT
entries ARE captured, Lock_time/Rows_* stay strings)."""

from __future__ import annotations

import pytest

from sressentials_spark.plans.mysql import analyze_mysql_log
from tests.log_fixtures import MYSQL_LOG


@pytest.fixture(scope="module")
def sheets(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("mysql") / "slow.log"
    path.write_text(MYSQL_LOG)
    out = analyze_mysql_log(spark, str(path))
    yield {k: df.collect() for k, df in out.items()}


def test_detailed(sheets):
    rows = sheets["detailed"]
    assert len(rows) == 6  # e6 skipped
    r0 = rows[0]
    assert r0["Time"] == "231026 10:00:00"
    assert r0["User@Host"] == "root[root] @ localhost []"
    assert r0["Query_time (ms)"] == pytest.approx(0.123)
    assert r0["Lock_time"] == "0.000010"  # string, not cast
    assert r0["Rows_sent"] == "1"
    assert r0["Rows_examined"] == "100"
    assert r0["Query"] == "SELECT * FROM table1 WHERE id = 1;"
    assert r0["Normalized_Query"] == "SELECT * FROM TABLE1 WHERE ID = ?;"
    assert [r["Query_time (ms)"] for r in rows] == pytest.approx([0.123, 2.0, 1.0, 500.0, 0.077, 250.0])
    # COMMIT-only entry IS captured (reference behavior, verified)
    assert rows[2]["Query"] == "COMMIT;"
    # multi-line query preserved verbatim
    assert rows[3]["Query"] == "SELECT a, b,\n COUNT(*) AS n FROM t2\nGROUP BY a, b\nORDER BY a;"


def test_aggregate(sheets):
    rows = sheets["aggregate"]
    pats = [r["Normalized_Query"] for r in rows]
    # ascending by pattern — pandas groupby(sort=True) parity (S7)
    assert pats == sorted(pats)
    assert len(rows) == 5
    by_pat = {r["Normalized_Query"]: r for r in rows}
    dup = by_pat["SELECT * FROM TABLE1 WHERE ID = ?;"]
    assert dup["Executions"] == 2
    assert dup["Min_Query_time_ms"] == pytest.approx(0.077)
    assert dup["Max_Query_time_ms"] == pytest.approx(0.123)
    assert dup["Avg_Query_time_ms"] == pytest.approx(0.1)
    assert dup["Sample_Query"] == "SELECT * FROM table1 WHERE id = 1;"
    assert by_pat["SELECT * FROM PRODUCTS WHERE PRICE = ?.?;"]["Executions"] == 1
    assert "COMMIT;" in by_pat


def test_warnings(sheets):
    rows = sheets["warnings"]
    assert len(rows) == 1
    msg = rows[0]["message"]
    assert msg.startswith("Skipped log entry 6 due to missing fields. Details: ")
    assert "T:True, UH:True, QT:False, LT:False, RS:False, RE:False, Q:True" in msg
    assert rows[0]["entry_no"] == 6


def test_no_preamble(spark, tmp_path):
    """File starting directly with '# Time: ' — no entry-number shift."""
    from tests.log_fixtures import E1

    p = tmp_path / "nopre.log"
    p.write_text(E1 + "\n")
    out = analyze_mysql_log(spark, str(p))
    rows = out["detailed"].collect()
    assert len(rows) == 1
    assert rows[0]["Query"] == "SELECT * FROM table1 WHERE id = 1;"


def test_empty_input(spark, tmp_path):
    p = tmp_path / "empty.log"
    p.write_text("")
    out = analyze_mysql_log(spark, str(p))
    assert all(len(df.collect()) == 0 for df in out.values())
