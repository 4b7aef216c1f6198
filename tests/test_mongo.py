"""Component tests for the Mongo plan against the hand-computed golden
expectations of the fixture log (reference semantics, SURVEY §2/§5)."""

from __future__ import annotations

import pytest

from sressentials_spark.plans.mongo import analyze_mongo_log
from tests.log_fixtures import (
    ERROR_1,
    FIND_PATTERN,
    MONGO_LOG,
    NOISE,
    SLOW_FIND_1,
)


@pytest.fixture(scope="module")
def sheets(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("mongo") / "mongod.log"
    path.write_text(MONGO_LOG)
    out = analyze_mongo_log(spark, str(path))
    yield {k: df.collect() for k, df in out.items()}


def test_detailed_rows(sheets):
    rows = sheets["detailed"]
    assert len(rows) == 5
    assert [r["Duration(ms)"] for r in rows] == [150, 250, 500, 700, 50]
    r0 = rows[0]
    assert r0["Command"] == '{"find":"mycollection","filter":{"name":"test"},"sort":{"age":-1},"limit":10}'
    assert r0["Collection"] == "mycollection"
    assert r0["AppName"] == "testdb"
    assert r0["KeysExamined"] == 0
    assert r0["DocsExamined"] == 1000
    assert r0["numYields"] == 1
    assert r0["nreturned"] == 10
    assert r0["Filter"] == '{"name":"test"}'
    assert r0["Plan"] == "COLLSCAN"
    assert r0["timestamp"] == "2023-10-25T10:00:00.000Z"


def test_detailed_filter_extraction(sheets):
    rows = sheets["detailed"]
    # aggregate with $match in first stage
    assert rows[2]["Filter"] == '{"status":"A"}'
    # complex pipeline fallback (byte-identical to reference json.dumps)
    assert rows[3]["Filter"] == '{"pipeline_info": "Complex pipeline, see full command"}'
    # slow line without command/ns
    assert rows[4]["Command"] == "{}"
    assert rows[4]["Filter"] == "{}"
    assert rows[4]["Collection"] == "N/A"
    assert rows[4]["AppName"] == ""


def test_query_stats(sheets):
    rows = sheets["query_stats"]
    assert len(rows) == 4
    top = rows[0]
    assert top["Query Pattern"] == FIND_PATTERN
    assert top["Executions"] == 2
    assert top["Min Duration(ms)"] == 150
    assert top["Max Duration(ms)"] == 250
    assert top["Avg Duration(ms)"] == 200.0
    # first-in-file-order sample, deterministic via min_by(line_no)
    assert top["Sample Full Query"] == '{"find":"mycollection","filter":{"name":"test"},"sort":{"age":-1},"limit":10}'
    # remaining singletons ordered by Avg Duration desc: 700, 500, 50
    assert [r["Avg Duration(ms)"] for r in rows[1:]] == [700.0, 500.0, 50.0]


def test_error_rollup(sheets):
    rows = sheets["errors"]
    assert len(rows) == 2
    first = rows[0]
    assert first["OriginalLineNumber"] == 3
    assert first["msg"] == "Connection error"
    assert first["error"] == "HostUnreachable"
    assert first["errmsg"] == "Connection refused"
    assert first["totalCount"] == 2
    assert first["SampleLine"] == ERROR_1
    second = rows[1]
    assert second["OriginalLineNumber"] == 11
    assert second["msg"] == "Slow query"  # slow line is ALSO an error line
    assert second["error"] == "MaxTimeMSExpired"
    assert second["totalCount"] == 1


def test_non_slow_passthrough(sheets):
    rows = sheets["non_slow"]
    assert [r["LogLine"] for r in rows] == [NOISE]


def test_parse_errors(sheets):
    msgs = [r["message"] for r in sheets["parse_errors"]]
    assert msgs == [
        "Line 5: Invalid JSON. Skipped.",
        "Line 6: Invalid JSON. Skipped.",
        "Line 7: Invalid JSON. Skipped.",
    ]


def test_empty_input(spark, tmp_path):
    p = tmp_path / "empty.log"
    p.write_text("")
    out = analyze_mongo_log(spark, str(p))
    assert all(len(df.collect()) == 0 for df in out.values())


def test_multi_file_directory_per_file_numbering(spark, tmp_path):
    """A log DIRECTORY (the 100 TB layout) reads with per-file line
    numbers and a src_file column."""
    from sressentials_spark.sources.mongo_log import read_mongo_log

    d = tmp_path / "logs"
    d.mkdir()
    (d / "node1.log").write_text(MONGO_LOG)
    (d / "node2.log").write_text("\n".join(MONGO_LOG.splitlines()[:4]))
    out = read_mongo_log(spark, str(d), per_file=True).collect()
    n1 = len(MONGO_LOG.splitlines())
    for fname, n in (("node1.log", n1), ("node2.log", 4)):
        nos = sorted(
            r["line_no"] for r in out if r["src_file"].endswith(fname)
        )
        assert nos == list(range(1, n + 1))


def test_sheets_dict_has_no_private_entries(sheets):
    assert set(sheets) == {
        "detailed", "query_stats", "non_slow", "errors", "parse_errors"
    }


def test_degenerate_error_routing(spark, tmp_path):
    """Raw-presence error-route parity (Mongo/mongo_parser.py:72-94).

    Expected values in the fixture module were produced by executing
    the reference on the same lines: predicate TypeErrors and
    error-block AttributeErrors land in the parse-error channel with
    CPython's message text, only object-valued errors reach the error
    sheet, and field defaulting is key-presence-based.
    """
    from tests.log_fixtures import (
        MONGO_DEGENERATE_ERROR_ROWS,
        MONGO_DEGENERATE_LINES,
        MONGO_DEGENERATE_NON_SLOW,
        MONGO_DEGENERATE_PARSE_ERRORS,
    )

    p = tmp_path / "degenerate.log"
    p.write_text("\n".join(MONGO_DEGENERATE_LINES))
    out = analyze_mongo_log(spark, str(p), cache=False)

    msgs = [r["message"] for r in out["parse_errors"].collect()]
    assert msgs == MONGO_DEGENERATE_PARSE_ERRORS

    err = [
        (r["OriginalLineNumber"], r["msg"], r["error"], r["errmsg"])
        for r in out["errors"].collect()
    ]
    assert err == MONGO_DEGENERATE_ERROR_ROWS

    assert [r["LogLine"] for r in out["non_slow"].collect()] == MONGO_DEGENERATE_NON_SLOW
