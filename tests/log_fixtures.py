"""Synthetic log fixtures mirroring the reference's test inputs
(FIXTURES.md §F1/§F2) with hand-computed golden expectations.

JSON lines are written compactly (no spaces) so raw-text JSON
extraction is byte-predictable.
"""

from __future__ import annotations

# --- MongoDB fixture (1-based line numbers in comments) ---

SLOW_FIND_1 = (
    '{"t":{"$date":"2023-10-25T10:00:00.000Z"},"s":"I","c":"COMMAND","id":12345,"ctx":"conn1",'
    '"msg":"Slow query","attr":{"type":"command","ns":"testdb.mycollection",'
    '"command":{"find":"mycollection","filter":{"name":"test"},"sort":{"age":-1},"limit":10},'
    '"planSummary":"COLLSCAN","keysExamined":0,"docsExamined":1000,"numYields":1,"nreturned":10,'
    '"durationMillis":150}}'
)
NOISE = (
    '{"t":{"$date":"2023-10-25T10:00:30.000Z"},"s":"I","c":"NETWORK","id":22943,"ctx":"conn2",'
    '"msg":"Connection accepted","attr":{"remote":"127.0.0.1:54321"}}'
)
ERROR_1 = (
    '{"t":{"$date":"2023-10-25T10:01:00.000Z"},"s":"E","c":"NETWORK","id":4712,"ctx":"conn3",'
    '"msg":"Connection error","attr":{"error":{"code":7,"codeName":"HostUnreachable",'
    '"errmsg":"Connection refused"}}}'
)
SLOW_FIND_2 = (
    '{"t":{"$date":"2023-10-25T10:02:00.000Z"},"s":"I","c":"COMMAND","id":12346,"ctx":"conn1",'
    '"msg":"Slow query","attr":{"type":"command","ns":"testdb.mycollection",'
    '"command":{"find":"mycollection","filter":{"name":"zzz"},"sort":{"age":-1},"limit":99},'
    '"planSummary":"IXSCAN { age: -1 }","keysExamined":99,"docsExamined":99,"numYields":0,'
    '"nreturned":99,"durationMillis":250}}'
)
INVALID = "This is not a JSON line"
SLOW_AGG_MATCH = (
    '{"t":{"$date":"2023-10-25T10:05:00.000Z"},"s":"I","c":"COMMAND","id":12400,"ctx":"conn4",'
    '"msg":"Slow query","attr":{"type":"command","ns":"testdb.agg",'
    '"command":{"aggregate":"agg","pipeline":[{"$match":{"status":"A"}},{"$group":{"_id":1}}],"cursor":{}},'
    '"planSummary":"COLLSCAN","keysExamined":0,"docsExamined":5000,"numYields":3,"nreturned":12,'
    '"durationMillis":500}}'
)
SLOW_AGG_COMPLEX = (
    '{"t":{"$date":"2023-10-25T10:06:00.000Z"},"s":"I","c":"COMMAND","id":12401,"ctx":"conn4",'
    '"msg":"Slow query","attr":{"type":"command","ns":"testdb.agg",'
    '"command":{"aggregate":"agg","pipeline":[{"$group":{"_id":1}}],"cursor":{}},'
    '"planSummary":"COLLSCAN","keysExamined":0,"docsExamined":7000,"numYields":4,"nreturned":1,'
    '"durationMillis":700}}'
)
ERROR_2 = ERROR_1.replace("10:01:00", "10:08:00")  # same error group, later line
SLOW_AND_ERROR = (
    '{"t":{"$date":"2023-10-25T10:09:00.000Z"},"s":"E","c":"COMMAND","id":12500,"ctx":"conn5",'
    '"msg":"Slow query","attr":{"error":{"code":50,"codeName":"MaxTimeMSExpired",'
    '"errmsg":"operation exceeded time limit"},"durationMillis":50}}'
)

MONGO_LINES = [
    SLOW_FIND_1,  # 1  slow
    NOISE,  # 2  passthrough
    ERROR_1,  # 3  error
    SLOW_FIND_2,  # 4  slow (same pattern as 1)
    INVALID,  # 5  parse error
    "",  # 6  parse error
    "   ",  # 7  parse error
    SLOW_AGG_MATCH,  # 8  slow
    SLOW_AGG_COMPLEX,  # 9  slow
    ERROR_2,  # 10 error (same group as 3)
    SLOW_AND_ERROR,  # 11 slow AND error
]
MONGO_LOG = "\n".join(MONGO_LINES)

FIND_PATTERN = '{"find":<value>,"filter":{"name":<value>},"sort":{"age":<value>},"limit":<value>}'

# --- Degenerate error-route fixture (raw-presence parity) ---
#
# Expected outputs were produced by EXECUTING the reference
# ``parse_log_lines`` (Mongo/mongo_parser.py:72-94) on these exact
# lines: the raw-presence predicate either crashes mid-evaluation
# (TypeError on a non-iterable ``attr``), crashes in the error block
# (AttributeError on a non-dict ``error``), or admits the line with
# presence-based field defaulting (absent key -> 'N/A', null -> None).

MONGO_DEGENERATE_LINES = [
    '{"t":{"$date":"T1"},"s":"E","msg":"Connection error","attr":{"error":null}}',
    '{"t":{"$date":"T2"},"s":"E","msg":"Connection error","attr":{"error":"oops"}}',
    '{"t":{"$date":"T3"},"s":"E","msg":"Connection error","attr":null}',
    '{"t":{"$date":"T4"},"s":"E","msg":"Connection error","attr":"an error string"}',
    '{"t":{"$date":"T5"},"s":"E","msg":"Connection error","attr":"benign string"}',
    '{"t":{"$date":"T6"},"s":"E","msg":"Connection error","attr":{"error":5}}',
    '{"t":{"$date":"T7"},"s":"E","msg":"Connection error","attr":{"error":["error"]}}',
    '{"t":{"$date":"T8"},"s":"E","msg":null,"attr":{"error":{"codeName":"X"}}}',
    '{"t":{"$date":"T9"},"s":"E","msg":"Connection error","attr":{"error":{"errmsg":"no codeName key"}}}',
    '{"t":{"$date":"TA"},"s":"E","msg":"Connection error","attr":{"error":{"codeName":null,"errmsg":"null codeName"}}}',
    '{"t":{"$date":"TB"},"s":"E","msg":"Connection error","attr":["error"]}',
    '{"t":{"$date":"TC"},"s":"E","msg":"Connection error","attr":7}',
]

#: Reference parse_errors for MONGO_DEGENERATE_LINES (verified by run).
MONGO_DEGENERATE_PARSE_ERRORS = [
    "Line 1: Error parsing line: 'NoneType' object has no attribute 'get'. Skipped.",
    "Line 2: Error parsing line: 'str' object has no attribute 'get'. Skipped.",
    "Line 3: Error parsing line: argument of type 'NoneType' is not iterable. Skipped.",
    "Line 4: Error parsing line: 'str' object has no attribute 'get'. Skipped.",
    "Line 6: Error parsing line: 'int' object has no attribute 'get'. Skipped.",
    "Line 7: Error parsing line: 'list' object has no attribute 'get'. Skipped.",
    "Line 11: Error parsing line: 'list' object has no attribute 'get'. Skipped.",
    "Line 12: Error parsing line: argument of type 'int' is not iterable. Skipped.",
]

#: Reference error sheet (OriginalLineNumber, msg, error, errmsg) —
#: msg None for present-but-null; codeName 'N/A' only when ABSENT.
MONGO_DEGENERATE_ERROR_ROWS = [
    (8, None, "X", "N/A"),
    (9, "Connection error", "N/A", "no codeName key"),
    (10, "Connection error", None, "null codeName"),
]

#: Reference passthrough: only the benign-string line survives.
MONGO_DEGENERATE_NON_SLOW = [MONGO_DEGENERATE_LINES[4]]

# --- MySQL fixture ---


def _entry(time, qt, query, user="root[root] @ localhost []", lock="0.000010", sent="1", exam="100", ts="1698314400"):
    return (
        f"# Time: {time}\n"
        f"# User@Host: {user} thread_id: 1 server_id: 1\n"
        f"# Query_time: {qt} Lock_time: {lock} Rows_sent: {sent} Rows_examined: {exam}\n"
        f"SET timestamp={ts};\n"
        f"{query}"
    )


MYSQL_PREAMBLE = "/usr/sbin/mysqld, Version: 8.0.30 started with:\nTcp port: 3306\n"
E1 = _entry("231026 10:00:00", "0.000123", "SELECT * FROM table1 WHERE id = 1;")
E2 = _entry("231026 10:01:00", "0.002000", "SELECT name FROM users WHERE status = 'active' AND age > 30;")
E3 = _entry("231026 10:02:00", "0.001000", "COMMIT;")
E4 = _entry(
    "231026 10:03:00",
    "0.500000",
    "SELECT a, b,\n COUNT(*) AS n FROM t2\nGROUP BY a, b\nORDER BY a;",
)
E5 = _entry("231026 10:04:00", "0.000077", "SELECT * FROM table1 WHERE id = 42;")
E6_BROKEN = (
    "# Time: 231026 10:05:00\n"
    "# User@Host: root[root] @ localhost [] thread_id: 1 server_id: 1\n"
    "SET timestamp=1698314700;\n"
    "SELECT 1;"
)  # no Query_time/Lock_time/Rows_* line -> skipped with warning (entry 6)
E7 = _entry("231026 10:06:00", "0.250000", "SELECT * FROM products WHERE price = 19.99;")

MYSQL_LOG = MYSQL_PREAMBLE + "\n".join([E1, E2, E3, E4, E5, E6_BROKEN, E7]) + "\n"
