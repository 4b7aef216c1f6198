"""Deterministic log-corpus generator derived from the ``events`` table.

The reference engine consumes log *files* (MongoDB structured JSON log,
MySQL slow-query log — FIXTURES.md §F1/§F2), while the driver's
correctness oracle runs DuckDB SQL over the parquet *tables*. This
module bridges the two: every ``events`` row is rendered into exactly
one log line / entry by **DuckDB SQL expressions**, and the very same
SQL fragments are reused by the oracle queries in
``sressentials_spark.catalog``. Generator and oracle therefore agree
byte-for-byte by construction, and the Spark log pipelines
(:mod:`sressentials_spark.plans`) are exercised end-to-end — scan,
JSON/regex parse, routing, normalization, aggregation — against an
independent relational restatement of the same facts.

Row → record mapping (all derived columns are integer/string exact, so
oracle comparisons are never at the mercy of float summation order):

* ``event_type`` in (click, view)  → Mongo "Slow query" ``find``;
* purchase                         → Mongo "Slow query" ``aggregate``
  (exercises the ``pipeline[0].$match`` Filter extraction, M8);
* signup                           → valid noise line (passthrough M5);
* error                            → ``s:"E"`` error line (M4/M11);
* ``event_id % 41 == 0``           → malformed line (parse errors M14).

For MySQL, the same partition: click/view/purchase → well-formed
entries (single-line, string-literal, and multi-line queries), signup →
``COMMIT;``-only entry, error → entry *missing* the ``# Query_time:``
line (skip-warning path S4/S9).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import duckdb

#: events rows with ``event_id % MALFORMED_MOD == 0`` become malformed
#: Mongo log lines (parse-error channel).
MALFORMED_MOD = 41

# --------------------------------------------------------------------------
# Shared DuckDB SQL fragments (also used by catalog.py oracles)
# --------------------------------------------------------------------------

#: Derived per-event columns for the Mongo log (DuckDB SQL, reads ``events``).
MONGO_EV = f"""
SELECT event_id,
       event_id + 1                                   AS line_no,
       user_id,
       event_type,
       ts,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z'    AS tss,
       CAST(json_extract(props, '$.k') AS BIGINT)     AS k,
       event_id % 1000 + 1                            AS dur,
       user_id                                        AS keys_ex,
       user_id * 10                                   AS docs_ex,
       event_id % 5                                   AS yields,
       event_id % 20                                  AS nret,
       CASE WHEN event_id % 2 = 0 THEN 'COLLSCAN'
            ELSE 'IXSCAN {{ user_id: 1 }}' END        AS plan,
       'app' || (user_id % 3)                         AS appname,
       CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS errcode,
       event_id % {MALFORMED_MOD} = 0                 AS malformed
FROM events
"""

#: Mongo command JSON (compact — matches Spark ``get_json_object`` output).
MONGO_CMD = """
CASE WHEN event_type = 'purchase' THEN
  '{"aggregate":"sales","pipeline":[{"$match":{"user_id":' || user_id ||
  '}},{"$group":{"_id":"$region","total":{"$sum":"$amount"}}}],"cursor":{}}'
ELSE
  '{"find":"coll_' || event_type || '","filter":{"user_id":' || user_id ||
  '},"limit":' || k || '}'
END
"""

MONGO_COLLECTION = (
    "CASE WHEN event_type = 'purchase' THEN 'sales' ELSE 'coll_' || event_type END"
)

#: The Filter column (M8) — identical for finds ($.filter) and
#: aggregates ($.pipeline[0].$match) by construction.
MONGO_FILTER = """'{"user_id":' || user_id || '}'"""

#: Query Pattern literals: reference normalizer N1 applied to MONGO_CMD
#: (value-independent; computed with the public regex and pinned by
#: tests/test_loggen.py).
MONGO_FIND_PATTERN = '{"find":<value>,"filter":{"user_id":<value>},"limit":<value>}'
MONGO_AGG_PATTERN = (
    '{"aggregate":<value>,"pipeline":[{"$match":{"user_id":<value>}},'
    '{"$group":{"_id":<value>,"total":{"$sum":<value>}}}],"cursor":{}}'
)
MONGO_PATTERN = f"""
CASE WHEN event_type = 'purchase' THEN '{MONGO_AGG_PATTERN}'
     ELSE '{MONGO_FIND_PATTERN}' END
"""

_SLOW_LINE = f"""
'{{"t":{{"$date":"' || tss || '"}},"s":"I","c":"COMMAND","msg":"Slow query","attr":{{"ns":"'
 || appname || '.' || {MONGO_COLLECTION} ||
 '","durationMillis":' || dur ||
 ',"keysExamined":' || keys_ex ||
 ',"docsExamined":' || docs_ex ||
 ',"numYields":' || yields ||
 ',"nreturned":' || nret ||
 ',"planSummary":"' || plan ||
 '","command":' || ({MONGO_CMD}) || '}}}}'
"""

#: Error line raw text (also the SampleLine of the error rollup).
MONGO_ERR_LINE = """
'{"t":{"$date":"' || tss || '"},"s":"E","c":"NETWORK","msg":"Connection error",'
 || '"attr":{"error":{"code":' || errcode || ',"codeName":"E' || errcode ||
 '","errmsg":"network error ' || errcode || '"}}}'
"""

#: Noise line raw text (also the LogLine of the passthrough sheet).
MONGO_NOISE_LINE = """
'{"t":{"$date":"' || tss || '"},"s":"I","c":"ACCESS","msg":"client metadata",'
 || '"attr":{"client":"conn' || event_id || '"}}'
"""

MONGO_RAW = f"""
CASE WHEN malformed THEN 'garbage line ' || event_id || ' %%'
     WHEN event_type = 'error' THEN {MONGO_ERR_LINE}
     WHEN event_type = 'signup' THEN {MONGO_NOISE_LINE}
     ELSE {_SLOW_LINE}
END
"""

# --- MySQL ----------------------------------------------------------------

#: Derived per-event columns for the MySQL slow log.
MYSQL_EV = """
SELECT event_id,
       event_id + 1                                          AS entry_no,
       user_id,
       event_type,
       strftime(ts, '%y%m%d %H:%M:%S')                       AS tstr,
       'app_user[app] @ host-' || (user_id % 7) || ' []'     AS uh,
       printf('%.6f', (event_id % 500 + 1) / 8.0)            AS qt_str,
       CAST(printf('%.6f', (event_id % 500 + 1) / 8.0) AS DOUBLE) * 1000.0
                                                             AS qt_ms,
       printf('0.%06d', user_id % 1000)                      AS lock_str,
       CAST(user_id % 100 AS VARCHAR)                        AS rows_sent,
       CAST(user_id * 3 AS VARCHAR)                          AS rows_ex,
       CAST(epoch(ts) AS BIGINT)                             AS epoch_s
FROM events
"""

#: Query text per event type (DuckDB SQL; chr(10) = newline).
MYSQL_QUERY = """
CASE WHEN event_type = 'click' THEN
       'SELECT * FROM table1 WHERE id = ' || event_id || ';'
     WHEN event_type = 'view' THEN
       'SELECT name, status FROM users WHERE status = ''st_' || (user_id % 5) ||
       ''' AND age > ' || (user_id % 40) || ';'
     WHEN event_type = 'purchase' THEN
       'SELECT p_brand, SUM(l_extendedprice) AS rev' || chr(10) ||
       'FROM lineitem JOIN part ON l_partkey = p_partkey' || chr(10) ||
       'WHERE l_discount > 0.05 AND l_quantity < ' || (user_id % 30) || chr(10) ||
       'GROUP BY p_brand' || chr(10) ||
       'ORDER BY rev DESC;'
     ELSE 'COMMIT;'
END
"""

#: Normalized-query literals (reference normalizer N2, value-independent;
#: pinned by tests/test_loggen.py).
MYSQL_NQ = """
CASE WHEN event_type = 'click' THEN 'SELECT * FROM TABLE1 WHERE ID = ?;'
     WHEN event_type = 'view' THEN
       'SELECT NAME, STATUS FROM USERS WHERE STATUS = ? AND AGE > ?;'
     WHEN event_type = 'purchase' THEN
       'SELECT P_BRAND, SUM(L_EXTENDEDPRICE) AS REV' || chr(10) ||
       'FROM LINEITEM JOIN PART ON L_PARTKEY = P_PARTKEY' || chr(10) ||
       'WHERE L_DISCOUNT > ?.? AND L_QUANTITY < ?' || chr(10) ||
       'GROUP BY P_BRAND' || chr(10) ||
       'ORDER BY REV DESC;'
     ELSE 'COMMIT;'
END
"""

_MYSQL_HEADER = """
'# Time: ' || tstr || chr(10) ||
'# User@Host: ' || uh || ' thread_id: ' || event_id || ' server_id: 1' || chr(10)
"""

_MYSQL_METRICS = """
'# Query_time: ' || qt_str || ' Lock_time: ' || lock_str ||
' Rows_sent: ' || rows_sent || ' Rows_examined: ' || rows_ex || chr(10)
"""

_MYSQL_SET = "'SET timestamp=' || epoch_s || ';' || chr(10)"

#: Full entry text. ``error`` events omit the ``# Query_time:`` line →
#: the all-fields-required gate (S4) skips them with a warning (S9).
MYSQL_ENTRY = f"""
CASE WHEN event_type = 'error'
     THEN {_MYSQL_HEADER} || {_MYSQL_SET} || 'SELECT 1;'
     ELSE {_MYSQL_HEADER} || {_MYSQL_METRICS} || {_MYSQL_SET} || ({MYSQL_QUERY})
END
"""

#: The entry text of a skipped (``error``-type) record — reused by the
#: skip-warning oracle to rebuild the content snippet.
MYSQL_SKIP_ENTRY = f"{_MYSQL_HEADER} || {_MYSQL_SET} || 'SELECT 1;'"

MYSQL_PREAMBLE = (
    "/usr/sbin/mysqld, Version: 8.0.33 (Server). started with:\n"
    "Tcp port: 3306 Unix socket: /var/run/mysqld/mysqld.sock\n"
    "Time Id Command Argument"
)


# --------------------------------------------------------------------------
# Generators
# --------------------------------------------------------------------------

def _cache_dir() -> str:
    return os.path.join(tempfile.gettempdir(), "sressentials_loggen")


def _events_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    path = os.path.join(sf_dir, "events.parquet")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    return con


def _docs_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
    return con


def _generate(
    sf_dir: str,
    name: str,
    sql: str,
    preamble: str | None = None,
    src_name: str = "events.parquet",
    con_factory=None,
) -> str:
    """Render one line/entry per event (event_id order) into a cached file.

    Each log lives in its own subdirectory (``<tag>/<stem>/<name>``) so
    streaming file sources can consume the parent directory.
    """
    norm = os.path.abspath(os.path.normpath(sf_dir))
    # Key the cache on the FULL source path (two sf_dirs sharing a
    # basename must not collide) and invalidate when events.parquet is
    # newer than the rendered log (a regenerated dataset must never
    # silently reuse a stale fixture).
    tag = f"{os.path.basename(norm)}-{hashlib.md5(norm.encode()).hexdigest()[:10]}"
    out_dir = os.path.join(_cache_dir(), tag, name.split(".")[0])
    path = os.path.join(out_dir, name)
    src = os.path.join(norm, src_name)
    if os.path.exists(path) and (
        not os.path.exists(src) or os.path.getmtime(path) >= os.path.getmtime(src)
    ):
        return path
    os.makedirs(out_dir, exist_ok=True)
    con = (con_factory or _events_con)(sf_dir)
    rows = con.execute(sql).fetchall()
    con.close()
    parts = [] if preamble is None else [preamble]
    parts.extend(r[0] for r in rows)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(parts))
    os.replace(tmp, path)
    return path


def ensure_mongo_log(sf_dir: str) -> str:
    """Generate (once) and return the Mongo JSON log for ``sf_dir``."""
    sql = f"WITH ev AS ({MONGO_EV}) SELECT {MONGO_RAW} FROM ev ORDER BY event_id"
    return _generate(sf_dir, "mongod.log", sql)


def ensure_mysql_log(sf_dir: str) -> str:
    """Generate (once) and return the MySQL slow log for ``sf_dir``."""
    sql = f"WITH ev AS ({MYSQL_EV}) SELECT {MYSQL_ENTRY} FROM ev ORDER BY event_id"
    return _generate(sf_dir, "mysql-slow.log", sql, preamble=MYSQL_PREAMBLE)


#: Every doc whose id is divisible by this renders as a malformed JSON
#: line — the deterministic corrupt-record fixture for the JSONL source.
JSONL_BROKEN_EVERY = 97


def ensure_documents_jsonl(sf_dir: str) -> str:
    """Generate (once) and return a JSON-lines dump of ``documents``,
    with every :data:`JSONL_BROKEN_EVERY`-th doc_id rendered as a
    truncated (unparseable) line to exercise the PERMISSIVE
    corrupt-record channel."""
    sql = f"""
SELECT CASE WHEN doc_id % {JSONL_BROKEN_EVERY} = 0
            THEN '{{"doc_id": ' || doc_id || ', "text": BROKEN'
            ELSE CAST(to_json(struct_pack(
                   doc_id := doc_id, text := text, lang := lang,
                   source := source, n_chars := n_chars)) AS VARCHAR)
       END
FROM documents ORDER BY doc_id
"""
    return _generate(
        sf_dir,
        "documents.jsonl",
        sql,
        src_name="documents.parquet",
        con_factory=_docs_con,
    )


#: Every doc whose id is divisible by this renders as a malformed CSV
#: row (a non-numeric n_chars field) — the deterministic corrupt-record
#: fixture for the CSV source. A different prime from the JSONL fixture
#: so the two connectors' diagnostics never coincide.
CSV_BROKEN_EVERY = 89


def ensure_documents_csv(sf_dir: str) -> str:
    """Generate (once) and return a headerless CSV dump of
    ``documents`` (RFC-4180 quoting: text wrapped in double quotes,
    embedded quotes doubled), with every :data:`CSV_BROKEN_EVERY`-th
    doc_id rendered with an unparseable ``n_chars`` so the PERMISSIVE
    corrupt-record channel is exercised on every run."""
    sql = f"""
SELECT CASE WHEN doc_id % {CSV_BROKEN_EVERY} = 0
            THEN doc_id || ',broken,row,here,NOTANUMBER'
            ELSE doc_id || ',"' || replace(text, '"', '""') || '",'
                 || lang || ',' || source || ',' || n_chars
       END
FROM documents ORDER BY doc_id
"""
    return _generate(
        sf_dir,
        "documents.csv",
        sql,
        src_name="documents.parquet",
        con_factory=_docs_con,
    )


#: Every doc whose id is divisible by this renders with its spaces
#: replaced by REAL newlines inside the quoted text field — the
#: deterministic embedded-newline fixture for the multiLine CSV
#: reader path. A different prime from both corrupt fixtures.
CSV_MULTILINE_EVERY = 7


def ensure_documents_csv_multiline(sf_dir: str) -> str:
    """Generate (once) and return a headerless CSV dump of
    ``documents`` where every :data:`CSV_MULTILINE_EVERY`-th doc's
    quoted text carries real embedded newlines (spaces → LF), so a
    line-based reader would shred those records. No malformed rows:
    this fixture isolates the record-spanning-lines case (the corrupt
    channel is the single-line fixture's job)."""
    sql = f"""
SELECT doc_id || ',"'
       || CASE WHEN doc_id % {CSV_MULTILINE_EVERY} = 0
               THEN replace(replace(text, '"', '""'), ' ', chr(10))
               ELSE replace(text, '"', '""') END
       || '",' || lang || ',' || source || ',' || n_chars
FROM documents ORDER BY doc_id
"""
    return _generate(
        sf_dir,
        "documents_multiline.csv",
        sql,
        src_name="documents.parquet",
        con_factory=_docs_con,
    )
