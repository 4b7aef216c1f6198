"""Loggen invariants: the hard-coded normalized-pattern literals must
equal the reference normalizers (public regexes, SURVEY §2.3) applied
to the generated command/query text."""

from __future__ import annotations

import re

import duckdb

from sressentials_spark import loggen

_N1 = re.compile(r"""(:\s*["']?[^,{}\[\]]+["']?\s*(?=[,}]))""")
_N2 = re.compile(r"(\b\d+\b)|('[^']*')")

SF_DIR = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    return con


def test_mongo_pattern_literals_match_reference_normalizer():
    con = _con()
    rows = con.execute(
        f"""WITH ev AS ({loggen.MONGO_EV})
        SELECT DISTINCT ({loggen.MONGO_CMD}), ({loggen.MONGO_PATTERN})
        FROM ev WHERE event_type IN ('click', 'view', 'purchase')"""
    ).fetchall()
    assert rows
    for cmd, literal in rows:
        assert _N1.sub(":<value>", cmd) == literal


def test_mysql_nq_literals_match_reference_normalizer():
    con = _con()
    rows = con.execute(
        f"""WITH ev AS ({loggen.MYSQL_EV})
        SELECT DISTINCT ({loggen.MYSQL_QUERY}), ({loggen.MYSQL_NQ})
        FROM ev WHERE event_type <> 'error'"""
    ).fetchall()
    assert rows
    for q, literal in rows:
        assert _N2.sub("?", q).upper() == literal


def test_generated_files_are_deterministic(tmp_path):
    p1 = loggen.ensure_mongo_log(SF_DIR)
    p2 = loggen.ensure_mysql_log(SF_DIR)
    with open(p1) as f:
        lines = f.read().split("\n")
    # one line per event (sf0.001 has 1000 events)
    assert len(lines) == 1000
    assert lines[0].startswith("garbage line 0")
    with open(p2) as f:
        content = f.read()
    assert content.startswith(loggen.MYSQL_PREAMBLE)
    assert content.count("\n# Time: ") == 1000
