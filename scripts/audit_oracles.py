#!/usr/bin/env python
"""Audit every registered DuckDB oracle for type-drift vectors.

The driver's correctness gate value-hashes canonically stringified
cells, so an oracle column that lands float64 where Spark produces
int64 (``139.0`` vs ``139``) is a red row even when the values agree.
The r5 incident: DuckDB's ``//`` after an aggregate promotes through
HUGEINT and comes back float64 in pandas. This script is the cheap
insurance the r6 judge prescribed — it needs NO Spark session:

1. **Bind-time type audit** (precise): build a DuckDB relation for
   each oracle against the sf views and flag any output column whose
   DuckDB type converts lossily/driftily to pandas — HUGEINT /
   UHUGEINT (→ float64), DECIMAL (→ object/float depending on scale),
   FLOAT (float32 vs Spark's double).
2. **Static ``//`` scan** (heuristic): report oracle lines using
   integer division whose line lacks a ``CAST``, for human review.

Exit 1 on any bind-time flag; the static scan is informational.

Usage::

    python scripts/audit_oracles.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: DuckDB result types that do NOT round-trip to pandas as the dtype
#: the matching Spark column produces.
DRIFTY = re.compile(r"HUGEINT|UHUGEINT|DECIMAL|^FLOAT$", re.IGNORECASE)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from sressentials_spark.catalog import ORACLE_SQL

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    flagged: list[str] = []
    for name, sql in sorted(ORACLE_SQL.items()):
        try:
            rel = con.sql(sql)  # binds + plans; does not execute
        except Exception as exc:  # noqa: BLE001 — an unbindable oracle is itself a flag
            flagged.append(name)
            print(f"FLAG {name}: oracle failed to bind: {str(exc)[:200]}")
            continue
        for col, typ in zip(rel.columns, rel.types):
            if DRIFTY.search(str(typ)):
                flagged.append(name)
                print(f"FLAG {name}: column {col!r} binds as {typ} "
                      "(drifts through pandas; CAST it)")

    n_static = 0
    for name, sql in sorted(ORACLE_SQL.items()):
        for line in sql.splitlines():
            if "//" in line and "CAST" not in line.upper():
                n_static += 1
                print(f"note {name}: un-CAST `//` on line: {line.strip()}")

    print(f"audited {len(ORACLE_SQL)} oracles: "
          f"{len(set(flagged))} flagged, {n_static} static notes")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
