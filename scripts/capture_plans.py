#!/usr/bin/env python
"""Capture ``explain("formatted")`` for catalog queries to files.

Usage::

    python scripts/capture_plans.py OUTDIR [sf_dir] [--only q1,q2] [--suffix _before]

Writes ``OUTDIR/<query><suffix>.txt`` for each selected query. Plans
are captured at the given scale factor (default sf0.001 so lazy index
builders stay cheap); plan SHAPE (exchanges, join strategies, pushed
filters, Python-eval nodes) is scale-invariant for these queries —
only AQE's runtime coalescing differs, and explain() shows the
pre-execution plan either way.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    only: set[str] | None = None
    suffix = ""
    if "--only" in args:
        i = args.index("--only")
        only = {s.strip() for s in args[i + 1].split(",") if s.strip()}
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    outdir = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    os.makedirs(outdir, exist_ok=True)

    from sressentials_spark import get_spark, loggen
    from sressentials_spark.catalog import QUERIES

    spark = get_spark("plan-capture")
    loggen.ensure_mongo_log(sf_dir)
    loggen.ensure_mysql_log(sf_dir)
    loggen.ensure_documents_jsonl(sf_dir)
    loggen.ensure_documents_csv(sf_dir)

    names = sorted(only) if only else sorted(QUERIES)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"[plans] unknown query: {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture must never abort the sweep
            text = f"PLAN CAPTURE FAILED: {exc}\n"
            print(f"[plans] {name}: FAILED {exc}", file=sys.stderr)
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"[plans] {name}: {len(text)} bytes", file=sys.stderr)


if __name__ == "__main__":
    main()
