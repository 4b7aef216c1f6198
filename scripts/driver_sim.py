#!/usr/bin/env python
"""Rehearse the driver's correctness gate end-to-end.

Runs ``entry(spark)`` then every ``queries()[name]`` against
``oracle_sql()[name]`` in DuckDB at the given scale factor (default
sf0.01 — the driver's), with the same shape of comparison: row count,
column set, and order-insensitive exact values.

Usage::

    python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        key = df.astype(str).agg("\x00".join, axis=1)
        df = df.iloc[key.argsort(kind="mergesort")]
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as ent
    from sressentials_spark import get_spark

    spark = get_spark("driver-sim")

    t0 = time.time()
    rows = ent.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time() - t0:.1f}s")
    assert rows, "entry() must return rows"

    qs, oracles = ent.queries(), ent.oracle_sql()
    print(f"queries={len(qs)} oracles={len(oracles)} "
          f"missing_oracles={sorted(set(qs) - set(oracles))}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    from sressentials_spark.operators.dedup import release_persisted

    fails: list[str] = []
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        release_persisted()  # cache hygiene between queries
        if name not in oracles:
            print(f"  {name}: rows-only, {len(sdf)} rows ({time.time() - t0:.1f}s)")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ok = len(sdf) == len(odf) and sorted(sdf.columns) == sorted(odf.columns)
        if ok:
            try:
                pd.testing.assert_frame_equal(
                    canon(sdf), canon(odf), check_dtype=False, check_exact=True
                )
            except AssertionError as exc:
                ok = False
                print(str(exc)[:500])
        if not ok:
            fails.append(name)
        print(f"  {name}: {'OK' if ok else 'MISMATCH'} "
              f"rows={len(sdf)}/{len(odf)} ({time.time() - t0:.1f}s)")

    print("RESULT:", "ALL OK" if not fails else f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
