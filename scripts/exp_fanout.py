#!/usr/bin/env python
"""A/B the log-parse fan-out within ONE session (drift-resistant).

Arms alternate per rep: fan_out_numbered active vs identity. Each rep
clears the parsed-sheet cache so the parse+persist is re-paid, runs
the query through the noop sink, and records wall seconds.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sressentials_spark import get_spark, loggen
from sressentials_spark.catalog import QUERIES, clear_sheets_cache
from sressentials_spark.operators.dedup import release_persisted
import sressentials_spark.sources.mongo_log as mongo_src
import sressentials_spark.sources.mysql_log as mysql_src

QUERIES_TO_TIME = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "mongo_slow_detailed", "mysql_detailed",
]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("exp-fanout")
    loggen.ensure_mongo_log(SF)
    loggen.ensure_mysql_log(SF)
    real = mongo_src.fan_out_numbered
    ident = lambda df, n: df  # noqa: E731

    results: dict[tuple[str, str], list[float]] = {}
    for rep in range(REPS + 1):
        for arm, fn in (("fanout", real), ("plain", ident)):
            mongo_src.fan_out_numbered = fn
            mysql_src.fan_out_numbered = fn
            for q in QUERIES_TO_TIME:
                clear_sheets_cache()
                release_persisted()
                t0 = time.perf_counter()
                QUERIES[q](spark, SF).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if rep > 0:
                    results.setdefault((q, arm), []).append(dt)
                print(f"rep={rep} {arm:6s} {q}: {dt:.2f}s", flush=True)
    mongo_src.fan_out_numbered = real
    mysql_src.fan_out_numbered = real
    for (q, arm), v in sorted(results.items()):
        print(f"{q:25s} {arm:6s} median={statistics.median(v):.2f}s "
              f"all={[round(x, 2) for x in v]}")


if __name__ == "__main__":
    main()
