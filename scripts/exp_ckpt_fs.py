#!/usr/bin/env python
"""A/B the streaming replay checkpoint filesystem within ONE session.

Alternates the scratch base between ext4 (/tmp) and tmpfs (/dev/shm)
around repeated runs of the same replay query, so box drift hits both
arms equally. Prints per-rep seconds and medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sressentials_spark import get_spark
from sressentials_spark import scratch as scratch_mod
from sressentials_spark.catalog import QUERIES
from sressentials_spark.operators.dedup import release_persisted

QUERY = sys.argv[1] if len(sys.argv) > 1 else "streaming_view_purchase_attribution"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def make_base(root: str):
    def _scratch(prefix: str) -> str:
        d = tempfile.mkdtemp(prefix=prefix, dir=root)
        scratch_mod._SCRATCH_DIRS.append(d)
        return d
    return _scratch


def main() -> None:
    spark = get_spark("exp-ckpt-fs")
    fn = QUERIES[QUERY]
    orig = scratch_mod.scratch_dir
    # warmup once per arm
    results: dict[str, list[float]] = {"/tmp": [], "/dev/shm": []}
    arms = ["/tmp", "/dev/shm"]
    for rep in range(REPS + 1):
        for arm in arms:
            patched = make_base(arm)
            scratch_mod.scratch_dir = patched
            # replay module imported `scratch_dir` by name in streaming/__init__
            import sressentials_spark.streaming as st
            import sressentials_spark.streaming.attribution as at
            st.scratch_dir = patched
            at_scr = getattr(at, "scratch_dir", None)
            t0 = time.perf_counter()
            fn(spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_persisted()
            if rep > 0:  # rep 0 is warmup
                results[arm].append(dt)
            print(f"rep={rep} arm={arm}: {dt:.2f}s", flush=True)
    scratch_mod.scratch_dir = orig
    for arm in arms:
        v = results[arm]
        print(f"{arm}: median={statistics.median(v):.2f}s  all={[round(x,2) for x in v]}")


if __name__ == "__main__":
    main()
