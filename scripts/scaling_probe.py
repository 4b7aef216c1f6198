#!/usr/bin/env python
"""Scale-out signal probe (r12 VERDICT item 8).

The sf0.1 bench is floor-bound: every query is dominated by
job-scheduling/planning/state-store fixed cost, so low-core vs
high-core ratios sit at ~1 and demonstrate nothing about parallel
execution. This probe manufactures a larger input (REPLICAS copies of
the sf0.1 tables with shifted keys — ~sf2 equivalent by rows) under
the scratch base and times a handful of genuinely compute-heavy
catalog queries through the same noop-sink methodology, at whatever
``SPARK_GRAFT_CPUS`` is set. Run it twice (32 and 8 cores) and compare.

This is a DIAGNOSTIC, not part of the bench contract: bench.py and the
driver's suite are untouched; the generated data lives in scratch and
is removed at process exit unless --keep.

Usage::

    python scripts/scaling_probe.py --gen [--replicas 20] [--keep DIR]
    SPARK_GRAFT_CPUS=32 python scripts/scaling_probe.py --run DIR
    SPARK_GRAFT_CPUS=8  python scripts/scaling_probe.py --run DIR

Replication keeps each query's workload shape honest:

* ``lineitem``/``orders``: order keys shifted per replica (join/agg
  fan-out scales linearly; the co-purchase self-join gets r× rows per
  part pair, scaling the basket join and PageRank edge weights).
* ``documents``: doc_id shifted AND a per-replica token appended to
  every text (so replicas do not become cross-replica near-duplicates
  and the pair generators keep their banded selectivity).
* ``embeddings``: vec_id shifted (k-means/PQ workloads scale by rows).
* ``events``: event_id/user_id shifted (window/sessionize scale by
  users; per-user event counts unchanged).
* dimension tables copied once, unchanged.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    "tpch_q1_pricing_summary",
    "dedup_minhash_lsh",
    "graph_pagerank_copurchase",
    "emb_kmeans_clusters",
    "window_trailing_28d_spend",
]


def generate(base_sf: str, out_dir: str, replicas: int) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def read(name):
        return pq.read_table(os.path.join(base_sf, f"{name}.parquet"))

    def write(name, tbl):
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        write(dim, read(dim))

    def shifted(tbl, col, shift):
        idx = tbl.schema.get_field_index(col)
        return tbl.set_column(
            idx, col, pc.add(tbl.column(col), shift)
        )

    def replicate(name, keycols, text_tag=False):
        t = read(name)
        spans = {c: (pc.max(t.column(c)).as_py() + 1) for c in keycols}
        parts = []
        for r in range(replicas):
            x = t
            for c in keycols:
                x = shifted(x, c, r * spans[c])
            if text_tag and r > 0:
                idx = x.schema.get_field_index("text")
                tagged = pc.binary_join_element_wise(
                    pc.cast(x.column("text"), pa.string()),
                    f"replica{r}",
                    " ",
                )
                x = x.set_column(idx, "text", tagged)
            parts.append(x)
        write(name, pa.concat_tables(parts))
        print(f"[gen] {name}: {t.num_rows} -> {t.num_rows * replicas} rows")

    replicate("lineitem", ["l_orderkey"])
    replicate("orders", ["o_orderkey"])
    replicate("documents", ["doc_id"], text_tag=True)
    replicate("embeddings", ["vec_id"])
    replicate("events", ["event_id", "user_id"])


def run(data_dir: str) -> None:
    from sressentials_spark import get_spark
    from sressentials_spark.catalog import QUERIES
    from sressentials_spark.operators.dedup import release_persisted

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"scaling-probe-{cpus}")
    results = {}
    for name in PROBE_QUERIES:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        # one warmup + two timed, min reported (same spirit as bench.py)
        best = None
        for it in range(3):
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_persisted()
            if it > 0:
                best = dt if best is None else min(best, dt)
            print(f"[probe] {name} it={it}: {dt:.2f}s", flush=True)
        results[name] = round(best, 3)
    import json

    print(json.dumps({"cpus": cpus, "dir": data_dir, "queries": results}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--run", metavar="DIR")
    ap.add_argument("--out", default="/dev/shm/sressentials_scaling")
    ap.add_argument("--replicas", type=int, default=20)
    ap.add_argument(
        "--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    if args.gen:
        generate(args.base, args.out, args.replicas)
    if args.run:
        run(args.run)


if __name__ == "__main__":
    main()
