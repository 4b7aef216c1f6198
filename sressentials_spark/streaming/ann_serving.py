"""Micro-batch ANN serving: IVF-PQ (IVFADC) top-k inside foreachBatch.

The batch ANN stack ends at a persisted SELF-CONTAINED IVF-PQ index —
cell-partitioned residual code lists plus frozen trained-coarse
centroids and codebooks as sidecars (operators/similarity.py). This
module puts a QUERY STREAM in front of it: the online serving tier a
vector store runs. Query batches arrive as files; each micro-batch
resolves its probed cells against the frozen coarse centroids
(driver-side integer math — no corpus job), scans ONLY those cells'
partitions of the ~32×-compressed code table, ranks candidates by
broadcast ADC distance-table lookup, and appends its top-k to a
parquet sink (executors score and write; the driver handles only the
batch's query ids — a few rows per request batch, the one collect a
serving tier legitimately pays).

Per micro-batch the cost is O(queries × nprobe/n_cells × compressed
corpus): the index is never rebuilt, never rescanned in full, never
held in memory between batches — the steady-state serving cost at
100 TB, where the same two artifacts are warehouse tables and each
query batch is a request window.

Batching invariance (what makes this oracle-checkable): every query
is scored independently against the same frozen artifacts — per-query
distance tables, per-query rank windows — so the union of per-batch
top-ks equals the one-shot batch IVFADC search over the same query
set, and the registered query shares ``sim_pq_adc_topk_ivf``'s DuckDB
oracle verbatim. Pinned row-for-row in
tests/test_streaming_ann_serving.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sressentials_spark.localrel import local_df


def _stage_query_arrivals(
    spark: SparkSession, query_ids: list[int], n_files: int = 2
) -> str:
    """Stage the query ids as ``n_files`` mtime-ordered arrival files
    (id-ranged), one micro-batch each under ``maxFilesPerTrigger=1``."""
    import glob as globmod
    import os
    import time

    from sressentials_spark.scratch import scratch_dir

    d = scratch_dir("sressentials_ann_serve_stage_")
    (
        local_df(spark, [(int(q),) for q in query_ids], "query_id long")
        .repartitionByRange(n_files, "query_id")
        .write.mode("overwrite")
        .parquet(f"{d}/arrivals")
    )
    base = time.time() - 3600
    for i, p in enumerate(sorted(globmod.glob(f"{d}/arrivals/part-*.parquet"))):
        os.utime(p, (base + i, base + i))
    return d


def run_ivfpq_serving_stream(
    spark: SparkSession,
    sf_dir: str,
    ivfpq_path: str,
    query_ids: list[int],
    topk: int = 10,
) -> DataFrame:
    """Replay the staged query arrivals through the IVFADC serving
    tier (one file per trigger) and return the accumulated top-k
    table from the parquet sink."""
    import os

    from sressentials_spark.operators import dedup as D
    from sressentials_spark.operators import similarity as S
    from sressentials_spark.scratch import scratch_dir
    from sressentials_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def _replay() -> str:
        stage = D.get_or_build_disk_artifact(
            spark,
            ("ann_serving_stage", sf_dir, tuple(query_ids)),
            lambda: _stage_query_arrivals(spark, query_ids),
        )
        d = scratch_dir("sressentials_ann_serve_out_")
        out = os.path.join(d, "topk")

        def serve(batch: DataFrame, batch_id: int) -> None:
            # The one driver hop: this batch's request ids (a few rows
            # — the request window, never corpus data).
            qids = [int(r["query_id"]) for r in batch.select("query_id").collect()]
            if not qids:
                return
            S.pq_adc_topk_ivf_from_index(
                batch.sparkSession,
                emb,
                ivfpq_path,
                qids,
                topk=topk,
            ).write.mode("append").parquet(out)

        q = (
            spark.readStream.schema("query_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{stage}/arrivals")
            .writeStream.foreachBatch(serve)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    final = D.get_or_build_disk_artifact(
        spark, ("ann_serving_stream", sf_dir, tuple(query_ids), topk), _replay
    )
    return spark.read.parquet(final).select(
        "query_id", "neighbor_id", "adc_dist", F.col("rank").cast("long").alias("rank")
    )
