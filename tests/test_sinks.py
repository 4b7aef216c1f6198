"""Write-side story: partitioned/bucketed output and the shuffle-free
downstream join it buys (VERDICT r3 stretch item)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sressentials_spark import sinks
from sressentials_spark.operators.pipeline import connected_components
from sressentials_spark.operators.dedup import minhash_lsh_pairs, release_persisted
from sressentials_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    path = str(tmp_path / "docs_by_lang")
    sinks.write_partitioned(
        load_table(spark, SF, "documents"), path, ["lang"]
    )
    read = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = read._jdf.queryExecution().executedPlan().toString()
    # The lang predicate lands in PartitionFilters (directory pruning),
    # not in the row-level data filters.
    assert "PartitionFilters" in plan
    head, _, tail = plan.partition("PartitionFilters")
    assert "lang" in tail.split("]")[0]
    total = spark.read.parquet(path).count()
    en = read.count()
    assert 0 < en < total


def test_components_output_joins_documents_shuffle_free(spark, tmp_path):
    """The intended consumption of connected_components at scale: write
    verdicts AND the corpus bucketed on doc_id; the canonical-id join
    back to documents then plans with zero Exchange operators."""
    tag = f"t{abs(hash(str(tmp_path))) % 10**9}"
    t_docs, t_comp = f"docs_{tag}", f"comp_{tag}"
    docs = load_table(spark, SF, "documents")
    comp = connected_components(
        docs.select("doc_id"), minhash_lsh_pairs(docs)
    )
    sinks.write_bucketed(docs, t_docs, str(tmp_path / "docs"), ["doc_id"])
    sinks.write_bucketed(comp, t_comp, str(tmp_path / "comp"), ["doc_id"])
    release_persisted()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = sinks.read_bucketed(spark, t_comp).join(
            sinks.read_bucketed(spark, t_docs), "doc_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # Semantics: every document got a verdict row.
        assert joined.count() == docs.count()
        kept = joined.filter(~F.col("is_dup")).count()
        assert 0 < kept <= docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t_docs}")
        spark.sql(f"DROP TABLE IF EXISTS {t_comp}")


def test_ivf_cell_partitioned_store_prunes_probed_cells(spark, tmp_path):
    """The IVF 'read nprobe/K of the index' effect, realized as
    physical layout: write the corpus partitioned by home cell, read a
    probe set of cells back, and the scan must prune at the partition
    level (PartitionFilters), returning exactly the cells' rows."""
    from pyspark.sql import functions as F
    from sressentials_spark.operators import similarity as S
    from sressentials_spark.operators.linalg import ivf_cells_kernel
    from sressentials_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    ids, mat = S.ivf_seed_centroids(emb)
    kern = ivf_cells_kernel(ids, mat, nprobe=1)
    assigned = emb.select(
        "vec_id", "embedding", kern(F.col("embedding")).alias("nc")
    ).select(
        "vec_id", "embedding", F.col("nc.cells")[0].alias("cell")
    )
    path = str(tmp_path / "emb_by_cell")
    assigned.write.partitionBy("cell").parquet(path)

    probe_cells = [int(r["cell"]) for r in assigned.select("cell").distinct().limit(2).collect()]
    df = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    plan = df._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cell" in part_filters

    expect = assigned.filter(F.col("cell").isin(probe_cells)).count()
    assert df.count() == expect > 0


def test_orc_roundtrip_preserves_values_and_pushdown(spark, tmp_path):
    """Format breadth: ORC is the other columnar format Spark ships a
    native vectorized reader for. A results table written as ORC must
    round-trip exactly and still take predicate pushdown on read."""
    src = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    path = str(tmp_path / "orders_orc")
    src.write.format("orc").mode("overwrite").save(path)
    back = spark.read.format("orc").load(path)
    assert back.count() == src.count()
    assert sorted(back.columns) == sorted(src.columns)
    assert (
        back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
    )
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1].split("]")[0]


def test_dedup_index_band_join_history_side_shuffle_free(spark, tmp_path):
    """The persisted dedup index's contract: the band join's HISTORY
    side reads the bucketed table pre-hashed on (band, r0, r1) — only
    the batch side pays an Exchange. Also checks the index-backed
    ingest matches the self-contained variant row-for-row."""
    from sressentials_spark.operators import dedup as D

    tag = f"t{abs(hash(str(tmp_path))) % 10**9}"
    docs = load_table(spark, SF, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    split = (max_id + 1) * 7 // 10
    idx = D.build_dedup_index(
        docs.filter(F.col("doc_id") < split),
        str(tmp_path / "idx"),
        f"dedup_idx_{tag}",
        num_buckets=4,
    )
    try:
        # Plan shape: history bands scan is bucketed, and ONLY the
        # batch side of the history×batch candidate join exchanges on
        # the band key.
        hist_bands = sinks.read_bucketed(spark, idx.bands)
        batch_sig = D.signatures_from_shingles(
            D.shingle_rows(docs.filter(F.col("doc_id") >= split)), "doc_id"
        )
        batch_bands = D.band_rows_flat(batch_sig)
        keys = ["band", "r0", "r1"]
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = hist_bands.withColumnRenamed("doc_id", "doc_a").join(
                batch_bands.withColumnRenamed("doc_id", "doc_b"), keys
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "SelectedBucketsCount" in plan, plan
        band_exchanges = [
            line
            for line in plan.splitlines()
            if "Exchange hashpartitioning(band" in line
        ]
        assert len(band_exchanges) == 1, plan  # batch side only

        # Semantics: index-backed ingest == self-contained ingest.
        from_index = D.minhash_incremental_from_index(
            spark, docs.filter(F.col("doc_id") >= split), idx, split
        )
        self_contained = D.minhash_incremental(docs, split)
        a = from_index.toPandas().sort_values("doc_id").reset_index(drop=True)
        b = self_contained.toPandas().sort_values("doc_id").reset_index(drop=True)
        release_persisted()
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)
        assert set(a["status"]) <= {"dup_of_history", "dup_in_batch", "kept"}
    finally:
        for t in (idx.shingles, idx.signatures, idx.bands):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
