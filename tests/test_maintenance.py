"""Small-file compaction: content round-trip, file-count reduction,
and — the operator's whole point — a shuffle-free physical plan."""

from __future__ import annotations

import tempfile

from sressentials_spark.operators import maintenance as MT

SF = "/root/testdata/sf0.001"


def test_compaction_roundtrips_content_and_reduces_files(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    small = str(tmp_path / "small")
    out = str(tmp_path / "compacted")
    src.repartition(32).write.parquet(small)

    total = sum(b for _, b in MT.file_manifest(small))
    stats = MT.compact_small_files(
        spark, small, out, target_bytes=-(-total // 2)
    )
    assert stats["files_before"] == 32
    assert stats["files_after"] <= stats["target_files"] == 2
    assert stats["files_after"] >= 1

    back = spark.read.parquet(out)
    assert back.count() == src.count()
    # Exact content: anti-joins empty both ways.
    assert back.exceptAll(src).isEmpty()
    assert src.exceptAll(back).isEmpty()


def test_compaction_plan_has_no_shuffle(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    small = str(tmp_path / "small")
    src.repartition(16).write.parquet(small)
    plan = (
        spark.read.parquet(small)
        .coalesce(2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Coalesce" in plan, plan


def test_empty_source_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no parquet part files"):
        MT.compact_small_files(spark, str(tmp_path), str(tmp_path / "o"))


def test_partition_overwrite_touches_only_target_day(spark, tmp_path):
    """Dynamic partition overwrite: the repaired day converges to the
    source; every OTHER day's files are byte-for-byte untouched (same
    paths, sizes, mtimes — never rewritten)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from sressentials_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    layout = str(tmp_path / "events_by_day")
    events = load_table(spark, sf, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    events.withColumn("d", F.to_date("ts")).repartition("d").write.partitionBy(
        "d"
    ).parquet(layout)

    def snapshot(exclude_day: str) -> dict[str, tuple[int, float]]:
        return {
            p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(f"{layout}/d=*/part-*.parquet")
            if f"d={exclude_day}" not in p
        }

    day = "2024-01-20"
    before = snapshot(day)
    repaired = MT.corrupt_then_rebuild_day(spark, sf, layout, day)
    assert snapshot(day) == before

    src_day = events.filter(F.to_date("ts") == F.lit(day))
    assert repaired.count() == src_day.count() > 0
    assert repaired.exceptAll(src_day).isEmpty()
    assert src_day.exceptAll(repaired).isEmpty()
    # And the table as a whole survived the drill intact.
    back = (
        spark.read.parquet(layout)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    assert back.count() == events.count()
    assert back.exceptAll(events).isEmpty()


def test_compaction_preserves_range_clustering(spark):
    """Compacting the shipdate-range-clustered layout through
    compact_clustered_files (contiguous listing-order bins) keeps
    per-file shipdate ranges DISJOINT, so footer-stats skipping
    survives the nightly compaction. Plain coalesce compaction does
    NOT have this property — its partition coalescer groups by
    locality and interleaves ranges (this test originally pinned the
    opposite claim against compact_small_files and FAILED, which is
    why the clustered variant exists)."""
    from datetime import datetime

    from sressentials_spark.operators import maintenance as MT
    from sressentials_spark.sources import columnar
    from tests.test_columnar_layout import _file_ranges

    src = columnar.ensure_lineitem_clustered(spark, "/root/testdata/sf0.001")
    total = sum(b for _, b in MT.file_manifest(src))
    out = tempfile.mkdtemp(prefix="sressentials_compact_clust_")
    stats = MT.compact_clustered_files(
        spark, src, out, target_bytes=-(-total // 2)
    )
    assert stats["files_after"] < stats["files_before"]
    assert (
        spark.read.parquet(out).count() == spark.read.parquet(src).count()
    )

    ranges = sorted(_file_ranges(out, "l_shipdate"))
    for (_lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, f"compaction destroyed clustering: {hi_a} !< {lo_b}"
    start, end = datetime(1997, 6, 1), datetime(1997, 7, 1)
    hit = [r for r in ranges if r[0] < end and r[1] >= start]
    assert len(hit) <= 1, f"month should hit <=1 compacted file, hit {len(hit)}"
