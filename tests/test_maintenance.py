"""Small-file compaction: content round-trip, file-count reduction,
and — the operator's whole point — a shuffle-free physical plan."""

from __future__ import annotations

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
