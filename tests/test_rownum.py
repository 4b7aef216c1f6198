"""Row numbering must stay file-order-faithful when a single file is
split into many scan partitions (the at-scale read path)."""

from __future__ import annotations

import pytest

from sressentials_spark.operators.rownum import with_row_numbers


@pytest.fixture()
def small_splits(spark):
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    yield
    spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_line_numbers_across_file_splits(spark, tmp_path, small_splits):
    path = tmp_path / "lines.txt"
    n = 5000
    path.write_text("\n".join(f"line-{i:06d}" for i in range(n)))

    df = with_row_numbers(spark.read.text(str(path)), "line_no")
    assert df.rdd.getNumPartitions() > 4  # the split actually happened
    rows = df.collect()
    assert len(rows) == n
    by_no = {r["line_no"]: r["value"] for r in rows}
    assert sorted(by_no) == list(range(1, n + 1))
    for i in (1, 17, 2048, n):
        assert by_no[i] == f"line-{i - 1:06d}"


def test_empty_input(spark, tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    assert with_row_numbers(spark.read.text(str(p))).count() == 0
