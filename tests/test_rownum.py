"""Row numbering must stay file-order-faithful when a single file is
split into many scan partitions (the at-scale read path)."""

from __future__ import annotations

import pytest

from sressentials_spark.operators.rownum import (
    with_file_row_numbers,
    with_row_numbers,
)


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


def test_per_file_numbers_multi_file(spark, tmp_path):
    """Packed case: several small files land in few partitions; each
    file's numbering must restart at 1 in its own line order."""
    sizes = {"a.log": 37, "b.log": 5, "c.log": 250}
    for fname, n in sizes.items():
        (tmp_path / fname).write_text(
            "\n".join(f"{fname}:{i:04d}" for i in range(n))
        )
    df = with_file_row_numbers(
        spark.read.text(str(tmp_path)), "line_no", file_col="src"
    )
    rows = df.collect()
    assert len(rows) == sum(sizes.values())
    for fname, n in sizes.items():
        got = {
            r["line_no"]: r["value"] for r in rows if r["src"].endswith(fname)
        }
        assert sorted(got) == list(range(1, n + 1))
        for i in (1, n):
            assert got[i] == f"{fname}:{i - 1:04d}"


def test_per_file_numbers_with_splits(spark, tmp_path, small_splits):
    """Split case: a file larger than maxPartitionBytes spans several
    scan partitions; fragment offsets must still reconstruct the exact
    in-file order. A second small file rides along (mixed packing)."""
    n_big, n_small = 4000, 11
    (tmp_path / "big.log").write_text(
        "\n".join(f"big:{i:06d}" for i in range(n_big))
    )
    (tmp_path / "small.log").write_text(
        "\n".join(f"small:{i:02d}" for i in range(n_small))
    )
    df = with_file_row_numbers(
        spark.read.text(str(tmp_path)), "line_no", file_col="src"
    )
    assert df.rdd.getNumPartitions() > 4
    rows = df.collect()
    big = {r["line_no"]: r["value"] for r in rows if r["src"].endswith("big.log")}
    assert sorted(big) == list(range(1, n_big + 1))
    for i in (1, 17, 2048, n_big):
        assert big[i] == f"big:{i - 1:06d}"
    small = {
        r["line_no"]: r["value"] for r in rows if r["src"].endswith("small.log")
    }
    assert sorted(small) == list(range(1, n_small + 1))


def test_per_file_empty_input(spark, tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    assert with_file_row_numbers(spark.read.text(str(p))).count() == 0
