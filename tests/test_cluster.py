"""Integer-quantized k-means: the reproducibility contract.

The module's whole reason to exist (operators/cluster.py docstring) is
that float Lloyd's depends on summation order while the quantized
integer version is bit-identical on ANY partition layout — pin exactly
that, plus the deterministic tie-break and empty-cluster semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sressentials_spark.operators.cluster import (
    QUANT_SCALE,
    kmeans_quantized,
    quantize_vec,
)
from sressentials_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _freeze(df):
    return sorted(tuple(r) for r in df.collect())


def test_assignments_invariant_under_partitioning(spark):
    emb = load_table(spark, SF, "embeddings")
    base = _freeze(kmeans_quantized(emb, k=8, iters=3))
    # Same data, adversarial layouts: single partition and a 17-way
    # scatter. Integer arithmetic must make the result bit-identical.
    one = _freeze(kmeans_quantized(emb.coalesce(1), k=8, iters=3))
    many = _freeze(kmeans_quantized(emb.repartition(17, "label"), k=8, iters=3))
    assert base == one == many


def test_every_vector_assigned_exactly_once(spark):
    emb = load_table(spark, SF, "embeddings")
    out = kmeans_quantized(emb, k=8, iters=2)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    # Cluster ids come from the initial 0..k-1 seeding (never renumbered).
    ids = {r[0] for r in out.select("cluster").distinct().collect()}
    assert ids <= set(range(8))


def test_quantization_grid_is_exact_integer(spark):
    emb = load_table(spark, SF, "embeddings").limit(10)
    q = emb.select(quantize_vec("embedding").alias("q"))
    rows = q.collect()
    for r in rows:
        for v in r["q"]:
            assert isinstance(v, int)
            # |x| <= ~0.5 -> |q| well inside the 2^20 grid
            assert abs(v) <= QUANT_SCALE


def test_k_exceeding_rows_degenerates_cleanly(spark):
    # k > n: every vector seeds its own cluster; assignment maps each
    # seed to itself with distance 0.
    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 3)
    out = kmeans_quantized(emb, k=8, iters=1)
    rows = {r["vec_id"]: (r["cluster"], r["dist_sq"]) for r in out.collect()}
    assert len(rows) == 3
    assert all(d == 0 for (_, d) in rows.values())


@pytest.mark.parametrize("iters", [0, 1])
def test_zero_iterations_is_pure_seed_assignment(spark, iters):
    # iters=0 must still produce a valid assignment against the seeds.
    emb = load_table(spark, SF, "embeddings")
    out = kmeans_quantized(emb, k=4, iters=iters)
    assert out.count() == emb.count()
