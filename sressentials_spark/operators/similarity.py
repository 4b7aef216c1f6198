"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, score with a deterministic double
  chain, rank with a per-query window. The correctness baseline; one
  shuffle (the window partition by query id), corpus scanned once.
* :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH
  buckets (sign-bit signature from deterministic ±1 planes) so each
  query only scores its own bucket. Recall < 1 by design; the planes
  are md5-derived so the result is bit-reproducible in SQL.

All dot products are unrolled fixed-dimension arithmetic chains
(:func:`sressentials_spark.operators.dedup._dot`) — whole-stage
codegen, bit-identical to a sequential fold. Round 1 scored with
``F.aggregate(zip_with(...))``, which Spark evaluates per element in
the expression interpreter (~3 ms per 64-dim dot → 34s for a 10k-row
scoring pass); the unrolled form is the same arithmetic at JVM speed.

At 100 TB the brute-force variant is a full corpus scan per query
batch (still the right tool for small query sets — it's one pass and
embarrassingly parallel); the LSH variant turns that into a bucket-join
whose fan-in is corpus/2^planes per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sressentials_spark.operators.dedup import DEFAULT_DIM, _dot, with_norm

#: Number of hyperplanes (sign bits) for the LSH bucketing.
LSH_PLANES = 6


def lsh_plane_weights(planes: int = LSH_PLANES, dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights, derived from md5 parity so
    an external engine can rebuild the identical planes."""
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append(1.0 if h % 2 == 0 else -1.0)
        out.append(row)
    return out


def lsh_bucket(vec: Column, planes: int = LSH_PLANES, dim: int = DEFAULT_DIM) -> Column:
    """Sign-bit bucket id of ``vec`` under the deterministic planes.

    Each projection is an unrolled left-associated sum of
    ``vec[i] * (±1.0)`` terms — identical order and values to the
    oracle's ``list_sum`` comprehension, but codegen'd.
    """
    weights = lsh_plane_weights(planes, dim)
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(weights):
        proj = F.lit(0.0)
        for d, w in enumerate(row):
            proj = proj + F.element_at(vec, d + 1).cast("double") * F.lit(w)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    corpus = with_norm(emb, dim=dim)
    queries = corpus.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                _dot(F.col("qv"), F.col("embedding"), dim)
                / (F.col("qnorm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_lsh(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket."""
    with_bucket = with_norm(emb, dim=dim).withColumn(
        "bucket", lsh_bucket(F.col("embedding"), dim=dim)
    )
    queries = with_bucket.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qb"),
    )
    scored = (
        F.broadcast(queries)
        .join(
            with_bucket,
            (F.col("qb") == F.col("bucket")) & (F.col("query_id") != F.col(id_col)),
        )
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            (
                _dot(F.col("qv"), F.col("embedding"), dim)
                / (F.col("qnorm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
