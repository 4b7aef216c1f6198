"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: the (small) query set
  is collected driver-side and broadcast against the corpus, scored
  with a deterministic double chain, ranked with a per-query window.
  The correctness baseline; one shuffle (the window partition by query
  id), corpus scanned once.
* :func:`cosine_topk_lsh` — the scale path: random-hyperplane LSH
  buckets (sign-bit signature from deterministic ±1 planes) so each
  query only scores its own bucket. Recall < 1 by design; the planes
  are md5-derived so the result is bit-reproducible in SQL.

Expression-shape notes (this is where round 2 lost time):

* Dot products are unrolled fixed-dimension arithmetic chains
  (:func:`sressentials_spark.operators.dedup._dot`) — whole-stage
  codegen, bit-identical to a sequential fold. Spark's array HOFs
  (``aggregate``/``zip_with``) evaluate per element in the expression
  interpreter (~3 ms per 64-dim dot in round 1).
* The norm and the 6 plane projections all consume the same vector, so
  :func:`attach_norm_bucket` first materializes each element ONCE in a
  sub-projection (64 ``element_at`` + cast), then sums those cheap
  column references. Inlining the bucket expression directly (round 2)
  evaluated 7 × 64 ``element_at``+cast per row — and because the query
  side re-derived the same projection, the giant tree appeared twice
  in the plan. Catalyst's ``CollapseProject`` keeps the split: it only
  re-inlines cheap (attribute/literal) expressions.
* The query set is collected to the driver (a handful of rows — the
  same pushed-down ``vec_id`` filter either way) and re-emitted as a
  local relation, so the corpus-side projection is the only instance
  of the unrolled chains in the final plan.

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

_ELT = "__ssk_e"


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


def _bucket_from_elements(elts: list[Column], planes: int, dim: int) -> Column:
    """Sign-bit bucket id from pre-extracted element columns.

    Each projection is a left-associated ``0.0 + e_d * (±1.0)`` chain —
    identical order and values to the oracle's ``list_sum``
    comprehension (``x * ±1.0`` is exact in IEEE), but over cheap
    column references instead of repeated ``element_at`` calls.
    """
    weights = lsh_plane_weights(planes, dim)
    bucket = F.lit(0).cast("long")
    for p, row in enumerate(weights):
        proj = F.lit(0.0)
        for d, w in enumerate(row):
            proj = proj + elts[d] * F.lit(w)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket(vec: Column, planes: int = LSH_PLANES, dim: int = DEFAULT_DIM) -> Column:
    """Sign-bit bucket id of ``vec`` under the deterministic planes.

    Column-expression form (re-extracts every element per plane); plans
    that also need the norm should prefer :func:`attach_norm_bucket`,
    which shares one element extraction across all consumers.
    """
    elts = [F.element_at(vec, d + 1).cast("double") for d in range(dim)]
    return _bucket_from_elements(elts, planes, dim)


def attach_norm_bucket(
    emb: DataFrame,
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Attach ``norm`` and ``bucket`` with one element extraction.

    Two stacked projections: the first materializes ``vec[d]`` as a
    plain double column per dimension; the second computes the L2 norm
    and all ``planes`` sign-bit projections as sums over those column
    references. ``CollapseProject`` will not re-inline them (element
    extraction is not a "cheap" expression), so each element is read
    exactly once per row however many planes consume it.
    """
    elt_cols = [
        F.element_at(F.col(vec_col), d + 1).cast("double").alias(f"{_ELT}{d}")
        for d in range(dim)
    ]
    staged = emb.select("*", *elt_cols)
    elts = [F.col(f"{_ELT}{d}") for d in range(dim)]
    norm = F.lit(0.0)
    for d in range(dim):
        norm = norm + elts[d] * elts[d]
    return staged.select(
        *emb.columns,
        F.sqrt(norm).alias("norm"),
        _bucket_from_elements(elts, planes, dim).alias("bucket"),
    )


def _collect_queries(
    corpus: DataFrame, query_ids: list[int], id_col: str, cols: list[str]
) -> DataFrame:
    """Materialize the (tiny) query rows as a local relation.

    The ``vec_id IN (...)`` filter is pushed to the scan, so this is a
    handful of rows either way — but re-emitting them as literals means
    the unrolled norm/bucket chains appear ONCE in the final plan (the
    corpus side) instead of twice. This is the standard query-batch
    pattern at scale too: the query set rides with the job, the corpus
    never moves.
    """
    rows = corpus.filter(F.col(id_col).isin(query_ids)).select(*cols).collect()
    schema = corpus.select(*cols).schema
    return corpus.sparkSession.createDataFrame(rows, schema)


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    corpus = with_norm(emb, dim=dim)
    queries = _collect_queries(
        corpus, query_ids, id_col, [id_col, "embedding", "norm"]
    ).select(
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
    corpus = attach_norm_bucket(emb, dim=dim)
    queries = _collect_queries(
        corpus, query_ids, id_col, [id_col, "embedding", "norm", "bucket"]
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qb"),
    )
    scored = (
        F.broadcast(queries)
        .join(
            corpus,
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
