"""Exact integer-quantized k-means over embedding columns.

Embedding-space clustering is the workhorse behind corpus diversity
analysis, per-cluster sampling quotas, and IVF-style index builds for
a training-data pipeline. Floating-point Lloyd's iterations are NOT
reproducible at cluster scale — both the assignment distances and the
centroid means depend on float summation order, which Spark does not
fix across partitionings — so this implementation quantizes each
component to an integer grid (``round(x * 2^20)``) once up front and
runs every subsequent step in exact 64-bit integer arithmetic:

- distances are integer sums of squared differences (codegen'd
  ``zip_with``/``aggregate``, no Python, no shuffle);
- the argmin tie-breaks on the lowest centroid id (a total order, so
  the assignment is unique);
- centroid updates are per-dimension integer sums with truncating
  division (``div`` — matching DuckDB's ``//`` exactly), so every
  round's centroids are bit-identical on any cluster layout;
- clusters that lose their last member drop out (deterministic, and
  the mirror of what the SQL restatement computes).

Quantization error is bounded by half a grid step per component
(~5e-7 of the unit cube), far below any meaningful cluster geometry;
what it buys is a clustering that is REPRODUCIBLE — the same result
at sf0.001 under pytest, at sf0.01 under the driver's value-hash
gate, and on a 1000-executor run of the same data.

Scale shape per iteration: one narrow codegen pass for assignment (K
literal centroid arrays ride the closure — K*dim longs, negligible),
one posexplode + two-level aggregate for the update (map-side partial
aggregation collapses each task's contribution to at most K*dim rows,
so the shuffle moves O(K * dim * tasks), never O(rows)), and one
K*dim-row collect to refresh the centroid literals — the PageRank
pattern: scalar-sized driver traffic per round, never row data.

Reference parity: the reference engine ships no clustering operator;
this extends the similarity/dedup tier (SURVEY.md tier 5) the same
way IVF cells do (operators/similarity.py), and shares their
quantized-embedding conventions (operators/linalg.py:240-297).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: Quantization grid: embeddings live in ~[-0.5, 0.5], so components
#: fit in ~2^19 steps; squared distances are then <= dim * 2^40 —
#: comfortably inside int64 headroom for any realistic dimension.
QUANT_SCALE = 1 << 20


def quantize_vec(vec_col: str | Column, scale: int = QUANT_SCALE) -> Column:
    """``array<float>`` -> ``array<long>`` on the integer grid.

    The float32 -> float64 promotion and the * 2^20 are both exact, so
    the only rounding is the final half-away-from-zero ROUND — the
    same operation DuckDB's ``ROUND(DOUBLE)`` performs, which keeps
    the quantized vectors bit-identical between engine and oracle.
    """
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def _dist_sq(qcol: Column, centroid: list[int]) -> Column:
    """Exact integer squared L2 distance to one literal centroid."""
    lit = F.lit([int(v) for v in centroid]).cast("array<bigint>")
    return F.aggregate(
        F.zip_with(qcol, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_kernel(centroids: dict[int, list[int]]):
    """Arrow kernel for the argmin assignment: the k centroids ride the
    task closure as one (k, dim) int64 matrix; each batch computes all
    k exact integer squared distances vectorized and takes the argmin.

    Equivalence with the expression form: int64 sums commute (exact in
    any order) and ``np.argmin`` returns the FIRST minimum, which with
    centroid rows ordered by ascending cid is exactly the
    (dist_sq, cid) lexicographic ``array_min`` tie-break.
    """
    cids = sorted(centroids)
    cmat = np.asarray([centroids[c] for c in cids], dtype=np.int64)
    ids = np.asarray(cids, dtype=np.int64)

    @pandas_udf("cluster long, dist_sq long")
    def f(q: pd.Series) -> pd.DataFrame:
        if len(q) == 0:
            return pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int64"),
                    "dist_sq": pd.Series([], dtype="int64"),
                }
            )
        if q.isna().any():
            # The expression path yields a null assignment for a null
            # vector; this kernel (dim > UNROLL_MAX_DIM only) requires
            # non-null fixed-dim vectors — fail loudly, not inside
            # np.stack (r12 ADVICE).
            raise ValueError(
                "assign_clusters Arrow kernel requires non-null "
                "fixed-dimension vectors; got a null embedding"
            )
        qmat = np.stack(q.to_numpy()).astype(np.int64)
        d = np.empty((qmat.shape[0], cmat.shape[0]), dtype=np.int64)
        for j in range(cmat.shape[0]):
            diff = qmat - cmat[j]
            d[:, j] = np.einsum("nd,nd->n", diff, diff)
        best = d.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": ids[best],
                "dist_sq": d[np.arange(len(best)), best],
            }
        )

    return f


def assign_clusters(
    quantized: DataFrame, centroids: dict[int, list[int]], q_col: str = "q"
) -> DataFrame:
    """Add ``(cluster, dist_sq)`` = argmin over the k centroids.

    Contract: above ``linalg.UNROLL_MAX_DIM`` every vector must be
    non-null with the centroids' dimension (the Arrow kernel raises a
    clear error otherwise; the expression path below the cutoff yields
    null assignments for null vectors — callers feeding user data
    filter nulls first).

    Small vectors (dim <= linalg.UNROLL_MAX_DIM) build an array of
    (dist_sq, cid) structs and take ``array_min`` — struct ordering is
    lexicographic, so equal distances resolve to the lowest centroid
    id, a total order that makes the assignment unique (and hash-gate
    stable) — pure codegen, no shuffle, no Python. Larger vectors
    dispatch to the Arrow kernel (:func:`_assign_kernel`), the same
    cutoff rule as ``linalg.dot``: at dim 64 the k-way
    ``aggregate``/``zip_with`` expression tree costs the DRIVER
    ~1.2 s of analysis/optimization per Lloyd round (new literals
    every round defeat any plan cache; measured in the r12 profile —
    4 assignment plans ≈ 3.4 s of driver-side gap on a 1.1 s-of-jobs
    query), while the kernel's plan is one constant-size
    ArrowEvalPython node with identical integer results.
    """
    dim = len(next(iter(centroids.values())))
    from sressentials_spark.operators.linalg import UNROLL_MAX_DIM

    if dim > UNROLL_MAX_DIM:
        best = _assign_kernel(centroids)(F.col(q_col))
        return (
            quantized.withColumn("_best", best)
            .withColumn("cluster", F.col("_best.cluster"))
            .withColumn("dist_sq", F.col("_best.dist_sq"))
            .drop("_best")
        )
    cands = F.array(
        *[
            F.struct(
                _dist_sq(F.col(q_col), vec).alias("d"),
                F.lit(int(cid)).cast("long").alias("c"),
            )
            for cid, vec in sorted(centroids.items())
        ]
    )
    best = F.array_min(cands)
    return quantized.withColumn("cluster", best["c"]).withColumn(
        "dist_sq", best["d"]
    )


def kmeans_quantized(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Lloyd's k-means on the integer grid; returns final assignments.

    Init: the quantized vectors of the ``k`` lowest ids (deterministic
    — no RNG to disagree about). Each of ``iters`` rounds assigns
    (codegen argmin) then updates centroids as per-dimension truncated
    integer means (posexplode -> map-side-combinable (cluster, dim)
    aggregate -> K*dim-row collect); a final assignment against the
    settled centroids produces the output
    ``(id_col, cluster BIGINT, dist_sq BIGINT)``.
    """
    quantized = emb.select(
        F.col(id_col), quantize_vec(vec_col, scale).alias("q")
    )
    centroids = kmeans_fit_centroids(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale
    )
    return assign_clusters(quantized, centroids).select(
        id_col, "cluster", "dist_sq"
    )


def kmeans_fit_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> dict[int, list[int]]:
    """The Lloyd's training loop alone: returns the settled integer
    centroids (``{cid: components}``, empty clusters dropped) without
    the final assignment pass — the piece a TRAINED coarse quantizer
    (IVF-PQ's cell structure, operators/similarity.py) shares with
    :func:`kmeans_quantized`. Driver traffic is K*dim longs per round,
    identical to the full clustering."""
    quantized = emb.select(
        F.col(id_col), quantize_vec(vec_col, scale).alias("q")
    )
    init = quantized.orderBy(id_col).limit(k).collect()
    centroids = {i: list(r["q"]) for i, r in enumerate(init)}

    for _ in range(iters):
        asg = assign_clusters(quantized, centroids)
        rows = (
            asg.select("cluster", F.posexplode("q").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cluster", "pos", F.expr("s div n").alias("comp"))
            .collect()
        )
        next_c: dict[int, dict[int, int]] = {}
        for r in rows:
            next_c.setdefault(r["cluster"], {})[r["pos"]] = r["comp"]
        # Empty clusters drop (deterministically) — mirrored by the
        # SQL restatement, whose update CTE simply has no row for them.
        centroids = {
            cid: [dims[p] for p in sorted(dims)] for cid, dims in next_c.items()
        }
    return centroids


def kmeans_oracle_ctes(
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
    scale: int = QUANT_SCALE,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB CTE chain restating :func:`kmeans_quantized` exactly.

    Unrolls the ``iters`` rounds (quantize -> c0 -> a0 -> c1 -> a1 ...)
    so the final assignment CTE ``afin`` is plain ANSI-ish SQL the
    driver can execute; integer quantization, truncated ``//`` means,
    and the (dist, cid) tie-break all match the engine bit-for-bit.
    """
    parts = [
        f"emb AS (SELECT {id_col}, "
        f"[CAST(ROUND(x * {float(scale)}) AS BIGINT) for x in {vec_col}] AS q "
        f"FROM {table})",
        f"c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cid, q AS cq "
        f"FROM emb ORDER BY {id_col} LIMIT {k})",
    ]

    def assign(name: str, cents: str) -> str:
        return (
            f"{name} AS (SELECT {id_col}, q, cluster, dist_sq FROM ("
            f"SELECT {id_col}, q, cluster, dist_sq, "
            f"ROW_NUMBER() OVER (PARTITION BY {id_col} "
            f"ORDER BY dist_sq, cluster) AS rn FROM ("
            f"SELECT e.{id_col}, e.q, c.cid AS cluster, "
            f"CAST(list_sum([(e.q[j] - c.cq[j]) * (e.q[j] - c.cq[j]) "
            f"for j in generate_series(1, {dim})]) AS BIGINT) AS dist_sq "
            f"FROM emb e CROSS JOIN {cents} c)) WHERE rn = 1)"
        )

    for i in range(iters):
        parts.append(assign(f"a{i}", f"c{i}"))
        parts.append(
            f"c{i + 1} AS (SELECT cluster AS cid, "
            f"list(comp ORDER BY i) AS cq FROM ("
            f"SELECT a.cluster, g.i, "
            f"CAST(SUM(a.q[g.i]) AS BIGINT) // COUNT(*) AS comp "
            f"FROM a{i} a CROSS JOIN "
            f"(SELECT unnest(generate_series(1, {dim})) AS i) g "
            f"GROUP BY 1, 2) GROUP BY cluster)"
        )
    parts.append(assign("afin", f"c{iters}"))
    return "WITH " + ",\n".join(parts)
