"""Bucketized time-range join.

Open-source Spark has no range-join optimization: a join whose only
predicate is an interval/band condition falls back to a broadcast
nested-loop (or worse, a cartesian) join. The standard at-scale
rewrite — what a planner with range-join support generates internally —
is bucketization: quantize the ordering key into band-width buckets,
explode one side to its neighboring buckets, equi-join on
``(bucket, partition keys)``, then re-check the exact band predicate
on the survivors. Every candidate pair shares a bucket, so the
equi-join shuffle replaces the quadratic comparison; each true pair is
produced exactly once because the build side keeps its single home
bucket.

Scale posture: shuffle keys are ``(bucket, keys)`` — time buckets are
uniform for steady event flow; a flash-crowd bucket is the classic
skew case and takes the same salting treatment as any hot key (see
``pipeline.salted_agg``). Probe-side fan-out is a fixed 3×.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default band: ±5 minutes, in microseconds.
DEFAULT_BAND_US = 300 * 1_000_000


def time_band_counts(
    events: DataFrame,
    band_us: int = DEFAULT_BAND_US,
    id_col: str = "event_id",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Per event: how many other events with the same ``keys`` fall
    within ``±band_us`` of its timestamp.

    Returns ``(id_col, *keys, ts_col, n_concurrent)`` with one row per
    input event (zero-match events kept via a left join against the
    pair counts).
    """
    base = events.select(
        F.col(id_col),
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
    )
    # Integer bucket index: band-width buckets guarantee that any pair
    # within the band differs by at most one bucket.
    with_bucket = base.withColumn("_b", F.expr(f"_us div {band_us}"))
    probe = with_bucket.withColumn(
        "_nb", F.explode(F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1))
    )
    build = with_bucket.select(
        F.col(id_col).alias("_rid"),
        *[F.col(k).alias(f"_r_{k}") for k in keys],
        F.col("_us").alias("_rus"),
        F.col("_b").alias("_rb"),
    )
    key_eq = [probe["_nb"] == build["_rb"]] + [
        probe[k] == build[f"_r_{k}"] for k in keys
    ]
    cond = reduce(lambda a, b: a & b, key_eq)
    pairs = probe.join(build, cond & (probe[id_col] != build["_rid"])).filter(
        F.abs(F.col("_rus") - F.col("_us")) <= band_us
    )
    counts = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_concurrent"))
    return (
        base.join(counts, id_col, "left")
        .select(
            id_col,
            *keys,
            ts_col,
            F.coalesce(F.col("n_concurrent"), F.lit(0)).cast("long").alias(
                "n_concurrent"
            ),
        )
    )


def time_band_counts_oracle_sql(
    table: str = "events",
    band_us: int = DEFAULT_BAND_US,
    id_col: str = "event_id",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
) -> str:
    """DuckDB restatement: the naive correlated band count (the oracle
    states the *semantics*; the engine ships the bucketized plan)."""
    key_preds = " AND ".join(f"b.{k} = a.{k}" for k in keys)
    return f"""
SELECT a.{id_col}, {', '.join(f'a.{k}' for k in keys)}, a.{ts_col},
       CAST((SELECT COUNT(*) FROM {table} b
             WHERE {key_preds}
               AND b.{id_col} <> a.{id_col}
               AND abs(epoch_us(b.{ts_col}) - epoch_us(a.{ts_col})) <= {band_us})
            AS BIGINT) AS n_concurrent
FROM {table} a
"""
