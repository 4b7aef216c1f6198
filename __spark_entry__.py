"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in :mod:`sressentials_spark.catalog`, the
engine's named-query registry; this module is a thin adapter.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sressentials_spark.catalog import ORACLE_SQL, QUERIES

_SMOKE_SF_DIR = "/root/testdata/sf0.001"
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _ever_rowed() -> set[str]:
    """Names that already have a row in some committed CORRECTNESS artifact.

    The driver records at most 50 query rows per round; ordering the
    registry never-rowed-first rotates coverage so every registered
    query eventually has a hard row in a committed driver artifact.
    Only driver-written ``CORRECTNESS_r{N}.json`` files feed the ledger
    (not the locally-run full ``CORRECTNESS_LOCAL_r{N}.json`` mirrors),
    so rotation keeps targeting queries the *driver* has never rowed.
    """
    rowed: set[str] = set()
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r[0-9]*.json")):
        try:
            with open(path) as fh:
                data = json.load(fh)
            if isinstance(data, dict):
                rowed.update(data.keys())
        except (OSError, ValueError):
            continue
    return rowed


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the Mongo slow-query pattern report, end-to-end.

    Renders a structured Mongo log from ``sf0.001/events.parquet``,
    parses it with the engine (scan → JSON parse → route → project →
    normalize → aggregate → sort) and returns the per-pattern stats.
    """
    return QUERIES["mongo_query_stats"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2 + tier 5).

    Ordered never-driver-rowed-first so the driver's 50-row/round
    correctness artifact rotates through the whole registry.
    """
    rowed = _ever_rowed()
    names = sorted(QUERIES, key=lambda n: (n in rowed, n))
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLE_SQL)
