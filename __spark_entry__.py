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


#: Queries that must be re-rowed this round regardless of ledger
#: freshness (cleared once their fresh green row lands). r9: empty —
#: the 10 r8 changed-semantics queries landed green in
#: CORRECTNESS_r08.json, so the force list's job is done. Budget math
#: (tests/test_entry_rotation.py): 0 forced + new registrations +
#: the 46 stale-r5 rows must fit the 50-row budget, so r9 caps new
#: registrations at ≤4 and the entire r5 backlog refreshes via the
#: stalest-first ordering.
#: r9: sim_ivfpq_rerank_topk moved to the M=8 rerank-tier index (the
#: M sweep, docs/ANN_EVAL.md) — its r8 row is for the old M=4
#: semantics, so it must re-row this round. Budget: 1 forced + 3 new
#: (sim_ivfpq_index_ingest, sim_ivfpq_rerank_recall_at_k,
#: sim_ivf_versioned_lifecycle_topk) + 46 stale-r5 = 50 <= 50.
#: r11: empty — both r10 forced entries (sim_ivfpq_rerank_topk,
#: sim_ivfpq_rerank_recall_at_k) landed green in CORRECTNESS_r10.json,
#: so the force list's job is done. Budget math: 0 forced + 5 new
#: registrations + 45 stale-r7 rows = 50 <= 50.
_FORCE_FIRST: tuple[str, ...] = ()


def _last_rowed_round() -> dict[str, int]:
    """Latest driver round that rowed each query name.

    The driver records at most 50 query rows per round. With every
    registered query now rowed at least once, never-rowed-first ordering
    degenerates to alphabetical and stale rows never refresh; ordering
    least-recently-rowed-first instead means a regression in any query
    surfaces in a committed driver artifact within ~2 rounds. Only
    driver-written ``CORRECTNESS_r{N}.json`` files feed the ledger (not
    the locally-run full ``CORRECTNESS_LOCAL_r{N}.json`` mirrors).
    """
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r[0-9]*.json")):
        try:
            rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):-len(".json")])
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name in data:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the Mongo slow-query pattern report, end-to-end.

    Renders a structured Mongo log from ``sf0.001/events.parquet``,
    parses it with the engine (scan → JSON parse → route → project →
    normalize → aggregate → sort) and returns the per-pattern stats.
    """
    return QUERIES["mongo_query_stats"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2 + tier 5).

    Ordered least-recently-driver-rowed-first (never-rowed counts as
    round 0) so the driver's 50-row/round correctness artifact keeps
    rotating through the whole registry; queries in ``_FORCE_FIRST``
    (just-fixed oracles needing a fresh row) jump the queue.
    """
    latest = _last_rowed_round()
    force = {n: i for i, n in enumerate(_FORCE_FIRST)}
    names = sorted(
        QUERIES,
        key=lambda n: (force.get(n, len(force)), latest.get(n, 0), n),
    )
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLE_SQL)
