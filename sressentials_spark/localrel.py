"""Driver-local small relations, shipped to the JVM as ONE Arrow batch.

``spark.createDataFrame(list_of_rows)`` parallelizes the rows into
``defaultParallelism`` pickled slices evaluated by Python workers — at
``local[32]`` that is 32 Python-worker round-trips per materialization
of a few-KB frame. Every ANN serve query builds two or three of these
(query vectors, probe lists, ADC distance tables) and they feed
broadcast exchanges, so each materialization re-pays the fan-out:
profiled at ~5-6 s of executor time across three 32-task stages inside
one ``sim_ivfpq_rerank_topk`` run (r12 profile), ~0.3 s wall per frame.

Routing the same rows through pandas + Arrow
(``createDataFrame(pdf, schema)``) builds the relation JVM-side from
one Arrow batch: no Python workers in the scan at all, measured 63-82
ms per materialization for both 5-row and 10k-row frames (vs 355-365
ms for the pickled-slice path). Partition count is 1, which is the
right layout for a broadcast side at any scale.

Column mapping is POSITIONAL (like the list-of-tuples path with an
explicit schema): the pandas frame is built with ordinal column names
and the session applies the schema's names/types in order.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """``rows`` (tuples or Rows) + ``schema`` (DDL string or StructType)
    → single-Arrow-batch DataFrame. Empty input and anything pandas/
    Arrow cannot round-trip falls back to the plain path (correct, just
    slower — and empty frames cost nothing either way)."""
    data = [tuple(r) for r in rows]
    if not data:
        return spark.createDataFrame(data, schema)
    try:
        pdf = pd.DataFrame(data, columns=list(range(len(data[0]))))
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(data, schema)
