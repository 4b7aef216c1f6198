"""Typed envelope schemas (schema-on-read with tolerant defaults).

The reference consumes a fixed envelope from each MongoDB log line
(``Mongo/mongo_parser.py:32-86``) with ``.get(key, default)``
tolerance. We declare exactly that envelope as a ``StructType`` so the
JSON parser skips unused subtrees (column pruning through
``from_json``), and keep the open-ended ``attr.command`` subtree as a
raw JSON string extracted with ``get_json_object`` — reproducing the
reference's dynamic access without an unstable inferred schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: Envelope actually consumed by the Mongo pipeline. ``attr.command``
#: is deliberately absent — it is open-ended and handled as raw JSON.
MONGO_ENVELOPE = T.StructType(
    [
        T.StructField("t", T.StructType([T.StructField("$date", T.StringType())])),
        T.StructField("s", T.StringType()),
        T.StructField("c", T.StringType()),
        T.StructField("msg", T.StringType()),
        T.StructField(
            "attr",
            T.StructType(
                [
                    T.StructField("ns", T.StringType()),
                    T.StructField("durationMillis", T.LongType()),
                    T.StructField("keysExamined", T.LongType()),
                    T.StructField("docsExamined", T.LongType()),
                    T.StructField("numYields", T.LongType()),
                    T.StructField("nreturned", T.LongType()),
                    T.StructField("planSummary", T.StringType()),
                    T.StructField(
                        "error",
                        T.StructType(
                            [
                                T.StructField("code", T.LongType()),
                                T.StructField("codeName", T.StringType()),
                                T.StructField("errmsg", T.StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)

#: Output sheet column orders (reference ``Mongo/mongo_parser.py:18-20``).
MONGO_DETAILED_COLUMNS = [
    "Command",
    "Collection",
    "AppName",
    "Duration(ms)",
    "KeysExamined",
    "DocsExamined",
    "numYields",
    "nreturned",
    "Filter",
    "Plan",
    "timestamp",
]
MONGO_ERROR_COLUMNS = [
    "OriginalLineNumber",
    "msg",
    "error",
    "errmsg",
    "totalCount",
    "SampleLine",
]
MONGO_STATS_COLUMNS = [
    "Query Pattern",
    "Executions",
    "Min Duration(ms)",
    "Max Duration(ms)",
    "Avg Duration(ms)",
    "Sample Full Query",
]
