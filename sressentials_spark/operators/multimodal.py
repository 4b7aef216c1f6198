"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct (mime, byte size) — the layout a 100 TB
multimodal corpus uses (payload bytes stay columnar/compressed in
parquet; metadata predicates prune without touching payloads).

Feature extraction runs as an Arrow-batched ``mapInPandas`` (the
documented slow-path escape hatch — the *only* Python-side operator in
the engine): the Spark plumbing (schema, batch iteration, partition
preservation) is real and oracle-tested. The actual image/audio codec
step is STUBBED — this container ships no decode libs — behind
:func:`decode_media`, which raises ``NotImplementedError`` for real
media types and applies a deterministic byte-level fallback for
``text/plain`` so the pipeline shape is exercised end-to-end.

Because the testdata payloads are utf-8 text bytes, every extracted
feature (byte length, md5 checksum, head-byte sum) is independently
recomputable in SQL — giving the Pandas-UDF path a DuckDB oracle,
which UDF pipelines almost never get.
"""

from __future__ import annotations

from collections.abc import Iterator
import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Feature schema produced by :func:`extract_features`.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("head_sum", T.LongType()),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a multimodal table: ``(doc_id, payload
    binary, meta struct<mime, n_bytes>)``."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """STUB: codec step for real media types.

    Image/audio/video decoding requires libs absent from this
    environment; a production build plugs pillow/ffmpeg and returns
    pixel/sample arrays here. ``text/plain`` passes through so the
    surrounding Spark plumbing stays fully testable.
    """
    if mime == "text/plain":
        return payload
    raise NotImplementedError(
        f"decode_media: no codec for {mime!r} in this environment (stub)"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Narrow (no shuffle), batch-vectorized; each executor sees an
    iterator of Arrow-backed pandas batches.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [decode_media(bytes(b), m["mime"]) for b, m in zip(pdf["payload"], pdf["meta"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(b) for b in payloads],
                    "checksum": [hashlib.md5(b).hexdigest() for b in payloads],
                    "head_sum": [sum(b[:8]) for b in payloads],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
