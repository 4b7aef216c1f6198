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


#: Resize target: fixed output payload size (truncate + 0x20-pad) —
#: the byte-level stand-in for an image resize, keeping the Pandas-UDF
#: plumbing real while the codec is stubbed.
RESIZE_BYTES = 128

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("n_bytes_out", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = RESIZE_BYTES) -> DataFrame:
    """Fixed-size payload resize via Arrow-batched ``mapInPandas``.

    Decodes (stub), truncates/pads each payload to ``target_bytes``
    (pad byte 0x20), and emits the resized payload's hex-md5 — the same
    checksum convention as :func:`sample_frames`, so the SQL oracle can
    restate the padded byte string with ``substring``/``repeat`` over
    the hex encoding. A real build swaps the byte-level transform for a
    pixel-level resample inside the same batch loop; the Spark plumbing
    (schema, Arrow batches, narrow no-shuffle shape) is identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "mime": [m["mime"] for m in pdf["meta"]],
                "n_bytes_in": [],
                "n_bytes_out": [],
                "resized_md5": [],
            }
            for b, m in zip(pdf["payload"], pdf["meta"]):
                decoded = decode_media(bytes(b), m["mime"])
                resized = decoded[:target_bytes].ljust(target_bytes, b"\x20")
                out["n_bytes_in"].append(len(decoded))
                out["n_bytes_out"].append(len(resized))
                out["resized_md5"].append(
                    hashlib.md5(resized.hex().upper().encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, RESIZE_SCHEMA)


def resize_media_oracle_sql(
    table: str = "documents", target_bytes: int = RESIZE_BYTES
) -> str:
    """DuckDB restatement of :func:`resize_media` over text payloads."""
    t = target_bytes
    return f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM {table}
)
SELECT doc_id,
       'text/plain' AS mime,
       n_bytes AS n_bytes_in,
       CAST({t} AS BIGINT) AS n_bytes_out,
       md5(substring(hx, 1, 2 * least(n_bytes, {t}))
           || repeat('20', greatest({t} - n_bytes, 0))) AS resized_md5
FROM m
"""


#: Frame-sampling geometry: payload bytes per "frame" and the sampling
#: stride (keep every stride-th frame). For real video these come from
#: the container metadata; the byte-window framing is the deterministic
#: stand-in that keeps the plumbing oracle-checkable.
FRAME_BYTES = 256
FRAME_STRIDE = 4


def sample_frames(
    media: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Strided frame sampling over binary payloads — pure JVM plumbing.

    Treats each payload as ``ceil(n_bytes / frame_bytes)`` fixed-size
    frames and emits one row per sampled frame (indices ``0, stride,
    2*stride, …``) with its byte window and an md5 over the window's
    hex encoding (hex because the SQL oracle can slice strings but not
    blobs — the hex string encodes the same bytes 1:1).

    Shape: ``sequence`` + ``explode`` inside whole-stage codegen — no
    Python, no shuffle; fan-out is ``n_frames/stride`` rows per
    payload. The decode step for real codecs plugs in per-frame AFTER
    this sampling (that is the point: sample first, decode only the
    kept frames — at 100 TB the decode is the expensive stage).
    """
    n_frames = F.expr(
        f"(meta.n_bytes + {frame_bytes - 1}) div {frame_bytes}"
    ).cast("long")
    base = media.select(
        "doc_id",
        F.hex(F.col("payload")).alias("_hex"),
        F.col("meta.n_bytes").alias("n_bytes"),
        n_frames.alias("n_frames"),
    )
    idxs = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.lit(stride).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    fr = base.select(
        "doc_id", "n_frames", "n_bytes", "_hex", F.explode(idxs).alias("frame_idx")
    )
    byte_start = F.col("frame_idx") * frame_bytes
    byte_len = F.least(F.lit(frame_bytes).cast("long"), F.col("n_bytes") - byte_start)
    return fr.select(
        "doc_id",
        "n_frames",
        "frame_idx",
        byte_start.alias("byte_start"),
        byte_len.alias("byte_len"),
        F.md5(
            F.substring(F.col("_hex"), byte_start * 2 + 1, byte_len * 2).cast("binary")
        ).alias("frame_md5"),
    )


def sample_frames_oracle_sql(
    table: str = "documents",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> str:
    """DuckDB restatement of :func:`sample_frames` over the text-backed
    payloads of :func:`attach_payload`."""
    return f"""
WITH m AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM {table}
),
f AS (SELECT doc_id, hx, n_bytes,
             CAST((n_bytes + {frame_bytes - 1}) // {frame_bytes} AS BIGINT)
               AS n_frames
      FROM m),
g AS (SELECT doc_id, hx, n_bytes, n_frames,
             unnest(CASE WHEN n_frames > 0
                    THEN generate_series(0, n_frames - 1, {stride})
                    ELSE []::BIGINT[] END) AS frame_idx
      FROM f)
SELECT doc_id, n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * {frame_bytes} AS BIGINT) AS byte_start,
       CAST(least({frame_bytes}, n_bytes - frame_idx * {frame_bytes}) AS BIGINT)
         AS byte_len,
       md5(substring(hx, frame_idx * {frame_bytes} * 2 + 1,
                     least({frame_bytes}, n_bytes - frame_idx * {frame_bytes}) * 2))
         AS frame_md5
FROM g
"""


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
