"""Multimodal (binary) column plumbing (SURVEY.md §2.10).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features derived from the raw
bytes) — but every Spark-side piece a real pipeline needs is real and
tested: the binary schema, the Arrow-batched ``mapInPandas`` transform
shape, partition-sized batching, and metadata extraction with built-in
functions.

Swap ``_fake_decode`` for PIL/ffmpeg in production; nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "doc_id LONG, byte_len LONG, sha256 STRING"
)

FEATURE_SCHEMA = (
    "doc_id LONG, width LONG, height LONG, channels LONG, checksum LONG"
)


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column (UTF-8 bytes of the text —
    stands in for image bytes) plus typed metadata, all JVM-side."""
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("blob"),
        F.octet_length(blob).cast("long").alias("byte_len"),
        F.sha2(blob, 256).alias("sha256"),
    )


def blob_metadata(docs: DataFrame) -> DataFrame:
    """Binary metadata without ever materializing the blob twice."""
    return with_blob(docs).select("doc_id", "byte_len", "sha256")


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """STUB decode: deterministic fake image features from raw bytes.

    A real implementation would do ``PIL.Image.open(io.BytesIO(b))``;
    this container has no codecs (``pip install`` unavailable), so the
    features are pure functions of the byte stream — which keeps the
    operator oracle-checkable end-to-end.
    """
    lens = batch["blob"].map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "width": (lens % 256).astype("int64"),
            "height": ((lens // 256) % 256).astype("int64"),
            "channels": pd.Series([3] * len(batch), dtype="int64"),
            "checksum": ((lens * 2654435761) % 2147483647).astype("int64"),
        }
    )


def decode_features(docs: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary blobs.

    ``mapInPandas`` so each Python worker sees whole Arrow batches
    (never row-at-a-time), the normal shape for CPU-bound media decode
    at scale.  ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
    batch memory when blobs are large.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _fake_decode(b)

    return with_blob(docs).select("doc_id", "blob").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(docs: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """STUB for video frame sampling: emits one row per sampled offset.

    Real pipelines explode a video blob into frame rows; the stub
    derives frame offsets from byte length so the explode/partition
    shape (1 blob row → N frame rows) is exercised for real.
    """
    wb = with_blob(docs)
    offsets = F.sequence(
        F.lit(0),
        F.greatest((F.col("byte_len") - 1) / every_n_bytes, F.lit(0)).cast("long"),
    )
    return wb.select("doc_id", F.explode(offsets).alias("frame_no")).select(
        "doc_id",
        "frame_no",
        (F.col("frame_no") * every_n_bytes).cast("long").alias("byte_offset"),
    )
