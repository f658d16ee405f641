"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a small typed
metadata struct. The decode step is STUBBED (no image/audio libs in this
container — see ``decode_image``), but the Spark-side plumbing is real:
Arrow-batched ``mapInPandas`` over binary columns, schema, partitioning,
batch shape — all tested.

The demo payload is the UTF-8 encoding of document text (deterministic, so
the feature extractor is oracle-checkable: byte-sum == ascii-sum for the
ASCII corpus).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("first_byte", IntegerType()),
    StructField("byte_sum", LongType()),
])


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap text docs as opaque binary payloads (the multimodal carrier)."""
    return documents.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode requires PIL/cv2, absent in this container."""
    raise NotImplementedError(
        "image decode stub: wire PIL.Image.open(io.BytesIO(payload)) here")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized per-batch feature extraction over binary payloads.

    This is the pattern a real decoder plugs into: numpy over the Arrow
    batch, never per-row Python objects crossing the boundary one at a
    time. frombuffer keeps it zero-copy per payload.
    """
    for pdf in batches:
        n = len(pdf)
        n_bytes = np.empty(n, dtype=np.int32)
        first = np.empty(n, dtype=np.int32)
        bsum = np.empty(n, dtype=np.int64)
        for i, payload in enumerate(pdf["payload"].values):
            arr = np.frombuffer(payload, dtype=np.uint8)
            n_bytes[i] = arr.size
            first[i] = int(arr[0]) if arr.size else -1
            bsum[i] = int(arr.sum())
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].values,
            "n_bytes": n_bytes,
            "first_byte": first,
            "byte_sum": bsum,
        })


def media_features(documents: DataFrame) -> DataFrame:
    """binary → features via Arrow-batched mapInPandas (the slow-path
    escape hatch, used only because byte inspection can't be a built-in)."""
    media = documents_as_media(documents)
    return media.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


def media_feature_stats(documents: DataFrame) -> DataFrame:
    """Aggregate the extracted features per first-byte class — bounded,
    oracle-checkable output."""
    return (
        media_features(documents)
        .groupBy("first_byte")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_bytes").cast("bigint").alias("sum_bytes"),
             F.sum("byte_sum").cast("bigint").alias("sum_byte_sum"))
    )
