"""Multimodal (binary) column plumbing — SURVEY.md §2.8 E4.

The reference stores raw image bytes in `videos.thumbnail BLOB`
(`schema.sql:49`, fetched at `cmds/archive.py:88-91`, dumped back to files
at `:201-221`). Here binary payloads are first-class `BinaryType` columns
with typed metadata, processed by Arrow-batched pandas functions via
``mapInPandas`` — the Spark-side plumbing (schema, batching, partitioning)
is real; the actual image/audio decode is STUBBED deterministically because
decode libraries aren't in this container (decode_image raises
NotImplementedError; fake_image_features derives metadata from the bytes).

Scale notes: binary rows are big — keep them out of shuffles. All feature
extraction here is map-only (mapInPandas, no keys), and downstream joins
should carry the extracted features, never the bytes. maxPartitionBytes
governs scan granularity; rows stay within a single task end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of extract_features — typed metadata alongside the id.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha1_8", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("fake_mode", StringType()),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — NOT IMPLEMENTED in this container (no PIL/cv2).

    The production deployment plugs a decoder in here; everything around it
    (schemas, batching, partition flow) is already exercised via
    fake_image_features.
    """
    raise NotImplementedError("image decode requires an image library not present in this container")


def fake_image_features(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode: derive (width, height, mode) from
    a sha1 of the bytes so tests are stable and collision-free."""
    h = hashlib.sha1(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mode = "RGB" if h[2] % 2 == 0 else "L"
    return width, height, mode


def with_binary_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio bytes;
    the fixture tables carry no blobs)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8").cast(BinaryType()))


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column via
    mapInPandas: map-only (no shuffle), one pandas batch per Arrow chunk."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = [fake_image_features(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha1_8": [hashlib.sha1(bytes(p)).hexdigest()[:8] for p in payloads],
                    "fake_width": [f[0] for f in feats],
                    "fake_height": [f[1] for f in feats],
                    "fake_mode": [f[2] for f in feats],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(_extract, FEATURE_SCHEMA)
