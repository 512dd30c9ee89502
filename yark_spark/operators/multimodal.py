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


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
) -> DataFrame:
    """Image resize over binary payloads (mapInPandas, map-only). The pixel
    transform is STUBBED deterministically (real deployments plug
    PIL/cv2 into _resize_payload): output bytes = payload truncated/padded
    to a size proportional to the target area, so batch shapes and byte
    budgets behave like a real resize."""

    def _resize_payload(payload: bytes) -> bytes:
        area = target[0] * target[1]
        want = max(16, min(len(payload), area // 64))
        out = (payload * ((want // max(len(payload), 1)) + 1))[:want]
        return out

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [_resize_payload(bytes(p)) for p in pdf[payload_col]],
                    "width": target[0],
                    "height": target[1],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(_resize, schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Video frame sampling: one binary payload → n_frames (frame_idx,
    frame_bytes) rows via mapInPandas (a flat-map: output rows ≠ input
    rows). Frame extraction is STUBBED as deterministic byte slices; the
    real decoder drops into _slice. Downstream ops see the true shape:
    multiple typed frame rows per asset."""

    def _slice(payload: bytes, i: int) -> bytes:
        if not payload:
            return b""
        step = max(1, len(payload) // n_frames)
        return payload[i * step : i * step + step]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col])
                for i in range(n_frames):
                    ids.append(int(r[id_col]))
                    idxs.append(i)
                    frames.append(_slice(payload, i))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )
    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(_sample, schema)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column via
    mapInPandas: map-only (no shuffle), one pandas batch per Arrow chunk."""

    def _features(payload: bytes) -> tuple[int, int, str]:
        # local twin of fake_image_features: nested so cloudpickle ships it
        # BY VALUE — a module-level reference would make every Python
        # worker import yark_spark, which only works when the driver's
        # sys.path/cwd happens to reach the repo
        h = hashlib.sha1(payload).digest()
        return 64 + h[0] % 192, 64 + h[1] % 192, "RGB" if h[2] % 2 == 0 else "L"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = [_features(bytes(p)) for p in payloads]
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
