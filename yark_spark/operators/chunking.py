"""Content-defined chunking (CDC) — split documents at positions chosen by
the CONTENT (rolling-hash boundaries), not at fixed offsets, so an edit
early in a document shifts at most one chunk instead of re-chunking the
whole tail. The primitive under storage-level dedup (LBFS/rsync lineage)
and long-document near-dup at chunk granularity.

Scale design: the chunker is a per-row computation — `mapInPandas` with a
polynomial rolling hash (one O(n) pass per document, Arrow-batched, zero
shuffle). The boundary rule is a pure function of a fixed-width character
window, so chunk boundaries are deterministic under retries,
repartitioning, and re-execution. A column-expression variant with an md5
window rule (`cdc_boundaries_expr`) pins the boundary algebra against the
DuckDB oracle on a bounded slice (`q_cdc_boundaries`); the rolling-hash
path is the production shape (`q_cdc_chunks`, rows-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

#: polynomial base for the rolling hash (odd, > alphabet)
_BASE = 257
#: 61-bit Mersenne prime modulus
_MOD = (1 << 61) - 1


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 16,
    mask_bits: int = 6,
    min_len: int = 32,
    max_len: int = 1024,
) -> DataFrame:
    """Chunk each document at content-defined boundaries.

    A boundary closes a chunk at byte position i when the rolling hash of
    the trailing ``window`` bytes has its low ``mask_bits`` bits zero
    (expected chunk length ≈ 2^mask_bits bytes), subject to ``min_len`` /
    ``max_len`` guards — the standard LBFS construction: min_len
    suppresses degenerate tiny chunks, max_len forces progress through
    low-entropy runs.

    Returns (id, chunk_idx, chunk_start, chunk_len) over the UTF-8 byte
    string, 0-based starts; chunks tile the document exactly
    (sum(chunk_len) == byte length, starts contiguous — asserted in
    tests/test_chunking.py). Map-only: no shuffle at any scale.
    """
    schema = StructType(
        [
            df.schema[id_col],
            StructField("chunk_idx", IntegerType()),
            StructField("chunk_start", LongType()),
            StructField("chunk_len", LongType()),
        ]
    )
    mask = (1 << mask_bits) - 1

    def _chunk(batches):
        import pandas as pd

        pow_out = pow(_BASE, window - 1, _MOD)

        def chunk_one(text: str) -> list[tuple[int, int, int]]:
            data = (text or "").encode("utf-8")
            n = len(data)
            if n == 0:
                return [(0, 0, 0)]
            out = []
            start = idx = 0
            h = 0
            # the hash ALWAYS covers the trailing `window` bytes, rolling
            # across chunk boundaries — the boundary test must depend only
            # on local content so chunking RESYNCHRONIZES after an edit
            # (the content-defined property; asserted in tests)
            for i in range(n):
                if i >= window:
                    h = (h - data[i - window] * pow_out) % _MOD
                h = (h * _BASE + data[i]) % _MOD
                length = i - start + 1
                boundary = (
                    i + 1 >= window and length >= min_len and (h & mask) == 0
                )
                if boundary or length >= max_len:
                    out.append((idx, start, length))
                    idx += 1
                    start = i + 1
            if start < n:
                out.append((idx, start, n - start))
            return out

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                for idx, start, length in chunk_one(text):
                    rows.append((rid, idx, start, length))
            yield pd.DataFrame(
                rows, columns=[id_col, "chunk_idx", "chunk_start", "chunk_len"]
            )

    return df.select(id_col, text_col).mapInPandas(_chunk, schema)


def cdc_boundaries_expr(text: Column, window: int = 8, prefix: str = "0") -> Column:
    """Oracle-checkable boundary rule as a pure column expression: 1-based
    positions i where md5 of the ``window``-char substring starting at i
    begins with ``prefix`` (P(boundary) = 16^-len(prefix) per position).
    Same md5 hex in both engines, same 1-based character substr semantics
    → the boundary ALGEBRA is pinned by the differential oracle even
    though the production path uses the rolling hash (an md5 per position
    is O(n·w) — fine for a bounded audit slice, wrong at scale). Texts
    shorter than ``window`` have no boundary (empty array)."""
    positions = F.sequence(F.lit(1), F.greatest(F.length(text) - (window - 1), F.lit(1)))
    bounds = F.filter(
        positions, lambda i: F.md5(F.substring(text, i, F.lit(window))).startswith(prefix)
    )
    return F.when(F.length(text) >= window, bounds).otherwise(
        F.array().cast("array<integer>")
    )
