"""Streaming progress / ETA surface — X13 parity
(`utils.py:41-43` ``step_format``: ``elapsed * (length/position - 1)``).

The reference prints a per-item ``[position / length] ETA`` line from its
sequential loops. The Spark-idiomatic equivalent is a
``StreamingQueryListener``: micro-batch progress events carry row counts
and timings, from which the same ETA arithmetic falls out when the total
workload size is known. Works for any streaming query (the history ingest
pipelines in streaming/pipelines.py included) without touching the data
path — observability lives entirely on the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

try:  # pyspark 3.4+ exposes the Python listener API
    from pyspark.sql.streaming import StreamingQueryListener

    LISTENER_AVAILABLE = True
except ImportError:  # pragma: no cover
    StreamingQueryListener = object
    LISTENER_AVAILABLE = False


def eta_seconds(elapsed: float, position: int, length: int) -> float:
    """The reference's estimator (`utils.py:41-43`), clamped at 0:
    remaining ≈ elapsed × (length/position − 1)."""
    if position <= 0:
        return float("inf")
    return max(0.0, elapsed * (length / position - 1))


@dataclass
class ProgressSnapshot:
    rows_processed: int = 0
    batches: int = 0
    started_at: float = field(default_factory=time.monotonic)
    last_rows_per_sec: float = 0.0

    def eta(self, total_rows: int) -> float:
        return eta_seconds(
            time.monotonic() - self.started_at, self.rows_processed, total_rows
        )


class IngestProgressListener(StreamingQueryListener):
    """Accumulates per-query progress; ``snapshot(query_id)`` returns the
    running totals, ``eta(query_id, total_rows)`` the reference-style
    estimate. Attach with ``spark.streams.addListener``."""

    def __init__(self):
        self._by_query: dict[str, ProgressSnapshot] = {}

    def snapshot(self, query_id: str) -> ProgressSnapshot:
        return self._by_query.setdefault(str(query_id), ProgressSnapshot())

    # -- listener callbacks (called by Spark's listener bus) --------------

    def onQueryStarted(self, event) -> None:
        self._by_query[str(event.id)] = ProgressSnapshot()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        snap = self.snapshot(p.id)
        snap.rows_processed += int(p.numInputRows)
        snap.batches += 1
        snap.last_rows_per_sec = float(p.processedRowsPerSecond or 0.0)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover - no-op
        pass
