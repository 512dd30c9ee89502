"""Distributed fetch layer — S1 (yt-dlp extract), S2 (Wayback fallback
retry), S3 (RYD ratings), S4 (thumbnail bytes) re-expressed as partition-
parallel dataflow (`cmds/archive.py:58-103`, SURVEY.md §2.1).

The reference fetches strictly sequentially, one HTTP call at a time; here
an id-list DataFrame flows through ``mapInPandas`` so each partition
fetches concurrently (parallelism = #partitions, tunable independent of
cores). The actual network callable is INJECTED — this container has no
network, so tests use fakes; production plugs yt-dlp/requests in without
touching the dataflow.

Retry/backoff (P3, `cmds/archive.py:69-79`: 3 attempts, 2 s sleep) runs
inside the partition so a flaky row doesn't fail the task; rows that
exhaust retries come back with payload NULL → the archive layer quarantines
them as 'lost' (P4)."""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("payload", StringType()),   # JSON info-dict (NULL = lost)
        StructField("source", StringType()),    # 'primary' | 'fallback' | None
        StructField("attempts", LongType()),
    ]
)

#: Reference constants: 3 Wayback attempts, 2 s sleep (`utils.py:6`,
#: `cmds/archive.py:69-79`).
MAX_ATTEMPTS = 3
BACKOFF_SECONDS = 2.0


def load_fetcher(spec: str) -> Callable[[str], str]:
    """Resolve a 'pkg.module:function' spec to the fetcher callable.

    The CLI replay path takes fetchers by dotted path (not closures) so the
    resolved function is picklable into executor tasks."""
    module, _, name = spec.partition(":")
    if not module or not name:
        raise ValueError(f"fetcher spec must be 'pkg.module:function', got {spec!r}")
    import importlib

    fn = getattr(importlib.import_module(module), name)
    if not callable(fn):
        raise TypeError(f"{spec} is not callable")
    return fn


def fetch_infodicts(
    ids: DataFrame,
    fetcher: Callable[[str], str],
    fallback: Callable[[str], str] | None = None,
    max_attempts: int = MAX_ATTEMPTS,
    backoff_seconds: float = BACKOFF_SECONDS,
    id_col: str = "id",
    parallelism: int | None = None,
) -> DataFrame:
    """id-list DF → (id, payload, source, attempts) via partition-parallel
    fetch with primary → fallback retry chain.

    ``fetcher``/``fallback`` raise on failure and return a JSON string on
    success. They must be picklable (imported functions, not closures over
    sessions)."""
    if parallelism:
        ids = ids.repartition(parallelism)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "payload": [], "source": [], "attempts": []}
            for vid in pdf[id_col]:
                payload, source, attempts = None, None, 0
                try:
                    attempts += 1
                    payload, source = fetcher(vid), "primary"
                except Exception:
                    if fallback is not None:
                        for i in range(max_attempts):  # S2: bounded retries
                            try:
                                attempts += 1
                                payload, source = fallback(vid), "fallback"
                                break
                            except Exception:
                                if i < max_attempts - 1:
                                    time.sleep(backoff_seconds)
                out["id"].append(vid)
                out["payload"].append(payload)
                out["source"].append(source)
                out["attempts"].append(attempts)
            yield pd.DataFrame(out)

    return ids.select(F.col(id_col).alias("id")).mapInPandas(_fetch, FETCH_RESULT_SCHEMA)


def parse_fetched(fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split fetch results into (parsed raw info-dicts, lost ids).

    Fallback-recovered rows get availability='recovered' (S2 tag,
    `cmds/archive.py:78`); payloads parse via from_json against the
    info-dict schema — JVM-side, no Python."""
    from yark_spark.sources.infodict import INFODICT_SCHEMA

    ok = fetched.filter(F.col("payload").isNotNull())
    lost = fetched.filter(F.col("payload").isNull()).select("id")
    parsed = ok.select(
        F.from_json("payload", INFODICT_SCHEMA).alias("d"), F.col("source")
    ).select("d.*", "source")
    parsed = parsed.withColumn(
        "availability",
        F.when(F.col("source") == "fallback", F.lit("recovered")).otherwise(
            F.col("availability")
        ),
    ).drop("source")
    return parsed, lost


def enrich_with_ratings(
    videos: DataFrame, ratings: DataFrame, id_col: str = "id"
) -> DataFrame:
    """S3 RYD enrichment (`cmds/archive.py:97-103`) as a broadcast left
    join: missing ratings rows → NULLs (the reference's empty-dict
    fallback). ratings schema: (id, ryd_likes, ryd_dislikes, ryd_rating,
    ryd_viewCount)."""
    return videos.drop(
        "ryd_likes", "ryd_dislikes", "ryd_rating", "ryd_viewCount"
    ).join(F.broadcast(ratings), id_col, "left")
