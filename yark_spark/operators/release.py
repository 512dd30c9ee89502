"""Session-wide registry for persisted/checkpointed blocks that outlive a
query function's return (VERDICT r9 next-round #4).

Two leak shapes motivated this:

* a query caches a reused intermediate whose blocks are created during
  the CALLER's action — the function can't unpersist before returning
  because the returned lazy plan still reads them (round-9's
  ``q_triangle_count``, the 8b/8c analytics caches);
* an operator returns an eagerly materialized result (localCheckpoint)
  whose blocks back the returned DataFrame for as long as the caller
  keeps it (``operators/graph``, ``operators/dedup`` cluster frontiers).

``DataFrame.unpersist()`` only reaches the SQL cache manager — a
localCheckpoint's storage is an RDD-level persist invisible to it (the
blocks sit in ``sc.getPersistentRDDs`` until the async ContextCleaner
eventually GCs them). :func:`release_tracked` therefore does both: SQL
uncache, plus walking each tracked plan's ``LogicalRDD`` leaves and
unpersisting the underlying checkpoint RDDs directly.

Harnesses (driver_sim, the scale lanes, the pytest leak check) call
:func:`release_tracked` after each key's action completes, so a
236-key sweep never accumulates storage from keys it already finished.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register ``df`` (persisted or checkpointed) for deferred release
    and return it unchanged."""
    _TRACKED.append(df)
    return df


def _unpersist_checkpoint_rdds(df: DataFrame) -> None:
    """Free RDD-level storage under ``df``'s plan: every ``LogicalRDD``
    leaf (the node a localCheckpoint leaves behind) gets its backing RDD
    unpersisted. Best-effort — a stopped session just no-ops."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                try:
                    leaf.rdd().unpersist(False)
                except Exception:
                    pass
    except Exception:
        pass


def release_now(df: DataFrame) -> None:
    """Immediately free ``df``'s storage — SQL cache AND any checkpoint
    RDDs its plan reads. For superseded iterates inside convergence
    loops, where deferring to release_tracked() would accumulate one
    rank-vector copy per iteration."""
    try:
        df.unpersist()
    except Exception:
        return
    _unpersist_checkpoint_rdds(df)


def release_tracked() -> int:
    """Unpersist every tracked DataFrame — SQL cache AND checkpoint RDD
    storage — plus the packing module's checkpoint registry. ONLY call
    after the results that read these blocks have been fully
    materialized (collected, written, or re-persisted). Returns the
    number of DataFrames released."""
    from yark_spark.operators.packing import release_cumsum_checkpoints

    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        n += 1
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            continue
        _unpersist_checkpoint_rdds(df)
    return n + release_cumsum_checkpoints()


def persisted_block_count(spark) -> int:
    """Number of RDDs currently holding (or registered for) storage in
    the session — the suite-level leak assertion (back to the baseline
    after release_tracked())."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
