"""Iterative graph analytics — PageRank to convergence (round 9, VERDICT
r8 next-round #5; extends the bounded-iteration q_pagerank of round 8).

Reference parity note: the reference archiver (/root/reference) has no
graph surface; this is part of the driver-mandated training-data-pipeline
inventory (SURVEY.md §2.8) — e.g. ranking pages/documents by link
structure before sampling a pretraining mix.

Scale posture: the rank vector is (node, double) — tiny next to the edge
list — and every iteration is one equi-join of edges against ranks plus a
partial-agg groupBy on dst, shuffling on the same key each round. Lineage
is truncated with an eager localCheckpoint every ``checkpoint_every``
iterations (the dedup_clusters pointer-doubling pattern — without it the
plan doubles per iteration and the optimizer itself becomes the
bottleneck); intermediate vectors persist MEMORY_AND_DISK between
checkpoints and are released as soon as their successor is materialized.
The per-iteration L1-delta (and dangling-mass) aggregates are 1-row
scalars — inherent to a convergence test, not a driver-side data loop.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damp: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 40,
    checkpoint_every: int = 5,
    dangling: bool = True,
) -> tuple[DataFrame, int]:
    """Power-iteration PageRank over a DIRECTED edge list ``(src, dst)``,
    run until the L1 rank change drops below ``tol`` (or ``max_iters``).
    Returns ``(ranks, iterations_run)`` with ranks ``(node, pr)``.

    Dangling nodes (no outgoing edges) have their mass redistributed
    uniformly each iteration — the standard stochastic-matrix completion
    — computed as a 1-row aggregate broadcast into the update, so graphs
    with sinks converge to the true stationary vector instead of leaking
    mass. For an undirected graph, pass both edge directions (then the
    dangling term is identically zero — pass ``dangling=False`` to elide
    the anti-join subtree entirely). ``tol=0.0`` runs exactly
    ``max_iters`` iterations — the fixed-iteration oracle twin
    (q_pagerank) is this operator at ``tol=0, max_iters=3,
    dangling=False``. In convergence mode the returned ranks DataFrame
    is persisted (it IS the last materialized iterate); call
    ``.unpersist()`` when done. Fixed-iteration mode returns a plain
    lazy plan.
    """
    # In CONVERGENCE mode the edge list and degree table feed every one
    # of up-to-max_iters iterations — persist them once instead of
    # re-evaluating their upstream plan (often a join+distinct) per
    # round. In fixed-iteration mode (tol=0, small max_iters) they stay
    # UNPERSISTED: the A/B measurement showed the recompute pipelines
    # ~20% faster than reading through InMemoryRelation (cache scan
    # breaks whole-stage codegen), and 3 recomputes don't amortize it.
    e = edges.select("src", "dst")
    if tol > 0:
        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    if tol > 0:
        deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = float(nodes.count())  # inherent scalar: the |V| normalizer
    pr = nodes.select("node", F.lit(1.0 / total).alias("pr"))
    if tol > 0:
        pr = pr.localCheckpoint(eager=True)
    iters_run = 0
    for i in range(max_iters):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("d")).alias("c"))
        )
        summed = nodes.join(
            contrib.groupBy("node").agg(F.sum("c").alias("s")), "node", "left"
        )
        if dangling:
            # dangling mass as a broadcast 1-row aggregate (zero rows on
            # graphs where every node has out-degree)
            dang = (
                pr.join(deg, pr.node == deg.src, "left_anti")
                .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
            )
            new = summed.crossJoin(F.broadcast(dang)).select(
                "node",
                (
                    F.lit((1 - damp) / total)
                    + F.lit(damp)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dm") / F.lit(total))
                ).alias("pr"),
            )
        else:
            new = summed.select(
                "node",
                (
                    F.lit((1 - damp) / total)
                    + F.lit(damp) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("pr"),
            )
        if tol > 0:
            # convergence mode: bound lineage (checkpoint every K rounds,
            # persist between) and probe the L1 delta — the probe also
            # materializes `new` before the predecessor's blocks release
            if (i + 1) % checkpoint_every == 0:
                new = new.localCheckpoint(eager=True)
            else:
                new = new.persist(StorageLevel.MEMORY_AND_DISK)
            delta = (
                new.alias("a")
                .join(pr.alias("b"), F.col("a.node") == F.col("b.node"))
                .agg(F.sum(F.abs(F.col("a.pr") - F.col("b.pr"))).alias("l1"))
                .first()["l1"]
            )
            pr.unpersist()
            pr = new
            iters_run = i + 1
            if delta is not None and delta < tol:
                break
        else:
            # tol=0: fixed-iteration mode (the oracle twin) — no probe
            # jobs and NO persist/checkpoint: pr is referenced once per
            # iteration so caching buys nothing, and cached intermediates
            # would let the SQL cache manager serve identical re-builds
            # of the same plan from cache (observed faking bench re-runs
            # to near-zero); the bounded iteration count keeps the lazy
            # plan shallow
            pr = new
            iters_run = i + 1
    nodes.unpersist()
    if tol > 0:
        # the returned ranks are already materialized (checkpoint/persist),
        # so the iteration inputs can be released here; in fixed-iteration
        # mode the returned LAZY plan still reads them — they cache during
        # the caller's action and are released with the session (or an
        # explicit clearCache), the association_rules precedent
        e.unpersist()
        deg.unpersist()
    return pr.select("node", "pr"), iters_run


def personalized_pagerank(
    edges: DataFrame,
    reset: DataFrame,
    damp: float = 0.85,
    tol: float = 1e-8,
    max_iters: int = 60,
    checkpoint_every: int = 5,
) -> tuple[DataFrame, int]:
    """Personalized PageRank: the teleport lands on ``reset``'s (node,
    weight) distribution instead of uniformly — the seed-biased ranking
    behind related-item / who-to-follow / topic-conditioned importance.
    Weights are normalized internally; nodes absent from ``reset`` get
    zero teleport mass. Dangling mass also redistributes by the reset
    distribution (the standard PPR completion), so mass is conserved and
    the result is the true stationary vector of the personalized chain.

    Same execution shape as ``pagerank``'s convergence mode: persisted
    edge/degree/weight tables, per-iteration edge-equi-join + partial-agg,
    localCheckpoint rotation every ``checkpoint_every`` rounds, 1-row
    L1-delta probes. Returns ``(ranks, iterations_run)``; ranks stay
    persisted — ``.unpersist()`` when done."""
    rcols = reset.columns
    e = edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    r = reset.select(
        F.col(rcols[0]).alias("node"), F.col(rcols[1]).cast("double").alias("__rw")
    )
    wsum = float(r.agg(F.sum("__rw")).first()[0])
    wdf = (
        nodes.join(r, "node", "left")
        .select(
            "node", (F.coalesce(F.col("__rw"), F.lit(0.0)) / F.lit(wsum)).alias("__w")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pr = wdf.select("node", F.col("__w").alias("pr")).localCheckpoint(eager=True)
    iters_run = 0
    for i in range(max_iters):
        contrib = (
            e.join(pr, e.src == pr.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("d")).alias("c"))
        )
        dang = pr.join(deg, pr.node == deg.src, "left_anti").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm")
        )
        new = (
            wdf.join(contrib.groupBy("node").agg(F.sum("c").alias("s")), "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(1 - damp) * F.col("__w")
                    + F.lit(damp)
                    * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dm") * F.col("__w"))
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        else:
            new = new.persist(StorageLevel.MEMORY_AND_DISK)
        delta = (
            new.alias("a")
            .join(pr.alias("b"), F.col("a.node") == F.col("b.node"))
            .agg(F.sum(F.abs(F.col("a.pr") - F.col("b.pr"))).alias("l1"))
            .first()["l1"]
        )
        pr.unpersist()
        pr = new
        iters_run = i + 1
        if delta is not None and delta < tol:
            break
    e.unpersist()
    deg.unpersist()
    wdf.unpersist()
    return pr.select("node", "pr"), iters_run
