"""Write semantics — keyed dedup inserts, guarded upsert/merge, overwrite,
cascade/restrict deletes. SURVEY.md §2.4 (W1–W6).

Spark has no enforced constraints, so the reference's PK/FK machinery
(`schema.sql`) is reproduced as dataflow:

- INSERT OR IGNORE (W1, `cmds/archive.py:133,144-150,191-192`): first-writer
  -wins → existing rows survive, incoming rows join in only when their key
  is novel (left-anti).
- try-INSERT-then-guarded-UPDATE (W2, `cmds/archive.py:152-175`): MERGE via
  full-outer join + per-column coalesce, with the reference's data-quality
  guard (only update when the incoming row passes a completeness predicate —
  `cmds/archive.py:162` refuses to clobber good data with partial data).
- delete-then-insert overwrite (W4, `cmds/archive.py:282-294`).
- ON DELETE CASCADE / RESTRICT (W5, `schema.sql:14,25-26,39-41,67,91`):
  cascade = left-anti rewrite of each child against the deleted parent keys,
  children resolved in FK topological order; RESTRICT = pre-delete semi-join
  guard that raises when dependents exist.

All functions are DataFrame → DataFrame (pure, testable); the storage
commit (Parquet rewrite / JDBC foreachBatch) lives in the caller, so the
same logic serves batch and streaming (`foreachBatch`) paths.

Scale notes: the merge joins shuffle on the key — at 100 TB both sides are
pre-bucketed on the key in real deployments so these are co-located joins;
incoming micro-batches are usually small enough that Catalyst/AQE flips the
join to broadcast automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def insert_ignore(existing: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """W1: first-writer-wins keyed insert. Existing rows are kept verbatim;
    incoming rows land only when their key is absent. Incoming duplicates
    collapse to one deterministic representative (min-ordered) so the result
    is stable regardless of partitioning."""
    cols = existing.columns
    novel = incoming.select(*cols).join(existing.select(*keys), list(keys), "left_anti")
    # Deterministic representative among incoming dupes: order all non-key
    # columns and keep the first — avoids dropDuplicates' partition order
    # dependence.
    from pyspark.sql import Window

    others = [c for c in cols if c not in keys]
    if others:
        w = Window.partitionBy(*keys).orderBy(*[F.asc_nulls_last(c) for c in others])
        novel = novel.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    else:
        novel = novel.distinct()
    return existing.unionByName(novel)


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_guard: Column | None = None,
) -> DataFrame:
    """W2: MERGE with the reference's partial-data guard.

    For matched keys, source values win only when ``update_guard`` (a
    predicate over source columns) holds — otherwise the target row is kept
    unchanged (`cmds/archive.py:162-175`). Unmatched source rows insert;
    unmatched target rows persist.
    """
    cols = target.columns
    src = source.select(*cols)
    t = target.alias("t")
    s = src.alias("s")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")))
    joined = t.join(s, cond, "full_outer")

    matched = F.lit(True)
    for k in keys:
        matched = matched & F.col(f"t.{k}").isNotNull() & F.col(f"s.{k}").isNotNull()
    guard_ok = update_guard if update_guard is not None else F.lit(True)

    out_cols = []
    for c in cols:
        tcol, scol = F.col(f"t.{c}"), F.col(f"s.{c}")
        out = (
            F.when(matched & guard_ok, scol)       # matched + guard passes → update
            .when(matched, tcol)                   # matched + guard fails → keep target
            .otherwise(F.coalesce(tcol, scol))     # one-sided: whichever exists
        )
        out_cols.append(out.alias(c))
    return joined.select(*out_cols)


def delete_insert(
    target: DataFrame, replacement: DataFrame, predicate: Column
) -> DataFrame:
    """W4: key-scoped overwrite (playlist replacement,
    `cmds/archive.py:282-294`): rows matching ``predicate`` are dropped and
    ``replacement`` takes their place. On partitioned storage this is a
    partition-overwrite, not a full rewrite."""
    return target.filter(~predicate).unionByName(replacement.select(*target.columns))


def cascade_delete(
    parent: DataFrame,
    parent_keys: DataFrame,
    children: dict[str, tuple[DataFrame, str, str]],
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """W5 CASCADE: delete parent rows whose key appears in ``parent_keys``
    (a 1-column DF named after the parent key), then left-anti rewrite every
    child on its FK. ``children`` maps name → (df, fk_col, parent_key_col).

    Returns (surviving_parent, {name: surviving_child}). Callers write
    children before the parent so a retry after partial failure re-converges
    (idempotent — anti-join of already-clean children is a no-op).
    """
    key_col = parent_keys.columns[0]
    surviving_parent = parent.join(parent_keys, on=key_col, how="left_anti")
    surviving_children = {}
    for name, (child, fk, _pk) in children.items():
        surviving_children[name] = child.join(
            parent_keys.withColumnRenamed(key_col, fk), on=fk, how="left_anti"
        )
    return surviving_parent, surviving_children


def delete_all(
    parent: DataFrame,
    key: str,
    children: dict[str, tuple[DataFrame, str, str]] | None = None,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """W6 delete-all (`cmds/archive.py:421-425`: ``DELETE FROM playlists;``
    behind a confirm): empty the parent table; CASCADE children
    (`schema.sql:91`) lose every row that referenced an existing parent key.

    Child rows whose FK dangles (references no parent row) survive — the
    same observable end-state as SQLite, where the cascade fires only for
    rows whose parent actually existed. Implemented as cascade_delete over
    the full (distinct) parent key set, so it inherits its idempotence."""
    return cascade_delete(parent, parent.select(key).distinct(), children or {})


class RestrictViolation(Exception):
    """Raised when an ON DELETE RESTRICT guard finds dependents
    (`schema.sql:14,67`)."""


def restrict_guard(dependents: DataFrame, fk: str, keys: DataFrame) -> None:
    """W5 RESTRICT: raise if any dependent references a to-be-deleted key.
    Semi-join + limit(1) — touches at most one matching partition."""
    key_col = keys.columns[0]
    hit = (
        dependents.select(F.col(fk).alias(key_col))
        .join(keys, on=key_col, how="left_semi")
        .limit(1)
        .count()
    )
    if hit:
        raise RestrictViolation(f"delete blocked: dependents exist via FK {fk}")


def stamp_archived(df: DataFrame, col: str = "archived") -> DataFrame:
    """X15: `archived INTEGER DEFAULT strftime('%s','now')` (`schema.sql:66`)
    — fill missing ingest timestamps at write time."""
    base = df[col] if col in df.columns else F.lit(None).cast("timestamp")
    return df.withColumn(col, F.coalesce(base, F.current_timestamp()))
