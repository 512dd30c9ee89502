"""Plan-shape assertions for the training-data pipelines — the scale
properties the bench numbers rest on."""

import re

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.operators.dedup import minhash_signature
from yark_spark.operators.similarity import cosine_topk
from yark_spark.plans.explain import count_broadcast_joins, count_exchanges, formatted_plan


def test_minhash_signature_is_shuffle_free(spark, sf_dir):
    """The signature is a pure scan-side computation: zero shuffles."""
    sig = minhash_signature(load_table(spark, sf_dir, "documents"), "doc_id", "text", 16)
    assert count_exchanges(sig) == 0, formatted_plan(sig)


def test_simhash_pipeline_shapes(spark, sf_dir):
    """SimHash signature is map-only; the uncapped candidate pipeline is
    scan → map → ONE pair join (shared banded_pairs core), no cartesian."""
    from yark_spark.operators.dedup import simhash, simhash_candidates

    sig = simhash(load_table(spark, sf_dir, "documents"), "doc_id", "text")
    assert count_exchanges(sig) == 0, formatted_plan(sig)

    pairs = simhash_candidates(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_bucket=None
    )
    plan = formatted_plan(pairs)
    assert "Cartesian" not in plan, plan
    assert count_exchanges(pairs) == 0, plan
    phys = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    assert phys.count("Join") == 1, plan


def test_pack_sequences_distributed_prefix_sum(spark, sf_dir):
    """Packing's cumsum is the two-pass distributed prefix sum (VERDICT r2
    item 2): document rows flow through RANGE partitioning into a map-only
    per-partition cumsum (MapInPandas); the only Window in the plan runs
    over the per-partition TOTALS (one row per partition, column __t0) which
    broadcast-join back as offsets. No unpartitioned window ever sees the
    document rows."""
    from yark_spark.queries.extras import q_pack_sequences

    df = q_pack_sequences(spark, sf_dir)
    plan = formatted_plan(df)
    phys = plan.split("== Physical Plan ==")[1]
    # round 8b: the range-partitioned MapInPandas cumsum runs EAGERLY and
    # is pinned by a localCheckpoint (boundary-sampling fix — behavior
    # asserted in tests/test_packing.py), so the lazy plan starts from the
    # checkpointed scan instead of showing RangePartitioning/MapInPandas
    assert "localCheckpoint" in phys, plan
    assert count_broadcast_joins(df) >= 1, plan
    # exactly one Window node, and its aggregate is sum(__t0) — the P-row
    # offsets table — never a sum over the document token counts
    assert len(re.findall(r"\(\d+\) Window", phys)) == 1, plan
    assert re.search(r"sum\(__t\d*#\d+L?\)", phys), plan
    assert not re.search(r"sum\(n_tokens#\d+\)", phys), plan


def test_ivf_probe_is_equi_join(spark, sf_dir):
    """IVF candidate generation joins on cell (inverted-list probe): no
    cartesian product anywhere in the plan."""
    from yark_spark.operators.similarity import ivf_topk

    df = ivf_topk(
        load_table(spark, sf_dir, "embeddings"), query_max_id=5, k=3, n_cells=4, n_probe=2
    )
    plan = formatted_plan(df)
    assert "Cartesian" not in plan, plan


def test_global_sort_is_range_partitioned(spark, sf_dir):
    """q_global_sort must exchange on RANGE partitioning (sampled
    boundaries, disjoint sorted slices) — never a single-task sort."""
    from yark_spark.queries.extras import q_global_sort

    plan = formatted_plan(q_global_sort(spark, sf_dir))
    assert "rangepartitioning" in plan.lower(), plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    """Brute-force top-k: the query side must broadcast, and the per-query
    ranking must prune map-side BEFORE the exchange so no task ever
    receives more than k x partitions rows per query (VERDICT.md round-1
    item 3). Round 17: the pruning is Spark's WindowGroupLimit rank-limit
    pushdown (partial mode below the exchange, final above) instead of the
    hand-rolled ObjectHashAggregate two-phase form — one exchange instead
    of two, whole-stage codegen instead of the objects path, same rows."""
    df = cosine_topk(load_table(spark, sf_dir, "embeddings"), query_max_id=10, k=5)
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 1
    # one shuffle, over pre-reduced rows: WindowGroupLimit caps each map
    # task's contribution at k rows per query before the exchange
    assert count_exchanges(df) == 1, plan
    phys = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    assert phys.count("WindowGroupLimit") == 2, plan  # partial + final
    # tree prints top-down: the PARTIAL WindowGroupLimit (below the
    # exchange) is the LAST occurrence and must print after the Exchange
    assert phys.rindex("WindowGroupLimit") > phys.index("Exchange"), plan
    assert "ObjectHashAggregate" not in plan, plan


def test_fuzzy_dedup_uncapped_is_one_broadcast_join(spark, sf_dir):
    """The end-to-end fuzzy pipeline (uncapped) must be scan → map → ONE
    pair join with the Jaccard estimate projected inline: no distinct over
    band-duplicated pairs (first-shared-band emission), no re-join against
    the signature table, zero hash/range shuffles at all."""
    from yark_spark.operators.dedup import fuzzy_dedup_pairs

    df = fuzzy_dedup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_bucket=None
    )
    plan = formatted_plan(df)
    assert count_exchanges(df) == 0, plan
    phys = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    assert "Aggregate" not in phys, plan  # no distinct / regroup anywhere
    assert phys.count("Join") == 1, plan


def test_exact_dedup_single_shuffle(spark, sf_dir):
    """Exact dedup groups once on the text/hash — one exchange."""
    from yark_spark.queries import QUERIES

    df = QUERIES["q_dedup_exact"](spark, sf_dir)
    assert count_exchanges(df) == 1, formatted_plan(df)


def test_asof_join_single_shuffle(spark, sf_dir):
    """Union+window as-of: one shuffle on the key, no join node at all."""
    from yark_spark.queries import QUERIES

    df = QUERIES["q_asof_join"](spark, sf_dir)
    plan = formatted_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "Join" not in plan.split("== Physical Plan ==")[1].split("\n\n")[0], plan
