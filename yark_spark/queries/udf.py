"""UDF-surface query keys (SURVEY.md §2.7 UDF row, §2.8 E4).

Python only where built-ins can't express the op; always Arrow-batched
pandas UDFs, never row-at-a-time Python UDFs.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from yark_spark.io import load_table
from yark_spark.operators.multimodal import extract_features, with_binary_payload
from yark_spark.registry import query


@query(
    "q_pandas_udf",
    oracle=(
        "SELECT vec_id, round(sqrt(list_aggregate(list_transform("
        "CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 6) AS l2_norm "
        "FROM embeddings"
    ),
)
def q_pandas_udf(spark, sf_dir):
    """Scalar pandas UDF (Arrow-batched) computing the embedding L2 norm.
    Oracle-checkable because the arithmetic (double square-sum in index
    order, then sqrt, rounded) matches the SQL exactly."""

    @pandas_udf("double")
    def l2_norm(vecs: pd.Series) -> pd.Series:
        import numpy as np

        return vecs.map(lambda v: float(np.sqrt(np.sum(np.asarray(v, dtype="float64") ** 2))))

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.round(l2_norm("embedding"), 6).alias("l2_norm"))


@query("q_multimodal_features")  # rows-only: stubbed decode is engine-specific
def q_multimodal_features(spark, sf_dir):
    """E4 multimodal plumbing: binary payload column → mapInPandas feature
    extraction with a typed schema (decode stubbed deterministically —
    operators.multimodal)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs), id_col="doc_id")


_GROUPED_PANDAS_ORACLE = (
    "WITH g AS (SELECT user_id, ts, "
    "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
    "median(date_diff('microsecond', ts, nxt)) / 1000000.0 AS median_gap_s "
    "FROM g GROUP BY user_id"
)


@query("q_grouped_pandas", oracle=_GROUPED_PANDAS_ORACLE)
def q_grouped_pandas(spark, sf_dir):
    """applyInPandas (UDAF/UDTF-like): per-user event gap statistics that
    need imperative per-group logic. Groups shuffle on user_id; each group
    processed as one pandas frame.

    Oracle-checkable (round-7): gaps are computed in INTEGER microseconds
    on both sides and divided by 1e6 only after the median, so the only
    float ops are np.median's midpoint average — exact in doubles for
    µs values ≪ 2^53 and identical to DuckDB's interpolated median —
    and one shared divide, bit-identical by IEEE. NO round(): a 0.5 µs
    median lands exactly on a 1e-7 rounding tie, where Python
    (half-to-even) and DuckDB (half-away) disagree. The consecutive-gap
    multiset of a sorted column is tie-order invariant, so pandas'
    (ts, event_id) sort and the oracle's lead() agree even on duplicate
    timestamps."""

    def gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"])
        us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        gaps = np.diff(us)
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_gap_s": [
                    float(np.median(gaps)) / 1000000.0 if len(gaps) else None
                ],
            }
        )

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").applyInPandas(
        gap_stats, "user_id long, n_events long, median_gap_s double"
    )
