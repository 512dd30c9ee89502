"""Row-level scalar transforms — SURVEY.md §2.5 (X1–X16).

The reference does all of these as driver-side Python over dicts
(`cmds/archive.py:82-120`, `utils.py`); here each is a native Column
expression so it stays inside whole-stage codegen (no Python in the hot
path). The reusable forms live in yark_spark.functions.scalar; these query
keys exercise them against the fixture tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from yark_spark.io import load_table
from yark_spark.registry import query


@query(
    "q_coalesce",
    oracle=(
        "SELECT event_id, coalesce(NULLIF(event_type, 'view'), 'other') AS etype FROM events"
    ),
)
def q_coalesce(spark, sf_dir):
    """X1 fallback chain (`cmds/archive.py:114-116,145,148` — likes/views/
    username coalesce)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("view")), F.lit("other")).alias("etype"),
    )


@query(
    "q_string_split",
    oracle=(
        "SELECT p_partkey, string_split(p_type, ' ')[1] AS first_word, "
        "string_split(p_type, ' ')[-1] AS last_word FROM part"
    ),
)
def q_string_split(spark, sf_dir):
    """X2 split/head/tail (`cmds/archive.py:88,211,229,334` — URL query
    strip, extension extraction)."""
    p = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.element_at(toks, 1).alias("first_word"),
        F.element_at(toks, -1).alias("last_word"),
    )


@query(
    "q_regexp_extract",
    oracle=(
        "SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS name_digits FROM customer"
    ),
)
def q_regexp_extract(spark, sf_dir):
    """X3 regex validate/extract (11-char video-id check, `utils.py:19-24`;
    invalid rows quarantine via filter instead of raising)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
    )


@query(
    "q_regexp_replace",
    oracle=(
        "SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants FROM part"
    ),
)
def q_regexp_replace(spark, sf_dir):
    """X4 regex replace (ANSI-escape strip, `utils.py:12,54-55`)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_replace("p_name", "[aeiou]", "").alias("consonants"),
    )


@query(
    "q_timestamp_parse",
    oracle=(
        "SELECT o_orderkey, CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS parsed_ts "
        "FROM orders"
    ),
)
def q_timestamp_parse(spark, sf_dir):
    """X5 timestamp parse (`dateutil.parse` at `cmds/archive.py:112,277,339`)
    — string → timestamp round-trip, UTC pinned by session conf."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_timestamp(F.col("o_orderdate").cast("string")).alias("parsed_ts"),
    )


@query(
    "q_array_head",
    oracle="SELECT vec_id, embedding[1] AS first_dim FROM embeddings",
)
def q_array_head(spark, sf_dir):
    """X6 array head (`category = categories[0]`, `cmds/archive.py:113`)."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.element_at("embedding", 1).alias("first_dim")
    )


@query(
    "q_conditional_replace",
    oracle=(
        "SELECT p_partkey, CASE WHEN p_brand = 'Brand#1' THEN '' ELSE p_brand END AS brand "
        "FROM part"
    ),
)
def q_conditional_replace(spark, sf_dir):
    """X7 boilerplate scrub (`cmds/archive.py:105`, default-description →
    empty string)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_brand") == "Brand#1", F.lit("")).otherwise(F.col("p_brand")).alias("brand"),
    )


@query(
    "q_rename",
    oracle="SELECT p_partkey AS part_id, p_retailprice AS price FROM part",
)
def q_rename(spark, sf_dir):
    """X8 rename/pop (`filesize_approx → filesize`, `cmds/archive.py:111`)."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part_id"), F.col("p_retailprice").alias("price")
    )


@query(
    "q_nullif",
    oracle="SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status FROM orders",
)
def q_nullif(spark, sf_dir):
    """X9 sentinel → NULL (`parent == \"root\" → None`, `cmds/archive.py:183`)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.nullif("o_orderstatus", F.lit("O")).alias("status")
    )


@query(
    "q_replace",
    oracle="SELECT p_partkey, replace(p_type, ' ', '') AS type_nospace FROM part",
)
def q_replace(spark, sf_dir):
    """X10 literal string replace (`replace(\" \", \"\")`, `cmds/archive.py:236,304`)."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", F.replace("p_type", F.lit(" "), F.lit("")).alias("type_nospace")
    )


@query(
    "q_concat",
    oracle="SELECT r_regionkey, 'PLLOCAL_' || r_name AS synthetic_id FROM region",
)
def q_concat(spark, sf_dir):
    """X11 synthetic-PK concat (`f\"PLLOCAL_{title}\"`, `cmds/archive.py:236`)."""
    return load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.concat(F.lit("PLLOCAL_"), F.col("r_name")).alias("synthetic_id")
    )


@query(
    "q_math_floor",
    oracle=(
        "SELECT o_orderkey, floor(o_totalprice / 1000) * 1000 AS price_bucket, "
        "floor(o_totalprice * 10) / 10 AS price_trunc1 FROM orders"
    ),
)
def q_math_floor(spark, sf_dir):
    """X12 truncate-to-decimal math (`floor(t*10)/10`, `utils.py:27-39`)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # cast: Spark floor() is LONG, DuckDB floor() is DOUBLE — align the
        # wire type so the driver's value hash sees identical cells
        (F.floor(F.col("o_totalprice") / 1000) * 1000).cast("double").alias("price_bucket"),
        (F.floor(F.col("o_totalprice") * 10) / 10).alias("price_trunc1"),
    )


@query(
    "q_cast_bool",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity > 25 AS is_big FROM lineitem",
)
def q_cast_bool(spark, sf_dir):
    """X14 boolean normalization (`is_favorited` int-bool, `schema.sql:35-36`)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", (F.col("l_quantity") > 25).alias("is_big")
    )


@query(
    "q_current_timestamp",
    oracle=(
        "SELECT event_id, coalesce(CASE WHEN event_type = 'click' THEN NULL ELSE ts END, "
        "TIMESTAMP '2026-01-01 00:00:00') AS archived FROM events"
    ),
)
def q_current_timestamp(spark, sf_dir):
    """X15 ingest-default timestamp (`archived DEFAULT strftime('%s','now')`,
    `schema.sql:66`). The 'now' is a fixed literal here so the oracle can
    hash-match; the production write path uses current_timestamp() (see
    yark_spark.operators.writes.stamp_archived)."""
    e = load_table(spark, sf_dir, "events")
    nulled = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(F.col("ts"))
    return e.select(
        "event_id",
        F.coalesce(nulled, F.lit("2026-01-01 00:00:00").cast("timestamp")).alias("archived"),
    )


@query(
    "q_isin",
    oracle=(
        "SELECT o_orderkey, o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent FROM orders"
    ),
)
def q_isin(spark, sf_dir):
    """X16 synonym-set membership (YES/MAYBE/NO lists, `utils.py:14-16,45-50`)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent")
    )
