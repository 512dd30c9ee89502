"""Parquet scan skipping (round 13 s3): row-group statistics +
split-block bloom filters, both directions against real wire.

- our Statistics thrift → pyarrow AND DuckDB read the min/max pairs
  (requires the column_orders field — spec readers ignore
  min_value/max_value without it);
- pyarrow-WRITTEN statistics → our pruning reader skips on them;
- SBBF: no false negatives ever, absent probes overwhelmingly skip,
  false-positive scans still return zero rows, header roundtrip and
  typed parse failures.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yark_spark.operators.parquet_data import (
    parquet_read_columns,
    parquet_scan_filtered,
)
from yark_spark.operators.parquet_meta import (
    parquet_footer,
    sbbf_contains,
    sbbf_insert,
    sbbf_parse,
    sbbf_serialize,
    sbbf_size_bytes,
)
from yark_spark.operators.parquet_write import parquet_write
from yark_spark.operators.zstd import xxh64


def _blob(n=64, rg=8, bloom=("key",)):
    # keys are EVEN so odd probes are absent-but-in-range (the case
    # only bloom can skip).
    return parquet_write(
        {
            "key": [2 * i for i in range(n)],
            "text": [f"doc-{i}" for i in range(n)],
        },
        types={"key": "INT64", "text": "BYTE_ARRAY"},
        codec="SNAPPY",
        row_group_size=rg,
        bloom_filter_columns=list(bloom),
    )


def test_stats_prune_range_scan():
    cols, cnt = parquet_scan_filtered(_blob(), ["key", "text"], "key", 48, 78)
    assert cols["key"] == list(range(48, 79, 2))
    assert cnt == {
        "groups_total": 8,
        "skipped_stats": 6,
        "skipped_bloom": 0,
        "groups_scanned": 2,
    }


def test_stats_prune_disjoint_range():
    cols, cnt = parquet_scan_filtered(_blob(), ["key"], "key", 1000, 2000)
    assert cols["key"] == [] and cnt["skipped_stats"] == 8


def test_present_point_probe_is_exact_and_never_bloom_skipped():
    blob = _blob()
    for key in (0, 30, 126):
        cols, cnt = parquet_scan_filtered(blob, ["text"], "key", key)
        assert cols["text"] == [f"doc-{key // 2}"]
        assert cnt["groups_scanned"] == 1 and cnt["skipped_bloom"] == 0


def test_absent_point_probes_bloom_skip_and_fp_scans_stay_empty():
    blob = _blob()
    bloom_skips = scans = candidates = 0
    for probe in range(1, 127, 2):  # all absent (keys are even)
        cols, cnt = parquet_scan_filtered(blob, ["text"], "key", probe)
        assert cols["text"] == []  # exact filter survives any FP
        # probes at 16k+15 fall BETWEEN group ranges → stats skip all 8;
        # the rest land inside one group, where only bloom can skip.
        assert cnt["skipped_stats"] == (8 if probe % 16 == 15 else 7)
        bloom_skips += cnt["skipped_bloom"]
        scans += cnt["groups_scanned"]
        candidates += 1 if probe % 16 != 15 else 0
    # ≤1% expected FP rate: demand the overwhelming majority of
    # in-range absent probes skip via bloom (a FP scan is allowed, a
    # false NEGATIVE never).
    assert candidates == 56 and bloom_skips >= 53
    assert bloom_skips + scans == candidates


def test_string_stats_prune_unsigned_lexicographic():
    blob = parquet_write(
        {"name": [f"{c}{i}" for c in "abcdefgh" for i in range(8)]},
        types={"name": "BYTE_ARRAY"},
        row_group_size=8,
    )
    cols, cnt = parquet_scan_filtered(blob, ["name"], "name", "c0", "c9")
    assert cols["name"] == [f"c{i}" for i in range(8)]
    assert cnt["skipped_stats"] == 7


def test_nulls_counted_and_prune_still_sound():
    blob = parquet_write(
        {"key": [1, None, 3, None, 100, 101, None, 103]},
        types={"key": "INT64"},
        row_group_size=4,
    )
    foot = parquet_footer(blob)
    st0 = foot["row_groups"][0]["columns"][0]["statistics"]
    assert st0["null_count"] == 2
    cols, cnt = parquet_scan_filtered(blob, ["key"], "key", 100, 200)
    assert cols["key"] == [100, 101, 103] and cnt["skipped_stats"] == 1


def test_pyarrow_reads_our_stats_and_we_read_pyarrows():
    blob = _blob()
    md = pq.ParquetFile(io.BytesIO(blob)).metadata
    st = md.row_group(2).column(0).statistics
    assert (st.min, st.max, st.null_count) == (32, 46, 0)
    # other direction: pyarrow-written row groups prune in our reader
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"key": list(range(64))}), buf, row_group_size=8
    )
    cols, cnt = parquet_scan_filtered(buf.getvalue(), ["key"], "key", 24, 39)
    assert cols["key"] == list(range(24, 40))
    assert cnt["skipped_stats"] == 6 and cnt["groups_scanned"] == 2


def test_duckdb_reads_our_stats(tmp_path):
    import duckdb

    p = tmp_path / "t.parquet"
    p.write_bytes(_blob())
    rows = duckdb.sql(
        f"select stats_min_value, stats_max_value from parquet_metadata('{p}') "
        "where path_in_schema='key' and row_group_id=0"
    ).fetchall()
    assert rows == [("0", "14")]


def test_sbbf_no_false_negatives_fuzz():
    import random

    rnd = random.Random(13)
    for _ in range(50):
        n = rnd.randint(1, 500)
        vals = [rnd.randrange(1 << 48) for _ in range(n)]
        bitset = bytearray(sbbf_size_bytes(n))
        for v in vals:
            sbbf_insert(bitset, xxh64(v.to_bytes(8, "little")))
        for v in vals:
            assert sbbf_contains(bitset, xxh64(v.to_bytes(8, "little")))


def test_sbbf_serialize_parse_roundtrip_and_typed_failures():
    bitset = bytearray(sbbf_size_bytes(100))
    sbbf_insert(bitset, xxh64(b"hello"))
    blob = sbbf_serialize(bytes(bitset))
    back = sbbf_parse(blob)
    assert back == bytes(bitset)
    assert sbbf_contains(back, xxh64(b"hello"))
    with pytest.raises(ValueError, match="bloom"):
        sbbf_parse(b"\x15\x02\x00" + b"x")  # missing unions
    with pytest.raises(ValueError, match="length"):
        sbbf_parse(blob[: len(blob) - 5])  # truncated bitset


def test_full_read_unchanged_with_bloom_present():
    blob = _blob()
    cols = parquet_read_columns(blob, ["key", "text"])
    assert cols["key"] == [2 * i for i in range(64)]
    assert pq.read_table(io.BytesIO(blob)).num_rows == 64


# ---------------------------------------------------------------------------
# Page-index pruning (ColumnIndex / OffsetIndex)
# ---------------------------------------------------------------------------

from yark_spark.operators.parquet_data import parquet_page_scan_filtered  # noqa: E402
from yark_spark.operators.parquet_meta import (  # noqa: E402
    parquet_column_index,
    parquet_offset_index,
)


def _pyarrow_paged(n=64, batch=8):
    buf = io.BytesIO()
    pq.write_table(
        pa.table({"k": list(range(n)), "t": [f"x{i}" for i in range(n)]}),
        buf,
        row_group_size=n,
        data_page_size=1,
        write_batch_size=batch,
        write_page_index=True,
    )
    return buf.getvalue()


def test_page_prune_on_pyarrow_page_index_wire():
    blob = _pyarrow_paged()
    cols, cnt = parquet_page_scan_filtered(blob, ["k", "t"], "k", 24, 39)
    assert cols["k"] == list(range(24, 40))
    assert cols["t"] == [f"x{i}" for i in range(24, 40)]
    assert cnt == {"pages_total": 8, "pages_skipped": 6, "pages_scanned": 2}


def test_page_prune_point_probe_decodes_one_page():
    blob = _pyarrow_paged()
    cols, cnt = parquet_page_scan_filtered(blob, ["t"], "k", 63)
    assert cols["t"] == ["x63"]
    assert cnt["pages_scanned"] == 1
    cols, cnt = parquet_page_scan_filtered(blob, ["t"], "k", 1000)
    assert cols["t"] == [] and cnt["pages_scanned"] == 0


def test_page_prune_on_our_writers_page_index():
    blob = parquet_write(
        {"k": list(range(64)), "t": [f"x{i}" for i in range(64)]},
        types={"k": "INT64", "t": "BYTE_ARRAY"},
        codec="ZSTD",
        row_group_size=8,
        write_page_index=True,
    )
    cols, cnt = parquet_page_scan_filtered(blob, ["k", "t"], "k", 24, 39)
    assert cols["k"] == list(range(24, 40))
    # one page per row group in our writer: page counts == group counts
    assert cnt == {"pages_total": 8, "pages_skipped": 6, "pages_scanned": 2}
    # and third-party readers still accept the file wholesale
    assert pq.read_table(io.BytesIO(blob)).num_rows == 64


def test_page_index_structs_parse_both_wires():
    from yark_spark.operators.parquet_meta import parquet_footer

    for blob in (_pyarrow_paged(), parquet_write(
        {"k": [1, None, 3]}, types={"k": "INT64"}, write_page_index=True
    )):
        f = parquet_footer(blob)
        col = f["row_groups"][0]["columns"][0]
        ci = parquet_column_index(blob, col)
        oi = parquet_offset_index(blob, col)
        assert len(ci["min_values"]) == len(oi)
        assert oi[0]["first_row_index"] == 0
        assert all(not p for p in ci["null_pages"])


def test_page_prune_nulls_in_pages():
    blob = parquet_write(
        {"k": [1, None, 3, None, 100, 101, None, 103]},
        types={"k": "INT64"},
        row_group_size=4,
        write_page_index=True,
    )
    cols, cnt = parquet_page_scan_filtered(blob, ["k"], "k", 100, 200)
    assert cols["k"] == [100, 101, 103]
    assert cnt["pages_skipped"] == 1
    # null_counts surfaced in the index
    from yark_spark.operators.parquet_meta import parquet_footer

    col = parquet_footer(blob)["row_groups"][0]["columns"][0]
    assert parquet_column_index(blob, col)["null_counts"] == [2]


def test_page_prune_requires_index_typed():
    blob = parquet_write({"k": [1, 2, 3]}, types={"k": "INT64"})
    with pytest.raises(ValueError, match="no page index"):
        parquet_page_scan_filtered(blob, ["k"], "k", 1)


# ---------------------------------------------------------------------------
# Round 14: page-selective REPEATED (LIST) columns
# ---------------------------------------------------------------------------


def _list_indexed_blob(page_version="1.0"):
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = 64
    emb = [
        None
        if i % 13 == 5
        else ([] if i % 13 == 9 else [float(i), i + 0.5, None if i % 7 == 0 else i * 2.0])
        for i in range(rows)
    ]
    t = pa.table(
        {
            "k": pa.array(range(rows), pa.int64()),
            "emb": pa.array(emb, pa.list_(pa.float64())),
            "txt": pa.array([f"s{i}" for i in range(rows)]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(
        t,
        buf,
        write_page_index=True,
        data_page_size=1,
        write_batch_size=8,
        row_group_size=32,
        use_dictionary=False,
        data_page_version=page_version,
    )
    return buf.getvalue(), emb


@pytest.mark.parametrize("pv", ["1.0", "2.0"])
def test_page_scan_fetches_list_column(pv):
    from yark_spark.operators.parquet_data import parquet_page_scan_filtered

    blob, emb = _list_indexed_blob(pv)
    cols, cnt = parquet_page_scan_filtered(blob, ["k", "emb", "txt"], "k", 40, 44)
    assert cols["k"] == [40, 41, 42, 43, 44]
    assert cols["emb"] == [emb[i] for i in range(40, 45)]
    assert cols["txt"] == [f"s{i}" for i in range(40, 45)]
    # null row / empty list / null element fetched page-selectively
    cols2, _ = parquet_page_scan_filtered(blob, ["emb"], "k", 18, 22)
    assert cols2["emb"] == [emb[i] for i in range(18, 23)]
    assert cnt["pages_skipped"] > 0


def test_page_scan_list_predicate_is_typed():
    from yark_spark.operators.parquet_data import parquet_page_scan_filtered

    blob, _ = _list_indexed_blob()
    with pytest.raises(ValueError, match="cannot be a LIST"):
        parquet_page_scan_filtered(blob, ["k"], "emb", 1)


def test_page_scan_our_writer_struct_leaves_unaffected():
    # flat page scans over our own indexed wire still work after the
    # round-14 leaf-walk change
    from yark_spark.operators.parquet_data import parquet_page_scan_filtered
    from yark_spark.operators.parquet_write import parquet_write

    blob = parquet_write(
        {"k": list(range(32)), "t": [f"x{i}" for i in range(32)]},
        types={"k": "INT64", "t": "BYTE_ARRAY"},
        row_group_size=8,
        write_page_index=True,
        codec="SNAPPY",
    )
    cols, cnt = parquet_page_scan_filtered(blob, ["k", "t"], "k", 10, 12)
    assert cols["k"] == [10, 11, 12]
    assert cols["t"] == ["x10", "x11", "x12"]


def test_page_scan_on_v2_and_modern_encoded_own_wire():
    """Round-14 interactions: DataPageV2 + page index + modern
    encodings from our writer, page-selectively scanned."""
    from yark_spark.operators.parquet_data import parquet_page_scan_filtered
    from yark_spark.operators.parquet_write import parquet_write

    cols = {"k": list(range(64)), "t": [f"x{i}" for i in range(64)]}
    for enc in (None, {"k": "DELTA_BINARY_PACKED",
                       "t": "DELTA_LENGTH_BYTE_ARRAY"}):
        blob = parquet_write(
            cols, types={"k": "INT64", "t": "BYTE_ARRAY"},
            row_group_size=8, write_page_index=True,
            data_page_version=2, codec="ZSTD", column_encodings=enc,
        )
        got, cnt = parquet_page_scan_filtered(blob, ["k", "t"], "k", 20, 22)
        assert got["k"] == [20, 21, 22]
        assert got["t"] == ["x20", "x21", "x22"]
        assert cnt == {"pages_total": 8, "pages_skipped": 7, "pages_scanned": 1}
