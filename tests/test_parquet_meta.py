"""Parquet footer reader tests (round 12): the DuckDB differential
over EVERY driver testdata file (30 files × 3 scale factors — two
independent implementations of the Thrift-compact footer grammar
agreeing row-by-row), schema/num_rows sanity, thrift wire-level
vectors, and typed errors."""

import glob
import struct

import duckdb
import pytest

from yark_spark.operators.parquet_meta import (
    _read_struct,
    footer_rows,
    parquet_footer,
)

_COLS = (
    "row_group_id, row_group_num_rows, column_id, path_in_schema, type, "
    "num_values, compression, data_page_offset, total_compressed_size, "
    "total_uncompressed_size"
)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_differential_vs_duckdb_all_testdata(sf):
    con = duckdb.connect()
    files = sorted(glob.glob(f"/root/testdata/{sf}/*.parquet"))
    assert files
    for p in files:
        mine = [
            tuple(r[k] for k in (
                "row_group_id", "row_group_num_rows", "column_id",
                "path_in_schema", "type", "num_values", "compression",
                "data_page_offset", "total_compressed_size",
                "total_uncompressed_size",
            ))
            for r in footer_rows(open(p, "rb").read())
        ]
        ref = con.execute(
            f"SELECT {_COLS} FROM parquet_metadata('{p}') "
            "ORDER BY row_group_id, column_id"
        ).fetchall()
        assert mine == [tuple(r) for r in ref], p


def test_fixture_file_multi_row_group():
    from yark_spark.queries.fixtures import fixture_path

    meta = parquet_footer(open(fixture_path("footer.parquet"), "rb").read())
    assert meta["num_rows"] == 6000
    assert len(meta["row_groups"]) == 3
    assert sum(rg["num_rows"] for rg in meta["row_groups"]) == 6000
    names = [s["name"] for s in meta["schema"][1:]]  # [0] is the root
    assert names == ["id", "score", "text", "flag"]
    assert {c["codec"] for rg in meta["row_groups"] for c in rg["columns"]} == {"ZSTD"}


def test_schema_agrees_with_duckdb_num_rows():
    con = duckdb.connect()
    p = "/root/testdata/sf0.001/lineitem.parquet"
    meta = parquet_footer(open(p, "rb").read())
    (n,) = con.execute(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()
    assert meta["num_rows"] == n


# ---------------------------------------------------------------------------
# Thrift wire level
# ---------------------------------------------------------------------------


def test_thrift_short_and_long_form_fields():
    # field 1 (delta 1) i32 zigzag 5; field 100 long-form i64 zigzag -3
    blob = bytes([0x15, 0x0A]) + bytes([0x06]) + bytes([0xC8, 0x01]) + bytes([0x05, 0x00])
    fields, pos = _read_struct(blob, 0)
    assert fields == {1: 5, 100: -3} and pos == len(blob)


def test_thrift_bool_in_header_and_list():
    # field 1 true, field 2 false, field 3 list<i32> [7, -7], stop
    blob = bytes([0x11, 0x12, 0x19, 0x25, 0x0E, 0x0D, 0x00])
    fields, _ = _read_struct(blob, 0)
    assert fields == {1: True, 2: False, 3: [7, -7]}


def test_thrift_binary_and_nested_struct():
    inner = bytes([0x15, 0x02, 0x00])  # field 1 = i32 1
    blob = bytes([0x18, 0x02]) + b"ab" + bytes([0x1C]) + inner + bytes([0x00])
    fields, _ = _read_struct(blob, 0)
    assert fields == {1: b"ab", 2: {1: 1}}


def test_errors():
    with pytest.raises(ValueError, match="magic"):
        parquet_footer(b"not parquet")
    good = open("/root/testdata/sf0.001/region.parquet", "rb").read()
    with pytest.raises(ValueError, match="magic"):
        parquet_footer(good[:-4])
    # footer length pointing outside the file
    bad = good[:-8] + struct.pack("<I", len(good) * 2) + b"PAR1"
    with pytest.raises(ValueError, match="footer length"):
        parquet_footer(bad)
    with pytest.raises(ValueError, match="truncated"):
        _read_struct(bytes([0x15]), 0)  # header then no varint


def test_thrift_bool_elements_in_list_consume_bytes():
    # ADVICE r12: list<bool> elements are ONE BYTE EACH (0x01/0x02) on
    # the compact wire, unlike struct fields (bool-in-header). field 1
    # list<bool> [true, false, true], field 2 i32 21 — a reader that
    # returns header-derived bools without consuming bytes desyncs here.
    blob = bytes([0x19, 0x31, 0x01, 0x02, 0x01, 0x15, 0x2A, 0x00])
    fields, pos = _read_struct(blob, 0)
    assert fields == {1: [True, False, True], 2: 21} and pos == len(blob)


def test_thrift_bool_element_invalid_byte():
    import pytest as _pytest

    blob = bytes([0x19, 0x11, 0x07, 0x00])
    with _pytest.raises(ValueError, match="bool element"):
        _read_struct(blob, 0)


def test_timestamp_ntz_flag_reads_logical_type_union():
    """Round 16 (Delta timestampNtz): the LogicalType Thrift union's
    TIMESTAMP member carries isAdjustedToUTC — naive columns read
    True, UTC-adjusted instants False, non-timestamp columns None."""
    import datetime
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yark_spark.operators.parquet_meta import (
        parquet_footer,
        timestamp_ntz_flag,
    )

    t = pa.table(
        {
            "ntz": pa.array([datetime.datetime(2024, 1, 1)], pa.timestamp("us")),
            "utc": pa.array(
                [datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)],
                pa.timestamp("us", tz="UTC"),
            ),
            "plain": pa.array([1], pa.int64()),
        }
    )
    buf = io.BytesIO()
    pq.write_table(t, buf)
    flags = {
        el["name"]: timestamp_ntz_flag(el)
        for el in parquet_footer(buf.getvalue())["schema"]
    }
    assert flags["ntz"] is True
    assert flags["utc"] is False
    assert flags["plain"] is None
