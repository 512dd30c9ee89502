"""Arrow IPC reader (round 14, session 3) vs the real library: every
value pyarrow writes must decode identically here — types × nulls ×
layouts × codecs × chunking — plus nesting and the typed
boundaries."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from yark_spark.operators.arrow_ipc import (
    arrow_file_read,
    arrow_schema,
    arrow_stream_read,
)


def _table():
    return pa.table(
        {
            "i64": pa.array([1, 2, None, 4, 5], pa.int64()),
            "i32": pa.array([10, None, 30, 40, 50], pa.int32()),
            "i16": pa.array([1, -2, None, 4, 5], pa.int16()),
            "u8": pa.array([0, 255, None, 4, 5], pa.uint8()),
            "s": pa.array(["x", "yy", None, "zzz", "w" * 40]),
            "ls": pa.array(["a", None, "b", "c", "d"], pa.large_string()),
            "f": pa.array([0.5, None, 2.5, 3.5, 4.5], pa.float64()),
            "f32": pa.array([1.5, 2.5, None, 4.5, 5.5], pa.float32()),
            "b": pa.array([True, False, None, True, False]),
            "vec": pa.array(
                [[1.0, 2.0], [3.0], None, [], [5.0, None, 7.0]],
                pa.list_(pa.float32()),
            ),
            "bin": pa.array([b"ab", None, b"cdef", b"", b"xyz"], pa.binary()),
            "fsb": pa.array([b"abcd", b"efgh", None, b"ijkl", b"mnop"],
                            pa.binary(4)),
            "fsl": pa.array([[1, 2], [3, 4], None, [7, 8], [9, 10]],
                            pa.list_(pa.int64(), 2)),
            "st": pa.array(
                [{"k": 1, "v": "a"}, None, {"k": 3, "v": None},
                 {"k": 4, "v": "d"}, {"k": 5, "v": "e"}],
                pa.struct([("k", pa.int64()), ("v", pa.string())]),
            ),
            "ts": pa.array([1, 2, 3, None, 5], pa.timestamp("us")),
            "dt": pa.array([1, 2, None, 4, 5], pa.date32()),
        }
    )


def _expect(t, c):
    if c == "ts":
        return t.column(c).cast(pa.int64()).to_pylist()
    if c == "dt":
        return t.column(c).cast(pa.int32()).to_pylist()
    return t.column(c).to_pylist()


@pytest.mark.parametrize("compression", [None, "lz4", "zstd"])
@pytest.mark.parametrize("layout", ["file", "stream"])
@pytest.mark.parametrize("chunk", [2, 100])
def test_type_matrix(compression, layout, chunk):
    t = _table()
    buf = io.BytesIO()
    opts = ipc.IpcWriteOptions(compression=compression)
    opener = ipc.new_file if layout == "file" else ipc.new_stream
    with opener(buf, t.schema, options=opts) as w:
        w.write_table(t, max_chunksize=chunk)
    read = arrow_file_read if layout == "file" else arrow_stream_read
    got = read(buf.getvalue())
    for c in t.column_names:
        assert got[c] == _expect(t, c), c


def test_column_projection_and_schema():
    t = _table()
    buf = io.BytesIO()
    with ipc.new_file(buf, t.schema) as w:
        w.write_table(t)
    got = arrow_file_read(buf.getvalue(), ["s", "i64"])
    assert set(got) == {"s", "i64"}
    assert got["i64"] == _expect(t, "i64")
    fields = arrow_schema(buf.getvalue())
    assert [f["name"] for f in fields] == t.column_names
    assert fields[0]["type"] == "int" and fields[0]["bits"] == 64
    with pytest.raises(ValueError, match="not in schema"):
        arrow_file_read(buf.getvalue(), ["nope"])


def test_nested_list_of_list_and_struct_in_list():
    t = pa.table(
        {
            "ll": pa.array(
                [[[1, 2], [3]], None, [[4], None, []], [[5, 6]]],
                pa.list_(pa.list_(pa.int64())),
            ),
            "lst": pa.array(
                [[{"a": 1}], [], None, [{"a": None}, {"a": 4}]],
                pa.list_(pa.struct([("a", pa.int64())])),
            ),
        }
    )
    buf = io.BytesIO()
    with ipc.new_file(
        buf, t.schema, options=ipc.IpcWriteOptions(compression="zstd")
    ) as w:
        w.write_table(t)
    got = arrow_file_read(buf.getvalue())
    assert got["ll"] == t.column("ll").to_pylist()
    assert got["lst"] == t.column("lst").to_pylist()


def test_empty_table_and_empty_batches():
    t = pa.table({"a": pa.array([], pa.int64())})
    buf = io.BytesIO()
    with ipc.new_file(buf, t.schema) as w:
        w.write_table(t)
    assert arrow_file_read(buf.getvalue()) == {"a": []}


@pytest.mark.parametrize("layout", ["file", "stream"])
@pytest.mark.parametrize("compression", [None, "zstd"])
def test_dictionary_batches(layout, compression):
    """Dictionary-encoded columns (session-3 second pass): the
    DictionaryBatch messages register value vectors by encoding id;
    record-batch columns then hold indices of the declared Int type."""
    t = pa.table(
        {
            "d": pa.array(["x", "y", "x", "z", None, "y"]).dictionary_encode(),
            "n": pa.array([1, 2, 3, None, 5, 6], pa.int64()),
            "di": pa.array([10, 20, 10, 30, 20, None], pa.int64())
            .dictionary_encode(),
        }
    )
    buf = io.BytesIO()
    opener = ipc.new_file if layout == "file" else ipc.new_stream
    with opener(
        buf, t.schema, options=ipc.IpcWriteOptions(compression=compression)
    ) as w:
        w.write_table(t, max_chunksize=3)
    read = arrow_file_read if layout == "file" else arrow_stream_read
    got = read(buf.getvalue())
    for c in t.column_names:
        assert got[c] == t.column(c).to_pylist(), c


def test_dictionary_delta_batches():
    schema = pa.schema([("d", pa.dictionary(pa.int32(), pa.string()))])
    buf = io.BytesIO()
    opts = ipc.IpcWriteOptions(emit_dictionary_deltas=True)
    with ipc.new_stream(buf, schema, options=opts) as w:
        w.write_batch(
            pa.record_batch(
                [pa.array(["a", "b", "a"]).dictionary_encode()], schema=schema
            )
        )
        w.write_batch(
            pa.record_batch(
                [pa.array(["a", "b", "c", "d"]).dictionary_encode()],
                schema=schema,
            )
        )
    got = arrow_stream_read(buf.getvalue())
    assert got["d"] == ["a", "b", "a", "a", "b", "c", "d"]


def test_bad_magic_typed_error():
    with pytest.raises(ValueError, match="magic"):
        arrow_file_read(b"ARROW9" + b"\x00" * 64 + b"ARROW9")


# --- writer lanes (session 3 second pass) ---------------------------------

from yark_spark.operators.arrow_ipc import (  # noqa: E402
    arrow_file_write,
    arrow_stream_write,
)

_WRITE_COLS = {
    "a": [1, 2, None, 4, 5],
    "s": ["x", "yy", None, "zzz", "w" * 40],
    "f": [0.5, None, 2.5, 3.5, 4.5],
    "b": [True, False, None, True, False],
    "vec": [[1.0, 2.0], [3.0], None, [], [5.0, 6.0, 7.0]],
    "bin": [b"ab", None, b"cdef", b"", b"xyz"],
}


@pytest.mark.parametrize("compression", [None, "lz4", "zstd"])
@pytest.mark.parametrize("layout", ["file", "stream"])
def test_pyarrow_reads_our_wire(compression, layout):
    writer = arrow_file_write if layout == "file" else arrow_stream_write
    blob = writer(_WRITE_COLS, compression=compression, batch_rows=2)
    opener = ipc.open_file if layout == "file" else ipc.open_stream
    t = opener(io.BytesIO(blob)).read_all()
    for k, v in _WRITE_COLS.items():
        got = t.column(k).to_pylist()
        if k == "vec":
            got = [list(x) if x is not None else None for x in got]
        assert got == v, k


@pytest.mark.parametrize("compression", [None, "zstd"])
def test_self_roundtrip_written(compression):
    blob = arrow_file_write(_WRITE_COLS, compression=compression, batch_rows=3)
    got = arrow_file_read(blob)
    for k, v in _WRITE_COLS.items():
        assert got[k] == v, k
    blob = arrow_stream_write(_WRITE_COLS, compression=compression)
    got = arrow_stream_read(blob)
    for k, v in _WRITE_COLS.items():
        assert got[k] == v, k


def test_write_empty_and_errors():
    blob = arrow_file_write({"a": []})
    assert ipc.open_file(io.BytesIO(blob)).read_all().num_rows == 0
    assert arrow_file_read(blob) == {"a": []}
    with pytest.raises(NotImplementedError):
        arrow_file_write({"x": [object()]})


# ---------------------------------------------------------------------------
# Round 15: temporal / decimal / duration / map decode + write
# ---------------------------------------------------------------------------


def test_temporal_decimal_map_on_pyarrow_wire():
    import decimal
    import io

    import pyarrow as pa
    import pyarrow.ipc as pi

    from yark_spark.operators.arrow_ipc import arrow_file_read

    t = pa.table(
        {
            "d32": pa.array([0, None, 19000], pa.date32()),
            "d64": pa.array([0, 86400000, None], pa.date64()),
            "ts_us": pa.array([1_700_000_000_123_456, None, 0], pa.timestamp("us")),
            "ts_ns": pa.array([123456789, None, -5], pa.timestamp("ns")),
            "t32": pa.array([1000, None, 86_399_999], pa.time32("ms")),
            "t64": pa.array([123_456_789_000, None, 0], pa.time64("us")),
            "dec": pa.array(
                [decimal.Decimal("12345.678"), None, decimal.Decimal("-0.001")],
                pa.decimal128(18, 3),
            ),
            "dur": pa.array([5_000_000, None, -17], pa.duration("us")),
            "mp": pa.array(
                [{"a": 1}, None, {"b": None, "c": 3}],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    buf = io.BytesIO()
    with pi.new_file(buf, t.schema) as w:
        w.write_table(t)
    cols = arrow_file_read(buf.getvalue())
    assert cols["d32"] == [0, None, 19000]
    assert cols["d64"] == [0, 86400000, None]
    assert cols["ts_us"] == [1_700_000_000_123_456, None, 0]
    assert cols["ts_ns"] == [123456789, None, -5]
    assert cols["t32"] == [1000, None, 86_399_999]
    assert cols["t64"] == [123_456_789_000, None, 0]
    assert cols["dec"] == [12345678, None, -1]  # unscaled ints
    assert cols["dur"] == [5_000_000, None, -17]
    assert cols["mp"] == [[("a", 1)], None, [("b", None), ("c", 3)]]


def test_write_temporal_decimal_struct_map_pyarrow_validates():
    """Our writer's date32 (unit slot written EXPLICITLY — the IDL
    default is MILLISECOND), timestamp[us], time64, decimal128,
    struct and map wire passes pyarrow's full validation and reads
    value-for-value; our reader round-trips the same bytes."""
    import datetime
    import decimal
    import io

    import pyarrow as pa

    from yark_spark.operators.arrow_ipc import arrow_file_read, arrow_file_write

    fields = [
        {"name": "d32", "type": "date", "unit": 0},
        {"name": "ts", "type": "timestamp", "unit": 2},
        {"name": "t64", "type": "time", "unit": 2, "bits": 64},
        {"name": "dec", "type": "decimal", "precision": 18, "scale": 3},
        {"name": "st", "type": "struct", "children": [
            {"name": "a", "type": "int", "bits": 64, "signed": True},
            {"name": "b", "type": "utf8"}]},
        {"name": "mp", "type": "map", "children": [
            {"name": "entries", "type": "struct", "nullable": False,
             "children": [
                 {"name": "key", "type": "utf8", "nullable": False},
                 {"name": "value", "type": "int", "bits": 64,
                  "signed": True}]}]},
    ]
    cols = {
        "d32": [0, None, 19000],
        "ts": [1_700_000_000_000_001, None, -3],
        "t64": [1, None, 86_399_999_999],
        "dec": [12345678, None, -1],
        "st": [{"a": 1, "b": "x"}, None, {"a": None, "b": "y"}],
        "mp": [{"a": 1}, None, {"b": None, "c": 3}],
    }
    blob = arrow_file_write(cols, fields=fields)
    rt = pa.ipc.open_file(io.BytesIO(blob)).read_all()
    rt.validate(full=True)
    pl = rt.to_pylist()
    assert [r["dec"] for r in pl] == [
        decimal.Decimal("12345.678"), None, decimal.Decimal("-0.001"),
    ]
    assert [r["st"] for r in pl] == cols["st"]
    assert [None if r["mp"] is None else dict(r["mp"]) for r in pl] == cols["mp"]
    assert pl[0]["ts"] == datetime.datetime(2023, 11, 14, 22, 13, 20, 1)
    assert pl[0]["t64"] == datetime.time(0, 0, 0, 1)
    assert pl[2]["d32"] == datetime.date(1970, 1, 1) + datetime.timedelta(
        days=19000
    )
    back = arrow_file_read(blob)
    assert back["dec"] == cols["dec"]
    assert back["st"] == cols["st"]
    assert back["mp"] == [[("a", 1)], None, [("b", None), ("c", 3)]]
    assert back["d32"] == cols["d32"]
    assert back["ts"] == cols["ts"]
    assert back["t64"] == cols["t64"]
