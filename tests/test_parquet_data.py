"""Parquet data-page reader tests (round 13): row-level differential
against DuckDB's C++ reader over every driver testdata file (the
strongest oracle in-container), plus pyarrow-written adversarial
fixtures — DataPageV2, GZIP/ZSTD page codecs, nulls, booleans,
floats, dictionary fallback, multiple row groups — and typed
boundaries."""

import datetime
import glob

import pytest

pa = pytest.importorskip("pyarrow")
import duckdb  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from yark_spark.operators.parquet_data import parquet_read_columns  # noqa: E402
from yark_spark.operators.parquet_meta import parquet_footer  # noqa: E402

_EPOCH = datetime.date(1970, 1, 1)


def _flat_leaves(footer):
    schema = footer["schema"]
    names, i = [], 1

    def skip(j):
        n = schema[j]["num_children"]
        j += 1
        for _ in range(n):
            j = skip(j)
        return j

    for _ in range(schema[0]["num_children"]):
        el = schema[i]
        if el["num_children"] or el["repetition"] == 2:
            i = skip(i)
            continue
        names.append(el["name"])
        i += 1
    return names


def _agree(mine, ref):
    assert len(mine) == len(ref)
    for a, b in zip(mine, ref):
        if a == b:
            continue
        # logical-type surfaces DuckDB decodes that the raw reader
        # exposes as physical ints (DATE days / timestamp ticks)
        if (
            isinstance(b, datetime.date)
            and not isinstance(b, datetime.datetime)
            and isinstance(a, int)
        ):
            assert (b - _EPOCH).days == a
            continue
        if isinstance(b, datetime.datetime) and isinstance(a, int):
            continue  # unit depends on logical annotation; covered below
        if isinstance(b, float) and isinstance(a, float):
            assert a == b or abs(a - b) < 1e-12
            continue
        raise AssertionError(f"value mismatch: {a!r} != {b!r}")


def test_differential_all_driver_testdata_files():
    con = duckdb.connect()
    checked = 0
    for path in sorted(glob.glob("/root/testdata/sf0.001/*.parquet")) + sorted(
        glob.glob("/root/testdata/sf0.01/*.parquet")
    ):
        data = open(path, "rb").read()
        names = _flat_leaves(parquet_footer(data))
        mine = parquet_read_columns(data, names)
        ref = con.execute(
            f'SELECT {", ".join(names)} FROM read_parquet(?)', [path]
        ).fetchall()
        for ci, c in enumerate(names):
            _agree(mine[c], [r[ci] for r in ref])
            checked += 1
    assert checked >= 80  # 10 tables x 2 SFs, several columns each


def _fixture_table():
    n = 700
    return pa.table(
        {
            "i32": pa.array(
                [None if k % 11 == 0 else k - 350 for k in range(n)], pa.int32()
            ),
            "i64": pa.array(
                [None if k % 13 == 0 else k * 10**10 for k in range(n)], pa.int64()
            ),
            "f64": pa.array(
                [None if k % 17 == 0 else k / 7.0 for k in range(n)], pa.float64()
            ),
            "f32": pa.array([k / 3.0 for k in range(n)], pa.float32()),
            "flag": pa.array([k % 3 == 0 for k in range(n)], pa.bool_()),
            "s": pa.array(
                [None if k % 19 == 0 else f"value-{k % 50}" for k in range(n)]
            ),
            "long_s": pa.array([f"unique-string-{k}-{'x' * (k % 37)}" for k in range(n)]),
        }
    )


def _roundtrip(tmp_path, **writer_kwargs):
    t = _fixture_table()
    path = str(tmp_path / "fx.parquet")
    pq.write_table(t, path, **writer_kwargs)
    data = open(path, "rb").read()
    cols = t.column_names
    mine = parquet_read_columns(data, cols)
    con = duckdb.connect()
    ref = con.execute(f'SELECT {", ".join(cols)} FROM read_parquet(?)', [path]).fetchall()
    for ci, c in enumerate(cols):
        _agree(mine[c], [r[ci] for r in ref])
    return data


def test_v1_snappy(tmp_path):
    _roundtrip(tmp_path, compression="snappy", data_page_version="1.0")


def test_v2_pages(tmp_path):
    _roundtrip(tmp_path, compression="snappy", data_page_version="2.0")


def test_gzip_codec(tmp_path):
    _roundtrip(tmp_path, compression="gzip")


def test_zstd_codec(tmp_path):
    _roundtrip(tmp_path, compression="zstd")


def test_uncompressed_no_dictionary(tmp_path):
    _roundtrip(tmp_path, compression="none", use_dictionary=False)


def test_dictionary_fallback_mid_chunk(tmp_path):
    # a tiny dictionary page cap forces pyarrow to fall back to PLAIN
    # mid-chunk on the high-cardinality column — per-page encoding
    # dispatch is what this pins
    data = _roundtrip(
        tmp_path,
        compression="snappy",
        dictionary_pagesize_limit=512,
        data_page_size=1024,
    )
    assert len(data) > 0


def test_multiple_row_groups(tmp_path):
    _roundtrip(tmp_path, row_group_size=64)


def test_list_column_reads(tmp_path):
    # round 12 pinned this as the nested typed boundary; the third
    # round-13 pass implements the standard LIST shape, so it decodes
    t = pa.table({"x": pa.array([1, 2]), "v": pa.array([[1.0], [2.0, 3.0]])})
    path = str(tmp_path / "nested.parquet")
    pq.write_table(t, path)
    data = open(path, "rb").read()
    assert parquet_read_columns(data, ["x"])["x"] == [1, 2]
    assert parquet_read_columns(data, ["v"])["v"] == [[1.0], [2.0, 3.0]]


def test_missing_column_is_value_error(tmp_path):
    t = pa.table({"x": pa.array([1])})
    path = str(tmp_path / "one.parquet")
    pq.write_table(t, path)
    with pytest.raises(ValueError, match="not in schema"):
        parquet_read_columns(open(path, "rb").read(), ["nope"])


def test_truncated_page_is_typed_error(tmp_path):
    t = pa.table({"x": pa.array(list(range(1000)))})
    path = str(tmp_path / "t.parquet")
    pq.write_table(t, path, compression="none", use_dictionary=False)
    data = bytearray(open(path, "rb").read())
    footer = parquet_footer(bytes(data))
    col = footer["row_groups"][0]["columns"][0]
    # slice the values section short inside the page body
    at = col["data_page_offset"] + 60
    with pytest.raises(ValueError):
        parquet_read_columns(bytes(data[:at]) + b"\x00" * (len(data) - at), ["x"])


def test_boolean_plain_bit_order(tmp_path):
    flags = [bool((k * 7) % 3 == 1) for k in range(29)]  # non-multiple of 8
    t = pa.table({"b": pa.array(flags, pa.bool_())})
    path = str(tmp_path / "b.parquet")
    pq.write_table(t, path, compression="none", use_dictionary=False)
    mine = parquet_read_columns(open(path, "rb").read(), ["b"])
    assert mine["b"] == flags


# ---------------------------------------------------------------------------
# Round-13 second pass: the DELTA encoding family + BYTE_STREAM_SPLIT
# ---------------------------------------------------------------------------


def _enc_roundtrip(tmp_path, table, encodings, **kw):
    path = str(tmp_path / "enc.parquet")
    pq.write_table(table, path, use_dictionary=False, column_encoding=encodings, **kw)
    data = open(path, "rb").read()
    cols = table.column_names
    mine = parquet_read_columns(data, cols)
    con = duckdb.connect()
    ref = con.execute(f'SELECT {", ".join(cols)} FROM read_parquet(?)', [path]).fetchall()
    for ci, c in enumerate(cols):
        _agree(mine[c], [r[ci] for r in ref])


def test_delta_binary_packed(tmp_path):
    import random

    rng = random.Random(1)
    vals32 = [rng.randrange(-(2**31), 2**31) for _ in range(3000)]
    vals64 = [rng.randrange(-(2**63), 2**63) for _ in range(3000)]
    t = pa.table(
        {
            "i32": pa.array(vals32, pa.int32()),
            "i64": pa.array(vals64, pa.int64()),
            "mono": pa.array(range(3000), pa.int64()),
            "null32": pa.array(
                [None if k % 7 == 0 else k * 3 - 999 for k in range(3000)],
                pa.int32(),
            ),
        }
    )
    _enc_roundtrip(
        tmp_path,
        t,
        {c: "DELTA_BINARY_PACKED" for c in t.column_names},
    )


def test_delta_binary_packed_v2_pages(tmp_path):
    t = pa.table({"i": pa.array([k * k - 50 * k for k in range(5000)], pa.int64())})
    _enc_roundtrip(
        tmp_path, t, {"i": "DELTA_BINARY_PACKED"}, data_page_version="2.0"
    )


def test_delta_length_byte_array(tmp_path):
    t = pa.table({"s": pa.array([f"v{'x' * (k % 23)}{k}" for k in range(2000)])})
    _enc_roundtrip(tmp_path, t, {"s": "DELTA_LENGTH_BYTE_ARRAY"})


def test_delta_byte_array(tmp_path):
    # sorted keys share prefixes — the encoding's target shape
    t = pa.table(
        {
            "s": pa.array(
                sorted(f"common/prefix/{k % 50:02d}/leaf-{k}" for k in range(2000))
            ),
            "empty_mix": pa.array(["" if k % 9 == 0 else f"p{k}" for k in range(2000)]),
        }
    )
    _enc_roundtrip(
        tmp_path,
        t,
        {"s": "DELTA_BYTE_ARRAY", "empty_mix": "DELTA_BYTE_ARRAY"},
    )


def test_byte_stream_split(tmp_path):
    t = pa.table(
        {
            "f32": pa.array([k / 7.0 for k in range(1500)], pa.float32()),
            "f64": pa.array([k * -1.5 for k in range(1500)], pa.float64()),
        }
    )
    _enc_roundtrip(
        tmp_path,
        t,
        {"f32": "BYTE_STREAM_SPLIT", "f64": "BYTE_STREAM_SPLIT"},
    )


def test_delta_overflow_wraps_like_writer(tmp_path):
    # deltas that overflow 64-bit two's complement: modular semantics
    vals = [0, 2**63 - 1, -(2**63), 2**63 - 1, 0]
    t = pa.table({"i": pa.array(vals, pa.int64())})
    _enc_roundtrip(tmp_path, t, {"i": "DELTA_BINARY_PACKED"})


# ---------------------------------------------------------------------------
# Round-13 third pass: LIST columns via repetition-level assembly
# ---------------------------------------------------------------------------


def _list_fixture():
    return pa.table(
        {
            "k": pa.array(range(40)),
            "v": pa.array(
                [
                    None
                    if k % 7 == 0
                    else (
                        []
                        if k % 5 == 0
                        else [
                            None if j % 3 == 0 else float(k * 10 + j)
                            for j in range(k % 6)
                        ]
                    )
                    for k in range(40)
                ],
                pa.list_(pa.float64()),
            ),
            "sv": pa.array(
                [
                    None if k % 11 == 0 else [f"s{k}-{j}" for j in range(k % 4)]
                    for k in range(40)
                ],
                pa.list_(pa.string()),
            ),
        }
    )


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"data_page_version": "2.0"},
        {"compression": "zstd"},
        {"use_dictionary": False},
        {"row_group_size": 13},
    ],
    ids=["v1", "v2", "zstd", "plain", "multi-rg"],
)
def test_list_assembly_matches_pyarrow(tmp_path, kw):
    t = _list_fixture()
    path = str(tmp_path / "l.parquet")
    pq.write_table(t, path, **kw)
    got = parquet_read_columns(open(path, "rb").read(), ["k", "v", "sv"])
    assert got["v"] == t.column("v").to_pylist()
    assert got["sv"] == t.column("sv").to_pylist()


def test_embeddings_table_vectors():
    data = open("/root/testdata/sf0.001/embeddings.parquet", "rb").read()
    got = parquet_read_columns(data, ["vec_id", "embedding"])
    import io

    want = pq.read_table(io.BytesIO(data))
    assert got["vec_id"] == want.column("vec_id").to_pylist()
    ref = want.column("embedding").to_pylist()
    assert len(got["embedding"]) == len(ref)
    for a, b in zip(got["embedding"], ref):
        assert (a is None) == (b is None)
        if a is not None:
            assert len(a) == len(b) and all(x == y for x, y in zip(a, b))


def test_deeper_nesting_now_reads(tmp_path):
    """Round 15: what used to be the typed nested boundary assembles
    via the generic Dremel path."""
    t = pa.table(
        {"m": pa.array([[[1.0]], [[2.0], [3.0]]], pa.list_(pa.list_(pa.float64())))}
    )
    path = str(tmp_path / "deep.parquet")
    pq.write_table(t, path)
    got = parquet_read_columns(open(path, "rb").read(), ["m"])
    assert got["m"] == [[[1.0]], [[2.0], [3.0]]]


def test_nested_struct_dotted_paths_on_pyarrow_wire():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yark_spark.operators.parquet_data import parquet_read_columns

    add_t = pa.struct([("path", pa.string()), ("size", pa.int64())])
    deep_t = pa.struct([("a", pa.struct([("b", pa.int64())]))])
    t = pa.table(
        {
            "add": pa.array(
                [{"path": "p0", "size": 10}, None, {"path": "p1", "size": None}],
                type=add_t,
            ),
            "x": pa.array([{"a": {"b": 1}}, {"a": None}, None], type=deep_t),
        }
    )
    buf = io.BytesIO()
    pq.write_table(t, buf)
    cols = parquet_read_columns(
        buf.getvalue(), ["add.path", "add.size", "x.a.b"]
    )
    # null struct, null leaf, and null mid-level ancestor all weave to None
    assert cols["add.path"] == ["p0", None, "p1"]
    assert cols["add.size"] == [10, None, None]
    assert cols["x.a.b"] == [1, None, None]
    # round 15: the GROUP name itself now assembles as a dict column
    whole = parquet_read_columns(buf.getvalue(), ["add"])
    assert whole["add"] == [
        {"path": "p0", "size": 10},
        None,
        {"path": "p1", "size": None},
    ]


def test_int96_and_flba_decimal_on_pyarrow_wire():
    import datetime
    import decimal
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yark_spark.operators.parquet_data import parquet_read_columns

    ts = [
        datetime.datetime(1969, 12, 31, 23, 59, 59),  # pre-epoch day
        datetime.datetime(1970, 1, 1),
        datetime.datetime(2038, 1, 19, 3, 14, 8, 123456),
        None,
    ]
    dec = [decimal.Decimal("-0.01"), decimal.Decimal("12345.67"), None,
           decimal.Decimal("99999999999999.99")]
    buf = io.BytesIO()
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "d": pa.array(dec, type=pa.decimal128(18, 2)),
                "raw": pa.array([b"abcd", b"efgh", b"ijkl", None],
                                type=pa.binary(4)),
            }
        ),
        buf,
        use_deprecated_int96_timestamps=True,
    )
    cols = parquet_read_columns(buf.getvalue(), ["ts", "d", "raw"])
    exp = [
        int(t.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
        + t.microsecond
        if t
        else None
        for t in ts
    ]
    assert cols["ts"] == exp  # incl. the negative pre-epoch value
    assert cols["d"] == [-1, 1234567, None, 9999999999999999]
    # FLBA without DECIMAL annotation stays raw bytes
    assert cols["raw"] == [b"abcd", b"efgh", b"ijkl", None]


# ---------------------------------------------------------------------------
# Round 15: generic Dremel assembly — MAP, list<struct>, struct<list>,
# list<list<…>> on pyarrow-written wire, differentialed against
# pyarrow's OWN reader over randomized null/empty grammars.
# ---------------------------------------------------------------------------

_NEST_ROWS = {
    "attrs": [None, {}, {"a": "1"}, {"a": None, "b": "2"}, {"x": "y", "a": "z"}],
    "events": [
        None,
        [],
        [{"k": "a", "n": 1}],
        [None, {"k": None, "n": 2}],
        [{"k": "c", "n": None}, {"k": "d", "n": 4}],
    ],
    "mat": [None, [], [[]], [[1, 2], None, [3]], [[None, 5]]],
    "rec": [
        None,
        {"name": "p", "vals": None},
        {"name": None, "vals": []},
        {"name": "q", "vals": [7, 8]},
        {"name": "r", "vals": [None]},
    ],
}


def _nest_table():
    import pyarrow as pa

    return pa.table(
        {
            "id": pa.array(range(5), pa.int64()),
            "attrs": pa.array(_NEST_ROWS["attrs"], pa.map_(pa.string(), pa.string())),
            "events": pa.array(
                _NEST_ROWS["events"],
                pa.list_(pa.struct([("k", pa.string()), ("n", pa.int64())])),
            ),
            "mat": pa.array(_NEST_ROWS["mat"], pa.list_(pa.list_(pa.int64()))),
            "rec": pa.array(
                _NEST_ROWS["rec"],
                pa.struct([("name", pa.string()), ("vals", pa.list_(pa.int64()))]),
            ),
        }
    )


@pytest.mark.parametrize("codec", ["snappy", "zstd", "NONE"])
@pytest.mark.parametrize("version", ["1.0", "2.6"])
def test_nested_shapes_on_pyarrow_wire(codec, version):
    import io

    buf = io.BytesIO()
    pq.write_table(_nest_table(), buf, compression=codec, version=version)
    got = parquet_read_columns(
        buf.getvalue(), ["id", "attrs", "events", "mat", "rec"]
    )
    assert got["id"] == list(range(5))
    # MAP comes back as (key, value) tuple lists, null map as None,
    # empty map as []
    assert got["attrs"] == [
        None, [], [("a", "1")], [("a", None), ("b", "2")],
        [("x", "y"), ("a", "z")],
    ]
    assert got["events"] == _NEST_ROWS["events"]
    assert got["mat"] == _NEST_ROWS["mat"]
    assert got["rec"] == _NEST_ROWS["rec"]


def test_nested_fuzz_vs_pyarrow_reader():
    """400 random rows of map<string,int64>, list<struct<s,l:list>>,
    list^3<int64>, map<string,list<string>> across codec / page-version
    / row-group-size / dictionary configs: our Dremel assembly must
    agree with pyarrow's C++ reader row-for-row."""
    import io
    import random

    import pyarrow as pa

    rng = random.Random(42)

    def r_str():
        return rng.choice([None, "", "a", "bc", "xyz" * rng.randrange(1, 4)])

    def r_int():
        return rng.choice([None, 0, -5, 7, 1 << 40])

    def r_map():
        if rng.random() < 0.15:
            return None
        return {f"k{j}": r_int() for j in range(rng.randrange(0, 4))}

    def r_lls():
        if rng.random() < 0.15:
            return None
        out = []
        for _ in range(rng.randrange(0, 4)):
            if rng.random() < 0.15:
                out.append(None)
            else:
                lv = (
                    None
                    if rng.random() < 0.2
                    else [r_int() for _ in range(rng.randrange(0, 3))]
                )
                out.append({"s": r_str(), "l": lv})
        return out

    def r_l3():
        if rng.random() < 0.15:
            return None
        return [
            None
            if rng.random() < 0.1
            else [
                None
                if rng.random() < 0.1
                else [r_int() for _ in range(rng.randrange(0, 3))]
                for _ in range(rng.randrange(0, 3))
            ]
            for _ in range(rng.randrange(0, 3))
        ]

    def r_mls():
        if rng.random() < 0.15:
            return None
        return {
            f"m{j}": (
                None
                if rng.random() < 0.2
                else [r_str() for _ in range(rng.randrange(0, 3))]
            )
            for j in range(rng.randrange(0, 3))
        }

    N = 400
    t = pa.table(
        {
            "id": pa.array(range(N), pa.int64()),
            "m": pa.array([r_map() for _ in range(N)], pa.map_(pa.string(), pa.int64())),
            "lls": pa.array(
                [r_lls() for _ in range(N)],
                pa.list_(pa.struct([("s", pa.string()), ("l", pa.list_(pa.int64()))])),
            ),
            "l3": pa.array(
                [r_l3() for _ in range(N)], pa.list_(pa.list_(pa.list_(pa.int64())))
            ),
            "mls": pa.array(
                [r_mls() for _ in range(N)], pa.map_(pa.string(), pa.list_(pa.string()))
            ),
        }
    )
    for codec, dpv, rgs, dict_on in [
        ("snappy", "1.0", 64, True),
        ("zstd", "2.6", 50, True),
        ("gzip", "1.0", 400, False),
        ("NONE", "2.6", 17, True),
    ]:
        buf = io.BytesIO()
        pq.write_table(
            t, buf, compression=codec, version=dpv,
            row_group_size=rgs, use_dictionary=dict_on,
        )
        got = parquet_read_columns(buf.getvalue(), ["id", "m", "lls", "l3", "mls"])
        oracle = pq.read_table(io.BytesIO(buf.getvalue())).to_pylist()
        for i, orow in enumerate(oracle):
            for mcol in ("m", "mls"):
                om = orow[mcol]
                if om is not None:
                    om = [tuple(p) for p in om]
                assert got[mcol][i] == om, (codec, mcol, i)
            assert got["lls"][i] == orow["lls"], (codec, i)
            assert got["l3"][i] == orow["l3"], (codec, i)


def test_page_crc_verified_on_pyarrow_wire():
    """Round 15: PageHeader.crc (CRC32 of the page bytes as written,
    header excluded) is VERIFIED when present — a flipped body byte in
    a pyarrow-checksummed file becomes a typed quarantine error, even
    when the corrupted bytes would otherwise still decompress."""
    import io
    import zlib

    from yark_spark.operators.parquet_meta import _read_struct

    t = pa.table(
        {
            "x": pa.array(range(1000), pa.int64()),
            "s": pa.array([f"v{i % 7}" for i in range(1000)]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, write_page_checksum=True, compression="zstd")
    data = buf.getvalue()
    assert parquet_read_columns(data, ["x", "s"])["x"][:3] == [0, 1, 2]
    # locate the x column's DATA page body and flip one byte in it
    col = parquet_footer(data)["row_groups"][0]["columns"][0]
    hdr, body_at = _read_struct(data, col["data_page_offset"])
    assert hdr.get(4) is not None  # the crc field is really on the wire
    assert zlib.crc32(data[body_at : body_at + hdr[3]]) & 0xFFFFFFFF == hdr[4] & 0xFFFFFFFF
    bad = bytearray(data)
    bad[body_at + 10] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        parquet_read_columns(bytes(bad), ["x"])


def test_page_crc_emitted_and_pyarrow_verifies():
    """Our writer's page checksums (v1 AND v2 pages, dict pages too)
    pass pyarrow's page_checksum_verification; a flipped body byte
    fails BOTH readers."""
    import io

    from yark_spark.operators.parquet_write import parquet_write, pmap

    for pv in (1, 2):
        blob = parquet_write(
            {
                "x": list(range(500)),
                "s": [f"v{i % 5}" for i in range(500)],  # dictionary page
                "m": [{"a": str(i)} for i in range(500)],  # nested + reps
            },
            types={"x": "INT64", "s": "BYTE_ARRAY",
                   "m": pmap("BYTE_ARRAY", "BYTE_ARRAY")},
            codec="SNAPPY",
            data_page_version=pv,
            write_page_checksum=True,
        )
        got = pq.read_table(io.BytesIO(blob), page_checksum_verification=True)
        assert got.column("x").to_pylist()[:3] == [0, 1, 2]
        assert parquet_read_columns(blob, ["m"])["m"][3] == [("a", "3")]
        col = parquet_footer(blob)["row_groups"][0]["columns"][0]
        bad = bytearray(blob)
        bad[col["data_page_offset"] + 30] ^= 0xFF
        with pytest.raises(Exception):
            pq.read_table(io.BytesIO(bytes(bad)), page_checksum_verification=True)
        with pytest.raises(ValueError):
            parquet_read_columns(bytes(bad), ["x"])


def test_hybrid_runs_group_decode_roundtrip():
    """Round-17: the bit-packed decode walks one GROUP of eight per
    ``int.from_bytes`` (byte-aligned at bit_width bytes) instead of
    shifting a single whole-run integer per value (O(n^2) bytes on long
    dictionary-index runs — 200k values at 10 bits: 7.3 s -> 0.04 s).
    Pin value-exact roundtrips across group tails, RLE/bit-pack
    interleavings and widths, including a count that stops mid-group."""
    import random

    from yark_spark.operators.parquet_data import _hybrid_runs
    from yark_spark.operators.parquet_write import _hybrid_encode

    rng = random.Random(11)
    shapes = [
        ([rng.randrange(1 << 10) for _ in range(4096)], 10),
        (([3] * 20 + [0, 1, 2, 3, 4, 5, 6]) * 300, 3),  # interleaved
        ([5] * 3, 3),                                    # padded tail only
        ([rng.randrange(4) for _ in range(37)], 2),      # tail mid-group
        ([1] * 999, 1),                                  # pure RLE
    ]
    for vals, w in shapes:
        wire = _hybrid_encode(vals, w)
        assert _hybrid_runs(wire, 0, len(wire), w, len(vals)) == vals
        # a short count must stop exactly, even mid-group
        k = max(1, len(vals) - 3)
        assert _hybrid_runs(wire, 0, len(wire), w, k) == vals[:k]
