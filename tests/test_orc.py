"""ORC reader tests (round 13): value-level differential against
pyarrow's ORC_CPP writer (genuine third-party wire) across all five
compressions and every supported type/encoding, RLEv2 sub-encoding
coverage probes, multi-stripe assembly, and typed boundaries."""

import random

import pytest

pa = pytest.importorskip("pyarrow")
import io  # noqa: E402

import pyarrow.orc as orc  # noqa: E402

from yark_spark.operators.orc import (  # noqa: E402
    _byte_rle,
    _rlev2,
    orc_read_columns,
)


def _write(table, compression="zlib", **kw):
    buf = io.BytesIO()
    orc.write_table(table, buf, compression=compression, **kw)
    return buf.getvalue()


def _table(n=3000, seed=3):
    rng = random.Random(seed)
    return pa.table(
        {
            "i": pa.array(
                [None if k % 7 == 0 else k - 500 for k in range(n)], pa.int64()
            ),
            "i32": pa.array([k * 3 - n for k in range(n)], pa.int32()),
            "i16": pa.array([(k % 200) - 100 for k in range(n)], pa.int16()),
            "i8": pa.array([(k % 250) - 125 for k in range(n)], pa.int8()),
            "s": pa.array([None if k % 11 == 0 else f"val-{k % 20}" for k in range(n)]),
            "u": pa.array([f"uniq-{k}" for k in range(n)]),
            "f32": pa.array([k / 3.0 for k in range(n)], pa.float32()),
            "f64": pa.array([k / 7.0 for k in range(n)], pa.float64()),
            "b": pa.array([k % 3 == 0 for k in range(n)], pa.bool_()),
            "r": pa.array(
                [rng.randrange(-(2**40), 2**40) for _ in range(n)], pa.int64()
            ),
        }
    )


@pytest.mark.parametrize(
    "compression", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_differential_vs_orc_cpp(compression):
    t = _table()
    got = orc_read_columns(_write(t, compression))
    for c in t.column_names:
        assert got[c] == t.column(c).to_pylist(), (compression, c)


def test_multi_stripe():
    t = _table(n=9000)
    blob = _write(t, "zlib", stripe_size=16 * 1024)
    f = orc.ORCFile(io.BytesIO(blob))
    assert f.nstripes >= 2  # the fixture really is multi-stripe
    got = orc_read_columns(blob)
    for c in t.column_names:
        assert got[c] == t.column(c).to_pylist(), c


def test_column_subset_and_missing():
    t = _table(n=500)
    blob = _write(t)
    got = orc_read_columns(blob, ["i", "s"])
    assert set(got) == {"i", "s"}
    assert got["i"] == t.column("i").to_pylist()
    with pytest.raises(ValueError, match="not in schema"):
        orc_read_columns(blob, ["nope"])


def test_nested_column_list_decodes_since_r14():
    # LIST was the typed boundary through round 13; round 14 decodes it
    t = pa.table({"x": pa.array([1, 2]), "v": pa.array([[1.0], [2.0, 3.0]])})
    blob = _write(t)
    assert orc_read_columns(blob, ["x"])["x"] == [1, 2]
    assert orc_read_columns(blob, ["v"])["v"] == [[1.0], [2.0, 3.0]]
    # default column set now includes repeated columns
    assert set(orc_read_columns(blob)) == {"x", "v"}


def test_nested_typed_boundary():
    # round 15: top-level STRUCT columns assemble to dicts; only
    # genuinely unknown kinds (UNION) stay typed
    t = pa.table({"s": pa.array([{"a": 1}], pa.struct([("a", pa.int64())]))})
    assert orc_read_columns(_write(t), ["s"])["s"] == [{"a": 1}]
    with pytest.raises(ValueError, match="not in schema"):
        orc_read_columns(_write(t), ["nope"])


def test_bad_magic_and_truncation_typed():
    t = pa.table({"x": pa.array(range(100))})
    blob = _write(t)
    with pytest.raises(ValueError, match="magic"):
        orc_read_columns(b"XXX" + blob[3:])
    with pytest.raises(ValueError):
        orc_read_columns(blob[: len(blob) // 2] + blob[-30:])


# ---------------------------------------------------------------------------
# RLEv2 sub-encodings: drive each through the real writer with data
# shaped to trigger it, and pin the primitives with hand vectors
# ---------------------------------------------------------------------------


def test_rlev2_short_repeat_vector():
    # ORC spec example: 10000 x3 -> 0x0a 0x27 0x10
    assert _rlev2(bytes([0x0A, 0x27, 0x10]), 3, signed=False) == [10000] * 3


def test_rlev2_direct_vector():
    # ORC spec example: [23713, 43806, 57005, 48879] ->
    # 5e 03 5c a1 ab 1e de ad be ef
    enc = bytes.fromhex("5e035ca1ab1edeadbeef")
    assert _rlev2(enc, 4, signed=False) == [23713, 43806, 57005, 48879]


def test_rlev2_delta_vector():
    # ORC spec example: the first primes — base 2, delta base +1,
    # then 4-bit deltas 2,2,4,2,4,2,4,6
    enc = bytes.fromhex("c609020222424246")
    assert _rlev2(enc, 10, signed=False) == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]


def test_rlev2_fixed_delta():
    # width code 0 = fixed delta: 10 values stepping by -3 from 100
    # header: mode 3, wcode 0, len-1=9 -> c0 09; base varint 100,
    # delta svarint -3 (zigzag 5)
    enc = bytes.fromhex("c0096405")
    assert _rlev2(enc, 10, signed=False) == list(range(100, 70, -3))


def test_byte_rle_vectors():
    # run: 0x61 x100 -> 61 00? no: control 97 = run of 100
    assert _byte_rle(bytes([0x61, 0x00]), 100) == [0] * 100
    assert _byte_rle(bytes([0xFE, 0x44, 0x45]), 2) == [0x44, 0x45]


def test_monotonic_ids_exercise_delta():
    # doc_id-like columns: the writer emits DELTA runs
    t = pa.table({"id": pa.array(range(5000), pa.int64())})
    assert orc_read_columns(_write(t))["id"] == list(range(5000))


def test_outlier_heavy_exercise_patched_base():
    rng = random.Random(9)
    vals = [2000 + rng.randrange(200) for _ in range(512)]
    for k in range(0, 512, 97):
        vals[k] = 10**9 + k  # outliers force PATCHED BASE
    t = pa.table({"x": pa.array(vals, pa.int64())})
    assert orc_read_columns(_write(t))["x"] == vals


# ---------------------------------------------------------------------------
# Round-13 second half: the ORC WRITER — the real library reads ours
# ---------------------------------------------------------------------------

_WCOLS = {
    "i": [None if k % 7 == 0 else k - 500 for k in range(2000)],
    "s": [None if k % 11 == 0 else f"val-{k % 20}" for k in range(2000)],
    "f": [k / 7.0 for k in range(2000)],
    "b": [k % 3 == 0 for k in range(2000)],
}


@pytest.mark.parametrize("compression", ["NONE", "ZLIB"])
def test_writer_read_by_orc_cpp(compression):
    from yark_spark.operators.orc import orc_write

    blob = orc_write(_WCOLS, compression=compression, stripe_rows=700)
    t = orc.ORCFile(io.BytesIO(blob)).read()
    for c, vals in _WCOLS.items():
        assert t.column(c).to_pylist() == vals, (compression, c)
    assert orc.ORCFile(io.BytesIO(blob)).nstripes == 3


@pytest.mark.parametrize("compression", ["NONE", "ZLIB"])
def test_writer_read_by_our_reader(compression):
    from yark_spark.operators.orc import orc_write

    blob = orc_write(_WCOLS, compression=compression, stripe_rows=700)
    got = orc_read_columns(blob)
    for c, vals in _WCOLS.items():
        assert got[c] == vals, (compression, c)


def test_writer_rlev2_subset_roundtrips():
    from yark_spark.operators.orc import _rlev2_encode

    import random as _r

    rng = _r.Random(17)
    for trial in range(60):
        n = rng.randrange(0, 1500)
        kind = trial % 4
        if kind == 0:
            vals = [rng.randrange(-(2**50), 2**50) for _ in range(n)]
        elif kind == 1:
            vals = [rng.choice([0, 1, -1]) for _ in range(n)]
        elif kind == 2:
            vals = [7] * n
        else:
            vals = [k * 3 for k in range(n)]
        for signed in (True, False):
            if not signed and any(v < 0 for v in vals):
                continue
            enc = _rlev2_encode(vals, signed)
            assert _rlev2(enc, n, signed) == vals, (trial, signed)


def test_writer_all_null_and_empty():
    from yark_spark.operators.orc import orc_write

    blob = orc_write({"n": [None, None], "v": [1.5, 2.5]})
    t = orc.ORCFile(io.BytesIO(blob)).read()
    assert t.column("n").to_pylist() == [None, None]
    assert t.column("v").to_pylist() == [1.5, 2.5]
    got = orc_read_columns(blob)
    assert got["n"] == [None, None] and got["v"] == [1.5, 2.5]


# ---------------------------------------------------------------------------
# Stripe pruning on StripeStatistics (round 13 s3)
# ---------------------------------------------------------------------------


def test_stripe_prune_on_real_orc_cpp_wire():
    import io

    import pyarrow as pa
    import pyarrow.orc as po

    from yark_spark.operators.orc import orc_scan_filtered

    n = 8192  # ORC_CPP batches stripes at 1024 rows with a small limit
    buf = io.BytesIO()
    po.write_table(
        pa.table({"k": list(range(n)), "t": [f"x{i:06d}" for i in range(n)]}),
        buf,
        stripe_size=64 * 1024,
    )
    blob = buf.getvalue()
    cols, cnt = orc_scan_filtered(blob, ["k", "t"], "k", 3000, 3010)
    assert cols["k"] == list(range(3000, 3011))
    assert cnt == {"stripes_total": 8, "skipped_stats": 7, "skipped_bloom": 0, "stripes_scanned": 1}
    # string bounds from StringStatistics
    cols, cnt = orc_scan_filtered(blob, ["k"], "t", "x000500", "x000502")
    assert cols["k"] == [500, 501, 502] and cnt["stripes_scanned"] == 1
    # disjoint range decodes nothing
    cols, cnt = orc_scan_filtered(blob, ["t"], "k", 10**9)
    assert cols["t"] == [] and cnt["skipped_stats"] == 8


def test_stripe_prune_on_our_writer_and_orc_cpp_still_reads():
    import io

    import pyarrow.orc as po

    from yark_spark.operators.orc import orc_scan_filtered, orc_write

    blob = orc_write(
        {"k": list(range(64)), "t": [f"x{i:02d}" for i in range(64)]},
        types={"k": "LONG", "t": "STRING"},
        compression="ZLIB",
        stripe_rows=8,
    )
    cols, cnt = orc_scan_filtered(blob, ["k"], "k", 24, 39)
    assert cols["k"] == list(range(24, 40))
    assert cnt == {"stripes_total": 8, "skipped_stats": 6, "skipped_bloom": 0, "stripes_scanned": 2}
    t = po.read_table(io.BytesIO(blob))
    assert t.num_rows == 64  # metadata section doesn't disturb ORC_CPP


def test_stripe_prune_nulls_and_missing_stats_scan():
    from yark_spark.operators.orc import orc_scan_filtered, orc_write

    blob = orc_write(
        {"k": [1, None, 3, None, 100, 101, None, 103],
         "d": [0.5] * 8},
        types={"k": "LONG", "d": "DOUBLE"},
        stripe_rows=4,
    )
    cols, cnt = orc_scan_filtered(blob, ["k"], "k", 100, 200)
    assert cols["k"] == [100, 101, 103] and cnt["skipped_stats"] == 1
    # DOUBLE has no bounds in our stats: every stripe scans (superset)
    cols, cnt = orc_scan_filtered(blob, ["k"], "d", 0.4, 0.6)
    assert cnt["skipped_stats"] == 0 and len(cols["k"]) == 8


# ---------------------------------------------------------------------------
# Bloom filter streams (round 13 s3)
# ---------------------------------------------------------------------------


def test_bloom_probe_real_orc_cpp_wire_long_and_string():
    """The strongest in-container bloom differential: blooms written
    by ORC_CPP itself, probed by the from-scratch Murmur3-hash64 /
    signed-Wang hashes — a wrong hash misses essentially every
    present value."""
    import io

    import pyarrow as pa
    import pyarrow.orc as po

    from yark_spark.operators.orc import orc_scan_filtered

    n = 8192
    buf = io.BytesIO()
    po.write_table(
        pa.table(
            {"k": [2 * i for i in range(n)], "t": [f"w{i:05d}" for i in range(n)]}
        ),
        buf,
        stripe_size=64 * 1024,
        bloom_filter_columns=[1, 2],  # ORC type ids
    )
    blob = buf.getvalue()
    # present long probes must never bloom-skip (no false negatives)
    for v in (0, 2000, 2 * n - 2):
        cols, cnt = orc_scan_filtered(blob, ["t"], "k", v)
        assert cols["t"] == [f"w{v // 2:05d}"]
        assert cnt["skipped_bloom"] == 0
    # absent in-range longs: stats can't help, bloom must
    skipped = 0
    for v in range(2001, 2101, 2):
        cols, cnt = orc_scan_filtered(blob, ["t"], "k", v)
        assert cols["t"] == []
        skipped += cnt["skipped_bloom"]
    assert skipped >= 45  # ~1% fpp
    # string blooms (Murmur3 hash64, Hive seed)
    cols, cnt = orc_scan_filtered(blob, ["k"], "t", "w00777")
    assert cols["k"] == [1554] and cnt["skipped_bloom"] == 0
    cols, cnt = orc_scan_filtered(blob, ["k"], "t", "w00777x")
    assert cols["k"] == [] and cnt["skipped_bloom"] + cnt["skipped_stats"] == 8


def test_bloom_long_hash_signed_shift_semantics():
    # value 0 walks through ~0 = -1; ARITHMETIC shifts collapse it to
    # hash 0 — the exact divergence an unsigned transcription has.
    from yark_spark.operators.orc import orc_long_hash

    assert orc_long_hash(0) == 0
    assert orc_long_hash(1) != 0
    # stability pin: the function is pure integer math
    assert orc_long_hash(123456789) == orc_long_hash(123456789)


def test_bloom_our_writer_probe_and_orc_cpp_reads():
    import io

    import pyarrow.orc as po

    from yark_spark.operators.orc import orc_scan_filtered, orc_write

    blob = orc_write(
        {"k": [2 * i for i in range(64)], "t": [f"w{i:02d}" for i in range(64)]},
        types={"k": "LONG", "t": "STRING"},
        compression="ZLIB",
        stripe_rows=8,
        bloom_filter_columns=["k", "t"],
    )
    skips = scans = 0
    for probe in range(1, 127, 2):  # absent (keys even)
        cols, cnt = orc_scan_filtered(blob, ["t"], "k", probe)
        assert cols["t"] == []
        skips += cnt["skipped_bloom"]
        scans += cnt["stripes_scanned"]
    assert skips + scans == 56 and skips >= 53
    # present probes never skip; range probes don't consult blooms
    cols, cnt = orc_scan_filtered(blob, ["t"], "k", 30)
    assert cols["t"] == ["w15"] and cnt["skipped_bloom"] == 0
    cols, cnt = orc_scan_filtered(blob, ["k"], "k", 20, 40)
    assert cnt["skipped_bloom"] == 0
    assert po.read_table(io.BytesIO(blob)).num_rows == 64


def test_logical_types_on_orc_cpp_wire():
    import datetime
    import decimal
    import io

    import pyarrow as pa
    import pyarrow.orc as po

    from yark_spark.operators.orc import orc_read_columns

    ts = [
        datetime.datetime(2014, 12, 31, 23, 59, 59),  # pre-2015 base
        datetime.datetime(2015, 1, 1),
        datetime.datetime(2020, 6, 1, 12, 34, 56, 789000),  # trailing zeros
        datetime.datetime(2038, 1, 19, 3, 14, 8, 123456),
        None,
    ]
    dt = [datetime.date(1969, 12, 31), datetime.date(1970, 1, 1),
          datetime.date(2024, 2, 29), None, datetime.date(2100, 1, 1)]
    dec = [decimal.Decimal("-0.01"), decimal.Decimal("0.00"),
           decimal.Decimal("12345.67"), None,
           decimal.Decimal("-99999999999999.99")]
    bn = [b"", b"a", b"\x00\xff", None, b"xyz"]
    buf = io.BytesIO()
    po.write_table(
        pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "dt": pa.array(dt, type=pa.date32()),
                "d": pa.array(dec, type=pa.decimal128(18, 2)),
                "b": pa.array(bn, type=pa.binary()),
            }
        ),
        buf,
    )
    cols = orc_read_columns(buf.getvalue(), ["ts", "dt", "d", "b"])
    exp_ts = [
        int(x.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
        + x.microsecond
        if x
        else None
        for x in ts
    ]
    exp_dt = [(x - datetime.date(1970, 1, 1)).days if x else None for x in dt]
    exp_d = [int(x.scaleb(2)) if x is not None else None for x in dec]
    assert cols["ts"] == exp_ts
    assert cols["dt"] == exp_dt
    assert cols["d"] == exp_d
    assert cols["b"] == bn


def test_nested_struct_dotted_paths_on_orc_cpp_wire():
    import io

    import pyarrow as pa
    import pyarrow.orc as po

    from yark_spark.operators.orc import orc_read_columns

    s_t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    deep_t = pa.struct([("x", pa.struct([("y", pa.int64())]))])
    t = pa.table(
        {
            "k": [1, 2, 3, 4],
            "s": pa.array(
                [{"a": 10, "b": "p"}, None, {"a": None, "b": "q"},
                 {"a": 30, "b": None}],
                type=s_t,
            ),
            "d": pa.array(
                [{"x": {"y": 7}}, {"x": None}, None, {"x": {"y": 9}}],
                type=deep_t,
            ),
        }
    )
    buf = io.BytesIO()
    po.write_table(t, buf)
    cols = orc_read_columns(buf.getvalue(), ["k", "s.a", "s.b", "d.x.y"])
    # null struct, null leaf, and null mid-level all weave to None
    assert cols["s.a"] == [10, None, None, 30]
    assert cols["s.b"] == ["p", None, "q", None]
    assert cols["d.x.y"] == [7, None, None, 9]
    # round 15: default selection includes STRUCT columns too
    assert sorted(orc_read_columns(buf.getvalue()).keys()) == ["d", "k", "s"]


# ---------------------------------------------------------------------------
# Round 14: LIST / MAP repeated columns (fixtures written by ORC_CPP)
# ---------------------------------------------------------------------------


def _repeated_table():
    import pyarrow as pa

    rows = 50
    rng = random.Random(7)
    emb = []
    for i in range(rows):
        if i % 11 == 3:
            emb.append(None)  # null row
        elif i % 11 == 7:
            emb.append([])  # empty list
        else:
            v = [round(rng.uniform(-1, 1), 6) for _ in range(8)]
            if i % 5 == 0:
                v[2] = None  # null element
            emb.append(v)
    ints = [
        None if i % 13 == 5 else [i, i * 2, None if i % 4 == 0 else i * 3]
        for i in range(rows)
    ]
    maps = [
        None if i % 17 == 2 else {f"k{j}": i * 10 + j for j in range(i % 4)}
        for i in range(rows)
    ]
    lol = [
        None if i % 19 == 4 else [[i, 1], [], [2, None, 3]][: (i % 3) + 1]
        for i in range(rows)
    ]
    strs = [None if i % 7 == 1 else [f"s{i}", "", f"val{i % 5}"] for i in range(rows)]
    t = pa.table(
        {
            "id": pa.array(range(rows), pa.int64()),
            "emb": pa.array(emb, pa.list_(pa.float32())),
            "ints": pa.array(ints, pa.list_(pa.int64())),
            "m": pa.array(maps, pa.map_(pa.string(), pa.int64())),
            "lol": pa.array(lol, pa.list_(pa.list_(pa.int32()))),
            "strs": pa.array(strs, pa.list_(pa.string())),
        }
    )
    return t, emb, ints, maps, lol, strs


@pytest.mark.parametrize(
    "compression", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_list_map_on_orc_cpp_wire(compression):
    """LIST/MAP differential over real ORC_CPP wire: null row, empty
    list, null element, list<list<…>>, map<string,int64>, list<string>
    — every cell value-compared, all five chunk codecs."""
    import struct as st

    t, emb, ints, maps, lol, strs = _repeated_table()
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=compression)
    got = orc_read_columns(buf.getvalue())
    assert got["id"] == list(range(50))

    def f32(x):
        return None if x is None else st.unpack("<f", st.pack("<f", x))[0]

    assert got["emb"] == [
        None if e is None else [f32(x) for x in e] for e in emb
    ]
    assert got["ints"] == ints
    assert got["m"] == maps
    assert got["lol"] == lol
    assert got["strs"] == strs


def test_list_map_multi_stripe():
    import pyarrow as pa

    rows = 3000
    vals = [
        None if i % 97 == 13 else [i % 7, None if i % 31 == 4 else i]
        for i in range(rows)
    ]
    t = pa.table(
        {
            "id": pa.array(range(rows), pa.int64()),
            "v": pa.array(vals, pa.list_(pa.int64())),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf, stripe_size=1024)  # forces several stripes
    got = orc_read_columns(buf.getvalue())
    assert got["id"] == list(range(rows))
    assert got["v"] == vals


def test_struct_inside_list_and_map_values():
    """Round 14 second pass: structs under repeated ancestors assemble
    recursively — null struct elements, null fields, struct map values
    all pinned against real ORC_CPP wire."""
    import pyarrow as pa

    st = pa.struct([("a", pa.int64()), ("b", pa.string())])
    rows = 60
    xs = []
    for i in range(rows):
        if i % 11 == 3:
            xs.append(None)
        elif i % 11 == 7:
            xs.append([])
        else:
            xs.append(
                [{"a": i, "b": f"s{i}"},
                 None if i % 5 == 0 else {"a": None, "b": "q"}]
            )
    ms = [None if i % 9 == 2 else {"k": {"a": i, "b": None}}
          for i in range(rows)]
    t = pa.table(
        {
            "id": pa.array(range(rows), pa.int64()),
            "xs": pa.array(xs, pa.list_(st)),
            "m": pa.array(ms, pa.map_(pa.string(), st)),
        }
    )
    for comp in ("uncompressed", "zlib", "zstd"):
        buf = io.BytesIO()
        orc.write_table(t, buf, compression=comp)
        got = orc_read_columns(buf.getvalue())
        assert got["xs"] == xs, comp
        assert got["m"] == ms, comp


def test_list_under_struct_parent_presence():
    """A LIST nested under a nullable STRUCT weaves through the
    ancestor presence chain like any other dotted leaf."""
    import pyarrow as pa

    s_t = pa.struct([("xs", pa.list_(pa.int64())), ("k", pa.int64())])
    t = pa.table(
        {
            "id": [1, 2, 3, 4],
            "s": pa.array(
                [{"xs": [1, 2], "k": 9}, None, {"xs": None, "k": 8},
                 {"xs": [], "k": 7}],
                type=s_t,
            ),
        }
    )
    buf = io.BytesIO()
    orc.write_table(t, buf)
    cols = orc_read_columns(buf.getvalue(), ["id", "s.xs", "s.k"])
    assert cols["s.xs"] == [[1, 2], None, None, []]
    assert cols["s.k"] == [9, None, 8, 7]


@pytest.mark.parametrize("compression", ["NONE", "ZLIB"])
def test_writer_list_columns_read_by_orc_cpp(compression):
    from yark_spark.operators.orc import orc_write

    """Round 14: the writer's LIST support — our reader AND real
    ORC_CPP must read the same files value-for-value (null row, empty
    list, null element, string elements, FLOAT elements)."""
    rows = 40
    emb, strs = [], []
    for i in range(rows):
        if i % 11 == 3:
            emb.append(None)
        elif i % 11 == 7:
            emb.append([])
        else:
            v = [round(i * 0.5 + j, 3) for j in range(5)]
            if i % 5 == 0:
                v[2] = None
            emb.append(v)
        strs.append(None if i % 7 == 1 else [f"s{i}", "", "x"])
    cols = {"id": list(range(rows)), "emb": emb, "strs": strs}
    blob = orc_write(
        cols,
        types={"id": "LONG", "emb": "LIST<DOUBLE>", "strs": "LIST<STRING>"},
        compression=compression,
        stripe_rows=16,
    )
    back = orc_read_columns(blob)
    assert back["id"] == cols["id"]
    assert back["emb"] == emb
    assert back["strs"] == strs
    t = orc.read_table(io.BytesIO(blob))
    assert t.column("id").to_pylist() == cols["id"]
    assert t.column("emb").to_pylist() == emb
    assert t.column("strs").to_pylist() == strs


def test_writer_list_float_elements():
    from yark_spark.operators.orc import orc_write

    blob = orc_write(
        {"v": [[0.5, 1.25], None, []]},
        types={"v": "LIST<FLOAT>"},
        compression="ZLIB",
    )
    assert orc_read_columns(blob)["v"] == [[0.5, 1.25], None, []]
    t = orc.read_table(io.BytesIO(blob))
    assert t.column("v").to_pylist() == [[0.5, 1.25], None, []]


def test_writer_list_unknown_element_type_typed():
    from yark_spark.operators.orc import orc_write

    # round 15: LIST<DECIMAL(p,s)> writes now; a genuinely unknown
    # element type stays typed
    with pytest.raises(NotImplementedError, match="type"):
        orc_write({"v": [[1]]}, types={"v": "LIST<GEOMETRY>"})


# ---------------------------------------------------------------------------
# Round 14: RLE v1 — the Hive ≤0.11 wire, REAL file_version='0.11' files
# ---------------------------------------------------------------------------


def _write_v11(table, compression="zlib"):
    buf = io.BytesIO()
    w = orc.ORCWriter(
        buf, file_version="0.11", compression=compression, stripe_size=64 * 1024
    )
    w.write(table)
    w.close()
    return buf.getvalue()


@pytest.mark.parametrize("compression", ["uncompressed", "zlib", "snappy"])
def test_rlev1_differential_vs_real_011_files(compression):
    rng = random.Random(11)
    n = 5000
    t = pa.table(
        {
            "i": pa.array(
                [None if k % 7 == 0 else k - 500 for k in range(n)], pa.int64()
            ),
            "mono": pa.array(range(n), pa.int64()),  # delta-1 runs
            "const": pa.array([42] * n, pa.int32()),  # pure runs
            "r": pa.array(
                [rng.randrange(-(2**40), 2**40) for _ in range(n)], pa.int64()
            ),
            "s": pa.array(
                [None if k % 11 == 0 else f"val-{k % 20}" for k in range(n)]
            ),  # DICTIONARY with RLEv1 indexes
            "u": pa.array([f"uniq-{k}" for k in range(n)]),  # DIRECT lengths
            "f": pa.array([k / 7.0 for k in range(n)], pa.float64()),
            "b": pa.array([k % 3 == 0 for k in range(n)], pa.bool_()),
            "lst": pa.array(
                [None if k % 13 == 5 else [k, None if k % 4 == 0 else k * 2]
                 for k in range(n)],
                pa.list_(pa.int64()),
            ),  # LIST lengths as RLEv1
        }
    )
    got = orc_read_columns(_write_v11(t, compression))
    for c in t.column_names:
        assert got[c] == t.column(c).to_pylist(), (compression, c)


def test_rlev1_hand_vectors():
    from yark_spark.operators.orc import _rlev1

    # run: control 0 → 3 values, delta +1, base 7
    assert _rlev1(bytes([0x00, 0x01, 0x07]), 3, signed=False) == [7, 8, 9]
    # run with negative delta
    assert _rlev1(bytes([0x02, 0xFF, 0x0A]), 5, signed=False) == [10, 9, 8, 7, 6]
    # literals: control 0xFD → 3 varints
    assert _rlev1(bytes([0xFD, 0x02, 0x80, 0x01, 0x00]), 3, signed=False) == [
        2, 128, 0,
    ]
    # signed run: zigzag base -5
    assert _rlev1(bytes([0x00, 0x02, 0x09]), 3, signed=True) == [-5, -3, -1]
    with pytest.raises(ValueError, match="truncated"):
        _rlev1(bytes([0x00, 0x01]), 3, signed=False)


def test_rlev1_timestamps_and_dates_011():
    ts = pa.array(
        [None if k % 9 == 4 else (1_500_000_000_000_000 + k * 1_000_003)
         for k in range(400)],
        pa.timestamp("us"),
    )
    d = pa.array([17000 + k for k in range(400)], pa.date32())
    t = pa.table({"ts": ts, "d": d})
    got = orc_read_columns(_write_v11(t))
    want_ts = [None if v is None else v.value for v in ts]
    assert got["ts"] == want_ts
    assert got["d"] == [17000 + k for k in range(400)]


def test_varchar_char_decode_as_string():
    """VARCHAR/CHAR (round 14 s3): the spec's length-typed strings use
    the exact STRING stream layout — a file whose footer declares kind
    16/17 decodes through the string path, and REAL ORC_CPP reads the
    same re-typed wire (proving the layouts really coincide)."""
    import io as _io

    import pyarrow.orc as _paorc

    from yark_spark.operators import orc as _orc

    cols = {"s": ["alpha", "beta-%d" % 7, "", "gamma"], "n": [1, 2, 3, 4]}
    for kind_id, kind in ((16, "VARCHAR"), (17, "CHAR")):
        orig = dict(_orc._KIND_IDS)
        try:
            _orc._KIND_IDS["STRING"] = kind_id
            blob = _orc.orc_write(
                cols, types={"s": "STRING", "n": "LONG"}, compression="ZLIB"
            )
        finally:
            _orc._KIND_IDS.clear()
            _orc._KIND_IDS.update(orig)
        got = _orc.orc_read_columns(blob, ["s", "n"])
        assert got["s"] == cols["s"] and got["n"] == cols["n"], kind
        t = _paorc.ORCFile(_io.BytesIO(blob)).read()
        assert t.column("s").to_pylist() == cols["s"], kind


# ---------------------------------------------------------------------------
# Round 15: writer type parity — DATE / TIMESTAMP / DECIMAL / BINARY /
# BYTE / DICTIONARY_V2 strings / STRUCT / MAP / nested containers /
# PATCHED_BASE RLEv2, all read back by REAL ORC_CPP and by our reader.
# ---------------------------------------------------------------------------


def _orc_cpp_rows(blob):
    import io

    import pyarrow.orc as po

    return po.ORCFile(io.BytesIO(blob)).read().to_pylist()


_LOGICAL_COLS = {
    "id": list(range(6)),
    "d": [0, -1, 19000, None, 738000, 3],
    "ts": [0, 1_420_070_400_000_000, -62_000_000, None,
           1_700_000_000_123_456, 86_400_000_000],
    "dec": [0, -12345, 99999999999, None, 42, -1],
    "bin": [b"\x00\xff", b"", b"abc", None, b"\x01" * 10, b"z"],
    "sd": ["red", "blue", "red", None, "green", "blue"],
    "by": [0, 127, -128, None, -1, 5],
}
_LOGICAL_TYPES = {
    "id": "LONG", "d": "DATE", "ts": "TIMESTAMP", "dec": "DECIMAL(12,2)",
    "bin": "BINARY", "sd": "STRING_DICT", "by": "BYTE",
}


@pytest.mark.parametrize("comp", ["ZLIB", "NONE"])
def test_writer_logical_types_three_ways(comp):
    import datetime
    import decimal

    from yark_spark.operators.orc import orc_read_columns, orc_write

    blob = orc_write(_LOGICAL_COLS, types=_LOGICAL_TYPES,
                     compression=comp, stripe_rows=4)
    got = orc_read_columns(blob, list(_LOGICAL_COLS))
    for c in _LOGICAL_COLS:
        assert got[c] == _LOGICAL_COLS[c], c
    pl = _orc_cpp_rows(blob)
    for i in range(6):
        r = pl[i]
        if _LOGICAL_COLS["d"][i] is None:
            assert r["d"] is None
        else:
            assert (r["d"] - datetime.date(1970, 1, 1)).days == _LOGICAL_COLS["d"][i]
        if _LOGICAL_COLS["ts"][i] is None:
            assert r["ts"] is None
        else:
            ts = r["ts"]
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=datetime.timezone.utc)
            assert int(ts.timestamp() * 1e6) == _LOGICAL_COLS["ts"][i], i
        if _LOGICAL_COLS["dec"][i] is None:
            assert r["dec"] is None
        else:
            assert r["dec"] == decimal.Decimal(_LOGICAL_COLS["dec"][i]).scaleb(-2)
        assert r["bin"] == _LOGICAL_COLS["bin"][i]
        assert r["sd"] == _LOGICAL_COLS["sd"][i]
        assert r["by"] == _LOGICAL_COLS["by"][i]


@pytest.mark.parametrize("comp", ["ZLIB", "NONE"])
def test_writer_struct_map_nested_three_ways(comp):
    from yark_spark.operators.orc import orc_read_columns, orc_write

    structs = [None, {"a": 1, "b": "x"}, {"a": None, "b": "y"}, {"a": 3, "b": None}]
    maps = [None, {}, {"k1": 10, "k2": None}, {"z": 5}]
    nested = [None, {"inner": [1, 2], "tag": "t0"},
              {"inner": None, "tag": None}, {"inner": [], "tag": "t2"}]
    lol = [None, [], [[1], None, [2, 3]], [[None, 4]]]
    mlist = [None, {"a": [1, None]}, {}, {"b": []}]
    cols = {"id": [0, 1, 2, 3], "st": structs, "mp": maps,
            "nst": nested, "lol": lol, "ml": mlist}
    types = {
        "id": "LONG",
        "st": {"struct": {"a": "LONG", "b": "STRING"}},
        "mp": {"map": ("STRING", "LONG")},
        "nst": {"struct": {"inner": {"list": "LONG"}, "tag": "STRING"}},
        "lol": {"list": {"list": "LONG"}},
        "ml": {"map": ("STRING", {"list": "LONG"})},
    }
    blob = orc_write(cols, types=types, compression=comp)
    got = orc_read_columns(blob, list(cols))
    assert got["st"] == structs
    assert got["mp"] == maps
    assert got["nst"] == nested
    assert got["lol"] == lol
    assert got["ml"] == mlist
    pl = _orc_cpp_rows(blob)
    assert [r["st"] for r in pl] == structs
    assert [None if r["mp"] is None else dict(r["mp"]) for r in pl] == maps
    assert [r["nst"] for r in pl] == nested
    assert [r["lol"] for r in pl] == lol
    assert [None if r["ml"] is None else dict(r["ml"]) for r in pl] == mlist


def test_writer_patched_base_real_reader():
    """High-outlier groups must emit RLEv2 mode 2 (PATCHED_BASE) and
    real ORC_CPP must decode it value-for-value — incl. a negative
    base (sign bit in the base word's MSB)."""
    from yark_spark.operators.orc import (
        _rlev2,
        _rlev2_encode,
        orc_read_columns,
        orc_write,
    )

    vals = [100 + (i % 50) for i in range(400)]
    vals[17] = 1 << 45
    vals[200] = 1 << 44
    vals[399] = 1 << 30
    enc = _rlev2_encode(vals, True)
    assert enc[0] >> 6 == 2  # PATCHED_BASE actually fired
    assert _rlev2(enc, len(vals), True) == vals
    blob = orc_write({"x": vals}, types={"x": "LONG"}, compression="ZLIB")
    assert orc_read_columns(blob, ["x"])["x"] == vals
    assert [r["x"] for r in _orc_cpp_rows(blob)] == vals
    neg = [-(i % 30) for i in range(300)]
    neg[5] = 1 << 40
    enc2 = _rlev2_encode(neg, True)
    assert enc2[0] >> 6 == 2
    blob2 = orc_write({"x": neg}, types={"x": "LONG"}, compression="NONE")
    assert orc_read_columns(blob2, ["x"])["x"] == neg
    assert [r["x"] for r in _orc_cpp_rows(blob2)] == neg


def test_rlev2_encode_fuzz_roundtrip():
    import random

    from yark_spark.operators.orc import _rlev2, _rlev2_encode

    rng = random.Random(3)
    for trial in range(120):
        n = rng.randrange(1, 600)
        kind = rng.randrange(4)
        if kind == 0:
            vals = [rng.randrange(0, 100) if rng.random() > 0.05
                    else rng.randrange(1 << 40) for _ in range(n)]
        elif kind == 1:
            vals = [rng.randrange(-(1 << 50), 1 << 50) for _ in range(n)]
        elif kind == 2:
            vals = [rng.choice([-7, 3]) for _ in range(n)]
        else:
            vals = [rng.randrange(-100, 100) if rng.random() > 0.03
                    else -(1 << 45) for _ in range(n)]
        for signed in (True, False):
            if not signed and any(v < 0 for v in vals):
                continue
            assert _rlev2(_rlev2_encode(vals, signed), n, signed) == vals, (
                trial, signed,
            )


def test_patched_base_gap_over_255_continuation_widths():
    """Round 16 (ADVICE r15): when an inter-patch gap exceeds 255 the
    (255, 0) continuation entry itself carries gap=255 — pgw/entry_w
    must be sized for it or the bitpacked patch list silently bleeds
    bits across entries (a corrupt-but-parseable RLEv2 stream)."""
    from yark_spark.operators.orc import _patched_base_encode

    vals = [i % 97 for i in range(512)]
    vals[0] = 10**8          # outlier at index 0
    vals[300] = 10**8 + 1    # gap 300 > 255 → continuation entry
    enc = _patched_base_encode(vals)
    assert enc is not None
    assert _rlev2(enc, len(vals), signed=False) == vals


def test_writer_gap_over_255_read_by_orc_cpp():
    """The same outlier layout through the whole writer, read back by
    the real ORC C++ reader and ours."""
    from yark_spark.operators.orc import orc_write

    vals = [i % 89 for i in range(512)]
    vals[3] = 10**9
    vals[350] = 10**9 + 7
    blob = orc_write({"x": vals}, compression="NONE")
    t = orc.ORCFile(io.BytesIO(blob)).read()
    assert t.column("x").to_pylist() == vals
    assert orc_read_columns(blob)["x"] == vals
