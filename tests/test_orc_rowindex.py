"""ORC row-index (row-group) pruning (round 14, session 3): the
seek-position semantics — [chunk_off]? + decomp_off + (run/byte/bit)
skips, concatenated in PRESENT/DATA/LENGTH writer-record order — were
derived EMPIRICALLY from ORC_CPP wire; these tests keep that pinned
against the real library across codecs, nullable types, multi-stripe
and multi-chunk layouts."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from yark_spark.operators.orc import orc_read_columns, orc_scan_rowgroups

N = 480


def _build(comp, stride=64, stripe_size=1 << 26, block=1 << 16, n=N, chunk=None):
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(
                [
                    None if i % 31 == 7 else "doc-%04d-%s" % (i, "y" * (i % 11))
                    for i in range(n)
                ]
            ),
            "score": pa.array(
                [None if i % 13 == 5 else i * 0.25 for i in range(n)],
                pa.float64(),
            ),
            "flag": pa.array([i % 3 == 0 for i in range(n)]),
        }
    )
    buf = io.BytesIO()
    w = orc.ORCWriter(
        buf,
        row_index_stride=stride,
        compression=comp,
        compression_block_size=block,
        stripe_size=stripe_size,
        batch_size=chunk or 1024,
        dictionary_key_size_threshold=0.0,
    )
    if chunk:
        for i in range(0, n, chunk):
            w.write(t.slice(i, chunk))
    else:
        w.write(t)
    w.close()
    return buf.getvalue()


@pytest.mark.parametrize("comp", ["zlib", "uncompressed", "snappy", "zstd", "lz4"])
def test_rowgroup_scan_matches_full_decode(comp):
    b = _build(comp)
    cols, cnt = orc_scan_rowgroups(
        b, ["doc_id", "text", "score", "flag"], "doc_id", 128, 191
    )
    full = orc_read_columns(b, ["doc_id", "text", "score", "flag"])
    idx = [i for i in range(N) if 128 <= i <= 191]
    for c in cols:
        assert cols[c] == [full[c][i] for i in idx], c
    assert cnt == {
        "row_groups_total": 8,
        "skipped_stats": 7,
        "row_groups_scanned": 1,
    }


def test_string_predicate():
    b = _build("zlib")
    cols, cnt = orc_scan_rowgroups(b, ["doc_id"], "text", "doc-0100", "doc-0120")
    full = orc_read_columns(b, ["doc_id", "text"])
    want = [
        full["doc_id"][i]
        for i in range(N)
        if full["text"][i] is not None
        and "doc-0100" <= full["text"][i] <= "doc-0120"
    ]
    assert cols["doc_id"] == want
    assert cnt["skipped_stats"] == 7


def test_tail_group_short_stride():
    b = _build("zstd", stride=100)
    cols, cnt = orc_scan_rowgroups(b, ["doc_id", "text"], "doc_id", 450, 479)
    assert cols["doc_id"] == list(range(450, 480))
    assert cnt == {
        "row_groups_total": 5,
        "skipped_stats": 4,
        "row_groups_scanned": 1,
    }


def test_multi_stripe_uncompressed():
    """Positions are stripe-relative; a multi-stripe file must seek
    in each stripe independently (groups_total spans all stripes).
    Uncompressed layout = the shorter position records (no chunk
    offset)."""
    b = _build("uncompressed", stride=64, stripe_size=1024, n=1200, chunk=400)
    n_stripes = orc.ORCFile(io.BytesIO(b)).nstripes
    assert n_stripes >= 2
    cols, cnt = orc_scan_rowgroups(b, ["doc_id", "text"], "doc_id", 700, 790)
    full = orc_read_columns(b, ["doc_id", "text"])
    idx = [i for i in range(1200) if 700 <= i <= 790]
    assert cols["doc_id"] == [full["doc_id"][i] for i in idx]
    assert cols["text"] == [full["text"][i] for i in idx]
    assert cnt["skipped_stats"] > 0


def test_multi_stripe_compressed():
    """Fat rows trip the stripe-size estimate under zlib too — the
    chunked position layout across several stripes."""
    n = 3000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["pad-%05d-" % i + "w" * (160 + i % 40) for i in range(n)]),
        }
    )
    buf = io.BytesIO()
    w = orc.ORCWriter(
        buf,
        row_index_stride=256,
        stripe_size=1 << 13,
        batch_size=500,
        compression="zlib",
        compression_block_size=2048,
        dictionary_key_size_threshold=0.0,
    )
    for i in range(0, n, 500):
        w.write(t.slice(i, 500))
    w.close()
    b = buf.getvalue()
    assert orc.ORCFile(io.BytesIO(b)).nstripes >= 2
    cols, cnt = orc_scan_rowgroups(b, ["doc_id", "text"], "doc_id", 2400, 2500)
    assert cols["doc_id"] == list(range(2400, 2501))
    assert cols["text"] == [
        "pad-%05d-" % i + "w" * (160 + i % 40) for i in range(2400, 2501)
    ]
    assert cnt["skipped_stats"] > 0


def test_multi_chunk_seek():
    """Small compression blocks force nonzero compressed-chunk
    offsets in the positions — the ranged read must start at the
    recorded chunk boundary, not at the stream head."""
    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["blob-%05d-" % i + "z" * 200 for i in range(n)]),
        }
    )
    buf = io.BytesIO()
    w = orc.ORCWriter(
        buf,
        row_index_stride=512,
        compression="zlib",
        compression_block_size=1024,
        dictionary_key_size_threshold=0.0,
    )
    w.write(t)
    w.close()
    b = buf.getvalue()
    cols, cnt = orc_scan_rowgroups(b, ["doc_id", "text"], "doc_id", 3000, 3100)
    assert cols["doc_id"] == list(range(3000, 3101))
    assert cols["text"] == ["blob-%05d-" % i + "z" * 200 for i in range(3000, 3101)]
    assert cnt["skipped_stats"] >= 5


def test_dictionary_strings_typed_boundary():
    t = pa.table({"s": pa.array(["dup"] * 100 + ["other"] * 100)})
    buf = io.BytesIO()
    w = orc.ORCWriter(
        buf, row_index_stride=64, dictionary_key_size_threshold=1.0
    )
    w.write(t)
    w.close()
    with pytest.raises(NotImplementedError, match="dictionary"):
        orc_scan_rowgroups(buf.getvalue(), ["s"], "s", "a", "z")


def test_no_stride_typed_error():
    from yark_spark.operators.orc import orc_write

    blob = orc_write({"a": [1, 2, 3]}, types={"a": "LONG"})
    with pytest.raises((ValueError, NotImplementedError)):
        orc_scan_rowgroups(blob, ["a"], "a", 1, 2)


# --- write side (session 3 second pass) -----------------------------------

from yark_spark.operators.orc import orc_write  # noqa: E402


@pytest.mark.parametrize("comp", ["ZLIB", "NONE"])
def test_our_writer_emits_prunable_indexes(comp):
    """orc_write(row_index_stride=...) emits ROW_INDEX streams whose
    positions our rowgroup scanner seeks, while ORC_CPP and the full
    reader still read the file whole."""
    cols = {
        "doc_id": list(range(N)),
        "text": [
            None if i % 31 == 7 else "doc-%04d-%s" % (i, "y" * (i % 11))
            for i in range(N)
        ],
        "score": [None if i % 13 == 5 else i * 0.25 for i in range(N)],
        "flag": [i % 3 == 0 for i in range(N)],
    }
    blob = orc_write(cols, compression=comp, row_index_stride=64)
    full = orc_read_columns(blob, list(cols))
    assert all(full[c] == cols[c] for c in cols)
    t = orc.ORCFile(io.BytesIO(blob)).read()
    assert t.column("text").to_pylist() == cols["text"]
    got, cnt = orc_scan_rowgroups(
        blob, ["doc_id", "text", "score", "flag"], "doc_id", 128, 191
    )
    idx = list(range(128, 192))
    for c in cols:
        assert got[c] == [cols[c][i] for i in idx], c
    assert cnt == {
        "row_groups_total": 8,
        "skipped_stats": 7,
        "row_groups_scanned": 1,
    }
    got, _ = orc_scan_rowgroups(blob, ["doc_id"], "text", "doc-0100", "doc-0120")
    want = [
        i
        for i in range(N)
        if cols["text"][i] is not None
        and "doc-0100" <= cols["text"][i] <= "doc-0120"
    ]
    assert got["doc_id"] == want


def test_writer_stride_guards():
    with pytest.raises(ValueError, match="multiple of 8"):
        orc_write({"a": [1]}, row_index_stride=10)
    with pytest.raises(NotImplementedError, match="nested"):
        orc_write(
            {"v": [[1.0]]}, types={"v": "LIST<DOUBLE>"}, row_index_stride=8
        )
