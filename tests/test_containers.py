"""gzip + ustar container tests (round 11) — differential against the
stdlib gzip/tarfile implementations both directions, plus malformed-
payload typing."""

import gzip as stdlib_gzip
import io
import tarfile

import numpy as np
import pytest

from yark_spark.operators.containers import (
    gzip_compress,
    gzip_decompress,
    tar_build,
    tar_members,
)


def _corpus():
    rng = np.random.default_rng(0)
    return [
        b"",
        b"a",
        b"hello world " * 50,
        bytes(rng.integers(0, 256, size=3000, dtype=np.uint8)),
        ("unicode éè€ " * 40).encode("utf-8"),
    ]


@pytest.mark.parametrize("method", ["stored", "fixed", "dynamic"])
def test_gzip_roundtrip_all_methods(method):
    for raw in _corpus():
        assert gzip_decompress(gzip_compress(raw, method=method)) == raw


def test_gzip_interop_with_stdlib():
    for raw in _corpus():
        # stdlib reads ours…
        assert stdlib_gzip.decompress(gzip_compress(raw, name="f.txt")) == raw
        # …and we read stdlib's (FNAME set via GzipFile filename)
        buf = io.BytesIO()
        with stdlib_gzip.GzipFile("member.txt", "wb", fileobj=buf) as f:
            f.write(raw)
        assert gzip_decompress(buf.getvalue()) == raw


def test_gzip_optional_fields_walked():
    raw = b"payload" * 10
    base = bytearray(gzip_compress(raw))
    # splice FEXTRA + FCOMMENT + FHCRC is overkill; FEXTRA alone covers
    # the length-prefixed walk (FNAME/FCOMMENT are covered by interop)
    base[3] |= 4  # FEXTRA
    extra = b"\x06\x00AB\x02\x00xy"
    patched = bytes(base[:10]) + extra + bytes(base[10:])
    assert gzip_decompress(patched) == raw


def test_gzip_crc_mismatch_raises():
    p = bytearray(gzip_compress(b"x" * 100))
    p[-6] ^= 0xFF  # corrupt CRC field
    with pytest.raises(ValueError, match="CRC"):
        gzip_decompress(bytes(p))


def test_gzip_bad_magic_raises():
    with pytest.raises(ValueError, match="magic"):
        gzip_decompress(b"PK\x03\x04" + b"\x00" * 30)


def test_gzip_bomb_guard():
    big = gzip_compress(b"\x00" * 200_000)
    with pytest.raises(ValueError):
        gzip_decompress(big, max_output=10_000)


# ---------------------------------------------------------------------------
# tar
# ---------------------------------------------------------------------------


def test_tar_roundtrip():
    members = [
        ("00000001.txt", b"first doc"),
        ("00000001.json", b'{"id":1}'),
        ("a/b/c.bin", bytes(range(256)) * 3),
        ("empty.txt", b""),
    ]
    assert tar_members(tar_build(members)) == members


def test_tar_interop_with_stdlib():
    members = [("x.txt", b"alpha"), ("y.json", b'{"k":2}'), ("z.bin", b"\x00" * 700)]
    # tarfile reads ours
    tf = tarfile.open(fileobj=io.BytesIO(tar_build(members)))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members
    # and we read tarfile's (ustar format), directories skipped
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        w.addfile(d)
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            w.addfile(ti, io.BytesIO(data))
    assert tar_members(buf.getvalue()) == members


def test_tar_prefix_field():
    # stdlib splits >100-char paths into prefix+name; we must rejoin
    long_name = "d" * 90 + "/" + "f" * 60 + ".txt"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        ti = tarfile.TarInfo(long_name)
        ti.size = 3
        w.addfile(ti, io.BytesIO(b"abc"))
    assert tar_members(buf.getvalue()) == [(long_name, b"abc")]


def test_tar_checksum_mismatch_raises():
    p = bytearray(tar_build([("a.txt", b"data")]))
    p[0] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        tar_members(bytes(p))


def test_tar_truncated_member_raises():
    p = tar_build([("a.txt", b"x" * 600)])
    with pytest.raises(ValueError, match="truncated"):
        tar_members(p[:700])


def test_tar_name_over_100_raises():
    with pytest.raises(ValueError, match="100 bytes"):
        tar_build([("n" * 150, b"")])


# ---------------------------------------------------------------------------
# multi-member gzip + WARC
# ---------------------------------------------------------------------------


def test_gzip_members_concatenated():
    from yark_spark.operators.containers import gzip_members

    parts = [b"alpha", b"beta" * 100, b""]
    stream = b"".join(gzip_compress(x) for x in parts)
    assert gzip_members(stream) == parts
    # stdlib reads concatenated members the same way
    assert stdlib_gzip.decompress(stream) == b"".join(parts)


def test_gzip_decompress_rejects_multimember():
    stream = gzip_compress(b"a") + gzip_compress(b"b")
    with pytest.raises(ValueError, match="trailing data"):
        gzip_decompress(stream)


def _records():
    return [
        {
            "type": "response",
            "uri": "https://example.com/doc/1",
            "record_id": "urn:uuid:1",
            "block": b"HTTP/1.1 200 OK\r\n\r\nhello",
        },
        {"type": "warcinfo", "block": b"software: yark-spark"},
        {"type": "response", "uri": "https://example.com/doc/2", "block": b""},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    from yark_spark.operators.containers import warc_build, warc_records

    payload = warc_build(_records(), per_record_gzip=gz)
    got = warc_records(payload)
    assert [r["headers"]["warc-type"] for r in got] == [
        "response",
        "warcinfo",
        "response",
    ]
    assert got[0]["block"] == b"HTTP/1.1 200 OK\r\n\r\nhello"
    assert got[0]["headers"]["warc-target-uri"] == "https://example.com/doc/1"
    assert got[0]["headers"]["warc-record-id"] == "<urn:uuid:1>"
    assert got[2]["block"] == b""
    assert all(r["version"] == "WARC/1.0" for r in got)


def test_warc_gz_is_one_member_per_record():
    from yark_spark.operators.containers import gzip_members, warc_build

    payload = warc_build(_records(), per_record_gzip=True)
    assert len(gzip_members(payload)) == 3  # the seekable .warc.gz shape


def test_warc_content_length_authoritative():
    from yark_spark.operators.containers import warc_records

    # block containing CRLF CRLF must not split the record
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 12\r\n\r\n"
        + b"ab\r\n\r\ncd\r\n\r\n"
        + b"\r\n\r\n"
    )
    got = warc_records(rec)
    assert len(got) == 1 and got[0]["block"] == b"ab\r\n\r\ncd\r\n\r\n"


def test_warc_truncated_block_raises():
    from yark_spark.operators.containers import warc_build, warc_records

    payload = warc_build(_records())
    with pytest.raises(ValueError, match="truncated|terminated"):
        warc_records(payload[: len(payload) - 8])


def test_warc_missing_length_raises():
    from yark_spark.operators.containers import warc_records

    with pytest.raises(ValueError, match="Content-Length"):
        warc_records(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nxx\r\n\r\n")


def test_warc_bad_version_raises():
    from yark_spark.operators.containers import warc_records

    with pytest.raises(ValueError, match="version"):
        warc_records(b"HTTP/1.1 200\r\nContent-Length: 0\r\n\r\n\r\n\r\n")


def test_gzip_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=4000))
    def run(raw):
        assert gzip_decompress(gzip_compress(raw)) == raw
        assert stdlib_gzip.decompress(gzip_compress(raw)) == raw

    run()


def test_tar_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.text(
        alphabet=st.characters(min_codepoint=48, max_codepoint=122), min_size=1, max_size=20
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(names, st.binary(max_size=1500)), min_size=1, max_size=6))
    def run(members):
        assert tar_members(tar_build(members)) == members

    run()


def test_tar_member_over_8gib_rejected():
    from yark_spark.operators.containers import _tar_header

    assert len(_tar_header("x", 8**11 - 1)) == 512  # largest legal size
    with pytest.raises(ValueError, match="8 GiB"):
        _tar_header("x", 8**11)


# ---------------------------------------------------------------------------
# Round 12: zstd member + magic-number dispatch
# ---------------------------------------------------------------------------


def test_zstd_member_roundtrip():
    from yark_spark.operators.containers import (
        zstd_compress_member,
        zstd_decompress_member,
    )

    raw = ("json line {\"k\": %d}\n" * 500 % tuple(range(500))).encode()
    enc = zstd_compress_member(raw)
    assert len(enc) < len(raw) // 3
    assert zstd_decompress_member(enc) == raw


def test_decompress_auto_dispatch():
    from yark_spark.operators.containers import (
        decompress_auto,
        gzip_compress,
        zstd_compress_member,
    )

    raw = b"mixed-corpus document body " * 40
    assert decompress_auto(gzip_compress(raw)) == raw
    assert decompress_auto(zstd_compress_member(raw)) == raw
    assert decompress_auto(b"plain text payload") == b"plain text payload"


def test_decompress_auto_bomb_guard():
    import pytest

    from yark_spark.operators.containers import decompress_auto, zstd_compress_member

    raw = b"\x00" * 200_000
    with pytest.raises(ValueError):
        decompress_auto(zstd_compress_member(raw), max_output=1000)


# ---------------------------------------------------------------------------
# Round-13: gzip member spans (the CDX offset primitive)
# ---------------------------------------------------------------------------


def test_gzip_member_spans_cover_stream():
    from yark_spark.operators.containers import (
        gzip_compress,
        gzip_member_spans,
        gzip_members,
    )

    parts = [b"alpha " * 40, b"beta", b"", b"\x1f\x8b fake magic inside " * 9]
    blob = b"".join(gzip_compress(p) for p in parts)
    spans = gzip_member_spans(blob)
    assert len(spans) == 4
    assert spans[0][0] == 0 and spans[-1][1] == len(blob)
    # spans are contiguous and each slice decodes standalone to its part
    for (s, e), nxt, part in zip(spans, spans[1:] + [(len(blob), None)], parts):
        assert e == nxt[0]
        assert gzip_members(blob[s:e]) == [part]


def test_gzip_member_spans_reject_garbage_tail():
    import pytest

    from yark_spark.operators.containers import gzip_compress, gzip_member_spans

    with pytest.raises(ValueError):
        gzip_member_spans(gzip_compress(b"x") + b"JUNK")


def test_surt_key():
    from yark_spark.operators.containers import surt_key as _surt_key

    assert _surt_key("https://Example.COM/doc/5") == "com,example)/doc/5"
    assert _surt_key("http://a.b.example.com:80/p/q") == "com,example,b,a)/p/q"
    assert _surt_key("https://host") == "host)/"
