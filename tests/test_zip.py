"""ZIP codec tests (round 12): wire-layout pins (signatures, EOCD
backward scan past a trailing comment), two-way stdlib-zipfile
differentials, mixed stored/deflate archives, the stored fallback for
incompressible data, typed boundaries (encryption, ZIP64, spanned),
corruption/truncation/CRC errors, bomb guard, and roundtrip fuzz."""

import io
import random
import struct
import zipfile as stdlib_zipfile

import pytest

from yark_spark.operators.zip_archive import (
    zip_build,
    zip_member_names,
    zip_members,
)

MEMBERS = [
    ("0.txt", b"hello world"),
    ("1.txt", b"a" * 500),
    ("2.bin", bytes(range(256))),
]


def test_roundtrip_and_signatures():
    blob = zip_build(MEMBERS)
    assert blob[:4] == b"PK\x03\x04"
    assert b"PK\x01\x02" in blob and b"PK\x05\x06" in blob
    assert [(n, d) for n, _m, d in zip_members(blob)] == MEMBERS


def test_listing_reads_no_member_data():
    assert zip_member_names(zip_build(MEMBERS)) == ["0.txt", "1.txt", "2.bin"]


def test_eocd_found_past_trailing_comment():
    # append a comment by patching the EOCD comment length — readers
    # must find EOCD by backward scan, not fixed offset
    blob = bytearray(zip_build(MEMBERS))
    comment = b"dataset v1.2 mirror"
    blob[-2:] = struct.pack("<H", len(comment))
    blob += comment
    assert zip_member_names(bytes(blob)) == ["0.txt", "1.txt", "2.bin"]
    assert [(n, d) for n, _m, d in zip_members(bytes(blob))] == MEMBERS


def test_stdlib_reads_ours():
    zf = stdlib_zipfile.ZipFile(io.BytesIO(zip_build(MEMBERS)))
    assert zf.namelist() == [n for n, _ in MEMBERS]
    for n, d in MEMBERS:
        assert zf.read(n) == d
    assert zf.testzip() is None  # stdlib CRC pass over every member


def test_we_read_stdlib_both_methods():
    buf = io.BytesIO()
    with stdlib_zipfile.ZipFile(buf, "w") as z:
        z.writestr("s.txt", b"stored data", compress_type=stdlib_zipfile.ZIP_STORED)
        z.writestr(
            "d.txt", b"deflate me " * 50, compress_type=stdlib_zipfile.ZIP_DEFLATED
        )
    got = {n: (m, d) for n, m, d in zip_members(buf.getvalue())}
    assert got["s.txt"] == (0, b"stored data")
    assert got["d.txt"] == (8, b"deflate me " * 50)


def test_explicit_methods_and_stored_fallback():
    blob = zip_build(MEMBERS, methods=[0, 8, 0])
    assert [m for _n, m, _d in zip_members(blob)] == [0, 8, 0]
    # default mode stores incompressible data instead of inflating it
    rng = random.Random(9)
    noise = bytes(rng.randrange(256) for _ in range(2000))
    blob = zip_build([("n.bin", noise)])
    (name, method, data), = zip_members(blob)
    assert method == 0 and data == noise


def test_crc_mismatch_detected():
    blob = zip_build([("x.txt", b"payload here")], methods=[0])
    # flip a data byte inside the stored member
    pos = blob.find(b"payload here")
    bad = blob[:pos] + b"Xayload here" + blob[pos + 12 :]
    with pytest.raises(ValueError, match="CRC"):
        zip_members(bad)


def test_truncation_and_bad_signature():
    blob = zip_build(MEMBERS)
    with pytest.raises(ValueError, match="end-of-central"):
        zip_members(blob[: len(blob) // 3])
    bad = bytearray(blob)
    bad[0] = 0x51
    with pytest.raises(ValueError, match="signature|local"):
        zip_members(bytes(bad))


def test_encrypted_member_typed_boundary():
    blob = bytearray(zip_build([("e.txt", b"secret")], methods=[0]))
    # set bit 0 of the general-purpose flags in the CENTRAL entry
    pos = blob.find(b"PK\x01\x02")
    struct.pack_into("<H", blob, pos + 8, 0x0001)
    with pytest.raises(NotImplementedError, match="encrypted"):
        zip_members(bytes(blob))


def test_zip64_sentinel_without_structures_is_typed():
    # round 12 pinned this as the ZIP64 NotImplementedError boundary;
    # round 13 implements ZIP64, so a saturated EOCD with NO locator
    # behind it is now a malformed-archive ValueError instead
    blob = bytearray(zip_build(MEMBERS))
    eocd = blob.rfind(b"PK\x05\x06")
    struct.pack_into("<I", blob, eocd + 16, 0xFFFFFFFF)  # cd offset sentinel
    with pytest.raises(ValueError, match="ZIP64 locator"):
        zip_members(bytes(blob))


def test_bomb_guard():
    blob = zip_build([("big.txt", b"z" * 10000)])
    with pytest.raises(ValueError, match="bomb"):
        zip_members(blob, max_output=9999)
    assert zip_members(blob, max_output=10000)[0][2] == b"z" * 10000


def test_roundtrip_fuzz():
    rng = random.Random(33)
    for _ in range(25):
        members = []
        for i in range(rng.randrange(1, 8)):
            n = rng.randrange(0, 800)
            alpha = rng.choice([4, 256])
            members.append(
                (f"m{i}.dat", bytes(rng.randrange(alpha) for _ in range(n)))
            )
        blob = zip_build(members)
        assert [(n, d) for n, _m, d in zip_members(blob)] == members
        # stdlib agrees on every member
        zf = stdlib_zipfile.ZipFile(io.BytesIO(blob))
        for n, d in members:
            assert zf.read(n) == d


def test_eocd_signature_inside_comment():
    """Review finding: rfind picked a 'PK\\x05\\x06' embedded in the
    archive comment; the reader must validate that the declared
    comment length reaches exactly the end of file."""
    import io
    import zipfile as stdlib_zipfile

    buf = io.BytesIO()
    with stdlib_zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"data")
        z.comment = b"note: PK\x05\x06 looks like an EOCD but is text"
    blob = buf.getvalue()
    assert zip_member_names(blob) == ["a.txt"]
    assert zip_members(blob)[0][2] == b"data"


def test_listing_tolerates_non_numeric_member_names(spark):
    # VERDICT r12 item #6: a README or checksum member must yield a
    # null doc_id, not fail the shard (the tar listing's rule, now
    # shared via containers.member_doc_id)
    import pandas as pd

    from yark_spark.operators.multimodal import zip_listing
    from yark_spark.operators.zip_archive import zip_build

    payload = zip_build(
        [("7.txt", b"seven"), ("README.md", b"docs"), ("12.txt", b"twelve")]
    )
    df = spark.createDataFrame(
        pd.DataFrame({"shard_id": [0], "payload": [payload]})
    )
    rows = {r["doc_id"]: r for r in zip_listing(df).collect()}
    assert set(rows) == {7, 12, None}
    assert rows[None]["digest"] is not None


def test_member_doc_id_rule():
    from yark_spark.operators.containers import member_doc_id

    assert member_doc_id("123.txt") == 123
    assert member_doc_id("42") == 42
    assert member_doc_id("007leading.bin") == 7
    assert member_doc_id("README") is None
    assert member_doc_id("") is None


# ---------------------------------------------------------------------------
# Round-13: ZIP64 (APPNOTE 4.5) both directions
# ---------------------------------------------------------------------------


def test_zip64_roundtrip_ours():
    members = [(f"{i:04d}.txt", f"member {i} ".encode() * (i + 1)) for i in range(5)]
    blob = zip_build(members, zip64=True)
    assert b"PK\x06\x06" in blob and b"PK\x06\x07" in blob
    got = zip_members(blob)
    assert [(n, d) for n, _m, d in got] == members
    assert zip_member_names(blob) == [n for n, _ in members]


def test_zip64_read_by_stdlib():
    import io
    import zipfile

    members = [("a.txt", b"alpha " * 100), ("b.bin", bytes(range(256)) * 4)]
    blob = zip_build(members, zip64=True)
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.namelist() == ["a.txt", "b.bin"]
        for name, payload in members:
            assert zf.read(name) == payload
        assert zf.testzip() is None


def test_zip64_written_by_stdlib_read_by_ours():
    import io
    import zipfile

    buf = io.BytesIO()
    payloads = {"x.txt": b"force me " * 50, "y.txt": b"zip64 path " * 30}
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in payloads.items():
            # force_zip64 writes saturated local sizes + 0x0001 extras
            with zf.open(name, "w", force_zip64=True) as f:
                f.write(data)
    got = {n: d for n, _m, d in zip_members(buf.getvalue())}
    assert got == payloads


def test_zip64_missing_locator_typed():
    import struct

    blob = bytearray(zip_build([("a", b"x")], zip64=True))
    # wipe the locator signature: saturated EOCD now dangles
    at = bytes(blob).rindex(b"PK\x06\x07")
    blob[at : at + 4] = b"PK\x00\x00"
    with pytest.raises(ValueError, match="ZIP64 locator"):
        zip_members(bytes(blob))
    # and a saturated CD entry without its extra is typed too
    blob2 = bytearray(zip_build([("a", b"x" * 40)]))
    cd = bytes(blob2).rindex(b"PK\x01\x02")
    struct.pack_into("<I", blob2, cd + 20, 0xFFFFFFFF)  # comp_size
    with pytest.raises(ValueError, match="zip64 extra"):
        zip_members(bytes(blob2))
