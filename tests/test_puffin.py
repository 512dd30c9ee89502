"""Puffin container + Iceberg v3 deletion vectors (round 16)."""

from __future__ import annotations

import struct

import pytest

from yark_spark.operators.puffin import (
    crc32c,
    dv_blob_build,
    dv_blob_parse,
    puffin_blob,
    puffin_build,
    puffin_footer,
)


def test_crc32c_known_vector():
    # the canonical Castagnoli check value
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_dv_blob_roundtrip_and_framing():
    rows = [0, 1, 63, 4096, 2**32 + 5, 2**33]
    blob, card = dv_blob_build(rows)
    assert card == len(rows)
    assert dv_blob_parse(blob) == set(rows)
    # length word is BE over magic+vector
    (length,) = struct.unpack_from(">i", blob, 0)
    assert length == len(blob) - 8
    assert blob[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])


def test_dv_blob_corruption_is_typed():
    blob, _ = dv_blob_build([1, 2, 3])
    bad = bytearray(blob)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32C"):
        dv_blob_parse(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        dv_blob_parse(blob[:4] + b"XXXX" + blob[8:])
    with pytest.raises(ValueError, match="length"):
        dv_blob_parse(blob + b"\x00")


def test_puffin_container_roundtrip():
    dv, card = dv_blob_build([7, 9])
    pf = puffin_build(
        [
            {
                "type": "deletion-vector-v1",
                "data": dv,
                "snapshot-id": 11,
                "sequence-number": 2,
                "properties": {
                    "referenced-data-file": "data/p0.parquet",
                    "cardinality": str(card),
                },
            },
            {"type": "apache-datasketches-theta-v1", "data": b"\x01\x02",
             "fields": [1]},
        ],
        properties={"created-by": "yark_spark"},
    )
    f = puffin_footer(pf)
    assert [m["type"] for m in f["blobs"]] == [
        "deletion-vector-v1", "apache-datasketches-theta-v1",
    ]
    assert f["properties"] == {"created-by": "yark_spark"}
    m0 = f["blobs"][0]
    assert m0["properties"]["referenced-data-file"] == "data/p0.parquet"
    assert dv_blob_parse(puffin_blob(pf, m0)) == {7, 9}
    assert puffin_blob(pf, f["blobs"][1]) == b"\x01\x02"


def test_puffin_footer_guards():
    dv, _ = dv_blob_build([1])
    pf = bytearray(puffin_build([{"type": "deletion-vector-v1", "data": dv}]))
    with pytest.raises(ValueError, match="magic"):
        puffin_footer(b"XXXX" + bytes(pf[4:]))
    # LZ4-compressed payload flag is a typed boundary
    lz4 = bytearray(pf)
    lz4[-8] |= 0x01
    with pytest.raises(NotImplementedError, match="LZ4"):
        puffin_footer(bytes(lz4))
    # reserved flag bits are malformed
    resv = bytearray(pf)
    resv[-7] |= 0x80
    with pytest.raises(ValueError, match="reserved"):
        puffin_footer(bytes(resv))
    # blob span escaping the blob region is malformed
    import json as _json

    f = puffin_footer(bytes(pf))
    f["blobs"][0]["length"] = 10_000
    payload = _json.dumps(f).encode()
    bad = (
        b"PFA1" + bytes(pf[4 : len(pf) - 12 - struct.unpack_from("<i", pf, len(pf) - 12)[0] - 4])
    )
    # rebuild: simpler — construct directly
    body = dv
    bad = (
        b"PFA1" + body + b"PFA1" + payload
        + struct.pack("<i", len(payload)) + b"\x00\x00\x00\x00" + b"PFA1"
    )
    with pytest.raises(ValueError, match="span"):
        puffin_footer(bad)


def test_iceberg_v3_deletion_vector_end_to_end():
    """A v3 DV rides a puffin file referenced by a content=1 delete
    entry with content_offset/size — resolution applies it to exactly
    its referenced data file under the >= sequence rule, and the
    extended manifest schema resolves beside plain-v2 manifests."""
    from yark_spark.operators.containers import tar_build
    from yark_spark.operators.iceberg import (
        iceberg_commit,
        iceberg_snapshot_rows,
        iceberg_table_create,
    )
    from yark_spark.operators.parquet_write import parquet_write

    fields = [
        {"id": 1, "name": "doc_id", "required": True, "type": "long"},
        {"id": 2, "name": "text", "required": True, "type": "string"},
    ]

    def pq(ids, texts):
        return parquet_write(
            {"doc_id": ids, "text": texts},
            types={"doc_id": "INT64", "text": "BYTE_ARRAY"},
            codec="SNAPPY",
        )

    m = iceberg_table_create(fields)
    m, _s1 = iceberg_commit(
        m,
        data_files=[
            ("data/p0.parquet", pq([0, 1, 2, 3], list("abcd")), 4),
            ("data/p1.parquet", pq([4, 5, 6, 7], list("efgh")), 4),
        ],
    )
    dv, card = dv_blob_build([1, 3])  # kill rows 1 and 3 of p0
    pf = puffin_build(
        [
            {
                "type": "deletion-vector-v1",
                "data": dv,
                "properties": {
                    "referenced-data-file": "data/p0.parquet",
                    "cardinality": str(card),
                },
            }
        ]
    )
    f = puffin_footer(pf)
    meta0 = f["blobs"][0]
    m, _s2 = iceberg_commit(
        m,
        delete_files=[
            {
                "path": "metadata/dv-1.puffin",
                "blob": pf,
                "content": 1,
                "record_count": card,
                "referenced_data_file": "data/p0.parquet",
                "content_offset": meta0["offset"],
                "content_size_in_bytes": meta0["length"],
            }
        ],
    )
    rows = iceberg_snapshot_rows(tar_build(sorted(m.items())), ["doc_id"])
    assert sorted(r["doc_id"] for _, r in rows) == [0, 2, 4, 5, 6, 7]
