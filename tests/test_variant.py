"""Parquet VARIANT binary encoding (round 17): roundtrips across every
implemented tag, sorted-dictionary invariants, smallest-width integer
selection, corrupt-buffer detection, and the typed boundaries
(decimal/tz/nanos/uuid ids)."""

import pytest

from yark_spark.operators.variant import (
    variant_from_python,
    variant_metadata_build,
    variant_to_python,
)


@pytest.mark.parametrize(
    "obj",
    [
        None, True, False, 0, 127, -128, 300, -70000, 2**40, -2**50,
        1.5, -0.25, "", "short", "x" * 63, "y" * 64, "héllo wörld",
        b"", b"\x00\xff\xfe", [], [1, "a", None, True],
        list(range(300)), {}, {"a": 1},
        {"b": [1, {"c": "deep", "d": 2.25}], "a": None},
        {f"k{i:03d}": i for i in range(300)},
        {"mixed": {"arr": [[1], [2, [3]]], "s": "z" * 100, "neg": -5}},
    ],
)
def test_roundtrip(obj):
    m, v = variant_from_python(obj)
    assert variant_to_python(m, v) == obj


def test_int_width_selection():
    for val, want_len in ((0, 2), (127, 2), (128, 3), (40000, 5),
                          (2**31, 9)):
        _m, v = variant_from_python(val)
        assert len(v) == want_len, (val, len(v))


def test_short_vs_long_string_tags():
    _m, v63 = variant_from_python("a" * 63)
    _m, v64 = variant_from_python("a" * 64)
    assert v63[0] & 0x3 == 1  # short-string basic type
    assert v64[0] & 0x3 == 0 and v64[0] >> 2 == 16  # primitive string


def test_metadata_dictionary_sorted_and_flagged():
    meta, ids = variant_metadata_build(["zeta", "alpha", "zeta", "mid"])
    assert ids == {"alpha": 0, "mid": 1, "zeta": 2}
    assert meta[0] & 0x10  # sorted_strings bit
    assert meta[0] & 0x0F == 1  # version


def test_object_field_ids_sorted_by_key():
    m, v = variant_from_python({"z": 1, "a": 2, "m": 3})
    # header byte: object, small, 1-byte ids/offsets -> ids at [2:5]
    assert v[0] & 0x3 == 2
    assert list(v[2:5]) == [0, 1, 2]  # a < m < z
    assert variant_to_python(m, v) == {"z": 1, "a": 2, "m": 3}


def test_corrupt_buffers_are_typed():
    m, v = variant_from_python({"a": [1, 2]})
    with pytest.raises(ValueError, match="trailing"):
        variant_to_python(m, v + b"\x00")
    with pytest.raises(ValueError):
        variant_to_python(m, v[:-1])
    with pytest.raises(NotImplementedError, match="version"):
        variant_to_python(bytes([0x02]), v)
    with pytest.raises(ValueError, match="dictionary"):
        # field id beyond the dictionary
        meta_empty, _ids = variant_metadata_build([])
        variant_to_python(meta_empty, v)


def test_unknown_primitive_id_is_typed():
    meta, _ids = variant_metadata_build([])
    with pytest.raises(NotImplementedError, match="primitive type id"):
        variant_to_python(meta, bytes([8 << 2 | 0]) + b"\x00" * 5)
