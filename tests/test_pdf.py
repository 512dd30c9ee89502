"""PDF codec tests (round 12): object-grammar vectors (strings with
all escapes, octal, continuations; dicts/arrays/names/refs), xref
chain + trailer, indirect /Length resolution, FlateDecode, content
text operators (Tj/TJ/'/moves), multi-page order, typed boundaries
(xref streams, unknown filters), corruption errors, and corpus
roundtrip."""

import re

import pytest

from yark_spark.operators.pdf import _parse_object, _parse_string, pdf_build, pdf_text

# ---------------------------------------------------------------------------
# Object grammar
# ---------------------------------------------------------------------------


def test_string_escapes():
    s, _ = _parse_string(rb"(a\(b\)c \\ \n\t \101 \53)", 0)
    assert s == "a(b)c \\ \n\t A +"


def test_string_nested_parens_and_continuation():
    s, _ = _parse_string(b"(outer (inner) tail)", 0)
    assert s == "outer (inner) tail"
    s, _ = _parse_string(b"(split \\\nline)", 0)
    assert s == "split line"


def test_dict_array_name_ref():
    v, _ = _parse_object(b"<< /A [1 2.5 (s)] /B 7 0 R /C /Name /D true >>", 0)
    assert v["A"] == [1, 2.5, "s"]
    assert v["B"].num == 7
    assert v["C"] == "Name"
    assert v["D"] is True
    # hex strings
    v, _ = _parse_object(b"<48 65 6C6C6F>", 0)
    assert v == "Hello"


def test_number_vs_ref_disambiguation():
    # "3 0 R" is a ref; "3 0 RG" (an operator) is not
    v, pos = _parse_object(b"3 0 R ", 0)
    assert v.num == 3
    v, pos = _parse_object(b"3 0 RG", 0)
    assert v == 3 and pos == 1


# ---------------------------------------------------------------------------
# Document level
# ---------------------------------------------------------------------------


def test_multi_page_order_and_forms():
    # ≥3 lines exercises all three show forms (Tj, TJ, ')
    blob = pdf_build([["one two", "three four", "five six"], ["seven eight"]])
    assert pdf_text(blob) == "one two three four five six seven eight"


def test_compressed_pages_and_indirect_length():
    blob = pdf_build([["plain page"], ["flate page"]], compress_odd=True)
    assert b"/Filter /FlateDecode" in blob
    assert re.search(rb"/Length \d+ 0 R", blob)  # indirect length on the wire
    assert pdf_text(blob) == "plain page flate page"


def test_escaped_text_roundtrip():
    blob = pdf_build([["parens (x) and \\ backslash"]])
    assert pdf_text(blob) == "parens (x) and \\ backslash"


def test_xref_stream_typed_boundary():
    blob = bytearray(pdf_build([["x"]]))
    # point startxref at an object instead of an xref table
    m = list(re.finditer(rb"startxref\s+(\d+)", blob))[-1]
    head_at = blob.find(b"1 0 obj")
    patched = blob[: m.start(1)] + str(head_at).encode() + blob[m.end(1) :]
    with pytest.raises(NotImplementedError, match="xref"):
        pdf_text(bytes(patched))


def test_unknown_filter_typed_boundary():
    # same-length name swap so xref offsets stay valid (names end at
    # whitespace, so the padding spaces are not part of the name)
    blob = pdf_build([["plain"], ["flate page"]], compress_odd=True)
    assert b"/FlateDecode" in blob
    patched = blob.replace(b"/FlateDecode", b"/DCTDecode  ")
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        pdf_text(patched)


def test_errors():
    with pytest.raises(ValueError, match="header"):
        pdf_text(b"not a pdf")
    blob = pdf_build([["hello"]])
    with pytest.raises(ValueError, match="startxref"):
        pdf_text(blob[: blob.rfind(b"startxref")])
    # truncate mid-xref-TABLE (note: rfind('xref') would match inside
    # 'startxref' and leave a fully valid file) — the table entries and
    # trailer are gone, so the parse must fail loudly
    table_at = blob.find(b"\nxref\n")
    assert table_at > 0
    with pytest.raises((ValueError, NotImplementedError)):
        pdf_text(blob[: table_at + 10] + blob[blob.rfind(b"trailer") - 40 :])
    with pytest.raises(ValueError, match="unterminated"):
        _parse_string(b"(never closed", 0)


def test_corpus_shape_roundtrip():
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    for n in range(1, len(words) + 1):
        sub = words[:n]
        lines = [" ".join(sub[k : k + 6]) for k in range(0, len(sub), 6)]
        pages = [lines[p : p + 5] for p in range(0, len(lines), 5)]
        assert pdf_text(pdf_build(pages)) == " ".join(sub), n


def test_hex_string_show_operand():
    # ADVICE r12: <hex> Tj show operands must extract, not vanish.
    from yark_spark.operators.pdf import _content_text

    content = b"BT /F1 12 Tf <48656C6C6F> Tj <2C20776F726C64> Tj ET"
    assert "".join(_content_text(content)) == "Hello, world"


def test_direct_root_is_typed_error():
    # ADVICE r12: a direct-object /Root raises the quarantine's typed
    # ValueError, not AttributeError.
    blob = pdf_build([["x"]])
    patched = blob.replace(b"/Root 1 0 R", b"/Root 3     ")
    with pytest.raises(ValueError, match="/Root must be an indirect"):
        pdf_text(patched)
