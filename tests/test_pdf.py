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


def test_startxref_at_non_stream_object_is_typed_error():
    blob = bytearray(pdf_build([["x"]]))
    # point startxref at a NON-STREAM object: neither a table nor a
    # /Type /XRef stream (round 13: xref streams are now implemented,
    # so the old NotImplementedError boundary became a malformed-input
    # ValueError)
    m = list(re.finditer(rb"startxref\s+(\d+)", blob))[-1]
    head_at = blob.find(b"1 0 obj")
    patched = blob[: m.start(1)] + str(head_at).encode() + blob[m.end(1) :]
    with pytest.raises(ValueError, match="stream"):
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


# ---------------------------------------------------------------------------
# PDF 1.5: xref streams + object streams (round 13)
# ---------------------------------------------------------------------------


_PAGES = [[f"line {i} of page {p} word stream" for i in range(7)] for p in range(5)]


def test_xrefstream_layout_on_wire():
    blob = pdf_build(_PAGES, xref_stream=True)
    assert blob.startswith(b"%PDF-1.5")
    assert blob.count(b"/Type /XRef") == 2  # two chained xref streams
    assert b"/Type /ObjStm" in blob
    assert b"/Predictor 12" in blob and b"/Prev " in blob
    assert b"\ntrailer" not in blob  # stream dict IS the trailer
    # page dicts live only inside the (compressed) ObjStm
    assert b"/Type /Page " not in blob


def test_xrefstream_roundtrip_matches_classic():
    classic = pdf_text(pdf_build(_PAGES))
    streamed = pdf_text(pdf_build(_PAGES, xref_stream=True))
    assert classic == streamed and "line 6 of page 4" in streamed


def test_xrefstream_single_page_uncompressed():
    blob = pdf_build([["solo page"]], compress_odd=False, xref_stream=True)
    assert pdf_text(blob) == "solo page"


def test_png_predictor_roundtrip():
    from yark_spark.operators.pdf import _png_unpredict, _png_up_predict

    rows = bytes(range(48))  # 8 rows of width 6
    assert _png_unpredict(_png_up_predict(rows, 6), 6, 1, 8) == rows


def test_decode_xref_stream_vectors():
    from yark_spark.operators.pdf import _decode_xref_stream

    # /W [1 2 1], /Index [0 2 7 1]: free 0, type-1 at 0x0102 gen 3,
    # type-2 (objstm 5, idx 9)
    data = bytes([0, 0, 0, 0xFF, 1, 0x01, 0x02, 3, 2, 0x00, 0x05, 9])
    d = {"W": [1, 2, 1], "Size": 8, "Index": [0, 2, 7, 1]}
    got = _decode_xref_stream(d, data)
    assert got == {0: (0, 0, 0xFF), 1: (1, 0x0102, 3), 7: (2, 5, 9)}
    # zero-width TYPE field defaults to 1; /Index defaults to [0 Size]
    d2 = {"W": [0, 2, 1], "Size": 2}
    got2 = _decode_xref_stream(d2, bytes([0x00, 0x10, 0, 0x00, 0x20, 0]))
    assert got2 == {0: (1, 0x10, 0), 1: (1, 0x20, 0)}


def test_decode_xref_stream_typed_errors():
    from yark_spark.operators.pdf import _decode_xref_stream

    with pytest.raises(ValueError, match="/W"):
        _decode_xref_stream({"W": [1, 9, 2], "Size": 1}, b"\x00" * 12)
    with pytest.raises(ValueError, match="/Index"):
        _decode_xref_stream({"W": [1, 3, 2], "Size": 1, "Index": [0]}, b"\x00" * 6)
    with pytest.raises(ValueError, match="truncated"):
        _decode_xref_stream({"W": [1, 3, 2], "Size": 2}, b"\x00" * 6)
    with pytest.raises(ValueError, match="/Size"):
        _decode_xref_stream({"W": [1, 3, 2], "Size": 0}, b"")


def test_xrefstream_tamper_typed_errors():
    blob = pdf_build(_PAGES, xref_stream=True)
    with pytest.raises(ValueError, match="/W"):
        pdf_text(blob.replace(b"/W [1 3 2]", b"/W [9 3 2]"))
    with pytest.raises(ValueError, match="neither an xref table"):
        pdf_text(blob.replace(b"/Type /XRef ", b"/Type /Xref "))
    # unsupported predictor is a typed boundary
    with pytest.raises(NotImplementedError, match="predictor"):
        pdf_text(blob.replace(b"/Predictor 12", b"/Predictor 02"))


def test_hybrid_xrefstm_trailer_key():
    # hybrid-reference file: a classic table section with NO usable
    # entries whose trailer /XRefStm points at the real xref stream
    blob = pdf_build(_PAGES, xref_stream=True)
    m = list(re.finditer(rb"startxref\s+(\d+)", blob))[-1]
    stream_at = int(m.group(1))
    body = blob[: blob.rfind(b"startxref")]
    table_at = len(body)
    hybrid = (
        body
        + b"xref\n0 1\n0000000000 65535 f \n"
        + b"trailer\n<< /Size 99 /Root 1 0 R /XRefStm "
        + str(stream_at).encode()
        + b" >>\n"
        + f"startxref\n{table_at}\n%%EOF\n".encode()
    )
    assert pdf_text(hybrid) == pdf_text(blob)


def test_freed_object_tombstone_blocks_older_revision():
    from yark_spark.operators.pdf import _xref_offsets

    # revision 1: object 5 in use at offset 111; revision 2 FREES it.
    # first-seen-wins must not resurrect the old entry via /Prev.
    rev1 = (
        b"xref\n0 1\n0000000000 65535 f \n5 1\n0000000111 00000 n \n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n"
    )
    pad = b"%PDF-1.4\n" + b"%" + b"x" * 40 + b"\n"
    r1_at = len(pad)
    blob = pad + rev1
    r2_at = len(blob)
    blob += (
        b"xref\n0 1\n0000000000 65535 f \n5 1\n0000000000 00001 f \n"
        b"trailer\n<< /Size 6 /Root 1 0 R /Prev "
        + str(r1_at).encode()
        + b" >>\nstartxref\n"
        + str(r2_at).encode()
        + b"\n%%EOF\n"
    )
    offs = _xref_offsets(blob)
    assert 5 not in offs and offs["__root__"] == 1


# ---------------------------------------------------------------------------
# Round-13 stream-filter family (ISO 32000-1 §7.4): ASCIIHex/ASCII85,
# RunLength, LZW (both /EarlyChange regimes), chains, fixture cycle
# ---------------------------------------------------------------------------


def test_ascii_hex_vectors():
    from yark_spark.operators.pdf import ascii_hex_decode, ascii_hex_encode

    assert ascii_hex_decode(b"48656C6C6F>") == b"Hello"
    assert ascii_hex_decode(b"48 65\n6C\t6c 6F >") == b"Hello"  # ws + case
    assert ascii_hex_decode(b"7>") == b"\x70"  # odd digit: low nibble 0
    assert ascii_hex_decode(b">") == b""
    assert ascii_hex_decode(ascii_hex_encode(bytes(range(256)))) == bytes(range(256))
    with pytest.raises(ValueError, match="non-hex"):
        ascii_hex_decode(b"4G>")
    with pytest.raises(ValueError, match="EOD"):
        ascii_hex_decode(b"48656C")


def test_ascii85_vectors():
    from yark_spark.operators.pdf import ascii85_decode, ascii85_encode

    # 'Man ' is the canonical btoa vector -> 9jqo^
    assert ascii85_encode(b"Man ") == b"9jqo^~>"
    assert ascii85_decode(b"9jqo^~>") == b"Man "
    assert ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert ascii85_decode(b"<~z~>") == b"\x00\x00\x00\x00"  # Adobe leader
    # partial groups: n+1 chars -> n bytes
    for n in range(1, 9):
        data = bytes(range(65, 65 + n))
        assert ascii85_decode(ascii85_encode(data)) == data
    with pytest.raises(ValueError, match="lone trailing"):
        ascii85_decode(b"9~>")
    with pytest.raises(ValueError, match="inside a group"):
        ascii85_decode(b"9z~>")
    with pytest.raises(ValueError, match="overflow"):
        ascii85_decode(b"uuuuu~>")  # > 2^32-1
    with pytest.raises(ValueError, match="out of range"):
        ascii85_decode(b"9jv\x19o~>")
    with pytest.raises(ValueError, match="EOD"):
        ascii85_decode(b"9jqo^")


def test_run_length_vectors():
    from yark_spark.operators.pdf import run_length_decode, run_length_encode

    # literal of 3 + run of 4 + EOD
    assert run_length_decode(b"\x02abc\xfdx\x80") == b"abcxxxx"
    assert run_length_decode(b"\x80") == b""
    # data after EOD is ignored per spec
    assert run_length_decode(b"\x00Q\x80IGNORED") == b"Q"
    data = b"aaaabcdddddddd" * 40
    assert run_length_decode(run_length_encode(data)) == data
    with pytest.raises(ValueError, match="EOD"):
        run_length_decode(b"\x00Q")
    with pytest.raises(ValueError, match="literal past end"):
        run_length_decode(b"\x05ab")
    with pytest.raises(ValueError, match="run past end"):
        run_length_decode(b"\xfd")


def test_lzw_early_change_regimes():
    from yark_spark.operators.tiff import lzw_decode, lzw_encode

    # long enough to cross the 9->10 bit width boundary: the two
    # regimes MUST disagree past it (that's the whole point of the parm)
    data = bytes((i * 7) % 251 for i in range(4000))
    e1 = lzw_encode(data, early_change=True)
    e0 = lzw_encode(data, early_change=False)
    assert lzw_decode(e1, early_change=True) == data
    assert lzw_decode(e0, early_change=False) == data
    with pytest.raises(ValueError):
        lzw_decode(e0, early_change=True)


def test_filter_chain_order_and_parms_on_wire():
    from yark_spark.operators.pdf import pdf_build, pdf_text

    lines = [[f"word{i} " * 3 for i in range(5)] for _ in range(15)]
    pages = [[ln.strip() for ln in pg] for pg in lines]
    blob = pdf_build(pages, content_filters="cycle")
    # every §7.4 filter name and the chain/parm forms are on the wire
    for needle in (
        b"/Filter /LZWDecode",
        b"/Filter /RunLengthDecode",
        b"/Filter /ASCIIHexDecode",
        b"/Filter [/ASCII85Decode /FlateDecode]",
        b"/DecodeParms << /EarlyChange 0 >>",
    ):
        assert needle in blob, needle
    expect = " ".join(w for pg in pages for ln in pg for w in ln.split())
    assert pdf_text(blob) == expect


def test_filter_cycle_matches_flate_odd_text():
    from yark_spark.operators.pdf import pdf_build, pdf_text

    pages = [[f"line {i} alpha beta"] for i in range(9)]
    a = pdf_text(pdf_build(pages))
    b = pdf_text(pdf_build(pages, content_filters="cycle"))
    assert a == b


def test_filter_cycle_xrefstream_is_typed_error():
    from yark_spark.operators.pdf import pdf_build

    with pytest.raises(ValueError, match="classic-layout"):
        pdf_build([["x"]], xref_stream=True, content_filters="cycle")


# ---------------------------------------------------------------------------
# Round 14: font encodings — ToUnicode CMaps, /Encoding Differences, CID
# ---------------------------------------------------------------------------

_FONT_PAGES = [
    [
        "Hello, world! (brackets) \\backslash",
        "The quick brown fox jumps over the lazy dog 0123456789",
        'MIXED Case; punct: #$%&*+-/<=>?@[]^_`{|}~ "quotes"',
        "café naïve über søster ñandú £5 ©2024 ° ± ÷ ×",
    ],
    ["second page line one", "second page line two", "x"],
]
_FONT_EXPECT = " ".join(
    w for pg in _FONT_PAGES for ln in pg for w in ln.split()
)


@pytest.mark.parametrize("mode", ["simple", "tounicode", "differences", "cid"])
def test_font_modes_roundtrip(mode):
    from yark_spark.operators.pdf import pdf_build, pdf_text

    assert pdf_text(pdf_build(_FONT_PAGES, font_mode=mode)) == _FONT_EXPECT


def test_tounicode_wire_has_both_bfrange_forms():
    from yark_spark.operators.pdf import pdf_build
    from yark_spark.operators.png import zlib_decompress
    import re as _re

    blob = pdf_build(_FONT_PAGES, font_mode="tounicode")
    assert b"/ToUnicode" in blob
    # the CMap stream is Flate-compressed; pull it and check grammar
    m = _re.search(
        rb"<< /Length (\d+) /Filter /FlateDecode >>\nstream\n", blob
    )
    # find the ToUnicode object specifically (its dict has no other keys)
    starts = [
        m2 for m2 in _re.finditer(
            rb"<< /Length (\d+) /Filter /FlateDecode >>\nstream\n", blob
        )
    ]
    found = False
    for m2 in starts:
        raw = blob[m2.end() : m2.end() + int(m2.group(1))]
        try:
            cmap = zlib_decompress(raw)
        except ValueError:
            continue
        if b"begincmap" in cmap:
            assert b"beginbfchar" in cmap or b"beginbfrange" in cmap
            assert b"begincodespacerange" in cmap
            found = True
    assert found


def test_scrambled_bytes_need_the_cmap():
    """Latin-1-only decode of the scrambled font must NOT equal the
    text — proves the CMap path actually ran (not a no-op scramble)."""
    from yark_spark.operators import pdf as pdfmod

    blob = pdfmod.pdf_build(_FONT_PAGES, font_mode="tounicode")
    doc = pdfmod._Pdf(blob)
    root = doc.resolve(doc.obj(doc.root_num))
    pages_obj = doc.resolve(root.get("Pages"))
    kid = doc.resolve(pages_obj["Kids"][0])
    content = pdfmod._stream_data(doc, doc.resolve(kid["Contents"]))
    latin1 = " ".join("".join(pdfmod._content_text(content, None)).split())
    assert latin1 != " ".join(w for ln in _FONT_PAGES[0] for w in ln.split())


def test_cid_without_tounicode_is_typed_error():
    from yark_spark.operators import pdf as pdfmod

    blob = pdfmod.pdf_build(_FONT_PAGES, font_mode="cid")
    m = re.search(rb"/ToUnicode \d+ 0 R", blob)
    patched = blob[: m.start()] + b" " * (m.end() - m.start()) + blob[m.end():]
    with pytest.raises(ValueError, match="without /ToUnicode"):
        pdfmod.pdf_text(patched)


def test_glyph_name_resolution():
    from yark_spark.operators.pdf import _glyph_to_unicode

    assert _glyph_to_unicode("a") == "a"
    assert _glyph_to_unicode("Z") == "Z"
    assert _glyph_to_unicode("seven") == "7"
    assert _glyph_to_unicode("quotesingle") == "'"
    assert _glyph_to_unicode("emdash") == "—"
    assert _glyph_to_unicode("uni0041") == "A"
    assert _glyph_to_unicode("uni00480049") == "HI"
    assert _glyph_to_unicode("u1F600") == "\U0001F600"
    assert _glyph_to_unicode("u0041") == "A"
    assert _glyph_to_unicode("germandbls") == "ß"
    assert _glyph_to_unicode("gXYZ") is None
    assert _glyph_to_unicode("uni41") is None  # needs 4-hex groups


def test_parse_cmap_vectors():
    from yark_spark.operators.pdf import _parse_cmap

    cs, mp = _parse_cmap(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <20> <0020> <41> <0041> endbfchar\n"
        b"2 beginbfrange <61> <63> <0061> <70> <71> [<0050> <0051>] endbfrange"
    )
    assert cs == [(b"\x00", b"\xff")]
    assert mp[b"\x20"] == " " and mp[b"\x41"] == "A"
    assert mp[b"\x61"] == "a" and mp[b"\x63"] == "c"
    assert mp[b"\x70"] == "P" and mp[b"\x71"] == "Q"
    # surrogate-pair destination (4-byte UTF-16BE)
    _, mp2 = _parse_cmap(b"1 beginbfchar <01> <D83DDE00> endbfchar")
    assert mp2[b"\x01"] == "\U0001F600"


def test_parse_cmap_typed_errors():
    from yark_spark.operators.pdf import _parse_cmap

    with pytest.raises(ValueError, match="codespace"):
        _parse_cmap(b"1 begincodespacerange <00> <FFFF> endcodespacerange")
    with pytest.raises(ValueError, match="out of order"):
        _parse_cmap(b"1 beginbfrange <05> <01> <0041> endbfrange")
    with pytest.raises(ValueError, match="array length"):
        _parse_cmap(b"1 beginbfrange <00> <02> [<0041>] endbfrange")
    with pytest.raises(ValueError, match="destination"):
        _parse_cmap(b"1 beginbfrange <00> <01> endbfrange")


def test_differences_wire_and_base_encoding():
    from yark_spark.operators.pdf import pdf_build

    blob = pdf_build(_FONT_PAGES, font_mode="differences")
    assert b"/BaseEncoding /WinAnsiEncoding" in blob
    assert b"/Differences [" in blob
    assert b"/uni" in blob  # algorithmic names on the wire
    # at least one bare AGL name too (alternation)
    assert re.search(rb"/Differences \[[^\]]*/[a-z]{2,}", blob)


def test_differences_unknown_name_keeps_base_slot():
    """A /Differences name we cannot resolve keeps the base-encoding
    slot (lenient, like real extractors) instead of erroring."""
    from yark_spark.operators import pdf as pdfmod

    blob = pdfmod.pdf_build([["AB"]], font_mode="simple")
    # graft an Encoding with an unknown glyph name onto the font
    patched = blob.replace(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding << /Differences [65 /madeupname] >> >>",
    )
    # offsets shifted: rebuild via pdf_build path instead — simpler:
    # parse the patched body directly through the decoder
    doc = pdfmod._Pdf(blob)

    class _FakeResolve:
        def resolve(self, v):
            return v

    dec = pdfmod._font_decoder(
        _FakeResolve(),
        {"Subtype": "Type1", "Encoding": {"Differences": [65, "madeupname"]}},
    )
    assert dec.decode(b"A") == "A"  # base latin-1 slot survived
    dec2 = pdfmod._font_decoder(
        _FakeResolve(),
        {"Subtype": "Type1", "Encoding": {"Differences": [65, "zero"]}},
    )
    assert dec2.decode(b"AB") == "0B"


def test_font_mode_layout_guards():
    from yark_spark.operators.pdf import pdf_build

    with pytest.raises(ValueError, match="font_mode"):
        pdf_build([["x"]], font_mode="bogus")
    with pytest.raises(ValueError, match="classic flate-odd"):
        pdf_build([["x"]], xref_stream=True, font_mode="cid")
    with pytest.raises(ValueError, match="classic flate-odd"):
        pdf_build([["x"]], content_filters="cycle", font_mode="tounicode")
