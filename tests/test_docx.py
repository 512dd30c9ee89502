"""DOCX extraction tests (round 12): run/paragraph semantics,
property-element non-leakage, entity decode, xml:space preservation,
tab/break separators, stdlib-zipfile interop, typed errors."""

import io
import zipfile as stdlib_zipfile

import pytest

from yark_spark.operators.docx import docx_build, docx_to_text, document_xml_text


def test_runs_join_paragraphs_separate():
    blob = docx_build([["hello ", "world"], ["second", " para"]])
    assert docx_to_text(blob) == "hello world second para"


def test_properties_do_not_leak():
    xml = (
        '<w:document><w:body><w:p><w:r><w:rPr><w:b/><w:rFonts w:ascii="X"/>'
        "</w:rPr><w:t>visible</w:t></w:r></w:p></w:body></w:document>"
    )
    assert document_xml_text(xml) == "visible"


def test_instr_text_does_not_leak():
    # field instructions carry text-like content outside w:t
    xml = (
        "<w:p><w:r><w:instrText>HYPERLINK http://x</w:instrText></w:r>"
        "<w:r><w:t>shown</w:t></w:r></w:p>"
    )
    assert document_xml_text(xml) == "shown"


def test_entities_and_numeric_refs():
    blob = docx_build([["a < b & \"c\""]])
    assert docx_to_text(blob) == 'a < b & "c"'
    assert document_xml_text("<w:p><w:t>x&#32;y&#x21;</w:t></w:p>") == "x y!"
    with pytest.raises(ValueError, match="entity"):
        document_xml_text("<w:p><w:t>&bogus;</w:t></w:p>")


def test_tab_and_break_are_separators():
    xml = (
        "<w:p><w:r><w:t>a</w:t></w:r><w:r><w:tab/></w:r>"
        "<w:r><w:t>b</w:t></w:r><w:br/><w:r><w:t>c</w:t></w:r></w:p>"
    )
    assert document_xml_text(xml) == "a b c"


def test_stdlib_zipfile_opens_our_docx():
    zf = stdlib_zipfile.ZipFile(io.BytesIO(docx_build([["x"]])))
    assert {"[Content_Types].xml", "_rels/.rels", "word/document.xml"} <= set(
        zf.namelist()
    )


def test_errors():
    with pytest.raises(ValueError):
        docx_to_text(b"not a zip at all")
    # a zip without document.xml
    from yark_spark.operators.zip_archive import zip_build

    with pytest.raises(ValueError, match="document.xml"):
        docx_to_text(zip_build([("other.txt", b"x")]))
    with pytest.raises(ValueError, match="unterminated"):
        document_xml_text("<w:p><w:t>never closed</w:p>")
