"""EPUB extraction tests (round 12): the OCF magic (stored-first
mimetype, bytes 30..58), spine-vs-zip-order discipline, container/OPF
resolution, stdlib-zipfile interop, typed errors."""

import io
import zipfile as stdlib_zipfile

import pytest

from yark_spark.operators.epub import epub_build, epub_to_text
from yark_spark.operators.zip_archive import zip_build


def test_ocf_magic_bytes():
    blob = epub_build(["one", "two"])
    assert blob[30:58] == b"mimetypeapplication/epub+zip"


def test_spine_order_not_zip_order():
    blob = epub_build(["alpha first", "beta second", "gamma third"])
    # the fixture writes chapter FILES reversed; reading order must win
    zf = stdlib_zipfile.ZipFile(io.BytesIO(blob))
    chapter_names = [n for n in zf.namelist() if n.endswith(".xhtml")]
    assert chapter_names == ["OEBPS/ch2.xhtml", "OEBPS/ch1.xhtml", "OEBPS/ch0.xhtml"]
    assert epub_to_text(blob) == "alpha first beta second gamma third"


def test_rawtext_style_trap_survives():
    # the chapter head carries a style block containing fake markup
    assert epub_to_text(epub_build(["only body text"])) == "only body text"


def test_mimetype_discipline():
    # compressed mimetype → typed error
    members = [("mimetype", b"application/epub+zip"), ("x", b"y")]
    blob = zip_build(members, methods=[8, 0])
    with pytest.raises(ValueError, match="stored"):
        epub_to_text(blob)
    # wrong mimetype content
    blob = zip_build([("mimetype", b"text/plain")], methods=[0])
    with pytest.raises(ValueError, match="wrong mimetype"):
        epub_to_text(blob)
    # mimetype not first
    blob = zip_build([("a", b"b"), ("mimetype", b"application/epub+zip")],
                     methods=[0, 0])
    with pytest.raises(ValueError, match="first"):
        epub_to_text(blob)


def test_missing_parts_typed():
    blob = zip_build([("mimetype", b"application/epub+zip")], methods=[0])
    with pytest.raises(ValueError, match="container.xml"):
        epub_to_text(blob)
