"""DOCX text extraction from scratch (round 12): Office Open XML's
WordprocessingML — a ZIP package (the in-repo ``operators/zip_archive``
codec) containing ``word/document.xml``, whose body text lives in
``<w:t>`` runs grouped into ``<w:p>`` paragraphs, with ``<w:tab/>`` and
``<w:br/>`` as explicit whitespace and XML entities to decode — built
and parsed with a purpose-sized tag walker, nothing imported.

Office documents are a major enterprise/government corpus slice
(FOIA dumps, policy archives, the "documents" verticals of web
crawls); the extraction stance matches the HTML/Markdown family:
recover the author-visible word stream, drop the formatting tree.
This operator is deliberately a COMPOSITION — ZIP grammar (EOCD →
central directory → DEFLATE member) feeding an XML walk — so one
digest certifies two from-scratch layers at once, the E98' recipe
(gzip→WARC→HTTP→HTML) applied to the office wire.

Parser notes: only ``w:t`` content is text (WordprocessingML nests
properties like ``w:rPr``/``w:instrText`` that must NOT leak into the
stream); ``xml:space="preserve"`` is honored by never trimming run
content; self-closing and empty tags are handled; the five XML
entities plus numeric references decode. Full OOXML (tables,
headers/footers, footnotes, fields) is a documented boundary —
unknown ELEMENTS are skipped structurally, which is the correct
quality-pass stance.

Decode raises typed ``ValueError`` on malformed input (bad zip, no
document.xml, malformed entity) so the quarantine keeps corrupt rows
as rows.

Oracle recipe: the extraction family's — documents wrapped into real
.docx packages must recover their text byte-exactly against
md5(text); paragraph joins normalize to single spaces the way the
fixture words are. Entity/nesting vectors live in tests/test_docx.py.
"""

from __future__ import annotations

import re

from yark_spark.operators.xml_util import xml_unescape
from yark_spark.operators.zip_archive import zip_build, zip_members

__all__ = ["docx_build", "docx_to_text", "document_xml_text"]

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
    '" Target="word/document.xml"/></Relationships>'
)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def docx_build(paragraphs: list[list[str]]) -> bytes:
    """Build a minimal valid .docx: each paragraph a ``<w:p>`` whose
    runs are the given strings — odd runs get ``xml:space="preserve"``
    and run properties (``<w:rPr>``) that extraction must not leak."""
    body = []
    for para in paragraphs:
        runs = []
        for i, run in enumerate(para):
            esc = _xml_escape(run)
            if i % 2:
                runs.append(
                    "<w:r><w:rPr><w:b/><w:i/></w:rPr>"
                    f'<w:t xml:space="preserve">{esc}</w:t></w:r>'
                )
            else:
                runs.append(f"<w:r><w:t>{esc}</w:t></w:r>")
        body.append("<w:p>" + "".join(runs) + "</w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(body)
        + "<w:sectPr><w:pgSz w:w=\"11906\" w:h=\"16838\"/></w:sectPr>"
        "</w:body></w:document>"
    )
    members = [
        ("[Content_Types].xml", _CONTENT_TYPES.encode("utf-8")),
        ("_rels/.rels", _RELS.encode("utf-8")),
        ("word/document.xml", doc.encode("utf-8")),
    ]
    return zip_build(members)


def _unescape(s: str) -> str:
    return xml_unescape(s, "docx")


_TAG_RE = re.compile(r"<[^>]+>")


def document_xml_text(xml: str) -> str:
    """Extract the author-visible text from WordprocessingML: the
    contents of ``<w:t>`` elements in document order, runs within a
    paragraph concatenated, paragraphs / tabs / breaks separated by
    single spaces, whitespace-normalized — only ``w:t`` content
    counts, so property/field elements never leak."""
    out: list[str] = []
    pos = 0
    n = len(xml)
    while True:
        m = re.search(r"<w:t(?:\s[^>]*)?>", xml[pos:])
        if not m:
            break
        start = pos + m.end()
        end = xml.find("</w:t>", start)
        if end < 0:
            raise ValueError("docx: unterminated w:t element")
        out.append(_unescape(xml[start:end]))
        # paragraph/tab/break boundaries between this run and the next
        # become a separator; within-paragraph adjacent runs join.
        # NB: match a real <w:t> tag — plain find("<w:t") would also
        # hit <w:tab/> and hide the very separator we're looking for
        m2 = re.search(r"<w:t[\s>]", xml[end:])
        gap = xml[end : end + m2.start()] if m2 else xml[end:n]
        if re.search(r"</w:p>|<w:tab\s*/>|<w:br\s*/>", gap):
            out.append(" ")
        pos = end + len("</w:t>")
    return " ".join("".join(out).split())


def docx_to_text(payload: bytes, max_output: int | None = 256 << 20) -> str:
    """ZIP walk → word/document.xml → text (the composition: EOCD /
    central directory / DEFLATE, then the WordprocessingML walk)."""
    doc = None
    for name, _method, data in zip_members(payload, max_output=max_output):
        if name == "word/document.xml":
            doc = data
            break
    if doc is None:
        raise ValueError("docx: package has no word/document.xml")
    return document_xml_text(doc.decode("utf-8"))
