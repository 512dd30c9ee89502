"""EPUB text extraction from scratch (round 12): the OCF container —
a ZIP package whose FIRST member must be an UNCOMPRESSED ``mimetype``
file (the spec's magic-number trick: bytes 30..58 of every valid
.epub literally spell ``mimetypeapplication/epub+zip``),
``META-INF/container.xml`` pointing at the package document, the OPF
manifest + SPINE (reading order is the spine, not the zip order —
the classic epub-ingest bug), and XHTML chapters — composed from the
in-repo ZIP codec (``operators/zip_archive``) and the HTML tag state
machine (``operators/html``), nothing imported.

Books are the long-context backbone of LLM training mixes
(Gutenberg, Books3-class corpora ship as EPUB); the ingest pass is
exactly this: OCF walk → spine order → per-chapter markup strip.
THREE from-scratch layers under one digest — ZIP grammar, OPF/spine
XML, and the HTML state machine — the deepest composition in the
extraction family (E98' was two).

Parse raises typed ``ValueError`` on malformed input (bad zip, wrong
or compressed mimetype, missing container/OPF/spine, manifest id
misses) so the quarantine keeps corrupt rows as rows. DRM (encrypted
OCF) would surface as the ZIP layer's typed encryption boundary.

Oracle recipe: the extraction family's — documents split across
multiple XHTML chapters (each a full page with the RAWTEXT traps the
HTML fixture carries), listed in the OPF spine in an order DIFFERENT
from the zip member order, must recover their text byte-exactly
against md5(text). Vectors live in tests/test_epub.py.
"""

from __future__ import annotations

import re

from yark_spark.operators.html import html_to_text
from yark_spark.operators.zip_archive import zip_build, zip_members

__all__ = ["epub_build", "epub_to_text"]

_MIMETYPE = b"application/epub+zip"

_CONTAINER_XML = (
    '<?xml version="1.0"?>'
    '<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:'
    'container"><rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def _chapter_xhtml(title: str, body_text: str) -> str:
    # a real chapter shape: doctype, head with a style block (RAWTEXT),
    # the body text inside paragraph markup. The title rides in an
    # ATTRIBUTE-shaped meta tag, not <title> text, so the extractor's
    # output is exactly the body stream (html_to_text keeps element
    # text wherever it appears, titles included — by design for WET).
    return (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        "<!DOCTYPE html>\n"
        '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
        f'<meta name="title" content="{title}"/><title></title>'
        "<style>p { margin: 0 } /* <p> inside style is RAWTEXT */</style>"
        f"</head><body><p>{body_text}</p></body></html>"
    )


def epub_build(chapters: list[str]) -> bytes:
    """Build a minimal valid EPUB: stored-first mimetype, container
    pointer, OPF with manifest + spine. Chapter FILES are written in
    REVERSED zip order while the spine lists reading order — readers
    that walk the zip instead of the spine fail the fixture."""
    manifest = "".join(
        f'<item id="ch{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
        for i in range(len(chapters))
    )
    spine = "".join(f'<itemref idref="ch{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0" encoding="utf-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="id"><metadata/>'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    members: list[tuple[str, bytes]] = [
        ("mimetype", _MIMETYPE),
        ("META-INF/container.xml", _CONTAINER_XML.encode("utf-8")),
        ("OEBPS/content.opf", opf.encode("utf-8")),
    ]
    chapter_members = [
        (f"OEBPS/ch{i}.xhtml", _chapter_xhtml(f"Chapter {i}", ch).encode("utf-8"))
        for i, ch in enumerate(chapters)
    ]
    members += list(reversed(chapter_members))  # zip order ≠ spine order
    # spec: mimetype stored (method 0) and FIRST; the rest deflate
    methods = [0] + [8] * (len(members) - 1)
    return zip_build(members, methods=methods)


def _attr(tag: str, name: str) -> str | None:
    m = re.search(rf'{name}="([^"]*)"', tag)
    return m.group(1) if m else None


def epub_to_text(payload: bytes, max_output: int | None = 256 << 20) -> str:
    """OCF walk → container.xml → OPF manifest/spine → chapters in
    READING order → the HTML tag state machine, texts joined with
    single spaces."""
    payload = bytes(payload)
    members = zip_members(payload, max_output=max_output)
    if not members or members[0][0] != "mimetype":
        raise ValueError("epub: first zip member must be 'mimetype'")
    name, method, data = members[0]
    if method != 0:
        raise ValueError("epub: mimetype member must be stored, not compressed")
    if data != _MIMETYPE:
        raise ValueError(f"epub: wrong mimetype {data!r}")
    by_name = {n: d for n, _m, d in members}
    container = by_name.get("META-INF/container.xml")
    if container is None:
        raise ValueError("epub: missing META-INF/container.xml")
    m = re.search(rb'full-path="([^"]+)"', container)
    if not m:
        raise ValueError("epub: container.xml has no rootfile full-path")
    opf_path = m.group(1).decode("utf-8")
    opf = by_name.get(opf_path)
    if opf is None:
        raise ValueError(f"epub: rootfile {opf_path!r} not in package")
    opf_text = opf.decode("utf-8")
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    hrefs = {}
    for tag in re.findall(r"<item\b[^>]*/?>", opf_text):
        item_id, href = _attr(tag, "id"), _attr(tag, "href")
        if item_id and href:
            hrefs[item_id] = href
    spine_ids = [
        _attr(tag, "idref")
        for tag in re.findall(r"<itemref\b[^>]*/?>", opf_text)
    ]
    if not spine_ids:
        raise ValueError("epub: OPF has no spine")
    texts = []
    for sid in spine_ids:
        if sid not in hrefs:
            raise ValueError(f"epub: spine idref {sid!r} not in manifest")
        path = base + hrefs[sid]
        doc = by_name.get(path)
        if doc is None:
            raise ValueError(f"epub: manifest item {path!r} not in package")
        texts.append(html_to_text(doc.decode("utf-8")))
    return " ".join(" ".join(texts).split())
