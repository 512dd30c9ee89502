"""From-scratch HTML → text extraction (round 12) — the boilerplate
pass every crawled-web corpus runs between WARC ingest and curation
(the real WET generator strips HTTP framing AND markup; operators/
multimodal.warc_wet_extract covers the framing half, this module the
markup half).

A deliberately small, deterministic state machine — not a browser
parser: tags are delimiters, never semantics. Rules:

* ``<script>`` / ``<style>`` / ``<!-- -->`` / CDATA bodies are dropped
  whole (raw-text elements close only at their literal end tag, per the
  HTML5 tokenizer's RAWTEXT rule — a ``<div>`` inside a script does not
  close it);
* block-level boundaries (p, div, br, li, tr, headings, …) emit a
  newline; inline tags (b, i, em, span, a, …) vanish without breaking
  the surrounding word — ``wo<b>r</b>d`` extracts as ``word``;
* character/entity references decode via the published HTML5 table
  (stdlib ``html.unescape``);
* text nodes are preserved VERBATIM between boundaries;
  whitespace-only nodes created by markup indentation are dropped, so
  extraction of ``<p>text</p>`` is byte-exactly ``text`` — what the
  constructed-exact oracle key relies on;
* malformed markup never raises: an unclosed tag at EOF is dropped,
  stray ``<`` that cannot open a tag is literal text (the HTML5
  less-than-sign-in-data rule).

Ships to executors by value; pure stdlib.
"""

from __future__ import annotations

import html as _htmlmod
import re

__all__ = ["html_page_fixture", "html_to_text"]

#: Elements whose raw bodies are dropped (HTML5 script-data/RAWTEXT).
_RAW_TEXT = ("script", "style")

#: Tags treated as block boundaries (newline emitted on open AND close).
_BLOCK = frozenset(
    """p div br hr li ul ol dl dt dd table thead tbody tr td th h1 h2 h3
    h4 h5 h6 blockquote pre article section header footer nav aside form
    figure figcaption main address title""".split()
)

_TAG_NAME = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")


def html_to_text(payload: "bytes | str") -> str:
    """Extract the text content of an HTML document (see module
    docstring for the exact rules). Block boundaries join with a single
    newline; leading/trailing whitespace is stripped."""
    s = payload.decode("utf-8", "replace") if isinstance(payload, (bytes, bytearray)) else payload
    n = len(s)
    i = 0
    chunks: list[str] = []  # text segments; "\n" markers for block breaks
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            chunks.append(s[i:])
            break
        if lt > i:
            chunks.append(s[i:lt])
        # comment?
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        # CDATA / doctype / other markup declarations
        if s.startswith("<!", lt) or s.startswith("<?", lt):
            if s.startswith("<![CDATA[", lt):
                end = s.find("]]>", lt + 9)
                i = n if end < 0 else end + 3
            else:
                end = s.find(">", lt)
                i = n if end < 0 else end + 1
            continue
        closing = s.startswith("</", lt)
        m = _TAG_NAME.match(s, lt + (2 if closing else 1))
        if not m:
            # HTML5 less-than-sign-in-data: a '<' that opens nothing is text
            chunks.append("<")
            i = lt + 1
            continue
        name = m.group(0).lower()
        gt = _find_tag_end(s, m.end())
        if gt < 0:  # unclosed tag at EOF: drop the fragment
            break
        i = gt + 1
        if not closing and name in _RAW_TEXT:
            # RAWTEXT: only the literal end tag closes the element
            close = re.compile(rf"</{name}\s*>", re.IGNORECASE).search(s, i)
            i = n if close is None else close.end()
            if name in _BLOCK:
                chunks.append("\n")
            continue
        if name in _BLOCK:
            chunks.append("\n")
    # assemble: entity-decode text nodes; whitespace-only nodes at a
    # BLOCK boundary are markup indentation and drop, but an in-flow
    # whitespace node between inline tags is a real word separator and
    # collapses to one space ('a<b> </b>c' -> 'a c', not 'ac' — the
    # round-12 self-review case); marker runs collapse to one newline
    parts: list[str] = []
    pending_break = False
    pending_space = False
    for c in chunks:
        if c == "\n":
            pending_break = True
            pending_space = False
            continue
        text = _htmlmod.unescape(c)
        if not text.strip():
            if parts and not pending_break and text:
                pending_space = True
            continue
        if pending_break and parts:
            parts.append("\n")
        elif pending_space:
            parts.append(" ")
        pending_break = False
        pending_space = False
        parts.append(text)
    return "".join(parts).strip()


def _find_tag_end(s: str, pos: int) -> int:
    """Index of the ``>`` closing a tag whose name ends at ``pos`` —
    quote-aware so ``<a title="a>b">`` parses (the tokenizer's
    attribute-value states, reduced)."""
    n = len(s)
    quote = None
    while pos < n:
        ch = s[pos]
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in ('"', "'"):
            quote = ch
        elif ch == ">":
            return pos
        pos += 1
    return -1


def html_page_fixture(did: int, text: str) -> str:
    """The deterministic page skeleton the HTML fixture keys share (see
    multimodal.with_html_payload for the trap inventory — RAWTEXT
    script, comment, indentation, inline <em>, numeric reference);
    :func:`html_to_text` recovers ``text`` byte-exactly. Lives here so
    closures over it ship by value with the codec module."""
    esc = _htmlmod.escape(text)
    head, sep, tail = esc.partition(" ")
    body = f"{head}&#32;<em>{tail}</em>" if sep else esc
    return (
        "<!DOCTYPE html>\n<html>\n <head>\n"
        f"  <script>var x = '<p>{int(did)}</p>';</script>\n"
        "  <style>body { color: #000; }</style>\n"
        " </head>\n"
        f" <!-- doc {int(did)} -->\n"
        " <body>\n  <div>\n"
        f"   <p>{body}</p>\n"
        "  </div>\n </body>\n</html>\n"
    )
