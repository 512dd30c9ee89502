"""Markdown → text extraction from scratch (round 12): a
CommonMark-lite stripper for the constructs that dominate real
README/docs corpora — ATX headers, setext underlines, fenced code
blocks (contents KEPT — code is data in a code corpus; fences and
info strings dropped), emphasis/strong (``*``/``_`` runs), inline
code spans, links ``[text](url)`` → text, images ``![alt](url)`` →
alt, autolinks ``<http://…>`` dropped, list markers, blockquote
prefixes, thematic breaks, HTML comments — followed by whitespace
normalization to single spaces. Nothing imported beyond ``re``.

Markdown is the documentation half of every code corpus (The Stack's
READMEs, GitHub wikis, docs sites' sources); the curation pass that
feeds them to a tokenizer is exactly this strip. It complements the
HTML extractor (``operators/html`` — the crawled-web half): both
recover a clean word stream from markup, and the fixture/oracle
recipe is shared (markup built around the document's words must
strip back to the exact word stream).

Full CommonMark (reference links, nested emphasis disambiguation,
HTML blocks, tables) is a documented boundary — the stripper is
tolerant: unknown constructs degrade to their visible text rather
than raising, which is the correct behavior for a QUALITY pass over
heterogeneous crawled markdown (a parse error must not drop a
document; the quarantine is for containers, not prose).
"""

from __future__ import annotations

import re

__all__ = ["md_to_text", "md_page_fixture"]

_FENCE_RE = re.compile(r"^(```|~~~)([^\n]*)\n(.*?)^\1\s*$", re.M | re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(([^)]*)\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\(([^)]*)\)")
_AUTOLINK_RE = re.compile(r"<[a-z][a-z0-9+.-]*://[^>\s]*>")
_CODE_SPAN_RE = re.compile(r"`+([^`]*)`+")
_EMPH_RE = re.compile(r"(\*{1,3}|_{1,3})(?=\S)(.+?)(?<=\S)\1")
_ATX_RE = re.compile(r"^#{1,6}\s+", re.M)
_ATX_TRAIL_RE = re.compile(r"\s+#+\s*$", re.M)
_SETEXT_RE = re.compile(r"^(=+|-+)\s*$", re.M)
_THEMATIC_RE = re.compile(r"^ {0,3}(\*\s*){3,}$|^ {0,3}(-\s*){3,}$|^ {0,3}(_\s*){3,}$", re.M)
_LIST_RE = re.compile(r"^ {0,3}(?:[-*+]|\d{1,9}[.)])\s+", re.M)
_QUOTE_RE = re.compile(r"^ {0,3}(?:>\s?)+", re.M)


def md_to_text(md: str) -> str:
    """Strip markdown to its text, whitespace-normalized to single
    spaces. Fenced-block and code-span CONTENTS survive LITERALLY
    (CommonMark: code is not inline-parsed — a ``[x](y)`` inside
    backticks is code, not a link); fences, info strings and backticks
    don't. Link text and image alt survive (URLs don't)."""
    # NUL bytes cannot appear in legitimate markdown (and would collide
    # with the placeholder tokens below) — drop them up front, the same
    # degrade-gracefully stance as every other unknown construct
    s = _COMMENT_RE.sub(" ", md.replace("\x00", ""))
    # protect code contents from the inline rules: swap each fence
    # body / code span for a placeholder, restore after stripping
    protected: list[str] = []

    def _protect(text: str) -> str:
        protected.append(text)
        return f"\x00{len(protected) - 1}\x00"

    s = _FENCE_RE.sub(lambda m: _protect(m.group(3)), s)
    s = _CODE_SPAN_RE.sub(lambda m: _protect(m.group(1)), s)
    s = _THEMATIC_RE.sub(" ", s)
    s = _SETEXT_RE.sub(" ", s)
    s = _ATX_TRAIL_RE.sub(" ", s)
    s = _ATX_RE.sub("", s)
    s = _QUOTE_RE.sub("", s)
    s = _LIST_RE.sub("", s)
    s = _IMAGE_RE.sub(lambda m: m.group(1), s)
    s = _LINK_RE.sub(lambda m: m.group(1), s)
    s = _AUTOLINK_RE.sub(" ", s)
    prev = None
    while prev != s:  # nested emphasis: ***x*** → **x** handled per pass
        prev = s
        s = _EMPH_RE.sub(lambda m: m.group(2), s)
    s = re.sub(r"\x00(\d+)\x00", lambda m: protected[int(m.group(1))], s)
    return " ".join(s.split())


def md_page_fixture(words: list[str]) -> str:
    """Deterministic markdown built AROUND a word stream so that
    ``md_to_text`` recovers exactly ``' '.join(words)``: the first
    four words become an ATX header line (with a trailing-# close),
    then words rotate through strong / emphasis / inline-code / link /
    image-alt / list-item / blockquote / fenced-code constructs, with
    an HTML comment, an autolink and a thematic break interleaved as
    droppable noise."""
    out = []
    head, rest = words[:4], words[4:]
    if head:
        out.append("## " + " ".join(head) + " ##")
        out.append("")
    out.append("<!-- build: fixture -->")
    para: list[str] = []
    fence: list[str] = []
    for i, w in enumerate(rest):
        k = i % 9
        if k == 0:
            para.append(f"**{w}**")
        elif k == 1:
            para.append(f"*{w}*")
        elif k == 2:
            para.append(f"`{w}`")
        elif k == 3:
            para.append(f"[{w}](https://example.org/{i})")
        elif k == 4:
            para.append(f"![{w}](img/{i}.png)")
        elif k == 5:
            out.append(" ".join(para))
            para = []
            out.append(f"- {w}")
        elif k == 6:
            out.append(f"> {w}")
        elif k == 7:
            fence.append(w)
        else:
            out.append("```python\n" + " ".join(fence + [w]) + "\n```")
            fence = []
            out.append("<https://example.org/skip>")
            out.append("---")
    if fence:
        out.append("```\n" + " ".join(fence) + "\n```")
    if para:
        out.append(" ".join(para))
    return "\n".join(out)
