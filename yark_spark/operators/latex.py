"""LaTeX text extraction from scratch (round 14): the arXiv wire.
Academic-paper corpora (peS2o, RedPajama-arXiv, proof-pile) start
from .tex sources, and the standard pass is exactly this: strip the
preamble, drop comments and math, unwrap styling commands, resolve
escape sequences — a detex-class extractor whose output feeds the
tokenizer, not a typesetter.

Grammar handled:

* document body isolation (``\\begin{document}`` … ``\\end{document}``);
* comments: ``%`` to end of line (a ``\\%`` escape is text, not a
  comment — the scanner tracks the escape state);
* math modes DROPPED whole: ``$…$``, ``$$…$$``, ``\\(...\\)``,
  ``\\[...\\]`` and the ``equation``/``align``/``displaymath``
  environments (starred forms included) — formulas are noise to a
  text pipeline;
* ``verbatim`` environments kept RAW (no command/escape processing
  inside — the TeX semantics);
* sectioning/styling commands unwrap to their argument: ``\\section``
  family (starred forms), ``\\textbf/\\textit/\\emph/\\texttt/
  \\underline/\\mbox/\\text``; ``\\footnote`` content is kept as
  trailing text (the common extractor behavior);
* structure: ``\\begin/\\end`` of known text environments
  (abstract/itemize/enumerate/center/quote/flushleft/flushright/
  description/document) vanish, ``\\item`` and ``\\\\`` become word
  boundaries, ``~`` is an (unbreakable) space, ``{``/``}`` grouping
  braces vanish;
* escapes: ``\\& \\% \\$ \\_ \\# \\{ \\}`` → the literal character,
  ``\\textbackslash``/``\\textasciitilde``/``\\textasciicircum`` (with
  optional empty group) → ``\\``/``~``/``^``;
* unknown zero-argument commands are dropped (their names consumed,
  following whitespace eaten — TeX tokenizer rules); unknown commands'
  braced groups remain ordinary groups, so their TEXT survives.

Typographic re-rendering (``--`` → en dash, ``\\'e`` accents) is out
of scope by design: extraction returns SOURCE text for the pipeline,
like detex/pandoc-plain do. Malformed input (unterminated math or
verbatim, missing document body) raises typed ``ValueError`` →
quarantine.

Oracle recipe: the extraction family's — documents wrapped into full
.tex sources (preamble, sections, styling cycles, comment noise,
math noise, escaped specials) must recover their text byte-exactly
against md5(text) (q_latex_extract).

Reference parity note: the reference archiver stores fetched payloads
opaquely (/root/reference/cmds/archive.py); document extraction is
driver-mandated pipeline surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import re

__all__ = ["latex_build", "latex_text"]

# characters that must be escaped when WRITING text into a .tex body
_ESCAPES = {
    "&": r"\&",
    "%": r"\%",
    "$": r"\$",
    "_": r"\_",
    "#": r"\#",
    "{": r"\{",
    "}": r"\}",
    "~": r"\textasciitilde{}",
    "^": r"\textasciicircum{}",
    "\\": r"\textbackslash{}",
}

_WRAPS = ("", "\\textbf{%s}", "\\emph{%s}", "\\textit{%s}", "\\texttt{%s}")
_MATH_NOISE = (
    "$e = mc^2$",
    "\\[ \\sum_{i=0}^{n} x_i^2 \\leq \\|x\\|_2^2 \\]",
    "\\begin{equation} f(x) = \\int_0^1 g(t)\\,dt \\end{equation}",
    "\\( \\alpha + \\beta \\)",
    "$$ \\frac{a}{b} $$",
)


def _tex_escape(s: str) -> str:
    return "".join(_ESCAPES.get(ch, ch) for ch in s)


def latex_build(paragraphs: list[str], title: str = "Fixture Document") -> bytes:
    """Wrap paragraphs into a full .tex source: preamble noise the
    extractor must skip, sections every 3 paragraphs, styling wraps
    and comment/math noise cycling per paragraph, an itemize block,
    and one verbatim block carrying paragraph 2 raw (ASCII-safe
    paragraphs only reach verbatim; the builder falls back to an
    escaped paragraph otherwise)."""
    out = [
        "\\documentclass[11pt]{article}",
        "\\usepackage[utf8]{inputenc} % extractor must never see this",
        "\\newcommand{\\noisemacro}[1]{#1}",
        "\\title{%s}" % _tex_escape(title),
        "% a comment before the body",
        "\\begin{document}",
        "\\maketitle",
    ]
    for i, para in enumerate(paragraphs):
        if i % 3 == 0:
            kind = ["section", "subsection", "subsubsection"][(i // 3) % 3]
            words = para.split()
            head, rest = " ".join(words[:3]), " ".join(words[3:])
            out.append("\\%s{%s}" % (kind, _tex_escape(head)))
            para = rest
        wrap = _WRAPS[i % len(_WRAPS)]
        body = _tex_escape(para)
        if wrap:
            # split only at a space: escape sequences stay intact
            mid = body.find(" ", len(body) // 2)
            if 0 < mid < len(body) - 1:
                body = body[:mid] + " " + (wrap % body[mid + 1 :])
        if i % 4 == 1:
            body += " % trailing comment noise"
        if i % 4 == 2:
            out.append(_MATH_NOISE[i % len(_MATH_NOISE)])
        if i % 5 == 3:
            out.append("\\begin{itemize}")
            out.append("\\item %s" % body)
            out.append("\\end{itemize}")
        elif i % 5 == 4 and "\\" not in body and "%" not in body:
            out.append("\\begin{verbatim}")
            out.append(para)
            out.append("\\end{verbatim}")
        else:
            out.append(body)
        out.append("")  # paragraph break
    out.append("\\end{document}")
    out.append("% trailing noise after the body")
    return "\n".join(out).encode("utf-8")


_ENV_MATH = {"equation", "equation*", "align", "align*", "displaymath",
             "eqnarray", "eqnarray*", "math"}
_ENV_TEXT = {"document", "abstract", "itemize", "enumerate", "center",
             "quote", "quotation", "flushleft", "flushright",
             "description"}
_UNWRAP = {"textbf", "textit", "emph", "texttt", "underline", "mbox",
           "text", "footnote", "section", "section*", "subsection",
           "subsection*", "subsubsection", "subsubsection*", "paragraph",
           "chapter", "title", "author", "caption", "item"}
_CHAR_CMDS = {"textbackslash": "\\", "textasciitilde": "~",
              "textasciicircum": "^", "ldots": "…", "dots": "…"}

_CMD_RE = re.compile(r"[A-Za-z]+\*?")


def _find_env_end(s: str, pos: int, env: str) -> int:
    """Index just past ``\\end{env}`` starting the search at pos."""
    needle = "\\end{%s}" % env
    at = s.find(needle, pos)
    if at < 0:
        raise ValueError(f"latex: unterminated environment {env!r}")
    return at, at + len(needle)


def latex_text(payload: bytes, max_output: int = 1 << 26) -> str:
    """Extract the body text, whitespace-normalized to single
    spaces."""
    src = bytes(payload).decode("utf-8")
    if len(src) > max_output:
        raise ValueError("latex: source exceeds bomb guard")
    begin = src.find("\\begin{document}")
    if begin < 0:
        raise ValueError("latex: no \\begin{document}")
    end = src.rfind("\\end{document}")
    if end < 0:
        raise ValueError("latex: no \\end{document}")
    s = src[begin + len("\\begin{document}") : end]

    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            eol = s.find("\n", i)
            i = n if eol < 0 else eol  # keep the newline as whitespace
            continue
        if c == "$":
            # $...$ or $$...$$ — dropped whole
            dbl = i + 1 < n and s[i + 1] == "$"
            close = s.find("$$" if dbl else "$", i + (2 if dbl else 1))
            if close < 0:
                raise ValueError("latex: unterminated math")
            i = close + (2 if dbl else 1)
            out.append(" ")
            continue
        if c == "~":
            out.append(" ")
            i += 1
            continue
        if c in "{}":
            i += 1  # grouping braces vanish; their content is text
            continue
        if c != "\\":
            out.append(c)
            i += 1
            continue
        # a control sequence
        if i + 1 >= n:
            break
        nxt = s[i + 1]
        if nxt in "&%$_#{}":
            out.append(nxt)
            i += 2
            continue
        if nxt == "\\":
            out.append(" ")  # forced line break
            i += 2
            continue
        if nxt == "[":
            close = s.find("\\]", i + 2)
            if close < 0:
                raise ValueError("latex: unterminated display math")
            i = close + 2
            out.append(" ")
            continue
        if nxt == "(":
            close = s.find("\\)", i + 2)
            if close < 0:
                raise ValueError("latex: unterminated inline math")
            i = close + 2
            out.append(" ")
            continue
        m = _CMD_RE.match(s, i + 1)
        if not m:
            out.append(nxt)  # \<symbol>: keep the char (e.g. \-)
            i += 2
            continue
        name = m.group(0)
        i = m.end()
        if name == "begin" or name == "end":
            em = re.match(r"\{([^}]*)\}", s[i:])
            if not em:
                raise ValueError(f"latex: \\{name} without environment name")
            env = em.group(1)
            i += em.end()
            if name == "begin" and env in _ENV_MATH:
                _at, i = _find_env_end(s, i, env)
                out.append(" ")
            elif name == "begin" and env == "verbatim":
                at, i = _find_env_end(s, i, env)
                out.append(" ")
                out.append(s[m.end() + len(env) + 2 : at])  # RAW content
                out.append(" ")
            # otherwise: env markers vanish, content flows as text
            continue
        if name in _CHAR_CMDS:
            out.append(_CHAR_CMDS[name])
            # swallow an optional EMPTY group (the {} spacer idiom)
            if s[i : i + 2] == "{}":
                i += 2
            continue
        if name in _UNWRAP:
            out.append(" ")
            continue  # its braced group stays as ordinary text
        # unknown command: drop the name, eat following whitespace
        # (TeX tokenizer), keep any braced group as plain text
        while i < n and s[i] in " \t\n":
            i += 1
        out.append(" ")
    return " ".join("".join(out).split())
