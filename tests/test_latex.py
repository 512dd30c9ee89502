"""Round 14: LaTeX (detex-class) text extraction — grammar vectors,
fixture roundtrips, typed errors."""

from __future__ import annotations

import pytest

from yark_spark.operators.latex import latex_build, latex_text


def _doc(body: str) -> bytes:
    return ("\\documentclass{article}\n\\begin{document}\n" + body +
            "\n\\end{document}\n").encode()


def test_fixture_roundtrip():
    paras = [
        "The quick brown fox jumps over the lazy dog again and again",
        "Special chars: 100% of $5 & a_b #1 {braces} ~tilde^ and a \\ slash",
        "Plain paragraph three with nothing odd at all here",
        "Another paragraph with some words to wrap around the middle",
        "verbatim candidate pure ascii words only here",
        "More content follows the list block with text",
        "Sixth paragraph text keeps flowing along nicely",
        "Seventh one has 50% off for $2 & under_score",
    ]
    got = latex_text(latex_build(paras))
    assert got == " ".join(" ".join(p.split()) for p in paras)


def test_comment_vs_escaped_percent():
    assert latex_text(_doc("keep 100\\% of this % but drop this\nnext")) == \
        "keep 100% of this next"


def test_math_modes_drop():
    assert latex_text(_doc("a $x+y$ b $$z$$ c \\(q\\) d \\[r\\] e "
                           "\\begin{equation}E\\end{equation} f")) == \
        "a b c d e f"


def test_verbatim_raw():
    assert latex_text(_doc(
        "before \\begin{verbatim}\nraw % not a comment $ not math\n"
        "\\end{verbatim} after"
    )) == "before raw % not a comment $ not math after"


def test_command_unwrapping_and_escapes():
    assert latex_text(_doc("\\section{Head Words} \\textbf{bold} "
                           "\\emph{emph} plain")) == "Head Words bold emph plain"
    assert latex_text(_doc("\\& \\% \\$ \\_ \\# \\{ \\} "
                           "\\textbackslash{} \\textasciitilde{}")) == \
        "& % $ _ # { } \\ ~"
    assert latex_text(_doc("a~b c\\\\d")) == "a b c d"


def test_unknown_commands_drop_names_keep_groups():
    assert latex_text(_doc("\\noisemacro{kept words} \\unknowncmd tail")) == \
        "kept words tail"


def test_items_and_environments():
    assert latex_text(_doc(
        "\\begin{itemize}\\item one two \\item three\\end{itemize} done"
    )) == "one two three done"
    assert latex_text(_doc(
        "\\begin{center}centered text\\end{center}"
    )) == "centered text"


def test_preamble_and_trailing_noise_skipped():
    blob = ("\\documentclass{article}\n\\usepackage{noise}\n"
            "\\begin{document}\nbody only\n\\end{document}\n"
            "trailing junk").encode()
    assert latex_text(blob) == "body only"


def test_typed_errors():
    with pytest.raises(ValueError, match="begin"):
        latex_text(b"no document here")
    with pytest.raises(ValueError, match="unterminated math"):
        latex_text(_doc("a $x"))
    with pytest.raises(ValueError, match="unterminated environment"):
        latex_text(_doc("\\begin{verbatim} never closed"))
    with pytest.raises(ValueError, match="unterminated display"):
        latex_text(_doc("\\[ x"))
