"""Markdown stripper tests (round 12): per-construct strips, fence
content survival, droppable noise, nested emphasis, tolerance on
unknown constructs, and the corpus-wide fixture recovery pin."""

from yark_spark.operators.markdown import md_page_fixture, md_to_text


def test_headers():
    assert md_to_text("# Title") == "Title"
    assert md_to_text("## Two words ##") == "Two words"
    assert md_to_text("Setext\n====") == "Setext"
    assert md_to_text("Setext two\n----") == "Setext two"


def test_emphasis_and_code():
    assert md_to_text("**bold** *ital* `code` ***both***") == "bold ital code both"
    assert md_to_text("a _under_ and __dunder__") == "a under and dunder"


def test_links_images_autolinks():
    assert md_to_text("[text](http://u)") == "text"
    assert md_to_text("![alt words](i.png)") == "alt words"
    assert md_to_text("see <https://example.org/x> end") == "see end"


def test_fence_contents_survive():
    assert md_to_text("```python\ncode here\n```") == "code here"
    assert md_to_text("~~~\nx = [1](2)\n~~~") == "x = [1](2)"  # inline rules OFF inside


def test_lists_quotes_breaks_comments():
    assert md_to_text("- one\n* two\n3. three\n> quoted") == "one two three quoted"
    assert md_to_text("a\n\n---\n\nb") == "a b"
    assert md_to_text("x <!-- hidden\ncomment --> y") == "x y"


def test_unknown_constructs_degrade_not_raise():
    # tables aren't parsed (documented boundary): visible text survives
    assert (
        md_to_text("| a | b |\n|---|---|\n| c | d |") == "| a | b | |---|---| | c | d |"
    )
    assert md_to_text("stray ] and ( unbalanced [") == "stray ] and ( unbalanced ["


def test_code_contents_are_literal():
    # CommonMark: code is not inline-parsed — links/emphasis inside
    # backticks or fences must survive verbatim
    assert md_to_text("`[1](2)`") == "[1](2)"
    assert md_to_text("`**not bold**`") == "**not bold**"


def test_whitespace_normalization():
    assert md_to_text("a\n\n\n  b\t c") == "a b c"


def test_fixture_recovers_word_stream():
    words = ("key agg row scan slow fast table value part hash merge batch "
             "spark the line sort window big small filter data column").split()
    for n in range(1, len(words) + 1):
        sub = words[:n]
        assert md_to_text(md_page_fixture(sub)) == " ".join(sub), n


def test_nul_bytes_degrade_not_corrupt():
    """Review finding: literal NUL bytes collided with the placeholder
    tokens and spliced code-span content into the wrong place."""
    assert md_to_text("\x000\x00 and `code`") == "0 and code"
    assert md_to_text("plain \x00 text") == "plain text"
