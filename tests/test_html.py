"""HTML → text extraction tests (round 12): tokenizer rules, RAWTEXT
traps, entity decoding, malformed-markup tolerance — the adversarial
cases behind the byte-exact q_html_extract oracle key."""

import pytest

from yark_spark.operators.html import html_to_text


@pytest.mark.parametrize(
    "src,want",
    [
        ("<p>hello world</p>", "hello world"),
        ("wo<b>r</b>d", "word"),                      # inline tags don't break words
        ("<p>a</p><p>b</p>", "a\nb"),
        ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
        ("first<br>second", "first\nsecond"),
        ("5 &lt; 6 &amp; 7 &gt; 2", "5 < 6 & 7 > 2"),
        ("x&#32;y&#x41;", "x yA"),                    # numeric + hex references
        ("<!-- hidden --><p>shown</p>", "shown"),
        ("<style>p { color: red; }</style>visible", "visible"),
        ("<![CDATA[ raw bytes ]]><p>x</p>", "x"),
        ("<?xml version='1.0'?><p>x</p>", "x"),
        ("<div>\n  <p>indented</p>\n</div>", "indented"),  # markup whitespace drops
        ("", ""),
        ("plain text, no markup", "plain text, no markup"),
    ],
)
def test_extraction_rules(src, want):
    assert html_to_text(src) == want


def test_rawtext_script_swallows_fake_markup():
    """A </div> INSIDE a script must not close anything — only the
    literal end tag leaves script-data state (HTML5 tokenizer)."""
    src = "<div><script>var s = '</div><p>fake</p>';</script>real</div>"
    assert html_to_text(src) == "real"
    assert html_to_text("<SCRIPT>x</SCRIPT>ok") == "ok"  # case-insensitive close


def test_less_than_in_data_is_literal():
    assert html_to_text("a < b still text") == "a < b still text"
    assert html_to_text("1<2 and 2<3") == "1<2 and 2<3"


def test_quoted_gt_inside_attribute():
    assert html_to_text('<a title="a>b">link</a>') == "link"
    assert html_to_text("<img alt='x>y'>tail") == "tail"


def test_malformed_markup_never_raises():
    cases = [
        "broken <unclosed",
        "<script>never closed",
        "<!-- never closed",
        "<![CDATA[ never closed",
        "</>stray close",
        "<p><p><p>deep",
        "<" * 50,
    ]
    for src in cases:
        html_to_text(src)  # must not raise
    assert html_to_text("broken <unclosed") == "broken"
    assert html_to_text("<script>never closed") == ""


def test_bytes_input_with_bad_utf8():
    assert html_to_text(b"<p>caf\xc3\xa9</p>") == "café"
    assert "ok" in html_to_text(b"<p>ok\xff</p>")  # invalid byte replaced, no crash


def test_fixture_roundtrip_is_byte_exact(spark):
    """The q_html_extract contract locally: page build -> extract
    returns the original text exactly, including & < > characters."""
    from yark_spark.operators.multimodal import html_extract_features, with_html_payload
    import hashlib

    texts = [
        "plain words only",
        "ampersand & angle < brackets > here",
        "single",
        "a b c d e f",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in html_extract_features(with_html_payload(df)).collect()}
    for i, t in enumerate(texts):
        assert rows[i]["n_chars"] == len(t)
        assert rows[i]["digest"] == hashlib.md5(t.encode()).hexdigest()


def test_inline_whitespace_node_is_a_word_separator():
    """'a<b> </b>c' must extract 'a c' — an in-flow whitespace-only
    node between inline tags separates words; only BLOCK-boundary
    indentation drops (round-12 self-review)."""
    assert html_to_text("a<b> </b>c") == "a c"
    assert html_to_text("foo<span> </span>bar") == "foo bar"
    assert html_to_text("a<b> </b><i> </i>c") == "a c"  # runs collapse
    # block-boundary indentation still drops
    assert html_to_text("<div>\n  <p>indented</p>\n</div>") == "indented"
