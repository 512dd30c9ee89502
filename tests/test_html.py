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


# ---------------------------------------------------------------------------
# Main-content extraction (round 13)
# ---------------------------------------------------------------------------

from yark_spark.operators.html import (  # noqa: E402
    classify_blocks,
    html_blocks,
    html_main_text,
    main_content_page_fixture,
)

_STOP = frozenset({"a", "the", "of", "and", "is", "to", "in", "it"})


def _one(html):
    return html_blocks(html)


def test_blocks_track_link_density():
    blocks = _one('<p><a href="/x">all linked text</a></p><p>plain prose here</p>')
    assert blocks[0]["link_chars"] == blocks[0]["n_chars"]
    assert blocks[1]["link_chars"] == 0


def test_partial_anchor_density():
    blocks = _one('<p><a href="/x">linked</a> plain</p>')
    assert blocks[0]["link_chars"] == len("linked")
    assert blocks[0]["n_chars"] == len("linked plain")


def test_classifier_link_density_beats_stopwords():
    # a nav full of stopwords is still boilerplate: link check first
    blocks = _one('<li><a href="/">the best of the archive and more</a></li>')
    assert classify_blocks(blocks, _STOP) == ["bad"]


def test_classifier_stopword_threshold_integer_boundary():
    # exactly 2 stopwords in 8 words = 1/4: good (>= threshold);
    # 1 in 8 is below: bad
    good = _one("<p>the cat sat on mat with a hat</p>")  # the, a = 2/8
    bad = _one("<p>cat sat on mat with red hat the</p>")  # 'on'? not stop
    assert classify_blocks(good, _STOP) == ["good"]
    blocks2 = _one("<p>cat sat mat red hat blue dog the</p>")  # 1/8
    assert classify_blocks(blocks2, _STOP) == ["bad"]


def test_short_block_inherits_from_nearest_nonshort_neighbors():
    html = (
        "<p>the story is a long one and it keeps going</p>"
        "<p>see more</p>"
        '<p><a href="/x">linked boilerplate tail block</a></p>'
    )
    blocks = _one(html)
    assert classify_blocks(blocks, _STOP) == ["good", "good", "bad"]
    # flip: surrounded by bad on both sides -> dropped
    html2 = (
        '<p><a href="/x">linked head</a></p>'
        "<p>see more</p>"
        '<p><a href="/y">linked tail</a></p>'
    )
    assert classify_blocks(_one(html2), _STOP) == ["bad", "bad", "bad"]


def test_consecutive_short_blocks_skip_to_nonshort():
    html = (
        "<p>the story is a long one and it keeps going</p>"
        "<p>see more</p><p>and more</p>"
        '<p><a href="/x">linked tail boilerplate</a></p>'
    )
    assert classify_blocks(_one(html), _STOP) == ["good", "good", "good", "bad"]


def test_main_text_fixture_roundtrip_exact():
    text = (
        "the quick brown fox is a friend of the lazy dog and it runs "
        "to the river in the morning and naps"
    )
    page = main_content_page_fixture(7, text)
    got = html_main_text(page, _STOP)
    words = text.split()
    expect = "\n".join(
        " ".join(words[k : k + 12]) for k in range(0, len(words), 12)
    )
    assert got == expect


def test_boilerplate_never_leaks():
    page = main_content_page_fixture(3, "the data is a table of the rows and it")
    got = html_main_text(page, _STOP)
    for frag in ("cookie", "Document", "privacy", "home page", "trending", "doc 3"):
        assert frag not in got


def test_all_boilerplate_page_yields_empty():
    page = (
        "<html><body><nav><a href='/'>only links here now</a></nav>"
        "<footer><a href='/t'>terms</a></footer></body></html>"
    )
    assert html_main_text(page, _STOP) == ""


def test_rawtext_script_not_a_block():
    blocks = _one("<script>var x = 'the a of and is to';</script><p>the real a text is</p>")
    assert len(blocks) == 1 and blocks[0]["text"] == "the real a text is"
