"""Web-feed codec tests (round 12): the RSS-vs-Atom grammar
differences (element vs attribute links, CDATA vs entities), entity
decode, typed errors, and cross-format equality."""

import pytest

from yark_spark.operators.feeds import atom_build, atom_parse, rss_build, rss_parse


def _entries(n=4):
    return [
        {
            "id": f"doc-{i}",
            "title": f"title {i}",
            "link": f"https://x/{i}?a=1&b=2",
            "text": f"body <text> & \"stuff\" {i}",
            "date_rfc822": "Mon, 01 Jan 2024 00:00:00 GMT",
            "date_rfc3339": "2024-01-01T00:00:00Z",
        }
        for i in range(n)
    ]


def test_cross_format_equality():
    es = _entries()
    r = rss_parse(rss_build("ch", es))
    a = atom_parse(atom_build("ch", es))
    for e, x, y in zip(es, r, a):
        assert x["id"] == y["id"] == e["id"]
        assert x["title"] == y["title"] == e["title"]
        assert x["link"] == y["link"] == e["link"]
        assert x["text"] == y["text"] == e["text"]


def test_both_escaping_regimes_on_wire():
    xml = rss_build("ch", _entries())
    assert "<![CDATA[" in xml  # odd entries
    assert "&lt;text&gt;" in xml  # even entries entity-escaped
    assert "&amp;" in xml


def test_atom_link_is_attribute():
    xml = atom_build("ch", _entries(1))
    assert '<link href="https://x/0?a=1&amp;b=2" rel="alternate"/>' in xml


def test_numeric_entities_decode():
    xml = rss_build("ch", _entries(1)).replace("body", "b&#111;dy&#x21;")
    assert rss_parse(xml)[0]["text"].startswith("body!")


def test_errors():
    with pytest.raises(ValueError, match="not an RSS"):
        rss_parse(atom_build("ch", _entries(1)))
    with pytest.raises(ValueError, match="not an Atom"):
        atom_parse(rss_build("ch", _entries(1)))
    with pytest.raises(ValueError, match="unterminated"):
        rss_parse("<rss><channel><item><title>x</item></channel></rss>")
    with pytest.raises(ValueError, match="missing title"):
        rss_parse("<rss><channel><item><link>x</link></item></channel></rss>")
    with pytest.raises(ValueError, match="unknown XML entity"):
        rss_parse(
            "<rss><channel><item><title>&bogus;</title><link>x</link>"
            "</item></channel></rss>"
        )
    with pytest.raises(ValueError, match="bomb"):
        rss_parse(rss_build("ch", _entries(4)), max_entries=2)


def test_unterminated_cdata():
    bad = rss_build("ch", _entries(2)).replace("]]>", "", 1)
    with pytest.raises(ValueError, match="CDATA|unterminated"):
        rss_parse(bad)


def test_sitemap_roundtrip_and_escaping():
    from yark_spark.operators.feeds import sitemap_build, sitemap_parse

    urls = [
        {"loc": f"https://x/{i}?a=1&b=2", "lastmod": "2024-01-01", "priority": "0.5"}
        for i in range(4)
    ]
    xml = sitemap_build(urls)
    assert "&amp;" in xml  # query-string escaping is live
    assert sitemap_parse(xml) == urls


def test_sitemap_index_two_level():
    from yark_spark.operators.feeds import (
        sitemap_build,
        sitemap_index_build,
        sitemap_index_parse,
        sitemap_parse,
    )

    children = {
        f"https://x/s{i}.xml": sitemap_build(
            [{"loc": f"https://x/{i}/{j}", "lastmod": "", "priority": ""} for j in range(3)]
        )
        for i in range(2)
    }
    idx = sitemap_index_build(list(children))
    locs = sitemap_index_parse(idx)
    assert locs == list(children)
    total = [u["loc"] for loc in locs for u in sitemap_parse(children[loc])]
    assert len(total) == 6
    # root-element dispatch is typed both ways
    import pytest

    with pytest.raises(ValueError, match="index document"):
        sitemap_parse(idx)
    with pytest.raises(ValueError, match="not a sitemapindex"):
        sitemap_index_parse(next(iter(children.values())))


def test_uppercase_x_hex_entity_decodes():
    # ADVICE r12: &#X41; (uppercase X, XML 1.0 §4.1) must decode; the
    # old pattern's '#X' branch was dead code.
    xml = rss_build("ch", _entries(1)).replace("body", "&#X41;body")
    assert rss_parse(xml)[0]["text"].startswith("Abody")


def test_hex_letters_without_x_pass_through_raw():
    # '&#ab;' is neither decimal nor hex-marked: with disjoint hex/dec
    # patterns it no longer reaches int() (old code crashed with a
    # generic ValueError there) — it stays raw in the text.
    xml = rss_build("ch", _entries(1)).replace("body", "&#ab;body")
    assert rss_parse(xml)[0]["text"].startswith("&#ab;body")
