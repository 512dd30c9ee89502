"""Web-feed codecs from scratch (round 12): RSS 2.0 (``<rss><channel>
<item>`` with title/link/pubDate/description) and Atom 1.0
(``<feed><entry>`` with title/link-href/updated/content, XML
namespaces on the wire) — builders and parsers over a purpose-sized
tag walker with CDATA sections and entity decode, nothing imported.

Feeds are the DISCOVERY layer of a crawl pipeline (a crawler finds
new documents through RSS/Atom long before they reach an index) and a
text corpus in their own right (podcast show notes, news-wire
archives, blog aggregators). The two formats encode the same
entries with different grammars — element text vs attribute
(``<link>url</link>`` vs ``<link href="url"/>``), RFC 822 vs RFC 3339
dates, CDATA vs entity escaping — which makes the agreement recipe
(same entries through both wires against one SQL truth) the natural
oracle, exactly as SRT/VTT did for captions.

Parse raises typed ``ValueError`` on malformed input (wrong root
element, unterminated CDATA/element, missing required fields, entry
bomb) so the quarantine keeps corrupt rows as rows. Full XML
(processing instructions beyond the prolog, namespace resolution,
nested HTML content models) is the documented boundary — feeds in
the wild that need a real XML parser quarantine rather than
mis-parse.
"""

from __future__ import annotations

import re

from yark_spark.operators.xml_util import xml_unescape

__all__ = ["rss_build", "rss_parse", "atom_build", "atom_parse"]


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(s: str) -> str:
    return xml_unescape(s, "feed")


def _element_text(xml: str, tag: str, start: int = 0) -> tuple[str | None, int]:
    """Text content of the next <tag>…</tag> after ``start`` (CDATA
    honored, entities decoded); returns (text, end_pos) or (None,
    start) when absent."""
    m = re.compile(rf"<{tag}(?:\s[^>]*)?>").search(xml, start)
    if not m:
        return None, start
    at = m.end()
    end = xml.find(f"</{tag}>", at)
    if end < 0:
        raise ValueError(f"feed: unterminated <{tag}> element")
    body = xml[at:end]
    cm = re.match(r"\s*<!\[CDATA\[(.*)\]\]>\s*$", body, re.S)
    if cm:
        return cm.group(1), end + len(tag) + 3
    if "<![CDATA[" in body and "]]>" not in body:
        raise ValueError("feed: unterminated CDATA section")
    return _unescape(body), end + len(tag) + 3


# ---------------------------------------------------------------------------
# RSS 2.0
# ---------------------------------------------------------------------------


def rss_build(channel_title: str, entries: list[dict]) -> str:
    """Serialize entries as RSS 2.0. Odd entries wrap the description
    in CDATA (both escaping regimes on every wire)."""
    items = []
    for i, e in enumerate(entries):
        desc = (
            f"<![CDATA[{e['text']}]]>"
            if i % 2
            else _escape(e["text"])
        )
        items.append(
            "<item>"
            f"<title>{_escape(e['title'])}</title>"
            f"<link>{_escape(e['link'])}</link>"
            f"<guid isPermaLink=\"false\">{_escape(e['id'])}</guid>"
            f"<pubDate>{e['date_rfc822']}</pubDate>"
            f"<description>{desc}</description>"
            "</item>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<rss version="2.0"><channel>'
        f"<title>{_escape(channel_title)}</title>"
        "<link>https://example.org/</link>"
        "<description>fixture</description>"
        + "".join(items)
        + "</channel></rss>"
    )


def rss_parse(xml: str, max_entries: int = 100_000) -> list[dict]:
    if not re.search(r"<rss[\s>]", xml):
        raise ValueError("feed: not an RSS document")
    out = []
    for m in re.finditer(r"<item(?:\s[^>]*)?>(.*?)</item>", xml, re.S):
        if len(out) >= max_entries:
            raise ValueError("feed: entry count exceeds bomb guard")
        body = m.group(1)
        title, _ = _element_text(body, "title")
        link, _ = _element_text(body, "link")
        guid, _ = _element_text(body, "guid")
        date, _ = _element_text(body, "pubDate")
        desc, _ = _element_text(body, "description")
        if title is None or link is None:
            raise ValueError("feed: RSS item missing title/link")
        out.append(
            {
                "id": guid or link,
                "title": title,
                "link": link,
                "date": date or "",
                "text": desc or "",
            }
        )
    return out


# ---------------------------------------------------------------------------
# Atom 1.0
# ---------------------------------------------------------------------------


def atom_build(feed_title: str, entries: list[dict]) -> str:
    """Serialize entries as Atom 1.0: link as an ATTRIBUTE, RFC 3339
    dates, content type="text"."""
    items = []
    for e in entries:
        items.append(
            "<entry>"
            f"<id>{_escape(e['id'])}</id>"
            f"<title>{_escape(e['title'])}</title>"
            f"<link href=\"{_escape(e['link'])}\" rel=\"alternate\"/>"
            f"<updated>{e['date_rfc3339']}</updated>"
            f"<content type=\"text\">{_escape(e['text'])}</content>"
            "</entry>"
        )
    return (
        '<?xml version="1.0" encoding="utf-8"?>'
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        f"<title>{_escape(feed_title)}</title>"
        "<id>urn:fixture</id><updated>2024-01-01T00:00:00Z</updated>"
        + "".join(items)
        + "</feed>"
    )


def atom_parse(xml: str, max_entries: int = 100_000) -> list[dict]:
    if not re.search(r"<feed[\s>]", xml):
        raise ValueError("feed: not an Atom document")
    out = []
    for m in re.finditer(r"<entry(?:\s[^>]*)?>(.*?)</entry>", xml, re.S):
        if len(out) >= max_entries:
            raise ValueError("feed: entry count exceeds bomb guard")
        body = m.group(1)
        ident, _ = _element_text(body, "id")
        title, _ = _element_text(body, "title")
        date, _ = _element_text(body, "updated")
        content, _ = _element_text(body, "content")
        lm = re.search(r"<link\b[^>]*\bhref=\"([^\"]*)\"[^>]*/?>", body)
        if title is None or lm is None:
            raise ValueError("feed: Atom entry missing title/link")
        out.append(
            {
                "id": ident or _unescape(lm.group(1)),
                "title": title,
                "link": _unescape(lm.group(1)),
                "date": date or "",
                "text": content or "",
            }
        )
    return out


# ---------------------------------------------------------------------------
# XML sitemaps (sitemaps.org protocol) — the third discovery wire
# ---------------------------------------------------------------------------


def sitemap_build(urls: list[dict]) -> str:
    """Serialize a <urlset> sitemap: loc (entity-escaped), lastmod
    (W3C date), priority."""
    entries = []
    for u in urls:
        entries.append(
            "<url>"
            f"<loc>{_escape(u['loc'])}</loc>"
            f"<lastmod>{u['lastmod']}</lastmod>"
            f"<priority>{u['priority']}</priority>"
            "</url>"
        )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(entries)
        + "</urlset>"
    )


def sitemap_index_build(locs: list[str]) -> str:
    """Serialize a <sitemapindex> pointing at child sitemaps — the
    two-level layout large sites must use (50k-URL/50MB caps per
    file)."""
    entries = [
        f"<sitemap><loc>{_escape(loc)}</loc></sitemap>" for loc in locs
    ]
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(entries)
        + "</sitemapindex>"
    )


def sitemap_parse(xml: str, max_urls: int = 100_000) -> list[dict]:
    """Parse a <urlset>: [(loc, lastmod, priority)]. A <sitemapindex>
    payload raises a typed ValueError naming the other parser (the
    two document kinds share a namespace and crawlers MUST dispatch
    on the root element)."""
    if re.search(r"<sitemapindex[\s>]", xml):
        raise ValueError("sitemap: index document — parse with sitemap_index_parse")
    if not re.search(r"<urlset[\s>]", xml):
        raise ValueError("sitemap: not a urlset document")
    out = []
    for m in re.finditer(r"<url(?:\s[^>]*)?>(.*?)</url>", xml, re.S):
        if len(out) >= max_urls:
            raise ValueError("sitemap: url count exceeds bomb guard")
        body = m.group(1)
        loc, _ = _element_text(body, "loc")
        if loc is None:
            raise ValueError("sitemap: url entry missing loc")
        lastmod, _ = _element_text(body, "lastmod")
        priority, _ = _element_text(body, "priority")
        out.append(
            {"loc": loc, "lastmod": lastmod or "", "priority": priority or ""}
        )
    return out


def sitemap_index_parse(xml: str, max_sitemaps: int = 100_000) -> list[str]:
    """Parse a <sitemapindex> into child sitemap locations."""
    if not re.search(r"<sitemapindex[\s>]", xml):
        raise ValueError("sitemap: not a sitemapindex document")
    out = []
    for m in re.finditer(r"<sitemap(?:\s[^>]*)?>(.*?)</sitemap>", xml, re.S):
        if len(out) >= max_sitemaps:
            raise ValueError("sitemap: child count exceeds bomb guard")
        loc, _ = _element_text(m.group(1), "loc")
        if loc is None:
            raise ValueError("sitemap: index entry missing loc")
        out.append(loc)
    return out
