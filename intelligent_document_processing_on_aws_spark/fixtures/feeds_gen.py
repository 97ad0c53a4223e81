"""RSS/Atom feed fixtures + independent goldens.

Each record composes a feed document *from* entry facts (link / title
/ guid / published datetime drawn first, as values); the golden is
those facts — pub epochs are computed from the datetime objects the
generator chose, never by running kernels/feeds back over the XML.
Families give each parsing hazard dedicated coverage:

- ``rss_plain``   — tidy RSS 2.0; RFC 822 pubDates, guid attributes
- ``rss_cdata``   — CDATA titles, ``&amp;`` in links, junk pubDate
- ``atom_plain``  — tidy Atom; ISO ``<updated>``
- ``atom_links``  — rel=self/enclosure noise around the alternate
                    link, rel-less links, ``<published>`` fallback
- ``gzip_rss``    — the rss_plain shape, gzip-compressed
- ``dates_bad``   — unparseable dates -> NULL epoch
- ``no_link``     — link-less items skipped (counted)
- ``malformed``   — wrong root / truncated gzip -> kind='error'

Determinism: record i derives entirely from
``random.Random(f"feeds-{i}-42")``.

URL space: links live in the capture-index formula space
(``https://site{k%10}.example.com/p/{k%1000}``), so feed entries can
feed operators/cdx.frontier_fetchlist directly.
"""

from __future__ import annotations

import gzip
import random
from datetime import datetime, timedelta, timezone
from email.utils import format_datetime

FAMILIES = ("rss_plain", "rss_cdata", "atom_plain", "atom_links",
            "gzip_rss", "dates_bad", "no_link", "malformed")

_EPOCH0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

WORDS = ("ledger signal orchard archive window channel harvest "
         "quarterly summit relay briefing outlook").split()


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _link(rng: random.Random) -> str:
    k = rng.randrange(2000)
    return f"https://site{k % 10}.example.com/p/{k % 1000}"


def _dt(rng: random.Random) -> datetime:
    return _EPOCH0 + timedelta(minutes=rng.randrange(400_000))


def _rss(channel_inner: str) -> bytes:
    return (f'<?xml version="1.0" encoding="UTF-8"?>'
            f'<rss version="2.0"><channel>{channel_inner}'
            f"</channel></rss>").encode()


def gen_record(i: int) -> dict:
    rng = random.Random(f"feeds-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]

    g: dict = {"doc_id": i, "family": family, "kind": "rss",
               "feed_title": None, "entries": [], "n_skipped": 0,
               "error": False}

    def fact(link, title, guid, dt):
        g["entries"].append({
            "link": link, "title": title, "guid": guid,
            "pub_epoch": int(dt.timestamp()) if dt else None,
        })

    if family in ("rss_plain", "gzip_rss"):
        g["feed_title"] = _words(rng, 2).title()
        items = []
        for _ in range(3 + rng.randrange(3)):
            link, title, dt = _link(rng), _words(rng, 4).title(), _dt(rng)
            guid = f"tag:{rng.randrange(10**6)}"
            fact(link, title, guid, dt)
            items.append(
                f"<item><title>{title}</title><link>{link}</link>"
                f'<guid isPermaLink="false">{guid}</guid>'
                f"<pubDate>{format_datetime(dt)}</pubDate></item>")
        raw = _rss(f"<title>{g['feed_title']}</title>{''.join(items)}")
        if family == "gzip_rss":
            raw = gzip.compress(raw, mtime=0)
    elif family == "rss_cdata":
        g["feed_title"] = _words(rng, 2).title() + " & Friends"
        title1 = f"A {_words(rng, 2)} — review"
        k = rng.randrange(2000)
        link1 = f"https://site{k % 10}.example.com/p/{k % 1000}?a=1&b=2"
        dt1 = _dt(rng)
        fact(link1, title1, None, dt1)
        link2 = _link(rng)
        fact(link2, None, None, None)       # junk pubDate -> NULL
        raw = _rss(
            f"<title>{g['feed_title'].replace(' & ', ' &amp; ')}</title>"
            f"<item><title><![CDATA[{title1}]]></title>"
            f"<link>{link1.replace('&', '&amp;')}</link>"
            f"<pubDate>{format_datetime(dt1)}</pubDate></item>"
            f"<item><link>{link2}</link><pubDate>soon</pubDate></item>")
    elif family == "atom_plain":
        g["kind"] = "atom"
        g["feed_title"] = _words(rng, 3).title()
        entries = []
        for _ in range(2 + rng.randrange(3)):
            link, title, dt = _link(rng), _words(rng, 3).title(), _dt(rng)
            guid = f"urn:uuid:{rng.randrange(10**9)}"
            fact(link, title, guid, dt)
            entries.append(
                f"<entry><title>{title}</title>"
                f'<link rel="alternate" href="{link}"/>'
                f"<id>{guid}</id><updated>{dt.isoformat()}</updated></entry>")
        raw = (f'<feed xmlns="http://www.w3.org/2005/Atom">'
               f"<title>{g['feed_title']}</title>{''.join(entries)}"
               f"</feed>").encode()
    elif family == "atom_links":
        g["kind"] = "atom"
        link1, dt1 = _link(rng), _dt(rng)
        fact(link1, _words(rng, 2).title(), None, dt1)
        # self + enclosure noise BEFORE the alternate link; published
        # (no updated) supplies the date
        e1 = (f"<entry><title>{g['entries'][0]['title']}</title>"
              f'<link rel="self" href="https://feed.example.com/e1"/>'
              f'<link rel="enclosure" href="https://cdn.example.com/x.mp3"/>'
              f'<link rel="alternate" href="{link1}"/>'
              f"<published>{dt1.isoformat()}</published></entry>")
        link2 = _link(rng)
        fact(link2, None, None, None)
        e2 = f'<entry><link href="{link2}"/></entry>'   # rel-less wins
        raw = f"<feed><title>t</title>{e1}{e2}</feed>".encode()
        g["feed_title"] = "t"
    elif family == "dates_bad":
        g["feed_title"] = _words(rng, 2).title()
        link1, link2 = _link(rng), _link(rng)
        fact(link1, None, None, None)
        fact(link2, None, None, None)
        raw = _rss(
            f"<title>{g['feed_title']}</title>"
            f"<item><link>{link1}</link><pubDate>not a date</pubDate></item>"
            f"<item><link>{link2}</link><pubDate></pubDate></item>")
    elif family == "no_link":
        g["feed_title"] = _words(rng, 2).title()
        link = _link(rng)
        fact(link, None, None, None)
        g["n_skipped"] = 2
        raw = _rss(
            f"<title>{g['feed_title']}</title>"
            f"<item><title>orphan one</title></item>"
            f"<item><guid>g2</guid></item>"
            f"<item><link>{link}</link></item>")
    elif family == "malformed":
        g["kind"] = "error"
        g["error"] = True
        if rng.random() < 0.5:
            raw = b"<urlset><url><loc>https://x</loc></url></urlset>"
        else:
            raw = gzip.compress(_rss("<title>x</title>"), mtime=0)[:18]
    else:  # pragma: no cover
        raise AssertionError(family)

    g["raw"] = raw
    return g


def gen_feed_docs(n: int) -> list[dict]:
    return [gen_record(i) for i in range(n)]
