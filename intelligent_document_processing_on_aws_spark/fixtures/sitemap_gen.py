"""Sitemap fixtures + independent goldens.

Each record composes a sitemap document *from* entry facts (loc /
lastmod datetime / changefreq / priority drawn first, as values); the
golden is those facts — lastmod epochs are computed from the datetime
objects the generator chose, never by running kernels/sitemap back
over the XML.  Families give each parsing hazard dedicated coverage:

- ``plain``          — tidy urlset; a mix of loc-only and full entries
- ``ns_prefixed``    — ``<sm:urlset>`` / ``<sm:url>`` / ``<sm:loc>``
- ``gzip``           — the plain shape, gzip-compressed (.xml.gz)
- ``index``          — sitemapindex of child sitemaps (loc + lastmod)
- ``entities_ws``    — ``&amp;`` in locs, newlines/indent inside tags
- ``dates_mix``      — date-only, trailing-Z, +02:00 offset, invalid
- ``invalid_fields`` — out-of-range priority, junk changefreq, a
                       loc-less block (skipped, counted)
- ``malformed``      — wrong root / truncated gzip -> kind='error'

Determinism: record i derives entirely from
``random.Random(f"sitemap-{i}-42")``.

URL space: locs live in the same formula space the capture-index
synthesis uses (``https://site{k%10}.example.com/p/{k%1000}`` with
k < 2000), so the frontier fetch-list join has genuine new / stale /
fresh populations.
"""

from __future__ import annotations

import gzip
import random
from datetime import datetime, timedelta, timezone

FAMILIES = ("plain", "ns_prefixed", "gzip", "index", "entities_ws",
            "dates_mix", "invalid_fields", "malformed")

_EPOCH0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

_CHANGEFREQS = ("always", "hourly", "daily", "weekly", "monthly",
                "yearly", "never")


def _loc(rng: random.Random) -> str:
    k = rng.randrange(2000)
    return f"https://site{k % 10}.example.com/p/{k % 1000}"


def _dt(rng: random.Random) -> datetime:
    return _EPOCH0 + timedelta(minutes=rng.randrange(400_000))


def _urlset(inner: str, prefix: str = "", xmlns: str = "") -> str:
    p = f"{prefix}:" if prefix else ""
    return (f'<?xml version="1.0" encoding="UTF-8"?>'
            f"<{p}urlset{xmlns}>{inner}</{p}urlset>")


def gen_record(i: int) -> dict:
    rng = random.Random(f"sitemap-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]

    g: dict = {"doc_id": i, "family": family, "kind": "urlset",
               "entries": [], "error": False}
    blocks: list[str] = []

    def add(loc: str, dt: datetime | None = None, cf: str | None = None,
            pr: float | None = None, *, dt_render: str | None = None,
            loc_render: str | None = None, pad: str = "") -> None:
        g["entries"].append({
            "loc": loc,
            "lastmod_epoch": int(dt.timestamp()) if dt else None,
            "changefreq": cf, "priority": pr,
        })
        parts = [f"<loc>{pad}{loc_render or loc}{pad}</loc>"]
        if dt is not None or dt_render is not None:
            parts.append(f"<lastmod>{dt_render or dt.isoformat()}</lastmod>")
        if cf is not None:
            parts.append(f"<changefreq>{cf}</changefreq>")
        if pr is not None:
            parts.append(f"<priority>{pr:.1f}</priority>")
        blocks.append(f"<url>{''.join(parts)}</url>")

    if family in ("plain", "gzip"):
        for _ in range(3 + rng.randrange(4)):
            if rng.random() < 0.5:
                add(_loc(rng))
            else:
                add(_loc(rng), _dt(rng), rng.choice(_CHANGEFREQS),
                    rng.randrange(11) / 10)
        xml = _urlset("".join(blocks),
                      xmlns=' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"')
        raw = xml.encode()
        if family == "gzip":
            raw = gzip.compress(raw, mtime=0)
    elif family == "ns_prefixed":
        for _ in range(2 + rng.randrange(3)):
            dt = _dt(rng)
            loc = _loc(rng)
            g["entries"].append({"loc": loc,
                                 "lastmod_epoch": int(dt.timestamp()),
                                 "changefreq": None, "priority": None})
            blocks.append(f"<sm:url><sm:loc>{loc}</sm:loc>"
                          f"<sm:lastmod>{dt.isoformat()}</sm:lastmod></sm:url>")
        raw = _urlset(
            "".join(blocks), prefix="sm",
            xmlns=' xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9"',
        ).encode()
    elif family == "index":
        g["kind"] = "sitemapindex"
        parts = []
        for _ in range(2 + rng.randrange(3)):
            dt = _dt(rng)
            loc = f"https://site{rng.randrange(10)}.example.com/sitemap{rng.randrange(50)}.xml.gz"
            g["entries"].append({"loc": loc,
                                 "lastmod_epoch": int(dt.timestamp()),
                                 "changefreq": None, "priority": None})
            parts.append(f"<sitemap><loc>{loc}</loc>"
                         f"<lastmod>{dt.date().isoformat()}</lastmod></sitemap>")
            # date-only child lastmod: midnight UTC
            g["entries"][-1]["lastmod_epoch"] = int(
                datetime(dt.year, dt.month, dt.day,
                         tzinfo=timezone.utc).timestamp())
        raw = (f'<?xml version="1.0"?><sitemapindex>'
               f"{''.join(parts)}</sitemapindex>").encode()
    elif family == "entities_ws":
        k = rng.randrange(2000)
        loc1 = f"https://site{k % 10}.example.com/p/{k % 1000}?a=1&b=2"
        add(loc1, loc_render=loc1.replace("&", "&amp;"), pad="\n    ")
        add(_loc(rng), _dt(rng), pad="  ")
        raw = _urlset("\n  ".join(blocks)).encode()
    elif family == "dates_mix":
        d1, d2, d3 = _dt(rng), _dt(rng), _dt(rng)
        add(_loc(rng), datetime(d1.year, d1.month, d1.day,
                                tzinfo=timezone.utc),
            dt_render=d1.date().isoformat())                 # date-only
        add(_loc(rng), d2, dt_render=d2.strftime("%Y-%m-%dT%H:%M:%SZ"))
        d3_off = d3.astimezone(timezone(timedelta(hours=2)))
        add(_loc(rng), d3, dt_render=d3_off.isoformat())     # +02:00
        add(_loc(rng), None, dt_render="yesterday")          # invalid -> NULL
        raw = _urlset("".join(blocks)).encode()
    elif family == "invalid_fields":
        loc = _loc(rng)
        g["entries"].append({"loc": loc, "lastmod_epoch": None,
                             "changefreq": None, "priority": None})
        blocks.append(f"<url><loc>{loc}</loc><priority>3.7</priority>"
                      f"<changefreq>fortnightly</changefreq></url>")
        blocks.append("<url><lastmod>2024-02-02</lastmod></url>")  # no loc
        g["n_skipped"] = 1
        add(_loc(rng), _dt(rng), "weekly", 0.5)
        raw = _urlset("".join(blocks)).encode()
    elif family == "malformed":
        g["kind"] = "error"
        g["error"] = True
        if rng.random() < 0.5:
            raw = b"<?xml version='1.0'?><rss><channel></channel></rss>"
        else:
            raw = gzip.compress(b"<urlset><url><loc>x</loc></url></urlset>",
                                mtime=0)[:20]  # truncated gzip
    else:  # pragma: no cover
        raise AssertionError(family)

    g.setdefault("n_skipped", 0)
    g["raw"] = raw
    return g


def gen_sitemap_docs(n: int) -> list[dict]:
    return [gen_record(i) for i in range(n)]
