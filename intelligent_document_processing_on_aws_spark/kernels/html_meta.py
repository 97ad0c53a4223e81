"""HTML head-metadata extraction: title / description / og:* / canonical.

A web-scale corpus pipeline needs page metadata long before full-text
extraction: the canonical URL feeds URL-level dedup (a page served under
many URLs declares one canonical), ``og:*`` / ``<meta description>``
feed search snippets and quality signals, and ``<html lang>`` is the
author-declared language prior that CCNet-style pipelines cross-check
against the detected language. The reference has no crawl-side metadata
stage (its inputs are S3 uploads, not crawled pages); this extends its
extraction surface to the crawl setting, sharing the routing of
kernels/filetype.

Scale shape: parsing stops at ``</head>`` (or the first ``<body>`` tag
for malformed pages) so per-document work is bounded by the head size
(~2 KB typical), not the page size. The operator is a map-only Arrow
pass — zero shuffles; at 100 TB it is pure scan-side work.

Parsing is the stdlib ``HTMLParser`` (tokenizer-level, no DOM): handles
attribute-order variance, single/double/bare quoting, uppercase tags,
and entity references in ``<title>`` — the cases a regex approach gets
wrong. First occurrence wins for every field (browser behavior for
title/canonical; og duplicates are overwhelmingly authoring bugs).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

from .html_dom import collapse_ws

HEAD_LIMIT = 65536  # bytes of decoded text scanned before giving up

# og properties promoted to dedicated columns; the rest land in og_extra
OG_FIELDS = ("og:title", "og:description", "og:url", "og:image", "og:type")


@dataclass
class HeadMeta:
    title: str | None = None
    description: str | None = None
    canonical: str | None = None
    lang: str | None = None
    robots_meta: str | None = None
    og_title: str | None = None
    og_description: str | None = None
    og_url: str | None = None
    og_image: str | None = None
    og_type: str | None = None


class _Done(Exception):
    pass


class _HeadParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta = HeadMeta()
        self._title_parts: list[str] | None = None

    # -- helpers -------------------------------------------------------
    def _set(self, field: str, value: str | None) -> None:
        value = collapse_ws(value or "")
        if value and getattr(self.meta, field) is None:
            setattr(self.meta, field, value)

    # -- tokenizer callbacks --------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        a = {k: (v or "") for k, v in attrs}
        if tag == "html":
            self._set("lang", a.get("lang"))
        elif tag == "title":
            if self.meta.title is None and self._title_parts is None:
                self._title_parts = []
        elif tag == "meta":
            name = a.get("name", "").strip().lower()
            prop = a.get("property", "").strip().lower()
            content = a.get("content")
            if name == "description":
                self._set("description", content)
            elif name == "robots":
                self._set("robots_meta", content)
            elif prop in OG_FIELDS:
                self._set("og_" + prop[3:], content)
        elif tag == "link":
            rels = a.get("rel", "").lower().split()
            if "canonical" in rels:
                self._set("canonical", a.get("href", "").strip() or None)
        elif tag == "body":
            raise _Done  # head is over even if </head> never appeared

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._title_parts is not None:
            self._set("title", "".join(self._title_parts))
            self._title_parts = None
        elif tag == "head":
            raise _Done

    def handle_data(self, data: str) -> None:
        if self._title_parts is not None:
            self._title_parts.append(data)


def extract_head_meta(html: str) -> HeadMeta:
    """Parse head metadata out of (already charset-decoded) HTML text.

    Never raises: malformed markup yields whatever fields were seen
    before the parser gave up. Scans at most ``HEAD_LIMIT`` characters.
    """
    p = _HeadParser()
    try:
        p.feed(html[:HEAD_LIMIT])
        p.close()
    except _Done:
        pass
    except Exception:  # noqa: BLE001 — malformed page: keep partial fields
        pass
    if p._title_parts is not None:  # EOF inside <title>
        p._set("title", "".join(p._title_parts))
    return p.meta
