"""Synthetic Common-Crawl-style `pages` corpus + independent goldens.

Implements FIXTURES.md §1: six HTML/PDF template families, each with a
golden main content computed **from the template data, not by running the
extraction kernels** — the byte-identity oracle. One deliberate exception:
pipe-markdown table *formatting* is shared via kernels.tables (the frozen
formatting spec); the tested surface there is the HTML-table *parse*.

Determinism: page i is fully determined by `random.Random(f"page-{i}-42")`,
so generation is order-independent and can run distributed.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

from ..kernels.tables import format_float, format_int, format_pipe_table

FAMILIES = ("article", "table_page", "link_farm", "sandwich", "minimal", "pdf_like")
LANGS = ("en", "de", "fr", "es")
BASE_TS = datetime(2025, 1, 1, tzinfo=timezone.utc)

WORDS = (
    "data stream table query merge sort filter batch spark window vector "
    "column row value key order group join scan part small big fast slow "
    "line customer total detail report market garden river mountain cloud "
    "silver stone paper letter number office system people nature music "
    "travel winter summer morning evening project service moment"
).split()

NAV_LINKS = ("Home", "About", "Contact", "Blog", "Shop")
FOOTER_LINKS = ("Privacy", "Terms", "Contact")


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _links_html(texts, rng) -> str:
    return " ".join(f'<a href="/{i}">{t}</a>' for i, t in enumerate(texts))


def _spans_for(texts: list[str]) -> list[list[int]]:
    spans, off = [], 0
    for i, t in enumerate(texts):
        spans.append([off, off + len(t), i])
        off += len(t) + 1  # "\n" join
    return spans


def gen_page(i: int) -> dict:
    """Full deterministic record for page index i: input cols + golden cols."""
    rng = random.Random(f"page-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]
    host = 0 if rng.random() < 0.30 else rng.randrange(1, 200)
    url = f"https://host{host:04d}.example/{family}/{i:06d}.html"
    warc_ts = BASE_TS + timedelta(seconds=137 * i)
    lang = LANGS[i % len(LANGS)]
    builder = _BUILDERS[family]
    rec = builder(rng)
    rec.update(
        url=url,
        warc_ts=warc_ts,
        lang=lang,
        spans_json=json.dumps(rec.pop("spans"), separators=(",", ":")),
    )
    return rec


# -- template families -------------------------------------------------------

def _inline_markup(rng: random.Random, text: str) -> str:
    """Wrap one word in inline formatting (golden-neutral: same visible
    text after whitespace collapse)."""
    words = text.split()
    if len(words) < 3:
        return text
    i = rng.randrange(len(words))
    tag = rng.choice(("b", "em", "strong", "i", "span"))
    words[i] = f"<{tag}>{words[i]}</{tag}>"
    return " ".join(words)


def _gen_article(rng: random.Random) -> dict:
    title = _sentence(rng, 4)
    paras = [_sentence(rng, 15 + rng.randrange(26)) for _ in range(2 + rng.randrange(4))]
    ads = [_sentence(rng, 3), _sentence(rng, 3)]
    nav_text = " ".join(NAV_LINKS)
    aside_text = " ".join(ads)
    footer_text = " ".join(FOOTER_LINKS)
    # golden-neutral hardening: inline markup inside paragraphs, comments
    # between them, a script in body, nested div wrapper around <article>
    paras_html = []
    for p in paras:
        ph = _inline_markup(rng, p) if rng.random() < 0.6 else p
        paras_html.append(f"<p>{ph}</p>")
        if rng.random() < 0.3:
            paras_html.append(f"<!-- comment {rng.randrange(99)} -->")
    html = (
        "<!DOCTYPE html><html><head><title>" + title + "</title>"
        "<script>var tracker = '</div>';</script></head><body>\n"
        "<header><nav>" + _links_html(NAV_LINKS, rng) + "</nav></header>\n"
        '<div class="content"><article>\n'
        + "\n".join(paras_html)
        + "\n</article></div>\n"
        "<aside>" + _links_html(ads, rng) + "</aside>\n"
        "<footer>" + _links_html(FOOTER_LINKS, rng) + "</footer>\n"
        "</body></html>"
    )
    kept_chars = sum(len(p) for p in paras)
    total_chars = kept_chars + len(nav_text) + len(aside_text) + len(footer_text)
    return {
        "html": html.encode("utf-8"),
        "text": "\n".join([title, nav_text, *paras, aside_text, footer_text]),
        "extracted_text": "\n".join(paras),
        "spans": _spans_for(paras),
        "confidence": round(kept_chars / total_chars, 6),
        "content_type": "html",
    }


def _gen_table_page(rng: random.Random) -> dict:
    header = ["Item", "Qty", "Price"]
    rows = [header]
    for _ in range(3 + rng.randrange(4)):
        rows.append(
            [
                _sentence(rng, 2),
                format_int(rng.randrange(1, 500)),
                format_float(round(rng.uniform(1, 5000), 2)),
            ]
        )
    md = format_pipe_table(rows)
    nav_text = " ".join(NAV_LINKS)
    footer_text = " ".join(FOOTER_LINKS)
    # thead/tbody wrappers are structural noise the parser must pass through
    html = (
        "<!DOCTYPE html><html><body>\n"
        "<header><nav>" + _links_html(NAV_LINKS, rng) + "</nav></header>\n"
        "<main><table>\n<thead>"
        + "<tr>" + "".join(f"<th>{c}</th>" for c in header) + "</tr></thead>\n<tbody>"
        + "\n".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in rows[1:]
        )
        + "</tbody>\n</table></main>\n"
        "<footer>" + _links_html(FOOTER_LINKS, rng) + "</footer>\n"
        "</body></html>"
    )
    total = len(md) + len(nav_text) + len(footer_text)
    return {
        "html": html.encode("utf-8"),
        "text": "\n".join([nav_text] + [" ".join(r) for r in rows] + [footer_text]),
        "extracted_text": md,
        "spans": [[0, len(md), 0]],
        "confidence": round(len(md) / total, 6),
        "content_type": "html",
    }


def _gen_link_farm(rng: random.Random) -> dict:
    groups = []
    for _ in range(3):
        groups.append([_sentence(rng, 1 + rng.randrange(3)) for _ in range(4)])
    nav_text = " ".join(NAV_LINKS)
    html = (
        "<!DOCTYPE html><html><body>\n"
        "<header><nav>" + _links_html(NAV_LINKS, rng) + "</nav></header>\n"
        + "\n".join(
            "<ul>"
            + "".join(f'<li><a href="/l">{t}</a></li>' for t in grp)
            + "</ul>"
            for grp in groups
        )
        + "\n<footer>" + _links_html(FOOTER_LINKS, rng) + "</footer>\n"
        "</body></html>"
    )
    all_texts = [t for grp in groups for t in grp]
    return {
        "html": html.encode("utf-8"),
        "text": "\n".join([nav_text, *all_texts, " ".join(FOOTER_LINKS)]),
        "extracted_text": "",
        "spans": [],
        "confidence": 0.0,
        "content_type": "html",
    }


def _gen_sandwich(rng: random.Random) -> dict:
    parts = [_sentence(rng, 12 + rng.randrange(20)) for _ in range(3)]
    ads = [[_sentence(rng, 2 + rng.randrange(2)) for _ in range(3)] for _ in range(2)]
    body = []
    # nested wrappers + attributes with quotes/specials (golden-neutral)
    body.append(f'<div id="s1"><div><p>{_inline_markup(rng, parts[0])}</p></div></div>')
    body.append('<div class="ad" onclick="track(\'x\')">' + _links_html(ads[0], rng) + "</div>")
    body.append(f"<div><p>{parts[1]}</p></div>")
    body.append('<div class="ad" data-x=\'a>b\'>' + _links_html(ads[1], rng) + "</div>")
    body.append(f"<div><p>{parts[2]}</p></div>")
    html = "<!DOCTYPE html><html><body>\n" + "\n".join(body) + "\n</body></html>"
    kept = sum(len(p) for p in parts)
    total = kept + sum(len(" ".join(a)) for a in ads)
    return {
        "html": html.encode("utf-8"),
        "text": "\n".join(
            [parts[0], " ".join(ads[0]), parts[1], " ".join(ads[1]), parts[2]]
        ),
        "extracted_text": "\n".join(parts),
        "spans": _spans_for(parts),
        "confidence": round(kept / total, 6),
        "content_type": "html",
    }


def _gen_minimal(rng: random.Random) -> dict:
    if rng.random() < 0.5:
        # <br> splits the body into two blocks (block-tag flush semantics)
        seg1 = _sentence(rng, 10 + rng.randrange(8))
        seg2 = _sentence(rng, 10 + rng.randrange(8))
        html = f"<html><body>{seg1}<br>{seg2}</body></html>"
        golden = f"{seg1}\n{seg2}"
        return {
            "html": html.encode("utf-8"),
            "text": golden,
            "extracted_text": golden,
            "spans": _spans_for([seg1, seg2]),
            "confidence": 1.0,
            "content_type": "html",
        }
    text = _sentence(rng, 10 + rng.randrange(15))
    html = f"<html><body>{text}</body></html>"
    return {
        "html": html.encode("utf-8"),
        "text": text,
        "extracted_text": text,
        "spans": [[0, len(text), 0]],
        "confidence": 1.0,
        "content_type": "html",
    }


def _gen_pdf_like(rng: random.Random) -> dict:
    spans = []
    page_line_texts: list[list[str]] = []
    for page in range(1, 2 + rng.randrange(3)):
        lines = []
        for line_idx in range(3 + rng.randrange(4)):
            words = [rng.choice(WORDS) for _ in range(4 + rng.randrange(7))]
            # split line into 1-2 spans at a word boundary
            if len(words) > 5 and rng.random() < 0.5:
                cut = 2 + rng.randrange(len(words) - 3)
                chunks = [words[:cut], words[cut:]]
            else:
                chunks = [words]
            y_line = 72.0 + 18.0 * line_idx
            x = 72.0
            for chunk in chunks:
                t = " ".join(chunk)
                spans.append(
                    {
                        "page": page,
                        "x": x,
                        "y": round(y_line + rng.uniform(-1.0, 1.0), 3),
                        "text": t,
                        "confidence": round(rng.uniform(88.0, 99.9), 1),
                    }
                )
                x += 7.0 * (len(t) + 1)
            lines.append(" ".join(words))
        page_line_texts.append(lines)
    golden_lines = [ln for pg in page_line_texts for ln in pg]
    golden = "\n".join(golden_lines)
    conf_tenths = [round(s["confidence"] * 10) for s in spans]
    confidence = round(sum(conf_tenths) / (len(conf_tenths) * 1000), 6)
    rng.shuffle(spans)
    payload = b"%SPDF" + json.dumps({"spans": spans}, separators=(",", ":")).encode()
    return {
        "html": payload,
        "text": golden,
        "extracted_text": golden,
        "spans": _spans_for(golden_lines),
        "confidence": confidence,
        "content_type": "pdf",
    }


_BUILDERS = {
    "article": _gen_article,
    "table_page": _gen_table_page,
    "link_farm": _gen_link_farm,
    "sandwich": _gen_sandwich,
    "minimal": _gen_minimal,
    "pdf_like": _gen_pdf_like,
}

INPUT_COLS = ("url", "warc_ts", "html", "text", "lang")
GOLDEN_COLS = ("url", "extracted_text", "spans_json", "lang", "confidence", "content_type")


def gen_pages(n: int, start: int = 0) -> list[dict]:
    return [gen_page(i) for i in range(start, start + n)]
