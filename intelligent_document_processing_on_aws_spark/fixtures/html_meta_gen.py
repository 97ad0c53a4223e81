"""Head-metadata fixtures + independent goldens.

Each record composes a full HTML page from randomly drawn metadata
*facts* (title string, description, canonical URL, og fields, lang);
the golden columns are those facts, never the output of running
kernels/html_meta back over the markup. Families vary the markup shape
so each parsing hazard has dedicated coverage: attribute order flips,
single/double/no quoting, uppercase tags, entity references in the
title, a missing ``</head>`` (the ``<body>`` tag must terminate the
scan), metadata illegally placed *after* ``<body>`` (must be ignored),
duplicated tags (first wins), and pages with no metadata at all.

Determinism: record i derives entirely from
``random.Random(f"htmlmeta-{i}-42")``.
"""

from __future__ import annotations

import random

WORDS = ("the data stream report quarterly revenue market system people "
         "window vector column value order group channel network").split()

FAMILIES = (
    "plain",            # title + description + canonical + lang, tidy markup
    "og_rich",          # all five og:* fields + name=robots
    "attr_flip",        # content= before name=/property=; single quotes
    "upper_entities",   # UPPERCASE tags/attrs; &amp;/&#x2014; in the title
    "no_head_close",    # </head> missing — <body> must end the scan
    "meta_after_body",  # og tags after <body> must NOT be picked up
    "dup_first_wins",   # two titles + two canonicals — first wins
    "bare_page",        # no head metadata at all -> all NULLs
)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _url(rng: random.Random) -> str:
    host = f"{rng.choice(WORDS)}{rng.randrange(100)}.example.com"
    return f"https://{host}/{_words(rng, 2).replace(' ', '/')}"


def _body(rng: random.Random) -> str:
    return "".join(f"<p>{_words(rng, 8 + rng.randrange(8))}</p>"
                   for _ in range(2 + rng.randrange(3)))


def gen_record(i: int) -> dict:
    rng = random.Random(f"htmlmeta-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]

    g: dict = {"doc_id": i, "family": family, "title": None,
               "description": None, "canonical": None, "lang": None,
               "robots_meta": None, "og_title": None, "og_description": None,
               "og_url": None, "og_image": None, "og_type": None}

    title = _words(rng, 3 + rng.randrange(4)).title()
    desc = _words(rng, 10 + rng.randrange(10))
    canon = _url(rng)
    lang = rng.choice(("en", "en-US", "de", "fr", "ja"))

    if family == "plain":
        g.update(title=title, description=desc, canonical=canon, lang=lang)
        head = (f'<meta charset="utf-8"><title>{title}</title>'
                f'<meta name="description" content="{desc}">'
                f'<link rel="canonical" href="{canon}">')
        html = (f'<!doctype html><html lang="{lang}"><head>{head}</head>'
                f"<body>{_body(rng)}</body></html>")
    elif family == "og_rich":
        og_t, og_d = title + " | Site", _words(rng, 8)
        og_u, og_i = canon, _url(rng) + "/img.png"
        og_ty = rng.choice(("article", "website", "video.other"))
        robots = rng.choice(("index, follow", "noindex", "noarchive"))
        g.update(title=title, og_title=og_t, og_description=og_d,
                 og_url=og_u, og_image=og_i, og_type=og_ty,
                 robots_meta=robots, lang=lang)
        head = (f"<title>{title}</title>"
                f'<meta property="og:title" content="{og_t}">'
                f'<meta property="og:description" content="{og_d}">'
                f'<meta property="og:url" content="{og_u}">'
                f'<meta property="og:image" content="{og_i}">'
                f'<meta property="og:type" content="{og_ty}">'
                f'<meta name="robots" content="{robots}">')
        html = (f'<html lang="{lang}"><head>{head}</head>'
                f"<body>{_body(rng)}</body></html>")
    elif family == "attr_flip":
        g.update(title=title, description=desc, canonical=canon,
                 og_title=title)
        head = (f"<title>{title}</title>"
                f"<meta content='{desc}' name='description'>"
                f"<meta content='{title}' property='og:title'>"
                f"<link href='{canon}' rel='canonical'>")
        html = f"<html><head>{head}</head><body>{_body(rng)}</body></html>"
    elif family == "upper_entities":
        # title fact is the *decoded* text with collapsed whitespace
        g.update(title=f"{title} & Co — Home", description=desc, lang=lang)
        head = (f"<TITLE>{title} &amp; Co &#x2014;\n  Home</TITLE>"
                f'<META NAME="description" CONTENT="{desc}">')
        html = (f'<HTML LANG="{lang}"><HEAD>{head}</HEAD>'
                f"<BODY>{_body(rng)}</BODY></HTML>")
    elif family == "no_head_close":
        g.update(title=title, canonical=canon)
        head = f'<title>{title}</title><link rel=canonical href="{canon}">'
        html = (f"<html><head>{head}"           # no </head>
                f"<body>{_body(rng)}"
                f'<meta name="description" content="{desc}"></body></html>')
    elif family == "meta_after_body":
        g.update(title=title)
        html = (f"<html><head><title>{title}</title></head><body>"
                f'<meta property="og:title" content="{title}">'
                f'<link rel="canonical" href="{canon}">'
                f"{_body(rng)}</body></html>")
    elif family == "dup_first_wins":
        t2, c2 = _words(rng, 3).title(), _url(rng)
        g.update(title=title, canonical=canon)
        head = (f"<title>{title}</title><title>{t2}</title>"
                f'<link rel="canonical" href="{canon}">'
                f'<link rel="canonical" href="{c2}">')
        html = f"<html><head>{head}</head><body>{_body(rng)}</body></html>"
    elif family == "bare_page":
        html = f"<html><head></head><body>{_body(rng)}</body></html>"
    else:  # pragma: no cover
        raise AssertionError(family)

    g["html"] = html
    return g


def gen_html_meta_docs(n: int) -> list[dict]:
    return [gen_record(i) for i in range(n)]
