"""Published-date fixtures + independent goldens.

Each record draws a date (and decoy dates) first, renders them into a
page (head meta / body time tag / URL path) per family, and records
the expected (epoch, source) from the drawn values — never by running
kernels/pagedate back over the page. Families cover the precedence
ladder and its failure modes:

- ``meta_published``  — article:published_time wins over a DIFFERENT
                        time-tag date and url date present on the page
- ``meta_modified``   — no published; modified beats name="date"
- ``time_tag``        — no meta; <time datetime> beats the url date
- ``url_date``        — /YYYY/MM/DD/ path only
- ``url_dash``        — /YYYY-MM-DD form; a bogus /2024/13/ decoy
                        segment earlier in the path must be skipped
- ``none``            — no date surface at all
- ``meta_after_head`` — published_time AFTER <body> ignored -> ladder
                        falls through to the url date
- ``bad_values``      — unparseable meta/time values -> url fallback

Determinism: record i derives entirely from
``random.Random(f"pagedate-{i}-42")``.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

FAMILIES = ("meta_published", "meta_modified", "time_tag", "url_date",
            "url_dash", "none", "meta_after_head", "bad_values")

_EPOCH0 = datetime(2020, 1, 1, tzinfo=timezone.utc)

WORDS = "ledger signal orchard archive window relay".split()


def _dt(rng: random.Random) -> datetime:
    return _EPOCH0 + timedelta(minutes=rng.randrange(2_000_000))


def _day(dt: datetime) -> datetime:
    return datetime(dt.year, dt.month, dt.day, tzinfo=timezone.utc)


def _body(rng: random.Random) -> str:
    return "".join(f"<p>{' '.join(rng.choice(WORDS) for _ in range(8))}</p>"
                   for _ in range(2))


def gen_record(i: int) -> dict:
    rng = random.Random(f"pagedate-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]

    d_main, d_decoy = _dt(rng), _dt(rng)
    url = f"https://site{rng.randrange(10)}.example.com/{rng.choice(WORDS)}/{i}"
    g: dict = {"doc_id": i, "family": family, "epoch": None, "source": None}

    if family == "meta_published":
        g.update(epoch=int(d_main.timestamp()), source="meta")
        url = (f"https://s{i % 7}.example.com/{d_decoy.year}/"
               f"{d_decoy.month:02d}/{d_decoy.day:02d}/post-{i}")
        html = (f'<html><head><meta property="article:published_time" '
                f'content="{d_main.isoformat()}">'
                f'<meta property="article:modified_time" '
                f'content="{d_decoy.isoformat()}"></head>'
                f'<body><time datetime="{d_decoy.isoformat()}">x</time>'
                f"{_body(rng)}</body></html>")
    elif family == "meta_modified":
        g.update(epoch=int(d_main.timestamp()), source="meta")
        html = (f'<html><head><meta property="article:modified_time" '
                f'content="{d_main.isoformat()}">'
                f'<meta name="date" content="{d_decoy.date().isoformat()}">'
                f"</head><body>{_body(rng)}</body></html>")
    elif family == "time_tag":
        g.update(epoch=int(_day(d_main).timestamp()), source="time_tag")
        url = (f"https://s{i % 7}.example.com/{d_decoy.year}-"
               f"{d_decoy.month:02d}-{d_decoy.day:02d}-post")
        html = (f"<html><head><title>t</title></head><body>"
                f'<time datetime="{d_main.date().isoformat()}">then</time>'
                f"{_body(rng)}</body></html>")
    elif family == "url_date":
        g.update(epoch=int(_day(d_main).timestamp()), source="url")
        url = (f"https://s{i % 7}.example.com/blog/{d_main.year}/"
               f"{d_main.month:02d}/{d_main.day:02d}/slug-{i}")
        html = f"<html><head></head><body>{_body(rng)}</body></html>"
    elif family == "url_dash":
        g.update(epoch=int(_day(d_main).timestamp()), source="url")
        url = (f"https://s{i % 7}.example.com/a/2024/13/"          # decoy: bad month
               f"{d_main.year}-{d_main.month:02d}-{d_main.day:02d}.html")
        html = f"<html><body>{_body(rng)}</body></html>"
    elif family == "none":
        html = f"<html><head><title>t</title></head><body>{_body(rng)}</body></html>"
    elif family == "meta_after_head":
        g.update(epoch=int(_day(d_main).timestamp()), source="url")
        url = (f"https://s{i % 7}.example.com/{d_main.year}/"
               f"{d_main.month:02d}/{d_main.day:02d}/p{i}")
        html = (f"<html><head><title>t</title></head><body>"
                f'<meta property="article:published_time" '
                f'content="{d_decoy.isoformat()}">{_body(rng)}</body></html>')
    elif family == "bad_values":
        g.update(epoch=int(_day(d_main).timestamp()), source="url")
        url = (f"https://s{i % 7}.example.com/{d_main.year}-"
               f"{d_main.month:02d}-{d_main.day:02d}/x")
        html = (f'<html><head><meta property="article:published_time" '
                f'content="last tuesday"></head><body>'
                f'<time datetime="whenever">x</time>{_body(rng)}</body></html>')
    else:  # pragma: no cover
        raise AssertionError(family)

    g["url"] = url
    g["html"] = html
    return g


def gen_pagedate_docs(n: int) -> list[dict]:
    return [gen_record(i) for i in range(n)]
