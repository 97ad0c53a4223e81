"""RTF fixtures + independent goldens.

Writes genuine RTF 1.x streams from the public spec, independent of
kernels/rtf: paragraphs serialized with the writer conventions a crawl
actually sees (cp1252 ``\\'hh`` escapes, signed-16-bit ``\\uN`` with a
``\\uc1`` '?' fallback, surrogate pairs for astral chars, font/color
tables, ``\\*`` generator groups, formatting groups, ``\\tab``/escaped
braces, a ``\\pict`` hex blob), plus deliberately corrupt payloads
(truncated stream, unbalanced braces, bad hex escape) that must land on
the error path. Golden text is composed from the paragraph content and
the serializer's own separator choices — the generator never calls the
kernel.
"""

from __future__ import annotations

import random

WORDS = ("quarterly revenue report the committee approved café résumé "
         "naïve piñata Zürich smörgåsbord 中文 текст ελληνικά and also "
         "ordinary english words fill most paragraphs here").split()

ASTRAL = "😀🚀"   # forces surrogate-pair \uN emission


def _esc(ch: str) -> str:
    """One char -> its RTF writer form (golden char is always `ch`)."""
    if ch in "\\{}":
        return "\\" + ch
    o = ord(ch)
    if o < 128:
        return ch
    try:
        b = ch.encode("cp1252")
        if len(b) == 1:
            return "\\'%02x" % b[0]
    except UnicodeEncodeError:
        pass
    if o > 0xFFFF:
        v = o - 0x10000
        hi, lo = 0xD800 + (v >> 10), 0xDC00 + (v & 0x3FF)
        return "\\u%d ?\\u%d ?" % (hi - 65536, lo - 65536)
    return "\\u%d ?" % (o if o < 32768 else o - 65536)


def _emit_text(s: str) -> str:
    return "".join(_esc(c) for c in s)


def build_rtf(paragraphs: list[str], rng: random.Random) -> tuple[bytes, str]:
    """Serialize paragraphs into one RTF stream. Returns (payload,
    golden_text) where the golden is the paragraph content joined by the
    separators THIS serialization chose — composed from the input, never
    parsed back out of the payload."""
    parts = [r"{\rtf1\ansi\ansicpg1252\uc1\deff0"]
    parts.append(r"{\fonttbl{\f0\fswiss\fcharset0 Arial;}"
                 r"{\f1\froman Times New Roman;}}")
    parts.append(r"{\colortbl ;\red255\green0\blue0;}")
    if rng.random() < 0.7:
        parts.append(r"{\*\generator idp fixtures 1.0;}")
    if rng.random() < 0.3:
        parts.append(r"{\info{\title not document text}}")
    if rng.random() < 0.25:
        parts.append(r"{\pict\wmetafile8 0102030405060708090a}")
    golden_paras = []
    for p in paragraphs:
        toks = p.split(" ")
        body = []
        for t in toks:
            e = _emit_text(t)
            r = rng.random()
            if r < 0.15:
                body.append("{\\b %s}" % e)          # bold group
            elif r < 0.22:
                body.append("{\\f1\\fs28 %s}" % e)   # font/size group
            else:
                body.append(e)
        use_tab = rng.random() < 0.1
        parts.append(("\\tab " if use_tab else " ").join(body) + "\\par")
        golden_paras.append(("\t" if use_tab else " ").join(toks))
    parts.append("}")
    # raw newlines between parts are ignorable per spec (and terminate
    # any pending control word, as real writers rely on)
    return "\n".join(parts).encode("ascii"), "\n".join(golden_paras)


def gen_rtf_docs(n: int = 110) -> list[dict]:
    rng = random.Random(0x52544601)
    out = []
    for i in range(n):
        if i % 11 == 10:
            # corrupt family: truncated / unbalanced / bad hex
            kind_raw = i % 3
            if kind_raw == 0:
                payload = b"{\\rtf1 truncated stream with no close"
            elif kind_raw == 1:
                payload = b"{\\rtf1 {\\b nested open}"[:-1]  # drop a '}'
            else:
                payload = b"{\\rtf1 bad \\'zz escape}"
            out.append({
                "doc_id": i,
                "url": f"https://files.example/r/{i}.rtf",
                "payload": payload,
                "kind": "error",
                "extracted_text": "",
            })
            continue
        n_paras = 1 + rng.randrange(4)
        paras = []
        for _ in range(n_paras):
            k = 3 + rng.randrange(9)
            words = [WORDS[rng.randrange(len(WORDS))] for _ in range(k)]
            if rng.random() < 0.2:
                words.append(ASTRAL[rng.randrange(len(ASTRAL))])
            if rng.random() < 0.2:
                words.append("{braced}")
            paras.append(" ".join(words))
        payload, golden = build_rtf(paras, random.Random(0xABCD00 + i))
        out.append({
            "doc_id": i,
            "url": f"https://files.example/r/{i}.rtf",
            "payload": payload,
            "kind": "rtf",
            "extracted_text": golden,
        })
    return out
