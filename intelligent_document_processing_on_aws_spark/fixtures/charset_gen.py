"""Charset-sniff fixtures + independent goldens.

Each record is a full HTML page composed as a Python ``str`` first, then
encoded by the byte-layout rules of its family (BOM, declared legacy
codec, raw 1252, BOM-less UTF-16, ...). The golden columns are the
*composition facts* — the original string, its length, and the
(encoding, source) the sniff chain is SPECIFIED to land on for that
family — never the output of running kernels/charset back over the
bytes. Families were chosen so each step of the chain, each precedence
rule (BOM beats a lying meta; an unknown label falls through), and the
WHATWG latin-1→windows-1252 alias mapping has dedicated coverage.

Determinism: record i derives entirely from ``random.Random(f"charset-{i}-42")``.
"""

from __future__ import annotations

import random

WORDS = ("the data stream report quarterly revenue market system people "
         "window vector column value order group channel network").split()

# per-family extra character pools (each encodable in that family's codec)
W1252_EXTRA = "café résumé naïve Zürich €—“”•"          # cp1252-only above ASCII
KOI8_EXTRA = "текст данные отчёт система"
SJIS_EXTRA = "日本語テキスト文書"
GBK_EXTRA = "中文数据文档系统"
UNI_EXTRA = "café 中文 текст ελληνικά 😀"                 # needs a UTF

FAMILIES = (
    "utf8_plain",            # no BOM, no decl, multibyte body -> strict UTF-8
    "utf8_bom",              # BOM step
    "utf16le_bom",
    "utf16be_bom",
    "utf32le_bom",
    "meta_w1252",            # declared windows-1252
    "meta_latin1_alias",     # declared iso-8859-1 -> WHATWG maps to 1252
    "xmldecl_koi8",          # <?xml encoding="koi8-r"?>
    "meta_sjis",             # multibyte legacy east-asian
    "meta_gbk",
    "bom_beats_meta",        # UTF-8 BOM + lying iso-8859-1 meta -> BOM wins
    "raw_w1252_fallback",    # no decl, invalid-UTF-8 1252 bytes -> step 5
    "utf16le_heuristic",     # BOM-less UTF-16-LE -> NUL-parity step
    "unknown_label_utf8",    # meta charset="x-klingon" falls through to UTF-8
)


def _sentence(rng: random.Random, n: int, extra: str) -> str:
    toks = [rng.choice(WORDS) for _ in range(n)]
    if extra:
        pool = extra.split() if " " in extra else list(extra)
        for _ in range(1 + rng.randrange(3)):
            toks.insert(rng.randrange(len(toks) + 1), rng.choice(pool))
    return " ".join(toks)


def _page_html(rng: random.Random, extra: str, head_extra: str = "") -> str:
    paras = "".join(
        f"<p>{_sentence(rng, 6 + rng.randrange(10), extra)}</p>"
        for _ in range(2 + rng.randrange(4))
    )
    title = _sentence(rng, 3, "")
    return (f"<html><head>{head_extra}<title>{title}</title></head>"
            f"<body>{paras}</body></html>")


def gen_record(i: int) -> dict:
    rng = random.Random(f"charset-{i}-42")
    family = FAMILIES[i % len(FAMILIES)]

    if family == "utf8_plain":
        html = _page_html(rng, UNI_EXTRA)
        raw, enc, src = html.encode("utf-8"), "utf-8", "utf-8"
    elif family == "utf8_bom":
        html = _page_html(rng, UNI_EXTRA)
        raw, enc, src = b"\xef\xbb\xbf" + html.encode("utf-8"), "utf-8", "bom"
    elif family == "utf16le_bom":
        html = _page_html(rng, UNI_EXTRA.replace(" 😀", ""))
        raw, enc, src = b"\xff\xfe" + html.encode("utf-16-le"), "utf-16-le", "bom"
    elif family == "utf16be_bom":
        html = _page_html(rng, UNI_EXTRA.replace(" 😀", ""))
        raw, enc, src = b"\xfe\xff" + html.encode("utf-16-be"), "utf-16-be", "bom"
    elif family == "utf32le_bom":
        html = _page_html(rng, UNI_EXTRA)
        raw = b"\xff\xfe\x00\x00" + html.encode("utf-32-le")
        enc, src = "utf-32-le", "bom"
    elif family == "meta_w1252":
        html = _page_html(rng, W1252_EXTRA,
                          head_extra='<meta charset="windows-1252">')
        raw, enc, src = html.encode("cp1252"), "windows-1252", "declared"
    elif family == "meta_latin1_alias":
        # declares latin-1 but (like the real web) emits cp1252 bytes —
        # the exact case the WHATWG alias mapping exists for
        head = ('<meta http-equiv="Content-Type" '
                'content="text/html; charset=iso-8859-1">')
        html = _page_html(rng, W1252_EXTRA, head_extra=head)
        raw, enc, src = html.encode("cp1252"), "windows-1252", "declared"
    elif family == "xmldecl_koi8":
        body = _page_html(rng, KOI8_EXTRA)
        html = '<?xml version="1.0" encoding="koi8-r"?>' + body
        raw, enc, src = html.encode("koi8-r"), "koi8-r", "declared"
    elif family == "meta_sjis":
        html = _page_html(rng, SJIS_EXTRA,
                          head_extra="<META CHARSET=Shift_JIS>")
        raw, enc, src = html.encode("shift_jis"), "shift_jis", "declared"
    elif family == "meta_gbk":
        html = _page_html(rng, GBK_EXTRA,
                          head_extra="<meta charset='gb2312'>")
        raw, enc, src = html.encode("gbk"), "gbk", "declared"
    elif family == "bom_beats_meta":
        html = _page_html(rng, UNI_EXTRA,
                          head_extra='<meta charset="iso-8859-1">')
        raw, enc, src = b"\xef\xbb\xbf" + html.encode("utf-8"), "utf-8", "bom"
    elif family == "raw_w1252_fallback":
        html = _page_html(rng, W1252_EXTRA)
        assert any(ord(c) > 127 for c in html)
        raw, enc, src = html.encode("cp1252"), "windows-1252", "fallback"
    elif family == "utf16le_heuristic":
        html = _page_html(rng, "")  # ASCII-heavy so the NUL parity is clean
        raw, enc, src = html.encode("utf-16-le"), "utf-16-le", "utf-16-heuristic"
    elif family == "unknown_label_utf8":
        html = _page_html(rng, UNI_EXTRA,
                          head_extra='<meta charset="x-klingon-8">')
        raw, enc, src = html.encode("utf-8"), "utf-8", "utf-8"
    else:  # pragma: no cover
        raise AssertionError(family)

    return {
        "doc_id": i,
        "family": family,
        "raw": raw,
        "encoding": enc,
        "source": src,
        "n_chars": len(html),
        "text": html,
    }


def gen_charset_docs(n: int) -> list[dict]:
    return [gen_record(i) for i in range(n)]
