"""Charset sniffing + transcoding for raw web payloads.

A Common-Crawl-style corpus is NOT uniformly UTF-8: roughly a fifth of
the live web still serves windows-1252/legacy-encoded bytes, usually with
a (sometimes wrong) ``<meta charset>`` declaration. Before any text
operator can run, raw ``html: binary`` must be decoded by the standard
sniff chain (the WHATWG encoding sniff that browsers implement, which is
also what CCNet/jusText-style pipelines reimplement). From scratch,
stdlib-only; no chardet.

Chain — first hit wins:

1. **BOM** (UTF-32 LE/BE checked before UTF-16 LE/BE — the UTF-32-LE BOM
   is a strict prefix-collision with UTF-16-LE's), decoded strictly; a
   corrupt body falls through.
2. **Declared**: ``<meta charset=...>`` / ``<meta http-equiv
   content="...; charset=...">`` / ``<?xml encoding="..."?>`` within the
   first ``SNIFF_LIMIT`` bytes, scanned on a latin-1 view (declarations
   are only honored for ASCII-compatible supersets, per WHATWG). Labels
   are normalized through the WHATWG alias registry subset below — in
   particular ``iso-8859-1``/``latin1``/``ascii`` → **windows-1252**
   (the spec's deliberate mapping: sites that declare latin-1
   overwhelmingly emit 1252 bytes). An unknown label or a strict-decode
   failure falls through.
3. **BOM-less UTF-16 heuristic**: ASCII-heavy UTF-16 text puts NUL in
   every other byte; strongly one-sided NUL parity picks LE/BE. This
   MUST run before the UTF-8 attempt — NUL is a *valid* UTF-8 codepoint,
   so BOM-less UTF-16-LE ASCII bytes strict-decode "successfully" as
   NUL-riddled UTF-8. No real UTF-8 text is >40% NUL on one byte parity,
   so the early heuristic cannot steal genuine UTF-8 pages.
4. **Strict UTF-8**.
5. **windows-1252 total fallback** — never fails. Per WHATWG, the five
   bytes cp1252 leaves undefined (81 8D 8F 90 9D) decode to the
   corresponding C1 controls.

Reference parity note: the reference pipeline only ever attempts strict
UTF-8 (ocr/service.py:1632-1678 decode fallback); this kernel extends
that to the real encoding distribution of a web crawl.
"""

from __future__ import annotations

import codecs
import re
from dataclasses import dataclass

SNIFF_LIMIT = 1024

# Order matters: UTF-32-LE BOM (FF FE 00 00) starts with the UTF-16-LE
# BOM (FF FE).
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# WHATWG encoding-registry subset: label -> canonical name (also a valid
# Python codec name, except windows-1252 which gets the total decoder).
_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "iso-8859-1": "windows-1252",
    "iso8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "l1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "iso-8859-2": "iso-8859-2", "iso8859-2": "iso-8859-2",
    "latin2": "iso-8859-2",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8_r": "koi8-r",
    # utf-16 labels intentionally ABSENT: per WHATWG, a DECLARED
    # utf-16/utf-16le/utf-16be label must not trigger a UTF-16 decode
    # (the prescan maps those labels to UTF-8) — UTF-16-LE decode of an
    # 8-bit page almost never fails, so honoring the label turned any
    # page lying `<meta charset=utf-16>` into silent CJK mojibake.
    # Real UTF-16 is caught by the BOM and NUL-parity steps.
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
    "euc-jp": "euc-jp", "euc_jp": "euc-jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "x-gbk": "gbk",
    "big5": "big5", "big5-hkscs": "big5",
}

# `charset = label` inside a <meta ...> tag — covers both the HTML5 form
# (<meta charset=x>) and the legacy http-equiv form (charset=x inside the
# content attribute). The XML declaration only honors a quoted value.
_META_CHARSET_RE = re.compile(
    r"<meta[^>]{0,200}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9._\-]+)", re.I
)
_XML_DECL_RE = re.compile(
    r"<\?xml[^>]{0,200}?encoding\s*=\s*[\"']([a-zA-Z0-9._\-]+)[\"']", re.I
)

# windows-1252 per WHATWG: latin-1 view + translate the 0x80-0x9F block.
# The translate table is C-speed and total (the five cp1252 holes keep
# their C1 control interpretation via the latin-1 base decode).
_W1252_TRANSLATE = {}
for _b in range(0x80, 0xA0):
    try:
        _W1252_TRANSLATE[_b] = ord(bytes([_b]).decode("cp1252"))
    except UnicodeDecodeError:
        pass  # hole byte -> stays the latin-1 C1 control


def decode_windows1252(raw: bytes) -> str:
    """Total WHATWG windows-1252 decode (never raises)."""
    return raw.decode("latin-1").translate(_W1252_TRANSLATE)


@dataclass
class SniffResult:
    encoding: str  # canonical label, e.g. "utf-8", "windows-1252"
    source: str    # "bom" | "declared" | "utf-8" | "utf-16-heuristic" | "fallback"
    text: str


def _declared_label(raw: bytes) -> str | None:
    head = raw[:SNIFF_LIMIT].decode("latin-1")
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    return m.group(1).lower() if m else None


def _utf16_parity(raw: bytes) -> str | None:
    """BOM-less UTF-16 NUL-parity heuristic over the sniff window."""
    win = raw[: SNIFF_LIMIT & ~1]
    if len(win) < 16:
        return None
    odd = win[1::2].count(0)
    even = win[0::2].count(0)
    half = len(win) // 2
    if odd > 0.40 * half and even <= 0.05 * half:
        return "utf-16-le"  # ASCII code units: low byte first
    if even > 0.40 * half and odd <= 0.05 * half:
        return "utf-16-be"
    return None


def sniff_decode(raw: bytes) -> SniffResult:
    """Run the full sniff chain. Total: always returns decoded text."""
    if not raw:
        return SniffResult("utf-8", "utf-8", "")

    # 1. BOM
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            try:
                return SniffResult(enc, "bom", raw[len(bom):].decode(enc))
            except UnicodeDecodeError:
                break  # corrupt body under the BOM: fall through the chain

    # 2. declared <meta>/<?xml ...?> label
    label = _declared_label(raw)
    if label is not None:
        enc = _ALIASES.get(label)
        if enc == "windows-1252":
            return SniffResult(enc, "declared", decode_windows1252(raw))
        if enc is not None:
            try:
                return SniffResult(enc, "declared", raw.decode(enc))
            except UnicodeDecodeError:
                pass  # lying declaration: fall through

    # 3. BOM-less UTF-16 parity (before UTF-8: NUL is valid UTF-8, so
    # UTF-16-LE ASCII would otherwise "succeed" as mojibake UTF-8)
    enc = _utf16_parity(raw)
    if enc is not None:
        try:
            return SniffResult(enc, "utf-16-heuristic", raw.decode(enc))
        except UnicodeDecodeError:
            pass

    # 4. strict UTF-8
    try:
        return SniffResult("utf-8", "utf-8", raw.decode("utf-8"))
    except UnicodeDecodeError:
        pass

    # 5. total windows-1252 fallback
    return SniffResult("windows-1252", "fallback", decode_windows1252(raw))
