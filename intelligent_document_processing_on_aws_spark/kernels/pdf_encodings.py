"""Simple-font /Encoding support: base encodings + /Differences arrays.

Fonts without a /ToUnicode CMap decode through their /Encoding entry
(PDF 1.7 §9.6.6): either a bare name (``/Encoding /WinAnsiEncoding``) or
a dict with optional /BaseEncoding and a /Differences array that assigns
glyph NAMES to character codes. Glyph names resolve to text via the Adobe
Glyph List convention (the public AGL + ``uniXXXX``/``uXXXX+`` forms).

The maps produced here feed the same ``(code_bytes, {code: text})``
decode path as ToUnicode CMaps (kernels/real_pdf.decode_pdf_string);
only codes that differ from the latin-1 fallback need entries.

Role-matches the reference's PyMuPDF-backed text extraction
(lib/idp_common_pkg/idp_common/ocr/service.py:1144-1252), which gets
encoding handling from the library. Pure functions over bytes; executed
only inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import re


def _codec_diff(codec: str, lo: int, hi: int) -> dict[int, str]:
    """Codes in [lo, hi] where `codec` differs from latin-1."""
    out: dict[int, str] = {}
    for code in range(lo, hi + 1):
        b = bytes([code])
        try:
            ch = b.decode(codec)
        except UnicodeDecodeError:
            continue
        if ch != b.decode("latin-1"):
            out[code] = ch
    return out


# WinAnsiEncoding is cp1252: differs from latin-1 only in 0x80-0x9F.
WINANSI_DIFF = _codec_diff("cp1252", 0x80, 0x9F)
# MacRomanEncoding differs across the whole upper half.
MACROMAN_DIFF = _codec_diff("mac_roman", 0x80, 0xFF)

# AGL subset: every non-trivial glyph name the standard Latin-text
# encodings (Standard/WinAnsi/MacRoman + common TeX subsets) use.
# Single-letter names (A-Z a-z) and uniXXXX forms resolve structurally.
GLYPH_NAMES: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # latin-1 upper half
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "acute": "´",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý", "Thorn": "Þ",
    "germandbls": "ß", "agrave": "à", "aacute": "á",
    "acircumflex": "â", "atilde": "ã", "adieresis": "ä",
    "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê",
    "edieresis": "ë", "igrave": "ì", "iacute": "í",
    "icircumflex": "î", "idieresis": "ï", "eth": "ð",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "thorn": "þ", "ydieresis": "ÿ",
    # beyond latin-1: typographic set shared by WinAnsi/MacRoman/TeX
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "fraction": "⁄",
    "Euro": "€", "trademark": "™", "minus": "−",
    "florin": "ƒ", "circumflex": "ˆ", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "tilde": "˜", "hungarumlaut": "˝",
    "OE": "Œ", "oe": "œ", "Scaron": "Š",
    "scaron": "š", "Ydieresis": "Ÿ", "Zcaron": "Ž",
    "zcaron": "ž", "dotlessi": "ı", "Lslash": "Ł",
    "lslash": "ł", "fi": "ﬁ", "fl": "ﬂ",
    "apple": "",
}

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4})$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_text(name: str) -> str | None:
    """One AGL glyph name -> text, or None for an unknown name."""
    if len(name) == 1:
        return name  # single-char names stand for themselves (AGL rule)
    hit = GLYPH_NAMES.get(name)
    if hit is not None:
        return hit
    m = _UNI_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _U_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        return chr(cp) if cp <= 0x10FFFF else None
    return None


_DIFF_TOKEN = re.compile(rb"(\d+)|/([^\s/\[\]<>()]+)")


def parse_encoding(enc: bytes) -> dict[int, str] | None:
    """A font's /Encoding VALUE bytes -> {code: text} map (codes that
    differ from latin-1 only), or None when nothing differs.

    `enc` is either a bare name token (``/WinAnsiEncoding``) or the body
    of the encoding dict (``/BaseEncoding``, ``/Differences [...]``).
    StandardEncoding's printable ASCII agrees with latin-1, so it (and an
    absent BaseEncoding) contributes no base entries.
    """
    mapping: dict[int, str] = {}
    if re.search(rb"/WinAnsiEncoding\b", enc):
        mapping.update(WINANSI_DIFF)
    elif re.search(rb"/MacRomanEncoding\b", enc):
        mapping.update(MACROMAN_DIFF)
    m = re.search(rb"/Differences\s*\[", enc)
    if m:
        # names cannot contain brackets; Differences arrays do not nest
        end = enc.find(b"]", m.end())
        body = enc[m.end():end if end != -1 else len(enc)]
        code = 0
        for num, name in _DIFF_TOKEN.findall(body):
            if num:
                code = int(num)
                continue
            text = glyph_to_text(name.decode("latin-1"))
            if text is not None and text != bytes([code & 0xFF]).decode("latin-1"):
                mapping[code] = text
            elif text is None:
                # unknown glyph name: drop any base-encoding entry so the
                # code falls back to latin-1 rather than a wrong glyph
                mapping.pop(code, None)
            else:
                mapping.pop(code, None)  # name agrees with latin-1
            code += 1
    return mapping or None
