"""From-scratch RTF 1.x text extraction (stdlib only).

The Rich Text Format is the remaining legacy word-processor format a web
crawl surfaces after .doc/.docx: a printable-ASCII stream of ``{...}``
groups and ``\\control`` words (public spec: Microsoft RTF 1.9.1). This
kernel walks the group stack once, skips non-content destinations
(font/color/style tables, pictures, metadata), and decodes the three
escape families into text:

- ``\\'hh``  — code-page byte (``\\ansicpgN`` selects it; default cp1252),
- ``\\uN``   — signed 16-bit Unicode scalar, followed by the group's
  current ``\\ucN`` count of fallback characters to skip,
- ``\\binN`` — raw binary run (skipped whole, never decoded).

Reference scope: GenAIIDP's converter matrix (document_converter.py)
routes by extension and has no RTF branch at all — this kernel is
beyond-reference format coverage, same contract as xls_biff/doc_word:
pure bytes -> text, loud RtfError on malformed input (the extraction
dispatcher degrades it to the error column).
"""

from __future__ import annotations


class RtfError(ValueError):
    """Malformed RTF — surfaced to the extraction error column."""


# destinations whose content is never document text
_SKIP_DESTS = frozenset((
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "xe", "tc", "comment",
    "ftnsep", "ftnsepc", "themedata", "colorschememapping",
    "generator", "listtable", "listoverridetable", "latentstyles",
    "datastore", "rsidtbl",
))

# control words that emit a literal character
_CHAR_WORDS = {
    "par": "\n", "line": "\n", "sect": "\n", "page": "\n",
    "tab": "\t", "cell": "\t", "row": "\n",
    "emdash": "—", "endash": "–",
    "lquote": "‘", "rquote": "’",
    "ldblquote": "“", "rdblquote": "”",
    "bullet": "•", "emspace": " ", "enspace": " ", "qmspace": " ",
    "~": " ", "-": "", "_": "‑",
}


def rtf_to_text(data: bytes) -> str:
    """Extract document text from RTF bytes (see module docstring)."""
    if not data.startswith(b"{\\rtf"):
        raise RtfError("not an RTF stream (missing {\\rtf header)")
    codepage = "cp1252"
    out: list[str] = []
    # group state: (skipping, uc_count)
    stack: list[tuple[bool, int]] = []
    skipping, uc = False, 1
    pending_uc_skip = 0
    i, n = 0, len(data)
    while i < n:
        c = data[i:i + 1]
        if c == b"{":
            stack.append((skipping, uc))
            i += 1
            continue
        if c == b"}":
            if not stack:
                raise RtfError("unbalanced closing brace")
            skipping, uc = stack.pop()
            i += 1
            continue
        if c != b"\\":
            i += 1
            if c in (b"\r", b"\n"):
                continue                     # raw newlines are ignorable
            if pending_uc_skip:
                pending_uc_skip -= 1
                continue
            if not skipping:
                out.append(c.decode("latin-1"))
            continue
        # --- control symbol / word ---
        i += 1
        if i >= n:
            raise RtfError("dangling backslash at end of stream")
        sym = data[i:i + 1]
        if sym == b"'":                       # \'hh code-page byte
            hexpair = data[i + 1:i + 3]
            if len(hexpair) != 2:
                raise RtfError("truncated \\'hh escape")
            try:
                byte = bytes([int(hexpair, 16)])
            except ValueError as e:
                raise RtfError(f"bad hex escape {hexpair!r}") from e
            i += 3
            if pending_uc_skip:
                pending_uc_skip -= 1
            elif not skipping:
                out.append(byte.decode(codepage, errors="replace"))
            continue
        if not sym.isalpha():
            # control symbol: one char (\{ \} \\ \~ \- \_ \* ...)
            i += 1
            if sym == b"*":
                skipping = True               # \* destinations are skippable
            elif not skipping:
                ch = sym.decode("latin-1")
                if ch in "{}\\":
                    out.append(ch)
                else:
                    out.append(_CHAR_WORDS.get(ch, ""))
            continue
        # control word: letters then optional signed number then one space
        j = i
        while j < n and data[j:j + 1].isalpha():
            j += 1
        word = data[i:j].decode("ascii")
        k = j
        if k < n and data[k:k + 1] in (b"-",) or (k < n and data[k:k + 1].isdigit()):
            k += 1
            while k < n and data[k:k + 1].isdigit():
                k += 1
        param_s = data[j:k].decode("ascii")
        param = int(param_s) if param_s not in ("", "-") else None
        if k < n and data[k:k + 1] == b" ":
            k += 1                            # the delimiting space is eaten
        i = k
        if word == "bin":
            i += max(param or 0, 0)           # raw bytes, never text
            continue
        if word == "ansicpg" and param:
            try:
                b"\x41".decode(f"cp{param}")
                codepage = f"cp{param}"
            except LookupError:
                pass                          # unknown page: keep cp1252
            continue
        if word == "uc":
            uc = max(param or 0, 0)
            continue
        if word == "u" and param is not None:
            if pending_uc_skip:
                pending_uc_skip -= 1
            elif not skipping:
                out.append(chr(param + 0x10000 if param < 0 else param))
                pending_uc_skip = uc
            continue
        if word in _SKIP_DESTS:
            skipping = True
            continue
        if not skipping and word in _CHAR_WORDS:
            out.append(_CHAR_WORDS[word])
        # every other control word is formatting — contributes no text
    if stack:
        raise RtfError("unbalanced opening brace")
    text = _combine_surrogates("".join(out))
    # collapse the trailing \par every writer emits
    return text.rstrip("\n")


def _combine_surrogates(s: str) -> str:
    """Writers emit astral characters as two \\uN escapes carrying a
    UTF-16 surrogate pair; pair them back into one scalar (lone
    surrogates become U+FFFD — they are unencodable in UTF-8 and would
    poison the Arrow/parquet sink otherwise)."""
    if not any("\ud800" <= c <= "\udfff" for c in s):
        return s
    outp: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if "\ud800" <= c <= "\udbff" and i + 1 < len(s) \
                and "\udc00" <= s[i + 1] <= "\udfff":
            hi, lo = ord(c), ord(s[i + 1])
            outp.append(chr(0x10000 + ((hi - 0xD800) << 10) + (lo - 0xDC00)))
            i += 2
            continue
        outp.append("�" if "\ud800" <= c <= "\udfff" else c)
        i += 1
    return "".join(outp)
