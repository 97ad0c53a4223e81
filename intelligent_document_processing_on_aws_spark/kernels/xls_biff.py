"""Legacy binary Excel (.xls, BIFF8) decoder — stdlib only, from scratch.

Two public specs, both implemented independently here:

- MS-CFB (compound file binary / OLE2): sector FAT + DIFAT, directory
  tree, mini-FAT/mini-stream for streams below the 4096-byte cutoff.
- MS-XLS (BIFF8): workbook globals substream (BOUNDSHEET / SST with
  CONTINUE splitting / FORMAT / XF / DATEMODE) and per-sheet cell record
  substreams (LABELSST, NUMBER, RK, MULRK, LABEL, BOOLERR, FORMULA with
  cached results + STRING, BLANK).

Parity target: the reference reads .xls via pandas/xlrd
(lib/idp_common_pkg/idp_common/document_converter.py:164-221) and renders
the same per-sheet markdown as xlsx — this module normalizes BIFF cells
to the exact string shapes the OOXML path produces (date serials ->
'%Y-%m-%d' via the shared office._serial_to_date, numbers in canonical
int/repr form) and reuses office.sheets_to_markdown for rendering, so
.xls and .xlsx of the same data produce byte-identical markdown.
"""

from __future__ import annotations

import struct

from .boilerplate import ExtractionResult
from .office import (
    _DATE_NUMFMT_IDS,
    _is_date_format_code,
    _serial_to_date,
    sheets_to_markdown,
)

XLS_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF

# BIFF8 built-in date/time ifmt ids (MS-XLS §2.4.126): 14-22 dates/times,
# 27-36 and 50-58 era/locale date variants, 45-47 times
_BIFF_DATE_IFMTS = (
    _DATE_NUMFMT_IDS | frozenset(range(27, 37)) | frozenset(range(50, 59))
)


class XlsError(ValueError):
    """Structurally invalid CFB container or BIFF stream."""


# ---------------------------------------------------------------------------
# MS-CFB container
# ---------------------------------------------------------------------------


def _u32s(data: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(data) // 4}I", data[: len(data) // 4 * 4]))


def _read_chain(payload: bytes, fat: list[int], start: int,
                sect_size: int) -> bytes:
    out = bytearray()
    sect = start
    seen = 0
    cap = len(fat) + 2
    while sect != _ENDOFCHAIN:
        if sect >= len(fat) or seen > cap:
            raise XlsError("broken FAT chain")
        off = (sect + 1) * sect_size
        out += payload[off:off + sect_size]
        sect = fat[sect]
        seen += 1
    return bytes(out)


def cfb_stream_names(payload: bytes) -> list[str]:
    """Stream (type-2) entry names in the CFB directory — the cheap probe
    the legacy-office dispatcher uses to route Workbook vs WordDocument."""
    return [e[0] for e in _cfb_parse(payload)[0] if e[1] == 2]


def cfb_stream(payload: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """The named stream's bytes from a CFB file (first name that exists).

    Follows the spec shapes that matter in the wild: header DIFAT + DIFAT
    chain sectors, FAT chains for large streams, mini-FAT over the root
    entry's mini stream for streams under the cutoff."""
    entries, ctx = _cfb_parse(payload)
    payload_, fat, sect_size, mini_size, mini_cutoff, mini_stream, minifat = ctx
    for want in names:
        e = next((e for e in entries if e[1] == 2 and e[0] == want), None)
        if e is None:
            continue
        _, _, start, size = e
        if size < mini_cutoff:
            out = bytearray()
            sect = start
            seen = 0
            while sect != _ENDOFCHAIN:
                if sect >= len(minifat) or seen > len(minifat) + 2:
                    raise XlsError("broken mini-FAT chain")
                out += mini_stream[sect * mini_size:(sect + 1) * mini_size]
                sect = minifat[sect]
                seen += 1
            return bytes(out[:size])
        return _read_chain(payload, fat, start, sect_size)[:size]
    raise XlsError(f"no {'/'.join(names)} stream")


def _cfb_parse(payload: bytes):
    """Parse container structure once: (directory entries, context)."""
    if not payload.startswith(XLS_MAGIC) or len(payload) < 512:
        raise XlsError("not a CFB file")
    sector_shift = struct.unpack_from("<H", payload, 30)[0]
    if not 6 <= sector_shift <= 16:
        raise XlsError("bad sector shift")
    sect_size = 1 << sector_shift
    mini_shift = struct.unpack_from("<H", payload, 32)[0]
    mini_size = 1 << mini_shift
    first_dir = struct.unpack_from("<I", payload, 48)[0]
    mini_cutoff = struct.unpack_from("<I", payload, 56)[0]
    first_minifat = struct.unpack_from("<I", payload, 60)[0]
    first_difat = struct.unpack_from("<I", payload, 68)[0]
    n_difat = struct.unpack_from("<I", payload, 72)[0]

    fat_sects = [s for s in _u32s(payload[76:512]) if s != _FREESECT]
    sect = first_difat
    for _ in range(n_difat):
        if sect in (_ENDOFCHAIN, _FREESECT):
            break
        off = (sect + 1) * sect_size
        entries = _u32s(payload[off:off + sect_size])
        fat_sects += [s for s in entries[:-1] if s != _FREESECT]
        sect = entries[-1]

    fat: list[int] = []
    for s in fat_sects:
        off = (s + 1) * sect_size
        fat += _u32s(payload[off:off + sect_size])

    directory = _read_chain(payload, fat, first_dir, sect_size)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        name_len = struct.unpack_from("<H", directory, off + 64)[0]
        obj_type = directory[off + 66]
        if obj_type not in (2, 5) or not 2 <= name_len <= 64:
            continue
        name = directory[off:off + name_len - 2].decode("utf-16-le", "replace")
        start = struct.unpack_from("<I", directory, off + 116)[0]
        size = struct.unpack_from("<Q", directory, off + 120)[0]
        entries.append((name, obj_type, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise XlsError("no CFB root entry")
    mini_stream = _read_chain(payload, fat, root[2], sect_size)[: root[3]] \
        if root[2] != _ENDOFCHAIN else b""
    minifat = _u32s(_read_chain(payload, fat, first_minifat, sect_size)) \
        if first_minifat not in (_ENDOFCHAIN, _FREESECT) else []

    ctx = (payload, fat, sect_size, mini_size, mini_cutoff,
           mini_stream, minifat)
    return entries, ctx


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------


def _records(stream: bytes, start: int):
    """Yield (opcode, payload, offset) from ``start`` to the matching EOF."""
    pos = start
    depth = 0
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        payload = stream[pos + 4:pos + 4 + ln]
        yield op, payload, pos
        pos += 4 + ln
        if op == 0x0809:  # BOF
            depth += 1
        elif op == 0x000A:  # EOF
            depth -= 1
            if depth <= 0:
                return


class _SSTCursor:
    """Byte cursor over SST + CONTINUE payload fragments.

    The BIFF8 continuation rule this encodes: when a string's CHARACTER
    DATA crosses into a CONTINUE record, the continue starts with a fresh
    option-flags byte (the writer may re-compress); breaks between
    strings or inside non-character payload carry no flags byte."""

    def __init__(self, frags: list[bytes]):
        self.frags = frags
        self.fi = 0
        self.off = 0

    def _advance(self) -> None:
        while self.fi < len(self.frags) and self.off >= len(self.frags[self.fi]):
            self.fi += 1
            self.off = 0

    def eof(self) -> bool:
        self._advance()
        return self.fi >= len(self.frags)

    def take(self, n: int) -> bytes:
        """n raw bytes, spanning fragments with NO flag semantics."""
        out = bytearray()
        while n > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise XlsError("SST truncated")
            frag = self.frags[self.fi]
            k = min(n, len(frag) - self.off)
            out += frag[self.off:self.off + k]
            self.off += k
            n -= k
        return bytes(out)

    def take_chars(self, cch: int, high: bool, expect_flag: bool) -> str:
        """cch characters; every CONTINUE record that begins with character
        data starts with a fresh compression-flags byte (the rule above).
        expect_flag: the header ended exactly at a fragment boundary, so
        the FIRST chars already sit at the start of a continuation."""
        out: list[str] = []
        pending_flag = expect_flag
        while cch > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise XlsError("SST string truncated")
            if self.off == 0 and (pending_flag or out):
                high = bool(self.frags[self.fi][0] & 1)
                self.off = 1
                pending_flag = False
            frag = self.frags[self.fi]
            avail = len(frag) - self.off
            width = 2 if high else 1
            k = min(cch, avail // width)
            if k == 0:
                if avail:
                    raise XlsError("SST char split inside a code unit")
                self.off = len(frag)
                continue
            raw = frag[self.off:self.off + k * width]
            out.append(raw.decode("utf-16-le" if high else "latin-1", "replace"))
            self.off += k * width
            cch -= k
        return "".join(out)


def _parse_xl_unicode(cur: _SSTCursor) -> str:
    cch, flags = struct.unpack("<HB", cur.take(3))
    high = bool(flags & 1)
    n_runs = struct.unpack("<H", cur.take(2))[0] if flags & 8 else 0
    cb_ext = struct.unpack("<I", cur.take(4))[0] if flags & 4 else 0
    cur._advance()
    at_fragment_start = cch > 0 and cur.off == 0 and cur.fi > 0
    s = cur.take_chars(cch, high, expect_flag=at_fragment_start)
    if n_runs:
        cur.take(4 * n_runs)
    if cb_ext:
        cur.take(cb_ext)
    return s


def _parse_sst(frags: list[bytes]) -> list[str]:
    cur = _SSTCursor(frags)
    _total, unique = struct.unpack("<II", cur.take(8))
    return [_parse_xl_unicode(cur) for _ in range(unique)]


def _short_unicode(data: bytes) -> str:
    """BOUNDSHEET sheet name: u8 cch + flags + chars (no continuation)."""
    cch, flags = data[0], data[1]
    if flags & 1:
        return data[2:2 + 2 * cch].decode("utf-16-le", "replace")
    return data[2:2 + cch].decode("latin-1", "replace")


def _inline_label(data: bytes) -> str:
    """LABEL / STRING record payload tail: u16 cch + flags + chars."""
    cch, flags = struct.unpack_from("<HB", data)
    if flags & 1:
        return data[3:3 + 2 * cch].decode("utf-16-le", "replace")
    return data[3:3 + cch].decode("latin-1", "replace")


def _rk_value(rk: int) -> float:
    v: float
    if rk & 2:  # 30-bit signed integer
        signed = rk - (1 << 32) if rk & 0x80000000 else rk
        v = float(signed >> 2)
    else:  # top 30 bits of an IEEE double
        v = struct.unpack("<d", b"\0\0\0\0" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if rk & 1 else v


def _num_str(v: float) -> str:
    """Canonical numeric string, matching what OOXML <v> text carries for
    the same value: integral -> int form, else shortest round-trip."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


_BOOL_STR = {0: "FALSE", 1: "TRUE"}


def xls_to_sheets(payload: bytes) -> dict[str, list[list[str]]]:
    """(sheet name -> rows of cell strings), BOUNDSHEET order, cells at
    their true column positions with "" gap padding and fully-empty rows
    dropped — the same normalized shape xlsx_to_sheets produces."""
    wb = cfb_stream(payload)
    boundsheets: list[tuple[int, str]] = []
    sst: list[str] = []
    date_ifmts = set(_BIFF_DATE_IFMTS)
    xf_ifmts: list[int] = []
    date_1904 = False

    sst_frags: list[bytes] | None = None
    for op, data, _off in _records(wb, 0):
        if op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack_from("<I", data)[0]
            boundsheets.append((pos, _short_unicode(data[6:])))
        elif op == 0x00FC:  # SST
            sst_frags = [data]
        elif op == 0x003C and sst_frags is not None:  # CONTINUE (of SST)
            sst_frags.append(data)
        elif op == 0x041E:  # FORMAT
            ifmt = struct.unpack_from("<H", data)[0]
            if _is_date_format_code(_inline_label(data[2:])):
                date_ifmts.add(ifmt)
        elif op == 0x00E0:  # XF (cell + style XFs, in file order)
            xf_ifmts.append(struct.unpack_from("<H", data, 2)[0])
        elif op == 0x0022:  # DATEMODE
            date_1904 = bool(struct.unpack_from("<H", data)[0])
        if op not in (0x00FC, 0x003C) and sst_frags is not None:
            # a non-CONTINUE record ends the SST fragment run
            sst = _parse_sst(sst_frags)
            sst_frags = None
    if sst_frags is not None:
        sst = _parse_sst(sst_frags)

    def cell_str(v: float, xf: int) -> str:
        if xf < len(xf_ifmts) and xf_ifmts[xf] in date_ifmts:
            serial = v + 1462 if date_1904 else v
            try:
                return _serial_to_date(str(serial))
            except (ValueError, OverflowError):
                return _num_str(v)
        return _num_str(v)

    sheets: dict[str, list[list[str]]] = {}
    for pos, name in boundsheets:
        cells: dict[tuple[int, int], str] = {}
        pending_formula: tuple[int, int] | None = None
        for op, data, _off in _records(wb, pos):
            if op == 0x00FD:  # LABELSST
                r, c, _xf, isst = struct.unpack_from("<HHHI", data)
                cells[(r, c)] = sst[isst] if isst < len(sst) else ""
            elif op == 0x0203:  # NUMBER
                r, c, xf = struct.unpack_from("<HHH", data)
                cells[(r, c)] = cell_str(struct.unpack_from("<d", data, 6)[0], xf)
            elif op == 0x027E:  # RK
                r, c, xf, rk = struct.unpack_from("<HHHI", data)
                cells[(r, c)] = cell_str(_rk_value(rk), xf)
            elif op == 0x00BD:  # MULRK
                r, c0 = struct.unpack_from("<HH", data)
                body = data[4:-2]
                for i in range(len(body) // 6):
                    xf, rk = struct.unpack_from("<HI", body, i * 6)
                    cells[(r, c0 + i)] = cell_str(_rk_value(rk), xf)
            elif op == 0x0204:  # LABEL (inline string)
                r, c, _xf = struct.unpack_from("<HHH", data)
                cells[(r, c)] = _inline_label(data[6:])
            elif op == 0x0205:  # BOOLERR
                r, c, _xf = struct.unpack_from("<HHH", data)
                val, is_err = data[6], data[7]
                cells[(r, c)] = "" if is_err else _BOOL_STR.get(val, "")
            elif op == 0x0006:  # FORMULA (cached result)
                r, c, xf = struct.unpack_from("<HHH", data)
                tail = data[6:14]
                if tail[6:8] == b"\xff\xff":
                    if tail[0] == 0:      # string: value in STRING record
                        pending_formula = (r, c)
                        cells[(r, c)] = ""
                    elif tail[0] == 1:    # boolean
                        cells[(r, c)] = _BOOL_STR.get(tail[2], "")
                    else:                 # error / empty string
                        cells[(r, c)] = ""
                else:
                    cells[(r, c)] = cell_str(struct.unpack("<d", tail)[0], xf)
            elif op == 0x0207 and pending_formula is not None:  # STRING
                cells[pending_formula] = _inline_label(data)
                pending_formula = None
        rows: list[list[str]] = []
        if cells:
            by_row: dict[int, dict[int, str]] = {}
            for (r, c), v in cells.items():
                by_row.setdefault(r, {})[c] = v
            for r in sorted(by_row):
                row_cells = by_row[r]
                width = max(row_cells) + 1
                row = [row_cells.get(c, "") for c in range(width)]
                if any(x != "" for x in row):
                    rows.append(row)
        sheets[name] = rows
    return sheets


def xls_to_markdown(payload: bytes) -> str:
    return sheets_to_markdown(xls_to_sheets(payload))


def extract_xls(payload: bytes) -> ExtractionResult:
    from .office import _result_from_parts

    md = xls_to_markdown(payload)
    parts = md.split("\n\n") if md else []
    return _result_from_parts(parts, "\n\n")
