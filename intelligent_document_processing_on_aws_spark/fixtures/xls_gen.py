"""Genuine legacy-Excel (.xls BIFF8-in-CFB) fixtures + independent goldens.

Writes real compound-file containers (MS-CFB: FAT, DIFAT, directory,
mini-FAT/mini-stream for sub-cutoff workbooks) holding real BIFF8
workbook streams (BOUNDSHEET / SST with deliberate CONTINUE splits /
FORMAT / XF / DATEMODE / LABELSST / NUMBER / RK / MULRK / BOOLERR /
FORMULA+STRING cell records) — a from-scratch writer twin, independent
of kernels/xls_biff. The golden markdown is computed from the template
row data before serialization, so a decode bug can never self-confirm.

Reference parity: document_converter.py:164-221 (.xls via pandas/xlrd,
rendered like xlsx).
"""

from __future__ import annotations

import datetime as dt
import random
import struct

from ..kernels.tables import format_float, format_int, format_pipe_table

_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD

EXCEL_EPOCH_ORDINAL = 693594  # datetime(1899,12,30).toordinal()

# zřízení/šéf carry chars > U+00FF, forcing UTF-16 SST strings (and
# mixed-width CONTINUE re-compression); crédit/überweisung stay latin-1
WORDS = ("ledger invoice total carried audit branch north south retail "
         "wholesale quarter fiscal margin rebate freight parcel unit "
         "gross net payable crédit received überweisung zřízení šéf").split()


# ---------------------------------------------------------------------------
# CFB container writer
# ---------------------------------------------------------------------------


def _dir_entry(name: str, obj_type: int, start: int, size: int,
               child: int = _FREESECT) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0:len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = obj_type
    e[67] = 1  # black
    struct.pack_into("<I", e, 68, _FREESECT)   # left sibling
    struct.pack_into("<I", e, 72, _FREESECT)   # right sibling
    struct.pack_into("<I", e, 76, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def cfb_container(workbook: bytes, stream_name: str = "Workbook") -> bytes:
    """A v3 CFB file with one stream (see cfb_container_multi)."""
    return cfb_container_multi({stream_name: workbook})


def cfb_container_multi(streams: dict[str, bytes]) -> bytes:
    """A v3 CFB file (512-byte sectors) holding the given streams.
    Streams under the 4096-byte cutoff live in the shared mini-stream
    (64-byte mini-sectors), as the spec requires — exercising the
    reader's mini-FAT path; larger streams get FAT chains."""
    sectors: list[bytes] = []
    fat: list[int] = []

    def add_stream(data: bytes) -> int:
        if not data:
            return _ENDOFCHAIN
        start = len(sectors)
        n = (len(data) + 511) // 512
        for i in range(n):
            sectors.append(data[i * 512:(i + 1) * 512].ljust(512, b"\x00"))
            fat.append(start + i + 1 if i < n - 1 else _ENDOFCHAIN)
        return start

    # mini-stream allocation: all sub-cutoff streams share one mini
    # stream; each gets its own mini-FAT chain
    mini_stream = bytearray()
    minifat: list[int] = []
    placements: dict[str, tuple[int, bool]] = {}  # name -> (start, in_mini)
    for name, data in streams.items():
        if data and len(data) < 4096:
            n_mini = (len(data) + 63) // 64
            start = len(minifat)
            mini_stream += data.ljust(n_mini * 64, b"\x00")
            minifat += [start + i + 1 for i in range(n_mini - 1)] \
                + [_ENDOFCHAIN]
            placements[name] = (start, True)
    for name, data in streams.items():
        if name not in placements:
            placements[name] = (add_stream(data), False)
    if minifat:
        minifat_bytes = struct.pack(f"<{len(minifat)}I", *minifat)
        ms_start = add_stream(bytes(mini_stream))
        mf_start = add_stream(minifat_bytes)
        root_start, root_size = ms_start, len(mini_stream)
        n_minifat_sectors = (len(minifat_bytes) + 511) // 512
    else:
        mf_start, n_minifat_sectors = _ENDOFCHAIN, 0
        root_start, root_size = _ENDOFCHAIN, 0

    directory = _dir_entry("Root Entry", 5, root_start, root_size, child=1)
    for name, data in streams.items():
        start, _in_mini = placements[name]
        directory += _dir_entry(name, 2, start, len(data))
    while (len(directory) // 128) % 4:
        directory += bytes(128)
    dir_start = add_stream(directory)

    # FAT sectors (self-referencing entries), fixpoint on count
    n_fat = 1
    while (len(sectors) + n_fat + 127) // 128 > n_fat:
        n_fat += 1
    fat_start = len(sectors)
    full_fat = fat + [_FATSECT] * n_fat
    full_fat += [_FREESECT] * (n_fat * 128 - len(full_fat))
    fat_bytes = struct.pack(f"<{len(full_fat)}I", *full_fat)
    for i in range(n_fat):
        sectors.append(fat_bytes[i * 512:(i + 1) * 512])

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, mf_start)
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_start + i for i in range(n_fat)]
    difat += [_FREESECT] * (109 - len(difat))
    header[76:512] = struct.pack("<109I", *difat)
    return bytes(header) + b"".join(sectors)


# ---------------------------------------------------------------------------
# BIFF8 stream writer
# ---------------------------------------------------------------------------


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt_: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt_, 0x0DBB, 0x07CC,
                                    0x000100C1, 0x0606))


def _short_unicode(s: str) -> bytes:
    high = any(ord(c) > 0xFF for c in s)
    enc = s.encode("utf-16-le") if high else s.encode("latin-1")
    return struct.pack("<BB", len(s), 1 if high else 0) + enc


def _long_unicode(s: str) -> bytes:
    high = any(ord(c) > 0xFF for c in s)
    enc = s.encode("utf-16-le") if high else s.encode("latin-1")
    return struct.pack("<HB", len(s), 1 if high else 0) + enc


def _sst_records(strings: list[str], rng: random.Random) -> bytes:
    """SST (+CONTINUE) records; ~half the time an artificially low
    fragment limit forces CONTINUE splits, including mid-character-data
    splits that must re-emit the compression-flags byte."""
    limit = 120 + rng.randrange(160) if rng.random() < 0.5 else 1 << 30
    frags: list[bytearray] = [bytearray(
        struct.pack("<II", len(strings), len(strings)))]

    def room() -> int:
        return limit - len(frags[-1])

    for s in strings:
        high = any(ord(c) > 0xFF for c in s)
        width = 2 if high else 1
        header = struct.pack("<HB", len(s), 1 if high else 0)
        if room() < len(header):
            frags.append(bytearray())  # split between strings: no flags
        frags[-1] += header
        data = s.encode("utf-16-le" if high else "latin-1")
        pos = 0
        while pos < len(data):
            if room() < width:
                # split within character data: flags byte restarts
                frags.append(bytearray([1 if high else 0]))
            take = min(len(data) - pos, (room() // width) * width)
            frags[-1] += data[pos:pos + take]
            pos += take
    out = _rec(0x00FC, bytes(frags[0]))
    for f in frags[1:]:
        out += _rec(0x003C, bytes(f))
    return out


def _rk_encode(v: float) -> int | None:
    """RK encoding when exact: 30-bit int, int*100, or a double whose low
    34 bits are zero."""
    if v == int(v) and -(1 << 29) <= int(v) < (1 << 29):
        return ((int(v) << 2) & 0xFFFFFFFF) | 2
    c = v * 100
    if abs(c - round(c)) < 1e-9 and -(1 << 29) <= round(c) < (1 << 29):
        return ((int(round(c)) << 2) & 0xFFFFFFFF) | 3
    bits = struct.unpack("<Q", struct.pack("<d", v))[0]
    if bits & 0x3FFFFFFFF == 0:
        return (bits >> 32) & 0xFFFFFFFC
    return None


def build_xls(sheets: dict[str, list[list]], rng: random.Random,
              date_xf: int = 17, custom_date_fmt: bool = False,
              date_1904: bool = False) -> bytes:
    """Serialize sheets of template cells into a genuine .xls file.

    Cell templates: str -> SST string; int/float -> RK when encodable
    else NUMBER; {"serial": n} -> date-styled numeric; {"bool": b} ->
    BOOLERR; {"formula_num": v} / {"formula_str": s} -> FORMULA cached
    results; None -> omitted cell (column-gap hardening)."""
    strings: list[str] = []
    sst_index: dict[str, int] = {}

    def intern(s: str) -> int:
        if s not in sst_index:
            sst_index[s] = len(strings)
            strings.append(s)
        return sst_index[s]

    # interning must see every label before SST serialization
    for rows in sheets.values():
        for row in rows:
            for cell in row:
                if isinstance(cell, str):
                    intern(cell)

    # globals: 16 style XFs (ifmt 0), cell XF 16 = general, 17 = date
    ifmt_date = 0x00A4 if custom_date_fmt else 14
    xfs = b""
    for i in range(16):
        xfs += _rec(0x00E0, struct.pack("<HHHHHHHHHH", 0, 0, 0xFFF5,
                                        0x20, 0, 0, 0, 0, 0, 0))
    xfs += _rec(0x00E0, struct.pack("<HHHHHHHHHH", 0, 0, 1, 0, 0, 0, 0, 0, 0, 0))
    xfs += _rec(0x00E0, struct.pack("<HHHHHHHHHH", 0, ifmt_date, 1, 0,
                                    0, 0, 0, 0, 0, 0))
    fmt_rec = b""
    if custom_date_fmt:
        fmt_rec = _rec(0x041E, struct.pack("<H", ifmt_date)
                       + _long_unicode("yyyy\\-mm\\-dd"))

    sheet_blobs: list[bytes] = []
    for rows in sheets.values():
        body = b""
        for r, row in enumerate(rows):
            # MULRK run detection: consecutive RK-encodable numerics
            c = 0
            while c < len(row):
                cell = row[c]
                if cell is None:
                    c += 1
                    continue
                if isinstance(cell, str):
                    body += _rec(0x00FD, struct.pack(
                        "<HHHI", r, c, 16, intern(cell)))
                    c += 1
                elif isinstance(cell, dict) and "serial" in cell:
                    serial = float(cell["serial"])
                    rk = _rk_encode(serial)
                    if rk is not None and rng.random() < 0.5:
                        body += _rec(0x027E, struct.pack(
                            "<HHHI", r, c, date_xf, rk))
                    else:
                        body += _rec(0x0203, struct.pack(
                            "<HHH", r, c, date_xf) + struct.pack("<d", serial))
                    c += 1
                elif isinstance(cell, dict) and "bool" in cell:
                    body += _rec(0x0205, struct.pack(
                        "<HHHBB", r, c, 16, 1 if cell["bool"] else 0, 0))
                    c += 1
                elif isinstance(cell, dict) and "formula_num" in cell:
                    body += _rec(0x0006, struct.pack("<HHH", r, c, 16)
                                 + struct.pack("<d", float(cell["formula_num"]))
                                 + struct.pack("<HHIH", 3, 0, 0, 0))
                    c += 1
                elif isinstance(cell, dict) and "formula_str" in cell:
                    body += _rec(0x0006, struct.pack("<HHH", r, c, 16)
                                 + b"\x00\x00\x00\x00\x00\x00\xff\xff"
                                 + struct.pack("<HHIH", 3, 0, 0, 0))
                    body += _rec(0x0207, _long_unicode(cell["formula_str"]))
                    c += 1
                else:  # numeric
                    run: list[int] = []
                    j = c
                    while (j < len(row) and isinstance(row[j], (int, float))
                           and not isinstance(row[j], bool)):
                        rk = _rk_encode(float(row[j]))
                        if rk is None:
                            break
                        run.append(rk)
                        j += 1
                    if len(run) >= 2 and rng.random() < 0.6:
                        body += _rec(0x00BD, struct.pack("<HH", r, c)
                                     + b"".join(struct.pack("<HI", 16, rk)
                                                for rk in run)
                                     + struct.pack("<H", c + len(run) - 1))
                        c = j
                    elif run and rng.random() < 0.5:
                        body += _rec(0x027E, struct.pack(
                            "<HHHI", r, c, 16, run[0]))
                        c += 1
                    else:
                        body += _rec(0x0203, struct.pack("<HHH", r, c, 16)
                                     + struct.pack("<d", float(row[c])))
                        c += 1
        sheet_blobs.append(_bof(0x0010) + body + _rec(0x000A, b""))

    # assemble with BOUNDSHEET offsets (two-pass: sizes known after body)
    datemode = _rec(0x0022, struct.pack("<H", 1 if date_1904 else 0))
    head = _bof(0x0005) + datemode + fmt_rec + xfs \
        + _sst_records(strings, rng)
    names = list(sheets)
    bs_len = sum(len(_rec(0x0085, struct.pack("<IBB", 0, 0, 0)
                          + _short_unicode(nm))) for nm in names)
    globals_len = len(head) + bs_len + 4  # + EOF record
    offsets = []
    pos = globals_len
    for blob in sheet_blobs:
        offsets.append(pos)
        pos += len(blob)
    bs = b""
    for nm, off in zip(names, offsets):
        bs += _rec(0x0085, struct.pack("<IBB", off, 0, 0) + _short_unicode(nm))
    return head + bs + _rec(0x000A, b"") + b"".join(sheet_blobs)


# ---------------------------------------------------------------------------
# documents + goldens
# ---------------------------------------------------------------------------


def _words_str(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def gen_xls_doc(i: int) -> dict:
    """One .xls doc: genuine CFB/BIFF8 payload + golden markdown computed
    from the template rows (never from the decoder)."""
    rng = random.Random(f"xls-{i}-42")
    n_sheets = 1 + (rng.randrange(3) if i % 5 == 0 else 0)
    date_1904 = rng.random() < 0.2
    custom_date_fmt = rng.random() < 0.4
    sheets: dict[str, list[list]] = {}
    golden_parts: list[str] = []
    multi = n_sheets > 1
    for s in range(n_sheets):
        name = f"Ledger{s + 1}" if multi else "Sheet1"
        rows: list[list] = [["Item", "Qty", "Price", "Date", "Paid", "Note"]]
        golden_rows: list[list[str]] = []
        for _ in range(2 + rng.randrange(5)):
            item = _words_str(rng, 2)
            qty: object = rng.randrange(1, 9000)
            price: object = round(rng.uniform(1, 900), 2)
            if rng.random() < 0.15:
                qty = None
            if rng.random() < 0.15:
                price = None
            day = dt.date(2023, 6, 1) + dt.timedelta(days=rng.randrange(700))
            serial = day.toordinal() - EXCEL_EPOCH_ORDINAL
            if date_1904:
                serial -= 1462
            paid = rng.random() < 0.6
            note: object
            draw = rng.random()
            if draw < 0.25:
                note = {"formula_str": _words_str(rng, 3)}
                note_g = note["formula_str"]
            elif draw < 0.5:
                note = {"formula_num": float(rng.randrange(100, 999))}
                note_g = format_int(int(note["formula_num"]))
            else:
                note = _words_str(rng, 3)
                note_g = note
            rows.append([item, qty, price, {"serial": serial},
                         {"bool": paid}, note])
            golden_rows.append([
                item,
                format_int(qty) if qty is not None else "",
                format_float(price) if price is not None else "",
                day.strftime("%Y-%m-%d"),
                "TRUE" if paid else "FALSE",
                note_g,
            ])
        sheets[name] = rows
        if multi:
            golden_parts.append(f"## {name}")
        golden_parts.append(format_pipe_table([rows[0]] + golden_rows))
    payload = cfb_container(
        build_xls(sheets, rng, custom_date_fmt=custom_date_fmt,
                  date_1904=date_1904),
        stream_name="Book" if i % 7 == 3 else "Workbook",
    )
    return {
        "doc_id": i,
        "url": f"https://host{i % 40:04d}.example/xls/{i:06d}.xls",
        "payload": payload,
        "extracted_text": "\n\n".join(golden_parts),
    }


def gen_xls_docs(n: int) -> list[dict]:
    return [gen_xls_doc(i) for i in range(n)]
