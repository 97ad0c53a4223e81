"""From-scratch baseline JPEG (SOF0) decoder + encoder — stdlib/numpy only.

Completes the image-codec boundary for the web's other dominant format
(the reference decodes with PIL — lib/idp_common_pkg/idp_common/image/
__init__.py:13-96; PIL is absent from this container). Implemented
directly from the public ITU-T T.81 spec (Annex F baseline process) and
the JFIF 1.02 note:

decode_jpeg:
- marker walk (SOI/APPn/COM/DQT/DHT/SOF0/SOF1/DRI/SOS/EOI),
- canonical Huffman tables (DC + AC classes), bit-reader with 0xFF00
  byte-stuffing and RSTn restart handling (DC predictors reset),
- DC difference coding + AC run-length (ZRL/EOB) per T.81 F.2,
- dezigzag, dequantize, float64 8x8 IDCT (orthonormal DCT matrix),
- chroma upsampling (sample replication) for 4:2:0 / 4:2:2 / 4:1:1,
- JFIF YCbCr -> RGB (BT.601 constants), uint8 clamp; 1-component
  streams decode to grayscale.
- Progressive (SOF2) and arithmetic coding raise JpegError — baseline
  only, loudly.

encode_jpeg (independent writer twin, fixtures pattern):
- Annex K example quantization tables scaled by the libjpeg quality
  formula, Annex K standard Huffman tables, 4:4:4 (no subsampling),
  forward DCT with the same orthonormal matrix, byte-stuffed entropy
  output. decode(encode(x)) reproduces x within the quantization error
  bound (asserted in tests), and solid blocks round-trip near-exactly.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8x8 DCT-II matrix: T @ x = DCT(x); T.T @ X = IDCT(X)
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = np.sqrt(0.125) if _k == 0 else 0.5
        _T[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


# -- Annex K tables (public spec constants) -----------------------------------

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) — Annex K.3
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_huff(bits, values):
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    un-stuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None          # pending marker encountered mid-stream

    def _fill(self):
        d = self.data
        if self.marker is not None:
            raise JpegError("bit read past segment marker")
        if self.pos >= len(d):
            raise JpegError("unexpected end of entropy data")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise JpegError("truncated after 0xFF")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1               # stuffed byte
            else:
                # real marker: signal, emit padding bits (spec: 1-fill)
                self.marker = nxt
                self.pos += 1
                b = 0
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid huffman code")

    def align(self):
        self.nbits = 0
        self.buf = 0


def _extend(v: int, t: int) -> int:
    """T.81 F.12 sign extension."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 HxW (grayscale) or HxWx3 (RGB)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JpegError("missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise JpegError(f"expected marker at {i}")
        marker = data[i + 1]
        if marker == 0xD9:                       # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", data[i + 2:i + 4])
        seg = data[i + 4:i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:                       # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int64)
                    p += 64
                else:
                    tab = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int64)
                    p += 128
                if len(tab) != 64:
                    raise JpegError("bad DQT")
                qt[tq] = tab
        elif marker == 0xC4:                     # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                if len(values) != nv:
                    raise JpegError("bad DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC1):             # SOF0/SOF1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise JpegError("progressive JPEG (SOF2) not supported — "
                            "baseline decoder")
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise JpegError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                     # SOS: entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs), None)
                if comp is None:
                    raise JpegError("scan references unknown component")
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(data, i + 2 + seg_len, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        # APPn/COM and anything else: skip
        i += 2 + seg_len
    raise JpegError("no SOS found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    w, h = frame["w"], frame["h"]
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise JpegError("bad dimensions")
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JpegError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        cw, ch = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(np.zeros((ch, cw), np.float64))
        if c["tq"] not in qt:
            raise JpegError("missing quant table")
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    idct_t = _T.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align()
                if reader.marker is None:
                    # marker bytes sit directly in the stream
                    p = reader.pos
                    if p + 2 <= len(data) and data[p] == 0xFF and \
                            0xD0 <= data[p + 1] <= 0xD7:
                        reader.pos = p + 2
                    else:
                        raise JpegError("missing restart marker")
                elif not (0xD0 <= reader.marker <= 0xD7):
                    raise JpegError("expected RSTn")
                else:
                    reader.marker = None
                preds = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                if td not in huff_dc or ta not in huff_ac:
                    raise JpegError("missing huffman table")
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int64)
                        t = reader.decode_huff(huff_dc[td])
                        diff = _extend(reader.receive(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(huff_ac[ta])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16     # ZRL
                                    continue
                                break           # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = (zz * q)[UNZIGZAG].reshape(8, 8)
                        pix = idct_t @ block @ _T + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1
    # crop + upsample to full resolution
    out = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# -- encoder (independent writer twin) ----------------------------------------


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)       # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)                     # 1-fill padding


def _huff_encode_map(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


def _csize(v: int) -> int:
    a = abs(v)
    s = 0
    while a:
        a >>= 1
        s += 1
    return s


def _encode_block(bw, block, q, dc_map, ac_map, pred):
    coef = _T @ block @ _T.T
    zz = np.rint(coef.reshape(-1)[ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    s = _csize(diff)
    code, length = dc_map[s]
    bw.write(code, length)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v & ((1 << s) - 1), s)
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    run = 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]
            bw.write(code, length)
            run -= 16
        s = _csize(v)
        code, length = ac_map[(run << 4) | s]
        bw.write(code, length)
        vv = v if v >= 0 else v + (1 << s) - 1
        bw.write(vv & ((1 << s) - 1), s)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]
        bw.write(code, length)                    # EOB
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 75,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 HxW (gray) or HxWx3 (RGB) -> baseline JFIF bytes.

    subsample=True writes 4:2:0 (Y at 2x2 sampling, box-averaged chroma);
    restart_interval > 0 emits a DRI segment and RSTn markers every that
    many MCUs — both exist so the decoder's subsampling/restart paths are
    testable without an external encoder."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rf = img[:, :, 0].astype(np.float64)
        gf = img[:, :, 1].astype(np.float64)
        bf = img[:, :, 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [y, cb, cr]
    nc = 1 if gray else 3
    sub = subsample and not gray
    # per-component sampling factors
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    hmax = max(x[0] for x in hv[:nc])
    vmax = max(x[1] for x in hv[:nc])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if sub:
        # pad full-res planes to MCU grid, then box-average chroma 2x2
        fullpad = [np.pad(p, ((0, mcuy * 16 - h), (0, mcux * 16 - w)),
                          mode="edge") for p in planes]
        cb2 = fullpad[1].reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        cr2 = fullpad[2].reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        padded = [fullpad[0], cb2, cr2]
    else:
        padded = [np.pad(p, ((0, mcuy * 8 * vmax - h),
                             (0, mcux * 8 * hmax - w)), mode="edge")
                  for p in planes]
    ql = _quality_scale(STD_LUMA_Q, quality)
    qc = _quality_scale(STD_CHROMA_Q, quality)
    qts = [ql] if gray else [ql, qc]

    out = bytearray(b"\xff\xd8")                  # SOI
    app0 = b"JFIF\x00\x01\x02\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for tq, q in enumerate(qts):
        body = bytes([tq]) + bytes(int(x) for x in q)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, (hv[c][0] << 4) | hv[c][1], 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = ([(0, 0, *STD_DC_LUMA), (1, 0, *STD_AC_LUMA)] if gray else
              [(0, 0, *STD_DC_LUMA), (1, 0, *STD_AC_LUMA),
               (0, 1, *STD_DC_CHROMA), (1, 1, *STD_AC_CHROMA)])
    for tc, th, bits, values in tables:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_maps = [_huff_encode_map(*STD_DC_LUMA)]
    ac_maps = [_huff_encode_map(*STD_AC_LUMA)]
    if not gray:
        dc_maps.append(_huff_encode_map(*STD_DC_CHROMA))
        ac_maps.append(_huff_encode_map(*STD_AC_CHROMA))
    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * nc
            for ci in range(nc):
                q = qts[min(ci, len(qts) - 1)]
                dc_map = dc_maps[min(ci, len(dc_maps) - 1)]
                ac_map = ac_maps[min(ci, len(ac_maps) - 1)]
                ch, cw = hv[ci][1], hv[ci][0]
                for by in range(ch):
                    for bx in range(cw):
                        y0 = (my * ch + by) * 8
                        x0 = (mx * cw + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        preds[ci] = _encode_block(
                            bw, block, q, dc_map, ac_map, preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"                            # EOI
    return bytes(out)
