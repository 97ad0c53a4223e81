"""From-scratch lossless WebP (VP8L) decoder/encoder — stdlib + numpy.

Closes the last image-format gap at the codec boundary (alongside
kernels/png_codec.py, jpeg_codec.py, gif_codec.py, bmp_codec.py,
tiff_codec.py): the reference decodes WebP with PIL
(lib/idp_common_pkg/idp_common/image/__init__.py:13-96), absent from
this container. Implemented directly from the public WebP Lossless
Bitstream Specification (RFC 9649 §3-§5).

decode_webp — full VP8L feature set:
- LSB-first bit reader, canonical prefix codes (simple 1/2-symbol form
  and the full code-length-coded form incl. RLE codes 16/17/18 and the
  max_symbol shortcut), meta-prefix groups,
- LZ77 backward references with the 120-entry 2D distance neighborhood
  map (generated from the spec's distance-then-row ordering rule, not
  hand-copied) + linear distances,
- color cache (hash 0x1e35a7bd, 1..11 bits),
- all four transforms, inverted in reverse bitstream order: predictor
  (14 modes, flat-array top-right wraparound semantics), cross-color
  (signed 3.5 fixed-point deltas), subtract-green, color indexing with
  sub-byte pixel bundling (8/4/2 px per byte for palettes <= 2/4/16).

encode_webp — independent writer twin for fixtures and roundtrips:
literal-only entropy images (no LZ77) with histogram-derived
length-limited canonical prefix codes (package-merge, 15-bit cap),
optional subtract-green, single-block left/top predictor, and color
indexing with mandatory bundling. Lossless roundtrip is exact by
construction and pinned in tests/test_webp_codec.py.

Lossy (VP8) WebP raises WebpError — an honest boundary: VP8 intra
prediction + boolean arithmetic decode is a different codec family.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    """Malformed or unsupported WebP payload."""


# --------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first within each byte)
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # absolute bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise WebpError("VP8L bitstream truncated")
        v = 0
        p = self.pos
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos += n
        return v

    def read_bit(self) -> int:
        if self.pos >= self.nbits:
            raise WebpError("VP8L bitstream truncated")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are emitted MSB-first (one tree step per bit)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------

# code length code symbol order (RFC 9649 §3.5.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _canonical_codes(lengths: list[int]) -> list[int]:
    """DEFLATE-style canonical code assignment (symbol order within
    ascending length)."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    codes = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


class _PrefixCode:
    """Decode-side prefix code: either a 0-bit single symbol or a binary
    tree walked one (MSB-first) bit at a time."""

    __slots__ = ("single", "tree")

    def __init__(self, single: int | None, tree: list | None):
        self.single = single
        self.tree = tree

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_PrefixCode":
        nonzero = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nonzero:
            raise WebpError("empty prefix code")
        if len(nonzero) == 1:
            return cls(nonzero[0][0], None)
        codes = _canonical_codes(lengths)
        tree: list = [None, None]
        for sym, ln in nonzero:
            node = tree
            code = codes[sym]
            for i in range(ln - 1, -1, -1):
                bit = (code >> i) & 1
                if i == 0:
                    if node[bit] is not None:
                        raise WebpError("over-subscribed prefix code")
                    node[bit] = sym
                else:
                    if node[bit] is None:
                        node[bit] = [None, None]
                    node = node[bit]
                    if not isinstance(node, list):
                        raise WebpError("over-subscribed prefix code")
        return cls(None, tree)

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        node = self.tree
        while True:
            node = node[br.read_bit()]
            if node is None:
                raise WebpError("invalid prefix code word")
            if not isinstance(node, list):
                return node


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    """RFC 9649 §3.5.2: code lengths themselves coded with a 19-symbol
    prefix code, RLE symbols 16/17/18, optional max_symbol cap."""
    n_codes = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(n_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode.from_lengths(clc_lengths)

    if br.read_bit():  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise WebpError("max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet

    # Read exactly like the canonical decoder: until the alphabet is
    # filled or max_symbol reads are consumed (each RLE op counts as one
    # read).  There is NO Kraft-closure early stop in the spec — code
    # completeness is validated later when the tree is built.
    lengths = [0] * alphabet
    prev_len = 8
    symbol = 0
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.read(2)
            if symbol + rep > alphabet:
                raise WebpError("code length repeat overflow")
            for _ in range(rep):
                lengths[symbol] = prev_len
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        elif s == 18:
            symbol += 11 + br.read(7)
        if symbol > alphabet:
            raise WebpError("code length overflow")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            first = br.read(8)
        else:
            first = br.read_bit()
        if num_symbols == 1:
            if first >= alphabet:
                raise WebpError("simple-code symbol out of range")
            return _PrefixCode(first, None)
        second = br.read(8)
        if first >= alphabet or second >= alphabet or first == second:
            raise WebpError("simple-code symbols invalid")
        # codes assigned in WRITTEN order (first -> 0, second -> 1),
        # not canonical symbol order (RFC 9649 §3.5.1)
        return _PrefixCode(None, [first, second])
    lengths = _read_code_lengths(br, alphabet)
    return _PrefixCode.from_lengths(lengths)


# --------------------------------------------------------------------------
# LZ77 helpers
# --------------------------------------------------------------------------

def _plane_codes() -> list[tuple[int, int]]:
    """The 120 short-distance (dx, dy) pairs, generated from the spec's
    ordering: all offsets with dy in 0..7, dx in -7..8 (dx >= 1 when
    dy = 0), sorted by squared euclidean distance, then larger dy first,
    then smaller |dx|, positive dx before negative (RFC 9649 §3.2.3)."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              abs(p[0]), 0 if p[0] > 0 else 1))
    return cands[:120]


_PLANE_CODES = _plane_codes()


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _PLANE_CODES[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _prefix_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §3.2.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_hash(argb: int, bits: int) -> int:
    return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - bits)


# --------------------------------------------------------------------------
# entropy-coded image decode
# --------------------------------------------------------------------------

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> np.ndarray:
    """Decode one spatially-coded image into a flat uint32 ARGB array.
    Level-0 images may carry meta-prefix groups; sub-resolution images
    (transforms, entropy image) are single-group (RFC 9649 §3.5.4)."""
    cache_bits = 0
    cache = None
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("invalid color-cache size")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_block_bits = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        meta_block_bits = br.read(3) + 2
        mw = (w + (1 << meta_block_bits) - 1) >> meta_block_bits
        mh = (h + (1 << meta_block_bits) - 1) >> meta_block_bits
        meta = _decode_entropy_image(br, mw, mh, False)
        n_groups = int(max((int(p) >> 8) & 0xFFFF for p in meta)) + 1

    green_alphabet = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alphabet),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, _NUM_DISTANCE_CODES),
            )
        )

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    i = 0
    mw = ((w + (1 << meta_block_bits) - 1) >> meta_block_bits) if meta is not None else 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            mp = int(meta[(y >> meta_block_bits) * mw + (x >> meta_block_bits)])
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        sym = g[0].decode(br)
        if sym < 256:  # literal: green, red, blue, alpha
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[i] = px
            if cache is not None:
                cache[_cache_hash(px, cache_bits)] = px
            i += 1
        elif sym < 256 + _NUM_LENGTH_CODES:  # backward reference
            length = _prefix_value(br, sym - 256)
            dist_code = _prefix_value(br, g[4].decode(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > i or length > n - i:
                raise WebpError("LZ77 reference out of bounds")
            for _ in range(length):
                px = int(out[i - dist])
                out[i] = px
                if cache is not None:
                    cache[_cache_hash(px, cache_bits)] = px
                i += 1
        else:  # color-cache hit
            if cache is None:
                raise WebpError("cache symbol without color cache")
            idx = sym - 256 - _NUM_LENGTH_CODES
            out[i] = cache[idx]
            i += 1
    return out


# --------------------------------------------------------------------------
# inverse transforms
# --------------------------------------------------------------------------

def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    """One of the 14 spatial predictors over packed ARGB words, applied
    per channel (RFC 9649 §4.1)."""

    def ch(p, s):
        return (p >> s) & 0xFF

    def pack(f):
        return (f(24) << 24) | (f(16) << 16) | (f(8) << 8) | f(0)

    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return pack(lambda s: _avg2(_avg2(ch(L, s), ch(TR, s)), ch(T, s)))
    if mode == 6:
        return pack(lambda s: _avg2(ch(L, s), ch(TL, s)))
    if mode == 7:
        return pack(lambda s: _avg2(ch(L, s), ch(T, s)))
    if mode == 8:
        return pack(lambda s: _avg2(ch(TL, s), ch(T, s)))
    if mode == 9:
        return pack(lambda s: _avg2(ch(T, s), ch(TR, s)))
    if mode == 10:
        return pack(
            lambda s: _avg2(_avg2(ch(L, s), ch(TL, s)), _avg2(ch(T, s), ch(TR, s)))
        )
    if mode == 11:  # Select
        p_l = p_t = 0
        for s in (24, 16, 8, 0):
            p = ch(L, s) + ch(T, s) - ch(TL, s)
            p_l += abs(p - ch(L, s))
            p_t += abs(p - ch(T, s))
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        return pack(lambda s: min(255, max(0, ch(L, s) + ch(T, s) - ch(TL, s))))
    if mode == 13:  # ClampAddSubtractHalf
        def f(s):
            a = _avg2(ch(L, s), ch(T, s))
            return min(255, max(0, a + int((a - ch(TL, s)) / 2)))

        return pack(f)
    raise WebpError(f"invalid predictor mode {mode}")


def _inverse_predictor(pix: np.ndarray, w: int, h: int,
                       block_bits: int, pred_img: np.ndarray) -> None:
    """In-place: pixel = residual + predictor (mod 256 per channel).
    Flat-array addressing gives the spec's top-right wraparound for the
    last column (top-right of (w-1, y) is (0, y))."""
    pw = (w + (1 << block_bits) - 1) >> block_bits
    M = 0xFF
    for i in range(w * h):
        x, y = i % w, i // w
        if i == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = int(pix[i - 1])
        elif x == 0:
            pred = int(pix[i - w])
        else:
            mode = (int(pred_img[(y >> block_bits) * pw + (x >> block_bits)]) >> 8) & 0xFF
            pred = _predict(
                mode,
                int(pix[i - 1]),
                int(pix[i - w]),
                int(pix[i - w - 1]),
                int(pix[i - w + 1]),
            )
        r = int(pix[i])
        pix[i] = (
            ((((r >> 24) + (pred >> 24)) & M) << 24)
            | ((((r >> 16) + ((pred >> 16) & M)) & M) << 16)
            | ((((r >> 8) + ((pred >> 8) & M)) & M) << 8)
            | (((r & M) + (pred & M)) & M)
        )


def _ct_delta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5 — signed 3.5 fixed-point (RFC 9649 §4.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(pix: np.ndarray, w: int, h: int,
                             block_bits: int, ct_img: np.ndarray) -> None:
    cw = (w + (1 << block_bits) - 1) >> block_bits
    for i in range(w * h):
        x, y = i % w, i // w
        cte = int(ct_img[(y >> block_bits) * cw + (x >> block_bits)])
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        p = int(pix[i])
        green = (p >> 8) & 0xFF
        red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green) & 0xFF
        blue = ((p & 0xFF) + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (red << 16) | blue


def _inverse_subtract_green(pix: np.ndarray) -> None:
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    r = ((pix >> np.uint32(16)) + g) & np.uint32(0xFF)
    b = (pix + g) & np.uint32(0xFF)
    pix[:] = (pix & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3  # 8 px / byte
    if size <= 4:
        return 2  # 4 px / byte
    if size <= 16:
        return 1  # 2 px / byte
    return 0


def _inverse_color_indexing(packed: np.ndarray, w: int, h: int,
                            palette: np.ndarray) -> np.ndarray:
    wb = _palette_width_bits(len(palette))
    if wb == 0:
        idx = (packed >> np.uint32(8)) & np.uint32(0xFF)
        if int(idx.max(initial=0)) >= len(palette):
            raise WebpError("palette index out of range")
        return palette[idx]
    ppb = 1 << wb                  # pixels bundled per green byte
    bits = 8 >> wb                 # bits per pixel index
    pw = (w + ppb - 1) >> wb       # packed width
    out = np.zeros(w * h, dtype=np.uint32)
    mask = (1 << bits) - 1
    for y in range(h):
        for x in range(w):
            green = (int(packed[y * pw + (x >> wb)]) >> 8) & 0xFF
            idx = (green >> (bits * (x % ppb))) & mask
            if idx >= len(palette):
                raise WebpError("palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# --------------------------------------------------------------------------
# top-level decode
# --------------------------------------------------------------------------

def _vp8l_payload(data: bytes) -> bytes:
    """RIFF walk to the VP8L chunk; VP8 (lossy) is an explicit boundary."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP (RIFF) payload")
    off = 12
    while off + 8 <= len(data):
        fourcc = data[off:off + 4]
        size = struct.unpack("<I", data[off + 4:off + 8])[0]
        body = data[off + 8:off + 8 + size]
        if fourcc == b"VP8L":
            return body
        if fourcc == b"VP8 ":
            raise WebpError(
                "lossy (VP8) WebP decode is not supported — boolean "
                "arithmetic intra-frame decode is a separate codec; "
                "only lossless VP8L payloads decode here"
            )
        off += 8 + size + (size & 1)
    raise WebpError("no VP8L chunk in WebP container")


def has_lossy_vp8(data: bytes) -> bool:
    """RIFF walk: True iff the container's image chunk is lossy 'VP8 '
    (used to gate the optional system-libwebp fallback — never matches
    VP8L, and never false-positives on bytes inside chunk bodies)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return False
    off = 12
    while off + 8 <= len(data):
        fourcc = data[off:off + 4]
        if fourcc == b"VP8 ":
            return True
        if fourcc == b"VP8L":
            return False
        size = struct.unpack("<I", data[off + 4:off + 8])[0]
        off += 8 + size + (size & 1)
    return False


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP to (h, w, 3) uint8 RGB or (h, w, 4) RGBA
    (alpha kept when the header's alpha hint is set)."""
    body = _vp8l_payload(data)
    if not body or body[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _BitReader(body)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read_bit()
    if br.read(3) != 0:
        raise WebpError("unsupported VP8L version")

    # transforms, recorded with the xsize in effect when each was read
    transforms: list[tuple] = []
    xsize = w
    seen: set[int] = set()
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bb = br.read(3) + 2
            pw = (xsize + (1 << bb) - 1) >> bb
            ph = (h + (1 << bb) - 1) >> bb
            transforms.append(("pred", xsize, bb, _decode_entropy_image(br, pw, ph, False)))
        elif ttype == 1:  # cross-color
            bb = br.read(3) + 2
            cw = (xsize + (1 << bb) - 1) >> bb
            ch_ = (h + (1 << bb) - 1) >> bb
            transforms.append(("color", xsize, bb, _decode_entropy_image(br, cw, ch_, False)))
        elif ttype == 2:
            transforms.append(("subgreen", xsize))
        else:  # color indexing
            psize = br.read(8) + 1
            pal_deltas = _decode_entropy_image(br, psize, 1, False)
            # component-wise mod-256 accumulation, not word-wise add
            pal = np.zeros(psize, dtype=np.uint32)
            prev = 0
            for k in range(psize):
                d = int(pal_deltas[k])
                cur = 0
                for s in (0, 8, 16, 24):
                    cur |= ((((prev >> s) & 0xFF) + ((d >> s) & 0xFF)) & 0xFF) << s
                pal[k] = cur
                prev = cur
            transforms.append(("palette", xsize, pal))
            wb = _palette_width_bits(psize)
            xsize = (xsize + (1 << wb) - 1) >> wb

    pix = _decode_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == "palette":
            pix = _inverse_color_indexing(pix, t[1], h, t[2])
        elif t[0] == "subgreen":
            _inverse_subtract_green(pix)
        elif t[0] == "color":
            _inverse_color_transform(pix, t[1], h, t[2], t[3])
        else:
            _inverse_predictor(pix, t[1], h, t[2], t[3])

    a = ((pix >> np.uint32(24)) & np.uint32(0xFF)).astype(np.uint8)
    r = ((pix >> np.uint32(16)) & np.uint32(0xFF)).astype(np.uint8)
    g = ((pix >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
    b = (pix & np.uint32(0xFF)).astype(np.uint8)
    if has_alpha:
        img = np.stack([r, g, b, a], axis=-1)
        return img.reshape(h, w, 4)
    return np.stack([r, g, b], axis=-1).reshape(h, w, 3)


# --------------------------------------------------------------------------
# encoder twin
# --------------------------------------------------------------------------

def _huffman_lengths(freqs: list[int], max_len: int = 15) -> list[int]:
    """Length-limited prefix-code lengths via package-merge (exact
    optimum under the depth cap; Larmore & Hirschberg 1990). A symbol's
    length = how many of the cheapest 2n-2 final-level entries contain
    it."""
    active = [(f, s) for s, f in enumerate(freqs) if f > 0]
    if not active:
        raise WebpError("cannot build code for empty histogram")
    if (1 << max_len) < len(active):
        raise WebpError("alphabet too large for depth cap")
    lengths = [0] * len(freqs)
    if len(active) == 1:
        lengths[active[0][1]] = 1
        return lengths
    items = sorted((f, (s,)) for f, s in active)
    lists = list(items)
    for _ in range(max_len - 1):
        packaged = [
            (lists[i][0] + lists[i + 1][0], lists[i][1] + lists[i + 1][1])
            for i in range(0, len(lists) - 1, 2)
        ]
        lists = sorted(packaged + items)
    counts: dict[int, int] = {s: 0 for _, s in active}
    for _, syms in lists[: 2 * len(active) - 2]:
        for s in syms:
            counts[s] += 1
    for s, c in counts.items():
        lengths[s] = c
    return lengths


def _write_prefix_code(bw: _BitWriter, lengths: list[int]) -> list[int]:
    """Emit a prefix code (simple form when <= 2 symbols, else the
    code-length-coded form without RLE), return canonical codes."""
    nonzero = [s for s, l in enumerate(lengths) if l > 0]
    if len(nonzero) <= 2 and all(s < 256 for s in nonzero):
        bw.write(1, 1)  # simple
        bw.write(len(nonzero) - 1, 1)
        first = nonzero[0]
        if first <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(nonzero) == 2:
            bw.write(nonzero[1], 8)
        return _canonical_codes(
            [1 if l else 0 for l in lengths] if len(nonzero) == 2 else lengths
        )
    bw.write(0, 1)  # full code
    # code-length code over the histogram of lengths (no 16/17/18 RLE);
    # trailing zeros are trimmed via the spec's max_symbol shortcut —
    # the canonical decoder has no Kraft early stop, so without the
    # shortcut it would expect a length entry for EVERY alphabet symbol
    last_nz = max(nonzero)
    used = lengths[: last_nz + 1]
    clc_freq = [0] * 19
    for l in used:
        clc_freq[l] += 1
    clc_lengths = (
        _huffman_lengths(clc_freq, 7)
        if sum(1 for f in clc_freq if f) > 1
        else [1 if f else 0 for f in clc_freq]
    )
    # emit all 19 slots in _CLC_ORDER (covers every used length symbol)
    bw.write(19 - 4, 4)
    for sym in _CLC_ORDER:
        bw.write(clc_lengths[sym], 3)
    if len(used) == len(lengths):
        bw.write(0, 1)  # no trailing zeros to trim
    else:
        bw.write(1, 1)  # max_symbol shortcut: stop after len(used) reads
        val = len(used) - 2
        nbits = 2
        while val >= (1 << nbits):
            nbits += 2
        bw.write((nbits - 2) // 2, 3)
        bw.write(val, nbits)
    clc_codes = _canonical_codes(clc_lengths)
    single_clc = sum(1 for l in clc_lengths if l) == 1
    for l in used:
        if not single_clc:
            bw.write_code(clc_codes[l], clc_lengths[l])
    return _canonical_codes(lengths)


def _emit_entropy_image(bw: _BitWriter, pix: np.ndarray,
                        level0: bool = False) -> None:
    """Literal-only spatially-coded image: no cache, no meta groups.
    Only level-0 (main) images carry the meta-prefix bit; sub-resolution
    images (palette deltas, predictor ids) must not emit it."""
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta prefix codes
    a = (pix >> np.uint32(24)) & np.uint32(0xFF)
    r = (pix >> np.uint32(16)) & np.uint32(0xFF)
    g = (pix >> np.uint32(8)) & np.uint32(0xFF)
    b = pix & np.uint32(0xFF)
    planes = []
    for vals, alphabet in (
        (g, 256 + _NUM_LENGTH_CODES),
        (r, 256),
        (b, 256),
        (a, 256),
    ):
        bc = np.bincount(vals.astype(np.int64), minlength=256)
        freqs = [0] * alphabet
        for v in range(256):
            freqs[v] = int(bc[v])
        lengths = _huffman_lengths(freqs)
        codes = _write_prefix_code(bw, lengths)
        planes.append((lengths, codes))
    # distance code: single dummy symbol
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # 1 symbol
    bw.write(0, 1)  # 1-bit symbol
    bw.write(0, 1)  # symbol 0
    (gl, gc), (rl, rc), (bl, bc), (al, ac) = planes
    g_single = sum(1 for l in gl if l) == 1
    r_single = sum(1 for l in rl if l) == 1
    b_single = sum(1 for l in bl if l) == 1
    a_single = sum(1 for l in al if l) == 1
    for px in pix:
        p = int(px)
        gv, rv, bv, av = (p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF, (p >> 24) & 0xFF
        if not g_single:
            bw.write_code(gc[gv], gl[gv])
        if not r_single:
            bw.write_code(rc[rv], rl[rv])
        if not b_single:
            bw.write_code(bc[bv], bl[bv])
        if not a_single:
            bw.write_code(ac[av], al[av])


def _to_argb_flat(img: np.ndarray) -> tuple[np.ndarray, int, int, bool]:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img, img, img], axis=-1)
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        a = np.full((h, w), 255, dtype=np.uint32)
        has_alpha = False
    else:
        a = img[:, :, 3].astype(np.uint32)
        has_alpha = True
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    flat = ((a << np.uint32(24)) | (r << np.uint32(16))
            | (g << np.uint32(8)) | b).reshape(-1)
    return flat, w, h, has_alpha


def encode_webp(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: int | None = None,
    palette: bool = False,
) -> bytes:
    """Lossless VP8L writer (independent of the decoder): literal-only
    entropy coding with histogram prefix codes; optional subtract-green,
    single-block predictor (mode 1=left or 2=top), or color-indexing
    with mandatory sub-byte bundling. Gray (h,w), RGB (h,w,3) and RGBA
    (h,w,4) inputs."""
    flat, w, h, has_alpha = _to_argb_flat(img)
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    if palette:
        if subtract_green or predictor is not None:
            raise WebpError("palette mode composes with no other transform here")
        colors = list(dict.fromkeys(int(p) for p in flat))
        if len(colors) > 256:
            raise WebpError("palette mode needs <= 256 distinct colors")
        lut = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(len(colors) - 1, 8)
        deltas = np.zeros(len(colors), dtype=np.uint32)
        prev = 0
        for i, c in enumerate(colors):
            d = 0
            for s in (0, 8, 16, 24):
                d |= ((((c >> s) & 0xFF) - ((prev >> s) & 0xFF)) & 0xFF) << s
            deltas[i] = d
            prev = c
        _emit_entropy_image(bw, deltas, level0=False)
        wb = _palette_width_bits(len(colors))
        if wb == 0:
            packed = np.array(
                [0xFF000000 | (lut[int(p)] << 8) for p in flat], dtype=np.uint32
            )
            pw = w
        else:
            ppb = 1 << wb
            bits = 8 >> wb
            pw = (w + ppb - 1) >> wb
            packed = np.zeros(pw * h, dtype=np.uint32)
            for y in range(h):
                for x in range(w):
                    gslot = y * pw + (x >> wb)
                    cur = int(packed[gslot])
                    green = (cur >> 8) & 0xFF
                    green |= lut[int(flat[y * w + x])] << (bits * (x % ppb))
                    packed[gslot] = 0xFF000000 | (green << 8)
        bw.write(0, 1)  # end of transforms
        _emit_entropy_image(bw, packed, level0=True)
    else:
        resid = flat.copy()
        if predictor is not None:
            if predictor not in (1, 2):
                raise WebpError("encoder supports predictor modes 1 (L) / 2 (T)")
            if max(w, h) > 512:
                raise WebpError("single-block predictor needs w, h <= 512")
            bw.write(1, 1)
            bw.write(0, 2)  # predictor transform
            # block bits chosen so the whole image is ONE block
            bb = 2
            while (1 << bb) < max(w, h):
                bb += 1
            bb = min(bb, 9)
            bw.write(bb - 2, 3)
            pred_px = np.array([0xFF000000 | (predictor << 8)], dtype=np.uint32)
            _emit_entropy_image(bw, pred_px, level0=False)
            # residuals in scan order against the standard border rules
            out = np.zeros_like(flat)
            M = 0xFF
            for i in range(w * h):
                x, y = i % w, i // w
                if i == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(flat[i - 1])
                elif x == 0:
                    pred = int(flat[i - w])
                else:
                    pred = int(flat[i - 1]) if predictor == 1 else int(flat[i - w])
                p = int(flat[i])
                out[i] = (
                    ((((p >> 24) - (pred >> 24)) & M) << 24)
                    | ((((p >> 16) - ((pred >> 16) & M)) & M) << 16)
                    | ((((p >> 8) - ((pred >> 8) & M)) & M) << 8)
                    | (((p & M) - (pred & M)) & M)
                )
            resid = out
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # subtract green
            g = (resid >> np.uint32(8)) & np.uint32(0xFF)
            r = ((resid >> np.uint32(16)) - g) & np.uint32(0xFF)
            b = (resid - g) & np.uint32(0xFF)
            resid = (resid & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        bw.write(0, 1)  # end of transforms
        _emit_entropy_image(bw, resid, level0=True)

    body = bw.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
