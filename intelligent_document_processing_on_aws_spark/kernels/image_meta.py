"""Image metadata from file headers — stdlib only, no codec.

Replaces the fixture-supplied `meta.width/height` of multimodal items with
values parsed from the payload bytes themselves, covering the metadata
half of the reference's image pipeline (lib/idp_common_pkg/idp_common/
image/__init__.py:13-96 reads size via PIL before resizing; PIL is absent
in this container, but the header fields are plain binary structures):

- PNG:  8-byte signature, then the IHDR chunk: width/height are the two
  big-endian u32s at bytes 16..24.
- JPEG: scan the marker stream for a start-of-frame marker (SOF0..SOF15
  except DHT/JPG/DAC): height/width are big-endian u16s in its payload.
- GIF:  logical screen width/height, little-endian u16s at bytes 6..10.

Returns None for anything else (including truncated headers) — callers
keep the row and leave meta fields null, never raise.
"""

from __future__ import annotations

import struct

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}  # DHT, JPG, DAC look like SOF but aren't


def png_size(data: bytes) -> tuple[int, int] | None:
    if len(data) < 24 or not data.startswith(PNG_SIG) or data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", data[16:24])
    return (w, h) if w > 0 and h > 0 else None


def jpeg_size(data: bytes) -> tuple[int, int] | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:  # resync: skip fill bytes / corruption
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before marker
            i += 1
            continue
        if marker in (0xDA, 0xD9):
            # SOS/EOI before any SOF: stop — scanning entropy-coded data
            # would misparse stray 0xFF,0xC0-0xCF pairs as frame headers
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return (w, h) if w > 0 and h > 0 else None
        if seg_len < 2:
            return None
        i += 2 + seg_len
    return None


def gif_size(data: bytes) -> tuple[int, int] | None:
    if len(data) < 10 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return (w, h) if w > 0 and h > 0 else None


def bmp_size(data: bytes) -> tuple[int, int] | None:
    """'BM' + DIB header: BITMAPINFOHEADER (>=40 bytes, i32 dims; height
    may be negative for top-down rows) or the ancient BITMAPCOREHEADER
    (12 bytes, u16 dims)."""
    if len(data) < 26 or not data.startswith(b"BM"):
        return None
    hdr = int.from_bytes(data[14:18], "little")
    if hdr == 12:
        w = int.from_bytes(data[18:20], "little")
        h = int.from_bytes(data[20:22], "little")
    elif hdr >= 40:
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = abs(int.from_bytes(data[22:26], "little", signed=True))
    else:
        return None
    return (w, h) if w > 0 and h > 0 else None


def tiff_size(data: bytes) -> tuple[int, int] | None:
    """First IFD's ImageWidth (256) / ImageLength (257) tags, SHORT or
    LONG values, both byte orders."""
    if len(data) < 8 or data[:4] not in (b"II*\x00", b"MM\x00*"):
        return None
    bo = "little" if data[:2] == b"II" else "big"
    off = int.from_bytes(data[4:8], bo)
    if off + 2 > len(data):
        return None
    n = int.from_bytes(data[off:off + 2], bo)
    w = h = None
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            break
        tag = int.from_bytes(data[e:e + 2], bo)
        typ = int.from_bytes(data[e + 2:e + 4], bo)
        if tag not in (256, 257):
            continue
        if typ == 3:  # SHORT: value left-justified in the 4-byte field
            v = int.from_bytes(data[e + 8:e + 10], bo)
        elif typ == 4:  # LONG
            v = int.from_bytes(data[e + 8:e + 12], bo)
        else:
            continue
        if tag == 256:
            w = v
        else:
            h = v
    return (w, h) if w and h else None


def webp_size(data: bytes) -> tuple[int, int] | None:
    """RIFF chunk walk: VP8X canvas (24-bit minus-one dims), VP8 lossy
    frame header (14-bit dims after the 9d 01 2a sync), or VP8L lossless
    bitstream (14-bit minus-one dims packed after the 0x2F signature)."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        p = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8X" and len(p) >= 10:
            w = int.from_bytes(p[4:7], "little") + 1
            h = int.from_bytes(p[7:10], "little") + 1
            return (w, h)
        if fourcc == b"VP8 " and len(p) >= 10 and p[3:6] == b"\x9d\x01\x2a":
            w = int.from_bytes(p[6:8], "little") & 0x3FFF
            h = int.from_bytes(p[8:10], "little") & 0x3FFF
            return (w, h) if w and h else None
        if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
            bits = int.from_bytes(p[1:5], "little")
            return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None


def image_size(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the header of a PNG/JPEG/GIF/BMP/TIFF/WEBP
    payload, else None."""
    if not data:
        return None
    return (png_size(data) or jpeg_size(data) or gif_size(data)
            or bmp_size(data) or tiff_size(data) or webp_size(data))
