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


def image_size(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the header of a PNG/JPEG/GIF payload, else None."""
    if not data:
        return None
    return png_size(data) or jpeg_size(data) or gif_size(data)
