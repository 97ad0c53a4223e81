"""Minimal valid media payload builders (headers real, pixel data fake).

Used by the multimodal fixtures/queries: the headers are spec-conformant
(image_meta parses them like any real file's), the payload body is
deterministic filler — honest inputs for the metadata/feature plumbing
while the codec boundary stays stubbed.
"""

from __future__ import annotations

import struct
import zlib


def png_bytes(width: int, height: int) -> bytes:
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    ihdr = (struct.pack(">I", len(ihdr_data)) + b"IHDR" + ihdr_data
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data)))
    idat_data = zlib.compress(b"\x00" * 8)
    idat = (struct.pack(">I", len(idat_data)) + b"IDAT" + idat_data
            + struct.pack(">I", zlib.crc32(b"IDAT" + idat_data)))
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    return b"\x89PNG\r\n\x1a\n" + ihdr + idat + iend


def jpeg_bytes(width: int, height: int) -> bytes:
    # APP0 length counts itself: 2 + 14 content bytes (JFIF\0, version,
    # units, x/y density, thumbnail dims) = 16
    app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x02"
            + b"\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00")
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", height, width) + b"\x01\x11\x00\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def gif_bytes(width: int, height: int) -> bytes:
    # packed flags 0x70: no global color table (0xf0 would promise one)
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x70\x00\x00" + b"\x00\x3b"
