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


def bmp_bytes(width: int, height: int) -> bytes:
    # BITMAPINFOHEADER; even ids get top-down rows (negative height)
    h = -height if width % 2 == 0 else height
    dib = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, 0, 2835, 2835,
                      0, 0)
    return b"BM" + struct.pack("<IHHI", 14 + 40 + 4, 0, 0, 54) + dib + b"\x00" * 4


def tiff_bytes(width: int, height: int) -> bytes:
    # big-endian when width is odd (exercises both byte orders); SHORT
    # width / LONG height entry types
    bo = ">" if width % 2 else "<"
    order = b"MM\x00*" if width % 2 else b"II*\x00"
    entries = (
        struct.pack(f"{bo}HHI", 256, 3, 1) + struct.pack(f"{bo}H", width)
        + b"\x00\x00"
        + struct.pack(f"{bo}HHI", 257, 4, 1) + struct.pack(f"{bo}I", height)
    )
    ifd = struct.pack(f"{bo}H", 2) + entries + struct.pack(f"{bo}I", 0)
    return order + struct.pack(f"{bo}I", 8) + ifd


def webp_bytes(width: int, height: int) -> bytes:
    # rotate the three container shapes: VP8X canvas / lossy VP8 / VP8L
    v = (width + height) % 3
    if v == 0:
        payload = (b"\x2f" + struct.pack(
            "<I", (width - 1) | ((height - 1) << 14)))
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    elif v == 1:
        payload = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                   + struct.pack("<HH", width, height) + b"\x00" * 4)
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    else:
        payload = (b"\x00\x00\x00\x00"
                   + (width - 1).to_bytes(3, "little")
                   + (height - 1).to_bytes(3, "little"))
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    if len(chunk) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# -- real-pixel PNG fixtures (r5: codec-backed resize path) -------------------

def gradient_image(i: int):
    """Deterministic real pixel content for item i: closed-form gradient
    (no RNG — the oracle re-derives it from the same integer formulas).
    Shape rotates gray / RGB / RGBA; dims span 160..999 x 120..999 so the
    corpus mixes downscale and leave-unchanged cases against the
    reference's 951x1268 fit-within target."""
    import numpy as np

    w = 160 + (i * 97) % 840
    h = 120 + (i * 61) % 880
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    base = (x * 3 + y * 5 + i * 11) % 256
    if i % 3 == 0:
        return base.astype(np.uint8)
    n_ch = 3 if i % 3 == 1 else 4
    return np.stack(
        [((base + c * 17 + i * 7) % 256).astype(np.uint8)
         for c in range(n_ch)], axis=2)


def _gradient_row_filter(y: int) -> int:
    """Cycle the vectorized filters (None/Sub/Up) with periodic Average
    and Paeth rows — every decoder filter path exercised per image."""
    if y % 29 == 7:
        return 3
    if y % 29 == 8:
        return 4
    return (0, 1, 2)[y % 3]


def gradient_png(i: int) -> bytes:
    """encode_png of gradient_image(i); every 16th item (i % 16 == 5) is
    TRUNCATED mid-chunk — a malformed payload that must land in the
    operator's error column, never raise."""
    from ..kernels.png_codec import encode_png

    data = encode_png(gradient_image(i), row_filter=_gradient_row_filter)
    if i % 16 == 5:
        return data[:30]
    return data


def jpeg_gradient_image(i: int):
    """Deterministic pixels for the JPEG fixture family (r5): smaller dims
    than the PNG family (huffman decode is Python-loop work), gray/RGB
    rotation, closed-form gradient content."""
    import numpy as np

    w = 64 + (i * 37) % 200
    h = 48 + (i * 29) % 200
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    base = (x * 5 + y * 7 + i * 13) % 256
    if i % 2 == 0:
        return base.astype(np.uint8)
    return np.stack(
        [((base + c * 23 + i * 11) % 256).astype(np.uint8)
         for c in range(3)], axis=2)


def gif_gradient_image(i: int):
    """Closed-form palette-friendly pixels for the GIF fixture family:
    rotates gray (256-level palette) / 216-color RGB cube / RGBA with
    binary alpha. Dims stay modest — GIF LZW decode is Python-loop work
    like the JPEG huffman path."""
    import numpy as np

    w = 80 + (i * 53) % 240
    h = 60 + (i * 41) % 240
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    if i % 3 == 0:
        return ((x * 3 + y * 5 + i * 11) % 256).astype(np.uint8)
    q = (x * 2 + y * 3 + i * 7) % 216
    rgb = np.stack(
        [(q // 36 * 51).astype(np.uint8),
         (q // 6 % 6 * 51).astype(np.uint8),
         (q % 6 * 51).astype(np.uint8)], axis=2)
    if i % 3 == 1:
        return rgb
    alpha = np.where((x + y + i) % 7 == 0, 0, 255).astype(np.uint8)
    return np.dstack([rgb, alpha])


def gradient_gif(i: int) -> bytes:
    """encode_gif of gif_gradient_image(i), rotating interlace; every
    16th item (i % 16 == 5) is truncated (error-column row)."""
    from ..kernels.gif_codec import encode_gif

    data = encode_gif(gif_gradient_image(i), interlace=(i % 2 == 0))
    if i % 16 == 5:
        return data[:40]
    return data


def gradient_bmp(i: int) -> bytes:
    """encode_bmp of gradient_image(i) — gray rows take the 8-bit palette
    path, RGB 24-bit, RGBA 32-bit BITFIELDS; row order rotates; every
    16th item truncated."""
    from ..kernels.bmp_codec import encode_bmp

    data = encode_bmp(gradient_image(i), top_down=(i % 2 == 0))
    if i % 16 == 5:
        return data[:48]
    return data


def gradient_tiff(i: int) -> bytes:
    """encode_tiff of gradient_image(i), rotating byte order / strip
    size / PackBits; every 16th item truncated."""
    from ..kernels.tiff_codec import encode_tiff

    data = encode_tiff(
        gradient_image(i),
        big_endian=(i % 2 == 1),
        rows_per_strip=(i % 5) * 37,
        packbits=(i % 3 == 0),
    )
    if i % 16 == 5:
        return data[:32]
    return data


def gradient_jpeg(i: int) -> bytes:
    """encode_jpeg of jpeg_gradient_image(i), rotating quality /
    4:2:0 subsampling / restart-marker settings so the decoder's paths
    are all exercised; every 16th item (i % 16 == 9) is truncated
    mid-stream (error-column row)."""
    from ..kernels.jpeg_codec import encode_jpeg

    img = jpeg_gradient_image(i)
    data = encode_jpeg(
        img,
        quality=70 + (i * 11) % 31,
        subsample=(i % 3 == 1 and img.ndim == 3),
        restart_interval=(4 if i % 5 == 0 else 0),
    )
    if i % 16 == 9:
        return data[:24]
    return data


def webp_gradient_image(i: int):
    """Closed-form pixels for the WebP fixture family: gray / RGB / RGBA
    rotation with modest dims (VP8L entropy coding is Python-loop work
    like the GIF LZW path)."""
    import numpy as np

    w = 64 + (i * 47) % 160
    h = 48 + (i * 37) % 160
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    base = (x * 5 + y * 7 + i * 13) % 256
    if i % 3 == 0:
        return base.astype(np.uint8)
    n_ch = 3 if i % 3 == 1 else 4
    return np.stack(
        [((base + c * 29 + i * 3) % 256).astype(np.uint8)
         for c in range(n_ch)], axis=2)


def gradient_webp(i: int) -> bytes:
    """encode_webp of webp_gradient_image(i), rotating the transform
    (none / subtract-green / left-predictor / top-predictor); every 16th
    item truncated (error-column row)."""
    from ..kernels.webp_codec import encode_webp

    img = webp_gradient_image(i)
    mode = (i // 4) % 4
    if mode == 1:
        data = encode_webp(img, subtract_green=True)
    elif mode == 2:
        data = encode_webp(img, predictor=1)
    elif mode == 3:
        data = encode_webp(img, predictor=2)
    else:
        data = encode_webp(img)
    if i % 16 == 5:
        return data[:36]
    return data


# --- audio / video fixtures (r5) ----------------------------------------
#
# Every parameter below is a closed-form integer function of the item id
# so a SQL oracle can re-derive both the construction parameters AND the
# decoded sample values without parsing a byte. The WAV sample stream is
# generated INTERLEAVED directly: sample k of item i is
#   16-bit: ((i*2654435761 + k*40503) % 65536) - 32768
#    8-bit: ((i*97 + k*31) % 256) - 128        (stored as unsigned v+128)

WAV_SAMPLE_RATES = (8000, 11025, 16000, 22050, 32000, 44100)


def wav_params(i: int) -> dict:
    """Closed-form WAV fixture parameters for item i (mirrored in the
    audio_features oracle SQL)."""
    return {
        "bits": 8 if i % 3 == 1 else 16,
        "channels": 1 + (i % 2),
        "sample_rate": WAV_SAMPLE_RATES[i % 6],
        "n_frames": 300 + (i * 37) % 700,
    }


def wav_sample(i: int, k: int, bits: int) -> int:
    if bits == 16:
        return ((i * 2654435761 + k * 40503) % 65536) - 32768
    return ((i * 97 + k * 31) % 256) - 128


def wav_fixture_bytes(i: int, malformed: bool = True) -> bytes:
    """Deterministic PCM WAV for item i. Malformed variants (only when
    ``malformed`` is True):
    i%16==9  -> truncated mid-header (AudioError: chunk overrun)
    i%16==13 -> fmt claims MPEG_LAYER3 (AudioError: unsupported codec).
    An extra LIST chunk before fmt exercises real chunk walking."""
    from ..kernels.audio_codec import encode_wav

    p = wav_params(i)
    m = p["n_frames"] * p["channels"]
    samples = [wav_sample(i, k, p["bits"]) for k in range(m)]
    extra = b"LIST" + struct.pack("<I", 11) + b"INFOfixture"
    data = encode_wav(samples, p["sample_rate"], p["channels"], p["bits"],
                      extra_chunk=extra)
    if malformed and i % 16 == 9:
        return data[:30]
    if malformed and i % 16 == 13:
        # overwrite the fmt audio_format field (fmt follows the 23-byte
        # padded LIST chunk at offset 12): format tag is 8 bytes into
        # the fmt chunk header
        fmt_off = 12 + 8 + 11 + 1 + 8
        return data[:fmt_off] + struct.pack("<H", 0x0055) + data[fmt_off + 2:]
    return data


def mp3_params(i: int) -> dict:
    """Closed-form MP3 fixture parameters (mirrored in oracle SQL)."""
    return {
        "n_frames": 40 + (i * 7) % 160,
        "bitrate_idx": 1 + (i // 3) % 14,
        "sr_idx": (i // 3) % 3,
    }


def mp3_fixture_bytes(i: int) -> bytes:
    """MPEG-1 Layer III frame stream with alternating padding bits and
    deterministic filler; preceded by i%5 junk bytes so the parser's
    sync-scan is exercised."""
    from ..kernels.audio_codec import encode_mp3_stream

    p = mp3_params(i)
    junk = bytes((0x20 + j) for j in range(i % 5))
    return junk + encode_mp3_stream(
        p["n_frames"], p["bitrate_idx"], p["sr_idx"])


AVI_FPS = (10, 15, 24, 25, 30)


def avi_params(i: int) -> dict:
    """Closed-form AVI fixture parameters (mirrored in oracle SQL)."""
    return {
        "width": 160 + (i * 11) % 480,
        "height": 120 + (i * 13) % 360,
        "n_frames": 24 + (i * 3) % 240,
        "us_per_frame": 1000000 // AVI_FPS[i % 5],
    }


def avi_fixture_bytes(i: int) -> bytes:
    from ..kernels.audio_codec import encode_avi_header

    p = avi_params(i)
    return encode_avi_header(
        p["width"], p["height"], p["n_frames"], p["us_per_frame"])
