"""From-scratch VP8L WebP codec (kernels/webp_codec.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intelligent_document_processing_on_aws_spark.kernels.webp_codec import (
    _PLANE_CODES,
    _BitWriter,
    _cache_hash,
    _write_prefix_code,
    WebpError,
    decode_webp,
    encode_webp,
)


def _rt(img, **kw):
    out = decode_webp(encode_webp(img, **kw))
    ref = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
    assert out.shape == ref.shape
    assert (out == ref).all()


def test_roundtrip_rgb_gray_rgba():
    rng = np.random.default_rng(7)
    _rt(rng.integers(0, 256, size=(8, 11, 3), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(5, 7), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(9, 6, 4), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(1, 1, 3), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(1, 17, 3), dtype=np.uint8))
    _rt(rng.integers(0, 256, size=(17, 1, 3), dtype=np.uint8))


def test_roundtrip_transforms():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    _rt(img, subtract_green=True)
    _rt(img, predictor=1)
    _rt(img, predictor=2)
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(16, dtype=np.uint8)[None, :] * 16
    grad[:, :, 1] = np.arange(16, dtype=np.uint8)[:, None] * 16
    _rt(grad, predictor=1)
    _rt(grad, subtract_green=True)


def test_roundtrip_palette_all_bundle_widths():
    rng = np.random.default_rng(13)
    for ncolors in (2, 3, 4, 9, 16, 17, 200):  # 8/4/2/1 px-per-byte paths
        vals = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        idx = rng.integers(0, ncolors, size=(13, 10))
        img = vals[idx]
        # force all palette entries present so the lut is exercised fully
        img[0, : min(10, ncolors)] = vals[: min(10, ncolors)]
        _rt(img, palette=True)


def test_roundtrip_palette_rgba_transparency():
    img = np.zeros((6, 6, 4), dtype=np.uint8)
    img[:, :, 1] = 200
    img[:, :, 3] = 255
    img[2:4, 2:4, 3] = 0  # transparent block -> second palette color
    _rt(img, palette=True)


def test_plane_code_table_matches_spec_head():
    # RFC 9649 §3.2.3 first ten (dx, dy) short-distance pairs
    assert _PLANE_CODES[:10] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
        (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1),
    ]
    assert len(_PLANE_CODES) == 120
    assert len(set(_PLANE_CODES)) == 120
    assert _PLANE_CODES[-1] == (8, 7)


def _wrap_vp8l(bits: _BitWriter) -> bytes:
    body = bits.tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _start(w: int, h: int) -> _BitWriter:
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    return bw


def _simple1(bw: _BitWriter, sym: int) -> None:
    """Simple prefix code, one symbol (0-bit decode)."""
    bw.write(1, 1)
    bw.write(0, 1)
    if sym <= 1:
        bw.write(0, 1)
        bw.write(sym, 1)
    else:
        bw.write(1, 1)
        bw.write(sym, 8)


def test_lz77_backward_reference_decode():
    """Handcrafted stream: one literal + a length-3 distance-1 copy
    (plane code 2 -> (1, 0)) fills a 4x1 row with the same pixel."""
    bw = _start(4, 1)
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    glens = [0] * (256 + 24)
    glens[10] = 1    # literal green 10
    glens[256 + 2] = 1  # length prefix code 2 -> length 3
    gcodes = _write_prefix_code(bw, glens)
    _simple1(bw, 20)   # red
    _simple1(bw, 30)   # blue
    _simple1(bw, 255)  # alpha
    _simple1(bw, 1)    # distance prefix sym 1 -> value 2 -> (1,0) -> dist 1
    bw.write_code(gcodes[10], glens[10])            # literal pixel
    bw.write_code(gcodes[256 + 2], glens[256 + 2])  # backref len 3
    out = decode_webp(_wrap_vp8l(bw))
    assert out.shape == (1, 4, 3)
    assert (out == np.array([20, 10, 30], dtype=np.uint8)).all()


def test_color_cache_decode():
    """Handcrafted stream: literal pixel then a color-cache hit."""
    cache_bits = 4
    px = (255 << 24) | (20 << 16) | (10 << 8) | 30
    idx = _cache_hash(px, cache_bits)
    bw = _start(2, 1)
    bw.write(1, 1)            # color cache on
    bw.write(cache_bits, 4)
    bw.write(0, 1)            # no meta prefix
    alphabet = 256 + 24 + (1 << cache_bits)
    glens = [0] * alphabet
    glens[10] = 1
    glens[256 + 24 + idx] = 1
    gcodes = _write_prefix_code(bw, glens)
    _simple1(bw, 20)
    _simple1(bw, 30)
    _simple1(bw, 255)
    _simple1(bw, 0)  # distance code (unused)
    bw.write_code(gcodes[10], glens[10])
    bw.write_code(gcodes[256 + 24 + idx], glens[256 + 24 + idx])
    out = decode_webp(_wrap_vp8l(bw))
    assert out.shape == (1, 2, 3)
    assert (out[0, 0] == out[0, 1]).all()
    assert tuple(out[0, 0]) == (20, 10, 30)


def test_lossy_vp8_is_explicit_boundary():
    lossy = (b"RIFF" + struct.pack("<I", 20) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(WebpError, match="lossy"):
        decode_webp(lossy)


def test_corrupt_payloads_raise_not_crash():
    rng = np.random.default_rng(3)
    good = encode_webp(rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8))
    for bad in (b"", b"RIFF", good[:20], good[:-4],
                good[:12] + b"XXXX" + good[16:]):
        with pytest.raises(WebpError):
            decode_webp(bad)


def test_header_dims_match_image_meta_kernel():
    from intelligent_document_processing_on_aws_spark.kernels.image_meta import (
        webp_size,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(23, 41, 3), dtype=np.uint8)
    data = encode_webp(img)
    assert webp_size(data) == (41, 23)
    out = decode_webp(data)
    assert out.shape == (23, 41, 3)


def test_encoder_rejects_oversize_palette_and_bad_modes():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    with pytest.raises(WebpError, match="256"):
        encode_webp(img, palette=True)  # ~1600 distinct colors
    with pytest.raises(WebpError, match="predictor"):
        encode_webp(img, predictor=7)
