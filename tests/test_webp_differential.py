"""Differential validation of the from-scratch VP8L codec against the
canonical Google libwebp (via the gated ctypes binding in
kernels/webp_sys.py).

Two independent spec-compliance checks no roundtrip test can provide:

* forward  — OUR encoder's bitstreams decoded by libwebp, pixel-exact
  vs the input (proves the emitted bitstream is spec-valid, not merely
  self-consistent; this harness caught a real _CLC_ORDER bug and a
  nonstandard Kraft-closure early stop in earlier revisions);
* reverse  — libwebp-encoded lossless files decoded by OUR decoder,
  bit-exact vs the canonical decoder's output on the SAME stream
  (canonical equivalence).  Note the reverse check compares against
  libwebp's decode, not the raw input: libwebp's default lossless
  encoder is "non-exact" — it may rewrite RGB under alpha=0 pixels for
  compression — so input equality only holds where alpha != 0.

Plus the gated lossy-VP8 path: operators/multimodal._decode_image
routes 'VP8 ' containers through the system decoder when present.

The whole module skips cleanly when the shared object is absent — the
from-scratch codec's own roundtrip/fuzz suite (test_webp_codec.py) is
environment-independent.

Reference parity: the reference decodes every raster format via
PIL/OpenCV (idp_common/image/__init__.py:13-96), i.e. via exactly this
kind of system codec library.
"""

from __future__ import annotations

import numpy as np
import pytest

from intelligent_document_processing_on_aws_spark.kernels import webp_sys
from intelligent_document_processing_on_aws_spark.kernels.webp_codec import (
    decode_webp,
    encode_webp,
    has_lossy_vp8,
)

pytestmark = pytest.mark.skipif(
    not webp_sys.available(), reason="system libwebp not present"
)


def _rgba(a: np.ndarray) -> np.ndarray:
    """Normalize any decode result / input to (h, w, 4) RGBA."""
    a = np.asarray(a, dtype=np.uint8)
    if a.ndim == 2:
        a = np.dstack([a, a, a])
    if a.shape[2] == 3:
        a = np.dstack([a, np.full(a.shape[:2], 255, np.uint8)])
    return a


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(7)
    grad = np.add.outer(np.arange(40, dtype=np.uint8),
                        np.arange(60, dtype=np.uint8))
    return {
        "solid": np.full((8, 8, 4), 200, np.uint8),
        "two_color": np.tile(
            np.array([[0, 255]], np.uint8), (6, 8))[..., None].repeat(4, -1),
        "few_colors": (np.arange(16, dtype=np.uint8).reshape(4, 4)
                       [..., None].repeat(4, -1) * 16),
        "rand_opaque": np.dstack([
            rng.integers(0, 256, (23, 31, 3), dtype=np.uint8),
            np.full((23, 31), 255, np.uint8)]),
        "rand_rgba": rng.integers(0, 256, (13, 19, 4), dtype=np.uint8),
        "gradient": np.dstack([grad] * 3 + [np.full((40, 60), 255,
                                                    np.uint8)]),
        "wide_wrap": np.tile(np.arange(300, dtype=np.uint8)[None, :, None],
                             (5, 1, 4)),
        "tall_1px": np.arange(200, dtype=np.uint8).reshape(200, 1, 1)
                      .repeat(4, -1),
        "translucent": np.dstack([
            rng.integers(0, 256, (11, 17, 3), dtype=np.uint8),
            rng.integers(1, 256, (11, 17), dtype=np.uint8)]),
    }


@pytest.mark.parametrize("name", sorted(_cases()))
def test_forward_our_encode_libwebp_decode(name):
    """Our encoder's bitstream, decoded by canonical libwebp, is
    pixel-exact vs the input for every content shape."""
    img = np.ascontiguousarray(_cases()[name])
    enc = encode_webp(img)
    assert not has_lossy_vp8(enc)
    dec = webp_sys.decode_rgba(enc)
    assert np.array_equal(_rgba(dec), _rgba(img))


@pytest.mark.parametrize("name", sorted(_cases()))
def test_reverse_libwebp_encode_our_decode(name):
    """Our decoder is bit-exact with the canonical decoder on
    libwebp-encoded lossless streams (and matches the input wherever
    alpha != 0 — non-exact alpha cleanup is the only divergence libwebp's
    encoder introduces)."""
    img = np.ascontiguousarray(_cases()[name])
    enc = webp_sys.encode_lossless(img)
    ours = _rgba(decode_webp(enc))
    canonical = _rgba(webp_sys.decode_rgba(enc))
    assert np.array_equal(ours, canonical)
    visible = _rgba(img)[..., 3] != 0
    assert np.array_equal(ours[visible], _rgba(img)[visible])


def test_lossy_vp8_gated_decode():
    """multimodal._decode_image routes lossy 'VP8 ' containers through
    the system decoder: right dims, plausible pixels (lossy, so only
    approximate), and has_lossy_vp8 discriminates the container."""
    from intelligent_document_processing_on_aws_spark.operators.multimodal import (
        _decode_image,
    )

    img = np.dstack(
        [np.add.outer(np.arange(24, dtype=np.uint8) * 8,
                      np.arange(36, dtype=np.uint8) * 4)] * 3
        + [np.full((24, 36), 255, np.uint8)])
    lossy = webp_sys.encode_lossy(img, quality=90.0)
    assert has_lossy_vp8(lossy)
    dec = _decode_image(lossy)
    assert dec.shape[:2] == (24, 36)
    err = np.abs(dec[..., :3].astype(int) - img[..., :3].astype(int))
    assert float(err.mean()) < 16.0  # quality-90 stays close

    lossless = webp_sys.encode_lossless(img)
    assert not has_lossy_vp8(lossless)
    assert np.array_equal(_rgba(_decode_image(lossless)), img)


def test_fuzz_roundtrip_through_canonical(subtests=None):
    """Randomized differential sweep: 25 seeded images of varying
    size/alpha/palette density, both directions."""
    rng = np.random.default_rng(20260817)
    for i in range(25):
        h = int(rng.integers(1, 48))
        w = int(rng.integers(1, 48))
        ncol = int(rng.integers(2, 40))
        pal = rng.integers(0, 256, (ncol, 4), dtype=np.uint8)
        pal[:, 3] = np.maximum(pal[:, 3], 1)  # avoid alpha-cleanup pixels
        img = pal[rng.integers(0, ncol, (h, w))]
        img = np.ascontiguousarray(img)
        enc = encode_webp(img)
        assert np.array_equal(_rgba(webp_sys.decode_rgba(enc)), img), i
        enc_sys = webp_sys.encode_lossless(img)
        assert np.array_equal(
            _rgba(decode_webp(enc_sys)),
            _rgba(webp_sys.decode_rgba(enc_sys))), i
