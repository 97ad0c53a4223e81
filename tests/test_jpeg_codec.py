"""From-scratch baseline JPEG codec (kernels/jpeg_codec, r5)."""

from __future__ import annotations

import numpy as np
import pytest

from intelligent_document_processing_on_aws_spark.kernels.jpeg_codec import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
)

rng = np.random.RandomState(81)


def test_solid_blocks_roundtrip_exact():
    """A solid color is a pure DC block: quantization cannot disturb it —
    decode(encode(x)) must be EXACT (modulo the +-1 color-transform
    rounding absorbed by q>=90 luma table entry 16 -> 0 here)."""
    g = np.full((16, 16), 130, np.uint8)
    assert (decode_jpeg(encode_jpeg(g, quality=90)) == g).all()
    c = np.zeros((24, 17, 3), np.uint8)
    c[:] = (200, 80, 40)
    assert (decode_jpeg(encode_jpeg(c, quality=90)) == c).all()
    # subsampled solid: chroma box-average of a constant is the constant
    assert (decode_jpeg(encode_jpeg(c, quality=90, subsample=True)) == c).all()


def test_smooth_gradient_error_bound():
    y, x = np.mgrid[0:40, 0:56]
    img = np.stack([(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256],
                   axis=2).astype(np.uint8)
    img = (img // 2 + 60).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert err.max() <= 4 and err.mean() < 1.0


def test_nonmultiple_of_8_dims_and_gray():
    g = ((np.mgrid[0:33, 0:29][0] * 5) % 200).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert out.shape == (33, 29)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 6


def test_subsample_420_shape_and_bound():
    y, x = np.mgrid[0:37, 0:50]
    img = np.stack([60 + x * 2, 70 + y * 2, 80 + (x + y)],
                   axis=2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # chroma is box-averaged 2x2 then replicated: smooth-gradient error
    # stays within the averaging radius
    assert err.max() <= 6


def test_restart_markers_roundtrip():
    y, x = np.mgrid[0:37, 0:50]
    img = np.stack([60 + x * 2, 70 + y * 2, 80 + (x + y)],
                   axis=2).astype(np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=95))
    b = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=3))
    # restart markers change the byte stream, not the decoded pixels
    assert (a == b).all()
    c = decode_jpeg(encode_jpeg(img, quality=95, subsample=True,
                                restart_interval=2))
    assert c.shape == img.shape


def test_noise_determinism_and_lossiness():
    img = rng.randint(0, 256, (33, 29, 3), np.uint8)
    p1, p2 = encode_jpeg(img, quality=75), encode_jpeg(img, quality=75)
    assert p1 == p2                      # encoder is deterministic
    o1, o2 = decode_jpeg(p1), decode_jpeg(p2)
    assert (o1 == o2).all()              # decoder is deterministic
    # and genuinely lossy on noise (sanity that we're not memcpy-ing)
    assert np.abs(o1.astype(int) - img.astype(int)).mean() > 1


def test_quality_monotone():
    y, x = np.mgrid[0:32, 0:32]
    img = ((x * 7 + y * 5) % 256).astype(np.uint8)
    errs = []
    for q in (30, 60, 90):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


@pytest.mark.parametrize("mutate", [
    lambda d: b"no" + d[2:],                       # missing SOI
    lambda d: d[:40],                              # truncated mid-segment
    lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive SOF
])
def test_malformed_raises_jpegerror(mutate):
    img = np.full((8, 8), 99, np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(JpegError):
        decode_jpeg(mutate(good))


def test_decode_resize_images_routes_jpeg(spark):
    """The multimodal decode/resize operator dispatches JPEG payloads to
    the huffman decoder; truncated payloads land in the error column."""
    import hashlib

    from intelligent_document_processing_on_aws_spark.fixtures.media_gen import (
        gradient_jpeg,
    )
    from intelligent_document_processing_on_aws_spark.kernels.image_ops import (
        resize_array,
    )
    from intelligent_document_processing_on_aws_spark.operators.multimodal import (
        decode_resize_images,
    )

    rows = [(i, bytearray(gradient_jpeg(i))) for i in range(12)]
    df = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {r.item_id: r
           for r in decode_resize_images(df, target_w=60, target_h=45)
           .collect()}
    assert len(got) == 12
    for i in range(12):
        if i % 16 == 9:
            assert got[i].error and got[i].error.startswith("JpegError")
            continue
        img = decode_jpeg(bytes(gradient_jpeg(i)))
        if img.ndim == 2:
            img = np.dstack([img, img, img])
        out = resize_array(img[:, :, :3], 60, 45)
        assert got[i].error is None
        assert (got[i].out_width, got[i].out_height) == (
            out.shape[1], out.shape[0])
        assert got[i].resized_sha1 == hashlib.sha1(out.tobytes()).hexdigest()
