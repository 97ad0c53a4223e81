"""From-scratch WAV/MP3/AVI codec kernels + the audio multimodal operators.

The reference hands non-document media to remote services untouched; this
engine decodes WAV PCM end-to-end and walks MP3/AVI container headers
with stdlib-only parsers (kernels/audio_codec.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from intelligent_document_processing_on_aws_spark.fixtures.media_gen import (
    avi_fixture_bytes,
    avi_params,
    mp3_fixture_bytes,
    mp3_params,
    wav_fixture_bytes,
    wav_params,
    wav_sample,
)
from intelligent_document_processing_on_aws_spark.kernels.audio_codec import (
    MP3_BITRATES_KBPS,
    MP3_SAMPLE_RATES,
    AudioError,
    decode_wav,
    encode_avi_header,
    encode_mp3_stream,
    encode_wav,
    mp3_frame_header,
    parse_avi,
    parse_mp3,
    wav_signal_stats,
)


# --- WAV -----------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_exact(bits, channels):
    lim = {8: 127, 16: 32767, 24: 8388607}[bits]
    rng = np.random.RandomState(bits * 10 + channels)
    samples = rng.randint(-lim - 1, lim + 1, size=400 * channels)
    data = encode_wav(samples, 22050, channels, bits)
    sr, ch, b, out = decode_wav(data)
    assert (sr, ch, b) == (22050, channels, bits)
    assert np.array_equal(out, samples)


def test_wav_chunk_walker_skips_unknown_chunks():
    samples = [1, -2, 3, -4]
    # odd-sized extra chunk exercises the even-padding rule
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx"
    data = encode_wav(samples, 8000, 1, 16, extra_chunk=extra)
    sr, ch, bits, out = decode_wav(data)
    assert sr == 8000 and list(out) == samples


def test_wav_trailing_partial_frame_dropped():
    # stereo 16-bit with an odd sample count: the dangling half-frame
    # must not appear in the decoded stream
    data = encode_wav([10, -10, 20], 8000, 2, 16)
    _, _, _, out = decode_wav(data)
    assert list(out) == [10, -10]


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda d: d[:30], "overruns"),
        (lambda d: b"RIFX" + d[4:], "not a RIFF/WAVE"),
        (lambda d: d[:12], "missing fmt"),
    ],
)
def test_wav_malformed_raises(mutate, msg):
    data = encode_wav([1, 2, 3], 8000, 1, 16)
    with pytest.raises(AudioError, match=msg):
        decode_wav(mutate(data))


def test_wav_non_pcm_format_degrades_loudly():
    with pytest.raises(AudioError, match="MPEG_LAYER3"):
        decode_wav(wav_fixture_bytes(13))


def test_wav_fuzz_random_bytes_never_crash():
    rng = np.random.RandomState(7)
    for n in (0, 3, 12, 64, 300):
        blob = rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()
        with pytest.raises(AudioError):
            decode_wav(b"RIFF" + blob[:4] + b"WAVE" + blob)


def test_wav_fixture_matches_closed_form():
    for i in (0, 1, 2, 5, 7, 31, 100):
        p = wav_params(i)
        sr, ch, bits, s = decode_wav(wav_fixture_bytes(i))
        assert (sr, ch, bits) == (p["sample_rate"], p["channels"], p["bits"])
        m = p["n_frames"] * p["channels"]
        assert len(s) == m
        assert all(int(s[k]) == wav_sample(i, k, bits) for k in range(m))


def test_wav_signal_stats_integer_exact():
    st = wav_signal_stats(np.array([3, -4, 0, 5, -1], dtype=np.int32))
    assert st == {
        "n_samples": 5, "peak_abs": 5, "sum_abs": 13, "sum_sq": 51,
        # sign flips: 3->-4, -4->0 (0 counts as non-negative), 5->-1
        "zero_crossings": 3,
    }
    assert wav_signal_stats(np.array([], dtype=np.int32))["n_samples"] == 0


# --- MP3 -----------------------------------------------------------------


def test_mp3_walk_counts_frames_and_duration():
    for i in range(10):
        p = mp3_params(i)
        r = parse_mp3(mp3_fixture_bytes(i))
        sr = MP3_SAMPLE_RATES[p["sr_idx"]]
        assert r["n_frames"] == p["n_frames"]
        assert r["sample_rate"] == sr
        assert r["bitrate_kbps"] == MP3_BITRATES_KBPS[p["bitrate_idx"]]
        assert r["duration_ms"] == p["n_frames"] * 1152 * 1000 // sr


def test_mp3_sync_scan_skips_leading_junk():
    stream = b"ID3 junk prefix" + encode_mp3_stream(5, 9, 0)
    assert parse_mp3(stream)["n_frames"] == 5


def test_mp3_truncated_final_frame_not_counted():
    stream = encode_mp3_stream(4, 9, 0)
    assert parse_mp3(stream[:-10])["n_frames"] == 3


def test_mp3_vbr_reports_minus_one():
    stream = encode_mp3_stream(3, 9, 0) + encode_mp3_stream(
        3, 11, 0, pad_fn=lambda k: 0)
    r = parse_mp3(stream)
    assert r["n_frames"] == 6 and r["bitrate_kbps"] == -1


def test_mp3_no_frames_raises():
    with pytest.raises(AudioError, match="no MPEG-1"):
        parse_mp3(b"not audio at all")
    with pytest.raises(AudioError):
        # free-format bitrate index 0 is rejected
        parse_mp3(mp3_frame_header(0b11, 0b01, 0, 0, 0) + b"\x00" * 100)


# --- AVI -----------------------------------------------------------------


def test_avi_parse_roundtrip():
    for i in range(8):
        p = avi_params(i)
        a = parse_avi(avi_fixture_bytes(i))
        assert a["width"] == p["width"] and a["height"] == p["height"]
        assert a["n_frames"] == p["n_frames"]
        assert a["us_per_frame"] == p["us_per_frame"]
        assert a["duration_ms"] == p["n_frames"] * p["us_per_frame"] // 1000


def test_avi_malformed_raises():
    good = encode_avi_header(320, 240, 100, 40000)
    with pytest.raises(AudioError, match="not a RIFF/AVI"):
        parse_avi(good[:8])
    with pytest.raises(AudioError, match="missing hdrl"):
        parse_avi(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    zero_rate = encode_avi_header(320, 240, 100, 0)
    with pytest.raises(AudioError, match="us_per_frame"):
        parse_avi(zero_rate)


# --- filetype routing ----------------------------------------------------


def test_filetype_routes_audio_video():
    from intelligent_document_processing_on_aws_spark.kernels import filetype

    assert filetype.detect_content_type(wav_fixture_bytes(0)) == filetype.AUDIO
    # offset-0 frame header routes; a junk-prefixed stream is the
    # parser's sync-scan job (parse_mp3), not the magic sniffer's —
    # detection stays conservative to avoid false audio positives
    assert filetype.detect_content_type(mp3_fixture_bytes(0)) == filetype.AUDIO
    assert filetype.detect_content_type(avi_fixture_bytes(2)) == filetype.VIDEO
    # an ID3v2 header (binary version byte) routes to audio
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x00rest"
    assert filetype.detect_content_type(id3) == filetype.AUDIO
    # prose that merely starts with "ID3" stays text
    assert filetype.detect_content_type(b"ID3 tags explained") == filetype.TEXT
    # RIFF/WEBP still routes to image, not audio
    from intelligent_document_processing_on_aws_spark.fixtures.media_gen import (
        webp_bytes,
    )

    assert filetype.detect_content_type(webp_bytes(10, 10)) == filetype.IMAGE


# --- Spark operators -----------------------------------------------------


def test_audio_signal_stats_operator(spark):
    from pyspark.sql import types as T

    from intelligent_document_processing_on_aws_spark.operators.multimodal import (
        audio_signal_stats,
    )

    rows = [(int(i), bytearray(wav_fixture_bytes(i))) for i in range(20)]
    schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    out = {r["item_id"]: r.asDict()
           for r in audio_signal_stats(
               spark.createDataFrame(rows, schema)).collect()}
    assert len(out) == 20
    for i in range(20):
        if i % 16 in (9, 13):
            assert out[i]["error"] and out[i]["n_samples"] is None
            continue
        p = wav_params(i)
        s = np.array([wav_sample(i, k, p["bits"])
                      for k in range(p["n_frames"] * p["channels"])])
        st = wav_signal_stats(s)
        assert out[i]["error"] is None
        assert out[i]["sum_sq"] == st["sum_sq"]
        assert out[i]["zero_crossings"] == st["zero_crossings"]
        assert out[i]["duration_ms"] == p["n_frames"] * 1000 // p["sample_rate"]


def test_probe_av_meta_dispatch_and_frame_sample(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from intelligent_document_processing_on_aws_spark.operators.multimodal import (
        frame_sample,
        probe_av_meta,
    )

    builders = {0: lambda i: wav_fixture_bytes(i, malformed=False),
                1: mp3_fixture_bytes, 2: avi_fixture_bytes}
    rows = [(int(i), bytearray(builders[i % 3](i))) for i in range(12)]
    schema = T.StructType([
        T.StructField("item_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    probed = probe_av_meta(spark.createDataFrame(rows, schema))
    got = {r["item_id"]: r.asDict() for r in probed.collect()}
    assert got[0]["container"] == "wav" and got[0]["modality"] == "audio"
    assert got[1]["container"] == "mp3" and got[1]["bitrate_kbps"] == 32
    assert got[2]["container"] == "avi" and got[2]["modality"] == "video"
    assert all(v["error"] is None for v in got.values())

    # probe output drives the video frame sampler end-to-end
    items = probed.where(F.col("modality") == "video").select(
        "item_id",
        F.lit("video").alias("modality"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.col("width"), F.col("height"),
            F.col("sample_rate"), F.col("n_frames"),
        ).alias("meta"),
    )
    sampled = frame_sample(items, every_n=50).collect()
    by_item = {}
    for r in sampled:
        by_item.setdefault(r["item_id"], []).append(r["frame_idx"])
    for i in (2, 5, 8, 11):
        n = avi_params(i)["n_frames"]
        assert sorted(by_item[i]) == list(range(0, n, 50))
