"""From-scratch stdlib audio/video container codecs: WAV PCM decode/encode,
MP3 frame-header walking, AVI header metadata.

The reference treats non-document media as opaque payloads handed to
remote services (lib/idp_common_pkg/idp_common/ocr/service.py routes by
magic only); this engine gives the multimodal column real, testable
decoders built from the public container specs:

- WAV (RIFF/WAVE, PCM): full chunk walker (even-byte padding, unknown
  chunks skipped), 8-bit unsigned / 16-bit / 24-bit signed LE sample
  decode to int32. Non-PCM format codes degrade loudly (AudioError with
  the codec id) — the honest boundary: compressed audio (MP3/AAC payload
  decode) needs entropy/MDCT codecs out of scope for a data pipeline.
- MP3 (MPEG-1 Layer III): sync-scan + frame-header walk using the public
  bitrate/sample-rate tables; yields frame count, sample rate, bitrate
  and an exact integer duration (1152 samples/frame) without touching
  the entropy-coded payload.
- AVI (RIFF 'AVI ' / hdrl / avih): width, height, total frames,
  microseconds-per-frame — the metadata the frame-sample operator needs.

Everything is deterministic integer math so oracles can re-derive every
derived quantity exactly.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioError(Exception):
    """Malformed or unsupported audio/video payload."""


# --- WAV -----------------------------------------------------------------

WAV_FORMAT_PCM = 1

# Registered wave format tags worth naming in errors (public mmreg.h ids).
_WAV_FORMAT_NAMES = {
    0x0002: "ADPCM",
    0x0003: "IEEE_FLOAT",
    0x0006: "ALAW",
    0x0007: "MULAW",
    0x0055: "MPEG_LAYER3",
    0xFFFE: "EXTENSIBLE",
}


def _riff_chunks(payload: bytes, offset: int, end: int):
    """Yield (chunk_id, data_start, data_size) walking a RIFF chunk list;
    chunk data is padded to even length per the RIFF spec."""
    pos = offset
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data_start = pos + 8
        if data_start + size > end:
            raise AudioError(
                f"chunk {cid!r} overruns container "
                f"({data_start + size} > {end})"
            )
        yield cid, data_start, size
        pos = data_start + size + (size & 1)


def decode_wav(payload: bytes):
    """Decode a PCM RIFF/WAVE payload.

    Returns ``(sample_rate, channels, bits, samples)`` where ``samples``
    is a 1-D int32 array of the raw interleaved frames (channel-major
    within each frame, native integer range for the bit depth: 8-bit is
    centred to [-128, 127], 16/24-bit are the signed values as stored).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    for cid, start, size in _riff_chunks(payload, 12, len(payload)):
        if cid == b"fmt " and fmt is None:
            if size < 16:
                raise AudioError(f"fmt chunk too short ({size} < 16)")
            fmt = struct.unpack_from("<HHIIHH", payload, start)
        elif cid == b"data" and data is None:
            data = payload[start : start + size]
    if fmt is None:
        raise AudioError("missing fmt chunk")
    if data is None:
        raise AudioError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != WAV_FORMAT_PCM:
        name = _WAV_FORMAT_NAMES.get(audio_format, hex(audio_format))
        raise AudioError(f"unsupported wave format {name}; PCM only")
    if channels < 1 or channels > 32:
        raise AudioError(f"implausible channel count {channels}")
    if bits not in (8, 16, 24):
        raise AudioError(f"unsupported PCM bit depth {bits}")
    bytes_per_sample = bits // 8
    if block_align != bytes_per_sample * channels:
        raise AudioError(
            f"block_align {block_align} != channels*sample_bytes "
            f"{bytes_per_sample * channels}"
        )
    n = len(data) // bytes_per_sample
    data = data[: n * bytes_per_sample]
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.int32)
    else:  # 24-bit signed LE: widen to 4 bytes then sign-correct
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        widened = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        samples = np.where(widened >= 1 << 23, widened - (1 << 24), widened)
    # drop a trailing partial frame so n_samples is a whole-frame count
    frames = len(samples) // channels
    return sample_rate, channels, bits, samples[: frames * channels]


def encode_wav(
    samples, sample_rate: int, channels: int = 1, bits: int = 16,
    extra_chunk: bytes | None = None,
) -> bytes:
    """Encode interleaved integer samples as a PCM RIFF/WAVE payload.

    ``extra_chunk`` (a pre-serialised id+size+data blob) is inserted
    BEFORE the fmt chunk to exercise real chunk-walking in decoders.
    """
    samples = np.asarray(samples, dtype=np.int64)
    if bits == 8:
        body = (samples + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        body = samples.astype("<i2").tobytes()
    elif bits == 24:
        s = np.where(samples < 0, samples + (1 << 24), samples).astype(np.uint32)
        raw = np.empty((len(s), 3), dtype=np.uint8)
        raw[:, 0] = s & 0xFF
        raw[:, 1] = (s >> 8) & 0xFF
        raw[:, 2] = (s >> 16) & 0xFF
        body = raw.tobytes()
    else:
        raise AudioError(f"unsupported PCM bit depth {bits}")
    bytes_per_sample = bits // 8
    block_align = bytes_per_sample * channels
    fmt = struct.pack(
        "<HHIIHH", WAV_FORMAT_PCM, channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = b""
    if extra_chunk:
        chunks += extra_chunk + (b"\x00" if len(extra_chunk) & 1 else b"")
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_signal_stats(samples: np.ndarray) -> dict:
    """Integer-exact signal statistics over an interleaved int32 stream:
    every quantity is a sum/extremum of integers, so an oracle can
    re-derive them exactly from a closed-form sample formula."""
    if len(samples) == 0:
        return {
            "n_samples": 0, "peak_abs": 0, "sum_abs": 0,
            "sum_sq": 0, "zero_crossings": 0,
        }
    s = samples.astype(np.int64)
    neg = s < 0
    return {
        "n_samples": int(len(s)),
        "peak_abs": int(np.abs(s).max()),
        "sum_abs": int(np.abs(s).sum()),
        "sum_sq": int((s * s).sum()),
        "zero_crossings": int((neg[1:] != neg[:-1]).sum()),
    }


# --- MP3 -----------------------------------------------------------------

# MPEG-1 Layer III tables (public, ISO/IEC 11172-3).
MP3_BITRATES_KBPS = (
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
MP3_SAMPLE_RATES = (44100, 48000, 32000)
MP3_SAMPLES_PER_FRAME = 1152


def mp3_frame_header(version2: int, layer2: int, bitrate_idx: int,
                     sr_idx: int, padding: int) -> bytes:
    """Serialise a 4-byte MPEG audio frame header (big-endian bit layout:
    11-bit sync, 2 version, 2 layer, 1 protection=1, 4 bitrate, 2 sample
    rate, 1 padding, 1 private, 2 mode=stereo, ...)."""
    word = (
        (0x7FF << 21)
        | (version2 << 19)
        | (layer2 << 17)
        | (1 << 16)          # no CRC
        | (bitrate_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
    )
    return struct.pack(">I", word)


def encode_mp3_stream(n_frames: int, bitrate_idx: int, sr_idx: int,
                      pad_fn=lambda k: k & 1, fill: int = 0xA5) -> bytes:
    """Build a syntactically valid MPEG-1 Layer III frame stream: real
    headers + deterministic filler payload (the entropy-coded body is
    opaque to a header walker by design)."""
    if not (1 <= bitrate_idx <= 14):
        raise AudioError(f"bitrate index {bitrate_idx} out of range")
    if not (0 <= sr_idx <= 2):
        raise AudioError(f"sample-rate index {sr_idx} out of range")
    sr = MP3_SAMPLE_RATES[sr_idx]
    kbps = MP3_BITRATES_KBPS[bitrate_idx]
    out = bytearray()
    for k in range(n_frames):
        pad = 1 if pad_fn(k) else 0
        frame_len = (144 * kbps * 1000) // sr + pad
        out += mp3_frame_header(0b11, 0b01, bitrate_idx, sr_idx, pad)
        out += bytes(((fill + k + j) & 0xFF) for j in range(frame_len - 4))
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Walk MPEG-1 Layer III frames from the first sync word.

    Returns n_frames, sample_rate, bitrate_kbps (of the first frame; -1
    if frames disagree, i.e. VBR) and exact integer duration_ms
    (n_frames * 1152 * 1000 // sample_rate). Stops at the first
    non-frame byte after at least one valid frame; zero valid frames is
    an AudioError.
    """
    # find first sync
    pos = 0
    n = len(payload)
    first = None
    while pos + 4 <= n:
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    n_frames = 0
    sample_rate = None
    bitrates: set[int] = set()
    while pos + 4 <= n:
        b1, b2 = payload[pos + 1], payload[pos + 2]
        if payload[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version2 = (b1 >> 3) & 0b11
        layer2 = (b1 >> 1) & 0b11
        if version2 != 0b11 or layer2 != 0b01:  # MPEG-1 Layer III only
            break
        bitrate_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0b11
        pad = (b2 >> 1) & 1
        if bitrate_idx in (0, 15) or sr_idx == 3:
            break
        sr = MP3_SAMPLE_RATES[sr_idx]
        kbps = MP3_BITRATES_KBPS[bitrate_idx]
        frame_len = (144 * kbps * 1000) // sr + pad
        if pos + frame_len > n:
            break  # truncated final frame: count only whole frames
        if first is None:
            first = pos
            sample_rate = sr
        elif sr != sample_rate:
            break
        bitrates.add(kbps)
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        raise AudioError("no MPEG-1 Layer III frames found")
    return {
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "bitrate_kbps": next(iter(bitrates)) if len(bitrates) == 1 else -1,
        "duration_ms": n_frames * MP3_SAMPLES_PER_FRAME * 1000 // sample_rate,
    }


# --- AVI -----------------------------------------------------------------


def encode_avi_header(width: int, height: int, total_frames: int,
                      us_per_frame: int) -> bytes:
    """Minimal spec-shaped AVI: RIFF 'AVI ' containing LIST hdrl with a
    real 56-byte avih chunk, then an empty LIST movi. Enough container
    structure that a parser must actually walk nested RIFF lists."""
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, total_frames, 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"hdrl" + avih_chunk
    hdrl_list = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    movi = b"movi"
    movi_list = b"LIST" + struct.pack("<I", len(movi)) + movi
    body = b"AVI " + hdrl_list + movi_list
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> dict:
    """Parse the avih main header out of a RIFF 'AVI ' container:
    width, height, n_frames, us_per_frame and exact integer duration_ms
    (n_frames * us_per_frame // 1000)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AudioError("not a RIFF/AVI payload")
    for cid, start, size in _riff_chunks(payload, 12, len(payload)):
        if cid != b"LIST" or payload[start : start + 4] != b"hdrl":
            continue
        for sub_id, sub_start, sub_size in _riff_chunks(
            payload, start + 4, start + size
        ):
            if sub_id != b"avih":
                continue
            if sub_size < 40:
                raise AudioError(f"avih chunk too short ({sub_size})")
            vals = struct.unpack_from("<10I", payload, sub_start)
            us_per_frame, _, _, _, total_frames = vals[:5]
            width, height = vals[8], vals[9]
            if us_per_frame == 0:
                raise AudioError("avih us_per_frame is zero")
            return {
                "width": width,
                "height": height,
                "n_frames": total_frames,
                "us_per_frame": us_per_frame,
                "duration_ms": total_frames * us_per_frame // 1000,
            }
        raise AudioError("hdrl list has no avih chunk")
    raise AudioError("missing hdrl list")
