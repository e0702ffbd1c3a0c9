"""Real WAV/PCM decode (operators/multimodal.py::wav_pcm_stats) against
stdlib-`wave`-written files — the decode step here is NOT a stub."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest


def _make_wav(rate=8000, n_ch=1, bits=16, seconds=0.05, freq=440.0) -> bytes:
    n = int(rate * seconds)
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_ch)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    t = np.arange(n)
    if bits == 16:
        samples = (10000 * np.sin(2 * math.pi * freq * t / rate)).astype("<i2")
        frames = np.repeat(samples, n_ch).tobytes()
    else:
        samples = (128 + 100 * np.sin(2 * math.pi * freq * t / rate)).astype("u1")
        frames = np.repeat(samples, n_ch).tobytes()
    w.writeframes(frames)
    w.close()
    return buf.getvalue()


def test_wav_stats_parses_real_wavs(spark):
    from community_detection_flink_spark.operators.multimodal import wav_pcm_stats

    wav_a = _make_wav(rate=8000, n_ch=1, bits=16)
    wav_b = _make_wav(rate=44100, n_ch=2, bits=16, seconds=0.01)
    wav_c = _make_wav(rate=16000, n_ch=1, bits=8)
    df = spark.createDataFrame(
        [(0, bytearray(wav_a)), (1, bytearray(wav_b)), (2, bytearray(wav_c)),
         (3, bytearray(b"not a wav at all"))],
        "doc_id LONG, blob BINARY",
    )
    got = {r.doc_id: r for r in wav_pcm_stats(df).collect()}

    assert (got[0].n_channels, got[0].sample_rate, got[0].bits_per_sample) == (1, 8000, 16)
    assert got[0].ok and got[0].n_frames == 400
    assert got[0].duration_s == pytest.approx(0.05)
    # RMS of a 10000-amplitude sine ≈ 10000/√2
    assert got[0].rms == pytest.approx(10000 / math.sqrt(2), rel=0.01)

    assert (got[1].n_channels, got[1].sample_rate) == (2, 44100)
    assert got[1].n_frames == 441

    assert (got[2].bits_per_sample, got[2].sample_rate) == (8, 16000)
    assert got[2].rms == pytest.approx(100 / math.sqrt(2), rel=0.02)

    # corrupt input yields a flagged row, not a task failure
    assert got[3].ok is False and got[3].n_frames == 0


def test_wav_stats_chunk_walking(spark):
    """Extra chunks before fmt/data (LIST metadata) must not break the
    parser — it walks the chunk list instead of assuming offsets."""
    from community_detection_flink_spark.operators.multimodal import _parse_wav

    base = _make_wav(rate=8000, n_ch=1, bits=16, seconds=0.01)
    # splice a LIST chunk between WAVE and fmt
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:12] + lst + base[12:]
    # fix RIFF size
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    parsed = _parse_wav(spliced)
    assert parsed is not None
    n_ch, rate, bits, n_frames, _, _ = parsed
    assert (n_ch, rate, bits, n_frames) == (1, 8000, 16, 80)


def test_wav_stats_truncated_and_odd_sizes(spark):
    from community_detection_flink_spark.operators.multimodal import _parse_wav

    wavb = _make_wav(seconds=0.01)
    assert _parse_wav(wavb[:10]) is None          # shorter than header
    assert _parse_wav(b"RIFF\x00\x00\x00\x00XXXX") is None  # not WAVE
    # float-PCM (format 3) rejected, not mis-decoded
    mutated = bytearray(wavb)
    fmt_at = wavb.index(b"fmt ")
    struct.pack_into("<H", mutated, fmt_at + 8, 3)
    assert _parse_wav(bytes(mutated)) is None


def _make_bmp(w, h, rgb=(10, 20, 30), top_down=False):
    r, g, b = rgb
    stride = (w * 3 + 3) & ~3
    row = (bytes((b, g, r)) * w) + b"\x00" * (stride - w * 3)
    pixels = row * h
    hh = -h if top_down else h
    info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    filehdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return filehdr + info + pixels


def test_bmp_stats_parses_real_bmps(spark):
    from community_detection_flink_spark.operators.multimodal import bmp_stats

    df = spark.createDataFrame(
        [
            (0, bytearray(_make_bmp(5, 3, (200, 100, 50)))),   # stride padding (5*3=15→16)
            (1, bytearray(_make_bmp(4, 2, (1, 2, 3), top_down=True))),
            (2, bytearray(b"BM but not really")),
        ],
        "doc_id LONG, blob BINARY",
    )
    got = {r.doc_id: r for r in bmp_stats(df).collect()}
    assert got[0].ok and (got[0].width, got[0].height, got[0].bits) == (5, 3, 24)
    assert (got[0].mean_r, got[0].mean_g, got[0].mean_b) == (200.0, 100.0, 50.0)
    assert got[1].ok and (got[1].width, got[1].height) == (4, 2)
    assert got[2].ok is False


def test_bmp_rejects_compressed_and_truncated(spark):
    from community_detection_flink_spark.operators.multimodal import _parse_bmp

    good = _make_bmp(4, 4)
    assert _parse_bmp(good) is not None
    assert _parse_bmp(good[:-5]) is None          # truncated pixel data
    mutated = bytearray(good)
    struct.pack_into("<I", mutated, 30, 1)        # BI_RLE8 compression
    assert _parse_bmp(bytes(mutated)) is None
    mutated = bytearray(good)
    struct.pack_into("<H", mutated, 28, 8)        # 8-bit paletted
    assert _parse_bmp(bytes(mutated)) is None


def test_bmp_roundtrip_means_are_exact(spark):
    from community_detection_flink_spark.operators.multimodal import (
        bmp_stats,
        synthesize_bmp_blobs,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id LONG")
    got = {r.doc_id: r for r in bmp_stats(synthesize_bmp_blobs(docs)).collect()}
    for i in range(40):
        assert got[i].ok
        assert got[i].width == 8 + i % 24 and got[i].height == 4 + i % 12
        # solid color → the mean is EXACTLY the channel value
        assert got[i].mean_r == float(i % 256)
        assert got[i].mean_g == float((i * 7) % 256)
        assert got[i].mean_b == float((i * 13) % 256)
