"""MP4/ISO-BMFF container parsing (r10): real box-tree walking, real
sample-table extraction — the codec payload stays the documented stub.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from community_detection_flink_spark.operators import multimodal as M


def test_mp4_roundtrip_metadata(spark):
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id LONG")
    out = M.mp4_metadata(M.synthesize_mp4_blobs(docs)).collect()
    assert len(out) == 25
    for r in out:
        n = 3 + r.doc_id % 5
        size = 16 + r.doc_id % 32
        assert r.ok and r.timescale == 1000 and r.duration_ticks == n * 100
        assert r.n_tracks == 1 and r.n_samples == n
        assert r.sample_bytes_total == n * size and r.codec == "raw "


def test_mp4_sample_extraction_matches_construction(spark):
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id LONG")
    out = M.mp4_sample_frames(
        M.synthesize_mp4_blobs(docs), every_k=2
    ).collect()
    for r in out:
        size = 16 + r.doc_id % 32
        v = (r.doc_id * 7 + r.sample_no * 13) % 256
        assert r.sample_no % 2 == 0
        assert r.byte_offset == r.sample_no * size
        assert r.sample_bytes == size
        # value/checksum computed from the EXTRACTED bytes — equality
        # proves the stco offset + stsz walk found the real payload
        assert r.value == v and r.checksum == v * size
    # every doc contributed ceil(n/2) samples
    from collections import Counter

    per_doc = Counter(r.doc_id for r in out)
    for i in range(25):
        n = 3 + i % 5
        assert per_doc[i] == (n + 1) // 2


def test_mp4_malformed_blobs_surface_not_crash(spark):
    rows = [(0, bytearray(b"definitely not an mp4")),
            (1, bytearray(b"\x00\x00\x00\x08ftyp")),  # truncated
            (2, bytearray(b""))]
    df = spark.createDataFrame(rows, "doc_id LONG, blob BINARY")
    meta = {r.doc_id: r.ok for r in M.mp4_metadata(df).collect()}
    assert meta == {0: False, 1: False, 2: False}
    assert M.mp4_sample_frames(df).count() == 0


def test_mp4_parser_handles_version1_mvhd():
    # 64-bit-time mvhd (version 1) — real MP4s from modern muxers use
    # it; the walker must read the wide fields
    import struct

    ftyp = M._mp4_box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
    mvhd_v1 = M._mp4_box(
        b"mvhd",
        bytes([1, 0, 0, 0])
        + struct.pack(">QQIQ", 0, 0, 90000, 123456789)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    stsd = M._mp4_box(b"stsd", struct.pack(">II", 0, 1)
                      + struct.pack(">I", 16) + b"raw " + b"\x00" * 6
                      + struct.pack(">H", 1))
    stsz = M._mp4_box(b"stsz", struct.pack(">III", 0, 4, 2))
    stco = M._mp4_box(b"stco", struct.pack(">III", 0, 1, 0))
    stbl = M._mp4_box(b"stbl", stsd + stsz + stco)
    minf = M._mp4_box(b"minf", stbl)
    mdia = M._mp4_box(b"mdia", minf)
    trak = M._mp4_box(b"trak", mdia)
    moov = M._mp4_box(b"moov", mvhd_v1 + trak)
    p = M._parse_mp4(ftyp + moov)
    assert p is not None
    assert p["timescale"] == 90000 and p["duration"] == 123456789
    assert p["sizes"] == [4, 4]  # fixed-size stsz branch
