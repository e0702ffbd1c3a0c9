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


def _build_mp4(chunks, stsc_runs, use_co64=False, largesize_mdat=False):
    """Hand-rolled multi-chunk MP4: ``chunks`` is a list of lists of
    per-sample byte strings; ``stsc_runs`` the (first_chunk,
    samples_per_chunk) table.  Chunks are laid into one mdat separated
    by garbage bytes, so a parser that assumes contiguity reads the
    garbage — this is exactly the r10 ADVICE failure mode."""
    import struct

    sizes = [len(s) for c in chunks for s in c]
    gap = b"\xde\xad\xbe\xef" * 3

    def build(offs):
        ftyp = M._mp4_box(b"ftyp", b"isom" + b"\x00" * 4 + b"isom")
        mvhd = M._mp4_box(
            b"mvhd",
            b"\x00" * 4 + struct.pack(">IIII", 0, 0, 1000, 100 * len(sizes))
            + b"\x00" * 80,
        )
        stsd = M._mp4_box(b"stsd", struct.pack(">II", 0, 1)
                          + struct.pack(">I", 16) + b"raw " + b"\x00" * 6
                          + struct.pack(">H", 1))
        stts = M._mp4_box(b"stts", struct.pack(">II", 0, 1)
                          + struct.pack(">II", len(sizes), 100))
        stsc = M._mp4_box(
            b"stsc",
            struct.pack(">II", 0, len(stsc_runs))
            + b"".join(struct.pack(">III", f, n, 1) for f, n in stsc_runs),
        )
        stsz = M._mp4_box(
            b"stsz",
            struct.pack(">III", 0, 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        if use_co64:
            co = M._mp4_box(b"co64", struct.pack(">II", 0, len(offs))
                            + b"".join(struct.pack(">Q", o) for o in offs))
        else:
            co = M._mp4_box(b"stco", struct.pack(">II", 0, len(offs))
                            + b"".join(struct.pack(">I", o) for o in offs))
        stbl = M._mp4_box(b"stbl", stsd + stts + stsc + stsz + co)
        trak = M._mp4_box(b"trak", M._mp4_box(b"mdia", M._mp4_box(b"minf", stbl)))
        moov = M._mp4_box(b"moov", mvhd + trak)
        payload = gap.join(b"".join(c) for c in chunks)
        if largesize_mdat:
            mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(
                ">Q", 16 + len(payload)
            ) + payload
            hdr = 16
        else:
            mdat = struct.pack(">I", 8 + len(payload)) + b"mdat" + payload
            hdr = 8
        return ftyp, moov, mdat, hdr

    # two-pass: measure with zero offsets, then patch in the real ones
    ftyp, moov, mdat, hdr = build([0] * len(chunks))
    base = len(ftyp) + len(moov) + hdr
    offs, pos = [], base
    for c in chunks:
        offs.append(pos)
        pos += sum(len(s) for s in c) + len(gap)
    ftyp, moov, mdat, _ = build(offs)
    return ftyp + moov + mdat


def test_mp4_multi_chunk_extraction(spark):
    # 5 samples over 2 chunks (2 + 3), garbage between chunks: a
    # contiguity-assuming parser extracts garbage for samples 2..4
    samples = [bytes([10 + j] * (4 + j)) for j in range(5)]
    blob = _build_mp4([samples[:2], samples[2:]], [(1, 2), (2, 3)])
    df = spark.createDataFrame([(7, bytearray(blob))], "doc_id LONG, blob BINARY")
    rows = {r.sample_no: r for r in M.mp4_sample_frames(df, every_k=1).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    off = 0
    for j, s in enumerate(samples):
        r = rows[j]
        assert r.sample_bytes == len(s)
        assert r.byte_offset == off  # media-stream offset, layout-free
        assert r.value == s[0] and r.checksum == sum(s)
        off += len(s)
    meta = M.mp4_metadata(df).collect()[0]
    assert meta.ok and meta.n_samples == 5


def test_mp4_co64_and_largesize_boxes(spark):
    # 64-bit chunk offsets + 64-bit mdat largesize — modern muxers
    # emit both for >4 GiB files; the walker must honor them
    samples = [bytes([99 - j] * 6) for j in range(4)]
    blob = _build_mp4(
        [samples[:1], samples[1:3], samples[3:]],
        [(1, 1), (2, 2), (3, 1)],
        use_co64=True,
        largesize_mdat=True,
    )
    df = spark.createDataFrame([(3, bytearray(blob))], "doc_id LONG, blob BINARY")
    rows = sorted(M.mp4_sample_frames(df, every_k=1).collect(),
                  key=lambda r: r.sample_no)
    assert [r.checksum for r in rows] == [sum(s) for s in samples]
    assert [r.value for r in rows] == [s[0] for s in samples]


def test_mp4_short_chunk_table_skips_not_misreads(spark):
    # stco advertises ONE chunk but stsc maps two: tables don't cover
    # the samples — the blob must be skipped, not extracted wrongly
    samples = [b"\x01\x01", b"\x02\x02", b"\x03\x03"]
    blob = _build_mp4([samples[:1], samples[1:]], [(1, 1), (2, 2)])
    import struct

    # truncate the stco table in place: count 2 -> 1
    idx = blob.index(b"stco")
    cnt_pos = idx + 4 + 4  # fourcc + version/flags
    assert struct.unpack_from(">I", blob, cnt_pos)[0] == 2
    broken = bytearray(blob)
    struct.pack_into(">I", broken, cnt_pos, 1)
    df = spark.createDataFrame([(1, broken)], "doc_id LONG, blob BINARY")
    assert M.mp4_sample_frames(df).count() == 0


# ---------------------------------------------------------------------------
# MJPEG-in-MP4 (r12): real video frame decode
# ---------------------------------------------------------------------------


def test_mjpeg_decode_matches_construction(spark):
    """Every frame of every synthesized MJPEG track decodes to the
    closed-form pixels: the container walk found the true sample bytes
    (padded, one-chunk-per-sample layout) AND the JPEG decode of the
    payload is bit-exact."""
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id LONG")
    out = M.mp4_video_frame_decode(
        M.synthesize_mjpeg_mp4_blobs(docs), every_k=1
    ).collect()
    from collections import Counter

    per_doc = Counter(r.doc_id for r in out)
    for i in range(25):
        assert per_doc[i] == 2 + i % 4
    for r in out:
        i, f = r.doc_id, r.sample_no
        txn, tyn = 2 + i % 3, 1 + (i // 3) % 3
        ncomp = 3 if i % 2 == 0 else 1
        sv = sum(
            (7 * i + 11 * tx + 13 * ty + 17 * f) % 128 * 2
            for tx in range(txn)
            for ty in range(tyn)
        )
        assert r.ok
        assert (r.width, r.height, r.n_components) == (8 * txn, 8 * tyn, ncomp)
        assert r.checksum == sv * 64 * ncomp
        assert r.mean_pixel == (sv * 64 * ncomp) / (64 * txn * tyn * ncomp)


def test_mjpeg_corrupt_frame_fails_its_row_only(spark):
    """A mangled sample payload yields ok=false for THAT frame; the
    other frames of the same blob still decode — the resilient-decode
    contract at frame granularity."""
    docs = spark.createDataFrame([(2,)], "doc_id LONG")
    blob = bytearray(
        M.synthesize_mjpeg_mp4_blobs(docs).collect()[0].blob
    )
    p = M._parse_mp4(bytes(blob))
    offs = M._mp4_sample_offsets(p)
    assert len(offs) == 4  # 2 + 2%4
    # kill sample 1's SOI marker (valid BMFF, broken JPEG magic) and
    # corrupt sample 2's entropy bytes mid-scan (valid SOI, broken scan)
    blob[offs[1]] = 0x00
    blob[offs[2] + p["sizes"][2] - 10] = 0xFF
    blob[offs[2] + p["sizes"][2] - 9] = 0xC2  # progressive SOF: JpegError
    df = spark.createDataFrame(
        [(2, bytes(blob))], "doc_id LONG, blob BINARY"
    )
    rows = {r.sample_no: r for r in
            M.mp4_video_frame_decode(df, every_k=1).collect()}
    assert rows[0].ok and rows[3].ok
    assert not rows[1].ok and rows[1].checksum == 0
    assert not rows[2].ok


def test_mjpeg_non_jpeg_track_is_ok_false_not_error(spark):
    """A track whose samples are not JPEG (the raw-codec synthetic
    blobs) yields ok=false rows, never a task failure; non-BMFF bytes
    are skipped entirely."""
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id LONG")
    out = M.mp4_video_frame_decode(
        M.synthesize_mp4_blobs(docs), every_k=1
    ).collect()
    assert len(out) == sum(3 + i % 5 for i in range(5))
    assert all(not r.ok for r in out)
    junk = spark.createDataFrame(
        [(0, b"not a container")], "doc_id LONG, blob BINARY"
    )
    assert M.mp4_video_frame_decode(junk).count() == 0


def test_decode_features_dispatches_mjpeg_mp4(spark):
    """decode_features on a raw binary frame: an MJPEG MP4 blob gets
    REAL first-frame features (dims + pixel checksum), a raw-codec MP4
    falls back, a bare JPEG still decodes — all in one batch."""
    from community_detection_flink_spark.operators import jpeg as J

    ids = spark.createDataFrame([(4,)], "doc_id LONG")
    mjpeg = bytes(M.synthesize_mjpeg_mp4_blobs(ids).collect()[0].blob)
    rawmp4 = bytes(M.synthesize_mp4_blobs(ids).collect()[0].blob)
    jpg = bytes(J.synthesize_jpeg_blobs(ids).collect()[0].blob)

    # drive the mapInPandas body directly on a pre-built blob frame:
    # decode_features wraps with_blob (text->bytes), so reuse its
    # runner via a minimal docs frame is not possible for binary
    # payloads — instead go through mp4_video_frame_decode's sibling
    # path by monkey-feeding blobs through a one-column text table is
    # wrong; the operator contract we pin here is the DISPATCH rule,
    # so call the internal runner through a real Spark pass:
    df = spark.createDataFrame(
        [(0, mjpeg), (1, rawmp4), (2, jpg)], "doc_id LONG, blob BINARY"
    )
    import pandas as pd_  # noqa: F401
    from community_detection_flink_spark.operators.multimodal import (
        FEATURE_SCHEMA,
    )

    # rebuild the runner exactly as decode_features does, minus the
    # with_blob text wrapper (binary inputs come from media crawls)
    import community_detection_flink_spark.operators.multimodal as MM

    captured = {}
    orig = MM.with_blob

    def fake_with_blob(_docs):
        captured["used"] = True
        return df

    MM.with_blob = fake_with_blob
    try:
        out = {r.doc_id: r for r in MM.decode_features(df).collect()}
    finally:
        MM.with_blob = orig

    # doc 0: real first-frame decode of the MJPEG track — frame 0 of
    # id 4: txn=2+4%3=0+... txn=2+1=3? compute: txn = 2 + 4 % 3 = 3,
    # tyn = 1 + (4 // 3) % 3 = 2, ncomp = 3 (even id)
    txn, tyn, ncomp = 3, 2, 3
    sv = sum(
        (7 * 4 + 11 * tx + 13 * ty) % 128 * 2
        for tx in range(txn)
        for ty in range(tyn)
    )
    assert out[0].width == 8 * txn and out[0].height == 8 * tyn
    assert out[0].channels == ncomp and out[0].checksum == sv * 64 * ncomp
    # doc 1: raw-codec MP4 -> fallback (length-derived features)
    assert out[1].width == len(rawmp4) % 256
    # doc 2: bare JPEG still real
    assert out[2].channels == 3 and out[2].checksum >= 0
