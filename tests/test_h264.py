"""H.264 I_PCM codec (r12): real NAL/exp-Golomb/SPS/PPS/slice grammar,
lossless sample pass-through — and the labeled boundary (entropy-coded
macroblocks) must surface as ok=false, never a task failure.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from community_detection_flink_spark.operators import h264 as H
from community_detection_flink_spark.operators import multimodal as M


def _unit(luma, cb=None, cr=None):
    nals = H.encode_h264_ipcm(luma, cb, cr)
    avcc = H.avc_decoder_configuration(nals["sps"], nals["pps"])
    sample = struct.pack(">I", len(nals["idr"])) + nals["idr"]
    return avcc, sample, nals


def test_ipcm_roundtrip_gray_exact():
    luma = (np.arange(32 * 48) % 256).astype(np.uint8).reshape(32, 48)
    avcc, sample, _ = _unit(luma)
    d = H.decode_h264_ipcm(avcc, sample)
    assert (d["width"], d["height"], d["n_components"]) == (48, 32, 3)
    for c in range(3):  # neutral chroma: RGB = Y exactly
        assert (d["pixels"][..., c] == luma).all()


def test_ipcm_roundtrip_color_matches_reference_conversion():
    luma = (np.arange(16 * 16) % 256).astype(np.uint8).reshape(16, 16)
    cb = np.full((8, 8), 90, np.uint8)
    cr = np.full((8, 8), 200, np.uint8)
    avcc, sample, _ = _unit(luma, cb, cr)
    d = H.decode_h264_ipcm(avcc, sample)
    y = luma.astype(np.float64)
    cbu = np.repeat(np.repeat(cb, 2, 0), 2, 1).astype(np.float64)
    cru = np.repeat(np.repeat(cr, 2, 0), 2, 1).astype(np.float64)
    exp = np.clip(
        np.round(
            np.stack(
                [
                    y + 1.402 * (cru - 128),
                    y - 0.344136 * (cbu - 128) - 0.714136 * (cru - 128),
                    y + 1.772 * (cbu - 128),
                ],
                -1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (d["pixels"] == exp).all()


def test_emulation_prevention_bytes_roundtrip():
    """All-zero luma forces 00 00 00 runs in the RBSP — the NAL layer
    must insert and strip 03 bytes without corrupting samples."""
    luma = np.zeros((16, 32), np.uint8)
    nals = H.encode_h264_ipcm(luma)
    assert b"\x00\x00\x03" in nals["idr"]
    avcc, sample, _ = _unit(luma)
    assert (H.decode_h264_ipcm(avcc, sample)["pixels"] == 0).all()
    # and a luma plane CONTAINING the 00 00 03 pattern itself
    tricky = np.zeros((16, 16), np.uint8)
    tricky[0, 2] = 3
    avcc, sample, _ = _unit(tricky)
    assert (H.decode_h264_ipcm(avcc, sample)["pixels"][..., 1] == tricky).all()


def test_entropy_coded_macroblock_is_the_labeled_boundary():
    """A slice whose mb_type is NOT I_PCM must raise H264Error — the
    honest 'this engine cannot decode compressed residuals' line."""
    luma = np.zeros((16, 16), np.uint8)
    avcc, sample, nals = _unit(luma)
    # rebuild the slice with mb_type ue(0) (I_4x4) instead of ue(25)
    w = H._BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0); w.u(0, 4)
    w.u(0, 1); w.u(0, 1); w.se(0)
    w.ue(0)  # mb_type I_4x4: entropy-coded territory
    bad_nal = H._rbsp_to_nal(0x65, w.trailing())
    bad_sample = struct.pack(">I", len(bad_nal)) + bad_nal
    with pytest.raises(H.H264Error, match="entropy-coded"):
        H.decode_h264_ipcm(avcc, bad_sample)


def test_truncated_pcm_and_bad_avcc_raise_cleanly():
    luma = np.zeros((16, 16), np.uint8)
    avcc, sample, _ = _unit(luma)
    with pytest.raises(H.H264Error):
        H.decode_h264_ipcm(avcc, sample[: len(sample) // 2])
    with pytest.raises(H.H264Error):
        H.decode_h264_ipcm(b"\x00bad", sample)
    with pytest.raises(H.H264Error):
        H.decode_h264_ipcm(avcc, b"\x00\x00\x00\x05hello")


def test_avc_mp4_decode_matches_construction(spark):
    """End-to-end through the container: every frame of every avc1
    blob decodes to the closed-form pixels."""
    docs = spark.createDataFrame([(i,) for i in range(18)], "doc_id LONG")
    out = M.mp4_video_frame_decode(
        M.synthesize_avc_mp4_blobs(docs), every_k=1
    ).collect()
    from collections import Counter

    per = Counter(r.doc_id for r in out)
    for i in range(18):
        assert per[i] == 2 + i % 3
    for r in out:
        i, f = r.doc_id, r.sample_no
        mbw, mbh = 1 + i % 3, 1 + (i // 3) % 2
        s = 256 * sum(
            (5 * i + 7 * mb + 11 * f) % 256 for mb in range(mbw * mbh)
        )
        assert r.ok
        assert (r.width, r.height, r.n_components) == (16 * mbw, 16 * mbh, 3)
        assert r.checksum == 3 * s


def test_avc_mp4_corrupt_frame_fails_its_row_only(spark):
    docs = spark.createDataFrame([(7,)], "doc_id LONG")
    blob = bytearray(M.synthesize_avc_mp4_blobs(docs).collect()[0].blob)
    p = M._parse_mp4(bytes(blob))
    offs = M._mp4_sample_offsets(p)
    assert len(offs) == 3  # 2 + 7%3
    # mangle sample 1's NAL header into a non-slice type
    blob[offs[1] + 4] = 0x06  # SEI: decoder finds no slice -> error
    df = spark.createDataFrame([(7, bytes(blob))], "doc_id LONG, blob BINARY")
    rows = {r.sample_no: r for r in
            M.mp4_video_frame_decode(df, every_k=1).collect()}
    assert rows[0].ok and rows[2].ok and not rows[1].ok


def test_avc_mp4_without_avcc_is_ok_false(spark):
    """An avc1 track whose sample entry lost its avcC record cannot be
    decoded — ok=false rows, never a crash."""
    docs = spark.createDataFrame([(2,)], "doc_id LONG")
    blob = bytearray(M.synthesize_avc_mp4_blobs(docs).collect()[0].blob)
    idx = bytes(blob).find(b"avcC")
    blob[idx : idx + 4] = b"free"  # retype the box: parser skips it
    df = spark.createDataFrame([(2, bytes(blob))], "doc_id LONG, blob BINARY")
    out = M.mp4_video_frame_decode(df, every_k=1).collect()
    assert len(out) == 4 and all(not r.ok for r in out)


def test_decode_features_dispatches_avc_mp4(spark):
    """decode_features: an avc1 I_PCM blob gets real first-frame
    features; alongside an MJPEG blob and a fallback blob."""
    import community_detection_flink_spark.operators.multimodal as MM

    ids = spark.createDataFrame([(3,)], "doc_id LONG")
    avc = bytes(M.synthesize_avc_mp4_blobs(ids).collect()[0].blob)
    mjpeg = bytes(M.synthesize_mjpeg_mp4_blobs(ids).collect()[0].blob)
    raw = bytes(M.synthesize_mp4_blobs(ids).collect()[0].blob)
    df = spark.createDataFrame(
        [(0, avc), (1, mjpeg), (2, raw)], "doc_id LONG, blob BINARY"
    )
    orig = MM.with_blob
    MM.with_blob = lambda _docs: df
    try:
        out = {r.doc_id: r for r in MM.decode_features(df).collect()}
    finally:
        MM.with_blob = orig
    # doc 0: avc1 frame 0 of id 3 — mbw=1+3%3=1, mbh=1+(3//3)%2=2
    mbw, mbh = 1, 2
    s = 256 * sum((5 * 3 + 7 * mb) % 256 for mb in range(mbw * mbh))
    assert (out[0].width, out[0].height) == (16 * mbw, 16 * mbh)
    assert out[0].channels == 3 and out[0].checksum == 3 * s
    # doc 1: MJPEG first frame decodes (odd id: grayscale); doc 2:
    # raw-codec MP4 falls back to byte-stream features
    assert out[1].channels == 1 and out[1].checksum > 0
    assert out[2].width == len(raw) % 256
