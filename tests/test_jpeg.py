"""Real baseline-JPEG codec (r11 — closes the last decode stub).

The encoder and decoder are separate code paths over the same spec
(T.81 baseline): the differential tests here pin that decode(encode(x))
equals an INDEPENDENT straight-line numpy reconstruction of the
quantize→dequantize→IDCT pipeline — which proves the Huffman coding,
zigzag, run-length, DC prediction, byte stuffing, and restart-marker
machinery exactly, not just the DC-only oracle path the SQL gate rides.
"""

from __future__ import annotations

import numpy as np
import pytest

from community_detection_flink_spark.operators import jpeg as J


def _ref_block_roundtrip(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Straight-line reference: per-8×8 FDCT → quantize → dequantize →
    IDCT, no entropy coding involved."""
    h, w = plane.shape
    out = np.zeros((h, w), dtype=np.float64)
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            b = plane[y : y + 8, x : x + 8].astype(np.float64) - 128.0
            q = np.round((J._C @ b @ J._C.T) / quant)
            out[y : y + 8, x : x + 8] = J._C.T @ (q * quant) @ J._C + 128.0
    return out


def _rng_plane(seed: int, h: int, w: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w)).astype(np.uint8)


def test_gray_differential_with_ac():
    img = _rng_plane(7, 24, 32)  # dense AC activity in every block
    dec = J.decode_jpeg(J.encode_jpeg([img]))
    ref = np.clip(
        np.round(_ref_block_roundtrip(img, J.QUANT_LUMA)), 0, 255
    ).astype(np.uint8)
    assert dec["width"] == 32 and dec["height"] == 24
    assert dec["n_components"] == 1
    assert np.array_equal(dec["pixels"], ref)


def test_color_444_differential():
    y, cb, cr = (_rng_plane(s, 16, 16) for s in (1, 2, 3))
    dec = J.decode_jpeg(J.encode_jpeg([y, cb, cr]))
    ry = _ref_block_roundtrip(y, J.QUANT_LUMA)
    rcb = _ref_block_roundtrip(cb, J.QUANT_CHROMA)
    rcr = _ref_block_roundtrip(cr, J.QUANT_CHROMA)
    r = ry + 1.402 * (rcr - 128.0)
    g = ry - 0.344136 * (rcb - 128.0) - 0.714136 * (rcr - 128.0)
    b = ry + 1.772 * (rcb - 128.0)
    ref = np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)
    assert dec["pixels"].shape == (16, 16, 3)
    assert np.array_equal(dec["pixels"], ref)


def test_color_420_differential():
    # 32×32 luma, 16×16 chroma — the dominant real-world layout
    y = _rng_plane(11, 32, 32)
    cb, cr = _rng_plane(12, 16, 16), _rng_plane(13, 16, 16)
    dec = J.decode_jpeg(
        J.encode_jpeg([y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)])
    )
    ry = _ref_block_roundtrip(y, J.QUANT_LUMA)
    up = lambda p: np.repeat(np.repeat(p, 2, 0), 2, 1)  # noqa: E731
    rcb = up(_ref_block_roundtrip(cb, J.QUANT_CHROMA))
    rcr = up(_ref_block_roundtrip(cr, J.QUANT_CHROMA))
    r = ry + 1.402 * (rcr - 128.0)
    g = ry - 0.344136 * (rcb - 128.0) - 0.714136 * (rcr - 128.0)
    b = ry + 1.772 * (rcb - 128.0)
    ref = np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)
    assert np.array_equal(dec["pixels"], ref)


def test_restart_markers_with_dense_ac():
    # restart interval 3 over a 5×4-MCU image: DC predictors must reset
    # at every RSTn or the image decodes visibly wrong
    img = _rng_plane(21, 32, 40)
    blob = J.encode_jpeg([img], restart_interval=3)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    dec = J.decode_jpeg(blob)
    ref = np.clip(
        np.round(_ref_block_roundtrip(img, J.QUANT_LUMA)), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(dec["pixels"], ref)


def test_constant_even_blocks_are_bit_exact():
    # the oracle's exactness lever: even gray tiles survive the lossy
    # pipeline bit-for-bit (DC-only blocks, q00=16)
    tiles = np.array([[2 * v for v in (0, 31, 64, 127)]], dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, 0), 8, 1)
    dec = J.decode_jpeg(J.encode_jpeg([img]))
    assert np.array_equal(dec["pixels"], img)
    # and through the COLOR path: gray ⇒ Cb=Cr=128 reproduce exactly
    dec3 = J.decode_jpeg(
        J.encode_jpeg([img, np.full_like(img, 128), np.full_like(img, 128)])
    )
    for c in range(3):
        assert np.array_equal(dec3["pixels"][:, :, c], img)


def test_corrupt_inputs_raise_jpeg_error():
    good = J.encode_jpeg([_rng_plane(5, 8, 8)])
    for bad in (
        b"not a jpeg at all",
        b"",
        good[: len(good) // 2],  # truncated mid-stream
        good[:2],  # SOI only
    ):
        with pytest.raises((J.JpegError, EOFError, IndexError)):
            J.decode_jpeg(bad)


def test_mangled_restart_marker_raises_jpeg_error():
    # r12 ADVICE fix: a DRI-set stream whose RSTn is rewritten must
    # raise JpegError (the type decode_features/jpeg_stats catch), not
    # a bare ValueError that escapes as a Spark task failure
    img = _rng_plane(21, 32, 40)
    blob = bytearray(J.encode_jpeg([img], restart_interval=3))
    for n in range(8):
        i = blob.find(bytes([0xFF, 0xD0 + n]))
        if i >= 0:
            blob[i + 1] = 0xD9  # RSTn -> EOI
            break
    else:
        raise AssertionError("no restart marker emitted")
    with pytest.raises(J.JpegError, match="restart"):
        J.decode_jpeg(bytes(blob))


def test_progressive_sof_is_rejected_not_misdecoded():
    good = bytearray(J.encode_jpeg([_rng_plane(5, 8, 8)]))
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(J.JpegError, match="non-baseline"):
        J.decode_jpeg(bytes(good))


def test_huffman_tables_are_canonical_and_reserved_code_free():
    for enc in (J._DC_ENC, J._AC_ENC):
        for sym, (code, ln) in enc.items():
            assert code != (1 << ln) - 1, "all-ones code is reserved"
            assert code < (1 << ln)
    # prefix-free: no code is a prefix of a longer one
    codes = sorted(
        ((ln, code) for code, ln in J._AC_ENC.values()), key=lambda t: t[0]
    )
    as_str = [format(c, f"0{ln}b") for ln, c in codes]
    for i, a in enumerate(as_str):
        for b in as_str[i + 1 :]:
            assert not b.startswith(a) or a == b


def test_spark_roundtrip_matches_closed_form(spark):
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id LONG")
    out = J.jpeg_stats(J.synthesize_jpeg_blobs(docs)).collect()
    assert len(out) == 40
    for r in out:
        i = r.doc_id
        tx_n, ty_n = 2 + i % 3, 1 + (i // 3) % 3
        vals = [
            (7 * i + 11 * tx + 13 * ty) % 128 * 2
            for ty in range(ty_n)
            for tx in range(tx_n)
        ]
        ncomp = 3 if i % 2 == 0 else 1
        assert r.ok
        assert r.width == 8 * tx_n and r.height == 8 * ty_n
        assert r.n_components == ncomp
        assert r.checksum == sum(vals) * 64 * ncomp
        assert r.mean_pixel == float(r.checksum) / (
            r.width * r.height * ncomp
        )


def test_jpeg_stats_surfaces_malformed_blobs(spark):
    rows = [(0, bytearray(b"\xff\xd8 garbage")), (1, bytearray(b""))]
    df = spark.createDataFrame(rows, "doc_id LONG, blob BINARY")
    got = {r.doc_id: r.ok for r in J.jpeg_stats(df).collect()}
    assert got == {0: False, 1: False}
