"""Baseline H.264 I_PCM codec (r12) — the honest slice of H.264 this
library-less container can decode for REAL.

H.264 (ITU-T Rec. H.264 / ISO 14496-10) defines I_PCM macroblocks
(§7.3.5, mb_type 25 in I slices): raw uncompressed samples carried in
the bitstream, byte-aligned, with NO entropy-coded residuals — the
spec's own escape hatch for incompressible content.  A stream of
I_PCM macroblocks is a fully conformant baseline-profile H.264
elementary stream, and decoding it exercises every layer of the real
bitstream grammar EXCEPT residual entropy coding:

  * NAL unit framing with emulation-prevention bytes
    (00 00 03 insertion/removal, §7.4.1.1),
  * exp-Golomb ue(v)/se(v) parsing (§9.1),
  * SPS/PPS parameter-set decoding (§7.3.2.1/7.3.2.2),
  * IDR slice-header decoding (§7.3.3),
  * the macroblock raster walk with pcm alignment + sample extraction
    (§7.3.5).

What is NOT here — and stays the labeled ``_fallback_features``
boundary in ``multimodal.py`` — is CAVLC/CABAC residual decoding
(§9.2/§9.3), i.e. streams from real encoders that actually compress.
The claim narrows from "H.264 is fake features" to "H.264
entropy-coded residuals are fake features"; the container, NAL,
parameter-set, and slice grammar are all certified by an exact
oracle (I_PCM is lossless pass-through, so every decoded pixel is
closed-form in the synthesis parameters).

Reference parity note: the reference engine
(jiahezhu0312/community-detection-flink) has no media path at all —
this module sits on the engine's multimodal extension axis
(SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np


class H264Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit I/O + exp-Golomb
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def ue(self, v: int) -> None:
        """Unsigned exp-Golomb (§9.1): M zero bits, 1, M info bits."""
        code = v + 1
        m = code.bit_length() - 1
        self.u(0, m)
        self.u(code, m + 1)

    def se(self, v: int) -> None:
        """Signed exp-Golomb: v>0 → 2v−1, v≤0 → −2v."""
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit* — pad to byte boundary with zeros."""
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def raw(self, data: bytes) -> None:
        assert self.nbits == 0, "raw bytes must be byte-aligned"
        self.out += data

    def trailing(self) -> bytes:
        """rbsp_trailing_bits: stop bit + zero padding."""
        self.u(1, 1)
        self.align_zero()
        return bytes(self.out)


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def u(self, length: int) -> int:
        v = 0
        for _ in range(length):
            if self.pos >= len(self.data):
                raise H264Error("bitstream truncated")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise H264Error("exp-Golomb runaway")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 == 1 else -(k // 2)

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1

    def raw(self, n: int) -> bytes:
        assert self.bit == 0
        if self.pos + n > len(self.data):
            raise H264Error("pcm samples truncated")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


# ---------------------------------------------------------------------------
# RBSP <-> NAL (emulation prevention, §7.4.1.1)
# ---------------------------------------------------------------------------


def _rbsp_to_nal(header: int, rbsp: bytes) -> bytes:
    """Prefix the NAL header byte and insert emulation-prevention 03
    bytes: any 00 00 followed by 00/01/02/03 gets 03 interposed."""
    out = bytearray([header])
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _nal_to_rbsp(nal: bytes) -> tuple[int, bytes]:
    """Strip the header byte and remove emulation-prevention bytes."""
    if not nal:
        raise H264Error("empty NAL")
    out = bytearray()
    zeros = 0
    for b in nal[1:]:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # emulation prevention byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return nal[0], bytes(out)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _sps_rbsp(mb_w: int, mb_h: int) -> bytes:
    w = _BitWriter()
    w.u(66, 8)   # profile_idc: baseline
    w.u(0, 8)    # constraint flags + reserved
    w.u(10, 8)   # level_idc
    w.ue(0)      # seq_parameter_set_id
    w.ue(0)      # log2_max_frame_num_minus4
    w.ue(0)      # pic_order_cnt_type
    w.ue(0)      # log2_max_pic_order_cnt_lsb_minus4
    w.ue(0)      # max_num_ref_frames
    w.u(0, 1)    # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)  # pic_width_in_mbs_minus1
    w.ue(mb_h - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)    # frame_mbs_only_flag
    w.u(0, 1)    # direct_8x8_inference_flag
    w.u(0, 1)    # frame_cropping_flag
    w.u(0, 1)    # vui_parameters_present_flag
    return w.trailing()


def _pps_rbsp() -> bytes:
    w = _BitWriter()
    w.ue(0)      # pic_parameter_set_id
    w.ue(0)      # seq_parameter_set_id
    w.u(0, 1)    # entropy_coding_mode_flag (CAVLC; moot for I_PCM)
    w.u(0, 1)    # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)      # num_slice_groups_minus1
    w.ue(0)      # num_ref_idx_l0_default_active_minus1
    w.ue(0)      # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)    # weighted_pred_flag
    w.u(0, 2)    # weighted_bipred_idc
    w.se(0)      # pic_init_qp_minus26
    w.se(0)      # pic_init_qs_minus26
    w.se(0)      # chroma_qp_index_offset
    w.u(0, 1)    # deblocking_filter_control_present_flag
    w.u(0, 1)    # constrained_intra_pred_flag
    w.u(0, 1)    # redundant_pic_cnt_present_flag
    return w.trailing()


def _idr_slice_rbsp(luma: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> bytes:
    """One IDR slice, every macroblock I_PCM.  ``luma`` is (16·mbh,
    16·mbw) uint8; ``cb``/``cr`` are the (8·mbh, 8·mbw) 4:2:0 planes."""
    mb_h, mb_w = luma.shape[0] // 16, luma.shape[1] // 16
    w = _BitWriter()
    w.ue(0)      # first_mb_in_slice
    w.ue(7)      # slice_type: I (all slices of the picture)
    w.ue(0)      # pic_parameter_set_id
    w.u(0, 4)    # frame_num (log2_max_frame_num = 4)
    w.ue(0)      # idr_pic_id
    w.u(0, 4)    # pic_order_cnt_lsb (log2 = 4)
    w.u(0, 1)    # no_output_of_prior_pics_flag
    w.u(0, 1)    # long_term_reference_flag
    w.se(0)      # slice_qp_delta
    for my in range(mb_h):
        for mx in range(mb_w):
            w.ue(25)  # mb_type: I_PCM (Table 7-11)
            w.align_zero()  # pcm_alignment_zero_bit*
            w.raw(luma[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
            w.raw(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            w.raw(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
    return w.trailing()


def encode_h264_ipcm(
    luma: np.ndarray, cb: np.ndarray | None = None, cr: np.ndarray | None = None
) -> dict:
    """Encode one frame as a conformant I_PCM-only baseline stream.
    Returns ``{"sps", "pps", "idr"}`` — three NAL units (bytes, no
    start codes: the MP4/AVCC layer length-prefixes them)."""
    luma = np.ascontiguousarray(luma, np.uint8)
    mb_h, mb_w = luma.shape[0] // 16, luma.shape[1] // 16
    assert luma.shape == (mb_h * 16, mb_w * 16), "luma must be MB-aligned"
    if cb is None:
        cb = np.full((mb_h * 8, mb_w * 8), 128, np.uint8)
    if cr is None:
        cr = np.full((mb_h * 8, mb_w * 8), 128, np.uint8)
    cb = np.ascontiguousarray(cb, np.uint8)
    cr = np.ascontiguousarray(cr, np.uint8)
    return {
        # nal_ref_idc=3 for parameter sets and IDR
        "sps": _rbsp_to_nal(0x67, _sps_rbsp(mb_w, mb_h)),
        "pps": _rbsp_to_nal(0x68, _pps_rbsp()),
        "idr": _rbsp_to_nal(0x65, _idr_slice_rbsp(luma, cb, cr)),
    }


def avc_decoder_configuration(sps: bytes, pps: bytes) -> bytes:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.2.4.1) — the
    ``avcC`` box payload MP4 muxers attach to ``avc1`` sample entries."""
    import struct

    return (
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps))
        + sps
        + bytes([1])
        + struct.pack(">H", len(pps))
        + pps
    )


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags
    level = r.u(8)
    r.ue()  # sps id
    log2_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        log2_poc = r.ue() + 4
    elif poc_type == 1:
        raise H264Error("pic_order_cnt_type 1 unsupported")
    else:
        log2_poc = 0
    r.ue()  # max_num_ref_frames
    r.u(1)
    mb_w = r.ue() + 1
    mb_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise H264Error("interlaced streams unsupported")
    r.u(1)  # direct_8x8_inference_flag
    if r.u(1):  # frame_cropping_flag
        raise H264Error("frame cropping unsupported")
    return {
        "profile": profile, "level": level, "mb_w": mb_w, "mb_h": mb_h,
        "log2_frame_num": log2_frame_num, "poc_type": poc_type,
        "log2_poc": log2_poc,
    }


def decode_h264_ipcm(avcc: bytes, sample: bytes) -> dict:
    """Decode one AVCC-framed access unit of an I_PCM-only stream.

    ``avcc`` is the AVCDecoderConfigurationRecord (from the ``avcC``
    box); ``sample`` is the length-prefixed NAL sequence of one frame.
    Returns ``{"width", "height", "n_components", "pixels"}`` with
    (H, W, 3) uint8 RGB (JFIF/BT.601 full-range — the same conversion
    as the JPEG decoder, so gray frames reconstruct R=G=B=Y exactly).
    Raises H264Error for anything outside I_PCM scope — including any
    entropy-coded macroblock, which is precisely the labeled fallback
    boundary."""
    import struct

    if len(avcc) < 7 or avcc[0] != 1:
        raise H264Error("bad AVCDecoderConfigurationRecord")
    nal_len_size = (avcc[4] & 3) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps_info = None
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", avcc, pos)
        pos += 2
        hdr, rbsp = _nal_to_rbsp(avcc[pos : pos + ln])
        if hdr & 0x1F == 7:
            sps_info = _parse_sps(rbsp)
        pos += ln
    if sps_info is None:
        raise H264Error("no SPS in avcC")

    # walk the sample's length-prefixed NALs; decode the first slice
    mb_w, mb_h = sps_info["mb_w"], sps_info["mb_h"]
    luma = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    cbp = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    crp = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    pos = 0
    decoded = False
    while pos + nal_len_size <= len(sample):
        ln = int.from_bytes(sample[pos : pos + nal_len_size], "big")
        pos += nal_len_size
        if ln == 0 or pos + ln > len(sample):
            raise H264Error("bad NAL length")
        hdr, rbsp = _nal_to_rbsp(sample[pos : pos + ln])
        pos += ln
        ntype = hdr & 0x1F
        if ntype not in (1, 5):
            continue  # parameter sets / SEI in-band: ignore
        r = _BitReader(rbsp)
        r.ue()  # first_mb_in_slice
        slice_type = r.ue()
        if slice_type % 5 != 2:  # not an I slice
            raise H264Error("non-I slice")
        r.ue()  # pps id
        r.u(sps_info["log2_frame_num"])  # frame_num
        if ntype == 5:
            r.ue()  # idr_pic_id
        if sps_info["poc_type"] == 0:
            r.u(sps_info["log2_poc"])  # pic_order_cnt_lsb
        if ntype == 5:
            r.u(1)  # no_output_of_prior_pics_flag
            r.u(1)  # long_term_reference_flag
        r.se()  # slice_qp_delta
        for my in range(mb_h):
            for mx in range(mb_w):
                mb_type = r.ue()
                if mb_type != 25:
                    raise H264Error(
                        f"entropy-coded macroblock (mb_type {mb_type}): "
                        "outside I_PCM scope"
                    )
                r.align()
                luma[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = (
                    np.frombuffer(r.raw(256), np.uint8).reshape(16, 16)
                )
                cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                    np.frombuffer(r.raw(64), np.uint8).reshape(8, 8)
                )
                crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = (
                    np.frombuffer(r.raw(64), np.uint8).reshape(8, 8)
                )
        decoded = True
        break
    if not decoded:
        raise H264Error("no slice NAL in sample")

    y = luma.astype(np.float64)
    cb = np.repeat(np.repeat(cbp, 2, 0), 2, 1).astype(np.float64)
    cr = np.repeat(np.repeat(crp, 2, 0), 2, 1).astype(np.float64)
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    pix = np.clip(np.round(np.stack([r_, g_, b_], -1)), 0, 255).astype(np.uint8)
    return {
        "width": mb_w * 16,
        "height": mb_h * 16,
        "n_components": 3,
        "pixels": pix,
    }
