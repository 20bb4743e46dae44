"""Generate a tiny REAL H.264-in-MP4 fixture with no codec library.

H.264's I_PCM macroblock type (ITU-T H.264 §7.3.5 / §8.3.5, public spec)
carries raw, uncompressed luma+chroma samples — no entropy coding, no
prediction, no transform — so a spec-conformant baseline stream of
all-I_PCM IDR frames can be written bit-by-bit in pure Python, and any
real decoder (ffmpeg/PyAV, OpenCV) reconstructs the pixel values
LOSSLESSLY. That gives the repo a recorded compressed-container fixture
(`tests/fixtures/ipcm_64x32.mp4`) for the av/cv2 video tier
(operators/multimodal.py:_video_frames) that activates the day the
container gains a codec — while the writer itself is exercised TODAY by
a pure-Python structural round-trip in tests/test_multimodal.py.

Stream shape: baseline profile (66), level 1.0, 64x32 (4x2 macroblocks),
6 IDR frames, CAVLC, pic_order_cnt_type=2; each frame is one slice of 8
I_PCM macroblocks. MP4 mux is a minimal ISO BMFF (public ISO/IEC
14496-12/-15): ftyp + moov(stsd/avc1/avcC, stts, stsc, stsz, stco) +
mdat with 4-byte-length-prefixed slice NALs.

Run: python scripts/make_h264_fixture.py  (rewrites the fixture in-tree;
the output is fully deterministic).
"""
from __future__ import annotations

import struct

WIDTH, HEIGHT = 64, 32
MB_W, MB_H = WIDTH // 16, HEIGHT // 16
N_FRAMES = 6
TIMESCALE, SAMPLE_DELTA = 1000, 200  # 5 fps


def frame_luma(i: int) -> "list[list[int]]":
    """Frame i's Y plane: a horizontal gradient on a per-frame base,
    kept inside the video range [16, 235] so limited/full-range decoder
    conversions can't clamp."""
    base = 20 + 25 * i
    return [[base + x for x in range(WIDTH)] for _ in range(HEIGHT)]


class BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def u(self, val: int, n: int) -> None:
        for k in reversed(range(n)):
            self._bits.append((val >> k) & 1)

    def ue(self, v: int) -> None:  # Exp-Golomb §9.1
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self) -> None:  # pcm_alignment_zero_bit
        while len(self._bits) % 8:
            self._bits.append(0)

    def rbsp_trailing(self) -> None:  # stop bit + alignment §7.3.2.11
        self._bits.append(1)
        self.byte_align_zero()

    def to_bytes(self) -> bytes:
        assert len(self._bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def emulation_prevent(rbsp: bytes) -> bytes:
    """Insert 0x03 after any 0x00 0x00 when the next byte is <= 0x03
    (§7.4.1.1) — the inverse lives in the test's structural parser."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return bytes([(ref_idc << 5) | nal_type]) + emulation_prevent(rbsp)


def make_sps() -> bytes:
    w = BitWriter()
    w.u(66, 8)   # profile_idc: baseline
    w.u(0, 8)    # constraint flags + reserved
    w.u(10, 8)   # level_idc: 1.0
    w.ue(0)      # seq_parameter_set_id
    w.ue(0)      # log2_max_frame_num_minus4 -> frame_num is u(4)
    w.ue(2)      # pic_order_cnt_type: 2 (order = decode order, no fields)
    w.ue(0)      # max_num_ref_frames
    w.u(0, 1)    # gaps_in_frame_num_value_allowed_flag
    w.ue(MB_W - 1)  # pic_width_in_mbs_minus1
    w.ue(MB_H - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)    # frame_mbs_only_flag
    w.u(0, 1)    # direct_8x8_inference_flag
    w.u(0, 1)    # frame_cropping_flag
    w.u(0, 1)    # vui_parameters_present_flag
    w.rbsp_trailing()
    return nal(7, w.to_bytes())


def make_pps() -> bytes:
    w = BitWriter()
    w.ue(0)      # pic_parameter_set_id
    w.ue(0)      # seq_parameter_set_id
    w.u(0, 1)    # entropy_coding_mode_flag: CAVLC
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
    w.rbsp_trailing()
    return nal(8, w.to_bytes())


def make_idr_slice(frame_idx: int) -> bytes:
    """One IDR slice of all-I_PCM macroblocks for frame_idx's gradient
    (luma per frame_luma, both chroma planes constant 128 = neutral)."""
    luma = frame_luma(frame_idx)
    w = BitWriter()
    # slice_header (§7.3.3)
    w.ue(0)              # first_mb_in_slice
    w.ue(7)              # slice_type: 7 = I (all slices in pic are I)
    w.ue(0)              # pic_parameter_set_id
    w.u(0, 4)            # frame_num (IDR resets; u(log2_max_frame_num))
    w.ue(frame_idx % 2)  # idr_pic_id (must differ between consecutive IDRs)
    # dec_ref_pic_marking for IDR (§7.3.3.3)
    w.u(0, 1)            # no_output_of_prior_pics_flag
    w.u(0, 1)            # long_term_reference_flag
    w.se(0)              # slice_qp_delta
    # slice_data: MB_W*MB_H macroblocks, raster order
    for mby in range(MB_H):
        for mbx in range(MB_W):
            w.ue(25)             # mb_type 25 in I slice = I_PCM (§7.4.5)
            w.byte_align_zero()  # pcm_alignment_zero_bit
            for y in range(16):
                for x in range(16):
                    w.u(luma[mby * 16 + y][mbx * 16 + x], 8)
            for _ in range(128):  # Cb then Cr, 8x8 each (4:2:0)
                w.u(128, 8)
    w.rbsp_trailing()
    return nal(5, w.to_bytes())


# --- minimal ISO BMFF mux (ISO/IEC 14496-12 / -15) ------------------------

def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def full_box(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def make_mp4(sps: bytes, pps: bytes, samples: "list[bytes]") -> bytes:
    duration = SAMPLE_DELTA * len(samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    avcc = box(
        b"avcC",
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps,
    )
    avc1 = box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", WIDTH, HEIGHT)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">IH", 0, 1)                   # reserved, frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 0x0018, -1)             # depth, pre_defined
        + avcc,
    )
    stsd = full_box(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = full_box(
        b"stts", 0, 0, struct.pack(">III", 1, len(samples), SAMPLE_DELTA)
    )
    stsc = full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(samples), 1))
    stsz = full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(samples))
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )

    def moov_bytes(chunk_offset: int) -> bytes:
        stco = full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        url = full_box(b"url ", 0, 1, b"")  # self-contained
        dref = full_box(b"dref", 0, 0, struct.pack(">I", 1) + url)
        minf = box(
            b"minf",
            full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
            + box(b"dinf", dref) + stbl,
        )
        mdhd = full_box(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, TIMESCALE, duration, 0x55C4, 0),
        )
        hdlr = full_box(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
        )
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = full_box(
            b"tkhd", 0, 3,
            struct.pack(">IIII", 0, 0, 1, 0)         # times, track_ID, rsvd
            + struct.pack(">I", duration) + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)       # layer/group/volume
            + _MATRIX
            + struct.pack(">II", WIDTH << 16, HEIGHT << 16),
        )
        mvhd = full_box(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, TIMESCALE, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume
            + b"\x00" * 8 + _MATRIX + b"\x00" * 24
            + struct.pack(">I", 2),                  # next_track_ID
        )
        return box(b"moov", mvhd + box(b"trak", tkhd + mdia))

    # stco points at the first sample inside mdat; moov's LENGTH does not
    # depend on the offset value, so one placeholder pass sizes it
    moov_len = len(moov_bytes(0))
    offset = len(ftyp) + moov_len + 8
    mdat = box(b"mdat", b"".join(samples))
    return ftyp + moov_bytes(offset) + mdat


def build_fixture() -> bytes:
    sps, pps = make_sps(), make_pps()
    samples = [
        struct.pack(">I", len(s)) + s
        for s in (make_idr_slice(i) for i in range(N_FRAMES))
    ]
    return make_mp4(sps, pps, samples)


if __name__ == "__main__":
    import os

    out = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "ipcm_64x32.mp4"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    data = build_fixture()
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out}: {len(data)} bytes, {N_FRAMES} frames "
          f"{WIDTH}x{HEIGHT} I_PCM baseline")
