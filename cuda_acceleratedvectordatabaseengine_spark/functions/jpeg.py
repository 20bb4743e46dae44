"""Pure-numpy baseline JPEG codec for the MJPEG video tier.

Closes the last honest codec skip in the multimodal path: MJPEG-in-AVI
(biCompression='MJPG', one complete JPEG per frame chunk) now decodes in
CI with no codec library, the same zero-dependency discipline as the
netpbm image, RIFF/WAVE audio, and raw-DIB AVI tiers.

Scope (documented, enforced with clear errors — not silently wrong):

- ``decode_gray``: baseline sequential DCT (SOF0/SOF1), 8-bit samples,
  1-4 components with arbitrary sampling factors, restart markers
  honored. Returns the FIRST (luma) component's plane as uint8 — the
  gray-frame contract of the video tier (chroma blocks are entropy-
  decoded to advance the bitstream, then discarded). Progressive (SOF2),
  hierarchical, arithmetic-coded, and 12-bit streams raise
  ``NotImplementedError`` naming the feature; real-world files needing
  them route to the av/cv2 tiers.
- ``encode_gray``: single-component baseline encoder with the standard
  Annex K luminance Huffman tables — enough to author MJPEG fixtures any
  compliant decoder reads. Default quantization table is all-ones
  (near-lossless: the only loss is coefficient rounding, max ~2 gray
  levels on natural content).

Everything here is public ITU-T T.81 (JPEG) structure: marker layout,
zigzag order, Annex K tables, the orthonormal 8x8 DCT-II. The reference
engine has no video path at all (SURVEY §2.6b north-star scope); file
citations are therefore to the spec, not the reference.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan: raster index of the k-th coded coefficient (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K luminance Huffman specs: (BITS counts per code length 1..16,
# HUFFVAL symbol list) — T.81 Tables K.3 / K.5
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: forward X = C @ B @ C.T, inverse
    B = C.T @ X @ C."""
    k = np.arange(8, dtype=np.float64)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * 0.5
    C[0] *= 1 / np.sqrt(2)
    return C


_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------
def _decode_table(bits, vals) -> dict:
    """{(length, code): symbol} from a (BITS, HUFFVAL) spec (T.81 C.2)."""
    table = {}
    it = iter(vals)
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


def _encode_table(bits, vals) -> dict:
    """{symbol: (code, length)} — the encoder-side view of the same spec."""
    return {sym: (code, length) for (length, code), sym in
            _decode_table(bits, vals).items()}


# ---------------------------------------------------------------------------
# bit I/O over entropy-coded segments
# ---------------------------------------------------------------------------
class _BitReader:
    """MSB-first reader over one de-stuffed entropy segment; exhaustion
    yields 1-bits (the padding T.81 F.1.2.3 prescribes for the tail)."""

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def take(self, k: int) -> int:
        while self.n < k:
            nxt = self.d[self.i] if self.i < len(self.d) else 0xFF
            self.i += 1
            self.acc = (self.acc << 8) | nxt
            self.n += 8
        self.n -= k
        out = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return out

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.take(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _entropy_segments(buf: bytes, pos: int):
    """Split the scan's entropy data at restart markers, un-stuffing
    0xFF00 -> 0xFF; returns (segments, position of the terminating
    marker's 0xFF byte)."""
    segs, cur = [], bytearray()
    i = pos
    while i < len(buf):
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = buf[i + 1] if i + 1 < len(buf) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, min(i, len(buf))


def _extend(v: int, size: int) -> int:
    """T.81 F.12: map a magnitude-coded value to its signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(bits: _BitReader, dc_tab, ac_tab, pred: int):
    """One 8x8 block -> (64,) zigzag-order coefficient vector + new DC
    predictor."""
    size = bits.decode_symbol(dc_tab)
    pred += _extend(bits.take(size), size) if size else 0
    coef = np.zeros(64, dtype=np.int32)
    coef[0] = pred
    k = 1
    while k < 64:
        sym = bits.decode_symbol(ac_tab)
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(bits.take(size), size)
        k += 1
    return coef, pred


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
_SOF_UNSUPPORTED = {
    0xC2: "progressive DCT (SOF2)",
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def decode_gray(data: bytes) -> np.ndarray:
    """Baseline JPEG -> the luma plane as an (H, W) uint8 array.

    See the module docstring for the supported subset; unsupported frame
    types raise ``NotImplementedError`` so the caller's codec-tier
    routing (``multimodal._video_frames``) can fall through honestly.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (H, W, [(comp_id, h, v, tq)])
    restart_interval = 0
    plane = None
    i = 2
    while i + 1 < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker id — skip them so a padded stream doesn't misparse the
        # fill byte as the id and crash a valid MJPEG frame.
        while i + 1 < len(data) and data[i + 1] == 0xFF:
            i += 1
        if i + 1 >= len(data):
            break
        m = data[i + 1]
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RSTn
            i += 2
            continue
        (L,) = struct.unpack_from(">H", data, i + 2)
        seg = data[i + 4 : i + 2 + L]
        if m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[m]} is outside the pure-numpy "
                "baseline tier; route to the av/cv2 backends"
            )
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.astype(np.int32)
                p += 65
        elif m in (0xC0, 0xC1):  # SOF0/1: baseline / extended sequential
            if seg[0] != 8:
                raise NotImplementedError(f"{seg[0]}-bit samples")
            H, W = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (H, W, comps)
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = tuple(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = tuple(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            plane, i = _decode_scan(
                data, i + 2 + L, seg, frame, qt, huff, restart_interval
            )
            continue
        i += 2 + L
    if plane is None:
        raise ValueError("no scan decoded (missing SOS)")
    return plane


def _decode_scan(data, pos, seg, frame, qt, huff, restart_interval):
    H, W, comps = frame
    ns = seg[0]
    scan = []  # (comp_idx, dc_table, ac_table)
    by_id = {cid: idx for idx, (cid, _, _, _) in enumerate(comps)}
    for s in range(ns):
        cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
        ci = by_id[cs]
        scan.append((ci, huff[(0, tdta >> 4)], huff[(1, tdta & 0x0F)]))
    if ns != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) baseline")
    if ns == 1 and (comps[0][1], comps[0][2]) != (1, 1):
        # a single-component scan is non-interleaved: its blocks raster
        # over the component grid, not the MCU tiling below
        raise NotImplementedError(
            "single-component frame with sampling factors != 1x1"
        )

    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))

    # luma = first frame component; its plane is the output
    _, h0, v0, tq0 = comps[0]
    q0 = qt[tq0][np.argsort(ZIGZAG)]  # natural-order quant for the IDCT
    plane = np.zeros((mcus_y * v0 * 8, mcus_x * h0 * 8), dtype=np.float64)

    segs, end = _entropy_segments(data, pos)
    seg_iter = iter(segs)
    bits = _BitReader(next(seg_iter))
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bits = _BitReader(next(seg_iter))
                preds = [0] * len(comps)
            for ci, dc_tab, ac_tab in scan:
                _, ch, cv, ctq = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        coef, preds[ci] = _decode_block(
                            bits, dc_tab, ac_tab, preds[ci]
                        )
                        if ci != 0:
                            continue  # chroma: bitstream-advance only
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = coef * q0[ZIGZAG]
                        B = _C.T @ blk.reshape(8, 8) @ _C
                        y0 = (my * v0 + by) * 8
                        x0 = (mx * h0 + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = B
            mcu += 1
    out = np.clip(np.round(plane + 128.0), 0, 255).astype(np.uint8)
    # luma extent: full H x W when comps[0] has the max sampling factors
    hy = -(-H * v0 // vmax)
    wy = -(-W * h0 // hmax)
    return out[:hy, :wy], end


# ---------------------------------------------------------------------------
# encoder (grayscale baseline)
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad
        return bytes(self.out)


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_gray(img: np.ndarray, quant: "np.ndarray | None" = None) -> bytes:
    """Grayscale (H, W) uint8 -> a baseline JPEG with the Annex K luminance
    Huffman tables. ``quant`` is a 64-entry natural-order quantization
    table (default all-ones: near-lossless). AC magnitudes are clamped to
    the Annex K size-10 ceiling (|coef| <= 1023) — at most one extra
    quantization step of error on pathological blocks."""
    img = np.asarray(img)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError(f"expected (H, W) uint8, got {img.shape} {img.dtype}")
    H, W = img.shape
    if H == 0 or W == 0:
        raise ValueError("empty image")
    q = (
        np.ones(64, dtype=np.int32)
        if quant is None
        else np.asarray(quant, dtype=np.int32).reshape(64)
    )
    if (q < 1).any() or (q > 255).any():
        raise ValueError("quantization entries must be in [1, 255]")

    # pad to 8x8 blocks by edge replication (T.81 A.2.4 recommendation)
    ph, pw = -(-H // 8) * 8, -(-W // 8) * 8
    padded = np.pad(img, ((0, ph - H), (0, pw - W)), mode="edge")
    B = padded.astype(np.float64) - 128.0

    dc_enc = _encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = _encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    qmat = q.reshape(8, 8).astype(np.float64)
    w = _BitWriter()
    pred = 0
    for y0 in range(0, ph, 8):
        for x0 in range(0, pw, 8):
            X = _C @ B[y0 : y0 + 8, x0 : x0 + 8] @ _C.T
            coef = np.round(X / qmat).astype(np.int64).reshape(64)[ZIGZAG]
            np.clip(coef[1:], -1023, 1023, out=coef[1:])
            diff = int(coef[0]) - pred
            pred = int(coef[0])
            size = _bit_size(diff)
            code, length = dc_enc[size]
            w.put(code, length)
            if size:
                w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
            run = 0
            last_nz = np.nonzero(coef[1:])[0]
            last = int(last_nz[-1]) + 1 if last_nz.size else 0
            for k in range(1, last + 1):
                v = int(coef[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_enc[0xF0]  # ZRL
                    w.put(code, length)
                    run -= 16
                size = _bit_size(v)
                code, length = ac_enc[(run << 4) | size]
                w.put(code, length)
                w.put(v if v >= 0 else v + (1 << size) - 1, size)
                run = 0
            if last < 63:
                code, length = ac_enc[0x00]  # EOB
                w.put(code, length)
    entropy = w.flush()

    def marker(m: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, m, len(payload) + 2) + payload

    # DQT payload wants zigzag order: q is natural-order, emit q[ZIGZAG]
    dqt = marker(0xDB, b"\x00" + bytes(int(x) for x in q[ZIGZAG]))
    sof = marker(0xC0, struct.pack(">BHHB", 8, H, W, 1) + bytes((1, 0x11, 0)))
    dht_dc = marker(
        0xC4, b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    )
    dht_ac = marker(
        0xC4, b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    )
    sos = marker(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
    return (
        b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + entropy
        + b"\xff\xd9"
    )
