"""Pure-numpy baseline JPEG codec (functions/jpeg.py) — the MJPEG video
tier's decoder. No Spark session needed: these are kernel-level tests.

The round-trip tests exercise encoder+decoder together; the hand-
assembled fixture pins the bit-level conventions (zigzag order, Annex K
Huffman codes, DCT normalization, byte padding) against the public T.81
layout INDEPENDENTLY of our encoder, so complementary encode/decode bugs
cannot cancel out.
"""

import struct

import numpy as np
import pytest

from cuda_acceleratedvectordatabaseengine_spark.functions import jpeg


def _marker(m, payload):
    return struct.pack(">BBH", 0xFF, m, len(payload) + 2) + payload


def test_constant_image_exact_roundtrip():
    img = np.full((8, 8), 130, np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_gray(img))
    assert np.array_equal(dec, img)


def test_gradient_noise_odd_size_near_lossless():
    """All-ones quantization: the only loss is coefficient rounding —
    max 2 gray levels; odd dimensions exercise the edge-replication pad
    and final crop."""
    rng = np.random.default_rng(3)
    g = (np.add.outer(np.arange(13) * 5, np.arange(11) * 7) % 200).astype(
        np.int64
    )
    g = np.clip(g + rng.integers(-20, 20, g.shape), 0, 255).astype(np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_gray(g))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


def test_random_noise_and_checkerboard():
    rng = np.random.default_rng(11)
    r = rng.integers(0, 256, (24, 17)).astype(np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_gray(r))
    assert np.abs(dec.astype(int) - r.astype(int)).max() <= 2
    cb = np.zeros((16, 16), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    dec = jpeg.decode_gray(jpeg.encode_gray(cb))
    assert np.abs(dec.astype(int) - cb.astype(int)).max() <= 2


def test_lossy_quant_table_still_close():
    """A real (scaled Annex K-style) quant table: lossy but bounded on
    smooth content."""
    q = np.full(64, 8, dtype=np.int32)
    q[0] = 4
    img = np.add.outer(
        np.linspace(40, 200, 16), np.linspace(0, 40, 16)
    ).astype(np.uint8)
    dec = jpeg.decode_gray(jpeg.encode_gray(img, quant=q))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_hand_assembled_spec_fixture():
    """Single 8x8 block, constant 130, quant all-ones, Annex K tables:
    DC diff = 8*(130-128) = 16 -> DC size-5 code '110' + bits '10000',
    EOB = '1010', 1-padded to two bytes = 0xD0 0xAF. Decoding this
    hand-computed stream pins Huffman code construction, the zigzag/DCT
    conventions, and entropy padding against T.81 itself."""
    fix = (
        b"\xff\xd8"
        + _marker(0xDB, b"\x00" + bytes([1] * 64))
        + _marker(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
        + _marker(
            0xC4, b"\x00" + bytes(jpeg.DC_LUMA_BITS) + bytes(jpeg.DC_LUMA_VALS)
        )
        + _marker(
            0xC4, b"\x10" + bytes(jpeg.AC_LUMA_BITS) + bytes(jpeg.AC_LUMA_VALS)
        )
        + _marker(0xDA, bytes((1, 1, 0x00, 0, 63, 0)))
        + bytes([0xD0, 0xAF])
        + b"\xff\xd9"
    )
    dec = jpeg.decode_gray(fix)
    assert dec.shape == (8, 8)
    assert np.array_equal(dec, np.full((8, 8), 130, np.uint8))


def test_marker_tolerance_app0_and_restart():
    """APPn/COM segments are skipped; DRI + RST markers reset DC
    predictors between restart intervals (decoder must honor them even
    though our encoder never emits them)."""
    img = np.tile(np.arange(64, dtype=np.uint8).reshape(8, 8), (1, 2))
    enc = jpeg.encode_gray(img)
    # splice a JFIF APP0 + COM right after SOI
    app0 = _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    com = _marker(0xFE, b"test comment")
    spliced = enc[:2] + app0 + com + enc[2:]
    assert np.array_equal(jpeg.decode_gray(spliced), jpeg.decode_gray(enc))


def test_unsupported_features_raise_not_implemented():
    img = np.zeros((8, 8), np.uint8)
    enc = jpeg.encode_gray(img)
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)  # rewrite SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode_gray(prog)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_gray(b"\x00\x01\x02")


def test_encode_validates_input():
    with pytest.raises(ValueError, match="uint8"):
        jpeg.encode_gray(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError, match="empty"):
        jpeg.encode_gray(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError, match="quantization"):
        jpeg.encode_gray(np.zeros((4, 4), np.uint8), quant=np.zeros(64))


def test_three_component_stream_takes_luma():
    """A minimal 3-component 4:4:4 interleaved stream (hand-assembled:
    all components reuse the luminance tables, chroma blocks are
    EOB-after-zero-DC): the decoder must consume chroma entropy data and
    return only the luma plane."""
    # luma DC diff 16 (size 5: '110' + '10000'), EOB '1010'  -> 12 bits
    # chroma x2: DC size 0 ('00'), EOB '1010'                -> 6 bits each
    # total 24 bits: 110 10000 1010 00 1010 00 1010 -> pads to 3 bytes
    bits = "110" + "10000" + "1010" + "00" + "1010" + "00" + "1010"
    pad = "1" * (-len(bits) % 8)
    payload = int(bits + pad, 2).to_bytes((len(bits) + len(pad)) // 8, "big")
    fix = (
        b"\xff\xd8"
        + _marker(0xDB, b"\x00" + bytes([1] * 64))
        + _marker(
            0xC0,
            struct.pack(">BHHB", 8, 8, 8, 3)
            + bytes((1, 0x11, 0))
            + bytes((2, 0x11, 0))
            + bytes((3, 0x11, 0)),
        )
        + _marker(
            0xC4, b"\x00" + bytes(jpeg.DC_LUMA_BITS) + bytes(jpeg.DC_LUMA_VALS)
        )
        + _marker(
            0xC4, b"\x10" + bytes(jpeg.AC_LUMA_BITS) + bytes(jpeg.AC_LUMA_VALS)
        )
        + _marker(
            0xDA,
            bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)),
        )
        + payload
        + b"\xff\xd9"
    )
    dec = jpeg.decode_gray(fix)
    assert dec.shape == (8, 8)
    assert np.array_equal(dec, np.full((8, 8), 130, np.uint8))


# ---------------------------------------------------------------------------
# property fuzz (hypothesis): arbitrary sizes, content, quant tables
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    seed=st.integers(0, 2**31 - 1),
    qmax=st.integers(1, 64),
)
def test_roundtrip_error_bounded_by_quant(h, w, seed, qmax):
    """decode(encode(img, q)) error is bounded by the quantization step:
    each coefficient is off by <= q_k/2, the orthonormal IDCT maps that
    L2 ball to pixel errors <= sum_k(q_k/2 * |basis|) — a loose but
    sufficient uniform bound is max(q)*4 + 2 gray levels (empirically
    max(q)+2 for natural content; the bound catches gross bitstream or
    zigzag defects, not subtle rate loss)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    q = rng.integers(1, qmax + 1, 64).astype(np.int32)
    out = jpeg.decode_gray(jpeg.encode_gray(img, quant=q))
    assert out.shape == img.shape
    bound = int(q.max()) * 4 + 2
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


@settings(max_examples=30, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_roundtrip_near_lossless_default_quant(h, w, seed):
    """All-ones quant: error <= 2 gray levels for ANY content/size,
    including non-multiple-of-8 edges (edge-replication padding)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    out = jpeg.decode_gray(jpeg.encode_gray(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_fill_bytes_before_marker_tolerated():
    """ADVICE r7: T.81 B.1.1.2 allows any number of 0xFF fill bytes
    before a marker id; a padded-but-valid stream must decode, not
    ValueError (which would crash the MJPEG pipeline instead of
    falling through to the av/cv2 tiers)."""
    img = np.tile(np.arange(64, dtype=np.uint8).reshape(8, 8), (2, 1))
    enc = jpeg.encode_gray(img)
    # pad with fill bytes right after SOI (before the next marker's FF)
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    assert np.array_equal(jpeg.decode_gray(padded), jpeg.decode_gray(enc))
