"""Stdlib/numpy baseline JPEG codec: round-trip, strictness, fuzz.

The decoder is general baseline-sequential (canonical Huffman from DHT,
dequantize, IDCT); the encoder is the fixture side. Solid-gray images
round-trip EXACTLY (DC-only blocks under all-ones quantization), which
the oracled multimodal_jpeg_stats query relies on; random images
round-trip within the quantization/rounding envelope (±2).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from series_tiempo_ar_scraping_spark.operators import jpeg as J
from series_tiempo_ar_scraping_spark.operators import multimodal as MM


def _rand(h, w, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("c", [0, 1, 127, 128, 254, 255])
@pytest.mark.parametrize("h,w", [(8, 8), (8, 24), (16, 16)])
def test_solid_gray_roundtrip_exact(c, h, w):
    dec = J.try_decode_jpeg(J.encode_jpeg_baseline(np.full((h, w), c, np.uint8)))
    assert dec is not None and dec.shape == (h, w, 3)
    assert np.all(dec == c)


def test_random_gray_roundtrip_within_envelope():
    px = _rand(16, 24, seed=1)
    dec = J.try_decode_jpeg(J.encode_jpeg_baseline(px))
    assert dec is not None
    assert int(np.abs(dec[:, :, 0].astype(int) - px.astype(int)).max()) <= 1
    # the three output channels agree for a grayscale source
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])


def test_random_rgb_roundtrip_within_envelope():
    px = _rand(16, 16, 3, seed=2)
    dec = J.try_decode_jpeg(J.encode_jpeg_baseline(px))
    assert dec is not None and dec.shape == (16, 16, 3)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2


def test_multi_block_dc_prediction_chain():
    """A gradient of solid 8x8 tiles exercises the DC differential
    predictor across many blocks — each tile must come back exactly."""
    tiles = np.arange(32) * 8  # 0, 8, ..., 248
    px = np.zeros((8, 8 * 32), np.uint8)
    for i, v in enumerate(tiles):
        px[:, i * 8 : (i + 1) * 8] = v
    dec = J.try_decode_jpeg(J.encode_jpeg_baseline(px))
    for i, v in enumerate(tiles):
        assert np.all(dec[:, i * 8 : (i + 1) * 8, 0] == v), i


def test_try_decode_image_dispatches_jpeg():
    px = np.full((8, 8), 77, np.uint8)
    dec = MM.try_decode_image(J.encode_jpeg_baseline(px))
    assert dec is not None and np.all(dec == 77)


def test_decode_rejects_malformed():
    enc = J.encode_jpeg_baseline(_rand(8, 8, seed=3))
    assert J.try_decode_jpeg(enc) is not None
    assert J.try_decode_jpeg(enc[:-1]) is None  # EOI truncated
    assert J.try_decode_jpeg(enc + b"x") is None  # trailing garbage
    assert J.try_decode_jpeg(b"\xff\xd8") is None
    assert J.try_decode_jpeg(b"\xff\xd8\xff\xd9") is None
    assert J.try_decode_jpeg(b"not a jpeg") is None
    # flip one entropy byte: either huffman/marker error (None) or a
    # decoded-but-different image — never an exception
    bad = bytearray(enc)
    bad[-5] ^= 0x55
    J.try_decode_jpeg(bytes(bad))


def test_decode_rejects_unsupported_features():
    enc = bytearray(J.encode_jpeg_baseline(_rand(8, 8, seed=4)))
    # progressive SOF: rewrite the C0 marker to C2
    i = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2:])
    assert J.try_decode_jpeg(prog) is None
    # 2x1 subsampling in SOF is rejected (decoder is 1x1 only)
    sub = bytearray(enc)
    assert sub[i + 11] == 0x11  # first component sampling byte
    sub[i + 11] = 0x21
    assert J.try_decode_jpeg(bytes(sub)) is None
    # DRI segment renders it unsupported
    dri = bytes(enc[:i]) + b"\xff\xdd\x00\x04\x00\x08" + bytes(enc[i:])
    assert J.try_decode_jpeg(dri) is None


def test_zigzag_is_the_standard_order():
    """Spot-pin the generated zigzag against the spec's published first
    and last entries so a generator bug can't silently reorder
    coefficients (encoder and decoder share ZIGZAG, so round-trip alone
    would not catch it)."""
    zz = J.ZIGZAG.tolist()
    # spec order, flat row-major indices: (0,0) (0,1) (1,0) (2,0) (1,1)
    # (0,2) (0,3) (1,2) ...
    assert zz[:8] == [0, 1, 8, 16, 9, 2, 3, 10]
    # spec tail (ITU T.81 Figure A.6, last two diagonals), flat
    # row-major indices
    assert zz[-8:] == [53, 60, 61, 54, 47, 55, 62, 63]
    assert sorted(zz) == list(range(64))


def test_huffman_tables_are_canonical_and_legal():
    dc = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac = J._canonical_codes(J._AC_BITS, J._AC_VALS)
    assert len(dc) == 12 and len(ac) == 256
    # DHT BITS entries must each fit a u8
    assert all(0 <= b <= 255 for b in J._AC_BITS + J._DC_BITS)
    # no all-ones codeword (reserved by convention for padding safety)
    for code, length in list(dc.values()) + list(ac.values()):
        assert code != (1 << length) - 1
    # prefix-free: EVERY shorter code checked against EVERY longer one
    # (adjacent-only after sorting misses non-adjacent collisions, e.g.
    # 1-bit 0 prefixing 2-bit 01 with 1-bit 1 sorted between them)
    for tbl in (dc, ac):
        codes = sorted((l, c) for c, l in tbl.values())
        for i, (l1, c1) in enumerate(codes):
            for l2, c2 in codes[i + 1 :]:
                assert not (l2 > l1 and (c2 >> (l2 - l1)) == c1), (
                    (l1, c1), (l2, c2),
                )
        # and no duplicate (length, code) pairs at all
        assert len(set(codes)) == len(codes)


from hypothesis import given, settings
from hypothesis import strategies as st

_VALID_JPEG = J.encode_jpeg_baseline(np.zeros((8, 8), np.uint8))


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=len(_VALID_JPEG)),
    st.binary(max_size=24),
)
def test_decoder_never_raises_on_corrupted_prefixes(cut, tail):
    J.try_decode_jpeg(_VALID_JPEG[:cut] + tail)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=200))
def test_decoder_never_raises_on_raw_bytes(data):
    J.try_decode_jpeg(b"\xff\xd8" + data)
