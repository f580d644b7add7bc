"""Stdlib GIF/LZW codec: round-trip, hand-constructed decode, strict
rejects, and raw-bytes fuzz.

The decoder is validated two ways (repo codec standard): round-trip
through our own encoder AND against a hand-packed LZW bitstream written
out code by code — so an encoder/decoder bug pair that cancels in
round-trip (e.g. a mirrored width-bump off-by-one) cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from series_tiempo_ar_scraping_spark.operators import gif as G
from series_tiempo_ar_scraping_spark.operators import multimodal as MM


def _pal(n, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, 3), np.uint8)


@pytest.mark.parametrize(
    "h,w,n",
    [(1, 1, 2), (2, 3, 4), (5, 7, 8), (16, 16, 16), (40, 60, 256)],
)
def test_gif_round_trip(h, w, n):
    pal = _pal(n, seed=h * 100 + w)
    idx = np.random.default_rng(n).integers(0, n, (h, w), np.uint8)
    out = G.try_decode_gif(G.encode_gif(idx, pal))
    assert out is not None and out.shape == (h, w, 3)
    assert np.array_equal(out, pal[idx])


def test_gif_round_trip_through_dictionary_reset():
    """Random 256-color noise at 100x200 emits ~20k codes — the
    dictionary hits the 4096-entry cap several times, so the encoder's
    CLEAR-reset and the decoder's reset path both run (and every code
    width 9..12 is exercised on the way)."""
    pal = _pal(256, seed=1)
    idx = np.random.default_rng(2).integers(0, 256, (100, 200), np.uint8)
    out = G.try_decode_gif(G.encode_gif(idx, pal))
    assert out is not None
    assert np.array_equal(out, pal[idx])


def test_gif_round_trip_width_growth_with_repeats():
    """Highly repetitive data grows long dictionary strings (deep
    prefix chains) rather than resetting — the other LZW regime."""
    pal = _pal(4, seed=3)
    idx = np.tile(np.array([0, 1, 2, 3, 2, 1], np.uint8), 2000).reshape(
        60, 200
    )
    out = G.try_decode_gif(G.encode_gif(idx, pal))
    assert out is not None
    assert np.array_equal(out, pal[idx])


def _hand_gif() -> bytes:
    """2x1 image, 4-color global table, LZW stream packed BY HAND:
    mcs=2 -> clear=4, eoi=5, width=3. Codes [CLEAR=4, 1, 3, EOI=5]
    packed LSB-first: 4 | 1<<3 | 3<<6 | 5<<9 = 0xACC
    -> bytes 0xCC 0x0A (12 bits)."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 1, 0x80 | 1, 0, 0)  # GCT of 4
    out += bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )  # palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
    out += bytes([2])  # min code size
    out += bytes([2, 0xCC, 0x0A])  # one 2-byte sub-block
    out += bytes([0, 0x3B])
    return bytes(out)


def test_gif_decode_hand_packed_bitstream():
    img = G.try_decode_gif(_hand_gif())
    assert img is not None and img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [40, 50, 60]  # palette[1]
    assert img[0, 1].tolist() == [100, 110, 120]  # palette[3]


def test_gif_decode_skips_extension_blocks():
    raw = bytearray(_hand_gif())
    # inject a graphic-control extension between LSD+GCT and the image
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    insert_at = 13 + 12  # after header + GCT
    raw[insert_at:insert_at] = ext
    img = G.try_decode_gif(bytes(raw))
    assert img is not None
    assert img[0, 1].tolist() == [100, 110, 120]


def test_gif_strict_rejects():
    good = _hand_gif()
    assert G.try_decode_gif(good) is not None
    assert G.try_decode_gif(b"") is None
    assert G.try_decode_gif(b"GIF89a is a format") is None
    assert G.try_decode_gif(good[:-1]) is None  # missing trailer
    assert G.try_decode_gif(good + b"\x00") is None  # trailing garbage
    # interlace flag: outside the strict subset (descriptor layout:
    # 0x2C at 25, left 26, top 28, width 30, height 32, packed at 34)
    bad = bytearray(good)
    bad[13 + 12 + 9] |= 0x40  # image-descriptor packed byte
    assert G.try_decode_gif(bytes(bad)) is None
    # image rect exceeding the logical screen
    bad = bytearray(good)
    struct.pack_into("<H", bad, 13 + 12 + 5, 9)  # image width 9 > screen 2
    assert G.try_decode_gif(bytes(bad)) is None
    # no color table anywhere
    no_gct = bytearray(good)
    no_gct[10] &= 0x7F  # clear GCT flag
    del no_gct[13 : 13 + 12]  # drop the table bytes
    assert G.try_decode_gif(bytes(no_gct)) is None


def test_gif_lzw_rejects_bad_streams():
    """Each stream keeps the container valid (prefix INCLUDES the
    mcs=2 byte at offset 35) so the reject fires inside _lzw_decompress
    — a prefix cut one byte short would make the sub-block length be
    parsed as mcs and every case reject vacuously in the container
    parser instead."""
    head = bytes(_hand_gif()[: 13 + 12 + 11])  # ...through the mcs byte
    assert head[-1] == 2  # the prefix really ends at min code size
    # code beyond the dictionary: first code after CLEAR must be a
    # literal. codes [CLEAR=4, 6] -> 4 | 6<<3 = 0x34
    assert G.try_decode_gif(head + bytes([1, 0x34, 0, 0x3B])) is None
    # pixel over-run: 3 literals for a 2-pixel image
    # codes [4, 1, 1, 1, 5]: 4|1<<3|1<<6|1<<9|5<<12 = 0x524C -> 4C 52
    assert G.try_decode_gif(head + bytes([2, 0x4C, 0x52, 0, 0x3B])) is None
    # pixel under-run: EOI after one literal
    # codes [4, 1, 5]: 4|1<<3|5<<6 = 0x14C -> 4C 01
    assert G.try_decode_gif(head + bytes([2, 0x4C, 0x01, 0, 0x3B])) is None
    # missing EOI: bits exhausted mid-stream
    assert G.try_decode_gif(head + bytes([1, 0x0C, 0, 0x3B])) is None
    # control: the same container with a CORRECT stream decodes, so the
    # rejects above cannot be blamed on the shared prefix
    assert G.try_decode_gif(head + bytes([2, 0xCC, 0x0A, 0, 0x3B])) is not None


def test_gif_dispatches_through_try_decode_image():
    pal = _pal(8, seed=9)
    idx = np.random.default_rng(9).integers(0, 8, (3, 4), np.uint8)
    out = MM.try_decode_image(G.encode_gif(idx, pal))
    assert out is not None
    assert np.array_equal(out, pal[idx])


from hypothesis import given, settings
from hypothesis import strategies as st

_VALID = G.encode_gif(
    np.random.default_rng(5).integers(0, 8, (6, 7), np.uint8), _pal(8, 5)
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_gif_decoder_never_raises_on_raw_bytes(data):
    G.try_decode_gif(data)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, len(_VALID) - 1),
    st.integers(0, len(_VALID) - 1),
    st.binary(min_size=1, max_size=8),
)
def test_gif_decoder_never_raises_on_corrupted_valid(pos, cut, junk):
    """The nastier fuzz case: plausible headers, broken bodies."""
    data = bytearray(_VALID)
    data[pos : pos + len(junk)] = junk
    G.try_decode_gif(bytes(data))
    G.try_decode_gif(bytes(data[:cut]))


def test_gif_animated_round_trip_with_delays():
    pal = _pal(8, seed=11)
    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 8, (4, 6), np.uint8) for _ in range(5)]
    raw = G.encode_gif_frames(frames, pal, delay_cs=7)
    w, h, delays, out = G.try_decode_gif_frames(raw)
    assert (w, h) == (6, 4) and delays == [7] * 5 and len(out) == 5
    for f, o in zip(frames, out):
        assert np.array_equal(o, pal[f])


def test_gif_single_image_api_rejects_animated_and_vice_versa():
    pal = _pal(4, seed=12)
    fr = np.zeros((2, 2), np.uint8)
    anim = G.encode_gif_frames([fr, fr], pal, delay_cs=3)
    assert G.try_decode_gif(anim) is None  # strict single-image subset
    single = G.encode_gif(fr, pal)
    parsed = G.try_decode_gif_frames(single)
    assert parsed is not None and parsed[2] == [0] and len(parsed[3]) == 1


def test_gif_frames_reject_subrect_frame():
    """A frame not covering the logical screen needs compositing /
    disposal handling — outside the strict subset."""
    pal = _pal(4, seed=13)
    raw = bytearray(G.encode_gif_frames(
        [np.zeros((2, 2), np.uint8)] * 2, pal, delay_cs=1
    ))
    # second image descriptor: shrink its width to 1 and re-point the
    # LZW stream? simpler: grow the LOGICAL screen so frames no longer
    # cover it
    struct.pack_into("<H", raw, 6, 3)  # screen width 3, frames are 2
    assert G.try_decode_gif_frames(bytes(raw)) is None


def test_gif_anim_frame_stats_kernel(spark, sf_dir):
    """End-to-end through the Spark kernel: synthesized animated GIFs
    decode to the closed-form frame count, timestamps and means."""
    from series_tiempo_ar_scraping_spark.operators import multimodal as MM
    from series_tiempo_ar_scraping_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    rows = MM.gif_anim_frame_stats(
        MM.synthesize_gif_anim_media(docs)
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    assert len(by_doc) == 20
    for did, rs in by_doc.items():
        assert len(rs) == 2 + did % 3
        for r in sorted(rs, key=lambda r: r.frame_idx):
            assert r.ts_ms == r.frame_idx * 10 * (4 + did % 6)
            i = (did + r.frame_idx) % 8
            want = (
                (37 * i + did) % 256
                + (59 * i + 2 * did) % 256
                + (83 * i + 3 * did) % 256
            ) / 3.0
            assert r.mean_y == want

def test_gif_single_image_api_stops_before_second_frame_lzw(monkeypatch):
    """try_decode_gif must reject a multi-image GIF at the SECOND image
    descriptor, before paying for its LZW decode (decompression-bomb
    surface: an animation fed to the single-image corpus path)."""
    pal = _pal(4, seed=14)
    fr = np.zeros((3, 3), np.uint8)
    anim = G.encode_gif_frames([fr, fr, fr], pal, delay_cs=2)
    calls = []
    real = G._lzw_decompress
    monkeypatch.setattr(
        G, "_lzw_decompress", lambda *a: calls.append(1) or real(*a)
    )
    assert G.try_decode_gif(anim) is None
    assert len(calls) <= 1  # frame 1 at most; never frames 2..n


def test_gif_anim_ts_overflow_payload_dropped(spark):
    """A payload whose cumulative delays exceed int32 ms is dropped whole
    (never emitted with wrapped timestamps); a sane payload in the same
    batch still decodes."""
    pal = _pal(4, seed=15)
    one = np.zeros((1, 1), np.uint8)
    bomb = G.encode_gif_frames([one] * 3300, pal, delay_cs=65535)
    assert sum([65535] * 3299) * 10 > 2**31 - 1  # really overflows
    ok = G.encode_gif_frames([one, one], pal, delay_cs=5)
    df = spark.createDataFrame(
        [(1, bytearray(bomb)), (2, bytearray(ok))],
        "media_id long, content binary",
    )
    rows = MM.gif_anim_frame_stats(df).collect()
    assert sorted((r.media_id, r.frame_idx, r.ts_ms) for r in rows) == [
        (2, 0, 0),
        (2, 1, 50),
    ]


_VALID_ANIM = G.encode_gif_frames(
    [np.random.default_rng(7).integers(0, 8, (4, 5), np.uint8)
     for _ in range(3)],
    _pal(8, 7),
    delay_cs=6,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_gif_anim_decoder_never_raises_on_raw_bytes(data):
    G.try_decode_gif_frames(data)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, len(_VALID_ANIM) - 1),
    st.integers(0, len(_VALID_ANIM) - 1),
    st.binary(min_size=1, max_size=8),
)
def test_gif_anim_decoder_never_raises_on_corrupted_valid(pos, cut, junk):
    """Multi-frame twin of the corrupted-valid fuzz: plausible animated
    headers and GCE blocks, broken bodies — decode returns None or a
    valid tuple, never raises."""
    data = bytearray(_VALID_ANIM)
    data[pos : pos + len(junk)] = junk
    out = G.try_decode_gif_frames(bytes(data))
    if out is not None:
        w, h, delays, frames = out
        assert len(delays) == len(frames)
        assert all(f.shape == (h, w, 3) for f in frames)
    G.try_decode_gif_frames(bytes(data[:cut]))
