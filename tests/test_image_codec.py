"""Stdlib raster codec (PPM P6 / 24-bit BMP) + real-pixel multimodal path.

The decode side is validated two ways: round-trip through our own encoders
(stride padding, channel order) AND against a hand-constructed BMP byte
string written out field by field — so an encoder/decoder bug pair that
cancels out in round-trip cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from series_tiempo_ar_scraping_spark.operators import gif as GF
from series_tiempo_ar_scraping_spark.operators import jpeg as JP
from series_tiempo_ar_scraping_spark.operators import multimodal as MM
from series_tiempo_ar_scraping_spark.session import load_table


def _rand_pixels(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (5, 7), (4, 4)])
def test_bmp_round_trip_with_stride_padding(h, w):
    px = _rand_pixels(h, w, seed=h * 100 + w)
    out = MM.try_decode_image(MM.encode_bmp24(px))
    assert out is not None and out.shape == (h, w, 3)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("h,w", [(1, 1), (3, 2), (6, 5)])
def test_ppm_round_trip(h, w):
    px = _rand_pixels(h, w, seed=h * 10 + w)
    out = MM.try_decode_image(MM.encode_ppm(px))
    assert out is not None and out.shape == (h, w, 3)
    assert np.array_equal(out, px)


def test_decode_hand_constructed_bmp():
    """2x2 bottom-up BMP written field by field: decode must un-flip rows
    and swap BGR->RGB. Top-left red, top-right green, bottom-left blue,
    bottom-right white; width 2 -> stride 8 (2 pad bytes per row)."""
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    bottom_row = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # BGR!
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    img = MM.try_decode_image(header + info + bottom_row + top_row)
    assert img is not None
    assert img[0, 0].tolist() == [255, 0, 0]  # red
    assert img[0, 1].tolist() == [0, 255, 0]  # green
    assert img[1, 0].tolist() == [0, 0, 255]  # blue
    assert img[1, 1].tolist() == [255, 255, 255]  # white


def test_decode_hand_constructed_ppm():
    raw = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    img = MM.try_decode_image(raw)
    assert img is not None and img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [1, 2, 3]
    assert img[0, 1].tolist() == [4, 5, 6]


def test_decode_rejects_malformed():
    good = MM.encode_ppm(_rand_pixels(2, 2, seed=1))
    assert MM.try_decode_image(good) is not None
    # truncated payload contradicts declared dims
    assert MM.try_decode_image(good[:-1]) is None
    # plain text that merely starts with the magic
    assert MM.try_decode_image(b"P6 is a nice format, actually") is None
    assert MM.try_decode_image(b"BMW makes cars") is None
    # wrong maxval
    assert MM.try_decode_image(b"P6\n1 1\n65535\n" + b"\x00" * 3) is None
    # BMP with a compression flag set (BI_RLE8)
    bad = bytearray(MM.encode_bmp24(_rand_pixels(2, 2, seed=2)))
    struct.pack_into("<I", bad, 30, 1)
    assert MM.try_decode_image(bytes(bad)) is None
    assert MM.try_decode_image(b"") is None


def test_nearest_resize_caps_long_edge():
    px = _rand_pixels(10, 20, seed=3)
    small = MM.nearest_resize(px, 5)
    assert small.shape == (2, 5, 3)  # aspect preserved, floor
    # corners map to source corners-ish cells (nearest gather, no blend)
    assert small.dtype == np.uint8
    assert MM.nearest_resize(px, 100) is px  # no upscale


def test_resize_media_real_pixels_reencode(spark):
    px = _rand_pixels(8, 1024, seed=4)
    rows = [(1, "image", bytearray(MM.encode_bmp24(px)),
             (None, None, None, None)),
            (2, "image", bytearray(b"not an image"),
             (None, None, None, None))]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r.media_id: r for r in MM.resize_media(media, max_dim=512).collect()}
    # real branch: actual downscale, PPM re-encode that decodes back
    assert (out[1].width, out[1].height) == (512, 4)
    again = MM.try_decode_image(bytes(out[1].content))
    assert again is not None and again.shape == (4, 512, 3)
    assert np.array_equal(again, MM.nearest_resize(px, 512))
    # stub branch untouched content
    assert bytes(out[2].content) == b"not an image"


def test_extract_features_real_dims(spark):
    px = _rand_pixels(33, 17, seed=5)
    rows = [(7, "image", bytearray(MM.encode_ppm(px)),
             (None, None, None, None))]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feat = MM.extract_features(media).collect()[0]
    assert (feat.feat_width, feat.feat_height) == (17, 33)


def test_image_stats_on_synthesized_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    stats = MM.image_stats(MM.synthesize_raster_media(docs)).collect()
    assert len(stats) == 40
    for r in stats:
        did = r.media_id
        assert r.decodable
        assert (r.width, r.height) == (1 + did % 7, 1 + did % 5)
        want = (did % 256 + (did * 7) % 256 + (did * 13) % 256) / 3.0
        assert r.mean_luma == pytest.approx(want, abs=0)


def test_image_stats_null_for_undecodable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    media = MM.documents_as_media(docs)
    stats = MM.image_stats(media).collect()
    assert stats and all(
        (not r.decodable) and r.width is None and r.mean_luma is None
        for r in stats
    )


# --- PNG (stdlib zlib) codec ------------------------------------------------


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 5), (16, 16)])
def test_png_round_trip_every_filter(ft, h, w):
    px = _rand_pixels(h, w, seed=ft * 1000 + h * 10 + w)
    out = MM.try_decode_image(MM.encode_png(px, filter_type=ft))
    assert out is not None and out.shape == (h, w, 3)
    assert np.array_equal(out, px)


def test_png_decode_hand_constructed():
    """1x2 RGB PNG written chunk by chunk with filter-0 scanline: decode
    must see pixels (10,20,30) and (40,50,60) — catches an encoder/decoder
    bug pair that would cancel in round-trip."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    scan = b"\x00" + bytes([10, 20, 30, 40, 50, 60])
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(scan))
        + MM._png_chunk(b"IEND", b"")
    )
    img = MM.try_decode_image(raw)
    assert img is not None and img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[0, 1].tolist() == [40, 50, 60]


def test_png_gray_and_rgba_color_types():
    """Color type 0 replicates gray to RGB; color type 6 drops alpha."""
    import zlib

    gray = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", gray)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00" + bytes([7, 250])))
        + MM._png_chunk(b"IEND", b"")
    )
    img = MM.try_decode_image(raw)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [7, 7, 7]
    assert img[0, 1].tolist() == [250, 250, 250]
    rgba = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", rgba)
        + MM._png_chunk(
            b"IDAT", zlib.compress(b"\x00" + bytes([9, 8, 7, 128]))
        )
        + MM._png_chunk(b"IEND", b"")
    )
    img = MM.try_decode_image(raw)
    assert img.shape == (1, 1, 3) and img[0, 0].tolist() == [9, 8, 7]


def test_png_decode_rejects_malformed():
    import zlib

    good = MM.encode_png(_rand_pixels(3, 4, seed=11), filter_type=4)
    assert MM.try_decode_image(good) is not None
    assert MM.try_decode_image(good[:-1]) is None  # truncated
    assert MM.try_decode_image(good + b"x") is None  # trailing garbage
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip an IDAT byte -> chunk CRC mismatch
    assert MM.try_decode_image(bytes(bad)) is None
    # interlaced (Adam7) refused
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(raw) is None
    # 16-bit depth refused
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(raw) is None
    # palette entries malformed: length not divisible by 3
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"PLTE", b"\x00\x00\x00\x01")
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(raw) is None
    # inflated length contradicting declared dims refused
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00" + b"\x01" * 6))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(raw) is None
    # unknown filter byte (5) refused
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x05\x01\x02\x03"))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(raw) is None
    # signature alone / prose starting with the signature
    assert MM.try_decode_image(MM._PNG_SIG) is None
    assert MM.try_decode_image(MM._PNG_SIG + b" is a format") is None


def test_png_palette_decode_and_strictness():
    """Color type 3 (indexed): 2x1 image, indices 1 and 0 into a 2-entry
    palette — plus the reject cases (OOB index, PLTE after IDAT,
    duplicate PLTE)."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([10, 20, 30, 200, 210, 220])
    idat = zlib.compress(b"\x00\x01\x00")  # filter 0, indices 1, 0
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"PLTE", plte)
        + MM._png_chunk(b"IDAT", idat)
        + MM._png_chunk(b"IEND", b"")
    )
    img = MM.try_decode_image(raw)
    assert img is not None and img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [200, 210, 220]
    assert img[0, 1].tolist() == [10, 20, 30]
    # index beyond the palette is a reject, not a wrap/clamp
    oob = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"PLTE", plte)
        + MM._png_chunk(b"IDAT", zlib.compress(b"\x00\x02\x00"))
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(oob) is None
    # PLTE must precede IDAT
    late = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", idat)
        + MM._png_chunk(b"PLTE", plte)
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(late) is None
    # exactly one PLTE
    dup = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"PLTE", plte)
        + MM._png_chunk(b"PLTE", plte)
        + MM._png_chunk(b"IDAT", idat)
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(dup) is None
    # indexed without any PLTE
    noplte = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", idat)
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(noplte) is None


def test_png_decompression_bomb_is_bounded():
    """A 1x1 IHDR whose IDAT inflates to ~64 MB must be rejected WITHOUT
    materializing the inflated stream (the decompressobj cap): valid
    CRCs, hostile payload — the corpus-poisoning case."""
    import zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # ~64 KB compressed
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", bomb)
        + MM._png_chunk(b"IEND", b"")
    )
    import tracemalloc

    tracemalloc.start()
    assert MM.try_decode_image(raw) is None
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 << 20, f"inflated {peak} bytes for a 1x1 header"
    # truncated-stream twin: ends early but fits the expected length
    half = zlib.compressobj()
    partial = half.compress(b"\x00\x01\x02\x03")  # no flush: incomplete
    raw = (
        MM._PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", partial)
        + MM._png_chunk(b"IEND", b"")
    )
    assert MM.try_decode_image(raw) is None


def test_png_stats_on_synthesized_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    stats = MM.image_stats(MM.synthesize_png_media(docs)).collect()
    assert len(stats) == 40
    for r in stats:
        did = r.media_id
        w, h = 1 + did % 7, 1 + did % 5
        assert r.decodable
        assert (r.width, r.height) == (w, h)
        want = sum(
            (did + 3 * x + 5 * y + 11 * c) % 256
            for y in range(h) for x in range(w) for c in range(3)
        ) / (w * h * 3)
        assert r.mean_luma == pytest.approx(want, abs=0)


# --- WAV (RIFF PCM16) codec ------------------------------------------------


def test_wav_round_trip_mono_and_stereo():
    mono = np.array([100, -100, 32767, -32768, 0], dtype=np.int16)
    rate, frames = MM.try_decode_wav(MM.encode_wav_pcm16(mono, 8000))
    assert rate == 8000 and frames.shape == (5, 1)
    assert np.array_equal(frames[:, 0], mono)
    stereo = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    rate, frames = MM.try_decode_wav(MM.encode_wav_pcm16(stereo, 44100))
    assert rate == 44100 and frames.shape == (3, 2)
    assert np.array_equal(frames, stereo)


def test_decode_hand_constructed_wav():
    """44-byte canonical WAV written field by field: 2 mono frames,
    little-endian samples 258 (0x0102) and -2."""
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    data = b"\x02\x01" + b"\xfe\xff"
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt \
        + b"data" + struct.pack("<I", 4) + data
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, frames = MM.try_decode_wav(raw)
    assert rate == 16000
    assert frames[:, 0].tolist() == [258, -2]


def test_wav_decode_rejects_malformed():
    good = MM.encode_wav_pcm16(np.array([1, 2, 3], dtype=np.int16), 8000)
    assert MM.try_decode_wav(good) is not None
    assert MM.try_decode_wav(good[:-1]) is None  # truncated data chunk
    assert MM.try_decode_wav(b"RIFFxxxxWAVE") is None  # no chunks
    assert MM.try_decode_wav(b"not audio at all") is None
    # non-PCM format code
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 3)  # fmt chunk body starts at 20
    assert MM.try_decode_wav(bytes(bad)) is None
    # image codec must not claim WAVs and vice versa
    assert MM.try_decode_image(good) is None


def test_wav_empty_data_chunk_is_undecodable_not_a_crash(spark):
    """A structurally valid PCM16 WAV whose data chunk is empty must decode
    to None (null stats row), not crash audio_stats on max()/rms of an
    empty sample set."""
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt \
        + b"data" + struct.pack("<I", 0)
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    assert MM.try_decode_wav(raw) is None
    # end-to-end: the null row comes out of audio_stats, no executor error
    media = spark.createDataFrame([(1, bytearray(raw))], MM.RASTER_SCHEMA)
    rows = MM.audio_stats(media).collect()
    assert len(rows) == 1 and rows[0]["decodable"] is False
    assert rows[0]["rms"] is None and rows[0]["peak"] is None


def test_audio_stats_on_synthesized_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    stats = MM.audio_stats(MM.synthesize_wav_media(docs)).collect()
    assert len(stats) == 30
    for r in stats:
        did = r.media_id
        amp = 1 + did % 997
        assert r.decodable
        assert r.sample_rate == 8000
        assert r.n_frames == 80 + did % 50
        assert r.peak == amp
        assert r.rms == float(amp)  # square wave: exact


def test_audio_stats_null_for_undecodable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    stats = MM.audio_stats(MM.documents_as_media(docs)).collect()
    assert stats and all(
        (not r.decodable) and r.rms is None and r.sample_rate is None
        for r in stats
    )


# Vendored expected expansion tables: little-endian int16 output of
# stdlib audioop.ulaw2lin/alaw2lin over bytes(range(256)), captured on
# CPython 3.11. audioop is REMOVED in Python 3.13, so the live
# comparison test below silently skips there — these literals keep the
# independent ITU pin alive on any interpreter.
_ULAW_LIN16_HEX = (
    "84828486848a848e84928496849a849e84a284a684aa84ae84b284b684ba84be"
    "84c184c384c584c784c984cb84cd84cf84d184d384d584d784d984db84dd84df"
    "04e104e204e304e404e504e604e704e804e904ea04eb04ec04ed04ee04ef04f0"
    "c4f044f1c4f144f2c4f244f3c4f344f4c4f444f5c4f544f6c4f644f7c4f744f8"
    "a4f8e4f824f964f9a4f9e4f924fa64faa4fae4fa24fb64fba4fbe4fb24fc64fc"
    "94fcb4fcd4fcf4fc14fd34fd54fd74fd94fdb4fdd4fdf4fd14fe34fe54fe74fe"
    "8cfe9cfeacfebcfeccfedcfeecfefcfe0cff1cff2cff3cff4cff5cff6cff7cff"
    "88ff90ff98ffa0ffa8ffb0ffb8ffc0ffc8ffd0ffd8ffe0ffe8fff0fff8ff0000"
    "7c7d7c797c757c717c6d7c697c657c617c5d7c597c557c517c4d7c497c457c41"
    "7c3e7c3c7c3a7c387c367c347c327c307c2e7c2c7c2a7c287c267c247c227c20"
    "fc1efc1dfc1cfc1bfc1afc19fc18fc17fc16fc15fc14fc13fc12fc11fc10fc0f"
    "3c0fbc0e3c0ebc0d3c0dbc0c3c0cbc0b3c0bbc0a3c0abc093c09bc083c08bc07"
    "5c071c07dc069c065c061c06dc059c055c051c05dc049c045c041c04dc039c03"
    "6c034c032c030c03ec02cc02ac028c026c024c022c020c02ec01cc01ac018c01"
    "74016401540144013401240114010401f400e400d400c400b400a40094008400"
    "7800700068006000580050004800400038003000280020001800100008000000"
)

_ALAW_LIN16_HEX = (
    "80ea80eb80e880e980ee80ef80ec80ed80e280e380e080e180e680e780e480e5"
    "40f5c0f540f4c0f440f7c0f740f6c0f640f1c0f140f0c0f040f3c0f340f2c0f2"
    "00aa00ae00a200a600ba00be00b200b6008a008e00820086009a009e00920096"
    "00d500d700d100d300dd00df00d900db00c500c700c100c300cd00cf00c900cb"
    "a8feb8fe88fe98fee8fef8fec8fed8fe28fe38fe08fe18fe68fe78fe48fe58fe"
    "a8ffb8ff88ff98ffe8fff8ffc8ffd8ff28ff38ff08ff18ff68ff78ff48ff58ff"
    "a0fae0fa20fa60faa0fbe0fb20fb60fba0f8e0f820f860f8a0f9e0f920f960f9"
    "50fd70fd10fd30fdd0fdf0fd90fdb0fd50fc70fc10fc30fcd0fcf0fc90fcb0fc"
    "80158014801780168011801080138012801d801c801f801e80198018801b801a"
    "c00a400ac00b400bc0084008c0094009c00e400ec00f400fc00c400cc00d400d"
    "00560052005e005a00460042004e004a00760072007e007a00660062006e006a"
    "002b0029002f002d0023002100270025003b0039003f003d0033003100370035"
    "58014801780168011801080138012801d801c801f801e80198018801b801a801"
    "58004800780068001800080038002800d800c800f800e80098008800b800a800"
    "60052005e005a00560042004e004a00460072007e007a00760062006e006a006"
    "b0029002f002d0023002100270025002b0039003f003d0033003100370035003"
)


def test_g711_expansion_matches_vendored_itu_tables():
    """µ-law/A-law byte→int16 expansion pinned against vendored
    audioop-derived tables — runs on every interpreter, including
    3.13+ where stdlib audioop no longer exists."""
    every = np.arange(256, dtype=np.uint8)
    want_u = np.frombuffer(bytes.fromhex(_ULAW_LIN16_HEX), dtype="<i2")
    assert np.array_equal(MM._ulaw_to_lin16(every), want_u)
    want_a = np.frombuffer(bytes.fromhex(_ALAW_LIN16_HEX), dtype="<i2")
    assert np.array_equal(MM._alaw_to_lin16(every), want_a)


def test_g711_expansion_matches_audioop():
    """µ-law/A-law byte→int16 expansion checked against the stdlib
    audioop implementation (an INDEPENDENT reference — no shared code),
    over every possible input byte. Skips on 3.13+ (audioop removed);
    the vendored-table test above carries the pin there."""
    audioop = pytest.importorskip("audioop")
    every = bytes(range(256))
    want_u = np.frombuffer(audioop.ulaw2lin(every, 2), dtype="<i2")
    got_u = MM._ulaw_to_lin16(np.frombuffer(every, np.uint8))
    assert np.array_equal(got_u, want_u)
    want_a = np.frombuffer(audioop.alaw2lin(every, 2), dtype="<i2")
    got_a = MM._alaw_to_lin16(np.frombuffer(every, np.uint8))
    assert np.array_equal(got_a, want_a)


def test_g711_wav_decode_roundtrip():
    audioop = pytest.importorskip("audioop")
    lin = np.array([0, 1000, -1000, 32000, -32000], dtype=np.int16)
    for law, code_fn, dec_fn in (
        ("ulaw", audioop.lin2ulaw, audioop.ulaw2lin),
        ("alaw", audioop.lin2alaw, audioop.alaw2lin),
    ):
        enc = code_fn(lin.tobytes(), 2)
        raw = MM.encode_wav_g711(enc, 8000, channels=1, law=law)
        rate, frames = MM.try_decode_wav(raw)
        assert rate == 8000 and frames.shape == (5, 1)
        want = np.frombuffer(dec_fn(enc, 2), dtype="<i2")
        assert np.array_equal(frames[:, 0], want)
    # malformed: G.711 with 16-bit sample size is a reject
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 2) + b"\x00\x01")
    assert MM.try_decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body) is None
    # unknown format code (3 = IEEE float) still rejected
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    assert MM.try_decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body) is None


def test_g711_wav_through_audio_stats(spark):
    """End-to-end: a µ-law payload flows through the audio_stats kernel
    as real decoded samples."""
    audioop = pytest.importorskip("audioop")
    lin = np.full(100, 8000, dtype=np.int16)
    enc = audioop.lin2ulaw(lin.tobytes(), 2)
    raw = MM.encode_wav_g711(enc, 8000, law="ulaw")
    media = spark.createDataFrame([(1, bytearray(raw))], MM.RASTER_SCHEMA)
    (r,) = MM.audio_stats(media).collect()
    assert r.decodable and r.sample_rate == 8000 and r.n_frames == 100
    # µ-law is lossy: the decoded constant is the nearest segment value
    want = np.frombuffer(audioop.ulaw2lin(enc, 2), dtype="<i2")
    assert r.peak == int(np.abs(want).max())


# --- Y4M (YUV4MPEG2 C420) codec --------------------------------------------


def test_y4m_round_trip():
    frames = [
        np.arange(4 * 6, dtype=np.uint8).reshape(4, 6),
        np.full((4, 6), 200, dtype=np.uint8),
    ]
    w, h, num, den, got = MM.try_decode_y4m(MM.encode_y4m(frames, fps=(30, 1)))
    assert (w, h, num, den) == (6, 4, 30, 1)
    assert len(got) == 2
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[1], frames[1])


def test_decode_hand_constructed_y4m():
    """2x2, 1 frame, built byte by byte: luma plane [1,2,3,4], one U and
    one V byte (C420 at 2x2 -> 1x1 chroma planes)."""
    raw = (b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\n"
           b"FRAME\n" + bytes([1, 2, 3, 4]) + b"\x80\x80")
    w, h, num, den, frames = MM.try_decode_y4m(raw)
    assert (w, h, num, den) == (2, 2, 25, 1)
    assert frames[0].tolist() == [[1, 2], [3, 4]]


def test_y4m_decode_rejects_malformed():
    good = MM.encode_y4m([np.zeros((2, 2), dtype=np.uint8)])
    assert MM.try_decode_y4m(good) is not None
    assert MM.try_decode_y4m(good[:-1]) is None  # truncated frame
    assert MM.try_decode_y4m(b"YUV4MPEG2 W2 H2\n") is None  # no fps/frames
    assert MM.try_decode_y4m(b"YUV4MPEG2 is a format") is None
    # odd dims are not C420-legal
    assert MM.try_decode_y4m(b"YUV4MPEG2 W3 H2 F25:1\nFRAME\n" + b"\0" * 9) is None
    # 4:2:2 colorspace refused
    assert MM.try_decode_y4m(
        b"YUV4MPEG2 W2 H2 F25:1 C422\nFRAME\n" + b"\0" * 8
    ) is None
    # cross-codec confusion
    assert MM.try_decode_wav(good) is None
    assert MM.try_decode_image(good) is None


def test_video_frame_stats_on_synthesized_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    rows = MM.video_frame_stats(MM.synthesize_y4m_media(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    assert len(by_doc) == 20
    for did, frames in by_doc.items():
        assert len(frames) == 3 + did % 4
        for r in frames:
            assert r.ts_ms == r.frame_idx * 40
            assert r.mean_y == float((did * 31 + r.frame_idx * 7) % 256)


# --- fuzz: decoders must never raise ---------------------------------------
# At 100 TB a malformed payload must become a None/null row, never an
# executor-killing exception; hypothesis hammers the parsers with raw
# bytes and with corrupted prefixes of VALID payloads (the nastier case:
# plausible headers, broken bodies).

from hypothesis import given, settings
from hypothesis import strategies as st

_VALID = [
    MM.encode_ppm(np.zeros((2, 3, 3), dtype=np.uint8)),
    MM.encode_bmp24(np.zeros((3, 2, 3), dtype=np.uint8)),
    MM.encode_png(np.zeros((2, 2, 3), dtype=np.uint8), filter_type=4),
    JP.encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8)),
    GF.encode_gif(
        np.zeros((2, 3), dtype=np.uint8), np.zeros((2, 3), dtype=np.uint8)
    ),
    MM.encode_wav_pcm16(np.array([1, -1, 2], dtype=np.int16), 8000),
    MM.encode_y4m([np.zeros((2, 4), dtype=np.uint8)]),
]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_decoders_never_raise_on_raw_bytes(data):
    MM.try_decode_image(data)
    MM.try_decode_wav(data)
    MM.try_decode_y4m(data)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(_VALID),
    st.integers(min_value=0, max_value=200),
    st.binary(max_size=32),
)
def test_decoders_never_raise_on_corrupted_valid(payload, cut, tail):
    data = payload[: cut % (len(payload) + 1)] + tail
    MM.try_decode_image(data)
    MM.try_decode_wav(data)
    MM.try_decode_y4m(data)


def test_bmp_rejects_trailing_garbage_and_aliased_offset():
    good = MM.encode_bmp24(_rand_pixels(2, 2, seed=9))
    assert MM.try_decode_image(good) is not None
    # exact-length contract: appended junk is a reject
    assert MM.try_decode_image(good + b"junk") is None
    # pixel_offset pointing into the headers is a reject
    bad = bytearray(good)
    struct.pack_into("<I", bad, 10, 0)
    assert MM.try_decode_image(bytes(bad)) is None
