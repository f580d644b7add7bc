"""Multimodal column plumbing (BASELINE.json north-star).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas functions over ``mapInPandas`` — the only sane shape at
100 TB (per-batch Python, columnar transfer, no per-row pickling).

Codec libraries (PIL/ffmpeg — JPEG, H.264, MP3) are NOT in this
container, so that decode branch is import-gated and ``decode_stub=True``
computes deterministic fake features (byte length, md5-based checksum,
fake dims). Five raster formats, however, are decoded for real with
pure-stdlib/numpy codecs — PPM (P6), 24-bit uncompressed BMP, 8-bit
PNG (zlib IDAT inflate + per-row unfilter), baseline JPEG
(`operators/jpeg.py`: Huffman + dequant + IDCT) and single-image GIF
(`operators/gif.py`: real LZW) — so the feature/resize kernels run on
actual pixel data in-sandbox:
``try_decode_image`` strictly validates headers + payload length and the
kernels branch to real dimensions/pixels whenever a payload decodes,
falling back to the stub otherwise. Everything Spark-side — schema,
batching, partitioning, UDF signature — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat_width", T.IntegerType()),
        T.StructField("feat_height", T.IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# Pure-stdlib raster codec: PPM (P6) and uncompressed 24-bit BMP.
#
# Strictness is the contract: a payload only takes the real-decode branch
# when the header parses AND the declared dimensions exactly account for the
# payload length, so arbitrary text/binary blobs (e.g. the documents-table
# adapter used by the oracled stub queries) can never be misread as images.
# ---------------------------------------------------------------------------


_PD_DTYPES = {
    "bigint": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "boolean": "bool",
    "string": "object",
    "binary": "object",
}


def typed_pdf(rows: list, schema) -> pd.DataFrame:
    """Schema-dtyped pandas frame for mapInPandas outputs. An EMPTY
    `pd.DataFrame(rows, columns=...)` infers all-NA object columns,
    which pyspark's serializer concatenates with a pandas
    FutureWarning (and a dtype change under pandas 3 that would break
    the Arrow conversion). Building empty batches with the schema's
    dtypes keeps every batch's dtype identical, full or empty."""
    if isinstance(schema, str):
        # flat "name type, name type" DDL only — parsed by hand because
        # StructType.fromDDL needs a live SparkContext, which executor
        # Python workers (where this runs) do not have.  Comma-bearing
        # types (decimal(10,2), array<...>, map<k,v>, struct<...>) would
        # split wrong and die with an opaque unpack ValueError inside an
        # executor — reject them up front with the contract instead.
        if "(" in schema or "<" in schema:
            raise ValueError(
                "typed_pdf supports flat name-type DDL only (no "
                "decimal(p,s)/array/map/struct) — pass a StructType for "
                f"nested or parameterized types; got: {schema!r}"
            )
        parts = [p.strip() for p in schema.split(",")]
        bad = [p for p in parts if len(p.split(None, 1)) != 2]
        if bad:
            raise ValueError(
                f"typed_pdf: malformed DDL entries {bad!r} in {schema!r}"
            )
        fields = [tuple(part.split(None, 1)) for part in parts]
    else:
        fields = [
            (f.name, f.dataType.simpleString()) for f in schema.fields
        ]
    names = [n for n, _ in fields]
    if rows:
        return pd.DataFrame(rows, columns=names)
    return pd.DataFrame(
        {
            n: pd.Series(dtype=_PD_DTYPES.get(t, "object"))
            for n, t in fields
        }
    )


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6, maxval 255)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("PPM P6 requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR byte order, 4-byte row padding)."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("BMP24 requires 3 channels")
    stride = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    bgr = pixels[..., ::-1].astype(np.uint8)  # RGB -> BGR
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(rows)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + info + bytes(rows)


def _decode_ppm(data: bytes) -> np.ndarray | None:
    if not data.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments not supported — strictness over completeness), then ONE
    # whitespace byte, then exactly w*h*3 payload bytes.
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < min(len(data), 64):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(data) and data[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        tokens.append(int(data[start:pos]))
    if len(tokens) < 3 or not data[pos : pos + 1].isspace():
        return None
    w, h, maxval = tokens
    pos += 1
    if maxval != 255 or w <= 0 or h <= 0 or len(data) - pos != w * h * 3:
        return None
    return np.frombuffer(data, dtype=np.uint8, offset=pos).reshape(h, w, 3)


def _decode_bmp24(data: bytes) -> np.ndarray | None:
    if len(data) < 54 or data[:2] != b"BM":
        return None
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    info_size = struct.unpack_from("<I", data, 14)[0]
    if info_size < 40 or pixel_offset < 14 + info_size:
        return None  # pixels may not alias the headers
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    # exact-length contract, as the PPM branch: declared dimensions must
    # account for the whole payload — trailing garbage is a reject, not
    # silently-dropped bytes
    if len(data) != pixel_offset + stride * h:
        return None
    rows = np.frombuffer(
        data, dtype=np.uint8, offset=pixel_offset, count=stride * h
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1]  # BGR -> RGB


# --- PNG (stdlib-zlib): the one *compressed* wire format decodable
# without PIL. Supports the formats a synthetic/most-common corpus needs:
# 8-bit depth, color types 0 (gray), 2 (RGB), 3 (indexed/PLTE), 6
# (RGBA), no interlace. Chunk CRCs are verified and IDAT must inflate to exactly
# h*(1+stride) bytes — the same strictness contract as the PPM/BMP
# branches. Filters 0-4 (None/Sub/Up/Average/Paeth) are both encoded
# (fixture side) and unfiltered (decode side), so round-trip tests
# exercise every predictor.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import zlib

    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(
        ">I", crc
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG,
    applying ``filter_type`` (0-4) to every scanline. The non-zero
    filters exist so decode tests exercise each unfilter predictor."""
    import zlib

    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_png requires 3 channels")
    if filter_type not in range(5):
        raise ValueError("PNG filter type must be 0-4")
    px = pixels.astype(np.int32)
    bpp = 3
    zero_row = np.zeros((w, bpp), np.int32)
    lines = bytearray()
    for y in range(h):
        raw = px[y]
        prior = px[y - 1] if y else zero_row
        left = np.vstack([np.zeros((1, bpp), np.int32), raw[:-1]])
        ul = np.vstack([np.zeros((1, bpp), np.int32), prior[:-1]])
        if filter_type == 0:
            filt = raw
        elif filter_type == 1:  # Sub
            filt = raw - left
        elif filter_type == 2:  # Up
            filt = raw - prior
        elif filter_type == 3:  # Average
            filt = raw - (left + prior) // 2
        else:  # Paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = raw - pred
        lines.append(filter_type)
        lines += (filt & 255).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray | None:
    """Reverse per-scanline filtering (types 0-4) on inflated IDAT bytes.
    Returns (H, W, ch) uint8, or None on an unknown filter byte."""
    stride = w * ch
    out = np.zeros((h, stride), np.int32)
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up — fully vectorized
            cur = (line + prior) & 255
        elif ft == 1:  # Sub — per-channel prefix sum; mod distributes
            # over addition, so cumsum-then-mask equals the sequential
            # (filt + left) & 255 recurrence, fully vectorized
            cur = (
                np.cumsum(line.reshape(w, ch), axis=0, dtype=np.int64) & 255
            ).reshape(stride)
        elif ft == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + (left + prior[x]) // 2) & 255
        elif ft == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 255
        else:
            return None
        out[y] = cur
        prior = cur
    return out.astype(np.uint8).reshape(h, w, ch)


def _decode_png(data: bytes) -> np.ndarray | None:
    import zlib

    if not data.startswith(_PNG_SIG):
        return None
    pos, chunks = len(_PNG_SIG), []
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):  # payload or CRC truncated
            return None
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            return None
        chunks.append((ctype, payload))
        pos += 12 + length
        if ctype == b"IEND":
            break
    # exact-consumption contract: IEND must be the last chunk AND the last
    # bytes of the payload — trailing garbage is a reject
    if pos != len(data) or not chunks or chunks[-1][0] != b"IEND":
        return None
    if chunks[0][0] != b"IHDR" or len(chunks[0][1]) != 13:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
    if (depth != 8 or channels is None or comp != 0 or filt != 0
            or interlace != 0 or w <= 0 or h <= 0 or w * h > 1 << 26):
        return None
    palette = None
    if color == 3:  # indexed: exactly one PLTE, before IDAT, len % 3 == 0
        plte_idx = [i for i, (t, _) in enumerate(chunks) if t == b"PLTE"]
        if len(plte_idx) != 1:
            return None
        plte = chunks[plte_idx[0]][1]
        if len(plte) == 0 or len(plte) % 3 != 0 or len(plte) > 768:
            return None
        palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    # IDAT chunks must be consecutive (PNG spec); concatenate then inflate
    idat_idx = [i for i, (t, _) in enumerate(chunks) if t == b"IDAT"]
    if not idat_idx or idat_idx != list(
        range(idat_idx[0], idat_idx[0] + len(idat_idx))
    ):
        return None
    if palette is not None and plte_idx[0] > idat_idx[0]:
        return None  # PLTE must precede IDAT (PNG spec)
    # Bounded inflate: a crafted IDAT can expand ~1000:1, so cap the
    # decompression at the declared-dimensions size BEFORE allocating —
    # the same "payload must match the header" contract as PPM/BMP,
    # enforced without ever materializing a decompression bomb.
    expected = h * (1 + w * channels)
    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(
            b"".join(chunks[i][1] for i in idat_idx), expected + 1
        )
    except zlib.error:
        return None
    if (
        len(raw) != expected
        or dec.unconsumed_tail  # more output was pending past the cap
        or dec.decompress(b"", 1)  # buffered output beyond expected
        or not dec.eof  # truncated stream that happened to fit
    ):
        return None
    img = _png_unfilter(raw, h, w, channels)
    if img is None:
        return None
    if color == 0:  # gray -> replicate to RGB
        return np.repeat(img, 3, axis=2)
    if color == 3:  # indexed -> palette lookup; OOB index is a reject
        idx = img[..., 0]
        if int(idx.max()) >= len(palette):
            return None
        return palette[idx]
    if color == 6:  # RGBA -> drop alpha
        return np.ascontiguousarray(img[..., :3])
    return img


def try_decode_image(data: bytes) -> np.ndarray | None:
    """Decode PPM P6 / 24-bit BMP / 8-bit PNG (gray, RGB, indexed,
    RGBA) / baseline JPEG / single-image GIF payloads to (H, W, 3)
    uint8 RGB, or ``None`` for anything else (including malformed
    headers, chunk-CRC mismatches, and payloads whose length
    contradicts the declared dimensions)."""
    if data is None:
        return None
    data = bytes(data)
    if data[:2] == b"P6":
        return _decode_ppm(data)
    if data[:8] == _PNG_SIG:
        return _decode_png(data)
    if data[:2] == b"\xff\xd8":
        from series_tiempo_ar_scraping_spark.operators.jpeg import (
            try_decode_jpeg,
        )

        return try_decode_jpeg(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from series_tiempo_ar_scraping_spark.operators.gif import (
            try_decode_gif,
        )

        return try_decode_gif(data)
    return _decode_bmp24(data)


def nearest_resize(pixels: np.ndarray, max_dim: int) -> np.ndarray:
    """Nearest-neighbor downscale capping the longer edge at ``max_dim``
    (no-op when already within the cap) — index-gather only, no deps."""
    h, w = pixels.shape[:2]
    scale = min(1.0, max_dim / max(w, h))
    if scale >= 1.0:
        return pixels
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return pixels[ys][:, xs]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/bench: wrap the documents table's text as binary
    payloads with synthesized kinds — exercising the exact schema a real
    media table would have."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract over Arrow batches.

    Real decoding needs codec libs (gated); the stub path computes
    deterministic features so the distributed plumbing is testable.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real media decode requires codec libraries not in "
                        "this container; run with decode_stub=True"
                    ) from exc
            def dims(b: bytes) -> tuple[int, int]:
                img = try_decode_image(b)
                if img is not None:  # real decode (PPM/BMP stdlib codec)
                    return img.shape[1], img.shape[0]
                d = hashlib.md5(b).hexdigest()  # checksum-derived stand-in
                return 1 + int(d[:4], 16) % 4096, 1 + int(d[4:8], 16) % 4096
            wh = pdf["content"].map(dims)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "feat_width": wh.map(lambda t: t[0]).astype("int32"),
                    "feat_height": wh.map(lambda t: t[1]).astype("int32"),
                }
            )
            yield out

    return media.select("media_id", "kind", "content").mapInPandas(
        run, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(media: DataFrame, max_dim: int = 512,
                 decode_stub: bool = True) -> DataFrame:
    """Resize kernel: cap the longer edge at ``max_dim`` preserving aspect.

    PPM/BMP payloads take the real path — decoded by the stdlib codec,
    nearest-neighbor resampled on actual pixels, re-encoded as PPM. For
    anything else the stub path applies: dimensions come from the
    deterministic fake decode (checksum-derived, same values
    ``extract_features`` reports) and are rescaled arithmetically with
    content passing through untouched; the compressed-codec (PIL) branch
    is import-gated. The Spark shape — mapInPandas projection, binary
    in/out, no shuffle — is identical on every branch.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                try:
                    import PIL  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real resize requires codec libraries not in this "
                        "container; run with decode_stub=True"
                    ) from exc
            def one(b: bytes) -> tuple[bytes, int, int]:
                img = try_decode_image(b)
                if img is not None:  # real pixels: resample + re-encode
                    small = nearest_resize(img, max_dim)
                    return (
                        encode_ppm(small),
                        small.shape[1],
                        small.shape[0],
                    )
                d = hashlib.md5(b).hexdigest()
                w = 1 + int(d[:4], 16) % 4096
                h = 1 + int(d[4:8], 16) % 4096
                scale = min(1.0, max_dim / max(w, h))
                return b, max(1, int(w * scale)), max(1, int(h * scale))

            res = pdf["content"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": res.map(lambda t: t[0]),
                    "width": res.map(lambda t: t[1]).astype("int32"),
                    "height": res.map(lambda t: t[2]).astype("int32"),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        run, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  decode_stub: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame of each video —
    a fan-out (flatMap) kernel, the batch shape that matters: a 2-hour
    video row becomes ~7200 frame rows inside one Arrow batch stream, no
    driver involvement, no shuffle until someone aggregates.

    Stub: duration is ``meta.duration_ms`` when present else derived from
    byte length; frame checksums are md5(content ∥ frame_idx). The REAL
    per-frame path for uncompressed video is ``video_frame_stats`` (Y4M
    stdlib codec); compressed containers stay import-gated on ffmpeg.
    """
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                try:
                    import av  # noqa: F401
                except ImportError as exc:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg bindings not "
                        "in this container; run with decode_stub=True"
                    ) from exc
            import numpy as np

            dur = pdf["duration_ms"].to_numpy(dtype="float64", na_value=np.nan)
            lens = pdf["content"].map(len).to_numpy(dtype="int64")
            dur = np.where(np.isnan(dur), 1 + (lens % 10) * every_ms, dur)
            n_frames = ((dur - 1) // every_ms).astype("int64") + 1
            bases = pdf["content"].map(
                lambda b: hashlib.md5(b).hexdigest()
            ).to_numpy()
            # vectorized fan-out: repeat row attrs, tile frame indices
            media_ids = np.repeat(pdf["media_id"].to_numpy(), n_frames)
            rep_bases = np.repeat(bases, n_frames)
            idx = np.concatenate(
                [np.arange(n) for n in n_frames]
            ) if len(n_frames) else np.array([], dtype="int64")
            checks = [
                hashlib.md5(f"{b}:{i}".encode()).hexdigest()
                for b, i in zip(rep_bases, idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_idx": idx.astype("int32"),
                    "ts_ms": (idx * every_ms).astype("int32"),
                    "frame_checksum": checks,
                }
            )

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "content", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.mapInPandas(run, FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-stdlib audio codec: WAV (RIFF, PCM16). Same contract as the raster
# codec: strict header + length validation, so only genuine WAV payloads
# take the real-decode branch.
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode an (n_frames,) or (n_frames, channels) int16 array as a
    PCM16 RIFF/WAVE file."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _ulaw_to_lin16(u: np.ndarray) -> np.ndarray:
    """G.711 µ-law bytes → int16 (ITU decode expansion, vectorized)."""
    u = (~u.astype(np.int64)) & 0xFF
    sign = u & 0x80
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    mag = t - 0x84
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def _alaw_to_lin16(a: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → int16 (even-bit inversion + segment expand)."""
    a = a.astype(np.int64) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 7
    man = a & 0x0F
    mag = np.where(
        exp == 0,
        (man << 4) + 8,
        ((man << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    # A-law sign bit SET means positive (opposite of µ-law)
    return np.where(sign != 0, mag, -mag).astype(np.int16)


def encode_wav_g711(encoded: bytes, sample_rate: int, channels: int = 1,
                    law: str = "ulaw") -> bytes:
    """Wrap raw G.711-encoded bytes (one byte per sample) in a RIFF/WAVE
    container — format code 7 (µ-law) or 6 (A-law), 8 bits/sample."""
    code = 7 if law == "ulaw" else 6
    block_align = channels
    fmt = struct.pack(
        "<HHIIHH", code, channels, sample_rate,
        sample_rate * block_align, block_align, 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(encoded)) + encoded
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def try_decode_wav(data: bytes) -> tuple[int, np.ndarray] | None:
    """Decode a RIFF/WAVE payload to (sample_rate, int16 array of shape
    (n_frames, channels)). Accepts PCM16 (format 1, 16-bit) and the two
    G.711 telephony codings — µ-law (format 7) and A-law (format 6),
    8-bit, expanded to int16 through the ITU segment tables. ``None``
    for anything else (wrong magic, other format codes, truncated data
    chunk, misaligned frame size)."""
    if data is None:
        return None
    data = bytes(data)
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            return None
        if cid == b"fmt " and size >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        return None
    audio_format, channels, sample_rate, _, block_align, bits = fmt
    if channels < 1 or sample_rate <= 0:
        return None
    if audio_format == 1:
        sample_bytes = 2
        if bits != 16 or block_align != channels * sample_bytes:
            return None
    elif audio_format in (6, 7):  # G.711 A-law / µ-law
        sample_bytes = 1
        if bits != 8 or block_align != channels * sample_bytes:
            return None
    else:
        return None
    # Zero-frame payloads are rejected like any other undecodable input:
    # downstream stats (peak = max over samples, rms = sqrt(sum/size)) are
    # undefined on an empty sample set, and the operator contract is
    # "malformed/degenerate payload becomes a null row, never an exception".
    if len(pcm) == 0 or len(pcm) % (channels * sample_bytes) != 0:
        return None
    if audio_format == 1:
        frames = np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    else:
        raw = np.frombuffer(pcm, dtype=np.uint8)
        lin = _ulaw_to_lin16(raw) if audio_format == 7 else _alaw_to_lin16(raw)
        frames = lin.reshape(-1, channels)
    return sample_rate, frames


# ---------------------------------------------------------------------------
# Pure-stdlib video codec: YUV4MPEG2 (.y4m), C420 — the standard
# uncompressed raw-video interchange container (what ffmpeg/x264 pipe to
# each other). Strict header + per-frame length validation, as with the
# raster/WAV codecs.
# ---------------------------------------------------------------------------


def encode_y4m(y_frames: list[np.ndarray], fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode a list of (H, W) uint8 luma planes as YUV4MPEG2 C420 with
    neutral chroma (U = V = 128). W and H must be even (420 subsampling)."""
    if not y_frames:
        raise ValueError("need at least one frame")
    h, w = y_frames[0].shape
    if w % 2 or h % 2:
        raise ValueError("C420 requires even dimensions")
    uv = b"\x80" * ((w // 2) * (h // 2))
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, *fps)]
    for f in y_frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share dimensions")
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def try_decode_y4m(
    data: bytes,
) -> tuple[int, int, int, int, list[np.ndarray]] | None:
    """Decode a YUV4MPEG2 C420 payload to (width, height, fps_num,
    fps_den, [luma planes]); ``None`` unless the header parses, the
    colorspace is 4:2:0, and every frame's payload length is exact."""
    if data is None:
        return None
    data = bytes(data)
    if not data.startswith(b"YUV4MPEG2 "):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = num = den = None
    c420 = True
    for tok in data[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        try:
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, den = (int(x) for x in val.split(b":"))
            elif tag == b"C":
                c420 = val.startswith(b"420")
        except ValueError:
            return None
    # strictly positive: a negative W/H would walk `pos` BACKWARD below
    # (frame_len < 0 -> infinite loop), and a negative num/den would
    # defeat video_frame_stats' int32 ts_ms guard
    if w is None or h is None or num is None or den is None:
        return None
    if w <= 0 or h <= 0 or num <= 0 or den <= 0:
        return None
    if w % 2 or h % 2 or not c420 or w * h > 1 << 26:
        return None  # same decompression-bomb bound as the PNG/GIF codecs
    frame_len = w * h + 2 * ((w // 2) * (h // 2))
    pos, frames = nl + 1, []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            return None
        start = fnl + 1
        if start + frame_len > len(data):
            return None
        frames.append(
            np.frombuffer(data, np.uint8, count=w * h, offset=start).reshape(
                h, w
            )
        )
        pos = start + frame_len
    if not frames:
        return None
    return w, h, num, den, frames


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("mean_y", T.DoubleType()),
    ]
)


def video_frame_stats(media: DataFrame) -> DataFrame:
    """Real per-frame video statistics via the stdlib Y4M codec: one row
    per decoded frame with its timestamp (frame_idx · 1000 · den / num)
    and mean luma (float64 accumulate → one division). The fan-out shape
    of ``sample_frames`` running on ACTUAL frames. Non-Y4M payloads are
    dropped (profiling selects its modality upstream). Map-only Arrow
    batches; output rows ∝ total frames, no shuffle."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                decoded = try_decode_y4m(content)
                if decoded is None:
                    continue
                _, _, num, den, frames = decoded
                # same int32 guard as gif_anim_frame_stats: a pathological
                # framerate (den >> num) can push ts_ms past 2^31-1
                if ((len(frames) - 1) * 1000 * den) // num > 2**31 - 1:
                    continue
                for i, y in enumerate(frames):
                    rows.append(
                        (
                            mid,
                            i,
                            (i * 1000 * den) // num,
                            float(y.astype(np.float64).sum() / y.size),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "mean_y"]
            ).astype({"frame_idx": "int32", "ts_ms": "int32"})

    return media.select("media_id", "content").mapInPandas(
        run, VIDEO_FRAMES_SCHEMA
    )


def gif_anim_frame_stats(media: DataFrame) -> DataFrame:
    """Real per-frame animated-GIF statistics via the stdlib LZW codec:
    one row per decoded frame with its start timestamp (cumulative prior
    delays, centiseconds -> ms) and mean over all RGB bytes. The
    animated-GIF twin of ``video_frame_stats`` (Y4M). Non-GIF payloads
    are dropped. Map-only Arrow batches; rows ∝ frames, no shuffle."""
    from series_tiempo_ar_scraping_spark.operators.gif import (
        try_decode_gif_frames,
    )
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                decoded = try_decode_gif_frames(bytes(content))
                if decoded is None:
                    continue
                _, _, delays, frames = decoded
                # cumulative delay (cs) can exceed int32 ms on adversarial
                # many-frame payloads; reject rather than wrap the schema's
                # int32 ts_ms (max valid cumulative: 2^31-1 ms)
                if sum(delays[:-1]) * 10 > 2**31 - 1:
                    continue
                ts = 0
                for i, (d, rgb) in enumerate(zip(delays, frames)):
                    rows.append(
                        (
                            mid,
                            i,
                            ts * 10,
                            float(rgb.astype(np.float64).sum() / rgb.size),
                        )
                    )
                    ts += d
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "mean_y"]
            ).astype({"frame_idx": "int32", "ts_ms": "int32"})

    return media.select("media_id", "content").mapInPandas(
        run, VIDEO_FRAMES_SCHEMA
    )


def _gif_palette(did: int) -> np.ndarray:
    """The 8-entry per-document palette family shared by BOTH GIF
    synthesizers (and restated in closed form in their oracles):
    ``palette[i] = ((37i+did)%256, (59i+2·did)%256, (83i+3·did)%256)``.
    One definition keeps the two Spark sides and the two oracle SQL
    restatements in lockstep."""
    i = np.arange(8, dtype=np.int64)
    return np.stack(
        [
            (37 * i + did) % 256,
            (59 * i + 2 * did) % 256,
            (83 * i + 3 * did) % 256,
        ],
        axis=1,
    ).astype(np.uint8)


def synthesize_gif_anim_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: a deterministic animated GIF per document —
    ``2 + doc_id%3`` full-screen solid frames (frame f = palette index
    ``(doc_id+f) % 8``, same palette family as ``synthesize_gif_media``),
    constant delay ``4 + doc_id%6`` cs — so decoded frame count,
    timestamps and per-frame means are oracle-checkable in closed form.
    Map-only Arrow batches."""
    from series_tiempo_ar_scraping_spark.operators.gif import (
        encode_gif_frames,
    )
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 2 + did % 5, 1 + did % 3
                pal = _gif_palette(did)
                frames = [
                    np.full((h, w), (did + f) % 8, dtype=np.uint8)
                    for f in range(2 + did % 3)
                ]
                payloads.append(
                    encode_gif_frames(frames, pal, delay_cs=4 + did % 6)
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def synthesize_y4m_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: derive a deterministic solid-luma Y4M video per
    document (even dims, 25 fps, per-frame luma a pure function of
    (doc_id, frame_idx)), so decoded frame count, timestamps and mean
    luma are oracle-checkable in closed form."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + 2 * (did % 3), 2 + 2 * (did % 2)
                n = 3 + did % 4
                frames = [
                    np.full((h, w), (did * 31 + i * 7) % 256, dtype=np.uint8)
                    for i in range(n)
                ]
                payloads.append(encode_y4m(frames, fps=(25, 1)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("decodable", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Real-sample audio statistics via the stdlib WAV codec: sample
    rate, frame count, peak amplitude and RMS (float64 accumulate over
    exact int squares → one sqrt, deterministic across engines and
    partitionings). Non-WAV payloads yield nulls with ``decodable =
    false``. Map-only over Arrow batches — the audio profiling pass of a
    100 TB speech corpus."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                decoded = try_decode_wav(content)
                if decoded is None:
                    rows.append((mid, False, None, None, None, None))
                else:
                    rate, frames = decoded
                    sq = frames.astype(np.float64) ** 2
                    rms = float(np.sqrt(sq.sum() / sq.size))
                    rows.append(
                        (
                            mid, True, rate, frames.shape[0],
                            int(np.abs(frames.astype(np.int64)).max()), rms,
                        )
                    )
            out = pd.DataFrame(
                rows,
                columns=["media_id", "decodable", "sample_rate",
                         "n_frames", "peak", "rms"],
            )
            for c in ("sample_rate", "n_frames", "peak"):
                out[c] = out[c].astype("Int32")
            yield out

    return media.select("media_id", "content").mapInPandas(
        run, AUDIO_STATS_SCHEMA
    )


RASTER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def synthesize_jpeg_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: a deterministic solid-gray baseline JPEG per
    document — luma = ``doc_id % 256``, dims ``8·(1+doc_id%3) ×
    8·(1+doc_id%2)``. A solid block is DC-only under the all-ones quant
    tables, so the full marker/Huffman/IDCT path round-trips the gray
    level EXACTLY and decode results are oracle-checkable in closed
    form. Map-only Arrow batches."""
    from series_tiempo_ar_scraping_spark.operators.jpeg import (
        encode_jpeg_baseline,
    )
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 * (1 + did % 3), 8 * (1 + did % 2)
                px = np.full((h, w), did % 256, np.uint8)
                payloads.append(encode_jpeg_baseline(px))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def synthesize_g711_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: a deterministic constant-byte µ-law WAV per
    document — the encoded byte is ``doc_id % 256`` repeated
    ``80 + doc_id % 50`` times, so the decoded amplitude is the ITU
    expansion of one known byte and peak/RMS are oracle-checkable in
    closed form (constant signal ⇒ RMS = |amplitude| with sqrt of a
    perfect square, exact in float64). Map-only Arrow batches."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 80 + did % 50
                payloads.append(
                    encode_wav_g711(bytes([did % 256]) * n, 8000, law="ulaw")
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: derive a deterministic mono square-wave WAV per
    document — amplitude and frame count are pure functions of ``doc_id``,
    so decoded peak (=A), RMS (=A exactly, every |sample| is A) and frame
    count are oracle-checkable in closed form. Map-only Arrow batches."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                amp = 1 + did % 997
                n = 80 + did % 50
                wave = np.where(np.arange(n) % 2 == 0, amp, -amp).astype(
                    np.int16
                )
                payloads.append(encode_wav_pcm16(wave, 8000))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: a deterministic palette-indexed GIF per
    document — dims ``(1+doc_id%7) × (1+doc_id%5)``, an 8-entry
    per-document palette ``palette[i] = ((37i+doc_id)%256,
    (59i+2·doc_id)%256, (83i+3·doc_id)%256)`` and index raster
    ``idx(y,x) = (doc_id + 2x + 3y) % 8`` — repeated indices give the
    LZW dictionary real matches to compress, and the decode results
    are oracle-checkable in closed form. Map-only Arrow batches."""
    from series_tiempo_ar_scraping_spark.operators.gif import encode_gif
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 1 + did % 7, 1 + did % 5
                pal = _gif_palette(did)
                ys, xs = np.meshgrid(
                    np.arange(h), np.arange(w), indexing="ij"
                )
                idx = ((did + 2 * xs + 3 * ys) % 8).astype(np.uint8)
                payloads.append(encode_gif(idx, pal))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def synthesize_raster_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: derive a deterministic solid-color raster per
    document — BMP for even ids, PPM for odd — with dimensions and color
    that are pure functions of ``doc_id``, so downstream decode results are
    oracle-checkable in closed form (the decode provably inverts the
    encode). Map-only Arrow batches; no shuffle."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 1 + did % 7, 1 + did % 5
                color = (did % 256, (did * 7) % 256, (did * 13) % 256)
                px = np.full((h, w, 3), color, dtype=np.uint8)
                payloads.append(
                    encode_bmp24(px) if did % 2 == 0 else encode_ppm(px)
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def synthesize_png_media(docs: DataFrame) -> DataFrame:
    """Test/bench adapter: derive a deterministic gradient-pattern PNG per
    document. Pixel (y, x, c) = (doc_id + 3x + 5y + 11c) % 256 — a
    non-constant pattern so the scanline filters have real deltas to
    encode — and the filter type cycles with doc_id % 5, so the corpus
    exercises every unfilter predictor (None/Sub/Up/Average/Paeth). The
    decode results are oracle-checkable in closed form. Map-only Arrow
    batches; no shuffle."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 1 + did % 7, 1 + did % 5
                ys, xs, cs = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((did + 3 * xs + 5 * ys + 11 * cs) % 256).astype(
                    np.uint8
                )
                payloads.append(encode_png(px, filter_type=did % 5))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("decodable", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Real-pixel statistics via the stdlib codec: decoded width/height and
    the mean over all RGB channel bytes (float64 accumulate → one division,
    so the value is the correctly-rounded mean — deterministic across
    engines and partitionings). Non-decodable payloads yield nulls with
    ``decodable = false``. Map-only over Arrow batches: no shuffle, linear
    in payload bytes — the profiling pass a 100 TB image corpus runs before
    any training-set filter."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = try_decode_image(content)
                if img is None:
                    rows.append((mid, False, None, None, None))
                else:
                    mean = float(img.astype(np.float64).sum() / img.size)
                    rows.append(
                        (mid, True, img.shape[1], img.shape[0], mean)
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "media_id", "decodable", "width", "height", "mean_luma",
                ],
            )
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            yield out

    return media.select("media_id", "content").mapInPandas(
        run, IMAGE_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Container formats: ZIP archives over binary columns (stdlib zipfile)
# ---------------------------------------------------------------------------

ZIP_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("txt_bytes", T.LongType()),
        T.StructField("meta_bytes", T.LongType()),
        T.StructField("total_uncompressed", T.LongType()),
        T.StructField("txt_md5", T.StringType()),
        T.StructField("meta_text", T.StringType()),
    ]
)

_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)  # fixed member mtime: determinism


def pack_zip(members: list) -> bytes:
    """Deterministic ZIP (stdlib zipfile, DEFLATE, pinned mtime).

    ``members`` is a list of (name, bytes). The pinned ZipInfo
    date_time keeps the archive byte-stable across runs; the archive
    BYTES still depend on the container's zlib, so only round-trip
    content (never compressed size) may appear in oracled outputs.
    """
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zi = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def list_zip_members(data: bytes) -> list:
    """Extract (name, bytes) pairs; [] for anything that is not a valid
    archive (truncated, wrong magic) — corrupt rows must degrade to an
    empty row, never throw inside an executor."""
    import io
    import zipfile

    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            return [(n, zf.read(n)) for n in zf.namelist()]
    except Exception:
        return []


def zip_roundtrip_stats(docs: DataFrame) -> DataFrame:
    """Archive-ingestion plumbing, end to end: pack each document into
    a 2-member ZIP (the payload + a metadata sidecar) in one Arrow
    stage — standing in for how web-archive / scraped corpora actually
    arrive at 100 TB — then EXTRACT members and report content stats
    in a second Arrow stage that sees only the binary column. Stats
    are derivable from the source text, so the whole round trip is
    hash-oracle-able without DuckDB being able to unzip.

    Cites reference parity: the reference downloads and reads packed
    distribution files from disk (reference/download.py,
    scrapers/base.py); this is that ingestion lane re-expressed as a
    distributed binary-column pipeline."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = [
                pack_zip(
                    [
                        ("doc.txt", t.encode("utf-8")),
                        ("meta.txt", f"{i}|{lg}".encode("utf-8")),
                    ]
                )
                for i, t, lg in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"]
                )
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": content}
            )

    packed_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    packed = docs.select("doc_id", "text", "lang").mapInPandas(
        pack, packed_schema
    )

    def extract(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                members = dict(list_zip_members(bytes(blob)))
                txt = members.get("doc.txt", b"")
                meta = members.get("meta.txt", b"")
                rows.append(
                    (
                        mid,
                        len(members),
                        len(txt),
                        len(meta),
                        sum(len(v) for v in members.values()),
                        hashlib.md5(txt).hexdigest(),
                        meta.decode("utf-8", errors="replace"),
                    )
                )
            yield typed_pdf(rows, ZIP_STATS_SCHEMA)

    return packed.mapInPandas(extract, ZIP_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Container formats: WebDataset-style TAR shards (stdlib tarfile)
# ---------------------------------------------------------------------------

TAR_STATS_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_members", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("meta_bytes", T.LongType()),
        T.StructField("tar_bytes", T.LongType()),
        T.StructField("members_fingerprint", T.StringType()),
    ]
)


def pack_tar(members: list) -> bytes:
    """Deterministic uncompressed USTAR archive (stdlib tarfile).

    ``members`` is a list of (name, bytes). Every header field that
    could vary (mtime, uid/gid, uname/gname) is pinned, and the format
    is forced to USTAR (the PAX default adds extended headers), so the
    archive BYTES are a pure function of the members — unlike ZIP,
    whose DEFLATE stream depends on the zlib build. That makes even
    the total byte count oracle-able arithmetically:
    sum(512 + ceil(size/512)*512) + 1024, rounded up to the 10240-byte
    record size."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            ti.uid = 0
            ti.gid = 0
            ti.uname = ""
            ti.gname = ""
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def list_tar_members(data: bytes) -> list:
    """Extract (name, bytes) pairs; [] for anything that is not a valid
    archive — corrupt rows degrade to an empty row, never throw inside
    an executor."""
    import io
    import tarfile

    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
            return [
                (m.name, tf.extractfile(m).read())
                for m in tf.getmembers()
                if m.isfile()
            ]
    except Exception:
        return []


def tar_shard_stats(docs: DataFrame, shard_size: int = 8) -> DataFrame:
    """WebDataset-style sharded TAR round trip: group ``shard_size``
    documents per shard (the grouping a streaming data loader expects),
    pack each shard as ONE tar whose members are `{doc_id}.txt` +
    `{doc_id}.json` per sample, then EXTRACT members from the binary
    column alone and report per-shard stats — sample count, member
    count, payload/meta byte totals, the exact archive size, and an
    md5 fingerprint of the sorted member directory (name:size pairs).

    Scale shape: shard assembly is a JVM ``collect_list`` aggregate
    over the shard key (the shuffle a real shard-writer pays anyway —
    co-locating a sample's members is the POINT of WebDataset) with a
    ``sort_array`` pinning member order by doc_id; packing is then ONE
    ``mapInPandas`` over the assembled samples column (r13: this
    replaces an ``applyInPandas`` whose per-8-row-group Python function
    call + pandas-frame construction dominated the stage — the Arrow
    boundary now crosses once per batch, not once per shard); extract
    is ``mapInPandas`` over the binary column only. Both stages are
    Arrow-batched; stdlib tarfile does the real container I/O
    in-sandbox."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    packed_schema = T.StructType(
        [
            T.StructField("shard_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    shards = (
        docs.select(
            (F.col("doc_id") / F.lit(shard_size))
            .cast("long")
            .alias("shard_id"),
            "doc_id",
            "text",
            "lang",
        )
        .groupBy("shard_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("doc_id", "text", "lang"))
            ).alias("samples")
        )
    )

    def pack_shards(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, blobs = [], []
            for sid, samples in zip(pdf["shard_id"], pdf["samples"]):
                members = []
                for s in samples:
                    i = int(s["doc_id"])
                    members.append(
                        (f"{i:08d}.txt", s["text"].encode("utf-8"))
                    )
                    members.append(
                        (
                            f"{i:08d}.json",
                            f'{{"id":{i},"lang":"{s["lang"]}"}}'.encode(
                                "utf-8"
                            ),
                        )
                    )
                sids.append(int(sid))
                blobs.append(pack_tar(members))
            yield typed_pdf(list(zip(sids, blobs)), packed_schema)

    packed = shards.mapInPandas(pack_shards, packed_schema)

    def extract(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf["shard_id"], pdf["content"]):
                members = list_tar_members(bytes(blob))
                names = sorted(n for n, _ in members)
                sizes = {n: len(d) for n, d in members}
                samples = {n.rsplit(".", 1)[0] for n in names}
                directory = "|".join(
                    f"{n}:{sizes[n]}" for n in names
                )
                rows.append(
                    (
                        sid,
                        len(samples),
                        len(members),
                        sum(
                            sizes[n]
                            for n in names
                            if n.endswith(".txt")
                        ),
                        sum(
                            sizes[n]
                            for n in names
                            if n.endswith(".json")
                        ),
                        len(bytes(blob)),
                        hashlib.md5(
                            directory.encode("utf-8")
                        ).hexdigest(),
                    )
                )
            yield typed_pdf(rows, TAR_STATS_SCHEMA)

    return packed.mapInPandas(extract, TAR_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# MP3 frame-header walking (stdlib byte parsing — no audio libs)
# ---------------------------------------------------------------------------

# MPEG-1 Layer III bitrate table (kbps) indexed 1..14; 0/15 invalid.
MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320
)
MP3_SAMPLERATES = (44100, 48000, 32000)  # index 0..2; 3 reserved
MP3_SAMPLES_PER_FRAME = 1152

MP3_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
        T.StructField("samplerate", T.LongType()),
        T.StructField("duration_micros", T.LongType()),
        T.StructField("sum_bitrate_kbps", T.LongType()),
    ]
)


def mp3_frame_bytes(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    """ONE well-formed MPEG-1 Layer III frame: 4-byte header (sync
    0xFFE, version 1, layer III, no CRC) + zero filler to the exact
    frame length 144000*kbps // samplerate + padding."""
    kbps = MP3_BITRATES[bitrate_idx]
    sr = MP3_SAMPLERATES[sr_idx]
    size = (144000 * kbps) // sr + padding
    hdr = bytes(
        [
            0xFF,
            0xFB,  # sync + MPEG1 + Layer III + no-CRC
            (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1),
            0x00,
        ]
    )
    return hdr + b"\x00" * (size - 4)


def walk_mp3_frames(data: bytes) -> list:
    """Frame-header walk: returns [(bitrate_kbps, samplerate, size)]
    per frame, advancing by each header's computed frame length —
    exactly how duration estimators (ffprobe, mp3 players) size a
    stream without decoding audio. Stops cleanly on garbage."""
    out = []
    pos = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            break
        version = (data[pos + 1] >> 3) & 0x3
        layer = (data[pos + 1] >> 1) & 0x3
        if version != 3 or layer != 1:  # only MPEG-1 Layer III here
            break
        bidx = (data[pos + 2] >> 4) & 0xF
        sidx = (data[pos + 2] >> 2) & 0x3
        pad = (data[pos + 2] >> 1) & 0x1
        if bidx in (0, 15) or sidx == 3:
            break
        kbps = MP3_BITRATES[bidx]
        sr = MP3_SAMPLERATES[sidx]
        size = (144000 * kbps) // sr + pad
        if pos + size > n:
            break
        out.append((kbps, sr, size))
        pos += size
    return out


def mp3_framewalk_stats(docs: DataFrame) -> DataFrame:
    """Plant a deterministic MP3 frame sequence per document (frame
    count/bitrate/padding all doc_id arithmetic, one fixed samplerate
    per doc), then WALK the headers from the binary column alone and
    report stream stats — the duration/bitrate probe a media pipeline
    runs before any decode. Both stages Arrow-batched; the planted
    stream means DuckDB oracles every output arithmetically."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    packed_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                n_frames = 3 + did % 5
                sr_idx = did % 3
                blob = b"".join(
                    mp3_frame_bytes(
                        1 + (did + i) % 14, sr_idx, (did + i) % 2
                    )
                    for i in range(n_frames)
                )
                blobs.append(blob)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": blobs}
            )

    packed = docs.select("doc_id").mapInPandas(pack, packed_schema)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                frames = walk_mp3_frames(bytes(blob))
                sr = frames[0][1] if frames else 0
                n = len(frames)
                rows.append(
                    (
                        mid,
                        n,
                        sum(f[2] for f in frames),
                        sr,
                        (n * MP3_SAMPLES_PER_FRAME * 1_000_000) // sr
                        if sr
                        else 0,
                        sum(f[0] for f in frames),
                    )
                )
            yield typed_pdf(rows, MP3_STATS_SCHEMA)

    return packed.mapInPandas(walk, MP3_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# H.264 Annex-B NAL walking (stdlib byte parsing — no video libs)
# ---------------------------------------------------------------------------

H264_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_nals", T.LongType()),
        T.StructField("n_idr", T.LongType()),
        T.StructField("n_slices", T.LongType()),
        T.StructField("has_parameter_sets", T.IntegerType()),
        T.StructField("total_payload_bytes", T.LongType()),
    ]
)


def h264_nal_bytes(nal_type: int, payload_len: int) -> bytes:
    """One Annex-B NAL unit: 4-byte start code, 1-byte header
    (forbidden_zero=0, nal_ref_idc=3, type), deterministic filler that
    never contains a start code (0xAA bytes)."""
    hdr = bytes([0x60 | (nal_type & 0x1F)])
    return b"\x00\x00\x00\x01" + hdr + b"\xaa" * payload_len


def walk_h264_nals(data: bytes) -> list:
    """Annex-B walk: split on 0x000001 start codes (3- or 4-byte),
    return [(nal_type, payload_len)] — the stream-structure probe
    (keyframe cadence, parameter-set presence) a video pipeline runs
    before handing segments to a real decoder."""
    out = []
    i = 0
    n = len(data)
    starts = []
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for idx, s in enumerate(starts):
        e = n
        if idx + 1 < len(starts):
            e = starts[idx + 1] - 3
            # a 4-byte start code owns one leading zero byte
            if e > 0 and data[e - 1] == 0:
                e -= 1
        if s >= e:
            continue
        out.append((data[s] & 0x1F, e - s - 1))
    return out


def h264_nal_stats(docs: DataFrame) -> DataFrame:
    """Plant a deterministic Annex-B NAL sequence per document
    (SPS, PPS, one IDR, then doc_id%4+1 non-IDR slices, payload sizes
    doc_id arithmetic), then WALK start codes from the binary column
    alone and report stream structure. Arrow-batched both ways; the
    planted stream means DuckDB oracles every output arithmetically."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    packed_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                nals = [
                    h264_nal_bytes(7, 10 + did % 20),  # SPS
                    h264_nal_bytes(8, 4 + did % 8),  # PPS
                    h264_nal_bytes(5, 100 + did % 50),  # IDR
                ]
                for j in range(1 + did % 4):
                    nals.append(
                        h264_nal_bytes(1, 40 + (did + j) % 30)
                    )
                blobs.append(b"".join(nals))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": blobs}
            )

    packed = docs.select("doc_id").mapInPandas(pack, packed_schema)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                nals = walk_h264_nals(bytes(blob))
                types = [t for t, _ in nals]
                rows.append(
                    (
                        mid,
                        len(nals),
                        sum(1 for t in types if t == 5),
                        sum(1 for t in types if t == 1),
                        int(7 in types and 8 in types),
                        sum(sz for _, sz in nals),
                    )
                )
            yield typed_pdf(rows, H264_STATS_SCHEMA)

    return packed.mapInPandas(walk, H264_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hash (dHash) — near-duplicate image detection
# ---------------------------------------------------------------------------

_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("decodable", T.BooleanType()),
        T.StructField("phash", T.LongType()),
    ]
)


def synthesize_gradient_media(docs: DataFrame, n_patterns: int = 16) -> DataFrame:
    """Test/bench adapter: derive a deterministic 8x8 GRADIENT raster per
    document — BMP for even ids, PPM for odd — whose grayscale value at
    (y, x) is the closed form (pat*17 + x*x*3 + y*29) % 256 with
    pat = doc_id % n_patterns, so documents sharing a pattern are exact
    perceptual duplicates and the dHash below is oracle-checkable in
    closed form. Map-only Arrow batches; no shuffle."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(docs.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                pat = did % n_patterns
                y, x = np.mgrid[0:8, 0:8]
                g = ((pat * 17 + x * x * 3 + y * 29) % 256).astype(np.uint8)
                px = np.stack([g, g, g], axis=2)
                payloads.append(
                    encode_bmp24(px) if did % 2 == 0 else encode_ppm(px)
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": payloads}
            )

    return docs.select("doc_id").mapInPandas(run, RASTER_SCHEMA)


def dhash_media(media: DataFrame) -> DataFrame:
    """56-bit difference hash (dHash; Krawetz 2013 shape): decode, gray =
    channel mean, bit(y, x) = gray[y, x] > gray[y, x+1] over the 8x8
    grid (7 comparisons x 8 rows = 56 bits — deliberately under 63 so
    the BIGINT never touches the sign bit; the classic 9x8/64-bit
    variant would). Inputs wider than 8x8 are first block-averaged to
    8x8 (integer-exact when dimensions divide). Non-decodable payloads
    yield decodable = false. Map-only Arrow batches — the per-image
    fingerprint pass of an image-dedup pipeline; the groupBy that
    clusters equal hashes is the caller's (one shuffle on a 56-bit
    key)."""
    from series_tiempo_ar_scraping_spark.session import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                img = try_decode_image(bytes(content))
                if img is None:
                    rows.append((mid, False, None))
                    continue
                gray = img.astype(np.int64).sum(axis=2) // 3
                h, w = gray.shape
                if (h, w) != (8, 8) and h % 8 == 0 and w % 8 == 0:
                    gray = gray.reshape(8, h // 8, 8, w // 8).mean(
                        axis=(1, 3)
                    )
                elif (h, w) != (8, 8):
                    rows.append((mid, False, None))
                    continue
                phash = 0
                for y in range(8):
                    for x in range(7):
                        if gray[y, x] > gray[y, x + 1]:
                            phash |= 1 << (y * 7 + x)
                rows.append((mid, True, phash))
            yield typed_pdf(rows, _DHASH_SCHEMA)

    return media.mapInPandas(run, _DHASH_SCHEMA)
