"""Stdlib GIF (LZW) codec: baseline GIF87a/89a encode + strict decode.

Completes the real-decode compressed-image family (PNG: zlib DEFLATE,
JPEG: Huffman+DCT, here: LZW) with zero third-party dependencies — LZW
is pure dictionary coding, implementable exactly from the GIF89a
specification. Same contract as the sibling codecs
(`operators/multimodal.py`, `operators/jpeg.py`):

- ``encode_gif`` emits a spec-conformant single-image GIF with a global
  color table and REAL LZW compression (dictionary growth, variable
  code width, 4096-entry reset) — not the clear-code-flood
  "uncompressed GIF" shortcut, so the decoder's dictionary path is
  genuinely exercised.
- ``try_decode_gif`` returns an (H, W, 3) uint8 RGB array or ``None``
  for anything malformed or outside the strict subset (first image
  only, no interlace, color table required, explicit EOI, no trailing
  garbage). It must never raise on arbitrary bytes — payloads arrive
  from a 100 TB corpus inside Arrow batches on executors, and one
  raising row would kill the task (fuzz-pinned in
  tests/test_gif_codec.py).

Scale posture: decoding is per-payload CPU work inside ``mapInPandas``
— embarrassingly parallel, no shuffle; the sequential LZW loop is the
format's nature (every code depends on the previous dictionary state),
so parallelism comes from the corpus dimension, not the pixel one.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12  # GIF LZW hard cap: 4096 dictionary entries
_MAX_PIXELS = 1 << 26  # same decompression-bomb bound as the PNG codec


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF packs code bits little-endian)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


def _lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: CLEAR to start, dictionary of index strings,
    code width grows as the dictionary fills, CLEAR-reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def reset() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    bw.write(clear, width)
    seq = b""
    for b in indices:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        bw.write(table[seq], width)
        table[cand] = next_code
        next_code += 1
        # the encoder bumps width when the NEXT code to be assigned no
        # longer fits (decoder mirrors this after its append)
        if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        # reset BEFORE 4096 can be assigned: code 4096 needs 13 bits,
        # which the format cannot represent (giflib resets here too)
        if next_code == 1 << _MAX_CODE_WIDTH:
            bw.write(clear, width)
            table, next_code, width = reset()
        seq = bytes([b])
    if seq:
        bw.write(table[seq], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decompress(
    data: bytes, min_code_size: int, expected: int
) -> bytes | None:
    """Strict GIF LZW decode: exactly ``expected`` indices terminated by
    an explicit EOI; any out-of-range code, missing EOI, or over-run is
    a reject (return None)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    total_bits = len(data) * 8
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset_table() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset_table()
    while True:
        if pos + width > total_bits:
            return None  # ran out of bits before EOI
        byte0 = pos >> 3
        chunk = int.from_bytes(
            data[byte0 : byte0 + 3], "little"
        )  # width ≤ 12 spans ≤ 3 bytes
        code = (chunk >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                return None  # first code after CLEAR must be a literal
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None  # code beyond the dictionary
        out += entry
        if len(out) > expected:
            return None  # more pixels than the image declares
        if (
            len(table) == (1 << width)
            and width < _MAX_CODE_WIDTH
            and prev is not None
        ):
            width += 1
        prev = entry
    if len(out) != expected:
        return None
    # only byte-padding may remain after EOI
    if total_bits - pos >= 8:
        return None
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 index raster + (N, 3) uint8 palette as a
    single-image GIF89a with a global color table."""
    return encode_gif_frames([indices], palette)


def encode_gif_frames(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 0,
) -> bytes:
    """Encode full-screen (H, W) uint8 index frames + one global palette
    as GIF89a. With more than one frame (or a non-zero ``delay_cs``),
    each image is preceded by a Graphic Control Extension carrying the
    frame delay in centiseconds — the animated-GIF wire layout."""
    # explicit raises (not assert): these guard the encoded wire format
    # and must survive python -O — an oversized index would otherwise
    # silently produce a corrupt LZW stream (ADVICE r7)
    if not frames:
        raise ValueError("encode_gif_frames requires at least one frame")
    h, w = frames[0].shape
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError(f"palette size {n} outside GIF's 2..256")
    # color table size is a power of two >= n (and >= 2 bits of code)
    bits = max(2, (n - 1).bit_length())
    table = np.zeros((1 << bits, 3), np.uint8)
    table[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    animated = len(frames) > 1 or delay_cs
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError(
                f"frame shape {fr.shape} != first frame's {(h, w)}"
            )
        if int(fr.max(initial=0)) >= n:
            raise ValueError(
                f"frame index {int(fr.max(initial=0))} exceeds palette "
                f"size {n}"
            )
        if animated:
            # GCE: disposal=none, no transparency, delay in cs
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        mcs = bits
        out.append(mcs)
        comp = _lzw_compress(fr.astype(np.uint8).tobytes(), mcs)
        for i in range(0, len(comp), 255):
            block = comp[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def try_decode_gif(data: bytes) -> np.ndarray | None:
    """Decode the strict baseline subset: GIF87a/89a, global or local
    color table, exactly ONE image, no interlace. Returns (H, W, 3)
    uint8 RGB (the image rect's dimensions) or None — animated payloads
    go through ``try_decode_gif_frames``."""
    parsed = _parse_gif(bytes(data), max_frames=1)
    if parsed is None or len(parsed[2]) != 1:
        return None
    return parsed[2][0][5]


def try_decode_gif_frames(
    data: bytes,
) -> tuple[int, int, list[int], list[np.ndarray]] | None:
    """Decode an animated GIF: every frame must cover the full logical
    screen (no sub-rect compositing / disposal in the strict subset).
    Returns (width, height, per-frame delays in centiseconds, list of
    (H, W, 3) uint8 RGB frames) or None."""
    parsed = _parse_gif(bytes(data))
    if parsed is None:
        return None
    sw, sh, frames = parsed
    if any(
        (left, top, w, h) != (0, 0, sw, sh)
        for left, top, w, h, _, _ in frames
    ):
        return None
    return sw, sh, [f[4] for f in frames], [f[5] for f in frames]


def _parse_gif(data: bytes, max_frames: int | None = None):
    """Shared container parse: returns (screen_w, screen_h,
    [(left, top, w, h, delay_cs, rgb), ...]) or None. ``max_frames``
    bails on the (max+1)-th image descriptor BEFORE doing its LZW +
    palette work, so the single-image path never pays to decode an
    animation it is going to reject anyway."""
    try:
        return _parse_gif_inner(data, max_frames)
    except Exception:
        return None


def _parse_gif_inner(data: bytes, max_frames: int | None = None):
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gsize = 2 << (packed & 0x07)
        if pos + 3 * gsize > len(data):
            return None
        gct = np.frombuffer(data, np.uint8, 3 * gsize, pos).reshape(-1, 3)
        pos += 3 * gsize
    if sw == 0 or sh == 0 or sw * sh > _MAX_PIXELS:
        return None
    frames = []
    pending_delay = 0
    total_px = 0
    while True:
        if pos >= len(data):
            return None  # no trailer
        block = data[pos]
        pos += 1
        if block == 0x3B:
            if pos != len(data):
                return None  # trailing garbage after the trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                return None
            label = data[pos]
            pos += 1
            sub = bytearray()
            while True:
                if pos >= len(data):
                    return None
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > len(data):
                    return None
                sub += data[pos : pos + sz]
                pos += sz
            if label == 0xF9 and len(sub) == 4:
                # Graphic Control: packed, delay (LE cs), transparent idx
                pending_delay = struct.unpack_from("<H", sub, 1)[0]
            continue
        if block != 0x2C:
            return None  # unknown block type
        if max_frames is not None and len(frames) >= max_frames:
            return None  # over the caller's frame budget: stop early
        if pos + 9 > len(data):
            return None
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            return None  # interlace: outside the strict subset
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            return None
        ct = gct
        if ipacked & 0x80:
            lsize = 2 << (ipacked & 0x07)
            if pos + 3 * lsize > len(data):
                return None
            ct = np.frombuffer(data, np.uint8, 3 * lsize, pos).reshape(-1, 3)
            pos += 3 * lsize
        if ct is None:
            return None
        if pos >= len(data):
            return None
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            return None
        comp = bytearray()
        while True:
            if pos >= len(data):
                return None
            sz = data[pos]
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(data):
                return None
            comp += data[pos : pos + sz]
            pos += sz
        total_px += w * h
        if total_px > _MAX_PIXELS:
            return None  # frame-count decompression bomb
        idx = _lzw_decompress(bytes(comp), mcs, w * h)
        if idx is None:
            return None
        arr = np.frombuffer(idx, np.uint8).reshape(h, w)
        if int(arr.max(initial=0)) >= len(ct):
            return None  # index beyond the color table
        frames.append((left, top, w, h, pending_delay, ct[arr]))
        pending_delay = 0
    if not frames:
        return None
    return sw, sh, frames
