"""Pure-stdlib/numpy baseline JPEG codec (JFIF, SOF0).

The decode side is a GENERAL baseline-sequential decoder: marker
parsing, DQT/DHT (canonical Huffman built from BITS/HUFFVAL — any legal
tables, not just the ones our encoder writes), SOF0, byte-unstuffed
entropy-coded segment, per-block dequantize → inverse zigzag → IDCT →
level shift, and the RGB color transform for 3-component scans.
Restrictions (strict rejects, same contract as the PPM/BMP/PNG codecs
in ``multimodal.py``): 8-bit baseline only, 1 or 3 components, 1x1
sampling (no chroma subsampling), no progressive, no restart intervals,
single scan, EOI must end the payload.

The encode side exists for fixtures and round-trip tests. It writes
valid interchange-format JPEGs with *custom canonical* Huffman tables —
DC: twelve 4-bit codes, AC: 256 nine-bit codes — chosen so no
transcription of the Annex K example tables is needed (the tables
travel in DHT, so any conforming decoder reads them) and so the
all-ones codeword never occurs. Quantization tables are all-ones: a
solid-color block has only a DC coefficient and round-trips EXACTLY
(DCT of a constant block is DC-only and the float ops involved are
exact on integers), which is what makes the hash-oracled
``multimodal_jpeg_stats`` query possible.

The 8x8 DCT uses the orthonormal matrix form (T @ B @ T.T), float64,
with floor(x+0.5) rounding everywhere — deterministic across platforms.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The standard JPEG zigzag as a (64,) array of flat indices into a
    row-major 8x8 block — generated, not transcribed."""
    order = []
    for s in range(15):
        diag = [(u, s - u) for u in range(8) if 0 <= s - u < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(u * 8 + v for u, v in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None].astype(np.float64)
    j = np.arange(8)[None, :].astype(np.float64)
    t = np.cos((2 * j + 1) * k * np.pi / 16.0)
    t[0, :] *= np.sqrt(1.0 / 8.0)
    t[1:, :] *= np.sqrt(2.0 / 8.0)
    return t


DCT_T = _dct_matrix()

# Custom canonical Huffman tables (legal per the spec; shipped in DHT):
# DC — twelve 4-bit codes (0000..1011); AC — 255 eight-bit codes plus
# one nine-bit code (a DHT BITS entry is a u8, so 256 codes can't share
# one length). Canonically the 9-bit code is 111111110 — the all-ones
# codeword never occurs in either table.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 7 + [255, 1] + [0] * 7
_AC_VALS = list(range(256))


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


# --- bit IO ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (spec)
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over a byte-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte_i, off = divmod(self.pos, 8)
        if byte_i >= len(self.data):
            raise ValueError("entropy segment exhausted")
        self.pos += 1
        return (self.data[byte_i] >> (7 - off)) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# --- Huffman ---------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per the JPEG spec."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical decode tables built from a DHT (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        if sum(bits) != len(vals) or sum(bits) == 0:
            raise ValueError("bad huffman table")
        # mincode/maxcode per length (Annex F decode procedure)
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        vi = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = vi
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                vi += n
            else:
                self.max_code[length] = -1
            code <<= 1
            if code > (1 << (length + 1)):
                raise ValueError("overfull huffman table")
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            mx = self.max_code[length]
            if mx >= 0 and code <= mx:
                return self.vals[self.val_ptr[length] + code - self.min_code[length]]
        raise ValueError("invalid huffman code")


def _receive_extend(br: _BitReader, t: int) -> int:
    if t == 0:
        return 0
    v = br.read_bits(t)
    if v < (1 << (t - 1)):  # negative branch
        v -= (1 << t) - 1
    return v


def _category(v: int) -> int:
    return int(v).bit_length() if v != 0 else 0


# --- encoder ---------------------------------------------------------------


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """DCT + quantize (Q=1) + entropy-code one 8x8 sample block; returns
    the new DC predictor."""
    f = DCT_T @ (block.astype(np.float64) - 128.0) @ DCT_T.T
    q = _round_half_up(f).astype(np.int64).reshape(64)[ZIGZAG]
    dc = int(q[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if q[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


def encode_jpeg_baseline(pixels: np.ndarray) -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as a baseline JFIF
    JPEG (4:4:4, all-ones quant tables, custom canonical Huffman). H and
    W must be multiples of 8 (no edge-block padding — fixture codec)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h % 8 or w % 8 or h == 0 or w == 0:
        raise ValueError("fixture encoder requires multiple-of-8 dims")
    comps = (
        pixels[..., None].astype(np.uint8)
        if gray
        else _rgb_to_ycbcr(pixels)
    )
    ncomp = comps.shape[-1]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    qt = bytes([0]) + bytes([1] * 64)  # table 0, all ones, zigzag order
    out += _seg(0xFFDB, qt)
    out += _seg(0xFFC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xFFC4, _dht_payload(1, 0, _AC_BITS, _AC_VALS))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    out += _seg(0xFFC0, sof)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci in range(ncomp):  # interleaved MCU, 1x1 sampling
                block = comps[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci]
                preds[ci] = _encode_block(
                    bw, block, preds[ci], dc_codes, ac_codes
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def try_decode_jpeg(data: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG to (H, W, 3) uint8 RGB, or None for
    anything outside the supported strict subset (see module docstring)
    or malformed in any way."""
    try:
        return _decode_jpeg_strict(bytes(data))
    except Exception:  # noqa: BLE001 — decoder contract: None, never raise
        return None


def _decode_jpeg_strict(data: bytes) -> np.ndarray | None:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    sof = None
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            return None  # unexpected SOI / restart marker
        (length,) = struct.unpack_from(">H", data, pos + 2)
        if length < 2 or pos + 2 + length > len(data):
            return None
        seg = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:  # 16-bit tables: not baseline-8
                    return None
                if i + 65 > len(seg):
                    return None
                tbl = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                qtables[tq] = tbl[UNZIGZAG].reshape(8, 8)
                i += 65
            if i != len(seg):
                return None
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                if tc > 1:  # 0=DC, 1=AC; anything else is illegal
                    return None
                if i + 17 > len(seg):
                    return None
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(seg):
                    return None
                vals = list(seg[i + 17 : i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + n
            if i != len(seg):
                return None
        elif marker == 0xC0:  # SOF0 baseline
            if sof is not None or len(seg) < 6:
                return None
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            if h % 8 or w % 8:  # strict subset: no partial edge blocks
                return None
            if w * h > 1 << 26:
                return None
            if len(seg) != 6 + 3 * nc:
                return None
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:  # 1x1 only (no subsampling)
                    return None
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF
        elif marker == 0xDD:  # DRI: restart intervals unsupported
            return None
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None or len(seg) < 1:
                return None
            ns = seg[0]
            if ns != len(sof[2]) or len(seg) != 1 + 2 * ns + 3:
                return None
            mapping = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                td, ta = tt >> 4, tt & 0x0F
                if cs != sof[2][si][0]:  # same order as SOF
                    return None
                mapping.append((td, ta))
            ss, se, ah_al = seg[1 + 2 * ns : 4 + 2 * ns]
            if ss != 0 or se != 63 or ah_al != 0:
                return None
            scan = (mapping, pos)
            break
        # APPn/COM and other tables are skipped
    if sof is None or scan is None:
        return None
    h, w, comps = sof
    mapping, epos = scan

    # entropy-coded segment runs to the EOI marker; unstuff 0xFF00
    end = data.rfind(b"\xff\xd9")
    if end < epos or end + 2 != len(data):  # EOI must terminate payload
        return None
    raw = data[epos:end]
    if b"\xff" in raw.replace(b"\xff\x00", b""):
        return None  # unexpected marker inside the scan
    br = _BitReader(raw.replace(b"\xff\x00", b"\xff"))

    nc = len(comps)
    for ci, (td, ta) in enumerate(mapping):
        if td not in huff_dc or ta not in huff_ac:
            return None
        if comps[ci][1] not in qtables:
            return None
    planes = [np.zeros((h, w), np.float64) for _ in range(nc)]
    preds = [0] * nc
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci in range(nc):
                td, ta = mapping[ci]
                q = qtables[comps[ci][1]]
                coeffs = np.zeros(64, np.int64)
                t = huff_dc[td].decode(br)
                if t > 11:
                    return None
                preds[ci] += _receive_extend(br, t)
                coeffs[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = huff_ac[ta].decode(br)
                    r, t = rs >> 4, rs & 0x0F
                    if t == 0:
                        if r == 15:
                            k += 16  # ZRL: 16 zeros, a coeff MUST follow
                            if k > 63:
                                return None
                            continue
                        if r != 0:  # (r,0) for r=1..14 undefined in baseline
                            return None
                        break  # EOB
                    k += r
                    if k > 63:
                        return None
                    coeffs[k] = _receive_extend(br, t)
                    k += 1
                block = coeffs[UNZIGZAG].reshape(8, 8) * q
                s = DCT_T.T @ block.astype(np.float64) @ DCT_T + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = s
    # all entropy bits must be consumed up to byte padding
    if (len(br.data) * 8 - br.pos) >= 8:
        return None
    if nc == 1:
        y = np.clip(_round_half_up(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)
