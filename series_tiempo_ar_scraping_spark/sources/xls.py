"""Stdlib-only legacy ``.xls`` (BIFF8) reader/writer — the S8 legacy path.

The reference routes ``.xls`` and ``.xlsx`` workbooks alike into the
Excel scraper (``base.py:134,144`` hands both to xlseries); Argentine
catalogs are full of legacy BIFF files. This module mirrors
``sources/xlsx.py``'s contract exactly: ``iter_cells_xls`` yields
``(sheet, row, col_letter, value_as_string)`` so ``cells.extract_cells``
and everything downstream (``scrape.py``) is format-agnostic.

Format background (public [MS-XLS] / [MS-CFB] specs):

- A ``.xls`` file is an OLE2/CFB *compound file*: a FAT-like filesystem
  of 512-byte sectors with a directory; the BIFF content lives in a
  stream named ``Workbook`` (``Book`` in very old files). Streams
  smaller than 4096 bytes live in a mini-stream with its own mini-FAT.
- The stream is a sequence of BIFF records ``[id:u16][len:u16][data]``:
  one workbook-globals substream (``BOUNDSHEET`` sheet directory +
  ``SST`` shared strings, possibly split across ``CONTINUE`` records),
  then one worksheet substream per sheet holding the cell records
  (``NUMBER``/``RK``/``MULRK``/``LABELSST``/``LABEL``/``BOOLERR``/
  ``FORMULA`` + cached ``STRING`` results).

The writer emits minimal conforming BIFF8 (SST + LABELSST for strings,
NUMBER for numerics) inside a minimal CFB container — enough for this
reader, Excel, and LibreOffice — and exists mainly to build ``.xls``
fixtures and exercise the reader end-to-end (no public-domain ``.xls``
ships with the reference repo).
"""

from __future__ import annotations

import struct

from series_tiempo_ar_scraping_spark.sources.xlsx import _idx_to_col

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD

# BIFF8 record ids
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207

_MAX_RECORD_DATA = 8224  # [MS-XLS] record data size limit


# ---------------------------------------------------------------------------
# CFB (OLE2 compound file) reading
# ---------------------------------------------------------------------------


def _cfb_workbook_stream(data: bytes) -> bytes:
    """Extract the Workbook/Book stream bytes from a compound file."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sec_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    ssz, msz = 1 << sec_shift, 1 << mini_shift
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        # sector 0 starts AFTER the 512-byte header only for 512-byte
        # sectors; v4 compound files (4096-byte sectors) place it at
        # offset 4096 — the general rule is (i + 1) * sector_size
        off = (i + 1) * ssz
        return data[off : off + ssz]

    difat = [s for s in struct.unpack_from("<109I", data, 76)]
    s = difat_start
    for _ in range(n_difat):
        if s >= _ENDOFCHAIN:
            break
        vals = struct.unpack(f"<{ssz // 4}I", sector(s))
        difat.extend(vals[:-1])
        s = vals[-1]
    fat: list[int] = []
    for si in [x for x in difat if x != _FREESECT][:n_fat]:
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(si)))

    def chain(start: int) -> bytes:
        out, s, seen = bytearray(), start, set()
        while s < _ENDOFCHAIN and s not in seen:
            seen.add(s)
            out += sector(s)
            s = fat[s] if s < len(fat) else _ENDOFCHAIN
        return bytes(out)

    directory = chain(dir_start)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        e = directory[off : off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2 or nlen > 64:
            continue
        name = e[: nlen - 2].decode("utf-16-le", "ignore")
        entries.append(
            (
                name,
                e[66],  # type: 5=root, 2=stream
                struct.unpack_from("<I", e, 116)[0],  # start sector
                struct.unpack_from("<I", e, 120)[0],  # size (low 32 bits)
            )
        )
    root = next(e for e in entries if e[1] == 5)
    ministream = chain(root[2])[: root[3]]
    minifat: list[int] = []
    if minifat_start < _ENDOFCHAIN:
        raw = chain(minifat_start)
        minifat = list(struct.unpack(f"<{len(raw) // 4}I", raw))

    def minichain(start: int, size: int) -> bytes:
        out, s, seen = bytearray(), start, set()
        while s < _ENDOFCHAIN and s not in seen and len(out) < size:
            seen.add(s)
            out += ministream[s * msz : (s + 1) * msz]
            s = minifat[s] if s < len(minifat) else _ENDOFCHAIN
        return bytes(out[:size])

    for cand in ("Workbook", "Book"):
        for name, etype, start, size in entries:
            if name == cand and etype == 2:
                if size < mini_cutoff:
                    return minichain(start, size)
                return chain(start)[:size]
    raise ValueError("no Workbook stream in compound file")


# ---------------------------------------------------------------------------
# BIFF record + string parsing
# ---------------------------------------------------------------------------


def _iter_records(wb: bytes, pos: int):
    """Yield ``(rec_id, data, next_pos)`` from ``pos`` to the substream EOF."""
    n = len(wb)
    while pos + 4 <= n:
        rid, ln = struct.unpack_from("<HH", wb, pos)
        data = wb[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        yield rid, data, pos
        if rid == _EOF:
            return


class _FragmentReader:
    """Sequential reader over SST+CONTINUE data fragments.

    [MS-XLS] splits SST across CONTINUE records either *between* strings
    (next fragment starts directly with the next string's cch) or
    *inside* a character array (next fragment re-states the grbit flags
    byte). Fixed-width fields never straddle fragments.
    """

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.pos

    def _advance(self) -> None:
        while self.fi < len(self.frags) - 1 and self._avail() == 0:
            self.fi += 1
            self.pos = 0

    def _read(self, n: int) -> bytes:
        self._advance()
        out = self.frags[self.fi][self.pos : self.pos + n]
        self.pos += len(out)
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self._read(2))[0]
        flags = self._read(1)[0]
        high = flags & 0x01
        ext = flags & 0x04
        rich = flags & 0x08
        crun = struct.unpack("<H", self._read(2))[0] if rich else 0
        cbext = struct.unpack("<I", self._read(4))[0] if ext else 0
        chars: list[str] = []
        remaining = cch
        while remaining > 0:
            if self._avail() == 0 and self.fi < len(self.frags) - 1:
                # mid-string continuation: new fragment re-states grbit
                self.fi += 1
                self.pos = 0
                high = self._read(1)[0] & 0x01
            width = 2 if high else 1
            take = min(remaining, max(1, self._avail() // width))
            raw = self._read(take * width)
            chars.append(
                raw.decode("utf-16-le" if high else "latin-1", "replace")
            )
            remaining -= take
        skip = crun * 4 + cbext
        while skip > 0:
            got = len(self._read(min(skip, max(1, self._avail()))))
            if got == 0:
                break
            skip -= got
        return "".join(chars)


def _parse_sst(fragments: list[bytes]) -> list[str]:
    rd = _FragmentReader(fragments)
    rd._read(4)  # total refs
    n_unique = struct.unpack("<I", rd._read(4))[0]
    return [rd.read_string() for _ in range(n_unique)]


def _short_string(data: bytes, off: int) -> str:
    """XLUnicodeString (cch:u16, flags:u8, chars) — used by LABEL/STRING."""
    cch, flags = struct.unpack_from("<HB", data, off)
    off += 3
    if flags & 0x01:
        return data[off : off + 2 * cch].decode("utf-16-le", "replace")
    return data[off : off + cch].decode("latin-1", "replace")


def _rk_number(rk: int) -> float:
    if rk & 0x02:  # 30-bit signed int
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack(
            "<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC)
        )[0]
    return val / 100.0 if rk & 0x01 else val


def _num_to_text(v: float) -> str:
    """Match the xlsx reader's serialization: trim float noise on ids."""
    text = repr(v)
    if text.endswith(".0"):
        text = text[:-2]
    return text


def iter_cells_xls(path: str):
    """Yield ``(sheet, row, col_letter, value)`` for every non-empty cell —
    the same long-cells contract as ``xlsx.iter_cells`` (rows 1-based,
    values string-serialized; typing happens downstream per metadata)."""
    with open(path, "rb") as fh:
        wb = _cfb_workbook_stream(fh.read())

    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    sst: list[str] = []
    sst_frags: list[bytes] | None = None
    for rid, data, pos in _iter_records(wb, 0):
        if rid == _BOUNDSHEET:
            off = struct.unpack_from("<I", data, 0)[0]
            sheet_type = data[5]
            cch = data[6]
            flags = data[7]
            if flags & 0x01:
                name = data[8 : 8 + 2 * cch].decode("utf-16-le", "replace")
            else:
                name = data[8 : 8 + cch].decode("latin-1", "replace")
            if sheet_type == 0:  # worksheet (not chart/macro)
                sheets.append((name, off))
        elif rid == _SST:
            sst_frags = [data]
        elif rid == _CONTINUE and sst_frags is not None:
            sst_frags.append(data)
        elif sst_frags is not None and rid not in (_SST, _CONTINUE):
            sst = _parse_sst(sst_frags)
            sst_frags = None
    if sst_frags is not None:
        sst = _parse_sst(sst_frags)

    for name, off in sheets:
        pending: tuple[int, int] | None = None  # FORMULA awaiting STRING
        for rid, data, _pos in _iter_records(wb, off):
            if rid == _NUMBER:
                r, c = struct.unpack_from("<HH", data, 0)
                v = struct.unpack_from("<d", data, 6)[0]
                yield name, r + 1, _idx_to_col(c + 1), _num_to_text(v)
            elif rid == _RK:
                r, c = struct.unpack_from("<HH", data, 0)
                rk = struct.unpack_from("<I", data, 6)[0]
                yield name, r + 1, _idx_to_col(c + 1), _num_to_text(
                    _rk_number(rk)
                )
            elif rid == _MULRK:
                r, c0 = struct.unpack_from("<HH", data, 0)
                n_cells = (len(data) - 6) // 6
                for i in range(n_cells):
                    rk = struct.unpack_from("<I", data, 4 + i * 6 + 2)[0]
                    yield name, r + 1, _idx_to_col(c0 + i + 1), _num_to_text(
                        _rk_number(rk)
                    )
            elif rid == _LABELSST:
                r, c = struct.unpack_from("<HH", data, 0)
                isst = struct.unpack_from("<I", data, 6)[0]
                val = sst[isst] if isst < len(sst) else ""
                if val != "":
                    yield name, r + 1, _idx_to_col(c + 1), val
            elif rid == _LABEL:
                r, c = struct.unpack_from("<HH", data, 0)
                val = _short_string(data, 6)
                if val != "":
                    yield name, r + 1, _idx_to_col(c + 1), val
            elif rid == _BOOLERR:
                r, c = struct.unpack_from("<HH", data, 0)
                val, is_err = data[6], data[7]
                if not is_err:
                    yield name, r + 1, _idx_to_col(c + 1), (
                        "TRUE" if val else "FALSE"
                    )
            elif rid == _FORMULA:
                r, c = struct.unpack_from("<HH", data, 0)
                if data[12:14] == b"\xff\xff":
                    kind = data[6]
                    if kind == 0:  # cached string follows in STRING record
                        pending = (r, c)
                    elif kind == 1:
                        yield name, r + 1, _idx_to_col(c + 1), (
                            "TRUE" if data[8] else "FALSE"
                        )
                    # kind 2 (error) and 3 (empty): no value
                else:
                    v = struct.unpack_from("<d", data, 6)[0]
                    yield name, r + 1, _idx_to_col(c + 1), _num_to_text(v)
            elif rid == _STRING and pending is not None:
                r, c = pending
                pending = None
                val = _short_string(data, 0)
                if val != "":
                    yield name, r + 1, _idx_to_col(c + 1), val


# ---------------------------------------------------------------------------
# Minimal BIFF8 + CFB writer (fixtures / K-parity)
# ---------------------------------------------------------------------------


def _rec(rid: int, data: bytes) -> bytes:
    return struct.pack("<HH", rid, len(data)) + data


def _bof(dt: int) -> bytes:
    return _rec(
        _BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0)
    )


def _encode_str(s: str) -> tuple[bytes, int]:
    try:
        return s.encode("latin-1"), 0
    except UnicodeEncodeError:
        return s.encode("utf-16-le"), 1


def _sst_records(strings: list[str]) -> bytes:
    """SST (+CONTINUE when over the record size limit, split between
    strings — the spec-legal break that needs no grbit re-emit)."""
    chunks: list[bytes] = []
    buf = bytearray(struct.pack("<II", len(strings), len(strings)))
    for s in strings:
        enc, high = _encode_str(s)
        item = struct.pack("<HB", len(s), high) + enc
        if len(buf) + len(item) > _MAX_RECORD_DATA and len(buf) > 0:
            chunks.append(bytes(buf))
            buf = bytearray()
        buf += item
    chunks.append(bytes(buf))
    out = _rec(_SST, chunks[0])
    for extra in chunks[1:]:
        out += _rec(_CONTINUE, extra)
    return out


def write_xls_cells(
    path: str, cells: list[tuple[str, int, int, object]]
) -> str:
    """Write a sparse cell grid as BIFF8: ``(sheet, row1, col1, value)``
    with 1-based row/col; numeric values become NUMBER records, strings
    go through SST + LABELSST (the layout real Excel files use, so the
    reader's SST path is exercised end-to-end)."""
    import os

    sheet_names: list[str] = []
    by_sheet: dict[str, list[tuple[int, int, object]]] = {}
    for sheet, r, c, v in cells:
        if sheet not in by_sheet:
            sheet_names.append(sheet)
            by_sheet[sheet] = []
        by_sheet[sheet].append((r, c, v))

    strings: list[str] = []
    sst_index: dict[str, int] = {}
    for sheet in sheet_names:
        for _r, _c, v in by_sheet[sheet]:
            if not isinstance(v, (int, float)) and v is not None:
                s = str(v)
                if s not in sst_index:
                    sst_index[s] = len(strings)
                    strings.append(s)

    payloads: list[bytes] = []
    for sheet in sheet_names:
        body = bytearray(_bof(0x0010))
        for r, c, v in sorted(by_sheet[sheet]):
            if v is None:
                continue
            if isinstance(v, (int, float)):
                body += _rec(
                    _NUMBER,
                    struct.pack("<HHH", r - 1, c - 1, 0)
                    + struct.pack("<d", float(v)),
                )
            else:
                body += _rec(
                    _LABELSST,
                    struct.pack("<HHHI", r - 1, c - 1, 0, sst_index[str(v)]),
                )
        body += _rec(_EOF, b"")
        payloads.append(bytes(body))

    sst_blob = _sst_records(strings)

    def boundsheets(offsets: list[int]) -> bytes:
        out = bytearray()
        for sheet, off in zip(sheet_names, offsets):
            enc, high = _encode_str(sheet)
            out += _rec(
                _BOUNDSHEET,
                struct.pack("<IBBBB", off, 0, 0, len(sheet), high) + enc,
            )
        return bytes(out)

    # Two passes: globals length depends only on name lengths, not offsets.
    fake = boundsheets([0] * len(sheet_names))
    globals_len = len(_bof(0x0005)) + len(fake) + len(sst_blob) + len(
        _rec(_EOF, b"")
    )
    offsets = []
    acc = globals_len
    for p in payloads:
        offsets.append(acc)
        acc += len(p)
    stream = (
        _bof(0x0005)
        + boundsheets(offsets)
        + sst_blob
        + _rec(_EOF, b"")
        + b"".join(payloads)
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(_cfb_container(stream))
    return path


def write_xls(
    path: str, sheets: dict[str, tuple[list[str], list[tuple]]]
) -> str:
    """Tabular convenience mirroring ``write_xlsx``: ``{sheet: (columns,
    rows)}`` with row 1 as the header."""
    cells: list[tuple[str, int, int, object]] = []
    for sheet, (columns, rows) in sheets.items():
        for ci, col in enumerate(columns):
            cells.append((sheet, 1, ci + 1, col))
        for ri, row in enumerate(rows):
            for ci, v in enumerate(row):
                if v is not None:
                    cells.append((sheet, ri + 2, ci + 1, v))
    return write_xls_cells(path, cells)


def _dir_entry(
    name: str, etype: int, start: int, size: int, child: int = _FREESECT
) -> bytes:
    enc = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0 : len(enc)] = enc
    struct.pack_into("<H", e, 64, len(enc))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, _FREESECT, _FREESECT, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _cfb_container(stream: bytes) -> bytes:
    """Wrap one stream as a minimal v3 compound file.

    The stream is padded to >= 4096 bytes so it lives in regular sectors
    (no mini-FAT needed); trailing zero bytes after the final BIFF EOF
    are spec-tolerated and ignored by readers."""
    size = max(len(stream), 4096)
    stream = stream.ljust(size, b"\x00")
    n_stream = -(-len(stream) // 512)
    stream = stream.ljust(n_stream * 512, b"\x00")

    n_fat = 1
    while (n_fat * 128) < (n_fat + 1 + n_stream):
        n_fat += 1
    dir_sector = n_fat
    first_stream = n_fat + 1
    total = n_fat + 1 + n_stream

    fat = [_FREESECT] * (n_fat * 128)
    for i in range(n_fat):
        fat[i] = _FATSECT
    fat[dir_sector] = _ENDOFCHAIN
    for i in range(n_stream - 1):
        fat[first_stream + i] = first_stream + i + 1
    fat[first_stream + n_stream - 1] = _ENDOFCHAIN
    assert total <= len(fat)

    directory = (
        _dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        + _dir_entry("Workbook", 2, first_stream, size)
        + bytes(128) * 2
    )

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (v3: 512b sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_sector)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT overflow
    struct.pack_into("<I", header, 72, 0)
    difat = [_FREESECT] * 109
    for i in range(n_fat):
        difat[i] = i
    struct.pack_into("<109I", header, 76, *difat)

    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)
    return bytes(header) + fat_bytes + directory.ljust(512, b"\x00") + stream
