"""Legacy ``.xls`` (BIFF8 in an OLE2/CFB compound file) source — pure
stdlib, same hand-rolled-codec approach as the FGB/SHP drivers.

Scope (a data-table reader, mirroring what `read_df` needs): CFB v3/v4
container, ``Workbook``/``Book`` stream lookup (FAT and miniFAT chains),
the workbook-globals substream (BOUNDSHEET sheet directory + SST shared
strings incl. CONTINUE splits), and the worksheet cell records
LABELSST / LABEL / RSTRING / NUMBER / RK / MULRK / BOOLERR /
FORMULA(+STRING). Both BIFF8 (Excel 97+, unicode SST) and BIFF5
(Excel 5.0/95 ``Book`` streams: inline codepage byte strings, no SST,
grbit-less BOUNDSHEET/STRING) parse; the version comes from the BOF
record. Number formats are not decoded (dates come back as serial
numbers) and pre-BIFF5 streams raise — the reference cannot read OLE2
`.xls` at all (`/root/reference/erde/io/xls.py:13` forces
``engine='openpyxl'``).

Excel files cap at ~1M rows, so parsing is driver-side: the parsed rows
feed ``spark.createDataFrame`` exactly like the ``.xlsx`` path.
"""

from __future__ import annotations

import struct

_OLE_MAGIC = b'\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1'
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


# ---------------------------------------------------------------- CFB

def _fat_chain(fat: list[int], start: int) -> list[int]:
    chain, s, seen = [], start, set()
    while s not in (_ENDOFCHAIN, _FREESECT) and s < len(fat):
        if s in seen:
            raise ValueError('cyclic FAT chain in compound file')
        seen.add(s)
        chain.append(s)
        s = fat[s]
    return chain

def cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first stream whose name is in ``names`` from an OLE2
    compound file (handles both the regular FAT and the mini stream)."""
    if data[:8] != _OLE_MAGIC:
        raise ValueError('not an OLE2 compound file')
    if len(data) < 512:
        raise ValueError('truncated OLE2 compound file (header under 512 bytes)')
    ssz = 1 << struct.unpack_from('<H', data, 30)[0]
    mini_ssz = 1 << struct.unpack_from('<H', data, 32)[0]
    n_fat = struct.unpack_from('<I', data, 44)[0]
    dir_start = struct.unpack_from('<I', data, 48)[0]
    mini_cutoff = struct.unpack_from('<I', data, 56)[0]
    minifat_start = struct.unpack_from('<I', data, 60)[0]
    n_minifat = struct.unpack_from('<I', data, 64)[0]
    difat_start = struct.unpack_from('<I', data, 68)[0]
    n_difat = struct.unpack_from('<I', data, 72)[0]

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        return data[off:off + ssz]

    # DIFAT: 109 entries in the header, then chained DIFAT sectors
    difat = list(struct.unpack_from('<109I', data, 76))
    s = difat_start
    for _ in range(n_difat):
        if s in (_ENDOFCHAIN, _FREESECT):
            break
        raw = sector(s)
        ents = struct.unpack(f'<{ssz // 4}I', raw)
        difat.extend(ents[:-1])
        s = ents[-1]
    fat: list[int] = []
    for fs in difat[:n_fat]:
        fat.extend(struct.unpack(f'<{ssz // 4}I', sector(fs)))

    dir_raw = b''.join(sector(s) for s in _fat_chain(fat, dir_start))
    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        nlen = struct.unpack_from('<H', dir_raw, off + 64)[0]
        etype = dir_raw[off + 66]
        if etype == 0 or nlen < 2:
            continue
        name = dir_raw[off:off + nlen - 2].decode('utf-16-le', 'replace')
        start = struct.unpack_from('<I', dir_raw, off + 116)[0]
        size = struct.unpack_from('<Q', dir_raw, off + 120)[0] & 0xFFFFFFFF
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    target = next((e for e in entries if e[1] == 2 and e[0] in names), None)
    if target is None:
        have = [e[0] for e in entries]
        raise ValueError(f'no stream named {names} in compound file; have {have}')
    _, _, start, size = target
    if size >= mini_cutoff or root is None:
        raw = b''.join(sector(s) for s in _fat_chain(fat, start))
        return raw[:size]
    # small stream: mini sectors live inside the root entry's stream
    mini_container = b''.join(sector(s) for s in _fat_chain(fat, root[2]))
    minifat: list[int] = []
    for s in _fat_chain(fat, minifat_start)[:n_minifat or None]:
        minifat.extend(struct.unpack(f'<{ssz // 4}I', sector(s)))
    out, s = [], start
    seen: set[int] = set()
    while s not in (_ENDOFCHAIN, _FREESECT) and s < len(minifat):
        if s in seen:
            raise ValueError('cyclic miniFAT chain')
        seen.add(s)
        out.append(mini_container[s * mini_ssz:(s + 1) * mini_ssz])
        s = minifat[s]
    return b''.join(out)[:size]


# ---------------------------------------------------------------- BIFF8

def _records(stream: bytes, pos: int = 0):
    """Yield (opcode, data, next_pos); stops at stream end or zero fill."""
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from('<HH', stream, pos)
        if op == 0:
            return
        yield op, stream[pos + 4:pos + 4 + ln], pos + 4 + ln
        pos += 4 + ln


class _SSTCursor:
    """Byte cursor over the SST record + its CONTINUE parts.

    Raw fields (lengths, run counts, rich/ext payloads) flow across part
    boundaries unchanged; CHARACTER data restarts each continued part
    with a fresh grbit byte (fHighByte may flip mid-string) — the one
    genuinely tricky rule of the format."""

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.p = 0
        self.off = 0

    def _advance(self):
        while self.p < len(self.parts) and self.off >= len(self.parts[self.p]):
            self.p += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            part = self.parts[self.p]
            take = min(n, len(part) - self.off)
            out += part[self.off:self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        out = []
        while cch > 0:
            self._advance()
            part = self.parts[self.p]
            if self.off >= len(part):
                raise ValueError('truncated SST string')
            avail = len(part) - self.off
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:
                raise ValueError('SST string split mid-character')
            raw = part[self.off:self.off + take * width]
            out.append(raw.decode('utf-16-le' if high else 'latin-1'))
            self.off += take * width
            cch -= take
            if cch > 0:
                # string continues into the next part: re-read grbit
                self.p += 1
                self.off = 0
                self._advance()
                high = bool(self.parts[self.p][self.off] & 1)
                self.off += 1
        return ''.join(out)


def _parse_sst(parts: list[bytes]) -> list[str]:
    cur = _SSTCursor(parts)
    _total, unique = struct.unpack('<II', cur.read(8))
    out = []
    for _ in range(unique):
        cch, flags = struct.unpack('<HB', cur.read(3))
        high = bool(flags & 0x01)
        ext = bool(flags & 0x04)
        rich = bool(flags & 0x08)
        c_run = struct.unpack('<H', cur.read(2))[0] if rich else 0
        cb_ext = struct.unpack('<i', cur.read(4))[0] if ext else 0
        out.append(cur.read_chars(cch, high))
        if c_run:
            cur.read(4 * c_run)
        if cb_ext:
            cur.read(cb_ext)
    return out


def _short_string(data: bytes, off: int) -> tuple[str, int]:
    """BIFF8 sheet name: u8 length + grbit + chars."""
    cch = data[off]
    high = bool(data[off + 1] & 1)
    end = off + 2 + cch * (2 if high else 1)
    raw = data[off + 2:end]
    return raw.decode('utf-16-le' if high else 'latin-1'), end


def _rk_value(rk: int) -> float | int:
    div100 = rk & 1
    if rk & 2:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
    else:  # high 30 bits of an IEEE double
        v = struct.unpack('<d', struct.pack('<Q', (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100 if div100 else v


#: CODEPAGE record value -> python codec for BIFF5 byte strings
_CODEPAGES = {
    437: 'cp437', 850: 'cp850', 866: 'cp866', 932: 'cp932', 936: 'gbk',
    949: 'cp949', 950: 'big5', 1251: 'cp1251', 1252: 'cp1252',
    1253: 'cp1253', 1254: 'cp1254', 1255: 'cp1255', 1256: 'cp1256',
    1257: 'cp1257', 10000: 'mac_roman',
}


def parse_xls(data: bytes, sheet: str | None = None) -> dict[int, dict[int, object]]:
    """Parse one worksheet of a BIFF8 or BIFF5 workbook into sparse rows
    ({row_index: {col_index: value}}, 0-based) — the same shape the
    ``.xlsx`` reader builds, so header/type inference is shared.

    BIFF8 ('Workbook' stream, Excel 97+) carries unicode strings through
    the SST; BIFF5 ('Book' stream, Excel 5.0/95) has no SST — string
    cells are inline LABEL/RSTRING byte strings in the CODEPAGE
    record's encoding, and BOUNDSHEET/STRING records drop the grbit
    byte. The version is read from the BOF record, not the stream name.
    Pre-BIFF5 worksheet-only streams raise."""
    stream = cfb_stream(data, ('Workbook', 'Book'))

    first = next(_records(stream), None)
    if not first or first[0] != 0x809:
        raise NotImplementedError(
            'stream does not start with a BIFF5/BIFF8 BOF record — '
            'pre-Excel-5.0 .xls is not supported; re-save the workbook')
    vers = struct.unpack_from('<H', first[1], 0)[0]
    if vers < 0x500:
        raise NotImplementedError(
            f'BIFF version 0x{vers:04X} (pre-Excel-5.0) .xls is not '
            'supported; re-save the workbook')
    biff5 = vers < 0x600
    codec = 'cp1252'

    # workbook globals: sheet directory + shared strings (BIFF8)
    sheets: list[tuple[str, int]] = []
    sst_parts: list[bytes] = []
    collecting_sst = False
    for op, rec, _nxt in _records(stream):
        if op == 0x85:  # BOUNDSHEET
            pos = struct.unpack_from('<I', rec, 0)[0]
            if biff5:  # u8 length + byte chars, no grbit
                name = rec[7:7 + rec[6]].decode(codec, 'replace')
            else:
                name, _ = _short_string(rec, 6)
            sheets.append((name, pos))
            collecting_sst = False
        elif op == 0x42:  # CODEPAGE
            cp = struct.unpack_from('<H', rec, 0)[0]
            codec = _CODEPAGES.get(cp, codec)
        elif op == 0xFC:  # SST
            sst_parts = [rec]
            collecting_sst = True
        elif op == 0x3C and collecting_sst:  # CONTINUE
            sst_parts.append(rec)
        elif op == 0x0A:  # EOF of globals substream
            break
        else:
            collecting_sst = False
    sst = _parse_sst(sst_parts) if sst_parts else []
    if not sheets:
        raise ValueError('no BOUNDSHEET records in workbook globals')
    if sheet is not None:
        match = [p for n, p in sheets if n.lower() == sheet.lower()]
        if not match:
            raise ValueError(f'sheet {sheet!r} not found; have {[n for n, _ in sheets]}')
        start = match[0]
    else:
        start = sheets[0][1]

    rows: dict[int, dict[int, object]] = {}

    def put(r: int, c: int, v: object):
        rows.setdefault(r, {})[c] = v

    pending_formula: tuple[int, int] | None = None
    for op, rec, _nxt in _records(stream, start):
        if op == 0x0A:  # EOF of this worksheet substream
            break
        if op == 0xFD:  # LABELSST
            r, c, _xf, isst = struct.unpack_from('<HHHI', rec)
            put(r, c, sst[isst])
        elif op == 0x203:  # NUMBER
            r, c, _xf = struct.unpack_from('<HHH', rec)
            put(r, c, struct.unpack_from('<d', rec, 6)[0])
        elif op == 0x27E:  # RK
            r, c, _xf, rk = struct.unpack_from('<HHHI', rec)
            put(r, c, _rk_value(rk))
        elif op == 0xBD:  # MULRK
            r, c0 = struct.unpack_from('<HH', rec)
            n_cells = (len(rec) - 6) // 6
            for i in range(n_cells):
                rk = struct.unpack_from('<I', rec, 4 + 6 * i + 2)[0]
                put(r, c0 + i, _rk_value(rk))
        elif op == 0x205:  # BOOLERR
            r, c, _xf, val, is_err = struct.unpack_from('<HHHBB', rec)
            if not is_err:
                put(r, c, bool(val))
        elif op in (0x204, 0xD6):  # LABEL / RSTRING (inline string cell)
            r, c, _xf, cch = struct.unpack_from('<HHHH', rec)
            if biff5:  # byte string in the workbook codepage, no grbit
                put(r, c, rec[8:8 + cch].decode(codec, 'replace'))
            else:
                flags = rec[8]
                high = bool(flags & 1)
                raw = rec[9:9 + cch * (2 if high else 1)]
                put(r, c, raw.decode('utf-16-le' if high else 'latin-1'))
        elif op == 0x06:  # FORMULA: cached result
            r, c, _xf = struct.unpack_from('<HHH', rec)
            num = rec[6:14]
            if num[6:8] == b'\xff\xff':
                kind = num[0]
                if kind == 0:  # string result follows in a STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    put(r, c, bool(num[2]))
            else:
                put(r, c, struct.unpack('<d', num)[0])
        elif op == 0x207 and pending_formula:  # STRING (formula result)
            cch = struct.unpack_from('<H', rec)[0]
            if biff5:
                put(*pending_formula, rec[2:2 + cch].decode(codec, 'replace'))
            else:
                high = bool(rec[2] & 1)
                raw = rec[3:3 + cch * (2 if high else 1)]
                put(*pending_formula,
                    raw.decode('utf-16-le' if high else 'latin-1'))
            pending_formula = None
    # integers stored as doubles come back int when exact (xlsx parity)
    for r in rows.values():
        for c, v in r.items():
            if isinstance(v, float) and v.is_integer() and abs(v) < 1 << 53:
                r[c] = int(v)
    return rows
