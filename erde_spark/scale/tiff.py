"""Baseline TIFF decode + fixture encoder, pure numpy/stdlib.

Covers the baseline profile a crawl actually serves: both byte orders,
strip-organized grayscale/RGB(A) at 8 bits per sample, uncompressed
(compression 1), PackBits (32773) and TIFF-LZW (5) — the TIFF variant
of LZW is MSB-first with the early-change rule, which is why the GIF
LZW decoder can't be reused verbatim. Tiled TIFFs, 16-bit samples and
JPEG-in-TIFF raise ``NotImplementedError`` with a clear message.
Reference: TIFF 6.0 specification (Adobe, 1992), sections 7-11.
"""

from __future__ import annotations

import struct

import numpy as np


def is_tiff(data: bytes) -> bool:
    return data[:4] in (b'II*\x00', b'MM\x00*')


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit order, codes 256=clear 257=EOI,
    and the EARLY CHANGE rule (width bumps one code sooner than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes | None] = [bytes([i]) for i in range(256)] + [None, None]
    width = 9
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == CLEAR:
                table = [bytes([i]) for i in range(256)] + [None, None]
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # early change: the decoder's table lags the encoder's by
            # one entry (it can't build an entry until it sees the next
            # code), so it bumps when ITS next free entry reaches
            # 2^w - 1 (511/1023/2047) — one entry before the table
            # fills, which is one code EARLIER in the stream than the
            # GIF rule. Timing pinned empirically against libtiff
            # (tests/test_codec_crossval.py): the previous 2^w - 2
            # variant was self-consistent with the old encoder but
            # rejected by libtiff with 'Using code not yet in table'.
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out)
    return bytes(out)


def _read_ifd(data: bytes, off: int, endian: str) -> dict[int, tuple]:
    n = struct.unpack_from(endian + 'H', data, off)[0]
    tags = {}
    type_size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    type_fmt = {1: 'B', 3: 'H', 4: 'I'}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + 'HHI', data, base)
        size = type_size.get(typ, 1) * cnt
        if size <= 4:
            voff = base + 8
        else:
            voff = struct.unpack_from(endian + 'I', data, base + 8)[0]
        if typ in type_fmt:
            vals = struct.unpack_from(endian + str(cnt) + type_fmt[typ],
                                      data, voff)
        else:
            vals = (data[voff:voff + size],)
        tags[tag] = vals
    return tags


def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD as (h, w) grayscale or (h, w, samples) uint8 array."""
    if not is_tiff(data):
        raise ValueError('not a TIFF (bad byte-order signature)')
    endian = '<' if data[:2] == b'II' else '>'
    ifd_off = struct.unpack_from(endian + 'I', data, 4)[0]
    try:
        t = _read_ifd(data, ifd_off, endian)
    except struct.error as exc:
        raise ValueError(f'truncated TIFF IFD: {exc}') from exc
    w = t.get(256, (0,))[0]
    h = t.get(257, (0,))[0]
    bps = t.get(258, (8,))
    spp = t.get(277, (1,))[0]
    comp = t.get(259, (1,))[0]
    if t.get(322) or t.get(323):
        raise NotImplementedError('tiled TIFF not supported (strips only)')
    if any(b != 8 for b in bps):
        raise NotImplementedError(f'bits-per-sample {bps}: only 8-bit')
    strip_offs = t.get(273)
    strip_counts = t.get(279)
    if not (w and h and strip_offs and strip_counts):
        raise ValueError('TIFF missing required tags (truncated?)')
    rows_per_strip = t.get(278, (h,))[0]
    # a corrupt tag TYPE makes _read_ifd return raw bytes for a tag
    # that must be numeric — reject instead of propagating junk
    numeric = ([w, h, spp, comp, rows_per_strip]
               + list(strip_offs) + list(strip_counts) + list(bps))
    if not all(isinstance(v, int) and v >= 0 for v in numeric):
        raise ValueError('corrupt TIFF: non-integer required tag value')
    row_bytes = w * spp
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(strip_offs, strip_counts)):
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expected = nrows * row_bytes
        chunk = data[so:so + sc]
        if comp == 1:
            raw += chunk[:expected]
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        elif comp == 5:
            raw += _tiff_lzw_decode(chunk, expected)
        elif comp in (8, 32946):  # Deflate / legacy Adobe Deflate
            import zlib
            raw += zlib.decompress(chunk)[:expected]
        else:
            raise NotImplementedError(
                f'TIFF compression {comp}: only 1 (none), 5 (LZW), '
                '8/32946 (Deflate), 32773 (PackBits)')
    if len(raw) < h * row_bytes:
        raise ValueError('truncated TIFF strip data')
    arr = np.frombuffer(bytes(raw[:h * row_bytes]), np.uint8)
    # predictor 2: horizontal differencing must be undone per sample
    if t.get(317, (1,))[0] == 2:
        arr = arr.reshape(h, w, spp).cumsum(axis=1, dtype=np.uint16) \
            .astype(np.uint8).reshape(-1)
    arr = arr.reshape(h, w, spp)
    return arr[:, :, 0] if spp == 1 else arr


# ---------------------------------------------------------------- encode


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW encoder (MSB-first, early change) for fixtures."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = EOI + 1
    width = 9
    emit(CLEAR, width)
    cur = b''
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # the encoder runs one entry AHEAD of the decoder, so its bump
        # lands when the table actually fills (2^w) — the decoder's
        # 2^w - 1 rule then changes width at the same stream position
        # (libtiff-pinned; see the decoder comment)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4093:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = EOI + 1
            width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_encode(row: bytes) -> bytes:
    """Literal-only PackBits (valid, just not maximally compressed)."""
    out = bytearray()
    for i in range(0, len(row), 128):
        chunk = row[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def encode_tiff(arr: np.ndarray, compression: int = 1,
                big_endian: bool = False, predictor: bool = False) -> bytes:
    """Single-IFD strip TIFF fixture encoder: uncompressed or PackBits,
    one strip per 16 rows, optional horizontal-differencing predictor
    (written uncompressed) to exercise the decoder's predictor path."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    endian = '>' if big_endian else '<'
    if predictor:
        d = a.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        a = (d % 256).astype(np.uint8)
    rows_per_strip = 16
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = a[y0:y0 + rows_per_strip].tobytes()
        if compression == 32773:
            block = _packbits_encode(block)
        elif compression == 5:
            block = _tiff_lzw_encode(block)
        elif compression != 1:
            raise ValueError('fixture encoder: compression 1, 5 or 32773 only')
        strips.append(block)

    header = struct.pack(endian + '2sHI', b'II' if not big_endian else b'MM',
                         42, 8)
    tags = []

    def tag(tid, typ, vals):
        tags.append((tid, typ, vals))

    tag(256, 4, [w])
    tag(257, 4, [h])
    tag(258, 3, [8] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [1 if spp == 1 else 2])  # photometric
    tag(277, 3, [spp])
    tag(278, 4, [rows_per_strip])
    tag(279, 4, [len(s) for s in strips])
    tag(273, 4, [0] * len(strips))  # patched below
    if predictor:
        tag(317, 3, [2])
    tags.sort()

    type_fmt = {3: 'H', 4: 'I'}
    type_size = {3: 2, 4: 4}
    ifd_off = 8
    n = len(tags)
    extra_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    entries = bytearray(struct.pack(endian + 'H', n))
    strip_off_pos = None
    for tid, typ, vals in tags:
        cnt = len(vals)
        size = type_size[typ] * cnt
        ent = struct.pack(endian + 'HHI', tid, typ, cnt)
        if size <= 4:
            packed = struct.pack(endian + str(cnt) + type_fmt[typ], *vals)
            if tid == 273:
                # entries already holds the 2-byte count; value field
                # sits 8 bytes into this entry
                strip_off_pos = ('inline', ifd_off + len(entries) + 8)
            ent += packed + b'\x00' * (4 - size)
        else:
            if tid == 273:
                strip_off_pos = ('extra', extra_off + len(extra))
            ent += struct.pack(endian + 'I', extra_off + len(extra))
            extra += struct.pack(endian + str(cnt) + type_fmt[typ], *vals)
        entries += ent
    body_off = extra_off + len(extra)
    offs = []
    pos = body_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    blob = bytearray(header + entries + struct.pack(endian + 'I', 0) + extra
                     + b''.join(strips))
    kind, where = strip_off_pos
    packed_offs = struct.pack(endian + str(len(offs)) + 'I', *offs)
    if kind == 'inline':
        blob[where:where + len(packed_offs)] = packed_offs
    else:
        blob[where:where + len(packed_offs)] = packed_offs
    return bytes(blob)
