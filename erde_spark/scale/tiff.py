"""Baseline TIFF decode + fixture encoder, pure numpy/stdlib.

Covers the profile a crawl actually serves: both byte orders, STRIP
and TILED organization (TIFF 6.0 §15 — scanned documents and
satellite-derived imagery routinely ship tiles), grayscale/RGB(A) at
8 OR 16 bits per sample, uncompressed (compression 1), PackBits
(32773), TIFF-LZW (5) and Deflate (8/32946) — the TIFF variant of LZW
is MSB-first with the early-change rule, which is why the GIF LZW
decoder can't be reused verbatim. JPEG-in-TIFF and other exotic
compressions raise ``NotImplementedError`` with a clear message.
Strip/tile, both depths and both orders are cross-validated against
libtiff (tests/test_codec_crossval.py). Reference: TIFF 6.0
specification (Adobe, 1992), sections 7-11 and 15.
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


def _tiff_decompress(chunk: bytes, expected: int, comp: int) -> bytes:
    if comp == 1:
        return chunk[:expected]
    if comp == 32773:
        return _packbits_decode(chunk, expected)
    if comp == 5:
        return _tiff_lzw_decode(chunk, expected)
    if comp in (8, 32946):  # Deflate / legacy Adobe Deflate
        import zlib
        return zlib.decompress(chunk)[:expected]
    raise NotImplementedError(
        f'TIFF compression {comp}: only 1 (none), 5 (LZW), '
        '8/32946 (Deflate), 32773 (PackBits)')


def _undo_predictor2(arr: np.ndarray, h: int, w: int,
                     spp: int) -> np.ndarray:
    """Undo horizontal differencing (predictor 2) per row/sample —
    accumulation wraps at the sample width (mod 256 / mod 65536)."""
    acc = np.uint16 if arr.dtype == np.uint8 else np.uint32
    return (arr.reshape(h, w, spp).cumsum(axis=1, dtype=acc)
            .astype(arr.dtype).reshape(-1))


def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD as (h, w) grayscale or (h, w, samples) array — uint8
    for 8-bit samples, uint16 for 16-bit (scanned documents and
    satellite-derived imagery routinely ship 16-bit and/or TILED
    layouts, so both decode for real; the strip and tile paths share
    the compression/predictor machinery and are cross-validated
    against libtiff in tests/test_codec_crossval.py)."""
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
    if any(b != bps[0] for b in bps) or bps[0] not in (8, 16):
        raise NotImplementedError(
            f'bits-per-sample {bps}: only uniform 8- or 16-bit')
    bits = bps[0]
    ssz = bits // 8
    dtype = np.uint8 if bits == 8 else np.dtype(endian + 'u2')
    predict = t.get(317, (1,))[0] == 2
    tiled = bool(t.get(322) or t.get(323))
    if tiled:
        tw = t.get(322, (0,))[0]
        th = t.get(323, (0,))[0]
        offs, counts = t.get(324), t.get(325)
    else:
        tw = th = None
        offs, counts = t.get(273), t.get(279)
    if not (w and h and offs and counts):
        raise ValueError('TIFF missing required tags (truncated?)')
    rows_per_strip = t.get(278, (h,))[0]
    # a corrupt tag TYPE makes _read_ifd return raw bytes for a tag
    # that must be numeric — reject instead of propagating junk
    numeric = ([w, h, spp, comp, rows_per_strip]
               + ([tw, th] if tiled else [])
               + list(offs) + list(counts) + list(bps))
    if not all(isinstance(v, int) and v >= 0 for v in numeric):
        raise ValueError('corrupt TIFF: non-integer required tag value')
    if tiled:
        if not (tw and th and tw % 16 == 0 and th % 16 == 0):
            raise ValueError(f'corrupt TIFF: tile size {tw}x{th}')
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if len(offs) < across * down:
            raise ValueError('truncated TIFF tile tables')
        # tiles are always FULL tw x th (edge tiles padded); assemble
        # on the padded canvas, crop at the end (TIFF 6.0 §15)
        canvas = np.zeros((down * th, across * tw, spp), dtype=dtype)
        tile_bytes = tw * th * spp * ssz
        for idx in range(across * down):
            chunk = data[offs[idx]:offs[idx] + counts[idx]]
            raw = _tiff_decompress(chunk, tile_bytes, comp)
            if len(raw) < tile_bytes:
                raise ValueError('truncated TIFF tile data')
            tile = np.frombuffer(raw[:tile_bytes], dtype)
            if predict:
                tile = _undo_predictor2(tile, th, tw, spp)
            ty, tx = divmod(idx, across)
            canvas[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw] = \
                tile.reshape(th, tw, spp)
        arr = np.ascontiguousarray(canvas[:h, :w]).reshape(-1)
    else:
        row_bytes = w * spp * ssz
        raw = bytearray()
        for si, (so, sc) in enumerate(zip(offs, counts)):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            raw += _tiff_decompress(data[so:so + sc], nrows * row_bytes,
                                    comp)
        if len(raw) < h * row_bytes:
            raise ValueError('truncated TIFF strip data')
        arr = np.frombuffer(bytes(raw[:h * row_bytes]), dtype)
        if predict:
            arr = _undo_predictor2(arr, h, w, spp)
    arr = arr.astype(arr.dtype.newbyteorder('='), copy=False) \
        .reshape(h, w, spp)
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
                big_endian: bool = False, predictor: bool = False,
                tiled: int | None = None) -> bytes:
    """Single-IFD TIFF fixture encoder: uncompressed, PackBits or LZW,
    strips of 16 rows — or TILED layout when ``tiled`` gives a tile
    edge (multiple of 16, TIFF 6.0 §15; edge tiles padded to full
    size) — optional horizontal-differencing predictor, and 8- or
    16-bit samples (pass a uint16 array for 16-bit)."""
    a = np.asarray(arr)
    bits = 16 if a.dtype == np.uint16 else 8
    a = a.astype(np.uint16 if bits == 16 else np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, spp = a.shape
    endian = '>' if big_endian else '<'
    sample_dt = np.dtype(endian + 'u2') if bits == 16 else np.uint8

    def _diff(block: np.ndarray) -> np.ndarray:
        # horizontal differencing restarts at every ROW OF THE SEGMENT
        # (tile rows in tiled files), matching libtiff
        if not predictor:
            return block
        d = block.astype(np.int32)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        return (d % (1 << bits)).astype(block.dtype)

    if not tiled:
        a = _diff(a)

    def _compress(block: bytes) -> bytes:
        if compression == 32773:
            return _packbits_encode(block)
        if compression == 5:
            return _tiff_lzw_encode(block)
        if compression != 1:
            raise ValueError(
                'fixture encoder: compression 1, 5 or 32773 only')
        return block

    if tiled:
        if tiled % 16:
            raise ValueError('tile edge must be a multiple of 16')
        across = (w + tiled - 1) // tiled
        down = (h + tiled - 1) // tiled
        padded = np.zeros((down * tiled, across * tiled, spp), a.dtype)
        padded[:h, :w] = a
        strips = []
        for ty in range(down):
            for tx in range(across):
                tile = _diff(padded[ty * tiled:(ty + 1) * tiled,
                                    tx * tiled:(tx + 1) * tiled])
                strips.append(_compress(
                    tile.astype(sample_dt, copy=False).tobytes()))
    else:
        rows_per_strip = 16
        strips = [
            _compress(a[y0:y0 + rows_per_strip]
                      .astype(sample_dt, copy=False).tobytes())
            for y0 in range(0, h, rows_per_strip)]

    header = struct.pack(endian + '2sHI', b'II' if not big_endian else b'MM',
                         42, 8)
    tags = []

    def tag(tid, typ, vals):
        tags.append((tid, typ, vals))

    tag(256, 4, [w])
    tag(257, 4, [h])
    tag(258, 3, [bits] * spp)
    tag(259, 3, [compression])
    tag(262, 3, [1 if spp == 1 else 2])  # photometric
    tag(277, 3, [spp])
    if tiled:
        tag(322, 4, [tiled])
        tag(323, 4, [tiled])
        tag(325, 4, [len(s) for s in strips])
        tag(324, 4, [0] * len(strips))  # patched below
    else:
        tag(278, 4, [16])
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
            if tid in (273, 324):
                # entries already holds the 2-byte count; value field
                # sits 8 bytes into this entry
                strip_off_pos = ('inline', ifd_off + len(entries) + 8)
            ent += packed + b'\x00' * (4 - size)
        else:
            if tid in (273, 324):
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
