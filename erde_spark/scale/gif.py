"""GIF (87a/89a) decode + fixture encoder, pure numpy/stdlib.

Covers what a web crawl actually contains: global/local color tables,
LZW image data with variable code widths, interlaced frames, GCE
transparency (-> RGBA), and multi-frame files (first frame decoded;
``gif_frame_count`` reports the rest — animation curation usually wants
the count and one representative frame, not a full decode). Reference:
GIF89a specification (W3C/CompuServe, 1990).

The encoder exists to make real test fixtures: it emits spec-valid LZW
(actual string-table compression, clear-code resets on table overflow),
optional interlace and transparency, so decode tests exercise the same
paths crawl bytes will.
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(data: bytes) -> bool:
    return data[:6] in (b'GIF87a', b'GIF89a')


# ---------------------------------------------------------------- decode


def _lzw_decode(min_code: int, data: bytes, n_expected: int) -> list[int]:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = [[i] for i in range(clear)] + [None, None]
    width = min_code + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [None, None]
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + [entry[0]])
            else:  # the KwKwK case
                entry = prev + [prev[0]]
                table.append(entry)
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_expected:
                return out
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for row in range(start, h, step):
            out[row] = idx[src]
            src += 1
    return out


def _skip_subblocks(data: bytes, pos: int) -> int:
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
    return pos


def decode_gif(data: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB — or (h, w, 4) RGBA when the
    frame's graphic control extension declares a transparent index."""
    if not is_gif(data):
        raise ValueError('not a GIF (bad signature)')
    if len(data) < 13:
        raise ValueError('truncated GIF header')
    w, h, flags, _bg, _ar = struct.unpack('<HHBBB', data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:
                gflags = data[pos + 3]
                if gflags & 1:
                    transparent = data[pos + 6]
            pos = _skip_subblocks(data, pos + 2)
        elif b == 0x2C:  # image descriptor
            il, it, iw, ih, iflags = struct.unpack('<HHHHB', data[pos + 1:pos + 10])
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError('GIF frame without any color table')
            min_code = data[pos]
            pos += 1
            chunks = []
            while pos < len(data):
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                chunks.append(data[pos:pos + n])
                pos += n
            pix = _lzw_decode(min_code, b''.join(chunks), iw * ih)
            if len(pix) < iw * ih:
                raise ValueError('truncated GIF image data')
            idx = np.array(pix[:iw * ih], np.uint8).reshape(ih, iw)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            safe = np.minimum(idx, len(ct) - 1)
            rgb = ct[safe]
            if transparent is not None:
                alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                return np.dstack([rgb, alpha])
            return rgb
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f'unknown GIF block 0x{b:02x} at {pos}')
    raise ValueError('GIF contains no image frame')


def gif_frame_count(data: bytes) -> int:
    """Number of image frames (animation length) without decoding any."""
    if not is_gif(data):
        raise ValueError('not a GIF (bad signature)')
    flags = data[10]
    pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
    count = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            pos = _skip_subblocks(data, pos + 2)
        elif b == 0x2C:
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 7))
            pos += 1  # LZW min code size
            pos = _skip_subblocks(data, pos)
            count += 1
        else:
            break
    return count


# ---------------------------------------------------------------- encode


def _lzw_encode(min_code: int, indices: list[int]) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    cur: tuple = ()
    for px in indices:
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = (px,)
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False,
               transparent: int | None = None) -> bytes:
    """Single-frame GIF89a from an (h, w) palette-index array plus an
    implied 256-entry grayscale-ramp palette, or an (h, w, 3) RGB array
    quantized by exact-color lookup (must use <= 256 distinct colors —
    it's a fixture encoder, not a dithering quantizer)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        idx = a.astype(np.uint8)
    else:
        colors, inverse = np.unique(a.reshape(-1, 3), axis=0,
                                    return_inverse=True)
        if len(colors) > 256:
            raise ValueError('fixture encoder needs <= 256 distinct colors')
        palette = np.zeros((256, 3), np.uint8)
        palette[:len(colors)] = colors
        idx = inverse.astype(np.uint8).reshape(a.shape[:2])
    h, w = idx.shape
    out = bytearray(b'GIF89a')
    out += struct.pack('<HHBBB', w, h, 0x80 | 7, 0, 0)  # 256-entry GCT
    out += palette.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 1, 0, 0, transparent, 0])
    iflags = 0x40 if interlace else 0
    out += struct.pack('<BHHHHB', 0x2C, 0, 0, w, h, iflags)
    rows = idx
    if interlace:
        order = [r for start, step in _INTERLACE_PASSES
                 for r in range(start, h, step)]
        rows = idx[order]
    out.append(8)  # LZW min code size
    payload = _lzw_encode(8, rows.ravel().tolist())
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, 0x3B])
    return bytes(out)
