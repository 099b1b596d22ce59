"""WebP lossless (VP8L) decode + fixture encoder, pure numpy/stdlib.

Implements the VP8L bitstream (Google "WebP Lossless Bitstream
Specification", 2012-2023): LSB-first bit reading, simple and
normal (code-length-coded) canonical Huffman codes, meta-Huffman
spatial partitioning, the color cache, LZ77 backward references with
the 2D short-distance map, and all four inverse transforms
(predictor, color, subtract-green, color-indexing incl. sub-byte
pixel packing). Covers every lossless .webp a crawl can serve; LOSSY
WebP (VP8 chunk) is a different codec (bool coder + DCT) and routes to
the system libwebp via :mod:`erde_spark.scale.webp_native`, raising
``NotImplementedError`` only when that library cannot be dlopen'd.

The encoder exists to make real fixtures and deliberately reaches
every decoder path: normal and single-symbol Huffman codes, the color
cache, LZ77 distance-1 runs, forward predictor/color/subtract-green
transforms (random per-tile modes), palette packing at every sub-byte
width, and a two-group meta-Huffman split — each round-tripped
bit-exactly in tests/test_webp.py.
"""

from __future__ import annotations

import struct

import numpy as np


def is_webp(data: bytes) -> bool:
    return (len(data) >= 16 and data[:4] == b'RIFF' and data[8:12] == b'WEBP')


# --------------------------------------------------------------- bit io


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


# ---------------------------------------------------------- huffman


class _Huffman:
    """Canonical Huffman decoder from code lengths (VP8L ordering)."""

    def __init__(self, lengths):
        self.map: dict[tuple[int, int], int] = {}
        self.single = None
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        code = 0
        prev_len = 0
        for length, sym in sorted(nz):
            code <<= (length - prev_len)
            self.map[(length, code)] = sym
            code += 1
            prev_len = length

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError('corrupt VP8L huffman stream')


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    simple = br.read(1)
    if simple:
        n = br.read(1) + 1
        first_8 = br.read(1)
        syms = [br.read(8 if first_8 else 1)]
        if n == 2:
            syms.append(br.read(8))
        lengths = [0] * alphabet_size
        for s in syms:
            lengths[s] = 1
        # n == 1 leaves a single nonzero length -> zero-bit code
        return _Huffman(lengths)
    n_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(n_codes):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Huffman(cl_lengths)
    # max_symbol handling
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huffman(lengths)


def _write_code_lengths(bw: _BitWriter, lengths):
    """Normal-code header. The 19-symbol code-length code must be a
    COMPLETE Huffman code — strict decoders (libwebp) reject
    under-subscribed tables, and the old uniform-length shortcut was
    incomplete whenever the used-symbol count was not a power of two
    (caught by cross-validating against the system libwebp)."""
    freqs = [0] * 19
    for l in lengths:
        freqs[l] += 1
    cl_lengths = _length_limited_lengths(freqs, max_len=7)
    bw.write(0, 1)                      # not simple
    bw.write(19 - 4, 4)                 # emit all 19 CLC slots
    for i in range(19):
        bw.write(cl_lengths[_CLC_ORDER[i]], 3)
    clc = _canonical_codes(cl_lengths)
    bw.write(0, 1)                      # no max_symbol trick
    single = sum(1 for l in cl_lengths if l) == 1
    for l in lengths:
        if single:
            continue  # single-leaf CLC: zero-bit code
        c, n = clc[l]
        # canonical codes are MSB-first on the wire
        for i in range(n - 1, -1, -1):
            bw.write((c >> i) & 1, 1)


def _canonical_codes(lengths):
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    codes = {}
    code = 0
    prev_len = 0
    for length, sym in sorted(nz):
        code <<= (length - prev_len)
        codes[sym] = (code, length)
        code += 1
        prev_len = length
    return codes


def _length_limited_lengths(freqs, max_len: int = 15):
    """Package-merge-lite: plain Huffman then clamp (fixtures only)."""
    import heapq
    items = [(f, s) for s, f in enumerate(freqs) if f > 0]
    if not items:
        return [0] * len(freqs)
    if len(items) == 1:
        out = [0] * len(freqs)
        out[items[0][1]] = 1
        return out
    heap = [(f, [s]) for f, s in items]
    heapq.heapify(heap)
    depth = {s: 0 for _, s in items}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    out = [0] * len(freqs)
    for s, d in depth.items():
        out[s] = min(d, max_len)
    # clamping can break Kraft; repair to EXACT completeness — strict
    # decoders (libwebp) reject both over- and under-subscribed codes
    def kraft():
        return sum(2.0 ** -l for l in out if l)
    while kraft() > 1.0:
        # lengthen the currently-shortest nonzero code
        s = min((x for x in range(len(out)) if out[x]), key=lambda x: out[x])
        out[s] += 1
    while kraft() < 1.0 - 1e-12:
        # absorb the slack greedily: shortening a symbol from l to l-1
        # adds 2^-l; take the largest addition that fits
        deficit = 1.0 - kraft()
        for l in range(2, max_len + 1):  # never shorten 1 -> 0 (drop)
            if 2.0 ** -l <= deficit + 1e-12:
                cands = [x for x in range(len(out)) if out[x] == l]
                if cands:
                    out[cands[-1]] -= 1
                    break
        else:
            break  # no representable repair; leave as-is
    return out


# ---------------------------------------------------------- decode core

_NUM_LITERAL = 256 + 24  # green alphabet before cache: literals + lengths


def _lz77_extra(br: _BitReader, prefix: int) -> int:
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


# short-distance map: the spec's normative 120-entry (dx, dy) table.
# A distance-sorted generation reproduces only the first 96 entries —
# the tail breaks the sort pattern (dy caps at 7, dx reaches +8 with no
# negative mirror), so the table is spelled out verbatim. Verified
# entry-by-entry against the system libwebp by decoding hand-built
# one-copy streams for every code 1..120 (tests/test_webp.py).
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
    (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
    (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
    (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
    (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_code_to_dist(w: int, code: int) -> int:
    if code > 120:
        return code - 120
    xx, yy = _DIST_MAP[code - 1]
    d = xx + yy * w
    return max(d, 1)


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          allow_meta: bool, allow_cache: bool):
    """Decode one spatially-coded image (the main image or a transform
    sub-image) into an (h, w, 4) uint8 ARGB array."""
    cache_bits = 0
    if allow_cache and br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f'bad color-cache bits {cache_bits}')
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh, False, True)
        # group index lives in red<<8 | green
        idx = (meta[:, :, 1].astype(np.int32) << 8) | meta[:, :, 2]
        n_groups = int(idx.max()) + 1
        meta = idx
    groups = []
    green_size = _NUM_LITERAL + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        g = _read_code(br, green_size)
        r = _read_code(br, 256)
        b = _read_code(br, 256)
        a = _read_code(br, 256)
        d = _read_code(br, 40)
        groups.append((g, r, b, a, d))

    out = np.zeros((h * w, 4), np.uint8)  # ARGB
    pos = 0
    total = h * w
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            cg, cr, cb, ca, cd = groups[gi]
        else:
            cg, cr, cb, ca, cd = groups[0]
        s = cg.read(br)
        if s < 256:
            g = s
            r = cr.read(br)
            b = cb.read(br)
            a = ca.read(br)
            out[pos] = (a, r, g, b)
            if cache is not None:
                argb = (a << 24) | (r << 16) | (g << 8) | b
                cache[(argb * 0x1e35a7bd) >> (32 - cache_bits) & ((1 << cache_bits) - 1)] = argb
            pos += 1
        elif s < _NUM_LITERAL:
            length = _lz77_extra(br, s - 256)
            dcode = cd.read(br)
            dist = _plane_code_to_dist(w, _lz77_extra(br, dcode))
            if dist > pos:
                raise ValueError('LZ77 distance before image start')
            for _ in range(length):
                if pos >= total:
                    break
                out[pos] = out[pos - dist]
                if cache is not None:
                    a_, r_, g_, b_ = out[pos]
                    argb = (int(a_) << 24) | (int(r_) << 16) | (int(g_) << 8) | int(b_)
                    cache[(argb * 0x1e35a7bd) >> (32 - cache_bits) & ((1 << cache_bits) - 1)] = argb
                pos += 1
        else:
            argb = cache[s - _NUM_LITERAL]
            out[pos] = ((argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                        (argb >> 8) & 0xFF, argb & 0xFF)
            pos += 1
    return out.reshape(h, w, 4)


# ------------------------------------------------------- transforms


def _inv_subtract_green(img: np.ndarray):
    g = img[:, :, 2].astype(np.uint16)
    img[:, :, 1] = ((img[:, :, 1] + g) & 0xFF).astype(np.uint8)
    img[:, :, 3] = ((img[:, :, 3] + g) & 0xFF).astype(np.uint8)


def _avg2(a, b):
    return (a.astype(np.uint16) + b.astype(np.uint16)) // 2


def _inv_predictor(img: np.ndarray, pred_img: np.ndarray, bits: int):
    h, w, _ = img.shape
    modes = pred_img[:, :, 2]  # mode lives in the green channel
    out = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = out[y, x - 1]
            elif x == 0:
                pred = out[y - 1, x]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # TR for the rightmost pixel wraps to index (y-1)*w + w
                # = row y column 0 (the already-decoded row start)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = (((L + TR) // 2) + T) // 2
                elif mode == 6:
                    pred = (L + TL) // 2
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 8:
                    pred = (TL + T) // 2
                elif mode == 9:
                    pred = (T + TR) // 2
                elif mode == 10:
                    pred = (((L + TL) // 2) + ((T + TR) // 2)) // 2
                elif mode == 11:  # select
                    # p = L+T-TL; pL = sum|p-L| = sum|T-TL|, pT = sum|p-T|
                    pL = np.abs(T - TL).sum()
                    pT = np.abs(L - TL).sum()
                    pred = L if pL < pT else T
                elif mode == 12:  # clamp add subtract full
                    pred = np.clip(L + T - TL, 0, 255)
                elif mode == 13:  # clamp add subtract half
                    half = (L + T) // 2
                    delta = half - TL
                    # C-style truncating /2, per libwebp
                    pred = np.clip(half + np.fix(delta / 2).astype(np.int32),
                                   0, 255)
                else:
                    raise ValueError(f'bad predictor mode {mode}')
            out[y, x] = (out[y, x] + pred) & 0xFF
    img[:] = out.astype(np.uint8)


def _inv_color_transform(img: np.ndarray, cimg: np.ndarray, bits: int):
    h, w, _ = img.shape

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            cx = cimg[y >> bits, x >> bits]
            g2r = s8(int(cx[3]))     # blue channel holds green_to_red
            g2b = s8(int(cx[2]))     # green holds green_to_blue
            r2b = s8(int(cx[1]))     # red holds red_to_blue
            a, r, g, b = (int(v) for v in img[y, x])
            r = (r + ((g2r * s8(g)) >> 5)) & 0xFF
            b = (b + ((g2b * s8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * s8(r)) >> 5)) & 0xFF
            img[y, x, 1] = r
            img[y, x, 3] = b


def _inv_color_indexing(img: np.ndarray, palette: np.ndarray,
                        orig_w: int) -> np.ndarray:
    n = len(palette)
    if n <= 2:
        width_bits = 3
    elif n <= 4:
        width_bits = 2
    elif n <= 16:
        width_bits = 1
    else:
        width_bits = 0
    if width_bits == 0:
        idx = img[:, :, 2]
        return palette[np.minimum(idx, n - 1)][:, :orig_w]
    pixels_per_byte = 1 << width_bits
    bits = 8 >> width_bits
    h, packed_w, _ = img.shape
    out = np.zeros((h, packed_w * pixels_per_byte, 4), np.uint8)
    mask = (1 << bits) - 1
    for k in range(pixels_per_byte):
        vals = (img[:, :, 2] >> (k * bits)) & mask
        out[:, k::pixels_per_byte] = palette[np.minimum(vals, n - 1)]
    return out[:, :orig_w]


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a lossless WebP to (h, w, 4) uint8 RGBA."""
    if not is_webp(data):
        raise ValueError('not a WebP (RIFF/WEBP signature missing)')
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack('<I', data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b'VP8L':
            payload = body
            break
        if fourcc == b'VP8 ':
            # lossy VP8: bind the system libwebp (see webp_native) —
            # the bool-coder/DCT codec's normative probability tables
            # are not re-typed here
            from erde_spark.scale.webp_native import (available,
                                                      decode_webp_native)
            if available():
                return decode_webp_native(data)
            raise NotImplementedError(
                'lossy WebP (VP8) decodes via the system libwebp, which '
                'this process cannot dlopen; only lossless (VP8L) '
                'decodes pure-Python')
        if fourcc == b'VP8X':
            pos += 8 + size + (size & 1)
            continue
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError('no VP8L chunk found')
    if payload[0] != 0x2F:
        raise ValueError('bad VP8L signature byte')
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)   # alpha hint
    if br.read(3) != 0:
        raise ValueError('unknown VP8L version')

    transforms = []
    cur_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 0:      # predictor
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            timg = _decode_entropy_image(br, tw, th, False, True)
            transforms.append(('pred', bits, timg))
        elif ttype == 1:    # color
            bits = br.read(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            timg = _decode_entropy_image(br, tw, th, False, True)
            transforms.append(('color', bits, timg))
        elif ttype == 2:    # subtract green
            transforms.append(('sgreen', None, None))
        else:               # color indexing
            n = br.read(8) + 1
            pimg = _decode_entropy_image(br, n, 1, False, True)
            pal = pimg[0].astype(np.uint16)
            # palette entries are delta-coded
            pal = np.cumsum(pal, axis=0, dtype=np.uint16) & 0xFF
            pal = pal.astype(np.uint8)
            if n <= 2:
                cur_w = (cur_w + 7) >> 3
            elif n <= 4:
                cur_w = (cur_w + 3) >> 2
            elif n <= 16:
                cur_w = (cur_w + 1) >> 1
            transforms.append(('cindex', n, pal))

    img = _decode_entropy_image(br, cur_w, h, True, True)
    for kind, p1, p2 in reversed(transforms):
        if kind == 'cindex':
            img = _inv_color_indexing(img, p2, w)
        elif kind == 'sgreen':
            _inv_subtract_green(img)
        elif kind == 'color':
            _inv_color_transform(img, p2, p1)
        elif kind == 'pred':
            _inv_predictor(img, p2, p1)
    # ARGB -> RGBA
    return img[:, :, [1, 2, 3, 0]]


# --------------------------------------------------------------- encode


def _lz77_prefix(v: int):
    """(prefix_code, n_extra_bits, extra_value) for a length/distance
    value — the inverse of :func:`_lz77_extra`."""
    if v <= 4:
        return v - 1, 0, 0
    for prefix in range(4, 40):
        extra = (prefix - 2) >> 1
        offset = (2 + (prefix & 1)) << extra
        lo = offset + 1
        hi = offset + (1 << extra)
        if lo <= v <= hi:
            return prefix, extra, v - lo
    raise ValueError(f'value {v} out of LZ77 range')


_RLE_DIST_CODE = _DIST_MAP.index((1, 0)) + 1   # plane code for (dx=1, dy=0)


def _tokenize(A, R, G, B, w, h, cache_bits: int, rle: bool):
    """Token stream for one ARGB image: ('lit', a, r, g, b) /
    ('cache', slot) / ('copy', length, plane_dist_code). RLE emits
    distance-1 runs (the (1,0) short-distance plane code), which walks
    the same LZ77 copy loop real encoders use."""
    n = w * h
    toks = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i = 0
    while i < n:
        if rle and i > 0:
            run = 0
            j = i
            while (j < n and A[j] == A[i - 1] and R[j] == R[i - 1]
                   and G[j] == G[i - 1] and B[j] == B[i - 1]):
                run += 1
                j += 1
        else:
            run = 0
        if run >= 4:
            toks.append(('copy', run, _RLE_DIST_CODE))
            if cache is not None:
                argb = ((int(A[i - 1]) << 24) | (int(R[i - 1]) << 16)
                        | (int(G[i - 1]) << 8) | int(B[i - 1]))
                slot = ((argb * 0x1e35a7bd) >> (32 - cache_bits)
                        & ((1 << cache_bits) - 1))
                cache[slot] = argb
            i += run
            continue
        argb = ((int(A[i]) << 24) | (int(R[i]) << 16)
                | (int(G[i]) << 8) | int(B[i]))
        if cache is not None:
            slot = ((argb * 0x1e35a7bd) >> (32 - cache_bits)
                    & ((1 << cache_bits) - 1))
            if cache[slot] == argb:
                toks.append(('cache', slot))
                i += 1
                continue
            cache[slot] = argb
        toks.append(('lit', int(A[i]), int(R[i]), int(G[i]), int(B[i])))
        i += 1
    return toks


def _emit_entropy_image(bw: _BitWriter, A, R, G, B, w: int, h: int,
                        cache_bits: int = 0, rle: bool = False,
                        level0: bool = False, meta=None):
    """Write one spatially-coded image: cache header, meta header
    (level0 only), per-group code headers, symbol stream. ``meta`` is
    (meta_bits, group_of_tile (th, tw) int array) and implies level0."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    n_groups = 1
    meta_bits = 0
    gidx = None
    if level0:
        if meta is not None:
            meta_bits, gidx = meta
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            th, tw = gidx.shape
            # meta image: group index in (r<<8)|green -> green holds it
            z = np.zeros(th * tw, np.int32)
            _emit_entropy_image(bw, z, z, gidx.ravel().astype(np.int32),
                                z, tw, th)
            n_groups = int(gidx.max()) + 1
        else:
            bw.write(0, 1)

    toks = _tokenize(A, R, G, B, w, h, cache_bits, rle)

    def group_of(pos: int) -> int:
        if gidx is None:
            return 0
        y, x = divmod(pos, w)
        return int(gidx[y >> meta_bits, x >> meta_bits])

    green_size = _NUM_LITERAL + ((1 << cache_bits) if cache_bits else 0)
    gf = [[0] * green_size for _ in range(n_groups)]
    rf = [[0] * 256 for _ in range(n_groups)]
    bf = [[0] * 256 for _ in range(n_groups)]
    af = [[0] * 256 for _ in range(n_groups)]
    df = [[0] * 40 for _ in range(n_groups)]
    pos = 0
    for t in toks:
        g = group_of(pos)
        if t[0] == 'lit':
            _, a, r, gg, b = t
            gf[g][gg] += 1
            rf[g][r] += 1
            bf[g][b] += 1
            af[g][a] += 1
            pos += 1
        elif t[0] == 'cache':
            gf[g][_NUM_LITERAL + t[1]] += 1
            pos += 1
        else:
            _, length, dcode = t
            lp, _, _ = _lz77_prefix(length)
            gf[g][256 + lp] += 1
            dp, _, _ = _lz77_prefix(dcode)
            df[g][dp] += 1
            pos += length
    group_codes = []
    for g in range(n_groups):
        lens = []
        for f, size in ((gf[g], green_size), (rf[g], 256), (bf[g], 256),
                        (af[g], 256), (df[g], 40)):
            ll = _length_limited_lengths(f)
            if not any(ll):
                ll[0] = 1  # unused tree still needs one symbol
            lens.append(ll)
            _write_code_lengths(bw, ll)
        group_codes.append([( _canonical_codes(ll),
                              sum(1 for x in ll if x) == 1) for ll in lens])

    def emit(codes_single, sym):
        codes, single = codes_single
        if single:
            return
        c, nb = codes[sym]
        for i in range(nb - 1, -1, -1):
            bw.write((c >> i) & 1, 1)

    pos = 0
    for t in toks:
        gc5 = group_codes[group_of(pos)]
        if t[0] == 'lit':
            _, a, r, gg, b = t
            emit(gc5[0], gg)
            emit(gc5[1], r)
            emit(gc5[2], b)
            emit(gc5[3], a)
            pos += 1
        elif t[0] == 'cache':
            emit(gc5[0], _NUM_LITERAL + t[1])
            pos += 1
        else:
            _, length, dcode = t
            lp, le, lv = _lz77_prefix(length)
            emit(gc5[0], 256 + lp)
            bw.write(lv, le)
            dp, de, dv = _lz77_prefix(dcode)
            emit(gc5[4], dp)
            bw.write(dv, de)
            pos += length


def _fwd_predictor(a: np.ndarray, bits: int, modes: np.ndarray) -> np.ndarray:
    """Forward predictor transform mirroring :func:`_inv_predictor`
    exactly (residual = pixel - prediction-from-ORIGINAL-neighbors)."""
    h, w, _ = a.shape
    src = a.astype(np.int32)
    out = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int32)
            elif y == 0:
                pred = src[y, x - 1]
            elif x == 0:
                pred = src[y - 1, x]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = src[y, x - 1]
                T = src[y - 1, x]
                TL = src[y - 1, x - 1]
                TR = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                if mode == 0:
                    pred = np.array([255, 0, 0, 0], np.int32)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = (((L + TR) // 2) + T) // 2
                elif mode == 6:
                    pred = (L + TL) // 2
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 8:
                    pred = (TL + T) // 2
                elif mode == 9:
                    pred = (T + TR) // 2
                elif mode == 10:
                    pred = (((L + TL) // 2) + ((T + TR) // 2)) // 2
                elif mode == 11:
                    pL = np.abs(T - TL).sum()
                    pT = np.abs(L - TL).sum()
                    pred = L if pL < pT else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    half = (L + T) // 2
                    delta = half - TL
                    pred = np.clip(half + np.fix(delta / 2).astype(np.int32),
                                   0, 255)
            out[y, x] = (src[y, x] - pred) & 0xFF
    return out.astype(np.uint8)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _fwd_color_transform(a: np.ndarray, bits: int, cte: np.ndarray) -> np.ndarray:
    """Forward color transform (ARGB layout) mirroring
    :func:`_inv_color_transform`: subtract the deltas the decoder adds,
    with red-to-blue applied against the ORIGINAL red."""
    h, w, _ = a.shape
    out = a.astype(np.int32)
    for y in range(h):
        for x in range(w):
            cx = cte[y >> bits, x >> bits]
            g2r = _s8(int(cx[3]))
            g2b = _s8(int(cx[2]))
            r2b = _s8(int(cx[1]))
            aa, r, g, b = (int(v) for v in out[y, x])
            b = (b - ((g2b * _s8(g)) >> 5) - ((r2b * _s8(r)) >> 5)) & 0xFF
            r = (r - ((g2r * _s8(g)) >> 5)) & 0xFF
            out[y, x, 1] = r
            out[y, x, 3] = b
    return out.astype(np.uint8)


def encode_webp(arr: np.ndarray, subtract_green: bool = False,
                cache_bits: int = 0, rle: bool = False,
                predictor_bits: int = 0, color_bits: int = 0,
                palette: bool = False, meta_split: bool = False,
                seed: int = 0) -> bytes:
    """VP8L encoder for fixtures — covers every decoder path: normal
    and single-symbol Huffman codes, color cache, LZ77 distance-1 runs
    (``rle``), per-tile predictor and color transforms (random modes /
    deltas, seeded), subtract-green, palette (color-indexing incl.
    sub-byte packing) and a two-group meta-Huffman split. Palette
    excludes the pixel-transform options (matching how real encoders
    use it). Accepts (h, w, 3) RGB or (h, w, 4) RGBA uint8."""
    a = np.asarray(arr, np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError('need (h, w, 3|4) uint8')
    h, w, ch = a.shape
    if ch == 3:
        a = np.dstack([a, np.full((h, w), 255, np.uint8)])
    argb = a[:, :, [3, 0, 1, 2]]  # ARGB planes image
    if palette and (subtract_green or predictor_bits or color_bits):
        raise ValueError('palette excludes pixel transforms')

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if ch == 4 else 0, 1)
    bw.write(0, 3)

    rng = np.random.RandomState(seed)
    cur_w = w
    if predictor_bits:
        bits = predictor_bits
        tw, th = ((w + (1 << bits) - 1) >> bits, (h + (1 << bits) - 1) >> bits)
        modes = rng.randint(0, 14, size=(th, tw)).astype(np.int32)
        argb = _fwd_predictor(argb, bits, modes)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        z = np.zeros(th * tw, np.int32)
        _emit_entropy_image(bw, z, z, modes.ravel(), z, tw, th)
    if color_bits:
        bits = color_bits
        tw, th = ((w + (1 << bits) - 1) >> bits, (h + (1 << bits) - 1) >> bits)
        cte = np.zeros((th, tw, 4), np.uint8)
        cte[:, :, 1] = rng.randint(0, 256, (th, tw))  # red_to_blue
        cte[:, :, 2] = rng.randint(0, 256, (th, tw))  # green_to_blue
        cte[:, :, 3] = rng.randint(0, 256, (th, tw))  # green_to_red
        argb = _fwd_color_transform(argb, bits, cte)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        _emit_entropy_image(bw, cte[:, :, 0].ravel().astype(np.int32),
                            cte[:, :, 1].ravel().astype(np.int32),
                            cte[:, :, 2].ravel().astype(np.int32),
                            cte[:, :, 3].ravel().astype(np.int32), tw, th)
    if subtract_green:
        g = argb[:, :, 2].astype(np.int32)
        argb = argb.astype(np.int32)
        argb[:, :, 1] = (argb[:, :, 1] - g) & 0xFF
        argb[:, :, 3] = (argb[:, :, 3] - g) & 0xFF
        argb = argb.astype(np.uint8)
        bw.write(1, 1)
        bw.write(2, 2)
    if palette:
        flat = argb.reshape(-1, 4)
        pal, inverse = np.unique(flat, axis=0, return_inverse=True)
        n = len(pal)
        if n > 256:
            raise ValueError('palette needs <= 256 distinct colors')
        deltas = np.zeros_like(pal)
        deltas[0] = pal[0]
        deltas[1:] = (pal[1:].astype(np.int16)
                      - pal[:-1].astype(np.int16)) % 256
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        _emit_entropy_image(bw, deltas[:, 0].astype(np.int32),
                            deltas[:, 1].astype(np.int32),
                            deltas[:, 2].astype(np.int32),
                            deltas[:, 3].astype(np.int32), n, 1)
        idx = inverse.astype(np.int32).reshape(h, w)
        if n <= 2:
            width_bits = 3
        elif n <= 4:
            width_bits = 2
        elif n <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            nb = 8 >> width_bits
            cur_w = (w + per - 1) // per
            packed = np.zeros((h, cur_w), np.int32)
            for k in range(per):
                cols = idx[:, k::per]
                packed[:, :cols.shape[1]] |= cols << (k * nb)
            gr = packed
        else:
            cur_w = w
            gr = idx
        z = np.zeros(h * cur_w, np.int32)
        aa = np.full(h * cur_w, 255, np.int32)
        argb_planes = (aa, z, gr.ravel(), z)
    else:
        argb_planes = (argb[:, :, 0].ravel().astype(np.int32),
                       argb[:, :, 1].ravel().astype(np.int32),
                       argb[:, :, 2].ravel().astype(np.int32),
                       argb[:, :, 3].ravel().astype(np.int32))
    bw.write(0, 1)          # no more transforms

    meta = None
    if meta_split:
        mb = 2
        tw, th = ((cur_w + 3) >> 2, (h + 3) >> 2)
        gidx = np.zeros((th, tw), np.int32)
        gidx[:, tw // 2:] = 1
        if gidx.max() == 0:
            gidx[:, -1:] = 1
        meta = (mb, gidx)
    A_, R_, G_, B_ = argb_planes
    _emit_entropy_image(bw, A_, R_, G_, B_, cur_w, h, cache_bits, rle,
                        level0=True, meta=meta)

    payload = b'\x2f' + bw.bytes()
    chunk = b'VP8L' + struct.pack('<I', len(payload)) + payload
    if len(payload) & 1:
        chunk += b'\x00'
    return b'RIFF' + struct.pack('<I', 4 + len(chunk)) + b'WEBP' + chunk
