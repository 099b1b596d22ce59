"""Baseline + progressive JPEG (JFIF) codec in numpy — no codec libraries.

Implements the DCT processes of the public ITU-T T.81 spec (ISO/IEC
10918-1): segment parsing, Huffman entropy coding, zigzag,
dequantization, 8x8 type-III DCT, chroma upsampling and the JFIF
YCbCr<->RGB conversion. Standard quantization and Huffman tables are the
spec's own Annex K examples. Restart markers (DRI/RSTn) are honored.

Two decode paths:

* baseline-sequential single interleaved scan (SOF0/1) — the common
  web profile, decoded block-at-a-time with immediate IDCT;
* a coefficient-domain multi-scan driver for PROGRESSIVE (SOF2)
  streams — spectral selection AND successive approximation per T.81
  Annex G (DC first/refine, AC first with EOB runs, AC refinement with
  correction bits) — which also decodes non-interleaved multi-scan
  sequential streams. Progressive is a double-digit share of web-crawl
  JPEGs, so a curation pipeline must read it.

Arithmetic-coded (SOF9+), lossless (SOF3) and hierarchical processes
raise a clear ``NotImplementedError``.

The encoders exist so tests and pipelines can synthesize REAL JPEG
bytes — baseline (grayscale or color, optional 4:2:0 subsampling,
DRI/RSTn) and progressive with the libjpeg-shaped scan script
(interleaved DC, per-component spectral bands, successive-approximation
refinement passes) — without external fixtures. A fully-refined
progressive stream reconstructs the SAME quantized coefficients as the
baseline encoding, so decode(progressive) == decode(baseline) exactly.
"""

from __future__ import annotations

import math

import numpy as np

# -- constants (ITU-T T.81 Annex K) --------------------------------------

#: zigzag scan order: index i of the scan -> position in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# (BITS counts per code length 1..16, HUFFVAL symbol list)
_HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
_HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: spatial = C.T @ coeffs @ C
_DCT_C = np.array([[math.sqrt((1 if k == 0 else 2) / 8)
                    * math.cos((2 * n + 1) * k * math.pi / 16)
                    for n in range(8)] for k in range(8)])


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b'\xff\xd8'


# -- Huffman machinery ---------------------------------------------------

def _build_codes(bits, vals):
    """T.81 Annex C code assignment: {symbol: (code, length)}."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits, vals):
    """{(length, code): symbol} for bit-at-a-time decoding."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.
    Holds at most one byte of lookahead, so ``align()`` leaves ``pos``
    exactly at the next unread byte (where a RSTn marker sits)."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos = data, pos
        self.buf, self.nbits = 0, 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError('truncated JPEG stream (entropy data ends '
                             'before the scan completes)')
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError('truncated JPEG stream (0xFF at end of '
                                 'data with no marker byte)')
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.buf = b
        self.nbits = 8

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.nbits == 0:
                self._fill()
            take = min(n, self.nbits)
            self.nbits -= take
            v = (v << take) | ((self.buf >> self.nbits) & ((1 << take) - 1))
            n -= take
        return v

    def decode(self, table) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError('invalid Huffman code in entropy stream')

    def align(self):
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits to the signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# -- decoder -------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF -> uint8 array, (H, W) grayscale or (H, W, 3) RGB.
    Baseline-sequential (SOF0/1, single interleaved scan) decodes
    block-at-a-time; progressive (SOF2) and non-interleaved multi-scan
    sequential streams accumulate coefficients across scans and IDCT at
    EOI. Raises ``NotImplementedError`` for arithmetic / lossless /
    hierarchical processes and 12-bit precision."""
    if not is_jpeg(data):
        raise ValueError('not a JPEG stream (missing SOI)')
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    coefs = None
    restart = 0
    i = 2
    while i < len(data) - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        # runs of 0xFF before a marker are legal fill bytes (T.81 B.1.1.2)
        while i < len(data) - 1 and data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        i += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[i:i + 2], 'big')
        if ln < 2:  # corrupt segment length — resync byte-wise
            continue
        seg = data[i + 2:i + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    tbl = np.frombuffer(seg[p:p + 128], '>u2').astype(np.int32)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f'{prec}-bit JPEG precision')
            h, w, nc = int.from_bytes(seg[1:3], 'big'), \
                int.from_bytes(seg[3:5], 'big'), seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):  # T.81 B.2.2
                    raise ValueError(
                        f'corrupt SOF: sampling factors {hs}x{vs} for '
                        f'component {cid} outside [1, 4]')
                comps.append({'id': cid, 'h': hs, 'v': vs, 'tq': tq})
            frame = {'h': h, 'w': w, 'comps': comps,
                     'progressive': marker == 0xC2}
        elif marker in (0xC9, 0xCA):
            # arithmetic-coded DCT (sequential/progressive): the
            # QM-coder tier routes to the system libjpeg (see
            # jpeg_native — its normative probability table is bound,
            # not re-typed)
            from erde_spark.scale.jpeg_native import (available,
                                                      decode_jpeg_native)
            if available():
                return decode_jpeg_native(data)
            raise NotImplementedError(
                f'arithmetic-coded JPEG (SOF 0x{marker:02X}) decodes '
                'via the system libjpeg shim, which this host cannot '
                'build/load (needs gcc + jpeglib.h + libjpeg)')
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                'only DCT JPEG decodes (SOF0/SOF1/SOF2 pure-Python, '
                f'SOF9/SOF10 via libjpeg); SOF marker 0x{marker:02X} '
                'is a lossless/hierarchical process')
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], 'big')
        elif marker == 0xDA:  # SOS -> entropy-coded scan follows
            if frame is None:
                raise ValueError('SOS before SOF')
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                hit = next(((j, x) for j, x in enumerate(frame['comps'])
                            if x['id'] == cid), None)
                if hit is None:  # corrupt SOS: unknown component id
                    raise ValueError(
                        f'SOS references component id {cid} absent from '
                        'the SOF (corrupt stream)')
                scomps.append((hit[0], hit[1], tabs >> 4, tabs & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahl = seg[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 15
            if (not frame['progressive'] and coefs is None
                    and ns == len(frame['comps']) and ss == 0 and se == 63):
                # single interleaved sequential scan: decode + IDCT in
                # one pass (the dominant web profile, kept fast)
                scan = [(comp, dc, ac) for _, comp, dc, ac in scomps]
                return _decode_scan(data, i + ln, frame, scan, qt, huff,
                                    restart)
            if coefs is None:
                coefs = _init_coefs(frame)
            i = _decode_scan_coef(data, i + ln, frame, coefs, scomps,
                                  ss, se, ah, al, huff, restart)
            continue
        i += ln
    if coefs is not None:
        return _reconstruct(frame, coefs, qt)
    raise ValueError('no SOS scan found')


def _decode_scan(data, pos, frame, scan, qt, huff, restart):
    h, w = frame['h'], frame['w']
    hmax = max(c['h'] for c, _, _ in scan)
    vmax = max(c['v'] for c, _, _ in scan)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    planes = [np.zeros((my * c['v'] * 8, mx * c['h'] * 8), np.float64)
              for c, _, _ in scan]
    preds = [0] * len(scan)
    rd = _BitReader(data, pos)
    mcu = 0
    while mcu < mx * my:
        if restart and mcu and mcu % restart == 0:
            # the encoder byte-aligned and emitted RSTn here; the
            # one-byte-lookahead reader makes pos exact after align()
            rd.align()
            if (data[rd.pos] == 0xFF
                    and 0xD0 <= data[rd.pos + 1] <= 0xD7):
                rd.pos += 2
            preds = [0] * len(scan)
        byi, bxi = divmod(mcu, mx)
        try:
            for ci, (c, dc_t, ac_t) in enumerate(scan):
                dq = qt[c['tq']]
                for v in range(c['v']):
                    for hh in range(c['h']):
                        blk = _decode_block(rd, huff[(0, dc_t)],
                                            huff[(1, ac_t)], preds, ci, dq)
                        y0 = (byi * c['v'] + v) * 8
                        x0 = (bxi * c['h'] + hh) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
        except _MarkerHit as m:
            if 0xD0 <= m.marker <= 0xD7:
                # RST reached mid-read (padding consumed as code bits):
                # resync to the marker, reset predictors, redo this MCU
                rd.pos += 2
                rd.align()
                preds = [0] * len(scan)
                continue
            raise ValueError(f'unexpected marker 0x{m.marker:02X} mid-scan')
        mcu += 1
    out = []
    for ci, (c, _, _) in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c['v'], axis=0),
                      hmax // c['h'], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(rd, dc_table, ac_table, preds, ci, dq):
    coef = np.zeros(64, np.float64)
    t = rd.decode(dc_table)
    preds[ci] += _extend(rd.read(t), t)
    coef[0] = preds[ci] * dq[0]
    k = 1
    while k < 64:
        rs = rd.decode(ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                break  # EOB
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError('corrupt JPEG entropy stream (AC run-length '
                             'past the 8x8 block)')
        coef[ZIGZAG[k]] = _extend(rd.read(s), s) * dq[k]
        k += 1
    block = coef.reshape(8, 8)
    return _DCT_C.T @ block @ _DCT_C + 128.0


# -- progressive / multi-scan coefficient-domain path --------------------

def _frame_grid(frame):
    """(hmax, vmax, mcux, mcuy) for the frame's interleaved MCU grid."""
    comps = frame['comps']
    hmax = max(c['h'] for c in comps)
    vmax = max(c['v'] for c in comps)
    return (hmax, vmax,
            -(-frame['w'] // (8 * hmax)), -(-frame['h'] // (8 * vmax)))


def _comp_grid(frame, comp):
    """(bw, bh): a component's own block grid for NON-interleaved scans
    (T.81 A.2.2 — ceil of the scaled sample dimensions, not MCU-padded)."""
    hmax, vmax, _, _ = _frame_grid(frame)
    cw = -(-frame['w'] * comp['h'] // hmax)
    chh = -(-frame['h'] * comp['v'] // vmax)
    return -(-cw // 8), -(-chh // 8)


def _init_coefs(frame):
    """Per-component zigzag-order coefficient stores on the MCU-padded
    grid (non-interleaved scans fill the top-left sub-grid; padded
    blocks stay zero and are cropped after IDCT)."""
    _, _, mcux, mcuy = _frame_grid(frame)
    return [np.zeros((mcuy * c['v'], mcux * c['h'], 64), np.int64)
            for c in frame['comps']]


def _decode_scan_coef(data, pos, frame, coefs, scomps, ss, se, ah, al,
                      huff, restart):
    """Decode ONE entropy-coded scan into the coefficient store (T.81
    Annex G progressive semantics; full-band sequential scans also land
    here when non-interleaved). Returns the position of the next marker."""
    _, _, mcux, mcuy = _frame_grid(frame)
    interleaved = len(scomps) > 1
    if interleaved:
        n_mcu = mcux * mcuy
    else:
        ci0, comp0, _, _ = scomps[0]
        bw, bh = _comp_grid(frame, comp0)
        n_mcu = bw * bh
    rd = _BitReader(data, pos)
    preds = [0] * len(frame['comps'])
    eobrun = 0
    mcu = 0
    while mcu < n_mcu:
        if restart and mcu and mcu % restart == 0:
            rd.align()
            if (rd.pos + 1 < len(data) and data[rd.pos] == 0xFF
                    and 0xD0 <= data[rd.pos + 1] <= 0xD7):
                rd.pos += 2
            preds = [0] * len(frame['comps'])
            eobrun = 0
        try:
            if interleaved:
                byi, bxi = divmod(mcu, mcux)
                for ci, comp, dc_t, ac_t in scomps:
                    for v in range(comp['v']):
                        for hh in range(comp['h']):
                            blk = coefs[ci][byi * comp['v'] + v,
                                            bxi * comp['h'] + hh]
                            eobrun = _scan_block(
                                rd, blk, ss, se, ah, al,
                                huff.get((0, dc_t)), huff.get((1, ac_t)),
                                preds, ci, eobrun)
            else:
                byi, bxi = divmod(mcu, bw)
                _, _, dc_t, ac_t = scomps[0]
                blk = coefs[ci0][byi, bxi]
                eobrun = _scan_block(rd, blk, ss, se, ah, al,
                                     huff.get((0, dc_t)),
                                     huff.get((1, ac_t)),
                                     preds, ci0, eobrun)
        except _MarkerHit as m:
            if 0xD0 <= m.marker <= 0xD7:
                # RST reached mid-read (padding consumed as code bits):
                # resync, reset predictors + EOB run, redo this MCU
                rd.pos += 2
                rd.align()
                preds = [0] * len(frame['comps'])
                eobrun = 0
                continue
            raise ValueError(f'unexpected marker 0x{m.marker:02X} mid-scan')
        mcu += 1
    rd.align()
    return rd.pos


def _scan_block(rd, blk, ss, se, ah, al, dc_tab, ac_tab, preds, ci, eobrun):
    """One block's share of one scan; returns the updated EOB run."""
    if ss == 0 and se == 0:                       # DC-only (progressive)
        if ah == 0:                               # first pass
            t = rd.decode(dc_tab)
            preds[ci] += _extend(rd.read(t), t)
            blk[0] = preds[ci] << al
        elif rd.read(1):                          # refinement: one bit
            blk[0] |= 1 << al
        return eobrun
    if ss == 0:                                   # full-band sequential
        t = rd.decode(dc_tab)
        preds[ci] += _extend(rd.read(t), t)
        blk[0] = preds[ci]
        return _ac_first(rd, blk, 1, se, 0, ac_tab, eobrun)
    if ah == 0:
        return _ac_first(rd, blk, ss, se, al, ac_tab, eobrun)
    return _ac_refine(rd, blk, ss, se, al, ac_tab, eobrun)


def _ac_first(rd, blk, ss, se, al, ac_tab, eobrun):
    """AC spectral-selection first pass (T.81 G.1.2.2): run/size symbols
    with EOB-run extension; values land shifted by the point transform."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode(ac_tab)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:                           # EOBn: run of 2^r + ext
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rd.read(r)
                break
            k += 16                               # ZRL
            continue
        k += r
        if k > se:
            raise ValueError('corrupt JPEG entropy stream (AC run past '
                             'the scan band)')
        blk[k] = _extend(rd.read(s), s) << al
        k += 1
    return eobrun


def _ac_refine(rd, blk, ss, se, al, ac_tab, eobrun):
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    nonzero coefficients arrive as ±2^Al; every already-nonzero
    coefficient crossed on the way reads one correction bit."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode(ac_tab)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s == 0:
                if r != 15:                       # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.read(r)
                    break
                # ZRL: skip 16 zero-history positions below
            else:
                if s != 1:
                    raise ValueError('corrupt refinement scan (s != 1)')
                newval = p1 if rd.read(1) else m1
            while k <= se:
                if blk[k] != 0:
                    if rd.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and newval:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:                            # refine rest of band
            if blk[k] != 0 and rd.read(1) and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coefs, qt):
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    einsum over all blocks), upsample, crop, color-convert."""
    h, w = frame['h'], frame['w']
    hmax, vmax, _, _ = _frame_grid(frame)
    out = []
    for ci, c in enumerate(frame['comps']):
        dq = qt[c['tq']]                          # zigzag order, like DQT
        cz = coefs[ci].astype(np.float64) * dq
        nat = np.zeros_like(cz)
        nat[:, :, ZIGZAG] = cz                    # zigzag -> natural order
        bh, bw = nat.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8)
        spatial = np.einsum('ka,yxkl,lb->yxab', _DCT_C, blocks,
                            _DCT_C) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // c['v'], axis=0),
                          hmax // c['h'], axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder -------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf, self.nbits = 0, 0

    def write(self, code: int, n: int):
        self.buf = (self.buf << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(wr, block, dq, dc_codes, ac_codes, pred):
    coef = _DCT_C @ (block - 128.0) @ _DCT_C.T
    q = np.round(coef.reshape(-1)[ZIGZAG] / dq).astype(np.int64)
    diff = int(q[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    wr.write(code, ln)
    if t:
        wr.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wr.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        wr.write(code, ln)
        wr.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wr.write(code, ln)
    return int(q[0])


def _prep_planes(arr: np.ndarray, subsample: bool):
    """(gray, h, w, padded_planes, samp, qsel, mx, my): shared front half
    of both encoders — RGB->YCbCr, optional 4:2:0 chroma subsampling,
    edge-padding every plane to whole MCUs."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even then 2x2 box average
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode='edge')
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode='edge')
            cb = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mx = -(-w // (8 * hmax))
    my = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = my * sv * 8, mx * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode='edge'))
    return gray, h, w, padded, samp, qsel, mx, my


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JFIF bytes.
    ``subsample=True`` writes 4:2:0 chroma (2x2 luma sampling);
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs."""
    # quantization tables travel (and divide) in ZIGZAG order — T.81
    # B.2.4.1 requires DQT bytes in zigzag scan order, and _encode_block
    # quantizes the zigzag-reordered coefficient vector
    qly = _scale_qt(_QT_LUMA, quality)[ZIGZAG]
    qlc = _scale_qt(_QT_CHROMA, quality)[ZIGZAG]
    gray, h, w, padded, samp, qsel, mx, my = _prep_planes(arr, subsample)
    planes = padded

    out = bytearray(b'\xff\xd8')  # SOI
    out += b'\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00'

    def seg(marker, payload):
        out.extend(b'\xff' + bytes([marker])
                   + (len(payload) + 2).to_bytes(2, 'big') + payload)

    seg(0xDB, bytes([0]) + bytes(qly.tolist()))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qlc.tolist()))
    sof = bytes([8]) + h.to_bytes(2, 'big') + w.to_bytes(2, 'big') \
        + bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    seg(0xC0, sof)
    tables = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if not gray:
        tables += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc, (bits, vals) in tables:
        seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, restart_interval.to_bytes(2, 'big') + b'')
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_l, ac_l = _build_codes(*_HT_DC_LUMA), _build_codes(*_HT_AC_LUMA)
    dc_c, ac_c = _build_codes(*_HT_DC_CHROMA), _build_codes(*_HT_AC_CHROMA)
    wr = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for mcu in range(mx * my):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wr.flush()
            wr.out += b'\xff' + bytes([0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(planes)
        byi, bxi = divmod(mcu, mx)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
            dq = qly if qsel[ci] == 0 else qlc
            dcod = dc_l if ci == 0 else dc_c
            acod = ac_l if ci == 0 else ac_c
            for v in range(sv):
                for hh in range(sh):
                    y0, x0 = (byi * sv + v) * 8, (bxi * sh + hh) * 8
                    preds[ci] = _encode_block(
                        wr, p[y0:y0 + 8, x0:x0 + 8], dq, dcod, acod,
                        preds[ci])
    wr.flush()
    out += wr.out
    out += b'\xff\xd9'  # EOI
    return bytes(out)


# -- progressive encoder (fixture / pipeline synthesis) -------------------

def _point_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.2 — DC uses a plain arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_dc_scan(wr, scomps, qblocks, samp, ah, al, dc_codes, mx, my):
    """DC scan: interleaved MCU order (first pass emits diffs of the
    point-transformed DC; refinement emits one bit per block)."""
    preds = {ci: 0 for ci in scomps}
    for mcu in range(mx * my):
        byi, bxi = divmod(mcu, mx)
        for ci in scomps:
            sh, sv = samp[ci]
            for v in range(sv):
                for hh in range(sh):
                    q0 = int(qblocks[ci][byi * sv + v, bxi * sh + hh, 0])
                    if ah:                      # refinement: bit Al
                        wr.write((q0 >> al) & 1, 1)
                        continue
                    t0 = q0 >> al               # arithmetic shift (DC)
                    diff = t0 - preds[ci]
                    preds[ci] = t0
                    t = _category(diff)
                    code, ln = dc_codes[ci][t]
                    wr.write(code, ln)
                    if t:
                        wr.write(diff if diff > 0 else diff + (1 << t) - 1, t)


def _enc_ac_first_block(wr, q, ss, se, al, ac_codes):
    """AC spectral-selection first pass for one block, per-block EOB."""
    ts = [_point_ac(int(q[k]), al) for k in range(ss, se + 1)]
    nz = [j for j, t in enumerate(ts) if t]
    if not nz:
        code, ln = ac_codes[0x00]
        wr.write(code, ln)
        return
    last = nz[-1]
    run = 0
    for j in range(last + 1):
        t = ts[j]
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]           # ZRL
            wr.write(code, ln)
            run -= 16
        s = _category(t)
        code, ln = ac_codes[(run << 4) | s]
        wr.write(code, ln)
        wr.write(t if t > 0 else t + (1 << s) - 1, s)
        run = 0
    if last < se - ss:
        code, ln = ac_codes[0x00]               # EOB covers the tail
        wr.write(code, ln)


def _enc_ac_refine_block(wr, q, ss, se, al, ac_codes):
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / figure G.7 semantics): newly nonzero coefficients (|t|=1
    at this precision) get run/1 symbols + sign; already-nonzero ones
    contribute buffered correction bits that flush right after the next
    emitted symbol; per-block EOB carries the trailing bits."""
    ts = [_point_ac(int(q[k]), al) for k in range(ss, se + 1)]
    new = [j for j, t in enumerate(ts) if abs(t) == 1]
    kex = new[-1] if new else -1                # last NEWLY nonzero pos
    run = 0
    pending: list[int] = []
    for j, t in enumerate(ts):
        a = abs(t)
        if a == 0:
            run += 1
            continue
        if j <= kex:
            # ZRLs can't be deferred past a history coefficient: the
            # decoder reads that coefficient's correction bit while
            # crossing the ZRL span, so the bits must flush here
            while run > 15:
                code, ln = ac_codes[0xF0]
                wr.write(code, ln)
                for bit in pending:
                    wr.write(bit, 1)
                pending = []
                run -= 16
        if a > 1:                               # history: correction bit
            pending.append(a & 1)
            continue
        code, ln = ac_codes[(run << 4) | 1]
        wr.write(code, ln)
        wr.write(1 if t > 0 else 0, 1)
        for bit in pending:
            wr.write(bit, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        code, ln = ac_codes[0x00]               # EOB + trailing bits
        wr.write(code, ln)
        for bit in pending:
            wr.write(bit, 1)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsample: bool = False) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> PROGRESSIVE (SOF2)
    JFIF bytes with the libjpeg-shaped scan script: interleaved DC
    first pass + refinement, per-component spectral-selection AC bands,
    and successive-approximation AC refinement passes down to Al=0.
    Fully refined, so the decoded image equals the baseline encoding's
    decode exactly (same quantized coefficients)."""
    qly = _scale_qt(_QT_LUMA, quality)[ZIGZAG]
    qlc = _scale_qt(_QT_CHROMA, quality)[ZIGZAG]
    gray, h, w, padded, samp, qsel, mx, my = _prep_planes(arr, subsample)

    # quantized zigzag coefficients for every block of every component
    qblocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
        dq = qly if qsel[ci] == 0 else qlc
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0)
        coef = np.einsum('ak,yxkl,bl->yxab', _DCT_C, blocks, _DCT_C)
        z = coef.reshape(bh, bw, 64)[:, :, ZIGZAG]
        qblocks.append(np.round(z / dq).astype(np.int64))

    out = bytearray(b'\xff\xd8')  # SOI
    out += b'\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00'

    def seg(marker, payload):
        out.extend(b'\xff' + bytes([marker])
                   + (len(payload) + 2).to_bytes(2, 'big') + payload)

    seg(0xDB, bytes([0]) + bytes(qly.tolist()))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qlc.tolist()))
    sof = bytes([8]) + h.to_bytes(2, 'big') + w.to_bytes(2, 'big') \
        + bytes([len(padded)])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    seg(0xC2, sof)                              # SOF2: progressive
    tables = [(0x00, _HT_DC_LUMA), (0x10, _HT_AC_LUMA)]
    if not gray:
        tables += [(0x01, _HT_DC_CHROMA), (0x11, _HT_AC_CHROMA)]
    for tc, (bits, vals) in tables:
        seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))

    dc_codes = {ci: _build_codes(*(_HT_DC_LUMA if ci == 0 else _HT_DC_CHROMA))
                for ci in range(len(padded))}
    ac_codes = {ci: _build_codes(*(_HT_AC_LUMA if ci == 0 else _HT_AC_CHROMA))
                for ci in range(len(padded))}

    if gray:
        script = [([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                  ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0)]
    else:
        script = [([0, 1, 2], 0, 0, 0, 1),
                  ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
                  ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                  ([0, 1, 2], 0, 0, 1, 0),
                  ([0], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0)]

    for scomps, ss, se, ah, al in script:
        sos = bytes([len(scomps)])
        for ci in scomps:
            # DC tables matter only when Ss=0, AC tables only when Ss>0
            sos += bytes([ci + 1, ((0 if ci == 0 else 1) << 4)
                          | (0 if ci == 0 else 1)])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        wr = _BitWriter()
        if ss == 0:
            _enc_dc_scan(wr, scomps, qblocks, samp, ah, al, dc_codes, mx, my)
        else:
            ci = scomps[0]
            sh, sv = samp[ci]
            hmax = max(s[0] for s in samp)
            vmax = max(s[1] for s in samp)
            cw = -(-w * sh // hmax)         # comp sample dims (A.1.1)
            chh = -(-h * sv // vmax)
            bw, bh = -(-cw // 8), -(-chh // 8)  # non-interleaved grid
            enc = _enc_ac_refine_block if ah else _enc_ac_first_block
            for by in range(bh):
                for bx in range(bw):
                    enc(wr, qblocks[ci][by, bx], ss, se, al, ac_codes[ci])
        wr.flush()
        out += wr.out
    out += b'\xff\xd9'  # EOI
    return bytes(out)
