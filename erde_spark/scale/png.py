"""Minimal pure-stdlib media codecs: PNG images and WAV audio.

PNG: 8- and 16-bit greyscale / grey+alpha / RGB / RGBA plus palette
(color type 3, PLTE/tRNS, bit depths 1/2/4/8) and Adam7 interlacing, in
pure zlib + struct — no image libraries. 16-bit images decode to
uint16 arrays. The decoder implements the full
scanline filter set (None / Sub / Up / Average / Paeth; public PNG
spec, RFC 2083 §6) with CRC verification, so `decode_media` is a real
decoder for the web's dominant lossless format. The encoders exist for
tests and fixtures; the ``filter_type`` knob lets tests exercise every
unfilter path, ``interlace`` emits real Adam7 pass structure.

WAV: PCM 8/16/32-bit int and 32/64-bit float via the stdlib ``wave`` +
struct modules — samples come back as an (n_frames, n_channels) ndarray.

Other formats (JPEG/WebP/MP3/video) still require codec libraries the
container doesn't ship.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b'\x89PNG\r\n\x1a\n'
#: color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIG


#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _pass_pixels(raw: bytes, p: int, pw: int, ph: int, depth: int,
                 ch: int) -> tuple[np.ndarray, int]:
    """Unfilter one (sub)image of ``ph`` scanlines starting at stream
    offset ``p``; returns ((ph, pw, ch) uint8 pixel VALUES — palette
    indices for color type 3 — and the new offset). Sub-byte depths
    filter on whole bytes (bpp=1) per the spec, then unpack MSB-first."""
    bits = depth * ch
    rb = (pw * bits + 7) // 8          # scanline bytes
    bpp = max(1, bits // 8)            # filter unit in bytes
    out = np.empty((ph, rb), dtype=np.uint8)
    prev = np.zeros(rb, dtype=np.uint8)
    for y in range(ph):
        if p + 1 + rb > len(raw):
            raise ValueError('PNG data truncated')
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, rb, p + 1).copy()
        p += 1 + rb
        if f == 0:
            pass
        elif f == 1:                      # Sub: left-neighbour prefix sum
            for x in range(bpp, rb):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif f == 2:                      # Up
            row += prev
        elif f == 3:                      # Average
            for x in range(rb):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:                      # Paeth
            for x in range(rb):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f'PNG filter type {f} invalid')
        out[y] = row
        prev = row
    if depth == 8:
        return out[:, :pw * ch].reshape(ph, pw, ch), p
    if depth == 16:                        # big-endian sample pairs
        u = out[:, :pw * ch * 2].reshape(ph, pw * ch, 2).astype(np.uint16)
        return ((u[..., 0] << 8) | u[..., 1]).reshape(ph, pw, ch), p
    # depth 1/2/4 (color types 0 and 3 only): unpack MSB-first groups
    b = np.unpackbits(out, axis=1)[:, :pw * depth].reshape(ph, pw, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (b * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :, None], p


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 ndarray: (h, w) greyscale, (h, w, channels)
    otherwise. Palette images (color type 3) come back as RGB — RGBA
    when a tRNS chunk supplies per-entry alpha. Adam7-interlaced images
    are de-interlaced."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError('not a PNG: bad signature')
    pos, idat, header, plte, trns = 8, [], None, None, None
    while pos + 12 <= len(data):
        (length,) = struct.unpack('>I', data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack('>I', data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f'PNG chunk {ctype!r}: CRC mismatch')
        pos += 12 + length
        if ctype == b'IHDR':
            header = struct.unpack('>IIBBBBB', chunk)
        elif ctype == b'PLTE':
            plte = chunk
        elif ctype == b'tRNS':
            trns = chunk
        elif ctype == b'IDAT':
            idat.append(chunk)
        elif ctype == b'IEND':
            break
    if header is None:
        raise ValueError('PNG missing IHDR')
    w, h, depth, color, comp, filt, interlace = header
    if color not in (0, 2, 3, 4, 6):
        raise NotImplementedError(f'PNG color type {color}')
    if depth != 8 and not (color in (0, 3) and depth in (1, 2, 4)) \
            and not (depth == 16 and color in (0, 2, 4, 6)):
        raise NotImplementedError(
            f'PNG bit depth {depth} for color type {color} '
            '(8/16, or 1/2/4 for greyscale/palette)')
    if interlace not in (0, 1):
        raise ValueError(f'invalid PNG interlace method {interlace}')
    if comp != 0 or filt != 0:
        raise ValueError('invalid PNG compression/filter method')
    if color == 3 and plte is None:
        raise ValueError('palette PNG missing PLTE chunk')

    ch = 1 if color == 3 else _CHANNELS[color]
    raw = zlib.decompress(b''.join(idat))
    if interlace == 0:
        px, p = _pass_pixels(raw, 0, w, h, depth, ch)
    else:                                 # Adam7: 7 independent passes
        px = np.zeros((h, w, ch),
                      dtype=np.uint16 if depth == 16 else np.uint8)
        p = 0
        for sx, sy, dx, dy in _ADAM7:
            pw = (w - sx + dx - 1) // dx
            ph = (h - sy + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, p = _pass_pixels(raw, p, pw, ph, depth, ch)
            px[sy::dy, sx::dx] = sub
    if p != len(raw):
        raise ValueError('PNG data length mismatch')

    if color == 3:
        pal = np.frombuffer(plte, np.uint8)
        if len(pal) % 3:
            raise ValueError('PLTE length not a multiple of 3')
        pal = pal.reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError('palette index out of range')
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[:len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if color == 0 and depth < 8:          # scale to full 8-bit range
        return (px[:, :, 0] * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return px[:, :, 0] if ch == 1 else px


def _filter_lines(flat: np.ndarray, ch: int, filter_type: int) -> list[bytes]:
    """Filter one (sub)image's scanlines (rows of a (h, w*ch) byte
    matrix) with a single filter type; prev resets at the first row, as
    each Adam7 pass is filtered independently."""
    n = flat.shape[1]
    lines = []
    prev = np.zeros(n, dtype=np.uint8)
    for row in flat:
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row.copy()
            filt[ch:] = row[ch:] - row[:-ch]
        elif filter_type == 2:
            filt = row - prev
        elif filter_type == 3:
            left = np.zeros(n, dtype=np.int64)
            left[ch:] = row[:-ch]
            filt = (row.astype(np.int64)
                    - (left + prev.astype(np.int64)) // 2).astype(np.uint8)
        elif filter_type == 4:
            filt = np.empty(n, dtype=np.uint8)
            for x in range(n):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (int(row[x]) - pred) & 0xFF
        else:
            raise ValueError(f'filter_type {filter_type} invalid')
        lines.append(bytes([filter_type]) + filt.tobytes())
        prev = row
    return lines


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack('>I', len(payload)) + ctype + payload
            + struct.pack('>I', zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _scanline_payload(img: np.ndarray, ch: int, filter_type: int,
                      interlace: int) -> bytes:
    """(h, w, ch) byte image -> filtered scanline stream, sequential or
    Adam7 pass-ordered."""
    if interlace == 0:
        flat = img.reshape(img.shape[0], -1)
        return b''.join(_filter_lines(flat, ch, filter_type))
    pieces = []
    for sx, sy, dx, dy in _ADAM7:
        sub = img[sy::dy, sx::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        pieces += _filter_lines(np.ascontiguousarray(sub)
                                .reshape(sub.shape[0], -1), ch, filter_type)
    return b''.join(pieces)


def encode_png(arr: np.ndarray, filter_type: int = 0,
               interlace: int = 0) -> bytes:
    """uint8 (depth 8) or uint16 (depth 16, big-endian samples) ndarray
    -> PNG bytes. ``filter_type`` applies one filter to every scanline
    (0=None default; 1-4 exist so tests can cover each decoder unfilter
    path); ``interlace=1`` writes real Adam7 pass structure."""
    arr = np.asarray(arr)
    wide = arr.dtype == np.uint16
    arr = arr.astype(np.uint16 if wide else np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    ch = arr.shape[2]
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    h, w = arr.shape[:2]
    if wide:
        # bytes-per-pixel image: filtering operates on BYTES with the
        # pixel width (2*ch) as the Sub/Average/Paeth offset (PNG spec)
        bimg = (np.ascontiguousarray(arr.astype('>u2'))
                .view(np.uint8).reshape(h, w, ch * 2))
        bpp = ch * 2
    else:
        bimg, bpp = arr, ch
    ihdr = struct.pack('>IIBBBBB', w, h, 16 if wide else 8, color, 0, 0,
                       interlace)
    idat = zlib.compress(_scanline_payload(bimg, bpp, filter_type,
                                           interlace))
    return (_SIG + _png_chunk(b'IHDR', ihdr) + _png_chunk(b'IDAT', idat)
            + _png_chunk(b'IEND', b''))


def encode_png_palette(arr: np.ndarray, filter_type: int = 0,
                       interlace: int = 0,
                       alpha: np.ndarray | None = None) -> bytes:
    """(h, w, 3) uint8 RGB with <=256 distinct colors -> color-type-3
    (palette) PNG bytes; ``alpha`` is an optional (h, w) uint8 plane
    written as a tRNS chunk (per-palette-entry alpha). Fixture encoder
    for the palette decode path."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    key = arr.reshape(-1, 3)
    if alpha is not None:
        key = np.concatenate(
            [key, np.asarray(alpha, np.uint8).reshape(-1, 1)], axis=1)
    pal, inv = np.unique(key, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f'{len(pal)} distinct colors exceed one palette')
    idx = inv.astype(np.uint8).reshape(h, w, 1)
    ihdr = struct.pack('>IIBBBBB', w, h, 8, 3, 0, 0, interlace)
    out = (_SIG + _png_chunk(b'IHDR', ihdr)
           + _png_chunk(b'PLTE', pal[:, :3].tobytes()))
    if alpha is not None:
        out += _png_chunk(b'tRNS', pal[:, 3].tobytes())
    idat = zlib.compress(_scanline_payload(idx, 1, filter_type, interlace))
    return out + _png_chunk(b'IDAT', idat) + _png_chunk(b'IEND', b'')


# ---------------------------------------------------------------- WAV

#: sample width -> dtype; 8-bit WAV PCM is unsigned per the RIFF spec
_WAV_INT = {1: np.uint8, 2: np.int16, 4: np.int32}


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b'RIFF' and bytes(data[8:12]) == b'WAVE'


def decode_wav(data: bytes) -> np.ndarray:
    """WAV bytes -> (n_frames, n_channels) ndarray.

    PCM integer widths decode via the stdlib ``wave`` module (int8/16/32);
    IEEE-float WAV (format tag 3) is parsed from the RIFF chunks directly
    since ``wave`` rejects non-PCM.
    """
    import io
    import wave
    data = bytes(data)
    if not is_wav(data):
        raise ValueError('not a WAV: bad RIFF/WAVE header')
    try:
        with wave.open(io.BytesIO(data)) as w:
            n_ch, width, n_frames = w.getnchannels(), w.getsampwidth(), w.getnframes()
            raw = w.readframes(n_frames)
        if width not in _WAV_INT:
            raise ValueError(f'unsupported PCM sample width {width}')
        arr = np.frombuffer(raw, dtype=_WAV_INT[width])
        return arr.reshape(-1, n_ch)
    except wave.Error:
        pass  # non-PCM (e.g. IEEE float): parse RIFF chunks by hand
    pos, fmt, frames = 12, None, b''
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack('<I', data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b'fmt ':
            fmt = struct.unpack('<HHIIHH', body[:16])
        elif cid == b'data':
            frames = body
    if fmt is None:
        raise ValueError('WAV missing fmt chunk')
    tag, n_ch, _, _, _, bits = fmt
    if tag == 3 and bits in (32, 64):  # IEEE float
        arr = np.frombuffer(frames, dtype=np.float32 if bits == 32 else np.float64)
        return arr.reshape(-1, n_ch)
    raise NotImplementedError(f'WAV format tag {tag} / {bits}-bit unsupported')


def encode_wav(arr: np.ndarray, framerate: int = 16000) -> bytes:
    """(n_frames, n_channels) int ndarray -> PCM WAV bytes (fixtures)."""
    import io
    import wave
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype not in (np.uint8, np.int16, np.int32):
        raise ValueError('encode_wav takes uint8/int16/int32 samples '
                         '(8-bit WAV PCM is unsigned)')
    buf = io.BytesIO()
    with wave.open(buf, 'wb') as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(arr.dtype.itemsize)
        w.setframerate(framerate)
        w.writeframes(np.ascontiguousarray(arr).tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------- BMP

def is_bmp(data: bytes) -> bool:
    return len(data) > 2 and data[:2] == b'BM'


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB array.
    Bottom-up and top-down row orders both handled; rows are 4-byte
    padded per the format. Other bit depths / compressions raise (they
    need palette or RLE handling this minimal codec doesn't carry)."""
    if not is_bmp(data):
        raise ValueError('not a BMP (missing BM magic)')
    off = struct.unpack_from('<I', data, 10)[0]
    hdr_size = struct.unpack_from('<I', data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError('BITMAPCOREHEADER BMP not supported')
    w, h = struct.unpack_from('<ii', data, 18)
    bpp = struct.unpack_from('<H', data, 28)[0]
    comp = struct.unpack_from('<I', data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f'only uncompressed 24-bit BMP supported (bpp={bpp}, '
            f'compression={comp})')
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    body = bytearray()
    for row in bgr[::-1]:
        body += row.tobytes() + b'\x00' * (stride - w * 3)
    off = 14 + 40
    header = (b'BM' + struct.pack('<IHHI', off + len(body), 0, 0, off)
              + struct.pack('<IiiHHIIiiII', 40, w, h, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return bytes(header + body)
