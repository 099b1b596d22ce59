"""Minimal pure-stdlib media codecs: PNG images and WAV audio.

PNG: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced (zlib +
struct — no image libraries). The decoder implements the full scanline
filter set (None / Sub / Up / Average / Paeth; public PNG spec, RFC 2083
§6) with CRC verification, so `decode_media` is a real decoder for the
web's dominant lossless format. The encoder exists for tests and
fixtures; its ``filter_type`` knob lets tests exercise every unfilter
path.

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


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 ndarray, shape (h, w) for greyscale or
    (h, w, channels) otherwise."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError('not a PNG: bad signature')
    pos, idat, header = 8, [], None
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
        elif ctype == b'IDAT':
            idat.append(chunk)
        elif ctype == b'IEND':
            break
    if header is None:
        raise ValueError('PNG missing IHDR')
    w, h, depth, color, comp, filt, interlace = header
    if depth != 8:
        raise NotImplementedError(f'PNG bit depth {depth} (only 8 supported)')
    if color not in _CHANNELS:
        raise NotImplementedError(f'PNG color type {color} (palette unsupported)')
    if interlace != 0:
        raise NotImplementedError('interlaced (Adam7) PNG unsupported')
    if comp != 0 or filt != 0:
        raise ValueError('invalid PNG compression/filter method')

    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b''.join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError('PNG data length mismatch')

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if f == 0:
            pass
        elif f == 1:                      # Sub: left-neighbour prefix sum
            for x in range(ch, stride):
                row[x] = (int(row[x]) + int(row[x - ch])) & 0xFF
        elif f == 2:                      # Up
            row += prev
        elif f == 3:                      # Average
            for x in range(stride):
                left = int(row[x - ch]) if x >= ch else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:                      # Paeth
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f'PNG filter type {f} invalid')
        out[y] = row
        prev = row
    arr = out.reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 ndarray -> PNG bytes. ``filter_type`` applies one filter to
    every scanline (0=None default; 1-4 exist so tests can cover each
    decoder unfilter path)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    ch = arr.shape[2]
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * ch)
    n = w * ch
    lines = []
    prev = np.zeros(n, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
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

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack('>I', len(payload)) + ctype + payload
                + struct.pack('>I', zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack('>IIBBBBB', w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b''.join(lines))
    return _SIG + chunk(b'IHDR', ihdr) + chunk(b'IDAT', idat) + chunk(b'IEND', b'')


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
