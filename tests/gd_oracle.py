"""Test-only ctypes binding to the system libgd — an INDEPENDENT
codec implementation (libpng/libjpeg/libgif/libtiff/libwebp under one
simple C API) used to cross-validate the repo's pure-Python codecs in
both directions: their encoder -> our decoder, our encoder -> their
decoder. The VP8L cross-check against libwebp found two real
self-consistent spec violations; this extends the same oracle to the
rest of the codec family. Not product code: lives in tests/ only."""

from __future__ import annotations

import ctypes

import numpy as np

_GD = None


def available() -> bool:
    global _GD
    if _GD is not None:
        return True
    try:
        gd = ctypes.CDLL('libgd.so.3')
    except OSError:
        return False
    vp = ctypes.c_void_p
    for dec in ('Png', 'Jpeg', 'Gif', 'Bmp', 'Tiff', 'Webp'):
        fn = getattr(gd, f'gdImageCreateFrom{dec}Ptr')
        fn.restype = vp
        fn.argtypes = [ctypes.c_int, ctypes.c_char_p]
    for enc in ('Png', 'Gif', 'Tiff', 'Webp'):
        fn = getattr(gd, f'gdImage{enc}Ptr')
        fn.restype = vp
        fn.argtypes = [vp, ctypes.POINTER(ctypes.c_int)]
    gd.gdImageJpegPtr.restype = vp
    gd.gdImageJpegPtr.argtypes = [vp, ctypes.POINTER(ctypes.c_int),
                                  ctypes.c_int]
    gd.gdImageGetTrueColorPixel.restype = ctypes.c_int
    gd.gdImageGetTrueColorPixel.argtypes = [vp, ctypes.c_int, ctypes.c_int]
    gd.gdImageCreateTrueColor.restype = vp
    gd.gdImageCreateTrueColor.argtypes = [ctypes.c_int, ctypes.c_int]
    gd.gdImageSetPixel.argtypes = [vp, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int]
    gd.gdImageDestroy.argtypes = [vp]
    gd.gdFree.argtypes = [vp]
    _GD = gd
    return True


def _dims(im) -> tuple[int, int]:
    """(sx, sy) — the 2nd/3rd fields of gdImageStruct (stable since
    gd 1.x: unsigned char **pixels; int sx; int sy; ...)."""
    buf = ctypes.cast(im, ctypes.POINTER(ctypes.c_int))
    return buf[2], buf[3]


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Decode via libgd to (h, w, 3) uint8 RGB (alpha dropped: gd's
    7-bit alpha is lossy, so comparisons run on opaque fixtures)."""
    if not available():
        raise OSError('libgd unavailable')
    im = getattr(_GD, f'gdImageCreateFrom{fmt.capitalize()}Ptr')(
        len(data), data)
    if not im:
        raise ValueError(f'libgd failed to decode {fmt}')
    try:
        w, h = _dims(im)
        out = np.zeros((h, w, 3), np.uint8)
        px = _GD.gdImageGetTrueColorPixel
        for y in range(h):
            for x in range(w):
                v = px(im, x, y)
                out[y, x] = ((v >> 16) & 255, (v >> 8) & 255, v & 255)
        return out
    finally:
        _GD.gdImageDestroy(im)


def encode(arr: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    """Encode (h, w, 3) uint8 RGB via libgd's encoder for ``fmt``."""
    if not available():
        raise OSError('libgd unavailable')
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.dstack([arr] * 3)
    h, w = arr.shape[:2]
    im = _GD.gdImageCreateTrueColor(w, h)
    try:
        for y in range(h):
            for x in range(w):
                r, g, b = arr[y, x, :3]
                _GD.gdImageSetPixel(
                    im, x, y, (int(r) << 16) | (int(g) << 8) | int(b))
        n = ctypes.c_int()
        if fmt == 'jpeg':
            ptr = _GD.gdImageJpegPtr(im, ctypes.byref(n), quality)
        else:
            ptr = getattr(_GD, f'gdImage{fmt.capitalize()}Ptr')(
                im, ctypes.byref(n))
        if not ptr:
            raise ValueError(f'libgd failed to encode {fmt}')
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            _GD.gdFree(ptr)
    finally:
        _GD.gdImageDestroy(im)
