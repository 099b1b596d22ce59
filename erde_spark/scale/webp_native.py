"""ctypes binding to the system libwebp for LOSSY (VP8) WebP.

The lossless VP8L path stays the pure-Python codec in
:mod:`erde_spark.scale.webp` — it is spec-complete and now
cross-validated bit-for-bit against this binding. Lossy VP8 is a
different codec (RFC 6386: boolean arithmetic coder, DCT/WHT, intra
prediction, loop filter) whose normative behaviour lives in ~2k
published probability-table constants; re-typing those from memory is
a silent-fidelity risk with no oracle in this container, so the engine
binds the reference implementation's public API instead
(``WebPDecodeRGBA`` / ``WebPEncodeRGB``, shipped here as
``libwebp.so.7``). Everything is gated behind an import/dlopen try:
when the library is absent, callers fall back to the documented
``NotImplementedError``.

Executor-side use: the handle is opened lazily per process and cached,
so ``mapInPandas`` workers each dlopen once — no driver state rides in
closures.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_LIB: ctypes.CDLL | None = None
_LIB_ERR: str | None = None


def _libwebp() -> ctypes.CDLL:
    global _LIB, _LIB_ERR
    if _LIB is not None:
        return _LIB
    if _LIB_ERR is not None:
        raise OSError(_LIB_ERR)
    try:
        name = ctypes.util.find_library('webp') or 'libwebp.so.7'
        lib = ctypes.CDLL(name)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.restype = u8p
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(u8p)]
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(u8p)]
        lib.WebPGetInfo.restype = ctypes.c_int
        lib.WebPGetInfo.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        if hasattr(lib, 'WebPFree'):
            lib.WebPFree.argtypes = [ctypes.c_void_p]
    except OSError as ex:
        _LIB_ERR = f'libwebp unavailable: {ex}'
        raise OSError(_LIB_ERR) from None
    _LIB = lib
    return lib


def _free(lib: ctypes.CDLL, ptr) -> None:
    if hasattr(lib, 'WebPFree'):
        lib.WebPFree(ptr)
    else:  # pre-0.5 libwebp: buffers come from malloc
        ctypes.CDLL(None).free(ptr)


def available() -> bool:
    """True when the system libwebp can be dlopen'd in this process."""
    try:
        _libwebp()
        return True
    except OSError:
        return False


def decode_webp_native(data: bytes) -> np.ndarray:
    """Any WebP (lossy VP8, lossless VP8L, VP8X/ALPH containers) to
    (h, w, 4) uint8 RGBA via libwebp."""
    lib = _libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not ptr:
        raise ValueError('libwebp failed to decode blob')
    try:
        n = w.value * h.value * 4
        out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        _free(lib, ptr)
    return out.reshape(h.value, w.value, 4)


def encode_webp_lossy(rgb: np.ndarray, quality: float = 90.0) -> bytes:
    """(h, w, 3) uint8 RGB to a LOSSY (VP8) .webp — the fixture source
    for the majority-of-real-webp decode tier."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError('encode_webp_lossy wants (h, w, 3) RGB')
    lib = _libwebp()
    h, w = rgb.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(rgb.tobytes(), w, h, w * 3,
                             float(quality), ctypes.byref(out))
    if size == 0:
        raise ValueError('libwebp failed to encode')
    try:
        return ctypes.string_at(out, size)
    finally:
        _free(lib, out)


def encode_webp_lossless_native(rgba: np.ndarray) -> bytes:
    """(h, w, 4) uint8 RGBA to a LOSSLESS (VP8L) .webp via libwebp —
    used to cross-validate the pure-Python VP8L decoder against an
    independent encoder."""
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    if rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError('encode_webp_lossless_native wants (h, w, 4) RGBA')
    lib = _libwebp()
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(rgba.tobytes(), w, h, w * 4,
                                      ctypes.byref(out))
    if size == 0:
        raise ValueError('libwebp failed to encode')
    try:
        return ctypes.string_at(out, size)
    finally:
        _free(lib, out)
