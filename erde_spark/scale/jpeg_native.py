"""ctypes binding to the system libjpeg(-turbo) for ARITHMETIC-coded
JPEG (SOF9/SOF10) — the one DCT tier the pure-Python codec doesn't
implement: the QM-coder's normative 113-row probability-estimation
table (T.81 Table D.3) is exactly the class of memorized-constants risk
this repo avoids re-typing without an oracle, so the reference
implementation is bound instead (the same call the lossy-WebP tier
makes on libwebp).

libjpeg's stable API is struct-layout-heavy (not ctypes-friendly), so a
~70-line C shim is compiled ONCE per host against the system
``jpeglib.h`` (gcc and the header ship in this container) and cached
under the user cache dir; everything is gated behind ``available()`` —
no compiler/header/library means the documented NotImplementedError
path stays. Worker processes dlopen the cached .so; the build is
atomic (tempfile + rename) so concurrent executors can't race.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SHIM_C = r'''
#include <stddef.h>
#include <stdio.h>
#include <stdlib.h>
#include <setjmp.h>
#include <jpeglib.h>

struct es_err { struct jpeg_error_mgr pub; jmp_buf jb; };
static void es_exit(j_common_ptr c){ struct es_err* e=(struct es_err*)c->err; longjmp(e->jb,1); }

int es_jpeg_decode_rgb(const unsigned char* buf, unsigned long len,
                       unsigned char* out, long out_cap, int* w, int* h) {
  struct jpeg_decompress_struct ci; struct es_err je;
  ci.err = jpeg_std_error(&je.pub); je.pub.error_exit = es_exit;
  if (setjmp(je.jb)) { jpeg_destroy_decompress(&ci); return -1; }
  jpeg_create_decompress(&ci);
  jpeg_mem_src(&ci, buf, len);
  jpeg_read_header(&ci, TRUE);
  ci.out_color_space = JCS_RGB;
  jpeg_start_decompress(&ci);
  *w = ci.output_width; *h = ci.output_height;
  long stride = (long)ci.output_width * ci.output_components;
  if (stride * ci.output_height > out_cap) {
    jpeg_destroy_decompress(&ci); return -2;
  }
  while (ci.output_scanline < ci.output_height) {
    unsigned char* row = out + (size_t)ci.output_scanline * stride;
    jpeg_read_scanlines(&ci, &row, 1);
  }
  jpeg_finish_decompress(&ci); jpeg_destroy_decompress(&ci);
  return 0;
}

unsigned long es_jpeg_encode(const unsigned char* rgb, int w, int h,
                             int quality, int arith, int progressive,
                             unsigned char** outbuf) {
  struct jpeg_compress_struct ci; struct es_err je;
  unsigned long outlen = 0; *outbuf = NULL;
  ci.err = jpeg_std_error(&je.pub); je.pub.error_exit = es_exit;
  if (setjmp(je.jb)) { jpeg_destroy_compress(&ci); return 0; }
  jpeg_create_compress(&ci);
  jpeg_mem_dest(&ci, outbuf, &outlen);
  ci.image_width = w; ci.image_height = h;
  ci.input_components = 3; ci.in_color_space = JCS_RGB;
  jpeg_set_defaults(&ci);
  jpeg_set_quality(&ci, quality, TRUE);
  if (arith) ci.arith_code = TRUE;
  if (progressive) jpeg_simple_progression(&ci);
  jpeg_start_compress(&ci, TRUE);
  while (ci.next_scanline < ci.image_height) {
    JSAMPROW row = (JSAMPROW)(rgb + (size_t)ci.next_scanline * w * 3);
    jpeg_write_scanlines(&ci, &row, 1);
  }
  jpeg_finish_compress(&ci); jpeg_destroy_compress(&ci);
  return outlen;
}

void es_jpeg_free(void* p) { free(p); }
'''

_LIB = None
_ERR: str | None = None


def _build_dir() -> str:
    d = os.path.join(tempfile.gettempdir(),
                     f'erde_jpeg_shim_{os.getuid()}')
    os.makedirs(d, exist_ok=True)
    return d


def _shim() -> ctypes.CDLL:
    global _LIB, _ERR
    if _LIB is not None:
        return _LIB
    if _ERR is not None:
        raise OSError(_ERR)
    try:
        d = _build_dir()
        so = os.path.join(d, 'libesjpeg.so')
        if not os.path.exists(so):
            src = os.path.join(d, 'shim.c')
            with open(src, 'w') as f:
                f.write(_SHIM_C)
            tmp = tempfile.mktemp(suffix='.so', dir=d)
            subprocess.run(
                ['gcc', '-O2', '-shared', '-fPIC', src, '-o', tmp,
                 '-ljpeg'],
                check=True, capture_output=True, timeout=60)
            os.replace(tmp, so)  # atomic: concurrent builders converge
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.es_jpeg_decode_rgb.restype = ctypes.c_int
        lib.es_jpeg_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, u8p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.es_jpeg_encode.restype = ctypes.c_ulong
        lib.es_jpeg_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(u8p)]
        lib.es_jpeg_free.argtypes = [ctypes.c_void_p]
    except Exception as ex:  # no gcc / header / libjpeg
        _ERR = f'libjpeg shim unavailable: {ex}'
        raise OSError(_ERR) from None
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _shim()
        return True
    except OSError:
        return False


#: dimension cap for the preallocated decode buffer (64 MP ~ 192 MB)
_MAX_PIXELS = 64 << 20


def decode_jpeg_native(data: bytes) -> np.ndarray:
    """Any libjpeg-supported JPEG (arithmetic SOF9/SOF10 included) to
    (h, w, 3) uint8 RGB."""
    lib = _shim()
    # read dims from the SOF marker to size the buffer exactly
    w = ctypes.c_int()
    h = ctypes.c_int()
    dims = _sof_dims(data)
    if dims is None:
        raise ValueError('no SOF marker found')
    sh, sw = dims
    if sh * sw > _MAX_PIXELS:
        raise ValueError(f'image {sw}x{sh} exceeds the decode cap')
    out = np.empty(sh * sw * 3, np.uint8)
    rc = lib.es_jpeg_decode_rgb(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f'libjpeg failed to decode (rc={rc})')
    return out[:h.value * w.value * 3].reshape(h.value, w.value, 3)


def encode_jpeg_arith(rgb: np.ndarray, quality: int = 85,
                      progressive: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB to an ARITHMETIC-coded JPEG via libjpeg —
    the fixture source for the SOF9/SOF10 decode tier (and a real
    encoder: arithmetic streams run ~5-10% smaller than Huffman)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim == 2:
        rgb = np.dstack([rgb] * 3)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError('encode_jpeg_arith wants (h, w, 3) RGB')
    lib = _shim()
    h, w = rgb.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.es_jpeg_encode(rgb.tobytes(), w, h, int(quality), 1,
                           int(bool(progressive)), ctypes.byref(out))
    if n == 0:
        raise ValueError('libjpeg failed to encode')
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.es_jpeg_free(out)


def _sof_dims(data: bytes):
    """(h, w) from the first SOFn marker, or None."""
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(data[i + 2:i + 4], 'big')
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= len(data):
                return (int.from_bytes(data[i + 5:i + 7], 'big'),
                        int.from_bytes(data[i + 7:i + 9], 'big'))
            return None
        i += 2 + seglen
    return None
