"""Cross-validate every pure-Python image codec against the system
libgd (libpng/libjpeg/libgif/libtiff/libwebp behind one C API) in both
directions — an independent implementation catches self-consistent
encoder+decoder misreadings that round-trip tests structurally cannot
(the VP8L distance-map and code-length-code bugs were found exactly
this way)."""

import numpy as np
import pytest

from tests import gd_oracle as gd

pytestmark = pytest.mark.skipif(not gd.available(),
                                reason='libgd not dlopen-able')


def _rgb(h, w, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


def _smooth(h, w, seed):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [128 + 90 * np.sin(2 * np.pi * (fx * x / w + fy * y / h))
             for fx, fy in rng.uniform(0.5, 2.5, (3, 2))]
    return np.clip(np.dstack(chans), 0, 255).astype(np.uint8)


def _as_rgb(arr):
    if arr.ndim == 2:
        return np.dstack([arr] * 3)
    return arr[:, :, :3]


# ------------------------------------------------------------------ PNG

@pytest.mark.parametrize('seed,shape', [(1, (8, 8)), (2, (23, 17)),
                                        (3, (1, 40)), (4, (40, 1))])
def test_png_ours_to_gd(seed, shape):
    from erde_spark.scale.png import encode_png
    arr = _rgb(*shape, seed)
    for ft in (0, 1, 2, 3, 4):
        assert (gd.decode(encode_png(arr, filter_type=ft), 'png')
                == arr).all(), ft


def test_png_gd_to_ours():
    from erde_spark.scale.png import decode_png
    for seed, shape in [(5, (9, 13)), (6, (32, 32))]:
        arr = _rgb(*shape, seed)
        got = decode_png(gd.encode(arr, 'png'))
        assert (_as_rgb(got) == arr).all()


def test_png_palette_ours_to_gd():
    from erde_spark.scale.png import encode_png_palette
    rng = np.random.RandomState(7)
    pal = rng.randint(0, 256, (11, 3), dtype=np.uint8)
    arr = pal[rng.randint(0, 11, (14, 19))]
    assert (gd.decode(encode_png_palette(arr), 'png') == arr).all()


# ----------------------------------------------------------------- JPEG

def test_jpeg_ours_to_gd_and_back():
    """Both decoders on the same bytes must agree within IDCT rounding
    (±2/channel), in both encode directions (ours -> libjpeg and
    libjpeg -> ours), for baseline AND progressive streams."""
    from erde_spark.scale.jpeg import (decode_jpeg, encode_jpeg,
                                       encode_jpeg_progressive)
    arr = _smooth(24, 32, 8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        blob = enc(arr, quality=90)
        ours = _as_rgb(decode_jpeg(blob)).astype(np.int16)
        theirs = gd.decode(blob, 'jpeg').astype(np.int16)
        assert abs(ours - theirs).max() <= 2, enc.__name__
    blob = gd.encode(arr, 'jpeg', quality=92)
    ours = _as_rgb(decode_jpeg(blob)).astype(np.int16)
    theirs = gd.decode(blob, 'jpeg').astype(np.int16)
    assert abs(ours - theirs).max() <= 2


# ------------------------------------------------------------------ GIF

def test_gif_ours_to_gd():
    from erde_spark.scale.gif import encode_gif
    rng = np.random.RandomState(9)
    arr = rng.randint(0, 256, (13, 21), dtype=np.uint8)  # gray palette
    for interlace in (False, True):
        got = gd.decode(encode_gif(arr, interlace=interlace), 'gif')
        assert (got == np.dstack([arr] * 3)).all(), interlace


def test_gif_gd_to_ours():
    from erde_spark.scale.gif import decode_gif
    rng = np.random.RandomState(10)
    pal = rng.randint(0, 256, (32, 3), dtype=np.uint8)
    arr = pal[rng.randint(0, 32, (17, 11))]
    blob = gd.encode(arr, 'gif')
    got = _as_rgb(decode_gif(blob))
    assert (got == gd.decode(blob, 'gif')).all()


# ----------------------------------------------------------------- TIFF

def test_tiff_ours_to_gd():
    from erde_spark.scale.tiff import encode_tiff
    arr = _rgb(15, 22, 11)
    for comp in (1, 5):  # none, LZW
        assert (gd.decode(encode_tiff(arr, compression=comp), 'tiff')
                == arr).all(), comp


def test_tiff_gd_to_ours():
    from erde_spark.scale.tiff import decode_tiff
    arr = _rgb(12, 18, 12)
    got = _as_rgb(decode_tiff(gd.encode(arr, 'tiff')))
    assert (got == arr).all()


def _libtiff_rgba(blob: bytes, w: int, h: int):
    """Decode a TIFF through libtiff DIRECTLY (TIFFOpen +
    TIFFReadRGBAImageOriented) -> (h, w, 4) uint8. Used where gd's
    memory-IO wrapper trips libtiff's uncompressed-bytecount
    validation on files libtiff itself accepts (verified: the same
    bytes open and decode cleanly through TIFFOpen)."""
    import ctypes
    import os
    import tempfile

    import numpy as np
    lt = ctypes.CDLL('libtiff.so.6')
    lt.TIFFOpen.restype = ctypes.c_void_p
    lt.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lt.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lt.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int]
    lt.TIFFClose.argtypes = [ctypes.c_void_p]
    p = tempfile.mktemp(suffix='.tif')
    try:
        with open(p, 'wb') as f:
            f.write(blob)
        tif = lt.TIFFOpen(p.encode(), b'r')
        assert tif, 'libtiff refused the file'
        buf = (ctypes.c_uint32 * (w * h))()
        ok = lt.TIFFReadRGBAImageOriented(tif, w, h, buf, 1, 0)
        lt.TIFFClose(tif)
        assert ok == 1, 'libtiff failed to decode'
        return np.frombuffer(bytes(buf), np.uint8).reshape(h, w, 4)
    finally:
        os.unlink(p)


def test_tiff_tiled_ours_to_libtiff():
    """TILED layouts (round 6): our tiled writer's files decode
    bit-exact through libtiff — non-multiple image sizes exercise
    padded edge tiles; LZW + predictor ride the tile path (via gd);
    uncompressed tiles via direct libtiff."""
    import numpy as np

    from erde_spark.scale.tiff import encode_tiff
    arr = _rgb(45, 61, 13)  # not a multiple of the tile edge
    for pred in (False, True):
        blob = encode_tiff(arr, compression=5, tiled=16, predictor=pred)
        assert (gd.decode(blob, 'tiff') == arr).all(), pred
    got = _libtiff_rgba(encode_tiff(arr, compression=1, tiled=16), 61, 45)
    assert (got[:, :, :3] == arr).all()
    # grayscale tiled too (libtiff expands to RGB)
    g = np.arange(45 * 61, dtype=np.uint64).reshape(45, 61)
    g = (g * 37 % 251).astype(np.uint8)
    got = gd.decode(encode_tiff(g, compression=5, tiled=32), 'tiff')
    assert (got == np.dstack([g] * 3)).all()


def test_tiff_16bit_ours_to_libtiff():
    """16-BIT samples (round 6): libtiff's RGBA reader scales 16->8 by
    the high byte, so our 16-bit files (both byte orders, strip and
    tiled) must decode through libtiff to exactly ours >> 8."""
    import numpy as np

    from erde_spark.scale.tiff import decode_tiff, encode_tiff
    rng = np.random.RandomState(5)
    arr16 = rng.randint(0, 65536, size=(30, 41, 3)).astype(np.uint16)
    for be in (False, True):
        for tiled in (None, 16):
            blob = encode_tiff(arr16, big_endian=be, tiled=tiled)
            ours = decode_tiff(blob)
            assert ours.dtype == np.uint16
            assert (ours == arr16).all()
            theirs = _libtiff_rgba(blob, 41, 30)
            # libtiff ROUNDS the 16->8 conversion (not a plain >>8),
            # so agreement is within 1 LSB of the high byte — still a
            # strong pin: any byte-order or tile-layout mistake would
            # scatter values across the full range
            diff = theirs[:, :, :3].astype(int) - (arr16 >> 8).astype(int)
            assert np.abs(diff).max() <= 1, (be, tiled)


# ------------------------------------------------------------------ BMP

def test_bmp_ours_to_gd():
    from erde_spark.scale.png import encode_bmp
    arr = _rgb(10, 14, 13)
    assert (gd.decode(encode_bmp(arr), 'bmp') == arr).all()


# ------------------------------------------------- WebP (third decoder)

def test_webp_ours_to_gd():
    """Our VP8L bytes through libgd's decoder (libwebp via a different
    call path than webp_native)."""
    from erde_spark.scale.webp import encode_webp
    arr = _rgb(11, 16, 14)
    blob = encode_webp(arr, subtract_green=True)
    assert (gd.decode(blob, 'webp') == arr).all()
