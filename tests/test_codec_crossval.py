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
