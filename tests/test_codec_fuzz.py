"""Corrupt-blob robustness: every decoder must either decode or raise
a clean error on TRUNCATED valid files and on bit-flipped bytes —
never hang, loop, or escape with an unexpected exception type. This is
the decode-tier contract a 100 TB crawl column depends on
(decode_media maps these raises through on_error='skip'/'null')."""

import zlib

import numpy as np
import pytest

OK_ERRORS = (ValueError, NotImplementedError, KeyError, IndexError,
             struct_error := __import__('struct').error, EOFError,
             zlib.error, OverflowError)


def _smooth(h, w, seed=1):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [128 + 90 * np.sin(2 * np.pi * (fx * x / w + fy * y / h))
             for fx, fy in rng.uniform(0.5, 2.5, (3, 2))]
    return np.clip(np.dstack(chans), 0, 255).astype(np.uint8)


def _codecs():
    from erde_spark.scale.gif import decode_gif, encode_gif
    from erde_spark.scale.jpeg import decode_jpeg, encode_jpeg
    from erde_spark.scale.png import (decode_bmp, decode_png, encode_bmp,
                                      encode_png)
    from erde_spark.scale.tiff import decode_tiff, encode_tiff
    from erde_spark.scale.webp import decode_webp, encode_webp
    arr = _smooth(16, 20)
    return [
        ('png', encode_png(arr), decode_png),
        ('jpeg', encode_jpeg(arr, quality=85), decode_jpeg),
        ('gif', encode_gif(arr[:, :, 0]), decode_gif),
        ('tiff', encode_tiff(arr, compression=5), decode_tiff),
        ('tiff_tiled', encode_tiff(arr, compression=5, tiled=16,
                                   predictor=True), decode_tiff),
        ('tiff16', encode_tiff(
            (arr.astype(np.uint16) << 8) | arr, big_endian=True,
            tiled=16), decode_tiff),
        ('bmp', encode_bmp(arr), decode_bmp),
        ('webp', encode_webp(arr), decode_webp),
    ]


@pytest.mark.parametrize('name', ['png', 'jpeg', 'gif', 'tiff',
                                  'tiff_tiled', 'tiff16', 'bmp',
                                  'webp'])
def test_truncation_decodes_or_raises_cleanly(name):
    codecs = {n: (b, d) for n, b, d in _codecs()}
    blob, dec = codecs[name]
    # every ~17th prefix length + the near-full tail region
    cuts = list(range(0, len(blob), max(1, len(blob) // 60)))
    cuts += list(range(max(0, len(blob) - 8), len(blob)))
    for cut in cuts:
        try:
            out = dec(blob[:cut])
            assert out is not None
        except OK_ERRORS:
            pass  # clean rejection is the contract


@pytest.mark.parametrize('name', ['png', 'jpeg', 'gif', 'tiff',
                                  'tiff_tiled', 'tiff16', 'bmp',
                                  'webp'])
def test_bitflips_decode_or_raise_cleanly(name):
    codecs = {n: (b, d) for n, b, d in _codecs()}
    blob, dec = codecs[name]
    rng = np.random.RandomState(zlib.crc32(name.encode()))
    for _ in range(300):
        pos = int(rng.randint(0, len(blob)))
        bit = 1 << int(rng.randint(0, 8))
        bad = bytearray(blob)
        bad[pos] ^= bit
        try:
            dec(bytes(bad))
        except OK_ERRORS:
            pass


def test_mp4_truncation_clean():
    from erde_spark.scale.mp4 import encode_mp4_mjpeg, parse_mp4
    blob = encode_mp4_mjpeg([_smooth(16, 16)[:, :, 0]] * 2, fps=4)
    for cut in range(0, len(blob), max(1, len(blob) // 50)):
        try:
            parse_mp4(blob[:cut])
        except OK_ERRORS:
            pass


def test_warc_truncation_clean():
    from io import BytesIO

    from erde_spark.io.warc import encode_warc, parse_warc_records
    blob = encode_warc(
        [{'type': 'conversion', 'payload': b'x' * 50}] * 3,
        compress=False)
    for cut in range(0, len(blob), 7):
        list(parse_warc_records(BytesIO(blob[:cut])))  # never raises


def test_megatron_idx_truncation_and_bitflips_clean():
    """The indexed-dataset index parser honors the same corrupt-blob
    contract as the media decoders: every truncation and every
    single-byte corruption of a valid .idx either parses (payload
    bytes that don't affect header consistency) or raises a clean
    IOError/ValueError-family error — never hangs or escapes with an
    unexpected type."""
    import struct

    from erde_spark.io.megatron import parse_idx
    sizes = np.asarray([3, 0, 5, 2], np.int32)
    pointers = np.asarray([0, 12, 12, 32], np.int64)
    doc_idx = np.arange(5, dtype=np.int64)
    buf = (b'MMIDIDX\x00\x00' + struct.pack('<Q', 1) +
           struct.pack('<B', 4) + struct.pack('<Q', 4) +
           struct.pack('<Q', 5) + sizes.tobytes() +
           pointers.tobytes() + doc_idx.tobytes())
    parse_idx(buf)  # the intact blob must parse
    errs = OK_ERRORS + (IOError,)
    for cut in range(len(buf)):
        try:
            parse_idx(buf[:cut])
        except errs:
            pass
    for pos in range(len(buf)):
        b = bytearray(buf)
        b[pos] ^= 0xFF
        try:
            parse_idx(bytes(b))
        except errs:
            pass


def test_npy_header_truncation_and_bitflips_clean(tmp_path):
    """The .npy header parser (io/npy.py) must decode or raise cleanly
    on truncated and bit-flipped headers — never hang or escape with an
    unexpected exception type."""
    import io

    from erde_spark.io.npy import read_npy_header
    blob = io.BytesIO()
    np.save(blob, np.arange(60, dtype=np.float32).reshape(12, 5))
    data = blob.getvalue()
    # round-trip parity with numpy's own writer first
    descr, shape, off = read_npy_header(io.BytesIO(data))
    assert descr == '<f4' and shape == (12, 5)
    assert np.frombuffer(data[off:], '<f4').size == 60
    for cut in range(0, len(data), 7):
        try:
            read_npy_header(io.BytesIO(data[:cut]))
        except OK_ERRORS:
            pass
        except SyntaxError:
            pass  # ast.literal_eval on a truncated dict literal
    rng = np.random.RandomState(5)
    for _ in range(200):
        b = bytearray(data)
        i = rng.randint(len(b))
        b[i] ^= 1 << rng.randint(8)
        try:
            read_npy_header(io.BytesIO(bytes(b)))
        except OK_ERRORS:
            pass
        except SyntaxError:
            pass


def test_npy_header_parity_hypothesis():
    """Property: for every supported dtype and 1-D/2-D shape, our
    header parser agrees with numpy's own writer (descr, shape, and
    data offset)."""
    import io

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from erde_spark.io.npy import _DTYPES, read_npy_header

    @settings(max_examples=60, deadline=None)
    @given(descr=st.sampled_from(sorted(_DTYPES)),
           rows=st.integers(0, 40),
           cols=st.one_of(st.none(), st.integers(1, 40)))
    def prop(descr, rows, cols):
        npt = _DTYPES[descr][0]
        shape = (rows,) if cols is None else (rows, cols)
        arr = np.zeros(shape, dtype=npt)
        blob = io.BytesIO()
        np.save(blob, arr)
        blob.seek(0)
        d, s, off = read_npy_header(blob)
        assert d == descr and s == shape
        assert len(blob.getvalue()) - off == arr.nbytes

    prop()
