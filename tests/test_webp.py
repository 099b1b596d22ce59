"""VP8L (lossless WebP) codec: Huffman round-trips, color cache, LZ77
copies, all four transforms (single and composed), meta-Huffman groups,
sub-byte palette packing, lossy-chunk rejection, decode_media wiring."""

import numpy as np
import pytest

from erde_spark.scale.webp import (decode_webp, encode_webp, is_webp,
                                   _lz77_extra, _lz77_prefix, _BitReader,
                                   _BitWriter)


def _rgba(arr):
    if arr.shape[2] == 4:
        return arr
    return np.dstack([arr, np.full(arr.shape[:2], 255, np.uint8)])


def _roundtrip(arr, **kw):
    got = decode_webp(encode_webp(arr, **kw))
    exp = _rgba(arr)
    assert got.shape == exp.shape
    assert (got == exp).all()


def test_signature():
    assert not is_webp(b'RIFFxxxxWAVE' + b'\x00' * 8)
    blob = encode_webp(np.zeros((4, 4, 3), np.uint8))
    assert is_webp(blob)


def test_lz77_prefix_inverse_of_extra():
    for v in list(range(1, 200)) + [500, 4096, 100000]:
        prefix, nbits, extra = _lz77_prefix(v)
        bw = _BitWriter()
        bw.write(extra, nbits)
        br = _BitReader(bw.bytes() + b'\x00')
        assert _lz77_extra(br, prefix) == v, v


@pytest.mark.parametrize('shape', [(10, 13, 3), (24, 17, 4), (1, 1, 3),
                                   (1, 40, 3), (40, 1, 4)])
def test_roundtrip_plain(shape):
    rng = np.random.RandomState(sum(shape))
    _roundtrip(rng.randint(0, 256, size=shape, dtype=np.uint8))


def test_roundtrip_cache_and_rle():
    rng = np.random.RandomState(1)
    base = np.repeat(rng.randint(0, 256, size=(22, 5, 3), dtype=np.uint8),
                     4, axis=1)[:, :19]
    _roundtrip(base, rle=True)
    _roundtrip(base, cache_bits=5)
    _roundtrip(base, rle=True, cache_bits=4)


def test_roundtrip_transforms():
    rng = np.random.RandomState(2)
    base = rng.randint(0, 256, size=(22, 19, 3), dtype=np.uint8)
    _roundtrip(base, subtract_green=True)
    _roundtrip(base, predictor_bits=3)          # all 14 modes, seeded tiles
    _roundtrip(base, color_bits=3)
    _roundtrip(base, predictor_bits=2, color_bits=4, subtract_green=True)


@pytest.mark.parametrize('n_colors,label', [(2, '1bit'), (3, '2bit'),
                                            (12, '4bit'), (200, '8bit')])
def test_roundtrip_palette_packings(n_colors, label):
    rng = np.random.RandomState(n_colors)
    pal = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
    arr = pal[rng.randint(0, n_colors, size=(15, 21))]
    _roundtrip(arr, palette=True)


def test_roundtrip_meta_groups():
    rng = np.random.RandomState(3)
    base = rng.randint(0, 256, size=(22, 19, 3), dtype=np.uint8)
    _roundtrip(base, meta_split=True)
    _roundtrip(base, meta_split=True, cache_bits=4, rle=True)


def test_alpha_preserved():
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, size=(9, 9, 4), dtype=np.uint8)
    got = decode_webp(encode_webp(arr))
    assert (got[:, :, 3] == arr[:, :, 3]).all()


def test_lossy_vp8_garbage_rejected():
    """A VP8 chunk of garbage must fail loudly whichever tier handles
    it: ValueError from libwebp, NotImplementedError when the library
    is absent."""
    import struct
    body = b'\x00' * 20
    chunk = b'VP8 ' + struct.pack('<I', len(body)) + body
    blob = b'RIFF' + struct.pack('<I', 4 + len(chunk)) + b'WEBP' + chunk
    with pytest.raises((NotImplementedError, ValueError)):
        decode_webp(blob)


# ------------------------------------------------- lossy VP8 (libwebp)

native = pytest.importorskip('erde_spark.scale.webp_native')
needs_libwebp = pytest.mark.skipif(not native.available(),
                                   reason='libwebp not dlopen-able')


def _smooth_rgb(h, w, seed=7):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [128 + 90 * np.sin(2 * np.pi * (fx * x / w + fy * y / h))
             for fx, fy in rng.uniform(0.5, 2.5, (3, 2))]
    return np.clip(np.dstack(chans), 0, 255).astype(np.uint8)


@needs_libwebp
def test_lossy_vp8_roundtrip_psnr():
    """encode(lossy, q=92) -> decode through the decode_webp dispatch:
    right shape, opaque alpha, PSNR >= 34 dB on smooth content."""
    rgb = _smooth_rgb(64, 80)
    blob = native.encode_webp_lossy(rgb, quality=92.0)
    assert is_webp(blob) and b'VP8 ' in blob[:20]
    got = decode_webp(blob)
    assert got.shape == (64, 80, 4)
    assert (got[:, :, 3] == 255).all()
    err = got[:, :, :3].astype(np.float64) - rgb
    mse = float((err * err).mean())
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr >= 34.0, psnr


@needs_libwebp
def test_pure_python_vp8l_decoder_matches_libwebp_encoder():
    """Cross-validation with an INDEPENDENT encoder: bytes produced by
    libwebp's lossless encoder must decode bit-for-bit identically in
    the pure-Python VP8L decoder (which has never seen libwebp's choice
    of transforms/meta-Huffman splits)."""
    for seed, shape in [(1, (16, 16)), (2, (33, 21)), (3, (64, 48))]:
        rng = np.random.RandomState(seed)
        base = _smooth_rgb(*shape, seed=seed)
        rgba = np.dstack([base, np.full(shape, 255, np.uint8)])
        if seed == 2:  # low-entropy palette-ish content
            rgba = (rgba // 64) * 64
            rgba[:, :, 3] = 255
        blob = native.encode_webp_lossless_native(rgba)
        ours = decode_webp(blob)
        theirs = native.decode_webp_native(blob)
        assert (ours == theirs).all()
        assert (ours == rgba).all()


@needs_libwebp
def test_lossy_vp8_through_decode_media():
    from erde_spark.scale.multimodal import decode_media
    rgb = _smooth_rgb(32, 32, seed=11)
    arr = decode_media(native.encode_webp_lossy(rgb, 95.0), 'image/webp')
    assert arr.shape == (32, 32, 4)


def test_corrupt_rejected():
    with pytest.raises(ValueError):
        decode_webp(b'RIFF\x10\x00\x00\x00WEBPJUNK\x00\x00\x00\x00')
    blob = encode_webp(np.zeros((4, 4, 3), np.uint8))
    bad = bytearray(blob)
    bad[20] ^= 0xFF  # corrupt the VP8L signature byte
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))


def test_decode_media_integration(spark):
    from erde_spark.scale.multimodal import ASSET_SCHEMA, extract_features
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(11, 8, 3), dtype=np.uint8)
    blob = encode_webp(arr, subtract_green=True)
    assets = spark.createDataFrame(
        [(1, bytearray(blob), ('image/webp', 8, 11, len(blob)))],
        ASSET_SCHEMA)
    row = extract_features(assets, fake=False).first()
    exp = float(_rgba(arr).astype(np.float64).mean())
    assert row['feat_mean'] == pytest.approx(exp)


@needs_libwebp
def test_distance_map_all_120_codes_vs_libwebp():
    """Pin every short-distance plane code against the reference
    decoder: a hand-built one-copy stream per code must copy the same
    source pixel in libwebp as _DIST_MAP says. (This probe is how the
    normative table's irregular tail — dy capped at 7, unmirrored +8
    dx entries — was extracted in the first place.)"""
    import erde_spark.scale.webp as W
    w, h = 17, 10
    n = w * h
    orig = W._tokenize
    try:
        for c in range(1, 121):
            toks = ([('lit', 255, i % 256, 0, 0) for i in range(n - 1)]
                    + [('copy', 1, c)])
            W._tokenize = lambda *a, **k: list(toks)
            arr = np.zeros((h, w, 4), np.uint8)
            arr[:, :, 3] = 255
            out = native.decode_webp_native(W.encode_webp(arr))
            dist = (n - 1) - int(out[h - 1, w - 1][0])
            xx, yy = W._DIST_MAP[c - 1]
            assert dist == max(xx + yy * w, 1), c
    finally:
        W._tokenize = orig


@needs_libwebp
@pytest.mark.parametrize('kw', [
    {}, {'subtract_green': True}, {'cache_bits': 4}, {'rle': True},
    {'predictor_bits': 4}, {'color_bits': 4},
    {'subtract_green': True, 'cache_bits': 6, 'predictor_bits': 3},
])
def test_encoder_conforms_to_libwebp(kw):
    """Bitstreams from the fixture encoder must decode identically in
    the reference decoder across the option matrix — catches
    self-consistent nonconformance (an incomplete code-length code
    lived here undetected until this check existed)."""
    import inspect
    from erde_spark.scale.webp import encode_webp
    sig = inspect.signature(encode_webp).parameters
    kw = {k: v for k, v in kw.items() if k in sig}
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (21, 19, 4), dtype=np.uint8)
    arr[:, :, 3] = 255
    arr[5:9] = arr[4]  # a run for the RLE/LZ77 paths
    blob = encode_webp(arr, **kw)
    assert (native.decode_webp_native(blob) == decode_webp(blob)).all()
    assert (decode_webp(blob) == arr).all()
