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


def test_lossy_vp8_raises_clearly():
    import struct
    body = b'\x00' * 20
    chunk = b'VP8 ' + struct.pack('<I', len(body)) + body
    blob = b'RIFF' + struct.pack('<I', 4 + len(chunk)) + b'WEBP' + chunk
    with pytest.raises(NotImplementedError):
        decode_webp(blob)


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
