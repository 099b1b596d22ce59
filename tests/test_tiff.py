"""TIFF codec: strip round-trips across compressions/byte orders, the
TIFF-LZW early-change rule, the horizontal predictor, and decode_media
integration."""

import numpy as np
import pytest

from erde_spark.scale.tiff import (decode_tiff, encode_tiff, is_tiff,
                                   _packbits_decode, _tiff_lzw_decode,
                                   _tiff_lzw_encode)


def test_signature():
    assert is_tiff(b'II*\x00' + b'\x00' * 8)
    assert is_tiff(b'MM\x00*' + b'\x00' * 8)
    assert not is_tiff(b'GIF89a')


@pytest.mark.parametrize('shape', [(20, 30), (33, 17, 3), (40, 40, 4)])
@pytest.mark.parametrize('comp', [1, 5, 32773])
@pytest.mark.parametrize('big_endian', [False, True])
def test_roundtrip(shape, comp, big_endian):
    rng = np.random.RandomState(hash((shape, comp)) % 2 ** 31)
    arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
    got = decode_tiff(encode_tiff(arr, compression=comp,
                                  big_endian=big_endian))
    assert got.shape == arr.shape and (got == arr).all()


def test_lzw_early_change_and_reset():
    # enough entropy to push width through 10/11/12 bits and force a
    # clear-code reset at 4093 entries
    rng = np.random.RandomState(7)
    data = bytes(rng.randint(0, 256, size=20000, dtype=np.uint8))
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_packbits_runs():
    # spec example shape: literal + replicate mix
    encoded = bytes([2, 10, 20, 30, 257 - 3, 77, 0, 5])
    assert _packbits_decode(encoded, 7) == bytes([10, 20, 30, 77, 77, 77, 5])


def test_predictor_roundtrip():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(25, 300, 3), dtype=np.uint8)
    got = decode_tiff(encode_tiff(arr, predictor=True))
    assert (got == arr).all()


def test_unsupported_paths_raise():
    with pytest.raises(ValueError):
        decode_tiff(b'II+\x00' + b'\x00' * 20)
    blob = encode_tiff(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        decode_tiff(blob[:16])


def test_decode_media_integration(spark):
    from erde_spark.scale.multimodal import ASSET_SCHEMA, extract_features
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, size=(14, 11, 3), dtype=np.uint8)
    blob = encode_tiff(arr, compression=5)
    assets = spark.createDataFrame(
        [(1, bytearray(blob), ('image/tiff', 11, 14, len(blob)))],
        ASSET_SCHEMA)
    row = extract_features(assets, fake=False).first()
    assert row['feat_mean'] == pytest.approx(float(arr.astype(np.float64).mean()))
