"""GIF codec: LZW round-trips across code-width growth and table
overflow, interlace, transparency, frame counting, and decode_media
integration."""

import numpy as np
import pytest

from erde_spark.scale.gif import (decode_gif, encode_gif, gif_frame_count,
                                  is_gif)


def test_signature():
    assert is_gif(b'GIF89a' + b'\x00' * 10)
    assert is_gif(b'GIF87a' + b'\x00' * 10)
    assert not is_gif(b'\x89PNG\r\n\x1a\n')


def test_roundtrip_gray_gradient():
    arr = np.tile(np.arange(64, dtype=np.uint8) * 4, (16, 1))
    got = decode_gif(encode_gif(arr))
    assert got.shape == (16, 64, 3)
    assert (got[:, :, 0] == arr).all() and (got[:, :, 1] == arr).all()


def test_roundtrip_noise_forces_width_growth():
    # random indices build a deep LZW table: width 9->12 plus at least
    # one clear-code reset at 4096 entries
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(80, 90), dtype=np.uint8)
    got = decode_gif(encode_gif(arr))
    assert (got[:, :, 0] == arr).all()


def test_roundtrip_rgb():
    rng = np.random.RandomState(1)
    palette = rng.randint(0, 256, size=(40, 3), dtype=np.uint8)
    idx = rng.randint(0, 40, size=(30, 50))
    rgb = palette[idx]
    got = decode_gif(encode_gif(rgb))
    assert got.shape == (30, 50, 3)
    assert (got == rgb).all()


def test_roundtrip_interlaced():
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, size=(37, 23), dtype=np.uint8)  # odd height
    got = decode_gif(encode_gif(arr, interlace=True))
    assert (got[:, :, 0] == arr).all()


def test_transparency_gives_rgba():
    arr = np.zeros((4, 4), np.uint8)
    arr[1, 1] = 7
    got = decode_gif(encode_gif(arr, transparent=7))
    assert got.shape == (4, 4, 4)
    assert got[1, 1, 3] == 0 and got[0, 0, 3] == 255


def test_frame_count():
    arr = np.zeros((6, 6), np.uint8)
    one = encode_gif(arr)
    assert gif_frame_count(one) == 1
    # splice a second frame before the trailer
    body = one[:-1]
    second = encode_gif(arr)[13 + 768:]  # strip header+GCT, keep frame+trailer
    two = body + second
    assert gif_frame_count(two) == 2
    assert decode_gif(two).shape == (6, 6, 3)  # first frame decodes


def test_corrupt_rejected():
    with pytest.raises(ValueError):
        decode_gif(b'GIF89a' + b'\x00' * 6)
    blob = encode_gif(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        decode_gif(blob[:20])


def test_decode_media_integration(spark):
    from erde_spark.scale.multimodal import ASSET_SCHEMA, extract_features
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(12, 9), dtype=np.uint8)
    blob = encode_gif(arr)
    assets = spark.createDataFrame(
        [(1, bytearray(blob), ('image/gif', 9, 12, len(blob)))], ASSET_SCHEMA)
    row = extract_features(assets, fake=False).first()
    assert row['feat_mean'] == pytest.approx(
        float(np.stack([arr] * 3, axis=2).mean()))
