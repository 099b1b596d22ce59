"""Perceptual image hashing: pHash/dHash kernels, Manku multi-block
Hamming candidate join (exact recall, verified precision), and the
image near-dup dedup surfaces end-to-end over real PNG/JPEG blobs."""

import numpy as np
import pytest

from erde_spark.scale.imagehash import (dhash_array, hamming_neardup_pairs,
                                        image_dedup_clusters,
                                        image_exact_dedup, image_hashes,
                                        phash_array)


def _structured(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """A low-frequency-rich test image: gradient + per-seed sinusoid
    mix (pure noise has no stable low-freq content for pHash to latch
    onto, which is also true of real photographs' noise floor)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (80 + 60 * np.sin(2 * np.pi * (rng.uniform(0.5, 3.0) * x / w
                                         + rng.uniform(0.5, 3.0) * y / h))
           + 50 * np.cos(2 * np.pi * rng.uniform(1.0, 4.0) * (x + 2 * y) / (w + h))
           + x * rng.uniform(0.2, 1.0))
    return np.clip(img, 0, 255).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count('1')


def test_phash_deterministic_and_signed():
    img = _structured(1)
    h1, h2 = phash_array(img), phash_array(img.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    assert phash_array(img) != phash_array(_structured(2))


def test_phash_brightness_and_noise_invariance():
    img = _structured(3).astype(np.int32)
    base = phash_array(img)
    brighter = np.clip(img + 15, 0, 255)
    assert _ham(base, phash_array(brighter)) <= 4
    rng = np.random.RandomState(7)
    noisy = np.clip(img + rng.randint(-6, 7, img.shape), 0, 255)
    assert _ham(base, phash_array(noisy)) <= 8
    # unrelated structured images are far apart
    assert _ham(base, phash_array(_structured(11))) >= 16


def test_phash_jpeg_reencode_stable():
    from erde_spark.scale.jpeg import decode_jpeg, encode_jpeg
    img = _structured(5)
    rgb = np.stack([img, img, img], axis=2)
    redec = decode_jpeg(encode_jpeg(rgb, quality=85))
    assert _ham(phash_array(rgb), phash_array(redec)) <= 8


def test_dhash_invariance():
    img = _structured(9).astype(np.int32)
    base = dhash_array(img)
    assert _ham(base, dhash_array(np.clip(img + 20, 0, 255))) <= 4
    assert _ham(base, dhash_array(_structured(13))) >= 12


def test_phash_color_and_small_inputs():
    rgb = np.stack([_structured(4)] * 3, axis=2)
    assert phash_array(rgb) == phash_array(_structured(4))
    # smaller than the 32x32 DCT grid: upscale path
    tiny = _structured(6, h=10, w=12)
    assert isinstance(phash_array(tiny), int)
    assert isinstance(dhash_array(_structured(6, h=5, w=4)), int)


def _rand64(rng) -> int:
    v = int(rng.getrandbits(64))
    return v - (1 << 64) if v >= (1 << 63) else v


def _flip(h: int, rng, k: int) -> int:
    u = h & ((1 << 64) - 1)
    for bit in rng.sample(range(64), k):
        u ^= (1 << bit)
    return u - (1 << 64) if u >= (1 << 63) else u


@pytest.mark.parametrize('max_h,n_blocks', [(3, None), (4, None), (4, 6), (6, None)])
def test_hamming_pairs_exact_recall(spark, max_h, n_blocks):
    """Pigeonhole guarantee: every pair within max_hamming is found, and
    every reported pair's distance verifies."""
    import random
    rng = random.Random(42 + max_h)
    rows, planted = [], []
    nid = 0
    for base_i in range(25):
        h = _rand64(rng)
        rows.append((nid, h))
        a_id = nid
        nid += 1
        k = base_i % (max_h + 1)
        rows.append((nid, _flip(h, rng, k)))
        planted.append((a_id, nid, k))
        nid += 1
    for _ in range(150):
        rows.append((nid, _rand64(rng)))
        nid += 1
    df = spark.createDataFrame(rows, 'asset_id long, phash long')
    got = {(r['id_a'], r['id_b']): r['hamming']
           for r in hamming_neardup_pairs(df, max_hamming=max_h,
                                          n_blocks=n_blocks).collect()}
    for a, b, k in planted:
        assert (a, b) in got, (a, b, k)
        assert got[(a, b)] == k
    hmap = dict(rows)
    for (a, b), d in got.items():
        assert d == _ham(hmap[a], hmap[b]) and d <= max_h


def test_hamming_pairs_exact_zero(spark):
    df = spark.createDataFrame([(1, 5), (2, 5), (3, 9)], 'asset_id long, phash long')
    got = {(r['id_a'], r['id_b']) for r in
           hamming_neardup_pairs(df, max_hamming=0).collect()}
    assert got == {(1, 2)}


def test_hamming_pairs_guards(spark):
    df = spark.createDataFrame([(1, 5)], 'asset_id long, phash long')
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, max_hamming=20)
    with pytest.raises(ValueError):
        hamming_neardup_pairs(df, max_hamming=4, n_blocks=3)


def test_image_hashes_end_to_end(spark):
    """PNG original + JPEG re-encode of the same image hash near each
    other; distinct images land in distinct clusters."""
    from erde_spark.scale.jpeg import encode_jpeg
    from erde_spark.scale.multimodal import ASSET_SCHEMA
    from erde_spark.scale.png import encode_png
    rows = []
    for g in range(3):
        img = _structured(20 + g)
        rgb = np.stack([img, img, img], axis=2)
        rows.append((g * 2, bytearray(encode_png(rgb)),
                     ('image/png', 64, 64, None)))
        rows.append((g * 2 + 1, bytearray(encode_jpeg(rgb, quality=90)),
                     ('image/jpeg', 64, 64, None)))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    hashes = image_hashes(assets).cache()
    got = {r['asset_id']: (r['phash'], r['dhash']) for r in hashes.collect()}
    assert len(got) == 6
    for g in range(3):
        assert _ham(got[g * 2][0], got[g * 2 + 1][0]) <= 10, g
    for g1 in range(3):
        for g2 in range(g1 + 1, 3):
            assert _ham(got[g1 * 2][0], got[g2 * 2][0]) >= 16

    comp = {r['asset_id']: r['hash_component']
            for r in image_dedup_clusters(hashes, max_hamming=12).collect()}
    assert len(comp) == 6
    for g in range(3):
        assert comp[g * 2] == comp[g * 2 + 1], g
    assert len({comp[g * 2] for g in range(3)}) == 3
    hashes.unpersist()


def test_image_exact_dedup_and_skip(spark):
    """Byte-different containers of the SAME pixels share a pHash (PNG
    filter variants); corrupt blobs drop under on_error='skip'."""
    from erde_spark.scale.multimodal import ASSET_SCHEMA
    from erde_spark.scale.png import encode_png
    img = np.stack([_structured(31)] * 3, axis=2)
    rows = [
        (1, bytearray(encode_png(img, filter_type=0)), ('image/png', 64, 64, None)),
        (2, bytearray(encode_png(img, filter_type=2)), ('image/png', 64, 64, None)),
        (3, bytearray(b'\x89PNG\r\n\x1a\nbroken'), ('image/png', 8, 8, None)),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    with pytest.raises(Exception):
        image_hashes(assets, on_error='raise').collect()
    hashes = image_hashes(assets, on_error='skip')
    kept = image_exact_dedup(hashes).collect()
    assert len(kept) == 1 and kept[0]['n_dups'] == 2 and kept[0]['asset_id'] == 1
    with pytest.raises(ValueError):
        image_hashes(assets, on_error='null')
