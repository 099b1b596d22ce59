

# --------------------------------------------- arithmetic tier (libjpeg)

def test_arithmetic_jpeg_via_libjpeg_shim():
    import numpy as np
    import pytest

    from erde_spark.scale import jpeg_native as jn
    from erde_spark.scale.jpeg import decode_jpeg
    if not jn.available():
        pytest.skip('no gcc/jpeglib on this host')
    rng = np.random.RandomState(5)
    y, x = np.mgrid[0:32, 0:48].astype(np.float64)
    rgb = np.clip(np.dstack(
        [120 + 80 * np.sin(2 * np.pi * (fx * x / 48 + fy * y / 32))
         for fx, fy in rng.uniform(0.5, 2.0, (3, 2))]),
        0, 255).astype(np.uint8)
    for progressive in (False, True):
        blob = jn.encode_jpeg_arith(rgb, quality=90,
                                    progressive=progressive)
        # SOF9 (sequential) / SOF10 (progressive) arithmetic markers
        assert (b'\xff\xca' if progressive else b'\xff\xc9') in blob
        out = decode_jpeg(blob)  # dispatches through the shim
        assert out.shape == (32, 48, 3)
        err = out.astype(float) - rgb
        psnr = 10 * np.log10(255.0 ** 2 / max((err * err).mean(), 1e-9))
        assert psnr >= 32.0, (progressive, psnr)


def test_libjpeg_agrees_with_pure_python_huffman_decoder():
    import numpy as np
    import pytest

    from erde_spark.scale import jpeg_native as jn
    from erde_spark.scale.jpeg import (decode_jpeg, encode_jpeg,
                                       encode_jpeg_progressive)
    if not jn.available():
        pytest.skip('no gcc/jpeglib on this host')
    rng = np.random.RandomState(6)
    rgb = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        blob = enc(rgb, quality=92)
        ours = decode_jpeg(blob)
        theirs = jn.decode_jpeg_native(blob)
        assert abs(ours[:, :, :3].astype(int)
                   - theirs.astype(int)).max() <= 2, enc.__name__
