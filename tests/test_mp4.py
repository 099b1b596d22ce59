"""ISO-BMFF (MP4) container parsing: box walk, field extraction,
frame-range planning, corrupt-blob tolerance, Spark surfaces."""

import pytest

from erde_spark.scale.mp4 import (decode_sample, encode_mp4_stub,
                                  frame_sample_ranges, is_mp4, mp4_metadata,
                                  parse_mp4, sample_ranges)


def test_parse_roundtrip_fields():
    blob = encode_mp4_stub(n_frames=24, fps=12, width=320, height=240,
                           frame_bytes=100)
    m = parse_mp4(blob)
    assert m['brand'] == 'isom'
    assert m['duration_sec'] == pytest.approx(2.0)
    t = m['tracks'][0]
    assert t['handler'] == 'vide' and t['codec'] == 'avc1'
    assert (t['width'], t['height']) == (320.0, 240.0)
    assert t['n_samples'] == 24 and t['fps'] == pytest.approx(12.0)


def test_sample_ranges_hit_real_bytes():
    blob = encode_mp4_stub(n_frames=8, frame_bytes=16)
    rng = sample_ranges(parse_mp4(blob)['tracks'][0])
    assert len(rng) == 8
    for i, (off, sz) in enumerate(rng):
        assert blob[off:off + sz] == bytes([(i * 7 + j) % 256
                                            for j in range(sz)])


def test_co64_path():
    blob = encode_mp4_stub(n_frames=5, use64=True)
    rng = sample_ranges(parse_mp4(blob)['tracks'][0])
    assert len(rng) == 5
    off, sz = rng[0]
    assert blob[off:off + sz] == bytes([j % 256 for j in range(sz)])


def test_reject_and_truncation():
    assert not is_mp4(b'PK\x03\x04....')
    with pytest.raises(ValueError):
        parse_mp4(b'RIFFxxxxWAVE' + b'\x00' * 20)
    blob = encode_mp4_stub()
    with pytest.raises(ValueError):
        parse_mp4(blob[:30])  # ftyp only, no moov
    # truncation INSIDE moov: box walk stops cleanly -> no mvhd -> ValueError
    with pytest.raises(ValueError):
        parse_mp4(blob[:len(blob) // 4])


def test_decode_sample_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_sample(b'', 0, 10)


def test_avcc_extraction_and_gated_h264_path():
    """The stsd parser surfaces the avcC decoder-configuration record
    for avc1 entries, and the H.264 decode path is availability-gated:
    on hosts without libavcodec (this container) it raises the
    documented NotImplementedError naming the shim; unsupported codec
    fourccs raise regardless."""
    from erde_spark.scale import h264_native
    from erde_spark.scale.mp4 import parse_mp4, sample_ranges
    cfg = bytes([1, 0x64, 0x00, 0x1F, 0xFF, 0xE1, 0, 4, 0x67, 1, 2, 3,
                 1, 0, 2, 0x68, 5])  # shaped like a real avcC record
    blob = encode_mp4_stub(n_frames=4, dec_config=cfg)
    vid = next(t for t in parse_mp4(blob)['tracks']
               if t['handler'] == 'vide')
    assert vid['codec'] == 'avc1'
    assert vid['dec_config'] == cfg
    off, sz = sample_ranges(vid)[0]
    if h264_native.available():
        pytest.skip('host has libavcodec; the fake NAL sample is not '
                    'decodable, only the gate is under test here')
    assert not h264_native.available()
    with pytest.raises(NotImplementedError, match='libavcodec'):
        decode_sample(blob, off, sz, vid)
    with pytest.raises(NotImplementedError, match='libavcodec'):
        h264_native.decode_video_frame_luma('hvc1', None, b'\x00\x00')
    with pytest.raises(NotImplementedError, match='unsupported'):
        h264_native.decode_video_frame_luma('vp09', None, b'\x00\x00')


def test_video_frame_hashes_skips_gated_codec(spark):
    """on_error='skip' lets a mixed corpus flow past codec-gated
    assets; on_error='raise' surfaces the gate."""
    import pandas as pd

    from erde_spark.scale import h264_native
    from erde_spark.scale.mp4 import video_frame_hashes
    if h264_native.available():
        pytest.skip('host has libavcodec')
    blob = encode_mp4_stub(n_frames=4, dec_config=b'\x01\x64\x00\x1f')
    df = spark.createDataFrame(
        pd.DataFrame({'asset_id': [1], 'media': [blob]}))
    assert video_frame_hashes(df, on_error='skip').count() == 0
    with pytest.raises(Exception, match='libavcodec'):
        video_frame_hashes(df, on_error='raise').count()


def test_mp4_metadata_spark(spark):
    from erde_spark.scale.multimodal import ASSET_SCHEMA
    rows = []
    for aid in range(4):
        blob = encode_mp4_stub(n_frames=10 + aid, fps=10,
                               width=64 + aid * 16, height=48)
        rows.append((aid, bytearray(blob), ('video/mp4', None, None, len(blob))))
    rows.append((99, bytearray(b'garbage'), ('video/mp4', None, None, 7)))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    with pytest.raises(Exception):
        mp4_metadata(assets, on_error='raise').collect()
    got = {r['asset_id']: r for r in
           mp4_metadata(assets, on_error='skip').collect()}
    assert set(got) == {0, 1, 2, 3}
    for aid in got:
        r = got[aid]
        assert r['n_frames'] == 10 + aid
        assert r['width'] == 64 + aid * 16 and r['height'] == 48
        assert r['duration_sec'] == pytest.approx((10 + aid) / 10)
        assert r['video_codec'] == 'avc1' and r['brand'] == 'isom'


def test_frame_sample_ranges_spark(spark):
    from erde_spark.scale.multimodal import ASSET_SCHEMA
    blob = encode_mp4_stub(n_frames=23, frame_bytes=40)
    assets = spark.createDataFrame(
        [(7, bytearray(blob), ('video/mp4', None, None, len(blob)))],
        ASSET_SCHEMA)
    plan = frame_sample_ranges(assets, every_n=5).collect()
    assert [r['frame_idx'] for r in sorted(plan, key=lambda r: r['frame_idx'])] \
        == [0, 5, 10, 15, 20]
    for r in plan:
        off, sz = r['byte_offset'], r['byte_size']
        i = r['frame_idx']
        assert blob[off:off + sz] == bytes([(i * 7 + j) % 256
                                            for j in range(sz)])


# ------------------------------------------------- MJPEG frame decode

def _frames(seed, n=6, noise=None, h=32, w=32):
    import numpy as np
    rng = np.random.RandomState(seed)
    fx, fy = rng.uniform(0.5, 2.5, 2)
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w].astype(np.float64)
        img = 120 + 80 * np.sin(2 * np.pi * (fx * x / w + fy * y / h)
                                + i * 0.3)
        for _ in range(3):
            y0, x0 = rng.randint(0, h - 8, 2)
            img[y0:y0 + 8, x0:x0 + 8] += rng.uniform(-60, 60)
        if noise is not None:
            nrng = np.random.RandomState(noise + i)
            img = img + nrng.randint(-3, 4, img.shape)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def test_mjpeg_samples_decode_for_real():
    import numpy as np

    from erde_spark.scale.jpeg import decode_jpeg
    from erde_spark.scale.mp4 import (encode_mp4_mjpeg, parse_mp4,
                                      sample_ranges)
    frames = _frames(1, n=4)
    blob = encode_mp4_mjpeg(frames, fps=8)
    meta = parse_mp4(blob)
    vid = next(t for t in meta['tracks'] if t['handler'] == 'vide')
    assert vid['codec'] == 'jpeg' and vid['n_samples'] == 4
    ranges = sample_ranges(vid)
    assert len(ranges) == 4
    for i, (off, sz) in enumerate(ranges):
        arr = decode_sample(blob, off, sz)
        # byte range really isolates one complete JPEG
        assert (arr == decode_jpeg(blob[off:off + sz])).all()
        assert arr.shape[:2] == (32, 32)
        # lossy but close
        err = arr.astype(float) - np.dstack([frames[i]] * arr.shape[2]) \
            if arr.ndim == 3 else arr.astype(float) - frames[i]
        assert abs(err).mean() < 8.0


def test_video_neardup_via_frame_phash(spark):
    """End-to-end video near-dup: MJPEG fixtures -> frame decode ->
    pHash -> Hamming band join. Video B is a noised copy of A (visual
    near-dup), C is distinct content: A-B frames must match, C must
    match nothing."""
    from erde_spark.scale.imagehash import hamming_neardup_pairs
    from erde_spark.scale.mp4 import encode_mp4_mjpeg, video_frame_hashes
    from erde_spark.scale.multimodal import ASSET_SCHEMA
    vids = {1: encode_mp4_mjpeg(_frames(7)),
            2: encode_mp4_mjpeg(_frames(7, noise=99)),
            3: encode_mp4_mjpeg(_frames(8))}
    assets = spark.createDataFrame(
        [(aid, bytearray(b), ('video/mp4', 32, 32, len(b)))
         for aid, b in vids.items()], ASSET_SCHEMA)
    hashes = video_frame_hashes(assets)
    rows = hashes.collect()
    assert len(rows) == 18  # 3 videos x 6 frames
    # per-frame key so cross-video same-position frames are joinable
    frame_keys = hashes.selectExpr('asset_id * 100 + frame_idx AS asset_id',
                                   'phash')
    pairs = hamming_neardup_pairs(frame_keys, hash_col='phash',
                                  max_hamming=8).collect()
    cross = {(min(r['id_a'], r['id_b']) // 100,
              max(r['id_a'], r['id_b']) // 100)
             for r in pairs
             if r['id_a'] // 100 != r['id_b'] // 100}
    assert (1, 2) in cross  # the noised copy is found
    assert not any(3 in p for p in cross)  # distinct content is not


def test_multichunk_stsc_sample_ranges():
    """Real web MP4s interleave multiple chunks: the stsc/stco walk
    must place every sample at its true byte range. 6 frames in chunks
    of 4+2 (two stsc runs) and chunks of 2+2+2 (one run) both decode
    to the same pixels as the single-chunk layout."""
    from erde_spark.scale.mp4 import (encode_mp4_mjpeg, parse_mp4,
                                      sample_ranges)
    frames = _frames(21, n=6)
    flat = encode_mp4_mjpeg(frames, fps=8)

    def decoded(blob):
        meta = parse_mp4(blob)
        vid = next(t for t in meta['tracks'] if t['handler'] == 'vide')
        ranges = sample_ranges(vid)
        assert len(ranges) == 6
        return [decode_sample(blob, off, sz).tobytes()
                for off, sz in ranges]

    want = decoded(flat)
    for spc in (4, 2, 1):
        blob = encode_mp4_mjpeg(frames, fps=8, samples_per_chunk=spc)
        meta = parse_mp4(blob)
        vid = next(t for t in meta['tracks'] if t['handler'] == 'vide')
        assert len(vid['chunk_offsets']) == -(-6 // spc)
        assert decoded(blob) == want, spc
