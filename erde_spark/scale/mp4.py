"""MP4 / ISO-BMFF container parsing for video curation pipelines.

A 100 TB video-curation pass rarely needs to DECODE frames to be
useful: container metadata (duration, resolution, codec, frame count,
per-sample byte ranges) drives filtering, stratification, and frame
sampling, and it lives in the ``moov`` box tree that this module parses
with stdlib ``struct`` only (ISO/IEC 14496-12 box grammar: 32-bit
size + fourcc, size==1 -> 64-bit largesize, size==0 -> to end).

What's real here: the full box walk, ftyp/mvhd/tkhd/mdhd/hdlr/stsd/
stts/stsz/stco/co64 field extraction, frame-sample planning with REAL
per-sample byte offsets (so a downstream ranged read fetches one
frame's bytes without touching the rest of the blob), and Motion-JPEG
frame DECODE (each MJPEG sample is a complete JPEG, decoded by the
repo's own codec — ``video_frame_hashes`` composes that with the
perceptual-hash kernel into video near-dup dedup). What's stubbed:
H.264/H.265/AAC bitstreams need codec libraries this container doesn't
ship, so ``decode_sample`` raises ``NotImplementedError`` for them
with the sample's true byte range in hand.

Corrupt-blob tolerance follows the media-column reality: truncated or
non-MP4 blobs raise ``ValueError`` from ``parse_mp4``; the Spark
surfaces map that through the standard ``on_error`` knob.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CONTAINERS = {b'moov', b'trak', b'mdia', b'minf', b'stbl', b'edts',
               b'udta', b'mvex'}


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for sibling boxes in
    data[start:end]; stops cleanly at truncation."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], 'big')
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8:pos + 16], 'big')
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b'ftyp'


def _fixed1616(raw: int) -> float:
    return raw / 65536.0


def _full(data: bytes, s: int):
    """(version, flags, body_start) of a FullBox payload."""
    return data[s], int.from_bytes(data[s + 1:s + 4], 'big'), s + 4


def parse_mp4(data: bytes) -> dict:
    """Container metadata dict: ``brand``, ``timescale``,
    ``duration_sec``, and ``tracks`` (one dict per trak with handler,
    codec, timescale, duration_sec, n_samples, and for video
    width/height/fps, for audio channels/sample_rate; plus the
    sample-table arrays needed for ranged reads)."""
    if not is_mp4(data):
        raise ValueError('not an ISO-BMFF stream (no ftyp box)')
    out = {'brand': None, 'timescale': None, 'duration_sec': None,
           'tracks': []}
    for typ, s, e in _boxes(data, 0, len(data)):
        if typ == b'ftyp':
            out['brand'] = data[s:s + 4].decode('latin1')
        elif typ == b'moov':
            _parse_moov(data, s, e, out)
    if out['timescale'] is None:
        raise ValueError('no moov/mvhd box (truncated or streaming-only head)')
    return out


def _parse_moov(data: bytes, s: int, e: int, out: dict) -> None:
    for typ, bs, be in _boxes(data, s, e):
        if typ == b'mvhd':
            v, _, p = _full(data, bs)
            if v == 1:
                ts = int.from_bytes(data[p + 16:p + 20], 'big')
                dur = int.from_bytes(data[p + 20:p + 28], 'big')
            else:
                ts = int.from_bytes(data[p + 8:p + 12], 'big')
                dur = int.from_bytes(data[p + 12:p + 16], 'big')
            out['timescale'] = ts
            out['duration_sec'] = dur / ts if ts else None
        elif typ == b'trak':
            out['tracks'].append(_parse_trak(data, bs, be))


def _parse_trak(data: bytes, s: int, e: int) -> dict:
    tr = {'track_id': None, 'handler': None, 'codec': None,
          'timescale': None, 'duration_sec': None, 'n_samples': 0,
          'width': None, 'height': None, 'fps': None,
          'channels': None, 'sample_rate': None,
          'sample_sizes': None, 'chunk_offsets': None,
          'sample_to_chunk': None, 'dec_config': None}
    for typ, bs, be in _boxes(data, s, e):
        if typ == b'tkhd':
            v, _, p = _full(data, bs)
            tr['track_id'] = int.from_bytes(
                data[p + (16 if v == 1 else 8):][:4], 'big')
            # width/height are the last two 16.16 fields of tkhd
            tr['width'] = _fixed1616(int.from_bytes(data[be - 8:be - 4], 'big'))
            tr['height'] = _fixed1616(int.from_bytes(data[be - 4:be], 'big'))
        elif typ == b'mdia':
            _parse_mdia(data, bs, be, tr)
    # fps from sample count over duration (video tracks)
    if (tr['handler'] == 'vide' and tr['n_samples'] and tr['duration_sec']):
        tr['fps'] = tr['n_samples'] / tr['duration_sec']
    return tr


def _parse_mdia(data: bytes, s: int, e: int, tr: dict) -> None:
    for typ, bs, be in _boxes(data, s, e):
        if typ == b'mdhd':
            v, _, p = _full(data, bs)
            if v == 1:
                ts = int.from_bytes(data[p + 16:p + 20], 'big')
                dur = int.from_bytes(data[p + 20:p + 28], 'big')
            else:
                ts = int.from_bytes(data[p + 8:p + 12], 'big')
                dur = int.from_bytes(data[p + 12:p + 16], 'big')
            tr['timescale'] = ts
            tr['duration_sec'] = dur / ts if ts else None
        elif typ == b'hdlr':
            _, _, p = _full(data, bs)
            tr['handler'] = data[p + 4:p + 8].decode('latin1')
        elif typ == b'minf':
            for t2, s2, e2 in _boxes(data, bs, be):
                if t2 == b'stbl':
                    _parse_stbl(data, s2, e2, tr)


def _parse_stbl(data: bytes, s: int, e: int, tr: dict) -> None:
    for typ, bs, be in _boxes(data, s, e):
        if typ == b'stsd':
            _, _, p = _full(data, bs)
            n = int.from_bytes(data[p:p + 4], 'big')
            if n >= 1 and p + 12 <= be:
                tr['codec'] = data[p + 8:p + 12].decode('latin1')
                entry = p + 4 + 8  # entry payload after its own size+fourcc
                if tr['handler'] == 'soun' and entry + 28 <= be:
                    tr['channels'] = int.from_bytes(
                        data[entry + 16:entry + 18], 'big')
                    tr['sample_rate'] = _fixed1616(int.from_bytes(
                        data[entry + 24:entry + 28], 'big'))
                if tr['handler'] == 'vide':
                    # the avcC/hvcC decoder-configuration record child
                    # boxes follow VisualSampleEntry's 78 fixed bytes
                    # (ISO 14496-12 §12.1.3); decoders need it verbatim
                    ent_size = int.from_bytes(data[p + 4:p + 8], 'big')
                    ent_end = min(p + 4 + ent_size, be)
                    for ct, cs, ce in _boxes(data, entry + 78, ent_end):
                        if ct in (b'avcC', b'hvcC'):
                            tr['dec_config'] = data[cs:ce]
                            break
        elif typ == b'stts':
            _, _, p = _full(data, bs)
            n = int.from_bytes(data[p:p + 4], 'big')
            total = 0
            for i in range(n):
                q = p + 4 + 8 * i
                if q + 8 > be:
                    break
                total += int.from_bytes(data[q:q + 4], 'big')
            tr['n_samples'] = total
        elif typ == b'stsz':
            _, _, p = _full(data, bs)
            uniform = int.from_bytes(data[p:p + 4], 'big')
            cnt = int.from_bytes(data[p + 4:p + 8], 'big')
            if uniform:
                tr['sample_sizes'] = [uniform] * cnt
            else:
                tr['sample_sizes'] = [
                    int.from_bytes(data[p + 8 + 4 * i:p + 12 + 4 * i], 'big')
                    for i in range(cnt) if p + 12 + 4 * i <= be]
        elif typ == b'stsc':
            _, _, p = _full(data, bs)
            cnt = int.from_bytes(data[p:p + 4], 'big')
            tr['sample_to_chunk'] = [
                (int.from_bytes(data[p + 4 + 12 * i:p + 8 + 12 * i], 'big'),
                 int.from_bytes(data[p + 8 + 12 * i:p + 12 + 12 * i], 'big'))
                for i in range(cnt) if p + 16 + 12 * i <= be]
        elif typ in (b'stco', b'co64'):
            _, _, p = _full(data, bs)
            cnt = int.from_bytes(data[p:p + 4], 'big')
            w = 4 if typ == b'stco' else 8
            tr['chunk_offsets'] = [
                int.from_bytes(data[p + 4 + w * i:p + 4 + w * (i + 1)], 'big')
                for i in range(cnt) if p + 4 + w * (i + 1) <= be]


def sample_ranges(track: dict) -> list[tuple[int, int]]:
    """(byte_offset, byte_size) per sample, honoring the full
    stsc/stco/stsz chunk layout (ISO 14496-12 §8.7.4): each stsc run
    (first_chunk, samples_per_chunk) applies from its first_chunk until
    the next run's; samples are laid out back-to-back inside each
    chunk starting at that chunk's stco offset. A missing stsc (or a
    single chunk) degrades to the flat sequential layout."""
    sizes = track.get('sample_sizes') or []
    offs = track.get('chunk_offsets') or []
    if not sizes or not offs:
        return []
    runs = track.get('sample_to_chunk') or [(1, len(sizes))]
    out = []
    si = 0
    for ci in range(len(offs)):
        spc = runs[0][1]
        for first, n in runs:
            if first <= ci + 1:
                spc = n
            else:
                break
        pos = offs[ci]
        for _ in range(spc):
            if si >= len(sizes):
                return out
            out.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    return out


def decode_sample(data: bytes, offset: int, size: int,
                  track: dict | None = None):
    """Decode one video sample by its byte range. Motion-JPEG samples
    (each sample is a complete JPEG image — the 'jpeg'/'mjpa' sample
    entries) decode for real through the repo's own JPEG codec;
    H.264/HEVC samples decode to their luma plane through the
    availability-gated system-libavcodec shim when ``track`` carries
    the stsd codec + decoder config (this container ships no codec
    library, so there the documented NotImplementedError path runs)."""
    blob = data[offset:offset + size]
    if blob[:2] == b'\xff\xd8':  # JPEG SOI: an MJPEG sample
        from erde_spark.scale.jpeg import decode_jpeg
        return decode_jpeg(blob)
    codec = (track or {}).get('codec')
    from erde_spark.scale.h264_native import _CODEC_IDS, \
        decode_video_frame_luma
    if codec in _CODEC_IDS:
        # H.264/HEVC via the system libavcodec shim (availability-
        # gated: raises NotImplementedError on hosts without it)
        return decode_video_frame_luma(codec, (track or {}).get(
            'dec_config'), blob)
    raise NotImplementedError(
        f'bitstream decode (sample at {offset}+{size}, codec '
        f'{codec!r}) requires a codec library; H.264/HEVC route '
        'through the libavcodec shim when the host provides it '
        '(erde_spark.scale.h264_native), other codecs are unsupported')


# --------------------------------------------------------------- fixtures


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack('>I', 8 + len(payload)) + typ + payload


def _fullbox(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, bytes([version]) + flags.to_bytes(3, 'big') + body)


def encode_mp4_stub(n_frames: int = 24, fps: int = 12, width: int = 64,
                    height: int = 48, timescale: int = 600,
                    frame_bytes: int = 32, use64: bool = False,
                    dec_config: bytes | None = None) -> bytes:
    """Minimal valid single-video-track MP4 whose mdat holds ``n_frames``
    deterministic fake samples of ``frame_bytes`` each — enough real
    structure (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl/stsd/
    stts/stsz/stco|co64/mdat) to exercise every parser path.
    ``dec_config`` appends an ``avcC`` decoder-configuration child to
    the avc1 sample entry (the ISO 14496-15 layout the H.264 decode
    path consumes)."""
    dur = n_frames * timescale // fps
    ftyp = _box(b'ftyp', b'isom' + struct.pack('>I', 512) + b'isomavc1')
    mvhd = _fullbox(b'mvhd', 0, 0, struct.pack(
        '>IIII', 0, 0, timescale, dur) + b'\x00' * 80)
    tkhd = _fullbox(b'tkhd', 0, 7, struct.pack(
        '>IIIII', 0, 0, 1, 0, dur) + b'\x00' * 52
        + struct.pack('>II', width << 16, height << 16))
    mdhd = _fullbox(b'mdhd', 0, 0, struct.pack(
        '>IIIIHH', 0, 0, timescale, dur, 0x55c4, 0))
    hdlr = _fullbox(b'hdlr', 0, 0, struct.pack('>I', 0) + b'vide'
                    + b'\x00' * 12 + b'fake\x00')
    avc1 = _box(b'avc1', b'\x00' * 6 + struct.pack('>H', 1)
                + b'\x00' * 16 + struct.pack('>HH', width, height)
                + b'\x00' * 50
                + (_box(b'avcC', dec_config) if dec_config else b''))
    stsd = _fullbox(b'stsd', 0, 0, struct.pack('>I', 1) + avc1)
    stts = _fullbox(b'stts', 0, 0, struct.pack(
        '>III', 1, n_frames, timescale // fps))
    stsc = _fullbox(b'stsc', 0, 0, struct.pack('>IIII', 1, 1, n_frames, 1))
    stsz = _fullbox(b'stsz', 0, 0, struct.pack('>III', frame_bytes, n_frames, 0))
    frames = b''.join(bytes([(i * 7 + j) % 256 for j in range(frame_bytes)])
                      for i in range(n_frames))
    # chunk offset = absolute position of mdat payload; computed after
    # assembling everything before it
    co_typ = b'co64' if use64 else b'stco'
    co_w = 8 if use64 else 4
    co_placeholder = _fullbox(co_typ, 0, 0, struct.pack('>I', 1)
                              + b'\x00' * co_w)
    stbl = _box(b'stbl', stsd + stts + stsc + stsz + co_placeholder)
    minf = _box(b'minf', stbl)
    mdia = _box(b'mdia', mdhd + hdlr + minf)
    trak = _box(b'trak', tkhd + mdia)
    moov = _box(b'moov', mvhd + trak)
    head_len = len(ftyp) + len(moov) + 8  # + mdat header
    fmt = '>Q' if use64 else '>I'
    co = _fullbox(co_typ, 0, 0, struct.pack('>I', 1)
                  + struct.pack(fmt, head_len))
    moov = moov.replace(co_placeholder, co)
    mdat = _box(b'mdat', frames)
    return ftyp + moov + mdat


def encode_mp4_mjpeg(frames, fps: int = 12, timescale: int = 600,
                     quality: int = 90,
                     samples_per_chunk: int | None = None) -> bytes:
    """Valid single-track Motion-JPEG MP4: every sample in ``mdat`` is a
    complete JPEG image ('jpeg' visual sample entry, per-sample stsz
    table). ``samples_per_chunk`` splits the mdat into multiple chunks
    with a real stsc/stco layout (default: one chunk). The
    decodable-video fixture for the frame-sampling -> decode -> pHash
    pipeline."""
    import numpy as np

    from erde_spark.scale.jpeg import encode_jpeg
    if not frames:
        raise ValueError('need at least one frame')
    h, w = np.asarray(frames[0]).shape[:2]
    blobs = [encode_jpeg(np.asarray(f), quality=quality) for f in frames]
    n = len(blobs)
    dur = n * timescale // fps
    ftyp = _box(b'ftyp', b'isom' + struct.pack('>I', 512) + b'isomqt  ')
    mvhd = _fullbox(b'mvhd', 0, 0, struct.pack(
        '>IIII', 0, 0, timescale, dur) + b'\x00' * 80)
    tkhd = _fullbox(b'tkhd', 0, 7, struct.pack(
        '>IIIII', 0, 0, 1, 0, dur) + b'\x00' * 52
        + struct.pack('>II', w << 16, h << 16))
    mdhd = _fullbox(b'mdhd', 0, 0, struct.pack(
        '>IIIIHH', 0, 0, timescale, dur, 0x55c4, 0))
    hdlr = _fullbox(b'hdlr', 0, 0, struct.pack('>I', 0) + b'vide'
                    + b'\x00' * 12 + b'mjpg\x00')
    entry = _box(b'jpeg', b'\x00' * 6 + struct.pack('>H', 1)
                 + b'\x00' * 16 + struct.pack('>HH', w, h)
                 + b'\x00' * 50)
    stsd = _fullbox(b'stsd', 0, 0, struct.pack('>I', 1) + entry)
    stts = _fullbox(b'stts', 0, 0, struct.pack(
        '>III', 1, n, timescale // fps))
    spc = samples_per_chunk or n
    chunk_sizes = [min(spc, n - i) for i in range(0, n, spc)]
    n_chunks = len(chunk_sizes)
    stsc_runs = [(1, spc)]
    if chunk_sizes[-1] != spc and n_chunks > 1:
        stsc_runs.append((n_chunks, chunk_sizes[-1]))
    stsc = _fullbox(b'stsc', 0, 0, struct.pack('>I', len(stsc_runs))
                    + b''.join(struct.pack('>III', fc, c, 1)
                               for fc, c in stsc_runs))
    stsz = _fullbox(b'stsz', 0, 0, struct.pack('>II', 0, n)
                    + b''.join(struct.pack('>I', len(b)) for b in blobs))
    co_placeholder = _fullbox(b'stco', 0, 0, struct.pack('>I', n_chunks)
                              + b'\x00' * (4 * n_chunks))
    stbl = _box(b'stbl', stsd + stts + stsc + stsz + co_placeholder)
    minf = _box(b'minf', stbl)
    mdia = _box(b'mdia', mdhd + hdlr + minf)
    trak = _box(b'trak', tkhd + mdia)
    moov = _box(b'moov', mvhd + trak)
    head_len = len(ftyp) + len(moov) + 8
    chunk_offs = []
    pos = head_len
    bi = 0
    for cs in chunk_sizes:
        chunk_offs.append(pos)
        pos += sum(len(b) for b in blobs[bi:bi + cs])
        bi += cs
    co = _fullbox(b'stco', 0, 0, struct.pack('>I', n_chunks)
                  + b''.join(struct.pack('>I', o) for o in chunk_offs))
    moov = moov.replace(co_placeholder, co)
    return ftyp + moov + _box(b'mdat', b''.join(blobs))


# ------------------------------------------------------------ spark surface

MP4_META_SCHEMA = T.StructType([
    T.StructField('asset_id', T.LongType()),
    T.StructField('brand', T.StringType()),
    T.StructField('duration_sec', T.DoubleType()),
    T.StructField('n_tracks', T.IntegerType()),
    T.StructField('video_codec', T.StringType()),
    T.StructField('width', T.IntegerType()),
    T.StructField('height', T.IntegerType()),
    T.StructField('n_frames', T.LongType()),
    T.StructField('fps', T.DoubleType()),
])


def mp4_metadata(assets: DataFrame, on_error: str = 'raise') -> DataFrame:
    """Per-asset container metadata via one ``mapInPandas`` pass — the
    filter/stratify input for video curation (drop sub-resolution, cap
    duration, bucket by codec) without decoding a single frame."""
    if on_error not in ('raise', 'skip'):
        raise ValueError(f"on_error={on_error!r}: use 'raise'/'skip'")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf['asset_id'], pdf['media']):
                try:
                    meta = parse_mp4(bytes(blob))
                except Exception:
                    if on_error == 'raise':
                        raise
                    continue
                vid = next((t for t in meta['tracks']
                            if t['handler'] == 'vide'), None)
                rows.append((
                    int(aid), meta['brand'], meta['duration_sec'],
                    len(meta['tracks']),
                    vid['codec'] if vid else None,
                    int(vid['width']) if vid and vid['width'] else None,
                    int(vid['height']) if vid and vid['height'] else None,
                    int(vid['n_samples']) if vid else None,
                    vid['fps'] if vid else None))
            yield pd.DataFrame(rows, columns=[f.name for f in MP4_META_SCHEMA])

    return assets.mapInPandas(_run, schema=MP4_META_SCHEMA)


FRAME_PLAN_SCHEMA = T.StructType([
    T.StructField('asset_id', T.LongType()),
    T.StructField('frame_idx', T.LongType()),
    T.StructField('byte_offset', T.LongType()),
    T.StructField('byte_size', T.LongType()),
])


def frame_sample_ranges(assets: DataFrame, every_n: int = 10,
                        on_error: str = 'raise') -> DataFrame:
    """Every ``every_n``-th video sample's REAL byte range per asset —
    the fan-out table a ranged-read decode stage consumes. At 100 TB the
    point is exactly this split: plan rows are tiny and shuffle freely;
    blob bytes are only touched by the (stubbed) decode stage, one
    sample's range at a time."""
    if on_error not in ('raise', 'skip'):
        raise ValueError(f"on_error={on_error!r}: use 'raise'/'skip'")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf['asset_id'], pdf['media']):
                try:
                    meta = parse_mp4(bytes(blob))
                except Exception:
                    if on_error == 'raise':
                        raise
                    continue
                vid = next((t for t in meta['tracks']
                            if t['handler'] == 'vide'), None)
                if not vid:
                    continue
                for i, (off, sz) in enumerate(sample_ranges(vid)):
                    if i % every_n == 0:
                        rows.append((int(aid), i, off, sz))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_PLAN_SCHEMA])

    return assets.mapInPandas(_run, schema=FRAME_PLAN_SCHEMA)


FRAME_HASH_SCHEMA = T.StructType([
    T.StructField('asset_id', T.LongType()),
    T.StructField('frame_idx', T.IntegerType()),
    T.StructField('phash', T.LongType()),
])


def video_frame_hashes(assets: DataFrame, every_n: int = 1,
                       on_error: str = 'raise') -> DataFrame:
    """Decode every ``every_n``-th video sample and perceptual-hash it:
    (asset_id, frame_idx, phash) — the bridge from the MP4 container to
    the image near-dup machinery (``hamming_neardup_pairs`` on the
    frame hashes finds visually-duplicated VIDEO segments). Decodes
    MJPEG samples for real via the repo JPEG codec; other codecs hit
    ``decode_sample``'s documented raise (or are skipped with
    ``on_error='skip'``).

    Scale shape: one mapInPandas pass; each sample is sliced from the
    blob by its stbl byte range and decoded one at a time — peak memory
    is one frame, and the blob never crosses another shuffle. (The
    ranged-read fan-out plan for object-store fetches is
    ``frame_sample_ranges``; this surface is the collocated-decode
    path.)"""
    if on_error not in ('raise', 'skip'):
        raise ValueError(f"on_error={on_error!r}: use 'raise'/'skip'")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from erde_spark.scale.imagehash import phash_array
        cache: dict = {}  # blob digest -> [(frame_idx, phash)] — crawls
        for pdf in batches:  # are full of byte-identical re-posts
            rows = []
            for aid, blob in zip(pdf['asset_id'], pdf['media']):
                blob = bytes(blob)
                key = hashlib.md5(blob).digest()
                hit = cache.get(key)
                if hit is None:
                    try:
                        meta = parse_mp4(blob)
                        vid = next((t for t in meta['tracks']
                                    if t['handler'] == 'vide'), None)
                        hit = []
                        for i, (off, sz) in enumerate(
                                sample_ranges(vid) if vid else []):
                            if i % every_n:
                                continue
                            arr = decode_sample(blob, off, sz, vid)
                            hit.append((i, int(phash_array(arr))))
                    except Exception:
                        if on_error == 'raise':
                            raise
                        hit = []
                    if len(cache) < 4096:
                        cache[key] = hit
                rows.extend((int(aid), i, ph) for i, ph in hit)
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_HASH_SCHEMA])

    return assets.mapInPandas(_run, schema=FRAME_HASH_SCHEMA)
