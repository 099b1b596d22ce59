"""Audio near-duplicate detection via the Haitsma-Kalker robust hash
(Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System",
ISMIR 2002) — the audio member of the multimodal dedup tier (text
MinHash, image pHash, video frame-pHash live in their own modules).

Per asset: mono mix -> overlapping FFT frames -> log-spaced energy
bands in 300-2000 Hz -> one 32-bit sub-fingerprint per frame, bit m =
sign of the band-energy difference differential
``(E[n,m]-E[n,m+1]) - (E[n-1,m]-E[n-1,m+1])`` — the paper's exact
construction. Signs survive volume scaling (energies scale by c^2,
differences keep their sign), mild EQ and re-encoding, which is what
makes exact equality on sub-fingerprints a usable join key.

Scale shape: fingerprinting is one ``mapInPandas`` decode+FFT pass
(numpy-vectorized per asset). Candidate pairs come from an EXACT
equi-join on sub-fingerprint values — never all-pairs: explode
(asset, frame-hash), drop silent frames and corpus-frequent
"stop-frames" (a hash shared by more than ``max_df`` assets is
boilerplate — intros, ringtones, digital silence — and would create
quadratic bucket blowup, the same reasoning as boilerplate-line
removal), join on the 32-bit value, keep pairs sharing at least
``min_shared`` distinct sub-fingerprints. All counting is
map-side-combined groupBy; the join key is a 4-byte int.

The container has no audio libs: decode is the hand-rolled WAV path
(scale/png.py::decode_wav via multimodal.decode_media); other codecs
raise upstream, same boundary as the rest of the media tier.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FP_SCHEMA = T.StructType([
    T.StructField('asset_id', T.LongType()),
    T.StructField('fp', T.ArrayType(T.IntegerType())),
    T.StructField('n_frames', T.LongType()),
])

#: the paper's band count: 33 log-spaced bands (34 edge points)
#: spanning 300-2000 Hz -> 32 differential bits per frame
N_BANDS = 33


def hk_frame_hashes(mono: np.ndarray, sr: int, frame_len: int = 1024,
                    hop: int = 512, f_lo: float = 300.0,
                    f_hi: float = 2000.0,
                    silence_rms: float = 1e-4) -> np.ndarray:
    """32-bit sub-fingerprints (int32 array, one per retained frame)
    of a mono [-1, 1] float signal. Frames under ``silence_rms`` are
    dropped (digital silence hashes identically everywhere and only
    feeds the stop-frame filter). Needs ``len(mono) >= frame_len + hop``
    for at least one differential; returns empty otherwise."""
    n = len(mono)
    if n < frame_len + hop:
        return np.zeros(0, dtype=np.int32)
    starts = np.arange(0, n - frame_len + 1, hop)
    frames = np.lib.stride_tricks.sliding_window_view(
        mono, frame_len)[starts]
    rms = np.sqrt((frames * frames).mean(axis=1))
    window = np.hanning(frame_len)
    spec = np.abs(np.fft.rfft(frames * window, axis=1)) ** 2
    freqs = np.fft.rfftfreq(frame_len, d=1.0 / sr)
    edges = np.geomspace(f_lo, f_hi, N_BANDS + 1)
    idx = np.searchsorted(freqs, edges)
    # reduceat's FINAL segment always runs to the array end, so
    # passing all 34 edges and dropping the last segment is what caps
    # the top band at f_hi — with idx[:-1] the 33rd band would sum
    # ~1.9-8 kHz and out-of-band energy would own its bits
    bands = np.add.reduceat(spec, idx, axis=1)[:, :-1]  # (frames, 33)
    diff = bands[:, :-1] - bands[:, 1:]              # (frames, 32)
    bits = (diff[1:] - diff[:-1]) > 0                # (frames-1, 32)
    weights = (1 << np.arange(bits.shape[1])).astype(np.int64)
    h = (bits @ weights).astype(np.int64)
    keep = rms[1:] >= silence_rms
    # two's-complement fold into int32 (bit 31 is a real hash bit)
    return h[keep].astype(np.uint32).view(np.int32)


def audio_fingerprints(assets: DataFrame, sample_rate: int = 16000,
                       frame_len: int = 1024, hop: int = 512,
                       on_error: str = 'raise') -> DataFrame:
    """(asset_id, fp, n_frames) per asset — one decode+FFT
    ``mapInPandas`` pass over (asset_id, media, meta) rows (the
    multimodal asset shape)."""
    from erde_spark.scale.multimodal import decode_media
    if on_error not in ('raise', 'skip'):
        raise ValueError(f"on_error={on_error!r}: use 'raise'/'skip'")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob, meta in zip(pdf['asset_id'], pdf['media'],
                                       pdf['meta']):
                try:
                    arr = decode_media(bytes(blob), meta['format'])
                except Exception:
                    if on_error == 'raise':
                        raise
                    continue
                x = arr.astype(np.float64)
                if np.issubdtype(arr.dtype, np.integer):
                    info = np.iinfo(arr.dtype)
                    if info.min == 0:
                        x = (x - (info.max + 1) / 2) / ((info.max + 1) / 2)
                    else:
                        x = x / (info.max + 1)
                mono = x.mean(axis=1)
                h = hk_frame_hashes(mono, sample_rate, frame_len, hop)
                rows.append((int(aid), h.tolist(), len(h)))
            yield pd.DataFrame(rows,
                               columns=['asset_id', 'fp', 'n_frames'])

    return assets.mapInPandas(_run, schema=FP_SCHEMA)


def audio_dedup_pairs(assets: DataFrame, min_shared: int = 5,
                      max_df: int = 1000, sample_rate: int = 16000,
                      frame_len: int = 1024, hop: int = 512,
                      on_error: str = 'raise') -> DataFrame:
    """(id_a, id_b, n_shared) audio near-duplicate candidates: pairs
    of assets sharing at least ``min_shared`` DISTINCT Haitsma-Kalker
    sub-fingerprints. Sub-fingerprints present in more than ``max_df``
    assets are dropped first (stop-frames — corpus-wide boilerplate
    audio would otherwise make a quadratic bucket; the documented
    analogue of boilerplate-line removal). Precision rises with
    ``min_shared``; the paper's BER verification over aligned blocks
    is the refinement to add if sub-second clip alignment ever
    matters — for corpus dedup, shared-distinct-count is the robust
    coarse test."""
    fp = audio_fingerprints(assets, sample_rate, frame_len, hop,
                            on_error=on_error)
    # (asset, hash) feeds TWO plan branches (stop-frame counting and
    # the pair join) — materialize it eagerly or the decode+FFT
    # mapInPandas pass runs once per branch (the tok/sig discipline
    # of scale/dedup.py; these are 4-byte-int rows, cheap to hold)
    ex = (fp.select('asset_id', F.explode('fp').alias('h'))
          .distinct().localCheckpoint(eager=True))
    # broadcast the DROP list (stop-frames over max_df — few by
    # definition), never the keep set: the survivors are corpus-sized
    # and broadcasting them would ship the whole distinct-hash table
    # to every executor
    stop = (ex.groupBy('h').agg(F.count(F.lit(1)).alias('_df'))
            .where(F.col('_df') > max_df).select('h'))
    ex = ex.join(F.broadcast(stop), 'h', 'left_anti')
    a = ex.select(F.col('asset_id').alias('id_a'), 'h')
    b = ex.select(F.col('asset_id').alias('id_b'), 'h')
    return (a.join(b, 'h')
            .where(F.col('id_a') < F.col('id_b'))
            .groupBy('id_a', 'id_b')
            .agg(F.count(F.lit(1)).alias('n_shared'))
            .where(F.col('n_shared') >= min_shared))
