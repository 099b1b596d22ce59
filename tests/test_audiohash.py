"""Haitsma-Kalker audio fingerprint dedup (erde_spark.scale.audiohash)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F  # noqa: F401

from erde_spark.scale.audiohash import (audio_dedup_pairs,
                                        audio_fingerprints,
                                        hk_frame_hashes)

SR = 16000


def _tone_mix(seed, seconds=2.0, n_tones=48):
    """Broadband deterministic test signal: enough tones that every
    300-2000 Hz band carries real energy — HK bits are signs of band
    differentials, and a band that is EMPTY (sparse synthetic spectra)
    has a quantization-noise-driven sign, which real broadband audio
    never exhibits."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(SR * seconds)) / SR
    freqs = rng.uniform(300, 1900, n_tones)
    amps = rng.uniform(0.5, 1.0, n_tones)
    return sum(a * np.sin(2 * np.pi * f * t + i)
               for i, (f, a) in enumerate(zip(freqs, amps))) / n_tones


class TestKernel:
    def test_volume_invariant(self):
        sig = _tone_mix(1)
        h1, h2 = hk_frame_hashes(sig, SR), hk_frame_hashes(0.3 * sig, SR)
        assert len(h1) > 40
        assert set(h1.tolist()) == set(h2.tolist())

    def test_distinct_content_disjoint(self):
        h1 = hk_frame_hashes(_tone_mix(1), SR)
        h2 = hk_frame_hashes(_tone_mix(2), SR)
        assert len(set(h1.tolist()) & set(h2.tolist())) < 5

    def test_short_and_silent(self):
        assert len(hk_frame_hashes(np.zeros(100), SR)) == 0
        # digital silence frames are dropped entirely
        assert len(hk_frame_hashes(np.zeros(SR), SR)) == 0


def _assets(spark, specs):
    """specs: list of (asset_id, signal). Encodes real int16 WAVs."""
    from erde_spark.scale.multimodal import ASSET_SCHEMA
    from erde_spark.scale.png import encode_wav
    rows = []
    for aid, sig in specs:
        x = (sig * 16384).astype(np.int16)[:, None]
        blob = encode_wav(x, framerate=SR)
        rows.append((aid, bytearray(blob),
                     ('audio/wav', None, None, len(blob))))
    pdf = pd.DataFrame(rows, columns=['asset_id', 'media', 'meta'])
    return spark.createDataFrame(pdf, schema=ASSET_SCHEMA)


class TestSparkOps:
    def test_fingerprints_shape(self, spark):
        df = _assets(spark, [(1, _tone_mix(1)), (2, _tone_mix(2))])
        out = {r.asset_id: r for r in audio_fingerprints(df).collect()}
        assert out[1].n_frames > 40 and len(out[1].fp) == out[1].n_frames

    def test_dedup_finds_volume_twins_only(self, spark):
        base = _tone_mix(1)
        df = _assets(spark, [(1, base), (2, 0.4 * base),
                             (3, _tone_mix(3)), (4, _tone_mix(4))])
        pairs = audio_dedup_pairs(df, min_shared=20).collect()
        assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
        assert pairs[0].n_shared > 40

    def test_stop_frame_filter(self, spark):
        # the same jingle in EVERY asset: with max_df=2 its frames are
        # boilerplate and must not connect unrelated assets
        jingle = _tone_mix(99, seconds=1.0)
        specs = [(i, np.concatenate([jingle, _tone_mix(i)]))
                 for i in range(1, 5)]
        df = _assets(spark, specs)
        assert audio_dedup_pairs(df, min_shared=10,
                                 max_df=2).count() == 0
        # without the filter the shared jingle pairs everything
        assert audio_dedup_pairs(df, min_shared=10,
                                 max_df=1000).count() == 6

    def test_on_error_validation(self, spark):
        df = _assets(spark, [(1, _tone_mix(1))])
        with pytest.raises(ValueError, match='on_error'):
            audio_fingerprints(df, on_error='ignore')
