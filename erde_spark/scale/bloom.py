"""Distributed Bloom filter + bloom-prefiltered decontamination.

100 TB rationale: exact decontamination
(``scale.text.contamination_hits``) broadcasts the eval side's n-gram
set — correct while that set fits in executor memory as a hash
relation. A big eval suite (every benchmark + its paraphrases, ~10^8+
n-grams) stops fitting long before the corpus does; a Bloom filter
over the SAME set is ~10 bits per key instead of a hashed relation's
~50-100 bytes, an order of magnitude more headroom for one broadcast.
The corpus is still scanned ONCE: each row's n-grams probe the bit
array map-side, and only candidate survivors (true hits + ~fpp false
positives) pay the exact verification join — the n-gram shuffle
shrinks from every-corpus-ngram to ~hit-rate x corpus.

Exactness is NOT probabilistic: a Bloom filter never false-negatives,
so prefilter + exact-verify returns exactly the exact-join answer; the
``fpp`` knob only trades broadcast size against wasted verification
work. That property is what the driver gate pins (the DuckDB oracle
replays the plain exact anti-join).

Construction: classic (m, k) Bloom (Bloom 1970) with the
Kirsch-Mitzenmacher double-hashing scheme (two 64-bit halves of
md5(key); index_i = (h1 + i*h2) mod m) — deterministic across runs and
processes, no seed state. The bit array is built in one distributed
pass: per-partition numpy bitmaps OR-merged by ``treeReduce``, so the
driver only ever holds O(m/8) bytes per merge step regardless of
corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: refuse to build a single filter past this many bits (1 GiB): at that
#: point shard the key space and build per-shard filters instead of
#: broadcasting one giant array to every executor.
MAX_BITS = 1 << 33


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for ``n_items`` at ``fpp``:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2 (byte-rounded m)."""
    if n_items <= 0:
        raise ValueError('n_items must be positive')
    if not 0.0 < fpp < 1.0:
        raise ValueError(f'fpp must be in (0, 1), got {fpp}')
    m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 7) // 8 * 8)
    if m > MAX_BITS:
        raise ValueError(
            f'bloom of {n_items} keys at fpp={fpp} needs {m} bits '
            f'(> {MAX_BITS}); shard the key space into multiple filters')
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def build_bloom(df: DataFrame, col: str, n_items: int | None = None,
                fpp: float = 0.01) -> tuple[bytes, int, int]:
    """One distributed pass over ``df[col]`` -> (bits, k, m). Null keys
    are skipped. ``n_items`` sizes the filter (one count job when not
    given — pass the known cardinality in pipelines)."""
    if n_items is None:
        n_items = df.select(col).filter(F.col(col).isNotNull()).count()
    m, k = bloom_params(max(n_items, 1), fpp)
    nbytes = m // 8

    def _partition_bits(rows):
        # Kirsch-Mitzenmacher probe, inlined (NOT a module-level helper
        # — that would ship a module reference and make every fresh
        # worker import the scale chain, the wds rule). The SAME
        # md5/h1/h2 scheme is inlined in bloom_contains._probe; the
        # no-false-negatives test pins their agreement, so drift fails
        # CI rather than silently false-negativing.
        #
        # Vectorization (r11 verdict ask #4): md5 stays a per-string
        # loop — it IS the cross-engine determinism contract — but the
        # k probe indices compute in ONE numpy expression per batch.
        # Bit-exact with the scalar loop because
        #   (h1 + i*h2) % m == ((h1%m) + i*(h2%m)) % m
        # and h1%m + (k-1)*(h2%m) < k*m <= ~2^38 never overflows
        # uint64 (m is capped at 2^33 by MAX_BITS).
        import hashlib
        from itertools import islice
        bits = np.zeros(nbytes, dtype=np.uint8)
        ks = np.arange(k, dtype=np.uint64)
        rows = iter(rows)
        while True:
            chunk = list(islice(rows, 65536))
            if not chunk:
                break
            h1m, h2m = [], []
            for r in chunk:
                v = r[0]
                if v is None:
                    continue
                d = hashlib.md5(str(v).encode('utf-8')).digest()
                h1 = int.from_bytes(d[:8], 'little')
                h2 = int.from_bytes(d[8:], 'little') | 1
                h1m.append(h1 % m)
                h2m.append(h2 % m)
            if not h1m:
                continue
            a1 = np.array(h1m, dtype=np.uint64)[:, None]
            a2 = np.array(h2m, dtype=np.uint64)[:, None]
            idx = ((a1 + ks[None, :] * a2) % np.uint64(m)).ravel()
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (idx & np.uint64(7))
                              .astype(np.uint8)))
        yield bits

    merged = (df.select(col).rdd.mapPartitions(_partition_bits)
              .treeReduce(np.bitwise_or))
    return bytes(merged.tobytes()), k, m


def bloom_contains(bits: bytes, k: int, m: int, col: Column | str) -> Column:
    """Membership-test Column (pandas UDF over the broadcast-captured
    bit array): true when every one of the k probe bits is set —
    possibly a false positive (rate ~fpp), NEVER a false negative."""
    arr = np.frombuffer(bits, dtype=np.uint8)

    @F.pandas_udf(T.BooleanType())
    def _probe(v: pd.Series) -> pd.Series:
        # md5 stays per-string (the determinism contract shared with
        # build_bloom's inlined builder); the k bit tests are one
        # vectorized gather over the whole Arrow batch — bit-exact
        # with the scalar loop, see build_bloom for the modular
        # arithmetic argument (r11 verdict ask #4)
        import hashlib
        out = np.zeros(len(v), dtype=bool)
        h1m, h2m, pos = [], [], []
        for j, s in enumerate(v):
            if s is None:
                continue
            d = hashlib.md5(str(s).encode('utf-8')).digest()
            h1 = int.from_bytes(d[:8], 'little')
            h2 = int.from_bytes(d[8:], 'little') | 1
            h1m.append(h1 % m)
            h2m.append(h2 % m)
            pos.append(j)
        if h1m:
            ks = np.arange(k, dtype=np.uint64)
            a1 = np.array(h1m, dtype=np.uint64)[:, None]
            a2 = np.array(h2m, dtype=np.uint64)[:, None]
            idx = (a1 + ks[None, :] * a2) % np.uint64(m)
            got = (arr[(idx >> np.uint64(3)).astype(np.int64)]
                   >> (idx & np.uint64(7)).astype(np.uint8)) & 1
            out[np.array(pos)] = got.all(axis=1)
        return pd.Series(out)

    return _probe(F.col(col) if isinstance(col, str) else col)


def decontaminate_bloom(corpus: DataFrame, eval_df: DataFrame,
                        n: int = 4, id_col: str = 'doc_id',
                        text_col: str = 'text',
                        fpp: float = 0.01) -> DataFrame:
    """Corpus rows with NO word ``n``-gram shared with ``eval_df`` —
    the same contract as dropping every ``contamination_hits`` hit,
    computed bloom-first: (1) build the Bloom over the eval side's
    distinct n-grams; (2) scan the corpus once, keeping as CANDIDATES
    only docs with at least one bloom-positive n-gram; (3) exact-verify
    the candidates with the broadcast join (removes false positives);
    (4) anti-join verified hits from the corpus. Identical output to
    the exact path at any fpp — the filter can only over-admit
    candidates, never hide a hit."""
    from erde_spark.scale.text import word_ngrams
    # the distinct eval n-gram set is consumed three times (filter
    # sizing, bitmap build, verify join) — materialize it ONCE;
    # localCheckpoint also truncates the tokenize/explode lineage
    ev = (eval_df.select(F.explode(word_ngrams(text_col, n))
                         .alias('ngram')).distinct()
          .localCheckpoint(eager=True))
    bits, k, m = build_bloom(ev, 'ngram', fpp=fpp)
    doc_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n)))
        .alias('ngram'))
    # exact verification: deliberately NOT broadcast — at the eval
    # sizes that motivate the bloom (10^8+ n-grams) a broadcast hash
    # relation is exactly the memory blowup the prefilter avoids; the
    # candidate side is already pruned to ~hit-rate x corpus, so a
    # shuffle join on ngram is cheap (and AQE may still choose to
    # broadcast a small ev on its own evidence)
    cand = (doc_grams
            .filter(bloom_contains(bits, k, m, 'ngram'))
            .join(ev, 'ngram')
            .select(id_col).distinct())
    return corpus.join(cand, id_col, 'left_anti')
