"""Perceptual image hashing and image near-duplicate detection.

The image analogue of the text SimHash family: a 64-bit perceptual hash
per image (pHash: DCT low-frequency signs; dHash: horizontal gradient
signs), then Hamming-distance candidate generation WITHOUT an all-pairs
product.

Scale posture at 100 TB of images:

* hashing is one ``mapInPandas`` pass over the blob column — each task
  streams its partition at bounded memory, emits 3 small columns per
  asset, and the (hash -> pairs -> components) stages never touch pixel
  data again;
* exact-duplicate collapse is a single map-side-combined groupBy on the
  hash (the cheapest and most common image-dedup tier — re-encoded
  copies of the same image usually hash identically);
* near-dup candidates use Manku-style multi-block bucketing (Manku,
  Jain & Sarma, WWW'07 §3: split the 64-bit hash into ``b`` blocks; a
  pair within Hamming distance ``k`` must agree exactly on every block
  of SOME (b-k)-subset, so equi-joining on each subset's concatenation
  finds all of them). With the default ``b = k + 2`` the key carries two
  blocks (~``128/(k+2)`` bits) and replication is C(k+2, 2) rows per
  image — recall is EXACT by pigeonhole, precision is restored by a
  JVM-side ``bit_count(xor) <= k`` verify. No Python in the join path.

Decode errors follow the multimodal ``on_error`` contract ('raise' /
'skip') — a web-crawl image column always contains corrupt blobs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- kernels


def _to_gray(arr: np.ndarray) -> np.ndarray:
    """Float64 grayscale: mean over the channel axis (alpha included if
    present — a fully-opaque alpha is constant and shifts every pixel
    equally, which sign-of-difference hashes ignore)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    return a


def _resize_area(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-average resize via reduceat on both axes: every source pixel
    contributes to exactly one output cell, so small shifts in input
    values perturb the output smoothly (nearest-neighbor would make the
    hash brittle under re-encoding noise)."""
    h, w = a.shape
    # upscale axes (out >= in) use nearest indexing — reduceat needs
    # strictly advancing bin starts, which only downscaling provides
    if out_h >= h:
        a = a[(np.arange(out_h) * h // out_h).astype(np.intp), :]
        h = out_h
    if out_w >= w:
        a = a[:, (np.arange(out_w) * w // out_w).astype(np.intp)]
        w = out_w
    yi = (np.arange(out_h) * h // out_h).astype(np.intp)
    xi = (np.arange(out_w) * w // out_w).astype(np.intp)
    sums = np.add.reduceat(np.add.reduceat(a, yi, axis=0), xi, axis=1)
    ycnt = np.diff(np.append(yi, h)).astype(np.float64)
    xcnt = np.diff(np.append(xi, w)).astype(np.float64)
    return sums / (ycnt[:, None] * xcnt[None, :])


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (same normalization as
    scipy.fftpack.dct(norm='ortho'))."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def _bits_to_int64(bits: np.ndarray) -> int:
    """Pack a 64-element 0/1 array (row-major, bit 63 first) into a
    SIGNED 64-bit int (Spark LongType)."""
    val = 0
    for b in bits.ravel():
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def phash_array(arr: np.ndarray) -> int:
    """64-bit pHash: grayscale -> 32x32 area resize -> 2D DCT-II ->
    top-left 8x8 low-frequency block -> sign vs the block median.
    Matches the classic pHash recipe (Zauner 2010 §3.2 / the imagehash
    library): robust to re-encoding, mild noise, and brightness shifts
    (median thresholding cancels global offsets)."""
    small = _resize_area(_to_gray(arr), 32, 32)
    low = (_DCT32 @ small @ _DCT32.T)[:8, :8]
    med = np.median(low)
    return _bits_to_int64((low > med).astype(np.uint8))


def dhash_array(arr: np.ndarray) -> int:
    """64-bit dHash: grayscale -> 8x9 area resize -> sign of the
    horizontal gradient (px[:, 1:] > px[:, :-1]). Cheaper than pHash and
    independent of it — disagreement between the two is a useful
    false-positive filter."""
    small = _resize_area(_to_gray(arr), 8, 9)
    return _bits_to_int64((small[:, 1:] > small[:, :-1]).astype(np.uint8))


IMAGE_HASH_SCHEMA = T.StructType([
    T.StructField('asset_id', T.LongType()),
    T.StructField('phash', T.LongType()),
    T.StructField('dhash', T.LongType()),
])


def image_hashes(assets: DataFrame, on_error: str = 'raise') -> DataFrame:
    """(asset_id, phash, dhash) via one ``mapInPandas`` decode pass.

    Input is the multimodal asset shape (``asset_id``, ``media`` binary,
    ``meta.format``). Pixels never leave the task: only two int64s per
    asset cross the shuffle, so everything downstream is JVM-side.
    """
    if on_error not in ('raise', 'skip'):
        raise ValueError(f"on_error={on_error!r}: use 'raise'/'skip'")
    from erde_spark.scale.multimodal import decode_media

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            ids, ph, dh = [], [], []
            # hash pairs keyed by blob digest: exact-dup blobs (reposts)
            # decode once per Arrow batch; outputs are two ints
            seen: dict[bytes, tuple | str] = {}
            for aid, blob, meta in zip(pdf['asset_id'], pdf['media'],
                                       pdf['meta']):
                blob = bytes(blob)
                key = hashlib.md5(blob).digest()
                cached = seen.get(key)
                if cached == 'skip':
                    continue
                if cached is not None:
                    ids.append(int(aid))
                    ph.append(cached[0])
                    dh.append(cached[1])
                    continue
                try:
                    arr = decode_media(blob, meta['format'])
                except Exception:
                    if on_error == 'raise':
                        raise
                    seen[key] = 'skip'
                    continue
                ids.append(int(aid))
                ph.append(phash_array(arr))
                dh.append(dhash_array(arr))
                seen[key] = (ph[-1], dh[-1])
            yield pd.DataFrame({'asset_id': ids, 'phash': ph, 'dhash': dh})

    return assets.mapInPandas(_run, schema=IMAGE_HASH_SCHEMA)


# ------------------------------------------------- hamming candidate join


def _block_bounds(n_blocks: int) -> list[tuple[int, int]]:
    """Split 64 bits into ``n_blocks`` near-equal (shift, width) chunks."""
    bounds = []
    start = 0
    for i in range(n_blocks):
        width = (64 - start) // (n_blocks - i)
        bounds.append((start, width))
        start += width
    return bounds


def _auto_blocks(n_docs: int, k: int) -> int:
    """Smallest block count whose bucket key carries ~log2(n)+2 bits —
    the same pin-the-collisions-linear rule as the banded sign-LSH
    rebuild. With ``b`` blocks the key is a ``(b-k)``-combination,
    ``(b-k) * 64/b`` bits wide: random-pair bucket collisions cost
    ~C(b,b-k) * n^2/2^keybits candidate rows while the explode costs
    n * C(b,b-k) keyed rows, so widening pays exactly when n outgrows
    2^keybits — the +2 margin switches just before that point and no
    earlier (measured: at n=500k, b=7 is 3.4x SLOWER than b=6 because
    the 35-vs-15 replica cost dominates while collisions are still
    cheap; at n=5M b=6 still wins 47s vs 122s, so the margin is -2:
    widen only past ~4x the key space). Capped at k+8 — the documented
    residual worst case beyond ~2^40 docs."""
    bits_needed = math.log2(max(n_docs, 2)) - 2
    for b in range(k + 2, k + 9):
        if (b - k) * 64.0 / b >= bits_needed:
            return b
    return k + 8


def hamming_neardup_pairs(hashes: DataFrame, id_col: str = 'asset_id',
                          hash_col: str = 'phash',
                          max_hamming: int = 4,
                          n_blocks: int | None = None,
                          n_docs: int | None = None) -> DataFrame:
    """(id_a, id_b, hamming) for all pairs within ``max_hamming`` of the
    64-bit ``hash_col`` — exact recall, no all-pairs product.

    Manku multi-block bucketing: with ``b`` blocks and <= ``k`` bit
    errors, at least ``b - k`` blocks are error-free, so SOME
    ``(b-k)``-combination of blocks matches exactly. Each row explodes
    into one bucket key per combination (a struct of the combination id
    and its block values); a self equi-join on the key + ``id_a < id_b``
    + JVM ``bit_count(xor) <= k`` verify gives the answer.

    Block count: the default ``b = k + 2`` (C(k+2,2) replicas, ~21-bit
    keys at k=4) is right up to ~1M distinct hashes; beyond that,
    random-pair bucket collisions grow n^2/2^keybits (measured 26x
    shuffle for 10x rows at n=500k..5M), so pass ``n_docs`` and ``b``
    auto-scales to keep the key ~8 bits ahead of log2(n) (see
    ``_auto_blocks``). The sizing is deliberately not an implicit
    ``count()`` — the input is often an expensive decode pipeline, and
    re-evaluating it costs more than the collisions it saves below the
    threshold. Recall stays EXACT for any b > k; only replica count and
    key width move. ``n_blocks`` pins b outright.
    """
    if not 0 <= max_hamming <= 16:
        raise ValueError('max_hamming must be in [0, 16]')
    if max_hamming == 0:
        h = hashes.select(F.col(id_col).alias('id'), F.col(hash_col).alias('h'))
        a, b = h.alias('a'), h.alias('b')
        return (a.join(b, (F.col('a.h') == F.col('b.h')) &
                          (F.col('a.id') < F.col('b.id')))
                .select(F.col('a.id').alias('id_a'), F.col('b.id').alias('id_b'),
                        F.lit(0).alias('hamming')))
    if n_blocks:
        b = n_blocks
    elif n_docs:
        b = _auto_blocks(n_docs, max_hamming)
    else:
        b = max_hamming + 2
    if b <= max_hamming:
        raise ValueError(f'n_blocks={b} must exceed max_hamming={max_hamming}')
    keep = b - max_hamming
    bounds = _block_bounds(b)

    def _block(col, i):
        s, w = bounds[i]
        return (F.shiftrightunsigned(col, s)
                .bitwiseAND(F.lit((1 << w) - 1)))

    combos = list(combinations(range(b), keep))
    hcol = F.col(hash_col)
    keyed = hashes.select(
        F.col(id_col).alias('id'), hcol.alias('h'),
        F.explode(F.array(*[
            F.struct(F.lit(ci).alias('combo'),
                     *[_block(hcol, blk).alias(f'k{j}')
                       for j, blk in enumerate(c)])
            for ci, c in enumerate(combos)])).alias('key'))
    # The exploded side's Catalyst size estimate is unreliable (range ->
    # explode reads as tiny), which planned a BROADCAST of the whole
    # keyed corpus — measured failing at 11 GiB for 5M rows. A corpus
    # self-join must shuffle on the bucket key. When the size is known,
    # partition so per-partition hash builds stay ~2M keyed rows and use
    # the (2.7x faster at 5M) shuffled hash join; otherwise sort-merge,
    # which spills gracefully at any size.
    if n_docs:
        nparts = max(
            int(keyed.sparkSession.conf.get('spark.sql.shuffle.partitions',
                                            '200')),
            (n_docs * len(combos)) // 2_000_000 + 1)
        keyed = keyed.repartition(nparts, 'key')
        a, bb = keyed.alias('a'), keyed.hint('shuffle_hash').alias('b')
    else:
        a, bb = keyed.alias('a'), keyed.hint('merge').alias('b')
    cand = (a.join(bb, (F.col('a.key') == F.col('b.key')) &
                       (F.col('a.id') < F.col('b.id')))
            .select(F.col('a.id').alias('id_a'), F.col('b.id').alias('id_b'),
                    F.col('a.h').alias('h_a'), F.col('b.h').alias('h_b'))
            .distinct())
    return (cand
            .withColumn('hamming', F.bit_count(F.col('h_a').bitwiseXOR(F.col('h_b'))))
            .filter(F.col('hamming') <= max_hamming)
            .select('id_a', 'id_b', 'hamming'))


# ------------------------------------------------------- dedup surfaces


def image_exact_dedup(hashes: DataFrame, id_col: str = 'asset_id',
                      hash_col: str = 'phash') -> DataFrame:
    """One row per distinct perceptual hash: (phash, kept asset_id,
    n_dups). The first dedup tier — identical pHash means visually
    identical content regardless of container format or re-encoding.
    Single map-side-combined shuffle."""
    return (hashes.groupBy(F.col(hash_col))
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias('n_dups')))


def image_dedup_clusters(hashes: DataFrame, id_col: str = 'asset_id',
                         hash_col: str = 'phash', max_hamming: int = 6,
                         n_blocks: int | None = None,
                         n_docs: int | None = None) -> DataFrame:
    """(asset_id, component) near-duplicate image clusters: Hamming
    candidate join + connected components. Collapsing to distinct hashes
    FIRST keeps the pair join proportional to distinct visual content,
    not raw asset count (a crawl has many byte-identical re-posts)."""
    from erde_spark.scale.dedup import connected_components
    distinct_h = hashes.select(F.col(hash_col).alias('h')).distinct()
    pairs = hamming_neardup_pairs(distinct_h, id_col='h', hash_col='h',
                                  max_hamming=max_hamming, n_blocks=n_blocks,
                                  n_docs=n_docs)
    comp = connected_components(pairs, distinct_h.select('h'))
    return (hashes.select(id_col, F.col(hash_col).alias('h'))
            .join(comp.withColumnRenamed('id', 'h'), 'h')
            .select(id_col, F.col('component').alias('hash_component')))
