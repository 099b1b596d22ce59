"""Similarity search over embedding columns (``array<float>``).

Four tiers:

* ``cosine_topk``     — exact brute-force top-k. Queries are broadcast, so
  the plan is one pass over the corpus with no corpus shuffle — this is
  the right physical shape even at 100 TB when the query set is small
  (broadcast nested-loop + per-partition ranking via Window).
* ``lsh_topk``        — random-hyperplane LSH buckets (+ multiprobe): the
  approximate scale path when both sides are large. Bucket id is a packed
  sign-bit integer; candidates are bucket-equi-joined (plain shuffle
  join), then ranked exactly.
* ``ivf_topk``        — IVF (inverted-file) coarse quantizer: k-means
  centroids learned once from a bounded sample, corpus partitioned into
  ``n_lists`` inverted lists, queries probe the ``n_probes`` nearest
  lists. Same probe/recall dial as FAISS IVF-Flat, expressed as a Spark
  equi-join on list id.
* ``ivfpq_topk``      — IVF + product quantization: m-byte codes per
  vector (32x compression at 64-dim), per-query ADC lookup tables over
  the probed lists, exact-cosine refine of the survivors. The
  billion-scale memory tier (FAISS IVFPQ shape).

Dot products run in a vectorized pandas UDF (numpy per Arrow batch) —
measured ~20x faster than ``F.aggregate``/``zip_with`` chains on 64-dim
vectors, and the data crosses to Python as Arrow buffers, not rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise dot product of two (pre-normalized) float arrays.

    Fixed-dim batches take the vectorized path: one ``np.stack`` per side
    and a single einsum over the whole Arrow batch (measured ~8x faster
    than the per-row loop at 64-dim); ragged batches fall back to the
    row loop."""
    if len(a) == 0:
        return pd.Series([], dtype='float64')
    try:
        ma = np.stack([np.asarray(x, dtype=np.float64) for x in a])
        mb = np.stack([np.asarray(x, dtype=np.float64) for x in b])
    except ValueError:  # ragged dims within the batch
        out = np.empty(len(a))
        for i, (va, vb) in enumerate(zip(a, b)):
            out[i] = float(np.dot(np.asarray(va, dtype=np.float64),
                                  np.asarray(vb, dtype=np.float64)))
        return pd.Series(out)
    return pd.Series(np.einsum('ij,ij->i', ma, mb))


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def _normalize_udf(v: pd.Series) -> pd.Series:
    if len(v) == 0:
        return pd.Series([], dtype='object')
    try:
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
    except ValueError:  # ragged dims within the batch
        out = []
        for x in v:
            a = np.asarray(x, dtype=np.float64)
            n = np.linalg.norm(a)
            out.append((a / n if n > 0 else a).tolist())
        return pd.Series(out)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, norms, out=m, where=norms > 0)
    return pd.Series(list(m))


def normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, nvec) with unit-norm float64 vectors."""
    return df.select(F.col(id_col).alias('id'),
                     _normalize_udf(F.col(vec_col)).alias('nvec'))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = 'vec_id', vec_col: str = 'embedding',
                query_id_col: str | None = None,
                query_vec_col: str | None = None,
                exclude_self: bool = True) -> DataFrame:
    """Exact top-k nearest corpus rows per query by cosine similarity.

    Returns (query_id, vec_id, cosine, rank). Ties broken by corpus id
    ascending (deterministic). Queries are broadcast: the corpus is read
    once, never shuffled; ranking is a Window over query_id.
    """
    qid = query_id_col or id_col
    qvec = query_vec_col or vec_col
    c = normalized(corpus, id_col, vec_col) \
        .select(F.col('id').alias('vec_id'), F.col('nvec').alias('cvec'))
    q = normalized(queries, qid, qvec) \
        .select(F.col('id').alias('query_id'), F.col('nvec').alias('qvec'))
    j = c.join(F.broadcast(q), ~(F.col('vec_id') == F.col('query_id'))
               if exclude_self else F.lit(True))
    scored = j.withColumn('cosine', cosine_udf(F.col('cvec'), F.col('qvec')))
    w = Window.partitionBy('query_id').orderBy(F.desc('cosine'), F.asc('vec_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k)
            .select('query_id', 'vec_id', 'cosine', 'rank'))


# ---------------------------------------------------------------- LSH

def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim))


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str, dim: int,
                n_bits: int = 12, seed: int = 42) -> DataFrame:
    """(id, nvec, bucket) — random-hyperplane sign-bit bucket per vector."""
    planes = _hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def _bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype='int64')
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (m @ planes.T) > 0
        return pd.Series((bits @ weights).astype(np.int64))

    nv = normalized(df, id_col, vec_col)
    return nv.withColumn('bucket', _bucket(F.col('nvec')))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, dim: int = 64,
             n_bits: int = 12, n_probes: int = 4, seed: int = 42,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket with the query
    under one of ``n_probes`` probes (the bucket itself + lowest-index bit
    flips), ranked exactly within candidates.

    Scale shape: corpus bucketed once (cacheable); per query only a few
    buckets are scanned — an equi-join on bucket id instead of a full scan.
    Recall grows with n_probes; this is the IVF-style tradeoff. At fixed
    ``n_bits`` per-bucket occupancy — and so per-query candidate count —
    grows linearly with the corpus; for large corpora prefer
    :func:`ivf_topk`/:func:`ivfpq_topk`, whose sqrt(n)-scaled list count
    keeps probe cost sublinear (measured in SCALE.md).
    """
    cb = lsh_buckets(corpus, id_col, vec_col, dim, n_bits, seed) \
        .select(F.col('id').alias('vec_id'), F.col('nvec').alias('cvec'), 'bucket')
    qb = lsh_buckets(queries, id_col, vec_col, dim, n_bits, seed) \
        .select(F.col('id').alias('query_id'), F.col('nvec').alias('qvec'),
                F.col('bucket').alias('qbucket'))
    # multiprobe: original bucket + single-bit flips of the first bits
    probes = [F.col('qbucket')] + [
        F.col('qbucket').bitwiseXOR(F.lit(1 << i)) for i in range(max(0, n_probes - 1))]
    qb = qb.withColumn('bucket', F.explode(F.array(*probes)))
    j = cb.join(qb, 'bucket')
    if exclude_self:
        j = j.filter(F.col('vec_id') != F.col('query_id'))
    scored = (j.select('query_id', 'vec_id', 'cvec', 'qvec').distinct()
               .withColumn('cosine', cosine_udf(F.col('cvec'), F.col('qvec'))))
    w = Window.partitionBy('query_id').orderBy(F.desc('cosine'), F.asc('vec_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k)
            .select('query_id', 'vec_id', 'cosine', 'rank'))


# ---------------------------------------------------------------- IVF

def _kmeans_centroids(sample: np.ndarray, n_lists: int, seed: int = 42,
                      iters: int = 10) -> np.ndarray:
    """Spherical k-means on unit vectors (deterministic seed). Classic
    coarse-quantizer training; the sample is bounded, so this is constant
    driver work regardless of corpus size."""
    rng = np.random.RandomState(seed)
    n_lists = min(n_lists, len(sample))
    cent = sample[rng.choice(len(sample), size=n_lists, replace=False)].copy()
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[j] = v / n
    return cent


def _train_sample(df: DataFrame, id_col: str, vec_col: str,
                  sample_size: int, seed: int) -> np.ndarray:
    """Bounded, DETERMINISTIC training sample: top ``sample_size`` rows by
    a seeded hash of the id, normalized driver-side. A bare ``limit()``
    takes whole leading partitions, so on partition-correlated corpora
    (sorted by source/language) the quantizer would train on one stratum;
    hash-ordering is a uniform draw at the cost of one narrow (id, vec)
    scan — per-partition top-K + merge, no shuffle of the corpus."""
    rows = (df.select(F.xxhash64(F.col(id_col), F.lit(seed)).alias('h'),
                      F.col(vec_col).alias('v'))
            .orderBy('h').limit(sample_size).select('v').collect())
    m = np.stack([np.asarray(r['v'], dtype=np.float64) for r in rows])
    n = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, n, out=m, where=n > 0)
    return m


def ivf_index(df: DataFrame, n_lists: int | None = None,
              id_col: str = 'vec_id',
              vec_col: str = 'embedding', sample_size: int = 4096,
              seed: int = 42, n_docs: int | None = None,
              _sample: np.ndarray | None = None):
    """(centroids, indexed_df): learn ``n_lists`` centroids from a bounded
    sample (one small driver collect — constant memory at any corpus
    size), then assign every vector to its nearest list map-side.

    ``n_lists`` defaults to ~sqrt(n) (FAISS's guidance, clamped to
    [16, 4096]): a FIXED list count makes per-list occupancy — and so
    per-probe scan cost — grow linearly with the corpus (measured 39x
    time for 10x rows at n_lists=16); sqrt scaling keeps probe cost
    ~sqrt(n) per query. ``n_docs`` is a size hint; without it one
    columnar count fires at build time.

    Returns the centroid matrix and (id, nvec, list_id). At 100 TB the
    assignment is a single narrow pass; the index can be written
    partitioned by ``list_id`` so probes become partition-pruned scans.
    """
    if n_lists is None:
        if n_docs is None:
            n_docs = df.count()
        n_lists = min(4096, max(16, int(math.isqrt(max(n_docs, 1)))))
    nv = normalized(df, id_col, vec_col)
    # _sample: callers that already hold the (identical, same-seed)
    # training sample pass it in — pq_index needs the sample for its
    # codebooks anyway, and without the reuse the corpus paid the
    # top-K sample scan + collect twice per index build
    sample = _sample if _sample is not None \
        else _train_sample(df, id_col, vec_col, sample_size, seed)
    cent = _kmeans_centroids(sample, n_lists, seed)

    @F.pandas_udf(T.IntegerType())
    def _assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype='int32')
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    return cent, nv.withColumn('list_id', _assign(F.col('nvec')))


def _probe_udf(cent: np.ndarray, n_probes: int):
    """pandas UDF: a query vector -> its ``n_probes`` nearest coarse
    centroids (shared by the IVF and IVF-PQ probe sides)."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _probes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype='object')
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        order = np.argsort(-(m @ cent.T), axis=1)[:, :n_probes]
        return pd.Series([row.astype('int32').tolist() for row in order])
    return _probes


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int | None = None, n_probes: int = 3, seed: int = 42,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             sample_size: int = 4096, exclude_self: bool = True) -> DataFrame:
    """Approximate top-k via IVF: each query scans only its ``n_probes``
    nearest inverted lists (equi-join on list id), ranked exactly within
    candidates. Returns (query_id, vec_id, cosine, rank)."""
    cent, indexed = ivf_index(corpus, n_lists, id_col, vec_col,
                              sample_size, seed)
    cb = indexed.select(F.col('id').alias('vec_id'),
                        F.col('nvec').alias('cvec'), 'list_id')
    _probes = _probe_udf(cent, n_probes)
    qb = (normalized(queries, id_col, vec_col)
          .select(F.col('id').alias('query_id'), F.col('nvec').alias('qvec'))
          .withColumn('list_id', F.explode(_probes(F.col('qvec')))))
    j = cb.join(F.broadcast(qb), 'list_id')
    if exclude_self:
        j = j.filter(F.col('vec_id') != F.col('query_id'))
    scored = j.withColumn('cosine', cosine_udf(F.col('cvec'), F.col('qvec')))
    w = Window.partitionBy('query_id').orderBy(F.desc('cosine'), F.asc('vec_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k)
            .select('query_id', 'vec_id', 'cosine', 'rank'))


# ---------------------------------------------------------------- IVF-PQ

def _pq_codebooks(sample: np.ndarray, m: int, ks: int,
                  seed: int = 42, iters: int = 12) -> np.ndarray:
    """Per-subspace k-means codebooks (m, ks, dim/m) — classic product
    quantization training (Jégou et al. 2011, public method). Bounded
    driver work: the sample is capped by the caller."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f'dim {dim} not divisible by m={m} subspaces')
    sub = dim // m
    ks = min(ks, n)
    rng = np.random.RandomState(seed)
    books = np.empty((m, ks, sub))
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        cent = x[rng.choice(n, size=ks, replace=False)].copy()
        for _ in range(iters):
            # per-dimension accumulation avoids materializing the
            # n x ks x sub broadcast temp of
            # ((x[:,None,:]-cent)**2).sum(axis=2) — measured ~2x faster
            # at the default sample/ks and the win grows with sub.
            # NOT order-identical summation in general (numpy's axis
            # reduction goes pairwise for sub >= 8, so d2 can differ at
            # ulp scale); the refactor is ASSIGNMENT-STABLE in practice
            # — argmin ties are not decided at ulp distance on real
            # data — and codebook equality on fixed seeds is pinned in
            # tests/test_scale.py::test_pq_codebooks_perdim_bit_identical
            d2 = np.zeros((len(x), len(cent)))
            for dd in range(sub):
                t = x[:, dd, None] - cent[None, :, dd]
                d2 += t * t
            assign = d2.argmin(axis=1)
            for c in range(ks):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_index(df: DataFrame, n_lists: int | None = None, m: int = 8,
             ks: int = 256,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             sample_size: int = 4096, seed: int = 42):
    """(centroids, codebooks, indexed_df) — IVF-PQ index build: coarse
    k-means lists (as :func:`ivf_index`) plus an ``m``-byte PQ code per
    vector (``m`` subspaces x ``ks``<=256 centers). The corpus shrinks
    from ``4*dim`` bytes to ``m`` bytes per vector (e.g. 64-dim float ->
    8 bytes, 32x), which is what makes billion-scale ANN fit in memory.

    Scale shape: training is one bounded sample collect; encoding is a
    single map-side pandas-UDF pass (codebooks broadcast via closure);
    the index frame (id, list_id, code) can be written partitioned by
    list_id for partition-pruned probes."""
    if ks > 256:
        raise ValueError('ks must be <= 256 (one byte per subspace code)')
    # ONE training-sample scan serves both the coarse quantizer and the
    # PQ codebooks (same df/cols/size/seed -> identical array; the
    # duplicate scan+collect was measured at ~0.4 s warm per build)
    sample = _train_sample(df, id_col, vec_col, sample_size, seed)
    cent, indexed = ivf_index(df, n_lists, id_col, vec_col,
                              sample_size, seed, _sample=sample)
    # the training sample is bounded and skips the UDF pipeline entirely
    # (raw-column top-K, normalized driver-side), so the ONE checkpoint
    # below — of the fully encoded frame — is the only materialization;
    # everything downstream (code scan, refine join) reads it
    books = _pq_codebooks(sample, m, ks, seed)
    sub = sample.shape[1] // m

    @F.pandas_udf(T.BinaryType())
    def _encode(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype='object')
        x = np.stack([np.asarray(e, dtype=np.float64) for e in v])
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            xs = x[:, j * sub:(j + 1) * sub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series([c.tobytes() for c in codes])

    return cent, books, (indexed.withColumn('code', _encode(F.col('nvec')))
                         .localCheckpoint(eager=True))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_lists: int | None = None, n_probes: int = 3, m: int = 8,
               ks: int = 256, refine: int = 4, seed: int = 42,
               id_col: str = 'vec_id', vec_col: str = 'embedding',
               sample_size: int = 4096,
               exclude_self: bool = True) -> DataFrame:
    """Approximate top-k via IVF-PQ with asymmetric distance computation:
    queries probe their ``n_probes`` nearest lists, candidates are scored
    from the m-byte codes via per-query lookup tables (no full vectors
    touched), and the top ``k*refine`` ADC candidates are re-ranked with
    the exact cosine (``refine=0`` skips the exact pass and returns ADC
    scores). Returns (query_id, vec_id, cosine, rank).

    The candidate scan reads ``m`` bytes per corpus row — at 100 TB of
    raw embeddings the probe tier touches ~3% of lists x 32x less data;
    only the k*refine survivors per query load real vectors."""
    cent, books, indexed = pq_index(corpus, n_lists, m, ks, id_col,
                                    vec_col, sample_size, seed)
    # pq_index returns the encoded frame already materialized (one
    # checkpoint total): the code scan and the refine join both read it
    cb = indexed.select(F.col('id').alias('vec_id'), 'list_id', 'code')
    sub = books.shape[2]
    _probes = _probe_udf(cent, n_probes)
    nq = normalized(queries, id_col, vec_col)
    qb = (nq.select(F.col('id').alias('query_id'), F.col('nvec').alias('qvec'))
          .withColumn('list_id', F.explode(_probes(F.col('qvec')))))
    j = cb.join(F.broadcast(qb), 'list_id')
    if exclude_self:
        j = j.filter(F.col('vec_id') != F.col('query_id'))

    @F.pandas_udf(T.DoubleType())
    def _adc(code: pd.Series, qvec: pd.Series) -> pd.Series:
        if len(code) == 0:
            return pd.Series([], dtype='float64')
        luts: dict[bytes, np.ndarray] = {}
        out = np.empty(len(code))
        for i, (c, q) in enumerate(zip(code, qvec)):
            qa = np.asarray(q, dtype=np.float64)
            key = qa.tobytes()
            lut = luts.get(key)
            if lut is None:
                # (m, ks) table of per-subspace dot products
                lut = np.stack([books[jj] @ qa[jj * sub:(jj + 1) * sub]
                                for jj in range(books.shape[0])])
                luts[key] = lut
            idx = np.frombuffer(bytes(c), dtype=np.uint8)
            out[i] = lut[np.arange(len(idx)), idx].sum()
        return pd.Series(out)

    scored = j.withColumn('adc', _adc(F.col('code'), F.col('qvec')))
    w = Window.partitionBy('query_id').orderBy(F.desc('adc'), F.asc('vec_id'))
    if not refine:
        return (scored.withColumn('rank', F.row_number().over(w))
                .filter(F.col('rank') <= k)
                .select('query_id', 'vec_id',
                        F.col('adc').alias('cosine'), 'rank'))
    cand = (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k * refine)
            .select('query_id', 'vec_id', 'qvec'))
    vecs = indexed.select(F.col('id').alias('vec_id'),
                          F.col('nvec').alias('cvec'))
    exact = (cand.join(vecs, 'vec_id')
             .withColumn('cosine', cosine_udf(F.col('cvec'), F.col('qvec'))))
    w2 = Window.partitionBy('query_id').orderBy(F.desc('cosine'),
                                                F.asc('vec_id'))
    return (exact.withColumn('rank', F.row_number().over(w2))
            .filter(F.col('rank') <= k)
            .select('query_id', 'vec_id', 'cosine', 'rank'))


# ------------------------------------------------------- bitext mining

#: exact-mode bound on the broadcast side (rows x dim floats; 100k x
#: 64 = 25 MB per executor) — past it the windowed matrix path runs
_BITEXT_BROADCAST_CAP = 100_000


def _exact_topk_both(src: DataFrame, tgt: DataFrame, k: int,
                     id_col: str, vec_col: str):
    """Both directions' exact k-NN in ONE pass: the src matrix is
    broadcast (bounded by ``_BITEXT_BROADCAST_CAP``), one mapInPandas
    over tgt does a blocked NumPy matmul per Arrow batch — per tgt row
    the top-k over src is final; per src column each batch emits its
    local top-k, merged by one small window afterwards (candidates are
    k x n_src x n_batches rows, nothing matrix-sized ever shuffles).
    The naive alternative — scoring the n x m matrix and running two
    row_number windows over it — measured 2x slower at the sf0.1 gate
    (the two matrix-sized shuffles dominate). Over the cap, that
    windowed path is the fallback; ``method='lsh'`` remains the
    100 TB path. Returns (xt, yx) in the retriever contract
    (query_id, vec_id, cosine, rank)."""
    rows = src.select(F.col(id_col).cast('long').alias('id'), vec_col) \
        .limit(_BITEXT_BROADCAST_CAP + 1).collect()
    if len(rows) > _BITEXT_BROADCAST_CAP:
        return _exact_topk_both_windowed(src, tgt, k, id_col, vec_col)
    s_ids = np.array([r['id'] for r in rows], dtype=np.int64)
    S = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    spark = src.sparkSession
    bc = spark.sparkContext.broadcast((s_ids, S))
    out_schema = T.StructType([
        T.StructField('side', T.StringType()),
        T.StructField('query_id', T.LongType()),
        T.StructField('vec_id', T.LongType()),
        T.StructField('cosine', T.DoubleType())])
    kk = k

    def _kernel(batches):
        s_ids_l, S_l = bc.value
        n_src = len(s_ids_l)
        top = min(kk, n_src)
        for pdf in batches:
            if not len(pdf):
                continue
            t_ids = pdf['_id'].to_numpy(dtype=np.int64)
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf['_vec']])
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            C = M @ S_l.T  # (batch_tgt, n_src)
            out = {'side': [], 'query_id': [], 'vec_id': [], 'cosine': []}
            # per tgt row: exact top-k over ALL src (ties by src id asc)
            order = np.lexsort((s_ids_l[None, :].repeat(len(t_ids), 0),
                                -C), axis=1)[:, :top]
            for i in range(len(t_ids)):
                for j in order[i]:
                    out['side'].append('yx')
                    out['query_id'].append(int(t_ids[i]))
                    out['vec_id'].append(int(s_ids_l[j]))
                    out['cosine'].append(float(C[i, j]))
            # per src column: this batch's local top-k over tgt
            topc = min(kk, len(t_ids))
            order_c = np.lexsort((t_ids[:, None].repeat(n_src, 1),
                                  -C), axis=0)[:topc, :]
            for j in range(n_src):
                for i in order_c[:, j]:
                    out['side'].append('xt')
                    out['query_id'].append(int(s_ids_l[j]))
                    out['vec_id'].append(int(t_ids[i]))
                    out['cosine'].append(float(C[i, j]))
            yield pd.DataFrame(out)

    both = tgt.select(F.col(id_col).cast('long').alias('_id'),
                      F.col(vec_col).alias('_vec')) \
        .mapInPandas(_kernel, out_schema).localCheckpoint(eager=True)
    w = Window.partitionBy('query_id').orderBy(F.desc('cosine'),
                                               F.asc('vec_id'))
    xt = (both.filter(F.col('side') == 'xt')
          .withColumn('rank', F.row_number().over(w))
          .filter(F.col('rank') <= k)
          .select('query_id', 'vec_id', 'cosine', 'rank'))
    yx = (both.filter(F.col('side') == 'yx')
          .withColumn('rank', F.row_number().over(w))
          .filter(F.col('rank') <= k)
          .select('query_id', 'vec_id', 'cosine', 'rank'))
    return xt, yx


def _exact_topk_both_windowed(src: DataFrame, tgt: DataFrame, k: int,
                              id_col: str, vec_col: str):
    """Fallback past the broadcast cap: score the n x m matrix once
    (codegen zip_with/aggregate on normalized vectors) and run both
    directions' row_number windows over the checkpointed scores."""
    s = normalized(src, id_col, vec_col) \
        .select(F.col('id').alias('src_id'), F.col('nvec').alias('svec'))
    t = normalized(tgt, id_col, vec_col) \
        .select(F.col('id').alias('tgt_id'), F.col('nvec').alias('tvec'))
    cos = F.aggregate(
        F.zip_with('svec', 'tvec', lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    mat = (t.join(F.broadcast(s), F.lit(True))
           .select('src_id', 'tgt_id', cos.alias('cosine'))
           .localCheckpoint(eager=True))
    wx = Window.partitionBy('src_id').orderBy(F.desc('cosine'),
                                              F.asc('tgt_id'))
    wy = Window.partitionBy('tgt_id').orderBy(F.desc('cosine'),
                                              F.asc('src_id'))
    xt = (mat.withColumn('rank', F.row_number().over(wx))
          .filter(F.col('rank') <= k)
          .select(F.col('src_id').alias('query_id'),
                  F.col('tgt_id').alias('vec_id'), 'cosine', 'rank'))
    yx = (mat.withColumn('rank', F.row_number().over(wy))
          .filter(F.col('rank') <= k)
          .select(F.col('tgt_id').alias('query_id'),
                  F.col('src_id').alias('vec_id'), 'cosine', 'rank'))
    return xt, yx

def bitext_mine(src: DataFrame, tgt: DataFrame, k: int = 4,
                threshold: float = 1.04, method: str = 'exact',
                id_col: str = 'vec_id', vec_col: str = 'embedding',
                **retriever_kw) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
    "Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings", ACL — the scoring behind the CCMatrix/WikiMatrix
    bitext pipelines): candidate translation pairs (x in ``src``,
    y in ``tgt``) are scored by the RATIO margin

        margin(x, y) = cos(x, y) /
                       (mean_kNN_cos(x -> tgt)/2 + mean_kNN_cos(y -> src)/2)

    which normalizes raw cosine by how "hubby" each side's
    neighborhood is — the fix for the hubness failure of plain
    cosine thresholds the paper documents. The 'max' retrieval
    strategy keeps, per source row, the best-margin candidate at or
    above ``threshold`` (the paper's operating point is ~1.04-1.06).

    Returns (src_id, tgt_id, cosine, margin) with margin the deciding
    score, deterministic (ties break on tgt id ascending).

    Scale shape: both directions' k-NN come from the pluggable
    retriever — ``method='exact'`` (:func:`cosine_topk`, broadcast
    queries, corpus never shuffled) for verification scale,
    ``method='lsh'`` (:func:`lsh_topk`, bucket equi-join) for the
    100 TB path where both sides are large; the margin arithmetic on
    top is two map-side aggs + one broadcastable join of per-id
    neighborhood means onto the candidate list — nothing quadratic,
    no shuffle beyond the retriever's own."""
    if method not in ('exact', 'lsh'):
        raise ValueError("method must be one of ['exact', 'lsh'], "
                         f"got {method!r}")
    # x -> tgt neighborhoods: candidates AND x's denominator; y -> src
    # neighborhoods: y's denominator (and extra candidates, per paper)
    if method == 'exact':
        if retriever_kw:
            raise ValueError('retriever kwargs only apply to method='
                             f"'lsh', got {sorted(retriever_kw)}")
        xt, yx = _exact_topk_both(src, tgt, k, id_col, vec_col)
    else:
        xt = lsh_topk(tgt, src, k=k, id_col=id_col, vec_col=vec_col,
                      exclude_self=False, **retriever_kw)
        yx = lsh_topk(src, tgt, k=k, id_col=id_col, vec_col=vec_col,
                      exclude_self=False, **retriever_kw)
    x_mean = xt.groupBy('query_id').agg(F.avg('cosine').alias('x_knn'))
    y_mean = yx.groupBy('query_id').agg(F.avg('cosine').alias('y_knn'))
    cands = (xt.select(F.col('query_id').alias('src_id'),
                       F.col('vec_id').alias('tgt_id'), 'cosine')
             .unionByName(
                 yx.select(F.col('vec_id').alias('src_id'),
                           F.col('query_id').alias('tgt_id'), 'cosine'))
             .groupBy('src_id', 'tgt_id').agg(F.max('cosine').alias('cosine')))
    scored = (cands
              .join(x_mean.withColumnRenamed('query_id', 'src_id'), 'src_id')
              .join(y_mean.withColumnRenamed('query_id', 'tgt_id'), 'tgt_id')
              .withColumn('margin', F.col('cosine')
                          / (F.col('x_knn') / 2 + F.col('y_knn') / 2)))
    w = Window.partitionBy('src_id').orderBy(F.desc('margin'), F.asc('tgt_id'))
    return (scored.withColumn('_r', F.row_number().over(w))
            .filter((F.col('_r') == 1) & (F.col('margin') >= threshold))
            .select('src_id', 'tgt_id', 'cosine', 'margin'))


# ------------------------------------------------- hard-negative mining

def mine_hard_negatives(corpus: DataFrame, queries: DataFrame,
                        positives: DataFrame, k: int = 5,
                        id_col: str = 'vec_id',
                        vec_col: str = 'embedding',
                        max_cosine: float | None = None,
                        method: str = 'exact', fetch_factor: int = 4,
                        **retriever_kw) -> DataFrame:
    """Top-k most-similar NON-positive corpus items per anchor —
    the hard negatives contrastive retrieval training mines (DPR,
    Karpukhin et al. 2020 §5.2; Sentence-BERT fine-tuning): random
    negatives are too easy, so each anchor trains against the
    highest-scoring items that are NOT labeled positive.

    ``positives`` is the label table, columns (query_id, vec_id) —
    anti-joined out BEFORE ranking, so every positive consumes no
    negative slot. ``max_cosine`` additionally drops candidates at or
    above the cut — the standard false-negative guard: an unlabeled
    near-duplicate of the positive is far more likely a missing label
    than a genuinely hard negative (the "denoised" mining of
    RocketQA, Qu et al. 2021). Self-matches never mine.

    Returns (query_id, vec_id, cosine, neg_rank), neg_rank 1..k dense
    per anchor, ties broken by corpus id ascending (deterministic).

    ``method='exact'`` is the brute-force path: anchors (and the
    positives table) are EXPLICITLY broadcast — correct for the
    mining shape (anchors are a training batch, thousands to ~1M;
    positives a few labels per anchor), wrong for anchor sets beyond
    executor memory, which should use the approximate methods or
    batch their anchors. The corpus is scanned once, anti-join + band
    filter applied BEFORE the per-anchor window, so the result is
    exactly the top-k of the eligible set. ``'ivf'`` / ``'lsh'`` are
    the 100 TB corpus paths: fetch
    ``k * fetch_factor`` approximate candidates per anchor, then
    anti-join + re-rank — a positive-dense neighborhood can consume
    fetched slots, so recall of rank-k negatives degrades gracefully
    with fetch_factor (exact path has no such loss). Extra
    ``retriever_kw`` reach the retriever (n_probes, n_lists, ...).
    """
    pos = positives.select(F.col('query_id').cast('long').alias('query_id'),
                           F.col('vec_id').cast('long').alias('vec_id'))
    if method == 'exact':
        c = normalized(corpus, id_col, vec_col) \
            .select(F.col('id').alias('vec_id'), F.col('nvec').alias('cvec'))
        q = normalized(queries, id_col, vec_col) \
            .select(F.col('id').alias('query_id'), F.col('nvec').alias('qvec'))
        j = c.join(F.broadcast(q), F.col('vec_id') != F.col('query_id'))
        scored = j.join(F.broadcast(pos), ['query_id', 'vec_id'],
                        'left_anti') \
            .withColumn('cosine', cosine_udf(F.col('cvec'), F.col('qvec')))
    elif method in ('ivf', 'lsh'):
        fetch = {'ivf': ivf_topk, 'lsh': lsh_topk}[method]
        cand = fetch(corpus, queries, k=k * fetch_factor, id_col=id_col,
                     vec_col=vec_col, exclude_self=True, **retriever_kw)
        scored = cand.join(F.broadcast(pos), ['query_id', 'vec_id'],
                           'left_anti').drop('rank')
    else:
        raise ValueError(f"method must be 'exact', 'ivf' or 'lsh', "
                         f"got {method!r}")
    if max_cosine is not None:
        scored = scored.filter(F.col('cosine') < max_cosine)
    w = Window.partitionBy('query_id').orderBy(F.desc('cosine'),
                                               F.asc('vec_id'))
    return (scored.withColumn('neg_rank', F.row_number().over(w))
            .filter(F.col('neg_rank') <= k)
            .select('query_id', 'vec_id', 'cosine', 'neg_rank'))


def mmr_select(candidates: DataFrame, k: int = 10, lam: float = 0.5,
               id_col: str = 'vec_id', vec_col: str = 'embedding',
               rel_col: str = 'relevance', pool: int = 1000) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick ``k`` items maximizing

        lam * relevance(d) - (1 - lam) * max_{s in selected} cos(d, s)

    — the standard diversity re-rank for retrieval-corpus construction
    (one exemplar per redundant cluster instead of k copies of the top
    hit). Relevance comes from ``rel_col`` (BM25, a cross-encoder, a
    query cosine — the caller's choice), diversity from the embedding
    column. Fully deterministic: ties break by ascending id at every
    step.

    Scale shape: the GREEDY stage is inherently sequential, so the
    design splits it — stage 1 takes the top-``pool`` candidates by
    relevance DISTRIBUTED (TakeOrderedAndProject, partial top-n per
    partition), stage 2 runs the k greedy rounds over the bounded pool
    driver-side with one vectorized pool-sized similarity update per
    round (numpy, O(pool * k) dot products on unit vectors). ``pool``
    is the explicit memory/fidelity knob; MMR beyond a few thousand
    candidates re-ranks noise anyway. Returns (rank, id, relevance,
    mmr_score) with rank 0-based in selection order."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f'lam must be in [0, 1], got {lam}')
    if k <= 0 or pool <= 0:
        raise ValueError('k and pool must be positive')
    spark = candidates.sparkSession
    rows = (candidates
            .select(F.col(id_col), F.col(rel_col).cast('double'),
                    F.col(vec_col))
            .orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
            .limit(int(pool)).collect())
    out_schema = (f'rank int, {id_col} {dict(candidates.dtypes)[id_col]}, '
                  'relevance double, mmr_score double')
    if not rows:
        return spark.createDataFrame([], out_schema)
    ids = [r[0] for r in rows]
    rel = np.array([r[1] for r in rows], dtype=np.float64)
    m = np.stack([np.asarray(r[2], dtype=np.float64) for r in rows])
    n = np.linalg.norm(m, axis=1, keepdims=True)
    np.divide(m, n, out=m, where=n > 0)
    c = len(ids)
    selected: list[int] = []
    max_sim = np.full(c, -np.inf)
    taken = np.zeros(c, dtype=bool)
    picks = []
    for rank in range(min(k, c)):
        pen = np.where(np.isneginf(max_sim), 0.0, max_sim)
        score = lam * rel - (1.0 - lam) * pen
        score[taken] = -np.inf
        best = int(score.argmax())
        # deterministic tie-break: smallest id among exact score ties
        tied = np.nonzero(score == score[best])[0]
        if len(tied) > 1:
            best = int(min(tied, key=lambda i: ids[i]))
        picks.append((rank, ids[best], float(rel[best]),
                      float(score[best])))
        taken[best] = True
        max_sim = np.maximum(max_sim, m @ m[best])
    return spark.createDataFrame(picks, out_schema)
