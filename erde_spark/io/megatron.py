"""Megatron-LM / fairseq indexed-dataset (``.bin`` + ``.idx``) sink
and source — the binarized-token interchange format most large-LM
training stacks memory-map at train time.

Format implemented from the published fairseq/Megatron-LM
``indexed_dataset`` layout (the ``MMapIndexedDataset`` variant):

``.idx``::

    magic    9 bytes   b'MMIDIDX\\x00\\x00'
    version  <Q        1
    dtype    <B        code from _DTYPE_CODES below
    n_seq    <Q        number of sequences
    n_doc    <Q        len(doc_idx)  (leading 0 included, so docs+1)
    sizes    <i4 * n_seq   token count per sequence
    pointers <i8 * n_seq   byte offset of each sequence in .bin
    doc_idx  <i8 * n_doc   cumulative sequence index per document

``.bin``: the token arrays, concatenated, little-endian fixed dtype.

The dtype code table is the published fairseq one (1 uint8, 2 int8,
3 int16, 4 int32, 5 int64, 6 float64, 7 float64-alias, 8 uint16); the
writer emits codes {1,2,3,4,5,6,8} and the reader accepts 7 as
float64 for files produced by the original tools.

Spark-side design (no counterpart in the reference — its sinks are
single-process, ``/root/reference/erde/io/base.py``):

* The sink writes one ``part-<task>-<n>`` shard PAIR per roll,
  executor-side via ``foreachPartition`` — no driver collect. Shards
  roll every ``shard_size`` sequences or ``shard_bytes`` of .bin
  payload, whichever comes first, so a skewed 10 GB partition becomes
  ~40 splittable 256 MB pairs instead of one unsplittable file, and
  ``shard_bytes`` is the sink's per-task memory high-water mark (one
  shard's arrays are buffered so the .bin writes in one pass and the
  .idx knows its pointers). Both files stage to attempt-scoped temp
  names and ``os.replace`` onto the final name (.bin first, .idx
  last) so a speculative or retried attempt never interleaves bytes,
  and a reader that lists ``*.idx`` never sees a committed index
  whose .bin is still in flight.
* The source scans ``*.idx`` through Spark's ``binaryFile`` (small:
  16 B/sequence) and opens the sibling ``.bin`` through a
  pyarrow FileSystem resolved from the file's own URI — local,
  HDFS and object-store paths all work without shuffling shard
  bytes through an equi-join. Memory per task is bounded by the
  largest single shard (the write side's ``shard_bytes``), same
  contract as the TFRecord source.
"""
from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b'MMIDIDX\x00\x00'
_VERSION = 1

_DTYPE_CODES = {'uint8': 1, 'int8': 2, 'int16': 3, 'int32': 4,
                'int64': 5, 'float64': 6, 'uint16': 8}
_CODE_DTYPES = {1: np.uint8, 2: np.int8, 3: np.int16, 4: np.int32,
                5: np.int64, 6: np.float64, 7: np.float64, 8: np.uint16}


def _write_shard(path_base: str, sizes: np.ndarray, flat: np.ndarray,
                 dtype: np.dtype, scheme: str = '') -> None:
    """Write one committed .bin/.idx pair. ``flat`` is every sequence
    concatenated (already cast to ``dtype``); ``sizes`` the per-
    sequence token counts — the .bin IS the concatenation, so the
    writer never touches individual documents. ``scheme`` selects the
    pyarrow.fs two-phase commit for URI destinations (object stores
    have no atomic rename; see ``task_files.open_staged``)."""
    from erde_spark.io.task_files import open_staged
    sizes = np.asarray(sizes, dtype=np.int32)
    itemsize = np.dtype(dtype).itemsize
    pointers = np.zeros(len(sizes), dtype=np.int64)
    if len(sizes) > 1:
        np.cumsum(sizes[:-1].astype(np.int64) * itemsize,
                  out=pointers[1:])
    doc_idx = np.arange(len(sizes) + 1, dtype=np.int64)

    out, commit_bin, abort_bin = open_staged(path_base + '.bin', scheme)
    try:
        out.write(flat.astype(dtype, copy=False).tobytes())
        out.close()
    except BaseException:
        abort_bin()
        raise
    out, commit_idx, abort_idx = open_staged(path_base + '.idx', scheme)
    try:
        out.write(_MAGIC)
        out.write(struct.pack('<Q', _VERSION))
        out.write(struct.pack('<B', _DTYPE_CODES[np.dtype(dtype).name]))
        out.write(struct.pack('<Q', len(sizes)))
        out.write(struct.pack('<Q', len(doc_idx)))
        out.write(sizes.tobytes())
        out.write(pointers.tobytes())
        out.write(doc_idx.tobytes())
        out.close()
    except BaseException:
        abort_idx()
        abort_bin()
        raise
    # .bin commits before .idx: a listed index always has a whole .bin
    commit_bin(min_size=0 if flat.size == 0 else 1)
    commit_idx()


def write_megatron(df: DataFrame, path: str, tokens_col: str = 'tokens',
                   dtype: str = 'int32', mode: str = 'overwrite',
                   shard_size: int = 200_000,
                   shard_bytes: int = 256 << 20) -> None:
    """Write the array column ``tokens_col`` as Megatron indexed-dataset
    shard pairs under ``path`` (one document = one sequence). Null
    arrays raise (the format has no null slot; filter or
    ``coalesce`` to an empty array first — an EMPTY array is fine and
    round-trips as size 0). Integer dtypes bounds-check before the
    cast so an out-of-range token id raises instead of silently
    wrapping."""
    if np.dtype(dtype).name not in _DTYPE_CODES:
        raise ValueError(f'unsupported dtype {dtype!r}; '
                         f'one of {sorted(_DTYPE_CODES)}')
    np_dtype = np.dtype(dtype)
    from erde_spark.io.fsutil import prepare_dir
    scheme = prepare_dir(path, mode)
    if shard_size <= 0 or shard_bytes <= 0:
        raise ValueError('shard_size and shard_bytes must be positive')
    rows = df.select(F.col(tokens_col).alias('_toks'))
    lo, hi = None, None
    if np_dtype.kind in 'iu':
        info = np.iinfo(np_dtype)
        lo, hi = info.min, info.max
    wide = np.float64 if lo is None else np.int64
    itemsize = np_dtype.itemsize

    def _write_partition(batches):
        # Arrow-vectorized: per batch ONE concatenate + ONE bounds
        # check + ONE dtype cast; shard-roll boundaries are found with
        # searchsorted over the cumulative byte sizes (O(shards log n)
        # per batch), so no per-document Python runs anywhere
        import pandas as pd
        from pyspark import TaskContext
        tid = TaskContext.get().partitionId()
        shard_idx = 0
        pend_flat: list = []          # cast chunks awaiting a flush
        pend_sizes: list = []
        cur_records = 0
        cur_bytes = 0

        def _flush():
            nonlocal shard_idx, pend_flat, pend_sizes
            nonlocal cur_records, cur_bytes
            if not cur_records:
                return
            base = f'part-{tid:05d}-{shard_idx:05d}'
            _write_shard(
                f'{path}/{base}' if scheme else os.path.join(path, base),
                np.concatenate(pend_sizes) if pend_sizes
                else np.zeros(0, np.int32),
                np.concatenate(pend_flat) if pend_flat
                else np.zeros(0, np_dtype),
                np_dtype, scheme)
            shard_idx += 1
            pend_flat, pend_sizes = [], []
            cur_records = cur_bytes = 0

        for pdf in batches:
            vals = pdf['_toks']
            if vals.isna().any():
                raise ValueError(
                    'null token array (coalesce to [] or filter first)')
            vals = vals.values
            lens = np.fromiter((len(v) for v in vals), np.int64,
                               len(vals))
            flat = (np.concatenate([np.asarray(v, dtype=wide)
                                    for v in vals])
                    if lens.sum() else np.zeros(0, wide))
            if lo is not None and len(flat) and \
                    (flat.min() < lo or flat.max() > hi):
                raise ValueError(
                    f'token id out of range for {np_dtype.name}: '
                    f'[{flat.min()}, {flat.max()}] vs [{lo}, {hi}]')
            flat = flat.astype(np_dtype, copy=False)
            off = np.zeros(len(vals) + 1, np.int64)
            np.cumsum(lens, out=off[1:])
            cum_b = off[1:] * itemsize
            i = 0
            while i < len(vals):
                take_rec = shard_size - cur_records
                room = shard_bytes - cur_bytes
                base = cum_b[i - 1] if i else 0
                take_byte = int(np.searchsorted(
                    cum_b, base + room, side='left')) - i + 1
                k = max(1, min(take_rec, take_byte, len(vals) - i))
                pend_sizes.append(lens[i:i + k].astype(np.int32))
                pend_flat.append(flat[off[i]:off[i + k]])
                cur_records += k
                cur_bytes += int(cum_b[i + k - 1] - base)
                i += k
                if cur_records >= shard_size or cur_bytes >= shard_bytes:
                    _flush()
        _flush()
        yield pd.DataFrame({'shards': [shard_idx]})

    out_schema = T.StructType([T.StructField('shards', T.LongType())])
    # collect is bounded: exactly one summary row per task
    rows.mapInPandas(_write_partition, out_schema).collect()


def parse_idx(buf: bytes):
    """(dtype, sizes, pointers, doc_idx) from raw ``.idx`` bytes."""
    if buf[:9] != _MAGIC:
        raise IOError(f'bad magic {buf[:9]!r} (not an MMIDIDX index)')
    (version,) = struct.unpack_from('<Q', buf, 9)
    if version != _VERSION:
        raise IOError(f'unsupported index version {version}')
    code = buf[17]
    if code not in _CODE_DTYPES:
        raise IOError(f'unknown dtype code {code}')
    (n_seq,) = struct.unpack_from('<Q', buf, 18)
    (n_doc,) = struct.unpack_from('<Q', buf, 26)
    pos = 34
    sizes = np.frombuffer(buf, np.int32, n_seq, pos)
    pos += 4 * n_seq
    pointers = np.frombuffer(buf, np.int64, n_seq, pos)
    pos += 8 * n_seq
    doc_idx = np.frombuffer(buf, np.int64, n_doc, pos)
    return np.dtype(_CODE_DTYPES[code]), sizes, pointers, doc_idx


def _open_sibling_bin(idx_uri: str):
    """Open the ``.bin`` next to an ``.idx`` URI via the filesystem the
    URI itself names (local / hdfs / s3 all resolve; no shuffle)."""
    import pyarrow.fs as pafs
    bin_uri = idx_uri[:-4] + '.bin'
    try:
        fs, fpath = pafs.FileSystem.from_uri(bin_uri)
        return fs.open_input_file(fpath)
    except (OSError, ValueError):
        local = bin_uri[7:] if bin_uri.startswith('file://') else bin_uri
        return open(local, 'rb')


def read_megatron(spark: SparkSession, path: str,
                  tokens_col: str = 'tokens') -> DataFrame:
    """Read a Megatron indexed-dataset directory back as
    ``(_file string, seq_id long, tokens array)`` — ``seq_id`` is the
    sequence's ordinal within its shard. Element type is long for
    integer shards, double for float shards (mixed-dtype directories
    read as long if ALL shards are integral). One whole ``.bin`` is
    buffered per file row, so task memory is bounded by the write
    side's ``shard_bytes``, not by directory size."""
    probe = spark.read.format('binaryFile') \
        .option('pathGlobFilter', '*.idx').load(path) \
        .select('path', 'content')
    # peek one index for the element type (driver-side, 16 B/seq file)
    first = probe.limit(1).collect()
    is_float = False
    if first:
        dt, _, _, _ = parse_idx(bytes(first[0]['content']))
        is_float = dt.kind == 'f'
    elem = T.DoubleType() if is_float else T.LongType()
    schema = T.StructType([
        T.StructField('_file', T.StringType()),
        T.StructField('seq_id', T.LongType()),
        T.StructField(tokens_col, T.ArrayType(elem))])

    def _parse(batches):
        import pandas as pd
        cast = np.float64 if is_float else np.int64
        for pdf in batches:
            files, seq_ids, toks = [], [], []
            for fpath, blob in zip(pdf['path'], pdf['content']):
                dt, sizes, pointers, _ = parse_idx(bytes(blob))
                with _open_sibling_bin(fpath) as f:
                    raw = f.read()
                # one decode + one cast for the whole file, then
                # zero-copy views per sequence — valid when pointers
                # are the contiguous cumsum (always true for this
                # writer and the published one); a foreign gapped
                # layout falls back to per-sequence decodes
                ends = np.cumsum(sizes.astype(np.int64))
                starts = ends - sizes
                if (pointers == starts * dt.itemsize).all():
                    whole = np.frombuffer(raw, dt, int(ends[-1])
                                          if len(ends) else 0) \
                        .astype(cast, copy=False)
                    seqs = np.split(whole, ends[:-1])
                else:
                    seqs = [np.frombuffer(raw, dt, int(sizes[i]),
                                          int(pointers[i])).astype(cast)
                            for i in range(len(sizes))]
                files.extend([os.path.basename(fpath)] * len(sizes))
                seq_ids.extend(range(len(sizes)))
                toks.extend(seqs)
            yield pd.DataFrame(
                {'_file': files, 'seq_id': seq_ids, tokens_col: toks})

    return probe.mapInPandas(_parse, schema)
