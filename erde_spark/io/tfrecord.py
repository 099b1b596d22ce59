"""TFRecord IO — the TensorFlow training interchange format (public
spec: TFRecord framing = [length u64le][masked crc32c(length) u32le]
[payload][masked crc32c(payload) u32le]; payload = a `tf.train.Example`
protobuf). Both the protobuf Example encoding and CRC-32C (Castagnoli,
reflected poly 0x82F63B78, final xor, TF's rotate+magic masking) are
implemented here from the published specifications — no tensorflow /
protobuf / crc32c packages in this container.

Spark-first shape: the SINK writes `.tfrecord` shards executor-side,
ROLLING a new shard per ``shard_size`` records / ``shard_bytes`` bytes
(repartition controls parallelism; rolling bounds shard size under
partition skew — and therefore the read side's per-file buffer, since
``binaryFile`` hands each shard over whole); shards stage to
attempt-scoped temp names and rename atomically on completion. The
SOURCE lists files with ``binaryFile`` and parses frames inside
``mapInPandas`` (CRC verification on by default — a corrupt frame
raises with the offset; verification runs through the same vectorized
kernel as the write side, one ``crc32c_many`` call per CRC column per
file). CRC is computed VECTORIZED ACROSS RECORDS: the per-byte table
recurrence is sequential within one record, so the kernel walks byte
POSITIONS and updates every record's running CRC as one numpy step per
position — batch cost is O(max_record_len) vector ops instead of a
per-byte Python loop per record.

Feature kinds supported (the Example oneof): 'bytes' (BytesList —
strings are UTF-8 encoded), 'int64' (Int64List, packed varints),
'float' (FloatList, packed f32). Scalars and arrays both round-trip;
null values write an empty list and read back as null.

No counterpart in the reference (training-data extension surface,
SURVEY.md §7.0 layer 6).
"""
from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- crc32c

_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0x82F63B78 if _c & 1 else 0)
    _CRC_TABLE[_i] = _c


def crc32c(data: bytes) -> int:
    """CRC-32C of one buffer (table-driven, numpy-free fallback)."""
    crc = 0xFFFFFFFF
    tab = _CRC_TABLE
    for b in data:
        crc = (crc >> 8) ^ int(tab[(crc ^ b) & 0xFF])
    return crc ^ 0xFFFFFFFF


#: padded-matrix budget for the vectorized CRC (bytes). One outlier
#: record must not blow the batch up to n_records x max_len — records
#: are length-sorted into slabs under this budget, so a 100 MB doc in
#: a 5000-record batch costs one 100 MB slab, not a 500 GB matrix.
_CRC_SLAB_BYTES = 64 << 20


def crc32c_many(bufs: list) -> np.ndarray:
    """CRC-32C of MANY buffers at once: records are padded into a
    (n, max_len) byte matrix and the table recurrence walks byte
    positions — each step updates all still-active records as one
    vectorized operation, so cost is O(max_len) numpy steps rather
    than a Python loop per byte per record. Records are length-sorted
    into slabs whose PADDED size stays under ``_CRC_SLAB_BYTES``
    (memory guard + high lane occupancy under length skew). Profile:
    throughput is bounded by max_len Python-loop iterations per slab —
    ideal for the many-small-records shape TFRecord is built for; a
    single multi-MB record degenerates to ~1 MB/s and belongs in a
    bytes-typed parquet column instead."""
    n = len(bufs)
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    order = sorted(range(n), key=lambda i: len(bufs[i]))
    out = np.zeros(n, dtype=np.uint32)
    start = 0
    while start < n:
        end = start + 1
        max_len = max(len(bufs[order[start]]), 1)
        while end < n:
            cand = max(len(bufs[order[end]]), 1)
            if cand * (end - start + 1) > _CRC_SLAB_BYTES:
                break
            max_len = cand
            end += 1
        idx = order[start:end]
        lens = np.fromiter((len(bufs[i]) for i in idx), dtype=np.int64,
                           count=len(idx))
        m = int(lens.max()) if len(idx) else 0
        mat = np.zeros((len(idx), m), dtype=np.uint8)
        for r, i in enumerate(idx):
            if len(bufs[i]):
                mat[r, :len(bufs[i])] = np.frombuffer(bufs[i],
                                                      dtype=np.uint8)
        crc = np.full(len(idx), 0xFFFFFFFF, dtype=np.uint32)
        for j in range(m):
            active = lens > j
            if not active.any():
                break
            c = crc[active]
            crc[active] = (c >> np.uint32(8)) ^ _CRC_TABLE[
                (c ^ mat[active, j]) & np.uint32(0xFF)]
        out[idx] = crc ^ np.uint32(0xFFFFFFFF)
        start = end
    return out


def _mask(crc):
    """TF's masked CRC: rot-right-15 plus the published magic."""
    crc = np.asarray(crc, dtype=np.uint64)
    rot = ((crc >> np.uint64(15)) | (crc << np.uint64(17))) \
        & np.uint64(0xFFFFFFFF)
    return (rot + np.uint64(0xA282EAD8)) & np.uint64(0xFFFFFFFF)


# --------------------------------------------------- protobuf encoding

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zig(n: int) -> int:
    """int64 two's-complement as protobuf expects (no zigzag for
    int64 fields — negative values encode as 10-byte varints)."""
    return n & 0xFFFFFFFFFFFFFFFF


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _feature(kind: str, values) -> bytes:
    """Encode one Feature message. values is a list (possibly empty)."""
    if kind == 'bytes':
        inner = b''.join(_ld(1, v) for v in values)
        return _ld(1, inner)                    # BytesList bytes_list = 1
    if kind == 'float':
        packed = struct.pack(f'<{len(values)}f', *values) if values else b''
        return _ld(2, _ld(1, packed) if values else b'')  # FloatList = 2
    if kind == 'int64':
        packed = b''.join(_varint(_zig(int(v))) for v in values)
        return _ld(3, _ld(1, packed) if values else b'')  # Int64List = 3
    raise ValueError(f'unknown feature kind {kind!r}')


def encode_example(features: dict) -> bytes:
    """tf.train.Example bytes from {name: (kind, values-list)}."""
    feats = b''
    for name in sorted(features):               # deterministic order
        kind, values = features[name]
        entry = _ld(1, name.encode('utf-8')) + _ld(2, _feature(kind, values))
        feats += _ld(1, entry)                  # map entry: Features.feature
    return _ld(1, feats)                        # Example.features = 1


class _Reader:
    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def varint(self) -> int:
        r = s = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            r |= (b & 0x7F) << s
            if not b & 0x80:
                return r
            s += 7

    def take(self, n: int) -> bytes:
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out


def _parse_fields(buf: bytes):
    """Yield (field, wire, value) over one message's fields."""
    r = _Reader(buf)
    while r.pos < len(buf):
        key = r.varint()
        field, wire = key >> 3, key & 7
        if wire == 2:
            yield field, wire, r.take(r.varint())
        elif wire == 0:
            yield field, wire, r.varint()
        elif wire == 5:
            yield field, wire, r.take(4)
        elif wire == 1:
            yield field, wire, r.take(8)
        else:
            raise ValueError(f'unsupported wire type {wire}')


def decode_example(buf: bytes) -> dict:
    """{name: (kind, values-list)} from tf.train.Example bytes."""
    out = {}
    for f1, _, feats in _parse_fields(buf):
        if f1 != 1:
            continue
        for fe, _, entry in _parse_fields(feats):
            if fe != 1:
                continue
            name, feature = None, b''
            for fk, _, v in _parse_fields(entry):
                if fk == 1:
                    name = v.decode('utf-8')
                elif fk == 2:
                    feature = v
            kind, values = None, []
            for fl, _, lst in _parse_fields(feature):
                if fl == 1:                     # BytesList
                    kind = 'bytes'
                    values = [v for f, _, v in _parse_fields(lst) if f == 1]
                elif fl == 2:                   # FloatList
                    kind = 'float'
                    for f, w, v in _parse_fields(lst):
                        if f == 1 and w == 2:   # packed
                            values += list(struct.unpack(
                                f'<{len(v) // 4}f', v))
                        elif f == 1:
                            values.append(struct.unpack('<f', v)[0])
                elif fl == 3:                   # Int64List
                    kind = 'int64'
                    for f, w, v in _parse_fields(lst):
                        if f == 1 and w == 2:   # packed varints
                            r = _Reader(v)
                            while r.pos < len(v):
                                u = r.varint()
                                values.append(u - (1 << 64)
                                              if u >= (1 << 63) else u)
                        elif f == 1:
                            values.append(v - (1 << 64)
                                          if v >= (1 << 63) else v)
            if name is not None:
                out[name] = (kind, values)
    return out


# ------------------------------------------------------------- sink

def write_tfrecord(df: DataFrame, path: str, key_col: str = 'doc_id',
                   columns: dict | None = None, mode: str = 'overwrite',
                   shard_size: int = 200_000,
                   shard_bytes: int = 256 << 20) -> None:
    """Write `.tfrecord` shard files of tf.train.Example records.
    ``columns`` maps column -> kind ('bytes' | 'int64' | 'float');
    default inferred from Spark types (string/binary -> bytes,
    integral -> int64, fractional -> float). The key column is always
    included as an int64 feature. Null values write an empty list
    (reads back as null); array columns write multi-value lists.

    Each partition ROLLS a new ``part-<task>-<n>.tfrecord`` shard every
    ``shard_size`` records or ``shard_bytes`` encoded bytes, whichever
    comes first — a skewed 10 GB partition becomes ~40 splittable
    256 MB shards instead of one unsplittable file, and the read side
    (which buffers one whole file per ``binaryFile`` row) stays
    bounded by the shard cap rather than by partition skew. One
    shard's records are buffered in memory before the flush (that is
    what lets the CRC run vectorized across the whole shard), so
    ``shard_bytes`` is also the sink's memory high-water mark per
    task. Local destinations stage to attempt-scoped temp names and
    atomically rename on completion; URI destinations (file:// s3://
    gs:// hdfs://) take the pyarrow.fs two-phase commit
    (``task_files.open_staged``: temp object -> verify -> fs.move),
    so speculative or retried task attempts never interleave writes
    into one shard (same discipline as Spark's own file committers)."""
    inferred = {}
    for f in df.schema.fields:
        dt = f.dataType
        et = dt.elementType if isinstance(dt, T.ArrayType) else dt
        if isinstance(et, (T.StringType, T.BinaryType)):
            inferred[f.name] = 'bytes'
        elif isinstance(et, (T.FloatType, T.DoubleType)):
            inferred[f.name] = 'float'
        else:
            inferred[f.name] = 'int64'
    cols = dict(columns) if columns else {
        k: v for k, v in inferred.items() if k != key_col}
    for c in cols:
        if c not in inferred:
            raise ValueError(f'no column {c!r} in the frame')
    from erde_spark.io.fsutil import prepare_dir
    scheme = prepare_dir(path, mode)
    names = list(cols)
    rows = df.select(F.col(key_col).cast('long').alias('_key'), *names)

    def _vals(v, kind):
        if v is None:
            return []
        if isinstance(v, (list, tuple)):
            items = v
        else:
            items = [v]
        if kind == 'bytes':
            return [x.encode('utf-8') if isinstance(x, str) else bytes(x)
                    for x in items]
        return list(items)

    if shard_size <= 0 or shard_bytes <= 0:
        raise ValueError('shard_size and shard_bytes must be positive')

    def _write_partition(it):
        from pyspark import TaskContext

        from erde_spark.io.task_files import open_staged
        tid = TaskContext.get().partitionId()
        shard_idx = 0
        payloads: list = []
        nbytes = 0

        def _flush():
            nonlocal shard_idx, payloads, nbytes
            if not payloads:
                return
            data_crc = _mask(crc32c_many(payloads))
            lens = [struct.pack('<Q', len(p)) for p in payloads]
            len_crc = _mask(crc32c_many(lens))
            name = f'part-{tid:05d}-{shard_idx:05d}.tfrecord'
            final = f'{path}/{name}' if scheme \
                else os.path.join(path, name)
            out, commit, abort = open_staged(final, scheme)
            try:
                for i, p in enumerate(payloads):
                    out.write(lens[i])
                    out.write(struct.pack('<I', int(len_crc[i])))
                    out.write(p)
                    out.write(struct.pack('<I', int(data_crc[i])))
                out.close()
                commit()
            except BaseException:
                abort()
                raise
            shard_idx += 1
            payloads, nbytes = [], 0

        for row in it:
            feats = {key_col: ('int64', [int(row['_key'])])}
            for c in names:
                feats[c] = (cols[c], _vals(row[c], cols[c]))
            p = encode_example(feats)
            payloads.append(p)
            nbytes += len(p) + 16           # frame = 16 header/CRC bytes
            if len(payloads) >= shard_size or nbytes >= shard_bytes:
                _flush()
        _flush()

    rows.rdd.foreachPartition(_write_partition)


# ------------------------------------------------------------- source

def read_tfrecord(spark: SparkSession, path: str,
                  columns: dict | None = None,
                  verify_crc: bool = True) -> DataFrame:
    """Read a `.tfrecord` directory back. ``columns`` maps feature name
    -> (kind, 'scalar' | 'array'); default
    ``{'doc_id': ('int64', 'scalar')}``. Scalars take the first list
    element (null when the list is empty); arrays keep the list.
    ``verify_crc`` checks both masked CRCs per frame and raises with
    the file/offset on corruption."""
    cols = dict(columns) if columns else {'doc_id': ('int64', 'scalar')}
    spark_t = {'bytes': T.BinaryType(), 'int64': T.LongType(),
               'float': T.DoubleType()}
    fields = [T.StructField('_file', T.StringType())]
    for name, (kind, shape) in cols.items():
        t = spark_t[kind]
        fields.append(T.StructField(
            name, T.ArrayType(t) if shape == 'array' else t))
    schema = T.StructType(fields)

    def _parse(batches):
        for pdf in batches:
            out = {f.name: [] for f in fields}
            for fpath, blob in zip(pdf['path'], pdf['content']):
                buf = bytes(blob)
                pos = 0
                payloads = []
                offsets, len_bytes, stored_lc, stored_dc = [], [], [], []
                while pos < len(buf):
                    (ln,) = struct.unpack_from('<Q', buf, pos)
                    (lc,) = struct.unpack_from('<I', buf, pos + 8)
                    data = buf[pos + 12:pos + 12 + ln]
                    (dc,) = struct.unpack_from('<I', buf, pos + 12 + ln)
                    if verify_crc:
                        offsets.append(pos)
                        len_bytes.append(buf[pos:pos + 8])
                        stored_lc.append(lc)
                        stored_dc.append(dc)
                    payloads.append(data)
                    pos += 16 + ln
                if verify_crc and payloads:
                    # one vectorized crc32c_many call per CRC column per
                    # file — the same kernel the write side uses, not a
                    # per-byte Python loop per record
                    got_lc = _mask(crc32c_many(len_bytes))
                    got_dc = _mask(crc32c_many(payloads))
                    bad_l = np.nonzero(
                        got_lc != np.asarray(stored_lc, dtype=np.uint64))[0]
                    bad_d = np.nonzero(
                        got_dc != np.asarray(stored_dc, dtype=np.uint64))[0]
                    if len(bad_l):
                        raise IOError(f'{fpath}: length CRC mismatch @ '
                                      f'{offsets[int(bad_l[0])]}')
                    if len(bad_d):
                        raise IOError(f'{fpath}: data CRC mismatch @ '
                                      f'{offsets[int(bad_d[0])]}')
                for p in payloads:
                    ex = decode_example(p)
                    out['_file'].append(os.path.basename(fpath))
                    for name, (kind, shape) in cols.items():
                        got = ex.get(name)
                        vals = got[1] if got else []
                        if kind == 'bytes':
                            vals = [bytes(v) for v in vals]
                        elif kind == 'float':
                            vals = [float(v) for v in vals]
                        if shape == 'array':
                            out[name].append(vals if got else None)
                        else:
                            out[name].append(vals[0] if vals else None)
            yield pd.DataFrame(out)

    files = (spark.read.format('binaryFile')
             .option('pathGlobFilter', '*.tfrecord').load(path)
             .select('path', 'content'))
    return files.mapInPandas(_parse, schema)
