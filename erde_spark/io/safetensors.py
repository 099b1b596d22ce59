"""SafeTensors source/sink — the Hugging Face tensor-interchange
format (github.com/huggingface/safetensors: 8-byte little-endian
header length, a JSON header mapping tensor name -> {dtype, shape,
data_offsets}, then a flat byte buffer). Embedding dumps and
checkpoint shards ship in it; the header-offset design makes a 2-D
row-major tensor BYTE-RANGE SPLITTABLE exactly like ``.npy``, so the
scan plans slices and tasks seek — no single-reader bottleneck and no
pickle surface at all (the format's whole point).

Read yields ``(tensor, row_id, value)`` over every (or one selected)
2-D/1-D tensor, row ids global per tensor across shards. Sharded
files follow the HF convention (``model-00001-of-0000N.safetensors``
+ ``*.index.json`` mapping tensor -> shard); the writer emits one
shard per non-empty partition with per-shard tensor names
``<name>/<part>`` and writes the index, so the output is loadable by
the official reader shard by shard AND reassembles into one logical
matrix here.

Supported dtypes: F32/F64/I8/I16/I32/I64 (the numeric subset a
DataFrame column can hold). BF16/F16 and higher-rank tensors raise
with the reason — honest boundary, not a misread.
"""

from __future__ import annotations

import json
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: safetensors dtype tag -> (numpy dtype, Spark element type)
_DTYPES = {
    'F32': (np.dtype('<f4'), T.FloatType()),
    'F64': (np.dtype('<f8'), T.DoubleType()),
    'I8': (np.dtype('|i1'), T.ByteType()),
    'I16': (np.dtype('<i2'), T.ShortType()),
    'I32': (np.dtype('<i4'), T.IntegerType()),
    'I64': (np.dtype('<i8'), T.LongType()),
}
_TAG_OF = {v[0].str: k for k, v in _DTYPES.items()}
_MAX_HEADER = 100 << 20  # the reference implementation's header cap


def read_st_header(f) -> tuple[dict, int]:
    """(header dict, data section offset) from an open binary handle at
    position 0. The header is the format's JSON table; offsets inside
    it are relative to the data section."""
    raw = f.read(8)
    if len(raw) < 8:
        raise ValueError('not a safetensors file (short header length)')
    (hlen,) = struct.unpack('<Q', raw)
    if hlen > _MAX_HEADER:
        raise ValueError(f'safetensors header claims {hlen} bytes '
                         f'(cap {_MAX_HEADER}) — corrupt or hostile')
    hdr = f.read(hlen)
    if len(hdr) < hlen:
        raise ValueError('truncated safetensors header')
    meta = json.loads(hdr.decode('utf-8'))
    if not isinstance(meta, dict):
        raise ValueError('safetensors header is not a JSON object')
    return meta, 8 + hlen


def _tensor_entries(path: str, tensor: str | None) -> list[dict]:
    """Driver-side plan rows: one per (file, tensor) with dtype/shape/
    absolute byte offset and global row base per logical tensor.
    Handles a single file, a directory of shards (``*.safetensors``,
    name-ordered), or a glob. Per-shard tensor names ``name/part`` are
    folded into the logical ``name``."""
    from erde_spark.io.fsutil import list_with_suffix, open_ranged
    files = list_with_suffix(path, '.safetensors')
    out: list[dict] = []
    bases: dict[str, int] = {}
    sig: dict[str, tuple] = {}
    for fp in files:
        with open_ranged(fp) as f:
            meta, data0 = read_st_header(f)
        for name in sorted(k for k in meta if k != '__metadata__'):
            ent = meta[name]
            logical = name.split('/')[0]
            if tensor is not None and logical != tensor:
                continue
            dt, shape = ent['dtype'], tuple(ent['shape'])
            if dt not in _DTYPES:
                raise ValueError(
                    f'{fp}:{name}: dtype {dt!r} unsupported (have '
                    f'{sorted(_DTYPES)}; no BF16/F16 column type)')
            if len(shape) not in (1, 2):
                raise ValueError(
                    f'{fp}:{name}: rank {len(shape)} tensor — only '
                    '1-D/2-D reassemble into rows')
            o0, o1 = ent['data_offsets']
            npt = _DTYPES[dt][0]
            n = int(np.prod(shape)) if shape else 0
            if o1 - o0 != n * npt.itemsize:
                raise ValueError(f'{fp}:{name}: data_offsets span '
                                 f'{o1 - o0} bytes != {n} x {npt.itemsize}')
            dim = shape[1] if len(shape) == 2 else 0
            s = (dt, dim)
            if sig.setdefault(logical, s) != s:
                raise ValueError(
                    f'{fp}:{name}: dtype/width {s} conflicts with an '
                    f'earlier shard of {logical!r} {sig[logical]}')
            base = bases.get(logical, 0)
            out.append({'file': fp, 'tensor': logical, 'dtype': dt,
                        'dim': dim, 'rows': shape[0],
                        'offset': data0 + o0, 'base': base})
            bases[logical] = base + shape[0]
    if not out:
        raise ValueError(f'no tensor {tensor!r} under {path!r}'
                         if tensor else f'no tensors under {path!r}')
    return out


def read_safetensors(path: str, spark: SparkSession,
                     tensor: str | None = None,
                     value_col: str = 'value',
                     slice_bytes: int = 128 << 20,
                     batch_rows: int = 8192) -> DataFrame:
    """DataFrame of ``(tensor, row_id, value)`` over safetensors
    file(s). All tensors must share dtype/width when ``tensor`` is
    None (pass a name to select one). Byte-range sliced exactly like
    the ``.npy`` reader — the slice table is tiny driver metadata."""
    plan = _tensor_entries(path, tensor)
    dt, dim = plan[0]['dtype'], plan[0]['dim']
    for p in plan[1:]:
        if (p['dtype'], p['dim']) != (dt, dim):
            raise ValueError(
                f"tensor {p['tensor']!r} ({p['dtype']}/{p['dim']}) "
                f"differs from {plan[0]['tensor']!r} ({dt}/{dim}); "
                'pass tensor=<name> to select one')
    npt, spark_t = _DTYPES[dt]
    row_bytes = npt.itemsize * max(dim, 1)
    rows_per_slice = max(1, slice_bytes // row_bytes)
    slices = []
    for p in plan:
        for s in range(0, p['rows'], rows_per_slice):
            e = min(s + rows_per_slice, p['rows'])
            slices.append((p['tensor'], p['file'], p['offset'],
                           p['base'], s, e))
    val_t = T.ArrayType(spark_t) if dim else spark_t
    schema = T.StructType([T.StructField('tensor', T.StringType()),
                           T.StructField('row_id', T.LongType()),
                           T.StructField(value_col, val_t)])
    if not slices:
        return spark.createDataFrame([], schema)
    sdf = spark.createDataFrame(
        slices, 'tensor string, file string, offset long, base long, '
                'start long, end long') \
        .repartition(min(len(slices),
                         2 * spark.sparkContext.defaultParallelism))

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stdlib/pyarrow-only ranged open (see io/npy.py for why this
        # is inlined rather than imported from fsutil)
        def _open(fp):
            from urllib.parse import urlparse
            p = urlparse(fp)
            if len(p.scheme) > 1:
                # every scheme incl. file:// via pyarrow.fs — same
                # branch an object store takes
                from pyarrow import fs as pafs
                filesystem, rel = pafs.FileSystem.from_uri(fp)
                return filesystem.open_input_file(rel)
            return open(fp, 'rb')

        for pdf in batches:
            for r in pdf.itertuples(index=False):
                with _open(r.file) as f:
                    f.seek(r.offset + r.start * row_bytes)
                    for bs in range(r.start, r.end, batch_rows):
                        be = min(bs + batch_rows, r.end)
                        raw = f.read((be - bs) * row_bytes)
                        arr = np.frombuffer(raw, dtype=npt)
                        ids = np.arange(r.base + bs, r.base + be)
                        vals = list(arr.reshape(be - bs, dim)) if dim \
                            else arr
                        yield pd.DataFrame({'tensor': r.tensor,
                                            'row_id': ids,
                                            value_col: vals})

    return sdf.mapInPandas(_read, schema=schema)


def write_safetensors(df: DataFrame, path: str, value_col: str = 'value',
                      tensor_name: str = 'emb',
                      mode: str = 'overwrite') -> None:
    """Write HF-convention shards ``model-<i+1>-of-<N>.safetensors``
    (one per non-empty partition, per-shard tensor ``name/<part>``)
    plus ``model.safetensors.index.json``. Each shard is a fully valid
    safetensors file the official reader loads; this module's reader
    reassembles the logical matrix with global row ids. Same row-order
    contract as the npy writer: range-partition + sortWithinPartitions
    first when the global order matters. Refuses ragged/empty rows and
    non-overwrite modes (shard names encode the shard COUNT, so append
    cannot compose). URI destinations (file:// s3:// gs:// hdfs://)
    spool each shard's data to task-local disk — the header splice
    needs a seek — then stream it into a pyarrow.fs staged object; the
    DRIVER publishes every staged shard onto its count-encoding final
    name (fs.move = one atomic PUT each) after all tasks report, so a
    racing reader never sees a partial shard set with a valid index."""
    if mode not in ('overwrite', 'error'):
        raise ValueError(f"mode={mode!r}: shard names encode the shard "
                         "count, so only 'overwrite'/'error' compose")
    from erde_spark.io.fsutil import prepare_dir
    scheme = prepare_dir(path, mode)
    dt = dict(df.dtypes)[value_col]
    elem = dt[6:-1] if dt.startswith('array<') else dt
    np_of = {'float': '<f4', 'double': '<f8', 'int': '<i4',
             'bigint': '<i8', 'smallint': '<i2', 'tinyint': '|i1'}
    if elem not in np_of:
        raise ValueError(f'unsupported element type {elem!r} '
                         f'(supported: {sorted(np_of)})')
    npt = np.dtype(np_of[elem])
    tag = _TAG_OF[npt.str]
    rows = df.select(value_col)

    def _write_partition(it):
        # stdlib/numpy/pyarrow-only executor closure (wds-regression
        # rule; the URI staging branch is inlined for the same reason)
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid = tc.partitionId()
        tmp = os.path.join(path, f'.part-{pid:05d}.{tc.taskAttemptId()}'
                                 '.inprogress') if not scheme else None
        n = 0
        dim = None
        out = None
        try:
            for row in it:
                v = row[0]
                if v is None:
                    raise ValueError('safetensors cannot hold null rows')
                a = np.asarray(v, dtype=npt)
                if a.ndim not in (0, 1):
                    raise ValueError('only scalars / flat arrays')
                if a.ndim and a.size == 0:
                    raise ValueError('empty array rows not representable')
                d = a.size if a.ndim else 0
                if dim is None:
                    dim = d
                    if scheme:
                        # the header splice below needs a seekable
                        # stream — spool to task-local disk, stream to
                        # the object store once the length is known
                        import tempfile
                        out = tempfile.TemporaryFile()
                    else:
                        out = open(tmp, 'wb')
                        out.write(b'\x00' * 8)  # header-length slot
                elif d != dim:
                    raise ValueError(f'ragged {value_col}: {d} after {dim}')
                out.write(a.tobytes())
                n += 1
            if out is None:
                return iter(())
            nbytes = n * max(dim, 1) * npt.itemsize
            shape = [n, dim] if dim else [n]
            hdr = json.dumps({
                f'{tensor_name}/{pid:05d}': {
                    'dtype': tag, 'shape': shape,
                    'data_offsets': [0, nbytes]}},
                separators=(',', ':')).encode()
            pad = (8 - len(hdr) % 8) % 8  # spec: pad header with spaces
            hdr += b' ' * pad
            if scheme:
                # stage the complete shard as a remote object; the
                # DRIVER publishes it onto the count-encoding final
                # name (two-phase: this write + driver-side verify+move)
                from pyarrow import fs as pafs
                filesystem, root = pafs.FileSystem.from_uri(path)
                staged = (f'{root}/.part-{pid:05d}.'
                          f'{tc.taskAttemptId()}.staged')
                out.seek(0)
                try:
                    with filesystem.open_output_stream(staged) as rh:
                        rh.write(struct.pack('<Q', len(hdr)))
                        rh.write(hdr)
                        while True:
                            chunk = out.read(1 << 20)
                            if not chunk:
                                break
                            rh.write(chunk)
                    expect = 8 + len(hdr) + nbytes
                    info = filesystem.get_file_info(staged)
                    if info.type != pafs.FileType.File \
                            or info.size != expect:
                        raise IOError(
                            f'staged shard {staged!r} missing or '
                            f'truncated (want {expect} bytes, got '
                            f'{info.size}) — refusing to publish')
                except BaseException:
                    # dying attempt: best-effort staging cleanup
                    try:
                        filesystem.delete_file(staged)
                    except Exception:
                        pass
                    raise
                out.close()
                out = None
                return iter([(pid, n, staged)])
            out.seek(0)
            out.write(struct.pack('<Q', len(hdr)))
            out.close()
            # header goes BEFORE the data: splice by rewrite (the data
            # was written at offset 8; shift via a second temp file)
            final_tmp = tmp + '.hdr'
            with open(tmp, 'rb') as src, open(final_tmp, 'wb') as dst:
                dst.write(src.read(8))
                dst.write(hdr)
                while True:
                    chunk = src.read(1 << 20)
                    if not chunk:
                        break
                    dst.write(chunk)
            os.remove(tmp)
            out = None
            return iter([(pid, n, final_tmp)])
        finally:
            if out is not None:
                out.close()
                if not scheme:
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass

    parts = sorted(rows.rdd.mapPartitions(_write_partition).collect())
    if not parts:
        raise ValueError('input has no rows')
    n_shards = len(parts)
    index = {'metadata': {'total_size': 0}, 'weight_map': {}}
    if scheme:
        from pyarrow import fs as pafs
        filesystem, root = pafs.FileSystem.from_uri(path)
    for i, (pid, n, tmp_path) in enumerate(parts):
        name = f'model-{i + 1:05d}-of-{n_shards:05d}.safetensors'
        if scheme:
            # publish: one atomic PUT per verified staged object
            final = f'{root}/{name}'
            filesystem.move(tmp_path, final)
            size = filesystem.get_file_info(final).size
        else:
            final = os.path.join(path, name)
            os.replace(tmp_path, final)
            size = os.path.getsize(final)
        index['weight_map'][f'{tensor_name}/{pid:05d}'] = name
        index['metadata']['total_size'] += size
    payload = json.dumps(index, indent=1, sort_keys=True)
    if scheme:
        with filesystem.open_output_stream(
                f'{root}/model.safetensors.index.json') as f:
            f.write(payload.encode('utf-8'))
    else:
        with open(os.path.join(path, 'model.safetensors.index.json'),
                  'w') as f:
            f.write(payload)
