"""NumPy ``.npy`` matrix source/sink — the de-facto interchange for
embedding dumps (faiss tooling, sentence-transformers pipelines, eval
harnesses all read/write these directly).

Format: NEP-1 / numpy.lib.format — magic ``\\x93NUMPY``, version,
header-length word, a Python-literal header dict (``descr``,
``fortran_order``, ``shape``), then the raw C-order array bytes. A
2-D C-order matrix is therefore a SPLITTABLE file: row ``i`` lives at
``data_offset + i * row_bytes``, so the scan plans byte-range slices
and every task seeks straight to its rows — no single-reader
bottleneck, unlike the pickle-bearing ``.npz``/object formats. That is
the 100 TB posture: a 1 TB embedding matrix becomes ~8000 independent
128 MB slices.

Read yields ``(row_id, value)`` where ``row_id`` is the GLOBAL row
index across the file set (files ordered by name, offsets cumulative
from driver-side header reads — headers only, never data). Write emits
one ``part-<partition>.npy`` per non-empty partition; with a
range-partitioned, sorted frame the concatenation order is the sort
order, making the matrix row order deterministic and reproducible.

Only C-order little-endian numeric dtypes are supported; everything
else (fortran_order, big-endian, object dtype, ``.npz`` archives)
raises with the reason — honest boundaries, not silent misreads.
"""

from __future__ import annotations

import ast
import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b'\x93NUMPY'

#: numpy descr -> (numpy dtype, Spark element type)
_DTYPES = {
    '<f4': (np.float32, T.FloatType()),
    '<f8': (np.float64, T.DoubleType()),
    '<i4': (np.int32, T.IntegerType()),
    '<i8': (np.int64, T.LongType()),
    '|i1': (np.int8, T.ByteType()),
    '<i2': (np.int16, T.ShortType()),
}
_DESCR_OF = {np.dtype(v[0]).str: k for k, v in _DTYPES.items()}


def read_npy_header(f) -> tuple[str, tuple[int, ...], int]:
    """(descr, shape, data_offset) from an open binary handle
    positioned at 0. Validates magic/version/flags and rejects what the
    splittable reader can't honor."""
    head = f.read(10)
    if head[:6] != _MAGIC:
        raise ValueError('not a .npy file (bad magic)')
    major = head[6]
    if major == 1:
        (hlen,) = struct.unpack('<H', head[8:10])
        header = f.read(hlen).decode('latin1')
        off = 10 + hlen
    elif major in (2, 3):
        more = f.read(2)
        (hlen,) = struct.unpack('<I', head[8:10] + more)
        header = f.read(hlen).decode('latin1')
        off = 12 + hlen
    else:
        raise ValueError(f'unsupported .npy version {major}')
    meta = ast.literal_eval(header)
    if meta.get('fortran_order'):
        raise ValueError('fortran_order .npy is not row-sliceable; '
                         'transpose to C order first')
    descr = meta['descr']
    if descr not in _DTYPES:
        raise ValueError(
            f'unsupported .npy dtype {descr!r}: supported '
            f'{sorted(_DTYPES)} (little-endian numerics)')
    shape = tuple(meta['shape'])
    if len(shape) not in (1, 2):
        raise ValueError(f'only 1-D/2-D .npy supported, got shape {shape}')
    return descr, shape, off


def _file_plan(path: str) -> list[dict]:
    """Driver-side listing + header reads (bytes, not data): one entry
    per file with its dtype/shape/offset and the cumulative global row
    base. Files order by name — the writer's part numbering. Local
    paths or any pyarrow.fs URI (io/fsutil.py)."""
    from erde_spark.io.fsutil import list_with_suffix, open_ranged
    files = list_with_suffix(path, '.npy')
    plan, base = [], 0
    descr0 = dim0 = None
    for fp in files:
        with open_ranged(fp) as f:
            descr, shape, off = read_npy_header(f)
        dim = shape[1] if len(shape) == 2 else 0
        if descr0 is None:
            descr0, dim0 = descr, dim
        elif (descr, dim) != (descr0, dim0):
            raise ValueError(
                f'{fp!r}: dtype/width {descr}/{dim} does not match the '
                f'first file ({descr0}/{dim0})')
        plan.append({'file': fp, 'descr': descr, 'dim': dim,
                     'offset': off, 'rows': shape[0], 'base': base})
        base += shape[0]
    return plan


def read_npy(path: str, spark: SparkSession,
             value_col: str = 'value', slice_bytes: int = 128 << 20,
             batch_rows: int = 8192) -> DataFrame:
    """DataFrame of ``(row_id long, <value_col>)`` over a ``.npy`` file,
    glob, or directory of part files. 2-D -> array column, 1-D ->
    scalar column. The plan is a tiny driver-built slice table
    (~bytes/slice_bytes rows); each task seeks to its byte range."""
    plan = _file_plan(path)
    descr, dim = plan[0]['descr'], plan[0]['dim']
    npt, spark_t = _DTYPES[descr]
    row_bytes = np.dtype(npt).itemsize * max(dim, 1)
    rows_per_slice = max(1, slice_bytes // row_bytes)
    slices = []
    for p in plan:
        for s in range(0, p['rows'], rows_per_slice):
            e = min(s + rows_per_slice, p['rows'])
            slices.append((p['file'], p['offset'], p['base'], s, e))
    val_t = T.ArrayType(spark_t) if dim else spark_t
    schema = T.StructType([T.StructField('row_id', T.LongType()),
                           T.StructField(value_col, val_t)])
    if not slices:  # every file declares zero rows
        return spark.createDataFrame([], schema)
    sdf = spark.createDataFrame(
        slices, 'file string, offset long, base long, start long, end long') \
        .repartition(min(len(slices), 2 * _default_parallelism(spark)))

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # stdlib/pyarrow-only ranged open, inlined from io/fsutil.py —
        # an erde_spark import here would make every fresh worker pull
        # the whole io chain (the wds-regression rule)
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
                        if dim:
                            arr = arr.reshape(be - bs, dim)
                            vals = list(arr)
                        else:
                            vals = arr
                        yield pd.DataFrame({'row_id': ids,
                                            value_col: vals})

    return sdf.mapInPandas(_read, schema=schema)


def _default_parallelism(spark: SparkSession) -> int:
    return spark.sparkContext.defaultParallelism


def write_npy(df: DataFrame, path: str, value_col: str = 'value',
              mode: str = 'overwrite') -> None:
    """Write ``part-<partition>.npy`` files (one per non-empty
    partition) under ``path``. The column must be a numeric scalar or a
    numeric array of CONSTANT width; width or dtype drift raises inside
    the task rather than corrupting the matrix. Row order within a file
    is partition order — range-partition + sortWithinPartitions first
    when the global matrix order matters (the round-trip gate does).

    Each task buffers only the growing byte payload of its own shard
    and stitches the header by rewrite-at-close (shape isn't known up
    front); staging + atomic rename for local paths. A URI destination
    (file:// s3:// gs:// hdfs://) spools the data bytes to task-local
    disk first — object streams cannot seek back to patch the header —
    then streams header + spool into a pyarrow.fs two-phase commit
    (temp object -> verify size -> fs.move)."""
    dt = dict(df.dtypes)[value_col]
    is_arr = dt.startswith('array<')
    if mode not in ('overwrite', 'error'):
        # append would interleave new part names into the existing
        # lexicographic order and silently REORDER the global matrix —
        # row position is the semantic here, so refuse rather than
        # corrupt (write a fresh directory and concatenate plans
        # upstream instead)
        raise ValueError(f"mode={mode!r}: .npy supports only "
                         "'overwrite'/'error' (append would reorder "
                         'the global row index)')
    from erde_spark.io.fsutil import prepare_dir
    scheme = prepare_dir(path, mode)
    elem = dt[6:-1] if is_arr else dt
    np_of = {'float': np.float32, 'double': np.float64, 'int': np.int32,
             'bigint': np.int64, 'smallint': np.int16, 'tinyint': np.int8}
    if elem not in np_of:
        raise ValueError(f'unsupported element type {elem!r} for .npy '
                         f'(supported: {sorted(np_of)})')
    npt = np_of[elem]
    descr = np.dtype(npt).str
    magic = _MAGIC
    rows = df.select(value_col)

    def _write_partition(it):
        # stdlib/numpy/pyarrow-only closure (no erde_spark imports in
        # executors; the two-phase URI branch is inlined from
        # task_files.open_staged for the same reason)
        from pyspark import TaskContext
        tc = TaskContext.get()
        name = f'part-{tc.partitionId():05d}.npy'
        final = f'{path}/{name}' if scheme else os.path.join(path, name)
        tmp = f'{final}.{tc.taskAttemptId()}.inprogress'
        n = 0
        dim = None
        out = None
        committed = False
        try:
            for row in it:
                v = row[0]
                if v is None:
                    raise ValueError('.npy cannot represent null rows')
                a = np.asarray(v, dtype=npt)
                if a.ndim not in (0, 1):
                    raise ValueError('only scalars / flat arrays')
                if a.ndim and a.size == 0:
                    # a width-0 row would make shape claim (n,) scalars
                    # while contributing zero data bytes — a silently
                    # corrupt file; there is no sane constant-width-0
                    # matrix, so refuse
                    raise ValueError(
                        f'empty array in {value_col}: .npy rows must '
                        'have at least one element')
                d = a.size if a.ndim else 0
                if dim is None:
                    dim = d
                    if scheme:
                        # object streams can't seek back to patch the
                        # header — spool data to task-local disk first
                        import tempfile
                        out = tempfile.TemporaryFile()
                    else:
                        out = open(tmp, 'wb')
                        out.write(b'\x00' * 128)  # header placeholder
                elif d != dim:
                    raise ValueError(
                        f'ragged {value_col}: width {d} after {dim}')
                out.write(a.tobytes())
                n += 1
            if out is None:
                return  # empty partition: no file
            shape = (n, dim) if dim else (n,)
            # NEP-1 v1 header into the 128-byte placeholder: 10 fixed
            # bytes + a space-padded, newline-terminated dict literal
            d = ('{' + f"'descr': {descr!r}, 'fortran_order': False, "
                 f"'shape': {shape!r}, " + '}')
            room = 128 - 10 - 1
            if len(d) > room:
                raise ValueError('shape literal exceeds reserved header')
            hdr = (magic + b'\x01\x00' + struct.pack('<H', 128 - 10)
                   + (d + ' ' * (room - len(d)) + '\n').encode('latin1'))
            if scheme:
                # two-phase commit (the io/zst.py protocol): stream
                # header + spool into the temp object, verify the
                # exact byte count, then one atomic PUT (fs.move)
                from pyarrow import fs as pafs
                filesystem, rel_final = pafs.FileSystem.from_uri(final)
                rel_tmp = f'{rel_final}.{tc.taskAttemptId()}.inprogress'
                out.seek(0)
                try:
                    with filesystem.open_output_stream(rel_tmp) as rh:
                        rh.write(hdr)
                        while True:
                            chunk = out.read(1 << 20)
                            if not chunk:
                                break
                            rh.write(chunk)
                    expect = (128
                              + n * max(dim, 1) * np.dtype(npt).itemsize)
                    info = filesystem.get_file_info(rel_tmp)
                    if info.type != pafs.FileType.File \
                            or info.size != expect:
                        raise IOError(
                            f'staged object {rel_tmp!r} missing or '
                            f'truncated at commit (want {expect} '
                            f'bytes, got {info.size}) — refusing to '
                            'publish')
                except BaseException:
                    # dying attempt: best-effort staging cleanup
                    try:
                        filesystem.delete_file(rel_tmp)
                    except Exception:
                        pass
                    raise
                filesystem.move(rel_tmp, rel_final)
            else:
                out.seek(0)
                out.write(hdr)
            out.close()
            out = None
            if not scheme:
                os.replace(tmp, final)
            committed = True
        finally:
            if out is not None:
                out.close()
            if not committed and not scheme:
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    rows.rdd.foreachPartition(_write_partition)
