"""Zarr v2 chunked-array source/sink — the third embedding/science
interchange format next to .npy and SafeTensors (spec:
https://zarr-specs.readthedocs.io/en/latest/v2/v2.0.html).

A v2 array is a directory store: a ``.zarray`` JSON document (shape,
chunk shape, dtype, compressor, C/F order, fill_value) plus one file
per chunk named by its grid indices (``"3.0"`` = chunk row 3, chunk
col 0). That layout is EXACTLY what a distributed engine wants: the
chunk grid is derivable from the metadata alone (no directory
listing), one chunk = one unit of work, and every chunk file is an
independent whole-file read — so the scan parallelism is the chunk
count and nothing is shuffled.

Scope (honest boundaries, all raising loudly):
* 2-D arrays (the embedding-matrix shape) and 1-D arrays (the
  label/timestamp vectors shipped beside them); C order, no filters;
* dtype ``<f4 <f8 <i4 <i8`` (little-endian, like io/npy.py — the
  big-endian refusal is pinned there and applies here);
* compressor ``null``, ``zlib`` or ``gzip`` (stdlib-decodable).
  **Blosc — numcodecs' default — is NOT in this container**, so a
  store written by stock ``zarr.save`` needs
  ``compressor=numcodecs.Zlib()`` (or None) at write time; reading a
  blosc store raises with that instruction rather than mis-decoding.

Read: driver-side ``.zarray`` fetch, then ``spark.range(n_chunk_rows)``
-> ``mapInPandas`` — each task reads one chunk ROW BAND (all column
chunks of that band), trims edge padding by shape arithmetic, and
emits (row_id, value) with ``row_id = band * chunks[0] + local``.
Paths go through the same stdlib/pyarrow ranged-open branch as
io/npy.py, so ``s3:// gs:// hdfs://`` take the tested ``file://`` path.

Write: the chunk grid is REGULAR (every chunk ``chunk_rows`` tall,
edge padded with ``fill_value``), which no per-partition layout can
guarantee — so the writer pays its one honest shuffle: per-partition
counts (small driver aggregate) give each row a global index
narrowly, then ``groupBy(row_id // chunk_rows)`` + ``applyInPandas``
writes each chunk file with attempt-staged atomic rename. Row order
within input partitions is the semantic order — range-partition +
``sortWithinPartitions`` first when the global matrix order matters
(the round-trip gate does), the io/npy.py contract.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {'<f4': 'float', '<f8': 'double', '<i4': 'int', '<i8': 'bigint'}
_NP_OF = {'float': '<f4', 'double': '<f8', 'int': '<i4', 'bigint': '<i8'}


def _open_bytes(fp: str) -> bytes:
    """Driver-side whole-file read (any URI scheme via pyarrow.fs) —
    delegates to io/fsutil.py; the executor closure in read_zarr
    inlines its own two-line equivalent instead (the wds rule)."""
    from erde_spark.io.fsutil import read_bytes
    return read_bytes(fp)


def _load_meta(path: str) -> dict:
    meta = json.loads(_open_bytes(f'{path}/.zarray').decode('utf-8'))
    if meta.get('zarr_format') != 2:
        raise ValueError(f'not a zarr v2 array: {path!r}')
    if len(meta['shape']) not in (1, 2):
        raise ValueError(f'only 1-D/2-D zarr arrays are supported, got '
                         f'shape {meta["shape"]}')
    if meta.get('order', 'C') != 'C':
        raise ValueError("only C-order zarr arrays are supported "
                         "(order='F' in .zarray)")
    if meta.get('filters'):
        raise ValueError('zarr filters are not supported')
    comp = meta.get('compressor')
    cid = None if comp is None else comp.get('id')
    if cid not in (None, 'zlib', 'gzip'):
        raise ValueError(
            f'unsupported zarr compressor {cid!r} — this container has '
            "no blosc; write the store with compressor=None or "
            'numcodecs.Zlib()')
    if meta['dtype'] not in _DTYPES:
        raise ValueError(
            f'unsupported zarr dtype {meta["dtype"]!r} (supported: '
            f'{sorted(_DTYPES)}; big-endian refused, as in io/npy.py)')
    if meta.get('dimension_separator', '.') not in ('.', '/'):
        raise ValueError(
            f'unsupported dimension_separator '
            f'{meta.get("dimension_separator")!r}')
    return meta


def read_zarr(path: str, spark: SparkSession) -> DataFrame:
    """DataFrame (row_id long, value array<elem>) over a 2-D zarr v2
    array directory — or (row_id long, value elem) over a 1-D one (the
    label/timestamp vectors that ship beside embedding matrices). One
    task per chunk row band; row_id is the global array row — a
    deterministic function of the grid, not of task order. Spec-legal
    ABSENT chunks read as ``fill_value`` (zarr writers omit all-fill
    chunks by default); an absent chunk with a null fill_value raises,
    since the spec leaves those cells undefined."""
    path = path.rstrip('/')
    meta = _load_meta(path)
    one_d = len(meta['shape']) == 1
    if one_d:
        # a 1-D array is a width-1 grid: chunk files are named by the
        # single band index (no separator pair), rows come back as
        # SCALARS
        (n_rows,), (c_rows,) = meta['shape'], meta['chunks']
        n_cols = c_cols = 1
    else:
        n_rows, n_cols = meta['shape']
        c_rows, c_cols = meta['chunks']
    comp = meta.get('compressor')
    cid = None if comp is None else comp['id']
    dtype = meta['dtype']
    elem = _DTYPES[dtype]
    sep = meta.get('dimension_separator', '.')
    fill = meta.get('fill_value')
    n_bands = max(1, -(-n_rows // c_rows))
    n_col_chunks = max(1, -(-n_cols // c_cols))

    def _read(batches):
        # stdlib/numpy-only closure, helpers inlined (an
        # erde_spark.io.zarr module reference here would make every
        # fresh worker import the whole io chain — the wds rule;
        # decompression: numcodecs zlib = raw stream, gzip = container,
        # hence wbits 15 vs 47 below)
        import zlib as _z
        from urllib.parse import urlparse as _up

        # one FileSystem per task invocation, NOT per chunk file — a
        # per-chunk from_uri would pay a fresh client construction for
        # every column-chunk GET on an object store. Resolved lazily
        # off the store ROOT; every chunk rel is root_rel + name.
        if len(_up(path).scheme) > 1:
            from pyarrow import fs as pafs
            filesystem, root_rel = pafs.FileSystem.from_uri(path)
        else:
            filesystem = root_rel = None

        def _open(name):
            """Bytes of chunk file ``name`` under the store root, or
            None when the chunk is DEFINITIVELY absent (an explicit
            existence check, not a broad except — a transient store
            error must fail the task, not silently read as
            fill_value)."""
            if filesystem is not None:
                from pyarrow import fs as pafs
                rel = f'{root_rel}/{name}'
                if (filesystem.get_file_info(rel).type
                        == pafs.FileType.NotFound):
                    return None
                with filesystem.open_input_file(rel) as fh:
                    return fh.read()
            import os as _os
            fp = _os.path.join(path, name)
            if not _os.path.exists(fp):
                return None
            with open(fp, 'rb') as fh:
                return fh.read()

        for pdf in batches:
            for band in pdf['id']:
                band = int(band)
                parts = []
                for j in range(n_col_chunks):
                    name = str(band) if one_d else f'{band}{sep}{j}'
                    raw = _open(name)
                    if raw is None:
                        # spec: a chunk absent from the store is
                        # all-fill_value
                        if fill is None:
                            raise ValueError(
                                f'chunk {name} absent from '
                                f'{path!r} and fill_value is null — '
                                'those cells are undefined by the '
                                'zarr v2 spec')
                        parts.append(np.full((c_rows, c_cols), fill,
                                             dtype=dtype))
                        continue
                    if cid:
                        raw = _z.decompress(
                            raw, 47 if cid == 'gzip' else 15)
                    parts.append(np.frombuffer(raw, dtype=dtype)
                                 .reshape(c_rows, c_cols))
                block = np.hstack(parts)[:, :n_cols]
                lo = band * c_rows
                block = block[:min(c_rows, n_rows - lo)]
                yield pd.DataFrame({
                    'row_id': np.arange(lo, lo + len(block),
                                        dtype=np.int64),
                    'value': block[:, 0] if one_d else list(block)})

    return spark.range(n_bands).mapInPandas(
        _read, schema=f'row_id long, value '
                      f'{elem if one_d else f"array<{elem}>"}')


def write_zarr(df: DataFrame, path: str, value_col: str = 'value',
               chunk_rows: int = 4096, compressor: str | None = 'zlib',
               mode: str = 'overwrite') -> None:
    """Write ``df[value_col]`` as a zarr v2 array: a constant-width
    numeric ARRAY column becomes a 2-D array, a scalar numeric column
    becomes a 1-D one (label/timestamp vectors). See the module
    docstring for the layout and the one-shuffle grid construction;
    the npy append refusal applies for the same reason (append would
    renumber the global row index)."""
    import shutil
    if compressor not in (None, 'zlib', 'gzip'):
        raise ValueError(f'compressor={compressor!r}: use None, '
                         "'zlib' or 'gzip'")
    if chunk_rows <= 0:
        raise ValueError('chunk_rows must be positive')
    if value_col not in df.columns:
        raise ValueError(f'no column {value_col!r} in the frame '
                         f'(available: {df.columns})')
    dt = dict(df.dtypes)[value_col]
    one_d = dt in _NP_OF
    if not one_d and (not dt.startswith('array<')
                      or dt[6:-1] not in _NP_OF):
        raise ValueError(f'unsupported value column type {dt!r} for '
                         f'zarr (need array-of or scalar '
                         f'{sorted(_NP_OF)})')
    elem = dt if one_d else dt[6:-1]
    dtype = _NP_OF[elem]
    from urllib.parse import urlparse
    scheme = urlparse(path).scheme if len(urlparse(path).scheme) > 1 \
        else ''
    if mode not in ('overwrite', 'error'):
        raise ValueError(f"mode={mode!r}: zarr supports only "
                         "'overwrite'/'error' (append would renumber "
                         'the global row index)')
    if scheme:
        from pyarrow import fs as pafs
        filesystem, root = pafs.FileSystem.from_uri(path)
        info = filesystem.get_file_info(root)
        if mode == 'error' and info.type != pafs.FileType.NotFound:
            raise FileExistsError(path)
        if mode == 'overwrite' and info.type == pafs.FileType.Directory:
            filesystem.delete_dir(root)
        filesystem.create_dir(root, recursive=True)
    else:
        if mode == 'error' and os.path.exists(path):
            raise FileExistsError(path)
        if mode == 'overwrite':
            shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)

    rows = df.select(F.col(value_col).alias('v'))
    # global row index WITHOUT a global sort: per-partition counts off
    # the SAME RDD object (same lineage -> identical partitioning in
    # both passes, immune to AQE re-planning), then each partition
    # numbers its rows narrowly from its offset. Two passes over the
    # data — the price of a regular grid without a global sort.
    rdd = rows.rdd

    def _count_and_width(pid, it):
        n = 0
        width = None
        for row in it:
            n += 1
            if width is None and row[0] is not None:
                width = 1 if one_d else len(row[0])
        yield pid, n, width

    stats = rdd.mapPartitionsWithIndex(_count_and_width).collect()
    sizes = {pid: n for pid, n, _ in stats}
    n_rows = sum(sizes.values())
    if n_rows == 0:
        raise ValueError('refusing to write an empty zarr array')
    widths = [w for _, _, w in sorted(stats) if w is not None]
    if not widths:
        raise ValueError(
            f'column {value_col!r} is null in every row — zarr cannot '
            'represent null rows')
    n_cols = widths[0]
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    c_rows = min(chunk_rows, n_rows)

    def _index(pid, it):
        base = offsets.get(pid, 0)
        for i, row in enumerate(it):
            yield base + i, row['v']

    wide = 'double' if elem in ('float', 'double') else 'bigint'
    arr_t = wide if one_d else f'array<{wide}>'
    indexed = rdd.mapPartitionsWithIndex(_index).toDF(
        f'row_id long, v {arr_t}')

    meta = {
        'zarr_format': 2,
        'shape': [n_rows] if one_d else [n_rows, n_cols],
        'chunks': [c_rows] if one_d else [c_rows, n_cols],
        'dtype': dtype,
        'compressor': ({'id': compressor, 'level': 1}
                       if compressor else None),
        'fill_value': 0, 'order': 'C', 'filters': None,
    }
    cid = compressor

    def _write_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        # stdlib/numpy-only closure (executor-import discipline)
        import zlib as _z

        from pyspark import TaskContext
        pdf = pdf.sort_values('row_id')
        band = int(pdf['row_id'].iloc[0]) // c_rows
        vals = pdf['v'].to_numpy()
        if any(v is None for v in vals):
            raise ValueError('zarr cannot represent null rows')
        if one_d:
            m = np.zeros(c_rows, dtype=dtype)
            block = np.asarray(list(vals), dtype=dtype)
        else:
            m = np.zeros((c_rows, n_cols), dtype=dtype)
            try:
                # one batch stack + one fancy-index fill (np.stack
                # raises on ragged input — exactly the refusal we want)
                block = np.stack([np.asarray(v, dtype=dtype)
                                  for v in vals])
            except ValueError:
                raise ValueError(
                    f'ragged value row (widths '
                    f'{sorted({len(v) for v in vals})}, want {n_cols}) '
                    '— zarr rows must be constant width') from None
            if block.shape[1] != n_cols:
                raise ValueError(
                    f'ragged value row (got width {block.shape[1]}, '
                    f'want {n_cols}) — zarr rows must be constant '
                    'width')
        m[pdf['row_id'].to_numpy(dtype=np.int64) - band * c_rows] = block
        buf = m.tobytes(order='C')
        if cid:
            co = _z.compressobj(1, _z.DEFLATED,
                                31 if cid == 'gzip' else 15)
            buf = co.compress(buf) + co.flush()
        attempt = TaskContext.get().taskAttemptId()
        if scheme:
            # two-phase commit via pyarrow.fs (the io/zst.py protocol):
            # temp object -> verify -> atomic-PUT move
            from pyarrow import fs as _pafs
            filesystem, root = _pafs.FileSystem.from_uri(path)
            cname = str(band) if one_d else f'{band}.0'
            final = f'{root}/{cname}'
            tmp = f'{final}.{attempt}.inprogress'
            with filesystem.open_output_stream(tmp) as fh:
                fh.write(buf)
            info = filesystem.get_file_info(tmp)
            if info.type != _pafs.FileType.File or info.size != len(buf):
                raise IOError(f'staged chunk {tmp!r} missing or '
                              'truncated at commit — refusing to '
                              'publish')
            filesystem.move(tmp, final)
        else:
            cname = str(band) if one_d else f'{band}.0'
            final = os.path.join(path, cname)
            tmp = f'{final}.{attempt}.inprogress'
            with open(tmp, 'wb') as fh:
                fh.write(buf)
            os.replace(tmp, final)
        return pd.DataFrame({'band': [band]})

    (indexed.withColumn('_band', (F.col('row_id') /
                                  F.lit(c_rows)).cast('long'))
     .groupBy('_band').applyInPandas(_write_chunk, schema='band long')
     .count())
    # .zarray lands LAST — it is the store's commit marker (a reader
    # that races the write sees no array rather than a partial grid)
    payload = json.dumps(meta).encode('utf-8')
    if scheme:
        from pyarrow import fs as pafs
        filesystem, root = pafs.FileSystem.from_uri(path)
        with filesystem.open_output_stream(f'{root}/.zarray') as fh:
            fh.write(payload)
    else:
        with open(os.path.join(path, '.zarray'), 'wb') as fh:
            fh.write(payload)
