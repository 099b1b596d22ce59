"""WebDataset shard IO — the tar-of-samples format standard in
large-scale training pipelines (Breuel's webdataset library; used by
OpenCLIP / LAION-scale runs): each sample is a group of adjacent tar
members sharing a basename key ('12345.txt', '12345.jpg',
'12345.json'), shards are plain POSIX tars a training loader streams
sequentially.

Spark-first shape: the SINK writes one-or-more bounded shards per
partition executor-side (stdlib ``tarfile``, deterministic USTAR
headers, sample members adjacent — the format's contract), so a
balanced repartition controls shard count and no driver collect ever
happens; the SOURCE lists shards with Spark's ``binaryFile`` reader
and parses each tar inside ``mapInPandas`` (shards are bounded by
``shard_size`` at write time, far under binaryFile's ~2 GB per-file
ceiling). Like Spark's own file sinks, a plain local path on a
multi-host cluster must be a shared filesystem.

No counterpart in the reference (training-data extension surface,
SURVEY.md §7.0 layer 6).
"""
from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: write-side extension inference by Spark type
_EXT_FOR_TYPE = {T.StringType(): 'txt', T.BinaryType(): 'bin'}


def _infer_columns(df: DataFrame, key_col: str) -> dict:
    cols = {}
    for f in df.schema.fields:
        if f.name == key_col:
            continue
        cols[f.name] = _EXT_FOR_TYPE.get(f.dataType, 'json')
    return cols


def write_webdataset(df: DataFrame, path: str, key_col: str = 'doc_id',
                     columns: dict | None = None, mode: str = 'overwrite',
                     shard_size: int = 10_000) -> None:
    """Write a WebDataset shard directory: ``columns`` maps column ->
    member extension (default inferred: string -> .txt, binary -> raw
    .bin, anything else JSON-encoded -> .json). Null members are
    skipped (sparse samples are legal WebDataset); a row whose sample
    columns are ALL null still emits an empty ``<key>.nul`` sentinel
    member so the sample round-trips as an all-null row instead of
    silently vanishing. Keys must not contain ``.`` (the format splits
    key from extension on the first dot on read — WebDataset's own
    convention); a dotted key raises ``ValueError`` at write time
    rather than misfiling samples on read. Each partition rolls a new
    ``shard-<taskid>-<n>.tar`` every ``shard_size`` samples; member
    headers are deterministic (mtime 0, root ownership) so identical
    data produces identical shards. Local shards stage to
    attempt-scoped temp names and rename atomically on completion; URI
    destinations (file:// s3:// gs:// hdfs://) stream the tar into a
    pyarrow.fs two-phase commit (temp object -> verify -> fs.move) —
    either way a speculative or retried task attempt can never
    interleave writes into one shard (same discipline as Spark's own
    file committers)."""
    if shard_size <= 0:
        raise ValueError('shard_size must be positive')
    cols = dict(columns) if columns else _infer_columns(df, key_col)
    if not cols:
        raise ValueError('no sample columns (only the key?)')
    from erde_spark.io.fsutil import prepare_dir
    scheme = prepare_dir(path, mode)
    field_type = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in field_type:
            raise ValueError(f'no column {c!r} in the frame')
    names = list(cols)
    rows = df.select(F.col(key_col).cast('string').alias('_key'), *names)

    def _write_partition(it):
        # staging discipline inlined from erde_spark.io.task_files
        # (incl. its open_staged two-phase branch): importing that
        # module here would drag the whole erde_spark.io package
        # (pandas + geo chain, ~0.6 s) into every FRESH Python worker —
        # this closure must reference only stdlib + pyspark + pyarrow
        # (measured as a 2x wds_roundtrip regression in AB_r10 when the
        # worker pool had been recycled by a preceding Arrow-UDF query)
        from pyspark import TaskContext
        tc = TaskContext.get()
        tid = tc.partitionId()
        attempt = tc.taskAttemptId()
        tar = None
        fh = None
        tmp = final = None
        shard_idx = 0
        n_in_shard = 0
        if scheme:
            from pyarrow import fs as pafs
            filesystem, root = pafs.FileSystem.from_uri(path)
        else:
            filesystem, root = None, path

        def _open():
            nonlocal tmp, final, fh
            name = f'shard-{tid:05d}-{shard_idx:05d}.tar'
            final = f'{root}/{name}' if scheme \
                else os.path.join(root, name)
            tmp = f'{final}.{attempt}.inprogress'
            if scheme:
                # stream mode ('w|'): tarfile never seeks, so the tar
                # writes straight into the object-store temp object
                fh = filesystem.open_output_stream(tmp)
                return tarfile.open(fileobj=fh, mode='w|',
                                    format=tarfile.USTAR_FORMAT)
            return tarfile.open(tmp, 'w', format=tarfile.USTAR_FORMAT)

        def _close(t):
            nonlocal fh
            t.close()
            if scheme:
                fh.close()
                fh = None
                # two-phase: verify the staged object landed whole,
                # then one atomic PUT onto the final name
                info = filesystem.get_file_info(tmp)
                if info.type != pafs.FileType.File or info.size <= 0:
                    raise IOError(f'staged shard {tmp!r} missing or '
                                  'empty at commit — refusing to '
                                  'publish')
                filesystem.move(tmp, final)
            else:
                os.replace(tmp, final)

        def _add(t, name, payload):
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ''
            t.addfile(info, io.BytesIO(payload))

        try:
            for row in it:
                if tar is None:
                    tar = _open()
                key = row['_key']
                if key is None or '.' in key:
                    raise ValueError(
                        f'WebDataset key {key!r} is null or contains '
                        '"." — readers split key from extension on the '
                        'first dot, so dotted keys misfile on read; '
                        'sanitize the key column first')
                wrote_member = False
                for c in names:
                    v = row[c]
                    if v is None:
                        continue
                    ext = cols[c]
                    if isinstance(v, (bytes, bytearray)):
                        payload = bytes(v)
                    elif isinstance(v, str):
                        # strings write raw whatever the extension — a
                        # string column tagged 'json' already IS json
                        payload = v.encode('utf-8')
                    else:
                        payload = json.dumps(
                            v, sort_keys=True,
                            ensure_ascii=False).encode('utf-8')
                    _add(tar, f'{key}.{ext}', payload)
                    wrote_member = True
                if not wrote_member:
                    # all-null sample: sentinel keeps the key alive
                    _add(tar, f'{key}.nul', b'')
                n_in_shard += 1
                if n_in_shard >= shard_size:
                    _close(tar)
                    tar, n_in_shard = None, 0
                    shard_idx += 1
            if tar is not None:
                _close(tar)
                tar = None
        finally:
            # a dying attempt must not leave a truncated staging file
            # (read-side globs exclude '.inprogress', but a clean
            # directory beats relying on the filter — the zst rule)
            if tar is not None:
                # best-effort: a cleanup failure must not mask the
                # task's original exception
                try:
                    tar.close()
                    if fh is not None:
                        fh.close()
                except Exception:
                    pass
                try:
                    if scheme:
                        filesystem.delete_file(tmp)
                    else:
                        os.remove(tmp)
                except Exception:
                    pass

    rows.rdd.foreachPartition(_write_partition)


def read_webdataset(spark: SparkSession, path: str,
                    columns: dict | None = None) -> DataFrame:
    """Read a WebDataset shard directory back into (key, shard,
    sample columns). ``columns`` maps member extension -> (column
    name, kind) with kind one of 'str' | 'bytes' | 'json'; default
    ``{'txt': ('text', 'str')}``. Missing members are null. Samples
    are grouped by basename key across adjacent members (the format's
    contract); EVERY member registers its key — including the
    ``<key>.nul`` all-null sentinel and extensions outside
    ``columns`` — so a sample never silently vanishes; key order
    within a shard is preserved into ``_pos`` so sequential loaders
    can be replayed."""
    cols = dict(columns) if columns else {'txt': ('text', 'str')}
    fields = [T.StructField('key', T.StringType()),
              T.StructField('shard', T.StringType()),
              T.StructField('_pos', T.LongType())]
    for ext, (name, kind) in cols.items():
        fields.append(T.StructField(
            name, T.BinaryType() if kind == 'bytes' else T.StringType()))
    schema = T.StructType(fields)

    def _parse(batches):
        for pdf in batches:
            out = {f.name: [] for f in fields}
            for shard_path, blob in zip(pdf['path'], pdf['content']):
                samples: dict = {}
                order: list = []
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        base = os.path.basename(m.name)
                        key, _, ext = base.partition('.')
                        if key not in samples:
                            # every member registers its key (so the
                            # all-null '<key>.nul' sentinel still
                            # yields a row); only requested extensions
                            # fill columns
                            samples[key] = {}
                            order.append(key)
                        if ext in cols:
                            samples[key][ext] = tf.extractfile(m).read()
                for pos, key in enumerate(order):
                    out['key'].append(key)
                    out['shard'].append(os.path.basename(shard_path))
                    out['_pos'].append(pos)
                    for ext, (name, kind) in cols.items():
                        raw = samples[key].get(ext)
                        if raw is None:
                            out[name].append(None)
                        elif kind == 'bytes':
                            out[name].append(raw)
                        elif kind == 'json':
                            out[name].append(raw.decode('utf-8'))
                        else:
                            out[name].append(raw.decode('utf-8'))
            yield pd.DataFrame(out)

    files = (spark.read.format('binaryFile')
             .option('pathGlobFilter', '*.tar').load(path)
             .select('path', 'content'))
    return files.mapInPandas(_parse, schema)
