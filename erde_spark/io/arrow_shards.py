"""Arrow IPC shard IO — the random-access on-disk format of the
Hugging Face ``datasets`` ecosystem (Arrow IPC file format, a.k.a.
Feather v2): one ``.arrow`` file per partition, zero-copy mappable by
any Arrow reader.

Spark-first shape: the SINK streams each partition's Arrow batches
into IPC shard files executor-side, ROLLING a new shard per
``shard_size`` rows / ``shard_bytes`` encoded bytes (pyarrow does the
encoding — unlike the WARC/WebDataset/TFRecord sinks nothing is
hand-rolled here, the container ships pyarrow) with attempt-scoped
staging + atomic rename; the SOURCE reads the schema from ONE file
footer on the driver, then parses every shard inside ``mapInPandas``
via ``binaryFile`` (each shard is buffered whole on read, so the
write-side rolling caps — not partition skew — bound read memory and
keep shards far under binaryFile's ~2 GB per-file ceiling).

No counterpart in the reference (training-data extension surface,
SURVEY.md §7.0 layer 6).
"""
from __future__ import annotations

import io
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with io/*)
from pyspark.sql import types as T

_SPARK_TO_PA = [
    (T.LongType, 'int64'), (T.IntegerType, 'int32'),
    (T.DoubleType, 'float64'), (T.FloatType, 'float32'),
    (T.StringType, 'string'), (T.BinaryType, 'binary'),
    (T.BooleanType, 'bool'), (T.TimestampType, 'timestamp[us]'),
    (T.DateType, 'date32[day]'),
]


def _pa_schema(spark_schema: T.StructType):
    import pyarrow as pa
    fields = []
    for f in spark_schema.fields:
        dt = f.dataType
        elem = None
        if isinstance(dt, T.ArrayType):
            elem, dt = True, dt.elementType
        for st, pat in _SPARK_TO_PA:
            if isinstance(dt, st):
                t = pa.type_for_alias(pat)
                break
        else:
            raise ValueError(f'unsupported type for arrow shard: '
                             f'{f.name}: {dt}')
        fields.append(pa.field(f.name, pa.list_(t) if elem else t))
    return pa.schema(fields)


def _spark_schema(pa_schema) -> T.StructType:
    import pyarrow as pa
    back = {
        pa.int64(): T.LongType(), pa.int32(): T.IntegerType(),
        pa.float64(): T.DoubleType(), pa.float32(): T.FloatType(),
        pa.string(): T.StringType(), pa.large_string(): T.StringType(),
        pa.binary(): T.BinaryType(), pa.large_binary(): T.BinaryType(),
        pa.bool_(): T.BooleanType(),
        pa.timestamp('us'): T.TimestampType(), pa.date32(): T.DateType(),
    }
    fields = []
    for f in pa_schema:
        t = f.type
        if isinstance(t, pa.ListType):
            inner = back.get(t.value_type)
            if inner is None:
                raise ValueError(f'unsupported arrow list type {t}')
            fields.append(T.StructField(f.name, T.ArrayType(inner)))
        else:
            st = back.get(t)
            if st is None:
                raise ValueError(f'unsupported arrow type {t} ({f.name})')
            fields.append(T.StructField(f.name, st))
    return T.StructType(fields)


def write_arrow_shards(df: DataFrame, path: str, mode: str = 'overwrite',
                       shard_size: int = 500_000,
                       shard_bytes: int = 256 << 20) -> None:
    """Write Arrow IPC shards under ``path``. Empty partitions produce
    no file. Each partition ROLLS a new ``part-<task>-<n>.arrow`` shard
    every ``shard_size`` rows or once ``shard_bytes`` encoded bytes
    have hit the current shard (checked at 10k-row batch boundaries
    via the file offset, so the cap can overshoot by at most one
    batch) — a skewed 10 GB partition becomes splittable ~256 MB
    shards instead of one unsplittable file, and the read side (which
    buffers one whole shard per ``binaryFile`` row) stays bounded by
    the shard cap rather than by partition skew. Local shards stage to
    attempt-scoped temp names and rename atomically on completion; URI
    destinations (file:// s3:// gs:// hdfs://) take the pyarrow.fs
    two-phase commit (temp object -> verify -> fs.move) — either way
    speculative or retried task attempts never interleave writes into
    one shard (same discipline as Spark's own file committers)."""
    schema = _pa_schema(df.schema)
    names = [f.name for f in df.schema.fields]
    if shard_size <= 0 or shard_bytes <= 0:
        raise ValueError('shard_size and shard_bytes must be positive')
    from erde_spark.io.fsutil import prepare_dir
    scheme = prepare_dir(path, mode)

    def _write_partition(it):
        import pyarrow as pa
        from pyspark import TaskContext

        # staging inlined from erde_spark.io.task_files (incl. its
        # open_staged two-phase branch): an erde_spark import here
        # would pull the whole io package (pandas + geo chain, ~0.6 s)
        # into every fresh Python worker — this closure otherwise
        # references only pandas/pyarrow/stdlib by name (see the
        # wds.py note / AB_r10 for the measured 2x cost)
        tc = TaskContext.get()
        tid = tc.partitionId()
        _attempt = tc.taskAttemptId()
        if scheme:
            from pyarrow import fs as pafs
            filesystem, root = pafs.FileSystem.from_uri(path)
        else:
            filesystem, root = None, path

        def staging_path(f):
            return f'{f}.{_attempt}.inprogress'

        def commit_file(t, f):
            if scheme:
                # two-phase: verify the staged object, then one
                # atomic PUT onto the final name
                info = filesystem.get_file_info(t)
                if info.type != pafs.FileType.File or info.size <= 0:
                    raise IOError(f'staged shard {t!r} missing or '
                                  'empty at commit — refusing to '
                                  'publish')
                filesystem.move(t, f)
            else:
                os.replace(t, f)
        writer = None
        sink = None
        tmp = final = None
        batch = []
        shard_idx = 0
        rows_in_shard = 0

        def _flush():
            nonlocal writer, sink, tmp, final
            if not batch:
                return
            pdf = pd.DataFrame.from_records(batch, columns=names)
            tbl = pa.Table.from_pandas(pdf, schema=schema,
                                       preserve_index=False)
            if writer is None:
                name = f'part-{tid:05d}-{shard_idx:05d}.arrow'
                final = f'{root}/{name}' if scheme \
                    else os.path.join(root, name)
                tmp = staging_path(final)
                sink = filesystem.open_output_stream(tmp) if scheme \
                    else pa.OSFile(tmp, 'wb')
                writer = pa.ipc.new_file(sink, schema)
            writer.write_table(tbl)
            batch.clear()

        def _roll():
            nonlocal writer, sink, shard_idx, rows_in_shard
            if writer is None:
                return
            writer.close()
            sink.close()
            commit_file(tmp, final)
            writer = sink = None
            shard_idx += 1
            rows_in_shard = 0

        batch_rows = min(10_000, shard_size)
        try:
            for row in it:
                batch.append(tuple(row[n] for n in names))
                rows_in_shard += 1
                if len(batch) >= batch_rows:
                    _flush()
                    if (rows_in_shard >= shard_size
                            or (sink is not None
                                and sink.tell() >= shard_bytes)):
                        _roll()
            _flush()
            _roll()
        finally:
            # dying attempt: close + drop the staging object (the zst
            # rule — read globs exclude '.inprogress', but a clean
            # directory beats relying on the filter)
            if writer is not None:
                # best-effort: a cleanup failure must not mask the
                # task's original exception (writer.close can raise
                # ArrowInvalid on a half-written footer)
                try:
                    writer.close()
                    sink.close()
                except Exception:
                    pass
                try:
                    if scheme:
                        filesystem.delete_file(tmp)
                    else:
                        os.remove(tmp)
                except Exception:
                    pass

    df.rdd.foreachPartition(_write_partition)


def read_arrow_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read an Arrow-shard directory back. The Spark schema comes from
    the FIRST shard's footer (one driver-side metadata read); every
    shard then parses executor-side."""
    import glob as _glob

    import pyarrow as pa
    shards = sorted(_glob.glob(os.path.join(path, '*.arrow')))
    if not shards:
        raise FileNotFoundError(f'no .arrow shards under {path}')
    with pa.OSFile(shards[0], 'rb') as fh:
        pa_schema = pa.ipc.open_file(fh).schema
    schema = _spark_schema(pa_schema)
    binary_cols = [f.name for f in schema.fields
                   if isinstance(f.dataType, T.BinaryType)]

    def _parse(batches):
        for pdf in batches:
            for blob in pdf['content']:
                rd = pa.ipc.open_file(io.BytesIO(bytes(blob)))
                out = rd.read_all().to_pandas()
                for c in binary_cols:
                    out[c] = out[c].map(
                        lambda v: bytes(v) if v is not None else None)
                yield out

    files = (spark.read.format('binaryFile')
             .option('pathGlobFilter', '*.arrow').load(path)
             .select('content'))
    return files.mapInPandas(_parse, schema)
