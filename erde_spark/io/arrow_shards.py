"""Arrow IPC shard IO — the random-access on-disk format of the
Hugging Face ``datasets`` ecosystem (Arrow IPC file format, a.k.a.
Feather v2): one ``.arrow`` file per partition, zero-copy mappable by
any Arrow reader.

Spark-first shape: the SINK streams each partition's Arrow batches
straight into one IPC file executor-side (pyarrow does the encoding —
unlike the WARC/WebDataset/TFRecord sinks nothing is hand-rolled here,
the container ships pyarrow); the SOURCE reads the schema from ONE
file footer on the driver, then parses every shard inside
``mapInPandas`` via ``binaryFile`` (shards are partition-sized; keep
partitions under binaryFile's ~2 GB per-file ceiling with a
repartition before writing, same discipline as every file sink here).

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


def write_arrow_shards(df: DataFrame, path: str,
                       mode: str = 'overwrite') -> None:
    """Write one Arrow IPC file per partition under ``path``. Empty
    partitions produce no file. Task retries overwrite the same
    deterministic ``part-<id>.arrow`` name, so the sink is idempotent
    per partition like Spark's own file committers."""
    import shutil
    schema = _pa_schema(df.schema)
    names = [f.name for f in df.schema.fields]
    if mode == 'error' and os.path.exists(path):
        raise FileExistsError(path)
    if mode == 'overwrite':
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def _write_partition(it):
        import pyarrow as pa
        from pyspark import TaskContext
        tid = TaskContext.get().partitionId()
        writer = None
        sink = None
        batch = []
        fname = os.path.join(path, f'part-{tid:05d}.arrow')

        def _flush():
            nonlocal writer, sink
            if not batch:
                return
            pdf = pd.DataFrame.from_records(batch, columns=names)
            tbl = pa.Table.from_pandas(pdf, schema=schema,
                                       preserve_index=False)
            if writer is None:
                sink = pa.OSFile(fname, 'wb')
                writer = pa.ipc.new_file(sink, schema)
            writer.write_table(tbl)
            batch.clear()

        for row in it:
            batch.append(tuple(row[n] for n in names))
            if len(batch) >= 10_000:
                _flush()
        _flush()
        if writer is not None:
            writer.close()
            sink.close()

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
             .load(os.path.join(path, '*.arrow'))
             .select('content'))
    return files.mapInPandas(_parse, schema)
