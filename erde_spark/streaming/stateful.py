"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no event-time state at all (SURVEY.md §2.8) — this is
the engine's extension surface for stateful stream processing, exposed for
the ``events`` table shape. State lives in Spark's state store per key;
each micro-batch receives the key's new rows plus its persisted state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType([
    T.StructField('user_id', T.LongType()),
    T.StructField('n_events', T.LongType()),
    T.StructField('sum_value', T.DoubleType()),
])

_STATE_SCHEMA = 'n LONG, s DOUBLE'


def running_user_stats(stream: DataFrame, key_col: str = 'user_id',
                       value_col: str = 'value') -> DataFrame:
    """Running per-key event count + value sum across micro-batches.

    Works only on streaming DataFrames (``readStream``). Each update-mode
    output row carries the key's cumulative totals so far — the canonical
    "profile accumulator" shape for a training-data ingest stream.
    """

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({'user_id': [key[0]], 'n_events': [n], 'sum_value': [s]})

    return (stream.groupBy(key_col).applyInPandasWithState(
        _update, outputStructType=RUNNING_SCHEMA, stateStructType=_STATE_SCHEMA,
        outputMode='update', timeoutConf=GroupStateTimeout.NoTimeout))


def run_stateful_batch(spark, source_df: DataFrame, transform, tmp_dir: str,
                       ts_col: str = 'ts', src_dir: str | None = None,
                       max_files_per_trigger: int | None = None,
                       shuffle_partitions: int | None = None) -> DataFrame:
    """Drive a stateful streaming transform over a batch table: write the
    table as the file-stream source, run with availableNow into a memory
    sink, return the final result as a DataFrame (test/backfill utility).

    Pass a pre-staged ``src_dir`` (file mtimes pin the source's batch
    order) plus ``max_files_per_trigger`` to drive the transform through
    MULTIPLE ordered micro-batches — the shape the cross-batch state-
    persistence gate needs; ``source_df`` then only supplies the schema.

    ``shuffle_partitions`` sizes the STATEFUL shuffle to the data (the
    ``stream_interval_join`` knob): every stateful partition carries a
    state store that is opened, snapshotted and committed per micro-
    batch, plus one Python worker for ``applyInPandasWithState`` — at
    the session default (cores) that fixed fan-out dominates small-key
    streams; at 100 TB the same knob sizes UP for state volume. The
    session default is restored after the run (the number is baked
    into the checkpoint by the first micro-batch, so it must be set
    before ``start``).

    SINGLE-THREADED ASSUMPTION (r12 ADVICE): setting the knob mutates
    the session-global ``spark.sql.shuffle.partitions`` for the whole
    ``awaitTermination`` window, so any query another thread runs on
    the SAME SparkSession meanwhile silently picks up the temporary
    value. Callers that drive concurrent work should hand this helper
    a cloned session (``spark.newSession()`` — shares the context,
    isolates the conf) instead."""
    ckpt = f'{tmp_dir}/ckpt'
    if src_dir is None:
        src_dir = f'{tmp_dir}/src'
        source_df.write.mode('overwrite').parquet(src_dir)
    reader = spark.readStream.schema(source_df.schema)
    if max_files_per_trigger:
        reader = reader.option('maxFilesPerTrigger',
                               str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    out = transform(stream)
    import re
    name = 'stateful_out_' + re.sub(r'\W', '_', tmp_dir).strip('_')
    old_parts = spark.conf.get('spark.sql.shuffle.partitions')
    if shuffle_partitions:
        spark.conf.set('spark.sql.shuffle.partitions',
                       str(shuffle_partitions))
    try:
        q = (out.writeStream.format('memory').queryName(name)
             .outputMode('update').option('checkpointLocation', ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        if shuffle_partitions:
            spark.conf.set('spark.sql.shuffle.partitions', old_parts)
    return spark.table(name)
