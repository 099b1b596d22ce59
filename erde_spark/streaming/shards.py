"""Streaming bridge to the training-interchange sinks: a standing
curation pipeline (WARC ingest -> filters -> dedup) ends at a
training-shard directory, not parquet — this is the last hop.

``foreachBatch`` gives at-least-once micro-batch delivery, so the
bridge makes replays IDEMPOTENT the same way the streaming dedup
store does (`erde_spark/scale/dedup.py` foreachBatch note): every
micro-batch writes into its OWN ``batch-<id>`` subdirectory with
``mode='overwrite'`` — a replayed batch rewrites its directory and
can never append duplicates, and each sink inside keeps its own
attempt-staged atomic commits for task-level retries. Readers take
the union with the sources' normal glob: the shard sources expand
``<dir>/*.<ext>``, so passing ``<path>/batch-*`` reads every batch.

No counterpart in the reference (its streaming writes CSV/GPKG
chunks, `/root/reference/erde/io/base.py`); the batch-scoped-output
design follows Structured Streaming's documented foreachBatch
idempotence recipe.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame

_WRITERS = {}


def _writers():
    if not _WRITERS:
        from erde_spark.io.arrow_shards import write_arrow_shards
        from erde_spark.io.avro_ocf import write_avro
        from erde_spark.io.megatron import write_megatron
        from erde_spark.io.tfrecord import write_tfrecord
        from erde_spark.io.wds import write_webdataset
        _WRITERS.update({'wds': write_webdataset,
                         'tfrecord': write_tfrecord,
                         'megatron': write_megatron,
                         'arrow': write_arrow_shards,
                         'avro': write_avro})
    return _WRITERS


def stream_to_shards(stream_df: DataFrame, path: str,
                     checkpoint_dir: str, fmt: str = 'wds',
                     trigger_once: bool = True,
                     **writer_kwargs):
    """Start a streaming query that lands every micro-batch as
    training shards under ``path/batch-<id>/`` in ``fmt`` ('wds' |
    'tfrecord' | 'megatron' | 'arrow' | 'avro'); ``writer_kwargs`` pass through
    to the sink (columns/shard_size/dtype/...). Returns the started
    ``StreamingQuery``; ``trigger_once=False`` runs continuously.

    Read the accumulated corpus back by globbing batches, e.g.
    ``read_webdataset(spark, f'{path}/batch-*')``."""
    writers = _writers()
    if fmt not in writers:
        raise ValueError(f'fmt must be one of {sorted(writers)}, '
                         f'got {fmt!r}')
    writer = writers[fmt]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        writer(batch_df, os.path.join(path, f'batch-{batch_id:06d}'),
               mode='overwrite', **writer_kwargs)

    q = (stream_df.writeStream
         .option('checkpointLocation', checkpoint_dir)
         .foreachBatch(_sink))
    if trigger_once:
        q = q.trigger(availableNow=True)
    return q.start()
