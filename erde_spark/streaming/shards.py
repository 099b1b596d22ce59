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


def stream_to_manifest(stream_df: DataFrame, path: str,
                       checkpoint_dir: str,
                       trigger_once: bool = True):
    """EXACTLY-ONCE-VISIBLE streaming publish into a manifested
    parquet dataset (``io/manifest.py``): every micro-batch commits
    as a new APPEND snapshot whose manifest records the batch id as
    its ``txn``, published by the dataset's atomic pointer swap.

    foreachBatch delivers at-least-once; the two failure shapes both
    collapse to exactly-once for pointer-following readers:

    * a batch REPLAYED after its pointer swap landed finds
      ``manifest_last_txn >= batch_id`` and skips — no duplicate
      snapshot;
    * a batch that died BEFORE its pointer swap left only
      unreferenced data/manifest objects (invisible by construction,
      swept by vacuum); its replay commits cleanly.

    Unlike the per-batch-directory recipe :func:`stream_to_shards`
    uses, readers here never union globs: they follow the pointer and
    see every completed batch exactly once and no partial batch —
    a downstream training job can re-resolve the snapshot between
    epochs and always reads a consistent corpus prefix. At 100 TB the
    per-batch cost over the data write is O(files in batch) moves +
    one pointer swap.

    Returns the started ``StreamingQuery``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from erde_spark.io.manifest import (manifest_last_txn,
                                            write_manifest_parquet)
        last = manifest_last_txn(path)
        if last is not None and batch_id <= last:
            return  # replayed micro-batch: its snapshot already landed
        write_manifest_parquet(batch_df, path, mode='append',
                               txn=batch_id)

    q = (stream_df.writeStream
         .option('checkpointLocation', checkpoint_dir)
         .foreachBatch(_sink))
    if trigger_once:
        q = q.trigger(availableNow=True)
    return q.start()
