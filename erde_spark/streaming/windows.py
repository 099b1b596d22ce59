"""Event-time windowed aggregation + incremental pipelines.

The reference's "streaming" is pipelined chunk IO (`/root/reference/erde/io/base.py`,
bounded multiprocessing queues) — Spark gives that for free. This module is
the engine's event-time surface over Structured Streaming, exposed for the
``events`` table (event_id, ts, user_id, event_type, value, props):

* tumbling / sliding / session windows (batch AND streaming — identical
  expressions, so a batch backtest is the same code as the live job);
* ``with_watermark`` late-data bound;
* ``stream_parquet_pipeline`` — file-source readStream -> transform ->
  foreachBatch sink, the constant-memory file-to-file analogue of the
  reference's read_stream/write_stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(df: DataFrame, ts_col: str, duration: str, aggs: dict,
                 by: list[str] | None = None) -> DataFrame:
    """Tumbling-window aggregation. ``aggs`` maps output name -> Column.
    Emits ``window_start``/``window_end`` timestamp columns."""
    keys = [F.window(F.col(ts_col), duration).alias('__w')] + \
           [F.col(c) for c in (by or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(F.col('__w.start').alias('window_start'),
                      F.col('__w.end').alias('window_end'),
                      *[c for c in out.columns if c != '__w'])


def sliding_agg(df: DataFrame, ts_col: str, duration: str, slide: str, aggs: dict,
                by: list[str] | None = None) -> DataFrame:
    keys = [F.window(F.col(ts_col), duration, slide).alias('__w')] + \
           [F.col(c) for c in (by or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(F.col('__w.start').alias('window_start'),
                      F.col('__w.end').alias('window_end'),
                      *[c for c in out.columns if c != '__w'])


def session_agg(df: DataFrame, ts_col: str, gap: str, aggs: dict,
                by: list[str] | None = None) -> DataFrame:
    """Session windows (gap-based). Works on batch and streaming frames."""
    keys = [F.session_window(F.col(ts_col), gap).alias('__w')] + \
           [F.col(c) for c in (by or [])]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(F.col('__w.start').alias('window_start'),
                      F.col('__w.end').alias('window_end'),
                      *[c for c in out.columns if c != '__w'])


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    return df.withWatermark(ts_col, delay)


def stream_dedup(df: DataFrame, ts_col: str, delay: str,
                 keys: list[str]) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: duplicates of a key are
    dropped while it stays within the watermark window, and the key's
    state is evicted once the watermark passes — the only dedup shape that
    survives an unbounded 100 TB stream (a plain ``dropDuplicates`` on a
    stream accumulates state forever)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def stream_parquet_pipeline(spark, in_dir: str, schema, transform: Callable[[DataFrame], DataFrame],
                            out_dir: str, checkpoint_dir: str,
                            trigger_once: bool = True):
    """File-source streaming pipeline: every new parquet file in ``in_dir``
    flows through ``transform`` and appends to ``out_dir``. With
    ``trigger_once`` it drains available input and stops (incremental batch
    — the direct analogue of the reference's chunked file copy, at
    constant memory).

    Returns the finished (or running) StreamingQuery.
    """
    src = spark.readStream.schema(schema).parquet(in_dir)
    out = transform(src)

    def _sink(batch_df: DataFrame, batch_id: int):
        batch_df.write.mode('append').parquet(out_dir)

    writer = (out.writeStream.foreachBatch(_sink)
              .option('checkpointLocation', checkpoint_dir))
    if trigger_once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
