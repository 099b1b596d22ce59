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


def stream_interval_join(left: DataFrame, right: DataFrame,
                         keys: list[str] | str, left_ts: str,
                         right_ts: str, max_lag: str,
                         watermark: str = '0 seconds') -> DataFrame:
    """Watermarked stream-stream INNER interval join — the attribution
    shape (view -> click within N minutes, impression -> conversion):
    per shared key, right rows with
    ``left_ts <= right_ts <= left_ts + max_lag``.

    Works identically on batch and streaming frames (same expressions,
    so a batch backtest replays the live job). On streams BOTH sides
    get ``withWatermark`` and the time-range predicate is what lets
    Spark bound the join state: a left row is evictable once the
    watermark passes ``left_ts + max_lag``, a right row once it passes
    ``right_ts`` — without the interval condition, stream-stream join
    state grows forever (Spark would reject the unbounded append join).
    State scales with rows inside the lag horizon per key — the only
    join shape that survives an unbounded 100 TB stream.

    Column names must be disjoint across sides except ``keys`` (rename
    before joining — the output keeps the LEFT key columns). Inner only:
    outer interval joins additionally delay emission to watermark close;
    compose via the kept key if needed.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for c in keys + [left_ts]:
        if c not in left.columns:
            raise ValueError(f'column {c!r} missing from left')
    for c in keys + [right_ts]:
        if c not in right.columns:
            raise ValueError(f'column {c!r} missing from right')
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(f'non-key columns present on both sides: '
                         f'{sorted(clash)} — rename before joining')
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    la, ra = l.alias('__l'), r.alias('__r')
    cond = None
    for k in keys:
        c = F.col(f'__l.{k}') == F.col(f'__r.{k}')
        cond = c if cond is None else cond & c
    lag = F.expr(f'INTERVAL {max_lag}')
    cond = (cond & (F.col(f'__r.{right_ts}') >= F.col(f'__l.{left_ts}'))
            & (F.col(f'__r.{right_ts}') <= F.col(f'__l.{left_ts}') + lag))
    out_cols = ([F.col(f'__l.{k}').alias(k) for k in keys]
                + [F.col(f'__l.{c}').alias(c) for c in left.columns
                   if c not in keys]
                + [F.col(f'__r.{c}').alias(c) for c in right.columns
                   if c not in keys])
    return la.join(ra, cond, 'inner').select(*out_cols)


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
