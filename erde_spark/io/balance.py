"""Balanced parquet output: uniform shard sizes for 100 TB corpora.

Downstream training readers want output files near a target size
(~256 MB): thousands of KB-sized shards thrash listings and task
scheduling, while multi-GB shards break range requests and skew
retries. Spark's default file count is whatever the last shuffle had,
which is unrelated to output bytes.

``write_balanced_parquet`` sizes the write from DATA, not guesswork:
a seeded-hash row sample is encoded to an actual in-memory parquet
buffer (same codec family the write uses), giving honest on-disk
bytes/row including compression; the row count then fixes the file
count and one round-robin repartition precedes the write. Cost: one
narrow sample job + one count + one extra shuffle of the output rows —
the price of predictable shards.
"""

from __future__ import annotations

import io
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_parquet_bytes_per_row(df: DataFrame, sample_rows: int = 512,
                                   seed: int = 7,
                                   compression: str = 'snappy') -> float:
    """On-disk parquet bytes per row, measured by encoding a
    seeded-hash-ordered sample (uniform draw, not leading partitions)
    through pyarrow with the target compression. Falls back to 64.0
    when the frame is empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    cols = df.columns
    sample = (df.withColumn('_h', F.xxhash64(*[F.col(c) for c in cols],
                                             F.lit(seed)))
              .orderBy('_h').limit(sample_rows).drop('_h'))
    pdf = sample.toPandas()
    if len(pdf) == 0:
        return 64.0
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), buf,
                   compression=compression)
    return max(buf.tell() / len(pdf), 1.0)


def write_balanced_parquet(df: DataFrame, path: str,
                           target_mb: int = 256,
                           mode: str = 'overwrite',
                           compression: str = 'snappy',
                           n_rows: int | None = None) -> int:
    """Write ``df`` as parquet in shards of ~``target_mb`` each;
    returns the file count used. Pass ``n_rows`` when the count is
    already known to skip the counting pass."""
    bpr = estimate_parquet_bytes_per_row(df, compression=compression)
    if n_rows is None:
        n_rows = df.count()
    n_files = max(1, math.ceil(n_rows * bpr / (target_mb * (1 << 20))))
    (df.repartition(n_files)
       .write.mode(mode).option('compression', compression).parquet(path))
    return n_files
