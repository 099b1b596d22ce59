"""Z-order (Morton) clustering for multi-column data-skipping layout.

Not in the reference (it has no storage-layout tooling at all); this is
the standard warehouse technique for the 100 TB posture: rows clustered
by the interleaved bits of several columns land correlated values in the
same files, so parquet min/max row-group stats prune scans on ANY prefix
of those columns — e.g. cluster events by (user_id, ts) or geometry by
(st_x, st_y) before writing.

Everything is JVM-side expression math (shift/and/or inside whole-stage
codegen): one agg job reads the per-column min/max, rows scale linearly
to ``bits``-bit integers, bits interleave, and ``repartitionByRange`` +
``sortWithinPartitions`` on the z-value produce the clustered layout (one
range shuffle — the same cost as any global sort, no driver collect of
data rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: bit i of cols[j] lands at position i*len(cols)+j.
    Inputs must already be non-negative ints < 2**bits."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f'{k} columns x {bits} bits exceeds a signed long')
    z = F.lit(0).cast('long')
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast('long'), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-value column over numeric columns, min/max-scaled to ``bits``
    bits each (one small agg job to read the ranges)."""
    stats = df.agg(*[f(c).cast('double').alias(f'{n}_{c}')
                     for c in cols for n, f in (('min', F.min), ('max', F.max))]
                   ).first()
    scaled = []
    for c in cols:
        lo, hi = stats[f'min_{c}'], stats[f'max_{c}']
        span = (hi - lo) or 1.0
        frac = (F.col(c).cast('double') - F.lit(lo)) / F.lit(span)
        v = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)) * ((1 << bits) - 1)
        scaled.append(F.round(v).cast('long'))
    return interleave_bits(scaled, bits)


def cluster_by_zorder(df: DataFrame, cols: list[str],
                      num_partitions: int | None = None,
                      bits: int = 16) -> DataFrame:
    """Rows re-laid-out in z-order: write the result with
    ``.write.parquet(...)`` and scans filtered on any of ``cols`` prune
    via row-group stats."""
    z = zorder_value(df, cols, bits).alias('__z')
    out = df.select('*', z)
    out = (out.repartitionByRange(num_partitions, '__z') if num_partitions
           else out.repartitionByRange('__z'))
    return out.sortWithinPartitions('__z').drop('__z')
