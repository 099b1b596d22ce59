"""Snapshot upsert: latest-wins merge of a base corpus with an updates
batch — the maintenance operation every recurring ingest needs between
full rebuilds (no Delta/Iceberg in this container, so MERGE semantics
are expressed as a deterministic DataFrame transformation the caller
rewrites the snapshot with; at 100 TB, partition the snapshot by a key
hash so the rewrite touches only partitions the updates hit).

Semantics match SQL MERGE with "update-or-insert, newest version wins":

* rows present only in ``base`` survive unchanged;
* rows present only in ``updates`` are inserts;
* a key present in both keeps the row with the HIGHEST version; a
  version tie goes to ``updates`` (the batch being applied wins, the
  same rule as Delta's "last writer wins" within a commit);
* optional tombstones: a WINNING row whose ``tombstone_col`` is true
  deletes the key from the result (and is itself dropped). Updates-side
  tombstones are the normal path; a base row already carrying the flag
  is honored identically — the flag means "deleted", whichever side it
  rode in on. (A snapshot produced by this function never contains the
  flag, so base-side tombstones only occur if the caller sets them.)

Plan: union + one window (row_number over key, version desc, source
rank) — a single shuffle on the key; no driver state. Ties WITHIN one
side on the same key+version are broken deterministically but
arbitrarily (flag your pipeline if it produces them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(base: DataFrame, updates: DataFrame,
                  key_cols: list[str] | str, version_col: str,
                  tombstone_col: str | None = None) -> DataFrame:
    """Latest-wins merged snapshot (see module docstring). ``base`` and
    ``updates`` must share the schema (tombstone column may exist only
    on ``updates``; it is dropped from the output)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError('key_cols must be non-empty')
    for c in keys + [version_col]:
        for side, df in (('base', base), ('updates', updates)):
            if c not in df.columns:
                raise ValueError(f'column {c!r} missing from {side}')
    if tombstone_col is not None and tombstone_col not in updates.columns:
        raise ValueError(f'tombstone column {tombstone_col!r} missing '
                         'from updates')
    b = base
    u = updates
    if tombstone_col is not None:
        if tombstone_col not in b.columns:
            b = b.withColumn(tombstone_col, F.lit(False))
    else:
        tombstone_col = '_erde_tombstone'
        b = b.withColumn(tombstone_col, F.lit(False))
        u = u.withColumn(tombstone_col, F.lit(False))
    cols = b.columns
    missing = [c for c in cols if c not in u.columns]
    if missing:
        raise ValueError(f'updates is missing columns {missing}')
    merged = (b.select(*cols).withColumn('_src', F.lit(0))
              .unionByName(u.select(*cols).withColumn('_src', F.lit(1))))
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc(),
                                          F.col('_src').desc())
    return (merged.withColumn('_rn', F.row_number().over(w))
            .filter((F.col('_rn') == 1) & ~F.coalesce(
                F.col(tombstone_col), F.lit(False)))
            .drop('_rn', '_src', tombstone_col))
