"""Manifested parquet datasets (``*.mparquet``) — DATASET-level atomic
commit on top of the per-file two-phase discipline the training sinks
already carry (io/task_files.py, io/fsutil.py).

The per-file protocol (staged object -> verify -> atomic move) makes
each FILE all-or-nothing, but a multi-file snapshot published by
listing a directory is still torn-readable: a reader that lists while
a writer is mid-publish sees half the files, and on object stores the
listing itself is the scale problem (O(files) LIST calls, historically
eventually-consistent). This module closes both gaps the way the
table-format literature does (Iceberg's snapshot+pointer model,
re-expressed minimally):

* every commit writes an immutable ``_manifest.v<N>.json`` naming the
  EXACT data files of snapshot N (plus schema, per-file byte/row
  stats, parent version);
* the only mutable object is a tiny ``_latest`` pointer, swapped LAST
  by the same staged-write -> verify -> atomic-move primitive the
  sinks use (``os.replace`` locally, one-PUT ``fs.move`` via
  pyarrow.fs on URI stores) — readers observe the old snapshot or the
  new one, never a mixture, regardless of how many data files moved;
* readers plan from the manifest's file list, NEVER from a directory
  listing — ``spark.read.parquet(*files)`` with the manifest's pinned
  schema, so a half-published snapshot, a rogue foreign file dropped
  into ``data/``, or a store's listing latency cannot change what a
  reader sees. ``count(*)``-class questions answer from manifest
  stats without touching a data byte.

Scale shape: the commit is O(1) in data size (one pointer swap however
many files moved); appends add files without rewriting data; time
travel is "read an older manifest"; ``vacuum_manifest`` is the
explicit, bounded deletion step. The data plane stays Spark's native
parquet writer/reader (whole-stage codegen, predicate pushdown into
the scan — nothing here wraps a row). Snapshot isolation is
single-writer: a concurrent pointer advance is DETECTED at commit
(parent re-check) and aborts the loser, it is not prevented (no CAS on
plain filesystems; serialize writers externally at 100 TB).

No counterpart in the reference (its sinks are single-process
overwrite, ``/root/reference/erde/io/base.py``); this is the piece a
1000-executor pipeline needs so downstream jobs never train on a
half-written corpus snapshot.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from erde_spark.io.fsutil import _scheme, join_path, open_ranged
from erde_spark.io.task_files import open_staged

_POINTER = '_latest'
_DATA_DIR = 'data'
#: driver-loop bound for footer stat reads; above it, one Spark job
#: collects (path, rows) — the avro header-collection pattern
#: (io/avro_ocf.py read_avro).
_DRIVER_STAT_CAP = 256


def _manifest_name(version: int) -> str:
    return f'_manifest.v{version}.json'


# ---------------------------------------------------------------- fs helpers

def _exists(path: str, scheme: str) -> bool:
    if not scheme:
        return os.path.exists(path)
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    return filesystem.get_file_info(rel).type != pafs.FileType.NotFound


def _mkdirs(path: str, scheme: str) -> None:
    if not scheme:
        os.makedirs(path, exist_ok=True)
        return
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    filesystem.create_dir(rel, recursive=True)


def _read_small(path: str, scheme: str) -> bytes:
    with open_ranged(path) as fh:
        return fh.read()


def _write_atomic(path: str, payload: bytes, scheme: str) -> None:
    """Staged write + verify + atomic move for a small control-plane
    object (manifest, pointer) — driver-side use of the sinks'
    ``open_staged`` primitive (attempt id 0 outside a task)."""
    fh, commit, abort = open_staged(path, scheme)
    try:
        fh.write(payload)
        commit()
    except BaseException:
        abort()
        raise


def _move(src: str, dst: str, scheme: str) -> None:
    if not scheme:
        os.replace(src, dst)
        return
    from pyarrow import fs as pafs
    filesystem, rel_src = pafs.FileSystem.from_uri(src)
    _, rel_dst = pafs.FileSystem.from_uri(dst)
    filesystem.move(rel_src, rel_dst)


def _delete_file(path: str, scheme: str) -> None:
    if not scheme:
        os.remove(path)
        return
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    filesystem.delete_file(rel)


def _delete_dir(path: str, scheme: str) -> None:
    if not scheme:
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        return
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    try:
        filesystem.delete_dir(rel)
    except FileNotFoundError:
        pass


def _list_files(dir_path: str, scheme: str, suffix: str) -> list[tuple[str, int]]:
    """(name, bytes) for ``*suffix`` files directly under ``dir_path``,
    name-sorted. Only ever called on directories THIS writer just
    produced (its own staging output) or on the control plane —
    snapshot READS never list."""
    if not scheme:
        out = []
        for name in sorted(os.listdir(dir_path)):
            if name.endswith(suffix):
                out.append((name, os.path.getsize(os.path.join(dir_path, name))))
        return out
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(dir_path)
    sel = pafs.FileSelector(rel, recursive=False)
    infos = [i for i in filesystem.get_file_info(sel)
             if i.type == pafs.FileType.File and i.path.endswith(suffix)]
    return sorted((i.path.rsplit('/', 1)[-1], i.size) for i in infos)


# ---------------------------------------------------------------- stats

def _footer_rows(full_path: str) -> tuple[int, dict]:
    """(row count, per-column min/max) from the parquet FOOTER — a
    bounded ranged read, not a data scan (executor-safe: pyarrow +
    stdlib only). Stats cover NUMERIC and BOOLEAN top-level columns
    only: parquet writers may TRUNCATE string min/max (a truncated
    upper bound is not a valid pruning bound across writers), so
    string columns are deliberately excluded — a file without stats
    for a column is always kept by the pruner."""
    from urllib.parse import urlparse
    import pyarrow.parquet as pq

    def _stats(md):
        # a column needs VALID stats in every row group to be usable:
        # dropped (None-marked) once any row group lacks them
        out: dict = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if '.' in name:
                    continue  # nested leaf — not a top-level column
                st = col.statistics
                if (st is None or not st.has_min_max
                        or not isinstance(st.min, (int, float, bool))
                        or not isinstance(st.max, (int, float, bool))):
                    out[name] = None
                    continue
                if rg == 0:
                    out[name] = [st.min, st.max]
                elif out.get(name) is not None:
                    out[name] = [min(out[name][0], st.min),
                                 max(out[name][1], st.max)]
        return {k: v for k, v in out.items() if v is not None}

    if len(urlparse(full_path).scheme) > 1:
        from pyarrow import fs as pafs
        filesystem, rel = pafs.FileSystem.from_uri(full_path)
        with filesystem.open_input_file(rel) as fh:
            md = pq.ParquetFile(fh).metadata
            return md.num_rows, _stats(md)
    with open(full_path, 'rb') as fh:
        md = pq.ParquetFile(fh).metadata
        return md.num_rows, _stats(md)


def _collect_rows(spark: SparkSession, paths: list[str]) \
        -> dict[str, tuple[int, dict]]:
    """{path: (num_rows, column min/max)} via footer reads: driver
    loop under ``_DRIVER_STAT_CAP`` files, one Spark job above (the
    avro header-collection split). The job closure touches only
    stdlib/pyarrow by name — the wds import-chain rule."""
    if len(paths) <= _DRIVER_STAT_CAP:
        return {p: _footer_rows(p) for p in paths}
    sc = spark.sparkContext
    return dict(
        sc.parallelize(paths, max(32, len(paths) // 64))
        .map(lambda p: (p, _footer_rows(p)))
        .collect())


# ---------------------------------------------------------------- manifests

def _pointer_version(path: str, scheme: str) -> int | None:
    ptr = join_path(path, _POINTER, scheme)
    if not _exists(ptr, scheme):
        return None
    return int(json.loads(_read_small(ptr, scheme))['version'])


def _load_manifest(path: str, scheme: str, version: int) -> dict:
    mf = join_path(path, _manifest_name(version), scheme)
    if not _exists(mf, scheme):
        raise FileNotFoundError(
            f'manifest version {version} not found under {path!r} '
            '(vacuumed, or never committed)')
    return json.loads(_read_small(mf, scheme))


def write_manifest_parquet(df: DataFrame, path: str,
                           mode: str = 'overwrite',
                           txn: int | None = None) -> int:
    """Commit ``df`` as a new snapshot of the manifested dataset at
    ``path`` and return the new version number.

    ``mode='overwrite'``: the new snapshot's live file set is the new
    files only (prior snapshots stay readable by version until
    :func:`vacuum_manifest`). ``'append'``: new snapshot = parent's
    files + new files; the schema must match the parent's exactly
    (snapshot-level schema evolution is a rewrite, by design).
    ``'error'``: refuse if the dataset already exists.

    Protocol (crash-safe at every step boundary — an aborted commit
    leaves only unreferenced objects, which vacuum sweeps):

    1. Spark writes parquet into a commit-scoped ``_staging-<token>``
       under the root (data plane — native writer, full codegen);
    2. each part file moves to its immutable final name
       ``data/<token>-<i>.parquet`` (atomic per file);
    3. footer row counts collect (driver loop or one Spark job);
    4. ``_manifest.v<N>.json`` is written staged+verified+moved;
    5. the parent pointer is RE-READ — a concurrent advance aborts
       this commit with ``ConcurrentWriteError`` (detection, not
       prevention: plain filesystems have no CAS);
    6. the ``_latest`` pointer swaps atomically. Readers see parent
       or N, never a mixture.

    ``txn`` is an optional caller transaction id recorded in the
    manifest (the streaming bridge passes the micro-batch id so
    replays are detectable — see
    ``erde_spark/streaming/shards.py::stream_to_manifest``).
    """
    if mode not in ('overwrite', 'append', 'error'):
        raise ValueError(f'unknown save mode {mode!r} for manifest '
                         "dataset (use 'overwrite', 'append' or 'error')")
    scheme = _scheme(path)
    path = path.rstrip('/')
    parent = _pointer_version(path, scheme)
    if mode == 'error' and parent is not None:
        raise FileExistsError(
            f'manifest dataset already exists at {path!r} (version '
            f'{parent}); use overwrite or append')
    entries = _stage_dataframe(df, path, scheme)
    schema_json = df.schema.json()
    if mode == 'append' and parent is not None:
        parent_mf = _load_manifest(path, scheme, parent)
        if parent_mf['schema'] != schema_json:
            raise ValueError(
                'append schema mismatch: the snapshot schema is pinned '
                'by the parent manifest; rewrite (overwrite) to evolve')
        entries = parent_mf['files'] + entries
    return _commit_snapshot(path, scheme, parent, entries, schema_json,
                            mode, txn)


def _stage_dataframe(df: DataFrame, path: str, scheme: str) -> list[dict]:
    """Data plane of a commit: Spark-write ``df`` into a commit-scoped
    staging directory, move each part to its immutable final name
    under ``data/``, and return the manifest entries (name, bytes,
    rows, numeric min/max stats) — all from footer reads."""
    data_dir = join_path(path, _DATA_DIR, scheme)
    _mkdirs(data_dir, scheme)
    token = uuid.uuid4().hex[:12]
    staging = join_path(path, f'_staging-{token}', scheme)
    try:
        df.write.mode('overwrite').parquet(staging)
        parts = _list_files(staging, scheme, '.parquet')
        entries = []
        finals = []
        for i, (name, size) in enumerate(parts):
            final_name = f'{token}-{i:05d}.parquet'
            _move(join_path(staging, name, scheme),
                  join_path(data_dir, final_name, scheme), scheme)
            entries.append({'path': final_name, 'bytes': size})
            finals.append(join_path(data_dir, final_name, scheme))
        rows = _collect_rows(df.sparkSession, finals)
        for e, full in zip(entries, finals):
            e['rows'], stats = rows[full]
            if stats:
                # numeric/boolean per-file min/max off the same footer
                # read — the read path's file-skipping index
                e['stats'] = stats
        return entries
    finally:
        _delete_dir(staging, scheme)


def _commit_snapshot(path: str, scheme: str, parent: int | None,
                     entries: list[dict], schema_json: str,
                     mode: str, txn: int | None = None) -> int:
    """Control plane of a commit: write the immutable manifest, re-check
    the parent pointer (concurrent-advance detection), swap the pointer
    atomically. Shared by the writer and the compactor."""
    version = (parent or 0) + 1
    manifest = {
        'version': version,
        'parent': parent,
        'mode': mode,
        'schema': schema_json,
        'files': entries,
        'total_rows': sum(e['rows'] for e in entries),
        'total_bytes': sum(e['bytes'] for e in entries),
    }
    if txn is not None:
        manifest['txn'] = txn
    _write_atomic(join_path(path, _manifest_name(version), scheme),
                  json.dumps(manifest, indent=1).encode(), scheme)
    if _pointer_version(path, scheme) != parent:
        # a rival writer advanced the pointer while this commit staged;
        # publishing would orphan its snapshot — abort (our manifest +
        # data files are unreferenced; vacuum sweeps them)
        raise ConcurrentWriteError(
            f'pointer advanced past version {parent} during commit '
            f'to {path!r}; retry on top of the new snapshot')
    _write_atomic(join_path(path, _POINTER, scheme),
                  json.dumps({'version': version,
                              'manifest': _manifest_name(version)}).encode(),
                  scheme)
    return version


class ConcurrentWriteError(RuntimeError):
    """A rival writer advanced the dataset pointer during a commit."""


def _prune_entries(entries: list[dict],
                   where: tuple | None) -> list[dict]:
    """Manifest-level file skipping: keep entries whose recorded
    [min, max] for ``where``'s column can intersect [lo, hi]; entries
    without stats for the column are always kept (pruning may only
    ever DROP provably-disjoint files)."""
    if where is None:
        return entries
    col, lo, hi = where
    if lo is not None and hi is not None and lo > hi:
        raise ValueError(f'empty where range: {lo!r} > {hi!r}')
    kept = []
    for e in entries:
        mm = e.get('stats', {}).get(col)
        if mm is None:
            kept.append(e)
            continue
        if (hi is not None and mm[0] > hi) or \
                (lo is not None and mm[1] < lo):
            continue
        kept.append(e)
    return kept


def read_manifest_parquet(path: str, spark: SparkSession | None = None,
                          version: int | None = None,
                          where: tuple | None = None) -> DataFrame:
    """Snapshot read planned from the MANIFEST's explicit file list
    (never a directory listing) with the manifest's pinned schema —
    ``version=None`` follows the ``_latest`` pointer; an integer time-
    travels to that snapshot (readable until vacuumed).

    ``where=(col, lo, hi)`` (either bound may be None) both FILTERS
    rows to the inclusive range AND prunes files the manifest's
    per-file min/max prove disjoint BEFORE Spark plans the scan — at
    100 TB on a range-clustered column this is the difference between
    opening every object and opening the few that can match; parquet
    row-group pruning then applies inside the survivors as usual.
    Files without recorded stats for the column are read (and
    row-filtered), never wrongly skipped."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        from erde_spark.session import get_spark
        spark = get_spark()
    scheme = _scheme(path)
    path = path.rstrip('/')
    if version is None:
        version = _pointer_version(path, scheme)
        if version is None:
            raise FileNotFoundError(f'no manifest dataset at {path!r}')
    mf = _load_manifest(path, scheme, version)
    schema = T.StructType.fromJson(json.loads(mf['schema']))
    data_dir = join_path(path, _DATA_DIR, scheme)
    entries = _prune_entries(mf['files'], where)
    files = [join_path(data_dir, e['path'], scheme) for e in entries]
    if not files:
        df = spark.createDataFrame([], schema)
    else:
        df = spark.read.schema(schema).parquet(*files)
    if where is not None:
        col, lo, hi = where
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
    return df


def manifest_planned_files(path: str, version: int | None = None,
                           where: tuple | None = None) -> list[str]:
    """The data file names a :func:`read_manifest_parquet` call with
    the same arguments would plan — the observability hook for
    file-skipping tests and ops tooling."""
    scheme = _scheme(path)
    path = path.rstrip('/')
    if version is None:
        version = _pointer_version(path, scheme)
        if version is None:
            raise FileNotFoundError(f'no manifest dataset at {path!r}')
    mf = _load_manifest(path, scheme, version)
    return [e['path'] for e in _prune_entries(mf['files'], where)]


def manifest_versions(path: str) -> list[dict]:
    """All readable snapshots, oldest first: ``{version, parent, mode,
    num_files, total_rows, total_bytes, latest}`` per manifest still
    present (control-plane listing only — tiny JSON objects)."""
    scheme = _scheme(path)
    path = path.rstrip('/')
    current = _pointer_version(path, scheme)
    out = []
    for name, _size in _list_files(path, scheme, '.json'):
        if not name.startswith('_manifest.v'):
            continue
        mf = json.loads(_read_small(join_path(path, name, scheme), scheme))
        out.append({'version': mf['version'], 'parent': mf['parent'],
                    'mode': mf['mode'], 'num_files': len(mf['files']),
                    'total_rows': mf['total_rows'],
                    'total_bytes': mf['total_bytes'],
                    'latest': mf['version'] == current})
    return sorted(out, key=lambda d: d['version'])


def manifest_stats(path: str, version: int | None = None) -> dict:
    """Snapshot stats straight off the manifest — ``count(*)``-class
    answers without touching a data byte."""
    scheme = _scheme(path)
    path = path.rstrip('/')
    if version is None:
        version = _pointer_version(path, scheme)
        if version is None:
            raise FileNotFoundError(f'no manifest dataset at {path!r}')
    mf = _load_manifest(path, scheme, version)
    return {'version': mf['version'], 'parent': mf['parent'],
            'num_files': len(mf['files']), 'total_rows': mf['total_rows'],
            'total_bytes': mf['total_bytes']}


def compact_manifest(path: str, spark: SparkSession | None = None,
                     min_bytes: int = 32 << 20,
                     target_bytes: int = 128 << 20) -> int | None:
    """Rewrite the live snapshot's SMALL files (< ``min_bytes``) into
    ~``target_bytes`` files and commit the result as a new snapshot;
    returns the new version, or None when fewer than two files qualify
    (nothing worth compacting).

    The maintenance op the streaming sink needs: every micro-batch
    commit adds a few small files, and at 100 TB a scan over millions
    of tiny objects is dominated by per-file open cost. Compaction
    reads ONLY the qualifying small files (manifest-planned, pinned
    schema), coalesces them WITHOUT a shuffle (``coalesce`` on the
    scan — compaction moves bytes, it never needs a repartition), and
    commits large-files-kept + compacted-files as version N+1. Row
    conservation is verified from footer counts before the pointer
    swap — a lost or duplicated row aborts with only unreferenced
    debris. Prior versions still reference the original small files
    (time travel intact) until :func:`vacuum_manifest`; the parent's
    ``txn`` high-water mark carries forward so the streaming replay
    guard is unaffected by interleaved compactions."""
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        from erde_spark.session import get_spark
        spark = get_spark()
    scheme = _scheme(path)
    path = path.rstrip('/')
    parent = _pointer_version(path, scheme)
    if parent is None:
        raise FileNotFoundError(f'no manifest dataset at {path!r}')
    mf = _load_manifest(path, scheme, parent)
    small = [e for e in mf['files'] if e['bytes'] < min_bytes]
    if len(small) < 2:
        return None
    big = [e for e in mf['files'] if e['bytes'] >= min_bytes]
    data_dir = join_path(path, _DATA_DIR, scheme)
    schema = T.StructType.fromJson(json.loads(mf['schema']))
    total = sum(e['bytes'] for e in small)
    n_out = max(1, -(-total // target_bytes))
    df = (spark.read.schema(schema)
          .parquet(*[join_path(data_dir, e['path'], scheme)
                     for e in small])
          .coalesce(n_out))
    entries = _stage_dataframe(df, path, scheme)
    if sum(e['rows'] for e in entries) != sum(e['rows'] for e in small):
        raise IOError(
            'compaction row-count mismatch — refusing to publish '
            '(the staged files are unreferenced; vacuum sweeps them)')
    return _commit_snapshot(path, scheme, parent, big + entries,
                            mf['schema'], 'compact', mf.get('txn'))


def manifest_last_txn(path: str) -> int | None:
    """The transaction id recorded by the LATEST COMMITTED snapshot
    (pointer-anchored), or None if the dataset doesn't exist or its
    head snapshot carries no txn. This is the replay guard the
    streaming bridge consults: a foreachBatch retry of batch B finds
    ``last_txn >= B`` and skips — debris manifests newer than the
    pointer (aborted commits) are never consulted."""
    scheme = _scheme(path)
    path = path.rstrip('/')
    version = _pointer_version(path, scheme)
    if version is None:
        return None
    return _load_manifest(path, scheme, version).get('txn')


def vacuum_manifest(path: str, keep_last: int = 1) -> list[str]:
    """Delete data files unreferenced by the newest ``keep_last``
    snapshots, and the older manifests themselves; returns the deleted
    data file names. The pointer always targets the newest snapshot,
    so it survives any ``keep_last >= 1``. Deletion is the ONLY
    destructive step in the format and it is this explicit call —
    aborted commits' orphans are swept here too."""
    if keep_last < 1:
        raise ValueError('keep_last must be >= 1')
    scheme = _scheme(path)
    path = path.rstrip('/')
    current = _pointer_version(path, scheme)
    versions = [v['version'] for v in manifest_versions(path)]
    if not versions or current is None:
        raise FileNotFoundError(f'no manifest dataset at {path!r}')
    # the POINTER anchors liveness: manifests NEWER than it are
    # aborted-commit debris (written, never published), never "the
    # newest snapshot" — keeping them would let vacuum delete the
    # live snapshot's files out from under the pointer
    committed = [v for v in versions if v <= current]
    keep = set(committed[-keep_last:])
    referenced: set[str] = set()
    for v in keep:
        mf = _load_manifest(path, scheme, v)
        referenced.update(e['path'] for e in mf['files'])
    data_dir = join_path(path, _DATA_DIR, scheme)
    removed = []
    for name, _size in _list_files(data_dir, scheme, '.parquet'):
        if name not in referenced:
            _delete_file(join_path(data_dir, name, scheme), scheme)
            removed.append(name)
    for v in versions:
        if v not in keep:
            _delete_file(join_path(path, _manifest_name(v), scheme), scheme)
    # commit-scoped staging directories only outlive their commit when
    # the DRIVER died inside the write (the finally cleans every other
    # path) — they are unreferenced by construction, sweep them too
    for name in _list_dirs(path, scheme):
        if name.startswith('_staging-'):
            _delete_dir(join_path(path, name, scheme), scheme)
    return removed


def _list_dirs(dir_path: str, scheme: str) -> list[str]:
    if not scheme:
        return sorted(n for n in os.listdir(dir_path)
                      if os.path.isdir(os.path.join(dir_path, n)))
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(dir_path)
    sel = pafs.FileSelector(rel, recursive=False)
    return sorted(i.path.rsplit('/', 1)[-1]
                  for i in filesystem.get_file_info(sel)
                  if i.type == pafs.FileType.Directory)
