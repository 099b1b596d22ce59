"""Filesystem fan-out for byte-range sources (npy / safetensors — the
formats whose reads SEEK): local paths go through ``open``/``glob``,
any URI scheme through ``pyarrow.fs`` (s3://, hdfs://, gs:// ... and
``file://``, which doubles as the in-container test harness for the
remote code path). The streaming formats (warc/zst) carry their own
adapter in io/warc.py; this module serves the random-access ones.

Writers: the zst sink (io/zst.py::write_jsonl_zst) is the reference
object-store writer — URI destinations take a pyarrow.fs TWO-PHASE
commit (temp object -> verify -> fs.move, one atomic PUT) because
object stores have no atomic rename. The remaining sinks
(wds/tfrecord/arrow/megatron/avro/npy/safetensors) still commit by
``os.replace`` and stay shared-filesystem-only by design — write to
the cluster FS and lift afterwards, or port the zst pattern.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse


def _scheme(path: str) -> str:
    p = urlparse(path)
    # a Windows drive letter or a bare path has no scheme we care about
    return p.scheme if len(p.scheme) > 1 else ''


def list_with_suffix(path: str, suffix: str) -> list[str]:
    """Name-sorted file list: ``path`` may be a file, a directory
    (filtered to ``*.suffix``), or a local glob. Remote directories
    list through pyarrow's FileSelector; remote globs are not
    supported (object stores have no server-side glob) — list the
    directory instead."""
    sch = _scheme(path)
    if not sch:
        import glob as g
        if os.path.isdir(path):
            files = sorted(g.glob(os.path.join(path, f'*{suffix}')))
        elif any(c in path for c in '*?['):
            files = sorted(g.glob(path))
        else:
            files = [path]
        if not files:
            raise FileNotFoundError(path)
        return files
    # every URI scheme — INCLUDING file:// — goes through pyarrow.fs,
    # so the in-container tests exercise the identical code path an
    # object store takes (from_uri maps file:// to LocalFileSystem)
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    info = filesystem.get_file_info(rel)
    if info.type == pafs.FileType.Directory:
        sel = pafs.FileSelector(rel, recursive=False)
        names = sorted(i.path for i in filesystem.get_file_info(sel)
                       if i.type == pafs.FileType.File
                       and i.path.endswith(suffix))
    elif info.type == pafs.FileType.File:
        names = [rel]
    else:
        raise FileNotFoundError(path)
    if not names:
        raise FileNotFoundError(path)
    return [f'{sch}://{n}' for n in names]


def read_bytes(path: str) -> bytes:
    """Whole-file bytes for a local path or any pyarrow.fs URI —
    driver-side convenience over :func:`open_ranged` (executor
    closures must keep inlining the two-line equivalent instead of
    referencing this module: the wds import-chain rule)."""
    with open_ranged(path) as fh:
        return fh.read()


def write_bytes(path: str, payload: bytes) -> None:
    """Write a small driver-side object (sidecar metadata, commit
    markers) to a local path or any pyarrow.fs URI."""
    sch = _scheme(path)
    if not sch:
        with open(path, 'wb') as fh:
            fh.write(payload)
        return
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    with filesystem.open_output_stream(rel) as fh:
        fh.write(payload)


def open_ranged(path: str):
    """Random-access binary handle (``read``/``seek``) for a local path
    or any pyarrow.fs URI. pyarrow's ``open_input_file`` IS seekable —
    ranged GETs on object stores — which is exactly what the
    byte-range scans need."""
    sch = _scheme(path)
    if not sch:
        return open(path, 'rb')
    from pyarrow import fs as pafs
    filesystem, rel = pafs.FileSystem.from_uri(path)
    return filesystem.open_input_file(rel)
