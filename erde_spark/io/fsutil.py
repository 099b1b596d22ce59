"""Filesystem fan-out for byte-range sources (npy / safetensors — the
formats whose reads SEEK): local paths go through ``open``/``glob``,
any URI scheme through ``pyarrow.fs`` (s3://, hdfs://, gs:// ... and
``file://``, which doubles as the in-container test harness for the
remote code path). The streaming formats (warc/zst) carry their own
adapter in io/warc.py; this module serves the random-access ones.

Writers: EVERY training sink (zst/wds/tfrecord/arrow/megatron/avro/
npy/safetensors/zarr) dispatches on destination — plain local paths
commit by attempt-staged ``os.replace``; any URI scheme takes the
pyarrow.fs TWO-PHASE commit (temp object -> verify -> ``fs.move``,
one atomic PUT) because object stores have no atomic rename. The
shared executor-side primitive is ``io/task_files.py::open_staged``
(inlined in the closures that must stay stdlib-only); the shared
driver-side prologue is :func:`prepare_dir` below.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse


def _scheme(path: str) -> str:
    p = urlparse(path)
    # a Windows drive letter or a bare path has no scheme we care about
    return p.scheme if len(p.scheme) > 1 else ''


def prepare_dir(path: str, mode: str) -> str:
    """Driver-side sink-directory prologue shared by the training
    sinks: handle ``mode`` ('error' raises if the destination exists,
    'overwrite' clears it, 'append' leaves it) and ensure the
    directory exists. Returns the URI scheme ('' for a plain local
    path) for the caller to thread into its executor closures —
    that single string is what selects the two-phase commit branch
    in ``task_files.open_staged``. Mode VALIDATION stays in each
    sink (several refuse 'append' with format-specific reasons)."""
    sch = _scheme(path)
    if sch:
        from pyarrow import fs as pafs
        filesystem, root = pafs.FileSystem.from_uri(path)
        info = filesystem.get_file_info(root)
        if mode == 'error' and info.type != pafs.FileType.NotFound:
            raise FileExistsError(path)
        if mode == 'overwrite' and info.type == pafs.FileType.Directory:
            filesystem.delete_dir(root)
        filesystem.create_dir(root, recursive=True)
        return sch
    import shutil
    if mode == 'error' and os.path.exists(path):
        raise FileExistsError(path)
    if mode == 'overwrite':
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return ''


def join_path(root: str, name: str, scheme: str) -> str:
    """Child path under a sink root: URI roots join with '/', local
    roots with ``os.path.join`` (Windows separators)."""
    return f'{root}/{name}' if scheme else os.path.join(root, name)


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
