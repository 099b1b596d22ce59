"""Attempt-scoped temp names + atomic rename for executor-side file
sinks (wds / tfrecord / arrow_shards).

Spark's own file committers never write the final name directly: each
task ATTEMPT stages into an attempt-scoped path and the committer
renames on success, so a speculative or retried attempt running
concurrently with the original can never interleave bytes into one
open file. These helpers give the hand-rolled ``foreachPartition``
sinks the same discipline: write to ``<final>.<attemptId>.inprogress``
and ``os.replace`` onto the deterministic final name when the shard is
complete (rename is atomic on POSIX, so readers and rival attempts see
either nothing or a whole shard — last completed attempt wins, which
is exactly Spark's semantics for idempotent task output).

No counterpart in the reference (its sinks are single-process,
``/root/reference/erde/io/base.py``); this is Spark-executor plumbing.

``staging_path``/``commit_file`` are the POSIX-rename primitives;
:func:`open_staged` is the destination-dispatching writer every sink
should reach for — a plain local path takes the POSIX staging +
``os.replace`` branch, any URI scheme (``file://`` doubling as the
in-container test harness, plus s3/gs/hdfs) takes the pyarrow.fs
TWO-PHASE commit from ``io/zst.py::write_jsonl_zst``: write the
``.inprogress`` temp object, VERIFY it exists with nonzero size, then
``fs.move`` onto the final name (one atomic PUT on stores where move
= copy+delete — a racing reader sees nothing or a whole file because
every read-side listing excludes ``.inprogress``).

EXECUTOR-SIDE IMPORT WARNING: do NOT ``import erde_spark.io.task_files``
inside a closure whose only erde_spark dependency it would be — the
parent-package inits drag pandas + the geo chain (~0.6 s) into every
FRESH Python worker, measured as a 2x wds_roundtrip regression in
AB_r10 whenever the worker pool had been recycled. Closures that
already reference module-level helpers of their own sink module
(tfrecord, megatron, avro_ocf) pay that chain regardless and may use
these helpers freely; closures that otherwise touch only
stdlib/pyspark/pandas by name (wds, arrow_shards) must inline the two
lines instead — see the notes at those call sites.
"""
from __future__ import annotations

import os

_SUFFIX = '.inprogress'


def task_attempt_id() -> int:
    """Unique-per-attempt id (0 when called outside a Spark task)."""
    from pyspark import TaskContext
    tc = TaskContext.get()
    return tc.taskAttemptId() if tc is not None else 0


def staging_path(final_path: str) -> str:
    """Attempt-scoped temp name next to ``final_path`` (same directory,
    so the final ``os.replace`` never crosses a filesystem)."""
    return f'{final_path}.{task_attempt_id()}{_SUFFIX}'


def commit_file(tmp_path: str, final_path: str) -> None:
    """Atomically move a completed staging file onto its final name."""
    os.replace(tmp_path, final_path)


def abort_file(tmp_path: str) -> None:
    """Best-effort cleanup of a staging file after a failure."""
    try:
        os.remove(tmp_path)
    except OSError:
        pass


def open_staged(final_path: str, scheme: str = ''):
    """Open an attempt-scoped staging handle destined for
    ``final_path`` and return ``(fh, commit, abort)``.

    ``scheme`` is the caller's (driver-computed) URI scheme — '' for a
    plain local path. Local: ``fh`` is a regular binary file at the
    ``staging_path`` sibling; ``commit()`` closes it and atomically
    ``os.replace``s onto the final name. URI: ``fh`` is a pyarrow.fs
    output stream on the ``.inprogress`` temp object; ``commit()``
    closes, VERIFIES the object exists with nonzero size (a silently
    truncated multipart upload must fail the task, not publish), then
    ``fs.move``s onto the final name — one atomic PUT on object
    stores, so readers never observe a partial file. ``abort()`` is
    the best-effort staging cleanup for failure paths.

    EXECUTOR-SIDE IMPORT WARNING (module docstring) applies: closures
    that must stay stdlib-only (wds, arrow_shards) inline this branch
    instead of importing it."""
    attempt = task_attempt_id()
    if scheme:
        from pyarrow import fs as pafs
        filesystem, rel_final = pafs.FileSystem.from_uri(final_path)
        rel_tmp = f'{rel_final}.{attempt}{_SUFFIX}'
        fh = filesystem.open_output_stream(rel_tmp)

        def commit(min_size: int = 1):
            # min_size=0 for files that are LEGALLY empty (e.g. a
            # megatron .bin of all-empty sequences) — existence is
            # still verified
            if not fh.closed:
                fh.close()
            info = filesystem.get_file_info(rel_tmp)
            if info.type != pafs.FileType.File or info.size < min_size:
                raise IOError(f'staged object {rel_tmp!r} missing or '
                              'truncated at commit — refusing to '
                              'publish')
            filesystem.move(rel_tmp, rel_final)

        def abort():
            # best-effort: cleanup must not mask the original error
            try:
                if not fh.closed:
                    fh.close()
                filesystem.delete_file(rel_tmp)
            except Exception:
                pass

        return fh, commit, abort
    tmp = f'{final_path}.{attempt}{_SUFFIX}'
    fh = open(tmp, 'wb')

    def commit(min_size: int = 1):
        if not fh.closed:
            fh.close()
        os.replace(tmp, final_path)

    def abort():
        if not fh.closed:
            fh.close()
        abort_file(tmp)

    return fh, commit, abort
