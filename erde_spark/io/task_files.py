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

These helpers are POSIX-rename writers. For object-store destinations
(no atomic rename) the pattern is the pyarrow.fs two-phase commit in
``io/zst.py::write_jsonl_zst`` (temp object -> verify -> ``fs.move``);
port that branch when a sink needs s3://, gs:// or hdfs:// output.

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
