"""Fixed-vs-data cost split of the streaming near-dup backfill
(round-10 verdict ask #7: the bench's top line every round — is the
~11 s per-row work or per-micro-batch constant overhead?).

Protocol: the same sf0.1 documents corpus staged as 1, 2 and 4 input
files (maxFilesPerTrigger=1 => micro-batch count == file count), plus
a TINY run (2 batches x 50 rows) whose data cost is ~0 — so

    t(n) = fixed_per_batch * n + data_cost        (same total data)
    fixed_per_batch ~ (t(4) - t(1)) / 3,  cross-checked by tiny/2

Each configuration runs best-of-N with fresh checkpoint/state/out dirs
and the bench's CPU sentinel bracketing. Prints one JSON line; the
measured split is recorded in SCALE.md.

Usage: python tools/measure_backfill_cost.py [sf_dir] [n_runs]
"""

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, '.')


def _sentinel_cpu():
    import hashlib
    t0 = time.perf_counter()
    h = b'calibration'
    for _ in range(400_000):
        h = hashlib.md5(h).digest()
    return time.perf_counter() - t0


def stage(spark, d, n_files):
    from pyspark.sql import functions as F
    in_dir = tempfile.mkdtemp(prefix=f'erde_bfcost_in{n_files}_')
    for k in range(n_files):
        tmp = os.path.join(in_dir, f'tmp{k}')
        (d.filter(F.pmod('doc_id', F.lit(n_files)) == k).coalesce(1)
         .write.mode('overwrite').parquet(tmp))
        part = glob.glob(os.path.join(tmp, 'part-*.parquet'))[0]
        dst = os.path.join(in_dir, f'batch-{k}.parquet')
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
        shutil.rmtree(tmp)
    return in_dir


def run_once(spark, in_dir, schema):
    from erde_spark.scale.dedup import streaming_neardup_dedup
    base = tempfile.mkdtemp(prefix='erde_bfcost_run_')
    t0 = time.perf_counter()
    streaming_neardup_dedup(
        spark, in_dir, schema,
        out_dir=os.path.join(base, 'out'),
        checkpoint_dir=os.path.join(base, 'ckpt'),
        state_dir=os.path.join(base, 'state'),
        threshold=0.9, max_files_per_trigger=1)
    dt = time.perf_counter() - t0
    shutil.rmtree(base, ignore_errors=True)
    return dt


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from erde_spark.session import get_spark, load_tables
    spark = get_spark(app_name='backfill_cost')
    d = load_tables(spark, sf_dir, 'documents')['documents']
    schema = d.schema
    n_docs = d.count()

    configs = {}
    s0 = _sentinel_cpu()
    for n_files in (1, 2, 4):
        in_dir = stage(spark, d, n_files)
        runs = [run_once(spark, in_dir, schema) for _ in range(n_runs)]
        configs[f'batches_{n_files}'] = round(min(runs), 3)
        shutil.rmtree(in_dir, ignore_errors=True)
    tiny = d.limit(100)
    in_dir = stage(spark, tiny, 2)
    runs = [run_once(spark, in_dir, schema) for _ in range(n_runs)]
    configs['tiny_2x50'] = round(min(runs), 3)
    shutil.rmtree(in_dir, ignore_errors=True)
    s1 = _sentinel_cpu()

    t1, t4 = configs['batches_1'], configs['batches_4']
    fixed_per_batch = round((t4 - t1) / 3, 3)
    print(json.dumps({
        'sf_dir': sf_dir, 'n_docs': n_docs, 'n_runs': n_runs,
        'sentinel_cpu': [round(s0, 3), round(s1, 3)],
        'sec': configs,
        'fixed_per_batch_sec': fixed_per_batch,
        'fixed_per_batch_tiny_sec': round(configs['tiny_2x50'] / 2, 3),
        'data_cost_sec': round(t1 - fixed_per_batch, 3),
    }))


if __name__ == '__main__':
    main()
